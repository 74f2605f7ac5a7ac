"""Fixed-stride bulk bit extraction as a Pallas kernel.

Serves the two non-entropy bitstream consumers of DecodeFrame:

  * the extra-bits side channel — ub*8-bit fields, interleaved A,B per
    sample for stereo (AlacFile.cs:476-482,634-641);
  * raw-PCM (uncompressed) frame bodies — sample_size-bit fields, A,B
    interleaved (AlacFile.cs:498-526,663-700).

Both consume a per-lane *affine* bit position: two fields of widths
(n1, n2) per step, advancing by n1+n2 <= 48 bits.  The XLA formulation is
a (B, S)-indexed gather which costs ~420 ms at 4096x4096 on v5e; this
kernel walks the same per-lane reservoir as ops/pallas/rice_lpc.py at a
fixed stride and costs milliseconds.

Returns raw right-aligned fields; sign extension / merging stays in the
XLA epilogue (ops/frame_decode.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rice_lpc import (
    I32,
    LANES,
    LN,
    NP,
    U32,
    _window32,
    flush_dynamic_tail,
    make_fetch_words,
    pick_sub,
    plan_tiles,
)

#: params rows
B_START, B_N, B_N1, B_N2 = range(4)
OUT_TILE = 256

#: Fetch-range policies (the affine twin of rice_lpc._range_mode):
#:   affine — cross-lane [g_lo, g_hi] fetch bounds come from FOUR scalar
#:            reduces done once pre-loop.  Sound because active lanes
#:            advance in sample LOCKSTEP at a per-lane FIXED stride, so
#:            lane l's word pointer at sample i is exactly
#:            (start_l + i*stride_l) >> 5 and
#:            min_l(start_l + i*stride_l) >= min(start) + i*min(stride)
#:            (max symmetric).  The per-word select self-masks by
#:            (wp>>3)==g, so a wider range only costs sweep iterations.
#:            Removes EVERY in-loop cross-lane reduce (incl. the
#:            streaming window's per-quad `fits` max) — the reduces +
#:            scalar extractions were ~85% of the fetch machinery's cost
#:            (DESIGN.md §4f/§4j).  For format-clustered production
#:            blocks strides are uniform and the bound is exact.
#:   exact  — the per-quad cross-lane reduce (round-2 behavior), kept
#:            for A/B reference.
BULK_RANGE_MODES = ("affine", "exact")


def bulk_range_mode() -> str:
    """ALAC_BULK_RANGE, read at DISPATCH time by production call sites
    (ops/frame_decode) and passed to bulk_bits as a static arg — so an
    env change after import retraces instead of being silently stale."""
    mode = os.environ.get("ALAC_BULK_RANGE", "affine")
    if mode not in BULK_RANGE_MODES:
        raise ValueError(
            f"ALAC_BULK_RANGE={mode!r}: expected one of {BULK_RANGE_MODES}"
        )
    return mode


def _kernel(params_ref, words_hbm, outa_hbm, outb_hbm, state_ref,
            wvmem, ta, tb, sem_w, sem_o, *, W8, S, out_tile, sub,
            stream_G=0, affine_range=True):
    nb = pl.program_id(0)
    if not stream_G:
        cp = pltpu.make_async_copy(words_hbm.at[nb], wvmem, sem_w)
        cp.start()
    start = params_ref[0, B_START]
    n = params_ref[0, B_N]
    n1 = params_ref[0, B_N1]
    n2 = params_ref[0, B_N2]
    stride = n1 + n2

    fetch_words = make_fetch_words(wvmem, W8, sub)
    live0 = n > 0
    wp0 = jnp.where(live0, start >> 5, jnp.zeros_like(start))

    if affine_range:
        # Affine cross-lane fetch bounds (see BULK_RANGE_MODES): four
        # scalar reduces ONCE, then zero in-loop reduces.  Fill values
        # keep the no-live-lane products in int32 range (W8*256 is the
        # table's total bit count; stride <= 48 by the bulk_bits
        # contract), and an empty live set yields g_lo > g_hi = a
        # zero-trip sweep.
        a_lo = jnp.min(jnp.where(live0, start, jnp.int32(W8 * 256)))
        a_hi = jnp.max(jnp.where(live0, start, 0))
        t_lo = jnp.min(jnp.where(live0, stride, 48))
        t_hi = jnp.max(jnp.where(live0, stride, 0))

        def fetch_bounds(i, lo_off, hi_off, base=None):
            """Group range covering every live lane's fetch of words
            [wp+lo_off, wp+hi_off] at sample index i, clamped to the
            table (or to the resident streaming window — sound because
            admission guarantees live lanes' needs are resident)."""
            g_lo = (((a_lo + i * t_lo) >> 5) + lo_off) >> 3
            g_hi = (((a_hi + i * t_hi) >> 5) + hi_off) >> 3
            if base is None:
                return jnp.maximum(g_lo, 0), jnp.minimum(g_hi, W8 - 1)
            return (
                jnp.maximum(g_lo, base),
                jnp.minimum(g_hi, base + stream_G - 1),
            )
    else:
        def fetch_bounds(i, lo_off, hi_off, base=None):
            return None

    def load_window(base):
        cpw = pltpu.make_async_copy(
            words_hbm.at[nb, pl.ds(base, stream_G)], wvmem, sem_w
        )
        cpw.start()
        cpw.wait()

    def window_base(wp, live):
        lo = jnp.min(jnp.where(live, wp >> 3, W8)).astype(I32)
        return jnp.clip(lo, 0, max(W8 - stream_G, 0))

    if stream_G:
        base0 = window_base(wp0, live0)
        load_window(base0)
        R = fetch_words(
            wp0, live0, 8, base=base0,
            bounds=fetch_bounds(0, 0, 7, base=base0),
        )
    else:
        cp.wait()
        R = fetch_words(wp0, live0, 8, bounds=fetch_bounds(0, 0, 7))

    def step(i, carry):
        """One (A, B) field pair; the reservoir refills per QUAD of
        steps (advance): 4 affine steps consume <= 4*48 bits, and the
        deepest window read reaches 31 + 3*48 + 32 + 32 = 239 < 256 —
        the 8-word reservoir fits a quad exactly.  The cross-lane range
        reduces in the fetch were the dominant per-step cost (see
        rice_lpc §4f ablations); here they amortize over 4 samples."""
        bitpos, wp, *R8 = carry
        active = i < n
        roff = bitpos - (wp << 5)
        wa = _window32(R8, roff, jnp.zeros_like(roff))
        va = (wa >> ((32 - n1.astype(U32)) & 31)).astype(I32)
        wb = _window32(R8, roff, n1)
        vb = (wb >> ((32 - n2.astype(U32)) & 31)).astype(I32)
        ta[(i % out_tile)] = jnp.where(active, va, 0)
        tb[(i % out_tile)] = jnp.where(active & (n2 > 0), vb, 0)

        @pl.when((i % out_tile) == out_tile - 1)
        def _flush():
            for t, dst in ((ta, outa_hbm), (tb, outb_hbm)):
                c = pltpu.make_async_copy(
                    t, dst.at[nb, pl.ds(i - (out_tile - 1), out_tile)], sem_o
                )
                c.start()
                c.wait()

        bitpos2 = jnp.where(active, bitpos + stride, bitpos)
        return (bitpos2, wp, *R8)

    def advance(carry, i0, base=None):
        """Renormalize the reservoir after the quad (or single step)
        whose FIRST sample index is past and whose old wp corresponds to
        sample index ``i0`` — every lane with shifts>0 was live through
        sample i0, so its old wp is exactly (start + i0*stride) >> 5 and
        the affine bounds at i0 cover the fetch."""
        bitpos, wp, *R8 = carry
        wp_new = bitpos >> 5
        shifts = wp_new - wp  # 0..6 after a quad
        F = fetch_words(
            wp + 8, [shifts > k for k in range(6)], 6, base=base,
            bounds=fetch_bounds(i0, 8, 13, base=base),
        )
        R8 = list(R8)
        for kk in range(6):
            c = shifts > kk
            for j in range(7):
                R8[j] = jnp.where(c, R8[j + 1], R8[j])
            R8[7] = jnp.where(c, F[kk], R8[7])
        return (bitpos, wp_new, *R8)

    carry = (start, wp0, *R)
    # Dynamic trip count + zero-filled tail (shared with rice_lpc._kernel).
    dynamic_stop = S % out_tile == 0
    nmax = jnp.clip(jnp.max(n), 0, S) if dynamic_stop else S
    unroll = 4 if S % 4 == 0 else 1
    stalled = jnp.zeros((), jnp.bool_)
    if stream_G:
        # Sliding window over the word table (rice_lpc §4g, the affine
        # twin): a quad consumes <= 6 words and its renormalization
        # fetches words wp+8..wp+13, so worst need is wp+19.  Mixed
        # strides make the cross-lane spread grow linearly, so a legal
        # (if exotic) batch CAN outgrow the window — the stall flag +
        # whole-table fallback covers it like the entropy kernel.
        trips = (nmax + unroll - 1) // unroll

        def stepq_b(j, c, base):
            for u in range(unroll):
                c = step(unroll * j + u, c)
            return advance(c, unroll * j, base=base)

        def fits(j, carry, base):
            """Exact (cross-lane reduce) window-admission check — used
            once per window reload so the stall/whole-table fallback
            fires exactly when round 2's did."""
            wp = carry[1]
            live = (unroll * j) < n
            hi = jnp.max(jnp.where(live, wp, 0)) + 20
            return jnp.minimum(hi >> 3, W8 - 1) < base + stream_G

        def fits_fast(j, carry, base):
            """Per-quad continuation check: affine upper bound, no
            reduce.  Conservative — a False only reloads the window
            earlier (then admission re-checks exactly), never stalls a
            quad the exact check would admit at reload."""
            if not affine_range:
                return fits(j, carry, base)
            whi = (a_hi + (unroll * j) * t_hi) >> 5
            return jnp.minimum((whi + 20) >> 3, W8 - 1) < base + stream_G

        def outer_cond(st):
            j, stall, _ = st
            return (j < trips) & jnp.logical_not(stall)

        def outer_body(st):
            j0, _, carry = st
            wp = carry[1]
            live = (unroll * j0) < n
            base = window_base(wp, live)
            load_window(base)

            def inner_body(t):
                j, _, c = t
                c = stepq_b(j, c, base)
                j = j + 1
                return (j, (j < trips) & fits_fast(j, c, base), c)

            j1, _, carry = jax.lax.while_loop(
                lambda t: t[1], inner_body,
                (j0, (j0 < trips) & fits(j0, carry, base), carry),
            )
            return (j1, j1 == j0, carry)

        j_end, stalled, carry = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.zeros((), I32), stalled, carry)
        )
        processed = unroll * j_end
    elif unroll > 1:
        def stepq(j, c):
            for u in range(unroll):
                c = step(unroll * j + u, c)
            return advance(c, unroll * j)

        trips = (nmax + unroll - 1) // unroll
        carry = jax.lax.fori_loop(0, trips, stepq, carry)
        processed = unroll * trips
    else:
        carry = jax.lax.fori_loop(
            0, nmax, lambda i, c: advance(step(i, c), i), carry
        )
        processed = nmax
    if dynamic_stop:
        flush_dynamic_tail(
            [(ta, outa_hbm), (tb, outb_hbm)], nb, processed, S, out_tile,
            sub, sem_o,
        )
    else:
        rem = S % out_tile
        for t, dst in ((ta, outa_hbm), (tb, outb_hbm)):
            c = pltpu.make_async_copy(
                t.at[pl.ds(0, rem)], dst.at[nb, pl.ds(S - rem, rem)], sem_o
            )
            c.start()
            c.wait()
    state_ref[0, 0] = jnp.broadcast_to(stalled.astype(I32), (sub, LN))


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "interpret", "whole_table", "sub_hint", "range_mode",
        "plan_epoch",
    ),
)
def bulk_bits(
    words,  # (B, W) uint32, B % 1024 == 0, W % 8 == 0
    start_bitpos,  # (B,) int32
    n,  # (B,) int32 steps per lane (0 freezes)
    n1,  # (B,) int32 first-field width, 1..32 where active
    n2,  # (B,) int32 second-field width, 0..24 (0 -> single field)
    num_samples: int,
    interpret: bool = False,
    whole_table: bool = False,
    sub_hint: int = 0,
    range_mode: str = "affine",
    plan_epoch: int = 0,
):
    """Extract (A, B) field streams at a fixed per-lane stride.

    Returns (a (B, S) int32, b (B, S) int32, stalled (B,) bool).
    ``stalled`` lanes belong to a streaming-window block whose lanes
    spread wider than the window (mixed strides over a fat table —
    rice_lpc.plan_tiles); their outputs are invalid and the caller
    re-runs with ``whole_table=True``.

    ``plan_epoch`` is an inert cache key for callers that mutate the
    trace-time planning state (WORDS_VMEM_BUDGET) — bump it instead of
    ``_clear_cache()`` (see rice_lpc.fused_rice_lpc's docstring for
    why executable destruction is avoided).

    CONTRACT: n1 + n2 <= 48 bits per step — the quad-fetch reservoir
    budget (31 + 3*48 + 32 + 32 = 239 < 256 bits; see step()).  Every
    caller satisfies this via the parser's 16/24-bit sample-size cap:
    raw stereo is at most 24+24 and extra-bits at most 24+24.  A future
    32-bit path would need stride 64 and a per-pair (not per-quad)
    renormalization — do NOT widen the fields without revisiting the
    reservoir arithmetic.
    """
    if range_mode not in BULK_RANGE_MODES:
        raise ValueError(
            f"range_mode={range_mode!r}: expected one of {BULK_RANGE_MODES}"
        )
    B, W = words.shape
    assert B % LANES == 0 and W % 8 == 0, (B, W)
    W8 = W // 8
    S = num_samples
    if whole_table:
        sub, stream_G = pick_sub(B, W8), 0
    else:
        sub, stream_G = plan_tiles(B, W8, S, sub_hint)
    if stream_G and (S % 4 or S % min(OUT_TILE, S)):
        # streaming needs the quad-unrolled loop + tile-aligned S
        sub, stream_G = pick_sub(B, W8), 0
    lanes = sub * LN
    NB = B // lanes
    wordsv = words.reshape(NB, sub, LN, W8, 8).transpose(0, 3, 4, 1, 2)
    params = jnp.stack(
        [start_bitpos, n, n1, n2] + [jnp.zeros_like(n)] * (NP - 4), axis=0
    ).astype(I32)
    paramsv = params.reshape(NP, NB, sub, LN).transpose(1, 0, 2, 3)
    out_tile = min(OUT_TILE if sub <= 8 else 128, S)
    kern = functools.partial(
        _kernel, W8=W8, S=S, out_tile=out_tile, sub=sub, stream_G=stream_G,
        affine_range=range_mode == "affine",
    )
    outa, outb, state = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NP, sub, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, sub, LN), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, S, sub, LN), I32),
            jax.ShapeDtypeStruct((NB, S, sub, LN), I32),
            jax.ShapeDtypeStruct((NB, 1, sub, LN), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((stream_G or W8, 8, sub, LN), U32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(paramsv, wordsv)
    a = outa.transpose(0, 2, 3, 1).reshape(B, S)
    b = outb.transpose(0, 2, 3, 1).reshape(B, S)
    stalled = state[:, 0].reshape(B) != 0
    return a, b, stalled
