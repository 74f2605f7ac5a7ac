"""Fused Rice + adaptive-LPC decode as a single Pallas TPU kernel.

This is the framework's flagship kernel: it replaces the XLA lax.scan
pipeline (ops/rice.py + ops/lpc.py) whose throughput is capped by
per-step loop overhead (~10us) and gather lowering (~100us/step at
B=4096, measured on v5e).  Here the whole per-sample loop runs *inside*
one kernel invocation with all state in vector registers / VMEM, so a
step costs hundreds of VPU cycles instead of hundreds of microseconds.

Design (see SURVEY.md §7 "hard parts"):

  * **Lane layout** — 1024 frames per grid block, shaped (8, 128) so
    every elementwise state op is one full vreg.  All decoder state
    (bit cursor, Rice history, reservoir, LPC window/coefs) is per-lane.

  * **Bit reservoir** — each lane carries 8 words R0..R7 holding bits
    [32*wp, 32*wp+256).  At the start of each unrolled PAIR of samples
    the intra-word offset is <= 31; two worst-case Rice events (9-bit
    unary + 32-bit escape + 9+16-bit zero-run block = 66 bits each)
    plus a 32-bit speculative window reach offset 31+2*66+32 = 195 <
    256, so every field of both events is extracted from the reservoir
    with pure vector math — no loads in the hot path.

  * **Word fetch** — ONE renormalization per sample pair: the reservoir
    shifts by 0..5 words and 5 new words arrive from the VMEM-resident
    transposed word table (W8, 8, sub, 128) via a bounded sweep over
    8-word groups (per group: 8 shared row loads + a 3-level select
    tree per word — measured FASTER than the Mosaic DynamicGatherOp,
    see _fetch_mode).  The sweep range is the min..max group actually
    needed across lanes — frames are size-sorted into blocks upstream,
    so the range is typically 1-2 — and the cross-lane range reduces
    (the dominant fixed cost, ~35% of the kernel in the per-sample
    design) now run once per pair.

  * **Streaming window (round 3)** — fat frames whose whole table
    would only fit a narrow lane tile (24-bit noise + extra-bits runs
    ~30 KB coded: sub=2, 1/4-utilized vregs) instead keep a sliding
    window of `stream_G` groups resident at sub=8: an outer while loop
    DMAs groups [base, base+G) (base = slowest live lane's group),
    an inner while runs sample pairs while every live lane's worst-case
    need (wp+17 words) stays inside the window.  Monotone cursors make
    the window a pure look-ahead cache; a block whose lanes diverge
    wider than the window (adversarial front-/back-loaded streams only
    — size-sorted real content advances near-uniformly) reports a
    per-block stall flag and the host re-decodes it whole-table
    (plan_tiles, parallel/pipeline.decode_blob).  Measured on the fat24
    corpus: 408 -> ~790 Msamples/s (sub=2 whole-table -> sub=8
    streaming); hires24 788 -> ~890.

  * **LPC fusion** — the Rice output feeds the adaptive FIR directly
    (base-aligned window D and reversed coefs rc, see ops/lpc.py for the
    layout proof).  D lives in a VMEM ring buffer; the FIR and the
    adaptive coefficient walk run to the *block's* max order, not 31.

  * **Output** — samples accumulate in a VMEM tile and DMA to HBM every
    OUT_TILE steps.

Semantics are bit-exact to the scalar oracle (codec/scalar.py) — the
parity suite runs this kernel in interpreter mode on CPU and compiled on
TPU against the same corpus as the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec.cookie import RICE_THRESHOLD

I32 = jnp.int32
U32 = jnp.uint32

LANES = 1024  # minimum lane granularity (B must be a multiple)
SUB, LN = 8, 128
#: VMEM budget for the per-block word table (leaves room for staging).
WORDS_VMEM_BUDGET = 12_200_000
OUT_TILE = 256  # samples buffered between output DMAs
MAX_ORDER = 31

# Parameter-plane rows (params array (NP, 8, 128)).
P_START, P_N, P_RSS, P_KMOD, P_IHIST, P_MULT, P_KMASK, P_ORDER, P_QUANT = range(9)
NP = 16  # padded row count


def pick_sub(B: int, W8: int) -> int:
    """Widest lane tile (sub, 128) whose word table fits the VMEM budget.

    Wider tiles amortize per-op overhead; narrow tiles (sub=4/2/1, with
    1/2- to 1/8-utilized vregs) exist so fat frames keep the fused
    kernel at a fraction of full rate instead of falling to the ~50x
    slower XLA scan path: typical 24-bit content runs 12-24 KB coded
    (sub=4), and the worst legal ALAC frames — 4096-sample stereo noise
    at 24-bit + extra-bits, ~33 KB — still fit at sub=2.  Table bytes =
    W8*8 words x sub*128 lanes x 4.
    """
    for cand in (32, 16, 8, 4, 2, 1):
        if B % (cand * LN) == 0 and W8 * cand * 4096 <= WORDS_VMEM_BUDGET:
            return cand
    raise ValueError(
        f"frame word table too large for VMEM ({W8 * 8} words/frame); "
        "gate with parallel.pipeline.FUSED_MAX_WORDS and use the XLA path"
    )


#: Narrowest lane tile allowed to keep whole-table residency before the
#: planner switches to the streaming window (see plan_tiles).
STREAM_MIN_SUB = 8
#: Widest table (in 8-word groups) that streams at the sub=16 tile; the
#: common 44.1/16 music band.  Wider tables stream at sub=8.
SUB16_STREAM_MAX_W8 = 372


def plan_tiles(
    B: int, W8: int, num_samples: int, sub_hint: int = 0
) -> tuple[int, int]:
    """(sub, stream_G): lane-tile width and streaming window size.

    stream_G == 0 means the whole (W8, 8, sub, 128) word table is VMEM
    resident (the classic layout).  When whole-table residency would
    force sub < STREAM_MIN_SUB (fat frames: 24-bit noise + extra-bits
    runs ~30 KB coded, which fits only the 1/4-utilized sub=2 tile), the
    kernel instead keeps a sliding window of ``stream_G`` groups in VMEM
    at sub=8 — full-width vregs, ~3x the fat-frame throughput — and
    refills it between bounded runs of sample pairs.  Correctness under
    arbitrary cross-lane divergence is preserved by the in-kernel stall
    flag: a block whose lanes spread wider than the window reports
    ``stalled`` and the host re-decodes it whole-table (impossible for
    real content in size-sorted blocks; reachable only by adversarial
    front-/back-loaded bit distributions, tests/test_pallas_kernel.py).
    """
    can_stream = (
        B % (STREAM_MIN_SUB * LN) == 0
        and num_samples % 2 == 0  # streaming runs the pair-unrolled loop
        and WORDS_VMEM_BUDGET // (8 * STREAM_MIN_SUB * LN * 4) >= 2
    )
    try:
        sub = pick_sub(B, W8)
    except ValueError:
        if not can_stream:
            raise
        sub = 0
    def _cap(sub: int, g: int) -> tuple[int, int]:
        """Clamp the tile to ``sub_hint`` lanes (planner spread hint).

        The fetch sweep's group range is a cross-lane reduce over the
        whole (sub, 128) tile, so blocks whose lanes mix frame SIZES pay
        the widest lane spread per pair; a narrower tile sees fewer
        distinct sizes.  Measured on the mixed-orders corpus (sizes
        4096/2048/1024 x orders 0/1/4/8/31, spread up to 138 groups at
        sub=8): sub=4 496 -> 633 Msps; sub=2 loses (274 — per-lane fixed
        cost quadruples).  The cap is only honored when the narrow table
        still fits VMEM whole or can stream.  Hints >= 8 are not caps
        (16 enables the wide streaming band below; it must never shrink
        an already-wider whole-table plan).
        """
        if (
            not sub_hint or sub_hint >= STREAM_MIN_SUB
            or sub <= sub_hint or B % (sub_hint * LN)
        ):
            return sub, g
        if W8 * sub_hint * 4096 <= WORDS_VMEM_BUDGET:
            return sub_hint, 0
        gc = WORDS_VMEM_BUDGET // (8 * sub_hint * LN * 4)
        if num_samples % 2 == 0 and gc >= 2:
            return sub_hint, min(gc, W8 - 1)
        return sub, g

    if sub >= 16 or (sub >= STREAM_MIN_SUB and not can_stream):
        return _cap(sub, 0)
    # Mid band: the table fits whole at sub=8 but not sub=16 — stream at
    # sub=16 instead.  A/B on v5e at 4096 lanes, music band (W8=288):
    # 1871 -> 2727 Msps when the block's frame sizes are TIGHT (16
    # distinct sizes), but 1628 -> 1401 on a spread corpus (32
    # distinct): the group-sweep fetch range grows with lanes/block, so
    # the wider tile only profits when per-block bit-position spread
    # stays small.  The planner measures that spread per span and passes
    # sub_hint=16 for tight blocks (pipeline.span_sub_hint, gated by
    # config.tight_groups); ALAC_STREAM16=1 forces the band everywhere.
    g16 = WORDS_VMEM_BUDGET // (8 * 16 * LN * 4)
    if (
        (sub_hint == 16 or os.environ.get("ALAC_STREAM16") == "1")
        and sub == STREAM_MIN_SUB
        and W8 <= SUB16_STREAM_MAX_W8
        and B % (16 * LN) == 0
        and num_samples % 2 == 0
        and g16 < W8
    ):
        return 16, g16
    if sub >= STREAM_MIN_SUB or not can_stream:
        return _cap(sub, 0)
    g = WORDS_VMEM_BUDGET // (8 * STREAM_MIN_SUB * LN * 4)
    return _cap(STREAM_MIN_SUB, min(g, W8 - 1))


def _sel8(b2, b1, b0, x):
    """Per-lane 8-way select by the bit masks of an index in 0..7."""
    q = [jnp.where(b2, x[j + 4], x[j]) for j in range(4)]
    h = [jnp.where(b1, q[j + 2], q[j]) for j in range(2)]
    return jnp.where(b0, h[1], h[0])


def _window32(R, roff, off):
    """The 32 bits at reservoir bit offset roff+off, left-aligned.

    R: 8 (sub,128) uint32 words (both the decode kernel and bulk_bits
    carry 8-word reservoirs).  The decode kernel allows roff+off <= 195
    (it covers two unrolled samples per fetch: start offset <= 97 within
    the second sample of a pair, worst-case event 66 bits, 32-bit
    window); bulk_bits allows <= 31+24+24+32 = 111 (start offset plus
    two <=24-bit fields plus the window).  Mirrors the reference's
    Readbits composition (AlacFile.cs:101-129); callers shift down to
    the field width (one extraction can serve several speculative
    widths).  hi/lo share the index bit masks (lo is the same select
    over the rotated word list).
    """
    p = roff + off
    wi = p >> 5
    s2 = (p & 31).astype(U32)
    b2 = (wi & 4) != 0
    b1 = (wi & 2) != 0
    b0 = (wi & 1) != 0
    hi = _sel8(b2, b1, b0, [R[j] for j in range(8)])
    lo = _sel8(b2, b1, b0, [R[j] for j in range(1, 8)] + [R[7]])
    return (hi << s2) | jnp.where(
        s2 == 0, jnp.zeros_like(lo), lo >> ((32 - s2) & 31)
    )


def _bits(R, roff, off, n):
    """Extract an n-bit field at reservoir bit offset roff+off."""
    x = _window32(R, roff, off)
    n = jnp.asarray(n, U32)
    return (x >> ((32 - n) & 31)).astype(U32)


#: Fetch strategies (round-2b A/B, music channel pass at sub=16):
#:   ladder — per group: 8 shared row loads + per-word 3-level select
#:            tree.  4.40 ms (DEFAULT).
#:   sweep  — per group+word: one Mosaic DynamicGatherOp ((8, N) idx
#:            broadcast, row 0 sliced).  4.95 ms — the "hardware" gather
#:            LOSES to plain selects here.
#:   perk   — one loop per word k over its own (shifts>k) range: 9.37 ms
#:            (the extra cross-lane min/max reduces dominate).
#:   A (1, N)-shaped gather index does not legalize in Mosaic.
_FETCH_MODES = ("ladder", "sweep", "perk")


def _fetch_mode() -> str:
    """ALAC_FETCH_MODE, read at kernel-build time (not import time, so
    tests/scripts can set it after import) and validated."""
    mode = os.environ.get("ALAC_FETCH_MODE", "ladder")
    if mode not in _FETCH_MODES:
        raise ValueError(
            f"ALAC_FETCH_MODE={mode!r}: expected one of {_FETCH_MODES}"
        )
    return mode


def _range_mode() -> int:
    """ALAC_FETCH_RANGE: per-pair fetch-bound policy (kernel-build time).

    ``pair`` (0)      — exact cross-lane range reduce every pair.
    ``amort`` (4)     — exact reduce every 4 pairs; between tightens the
                        sweep upper bound grows one group per pair
                        (always sound; see _kernel.tighten).
    ``amort:N``       — tighten every N pairs.

    Default ``amort`` (= amort:4): hardware A/B over all six corpus
    kinds (scripts/kbench.py, TPU v5e) — music 3175->7179, hires24
    3587->8732, fat24 3713->5892, spiky 4620->5758 Msps/chan-pass;
    orders/silence unchanged.  amort:2/8/16 all measured worse than
    amort:4 on music+fat24; ``pair`` keeps the exact per-pair reduce
    for A/B reference.
    """
    mode = os.environ.get("ALAC_FETCH_RANGE", "amort")
    if mode == "pair":
        return 0
    if mode == "amort":
        return 4
    if mode.startswith("amort:"):
        m = int(mode.split(":", 1)[1])
        if m < 1:
            raise ValueError(f"ALAC_FETCH_RANGE={mode!r}: N must be >= 1")
        return m
    raise ValueError(
        f"ALAC_FETCH_RANGE={mode!r}: expected pair, amort, or amort:N"
    )


def make_fetch_words(wvmem, W8: int, sub: int):
    """Group-sweep word fetcher over a VMEM-resident (W8, 8, sub, 128)
    table: fetch_words(wp, live, K) -> K (sub,128) uint32 words at
    per-lane indices wp..wp+K-1, sweeping only the group range live lanes
    need.  ``live`` may be one mask or a list of K per-word masks, but
    only ``lives[0]`` participates in the sweep range (the conservative
    [min group of word 0, max group of word K-1] over lanes fetching at
    all — correct because lives are nested, lives[k] implies lives[0]);
    per-word range tightening was measured slower (perk mode).  The list
    form is accepted for call-site symmetry only."""

    mode = _fetch_mode()

    def fetch_words(wp, live, K: int, ablate=(), base=None, bounds=None):
        lives = live if isinstance(live, (list, tuple)) else [live] * K
        wps = [jnp.clip(wp + k, 0, W8 * 8 - 1) for k in range(K)]
        if "staticrange" in ablate:  # timing ablation only — breaks parity
            g_lo = jnp.zeros((), I32)
            g_hi = jnp.ones((), I32)
        elif bounds is not None:
            # Caller-supplied conservative [g_lo, g_hi] (amortized range
            # mode): must cover every fetching lane's group — the
            # per-word select self-masks by (wpk>>3)==g, so a WIDER
            # range only costs sweep iterations, never correctness.
            g_lo, g_hi = bounds
        else:
            # Conservative range [min word-0 group, max word-K-1 group
            # over any fetching lane]: word k's select self-masks by
            # (wpk>>3)==g and the reservoir shift never consumes word k
            # unless shifts>k.
            # (Fusing the two reduces into one stacked max — min(x) as
            # W8-max(W8-x) — does not legalize: Mosaic rejects the
            # scalar extract from the (2,) reduce result with "Invalid
            # input layout".)
            g_lo = jnp.min(jnp.where(lives[0], wps[0] >> 3, W8)).astype(I32)
            g_hi = jnp.max(
                jnp.where(lives[0], wps[K - 1] >> 3, 0)
            ).astype(I32)
        acc = [jnp.zeros((sub, LN), U32) for _ in range(K)]

        def body(g, acc):
            # ``g`` is the ABSOLUTE group index; a streaming window
            # holds groups [base, base+G), so the VMEM row is g - base.
            gv = g if base is None else g - base
            out = []
            if sub >= 8 and mode == "sweep":
                tile = wvmem[gv].reshape(8, sub * LN)
                for k in range(K):
                    o = (wps[k] & 7).reshape(1, sub * LN)
                    idx = jnp.broadcast_to(o, (8, sub * LN))
                    got = jnp.take_along_axis(tile, idx, axis=0)[0:1]
                    got = got.reshape(sub, LN).astype(U32)
                    out.append(jnp.where((wps[k] >> 3) == g, got, acc[k]))
            else:
                # 8 row loads shared by all K words, then a 3-level
                # select tree per word (bit2 -> bit1 -> bit0 of the
                # intra-group index): 8 loads + K*(3 cmp + 7 sel).
                rows = [wvmem[gv, j].astype(U32) for j in range(8)]
                for k in range(K):
                    o = wps[k] & 7
                    b2 = (o & 4) != 0
                    b1 = (o & 2) != 0
                    b0 = (o & 1) != 0
                    q = [jnp.where(b2, rows[j + 4], rows[j]) for j in range(4)]
                    h = [jnp.where(b1, q[j + 2], q[j]) for j in range(2)]
                    got = jnp.where(b0, h[1], h[0])
                    out.append(jnp.where((wps[k] >> 3) == g, got, acc[k]))
            return out

        return jax.lax.fori_loop(g_lo, g_hi + 1, body, acc)

    return fetch_words


def flush_dynamic_tail(tiles_dsts, nb, processed, S: int, out_tile: int,
                       sub: int, sem):
    """Zero-fill and flush output rows [processed, S) after a dynamic-stop
    sample loop (pallas outputs are uninitialized).  Requires out_tile | S
    (full-tile writes stay in bounds).  tiles_dsts: [(tile_ref, hbm_ref)].
    """
    @pl.when(processed < S)
    def _tail():
        base = (processed // out_tile) * out_tile
        rem = processed - base
        row = jax.lax.broadcasted_iota(I32, (out_tile, sub, LN), 0)
        ntiles = (S - base) // out_tile - 1
        for tile, dst in tiles_dsts:
            tile[:] = jnp.where(row < rem, tile[:], 0)
            cp = pltpu.make_async_copy(
                tile, dst.at[nb, pl.ds(base, out_tile)], sem
            )
            cp.start()
            cp.wait()
            tile[:] = jnp.zeros((out_tile, sub, LN), I32)

            def zbody(k, _):
                cpz = pltpu.make_async_copy(
                    tile,
                    dst.at[nb, pl.ds(base + (k + 1) * out_tile, out_tile)],
                    sem,
                )
                cpz.start()
                cpz.wait()
                return 0

            jax.lax.fori_loop(0, ntiles, zbody, 0)


def _clz32(x):
    # Reference ladder semantics: clz(0) = 40 (AlacFile.cs:190).
    c = jax.lax.clz(x.astype(U32)).astype(I32)
    return jnp.where(x == 0, jnp.full_like(c, 40), c)


def _sra(x, n):
    return jax.lax.shift_right_arithmetic(x.astype(I32), n.astype(I32))


def _decode_event(R, roff, off, rss, k, mult_mask):
    """One entropy_decode_value from the reservoir (AlacFile.cs:193-212).

    Returns (value i32, consumed bits i32).  All (8,128) int32.
    """
    u9 = _bits(R, roff, off, 9).astype(I32)
    inv = (~u9) & 0x1FF
    x = jnp.minimum(_clz32((inv << 23).astype(I32)), RICE_THRESHOLD + 1)
    ucons = jnp.where(x > RICE_THRESHOLD, 9, x + 1)
    field_off = off + ucons
    esc = x > RICE_THRESHOLD
    # One aligned window serves both speculative reads (escape rss bits
    # vs k extra bits — only one is consumed).
    fwin = _window32(R, roff, field_off)
    esc_val = (fwin >> ((32 - rss.astype(U32)) & 31)).astype(I32)
    k_safe = jnp.clip(k, 1, 31)
    extra = (fwin >> ((32 - k_safe.astype(U32)) & 31)).astype(I32)
    m = ((jnp.full_like(k_safe, 1) << k_safe) - 1) & mult_mask
    vk = x * m + jnp.where(extra > 1, extra - 1, 0)
    k_cons = jnp.where(extra > 1, k_safe, k_safe - 1)
    is_k1 = k == 1
    value = jnp.where(esc, esc_val, jnp.where(is_k1, x, vk))
    consumed = ucons + jnp.where(esc, rss, jnp.where(is_k1, 0, k_cons))
    return value.astype(I32), consumed.astype(I32)


def _kernel(params_ref, rc_in_ref, words_hbm, out_hbm, state_ref,
            wvmem, otile, sem_w, sem_o, *, W8, S, max_order,
            out_tile, sub, stream_G=0, range_M=0, ablate=()):
    nb = pl.program_id(0)
    if not stream_G:
        # Stage this block's whole word table into VMEM (one DMA).
        cp = pltpu.make_async_copy(words_hbm.at[nb], wvmem, sem_w)
        cp.start()

    start = params_ref[0, P_START]
    n = params_ref[0, P_N]
    rss = params_ref[0, P_RSS]
    kmod = params_ref[0, P_KMOD]
    ihist = params_ref[0, P_IHIST]
    mult = params_ref[0, P_MULT]
    kmask = params_ref[0, P_KMASK]
    order = params_ref[0, P_ORDER]
    quant = params_ref[0, P_QUANT]
    qshift = (quant - 1) & 31

    tmax0 = max_order  # static
    # Carry ONLY rc[0..tmax]: the FIR reads rc[1..tmax] and the adaptive
    # walk writes rc[1..tmax]; carrying the full 32-slot table keeps ~25
    # dead vregs live across the whole sample loop (2x at sub=16) and
    # spills the register file every step.
    rc0 = tuple(rc_in_ref[0, t] for t in range(tmax0 + 1))
    D0 = tuple(jnp.zeros((sub, LN), I32) for _ in range(tmax0 + 1))

    is_pass = order == 0
    is_int31 = order == MAX_ORDER
    append_slot = order  # D ring slot written each step (base-aligned)
    tmax = max_order  # static: block-level max adaptive-walk depth

    fetch_words = make_fetch_words(wvmem, W8, sub)
    live0 = n > 0
    wp0 = jnp.where(live0, start >> 5, jnp.zeros_like(start))

    def load_window(base):
        """DMA groups [base, base+G) of this block's table into the
        sliding VMEM window (streaming mode only)."""
        cpw = pltpu.make_async_copy(
            words_hbm.at[nb, pl.ds(base, stream_G)], wvmem, sem_w
        )
        cpw.start()
        cpw.wait()

    def window_base(wp, live):
        """Window base for the current lane positions: follow the
        slowest live lane, clamped so the window never runs past W8."""
        lo = jnp.min(jnp.where(live, wp >> 3, W8)).astype(I32)
        return jnp.clip(lo, 0, max(W8 - stream_G, 0))

    if stream_G:
        base0 = window_base(wp0, live0)
        load_window(base0)
        R = fetch_words(wp0, live0, 8, base=base0)
    else:
        cp.wait()
        # ---- reservoir init: R = words[wp0 .. wp0+8) ----
        R = fetch_words(wp0, live0, 8)

    def tighten(wp, active):
        """Exact fetch-group bounds over active (not-yet-finished) lanes.

        Covers this pair's refill range wp+8..wp+12 for EVERY active
        lane (not just lanes fetching this pair: a lane idle now may
        fetch next pair from a position at/after its current wp, and
        per-pair growth is bounded below).  Mirrors the per-pair exact
        reduce's clipping so end-of-table lanes stay in [0, W8-1].
        """
        lo8 = jnp.minimum((wp + 8) >> 3, W8 - 1)
        hi12 = jnp.minimum((wp + 12) >> 3, W8 - 1)
        g_lo = jnp.min(jnp.where(active, lo8, W8)).astype(I32)
        g_hi = jnp.max(jnp.where(active, hi12, 0)).astype(I32)
        return g_lo, g_hi

    def step(i, carry):
        if range_M:
            *carry, g_lo, g_hi = carry
        bitpos, wp, *R, hist, signmod, zrun, prev, D, rc = carry
        active = i < n
        in_zero = zrun > 0
        do = active & jnp.logical_not(in_zero)
        roff = bitpos - (wp << 5)

        # ---- Rice event (AlacFile.cs:214-252) ----
        k = jnp.minimum(31 - _clz32(_sra(hist, jnp.full_like(hist, 9)) + 3), kmod)
        raw, consumed = _decode_event(R, roff, jnp.zeros_like(roff), rss, k, jnp.full_like(rss, -1))
        dv = raw + signmod
        tplus = dv + 1
        almost = _sra(tplus, jnp.ones_like(rss))
        almost = jnp.where((tplus < 0) & ((tplus & 1) != 0), almost + 1, almost)
        rice_val = jnp.where((dv & 1) != 0, -almost, almost)
        hist2 = jnp.where(
            dv > 0xFFFF,
            jnp.full_like(hist, 0xFFFF),
            hist + dv * mult - _sra(hist * mult, jnp.full_like(hist, 9)),
        )
        hz = hist2
        if "nozrun" in ablate:  # timing ablation only — breaks parity
            zcond = jnp.zeros_like(hist2, dtype=jnp.bool_)
            bsize = jnp.zeros_like(hist2)
            consumed_tot = consumed
        else:
            zcond = (hist2 < 128) & (i + 1 < n) & do
            # (hz+16)/64 as an arithmetic shift (the VPU has no int
            # divide).  Exact because history is non-negative: it starts
            # >= 0, dv >= 0, and mult = rm*(hm//4) <= 7*63 = 441 < 512
            # keeps h + dv*mult - ((h*mult)>>9) >= h*(1 - mult/512) >= 0
            # (clamped to 0xFFFF above, AlacFile.cs:229).
            kz = _clz32(hz) + _sra(hz + 16, jnp.full_like(hz, 6)) - 24
            # Semantically a no-op (_decode_event clips k to [1,31]) but
            # load-bearing for codegen: kz is otherwise unbounded (~1040
            # for large history) and Mosaic then lowers every downstream
            # variable shift through a slow >=32-safe path — measured 12x
            # on the whole kernel (74ms -> 6ms per music pass).
            kz = jnp.minimum(kz, 31)
            # (Branching this block on a scalar any(zcond) via lax.cond
            # was measured SLOWER everywhere — music 6.35 ms vs 4.60,
            # silence 3.04 vs 1.56: the per-step cross-lane reduce +
            # scf.if overhead exceeds the ~30 ops it skips.)
            bsize, bcons = _decode_event(
                R, roff, consumed, jnp.full_like(rss, 16), kz, kmask
            )
            consumed_tot = consumed + jnp.where(zcond, bcons, 0)

        err = jnp.where(do, rice_val, jnp.zeros_like(rice_val))

        # ---- fused LPC (AlacFile.cs:256-336; layout per ops/lpc.py) ----
        out_int = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(prev + err, (32 - rss) & 31), (32 - rss) & 31
        )
        base = D[0]
        fir = jnp.zeros((sub, LN), I32)
        if "nofir" not in ablate:
            for t in range(1, tmax + 1):
                fir = fir + (D[t] - base) * rc[t]
        outval = _sra(jax.lax.shift_left(jnp.ones_like(rss), qshift) + fir, quant)
        out_fir = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(outval + base + err, (32 - rss) & 31), (32 - rss) & 31
        )
        use_int = is_int31 | (i <= order)
        is_first = i == 0
        out = jnp.where(
            is_first | is_pass, err, jnp.where(use_int, out_int, out_fir)
        )

        # adaptive coefficient walk (AlacFile.cs:312-332)
        if "noadapt" in ablate:
            do_adapt = jnp.zeros_like(active, dtype=jnp.bool_) & active
        else:
            do_adapt = jnp.logical_not(is_pass | is_int31 | use_int | is_first) & active
        pos_b = do_adapt & (err > 0)
        neg_b = do_adapt & (err < 0)
        ev = err
        rc = list(rc)
        for t in range(0 if "noadapt" in ablate else tmax):
            act_p = pos_b & (t < order) & (ev > 0)
            act_n = neg_b & (t < order) & (ev < 0)
            act = act_p | act_n
            val = base - D[t + 1]
            sgn = (val > 0).astype(I32) - (val < 0).astype(I32)
            se = jnp.where(act_p, sgn, jnp.where(act_n, -sgn, 0))
            rc[t + 1] = rc[t + 1] - se
            ev = jnp.where(act, ev - _sra(val * se, quant) * (t + 1), ev)
        rc = tuple(rc)

        # D window: shift-left-by-one + append at per-lane slot `order`
        # (base-aligned layout, ops/lpc.py); frozen lanes keep D intact.
        # Only slots 0..tmax are ever read (FIR/adaptive walk stop at the
        # block's max order), so the shift chain is bounded too.
        Dn = []
        for t in range(tmax + 1):
            nxt = D[t + 1] if t + 1 <= tmax else D[t]
            new_row = jnp.where(append_slot == t, out, nxt)
            Dn.append(jnp.where(active, new_row, D[t]))
        D = tuple(Dn)

        # ---- emit ----
        otile[(i % out_tile)] = jnp.where(active, out, jnp.zeros_like(out))

        @pl.when((i % out_tile) == out_tile - 1)
        def _flush():
            cp = pltpu.make_async_copy(
                otile, out_hbm.at[nb, pl.ds(i - (out_tile - 1), out_tile)], sem_o
            )
            cp.start()
            cp.wait()

        # ---- advance cursor (reservoir refilled per PAIR, see advance) --
        bitpos2 = jnp.where(do, bitpos + consumed_tot, bitpos)

        hist_n = jnp.where(do, jnp.where(zcond, jnp.zeros_like(hz), hz), hist)
        sign_n = jnp.where(
            do, jnp.where(zcond, jnp.where(bsize > 0xFFFF, 0, 1), 0), signmod
        )
        zrun_n = jnp.where(
            do, jnp.where(zcond, bsize, 0), jnp.where(active & in_zero, zrun - 1, zrun)
        )
        prev_n = jnp.where(active, out, prev)
        ret = (
            bitpos2, wp, *R,
            hist_n, sign_n, zrun_n, prev_n, D, rc,
        )
        return (*ret, g_lo, g_hi) if range_M else ret

    def advance(carry, base=None, j=None):
        """Renormalize the 8-word reservoir after a pair of samples.

        Two samples consume <= 132 bits, so the intra-reservoir offset is
        <= 163 and one shift of 0..5 words (plus a 5-word fetch) restores
        offset <= 31.  ONE cross-lane range reduction + group sweep per
        pair instead of per sample — the reduces and sweep setup were
        measured as ~35% of the whole kernel (staticrange ablation).
        """
        if range_M:
            *carry, g_lo, g_hi = carry
        bitpos, wp, *R, hist, signmod, zrun, prev, D, rc = carry
        wp_new = bitpos >> 5
        shifts = wp_new - wp  # 0..5
        need = shifts > 0
        bounds = None
        if range_M:
            # Amortized range mode: the exact cross-lane reduce + its
            # vector->scalar extraction (the measured-dominant cost of
            # the fetch, scripts/kablate.py) runs only every range_M
            # pairs; between tightens g_hi grows by 1 per pair — always
            # sound, because a pair consumes <= 5 words (< one group)
            # and g_lo is monotone non-decreasing over active lanes.
            # range_M implies the 2x-unrolled pair loop (enforced at
            # plan time), so j is a PAIR index and sample 2j is the
            # pair's first: a lane is active iff it still has samples.
            active = (2 * j) < n
            g_lo, g_hi = jax.lax.cond(
                (j % range_M) == 0,
                lambda: tighten(wp, active),
                lambda: (g_lo, g_hi),
            )
            if base is None:
                lo_eff, hi_eff = g_lo, jnp.minimum(g_hi, W8 - 1)
            else:
                # Streaming window: resident groups are [base, base+G).
                # fits() guarantees every ACTUAL need is inside; the
                # grown bound may poke past, so clamp the sweep.
                lo_eff = jnp.maximum(g_lo, base)
                hi_eff = jnp.minimum(g_hi, base + stream_G - 1)
            bounds = (lo_eff, hi_eff)
        if "nofetch" in ablate:  # timing ablation only — breaks parity
            F = (R[1], R[2], R[3], R[4], R[5])
        elif "k1" in ablate:  # timing ablation only
            F = tuple(fetch_words(wp + 8, need, 1, base=base)) + (
                R[2], R[3], R[4], R[5])
        else:
            F = fetch_words(
                wp + 8, [shifts > k for k in range(5)], 5, ablate=ablate,
                base=base, bounds=bounds,
            )
        R = list(R)
        for kk in range(5):
            c = shifts > kk
            for j2 in range(7):
                R[j2] = jnp.where(c, R[j2 + 1], R[j2])
            R[7] = jnp.where(c, F[kk], R[7])
        ret = (bitpos, wp_new, *R, hist, signmod, zrun, prev, D, rc)
        return (*ret, g_lo, g_hi + 1) if range_M else ret

    zeros = jnp.zeros((sub, LN), I32)
    carry = (
        start,
        wp0,
        *R,
        ihist,
        zeros,
        zeros,
        zeros,
        tuple(D0[: tmax + 1]),
        rc0,
    )
    if range_M:
        carry = (*carry, *tighten(wp0, live0))
    # Dynamic trip count: the loop stops at this block's max sample count
    # instead of S — blocks are size-sorted upstream, so short/partial
    # frames cluster and their blocks exit early (a block of quarter-
    # length frames would otherwise burn 75% of its steps on frozen
    # lanes).
    dynamic_stop = S % out_tile == 0  # tail zero-fill needs tile-aligned S
    # Clamp to [0, S]: a caller-supplied all-negative n (malformed hassize
    # counts fed raw) must not drive a negative tail DMA offset.
    nmax = jnp.clip(jnp.max(n), 0, S) if dynamic_stop else S
    # 2x-unrolled sample loop with ONE reservoir renormalization per pair
    # (the 8-word reservoir covers both samples; see advance).  4x was
    # measured SLOWER at the 4-word design (register pressure); 2x also
    # matches the reservoir budget (2 x 66 bits < 8 words).
    unroll = 2 if S % 2 == 0 else 1
    stalled = jnp.zeros((), jnp.bool_)
    if stream_G:
        # ---- streaming window: run pairs while every live lane's need
        # fits the resident groups; reload the window between runs.
        # A fresh window that admits NO pair (cross-lane spread wider
        # than the window) sets `stalled` — the host re-decodes that
        # block whole-table (plan_tiles docstring).
        trips = (nmax + unroll - 1) // unroll

        def stepu(j, c, base):
            for u in range(unroll):
                c = step(unroll * j + u, c)
            return advance(c, base=base, j=j)

        def fits_exact(j, carry, base):
            """Can pair j run entirely from window [base, base+G)?
            A pair consumes <= 5 words and its renormalization fetches
            words wp+8..wp+12, so worst need is wp+17; lanes never read
            past W8-1 (fetch clips), hence the min."""
            wp = carry[1]
            live = (unroll * j) < n
            hi = jnp.max(jnp.where(live, wp, 0)) + 17
            return jnp.minimum(hi >> 3, W8 - 1) < base + stream_G

        def fits(j, carry, base):
            """Scalar-only fits in amortized range mode: the carried
            g_hi bounds every active lane's (wp+12)>>3, so the pair's
            worst need (wp+17)>>3 <= g_hi + 1.  Conservative by <= 1
            group (8 words) — a window reload fires slightly early but
            the reload's own exact re-tighten keeps stall behavior
            anchored to fits_exact (outer_body checks the first pair
            exactly)."""
            if not range_M:
                return fits_exact(j, carry, base)
            g_hi = carry[-1]
            return jnp.minimum(g_hi + 1, W8 - 1) < base + stream_G

        def outer_cond(st):
            j, stall, _ = st
            return (j < trips) & jnp.logical_not(stall)

        def outer_body(st):
            j0, _, carry = st
            wp = carry[1]
            live = (unroll * j0) < n
            base = window_base(wp, live)
            load_window(base)
            if range_M:
                # Fresh window: re-tighten the carried bounds exactly so
                # the scalar fits() (and the first sweeps) start tight.
                carry = (*carry[:-2], *tighten(wp, live))

            def inner_cond(t):
                return t[1]

            def inner_body(t):
                j, _, c = t
                c = stepu(j, c, base)
                j = j + 1
                return (j, (j < trips) & fits(j, c, base), c)

            # First-pair admission is checked EXACTLY in both modes:
            # stall (j1 == j0 -> whole-table retry) must never fire on
            # the amortized bound's <= 1-group overshoot.
            j1, _, carry = jax.lax.while_loop(
                inner_cond, inner_body,
                (j0, (j0 < trips) & fits_exact(j0, carry, base), carry),
            )
            return (j1, j1 == j0, carry)

        j_end, stalled, carry = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.zeros((), I32), stalled, carry)
        )
        processed = unroll * j_end
    elif unroll > 1:
        def stepu(j, c):
            for u in range(unroll):
                c = step(unroll * j + u, c)
            return advance(c, j=j)

        trips = (nmax + unroll - 1) // unroll  # may overshoot (masked steps)
        carry = jax.lax.fori_loop(0, trips, stepu, carry)
        processed = unroll * trips
    else:
        assert not range_M, "amortized range mode requires the pair loop"
        carry = jax.lax.fori_loop(0, nmax, lambda i, c: advance(step(i, c)), carry)
        processed = nmax

    # Tail handling: rows [processed, S) were never stepped, so out_hbm
    # would hold garbage there (pallas outputs are uninitialized).  Flush
    # the partial tile with its stale rows zeroed, then stream zero tiles
    # over the rest.  out_tile divides S, so full-tile writes stay in
    # bounds.
    if dynamic_stop:
        flush_dynamic_tail(
            [(otile, out_hbm)], nb, processed, S, out_tile, sub, sem_o
        )
    else:
        # Static loop to S; only the final partial tile needs flushing.
        rem_s = S % out_tile
        cp = pltpu.make_async_copy(
            otile.at[pl.ds(0, rem_s)],
            out_hbm.at[nb, pl.ds(S - rem_s, rem_s)],
            sem_o,
        )
        cp.start()
        cp.wait()

    state_ref[0, 0] = carry[0]  # end bit position
    state_ref[0, 1] = jnp.broadcast_to(  # streaming stall flag
        stalled.astype(I32), (sub, LN)
    )
    for r in range(2, 8):
        state_ref[0, r] = zeros


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_samples", "max_order", "interpret", "whole_table", "ablate",
        "sub_hint", "range_mode", "plan_epoch",
    ),
)
def fused_rice_lpc(
    words,  # (B, W) uint32, B % 1024 == 0, W % 8 == 0
    start_bitpos,  # (B,) int32
    n,  # (B,) int32 — 0 freezes a lane entirely
    rss, kmod, init_history, mult, kmask,  # (B,) int32 rice params
    order, quant, rc,  # (B,), (B,), (B, 32) int32 lpc params
    num_samples: int,
    max_order: int = MAX_ORDER,
    interpret: bool = False,
    whole_table: bool = False,
    ablate: tuple = (),
    sub_hint: int = 0,
    range_mode: int | None = None,
    plan_epoch: int = 0,
):
    """Decode+reconstruct one channel for a lane batch.

    Returns (out (B, num_samples) int32, end_bitpos (B,) int32).
    end_bitpos is -1 for every lane of a streaming-mode block that
    stalled (cross-lane divergence wider than the VMEM window — see
    plan_tiles); ``whole_table=True`` forces the classic whole-table
    residency (the host's stall fallback, and an A/B knob).

    ``plan_epoch`` is an inert cache key: ``plan_tiles`` reads
    module/env state (WORDS_VMEM_BUDGET, ALAC_STREAM16) at trace time,
    which jit's cache key can't see — callers that mutate that state
    (tests) bump the epoch instead of ``_clear_cache()``, so stale
    plans are never reused AND no executable is destroyed mid-process.
    (Destroying JIT'd CPU executables frees code the unwinder may
    still have registered frame-info for; a later C++ exception then
    segfaults in _Unwind_Find_FDE — observed as the full-CPU-suite
    crash, core-dump analysis in tests/conftest.py.)
    """
    if ablate and os.environ.get("ALAC_ABLATE") != "1":
        # Ablated variants produce WRONG output by design (profiling
        # only, scripts/kablate.py); refuse outside an explicit opt-in
        # so no production caller can silently break parity.
        raise RuntimeError(
            "fused_rice_lpc(ablate=...) is a timing-only mode that breaks "
            "bit parity; set ALAC_ABLATE=1 to confirm"
        )
    B, W = words.shape
    # plan_tiles re-checks divisibility for the tile it selects; 128 is
    # the hard floor (one vreg lane row).
    assert B % LN == 0 and W % 8 == 0, (B, W)
    W8 = W // 8
    S = num_samples

    if whole_table:
        # Stall-retry path: proven classic layout, spread cap dropped.
        sub, stream_G = pick_sub(B, W8), 0
    else:
        sub, stream_G = plan_tiles(B, W8, S, sub_hint)
    lanes = sub * LN
    NB = B // lanes

    # words: (B, W) -> (NB, W8, 8w, sub, 128l)
    wordsv = (
        words.reshape(NB, sub, LN, W8, 8).transpose(0, 3, 4, 1, 2)
    )
    params = jnp.stack(
        [
            start_bitpos, n, rss, kmod, init_history, mult, kmask, order, quant,
        ]
        + [jnp.zeros_like(n)] * (NP - 9),
        axis=0,
    ).astype(I32)  # (NP, B)
    paramsv = params.reshape(NP, NB, sub, LN).transpose(1, 0, 2, 3)
    rcv = rc.astype(I32).reshape(NB, sub, LN, MAX_ORDER + 1).transpose(0, 3, 1, 2)

    # Smaller output staging for wide tiles (VMEM headroom).
    out_tile = min(OUT_TILE if sub <= 8 else 128, S)
    if stream_G and S % out_tile:
        stream_G = 0  # streaming's stall tail-flush needs out_tile | S
        sub = pick_sub(B, W8)
        lanes, NB = sub * LN, B // (sub * LN)
    range_M = _range_mode() if range_mode is None else range_mode
    if S % 2:
        range_M = 0  # amortized bounds ride the 2x-unrolled pair loop
    kern = functools.partial(
        _kernel, W8=W8, S=S, max_order=max_order, out_tile=out_tile, sub=sub,
        stream_G=stream_G, range_M=range_M, ablate=ablate,
    )
    out, state = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NP, sub, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, MAX_ORDER + 1, sub, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, sub, LN), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, S, sub, LN), I32),
            jax.ShapeDtypeStruct((NB, 8, sub, LN), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((stream_G or W8, 8, sub, LN), U32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(paramsv, rcv, wordsv)

    out_b = out.transpose(0, 2, 3, 1).reshape(B, S)
    end = state[:, 0].reshape(B)
    if stream_G:
        # A stalled block's lanes report end = -1 (bit positions are
        # otherwise non-negative); decode_frames folds this into n = -1
        # and the pipeline re-decodes those frames whole-table.
        stalled = state[:, 1].reshape(B) != 0
        end = jnp.where(stalled, jnp.full_like(end, -1), end)
    return out_b, end
