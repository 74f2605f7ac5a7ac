"""Fused Rice *emitter* as a Pallas TPU kernel (encode side).

**Measured outcome: NOT the production path.**  On v5e this kernel runs
~19 ms per 4096-lane batch vs ~8 ms for the ops/encode.rice_symbols
lax.scan it was meant to replace — emission is gather-free, so XLA's
scan lowering is already near the issue-bound floor, and the kernel's
per-tile DMA staging only adds overhead (unlike decode, where the scan
path pays ~100 us/step for gathers and the kernel wins 50x).  Kept as a
correct, parity-tested alternative backend and as the recorded negative
result; encoder_tpu.py uses the scan.

Far simpler than the decode kernel
(ops/pallas/rice_lpc.py): emission has no bit cursor — field *positions*
are an output, resolved later by the host packer — so there is no word
table, no reservoir and no gather; the whole step is elementwise over
the (sub, 128) lane tile.

Per-step the emitter produces four bit fields (unary/escape marker,
remainder, zero-run marker, zero-run remainder; see ops/encode._emit_sym).
They are packed into two output planes per sample to halve VMEM staging
and D2H:

    vp   = v0 | v2 << 16      (both fit 10 bits)
    wp   = w0 | w1<<8 | w2<<16 | w3<<24
    v1, v3                    (full-width remainder/escape fields)

Inputs (residuals, zero-run lookahead) and outputs stream between HBM
and VMEM in out_tile chunks.  Parity: bit-identical planes to
ops/encode.rice_symbols (tests/test_encoder_tpu.py), which are
byte-identical to the host encoder after packing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec.cookie import RICE_THRESHOLD
from .rice_lpc import I32, LN, flush_dynamic_tail

# params rows
E_N, E_RSS, E_KMOD, E_IHIST, E_MULT, E_KMASK = range(6)
NP = 8
OUT_TILE = 256


def _clz32(x):
    c = jax.lax.clz(x.astype(jnp.uint32)).astype(I32)
    return jnp.where(x == 0, jnp.full_like(c, 40), c)


def _sra(x, nbits: int):
    return jax.lax.shift_right_arithmetic(
        x.astype(I32), jnp.full_like(x, nbits)
    )


def _emit_sym(raw, rss, k, mask):
    """(v0,w0,v1,w1) — vector twin of ops/encode._emit_sym."""
    k_safe = jnp.clip(k, 1, 31)
    m = (jax.lax.shift_left(jnp.ones_like(k_safe), k_safe) - 1) & mask
    rem = raw
    q = jnp.zeros_like(raw)
    for _ in range(RICE_THRESHOLD + 1):
        c = (m > 0) & (rem >= m)
        rem = rem - jnp.where(c, m, 0)
        q = q + c.astype(I32)
    esc_q = (m <= 0) | (q > RICE_THRESHOLD)
    is_k1 = k == 1
    # boolean algebra, not where(): Mosaic can't select i1 vectors
    esc = (is_k1 & (raw > RICE_THRESHOLD)) | (~is_k1 & esc_q)
    uq = jnp.where(is_k1, jnp.minimum(raw, RICE_THRESHOLD), q)
    v0 = jnp.where(
        esc, jnp.full_like(uq, 0x1FF),
        jax.lax.shift_left(jnp.ones_like(uq), uq + 1) - 2,
    )
    w0 = jnp.where(esc, 9, uq + 1)
    v1 = jnp.where(esc, raw, jnp.where(is_k1, 0, jnp.where(rem == 0, 0, rem + 1)))
    w1 = jnp.where(
        esc, rss, jnp.where(is_k1, 0, jnp.where(rem == 0, k_safe - 1, k_safe))
    )
    return v0, w0, v1, w1


def _kernel(params_ref, errs_hbm, zr_hbm, vp_hbm, v1_hbm, v3_hbm, wp_hbm,
            state_ref, et, zt, vpt, v1t, v3t, wpt, sem_i, sem_o,
            *, S, out_tile, sub):
    nb = pl.program_id(0)
    n = params_ref[0, E_N]
    rss = params_ref[0, E_RSS]
    kmod = params_ref[0, E_KMOD]
    ihist = params_ref[0, E_IHIST]
    mult = params_ref[0, E_MULT]
    kmask = params_ref[0, E_KMASK]
    neg1 = jnp.full_like(rss, -1)

    def load_tile(t0):
        for src, dst in ((errs_hbm, et), (zr_hbm, zt)):
            cp = pltpu.make_async_copy(
                src.at[nb, pl.ds(t0, out_tile)], dst, sem_i
            )
            cp.start()
            cp.wait()

    def flush(t0):
        for t, dst in ((vpt, vp_hbm), (v1t, v1_hbm), (v3t, v3_hbm), (wpt, wp_hbm)):
            cp = pltpu.make_async_copy(
                t, dst.at[nb, pl.ds(t0, out_tile)], sem_o
            )
            cp.start()
            cp.wait()

    def step(i, carry):
        h, sgnmod, skip, bad = carry
        ti = i % out_tile

        @pl.when(ti == 0)
        def _load():
            load_tile(i)

        err = et[ti].astype(I32)
        zr = zt[ti].astype(I32)
        in_skip = skip > 0
        active = (i < n) & jnp.logical_not(in_skip)

        dv = jnp.where(err > 0, 2 * err, jnp.where(err < 0, -2 * err - 1, 0))
        raw = dv - sgnmod
        bad = bad | (active & (raw < 0)).astype(I32)
        ik = 31 - kmod - _clz32(_sra(h, 9) + 3)
        k = jnp.where(ik < 0, ik + kmod, kmod)
        v0, w0, v1, w1 = _emit_sym(raw, rss, k, neg1)

        h2 = jnp.where(
            dv > 0xFFFF,
            jnp.full_like(h, 0xFFFF),
            h + dv * mult - _sra(h * mult, 9),
        )
        zcond = (h2 < 128) & (i + 1 < n)
        kz = jnp.minimum(_clz32(h2) + _sra(h2 + 16, 6) - 24, 31)
        v2, w2, v3, w3 = _emit_sym(zr, jnp.full_like(rss, 16), kz, kmask)

        emit_v = active
        emit_z = active & zcond
        vpt[ti] = v0 | jax.lax.shift_left(v2, jnp.full_like(v2, 16))
        v1t[ti] = v1
        v3t[ti] = v3
        wpt[ti] = (
            jnp.where(emit_v, w0, 0)
            | jax.lax.shift_left(jnp.where(emit_v, w1, 0), jnp.full_like(w1, 8))
            | jax.lax.shift_left(jnp.where(emit_z, w2, 0), jnp.full_like(w2, 16))
            | jax.lax.shift_left(jnp.where(emit_z, w3, 0), jnp.full_like(w3, 24))
        )

        @pl.when(ti == out_tile - 1)
        def _flush():
            flush(i - (out_tile - 1))

        h_n = jnp.where(active, jnp.where(zcond, 0, h2), h)
        sgn_n = jnp.where(active, jnp.where(zcond, 1, 0), sgnmod)
        skip_n = jnp.where(
            active, jnp.where(zcond, zr, 0),
            jnp.where(in_skip & (i < n), skip - 1, skip),
        )
        return (h_n, sgn_n, skip_n, bad)

    zeros = jnp.zeros((sub, LN), I32)
    nmax = jnp.clip(jnp.max(n), 0, S)  # S % out_tile == 0 enforced below
    # round the trip count to whole tiles (loads/flushes are tile-grained)
    ntrip = ((nmax + out_tile - 1) // out_tile) * out_tile
    carry = jax.lax.fori_loop(0, ntrip, step, (ihist, zeros, zeros, zeros))
    flush_dynamic_tail(
        [(vpt, vp_hbm), (v1t, v1_hbm), (v3t, v3_hbm), (wpt, wp_hbm)],
        nb, ntrip, S, out_tile, sub, sem_o,
    )
    state_ref[0, 0] = carry[3]  # bad flags
    for r in range(1, 4):
        state_ref[0, r] = zeros


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def rice_symbols_fused(errs, zruns, n, rss, kmod, init_history, mult, kmask,
                       num_samples: int, interpret: bool = False):
    """Fused twin of ops/encode.rice_symbols.

    Returns (vals16 (B,S,2) int16, vals32 (B,S,2) int32,
    widths (B,S,4) int8, bad (B,) bool) — identical planes.
    """
    B, S = errs.shape
    assert B % (8 * LN) == 0 and S == num_samples, (B, S)
    assert S % OUT_TILE == 0 or S <= OUT_TILE, (
        "rice_symbols_fused needs tile-aligned S"
    )
    sub = 8
    for cand in (32, 16):
        if B % (cand * LN) == 0:
            sub = cand
            break
    # 6 staging tiles of (out_tile, sub, 128) i32 must fit VMEM.
    out_tile = min(OUT_TILE * 8 // sub, S)
    lanes = sub * LN
    NB = B // lanes

    def to_v(x):
        return x.astype(I32).reshape(NB, sub, LN, S).transpose(0, 3, 1, 2)

    errsv = to_v(errs)
    zrv = to_v(zruns)
    params = jnp.stack(
        [n, rss, kmod, init_history, mult, kmask]
        + [jnp.zeros_like(n)] * (NP - 6),
        axis=0,
    ).astype(I32)
    paramsv = params.reshape(NP, NB, sub, LN).transpose(1, 0, 2, 3)
    kern = functools.partial(_kernel, S=S, out_tile=out_tile, sub=sub)
    vp, v1, v3, wp, state = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NP, sub, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec((1, 4, sub, LN), lambda b: (b, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((NB, S, sub, LN), I32)] * 4
        + [jax.ShapeDtypeStruct((NB, 4, sub, LN), I32)],
        scratch_shapes=[
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.VMEM((out_tile, sub, LN), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(paramsv, errsv, zrv)

    def from_v(x):
        return x.transpose(0, 2, 3, 1).reshape(B, S)

    vp_b, v1_b, v3_b, wp_b = map(from_v, (vp, v1, v3, wp))
    vals16 = jnp.stack(
        [(vp_b & 0xFFFF).astype(jnp.int16),
         ((vp_b >> 16) & 0xFFFF).astype(jnp.int16)], axis=-1
    )
    vals32 = jnp.stack([v1_b, v3_b], axis=-1)
    widths = jnp.stack(
        [
            (wp_b & 0xFF).astype(jnp.int8),
            ((wp_b >> 8) & 0xFF).astype(jnp.int8),
            ((wp_b >> 16) & 0xFF).astype(jnp.int8),
            ((wp_b >> 24) & 0xFF).astype(jnp.int8),
        ],
        axis=-1,
    )
    bad = (state[:, 0].reshape(B) != 0)
    return vals16, vals32, widths, bad
