"""Fused Pallas TPU kernels for the device ENCODE automatons.

The XLA path (ops/encode.py) runs the two per-sample automatons —
forward adaptive FIR (``predictor_errors``) and the Rice emitter
(``rice_symbols``) — as ``lax.scan``s whose per-step overhead caps the
encode device stage at ~300-500 Msamples/s on v5e (measured,
docs/DESIGN.md §7).  These kernels run the same per-sample loops inside
Pallas with all state in vector registers, the same move that took
decode from ~50 Msps (scan) to ~1800 (ops/pallas/rice_lpc.py).

Encode is the EASIER direction for a fused kernel: there is no bit
reservoir, no word fetch, and no cross-lane renormalization — inputs
and outputs are dense (B, S) planes streamed through VMEM tiles.  What
remains sequential per lane is exactly the automaton state:

  * ``_pred_kernel``  — sig -> residuals.  LPC window D, adaptive coef
    table rc, prev; identical math to the decode kernel's LPC half run
    over the *known* signal (AlacFile.cs:256-336 in lockstep,
    ops/encode.predictor_errors).
  * ``_rice_kernel``  — residuals + zero-run lookahead -> merged 96-bit
    chunk planes.  Rice history/sign-modifier/skip state
    (AlacFile.cs:214-252 run forward, ops/encode.rice_symbols), with
    the four bit fields folded into one right-aligned c0:c1:c2 chunk
    in-kernel (ops/encode.merge_symbol_chunks) so the separate merge
    pass and its (B, S, 4) intermediates never exist.

The zero-run LOOKAHEAD (``zero_run_lengths``) stays in XLA: it is a
dense reverse cummin — log-depth, bandwidth-bound, no scan — and its
output feeds the rice kernel as a plane.  Splitting here keeps both
kernels forward-streaming.

Layout mirrors rice_lpc.py: lanes tiled (8, 128) so every state op is
one full vreg, grid over 1024-lane blocks, sample loop inside the
kernel with (TILE, 8, 128) input/output staging tiles DMA'd per TILE
samples.  Parity: bit-identical to the XLA path by construction (same
ops in the same order); tests/test_encode_kernel.py runs both under the
interpreter on CPU and scripts/tpu_check.py compiles them on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codec.cookie import RICE_THRESHOLD
from ..lpc import MAX_ORDER

I32 = jnp.int32
U32 = jnp.uint32

LANES = 1024  # lane granularity (B padded up to a multiple)
SUB, LN = 8, 128
TILE = 256  # samples per staging tile (1 MB per (TILE, 8, 128) plane)

# Parameter-plane rows (params array (NP, 8, 128)).
P_N, P_RSS, P_KMOD, P_IHIST, P_MULT, P_KMASK, P_ORDER, P_QUANT = range(8)
NP = 8


def _sra(x, n):
    return jax.lax.shift_right_arithmetic(x.astype(I32), n.astype(I32))


def _shl(x, n):
    return jax.lax.shift_left(x.astype(I32), n.astype(I32))


def _clz32(x):
    # Reference ladder semantics: clz(0) = 40 (AlacFile.cs:190).
    c = jax.lax.clz(x.astype(U32)).astype(I32)
    return jnp.where(x == 0, jnp.full_like(c, 40), c)


def _signext(x, rss):
    sh = (32 - rss) & 31
    return _sra(_shl(x, sh), sh)


def _emit_sym(raw, rss, k, mask, pure_pow2: bool = False):
    """(v0,w0,v1,w1) bit fields for one entropy symbol — bit-exact to
    ops/encode._emit_sym (AlacFile.cs:193-212 run forward), on
    (sub, LN) int32 tiles.

    ``pure_pow2``: statically promises ``mask`` = -1, so m = 2^k-1 and
    the 9-step conditional-subtraction ladder collapses to a shift
    estimate + 3 corrections — proven exact against the ladder for all
    k >= 2 and raw >= 0 over the full non-escape domain plus escape
    detection (exhaustive sweep; k == 1 lanes take the is_k1 branch
    below and raw < 0 is gated to the ladder's q=0/rem=raw).  The
    zero-run call keeps the ladder: its kmask-ANDed m is not a pure
    2^k-1."""
    k_safe = jnp.clip(k, 1, 31)
    m = (_shl(jnp.ones_like(k_safe), k_safe) - 1) & mask
    if pure_pow2:
        q = _sra(raw, k_safe)
        rem = raw - q * m
        for _ in range(3):
            c = rem >= m
            rem = rem - jnp.where(c, m, 0)
            q = q + c.astype(I32)
        nonneg = raw >= 0
        esc_q = nonneg & ((q > RICE_THRESHOLD) | (rem >= m))
        q = jnp.where(nonneg, q, 0)
        rem = jnp.where(nonneg, rem, raw)
    else:
        rem = raw
        q = jnp.zeros_like(raw)
        for _ in range(RICE_THRESHOLD + 1):
            c = (m > 0) & (rem >= m)
            rem = rem - jnp.where(c, m, 0)
            q = q + c.astype(I32)
        esc_q = (m <= 0) | (q > RICE_THRESHOLD)
    is_k1 = k == 1
    # Boolean algebra, not where(): Mosaic cannot lower a select with
    # an i1 vector result ("Unsupported target bitwidth for
    # truncation", i8 -> i1 trunci).
    esc = (is_k1 & (raw > RICE_THRESHOLD)) | (
        jnp.logical_not(is_k1) & esc_q
    )
    uq = jnp.where(is_k1, jnp.minimum(raw, RICE_THRESHOLD), q)
    v0 = jnp.where(esc, 0x1FF, _shl(jnp.ones_like(uq), uq + 1) - 2)
    w0 = jnp.where(esc, 9, uq + 1)
    r = rem
    v1 = jnp.where(esc, raw, jnp.where(is_k1, 0, jnp.where(r == 0, 0, r + 1)))
    w1 = jnp.where(
        esc, rss, jnp.where(is_k1, 0, jnp.where(r == 0, k_safe - 1, k_safe))
    )
    return v0, w0, v1, w1


def _shl_u(x, c):
    """u32 << c with c in [0, 32] (c >= 32 -> 0)."""
    return jnp.where(c >= 32, jnp.zeros_like(x), x << (c.astype(U32) & 31))


def _shr_u(x, c):
    """u32 >> c with c in [0, 32]."""
    return jnp.where(c >= 32, jnp.zeros_like(x), x >> (c.astype(U32) & 31))


def _merge4(fields):
    """Fold four (value, width) fields into one right-aligned 96-bit
    chunk (h, m, l u32) + total width — ops/encode.merge_symbol_chunks
    per sample."""
    v0 = fields[0][0]
    h = jnp.zeros_like(v0, dtype=U32)
    m = jnp.zeros_like(h)
    l = jnp.zeros_like(h)
    one = jnp.ones_like(h)
    ws = jnp.zeros_like(v0, dtype=I32)
    for val, w in fields:
        mask = _shl_u(one, w) - 1
        v = val.astype(I32).astype(U32) & mask
        inv = 32 - w
        h = _shl_u(h, w) | _shr_u(m, inv)
        m = _shl_u(m, w) | _shr_u(l, inv)
        l = _shl_u(l, w) | v
        ws = ws + w
    return h, m, l, ws


def _pred_kernel(params_ref, rc_ref, sig_hbm, errs_hbm, itile, otile,
                 sem_i, sem_o, *, S, max_order, tile, sub):
    nb = pl.program_id(0)
    n = params_ref[0, P_N]
    rss = params_ref[0, P_RSS]
    order = params_ref[0, P_ORDER]
    quant = params_ref[0, P_QUANT]
    qshift = (quant - 1) & 31

    tmax = max_order  # static
    is_pass = order == 0
    is_int31 = order == MAX_ORDER
    append_slot = order

    rc0 = tuple(rc_ref[0, t] for t in range(tmax + 1))
    zeros = jnp.zeros((sub, LN), I32)
    D0 = tuple(zeros for _ in range(tmax + 1))

    def sample(i, x, prev, D, rc):
        """One predictor_errors scan step (ops/encode.py:80-128), with
        the XLA path's i==0 first-sample copy folded in."""
        err_int = _signext(x - prev, rss)
        base = D[0]
        fir = zeros
        for t in range(1, tmax + 1):
            fir = fir + (D[t] - base) * rc[t]
        outval = _sra(_shl(jnp.ones_like(rss), qshift) + fir, quant)
        err_fir = _signext(x - outval - base, rss)
        use_int = is_int31 | (i <= order)
        err = jnp.where(is_pass, x, jnp.where(use_int, err_int, err_fir))
        err = jnp.where(i == 0, x, err)

        do_adapt = jnp.logical_not(is_pass | is_int31 | use_int)
        pos_b = do_adapt & (err > 0)
        neg_b = do_adapt & (err < 0)
        ev = err
        rc = list(rc)
        for t in range(tmax):
            act_p = pos_b & (t < order) & (ev > 0)
            act_n = neg_b & (t < order) & (ev < 0)
            act = act_p | act_n
            val = base - D[t + 1]
            sgn = (val > 0).astype(I32) - (val < 0).astype(I32)
            se = jnp.where(act_p, sgn, jnp.where(act_n, -sgn, 0))
            rc[t + 1] = rc[t + 1] - se
            ev = jnp.where(act, ev - _sra(val * se, quant) * (t + 1), ev)
        rc = tuple(rc)

        # window append (input sample — the decoder's output), shift-
        # left-by-one + write at per-lane slot `order`; unconditional
        # past n exactly like the XLA scan (sig is zero-padded there).
        Dn = []
        for t in range(tmax + 1):
            nxt = D[t + 1] if t + 1 <= tmax else D[t]
            Dn.append(jnp.where(append_slot == t, x, nxt))
        D = tuple(Dn)

        live = i < n
        err = jnp.where(live, err, zeros)
        prev = jnp.where(live, x, prev)
        return err, prev, D, rc

    def outer(tt, carry):
        prev, D, rc = carry
        cp = pltpu.make_async_copy(
            sig_hbm.at[nb, pl.ds(tt * tile, tile)], itile, sem_i
        )
        cp.start()
        cp.wait()

        def inner(j, c):
            prev, D, rc = c
            i = tt * tile + j
            err, prev, D, rc = sample(i, itile[j], prev, D, rc)
            otile[j] = err
            return (prev, D, rc)

        carry = jax.lax.fori_loop(0, tile, inner, (prev, D, rc))
        cpo = pltpu.make_async_copy(
            otile, errs_hbm.at[nb, pl.ds(tt * tile, tile)], sem_o
        )
        cpo.start()
        cpo.wait()
        return carry

    jax.lax.fori_loop(0, S // tile, outer, (zeros, D0, rc0))


def _rice_kernel(params_ref, errs_hbm, zrun_hbm, c0_hbm, c1_hbm, c2_hbm,
                 ws_hbm, state_ref, ite, itz, t0, t1, t2, tw,
                 sem_i, sem_o, *, S, tile, sub):
    nb = pl.program_id(0)
    n = params_ref[0, P_N]
    rss = params_ref[0, P_RSS]
    kmod = params_ref[0, P_KMOD]
    ihist = params_ref[0, P_IHIST]
    mult = params_ref[0, P_MULT]
    kmask = params_ref[0, P_KMASK]

    zeros = jnp.zeros((sub, LN), I32)
    neg1 = jnp.full((sub, LN), -1, I32)
    k16 = jnp.full((sub, LN), 16, I32)

    def sample(i, err, zr, h, sgnmod, skip, bad, bits):
        """One rice_symbols scan step (ops/encode.py:209-255) with the
        4-field chunk merge fused in."""
        in_skip = skip > 0
        active = (i < n) & jnp.logical_not(in_skip)

        dv = jnp.where(err > 0, 2 * err, jnp.where(err < 0, -2 * err - 1, 0))
        raw = dv - sgnmod
        bad = bad | jnp.where(active & (raw < 0), 1, 0)
        ik = 31 - kmod - _clz32(_sra(h, jnp.full_like(h, 9)) + 3)
        k = jnp.where(ik < 0, ik + kmod, kmod)
        v0, w0, v1, w1 = _emit_sym(raw, rss, k, neg1, pure_pow2=True)

        h2 = jnp.where(
            dv > 0xFFFF,
            jnp.full_like(h, 0xFFFF),
            h + dv * mult - _sra(h * mult, jnp.full_like(h, 9)),
        )
        zcond = (h2 < 128) & (i + 1 < n)
        # min(.., 31): semantically a no-op past _emit_sym's clip but
        # load-bearing for Mosaic shift lowering (rice_lpc.py kz note).
        kz = jnp.minimum(
            _clz32(h2) + _sra(h2 + 16, jnp.full_like(h2, 6)) - 24, 31
        )
        v2, w2, v3, w3 = _emit_sym(zr, k16, kz, kmask)

        emit_v = active
        emit_z = active & zcond
        c0, c1, c2, ws = _merge4(
            (
                (v0, jnp.where(emit_v, w0, 0)),
                (v1, jnp.where(emit_v, w1, 0)),
                (v2, jnp.where(emit_z, w2, 0)),
                (v3, jnp.where(emit_z, w3, 0)),
            )
        )
        bits = bits + ws

        h = jnp.where(active, jnp.where(zcond, zeros, h2), h)
        sgnmod = jnp.where(active, jnp.where(zcond, 1, 0), sgnmod)
        skip = jnp.where(
            active, jnp.where(zcond, zr, 0),
            jnp.where(in_skip & (i < n), skip - 1, skip),
        )
        return c0, c1, c2, ws, h, sgnmod, skip, bad, bits

    def outer(tt, carry):
        h, sgnmod, skip, bad, bits = carry
        cpe = pltpu.make_async_copy(
            errs_hbm.at[nb, pl.ds(tt * tile, tile)], ite, sem_i
        )
        cpe.start()
        cpz = pltpu.make_async_copy(
            zrun_hbm.at[nb, pl.ds(tt * tile, tile)], itz, sem_o
        )
        cpz.start()
        cpe.wait()
        cpz.wait()

        def inner(j, c):
            h, sgnmod, skip, bad, bits = c
            i = tt * tile + j
            c0, c1, c2, ws, h, sgnmod, skip, bad, bits = sample(
                i, ite[j], itz[j], h, sgnmod, skip, bad, bits
            )
            t0[j] = c0
            t1[j] = c1
            t2[j] = c2
            tw[j] = ws
            return (h, sgnmod, skip, bad, bits)

        carry = jax.lax.fori_loop(0, tile, inner, carry)
        for t, dst in ((t0, c0_hbm), (t1, c1_hbm), (t2, c2_hbm), (tw, ws_hbm)):
            cpo = pltpu.make_async_copy(
                t, dst.at[nb, pl.ds(tt * tile, tile)], sem_o
            )
            cpo.start()
            cpo.wait()
        return carry

    carry = (ihist, zeros, zeros, zeros, zeros)
    h, sgnmod, skip, bad, bits = jax.lax.fori_loop(
        0, S // tile, outer, carry
    )
    state_ref[0, 0] = bits
    state_ref[0, 1] = bad
    for r in range(2, 8):
        state_ref[0, r] = zeros


def _block_views(B, *planes):
    """(B, S) planes -> (NB, S, sub, LN) kernel views."""
    NB = B // (SUB * LN)
    out = []
    for p in planes:
        S = p.shape[1]
        out.append(p.reshape(NB, SUB, LN, S).transpose(0, 3, 1, 2))
    return out


def _param_planes(B, *rows):
    rows = list(rows) + [jnp.zeros_like(rows[0])] * (NP - len(rows))
    params = jnp.stack(rows, axis=0).astype(I32)  # (NP, B)
    NB = B // (SUB * LN)
    return params.reshape(NP, NB, SUB, LN).transpose(1, 0, 2, 3)


def _pred_blocks(sigv, paramsv, rcv, S, max_order, interpret):
    """Predictor kernel on kernel-layout views -> (NB, S, sub, LN)."""
    NB = sigv.shape[0]
    kern = functools.partial(
        _pred_kernel, S=S, max_order=max_order, tile=TILE, sub=SUB
    )
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NP, SUB, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, MAX_ORDER + 1, SUB, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, S, SUB, LN), I32),
        scratch_shapes=[
            pltpu.VMEM((TILE, SUB, LN), I32),
            pltpu.VMEM((TILE, SUB, LN), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(paramsv, rcv, sigv)


def _pred_views(sig, n, lp):
    B = sig.shape[0]
    NB = B // (SUB * LN)
    (sigv,) = _block_views(B, sig.astype(I32))
    paramsv = _param_planes(
        B, n, lp.rss, jnp.zeros_like(n), jnp.zeros_like(n),
        jnp.zeros_like(n), jnp.zeros_like(n), lp.order, lp.quant,
    )
    rcv = (
        lp.rc.astype(I32)
        .reshape(NB, SUB, LN, MAX_ORDER + 1)
        .transpose(0, 3, 1, 2)
    )
    return sigv, paramsv, rcv


@functools.partial(
    jax.jit, static_argnames=("num_samples", "max_order", "interpret")
)
def predictor_errors_fused(
    sig, n, lp, num_samples: int, max_order: int = MAX_ORDER,
    interpret: bool = False,
):
    """Fused-kernel predictor_errors: (B, S) sig -> (B, S) residuals.

    B must be a multiple of 1024 and num_samples a multiple of TILE
    (callers pad; encode_stages_fused handles both).
    """
    B, S = sig.shape
    assert B % (SUB * LN) == 0 and S % TILE == 0, (B, S)
    errs = _pred_blocks(*_pred_views(sig, n, lp), S, max_order, interpret)
    return errs.transpose(0, 2, 3, 1).reshape(B, S)


@functools.partial(
    jax.jit, static_argnames=("num_samples", "interpret")
)
def rice_merge_fused(
    errs, zruns, n, rp, num_samples: int, interpret: bool = False
):
    """Fused-kernel rice_symbols + merge_symbol_chunks.

    Returns (c0, c1, c2 (B, S) uint32, ws (B, S) int32, bits (B,) int32,
    bad (B,) bool).
    """
    B, S = errs.shape
    assert B % (SUB * LN) == 0 and S % TILE == 0, (B, S)
    errsv, zrunv = _block_views(B, errs.astype(I32), zruns.astype(I32))
    paramsv = _rice_params(B, n, rp)
    c0, c1, c2, ws, state = _rice_blocks(errsv, zrunv, paramsv, S, interpret)

    def flat(p):
        return p.transpose(0, 2, 3, 1).reshape(B, S)

    bits = state[:, 0].reshape(B)
    bad = state[:, 1].reshape(B) != 0
    return flat(c0), flat(c1), flat(c2), flat(ws), bits, bad


def _rice_params(B, n, rp):
    return _param_planes(
        B, n, rp.rss, rp.kmod, rp.init_history, rp.mult, rp.kmask,
        jnp.zeros_like(n), jnp.zeros_like(n),
    )


def _rice_blocks(errsv, zrunv, paramsv, S, interpret):
    """Rice kernel on kernel-layout views -> (c0, c1, c2, ws, state)."""
    NB = errsv.shape[0]
    kern = functools.partial(_rice_kernel, S=S, tile=TILE, sub=SUB)
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NP, SUB, LN), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, SUB, LN), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NB, S, SUB, LN), U32),
            jax.ShapeDtypeStruct((NB, S, SUB, LN), U32),
            jax.ShapeDtypeStruct((NB, S, SUB, LN), U32),
            jax.ShapeDtypeStruct((NB, S, SUB, LN), I32),
            jax.ShapeDtypeStruct((NB, 8, SUB, LN), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, SUB, LN), I32),
            pltpu.VMEM((TILE, SUB, LN), I32),
            pltpu.VMEM((TILE, SUB, LN), U32),
            pltpu.VMEM((TILE, SUB, LN), U32),
            pltpu.VMEM((TILE, SUB, LN), U32),
            pltpu.VMEM((TILE, SUB, LN), I32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(paramsv, errsv, zrunv)


def _pad_lanes(x, B_pad, fill=0):
    B = x.shape[0]
    if B == B_pad:
        return x
    pad_shape = (B_pad - B,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)], axis=0)


@functools.partial(
    jax.jit, static_argnames=("num_samples", "max_order", "interpret")
)
def encode_stages_fused(
    sig, n, lp, rp, num_samples: int, max_order: int = MAX_ORDER,
    interpret: bool = False,
):
    """Drop-in fused-kernel replacement for ops/encode.encode_stages:
    residuals -> zero-run lookahead (XLA cummin) -> rice symbols merged
    to chunk planes, with lane padding to the kernel's 1024 granularity
    and sample padding to the staging tile handled here.

    Returns (c0, c1, c2 (B, S) uint32, ws (B, S) int8, bits (B,) int32,
    bad (B,) bool) — bit-identical to the XLA path.
    """
    from ..encode import RiceEncParams
    from ..lpc import LpcParams

    B, S = sig.shape
    B_pad = -(-B // LANES) * LANES
    S_pad = -(-S // TILE) * TILE
    sigp = _pad_lanes(sig.astype(I32), B_pad)
    if S_pad != S:
        sigp = jnp.pad(sigp, ((0, 0), (0, S_pad - S)))
    np_ = _pad_lanes(n.astype(I32), B_pad)

    lpp = LpcParams(
        order=_pad_lanes(lp.order.astype(I32), B_pad),
        quant=_pad_lanes(lp.quant.astype(I32), B_pad),
        rc=_pad_lanes(lp.rc.astype(I32), B_pad),
        rss=_pad_lanes(lp.rss.astype(I32), B_pad, fill=1),
    )
    rpp = RiceEncParams(
        rss=_pad_lanes(rp.rss.astype(I32), B_pad, fill=1),
        kmod=_pad_lanes(rp.kmod.astype(I32), B_pad, fill=1),
        init_history=_pad_lanes(rp.init_history.astype(I32), B_pad),
        mult=_pad_lanes(rp.mult.astype(I32), B_pad),
        kmask=_pad_lanes(rp.kmask.astype(I32), B_pad, fill=-1),
    )

    # The inter-kernel handoff stays in the kernel's (NB, S, sub, LN)
    # layout: the residual plane never round-trips through (B, S), and
    # the zero-run lookahead (ops/encode.zero_run_lengths, a dense
    # reverse cummin) runs directly on that layout — sample axis 1,
    # lanes broadcast.  Saves three full-plane HBM repacks per chunk.
    sigv, predparams, rcv = _pred_views(sigp, np_, lpp)
    errsv = _pred_blocks(sigv, predparams, rcv, S_pad, max_order, interpret)

    NB = B_pad // (SUB * LN)
    n_v = np_.reshape(NB, SUB, LN)[:, None]
    idx = jnp.arange(S_pad, dtype=I32)[None, :, None, None]
    brk = (errsv != 0) | (idx >= n_v)
    nz_idx = jnp.where(brk, idx, S_pad)
    next_brk = jax.lax.cummin(nz_idx[:, ::-1], axis=1)[:, ::-1]
    run_from = next_brk - idx
    run_after = jnp.concatenate(
        [run_from[:, 1:], jnp.zeros((NB, 1, SUB, LN), I32)], axis=1
    )
    zrv = jnp.minimum(run_after, 0xFFFF)

    c0, c1, c2, ws, state = _rice_blocks(
        errsv, zrv, _rice_params(B_pad, np_, rpp), S_pad, interpret
    )

    def flat(p):
        return p.transpose(0, 2, 3, 1).reshape(B_pad, S_pad)

    bits = state[:, 0].reshape(B_pad)
    bad = state[:, 1].reshape(B_pad) != 0
    return (
        flat(c0)[:B, :S], flat(c1)[:B, :S], flat(c2)[:B, :S],
        flat(ws)[:B, :S].astype(jnp.int8), bits[:B], bad[:B],
    )
