"""Frame-parallel adaptive FIR/LPC reconstruction as a lax.scan.

Vectorizes PredictorDecompressFirAdapt (AlacFile.cs:256-336) across frame
lanes with *per-lane* predictor order, quantization and coefficients.

The key layout trick: everything is kept **base-aligned** so that the
per-lane variable order never turns into dynamic indexing inside the scan:

  * window D (B, 32):  D[t] = out[i - 1 - order + t], i.e. D[0] is the
    reference's ``bufferOut[bufferOutIdx]`` (the FIR base sample) and
    D[order] is the most recent output.  Each step shifts D left by one
    and writes the new output at per-lane slot ``order`` via a
    precomputed one-hot mask — no gathers, no scatters.
  * coefficients rc (B, 32): rc[t] = coef[order - t] (reversed), so the
    FIR sum  sum_j (out[base+order-j] - out[base]) * coef[j]
    (AlacFile.cs:301-304) becomes  sum_t (D[t] - D[0]) * rc[t]  over the
    *static* range t = 1..31 (rc zero-padded past order), and the
    adaptive update's walk  pn = order-1 .. 0  (AlacFile.cs:321-331)
    becomes the static walk t = 0..30 touching rc[t+1] and D[t+1].

Order 0 (passthrough, :261-267) and order 31 (pure integration, :268-282)
are folded in as per-lane modes; the warm-up phase (:284-293) is the
integration mode applied while i <= order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bitops import I32, shl, sign_i32, signext, sra

MAX_ORDER = 31  # 5-bit field (AlacFile.cs:464)


class LpcParams(NamedTuple):
    """Per-lane predictor parameters."""

    order: jax.Array  # (B,) int32, 0..31
    quant: jax.Array  # (B,) int32, 0..15
    rc: jax.Array  # (B, 32) int32 — base-aligned reversed coefs (slot 0 unused)
    rss: jax.Array  # (B,) int32 readsamplesize


def reverse_coefs(coefs: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Host helper: raw coef table (B, 31) + order (B,) -> rc (B, 32).

    rc[b, t] = coefs[b, order[b] - t] for t in 1..order[b], else 0.
    """
    B = coefs.shape[0]
    rc = np.zeros((B, MAX_ORDER + 1), dtype=np.int32)
    for b in range(B):
        o = int(order[b])
        if 0 < o < MAX_ORDER:
            rc[b, 1 : o + 1] = coefs[b, :o][::-1]
    return rc


def lpc_decode(errors, n, params: LpcParams, num_samples: int):
    """Reconstruct samples from residuals.

    errors: (B, S) int32 Rice output;  n: (B,) valid counts;
    num_samples: static S.  Returns (B, S) int32 outputs.

    The reference runs this in place over the error buffer (:260); here the
    scan emits outputs functionally but follows the identical recurrences,
    including the in-scan coefficient mutation.
    """
    order = params.order.astype(I32)
    quant = params.quant.astype(I32)
    rss = params.rss.astype(I32)
    B = errors.shape[0]

    is_pass = order == 0
    is_int31 = order == MAX_ORDER
    append_hot = (
        jnp.arange(MAX_ORDER + 1, dtype=I32)[None, :] == order[:, None]
    )  # (B, 32) one-hot at slot `order`
    qshift = (quant - 1) & 31  # C# shift-count masking for quant == 0
    one = jnp.ones((), I32)

    errs_t = errors.T  # (S, B) scan inputs

    def step(carry, inp):
        i, err = inp
        prev, D, rc = carry

        # ---- mode outputs ----
        out_int = signext(prev + err, rss)  # warm-up / order-31 (:276-292)
        base = D[:, 0]
        fir = jnp.sum(
            (D[:, 1:] - base[:, None]) * rc[:, 1:], axis=1, dtype=jnp.int32
        )
        outval = sra(shl(one, qshift) + fir, quant)
        out_fir = signext(outval + base + err, rss)

        use_int = is_int31 | (i <= order)
        out = jnp.where(is_pass, err, jnp.where(use_int, out_int, out_fir))

        # ---- adaptive coefficient update (:312-332), FIR lanes only ----
        do_adapt = ~(is_pass | is_int31 | use_int)
        pos_b = do_adapt & (err > 0)
        neg_b = do_adapt & (err < 0)
        ev = err
        rc_cols = [rc[:, t] for t in range(MAX_ORDER + 1)]
        for t in range(MAX_ORDER):
            act_p = pos_b & (t < order) & (ev > 0)
            act_n = neg_b & (t < order) & (ev < 0)
            act = act_p | act_n
            val = base - D[:, t + 1]
            sgn = sign_i32(val)
            sign_eff = jnp.where(act_p, sgn, jnp.where(act_n, -sgn, 0))
            rc_cols[t + 1] = rc_cols[t + 1] - sign_eff
            ev = jnp.where(
                act, ev - sra(val * sign_eff, quant) * (t + 1), ev
            )
        rc_new = jnp.stack(rc_cols, axis=1)
        rc = jnp.where(do_adapt[:, None], rc_new, rc)

        # ---- advance window: shift left, append at slot `order` ----
        shifted = jnp.concatenate([D[:, 1:], D[:, :1]], axis=1)
        D = jnp.where(append_hot, out[:, None], shifted)

        # freeze lanes past their sample count
        live = i < n
        out = jnp.where(live, out, jnp.zeros_like(out))
        prev = jnp.where(live, out, prev)
        return (prev, D, rc), out

    # i = 0: first sample always copies (:259-260 "first sample always
    # copies" — out[0] = err[0]); seed prev and D accordingly.
    err0 = errs_t[0]
    D0 = jnp.where(append_hot, err0[:, None], jnp.zeros((B, MAX_ORDER + 1), I32))
    init = (err0, D0, params.rc.astype(I32))
    xs = (jnp.arange(1, num_samples, dtype=I32), errs_t[1:])
    (_, _, _), outs = jax.lax.scan(step, init, xs)
    return jnp.concatenate([err0[None, :], outs], axis=0).T
