"""Fused Pallas Rice+LPC kernel vs the XLA scan path (interpret mode).

The kernel's compiled-on-TPU parity is exercised by running the same
corpus through both paths on hardware (scripts/tpu_check.py; the CI-side
equivalent here uses the Pallas interpreter on CPU, which executes the
identical kernel logic including the reservoir, group-sweep fetch and
DMA flushes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alacnet_tpu.codec.cookie import default_cookie
from alacnet_tpu.codec.encoder import AlacEncoder, EncoderConfig
from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec
from alacnet_tpu.ops.lpc import LpcParams, lpc_decode
from alacnet_tpu.ops.pallas.rice_lpc import LANES, fused_rice_lpc
from alacnet_tpu.ops.rice import RiceParams, rice_decode


def _mixed_payloads(S: int, bits: int, rng):
    params = default_cookie(44100, bits, 2, max_samples_per_frame=S)
    n = 8 * S
    t = np.arange(n)
    amp = (1 << (bits - 1)) * 0.1
    pcm = np.stack(
        [
            np.clip(amp * np.sin(t * 0.05) + rng.normal(0, amp * 0.02, n), -(1 << (bits - 1)), (1 << (bits - 1)) - 1),
            np.clip(amp * np.sin(t * 0.067) + rng.normal(0, amp * 0.02, n), -(1 << (bits - 1)), (1 << (bits - 1)) - 1),
        ],
        axis=1,
    ).astype(np.int32)
    payloads = []
    for order in (0, 1, 4, 6, 8, 31):
        enc = AlacEncoder(params, EncoderConfig(order=order))
        payloads.append(enc.encode_frame(pcm[:S]))
        payloads.append(enc.encode_frame(pcm[S : S + S // 2]))  # partial
    encz = AlacEncoder(params, EncoderConfig(order=4))
    z = np.zeros((S, 2), np.int32)
    z[5, 0] = 99
    payloads.append(encz.encode_frame(z))  # zero runs
    noise = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), (S, 2)).astype(np.int32)
    payloads.append(encz.encode_frame(noise))  # escapes
    return payloads, params


@pytest.mark.parametrize("bits", [16, 24])
def test_fused_kernel_matches_xla_path(bits, rng):
    S = 128
    payloads, params = _mixed_payloads(S, bits, rng)
    fb = parse_frame_headers_vec(payloads, params)
    B0 = fb.batch

    def pad(a):
        out = np.zeros((LANES,) + a.shape[1:], a.dtype)
        out[:B0] = a
        return jnp.asarray(out)

    words = pad(fb.words)
    n = pad(fb.n_samples)
    start = pad(fb.entropy_pos)
    rp = RiceParams(
        rss=pad(fb.rss),
        kmod=pad(fb.kmod),
        init_history=pad(fb.init_history),
        mult=pad(fb.rice_mult[:, 0]),
        kmask=pad(fb.kmask),
    )
    err, endp = rice_decode(words, start, n, rp, S)
    ref = lpc_decode(
        err,
        n,
        LpcParams(
            order=pad(fb.order[:, 0]),
            quant=pad(fb.quant[:, 0]),
            rc=pad(fb.rc[:, 0]),
            rss=rp.rss,
        ),
        S,
    )
    out, end = fused_rice_lpc(
        words, start, n,
        rp.rss, rp.kmod, rp.init_history, rp.mult, rp.kmask,
        pad(fb.order[:, 0]), pad(fb.quant[:, 0]), pad(fb.rc[:, 0]),
        S,
        interpret=jax.default_backend() != "tpu",
    )
    np.testing.assert_array_equal(np.asarray(out)[:B0], np.asarray(ref)[:B0])
    np.testing.assert_array_equal(np.asarray(end)[:B0], np.asarray(endp)[:B0])
