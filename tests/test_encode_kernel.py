"""Fused encode kernels (ops/pallas/enc_stages.py) vs the XLA scan path.

Interpreter-mode bit-parity on corpora covering every automaton branch:
order 0 / general / 31, zero runs, escapes, mono lanes, ragged n, and
the 24-bit wide domain.  Hardware (compiled) parity runs in
scripts/tpu_check.py's encstage section.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from alacnet_tpu.ops.encode import (  # noqa: E402
    RiceEncParams, encode_stages,
)
from alacnet_tpu.ops.lpc import MAX_ORDER, LpcParams, reverse_coefs  # noqa: E402
from alacnet_tpu.ops.pallas.enc_stages import encode_stages_fused  # noqa: E402


def _params(B, order, rng, quant=9, rss=17, kmod=14):
    coefs = np.zeros((B, MAX_ORDER), np.int32)
    if 0 < order < MAX_ORDER:
        coefs[:, :order] = rng.integers(-2000, 2000, (B, order))
    rc = reverse_coefs(coefs, np.full(B, order, np.int32))
    lp = LpcParams(
        order=jnp.full(B, order, jnp.int32),
        quant=jnp.full(B, quant, jnp.int32),
        rc=jnp.asarray(rc),
        rss=jnp.full(B, rss, jnp.int32),
    )
    rp = RiceEncParams(
        rss=lp.rss,
        kmod=jnp.full(B, kmod, jnp.int32),
        init_history=jnp.full(B, 10, jnp.int32),
        mult=jnp.full(B, 40, jnp.int32),
        kmask=jnp.full(B, (1 << kmod) - 1, jnp.int32),
    )
    return lp, rp


def _compare(sig, n, lp, rp, S, max_order):
    ref = encode_stages(
        jnp.asarray(sig), jnp.asarray(n), lp, rp, S, max_order=max_order
    )
    got = encode_stages_fused(
        jnp.asarray(sig), jnp.asarray(n), lp, rp, S,
        max_order=max_order, interpret=True,
    )
    names = ("c0", "c1", "c2", "ws", "bits", "bad")
    for nm, a, b in zip(names, ref, got):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=nm
        )


@pytest.mark.parametrize("order", [0, 1, 6, 31])
def test_music_like(order, rng):
    B, S = 8, 64
    t = np.arange(B * S).reshape(B, S)
    sig = (1200 * np.sin(t / 7) + rng.normal(0, 30, (B, S))).astype(np.int32)
    n = np.full(B, S, np.int32)
    lp, rp = _params(B, order, rng)
    _compare(sig, n, lp, rp, S, max_order=(0 if order in (0, 31) else order))


def test_zero_runs_and_escapes(rng):
    B, S = 8, 96
    sig = np.zeros((B, S), np.int32)
    sig[:, ::17] = rng.integers(-60000, 60000, (B, S))[:, ::17]  # escapes
    sig[2] = 0  # pure silence lane
    sig[3, :4] = [5, -5, 3, -3]
    n = np.full(B, S, np.int32)
    n[4] = 31  # ragged
    n[5] = 0   # frozen lane
    n[6] = 1
    lp, rp = _params(B, 4, rng)
    _compare(sig, n, lp, rp, S, max_order=4)


def test_wide_domain_and_order31(rng):
    B, S = 8, 64
    sig = rng.integers(-(1 << 24), 1 << 24, (B, S)).astype(np.int32)
    n = np.full(B, S, np.int32)
    lp, rp = _params(B, 31, rng, rss=25)
    _compare(sig, n, lp, rp, S, max_order=0)


def test_mixed_ragged_batch(rng):
    B, S = 16, 80
    sig = rng.integers(-30000, 30000, (B, S)).astype(np.int32)
    sig[5:] //= 300  # quiet lanes -> short symbols + zero runs
    n = rng.integers(0, S + 1, B).astype(np.int32)
    lp, rp = _params(B, 6, rng)
    _compare(sig, n, lp, rp, S, max_order=6)


@pytest.mark.parametrize(
    "kmod,ihist,mult",
    [(14, 10, 40), (1, 0, 0), (3, 65535, 441), (31, 10, 40)],
)
def test_rice_param_extremes(kmod, ihist, mult, rng):
    """Cookie-parameter corners through the fused rice kernel: kmod 1
    (the k==1 unary special case everywhere), mult 0 (history frozen —
    the clz(0)=40 zero-run k), saturated initial history, kmod 31."""
    B, S = 8, 64
    sig = rng.integers(-500, 500, (B, S)).astype(np.int32)
    sig[1] = 0
    n = np.full(B, S, np.int32)
    lp, _ = _params(B, 4, rng)
    rp = RiceEncParams(
        rss=lp.rss,
        kmod=jnp.full(B, kmod, jnp.int32),
        init_history=jnp.full(B, ihist, jnp.int32),
        mult=jnp.full(B, mult, jnp.int32),
        kmask=jnp.full(B, (1 << kmod) - 1, jnp.int32),
    )
    _compare(sig, n, lp, rp, S, max_order=4)
