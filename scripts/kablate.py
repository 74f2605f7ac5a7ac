"""Kernel ablation timing: which step-body pieces cost what (TPU only).

Timing-only — ablated variants produce WRONG results by design
(fused_rice_lpc refuses them unless ALAC_ABLATE=1).

Measurement discipline: ONE executable per variant with the pass
inside a `lax.fori_loop` (the bench_lib._device_slope_time pattern) —
per-pass time is the marginal cost (T(2K)-T(K))/K inside a single
dispatch, so the dev relay's ~30-40 ms RTTs and multi-hundred-ms
hiccups cancel exactly.  The lane roll between iterations is a
dynamic multiple of the batch (identity permutation: production block
layout, but XLA cannot hoist the body).

Usage: python scripts/kablate.py [kind] [--batch N]
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["ALAC_ABLATE"] = "1"  # opt in: ablated output is wrong by design

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from scripts.kbench import corpus  # noqa: E402

from alacnet_tpu.ops.pallas.rice_lpc import fused_rice_lpc  # noqa: E402

S = 4096


def slope(fb, max_order, ablate, trials=2, target_s=0.3):
    """Seconds per fused pass, in-executable fori_loop slope."""
    ab = tuple(ablate)
    words = jnp.asarray(fb.words)
    args = (
        fb.entropy_pos, fb.n_samples, fb.rss, fb.kmod, fb.init_history,
        fb.rice_mult[:, 0], fb.kmask, fb.order[:, 0], fb.quant[:, 0],
        fb.rc[:, 0],
    )
    args = tuple(jnp.asarray(np.asarray(x)) for x in args)
    jnp.sum(words).item()  # force H2D before timing

    @jax.jit
    def run(salt, K, w, *a):
        def body(i, acc):
            roll = ((i + salt) % 7) * w.shape[0]
            wr = jnp.roll(w, roll, axis=0)
            _, end = fused_rice_lpc(wr, *a, S, max_order=max_order,
                                    ablate=ab)
            return acc + jnp.sum(end).astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, 0.0)

    run(0, 1, words, *args).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(0, 2, words, *args).item()
    per2 = time.perf_counter() - t0
    K = max(3, int(target_s / max(per2 / 2, 1e-4)))
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        run(2 * t + 1, K, words, *args).item()
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(2 * t + 2, 2 * K, words, *args).item()
        dt2 = time.perf_counter() - t0
        best = min(best, (dt2 - dt) / K)
    return best


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "music"
    batch = 4096
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    fb = corpus(kind, batch=batch)
    orders = fb.order[fb.order != 31]
    mo = int(orders.max()) if orders.size else 0
    nsamp = int(np.minimum(fb.n_samples, S).sum())
    base = None
    for ab in ([], ["nozrun"], ["noadapt"], ["nofir"], ["k1"],
               ["nofetch"], ["staticrange"]):
        dt = slope(fb, mo, ab)
        msps = nsamp / dt / 1e6
        delta = f"  (saves {1e3*(base-dt):+.2f} ms)" if base and ab else ""
        print(f"{kind} ablate={tuple(ab) or 'none'}: {dt*1e3:.2f} ms/pass "
              f"{msps:8.1f} Msps{delta}")
        if not ab:
            base = dt


if __name__ == "__main__":
    main()
