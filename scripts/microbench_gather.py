"""TPU primitive-rate microbench for the device-pack diagnosis
(VERDICT r4 next #2a): what do minor-axis take_along_axis gathers,
cumsums, sorted searchsorted, and scatter-adds actually cost on this
chip?  The §7c device packer's 0.6-10 Msps verdicts blamed
"gather/scatter-bound work" — this pins the per-primitive numbers the
redesign must budget against.

Usage: python scripts/microbench_gather.py [--f 2048] [--ns 8192] [--w 2304]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jax import lax  # noqa: E402


def slope(make, args, label, elems):
    seed = int(np.random.default_rng().integers(1 << 20))
    run = make()
    run(jnp.uint32(seed), jnp.int32(1), *args).item()

    def tmin(K, base, trials=3):
        best = float("inf")
        for j in range(trials):
            t0 = time.perf_counter()
            run(jnp.uint32(seed + base + j), jnp.int32(K), *args).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = tmin(1, 100)
    K2 = 9
    tk = tmin(K2, 200)
    per = max(tk - t1, 1e-6) / (K2 - 1)
    grew = 0
    while tk - t1 < max(3 * t1, 0.5) and grew < 2 and K2 < 1025:
        K2 = min(1025, max(2 * K2 + 1, int(0.5 / max(per, 1e-5)) | 1))
        tk = tmin(K2, 300 + 100 * grew)
        per = max(tk - t1, 1e-6) / (K2 - 1)
        grew += 1
    print(f"{label}: {per*1e3:.3f} ms/pass, {elems/per/1e9:.2f} G elem/s",
          flush=True)
    return per


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=2048)
    ap.add_argument("--ns", type=int, default=8192)
    ap.add_argument("--w", type=int, default=2304)
    args = ap.parse_args()
    F, NS, W = args.f, args.ns, args.w
    rng = np.random.default_rng(0)

    vals = jnp.asarray(rng.integers(0, 1 << 31, (F, NS), np.int64).astype(np.uint32))
    # sorted per-row word indices (like j0 = starts >> 5)
    j0 = jnp.asarray(np.sort(rng.integers(0, W, (F, NS))).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, NS, (F, W)).astype(np.int32))
    jnp.sum(vals).item(); jnp.sum(j0).item(); jnp.sum(idx).item()

    def mk_gather():
        @jax.jit
        def run(salt, K, vals, idx):
            def body(i, acc):
                ix = (idx + (i + salt).astype(jnp.int32) % 3) % NS
                g = jnp.take_along_axis(vals, ix, axis=1)
                return acc + g[-1, -1].astype(jnp.int32)
            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
        return run

    def mk_cumsum():
        @jax.jit
        def run(salt, K, vals):
            def body(i, acc):
                c = jnp.cumsum(vals + (i + salt).astype(jnp.uint32), axis=1)
                return acc + c[-1, -1].astype(jnp.int32)
            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
        return run

    def mk_searchsorted():
        q = jnp.arange(W, dtype=jnp.int32)[None, :] * jnp.ones((F, 1), jnp.int32)

        @jax.jit
        def run(salt, K, j0, q):
            def body(i, acc):
                qq = q + (i + salt).astype(jnp.int32) % 2
                ss = jax.vmap(
                    lambda a, b: jnp.searchsorted(a, b, side="left")
                )(j0, qq)
                return acc + ss[-1, -1].astype(jnp.int32)
            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
        return run, q

    def mk_scatter():
        fidx = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None], (F, NS))

        @jax.jit
        def run(salt, K, vals, j0, fidx):
            def body(i, acc):
                jc = (j0 + (i + salt).astype(jnp.int32) % 2) % W
                acc2 = jnp.zeros((F, W), jnp.uint32).at[fidx, jc].add(vals)
                return acc + acc2[-1, -1].astype(jnp.int32)
            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
        return run, fidx

    slope(mk_gather, (vals, idx), f"take_along_axis (F={F},W={W}) from (F,NS={NS})", F * W)
    slope(mk_cumsum, (vals,), f"cumsum u32 minor axis (F={F},NS={NS})", F * NS)
    mk_ss, q = mk_searchsorted()
    slope(lambda: mk_ss, (j0, q), f"searchsorted sorted (F={F},NS={NS}) at W={W} pts", F * W)
    mk_sc, fidx = mk_scatter()
    slope(lambda: mk_sc, (vals, j0, fidx), f"scatter-add (F={F},NS={NS}) -> (F,W={W})", F * NS)


if __name__ == "__main__":
    main()
