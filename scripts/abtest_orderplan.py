"""A/B: order-aware batch planning vs size-only, staged device time.

Builds the e2e mixed corpus, stages batches under both planning modes in
one process, and times the device stage of each with the chained-readback
slope method (alternating A/B repeats to cancel relay drift).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from alacnet_tpu.bench_lib import _mixed_pool  # noqa: E402
from alacnet_tpu.ops.frame_decode import (  # noqa: E402
    FrameMetaArrays, decode_frames_packed,
)
from alacnet_tpu.parallel import pipeline as pl  # noqa: E402

S = 4096
TOTAL = 3 * 4096
BATCH = 4096


def build(seed):
    pool, params = _mixed_pool(S, 16, seed=7)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(
        np.repeat(np.arange(len(pool)), -(-TOTAL // len(pool)))[:TOTAL]
    )
    payloads = [pool[i] for i in idx]
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    return blob, offsets, sizes, params


def stage(corpus, mode: str):
    blob, offsets, sizes, params = corpus
    perm, _, spans, span_batch = pl.plan_blob_batches(
        blob, offsets, sizes, params, BATCH, strict=True
    )
    if mode == "size":  # size-only: the round-1 ordering
        perm = np.argsort(sizes, kind="stable")
    elif mode == "bucket":
        # order clustered within word-width buckets
        from alacnet_tpu.codec.framemeta_vec import (
            parse_frame_headers_blob, words_width,
        )

        hdr = parse_frame_headers_blob(
            blob, offsets, sizes, params, strict=True, pack_words=False
        )
        okey = np.where(hdr.order >= 31, 0, hdr.order).max(axis=1)
        wb = np.array([words_width(int(s), pl.WORD_BUCKET) for s in sizes])
        perm = np.lexsort((sizes, okey, wb))
    staged = []
    for lo, hi in spans:
        fb = pl.pad_frame_batch(span_batch(perm[lo:hi]))
        uf, mo = pl._fused_plan(fb)
        staged.append(
            (jnp.asarray(fb.words),
             jnp.asarray(FrameMetaArrays.pack_host(fb)), uf, mo)
        )
    jax.block_until_ready([s[0] for s in staged])
    return staged


def run(staged):
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for w, m, uf, mo in staged:
        _, n = decode_frames_packed(w, m, S, use_fused=uf, max_order=mo)
        acc = acc + jnp.sum(n)
    acc.item()
    return time.perf_counter() - t0


def main():
    modes = ("order", "size", "bucket")
    variants = {m: [] for m in modes}
    staged = {}
    for mode in modes:
        # distinct corpora per repeat: the relay memoizes identical work
        staged[mode] = [stage(build(100 + r), mode) for r in range(3)]
        run(staged[mode][0])  # warm/compile
    for r in range(3):
        for mode in modes:
            variants[mode].append(run(staged[mode][r]))
    for mode, ts in variants.items():
        msps = TOTAL * S / min(ts) / 1e6
        print(f"{mode}-planned: min={min(ts)*1e3:.1f}ms "
              f"times={[f'{t*1e3:.0f}' for t in ts]} -> {msps:.0f} Msps")
    for mode in modes:
        mos = [mo for (_, _, _, mo) in staged[mode][0]]
        print(f"{mode} span max_orders: {mos}")


if __name__ == "__main__":
    main()
