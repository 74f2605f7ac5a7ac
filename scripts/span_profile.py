"""Per-SPAN slope profile of one corpus kind through the production
planner — which spans of a mixed batch eat the device time, with each
span's shape (lanes, samples, max_order, sub_hint, payload-size range).

The per-kind bench sums per-span slopes (bench_lib._device_slope_time);
this prints the addends so kernel work can target the expensive spans.

Usage: python scripts/span_profile.py [kind] [--batch N] [--env]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alacnet_tpu.bench_lib import (  # noqa: E402
    _device_slope_time, make_corpus_frames,
)
from alacnet_tpu.ops.frame_decode import FrameMetaArrays  # noqa: E402
from alacnet_tpu.parallel.pipeline import (  # noqa: E402
    _fused_plan, pad_frame_batch, plan_blob_batches, span_range_mode,
    span_sub_hint,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", nargs="?", default="orders")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    distinct, params = make_corpus_frames(
        num_distinct=min(args.batch, 32), frame_samples=4096, kind=args.kind
    )
    payloads = [distinct[i % len(distinct)] for i in range(args.batch)]
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    perm, _, spans, span_batch = plan_blob_batches(
        blob, offsets, sizes, params, args.batch, strict=True
    )
    total_t = 0.0
    total_n = 0
    for lo, hi in spans:
        fb = pad_frame_batch(span_batch(perm[lo:hi]))
        uf, mo = _fused_plan(fb)
        cap = span_sub_hint(sizes[perm[lo:hi]])
        rm = span_range_mode(sizes[perm[lo:hi]])
        w = jnp.asarray(fb.words)
        mv = jnp.asarray(FrameMetaArrays.pack_host(fb))
        jnp.sum(w).item()
        t = _device_slope_time([(uf, mo, cap, rm)], [w, mv], 4096, trials=3)
        ssizes = sizes[perm[lo:hi]]
        nsamp = int(np.minimum(fb.n_samples, 4096).sum())
        total_t += t
        total_n += nsamp
        print(
            f"span[{lo}:{hi}] lanes={hi-lo} pad_batch={fb.batch} "
            f"fused={uf} max_order={mo} sub_hint={cap} range_mode={rm} "
            f"bytes=[{ssizes.min()},{ssizes.max()}] "
            f"orders={sorted(set(int(o) for o in np.asarray(fb.order)[:, 0][:hi-lo]))} "
            f"n={sorted(set(int(x) for x in np.asarray(fb.n_samples)[:hi-lo]))} "
            f"t={t*1e3:.3f} ms  msps={nsamp/t/1e6:.1f}",
            flush=True,
        )
    print(f"TOTAL t={total_t*1e3:.3f} ms msps={total_n/total_t/1e6:.1f}")


if __name__ == "__main__":
    main()
