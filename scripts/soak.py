"""Soak test: encode a mixed-format synthetic album, batch-decode it,
verify every file bit-exactly, and report pipeline throughput.

    python scripts/soak.py [--minutes 10] [--outdir /tmp/alac_soak]

Exercises the full production path end to end: native encoder -> muxer ->
demux -> pooled batched device decode (fused kernel on TPU) -> ragged
assembly, across 16/24-bit, mono/stereo, multiple rates and predictor
orders, mdat-first layouts and chunk gaps.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import alacnet_tpu
from alacnet_tpu.codec.encoder import EncoderConfig
from alacnet_tpu.utils.observability import GLOBAL_STATS


def synth(n: int, channels: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    amp = (1 << (bits - 1)) * 0.15
    f = 0.003 + 0.0005 * np.sin(t * 3e-5 + seed)
    chans = []
    for c in range(channels):
        sig = (
            amp * np.sin(np.cumsum(f) + c)
            + 0.4 * amp * np.sin(np.cumsum(2.1 * f))
            + rng.normal(0, amp * 0.015, n)
        )
        chans.append(sig)
    lim = 1 << (bits - 1)
    return np.clip(np.stack(chans, 1), -lim, lim - 1).astype(np.int32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--outdir", default="/tmp/alac_soak")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    specs = [
        ("t16s_o6", 44100, 16, 2, EncoderConfig(order=6), {}),
        ("t16m_o31", 44100, 16, 1, EncoderConfig(order=31), {}),
        ("t24s_eb", 96000, 24, 2, EncoderConfig(order=4, uncompressed_bytes=1), {}),
        ("t16s_mdat1", 48000, 16, 2, EncoderConfig(order=8), {"mdat_first": True}),
        ("t16s_gap", 44100, 16, 2, EncoderConfig(order=2), {"chunk_gap": 64}),
        ("t24s_o6", 44100, 24, 2, EncoderConfig(order=6), {}),
    ]
    per_file = int(args.minutes * 60 / len(specs))
    paths, sources = [], []
    t0 = time.time()
    for i, (name, rate, bits, ch, cfg, kw) in enumerate(specs):
        pcm = synth(rate * per_file, ch, bits, seed=i)
        path = os.path.join(args.outdir, f"{name}.m4a")
        with open(path, "wb") as f:
            alacnet_tpu.encode_m4a(f, pcm, rate, bits, cfg, **kw)
        paths.append(path)
        sources.append(pcm)
    enc_s = time.time() - t0
    total = sum(p.shape[0] for p in sources)
    print(f"encoded {total} samples across {len(paths)} files in {enc_s:.1f}s")

    GLOBAL_STATS.reset()
    t0 = time.time()
    results = alacnet_tpu.decode_files(paths)
    dec_s = time.time() - t0
    ok = all(
        np.array_equal(r.pcm, src) for r, src in zip(results, sources)
    )
    print(
        f"decoded in {dec_s:.2f}s end-to-end "
        f"({total / dec_s / 1e6:.1f} Msamples/s incl host+IO) "
        f"bit_exact={ok}"
    )
    print("stats:", GLOBAL_STATS.snapshot())
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
