"""Decode-throughput benchmark harness.

The reference publishes no numbers (BASELINE.md); the north-star target is
>= 1000x realtime per chip for 44.1 kHz/16-bit stereo batch decode
(~88.2 Msamples/s, BASELINE.json).  This harness synthesizes a realistic
compressed corpus (adaptive order-6 FIR, music-like spectra — the
expensive decode path), tiles it to the requested flight size, and times
the full device pipeline (header parse excluded; it is benchmarked and
reported separately as the host-side stage).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from .codec.encoder import AlacEncoder, EncoderConfig
from .codec.cookie import default_cookie
from .codec.framemeta_vec import parse_frame_headers_vec as parse_frame_headers
from .ops.frame_decode import FrameMetaArrays, decode_frames
from .parallel.pipeline import pad_frame_batch

#: North-star: 1000x realtime, 44.1 kHz stereo (BASELINE.json).
NORTH_STAR_MSAMPLES = 88.2


def make_corpus_frames(
    num_distinct: int = 32,
    frame_samples: int = 4096,
    bits: int = 16,
    channels: int = 2,
    order: int = 6,
    seed: int = 42,
) -> tuple[list[bytes], "object"]:
    """Encode ``num_distinct`` music-like frames; returns (payloads, params)."""
    rng = np.random.default_rng(seed)
    n = num_distinct * frame_samples
    t = np.arange(n)
    amp = (1 << (bits - 1)) * 0.12
    chans = []
    for c in range(channels):
        sig = (
            amp * np.sin(t * 0.013 + c)
            + 0.5 * amp * np.sin(t * 0.0913 + 2.7 * c)
            + 0.1 * amp * np.sin(t * 0.537)
            + rng.normal(0, amp * 0.01, n)
        )
        chans.append(sig)
    lim = 1 << (bits - 1)
    pcm = np.clip(np.stack(chans, axis=1), -lim, lim - 1).astype(np.int32)
    params = default_cookie(44100, bits, channels, frame_samples)
    enc = AlacEncoder(params, EncoderConfig(order=order))
    payloads = [
        enc.encode_frame(pcm[i * frame_samples : (i + 1) * frame_samples])
        for i in range(num_distinct)
    ]
    return payloads, params


def run_benchmark(
    batch: int = 4096,
    seconds_of_audio: float | None = None,
    bits: int = 16,
    channels: int = 2,
    frame_samples: int = 4096,
    repeats: int = 3,
    include_host: bool = False,
) -> dict:
    """Time batched decode; returns the bench.py JSON record."""
    if seconds_of_audio:
        batch = max(1, int(seconds_of_audio * 44100 / frame_samples))
    distinct, params = make_corpus_frames(
        num_distinct=min(batch, 32),
        frame_samples=frame_samples,
        bits=bits,
        channels=channels,
    )
    payloads = [distinct[i % len(distinct)] for i in range(batch)]

    t0 = time.perf_counter()
    fb = parse_frame_headers(payloads, params)
    host_parse_s = time.perf_counter() - t0
    fb = pad_frame_batch(fb, batch)
    from .parallel.pipeline import _fused_plan

    use_fused, max_order = _fused_plan(fb)
    meta = FrameMetaArrays.from_batch(fb)
    # Distinct input buffers per repeat: identical repeated dispatches can
    # be short-circuited by the runtime (observed on the axon platform),
    # so roll the lane axis — same work, different buffers.  Metadata must
    # roll identically to stay consistent with the payloads.
    variants = []
    for r in range(repeats + 1):  # +1: warm-up gets its own buffers
        w = np.roll(fb.words, r, axis=0)
        mv = FrameMetaArrays.from_batch(fb)._replace(
            **{
                f: jnp.asarray(np.roll(np.asarray(getattr(meta, f)), r, axis=0))
                for f in FrameMetaArrays._fields
            }
        )
        variants.append((jnp.asarray(w), mv))
    import jax

    for v in variants:  # stage on device before timing (tunnel xfer is slow)
        jax.block_until_ready(v[0])
        jax.block_until_ready(list(v[1]))

    # Warm-up (compile)
    out, n = decode_frames(
        *variants[repeats], frame_samples, use_fused=use_fused, max_order=max_order
    )
    _ = jnp.sum(out).item()

    times = []
    for r in range(repeats):
        w, mv = variants[r]
        t0 = time.perf_counter()
        out, n = decode_frames(
            w, mv, frame_samples, use_fused=use_fused, max_order=max_order
        )
        _ = jnp.sum(out).item()  # force full materialization
        times.append(time.perf_counter() - t0)
    best = min(times)
    total_samples = int(np.asarray(n).sum())
    # Parity gate (SURVEY.md §7 step 7): the benchmarked kernel's output
    # must match the reference-semantics XLA scan path bit for bit.
    if use_fused:
        fused_out, _ = decode_frames(
            *variants[0], frame_samples, use_fused=True, max_order=max_order
        )
        ref_out, _ = decode_frames(
            *variants[0], frame_samples, use_fused=False, max_order=max_order
        )
        parity_ok = bool(jnp.array_equal(fused_out, ref_out).item())
    else:
        parity_ok = True
    if include_host:
        best += host_parse_s
    msps = total_samples / best / 1e6
    realtime = msps * 1e6 / 44100.0
    import jax

    return {
        "metric": "decode throughput (44.1kHz/%d-bit %dch, order-6 adaptive FIR)"
        % (bits, channels),
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / NORTH_STAR_MSAMPLES, 4),
        "realtime_x": round(realtime, 1),
        "batch_frames": batch,
        "device_s": round(best, 5),
        "host_parse_s": round(host_parse_s, 5),
        "repeats": repeats,
        "backend": jax.default_backend(),
        "fused_kernel": use_fused,
        "parity_ok": parity_ok,
    }
