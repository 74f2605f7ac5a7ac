"""High-throughput batch decode API — the capability the reference lacks.

``decode_files`` pools coded frames from *all* inputs into shared device
batches (each frame carries its own cookie parameters, so 16/24-bit,
mono/stereo and different sample rates mix freely in one dispatch) and
splits the decoded lanes back per file.  This is the framework's
production entry point: thousands of frames in flight per chip.
"""

from __future__ import annotations

import dataclasses
import os
from typing import BinaryIO, Iterable

import numpy as np

from .container import demux
from .parallel.pipeline import decode_blob


@dataclasses.dataclass
class DecodedAudio:
    """One file's decode result."""

    pcm: np.ndarray  # (N, channels) int32
    sample_rate: int
    bits_per_sample: int
    channels: int
    path: str | None = None

    @property
    def num_samples(self) -> int:
        return int(self.pcm.shape[0])

    @property
    def duration_seconds(self) -> float:
        return self.num_samples / self.sample_rate


def _collect(stream: BinaryIO):
    """Parse the container and read the raw bytes once (zero-copy blob)."""
    info = demux.parse(stream)
    stream.seek(0)
    blob = np.frombuffer(stream.read(), np.uint8)
    return info, blob


def decode_streams(streams: Iterable[BinaryIO]) -> list[DecodedAudio]:
    """Decode many open .m4a streams in pooled device batches."""
    infos, spans = [], []
    blobs, all_offsets, all_sizes, all_params = [], [], [], []
    blob_base = 0
    total_frames = 0
    for stream in streams:
        info, blob = _collect(stream)
        infos.append(info)
        offsets = info.tables.frame_file_offsets()
        sizes = info.tables.frame_byte_sizes
        spans.append((total_frames, total_frames + len(offsets)))
        blobs.append(blob)
        all_offsets.append(offsets + blob_base)
        all_sizes.append(sizes)
        all_params.extend([info.params] * len(offsets))
        blob_base += blob.size
        total_frames += len(offsets)
    if not total_frames:
        return [
            DecodedAudio(
                pcm=np.zeros((0, info.num_channels_or_default()), np.int32),
                sample_rate=info.sample_rate_or_default(),
                bits_per_sample=info.bits_per_sample_or_default(),
                channels=info.num_channels_or_default(),
            )
            for info in infos
        ]
    max_s = max(i.params.max_samples_per_frame for i in infos)
    out, n = decode_blob(
        np.concatenate(blobs),
        np.concatenate(all_offsets),
        np.concatenate(all_sizes),
        all_params,
        max_s,
    )
    # Vectorized ragged assembly: one boolean compress instead of a
    # per-frame concatenate (which costs ~0.5 ms/frame in Python).
    S = out.shape[1]
    valid = np.arange(S)[None, :] < n[:, None]  # (F, S)
    results = []
    for info, (lo, hi) in zip(infos, spans):
        nch = info.num_channels_or_default()
        if hi > lo:
            block = out[lo:hi, :, :nch]
            pcm = block.reshape(-1, nch)[valid[lo:hi].reshape(-1)]
        else:
            pcm = np.zeros((0, nch), np.int32)
        results.append(
            DecodedAudio(
                pcm=pcm,
                sample_rate=info.sample_rate_or_default(),
                bits_per_sample=info.bits_per_sample_or_default(),
                channels=nch,
            )
        )
    return results


def decode_files(paths: Iterable[str | os.PathLike]) -> list[DecodedAudio]:
    """Decode many .m4a files in pooled device batches."""
    paths = list(paths)
    streams = [open(p, "rb") for p in paths]
    try:
        results = decode_streams(streams)
    finally:
        for s in streams:
            s.close()
    for r, p in zip(results, paths):
        r.path = os.fspath(p)
    return results


def decode_file(path: str | os.PathLike) -> DecodedAudio:
    """Decode a single .m4a file."""
    return decode_files([path])[0]
