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

    pcm: np.ndarray  # (N, channels) int16/int32
    sample_rate: int
    bits_per_sample: int
    channels: int
    path: str | None = None
    #: Frame indices that failed to parse (lenient mode only; their
    #: samples are omitted). Empty in strict mode.
    bad_frames: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64)
    )

    @property
    def num_samples(self) -> int:
        return int(self.pcm.shape[0])

    @property
    def duration_seconds(self) -> float:
        return self.num_samples / self.sample_rate

    def as_float(self, dtype=np.float32) -> np.ndarray:
        """PCM normalized to [-1, 1) floats (the ML-ingestion view):
        ``pcm / 2**(bits_per_sample-1)``."""
        return (self.pcm / float(1 << (self.bits_per_sample - 1))).astype(dtype)


def _collect(stream: BinaryIO):
    """Parse the container and read the raw bytes once (zero-copy blob)."""
    info = demux.parse(stream)
    stream.seek(0)
    blob = np.frombuffer(stream.read(), np.uint8)
    return info, blob


def decode_streams(
    streams: Iterable[BinaryIO], strict: bool | None = None, mesh=None
) -> list[DecodedAudio]:
    """Decode many open .m4a streams in pooled device batches.

    ``strict=False`` skips (and reports) undecodable frames instead of
    raising; the default comes from config.DEFAULT.

    ``mesh``: shard every batch's lane axis across a jax.sharding.Mesh —
    the multi-chip DP path (parallel/mesh.py) from the top-level API.
    """
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
    out, n, status = decode_blob(
        np.concatenate(blobs),
        np.concatenate(all_offsets),
        np.concatenate(all_sizes),
        all_params,
        max_s,
        strict=strict,
        mesh=mesh,
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
            if (
                info.bits_per_sample_or_default() == 16
                and pcm.dtype != np.int16
            ):
                # A mixed 16/24-bit pool upcasts the pooled array to
                # int32 at concat; 16-bit files still ship int16.
                pcm = pcm.astype(np.int16)
            bad = np.flatnonzero(status[lo:hi]).astype(np.int64)
        else:
            pcm = np.zeros((0, nch), np.int32)
            bad = np.zeros(0, np.int64)
        results.append(
            DecodedAudio(
                pcm=pcm,
                sample_rate=info.sample_rate_or_default(),
                bits_per_sample=info.bits_per_sample_or_default(),
                channels=nch,
                bad_frames=bad,
            )
        )
    return results


def decode_files(
    paths: Iterable[str | os.PathLike], strict: bool | None = None, mesh=None
) -> list[DecodedAudio]:
    """Decode many .m4a files in pooled device batches."""
    paths = list(paths)
    streams = [open(p, "rb") for p in paths]
    try:
        results = decode_streams(streams, strict=strict, mesh=mesh)
    finally:
        for s in streams:
            s.close()
    for r, p in zip(results, paths):
        r.path = os.fspath(p)
    return results


def decode_file(path: str | os.PathLike, strict: bool | None = None) -> DecodedAudio:
    """Decode a single .m4a file."""
    return decode_files([path], strict=strict)[0]


@dataclasses.dataclass
class DecodeCursor:
    """Resumable batch-job position: (file, next frame index).

    The codec analog of checkpoint/resume (SURVEY.md §5): ALAC frames
    carry no inter-frame state, so a job checkpoints as a frame cursor
    and resumes with a table-driven seek — the same property behind
    AlacContext.SetPosition (AlacContext.cs:262-295).
    """

    path: str
    next_frame: int = 0

    @property
    def done(self) -> bool:
        return self.next_frame < 0


def decode_resumable(
    cursor: DecodeCursor, max_frames: int = 4096, strict: bool | None = None
) -> tuple[DecodedAudio, DecodeCursor]:
    """Decode up to ``max_frames`` frames from the cursor position.

    Returns the decoded chunk and the advanced cursor (``done`` once the
    file is exhausted).  Work can stop and resume across processes with
    only the cursor persisted.
    """
    with open(cursor.path, "rb") as f:
        info = demux.parse(f)
        offsets = info.tables.frame_file_offsets()
        sizes = info.tables.frame_byte_sizes
        lo = cursor.next_frame
        hi = min(lo + max_frames, len(offsets))
        # Read only this chunk's byte range (bounded memory + I/O).
        if hi > lo:
            lo_byte = int(offsets[lo:hi].min())
            hi_byte = int((offsets[lo:hi] + sizes[lo:hi]).max())
            f.seek(lo_byte)
            blob = np.frombuffer(f.read(hi_byte - lo_byte), np.uint8)
        else:
            lo_byte = 0
            blob = np.zeros(0, np.uint8)
    out, n, status = decode_blob(
        blob,
        offsets[lo:hi] - lo_byte,
        sizes[lo:hi],
        info.params,
        info.params.max_samples_per_frame,
        strict=strict,
    )
    nch = info.num_channels_or_default()
    S = out.shape[1] if out.size else info.params.max_samples_per_frame
    valid = np.arange(S)[None, :] < n[:, None]
    pcm = out[:, :, :nch].reshape(-1, nch)[valid.reshape(-1)] if hi > lo else np.zeros((0, nch), np.int32)
    result = DecodedAudio(
        pcm=pcm,
        sample_rate=info.sample_rate_or_default(),
        bits_per_sample=info.bits_per_sample_or_default(),
        channels=nch,
        path=cursor.path,
        bad_frames=np.flatnonzero(status).astype(np.int64) + lo,
    )
    nxt = DecodeCursor(cursor.path, hi if hi < len(offsets) else -1)
    return result, nxt
