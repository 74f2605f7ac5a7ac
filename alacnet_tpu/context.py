"""AlacContext — the session facade (decode side of the public API).

Mirrors the reference's only public decoder class
(/root/reference/ALACDecoder/AlacContext.cs:20-338): construct over a
seekable stream, query metadata (with the reference's 44100/2/16-bit
defaults), read decoded PCM frame-at-a-time, and seek sample-accurately.

Differences by design (all documented):
  * decoding happens in batched device windows (parallel/pipeline.py)
    instead of one frame per call — ``read()`` still returns one frame's
    bytes at a time for drop-in behavior, but the device decodes
    ``window`` frames per dispatch;
  * ``set_position`` is sample-accurate for 24-bit too (the reference's
    int/byte unit mix at AlacContext.cs:200-201,284-286 truncates 24-bit
    seeks; for 16-bit our byte output is identical);
  * sample tables are consulted via prefix sums, not per-frame linear
    stts walks (AlacContext.cs:130-156).
"""

from __future__ import annotations

import threading
from typing import BinaryIO

import numpy as np

from .container import demux
from .errors import SampleReadError

from .pcm import format_pcm_bytes


class AlacContext:
    """Decode session over one `.m4a` stream."""

    def __init__(
        self,
        stream: BinaryIO,
        dispose_stream: bool = False,
        window: int | None = None,
    ):
        from .config import DEFAULT

        self._stream = stream
        self._dispose_stream = dispose_stream
        self._window = max(1, window if window is not None else DEFAULT.stream_window)
        self.info = demux.parse(stream)  # raises HeaderError like the ctor
        self._tables = self.info.tables
        self._offsets = self._tables.frame_file_offsets()
        self._sizes = self._tables.frame_byte_sizes
        self._current_sample_block = 0
        self._offset_samples = 0  # leading samples to trim after a seek
        self.last_sample_number = 0  # AlacContext.cs:76
        self._cache_first = -1
        self._cache_out: np.ndarray | None = None
        self._cache_n: np.ndarray | None = None
        self._lock = threading.Lock()
        # One-slot readahead: (first_frame, Future) for the window the
        # sequential reader will want next (VERDICT r2 next #10).
        self._prefetch: tuple[int, object] | None = None
        self._executor = None

    # -- metadata getters (AlacContext.cs:83-122) ---------------------------

    def get_sample_rate(self) -> int:
        return self.info.sample_rate_or_default()

    def get_num_channels(self) -> int:
        return self.info.num_channels_or_default()

    def get_bits_per_sample(self) -> int:
        return self.info.bits_per_sample_or_default()

    def get_bytes_per_sample(self) -> int:
        return self.info.bytes_per_sample_or_default()

    def get_num_samples(self) -> int:
        """Total PCM samples, or -1 if the tables are inconsistent."""
        return self._tables.num_samples()

    @property
    def num_frames(self) -> int:
        return self._tables.num_frames

    # -- decode window management -------------------------------------------

    def _read_window_bytes(self, first: int):
        """Read the coded bytes of frames [first, first+window).

        Stream IO stays on the CALLER's thread (the prefetch worker only
        ever decodes an already-read blob), so the reposition lock's
        guarantees are untouched.
        """
        hi = min(first + self._window, self.num_frames)
        offs = self._offsets[first:hi].astype(np.int64)
        sizes = self._sizes[first:hi].astype(np.int64)
        lo_byte = int(offs.min())
        hi_byte = int((offs + sizes).max())
        payload_bytes = int(sizes.sum())
        span = hi_byte - lo_byte
        if span <= max(4 * payload_bytes, 1 << 20):
            self._stream.seek(lo_byte)
            blob = np.frombuffer(self._stream.read(span), np.uint8)
            blob_offs = offs - lo_byte
        else:
            # Sparse layout (interleaved tracks / large chunk gaps): a
            # span read would pull the gaps into memory too.  Assemble a
            # compact blob with one read per frame instead.
            blob = np.empty(payload_bytes, np.uint8)
            blob_offs = np.concatenate(([0], np.cumsum(sizes)))[:-1]
            for f in range(hi - first):
                self._stream.seek(int(offs[f]))
                chunk = self._stream.read(int(sizes[f]))
                blob[int(blob_offs[f]) : int(blob_offs[f]) + len(chunk)] = (
                    np.frombuffer(chunk, np.uint8)
                )
        return blob, blob_offs, sizes

    @staticmethod
    def _decode_window_blob(blob, blob_offs, sizes, params):
        from .parallel.pipeline import decode_blob

        out, n, _ = decode_blob(
            blob, blob_offs, sizes, params, params.max_samples_per_frame
        )
        return out, n

    def _decode_window(self, first: int) -> None:
        """Decode frames [first, first+window) through the blob path.

        One contiguous-span read + the native parse/pack pipeline
        (parallel.pipeline.decode_blob) instead of a per-frame Python
        seek/read loop — frames of a window are adjacent in mdat except
        across chunk gaps, so a single [min, max) span read covers them.

        Sequential reads get READAHEAD: after serving window k this
        dispatches window k+1 on a one-slot worker, so the device (and
        the parse pipeline) works on the next window while the caller
        consumes this one instead of idling between windows.
        """
        params = self.info.params
        if self._prefetch is not None and self._prefetch[0] == first:
            _, fut = self._prefetch
            self._prefetch = None
            out, n = fut.result()
        else:
            out, n = self._decode_window_blob(
                *self._read_window_bytes(first), params
            )
        self._cache_first = first
        self._cache_out = out
        self._cache_n = n
        nxt = first + self._window
        if nxt < self.num_frames and (
            self._prefetch is None or self._prefetch[0] != nxt
        ):
            if self._executor is None:
                import concurrent.futures

                self._executor = concurrent.futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="alac-readahead"
                )
            args = self._read_window_bytes(nxt)
            self._prefetch = (
                nxt,
                self._executor.submit(self._decode_window_blob, *args, params),
            )

    def _frame_samples(self, frame: int) -> np.ndarray:
        """Decoded (n, channels) int32 samples of one frame."""
        if not (
            self._cache_first >= 0
            and self._cache_first <= frame < self._cache_first + self._window
        ):
            self._decode_window(frame)
        i = frame - self._cache_first
        nch = self.get_num_channels()
        return self._cache_out[i, : self._cache_n[i], :nch]

    # -- streaming read (AlacContext.cs:163-204) -----------------------------

    def read_frame(self) -> np.ndarray:
        """Decode the next frame -> (n, channels) int32 (empty at EOF).

        Applies the post-seek leading-sample trim (AlacContext.cs:200-202)
        and advances ``last_sample_number`` by the frame's stts duration
        (AlacContext.cs:199).
        """
        with self._lock:
            block = self._current_sample_block
            if block >= self.num_frames:
                return np.zeros((0, self.get_num_channels()), np.int32)
            try:
                duration = self._tables.frame_duration(block)
            except SampleReadError:
                # Park at EOF: the reference's stts walk failure yields a
                # 0-byte read and its caller stops (AlacContext.cs:182-193).
                # Without advancing, read_all() on an stts-undercovered
                # file would spin forever re-reading the same frame.
                self._current_sample_block = self.num_frames
                return np.zeros((0, self.get_num_channels()), np.int32)
            samples = self._frame_samples(block)
            self._current_sample_block = block + 1
            self.last_sample_number += int(duration)
            if self._offset_samples:
                samples = samples[self._offset_samples :]
                self._offset_samples = 0
            return samples

    def read(self) -> bytes:
        """Decode the next frame -> little-endian PCM bytes ('' at EOF)."""
        samples = self.read_frame()
        if samples.size == 0:
            return b""
        return format_pcm_bytes(samples, self.get_bytes_per_sample())

    def read_all(self) -> np.ndarray:
        """Decode from the current position to EOF -> (N, channels) int32."""
        parts = []
        while True:
            s = self.read_frame()
            if s.size == 0 and self._current_sample_block >= self.num_frames:
                break
            parts.append(s)
        nch = self.get_num_channels()
        if not parts:
            return np.zeros((0, nch), np.int32)
        return np.concatenate(parts)

    # -- seek (AlacContext.cs:262-295) ----------------------------------------

    def set_position(self, position: int, clamp_to_eof: bool = False) -> None:
        """Seek to an absolute PCM sample position.

        By default past-EOF positions leave the state unchanged, like the
        reference's walk running off the table end (AlacContext.cs:266-294
        — subsequent reads then continue from the *old* position).
        ``clamp_to_eof=True`` instead parks at end-of-stream so the next
        read returns empty (the io-protocol behavior ALACFileReader.seek
        needs).
        """
        with self._lock:
            frame, _, start, end = self._tables.locate_pcm_sample(int(position))
            if frame >= self.num_frames:
                if clamp_to_eof:
                    self._current_sample_block = self.num_frames
                    self.last_sample_number = end
                    self._offset_samples = 0
                return
            self._current_sample_block = frame
            self.last_sample_number = end
            self._offset_samples = int(position) - start

    # -- lifecycle -------------------------------------------------------------

    def close(self) -> None:
        if self._executor is not None:
            self._executor.shutdown(wait=False, cancel_futures=True)
            self._executor = None
        self._prefetch = None
        if self._dispose_stream:
            self._stream.close()

    dispose = close  # reference naming (AlacContext.cs:297-318)

    def __enter__(self) -> "AlacContext":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
