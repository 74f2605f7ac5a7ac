"""Public API tests: AlacContext, ALACFileReader, CLI, WAV I/O.

Covers the reference's session/adapter surface (SURVEY.md §1 L2/L3/L4):
frame-at-a-time reads, metadata getters with defaults, sample-accurate
seek with the post-seek leading-sample trim, leftover-buffered byte reads
and mid-stream repositioning.
"""

import io

import numpy as np
import pytest

import alacnet_tpu
from alacnet_tpu import AlacContext, ALACFileReader
from alacnet_tpu.codec.encoder import EncoderConfig
from alacnet_tpu.pcm import format_pcm_bytes, parse_pcm_bytes, read_wav, write_wav

from .corpus import encode_to_bytes, tone


@pytest.fixture(scope="module")
def stereo16():
    pcm = tone(4096 * 2 + 500, 2, 16)
    return pcm, encode_to_bytes(pcm, 44100, 16, EncoderConfig(order=6))


class TestAlacContext:
    def test_metadata(self, stereo16):
        pcm, data = stereo16
        with AlacContext(io.BytesIO(data)) as ctx:
            assert ctx.get_sample_rate() == 44100
            assert ctx.get_num_channels() == 2
            assert ctx.get_bits_per_sample() == 16
            assert ctx.get_bytes_per_sample() == 2
            assert ctx.get_num_samples() == pcm.shape[0]

    def test_read_frames_sequential(self, stereo16):
        pcm, data = stereo16
        ctx = AlacContext(io.BytesIO(data))
        got = ctx.read_all()
        np.testing.assert_array_equal(got, pcm)
        assert ctx.read_frame().size == 0  # EOF
        assert ctx.read() == b""

    def test_read_bytes_matches_reference_format(self, stereo16):
        pcm, data = stereo16
        ctx = AlacContext(io.BytesIO(data))
        first = ctx.read()
        np.testing.assert_array_equal(
            parse_pcm_bytes(first, 2, 2), pcm[:4096]
        )
        # last_sample_number advances by stts duration (AlacContext.cs:199)
        assert ctx.last_sample_number == 4096

    def test_seek_mid_frame_trims_offset(self, stereo16):
        pcm, data = stereo16
        ctx = AlacContext(io.BytesIO(data))
        ctx.set_position(5000)  # inside frame 1
        # Reference quirk preserved: SetPosition parks LastSampleNumber at
        # the end of the bracketing frame (AlacContext.cs:278-283), and the
        # next UnpackSamples adds the frame duration *again* (:199), so
        # after seek(5000) + one read it reads 8192 + 4096.
        assert ctx.last_sample_number == 8192
        got = ctx.read_frame()
        np.testing.assert_array_equal(got, pcm[5000:8192])
        assert ctx.last_sample_number == 12288

    def test_seek_past_eof_is_noop(self, stereo16):
        _, data = stereo16
        ctx = AlacContext(io.BytesIO(data))
        ctx.read_frame()
        before = ctx.last_sample_number
        ctx.set_position(10**9)
        assert ctx.last_sample_number == before

    def test_seek_backwards_and_forwards(self, stereo16):
        pcm, data = stereo16
        ctx = AlacContext(io.BytesIO(data))
        ctx.set_position(8192 + 100)
        a = ctx.read_frame()
        ctx.set_position(10)
        b = ctx.read_frame()
        np.testing.assert_array_equal(a, pcm[8292 : 4096 * 2 + 500])
        np.testing.assert_array_equal(b, pcm[10:4096])


class TestALACFileReader:
    def test_wave_format_and_length(self, stereo16):
        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        assert r.wave_format.sample_rate == 44100
        assert r.wave_format.bits_per_sample == 16
        assert r.wave_format.channels == 2
        assert r.wave_format.block_align == 4
        assert r.length == pcm.shape[0] * 4
        assert abs(r.total_time - pcm.shape[0] / 44100) < 1e-9

    def test_chunked_reads_arbitrary_sizes(self, stereo16):
        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        chunks, sizes = [], [1, 3, 4097, 64, 100000, 5]
        i = 0
        while True:
            c = r.read(sizes[i % len(sizes)])
            i += 1
            if not c:
                break
            chunks.append(c)
        got = parse_pcm_bytes(b"".join(chunks), 2, 2)
        np.testing.assert_array_equal(got, pcm)

    def test_reposition_mid_stream(self, stereo16):
        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        r.read(999)  # fill leftovers
        r.position = r.length // 2
        half_sample = (r.length // 2) // 4
        got = parse_pcm_bytes(r.read(400), 2, 2)
        np.testing.assert_array_equal(got, pcm[half_sample : half_sample + 100])

    def test_position_reflects_last_sample(self, stereo16):
        _, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        r.read(10)
        assert r.position == 4096 * 4  # one frame decoded

    def test_readinto(self, stereo16):
        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        buf = bytearray(100)
        assert r.readinto(buf, 0, 100) == 100
        np.testing.assert_array_equal(
            parse_pcm_bytes(bytes(buf), 2, 2), pcm[:25]
        )


class TestWav:
    def test_wav_roundtrip_16(self):
        pcm = tone(1000, 2, 16)
        buf = io.BytesIO()
        write_wav(buf, pcm, 44100, 16, 2)
        buf.seek(0)
        got, rate, bits = read_wav(buf)
        assert (rate, bits) == (44100, 16)
        np.testing.assert_array_equal(got, pcm)

    def test_wav_roundtrip_24(self):
        pcm = tone(1000, 2, 24, noise=2000.0)
        buf = io.BytesIO()
        write_wav(buf, pcm, 96000, 24, 2)
        buf.seek(0)
        got, rate, bits = read_wav(buf)
        assert (rate, bits) == (96000, 24)
        np.testing.assert_array_equal(got, pcm)

    def test_format_pcm_24_bytes(self):
        got = format_pcm_bytes(np.array([[1, -1]], np.int32), 3)
        assert got == bytes([1, 0, 0, 0xFF, 0xFF, 0xFF])


class TestCli:
    def test_info_decode_encode(self, tmp_path, stereo16, capsys):
        from alacnet_tpu.cli import main

        pcm, data = stereo16
        m4a = tmp_path / "t.m4a"
        m4a.write_bytes(data)
        assert main(["info", str(m4a)]) == 0
        out = capsys.readouterr().out
        assert "44100 Hz" in out

        wav = tmp_path / "t.wav"
        assert main(["decode", str(m4a), str(wav)]) == 0
        with open(wav, "rb") as f:
            got, rate, bits = read_wav(f)
        np.testing.assert_array_equal(got, pcm)

        m4a2 = tmp_path / "t2.m4a"
        assert main(["encode", str(wav), str(m4a2), "--order", "4"]) == 0
        got2 = alacnet_tpu.decode_file(str(m4a2)).pcm
        np.testing.assert_array_equal(got2, pcm)

    def test_decode_seek_middle(self, tmp_path, stereo16):
        from alacnet_tpu.cli import main

        pcm, data = stereo16
        m4a = tmp_path / "t.m4a"
        m4a.write_bytes(data)
        wav = tmp_path / "half.wav"
        assert main(["decode", str(m4a), str(wav), "--seek-middle"]) == 0
        with open(wav, "rb") as f:
            got, _, _ = read_wav(f)
        half = (pcm.shape[0] * 4 // 2) // 4
        np.testing.assert_array_equal(got, pcm[half:])


class TestReaderIoProtocol:
    def test_stdlib_io_interop(self, stereo16):
        """seek/tell/readable + shutil.copyfileobj compatibility."""
        import shutil

        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        assert r.readable() and r.seekable() and not r.writable()
        assert r.seek(400) == 400
        got = parse_pcm_bytes(r.read(40), 2, 2)
        np.testing.assert_array_equal(got, pcm[100:110])
        r.seek(0)
        sink = io.BytesIO()
        shutil.copyfileobj(r, sink, length=8192)
        np.testing.assert_array_equal(
            parse_pcm_bytes(sink.getvalue(), 2, 2), pcm
        )

    def test_seek_whence(self, stereo16):
        pcm, data = stereo16
        r = ALACFileReader(io.BytesIO(data))
        r.seek(100)
        assert r.seek(40, 1) == 140
        assert r.seek(-4, 2) == r.length - 4
        got = parse_pcm_bytes(r.read(10), 2, 2)
        np.testing.assert_array_equal(got, pcm[-1:])


def test_cli_stream_decode(tmp_path, stereo16):
    from alacnet_tpu.cli import main

    pcm, data = stereo16
    m4a = tmp_path / "s.m4a"
    m4a.write_bytes(data)
    wav = tmp_path / "s.wav"
    assert main(["decode", str(m4a), str(wav), "--stream", "1"]) == 0
    with open(wav, "rb") as f:
        got, rate, bits = read_wav(f)
    np.testing.assert_array_equal(got, pcm)


def test_seek_to_eof_reads_empty(stereo16):
    _, data = stereo16
    r = ALACFileReader(io.BytesIO(data))
    r.read(64)
    assert r.seek(0, 2) == r.length
    assert r.read(100) == b""
    assert r.seek(r.length + 999) == r.length + 999
    assert r.read(1) == b""


class TestMalformedInputTermination:
    """Round-2 regression tests (VERDICT.md weak #1/#3)."""

    def _undercovered(self) -> bytes:
        """stts covers fewer frames than stsz lists."""
        from alacnet_tpu.codec.cookie import default_cookie
        from alacnet_tpu.codec.encoder import AlacEncoder
        from alacnet_tpu.container.mux import write_m4a

        params = default_cookie(44100, 16, 2, max_samples_per_frame=256)
        enc = AlacEncoder(params, EncoderConfig(order=4))
        pcm = tone(256 * 4, 2, 16)
        frames = [
            enc.encode_frame(pcm[i * 256 : (i + 1) * 256]) for i in range(4)
        ]
        buf = io.BytesIO()
        # Lie in stts: only 2 of the 4 frames carry durations.
        write_m4a(buf, params, frames, [256, 256])
        return buf.getvalue()

    def test_read_all_terminates_on_stts_undercoverage(self):
        # Round 1 spun forever here: read_frame returned empty without
        # advancing the cursor.  The reference terminates via a 0-byte
        # read (AlacContext.cs:182-193); we park at EOF.
        import signal

        from alacnet_tpu.codec.cookie import default_cookie
        from alacnet_tpu.codec.encoder import AlacEncoder
        from alacnet_tpu.container.mux import write_m4a

        data = self._undercovered()

        # Warm the decode executable OUTSIDE the watchdog window: a
        # well-formed twin of the same shape compiles the same jit
        # cache entries, so the alarm below times only the read loop's
        # termination — a fresh XLA compile under 4-way xdist
        # contention was measured blowing a 30 s budget on this 1-core
        # box (false positive; the loop itself terminates in ms).
        params = default_cookie(44100, 16, 2, max_samples_per_frame=256)
        enc = AlacEncoder(params, EncoderConfig(order=4))
        pcm = tone(256 * 4, 2, 16)
        wbuf = io.BytesIO()
        write_m4a(
            wbuf, params,
            [enc.encode_frame(pcm[i * 256 : (i + 1) * 256]) for i in range(4)],
            [256] * 4,
        )
        with AlacContext(io.BytesIO(wbuf.getvalue())) as warm:
            warm.read_all()

        def _boom(*a):  # pragma: no cover - only fires on regression
            raise TimeoutError("read_all did not terminate")

        old = signal.signal(signal.SIGALRM, _boom)
        signal.alarm(30)
        try:
            with AlacContext(io.BytesIO(data)) as ctx:
                out = ctx.read_all()
                # Covered frames decode; the stts-less tail is dropped.
                assert out.shape[0] == 512
                # Subsequent reads stay at EOF (reference: repeated
                # 0-byte reads).
                assert ctx.read() == b""
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def test_cli_stream_zero_frames(self, tmp_path):
        # --stream on a zero-frame file must write a valid empty WAV
        # (round 1: UnboundLocalError on the header fields).
        from alacnet_tpu.cli import main
        from alacnet_tpu.codec.cookie import default_cookie
        from alacnet_tpu.container.mux import write_m4a

        params = default_cookie(44100, 16, 2)
        src = tmp_path / "empty.m4a"
        with open(src, "wb") as f:
            write_m4a(f, params, [], [])
        dst = tmp_path / "empty.wav"
        assert main(["decode", str(src), str(dst), "--stream"]) == 0
        with open(dst, "rb") as f:
            pcm, rate, bits = read_wav(f)
        assert pcm.shape[0] == 0 and rate == 44100 and bits == 16

    def test_cli_stream_roundtrip(self, tmp_path, stereo16):
        pcm, data = stereo16
        src = tmp_path / "t.m4a"
        src.write_bytes(data)
        dst = tmp_path / "t.wav"
        from alacnet_tpu.cli import main

        assert main(["decode", str(src), str(dst), "--stream", "2"]) == 0
        with open(dst, "rb") as f:
            got, rate, bits = read_wav(f)
        np.testing.assert_array_equal(got, pcm)

    def test_sparse_chunk_gaps_bounded_memory(self):
        """A file with huge chunk gaps must not balloon the window read
        (round-2 review finding: span read covering the gaps)."""
        from alacnet_tpu.codec.cookie import default_cookie
        from alacnet_tpu.codec.encoder import AlacEncoder
        from alacnet_tpu.container.mux import write_m4a

        params = default_cookie(44100, 16, 2, max_samples_per_frame=64)
        enc = AlacEncoder(params, EncoderConfig(order=2))
        pcm = tone(64 * 6, 2, 16)
        frames = [enc.encode_frame(pcm[i * 64 : (i + 1) * 64]) for i in range(6)]
        buf = io.BytesIO()
        # 2 frames per chunk with 8 MB of dead bytes between chunks.
        write_m4a(buf, params, frames, [64] * 6, frames_per_chunk=2,
                  chunk_gap=8 << 20)
        buf.seek(0)
        with AlacContext(io.BytesIO(buf.getvalue()), window=6) as ctx:
            out = ctx.read_all()
        np.testing.assert_array_equal(out, pcm)


class TestReaderFuzz:
    def test_random_seek_read_interleaving(self, stereo16):
        """Random seek/read sequences must always return exactly the
        PCM bytes at the reader position (leftover-buffer + seek-trim
        interplay, ALACFileReader.cs:63-116 semantics)."""
        import io

        pcm, data = stereo16
        ref_bytes = pcm.astype("<i2").tobytes()
        rng = np.random.default_rng(0xC0FFEE)
        with alacnet_tpu.ALACFileReader(io.BytesIO(data)) as r:
            ba = r.wave_format.block_align
            length = r.length
            pos = 0
            for _ in range(60):
                if rng.random() < 0.4:
                    pos = int(rng.integers(0, length // ba + 1)) * ba
                    r.position = pos
                want = int(rng.integers(0, 5000))
                got = r.read(want)
                exp = ref_bytes[pos : pos + want]
                assert got == exp[: len(got)] and len(got) == len(exp)
                pos += len(got)


class TestReadahead:
    def test_sequential_read_uses_prefetched_windows(self, tmp_path):
        """Sequential reads must consume the one-slot readahead (window
        k+1 dispatched while k is served) and stay bit-exact."""
        import alacnet_tpu
        from alacnet_tpu.context import AlacContext

        from .corpus import encode_to_bytes, tone

        pcm = tone(4096 * 6 + 100, 2, 16, seed=9)
        p = tmp_path / "ra.m4a"
        p.write_bytes(encode_to_bytes(pcm, 44100, 16))
        with open(p, "rb") as f:
            ctx = AlacContext(f, window=2)
            got = []
            consumed_prefetch = False
            while True:
                fr = ctx.read_frame()
                if fr.size == 0:
                    break
                got.append(fr)
                if ctx._prefetch is not None:
                    consumed_prefetch = True
            ctx.close()
        assert consumed_prefetch, "readahead never armed"
        np.testing.assert_array_equal(np.concatenate(got), pcm)

    def test_seek_discards_stale_prefetch(self, tmp_path):
        from alacnet_tpu.context import AlacContext

        from .corpus import encode_to_bytes, tone

        pcm = tone(4096 * 6, 2, 16, seed=10)
        p = tmp_path / "ra2.m4a"
        p.write_bytes(encode_to_bytes(pcm, 44100, 16))
        with open(p, "rb") as f:
            ctx = AlacContext(f, window=2)
            ctx.read_frame()  # window 0 decoded; window 2 prefetched
            assert ctx._prefetch is not None and ctx._prefetch[0] == 2
            # jump far: stale prefetch must not corrupt the result
            fr = ctx._frame_samples(5)
            np.testing.assert_array_equal(fr, pcm[5 * 4096 : 6 * 4096])
            ctx.close()
