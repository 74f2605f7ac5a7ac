"""Container-layer tests: bytestream, demux, sample tables, cookie."""

import io

import numpy as np
import pytest

from alacnet_tpu.codec.cookie import CodecParams, default_cookie
from alacnet_tpu.container import demux
from alacnet_tpu.container.bytestream import ByteCursor, fourcc, split_fourcc
from alacnet_tpu.container.tables import SampleTables
from alacnet_tpu.errors import HeaderError, MdatPosStatus, SampleReadError

from .corpus import encode_to_bytes, tone


class TestByteCursor:
    def test_big_endian_reads(self):
        c = ByteCursor(io.BytesIO(bytes([0x12, 0x34, 0x56, 0x78, 0xAB, 0xCD])))
        assert c.read_u32() == 0x12345678
        assert c.read_u16() == 0xABCD
        assert c.position == 6

    def test_skip_backwards_raises(self):
        c = ByteCursor(io.BytesIO(b"abcd"))
        with pytest.raises(ValueError):
            c.skip(-1)

    def test_seek_does_not_touch_position(self):
        # MyStream.Seek moves the stream only (MyStream.cs:103-114).
        c = ByteCursor(io.BytesIO(b"abcdefgh"))
        c.read_u32()
        assert c.seek(0) == 0
        assert c.position == 4

    def test_eof(self):
        c = ByteCursor(io.BytesIO(b"ab"))
        assert not c.eof
        c.read(2)
        assert c.eof

    def test_fourcc(self):
        assert fourcc("mdat") == 0x6D646174
        assert split_fourcc(fourcc("moov")) == "moov"


class TestCookie:
    def test_roundtrip(self):
        p = default_cookie(48000, 24, 2)
        q = CodecParams.from_stsd_payload(p.to_stsd_payload())
        assert p == q

    def test_reference_offsets(self):
        # Bits/sample at payload[17], channels at [21], rate at [32:36] —
        # the offsets QTMovieT reads (QTMovieT.cs:508-513).
        p = default_cookie(96000, 24, 1)
        payload = p.to_stsd_payload()
        assert payload[17] == 24
        assert payload[21] == 1
        assert int.from_bytes(payload[32:36], "big") == 96000

    def test_derived(self):
        p = default_cookie(44100, 24, 2)
        assert p.bytes_per_sample == 3
        assert p.rice_kmodifier_mask == (1 << 0x0E) - 1
        assert p.rice_history_mult_for(4) == 4 * (0x28 // 4)


class TestDemux:
    def test_parse_standard(self):
        data = encode_to_bytes(tone(5000, 2, 16), 44100, 16)
        info = demux.parse(io.BytesIO(data))
        assert info.status == MdatPosStatus.OK
        assert info.num_channels == 2
        assert info.sample_size == 16
        assert info.sample_rate == 44100
        assert info.tables.num_frames == 2
        assert info.mdat_offset > 0

    def test_mdat_before_moov(self):
        data = encode_to_bytes(tone(5000, 2, 16), 44100, 16, mdat_first=True)
        info = demux.parse(io.BytesIO(data))
        assert info.status == MdatPosStatus.OK
        # mdat payload must start right after ftyp + mdat header
        assert data[info.mdat_offset - 4 : info.mdat_offset] == b"mdat"

    def test_free_atom_skipped(self):
        data = encode_to_bytes(tone(5000, 1, 16), 44100, 16, free_padding=32)
        info = demux.parse(io.BytesIO(data))
        assert info.num_channels == 1

    def test_uniform_stsz(self):
        data = encode_to_bytes(
            tone(4096 * 2, 2, 16),
            44100,
            16,
            cfg=None,
            uniform_stsz=False,
        )
        info = demux.parse(io.BytesIO(data))
        assert len(info.tables.frame_byte_sizes) == 2

    def test_garbage_raises_header_error(self):
        with pytest.raises(HeaderError):
            demux.parse(io.BytesIO(b"\x00\x00\x00\x08junkmorebytes"))

    def test_hostile_uniform_stsz_count_rejected(self):
        """A lying stsz uniform count whose claimed coded bytes exceed
        the physical stream must raise before any table allocation
        (ADVICE r2: a few header bytes could drive a ~2 GiB np.full)."""
        import struct

        data = bytearray(encode_to_bytes(tone(5000, 2, 16), 44100, 16))
        i = data.find(b"stsz")
        assert i > 0
        struct.pack_into(">I", data, i + 8, 1)  # uniform_size = 1
        struct.pack_into(">I", data, i + 12, 0x0FFFFFFF)  # huge count
        with pytest.raises(HeaderError, match="stsz uniform"):
            demux.parse(io.BytesIO(bytes(data)))

    def test_not_m4a_raises(self):
        bad = b"\x00\x00\x00\x10ftypmp42\x00\x00\x00\x00"
        with pytest.raises(HeaderError):
            demux.parse(io.BytesIO(bad))


class TestSampleTables:
    def make(self):
        return SampleTables(
            frame_byte_sizes=np.array([100, 200, 150, 50], dtype=np.int64),
            stts_counts=np.array([3, 1], dtype=np.int64),
            stts_durations=np.array([4096, 1000], dtype=np.int64),
            stsc_first_chunk=np.array([1, 2], dtype=np.int64),
            stsc_samples_per_chunk=np.array([3, 1], dtype=np.int64),
            chunk_offsets=np.array([1000, 5000], dtype=np.int64),
        )

    def test_durations_and_num_samples(self):
        t = self.make()
        np.testing.assert_array_equal(
            t.frame_durations(), [4096, 4096, 4096, 1000]
        )
        assert t.num_samples() == 4096 * 3 + 1000
        assert t.frame_duration(3) == 1000
        with pytest.raises(SampleReadError):
            t.frame_duration(4)

    def test_missing_stts_coverage(self):
        t = self.make()
        short = SampleTables(
            frame_byte_sizes=t.frame_byte_sizes,
            stts_counts=np.array([2], dtype=np.int64),
            stts_durations=np.array([4096], dtype=np.int64),
            stsc_first_chunk=t.stsc_first_chunk,
            stsc_samples_per_chunk=t.stsc_samples_per_chunk,
            chunk_offsets=t.chunk_offsets,
        )
        assert short.num_samples() == -1  # AlacContext.cs:118-121

    def test_frame_offsets(self):
        t = self.make()
        np.testing.assert_array_equal(
            t.frame_file_offsets(), [1000, 1100, 1300, 5000]
        )

    def test_locate_pcm_sample(self):
        t = self.make()
        frame, off, start, end = t.locate_pcm_sample(4096 * 2 + 5)
        assert (frame, off, start, end) == (2, 1300, 8192, 12288)
        frame, off, start, end = t.locate_pcm_sample(0)
        assert (frame, off) == (0, 1000)
        # past EOF
        frame, *_ = t.locate_pcm_sample(10**9)
        assert frame == 4


class TestGappedChunks:
    def test_chunk_gaps_honored_by_table_driven_access(self):
        """Dead bytes between mdat chunks: stco/stsz addressing must be
        honored (the reference's sequential reads would desync here)."""
        import alacnet_tpu

        pcm = tone(4096 * 3 + 100, 2, 16)
        data = encode_to_bytes(pcm, 44100, 16, None, frames_per_chunk=2, chunk_gap=37)
        (res,) = alacnet_tpu.decode_streams([io.BytesIO(data)])
        np.testing.assert_array_equal(res.pcm, pcm)

    def test_chunk_gap_offsets(self):
        data = encode_to_bytes(tone(4096 * 2, 2, 16), 44100, 16, None,
                               frames_per_chunk=1, chunk_gap=10)
        info = demux.parse(io.BytesIO(data))
        offs = info.tables.frame_file_offsets()
        sizes = info.tables.frame_byte_sizes
        assert offs[1] == offs[0] + sizes[0] + 10
