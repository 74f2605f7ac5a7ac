"""Native encoder core vs the pure-Python path: identical bytes."""

import numpy as np
import pytest

from alacnet_tpu import native
from alacnet_tpu.codec.cookie import default_cookie
from alacnet_tpu.codec.encoder import AlacEncoder, EncoderConfig

from .corpus import tone

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.mark.parametrize("order", [0, 1, 4, 6, 8, 31])
@pytest.mark.parametrize("bits,ub", [(16, 0), (24, 0), (24, 1)])
def test_native_encoder_bit_identical(order, bits, ub, rng):
    params = default_cookie(44100, bits, 2, max_samples_per_frame=512)
    cfg = EncoderConfig(order=order, uncompressed_bytes=ub)
    pcm = tone(512 + 77, 2, bits, noise=(3000.0 if bits == 24 else 60.0))
    for lo in (0, 512):
        chunk = pcm[lo : lo + 512]
        enc = AlacEncoder(params, cfg)
        a = enc._encode_frame_native(chunk)
        b = enc._encode_frame_py(chunk)
        assert a == b, f"order={order} bits={bits} ub={ub} frame@{lo}"


@pytest.mark.parametrize("bits", [16, 24])
def test_native_encoder_uncompressed(bits, rng):
    params = default_cookie(44100, bits, 2, max_samples_per_frame=256)
    cfg = EncoderConfig(force_uncompressed=True)
    pcm = tone(256, 2, bits)
    enc = AlacEncoder(params, cfg)
    assert enc._encode_frame_native(pcm) == enc._encode_frame_py(pcm)


def test_native_encoder_extremes(rng):
    params = default_cookie(44100, 16, 2, max_samples_per_frame=256)
    enc = AlacEncoder(params, EncoderConfig(order=4))
    noise = rng.integers(-32768, 32768, (256, 2)).astype(np.int32)
    sil = np.zeros((256, 2), np.int32)
    sil[10, 0] = 5
    mono = tone(256, 1, 16)
    for pcm in (noise, sil):
        assert enc._encode_frame_native(pcm) == enc._encode_frame_py(pcm)
    assert enc._encode_frame_native(mono) == enc._encode_frame_py(mono)


def test_pack_symbol_frames_matches_bitwriter(rng):
    """alac_pack_symbol_frames (the rice_emit alternative backend's
    packer: raw 4-field symbol planes -> coded frames, incl. the
    fold-to-one-push fast path for <=32-bit symbols and the wide
    fallback) against an independent pure-Python BitWriter pack."""
    from alacnet_tpu.codec.bitwriter import BitWriter

    F, S = 5, 96
    stereo = np.array([1, 0, 1, 1, 0], np.uint8)
    n = np.array([96, 41, 96, 7, 1], np.int32)
    B = 2 * F
    # Widths: mostly small (fast path), some rows forced wide so
    # v0..v3 totals exceed 32 bits (field-by-field fallback); width 0
    # fields must be no-ops.
    wid = rng.integers(0, 12, size=(B, S, 4)).astype(np.int8)
    wide_rows = rng.random(size=(B, S)) < 0.08
    wid[wide_rows] = np.array([16, 32, 9, 30], np.int8)
    wid[rng.random(size=(B, S, 4)) < 0.2] = 0
    v16 = rng.integers(0, 1 << 16, size=(B, S, 2)).astype(np.uint16)
    v32 = rng.integers(0, 1 << 32, size=(B, S, 2), dtype=np.uint64).astype(
        np.uint32
    )
    # Ragged per-frame header fields.
    counts = rng.integers(1, 9, size=F)
    h_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    hv = rng.integers(0, 1 << 20, size=int(h_off[-1]), dtype=np.int64).astype(
        np.uint32
    )
    hw = rng.integers(1, 24, size=int(h_off[-1])).astype(np.uint8)

    out, end_bits = native.pack_symbol_frames_native(
        hv, hw, h_off, v16, v32, wid, n, stereo, out_stride=4096
    )

    for f in range(F):
        w = BitWriter()
        for i in range(int(h_off[f]), int(h_off[f + 1])):
            w.write(int(hv[i]), int(hw[i]))
        for lane in ([f, F + f] if stereo[f] else [f]):
            for i in range(int(n[f])):
                w.write(int(v16[lane, i, 0]), int(wid[lane, i, 0]))
                w.write(int(v32[lane, i, 0]), int(wid[lane, i, 1]))
                w.write(int(v16[lane, i, 1]), int(wid[lane, i, 2]))
                w.write(int(v32[lane, i, 1]), int(wid[lane, i, 3]))
        assert int(end_bits[f]) == w.bitpos
        ref = w.getvalue()
        assert out[f, : len(ref)].tobytes() == ref
