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
