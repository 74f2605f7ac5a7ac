"""Device (JAX) batch encoder vs the host encoder: byte equality.

Byte-identical payloads make the device encoder inherit the host
encoder's entire validation pyramid (golden vectors, scalar-oracle round
trips, device decode parity) for free; an extra lossless round trip
through the device decoder closes the loop end-to-end on-device.
"""

import numpy as np
import pytest

from alacnet_tpu.codec.cookie import default_cookie
from alacnet_tpu.codec.encoder import AlacEncoder, EncoderConfig
from alacnet_tpu.codec.encoder_tpu import encode_frames_tpu

from .corpus import tone

S = 256


def _host_payloads(frames, params, cfg):
    enc = AlacEncoder(params, cfg)
    return [enc.encode_frame(f) for f in frames]


CASES = [
    ("stereo16_order6", 16, 2, EncoderConfig(order=6), "music"),
    ("stereo16_order0", 16, 2, EncoderConfig(order=0), "music"),
    ("stereo16_order31", 16, 2, EncoderConfig(order=31), "music"),
    ("stereo16_nodecorr", 16, 2,
     EncoderConfig(order=4, interlacing_leftweight=0), "music"),
    ("mono16_order4", 16, 1, EncoderConfig(order=4), "music"),
    ("stereo24_order4", 24, 2, EncoderConfig(order=4), "music"),
    ("stereo24_extrabits", 24, 2,
     EncoderConfig(order=4, uncompressed_bytes=1), "music"),
    ("silence_zeroruns", 16, 2, EncoderConfig(order=4), "silence"),
    ("noise_escapes", 16, 2, EncoderConfig(order=2), "noise"),
]


def _signal(kind, bits, ch, rng):
    if kind == "music":
        return tone(S * 3 + 57, ch, bits, noise=3000.0 if bits == 24 else 60.0)
    if kind == "silence":
        pcm = np.zeros((S * 3, ch), np.int32)
        pcm[40, 0] = 7
        pcm[500:520] = 3
        return pcm
    lim = 1 << (bits - 1)
    return rng.integers(-lim, lim, (S * 3, ch)).astype(np.int32)


@pytest.mark.parametrize("name,bits,ch,cfg,kind", CASES, ids=[c[0] for c in CASES])
def test_device_encoder_byte_equal(name, bits, ch, cfg, kind, rng):
    params = default_cookie(44100, bits, ch, max_samples_per_frame=S)
    pcm = _signal(kind, bits, ch, rng)
    frames = [pcm[i : i + S] for i in range(0, pcm.shape[0], S)]
    want = _host_payloads(frames, params, cfg)
    got = encode_frames_tpu(frames, params, cfg)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"frame {i}: device payload differs from host"


def test_device_encoder_mixed_batch_roundtrip(rng):
    """Mono + stereo + partial frames in one device batch, decoded back
    bit-exactly by the device decoder."""
    from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec
    from alacnet_tpu.parallel.pipeline import decode_frame_batch

    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=4)
    frames = [
        tone(S, 2, 16, seed=1),
        tone(S // 2 + 9, 2, 16, seed=2),  # partial (hassize)
        tone(S, 1, 16, seed=3),  # mono
        np.zeros((S, 2), np.int32),  # zero runs
    ]
    payloads = encode_frames_tpu(frames, params, cfg)
    fb = parse_frame_headers_vec(payloads, params)
    out, n = decode_frame_batch(fb, S)
    for i, pcm in enumerate(frames):
        nch = pcm.shape[1]
        assert n[i] == pcm.shape[0]
        np.testing.assert_array_equal(out[i, : n[i], :nch], pcm)


def test_zero_run_lengths_matches_walk(rng):
    from alacnet_tpu.ops.encode import zero_run_lengths

    errs = np.zeros((3, 32), np.int32)
    errs[0, [0, 5, 9]] = [3, -1, 2]
    errs[1, :] = 0
    errs[2, 30] = 4
    n = np.array([32, 20, 10], np.int32)
    got = np.asarray(zero_run_lengths(errs, n, 32))
    for b in range(3):
        for i in range(32):
            run = 0
            while i + 1 + run < n[b] and errs[b, i + 1 + run] == 0:
                run += 1
            assert got[b, i] == min(run, 0xFFFF), (b, i)
