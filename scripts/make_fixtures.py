"""Generate the frozen cross-round fixtures (run ONCE, outputs committed).

The fixtures pin today's validated encoder+decoder behavior as binary
data so a future encoder/decoder co-regression cannot pass silently
(VERDICT r1 missing #4): tests/fixtures/*.m4a are decoded by
tests/test_fixtures.py WITHOUT ever invoking the encoder, against the
committed .npy PCM.

Do not re-run this script to "fix" a failing fixture test — a mismatch
means the decoder changed behavior; investigate first.
"""

from __future__ import annotations

import io
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from alacnet_tpu.codec.encoder import EncoderConfig, encode_m4a  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"


def tone(n, channels, bits, noise, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    amp = (1 << (bits - 1)) * 0.09
    chans = [
        amp * np.sin(t * 0.01 + c)
        + 0.6 * amp * np.sin(t * 0.103 + 2 * c)
        + rng.normal(0, noise, n)
        for c in range(channels)
    ]
    lim = 1 << (bits - 1)
    return np.clip(np.stack(chans, 1), -lim, lim - 1).astype(np.int32)


def main() -> None:
    OUT.mkdir(exist_ok=True)
    rng = np.random.default_rng(0xF1C5)
    cases = {
        # (pcm, rate, bits, config, mux_kwargs)
        "stereo16_order6": (tone(1024 + 333, 2, 16, 60.0, 1), 44100, 16,
                            EncoderConfig(order=6), {}),
        "mono16_order31": (tone(900, 1, 16, 60.0, 2), 48000, 16,
                           EncoderConfig(order=31), {}),
        "stereo24_extrabits": (tone(700, 2, 24, 3000.0, 3), 96000, 24,
                               EncoderConfig(order=4, uncompressed_bytes=1), {}),
        "noise16_escapes": (rng.integers(-32768, 32768, (600, 2)).astype(np.int32),
                            44100, 16, EncoderConfig(order=4), {}),
        "silence_zeroruns": (np.zeros((1000, 2), np.int32), 44100, 16,
                             EncoderConfig(order=4), {"mdat_first": True}),
    }
    cases["silence_zeroruns"][0][123, 0] = 77
    cases["silence_zeroruns"][0][800, 1] = -9
    for name, (pcm, rate, bits, cfg, kw) in cases.items():
        buf = io.BytesIO()
        encode_m4a(buf, pcm, rate, bits, cfg, max_samples_per_frame=256, **kw)
        (OUT / f"{name}.m4a").write_bytes(buf.getvalue())
        np.save(OUT / f"{name}.npy", pcm)
        print(f"{name}: {buf.getbuffer().nbytes} bytes, pcm {pcm.shape}")


if __name__ == "__main__":
    main()
