"""Native C++ host runtime vs the NumPy reference implementations."""

import dataclasses
import io

import numpy as np
import pytest

from alacnet_tpu import native
from alacnet_tpu.codec.framemeta_vec import (
    parse_frame_headers_blob,
    parse_frame_headers_vec,
)
from alacnet_tpu.container import demux

from .corpus import encode_to_bytes, standard_cases

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.mark.parametrize(
    "name,pcm,bits,cfg,mux_kwargs",
    standard_cases(),
    ids=[c[0] for c in standard_cases()],
)
def test_native_matches_numpy_parser(name, pcm, bits, cfg, mux_kwargs):
    data = encode_to_bytes(pcm, 44100, bits, cfg, **mux_kwargs)
    info = demux.parse(io.BytesIO(data))
    offsets = info.tables.frame_file_offsets()
    sizes = info.tables.frame_byte_sizes
    blob = np.frombuffer(data, np.uint8)
    payloads = [data[o : o + s] for o, s in zip(offsets, sizes)]
    a = parse_frame_headers_vec(payloads, info.params)
    b = parse_frame_headers_blob(blob, offsets, sizes, info.params)
    for f in dataclasses.fields(a):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f.name)),
            np.asarray(getattr(b, f.name)),
            err_msg=f"field {f.name}",
        )


def test_native_rejects_bad_tag():
    from alacnet_tpu.errors import UnsupportedFormatError
    from tests.corpus import tone

    data = encode_to_bytes(tone(3000, 2, 16), 44100, 16)
    info = demux.parse(io.BytesIO(data))
    offsets = info.tables.frame_file_offsets()
    sizes = info.tables.frame_byte_sizes
    blob = bytearray(data)
    blob[offsets[0]] = 0b0110_0000  # tag 3
    with pytest.raises(UnsupportedFormatError):
        parse_frame_headers_blob(
            np.frombuffer(bytes(blob), np.uint8), offsets, sizes, info.params
        )
