"""Multi-chip sharded decode on the 8-device virtual CPU mesh.

SURVEY.md §4: "multi-node without a cluster" — conftest.py forces
xla_force_host_platform_device_count=8, matching the driver's
dryrun_multichip environment.
"""

import io

import jax
import numpy as np
import pytest

from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec
from alacnet_tpu.container import demux
from alacnet_tpu.parallel.mesh import decode_frames_sharded, make_mesh
from alacnet_tpu.parallel.pipeline import pad_frame_batch

from .corpus import encode_to_bytes, tone

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_sharded_decode_bit_exact():
    pcm = tone(4096 * 8, 2, 16)
    data = encode_to_bytes(pcm, 44100, 16)
    info = demux.parse(io.BytesIO(data))
    offs = info.tables.frame_file_offsets()
    sizes = info.tables.frame_byte_sizes
    payloads = [data[o : o + s] for o, s in zip(offs, sizes)]
    fb = pad_frame_batch(parse_frame_headers_vec(payloads, info.params), 8)

    mesh = make_mesh(jax.devices()[:8])
    out, n, total, checksum = decode_frames_sharded(fb, mesh, 4096)
    # Output is sharded across chips on the frame axis.
    assert len(out.sharding.device_set) == 8
    got = np.asarray(out).reshape(-1, 2)[: pcm.shape[0]]
    np.testing.assert_array_equal(got, pcm)
    assert int(total) == pcm.shape[0]
    expect_ck = int(pcm.astype(np.int64).sum()) & 0xFFFFFFFF
    assert int(checksum) & 0xFFFFFFFF == expect_ck


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out, n = jax.jit(fn, static_argnums=()).lower(*args).compile()(*args)
    assert out.shape[0] == args[0].shape[0]
    assert int(np.asarray(n).sum()) == 8 * 256


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
