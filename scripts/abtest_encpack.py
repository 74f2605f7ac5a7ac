"""A/B the encode device-pack kernel's gather window K on hardware.

pack_frames_device ORs up to K candidate symbols per output word; K=34
is the sound bound for >=1-bit symbols, but real corpora rarely exceed
a handful of contributors per 32-bit word.  This script measures the
slope-timed kernel at K in {10, 18, 34} on a mixed corpus, checks each
K's soundness exactly (max contributors per word, computed host-side
from the same cumsum/searchsorted the kernel uses), and verifies byte
parity against the host packer for every sound K.

Usage: python scripts/abtest_encpack.py [frames] [frame_samples]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp
from jax import lax

from alacnet_tpu.bench_lib import _music_pcm, _slope_measure
from alacnet_tpu.codec.cookie import default_cookie
from alacnet_tpu.codec.encoder import AlacEncoder, EncoderConfig
from alacnet_tpu.codec.encoder_tpu import (
    _PACK_STRIDE_STEP, _dispatch, _or_header, _pack_host, _prep,
)
from alacnet_tpu.ops.encode import (
    pack_frames_device, pack_frames_device_scatter,
)


def main() -> int:
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    rng = np.random.default_rng(9)
    params = default_cookie(44100, 16, 2, S)
    pcm = _music_pcm(F * S, 16, 2, rng)
    pcm[2 * S : 4 * S] = 0
    pcm[5 * S : 6 * S] = rng.integers(-32768, 32767, (S, 2))
    arr = pcm.reshape(F, S, 2)
    cfg = EncoderConfig(order=6)
    enc = AlacEncoder(params, cfg)
    prep = _prep(arr, params, cfg, enc)
    planes = _dispatch(prep, params, cfg)
    host_planes = [np.asarray(x) for x in planes]
    want = _pack_host(prep, host_planes, None)

    c0, c1, c2, ws, bits_d, _bad = host_planes
    bits = bits_d.astype(np.int64)
    total_bits = prep["hbits"] + bits[:F] + bits[F:]
    need = int(total_bits.max()) // 32 + 2
    stride = -(-need // _PACK_STRIDE_STEP) * _PACK_STRIDE_STEP

    # Exact per-word contributor bound, host-side (mirrors the kernel's
    # compact/cumsum/searchsorted phases).
    max_contrib = 0
    for f in range(F):
        wrow = []
        for lane in ([f, F + f] if prep["stereo_f"][f] else [f]):
            w = ws[lane, : prep["ns_f"][f]].astype(np.int64)
            wrow.append(w[w > 0])
        w = np.concatenate(wrow) if wrow else np.zeros(0, np.int64)
        ends = prep["hbits"][f] + np.cumsum(w)
        starts = ends - w
        W = int(ends[-1]) // 32 + 1 if len(ends) else 0
        lo = np.arange(W, dtype=np.int64) * 32
        first = np.searchsorted(ends, lo, side="right")
        last = np.searchsorted(starts, lo + 32, side="left")
        if W:
            max_contrib = max(max_contrib, int((last - first).max()))
    print(f"max contributors per word over corpus: {max_contrib}")

    args = (
        jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(ws),
        jnp.asarray(prep["ns_f"].astype(np.int32)),
        jnp.asarray(prep["stereo_f"]),
        jnp.asarray(prep["hbits"].astype(np.int32)),
    )
    jnp.sum(args[0]).item()
    B = 2 * F

    variants = [("gather", K, None) for K in (10, 18, 34)]
    variants.append(("scatter", 0, pack_frames_device_scatter))
    for name, K, alt in variants:
        sound = alt is not None or K >= max_contrib
        if alt is not None:
            rows_d, end_d = alt(*args, stride_words=stride)
        else:
            rows_d, end_d = pack_frames_device(*args, stride_words=stride, K=K)
        rows = np.asarray(rows_d).copy()
        end_bits = np.asarray(end_d)
        hv, hw, h_off = prep["hv"], prep["hw"], prep["h_off"]
        got = []
        for f in range(F):
            _or_header(rows[f], hv[h_off[f]:h_off[f + 1]],
                       hw[h_off[f]:h_off[f + 1]])
            got.append(rows[f, : -(-int(end_bits[f]) // 8)].tobytes())
        parity = got == want

        def make(K=K, alt=alt):
            @jax.jit
            def run(salt, KK, *a):
                def body(i, acc):
                    r = ((i + salt) % jnp.uint32(7)) * jnp.uint32(B)
                    rf = ((i + salt) % jnp.uint32(7)) * jnp.uint32(F)
                    rolled = (
                        jnp.roll(a[0], r, axis=0), jnp.roll(a[1], r, axis=0),
                        jnp.roll(a[2], r, axis=0), jnp.roll(a[3], r, axis=0),
                        jnp.roll(a[4], rf), jnp.roll(a[5], rf),
                        jnp.roll(a[6], rf),
                    )
                    if alt is not None:
                        rows, eb = alt(*rolled, stride_words=stride)
                    else:
                        rows, eb = pack_frames_device(
                            *rolled, stride_words=stride, K=K
                        )
                    return acc + jnp.sum(eb) + rows[-1, -1].astype(jnp.int32)

                return lax.fori_loop(0, KK, body, jnp.zeros((), jnp.int32))

            return run

        per = _slope_measure(make, args, 3, 0.25)
        print(
            f"{name} K={K:3d} sound={sound} parity={parity} "
            f"per_pass={per * 1e3:8.3f} ms  {F * S / per / 1e6:8.1f} Msps"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
