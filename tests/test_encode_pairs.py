"""Pair-plane encode packing (ops/encode.merge_pair_chunks + the native
two-frame pair packer).

The layout halves the host pack stage's per-field bookkeeping and the
plane D2H; these tests pin (a) the device pair fold against a NumPy
reference on adversarial widths, (b) byte identity of the whole
pipeline vs the classic chunk path, (c) the fat-batch fallback wiring
(non-fitting pairs re-dispatch classic planes), and (d) the native pair
packer against the BitWriter on random valid pair planes.

The reference has no encoder (SURVEY.md §2 non-goals); payload grammar
follows AlacFile.cs:428-719 via codec/encoder.py.
"""

import numpy as np
import pytest

from alacnet_tpu import native
from alacnet_tpu.codec.bitwriter import BitWriter
from alacnet_tpu.codec.cookie import default_cookie
from alacnet_tpu.codec.encoder import AlacEncoder, EncoderConfig
from alacnet_tpu.codec.encoder_tpu import (
    _dispatch, _pack_host, _pack_host_pairs, _prep, encode_frames_tpu,
)

from .corpus import tone

S = 256


def _pair_ref(c0, c1, c2, ws):
    """NumPy oracle for merge_pair_chunks via Python big ints."""
    B, s = ws.shape
    if s % 2:
        pad = ((0, 0), (0, 1))
        c0, c1, c2 = (np.pad(x, pad) for x in (c0, c1, c2))
        ws = np.pad(ws, pad)
        s += 1
    NP = s // 2
    ph = np.zeros((B, NP), np.uint32)
    pm = np.zeros((B, NP), np.uint32)
    pl = np.zeros((B, NP), np.uint32)
    pws = np.zeros((B, NP), np.int8)
    fat = np.zeros(B, bool)
    for b in range(B):
        for j in range(NP):
            wa, wb = int(ws[b, 2 * j]), int(ws[b, 2 * j + 1])
            if wa + wb > 96:
                pws[b, j] = -1
                fat[b] = True
                continue
            va = (int(c0[b, 2 * j]) << 64) | (int(c1[b, 2 * j]) << 32) | int(c2[b, 2 * j])
            vb = (int(c0[b, 2 * j + 1]) << 64) | (int(c1[b, 2 * j + 1]) << 32) | int(c2[b, 2 * j + 1])
            v = (va << wb) | vb
            pws[b, j] = wa + wb
            ph[b, j] = (v >> 64) & 0xFFFFFFFF
            pm[b, j] = (v >> 32) & 0xFFFFFFFF
            pl[b, j] = v & 0xFFFFFFFF
    return ph, pm, pl, pws, fat


def _random_chunks(rng, B, s, wmax=81, allow_fat=False):
    """Random right-aligned 96-bit chunk planes with widths <= wmax."""
    ws = rng.integers(0, wmax + 1, (B, s)).astype(np.int8)
    if not allow_fat:
        # clamp each pair's combined width to 96
        for j in range(0, s - 1, 2):
            over = ws[:, j].astype(int) + ws[:, j + 1] > 96
            ws[over, j + 1] = 96 - ws[over, j]
    c0 = np.zeros((B, s), np.uint32)
    c1 = np.zeros((B, s), np.uint32)
    c2 = np.zeros((B, s), np.uint32)
    raw = rng.integers(0, 2**32, (B, s, 3), dtype=np.uint64)
    for b in range(B):
        for i in range(s):
            w = int(ws[b, i])
            v = (int(raw[b, i, 0]) << 64 | int(raw[b, i, 1]) << 32 | int(raw[b, i, 2])) & ((1 << w) - 1)
            c0[b, i] = (v >> 64) & 0xFFFFFFFF
            c1[b, i] = (v >> 32) & 0xFFFFFFFF
            c2[b, i] = v & 0xFFFFFFFF
    return c0, c1, c2, ws


@pytest.mark.parametrize("s,allow_fat", [(16, False), (15, False), (16, True)])
def test_merge_pair_chunks_matches_reference(rng, s, allow_fat):
    from alacnet_tpu.ops.encode import merge_pair_chunks

    c0, c1, c2, ws = _random_chunks(rng, 8, s, allow_fat=allow_fat)
    got = [np.asarray(x) for x in merge_pair_chunks(c0, c1, c2, ws)]
    want = _pair_ref(c0, c1, c2, ws)
    if allow_fat:
        assert want[4].any(), "fat case failed to materialize"
    for g, w, name in zip(got, want, ["ph", "pm", "pl", "pws", "fat"]):
        if name in ("ph", "pm", "pl"):
            live = np.asarray(want[3]) >= 0  # non-fitting pairs are don't-care
            assert (g[live] == w[live]).all(), name
        else:
            assert (g == w).all(), name


CASES = [
    ("stereo16", 16, 2, EncoderConfig(order=6), "music"),
    ("stereo24_extrabits", 24, 2,
     EncoderConfig(order=4, uncompressed_bytes=1), "music"),
    ("silence_zeroruns", 16, 2, EncoderConfig(order=4), "silence"),
    ("noise_escapes", 16, 2, EncoderConfig(order=2), "noise"),
    ("mono16", 16, 1, EncoderConfig(order=4), "music"),
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


@pytest.mark.skipif(not native.available(), reason="no native tier")
@pytest.mark.parametrize("name,bits,ch,cfg,kind", CASES, ids=[c[0] for c in CASES])
def test_pair_pack_byte_identity(name, bits, ch, cfg, kind, rng, monkeypatch):
    """encode_frames_tpu: pair layout == classic chunk layout, byte for
    byte, across formats (incl. odd-length tails -> odd pair counts and
    mixed-shape frame lists -> the C++ single-frame fallback)."""
    params = default_cookie(44100, bits, ch, max_samples_per_frame=S)
    pcm = _signal(kind, bits, ch, rng)
    frames = [pcm[i : i + S] for i in range(0, pcm.shape[0], S)]
    monkeypatch.setenv("ALAC_ENC_PAIR", "0")
    classic = encode_frames_tpu(frames, params, cfg)
    monkeypatch.setenv("ALAC_ENC_PAIR", "1")
    paired = encode_frames_tpu(frames, params, cfg)
    assert classic == paired


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_pair_pack_mixed_stereo_mono_frames(rng, monkeypatch):
    """Adjacent frames with differing channel counts exercise the C++
    packer's unpaired (single-writer) path."""
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=4)
    st = tone(S * 4, 2, 16, noise=60.0)
    frames = [
        st[:S],
        np.stack([st[S : 2 * S, 0], np.zeros(S, np.int32)], axis=1)[:199],
        st[2 * S : 3 * S],
        st[3 * S :][:77],
    ]
    monkeypatch.setenv("ALAC_ENC_PAIR", "0")
    classic = encode_frames_tpu(frames, params, cfg)
    monkeypatch.setenv("ALAC_ENC_PAIR", "1")
    paired = encode_frames_tpu(frames, params, cfg)
    assert classic == paired


@pytest.mark.skipif(not native.available(), reason="no native tier")
@pytest.mark.parametrize("ilv", ["4", "8"])
def test_pair_ilv_byte_identity(rng, monkeypatch, ilv):
    """Every writer interleave (2-writer baseline, 4-writer scalar,
    8-lane AVX-512 SIMD) must produce byte-identical payloads — incl.
    odd-length tails (odd pair counts), a mono frame inside the group
    (breaks lockstep -> the fallback path), and a group-size remainder.
    On binaries without AVX-512 the "8" arm exercises the delegate."""
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=4)
    pcm = tone(S * 11, 2, 16, noise=60.0)
    frames = [pcm[i * S : (i + 1) * S] for i in range(11)]
    frames[3] = frames[3][:, :1]  # mono inside an 8-group
    frames[9] = frames[9][: S // 2 + 3]  # odd tail + shape break
    monkeypatch.setenv("ALAC_ENC_PAIR", "1")
    monkeypatch.setenv("ALAC_ENC_PAIR_ILV", "2")
    base = encode_frames_tpu(frames, params, cfg)
    monkeypatch.setenv("ALAC_ENC_PAIR_ILV", ilv)
    assert encode_frames_tpu(frames, params, cfg) == base


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_native_pair_packer8_adversarial(rng, monkeypatch):
    """The AVX-512 packer vs the two-writer packer on adversarial raw
    planes: widths spanning -1 (legal skip), 0..64, and the wide
    (64, 96] two-push form, random ragged headers, an extra-bits plane
    on some frames, mixed n/stereo groups (fallback), and lockstep
    8-groups — byte-for-byte up to each frame's end_bits."""
    if native.get_lib() is None:
        pytest.skip("no native tier")
    F, s = 24, 64
    NP = s // 2
    pws = rng.integers(0, 45, (2 * F, NP)).astype(np.int8)
    pws[rng.random((2 * F, NP)) < 0.05] = -1
    wide = rng.random((2 * F, NP)) < 0.08
    pws = np.where(
        wide, rng.integers(65, 97, (2 * F, NP)), pws
    ).astype(np.int8)

    def field(v, lo, hi):
        nb = np.clip(pws.astype(np.int64) - lo, 0, hi - lo).astype(np.uint64)
        m = np.where(nb >= 32, np.uint64(0xFFFFFFFF),
                     (np.uint64(1) << nb) - np.uint64(1))
        return (v & m).astype(np.uint32)

    ph = field(rng.integers(0, 1 << 32, (2 * F, NP), dtype=np.uint64), 64, 96)
    pm = field(rng.integers(0, 1 << 32, (2 * F, NP), dtype=np.uint64), 32, 64)
    pl = field(rng.integers(0, 1 << 32, (2 * F, NP), dtype=np.uint64), 0, 32)
    n = np.full(F, s, np.int32)
    n[5] = 17  # odd pair tail inside a group -> fallback
    n[20] = 3
    stereo = np.ones(F, np.uint8)
    stereo[13] = 0
    hcnt = rng.integers(2, 9, F)
    h_off = np.concatenate(([0], np.cumsum(hcnt))).astype(np.int64)
    hw = rng.integers(1, 25, h_off[-1]).astype(np.uint8)
    hv = (
        rng.integers(0, 1 << 24, h_off[-1]).astype(np.uint32)
        & ((np.uint32(1) << hw.astype(np.uint32)) - np.uint32(1))
    )
    extra = rng.integers(0, 1 << 16, (F, s)).astype(np.uint32)
    extra_w = np.zeros(F, np.uint8)
    extra_w[2] = 8
    extra_w[16] = 4
    stride = (96 * s * 2 + int(hw.sum()) * 8 + 8 * s) // 8 + 16

    def pack(ilv):
        monkeypatch.setenv("ALAC_ENC_PAIR_ILV", ilv)
        return native.pack_pair_frames_native(
            hv, hw, h_off, extra, extra_w, ph, pm, pl, pws, n, stereo,
            s, stride,
        )

    out2, end2 = pack("2")
    out8, end8 = pack("8")
    assert np.array_equal(end2, end8)
    for f in range(F):
        nb = (int(end2[f]) + 7) // 8
        assert np.array_equal(out2[f, :nb], out8[f, :nb]), f"frame {f}"


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_fat_batch_falls_back_to_classic(rng):
    """A set fat flag must re-dispatch the classic planes and still
    produce correct payloads (the non-fitting-pair escape hatch)."""
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=6)
    pcm = tone(S * 2, 2, 16, noise=60.0)
    frames = [pcm[:S], pcm[S:]]
    enc = AlacEncoder(params, cfg)
    want = [enc.encode_frame(f) for f in frames]

    prep = _prep(frames, params, cfg, enc)
    planes = _dispatch(prep, params, cfg, pairs=True)
    assert prep["pairs"] is True
    forced = list(planes)
    # The PAIR-level fat flag sits at index 6 (the 12-tuple quad layout
    # appends qh/qm/ql/qws/qfat after it; index -1 is qfat there).
    fat_idx = 6 if prep.get("quads") else -1
    forced[fat_idx] = np.ones_like(np.asarray(planes[fat_idx]))  # force fat
    got = _pack_host_pairs(prep, tuple(forced), None)
    assert got == want
    assert prep["pairs"] is False  # fallback resets the routing flag


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_quad_pack_fires_and_matches(rng, monkeypatch):
    """16-bit music-like content must take the QUAD plane path (every
    quad <= 96 bits) and stay byte-identical to both the pair-only and
    classic layouts; a forced qfat falls back to pairs (not classic)."""
    from alacnet_tpu.codec.encoder_tpu import (
        _dispatch, _pack_host_pairs, _prep,
    )

    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=6)
    pcm = tone(S * 3 + 57, 2, 16, noise=60.0)
    frames = [pcm[i : i + S] for i in range(0, pcm.shape[0], S)]
    monkeypatch.setenv("ALAC_ENC_QUAD", "0")
    pair_only = encode_frames_tpu(frames, params, cfg)
    monkeypatch.setenv("ALAC_ENC_QUAD", "1")
    quaded = encode_frames_tpu(frames, params, cfg)
    assert quaded == pair_only
    # The quad path must actually have been eligible (qfat clean).
    enc = AlacEncoder(params, cfg)
    prep = _prep(frames, params, cfg, enc)
    planes = _dispatch(prep, params, cfg, pairs=True)
    assert prep.get("quads") is True
    assert not bool(np.asarray(planes[11]).any()), "quads unexpectedly fat"
    # Forced qfat: falls back to the PAIR planes, still byte-identical,
    # and does NOT reset the pairs routing (no classic re-dispatch).
    forced = list(planes)
    forced[11] = np.ones_like(np.asarray(planes[11]))
    got = _pack_host_pairs(prep, tuple(forced), None)
    assert got == pair_only
    assert prep["pairs"] is True


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_quad_fat_frame_subset_repack(rng, monkeypatch):
    """A minority quad-fat frame (full-range noise: adjacent escape
    symbols push a quad past 96 bits) must be repacked from the pair
    planes while the rest of the batch rides the quad path — byte
    identity against the host encoder throughout."""
    from alacnet_tpu.bench_lib import _music_pcm
    from alacnet_tpu.codec.encoder_tpu import _dispatch, _prep

    monkeypatch.setenv("ALAC_ENC_QUAD", "1")
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=6)
    mus = _music_pcm(7 * S, 16, 2, rng).reshape(7, S, 2)
    noise = rng.integers(-32768, 32767, (S, 2)).astype(np.int32)
    frames = [mus[i] for i in range(7)] + [noise]
    enc = AlacEncoder(params, cfg)
    prep = _prep(frames, params, cfg, enc)
    planes = _dispatch(prep, params, cfg, pairs=True)
    assert prep.get("quads") is True
    assert not bool(np.asarray(planes[6]).any()), "pair-fat would mask the case"
    qfat = np.asarray(planes[11]).reshape(-1)
    ff = qfat[:8] | qfat[8:]
    assert ff.any() and not ff.all(), "need a minority-fat batch"
    want = [enc.encode_frame(f) for f in frames]
    got = encode_frames_tpu(frames, params, cfg)
    assert got == want


def test_merge_quad_chunks_poisons_bad_pairs(rng):
    """-1 pair widths (non-fitting pairs) must mark the lane quad-fat
    and never feed negative shift amounts into the fold."""
    from alacnet_tpu.ops.encode import merge_quad_chunks

    B, NP = 4, 8
    ph = np.zeros((B, NP), np.uint32)
    pm = np.zeros((B, NP), np.uint32)
    pl = rng.integers(0, 2**20, (B, NP)).astype(np.uint32)
    pws = np.full((B, NP), 20, np.int8)
    pws[1, 3] = -1  # poisoned pair
    qh, qm, ql, qws, qfat = (
        np.asarray(x) for x in merge_quad_chunks(ph, pm, pl, pws)
    )
    assert bool(qfat[1]) and not qfat[[0, 2, 3]].any()
    assert (qws[0] == 40).all()  # clean lanes fold two 20-bit pairs


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_native_pair_packer_vs_bitwriter(rng):
    """Direct adversarial check: random valid pair planes (widths 0..96,
    incl. the >64 three-word path), random ragged headers, odd pair
    counts, paired and unpaired frames -> bit-identical to BitWriter."""
    F, s = 6, 30  # 15 pairs per lane
    NP = s // 2
    c0, c1, c2, ws = _random_chunks(rng, 2 * F, s, wmax=48)
    ph, pm, pl, pws, fat = _pair_ref(c0, c1, c2, ws)
    assert not fat.any()
    n = np.array([s, s, s - 1, s, 7, 0], np.int32)  # mismatched ns -> unpaired
    stereo = np.array([1, 1, 1, 0, 1, 1], np.uint8)
    hv_parts, hw_parts, h_off = [], [], [0]
    for f in range(F):
        k = int(rng.integers(1, 9))
        hv_parts.append(rng.integers(0, 2**16, k).astype(np.uint32))
        hw_parts.append(rng.integers(1, 17, k).astype(np.uint8))
        h_off.append(h_off[-1] + k)
    hv = np.concatenate(hv_parts)
    hw = np.concatenate(hw_parts)
    h_off = np.asarray(h_off, np.int64)

    total = np.zeros(F, np.int64)
    for f in range(F):
        npair = (int(n[f]) + 1) // 2
        lanes = [f, F + f] if stereo[f] else [f]
        total[f] = sum(int(hw[i]) for i in range(h_off[f], h_off[f + 1]))
        total[f] += sum(
            int(pws[lane, j]) for lane in lanes for j in range(npair)
        )
    stride = int(total.max()) // 8 + 8
    out, end_bits = native.pack_pair_frames_native(
        hv, hw, h_off, None, None, ph, pm, pl, pws, n, stereo, s, stride
    )
    for f in range(F):
        w = BitWriter()
        for i in range(h_off[f], h_off[f + 1]):
            w.write(int(hv[i]) & ((1 << int(hw[i])) - 1), int(hw[i]))
        npair = (int(n[f]) + 1) // 2
        for lane in ([f, F + f] if stereo[f] else [f]):
            for j in range(npair):
                v = (int(ph[lane, j]) << 64) | (int(pm[lane, j]) << 32) | int(pl[lane, j])
                wd = int(pws[lane, j])
                if wd > 64:  # BitWriter caps a single write at 64 bits
                    w.write(v >> 64, wd - 64)
                    w.write(v & (1 << 64) - 1, 64)
                else:
                    w.write(v, wd)
        want = w.getvalue()
        assert int(end_bits[f]) == int(total[f]), f
        assert out[f, : len(want)].tobytes() == want, f


@pytest.mark.skipif(not native.available(), reason="no native tier")
def test_pair_pack_mesh_byte_identity(rng, monkeypatch):
    """Mesh-sharded encode with pair planes (channel-major shards
    through _fetch_lane_major) == classic mesh == single-device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from alacnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    cfg = EncoderConfig(order=6)
    pcm = tone(S * 16, 2, 16, noise=60.0)
    arr = pcm.reshape(16, S, 2)
    monkeypatch.setenv("ALAC_ENC_PAIR", "0")
    classic = encode_frames_tpu(arr, params, cfg, mesh=mesh)
    monkeypatch.setenv("ALAC_ENC_PAIR", "1")
    paired = encode_frames_tpu(arr, params, cfg, mesh=mesh)
    single = encode_frames_tpu(arr, params, cfg)
    assert classic == paired == single
