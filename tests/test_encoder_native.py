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


def test_pack_chunk_frames_matches_bitwriter(rng):
    """alac_pack_chunk_frames (the production encode packer: merged
    96-bit chunk planes -> coded frames) against an independent
    pure-Python BitWriter pack.  Widths sweep 1..96 adversarially so
    every rung of the quad/pair/single combine ladder (and the >64-bit
    three-word fallback) is exercised, plus both extra-bits plane
    widths and ragged short frames."""
    from alacnet_tpu.codec.bitwriter import BitWriter

    F, S = 7, 133
    stereo = np.array([1, 0, 1, 1, 0, 1, 1], np.uint8)
    n = np.array([133, 130, 96, 7, 1, 133, 4], np.int32)
    extra_w = np.array([0, 8, 16, 0, 8, 16, 0], np.uint8)
    B = 2 * F
    # Widths: mostly small (quad path), bands forcing pair-only and
    # single fallbacks, plus >64-bit three-word symbols.
    ws = rng.integers(1, 20, size=(B, S)).astype(np.int8)
    band = rng.random(size=(B, S))
    ws = np.where(band < 0.12, rng.integers(20, 65, size=(B, S)), ws)
    ws = np.where(band > 0.95, rng.integers(65, 97, size=(B, S)), ws)
    ws = ws.astype(np.int8)
    # Pre-masked chunk values (contract: bits above ws are zero).
    full = rng.integers(0, 1 << 32, size=(B, S, 3), dtype=np.int64)
    w64 = ws.astype(np.int64)
    c2 = np.where(
        w64 >= 32, full[:, :, 2], full[:, :, 2] & ((1 << np.minimum(w64, 31)) - 1)
    ).astype(np.uint32)
    mid = np.clip(w64 - 32, 0, 32)
    c1 = np.where(
        mid >= 32, full[:, :, 1], full[:, :, 1] & ((1 << np.minimum(mid, 31)) - 1)
    ).astype(np.uint32)
    hi = np.clip(w64 - 64, 0, 32)
    c0 = np.where(
        hi >= 32, full[:, :, 0], full[:, :, 0] & ((1 << np.minimum(hi, 31)) - 1)
    ).astype(np.uint32)
    extra = rng.integers(0, 1 << 16, size=(F, S), dtype=np.int64).astype(np.uint32)
    extra &= (np.uint32(1) << extra_w[:, None].astype(np.uint32)) - np.uint32(1)
    counts = rng.integers(1, 9, size=F)
    h_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    hv = rng.integers(0, 1 << 20, size=int(h_off[-1]), dtype=np.int64).astype(
        np.uint32
    )
    hw = rng.integers(1, 24, size=int(h_off[-1])).astype(np.uint8)

    out, end_bits = native.pack_chunk_frames_native(
        hv, hw, h_off, extra, extra_w, c0, c1, c2, ws, n, stereo,
        out_stride=4096,
    )

    for f in range(F):
        w = BitWriter()
        for i in range(int(h_off[f]), int(h_off[f + 1])):
            w.write(int(hv[i]), int(hw[i]))
        if extra_w[f]:
            for i in range(int(n[f])):
                w.write(int(extra[f, i]), int(extra_w[f]))
        for lane in ([f, F + f] if stereo[f] else [f]):
            for i in range(int(n[f])):
                bits = int(ws[lane, i])
                if bits > 64:  # BitWriter fields cap at 64 bits
                    w.write(int(c0[lane, i]), bits - 64)
                    bits = 64
                v = (int(c1[lane, i]) << 32) | int(c2[lane, i])
                w.write(v, bits)
        assert int(end_bits[f]) == w.bitpos, f"frame {f}"
        ref = w.getvalue()
        assert out[f, : len(ref)].tobytes() == ref, f"frame {f}"


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("lw,sh", [(1, 31), (0, 0), (4, 2)])
def test_decorr_window_matches_numpy(wide, lw, sh, rng):
    """alac_decorr_window (fused encoder-prep decorrelation) against
    the NumPy reference block it replaced in codec/encoder_tpu._prep,
    including the wrapping-int32 work dtype, mono lanes, and the
    extra-bits pre-shift."""
    F, S, w = 9, 64, 48
    ub8 = 8 if wide else 0
    lo, hi = (-(1 << 23), 1 << 23) if wide else (-32768, 32768)
    pcm = rng.integers(lo, hi, size=(F, S, 2)).astype(np.int32)
    if wide:
        pcm <<= 0  # values already span the 24-bit domain
    stereo_f = rng.integers(0, 2, size=F).astype(bool)
    stereo_f[0] = True
    stereo_f[1] = False

    got = native.decorr_window_native(pcm, w, ub8, lw, sh, stereo_f, wide)
    assert got is not None

    work_dtype = np.int64 if wide else np.int32
    hiw = pcm[:, :w].astype(work_dtype)
    if ub8:
        hiw >>= ub8
    if lw != 0:
        cbw = hiw[:, :, 0] - hiw[:, :, 1]
        caw = hiw[:, :, 1] + ((cbw * lw) >> sh)
    else:
        caw, cbw = hiw[:, :, 0], hiw[:, :, 1]
    stw = stereo_f[:, None]
    ref = np.empty((2 * F, w), np.int32)
    np.copyto(ref[:F], np.where(stw, caw, hiw[:, :, 0]), casting="unsafe")
    np.copyto(ref[F:], np.where(stw, cbw, 0), casting="unsafe")
    np.testing.assert_array_equal(got, ref)


def test_rows_for_recycler_contract():
    """native._rows_for: reuse=False always allocates fresh; reuse=True
    hands back the SAME buffers per (shape, thread) with end_bits
    re-zeroed, distinct buffers across shapes and threads, and a
    bounded cache."""
    import threading

    from alacnet_tpu.native import _rows_for

    a1, e1 = _rows_for(4, 128, reuse=False)
    a2, e2 = _rows_for(4, 128, reuse=False)
    assert a1 is not a2 and e1 is not e2

    r1, f1 = _rows_for(4, 128, reuse=True)
    f1[:] = 7
    r1[:] = 9
    r2, f2 = _rows_for(4, 128, reuse=True)
    assert r1 is r2 and f1 is f2          # recycled
    assert (f2 == 0).all()                 # end_bits re-zeroed
    r3, _ = _rows_for(8, 128, reuse=True)
    assert r3 is not r1                    # shape-keyed

    got = {}

    def worker():
        got["rows"] = _rows_for(4, 128, reuse=True)[0]

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert got["rows"] is not r1           # thread-local

    # Cache stays bounded under pathological shape churn.
    for i in range(40):
        _rows_for(4, 128 + 8 * i, reuse=True)
    cache = getattr(
        __import__("alacnet_tpu.native", fromlist=["_row_cache"])._row_cache,
        "bufs",
    )
    assert len(cache) <= 8
