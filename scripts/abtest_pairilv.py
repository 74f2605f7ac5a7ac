"""A/B the pair packer's writer interleave width (2 vs 4 frames).

alac_pack_pair_frames packs TWO frames per loop iteration with
independent FastBitWriter chains (measured ~2x over one writer —
the accumulator dependency chain is the bottleneck, DESIGN.md §7);
alac_pack_pair_frames4 advances FOUR chains.  This script drives both
entry points directly on synthetic pair planes with a music-like width
distribution (no device needed), asserts byte identity, and times each.

Usage: python scripts/abtest_pairilv.py [frames] [frame_samples]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from alacnet_tpu import native


def make_planes(F, S, rng, mean_w=20):
    """Synthetic pair planes: (2F, NP) u32 triples + int8 widths.

    Width distribution mimics music content (two ~10-bit symbols per
    pair), with occasional wide pairs (>64 bits) to exercise the
    3-word miss path, like real escape-coded samples do.
    """
    NP = (S + 1) // 2
    B = 2 * F
    pws = rng.normal(mean_w, 5, (B, NP)).clip(2, 60).astype(np.int8)
    wide = rng.random((B, NP)) < 0.002
    pws = np.where(wide, rng.integers(65, 96, (B, NP)), pws).astype(np.int8)
    ph = rng.integers(0, 1 << 32, (B, NP), dtype=np.uint32)
    pm = rng.integers(0, 1 << 32, (B, NP), dtype=np.uint32)
    pl = rng.integers(0, 1 << 32, (B, NP), dtype=np.uint32)
    # mask each field to its width (values arrive pre-masked from the
    # device merge)
    w64 = pws.astype(np.int64)
    pl &= np.where(w64 >= 32, 0xFFFFFFFF, (1 << np.minimum(w64, 31)) - 1).astype(np.uint32)
    m_mid = np.where(w64 <= 32, 0, np.where(w64 >= 64, 0xFFFFFFFF, (1 << np.maximum(w64 - 32, 0)) - 1))
    pm &= m_mid.astype(np.uint32)
    m_hi = np.where(w64 <= 64, 0, (1 << np.maximum(w64 - 64, 0)) - 1)
    ph &= m_hi.astype(np.uint32)
    return ph, pm, pl, pws


def run(F=512, S=4096, repeats=5, seed=7):
    rng = np.random.default_rng(seed)
    NP = (S + 1) // 2
    ph, pm, pl, pws = make_planes(F, S, rng)
    n = np.full(F, S, np.int32)
    stereo = np.ones(F, np.uint8)
    # ragged-shape probe rides along: a mono frame + a short frame mid-batch
    stereo[F // 3] = 0
    n[2 * F // 3] = S - 123
    hv = rng.integers(0, 1 << 16, F * 12, dtype=np.uint32)
    hw = np.full(F * 12, 12, np.uint8)
    h_off = np.arange(F + 1, dtype=np.int64) * 12
    total = pws.astype(np.int64).clip(0).sum() + F * 144
    stride = int(total.max() if hasattr(total, "max") else total) // F // 8 * 4 + 4096
    import os

    results = {}
    for ilv in ("2", "4", "8"):
        os.environ["ALAC_ENC_PAIR_ILV"] = ilv
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = native.pack_pair_frames_native(
                hv, hw, h_off, None, None, ph, pm, pl, pws, n, stereo, S, stride
            )
            best = min(best, time.perf_counter() - t0)
        results[ilv] = (best, out)
    os.environ.pop("ALAC_ENC_PAIR_ILV", None)
    (t2, (o2, e2)) = results["2"]
    samples = F * S
    for ilv in ("4", "8"):
        tx, (ox, ex) = results[ilv]
        assert (e2 == ex).all(), f"end_bits mismatch (ilv {ilv})"
        for f in range(F):
            nb = -(-int(e2[f]) // 8)
            assert o2[f, :nb].tobytes() == ox[f, :nb].tobytes(), (
                f"frame {f} bytes differ (ilv {ilv})"
            )
    for ilv in ("2", "4", "8"):
        tx = results[ilv][0]
        print(f"pair-ilv{ilv}: {samples/tx/1e6:8.1f} Msps  ({tx*1e3:.2f} ms)")
    print(f"byte-identical on {F} frames (incl. mono + short ragged probes)")
    return results["2"][0], results["4"][0]


if __name__ == "__main__":
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    run(F, S)
