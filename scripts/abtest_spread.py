"""A/B: does per-tile payload-size spread dominate the orders kind?

Hypothesis (round 3c): the group-sweep fetch cost scales with the
cross-lane word-pointer SPREAD inside a (sub, LN) lane tile.  Lanes are
sorted by coded size, but when a size cluster is smaller than the lane
tile, tiles straddle clusters and every refill sweeps the union range —
for channel B (whose start = channel A's end) the spread is the full
A-length difference (~68 groups for orders' 7826B vs 3393B payloads),
and even channel A diverges toward it as fast/slow lanes advance at
different bit rates.

Arms, all at equal live-sample count (B lanes of 4096-sample frames):
  uniform  — every lane the same payload (zero spread; the bound)
  mixed    — three payload sizes cycled then size-sorted (production
             plan; clusters of B/3 lanes straddle 512-lane tiles)
  aligned  — same three payloads but each cluster padded to a lane-tile
             multiple with dead lanes (what a tile-aligned planner
             would emit; dead lanes freeze at sample 0)

Measures the two-channel fused pass (riceAB) slope per arm.  If
aligned ~= uniform >> mixed, a planner tile-alignment pass pays.

Usage: python scripts/abtest_spread.py [--batch 1024] [--sub 4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alacnet_tpu.bench_lib import make_corpus_frames  # noqa: E402
from alacnet_tpu.ops.frame_decode import FrameMetaArrays  # noqa: E402
from alacnet_tpu.ops.pallas.rice_lpc import LN, SUB, fused_rice_lpc  # noqa: E402
from alacnet_tpu.parallel.pipeline import (  # noqa: E402
    _fused_plan, pad_frame_batch, plan_blob_batches, span_sub_hint,
)

S = 4096


def stage(distinct, params, payload_ids, B, tile=0):
    """Build one span's FrameBatch from payload ids cycled over B lanes.

    tile > 0: size-sort, then pad each distinct-size cluster with dead
    lanes (empty payloads are not expressible, so alignment uses the
    planner's padding lane: size 0 rows are produced by pad_frame_batch
    only at the tail — instead we REPLICATE the cluster's own payload to
    fill the tile and mark the overflow lanes n=0 via... not possible
    from here).  So alignment is emulated the only way the current
    planner could: per-cluster lane counts rounded UP to the tile by
    replicating the cluster payload (extra lanes DECODE — the arm's
    sample count rises; Msps uses the true decoded count, so the
    comparison stays honest).
    """
    payloads = [distinct[payload_ids[i % len(payload_ids)]] for i in range(B)]
    if tile:
        by_size: dict[int, list[bytes]] = {}
        for p in payloads:
            by_size.setdefault(len(p), []).append(p)
        payloads = []
        for sz in sorted(by_size):
            group = by_size[sz]
            pad = (-len(group)) % tile
            group = group + [group[0]] * pad
            payloads.extend(group)
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    perm, _, spans, span_batch = plan_blob_batches(
        blob, offsets, sizes, params, len(payloads), strict=True
    )
    assert len(spans) == 1, spans
    lo, hi = spans[0]
    fb = pad_frame_batch(span_batch(perm[lo:hi]))
    use_fused, max_order = _fused_plan(fb)
    assert use_fused
    cap = span_sub_hint(sizes[perm[lo:hi]])
    # lane-sample count (no channel factor — matches
    # profile_kind_stages' convention so numbers compare directly)
    total = int(np.minimum(np.asarray(fb.n_samples), S).sum())
    return fb, max_order, cap, total


def slope_riceab(fb, max_order, cap):
    words = jnp.asarray(fb.words)
    packed = jnp.asarray(FrameMetaArrays.pack_host(fb))
    jnp.sum(words).item()

    @jax.jit
    def run(K, w, pk):
        def body(i, acc):
            mm = FrameMetaArrays.unpack(pk)
            n = jnp.clip(mm.n_samples, 0, S)
            n_comp = jnp.where(mm.is_compressed, n, 0)
            n_b = jnp.where(mm.is_stereo, n_comp, 0)
            out_a, pos = fused_rice_lpc(
                w, mm.entropy_pos, n_comp, mm.rss, mm.kmod,
                mm.init_history, mm.rice_mult[:, 0], mm.kmask,
                mm.order[:, 0], mm.quant[:, 0], mm.rc[:, 0], S,
                max_order=max_order, sub_hint=cap,
            )
            out_b, end_b = fused_rice_lpc(
                w, jnp.maximum(pos, 0), n_b, mm.rss, mm.kmod,
                mm.init_history, mm.rice_mult[:, 1], mm.kmask,
                mm.order[:, 1], mm.quant[:, 1], mm.rc[:, 1], S,
                max_order=max_order, sub_hint=cap,
            )
            return acc + jnp.sum(out_a[:, -1] + out_b[:, -1] + end_b).astype(
                jnp.float32
            )

        return jax.lax.fori_loop(0, K, body, 0.0)

    run(2, words, packed).block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(8, words, packed).block_until_ready()
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(16, words, packed).block_until_ready()
        d2 = time.perf_counter() - t0
        best = min(best, (d2 - d1) / 8)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()
    distinct, params = make_corpus_frames(
        num_distinct=32, frame_samples=S, bits=16, channels=2, kind="orders"
    )
    # 4096-sample payloads of three sizes: order0=7826B, order31=4234B,
    # order1=3393B (indices 0, 9, 6 in the cycled corpus).
    #
    # Per-payload uniform arms pin the ZERO-SPREAD bound without the
    # maxord/sub confound (a single-payload arm gets its own tight
    # max_order and word width, which is exactly what the mixed arm's
    # lanes would enjoy if spread were free).  The honest bound for the
    # mixed arm is the time-sum of the three uniforms at B/3 each.
    # aligned arm: pad clusters to the LANE TILE the mixed arm actually
    # used — sub * LN lanes (LANES=1024 is block granularity, the sweep
    # range is per (sub, LN) tile).
    fb_m, mo_m, cap_m, _ = stage(distinct, params, [0, 9, 6], a.batch)
    tile = (cap_m or SUB) * LN
    arms = [
        ("uni:ord0", [0], 0),
        ("uni:o31", [9], 0),
        ("uni:ord1", [6], 0),
        ("mixed", [0, 9, 6], 0),
        ("aligned", [0, 9, 6], tile),
    ]
    times: dict[str, float] = {}
    for name, ids, t in arms:
        fb, mo, cap, total = stage(distinct, params, ids, a.batch, tile=t)
        # Match the mixed arm's compiled shape for the uniform arms:
        # same max_order and sub cap, so the ONLY difference is spread.
        if name.startswith("uni"):
            mo, cap = mo_m, cap_m
        per = slope_riceab(fb, mo, cap)
        times[name] = per
        print(
            f"{name:8s} B={fb.words.shape[0]:5d} maxord={mo} sub={cap} "
            f"samples={total / 1e6:5.2f}M  riceAB {per * 1e3:7.2f} ms  "
            f"{total / per / 1e6:7.0f} Msps"
        )
    if all(k in times for k in ("uni:ord0", "uni:o31", "uni:ord1")):
        # each uniform arm ran B lanes; the mixed arm has B/3 of each
        bound = (times["uni:ord0"] + times["uni:o31"] + times["uni:ord1"]) / 3
        print(
            f"\nzero-spread bound (sum of per-payload uniforms at B/3): "
            f"{bound * 1e3:.2f} ms; mixed = {times['mixed'] * 1e3:.2f} ms "
            f"({times['mixed'] / bound:.2f}x); aligned = "
            f"{times['aligned'] * 1e3:.2f} ms "
            f"({times['aligned'] / bound:.2f}x)"
        )


if __name__ == "__main__":
    main()
