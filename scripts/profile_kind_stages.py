"""Stage-split profile of decode_frames_packed per corpus kind.

The per-kind bench number (`device_msps_by_kind`) times the FULL
production decode executable; kbench times one fused channel pass.
This script closes the gap: for each kind it slope-times, in separate
executables on the same staged batch,

  * riceA      — channel A fused pass alone,
  * riceAB     — both channel passes (B chained on A's end position),
  * extra      — the bulk_bits extra-bits / raw pass alone,
  * full       — decode_frames_packed (epilogue included),

so epilogue cost = full - riceAB - extra.  Same in-executable
fori_loop slope discipline as bench_lib._device_slope_time (one
executable per measurement; identity-multiple lane roll).

Usage: python scripts/profile_kind_stages.py [kind ...] [--batch N]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from alacnet_tpu.bench_lib import make_corpus_frames
from alacnet_tpu.ops.frame_decode import FrameMetaArrays, decode_frames_packed
from alacnet_tpu.parallel.pipeline import (
    _fused_plan, pad_frame_batch, plan_blob_batches, span_sub_hint,
)


def _slope(fn, args, trials=3, target_s=0.25):
    """In-executable fori_loop slope of fn(*args): seconds per pass."""
    import jax
    from jax import lax

    @jax.jit
    def run(salt, K, *a):
        def body(i, acc):
            roll = ((i + salt) % 7) * a[0].shape[0]
            w = jnp_roll(a[0], roll)
            return acc + fn(w, *a[1:])

        return lax.fori_loop(0, K, body, 0.0)

    import jax.numpy as jnp

    def jnp_roll(x, r):
        return jnp.roll(x, r, axis=0)

    # calibrate K
    t0 = time.perf_counter()
    run(0, 1, *args).block_until_ready()
    warm = time.perf_counter() - t0
    run(0, 2, *args).block_until_ready()
    t0 = time.perf_counter()
    run(1, 2, *args).block_until_ready()
    per2 = time.perf_counter() - t0
    K = max(4, int(target_s / max(per2 / 2, 1e-4)))
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        run(t, K, *args).block_until_ready()
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(t, 2 * K, *args).block_until_ready()
        dt2 = time.perf_counter() - t0
        best = min(best, (dt2 - dt) / K)
    return best, warm


def profile_kind(kind: str, batch: int, S: int = 4096):
    """Profile every span the production planner emits for this kind
    (multi-span kinds — e.g. orders' mixed sample counts — report one
    block per span plus a sample-weighted aggregate)."""
    distinct, params = make_corpus_frames(
        num_distinct=min(batch, 32), frame_samples=S, bits=16, channels=2,
        kind=kind,
    )
    payloads = [distinct[i % len(distinct)] for i in range(batch)]
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    perm, _, spans, span_batch = plan_blob_batches(
        blob, offsets, sizes, params, batch, strict=True
    )
    agg: dict[str, float] = {}
    agg_total = 0
    for si, (lo, hi) in enumerate(spans):
        rows, total = _profile_span(
            kind, f"{si + 1}/{len(spans)}", S,
            pad_frame_batch(span_batch(perm[lo:hi])), sizes[perm[lo:hi]],
        )
        agg_total += total
        for name, (per, _) in rows.items():
            agg[name] = agg.get(name, 0.0) + per
    if len(spans) > 1:
        print(f"  --- {kind} aggregate over {len(spans)} spans "
              f"({agg_total / 1e6:.1f} Msamples) ---")
        for name, per in agg.items():
            if per:
                print(f"  {name:8s} {per*1e3:8.2f} ms  "
                      f"{agg_total / per / 1e6:8.1f} Msps")
    return agg


def _profile_span(kind, span_label, S, fb, span_sizes):
    import jax.numpy as jnp

    use_fused, max_order = _fused_plan(fb)
    cap = span_sub_hint(span_sizes)
    words = jnp.asarray(fb.words)
    packed = jnp.asarray(FrameMetaArrays.pack_host(fb))
    jnp.sum(words).item()  # force H2D

    m = FrameMetaArrays.unpack(packed)
    n = jnp.clip(m.n_samples, 0, S)
    n_comp = jnp.where(m.is_compressed, n, 0)
    n_b = jnp.where(m.is_stereo, n_comp, 0)
    # honest per-span sample count: padding lanes carry n == 0 and
    # partial frames n < S, so sum the real per-lane counts
    total = int(np.minimum(np.asarray(fb.n_samples), S).sum())
    batch = words.shape[0]

    from alacnet_tpu.ops.pallas.bulk_bits import bulk_bits
    from alacnet_tpu.ops.pallas.rice_lpc import fused_rice_lpc

    def rice_a(w, pk):
        mm = FrameMetaArrays.unpack(pk)
        out, pos = fused_rice_lpc(
            w, mm.entropy_pos, n_comp, mm.rss, mm.kmod, mm.init_history,
            mm.rice_mult[:, 0], mm.kmask, mm.order[:, 0], mm.quant[:, 0],
            mm.rc[:, 0], S, max_order=max_order, sub_hint=cap,
        )
        return jnp.sum(out[:, -1] + pos).astype(jnp.float32)

    def rice_ab(w, pk):
        mm = FrameMetaArrays.unpack(pk)
        out_a, pos = fused_rice_lpc(
            w, mm.entropy_pos, n_comp, mm.rss, mm.kmod, mm.init_history,
            mm.rice_mult[:, 0], mm.kmask, mm.order[:, 0], mm.quant[:, 0],
            mm.rc[:, 0], S, max_order=max_order, sub_hint=cap,
        )
        out_b, end_b = fused_rice_lpc(
            w, jnp.maximum(pos, 0), n_b, mm.rss, mm.kmod, mm.init_history,
            mm.rice_mult[:, 1], mm.kmask, mm.order[:, 1], mm.quant[:, 1],
            mm.rc[:, 1], S, max_order=max_order, sub_hint=cap,
        )
        return jnp.sum(out_a[:, -1] + out_b[:, -1] + end_b).astype(
            jnp.float32
        )

    any_extra = bool(jnp.any(m.ub > 0).item())

    def extra(w, pk):
        mm = FrameMetaArrays.unpack(pk)
        ub8 = mm.ub * 8
        n_eb = jnp.where((mm.ub > 0) & mm.is_compressed, n, 0)
        ea, eb, st = bulk_bits(
            w, mm.payload_pos, n_eb, ub8,
            jnp.where(mm.is_stereo, ub8, 0), S, sub_hint=cap,
        )
        return jnp.sum(ea[:, -1] + eb[:, -1] + st).astype(jnp.float32)

    def full(w, pk):
        out, nn = decode_frames_packed(
            w, pk, S, use_fused=use_fused, max_order=max_order,
            sub_hint=cap,
        )
        return jnp.sum(out[:, -1, 0] + nn).astype(jnp.float32)

    rows = {}
    for name, fn in [
        ("riceA", rice_a), ("riceAB", rice_ab),
        ("extra", extra if any_extra else None), ("full", full),
    ]:
        if fn is None:
            rows[name] = (0.0, 0.0)
            continue
        per, warm = _slope(fn, (words, packed))
        rows[name] = (per, total / per / 1e6)

    epi = rows["full"][0] - rows["riceAB"][0] - rows["extra"][0]
    print(f"\n=== {kind} span {span_label} (B={batch}, fused={use_fused}, "
          f"maxord={max_order}, sub={cap}, extra={any_extra}, "
          f"{total / 1e6:.1f} Msamples) ===")
    for name, (per, msps) in rows.items():
        if per:
            print(f"  {name:8s} {per*1e3:8.2f} ms  {msps:8.1f} Msps")
    print(f"  {'epilogue':8s} {epi*1e3:8.2f} ms  "
          f"({epi/rows['full'][0]*100:.0f}% of full)")
    rows["epilogue"] = (epi, total / max(epi, 1e-9) / 1e6)
    return rows, total


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", nargs="*", default=["music", "fat24", "hires24"])
    ap.add_argument("--batch", type=int, default=4096)
    a = ap.parse_args()
    for k in a.kinds or ["music", "fat24", "hires24"]:
        profile_kind(k, a.batch)
