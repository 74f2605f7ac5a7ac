"""On-hardware validation: compiled Pallas kernels vs XLA path, per corpus.

The CPU test suite runs the same kernels through the Pallas interpreter;
compiled-vs-interpreted divergence (e.g. the kz shift-lowering incident,
docs/DESIGN.md §4) is this kernel's most likely regression class, so every
round records a hardware artifact (VERDICT r2 next #5):

    python scripts/tpu_check.py --out TPUCHECK_r03.json

Checks, all against the reference-semantics XLA scan path bit for bit:
  * every bench corpus kind (music/spiky/silence/orders/hires24/fat24)
    through the PRODUCTION batching path (plan_blob_batches spans,
    per-span static max_order, streaming window for the fat kinds);
  * a randomized differential mini-fuzz (structurally valid headers +
    arbitrary entropy bodies, tests/test_fuzz_differential payload
    generator) — compiled fused == XLA == scalar oracle.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alacnet_tpu.bench_lib import CORPUS_KINDS, make_corpus_frames  # noqa: E402
from alacnet_tpu.ops.frame_decode import (  # noqa: E402
    FrameMetaArrays, decode_frames_packed,
)
from alacnet_tpu.parallel.pipeline import (  # noqa: E402
    _fused_plan, pad_frame_batch, plan_blob_batches,
)


def check_kind(kind: str, batch: int, frame_samples: int) -> dict:
    distinct, params = make_corpus_frames(
        num_distinct=16, frame_samples=frame_samples, kind=kind
    )
    payloads = [distinct[i % len(distinct)] for i in range(batch)]
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    perm, _, spans, span_batch = plan_blob_batches(
        blob, offsets, sizes, params, batch, strict=True
    )
    ok = True
    fused_any = False
    total = 0
    t0 = time.time()
    for lo, hi in spans:
        fb = pad_frame_batch(span_batch(perm[lo:hi]))
        uf, mo = _fused_plan(fb)
        fused_any = fused_any or uf
        w = jnp.asarray(fb.words)
        mv = jnp.asarray(FrameMetaArrays.pack_host(fb))
        out, n = decode_frames_packed(
            w, mv, frame_samples, use_fused=uf, max_order=mo
        )
        n_h = np.asarray(n)
        ok = ok and (n_h >= 0).all()  # no streaming stalls on real corpora
        total += int(n_h.clip(0).sum())
        if uf:
            ref, _ = decode_frames_packed(
                w, mv, frame_samples, use_fused=False, max_order=mo
            )
            ok = ok and bool(jnp.array_equal(out, ref).item())
    return {
        "parity_ok": bool(ok),
        "fused": fused_any,
        "spans": len(spans),
        "samples": total,
        "wall_s": round(time.time() - t0, 2),
    }


def check_devpack(batch: int, frame_samples: int, seed: int) -> dict:
    """decode_blob with device-side row assembly (config.device_pack,
    ops/pallas/pack_rows compiled on hardware) vs host-packed rows:
    identical PCM over a mixed-kind corpus — pins the pack kernel's
    Mosaic lowering (DMA windows, log2 shifter, tail mask) every round."""
    from alacnet_tpu import config as cfg
    from alacnet_tpu.bench_lib import _mixed_pool
    from alacnet_tpu.parallel.pipeline import decode_blob

    pool, params = _mixed_pool(frame_samples, 16, seed=seed)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(
        np.repeat(np.arange(len(pool)), -(-batch // len(pool)))[:batch]
    )
    payloads = [pool[i] for i in idx]
    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    t0 = time.time()
    saved = cfg.DEFAULT.device_pack
    results = {}
    try:
        for flag in (True, False):
            cfg.DEFAULT.device_pack = flag
            results[flag] = decode_blob(
                blob, offsets, sizes, params, frame_samples, batch_limit=batch
            )
    finally:
        cfg.DEFAULT.device_pack = saved
    out_on, n_on, st_on = results[True]
    out_off, n_off, st_off = results[False]
    ok = (
        not st_on.any()
        and not st_off.any()
        and np.array_equal(n_on, n_off)
        and np.array_equal(out_on, out_off)
    )
    return {
        "parity_ok": bool(ok),
        "frames": int(batch),
        "wall_s": round(time.time() - t0, 2),
    }


def check_encpack(frames: int, frame_samples: int, seed: int) -> dict:
    """Encode with device-side frame packing (ALAC_ENC_DEVICE_PACK,
    ops/encode.pack_frames_device compiled on hardware) vs the host
    packer: byte-identical payloads over mixed content (music, silence
    zero-runs, noise escapes, mono, partial frames) — pins the compiled
    lowering of the pack kernel's scatter/searchsorted/gather-OR phases
    and the big-endian bitcast byte order."""
    import os

    from alacnet_tpu.bench_lib import _music_pcm
    from alacnet_tpu.codec.cookie import default_cookie
    from alacnet_tpu.codec.encoder import EncoderConfig
    from alacnet_tpu.codec.encoder_tpu import encode_frames_tpu

    rng = np.random.default_rng(seed)
    S = frame_samples
    params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
    pcm = _music_pcm(frames * S, 16, 2, rng)
    pcm[2 * S : 4 * S] = 0  # zero-run frames
    pcm[5 * S : 6 * S] = rng.integers(-32768, 32767, (S, 2))  # escapes
    fr = [pcm[i * S : (i + 1) * S] for i in range(frames)]
    fr[1] = fr[1][: S // 2 + 7]  # partial
    fr[3] = fr[3][:, :1]  # mono
    cfg = EncoderConfig(order=6)
    t0 = time.time()
    saved = os.environ.get("ALAC_ENC_DEVICE_PACK")
    try:
        os.environ["ALAC_ENC_DEVICE_PACK"] = "0"
        want = encode_frames_tpu(fr, params, cfg)
        os.environ["ALAC_ENC_DEVICE_PACK"] = "1"
        got = encode_frames_tpu(fr, params, cfg)
    finally:
        if saved is None:
            os.environ.pop("ALAC_ENC_DEVICE_PACK", None)
        else:
            os.environ["ALAC_ENC_DEVICE_PACK"] = saved
    return {
        "parity_ok": got == want,
        "frames": frames,
        "wall_s": round(time.time() - t0, 2),
    }


def check_encstage(frames: int, frame_samples: int, seed: int) -> dict:
    """Fused encode automatons (ops/pallas/enc_stages.py compiled on
    hardware) vs the XLA scan path: byte-identical payloads through the
    full pipeline over mixed content (music, silence zero-runs, noise
    escapes, mono, partial frames, order 0/6/31, 24-bit extra-bits).
    Pins the compiled lowering of the predictor window/adaptive walk
    and the rice emit + chunk merge."""
    import os

    from alacnet_tpu.bench_lib import _music_pcm
    from alacnet_tpu.codec.cookie import default_cookie
    from alacnet_tpu.codec.encoder import EncoderConfig
    from alacnet_tpu.codec.encoder_tpu import encode_frames_tpu

    rng = np.random.default_rng(seed)
    S = frame_samples
    t0 = time.time()
    ok = True
    saved = os.environ.get("ALAC_ENC_KERNEL")

    def both(params, fr, cfg):
        os.environ["ALAC_ENC_KERNEL"] = "xla"
        want = encode_frames_tpu(fr, params, cfg)
        os.environ["ALAC_ENC_KERNEL"] = "fused"
        got = encode_frames_tpu(fr, params, cfg)
        return got == want

    try:
        params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
        pcm = _music_pcm(frames * S, 16, 2, rng)
        pcm[2 * S : 4 * S] = 0
        pcm[5 * S : 6 * S] = rng.integers(-32768, 32767, (S, 2))
        fr = [pcm[i * S : (i + 1) * S] for i in range(frames)]
        fr[1] = fr[1][: S // 2 + 7]  # partial
        fr[3] = fr[3][:, :1]  # mono
        for order in (0, 6, 31):
            ok = ok and both(params, fr, EncoderConfig(order=order))
        p24 = default_cookie(96000, 24, 2, max_samples_per_frame=S)
        pcm24 = _music_pcm(8 * S, 24, 2, rng)
        fr24 = [pcm24[i * S : (i + 1) * S] for i in range(8)]
        ok = ok and both(
            p24, fr24, EncoderConfig(order=6, uncompressed_bytes=1)
        )
    finally:
        if saved is None:
            os.environ.pop("ALAC_ENC_KERNEL", None)
        else:
            os.environ["ALAC_ENC_KERNEL"] = saved
    return {
        "parity_ok": bool(ok),
        "frames": frames,
        "wall_s": round(time.time() - t0, 2),
    }


def check_encpairs(frames: int, frame_samples: int, seed: int) -> dict:
    """Pair-plane packing on hardware: the fused kernels' chunk planes
    through merge_pair_chunks + the native two-frame pair packer vs the
    classic per-sample chunk path — byte-identical payloads over mixed
    content (music, silence zero-runs, noise escapes, mono, partial
    frames, 24-bit extra-bits).  Pins the compiled lowering of the
    96-bit pair fold's multi-word shifts."""
    import os

    from alacnet_tpu.bench_lib import _music_pcm
    from alacnet_tpu.codec.cookie import default_cookie
    from alacnet_tpu.codec.encoder import EncoderConfig
    from alacnet_tpu.codec.encoder_tpu import encode_frames_tpu

    rng = np.random.default_rng(seed)
    S = frame_samples
    t0 = time.time()
    ok = True
    saved = os.environ.get("ALAC_ENC_PAIR")

    def both(params, fr, cfg):
        os.environ["ALAC_ENC_PAIR"] = "0"
        want = encode_frames_tpu(fr, params, cfg)
        os.environ["ALAC_ENC_PAIR"] = "1"
        got = encode_frames_tpu(fr, params, cfg)
        return got == want

    try:
        params = default_cookie(44100, 16, 2, max_samples_per_frame=S)
        pcm = _music_pcm(frames * S, 16, 2, rng)
        pcm[2 * S : 4 * S] = 0
        pcm[5 * S : 6 * S] = rng.integers(-32768, 32767, (S, 2))
        fr = [pcm[i * S : (i + 1) * S] for i in range(frames)]
        fr[1] = fr[1][: S // 2 + 7]  # partial -> odd pair tail
        fr[3] = fr[3][:, :1]  # mono -> unpaired C++ path neighbor
        ok = ok and both(params, fr, EncoderConfig(order=6))
        p24 = default_cookie(96000, 24, 2, max_samples_per_frame=S)
        pcm24 = _music_pcm(8 * S, 24, 2, rng)
        fr24 = [pcm24[i * S : (i + 1) * S] for i in range(8)]
        ok = ok and both(
            p24, fr24, EncoderConfig(order=6, uncompressed_bytes=1)
        )
    finally:
        if saved is None:
            os.environ.pop("ALAC_ENC_PAIR", None)
        else:
            os.environ["ALAC_ENC_PAIR"] = saved
    return {
        "parity_ok": bool(ok),
        "frames": frames,
        "wall_s": round(time.time() - t0, 2),
    }


def check_regression(n_runs: int = 3, threshold: float = 0.75) -> dict:
    """Round-over-round per-kind throughput gate (VERDICT r4 next #1c).

    Slope-measures every corpus kind (median of ``n_runs`` independent
    runs, bench_lib dispersion discipline) and compares against the
    PRIOR round's artifact — the highest-numbered ``BENCH_r*.json`` —
    using its per-kind dispersion median when recorded, else its single
    value.  A kind below ``threshold`` x prior fails the section: a
    >25% drop is a regression or a harness bug, never weather, under
    the hardened slope gate (bench_lib._slope_measure).  Waive a kind
    with an explaining commit via ALAC_REGRESSION_WAIVE=kind1,kind2.
    """
    import os

    from alacnet_tpu.bench_lib import run_benchmark

    arts = sorted(Path(__file__).resolve().parents[1].glob("BENCH_r*.json"))
    if not arts:
        return {"parity_ok": True, "skipped": "no prior BENCH artifact"}
    prior_rec = json.loads(arts[-1].read_text())
    prior_p = prior_rec.get("parsed", prior_rec)
    prior_kinds = prior_p.get("device_msps_by_kind", {})
    prior_disp = prior_p.get("device_msps_by_kind_dispersion", {})
    waived = set(
        k for k in os.environ.get("ALAC_REGRESSION_WAIVE", "").split(",") if k
    )
    out = {"prior_artifact": arts[-1].name, "kinds": {}}
    ok = True
    for kind in CORPUS_KINDS:
        prior = prior_disp.get(kind, {}).get("median_msps") or prior_kinds.get(
            kind
        )
        if not prior:
            continue
        # batch=4096 matches run_full_benchmark's per-kind measurement
        # exactly — the ratio must compare like with like.
        r = run_benchmark(batch=4096, repeats=2, kind=kind, dispersion=n_runs)
        cur = r["value"]
        kind_ok = (cur >= threshold * prior) or kind in waived
        out["kinds"][kind] = {
            "prior_msps": prior,
            "current_median_msps": cur,
            "ratio": round(cur / prior, 3),
            "dispersion": r.get("dispersion"),
            "ok": bool(kind_ok),
            **({"waived": True} if kind in waived else {}),
        }
        ok = ok and kind_ok
    out["parity_ok"] = bool(ok)
    return out


def check_fuzz(count: int, seed: int) -> dict:
    """Compiled fused == XLA == scalar oracle on random-body payloads."""
    from tests.test_fuzz_differential import S as FS
    from tests.test_fuzz_differential import (
        _fused_vs_xla_channel, _random_payload,
    )
    from tests.test_handcrafted import oracle_frame

    from alacnet_tpu.codec.cookie import default_cookie
    from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec
    from alacnet_tpu.ops.frame_decode import decode_frames
    from alacnet_tpu.ops.pallas.rice_lpc import LANES

    rng = np.random.default_rng(seed)
    params = default_cookie(44100, 16, 2, max_samples_per_frame=FS)
    pls = [_random_payload(rng, params, 16) for _ in range(count)]
    payloads = [p for p, _ in pls]
    fb = parse_frame_headers_vec(payloads, params)
    meta = FrameMetaArrays.from_batch(fb)
    out = np.asarray(decode_frames(jnp.asarray(fb.words), meta, FS)[0])
    oracle_ok = True
    for i in rng.choice(count, size=min(64, count), replace=False):
        nch = pls[i][1]
        expect = oracle_frame(params, payloads[i], nch)
        oracle_ok = oracle_ok and np.array_equal(
            out[i, : expect.shape[0], :nch], expect
        )
    pad_b = -(-fb.batch // LANES) * LANES
    fbp = pad_frame_batch(fb, pad_b)
    n_comp = jnp.asarray(np.clip(fbp.n_samples, 0, FS) * fbp.is_compressed)
    n_b = jnp.asarray(
        np.clip(fbp.n_samples, 0, FS) * fbp.is_compressed * fbp.is_stereo
    )
    try:
        end_a = _fused_vs_xla_channel(
            fbp, 0, jnp.asarray(fbp.entropy_pos), n_comp, FS
        )
        _fused_vs_xla_channel(fbp, 1, end_a, n_b, FS)
        fused_ok = True
    except AssertionError:
        fused_ok = False
    return {
        "count": count,
        "oracle_ok": bool(oracle_ok),
        "fused_ok": fused_ok,
        "parity_ok": bool(oracle_ok and fused_ok),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--frame-samples", type=int, default=4096)
    ap.add_argument("--fuzz", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--encpack-frames", type=int, default=256)
    ap.add_argument(
        "--resume", action="store_true",
        help="skip sections already green in --out (cold compiles over "
        "the dev relay can exceed one run window; each section that "
        "finishes is written immediately, so repeated --resume runs "
        "make monotonic progress)",
    )
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = {
        "batch": args.batch,
        "frame_samples": args.frame_samples,
        "fuzz_count": args.fuzz,
        "seed": args.seed,
        "encpack_frames": args.encpack_frames,
    }
    record = {"backend": "tpu", "kinds": {}, **cfg}
    if args.resume and args.out and Path(args.out).exists():
        prior = json.loads(Path(args.out).read_text())
        # Reuse sections only when EVERY config knob matches — a green
        # section from a different batch/frame-samples/seed (or one
        # recorded before these fields existed) must re-run.
        if all(prior.get(k) == v for k, v in cfg.items()):
            record["kinds"] = {
                k: v for k, v in prior.get("kinds", {}).items()
                if v.get("parity_ok")
            }
            for sec in (
                "devpack", "encpack", "encstage", "encpairs", "fuzz",
                "regression",
            ):
                if prior.get(sec, {}).get("parity_ok"):
                    record[sec] = prior[sec]

    def checkpoint():
        if args.out:
            snap = dict(record)
            snap["all_ok"] = False  # only the complete pass sets it
            Path(args.out).write_text(json.dumps(snap, indent=1) + "\n")

    all_ok = True
    for kind in CORPUS_KINDS:
        if kind in record["kinds"]:
            print(f"{kind}: (resumed green)")
            continue
        r = check_kind(kind, args.batch, args.frame_samples)
        record["kinds"][kind] = r
        all_ok = all_ok and r["parity_ok"]
        print(f"{kind}: {r}")
        checkpoint()
    if "devpack" not in record:
        record["devpack"] = check_devpack(
            args.batch, args.frame_samples, args.seed
        )
        checkpoint()
    all_ok = all_ok and record["devpack"]["parity_ok"]
    print("devpack:", record["devpack"])
    if "encpack" not in record:
        record["encpack"] = check_encpack(
            args.encpack_frames, args.frame_samples, args.seed
        )
        checkpoint()
    all_ok = all_ok and record["encpack"]["parity_ok"]
    print("encpack:", record["encpack"])
    if "encstage" not in record:
        record["encstage"] = check_encstage(
            args.encpack_frames, args.frame_samples, args.seed
        )
        checkpoint()
    all_ok = all_ok and record["encstage"]["parity_ok"]
    print("encstage:", record["encstage"])
    if "encpairs" not in record:
        record["encpairs"] = check_encpairs(
            args.encpack_frames, args.frame_samples, args.seed
        )
        checkpoint()
    all_ok = all_ok and record["encpairs"]["parity_ok"]
    print("encpairs:", record["encpairs"])
    if "fuzz" not in record:
        record["fuzz"] = check_fuzz(args.fuzz, args.seed)
        checkpoint()
    all_ok = all_ok and record["fuzz"]["parity_ok"]
    print("fuzz:", record["fuzz"])
    if "regression" not in record:
        record["regression"] = check_regression()
        checkpoint()
    all_ok = all_ok and record["regression"]["parity_ok"]
    print("regression:", json.dumps(record["regression"], indent=1))
    all_ok = all_ok and all(
        record["kinds"].get(k, {}).get("parity_ok") for k in CORPUS_KINDS
    )
    record["all_ok"] = all_ok
    if args.out:
        Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
        print(f"wrote {args.out}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
