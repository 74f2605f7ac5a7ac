"""Decode-throughput benchmark harness.

The reference publishes no numbers (BASELINE.md); the north-star target is
>= 1000x realtime per chip for 44.1 kHz/16-bit stereo batch decode
(~88.2 Msamples/s, BASELINE.json).  Two measurements:

  * :func:`run_benchmark` — device-stage throughput for one corpus kind
    (kernel time only; inputs pre-staged).
  * :func:`run_e2e_benchmark` — sustained production pipeline through
    ``decode_blob``: native C++ header parse -> H2D -> fused device
    decode, host stage overlapped with device decode, over a mixed
    corpus (music/escape-heavy/zero-run/mixed-order/partial frames) so
    the size-sorted bucketing actually runs.  PCM is consumed on-device
    (``sink=``, checksum) — the decode-to-device path; the axon tunnel's
    ~0.3 MB/s D2H is an environment artifact, not a pipeline property.

Corpus kinds cover the kernel's divergence extremes (VERDICT r1 weak #5):
``music`` (order-6 adaptive FIR — the expensive common case), ``spiky``
(escape-heavy: low Rice history + outliers force the 9-ones + raw-rss
escape, AlacFile.cs:196-202), ``silence`` (zero-run blocks,
AlacFile.cs:231-249), ``orders`` (orders 0/1/4/8/31 mixed with partial
frames, so frame byte sizes vary).
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from .codec.cookie import default_cookie
from .codec.encoder import AlacEncoder, EncoderConfig

from .ops.frame_decode import FrameMetaArrays, decode_frames
from .parallel.pipeline import pad_frame_batch

#: North-star: 1000x realtime, 44.1 kHz stereo (BASELINE.json).
NORTH_STAR_MSAMPLES = 88.2


def relay_reachable() -> bool:
    """Best-effort fast-fail probe for the axon dev relay.

    When the relay terminal is down, jax backend init retries the
    device claim forever — callers would hang instead of failing.  A
    refused TCP connect to the terminal port means certainly-down;
    anything else (success, timeout, unresolvable) reads as reachable
    so jax gets its normal chance.  Probe only applies under
    AXON_LOOPBACK_RELAY; address overridable via ALAC_RELAY_PROBE.
    """
    import socket

    if not os.environ.get("AXON_LOOPBACK_RELAY"):
        return True
    host, _, port = os.environ.get(
        "ALAC_RELAY_PROBE", "127.0.0.1:8082"
    ).rpartition(":")
    try:
        with socket.create_connection((host or "127.0.0.1", int(port)), 5):
            return True
    except ConnectionRefusedError:
        return False
    except OSError:
        return True  # inconclusive — let jax try


def _relay() -> bool:
    """True when the device sits behind the axon dev relay (single
    serialized tunnel, ~25 ms dispatch round trips — DESIGN.md §4c).
    Gates the blocking/timed H2D measurement and the relay corrections
    in :func:`run_e2e_benchmark`; on a directly-attached backend the
    overlapped wall is used raw.  Read at CALL time, not import time
    (ADVICE r4): a driver that imports this module before exporting
    AXON_LOOPBACK_RELAY must still get the timed/blocking put path."""
    return bool(os.environ.get("AXON_LOOPBACK_RELAY"))

CORPUS_KINDS = ("music", "spiky", "silence", "orders", "hires24", "fat24")


def _music_pcm(n: int, bits: int, channels: int, rng) -> np.ndarray:
    t = np.arange(n)
    amp = (1 << (bits - 1)) * 0.12
    chans = []
    for c in range(channels):
        sig = (
            amp * np.sin(t * 0.013 + c)
            + 0.5 * amp * np.sin(t * 0.0913 + 2.7 * c)
            + 0.1 * amp * np.sin(t * 0.537)
            + rng.normal(0, amp * 0.01, n)
        )
        chans.append(sig)
    lim = 1 << (bits - 1)
    return np.clip(np.stack(chans, axis=1), -lim, lim - 1).astype(np.int32)


def make_kind_frames(
    kind: str,
    num_distinct: int,
    frame_samples: int,
    params,
    bits: int = 16,
    channels: int = 2,
    seed: int = 42,
) -> list[bytes]:
    """Encode ``num_distinct`` distinct frames of one corpus kind."""
    rng = np.random.default_rng(seed)
    n = num_distinct * frame_samples
    lim = 1 << (bits - 1)
    if kind == "music":
        pcm = _music_pcm(n, bits, channels, rng)
        orders, sizes = [6], [frame_samples]
    elif kind == "spiky":
        # Mostly-small residuals keep Rice history (and k) low; outlier
        # spikes then overflow the unary budget -> escape path.
        # Spike rate tuned so coded frames stay under the fused kernel's
        # VMEM word cap (pipeline.FUSED_MAX_WORDS) — denser spikes push
        # the batch onto the XLA fallback, which benches the wrong path.
        pcm = rng.integers(-40, 40, (n, channels)).astype(np.int32)
        spikes = rng.random((n, channels)) < 0.01
        pcm = np.where(
            spikes, rng.integers(-lim, lim, (n, channels)), pcm
        ).astype(np.int32)
        orders, sizes = [4], [frame_samples]
    elif kind == "silence":
        pcm = np.zeros((n, channels), np.int32)
        idx = rng.integers(0, n, max(1, n // 2048))
        pcm[idx, 0] = rng.integers(1, 1000, idx.size)
        orders, sizes = [4], [frame_samples]
    elif kind == "hires24":
        # 24-bit content: coded frames run 12-16 KB — exercises the
        # narrow (sub=4) lane tile that keeps fat frames on the fused
        # kernel instead of the XLA fallback.
        pcm = _music_pcm(n, 24, channels, rng)
        # ~9 bits of unpredictable low-order content: realistic 24/96
        # material compresses to ~50-60% (= 12-14 KB coded frames, the
        # sub=4 lane-tile regime); white 12-bit noise would push frames
        # past any kernel's VMEM word table.
        pcm = np.clip(
            pcm + rng.integers(-400, 400, pcm.shape),
            -(1 << 23), (1 << 23) - 1,
        ).astype(np.int32)
        orders, sizes = [6], [frame_samples]
        # ub=1 extra-bits is how real encoders handle 24-bit (the 16-bit
        # coef grid can't predict a 24-bit-scale signal below ~2^13
        # residuals; the low byte rides the raw side channel instead):
        # ~17 KB coded frames -> the sub=4 lane-tile regime.
        encs = [AlacEncoder(params, EncoderConfig(order=o, uncompressed_bytes=1))
                for o in orders]
        payloads = []
        pos = 0
        for i in range(num_distinct):
            payloads.append(encs[i % len(encs)].encode_frame(
                pcm[pos : pos + frame_samples]))
            pos = (pos + frame_samples) % (n - frame_samples + 1)
        return payloads
    elif kind == "fat24":
        # The worst legal ALAC frame shape: near-white 24-bit noise with
        # the ub=1 extra-bits side channel — ~28-33 KB coded, the sub=2
        # narrow-lane-tile regime (round 2b; previously the XLA path).
        pcm = rng.integers(-(1 << 23), 1 << 23, (n, channels)).astype(np.int32)
        enc = AlacEncoder(params, EncoderConfig(order=6, uncompressed_bytes=1))
        return [
            enc.encode_frame(pcm[i * frame_samples : (i + 1) * frame_samples])
            for i in range(num_distinct)
        ]
    elif kind == "orders":
        # Quiet content: order-0 passthrough codes the raw residual, so
        # loud PCM would produce pathological frame sizes no real encoder
        # emits (it would pick a higher order or a raw frame instead).
        pcm = (_music_pcm(n, bits, channels, rng) / 64).astype(np.int32)
        orders = [0, 1, 4, 8, 31]
        sizes = [frame_samples, frame_samples // 2, frame_samples // 4]
    else:
        raise ValueError(f"unknown corpus kind {kind!r}")
    payloads = []
    encs = [AlacEncoder(params, EncoderConfig(order=o)) for o in orders]
    pos = 0
    for i in range(num_distinct):
        sz = sizes[i % len(sizes)]
        if pos + sz > n:
            pos = 0
        payloads.append(encs[i % len(encs)].encode_frame(pcm[pos : pos + sz]))
        pos += sz
    return payloads


def make_corpus_frames(
    num_distinct: int = 32,
    frame_samples: int = 4096,
    bits: int = 16,
    channels: int = 2,
    order: int = 6,
    seed: int = 42,
    kind: str = "music",
) -> tuple[list[bytes], "object"]:
    """Encode ``num_distinct`` frames of one kind; returns (payloads, params)."""
    if kind in ("hires24", "fat24"):
        bits = 24
    params = default_cookie(96000 if bits == 24 else 44100, bits, channels, frame_samples)
    if kind == "music" and order != 6:
        rng = np.random.default_rng(seed)
        pcm = _music_pcm(num_distinct * frame_samples, bits, channels, rng)
        enc = AlacEncoder(params, EncoderConfig(order=order))
        return [
            enc.encode_frame(pcm[i * frame_samples : (i + 1) * frame_samples])
            for i in range(num_distinct)
        ], params
    return (
        make_kind_frames(
            kind, num_distinct, frame_samples, params, bits, channels, seed
        ),
        params,
    )


def _slope_measure(make, call_args, trials: int, target_s: float) -> float:
    """Shared slope-timing harness: per-pass seconds of one jitted body,
    as an in-executable slope — ``make()`` returns a jitted
    ``run(salt, K, *call_args)`` that executes the body K times in a
    ``fori_loop`` with a TRACED trip count;
    ``per_pass = (t(K2) - t(1)) / (K2 - 1)``.

    Why a slope inside one executable: the dev relay serializes each
    executable call at a ~10-25 ms round trip (DESIGN.md §4c), so chains
    of separate dispatches measure that floor, not the kernel — the
    round-2 bench understated multi-span kinds ~2x this way (orders read
    388 while the kernel runs at ~810 Msps).  The fixed per-call cost
    cancels exactly in the slope.  The salt argument keeps timed RPCs
    byte-distinct (the relay memoizes identical calls).

    Why K is a runtime argument and not baked into the executable: a
    cold remote compile takes minutes over this relay, and static-K
    builds cost one compile per (span, K) — three per span with the
    adaptive retry.  A dynamic trip count (XLA lowers the fori_loop to
    a while loop) compiles each span's slope body exactly ONCE and
    serves every K, including the adaptive retry, from the persistent
    compilation cache.
    """
    seed = int(np.random.default_rng().integers(1 << 20))
    run = make()
    run(jnp.uint32(seed), jnp.int32(1), *call_args).item()  # compile + warm

    def tmin(K, base):
        best = float("inf")
        for j in range(trials):
            t0 = time.perf_counter()
            run(
                jnp.uint32(seed + base + j), jnp.int32(K), *call_args
            ).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = tmin(1, 100)
    K2 = 9
    tk = tmin(K2, 200)
    per = max(tk - t1, 1e-6) / (K2 - 1)
    # Robustness gate (VERDICT r4 weak #1).  The round-4 driver run
    # recorded spiky at 1019 Msps where the same HEAD measures ~2000
    # interactively: under a 7 MB/s relay the per-call floor t1 rides
    # ~30-60 ms of jitter, and the old acceptance bar
    # (tk - t1 >= max(t1, 0.05)) let the slope be extracted from a
    # difference of the same order as that jitter — a 2x error.  The
    # slope is only trusted once the LOOP BODY dominates the timed
    # call: tk - t1 >= max(3*t1, 0.5 s).  Escalate K (traced trip
    # count — no recompile; odd K keeps RPCs byte-distinct from
    # earlier calls') until it does, up to two rounds / K = 1025.
    grew = 0
    while tk - t1 < max(3 * t1, 0.5) and grew < 2 and K2 < 1025:
        K2 = min(
            1025,
            max(2 * K2 + 1, int(max(target_s, 0.5) / max(per, 1e-5)) | 1),
        )
        tk = tmin(K2, 300 + 100 * grew)
        per = max(tk - t1, 1e-6) / (K2 - 1)
        grew += 1
    return per


def _device_slope_time(
    flags,
    arrs,
    frame_samples: int,
    trials: int = 3,
    target_s: float = 0.25,
) -> float:
    """Per-pass device time for a staged span list: the sum of per-span
    in-executable ``fori_loop`` slopes (see ``_slope_measure``).

    One slope executable PER SPAN, not one monolith over the whole list:
    production ``decode_blob`` dispatches each span as its own
    executable, so per-span slopes time exactly the production unit —
    and each executable stays small enough that a cold remote compile
    (minutes over this relay) lands in the persistent compilation cache
    span by span instead of an all-or-nothing multi-span program.

    Lanes are rolled by a dynamic multiple of the span's lane count —
    an identity permutation, so every iteration decodes the planner's
    exact lane blocks (rolling by +1, as round 2 did, shuffles lanes
    across the kernel's sub*128-lane block boundaries and times
    worse-than-production block compositions on size-mixed spans:
    orders read ~750 while per-span dispatch runs ~1750 Msps).  The
    shift still depends on the loop index, so the body can't be hoisted
    (XLA cannot prove a dynamic roll is identity); the roll itself
    moves ~2 orders of magnitude less HBM than a decode pass.
    ``flags`` is a list of per-span (use_fused, max_order, sub_hint,
    range_mode);
    ``arrs`` interleaves per-span device-resident (words, packed_meta).
    """
    import jax
    from jax import lax

    from .ops.frame_decode import decode_frames_packed

    total = 0.0
    for si, (uf, mo, cap, rm) in enumerate(flags):
        w0, m0 = arrs[2 * si], arrs[2 * si + 1]
        B = w0.shape[0]

        def make(uf=uf, mo=mo, cap=cap, rm=rm, B=B):
            @jax.jit
            def run(salt, K, w0, m0):
                def body(i, acc):
                    # ((i+salt) mod 7) * B: a multiple of the lane
                    # count (identity permutation, production block
                    # layout) that XLA can't constant-fold; bounded so
                    # the uint32 product never wraps past a
                    # non-power-of-2 B.
                    r = ((i + salt) % jnp.uint32(7)) * jnp.uint32(B)
                    w = jnp.roll(w0, r, axis=0)
                    mv = jnp.roll(m0, r, axis=0)
                    out, n = decode_frames_packed(
                        w, mv, frame_samples,
                        use_fused=uf, max_order=mo, sub_hint=cap,
                        range_mode=rm,
                    )
                    return (
                        acc + jnp.sum(n) + out[-1, -1, -1].astype(jnp.int32)
                    )

                return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))

            return run

        total += _slope_measure(make, (w0, m0), trials, target_s)
    return total


def _pack_slope_time(blob_u8, row_spans, max_w: int, trials: int = 3) -> float:
    """Per-pass device cost of the on-device row assembly (config
    device_pack): blob->words (ops/pallas/pack_rows.blob_words) plus
    per-span row gather (pack_rows), as in-executable ``fori_loop``
    slopes (see ``_slope_measure``) — the relay's per-dispatch floor
    cancels in each slope.  Production ``decode_blob`` runs blob->words
    once per batch and one pack dispatch per span, so the cost is timed
    in exactly those units: one slope for the byteswap, one per span
    (keeping each executable small enough to land in the compilation
    cache independently).  ``row_spans`` is a list of per-span
    (ow, nbytes, W) with ow/nbytes already padded to the span's lane
    count."""
    import jax
    from jax import lax

    from .ops.pallas.pack_rows import (
        _words_from_le, host_le_words, pack_rows, pack_rows_xla,
    )

    # Same backend selection as production dispatch_frame_batch.
    pack = pack_rows if jax.default_backend() == "tpu" else pack_rows_xla
    w32, tail_be, nq = host_le_words(blob_u8, max_w)
    blob_d = jnp.asarray(w32)
    tail_d = jnp.uint32(tail_be)
    nblob = int(blob_d.shape[0])

    def make_words():
        @jax.jit
        def run(salt, K, blob):
            def body(i, acc):
                # Identity-multiple roll (see _device_slope_time): the
                # body depends on i so it can't be hoisted, and the
                # byteswap cost is unchanged.
                r = ((i + salt) % jnp.uint32(7)) * jnp.uint32(nblob)
                bw = _words_from_le(jnp.roll(blob, r), tail_d, nq)
                return acc + bw[0, 0].astype(jnp.int32)

            return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))

        return run

    total = _slope_measure(make_words, (blob_d,), trials, 0.25)

    bw_d = _words_from_le(blob_d, tail_d, nq)
    bw_d.block_until_ready()
    for ow, nb, W in row_spans:
        ow_d, nb_d = jnp.asarray(ow), jnp.asarray(nb)
        Bs = int(ow_d.shape[0])
        jnp.sum(ow_d).item()  # force H2D through the relay

        def make(W=W, Bs=Bs):
            @jax.jit
            def run(salt, K, bw, ow0, nb0):
                def body(i, acc):
                    # Identity-multiple roll, as in _device_slope_time:
                    # keeps the pack kernel's TB-lane block composition
                    # exactly what production dispatch sees.
                    r = ((i + salt) % jnp.uint32(7)) * jnp.uint32(Bs)
                    rows = pack(bw, jnp.roll(ow0, r), nb0, W)
                    return acc + rows[-1, -1].astype(jnp.int32)

                return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))

            return run

        total += _slope_measure(make, (bw_d, ow_d, nb_d), trials, 0.25)
    return total


def run_benchmark(
    batch: int = 4096,
    seconds_of_audio: float | None = None,
    bits: int = 16,
    channels: int = 2,
    frame_samples: int = 4096,
    repeats: int = 3,
    include_host: bool = False,
    kind: str = "music",
    dispersion: int = 0,
) -> dict:
    """Time batched device decode; returns the bench JSON record.

    ``dispersion`` > 0 repeats the whole slope measurement that many
    times and publishes the MEDIAN with a ``dispersion`` sub-record
    (min/median/max Msps + every run).  VERDICT r4 weak #1: a single
    min-of-trials per kind left regression and relay weather
    indistinguishable (spiky read 1867 and 1019 hours apart at the
    same HEAD); the per-run spread is the error bar that tells them
    apart.
    """
    if seconds_of_audio:
        batch = max(1, int(seconds_of_audio * 44100 / frame_samples))
    distinct, params = make_corpus_frames(
        num_distinct=min(batch, 32),
        frame_samples=frame_samples,
        bits=bits,
        channels=channels,
        kind=kind,
    )
    bits = params.sample_size  # 24-bit kinds override the argument
    payloads = [distinct[i % len(distinct)] for i in range(batch)]

    from .ops.frame_decode import decode_frames_packed
    from .parallel.pipeline import (
        _fused_plan, plan_blob_batches, span_range_mode, span_sub_hint,
    )

    sizes = np.array([len(p) for p in payloads], np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    blob = np.frombuffer(b"".join(payloads), np.uint8)
    # Production batching policy (decode_blob): plan_blob_batches lane
    # ordering (eligibility/depth/size/order) + per-span word packing,
    # per-span static max_order.
    t0 = time.perf_counter()
    spanned = []
    perm, _, spans, span_batch = plan_blob_batches(
        blob, offsets, sizes, params, batch, strict=True
    )
    for lo, hi in spans:
        fb = pad_frame_batch(span_batch(perm[lo:hi]))
        use_fused, max_order = _fused_plan(fb)
        spanned.append(
            (fb, use_fused, max_order, span_sub_hint(sizes[perm[lo:hi]]),
             span_range_mode(sizes[perm[lo:hi]]))
        )
    host_parse_s = time.perf_counter() - t0
    fused_all = all(uf for _, uf, *_ in spanned)
    import jax

    flags = [(uf, mo, cap, rm) for _, uf, mo, cap, rm in spanned]
    arrs: list = []
    for fb, *_ in spanned:
        arrs.append(jnp.asarray(fb.words))
        arrs.append(jnp.asarray(FrameMetaArrays.pack_host(fb)))
    # Force real H2D with a readback: over the axon relay,
    # block_until_ready is a no-op and transfers complete lazily.
    jnp.sum(jnp.stack([jnp.sum(a) for a in arrs[::2]])).item()

    runs_s = [
        _device_slope_time(flags, arrs, frame_samples, trials=max(2, repeats))
        for _ in range(max(1, dispersion))
    ]
    import statistics

    best = statistics.median(runs_s)
    total_samples = 0
    parity_ok = True
    for si, (uf, mo, cap, rm) in enumerate(flags):
        out, n = decode_frames_packed(
            arrs[2 * si], arrs[2 * si + 1], frame_samples,
            use_fused=uf, max_order=mo, sub_hint=cap, range_mode=rm,
        )
        total_samples += int(jnp.sum(n).item())
        # Parity gate (SURVEY.md §7 step 7): the benchmarked kernel's
        # output must match the reference-semantics XLA scan path bit
        # for bit.
        if uf:
            ref_out, _ = decode_frames_packed(
                arrs[2 * si], arrs[2 * si + 1], frame_samples,
                use_fused=False, max_order=mo,
            )
            parity_ok = parity_ok and bool(
                jnp.array_equal(out, ref_out).item()
            )
    if include_host:
        best += host_parse_s
    msps = total_samples / best / 1e6
    realtime = msps * 1e6 / 44100.0

    disp = None
    if dispersion > 1:
        rates = sorted(total_samples / s / 1e6 for s in runs_s)
        disp = {
            "n": len(rates),
            "min_msps": round(rates[0], 3),
            "median_msps": round(statistics.median(rates), 3),
            "max_msps": round(rates[-1], 3),
            "runs_msps": [round(r, 3) for r in rates],
        }
    return {
        **({"dispersion": disp} if disp else {}),
        "metric": "decode throughput (44.1kHz/%d-bit %dch, %s corpus)"
        % (bits, channels, kind),
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / NORTH_STAR_MSAMPLES, 4),
        "realtime_x": round(realtime, 1),
        "batch_frames": batch,
        "spans": len(spanned),
        "device_s": round(best, 5),
        "host_parse_s": round(host_parse_s, 5),
        "repeats": repeats,
        "backend": jax.default_backend(),
        "fused_kernel": fused_all,
        "parity_ok": parity_ok,
    }


def _mixed_pool(
    frame_samples: int, bits: int, distinct_per_kind: int = 12, seed: int = 7
):
    """Distinct frames across all corpus kinds + their params."""
    params = default_cookie(44100, bits, 2, frame_samples)
    pool = []
    kinds = [k for k in CORPUS_KINDS if k not in ("hires24", "fat24")]  # single cookie
    for k, kind in enumerate(kinds):
        pool.extend(
            make_kind_frames(
                kind, distinct_per_kind, frame_samples, params, bits,
                seed=seed + 13 * k,
            )
        )
    return pool, params


def run_e2e_benchmark(
    total_frames: int = 3 * 4096,
    frame_samples: int = 4096,
    bits: int = 16,
    batch_limit: int = 4096,
    repeats: int = 2,
    seed: int = 7,
) -> dict:
    """Sustained production-pipeline throughput through ``decode_blob``.

    Headline = samples / max(host stage, device stage): the steady-state
    rate of the <=2-in-flight overlapped pipeline, both stages measured
    end-to-end on real inputs (host = native header parse + per-span
    packing; device = the staged production batches, slope-timed).  The
    raw tunnel-inclusive wall (every dispatch/H2D over the dev relay,
    PCM consumed on-device via ``sink``) rides along as
    ``tunnel_wall_*`` — see DESIGN.md §4c for why that wall measures the
    relay, not the pipeline.
    """
    import jax

    from .parallel.pipeline import decode_blob
    from .utils.observability import GLOBAL_STATS

    pool, params = _mixed_pool(frame_samples, bits, seed=seed)
    rng = np.random.default_rng(seed)
    relay = _relay()
    from .config import DEFAULT

    # Mirrors decode_blob's gate: with device_pack on, the word-row
    # table is assembled on-device and every stage measurement below
    # follows that split (host stage w/o word packing, device stage
    # including the pack slope, overlapped wall shipping the blob once).
    devpack = DEFAULT.device_pack and jax.default_backend() in ("tpu", "cpu")

    def build(order_seed: int):
        idx = rng.permutation(
            np.repeat(np.arange(len(pool)), -(-total_frames // len(pool)))[
                :total_frames
            ]
        )
        payloads = [pool[i] for i in idx]
        sizes = np.array([len(p) for p in payloads], np.int64)
        offsets = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        blob = np.frombuffer(b"".join(payloads), np.uint8)
        return blob, offsets, sizes

    @jax.jit
    def _account(n, acc):
        return acc + jnp.sum(n)

    def timed_run(blob, offsets, sizes):
        # Device-side accumulation, ONE op per batch and one scalar
        # readback at the end: over the axon tunnel every dispatch and
        # readback costs a ~30 ms round trip.  The per-frame n comes out
        # of the same executable as the PCM, so blocking on the
        # accumulated count forces every decode to completion.
        acc = {"n": jnp.zeros((), jnp.int32)}

        def sink(out, n, orig_b):
            acc["n"] = _account(n[:orig_b], acc["n"])

        t0 = time.perf_counter()
        _, _, status = decode_blob(
            blob, offsets, sizes, params, frame_samples,
            batch_limit=batch_limit, sink=sink,
        )
        total = int(acc["n"].item())  # blocks on all decode work
        dt = time.perf_counter() - t0
        assert not status.any(), "e2e bench corpus must parse cleanly"
        return total, dt

    def _stage(blob, offsets, sizes):
        """Pre-stage inputs exactly as the production pipeline batches
        them (plan_blob_batches: eligibility/order/size lane ordering,
        packed metadata matrix)."""
        from .parallel.pipeline import (
            _fused_plan, plan_blob_batches, span_range_mode, span_sub_hint,
        )

        perm, _, spans, span_batch = plan_blob_batches(
            blob, offsets, sizes, params, batch_limit, strict=True
        )
        staged = []
        for lo, hi in spans:
            fb = pad_frame_batch(span_batch(perm[lo:hi]))
            use_fused, max_order = _fused_plan(fb)
            staged.append(
                (jnp.asarray(fb.words),
                 jnp.asarray(FrameMetaArrays.pack_host(fb)),
                 use_fused, max_order, span_sub_hint(sizes[perm[lo:hi]]),
                 span_range_mode(sizes[perm[lo:hi]]))
            )
        jax.block_until_ready([s[0] for s in staged])
        return staged

    def staged_device_run(timed_corpus):
        """Device-stage per-pass time for the identical sorted batches,
        inputs pre-staged, measured as the in-executable K-loop slope
        (``_device_slope_time``): what the pipeline costs on a host
        whose dispatch isn't tunneled (the axon relay serializes each
        executable call at a ~10-25 ms round trip and ~0.5 GB/s H2D,
        neither a property of the pipeline — DESIGN.md §4c)."""
        staged = _stage(*timed_corpus)
        flags = [(uf, mo, cap, rm) for _, _, uf, mo, cap, rm in staged]
        arrs: list = []
        for w, mv, *_ in staged:
            arrs.extend([w, mv])
        dec = _device_slope_time(flags, arrs, frame_samples)
        if devpack:
            # device_pack: the device also assembles the row tables
            # (blob->words + per-span gather) — add its slope-measured
            # per-pass cost so the stage covers everything the device
            # does per corpus.
            dec += _pack_slope_time(*_stage_rows(timed_corpus))
        return dec

    def _stage_rows(timed_corpus):
        """(blob, per-span padded (ow, nbytes, W), max_w) for the pack
        slope, planned exactly as decode_blob's devpack path."""
        from .codec.framemeta_vec import words_width
        from .ops.pallas.pack_rows import TB
        from .parallel.pipeline import (
            WORD_BUCKET, _pad_axis0, plan_blob_batches,
        )

        blob, offsets, sizes = timed_corpus
        perm, _, spans, span_batch = plan_blob_batches(
            blob, offsets, sizes, params, batch_limit, strict=True
        )
        row_spans = []
        for lo, hi in spans:
            fb, ow, nb, W = span_batch(perm[lo:hi], device_rows=True)
            b = pad_frame_batch(fb).batch
            b = -(-b // TB) * TB
            row_spans.append((_pad_axis0(ow, b), _pad_axis0(nb, b), W))
        max_w = words_width(
            int(sizes.max()) + 3 if len(sizes) else 0, WORD_BUCKET
        )
        return blob, row_spans, max_w

    def host_stage_run(corpora):
        """Standalone host-stage time (native pre-parse + per-span word
        packing + metadata packing) for fresh corpora, min over repeats —
        symmetric with staged_device_run: the pipeline bound compares
        each stage run on its own (on this 1-vCPU box the inline
        host_seconds also pays contention with the dispatch/H2D threads,
        which a real multi-core host overlaps; that number rides along
        as host_inline_s)."""
        from .ops.frame_decode import FrameMetaArrays
        from .parallel.pipeline import (
            _fused_plan, pad_frame_batch, plan_blob_batches,
        )

        best = float("inf")
        for blob, offsets, sizes in corpora:
            t0 = time.perf_counter()
            perm, _, spans, span_batch = plan_blob_batches(
                blob, offsets, sizes, params, batch_limit, strict=True
            )
            for lo, hi in spans:
                if devpack:
                    # device_pack: the host stage stops at header parse +
                    # row params + metadata packing — word-row assembly
                    # moved to the device (ops/pallas/pack_rows).
                    fb, _, _, W = span_batch(perm[lo:hi], device_rows=True)
                    fb = pad_frame_batch(fb)
                    _fused_plan(fb, width=W)
                else:
                    fb = pad_frame_batch(span_batch(perm[lo:hi]))
                    _fused_plan(fb)
                FrameMetaArrays.pack_host(fb)
            best = min(best, time.perf_counter() - t0)
        return best

    def overlapped_run(blob, offsets, sizes):
        """MEASURED overlapped wall: host planning/packing on a worker
        thread, device dispatch on the main thread, ONE readback.

        Returns (total_samples, wall_s, n_dispatch, h2d_bytes, h2d_s).
        """
        import queue
        import threading

        from .parallel.pipeline import (
            _fused_plan, pad_frame_batch, plan_blob_batches,
            span_range_mode, span_sub_hint,
        )

        q: "queue.Queue" = queue.Queue(maxsize=2)  # <=2 batches in flight

        def host_worker():
            from .ops.pallas.pack_rows import TB
            from .parallel.pipeline import _pad_axis0

            perm, _, spans, span_batch = plan_blob_batches(
                blob, offsets, sizes, params, batch_limit, strict=True
            )
            for lo, hi in spans:
                if devpack:
                    fb, ow, nb, W = span_batch(perm[lo:hi], device_rows=True)
                    fb = pad_frame_batch(fb)
                    uf, mo = _fused_plan(fb, width=W)
                    b = -(-fb.batch // TB) * TB
                    rows = (_pad_axis0(ow, b), _pad_axis0(nb, b), W)
                else:
                    fb = pad_frame_batch(span_batch(perm[lo:hi]))
                    uf, mo = _fused_plan(fb)
                    rows = None
                q.put(
                    (fb.words, FrameMetaArrays.pack_host(fb), uf, mo,
                     span_sub_hint(sizes[perm[lo:hi]]),
                     span_range_mode(sizes[perm[lo:hi]]), rows)
                )
            q.put(None)

        import jax

        from .ops.frame_decode import decode_frames_packed
        from .ops.pallas.pack_rows import blob_words, pack_rows, pack_rows_xla

        from .codec.framemeta_vec import words_width
        from .parallel.pipeline import WORD_BUCKET

        packer = pack_rows if jax.default_backend() == "tpu" else pack_rows_xla
        t0 = time.perf_counter()
        th = threading.Thread(target=host_worker, daemon=True)
        th.start()
        acc = jnp.zeros((), jnp.int32)
        n_dispatch = 0
        h2d_bytes = 0
        h2d_s = 0.0

        def _put(x):
            # MEASURED relay H2D: explicit put + block, timed inside the
            # run itself.  Over the dev relay every transfer serializes
            # on the single tunnel anyway (~40 MB/s, DESIGN.md §4c), so
            # blocking changes nothing structurally there — but it
            # converts the relay correction below from a *calibration
            # estimate* (whose drift vs the run's actual relay
            # throughput masquerades as overlap inefficiency) into a
            # same-seconds measurement.  On a directly-attached backend
            # blocking WOULD change the system under measurement
            # (ADVICE r3): transfers that overlap compute would be
            # forced serial — so the timed/blocking put only runs under
            # the relay; elsewhere the put stays async and untimed (the
            # wall then needs no correction at all).
            nonlocal h2d_bytes, h2d_s
            xa = np.asarray(x)
            if not relay:
                h2d_bytes += xa.nbytes
                return jax.device_put(xa)
            t = time.perf_counter()
            d = jax.block_until_ready(jax.device_put(xa))
            h2d_s += time.perf_counter() - t
            h2d_bytes += xa.nbytes
            return d

        bwords = None
        if devpack:
            # One blob H2D for the whole corpus (the devpack design).
            max_w = words_width(
                int(sizes.max()) + 3 if len(sizes) else 0, WORD_BUCKET
            )
            bwords = blob_words(blob, max_w=max_w, put=_put)
        while True:
            item = q.get()
            if item is None:
                break
            w, mv, uf, mo, cap, rm, rows = item
            if rows is not None:
                ow, nb, W = rows
                words_dev = packer(bwords, _put(ow), _put(nb), W)
            else:
                words_dev = _put(w)
            _, nn = decode_frames_packed(
                words_dev, _put(mv), frame_samples,
                use_fused=uf, max_order=mo, sub_hint=cap, range_mode=rm,
            )
            acc = _account(nn, acc)
            n_dispatch += 1
        total = int(acc.item())
        wall = time.perf_counter() - t0
        th.join()
        return total, wall, n_dispatch, h2d_bytes, h2d_s

    def _relay_rtt() -> float:
        """Measured per-readback control round-trip over the dev relay
        (warmed no-op dispatch, min of 3).  The old two-size H2D
        bandwidth calibration is gone (ADVICE r3): the correction below
        uses the in-run measured ``h2d_s`` and the reported bandwidth is
        derived from the same in-run measurement, so the two extra
        8/32 MB calibration transfers bought nothing."""
        z = jnp.zeros((4,), jnp.int32)
        jnp.sum(z).item()  # warm
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jnp.sum(z).item()
            rtts.append(time.perf_counter() - t0)
        return min(rtts)

    def resident_overlap_run(corpus, K: int, rtt_unit: float):
        """MEASURED overlapped wall with the corpus blob DEVICE-RESIDENT
        (VERDICT r4 next #4).

        The classic overlapped_run can never resolve over the dev relay:
        the 70 MB corpus H2D is ~99% of its wall.  This mode removes the
        H2D from the question: the word blob ships once, UNTIMED (the
        devpack design ships it once per corpus anyway), and the timed
        window then runs K back-to-back pipeline passes — the host
        thread replans/packs the corpus K times (the full production
        host stage) while the device executes each span's
        pack_rows+decode K times inside ONE executable per span
        (identity lane rolls, as the slope harness).  Device-busy time
        is K * device_s ~ seconds against ~7 dispatch RTTs and a few MB
        of per-span metadata puts (timed) — the relay legs become
        subtractable without touching device time, so overlap RESOLVES.

        What it measures: the steady-state question ("can the host
        stage keep pace with the device, overlapped?") for a resident
        corpus.  The classic cold-corpus mode still rides along with
        its own honesty flags.  Returns a dict or None (needs devpack).
        """
        if not devpack:
            return None
        import threading

        from jax import lax

        from .codec.framemeta_vec import words_width
        from .ops.frame_decode import decode_frames_packed
        from .ops.pallas.pack_rows import blob_words, pack_rows, pack_rows_xla
        from .parallel.pipeline import (
            WORD_BUCKET, _fused_plan, _pad_axis0, plan_blob_batches,
            span_range_mode, span_sub_hint,
        )

        blob, offsets, sizes = corpus
        pack = pack_rows if jax.default_backend() == "tpu" else pack_rows_xla

        def host_pass(collect: bool = False):
            perm, _, spans, span_batch = plan_blob_batches(
                blob, offsets, sizes, params, batch_limit, strict=True
            )
            items = []
            for lo, hi in spans:
                fb, ow, nb, W = span_batch(perm[lo:hi], device_rows=True)
                fb = pad_frame_batch(fb)
                uf, mo = _fused_plan(fb, width=W)
                mv = FrameMetaArrays.pack_host(fb)
                if collect:
                    items.append((
                        _pad_axis0(ow, fb.batch), _pad_axis0(nb, fb.batch),
                        W, mv, uf, mo,
                        span_sub_hint(sizes[perm[lo:hi]]),
                        span_range_mode(sizes[perm[lo:hi]]),
                        int(np.minimum(
                            fb.n_samples[: hi - lo], frame_samples
                        ).sum()),
                    ))
            return items

        items = host_pass(collect=True)  # staging pass, untimed
        max_w = words_width(
            int(sizes.max()) + 3 if len(sizes) else 0, WORD_BUCKET
        )
        bwords = jax.block_until_ready(blob_words(blob, max_w=max_w))

        def make_span(uf, mo, cap, rm, W, B):
            @jax.jit
            def run(salt, K, bw, ow, nb, mv):
                def body(i, acc):
                    # Identity-multiple roll (cf. _device_slope_time).
                    r = ((i + salt) % jnp.uint32(7)) * jnp.uint32(B)
                    rows = pack(bw, jnp.roll(ow, r), nb, W)
                    out, n = decode_frames_packed(
                        rows, jnp.roll(mv, r, axis=0), frame_samples,
                        use_fused=uf, max_order=mo, sub_hint=cap,
                        range_mode=rm,
                    )
                    return (
                        acc + jnp.sum(n) + out[-1, -1, -1].astype(jnp.int32)
                    )

                return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))

            return run

        runs = [
            make_span(uf, mo, cap, rm, W, ow.shape[0])
            for (ow, nb, W, mv, uf, mo, cap, rm, ns) in items
        ]
        rng_s = np.random.default_rng()
        warm = jnp.zeros((), jnp.int32)
        for rn, (ow, nb, W, mv, *_r) in zip(runs, items):
            warm = warm + rn(
                jnp.uint32(int(rng_s.integers(1 << 20))), jnp.int32(1),
                bwords, jnp.asarray(ow), jnp.asarray(nb), jnp.asarray(mv),
            )
        warm.item()  # compile + warm every span executable, untimed

        meta = {"s": 0.0, "bytes": 0}

        def put_meta(x):
            xa = np.asarray(x)
            meta["bytes"] += xa.nbytes
            if not relay:
                return jax.device_put(xa)
            t = time.perf_counter()
            d = jax.block_until_ready(jax.device_put(xa))
            meta["s"] += time.perf_counter() - t
            return d

        def host_worker():
            for _ in range(K):
                host_pass()

        salt = jnp.uint32(int(rng_s.integers(1 << 20)) | 1)
        t0 = time.perf_counter()
        th = threading.Thread(target=host_worker, daemon=True)
        th.start()
        acc = jnp.zeros((), jnp.int32)
        for rn, (ow, nb, W, mv, *_r) in zip(runs, items):
            acc = acc + rn(
                salt, jnp.int32(K), bwords,
                put_meta(ow), put_meta(nb), put_meta(mv),
            )
        acc.item()  # blocks on all K passes of every span
        th.join()  # the wall covers the host thread's K passes too
        wall = time.perf_counter() - t0
        total = K * sum(it[-1] for it in items)
        # Correction: timed metadata puts + ONE final-readback RTT (the
        # per-span dispatch RPCs overlap seconds of device work and are
        # not subtracted).  Cap at wall - K*device_s: device-busy time
        # is never subtracted (device_s is the slope-measured per-pass
        # cost of the same production batches incl. the pack kernel).
        corr_raw = (meta["s"] + rtt_unit) if relay else 0.0
        corr_cap = max(0.0, wall - K * device_s)
        resolved = corr_raw <= corr_cap
        corrected = max(wall - min(corr_raw, corr_cap), 1e-9)
        return {
            "overlap_resident_msps": round(total / corrected / 1e6, 3),
            "overlap_resident_resolved": bool(resolved),
            "overlap_resident_passes": K,
            "overlap_resident_wall_s": round(wall, 5),
            "overlap_resident_corrected_s": round(corrected, 5),
            "overlap_resident_meta_h2d_s": round(meta["s"], 5),
            "overlap_resident_meta_bytes": meta["bytes"],
            "overlap_resident_samples": total,
        }

    # Standalone host stage FIRST — before any device traffic exists in
    # the process.  Measured after dispatch, the relay's background
    # threads (lazy H2D drains, RPC servicing) contend with the host
    # stage for this box's single core and inflate it ~5x (55 ms read
    # vs 12 ms clean for the same corpora); a production host runs the
    # host stage on its own cores, so the clean number is the one the
    # pipeline bound should use.  The dispatch-concurrent 1-core cost
    # still rides along as host_inline_s.
    host_s = host_stage_run([build(repeats + 3 + r) for r in range(3)])
    # Warm-up: compiles every (bucket-width, order) executable.
    timed_run(*build(0))
    best_dt, total = float("inf"), 0
    host_inline_s = float("inf")  # min across repeats, dispatch-concurrent
    for r in range(repeats):
        GLOBAL_STATS.reset()
        t, dt = timed_run(*build(r + 1))
        host_inline_s = min(host_inline_s, GLOBAL_STATS.snapshot()["host_seconds"])
        if dt < best_dt:
            best_dt, total = dt, t
    device_s = staged_device_run(build(repeats + 2))
    ov_total, ov_wall, ov_nd, ov_bytes, ov_h2d_s = min(
        (overlapped_run(*build(20 + r)) for r in range(3)),
        key=lambda x: x[1] - x[4],
    )
    rtt_unit = _relay_rtt() if relay else 0.0
    # Resident-blob overlap mode (VERDICT r4 next #4): K sized so
    # device-busy time (~6 s) dwarfs the subtractable relay legs; tiny
    # on a directly-attached backend where the classic mode already
    # resolves (and in the CPU smoke tests).
    K_res = (
        int(min(512, max(16, round(6.0 / max(device_s, 1e-3)))))
        if relay
        else 8
    )
    resident = resident_overlap_run(build(40), K_res, rtt_unit)
    # Relay correction (relay only; on a directly-attached backend the
    # puts were async+untimed and the wall is used raw, corr = 0).  The
    # H2D seconds are MEASURED inside the run itself (overlapped_run's
    # _put times every transfer explicitly — same seconds as the wall,
    # so relay-bandwidth variance between a calibration and the run
    # can't masquerade as overlap inefficiency).  Control round trips
    # are counted in ONE place (ADVICE r3): each blocking put's fixed
    # RTT is already inside the measured h2d_s, so the only uncounted
    # control leg is the single final value readback — the old
    # (n_dispatch+1)*rtt term double-counted dispatch RTTs the puts had
    # already paid.  And because a blocked put can queue behind an
    # in-flight dispatch RPC *while the device computes*, the measured
    # h2d_s may contain device-busy seconds; the device provably spent
    # >= device_s busy during the run, so the correction is capped at
    # wall - device_s — device-compute time is never subtracted.
    corr_raw = (ov_h2d_s + rtt_unit) if relay else 0.0
    corr_cap = max(0.0, ov_wall - device_s)
    corr = min(corr_raw, corr_cap)
    # When the raw correction exceeds the cap, the relay swamps the
    # measurement: the wall is *consistent with* full overlap but
    # cannot resolve it finer.  Reported honestly as
    # overlap_resolved=false with overlap_efficiency=null — the old
    # clamp manufactured efficiency=1.0 in exactly this case, which
    # made the >=0.75 publish gate vacuous (ADVICE r3).
    ov_resolved = corr_raw <= corr_cap
    ov_corrected_s = max(ov_wall - corr, max(host_s, device_s))
    ov_msps = ov_total / ov_corrected_s / 1e6
    msps = total / best_dt / 1e6
    # Steady-state pipeline rate with host and device stages overlapped
    # (the <=2-in-flight design): bounded by the slower stage.  This —
    # not the tunnel wall — is the production number: the development
    # TPU sits behind a relay whose ~30-40 ms dispatch round trips and
    # ~0.5 GB/s H2D dominate `tunnel_wall_s` (DESIGN.md §4c); on a
    # directly-attached chip a batch's H2D is ~3 ms and fully overlapped.
    # Both stages are measured end-to-end on real inputs: host = native
    # parse + per-span packing, device = the staged production batches.
    # The host stage is charged at the WORSE of its clean and
    # dispatch-concurrent costs: host_inline_s is the same work timed
    # while the dispatch/H2D threads are live, so the genuine overlap
    # risk on a shared host (GIL/core contention) is priced into the
    # bound instead of footnoted.
    bound_denom = max(host_s, host_inline_s, device_s)
    bound_msps = total / bound_denom / 1e6 if total else 0.0
    # Publish rule (VERDICT r2 next #3, tightened per ADVICE r3): when
    # the overlapped measurement RESOLVES (relay legs small enough to
    # subtract without touching device-busy time), the headline is the
    # two-stage bound only if the measurement supports it within 25%,
    # else the measurement wins.  When the relay swamps the measurement
    # (unresolved), no efficiency is claimed; the bound is published on
    # the strength of (a) the contention-priced host_inline_s in its
    # denominator and (b) the wall being consistent with full overlap.
    # Efficiency source: the classic cold-corpus measurement when it
    # resolves; else the resident-blob measurement (which removes the
    # unsubtractable corpus H2D and so resolves even over the relay).
    efficiency = None
    eff_source = None
    if ov_resolved and bound_msps:
        efficiency = ov_msps / bound_msps
        eff_source = "classic"
    elif (
        resident
        and resident["overlap_resident_resolved"]
        and bound_msps
    ):
        efficiency = resident["overlap_resident_msps"] / bound_msps
        eff_source = "resident"
    if efficiency is not None and efficiency < 0.75:
        published = ov_msps if eff_source == "classic" else (
            resident["overlap_resident_msps"]
        )
    else:
        published = bound_msps
    return {
        "e2e_msamples_per_s": round(published, 3),
        "e2e_vs_baseline": round(published / NORTH_STAR_MSAMPLES, 4),
        "e2e_realtime_x": round(published * 1e6 / 44100.0, 1),
        "e2e_stage_bound_msps": round(bound_msps, 3),
        # Null when the relay swamps the wall (ADVICE r4): the corrected
        # seconds are then floored at the stage bound, so the "measured"
        # rate would just echo the bound — never publish a bound-clamped
        # value under a measured label.
        "e2e_measured_overlap_msps": (
            round(ov_msps, 3) if ov_resolved else None
        ),
        "overlap_efficiency": (
            round(efficiency, 4) if efficiency is not None else None
        ),
        "overlap_efficiency_source": eff_source,
        "overlap_resolved": ov_resolved,
        **(resident or {}),
        "overlap_wall_s": round(ov_wall, 5),
        "overlap_corrected_s": round(ov_corrected_s, 5),
        "overlap_dispatches": ov_nd,
        "overlap_h2d_bytes": ov_bytes,
        "overlap_h2d_s": round(ov_h2d_s, 5),
        "relay_rtt_s": round(rtt_unit, 5),
        # Derived from the run's own measured transfers (ADVICE r3) —
        # no separate calibration transfers.
        "relay_h2d_bw_MBps": (
            round(ov_bytes / ov_h2d_s / 1e6, 1) if ov_h2d_s > 0 else None
        ),
        "e2e_host_parse_s": round(host_s, 5),
        "e2e_device_s": round(device_s, 5),
        "host_inline_s": round(host_inline_s, 5),
        "tunnel_wall_s": round(best_dt, 5),
        "tunnel_wall_msps": round(msps, 3),
        "e2e_total_frames": total_frames,
        "e2e_total_samples": total,
        "device_pack": devpack,
        "native_parser": _native_available(),
    }


def _native_available() -> bool:
    from . import native

    return native.available()


def run_full_benchmark(repeats: int = 3, dispersion: int = 3) -> dict:
    """The driver benchmark: e2e pipeline + per-kind device numbers.

    Per-kind values are the MEDIAN of ``dispersion`` independent slope
    measurements, with min/median/max recorded per kind
    (``device_msps_by_kind_dispersion``) so a future reader can tell a
    regression from relay weather (VERDICT r4 weak #1).  Default 3 for
    the driver's one-shot wall budget; the hardened slope gate
    (_slope_measure) already holds per-run spread to ~±0.2%, and the
    n=5 investigation data lives in BENCH_r05.json."""
    e2e = run_e2e_benchmark(repeats=max(3, repeats))
    kinds = {}
    kind_disp = {}
    parity = True
    fused = True
    for kind in CORPUS_KINDS:
        r = run_benchmark(
            batch=4096, repeats=repeats, kind=kind, dispersion=dispersion
        )
        kinds[kind] = r["value"]
        if r.get("dispersion"):
            kind_disp[kind] = r["dispersion"]
        parity = parity and r["parity_ok"]
        fused = fused and r["fused_kernel"]
        backend = r["backend"]
    import statistics

    device_mix = round(statistics.harmonic_mean(kinds.values()), 3)
    enc = run_encode_benchmark(repeats=2)
    return {
        "metric": (
            "sustained pipeline decode, mixed corpus (host parse+pack "
            "overlapped with device decode; bound by the slower stage)"
        ),
        "value": e2e["e2e_msamples_per_s"],
        "unit": "Msamples/s/chip",
        "vs_baseline": e2e["e2e_vs_baseline"],
        "realtime_x": e2e["e2e_realtime_x"],
        **{k: v for k, v in e2e.items() if k != "e2e_msamples_per_s"},
        "device_msps_by_kind": kinds,
        **(
            {"device_msps_by_kind_dispersion": kind_disp} if kind_disp else {}
        ),
        "device_msps_harmonic_mean": device_mix,
        **enc,
        "backend": backend,
        "fused_kernel": fused,
        "parity_ok": parity,
    }


def run_encode_benchmark(
    num_frames: int = 2048,
    frame_samples: int = 4096,
    bits: int = 16,
    repeats: int = 2,
    seed: int = 9,
) -> dict:
    """Device-batch encoder throughput (codec/encoder_tpu.py).

    Stage-resolved like the decode e2e bench: ``encode_msps`` is the
    slowest stage of the <=2-in-flight encode pipeline — host prep
    (split/decorrelate + batched Levinson + header fields, min over
    repeats), the device automatons (chained-readback slope over the
    jitted encode_stages), and native chunk packing (min over repeats,
    planes host-resident) — each measured standalone, mirroring
    run_e2e_benchmark's bound.  The relay-inclusive end-to-end wall
    rides along as ``encode_tunnel_wall_msps``.
    """
    import jax

    from .codec.encoder import AlacEncoder
    from .codec.encoder_tpu import (
        _dispatch, _enc_pairs, _pack_host, _pack_host_pairs, _prep,
        encode_frames_tpu,
    )
    from .ops.encode import RiceEncParams, encode_stages_pcm
    from .ops.lpc import LpcParams, reverse_coefs

    rng = np.random.default_rng(seed)
    S, F = frame_samples, num_frames
    B = 2 * F
    pcm = _music_pcm(F * S, bits, 2, rng)
    params = default_cookie(44100, bits, 2, S)

    # -- device stage (slope method; see run_benchmark for why).  Fed
    # raw interleaved PCM so the slope includes the on-device
    # extra-bits strip / decorrelation / channel fold (the stages the
    # host shed in round 3). --
    pcm_f = np.ascontiguousarray(pcm.reshape(F, S, 2), np.int32)
    stereo = jnp.asarray(np.ones(F, bool))
    ns = jnp.asarray(np.full(B, S, np.int32))
    coefs = np.zeros((B, 31), np.int32)
    coefs[:, :6] = _SEED6 = [1536, -768, 384, -192, 96, -48]
    rc = reverse_coefs(coefs, np.full(B, 6, np.int32))
    lp = LpcParams(
        order=jnp.asarray(np.full(B, 6, np.int32)),
        quant=jnp.asarray(np.full(B, 9, np.int32)),
        rc=jnp.asarray(rc),
        rss=jnp.asarray(np.full(B, bits + 1, np.int32)),
    )
    rp = RiceEncParams(
        rss=lp.rss,
        kmod=jnp.asarray(np.full(B, params.rice_kmodifier, np.int32)),
        init_history=jnp.asarray(np.full(B, params.rice_initial_history, np.int32)),
        mult=jnp.asarray(np.full(B, params.rice_history_mult_for(4), np.int32)),
        kmask=jnp.asarray(np.full(B, params.rice_kmodifier_mask, np.int32)),
    )
    salt = np.random.default_rng()
    base = int(salt.integers(1, F - 2 * repeats - 2))
    vs = [
        jnp.asarray(np.roll(pcm_f, base + r, axis=0))
        for r in range(2 * repeats + 1)
    ]
    force = jnp.zeros((), jnp.int32)
    for v in vs:
        force = force + jnp.sum(v)
    force.item()

    from .codec.encoder_tpu import _enc_kernel

    enc_kernel = _enc_kernel(None)  # fused on TPU — the production path

    from .codec.encoder_tpu import _enc_quads

    use_pairs = _enc_pairs()  # the production plane layout
    use_quads = use_pairs and _enc_quads() and bits <= 16

    def stages(v):
        return encode_stages_pcm(
            v, stereo, ns, lp, rp, S, max_order=6, lw=1, sh=1,
            wide=bits > 16, kernel=enc_kernel, pairs=use_pairs,
            quads=use_quads,
        )

    jnp.sum(stages(vs[-1])[4]).item()

    def chain(idxs):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for r in idxs:
            acc = acc + jnp.sum(stages(vs[r])[4])
        acc.item()
        return time.perf_counter() - t0

    rtt = min(chain([2 * repeats]) for _ in range(3))
    per = min(
        chain(range(repeats)),
        chain(range(repeats, 2 * repeats)),
    )
    dev_s = max((per - rtt) / repeats, 1e-9)
    dev_msps = F * S / dev_s / 1e6

    # -- host stages, each standalone (min over repeats) --
    Fe = min(F, 512)
    arr = pcm[: Fe * S].reshape(Fe, S, 2)
    cfg = EncoderConfig(order=6)
    enc = AlacEncoder(params, cfg)
    encode_frames_tpu(arr, params, cfg)  # warm (compile + caches)
    prep_s = float("inf")
    for _ in range(max(2, repeats) + 1):
        t0 = time.perf_counter()
        prep = _prep(arr, params, cfg, enc)
        prep_s = min(prep_s, time.perf_counter() - t0)
    planes = _dispatch(prep, params, cfg, pairs=False)
    host_planes = [np.asarray(x) for x in planes]  # block the readback
    pack_classic_s = float("inf")
    for _ in range(max(2, repeats) + 1):
        t0 = time.perf_counter()
        # The host packer explicitly (_pack would route to the device
        # variant under ALAC_ENC_DEVICE_PACK and destroy this baseline).
        payloads = _pack_host(prep, host_planes, None)
        pack_classic_s = min(pack_classic_s, time.perf_counter() - t0)
    coded = sum(len(p) for p in payloads)
    pack_s = pack_classic_s
    quads_fired = False
    if use_pairs:
        # Production pack stage: device-merged pair planes through the
        # native two-frame pair packer; the classic rate rides along as
        # encode_pack_classic_msps.
        planes_p = _dispatch(prep, params, cfg, pairs=True)
        host_pairs = [np.asarray(x) for x in planes_p]
        pack_s = float("inf")
        for _ in range(max(2, repeats) + 1):
            t0 = time.perf_counter()
            pair_payloads = _pack_host_pairs(prep, host_pairs, None)
            pack_s = min(pack_s, time.perf_counter() - t0)
        if pair_payloads != payloads:  # hardware parity gate
            raise RuntimeError("pair pack != classic pack payload bytes")
        quads_fired = bool(prep.get("quads")) and not bool(
            np.asarray(planes_p[11]).any()
        )

    # -- device-pack variant (ALAC_ENC_DEVICE_PACK): slope-measure the
    # pack_frames_device kernel on the staged planes and the residual
    # host cost (header-OR + slicing on prefetched rows); the variant's
    # device stage runs stages+pack sequentially, so its rate is the
    # harmonic combination. --
    devpack_fields = _encode_devpack_stage(prep, planes, Fe, S, repeats)

    # -- relay-inclusive pipelined wall (encode_frames_tpu end to end) --
    t0 = time.perf_counter()
    encode_frames_tpu(arr, params, cfg)
    e2e_s = time.perf_counter() - t0
    e2e_msps = Fe * S / e2e_s / 1e6

    # Steady-state pipeline rate with the three stages overlapped
    # (encode_frames_tpu keeps <=2 chunks in flight): bounded by the
    # slowest stage.  The chunk-plane D2H (~13 B/sample) rides the
    # relay here (encode_tunnel_wall_msps); a directly-attached host
    # moves it at GB/s.
    prep_msps = Fe * S / prep_s / 1e6
    pack_msps = Fe * S / pack_s / 1e6
    bound = min(prep_msps, pack_msps, dev_msps)
    # Steady-state bound honesty: the pipeline packs on a worker
    # thread (encode_frames_tpu), so min(stages) needs >= 2 host
    # cores; a 1-core host serializes prep+pack and its bound is the
    # combined rate, reported alongside.
    host_serial_msps = Fe * S / (prep_s + pack_s) / 1e6
    n_cores = os.cpu_count() or 1
    return {
        "encode_msps": round(
            bound if n_cores >= 2 else min(host_serial_msps, dev_msps), 3
        ),
        "encode_3stage_bound_msps": round(bound, 3),
        "encode_host_serial_msps": round(host_serial_msps, 3),
        "encode_host_cores": n_cores,
        "encode_device_msps": round(dev_msps, 3),
        "encode_device_s": round(dev_s, 5),
        "encode_stage_kernel": enc_kernel,
        "encode_prep_msps": round(prep_msps, 3),
        "encode_pack_msps": round(pack_msps, 3),
        "encode_pack_pairs": use_pairs,
        "encode_pack_quads": quads_fired,
        "encode_pack_classic_msps": round(Fe * S / pack_classic_s / 1e6, 3),
        # Tunnel-inclusive wall (chunk-plane D2H over the dev relay —
        # an environment artifact, cf. DESIGN.md §4c).
        "encode_tunnel_wall_msps": round(e2e_msps, 3),
        "encode_ratio": round(coded / (Fe * S * 2 * (bits // 8)), 4),
        "encode_frames": F,
        **devpack_fields,
    }


def _encode_devpack_stage(prep, planes, Fe: int, S: int, repeats: int) -> dict:
    """Stage rates for the ALAC_ENC_DEVICE_PACK variant: the pack
    kernel's per-pass device cost (in-executable slope, as everywhere)
    and the residual host cost (header-OR + payload slicing over
    prefetched rows).  Rides along in the bench record so the flag's
    hardware verdict is captured without a separate harness."""
    import jax
    from jax import lax

    from .codec.encoder_tpu import _PACK_STRIDE_STEP, _or_header
    from .ops.encode import pack_frames_device, pack_frames_device_scatter

    try:
        c0d, c1d, c2d, wsd, bits_d, _bad = planes
        bits64 = np.asarray(bits_d).astype(np.int64)
        F = prep["F"]
        total_bits = prep["hbits"] + bits64[:F] + bits64[F:]
        need = int(total_bits.max()) // 32 + 2
        stride = -(-need // _PACK_STRIDE_STEP) * _PACK_STRIDE_STEP
        ns_d = jnp.asarray(prep["ns_f"].astype(np.int32))
        st_d = jnp.asarray(prep["stereo_f"])
        hb_d = jnp.asarray(prep["hbits"].astype(np.int32))
        c0d, c1d, c2d, wsd = (
            jnp.asarray(c0d), jnp.asarray(c1d), jnp.asarray(c2d),
            jnp.asarray(wsd),
        )
        B = int(wsd.shape[0])

        def make_impl(packer):
            def make():
                @jax.jit
                def run(salt, K, c0, c1, c2, ws, n, st, hb):
                    def body(i, acc):
                        # Identity-multiple rolls (cf. _device_slope_time):
                        # lane-plane arrays roll by multiples of B, frame
                        # arrays by multiples of F — both identity.
                        rB = ((i + salt) % jnp.uint32(7)) * jnp.uint32(B)
                        rF = ((i + salt) % jnp.uint32(7)) * jnp.uint32(B // 2)
                        rows, eb = packer(
                            jnp.roll(c0, rB, axis=0),
                            jnp.roll(c1, rB, axis=0),
                            jnp.roll(c2, rB, axis=0),
                            jnp.roll(ws, rB, axis=0),
                            jnp.roll(n, rF), jnp.roll(st, rF),
                            jnp.roll(hb, rF), stride_words=stride,
                        )
                        return (
                            acc + jnp.sum(eb) + rows[-1, -1].astype(jnp.int32)
                        )

                    return lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))

                return run

            return make

        pack_dev_s = _slope_measure(
            make_impl(pack_frames_device),
            (c0d, c1d, c2d, wsd, ns_d, st_d, hb_d),
            max(2, repeats), 0.25,
        )
        pack_scatter_s = _slope_measure(
            make_impl(pack_frames_device_scatter),
            (c0d, c1d, c2d, wsd, ns_d, st_d, hb_d),
            max(2, repeats), 0.25,
        )

        # Residual host stage: header OR + slicing on prefetched rows.
        rows_d, end_d = pack_frames_device(
            c0d, c1d, c2d, wsd, ns_d, st_d, hb_d, stride_words=stride
        )
        rows0 = np.asarray(rows_d)
        end_bits = np.asarray(end_d)
        hv, hw, h_off = prep["hv"], prep["hw"], prep["h_off"]
        host_s = float("inf")
        for _ in range(max(2, repeats) + 1):
            rows = rows0.copy()
            t0 = time.perf_counter()
            for f in range(F):
                # Same helper _pack_device runs (incl. the BitWriter
                # fallback when the native lib is missing, so the
                # published rate describes the real path).
                _or_header(
                    rows[f], hv[h_off[f]:h_off[f + 1]],
                    hw[h_off[f]:h_off[f + 1]],
                )
                rows[f, : -(-int(end_bits[f]) // 8)].tobytes()
            host_s = min(host_s, time.perf_counter() - t0)
        return {
            "encode_devpack_device_msps": round(Fe * S / pack_dev_s / 1e6, 3),
            "encode_devpack_scatter_msps": round(
                Fe * S / pack_scatter_s / 1e6, 3
            ),
            "encode_devpack_host_msps": round(Fe * S / host_s / 1e6, 3),
            "encode_devpack_d2h_bytes_per_sample": round(
                rows0.nbytes / (Fe * S), 2
            ),
        }
    except Exception as e:  # pragma: no cover - diagnostic ride-along
        return {"encode_devpack_error": repr(e)}
