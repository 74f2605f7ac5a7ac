"""Batch ALAC encoding with the sequential stages on the TPU.

Splits encoding the way the decoder's pipeline splits decoding
(SURVEY.md §2.5 "PP", mirrored):

  host   — per-frame prep: extra-bits split, stereo decorrelation,
           Levinson coefficients, header/coef bit fields (all NumPy);
  device — the two per-sample automatons, frame-per-lane with stereo
           channels folded into extra lanes (ops/encode.py): forward
           adaptive FIR residuals and the Rice emitter producing
           fixed-arity (value, width) bit-field planes;
  host   — per-frame variable-width bit packing (the native C++
           alac_pack_bits; BitWriter fallback), trivially parallel.

Output payloads are byte-identical to codec/encoder.AlacEncoder given
the same configuration — tests/test_encoder_tpu.py enforces equality,
which transitively inherits the whole decode-side parity pyramid.
"""

from __future__ import annotations

import numpy as np

from ..ops.lpc import MAX_ORDER, LpcParams, reverse_coefs
from .cookie import CodecParams
from .encoder import AlacEncoder, EncoderConfig, levinson_coefs


def _header_bits(enc: AlacEncoder, n: int, nch: int, ub: int,
                 coefs_per_ch: list[list[int]]) -> tuple[list[int], list[int]]:
    """All bit fields preceding the extra-bits/entropy sections."""
    vals, widths = enc._header_fields(n, nch, ub, 0)
    if nch == 2:
        vals += [enc.config.interlacing_shift, enc.config.interlacing_leftweight]
        widths += [8, 8]
    else:
        vals += [0]  # mono filler bits (AlacFile.cs:457-459)
        widths += [16]
    for coefs in coefs_per_ch:
        pv, pw = enc._prediction_fields(coefs, enc.config.order)
        vals += pv
        widths += pw
    return vals, widths


def encode_frames_tpu(
    frames: list[np.ndarray],
    params: CodecParams,
    config: EncoderConfig | None = None,
    timings: dict | None = None,
) -> list[bytes]:
    """Encode PCM frames ((n, ch) int32 each) in one device batch.

    Compressed path only (``force_uncompressed`` frames have no
    sequential stage worth a device trip — use AlacEncoder).  Frames may
    mix mono/stereo and lengths up to params.max_samples_per_frame.

    ``timings``: optional dict that receives per-stage wall times —
    ``prep_s`` (host prep incl. Levinson), ``emit_wait_s`` (device
    dispatch + blocking symbol-plane readback; on a tunneled chip the
    D2H dominates — ``plane_bytes`` records the transfer size),
    ``pack_s`` (host variable-width packing).
    """
    import time as _time

    import jax.numpy as jnp

    from .. import native
    from ..ops.encode import RiceEncParams, encode_stages

    _t0 = _time.perf_counter()

    cfg = config or EncoderConfig()
    if cfg.force_uncompressed:
        raise ValueError("device encoder handles the compressed path only")
    enc = AlacEncoder(params, cfg)  # validates params/config like the host
    F = len(frames)
    if F == 0:
        return []
    S = params.max_samples_per_frame
    ub = cfg.uncompressed_bytes
    order = cfg.order

    # ---- host prep: vectorized split/decorrelate; per-frame coefs ----
    B = 2 * F  # channel-folded lanes: [A of all frames, B of all frames]
    ns_f = np.zeros(F, np.int32)
    stereo_f = np.zeros(F, bool)
    padded = np.zeros((F, S, 2), np.int64)
    for f, pcm in enumerate(frames):
        pcm = np.asarray(pcm)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n, nch = pcm.shape
        if nch not in (1, 2):
            raise ValueError(f"1 or 2 channels, got {nch}")
        if n > S:
            raise ValueError(f"frame of {n} samples exceeds {S}")
        ns_f[f] = n
        stereo_f[f] = nch == 2
        padded[f, :n, :nch] = pcm
    ub8 = 8 * ub
    if ub:
        hi = padded >> ub8
        extra_pl = (padded & ((1 << ub8) - 1)).astype(np.uint32)
    else:
        hi = padded
        extra_pl = None
    sh, lw = cfg.interlacing_shift, cfg.interlacing_leftweight
    chan_b = hi[:, :, 0] - hi[:, :, 1]
    if lw != 0:
        chan_a = hi[:, :, 1] + ((chan_b * lw) >> sh)
    else:
        chan_a, chan_b = hi[:, :, 0], hi[:, :, 1]
    st = stereo_f[:, None]
    sig = np.zeros((B, S), np.int32)
    sig[:F] = np.where(st, chan_a, hi[:, :, 0]).astype(np.int32)
    sig[F:] = np.where(st, chan_b, 0).astype(np.int32)
    ns = np.concatenate([ns_f, np.where(stereo_f, ns_f, 0)]).astype(np.int32)
    rss_l = np.concatenate(
        [
            params.sample_size - 8 * ub + stereo_f.astype(np.int32),
        ] * 2
    ).astype(np.int32)
    coefs_all: list[list[int]] = []
    headers: list[tuple[list[int], list[int]]] = []
    for f in range(F):
        nch = 2 if stereo_f[f] else 1
        coefs_per_ch = []
        for c in range(nch):
            coefs_per_ch.append(
                list(enc._choose_coefs(sig[f + c * F, : ns_f[f]], order))
            )
        coefs_all.append(coefs_per_ch[0])
        coefs_all.append(coefs_per_ch[1] if nch == 2 else [])
        headers.append(_header_bits(enc, int(ns_f[f]), nch, ub, coefs_per_ch))
    # reorder coefs to lane layout [A..., B...]
    coefs_lanes = coefs_all[0::2] + coefs_all[1::2]

    # ---- device: residuals + rice symbol planes (channel-folded) ----
    coef_tab = np.zeros((B, MAX_ORDER), np.int32)
    for b, c in enumerate(coefs_lanes):
        coef_tab[b, : len(c)] = c
    rc = reverse_coefs(coef_tab, np.full(B, order, np.int32))
    lp = LpcParams(
        order=jnp.asarray(np.full(B, order, np.int32)),
        quant=jnp.asarray(np.full(B, cfg.quant, np.int32)),
        rc=jnp.asarray(rc),
        rss=jnp.asarray(rss_l),
    )
    n_dev = jnp.asarray(ns)
    rp = RiceEncParams(
        rss=lp.rss,
        kmod=jnp.asarray(np.full(B, params.rice_kmodifier, np.int32)),
        init_history=jnp.asarray(
            np.full(B, params.rice_initial_history, np.int32)
        ),
        mult=jnp.asarray(
            np.full(B, params.rice_history_mult_for(cfg.rice_modifier), np.int32)
        ),
        kmask=jnp.asarray(np.full(B, params.rice_kmodifier_mask, np.int32)),
    )
    max_order = 0 if order in (0, 31) else order
    _t1 = _time.perf_counter()
    v16_d, v32_d, widths_d, bad = encode_stages(
        jnp.asarray(sig), n_dev, lp, rp, S, max_order=max_order
    )
    if bool(np.asarray(bad).any()):
        raise RuntimeError("encoder state desync: raw < 0")
    v16 = np.asarray(v16_d).view(np.uint16)
    v32 = np.asarray(v32_d).view(np.uint32)
    widths_np = np.asarray(widths_d).astype(np.uint8)
    _t2 = _time.perf_counter()
    if timings is not None:
        timings["prep_s"] = _t1 - _t0
        timings["emit_wait_s"] = _t2 - _t1
        timings["plane_bytes"] = v16.nbytes + v32.nbytes + widths_np.nbytes

    # ---- host: whole-batch variable-width packing (native, OpenMP) ----
    hv_parts, hw_parts = [], []
    h_lens = np.zeros(F + 1, np.int64)
    for f in range(F):
        hv, hw = headers[f]
        hv_parts.append(np.asarray(hv, np.uint32))
        hw_parts.append(np.asarray(hw, np.uint8))
        extra_ct = 0
        if ub:
            n = int(ns_f[f])
            nch = 2 if stereo_f[f] else 1
            ev = extra_pl[f, :n, :nch].reshape(-1)  # interleaved A,B
            hv_parts.append(ev)
            hw_parts.append(np.full(ev.size, ub8, np.uint8))
            extra_ct = ev.size
        h_lens[f + 1] = h_lens[f] + len(hv) + extra_ct
    hv_all = np.concatenate(hv_parts)
    hw_all = np.concatenate(hw_parts)
    # Exact output sizes from the width planes.
    live = np.arange(S)[None, :] < ns[:, None]
    wsum = (widths_np.astype(np.int64).sum(axis=2) * live).sum(axis=1)
    hbits = np.add.reduceat(
        hw_all.astype(np.int64), h_lens[:-1]
    ) if F else np.zeros(0, np.int64)
    total_bits = hbits + wsum[:F] + wsum[F:]
    out_stride = int(total_bits.max()) // 8 + 8 if F else 8
    packed = native.pack_symbol_frames_native(
        hv_all, hw_all, h_lens, v16, v32, widths_np.view(np.int8),
        ns_f, stereo_f.astype(np.uint8), out_stride,
    )
    if packed is not None:
        out, end_bits = packed
        payloads = [
            out[f, : -(-int(end_bits[f]) // 8)].tobytes() for f in range(F)
        ]
        if timings is not None:
            timings["pack_s"] = _time.perf_counter() - _t2
        return payloads
    # pure-Python fallback (no native library)
    from .bitwriter import BitWriter

    payloads = []
    for f in range(F):
        w = BitWriter()
        for v, wd in zip(
            hv_all[h_lens[f] : h_lens[f + 1]].tolist(),
            hw_all[h_lens[f] : h_lens[f + 1]].tolist(),
        ):
            w.write(int(v), int(wd))
        n = int(ns_f[f])
        lanes = [f, F + f] if stereo_f[f] else [f]
        for lane in lanes:
            for i in range(n):
                w.write(int(v16[lane, i, 0]), int(widths_np[lane, i, 0]))
                w.write(int(v32[lane, i, 0]), int(widths_np[lane, i, 1]))
                w.write(int(v16[lane, i, 1]), int(widths_np[lane, i, 2]))
                w.write(int(v32[lane, i, 1]), int(widths_np[lane, i, 3]))
        payloads.append(w.getvalue())
    if timings is not None:
        timings["pack_s"] = _time.perf_counter() - _t2
    return payloads
