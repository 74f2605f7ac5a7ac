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
) -> list[bytes]:
    """Encode PCM frames ((n, ch) int32 each) in one device batch.

    Compressed path only (``force_uncompressed`` frames have no
    sequential stage worth a device trip — use AlacEncoder).  Frames may
    mix mono/stereo and lengths up to params.max_samples_per_frame.
    """
    import jax.numpy as jnp

    from .. import native
    from ..ops.encode import RiceEncParams, encode_stages

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

    # ---- host prep: split/decorrelate/coefs per frame ----
    B = 2 * F  # channel-folded lanes: [A of all frames, B of all frames]
    sig = np.zeros((B, S), np.int32)
    ns = np.zeros(B, np.int32)
    rss_l = np.zeros(B, np.int32)
    coefs_all: list[list[int]] = [[] for _ in range(B)]
    extras: list[np.ndarray] = []
    headers: list[tuple[list[int], list[int]]] = []
    stereo_f = np.zeros(F, bool)
    for f, pcm in enumerate(frames):
        pcm = np.asarray(pcm)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n, nch = pcm.shape
        if nch not in (1, 2):
            raise ValueError(f"1 or 2 channels, got {nch}")
        if n > S:
            raise ValueError(f"frame of {n} samples exceeds {S}")
        stereo_f[f] = nch == 2
        rss = params.sample_size - 8 * ub + (1 if nch == 2 else 0)
        if nch == 1:
            hi, extra = enc._split_extra(pcm[:, 0].astype(np.int64), ub)
            chans = [hi]
            extra_iv = extra.astype(np.int64)
        else:
            hi_l, extra_l = enc._split_extra(pcm[:, 0].astype(np.int64), ub)
            hi_r, extra_r = enc._split_extra(pcm[:, 1].astype(np.int64), ub)
            sh, lw = cfg.interlacing_shift, cfg.interlacing_leftweight
            if lw != 0:
                chan_b = hi_l - hi_r
                chan_a = hi_r + ((chan_b * lw) >> sh)
            else:
                chan_a, chan_b = hi_l, hi_r
            chans = [chan_a, chan_b]
            extra_iv = np.stack([extra_l, extra_r], axis=1).reshape(-1)
        coefs_per_ch = []
        for c, chan in enumerate(chans):
            lane = f + c * F
            sig[lane, :n] = chan.astype(np.int32)
            ns[lane] = n
            rss_l[lane] = rss
            coefs = enc._choose_coefs(chan, order)
            coefs_all[lane] = coefs
            coefs_per_ch.append(list(coefs))
        extras.append(extra_iv if ub else np.zeros(0, np.int64))
        headers.append(_header_bits(enc, n, nch, ub, coefs_per_ch))

    # ---- device: residuals + rice symbol planes (channel-folded) ----
    coef_tab = np.zeros((B, MAX_ORDER), np.int32)
    for b, c in enumerate(coefs_all):
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
    v16_d, v32_d, widths_d, bad = encode_stages(
        jnp.asarray(sig), n_dev, lp, rp, S
    )
    if bool(np.asarray(bad).any()):
        raise RuntimeError("encoder state desync: raw < 0")
    # Reassemble the (B, S, 4) field order v0,v1,v2,v3 on the host.
    v16 = np.asarray(v16_d).astype(np.uint16)
    v32 = np.asarray(v32_d).astype(np.uint32)
    vals_np = np.empty(v16.shape[:2] + (4,), np.uint32)
    vals_np[..., 0] = v16[..., 0]
    vals_np[..., 1] = v32[..., 0]
    vals_np[..., 2] = v16[..., 1]
    vals_np[..., 3] = v32[..., 1]
    widths_np = np.asarray(widths_d).astype(np.uint8)

    # ---- host: per-frame variable-width packing ----
    payloads = []
    ub8 = 8 * ub
    for f in range(F):
        n = int(ns[f])
        hv, hw = headers[f]
        parts_v = [np.asarray(hv, np.uint32)]
        parts_w = [np.asarray(hw, np.uint8)]
        if ub:
            ev = extras[f].astype(np.uint32)
            parts_v.append(ev)
            parts_w.append(np.full(ev.size, ub8, np.uint8))
        parts_v.append(vals_np[f, :n].reshape(-1))
        parts_w.append(widths_np[f, :n].reshape(-1))
        if stereo_f[f]:
            parts_v.append(vals_np[F + f, :n].reshape(-1))
            parts_w.append(widths_np[F + f, :n].reshape(-1))
        allv = np.concatenate(parts_v)
        allw = np.concatenate(parts_w)
        cap_bits = int(allw.astype(np.int64).sum()) + 64
        buf = np.zeros(cap_bits // 8 + 8, np.uint8)
        end = native.pack_bits_native(allv, allw, buf, 0)
        if end is None:  # pure-Python fallback
            from .bitwriter import BitWriter

            w = BitWriter()
            for v, wd in zip(allv.tolist(), allw.tolist()):
                w.write(int(v), int(wd))
            payloads.append(w.getvalue())
            continue
        payloads.append(buf[: -(-int(end) // 8)].tobytes())
    return payloads
