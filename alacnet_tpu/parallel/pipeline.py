"""Host->device decode orchestration: bucketing, padding, dispatch.

Stage structure (SURVEY.md §2.5 "PP"): stage 1 slices coded frames and
parses headers on the host (codec/framemeta.py), stage 2 runs the fused
batched decode on device (ops/frame_decode.py), stage 3 trims and formats
PCM on the host (pcm.py).  Batch and word-width are padded to a small set
of buckets so arbitrary workloads reuse a handful of XLA executables.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..codec.cookie import CodecParams
from ..codec.framemeta import FrameBatch
from ..codec.framemeta_vec import parse_frame_headers_vec as parse_frame_headers
from ..ops.frame_decode import FrameMetaArrays, decode_frames_packed

#: Lane-count buckets (powers of two up to the per-chip flight size from
#: BASELINE.json: "4096 frames in flight per chip").
BATCH_BUCKETS = (8, 64, 256, 1024, 2048, 3072, 4096)
#: Word-width rounding (uint32 words; 256 words = 1 KiB payload).
WORD_BUCKET = 256


def _round_batch(b: int) -> int:
    for s in BATCH_BUCKETS:
        if b <= s:
            return s
    return -(-b // BATCH_BUCKETS[-1]) * BATCH_BUCKETS[-1]


def _pad_axis0(a: np.ndarray, b: int) -> np.ndarray:
    if a.shape[0] == b:
        return a
    pad = [(0, b - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def pad_frame_batch(fb: FrameBatch, batch: int | None = None) -> FrameBatch:
    """Pad lanes to a bucketed batch size; padded lanes have n_samples=0."""
    b = _round_batch(fb.batch) if batch is None else batch
    w = -(-fb.words.shape[1] // WORD_BUCKET) * WORD_BUCKET
    if b == fb.batch and w == fb.words.shape[1]:
        return fb  # already bucket-aligned (blob parse packs to WORD_BUCKET)
    words = np.zeros((b, w), dtype=np.uint32)
    words[: fb.batch, : fb.words.shape[1]] = fb.words
    fields = {"words": words}
    for f in dataclasses.fields(fb):
        if f.name == "words":
            continue
        fields[f.name] = _pad_axis0(getattr(fb, f.name), b)
    return FrameBatch(**fields)


#: Fused-kernel eligibility: lane count and VMEM word-table cap — the
#: per-block word table costs W * 1024 lanes * 4 bytes and must leave
#: room for output staging (ops/pallas/rice_lpc.WORDS_VMEM_BUDGET).
FUSED_MIN_BATCH = 1024
#: Widest frame of the NORMAL fused band: 11776 words = ~46 KB coded —
#: beyond the worst legal 4096-sample ALAC frame (stereo 24-bit noise +
#: extra-bits is ~33 KB).  Wider frames (legal with bigger
#: max_samples_per_frame, e.g. 16384-sample 24-bit noise ~128 KB/4 =
#: ...) still run fused via the streaming window (round 3): they batch
#: into their own 1024-lane spans up to FUSED_MAX_WORDS_STREAM; only
#: frames beyond THAT (or sub-kernel-block counts of fat frames, which
#: pad-round below 1024 lanes) take the XLA fallback.
FUSED_MAX_WORDS = 11776
#: Widest streaming-fused frame: ~96 KB coded.  The VMEM window is
#: size-independent; this caps the per-span words H2D (1024 lanes x
#: 24576 words x 4 B = ~100 MB) and the per-shape compile investment.
FUSED_MAX_WORDS_STREAM = 24576

#: Static max_order values _fused_plan rounds up to (ordered).
_ORDER_BUCKETS = (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 30)
#: Order 31 = pure integration (AlacFile.cs:283-292): no FIR window, no
#: adaptive walk — contributes 0 to a block's static max_order.
MAX_ORDER_SENTINEL = 31


def _fused_plan(
    fb: FrameBatch, n_shards: int = 1, width: int | None = None,
    platform: str | None = None,
) -> tuple[bool, int]:
    """Decide Pallas-vs-XLA and the static adaptive-walk bound.

    config.DEFAULT.kernel: "xla" forces the scan path; "fused" skips the
    backend==tpu check and runs the fused kernels even on CPU (Pallas
    interpreter — dispatch_frame_batch pads the batch up to the kernel's
    block granularity and sets interpret=True off-TPU, so "fused" means
    fused); "auto" is tpu-and-eligible.  Only the width constraints can
    still veto "fused": an over-wide frame has no fused formulation.

    ``platform``: the platform the decode will actually run on.  Under a
    mesh this is the MESH devices' platform, which can differ from
    ``jax.default_backend()`` (e.g. a virtual CPU mesh in a process
    whose default backend is the axon TPU) — the process default must
    not put a Pallas kernel onto CPU shards.
    """
    import jax

    from ..config import DEFAULT

    if width is None:
        width = fb.words.shape[1]
    per_shard = fb.batch // max(1, n_shards)
    eligible = (
        fb.batch % max(1, n_shards) == 0
        and per_shard % FUSED_MIN_BATCH == 0
        and width % 8 == 0
        and width <= FUSED_MAX_WORDS_STREAM
    )
    if DEFAULT.kernel == "xla":
        use = False
    elif DEFAULT.kernel == "fused":
        use = eligible
    else:
        use = eligible and (platform or jax.default_backend()) == "tpu"
    orders = fb.order[fb.order != 31]
    max_order = int(orders.max()) if orders.size else 0
    # Round up to a small ladder: max_order is a static kernel argument,
    # so every distinct value is a separate XLA executable (~20-40 s cold
    # compile).  The ladder bounds executable count while keeping the
    # FIR/adaptive-walk loops near-tight (orders above 8 are rare).
    max_order = next(b for b in _ORDER_BUCKETS if b >= max_order)
    return use, max_order


def _block_spreads(s: np.ndarray, lanes: int) -> list[int]:
    """Per-block coded-size spread (8-word groups) over ``lanes``-lane blocks."""
    return [
        int(s[lo : lo + lanes].max() - s[lo : lo + lanes].min()) // 32
        for lo in range(0, len(s), lanes)
    ]


def span_sub_hint(span_sizes: np.ndarray, orig_b: int | None = None) -> int:
    """Lane-tile hint for a span from its per-block coded-size spread.

    The fused kernel's fetch sweep covers the word-position range of the
    whole (sub, 128) lane tile each pair, so the tile width that wins
    depends on how much the block's frame SIZES spread:

    - MEDIAN block spread >= ``config.spread_cap_groups`` (1024-lane
      blocks) -> hint 4: narrow the tile to (4, 128).  Measured +28% on
      the UNSORTED mixed-orders corpus (496 -> 633 Msps single-channel;
      sub=2 loses — fixed per-lane cost quadruples) on the
      pre-amortized kernel.  OFF by default since the amortized
      fetch-range bounds (DESIGN.md §4j) cut the sweep's per-pair
      reduce cost ~4x: on the size-continuum spans that actually reach
      the cap, sub=8 whole-table now wins (orders 781 -> 902 Msps,
      mixed e2e device stage 1605 -> 1743 Msps, v5e) — a narrow tile
      doubles the grid's pair-steps for a sweep saving that no longer
      pays.  ALAC_SPREAD_CAP=16 restores the old behavior for
      unsorted single-dispatch callers.
    - WORST block spread <= ``config.tight_groups`` (2048-lane windows
      — the sub=16 block size) -> hint 16: stream the word table
      through a (16, 128) tile (the ALAC_STREAM16 band, auto-gated).
      OFF by default: the single-CHANNEL kernel pass wins 46% on tight
      blocks (1871 -> 2727 Msps), but the production two-pass stage
      (channel B re-streams from A's scattered end positions) measured
      12% WORSE on the music corpus — see config.tight_groups.
    - otherwise hint 0: the planner's default (whole-table sub=8).
    """
    from ..config import DEFAULT

    s = np.asarray(span_sizes)[: orig_b if orig_b else None]
    if not len(s):
        return 0
    t = DEFAULT.spread_cap_groups
    if t and np.median(_block_spreads(s, FUSED_MIN_BATCH)) >= t:
        return 4
    tight = DEFAULT.tight_groups
    if tight and max(_block_spreads(s, 2 * FUSED_MIN_BATCH)) <= tight:
        return 16
    return 0


def span_range_mode(
    span_sizes: np.ndarray, orig_b: int | None = None
) -> int | None:
    """Per-span fetch-range policy for the fused kernels.

    Returns 0 (EXACT per-pair cross-lane range bounds) when the span's
    median per-1024-lane-block coded-size spread reaches
    ``config.range_spread_groups``, else None (the kernel's env
    default — amortized bounds, ALAC_FETCH_RANGE).

    Why: the amortized bounds tighten the fetch sweep's upper bound
    one group per pair between exact reduces — nearly free when a
    tile's lanes advance together, but on spans whose tiles straddle
    far-apart size clusters (the orders kind's big-payload span:
    3.4-7.8 KB frames in one 1024-lane block, median spread 138
    groups) the widened sweep costs more than the per-pair reduce it
    amortizes away: 566 Msps amortized vs 803 exact (r5, v5e).  Every
    uniform kind sits at <= 13 groups and keeps amortized bounds
    (exact bounds cost spiky ~17%).  ``span_sizes`` in planner order
    (size-sorted within the span, as plan_blob_batches emits).
    """
    from ..config import DEFAULT

    t = DEFAULT.range_spread_groups
    s = np.asarray(span_sizes)[: orig_b if orig_b else None]
    if not t or not len(s):
        return None
    if np.median(_block_spreads(s, FUSED_MIN_BATCH)) >= t:
        return 0
    return None


def _devpack_backend() -> bool:
    """Device row assembly runs on tpu (pallas kernel) and cpu (the
    bit-identical XLA fallback, which keeps the path under the routine
    CPU test suite), single-device or mesh."""
    import jax

    return jax.default_backend() in ("tpu", "cpu")


def dispatch_frame_batch(
    fb: FrameBatch, max_samples: int, mesh=None, whole_table: bool = False,
    sub_hint: int = 0, device_rows=None, range_mode: int | None = None,
):
    """Parse-side dispatch: returns device arrays without synchronizing.

    JAX dispatch is asynchronous, so the caller can keep parsing the next
    batch on the host while the device decodes this one (the host->device
    pipeline stage overlap, SURVEY.md §2.5 "PP").

    ``mesh``: decode across a jax.sharding.Mesh — the lane axis shards
    over every device (DP, SURVEY.md §2.5) with host arrays placed
    straight onto their target shards.

    ``device_rows``: ``(bwords, ow, nbytes, W)`` from
    ``span_batch(idx, device_rows=True)`` + a device-resident
    ``blob_words`` blob — the word-row table is then assembled on-device
    (ops/pallas/pack_rows) instead of shipped from the host; fb carries
    an empty (B, 0) words placeholder.  Under a mesh the blob is
    replicated and each shard gathers its own lanes' rows
    (mesh.decode_frames_spmd_rows).
    """
    from ..config import DEFAULT

    import jax

    orig_b = fb.batch
    fb = pad_frame_batch(fb)
    n_shards = 1
    platform = None
    if mesh is not None:
        n_shards = mesh.devices.size
        platform = mesh.devices.flat[0].platform
        if fb.batch % n_shards:
            fb = pad_frame_batch(
                fb, -(-fb.batch // n_shards) * n_shards
            )
    if DEFAULT.kernel == "fused":
        # Forced-fused (tests / interpreter experiments): pad the lane
        # count up to the kernel's block granularity so a small batch
        # can't silently run the XLA path instead (the width
        # constraints still apply — over-wide frames have no fused
        # formulation).  Without this, every sub-FUSED_MIN_BATCH caller
        # "testing the fused path" actually exercised the scan path.
        blk = FUSED_MIN_BATCH * n_shards
        if fb.batch % blk:
            fb = pad_frame_batch(fb, -(-fb.batch // blk) * blk)
    width = device_rows[3] if device_rows is not None else None
    use_fused, max_order = _fused_plan(
        fb, n_shards, width=width, platform=platform
    )
    # Pallas lowers only on TPU; anywhere else the fused path runs under
    # the Pallas interpreter (bit-identical, slow — test/debug only).
    interpret = use_fused and (platform or jax.default_backend()) != "tpu"
    if not use_fused:
        # range_mode only parameterizes the fused kernels; normalizing
        # it away on the XLA path keeps one executable per shape
        # instead of one per (shape, policy verdict).
        range_mode = None
    emit16 = DEFAULT.emit16 and bool((fb.sample_size == 16).all())
    if mesh is not None:
        from .mesh import (
            decode_frames_spmd, decode_frames_spmd_rows, shard_frame_batch,
        )

        if device_rows is not None:
            bwords, ow, nbytes, W = device_rows
            out, n = decode_frames_spmd_rows(
                bwords, _pad_axis0(ow, fb.batch),
                _pad_axis0(nbytes, fb.batch), W,
                FrameMetaArrays.pack_host(fb), mesh, max_samples,
                use_fused=use_fused, max_order=max_order, emit16=emit16,
                whole_table=whole_table, sub_hint=sub_hint,
                interpret=interpret, range_mode=range_mode,
            )
            return out, n, orig_b
        words, meta = shard_frame_batch(fb, mesh)
        out, n = decode_frames_spmd(
            words, meta, mesh, max_samples,
            use_fused=use_fused, max_order=max_order, emit16=emit16,
            whole_table=whole_table, sub_hint=sub_hint,
            interpret=interpret, range_mode=range_mode,
        )
        return out, n, orig_b
    if device_rows is not None:
        import jax

        from ..ops.pallas.pack_rows import pack_rows, pack_rows_xla

        bwords, ow, nbytes, W = device_rows
        ow = _pad_axis0(ow, fb.batch)  # padded lanes: ow=0, nbytes=0
        nbytes = _pad_axis0(nbytes, fb.batch)
        packer = (
            pack_rows if jax.default_backend() == "tpu" else pack_rows_xla
        )
        words_dev = packer(bwords, jnp.asarray(ow), jnp.asarray(nbytes), W)
    else:
        # Two H2D transfers per batch (words + one packed metadata
        # matrix): per-array transfer setup otherwise dominates the
        # pipeline wall.
        words_dev = jnp.asarray(fb.words)
    out, n = decode_frames_packed(
        words_dev,
        jnp.asarray(FrameMetaArrays.pack_host(fb)),
        max_samples,
        use_fused=use_fused,
        max_order=max_order,
        emit16=emit16,
        whole_table=whole_table,
        sub_hint=sub_hint,
        interpret=interpret,
        range_mode=range_mode,
    )
    return out, n, orig_b


def decode_frame_batch(fb: FrameBatch, max_samples: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a parsed FrameBatch -> (samples (B, S, 2) int32, n (B,))."""
    out, n, orig_b = dispatch_frame_batch(fb, max_samples)
    return np.asarray(out[:orig_b]), np.asarray(n[:orig_b])


def plan_blob_batches(
    blob: np.ndarray,
    offsets: np.ndarray,
    sizes: np.ndarray,
    params: list[CodecParams] | CodecParams,
    batch_limit: int,
    strict: bool,
):
    """Batch planning for blob decode: header pre-pass + lane ordering.

    Parses every frame's header once (native, no word packing — ~0.5
    us/frame), then orders lanes by two keys (SURVEY.md §2.5 "EP" —
    variant routing):

      1. **fused-kernel eligibility**: frames too fat for the kernel's
         VMEM word table batch separately, so one oversized frame can't
         push a whole batch onto the XLA fallback;
      2. **coded size**: the kernel's group-sweep word fetch cost within
         a 1024-lane block scales with the *spread* of per-lane bit
         consumption, batches share a word-width bucket, and each span's
         word-table width (which sets the kernel's lane-tile width,
         ops/pallas/rice_lpc.pick_sub) stays as narrow as its own frames
         allow.

    Order-clustered batching (primary key = LPC order, to tighten each
    span's static max_order) was measured and REJECTED: mixing tiny and
    fat frames in one span widens its word table, which narrows the lane
    tile for every lane — 80 ms vs 69 ms on the mixed e2e corpus against
    this size-primary plan, despite max_orders [4,4,8] vs [8,8,6]
    (scripts/abtest_orderplan.py on v5e).  Size-sorting already clusters
    orders as a side effect (coded size tracks predictability), and
    _fused_plan computes max_order per span either way.

    Returns (perm, inv, spans, span_batch) where ``spans`` are
    [lo, hi) index ranges into ``perm`` and ``span_batch(perm[lo:hi])``
    assembles that batch (sliced pre-parsed headers + per-span native
    word packing).  Callers unsort outputs with ``inv``.
    """
    import dataclasses

    from ..codec.framemeta import FrameBatch
    from ..codec.framemeta_vec import parse_frame_headers_blob, words_width
    from ..ops.bitreader import WINDOW_PAD

    F = len(offsets)
    offsets = np.asarray(offsets)
    sizes = np.asarray(sizes)
    hdr = parse_frame_headers_blob(
        blob, offsets, sizes, params, strict=strict, pack_words=False
    )
    cap_w = (FUSED_MAX_WORDS // WORD_BUCKET) * WORD_BUCKET
    cap_bytes = (cap_w - WINDOW_PAD) * 4
    cap2_w = (FUSED_MAX_WORDS_STREAM // WORD_BUCKET) * WORD_BUCKET
    cap2_bytes = (cap2_w - WINDOW_PAD) * 4
    # Eligibility levels: 0 = normal fused band, 1 = streaming-fused
    # big-frame band (own 1024-lane spans bound the words H2D), 2 = XLA.
    elig = np.where(
        sizes <= cap_bytes, 0, np.where(sizes <= cap2_bytes, 1, 2)
    ).astype(np.int8)
    # Third key: bit depth — 16-bit frames cluster into their own spans
    # so a pooled mixed-format decode_files still ships int16 for the
    # 16-bit spans (emit16 halves their D2H; dispatch_frame_batch
    # chooses the dtype per batch).  Sizes stay the fine key, so the
    # word-table width argument above is unaffected within each group.
    # Finest key: adaptive-walk depth (order; 31 = pure integration
    # needs no walk) — WITHIN equal sizes only, so the rejected
    # order-primary plan's word-width penalty cannot occur.  Combined
    # with the 1024-block span splitting below, it gives each dispatch
    # a tight static max_order instead of the whole batch paying the
    # deepest lane's FIR/adaptive unroll (VERDICT r2 next #2b).
    is_wide = hdr.sample_size != 16
    okey = np.where(hdr.order == MAX_ORDER_SENTINEL, 0, hdr.order).max(axis=1)
    from ..config import DEFAULT

    if DEFAULT.order_primary:
        # Cluster by sample count, then order BUCKET, then size: kernel
        # blocks become homogeneous in BOTH the dynamic trip count
        # (nmax = block max n — mixing partial frames into a full-frame
        # block burns frozen-lane steps) and the static max_order (a
        # single deep lane otherwise taxes the whole block's FIR /
        # adaptive walk).  Sizes stay sorted within each (n, bucket)
        # group, preserving fetch-sweep locality inside every block.
        # A raw order-primary sort (no n key) measured 2x WORSE than
        # size-primary on the mixed-orders corpus: it scatters partial
        # frames across full-length blocks.
        buckets = np.asarray(_ORDER_BUCKETS)
        obkt = buckets[np.searchsorted(buckets, okey)]
        perm = np.lexsort((sizes, obkt, hdr.n_samples, is_wide, elig))
    else:
        perm = np.lexsort((okey, sizes, is_wide, elig))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(F)
    group = elig[perm] * 2 + is_wide[perm].astype(np.int8)
    boundaries = sorted(
        {0, F} | set((np.flatnonzero(np.diff(group)) + 1).tolist())
    )
    # Span chunks split further at kernel-block (1024-lane) boundaries
    # where the order bucket changes: sub-spans stay fused-eligible
    # (multiples of FUSED_MIN_BATCH except tails, which padding covers)
    # and each gets its own static max_order from _fused_plan — order-0
    # and order-31 blocks skip the FIR/adaptive unroll entirely.
    def _bucket(o: int) -> int:
        return next(b for b in _ORDER_BUCKETS if b >= o)

    ok_p = okey[perm]
    el_p = elig[perm]
    spans = []
    for b_lo, b_hi in zip(boundaries[:-1], boundaries[1:]):
        # Big-frame band: one kernel block of lanes per span bounds the
        # words H2D (frames there run up to ~96 KB each).
        limit = min(batch_limit, FUSED_MIN_BATCH) if el_p[b_lo] == 1 else batch_limit
        for lo in range(b_lo, b_hi, limit):
            hi = min(lo + limit, b_hi)
            sub, cur = lo, None
            if DEFAULT.order_spans:
                for blk in range(lo, hi, FUSED_MIN_BATCH):
                    bk = _bucket(
                        int(ok_p[blk : min(blk + FUSED_MIN_BATCH, hi)].max())
                    )
                    if cur is None:
                        cur = bk
                    elif bk != cur and hi - blk >= FUSED_MIN_BATCH:
                        # Never split off a sub-span below one kernel
                        # block: it would pad to a sub-1024 bucket and
                        # lose fused eligibility (FUSED_MIN_BATCH).
                        spans.append((sub, blk))
                        sub, cur = blk, bk
            spans.append((sub, hi))
    hdr_fields = [
        f.name for f in dataclasses.fields(FrameBatch) if f.name != "words"
    ]

    def span_batch(idx: np.ndarray, device_rows: bool = False):
        """Assemble one batch: sliced pre-parsed headers + packed words.

        ``device_rows=True`` skips host word packing entirely and
        returns ``(fb, ow, nbytes, W)`` for the on-device row assembler
        (ops/pallas/pack_rows): fb.words is an empty (B, 0) placeholder,
        and the parsed bit positions are bumped by the frame's sub-word
        byte shift (the device packer copies word-aligned windows).
        """
        from .. import native
        from ..ops.bitreader import pack_frames_to_words

        offs = np.ascontiguousarray(offsets[idx])
        szs = np.ascontiguousarray(sizes[idx])
        if device_rows:
            from ..ops.pallas.pack_rows import host_row_params

            ow, nbytes, bump = host_row_params(offs, szs)
            W = words_width(
                int(nbytes.max()) if len(nbytes) else 0, WORD_BUCKET
            )
            fields = {f: getattr(hdr, f)[idx] for f in hdr_fields}
            fields["payload_pos"] = fields["payload_pos"] + bump
            fields["entropy_pos"] = fields["entropy_pos"] + bump
            fb = FrameBatch(
                words=np.zeros((len(idx), 0), np.uint32), **fields
            )
            return fb, ow, nbytes, W
        nwords = words_width(int(szs.max()) if len(szs) else 0, WORD_BUCKET)
        words = native.pack_frames_native(blob, offs, szs, nwords)
        if words is None:
            words = pack_frames_to_words(
                [blob[o : o + s].tobytes() for o, s in zip(offs, szs)]
            )
            words = np.pad(words, ((0, 0), (0, nwords - words.shape[1])))
        return FrameBatch(
            words=words, **{f: getattr(hdr, f)[idx] for f in hdr_fields}
        )

    return perm, inv, spans, span_batch


def decode_blob(
    blob: np.ndarray,
    offsets: np.ndarray,
    sizes: np.ndarray,
    params: list[CodecParams] | CodecParams,
    max_samples: int,
    batch_limit: int | None = None,
    strict: bool | None = None,
    sink=None,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode frames addressed as (offset, size) into a raw byte blob.

    Preferred production path: frame packing and header parsing run in
    the native host runtime (alacnet_tpu/native.py) when available, with
    no per-frame Python objects.  Returns (samples, n, status) where
    ``status`` flags per-frame parse failures in lenient mode.

    ``mesh``: shard every batch's lane axis across a jax.sharding.Mesh
    (multi-chip DP decode; see parallel/mesh.py).

    ``sink``: optional device-side consumer ``sink(out, n, orig_b)``
    called with each batch's *device* arrays (padded, size-bucket order)
    instead of materializing PCM on the host — the decode-to-device path
    for downstream JAX stages (and for benchmarking without the D2H
    transfer).  With a sink the returned samples/n are empty; ``status``
    is still per-frame in original order.
    """
    from ..config import DEFAULT
    from ..utils.observability import GLOBAL_STATS, trace_span

    if batch_limit is None:
        batch_limit = DEFAULT.batch_limit
    if strict is None:
        strict = DEFAULT.strict
    sizes = np.asarray(sizes)
    with trace_span("alac.host.parse", "host_seconds"):
        perm, inv, spans, span_batch = plan_blob_batches(
            blob, offsets, sizes, params, batch_limit, strict
        )
    # Device-side row assembly (ops/pallas/pack_rows): ship the raw
    # blob once, skip the host word packer entirely.  Under a mesh the
    # word blob replicates across the devices (one broadcast per corpus)
    # and each shard gathers its own lanes' rows.
    devpack = DEFAULT.device_pack and _devpack_backend()
    bwords = None
    if devpack:
        from ..codec.framemeta_vec import words_width
        from ..ops.pallas.pack_rows import blob_words

        # Widest row any span will gather: the fattest frame's bytes
        # plus its <=3-byte sub-word shift.  Sizing the blob padding to
        # it keeps every tail-frame window in bounds (wrong-clip bug:
        # a clipped window re-bases the row and corrupts the decode).
        max_w = words_width(
            int(sizes.max()) + 3 if len(sizes) else 0, WORD_BUCKET
        )
        bwords = blob_words(np.asarray(blob), max_w=max_w)
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            bwords = jax.device_put(
                bwords, NamedSharding(mesh, PartitionSpec())
            )
    outs, ns, sts = [], [], []
    # Bounded async pipeline: the device decodes batch k while the host
    # parses batch k+1 (dispatch is non-blocking; <=2 batches in flight).
    pending: list = []

    def drain_one():
        out_d, n_d, orig_b, frames, nbytes, status, fb, rows = pending.pop(0)
        if sink is not None:
            sink(out_d, n_d, orig_b)
            GLOBAL_STATS.record(frames=frames, coded_bytes=nbytes)
            sts.append(status)
            return
        with trace_span("alac.device.result_wait", "result_wait_seconds"):
            out = np.asarray(out_d[:orig_b])
            n = np.asarray(n_d[:orig_b])
        if (n < 0).any():
            # A streaming-mode kernel block stalled (cross-lane
            # divergence wider than the VMEM window — adversarial
            # inputs only; ops/pallas/rice_lpc.plan_tiles).  Re-decode
            # the span with classic whole-table residency.
            out_d, n_d, _ = dispatch_frame_batch(
                fb, max_samples, mesh=mesh, whole_table=True,
                device_rows=rows,
            )
            out = np.asarray(out_d[:orig_b])
            n = np.asarray(n_d[:orig_b])
        GLOBAL_STATS.record(
            frames=frames, samples=int(n.sum()), coded_bytes=nbytes
        )
        outs.append(out)
        ns.append(n)
        sts.append(status)

    for lo, hi in spans:
        idx = perm[lo:hi]
        rows = None
        with trace_span("alac.host.parse", "host_seconds"):
            if devpack:
                fb, ow, nb, W = span_batch(idx, device_rows=True)
                rows = (bwords, ow, nb, W)
            else:
                fb = span_batch(idx)
        out_d, n_d, orig_b = dispatch_frame_batch(
            fb, max_samples, mesh=mesh, sub_hint=span_sub_hint(sizes[idx]),
            device_rows=rows, range_mode=span_range_mode(sizes[idx]),
        )
        pending.append(
            (out_d, n_d, orig_b, hi - lo, int(sizes[idx].sum()),
             fb.status[: hi - lo], fb, rows)
        )
        if len(pending) >= 2:
            drain_one()
    while pending:
        drain_one()
    if sink is not None:
        status = (
            np.concatenate(sts)[inv] if sts else np.zeros(0, np.int32)
        )
        return (
            np.zeros((0, max_samples, 2), np.int32),
            np.zeros(0, np.int32),
            status,
        )
    if not outs:
        return (
            np.zeros((0, max_samples, 2), np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
        )
    return (
        np.concatenate(outs)[inv],
        np.concatenate(ns)[inv],
        np.concatenate(sts)[inv],
    )


def decode_payloads(
    payloads: list[bytes],
    params: list[CodecParams] | CodecParams,
    max_samples: int,
    batch_limit: int = BATCH_BUCKETS[-1],
) -> tuple[np.ndarray, np.ndarray]:
    """Parse + decode coded frame payloads in bucketed device batches.

    Returns (samples (F, S, 2) int32, n (F,) int32) across all frames.
    """
    outs, ns = [], []
    for lo in range(0, len(payloads), batch_limit):
        chunk = payloads[lo : lo + batch_limit]
        p = params if isinstance(params, CodecParams) else params[lo : lo + batch_limit]
        fb = parse_frame_headers(chunk, p)
        out, n = decode_frame_batch(fb, max_samples)
        outs.append(out)
        ns.append(n)
    if not outs:
        return np.zeros((0, max_samples, 2), np.int32), np.zeros(0, np.int32)
    return np.concatenate(outs), np.concatenate(ns)
