"""Device-side gather-pack: build the (B, W) word-row table from the
raw coded blob, on-chip.

Round 2 packed word rows on the host (`_native/host.cpp:alac_pack_frames`)
and shipped the padded (B, W) grid over H2D — ~2x the coded bytes (rows
are padded to the span's word width) and ~30 ms of host memory traffic
per 12K-frame corpus on a 1-core host, which made the pipeline
host-bound once device decode reached ~1.5 Gsps.  Here the host ships
the *raw contiguous blob once* (uint8, no copy, about half the H2D
bytes) and the row table is assembled at HBM bandwidth on the device:

1. ``blob_words``: one XLA pass turns the byte blob into big-endian
   uint32 words (the bit-reader's word domain — reference semantics
   `MyStream.cs` big-endian reads / ALACDecoder AlacFile.cs:151-200
   readbits over a byte stream), shaped (Nq, 128) for tiled DMA.
2. ``pack_rows``: a pallas kernel that, per lane, DMAs the aligned
   window containing ``bwords[ow[b] : ow[b]+W]``, shifts the <=1023-word
   residual in-register, and zeroes every byte at/after the frame's end
   (``nbytes[b]``) — the bit-reader's overrun contract is "reads past
   the end return zero bits" (AlacFile.cs:163-171 zero-fill;
   codec/scalar.py BitReader).

Two Mosaic constraints shape the kernel:

- Dynamic HBM slices must start/end on 4 KiB tile boundaries
  (tiled<(8,128)> for the (Nq, 128) blob: the sublane start must be
  divisible by 8, i.e. 1024 words).  Each lane therefore DMAs the
  1024-word-aligned window containing its row.
- Neither HBM nor VMEM allows word-granular dynamic slicing, so the
  residual shift ``r = ow % 1024`` is applied as a log2 shifter: ten
  per-lane-conditional static rolls (sublane/lane rotates on the VPU),
  with lane rolls carrying across the 128-word row boundary.

A frame's first byte may also sit anywhere in a word: the caller keeps
``ow = byte_offset >> 2`` and adds ``8 * (byte_offset & 3)`` to the
lane's start bit position instead of shift-merging bytes — the Rice
reader addresses arbitrary bit positions anyway, so alignment costs
nothing.  Bytes before the frame inside word ``ow`` (they belong to the
previous frame in the blob) are left in place; nothing ever reads
before the start bit.

The XLA fallback (`pack_rows_xla`) is bit-identical and serves CPU
tests and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

#: Lanes packed per grid step (per-step VMEM ~= 2 * TB * Wp * 4 bytes;
#: TB=8 keeps the widest fused span, 24576+1024 words, under 1.7 MB).
TB = 8

#: Words per VMEM lane row; minor dim of the (Nq, 128) blob layout.
QL = 128

#: HBM DMA granularity in words: dynamic slice starts must sit on a
#: 4 KiB tile boundary (8 sublanes x 128 lanes of int32).
ALIGN = 1024


def host_le_words(
    blob_u8: np.ndarray, max_w: int = 0
) -> tuple[np.ndarray, int, int]:
    """Host half of ``blob_words``: a ZERO-COPY little-endian uint32
    view of the blob (plus the <=3 tail bytes folded into one scalar
    big-endian word) and the padded row count.

    Why split host/device this way: TPUs execute sub-32-bit elementwise
    work catastrophically slowly — the original all-device u8 path
    (pad-scatter + strided u8 gathers + u8->u32 converts) ran at
    ~0.75 GB/s, 60 ms for a 12K-frame corpus, wiping out everything
    device packing saved.  A u32 view costs the host nothing and the
    device byteswap is four int32 VPU ops at HBM bandwidth.

    ``max_w``: the widest row the caller will ever gather (the widest
    span's word width).  Padding is ``max_w + 2*ALIGN`` zero words past
    the blob so any aligned window ``[align_down(ow), align_down(ow) +
    Qp*QL)`` with ``ow <= Nw`` stays in bounds — a tail frame's row in a
    wide span reads zero bits past the blob end, never a clipped
    (wrongly-based) window.
    """
    blob_u8 = np.asarray(blob_u8, dtype=np.uint8)
    n = blob_u8.shape[0]
    n4 = (n // 4) * 4
    head = blob_u8[:n4]
    if not (head.flags.c_contiguous and head.flags.aligned):
        head = np.ascontiguousarray(head)
    try:
        w32 = head.view(np.uint32)
    except ValueError:  # misaligned base (offset slice into a buffer)
        w32 = np.frombuffer(head.tobytes(), np.uint32)
    tail_be = 0
    for i, b in enumerate(blob_u8[n4:]):
        tail_be |= int(b) << (24 - 8 * i)
    nw = -(-n // 4)
    nq = -(-(nw + max_w + 2 * ALIGN) // ALIGN) * ALIGN // QL
    return w32, tail_be, nq


@functools.partial(jax.jit, static_argnames=("nq",))
def _words_from_le(w32: jax.Array, tail_be: jax.Array, nq: int) -> jax.Array:
    """Device half of ``blob_words``: byteswap LE->BE in int32 ops and
    zero-pad to (nq, 128).  The tail word (blob length % 4) lands at the
    first padding slot; when there is no tail the caller passes 0 and
    the write is a no-op on an already-zero pad word."""
    x = w32.astype(U32)
    be = (
        ((x & 0xFF) << 24)
        | ((x & 0xFF00) << 8)
        | ((x >> 8) & 0xFF00)
        | (x >> 24)
    )
    out = jnp.zeros((nq * QL,), U32).at[: x.shape[0]].set(be)
    out = out.at[x.shape[0]].set(tail_be.astype(U32))
    return out.reshape(nq, QL)


def blob_words(blob_u8: np.ndarray, max_w: int = 0, put=None) -> jax.Array:
    """Byte blob -> (Nq, 128) big-endian uint32 words on the device.

    Big-endian because the bit readers consume the word domain of the
    reference's MSB-first byte stream (AlacFile.cs:101-129 Readbits
    composition).  See ``host_le_words`` for the host/device split and
    the padding contract.  ``put`` optionally replaces the implicit
    ``jnp.asarray`` H2D with a caller-instrumented transfer (the bench's
    measured-relay accounting, bench_lib.overlapped_run).
    """
    w32, tail_be, nq = host_le_words(blob_u8, max_w)
    dev = put(w32) if put is not None else jnp.asarray(w32)
    return _words_from_le(dev, jnp.uint32(tail_be), nq)


def _mask_tail(rows: jax.Array, nbytes: jax.Array) -> jax.Array:
    """Zero every byte of ``rows`` at/after per-lane byte count ``nbytes``.

    rows (TB, Q, QL) uint32 big-endian; nbytes (TB, 1, 1) int32.
    """
    q = jax.lax.broadcasted_iota(I32, rows.shape, 1)
    j = jax.lax.broadcasted_iota(I32, rows.shape, 2)
    nb = jnp.clip(nbytes - 4 * (QL * q + j), 0, 4)
    # nb==4 -> keep all; nb==0 -> zero; else keep the top nb bytes.
    mask = jnp.where(
        nb >= 4,
        jnp.full(rows.shape, 0xFFFFFFFF, U32),
        jnp.where(
            nb <= 0,
            jnp.zeros(rows.shape, U32),
            jnp.full(rows.shape, 0xFFFFFFFF, U32) << ((4 - nb) * 8).astype(U32),
        ),
    )
    return rows & mask


def _shift_words(rows: jax.Array, r: jax.Array) -> jax.Array:
    """Left-shift each lane's flattened (Q*QL,) row by r[t] words.

    rows (TB, Q, QL); r (TB, 1, 1) int32 in [0, ALIGN).  Log2 shifter:
    static sublane rolls for multiples of QL, static lane rolls with
    cross-row carry below QL — per-lane *dynamic* slices are not
    expressible in the tiled layouts.
    """
    j = jax.lax.broadcasted_iota(I32, rows.shape, 2)
    for k in range(9, -1, -1):
        s = 1 << k
        take = (r & s) != 0
        if s >= QL:
            shifted = jnp.roll(rows, -(s // QL), axis=1)
        else:
            rl = jnp.roll(rows, -s, axis=2)
            rq = jnp.roll(rl, -1, axis=1)
            shifted = jnp.where(j < QL - s, rl, rq)
        rows = jnp.where(take, shifted, rows)
    return rows


def _kernel(ow_smem, nb_ref, r_ref, bwords_hbm, out_ref, vstage, sem, *, Qw):
    """One grid step: DMA TB aligned windows, shift residuals, mask
    tails, emit the (TB, Qw, QL) block."""
    b = pl.program_id(0)
    Qp = vstage.shape[1]
    cps = []
    for t in range(TB):
        q0 = (ow_smem[b * TB + t] // ALIGN) * (ALIGN // QL)
        cp = pltpu.make_async_copy(
            bwords_hbm.at[pl.ds(pl.multiple_of(q0, ALIGN // QL), Qp)],
            vstage.at[t],
            sem,
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    rows = _shift_words(vstage[:], r_ref[0])
    out_ref[0] = _mask_tail(rows[:, :Qw], nb_ref[0])


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def pack_rows(
    bwords: jax.Array,
    ow: jax.Array,
    nbytes: jax.Array,
    W: int,
    interpret: bool = False,
) -> jax.Array:
    """(B, W) uint32 rows: row b = flat ``bwords[ow[b] : ow[b]+W]`` with
    every byte at/after ``nbytes[b]`` zeroed.  B % TB == 0, W % 256 == 0
    (the planner's WORD_BUCKET); bwords from ``blob_words`` (its padding
    guarantees in-bounds windows for any ow <= Nw).
    """
    B = ow.shape[0]
    assert B % TB == 0 and W % (2 * QL) == 0, (B, W)
    Qw = W // QL
    Qp = (-(-W // ALIGN) + 1) * (ALIGN // QL)  # rounded up + shift slack
    ow = jnp.clip(ow.astype(I32), 0, (bwords.shape[0] - Qp) * QL)
    nb4 = nbytes.astype(I32).reshape(B // TB, TB, 1, 1)
    r4 = (ow % ALIGN).reshape(B // TB, TB, 1, 1)
    out = pl.pallas_call(
        functools.partial(_kernel, Qw=Qw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((1, TB, 1, 1), lambda b, ow_s: (b, 0, 0, 0)),
                pl.BlockSpec((1, TB, 1, 1), lambda b, ow_s: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, TB, Qw, QL), lambda b, ow_s: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((TB, Qp, QL), U32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B // TB, TB, Qw, QL), U32),
        interpret=interpret,
    )(ow, nb4, r4, bwords)
    return out.reshape(B, W)


def pack_rows_xla(
    bwords: jax.Array, ow: jax.Array, nbytes: jax.Array, W: int
) -> jax.Array:
    """Bit-identical XLA fallback (CPU tests; non-TPU backends)."""
    flat = bwords.reshape(-1)
    ow = jnp.clip(ow.astype(I32), 0, flat.shape[0] - W)
    idx = ow[:, None] + jnp.arange(W, dtype=I32)[None, :]
    rows = jnp.take(flat, idx, axis=0).reshape(ow.shape[0], W // QL, QL)
    return _mask_tail(
        rows, nbytes.astype(I32)[:, None, None]
    ).reshape(ow.shape[0], W)


def host_row_params(
    offsets: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-lane (ow, nbytes, start_bit_bump) for device packing.

    ow = byte offset >> 2; nbytes = in-row valid bytes (sub-word shift +
    frame size); start_bit_bump = 8 * (byte offset & 3), to add to the
    parsed start bit position (which is relative to the frame's first
    byte).
    """
    off = offsets.astype(np.int64)
    sh = (off & 3).astype(np.int32)
    ow = (off >> 2).astype(np.int32)
    nbytes = (sh + sizes.astype(np.int64)).astype(np.int32)
    return ow, nbytes, (8 * sh).astype(np.int32)
