"""Fast fused-kernel iteration bench: one-channel pass on cached corpora.

Usage: python scripts/kbench.py [kind ...]   (default: music)

Caches encoded frame batches under /tmp/alac_kbench so kernel edits can
be timed in seconds.  Reports Msamples/s for the single-channel
fused_rice_lpc pass (multiply by ~1/2 for the stereo 2-pass pipeline) and
checks parity against the XLA scan path.
"""

import pathlib
import pickle
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

CACHE = pathlib.Path("/tmp/alac_kbench")
CACHE.mkdir(exist_ok=True)


def corpus(kind: str, batch: int = 4096, S: int = 4096):
    f = CACHE / f"{kind}_{batch}_{S}.pkl"
    if f.exists():
        return pickle.loads(f.read_bytes())
    from alacnet_tpu.bench_lib import make_corpus_frames
    from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec

    distinct, params = make_corpus_frames(
        num_distinct=32, frame_samples=S, kind=kind
    )
    payloads = [distinct[i % len(distinct)] for i in range(batch)]
    fb = parse_frame_headers_vec(payloads, params)
    from alacnet_tpu.parallel.pipeline import pad_frame_batch

    fb = pad_frame_batch(fb, batch)
    f.write_bytes(pickle.dumps(fb))
    return fb


def bench_kind(kind: str, repeats: int = 6, check_parity: bool = True):
    from alacnet_tpu.ops.pallas.rice_lpc import fused_rice_lpc
    from alacnet_tpu.ops.lpc import LpcParams, lpc_decode
    from alacnet_tpu.ops.rice import RiceParams, rice_decode

    fb = corpus(kind)
    S = 4096
    orders = fb.order[fb.order != 31]
    max_order = int(orders.max()) if orders.size else 0
    args0 = (fb.entropy_pos, fb.n_samples, fb.rss, fb.kmod,
             fb.init_history, fb.rice_mult[:, 0], fb.kmask,
             fb.order[:, 0], fb.quant[:, 0], fb.rc[:, 0])
    variants = []
    salt = np.random.default_rng()  # process-unique: the relay memoizes
    base = int(salt.integers(1, fb.words.shape[0] - repeats - 1))
    for r in range(repeats + 1):
        # Process-random lane rotation: no dispatch in this process can
        # be content-identical to one from an earlier process.
        w = np.roll(fb.words, base + r, axis=0)
        a = tuple(
            jnp.asarray(np.roll(np.asarray(x), base + r, axis=0))
            for x in args0
        )
        variants.append((jnp.asarray(w), a))
    # Force every input onto the device BEFORE timing: over the relay,
    # block_until_ready is a no-op and H2D completes lazily — only a
    # value readback guarantees the transfer happened.
    force = jnp.zeros((), jnp.uint32)
    for w, a in variants:
        force = force + jnp.sum(w) + sum(jnp.sum(x).astype(jnp.uint32) for x in a)
    force.item()
    out, end = fused_rice_lpc(variants[-1][0], *variants[-1][1], S,
                              max_order=max_order)
    jnp.sum(end).item()
    # Slope timing: the axon relay costs ~37 ms per value readback and
    # block_until_ready is a no-op, so time T(1) and T(R) with ONE scalar
    # readback each (chained device-side sum forces every kernel) and
    # take the marginal cost (T(R)-T(1))/(R-1).  Buffers are distinct and
    # process-randomly rotated — identical dispatches get memoized.
    def run_chain(idxs):
        t0 = time.perf_counter()
        accs = []
        for r in idxs:
            w, a = variants[r]
            _, end = fused_rice_lpc(w, *a, S, max_order=max_order)
            accs.append(jnp.sum(end))
        tot = accs[0]
        for x in accs[1:]:
            tot = tot + x
        tot.item()
        return time.perf_counter() - t0

    # RTT baseline: re-dispatch of the warmed variant is served from the
    # relay's memo, costing only the round trip.  The relay's timing has
    # multi-hundred-ms hiccups — take mins over several chains.
    t_rtt = min(run_chain([repeats]) for _ in range(3))
    half = repeats // 2
    tR = min(
        run_chain(range(half)) / half,
        run_chain(range(half, repeats)) / (repeats - half),
    )
    best = max(tR - t_rtt / half, 1e-9)
    nsamp = int(np.minimum(fb.n_samples, S).sum())
    msps = nsamp / best / 1e6
    par = ""
    if check_parity:
        w, a = variants[0]
        rp = RiceParams(rss=a[2], kmod=a[3], init_history=a[4], mult=a[5], kmask=a[6])
        err, endp = rice_decode(w, a[0], a[1], rp, S)
        ref = lpc_decode(err, a[1], LpcParams(order=a[7], quant=a[8], rc=a[9], rss=a[2]), S)
        out0, end0 = fused_rice_lpc(w, *a, S, max_order=max_order)
        ok = bool(jnp.array_equal(out0, ref).item()) and bool(
            jnp.array_equal(end0, endp).item())
        par = f" parity={'OK' if ok else 'FAIL'}"
    print(f"{kind}: {msps:.1f} Msps/chan-pass best={best*1e3:.2f}ms "
          f"maxord={max_order}{par}")
    return msps


if __name__ == "__main__":
    kinds = sys.argv[1:] or ["music"]
    for k in kinds:
        bench_kind(k)
