"""On-hardware validation: compiled Pallas kernel vs XLA path + throughput.

Run on a machine with a TPU attached (the CPU test suite covers the same
kernel via the Pallas interpreter):

    python scripts/tpu_check.py [--batch 4096] [--frame-samples 4096]

Prints parity verdicts and per-pass throughput.
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from alacnet_tpu.bench_lib import make_corpus_frames  # noqa: E402
from alacnet_tpu.codec.framemeta_vec import parse_frame_headers_vec  # noqa: E402
from alacnet_tpu.ops.lpc import LpcParams, lpc_decode  # noqa: E402
from alacnet_tpu.ops.pallas.rice_lpc import fused_rice_lpc  # noqa: E402
from alacnet_tpu.ops.rice import RiceParams, rice_decode  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--frame-samples", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()
    S, B = args.frame_samples, args.batch
    distinct, params = make_corpus_frames(num_distinct=32, frame_samples=S)
    payloads = [distinct[i % 32] for i in range(B)]
    fb = parse_frame_headers_vec(payloads, params)
    words = jnp.asarray(fb.words)
    a = [
        jnp.asarray(x)
        for x in (
            fb.entropy_pos, fb.n_samples, fb.rss, fb.kmod, fb.init_history,
            fb.rice_mult[:, 0], fb.kmask, fb.order[:, 0], fb.quant[:, 0],
            fb.rc[:, 0],
        )
    ]
    jax.block_until_ready(words)
    jax.block_until_ready(a)
    orders = fb.order[fb.order != 31]
    mo = int(orders.max()) if orders.size else 0

    t0 = time.time()
    out, end = fused_rice_lpc(words, *a, S, max_order=mo)
    jnp.sum(out).item()
    print(f"compile+first run: {time.time() - t0:.1f}s")
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        out, end = fused_rice_lpc(words, *a, S, max_order=mo)
        jnp.sum(out).item()
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"fused channel pass: {best * 1e3:.1f} ms -> "
        f"{B * S / best / 1e6:.0f} Msamples/s"
    )

    rp = RiceParams(rss=a[2], kmod=a[3], init_history=a[4], mult=a[5], kmask=a[6])
    err, endp = rice_decode(words, a[0], a[1], rp, S)
    ref = lpc_decode(err, a[1], LpcParams(order=a[7], quant=a[8], rc=a[9], rss=a[2]), S)
    ok_out = np.array_equal(np.asarray(out), np.asarray(ref))
    ok_end = np.array_equal(np.asarray(end), np.asarray(endp))
    print(f"parity vs XLA path: out={ok_out} endpos={ok_end}")
    return 0 if (ok_out and ok_end) else 1


if __name__ == "__main__":
    raise SystemExit(main())
