"""Driver benchmark: prints one JSON line with the headline decode metric.

Metric: device decode throughput for 44.1 kHz/16-bit stereo, order-6
adaptive-FIR compressed frames, 4096 frames in flight (the BASELINE.json
flight size).  vs_baseline is the ratio to the 1000x-realtime north star
(88.2 Msamples/s/chip) — the reference publishes no numbers (BASELINE.md).
"""

import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from alacnet_tpu.bench_lib import run_benchmark  # noqa: E402


def main() -> None:
    result = run_benchmark(batch=4096, repeats=5)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
