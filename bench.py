"""Driver benchmark: prints one JSON line with the headline decode metric.

Headline metric: sustained end-to-end pipeline throughput through
``decode_blob`` — native C++ header parse + H2D + fused device decode,
host stage overlapped with device decode, mixed corpus
(music / escape-heavy / zero-run / mixed-order+partial frames), 4096
frames in flight per dispatch (BASELINE.json).  Per-kind device-stage
numbers ride along in ``device_msps_by_kind``.  vs_baseline is the ratio
to the 1000x-realtime north star (88.2 Msamples/s/chip) — the reference
publishes no numbers (BASELINE.md).
"""

import json

from alacnet_tpu.bench_lib import relay_reachable


def main() -> None:
    if not relay_reachable():
        print(json.dumps({
            "metric": "sustained pipeline decode (UNAVAILABLE: axon relay "
                      "terminal down — TCP connect refused)",
            "value": 0,
            "unit": "Msamples/s/chip",
            "vs_baseline": 0,
            "error": "relay_down",
        }))
        raise SystemExit(1)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from alacnet_tpu.bench_lib import run_full_benchmark

    result = run_full_benchmark(repeats=3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
