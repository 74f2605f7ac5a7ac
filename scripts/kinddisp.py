"""Dispersion-aware per-kind device bench (VERDICT r4 next #1).

Runs run_benchmark(kind, dispersion=N) for the requested kinds under
the CURRENT environment and prints one JSON line per kind with the
min/median/max Msps across N independent slope measurements.  Drive
kernel-default A/B arms from the shell, e.g.:

    python scripts/kinddisp.py spiky                       # HEAD defaults
    ALAC_SPREAD_CAP=16 python scripts/kinddisp.py spiky    # r3 spread cap
    ALAC_FETCH_RANGE=pair python scripts/kinddisp.py spiky # r3 fetch bound

(the kernel knobs are build-time; one arm per process.)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from alacnet_tpu.bench_lib import CORPUS_KINDS, run_benchmark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", nargs="*", default=None)
    ap.add_argument("--n", type=int, default=5, help="slope runs per kind")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    kinds = args.kinds or list(CORPUS_KINDS)
    for kind in kinds:
        r = run_benchmark(
            batch=args.batch, repeats=args.repeats, kind=kind,
            dispersion=args.n,
        )
        print(json.dumps({
            "kind": kind,
            "median_msps": r["value"],
            "dispersion": r.get("dispersion"),
            "parity_ok": r["parity_ok"],
            "fused": r["fused_kernel"],
            "backend": r["backend"],
        }), flush=True)


if __name__ == "__main__":
    main()
