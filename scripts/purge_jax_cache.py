"""Remove corrupt entries from a JAX persistent compilation cache.

A process killed mid-write (e.g. `timeout` SIGTERM during a TPU run)
can leave a truncated cache file, and JAX does not validate entries on
read — this script does: every file that fails a full zstd decompress
is deleted.

History: written while chasing the 2026-08-20 CPU-suite segfaults, which
turned out NOT to be cache corruption (all entries validated clean both
times) but a jaxlib bug in CPU-backend executable (de)serialization of
one large Pallas-interpreter executable — see tests/conftest.py, which
now disables the persistent cache for the CPU suite.  Kept as a hygiene
tool for the TPU cache, where truncated writes from timed-out runs
remain possible.

Usage: python scripts/purge_jax_cache.py [cache_dir ...]
       (default: /root/.cache/jax_comp /root/.cache/jax_comp_cpu)
"""

from __future__ import annotations

import sys
from pathlib import Path

import zstandard


def purge(cache_dir: Path) -> tuple[int, int]:
    ok = bad = 0
    if not cache_dir.is_dir():
        return 0, 0
    dctx = zstandard.ZstdDecompressor()
    for f in sorted(cache_dir.iterdir()):
        if not f.is_file():
            continue
        try:
            raw = f.read_bytes()
            # JAX >=0.4.26 frames the payload; decompress_stream accepts
            # both framed and raw streams and fails on truncation.
            for _ in dctx.read_to_iter(raw):
                pass
            ok += 1
        except (zstandard.ZstdError, OSError) as e:
            print(f"purging corrupt entry {f.name}: {e}")
            f.unlink(missing_ok=True)
            bad += 1
    return ok, bad


def main() -> int:
    dirs = [Path(a) for a in sys.argv[1:]] or [
        Path("/root/.cache/jax_comp"),
        Path("/root/.cache/jax_comp_cpu"),
    ]
    total_bad = 0
    for d in dirs:
        ok, bad = purge(d)
        total_bad += bad
        print(f"{d}: {ok} ok, {bad} purged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
