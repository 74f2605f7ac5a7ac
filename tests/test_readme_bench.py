"""README bench table ≡ driver artifact enforcement (VERDICT r4 next #3).

Rounds 2 and 4 both shipped README throughput numbers that no longer
matched the newest ``BENCH_r*.json`` — round 2 by hand-copying, round 4
because the driver refreshed the artifact AFTER the README had been
regenerated from an interactive run of the same HEAD.  These tests make
that sequence fail the suite instead of shipping:

  * the README block must be byte-identical to what
    ``scripts/gen_readme_bench.py`` regenerates from its own
    ``BENCH_published.json`` snapshot (kills hand edits and stale
    regens), and
  * the snapshot must point at the HIGHEST-numbered ``BENCH_r*.json``
    and its published values must still agree with that artifact's
    current content within a weather band (kills the silent
    refresh-after-regen drift: a >30% move — round 4's spiky showed
    1.83x — demands either a fresh regen or an explaining commit).
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

#: Per-metric agreement band between the published snapshot and the
#: latest artifact's current content.  The in-executable slope harness
#: is designed to cancel relay weather; BENCH_r05's dispersion data
#: (VERDICT r4 next #1) is what this band is calibrated against —
#: values that move more than this between two runs of the same HEAD
#: are a regression or a harness bug, not weather, and the README must
#: not keep publishing the stale side of the move.
TOLERANCE_RATIO = 1.5


def _gen_module():
    spec = importlib.util.spec_from_file_location(
        "gen_readme_bench", ROOT / "scripts" / "gen_readme_bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _published() -> dict:
    path = ROOT / "BENCH_published.json"
    if not path.exists():
        pytest.fail(
            "BENCH_published.json missing — run "
            "`python scripts/gen_readme_bench.py` after the bench artifact "
            "lands so the README block has an enforceable source snapshot"
        )
    return json.loads(path.read_text())


def test_readme_block_matches_published_snapshot():
    gen = _gen_module()
    snap = _published()
    block = gen.build_block(snap["parsed"], snap["source"])
    readme = (ROOT / "README.md").read_text()
    pat = re.compile(re.escape(gen.BEGIN) + r".*?" + re.escape(gen.END), re.S)
    m = pat.search(readme)
    assert m, "README.md lost its bench-table markers"
    assert m.group(0) == block, (
        "README bench table differs from what gen_readme_bench.py would "
        "regenerate from BENCH_published.json — rerun "
        "`python scripts/gen_readme_bench.py` (never hand-edit the table)"
    )


def test_readme_headlines_match_published_snapshot():
    gen = _gen_module()
    snap = _published()
    readme = (ROOT / "README.md").read_text()
    assert gen.apply_headlines(readme, snap["parsed"]) == readme, (
        "README intro headline numbers differ from BENCH_published.json — "
        "rerun `python scripts/gen_readme_bench.py`"
    )


def _flat_metrics(p: dict) -> dict[str, float]:
    """The numbers the README actually publishes, flattened."""
    out = {
        "value": p["value"],
        "device_msps_harmonic_mean": p["device_msps_harmonic_mean"],
    }
    for k, v in p["device_msps_by_kind"].items():
        out[f"kind.{k}"] = v
    for k in (
        "encode_msps", "encode_device_msps", "e2e_measured_overlap_msps",
        "overlap_resident_msps",
    ):
        if p.get(k) is not None:
            out[k] = p[k]
    return out


def test_published_snapshot_is_current_artifact():
    gen = _gen_module()
    snap = _published()
    latest = gen.latest_artifact()
    assert snap["source"] == latest.name, (
        f"README was published from {snap['source']} but the newest "
        f"artifact is {latest.name} — rerun "
        "`python scripts/gen_readme_bench.py`"
    )
    rec = json.loads(latest.read_text())
    cur = _flat_metrics(rec.get("parsed", rec))
    pub = _flat_metrics(snap["parsed"])
    drifted = []
    for k, pv in pub.items():
        cv = cur.get(k)
        if cv is None or pv <= 0 or cv <= 0:
            continue
        ratio = max(pv / cv, cv / pv)
        if ratio > TOLERANCE_RATIO:
            drifted.append(f"{k}: published {pv} vs artifact {cv} ({ratio:.2f}x)")
    assert not drifted, (
        "README-published values drifted from the current artifact content "
        "(the round-4 refresh-after-regen failure): rerun "
        "`python scripts/gen_readme_bench.py` or explain the move.\n  "
        + "\n  ".join(drifted)
    )
