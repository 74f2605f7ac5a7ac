"""Regenerate README.md's benchmark table from the latest BENCH_r0N.json.

Published numbers must equal the driver artifact (VERDICT r2 weak #4:
hand-copied interactive-run numbers drifted from the recorded bench in
both directions).  This script is the only way the README table and the
headline throughput line change.

It also snapshots the exact record it published into
``BENCH_published.json``; ``tests/test_readme_bench.py`` enforces, at
every HEAD, that (a) the README block is byte-identical to what this
script would regenerate from that snapshot and (b) the snapshot is the
HIGHEST-numbered ``BENCH_r*.json`` with values that still match it —
so the regen-then-driver-refresh sequence that shipped drifted numbers
in rounds 2 and 4 (VERDICT r4 weak #2) fails the suite instead of
shipping.

Usage: python scripts/gen_readme_bench.py [BENCH_rNN.json]
(defaults to the highest-numbered BENCH_r*.json in the repo root).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]

BEGIN = "<!-- bench-table:begin (scripts/gen_readme_bench.py) -->"
END = "<!-- bench-table:end -->"
PUBLISHED = "BENCH_published.json"


def latest_artifact() -> pathlib.Path:
    arts = sorted(ROOT.glob("BENCH_r*.json"))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifact in repo root")
    return arts[-1]


def load_bench() -> tuple[dict, str]:
    if len(sys.argv) > 1:
        path = pathlib.Path(sys.argv[1])
    else:
        path = latest_artifact()
    rec = json.loads(path.read_text())
    return rec.get("parsed", rec), path.name


def fmt_x(msps: float) -> str:
    rt = msps * 1e6 / 44100.0
    return f"{rt:,.0f}"


def build_block(p: dict, src: str) -> str:
    """The full marker-delimited README block for parsed record ``p``
    published from artifact name ``src`` — pure, so the enforcement
    test regenerates it byte-for-byte from BENCH_published.json."""
    kinds = p["device_msps_by_kind"]
    pipe = p["value"]
    rows = [
        ("device decode, 16-bit stereo music (order-6 FIR)",
         f"**{kinds['music']:.0f} Msamples/s/chip ({fmt_x(kinds['music'])}× realtime)**"),
        ("device decode, 24-bit/96 kHz (extra-bits)",
         f"{kinds['hires24']:.0f} Msamples/s/chip"),
        ("device decode, escape-heavy / zero-run / mixed-order",
         f"{kinds['spiky']:.0f} / {kinds['silence']:.0f} / {kinds['orders']:.0f} Msamples/s/chip"),
        ("device decode, worst-case 24-bit noise (~30 KB frames)",
         f"{kinds['fat24']:.0f} Msamples/s/chip"),
        ("device decode, harmonic mean across all six corpus kinds",
         f"{p['device_msps_harmonic_mean']:.0f} Msamples/s/chip"),
        ("sustained pipeline (host parse+pack ‖ device decode, mixed corpus)",
         f"**{pipe:.0f} Msamples/s/chip ({fmt_x(pipe)}× realtime)**"),
    ]
    if p.get("e2e_measured_overlap_msps") is not None and p.get(
        "overlap_resolved", True
    ):
        # Only a genuinely resolved measurement earns the "measured"
        # label (ADVICE r4): when the relay swamps the wall the field is
        # null in the artifact (older artifacts instead carry the
        # bound-clamped echo plus overlap_resolved=false) and the row
        # states that instead.
        rows.append((
            "measured overlapped wall (host thread ‖ device, RTT-corrected)",
            f"{p['e2e_measured_overlap_msps']:.0f} Msamples/s/chip",
        ))
    elif p.get("overlap_resident_resolved"):
        rows.append((
            "measured overlapped wall (resident-blob mode: host replans ‖ "
            f"device decodes ×{p.get('overlap_resident_passes', '?')})",
            f"{p['overlap_resident_msps']:.0f} Msamples/s/chip",
        ))
    elif "e2e_measured_overlap_msps" in p:
        rows.append((
            "measured overlapped wall (host thread ‖ device, RTT-corrected)",
            "unresolved over the dev relay (H2D swamps the wall; "
            "`overlap_resolved: false` in the artifact)",
        ))
    if "encode_msps" in p:
        rows.append((
            "ENCODE pipeline (prep ‖ device emit ‖ native pack, slowest stage)",
            f"{p['encode_msps']:.0f} Msamples/s/chip",
        ))
        rows.append((
            "ENCODE device stage (forward FIR + Rice emitter)",
            f"{p['encode_device_msps']:.0f} Msamples/s/chip",
        ))
    rows.append((
        "vs. 1000×-realtime north star (BASELINE.md)",
        f"**{kinds['music'] / 88.2:.1f}× device / {pipe / 88.2:.1f}× pipeline**",
    ))
    table = "\n".join(
        ["| metric | value |", "|---|---|"]
        + [f"| {k} | {v} |" for k, v in rows]
    )
    return (
        f"{BEGIN}\n"
        f"Source of truth: `{src}` (driver-recorded; regenerate with "
        f"`python scripts/gen_readme_bench.py`).\n\n{table}\n{END}"
    )


def apply_headlines(text: str, p: dict) -> str:
    """Rewrite the intro headline sentences to match the artifact."""
    kinds = p["device_msps_by_kind"]
    pipe = p["value"]
    text = re.sub(
        r"\*\*~?\d[\d,.]* Msamples/s \([\d,]+× realtime\)\*\* device",
        f"**~{kinds['music']:.0f} Msamples/s ({fmt_x(kinds['music'])}× realtime)** device",
        text,
    )
    return re.sub(
        r"sustaining ~\d[\d,.]* Msamples/s \(~?[\d.]+× the",
        f"sustaining ~{pipe:.0f} Msamples/s (~{pipe / 88.2:.1f}× the",
        text,
    )


def main() -> None:
    p, src = load_bench()
    block = build_block(p, src)

    readme = ROOT / "README.md"
    text = readme.read_text()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if pat.search(text):
        text = pat.sub(block, text)
    else:
        raise SystemExit(
            "README.md has no bench-table markers; add them around the table"
        )
    text = apply_headlines(text, p)
    readme.write_text(text)
    (ROOT / PUBLISHED).write_text(
        json.dumps({"source": src, "parsed": p}, indent=2) + "\n"
    )
    print(f"README.md bench table regenerated from {src}; "
          f"snapshot written to {PUBLISHED}")


if __name__ == "__main__":
    main()
