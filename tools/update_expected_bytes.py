#!/usr/bin/env python3
"""Regenerate one SF section of tools/bench_bytes_expected.tsv.

Usage:  python3 tools/update_expected_bytes.py [path/to/bench.json]

Reads the full-detail record graft.Bench writes to target/bench.json
(per-query WARM-run shuffle write bytes + records, plus the run's "sf")
and rewrites ONLY the matching "# sf <basename>" section of the
committed shuffle baseline that Bench's shape-drift detection compares
against; other SFs' sections are preserved verbatim (r14 — the table is
multi-section so the correctness-gate SF, sf0.01, carries its own lines
alongside sf0.1's). Shuffle RECORDS are exact for a fixed corpus+plan
(bytes wiggle slightly with serialization context), so unlike
bench_expected.tsv this does NOT need a quiet box — but it does need
the run to be error-free.
"""
import json
import pathlib
import sys

src = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "target/bench.json")
rec = json.loads(src.read_text())
if rec.get("errors", 0):
    sys.exit(f"refusing: {src} records {rec['errors']} failed queries")
bytes_map = rec.get("bytes")
rows_map = rec.get("shuffle_rows")
if not bytes_map or not rows_map:
    sys.exit(f"refusing: {src} has no per-query shuffle totals — rerun "
             "graft.Bench")
sf_base = pathlib.PurePath(rec["sf"]).name
dst = pathlib.Path(__file__).parent / "bench_bytes_expected.tsv"

HEADER = [
    "# Per-query WARM-run shuffle write bytes and records",
    "# (records are exact for a fixed corpus+plan; bytes wiggle with",
    "# serialization context). Regenerate a section with",
    "# tools/update_expected_bytes.py from a trusted error-free",
    "# target/bench.json; graft.Bench flags any query whose records move",
    "# >20% (or bytes >35%) off its line here as shape_drift. Each",
    "# '# sf <basename>' header opens that SF's section; only the",
    "# benched SF's section applies.",
]

# Preserve every OTHER SF's section from the current file.
kept_sections = {}  # sf -> [lines]
if dst.exists():
    cur = None
    for raw in dst.read_text().splitlines():
        line = raw.strip()
        if line.startswith("# sf "):
            cur = line[len("# sf "):].strip()
            kept_sections.setdefault(cur, [])
        elif line and not line.startswith("#") and cur is not None:
            kept_sections[cur].append(raw)

new_section = []
for name in sorted(bytes_map):
    b, r = bytes_map[name], rows_map.get(name, -1)
    if b >= 0 and r >= 0:
        new_section.append(f"{name}\t{int(b)}\t{int(r)}")
kept_sections[sf_base] = new_section

out = list(HEADER)
for sf in sorted(kept_sections):
    out.append(f"# sf {sf}")
    out.extend(kept_sections[sf])
dst.write_text("\n".join(out) + "\n")
print(f"wrote {dst}: section sf {sf_base} ({len(new_section)} queries); "
      f"sections now: {', '.join(sorted(kept_sections))}")
