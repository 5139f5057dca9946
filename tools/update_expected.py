#!/usr/bin/env python3
"""Regenerate tools/bench_expected.tsv from a QUIET-BOX bench run.

Usage:  python3 tools/update_expected.py [path/to/bench.json]

Reads the full-detail record graft.Bench writes to target/bench.json
(per-query best-of-runs seconds) and rewrites the committed expectation
baseline that Bench's load-window defense compares against. Run it only
from a bench run you trust (quiet box, `errors: 0`, small `retried`
list, empty `suspect` list) — a baseline captured under load would both
mask real regressions and stop the 3x-expectation trigger from firing.
"""
import json
import sys
import pathlib

src = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "target/bench.json")
rec = json.loads(src.read_text())
if rec.get("errors", 0):
    sys.exit(f"refusing: {src} records {rec['errors']} failed queries")
if rec.get("suspect"):
    sys.exit(f"refusing: {src} still flags suspects {rec['suspect']} — "
             "this run was itself contended")
dst = pathlib.Path(__file__).parent / "bench_expected.tsv"
# SF-sectioned like the byte table (r14): a baseline regenerated from a
# non-sf0.1 run must never silently apply to the driver's sf0.1 bench
# (10-50x too-small lines flag the whole registry; inflated lines mute
# every trigger). graft.Bench only consults the section whose
# '# sf <basename>' header matches the benched dir; this script rewrites
# ONLY the run's section and preserves the others.
sf_base = pathlib.PurePath(rec["sf"]).name

kept_sections = {}
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
for name, secs in sorted(rec["queries"].items()):
    if secs >= 0:
        new_section.append(f"{name}\t{secs:.3f}")
kept_sections[sf_base] = new_section

lines = ["# Quiet-box per-query expected seconds (best-of-runs)."]
lines.append("# Regenerate a section with tools/update_expected.py from a "
             "trusted target/bench.json;")
lines.append("# graft.Bench retries any query reading >= 3x its line here.")
lines.append("# Each '# sf <basename>' header opens that SF's section.")
for sf in sorted(kept_sections):
    lines.append(f"# sf {sf}")
    lines.extend(kept_sections[sf])
dst.write_text("\n".join(lines) + "\n")
print(f"wrote {dst}: section sf {sf_base} ({len(new_section)} queries); "
      f"sections now: {', '.join(sorted(kept_sections))}")
