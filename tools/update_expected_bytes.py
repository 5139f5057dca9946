#!/usr/bin/env python3
"""Regenerate tools/bench_bytes_expected.tsv from a bench run.

Usage:  python3 tools/update_expected_bytes.py [path/to/bench.json]

Reads the full-detail record graft.Bench writes to target/bench.json
(per-query WARM-run shuffle write bytes + records, plus the run's "sf")
and rewrites the committed shuffle baseline that Bench's shape-drift
detection compares against. Shuffle RECORDS are exact for a fixed
corpus+plan (bytes wiggle slightly with serialization context), so
unlike bench_expected.tsv this does NOT need a quiet box — but it does
need the run to be error-free, and the table is only consulted when the
benched SF's basename matches the "# sf" header written here.
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
lines = ["# Per-query WARM-run shuffle write bytes and records"]
lines.append("# (records are exact for a fixed corpus+plan; bytes wiggle "
             "with")
lines.append("# serialization context). Regenerate with "
             "tools/update_expected_bytes.py")
lines.append("# from a trusted error-free target/bench.json; graft.Bench "
             "flags any")
lines.append("# query whose records move >20% (or bytes >35%) off its "
             "line here")
lines.append("# as shape_drift.")
lines.append(f"# sf {sf_base}")
for name in sorted(bytes_map):
    b, r = bytes_map[name], rows_map.get(name, -1)
    if b >= 0 and r >= 0:
        lines.append(f"{name}\t{int(b)}\t{int(r)}")
dst.write_text("\n".join(lines) + "\n")
print(f"wrote {dst} ({len(bytes_map)} queries at sf basename {sf_base})")
