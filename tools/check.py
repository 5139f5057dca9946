#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Mimics the driver: for each query in oracle_sql.json, run the SQL in
DuckDB over the sf parquet tables, load the engine's parquet result,
sort columns by name, canonicalize values, and compare row count,
schema (column names), and a content hash. Rows-only queries (no
oracle entry) are checked for rows >= 0 (parquet readable).
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NA:
            return "NULL"
        if isinstance(v, float) and pd.isna(v):
            return "NULL"
        if isinstance(v, (decimal.Decimal,)):
            v = float(v)
        if isinstance(v, float):
            return format(round(v, 4), ".4f")
        if isinstance(v, (int,)):
            return str(v)
        return str(v)

    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else format(round(v, 4), ".4f"))
        elif s.dtype.kind in "iu":
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        else:
            out[c] = s.map(cell)
    cdf = pd.DataFrame(out)
    cdf = cdf.sort_values(by=list(cdf.columns)).reset_index(drop=True)
    return cdf


def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    for row in df.itertuples(index=False):
        m.update(("\x1f".join(row) + "\x1e").encode())
    return m.hexdigest()[:16]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    # a query that failed in Verify leaves NO output dir — flag it instead
    # of silently comparing a smaller set. Cross-check against the FULL
    # registry manifest when present: rows-only queries aren't in
    # oracle_sql.json, so a failed rows-only query is otherwise invisible
    # (q_sketch_merge once vanished this way).
    expected = set(oracle)
    qj = os.path.join(out_dir, "queries.json")
    if os.path.exists(qj):
        expected |= set(json.load(open(qj)))
    for name in sorted(expected - dirs):
        results[name] = {"status": "MISSING_OUTPUT"}
    # the inverse gap: a dir with no manifest entry is STALE (a renamed/
    # removed query's leftover output Verify never clears) — before this
    # it fell through to "rows-only" and counted green forever
    have_manifest = os.path.exists(qj)
    for name in sorted(dirs):
        if have_manifest and name not in expected:
            results[name] = {"status": "STALE_OUTPUT"}
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        try:
            mine = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        except Exception as e:
            results[name] = {"status": "READ_FAIL", "err": str(e)[:200]}
            continue
        if name not in oracle:
            results[name] = {"status": "rows-only", "rows": len(mine)}
            continue
        try:
            theirs = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = {"status": "ORACLE_FAIL", "err": str(e)[:200]}
            continue
        a, b = canon(mine), canon(theirs)
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_hash = ok_rows and ok_schema and h(a) == h(b)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        results[name] = {"status": status, "rows": [len(a), len(b)],
                         "schema": [list(a.columns), list(b.columns)] if not ok_schema else "ok",
                         "hash": "ok" if ok_hash else "DIFF"}
    bad = {k: v for k, v in results.items()
           if v["status"] not in ("OK", "rows-only")}
    for k in sorted(results):
        v = results[k]
        print(f"{v['status']:10s} {k} {json.dumps({kk: vv for kk, vv in v.items() if kk != 'status'})[:160]}")
    print(f"\n{len(results)} queries, {len(bad)} problems")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
