"""Generate the DuckDB SQL oracle for q_dedup_incremental.

Same XXH64/Murmur3 signature replay as q_dedup_minhash
(gen_minhash_oracle.common_ctes); the tail is the NEW-vs-CORPUS bucket
join instead of the within-corpus self-join: new docs are doc_id % 10 = 0,
the corpus is the rest, candidates are cross-side band-bucket matches,
and exact shingle Jaccard >= 0.8 verifies. minhashLshNewVsCorpus applies
no hot-bucket cap (the bucket join is new x corpus, not a self-explode),
so neither does the oracle.
"""
from gen_minhash_oracle import common_ctes


def gen_sql(threshold=0.8):
    ctes = common_ctes()
    ctes.append("""cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM buckets a JOIN buckets b USING (band, key)
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)""")
    ctes.append("""verify AS (
  SELECT c.new_id, c.corpus_id,
    CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) AS inter,
    CAST(len(a.shl) AS DOUBLE) + CAST(len(b.shl) AS DOUBLE) AS sz
  FROM cand c
  JOIN sh a ON a.doc_id = c.new_id
  JOIN sh b ON b.doc_id = c.corpus_id)""")
    final = f"""SELECT new_id, corpus_id
FROM verify
WHERE (CASE WHEN sz - inter = 0 THEN 0.0 ELSE inter / (sz - inter) END)
  >= {threshold}
ORDER BY new_id, corpus_id"""
    return "WITH " + ",\n".join(ctes) + "\n" + final


if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sql = gen_sql()
    open("/tmp/incremental_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'/root/testdata/{sf}/documents.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    print(f"duckdb rows: {len(got)} in {time.time()-t0:.1f}s")
    exp = pd.read_parquet(f'{out}/q_dedup_incremental')
    e = sorted(map(tuple, exp.values.tolist()))
    g = sorted(map(tuple, got.values.tolist()))
    print("MATCH" if g == e else
          f"MISMATCH ({len(g)} duck vs {len(e)} spark)\n"
          f"only duck: {[x for x in g if x not in e][:4]}\n"
          f"only spark: {[x for x in e if x not in g][:4]}")
