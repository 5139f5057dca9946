"""Generate the DuckDB SQL oracle for q_similarity_ingest.

Replays the ENTIRE 3-batch exactly-once gate sequentially in one
statement, the q_embedding_ingest treatment applied to the text gate:

  batch b = doc_id % 3.
  batch 0 (bootstrap): FIRST the intra-batch saturation pass — a window
    occurrence counts as duplicated if a smaller-id doc in the same
    batch owns the same gram (min-id = "already corpus"); docs >= 50%
    covered quarantine as substring_dup. Survivors then MinHash
    self-dedup (the q_dedup_minhash bit-replay machinery, capped
    buckets, jac >= 0.8), min-label connected components, component
    non-representatives quarantine as near_dup.
  batches 1, 2: near-dup gate = bucket join vs accepted-so-far with
    exact-Jaccard verify (no bucket cap — cross join, not self-explode);
    saturation gate = 8-token windows already present in the accepted
    corpus's window set OR owned by a smaller-id doc of the SAME batch
    (combined coverage >= 50%; near_dup outranks substring_dup);
    survivors then self-dedup within the batch (same CC as bootstrap).

The Spark side compares 8-token windows by xxhash64; the oracle compares
the gram STRINGS — equality is identical absent a 64-bit collision, the
same equivalence the substring-dedup oracles rely on. The mid-stream
compactIndexes fold is verdict-invariant (StreamingSpec proves it), so
the replay doesn't model it.
"""
from gen_minhash_oracle import common_ctes

K = 8              # windowK
RATIO = 0.5        # maxDupWindowRatio
THRESH = 0.8       # MinHash jaccard threshold
CAP = 2000         # self-join hot-bucket cap


def self_dedup(tag, member_cte):
    """CTEs for the within-batch self-dedup: capped bucket pair gen over
    `member_cte` (one doc_id column), exact-Jaccard verify, min-label CC.
    Emits acc_{tag} (accepted doc_ids) and loser_{tag} (quarantined)."""
    return [
        f"""g_{tag} AS (
  SELECT band, key, list_sort(list(bk.doc_id)) AS ids
  FROM buckets bk JOIN {member_cte} m ON bk.doc_id = m.doc_id
  GROUP BY band, key
  HAVING count(*) > 1 AND count(*) <= {CAP})""",
        f"""p_{tag} AS (
  SELECT DISTINCT pr.id_a, pr.id_b FROM (
    SELECT unnest(flatten(list_transform(ids, (x, i) ->
      list_transform(ids[i+1:], y ->
        struct_pack(id_a := x, id_b := y))))) AS pr
    FROM g_{tag}) t
  JOIN sh a ON a.doc_id = pr.id_a
  JOIN sh b ON b.doc_id = pr.id_b
  WHERE CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) /
    (len(a.shl) + len(b.shl) - len(list_intersect(a.shl, b.shl)))
    >= {THRESH})""",
        f"""e_{tag} AS (SELECT id_a AS src, id_b AS dst FROM p_{tag}
  UNION SELECT id_b, id_a FROM p_{tag})""",
        f"""r_{tag} AS (SELECT src AS id, dst AS reach FROM e_{tag}
  UNION SELECT r.id, e.dst FROM r_{tag} r JOIN e_{tag} e ON r.reach = e.src)""",
        f"""loser_{tag} AS (
  SELECT id AS doc_id FROM (
    SELECT id, least(id, min(reach)) AS comp FROM r_{tag} GROUP BY id)
  WHERE id <> comp)""",
        f"""acc_{tag} AS (
  SELECT m.doc_id FROM {member_cte} m
  WHERE m.doc_id NOT IN (SELECT doc_id FROM loser_{tag}))""",
    ]


def steady_batch(b, prev_acc):
    """CTEs for steady-state batch `b` probing `prev_acc` (accepted so
    far). Emits acc_b{b} plus quarantine parts q_near_b{b}, q_sat_b{b},
    q_intra_b{b}."""
    tag = f"b{b}"
    ctes = [
        f"""near_{tag} AS (
  SELECT DISTINCT a.doc_id
  FROM buckets a JOIN buckets c USING (band, key)
  JOIN batches ba ON ba.doc_id = a.doc_id AND ba.b = {b}
  JOIN {prev_acc} p ON p.doc_id = c.doc_id
  JOIN sh x ON x.doc_id = a.doc_id
  JOIN sh y ON y.doc_id = c.doc_id
  WHERE CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE) /
    (len(x.shl) + len(y.shl) - len(list_intersect(x.shl, y.shl)))
    >= {THRESH})""",
        f"""grams_{tag} AS (
  SELECT DISTINCT w.gram FROM wins w JOIN {prev_acc} p USING (doc_id))""",
        f"""own_{tag} AS (
  SELECT w.gram, min(w.doc_id) AS min_owner
  FROM wins w JOIN batches ba ON ba.doc_id = w.doc_id AND ba.b = {b}
  GROUP BY w.gram)""",
        f"""sat_{tag} AS (
  SELECT w.doc_id FROM wins w
  JOIN batches ba ON ba.doc_id = w.doc_id AND ba.b = {b}
  JOIN own_{tag} o ON o.gram = w.gram
  LEFT JOIN grams_{tag} g ON g.gram = w.gram
  GROUP BY w.doc_id
  HAVING count(*) > 0 AND
    CAST(count(CASE WHEN g.gram IS NOT NULL
                     OR o.min_owner < w.doc_id THEN 1 END) AS DOUBLE)
      >= count(*) * {RATIO})""",
        f"""bad_{tag} AS (
  SELECT doc_id, 'near_dup' AS status FROM near_{tag}
  UNION ALL
  SELECT doc_id, 'substring_dup' FROM sat_{tag}
  WHERE doc_id NOT IN (SELECT doc_id FROM near_{tag}))""",
        f"""a0_{tag} AS (
  SELECT ba.doc_id FROM batches ba
  WHERE ba.b = {b}
    AND ba.doc_id NOT IN (SELECT doc_id FROM bad_{tag}))""",
    ] + self_dedup(tag, f"a0_{tag}")
    return ctes


def gen_sql():
    ctes = common_ctes()
    # DuckDB inlines (re-evaluates) CTEs per reference unless told
    # otherwise; this replay references `buckets` (the full XXH64/Murmur3
    # signature chain) and `sh` from every batch stage, so materialize
    # the expensive multi-referenced prefixes once.
    forced = {"docs", "sh", "shex", "allsh", "sigs", "bandkeys", "buckets",
              "wins", "batches", "acc01"}
    for t in ("b0", "b1", "b2"):
        forced |= {f"{p}_{t}" for p in
                   ("m", "g", "p", "e", "loser", "acc", "bad", "a0",
                    "near", "grams", "own", "sat")}

    def _mat(c):
        return (c.replace(" AS (", " AS MATERIALIZED (", 1)
                if c.split(" AS ", 1)[0].strip() in forced else c)
    ctes.append("batches AS (SELECT doc_id, doc_id % 3 AS b FROM documents)")
    # 8-token windows of every doc (docs shorter than K tokens have none);
    # doc token lists come from the shared `docs` CTE (tk)
    ctes.append(f"""wins AS (
  SELECT doc_id, i AS pos, array_to_string(tk[i:i+{K - 1}], ' ') AS gram
  FROM docs, LATERAL (SELECT unnest(generate_series(1, len(tk) - {K - 1}))
    AS i) t
  WHERE len(tk) >= {K})""")
    # batch 0: intra-batch saturation first (min-id window coverage, no
    # corpus yet), then bootstrap self-dedup over the survivors
    ctes.append("""own_b0 AS (
  SELECT w.gram, min(w.doc_id) AS min_owner
  FROM wins w JOIN batches ba ON ba.doc_id = w.doc_id AND ba.b = 0
  GROUP BY w.gram)""")
    ctes.append(f"""sat_b0 AS (
  SELECT w.doc_id FROM wins w
  JOIN batches ba ON ba.doc_id = w.doc_id AND ba.b = 0
  JOIN own_b0 o ON o.gram = w.gram
  GROUP BY w.doc_id
  HAVING count(*) > 0 AND
    CAST(count(CASE WHEN o.min_owner < w.doc_id THEN 1 END) AS DOUBLE)
      >= count(*) * {RATIO})""")
    ctes.append("""m_b0 AS (SELECT doc_id FROM batches WHERE b = 0
  AND doc_id NOT IN (SELECT doc_id FROM sat_b0))""")
    ctes.extend(self_dedup("b0", "m_b0"))
    # batch 1 probes acc_b0; batch 2 probes acc_b0 ∪ acc_b1
    ctes.extend(steady_batch(1, "acc_b0"))
    ctes.append("""acc01 AS (
  SELECT doc_id FROM acc_b0 UNION ALL SELECT doc_id FROM acc_b1)""")
    ctes.extend(steady_batch(2, "acc01"))
    ctes = [_mat(c) for c in ctes]
    final = """SELECT doc_id, status FROM (
  SELECT doc_id, 'accepted' AS status FROM acc_b0
  UNION ALL SELECT doc_id, 'accepted' FROM acc_b1
  UNION ALL SELECT doc_id, 'accepted' FROM acc_b2
  UNION ALL SELECT doc_id, 'substring_dup' FROM sat_b0
  UNION ALL SELECT doc_id, 'near_dup' FROM loser_b0
  UNION ALL SELECT doc_id, status FROM bad_b1
  UNION ALL SELECT doc_id, 'near_dup' FROM loser_b1
  UNION ALL SELECT doc_id, status FROM bad_b2
  UNION ALL SELECT doc_id, 'near_dup' FROM loser_b2)
ORDER BY doc_id"""
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + final


if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sql = gen_sql()
    open("/tmp/ingest_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'/root/testdata/{sf}/documents.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    print(f"duckdb rows: {len(got)} in {time.time()-t0:.1f}s")
    exp = pd.read_parquet(f'{out}/q_similarity_ingest')
    e = sorted(map(tuple, exp.values.tolist()))
    g = sorted(map(tuple, got.values.tolist()))
    print("MATCH" if g == e else
          f"MISMATCH ({len(g)} duck vs {len(e)} spark)\n"
          f"only duck: {[x for x in g if x not in e][:6]}\n"
          f"only spark: {[x for x in e if x not in g][:6]}")
