"""Generate DuckDB SQL oracles for q_bpe_merges and q_bpe_encode.

BPE training is greedy-sequential, so it replays as a STAGED chain of
materialized CTEs over the word-frequency table: per round, (1) adjacent
symbol-pair counts weighted by word freq, (2) the winner under
(count DESC, left, right) — DuckDB's default VARCHAR ordering is binary
UTF-8, exactly BpeTrain's utf8Compare tie-break — and (3) the greedy
left-to-right non-overlapping rewrite as a list_reduce fold (the same
pop-and-replace shape as BpeTrain.mergeExpr). Rounds are prefix-stable,
so ONE 24-round chain yields q_bpe_merges (ranks 0..23) and its
16-round prefix yields q_bpe_encode's rules: the encode oracle reads
the vocabulary's symbol state after round 16 and joins piece counts
back onto the token stream.
"""

N_MERGES = 24   # q_bpe_merges
N_ENCODE = 16   # q_bpe_encode trains 16 rules


def base_ctes():
    return [
        """words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE strlen(word) > 0 GROUP BY word)""",
        """syms0 AS MATERIALIZED (
  SELECT word, freq,
    list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM words)""",
    ]


def round_ctes(k):
    """pc{k} (pair counts), win{k} (winner), syms{k+1} (rewrite).

    The rewrite LEFT JOINs the (at most 1-row) winner: on a corpus that
    exhausts its pairs before the requested round count, win{k} is empty
    and the NULL-compare makes the fold a pass-through — the vocabulary
    survives and the merges output simply stops early, exactly like
    BpeTrain's done flag (a cross join would silently EMPTY every later
    round)."""
    return [
        f"""pc{k} AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms{k} WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r)""",
        f"""win{k} AS MATERIALIZED (
  SELECT l, r, c FROM pc{k} ORDER BY c DESC, l, r LIMIT 1)""",
        f"""syms{k + 1} AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms{k} LEFT JOIN win{k} w ON TRUE)""",
    ]


def merges_sql():
    ctes = base_ctes()
    for k in range(N_MERGES):
        ctes.extend(round_ctes(k))
    unions = "\n  UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS rank, l AS \"left\", r AS \"right\", "
        f"c AS freq FROM win{k}" for k in range(N_MERGES))
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT * FROM (\n  {unions})\nORDER BY rank")


def encode_sql():
    ctes = base_ctes()
    for k in range(N_ENCODE):
        ctes.extend(round_ctes(k))
    ctes.append(f"""pieces AS MATERIALIZED (
  SELECT word, CAST(len(syms) AS BIGINT) AS n_pieces FROM syms{N_ENCODE})""")
    ctes.append("""tokf AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE strlen(word) > 0)""")
    ctes.append("""counted AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces
  FROM tokf t JOIN pieces p USING (word) GROUP BY t.doc_id)""")
    return ("WITH " + ",\n".join(ctes) + """
SELECT d.doc_id, coalesce(c.n_words, 0) AS n_words,
  coalesce(c.n_pieces, 0) AS n_pieces
FROM documents d LEFT JOIN counted c USING (doc_id)
ORDER BY d.doc_id""")


if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'/root/testdata/{sf}/documents.parquet'")
    for name, sql in (("q_bpe_merges", merges_sql()),
                      ("q_bpe_encode", encode_sql())):
        t0 = time.time()
        got = con.execute(sql).df()
        exp = pd.read_parquet(f'{out}/{name}')
        g = sorted(map(tuple, got.values.tolist()))
        e = sorted(map(tuple, exp.values.tolist()))
        print(f"{name}: {len(got)} rows in {time.time()-t0:.1f}s -> " +
              ("MATCH" if g == e else
               f"MISMATCH\nduck: {g[:4]}\nspark: {e[:4]}"))
