"""Generate DuckDB SQL oracles for the seeded ANN shortlists:
q_embed_ann_ivf, q_embed_ann_ivf_index (identical results by the LlmSpec
index-parity pin), and q_embed_ann_pq.

The oracle replays the ENTIRE deterministic quantizer pipeline IN SQL —
no data-dependent literals, so the committed statement stays valid if
the testdata is ever regenerated (it was, in round 7):

  1. trainSample: md5(CAST(vec_id AS VARCHAR))-ordered well-formed
     vectors, LIMIT 2048 (Similarity.trainSample).
  2. scala.util.Random(seed).shuffle(indices): java.util.Random's 48-bit
     LCG replayed in a recursive CTE (HUGEINT arithmetic), downward
     Fisher-Yates with the exact nextInt bound sequence INCLUDING the
     power-of-two fast path and the modulo-bias retry loop. Only the
     scrambled SEED CONSTANT (seed ^ 0x5DEECE66D, pure arithmetic on the
     fixed seeds 42..50) is precomputed here.
  3. localLloyd, 5 unrolled iterations: argmin assignment (first-min
     tie, strict <), per-cell per-dim means accumulated in SAMPLE ORDER
     via list_sum(list(v ORDER BY pos)) — the same left-fold order as
     the Scala loops, so every double is bit-identical; empty cells keep
     their previous center.
  4. IVF: corpus cell assignment, probe score ||c||^2 - 2 q.c, nprobe=4
     cells by (score, cell), exact cosine on probed candidates, top-5 by
     (cos DESC, neighbor_id).  PQ: per-subspace codebooks (seed+j),
     encode argmin, ADC as the left-assoc sum of the 8 lut lookups,
     top-5 by (adc ASC, neighbor_id).

The shortlist outputs carry ids + rank only (no floats), so the oracle
has to reproduce the RANKING; the accumulation-order pedantry keeps the
argmin/sort comparisons on identical doubles, the same discipline the
MinHash/CMS bit-replay oracles follow. This script also self-checks the
generated SQL against the Spark parquet dumps and a pure-Python replica
of the quantizer (JavaRandom/shuffle/Lloyd below).
"""
import hashlib

DIM = 64
NLIST, NPROBE, IVF_K = 16, 4, 5
M, KSUB, PQ_K = 8, 16, 5
RERANK_SHORTLIST, RERANK_K = 20, 5
SEED, TRAIN_N, ITERS = 42, 2048, 5
SUB = DIM // M
MULT, INC, MASK48 = 0x5DEECE66D, 0xB, (1 << 48) - 1


def scrambled(seed):
    return (seed ^ MULT) & MASK48


# ---------------------------------------------------------------- python
# Pure-Python replica of the Scala quantizer, used only to cross-check
# the SQL replay below (and kept as executable documentation).

class JavaRandom:
    def __init__(self, seed):
        self.seed = scrambled(seed)

    def _next(self, bits):
        self.seed = (self.seed * MULT + INC) & MASK48
        return self.seed >> (48 - bits)

    def next_int(self, bound):
        assert bound > 0
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # java: accept unless bits - val + (bound-1) overflows int32
            if bits - val + (bound - 1) < (1 << 31):
                return val


def scala_shuffle(xs, rnd):
    """scala.util.Random.shuffle (2.13): downward Fisher-Yates,
    swap(n-1, nextInt(n)) for n = len..2."""
    buf = list(xs)
    for n in range(len(buf), 1, -1):
        k = rnd.next_int(n)
        buf[n - 1], buf[k] = buf[k], buf[n - 1]
    return buf


def local_lloyd(points, k, iters, seed):
    assert points, "empty training sample"
    dim = len(points[0])
    centers = [list(points[i])
               for i in scala_shuffle(range(len(points)),
                                      JavaRandom(seed))[:k]]
    while len(centers) < k:
        centers += [list(c) for c in
                    centers[:min(k - len(centers), len(centers))]]
    for _ in range(iters):
        sums = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        for p in points:
            best, bestd = 0, float("inf")
            for c, cc in enumerate(centers):
                d = 0.0
                for i in range(dim):
                    t = p[i] - cc[i]
                    d += t * t
                if d < bestd:
                    bestd, best = d, c
            counts[best] += 1
            s = sums[best]
            for i in range(dim):
                s[i] += p[i]
        centers = [centers[c] if counts[c] == 0
                   else [sums[c][i] / counts[c] for i in range(dim)]
                   for c in range(k)]
    return centers


def train_sample(ids_vecs, n):
    rows = sorted(ids_vecs, key=lambda t: (
        hashlib.md5(str(t[0]).encode()).hexdigest(), str(t[0])))
    return [list(map(float, v)) for _, v in rows[:n]]


# ------------------------------------------------------------------- sql

def sqdist_sql(a, b, n):
    return (f"list_sum(list_transform(generate_series(1, {n}), "
            f"__i -> ({a}[__i] - {b}[__i]) * ({a}[__i] - {b}[__i])))")


def dot_sql(a, b):
    return (f"list_sum(list_transform(generate_series(1, {DIM}), "
            f"__i -> {a}[__i] * {b}[__i]))")


def common_ctes():
    """sample + the LCG shuffle recursion for all 9 seeds (sid -1 = IVF
    seed 42; sid 0..7 = PQ codebook seeds 42+j). Emits `sample` (pos, v,
    vec_id) and `perm` (sid, p BIGINT[] — the full shuffled index list,
    0-based values)."""
    seeds = ",\n    ".join(
        f"({sid}, {scrambled(s)}::HUGEINT)"
        for sid, s in [(-1, SEED)] + [(j, SEED + j) for j in range(M)])
    return [
        f"""emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {DIM}
    AND len(list_filter(embedding, __x -> __x IS NULL)) = 0)""",
        f"""sample AS MATERIALIZED (
  SELECT * FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
      CAST(vec_id AS VARCHAR)) AS pos, vec_id, v
    FROM emb)
  WHERE pos <= {TRAIN_N})""",
        "nsz AS (SELECT CAST(count(*) AS INT) AS n FROM sample)",
        f"""seeds(sid, s0) AS (SELECT * FROM (VALUES
    {seeds}) t)""",
        # One recursion step = one LCG draw. next(31) = newseed >> 17.
        # Power-of-two bound: val = (bound * bits) >> 31, always accepted;
        # otherwise val = bits % bound, rejected (no swap, bound kept)
        # when bits - val + bound - 1 >= 2^31 — java's int-overflow test.
        """shufrec AS (
  SELECT s.sid, s.s0 AS seed, n.n AS bound,
    list_transform(generate_series(0, n.n - 1), __x -> __x) AS perm
  FROM seeds s, nsz n
  UNION ALL
  SELECT sid, newseed,
    CASE WHEN accepted THEN bound - 1 ELSE bound END,
    CASE WHEN accepted THEN
      list_transform(generate_series(1, len(perm)), __i ->
        CASE WHEN __i = bound THEN perm[val + 1]
             WHEN __i = val + 1 THEN perm[bound]
             ELSE perm[__i] END)
    ELSE perm END
  FROM (
    SELECT sid, bound, perm,
      newseed, bits,
      CASE WHEN pow2 THEN CAST((CAST(bound AS HUGEINT) * bits) >> 31 AS INT)
           ELSE CAST(bits % bound AS INT) END AS val,
      (pow2 OR bits - (bits % bound) + bound - 1 < 2147483648) AS accepted
    FROM (
      SELECT sid, bound, perm,
        (seed * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT
          AS newseed,
        CAST(((seed * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT)
          >> 17 AS BIGINT) AS bits,
        bit_count(bound) = 1 AS pow2
      FROM shufrec WHERE bound >= 2) t1) t2)""",
        "perm AS MATERIALIZED (SELECT sid, perm AS p FROM shufrec WHERE bound = 1)",
    ]


def lloyd_ctes(tag, sid, k, dim, subexpr):
    """Unrolled Lloyd for one quantizer family. `subexpr(v)` maps a
    sample vector column to the trained subvector (identity for IVF).
    For PQ, sid/tag carry the subspace via a j column instead — see
    pq_lloyd_ctes. Emits cents{tag}_{ITERS} (cell, c)."""
    ctes = [f"""cents{tag}_0 AS (
  SELECT kk.k - 1 AS cell, {subexpr('s.v')} AS c
  FROM (SELECT unnest(generate_series(1, {k})) AS k) kk
  JOIN perm pm ON pm.sid = {sid}
  JOIN sample s ON s.pos = pm.p[kk.k] + 1)"""]
    for t in range(1, ITERS + 1):
        prev = f"cents{tag}_{t - 1}"
        ctes.append(f"""asg{tag}_{t} AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, {subexpr('s.v')} AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY {sqdist_sql(subexpr('s.v'), 'c.c', dim)}, c.cell) AS rn
    FROM sample s, {prev} c)
  WHERE rn = 1)""")
        ctes.append(f"""cents{tag}_{t} AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM {prev} p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, {dim}), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asg{tag}_{t} GROUP BY cell) gg) g USING (cell))""")
    return ctes


def pq_lloyd_ctes():
    """Unrolled Lloyd over all 8 subspaces at once (j = sid column).
    Emits pqcents_{ITERS} (j, cell, c)."""
    sv = f"s.v[pm.sid * {SUB} + 1 : pm.sid * {SUB} + {SUB}]"
    ctes = [f"""pqcents_0 AS (
  SELECT pm.sid AS j, kk.k - 1 AS cell, {sv} AS c
  FROM (SELECT unnest(generate_series(1, {KSUB})) AS k) kk
  JOIN perm pm ON pm.sid >= 0
  JOIN sample s ON s.pos = pm.p[kk.k] + 1)"""]
    for t in range(1, ITERS + 1):
        prev = f"pqcents_{t - 1}"
        ctes.append(f"""pqasg_{t} AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * {SUB} + 1 : c.j * {SUB} + {SUB}] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY {sqdist_sql(f's.v[c.j * {SUB} + 1 : c.j * {SUB} + {SUB}]', 'c.c', SUB)},
          c.cell) AS rn
    FROM sample s, {prev} c)
  WHERE rn = 1)""")
        ctes.append(f"""pqcents_{t} AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM {prev} p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, {SUB}), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_{t} GROUP BY j, cell) gg) g USING (j, cell))""")
    return ctes


def gen_ivf_sql():
    ctes = common_ctes()
    ctes += lloyd_ctes("ivf", -1, NLIST, DIM, lambda v: v)
    cents = f"centsivf_{ITERS}"
    ctes += [
        # ||c||^2: the Scala inline regime computes it driver-side as the
        # sequential sum of squares — same fold, same double
        f"""cents AS MATERIALIZED (
  SELECT cell, c,
    list_sum(list_transform(c, __x -> __x * __x)) AS c2
  FROM {cents})""",
        f"""cdist AS MATERIALIZED (
  SELECT e.vec_id, ct.cell, {sqdist_sql('e.v', 'ct.c', DIM)} AS d
  FROM emb e, cents ct)""",
        """assigned AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM cdist)
  WHERE rn = 1)""",
        f"""qscore AS (
  SELECT q.vec_id AS query_id, ct.cell,
    ct.c2 - 2.0 * list_sum(list_transform(generate_series(1, {DIM}),
      __i -> q.v[__i] * ct.c[__i])) AS d
  FROM emb q, cents ct
  WHERE q.vec_id < 10)""",
        f"""probe AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
      row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
    FROM qscore)
  WHERE rn <= {NPROBE})""",
        # exact verify in Spark's own op order and precision: cosine =
        # dot/(sqrt(aa)*sqrt(bb)) over the DOUBLE vectors with ascending
        # left-fold sums, 0.0 on zero norms (DuckDB's
        # list_cosine_similarity computes in FLOAT on raw embeddings and
        # yields NaN on zero norms — both would diverge from Spark)
        f"""scored AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nn = 0 THEN 0.0 ELSE ab / nn END AS cos
  FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
      {dot_sql('cq.v', 'cn.v')} AS ab,
      sqrt({dot_sql('cq.v', 'cq.v')}) * sqrt({dot_sql('cn.v', 'cn.v')})
        AS nn
    FROM probe p
    JOIN assigned a USING (cell)
    JOIN emb cq ON cq.vec_id = p.query_id
    JOIN emb cn ON cn.vec_id = a.vec_id
    WHERE a.vec_id <> p.query_id) t)""",
    ]
    final = f"""SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
  neighbor_id
FROM scored
QUALIFY rank <= {IVF_K}
ORDER BY query_id, rank"""
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + final


def pq_scored_ctes():
    """Shared PQ pipeline through the per-candidate ADC CTE `scored`
    (query_id, neighbor_id, adc) — the base of both the raw shortlist
    (q_embed_ann_pq) and the exact-cosine rerank."""
    ctes = common_ctes()
    ctes += pq_lloyd_ctes()
    lut_cols = ", ".join(
        f"max(CASE WHEN j = {j} THEN lut END) AS l{j}" for j in range(M))
    code_cols = ", ".join(
        f"max(CASE WHEN j = {j} THEN code END) AS c{j}" for j in range(M))
    adc = "l0[c0 + 1]"
    for j in range(1, M):
        adc = f"({adc} + l{j}[c{j} + 1])"
    ctes += [
        f"""subv AS MATERIALIZED (
  SELECT e.vec_id, js.j, e.v[js.j * {SUB} + 1 : js.j * {SUB} + {SUB}] AS sv
  FROM emb e, (SELECT unnest(generate_series(0, {M - 1})) AS j) js)""",
        f"""sdist AS MATERIALIZED (
  SELECT s.vec_id, s.j, cb.cell AS k, {sqdist_sql('s.sv', 'cb.c', SUB)} AS d
  FROM subv s JOIN pqcents_{ITERS} cb ON cb.j = s.j)""",
        f"""codes AS MATERIALIZED (
  SELECT vec_id, {code_cols} FROM (
    SELECT vec_id, j, k AS code FROM (
      SELECT vec_id, j, k,
        row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      FROM sdist)
    WHERE rn = 1)
  GROUP BY vec_id)""",
        f"""qlut AS MATERIALIZED (
  SELECT vec_id, {lut_cols} FROM (
    SELECT vec_id, j, list(d ORDER BY k) AS lut
    FROM sdist WHERE vec_id < 10 GROUP BY vec_id, j)
  GROUP BY vec_id)""",
        f"""scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {adc} AS adc
  FROM qlut q, codes n
  WHERE n.vec_id <> q.vec_id)""",
    ]
    return ctes


def gen_pq_sql():
    ctes = pq_scored_ctes()
    final = f"""SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY adc ASC, neighbor_id) AS BIGINT) AS rank,
  neighbor_id
FROM scored
QUALIFY rank <= {PQ_K}
ORDER BY query_id, rank"""
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + final


def gen_pq_rerank_sql():
    """pqTopKReranked: ADC shortlist of RERANK_SHORTLIST (same ranking
    as the raw query, larger k), then EXACT cosine over only those rows
    in Spark's own op order and precision — dot/(sqrt(aa)*sqrt(bb)) on
    the DOUBLE vectors with ascending left-fold sums, 0.0 on zero norms
    (the IVF oracle's `scored` discipline) — top-RERANK_K by
    (cos DESC, neighbor_id)."""
    ctes = pq_scored_ctes()
    ctes += [
        f"""short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
        ORDER BY adc ASC, neighbor_id) AS rn
    FROM scored)
  WHERE rn <= {RERANK_SHORTLIST})""",
        f"""rescored AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nn = 0 THEN 0.0 ELSE ab / nn END AS cos
  FROM (
    SELECT s.query_id, s.neighbor_id,
      {dot_sql('cq.v', 'cn.v')} AS ab,
      sqrt({dot_sql('cq.v', 'cq.v')}) * sqrt({dot_sql('cn.v', 'cn.v')})
        AS nn
    FROM short s
    JOIN emb cq ON cq.vec_id = s.query_id
    JOIN emb cn ON cn.vec_id = s.neighbor_id) t)""",
    ]
    final = f"""SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
  neighbor_id
FROM rescored
QUALIFY rank <= {RERANK_K}
ORDER BY query_id, rank"""
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + final


def main():
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    ivf_sql = gen_ivf_sql()
    pq_sql = gen_pq_sql()
    pq_rerank_sql = gen_pq_rerank_sql()
    open("/tmp/ann_ivf_oracle.sql", "w").write(ivf_sql)
    open("/tmp/ann_pq_oracle.sql", "w").write(pq_sql)
    open("/tmp/ann_pq_rerank_oracle.sql", "w").write(pq_rerank_sql)
    print("sql chars: ivf", len(ivf_sql), "pq", len(pq_sql),
          "pq_rerank", len(pq_rerank_sql))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'/root/testdata/{sf}/embeddings.parquet'")
    # cross-check 1: the SQL shuffle/Lloyd replay against the pure-Python
    # replica (centroid doubles must be bit-identical)
    corpus = con.execute(
        f"SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT "
        f"NULL AND len(embedding) = {DIM} AND "
        f"len(list_filter(embedding, x -> x IS NULL)) = 0").fetchall()
    sample = train_sample(corpus, TRAIN_N)
    py_centers = local_lloyd(sample, NLIST, ITERS, SEED)
    sql_centers = con.execute(
        "WITH RECURSIVE " + ",\n".join(
            common_ctes() + lloyd_ctes("ivf", -1, NLIST, DIM, lambda v: v))
        + f"\nSELECT cell, c FROM centsivf_{ITERS} ORDER BY cell").fetchall()
    ok = all(list(map(float, sql_centers[i][1])) == py_centers[i]
             for i in range(NLIST))
    print("centroid bit-parity (sql vs python):", "OK" if ok else "FAIL")

    for name, sql in [("q_embed_ann_ivf", ivf_sql),
                      ("q_embed_ann_ivf_index", ivf_sql),
                      ("q_embed_ann_pq", pq_sql),
                      ("q_embed_ann_pq_rerank", pq_rerank_sql)]:
        t0 = time.time()
        got = con.execute(sql).df()
        try:
            exp = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"{name}: no spark dump ({e})")
            continue
        g = sorted(map(tuple, got.values.tolist()))
        e = sorted(map(tuple, exp.values.tolist()))
        print(f"{name}: {'MATCH' if g == e else 'MISMATCH'} "
              f"({len(g)} duck vs {len(e)} spark, {time.time() - t0:.1f}s)")
        if g != e:
            print("  only duck:", [x for x in g if x not in e][:6])
            print("  only spark:", [x for x in e if x not in g][:6])


if __name__ == "__main__":
    main()
