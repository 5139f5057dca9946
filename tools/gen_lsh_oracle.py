"""Generate the DuckDB SQL oracle for q_embed_ann_lsh.

lshPairsAbove(threshold=0.4, planesPerTable=8, tables=4, seed=42) over
the embeddings table: candidates share any (table, hyperplane-sign
bucket), then exact cosine verifies. Everything is replayed honestly in
SQL EXCEPT the 4x8x64 gaussian hyperplane constants, which are a pure
function of the FIXED seed (Similarity.hyperplanes: scala.util.Random(42)
.nextGaussian() in table-major order) and are embedded as double
literals — like the scrambled LCG seed constants in gen_ann_oracle.py,
they carry no data. They cannot be reproduced in pure Python because
java.util.Random.nextGaussian goes through StrictMath.log (fdlibm),
which differs from libm in the last bit on ~3% of draws (measured), so
this script compiles a 10-line Java program with the local JDK and reads
the exact doubles from the JVM itself.

The only data-dependence is the corpus DIMENSION (headDim = modal vector
length, 64 for the synthetic embeddings at every SF): the plane
constants are per-dim. If the testdata ever changes dimension the
generator must re-run; the MATCH self-check below catches that loudly.

Bucket bits, dot products, and the verify cosine all replay Spark's
exact left-fold accumulation order (list_sum over an ascending
generate_series), so the >= threshold comparison sees identical doubles.
"""
import subprocess, tempfile, os

DIM = 64
PLANES, TABLES = 8, 4
SEED = 42
THRESHOLD = 0.4

JAVA_SRC = """import java.util.Random;
public class Gauss {
  public static void main(String[] a) {
    Random r = new Random(Long.parseLong(a[0]));
    int n = Integer.parseInt(a[1]);
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < n; i++) {
      if (i > 0) sb.append(",");
      sb.append(Double.toString(r.nextGaussian()));
    }
    System.out.println(sb);
  }
}
"""


def jvm_gaussians(seed, n):
    d = tempfile.mkdtemp(prefix="graft_gauss")
    src = os.path.join(d, "Gauss.java")
    open(src, "w").write(JAVA_SRC)
    subprocess.run(["javac", src], check=True, cwd=d)
    out = subprocess.run(["java", "-cp", d, "Gauss", str(seed), str(n)],
                         check=True, capture_output=True, text=True)
    vals = out.stdout.strip().split(",")
    assert len(vals) == n
    return vals  # keep Java's shortest-roundtrip strings verbatim


def gen_sql():
    g = jvm_gaussians(SEED, TABLES * PLANES * DIM)
    rows = []
    idx = 0
    for t in range(TABLES):
        for p in range(PLANES):
            plane = g[idx:idx + DIM]
            idx += DIM
            rows.append(f"({t}, {p}, [{', '.join(plane)}]::DOUBLE[])")
    planes_cte = ",\n    ".join(rows)
    dot = ("list_sum(list_transform(generate_series(1, %d), "
           "__i -> %s[__i] * %s[__i]))" % (DIM, "%s", "%s"))
    return f"""WITH emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {DIM}
    AND len(list_filter(embedding, __x -> __x IS NULL)) = 0),
planes(t, i, p) AS (
  SELECT * FROM (VALUES
    {planes_cte}) tt),
-- bucket per (vector, table): one sign bit per plane, packed 1 << i
buck AS MATERIALIZED (
  SELECT e.vec_id, pl.t,
    CAST(sum(CASE WHEN {dot % ('e.v', 'pl.p')} > 0
             THEN (1 << pl.i) ELSE 0 END) AS INT) AS bkt
  FROM emb e, planes pl
  GROUP BY e.vec_id, pl.t),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buck a JOIN buck b
    ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
-- exact verify, Spark's op order: cos = dot/(sqrt(aa)*sqrt(bb)), 0 on
-- zero norms, left-fold sums ascending
scored AS (
  SELECT c.id_a, c.id_b,
    {dot % ('ea.v', 'eb.v')} AS ab,
    sqrt({dot % ('ea.v', 'ea.v')}) * sqrt({dot % ('eb.v', 'eb.v')}) AS nn
  FROM cand c
  JOIN emb ea ON ea.vec_id = c.id_a
  JOIN emb eb ON eb.vec_id = c.id_b)
SELECT id_a, id_b
FROM scored
WHERE (CASE WHEN nn = 0 THEN 0.0 ELSE ab / nn END) >= {THRESHOLD}
ORDER BY id_a, id_b"""


if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sql = gen_sql()
    open("/tmp/lsh_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'/root/testdata/{sf}/embeddings.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    exp = pd.read_parquet(f"{out}/q_embed_ann_lsh")
    g = sorted(map(tuple, got.values.tolist()))
    e = sorted(map(tuple, exp.values.tolist()))
    print(f"q_embed_ann_lsh: {'MATCH' if g == e else 'MISMATCH'} "
          f"({len(g)} duck vs {len(e)} spark, {time.time() - t0:.1f}s)")
    if g != e:
        print("  only duck:", [x for x in g if x not in e][:6])
        print("  only spark:", [x for x in e if x not in g][:6])
