"""Generate the DuckDB SQL oracle for q_profile_table_approx.

Bit-replays Spark's HyperLogLog++ (`approx_count_distinct`, default
rsd 0.05 -> p=9, m=512) for the five profiled lineitem columns, against
the decompiled spark-catalyst 4.1.2 bytecode
(HyperLogLogPlusPlusHelper.update/query/estimateBias):

  hash   = XxHash64(value, seed 42), per input type: BIGINT ->
           hashLong(v); DOUBLE -> hashLong(doubleToLongBits(normalized));
           TIMESTAMP -> hashLong(epoch micros); VARCHAR -> the same
           byte-stream XXH64 the MinHash oracle replays. The IEEE-754
           double encoding is exact SQL arithmetic: e = corrected
           floor(log2 v), mantissa = (v/2^e - 1) * 2^52 (both exact —
           power-of-two scaling never rounds).
  update = register[hash >>> (64-p)] max= nlz((hash << p) | 1<<(p-1)) + 1
           (nlz via corrected floor-log2 on HUGEINT).
  query  = zInverse = sum over ALL m registers IN INDEX ORDER of 1/2^M[j]
           (left fold, FP-order-faithful: zeros contribute interleaved
           1.0 terms); V = #zero registers; E = alphaM2/zInverse;
           if V>0: H = m*ln(m/V); use H when (p<19 AND H<=threshold(p))
           OR E <= 2.5m; else E' = E - bias(E) when p<19 AND E < 5m.
           bias(E) = mean of the K=6 BIAS_DATA entries at the window the
           while-loop slides to (replayed with a recursive CTE);
           round = floor(x + 0.5), java Math.round.

The empirical p=9 tables (THRESHOLDS / RAW_ESTIMATE_DATA / BIAS_DATA,
201 entries) and alphaM2 are read from the REAL JVM via a reflection
probe compiled on the fly — constants of the algorithm, not of the data.
The five columns at the two SFs exercise all three estimator regimes:
linear counting (l_returnflag 3, l_quantity 50), bias-corrected
(l_shipdate ~2.4k), and raw-above-5m (l_orderkey, l_extendedprice).

Residual engine dependence, accepted: H = m*Math.log(m/V) uses HotSpot's
log intrinsic vs DuckDB's libm log — a last-ulp difference only matters
if an estimate sits within one ulp of the 400.0 threshold or a .5
rounding boundary (never observed; the MATCH check would catch it).
"""
import subprocess, tempfile, os

SEED = 42
P = 9
M = 1 << P

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def MUL(a, c):
    clo = c % (1 << 32)
    return (f"((({a}) % 4294967296 * {c} + "
            f"(({a}) // 4294967296) * {clo} % 4294967296 * 4294967296) "
            f"% 18446744073709551616)")


def MULX(a, b):
    """full 64x64 -> low 64 for two column operands."""
    return (f"((({a}) % 4294967296 * ({b}) + "
            f"(({a}) // 4294967296) * (({b}) % 4294967296) "
            f"% 4294967296 * 4294967296) % 18446744073709551616)")


def ROTL(x, r):
    return (f"((({x}) * {1 << r} % 18446744073709551616) + "
            f"(({x}) // {1 << (64 - r)}))")


def ADD(a, b):
    return f"((({a}) + ({b})) % 18446744073709551616)"


def XOR(a, b):
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def SHR(x, r):
    return f"(({x}) // {1 << r})"


def fmix(prefix, inp):
    """emit_layers-ready 5-step avalanche ending in alias `prefix`."""
    return [
        [(f"{prefix}_f1", XOR(inp, SHR(inp, 33)))],
        [(f"{prefix}_f2", MUL(f"{prefix}_f1", P2))],
        [(f"{prefix}_f3", XOR(f"{prefix}_f2", SHR(f"{prefix}_f2", 29)))],
        [(f"{prefix}_f4", MUL(f"{prefix}_f3", P3))],
        [(prefix, XOR(f"{prefix}_f4", SHR(f"{prefix}_f4", 32)))],
    ]


def emit_layers(name, base, ranks):
    ctes = []
    prev = base
    for i, layer in enumerate(ranks):
        cols = ", ".join(f"{e} AS {n}" for n, e in layer)
        label = name if i == len(ranks) - 1 else f"{name}_{i}"
        ctes.append(f"{label} AS (\n  SELECT *, {cols}\n  FROM {prev})")
        prev = label
    return ctes


# ---- xxh64 of one 8-byte (long) input, column `x` holding the value
# mod 2^64 as HUGEINT.  hash = fmix(rotl(h0 ^ (rotl(x*P2,31)*P1), 27)
#                                   * P1 + P4),  h0 = seed + P5 + 8
def long_hash_ranks():
    h0 = (SEED + P5 + 8) & M64
    return [
        [("k1a", MUL("x", P2))],
        [("k1", MUL(ROTL("k1a", 31), P1))],
        [("hmix", ADD(MUL(ROTL(XOR(str(h0), "k1"), 27), P1), P4))],
    ] + fmix("h", "hmix")


# ---- xxh64 of a byte string in column `s` (n = strlen, nst = n // 32,
# w8 = little-endian 8-byte words) — the MinHash oracle's replay shape.
def string_hash_ranks():
    lane_step = MUL(ROTL(ADD("a", MULX("w", P2)), 31), P1)
    lanes = []
    for li, init in enumerate([(SEED + P1 + P2) & M64, (SEED + P2) & M64,
                               SEED, (SEED - P1) & M64]):
        lanes.append((f"v{li + 1}",
            f"list_reduce(list_prepend(CAST({init} AS HUGEINT), "
            f"list_transform(generate_series(1, nst), t -> w8[4*t - {3 - li}])), "
            f"(a, w) -> {lane_step})"))
    word_step = ADD(MUL(ROTL(XOR("a", MUL(ROTL(MULX("w", P2), 31), P1)), 27),
                        P1), P4)
    byte4 = ("(CAST(ascii(s[8*(n//8)+1]) AS HUGEINT)"
             " + 256*ascii(s[8*(n//8)+2]) + 65536*ascii(s[8*(n//8)+3])"
             " + 16777216*ascii(s[8*(n//8)+4]))")
    return [
        lanes,
        [("mg0", ADD(ADD(ROTL("v1", 1), ROTL("v2", 7)),
                     ADD(ROTL("v3", 12), ROTL("v4", 18))))],
        [("mg1", ADD(MUL(XOR("mg0", MUL(ROTL(MUL("v1", P2), 31), P1)), P1), P4))],
        [("mg2", ADD(MUL(XOR("mg1", MUL(ROTL(MUL("v2", P2), 31), P1)), P1), P4))],
        [("mg3", ADD(MUL(XOR("mg2", MUL(ROTL(MUL("v3", P2), 31), P1)), P1), P4))],
        [("mg4", ADD(MUL(XOR("mg3", MUL(ROTL(MUL("v4", P2), 31), P1)), P1), P4))],
        [("hst", f"CASE WHEN n >= 32 THEN mg4 "
                 f"ELSE CAST({(SEED + P5) & M64} AS HUGEINT) END")],
        [("hlen", ADD("hst", "n"))],
        [("hw", f"list_reduce(list_prepend(hlen, w8[4*nst + 1 :]), "
                f"(a, w) -> {word_step})")],
        [("h4", f"CASE WHEN n % 8 >= 4 THEN "
                f"{ADD(MUL(ROTL(XOR('hw', MULX(byte4, P1)), 23), P2), P3)} "
                f"ELSE hw END")],
        [("htail",
          f"list_reduce(list_prepend(h4, "
          f"list_transform(generate_series(8*(n//8) + 4*((n%8)//4) + 1, n), "
          f"i -> CAST(ascii(s[i]) AS HUGEINT))), "
          f"(a, w) -> {MUL(ROTL(XOR('a', MULX('w', P5)), 11), P1)})")],
    ] + fmix("h", "htail")


# ---- IEEE-754 bits of a DOUBLE column `v` (normalized: -0.0 -> 0.0,
# canonical NaN), result `x` as HUGEINT mod 2^64
IEEE_BITS = """
  SELECT *,
    CASE
      WHEN v = 0 THEN CAST(0 AS HUGEINT)
      WHEN isnan(v) THEN CAST(9221120237041090560 AS HUGEINT)
      WHEN isinf(v) AND v > 0 THEN CAST(9218868437227405312 AS HUGEINT)
      WHEN isinf(v) THEN CAST(18442240474082181120 AS HUGEINT)
      ELSE CAST(CASE WHEN v < 0 THEN 9223372036854775808 ELSE 0 END
                AS HUGEINT)
           + CASE WHEN ee < -1022
               THEN CAST(abs(v) / power(2.0, -1074) AS HUGEINT)
               ELSE CAST(ee + 1023 AS HUGEINT) * (CAST(1 AS HUGEINT) << 52)
                    + CAST((abs(v) / power(2.0, ee) - 1.0)
                           * power(2.0, 52) AS HUGEINT)
             END
    END AS x
  FROM (
    SELECT *, CASE WHEN abs(v) >= 2 * power(2.0, e0) THEN e0 + 1
                   WHEN abs(v) < power(2.0, e0) THEN e0 - 1
                   ELSE e0 END AS ee
    FROM (SELECT *, CASE WHEN v = 0 OR isnan(v) OR isinf(v) THEN 0
                         ELSE CAST(floor(log2(abs(v))) AS INT) END AS e0
          FROM {src}) t0) t1"""


def register_ctes(tag, hash_cte):
    """registers + zero-interleaved term list + V for one column. The
    rank uses a corrected floor-log2 so the HUGEINT->DOUBLE rounding at
    power-of-two boundaries cannot shift the leading-zero count."""
    return [
        f"""reg_{tag} AS (
  SELECT idx, max(rank) AS mr FROM (
    SELECT CAST(h // (CAST(1 AS HUGEINT) << {64 - P}) AS INT) AS idx,
      64 - (CASE WHEN w >= (CAST(1 AS HUGEINT) << least(g0 + 1, 63))
                   AND g0 < 63 THEN g0 + 1
                 WHEN w < (CAST(1 AS HUGEINT) << g0) THEN g0 - 1
                 ELSE g0 END) AS rank
    FROM (
      SELECT h, w, CAST(floor(log2(CAST(w AS DOUBLE))) AS INT) AS g0
      FROM (SELECT h, (h % (CAST(1 AS HUGEINT) << {64 - P}))
                      * {1 << P} + {1 << (P - 1)} AS w
            FROM {hash_cte}) tw) tg) tr
  GROUP BY idx)""",
        f"""est_{tag} AS (
  SELECT list_sum(list(1.0 / (CAST(1 AS HUGEINT) << mr0) ORDER BY j))
           AS zinv,
         CAST(sum(CASE WHEN mr0 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS v
  FROM (
    SELECT js.j, COALESCE(r.mr, 0) AS mr0
    FROM (SELECT unnest(generate_series(0, {M - 1})) AS j) js
    LEFT JOIN reg_{tag} r ON r.idx = js.j) tz)""",
    ]


def estimate_sql(tag, consts):
    """Scalar estimate for one column from est_{tag}, with the bias
    window walk as a recursive CTE."""
    alpha_m2, threshold, raw, bias = consts
    raw_lit = "[" + ", ".join(raw) + "]"
    bias_lit = "[" + ", ".join(bias) + "]"
    k = 6
    return [
        f"""e_{tag} AS (
  SELECT {alpha_m2} / zinv AS e, v,
    CASE WHEN v > 0 THEN {M}.0 * ln({M}.0 / v) ELSE 0.0 END AS h
  FROM est_{tag})""",
        # bias window: i = #raw entries < e (binarySearch insertion /
        # found index — the raw data is strictly increasing);
        # low = max(i-K+1, 0), high = min(low+K, len); slide while the
        # entering distance beats the leaving one (strict)
        f"""bw0_{tag} AS (
  SELECT e, v, h,
    greatest(len(list_filter({raw_lit}, r -> r < e)) - {k - 1}, 0) AS low
  FROM e_{tag})""",
        f"""bwr_{tag} AS (
  SELECT e, v, h, low, least(low + {k}, {len(raw)}) AS high
  FROM bw0_{tag}
  UNION ALL
  SELECT e, v, h, low + 1, high + 1
  FROM bwr_{tag}
  WHERE high < {len(raw)}
    AND ({raw_lit}[high + 1] - e) * ({raw_lit}[high + 1] - e)
      < ({raw_lit}[low + 1] - e) * ({raw_lit}[low + 1] - e))""",
        f"""bw_{tag} AS (
  SELECT e, v, h, low, high FROM bwr_{tag}
  ORDER BY low DESC LIMIT 1)""",
        f"""fin_{tag} AS (
  SELECT CAST(floor(est + 0.5) AS BIGINT) AS nd FROM (
    SELECT CASE
      WHEN v > 0 AND (h <= {threshold} OR e <= {2.5 * M}) THEN h
      WHEN e < {5.0 * M} THEN e -
        list_sum(list_slice({bias_lit}, low + 1, high)) / (high - low)
      ELSE e END AS est
    FROM bw_{tag}) tf)""",
    ]


JAVA_PROBE = """import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper;
import java.lang.reflect.Field;
public class HllConst {
  public static void main(String[] args) throws Exception {
    HyperLogLogPlusPlusHelper h = new HyperLogLogPlusPlusHelper(0.05);
    Field fp = h.getClass().getDeclaredField(
      "org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$p");
    fp.setAccessible(true);
    int p = fp.getInt(h);
    Field f = h.getClass().getDeclaredField("alphaM2");
    f.setAccessible(true);
    System.out.println("p=" + p);
    System.out.println("K=" + HyperLogLogPlusPlusHelper.K());
    System.out.println("alphaM2=" + Double.toString(f.getDouble(h)));
    System.out.println("threshold=" + Double.toString(
      HyperLogLogPlusPlusHelper.THRESHOLDS()[p - 4]));
    StringBuilder sb = new StringBuilder("raw=");
    double[] raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA()[p - 4];
    for (int i = 0; i < raw.length; i++) {
      if (i > 0) sb.append(",");
      sb.append(Double.toString(raw[i]));
    }
    System.out.println(sb);
    sb = new StringBuilder("bias=");
    double[] bias = HyperLogLogPlusPlusHelper.BIAS_DATA()[p - 4];
    for (int i = 0; i < bias.length; i++) {
      if (i > 0) sb.append(",");
      sb.append(Double.toString(bias[i]));
    }
    System.out.println(sb);
  }
}
"""


def jvm_constants():
    d = tempfile.mkdtemp(prefix="graft_hll")
    open(os.path.join(d, "HllConst.java"), "w").write(JAVA_PROBE)
    subprocess.run(["javac", "-cp", "/opt/spark/jars/*", "HllConst.java"],
                   check=True, cwd=d)
    out = subprocess.run(["java", "-cp", "/opt/spark/jars/*:.", "HllConst"],
                         check=True, capture_output=True, text=True, cwd=d)
    vals = dict(line.split("=", 1) for line in out.stdout.strip().split("\n"))
    assert int(vals["p"]) == P and int(vals["K"]) == 6
    return (vals["alphaM2"], vals["threshold"],
            vals["raw"].split(","), vals["bias"].split(","))


# (tag, column, kind) — kind drives the hash input build
COLS = [
    ("ok", "l_orderkey", "long"),
    ("qt", "l_quantity", "double"),
    ("ep", "l_extendedprice", "double"),
    ("rf", "l_returnflag", "string"),
    ("sd", "l_shipdate", "timestamp"),
]


def gen_sql():
    consts = jvm_constants()
    ctes = []
    for tag, col, kind in COLS:
        if kind == "long":
            base = (f"in_{tag} AS (SELECT CASE WHEN u < 0 THEN "
                    f"CAST(u AS HUGEINT) + 18446744073709551616 "
                    f"ELSE CAST(u AS HUGEINT) END AS x FROM "
                    f"(SELECT DISTINCT {col} AS u FROM lineitem "
                    f"WHERE {col} IS NOT NULL) t)")
            ctes.append(base)
            ctes.extend(emit_layers(f"hx_{tag}", f"in_{tag}",
                                    long_hash_ranks()))
        elif kind == "timestamp":
            base = (f"in_{tag} AS (SELECT CASE WHEN u < 0 THEN "
                    f"CAST(u AS HUGEINT) + 18446744073709551616 "
                    f"ELSE CAST(u AS HUGEINT) END AS x FROM "
                    f"(SELECT DISTINCT epoch_us({col}) AS u FROM lineitem "
                    f"WHERE {col} IS NOT NULL) t)")
            ctes.append(base)
            ctes.extend(emit_layers(f"hx_{tag}", f"in_{tag}",
                                    long_hash_ranks()))
        elif kind == "double":
            src = (f"(SELECT DISTINCT {col} AS v FROM lineitem "
                   f"WHERE {col} IS NOT NULL)")
            ctes.append(f"in_{tag} AS ({IEEE_BITS.format(src=src)})")
            ctes.extend(emit_layers(f"hx_{tag}", f"in_{tag}",
                                    long_hash_ranks()))
        else:  # string
            ctes.append(f"""in_{tag} AS (
  SELECT s, strlen(s) AS n, strlen(s) // 32 AS nst,
    list_transform(generate_series(1, strlen(s) // 8), j ->
      CAST(ascii(s[8*j-7]) AS HUGEINT) + 256*ascii(s[8*j-6])
        + 65536*ascii(s[8*j-5]) + 16777216*ascii(s[8*j-4])
        + 4294967296*ascii(s[8*j-3]) + 1099511627776*ascii(s[8*j-2])
        + 281474976710656*ascii(s[8*j-1])
        + 72057594037927936*ascii(s[8*j])) AS w8
  FROM (SELECT DISTINCT {col} AS s FROM lineitem
        WHERE {col} IS NOT NULL) t)""")
            ctes.extend(emit_layers(f"hx_{tag}", f"in_{tag}",
                                    string_hash_ranks()))
        ctes.extend(register_ctes(tag, f"hx_{tag}"))
        ctes.extend(estimate_sql(tag, consts))

    rows = []
    for tag, col, kind in COLS:
        if kind == "string":
            nums = ("CAST(NULL AS DOUBLE) AS min_num, "
                    "CAST(NULL AS DOUBLE) AS max_num, "
                    f"CAST(min({col}) AS VARCHAR) AS min_str, "
                    f"CAST(max({col}) AS VARCHAR) AS max_str")
        elif kind == "timestamp":
            nums = (f"CAST(epoch_us(min({col})) AS DOUBLE) AS min_num, "
                    f"CAST(epoch_us(max({col})) AS DOUBLE) AS max_num, "
                    "CAST(NULL AS VARCHAR) AS min_str, "
                    "CAST(NULL AS VARCHAR) AS max_str")
        else:
            nums = (f"CAST(min({col}) AS DOUBLE) AS min_num, "
                    f"CAST(max({col}) AS DOUBLE) AS max_num, "
                    "CAST(NULL AS VARCHAR) AS min_str, "
                    "CAST(NULL AS VARCHAR) AS max_str")
        rows.append(f"""SELECT '{col}' AS "column", count(*) AS n_rows,
  count(*) - count({col}) AS n_null,
  (SELECT nd FROM fin_{tag}) AS n_distinct,
  {nums}
FROM lineitem""")
    body = "\nUNION ALL ".join(rows)
    return ("WITH RECURSIVE " + ",\n".join(ctes) + "\n" + body +
            "\nORDER BY \"column\"")


if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sql = gen_sql()
    open("/tmp/hll_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'/root/testdata/{sf}/lineitem.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    exp = pd.read_parquet(f"{out}/q_profile_table_approx")

    def norm(df):
        return sorted(tuple(None if isinstance(x, float) and x != x else x
                            for x in row)
                      for row in df.values.tolist())
    g = norm(got)
    e = norm(exp)
    print(f"q_profile_table_approx: {'MATCH' if g == e else 'MISMATCH'} "
          f"({len(g)} rows, {time.time() - t0:.1f}s)")
    if g != e:
        for a, b in zip(g, e):
            if a != b:
                print("  duck :", a)
                print("  spark:", b)
