"""Generate the DuckDB SQL oracles for q_sketch_merge and q_sketch_pinned.

Together these retire the last rows-only sketch adjudication
(COVERAGE.md): every estimator the two queries evaluate is bit-replayed
against decompiled bytecode, and the values compared are integers (the
estimates round to BIGINT via Math.round) or actual data values (the GK
percentile returns a sample), so double-ulp provenance only matters at
knife-edge rounding boundaries (never observed; a hit would fail the
gate loudly, same residual as tools/gen_hll_oracle.py documents).

q_sketch_merge — Apache DataSketches HLL (datasketches-java 6.2.0,
decompiled):  per-day `hll_sketch_agg(user_id)` union-merged to weeks.
The whole pipeline is ORDER-INDEPENDENT at any cardinality, which is
why the query needs no determinism pin:
  coupon  = murmur128(long, seed 9001) -> slot = h1 & (2^26-1),
            value = min(nlz(h2), 62) + 1  (BaseHllSketch.coupon)
  LIST/SET mode (distinct coupons <= 3/4 * 2^(lgK-3) = 384 for the
            default lgK=12, checked per day AND per week): estimate =
            max(cubicInterpolate(CouponMapping.xArr/yArr, n), n)
  HLL mode (any day or the week > 384 coupons): registers = max coupon
            value per slot & (2^12-1); a union result is flagged
            out-of-order, so getEstimate() = the COMPOSITE estimator
            (HllEstimators.hllCompositeEstimate): rawEst =
            (0.7213/(1+1.079/k))*k^2/KxQ, cubic over
            CompositeInterpolationXTable.xArrs[8] with yStride 160,
            bitmap/harmonic-number linear estimate below the 0.64*k
            crossover (HarmonicNumbers: exact table < 25, asymptotic
            ln(n)+gamma+1/2n-x/12+x^2/120-x^3/252+x^4/240 above)
  All interpolation-table constants are double-BITS dumped from the
  real jar via reflection (tools/gen_sketch_oracle.py Dump probe) and
  embedded as exact literals. A Python replica of the full estimator
  reproduced Spark's output exactly at both SFs before the SQL was
  written ([150,150,150,150,149] / [1488,1488,1488,1488,1478]).

q_sketch_pinned — Spark's Greenwald-Khanna `percentile_approx` is
execution-order-dependent ONLY through partial-summary merge order, so
the pinned twin runs `repartition(1).sortWithinPartitions(value)`:
one partition in sorted order makes the summary a pure function of the
multiset and the oracle replays QuantileSummaries exactly
(spark-catalyst 4.1.2 bytecode):
  insert: head buffer flushes every defaultHeadSize=50000 inserts;
          sorted input means each flush APPENDS to the sampled array
          (delta_i = floor(0.002 * i) by insertion rank, 0 for the
          first-ever and for each flush's last element), followed by
          compressImmut(T = 0.002 * count): greedy right-to-left
          merging while g_i + head.g + head.delta < T — replayed with
          prefix sums + one recursive CTE per flush cycle (group
          boundary = count of prefix sums <= S[j]+delta[j]-T).
          Up to MAX_CYCLES=4 full flushes are emitted statically
          (harmless no-ops when the data is smaller); beyond 200k
          values the oracle MISMATCHES loudly rather than silently.
  query:  targetError = max(g+delta)/2 (integer div), rank =
          ceil(0.5*n), first sample with minRank+delta-tE <= rank <=
          minRank+tE, else the last — all integer arithmetic in SQL.
  The result is an actual data value: compared bit-exactly.
  approx_count_distinct replays via the existing HLL++ machinery
  (tools/gen_hll_oracle.py, same p=9 geometry).
  Sort-equivalence assumption (verified absent from the data at all
  SFs, would surface as a loud hash mismatch): no NaN and no -0.0 in
  `value` — Spark's double ordering (java.lang.Double.compare) places
  -0.0 < 0.0 and NaN last, DuckDB's IEEE comparison ties -0.0 = 0.0.
  EQUAL doubles are harmless: deltas attach by position, so any tie
  order yields the identical (value, g, delta) sequence.

Usage: python3 tools/gen_sketch_oracle.py [sf0.01] [/tmp/verify_out]
Writes src/main/resources/oracles/q_sketch_{merge,pinned}.sql, then
validates both against DuckDB + the Spark dump (if present).
"""
import math
import os
import struct
import subprocess
import tempfile

import gen_hll_oracle as hll

HERE = os.path.dirname(os.path.abspath(__file__))
ORACLES = os.path.join(HERE, "..", "src", "main", "resources", "oracles")

LGK = 12
K = 1 << LGK
SET_PROMOTE = 384          # 4*n > 3*2^(lgK-3)  ->  n >= 385 promotes
MAX_CYCLES = 4             # static GK flush cycles (50k rows each)
HEAD = 50000
REL_ERR = 1.0 / 1000       # percentile_approx(value, 0.5, 1000)
C2E = 2.0 * REL_ERR        # Java computes 2.0*relativeError first

# ---------------------------------------------------------------- JVM dump
DUMP_JAVA = """import java.lang.reflect.Field;
public class SketchConst {
  static String bits(double[] a) {
    StringBuilder s = new StringBuilder();
    for (int i = 0; i < a.length; i++) {
      if (i > 0) s.append(",");
      s.append(Long.toString(Double.doubleToRawLongBits(a[i])));
    }
    return s.toString();
  }
  public static void main(String[] x) throws Exception {
    Class<?> cm = Class.forName("org.apache.datasketches.hll.CouponMapping");
    Field f = cm.getDeclaredField("xArr"); f.setAccessible(true);
    System.out.println("cmx=" + bits((double[]) f.get(null)));
    f = cm.getDeclaredField("yArr"); f.setAccessible(true);
    System.out.println("cmy=" + bits((double[]) f.get(null)));
    Class<?> xt = Class.forName(
      "org.apache.datasketches.hll.CompositeInterpolationXTable");
    f = xt.getDeclaredField("xArrs"); f.setAccessible(true);
    System.out.println("xt=" + bits(((double[][]) f.get(null))[12 - 4]));
    f = xt.getDeclaredField("yStrides"); f.setAccessible(true);
    System.out.println("ystride=" + ((int[]) f.get(null))[12 - 4]);
    Class<?> h = Class.forName("org.apache.datasketches.hll.HarmonicNumbers");
    f = h.getDeclaredField("tableOfExactHarmonicNumbers");
    f.setAccessible(true);
    System.out.println("harm=" + bits((double[]) f.get(null)));
  }
}
"""


def ds_constants():
    d = tempfile.mkdtemp(prefix="graft_sketch")
    open(os.path.join(d, "SketchConst.java"), "w").write(DUMP_JAVA)
    subprocess.run(["javac", "-cp", "/opt/spark/jars/*", "SketchConst.java"],
                   check=True, cwd=d)
    out = subprocess.run(["java", "-cp", "/opt/spark/jars/*:.",
                          "SketchConst"],
                         check=True, capture_output=True, text=True, cwd=d)
    vals = dict(line.split("=", 1) for line in out.stdout.strip().split("\n"))

    def doubles(key):
        return [bits_to_double(int(b)) for b in vals[key].split(",")]
    assert int(vals["ystride"]) == 160
    return (doubles("cmx"), doubles("cmy"), doubles("xt"), 160.0,
            doubles("harm"))


def bits_to_double(b):
    return struct.unpack("<d", struct.pack("<q",
                                           b if b < 2 ** 63 else b - 2 ** 64))[0]


def dlit(x):
    """Round-trip exact double literal. The CAST is load-bearing: DuckDB
    parses plain decimal literals as DECIMAL, and a DECIMAL×DECIMAL
    product of two large table constants overflows DECIMAL(18); casting
    to DOUBLE recovers the exact original bits (repr is the shortest
    round-trip decimal)."""
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(x)
    return f"CAST({x!r} AS DOUBLE)"


def dlist(xs):
    return "[" + ", ".join(dlit(x) for x in xs) + "]"


# ------------------------------------------------------- murmur128 (long)
# DataSketches MurmurHash3 x64-128 of one long, seed 9001; emitted in the
# layered-CTE shape gen_hll_oracle uses for XXH64. Input column `x`
# (HUGEINT, the long mod 2^64); outputs h1, h2.
C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F
F1 = 0xFF51AFD7ED558CCD
F2 = 0xC4CEB9FE1A85EC53
SEED = 9001


def mfmix(prefix, inp):
    return [
        [(f"{prefix}_a", hll.XOR(inp, hll.SHR(inp, 33)))],
        [(f"{prefix}_b", hll.MUL(f"{prefix}_a", F1))],
        [(f"{prefix}_c", hll.XOR(f"{prefix}_b", hll.SHR(f"{prefix}_b", 33)))],
        [(f"{prefix}_d", hll.MUL(f"{prefix}_c", F2))],
        [(prefix, hll.XOR(f"{prefix}_d", hll.SHR(f"{prefix}_d", 33)))],
    ]


def murmur_ranks():
    # mixK1(x) = rotl(x*C1, 31) * C2 ; h1 = seed ^ mixK1 ; h2 = seed
    # (mixK2(0) = 0); both ^= len(8); h1 += h2; h2 += h1; fmix both;
    # h1 += h2; h2 += h1.
    return [
        [("mk1", hll.MUL(hll.ROTL(hll.MUL("x", C1), 31), C2))],
        [("p1", hll.XOR(hll.XOR(str(SEED), "mk1"), "8")),
         ("p2", hll.XOR(str(SEED), "8"))],
        [("q1", hll.ADD("p1", "p2"))],
        [("q2", hll.ADD("p2", "q1"))],
    ] + mfmix("r1", "q1") + mfmix("r2", "q2") + [
        [("h1", hll.ADD("r1", "r2"))],
        [("h2", hll.ADD("r2", hll.ADD("r1", "r2")))],
    ]


# nlz of a HUGEINT in [0, 2^64) via the corrected floor-log2 (same
# correction gen_hll_oracle.register_ctes uses: the DOUBLE cast can
# round across a power of two).
NLZ = """CASE WHEN {v} = 0 THEN 64 ELSE 63 -
  (CASE WHEN {v} >= (CAST(1 AS HUGEINT) << least(g0_{t} + 1, 63))
          AND g0_{t} < 63 THEN g0_{t} + 1
        WHEN {v} < (CAST(1 AS HUGEINT) << g0_{t}) THEN g0_{t} - 1
        ELSE g0_{t} END) END"""


def coupon_ctes():
    """CTEs from distinct user ids to per-user coupon (slot, value,
    slot12)."""
    ctes = [
        "mu AS (SELECT DISTINCT user_id AS u FROM events "
        "WHERE user_id IS NOT NULL)",
        "min0 AS (SELECT u, CASE WHEN u < 0 THEN CAST(u AS HUGEINT) + "
        "18446744073709551616 ELSE CAST(u AS HUGEINT) END AS x FROM mu)",
    ]
    ctes.extend(hll.emit_layers("mh", "min0", murmur_ranks()))
    nlz = NLZ.format(v="h2", t="cp")
    ctes.append(f"""cpn AS (
  SELECT u,
    CAST(h1 % 67108864 AS BIGINT) AS slot,
    least({nlz}, 62) + 1 AS val,
    CAST(h1 % 4096 AS BIGINT) AS slot12
  FROM (SELECT u, h1, h2,
          CASE WHEN h2 = 0 THEN 0
               ELSE CAST(floor(log2(CAST(h2 AS DOUBLE))) AS INT)
          END AS g0_cp
        FROM mh) t)""")
    return ctes


# ------------------------------------------------ cubic interpolation SQL
def cubic_expr(x0, y0, x1, y1, x2, y2, x3, y3, x):
    """The decompiled CubicInterpolation.cubicInterpolate op order."""
    return (f"(({y0}) * ((({x})-({x1})) * (({x})-({x2})) * (({x})-({x3})))"
            f" / ((({x0})-({x1})) * (({x0})-({x2})) * (({x0})-({x3})))"
            f" + ({y1}) * ((({x})-({x0})) * (({x})-({x2})) * (({x})-({x3})))"
            f" / ((({x1})-({x0})) * (({x1})-({x2})) * (({x1})-({x3})))"
            f" + ({y2}) * ((({x})-({x0})) * (({x})-({x1})) * (({x})-({x3})))"
            f" / ((({x2})-({x0})) * (({x2})-({x1})) * (({x2})-({x3})))"
            f" + ({y3}) * ((({x})-({x0})) * (({x})-({x1})) * (({x})-({x2})))"
            f" / ((({x3})-({x0})) * (({x3})-({x1})) * (({x3})-({x2}))))")


def straddle_off(xlist_name, x, n):
    """offset of the 4-point window: findStraddle i (last index with
    x_i <= x; x < x_last guaranteed by caller), then 0 / i-1 / n-2-2."""
    i = f"(len(list_filter({xlist_name}, e -> e <= ({x}))) - 1)"
    return (f"CASE WHEN {i} = 0 THEN 0 "
            f"WHEN {i} = {n - 2} THEN {n - 4} "
            f"ELSE {i} - 1 END")


def cubic_xy_sql(xname, yname, x, n, tag):
    """max-structured SELECT expression: cubic over x/y lists (handles
    the x == x_last exact-hit case)."""
    off = f"off_{tag}"
    xi = lambda k: f"{xname}[{off} + {k + 1}]"
    yi = lambda k: f"{yname}[{off} + {k + 1}]"
    return (f"CASE WHEN ({x}) = {xname}[{n}] THEN {yname}[{n}] ELSE "
            + cubic_expr(xi(0), yi(0), xi(1), yi(1), xi(2), yi(2),
                         xi(3), yi(3), x)
            + " END"), off, straddle_off(xname, x, n)


# ------------------------------------------------------------ merge oracle
def gen_merge_sql(cmx, cmy, xt, ystride, harm):
    # Java computes ((coeff * k) * k) / kxq; fold the constant prefix in
    # the identical IEEE order (Python floats ARE IEEE doubles).
    c0 = 0.7213 / (1.0 + 1.079 / K)
    raw_coeff = (c0 * K) * K
    over_factor = (ystride * (len(xt) - 1)) / xt[-1]
    ln_all_hit = K * math.log(K / 0.5)
    crossover = 0.64 * K

    harm_lit = dlist(harm)
    # H(n): exact table below 25, asymptotic series above (bytecode
    # op order: s = ln(x)+g+1/(2x); p=1/x^2; s-=p/12; p*=1/x^2;
    # s+=p*1/120; p*=...; s-=p*1/252; p*=...; s+=p*1/240)
    def harmonic(n):
        x = f"CAST({n} AS DOUBLE)"
        inv = f"(1.0 / ({x} * {x}))"
        return (f"CASE WHEN {n} < 25 THEN {harm_lit}[{n} + 1] ELSE "
                f"((((ln({x}) + {dlit(0.5772156649015329)} + "
                f"1.0 / (2.0 * {x})) "
                f"- {inv} * {dlit(0.08333333333333333)}) "
                f"+ ({inv} * {inv}) * {dlit(0.008333333333333333)} "
                f"- ({inv} * {inv} * {inv}) * {dlit(0.003968253968253968)}) "
                f"+ ({inv} * {inv} * {inv} * {inv}) * "
                f"{dlit(0.004166666666666667)}) END")

    cubic_cm, cm_off_name, cm_off_expr = cubic_xy_sql(
        "cm_x", "cm_y", "CAST(n_cp AS DOUBLE)", len(cmx), "cm")
    # composite: y values are yStride * index (0-based), via the same
    # 4-point window
    off = "off_xt"
    xi = lambda k: f"xt_x[{off} + {k + 1}]"
    yi = lambda k: f"({dlit(ystride)} * ({off} + {k}))"
    cubic_xt = cubic_expr(xi(0), yi(0), xi(1), yi(1), xi(2), yi(2),
                          xi(3), yi(3), "raw")

    coupon_cte_sql = ",\n".join(coupon_ctes())
    return f"""WITH
consts AS (SELECT {dlist(cmx)} AS cm_x, {dlist(cmy)} AS cm_y,
                  {dlist(xt)} AS xt_x),
ev AS MATERIALIZED (SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS dy,
              user_id AS u
       FROM events WHERE user_id IS NOT NULL),
{coupon_cte_sql},
wkcp AS MATERIALIZED (SELECT DISTINCT e.wk, c.slot, c.val
         FROM (SELECT DISTINCT wk, u FROM ev) e JOIN cpn c ON c.u = e.u),
wkn AS (SELECT wk, count(*) AS n_cp FROM wkcp GROUP BY wk),
dyn AS (SELECT wk, max(n_cp) AS max_day FROM (
          SELECT e.wk, e.dy, count(DISTINCT c.slot * 64 + c.val) AS n_cp
          FROM (SELECT DISTINCT wk, dy, u FROM ev) e
          JOIN cpn c ON c.u = e.u GROUP BY e.wk, e.dy) t GROUP BY wk),
ndays AS (SELECT wk, count(DISTINCT dy) AS n_days FROM ev GROUP BY wk),
regs AS (SELECT wk, slot % 4096 AS slot12, max(val) AS r
         FROM wkcp GROUP BY wk, slot % 4096),
kxq AS (SELECT wk, CAST({K} - count(*) AS DOUBLE)
                   + sum(power(2.0, -r)) AS kxq,
               count(*) AS nz
        FROM regs GROUP BY wk),
raws AS (SELECT wk, {dlit(raw_coeff)} / kxq AS raw, nz FROM kxq),
comp AS (SELECT r.wk,
  CASE
    WHEN raw < xt_x[1] THEN 0.0
    WHEN raw > xt_x[{len(xt)}] THEN raw * {dlit(over_factor)}
    ELSE (
      SELECT CASE
        WHEN adj > {dlit(3.0 * K)} THEN adj
        WHEN (adj + lin) / 2.0 > {dlit(crossover)} THEN adj
        ELSE lin END
      FROM (SELECT adj,
              CASE WHEN nz2 = {K} THEN {dlit(ln_all_hit)}
                   ELSE CAST({K} AS DOUBLE)
                        * ({harmonic(K)} - {harmonic(f"({K} - nz2)")})
              END AS lin
            FROM (SELECT CASE WHEN raw = xt_x[{len(xt)}]
                              THEN {dlit(ystride * (len(xt) - 1))}
                              ELSE {cubic_xt} END AS adj,
                         r.nz AS nz2
                  FROM (SELECT {straddle_off('xt_x', 'raw', len(xt))}
                          AS {off}) o) a) b)
  END AS est
  FROM raws r, consts),
coup AS (SELECT w.wk,
  (SELECT greatest({cubic_cm}, CAST(n_cp AS DOUBLE))
   FROM (SELECT {cm_off_expr} AS {cm_off_name}) o) AS est
  FROM wkn w, consts),
est AS (SELECT w.wk,
  CASE WHEN w.n_cp > {SET_PROMOTE} OR d.max_day > {SET_PROMOTE}
       THEN (SELECT est FROM comp c WHERE c.wk = w.wk)
       ELSE (SELECT est FROM coup c WHERE c.wk = w.wk) END AS est
  FROM wkn w JOIN dyn d ON d.wk = w.wk)
SELECT e.wk AS week,
  CAST(floor(e.est + 0.5) AS BIGINT) AS approx_weekly_users,
  CAST(n.n_days AS BIGINT) AS n_days
FROM est e JOIN ndays n ON n.wk = e.wk
ORDER BY week"""


# ----------------------------------------------------------- pinned oracle
def gk_cycle(c):
    """One full-flush cycle c (rows (c-1)*HEAD+1 .. c*HEAD): append the
    slice to the prior samples, then compressImmut with
    T = (2*relErr) * (c*HEAD). Emits CTE `samp_{c}` with columns
    (idx, v, g, d) — idx 0-based in sampled order. A no-op passthrough
    when the data has fewer than c*HEAD rows."""
    lo = (c - 1) * HEAD
    t_val = C2E * (c * HEAD)  # Python doubles == Java doubles
    first_delta_zero = "TRUE" if c == 1 else "FALSE"
    return f"""mrg_{c} AS MATERIALIZED (
  -- merged = prior sampled ++ slice (input globally sorted, so every
  -- old sample value <= every new value and the while-loop drains the
  -- old array at the first new element)
  SELECT * FROM samp_{c - 1}
  UNION ALL
  SELECT (SELECT count(*) FROM samp_{c - 1}) + rn - {lo + 1} AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = {lo + 1} AND {first_delta_zero} THEN 0
         WHEN rn = {lo + HEAD} THEN 0
         ELSE CAST(floor({dlit(C2E)} * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > {lo} AND rn <= {lo + HEAD}
    AND (SELECT n FROM nn) >= {lo + HEAD}),
cmp_{c} AS ({compress_sql(f"mrg_{c}", dlit(t_val))}),
samp_{c} AS MATERIALIZED (
  SELECT * FROM (SELECT * FROM cmp_{c}
                 WHERE (SELECT n FROM nn) >= {lo + HEAD}
                 UNION ALL
                 SELECT * FROM samp_{c - 1}
                 WHERE (SELECT n FROM nn) < {lo + HEAD}) t)"""


def compress_sql(src, t_lit):
    """compressImmut over CTE `src`(idx, v, g, d) -> rows (idx, v, g, d)
    re-indexed. Greedy right-to-left grouping: a group's representative
    is its RIGHTMOST element (value + delta kept, g summed); element 0
    always survives unmerged (sorted input makes the head-prepend
    condition vacuous).

    Absorbing i into the group ending at j requires
    (double)(S[j]-S[i-1]+d[j]) < T; S is strictly increasing (g >= 1),
    so each j's stop index is a searchsorted position: the count of
    prefix sums psm1_i <= S[j]+d[j]-ceil(T), computed for ALL j at once
    with ONE sort + running sum (the integer reformulation is exact:
    for integer a, (double)a >= T iff a >= ceil(T)). The recursion then
    just follows precomputed stop pointers — one O(1) row per GROUP,
    not an O(n) correlated scan per group (that shape cost ~40s on the
    100k-row sf0.1 validation; this one is sub-second)."""
    ceil_t = f"CAST(ceil({t_lit}) AS BIGINT)"
    return f"""
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM {src}) AS mx
    FROM {src}),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{{i: psm1_i <= ps_j + d_j - ceil(T)}}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - {ceil_t} AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel"""


def gen_pinned_sql(hll_consts):
    # remainder flush + final compress at serialize time: only when the
    # head buffer is non-empty (n % HEAD != 0 or n < HEAD), with
    # T = (2*relErr) * n. MAX_CYCLES full cycles emitted statically.
    cycles = ",\n".join(gk_cycle(c)
                        for c in range(1, MAX_CYCLES + 1)) + ","
    rem_lo = f"((SELECT n FROM nn) // {HEAD}) * {HEAD}"
    # element 0 of the sampled array after the remainder merge only has
    # delta 0 if it was the very first insert ever (n <= HEAD case is
    # covered because cycle CTEs passed through empty)
    hll_ctes = []
    hll_ctes.append(
        "in_au AS (SELECT CASE WHEN u < 0 THEN CAST(u AS HUGEINT) + "
        "18446744073709551616 ELSE CAST(u AS HUGEINT) END AS x FROM "
        "(SELECT DISTINCT user_id AS u FROM events "
        "WHERE user_id IS NOT NULL) t)")
    hll_ctes.extend(hll.emit_layers("hx_au", "in_au", hll.long_hash_ranks()))
    hll_ctes.extend(hll.register_ctes("au", "hx_au"))
    hll_ctes.extend(hll.estimate_sql("au", hll_consts))
    hll_cte_sql = ",\n".join(hll_ctes)

    return f"""WITH RECURSIVE
vals AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn
         FROM (SELECT value AS v FROM events WHERE value IS NOT NULL) t),
nn AS MATERIALIZED (SELECT count(*) AS n FROM vals),
samp_0 AS (SELECT CAST(NULL AS BIGINT) AS idx, CAST(NULL AS DOUBLE) AS v,
                  CAST(NULL AS BIGINT) AS g, CAST(NULL AS BIGINT) AS d
           WHERE FALSE),
{cycles}
mrg_f AS MATERIALIZED (
  SELECT * FROM samp_{MAX_CYCLES}
  UNION ALL
  SELECT (SELECT count(*) FROM samp_{MAX_CYCLES}) + rn - {rem_lo} - 1
      AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 1 THEN 0
         WHEN rn = (SELECT n FROM nn) THEN 0
         ELSE CAST(floor({dlit(C2E)} * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > {rem_lo}),
cmp_f AS ({compress_sql("mrg_f",
                        f"({dlit(C2E)} * CAST((SELECT n FROM nn) AS DOUBLE))")}),
samp_f AS MATERIALIZED (
  SELECT * FROM cmp_f WHERE (SELECT n FROM nn) % {HEAD} <> 0
  UNION ALL
  SELECT * FROM samp_{MAX_CYCLES} WHERE (SELECT n FROM nn) % {HEAD} = 0),
walk AS (
  SELECT idx, v,
    sum(g) OVER (ORDER BY idx) AS minrank, d,
    (SELECT max(g + d) FROM samp_f) // 2 AS te,
    CAST(ceil(0.5 * CAST((SELECT n FROM nn) AS DOUBLE)) AS BIGINT) AS rk,
    (SELECT max(idx) FROM samp_f) AS mx
  FROM samp_f),
hit AS (
  SELECT v FROM walk
  WHERE idx < mx AND minrank + d - te <= rk AND rk <= minrank + te
  ORDER BY idx LIMIT 1),
p50 AS (
  SELECT COALESCE((SELECT v FROM hit),
                  (SELECT v FROM walk WHERE idx = (SELECT max(idx)
                                                   FROM samp_f))) AS p),
{hll_cte_sql}
SELECT (SELECT nd FROM fin_au) AS approx_users,
       (SELECT CAST(n AS BIGINT) FROM nn) AS n_vals,
       (SELECT p FROM p50) AS p50_approx"""


# --------------------------------------------------------- bucketed oracle
# q_sketch_bucketed: the SCALE shape of approximate percentile, pinned.
# Fixed-literal range buckets (floor(value/40.0) clamped to [0,15], the
# same IEEE expression the Spark query computes), exact per-bucket
# counts, then the GK summary built ONLY on the bucket containing the
# global target rank rk0 = ceil(0.5*n), queried at the rank-adjusted
# quantile phi = (rk0 - cum_before) / n_bucket. The GK replay is the
# SAME machinery as q_sketch_pinned (sorted single-partition insert →
# flush cycles + compressImmut + serialize-time final compress), just
# over the bucket's values and parameterized by phi — including the two
# edge shortcuts Spark's QuantileSummaries.query takes before walking
# (phi <= relativeError → head sample; phi >= 1-relativeError → last).
BUCKET_W = 40.0
BUCKET_MAX = 15  # buckets 0..15 cover [0, 640); clamp catches the rest


def gen_bucketed_sql():
    cycles = ",\n".join(gk_cycle(c)
                        for c in range(1, MAX_CYCLES + 1)) + ","
    rem_lo = f"((SELECT n FROM nn) // {HEAD}) * {HEAD}"
    return f"""WITH RECURSIVE
bq_ev AS MATERIALIZED (
  SELECT value AS v,
    CAST(least(greatest(floor(value / {dlit(BUCKET_W)}), 0),
          {BUCKET_MAX}) AS INT) AS b
  FROM events WHERE value IS NOT NULL),
bq_cnts AS MATERIALIZED (SELECT b, count(*) AS n FROM bq_ev GROUP BY b),
bq_tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM bq_cnts),
bq_rk0 AS (SELECT CAST(ceil({dlit(0.5)} * CAST((SELECT n FROM bq_tot) AS DOUBLE))
               AS BIGINT) AS rk),
bq_cum AS (SELECT b, n, sum(n) OVER (ORDER BY b) AS c,
               sum(n) OVER (ORDER BY b) - n AS cb FROM bq_cnts),
bq_tgt AS (SELECT b, CAST(n AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb
        FROM bq_cum WHERE c >= (SELECT rk FROM bq_rk0) ORDER BY b LIMIT 1),
bq_phi AS (SELECT CAST((SELECT rk FROM bq_rk0) - (SELECT cb FROM bq_tgt) AS DOUBLE)
             / CAST((SELECT nb FROM bq_tgt) AS DOUBLE) AS p),
vals AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn
         FROM bq_ev WHERE b = (SELECT b FROM bq_tgt)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM vals),
samp_0 AS (SELECT CAST(NULL AS BIGINT) AS idx, CAST(NULL AS DOUBLE) AS v,
                  CAST(NULL AS BIGINT) AS g, CAST(NULL AS BIGINT) AS d
           WHERE FALSE),
{cycles}
mrg_f AS MATERIALIZED (
  SELECT * FROM samp_{MAX_CYCLES}
  UNION ALL
  SELECT (SELECT count(*) FROM samp_{MAX_CYCLES}) + rn - {rem_lo} - 1
      AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 1 THEN 0
         WHEN rn = (SELECT n FROM nn) THEN 0
         ELSE CAST(floor({dlit(C2E)} * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > {rem_lo}),
cmp_f AS ({compress_sql("mrg_f",
                        f"({dlit(C2E)} * CAST((SELECT n FROM nn) AS DOUBLE))")}),
samp_f AS MATERIALIZED (
  SELECT * FROM cmp_f WHERE (SELECT n FROM nn) % {HEAD} <> 0
  UNION ALL
  SELECT * FROM samp_{MAX_CYCLES} WHERE (SELECT n FROM nn) % {HEAD} = 0),
walk AS (
  SELECT idx, v,
    sum(g) OVER (ORDER BY idx) AS minrank, d,
    (SELECT max(g + d) FROM samp_f) // 2 AS te,
    CAST(ceil((SELECT p FROM bq_phi) * CAST((SELECT n FROM nn) AS DOUBLE))
         AS BIGINT) AS rk,
    (SELECT max(idx) FROM samp_f) AS mx
  FROM samp_f),
hit AS (
  SELECT v FROM walk
  WHERE idx < mx AND minrank + d - te <= rk AND rk <= minrank + te
  ORDER BY idx LIMIT 1),
p50 AS (
  SELECT CASE
    WHEN (SELECT p FROM bq_phi) <= {dlit(REL_ERR)}
      THEN (SELECT v FROM samp_f WHERE idx = 0)
    WHEN (SELECT p FROM bq_phi) >= CAST(1 AS DOUBLE) - {dlit(REL_ERR)}
      THEN (SELECT v FROM samp_f WHERE idx = (SELECT max(idx) FROM samp_f))
    ELSE COALESCE((SELECT v FROM hit),
                  (SELECT v FROM walk WHERE idx = (SELECT max(idx)
                                                   FROM samp_f)))
  END AS p)
SELECT (SELECT n FROM bq_tot) AS n_vals,
       (SELECT b FROM bq_tgt) AS target_bucket,
       (SELECT CAST(n AS BIGINT) FROM nn) AS n_bucket,
       (SELECT p FROM p50) AS p50_bucketed"""


# ---------------------------------------------------------------- driver
def main():
    import sys
    import time

    import duckdb
    import pandas as pd

    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

    cmx, cmy, xt, ystride, harm = ds_constants()
    hll_consts = hll.jvm_constants()
    merge_sql = gen_merge_sql(cmx, cmy, xt, ystride, harm)
    pinned_sql = gen_pinned_sql(hll_consts)
    bucketed_sql = gen_bucketed_sql()
    os.makedirs(ORACLES, exist_ok=True)
    open(os.path.join(ORACLES, "q_sketch_merge.sql"), "w").write(merge_sql)
    open(os.path.join(ORACLES, "q_sketch_pinned.sql"), "w").write(pinned_sql)
    open(os.path.join(ORACLES, "q_sketch_bucketed.sql"), "w").write(
        bucketed_sql)
    print(f"wrote q_sketch_merge.sql ({len(merge_sql)} chars), "
          f"q_sketch_pinned.sql ({len(pinned_sql)} chars), "
          f"q_sketch_bucketed.sql ({len(bucketed_sql)} chars)")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'/root/testdata/{sf}/events.parquet'")
    for name, sql in [("q_sketch_merge", merge_sql),
                      ("q_sketch_pinned", pinned_sql),
                      ("q_sketch_bucketed", bucketed_sql)]:
        t0 = time.time()
        got = con.execute(sql).df()
        print(f"{name}: {time.time() - t0:.1f}s")
        print(got.to_string())
        path = f"{out}/{name}"
        if os.path.isdir(path):
            exp = pd.read_parquet(path)
            g = sorted(map(tuple, got[sorted(got.columns)].values.tolist()))
            e = sorted(map(tuple, exp[sorted(exp.columns)].values.tolist()))
            print(f"  vs spark: {'MATCH' if g == e else 'MISMATCH'}")
            if g != e:
                print("  duck :", g[:6])
                print("  spark:", e[:6])


if __name__ == "__main__":
    main()
