package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Util.qcol

/** Column profiling — the data-catalog summary every pipeline wants
  * before it trusts a table: per column, row/null/distinct counts and
  * min/max. Numerics (and timestamps, as epoch micros) report
  * `min_num`/`max_num` as doubles; strings report `min_str`/`max_str`
  * under binary collation — both render identically across engines, so
  * the whole profile is oracle-checkable.
  *
  * Two physical strategies, same result shape — the 2-arg form
  * AUTO-ROUTES between them on column count:
  *
  *  - '''exactDistinct = true''' (auto default ≤ 64 columns): one aggregate branch PER
  *    COLUMN, unioned. Each branch's scan prunes to exactly that column
  *    (columnar total bytes = the single multi-column scan), and a
  *    single-distinct aggregate plans WITHOUT Catalyst's multi-distinct
  *    Expand — the previous single-aggregate form paid an (N+1)-way row
  *    expansion of the whole table through the partial aggregate, which
  *    benchmarked ~7× slower at 5 columns × 600k rows. Branches run as
  *    parallel stages of one job.
  *  - '''exactDistinct = false''' (auto default > 64 columns):
  *    HyperLogLog++ estimates (`approx_count_distinct`) in ONE
  *    single-pass aggregate — no second phase at all, KB-sized state
  *    per column; the right call at corpus scale or very wide tables.
  *
  * Each exact column still adds a scan branch (planning and task-launch
  * cost, not data cost): above [[ExactDistinctWarnCols]] columns the
  * EXPLICIT exact call warns, above `maxExactDistinctCols` (default 64,
  * overridable) it refuses, steering to `exactDistinct = false` — the
  * 2-arg auto form never hits either, it switches to HLL instead.
  */
object Profile {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact-distinct column count above which profile() warns: each
    * column is one more scan branch + distinct exchange in the plan. */
  val ExactDistinctWarnCols = 20

  /** Default exact→HLL auto-route threshold (see 2-arg [[profile]]). */
  val MaxExactDistinctCols = 64

  /** `n_distinct` column-metadata key, `true` when the value is an HLL++
    * ESTIMATE (the approx branch, including the 2-arg auto-route above
    * [[MaxExactDistinctCols]] columns). Absent/false = exact count.
    * Downstream consumers should check it before treating profile
    * distincts as exact:
    * `df.schema("n_distinct").metadata.contains(ApproxDistinctMetaKey)`. */
  val ApproxDistinctMetaKey = "graft.approx_distinct"

  /** AUTO-ROUTING default: exact per-column distincts up to
    * `maxExactDistinctCols` columns, HLL++ estimates above it — a
    * 65-column profile plans ONE single-pass aggregate, not 65 scan
    * branches, without the caller having to know the threshold. The
    * switch is logged (WARN) and the output's `n_distinct` column is
    * tagged with [[ApproxDistinctMetaKey]], so neither a human nor a
    * downstream consumer can mistake estimates for exact counts. Force
    * the strategy with the `exactDistinct` overload (the explicit
    * `exactDistinct = true` path still refuses past its own
    * `maxExactDistinctCols` unless that is raised too — the loud option
    * for callers who truly want 100+ exact branches). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.size > MaxExactDistinctCols) {
      log.warn(
        s"profile: ${cols.size} columns > $MaxExactDistinctCols — " +
          "auto-routing to HLL++ estimates (one pass, n_distinct tagged " +
          s"$ApproxDistinctMetaKey); pass exactDistinct = true with " +
          "maxExactDistinctCols raised for exact distincts")
      profile(df, cols, exactDistinct = false)
    } else profile(df, cols, exactDistinct = true)

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean,
              maxExactDistinctCols: Int = MaxExactDistinctCols): DataFrame = {
    if (exactDistinct && cols.size > maxExactDistinctCols)
      throw new IllegalArgumentException(
        s"profile: ${cols.size} exact-distinct columns would plan " +
          s"${cols.size} scan branches + distinct exchanges; pass " +
          "exactDistinct = false (HLL++ estimates, flat cost) or raise " +
          s"maxExactDistinctCols (= $maxExactDistinctCols) explicitly")
    if (exactDistinct && cols.size > ExactDistinctWarnCols)
      log.warn(
        s"profile: ${cols.size} exact-distinct columns plans " +
          s"${cols.size} scan branches — consider " +
          "exactDistinct = false at scale")
    // empty column list → empty profile (stable schema), matching the
    // approx branch; the per-column-branch form below would otherwise
    // throw from reduce on an empty collection
    if (cols.isEmpty) {
      val spark = df.sparkSession
      val emptySchema = StructType(Seq(
        StructField("column", StringType), StructField("n_rows", LongType),
        StructField("n_null", LongType), StructField("n_distinct", LongType),
        StructField("min_num", DoubleType), StructField("max_num", DoubleType),
        StructField("min_str", StringType), StructField("max_str", StringType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    }
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // fail with the offending names, not a bare NoSuchElementException
    // from the type map lookup below
    val missing = cols.filterNot(types.contains)
    require(missing.isEmpty,
      s"profile: column(s) not in schema: ${missing.mkString(", ")} " +
        s"(available: ${df.columns.mkString(", ")})")
    def numeric(c: String): Option[Column] = types(c) match {
      case _: NumericType => Some(qcol(c).cast("double"))
      // parquet naive timestamps arrive as TIMESTAMP_NTZ in Spark 4; the
      // cast pins micros under the session zone (harness: UTC)
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        Some(unix_micros(qcol(c).cast("timestamp")).cast("double"))
      case _ => None
    }
    def endAggs(c: String, p: String = ""): Seq[Column] = numeric(c) match {
      case Some(n) => Seq(min(n).as(p + "min_num"), max(n).as(p + "max_num"),
        lit(null).cast("string").as(p + "min_str"),
        lit(null).cast("string").as(p + "max_str"))
      case None => Seq(lit(null).cast("double").as(p + "min_num"),
        lit(null).cast("double").as(p + "max_num"),
        min(qcol(c).cast("string")).as(p + "min_str"),
        max(qcol(c).cast("string")).as(p + "max_str"))
    }
    if (exactDistinct) {
      // one branch per column: the scan prunes to that column, and a
      // SINGLE count_distinct plans as an ordinary two-phase distinct
      // aggregate — no Expand anywhere in the plan
      cols.map { c =>
        val branchAggs = Seq(count(qcol(c)).as("__nn"),
          count_distinct(qcol(c)).as("n_distinct")) ++ endAggs(c)
        df.agg(count(lit(1)).as("__nrows"), branchAggs: _*)
          .select(lit(c).as("column"),
            col("__nrows").as("n_rows"),
            (col("__nrows") - col("__nn")).as("n_null"),
            col("n_distinct"), col("min_num"), col("max_num"),
            col("min_str"), col("max_str"))
      }.reduce(_ unionByName _)
    } else {
      // single no-Expand pass: HLL++ state per column, one aggregate
      val aggs = cols.flatMap { c =>
        Seq(count(qcol(c)).as(s"__${c}__nn"),
          approx_count_distinct(qcol(c)).as(s"__${c}__ndist")) ++
          endAggs(c, s"__${c}__")
      }
      val row = df.agg(count(lit(1)).as("__nrows"), aggs: _*)
      val perCol = cols.map { c =>
        struct(lit(c).as("column"),
          col("__nrows").as("n_rows"),
          (col("__nrows") - qcol(s"__${c}__nn")).as("n_null"),
          qcol(s"__${c}__ndist").as("n_distinct"),
          qcol(s"__${c}__min_num").as("min_num"),
          qcol(s"__${c}__max_num").as("max_num"),
          qcol(s"__${c}__min_str").as("min_str"),
          qcol(s"__${c}__max_str").as("max_str"))
      }
      row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
        .withMetadata("n_distinct",
          new MetadataBuilder().putBoolean(ApproxDistinctMetaKey, true)
            .build())
    }
  }

  /** Fixed-width value histogram of a numeric column: one hash aggregate
    * on ⌊v / width⌋ — single pass, no pre-scan for bounds, portable
    * integer bucketing. */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame = {
    // width 0 is DIVIDE_BY_ZERO task failures under ANSI (or one null
    // bucket without it), negative width inverts buckets silently —
    // fail at the call site like packBins does for its budget
    require(width > 0, s"histogram width must be > 0, got $width")
    // NaN/Infinity excluded like nulls (r13 review): floor(NaN).toLong
    // is 0, so NaN rows would silently merge into bucket 0
    // (indistinguishable from real [0, width) values), and ±Infinity
    // floors to Long.Max/MinValue nonsense outlier buckets — the same
    // silent-corruption class the width guard above refuses.
    val v = qcol(c).cast("double")
    df.filter(v.isNotNull && !isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
      .groupBy(floor(v / lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
