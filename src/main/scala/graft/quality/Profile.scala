package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Util.qcol

/** One-pass column profiling — the data-catalog summary every pipeline
  * wants before it trusts a table: per column, row/null/distinct counts
  * and min/max, computed in a SINGLE aggregate over the table (one scan,
  * one partial+final hash aggregate; no per-column passes).
  *
  * The wide single-row aggregate is reshaped to one row per column with
  * an `explode` over driver-built structs — a plan-side pivot, no
  * collect. Numerics (and timestamps, as epoch micros) report
  * `min_num`/`max_num` as doubles; strings report `min_str`/`max_str`
  * under binary collation — both render identically across engines, so
  * the whole profile is oracle-checkable.
  *
  * Distinct counts are exact by default (`count_distinct`; Catalyst
  * plans the multi-distinct aggregate via one Expand — cost grows with
  * the number of profiled columns). At corpus scale pass
  * `exactDistinct = false` for HyperLogLog++ estimates
  * (`approx_count_distinct`), which keeps the profile a true single
  * no-Expand pass with KB-sized aggregation state per column.
  *
  * The Expand's arity MULTIPLIES with the exact-distinct column count:
  * each profiled column adds a projection of the input (N columns exact
  * = an N+1-way row expansion of the whole scan before aggregation), so
  * a "profile everything" call over a wide table silently plans an
  * N× blowup of the table. Above [[ExactDistinctWarnCols]] columns the
  * call warns; above `maxExactDistinctCols` (default 64, overridable) it
  * refuses, steering to `exactDistinct = false` — whose cost is flat in
  * the column count.
  */
object Profile {

  /** Exact-distinct column count above which profile() warns about the
    * Expand blowup. ~20 columns = a 21× row expansion of the scanned
    * table feeding the partial aggregate. */
  val ExactDistinctWarnCols = 20

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true,
              maxExactDistinctCols: Int = 64): DataFrame = {
    if (exactDistinct && cols.size > maxExactDistinctCols)
      throw new IllegalArgumentException(
        s"profile: ${cols.size} exact-distinct columns would plan a " +
          s"${cols.size + 1}-way Expand of the whole table; pass " +
          "exactDistinct = false (HLL++ estimates, flat cost) or raise " +
          s"maxExactDistinctCols (= $maxExactDistinctCols) explicitly")
    if (exactDistinct && cols.size > ExactDistinctWarnCols)
      System.err.println(
        s"[graft] profile: ${cols.size} exact-distinct columns plans a " +
          s"${cols.size + 1}-way Expand of the input — consider " +
          "exactDistinct = false at scale")
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
    val nd: Column => Column =
      if (exactDistinct) count_distinct(_) else approx_count_distinct(_)
    val aggs = cols.flatMap { c =>
      val base = Seq(
        count(qcol(c)).as(s"__${c}__nn"),
        nd(qcol(c)).as(s"__${c}__ndist"))
      val ends = numeric(c) match {
        case Some(n) => Seq(min(n).as(s"__${c}__min_num"),
          max(n).as(s"__${c}__max_num"),
          lit(null).cast("string").as(s"__${c}__min_str"),
          lit(null).cast("string").as(s"__${c}__max_str"))
        case None => Seq(lit(null).cast("double").as(s"__${c}__min_num"),
          lit(null).cast("double").as(s"__${c}__max_num"),
          min(qcol(c).cast("string")).as(s"__${c}__min_str"),
          max(qcol(c).cast("string")).as(s"__${c}__max_str"))
      }
      base ++ ends
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
  }

  /** Fixed-width value histogram of a numeric column: one hash aggregate
    * on ⌊v / width⌋ — single pass, no pre-scan for bounds, portable
    * integer bucketing. */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame =
    df.filter(qcol(c).isNotNull)
      .groupBy(floor(qcol(c).cast("double") / lit(width)).cast("long")
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
}
