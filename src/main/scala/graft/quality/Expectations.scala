package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Util.qcol

/** Single-pass data-quality checks for ingest gating — the validation a
  * pipeline runs on every batch before letting it into the corpus
  * (Deequ-style, minimal): each expectation compiles to ONE aggregate
  * expression, all expectations evaluate in ONE hash-aggregate pass over
  * the data (no per-check scans), and the report is a small DataFrame the
  * caller can alert on or join into a run ledger.
  *
  * Metrics are exact (ratios of counts, min/max/mean), so reports are
  * deterministic and cross-engine comparable.
  */
object Expectations {

  sealed trait Metric { def column: String; def expr: Column }
  /** Fraction of non-null values. The denominator is guarded like
    * Uniqueness's (r12): under Spark 4's default ANSI mode an EMPTY
    * batch would otherwise throw DIVIDE_BY_ZERO out of check() instead
    * of reporting 0.0 → pass=false, which is what the degraded-batch
    * convention there intends. */
  final case class Completeness(column: String) extends Metric {
    def expr: Column =
      (count(qcol(column)).cast("double") /
        greatest(count(lit(1)), lit(1L)).cast("double")).as("value")
  }
  /** Fraction of distinct values among non-nulls. */
  final case class Uniqueness(column: String) extends Metric {
    def expr: Column =
      (count_distinct(qcol(column)).cast("double") /
        greatest(count(qcol(column)), lit(1L)).cast("double")).as("value")
  }
  final case class MinOf(column: String) extends Metric {
    def expr: Column = min(qcol(column)).cast("double").as("value")
  }
  final case class MaxOf(column: String) extends Metric {
    def expr: Column = max(qcol(column)).cast("double").as("value")
  }
  final case class MeanOf(column: String) extends Metric {
    def expr: Column = avg(qcol(column)).cast("double").as("value")
  }

  final case class Expectation(name: String, metric: Metric,
                               lo: Double, hi: Double)

  /** One aggregate pass → (name, column, value, lo, hi, pass) per
    * expectation, ordered by name. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty)
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      e.metric.expr.as(s"__m$i")
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val entries = expectations.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("name"), lit(e.metric.column).as("column"),
        col(s"__m$i").cast("double").as("value"),
        lit(e.lo).as("lo"), lit(e.hi).as("hi"))
    }
    // explode the single aggregated row into one report row per
    // expectation — the aggregate runs exactly once
    agged.select(explode(array(entries: _*)).as("r"))
      .select(col("r.name").as("name"), col("r.column").as("column"),
        col("r.value").as("value"), col("r.lo").as("lo"), col("r.hi").as("hi"),
        // a NULL metric (e.g. avg of an all-null column — the classic
        // producer failure) must FAIL the expectation, not evaluate to
        // NULL: gates aggregate pass with min(), which skips nulls and
        // would wave the batch through
        coalesce(col("r.value") >= col("r.lo") && col("r.value") <= col("r.hi"),
          lit(false)).as("pass"))
      .orderBy(col("name"))
  }

  final case class SchemaDiff(column: String, status: String,
                              expected: String, actual: String)

  /** Schema drift between an expected schema and a batch's actual schema —
    * the check that catches a producer silently adding, dropping, or
    * retyping a field before the batch contaminates the corpus. Pure
    * metadata (no data read). Empty result = schemas compatible. */
  def schemaDrift(expected: org.apache.spark.sql.types.StructType,
                  actual: org.apache.spark.sql.types.StructType)
      : Seq[SchemaDiff] = {
    val e = expected.fields.map(f => f.name -> f.dataType.sql).toMap
    val a = actual.fields.map(f => f.name -> f.dataType.sql).toMap
    val missing = (e.keySet -- a.keySet).toSeq.sorted
      .map(c => SchemaDiff(c, "missing", e(c), ""))
    val added = (a.keySet -- e.keySet).toSeq.sorted
      .map(c => SchemaDiff(c, "added", "", a(c)))
    val retyped = (e.keySet & a.keySet).toSeq.sorted
      .filter(c => e(c) != a(c))
      .map(c => SchemaDiff(c, "retyped", e(c), a(c)))
    missing ++ added ++ retyped
  }

  /** Order-independent table fingerprint for cross-copy / cross-engine
    * reconciliation: per row, the first 15 hex digits of md5 over the
    * chr(1)-joined column renderings (NULL → chr(2) so null and empty
    * string differ) become a 60-bit integer; the fingerprint is their SUM
    * (exact, via DECIMAL) mod 10^15. Summation commutes, so the result is
    * independent of row order, partitioning, and engine — two copies of a
    * table can be compared by shipping 16 bytes instead of the data.
    * One map-side-combined aggregate pass, no shuffle beyond the final
    * 1-row combine. Output: (n_rows, fingerprint). */
  def tableFingerprint(df: org.apache.spark.sql.DataFrame,
                       cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val rendered = concat_ws("\u0001",
      cols.map(c => coalesce(qcol(c).cast("string"), lit("\u0002"))): _*)
    val h = conv(substring(md5(rendered), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.agg(count(lit(1)).as("n_rows"),
      (sum(h) % lit(1000000000000000L)).cast("long").as("fingerprint"))
  }
}
