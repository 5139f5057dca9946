package graft.ops

import graft.catalyst.TopKPerKeyNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSql
import org.apache.spark.sql.types.LongType

/** J2/W2/O1 — best-match-per-key selection
  * (reference varinfo-update.R:106-107: `arrange(row_id, string_distance)`
  * then `distinct(row_id, .keep_all = TRUE)`).
  *
  * R keeps the first-encountered row per key after a stable sort, which is
  * nondeterministic in a distributed engine; callers must therefore pass a
  * deterministic tiebreaker in `orderCols` (e.g. the right side's own id).
  * `dropDuplicates` is deliberately NOT used — it keeps an arbitrary row.
  */
object BestMatch {

  /** Window top-1: one row per key, smallest `orderCols` first.
    * Null ordering: pass e.g. `col(d).asc_nulls_last` to match R's
    * NA-last `arrange`. */
  def topOnePerKey(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column]): DataFrame =
    topKPerKey(df, partitionCols, orderCols, 1).drop("__graft_rank")

  /** Window top-k; rank kept in `__graft_rank` (1-based). */
  def topKPerKey(df: DataFrame, partitionCols: Seq[Column],
                 orderCols: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= k)
  }

  /** Native top-k per key — the custom-operator scale path for W2
    * (graft.catalyst.TopKPerKey: bounded heaps map-side, only survivors
    * shuffle, no partition sort). Same row_number semantics as
    * `topKPerKey`; order is (columnName, ascending) pairs over plain
    * columns (default null ordering, like the window form). Requires
    * `GraftExtensions.install` (or spark.sql.extensions) so the planner
    * strategy is registered. */
  def topKPerKeyNative(df: DataFrame, keyCols: Seq[String],
                       order: Seq[(String, Boolean)], k: Int,
                       rankName: String = "__graft_rank"): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column `$n` not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSql.ofRows(df.sparkSession,
      TopKPerKeyNode(keyCols.map(attr), sortOrder, k, rankAttr, plan))
  }

  /** Scale variant (SURVEY.md §4.3(3)): single-pass hash aggregate via
    * `min_by` over a packed struct — avoids the per-key sort a window
    * implies. `ordCol` should be a struct including a tiebreaker. Payload
    * columns are re-exposed with their original names. */
  def argMinPerKey(df: DataFrame, keyCols: Seq[String], ordCol: Column,
                   payloadCols: Seq[String]): DataFrame = {
    import graft.Util.qcol
    val packed = struct(payloadCols.map(qcol): _*)
    df.groupBy(keyCols.map(qcol): _*)
      .agg(min_by(packed, ordCol).as("__graft_best"))
      .select(keyCols.map(qcol) ++
        payloadCols.map(c => col(s"__graft_best.`$c`").as(c)): _*)
  }
}
