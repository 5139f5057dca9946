package graft.ops

import graft.Util.q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3/U2/P6/F5 — coalescing left equi-join
  * (reference varinfo-update.R:66-90 `coalesce_left_join`, applied with
  * `keep = TRUE` at :121-126 to rescue fuzzy-join misses by variable name).
  *
  * Semantics: plain left join; then every column name present on BOTH inputs
  * collapses to `coalesce(left, right)` (left — the fuzzy-join result — wins);
  * output schema is `union(left.columns, right.columns)` in first-seen order.
  * All built-ins; the join itself is whatever Catalyst picks
  * (BroadcastHashJoin for a small right side, SortMergeJoin at scale).
  */
object CoalesceJoin {

  /** General form: `cond` builds the join predicate from the two aliased
    * frames ("cl" = left, "cr" = right). */
  def coalesceLeftJoin(left: DataFrame, right: DataFrame,
                       cond: (DataFrame, DataFrame) => Column): DataFrame = {
    val l = left.alias("cl")
    val r = right.alias("cr")
    val joined = l.join(r, cond(l, r), "left")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    val outNames =
      left.columns ++ right.columns.filterNot(left.columns.contains)
    val outCols = outNames.map { name =>
      if (overlap(name))
        coalesce(col(s"cl.${q(name)}"), col(s"cr.${q(name)}")).as(name)
      else if (left.columns.contains(name)) col(s"cl.${q(name)}")
      else col(s"cr.${q(name)}")
    }
    joined.select(outCols.toSeq: _*)
  }

  /** Equi-key convenience: join on leftKey == rightKey (both kept,
    * matching dplyr's `keep = TRUE`). */
  def coalesceLeftJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String): DataFrame =
    coalesceLeftJoin(left, right,
      (_, _) => col(s"cl.${q(leftKey)}") === col(s"cr.${q(rightKey)}"))
}
