package graft.ops

import graft.Util.q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4/U4 — anti join (reference varinfo-update.R:141-145 `get_unmatched`:
  * `anti_join(column_info, joined, by = qualtrics_col_name)`).
  *
  * dplyr's default `na_matches = "na"` treats NA keys as EQUAL, so a left
  * row with a NULL key is excluded when the right side also has a NULL key.
  * Spark's `=== `-based left_anti never matches NULLs; the faithful predicate
  * is null-safe equality (`<=>`). Planned as a broadcast/shuffled hash
  * LeftAnti join by Catalyst.
  */
object AntiJoin {

  def antiJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               naMatches: Boolean = true): DataFrame = {
    val l = left.alias("aj_l")
    val r = right.alias("aj_r")
    val lk = col(s"aj_l.${q(leftKey)}")
    val rk = col(s"aj_r.${q(rightKey)}")
    val cond = if (naMatches) lk <=> rk else lk === rk
    l.join(r, cond, "left_anti")
  }

  /** Same-key convenience. */
  def antiJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    antiJoin(left, right, key, key)
}
