package graft.ops

import graft.Util.{q, qcol}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1/P3 — dashboard projection with R-faithful null semantics
  * (reference varinfo-update.R:226-233 `generate_dashboard_data`).
  */
object Dashboard {

  /** P3 — R's `!x %in% values` is never NA: a NULL x yields TRUE (row kept).
    * Spark's `isin` propagates NULL, which `filter` would drop, so the
    * negated membership test is wrapped in `coalesce(..., true)`. */
  def notInKeepNulls(c: Column, values: Seq[String]): Column =
    coalesce(!c.isin(values.map(lit): _*), lit(true))

  /** P1 — `select(any_of(...))`: allow-listed projection that silently skips
    * absent names (the human-edited schema may differ). */
  def selectAnyOf(df: DataFrame, wanted: Seq[String]): DataFrame = {
    val present = wanted.filter(df.columns.contains)
    df.select(present.map(qcol): _*)
  }

  val DefaultColumns: Seq[String] = Seq("ITEM_SECTION", "ITEM_STEM",
    "ITEM_MEMBER", "SCALE_OPTIONS", "ITEM_TYPE", "ITEM_PARENT_ID",
    "most_recent")

  /** Filter out admin/metadata rows (NULL ITEM_TYPE kept, as in R) and the
    * CONSENT item (NULL ITEM_NAME dropped — dplyr drops NA conditions, and
    * `!=` is NULL for NULL input in both systems), then trim columns. */
  def dashboard(df: DataFrame, joinColumnVar: String = "ITEM_NAME",
                itemTypeCol: String = "ITEM_TYPE",
                itemNameCol: String = "ITEM_NAME"): DataFrame = {
    val filtered = df.filter(
      notInKeepNulls(qcol(itemTypeCol), Seq("administrative", "metadata")) &&
        qcol(itemNameCol) =!= "CONSENT")
    selectAnyOf(filtered, joinColumnVar +: DefaultColumns)
  }
}
