package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two versions of a keyed table — the CDC /
  * reconciliation primitive that pairs with the versioned snapshot store
  * (`io.Versioned`) and the order-independent `tableFingerprint`: when
  * fingerprints disagree, this says exactly WHICH rows were added,
  * removed, or changed between snapshots.
  *
  * One full-outer shuffle join on the key; payload comparison is a
  * null-safe struct equality (`<=>`), so a column flipping between NULL
  * and a value counts as changed while NULL == NULL does not. Unchanged
  * rows are filtered out, so the output is change-sized, not
  * table-sized. At scale both snapshots shuffle once on the key —
  * co-located (bucketed) snapshot layouts make it exchange-free.
  */
object TableDiff {

  /** (key columns..., change) where change ∈ added | removed | changed:
    * `added` = key only in `newDf`, `removed` = key only in `oldDf`,
    * `changed` = key in both with any non-key column differing. Keys are
    * assumed unique per side (snapshot semantics). */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keyCols: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keyCols.contains).toSeq
    // compare (name, type) pairs, not names: same-named columns with
    // different types would otherwise surface as a confusing analysis
    // error (or silent coercion) inside the struct <=> compare
    // ORDER-INSENSITIVE compare (r12): tagged() builds both payload
    // structs from the old frame's column order BY NAME, so a reordered
    // but otherwise identical schema diffs correctly — rejecting it was
    // needless friction for refactored producers
    def shape(df: DataFrame) = df.schema.fields
      .filterNot(f => keyCols.contains(f.name))
      .map(f => f.name -> f.dataType).sortBy(_._1).toSeq
    require(shape(newDf) == shape(oldDf),
      s"snapshots must share one schema; old=${shape(oldDf).mkString(",")} " +
        s"new=${shape(newDf).mkString(",")}")
    def tagged(df: DataFrame, side: String) = df.select(
      keyCols.map(col) :+
        struct(payload.map(col): _*).as(s"__${side}_p") :+
        lit(1).as(s"__${side}_m"): _*)
    val joined = tagged(oldDf, "o")
      .join(tagged(newDf, "n"), keyCols, "full_outer")
    joined.select(
        keyCols.map(col) :+
          when(col("__o_m").isNull, lit("added"))
            .when(col("__n_m").isNull, lit("removed"))
            .when(!(col("__o_p") <=> col("__n_p")), lit("changed"))
            .as("change"): _*)
      .filter(col("change").isNotNull)
  }
}
