package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range (interval) join: pairs of rows with the same key whose
  * timestamps lie within `maxGapSeconds` of each other.
  *
  * The naive formulation `|a.ts - b.ts| <= g` is a theta join — a nested
  * loop over every same-key pair. Binning makes it an equi-join: bucket
  * timestamps into gap-sized bins; any qualifying pair is at most one bin
  * apart, so replicating one side over (bin-1, bin, bin+1) and equi-joining
  * on (key, bin) finds every candidate exactly once (each replica carries a
  * distinct bin value). The true predicate is then verified on the
  * candidates. Replication factor 3, shuffle keyed on (key, bin) — the
  * same family of rewrite as the blocked Levenshtein join.
  */
object RangeJoin {

  /** Self-join: (id_a, id_b, gap_us) with id_a < id_b, |ts diff| <= gap. */
  def timeProximitySelfJoin(df: DataFrame, keyCol: String, tsCol: String,
                            idCol: String, maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds > 0,
      s"maxGapSeconds=$maxGapSeconds must be > 0 (DIV by zero otherwise)")
    val gapUs = maxGapSeconds * 1000000L
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
      unix_micros(col(tsCol)).as("us"))
    val a = base.withColumn("bin", expr(s"us DIV $gapUs")).alias("a")
    val b = base
      .withColumn("bin",
        explode(array(expr(s"us DIV $gapUs - 1"), expr(s"us DIV $gapUs"),
          expr(s"us DIV $gapUs + 1"))))
      .alias("b")
    a.join(b, col("a.k") === col("b.k") && col("a.bin") === col("b.bin") &&
        col("a.id") < col("b.id") &&
        abs(col("a.us") - col("b.us")) <= gapUs)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        abs(col("a.us") - col("b.us")).as("gap_us"))
  }
}
