package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * standard trick for making ONE physical sort serve range queries on
  * SEVERAL columns. Interleaving the bits of two keys makes files (after
  * a range-partitioned write) cover small rectangles of the (a, b) space
  * instead of thin slabs of a single dimension — so a `Manifest` over
  * either column still skips most files, where a linear sort only ever
  * helps its leading column.
  *
  * Pure expression arithmetic (shifts/masks folded by codegen): no UDF,
  * no shuffle beyond the final range partitioning of the write itself.
  */
object Layout {

  /** Bits interleaved per dimension. 21 bits x 2 dims = 42-bit z-values —
    * always positive in a long, and 2M distinct cells per dimension is
    * far finer than any file-count-scale layout needs. */
  val BitsPerDim = 21

  /** Morton interleave of two non-negative integer columns (values are
    * masked to the low 21 bits; pre-scale wider domains — rank, bucketize,
    * or shift — before calling). Bit i of `a` lands at z-bit 2i, bit i of
    * `b` at 2i+1. */
  def zValue(a: Column, b: Column): Column = {
    val mask = (1L << BitsPerDim) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until BitsPerDim).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered by (colA, colB) into `nFiles` range-partitioned
    * parquet files: each file covers a compact rectangle of the key
    * space, so `Manifest.build` over EITHER column yields tight per-file
    * bounds. The z column is layout-only and not persisted. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles=$nFiles must be >= 1")
    df.withColumn("__graft_z", zValue(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      // overwrite like every other graft.io sink: re-clustering the same
      // path is this sink's primary use, and the default ErrorIfExists
      // would fail the second run
      .write.mode("overwrite").parquet(path)
  }
}
