package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** W1 — dense, stable row ids (reference varinfo-update.R:97,192
  * `rowid_to_column`).
  *
  * R preserves row order implicitly; Spark guarantees none, so the id is
  * defined either by an explicit total ordering or by current partition/file
  * order (CSV ingest order, which the reference relies on). Ids are assigned
  * with `zipWithIndex`, which numbers rows as (partitionIndex, offset) — no
  * single-partition `row_number()` window, so assignment stays fully parallel
  * on a large cluster.
  */
object RowId {

  /** Append a 0-based dense LongType id column. If `sortCols` is non-empty the
    * ids follow that (total) ordering; otherwise current order is used —
    * only meaningful straight after an order-preserving ingest. */
  def withRowId(df: DataFrame, idCol: String = "row_id",
                sortCols: Seq[Column] = Nil): DataFrame = {
    val ordered = if (sortCols.nonEmpty) df.orderBy(sortCols: _*) else df
    val schema = StructType(
      ordered.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = ordered.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    ordered.sparkSession.createDataFrame(rdd, schema)
  }

  /** 1-based variant matching R's `rowid_to_column` numbering. */
  def withRowId1(df: DataFrame, idCol: String = "row_id",
                 sortCols: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.col
    withRowId(df, idCol, sortCols)
      .withColumn(idCol, col(s"`$idCol`") + 1L)
  }
}
