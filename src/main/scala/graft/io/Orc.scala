package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the other mainstream columnar format (Hive-lineage
  * warehouses emit it). Same scale posture as the parquet wrapper:
  * columnar scan with column pruning and predicate pushdown (Spark's ORC
  * reader pushes filters into ORC's file/stripe/row-group indexes), zstd
  * compression, and optional hive-style partition dirs for partition
  * pruning at the path level.
  */
object Orc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** Hive-partitioned sink: one directory level per partition column —
    * equality predicates on those columns prune whole directories before
    * any file is opened. File alignment is the caller's choice, same
    * contract as [[Parquet.writePartitioned]]: pre-repartition by the
    * partition columns for ~one file per value, or write wide for
    * parallel throughput. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").option("compression", "zstd")
      .partitionBy(partitionCols: _*).orc(path)
}
