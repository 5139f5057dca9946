package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar sink/scan for engine outputs at scale: zstd parquet,
  * hive-style partitioning on a low-cardinality column so downstream
  * queries with a partition predicate read only matching directories
  * (partition pruning — visible as PartitionFilters in the scan node).
  */
object Parquet {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       compression: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
