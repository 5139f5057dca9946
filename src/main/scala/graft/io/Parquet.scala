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

  /** Compact a directory of small parquet files into ~`targetFileBytes`
    * files — the small-files fix every long-running ingest eventually
    * needs: streaming micro-batches and fine-grained partitions accumulate
    * KB-sized files whose per-file open/footer/task overhead comes to
    * dominate scans at scale (100k tiny files = 100k scan tasks).
    *
    * Sizing uses the CURRENT on-disk bytes (post-compression, from a file
    * listing — metadata-scale, no data read), so the output count tracks
    * real data volume. Writes to a temp dir then atomically swaps, so a
    * concurrent reader sees old or new files, never a mix. Returns the
    * output file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              compression: String = "zstd"): Int = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    // crash repair BEFORE anything else: a previous compact that died
    // between its two renames left the dataset at `old` and nothing at
    // `path` — restore it, or every reader (and this listing) fails on a
    // missing path while both copies sit under hidden names
    val old = new Path(path + ".__graft_compact_old")
    if (!fs.exists(dir) && fs.exists(old)) {
      if (!fs.rename(old, dir))
        throw new java.io.IOException(s"compact: repair $old -> $dir failed")
    }
    val entries = fs.listStatus(dir)
    // A hive-partitioned dataset has partition SUBDIRECTORIES here; naively
    // reading+rewriting it would fold the partition columns into the data
    // and destroy pruning. Compact runs per leaf directory by design.
    val subdirs = entries.filter(e => e.isDirectory &&
      !e.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"$path contains partition subdirectories " +
        s"(${subdirs.take(3).map(_.getPath.getName).mkString(", ")}...) — " +
        "compact each leaf partition directory instead")
    // size from the same file set the read consumes (every non-hidden
    // data file) — counting only Spark's part-* names would compute 0
    // bytes for externally-written parquet and funnel the whole dataset
    // through repartition(1)
    val bytes = entries
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(path + ".__graft_compact_tmp")
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").option("compression", compression)
      .parquet(tmp.toString)
    // Hadoop FileSystem.rename reports failure by RETURNING FALSE — every
    // step is checked so a failed swap can never reach the delete of the
    // only remaining copy. On failure after the first rename, the original
    // is restored. (The swap is two renames, so a concurrent reader can
    // observe a brief path-not-found between them — old XOR new data,
    // never a mix; readers needing stronger atomicity use a table format.)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compact: rename $dir -> $old failed")
    if (!fs.rename(tmp, dir)) {
      val restored = fs.rename(old, dir)
      throw new java.io.IOException(
        s"compact: rename $tmp -> $dir failed; original " +
          (if (restored) "restored" else s"left at $old"))
    }
    fs.delete(old, true)
    nOut
  }
}
