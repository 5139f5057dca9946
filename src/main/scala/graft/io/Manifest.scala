package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping over a plain parquet directory — the
  * lakehouse manifest pattern (what table formats keep in their metadata
  * layer) built from primitives: one aggregate pass records each file's
  * column bounds; point/range queries then enumerate only the files whose
  * bounds overlap the predicate and read just those paths.
  *
  * This prunes at a level partition directories can't reach: hive
  * partitioning skips on the PARTITION key only, while a manifest skips on
  * any column the data is clustered by (e.g. write-sorted event time in
  * files partitioned by date). Parquet row-group stats do the same job
  * per-row-group, but only AFTER a file is opened — the manifest removes
  * the file-open (and at cloud scale, the object-store GET) entirely.
  *
  * The manifest is rebuilt by one scan (`input_file_name`-keyed aggregate,
  * map-side combined, result rows = file count); production deployments
  * maintain it incrementally per ingested batch the same way
  * `SummaryMaintenance` maintains its summary.
  */
object Manifest {

  /** One row per parquet file: (file, n_rows, <c>_min, <c>_max per col). */
  def build(spark: SparkSession, path: String,
            cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The pruned file set AS A DATAFRAME — files whose [min, max] interval
    * for `column` intersects [lo, hi]; sound for any predicate implied by
    * that interval (files never contain values outside their recorded
    * bounds). This form never transits the driver, so it composes at
    * million-file manifest sizes. */
  def candidateFileDF(manifest: DataFrame, column: String,
                      lo: Column, hi: Column): DataFrame =
    manifest
      .filter(col(s"${column}_max") >= lo && col(s"${column}_min") <= hi)
      .select(col("file"))

  /** Driver-side candidate list — convenient for tests and small tables;
    * at large file counts prefer `candidateFileDF`/`readRange`, which
    * never hold the full list in driver memory. */
  def candidateFiles(manifest: DataFrame, column: String,
                     lo: Column, hi: Column): Seq[String] =
    candidateFileDF(manifest, column, lo, hi)
      .collect().map(_.getString(0)).toSeq

  /** Range read through the manifest: open only overlapping files, then
    * re-apply the exact predicate (bounds overlap is necessary, not
    * sufficient). Empty candidate set → empty frame with the source
    * schema, derived from ONE manifest-known file's footer — never a
    * full-table listing.
    *
    * Scale shape, stated honestly: any Spark scan holds its file list on
    * the driver (`InMemoryFileIndex` keeps a FileStatus per file), and
    * the final union plan here is no exception — the driver footprint is
    * O(pruned files), the same class as an ordinary read of the pruned
    * set, and strictly smaller than the unpruned table's own index. What
    * the batching buys is bounded TRANSIENT state during construction
    * (`toLocalIterator` holds one manifest partition of path strings at
    * a time, `maxPathsPerBatch` caps each scan's path array) — it does
    * not, and cannot, make the plan itself smaller than its file list.
    * The structural win of a manifest stays the pruning ratio: pruned ≪
    * total is what keeps million-file tables readable. */
  def readRange(spark: SparkSession, path: String, manifest: DataFrame,
                column: String, lo: Column, hi: Column,
                maxPathsPerBatch: Int = 100000): DataFrame = {
    require(maxPathsPerBatch >= 1,
      s"maxPathsPerBatch must be >= 1, got $maxPathsPerBatch")
    val it = candidateFileDF(manifest, column, lo, hi)
      .toLocalIterator()
    val scans = Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map { i =>
        val batch = new scala.collection.mutable.ArrayBuffer[String]
        while (i.hasNext && batch.length < maxPathsPerBatch)
          batch += i.next().getString(0)
        // basePath keeps hive partition columns (path/date=.../part-*)
        // in the schema when reading explicit leaf files — without it
        // the pruned read and the empty-candidates branch would return
        // DIFFERENT schemas for the same table
        spark.read.option("basePath", path).parquet(batch.toSeq: _*)
      }
      .toSeq
    val base = scans.reduceOption(_.unionByName(_)).getOrElse {
      // schema WITHOUT listing the whole table (r13): the zero-hit fast
      // path used to build an InMemoryFileIndex over every file — a full
      // object-store listing on exactly the query that should be the
      // cheapest. The manifest already knows file paths; one known
      // file's footer (basePath keeps partition columns, matching the
      // pruned branch's schema) serves. Only a genuinely EMPTY manifest
      // falls back to the full read.
      val any = manifest.select(col("file")).limit(1).collect()
      val schema =
        if (any.nonEmpty)
          // the manifest entry can be stale (file compacted/vacuumed
          // since it was written); the zero-candidate query must not be
          // the one path that throws FileNotFound where the old
          // full-listing read succeeded — fall back to listing on any
          // read failure of the single-file probe (r14)
          try
            spark.read.option("basePath", path)
              .parquet(any(0).getString(0)).schema
          catch {
            case scala.util.control.NonFatal(_) =>
              spark.read.parquet(path).schema
          }
        else spark.read.parquet(path).schema
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema)
    }
    base.filter(col(column) >= lo && col(column) <= hi)
  }
}
