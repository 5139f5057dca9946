package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Append-only commit ledger shared by the exactly-once micro-batch gates
  * ([[SimilarityIngest]], [[IngestDedup]]): one empty marker file
  * `_committed/batch-<id>` per committed nonempty batch, created as the
  * LAST write of the batch. Existence is the commit record — nothing is
  * ever rewritten, so there is no crash window in which the ledger itself
  * can be lost or truncated (an overwritten single-file stamp has exactly
  * that window, and a corrupted stamp would wedge or mis-route every
  * subsequent replay). */
private[streaming] object BatchLedger {
  private val Dir = "_committed"

  /** Highest committed batch id, -1 before the first commit. */
  def last(spark: SparkSession, stateDir: String): Long = {
    val dir = new Path(stateDir, Dir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      // strict name match, not startsWith: a stray editor/tool artifact
      // ("batch-2~", "batch-2.tmp") in the ledger dir must be ignored,
      // not crash every subsequent batch inside toLong
      .collect { case s if s.matches("batch-\\d+") => s.drop(6).toLong }
      .maxOption.getOrElse(-1L)
  }

  def stamp(spark: SparkSession, stateDir: String, batchId: Long): Unit = {
    val marker = new Path(new Path(stateDir, Dir), s"batch-$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
  }

  /** Remove markers strictly below `keepMax` — only the max is
    * load-bearing ([[last]] takes `maxOption`), so pruning keeps the
    * ledger listing O(1) over years of batches. */
  def prune(spark: SparkSession, stateDir: String, keepMax: Long): Unit = {
    val dir = new Path(stateDir, Dir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.matches("batch-\\d+") &&
        p.getName.drop(6).toLong < keepMax)
      .foreach(p => fs.delete(p, false))
  }

  /** COMMITTED-batch-isolated read of one of a gate's batch-keyed stores:
    * a crashed batch's half-written `batch=N` rows (on disk until its
    * replay overwrites them) are pruned via the ledger, so readers never
    * observe an uncommitted verdict; the compacted base is `batch=-1`,
    * always <= any committed frontier. Throws IllegalStateException
    * before the first nonempty batch commits — shared by both
    * multi-store gates so the contract cannot drift between them. */
  def committedRead(spark: SparkSession, stateDir: String,
                    path: String): org.apache.spark.sql.DataFrame = {
    val frontier = last(spark, stateDir)
    if (frontier < 0L) throw new IllegalStateException(
      s"no committed batches at $stateDir yet — accepted()/quarantined() " +
        "have no schema to return before the first nonempty batch commits")
    spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("batch") <= frontier)
  }

  /** Fold all committed batches up to `upToBatch` (clamped to the ledger
    * frontier) into each store's `batch=-1` base segment — concurrently,
    * the stores are independent directories — then prune ledger markers
    * below the retained maximum. The shared body of the gates'
    * compactIndexes; see [[SimilarityIngest.compactIndexes]] for the
    * replay-semantics argument. */
  def compactStores(spark: SparkSession, stateDir: String,
                    stores: Seq[String], upToBatch: Long): Unit = {
    val frontier = last(spark, stateDir)
    if (frontier < 0L) return // nothing committed, nothing to fold
    val upTo = math.min(upToBatch, frontier)
    if (upTo < 0L) return
    graft.Util.runConcurrently(stores.map(
      p => () => graft.io.Parquet.compactBatchStore(spark, p, upTo)))
    prune(spark, stateDir, frontier)
  }
}
