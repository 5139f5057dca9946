package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar sink/scan for engine outputs at scale: zstd parquet,
  * hive-style partitioning on a low-cardinality column so downstream
  * queries with a partition predicate read only matching directories
  * (partition pruning — visible as PartitionFilters in the scan node).
  */
object Parquet {

  /** NOTE on file alignment: this writes task-parallel — every task
    * emits one file per partition value it sees, so a wide upstream
    * (N tasks) over K partition values can create N×K files. That is
    * the right trade when partitions are large (parallel write
    * throughput) and the wrong one when they are small (footer storms
    * on read — see SummaryMaintenance's bucketed commit, which
    * repartitions by the partition column first). Callers own the
    * choice: pre-`repartition(partitionCols)` the frame for ~one file
    * per partition value, or pass it wide for parallel writes. */
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

  private val FoldTmpPrefix = ".__graft_fold_tmp-"

  /** Fold the committed `batch=<id>` subdirectories of a per-batch
    * (at-least-once) store layout — [[graft.llm.Dedup.putCorpusIndexBatch]],
    * [[graft.llm.SubstringDedup.putWindowIndexBatch]], the
    * [[graft.streaming.SimilarityIngest]] accepted/quarantine stores — into
    * ONE compacted base segment at `batch=-1`, leaving batches above
    * `upToBatch` untouched. This is the long-running-ingest fix: after 10k
    * micro-batches every probe of a per-batch store scans 10k tiny
    * directories; folding them restores O(data/targetFileBytes) files.
    *
    * Why `batch=-1` preserves the layout's replay semantics:
    * live batch ids are required non-negative, so the base can never
    * collide with a batch directory a replay overwrites, and the replay
    * prune `filter(batch =!= id)` always KEEPS the base. Callers must pass
    * an `upToBatch` at or below their commit frontier, so an uncommitted
    * (half-written) batch keeps its own subdir for its replay to overwrite.
    *
    * Crash-safe two-phase fold: phase A writes base ∪ batches ≤ upToBatch
    * to a dot-prefixed tmp dir INSIDE the leaf (invisible to parquet
    * partition discovery; Spark's `_SUCCESS` marks it complete); phase B —
    * delete old base, delete folded batch dirs, rename tmp to `batch=-1` —
    * is idempotent given the upToBatch recorded in the tmp dir's name, so
    * [[repairBatchStore]] replays it after a crash at any point. Must not
    * run concurrently with writers or other folds of the same store. */
  def compactBatchStore(spark: SparkSession, path: String, upToBatch: Long,
                        targetFileBytes: Long = 128L * 1024 * 1024,
                        compression: String = "zstd"): Unit = {
    import org.apache.hadoop.fs.Path
    require(upToBatch >= 0, s"upToBatch must be >= 0, got $upToBatch")
    repairBatchStore(spark, path)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val batchIds = fs.listStatus(dir).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .collect { case s if s.matches("batch=-?\\d+") => s.drop(6).toLong }
    val fold = batchIds.filter(id => id >= 0 && id <= upToBatch)
    if (fold.isEmpty) return // base-only (or empty) store: nothing to fold
    val hasBase = batchIds.contains(-1L)
    // output sizing from the on-disk bytes of exactly the folded inputs
    val srcDirs = (fold.map(id => s"batch=$id") ++
      (if (hasBase) Seq("batch=-1") else Nil)).map(new Path(dir, _))
    val bytes = srcDirs.flatMap(d => fs.listStatus(d).toSeq)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(dir, s"$FoldTmpPrefix$upToBatch")
    spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("batch") <= upToBatch)
      .drop("batch") // partition-dir attribution folds into the base
      .repartition(nOut)
      .write.mode("overwrite").option("compression", compression)
      .parquet(tmp.toString)
    finishFold(fs, dir, upToBatch)
  }

  /** Entries under `dir` that do NOT belong to a batch-keyed store
    * layout: anything that is not a hidden/metadata entry (`_`/`.`
    * prefix) or a `batch=<id>` partition dir. Batch-keyed writers refuse
    * dirs where this is nonempty — a legacy flat dataset cannot be
    * partition-pruned for exactly-once replay, and writing batch=N
    * subdirs next to foreign data would silently graft partitions onto
    * someone else's table. Shared so the three guard sites (ingest-gate
    * index roots, gate outDir, semantic index puts) cannot drift. */
  def foreignEntries(fs: org.apache.hadoop.fs.FileSystem,
                     dir: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filterNot(e => e.getPath.getName.startsWith("_") ||
        e.getPath.getName.startsWith("."))
      .filterNot(e => e.isDirectory &&
        e.getPath.getName.matches("batch=-?\\d+"))

  /** Is a fold's DESTRUCTIVE phase underway (or crashed mid-way) on this
    * store? True while a fold tmp dir exists WITH its `_SUCCESS` marker:
    * from that point until the final rename, the store's listing
    * transiently shows NEITHER the folded `batch=N` dirs NOR the
    * (dot-hidden) tmp, so a concurrent reader planning a scan inside the
    * window would silently miss every folded row.
    * [[graft.streaming.BatchLedger.committedRead]] polls this before
    * planning; phase A (tmp being written, no `_SUCCESS`) is
    * non-destructive and does not block readers. */
  def destructiveFoldPending(fs: org.apache.hadoop.fs.FileSystem,
                             dir: org.apache.hadoop.fs.Path): Boolean = {
    import org.apache.hadoop.fs.Path
    fs.exists(dir) && fs.listStatus(dir).exists { st =>
      st.isDirectory && st.getPath.getName.startsWith(FoldTmpPrefix) &&
        fs.exists(new Path(st.getPath, "_SUCCESS"))
    }
  }

  /** Complete (or roll back) an interrupted [[compactBatchStore]] fold.
    * Safe whenever no fold is concurrently running: a tmp dir WITH
    * `_SUCCESS` finished phase A, so its destructive phase B is replayed
    * to completion; one without it died mid-write and is discarded (the
    * original batch dirs are intact). No-op when no tmp dirs exist. */
  def repairBatchStore(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith(FoldTmpPrefix))
      .sortBy(_.getName.stripPrefix(FoldTmpPrefix).toLong)
      .foreach { tmp =>
        val upTo = tmp.getName.stripPrefix(FoldTmpPrefix).toLong
        if (fs.exists(new Path(tmp, "_SUCCESS"))) finishFold(fs, dir, upTo)
        else if (!fs.delete(tmp, true))
          throw new java.io.IOException(
            s"repairBatchStore: delete of incomplete fold $tmp failed")
      }
  }

  /** Idempotent destructive phase of a fold: while the tmp dir exists the
    * final rename has not happened, so any `batch=-1` present is the OLD
    * base (already folded into tmp) — delete it, delete the folded batch
    * dirs, rename tmp into place. A crash at any point replays this same
    * sequence from [[repairBatchStore]]. */
  private def finishFold(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path,
                         upTo: Long): Unit = {
    import org.apache.hadoop.fs.Path
    // r13 write-side fence: phase B deletes committed batch dirs — a
    // compaction whose lock hold was lost (overwriting-rename double-win,
    // stale-break) must REFUSE here, not merely detect the loss at its
    // next heartbeat. Checked again before the final rename: the deletes
    // above can take a while on a big store, and the rename is the point
    // of no return. No-op when no lock scope is active (repair paths run
    // under the caller's gate/compaction lock; bare library calls fence
    // nothing, as before).
    graft.Util.fenceDestructive()
    val tmp = new Path(dir, s"$FoldTmpPrefix$upTo")
    val base = new Path(dir, "batch=-1")
    if (fs.exists(base) && !fs.delete(base, true))
      throw new java.io.IOException(s"fold: delete of old base $base failed")
    fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.matches("batch=\\d+") &&
        p.getName.drop(6).toLong <= upTo)
      .foreach { p =>
        if (!fs.delete(p, true))
          throw new java.io.IOException(s"fold: delete of folded $p failed")
      }
    graft.Util.fenceDestructive()
    if (!fs.rename(tmp, base))
      throw new java.io.IOException(s"fold: rename $tmp -> $base failed")
  }
}
