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
private[graft] object BatchLedger {
  private val Dir = "_committed"
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Compaction lock marker: `stateDir/_compact.lock`, created
    * fail-fast (no overwrite) before a fold and deleted after it. The
    * documented "must not run concurrently with an active stream"
    * contract was previously unenforced — a mis-scheduled compaction
    * raced the gate's probes silently; now [[withCompactionLock]] and
    * [[requireNoActiveCompaction]] make the race fail loudly instead.
    *
    * Liveness without leases: the holder heartbeats the lock's mtime
    * every [[LockHeartbeatMs]]; a lock not touched for [[LockStaleMs]]
    * belongs to a crashed holder and is broken with a warning (safe —
    * repairBatchStore repairs a crashed fold's two-phase window), so a
    * kill -9 mid-fold cannot wedge the stream forever. Best-effort by
    * design: it assumes roughly synchronized clocks on a shared
    * filesystem, the same assumption every mtime-lease scheme makes. */
  val LockName = "_compact.lock"
  val LockHeartbeatMs: Long = 30L * 1000
  val LockStaleMs: Long = 10L * 60 * 1000

  private def lockPath(stateDir: String) = new Path(stateDir, LockName)

  private def activeMsg(lock: Path): String =
    s"a compaction appears to be in progress (lock $lock heartbeat is " +
      "fresh): compactIndexes must not run concurrently with an active " +
      "stream's applyBatch or another compaction. If the compacting " +
      "process is known dead, delete the lock file or wait " +
      s"${LockStaleMs / 60000} minutes for it to go stale."

  /** Throw if a FRESH lock exists; break (delete) a stale one. */
  private def breakStaleOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                                lock: Path): Unit = {
    val st =
      try Some(fs.getFileStatus(lock))
      catch { case _: java.io.FileNotFoundException => None }
    st.foreach { s =>
      if (System.currentTimeMillis() - s.getModificationTime < LockStaleMs)
        throw new IllegalStateException(activeMsg(lock))
      log.warn(s"breaking stale compaction lock $lock (holder presumed " +
        "crashed; repairBatchStore repairs any half-finished fold)")
      fs.delete(lock, false)
    }
  }

  /** Gate entry check (applyBatch): fail loudly while a live compaction
    * holds the lock; silently break a stale lock from a crashed one. */
  def requireNoActiveCompaction(spark: SparkSession,
                                stateDir: String): Unit = {
    val lock = lockPath(stateDir)
    breakStaleOrThrow(
      lock.getFileSystem(spark.sparkContext.hadoopConfiguration), lock)
  }

  /** Run `f` holding the compaction lock, heartbeating its mtime from a
    * daemon thread so [[requireNoActiveCompaction]] can tell a live fold
    * from a crashed one. Used by [[compactStores]] and by
    * [[IngestDedup.compact]] (whose stores don't share one state dir). */
  def withCompactionLock[T](spark: SparkSession,
                            stateDir: String)(f: => T): T = {
    val lock = lockPath(stateDir)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    breakStaleOrThrow(fs, lock)
    try fs.create(lock, false).close()
    catch {
      case _: java.io.IOException =>
        throw new IllegalStateException(activeMsg(lock))
    }
    @volatile var done = false
    val hb = new Thread(() => {
      while (!done) {
        try Thread.sleep(LockHeartbeatMs)
        catch { case _: InterruptedException => () }
        if (!done)
          try fs.setTimes(lock, System.currentTimeMillis(), -1)
          catch { case _: java.io.IOException => () } // best-effort
      }
    }, "graft-compact-heartbeat")
    hb.setDaemon(true)
    hb.start()
    try f
    finally {
      done = true
      hb.interrupt()
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
    }
  }

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
    withCompactionLock(spark, stateDir) {
      graft.Util.runConcurrently(stores.map(
        p => () => graft.io.Parquet.compactBatchStore(spark, p, upTo)))
      prune(spark, stateDir, frontier)
    }
  }
}
