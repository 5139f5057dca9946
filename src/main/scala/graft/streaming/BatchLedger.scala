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

  /** Mutual-exclusion markers between a stream's applyBatch and a
    * compaction fold: `stateDir/_compact.lock` (held across a fold) and
    * `stateDir/_gate.lock` (held across one micro-batch's gate work).
    * Each side creates its OWN marker fail-fast (no overwrite), then
    * checks the OTHER side's marker and backs out loudly if it is
    * fresh — so BOTH interleavings fail fast: a compaction starting
    * while a batch is mid-probe, and a batch starting while a fold is
    * mid-swap. (Before r10 only the second direction was enforced.)
    *
    * Liveness without leases: the holder heartbeats its marker's mtime
    * every [[LockHeartbeatMs]]; a marker not touched for [[LockStaleMs]]
    * belongs to a crashed holder and is broken with a warning (safe —
    * repairBatchStore repairs a crashed fold's two-phase window, and a
    * crashed batch is replayed by its checkpoint), so a kill -9 cannot
    * wedge the stream forever. Best-effort by design: it assumes
    * roughly synchronized clocks on a shared filesystem (every
    * mtime-lease scheme's assumption), and breaking a stale marker
    * re-checks the mtime immediately before the delete so a competitor
    * that just re-created the file is not clobbered (the residual
    * stat-to-delete window is microseconds, vs the minutes-long fold
    * race this guards). */
  val CompactLockName = "_compact.lock"
  val GateLockName = "_gate.lock"
  val LockHeartbeatMs: Long = 30L * 1000

  /** Six missed heartbeats. The staleness window is also the worst-case
    * RESTART DELAY after a kill -9 (the dead holder's marker looks live
    * until it ages out, and the restarted stream's first batch fails
    * loudly until then), so it is kept tight: long legitimate holds are
    * covered by the heartbeat, not the window. */
  val LockStaleMs: Long = 3L * 60 * 1000

  private def activeMsg(lock: Path): String =
    s"marker $lock has a fresh heartbeat: compactIndexes must not run " +
      "concurrently with an active stream's applyBatch (or a second " +
      "compaction). If the holding process is known dead, delete the " +
      s"marker or wait ${LockStaleMs / 60000} minutes for it to go stale."

  /** Throw if a FRESH marker exists; break (delete) a stale one. The
    * mtime is re-read immediately before the delete: if it moved, a
    * competitor already broke-and-reacquired, so treat it as held. */
  private def breakStaleOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                                lock: Path): Unit = {
    val st =
      try Some(fs.getFileStatus(lock))
      catch { case _: java.io.FileNotFoundException => None }
    st.foreach { s =>
      if (System.currentTimeMillis() - s.getModificationTime < LockStaleMs)
        throw new IllegalStateException(activeMsg(lock))
      val still =
        try fs.getFileStatus(lock).getModificationTime == s.getModificationTime
        catch { case _: java.io.FileNotFoundException => false }
      if (still) {
        log.warn(s"breaking stale lock marker $lock (holder presumed " +
          "crashed; repairBatchStore repairs any half-finished fold)")
        fs.delete(lock, false)
      } else throw new IllegalStateException(activeMsg(lock))
    }
  }

  /** Acquire `ownName`, verify `otherName` is absent/stale, heartbeat
    * own marker from a daemon thread while `f` runs, release. Backs out
    * (releasing its own marker) if the other side holds a fresh one, so
    * a simultaneous start fails LOUDLY on both sides rather than racing
    * — the stream's retry then re-runs the batch cleanly. */
  private def withLock[T](spark: SparkSession, stateDir: String,
                          ownName: String, otherName: String)(f: => T): T = {
    val own = new Path(stateDir, ownName)
    val other = new Path(stateDir, otherName)
    val fs = own.getFileSystem(spark.sparkContext.hadoopConfiguration)
    breakStaleOrThrow(fs, own)
    try fs.create(own, false).close()
    catch {
      case _: java.io.IOException =>
        throw new IllegalStateException(activeMsg(own))
    }
    try breakStaleOrThrow(fs, other)
    catch {
      case e: IllegalStateException =>
        try fs.delete(own, false)
        catch { case _: java.io.IOException => () }
        throw e
    }
    @volatile var done = false
    val hb = new Thread(() => {
      while (!done) {
        try Thread.sleep(LockHeartbeatMs)
        catch { case _: InterruptedException => () }
        if (!done)
          try fs.setTimes(own, System.currentTimeMillis(), -1)
          catch { // a dead heartbeat must not kill the fold itself
            case scala.util.control.NonFatal(_) => ()
          }
      }
    }, s"graft-lock-heartbeat-$ownName")
    hb.setDaemon(true)
    hb.start()
    try f
    finally {
      done = true
      hb.interrupt()
      try fs.delete(own, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Run a compaction fold holding `_compact.lock`; fails loudly if a
    * gate's micro-batch is in flight. Used by [[compactStores]] and by
    * [[IngestDedup.compact]] (whose stores don't share one state dir). */
  def withCompactionLock[T](spark: SparkSession,
                            stateDir: String)(f: => T): T =
    withLock(spark, stateDir, CompactLockName, GateLockName)(f)

  /** Run one micro-batch's gate work holding `_gate.lock`; fails loudly
    * if a compaction fold is in flight (the pre-r10 entry check only
    * caught the batch-starts-second interleaving). */
  def withGateLock[T](spark: SparkSession, stateDir: String)(f: => T): T =
    withLock(spark, stateDir, GateLockName, CompactLockName)(f)

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
