package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's time travel over plain parquet: every write lands in a fresh
  * immutable `v=NNNNN` directory and a one-line `_LATEST` pointer file is
  * swapped atomically afterwards. Readers resolve the pointer (or any
  * pinned version) and read an immutable snapshot — so a reader can never
  * observe a half-written table, writers never touch a directory a reader
  * might hold open, and yesterday's corpus stays reproducible until
  * vacuumed. The same append-only + pointer-swap discipline table formats
  * implement in their metadata layer, built from two filesystem
  * primitives.
  *
  * Concurrency contract: SINGLE writer (the pointer swap is
  * last-writer-wins, like the reference pipeline's checkpoint files);
  * any number of concurrent readers.
  */
object Versioned {

  private val Pointer = "_LATEST"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dir(root: String, v: Long) = f"$root/v=$v%05d"

  /** All committed versions, ascending. Committed = the directory holds
    * the parquet committer's `_SUCCESS` marker — a bare `v=` directory is
    * a crashed write in progress and must stay invisible, or the
    * no-pointer fallback would hand readers a half-written snapshot (and
    * the next write() would reuse the orphan's slot while someone reads
    * it). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=") &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  /** Version the `_LATEST` pointer names, if any. Falls back to the
    * highest committed directory when the pointer is missing. A crash
    * between write and swap leaves the new version committed-but-unnamed:
    * readers resolving the stale pointer keep the previous snapshot, and
    * the next `write` allocates PAST the orphan (see write) — it becomes
    * a dead-but-safe slot until vacuumed. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    pointerVersion(spark, root).orElse(versions(spark, root).lastOption)

  /** The pointer file's version alone (no directory listing), None when
    * the pointer is missing — split out (r13) so write() can combine one
    * pointer read with ONE listing instead of the pointer-missing path
    * paying two full listStatus passes plus 2N _SUCCESS probes. */
  private def pointerVersion(spark: SparkSession,
                             root: String): Option[Long] = {
    val f = fs(spark, root)
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Write a new immutable version and swing the pointer. Returns the
    * committed version number. */
  def write(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    // Next slot = one past BOTH the pointer and the highest committed
    // directory. The pointer alone is not enough: a crash between the
    // previous write's parquet commit and its pointer swap leaves a
    // committed (_SUCCESS-bearing) snapshot the pointer does not name —
    // versions() exposes it and a reader may pin it, so its slot must
    // never be reused. Uncommitted leftovers (no _SUCCESS) stay invisible
    // and ARE safely overwritten.
    val committed = versions(spark, root).lastOption
    val v = math.max(
      pointerVersion(spark, root).orElse(committed).map(_ + 1)
        .getOrElse(0L),
      committed.map(_ + 1).getOrElse(0L))
    df.write.mode("overwrite").parquet(dir(root, v))
    val tmp = new Path(root, s"$Pointer.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(root, Pointer)
    // single overwriting rename (FileContext), NOT delete-then-rename: a
    // crash between those two leaves no pointer at all and silently
    // downgrades every reader to the listing fallback
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    v
  }

  def readLatest(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, latestVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no versions at $root")))

  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(dir(root, v))

  /** Drop all but the newest `keep` versions (never the pointed-to one).
    * Readers pinned to a vacuumed version fail on their NEXT read — the
    * retention window is the reproducibility contract, same as any table
    * format's vacuum. */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"keep=$keep must be >= 1")
    val f = fs(spark, root)
    val current = latestVersion(spark, root)
    val all = versions(spark, root)
    val drop = all.dropRight(keep).filterNot(current.contains)
    drop.foreach(v => f.delete(new Path(dir(root, v)), true))
    drop
  }
}
