package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage SHUFFLE BYTES for registry queries, via a
  * SparkListener (no UI required — `spark.ui.enabled` stays false). The
  * point is a committed baseline of shuffle volume for the heavy dedup
  * queries: wall-clock noise on a shared box hides regressions, but
  * shuffle bytes are deterministic for a fixed corpus, so a future data
  * regeneration or plan change diffs against the PERF.md table instead
  * of guesswork.
  *
  * Usage: runMain graft.ShuffleProfile <sfDir> <queryName> [queryName...]
  * Output: one line per stage with write/read shuffle bytes and records,
  * then a per-query total.
  */
object ShuffleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_multisignal_dedup", "q_dedup_corpus", "q_dedup_clusters")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // stageId -> (name, writeBytes, readBytes, writeRecords, readRecords)
    case class St(id: Int, name: String, wb: Long, rb: Long, wr: Long,
                  rr: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null)
          stages.add(St(e.stageInfo.stageId,
            e.stageInfo.name.takeWhile(_ != '\n'),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.recordsWritten,
            m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def mb(b: Long): String = f"${b / 1048576.0}%8.1f MB"
    import scala.jdk.CollectionConverters._
    // the listener bus is ASYNC: the warm-up job's stage events may still
    // be queued, and clearing before they drain would attribute them to
    // the first profiled query — a polluted first row in a table whose
    // whole point is deterministic regression diffing. Stabilize first.
    def drainUntilStable(): Unit = {
      var last = -1
      var stable = 0
      while (stable < 5) {
        Thread.sleep(200)
        val now = stages.size
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
    drainUntilStable()
    names.foreach { name =>
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      drainUntilStable()
      // a stage RE-ATTEMPT delivers a second completion event for the
      // same stageId; keep the last attempt so totals aren't doubled
      val st = stages.asScala.toSeq.groupBy(_.id).toSeq
        .map(_._2.last).sortBy(_.id)
      println(s"\n== $name (${f"$secs%.2f"} s, ${st.size} stages) ==")
      st.filter(s => s.wb > 0 || s.rb > 0).foreach { s =>
        println(f"  stage ${s.id}%4d  write ${mb(s.wb)} (${s.wr}%10d rows)" +
          f"  read ${mb(s.rb)} (${s.rr}%10d rows)  ${s.name.take(60)}")
      }
      println(f"  TOTAL      write ${mb(st.map(_.wb).sum)}" +
        f" (${st.map(_.wr).sum}%10d rows)  read ${mb(st.map(_.rb).sum)}" +
        f" (${st.map(_.rr).sum}%10d rows)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
