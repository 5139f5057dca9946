package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r17 optimization round): per-STAGE wall time for registry
  * queries, via a SparkListener. The guide's first step is to find which
  * stage the time goes to (scan, shuffle read, compute) before touching
  * anything; the Spark UI is disabled in this harness, so this prints the
  * same stage table the UI would show — duration, task count, shuffle
  * read/write, and the stage's callsite name — for the warm (second) run
  * of each named query.
  *
  * Usage: runMain graft.StageTimeProfile <sfDir> <queryName> [more...]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object StageTimeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev knob: extra confs as "k=v;k=v" for A/B experiments
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class St(id: Int, name: String, ms: Long, tasks: Int,
                  execRunMs: Long, cpuMs: Long, wb: Long, rb: Long,
                  inB: Long, inRows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val dur = (for (s <- i.submissionTime; c <- i.completionTime)
          yield c - s).getOrElse(-1L)
        if (m != null)
          stages.add(St(i.stageId, i.name, dur, i.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.inputMetrics.bytesRead, m.inputMetrics.recordsRead))
      }
    })

    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      // cold run (warms codegen, builds fixtures), then the profiled run
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val all = {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_.ms)
      }
      println(f"QUERY $q warm=$wall%.2f s stages=${all.size} " +
        f"stageWallSum=${all.map(_.ms).sum / 1e3}%.2f s")
      all.take(12).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
          f"run=${s.execRunMs}%7d ms cpu=${s.cpuMs}%7d ms " +
          f"wB=${s.wb}%9d rB=${s.rb}%9d inB=${s.inB}%10d " +
          f"inR=${s.inRows}%8d  ${s.name.take(90)}")
      }
    }
    spark.stop()
  }
}
