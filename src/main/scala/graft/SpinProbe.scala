package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: run one registry query in a loop while a sampler thread
  * attributes each executor thread's CPU-time DELTA to its current stack
  * — a poor man's CPU profiler for the 32-core CPU-inflation hunt
  * (guide §7.3 thread-dump playbook, in-process). */
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val q = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    val fn = SparkEntry.queries(q)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    val cpuNs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val lastCpu = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      val mx = java.lang.management.ManagementFactory.getThreadMXBean
      while (!stop) {
        for (ti <- mx.dumpAllThreads(false, false)
             if ti.getThreadName.startsWith("Executor task launch")) {
          val id = ti.getThreadId
          val cpu = mx.getThreadCpuTime(id)
          val prev = lastCpu.getOrDefault(id, cpu)
          lastCpu.put(id, cpu)
          val delta =
            if (sys.env.get("GRAFT_SPIN_ALL").contains("1")) 5000000L
            else cpu - prev
          val st = ti.getStackTrace
          if (delta > 0 && st.nonEmpty) {
            val sig = st.take(5).map(f => f.getClassName.replaceAll(
              "^org.apache.spark", "o.a.s") + "." + f.getMethodName)
              .mkString(" <- ")
            cpuNs.merge(sig, delta, (a, b) => a + b)
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true); sampler.start()
    for (_ <- 0 until 3)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    stop = true; Thread.sleep(50)
    import scala.jdk.CollectionConverters._
    val tot = cpuNs.values.asScala.map(_.toLong).sum / 1e9
    println(f"TOTAL attributed CPU: $tot%.1f s")
    cpuNs.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (sig, ns) =>
      println(f"${ns / 1e9}%8.2f s  $sig")
    }
    spark.stop()
  }
}
