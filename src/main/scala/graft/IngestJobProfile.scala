package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r13, VERDICT #3): Spark JOBS per ingest-gate micro-batch.
  * At 10k micro-batches/day the per-job driver overhead (scheduling, DAG
  * build, listener traffic) is the scale term local[32] wall time cannot
  * see — a gate that spends 20 driver jobs per batch saturates the
  * driver long before the executors. This replays the registry gates'
  * batch sequences with a job-counting listener and prints jobs + stages
  * per applyBatch call, so a fusion change diffs on a deterministic
  * number.
  *
  * Usage: runMain graft.IngestJobProfile [sfDir]
  */
object IngestJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        // GRAFT_JOBPROF_AQE=0 measures the AQE-off job economy
        if (sys.env.get("GRAFT_JOBPROF_AQE").contains("0")) "false"
        else "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val jobSites =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // GRAFT_JOBPROF_SITES=1: name every job so the economy pass can
        // tell write actions from broadcast-exchange submits
        val sites = sys.env.getOrElse("GRAFT_JOBPROF_SITES", "")
        // properties can be NULL on jobs submitted without local
        // properties — an NPE here is swallowed by the bus but silently
        // drops the job from the histogram
        if (sites == "1" || sites == "2")
          jobSites.add(
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse(e.stageInfos.headOption.map(_.name)
                .getOrElse("?")))
        // sites=2: every job with its stage names — the job-to-plan map
        if (sites == "2")
          println(s"[job ${e.jobId}] " + e.stageInfos.map(si =>
            si.name.takeWhile(_ != '\n')).mkString(" | "))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // with GRAFT_INGEST_PROF=1 the gates' phase timers read this counter
    // and print per-PHASE job deltas (r14 — phase attribution for the
    // job-economy pass, not just per-batch totals). Unplugged in the
    // finally below (r14 ADVICE): the hook is process-global, and a later
    // gate run in the same JVM would otherwise read THIS run's stale
    // listener and print misattributed per-phase deltas.
    graft.streaming.IngestProf.jobCount = () => jobs.get
    def measured[T](label: String)(f: => T): T = {
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      jobs.set(0); stages.set(0); jobSites.clear()
      val t0 = System.nanoTime()
      val r = f
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      println(f"[jobs] $label%-28s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      if (!jobSites.isEmpty) {
        import scala.jdk.CollectionConverters._
        jobSites.asScala.groupBy(identity).toSeq.sortBy(-_._2.size)
          .foreach { case (site, n) =>
            println(s"[jobsite] ${n.size}x $site") }
      }
      r
    }

    try {
      // q_similarity_ingest's exact 3-batch replay — run TWICE (fresh
      // state each time): the first pass pays one-time codegen, the
      // second is the bench-comparable warm number
      val docs = Util.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      println(s"[jobs] batch input partitions = " +
        docs.filter(pmod(col("doc_id"), lit(3)) === 0L).rdd.getNumPartitions)
      for (pass <- Seq("cold", "warm")) {
        val simState = java.nio.file.Files
          .createTempDirectory(s"graft_jobprof_sim_$pass").toString
        for (b <- 0L to 2L) {
          val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
          measured(s"similarity $pass batch $b") {
            graft.streaming.SimilarityIngest.applyBatch(spark, simState,
              batch, b, "doc_id", "text")
          }
        }
        measured(s"similarity $pass compact") {
          graft.streaming.SimilarityIngest.compactIndexes(spark, simState)
        }
      }

      // q_embedding_ingest's 3-batch replay
      val emb = Util.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val embState = java.nio.file.Files
        .createTempDirectory("graft_jobprof_emb").toString
      for (b <- 0L to 2L) {
        val batch = emb.filter(pmod(col("vec_id"), lit(3)) === b)
        measured(s"embedding batch $b") {
          graft.streaming.EmbeddingIngest.applyBatch(spark, embState,
            batch, b, "vec_id", "embedding")
        }
      }

      // IngestDedup (third gate) 3-batch replay (r15, VERDICT #1 — the
      // sibling refactor landed in r14 with no jobs/batch number)
      val dedupState = java.nio.file.Files
        .createTempDirectory("graft_jobprof_dedup").toString
      for (b <- 0L to 2L) {
        val batch = docs.filter(pmod(col("doc_id"), lit(3)) === b)
        measured(s"dedup batch $b") {
          graft.streaming.IngestDedup.applyBatch(spark, batch, b,
            s"$dedupState/index", s"$dedupState/out", "doc_id", "text")
        }
      }
      // SummaryMaintenance commit economy (r16, VERDICT #5): jobs per
      // foreachBatch commit for each commit mode — maintained views run
      // in the same 10k-batches/day regime as the three gates, and
      // nothing else stops a footer-inference or broadcast job creeping
      // into the commit path
      val events = Util.table(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      def evBatch(b: Long) = events.filter(pmod(col("event_id"), lit(3)) === b)
      import graft.streaming.SummaryMaintenance
      for ((mode, buckets) <- Seq(("swap", 0), ("pointer", 0), ("pointer", 16))) {
        val label = if (buckets > 0) "bucketed" else mode
        val sumState = java.nio.file.Files
          .createTempDirectory(s"graft_jobprof_sum_$label").toString
        spark.conf.set(SummaryMaintenance.CommitModeKey, mode)
        if (buckets > 0)
          spark.conf.set(SummaryMaintenance.BucketsKey, buckets.toString)
        try {
          for (b <- 0L to 2L) {
            measured(s"summary $label batch $b") {
              SummaryMaintenance.applyBatch(spark, sumState,
                evBatch(b), b, Seq("user_id"), "value")
            }
          }
        } finally {
          spark.conf.unset(SummaryMaintenance.CommitModeKey)
          spark.conf.unset(SummaryMaintenance.BucketsKey)
        }
      }
    } finally graft.streaming.IngestProf.jobCount = () => -1
    spark.stop()
  }
}
