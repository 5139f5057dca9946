package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r14): scale demonstration for the window-index probe's
  * semi→inner rewrite (SubstringDedup.occurrencesInIndex, PERF.md).
  *
  * Protocol: the BATCH is FIXED (5k docs) while the stored window index
  * grows x1/x3/x10 — the gate's real regime, where corpus growth must
  * not grow per-batch cost. The broadcast threshold is pinned between
  * the batch's size and the x3 index's size, so the planner faces the
  * 100 TB decision in miniature: the batch always fits the build side,
  * the index soon does not. Both probe shapes run under the gates'
  * conditions (AQE off):
  *
  *  - NEW (inner + batch-sized distinct): the planner broadcasts the
  *    batch; the index stays a SCAN — shuffle write rows stay flat as
  *    the index grows.
  *  - OLD (left_semi replica): Spark can only build the RIGHT side of a
  *    semi join — the index — so past the threshold it sort-merge-joins,
  *    shuffling the WHOLE index per probe: shuffle rows grow ~linearly
  *    with the corpus.
  *
  * Usage: runMain graft.ScaleProbe14
  */
object ScaleProbe14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // the gates' micro-batch conditions: AQE off, so the static
      // planner's join choice is the one that runs (no runtime re-plan)
      .config("spark.sql.adaptive.enabled", "false")
      // between batch-windows size (~1-2 MB) and the x3 index (~6 MB):
      // the batch is always broadcastable, the index stops being so
      .config("spark.sql.autoBroadcastJoinThreshold", (4L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // r15: the shipped probe is size-gated (small indexes take the
    // broadcast-semi arm — exactly the OLD shape this probe measures as
    // its baseline). Force the gate shut so probe_inner measures the
    // at-scale inner+distinct arm at every x.
    spark.conf.set(graft.llm.SubstringDedup.SemiIndexBytesKey, "0")

    // the ScaleProbe13 seeded corpus family (md5-derived log-uniform
    // vocabulary, 10-100 words/doc) — regenerated here so the probes
    // stay independently runnable
    val root = "target/tmp/scaleprobe14"
    val full = new java.io.File(s"$root/docs_x10/_SUCCESS")
    if (!full.exists()) {
      val n = 50000L
      val nWords = (lit(10) + pmod(
        conv(substring(md5(concat(lit("len"), col("id"))), 1, 8), 16, 10)
          .cast("long"), lit(91))).cast("int")
      def word(i: org.apache.spark.sql.Column) = {
        val u = conv(substring(md5(concat(col("doc_id"), lit("_"), i)),
          1, 8), 16, 10).cast("double") / lit(4294967296.0)
        concat(lit("w"),
          floor(exp(u * lit(math.log(50000.0)))).cast("long"))
      }
      spark.range(n)
        .select(col("id").as("doc_id"), nWords.as("n_words"))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(sequence(lit(1), col("n_words")), i => word(i)))
            .as("text"))
        .repartition(32).write.mode("overwrite")
        .parquet(s"$root/docs_x10")
    }
    val d10 = spark.read.parquet(s"$root/docs_x10")
    // batch FIXED and disjoint from every corpus slice
    val batch = d10.filter(col("doc_id") >= 45000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()
    val k = 8

    val collector = new Bench.ShuffleByteCollector
    spark.sparkContext.addSparkListener(collector)
    def measured(label: String)(mk: => DataFrame): Unit = {
      val results = (1 to 2).map { _ =>
        org.apache.spark.graft.ListenerBridge
          .waitUntilEmpty(spark.sparkContext)
        collector.reset()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge
          .waitUntilEmpty(spark.sparkContext)
        val (_, rows) = collector.totals
        spark.catalog.clearCache()
        batch.persist(); batch.count() // keep the fixed batch pinned
        (s, rows)
      }
      val best = results.minBy(_._1)
      println(f"PROBE $label: ${best._1}%.2f s shuffleRows=${best._2} " +
        f"(runs ${results.map(r => f"${r._1}%.2f/${r._2}").mkString(", ")})")
    }

    Seq(1, 3, 10).foreach { x =>
      val corpus = d10.filter(col("doc_id") < x * 4500L)
      val idx = s"$root/windex_x$x"
      if (!new java.io.File(s"$idx/_params").exists())
        graft.llm.SubstringDedup.writeWindowIndex(corpus, "doc_id",
          "text", k, idx)
      println(s"== x$x (index from ${x * 4500} docs, batch fixed 5000) ==")
      // NEW shape: the shipped probe
      measured(s"probe_inner_x$x")(
        graft.llm.SubstringDedup.dedupSubstringsVsIndex(
          batch, "doc_id", "text", k, idx))
      // OLD shape replica: semi/anti with the index on the right — the
      // pre-r14 plan, kept here ONLY as the measurement baseline
      measured(s"probe_semi_x$x") {
        val wins = graft.llm.SubstringDedup.hashedWindows(
          batch, "doc_id", "text", k)
        val idxDf = spark.read.parquet(idx).select(col("whash"))
        val inCorpus = wins.join(idxDf, Seq("whash"), "left_semi")
          .select(col("doc_id"), col("pos"))
        val fresh = wins.join(idxDf, Seq("whash"), "left_anti")
          .select(col("doc_id"), col("pos"))
        inCorpus.unionByName(fresh)
      }
    }
    println("expected: probe_inner shuffleRows ~flat in x; probe_semi " +
      "shuffleRows grow with the index once it passes the 4 MB threshold")
    spark.stop()
  }
}
