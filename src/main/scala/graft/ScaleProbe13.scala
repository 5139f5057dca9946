package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r13, VERDICT #5): sf1-class nonlinearity probe for the
  * THREE shapes round 12 changed — the stored exact-prefix dedup probe,
  * the 4-arm `q_url_domains` extraction, and the quality classifier's
  * explode_outer generate. Same protocol as the r11/r12 probes
  * (PERF.md): a seeded matched-distribution synthetic corpus (50k-word
  * Zipf-ish log-uniform vocabulary, 10–100 words/doc) at x1/x3/x10
  * prefix-subsets of one 50k-doc table — x1 ≈ the driver's sf0.1
  * documents (5k rows), x10 ≈ sf1. Min-of-2 wall through the noop sink.
  *
  * Usage: runMain graft.ScaleProbe13
  */
object ScaleProbe13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // Seeded corpus, same family as the r12 Zipf probe: word ids drawn
    // log-uniform over a 50k vocabulary via md5-derived uniforms (no
    // RNG state; any engine reproduces it), 10-100 words per doc.
    val root = "target/tmp/scaleprobe13"
    // completeness check, not bare dir existence: a run killed mid-write
    // leaves a partial parquet dir every later run would silently reuse,
    // recording wrong exponents — _SUCCESS lands only on a complete write
    val full = new java.io.File(s"$root/docs_x10/_SUCCESS")
    if (!full.exists()) {
      val n = 50000L
      val nWords = (lit(10) + pmod(
        conv(substring(md5(concat(lit("len"), col("id"))), 1, 8), 16, 10)
          .cast("long"), lit(91))).cast("int")
      // log-uniform over [0, 50k): exp(u * ln 50000), u from md5 bits
      def word(i: org.apache.spark.sql.Column) = {
        val u = conv(substring(md5(concat(col("doc_id"), lit("_"), i)),
          1, 8), 16, 10).cast("double") / lit(4294967296.0)
        concat(lit("w"),
          floor(exp(u * lit(math.log(50000.0)))).cast("long"))
      }
      val docs = spark.range(n)
        .select(col("id").as("doc_id"), nWords.as("n_words"))
        .select(col("doc_id"),
          concat_ws(" ",
            transform(sequence(lit(1), col("n_words")), i => word(i)))
            .as("text"))
      docs.repartition(32).write.mode("overwrite")
        .parquet(s"$root/docs_x10")
    }
    val d10 = spark.read.parquet(s"$root/docs_x10")
    def slice(x: Int): DataFrame = d10.filter(col("doc_id") < x * 5000L)

    def minOf2(label: String)(mk: => DataFrame): Double = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        s
      }
      val best = times.min
      println(f"PROBE $label: ${best}%.2f s (runs ${times.map(t => f"$t%.2f").mkString(", ")})")
      best
    }

    def expo(a: Double, b: Double, xa: Double, xb: Double): Double =
      math.log(b / a) / math.log(xb / xa)

    Seq(1, 3, 10).foreach { x =>
      println(s"== x$x (${x * 5000} docs) ==")
      val corpus = slice(x).filter(col("doc_id") % 10 =!= 0)
      val batch = slice(x).filter(col("doc_id") % 10 === 0)
      // 1) stored exact-prefix probe (the r12-changed registry shape):
      //    index built once per scale OUTSIDE the timed probe
      val idx = s"$root/exactidx_x$x"
      if (!new java.io.File(idx).exists())
        graft.llm.Dedup.writeExactPrefixIndex(corpus, "doc_id", "text",
          0.9, idx)
      minOf2(s"exact_prefix_probe_x$x")(
        graft.llm.Dedup.jaccardNewVsCorpusPrefixStored(spark, idx,
          batch, "doc_id", "text", 0.9))
      // 2) q_url_domains' 4-arm fixture shape over the scaled corpus
      minOf2(s"url_domains_x$x") {
        val withUrls = slice(x).select(col("doc_id"),
          concat(col("text"),
            lit(" see https://D"),
            pmod(col("doc_id"), lit(97)).cast("string"),
            lit(".example.org/p and http://m"),
            pmod(col("doc_id"), lit(13)).cast("string"),
            lit(".example.net/q plus HTTP://U"),
            pmod(col("doc_id"), lit(7)).cast("string"),
            lit(".EXAMPLE.COM/r and http://user@w"),
            pmod(col("doc_id"), lit(5)).cast("string"),
            lit(".example.org/s")).as("text"))
        graft.llm.CorpusHygiene.domainStats(withUrls, "doc_id", "text",
          blocklist = (0 until 7).map(i => s"m$i.example.net"))
      }
      // 3) quality classifier's explode_outer generate
      minOf2(s"quality_classifier_x$x")(
        graft.llm.QualityClassifier.score(slice(x), "doc_id", "text",
          graft.llm.QualityClassifier.hashWeights(spark, 4096), 4096))
    }
    println("exponent = ln(t_b/t_a) / ln(x_b/x_a); compute from the " +
      "PROBE lines above (x1->x10 and the honest x3->x10 tail)")

    // Candidate-mass adjudication for the exact probe: batch AND corpus
    // both scale with x, so candidate pairs grow ~x^2 on a fixed
    // vocabulary — the wall exponent is only meaningful against the
    // pair-count exponent (the r11 playbook). Replicates the kernel's
    // prep formulas (sorted distinct hashed token sets, prefix length
    // n - ceil(t*n) + 1, sizeBand + positional filter).
    val t = 0.9
    def prep(df: DataFrame) =
      df.select(col("doc_id").as("id"),
        array_sort(array_distinct(
          transform(split(col("text"), " "), w => xxhash64(w)))).as("ws"))
        .withColumn("n", size(col("ws")))
        .withColumn("p",
          (col("n") - ceil(col("n") * t - lit(1e-9)) + 1).cast("int"))
        .select(col("id"), col("n"),
          posexplode(org.apache.spark.sql.functions
            .slice(col("ws"), lit(1), col("p"))).as(Seq("pos", "h")))
    Seq(1, 3, 10).foreach { x =>
      val a = prep(slice(x).filter(col("doc_id") % 10 === 0)).alias("a")
      val b = prep(slice(x).filter(col("doc_id") % 10 =!= 0)).alias("b")
      val sizeBand = col("a.n") >= col("b.n") * t &&
        col("b.n") >= col("a.n") * t
      val positional =
        least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
          ceil((col("a.n") + col("b.n")) * lit(t / (1 + t)) - lit(1e-9))
      val joined = a.join(b, col("a.h") === col("b.h") && sizeBand &&
        positional)
      val rows = joined.count()
      val pairs = joined.select(col("a.id"), col("b.id")).distinct().count()
      println(s"COUNTS x$x: candidateRows=$rows distinctPairs=$pairs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
