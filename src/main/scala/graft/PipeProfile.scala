package graft

import graft.llm.{Dedup, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the training-data pipeline (delete after use). */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.storage.StorageLevel
    val docs = Util.spread(Util.table(spark, sfDir, "documents"), "doc_id")

    val cleaned = docs.select(
      col("doc_id"), col("source"),
      TextFunctions.redactPii(TextFunctions.normalizeText(col("text")))
        .as("clean_text"))
      .withColumn("n_tokens",
        size(TextFunctions.tokens(col("clean_text"))).cast("long"))
      .filter(col("n_tokens") >= 5)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("clean+persist")(cleaned.count())

    val keepers = cleaned.groupBy(col("clean_text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactDeduped = cleaned.join(keepers, Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("exact-dedup+persist")(exactDeduped.count())

    val pairs = time("jaccard-pairs") {
      Dedup.jaccardPairsWithinGroupPrefix(
        exactDeduped, "doc_id", "clean_text", "source", 0.9)
    }
    val nearDeduped = time("cc+anti") {
      val nd = Dedup.dedupedCorpus(exactDeduped, "doc_id", pairs)
      nd.count(); nd
    }
    time("pack") {
      TextFunctions.packBins(nearDeduped, "doc_id", "n_tokens",
        "source", 256L).count()
    }
    time("full-second-run") {
      graft.pipeline.TrainingData.prepare(docs, "doc_id", "text", "source")
        .count()
    }
    spark.stop()
  }
}
