package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registry queries at a given scale factor,
  * clearing caches/persisted blocks between runs like graft.Bench does.
  *
  * Usage: runMain graft.QueryBench <queryName> [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.catalyst.GraftExtensions.install(spark)
    args.foreach { q =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(q)(spark, dir).count()
        println(f"BENCHLINE $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
