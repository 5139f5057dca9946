package graft.pipeline

import org.apache.spark.sql.SparkSession

/** CLI entry point for the varinfo pipeline — the reference's
  * `Rscript varinfo-update.R` analog (README.md:39). Runs phase 1 and, if
  * the human-edited checkpoint file exists, phase 2 (§3.4 protocol).
  *
  * Usage: graft.pipeline.Main <responseCsv> <priorVarinfoCsv> <workDir>
  *   [surveyYear] [joinColumnText] [maxDistance]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: Main <responseCsv> <priorVarinfoCsv> <workDir> " +
          "[surveyYear] [joinColumnText] [maxDistance]")
      sys.exit(2)
    }
    val cfg = VarinfoConfig(
      surveyYear = if (args.length > 3) args(3) else "2025",
      joinColumnText = if (args.length > 4) args(4) else "QuestionText.2023",
      maxStringDistance = if (args.length > 5) args(5).toInt else 6,
      responseFile = args(0),
      priorVarinfoFile = args(1),
      workDir = args(2),
      varinfoFolder = args(2))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-varinfo-update")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)
    try VarinfoUpdate.run(spark, cfg)
    finally spark.stop()
  }
}
