package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main (r17): micro-compare expression kernels in isolation
  * with codegen fallback DISABLED, so a silent interpreted fallback of a
  * custom expression shows up as a hard error instead of a 30× slowdown.
  * Usage: runMain graft.MicroBench
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 200k pairs of 200-element sorted long arrays with real overlap
    val df = spark.range(200000L).select(
      sequence(col("id") % 97, col("id") % 97 + 199).as("a"),
      sequence(col("id") % 89, col("id") % 89 + 199).as("b"))
      .localCheckpoint()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 3).foreach { _ =>
      time("array_intersect") {
        df.select(size(array_intersect(col("a"), col("b"))).as("c"))
          .agg(sum("c")).collect()
      }
      time("sorted_intersect_count") {
        import org.apache.spark.sql.graft.GraftSql
        df.select(GraftSql.column(graft.catalyst.SortedIntersectCount(
            GraftSql.expression(col("a")), GraftSql.expression(col("b"))))
            .as("c"))
          .agg(sum("c")).collect()
      }
    }
    spark.stop()
  }
}
