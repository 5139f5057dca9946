package graft.streaming

import graft.quality.Expectations
import graft.quality.Expectations.Expectation
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Quality-gated streaming ingest — continuous data validation as a
  * Structured Streaming query. Per micro-batch:
  *
  *   1. run the single-pass `Expectations` report on the batch (ONE hash
  *      aggregate for all checks, Expectations.scala);
  *   2. append the report, stamped with the batch id, to `metricsDir` —
  *      the quality time series a production pipeline alerts on;
  *   3. route the batch whole: every expectation passing → `outDir`,
  *      any failure → `quarantineDir` for inspection/replay. Batches are
  *      routed atomically (all rows or none) because a batch that fails a
  *      corpus-level expectation (mean shift, uniqueness collapse) is not
  *      separable into good and bad rows.
  *
  * Same at-least-once caveat as the other foreachBatch sinks: a replayed
  * batch can re-append metrics/output; ledger consumers dedup on
  * (batch_id, name). */
object QualityStream {

  def gatedIngest(spark: SparkSession, srcDir: String, outDir: String,
                  quarantineDir: String, metricsDir: String,
                  checkpointDir: String,
                  expectations: Seq[Expectation]): DataStreamWriter[Row] = {
    val schema = spark.read.parquet(srcDir).schema
    val gate: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      if (!batch.isEmpty) {
        val report = Expectations.check(batch.toDF(), expectations)
          .withColumn("batch_id", lit(batchId))
          .persist()
        val allPass = report.agg(min(col("pass"))).collect()(0).getBoolean(0)
        report.write.mode("append").parquet(metricsDir)
        batch.toDF().write.mode("append")
          .parquet(if (allPass) outDir else quarantineDir)
        report.unpersist()
      }
    }
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(gate)
  }
}
