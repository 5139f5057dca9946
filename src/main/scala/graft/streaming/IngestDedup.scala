package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest dedup gate — the incremental-dedup loop run as a
  * Structured Streaming query. Per micro-batch:
  *
  *   1. near-dup-check the batch against the STORED MinHash corpus index
  *      (`Dedup.minhashLshNewVsIndex` — the corpus side is two parquet
  *      scans, per-batch cost O(batch));
  *   2. write accepted (non-duplicate) documents to the output corpus;
  *   3. append the accepted documents' shingle sets + band buckets to the
  *      index, so every LATER batch dedups against them with no corpus
  *      recompute.
  *
  * Semantics and caveats (the honest contract of this shape):
  *  - duplicates WITHIN one micro-batch are not cross-checked against each
  *    other (except the bootstrap batch, which is self-deduped because it
  *    becomes the corpus) — run `Dedup.minhashLshPairs` on the batch first
  *    if intra-batch dups matter at your batch size;
  *  - `foreachBatch` is at-least-once on failure/retry: a replayed batch
  *    can re-append output rows and index entries. Duplicate index entries
  *    only add candidate pairs (harmless to the gate — the verify step is
  *    exact). For exactly-once output use [[SimilarityIngest]] — the
  *    evolution of this gate whose batch-keyed writes, per-batch index
  *    layout, and append-only commit ledger make every crash window
  *    replay-convergent (a batch-keyed output bolted onto THIS gate's
  *    flat index would clobber itself: a replay whose docs match their
  *    own index entries would overwrite the batch dir with an empty
  *    accepted set);
  *  - the gate itself is LSH-based (recall < 1 by the S-curve); use
  *    `Dedup.jaccardNewVsCorpusPrefix` per batch where the gate must be
  *    lossless.
  */
object IngestDedup {

  /** Build the gated ingest stream; caller `.start()`s it (and typically
    * `processAllAvailable()` in tests). The source schema is taken from the
    * existing files under `srcDir`. */
  def dedupIngest(spark: SparkSession, srcDir: String, indexPath: String,
                  outDir: String, checkpointDir: String,
                  idCol: String, textCol: String,
                  shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
                  threshold: Double = 0.8): DataStreamWriter[Row] = {
    val schema = spark.read.parquet(srcDir).schema
    val gate: (Dataset[Row], Long) => Unit = (batch, _) => {
      if (!batch.isEmpty) {
        // bootstrap: before any index exists (fresh pipeline, no prior
        // writeCorpusIndex), the first batch IS the corpus — accept it
        // and WRITE (not append) the index so the parameter stamp lands
        val fs = new org.apache.hadoop.fs.Path(indexPath + "/docs")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        // BOTH halves must exist before the gate may probe: a bootstrap
        // crash between writeCorpusIndex's docs and buckets writes would
        // otherwise route the replay to the gate branch, whose read of
        // the missing buckets dir fails on every retry — a wedged stream
        val bootstrapped =
          fs.exists(new org.apache.hadoop.fs.Path(indexPath + "/docs")) &&
          fs.exists(new org.apache.hadoop.fs.Path(indexPath + "/buckets"))
        if (!bootstrapped) {
          // The output write below is mode=overwrite (that is the
          // bootstrap's replay-safety) — it must never be pointed at data
          // it did not write itself. A marker created BEFORE the first
          // output write distinguishes "our own half-committed bootstrap
          // output" (overwrite allowed on replay) from "a pre-existing
          // corpus the caller pointed us at" (refuse loudly).
          val bootMark =
            new org.apache.hadoop.fs.Path(indexPath + "/_bootstrap_started")
          if (!fs.exists(bootMark)) {
            val outP = new org.apache.hadoop.fs.Path(outDir)
            require(!fs.exists(outP) || fs.listStatus(outP).isEmpty,
              s"dedupIngest bootstrap would OVERWRITE non-empty $outDir; " +
                "point outDir at a fresh directory (the accepted corpus " +
                "is built here from batch one)")
            fs.create(bootMark, true).close()
          }
          // intra-batch near-dups are removed here (the gate can't do it:
          // there is no index yet and the batch IS the corpus) — without
          // this, first-batch duplicates live in the corpus forever
          val pairs = Dedup.minhashLshPairs(batch.toDF(), idCol, textCol,
            shingleN, numHashes, bands, threshold)
          val accepted = Dedup.dedupedCorpus(batch.toDF(), idCol, pairs)
            .persist()
          // crash-safe ordering: the output write is OVERWRITE (outDir
          // holds nothing but this batch at bootstrap, so a replay
          // rewrites the same rows instead of appending a second copy)
          // and the index lands last. A retry after any crash converges:
          // index absent -> bootstrap re-runs idempotently; index
          // present -> the gate flags the whole batch as dups of itself
          // and appends nothing, and the output is already down.
          accepted.write.mode("overwrite").parquet(outDir)
          Dedup.writeCorpusIndex(accepted, idCol, textCol, indexPath,
            shingleN, numHashes, bands)
          accepted.unpersist()
        } else {
          val dups = Dedup.minhashLshNewVsIndex(batch.toDF(), indexPath,
              idCol, textCol, shingleN, numHashes, bands, threshold)
            .select(col("new_id").as("__graft_dup")).distinct()
          val accepted = batch.toDF()
            .join(dups, batch(idCol) === col("__graft_dup"), "left_anti")
            .persist()
          accepted.write.mode("append").parquet(outDir)
          Dedup.appendCorpusIndex(accepted, idCol, textCol, indexPath,
            shingleN, numHashes, bands)
          accepted.unpersist()
        }
      }
    }
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(gate)
  }
}
