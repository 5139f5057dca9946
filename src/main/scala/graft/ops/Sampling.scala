package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * All samplers cut on a hex prefix of `md5(id)`: no RNG state, no shuffle,
  * the same subset on any engine or cluster size, stable under re-runs and
  * backfills — the properties seeded `sample()` lacks, and the reason
  * production corpus pipelines sample this way. md5 is engine-portable, so
  * every sampler here oracle-checks exactly.
  *
  * `stratifiedHashSample` is the domain-mixing shape: each stratum (source
  * / language / quality band) gets its own keep-fraction, e.g. up-sample
  * curated sources and down-sample web crawl. Fractions are quantized to
  * 1/65536 (4 hex digits) — at corpus scale the quantization error is
  * negligible and the cut stays a pure string compare (codegen-friendly,
  * identical in any engine).
  */
object Sampling {

  /** Uniform keep-fraction cut on the first 4 hex digits of md5(id). */
  def hashFilter(id: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    val cut = math.floor(fraction * 65536).toInt
    if (cut >= 65536) lit(true)
    else substring(md5(id.cast("string")), 1, 4) < lit(f"$cut%04x")
  }

  /** Per-stratum deterministic sample: keep each row iff its id-hash falls
    * under its stratum's fraction (strata not listed use `default`). */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           default: Double): DataFrame = {
    val keep = fractions.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, frac)) =>
        acc.when(col(stratumCol) === stratum, hashFilter(col(idCol), frac))
    }.otherwise(hashFilter(col(idCol), default))
    df.filter(keep)
  }

  /** Importance (soft) sampling: keep each row with probability `rate`
    * (a per-row column in [0,1], clamped), decided by the same
    * deterministic md5 cut as `hashFilter` — so the keep decision is
    * reproducible, engine-portable, and MONOTONE in the rate: a row kept
    * at rate r stays kept at any higher rate (same hash, higher cut),
    * which makes curation thresholds tunable without resampling churn.
    * This is the "soft quality filter" shape: map a quality score to a
    * keep-rate (with a floor so no stratum is wiped out) instead of a
    * hard cutoff. Pure per-row filter — no shuffle, codegen-friendly. */
  def importanceSample(df: DataFrame, idCol: String, rate: Column): DataFrame = {
    // NaN rate -> 0.0, matching the null behavior (r13 review): Spark's
    // NaN total order makes greatest(NaN, 0.0)=NaN and least(NaN, 1.0)
    // =1.0, so the clamp alone INVERTS a broken quality signal into
    // keep-at-full-rate for exactly the rows whose signal failed (0/0
    // in a derived score). Dropping them matches null-rate rows.
    val rd = rate.cast("double")
    val r = least(greatest(when(isnan(rd), lit(0.0)).otherwise(rd),
      lit(0.0)), lit(1.0))
    val cutHex = lpad(lower(conv(
      floor(r * 65536).cast("int").cast("string"), 10, 16)), 4, "0")
    df.filter(r >= 1.0 ||
      substring(md5(col(idCol).cast("string")), 1, 4) < cutHex)
  }

  /** Deterministic proportional interleave (training curriculum order):
    * give every row a virtual timestamp `(k+1) / weight`, where `k` is its
    * rank within its stratum under a deterministic md5 shuffle — sorting by
    * the timestamp yields a stream in which each stratum appears in
    * proportion to its weight (weight 3 strata emit 3 rows for every 1 of
    * a weight-1 stratum), with no RNG state and no shuffle buffer. The
    * returned frame carries (`__vt` DOUBLE, `k` BIGINT); consumers
    * `orderBy(__vt, stratum, k)` — Spark's orderBy range-partitions, so the
    * global sort scales out; a contiguous global rank on top is `RowId`'s
    * zipWithIndex. The per-stratum rank is ONE window per stratum
    * (parallelism = #strata — the same per-shard shape as `packBins`;
    * weights are a per-run literal map, so the virtual-time arithmetic is a
    * fixed-order double expression, portable bit-for-bit). */
  def interleaveKey(df: DataFrame, idCol: String, stratumCol: String,
                    weights: Map[String, Double],
                    default: Double = 1.0,
                    tiebreak: Seq[Column] = Nil): DataFrame = {
    require((weights.values.toSeq :+ default).forall(_ > 0),
      "interleave weights must be positive")
    import org.apache.spark.sql.expressions.Window
    // (md5(id), id) is a total order only when ids are unique within a
    // stratum; duplicate (or null) ids tie completely and row_number's
    // assignment among them is partition-dependent — the same
    // determinism hole trainSample's tiebreak closed (r13 review).
    // Callers whose ids can repeat pass deterministic payload columns
    // as `tiebreak` to restore the no-RNG same-result-anywhere contract.
    val w = Window.partitionBy(col(stratumCol))
      .orderBy((Seq(md5(col(idCol).cast("string")), col(idCol)) ++
        tiebreak): _*)
    val weight = weights.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (stratum, wt)) => acc.when(col(stratumCol) === stratum, wt)
    }.otherwise(lit(default))
    df.withColumn("k", (row_number().over(w) - 1).cast("long"))
      .withColumn("__vt", (col("k") + lit(1)).cast("double") / weight)
  }
}
