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
}
