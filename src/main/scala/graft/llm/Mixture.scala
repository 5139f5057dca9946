package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture weighting: temperature-scaled source sampling weights,
  * the standard recipe for balancing a multi-source pretraining corpus
  * (w_i proportional to p_i^alpha, alpha in (0,1] upweights small sources; alpha = 1
  * is natural proportion). Used to drive samplers like
  * `graft.ops.Sampling.interleaveKey` with per-source rates.
  */
object Mixture {

  /** Per-stratum temperature-scaled mixture weights. `sizeExpr` is the
    * size measure summed per stratum (token counts for an LLM mixture).
    * Output per stratum: raw size, natural share p, alpha-scaled sampling
    * weight, and boost = weight/p (the effective over/under-sampling
    * factor, > 1 for upweighted small strata).
    *
    * Scale shape: one map-side-combined aggregate over the corpus; the
    * global windows that normalize shares run over the AGGREGATED frame
    * (one row per stratum — dozens, not documents), so the single-partition
    * window is a driver-scale detail, not a data-scale one. Shares are
    * rounded to 6 dp to make the doubles stable across engines.
    */
  def mixtureWeights(df: DataFrame, stratumCol: String, sizeExpr: Column,
                     alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha=$alpha must be > 0")
    val byStratum = df.groupBy(col(stratumCol))
      .agg(sum(sizeExpr).cast("long").as("n_tokens"))
    val all = Window.partitionBy()
    // The normalizers must be ORDER-INDEPENDENT: token sums are exact
    // longs already, but a double sum of the pow() weights accumulates
    // in row-arrival order and can flip the 6-dp rounding between runs/
    // engines — so each weight is floored to exact integer PICOS (1e12;
    // weights are <= 1 and strata are dozens, so the long sum stays far
    // under 2^53 and the final double division replays bit-for-bit —
    // the Bm25/NgramLm integer-micros pattern).
    // zero-mass guards (r13 review): a stratum whose measure sums to 0
    // (or an all-null measure, coalesced to 0) must not crash the whole
    // mixture with ANSI DIVIDE_BY_ZERO in the boost division — it gets
    // p_natural 0, weight 0, boost 0 (no mass to upsample). A fully
    // zero-mass mixture likewise reports all-zero rows rather than 0/0.
    byStratum
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("__tot", sum(col("n_tokens")).over(all))
      .withColumn("__p",
        when(col("__tot") > 0, col("n_tokens") / col("__tot"))
          .otherwise(lit(0.0)))
      .withColumn("__w12",
        floor(pow(col("__p"), lit(alpha)) * lit(1e12)).cast("long"))
      .withColumn("__wsum", sum(col("__w12")).over(all).cast("double"))
      .select(col(stratumCol), col("n_tokens"),
        round(col("__p"), 6).as("p_natural"),
        round(when(col("__wsum") > 0,
          col("__w12").cast("double") / col("__wsum"))
          .otherwise(lit(0.0)), 6).as("weight"),
        round(when(col("__wsum") > 0 && col("__p") > 0,
          col("__w12").cast("double") / col("__wsum") / col("__p"))
          .otherwise(lit(0.0)), 6).as("boost"))
  }

  /** Whitespace token count — the mixture's default size measure. */
  /** Engine-wide tokenizer contract (TextFunctions.tokens): single-space
    * split, like every dedup/LM/BM25 operator and their oracles — NOT a
    * \\s+ regex; normalize whitespace upstream (normalizeText) first. */
  def tokenCount(text: Column): Column =
    size(TextFunctions.tokens(text)).cast("long")
}
