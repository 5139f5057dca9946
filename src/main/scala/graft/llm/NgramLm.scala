package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the perplexity-style
  * quality filter (CCNet/KenLM pattern) re-expressed as hash aggregates:
  * documents whose token transitions are improbable under the corpus's
  * own bigram statistics are boilerplate, spam, or wrong-language, and
  * rank at the bottom.
  *
  * Model: add-one-smoothed bigram MLE. With c(u,w) the corpus count of
  * bigram (u,w), c(u) the count of u as a bigram CONTEXT (left element),
  * and V the corpus's distinct-token count,
  * `P(w|u) = (c(u,w) + 1) / (c(u) + V)`; a document's score is the mean
  * `ln P` over its bigrams (higher = more typical). Every step is
  * SQL-expressible, so the whole operator is oracle-checked end to end.
  *
  * Scale shape: the CONTEXT count table is vocabulary-sized and
  * broadcasts; the DISTINCT-BIGRAM table grows with the corpus (the
  * heavy tail never saturates vocab²), so it joins by shuffle — AQE
  * still broadcasts it when it measures small. The corpus side is one
  * narrow explode. V is a driver scalar folded in as a literal (one
  * aggregate, computed once at train time, not per row).
  */
object NgramLm {

  /** (doc_id, gram) corpus bigrams via the bound-token shingle builder;
    * u/w recovered by splitting on the single joining space (tokens are
    * space-split, so they cannot themselves contain one). */
  private def bigrams(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordNGrams(
          TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .withColumn("u", substring_index(col("gram"), " ", 1))

  /** Score every document against bigram statistics trained on the same
    * corpus: (doc_id, n_bigrams, avg_ll). Documents with fewer than two
    * tokens have no bigrams and are absent from the output.
    *
    * Each bigram's ln P is floored to exact integer MICROS before the
    * per-document sum (the Bm25.score pattern): a double `avg()` is
    * partial-aggregation-order-dependent, and the oracle harness compares
    * bits — the integer sum is order-independent, and the final
    * micros→double division replays bit-for-bit cross-engine. */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = bigrams(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = df.select(explode(TextFunctions.tokens(col(textCol)))
      .as("tok")).distinct().count()
    val bigramCounts = bi.groupBy(col("gram")).agg(count(lit(1)).as("cb"))
    val contextCounts = bi.groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val llMicros = floor(log((col("cb") + lit(1.0)) /
      (col("cu") + lit(vocab.toDouble))) * lit(1000000.0)).cast("long")
    // The DISTINCT-BIGRAM table is NOT broadcastable at corpus scale: its
    // cardinality grows with the corpus (heavy tail never saturates
    // vocab²), so forcing it onto the driver + every executor dies at
    // web scale — plain shuffle join, and AQE still broadcasts it when
    // it is actually small. The CONTEXT table is unigram-cardinality
    // (vocabulary-sized) and stays a forced broadcast.
    val scored = bi
      .join(bigramCounts, "gram")
      .join(broadcast(contextCounts), "u")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(llMicros).as("__ll_micros"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__ll_micros").cast("double") / lit(1000000.0) /
          col("n_bigrams")).as("avg_ll"))
    graft.Util.finishAndRelease(scored, bi)
  }

  /** Collocation mining by pointwise mutual information over adjacent
    * token pairs: PMI(u,w) = ln(p(u,w) / (p(u)·p(w))) with p from corpus
    * counts (T total bigrams, U total tokens). Computed as one
    * fixed-order double expression — ln((c_uw·U·U) / (T·c_u·c_w)) with
    * left-associated products — so the oracle replays it bit-for-bit.
    * All inputs are three hash aggregates; the unigram side joins twice
    * (left token, right token), both broadcast at vocabulary size. */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long): DataFrame = {
    val bi = df.select(explode(TextFunctions.wordNGrams(
        TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .select(substring_index(col("gram"), " ", 1).as("u"),
        substring_index(col("gram"), " ", -1).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totBigrams = bi.count()
    val uni = df.select(explode(TextFunctions.tokens(col(textCol)))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce: sum over an EMPTY vocabulary is NULL, and getLong on a
    // null cell throws — an empty batch must yield an empty result, not
    // a driver crash
    val totTokens = uni.agg(coalesce(sum(col("c")), lit(0L)))
      .collect()(0).getLong(0)
    val pairs = bi.groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("c_uw"))
      .filter(col("c_uw") >= minCount)
    val out = pairs
      .join(broadcast(uni.select(col("tok").as("u"), col("c").as("c_u"))),
        "u")
      .join(broadcast(uni.select(col("tok").as("w"), col("c").as("c_w"))),
        "w")
      .select(col("u"), col("w"), col("c_uw"),
        log(col("c_uw") * lit(1.0) * lit(totTokens) * lit(totTokens) /
          (lit(totBigrams) * lit(1.0) * col("c_u") * col("c_w")))
          .as("pmi"))
    graft.Util.finishAndRelease(out, bi, uni)
  }
}
