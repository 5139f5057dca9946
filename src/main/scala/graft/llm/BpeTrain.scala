package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule training over a corpus — the vocabulary
  * induction step of an LLM data pipeline, as iterative pair-count
  * aggregations instead of a single-machine heap.
  *
  * Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
  * not the raw corpus: one hash aggregate collapses any corpus to its
  * distinct words with counts, and every merge round after that touches
  * only that table. That is the whole scale story — a 100 TB corpus has a
  * vocabulary of maybe 10^7 distinct words, so round cost is independent
  * of corpus size; only the initial word count scans the data.
  *
  * Each round: count adjacent symbol pairs weighted by word frequency,
  * pick the winner deterministically (count desc, then left/right symbol
  * lexicographic), rewrite symbol arrays with a greedy left-to-right
  * non-overlapping fold. Two physical paths with identical results
  * (asserted in LlmSpec):
  *  - driver fast path when the word table fits comfortably on the driver
  *    (the common case, and always the case at test scale) — collect once,
  *    loop locally, zero per-round Spark jobs;
  *  - distributed path for vocabularies that don't: per-round pair-count
  *    hash aggregate + symbol rewrite on the word DataFrame, with the
  *    previous round's persist released after the next materializes.
  */
object BpeTrain {

  /** Greedy left-to-right merge of adjacent (l, r) into l+r. */
  private def mergeOnce(syms: Vector[String], l: String,
                        r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == l && s == r)
        acc.init :+ (l + r)
      else acc :+ s
    }

  // the driver fast path must tie-break exactly like the distributed
  // path's Spark orderBy: count desc, then BINARY UTF-8 string order
  // (graft.Util.utf8Compare — UTF-16 compareTo diverges above the BMP)
  private val bestPairOrd: Ordering[((String, String), Long)] =
    (p, q) => {
      val c = java.lang.Long.compare(q._2, p._2) // count desc
      if (c != 0) c
      else {
        val cl = graft.Util.utf8Compare(p._1._1, q._1._1)
        if (cl != 0) cl else graft.Util.utf8Compare(p._1._2, q._1._2)
      }
    }

  /** The local reference loop: deterministic merge rules from a
    * (word, freq) table. Exposed for the spec's cross-path check. */
  def mergesLocal(words: Seq[(String, Long)],
                  nMerges: Int): Seq[(Int, String, String, Long)] = {
    var table = words.map { case (w, f) => (w.split("").toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.min(bestPairOrd)
        out += ((rank, l, r, c))
        table = table.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
        rank += 1
      }
    }
    out.result()
  }

  /** One distributed symbol-rewrite: greedy fold as an `aggregate` HOF —
    * pop-and-replace the tail when it is `l` and the next symbol is `r`. */
  private def mergeExpr(syms: org.apache.spark.sql.Column, l: String,
                        r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) => {
      val last = element_at(acc, -1)
      when(size(acc) > 0 && last === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s)))
    })

  /** Train `nMerges` BPE merge rules on the corpus text column. Output:
    * one row per learned rule — (rank, left, right, freq) — rank in
    * learned order. `fastPathMaxWords` bounds the driver-side path;
    * above it the loop runs distributed on the word DataFrame. */
  def merges(df: DataFrame, textCol: String, nMerges: Int,
             fastPathMaxWords: Long = 200000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = words.count()
    val result =
      if (n <= fastPathMaxWords) {
        val local = words.collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        mergesLocal(local, nMerges)
      } else mergesDistributed(spark, words, nMerges)
    words.unpersist()
    result.toDF("rank", "left", "right", "freq")
  }

  /** Local reference encode: apply merge rules in rank order to one
    * word's characters. */
  def encodeLocal(word: String,
                  rules: Seq[(String, String)]): Vector[String] =
    rules.foldLeft(word.split("").toVector) { case (syms, (l, r)) =>
      mergeOnce(syms, l, r)
    }

  /** Tokenize the corpus with learned merge rules — the ENCODE half of
    * BPE. Pieces are computed once per DISTINCT word (the vocabulary
    * table — the same object [[merges]] trains on) by chaining the
    * greedy merge fold per rule, then joined back onto the corpus
    * token stream; the vocabulary side broadcasts. Output: one row per
    * document — (idCol, n_words, n_pieces) — including token-less
    * documents at (0, 0). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             rules: Seq[(String, String)]): DataFrame = {
    val tok = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val pieces = rules.foldLeft(
        filter(split(col("word"), ""), x => x =!= lit(""))) {
      case (syms, (l, r)) => mergeExpr(syms, l, r)
    }
    val vocab = tok.select(col("word")).distinct()
      .select(col("word"), size(pieces).as("n_pieces"))
    val counted = tok.join(broadcast(vocab), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"))
    // keep token-less documents (empty/whitespace text) in the output
    df.select(col(idCol)).join(counted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  private def mergesDistributed(spark: SparkSession, words: DataFrame,
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val out = Seq.newBuilder[(Int, String, String, Long)]
    // Spark's split(w, "") keeps a trailing "" (Java split, limit -1);
    // drop it so symbols match the local path's char vector exactly
    var table = words
      .select(filter(split(col("word"), ""), x => x =!= lit(""))
        .as("syms"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    table.count()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // pair counts: explode adjacent pairs from the BOUND symbol array
      val best = table
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rank, l, r, c))
        val next = table
          .select(mergeExpr(col("syms"), l, r).as("syms"), col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        table.unpersist()
        table = next
        rank += 1
      }
    }
    table.unpersist()
    out.result()
  }
}
