package graft.llm

import graft.llm.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a production training-data pipeline runs after
  * document-level dedup: sub-document duplicated-span removal (the C4
  * "deduplicate lines seen too often" filter) and benchmark-contamination
  * detection (eval-set n-gram overlap, the scaled-down form of the
  * 13-gram decontamination standard).
  */
object CorpusHygiene {

  /** C4-style duplicated-segment removal. The corpus' texts are split into
    * fixed `w`-word segments (the deterministic stand-in for "lines" when
    * the source has no line structure); any segment whose exact text occurs
    * more than `maxOcc` times across the WHOLE corpus is removed from every
    * document, and each document's surviving segments are reassembled in
    * order. Documents whose every segment was removed drop out entirely.
    *
    * Scale shape: one explode (narrow), one map-side-combined count
    * aggregate, then a LEFT ANTI join against only the OVER-DUPLICATED
    * segments — boilerplate-grade text is a vanishing fraction of distinct
    * segments, so the anti-join side stays small enough for AQE to
    * broadcast, and the reassembly aggregate shuffles only kept segments.
    * Output: (idCol, text_clean). */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
                    w: Int = 10, maxOcc: Int = 2): DataFrame = {
    require(w >= 1 && maxOcc >= 1, s"w=$w and maxOcc=$maxOcc must be >= 1")
    // a null text behaves as "" (one empty segment), like coalesce-first
    // readers upstream; (size-1)/w is the last segment index, so the
    // sequence is always ascending (size >= 1 because split("") = [""]).
    val segs = df
      .withColumn("__gtoks", tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__gseg", explode(transform(
        sequence(lit(0), ((size(col("__gtoks")) - 1) / w).cast("int")),
        i => struct(i.as("idx"),
          array_join(slice(col("__gtoks"), i * w + 1, lit(w)), " ")
            .as("seg")))))
      .select(col(idCol), col("__gseg.idx").as("__gidx"),
        col("__gseg.seg").as("__gsegtext"))
    val hot = segs.groupBy(col("__gsegtext"))
      .agg(count(lit(1)).as("__gcnt"))
      .filter(col("__gcnt") > maxOcc)
      .select(col("__gsegtext").as("__ghot"))
    val kept = segs.join(hot, col("__gsegtext") === col("__ghot"), "left_anti")
    // array_sort on structs orders by leading field (the segment index),
    // so reassembly is deterministic without a per-doc window sort
    kept.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__gidx").as("idx"),
          col("__gsegtext").as("seg")))),
        x => x("seg")), " ").as("text_clean"))
  }

  /** Benchmark contamination: for each corpus document, how many of its
    * DISTINCT word n-grams appear anywhere in the eval set. Only
    * contaminated documents (n_shared >= 1) are returned; a pipeline
    * typically anti-joins this back to quarantine them.
    *
    * Scale shape: the eval side collapses to its distinct n-grams —
    * benchmark-sized, megabytes at worst — and is broadcast, so the corpus
    * side is a narrow explode + map-side-combined count per doc; the only
    * shuffle is the final per-doc aggregate. Output: (idCol, n_shared). */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int = 4): DataFrame = {
    val evalGrams = evalSet
      .select(explode(shingles(col(textCol), n)).as("__gg")).distinct()
    val corpusGrams = corpus.select(col(idCol),
      explode(shingles(col(textCol), n)).as("__gg"))
    corpusGrams.join(broadcast(evalGrams), "__gg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** C4-style URL/domain hygiene: extract every `http(s)://host` mention
    * from the text, roll up per lowercased domain (distinct documents
    * touching it, total mentions), and drop blocklisted domains — the
    * domain-filtering stage every web-scale corpus runs before training.
    *
    * Scale shape: extraction is a narrow per-row regexp pass (no
    * shuffle), the rollup is one map-side-combined aggregate on the
    * domain key, and blocklists are list-sized (thousands of rows), so
    * the LEFT ANTI join broadcasts the blocklist — the corpus side is
    * never re-shuffled for the filter. Output:
    * (domain, n_docs, n_mentions). */
  def domainStats(df: DataFrame, idCol: String, textCol: String,
                  blocklist: Seq[String] = Nil): DataFrame = {
    // (?i): URL schemes are case-insensitive and real crawls carry
    // HTTP:// — a lowercase-literal scheme let those escape the rollup
    // AND the blocklist entirely. The optional non-capturing userinfo
    // group keeps http://alice@spam.com from capturing "alice" as the
    // host. (?i) and (?:...) have identical semantics in Java regex and
    // RE2; \s does NOT (Java includes \x0B, RE2 doesn't), so the
    // userinfo terminator is an EXPLICIT whitespace class both engines
    // read identically — the pass stays oracle-checkable.
    val hosts = df.select(col(idCol).as("__id"),
        explode(regexp_extract_all(col(textCol),
          lit("(?i)https?://(?:[^/@ \\t\\n\\r\\f]*@)?([A-Za-z0-9.-]+)"),
          lit(1))).as("__h"))
      .select(col("__id"), lower(col("__h")).as("domain"))
    val stats = hosts.groupBy(col("domain")).agg(
      countDistinct(col("__id")).as("n_docs"),
      count(lit(1)).as("n_mentions"))
    if (blocklist.isEmpty) stats
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val bl = blocklist.map(_.toLowerCase).toDF("domain")
      stats.join(broadcast(bl), Seq("domain"), "left_anti")
    }
  }
}
