package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring of a corpus against a bag-of-words query — the
  * lexical-retrieval baseline every data pipeline keeps next to its
  * embedding index (and the standard hybrid-search partner to the ANN
  * operators in [[Similarity]]).
  *
  * score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the Robertson/
  * Sparck-Jones form that stays positive for df > N/2.
  *
  * Scale shape: document frequencies live in a vocabulary-sized table
  * restricted to the QUERY's terms (broadcast, usually a handful of
  * rows); the corpus side is one narrow explode + per-(doc, term) count.
  * N and avgdl are driver scalars from one aggregate. Every arithmetic
  * step is a fixed-order double expression, so DuckDB replays the score
  * bit-for-bit and the operator is oracle-checkable end to end.
  */
object Bm25 {

  def score(df: DataFrame, idCol: String, textCol: String,
            queryTerms: Seq[String], k1: Double = 1.2,
            b: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce: avg over an EMPTY corpus is NULL and getDouble would
    // throw; 1.0 keeps the downstream division well-defined (no rows
    // reach it anyway)
    val stats = df.agg(count(lit(1)).as("n"),
      coalesce(avg(size(TextFunctions.tokens(col(textCol)))
        .cast("double")), lit(1.0)).as("avgdl")).collect()(0)
    val (nDocs, avgdl) = (stats.getLong(0), stats.getDouble(1))
    val docLen = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
    val qTerms = queryTerms.distinct
    val dfreq = toks.filter(col("term").isin(qTerms.map(lit): _*))
      .groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val tf = toks.filter(col("term").isin(qTerms.map(lit): _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // fixed-order doubles, mirrored in the oracle: idf first, then the
    // saturation fraction, multiplied last. k1+1 and 1−b stay as
    // in-expression literal arithmetic (not driver-computed Scala
    // doubles) so constant folding performs the same IEEE ops DuckDB
    // runs on its own literals.
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val sat = (col("tf") * lit(1.0) * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) +
        lit(b) * col("dl") / lit(avgdl)))
    // a double SUM is partial-agg-order-dependent; flooring each
    // per-term score to exact integer micros first makes the total
    // order-independent and engine-exact (the per-term double itself is
    // bit-identical — one fixed-order expression)
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(docLen, "doc_id")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(floor(idf * sat * lit(1e6)).cast("long")).as("bm25_micros"))
    graft.Util.finishAndRelease(scored, toks)
  }

  /** Reciprocal-rank fusion of two ranked candidate lists — the standard
    * hybrid-search combiner (lexical BM25 list + semantic ANN list):
    * rrf(d) = Σ_lists 1/(k0 + rank_d), absent treated as no
    * contribution. Both inputs are (idCol, rankCol) with dense 1-based
    * ranks. The two reciprocal terms are added in a fixed order, so the
    * fused score is engine-exact. Candidate lists are top-N-sized —
    * this is orders of magnitude smaller than any corpus, so the outer
    * join is trivially broadcastable. */
  def rrfFuse(lex: DataFrame, sem: DataFrame, idCol: String,
              rankCol: String, k0: Int = 60): DataFrame = {
    val l = lex.select(col(idCol), col(rankCol).as("rank_lex"))
    val s = sem.select(col(idCol), col(rankCol).as("rank_sem"))
    l.join(s, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_lex"), col("rank_sem"),
        (coalesce(lit(1.0) / (lit(k0) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("rank_sem")), lit(0.0)))
          .as("rrf"))
  }

  /** Positional inverted index — the persistent artifact behind [[score]]
    * and phrase/contamination lookups: one row per term with its document
    * frequency, total frequency, and the full posting list rendered as
    * "doc:pos doc:pos …" (1-based token positions, ordered by (doc, pos)).
    *
    * This is the canonical associative-shuffle workload: posexplode is
    * narrow, the single shuffle is the hash aggregate on `term`, and
    * map-side combine collapses each partition's postings before the
    * exchange. Postings are sorted INSIDE the aggregate (array_sort of
    * (doc, pos) structs after collect_list), so the rendered string is
    * deterministic under any partial-aggregation arrival order — the
    * LISTAGG discipline. A term's posting list is the only unbounded
    * object; for web-corpus stopwords pair this with a df cap upstream
    * (the `minDf`/`maxDf` filters) the way Lucene tiers its postings. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L,
                    maxDf: Long = Long.MaxValue): DataFrame = {
    // the cast("long") below turns any non-numeric id into NULL, which
    // would silently collapse all its postings under doc_id NULL —
    // require an integral id up front instead
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"invertedIndex: id column '$idCol' must be integral (got $other); " +
          "postings render doc ids as longs and a lossy cast would " +
          "silently merge rows under NULL")
    }
    // NULL id VALUES slip past the static type guard above and collapse
    // under doc_id NULL the same way — and concat_ws drops the null in
    // the rendering, leaving a bare ":"-less position in the postings
    // string (r13 review). Null-id rows are malformed input for a
    // postings artifact; drop them explicitly rather than merging them.
    val hits = df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos0", "term")))
      .select(col("term"), col("doc_id"), (col("pos0") + 1).as("pos"))
    hits.groupBy(col("term"))
      .agg(count(lit(1)).as("tf_total"),
        array_sort(collect_list(struct(col("doc_id"), col("pos"))))
          .as("hits"))
      // df is derived FROM the collected postings, not aggregated with
      // them: mixing count_distinct with collect_list makes Catalyst's
      // single-distinct rewrite plan a second exchange keyed on
      // (term, doc_id) with the full postings payload riding through
      // both — this keeps the promised single term-keyed shuffle
      .withColumn("df", size(array_distinct(
        transform(col("hits"), h => h("doc_id")))).cast("long"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("term"), col("df"), col("tf_total"),
        array_join(transform(col("hits"),
          h => concat_ws(":", h("doc_id"), h("pos"))), " ").as("postings"))
  }
}
