package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline:
  * tokenization, n-gram shingles, quality signals, language-ID scoring,
  * SimHash / MinHash signatures, rolling-hash fingerprints.
  *
  * Everything is built-in expressions / higher-order functions (no UDFs), so
  * it stays inside Tungsten and scales with ordinary narrow transformations
  * — per-document work, no shuffle.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, or single symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Word n-grams from an already-BOUND token array (a lambda variable or
    * attribute, never a recomputed expression): plain transform + slice,
    * linear in tokens × n. */
  private def wordNGramsFromBound(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles ("a b c", n=2 → ["a b", "b c"]).
    *
    * The naive `transform(sequence(1, len−n+1), i => array_join(slice(
    * toks, i, n)))` is quadratic when `toks` is itself an expression
    * (e.g. `split`): HOF lambdas re-evaluate referenced outer expressions
    * per element, so every shingle re-tokenizes the whole document. Here
    * `toks` is bound ONCE as a lambda variable — `transform` over a
    * 1-element wrapper array is the Column API's `let` — so the
    * per-shingle slice reads a materialized array. (An earlier fix used a
    * sliding-buffer `aggregate` fold, which dodged the re-tokenize but was
    * itself quadratic in array-copy work: each step rebuilt the
    * accumulated output via `concat` — ~n²/2 element copies per document,
    * the dominant cost of the shingle-heavy corpus queries.) */
  def wordNGrams(toks: Column, n: Int): Column =
    coalesce(
      flatten(transform(array(toks), t => wordNGramsFromBound(t, n))),
      array().cast("array<string>")) // null input -> empty set

  /** Distinct word n-gram shingle set. */
  def shingles(text: Column, n: Int): Column =
    array_sort(array_distinct(wordNGrams(tokens(text), n)))

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "data")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(toks: Column,
                    stop: Seq[String] = DefaultStopwords): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stop.map(lit): _*))).cast("double") /
        n.cast("double"))
  }

  /** Mean token length (0 for empty docs). */
  def avgTokenLength(toks: Column): Column = {
    val n = size(toks)
    when(n === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: length sweet-spot × lexical
    * diversity × (1 − stopword excess). Deterministic, tunable weights.
    * The raw form is a fixed-order product of IEEE divisions, so it is
    * bit-identical across engines given the same tokens — cross-engine
    * checks should compare `floor(raw * 1e6)` (rounding rules differ
    * between engines; floor does not). */
  def qualityScoreRaw(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lengthScore = least(n / lit(50.0), lit(1.0))
    val diversity =
      when(n === 0, lit(0.0))
        .otherwise(size(array_distinct(toks)).cast("double") / n)
    val stopPenalty = lit(1.0) - least(stopwordRatio(toks), lit(1.0))
    lengthScore * diversity * stopPenalty
  }

  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Language-ID by function-word evidence: score each candidate language
    * by its marker-token hits, predict the arg-max. "und" means ZERO
    * evidence (no profile scored a hit); a score TIE between profiles
    * breaks deterministically to the lexicographically LAST language
    * name (greatest() over (score, lang) structs falls through to the
    * name field) — engine-portable, and honest about what a tie is: the
    * evidence picked two languages equally, and any fixed rule is as
    * right as another (r13: the doc used to claim ties → "und", which
    * the expression never did). An n-gram-frequency heuristic, not a
    * model — adequate for routing. */
  def langIdScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    // greatest() requires >= 2 children — a legitimate one-language
    // routing call crashed at analysis time (r13)
    require(profiles.nonEmpty, "langId needs at least one language profile")
    val toks = tokens(text)
    val scored = profiles.map { case (lang, markers) =>
      struct(langIdScore(toks, markers).as("s"), lit(lang).as("l"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** 64-bit SimHash over tokens: per bit, majority vote of the tokens'
    * xxhash64 bits. The 64 bit-vote aggregates are unrolled driver-side
    * (shift amounts must be static in the Scala API). All built-in
    * expressions — per-row work, no shuffle.
    *
    * The token-hash array is BOUND ONCE via the single-element-transform
    * let-trick (same as [[wordNGrams]]): referenced directly, it would
    * be an ordinary expression child of 64 separate ArrayAggregate
    * nodes, each re-evaluating the transform + xxhash64 chain per row —
    * HOFs are CodegenFallback, so that was a measured 64× token-hashing
    * tax on the exported per-row API (r13; the relational
    * Dedup.simhashPairs path never had it). */
  def simhash64(toks: Column): Column = {
    def votes(hs: Column): Column = {
      val bitVotes = (0 until 64).map { b =>
        aggregate(hs, lit(0L), (acc, h) =>
          acc + (shiftright(h, b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
      }
      bitVotes.zipWithIndex.map { case (c, b) =>
        when(c > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }
    element_at(transform(array(transform(toks, t => xxhash64(t))),
      hs => votes(hs)), 1)
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min xxhash64 over
    * the document's word w-gram windows. Equal fingerprints ⇒ likely shared
    * window content. */
  def rollingFingerprint(text: Column, window: Int = 8): Column =
    array_min(transform(wordNGrams(tokens(text), window), g => xxhash64(g)))

  /** Intra-document n-gram repetition signals (the Gopher/C4 family of
    * quality rules: heavily self-repeating documents are boilerplate or
    * spam). Returns a struct of exact counts — `total` n-gram occurrences,
    * `n_distinct` distinct n-grams, `top_count` occurrences of the most
    * frequent n-gram — from which the standard ratios (duplicate-n-gram
    * fraction `(total−n_distinct)/total`, top-n-gram fraction
    * `top_count/total`) derive. Exact ints, so the signal oracle-checks
    * with no float drift.
    *
    * One sorted-array fold per document: sort the n-grams, then a single
    * `aggregate` pass tracks the previous value, current run length, max
    * run length, and distinct count. Per-row work, no shuffle, no UDF. */
  def ngramRepetition(text: Column, n: Int): Column = {
    val grams = array_sort(wordNGrams(tokens(text), n))
    val init = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("maxrun"), lit(0L).as("nd"))
    val folded = aggregate(grams, init, (acc, g) => {
      val same = coalesce(acc("prev") === g, lit(false))
      val run = when(same, acc("run") + lit(1L)).otherwise(lit(1L))
      struct(g.as("prev"), run.as("run"),
        greatest(acc("maxrun"), run).as("maxrun"),
        (acc("nd") + when(same, lit(0L)).otherwise(lit(1L))).as("nd"))
    })
    struct(size(grams).cast("long").as("total"),
      folded("nd").as("n_distinct"), folded("maxrun").as("top_count"))
  }

  /** Normalization for training-data cleaning: lowercase, strip everything
    * outside [a-z0-9 ], collapse whitespace runs, trim. Patterns use only
    * constructs with identical semantics in Java regex and RE2, so the
    * transform is engine-portable (oracle-checkable). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** PII scrubbing: replace email-shaped and long-digit-run tokens with
    * typed placeholder tags — the standard pre-training redaction pass.
    * Same engine-portable regex subset as `normalizeText`. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUMBER>")

  /** Sliding-window document chunking — the context-window preparation
    * step every LLM data pipeline runs on long documents: split each text
    * into word chunks of `maxTokens` with `overlap` tokens carried between
    * consecutive chunks (stride = maxTokens − overlap). Chunk count is
    * max(1, ⌈(n − overlap) / stride⌉), so every chunk past the first
    * contributes at least one new token (no fully-redundant tail chunk)
    * and short documents come through as a single chunk.
    *
    * Narrow per-row work: one bound-token transform + explode over the
    * chunk indexes; no shuffle, parallelism is the source partitioning.
    * Output: (idCol, chunk_idx, chunk_text, n_tokens). */
  def chunkDocuments(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, maxTokens: Int,
                     overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && maxTokens > overlap,
      s"need maxTokens ($maxTokens) > overlap ($overlap) >= 0")
    val stride = maxTokens - overlap
    // null-text rows emit NO chunks (r13): null-skipping greatest/least
    // used to conjure ONE chunk with chunk_text=NULL and — worse —
    // n_tokens=maxTokens out of a null token count, so an empty document
    // charged a full context window to any packer weighing on n_tokens.
    df.filter(col(textCol).isNotNull)
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        greatest(lit(1),
          ceil((col("__n") - lit(overlap)) / lit(stride.toDouble)))
          .cast("int") - 1)))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"),
          col("chunk_idx") * stride + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens), col("__n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * bins by contiguous fill — doc d lands in bin ⌊(prefix-sum of weights
    * before d) / budget⌋ under a deterministic per-group order. One keyed
    * window cumsum: deterministic, no RNG, and the window is PER GROUP
    * (shard/source), so no global single-partition sort exists at scale —
    * the packing parallelism is the number of groups. */
  def packBins(df: org.apache.spark.sql.DataFrame, idCol: String,
               weightCol: String, groupCol: String,
               budget: Long): org.apache.spark.sql.DataFrame = {
    // budget=0 is DIVIDE_BY_ZERO under ANSI (or silent null bins without
    // it); negatives yield negative bin ids — loud, like the sibling ops
    require(budget >= 1, s"bin budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_cum", sum(col(weightCol)).over(w))
      .withColumn("bin",
        floor((col("__graft_cum") - col(weightCol)) / lit(budget))
          .cast("long"))
      .drop("__graft_cum")
  }

  /** (doc, term, tf·idf) over a corpus: smoothed idf
    * `ln((N+1)/(df+1)) + 1`, every step a hash aggregate with map-side
    * combine (explode → tf per (doc, term) → df per term → idf join).
    * The doc-count N is a driver scalar (one aggregate, not a loop).
    * The idf side is one row per distinct TERM — vocabulary-sized, so it
    * broadcasts even when the corpus doesn't. */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String): org.apache.spark.sql.DataFrame = {
    val nDocs = df.count()
    // the exploded token table feeds BOTH aggregations — persist so the
    // corpus is tokenized once, not twice (df.count() above is the third
    // pass but reads one column; catalog row counts replace it when the
    // source is a stats-bearing table)
    val tok = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val out = tf.join(org.apache.spark.sql.functions.broadcast(dfreq), "term")
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") *
          (log(lit(nDocs + 1.0) / (col("df").cast("double") + lit(1.0)))
            + lit(1.0))).as("tfidf"))
    // materialize + release the token cache here rather than leaving the
    // persist for the caller to clean up (see Util.finishAndRelease)
    graft.Util.finishAndRelease(out, tok)
  }
}
