package graft.llm

import graft.llm.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash group-by), n-gram Jaccard (grouped
  * self-join), MinHash+LSH (band-bucket join — the 100 TB path), SimHash
  * (pigeonhole-banded Hamming join).
  *
  * Scale notes: exact dedup is a single hash aggregate (map-side partial
  * combine). The all-pairs Jaccard join is bounded to an explicit grouping
  * key — never all-pairs across the corpus. MinHash-LSH and SimHash banding
  * both turn the quadratic candidate space into equi-joins on bucket keys,
  * so candidates shuffle-hash-join on a key whose fan-out is controlled by
  * the band parameters.
  */
object Dedup {

  /** Phase timer for [[jaccardNewVsCorpusPrefix]], active only under
    * GRAFT_DEDUP_PROF=1 — prints per-phase wall seconds so a contended-box
    * inflation (the bench drift signature this query showed two rounds
    * running) can be attributed to a specific stage without an external
    * profiler. In prof mode the phases are FORCED in sequence (count() on
    * each persisted side, then on the candidate set), which the normal
    * path never does — total prof-mode wall is indicative, not the
    * benchmark number. */
  private val prof = sys.env.get("GRAFT_DEDUP_PROF").contains("1")
  private def timed[T](label: String)(f: => T): T =
    if (!prof) f else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup-prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Exact duplicates: one row per distinct text hash with its cardinality
    * and keeper (minimum) id. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Jaccard similarity of two pre-deduplicated arrays. Every caller passes
    * `array_distinct`-ed sets, so |A∪B| = |A|+|B|−|A∩B| — one hash-set pass
    * (intersect) instead of two (intersect + union materialized as an
    * array). On the dedup verify step this halves the per-pair set work. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** [[jaccard]] over ASCENDING-SORTED distinct arrays (r17): the
    * intersection size comes from the native zero-allocation two-pointer
    * merge ([[graft.catalyst.SortedIntersectCount]]) instead of
    * `array_intersect`'s per-pair hash set + result array — measured as
    * the dominant CPU term of the prefix-filter verifies (75 CPU-seconds
    * in q_dedup_incremental_exact at sf0.1; the count is all the Jaccard
    * ratio needs). IDENTICAL results on sorted distinct inputs — every
    * call site builds its sets with `array_sort(array_distinct(...))`
    * (or reads such data back from a stored index); LlmSpec pins
    * equality with the array_intersect form on random inputs. Built
    * directly from the expression (no function registry), so it works
    * on sessions without GraftExtensions. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftSql
    val inter = GraftSql.column(graft.catalyst.SortedIntersectCount(
      GraftSql.expression(a), GraftSql.expression(b))).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Distinct-word-set Jaccard pairs within an explicit group (blocking
    * key): self-equi-join on the group column (co-partitioned, no cross
    * product across groups), id-ordered to emit each pair once. */
  def jaccardPairsWithinGroup(df: DataFrame, idCol: String, textCol: String,
                              groupCol: String, threshold: Double)
      : DataFrame = {
    // Words are hashed to longs up front (one codegen'd xxhash64 per token);
    // the per-pair set ops then compare 8-byte values instead of strings.
    // Jaccard over the hashed sets equals Jaccard over the words absent a
    // 64-bit collision inside one document pair — negligible.
    val sets = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      array_sort(array_distinct(
        transform(tokens(col(textCol)), t => xxhash64(t)))).as("ws"))
      .withColumn("n", size(col("ws")))
    val a = sets.alias("a")
    val b = sets.alias("b")
    // Sound size-band prefilter (prefix-filtering family): Jaccard <=
    // min(|A|,|B|)/max(|A|,|B|), so jac >= t requires each size >= t × the
    // other. Evaluated on two ints before the set ops — prunes pairs without
    // ever touching the arrays, and never prunes a true match.
    val sizeBand =
      col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold
    a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
        sizeBand)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccardSorted(col("a.ws"), col("b.ws")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Prefix-filtered Jaccard pairs — same output as
    * `jaccardPairsWithinGroup`, different candidate generation. Instead of
    * the within-group self-join (O(group²) candidate pairs), each doc's
    * token set is re-sorted by global rarity (document frequency asc, hash
    * asc — one total order) and only its first `n − ⌈t·n⌉ + 1` tokens are
    * emitted as join keys: two sets with Jaccard ≥ t must overlap in
    * ≥ ⌈t·max(n_a,n_b)⌉ elements, so their prefixes under any shared total
    * order must intersect (AllPairs/PPJoin prefix-filtering lemma).
    * Candidates come from an equi-join on (group, prefix-token), then exact
    * Jaccard verifies each distinct pair once.
    *
    * Scale: at t=0.9 the prefix is ~n/10+1 tokens, and rare-first ordering
    * keeps stopword-grade tokens out of prefixes, so the candidate space is
    * driven by genuinely shared rare tokens — the published shape for
    * corpus-scale set-similarity joins. All pre-passes (DF count, re-sort)
    * are linear scans with map-side combine.
    *
    * The re-sorted doc table is persisted (it feeds candidate generation
    * AND verify) and released before returning: the result comes back
    * eagerly materialized (`Util.finishAndRelease`), so repeated library
    * callers leave no cached residue behind. */
  def jaccardPairsWithinGroupPrefix(df: DataFrame, idCol: String,
                                    textCol: String, groupCol: String,
                                    threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sets = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      array_distinct(transform(tokens(col(textCol)), t => xxhash64(t)))
        .as("ws0"))
    val tok = sets.select(col("g"), col("id"), explode(col("ws0")).as("h"))
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Rare-first total order: sort each doc's (df, h) structs; ties on df
    // break on h, so the order is deterministic and global.
    val docs = tok.join(dfreq, "h")
      .groupBy(col("g"), col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("tf"))
      .select(col("g"), col("id"),
        transform(col("tf"), x => x("h")).as("ws"),
        size(col("tf")).as("n"))
      // α = ⌈t·n⌉ computed with a tiny downward nudge: if fp error ever
      // rounded t·n UP past the exact product, the prefix would come out one
      // short and could miss a true pair; the nudge only ever lengthens it.
      .withColumn("p",
        (col("n") - ceil(col("n") * threshold - lit(1e-9)) + 1).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pref = docs.select(col("g"), col("id"), col("n"),
      posexplode(slice(col("ws"), lit(1), col("p"))).as(Seq("pos", "h")))
    val a = pref.alias("a")
    val b = pref.alias("b")
    val sizeBand =
      col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold
    val candidates = a.join(b, col("a.g") === col("b.g") &&
        col("a.h") === col("b.h") && col("a.id") < col("b.id") && sizeBand &&
        positionalFilter(threshold))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // `ws` is in RARE-FIRST order (the prefix total order); the native
    // merge-count verify needs the standard ascending order, so re-sort
    // once per doc in the projection (below the join, so per doc per
    // side — not per pair) — set equality is order-independent, and the
    // re-sorted copy costs O(n log n) per doc against the O(pairs)
    // verify it accelerates
    val da = docs.select(col("id").as("id_a"),
      array_sort(col("ws")).as("ws_a"))
    val db = docs.select(col("id").as("id_b"),
      array_sort(col("ws")).as("ws_b"))
    val pairs = candidates.join(da, "id_a").join(db, "id_b")
      .select(col("id_a"), col("id_b"),
        jaccardSorted(col("ws_a"), col("ws_b")).as("jac"))
      .filter(col("jac") >= threshold)
    graft.Util.finishAndRelease(pairs, docs)
  }

  /** EXACT incremental near-dup check: every (new, corpus) document pair
    * with distinct-word-set Jaccard >= threshold — no LSH recall loss, the
    * kernel for ingest gates that must be lossless (contractual dedup,
    * eval-set exclusion). Prefix filtering across the two frames: both
    * sides sort their hashed token sets under the SAME total order (plain
    * hash ascending — the prefix lemma holds under ANY shared total order,
    * and hash order needs no corpus-statistics pass, so the corpus side
    * could be prepared once and stored), emit the first n − ⌈t·n⌉ + 1
    * tokens, and candidates come from the prefix-token equi-join between
    * the sides — O(matching prefixes), never new × corpus. Exact Jaccard
    * verifies each distinct candidate pair once.
    * Output: (new_id, corpus_id, jac). */
  def jaccardNewVsCorpusPrefix(newDocs: DataFrame, corpus: DataFrame,
                               idCol: String, textCol: String,
                               threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    def prep(df: DataFrame): DataFrame =
      prepPrefixDocs(df, idCol, textCol, threshold)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val nd = prep(newDocs)
    val cd = prep(corpus)
    if (prof) { // force each phase so its wall time is separable
      timed("prep-new")(nd.count())
      timed("prep-corpus")(cd.count())
    }
    val sizeBand =
      col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold
    val candidates = prefixTable(nd).alias("a")
      .join(prefixTable(cd).alias("b"),
        col("a.h") === col("b.h") && sizeBand &&
          positionalFilter(threshold))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .distinct()
    if (prof) timed("candidates")(candidates.count())
    val da = nd.select(col("id").as("new_id"), col("ws").as("ws_a"))
    val db = cd.select(col("id").as("corpus_id"), col("ws").as("ws_b"))
    val pairs = candidates.join(da, "new_id").join(db, "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        jaccardSorted(col("ws_a"), col("ws_b")).as("jac"))
      .filter(col("jac") >= threshold)
    timed("verify+checkpoint")(graft.Util.finishAndRelease(pairs, nd, cd))
  }

  /** Shared prep for the exact prefix-filter kernel: (id, ws, n, p) where
    * `ws` is the sorted distinct hashed token set, `n` its size, and `p`
    * the prefix length n − ⌈t·n⌉ + 1 the completeness lemma prescribes. */
  private def prepPrefixDocs(df: DataFrame, idCol: String, textCol: String,
                             threshold: Double): DataFrame =
    df.select(col(idCol).as("id"),
      array_sort(array_distinct(
        transform(tokens(col(textCol)), t => xxhash64(t)))).as("ws"))
      .withColumn("n", size(col("ws")))
      .withColumn("p",
        (col("n") - ceil(col("n") * threshold - lit(1e-9)) + 1).cast("int"))

  /** Prefix rows WITH their 0-based in-set position — the position feeds
    * the PPJoin positional filter ([[positionalFilter]]), so it is part
    * of the stored index layout too. */
  private def prefixTable(docs: DataFrame): DataFrame =
    docs.select(col("id"), col("n"),
      posexplode(slice(col("ws"), lit(1), col("p"))).as(Seq("pos", "h")))

  /** PPJoin positional filter (Xiao et al., WWW'08), the exact
    * candidate-stage cut for prefix-filter joins (r13, VERDICT #2): a
    * matched prefix row where hash h sits at 0-based position pos_a in
    * A's sorted set and pos_b in B's bounds the pair's overlap only
    * when h is the FIRST common token — every element before it in A is
    * then absent from B and vice versa, so
    *   overlap <= min(n_a - pos_a, n_b - pos_b),
    * while jac >= t forces overlap >= t/(1+t) * (n_a + n_b). Filtering
    * EVERY matched row by that inequality and keeping a pair if ANY row
    * survives is sound: a true pair's first common token is within both
    * prefixes (the prefix lemma) and ITS row satisfies the bound, so no
    * true pair is lost — but a false candidate whose only shared hashes
    * sit late in both prefixes generates ZERO rows into the candidates
    * `distinct`. At t=0.9 the bound kills matches past ~53% of the
    * prefix, cutting the dominant candidate shuffle severalfold on
    * near-dup-dense batches where raw prefix-match multiplicity, not
    * batch size, drives the stage. The 1e-9 nudge rounds the ceiling
    * DOWN on fp boundary cases — it can only loosen the filter, never
    * drop a true pair (same convention as the prefix-length nudge in
    * [[prepPrefixDocs]]). */
  private def positionalFilter(threshold: Double)
      : org.apache.spark.sql.Column =
    least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
      ceil((col("a.n") + col("b.n")) * lit(threshold / (1 + threshold)) -
        lit(1e-9))

  /** Persist a corpus's EXACT prefix-filter index so per-batch lossless
    * dedup never re-preps the corpus side — the stored form the
    * [[jaccardNewVsCorpusPrefix]] scaladoc promises (hash order needs no
    * corpus-statistics pass, so the index is write-once). Two parquet
    * tables under `path`: `docs` (id, ws, n, p) for the verify step and
    * `prefixes` (id, n, pos, h) for the candidate join (`pos` feeds the
    * positional filter — r13); a `_params` stamp pins
    * the THRESHOLD, which is part of the index identity — the prefix
    * length p is a function of it, and probing at a different threshold
    * silently breaks the completeness lemma (missed pairs, not an error).
    * The prefixes table is derived from the WRITTEN docs table so
    * tokenization runs exactly once.
    *
    * The stamp is the COMMIT RECORD (r12): it is deleted before the
    * first data write and recreated last, so a rebuild that crashes
    * between the docs and prefixes overwrites leaves a stamp-less
    * layout that [[jaccardNewVsCorpusPrefixStored]] refuses loudly —
    * without the up-front delete, the surviving old stamp would bless a
    * torn index (new docs, stale prefixes) whose probes SILENTLY miss
    * pairs: corpus docs absent from `prefixes` generate no candidates,
    * and the verify join just never sees them. */
  def writeExactPrefixIndex(corpus: DataFrame, idCol: String,
                            textCol: String, threshold: Double,
                            path: String, shards: Int = 0): Unit = {
    val spark = corpus.sparkSession
    // EXPLICIT shard count on the write: the probe's joins are broadcast-
    // against-scan, so probe parallelism IS the index's split count — and
    // an unconstrained write lets AQE coalesce a small index to one file,
    // serializing every later probe onto one task (measured 4x on the
    // registry fixture). ROUND-ROBIN repartition(n), not
    // repartition(n, id): CollapseRepartition merges a by-expression
    // repartition into an upstream repartition-by-col (spread()'s shape),
    // and the surviving exchange carries the REPARTITION_BY_COL origin
    // AQE is free to coalesce — the explicit count silently vanishes
    // (observed: 1 file). The round-robin form keeps REPARTITION_BY_NUM,
    // which AQE must respect. At real scale pick shards so files land
    // near the FS block size. The prefixes table derives from the
    // WRITTEN docs table — tokenization runs once, and its files inherit
    // the docs sharding.
    val w = if (shards > 0) shards
            else spark.sparkContext.defaultParallelism
    val stamp = new org.apache.hadoop.fs.Path(s"$path/_params")
    val stampFs =
      stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    stampFs.delete(stamp, false) // invalidate BEFORE touching data
    prepPrefixDocs(corpus, idCol, textCol, threshold)
      .repartition(w)
      .write.mode("overwrite").parquet(s"$path/docs")
    prefixTable(spark.read.parquet(s"$path/docs"))
      .write.mode("overwrite").parquet(s"$path/prefixes")
    val out = stampFs.create(stamp, true) // commit record, written LAST
    try out.write(threshold.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** [[jaccardNewVsCorpusPrefix]] against a STORED corpus index
    * ([[writeExactPrefixIndex]]): preps ONLY the new batch, so the
    * per-ingest cost is O(batch prep + candidate matches + corpus scan)
    * with NO corpus shuffle — the batch's prefix table rides a broadcast
    * into both the candidate join and the verify join, and the corpus
    * tables stream map-side. The broadcast is the ingest-gate contract
    * (batch ≪ corpus); a bulk backfill with a corpus-sized "batch"
    * should use the symmetric in-memory form instead. Results are
    * identical to the in-memory form by construction (same prep, same
    * joins); threshold is validated against the index stamp. */
  def jaccardNewVsCorpusPrefixStored(spark: org.apache.spark.sql.SparkSession,
                                     path: String, newDocs: DataFrame,
                                     idCol: String, textCol: String,
                                     threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pp = new org.apache.hadoop.fs.Path(s"$path/_params")
    val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(pp),
      s"exact prefix index at $path has no _params stamp — not a " +
        "writeExactPrefixIndex layout")
    val in = fs.open(pp)
    val stored = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    require(stored.toDouble == threshold,
      s"exact prefix index at $path was built at threshold=$stored but " +
        s"caller passed $threshold — the prefix length depends on the " +
        "threshold, so a cross-threshold probe silently misses pairs")
    val nd = prepPrefixDocs(newDocs, idCol, textCol, threshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (prof) timed("prep-new")(nd.count())
    val storedPrefixes = spark.read.parquet(s"$path/prefixes")
    require(storedPrefixes.columns.contains("pos"),
      s"exact prefix index at $path predates the positional-filter " +
        "layout (no `pos` column in prefixes) — rebuild it with " +
        "writeExactPrefixIndex")
    val sizeBand =
      col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold
    val candidates = broadcast(prefixTable(nd)).alias("a")
      .join(storedPrefixes.alias("b"),
        col("a.h") === col("b.h") && sizeBand &&
          positionalFilter(threshold))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .distinct()
    if (prof) timed("candidates")(candidates.count())
    // Verify with the CORPUS side streaming: the id-pair candidate set and
    // the batch's (id, ws) table ride broadcasts (both are O(batch)-ish
    // and carry no corpus arrays), while the stored corpus docs scan
    // map-side — broadcasting the candidate×ws_a join instead would haul
    // every candidate's full hash array through the driver.
    val pairs = spark.read.parquet(s"$path/docs")
      .select(col("id").as("corpus_id"), col("ws").as("ws_b"))
      .join(broadcast(candidates), "corpus_id")
      .join(broadcast(
        nd.select(col("id").as("new_id"), col("ws").as("ws_a"))), "new_id")
      .select(col("new_id"), col("corpus_id"),
        jaccardSorted(col("ws_a"), col("ws_b")).as("jac"))
      .filter(col("jac") >= threshold)
    timed("verify+checkpoint")(graft.Util.finishAndRelease(pairs, nd))
  }

  /** MinHash+LSH near-duplicate pairs: shingle → minhash → band → bucket
    * equi-join → verify true shingle-set Jaccard. Output: (id_a, id_b, jac)
    * with id_a < id_b, each candidate pair verified exactly once.
    *
    * The signature is computed relationally — explode shingles, one
    * codegen'd xxhash64 per shingle, then a single hash aggregate with
    * `numHashes` min(a_i*h+b_i) columns — instead of nested higher-order
    * lambdas, which run interpreted and re-hash per permutation. Map-side
    * partial aggregation collapses each doc before the shuffle. */
  /** Shared MinHash prep: (doc shingle sets, LSH band buckets).
    * Signatures are computed relationally — explode shingles, one codegen'd
    * xxhash64 per shingle, one hash aggregate with `numHashes` min columns
    * (seeded re-hash: overflow-free under ANSI, where a*h+b universal
    * hashing would throw ARITHMETIC_OVERFLOW) — instead of nested
    * higher-order lambdas, which run interpreted and re-hash per
    * permutation. Map-side partial aggregation collapses each doc before
    * the shuffle. */
  /** Public handle on the shared MinHash prep for callers that need to
    * compute a batch's signatures ONCE and feed them to several
    * consumers (probe + intra-batch pairs + index write — the streaming
    * gate's shape). Returns `(docs, buckets)`: `docs` is `(id, sh)` and
    * comes back ALREADY persisted (MEMORY_AND_DISK) — the caller owns
    * the unpersist; `buckets` is `(id, band, key)` and is lazy. */
  def signatureFrames(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8): (DataFrame, DataFrame) =
    shingleBuckets(df, idCol, textCol, shingleN, numHashes, bands)

  private def shingleBuckets(df: DataFrame, idCol: String, textCol: String,
                             shingleN: Int, numHashes: Int, bands: Int)
      : (DataFrame, DataFrame) = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — trailing " +
        "signature columns would otherwise be silently ignored and the " +
        "documented S-curve recall math would not hold")
    import org.apache.spark.storage.StorageLevel
    val rowsPerBand = numHashes / bands
    // The shingle sets feed the signature pass AND both sides of the
    // verify join — persist so shingling runs once, not three times.
    // No `size(sh) > 0` filter: shingle-less docs vanish at the explode
    // and can never be candidates, while the filter predicate gets pushed
    // below any upstream repartition, re-evaluating the whole shingle
    // aggregate on the unspread (often single-partition) input.
    val docs = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleN).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exploded = docs.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val minCols = (0 until numHashes).map { i =>
      min(xxhash64(lit(i + 1), col("h"))).as(s"m$i")
    }
    val sigs = exploded.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
    val bandStructs = (0 until bands).map { bnd =>
      val cols = (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
        .map(i => col(s"m$i"))
      struct(lit(bnd).as("band"), hash(cols: _*).as("key"))
    }
    val buckets = sigs.select(col("id"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    (docs, buckets)
  }

  /** Shared verify tail: join candidate id pairs back to their shingle
    * sets and keep exact Jaccard >= threshold. */
  private def verifyPairs(candidates: DataFrame, docsA: DataFrame,
                          docsB: DataFrame, outA: String, outB: String,
                          threshold: Double): DataFrame = {
    val da = docsA.select(col("id").as(outA), col("sh").as("sh_a"))
    val db = docsB.select(col("id").as(outB), col("sh").as("sh_b"))
    candidates.join(da, outA).join(db, outB)
      .select(col(outA), col(outB),
        jaccardSorted(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.8,
                      maxBucketSize: Int = 2000): DataFrame = {
    val (docs, buckets) =
      shingleBuckets(df, idCol, textCol, shingleN, numHashes, bands)
    graft.Util.finishAndRelease(
      minhashLshPairsFromSigs(docs, buckets, threshold, maxBucketSize), docs)
  }

  /** Self-join pair kernel over PRECOMPUTED signature frames (the
    * [[signatureFrames]] shapes). LAZY — no checkpoint, no unpersist: the
    * caller owns both frames' lifecycle. Use when the signatures feed
    * several consumers (the streaming gate computes them once per batch
    * for probe + intra-dedup + index write). */
  def minhashLshPairsFromSigs(docs: DataFrame, buckets: DataFrame,
                              threshold: Double = 0.8,
                              maxBucketSize: Int = 2000): DataFrame = {
    // Candidate pairs by grouping each bucket's member list (one shuffle)
    // instead of a bucket self-join (two shuffles of the full bucket table):
    // singleton buckets — the overwhelming majority under sane band params —
    // vanish at the filter, before any pair space exists. Pair explosion is
    // per-bucket and ordered (id_a < id_b), so `distinct` across bands is
    // the only dedup needed.
    //
    // `maxBucketSize` is the hot-bucket safety valve: a degenerate bucket
    // (boilerplate/empty-ish documents all colliding) creates O(b²) pairs —
    // and the pair explosion builds all b(b-1)/2 structs inside ONE row
    // before explode, so the cap must keep that row executor-sized: the
    // 2000 default is ~2M pair structs ≈ 32 MB per hot row. Buckets past
    // the cap are dropped, mirroring what production dedup pipelines do (a
    // cluster that large is handled as a spam/boilerplate class of its
    // own, not pair-by-pair). Members this drops usually still pair in
    // their other, finer bands.
    val sorted = array_sort(collect_list(col("id")))
    val candidates = buckets.groupBy(col("band"), col("key"))
      .agg(sorted.as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    verifyPairs(candidates, docs, docs, "id_a", "id_b", threshold)
  }

  /** Incremental near-dup check: which NEW documents duplicate the existing
    * corpus (the shape a training-data pipeline runs per ingest batch).
    * Same MinHash band-bucket kernel as `minhashLshPairs`, but the bucket
    * join is new×corpus instead of a self-join — the corpus side's
    * signatures would be precomputed and stored in a real deployment.
    * Output: (new_id, corpus_id, jac) for verified pairs >= threshold. */
  def minhashLshNewVsCorpus(newDocs: DataFrame, corpus: DataFrame,
                            idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 32,
                            bands: Int = 8, threshold: Double = 0.8)
      : DataFrame = {
    val (newDocsP, newBuckets) =
      shingleBuckets(newDocs, idCol, textCol, shingleN, numHashes, bands)
    val (corpusDocs, corpusBuckets) =
      shingleBuckets(corpus, idCol, textCol, shingleN, numHashes, bands)
    val candidates = newBuckets.alias("a")
      .join(corpusBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .distinct()
    graft.Util.finishAndRelease(
      verifyPairs(candidates, newDocsP, corpusDocs, "new_id", "corpus_id",
        threshold),
      newDocsP, corpusDocs)
  }

  /** Persist a corpus's MinHash index — shingle sets + LSH band buckets —
    * so per-batch incremental dedup never recomputes the corpus side. Two
    * parquet tables under `path`: `docs` (id, shingles) for the verify
    * step and `buckets` (id, band, key) for the candidate join. At 100 TB
    * this index is the thing that makes ingest-time dedup O(batch): it is
    * written once per corpus rebuild and appended per accepted batch. */
  def writeCorpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                       path: String, shingleN: Int = 3, numHashes: Int = 32,
                       bands: Int = 8): Unit = {
    val (docs, buckets) =
      shingleBuckets(corpus, idCol, textCol, shingleN, numHashes, bands)
    // the _params stamp is the COMMIT RECORD: deleted before the first
    // data write, recreated last (writeIndexParams), so a rebuild that
    // crashes between the docs and buckets overwrites leaves a
    // stamp-less layout requireIndexParams refuses — not a torn index
    // (new docs, stale buckets) whose probes silently find no candidates
    // for the new rows
    val spark = corpus.sparkSession
    val stamp = new org.apache.hadoop.fs.Path(s"$path/_params")
    stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(stamp, false)
    docs.write.mode("overwrite").parquet(s"$path/docs")
    buckets.write.mode("overwrite").parquet(s"$path/buckets")
    writeIndexParams(spark, path, shingleN, numHashes, bands)
    docs.unpersist()
  }

  /** The signature parameters are part of the index's identity: probing
    * with different shingleN/numHashes/bands silently produces near-zero
    * candidates (band keys hash different signature columns) and
    * meaningless verify scores. Stamp them at write time; every reader
    * and appender validates before touching the data. */
  private def writeIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String, shingleN: Int, numHashes: Int, bands: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$shingleN,$numHashes,$bands"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireIndexParams(spark: org.apache.spark.sql.SparkSession,
      path: String, shingleN: Int, numHashes: Int, bands: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // new stores always stamp and the stamp is the rebuild COMMIT
      // RECORD (deleted first, written last), so buckets data without a
      // stamp is a crashed rebuild (docs/buckets possibly torn), a
      // hand-deleted stamp, or a legacy layout — all three make the next
      // probe silently find near-zero candidates, so refuse loudly
      // (r12: was a warning, which blessed the torn-rebuild state the
      // commit-record ordering exists to surface)
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/buckets")),
        s"corpus index at $path has buckets data but no _params stamp — " +
          "a crashed rebuild left a possibly-torn index, or the stamp " +
          "was deleted; probing it would find near-zero candidates " +
          "silently. Rebuild the index (writeCorpusIndex).")
      return
    }
    val in = fs.open(p)
    val stored = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val want = s"$shingleN,$numHashes,$bands"
    require(stored == want,
      s"corpus index at $path was built with (shingleN,numHashes,bands)=" +
        s"($stored) but caller passed ($want) — probing across mismatched " +
        "signature parameters finds near-zero candidates silently")
  }

  /** Idempotent per-batch variant of write/appendCorpusIndex for
    * at-least-once callers (streaming foreachBatch replays): the batch's
    * docs and buckets land in partition-style `batch=<id>` subdirs with
    * OVERWRITE semantics, so a replayed batch overwrites its own earlier
    * append instead of duplicating it. Readers discover `batch` as a
    * partition column; every probe selects its columns by name, so the
    * extra column is inert. The params stamp is written on first use and
    * validated after — bootstrap and append are the same call. An index
    * must use EITHER this layout or the flat write/append one, not both
    * (mixed root files + partition dirs break parquet discovery). */
  def putCorpusIndexBatch(batch: DataFrame, idCol: String, textCol: String,
                          path: String, batchId: Long, shingleN: Int = 3,
                          numHashes: Int = 32, bands: Int = 8): Unit = {
    val (docs, buckets) =
      shingleBuckets(batch, idCol, textCol, shingleN, numHashes, bands)
    // unpersist in finally: a params-mismatch throw inside the Sigs call
    // must not leak the persisted shingle frame into the caller's retry
    try putCorpusIndexBatchSigs(docs, buckets, path, batchId,
      shingleN, numHashes, bands)
    finally docs.unpersist()
  }

  /** [[putCorpusIndexBatch]] over PRECOMPUTED signature frames — the
    * signature parameters still stamp/validate the index identity (they
    * describe how the caller built the frames), but the signatures are
    * not recomputed. Caller owns the frames' lifecycle. */
  def putCorpusIndexBatchSigs(docs: DataFrame, buckets: DataFrame,
                              path: String, batchId: Long,
                              shingleN: Int = 3, numHashes: Int = 32,
                              bands: Int = 8): Unit = {
    val spark = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // refuse a flat writeCorpusIndex layout (r14 review): a batch= dir
    // written next to flat files makes the store unreadable as either
    // layout, and the gates' partition-pruned reads would silently
    // treat flat rows' batch column as NULL. Ordering is load-bearing:
    // the layout guard must run BEFORE the stamp block below — a torn
    // flat rebuild (crashed between its two overwrites) is exactly the
    // stamp-LESS state the commit-record protocol refuses, and writing
    // a fresh _params first would re-legitimize that torn store for
    // every later flat-path probe even though this put then throws.
    graft.Util.requireBatchLayout(fs, s"$path/docs")
    graft.Util.requireBatchLayout(fs, s"$path/buckets")
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_params")))
      writeIndexParams(spark, path, shingleN, numHashes, bands)
    else requireIndexParams(spark, path, shingleN, numHashes, bands)
    docs.write.mode("overwrite").parquet(s"$path/docs/batch=$batchId")
    buckets.write.mode("overwrite").parquet(s"$path/buckets/batch=$batchId")
  }

  /** Seed a per-batch corpus index with an EXISTING corpus: the seed lands
    * as the `batch=-1` base segment ([[putCorpusIndexBatch]] with id -1 —
    * the same slot compaction folds into), so an exactly-once gate whose
    * live batch ids are non-negative can replay any batch without ever
    * overwriting or self-matching the seed. Use this (not
    * [[writeCorpusIndex]], whose flat layout cannot be mixed with batch
    * subdirs) to pre-load [[graft.streaming.IngestDedup]]. */
  def seedCorpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                      path: String, shingleN: Int = 3, numHashes: Int = 32,
                      bands: Int = 8): Unit =
    putCorpusIndexBatch(corpus, idCol, textCol, path, -1L,
      shingleN, numHashes, bands)

  /** Fold committed batches (ids 0..upToBatch) of a [[putCorpusIndexBatch]]
    * layout into one compacted `batch=-1` base segment per table, so
    * incremental probes stay O(few files) after years of appends. The
    * caller guarantees every folded batch is committed by its own ledger;
    * batches above `upToBatch` keep their subdirs for replay overwrite.
    * The `_params` stamp is untouched. Streaming-gate state dirs should
    * use [[graft.streaming.SimilarityIngest.compactIndexes]] /
    * [[graft.streaming.IngestDedup.compact]], which derive the frontier
    * from the commit ledger AND hold the compaction lock — this raw
    * helper takes NO lock, so calling it directly against a path a live
    * stream is gating races the gate's probes unprotected. */
  def compactCorpusIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String, upToBatch: Long): Unit = {
    graft.io.Parquet.compactBatchStore(spark, s"$path/docs", upToBatch)
    graft.io.Parquet.compactBatchStore(spark, s"$path/buckets", upToBatch)
  }

  /** Append a batch's shingle sets + band buckets to a stored corpus index
    * (see `writeCorpusIndex`) — the per-accepted-batch half of the
    * incremental dedup loop: once appended, later batches dedup against
    * these documents without recomputing them. */
  def appendCorpusIndex(batch: DataFrame, idCol: String, textCol: String,
                        path: String, shingleN: Int = 3, numHashes: Int = 32,
                        bands: Int = 8): Unit = {
    requireIndexParams(batch.sparkSession, path, shingleN, numHashes, bands)
    val (docs, buckets) =
      shingleBuckets(batch, idCol, textCol, shingleN, numHashes, bands)
    docs.write.mode("append").parquet(s"$path/docs")
    buckets.write.mode("append").parquet(s"$path/buckets")
    docs.unpersist()
  }

  /** Incremental near-dup check against a STORED index (see
    * `writeCorpusIndex`): only the new batch is shingled and hashed; the
    * corpus side is two parquet scans. Same output contract as
    * `minhashLshNewVsCorpus`.
    *
    * The batch's shingle sets are persisted internally (they feed candidate
    * generation AND verify) and released before returning — the result
    * comes back eagerly materialized, so a long-running service calling
    * this per batch accumulates no cached state. */
  def minhashLshNewVsIndex(newDocs: DataFrame, indexPath: String,
                           idCol: String, textCol: String,
                           shingleN: Int = 3, numHashes: Int = 32,
                           bands: Int = 8, threshold: Double = 0.8)
      : DataFrame = {
    val spark = newDocs.sparkSession
    requireIndexParams(spark, indexPath, shingleN, numHashes, bands)
    minhashLshNewVsIndexFrames(newDocs,
      spark.read.parquet(s"$indexPath/docs"),
      spark.read.parquet(s"$indexPath/buckets"),
      idCol, textCol, shingleN, numHashes, bands, threshold)
  }

  /** Relation-input variant of [[minhashLshNewVsIndex]]: the caller
    * supplies the corpus docs/buckets frames — e.g. a partition-pruned
    * read of a per-batch index ([[putCorpusIndexBatch]]) that excludes a
    * half-committed batch's own entries. Signature-parameter validation
    * is the caller's burden here; the path variant stamps and checks. */
  def minhashLshNewVsIndexFrames(newDocs: DataFrame, corpusDocs: DataFrame,
                                 corpusBuckets: DataFrame,
                                 idCol: String, textCol: String,
                                 shingleN: Int = 3, numHashes: Int = 32,
                                 bands: Int = 8, threshold: Double = 0.8)
      : DataFrame = {
    val (newDocsP, newBuckets) =
      shingleBuckets(newDocs, idCol, textCol, shingleN, numHashes, bands)
    graft.Util.finishAndRelease(
      minhashLshProbeSigs(newDocsP, newBuckets, corpusDocs, corpusBuckets,
        threshold),
      newDocsP)
  }

  /** New-vs-corpus probe over PRECOMPUTED new-side signature frames (the
    * [[signatureFrames]] shapes). LAZY, caller-owned lifecycle — the
    * streaming gate's building block: computing the batch signatures once
    * and probing lazily lets the near-dup and saturation gates
    * materialize together in one Spark job. */
  def minhashLshProbeSigs(newDocs: DataFrame, newBuckets: DataFrame,
                          corpusDocs: DataFrame, corpusBuckets: DataFrame,
                          threshold: Double = 0.8): DataFrame = {
    val candidates = newBuckets.alias("a")
      .join(corpusBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .distinct()
    verifyPairs(candidates, newDocs, corpusDocs, "new_id", "corpus_id",
      threshold)
  }

  /** The dedup end product: drop every clustered document except its
    * component representative (minimum id); documents in no near-dup pair
    * pass through untouched. One components run + one null-safe anti join.
    *
    * When `reliableDir` is set, each call leaves ONE `cc-<uuid>` run
    * directory under it whose final-round label files back the returned
    * frame (see [[connectedComponents]]) — the handle is deliberately not
    * deleted here, because the result would dangle. Contract: pass a
    * JOB-SCOPED directory and delete it wholesale after the result is
    * consumed; do not share one reliableDir across concurrent runs you
    * are not prepared to clean together. */
  def dedupedCorpus(df: DataFrame, idCol: String, pairs: DataFrame,
                    reliableDir: Option[String] = None): DataFrame = {
    val losers = connectedComponents(pairs, reliableDir = reliableDir)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("__graft_loser"))
    df.join(losers, col(idCol) === col("__graft_loser"), "left_anti")
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming
    * (<= 3 with 4 chunks): pigeonhole banding — two hashes within Hamming d
    * share at least one of d+1 equal chunks — then exact popcount verify. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Int = 5000): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    // (1L << 64) wraps to 1 in Java, so the maxHamming=0 single-chunk
    // mask must be spelled -1L (all ones) or every ckey collapses to 0 —
    // one giant bucket that the hot-bucket valve would then DROP,
    // silently returning zero pairs
    val chunkMask = if (bitsPerChunk >= 64) -1L else (1L << bitsPerChunk) - 1
    // Relational SimHash: explode tokens, hash once in codegen, then one
    // hash aggregate with 64 bit-vote sums — same rationale as the MinHash
    // path (interpreted HOF lambdas are the slow shape).
    val exploded = df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
        .as(s"v$b")
    }
    val votes = exploded.groupBy(col("id")).agg(voteCols.head, voteCols.tail: _*)
    val simCol = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    // persist the signature table (r18): it feeds BOTH sides of the
    // chunk-bucket self-join plus the hot-bucket census — un-pinned, the
    // tokenize + 64-vote aggregate ran three times per call (profiled as
    // two identical signature map stages and a third under the census).
    // Released via finishAndRelease below, the library persist contract.
    val sigs = votes.select(col("id"), simCol.as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkStructs = (0 until chunks).map { k =>
      struct(lit(k).as("chunk"),
        shiftright(col("sim"), k * bitsPerChunk)
          .bitwiseAND(lit(chunkMask)).as("ckey"))
    }
    val banded0 = sigs.select(col("id"), col("sim"),
        explode(array(chunkStructs: _*)).as("c"))
      .select(col("id"), col("sim"), col("c.chunk").as("chunk"),
        col("c.ckey").as("ckey"))
    // Hot-bucket valve, same rationale as the MinHash cap: a degenerate
    // chunk bucket (boilerplate all sharing 16 signature bits) makes the
    // self-join emit O(b²) rows. Here the blowup is join fan-out (not a
    // single wide row), so the cap can sit higher; members usually still
    // pair via their other chunks.
    val hot = banded0.groupBy(col("chunk"), col("ckey"))
      .agg(count(lit(1)).as("__graft_bn"))
      .filter(col("__graft_bn") > maxBucketSize)
      .select(col("chunk").as("__graft_hc"), col("ckey").as("__graft_hk"))
    val banded = banded0.join(hot,
      banded0("chunk") === col("__graft_hc") &&
        banded0("ckey") === col("__graft_hk"), "left_anti")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.ckey") === col("b.ckey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      // filter BEFORE distinct: hamming is functionally determined by the
      // pair, so the result is identical, but the dedup exchange now
      // carries only surviving pairs instead of every chunk collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
    graft.Util.finishAndRelease(pairs, sigs)
  }

  /** Embedding near-duplicates: cosine >= threshold via the Similarity
    * module's LSH-bucketed kernel (exact verify on candidates). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame =
    Similarity.lshPairsAbove(df, idCol, vecCol, threshold)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup of an
    * embedded corpus by clustering it, then marking within-cluster pairs
    * whose cosine exceeds `tau` as duplicates and keeping one
    * representative per duplicate group.
    *
    * The paper partitions with k-means; here the cells are the SIGN BITS
    * of the first `bits` dimensions (cell = Σ 2^i · [v_i ≥ 0]) — a
    * data-independent, training-free partitioner that is deterministic
    * across engines (a float's sign survives any summation-order
    * difference), so the whole operator replays bit-for-bit in the
    * DuckDB oracle — no sampled k-means state to ship. Like the paper's
    * k-means, sign-cells only APPROXIMATE semantic neighborhoods: a
    * near-dup pair straddling a sign boundary on an early dimension is
    * missed, the same recall trade the paper makes when a pair straddles
    * a k-means cell boundary.
    *
    * Scale shape: the self-join is an equi-join on `cell`, so pair
    * candidates are generated within cells only — with random sign bits,
    * E[pairs] ≈ n²/2^(bits+1), tunable by `bits`; no all-pairs stage
    * exists. Real embeddings have CORRELATED signs, so a few cells can
    * run hot; cells above `maxCellSize` subdivide by the next `bits`
    * sign dimensions (the hot-cell valve — graceful recall degradation
    * instead of the LSH path's drop-the-bucket or a quadratic stall).
    * Exact cosine verifies every candidate (codegen'd native
    * expression when GraftExtensions is installed), and the duplicate
    * graph goes through [[connectedComponents]] (min-label, O(log n)
    * rounds) rather than a per-cluster greedy scan, so a duplicate chain
    * spanning several cells still collapses to ONE representative.
    *
    * Output: (id, cell, comp) for every row that participates in at
    * least one near-dup pair; `comp` (the min member id) is the kept
    * representative — dedup = anti-join the corpus against rows where
    * id != comp. */
  /** Sign-bit cell id: little-endian integer of `bits` sign bits read
    * from the vector starting at dimension `offset` (padded with zero
    * bits when shorter). A float's sign survives any summation-order
    * difference, so the cell is deterministic across engines. */
  private def semanticCell(vec: Column, bits: Int,
                           offset: Int = 0): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    aggregate(
      zip_with(
        slice(Similarity.toDouble(vec), offset + 1, bits),
        array((0 until bits).map(i => lit(1L << i)): _*),
        (v, p) => when(v >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    tau: Double, bits: Int = 8,
                    maxCellSize: Long = 1000000L): DataFrame =
    semanticDedupFromRows(semanticFrames(df, idCol, vecCol, bits), tau,
      bits, maxCellSize)

  /** One (id, cell, v) pass over a batch — the embedding analogue of
    * [[signatureFrames]]: compute the cells once, pin, and feed the
    * probe ([[semanticNewVsIndexFromRows]]), the intra-batch dedup
    * ([[semanticDedupFromRows]]), and the index write
    * ([[putSemanticIndexBatchFromRows]]) from the same frame. Lazy;
    * caller owns persistence. */
  def semanticFrames(df: DataFrame, idCol: String, vecCol: String,
                     bits: Int = 8): DataFrame =
    semanticRows(df, idCol, vecCol, bits)

  /** [[semanticDedup]] over a PRECOMPUTED [[semanticFrames]] frame. The
    * subcell (hot-cell subdivision) derives from the stored double
    * vector `v` — sign bits are unchanged by the float→double cast, so
    * the result is bit-identical to the from-text path. */
  def semanticDedupFromRows(rows: DataFrame, tau: Double, bits: Int = 8,
                            maxCellSize: Long = 1000000L): DataFrame = {
    val cells = subdivideHotCells(rows, bits, maxCellSize)
    val comps = connectedComponents(
      semanticPairsFromCells(cells, tau).select(col("id_a"), col("id_b")))
    comps
      .join(cells.select(col("id"), col("cell")), Seq("id"))
      .select(col("id"), col("cell"), col("comp"))
  }

  /** The pair-generation stage of [[semanticDedup]] alone: (id_a, id_b,
    * cell, cos) for every within-cell pair with cosine >= tau — the
    * embedding SIGNAL for a multi-signal duplicate graph (union these
    * with Jaccard/MinHash pairs and run [[connectedComponents]]; a chain
    * that is text-dup on one hop and embedding-dup on the next still
    * collapses to one representative). Same hot-cell valve as
    * [[semanticDedup]]. */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
                    tau: Double, bits: Int = 8,
                    maxCellSize: Long = 1000000L): DataFrame =
    semanticPairsFromCells(
      semanticCellRows(df, idCol, vecCol, bits, maxCellSize), tau)

  private def semanticCellRows(df: DataFrame, idCol: String,
                               vecCol: String, bits: Int,
                               maxCellSize: Long): DataFrame =
    subdivideHotCells(semanticRows(df, idCol, vecCol, bits), bits,
      maxCellSize)

  private def subdivideHotCells(rows: DataFrame, bits: Int,
                                maxCellSize: Long): DataFrame = {
    val cells0 = rows.select(col("id"), col("v"), col("cell"),
      semanticCell(col("v"), bits, offset = bits).as("subcell"))
    // Hot-cell valve: sign bits of REAL embeddings are correlated, so a
    // few cells can hold a disproportionate corpus share and the
    // within-cell self-join goes quadratic in them. Cells above
    // `maxCellSize` subdivide by the NEXT `bits` sign dimensions —
    // graceful recall degradation (pairs straddling a subcell boundary
    // of a hot cell are missed, everything else is kept), unlike the
    // LSH path's drop-the-bucket valve, which forfeits a hot bucket
    // entirely. Cold cells keep subcell 0, i.e. exactly the one-level
    // semantics. The cell-size table is one hash aggregate of
    // (cell, count) — 2^bits rows, broadcastable by construction.
    val hot = cells0.groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxCellSize)
      .select(col("cell"), lit(true).as("__hot"))
    cells0
      .join(broadcast(hot), Seq("cell"), "left")
      .withColumn("subcell",
        when(col("__hot"), col("subcell")).otherwise(lit(0L)))
      .drop("__hot")
  }

  private def semanticPairsFromCells(cells: DataFrame,
                                     tau: Double): DataFrame = {
    val spark = cells.sparkSession
    val a = cells.alias("a")
    val b = cells.alias("b")
    a.join(b,
        col("a.cell") === col("b.cell") &&
          col("a.subcell") === col("b.subcell") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.cell").as("cell"),
        Similarity.cosineFor(spark)(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Persist a semantic (sign-cell) embedding index: one parquet table
    * (id, cell, v) probed by [[semanticNewVsIndex]] at O(batch) — the
    * embedding-space member of the engine's incremental-dedup family
    * (exact prefix-filter, MinHash, substring windows, and this). The
    * `_semparams` stamp pins `bits`; probing with a different `bits`
    * silently lands new docs in foreign cells, so it fails loudly. */
  def writeSemanticIndex(corpus: DataFrame, idCol: String, vecCol: String,
                         path: String, bits: Int = 8): Unit = {
    // stamp = COMMIT RECORD (r12, same protocol as the other monolithic
    // index writers): deleted before the data overwrite, recreated
    // after, so a rebuild that crashes mid cells-write leaves a
    // stamp-less layout the probe refuses instead of a half-written
    // corpus blessed by the old stamp
    val spark = corpus.sparkSession
    val stamp = new org.apache.hadoop.fs.Path(s"$path/_semparams")
    stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(stamp, false)
    semanticRows(corpus, idCol, vecCol, bits)
      .write.mode("overwrite").parquet(s"$path/cells")
    writeSemanticParams(spark, path, bits)
  }

  /** Append an accepted batch to a [[writeSemanticIndex]] layout.
    * Refuses a batch-keyed store: flat files and `batch=` partition dirs
    * under one root break parquet discovery, and an append would land
    * invisible to the gate's partition-pruned replay reads. */
  def appendSemanticIndex(batch: DataFrame, idCol: String, vecCol: String,
                          path: String, bits: Int = 8): Unit = {
    requireSemanticParams(batch.sparkSession, path, bits)
    require(!semanticHasBatchDirs(batch.sparkSession, path),
      s"semantic index at $path uses the batch-keyed layout " +
        "(cells/batch=N) — use putSemanticIndexBatch, not the flat append")
    semanticRows(batch, idCol, vecCol, bits)
      .write.mode("append").parquet(s"$path/cells")
  }

  /** Batch-keyed variant (`cells/batch=<id>` subdirs, overwrite-idempotent
    * — the exactly-once gate layout; see [[putCorpusIndexBatch]]).
    * Refuses a flat [[writeSemanticIndex]] store for the mirror reason. */
  def putSemanticIndexBatch(batch: DataFrame, idCol: String, vecCol: String,
                            path: String, batchId: Long,
                            bits: Int = 8): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_semparams")))
      writeSemanticParams(spark, path, bits)
    else requireSemanticParams(spark, path, bits)
    val cellsRoot = new org.apache.hadoop.fs.Path(s"$path/cells")
    require(!fs.exists(cellsRoot) || !fs.listStatus(cellsRoot).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")),
      s"semantic index at $path uses the flat layout (writeSemanticIndex/" +
        "appendSemanticIndex) — a batch-keyed put would mix files and " +
        "batch= dirs under one root; seed a fresh batch-keyed store instead")
    semanticRows(batch, idCol, vecCol, bits)
      .write.mode("overwrite").parquet(s"$path/cells/batch=$batchId")
  }

  /** [[putSemanticIndexBatch]] over a PRECOMPUTED [[semanticFrames]]
    * frame — same stamp/layout validation, no cell recompute. */
  def putSemanticIndexBatchFromRows(rows: DataFrame, path: String,
                                    batchId: Long, bits: Int = 8): Unit = {
    val spark = rows.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_semparams")))
      writeSemanticParams(spark, path, bits)
    else requireSemanticParams(spark, path, bits)
    val cellsRoot = new org.apache.hadoop.fs.Path(s"$path/cells")
    require(!fs.exists(cellsRoot) || !fs.listStatus(cellsRoot).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")),
      s"semantic index at $path uses the flat layout (writeSemanticIndex/" +
        "appendSemanticIndex) — a batch-keyed put would mix files and " +
        "batch= dirs under one root; seed a fresh batch-keyed store instead")
    rows.select(col("id"), col("cell"), col("v"))
      .write.mode("overwrite").parquet(s"$path/cells/batch=$batchId")
  }

  private def semanticHasBatchDirs(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(s"$path/cells")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.listStatus(root)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** Fold committed batches of a [[putSemanticIndexBatch]] layout into the
    * `batch=-1` base segment (see [[compactCorpusIndex]]). */
  def compactSemanticIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, upToBatch: Long): Unit =
    graft.io.Parquet.compactBatchStore(spark, s"$path/cells", upToBatch)

  /** Probe a stored semantic index with a new batch: only the batch is
    * cell-hashed; the corpus side is ONE parquet scan whose join key is
    * the cell, so candidates are generated within cells only. Output:
    * (new_id, corpus_id, cos) for every cross pair with cosine >= tau —
    * the embedding twin of [[minhashLshNewVsIndex]]'s contract. */
  def semanticNewVsIndex(newDocs: DataFrame, indexPath: String,
                         idCol: String, vecCol: String, tau: Double,
                         bits: Int = 8): DataFrame = {
    val spark = newDocs.sparkSession
    requireSemanticParams(spark, indexPath, bits)
    semanticNewVsIndexFrame(newDocs,
      spark.read.parquet(s"$indexPath/cells"), idCol, vecCol, tau, bits)
  }

  /** Relation-input variant of [[semanticNewVsIndex]] for callers that
    * partition-prune the index read themselves (half-committed replay);
    * params validation is the caller's burden. */
  def semanticNewVsIndexFrame(newDocs: DataFrame, corpusCells: DataFrame,
                              idCol: String, vecCol: String, tau: Double,
                              bits: Int = 8): DataFrame =
    semanticNewVsIndexFromRows(
      semanticFrames(newDocs, idCol, vecCol, bits), corpusCells, tau)

  /** [[semanticNewVsIndexFrame]] over a PRECOMPUTED [[semanticFrames]]
    * new side. LAZY, caller-owned lifecycle. */
  def semanticNewVsIndexFromRows(freshRows: DataFrame,
                                 corpusCells: DataFrame,
                                 tau: Double): DataFrame = {
    val spark = freshRows.sparkSession
    freshRows.alias("a")
      .join(corpusCells.alias("b"), col("a.cell") === col("b.cell"))
      .select(col("a.id").as("new_id"), col("b.id").as("corpus_id"),
        Similarity.cosineFor(spark)(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= tau)
  }

  private def semanticRows(df: DataFrame, idCol: String, vecCol: String,
                           bits: Int): DataFrame =
    df.select(col(idCol).as("id"),
      semanticCell(col(vecCol), bits).as("cell"),
      Similarity.toDouble(col(vecCol)).as("v"))

  private def writeSemanticParams(spark: org.apache.spark.sql.SparkSession,
                                  path: String, bits: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_semparams")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$bits"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireSemanticParams(
      spark: org.apache.spark.sql.SparkSession,
      path: String, bits: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_semparams")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // New stores always stamp and the stamp is the rebuild COMMIT
      // RECORD (deleted first, written last), so cells data without a
      // stamp is a crashed rebuild (half-written corpus), a deleted
      // stamp, or a legacy layout — all three make probes silently
      // wrong, so refuse loudly (r12: was a warning); only a truly
      // empty store (nothing written yet) passes quietly.
      require(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/cells")),
        s"semantic index at $path has cells data but no _semparams " +
          "stamp — a crashed rebuild left a possibly-partial index, or " +
          "the stamp was deleted; probing it would silently miss " +
          "near-duplicates. Rebuild the index (writeSemanticIndex).")
      return
    }
    val in = fs.open(p)
    val stored = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    require(stored == s"$bits",
      s"semantic index at $path was built with bits=$stored but caller " +
        s"passed bits=$bits — cross-bits probes land in foreign cells and " +
        "find near-zero candidates silently")
  }

  /** Estimated-HEAP cap on the CC routing probe's per-partition edge-row
    * buffer (boxed GenericRows, not their serialized bytes). 1M two-long
    * edge rows estimate ~90 MB, so the default keeps the row threshold
    * the binding bound for numeric ids; wide string ids trip this cap
    * first and route to the distributed loop instead of transiently
    * holding hundreds of MB per task (r14 ADVICE). Var for tests. */
  @volatile private[graft] var LocalEdgeBufferBytes: Long = 128L << 20

  /** Connected components over near-duplicate pairs — turns pairwise
    * matches into dedup clusters whose representative (the component label)
    * is the minimum member id.
    *
    * Min-label propagation: each round every node takes the minimum label
    * among itself and its neighbors; converges in O(diameter) rounds. Each
    * round is one equi-join + hash aggregate (shuffle on id), and the
    * result is materialized (checkpoint) so the plan does not grow with the
    * iteration count — without the checkpoint the lineage doubles per round
    * and the driver dies re-optimizing it long before 100 TB does.
    *
    * Fault tolerance: the default materialization is `localCheckpoint`,
    * whose blocks live on executors — fast, but one lost executor aborts
    * the whole multi-round job (the lineage was truncated, so Spark cannot
    * recompute the lost blocks). On a real cluster pass `reliableDir`
    * (shared storage: HDFS/S3/...): each round's label table is then
    * written to parquet and read back, so a lost executor costs one file
    * re-read instead of the job. Rounds before the previous one are
    * deleted as the loop advances; the FINAL round's files back the
    * returned DataFrame and stay at
    * `reliableDir/cc-<uuid>/round-<k>` until the caller deletes them
    * (consume the result, then remove the run directory).
    * Output: (id, component) for every id appearing in `pairs`. */
  def connectedComponents(pairs: DataFrame, idColA: String = "id_a",
                          idColB: String = "id_b",
                          maxIter: Int = 20,
                          localEdgeThreshold: Long = 1000000L,
                          reliableDir: Option[String] = None,
                          broadcastNodeThreshold: Long = 2000000L)
      : DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // The routing probe runs on the RAW pair stream (r18, guide §2.4):
    // union-find is insensitive to duplicate and directed edges, so the
    // small-graph route — every gate micro-batch, every bench dedup
    // query — needs neither the symmetrize union nor the distinct. The
    // old shape paid that distinct's full shuffle plus a second persist
    // per CC call just to count edges it then union-found locally; only
    // the distributed loop (big graphs) benefits from deduplicated
    // symmetric edges, so it alone builds them, below, from this cache.
    val fwd = pairs.select(col(idColA).as("src"), col(idColB).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val spark = pairs.sparkSession
    // Per-round materialization (see scaladoc): executor-local blocks by
    // default, parquet-on-shared-storage when reliableDir is given. Keeping
    // only the current and previous rounds bounds storage at two label
    // tables regardless of iteration count. The previous round must
    // survive until the next is fully written: the write reads it.
    val runDir = reliableDir.map(d => s"$d/cc-${java.util.UUID.randomUUID()}")
    var roundIdx = 0
    var prevRoundPath: Option[String] = None
    def materialize(df: DataFrame): DataFrame = runDir match {
      case Some(dir) =>
        val path = s"$dir/round-$roundIdx"
        roundIdx += 1
        df.write.parquet(path)
        val out = spark.read.parquet(path)
        prevRoundPath.foreach { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(hp, true)
        }
        prevRoundPath = Some(path)
        out
      case None => df.localCheckpoint()
    }
    // Size the iteration's shuffles to the graph, not the session default:
    // AQE's partition coalescing cannot see across the localCheckpoint
    // boundaries this loop needs, so a small edge set would otherwise pay
    // (rounds × stages × default-partitions) near-empty tasks — the
    // dominant cost of iterative jobs on all but the largest graphs. Same
    // advisory-size logic AQE applies, ~2M edge rows (~32 MB) per
    // partition, capped at the session default so planet-scale graphs keep
    // full parallelism.
    // ONE job answers all three routing questions (r14, job economy):
    // the zero-edge short-circuit, the small-graph union-find's INPUT,
    // and the big-graph count for shuffle sizing. Each partition's
    // partial carries its row count plus a buffer of rows, bounded BOTH
    // by threshold+1 rows AND by an estimated-heap-bytes cap (r14
    // ADVICE: rows alone let a partition transiently hold ~100-300 MB
    // of boxed Rows when edge ids are wide strings — the byte bound
    // drops the buffer early on wide ids, since any single partition
    // exceeding either cap already proves the graph is too big to
    // union-find locally). A dropped buffer routes to the distributed
    // loop even under the row threshold; counts always survive. The
    // tree combine collapses partials on executors, so the driver
    // receives exactly one. Previously count() + collect() were two
    // jobs per gate micro-batch on the same cached edge set — the gates
    // run 10k batches/day, and their graphs are always below the
    // threshold. Known trade on the BIG-graph path: `.rdd` decodes
    // every edge to an external Row where the old columnar count() read
    // cache metadata — one decode pass over the edges, strictly smaller
    // than any single round of the iterative loop it precedes (each
    // round shuffles + rewrites the same edge set), so the small-graph
    // job win is kept.
    val edgeCap = localEdgeThreshold + 1
    val byteCap = LocalEdgeBufferBytes
    // rough HEAP cost of one buffered GenericRow (object headers, field
    // refs, boxing): what the executor actually holds, not the ~16 B
    // its two ids serialize to
    def rowCost(r: org.apache.spark.sql.Row): Long = {
      var c = 40L
      var i = 0
      while (i < r.length) {
        c += (r.get(i) match {
          case s: String => 48L + 2L * s.length
          case _ => 24L
        })
        i += 1
      }
      c
    }
    type Buf = (scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row], Long)
    // nPairs counts RAW pair rows (pre-symmetrize, duplicates included):
    // an upper bound on distinct edges, so the threshold routing is
    // conservative — a graph under it in raw pairs is certainly
    // union-findable
    val (nPairs, smallEdges) = fwd.rdd.treeAggregate(
      (0L, Option((new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row](1024), 0L)): Option[Buf]))(
      seqOp = { case ((n, buf), row) =>
        (n + 1, buf.flatMap { case (b, bytes) =>
          val grown = bytes + rowCost(row)
          if (b.size >= edgeCap || grown > byteCap) None
          else { b += row; Some((b, grown)) }
        })
      },
      combOp = { case ((n1, b1), (n2, b2)) =>
        (n1 + n2,
          for ((xs, xb) <- b1; (ys, yb) <- b2
               if xs.size + ys.size <= edgeCap && xb + yb <= byteCap)
            yield { xs ++= ys; (xs, xb + yb): Buf })
      })
    // clean corpus: no pairs → no clustered ids; short-circuit before the
    // label build (whose sum-over-zero-rows convergence read would NPE)
    if (nPairs == 0) {
      fwd.unpersist()
      return pairs.select(col(idColA).as("id"), col(idColA).as("comp"))
        .limit(0)
    }
    // Small-graph fast path: below the (configurable, bounded) edge
    // threshold, a driver-side union-find beats the iterative loop, whose
    // per-round scheduling overhead dominates on graphs this size — the
    // same two-regime design GraphFrames-style CC uses. Set
    // localEdgeThreshold = 0 to force the distributed loop. Only
    // integral/string ids take the fast path (the min-label contract
    // needs the id ordering; other types fall through); so does a graph
    // under the row threshold whose buffer was dropped by the BYTE cap
    // (wide string ids) — the loop is always correct, just slower.
    if (nPairs <= localEdgeThreshold && smallEdges.isDefined) {
      val srcField = fwd.schema.fields(0)
      val isIntegral = srcField.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      val isString =
        srcField.dataType == org.apache.spark.sql.types.StringType
      if (isIntegral || isString) {
        // String roots must order by BINARY UTF-8 bytes, matching the
        // distributed loop's Spark min(): UTF-16 compareTo picks a
        // different representative when supplementary characters tie
        // against U+E000..U+FFFF ids (graft.Util.utf8Compare)
        implicit val ord: Ordering[Any] =
          if (isIntegral) Ordering.by((x: Any) => x.asInstanceOf[Number].longValue)
          else (a: Any, b: Any) => graft.Util.utf8Compare(
            a.asInstanceOf[String], b.asInstanceOf[String])
        val parent = scala.collection.mutable.HashMap.empty[Any, Any]
        def find(x: Any): Any = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) {
            val next = parent(c); parent(c) = r; c = next
          }
          r
        }
        // union with the SMALLER id as root — the min-label contract.
        // The raw pair rows were already buffered by the routing probe
        // above (this branch requires the buffer survived the merge), so
        // no second collect job runs; duplicates and direction are no-ops
        // to union-find, so the raw stream yields the identical labels
        // the symmetrized-distinct edges would.
        smallEdges.get._1.foreach { row =>
          val (a, b) = (row.get(0), row.get(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
          }
        }
        fwd.unpersist()
        val out = parent.keys.toSeq.map { id =>
          org.apache.spark.sql.Row(id, find(id))
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", srcField.dataType),
          org.apache.spark.sql.types.StructField("comp", srcField.dataType)))
        return spark.createDataFrame(
          spark.sparkContext.parallelize(out, 1), schema)
      }
    }
    // Partition sizing is per-PLAN, not session conf: an explicit
    // hash-repartition on the aggregate key immediately before each
    // groupBy. HashPartitioning(key, nPart) satisfies the aggregate's
    // required distribution, so Catalyst plans no further Exchange and the
    // aggregation runs at nPart tasks — same effect as shrinking
    // spark.sql.shuffle.partitions, with zero session-global state (safe
    // under concurrent queries on a shared SparkSession). Only applied when
    // actually shrinking: at nPart == defaultPart the plain groupBy keeps
    // its map-side partial-aggregate-before-shuffle shape, which the
    // explicit repartition would forfeit.
    val defaultPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // the distributed loop's input: symmetrized deduplicated edges, built
    // once from the cached raw pairs (big graphs only — the small path
    // above never pays this distinct)
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // sizing uses 2·nPairs, an upper bound on the distinct edge count —
    // the same ~2M-rows-per-partition advisory heuristic
    val nPart = math.max(1L,
      math.min(defaultPart.toLong, 2L * nPairs / 2000000L + 1L)).toInt
    def sized(df: DataFrame, key: String): DataFrame =
      if (nPart < defaultPart) df.repartition(nPart, col(key)) else df
    // Initial labels fuse the first propagation round into the label-table
    // build: every node starts at min(self, neighbors) from one hash
    // aggregate over the symmetrized edges, instead of identity labels plus
    // a full join round to reach the same state.
    var labels = materialize(sized(edges, "src").groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("comp")))
      // When the label table fits a broadcast (nodes ≤ the threshold,
      // default ~2M → tens of MB), ship IT to the edges instead of
      // shuffling the edges to it: the per-round neighbor join and
      // pointer-jump join become map-side, and the only shuffle left per
      // round is the min-label hash aggregate. Past that size the plain
      // shuffle joins take over — label state at billions of nodes must
      // never transit the driver. The two regimes are label-identical by
      // construction (ScaleSpec runs the same graph through both and
      // compares); the threshold is a parameter so clusters with bigger
      // driver/broadcast budgets can raise it.
      val nNodes = labels.count()
      val useBroadcast = nNodes <= broadcastNodeThreshold
      def bcast(df: DataFrame): DataFrame =
        if (useBroadcast) broadcast(df) else df
      // convergence via the monotone label sum: every label change strictly
      // decreases a label, so sum(comp) is strictly decreasing until the
      // fixpoint — one cheap aggregate on the freshly checkpointed result
      // instead of a join against the previous labels
      // labels can be 2^62-scale hash ids: a raw long sum overflows
      // (ARITHMETIC_OVERFLOW under ANSI; silent wraparound — and a possible
      // false convergence — without). decimal(38,0) sums are exact.
      // NUMERIC ids only: string labels have no order-homomorphic sum
      // (and the decimal cast throws CAST_INVALID_INPUT under ANSI on the
      // first non-numeric id — found in r15 when the byte-capped routing
      // probe first sent a string graph down this loop); they take an
      // exact changed-row join of the two materialized label tables
      // per round instead.
      val summableLabels = edges.schema.fields(0).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType]
      var prevSum =
        if (summableLabels)
          labels.agg(sum(col("comp").cast("decimal(38,0)")))
            .collect()(0).getDecimal(0)
        else null
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val lab = bcast(labels)
        val viaNeighbors = edges.join(lab, edges("dst") === lab("id"))
          .select(edges("src").as("id"), col("comp"))
        val propagated = sized(labels.union(viaNeighbors), "id")
          .groupBy("id").agg(min("comp").as("comp"))
        // pointer jumping: also adopt the label OF the current label
        // (label values only ever decrease, so label(comp) <= comp), which
        // collapses long chains in O(log n) rounds instead of O(diameter)
        val byLabel = bcast(labels.select(col("id").as("lid"),
          col("comp").as("lcomp")))
        val next = materialize(propagated
          .join(byLabel, propagated("comp") === byLabel("lid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("lcomp"), col("comp"))).as("comp")))
        if (summableLabels) {
          val s = next.agg(sum(col("comp").cast("decimal(38,0)")))
            .collect()(0).getDecimal(0)
          converged = s == prevSum
          prevSum = s
        } else {
          // exact fixpoint test for non-numeric labels: did ANY node
          // change this round? Both tables are freshly materialized,
          // so this is one bounded join per round, not lineage growth.
          converged = next.join(
              labels.select(col("id"), col("comp").as("__prev")), Seq("id"))
            .filter(col("comp") =!= col("__prev")).isEmpty
        }
        labels = next
        iter += 1
      }
      edges.unpersist()
      fwd.unpersist()
      // exhausting maxIter without the fixpoint must be LOUD (r12):
      // returning partially-propagated labels silently means members of
      // one true component carry different comp values, and dedupedCorpus
      // keeps every id == comp row — duplicates survive with no signal.
      // Pointer jumping collapses chains in O(log2 diameter) rounds, so
      // the default 20 covers diameters past 2^20 (no realistic dup
      // graph); hitting the cap means a pathological graph or a caller's
      // tiny maxIter, and exactness is this kernel's contract.
      require(converged,
        s"connected components did not converge within $maxIter rounds — " +
          "labels are partial and deduplication over them would keep " +
          "duplicates silently; raise maxIter (rounds grow with " +
          "log2(component diameter))")
      labels
  }
}
