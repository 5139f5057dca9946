package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, a broadcast nested-loop of
  * |Q|×|C| dot products; right only when the query set is small. Scale path:
  * random-hyperplane LSH — signature bits from seeded deterministic planes,
  * equi-join on (table, bucket) keys, cosine verified on candidates only.
  * Dot products are `zip_with`+`aggregate` higher-order functions (JVM
  * codegen'd per element, no UDF, no collect).
  */
object Similarity {

  /** Cast an array<float> column to array<double> for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — native codegen expression since r17 (same rationale
    * and bit-parity argument as [[sqDist]]; the HOF form ran interpreted
    * per element, once per hyperplane per row on the LSH path). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.catalyst.DotProduct(
        org.apache.spark.sql.graft.GraftSql.expression(a),
        org.apache.spark.sql.graft.GraftSql.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Native codegen'd cosine when GraftExtensions is installed on the
    * session, else the built-in HOF composition. Both accumulate in
    * ascending index order, so the results are bit-identical. */
  private[llm] def cosineFor(spark: org.apache.spark.sql.SparkSession)
                       (a: Column, b: Column): Column =
    if (graft.catalyst.GraftExtensions.isInstalled(spark))
      graft.catalyst.GraftExtensions.cosineSim(a, b)
    else cosine(a, b)

  /** Exact top-k neighbors for each query vector: broadcast the (small)
    * query side, score all corpus rows, window top-k with id tiebreak.
    * Output: (query_id, rank, neighbor_id, cos). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryIdCol: String, corpusIdCol: String,
                     vecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    // NaN-element vectors are dropped (r13): a NaN cosine sorts ABOVE
    // every real score under desc (Spark's NaN total order), so one
    // failed-encoder row would be rank 1 of EVERY query. Null vectors
    // stay: their null cosine sorts last, harmlessly.
    def noNan(v: Column): Column =
      !coalesce(exists(v, e => isnan(e)), lit(false))
    val q = queries.select(col(queryIdCol).as("query_id"),
        toDouble(col(vecCol)).as("qv"))
      .filter(noNan(col("qv")))
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cv"))
      .filter(noNan(col("cv")))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosineFor(queries.sparkSession)(col("qv"), col("cv")).as("cos"))
    rankedTopK(scored, col("cos").desc, "cos", k)
  }

  /** Exact all-pairs with cosine >= threshold. O(n²) — small corpora and
    * oracle checks only; the scale path is `lshPairsAbove`. */
  def allPairsAbove(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double): DataFrame = {
    // NaN-element vectors dropped (r13): `NaN >= threshold` is TRUE
    // under Spark's NaN ordering, so they would emit spurious pairs
    // (null-element vectors already vanish — null cosine fails >=)
    val v = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .filter(!coalesce(exists(col("v"), e => isnan(e)), lit(false)))
    val a = v.alias("a")
    val b = v.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineFor(df.sparkSession)(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Well-formed vector predicate: exact length, no null elements, and
    * no NaN elements. `size(null)` is null so the length check drops
    * null vectors, but a vector with a null ELEMENT passes it — and one
    * such element makes every plane dot / ADC / cosine null, which
    * re-creates the bucket-0 pileup and k-null-neighbors poisoning the
    * length filter exists to prevent. NaN (r13: what a failed encoder
    * actually emits) is WORSE than null: Spark's total order puts NaN
    * ABOVE every double, so a NaN cosine sorts to rank 1 of every
    * query under `desc`, `NaN >= threshold` is TRUE in pair filters,
    * and all-NaN vectors share one bucket per table (NaN > 0) —
    * re-creating the quadratic pileup with wrong results instead of
    * vanishing ones. One array scan per row buys all three out. */
  private def wellFormed(v: Column, dim: Int): Column =
    size(v) === dim && !exists(v, e => e.isNull || isnan(e))

  /** 0-based argmin over a centroid-distance array — THE cell/code
    * assignment expression. One definition (r13 review): the in-memory
    * assignment (ivfTopK, pqTopK's encode) and the persisted-index
    * assignment (writeIvfIndex) MUST stay bit-identical, or a stored
    * index probed by the in-memory quantizer returns silently wrong
    * neighbors — exactly the torn-index class the `_params` stamp
    * guards, but stamp-invisible. */
  private def nearestIdx(dists: Column): Column =
    (array_position(dists, array_min(dists)) - 1).cast("int")

  /** Shared ANN top-k postlude: bounded-heap top-k per query, ordered by
    * (score, neighbor_id tiebreak), rank renamed to the public contract.
    * One code path for all five variants so the output shape cannot
    * drift between them (r13 review). */
  private def rankedTopK(scored: DataFrame, scoreOrd: Column,
                         scoreCol: String, k: Int): DataFrame =
    graft.ops.BestMatch.topKPerKey(scored, Seq(col("query_id")),
        Seq(scoreOrd, col("neighbor_id").asc), k)
      .withColumnRenamed("__graft_rank", "rank")
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col(scoreCol))

  /** Deterministic random hyperplanes: `tables` independent sets of
    * `planesPerTable` unit-free gaussian planes, seeded — identical across
    * executors and runs. */
  def hyperplanes(dim: Int, planesPerTable: Int, tables: Int,
                  seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    // bucket keys pack one bit per plane into an int via 1 << i, which
    // silently WRAPS past 32 — plane 32 would alias plane 0 and inflate
    // collisions with no error, so refuse up front
    require(planesPerTable >= 1 && planesPerTable <= 32,
      s"planesPerTable must be in [1, 32] (bucket keys pack one bit per " +
        s"plane into an Int), got $planesPerTable")
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(planesPerTable)(
      Array.fill(dim)(rnd.nextGaussian())))
  }

  /** (table, bucket) keys for one vector: bucket = sign-bit string of the
    * table's hyperplane dot products, folded into an int. */
  def lshKeys(vec: Column, planes: Seq[Seq[Array[Double]]]): Column =
    array(planes.zipWithIndex.map { case (tablePlanes, t) =>
      val bucket = tablePlanes.zipWithIndex.map { case (p, i) =>
        val planeCol = array(p.map(lit).toSeq: _*)
        when(dot(vec, planeCol) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }: _*)

  /** Approximate pairs with cosine >= threshold: candidates = pairs sharing
    * any (table, bucket), verified exactly. Recall grows with `tables`,
    * candidate volume shrinks with `planesPerTable` — both join-key-bounded
    * equi-joins, no all-pairs stage.
    *
    * Parameter math (collision prob per table = (1 - acos(c)/π)^planes):
    * the 8×4 defaults give recall ≈ 0.99 at cosine 0.9 and ≈ 0.9 at 0.8 —
    * the near-duplicate regime they are tuned for — while candidate volume
    * from unrelated pairs stays ~1.6% of all pairs. Low thresholds
    * (cos ≈ 0.4) are intrinsically hard for hyperplane LSH (recall ~0.1
    * here); use more tables with fewer planes, or `ivfTopK`, for broad
    * similarity search. */
  def lshPairsAbove(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, planesPerTable: Int = 8,
                    tables: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = headDim(df, vecCol)
    if (dim == 0) // empty corpus / all-null vectors: zero pairs, no crash
      return df.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        lit(0.0).as("cos")).limit(0)
    val planes = hyperplanes(dim, planesPerTable, tables, seed)
    // v feeds the bucket-key build AND both verify-join sides — persist
    // so the source scan + float→double transform runs once, released
    // via finishAndRelease (same shape as the Dedup prefix kernels)
    // drop null/ragged vectors up front: every null vector votes 0 on
    // every plane, so ALL of them collide in bucket 0 of every table —
    // a failed-encoder shard of n nulls would build O(n²) candidate
    // pairs that verify to null and vanish, correct but quadratic.
    // (trainSample filters the same class for the same reason.)
    val v = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .filter(wellFormed(col("v"), dim))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = v.select(col("id"), col("v"),
        explode(lshKeys(col("v"), planes)).as("k"))
      .select(col("id"), col("v"), col("k.table").as("t"),
        col("k.bucket").as("bkt"))
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    val candidates = a.join(b,
        col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val va = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val vb = v.select(col("id").as("id_b"), col("v").as("v_b"))
    val out = candidates.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        cosineFor(df.sparkSession)(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
    graft.Util.finishAndRelease(out, v)
  }

  /** Corpus dimensionality = the MODAL vector size (ties to the smaller),
    * or 0 for an empty/all-null input (an empty ingest batch must yield
    * zero pairs, not a head-of-empty crash). Modal, not max: the ANN
    * kernels filter to `size === dim`, and under max a single oversized
    * junk vector would silently drop the entire well-formed corpus. */
  private def headDim(df: DataFrame, vecCol: String): Int = {
    val rows = df.groupBy(size(col(vecCol)).as("__d")).count()
      .filter(col("__d").isNotNull && col("__d") > 0)
      .orderBy(col("count").desc, col("__d").asc)
      .limit(1).collect()
    if (rows.isEmpty) 0 else rows(0).getInt(0)
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nlist` KMeans cells, then scan only each query's `nprobe` nearest
    * cells. The cell assignment is one ML pipeline pass; probing is an
    * equi-join on the cell id, so the per-query work drops from |corpus| to
    * ~|corpus|·nprobe/nlist. Deterministic under the fixed seed.
    *
    * Cell ranking uses squared euclidean distance to the centroids (the
    * KMeans objective): ||q-c||² = ||q||² - 2q·c + ||c||², and ||q||² is
    * constant per query, so cells rank by (||c||² - 2q·c) — centroids are
    * folded into the plan as literal arrays (driver-side, nlist×dim
    * doubles). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              queryIdCol: String, corpusIdCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L, trainN: Int = 2048,
              excludeSelf: Boolean = true,
              maxInlineLiterals: Int = MaxInlineLiterals): DataFrame = {
    val corpusVec = corpus.select(col(corpusIdCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
    val q0 = queries.select(col(queryIdCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    // well-formed vectors only, like pqTopK: a ragged vector in the
    // training sample crashes the driver-side Lloyd distance loop, and
    // null vectors carry no geometry (size(null) is null, so one
    // predicate covers both)
    val dim = headDim(corpus, vecCol)
    val corpusF = corpusVec.filter(wellFormed(col("cv"), dim))
    val qF = q0.filter(wellFormed(col("qv"), dim))
    // Coarse quantizer trains driver-side on a deterministic hash-ordered
    // sample, like pqTopK's codebooks (IVF only needs a reasonable space
    // partition, not converged clusters); the cell ASSIGNMENT of the full
    // corpus stays distributed — an argmin expression over the nlist
    // centroid distances, centroids folded as literals. Replacing the
    // Spark-ML fit's per-iteration job overhead cut the sf0.1 query from
    // ~2 s to the assignment+probe cost.
    val sample = trainSample(corpusF, "cv", "neighbor_id", trainN)
    if (sample.isEmpty) // empty corpus: zero neighbors, not a train error
      return q0.limit(0).crossJoin(corpusVec.limit(0))
        .select(col("query_id"), lit(0).as("rank"), col("neighbor_id"),
          lit(0.0).as("cos"))
    val centers = localLloyd(sample, nlist, iters = 5, seed = seed)
    // two-regime literal folding (see MaxInlineLiterals): per-centroid
    // inline literals for small quantizers, one typedLit above the budget
    val inline = nlist.toLong * centers.head.length <= maxInlineLiterals
    val dists = centroidDists(col("cv"), centers, inline)
    val assigned = corpusF
      .withColumn("cell", nearestIdx(dists))
      .select(col("neighbor_id"), col("cv"), col("cell"))
    val probed = qF.withColumn("cell",
      explode(probeCells(col("qv"), centers, inline, nprobe)))
    val scored = probed.join(assigned, "cell")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosineFor(queries.sparkSession)(col("qv"), col("cv")).as("cos"))
    rankedTopK(scored, col("cos").desc, "cos", k)
  }

  /** The nprobe nearest cells for a query vector, as an int array column.
    * Cell rank key: ||c||² − 2 q·c. The driver-side `c.map(x*x).sum` and
    * the engine-side dot(c, c) both accumulate in ascending index order,
    * so the inline and typedLit regimes stay bit-identical. */
  private def probeCells(qv: Column, centers: Array[Array[Double]],
                         inline: Boolean, nprobe: Int): Column = {
    val cellScoreArr =
      if (inline) array(centers.zipWithIndex.map { case (c, i) =>
        val cArr = array(c.map(lit).toSeq: _*)
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - lit(2.0) * dot(qv, cArr)).as("d"),
          lit(i).as("cell"))
      }.toSeq: _*)
      else transform(typedLit(centers.map(_.toSeq).toSeq), (c, i) =>
        struct((dot(c, c) - lit(2.0) * dot(qv, c)).as("d"),
          i.as("cell")))
    transform(slice(array_sort(cellScoreArr), 1, nprobe),
      s => s.getField("cell"))
  }

  /** Persist an IVF index: the trained coarse quantizer's centroids
    * (`<path>/centroids`) plus the corpus assigned to cells,
    * HIVE-PARTITIONED BY CELL (`<path>/cells/cell=N/...`). Partitioning
    * by cell is the point of the artifact: a probe filters on its nprobe
    * cell ids, so the scan opens nprobe/nlist of the files — on object
    * storage that is the difference between touching 25% and 100% of a
    * corpus-sized index. Training is the same deterministic sample +
    * driver Lloyd as [[ivfTopK]] (same seed → same centroids → probe
    * results identical to the in-memory path; LlmSpec pins this). */
  def writeIvfIndex(corpus: DataFrame, corpusIdCol: String, vecCol: String,
                    path: String, nlist: Int = 16, seed: Long = 42L,
                    trainN: Int = 2048,
                    maxInlineLiterals: Int = MaxInlineLiterals): Unit = {
    val spark = corpus.sparkSession
    // all three passes here are EAGER (headDim's modal-size aggregate,
    // trainSample's collect, the partitioned cells write), so one
    // persist shares the source scan + float→double transform across
    // them instead of re-reading the corpus three times (r13 review;
    // the lazy ivfTopK/pqTopK paths deliberately do NOT persist — they
    // return unexecuted plans and a persist there would leak past the
    // call). Released before returning.
    val corpusVec = corpus.select(col(corpusIdCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val dim = headDim(corpusVec, "cv")
    val corpusF = corpusVec.filter(wellFormed(col("cv"), dim))
    val sample = trainSample(corpusF, "cv", "neighbor_id", trainN)
    require(sample.nonEmpty,
      s"cannot build an IVF index over an empty corpus at $path")
    val centers = localLloyd(sample, nlist, iters = 5, seed = seed)
    val inline = nlist.toLong * centers.head.length <= maxInlineLiterals
    val dists = centroidDists(col("cv"), centers, inline)
    import spark.implicits._
    // `_params` is the COMMIT RECORD (r12): deleted before the first
    // data write, recreated last. A rebuild that crashes between the
    // centroids and cells overwrites would otherwise leave a torn index
    // — cell assignments computed under the OLD centroids probed via the
    // NEW ones — which returns silently wrong neighbors (recall loss
    // with no error); stamp-less layouts are refused by ivfTopKVsIndex.
    val stamp = new org.apache.hadoop.fs.Path(s"$path/_params")
    val stampFs =
      stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    stampFs.delete(stamp, false)
    centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    corpusF
      .withColumn("cell", nearestIdx(dists))
      // align files with cells before the dynamic-partition write
      // (r16, the q_summary_bucketed lesson): unaligned, every corpus
      // task writes one file per cell it sees — tasks × nlist small
      // files per build, and every probe's cell scan pays that footer
      // count. One corpus-sized shuffle at BUILD time (the "build
      // once, probe many" side of the trade) caps the layout at
      // ~one file per cell; probe-side results are unaffected (cell
      // contents are a set — the probe's top-k orders by distance
      // with deterministic id tie-breaks).
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val out = stampFs.create(stamp, true)
    try out.write(s"$nlist,$seed,$trainN"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    } finally corpusVec.unpersist()
  }

  /** Probe a stored IVF index ([[writeIvfIndex]]): rank the stored
    * centroids per query, read ONLY the nprobe nearest cell partitions
    * (the probe-cell set folds into a static isin filter, so the parquet
    * source prunes whole `cell=N` directories — PartitionFilters, pinned
    * by LlmSpec), exact cosine on the probed fraction, bounded-heap
    * top-k. Same output contract as [[ivfTopK]], and identical results
    * for the same (nlist, seed, trainN): the quantizer is deterministic. */
  def ivfTopKVsIndex(queries: DataFrame, indexPath: String,
                     queryIdCol: String, vecCol: String, k: Int,
                     nprobe: Int = 4, excludeSelf: Boolean = true,
                     maxInlineLiterals: Int = MaxInlineLiterals)
      : DataFrame = {
    val spark = queries.sparkSession
    val stamp = new org.apache.hadoop.fs.Path(s"$indexPath/_params")
    require(stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(stamp),
      s"IVF index at $indexPath has no _params stamp — the stamp is " +
        "writeIvfIndex's commit record (written after both tables), so " +
        "its absence means a crashed/torn rebuild (cells assigned under " +
        "different centroids return silently wrong neighbors) or a " +
        "pre-stamp layout; rebuild with writeIvfIndex")
    val centers = spark.read.parquet(s"$indexPath/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val dim = centers.head.length
    val qF = queries.select(col(queryIdCol).as("query_id"),
        toDouble(col(vecCol)).as("qv"))
      .filter(wellFormed(col("qv"), dim))
    val inline = centers.length.toLong * dim <= maxInlineLiterals
    // CHECKPOINT the probed queries: they feed the cell-id collect AND
    // the candidate join — recomputed, the query-side probe runs twice,
    // and a LIVE query source could even change between the two
    // executions, leaving the static isin missing a probed cell (its
    // candidates silently dropped). localCheckpoint (not persist) so
    // the returned frame carries no cached-plan residue and the index
    // scan's PartitionFilters stay visible in the result plan.
    val probed = qF.withColumn("cell",
        explode(probeCells(col("qv"), centers, inline, nprobe)))
      .localCheckpoint()
    // the distinct probe cells are bounded by nlist — fold them into a
    // STATIC isin filter so the parquet source prunes whole cell
    // partitions instead of scanning the full index and joining it away
    val cellIds = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = spark.read.parquet(s"$indexPath/cells")
      .filter(col("cell").isin(cellIds: _*))
    val scored = probed.join(cells, "cell")
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosineFor(spark)(col("qv"), col("cv")).as("cos"))
    rankedTopK(scored, col("cos").desc, "cos", k)
  }

  /** Product-quantization approximate top-k (the faiss PQ/ADC shape —
    * the third ANN regime next to LSH and IVF: LSH prunes by bucket, IVF
    * prunes by cell, PQ compresses so the EXHAUSTIVE scan itself gets
    * cheap). The vector is split into `m` subvectors; each subspace gets a
    * `ksub`-centroid KMeans codebook; a corpus vector becomes `m` small
    * codes (m × log2(ksub) bits — 32 bits here vs 2048 for the raw floats).
    * Queries score candidates by Asymmetric Distance Computation: each
    * query precomputes a per-subspace lookup table of squared distances to
    * every centroid ONCE (m × ksub entries on the broadcast side), and the
    * per-candidate cost collapses to `m` table lookups + adds — ~8× fewer
    * flops than an exact 64-dim dot product, with the corpus held in RAM-
    * sized codes instead of full vectors.
    *
    * Codebooks train on the corpus driver-side (m small fits); at 100 TB
    * you train on a hash-sample (Sampling.hashFilter) and broadcast the
    * codebooks — the ENCODE pass stays fully distributed either way, and
    * the codes parquet is the persistent index. Deterministic under the
    * fixed seed. Standard deployment reranks the ADC top-`k` shortlist
    * with exact distance (compose with `bruteForceTopK` on the shortlist).
    * Output: (query_id, rank, neighbor_id, adc — squared-distance approx,
    * ascending). */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
             queryIdCol: String, corpusIdCol: String, vecCol: String,
             k: Int, m: Int = 8, ksub: Int = 16,
             seed: Long = 42L, trainN: Int = 2048,
             excludeSelf: Boolean = true,
             maxInlineLiterals: Int = MaxInlineLiterals): DataFrame = {
    val dim = headDim(corpus, vecCol)
    val corpusD = corpus.select(col(corpusIdCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
    val q0 = queries.select(col(queryIdCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    if (dim == 0) // empty corpus: zero neighbors, not a dim error
      return q0.limit(0).crossJoin(corpusD.limit(0))
        .select(col("query_id"), lit(0).as("rank"), col("neighbor_id"),
          lit(0.0).as("adc"))
    require(dim % m == 0, s"dim=$dim must be a multiple of m=$m")
    val sub = dim / m
    // well-formed vectors only (size(null) is null, so one predicate
    // covers null AND ragged): a null/short corpus vector's ADC is null,
    // and the ascending rank would otherwise put those rows FIRST
    // (NULLS FIRST default) — k null neighbors for every query. Same
    // poisoning on the query side via null lookup tables.
    val corpusF = corpusD.filter(wellFormed(col("cv"), dim))
    val qF = q0.filter(wellFormed(col("qv"), dim))
    // Codebooks train driver-side on a deterministic hash-ordered sample
    // (the faiss posture: PQ codebooks never see the full corpus). ONE
    // TakeOrdered collect of trainN vectors feeds all m subspace fits —
    // measured at sf0.1 this replaced eight Spark-ML KMeans fits' job
    // overhead and cut the query from 7.8 s to the encode+ADC cost.
    // md5 ordering makes the sample stable under row order, partitioning,
    // and engine; a few Lloyd rounds suffice (space partition, not
    // convergence — same rationale as ivfTopK's maxIter = 5).
    val sample = trainSample(corpusF, "cv", "neighbor_id", trainN)
    if (sample.isEmpty) // no well-formed corpus vectors (r12: headDim can
      // return the modal SIZE while every modal-size vector carries a
      // null element, so the dim==0 guard above does not cover this —
      // ivfTopK already had the same second guard): zero neighbors, not
      // a localLloyd train error
      return q0.limit(0).crossJoin(corpusD.limit(0))
        .select(col("query_id"), lit(0).as("rank"), col("neighbor_id"),
          lit(0.0).as("adc"))
    val codebooks: IndexedSeq[Array[Array[Double]]] = (0 until m).map { j =>
      localLloyd(sample.map(v => java.util.Arrays.copyOfRange(
        v, j * sub, (j + 1) * sub)), ksub, iters = 5, seed = seed + j)
    }
    // two-regime literal folding (see MaxInlineLiterals): total codebook
    // payload across the m subspaces is ksub × dim doubles
    val inline = ksub.toLong * dim <= maxInlineLiterals
    val codes = corpusF.select(
      col("neighbor_id") +: pqCodeCols(codebooks, sub, inline): _*)
    val q = qF.select(
      col("query_id") +: col("qv") +: pqLutCols(codebooks, sub, inline): _*)
    val scored = codes
      .join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"), pqAdc(m).as("adc"))
    rankedTopK(scored, col("adc").asc_nulls_last, "adc", k)
  }

  /** Per-subspace ENCODE columns (`__pqc0..`): argmin over each
    * codebook's centroid distances on the `cv` column. ONE definition
    * shared by the in-memory path and the persisted-index build — the
    * [[nearestIdx]] discipline: stored codes probed under a
    * differently-built encoder return silently wrong neighbors. */
  private def pqCodeCols(codebooks: IndexedSeq[Array[Array[Double]]],
                         sub: Int, inline: Boolean): Seq[Column] =
    codebooks.indices.map { j =>
      nearestIdx(centroidDists(slice(col("cv"), j * sub + 1, sub),
        codebooks(j), inline)).as(s"__pqc$j")
    }

  /** Per-subspace ADC LOOKUP-TABLE columns (`__pql0..`) on the `qv`
    * column — the per-query half of the shared encode/lookup pair. */
  private def pqLutCols(codebooks: IndexedSeq[Array[Array[Double]]],
                        sub: Int, inline: Boolean): Seq[Column] =
    codebooks.indices.map { j =>
      centroidDists(slice(col("qv"), j * sub + 1, sub),
        codebooks(j), inline).as(s"__pql$j")
    }

  /** The per-candidate ADC: m table lookups + adds, left-associated
    * (the oracle replays this exact fold order). */
  private def pqAdc(m: Int): Column = (0 until m)
    .map(j => element_at(col(s"__pql$j"), col(s"__pqc$j") + 1))
    .reduce(_ + _)

  /** Persist a PQ index — the artifact [[pqTopK]]'s Scaladoc promises:
    * the trained per-subspace codebooks (`<path>/codebooks`: j, cell,
    * center — m × ksub small rows) plus the corpus ENCODED to m small
    * codes (`<path>/codes`: neighbor_id + m ints ≈ m·log2(ksub) bits a
    * vector, 64× smaller than the raw floats here). Build once (the
    * corpus-sized encode pass), probe many times against the codes —
    * the probe never touches the raw vectors. Training is the same
    * deterministic sample + driver Lloyd as [[pqTopK]] (same seed →
    * same codebooks → probe results identical to the in-memory path;
    * LlmSpec pins the parity). `_params` is the commit record, the
    * [[writeIvfIndex]] torn-rebuild defense: deleted before the first
    * write, recreated last — codes encoded under OLD codebooks probed
    * via NEW lookup tables are silently wrong, so a stamp-less layout
    * is refused by [[pqTopKVsIndex]]. */
  def writePqIndex(corpus: DataFrame, corpusIdCol: String, vecCol: String,
                   path: String, m: Int = 8, ksub: Int = 16,
                   seed: Long = 42L, trainN: Int = 2048,
                   maxInlineLiterals: Int = MaxInlineLiterals): Unit = {
    val spark = corpus.sparkSession
    // eager passes share the scan via one persist (the writeIvfIndex
    // rationale); released before returning
    val corpusVec = corpus.select(col(corpusIdCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = headDim(corpusVec, "cv")
      require(dim > 0 && dim % m == 0,
        s"cannot build a PQ index at $path: corpus dim $dim is not a " +
          s"positive multiple of m=$m")
      val sub = dim / m
      val corpusF = corpusVec.filter(wellFormed(col("cv"), dim))
      val sample = trainSample(corpusF, "cv", "neighbor_id", trainN)
      require(sample.nonEmpty,
        s"cannot build a PQ index over an empty corpus at $path")
      val codebooks: IndexedSeq[Array[Array[Double]]] =
        (0 until m).map { j =>
          localLloyd(sample.map(v => java.util.Arrays.copyOfRange(
            v, j * sub, (j + 1) * sub)), ksub, iters = 5, seed = seed + j)
        }
      val inline = ksub.toLong * dim <= maxInlineLiterals
      import spark.implicits._
      val stamp = new org.apache.hadoop.fs.Path(s"$path/_params")
      val stampFs =
        stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      stampFs.delete(stamp, false)
      codebooks.zipWithIndex
        .flatMap { case (cb, j) =>
          cb.zipWithIndex.map { case (c, cell) => (j, cell, c.toSeq) } }
        .toDF("j", "cell", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      corpusF.select(
          col("neighbor_id") +: pqCodeCols(codebooks, sub, inline): _*)
        .write.mode("overwrite").parquet(s"$path/codes")
      val out = stampFs.create(stamp, true)
      try out.write(s"$m,$ksub,$seed,$trainN"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } finally corpusVec.unpersist()
  }

  /** Probe a stored PQ index ([[writePqIndex]]): rebuild the per-query
    * ADC lookup tables from the STORED codebooks (m × ksub rows, one
    * bounded collect) and scan only the codes parquet — the raw
    * vectors are never read. Same output contract as [[pqTopK]] and
    * identical results for the same (m, ksub, seed, trainN): the
    * quantizer is deterministic and the encode/lookup expressions are
    * one shared definition. */
  def pqTopKVsIndex(queries: DataFrame, indexPath: String,
                    queryIdCol: String, vecCol: String, k: Int,
                    excludeSelf: Boolean = true,
                    maxInlineLiterals: Int = MaxInlineLiterals)
      : DataFrame = {
    val spark = queries.sparkSession
    val stamp = new org.apache.hadoop.fs.Path(s"$indexPath/_params")
    require(stamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(stamp),
      s"PQ index at $indexPath has no _params stamp — the stamp is " +
        "writePqIndex's commit record (written after both tables), so " +
        "its absence means a crashed/torn rebuild (codes encoded under " +
        "different codebooks return silently wrong neighbors) or a " +
        "foreign layout; rebuild with writePqIndex")
    val codebooks: IndexedSeq[Array[Array[Double]]] =
      spark.read.parquet(s"$indexPath/codebooks")
        .collect().map(r =>
          (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }
        .toIndexedSeq
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val dim = m * sub
    val ksub = codebooks.head.length
    val inline = ksub.toLong * dim <= maxInlineLiterals
    val qF = queries.select(col(queryIdCol).as("query_id"),
        toDouble(col(vecCol)).as("qv"))
      .filter(wellFormed(col("qv"), dim))
    val q = qF.select(
      col("query_id") +: col("qv") +: pqLutCols(codebooks, sub, inline): _*)
    val codes = spark.read.parquet(s"$indexPath/codes")
    val scored = codes
      .join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("neighbor_id")
        else lit(true))
      .select(col("query_id"), col("neighbor_id"), pqAdc(m).as("adc"))
    rankedTopK(scored, col("adc").asc_nulls_last, "adc", k)
  }

  /** Squared L2 distance between two array columns (either may be a
    * lambda variable) — accumulates in ascending index order. */
  /** Squared L2 distance — native codegen expression since r17 (the HOF
    * composition `aggregate(zip_with(...))` ran the lambda interpreter
    * per element and allocated the zipped array per evaluation; the IVF
    * assignment and PQ encode evaluate nlist / m·ksub of these per
    * corpus row). [[graft.catalyst.SqDistance]] accumulates in the same
    * ascending-index left-fold order, so results are bit-identical —
    * the ANN oracles bit-replay the fold, and LlmSpec pins the parity.
    * Built directly from the expression (no function registry), so
    * sessions without GraftExtensions still work — including inside
    * `transform` lambdas (the typedLit regime), where the lambda
    * variable binds as an ordinary child expression. */
  private def sqDist(s: Column, c: Column): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.catalyst.SqDistance(
        org.apache.spark.sql.graft.GraftSql.expression(s),
        org.apache.spark.sql.graft.GraftSql.expression(c)))

  /** Squared L2 distance from a vector column to a literal centroid —
    * shared by the IVF assignment and the PQ encode/ADC builds. */
  private def sqDistTo(s: Column, c: Array[Double]): Column =
    sqDist(s, array(c.map(lit).toSeq: _*))

  /** Inline-literal budget (total centroid DOUBLES folded into the plan
    * as per-element `lit` nodes). Small codebooks inline — Catalyst
    * constant-folds each centroid array and whole-stage codegen sees
    * flat constants. Past the budget the per-element form explodes the
    * expression tree (ksub=256, m=32, dim 2048 ⇒ 512K literal NODES:
    * plan serialization, analysis, and codegen all blow up), so the
    * codebook folds as ONE `typedLit` nested-array literal instead —
    * a single expression node whose payload rides the task binary — and
    * distances come from `transform` over it: same IEEE op order, so
    * the two regimes are bit-identical (the LlmSpec parity pin). */
  val MaxInlineLiterals = 8192

  /** Distance-to-every-centroid array under the two-regime rule:
    * per-centroid inline literals below the budget, one typedLit +
    * transform above it. */
  private def centroidDists(s: Column, cb: Array[Array[Double]],
                            inline: Boolean): Column =
    if (inline) array(cb.map(c => sqDistTo(s, c)).toSeq: _*)
    else transform(typedLit(cb.map(_.toSeq).toSeq), c => sqDist(s, c))

  /** Deterministic hash-ordered quantizer-training sample collected to
    * the driver (md5 order is stable under row order, partitioning, and
    * engine). Null vectors carry no geometry and are dropped before the
    * collect rather than NPE-ing inside it. */
  private def trainSample(vec: DataFrame, vecCol: String, idCol: String,
                          n: Int): Array[Array[Double]] =
    // NaN elements excluded too (r13): a NaN point poisons every Lloyd
    // centroid it touches (NaN arithmetic propagates), same class as the
    // null-element exclusion
    vec.filter(col(vecCol).isNotNull &&
        !exists(col(vecCol), e => e.isNull || isnan(e)))
      // id tiebreak (nulls last): md5 alone has no order among duplicate
      // or null ids, so which tied row crosses the limit boundary would
      // be partition-dependent — breaking the documented same-seed ->
      // same-centroids determinism on corpora with id collisions
      .orderBy(md5(col(idCol).cast("string")).asc_nulls_last,
        col(idCol).cast("string").asc_nulls_last)
      .limit(n)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Double](0).toArray)

  /** Seeded driver-side Lloyd iterations for PQ codebook training (inputs
    * are a bounded sample by contract — see pqTopK). Empty clusters keep
    * their previous center, matching the usual KMeans repair. */
  private def localLloyd(points: Array[Array[Double]], k: Int, iters: Int,
                         seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "codebook training needs a non-empty sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    var centers = rnd.shuffle(points.indices.toVector).take(k)
      .map(i => points(i).clone).toArray
    // fewer distinct points than k: pad by cycling (harmless duplicates)
    while (centers.length < k) centers = centers ++ centers.take(
      math.min(k - centers.length, centers.length))
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centers.length) {
        var d = 0.0; var i = 0
        while (i < dim) { val t = p(i) - centers(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        val c = nearest(p); counts(c) += 1
        var i = 0; while (i < dim) { sums(c)(i) += p(i); i += 1 }
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else { val a = sums(c); var i = 0
          while (i < dim) { a(i) /= counts(c); i += 1 }; a }
      }
    }
    centers
  }

  /** The standard PQ deployment: ADC shortlist of `shortlist` candidates
    * per query, then EXACT cosine rerank of only those — approximation
    * error shrinks to shortlist-recall error while the exact math touches
    * `shortlist` rows per query instead of the corpus. With
    * `shortlist >= |corpus|` this equals `bruteForceTopK` exactly (the
    * LlmSpec invariant). Output: (query_id, rank, neighbor_id, cos).
    *
    * Equality with bruteForceTopK at full shortlist holds for WELL-FORMED
    * corpora: brute force ranks null/ragged vectors last with null cosine,
    * while the PQ path filters them out entirely — on malformed inputs the
    * two differ by exactly those rows. */
  def pqTopKReranked(queries: DataFrame, corpus: DataFrame,
                     queryIdCol: String, corpusIdCol: String, vecCol: String,
                     k: Int, shortlist: Int, m: Int = 8, ksub: Int = 16,
                     seed: Long = 42L, trainN: Int = 2048,
                     excludeSelf: Boolean = true,
                     maxInlineLiterals: Int = MaxInlineLiterals): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val short = pqTopK(queries, corpus, queryIdCol, corpusIdCol, vecCol,
      shortlist, m, ksub, seed, trainN, excludeSelf, maxInlineLiterals)
    val qv = queries.select(col(queryIdCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    val cv = corpus.select(col(corpusIdCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
    val exact = short.select("query_id", "neighbor_id")
      .join(broadcast(qv), "query_id").join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosineFor(queries.sparkSession)(col("qv"), col("cv")).as("cos"))
    rankedTopK(exact, col("cos").desc, "cos", k)
  }

  /** Per-label centroids as (label, pos, centroid) rows — the building
    * block for IVF coarse quantizers, class prototypes, and drift checks.
    * posexplode + a map-side-combined (label, pos) average: the shuffle
    * carries labels x dim partial sums, independent of corpus size. `pos`
    * is 1-based (SQL subscript convention); values are averaged in double
    * and rounded to 6 dp for cross-engine stability. */
  def labelCentroids(emb: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    emb.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), (col("pos") + 1).as("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("centroid"))
}
