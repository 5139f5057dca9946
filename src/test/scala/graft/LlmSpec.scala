package graft

import graft.llm.{Dedup, Multimodal, Similarity, TextFunctions}
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Util.table(spark, sf, "documents")
  private def embs = Util.table(spark, sf, "embeddings")

  test("minhash-LSH pairs are a subset of naive threshold pairs (no false positives)") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: all-pairs true shingle-set jaccard
    val sets = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
    val a = sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val naive = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(naive), "verified LSH pairs must all be true pairs")
    if (naive.nonEmpty) {
      val recall = lsh.size.toDouble / naive.size
      info(s"LSH recall at jac>=0.5: $recall (${lsh.size}/${naive.size})")
      assert(recall > 0.5, "banding should catch most high-jaccard pairs")
    }
  }

  test("training-data pipeline: dedups, filters, and packs with invariants") {
    val docs = Util.table(spark, "/root/testdata/sf0.001", "documents")
    val out = graft.pipeline.TrainingData.prepare(docs, "doc_id", "text",
      "source").collect()
    val inIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val outIds = out.map(_.getLong(0))
    assert(outIds.toSet.subsetOf(inIds), "output ids come from the input")
    assert(outIds.length === outIds.distinct.length, "each doc at most once")
    assert(out.forall(r => r.getLong(r.fieldIndex("n_tokens")) >= 5),
      "quality floor holds")
    // r12: clean_text rides through — the pipeline's primary artifact
    // must not force callers to re-run the cleaning pass to recover it
    assert(out.forall { r =>
      val t = r.getString(r.fieldIndex("clean_text"))
      t != null && t.nonEmpty
    }, "prepare() must emit the cleaned text it computed")
    // survivors have no exact-duplicate cleaned text left
    import org.apache.spark.sql.functions._
    import graft.llm.TextFunctions
    val survivors = docs.filter(col("doc_id").isin(outIds: _*))
      .select(TextFunctions.redactPii(
        TextFunctions.normalizeText(col("text"))).as("t"))
    assert(survivors.count() === survivors.distinct().count())
    // bins are dense per source: 0..max with no gaps
    out.groupBy(r => r.getString(r.fieldIndex("source")))
      .foreach { case (_, rows) =>
        val bins = rows.map(r => r.getLong(r.fieldIndex("bin")))
          .distinct.sorted
        assert(bins === (0L to bins.max).toVector,
          s"gapped bins: ${bins.mkString(",")}")
      }
    assert(out.nonEmpty)
  }

  test("minhash hot-bucket cap drops oversized buckets, keeps the rest") {
    import spark.implicits._
    // three identical docs collide in every band (bucket size 3); one
    // unrelated near-pair lives in buckets of size 2
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine ten extra")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(d, "doc_id", "text",
        threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((10L, 11L)))
    val capped = Dedup.minhashLshPairs(d, "doc_id", "text",
        threshold = 0.5, maxBucketSize = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => Set(1L, 2L, 3L)(p._1)),
      s"size-3 buckets should be dropped, got $capped")
    assert(capped.contains((10L, 11L)), "size-2 buckets must survive the cap")
  }

  test("simhash pairs equal naive hamming-distance pairs (pigeonhole exact)") {
    val viaLsh = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = docs.select(col("doc_id"),
      TextFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sim"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sim").as("sim_b"))
    val naive = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole banding is exact for hamming<=3 with 4 chunks: no loss
    assert(viaLsh === naive)
  }

  test("simhash maxHamming=0 finds exactly the identical-signature pairs") {
    // chunks=1, bitsPerChunk=64: the single-chunk mask must be all ones
    // ((1L<<64)-1 wraps to 0 and would funnel every doc into one bucket)
    val d = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "one two three four"), (4L, "completely different words here"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("stored corpus index rejects mismatched signature parameters") {
    val path = "target/tmp/llmspec_param_index"
    Dedup.writeCorpusIndex(docs.limit(20), "doc_id", "text", path,
      shingleN = 3, numHashes = 32, bands = 8)
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshNewVsIndex(docs.limit(5), path, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 8)
    }
    assert(e.getMessage.contains("mismatched"))
    intercept[IllegalArgumentException] {
      Dedup.appendCorpusIndex(docs.limit(5), "doc_id", "text", path,
        shingleN = 3, numHashes = 64, bands = 16)
    }
    // matching parameters still pass
    assert(Dedup.minhashLshNewVsIndex(docs.limit(5), path, "doc_id",
      "text").count() >= 0)
  }

  test("IVF and PQ return empty on an empty corpus instead of a train error") {
    val emptyC = embs.limit(0)
    val q = embs.filter(col("vec_id") < 3)
    assert(Similarity.ivfTopK(q, emptyC, "vec_id", "vec_id",
      "embedding", 5).count() === 0L)
    assert(Similarity.pqTopK(q, emptyC, "vec_id", "vec_id",
      "embedding", 5).count() === 0L)
  }

  test("LSH ANN pairs ⊆ brute force, with measurable recall") {
    val brute = Similarity.allPairsAbove(embs, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshPairsAbove(embs, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    if (brute.nonEmpty) {
      info(s"ANN recall at cos>=0.4: ${lsh.size.toDouble / brute.size}")
      assert(lsh.nonEmpty, "buckets should catch some true pairs")
    }
  }

  test("IVF top-k: valid shape, deterministic, measurable recall vs brute") {
    val queries = embs.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(queries, embs, "vec_id", "vec_id",
        "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ivf.length === 50)
    val brute = Similarity.bruteForceTopK(queries, embs, "vec_id", "vec_id",
        "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = ivf.count { case (q, _, n) => brute.contains((q, n)) }
    val recall = hits.toDouble / brute.size
    info(s"IVF recall@5 (nlist=16, nprobe=4, random vectors): $recall")
    assert(recall > 0.1, "probing should find a nontrivial share")
    val again = Similarity.ivfTopK(queries, embs, "vec_id", "vec_id",
        "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ivf.sortBy(x => (x._1, x._2)).sameElements(
      again.sortBy(x => (x._1, x._2))), "fixed seed must be deterministic")
  }

  test("brute-force top-k is exact and deterministically ordered") {
    val out = Similarity.bruteForceTopK(
        embs.filter(col("vec_id") < 3), embs, "vec_id", "vec_id",
        "embedding", 5)
      .collect()
    assert(out.length === 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y })
    }
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDuplicates(df, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 2 && out(0).getLong(2) === 1)
  }

  test("jaccard pair join respects the sound size-band prefilter") {
    val df = Seq(
      (1L, "a b c d", "g"), (2L, "a b c d", "g"),
      (3L, "a b", "g"), (4L, "x y z w", "h"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.jaccardPairsWithinGroup(df, "doc_id", "text", "source", 0.9)
      .collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1)) === (1L, 2L))
    assert(out(0).getDouble(2) === 1.0)
  }

  test("prefix-filtered jaccard pairs equal the all-pairs kernel") {
    for (t <- Seq(0.9, 0.7)) {
      val naive = Dedup.jaccardPairsWithinGroup(docs, "doc_id", "text",
          "source", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsWithinGroupPrefix(docs, "doc_id", "text",
          "source", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref === naive, s"prefix kernel diverged at t=$t")
    }
    // and on a hand case where prefixes matter (shared rare token)
    val df = Seq(
      (1L, "a b c d e f g h i j", "g"), (2L, "a b c d e f g h i k", "g"),
      (3L, "a b", "g"), (4L, "x y z w", "h"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.jaccardPairsWithinGroupPrefix(df, "doc_id", "text",
        "source", 0.8).collect()
    assert(out.length === 1 &&
      (out(0).getLong(0), out(0).getLong(1)) === (1L, 2L))
  }

  test("dedupSegments drops only over-duplicated aligned segments, in order") {
    import graft.llm.CorpusHygiene
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one aligned segment
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3"),            // boiler + unique tail
      (2L, s"$boiler v1 v2 v3"),
      (3L, s"$boiler w1 w2 w3"),
      (4L, "x1 x2 x3"),                     // untouched
      (5L, boiler)                          // ONLY the hot segment -> drops out
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.dedupSegments(docs, "doc_id", "text",
        w = 10, maxOcc = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // boiler occurs 4x (> maxOcc=2) as an aligned segment -> removed
    // everywhere; tails and doc 4 survive; doc 5 vanishes entirely
    assert(out === Seq((1L, "u1 u2 u3"), (2L, "v1 v2 v3"),
      (3L, "w1 w2 w3"), (4L, "x1 x2 x3")))
    // under-threshold duplicates survive: same corpus with maxOcc = 4
    val lax = CorpusHygiene.dedupSegments(docs, "doc_id", "text",
        w = 10, maxOcc = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(lax(0) === (1L, s"$boiler u1 u2 u3"))
    assert(lax.length === 5)
  }

  test("contamination counts eval-set n-gram overlap per corpus doc") {
    import graft.llm.CorpusHygiene
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta zeta"),  // shares 1 distinct 4-gram
      (2L, "alpha beta gamma delta epsilon"), // shares both 4-grams
      (3L, "nothing in common here at all")
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.contamination(corpus, evalSet, "doc_id", "text",
        n = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Seq((1L, 1L), (2L, 2L)))
  }

  test("domainStats extracts, lowercases, rolls up per domain, and " +
      "broadcast-anti-joins the blocklist") {
    import graft.llm.CorpusHygiene
    val corpus = Seq(
      (1L, "see https://News.Example.COM/a and http://ads.example.com/x"),
      (2L, "again https://news.example.com/b https://news.example.com/c"),
      (3L, "no urls in this one at all"),
      (4L, "ftp://not-http.example.com and https://ok.example.org/")
    ).toDF("doc_id", "text")
    val out = CorpusHygiene.domainStats(corpus, "doc_id", "text",
        blocklist = Seq("ADS.example.com")) // blocklist matching is
      .collect()                            // case-insensitive too
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      // case-folded; doc 2's two mentions count once in n_docs
      ("news.example.com", 2L, 3L),
      ("ok.example.org", 1L, 1L)))
    // the blocklist side must plan as a BROADCAST anti join — the corpus
    // side is never re-shuffled for a list-sized filter
    val plan = CorpusHygiene.domainStats(corpus, "doc_id", "text",
      blocklist = Seq("x.example.com")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist filter must broadcast:\n$plan")
  }

  test("library persists are scoped: only result blocks outlive the call") {
    // drain anything earlier suites left behind so the count below is ours
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before === 0)
    val out = Dedup.jaccardPairsWithinGroupPrefix(
      docs.limit(50), "doc_id", "text", "source", 0.8)
    out.count()
    // the eagerly-materialized result is ONE localCheckpoint RDD (owned by
    // the returned DataFrame, reclaimed by the ContextCleaner on GC); the
    // internal prefix-docs cache must already be gone
    val after = spark.sparkContext.getPersistentRDDs
    assert(after.size <= 1, s"internal cache leaked: ${after.keys}")
    val out2 = Dedup.minhashLshPairs(docs.limit(50), "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.5)
    out2.count()
    assert(spark.sparkContext.getPersistentRDDs.size <= 2,
      "minhash shingle cache leaked")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  test("incremental minhash dedup finds a new doc's duplicate in the corpus") {
    val corpus = docs.filter(col("doc_id") < 40)
    // "new batch": one exact copy of a corpus doc + genuinely new docs
    val copied = corpus.filter(col("doc_id") === 7)
      .withColumn("doc_id", lit(1007L))
    val newBatch = docs.filter(col("doc_id") >= 40 && col("doc_id") < 50)
      .unionByName(copied)
    val dups = Dedup.minhashLshNewVsCorpus(newBatch, corpus,
        "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dups.exists { case (n, c, j) => n == 1007L && c == 7L && j == 1.0 },
      s"exact copy not detected: ${dups.mkString(",")}")
  }

  test("stored MinHash index gives the same incremental dedup as recompute") {
    val docs = Util.table(spark, "/root/testdata/sf0.001", "documents")
    val newBatch = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_idx").toString
    Dedup.writeCorpusIndex(corpus, "doc_id", "text", idx)
    val viaIndex = Dedup.minhashLshNewVsIndex(newBatch, idx,
        "doc_id", "text")
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = Dedup.minhashLshNewVsCorpus(newBatch, corpus,
        "doc_id", "text")
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === recomputed)
    assert(viaIndex.nonEmpty, "fixture must contain cross-split duplicates")
  }

  test("dedupedCorpus keeps one representative per cluster") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (20L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupedCorpus(df, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 10L, 20L)) // cluster {1,2,3} -> keep min id 1
  }

  test("connected components converge on hash-scale ids (no sum overflow)") {
    import spark.implicits._
    val big = Long.MaxValue / 2
    val pairs = Seq((big, big + 1), (big + 1, big + 2), (5L, big))
      .toDF("id_a", "id_b")
    // localEdgeThreshold = 0 forces the distributed label-propagation loop
    // (whose decimal convergence sum is what this test pins)
    val comps = Dedup.connectedComponents(pairs, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(5L), "one component labeled by min id")
    assert(comps.keySet === Set(5L, big, big + 1, big + 2))
  }

  test("lsh similarity handles an empty embeddings batch") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.llm.Similarity
      .lshPairsAbove(empty, "vec_id", "embedding", 0.5).count() === 0)
  }

  test("multimodal resize survives empty payloads") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "some text")).toDF("doc_id", "text")
    val out = Multimodal.resize(
        Multimodal.withFakeMedia(docs, "text"), "doc_id")
      .collect().map(r => r.id -> r.data.length).toMap
    assert(out(1L) === 0 && out(2L) > 0)
  }

  test("multimodal resize decodes a REAL image payload via javax.imageio, " +
      "stub rows coexisting in the same partition") {
    import spark.implicits._
    // deterministic 8x6 RGB gradient, PNG-encoded in-memory (no external
    // fixture file, no codec library beyond the JRE)
    val (w0, h0) = (8, 6)
    val src = new java.awt.image.BufferedImage(w0, h0,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h0; x <- 0 until w0)
      src.setRGB(x, y, (x * 31 << 16) | (y * 42 << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.looksLikeImage(png))
    assert(!Multimodal.looksLikeImage("just text".getBytes("UTF-8")))
    // one real PNG + one fake payload through the SAME Spark path: the
    // magic-byte router must send each row down its own arm
    val df = Seq((1L, png), (2L, "just text!".getBytes("UTF-8")))
      .toDF("doc_id", "data")
      .select(col("doc_id"), struct(col("data"), struct(
        lit("mixed").as("format"), lit(99).as("width"),
        lit(99).as("height")).as("meta")).as("media"))
    val out = Multimodal.resize(df, "doc_id", factor = 2)
      .collect().map(r => r.id -> r).toMap
    // REAL arm: dims from the DECODED image (not the lying metadata);
    // pixels are exact nearest-neighbor decimation of the source
    val r1 = out(1L)
    assert(r1.width === 4 && r1.height === 3)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r1.data))
    assert(dec != null && dec.getWidth === 4 && dec.getHeight === 3,
      "resized payload must itself be a decodable PNG")
    for (y <- 0 until 3; x <- 0 until 4)
      assert((dec.getRGB(x, y) & 0xffffff) ===
        (src.getRGB(x * 2, y * 2) & 0xffffff),
        s"pixel ($x,$y) must be the source pixel at (${x * 2},${y * 2})")
    // STUB arm for the non-image row: stride decimation + metadata scale
    val r2 = out(2L)
    assert(r2.width === 49 && r2.data.length === "just text!".length / 2)
    // OVERSIZED header: a structurally-valid PNG whose IHDR claims
    // 100000x100000 (10 Gpx). The header-only dimension probe must stop
    // BEFORE any raster allocation — an ImageIO.read here would attempt
    // a multi-GB buffer and throw OutOfMemoryError past the NonFatal
    // catch, killing the task — and the row must PASS THROUGH unchanged
    // with its true header dims (not stub-decimate compressed bytes
    // into garbage: a real 100+ Mpx photo hits this same path).
    val huge = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      huge(off) = (v >>> 24).toByte; huge(off + 1) = (v >>> 16).toByte
      huge(off + 2) = (v >>> 8).toByte; huge(off + 3) = v.toByte
    }
    putInt(16, 100000) // IHDR width  (8 sig + 4 len + 4 "IHDR")
    putInt(20, 100000) // IHDR height
    val crc = new java.util.zip.CRC32
    crc.update(huge, 12, 17) // chunk type + 13 IHDR data bytes
    putInt(29, crc.getValue.toInt)
    assert(Multimodal.looksLikeImage(huge))
    val passed = Multimodal.realResize(huge, 2)
    assert(passed.isDefined &&
      passed.get._1 === 100000 && passed.get._2 === 100000 &&
      (passed.get._3 eq huge),
      "over-cap dims must pass the payload through unchanged, not decode")
    // sanity: the unpatched PNG still takes the real decode arm
    assert(Multimodal.realResize(png, 2).isDefined)
    // NULL payload: a routed row (stub arm on empty bytes), never an NPE
    val withNull = Seq((7L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "data")
      .select(col("doc_id"), struct(col("data"), struct(
        lit("missing").as("format"), lit(5).as("width"),
        lit(5).as("height")).as("meta")).as("media"))
    val nr = Multimodal.resize(withNull, "doc_id", factor = 2).collect()
    assert(nr.length === 1 && nr(0).data.length === 0)
    assert(Multimodal.audioWindows(withNull, "doc_id").collect().isEmpty)
    assert(Multimodal.extractFeatures(withNull, "doc_id")
      .collect().head.n_bytes === 0)
    assert(Multimodal.sampleFrames(withNull, "doc_id").collect()
      .length === 4)
  }

  test("audioWindows decodes a REAL WAV payload via javax.sound, stub " +
      "rows coexisting, window sums exact") {
    import spark.implicits._
    // deterministic 400-sample PCM16 mono ramp, WAV-encoded in-memory
    // (javax.sound.sampled — no external fixture, no codec library)
    val nSamples = 400
    val srcSamples = Array.tabulate(nSamples)(i => (i * 163 - 32000).toShort)
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) { // little-endian, as WAVE writes PCM16
      pcm(2 * i) = (srcSamples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((srcSamples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.looksLikeWav(wav))
    assert(!Multimodal.looksLikeWav("not audio".getBytes("UTF-8")))
    // one real WAV + one text payload through the SAME Spark path
    val df = Seq((1L, wav), (2L, "abcdefgh".getBytes("UTF-8")))
      .toDF("doc_id", "data")
      .select(col("doc_id"), struct(col("data"), struct(
        lit("mixed").as("format"), lit(0).as("width"),
        lit(0).as("height")).as("meta")).as("media"))
    val out = Multimodal.audioWindows(df, "doc_id", windows = 4)
      .collect().groupBy(_.id)
    // REAL arm: the WAV container header must NOT leak into the samples —
    // sums must equal the SOURCE samples' windowed |amplitude| exactly
    val real = out(1L).sortBy(_.win)
    assert(real.map(_.win).toSeq === Seq(0, 1, 2, 3))
    assert(real.map(_.n_samples).sum === nSamples.toLong)
    val wantSums = new Array[Long](4)
    for (j <- 0 until nSamples)
      wantSums((j * 4) / nSamples) += math.abs(srcSamples(j).toLong)
    assert(real.map(_.sum_abs).toSeq === wantSums.toSeq,
      "real WAV arm must reproduce the source samples bit-exactly")
    // STUB arm: "abcdefgh" = 4 LE samples (b<<8|a, d<<8|c, f<<8|e, h<<8|g)
    val stub = out(2L).sortBy(_.win)
    val expStub = Array("ab", "cd", "ef", "gh")
      .map(p => ((p(1).toInt << 8) | p(0).toInt).toLong)
    assert(stub.map(_.sum_abs).toSeq === expStub.toSeq)
    assert(stub.map(_.n_samples).toSeq === Seq(1L, 1L, 1L, 1L))
  }

  test("synthetic registry payloads route the REAL decoder arms " +
      "(q_multimodal_resize_real / q_audio_windows_real routing proof)") {
    // the exact payload builders the r12 registry queries use — pinned
    // here so the hash-checked rows provably exercise the real branches,
    // not the stubs
    val d = 123L
    val (w, h) = ((d % 13 + 4).toInt, (d % 9 + 3).toInt) // 7 x 6
    val png = Multimodal.syntheticPng(d, w, h)
    assert(Multimodal.looksLikeImage(png), "PNG magic must route realResize")
    // PNG round-trip is the identity on the synthetic raster
    val back = Multimodal.decodedChecksum(png)
    assert(back.isDefined && back.get._1 === w && back.get._2 === h)
    var want = 0L
    for (y <- 0 until h; x <- 0 until w)
      want += (Multimodal.syntheticRgb(d, x, y) & 0xffffff).toLong *
        (1L + x + 1000L * y)
    assert(back.get._3 === want, "decode∘encode must be identity")
    // realResize (not the stub) handles it, and its output pixels are the
    // decimated synthetic function — the exact claim the oracle replays
    val rr = Multimodal.realResize(png, 2)
    assert(rr.isDefined, "synthetic PNG must take the real decode arm")
    val (rw, rh, outPng) = rr.get
    assert(rw === w / 2 && rh === h / 2)
    var wantR = 0L
    for (y <- 0 until rh; x <- 0 until rw)
      wantR += (Multimodal.syntheticRgb(d, 2 * x, 2 * y) & 0xffffff).toLong *
        (1L + x + 1000L * y)
    assert(Multimodal.decodedChecksum(outPng) === Some((rw, rh, wantR)))
    // WAV: magic routes the real javax.sound branch and the decoded
    // samples are exactly the recurrence — header bytes NOT counted
    // (the stub would read 22 extra header byte-pairs as samples)
    val nS = (d % 37 + 20).toInt
    val wav = Multimodal.syntheticWav(d, nS)
    assert(Multimodal.looksLikeWav(wav))
    val samples = Multimodal.realWavSamples(wav)
    assert(samples.isDefined, "synthetic WAV must take the javax.sound arm")
    val wantS = Array.tabulate(nS)(j =>
      ((d * 48271L + j * 69621L) % 65536L).toInt - 32768)
    assert(samples.get.toSeq === wantS.toSeq)
    assert(Multimodal.pcm16Le(wav).length === samples.get.length + 22,
      "stub arm on the same payload would count the header pairs — the " +
        "hash distinguishes the arms by construction")
  }

  test("connected components on an empty pair set returns empty, no crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
    // downstream: a clean corpus passes through dedupedCorpus untouched
    val docs = Seq((1L, "unique one"), (2L, "unique two")).toDF("doc_id", "t")
    assert(Dedup.dedupedCorpus(docs, "doc_id", empty).count() === 2)
  }

  test("connected components refuse to return non-converged labels") {
    import spark.implicits._
    // a 6-node chain needs >1 distributed round; maxIter=1 must FAIL
    // LOUDLY (r12) — the pre-fix behavior returned partially-propagated
    // labels, and dedupedCorpus over them keeps duplicates silently
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 1,
        localEdgeThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("converge"))
    // the default budget converges the same graph fine
    val comps = Dedup.connectedComponents(chain, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(1L), "one chain, one component")
  }

  test("connected components equal local union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L), (3L, 1L))
      .toDF("id_a", "id_b")
    // BOTH regimes must agree: the driver union-find fast path (default
    // threshold) and the distributed loop (threshold 0)
    for (thr <- Seq(1000000L, 0L)) {
      val comps = Dedup.connectedComponents(pairs, localEdgeThreshold = thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L, 7L -> 7L), s"threshold=$thr")
    }
    // against union-find on real near-dup pairs
    val real = Dedup.jaccardPairsWithinGroup(docs, "doc_id", "text",
      "source", 0.8).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (real.nonEmpty) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      real.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      for (thr <- Seq(1000000L, 0L)) {
        val got = Dedup.connectedComponents(real.toSeq.toDF("id_a", "id_b"),
            localEdgeThreshold = thr)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === expected, s"threshold=$thr")
      }
    }
    // string ids go through the fast path with string ordering
    val s = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val sc = Dedup.connectedComponents(s)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(sc === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
    // WIDE string ids trip the routing probe's BYTE cap before the row
    // threshold (r15, ADVICE: rows alone let a partition transiently
    // hold hundreds of MB of boxed Rows); the dropped buffer must route
    // to the distributed loop — same labels, no error — not fail the
    // union-find's buffer expectation
    val savedCap = Dedup.LocalEdgeBufferBytes
    Dedup.LocalEdgeBufferBytes = 4096L
    try {
      val pad = "p" * 512
      val wide = Seq((s"a$pad", s"b$pad"), (s"b$pad", s"c$pad"),
        (s"x$pad", s"y$pad")).toDF("id_a", "id_b")
      val wc = Dedup.connectedComponents(wide)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(wc === Map(s"a$pad" -> s"a$pad", s"b$pad" -> s"a$pad",
        s"c$pad" -> s"a$pad", s"x$pad" -> s"x$pad", s"y$pad" -> s"x$pad"),
        "byte-capped buffer must fall back to the distributed loop")
    } finally Dedup.LocalEdgeBufferBytes = savedCap
  }

  test("text quality and fingerprint functions are deterministic and bounded") {
    val out = docs.select(
        TextFunctions.qualityScore(col("text")).as("q"),
        TextFunctions.rollingFingerprint(col("text")).as("fp"),
        TextFunctions.langId(col("text"), Seq(
          "x" -> Seq("table", "row"), "y" -> Seq("stream", "batch")))
          .as("lang"))
      .collect()
    assert(out.forall { r =>
      val q = r.getDouble(0); q >= 0.0 && q <= 1.0
    })
    assert(out.forall(r => Set("x", "y", "und").contains(r.getString(2))))
  }

  test("multimodal plumbing: payload bytes, stub features, frame samples") {
    val media = Multimodal.withFakeMedia(docs.limit(50), "text")
    assert(media.schema("media").dataType.typeName === "struct")
    val feats = Multimodal.extractFeatures(media, "doc_id").collect()
    assert(feats.length === 50)
    assert(feats.forall(_.feature.length === 16))
    // histogram is L1-normalized
    assert(feats.forall(f => math.abs(f.feature.sum - 1.0f) < 1e-3))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media, "doc_id").collect()
    assert(feats.sortBy(_.id).zip(again.sortBy(_.id))
      .forall { case (x, y) => x.feature.sameElements(y.feature) })
    val frames = Multimodal.sampleFrames(media, "doc_id", frames = 4).collect()
    assert(frames.length === 200)
    assert(frames.groupBy(_.id).forall(_._2.map(_.frame).sorted.sameElements(
      Array(0, 1, 2, 3))))
    // resize: payload decimated, metadata scaled consistently
    val resized = Multimodal.resize(media, "doc_id", factor = 2).collect()
    assert(resized.length === 50)
    val orig = media.select(col("doc_id").cast("long"),
        length(col("media.data")), col("media.meta.width"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(resized.forall { r =>
      val (n, w) = orig(r.id)
      r.data.length == math.max(n / 2, 1) && r.width == math.max(w / 2, 1)
    })
  }

  test("scalar quantization: codes in range, reconstruction within a cell, packed order") {
    import graft.llm.Quantize
    val q = Quantize.quantize8(embs, "vec_id", "embedding")
    val stats = Quantize.dimStats(embs, "embedding")
      .collect().map(r => r.getInt(0) -> (r.getFloat(1), r.getFloat(2))).toMap
    val rows = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall { case (_, _, c) => c >= 0 && c <= 255 })
    // reconstruction error bounded by half a quantization cell
    val orig = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { case (id, dim, c) =>
      val (mn, mx) = stats(dim)
      val recon = mn + (c + 0.5) / 256.0 * (mx - mn)
      val err = math.abs(recon - orig(id)(dim))
      assert(err <= (mx - mn) / 512.0 + 1e-6,
        s"id=$id dim=$dim code=$c err=$err")
    }
    // packed arrays follow dimension order
    val packed = Quantize.packed(q, "vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val byId = rows.groupBy(_._1)
    packed.foreach { case (id, codes) =>
      val expect = byId(id).sortBy(_._2).map(_._3).toSeq
      assert(codes === expect)
    }
  }

  test("exact incremental dedup == naive new-x-corpus threshold pairs") {
    val newBatch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val kernel = Dedup.jaccardNewVsCorpusPrefix(
        newBatch, corpus, "doc_id", "text", 0.8)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def sets(df: org.apache.spark.sql.DataFrame, idAs: String, wsAs: String) =
      df.select(col("doc_id").as(idAs),
        array_distinct(split(col("text"), " ")).as(wsAs))
    val naive = sets(newBatch, "new_id", "ws_a")
      .join(sets(corpus, "corpus_id", "ws_b"),
        Dedup.jaccard(col("ws_a"), col("ws_b")) >= 0.8)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel === naive)
    assert(naive.nonEmpty, "fixture should contain at least one true pair")
    // r12: the STORED-index probe (the registry/production shape — corpus
    // prepped once, batch side broadcast) must agree pair-for-pair, with
    // jac values identical, against the symmetric in-memory form
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_exactidx").toString
    Dedup.writeExactPrefixIndex(corpus, "doc_id", "text", 0.8, idxPath)
    val stored = Dedup.jaccardNewVsCorpusPrefixStored(spark, idxPath,
        newBatch, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mem = Dedup.jaccardNewVsCorpusPrefix(
        newBatch, corpus, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored === mem)
    // threshold is part of the index identity: a cross-threshold probe
    // must FAIL LOUDLY (the prefix lemma would silently miss pairs)
    val ex = intercept[IllegalArgumentException] {
      Dedup.jaccardNewVsCorpusPrefixStored(spark, idxPath,
        newBatch, "doc_id", "text", 0.9).collect()
    }
    assert(ex.getMessage.contains("threshold"))
  }

  test("positional filter: dense near-dup batch probes exactly, with a " +
      "strictly smaller candidate stage") {
    // r13 (VERDICT #2): the probe's candidate `distinct` used to see
    // every raw prefix match, and that row count grows with NEAR-DUP
    // DENSITY, not batch size — a pathological dense batch inflates the
    // one shuffle the stored-index shape still pays. The PPJoin
    // positional filter cuts matched rows whose in-prefix positions
    // bound the overlap below threshold, provably keeping at least one
    // row per TRUE pair. Plant a dense batch: every batch doc is a
    // light edit of a corpus doc, so true-pair multiplicity dominates.
    val corpus = (0L until 60L).map { i =>
      (i, (0 until 30).map(w => s"w${i}_$w").mkString(" "))
    }.toDF("doc_id", "text")
    val dense = (0L until 60L).map { i =>
      // drop one word, append one: jac = 29/31 ≈ 0.935 >= 0.9
      (1000L + i, ((1 until 30).map(w => s"w${i}_$w") :+ "zz").mkString(" "))
    }.toDF("doc_id", "text")
    val t = 0.9
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_denseidx").toString
    Dedup.writeExactPrefixIndex(corpus, "doc_id", "text", t, idxPath)
    val got = Dedup.jaccardNewVsCorpusPrefixStored(spark, idxPath,
        dense, "doc_id", "text", t)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def sets(df: org.apache.spark.sql.DataFrame, idAs: String, wsAs: String) =
      df.select(col("doc_id").as(idAs),
        array_distinct(split(col("text"), " ")).as(wsAs))
    val naive = sets(dense, "new_id", "ws_a")
      .join(sets(corpus, "corpus_id", "ws_b"),
        Dedup.jaccard(col("ws_a"), col("ws_b")) >= t)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.size === 60, "every planted edit must be a true pair")
    assert(got === naive, "the positional cut must not lose a true pair")
    // the shrink itself, on the same prep the kernel uses (sorted
    // distinct hashed token sets, prefix length n - ceil(t*n) + 1):
    // matched prefix rows under sizeBand alone vs sizeBand + positional
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"),
        array_sort(array_distinct(
          transform(split(col("text"), " "), w => xxhash64(w)))).as("ws"))
        .withColumn("n", size(col("ws")))
        .withColumn("p",
          (col("n") - ceil(col("n") * t - lit(1e-9)) + 1).cast("int"))
        .select(col("id"), col("n"),
          posexplode(slice(col("ws"), lit(1), col("p")))
            .as(Seq("pos", "h")))
    val a = prep(dense).alias("a")
    val b = prep(corpus).alias("b")
    val sizeBand = col("a.n") >= col("b.n") * t &&
      col("b.n") >= col("a.n") * t
    val positional =
      least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
        ceil((col("a.n") + col("b.n")) * lit(t / (1 + t)) - lit(1e-9))
    val rawRows = a.join(b, col("a.h") === col("b.h") && sizeBand).count()
    val cutRows = a.join(b,
      col("a.h") === col("b.h") && sizeBand && positional).count()
    info(s"candidate rows: $rawRows raw -> $cutRows after positional")
    assert(cutRows < rawRows,
      "positional filter must shrink the dense batch's candidate stage")
    assert(cutRows >= naive.size.toLong,
      "at least one surviving row per true pair")
  }

  test("index commit records: a stamp-less stored index is refused " +
      "(torn-rebuild protection)") {
    // r12: every monolithic index writer (exact-prefix, MinHash corpus,
    // IVF) treats its _params stamp as the COMMIT RECORD — deleted
    // before the first data overwrite, recreated after the last. A
    // rebuild that crashes between its two table overwrites therefore
    // leaves a stamp-less layout, which probes must refuse LOUDLY: a
    // torn index (one table new, the other stale) produces silently
    // missing pairs / wrong neighbors, not errors. The crashed state is
    // simulated by deleting the stamp, which is byte-identical to what
    // the crash window leaves behind.
    import org.apache.hadoop.fs.Path
    def delStamp(dir: String): Unit = {
      val p = new Path(s"$dir/_params")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p), s"writer must have stamped $dir")
      fs.delete(p, false)
    }
    val newBatch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)

    // exact prefix-filter index
    val exDir = java.nio.file.Files
      .createTempDirectory("graft_tornex").toString
    Dedup.writeExactPrefixIndex(corpus, "doc_id", "text", 0.8, exDir)
    delStamp(exDir)
    val exEx = intercept[IllegalArgumentException] {
      Dedup.jaccardNewVsCorpusPrefixStored(spark, exDir,
        newBatch, "doc_id", "text", 0.8).collect()
    }
    assert(exEx.getMessage.contains("_params"))
    // a completed rebuild over the torn layout re-stamps and probes fine
    Dedup.writeExactPrefixIndex(corpus, "doc_id", "text", 0.8, exDir)
    assert(Dedup.jaccardNewVsCorpusPrefixStored(spark, exDir,
      newBatch, "doc_id", "text", 0.8).collect().nonEmpty)

    // MinHash corpus index (was a stderr WARNING pre-r12 — too quiet for
    // a state that silently drops candidates)
    val mhDir = java.nio.file.Files
      .createTempDirectory("graft_tornmh").toString
    Dedup.writeCorpusIndex(corpus, "doc_id", "text", mhDir)
    delStamp(mhDir)
    val mhEx = intercept[IllegalArgumentException] {
      Dedup.minhashLshNewVsIndex(newBatch, mhDir, "doc_id", "text")
        .collect()
    }
    assert(mhEx.getMessage.contains("_params"))
    Dedup.writeCorpusIndex(corpus, "doc_id", "text", mhDir)
    Dedup.minhashLshNewVsIndex(newBatch, mhDir, "doc_id", "text").collect()

    // IVF index (had NO stamp pre-r12: a torn rebuild probed cells
    // assigned under different centroids — silently wrong neighbors)
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft_tornivf").toString
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", ivfDir,
      nlist = 8, seed = 42L)
    delStamp(ivfDir)
    val ivfEx = intercept[IllegalArgumentException] {
      Similarity.ivfTopKVsIndex(embs.filter(col("vec_id") < 5), ivfDir,
        "vec_id", "embedding", k = 3, nprobe = 2).collect()
    }
    assert(ivfEx.getMessage.contains("_params"))
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", ivfDir,
      nlist = 8, seed = 42L)
    assert(Similarity.ivfTopKVsIndex(embs.filter(col("vec_id") < 5),
      ivfDir, "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().nonEmpty)

    // semantic sign-cell index (its stamp is _semparams)
    val semDir = java.nio.file.Files
      .createTempDirectory("graft_tornsem").toString
    Dedup.writeSemanticIndex(embs, "vec_id", "embedding", semDir)
    val semStamp = new Path(s"$semDir/_semparams")
    val semFs =
      semStamp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(semFs.exists(semStamp)); semFs.delete(semStamp, false)
    val semEx = intercept[IllegalArgumentException] {
      Dedup.semanticNewVsIndex(embs.filter(col("vec_id") < 5), semDir,
        "vec_id", "embedding", 0.3).collect()
    }
    assert(semEx.getMessage.contains("_semparams"))
    Dedup.writeSemanticIndex(embs, "vec_id", "embedding", semDir)
    Dedup.semanticNewVsIndex(embs.filter(col("vec_id") < 5), semDir,
      "vec_id", "embedding", 0.3).collect()

    // substring window index (stamp cleared WITH the data by the
    // overwrite; data-without-stamp must still refuse)
    import graft.llm.SubstringDedup
    val winDir = java.nio.file.Files
      .createTempDirectory("graft_tornwin").toString + "/idx"
    SubstringDedup.writeWindowIndex(docs, "doc_id", "text", 8, winDir)
    delStamp(winDir)
    val winEx = intercept[IllegalArgumentException] {
      SubstringDedup.appendWindowIndex(
        docs.limit(3), "doc_id", "text", 8, winDir)
    }
    assert(winEx.getMessage.contains("_params"))
    SubstringDedup.writeWindowIndex(docs, "doc_id", "text", 8, winDir)
    SubstringDedup.appendWindowIndex(
      docs.limit(3), "doc_id", "text", 8, winDir)
  }

  test("chunking: coverage, overlap, and reassembly invariants") {
    val fixture = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "a b c"),                                   // short: one chunk
      (3L, (1 to 48).map(i => s"x$i").mkString(" "))   // exactly one stride
    ).toDF("id", "text")
    val out = TextFunctions.chunkDocuments(fixture, "id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    val byId = out.groupBy(_._1)
    // doc 1: stride 12, n=100 -> ceil(96/12) = 8 chunks
    assert(byId(1L).length === 8)
    // every chunk <= 16 tokens; consecutive chunks overlap by exactly 4
    // (except a shorter tail); reassembling first 12 tokens of each chunk
    // plus the last chunk's tail reproduces the document
    val toks1 = (1 to 100).map(i => s"w$i")
    byId(1L).foreach { case (_, ci, text, n) =>
      val words = text.split(" ")
      assert(words.length <= 16 && words.length == n)
      assert(words.toSeq === toks1.slice(ci * 12, ci * 12 + words.length))
    }
    val rebuilt = byId(1L).init.flatMap(_._3.split(" ").take(12)) ++
      byId(1L).last._3.split(" ")
    assert(rebuilt.toSeq === toks1)
    assert(byId(2L).map(t => (t._2, t._3)).toSeq === Seq((0, "a b c")))
    // n=48: ceil(44/12) = 4 chunks, last starts at 36, 12 tokens
    assert(byId(3L).length === 4 && byId(3L).last._4 === 12L)
  }

  test("interleave: any virtual-time prefix holds stratum counts in weight proportion") {
    val df = spark.range(6000).select(col("id"),
      concat(lit("src"), (col("id") % 3).cast("string")).as("source"))
    val keyed = graft.ops.Sampling.interleaveKey(df, "id", "source",
      Map("src0" -> 3.0, "src1" -> 1.0), default = 1.0)
    val stream = keyed.orderBy(col("__vt"), col("source"), col("k"))
      .select("source").collect().map(_.getString(0))
    // prefix of stratum s with vt <= T is exactly min(n_s, floor(w_s * T)):
    // check a few prefixes for 3:1:1 proportions (src0 has weight 3)
    for (m <- Seq(500, 1000, 2500)) {
      val counts = stream.take(m).groupBy(identity).view.mapValues(_.length)
      val c0 = counts.getOrElse("src0", 0).toDouble
      val c1 = counts.getOrElse("src1", 0).toDouble
      val c2 = counts.getOrElse("src2", 0).toDouble
      assert(math.abs(c0 / math.max(c1, 1) - 3.0) < 0.1, s"prefix $m: $counts")
      assert(math.abs(c1 - c2) <= 2, s"prefix $m: $counts")
    }
    // deterministic: same input -> same order
    val again = graft.ops.Sampling.interleaveKey(df, "id", "source",
        Map("src0" -> 3.0, "src1" -> 1.0), default = 1.0)
      .orderBy(col("__vt"), col("source"), col("k"))
      .select("source").collect().map(_.getString(0))
    assert(stream.sameElements(again))
  }

  test("ngram repetition counts match a naive per-doc recount") {
    val fixture = Seq(
      (1L, "a b a b a b"),       // bigrams: [a b, b a, a b, b a, a b]
      (2L, "x y z"),             // all distinct
      (3L, "w"),                 // no bigrams
      (4L, "")                   // empty
    ).toDF("id", "text")
    val rep = TextFunctions.ngramRepetition(col("text"), 2)
    val got = fixture.select(col("id"), rep.getField("total"),
        rep.getField("n_distinct"), rep.getField("top_count"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((5L, 2L, 3L)))
    assert(got(2L) === ((2L, 2L, 1L)))
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(4L) === ((0L, 0L, 0L)))
    // naive recount on real data
    val real = docs.limit(100)
    val naive = real.select(col("doc_id"), col("text")).collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val grams = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity)
      r.getLong(0) -> (grams.size.toLong,
        byGram.size.toLong,
        if (grams.isEmpty) 0L else byGram.values.map(_.size).max.toLong)
    }.toMap
    val engine = real.select(col("doc_id"),
        TextFunctions.ngramRepetition(col("text"), 2).as("r"))
      .select(col("doc_id"), col("r.total"), col("r.n_distinct"),
        col("r.top_count"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(engine === naive)
  }

  test("stratified hash sample: per-stratum fractions land near target and are deterministic") {
    val df = spark.range(20000).select(col("id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
    val out = graft.ops.Sampling.stratifiedHashSample(df, "id", "source",
      Map("src0" -> 0.5, "src1" -> 0.25), default = 0.1)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 5000.0 // rows per stratum
    assert(math.abs(counts("src0") / n - 0.5) < 0.05)
    assert(math.abs(counts("src1") / n - 0.25) < 0.05)
    assert(math.abs(counts.getOrElse("src2", 0L) / n - 0.1) < 0.03)
    assert(math.abs(counts.getOrElse("src3", 0L) / n - 0.1) < 0.03)
    // deterministic: re-run yields the identical id set
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.ops.Sampling.stratifiedHashSample(df, "id", "source",
        Map("src0" -> 0.5, "src1" -> 0.25), default = 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // sample is a filter: every kept row existed upstream
    assert(ids1.forall(_ < 20000))
  }

  test("PQ ANN: a planted duplicate attains the minimum ADC distance") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat).toSeq
    val base = (0 until 200).map(i => (i.toLong, vec()))
    // ids 1000+q duplicate vectors 0..4 exactly: same codes as the
    // original, so ADC(query, original) is the global minimum
    val dups = (0 until 5).map(q => (1000L + q, base(q)._2))
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") >= 1000L)
    val top = graft.llm.Similarity.pqTopK(queries, corpus,
        "vec_id", "vec_id", "embedding", k = 3, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    (0 until 5).foreach { q =>
      val first = top.filter(t => t._1 == 1000L + q && t._2 == 1).head
      assert(first._3 === q.toLong,
        s"query ${1000 + q}: rank-1 neighbor ${first._3}, expected $q")
    }
    // deterministic under the fixed seed
    val again = graft.llm.Similarity.pqTopK(queries, corpus,
        "vec_id", "vec_id", "embedding", k = 3, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(top.sorted.toSeq === again.sorted.toSeq)
  }

  test("PQ and LSH ignore null/ragged vectors instead of ranking them") {
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat).toSeq
    val good = (0 until 60).map(i => (i.toLong, Some(vec())))
    // a failed-encoder shard: null embeddings, plus one ragged vector.
    // Their ADC is null, and ascending rank (NULLS FIRST default) would
    // otherwise fill the ENTIRE top-k with them for every query
    val bad = (1000 until 1010).map(i => (i.toLong, None)) :+
      (1100L, Some(vec().take(7)))
    val corpus = (good ++ bad).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val top = graft.llm.Similarity.pqTopK(queries, corpus,
        "vec_id", "vec_id", "embedding", k = 5, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(top.nonEmpty)
    assert(top.forall(_._1 < 1000L), "no null/ragged neighbor may rank")
    assert(top.forall(t => !t._2.isNaN), "adc must be real for every rank")
    // LSH pair generation: nulls must not form a quadratic bucket-0 blob
    val pairs = graft.llm.Similarity.lshPairsAbove(corpus, "vec_id",
        "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall(p => p._1 < 1000L && p._2 < 1000L))
  }

  test("PQ/IVF compact literal regime equals inline bit-for-bit, bounds the plan") {
    val queries = embs.filter(col("vec_id") < 5)
    def pqRows(maxInline: Int) = {
      val df = graft.llm.Similarity.pqTopK(queries, embs, "vec_id",
        "vec_id", "embedding", k = 5, ksub = 256,
        maxInlineLiterals = maxInline)
      (df, df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet)
    }
    // ksub=256 × dim crosses the default budget -> compact typedLit
    // regime; forcing the budget to MaxValue replays the inline regime
    val (compactDf, compact) = pqRows(graft.llm.Similarity.MaxInlineLiterals)
    val (inlineDf, inline) = pqRows(Int.MaxValue)
    assert(compact === inline,
      "compact and inline regimes must agree bit-for-bit (adc included)")
    // the point of the threshold: the inline plan at ksub=256 carries a
    // literal expression NODE per centroid element (analysis, codegen,
    // and serialization all walk them); the compact plan folds each
    // codebook as ONE typedLit node whose payload is data, not tree
    def nodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case p =>
        p.expressions.map(e => e.collect { case _ => 1 }.sum).sum
      }.sum
    val (compactN, inlineN) = (nodes(compactDf), nodes(inlineDf))
    assert(compactN * 10 < inlineN,
      s"compact plan $compactN expr nodes, inline $inlineN")
    // IVF: same parity pin (cell scores + assignment), compact forced
    def ivfRows(maxInline: Int) = graft.llm.Similarity.ivfTopK(queries,
        embs, "vec_id", "vec_id", "embedding", k = 5,
        maxInlineLiterals = maxInline)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(ivfRows(1) === ivfRows(Int.MaxValue))
  }

  test("PQ rerank with a full-corpus shortlist equals brute force exactly") {
    val rnd = new scala.util.Random(13)
    val corpus = (0 until 120)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = graft.llm.Similarity.bruteForceTopK(queries, corpus,
      "vec_id", "vec_id", "embedding", 5)
    val reranked = graft.llm.Similarity.pqTopKReranked(queries, corpus,
      "vec_id", "vec_id", "embedding", k = 5, shortlist = 120, m = 4,
      ksub = 8)
    assert(rows(reranked) === rows(exact))
  }

  test("importance sample: extremes, target fraction, and rate monotonicity") {
    val df = spark.range(20000).toDF("id")
    import graft.ops.Sampling.importanceSample
    assert(importanceSample(df, "id", lit(1.0)).count() === 20000L)
    assert(importanceSample(df, "id", lit(0.0)).count() === 0L)
    val at30 = importanceSample(df, "id", lit(0.3))
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(at30.size / 20000.0 - 0.3) < 0.02)
    // monotone: everything kept at 0.3 is kept at 0.6
    val at60 = importanceSample(df, "id", lit(0.6))
      .collect().map(_.getLong(0)).toSet
    assert(at30.subsetOf(at60))
  }

  test("mixture weights: alpha=1 is natural share, alpha<1 boosts small strata") {
    val df = Seq(("big", "a b c d e f g h"), ("big", "a b c d e f g h"),
      ("small", "a b")).toDF("source", "text")
    val nat = graft.llm.Mixture.mixtureWeights(df, "source",
        graft.llm.Mixture.tokenCount(col("text")), alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // alpha=1: weight == p, boost == 1
    assert(nat("big")._1 === 16L && nat("small")._1 === 2L)
    assert(math.abs(nat("big")._3 - nat("big")._2) < 1e-9)
    assert(math.abs(nat("small")._4 - 1.0) < 1e-9)
    val cool = graft.llm.Mixture.mixtureWeights(df, "source",
        graft.llm.Mixture.tokenCount(col("text")), alpha = 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    // temperature < 1 shifts mass to the small stratum
    assert(cool("small")._1 > nat("small")._3 && cool("small")._2 > 1.0)
    assert(cool("big")._2 < 1.0)
    // weights still sum to 1
    assert(math.abs(cool.values.map(_._1).sum - 1.0) < 1e-5)
  }

  test("NaN vectors cannot poison top-k ranks or pair thresholds (r13)") {
    // Spark's NaN total order puts NaN ABOVE every double: a NaN cosine
    // would sort to rank 1 of every query under desc, and NaN >= t is
    // TRUE in pair filters — a single failed-encoder vector (NaN, not
    // null, is what those emit) corrupted every result. Pinned: NaN
    // vectors are dropped everywhere a null vector already was.
    val good = (0L until 20L).map(i =>
      (i, Seq.tabulate(4)(d => (i + d + 1).toFloat)))
    val bad = Seq((99L, Seq(Float.NaN, 1f, 2f, 3f)))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val topk = graft.llm.Similarity.bruteForceTopK(
        df.filter(col("vec_id") < 3), df, "vec_id", "vec_id",
        "embedding", 5)
      .collect()
    assert(topk.nonEmpty)
    assert(!topk.exists(_.getLong(2) == 99L),
      "the NaN vector must never appear as a neighbor")
    assert(!topk.exists(r => r.getDouble(3).isNaN))
    val pairs = graft.llm.Similarity.allPairsAbove(df, "vec_id",
        "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L),
      "NaN >= threshold must not emit spurious pairs")
    val lsh = graft.llm.Similarity.lshPairsAbove(df, "vec_id",
        "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!lsh.exists(p => p._1 == 99L || p._2 == 99L))
    val ivf = graft.llm.Similarity.ivfTopK(df.filter(col("vec_id") < 3),
        df, "vec_id", "vec_id", "embedding", 5)
      .collect()
    assert(!ivf.exists(_.getLong(2) == 99L))
  }

  test("mixture weights: a zero-mass stratum reports zeros, not a crash") {
    // ANSI (Spark 4 default) turns the boost's division by p_natural=0
    // into a DIVIDE_BY_ZERO task failure — one empty-content source
    // killed the whole mixture. Pinned: zero-mass strata get
    // p_natural/weight/boost 0.0 and the others are unaffected.
    val df = Seq(("big", "a b c d e f g h"), ("big", "a b c d e f g h"),
      ("empty", "")).toDF("source", "text")
    // "" splits to one empty token; use a measure that is genuinely 0
    val m = graft.llm.Mixture.mixtureWeights(df, "source",
        when(length(col("text")) > 0,
          graft.llm.Mixture.tokenCount(col("text"))).otherwise(lit(0L)),
        alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(m("empty") === ((0L, 0.0, 0.0, 0.0)))
    assert(m("big")._2 === 1.0 && m("big")._3 === 1.0)
  }

  test("importance sample: NaN rate drops the row like a null rate") {
    import graft.ops.Sampling.importanceSample
    val df = spark.range(1000).toDF("id")
      .withColumn("rate",
        when(col("id") % 2 === 0, lit(Double.NaN)).otherwise(lit(1.0)))
    val kept = importanceSample(df, "id", col("rate"))
      .collect().map(_.getLong(0))
    // pre-fix the NaN rows clamped to 1.0 — keep-everything for exactly
    // the rows whose quality signal broke
    assert(kept.forall(_ % 2 === 1L), "NaN-rate rows must be dropped")
    assert(kept.length === 500)
  }

  test("inverted index drops null-id rows instead of merging them") {
    val df = Seq((java.lang.Long.valueOf(1L), "x y"),
      (java.lang.Long.valueOf(2L), "x z"),
      (null.asInstanceOf[java.lang.Long], "x q"))
      .toDF("doc_id", "text")
    val idx = graft.llm.Bm25.invertedIndex(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(3))).toMap
    // the null-id doc contributes nothing: df counts 2 (not 3 via a
    // phantom NULL doc), and no postings entry lacks its doc id
    assert(idx("x")._1 === 2L)
    assert(!idx.contains("q"))
    assert(idx.values.forall(v =>
      v._2.split(" ").forall(_.matches("-?\\d+:\\d+"))),
      s"postings must all render doc:pos — got ${idx.values.map(_._2)}")
  }

  test("histogram excludes NaN and infinities like nulls") {
    val df = Seq(0.5, 1.5, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("v")
    val h = graft.quality.Profile.histogram(df, "v", 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NaN would silently merge into bucket 0 (floor(NaN).toLong == 0)
    // and the infinities into Long.Max/MinValue nonsense buckets
    assert(h === Map(0L -> 1L, 1L -> 1L))
  }

  test("label centroids average per position in double") {
    val df = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)),
      (1, Seq(10.0f, 20.0f))).toDF("label", "embedding")
    val out = graft.llm.Similarity.labelCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out === Map((0, 1) -> 2.0, (0, 2) -> 4.0,
      (1, 1) -> 10.0, (1, 2) -> 20.0))
  }

  /** Naive reference for substring dedup: expected (cleaned text,
    * n_removed) per doc and (n_windows, n_dup) stats per doc. */
  private def naiveSubstringDedup(raw: Map[Long, String], k: Int)
      : (Map[Long, (String, Long)], Map[Long, (Long, Long)]) = {
    val wins = raw.toSeq.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - k).map(p => (id, p, t.slice(p, p + k).mkString(" ")))
    }
    val markedNaive = wins.groupBy(_._3).values.filter(_.size > 1)
      .flatMap { occ =>
        val keep = occ.minBy(o => (o._1, o._2))
        occ.filterNot(o => (o._1, o._2) == ((keep._1, keep._2)))
      }
      .groupBy(_._1)
      .map { case (id, occ) => id -> occ.map(_._2).toSet }
    val expected = raw.map { case (id, text) =>
      val t = text.split(" ", -1)
      val starts = markedNaive.getOrElse(id, Set.empty)
      val covered = starts.flatMap(s => s until s + k)
      val kept = t.zipWithIndex.collect {
        case (tok, i) if !covered.contains(i) => tok
      }
      id -> ((kept.mkString(" "), (t.length - kept.length).toLong))
    }
    val dupGrams = wins.groupBy(_._3).filter(_._2.size > 1).keySet
    val stats = wins.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.size.toLong, ws.count(w => dupGrams(w._3)).toLong))
    }
    (expected, stats)
  }

  test("substring dedup equals naive on random corpora (8 trials)") {
    import graft.llm.SubstringDedup
    val rnd = new scala.util.Random(77)
    (1 to 8).foreach { _ =>
      val k = 2 + rnd.nextInt(3)
      val raw = (0L until 25L).map { id =>
        val n = rnd.nextInt(18)
        id -> (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" ")
      }.toMap
      val df = raw.toSeq.toDF("doc_id", "text")
      val (expected, expStats) = naiveSubstringDedup(raw, k)
      val got = SubstringDedup.dedupSubstrings(df, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      assert(got === expected, s"k=$k")
      val gotStats = SubstringDedup
        .duplicatedWindowStats(df, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      // naive emits a row only for docs with >= 1 window, as the op does
      assert(gotStats === expStats.filter(_._2._1 > 0), s"k=$k")
    }
  }

  test("incremental substring dedup: index probe == naive, appends accumulate") {
    import graft.llm.SubstringDedup
    val k = 4
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val part1 = all.filter(_._1 % 3 == 0)
    val part2 = all.filter(_._1 % 3 == 1)
    val part3 = all.filter(_._1 % 3 == 2)
    def grams(m: Map[Long, String]): Set[String] = m.values.flatMap { t =>
      val w = t.split(" ", -1)
      (0 to w.length - k).map(p => w.slice(p, p + k).mkString(" "))
    }.toSet
    // naive incremental reference against a known-gram set
    def naive(batch: Map[Long, String], corpus: Set[String])
        : Map[Long, (String, Long)] = {
      val wins = batch.toSeq.flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        (0 to t.length - k).map(p => (id, p, t.slice(p, p + k).mkString(" ")))
      }
      val inCorpus = wins.filter(w => corpus(w._3)).map(w => (w._1, w._2))
      val intra = wins.filterNot(w => corpus(w._3)).groupBy(_._3).values
        .filter(_.size > 1)
        .flatMap { occ =>
          val keep = occ.minBy(o => (o._1, o._2))
          occ.filterNot(o => (o._1, o._2) == ((keep._1, keep._2)))
            .map(o => (o._1, o._2))
        }
      val marked = (inCorpus ++ intra).groupBy(_._1)
        .map { case (id, ps) => id -> ps.map(_._2).toSet }
      batch.map { case (id, text) =>
        val t = text.split(" ", -1)
        val covered = marked.getOrElse(id, Set.empty)
          .flatMap(s => s until s + k)
        val kept = t.zipWithIndex.collect {
          case (tok, i) if !covered.contains(i) => tok
        }
        id -> ((kept.mkString(" "), (t.length - kept.length).toLong))
      }
    }
    def run(batch: Map[Long, String], path: String) =
      SubstringDedup.dedupSubstringsVsIndex(
          docs.filter(col("doc_id").isin(batch.keys.toSeq: _*)),
          "doc_id", "text", k, path)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
    val path = "target/tmp/llmspec_windex"
    val p1 = docs.filter(col("doc_id").isin(part1.keys.toSeq: _*))
    SubstringDedup.writeWindowIndex(p1, "doc_id", "text", k, path)
    assert(run(part2, path) === naive(part2, grams(part1)))
    // append batch 2; batch 3 must now dedup against parts 1 AND 2
    SubstringDedup.appendWindowIndex(
      docs.filter(col("doc_id").isin(part2.keys.toSeq: _*)),
      "doc_id", "text", k, path)
    val got3 = run(part3, path)
    assert(got3 === naive(part3, grams(part1) ++ grams(part2)))
    assert(got3.values.map(_._2).sum > 0, "cross-part dups should exist")
  }

  test("read-only substring probe refuses an absent index and leaves NO " +
      "phantom stamp (r14)") {
    // r13 ADVICE: the probe used to route through the stamping helper,
    // so a probe aimed at a not-yet-built path wrote `_params` at the
    // PROBE's k — and a later appendWindowIndex at the intended k was
    // refused by the probe's phantom stamp. The probe must fail loudly
    // and leave the dir stamp-free.
    import graft.llm.SubstringDedup
    val path = java.nio.file.Files
      .createTempDirectory("graft_phantom").toString + "/idx"
    val batch = docs.limit(5)
    intercept[IllegalArgumentException] {
      SubstringDedup.dedupSubstringsVsIndex(batch, "doc_id", "text", 12, path)
        .collect()
    }
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(path, "_params")),
      "a failed read-only probe must not stamp the index path")
    // the intended writer at a DIFFERENT k now proceeds unimpeded
    SubstringDedup.writeWindowIndex(batch, "doc_id", "text", 8, path)
    assert(SubstringDedup.dedupSubstringsVsIndex(
      docs.limit(8), "doc_id", "text", 8, path).count() >= 0)
  }

  test("saturation ratio is multiplicity-exact under duplicated batch " +
      "rows (r14 review)") {
    // the r14 inner+distinct probe rewrite must NOT change the stats
    // contract: n_dup_windows counts wins ROWS (like n_windows), so a
    // batch carrying the same (doc_id, text) row twice still reads a
    // 1.0 saturation ratio for a fully-covered doc — a distinct-based
    // count would halve it and let the doc pass the quarantine bar.
    import graft.llm.SubstringDedup
    val one = Seq((1L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val dup = one.unionAll(one)
    val idx = SubstringDedup.hashedWindows(one, "doc_id", "text", 8)
      .select(col("whash"))
    val wins = SubstringDedup.hashedWindows(dup, "doc_id", "text", 8)
    val stats = SubstringDedup.duplicatedWindowStatsFromWins(
        dup.select(col("doc_id")), wins, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.length === 1)
    val (_, n, dupN) = stats.head
    assert(n === 10, s"12 tokens, k=8 -> 5 windows x2 rows; got $n")
    assert(dupN === n,
      s"fully covered doc must read ratio 1.0, got $dupN/$n")
    // the INTRA variant — the one the live similarity gate calls — must
    // keep the identical contract (r14 review #1: its distinct-based
    // count read 0.5 here)
    val intra = SubstringDedup.duplicatedWindowStatsWithIntraFromWins(
        dup.select(col("doc_id")), wins, Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(intra.length === 1)
    assert(intra.head._3 === intra.head._2,
      s"gate variant must read ratio 1.0 too, got " +
        s"${intra.head._3}/${intra.head._2}")
  }

  test("substring dedup matches a naive driver-side span cut") {
    import graft.llm.SubstringDedup
    val k = 5
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (expected, statsNaive) = naiveSubstringDedup(raw, k)
    val got = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum > 0, "fixture should have real dups")
    val stats = SubstringDedup.duplicatedWindowStats(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(stats === statsNaive)
  }

  test("BPE merges: distributed == driver fast path == local reference") {
    import graft.llm.BpeTrain
    val small = docs.limit(60)
    val fast = BpeTrain.merges(small, "text", nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val dist = BpeTrain.merges(small, "text", nMerges = 8,
        fastPathMaxWords = 0L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(fast.toSeq === dist.toSeq)
    assert(fast.length === 8)
    // ranks are dense and learned merges are reproducible
    assert(fast.map(_._1).toSeq === (0 until 8))
    // greedy left-to-right fold: "aaa" merges once under (a, a), not twice
    val tri = BpeTrain.mergesLocal(Seq(("aaa", 1L)), 2)
    assert(tri.head === ((0, "a", "a", 2L)),
      "adjacent pair in aaa counts twice before any merge")
    assert(tri(1) === ((1, "aa", "a", 1L)))
  }

  test("BPE local tie-break ordering equals Spark's binary string order") {
    import graft.llm.BpeTrain
    // strings where UTF-16 code-unit order and UTF-8 byte order DISAGREE:
    // a supplementary char (surrogate pair) vs U+F900, plus accents/ASCII
    val tricky = Seq("豈", new String(Character.toChars(0x10000)),
      "é", "é", "z", "ÿ", "a", "")
    val sparkOrder = tricky.toDF("s").orderBy(col("s")).collect()
      .map(_.getString(0)).toSeq
    val localOrder = tricky.sorted(
      (a: String, b: String) => Util.utf8Compare(a, b))
    assert(localOrder === sparkOrder,
      "driver fast path must tie-break exactly like a Spark orderBy")
    // and plain compareTo genuinely disagrees on this input, so the
    // UTF-8 comparator is load-bearing, not decorative
    assert(tricky.sorted != sparkOrder)
  }

  test("BPE encode matches per-word local encoding") {
    import graft.llm.BpeTrain
    val small = docs.limit(40)
    val rules = BpeTrain.merges(small, "text", nMerges = 6)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeTrain.encode(small, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expected = small.select("doc_id", "text").collect().map { r =>
      val words = r.getString(1).split(" ", -1).filter(_.nonEmpty)
      r.getLong(0) -> ((words.length.toLong,
        words.map(w => BpeTrain.encodeLocal(w, rules).length.toLong).sum))
    }.toMap
    assert(got === expected)
    // merges actually compress: fewer pieces than characters
    val chars = small.select("text").collect()
      .map(_.getString(0).count(_ != ' ').toLong).sum
    assert(got.values.map(_._2).sum < chars)
    // token-less documents stay in the output at (0, 0)
    val withEmpty = Seq((900L, ""), (901L, "ab ab")).toDF("doc_id", "text")
    val enc = BpeTrain.encode(withEmpty, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(enc(900L) === ((0L, 0L)) && enc(901L)._1 === 2L)
  }

  test("BM25 scores a tiny corpus to exact micros") {
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = graft.llm.Bm25.score(df, "doc_id", "text", Seq("x", "z"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // N=2, avgdl=2.5; x: df=1, tf(d1)=2, dl(d1)=3; z: df=1, tf(d2)=1, dl=2
    def bm25(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log((2L - df + 0.5) / (df + 0.5) + 1.0)
      val sat = (tf * 1.0 * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / 2.5))
      math.floor(idf * sat * 1e6).toLong
    }
    assert(got === Map(1L -> ((1L, bm25(2, 1, 3))),
      2L -> ((1L, bm25(1, 1, 2)))))
  }

  test("empty corpus: LM / PMI / BM25 / BPE / substring ops return empty, no crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.llm.NgramLm.scoreDocs(empty, "doc_id", "text").count() === 0L)
    assert(graft.llm.NgramLm.pmiCollocations(empty, "text", 1).count() === 0L)
    assert(graft.llm.Bm25.score(empty, "doc_id", "text", Seq("x")).count() === 0L)
    assert(graft.llm.BpeTrain.merges(empty, "text", 4).count() === 0L)
    assert(graft.llm.SubstringDedup
      .dedupSubstrings(empty, "doc_id", "text", 3).count() === 0L)
    assert(graft.llm.Bm25.invertedIndex(empty, "doc_id", "text")
      .count() === 0L)
    val w = graft.llm.QualityClassifier.hashWeights(spark, 16)
    assert(graft.llm.QualityClassifier
      .score(empty, "doc_id", "text", w, 16).count() === 0L)
    val emptyVec = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(emptyVec, "vec_id", "embedding", 0.5)
      .count() === 0L)
  }

  test("quality classifier plan: weights ride a broadcast join, agg is doc-keyed") {
    import graft.llm.QualityClassifier
    val w = QualityClassifier.hashWeights(spark, 4096)
    val plan = QualityClassifier.score(docs, "doc_id", "text", w, 4096)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      "a shuffled weight join means the broadcast hint was lost")
  }

  test("RRF fusion sums reciprocal ranks, absence contributes zero") {
    val lex = Seq((10L, 1), (20L, 2)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1), (30L, 2)).toDF("doc_id", "rank")
    val got = graft.llm.Bm25.rrfFuse(lex, sem, "doc_id", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(30L) - 1.0 / 62) < 1e-15)
    // overlap doc outranks both single-list docs
    assert(got(20L) > got(10L) && got(20L) > got(30L))
  }

  test("bigram LM scores a tiny corpus exactly") {
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = graft.llm.NgramLm.scoreDocs(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // V=3 (a,b,x); bigrams: (a,b)x2+(a,b)=3? doc1: ab, ba, ab; doc2: ab.
    // c(a,b)=3, c(b,a)=1; contexts: c(a)=3, c(b)=1.
    // per-bigram ln P is floored to integer micros before the sum (the
    // order-independent form the oracle replays) — mirror it here
    def q(x: Double) = math.floor(x * 1e6).toLong
    val pab = q(math.log(4.0 / 6.0)) // (3+1)/(3+3)
    val pba = q(math.log(2.0 / 4.0)) // (1+1)/(1+3)
    assert(got.keySet === Set(1L, 2L), "doc with <2 tokens absent")
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === (2 * pab + pba).toDouble / 1e6 / 3L)
    assert(got(2L)._2 === pab.toDouble / 1e6 / 1L)
  }

  test("semantic dedup equals local union-find over same-cell cosine pairs") {
    val out = Dedup.semanticDedup(embs, "vec_id", "embedding", 0.3, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive reference: same sign-cell pairs above tau, then union-find
    val rows = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cellOf(v: Array[Double]) =
      (0 until 6).map(i => if (i < v.length && v(i) >= 0) 1L << i else 0L).sum
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (d == 0) 0.0 else dot / d
    }
    val byCell = rows.groupBy { case (_, v) => cellOf(v) }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = scala.collection.mutable.Set[Long]()
    for ((_, grp) <- byCell; i <- grp.indices; j <- (i + 1) until grp.length)
      if (cos(grp(i)._2, grp(j)._2) >= 0.3) {
        union(grp(i)._1, grp(j)._1); members += grp(i)._1; members += grp(j)._1
      }
    val expected = members.map(id => id -> find(id)).toMap
    assert(out.map(t => t._1 -> t._3).toMap === expected,
      "components must match local union-find")
    val cellById = rows.map { case (id, v) => id -> cellOf(v) }.toMap
    assert(out.forall { case (id, cell, _) => cellById(id) == cell },
      "reported cell must be the row's sign-bit cell")
    // every component label is the minimum member id
    val byComp = out.groupBy(_._3)
    assert(byComp.forall { case (comp, ms) => ms.map(_._1).min == comp })
  }

  test("semantic dedup hot-cell valve subdivides instead of stalling or dropping") {
    // 40 vectors all in ONE 4-bit cell (first 4 dims positive), split
    // into two sign-groups at dims 5-8; within each group vectors are
    // near-identical (cosine ~1)
    val mk = (g: Int, j: Int) => Array(1f, 1f, 1f, 1f) ++
      Array.fill(4)(if (g == 0) 1f + j * 0.001f else -1f - j * 0.001f)
    val rows = (0 until 40).map(i => (i.toLong, mk(i % 2, i / 2).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    // cap forces the subdivision; groups land in different subcells, so
    // cross-group pairs vanish but each group still fully dedups
    val valved = Dedup.semanticDedup(df, "vec_id", "embedding",
        tau = 0.9, bits = 4, maxCellSize = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(valved.size === 40, "both groups must still be deduped")
    val comps = valved.values.toSet
    assert(comps === Set(0L, 1L),
      "each sign-group collapses to its own min-id representative")
    assert((0 until 40).forall(i => valved(i.toLong) == (i % 2).toLong))
    // under the cap: identical result with and without the valve param
    val unvalved = Dedup.semanticDedup(df, "vec_id", "embedding",
        tau = 0.9, bits = 4, maxCellSize = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // without subdivision the two groups are one cell but cosine across
    // groups is far below tau, so components are identical here
    assert(unvalved === valved)
  }

  test("multi-signal dedup: a text-dup hop and a semantic-dup hop merge into one cluster") {
    // ids 1~2 are exact text duplicates; ids 2~3 share an embedding
    // direction (cosine 1) but have unrelated text; id 4 is noise
    val docsT = Seq((1L, "a", "the quick brown fox jumps"),
      (2L, "a", "the quick brown fox jumps"),
      (3L, "a", "completely different words here entirely"),
      (4L, "a", "unrelated noise text row")).toDF("doc_id", "source", "text")
    val v = Seq(1f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val w = Seq(-1f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    val embsT = Seq((2L, v), (3L, v), (4L, w))
      .toDF("vec_id", "embedding")
    val textPairs = Dedup.jaccardPairsWithinGroupPrefix(docsT,
      "doc_id", "text", "source", 0.9).select("id_a", "id_b")
    val semPairs = Dedup.semanticPairs(embsT, "vec_id", "embedding",
      0.9, bits = 4).select("id_a", "id_b")
    val comps = Dedup.connectedComponents(
        textPairs.unionByName(semPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the chain 1-2 (text) + 2-3 (semantic) is ONE cluster rooted at 1
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // semanticPairs alone equals the pair stage of semanticDedup
    assert(semPairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet === Set((2L, 3L)))
  }

  test("incremental semantic dedup: stored-index probe == local recompute, appends accumulate, bits pinned") {
    val dir = java.nio.file.Files.createTempDirectory("semidx").toString
    val corpus = embs.filter(col("vec_id") % 10 =!= 0)
    val fresh = embs.filter(col("vec_id") % 10 === 0)
    Dedup.writeSemanticIndex(corpus, "vec_id", "embedding", dir, bits = 6)
    val viaIndex = Dedup.semanticNewVsIndex(fresh, dir, "vec_id",
        "embedding", 0.3, bits = 6)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // local reference: same cells + cosine gate recomputed on the driver
    val rows = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cellOf(v: Array[Double]) =
      (0 until 6).map(i => if (i < v.length && v(i) >= 0) 1L << i else 0L).sum
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)
      if (d == 0) 0.0 else dot / d
    }
    val expected = (for {
      (na, va) <- rows if na % 10 == 0
      (cb, vb) <- rows if cb % 10 != 0
      if cellOf(va) == cellOf(vb) && cos(va, vb) >= 0.3
    } yield (na, cb)).toSet
    assert(viaIndex === expected)
    assert(viaIndex.nonEmpty, "fixture must exercise the gate")
    // append the probe batch itself under shifted ids: every probe doc now
    // has an EXACT duplicate (cos = 1) in the index, so the re-probe must
    // keep all prior pairs and match each doc to its shifted twin
    val shifted = fresh.withColumn("vec_id", col("vec_id") + 1000000L)
    Dedup.appendSemanticIndex(shifted, "vec_id", "embedding", dir, bits = 6)
    val after = Dedup.semanticNewVsIndex(fresh, dir, "vec_id",
        "embedding", 0.3, bits = 6)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(after), "append must not drop prior entries")
    val freshIds = rows.collect { case (id, _) if id % 10 == 0 => id }.toSet
    assert(freshIds.forall(id => after.contains((id, id + 1000000L))),
      "every probe doc must match its appended exact twin")
    // bits mismatch fails loudly instead of probing foreign cells
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticNewVsIndex(fresh, dir, "vec_id", "embedding", 0.3,
        bits = 8)
    }
    assert(e.getMessage.contains("bits"))
  }

  test("stored IVF index: probe == in-memory ivfTopK, cell partitions pruned") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val queries = embs.filter(col("vec_id") < 10)
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", dir,
      nlist = 8, seed = 42L)
    val viaIndex = Similarity.ivfTopKVsIndex(queries, dir, "vec_id",
      "embedding", k = 5, nprobe = 2)
    val inMemory = Similarity.ivfTopK(queries, embs, "vec_id", "vec_id",
      "embedding", k = 5, nlist = 8, nprobe = 2, seed = 42L)
    // same deterministic quantizer -> identical shortlists and ranks
    val a = viaIndex.select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = inMemory.select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)
    // the probe plan must prune cell partitions, not scan-and-discard:
    // nprobe=2 of nlist=8 cells per query -> a PartitionFilters entry on
    // the cells scan with the probed ids
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected cell-partition pruning in:\n${plan.take(2000)}")
  }

  test("stored PQ index: probe == in-memory pqTopK, torn layout refused " +
      "(r17)") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val queries = embs.filter(col("vec_id") < 10)
    Similarity.writePqIndex(embs, "vec_id", "embedding", dir,
      m = 8, ksub = 16, seed = 42L)
    val viaIndex = Similarity.pqTopKVsIndex(queries, dir, "vec_id",
      "embedding", k = 5)
    val inMemory = Similarity.pqTopK(queries, embs, "vec_id", "vec_id",
      "embedding", k = 5, m = 8, ksub = 16, seed = 42L)
    // same deterministic quantizer + ONE shared encode/lookup
    // definition -> identical shortlists and ranks
    val a = viaIndex.select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = inMemory.select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.nonEmpty)
    // the CANDIDATE side must scan the stored CODES, never the raw
    // corpus vectors (the query side legitimately reads its own table)
    val files = viaIndex.inputFiles.toSeq
    assert(files.exists(_.contains(s"$dir/codes")),
      s"probe must read the stored codes: $files")
    assert(files.forall(f => f.contains(dir) || f.contains("embeddings")),
      s"probe must not read any corpus table beyond the queries: $files")
    // a stamp-less (torn/foreign) layout is refused loudly
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_params"), false)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopKVsIndex(queries, dir, "vec_id", "embedding", k = 5)
    }
    assert(e.getMessage.contains("_params"))
  }

  test("quality classifier scores a tiny corpus exactly, absent buckets weigh 0") {
    import graft.llm.QualityClassifier
    val docs = Seq((1L, "aa bb"), (2L, "aa aa aa"), (3L, "zz"))
      .toDF("doc_id", "text")
    val k = 64
    // per-token buckets exactly as the engine computes them
    val b = docs.select(explode(split(col("text"), " ")).as("tok"))
      .select(col("tok"), QualityClassifier.bucket(col("tok"), k).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // weight table covering only aa's bucket — bb/zz fall to 0
    val weights = Seq((b("aa"), 2000L)).toDF("bucket", "w_milli")
    val got = QualityClassifier.score(docs, "doc_id", "text", weights, k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val bbW = if (b("bb") == b("aa")) 2000L else 0L
    val zzW = if (b("zz") == b("aa")) 2000L else 0L
    assert(got(1L) === ((2L, (2000L + bbW) * 1000000L / (2000L * 2L),
      (2000L + bbW) * 1000000L / (2000L * 2L) >= 500000L)))
    assert(got(2L) === ((3L, 1000000L, true)), "all-aa doc scores 1.0")
    assert(got(3L)._2 === zzW * 1000000L / 2000L)
    // deterministic hash weights: same k -> same table, values in range
    val w1 = QualityClassifier.hashWeights(spark, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1.size == 256 && w1.values.forall(w => w >= 0 && w <= 2000))
  }

  test("inverted index: exact postings, df bounds, partition-invariant") {
    val docs = Seq((10L, "a b a"), (2L, "b c"), (7L, "a c b"))
      .toDF("doc_id", "text")
    val idx = graft.llm.Bm25.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // postings ordered by (doc, pos), 1-based positions
    assert(idx("a") === ((2L, 3L, "7:1 10:1 10:3")))
    assert(idx("b") === ((3L, 3L, "2:1 7:3 10:2")))
    assert(idx("c") === ((2L, 2L, "2:2 7:2")))
    // df bounds drop rare/common terms
    val bounded = graft.llm.Bm25.invertedIndex(docs, "doc_id", "text",
      minDf = 3L).collect().map(_.getString(0)).toSet
    assert(bounded === Set("b"))
    // same result under an adversarial partitioning (map-side combine +
    // in-aggregate sort make the rendered string partition-invariant)
    val shuffled = graft.llm.Bm25.invertedIndex(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(shuffled === idx)
  }

  // ---------- planted near-duplicate recall pins ----------
  //
  // The subset/recall tests above run on RANDOM data, where high-similarity
  // pairs are scarce and a recall floor must sit low (> 0.5) to avoid
  // flakiness — low enough that a banding/probing regression could shave
  // recall silently. These tests PLANT near-duplicates at a documented
  // similarity and pin recall >= 0.9 at the documented parameters, so a
  // broken band/table/probe parameter fails loudly. (Validated this
  // session by deliberate breakage: MinHash with bands=2 reads recall
  // 0.43 here, cosine-LSH with tables=1 reads 0.77 — both fail.)

  /** 60 planted (base, near-dup) doc pairs with per-doc unique vocabulary
    * (no cross-pair matches): 60 tokens, one replaced -> word-3-shingle
    * Jaccard = 55/61 ~ 0.90 exactly, comfortably above the 0.8 verify
    * threshold. */
  private def plantedDocs: (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    val rows = (0 until 60).flatMap { i =>
      val toks = (0 until 60).map(j => s"w${i}_$j")
      val near = toks.updated(30, s"x$i")
      Seq((2L * i, toks.mkString(" ")), (2L * i + 1, near.mkString(" ")))
    }
    val truth = (0 until 60).map(i => (2L * i, 2L * i + 1)).toSet
    (rows.toDF("doc_id", "text"), truth)
  }

  test("planted MinHash recall >= 0.9 at numHashes=32, bands=8, jac~0.90") {
    val (docs, truth) = plantedDocs
    // S-curve at jac=0.90, r=4 rows/band, 8 bands: per-pair catch
    // probability 1-(1-0.9^4)^8 ~ 0.9998 -> 60 pairs pass 0.9 with
    // overwhelming margin unless the banding is broken
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"planted MinHash recall: $recall")
    assert(recall >= 0.9, s"planted recall $recall < 0.9 — banding broken?")
  }

  /** Planted embedding set: unit-ish gaussian base vectors (d=16) plus a
    * perturbed copy at cosine ~0.985 — deliberately NOT closer to 1.0,
    * so the per-table catch probability (~0.64 at 8 planes) genuinely
    * needs the 4-table union (~0.98/pair): dropping to tables=1 fails
    * the floor (validated: reads ~0.6 recall), while cos→1 would let a
    * single table pass. Decoys pairwise cosine ~ 0 in d=16. Seeded. */
  private def plantedVecs: (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(1234)
    def gauss(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]) = {
      val n = gauss(v.length)
      v.zip(n).map { case (x, e) => x + 0.17f * e }
    }
    val planted = (0 until 60).flatMap { i =>
      val v = gauss(16)
      Seq((2L * i, v.toSeq), (2L * i + 1, perturb(v).toSeq))
    }
    val decoys = (0 until 60).map(i => (1000L + i, gauss(16).toSeq))
    val truth = (0 until 60).map(i => (2L * i, 2L * i + 1)).toSet
    ((planted ++ decoys).toDF("vec_id", "embedding"), truth)
  }

  test("planted cosine-LSH recall >= 0.9 at 8 planes x 4 tables, cos~0.985") {
    val (vecs, truth) = plantedVecs
    // angle(cos 0.985) ~ 0.055*pi -> one 8-plane table agrees with
    // p ~ (1-0.055)^8 ~ 0.64; any of 4 tables ~ 0.98 per pair
    val got = Similarity.lshPairsAbove(vecs, "vec_id", "embedding",
        threshold = 0.9, planesPerTable = 8, tables = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"planted cosine-LSH recall: $recall")
    assert(recall >= 0.9, s"planted recall $recall < 0.9 — tables broken?")
  }

  test("planted IVF top-1 recall >= 0.9 at nlist=16, nprobe=4") {
    val rnd = new scala.util.Random(99)
    def gauss(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    val corpus = (0 until 400).map(i => (i.toLong, gauss(16).toSeq))
    // 50 queries: tiny perturbations of corpus vectors 0..49 — each
    // query's true nearest neighbor is its own base vector
    val queries = (0 until 50).map { i =>
      val base = corpus(i)._2.toArray
      val n = gauss(16)
      (10000L + i,
        base.zip(n).map { case (x, e) => x + 0.02f * e }.toSeq)
    }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = queries.toDF("vec_id", "embedding")
    val top1 = Similarity.ivfTopK(qdf, cdf, "vec_id", "vec_id",
        "embedding", 1, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = (0 until 50).count(i => top1.get(10000L + i).contains(i.toLong))
    val recall = hits.toDouble / 50
    info(s"planted IVF top-1 recall: $recall")
    assert(recall >= 0.9, s"planted recall $recall < 0.9 — probing broken?")
  }

  test("planted PQ+rerank top-1 recall >= 0.9 at m=8, ksub=16, shortlist=10") {
    val rnd = new scala.util.Random(77)
    def gauss(d: Int) = Array.fill(d)(rnd.nextGaussian().toFloat)
    val corpus = (0 until 400).map(i => (i.toLong, gauss(16).toSeq))
    val queries = (0 until 50).map { i =>
      val base = corpus(i)._2.toArray
      val n = gauss(16)
      (10000L + i,
        base.zip(n).map { case (x, e) => x + 0.02f * e }.toSeq)
    }
    val cdf = corpus.toDF("vec_id", "embedding")
    val qdf = queries.toDF("vec_id", "embedding")
    // ADC shortlist of 10 must surface the planted base; exact rerank
    // then puts it at rank 1
    val top1 = Similarity.pqTopKReranked(qdf, cdf, "vec_id", "vec_id",
        "embedding", 1, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = (0 until 50).count(i => top1.get(10000L + i).contains(i.toLong))
    val recall = hits.toDouble / 50
    info(s"planted PQ+rerank top-1 recall: $recall")
    assert(recall >= 0.9, s"planted recall $recall < 0.9 — codebooks broken?")
  }

  test("native DotProduct/SqDistance == HOF aggregate(zip_with(...)) " +
      "bit-for-bit, incl. ragged/null/empty edges (r17 kernels)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.GraftSql
    val rnd = new scala.util.Random(7)
    def vec(n: Int) = Seq.fill(n)(rnd.nextDouble() * 4 - 2)
    val rows: Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])] =
      Seq.fill(300)((Some(vec(8).map(Option(_))), Some(vec(8).map(Option(_))))) ++
      Seq(
        (Some(vec(8).map(Option(_))), Some(vec(5).map(Option(_)))), // ragged
        (Some(Seq(Option(1.0), None, Option(2.0))),
          Some(vec(3).map(Option(_)))), // null element
        (Some(Seq.empty), Some(Seq.empty)), // empty
        (None, Some(vec(8).map(Option(_)))), // null array
        (None, None))
    val df = rows.toDF("a", "b")
    def hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def hofSq = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val cmp = df.select(
      hofDot.as("hd"),
      GraftSql.column(graft.catalyst.DotProduct(
        GraftSql.expression(col("a").cast("array<double>")),
        GraftSql.expression(col("b").cast("array<double>")))).as("nd"),
      hofSq.as("hs"),
      GraftSql.column(graft.catalyst.SqDistance(
        GraftSql.expression(col("a").cast("array<double>")),
        GraftSql.expression(col("b").cast("array<double>")))).as("ns"))
    // <=> is bit-agnostic for NaN/null equality; for finite doubles
    // bit-identity additionally pinned via the raw bits
    val bad = cmp.filter(not(col("hd") <=> col("nd")) ||
        not(col("hs") <=> col("ns")) ||
        (col("hd").isNotNull &&
          expr("cast(hd as double)") =!= expr("cast(nd as double)")))
      .collect()
    assert(bad.isEmpty, s"native kernel diverged: ${bad.take(3).mkString}")
  }

  test("jaccardSorted == jaccard (array_intersect form) on random sorted " +
      "sets — long and string elements, empties included (r17 verify kernel)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // small value domain forces real overlaps; sizes 0..20 cover empties
    val rows = Seq.fill(400)((
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted,
      Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong).distinct.sorted))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        Dedup.jaccard(col("a"), col("b")).as("j1"),
        Dedup.jaccardSorted(col("a"), col("b")).as("j2"))
      .filter(not(col("j1") <=> col("j2"))).collect()
    assert(bad.isEmpty, s"long-element divergence: ${bad.take(3).mkString}")
    val srows = Seq.fill(400)((
      Seq.fill(rnd.nextInt(15))(s"w${rnd.nextInt(25)}").distinct.sorted,
      Seq.fill(rnd.nextInt(15))(s"w${rnd.nextInt(25)}").distinct.sorted))
    val sbad = srows.toDF("a", "b").select(
        Dedup.jaccard(col("a"), col("b")).as("j1"),
        Dedup.jaccardSorted(col("a"), col("b")).as("j2"))
      .filter(not(col("j1") <=> col("j2"))).collect()
    assert(sbad.isEmpty, s"string-element divergence: ${sbad.take(3).mkString}")
    // null arrays propagate identically
    val nrows = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (None: Option[Seq[Long]], None: Option[Seq[Long]]))
    val nbad = nrows.toDF("a", "b").select(
        Dedup.jaccard(col("a"), col("b")).as("j1"),
        Dedup.jaccardSorted(col("a"), col("b")).as("j2"))
      .filter(not(col("j1") <=> col("j2"))).collect()
    assert(nbad.isEmpty, "null-array divergence")
  }
}
