package graft

import graft.Util.{spread, table}
import graft.io.QualtricsReader
import graft.llm.{Bm25, BpeTrain, CorpusHygiene, Dedup, Mixture, Multimodal, NgramLm, Quantize, QualityClassifier, Similarity, SubstringDedup, TextFunctions}
import graft.ops._
import graft.streaming.EventsStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — query registry + DuckDB oracle SQL.
  *
  * Conventions (driver hash-compares after sorting columns by name):
  *  - every query carries a deterministic total ordering;
  *  - computed integers are cast to BIGINT on both sides;
  *  - money/quantity sums go through DECIMAL so they are exact and
  *    order-independent (double sums are partial-agg-order-dependent),
  *    then cast to DOUBLE at the very end on BOTH sides: engines render
  *    decimals differently (scale, Decimal-vs-float readout), while the
  *    double of the same exact decimal value is bit-identical under any
  *    downstream canonicalization;
  *  - aliases match the oracle exactly.
  */
object SparkEntry {

  /** Flagship (sf0.001): the reference's heart — Levenshtein similarity
    * join + best-match-per-key (varinfo-update.R:93-118) over part names. */
  def entry(spark: SparkSession): DataFrame =
    bestMatch(spark, "/root/testdata/sf0.001")

  // ---------- shared query builders ----------

  private def distinctNames(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "part").select(col("p_name")).distinct()

  private def similarityJoin(s: SparkSession, dir: String): DataFrame = {
    val names = distinctNames(s, dir)
    val others = distinctNames(s, dir).withColumnRenamed("p_name", "q_name")
    SimilarityJoin.leftJoin(names, others, "p_name", "q_name", 3)
      .withColumn("string_distance", col("string_distance").cast("long"))
      .orderBy(col("p_name"), col("q_name").asc_nulls_last)
  }

  private def bestMatch(s: SparkSession, dir: String): DataFrame = {
    val names = distinctNames(s, dir).alias("l")
    val others = distinctNames(s, dir)
      .withColumnRenamed("p_name", "q_name").alias("r")
    val pairs = names.join(others,
        SimilarityJoin.condition(col("l.p_name"), col("r.q_name"), 6) &&
          col("l.p_name") =!= col("r.q_name"), "left")
      .withColumn("string_distance",
        when(col("q_name").isNotNull,
          levenshtein(col("p_name"), col("q_name"))).cast("long"))
    BestMatch.topOnePerKey(pairs, Seq(col("p_name")),
        Seq(col("string_distance").asc_nulls_last,
            col("q_name").asc_nulls_last))
      .select(col("p_name"), col("q_name"), col("string_distance"))
      .orderBy(col("p_name"))
  }

  /** Session-scoped fixture for `q_substring_incremental`: the corpus
    * window index is the operator's stored INPUT, so it is built once per
    * (JVM, sfDir) and reused — building it inside the timed lambda made
    * the bench reading ~60% index construction instead of the probe path
    * the query name claims to measure. Path is sfDir-keyed so verify
    * (sf0.01) and bench (sf0.1) in one JVM never share an index; a fresh
    * JVM rebuilds (mode=overwrite), so stale runs can't leak across
    * sessions. */
  private val winIndexBuilt = scala.collection.mutable.Set.empty[String]
  private def substringIndexFixture(s: SparkSession, dir: String): String = {
    // one path-construction convention (r13 review): hand-rolling the
    // sanitize-and-concat here let this fixture drift from scratchPath's
    // checkout/sfDir-keying discipline
    val path = scratchPath("q_substring_windex", dir)
    winIndexBuilt.synchronized {
      if (!winIndexBuilt.contains(path)) {
        val docs = spread(table(s, dir, "documents"), "doc_id")
        SubstringDedup.writeWindowIndex(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", 8, path)
        winIndexBuilt += path
      }
    }
    path
  }

  /** Deterministic per-(checkout, sfDir) scratch path for queries that
    * exercise STORED state (indexes, ingest ledgers). Rooted under the
    * project's `target/tmp` rather than the global `java.io.tmpdir` so
    * two graft JVMs running concurrently from DIFFERENT checkouts on one
    * box cannot clear each other's state mid-run, and sfDir-keyed so
    * verify (sf0.01) and bench (sf0.1) inside one JVM never share state.
    * Gate queries clear the path up-front each invocation — repeated
    * runs reuse ONE location instead of leaking a copy per run. Two JVMs
    * sharing one working directory would still collide: run concurrent
    * gates from separate checkouts. */
  private def scratchPath(tag: String, dir: String): String =
    java.nio.file.Paths.get("target", "tmp",
      tag + "_" + dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  /** Materialize a SMALL result once before a global orderBy (r18, guide
    * §2.4/§3.3): a global sort plans `Exchange rangepartitioning`, whose
    * range-bounds SAMPLING job re-executes everything between the
    * previous exchange and the sort — for the callers below that segment
    * is the expensive verify / decode map work, measured running TWICE
    * per invocation (e.g. q_audio_windows_real's single-task WAV decode;
    * q_text_repetition's n-gram fold). One keyless round-robin exchange
    * in between turns the heavy segment into a materialized shuffle
    * stage both the sampler and the sort map then READ instead of
    * recompute. An exchange (not a localCheckpoint): it shows in the
    * explained plan, costs no block-manager residency, and the
    * sort-before-repartition tax is trivial at these sizes. Use ONLY
    * where the pre-sort result is small (these callers' outputs are
    * 24–8000 rows); a large result should keep the plain sort, whose
    * sampling re-execution amortizes at scale. */
  private def materializedOrderBy(df: DataFrame,
                                  cols: org.apache.spark.sql.Column*)
      : DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .orderBy(cols: _*)

  /** Session-scoped fixture for `q_embed_ann_ivf_index` — the same
    * discipline as [[substringIndexFixture]]: the persisted IVF index is
    * the operator's stored INPUT ("build once, probe many"), so it is
    * built once per (JVM, sfDir) and reused. Building it inside the
    * timed lambda made the bench price index construction on every run
    * (1.8 s quiet, 29 s under driver load) while the query's claim is
    * the nprobe/nlist probe path. mode=overwrite inside writeIvfIndex
    * means a fresh JVM rebuilds cleanly over any stale run's output. */
  private val ivfIndexBuilt = scala.collection.mutable.Set.empty[String]
  private def ivfIndexFixture(s: SparkSession, dir: String): String = {
    val path = scratchPath("q_ivfidx", dir)
    ivfIndexBuilt.synchronized {
      if (!ivfIndexBuilt.contains(path)) {
        val emb = spread(table(s, dir, "embeddings"), "vec_id")
        Similarity.writeIvfIndex(emb, "vec_id", "embedding", path)
        ivfIndexBuilt += path
      }
    }
    path
  }

  /** Session-scoped fixture for `q_embed_ann_pq_index` — the
    * [[ivfIndexFixture]] discipline: the stored codes+codebooks are the
    * operator's INPUT ("build once, probe many"), so the build runs
    * once per (JVM, sfDir) and every run measures the ADC probe. */
  private val pqIndexBuilt = scala.collection.mutable.Set.empty[String]
  private def pqIndexFixture(s: SparkSession, dir: String): String = {
    val path = scratchPath("q_pqidx", dir)
    pqIndexBuilt.synchronized {
      if (!pqIndexBuilt.contains(path)) {
        val emb = spread(table(s, dir, "embeddings"), "vec_id")
        Similarity.writePqIndex(emb, "vec_id", "embedding", path)
        pqIndexBuilt += path
      }
    }
    path
  }

  /** Session-scoped fixture for `q_dedup_incremental_exact` — same
    * discipline as [[ivfIndexFixture]]: the stored exact-prefix corpus
    * index is the operator's INPUT ("prep once and stored", the shape the
    * jaccardNewVsCorpusPrefix scaladoc advertises), so it is built once
    * per (JVM, sfDir) and every run measures the O(batch) probe, not a
    * per-run double corpus prep. mode=overwrite inside
    * writeExactPrefixIndex means a fresh JVM rebuilds cleanly over any
    * stale run's output. */
  private val exactIdxBuilt = scala.collection.mutable.Set.empty[String]
  private def exactPrefixIndexFixture(s: SparkSession, dir: String): String = {
    val path = scratchPath("q_exactidx", dir)
    exactIdxBuilt.synchronized {
      if (!exactIdxBuilt.contains(path)) {
        val docs = spread(table(s, dir, "documents"), "doc_id")
        Dedup.writeExactPrefixIndex(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", 0.9, path)
        exactIdxBuilt += path
      }
    }
    path
  }

  /** Load a generated oracle SQL statement from the classpath. The
    * MinHash/SimHash oracles bit-replay Spark's XXH64 and Murmur3 in
    * DuckDB arithmetic (verified against the decompiled spark-catalyst
    * bytecode — see tools/gen_minhash_oracle.py, which generated them);
    * at ~100 KB of layered CTEs they live as resources rather than
    * inline string literals. */
  private def resourceSql(name: String): String = {
    val in = getClass.getResourceAsStream(s"/oracles/$name.sql")
    require(in != null, s"missing oracle resource /oracles/$name.sql")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def deleteRecursively(path: String): Unit =
    Util.deleteRecursively(path)

  // ---------- the registry ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/S3/U1/O3 — header-as-data transpose + sentinel (oracle: explicit
    // per-column UNION ALL over the first row, Spark-cast rendering)
    "q_s2_transpose" -> ((s, dir) => {
      val first = table(s, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(1)
        .select(table(s, dir, "lineitem").columns.toIndexedSeq.map(c =>
          col(c).cast("string").as(c)): _*)
      QualtricsReader.columnInfoFrom(first, "2025")
        .orderBy(col("`QualtricsVariableName.2025`").asc_nulls_last)
    }),

    // U1 — unionByName with missing-column NULL fill
    "q_union_by_name" -> ((s, dir) => {
      val cust = table(s, dir, "customer").select(
        col("c_custkey").as("key"), col("c_name").as("name"),
        lit("customer").as("src"))
      val supp = table(s, dir, "supplier").select(
        col("s_suppkey").as("key"), lit("supplier").as("src"))
      cust.unionByName(supp, allowMissingColumns = true)
        .orderBy(col("src"), col("key"))
    }),

    // O3 — limit 1 / head with total order
    "q_limit_head" -> ((s, dir) =>
      table(s, dir, "orders").orderBy(col("o_orderkey")).limit(1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))),

    // P1 — tolerant allow-list projection (absent name silently skipped)
    "q_select_anyof" -> ((s, dir) =>
      Dashboard.selectAnyOf(table(s, dir, "part"),
          Seq("p_partkey", "p_name", "NOT_A_COLUMN", "p_retailprice"))
        .orderBy(col("p_partkey"))),

    // P3 — R-faithful `!x %in% values`: NULL rows KEPT
    "q_filter_null_in" -> ((s, dir) => {
      val o = table(s, dir, "orders").withColumn("status_n",
        when(col("o_orderstatus") === "O", lit(null).cast("string"))
          .otherwise(col("o_orderstatus")))
      o.filter(Dashboard.notInKeepNulls(col("status_n"), Seq("F")) &&
          col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"), col("status_n"))
        .orderBy(col("o_orderkey"))
    }),

    // P4/P6/F6 — replace_na + column-pair coalesce
    "q_replace_na" -> ((s, dir) => {
      val statusN = when(col("o_orderstatus") === "P",
        lit(null).cast("string")).otherwise(col("o_orderstatus"))
      table(s, dir, "orders").select(
        col("o_orderkey"),
        coalesce(statusN, col("o_orderpriority")).as("status_filled"),
        coalesce(statusN, lit("")).as("na_to_empty"))
        .orderBy(col("o_orderkey"))
    }),

    // P5 — vectorized conditional priority
    "q_conditional_priority" -> ((s, dir) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(-1L))
          .otherwise(length(col("o_orderpriority")).cast("long"))
          .as("priority"))
        .orderBy(col("o_orderkey"))),

    // J1/F1 — Levenshtein theta left join with length band + early exit
    "q_similarity_join" -> similarityJoin,

    // J2/W2/O1 — best-match-per-key, deterministic tiebreak
    "q_best_match" -> bestMatch,

    // J1 scale path #2 — chunk-filter (PassJoin-family) kernel; same naive
    // oracle as the blocked variant, so matching results prove soundness
    "q_similarity_chunked" -> ((s, dir) => {
      val prefix = array_join(slice(split(col("text"), " "), 1, 2), " ")
      val a = table(s, dir, "documents")
        .select(col("doc_id").as("id_a"), prefix.as("pa"))
      val b = table(s, dir, "documents")
        .select(col("doc_id").as("id_b"), prefix.as("pb"))
      // 2-token prefixes repeat ~5.6x across docs -> dedupKeys shrinks the
      // kernel's pair space ~31x and expands matches back afterwards
      SimilarityJoin.chunkedInnerJoin(a, b, "pa", "pb", 2, "dist",
          dedupKeys = true)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        // materializedOrderBy (r18): the DP-verify map segment otherwise
        // re-executes under the sort's range sampling (small pair result)
        .transform(materializedOrderBy(_, col("id_a"), col("id_b")))
    }),

    // J1 scale path — length-banded (blocked) similarity join: the Spark
    // side runs the shuffle-hash-join kernel (right side exploded over its
    // 2d+1 admissible lengths, equi-join on exact length, verify distance);
    // the oracle is the NAIVE theta join — matching results prove the
    // blocking is lossless (SURVEY.md §4.3(2))
    "q_similarity_blocked" -> ((s, dir) => {
      val prefix = array_join(slice(split(col("text"), " "), 1, 2), " ")
      val a = table(s, dir, "documents")
        .select(col("doc_id").as("id_a"), prefix.as("pa"))
      val b = table(s, dir, "documents")
        .select(col("doc_id").as("id_b"), prefix.as("pb"))
      SimilarityJoin.blockedInnerJoin(a, b, "pa", "pb", 2, "dist",
          dedupKeys = true)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        // materializedOrderBy (r18): the DP-verify map segment otherwise
        // re-executes under the sort's range sampling (small pair result)
        .transform(materializedOrderBy(_, col("id_a"), col("id_b")))
    }),

    // J1 at realistic keys — the scale kernels over the FULL document text
    // (avg ~300 chars, d=4), not a 2-token prefix: this is where blocked
    // and chunk-filter selectivity are measured where they matter. The
    // oracle is the naive theta join with the IMPLIED |Δlen| <= d band
    // materialized first (a sound identity of lev <= d, property-tested in
    // PropertySpec) so DuckDB does ~half a million bounded DPs, not 12M
    // unbounded ones.
    "q_similarity_blocked_full" -> ((s, dir) => {
      val a = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_a"), col("text").as("ta"))
      val b = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_b"), col("text").as("tb"))
      SimilarityJoin.blockedInnerJoin(a, b, "ta", "tb", 4, "dist")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        // materializedOrderBy (r18): the DP-verify map segment otherwise
        // re-executes under the sort's range sampling (small pair result)
        .transform(materializedOrderBy(_, col("id_a"), col("id_b")))
    }),

    "q_similarity_chunked_full" -> ((s, dir) => {
      val a = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_a"), col("text").as("ta"))
      val b = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_b"), col("text").as("tb"))
      SimilarityJoin.chunkedInnerJoin(a, b, "ta", "tb", 4, "dist")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        // materializedOrderBy (r18): the DP-verify map segment otherwise
        // re-executes under the sort's range sampling (small pair result)
        .transform(materializedOrderBy(_, col("id_a"), col("id_b")))
    }),

    // J1 cost-based kernel selection — the engine (not the caller) picks
    // blocked vs chunked from the exact length histograms (one tiny
    // aggregate per side): length concentration is precisely the
    // statistic that sends the blocked kernel quadratic. Both kernels are
    // oracle-proven lossless, so this query hash-matches the SAME
    // banded-naive oracle whichever kernel the estimates select.
    "q_similarity_auto_full" -> ((s, dir) => {
      val a = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_a"), col("text").as("ta"))
      val b = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id").as("id_b"), col("text").as("tb"))
      SimilarityJoin.autoInnerJoin(a, b, "ta", "tb", 4, "dist")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        // materializedOrderBy (r18): the DP-verify map segment otherwise
        // re-executes under the sort's range sampling (small pair result)
        .transform(materializedOrderBy(_, col("id_a"), col("id_b")))
    }),

    // J3/U2/P6/F5 — coalescing left equi-join
    "q_coalesce_join" -> ((s, dir) => {
      val left = table(s, dir, "customer").select(
        col("c_custkey").as("key"), col("c_name"),
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("segment"))
      val right = table(s, dir, "orders").groupBy(col("o_custkey").as("key"))
        .agg(max(col("o_orderpriority")).as("segment"),
          count(lit(1)).as("n_orders"))
        .select(col("key"), col("segment"), col("n_orders"))
      CoalesceJoin.coalesceLeftJoin(left, right, "key", "key")
        .orderBy(col("key"), col("c_name"))
    }),

    // J4/U4 — anti join (customers with no 'P'-status order)
    "q_anti_join" -> ((s, dir) =>
      AntiJoin.antiJoin(table(s, dir, "customer"),
          table(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          "c_custkey", "o_custkey")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // J5 — dynamic join keys + broadcast dim + decimal aggregate
    "q_dynamic_join" -> ((s, dir) => {
      val leftKey = "c_nationkey"; val rightKey = "n_nationkey"
      table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col(leftKey) === col(rightKey))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("total_acctbal"))
        .orderBy(col("n_name"))
    }),

    // skew-salted equi-join: 25 distinct nation keys over 15k customers is
    // the concentrated-key regime (one hot key = one straggler shuffle
    // partition at cluster scale); the salt spreads each key over 8
    // subkeys. Salting is RESULT-invariant, so the oracle is the plain
    // equi-join SQL — the gate proves the spread join changes nothing.
    "q_skew_join" -> ((s, dir) =>
      SkewJoin.saltedInnerJoin(
          table(s, dir, "customer"), table(s, dir, "nation"),
          "c_nationkey", "n_nationkey", salts = 8)
        .select(col("c_custkey"), col("c_name"), col("n_name"))
        .orderBy(col("c_custkey"))),

    // Same hot-key regime, LEFT enrichment shape (fact ⟕ dim): the dim is
    // filtered so a fifth of the fact rows have NO partner and must
    // null-pad — proving the salt preserves left semantics, not just the
    // match set. Oracle: the plain LEFT JOIN SQL.
    "q_skew_left_join" -> ((s, dir) =>
      SkewJoin.saltedLeftJoin(
          table(s, dir, "customer"),
          table(s, dir, "nation").filter(col("n_nationkey") < 20),
          "c_nationkey", "n_nationkey", salts = 8)
        .select(col("c_custkey"), col("c_name"), col("n_name"))
        .orderBy(col("c_custkey"))),

    // A1 — row count
    "q_count" -> ((s, dir) =>
      table(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))),

    // A2/F7 — conditional-count match stats, single pass
    "q_conditional_counts" -> ((s, dir) =>
      table(s, dir, "lineitem").agg(
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        count(when(col("l_returnflag") =!= "R" && col("l_quantity") > 25, 1))
          .as("n_big_other"),
        count(when(when(col("l_linestatus") === "F", lit(null))
          .otherwise(col("l_linestatus")).isNotNull, 1)).as("n_open"))),

    // A3 — per-column sorted distinct-value extraction, one pass per column
    "q_distinct_per_column" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val st = o.agg(array_join(sort_array(collect_set(col("o_orderstatus"))),
          ",").as("distinct_values"))
        .withColumn("column_name", lit("o_orderstatus"))
      val pr = o.agg(array_join(sort_array(collect_set(col("o_orderpriority"))),
          ",").as("distinct_values"))
        .withColumn("column_name", lit("o_orderpriority"))
      st.unionByName(pr).select(col("column_name"), col("distinct_values"))
        .orderBy(col("column_name"))
    }),

    // A4/F8/F9/P5 — arg-min over a rank map (most_recent) + priority
    "q_argmin_recency" -> ((s, dir) => {
      val rank = Seq("2025" -> 1, "2023" -> 2, "2021" -> 3)
      val cols = Seq("SurveyAdmin2025", "SurveyAdmin2023", "SurveyAdmin2021")
      val df = table(s, dir, "orders")
        .withColumn("SurveyAdmin2025",
          when(col("o_orderstatus") === "O", lit("2025")))
        .withColumn("SurveyAdmin2023",
          when(col("o_orderpriority") === "1-URGENT", lit("2023")))
        .withColumn("SurveyAdmin2021", lit("2021"))
        .withColumn("most_recent", Recency.mostRecentCol(cols, rank))
      df.select(col("o_orderkey"), col("most_recent"),
          Recency.priorityCol(col("o_orderstatus"), col("most_recent"), rank,
            Seq("F")).cast("long").as("priority"))
        .orderBy(col("o_orderkey"))
    }),

    // W1 — dense stable row ids via zipWithIndex (no global window)
    "q_rowid" -> ((s, dir) =>
      RowId.withRowId1(table(s, dir, "customer").select(col("c_custkey")),
          "row_id", Seq(col("c_custkey")))
        .orderBy(col("row_id"))),

    // O2 — stable sort, NULLS LAST, order materialized scale-safely
    "q_sort_nulls_last" -> ((s, dir) => {
      val df = table(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", lit(null).cast("long"))
          .otherwise(length(col("o_orderpriority")).cast("long"))
          .as("priority"))
      RowId.withRowId1(df, "sort_rank",
          Seq(col("priority").asc_nulls_last, col("o_orderkey")))
        .orderBy(col("sort_rank"))
    }),

    // U3 — value-level intersect
    "q_intersect" -> ((s, dir) =>
      table(s, dir, "customer").select(col("c_custkey").as("key"))
        .intersect(table(s, dir, "orders").select(col("o_custkey").as("key")))
        .orderBy(col("key"))),

    // U4 — set difference
    "q_except" -> ((s, dir) =>
      table(s, dir, "part").select(col("p_partkey").as("key"))
        .except(table(s, dir, "lineitem").select(col("l_partkey").as("key")))
        .orderBy(col("key"))),

    // F3/F4 — regex extraction + digit keys
    "q_regex_extract" -> ((s, dir) =>
      table(s, dir, "events").select(
        col("event_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("long").as("k_value"),
        regexp_extract(col("event_type"), "^([a-z]+)", 1).as("type_word"))
        .orderBy(col("event_id"))),

    // Semi-structured: JSON extraction from the events props column,
    // aggregated per type (schema-on-read over string payloads)
    "q_json_extract" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // Semi-structured via Spark 4's VARIANT type: parse once, typed-path
    // extraction after (the open-schema ingestion shape — no schema
    // declared up front, binary-encoded storage, pushdown-friendly
    // shredded access in Spark 4.x)
    "q_variant_extract" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", try_variant_get(col("v"), "$.k", "long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // Headline agg: TPC-H Q1 shape, decimal-exact sums
    "q_agg_pricing" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Headline join+agg: revenue per region/nation, broadcast dims
    "q_join_agg_revenue" -> ((s, dir) => {
      // spread (r18): the single-row-group lineitem scan ran the whole
      // 600k-row × 4-broadcast-probe × decimal pipeline on ≤3 tasks
      // (measured 1.2 s CPU on a 3-task stage); the fact side is
      // partition-independent through broadcast joins and partial
      // aggregation, so hashing it wide is result-identical
      val li = spread(table(s, dir, "lineitem"), "l_orderkey")
      val rev = (col("l_extendedprice").cast("decimal(12,2)") *
        (lit(BigDecimal(1)).cast("decimal(12,2)") -
          col("l_discount").cast("decimal(12,2)")))
      li.join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(rev).cast("decimal(18,4)").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Grouping sets: ROLLUP over nation × order status (subtotals + total)
    "q_rollup" -> ((s, dir) =>
      table(s, dir, "orders")
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .orderBy(col("n_name").asc_nulls_last,
          col("o_orderstatus").asc_nulls_last)),

    // Grouping sets: CUBE over status × priority (all subtotal combos)
    "q_cube" -> ((s, dir) =>
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)),

    // Reconciliation: order-independent table fingerprint — compare two
    // copies of a table (engine, cluster, or backup) by shipping 16 bytes
    // instead of the data; one map-side-combined aggregate pass
    "q_table_fingerprint" -> ((s, dir) =>
      // spread (r17): the 600k-row single-row-group lineitem scan ran
      // the per-row md5 on ≤3 tasks (1.2 s CPU-bound); the fingerprint
      // is a partition-independent sum, so hashing at full parallelism
      // is result-identical
      graft.quality.Expectations.tableFingerprint(
        spread(table(s, dir, "lineitem"), "l_orderkey"),
        Seq("l_orderkey", "l_linenumber", "l_quantity"))),

    // Exact per-group percentiles (the sketch queries' ground-truth twin):
    // both engines use the same (n-1)*p linear interpolation over the
    // sorted doubles
    "q_percentile_groups" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("round(percentile(value, 0.5), 6)").as("p50"),
          expr("round(percentile(value, 0.9), 6)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // Grouping sets: the explicit subtotal-combination form (cube/rollup
    // are its sugar); grouping() flags disambiguate subtotal rows from
    // real NULL groups
    "q_grouping_sets" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
              |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
              |  count(*) AS n,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              |    AS total
              |FROM graft_orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
              |  (o_orderstatus), (o_orderpriority))
              |ORDER BY g_status, g_priority, o_orderstatus,
              |  o_orderpriority""".stripMargin)
    }),

    // Unpivot / melt — wide measures to long (variable, value) rows; the
    // inverse of q_pivot. Narrow per-row transform, no shuffle at all.
    "q_unpivot" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount"),
            col("tax")),
          "measure", "val")),

    // Ordered string aggregation (LISTAGG): deterministic via sort-first,
    // independent of partial-agg arrival order
    "q_listagg" -> ((s, dir) =>
      table(s, dir, "nation")
        .join(broadcast(table(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), "|")
          .as("nations"))
        .orderBy(col("r_name"))),

    // Correlation / regression aggregates per group — value vs time-of-day
    // (days since epoch keeps the co-moment arithmetic well-conditioned);
    // both engines use numerically-stable co-moment updates, and the
    // result is rounded before the driver's 4-dp canonicalization
    "q_corr_stats" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("__day", expr("unix_micros(ts)") / lit(86400e6))
        .groupBy(col("event_type"))
        .agg(round(corr(col("value"), col("__day")), 6).as("corr_vt"),
          round(regr_slope(col("value"), col("__day")), 6).as("slope_vt"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // Statistical anomaly detection over aggregates: days whose event
    // count deviates from the type's mean by more than 2 standard
    // deviations. The z² test is done in EXACT integer arithmetic —
    // (c·n − S)² > 4·(SS·n − S²) is |c − μ| > 2σ cleared of denominators —
    // so the flag is portable bit-for-bit (no float thresholds) and the
    // stats side is one tiny broadcast per type.
    "q_outlier_days" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("ss"))
      val dev = col("c") * col("n") - col("s")
      daily.join(broadcast(stats), "event_type")
        .filter(dev * dev > lit(4L) * (col("ss") * col("n") -
          col("s") * col("s")))
        .select(col("event_type"), col("day"), col("c"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Pivot: event counts per day × type (explicit value list)
    "q_pivot" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .orderBy(col("day"))),

    // Window frames: 7-day moving sum over the daily value series
    "q_window_frame" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("daily_value"))
      daily.withColumn("weekly_value",
          sum(col("daily_value")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("day"))
              .rowsBetween(-6, 0)))
        .orderBy(col("day"))
    }),

    // Window navigation: lag/lead/ntile over per-user event sequences
    "q_window_nav" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      table(s, dir, "events").select(
          col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("event_id"))
    }),

    // W2 at scale — top-k per key
    "q_window_topk" -> ((s, dir) =>
      BestMatch.topKPerKey(table(s, dir, "orders"),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("__graft_rank").cast("long").as("rank"))
        .orderBy(col("o_custkey"), col("rank"))),

    // W2 custom-operator scale path — native bounded-heap top-k per key
    // (catalyst/TopKPerKey: logical node + strategy + exec via
    // SparkSessionExtensions); same oracle as the window form proves the
    // partial/final heap kernel row-for-row against row_number
    "q_window_topk_native" -> ((s, dir) =>
      BestMatch.topKPerKeyNative(table(s, dir, "orders"),
          Seq("o_custkey"),
          Seq("o_totalprice" -> false, "o_orderkey" -> true), 3, "rank")
        .select(col("o_custkey"), col("o_orderkey"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))),

    // Streaming batch-equivalent: tumbling daily counts
    "q_events_window" -> ((s, dir) =>
      EventsStream.tumblingCounts(table(s, dir, "events"), "1 day")
        .select(col("window_start"), col("event_type"), col("n_events"))
        .orderBy(col("window_start"), col("event_type"))),

    // Session windows (gap timeout) — native session_window, identical in
    // batch and streaming; oracle is the lag/cumsum formulation
    "q_sessionize" -> ((s, dir) =>
      EventsStream.sessionize(table(s, dir, "events"), "30 minutes")
        .orderBy(col("user_id"), col("session_start"))),

    // Interval join (batch twin of the watermarked stream-stream join in
    // streaming/EventsStream.clickToPurchaseJoin): purchases matched to the
    // same user's clicks in the preceding hour
    "q_interval_join" -> ((s, dir) =>
      EventsStream.clickToPurchaseBatch(table(s, dir, "events"))
        .select(col("purchase_id"), col("click_id"))
        .orderBy(col("purchase_id"), col("click_id"))),

    // Product-analytics: ordered-stage funnel — one groupBy(user) + an
    // ordered fold (no per-stage join passes); the oracle replays the same
    // semantics as a chain of min-after-previous-stage CTEs
    "q_funnel" -> ((s, dir) =>
      Funnel.funnel(table(s, dir, "events"), "user_id", "event_type",
          "ts", "event_id", Seq("signup", "view", "click", "purchase"))
        .orderBy(col("stage_idx"))),

    // Product-analytics: per-user step transition counts (Markov edges) —
    // one window shuffle on the user key
    "q_event_transitions" -> ((s, dir) =>
      Funnel.transitions(table(s, dir, "events"), "user_id", "event_type",
          "ts", "event_id")
        .orderBy(col("prev_type"), col("next_type"))),

    // Product-analytics: weekly cohort retention — distinct (user, week)
    // bounds every shuffle to users x active-weeks
    "q_retention" -> ((s, dir) =>
      Funnel.retention(table(s, dir, "events"), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset"))),

    // Time-series: per-user daily counts with zero-filled calendar gaps —
    // the scaffold explode is bounded by each key's day span
    "q_resample_daily" -> ((s, dir) =>
      TimeSeries.resampleDaily(table(s, dir, "events"), "user_id", "ts")
        .orderBy(col("user_id"), col("day"))),

    // Time-series: calendar-anchored trailing 7-day rolling sum (RANGE
    // frame over epoch-day numbers — missing days still age values out,
    // unlike a ROWS frame); DECIMAL through the frame sum, DOUBLE at the
    // edge
    "q_rolling_range" -> ((s, dir) =>
      TimeSeries.rollingDailySum(table(s, dir, "events"), "user_id", "ts",
          "value", days = 7)
        .orderBy(col("user_id"), col("day"))),

    // Warehouse: SCD2 / gaps-and-islands — consecutive equal event_type
    // runs per user collapsed to validity intervals; two windows + one
    // aggregate, no self-joins
    "q_scd2" -> ((s, dir) =>
      TimeSeries.scd2(table(s, dir, "events"), "user_id", "ts", "event_id",
          "event_type")
        .orderBy(col("user_id"), col("valid_from"))),

    // Warehouse: point-in-time SCD2 lookup — every event joined to the
    // dimension version valid at its timestamp (equi-join on the key,
    // interval predicate as a cheap residual; no range-join machinery)
    "q_scd2_lookup" -> ((s, dir) => {
      val events = table(s, dir, "events")
      val dim = TimeSeries.scd2(events, "user_id", "ts", "event_id",
        "event_type")
      TimeSeries.scd2Lookup(
          events.select(col("event_id"), col("user_id"), col("ts")),
          dim, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("attr"),
          col("valid_from"))
        .orderBy(col("event_id"))
    }),

    // Product-analytics: most-common session paths (30-min inactivity gap,
    // same rule as q_sessionize), deterministic (count desc, path) top-20
    "q_session_paths" -> ((s, dir) =>
      Funnel.sessionPaths(table(s, dir, "events"), "user_id", "event_type",
        "ts", "event_id")),

    // Range join — same-user event pairs within 5 minutes, binned into an
    // equi-join (3x replication) instead of a quadratic theta join; the
    // oracle is the naive inequality join
    "q_range_join" -> ((s, dir) =>
      RangeJoin.timeProximitySelfJoin(table(s, dir, "events"),
          "user_id", "ts", "event_id", 300L)
        .orderBy(col("id_a"), col("id_b"))),

    // As-of join — each event matched to the customer's latest order at or
    // before the event time; union+window composition, DuckDB ASOF oracle
    "q_asof_join" -> ((s, dir) => {
      val latestPerDate = table(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asofLeftJoin(
          table(s, dir, "events").select("event_id", "user_id", "ts"),
          latestPerDate, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // As-of join with tolerance (pandas merge_asof parity) — matches
    // further than 30 days from the event are treated as no match
    "q_asof_tolerance" -> ((s, dir) => {
      val latestPerDate = table(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asofLeftJoin(
          table(s, dir, "events").select("event_id", "user_id", "ts"),
          latestPerDate, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey"), toleranceSeconds = Some(30L * 86400))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // As-of join, forward direction — each event matched to the customer's
    // earliest order at or after the event time
    "q_asof_forward" -> ((s, dir) => {
      val earliestPerDate = table(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asofLeftJoin(
          table(s, dir, "events").select("event_id", "user_id", "ts"),
          earliestPerDate, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey"), direction = "forward")
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Sketches: HLL distinct (Apache DataSketches) + approximate
    // percentiles next to their exact counterparts (rows-only; ScalaTest
    // asserts the error bounds — sketch impls differ engine to engine, so
    // no DuckDB oracle)
    "q_sketch_agg" -> ((s, dir) =>
      table(s, dir, "events").agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("hll_users"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile_approx(value, 0.5, 1000)").as("p50_approx"))),

    // Sketches #0: the EXACT half of q_sketch_agg split out so the driver's
    // DuckDB oracle can hash-check it (the approx half stays rows-only —
    // sketch impls differ engine to engine). Median is computed over
    // micro-unit BIGINTs so the 0.5-interpolation is exact integer midpoint
    // arithmetic on both engines (floor, not round: round-half rules differ).
    "q_sketch_exact" -> ((s, dir) =>
      table(s, dir, "events").agg(
        countDistinct(col("user_id")).as("exact_users"),
        expr("percentile(CAST(floor(value * 1e6) AS BIGINT), 0.5)")
          .as("p50_micro"))),

    // Sketches #4 (r10): the determinism-pinned twin that retires the GK
    // half of q_sketch_agg's rows-only adjudication. percentile_approx is
    // order-dependent ONLY through partial-summary merge order, so ONE
    // partition in sorted order makes the Greenwald-Khanna summary a pure
    // function of the multiset — and the oracle bit-replays it (head
    // buffer flush cycles + compressImmut + the query walk, exact to the
    // returned sample's double bits; tools/gen_sketch_oracle.py).
    // approx_count_distinct rides along via the existing HLL++ replay.
    // This query is the correctness probe for the GK algebra — the SCALE
    // shape (multi-partition merge) stays q_sketch_agg's, untouched.
    "q_sketch_pinned" -> ((s, dir) =>
      table(s, dir, "events")
        .repartition(1).sortWithinPartitions(col("value"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          count(col("value")).as("n_vals"),
          expr("percentile_approx(value, 0.5, 1000)").as("p50_approx"))),

    // Sketches #5 (r11): the SCALE shape of approximate percentile,
    // pinned. q_sketch_pinned replays the GK algebra under a ONE-sorted-
    // partition pin — correct but serial. This twin is the shape a
    // 100 TB job runs: fixed-literal range buckets (boundaries from a
    // prior profile pass — floor(value/40.0) clamped to [0,15]), ONE
    // exact per-bucket count aggregate, then the GK summary built only
    // on the bucket containing the global target rank, queried at the
    // rank-adjusted quantile phi = (rank − cum_before)/n_bucket. Rank
    // arithmetic over the buckets is exact integer math, the one local
    // summary is single-sorted-partition pinned (≈ n/k rows, a bounded
    // task at any corpus size — deepen the bucketing to shrink it), so
    // the whole distributed percentile is a pure function of the
    // multiset and the DuckDB oracle bit-replays it end to end
    // (tools/gen_sketch_oracle.py gen_bucketed_sql, incl. the
    // phi-edge shortcuts QuantileSummaries.query takes). The collect is
    // the ≤16-row bucket-count table — a bounded manifest read.
    "q_sketch_bucketed" -> ((s, dir) => {
      val ev = table(s, dir, "events").filter(col("value").isNotNull)
        .select(col("value"),
          // clamp on the LONG floor result BEFORE the int cast: a value
          // ≥ ~2^31·40 would wrap negative under cast-then-clamp and
          // silently land in bucket 0 while the oracle's CAST raises
          least(greatest(floor(col("value") / lit(40.0)), lit(0L)),
            lit(15L)).cast("int").as("b"))
      val counts = ev.groupBy(col("b")).agg(count(lit(1)).as("n"))
        .orderBy(col("b")).collect()
      val nTotal = counts.map(_.getLong(1)).sum
      if (nTotal == 0L)
        // empty input: phi below would be 0/0 = NaN and percentile_approx
        // rejects a NaN percentage at analysis time — emit the same
        // all-NULL row the DuckDB oracle produces on zero rows instead
        s.range(1).select(
          lit(null).cast("long").as("n_vals"),
          lit(null).cast("int").as("target_bucket"),
          lit(0L).as("n_bucket"),
          lit(null).cast("double").as("p50_bucketed"))
      else {
        val rk = math.ceil(0.5 * nTotal).toLong
        var cumBefore = 0L
        var tb = -1
        var nB = 0L
        val it = counts.iterator
        while (tb < 0 && it.hasNext) {
          val r = it.next()
          if (cumBefore + r.getLong(1) >= rk) { tb = r.getInt(0); nB = r.getLong(1) }
          else cumBefore += r.getLong(1)
        }
        val phi = (rk - cumBefore).toDouble / nB.toDouble
        // CAST('<repr>' AS DOUBLE): shortest round-trip decimal recovers
        // phi's exact bits on both engines (plain decimal literals parse
        // as DECIMAL and change rounding)
        ev.filter(col("b") === tb).select(col("value"))
          .repartition(1).sortWithinPartitions(col("value"))
          .agg(count(lit(1)).as("n_bucket"),
            expr(s"percentile_approx(value, CAST('$phi' AS DOUBLE), 1000)")
              .as("p50_bucketed"))
          .select(lit(nTotal).as("n_vals"), lit(tb).as("target_bucket"),
            col("n_bucket"), col("p50_bucketed"))
      }
    }),

    // Sketches #3: mergeability — the property that makes sketches work at
    // scale: per-day HLL sketches union to the exact-window estimate
    // without re-reading the raw data. HASH-CHECKED since r10: the whole
    // union pipeline is order-independent (coupons are a SET below the
    // 384-coupon promotion bound; above it the union result is flagged
    // out-of-order, so the estimate is the COMPOSITE estimator — a pure
    // function of the max-per-slot register array), and the oracle
    // bit-replays DataSketches HLL end to end: murmur128(seed 9001)
    // coupons, the CouponMapping cubic interpolation, and the composite
    // estimator with its interpolation X-table and harmonic-number
    // bitmap estimate (tools/gen_sketch_oracle.py, constants dumped from
    // the real jar; StreamingSpec additionally pins the union estimate
    // against exact distinct)
    "q_sketch_merge" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(date_trunc("week", col("ts")).as("week"),
          date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy(col("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_weekly_users"),
          count(lit(1)).as("n_days"))
        .orderBy(col("week"))
    }),

    // Sketches #2: count-min frequency estimates for the known event types
    // (the sketch is a driver-mergeable KB-sized summary, so reading it on
    // the driver is the intended use). Oracle-checked: CMS with a fixed
    // seed is deterministic integer math — the oracle replays Spark's
    // Murmur3_x86_32 (4-byte LE blocks + per-tail-byte full mix rounds,
    // seed chain h1=murmur(v,42), h2=murmur(v,h1)), the depth-7/width-2000
    // geometry of (eps=0.001, confidence=0.99), and the min-over-rows
    // collision sums in DuckDB HUGEINT arithmetic.
    "q_sketch_cms" -> ((s, dir) => {
      import s.implicits._
      val cms = table(s, dir, "events").stat.countMinSketch(
        col("event_type"), eps = 0.001, confidence = 0.99, seed = 42)
      Seq("click", "error", "purchase", "signup", "view")
        .map(t => (t, cms.estimateCount(t)))
        .toDF("event_type", "approx_n")
        .orderBy(col("event_type"))
    }),

    // LLM: exact dedup by content hash
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(table(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("text_hash"))),

    // LLM: within-group word-set Jaccard near-dup pairs
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsWithinGroupPrefix(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", "source", 0.9)
        .orderBy(col("id_a"), col("id_b"))),

    // LLM: MinHash+LSH near-dup pairs — HASH-CHECKED since r8: the oracle
    // bit-replays XXH64 signatures + Murmur3 band keys in DuckDB
    // (resources/oracles/q_dedup_minhash.sql); ScalaTest additionally
    // proves candidates ⊆ naive and measures recall
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(spread(table(s, dir, "documents"), "doc_id"), "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // LLM: SimHash hamming<=3 near-dup pairs — HASH-CHECKED since r8
    // (bit-replay oracle, resources/oracles/q_dedup_simhash.sql)
    "q_dedup_simhash" -> ((s, dir) =>
      // spread (r18): the single-row-group scan ran the tokenize +
      // 64-bit-vote signature aggregate single-task; row-local work, so
      // results are identical
      Dedup.simhashPairs(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", 3)
        .orderBy(col("id_a"), col("id_b"))),

    // LLM: near-dup pairs → dedup clusters via min-label connected
    // components (oracle: recursive-CTE transitive closure in DuckDB;
    // ScalaTest additionally checks against local union-find)
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsWithinGroupPrefix(spread(table(s, dir, "documents"), "doc_id"),
        "doc_id", "text", "source", 0.9)
      Dedup.connectedComponents(pairs).orderBy(col("id"))
    }),

    // LLM: SemDeDup — semantic dedup of the embedded corpus (sign-bit
    // cells bound the pair space, exact cosine verifies, CC picks the
    // kept representative); oracle replays cells + closure in DuckDB
    "q_semantic_dedup" -> ((s, dir) =>
      Dedup.semanticDedup(spread(table(s, dir, "embeddings"), "vec_id"),
          "vec_id", "embedding", 0.35, bits = 8)
        .orderBy(col("id"))),

    // LLM: multi-signal dedup — the lexical (prefix-filtered Jaccard)
    // and semantic (sign-cell cosine) duplicate signals fused into ONE
    // duplicate graph before clustering, keyed by the shared doc/vec id
    // space: a chain that is text-dup on one hop and embedding-dup on
    // the next collapses to one representative. Hash-checked: both pair
    // CTEs + the closure replay in DuckDB
    "q_multisignal_dedup" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      val embs = spread(table(s, dir, "embeddings"), "vec_id")
      val textPairs = Dedup.jaccardPairsWithinGroupPrefix(docs,
          "doc_id", "text", "source", 0.9)
        .select(col("id_a"), col("id_b"))
      val semPairs = Dedup.semanticPairs(embs, "vec_id", "embedding",
          0.35, bits = 8)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(textPairs.unionByName(semPairs))
        .orderBy(col("id"))
    }),

    // LLM: incremental semantic dedup — new embeddings probe a STORED
    // sign-cell index at O(batch) (the embedding twin of the MinHash /
    // substring incremental paths); hash-checked: cells + cosine gate
    // replay in DuckDB
    "q_semantic_incremental" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      val newBatch = emb.filter(col("vec_id") % 10 === 0)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      // deterministic scratch index path, cleared up-front (the
      // q_similarity_ingest discipline: repeated gate runs reuse ONE
      // location instead of leaking a copy per invocation); checkout- and
      // sfDir-scoped via scratchPath so concurrent graft JVMs in other
      // checkouts can't clear it mid-run
      val idx = scratchPath("q_semidx", dir)
      deleteRecursively(idx)
      Dedup.writeSemanticIndex(corpus, "vec_id", "embedding", idx, bits = 6)
      Dedup.semanticNewVsIndex(newBatch, idx, "vec_id", "embedding",
          0.3, bits = 6)
        .select(col("new_id"), col("corpus_id"))
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // LLM: the embedding twin of q_similarity_ingest — exactly-once
    // semantic-dedup gate over the stored sign-cell index, 3
    // micro-batches with a mid-stream compaction. HASH-CHECKED: the
    // sequential gate replays in one DuckDB statement (oracle below);
    // StreamingSpec pins the crash/replay semantics
    "q_embedding_ingest" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // checkout- and sfDir-scoped gate state (see scratchPath): cleared
      // up-front, rebuilt by the 3-batch replay below each invocation
      val state = scratchPath("q_embingest", dir)
      deleteRecursively(state)
      for (b <- 0L to 2L) {
        graft.streaming.EmbeddingIngest.applyBatch(s, state,
          emb.filter(col("vec_id") % 3 === b), b, "vec_id", "embedding")
        if (b == 1L)
          graft.streaming.EmbeddingIngest.compactIndexes(s, state)
      }
      graft.streaming.EmbeddingIngest.accepted(s, state)
        .select(col("vec_id"), lit("accepted").as("status"))
        .unionByName(graft.streaming.EmbeddingIngest.quarantined(s, state)
          .select(col("vec_id"), col("reason").as("status")))
        .orderBy(col("vec_id"))
    }),

    // Streaming: exactly-once incremental materialized-view maintenance
    // over a plain parquet sink (r13 — the last test-only exactly-once
    // surface, now under the driver's hash gate like the other two
    // streaming gates). Three micro-batches merge into the per-key
    // summary; batch 1 is REPLAYED (the idempotent-sink no-op) and a
    // crash between the swap's two renames is simulated before batch 2
    // (the repair path must restore the parked view before merging).
    // The oracle replays the whole ledger sequence as one grouped
    // aggregate — merging per-batch decimal sums is associative, so the
    // hash check proves replay + repair changed NOTHING.
    "q_summary_maintenance" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val state = scratchPath("q_summaint", dir)
      deleteRecursively(state)
      def batch(b: Long) = ev.filter(pmod(col("event_id"), lit(3)) === b)
      for (b <- 0L to 2L) {
        SummaryMaintenance.applyBatch(s, state, batch(b), b,
          Seq("event_type"), "value")
        if (b == 1L) {
          // same-run replay of the committed batch: must no-op
          SummaryMaintenance.applyBatch(s, state, batch(1L), 1L,
            Seq("event_type"), "value")
          // crash between the two swap renames: data parked at __graft_old
          val root = new org.apache.hadoop.fs.Path(state)
          val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
          val data = new org.apache.hadoop.fs.Path(root, "data")
          val old = new org.apache.hadoop.fs.Path(root, "data.__graft_old")
          require(fs.rename(data, old), "crash simulation rename failed")
        }
      }
      SummaryMaintenance.readSummary(s, state).get
        .select(col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Streaming: the object-store DEFAULT commit mode under the hash
    // gate (r17, VERDICT #1 — swap is gated by q_summary_maintenance
    // and pointer+bucketed by q_summary_bucketed, but the UN-bucketed
    // pointer arm — the first mode real object-store users run — had
    // only spec coverage). Four micro-batches at retainVersions=2 (a
    // deeper-than-default retain-N GC cycle: versions beyond the three
    // newest are collected while the batches land), with a same-run
    // replay of batch 1 and a TORN pointer flip after batch 2 (the
    // truncated record is unparsable by construction — no terminator —
    // and batch 3's commit must repair from the highest stamped
    // data.v* dir before merging). The oracle replays the whole ledger
    // as one grouped aggregate: replay + torn-flip repair + GC must
    // change NOTHING or the hash fails.
    "q_summary_pointer" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val state = scratchPath("q_sumpointer", dir)
      deleteRecursively(state)
      def batch(b: Long) = ev.filter(pmod(col("event_id"), lit(4)) === b)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s,
            SummaryMaintenance.RetainVersionsKey, "2") {
          for (b <- 0L to 3L) {
            SummaryMaintenance.applyBatch(s, state, batch(b), b,
              Seq("event_type"), "value")
            if (b == 1L) {
              // same-run replay of the committed batch: must no-op
              SummaryMaintenance.applyBatch(s, state, batch(1L), 1L,
                Seq("event_type"), "value")
            }
            if (b == 2L) {
              // crash mid-flip: _current truncated to a terminator-less
              // prefix of the record ("data.v" — not even a legacy
              // shape, which requires digits naming the highest stamp)
              val root = new org.apache.hadoop.fs.Path(state)
              val fs = root.getFileSystem(
                s.sparkContext.hadoopConfiguration)
              val out = fs.create(
                new org.apache.hadoop.fs.Path(root, "_current"), true)
              try out.write("data.v".getBytes("UTF-8"))
              finally out.close()
            }
          }
          SummaryMaintenance.readSummary(s, state).get
            .select(col("event_type"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("event_type"))
        }
      }
    }),

    // Streaming: the O(one-bucket) keyed SERVING path under the hash
    // gate (r17, VERDICT #3): build a 16-bucket pointer-mode summary
    // over user_id, then serve ten keys through readSummaryKey — each
    // lookup resolves the manifest, recomputes the key's bucket
    // DRIVER-side from the _schema stamp (zero jobs), and scans ONLY
    // that bucket's mapped leaf (the one-leaf files-read pin lives in
    // ScaleSpec). The oracle is the whole-ledger aggregate filtered to
    // the served keys: bucket pruning must be invisible to the result.
    "q_summary_lookup" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val state = scratchPath("q_sumlookup", dir)
      deleteRecursively(state)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey,
            "16") {
          for (b <- 0L to 2L)
            SummaryMaintenance.applyBatch(s, state,
              ev.filter(pmod(col("event_id"), lit(3)) === b), b,
              Seq("user_id"), "value")
          // both serving APIs under one gate: five point lookups, then
          // the other five through the batched form (grouped by bucket,
          // each distinct leaf scanned once)
          (0L to 4L).map(k =>
              SummaryMaintenance.readSummaryKey(s, state,
                Seq("user_id"), Seq(k)))
            .reduce(_ unionByName _)
            .unionByName(SummaryMaintenance.readSummaryKeys(s, state,
              Seq("user_id"), (5L to 9L).map(Seq(_))))
            .select(col("user_id"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("user_id"))
        }
      }
    }),

    // Streaming: the SCALE form of the materialized view under the same
    // hash gate (r16, VERDICT #1 — the pointer/bucketed commit modes
    // previously had only spec coverage, no CORRECTNESS row). Pointer
    // mode + 16 hash buckets, keyed on user_id (~thousands of keys, so
    // the buckets genuinely shard): four micro-batches where batch 2 is
    // deliberately NARROW (a user_id slice) so the final manifest mixes
    // part versions — untouched buckets must still read from their old
    // part dirs — plus a replay of batch 1 (idempotent no-op) and a
    // TORN pointer flip before batch 3 (the repair must re-publish the
    // highest #end-complete manifest before merging). The oracle
    // replays the whole ledger as one grouped aggregate: the merge is
    // associative, so replay + torn-flip repair + bucket routing must
    // change NOTHING or the hash fails.
    "q_summary_bucketed" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val state = scratchPath("q_sumbucket", dir)
      deleteRecursively(state)
      def part(b: Long) = ev.filter(pmod(col("event_id"), lit(3)) === b)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey, "16") {
          val batches = Seq(
            0L -> part(0L),
            1L -> part(1L),
            2L -> part(2L).filter(col("user_id") < 50),
            3L -> part(2L).filter(col("user_id") >= 50))
          for ((id, b) <- batches) {
            SummaryMaintenance.applyBatch(s, state, b, id,
              Seq("user_id"), "value")
            if (id == 1L) {
              // same-run replay of the committed batch: must no-op
              SummaryMaintenance.applyBatch(s, state, b, 1L,
                Seq("user_id"), "value")
            }
            if (id == 2L) {
              // crash mid-flip: _current truncated to a prefix of the
              // record — unparsable by construction (no terminator),
              // repaired by batch 3's commit from the highest complete
              // manifest
              val root = new org.apache.hadoop.fs.Path(state)
              val fs = root.getFileSystem(
                s.sparkContext.hadoopConfiguration)
              val out = fs.create(
                new org.apache.hadoop.fs.Path(root, "_current"), true)
              try out.write("manifest.v".getBytes("UTF-8"))
              finally out.close()
            }
          }
          SummaryMaintenance.readSummary(s, state).get
            .select(col("user_id"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("user_id"))
        }
      }
    }),

    // Streaming: COMPOSITE-key maintenance + serving under the hash
    // gate (r17): the bucket hash folds (event_type, user_id) IN ORDER
    // on both the commit and serving sides, and the merge groups on
    // both columns — three batches, then ten multi-key tuples served
    // through the batched lookup (each tuple cast to its stamped type,
    // routed to its one bucket leaf). The oracle filters the
    // whole-ledger two-column aggregate to the served tuples: a
    // key-order or hash-order slip returns the wrong (or no) rows.
    "q_summary_multikey" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("value"))
      val state = scratchPath("q_summultikey", dir)
      deleteRecursively(state)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey,
            "16") {
          for (b <- 0L to 2L)
            SummaryMaintenance.applyBatch(s, state,
              ev.filter(pmod(col("event_id"), lit(3)) === b), b,
              Seq("event_type", "user_id"), "value")
          val tuples = for {
            t <- Seq("click", "error"); u <- 0L to 4L
          } yield Seq(t, u)
          SummaryMaintenance.readSummaryKeys(s, state,
              Seq("event_type", "user_id"), tuples)
            .select(col("event_type"), col("user_id"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("event_type"), col("user_id"))
        }
      }
    }),

    // Streaming: live-image COMPACTION under the hash gate (r17): four
    // bucketed batches where 1-3 touch only ONE key's bucket (leaving a
    // multi-part-dir closure with superseded leaves), compactSummary
    // folds the closure into one part.c image at the committed id, the
    // compacted id is REPLAYED (must no-op against the compaction
    // image), and two more batches merge on top of it. The oracle is
    // the whole-ledger aggregate: compaction is pure re-layout, so it
    // must be invisible to the data or the hash fails.
    "q_summary_compact" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val state = scratchPath("q_sumcompact", dir)
      deleteRecursively(state)
      val oneType = ev.select(col("event_type")).orderBy(col("event_type"))
        .limit(1).collect()(0).getString(0)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey,
            "16") {
          // disjoint covering batches; 1-2 are localized to one key so
          // the closure at id 2 spans part dirs (something to fold)
          val batches = Seq(
            0L -> ev.filter(pmod(col("event_id"), lit(2)) === 0),
            1L -> ev.filter(pmod(col("event_id"), lit(2)) === 1 &&
              pmod(col("event_id"), lit(8)) < 3 &&
              col("event_type") === oneType),
            2L -> ev.filter(pmod(col("event_id"), lit(2)) === 1 &&
              pmod(col("event_id"), lit(8)) >= 3 &&
              col("event_type") === oneType),
            3L -> ev.filter(pmod(col("event_id"), lit(2)) === 1 &&
              col("event_type") =!= oneType))
          for ((id, b) <- batches) {
            SummaryMaintenance.applyBatch(s, state, b, id,
              Seq("event_type"), "value")
            if (id == 2L) {
              SummaryMaintenance.compactSummary(s, state)
              // checkpoint replay of the compacted id: must no-op
              SummaryMaintenance.applyBatch(s, state, b, 2L,
                Seq("event_type"), "value")
            }
          }
          SummaryMaintenance.readSummary(s, state).get
            .select(col("event_type"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("event_type"))
        }
      }
    }),

    // Streaming: the checkpoint-preserving MIGRATION between commit
    // protocols under the hash gate (r16): two batches land in default
    // swap mode, reshardToBuckets routes the summary into a fresh
    // 8-bucket pointer-mode dir carrying the committed id, the
    // PRE-reshard batch is replayed against the new dir (must no-op —
    // lineage continuity is the whole point), and two more batches
    // merge bucketed. The oracle is the whole-ledger aggregate: if the
    // re-shard re-aggregated rows, dropped a bucket, or broke the
    // stamp carry-over, the hash fails.
    "q_summary_reshard" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val plain = scratchPath("q_sumreshard_src", dir)
      val shard = scratchPath("q_sumreshard_dst", dir)
      deleteRecursively(plain)
      deleteRecursively(shard)
      def part(b: Long) = ev.filter(pmod(col("event_id"), lit(4)) === b)
      for (b <- 0L to 1L)
        SummaryMaintenance.applyBatch(s, plain, part(b), b,
          Seq("user_id"), "value")
      SummaryMaintenance.reshardToBuckets(s, plain, shard,
        Seq("user_id"), 8)
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey, "8") {
          // the checkpoint's replay of the pre-reshard batch: no-op
          SummaryMaintenance.applyBatch(s, shard, part(1L), 1L,
            Seq("user_id"), "value")
          for (b <- 2L to 3L)
            SummaryMaintenance.applyBatch(s, shard, part(b), b,
              Seq("user_id"), "value")
          SummaryMaintenance.readSummary(s, shard).get
            .select(col("user_id"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("user_id"))
        }
      }
    }),

    // Streaming: SCHEMA EVOLUTION through the migration path under the
    // hash gate (r17): the _schema sidecar deliberately fences a
    // renamed key column at commit time, so the legitimate rename path
    // is reshardToBuckets' renameCols arm — data and stamp renamed
    // together into a fresh dir at the carried id. Two swap-mode
    // batches keyed by event_type, migrate with event_type→category
    // into 8 buckets, replay the pre-migration batch RENAMED (must
    // no-op), merge two more renamed batches, and serve five keys
    // through the batched lookup under the NEW name. The oracle is the
    // whole-ledger aggregate aliased to the new name: the rename must
    // be invisible to the data or the hash fails.
    "q_summary_evolve" -> ((s, dir) => {
      import graft.streaming.SummaryMaintenance
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val plain = scratchPath("q_sumevolve_src", dir)
      val shard = scratchPath("q_sumevolve_dst", dir)
      deleteRecursively(plain)
      deleteRecursively(shard)
      def part(b: Long) = ev.filter(pmod(col("event_id"), lit(4)) === b)
      def renamedPart(b: Long) =
        part(b).withColumnRenamed("event_type", "category")
      for (b <- 0L to 1L)
        SummaryMaintenance.applyBatch(s, plain, part(b), b,
          Seq("event_type"), "value")
      SummaryMaintenance.reshardToBuckets(s, plain, shard,
        Seq("category"), 8, Map("event_type" -> "category"))
      graft.Util.withSessionConf(s, SummaryMaintenance.CommitModeKey,
          "pointer") {
        graft.Util.withSessionConf(s, SummaryMaintenance.BucketsKey, "8") {
          // the checkpoint's replay of the pre-migration batch arrives
          // RENAMED (the restarted stream maintains the new key): no-op
          SummaryMaintenance.applyBatch(s, shard, renamedPart(1L), 1L,
            Seq("category"), "value")
          for (b <- 2L to 3L)
            SummaryMaintenance.applyBatch(s, shard, renamedPart(b), b,
              Seq("category"), "value")
          // serve part of the ledger through the keyed path under the
          // new name, the rest through the full read — both must agree
          // with the oracle's single aggregate
          val keys = SummaryMaintenance.readSummary(s, shard).get
            .select(col("category")).orderBy(col("category")).limit(2)
            .collect().map(_.getString(0)).toSeq
          SummaryMaintenance.readSummaryKeys(s, shard, Seq("category"),
              keys.map(Seq(_)))
            .unionByName(SummaryMaintenance.readSummary(s, shard).get
              .filter(!col("category").isin(keys: _*)))
            .select(col("category"), col("n_events"),
              col("sum_value").cast("double").as("sum_value"))
            .orderBy(col("category"))
        }
      }
    }),

    // LLM: model-based quality filter (fastText/DCLM-shaped linear
    // classifier inference over hashed token features; deterministic
    // stand-in weights so the oracle replays the whole score)
    "q_quality_classifier" -> ((s, dir) =>
      QualityClassifier.score(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", QualityClassifier.hashWeights(s, 4096), 4096)
        .orderBy(col("id"))),

    // LLM: positional inverted index over the corpus (term -> df, total
    // tf, ordered "doc:pos" postings) — the persistent retrieval artifact
    // behind BM25 and phrase lookups
    "q_inverted_index" -> ((s, dir) =>
      Bm25.invertedIndex(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", minDf = 3L)
        // materializedOrderBy (r18): the postings aggregate otherwise
        // re-runs under the sort's range sampling (profiled as two
        // ~0.5 CPU-s copies of the same agg stage)
        .transform(materializedOrderBy(_, col("term")))),

    // LLM: brute-force cosine top-5 for 10 query vectors
    "q_embed_cosine_topk" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: embedding-cosine near-dup pairs, exact (oracle-checked; ids
    // only — cosine values are float-sum order-sensitive across engines).
    // Bounded to 1000 vectors: the exact form is inherently quadratic and
    // exists as the oracle-checked ground truth; LSH/IVF are the scale path
    "q_embed_neardup_exact" -> ((s, dir) =>
      Similarity.allPairsAbove(
          spread(table(s, dir, "embeddings").filter(col("vec_id") < 1000), "vec_id"),
          "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))),

    // LLM: IVF (KMeans-cell) approximate top-k, the second ANN scale path
    // — HASH-CHECKED since r9: the seeded quantizer (md5 trainSample,
    // java LCG shuffle, 5 Lloyd rounds) replays in DuckDB
    // (tools/gen_ann_oracle.py); ScalaTest additionally pins recall
    "q_embed_ann_ivf" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: the same IVF search against a PERSISTED index — build once
    // (centroids + cell-partitioned corpus), probe many times reading
    // only the nprobe nearest cell partitions. Hash-checked since r9
    // via the in-memory sibling's replayed oracle (the persisted probe
    // is result-identical to the in-memory path, which LlmSpec pins
    // along with the PartitionFilters pruning)
    "q_embed_ann_ivf_index" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      // index built once per (JVM, sfDir) in the session-scoped fixture —
      // this lambda times the probe path only, matching the operator's
      // "build once, probe at nprobe/nlist cost" claim
      val idx = ivfIndexFixture(s, dir)
      Similarity.ivfTopKVsIndex(emb.filter(col("vec_id") < 10), idx,
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: embedding scalar quantization (the faiss SQ8 shape) — per-dim
    // ranges from one posexplode aggregate (dimension-sized → broadcast),
    // codes are fixed-order double math + floor, bit-identical on any
    // engine, so the 4× ANN-storage compression oracle-checks exactly
    "q_embed_quantize" -> ((s, dir) =>
      Quantize.quantize8(spread(table(s, dir, "embeddings"), "vec_id"),
          "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim"))),

    // LLM: per-label embedding centroids (IVF coarse-quantizer / class
    // prototype building block) — shuffle carries labels x dim partial
    // sums, independent of corpus size
    "q_embed_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(table(s, dir, "embeddings"), "label",
          "embedding")
        .orderBy(col("label"), col("pos"))),

    // LLM: temperature-scaled source mixture weights (alpha = 0.5) — the
    // standard multi-source pretraining sampling recipe; one corpus
    // aggregate, normalization windows run over stratum-count rows
    "q_mixture_weights" -> ((s, dir) =>
      Mixture.mixtureWeights(table(s, dir, "documents"), "source",
          Mixture.tokenCount(col("text")), alpha = 0.5)
        .orderBy(col("source"))),

    // LLM: product-quantization ANN (hash-checked since r9 via the same
    // quantizer replay; planted-duplicate recall tested in LlmSpec) —
    // 32-bit codes + per-query ADC lookup tables;
    // the third ANN regime next to LSH (bucket pruning) and IVF (cell
    // pruning): compression makes the exhaustive scan itself cheap
    "q_embed_ann_pq" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: the same ADC scan against a PERSISTED index (r17 — the
    // artifact pqTopK's Scaladoc promises: codebooks + 32-bit codes on
    // disk, probes never touch the raw vectors). Result-identical to
    // the in-memory path (shared encode/lookup expressions, LlmSpec
    // parity pin), so it shares q_embed_ann_pq's replayed oracle.
    "q_embed_ann_pq_index" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      val idx = pqIndexFixture(s, dir)
      Similarity.pqTopKVsIndex(emb.filter(col("vec_id") < 10), idx,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: the PQ deployment users actually serve (r17, VERDICT #8 —
    // the raw ADC scan above was gated, the rerank composition was
    // not): ADC shortlist of 20, then EXACT cosine on only those 20
    // rows per query, top-5 — approximation error shrinks to
    // shortlist-recall error while the exact math never touches the
    // corpus. Hash-checked end to end: the oracle replays the seeded
    // quantizer, the ADC shortlist, AND the exact-cosine rerank in
    // Spark's own op order (tools/gen_ann_oracle.py).
    "q_embed_ann_pq_rerank" -> ((s, dir) => {
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      Similarity.pqTopKReranked(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "vec_id", "embedding", k = 5, shortlist = 20)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LLM: LSH-bucketed ANN pairs (hash-checked since r9 — seed-42
    // hyperplanes replayed from the JVM, buckets + exact-order cosine
    // verify in DuckDB; recall additionally tested vs brute force).
    // The synthetic embeddings are fully random (max pairwise cosine ~0.5),
    // so the threshold sits where real pairs exist.
    "q_embed_ann_lsh" -> ((s, dir) =>
      Similarity.lshPairsAbove(spread(table(s, dir, "embeddings"), "vec_id"),
          "vec_id", "embedding", threshold = 0.4)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))),

    // LLM: quantile-threshold quality gate — keep each source's top 75% by
    // lexical-diversity score. percent_rank under a unique (score, id)
    // order is (rank−1)/(n−1): int/int division, bit-identical on any
    // engine, so the cut line is portable with no float-threshold drift.
    // The window is PER SOURCE (shard) — parallelism is the shard count,
    // the packing-stage shape; a GLOBAL percentile cut at corpus scale
    // should threshold on approx quantiles instead (one aggregate pass).
    "q_quality_filter" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val scored = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") / size(toks))
          .as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      scored.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") <= 0.75)
        .orderBy(col("doc_id"))
    }),

    // LLM: text quality signals
    "q_text_quality" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      table(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(TextFunctions.regexTokens(col("text"))).cast("long")
          .as("n_regex_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        TextFunctions.avgTokenLength(toks).as("avg_token_len"),
        TextFunctions.stopwordRatio(toks).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),

    // LLM: composite quality score (micro-units: floor(raw*1e6) is
    // bit-stable across engines where round-half rules are not)
    "q_quality_score" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        floor(TextFunctions.qualityScoreRaw(col("text")) * lit(1e6))
          .cast("long").as("quality_micro"))
        .orderBy(col("doc_id"))),

    // LLM: incremental dedup — which new-batch docs duplicate the corpus
    // (per-ingest shape). HASH-CHECKED since r8: the oracle reuses the
    // q_dedup_minhash bit-replay with a new-vs-corpus tail
    // (tools/gen_incremental_oracle.py)
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      val newBatch = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.minhashLshNewVsCorpus(newBatch, corpus, "doc_id", "text")
        .select(col("new_id"), col("corpus_id"))
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // LLM: pathologically DENSE new-vs-corpus probe — every "new" doc is
    // a one-token edit of a corpus doc, so true-pair multiplicity (the
    // quantity the PPJoin positional filter bounds) dominates the
    // candidate stage. Registry-grade on purpose (r14, VERDICT #6): the
    // bench's shape-drift byte table carries this query's shuffle rows,
    // so a kernel change that silently loses the positional filter shows
    // up as candidate-row inflation in `shape_drift`, not as a slower
    // wall someone has to adjudicate. Hash-checked against an exact
    // Jaccard oracle.
    "q_dedup_dense_probe" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("text"))
      // batch = a fifth of the corpus, each doc a one-token edit of its
      // source: 100% of the batch is a true near-dup, so candidate
      // multiplicity — not batch size — dominates, which is the planted
      // pathology. The corpus side stays FULL so the kernel runs its
      // real new-vs-corpus shape at the benched SF.
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zzdense")).as("text"))
      Dedup.jaccardNewVsCorpusPrefix(batch, docs, "doc_id", "text", 0.8)
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // Streaming similarity ingest gate, batch-replay form — documents
    // arrive as 3 micro-batches through the exactly-once gate: MinHash
    // near-dup + substring-saturation probes against BOTH stored indexes
    // (saturation coverage includes same-batch smaller-id owners since
    // r9 — the intra-batch stitched-doc pass), quarantine on hit,
    // accepted docs indexed for later batches. Output:
    // final per-doc disposition. HASH-CHECKED since r8: the whole
    // sequential gate — bootstrap self-dedup, both per-batch probes with
    // near_dup priority, per-batch intra-dedup components — replays in
    // ONE DuckDB statement over the bit-replayed MinHash machinery
    // (tools/gen_ingest_oracle.py); StreamingSpec pins replay no-op and
    // crash-window convergence, which the replay can't see.
    "q_similarity_ingest" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      // deterministic state path, cleared up-front: repeated gate runs
      // (Bench runs each query twice per round) reuse ONE location
      // instead of leaking a fresh temp corpus copy per invocation.
      // checkout- and sfDir-scoped via scratchPath, so only two JVMs
      // sharing one checkout could race it — run those sequentially
      val state = scratchPath("q_simingest", dir)
      deleteRecursively(state)
      for (b <- 0L to 2L) {
        graft.streaming.SimilarityIngest.applyBatch(s, state,
          docs.filter(col("doc_id") % 3 === b), b, "doc_id", "text")
        // fold batches 0..1 into the compacted base mid-stream: batch 2
        // must probe the folded indexes and produce identical verdicts
        // (the long-running-ingest small-files fix, exercised in-gate)
        if (b == 1L)
          graft.streaming.SimilarityIngest.compactIndexes(s, state)
      }
      graft.streaming.SimilarityIngest.accepted(s, state)
        .select(col("doc_id"), lit("accepted").as("status"))
        .unionByName(graft.streaming.SimilarityIngest.quarantined(s, state)
          .select(col("doc_id"), col("reason").as("status")))
        .orderBy(col("doc_id"))
    }),

    // LLM: EXACT incremental dedup — the lossless ingest gate (prefix-
    // filtered Jaccard, new batch × corpus, no LSH recall loss; the
    // minhash variant above is the recall-traded scale path). r12: the
    // corpus side is the STORED prefix index (built once per JVM+sfDir by
    // the fixture, the production per-ingest shape), so the measured cost
    // is the O(batch) probe. Oracle unchanged — the result is
    // prep-invariant: the naive cross join with the implied size band
    // materialized.
    "q_dedup_incremental_exact" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      val newBatch = docs.filter(col("doc_id") % 10 === 0)
      Dedup.jaccardNewVsCorpusPrefixStored(s,
          exactPrefixIndexFixture(s, dir), newBatch, "doc_id", "text", 0.9)
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // LLM: the dedup end product — corpus minus non-representative cluster
    // members (oracle: recursive-CTE closure → drop id <> comp)
    "q_dedup_corpus" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      val pairs = Dedup.jaccardPairsWithinGroupPrefix(docs,
        "doc_id", "text", "source", 0.9)
      Dedup.dedupedCorpus(docs, "doc_id", pairs)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // SQL front end: the same engine surface via raw SQL text over temp
    // views (Catalyst parses/optimizes identically to the DataFrame API)
    "q_sql_segment_rollup" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("graft_orders_v")
      table(s, dir, "customer").createOrReplaceTempView("graft_customer_v")
      s.sql("""SELECT c_mktsegment, o_orderpriority, count(*) AS n,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              |FROM graft_orders_v JOIN graft_customer_v
              |  ON o_custkey = c_custkey
              |GROUP BY c_mktsegment, o_orderpriority
              |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)
    }),

    // LLM: marker-token language/domain ID heuristic
    "q_text_langid" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val a = size(filter(toks,
        t => t.isin("table", "row", "column"))).cast("long")
      val b = size(filter(toks,
        t => t.isin("stream", "batch", "window"))).cast("long")
      table(s, dir, "documents").select(
        col("doc_id"), a.as("score_a"), b.as("score_b"),
        when(a > b, lit("tabular")).when(b > a, lit("streaming"))
          .otherwise(lit("und")).as("predicted"))
        .orderBy(col("doc_id"))
    }),

    // LLM: TF-IDF top-3 terms per document — corpus statistics feeding the
    // native bounded-heap top-k (score in micro-units; the tf·idf product
    // is a fixed-order IEEE expression, bit-identical across engines)
    "q_tfidf_topterms" -> ((s, dir) => {
      val scored = TextFunctions.tfidf(table(s, dir, "documents"),
        "doc_id", "text")
      BestMatch.topKPerKeyNative(scored, Seq("doc_id"),
          Seq("tfidf" -> false, "term" -> true), 3, "rank")
        .select(col("doc_id"), col("rank"), col("term"),
          floor(col("tfidf") * lit(1e6)).cast("long").as("score_micro"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // LLM: global vocabulary top-20 (hash agg + TakeOrdered — no full sort)
    "q_vocab_topk" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)),

    // Data-quality gate: Deequ-style expectations, ONE aggregate pass for
    // all checks; metrics are exact so the report oracle-checks
    "q_quality_checks" -> ((s, dir) => {
      import graft.quality.Expectations._
      check(table(s, dir, "orders"), Seq(
        Expectation("orderkey_complete", Completeness("o_orderkey"), 1.0, 1.0),
        Expectation("orderkey_unique", Uniqueness("o_orderkey"), 1.0, 1.0),
        Expectation("price_positive", MinOf("o_totalprice"), 0.0, 1e18),
        Expectation("price_mean_band", MeanOf("o_totalprice"), 1e4, 1e6),
        Expectation("custkey_spread", Uniqueness("o_custkey"), 0.01, 1.0)))
    }),

    // LLM: the whole training-data preparation flow as one DAG — clean →
    // quality filter → exact dedup → near-dup clusters → pack; the oracle
    // replays every stage in one DuckDB statement (recursive CTE for the
    // clustering), so the END-TO-END composition hash-checks, not just the
    // stages
    "q_training_pipeline" -> ((s, dir) =>
      // clean_text (r12: now part of prepare's output) is selected away
      // here: the oracle replays the manifest columns, and the text
      // column's regex arithmetic is already hash-checked by q_text_clean
      graft.pipeline.TrainingData.prepare(
          spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", "source")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
        .orderBy(col("doc_id"))),

    // LLM: sliding-window chunking — context-window prep (64-token chunks,
    // 16-token overlap); every chunk past the first carries new tokens,
    // short docs pass through whole. Narrow per-row explode, no shuffle.
    "q_chunk_documents" -> ((s, dir) =>
      TextFunctions.chunkDocuments(table(s, dir, "documents"),
          "doc_id", "text", maxTokens = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // LLM: sequence packing — contiguous fill into 256-token training bins
    // per source shard (keyed window cumsum, no global sort)
    "q_pack_sequences" -> ((s, dir) => {
      val sized = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      TextFunctions.packBins(sized, "doc_id", "n_tokens", "source", 256L)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    // LLM: multimodal resize + frame sampling (stub codecs, but the stubs
    // are deterministic integer/hash math, so both oracle-check exactly:
    // decimated byte counts + scaled dims here, per-chunk FNV-1a
    // fingerprints below — DuckDB replays FNV in HUGEINT mod-2^64)
    "q_multimodal_resize" -> ((s, dir) =>
      Multimodal.resize(
          Multimodal.withFakeMedia(table(s, dir, "documents"), "text"),
          "doc_id", factor = 2)
        .toDF()
        .select(col("id"), col("width"), col("height"),
          length(col("data")).cast("long").as("n_bytes"))
        .orderBy(col("id"))),

    // LLM: the REAL javax.imageio resize arm, hash-checked end-to-end
    // (r12 — the registry's q_multimodal_resize exercises the stub arm;
    // until now the real arm was pinned only by LlmSpec). Each doc gets a
    // deterministic synthetic PNG (pixel (x,y) = syntheticRgb(d,x,y),
    // dims d%13+4 × d%9+3), routed through resize(factor=2) — the PNG
    // magic selects the real decode→decimate→re-encode arm — and the
    // output PNG is DECODED BACK to a position-weighted pixel sum. PNG is
    // lossless RGB, so the oracle needs no codec: it replays the pixel
    // function at the decimated coordinates (x·2, y·2) in BIGINT SQL. A
    // stub-routed payload would emit decimated PNG bytes that do not
    // decode → the (-1,-1,-1) sentinel → loud hash mismatch, so a green
    // row PROVES the real arm ran on every doc.
    "q_multimodal_resize_real" -> ((s, dir) => {
      import s.implicits._
      // spread BEFORE the per-row codec work (r17, guide §2): the
      // single-row-group scan plus javax.imageio encode/decode/resize
      // otherwise runs as ONE task (measured 2×~2 s single-task stages —
      // the orderBy's range-bounds sampling re-executes the fused map);
      // the row-local pixel math is partition-independent, so results
      // are bit-identical
      val media = spread(table(s, dir, "documents").select(col("doc_id")),
          "doc_id").as[Long]
        .mapPartitions(_.map { d =>
          val w = (d % 13 + 4).toInt
          val h = (d % 9 + 3).toInt
          (d, Multimodal.syntheticPng(d, w, h), w, h)
        })
        .toDF("doc_id", "data", "w", "h")
        .select(col("doc_id"), struct(
          col("data"),
          struct(lit("image/png").as("format"), col("w").as("width"),
            col("h").as("height")).as("meta")).as("media"))
      Multimodal.resize(media, "doc_id", factor = 2)
        .map { r =>
          val (dw, dh, sum) = Multimodal.decodedChecksum(r.data)
            .getOrElse((-1, -1, -1L))
          (r.id, dw, dh, sum)
        }
        .toDF("id", "width", "height", "pix_sum")
        // materializedOrderBy (r18): the imageio encode/decode/resize
        // otherwise re-executes under the sort's range sampling
        .transform(materializedOrderBy(_, col("id")))
    }),

    // LLM: the REAL javax.sound WAV arm, hash-checked end-to-end (r12 —
    // q_audio_windows exercises the stub arm on text payloads). Each doc
    // gets a hand-built RIFF/PCM16 payload (44-byte canonical header +
    // d%37+20 samples from an integer recurrence); the WAVE magic routes
    // realWavSamples, and the oracle replays the sample arithmetic with
    // the header NOT counted. The stub arm on this payload would consume
    // the 22 header byte-pairs as samples too (different n_samples AND
    // sums in every window), so a green row proves the javax.sound
    // branch decoded every payload.
    "q_audio_windows_real" -> ((s, dir) => {
      import s.implicits._
      // deliberately NOT spread (r17): unlike the imageio arm, the WAV
      // decode path hits javax.sound's synchronized provider discovery,
      // and 32 concurrent tasks contend on that global lock — measured
      // 0.84 s single-task vs 2.15 s spread across 32 tasks. The
      // single-task shape is the faster one for this codec.
      val media = table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { d =>
          (d, Multimodal.syntheticWav(d, (d % 37 + 20).toInt))
        })
        .toDF("doc_id", "data")
        .select(col("doc_id"), struct(
          col("data"),
          struct(lit("audio/wav").as("format"), lit(0).as("width"),
            lit(0).as("height")).as("meta")).as("media"))
      Multimodal.audioWindows(media, "doc_id")
        .toDF()
        .select(col("id"), col("win"), col("n_samples"), col("sum_abs"))
        // materializedOrderBy (r18): the single-task javax.sound decode
        // otherwise runs TWICE (sort range sampling) — the decode is the
        // whole query cost, so this halves it
        .transform(materializedOrderBy(_, col("id"), col("win")))
    }),

    "q_frame_samples" -> ((s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.withFakeMedia(table(s, dir, "documents"), "text"),
          "doc_id", frames = 4)
        .toDF()
        .select(col("id"), col("frame"), col("fingerprint"))
        .orderBy(col("id"), col("frame"))),

    // LLM corpus hygiene: C4-style duplicated-segment removal — fixed
    // 10-word segments stand in for lines; any segment occurring > 2 times
    // corpus-wide is dropped from every doc, survivors reassembled in order
    "q_segment_dedup" -> ((s, dir) =>
      CorpusHygiene.dedupSegments(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", w = 10, maxOcc = 2)
        .orderBy(col("doc_id"))),

    // LLM: URL/domain hygiene (r11) — C4-style domain rollup + blocklist.
    // The fixture texts carry no URLs, so each doc gets two synthetic
    // mentions appended (97 .org domains, 13 .net domains of which 7 are
    // blocklisted) — the extraction, per-domain rollup, and broadcast
    // anti-join all fire for real and the oracle replays them exactly.
    "q_url_domains" -> ((s, dir) => {
      // the fixture exercises every extraction arm under the hash check:
      // lowercase scheme, UPPERCASE scheme (r12 — case-insensitive
      // match), and a userinfo URL (r12 — user@ must not be captured as
      // the host)
      val docs = table(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" see https://D"),
          pmod(col("doc_id"), lit(97)).cast("string"),
          lit(".example.org/p and http://m"),
          pmod(col("doc_id"), lit(13)).cast("string"),
          lit(".example.net/q plus HTTP://U"),
          pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".EXAMPLE.COM/r and http://user@w"),
          pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".example.org/s")).as("text"))
      CorpusHygiene.domainStats(docs, "doc_id", "text",
          blocklist = (0 until 7).map(i => s"m$i.example.net"))
        .orderBy(col("domain"))
    }),

    // LLM corpus hygiene: benchmark contamination — corpus docs sharing any
    // word 4-gram with the (broadcast) eval slice, with the shared count
    "q_contamination" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      CorpusHygiene.contamination(
          docs.filter(col("doc_id") % 19 =!= 0),
          docs.filter(col("doc_id") % 19 === 0),
          "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    }),

    // LLM: reproducible subsetting — hash-based sampling and train/val/test
    // split assignment. md5 of the id is engine-portable and row-local:
    // no RNG state, no shuffle, same subset on any engine or cluster size,
    // stable under re-runs and backfills (the properties seeded `sample()`
    // lacks). Hex-string range cuts ≈ 12.5% sample and ≈ 80/10/10 splits.
    "q_sample_hash" -> ((s, dir) =>
      table(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    "q_split_assign" -> ((s, dir) => {
      val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
      table(s, dir, "documents").select(
        col("doc_id"),
        when(h2 < "cd", lit("train"))
          .when(h2 < "e6", lit("val"))
          .otherwise(lit("test")).as("split"))
        .orderBy(col("doc_id"))
    }),

    // LLM: domain mixing — per-source keep-fractions via the deterministic
    // md5 cut (up-sample curated strata, down-sample crawl; same subset on
    // any engine/cluster, stable under backfills)
    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedHashSample(table(s, dir, "documents"),
          "doc_id", "source", Map("src0" -> 0.5, "src1" -> 0.25),
          default = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // LLM: importance (soft) sampling — keep-rate proportional to doc
    // length with a 0.1 floor, decided by the deterministic md5 cut
    // (monotone in the rate, so curation thresholds tune without churn)
    "q_importance_sample" -> ((s, dir) =>
      Sampling.importanceSample(table(s, dir, "documents"), "doc_id",
          least(lit(1.0), greatest(lit(0.1), col("n_chars") / lit(400.0))))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // LLM: deterministic proportional interleave (training curriculum
    // order) — virtual time (k+1)/weight under a per-source md5 shuffle;
    // sorting by it streams sources in weight proportion with no RNG and
    // no shuffle buffer. vt in micro-units: fixed-order double math.
    "q_interleave" -> ((s, dir) =>
      Sampling.interleaveKey(table(s, dir, "documents"),
          "doc_id", "source", Map("src0" -> 3.0, "src1" -> 1.0))
        .select(col("doc_id"), col("source"), col("k"),
          floor(col("__vt") * lit(1e6)).cast("long").as("vt_micro"))
        .orderBy(col("doc_id"))),

    // LLM: fixed-size stratified sample — EXACTLY 30 docs per source,
    // deterministic md5 order, via the native bounded-heap top-k (only
    // <= k rows per key per partition reach the shuffle; no window sort)
    "q_sample_fixed_per_stratum" -> ((s, dir) => {
      val keyed = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      BestMatch.topKPerKeyNative(keyed, Seq("source"),
          Seq("h" -> true, "doc_id" -> true), 30, "rank")
        .select(col("doc_id"), col("source"), col("rank"))
        .orderBy(col("doc_id"))
    }),

    // LLM: Gopher/C4-style repetition signals — exact per-doc bigram
    // counts (total / distinct / top occurrence) from one sorted-array
    // fold; the duplicate- and top-n-gram fractions derive from these ints
    "q_text_repetition" -> ((s, dir) => {
      // spread (r17): the per-row n-gram HOF ran single-task on the
      // one-row-group scan, twice (orderBy range sampling re-executes
      // the fused map) — 2×0.65 s; row-local, so results are identical
      val rep = TextFunctions.ngramRepetition(col("text"), 2)
      spread(table(s, dir, "documents"), "doc_id").select(col("doc_id"),
          rep.getField("total").as("n_grams"),
          rep.getField("n_distinct").as("n_distinct"),
          rep.getField("top_count").as("top_count"))
        // materializedOrderBy (r18): the HOF fold otherwise re-executes
        // under the sort's range sampling (500-row result)
        .transform(materializedOrderBy(_, col("doc_id")))
    }),

    // LLM: cleaning pass — normalization + PII redaction (the synthetic
    // fixture gets an email/phone suffix appended so the redaction path
    // actually fires rather than matching nothing)
    "q_text_clean" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.normalizeText(col("text")).as("normalized"),
        TextFunctions.redactPii(
          concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@example.com or 12345678"))).as("redacted"))
        .orderBy(col("doc_id"))),

    // LLM: deterministic document fingerprint (8-token prefix)
    "q_text_fingerprint" -> ((s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        md5(array_join(slice(TextFunctions.tokens(col("text")), 1, 8), " "))
          .as("prefix_fp"))
        .orderBy(col("doc_id"))),

    // LLM: multimodal binary plumbing — payload + typed metadata
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.withFakeMedia(table(s, dir, "documents"), "text")
        .select(col("doc_id"),
          length(col("media.data")).cast("long").as("n_bytes"),
          col("media.meta.width").cast("long").as("width"),
          ascii(col("text")).cast("long").as("first_char"))
        .orderBy(col("doc_id"))),

    // LLM: stubbed decode → features via partition-wise batches. The
    // normalized float32 histogram is made oracle-exact by recovering the
    // integer bin counts: round(feature·n) undoes the L1 normalization
    // losslessly (float32 relative error ≪ 0.5 of a count), so the compare
    // is on exact ints, not cross-engine float bits.
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
          Multimodal.withFakeMedia(table(s, dir, "documents"), "text"),
          "doc_id")
        .toDF()
        .select(col("id"), col("n_bytes").cast("long").as("n_bytes"),
          posexplode(col("feature")))
        .select(col("id"), col("n_bytes"),
          col("pos").cast("long").as("bin"),
          round(col("col").cast("double") * col("n_bytes"))
            .cast("long").as("cnt"))
        .orderBy(col("id"), col("bin"))),

    // LLM: audio feature extraction (r11) — 16 fixed windows of summed
    // absolute PCM16 amplitude per payload. The registry fixture routes
    // the STUB arm (payloads are UTF-8 text, not WAV), whose
    // byte-pair-to-sample arithmetic is exact integer math the oracle
    // replays bit-for-bit; the REAL javax.sound WAV arm behind the same
    // API is pinned in LlmSpec against a generated PCM WAV. The
    // printable-ASCII filter (both sides) makes the oracle's
    // char-code == byte equivalence hold BY CONSTRUCTION, not by
    // fixture luck — a future non-ASCII document drops out of both
    // engines identically instead of silently diverging. Anchors are
    // \A..\z, not ^..$: Java's $ matches before a trailing newline
    // while DuckDB's RE2 $ is end-of-text, so a text ending in '\n'
    // would pass only the Spark filter under ^..$.
    "q_audio_windows" -> ((s, dir) =>
      Multimodal.audioWindows(
          Multimodal.withFakeMedia(
            table(s, dir, "documents")
              .filter(col("text").rlike("\\A[\\x20-\\x7e]*\\z")), "text"),
          "doc_id")
        .toDF()
        .select(col("id"), col("win"), col("n_samples"), col("sum_abs"))
        .orderBy(col("id"), col("win"))),

    // S1/S4 — the reference's CSV front door (varinfo-update.R:54,150) made
    // driver-visible: round-trip `documents` through the single-file RFC-4180
    // sink and the multiLine reader, then fingerprint the text. The oracle
    // computes the same md5 straight from parquet, so a hash-match PROVES the
    // CSV round-trip is lossless (quotes, embedded newlines, empty vs NA).
    "q_csv_roundtrip" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      // scratchPath discipline like every other stored-state query (r13
      // review): a fixed path let verify (sf0.01) and bench (sf0.1) from
      // one checkout clobber each other's staged CSV mid-roundtrip
      val path = scratchPath("q_csv_roundtrip", dir) + ".csv"
      graft.io.Csv.writeSingle(docs, path)
      graft.io.Csv.readAsStrings(s, path)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          md5(coalesce(col("text"), lit(""))).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // LLM: exact substring dedup, stats half (Lee et al. 2022 semantics as
    // hash aggregates, not a suffix array) — per-doc counts of 8-token
    // windows whose exact text recurs anywhere in the corpus; hash-checked
    // against DuckDB replaying every window
    "q_substring_dup_stats" -> ((s, dir) =>
      SubstringDedup.duplicatedWindowStats(
          spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", k = 8)
        .orderBy(col("doc_id"))),

    // LLM: exact substring dedup, rewrite half — every duplicated 8-token
    // span cut from all but its canonical (min doc,pos) occurrence,
    // overlapping spans merged per doc. Spans shuffle as 8-byte window
    // hashes; hash-checked (the oracle replays the span cut with an
    // ordered string_agg) + LlmSpec naive cross-check
    "q_substring_dedup" -> ((s, dir) =>
      SubstringDedup.dedupSubstrings(
          spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", k = 8)
        .orderBy(col("doc_id"))),

    // LLM: incremental substring dedup — a new batch probed against the
    // corpus's stored window-hash index (two hash joins on one 8-byte
    // column; per-batch cost, zero corpus recompute); corpus windows cut
    // everywhere, intra-batch dups keep their canonical occurrence
    "q_substring_incremental" -> ((s, dir) => {
      val docs = spread(table(s, dir, "documents"), "doc_id")
      // stored-index fixture built once per session (see
      // substringIndexFixture) so this measures the PROBE path only
      val path = substringIndexFixture(s, dir)
      SubstringDedup.dedupSubstringsVsIndex(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", 8, path)
        .orderBy(col("doc_id"))
    }),

    // LLM: bigram-LM quality scoring (CCNet/KenLM pattern) — add-one
    // smoothed corpus bigram stats, per-doc mean ln P(w|u) summed as
    // exact integer micros (order-independent, so the float oracle
    // compare can't flake on partial-agg order); the context table
    // broadcasts (vocabulary-sized), the corpus-growing bigram table
    // joins by shuffle
    "q_ngram_lm_score" -> ((s, dir) =>
      NgramLm.scoreDocs(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    // LLM: BPE merge-rule training — 24 deterministic merges learned from
    // the word-frequency table (count desc, pair-lexicographic ties).
    // HASH-CHECKED since r8: the greedy rounds replay as a staged CTE
    // chain in DuckDB (tools/gen_bpe_oracle.py — binary VARCHAR order ==
    // utf8Compare tie-break); LlmSpec additionally cross-checks
    // distributed == driver fast path == local reference
    "q_bpe_merges" -> ((s, dir) =>
      BpeTrain.merges(table(s, dir, "documents"), "text", nMerges = 24)
        .orderBy(col("rank"))),

    // Data catalog: one-pass column profile (row/null/distinct counts +
    // min/max; timestamps as epoch micros) — ONE scan, one multi-distinct
    // aggregate, plan-side reshape to a row per column
    "q_profile_table" -> ((s, dir) =>
      graft.quality.Profile.profile(table(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
            "l_shipdate"))
        .orderBy(col("column"))),

    // Data catalog at corpus scale: the same profile with HLL++ distinct
    // estimates (exactDistinct = false) — a true single no-Expand pass,
    // flat in the column count. HASH-CHECKED since r9: the oracle
    // bit-replays Spark's HyperLogLog++ (XXH64 per input type incl.
    // IEEE-754 double bits in SQL arithmetic, p=9 registers, linear
    // counting / bias interpolation / raw regimes — all three exercised
    // by these five columns; tools/gen_hll_oracle.py, verified against
    // decompiled bytecode). OpsSpec additionally bounds every estimate
    // within 5% of exact.
    "q_profile_table_approx" -> ((s, dir) =>
      graft.quality.Profile.profile(table(s, dir, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
            "l_shipdate"), exactDistinct = false)
        .orderBy(col("column"))),

    // Data catalog: fixed-width value histogram — single hash aggregate
    // on floor(v / width), no bounds pre-scan
    "q_histogram" -> ((s, dir) =>
      graft.quality.Profile.histogram(table(s, dir, "lineitem"),
          "l_extendedprice", width = 5000.0)
        .orderBy(col("bucket"))),

    // CDC / reconciliation: row-level diff of two keyed snapshots (added /
    // removed / changed via one full-outer join + null-safe struct
    // compare); pairs with the versioned store + table fingerprint
    "q_table_diff" -> ((s, dir) => {
      val orders = table(s, dir, "orders")
      val oldSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      val newSnap = orders.filter(col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      graft.quality.TableDiff.diff(oldSnap, newSnap, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // LLM: BPE encode — apply the learned merges to the corpus; pieces
    // computed once per DISTINCT word (chained greedy folds on the
    // vocabulary table), broadcast-joined back to the token stream.
    // HASH-CHECKED since r8 (the 16-round training prefix + per-word
    // piece counts replay in DuckDB: tools/gen_bpe_oracle.py); LlmSpec
    // additionally == local encode
    "q_bpe_encode" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val rules = BpeTrain.merges(docs, "text", nMerges = 16)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      BpeTrain.encode(docs, "doc_id", "text", rules)
        .orderBy(col("doc_id"))
    }),

    // Retrieval: Okapi BM25 against a bag-of-words query — the lexical
    // baseline next to the ANN index; query-term df table broadcast,
    // per-term scores floored to exact micros so the sum is
    // order-independent and the whole score oracle-checks
    "q_bm25_score" -> ((s, dir) =>
      Bm25.score(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", Seq("hash", "join", "vector", "stream"))
        .orderBy(col("doc_id"))),

    // Retrieval: hybrid search — BM25 top-20 (TakeOrdered, no global
    // window sort) fused with cosine top-20 by reciprocal-rank fusion;
    // the two reciprocal terms add in fixed order, so the fused score
    // oracle-checks exactly
    "q_hybrid_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lexTop = Bm25.score(spread(table(s, dir, "documents"), "doc_id"),
          "doc_id", "text", Seq("hash", "join", "vector", "stream"))
        .orderBy(col("bm25_micros").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("bm25_micros").desc, col("doc_id"))))
      val emb = spread(table(s, dir, "embeddings"), "vec_id")
      val sem = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 7),
          emb, "vec_id", "vec_id", "embedding", 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Bm25.rrfFuse(lexTop.select(col("doc_id"), col("rank")), sem,
          "doc_id", "rank")
        .select(col("doc_id"), col("rank_lex").cast("long").as("rank_lex"),
          col("rank_sem").cast("long").as("rank_sem"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // LLM/corpus analytics: PMI collocations over adjacent token pairs —
    // three hash aggregates + two vocabulary-sized broadcast joins; the
    // fixed-order double expression replays bit-for-bit in the oracle
    "q_token_pmi" -> ((s, dir) =>
      NgramLm.pmiCollocations(spread(table(s, dir, "documents"), "doc_id"),
          "text", minCount = 20L)
        .orderBy(col("u"), col("w")))
  )

  def oracleSql: Map[String, String] = Map(
    // r10: bit-replays of DataSketches HLL (coupon/composite estimators)
    // and the pinned Greenwald-Khanna summary — see
    // tools/gen_sketch_oracle.py for the decompiled-bytecode provenance
    "q_sketch_merge" -> resourceSql("q_sketch_merge"),
    "q_sketch_pinned" -> resourceSql("q_sketch_pinned"),
    "q_sketch_bucketed" -> resourceSql("q_sketch_bucketed"),

    "q_sketch_exact" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        |  quantile_cont(CAST(floor(value * 1e6) AS BIGINT), 0.5) AS p50_micro
        |FROM events""".stripMargin,

    "q_quality_filter" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, score,
        |    percent_rank() OVER (
        |      PARTITION BY source ORDER BY score DESC, doc_id) AS pr
        |  FROM scored)
        |SELECT doc_id, source, score, pr FROM r
        |WHERE pr <= 0.75 ORDER BY doc_id""".stripMargin,

    "q_outlier_days" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS ss
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, CAST(d.c AS BIGINT) AS c
        |FROM daily d JOIN stats USING (event_type)
        |WHERE (d.c*n - s)*(d.c*n - s) > 4*(ss*n - s*s)
        |ORDER BY 1, 2""".stripMargin,

    "q_segment_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(floor((pos - 1) / 10) AS BIGINT) AS idx,
        |         string_agg(w, ' ' ORDER BY pos) AS seg
        |  FROM toks GROUP BY doc_id, floor((pos - 1) / 10)),
        |counts AS (SELECT seg, count(*) AS cnt FROM segs GROUP BY seg),
        |kept AS (
        |  SELECT s.doc_id, s.idx, s.seg FROM segs s
        |  JOIN counts c USING (seg) WHERE c.cnt <= 2)
        |SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS text_clean
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Same synthetic URL injection as the Spark side (pmod == % on the
    // non-negative doc_id), same RE2-compatible extraction regex, same
    // lowercasing; the blocklist is the NOT IN list (domains never null).
    "q_url_domains" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' see https://D' || (doc_id % 97)
        |         || '.example.org/p and http://m' || (doc_id % 13)
        |         || '.example.net/q plus HTTP://U' || (doc_id % 7)
        |         || '.EXAMPLE.COM/r and http://user@w' || (doc_id % 5)
        |         || '.example.org/s' AS text
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lower(unnest(regexp_extract_all(
        |    text, '(?i)https?://(?:[^/@ \t\n\r\f]*@)?([A-Za-z0-9.-]+)', 1)))
        |    AS domain
        |  FROM t)
        |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_mentions
        |FROM h
        |WHERE domain NOT IN ('m0.example.net', 'm1.example.net',
        |  'm2.example.net', 'm3.example.net', 'm4.example.net',
        |  'm5.example.net', 'm6.example.net')
        |GROUP BY domain ORDER BY domain""".stripMargin,

    "q_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, pos, w,
        |    lead(w, 1) OVER win AS w1, lead(w, 2) OVER win AS w2,
        |    lead(w, 3) OVER win AS w3
        |  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |grams AS (
        |  SELECT DISTINCT doc_id, concat_ws(' ', w, w1, w2, w3) AS g
        |  FROM l WHERE w3 IS NOT NULL),
        |evalg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 19 = 0)
        |SELECT c.doc_id, count(*) AS n_shared
        |FROM grams c JOIN evalg e USING (g)
        |WHERE c.doc_id % 19 <> 0
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q_similarity_blocked_full" ->
      """WITH cand AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND length(b.text) BETWEEN length(a.text) - 4 AND length(a.text) + 4)
        |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(ta, tb) <= 4
        |ORDER BY id_a, id_b""".stripMargin,

    "q_similarity_chunked_full" ->
      """WITH cand AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND length(b.text) BETWEEN length(a.text) - 4 AND length(a.text) + 4)
        |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(ta, tb) <= 4
        |ORDER BY id_a, id_b""".stripMargin,

    // same banded-naive oracle as the blocked/chunked forms: the chooser
    // may pick either kernel and must still hash-match it exactly
    "q_similarity_auto_full" ->
      """WITH cand AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.text AS ta, b.text AS tb
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND length(b.text) BETWEEN length(a.text) - 4 AND length(a.text) + 4)
        |SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(ta, tb) <= 4
        |ORDER BY id_a, id_b""".stripMargin,

    // Oracle reads the SAME text straight from parquet; a hash match proves
    // the engine's CSV write->read round-trip changed nothing.
    "q_csv_roundtrip" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
        |  md5(coalesce(text, '')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_union_by_name" ->
      """SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey, CAST(NULL AS VARCHAR), 'supplier' FROM supplier
        |ORDER BY src, key""".stripMargin,

    "q_limit_head" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1",

    "q_select_anyof" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey",

    "q_filter_null_in" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_n FROM orders
        |WHERE coalesce(nullif(o_orderstatus, 'O') NOT IN ('F'), TRUE)
        |  AND o_orderpriority <> '5-LOW'
        |ORDER BY o_orderkey""".stripMargin,

    "q_replace_na" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'P'), o_orderpriority) AS status_filled,
        |  coalesce(nullif(o_orderstatus, 'P'), '') AS na_to_empty
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_conditional_priority" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN -1
        |       ELSE length(o_orderpriority) END AS priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_similarity_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |     m AS (SELECT DISTINCT p_name AS q_name FROM part)
        |SELECT n.p_name, m.q_name,
        |  CAST(levenshtein(n.p_name, m.q_name) AS BIGINT) AS string_distance
        |FROM n LEFT JOIN m ON levenshtein(n.p_name, m.q_name) <= 3
        |ORDER BY p_name, q_name NULLS LAST""".stripMargin,

    "q_similarity_chunked" ->
      """WITH p AS (SELECT doc_id,
        |    array_to_string((string_split(text, ' '))[1:2], ' ') AS pre
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
        |FROM p a JOIN p b
        |  ON a.doc_id < b.doc_id AND levenshtein(a.pre, b.pre) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_similarity_blocked" ->
      """WITH p AS (SELECT doc_id,
        |    array_to_string((string_split(text, ' '))[1:2], ' ') AS pre
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
        |FROM p a JOIN p b
        |  ON a.doc_id < b.doc_id AND levenshtein(a.pre, b.pre) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_best_match" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |     m AS (SELECT DISTINCT p_name AS q_name FROM part),
        |pairs AS (
        |  SELECT n.p_name, m.q_name,
        |    CAST(levenshtein(n.p_name, m.q_name) AS BIGINT) AS string_distance
        |  FROM n LEFT JOIN m
        |    ON levenshtein(n.p_name, m.q_name) <= 6 AND n.p_name <> m.q_name)
        |SELECT p_name, q_name, string_distance FROM pairs
        |QUALIFY row_number() OVER (PARTITION BY p_name
        |  ORDER BY string_distance ASC NULLS LAST, q_name ASC NULLS LAST) = 1
        |ORDER BY p_name""".stripMargin,

    "q_coalesce_join" ->
      """WITH l AS (SELECT c_custkey AS key, c_name,
        |             nullif(c_mktsegment, 'BUILDING') AS segment FROM customer),
        |     r AS (SELECT o_custkey AS key, max(o_orderpriority) AS segment,
        |             count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT coalesce(l.key, r.key) AS key, l.c_name,
        |  coalesce(l.segment, r.segment) AS segment, r.n_orders
        |FROM l LEFT JOIN r ON l.key = r.key
        |ORDER BY key, c_name""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderstatus = 'P' AND o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_dynamic_join" ->
      """SELECT n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_skew_join" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_skew_left_join" ->
      """SELECT c_custkey, c_name, n_name
        |FROM customer LEFT JOIN
        |  (SELECT * FROM nation WHERE n_nationkey < 20) n
        |  ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_count" -> "SELECT count(*) AS n_rows FROM lineitem",

    "q_conditional_counts" ->
      """SELECT
        |  count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
        |  count(CASE WHEN l_returnflag <> 'R' AND l_quantity > 25 THEN 1 END) AS n_big_other,
        |  count(CASE WHEN nullif(l_linestatus, 'F') IS NOT NULL THEN 1 END) AS n_open
        |FROM lineitem""".stripMargin,

    "q_distinct_per_column" ->
      """SELECT 'o_orderstatus' AS column_name,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS distinct_values
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority',
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
        |FROM orders
        |ORDER BY column_name""".stripMargin,

    "q_argmin_recency" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus,
        |  coalesce(CASE WHEN o_orderstatus = 'O' THEN '2025' END,
        |           CASE WHEN o_orderpriority = '1-URGENT' THEN '2023' END,
        |           '2021') AS most_recent
        |  FROM orders)
        |SELECT o_orderkey, most_recent,
        |  CAST(CASE WHEN o_orderstatus = 'F' THEN -1
        |       ELSE CASE most_recent WHEN '2025' THEN 1 WHEN '2023' THEN 2
        |            WHEN '2021' THEN 3 END END AS BIGINT) AS priority
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q_rowid" ->
      """SELECT c_custkey,
        |  row_number() OVER (ORDER BY c_custkey) AS row_id
        |FROM customer ORDER BY row_id""".stripMargin,

    "q_sort_nulls_last" ->
      """WITH t AS (SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN NULL
        |       ELSE length(o_orderpriority) END AS priority FROM orders)
        |SELECT o_orderkey, priority,
        |  row_number() OVER (ORDER BY priority ASC NULLS LAST, o_orderkey) AS sort_rank
        |FROM t ORDER BY sort_rank""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey AS key FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY key""".stripMargin,

    "q_except" ->
      """SELECT p_partkey AS key FROM part
        |EXCEPT SELECT l_partkey FROM lineitem ORDER BY key""".stripMargin,

    "q_regex_extract" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT) AS k_value,
        |  regexp_extract(event_type, '^([a-z]+)', 1) AS type_word
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_variant_extract" ->
      """SELECT event_type,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_agg_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.0 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_rollup" ->
      """SELECT n_name, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderstatus)
        |ORDER BY n_name NULLS LAST, o_orderstatus NULLS LAST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,

    "q_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q_window_frame" ->
      """WITH d AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS daily_value
        |  FROM events GROUP BY 1)
        |SELECT day, daily_value,
        |  sum(daily_value) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS weekly_value
        |FROM d ORDER BY day""".stripMargin,

    "q_window_nav" ->
      """SELECT user_id, event_id,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  lead(event_type, 1) OVER w AS next_type,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
        |FROM orders
        |QUALIFY rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "q_window_topk_native" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
        |FROM orders
        |QUALIFY rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('day', ts) AS window_start, event_type,
        |  count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.user_id = p.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q_range_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b,
        |  abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_asof_join" ->
      """WITH r AS (SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, r.o_orderkey
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH r AS (SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN r.o_orderdate IS NOT NULL
        |       AND abs(epoch_us(e.ts) - epoch_us(r.o_orderdate))
        |         <= 2592000000000
        |       THEN r.o_orderkey END AS o_orderkey
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH r AS (SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, r.o_orderkey
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
        |ORDER BY event_id""".stripMargin,

    // min-after-previous-stage CTE chain == the ordered fold (timestamps
    // are unique per user in this data, so strictly-after in ts order and
    // strictly-after in (ts, event_id) order coincide)
    "q_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
        |    WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |    JOIN s0 ON e.user_id = s0.user_id
        |    WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |    JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |    JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 0 AS stage_idx, 'signup' AS stage,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY stage_idx""".stripMargin,

    "q_event_transitions" ->
      """WITH x AS (SELECT event_type AS prev_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT prev_type, next_type, count(*) AS n_pairs
        |FROM x WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
        |c AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY 1)
        |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', c.cw, wk.w) / 7 AS INT) AS week_offset,
        |  count(*) AS n_users
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_table_fingerprint" ->
      ("""SELECT count(*) AS n_rows,
        |  CAST(sum(('0x' || substr(md5(concat_ws(chr(1),
        |    coalesce(CAST(l_orderkey AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_linenumber AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_quantity AS VARCHAR), chr(2)))), 1, 15))""" +
        """::BIGINT) % 1000000000000000 AS BIGINT) AS fingerprint
        |FROM lineitem""").stripMargin,

    "q_percentile_groups" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, g_priority, o_orderstatus,
        |  o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice',
        |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'discount',
        |  CAST(l_discount AS DOUBLE) FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'tax',
        |  CAST(l_tax AS DOUBLE) FROM lineitem""".stripMargin,

    "q_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, '|' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_corr_stats" ->
      """SELECT event_type,
        |  round(corr(value, epoch_us(ts) / 86400e6), 6) AS corr_vt,
        |  round(regr_slope(value, epoch_us(ts) / 86400e6), 6) AS slope_vt,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_resample_daily" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM d GROUP BY 1),
        |g AS (SELECT user_id,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM s)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |  coalesce(d.n, 0) AS n_events
        |FROM g LEFT JOIN d ON g.user_id IS NOT DISTINCT FROM d.user_id
        |  AND g.day = d.day
        |ORDER BY 1, 2""".stripMargin,

    "q_rolling_range" ->
      """WITH d AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    sum(CAST(value AS DECIMAL(38,6))) AS dv,
        |    date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts)
        |      AS DATE)) AS dayno
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(dv AS DOUBLE) AS day_value,
        |  CAST(sum(dv) OVER (PARTITION BY user_id ORDER BY dayno
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rolling_value
        |FROM d ORDER BY 1, 2""".stripMargin,

    "q_scd2" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN row_number() OVER w = 1
        |           OR lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run FROM m),
        |g AS (SELECT user_id, run, min(event_type) AS attr,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, attr, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
        |    AS valid_to,
        |  n_events
        |FROM g ORDER BY user_id, valid_from""".stripMargin,

    // The q_scd2 interval chain joined back point-in-time: every event
    // picks the version whose [valid_from, valid_to) holds its ts.
    "q_scd2_lookup" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN row_number() OVER w = 1
        |           OR lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, event_type, ts,
        |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run FROM m),
        |g AS (SELECT user_id, run, min(event_type) AS attr,
        |    min(ts) AS valid_from FROM r GROUP BY 1, 2),
        |d AS (SELECT user_id, attr, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
        |      AS valid_to
        |  FROM g)
        |SELECT e.event_id, e.user_id, d.attr, d.valid_from
        |FROM events e LEFT JOIN d ON e.user_id = d.user_id
        |  AND d.valid_from <= e.ts
        |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        |ORDER BY e.event_id""".stripMargin,

    "q_session_paths" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, event_type, ts, event_id,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |p AS (SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    "q_embed_centroids" ->
      """SELECT label, pos, round(avg(v), 6) AS centroid
        |FROM (SELECT label, unnest(embedding)::DOUBLE AS v,
        |        generate_subscripts(embedding, 1) AS pos FROM embeddings) u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_mixture_weights" ->
      """WITH t AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |n AS (SELECT source, n_tokens,
        |    n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS p,
        |    CAST(floor(power(n_tokens /
        |      CAST(sum(n_tokens) OVER () AS DOUBLE), 0.5) * 1e12)
        |      AS BIGINT) AS w12
        |  FROM t)
        |SELECT source, n_tokens, round(p, 6) AS p_natural,
        |  round(CAST(w12 AS DOUBLE) / CAST(sum(w12) OVER () AS DOUBLE), 6)
        |    AS weight,
        |  round(CAST(w12 AS DOUBLE) / CAST(sum(w12) OVER () AS DOUBLE) / p, 6)
        |    AS boost
        |FROM n ORDER BY source""".stripMargin,

    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_docs,
        |  min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "q_dedup_jaccard" ->
      """WITH s AS (SELECT doc_id, source,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.ws, b.ws)) * 1.0 /
        |      len(list_distinct(list_concat(a.ws, b.ws))) AS jac
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jac FROM p WHERE jac >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // Generated bit-replays of the engine's signature schemes (XXH64
    // string/int/long chains + Murmur3 band keys) in DuckDB HUGEINT
    // arithmetic — the full LSH pipeline (shingle/token hash →
    // signatures → band buckets → capped pair explosion → exact verify)
    // replayed end-to-end. Provenance + the hash-vs-decompiled-bytecode
    // verification protocol: tools/gen_minhash_oracle.py.
    "q_dedup_minhash" -> resourceSql("q_dedup_minhash"),
    "q_dedup_simhash" -> resourceSql("q_dedup_simhash"),
    // same signature replay, new-vs-corpus tail (no hot-bucket cap —
    // the probe is a cross-side join, not a self-explode):
    // tools/gen_incremental_oracle.py
    "q_dedup_incremental" -> resourceSql("q_dedup_incremental"),
    // exact Jaccard truth for the dense planted probe: batch = documents
    // with one appended never-colliding token, corpus = documents; the
    // engine's prefix+positional kernel must return exactly the >= 0.8
    // pairs (the planted self-pair for every doc with >= 4 distinct
    // words, plus any organic cross-doc near-dups)
    "q_dedup_dense_probe" ->
      """WITH c AS (SELECT doc_id,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |b AS (SELECT doc_id + 1000000 AS doc_id,
        |    list_sort(list_distinct(string_split(text || ' zzdense', ' '))) AS ws
        |  FROM documents WHERE doc_id % 5 = 0),
        |p AS (SELECT b.doc_id AS new_id, c.doc_id AS corpus_id,
        |    len(list_intersect(b.ws, c.ws)) * 1.0 /
        |      len(list_distinct(list_concat(b.ws, c.ws))) AS jac
        |  FROM b, c)
        |SELECT new_id, corpus_id, jac FROM p WHERE jac >= 0.8
        |ORDER BY new_id, corpus_id""".stripMargin,
    // the whole 3-batch exactly-once gate in one statement
    // (tools/gen_ingest_oracle.py): bootstrap self-dedup + per-batch
    // near-dup/saturation probes + intra-batch components
    "q_similarity_ingest" -> resourceSql("q_similarity_ingest"),
    // BPE greedy training/encode replayed as a staged CTE chain —
    // 24 (merges) / 16 (encode rules) rounds of pair-count + binary-order
    // winner + list_reduce rewrite: tools/gen_bpe_oracle.py
    "q_bpe_merges" -> resourceSql("q_bpe_merges"),
    "q_bpe_encode" -> resourceSql("q_bpe_encode"),
    // seeded ANN quantizer replay (tools/gen_ann_oracle.py): the
    // md5-ordered trainSample, java.util.Random LCG + Scala downward
    // Fisher-Yates (recursive CTE, HUGEINT arithmetic), and 5 unrolled
    // Lloyd rounds with Scala's exact accumulation order — then honest
    // DuckDB cell assignment / probe ranking / cosine / ADC / top-k.
    // ivf and ivf_index share one statement: LlmSpec pins the persisted
    // index probe result-identical to the in-memory path
    "q_embed_ann_ivf" -> resourceSql("q_embed_ann_ivf"),
    "q_embed_ann_ivf_index" -> resourceSql("q_embed_ann_ivf"),
    "q_embed_ann_pq" -> resourceSql("q_embed_ann_pq"),
    "q_embed_ann_pq_index" -> resourceSql("q_embed_ann_pq"),
    "q_embed_ann_pq_rerank" -> resourceSql("q_embed_ann_pq_rerank"),
    // LSH buckets + exact-order cosine verify; the 4x8x64 seed-42
    // gaussian plane constants come from the JVM itself
    // (tools/gen_lsh_oracle.py — StrictMath.log is fdlibm, off-by-an-ulp
    // from libm on ~3% of draws, so Python cannot reproduce them)
    "q_embed_ann_lsh" -> resourceSql("q_embed_ann_lsh"),
    // Spark's HyperLogLog++ bit-replayed: per-type XXH64 (longs, IEEE
    // double bits computed in exact SQL arithmetic, timestamps as
    // micros, byte-stream strings), p=9 register max, zInverse in
    // register order, linear-counting / bias-interpolation / raw
    // branches per the decompiled bytecode (tools/gen_hll_oracle.py)
    "q_profile_table_approx" -> resourceSql("q_profile_table_approx"),

    "q_dedup_incremental_exact" ->
      """WITH s AS (SELECT doc_id,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |p AS (SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |    len(list_intersect(a.ws, b.ws)) * 1.0 /
        |      len(list_distinct(list_concat(a.ws, b.ws))) AS jac
        |  FROM s a JOIN s b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |    AND len(a.ws) >= len(b.ws) * 0.9
        |    AND len(b.ws) >= len(a.ws) * 0.9)
        |SELECT new_id, corpus_id, jac FROM p WHERE jac >= 0.9
        |ORDER BY new_id, corpus_id""".stripMargin,

    // Connected components IS SQL-expressible: transitive closure via a
    // recursive CTE (UNION deduplicates, so the fixpoint terminates), then
    // min-reachable-id per node = the component label. Closure size is
    // Σ component² — fine at oracle scale, which is exactly why the engine
    // side uses min-label propagation instead.
    "q_dedup_clusters" ->
      """WITH RECURSIVE s AS (SELECT doc_id, source,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.ws, b.ws)) * 1.0 /
        |    len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src)
        |SELECT id, least(id, min(reach)) AS comp FROM r GROUP BY id
        |ORDER BY id""".stripMargin,

    "q_semantic_dedup" ->
      """WITH RECURSIVE c AS (SELECT vec_id AS id, embedding AS v,
        |    CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |  + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        |  + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        |  + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        |  + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END AS cell
        |  FROM embeddings),
        |p AS (SELECT a.id AS id_a, b.id AS id_b
        |  FROM c a JOIN c b ON a.cell = b.cell AND a.id < b.id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src)
        |SELECT r.id, CAST(c.cell AS BIGINT) AS cell,
        |  least(r.id, min(r.reach)) AS comp
        |FROM r JOIN c ON c.id = r.id
        |GROUP BY r.id, c.cell ORDER BY r.id""".stripMargin,

    "q_multisignal_dedup" ->
      """WITH RECURSIVE s AS (SELECT doc_id, source,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |pt AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.ws, b.ws)) * 1.0 /
        |    len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9),
        |c AS (SELECT vec_id AS id, embedding AS v,
        |    CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |  + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        |  + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        |  + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        |  + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END AS cell
        |  FROM embeddings),
        |ps AS (SELECT a.id AS id_a, b.id AS id_b
        |  FROM c a JOIN c b ON a.cell = b.cell AND a.id < b.id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35),
        |p AS (SELECT id_a, id_b FROM pt UNION SELECT id_a, id_b FROM ps),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src)
        |SELECT id, least(id, min(reach)) AS comp FROM r GROUP BY id
        |ORDER BY id""".stripMargin,

    // The 3-batch merge-by-key ledger sequence collapses to one grouped
    // aggregate: per-batch delta = (count, sum(value::decimal(18,6)))
    // and the merge SUMS those at decimal(38,6) — both associative, so
    // replaying batch 1 and repairing the simulated mid-swap crash must
    // land on exactly the whole-table aggregate or the hash fails.
    // Cast to double at the end (decimal readout differs across
    // engines; the double of the same exact decimal is bit-identical).
    "q_summary_maintenance" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The pointer-mode twin: the 4-batch rename-free ledger (replay,
    // torn flip + repair, retain-2 GC) collapses to the same grouped
    // aggregate — the pointer protocol must be invisible to the data.
    "q_summary_pointer" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The keyed-lookup twin: ten one-bucket reads must union to exactly
    // the whole-ledger aggregate filtered to those keys — bucket
    // routing and leaf pruning invisible to the served rows.
    "q_summary_lookup" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events WHERE user_id BETWEEN 0 AND 9
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The composite-key twin: ten (event_type, user_id) tuples served
    // from their bucket leaves must equal the two-column whole-ledger
    // aggregate filtered to those tuples.
    "q_summary_multikey" ->
      """SELECT event_type, user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type IN ('click', 'error')
        |  AND user_id BETWEEN 0 AND 4
        |GROUP BY event_type, user_id
        |ORDER BY event_type, user_id""".stripMargin,

    // The compaction twin: localized batches + a mid-sequence live-image
    // fold + a replay of the compacted id still collapse to the one
    // whole-table aggregate — compaction must be invisible to the data.
    "q_summary_compact" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The bucketed twin: the 4-batch pointer/bucketed ledger (narrow
    // batch, replay, torn flip + repair) collapses to the same grouped
    // aggregate — bucket routing is pure partitioning by key, so the
    // manifest-resolved union of part dirs must hold exactly the
    // whole-table merge or the hash fails.
    "q_summary_bucketed" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The migration twin: swap-mode batches + re-shard + replayed batch
    // + bucketed batches still collapse to the one whole-table
    // aggregate — the re-shard routes rows and carries the stamp, so it
    // must be invisible to the merged result.
    "q_summary_reshard" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The schema-evolution twin: the key column is RENAMED by the
    // migration (data + _schema stamp together), renamed batches merge
    // on top, and part of the result is served through the keyed
    // lookup — all of it must still collapse to the whole-table
    // aggregate under the new name.
    "q_summary_evolve" ->
      """SELECT event_type AS category,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
        |    AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY category""".stripMargin,

    // The full 3-batch exactly-once gate replayed in one statement: per
    // batch, an index probe against the accumulated accepted set, then a
    // within-batch self-dedup via recursive-CTE connected components —
    // sign cells and cosine thresholds are engine-deterministic, so the
    // sequential gate verdicts replay bit-for-bit
    "q_embedding_ingest" ->
      """WITH RECURSIVE
        |c AS (SELECT vec_id AS id, embedding AS v,
        |    CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |  + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        |  + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END
        |  + CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END
        |  + CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END AS cell,
        |    vec_id % 3 AS b
        |  FROM embeddings),
        |p0 AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
        |  ON a.b = 0 AND b.b = 0 AND a.cell = b.cell AND a.id < b.id
        |  AND list_cosine_similarity(a.v, b.v) >= 0.9),
        |e0 AS (SELECT id_a AS src, id_b AS dst FROM p0
        |  UNION SELECT id_b, id_a FROM p0),
        |r0 AS (SELECT src AS id, dst AS reach FROM e0
        |  UNION SELECT r0.id, e0.dst FROM r0 JOIN e0 ON r0.reach = e0.src),
        |comp0 AS (SELECT id, least(id, min(reach)) AS comp FROM r0
        |  GROUP BY id),
        |acc0 AS (SELECT id FROM c WHERE b = 0
        |  AND id NOT IN (SELECT id FROM comp0 WHERE id <> comp)),
        |bad1 AS (SELECT DISTINCT n.id FROM c n JOIN c o ON n.b = 1
        |  AND o.id IN (SELECT id FROM acc0) AND n.cell = o.cell
        |  AND list_cosine_similarity(n.v, o.v) >= 0.9),
        |s1 AS (SELECT id FROM c WHERE b = 1
        |  AND id NOT IN (SELECT id FROM bad1)),
        |p1 AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
        |  ON a.id IN (SELECT id FROM s1) AND b.id IN (SELECT id FROM s1)
        |  AND a.cell = b.cell AND a.id < b.id
        |  AND list_cosine_similarity(a.v, b.v) >= 0.9),
        |e1 AS (SELECT id_a AS src, id_b AS dst FROM p1
        |  UNION SELECT id_b, id_a FROM p1),
        |r1 AS (SELECT src AS id, dst AS reach FROM e1
        |  UNION SELECT r1.id, e1.dst FROM r1 JOIN e1 ON r1.reach = e1.src),
        |comp1 AS (SELECT id, least(id, min(reach)) AS comp FROM r1
        |  GROUP BY id),
        |acc1 AS (SELECT id FROM s1
        |  WHERE id NOT IN (SELECT id FROM comp1 WHERE id <> comp)),
        |accAll AS (SELECT id FROM acc0 UNION ALL SELECT id FROM acc1),
        |bad2 AS (SELECT DISTINCT n.id FROM c n JOIN c o ON n.b = 2
        |  AND o.id IN (SELECT id FROM accAll) AND n.cell = o.cell
        |  AND list_cosine_similarity(n.v, o.v) >= 0.9),
        |s2 AS (SELECT id FROM c WHERE b = 2
        |  AND id NOT IN (SELECT id FROM bad2)),
        |p2 AS (SELECT a.id AS id_a, b.id AS id_b FROM c a JOIN c b
        |  ON a.id IN (SELECT id FROM s2) AND b.id IN (SELECT id FROM s2)
        |  AND a.cell = b.cell AND a.id < b.id
        |  AND list_cosine_similarity(a.v, b.v) >= 0.9),
        |e2 AS (SELECT id_a AS src, id_b AS dst FROM p2
        |  UNION SELECT id_b, id_a FROM p2),
        |r2 AS (SELECT src AS id, dst AS reach FROM e2
        |  UNION SELECT r2.id, e2.dst FROM r2 JOIN e2 ON r2.reach = e2.src),
        |comp2 AS (SELECT id, least(id, min(reach)) AS comp FROM r2
        |  GROUP BY id),
        |acc2 AS (SELECT id FROM s2
        |  WHERE id NOT IN (SELECT id FROM comp2 WHERE id <> comp))
        |SELECT id AS vec_id, 'accepted' AS status FROM acc0
        |UNION ALL SELECT id, 'accepted' FROM acc1
        |UNION ALL SELECT id, 'accepted' FROM acc2
        |UNION ALL SELECT id, 'near_dup' FROM c
        |  WHERE (b = 0 AND id NOT IN (SELECT id FROM acc0))
        |     OR (b = 1 AND id NOT IN (SELECT id FROM s1))
        |     OR (b = 1 AND id IN (SELECT id FROM s1)
        |         AND id NOT IN (SELECT id FROM acc1))
        |     OR (b = 2 AND id NOT IN (SELECT id FROM s2))
        |     OR (b = 2 AND id IN (SELECT id FROM s2)
        |         AND id NOT IN (SELECT id FROM acc2))
        |ORDER BY vec_id""".stripMargin,

    "q_semantic_incremental" ->
      """WITH c AS (SELECT vec_id AS id, embedding AS v,
        |    CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |  + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |  + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |  + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END
        |  + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
        |  + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END AS cell
        |  FROM embeddings)
        |SELECT a.id AS new_id, b.id AS corpus_id
        |FROM c a JOIN c b ON a.cell = b.cell
        |  AND a.id % 10 = 0 AND b.id % 10 <> 0
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        |ORDER BY new_id, corpus_id""".stripMargin,

    "q_quality_classifier" ->
      """WITH w AS (SELECT i AS bucket,
        |    (i * 2654435761) % 2001 AS w_milli FROM range(4096) t(i)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tb AS (SELECT doc_id,
        |    ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096
        |   + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256
        |   + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1))
        |      % 4096 AS bucket
        |  FROM tok),
        |s AS (SELECT doc_id AS id, count(*) AS n_tokens,
        |    CAST(sum(coalesce(w.w_milli, 0)) AS BIGINT) AS w_sum
        |  FROM tb LEFT JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT d.doc_id AS id,
        |  CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(
        |    w_sum * 1000000 // (2000 * greatest(n_tokens, 1)), 0)
        |    AS BIGINT) AS score_micro,
        |  coalesce(
        |    w_sum * 1000000 // (2000 * greatest(n_tokens, 1)) >= 500000,
        |    FALSE) AS keep
        |FROM documents d LEFT JOIN s ON d.doc_id = s.id
        |ORDER BY id""".stripMargin,

    "q_inverted_index" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS term,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf_total,
        |  string_agg(doc_id || ':' || pos, ' ' ORDER BY doc_id, pos)
        |    AS postings
        |FROM t GROUP BY term
        |HAVING count(DISTINCT doc_id) >= 3
        |ORDER BY term""".stripMargin,

    "q_dedup_corpus" ->
      """WITH RECURSIVE s AS (SELECT doc_id, source,
        |    list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.ws, b.ws)) * 1.0 /
        |    len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
        |comp AS (SELECT id, least(id, min(reach)) AS comp FROM r GROUP BY id)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> comp)
        |ORDER BY doc_id""".stripMargin,

    // The whole training-data flow, stage by stage, in one SQL statement:
    // clean (normalize + PII redact, engine-portable regex subset with the
    // 'g' flag matching Spark's replace-all) → min-token filter → exact
    // dedup (min id per cleaned text) → near-dup pairs → recursive-CTE
    // connected components → drop non-representatives → window-cumsum
    // packing. Every float crossing engines is int-derived, so the compare
    // is exact.
    "q_training_pipeline" ->
      """WITH RECURSIVE c0 AS (
        |  SELECT doc_id, source,
        |    regexp_replace(regexp_replace(
        |      trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUMBER>', 'g') AS clean_text
        |  FROM documents),
        |c1 AS (SELECT doc_id, source, clean_text,
        |    CAST(len(string_split(clean_text, ' ')) AS BIGINT) AS n_tokens
        |  FROM c0 WHERE len(string_split(clean_text, ' ')) >= 5),
        |keep AS (SELECT min(doc_id) AS doc_id FROM c1 GROUP BY clean_text),
        |ex AS (SELECT c1.* FROM c1 JOIN keep USING (doc_id)),
        |s AS (SELECT doc_id, source,
        |    list_sort(list_distinct(string_split(clean_text, ' '))) AS ws
        |  FROM ex),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.ws, b.ws)) * 1.0 /
        |    len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |r AS (SELECT src AS id, dst AS reach FROM e
        |  UNION SELECT r.id, e.dst FROM r JOIN e ON r.reach = e.src),
        |comp AS (SELECT id, least(id, min(reach)) AS comp FROM r GROUP BY id),
        |surv AS (SELECT ex.doc_id, ex.source, ex.n_tokens FROM ex
        |  LEFT JOIN comp ON ex.doc_id = comp.id
        |  WHERE comp.id IS NULL OR comp.id = comp.comp)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(CAST(sum(n_tokens) OVER w - n_tokens AS DOUBLE) / 256)
        |    AS BIGINT) AS bin
        |FROM surv
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY doc_id""".stripMargin,

    "q_embed_neardup_exact" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        |WHERE a.vec_id < 1000 AND b.vec_id < 1000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_quantize" ->
      """WITH v AS (SELECT vec_id, unnest(embedding) AS val,
        |    generate_subscripts(embedding, 1) AS pos FROM embeddings),
        |st AS (SELECT pos, min(val) AS mn, max(val) AS mx
        |  FROM v GROUP BY pos)
        |SELECT v.vec_id, CAST(v.pos - 1 AS INT) AS dim,
        |  CAST(CASE WHEN st.mx = st.mn THEN 0
        |       ELSE least(255, floor((CAST(v.val AS DOUBLE)
        |         - CAST(st.mn AS DOUBLE))
        |         / (CAST(st.mx AS DOUBLE) - CAST(st.mn AS DOUBLE)) * 256))
        |       END AS BIGINT) AS code
        |FROM v JOIN st USING (pos)
        |ORDER BY vec_id, dim""".stripMargin,

    "q_embed_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT q.query_id,
        |  CAST(row_number() OVER (PARTITION BY q.query_id
        |    ORDER BY list_cosine_similarity(c.embedding, q.qv) DESC,
        |             c.vec_id) AS BIGINT) AS rank,
        |  c.vec_id AS neighbor_id
        |FROM embeddings c, q
        |WHERE c.vec_id <> q.query_id
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS BIGINT) AS n_regex_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
        |    / len(toks) AS avg_token_len,
        |  CAST(len(list_filter(toks, w ->
        |    list_contains(['the','a','of','and','data'], w))) AS DOUBLE)
        |    / len(toks) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_quality_checks" ->
      """WITH m AS (SELECT
        |    CAST(count(o_orderkey) AS DOUBLE) / count(*) AS complete_ok,
        |    CAST(count(DISTINCT o_orderkey) AS DOUBLE)
        |      / greatest(count(o_orderkey), 1) AS unique_ok,
        |    CAST(min(o_totalprice) AS DOUBLE) AS min_price,
        |    CAST(avg(o_totalprice) AS DOUBLE) AS mean_price,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE)
        |      / greatest(count(o_custkey), 1) AS unique_cust
        |  FROM orders)
        |SELECT r.* FROM m, LATERAL (VALUES
        |  ('custkey_spread', 'o_custkey', unique_cust, 0.01, 1.0,
        |    unique_cust >= 0.01 AND unique_cust <= 1.0),
        |  ('orderkey_complete', 'o_orderkey', complete_ok, 1.0, 1.0,
        |    complete_ok >= 1.0 AND complete_ok <= 1.0),
        |  ('orderkey_unique', 'o_orderkey', unique_ok, 1.0, 1.0,
        |    unique_ok >= 1.0 AND unique_ok <= 1.0),
        |  ('price_mean_band', 'o_totalprice', mean_price, 1e4, 1e6,
        |    mean_price >= 1e4 AND mean_price <= 1e6),
        |  ('price_positive', 'o_totalprice', min_price, 0.0, 1e18,
        |    min_price >= 0.0 AND min_price <= 1e18))
        |  AS r(name, "column", value, lo, hi, pass)
        |ORDER BY name""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(toks) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
        |    CAST(len(list_filter(toks, w ->
        |      list_contains(['the','a','of','and','data'], w))) AS DOUBLE) AS nstop
        |  FROM t)
        |SELECT doc_id,
        |  CAST(floor(
        |    least(n / 50.0, 1.0)
        |    * (CASE WHEN n = 0 THEN 0.0 ELSE nd / n END)
        |    * (1.0 - least(CASE WHEN n = 0 THEN 0.0 ELSE nstop / n END, 1.0))
        |    * 1e6) AS BIGINT) AS quality_micro
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_sql_segment_rollup" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    "q_text_langid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(toks, w ->
        |    list_contains(['table','row','column'], w))) AS BIGINT) AS score_a,
        |  CAST(len(list_filter(toks, w ->
        |    list_contains(['stream','batch','window'], w))) AS BIGINT) AS score_b
        |  FROM t)
        |SELECT doc_id, score_a, score_b,
        |  CASE WHEN score_a > score_b THEN 'tabular'
        |       WHEN score_b > score_a THEN 'streaming'
        |       ELSE 'und' END AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, term,
        |    CAST(tf AS DOUBLE) *
        |      (ln((n.n + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY s DESC, term) AS BIGINT) AS rank,
        |  term, CAST(floor(s * 1e6) AS BIGINT) AS score_micro
        |FROM scored
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q_vocab_topk" ->
      """SELECT term, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "q_pack_sequences" ->
      """WITH sized AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
        |    / 256.0) AS BIGINT) AS bin
        |FROM sized ORDER BY doc_id""".stripMargin,

    "q_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |    CAST(greatest(1, ceil((n - 16) / 48.0)) AS BIGINT) AS nc
        |  FROM t),
        |e AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0, nc - 1)) AS ci FROM c)
        |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |  array_to_string(list_slice(toks, ci * 48 + 1, ci * 48 + 64), ' ')
        |    AS chunk_text,
        |  CAST(least(64, n - ci * 48) AS BIGINT) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // fractions quantized to 1/65536: 0.5 -> 0x8000, 0.25 -> 0x4000,
    // 0.1 -> floor(6553.6) = 0x1999 — hex-prefix compare == numeric cut
    "q_sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
        |       ELSE '1999' END
        |ORDER BY doc_id""".stripMargin,

    "q_importance_sample" ->
      """WITH r AS (SELECT doc_id, source,
        |    least(1.0, greatest(0.1, n_chars / 400.0)) AS rate
        |  FROM documents)
        |SELECT doc_id, source FROM r
        |WHERE rate >= 1.0
        |   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |      printf('%04x', CAST(floor(rate * 65536) AS INT))
        |ORDER BY doc_id""".stripMargin,

    "q_sample_fixed_per_stratum" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rank
        |FROM documents
        |QUALIFY rank <= 30
        |ORDER BY doc_id""".stripMargin,

    "q_interleave" ->
      """WITH r AS (SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |      AS BIGINT) AS k
        |  FROM documents)
        |SELECT doc_id, source, k,
        |  CAST(floor((CAST(k + 1 AS DOUBLE) /
        |    CAST(CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 1.0
        |         ELSE 1.0 END AS DOUBLE)) * 1000000) AS BIGINT) AS vt_micro
        |FROM r ORDER BY doc_id""".stripMargin,

    // bigrams via the window-lead pattern (single-space text); exact
    // integer counts per doc, zero-gram docs kept by the left join
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS gram
        |  FROM w QUALIFY gram IS NOT NULL),
        |c AS (SELECT doc_id, gram, count(*) AS cnt
        |  FROM g GROUP BY doc_id, gram)
        |SELECT d.doc_id,
        |  CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(count(c.gram), 0) AS BIGINT) AS n_distinct,
        |  CAST(coalesce(max(cnt), 0) AS BIGINT) AS top_count
        |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS normalized,
        |  regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id || '@example.com or 12345678',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUMBER>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS prefix_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(length(text) % 64 + 1 AS BIGINT) AS width,
        |  CAST(ascii(text) AS BIGINT) AS first_char
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Stride-decimation resize is pure integer math over byte/char lengths
    // (documents text is ASCII, so strlen == length; both asserted distinct
    // here for fidelity to the binary-vs-char semantics).
    "q_multimodal_resize" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |  CAST(greatest(((length(text) % 64) + 1) // 2, 1) AS INT) AS width,
        |  CAST(greatest(((length(text) % 48) + 1) // 2, 1) AS INT) AS height,
        |  CAST(CASE WHEN strlen(text) = 0 THEN 0
        |       ELSE greatest(strlen(text) // 2, 1) END AS BIGINT) AS n_bytes
        |FROM documents ORDER BY id""".stripMargin,

    // The REAL imageio arm's oracle never touches a PNG byte: nearest-
    // neighbor decimation means resized pixel (x,y) = source pixel
    // (2x, 2y), and the source pixel is the synthetic integer function —
    // so the position-weighted sum the Spark side computes from DECODED
    // output pixels replays as plain BIGINT arithmetic at the decimated
    // coordinates. rw = w//2 and rh = h//2 exactly (w >= 4, h >= 3, so
    // the max(.,1) floor never binds; `greatest` kept for fidelity).
    "q_multimodal_resize_real" ->
      """WITH dims AS (SELECT CAST(doc_id AS BIGINT) AS d,
        |    doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h
        |  FROM documents),
        |r AS (SELECT d, greatest(w // 2, 1) AS rw, greatest(h // 2, 1) AS rh
        |  FROM dims),
        |px AS (SELECT d, rw, rh,
        |    unnest(generate_series(0, rw * rh - 1)) AS i
        |  FROM r)
        |SELECT d AS id, CAST(rw AS INT) AS width, CAST(rh AS INT) AS height,
        |  CAST(sum(((d * 1103515245 + (2 * (i % rw)) * 12345
        |             + (2 * (i // rw)) * 2654435761) % 16777216)
        |           * (1 + (i % rw) + 1000 * (i // rw))) AS BIGINT) AS pix_sum
        |FROM px GROUP BY d, rw, rh
        |ORDER BY id""".stripMargin,

    // FNV-1a replayed in SQL: HUGEINT accumulator mod 2^64; xor only ever
    // touches the low 8 bits, so it is lifted to BIGINT and stitched back.
    // list_reduce folds the byte list with the offset basis prepended (an
    // empty chunk correctly returns the basis unchanged).
    "q_frame_samples" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id, text,
        |    strlen(text) AS n, greatest(strlen(text) // 4, 1) AS chunk
        |  FROM documents),
        |f AS (SELECT id, text, n, chunk, CAST(fr AS INT) AS frame
        |  FROM d, generate_series(0, 3) AS t(fr)),
        |seg AS (SELECT id, frame,
        |    substring(text, CAST(least(frame * chunk, n) AS INT) + 1,
        |      CAST((CASE WHEN frame = 3 THEN n
        |            ELSE least((frame + 1) * chunk, n) END)
        |           - least(frame * chunk, n) AS INT)) AS sub
        |  FROM f),
        |fp AS (SELECT id, frame,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(generate_series(1, strlen(sub)),
        |          i -> CAST(ascii(substring(sub, CAST(i AS INT), 1))
        |            AS HUGEINT))),
        |      (acc, b) -> ((acc - (acc % 256)
        |          + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |        * CAST(1099511628211 AS HUGEINT))
        |        % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM seg)
        |SELECT id, frame,
        |  CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |       THEN h - CAST(18446744073709551616 AS HUGEINT)
        |       ELSE h END AS BIGINT) AS fingerprint
        |FROM fp ORDER BY id, frame""".stripMargin,

    // Exact integer bin counts of the byte-nibble histogram (see the
    // registry entry: round(feature·n) recovers them from the normalized
    // float32 vector losslessly).
    "q_multimodal_features" ->
      """WITH b AS (SELECT CAST(doc_id AS BIGINT) AS id,
        |    strlen(text) AS n,
        |    list_transform(generate_series(1, strlen(text)),
        |      i -> ascii(substring(text, CAST(i AS INT), 1)) // 16) AS nib
        |  FROM documents)
        |SELECT id, CAST(n AS BIGINT) AS n_bytes, CAST(bin AS BIGINT) AS bin,
        |  CAST(len(list_filter(nib, x -> x = bin)) AS BIGINT) AS cnt
        |FROM b, generate_series(0, 15) AS t(bin)
        |ORDER BY id, bin""".stripMargin,

    // Replays the STUB arm's PCM16-LE interpretation exactly: byte pair
    // (2k-1, 2k) [1-based] -> sample lo + 256*hi, sign-fixed, window
    // (j*16)//ns in integer division, BIGINT |sample| sums — all exact
    // integer math. The printable-ASCII predicate (same on the Spark
    // side) guarantees ord(char) == byte, so the char-indexed replay
    // equals the byte-indexed stub by construction.
    "q_audio_windows" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, strlen(text) // 2)) AS k
        |  FROM documents WHERE text ~ '^[\x20-\x7e]*$'),
        |samp AS (
        |  SELECT doc_id, CAST(k - 1 AS BIGINT) AS j,
        |    CAST(strlen(text) // 2 AS BIGINT) AS ns,
        |    ascii(substring(text, CAST(2*k - 1 AS INT), 1))
        |      + 256 * ascii(substring(text, CAST(2*k AS INT), 1)) AS u16
        |  FROM pos),
        |sgn AS (
        |  SELECT doc_id, j, ns,
        |    CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END AS s
        |  FROM samp)
        |SELECT CAST(doc_id AS BIGINT) AS id,
        |  CAST((j * 16) // ns AS INT) AS win,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
        |FROM sgn GROUP BY doc_id, (j * 16) // ns
        |ORDER BY id, win""".stripMargin,

    // The REAL javax.sound arm's oracle replays the synthetic sample
    // recurrence directly — sample j of doc d is ((d·48271 + j·69621)
    // mod 65536) − 32768, ns = d%37+20 — with the 44-byte WAV header NOT
    // counted (the stub arm would count its 22 byte-pairs, so the hash
    // disambiguates the routing). Same exact-integer window arithmetic
    // as q_audio_windows.
    "q_audio_windows_real" ->
      """WITH docs AS (SELECT CAST(doc_id AS BIGINT) AS d,
        |    doc_id % 37 + 20 AS ns
        |  FROM documents),
        |idx AS (SELECT d, ns,
        |    unnest(generate_series(0, ns - 1)) AS j
        |  FROM docs),
        |smp AS (SELECT d, ns, j,
        |    ((d * 48271 + j * 69621) % 65536) - 32768 AS s
        |  FROM idx)
        |SELECT d AS id, CAST((j * 16) // ns AS INT) AS win,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
        |FROM smp GROUP BY d, (j * 16) // ns
        |ORDER BY id, win""".stripMargin,

    // Header-as-data transpose as explicit per-column UNION ALL (not
    // UNPIVOT, which silently drops NULL cells) over the first lineitem
    // row, Spark-cast string rendering on both sides, plus the sentinel.
    "q_s2_transpose" ->
      """WITH f AS (SELECT * FROM lineitem
        |  ORDER BY l_orderkey, l_linenumber LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'l_orderkey' AS "QualtricsVariableName.2025",
        |    CAST(l_orderkey AS VARCHAR) AS "QuestionText.2025",
        |    '2025' AS "SurveyAdminYear.2025" FROM f
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_tax', CAST(l_tax AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_returnflag', CAST(l_returnflag AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR), '2025' FROM f
        |  UNION ALL SELECT NULL, '', NULL
        |) ORDER BY "QualtricsVariableName.2025" ASC NULLS LAST""".stripMargin,

    // Every 8-token window replayed via unnest(generate_series); a window
    // count over the gram partition marks corpus-wide recurrences.
    "q_substring_dup_stats" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |idx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 7)) AS i FROM toks),
        |wins AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(t[i:i+7], ' ') AS gram FROM idx),
        |counted AS (SELECT doc_id,
        |    count(*) OVER (PARTITION BY gram) AS cnt FROM wins)
        |SELECT doc_id, count(*) AS n_windows,
        |  count(*) FILTER (WHERE cnt > 1) AS n_dup_windows
        |FROM counted GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The rewrite half replayed in SQL: duplicated windows (all but the
    // min-(doc,pos) occurrence, encoded as doc_id·1e6+i — positions are
    // far below 1e6, so integer order == the engine's struct order),
    // expanded to covered token positions, anti-joined from the token
    // stream, reassembled with an ORDER BY string_agg.
    "q_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |tidx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t))) AS i FROM toks),
        |tok AS (SELECT doc_id, i, t[i] AS w FROM tidx),
        |widx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 7)) AS i FROM toks),
        |wins AS (SELECT doc_id, i,
        |    array_to_string(t[i:i+7], ' ') AS gram FROM widx),
        |marked AS (SELECT doc_id, i FROM (
        |    SELECT doc_id, i,
        |      count(*) OVER (PARTITION BY gram) AS cnt,
        |      min(doc_id * 1000000 + i) OVER (PARTITION BY gram)
        |        AS keepenc
        |    FROM wins)
        |  WHERE cnt > 1 AND doc_id * 1000000 + i <> keepenc),
        |covered AS (SELECT DISTINCT doc_id,
        |    unnest(generate_series(i, i + 7)) AS ci FROM marked),
        |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok
        |  LEFT JOIN covered cv
        |    ON tok.doc_id = cv.doc_id AND tok.i = cv.ci
        |  WHERE cv.doc_id IS NULL)
        |SELECT d.doc_id,
        |  coalesce(string_agg(k.w, ' ' ORDER BY k.i), '') AS text,
        |  CAST(len(any_value(d.t)) - count(k.w) AS BIGINT)
        |    AS n_tokens_removed
        |FROM toks d LEFT JOIN kept k ON d.doc_id = k.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // Incremental ingest replayed: corpus grams cut from every batch
    // occurrence, intra-batch dups keep the min-(doc,pos) occurrence.
    "q_substring_incremental" ->
      """WITH ctoks AS (SELECT string_split(text, ' ') AS t FROM documents
        |    WHERE doc_id % 5 <> 0),
        |cidx AS (SELECT t,
        |    unnest(generate_series(1, len(t) - 7)) AS i FROM ctoks),
        |cgrams AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ')
        |    AS gram FROM cidx),
        |btoks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents WHERE doc_id % 5 = 0),
        |btidx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t))) AS i FROM btoks),
        |btok AS (SELECT doc_id, i, t[i] AS w FROM btidx),
        |bwidx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 7)) AS i FROM btoks),
        |bwins AS (SELECT doc_id, i,
        |    array_to_string(t[i:i+7], ' ') AS gram FROM bwidx),
        |incorp AS (SELECT b.doc_id, b.i FROM bwins b
        |  JOIN cgrams g ON b.gram = g.gram),
        |freshm AS (SELECT doc_id, i FROM (
        |    SELECT doc_id, i, count(*) OVER (PARTITION BY gram) AS cnt,
        |      min(doc_id * 1000000 + i) OVER (PARTITION BY gram)
        |        AS keepenc
        |    FROM bwins WHERE gram NOT IN (SELECT gram FROM cgrams))
        |  WHERE cnt > 1 AND doc_id * 1000000 + i <> keepenc),
        |marked AS (SELECT doc_id, i FROM incorp
        |  UNION SELECT doc_id, i FROM freshm),
        |covered AS (SELECT DISTINCT doc_id,
        |    unnest(generate_series(i, i + 7)) AS ci FROM marked),
        |kept AS (SELECT btok.doc_id, btok.i, btok.w FROM btok
        |  LEFT JOIN covered cv
        |    ON btok.doc_id = cv.doc_id AND btok.i = cv.ci
        |  WHERE cv.doc_id IS NULL)
        |SELECT d.doc_id,
        |  coalesce(string_agg(k.w, ' ' ORDER BY k.i), '') AS text,
        |  CAST(len(any_value(d.t)) - count(k.w) AS BIGINT)
        |    AS n_tokens_removed
        |FROM btoks d LEFT JOIN kept k ON d.doc_id = k.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // Add-one bigram LM replayed exactly: context counts = bigram-left
    // counts, V = corpus distinct tokens, mean ln P over each doc's
    // bigrams. Self-scoring, so every join key exists on both sides.
    "q_ngram_lm_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |idx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |bi AS (SELECT doc_id, t[i] AS u, t[i] || ' ' || t[i+1] AS gram
        |  FROM idx),
        |uc AS (SELECT u, count(*) AS cu FROM bi GROUP BY u),
        |bc AS (SELECT gram, count(*) AS cb FROM bi GROUP BY gram),
        |v AS (SELECT count(DISTINCT tok) AS vs
        |  FROM (SELECT unnest(t) AS tok FROM toks))
        |SELECT doc_id, n_bigrams,
        |  CAST(ll_micros AS DOUBLE) / 1000000.0 / n_bigrams AS avg_ll
        |FROM (SELECT b.doc_id, count(*) AS n_bigrams,
        |    CAST(sum(CAST(floor(ln((bc.cb + 1.0) / (uc.cu + v.vs))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS ll_micros
        |  FROM bi b JOIN bc ON b.gram = bc.gram JOIN uc ON b.u = uc.u
        |  CROSS JOIN v
        |  GROUP BY b.doc_id) ORDER BY doc_id""".stripMargin,

    // One SELECT per profiled column; epoch micros for the timestamp ends.
    "q_profile_table" ->
      """SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |  count(*) - count(l_orderkey) AS n_null,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  CAST(min(l_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(l_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM lineitem
        |UNION ALL SELECT 'l_quantity', count(*),
        |  count(*) - count(l_quantity), count(DISTINCT l_quantity),
        |  CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
        |  NULL, NULL FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', count(*),
        |  count(*) - count(l_extendedprice),
        |  count(DISTINCT l_extendedprice),
        |  CAST(min(l_extendedprice) AS DOUBLE),
        |  CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL FROM lineitem
        |UNION ALL SELECT 'l_returnflag', count(*),
        |  count(*) - count(l_returnflag), count(DISTINCT l_returnflag),
        |  NULL, NULL, CAST(min(l_returnflag) AS VARCHAR),
        |  CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
        |UNION ALL SELECT 'l_shipdate', count(*),
        |  count(*) - count(l_shipdate), count(DISTINCT l_shipdate),
        |  CAST(epoch_us(min(l_shipdate)) AS DOUBLE),
        |  CAST(epoch_us(max(l_shipdate)) AS DOUBLE), NULL, NULL
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Deterministic replay of Spark's CountMinSketch(eps=0.001, conf=0.99,
    // seed=42): depth 7, width 2000, Murmur3_x86_32 over utf8 bytes
    // (hashUnsafeBytes: 4-byte LE blocks, then each tail byte as a FULL
    // mixK1+mixH1 round), h1 = murmur(v, 42), h2 = murmur(v, h1), row i
    // bucket = java-int(h1 + i*h2) (bit-flip if negative) % width; the
    // estimate is min over rows of the colliding exact counts. All
    // 32-bit wraps run in HUGEINT then mod 2^32 (the q_frame_samples
    // pattern); validated against org.apache.spark.util.sketch directly.
    "q_sketch_cms" ->
      """WITH ev AS (
        |  SELECT event_type AS v, count(*) AS n FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1),
        |probes AS (SELECT * FROM (VALUES ('click'),('error'),('purchase'),
        |  ('signup'),('view')) p(v)),
        |vals AS (SELECT v FROM ev UNION SELECT v FROM probes),
        |hx AS (
        |  SELECT v, strlen(v) AS len,
        |    list_transform(
        |      list_concat(
        |        list_transform(generate_series(1, strlen(v) // 4), j ->
        |          CAST(ascii(substring(v, CAST(4*j-3 AS INT), 1))
        |            + 256 * ascii(substring(v, CAST(4*j-2 AS INT), 1))
        |            + 65536 * ascii(substring(v, CAST(4*j-1 AS INT), 1))
        |            + 16777216 * ascii(substring(v, CAST(4*j AS INT), 1))
        |            AS BIGINT)),
        |        list_transform(
        |          generate_series(4*(strlen(v)//4) + 1, strlen(v)), i ->
        |          CAST(ascii(substring(v, CAST(i AS INT), 1)) AS BIGINT))),
        |      k -> CAST((((CAST(k AS HUGEINT) * 3432918353) % 4294967296
        |             * 32768) % 4294967296
        |             + (CAST(k AS HUGEINT) * 3432918353) % 4294967296
        |               // 131072)
        |             * 461845907 % 4294967296 AS BIGINT)) AS mixed
        |  FROM vals),
        |h1 AS (
        |  SELECT v, len, mixed,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), mixed), (acc, m) ->
        |      CAST((((CAST(xor(acc, m) AS HUGEINT) * 8192) % 4294967296
        |        + xor(acc, m) // 524288) * 5 + 3864292196) % 4294967296
        |        AS BIGINT)) AS h1pre,
        |    xor(h1pre, len) AS a1,
        |    xor(a1, a1 // 65536) AS a2,
        |    CAST(CAST(a2 AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT)
        |      AS a3,
        |    xor(a3, a3 // 8192) AS a4,
        |    CAST(CAST(a4 AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT)
        |      AS a5,
        |    xor(a5, a5 // 65536) AS h1v
        |  FROM hx),
        |h2 AS (
        |  SELECT v, h1v,
        |    list_reduce(list_prepend(h1v, mixed), (acc, m) ->
        |      CAST((((CAST(xor(acc, m) AS HUGEINT) * 8192) % 4294967296
        |        + xor(acc, m) // 524288) * 5 + 3864292196) % 4294967296
        |        AS BIGINT)) AS h2pre,
        |    xor(h2pre, len) AS b1,
        |    xor(b1, b1 // 65536) AS b2,
        |    CAST(CAST(b2 AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT)
        |      AS b3,
        |    xor(b3, b3 // 8192) AS b4,
        |    CAST(CAST(b4 AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT)
        |      AS b5,
        |    xor(b5, b5 // 65536) AS h2v
        |  FROM h1),
        |buckets AS (
        |  SELECT h.v, d.i,
        |    ((h.h1v + d.i * h.h2v) % 4294967296) AS c,
        |    (CASE WHEN c >= 2147483648 THEN (4294967296 - c) % 2000
        |          ELSE c % 2000 END) AS bkt
        |  FROM h2 h, (SELECT unnest(generate_series(0, 6)) AS i) d),
        |rowsums AS (
        |  SELECT p.v AS probe, pb.i, coalesce(sum(e.n), 0) AS s
        |  FROM probes p
        |  JOIN buckets pb ON pb.v = p.v
        |  LEFT JOIN buckets vb ON vb.i = pb.i AND vb.bkt = pb.bkt
        |  LEFT JOIN ev e ON e.v = vb.v
        |  GROUP BY 1, 2)
        |SELECT probe AS event_type, CAST(min(s) AS BIGINT) AS approx_n
        |FROM rowsums GROUP BY 1 ORDER BY 1""".stripMargin,

    // Snapshot diff replayed as a FULL OUTER JOIN with per-column
    // IS DISTINCT FROM compares (the null-safe struct equality).
    "q_table_diff" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |n AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT * FROM (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
        |           OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
        |           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |           OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
        |           OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
        |         THEN 'changed' END AS change
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |WHERE change IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    // BM25 replayed with the engine's exact expression tree; per-term
    // scores floored to BIGINT micros before the sum (order-independent),
    // outer CAST because DuckDB's sum(BIGINT) widens to HUGEINT.
    "q_bm25_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |stats AS (SELECT count(*) AS n,
        |    avg(CAST(len(t) AS DOUBLE)) AS avgdl FROM toks),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        |  WHERE term IN ('hash', 'join', 'vector', 'stream')
        |  GROUP BY term),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('hash', 'join', 'vector', 'stream')
        |  GROUP BY doc_id, term)
        |SELECT tf.doc_id, count(*) AS n_terms_hit,
        |  CAST(sum(CAST(floor(
        |    ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) *
        |    ((tf.tf * 1.0 * (1.2 + 1.0)) /
        |     (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / s.avgdl))) *
        |    1000000.0) AS BIGINT)) AS BIGINT) AS bm25_micros
        |FROM tf JOIN dfreq d ON tf.term = d.term
        |JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    // Hybrid search: the BM25 oracle's scored CTE feeding a lexical
    // top-20, a cosine top-20, and the fixed-order RRF sum.
    "q_hybrid_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |stats AS (SELECT count(*) AS n,
        |    avg(CAST(len(t) AS DOUBLE)) AS avgdl FROM toks),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        |  WHERE term IN ('hash', 'join', 'vector', 'stream')
        |  GROUP BY term),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('hash', 'join', 'vector', 'stream')
        |  GROUP BY doc_id, term),
        |scored AS (SELECT tf.doc_id,
        |  CAST(sum(CAST(floor(
        |    ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) *
        |    ((tf.tf * 1.0 * (1.2 + 1.0)) /
        |     (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / s.avgdl))) *
        |    1000000.0) AS BIGINT)) AS BIGINT) AS bm25_micros
        |  FROM tf JOIN dfreq d ON tf.term = d.term
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
        |  GROUP BY tf.doc_id),
        |lex AS (SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY bm25_micros DESC, doc_id) AS BIGINT) AS rank_lex
        |  FROM scored
        |  QUALIFY rank_lex <= 20),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
        |sem AS (SELECT c.vec_id AS doc_id,
        |    CAST(row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.embedding, q.qv) DESC, c.vec_id)
        |      AS BIGINT) AS rank_sem
        |  FROM embeddings c, q WHERE c.vec_id <> 7
        |  QUALIFY rank_sem <= 20)
        |SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |  rank_lex, rank_sem,
        |  COALESCE(1.0 / (60 + rank_lex), 0.0) +
        |  COALESCE(1.0 / (60 + rank_sem), 0.0) AS rrf
        |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        |ORDER BY rrf DESC, doc_id""".stripMargin,

    // PMI with the engine's exact left-associated double expression:
    // ((c_uw·1.0)·U)·U / (((T·1.0)·c_u)·c_w).
    "q_token_pmi" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |idx AS (SELECT doc_id, t,
        |    unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
        |bi AS (SELECT t[i] AS u, t[i+1] AS w FROM idx),
        |uni AS (SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
        |tot AS (SELECT (SELECT count(*) FROM bi) AS tb,
        |    (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS us),
        |pairs AS (SELECT u, w, count(*) AS c_uw FROM bi
        |  GROUP BY u, w HAVING count(*) >= 20)
        |SELECT p.u, p.w, p.c_uw,
        |  ln(p.c_uw * 1.0 * t.us * t.us / (t.tb * 1.0 * cu.c * cw.c))
        |    AS pmi
        |FROM pairs p CROSS JOIN tot t
        |JOIN uni cu ON p.u = cu.tok JOIN uni cw ON p.w = cw.tok
        |ORDER BY u, w""".stripMargin
  )
}
