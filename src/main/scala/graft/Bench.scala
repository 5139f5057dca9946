package graft
import org.apache.spark.sql.SparkSession

/** Driver-facing benchmark main with two outputs:
  *  - stdout: ONE compact JSON line (ms precision, warm-min per-query
  *    times only) ordered queries-first / headline-fields-LAST, so the
  *    driver's ~2000-char log tail — which truncates the FRONT of a long
  *    line — always retains value/unit/sf/n_queries/errors;
  *  - `target/bench.json`: the full-detail record (double precision, plus
  *    `"cold_queries"` first-run times), written atomically so a reader
  *    never sees a torn line.
  * Both carry `"metric"`, `"value"`, `"unit"`, `"queries"`, `"sf"`.
  *
  * Since round 6 each query materializes through the `noop` sink, not
  * `count()`: count() let the optimizer prune final-projection
  * expressions and the trailing sort, under-measuring real query cost
  * (q_profile_table's exact multi-distinct was invisible). Totals are
  * therefore NOT comparable to rounds <= 5 without reading PERF.md.
  *
  * Each query runs twice and the reported time is the MIN of the two runs:
  * a transient machine-load spike during one run (the round-2 failure mode —
  * 4-45x per-query inflation under contention) cannot distort the headline
  * number unless it spans both runs. When it DOES span both — the two runs
  * still disagree >= 2x with the better one >= 0.5 s, the r6 signature
  * where a contiguous alphabetical block read 3-15x its quiet-box time —
  * the query earns a DEFERRED third run after the whole registry finishes
  * (minutes later, outside the load window) and reports min-of-three.
  * Third-run names land in `"retried"` in target/bench.json for auditing.
  * The cold (first-run) times are kept under `"cold_queries"` for anyone
  * studying cache/JIT effects.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalyst.GraftExtensions.install(spark)
    // JVM/codegen warmup so the first measured query doesn't absorb ~4s of
    // one-time cost; deterministic name order keeps run-to-run comparisons
    // apples-to-apples (Map iteration order is arbitrary).
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink, not count(): a count() plans as Aggregate[count(1)],
      // letting the optimizer prune every expression that exists only in
      // the final projection — a regression landing there would be
      // invisible to the perf gate. The noop write materializes every
      // output column, the same work Verify's parquet write pays.
      // NonFatal only: an OOM leaves the JVM untrustworthy — aborting
      // beats timing the remaining queries on a wrecked heap.
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        true
      } catch { case scala.util.control.NonFatal(_) => false }
      val secs = (System.nanoTime() - t0) / 1e9
      // free caches and (local)checkpoint blocks the query left behind —
      // block-manager/GC pressure otherwise accumulates across ~70 queries
      // and distorts later timings (observed 10s -> 146s on an iterative
      // query late in the run)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (ok) secs else -1.0 // -1 marks a FAILED query, not a time
    }

    // Dev-only subset filter (comma-separated names); the driver never sets
    // it, so its full-registry contract is unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val cold = runOnce(fn)
      val warm = runOnce(fn)
      (name, fn, cold, warm)
    }
    // Deferred min-of-three for load-window outliers: a machine-load spike
    // long enough to span a query's back-to-back runs inflates BOTH, and
    // min-of-two can't see past it. Signature: the two runs still disagree
    // >= 2x (contention is noisy) with the better one >= 0.5 s (sub-500ms
    // ratios are scheduler noise). Those queries re-run now — after the
    // full registry, typically minutes later and outside the window.
    val results = firstPass.map { case (name, fn, cold, warm) =>
      val best =
        if (cold < 0 || warm < 0) -1.0 // fail in either run = failed query
        else math.min(cold, warm)
      val isOutlier = best >= 0.5 && math.max(cold, warm) / best >= 2.0
      val best3 =
        if (isOutlier) {
          val third = runOnce(fn)
          if (third >= 0) math.min(best, third) else best
        } else best
      (name, cold, best3, isOutlier)
    }
    // JSON string escaping shared with Verify (graft.Util.jsonEscape) so
    // the two driver-facing emitters cannot drift apart.
    def jstr(s: String): String = Util.jsonEscape(s)
    def jsonMap(kvs: Seq[(String, Double)], fmt: Double => String): String =
      kvs.map { case (k, v) => jstr(k) + ":" + fmt(v) }.mkString("{", ",", "}")
    val ms = (v: Double) =>
      if (v < 0) "-1" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.map(_._3).filter(_ >= 0).sum
    val nFailed = results.count(_._3 < 0)
    val retried = results.collect { case (n, _, _, true) => n }
    // stdout line: millisecond precision, warm-min times only — and the
    // HEADLINE FIELDS LAST. The driver keeps only the final ~2000 chars of
    // the log (every BENCH_r0N so far shows the line truncated at the
    // FRONT and "parsed": null), so the queries map goes first and
    // value/unit/sf/n_queries/errors go at the END where the tail always
    // preserves them; key order is irrelevant to any real JSON parser when
    // the line does fit. Full detail lives in target/bench.json.
    val line =
      s"""{"metric":"total","queries":${jsonMap(results.map { case (n, _, best, _) => n -> best }, ms)},"value":${ms(total)},"unit":"sec","sf":${jstr(sfDir)},"materialization":"noop","n_queries":${results.size},"errors":$nFailed}"""
    println(line)
    // File-based output keeps the full detail (cold first-run times too):
    // atomic-ish (write temp then rename) so a reader never sees a torn line.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results.map { case (n, _, best, _) => n -> best }, _.toString)},"cold_queries":${jsonMap(results.map { case (n, cold, _, _) => n -> cold }, _.toString)},"retried":${retried.map(jstr).mkString("[", ",", "]")},"sf":${jstr(sfDir)},"materialization":"noop","n_queries":${results.size},"errors":$nFailed}"""
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    val tmp = out.resolveSibling("bench.json.tmp")
    java.nio.file.Files.write(tmp, (full + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    spark.stop()
  }
}
