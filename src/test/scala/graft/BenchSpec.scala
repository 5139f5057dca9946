package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for Bench's load-window defense — the pure retry policy
  * and the committed expectation baseline. No Spark session needed. */
class BenchSpec extends AnyFunSuite {

  test("disagreement trigger: >= 2x spread above 0.5s retries") {
    assert(Bench.needsDeferredRetry(cold = 2.0, warm = 0.9, expected = None))
    assert(!Bench.needsDeferredRetry(cold = 1.5, warm = 0.9, expected = None))
    // sub-500ms readings are scheduler noise, never retried
    assert(!Bench.needsDeferredRetry(cold = 0.4, warm = 0.1, expected = None))
    // failed runs are failures, not times to repair
    assert(!Bench.needsDeferredRetry(cold = -1.0, warm = 9.0, expected = None))
  }

  test("expectation trigger: both runs equally inflated >= 3x retries") {
    // the r7 driver artifact: cold and warm AGREE (no disagreement
    // signal) but both sit far above the quiet baseline
    assert(Bench.needsDeferredRetry(5.0, 5.1, expected = Some(1.0)))
    // r11: the silent 1.5-3x band now ALSO earns the deferred retry —
    // q_dedup_incremental_exact sat at 2.0-2.7x for two driver rounds
    // with no retry ever firing (PERF.md round-11 adjudication)
    assert(Bench.needsDeferredRetry(2.0, 2.1, expected = Some(1.0)))
    assert(!Bench.needsDeferredRetry(1.4, 1.4, expected = Some(1.0)))
    // no committed baseline (new query) -> only the disagreement trigger
    assert(!Bench.needsDeferredRetry(5.0, 5.1, expected = None))
    // r12: the former blind crack — q_sample_hash read 0.448 s vs its
    // 0.124 s line (3.61x) in the r11 driver run, under BOTH the old
    // 0.5 s suspect floor and the 0.15 s drift-expectation floor. A
    // >= 0.3 s reading at >= 3x its line now earns the deferred retry.
    assert(Bench.needsDeferredRetry(0.448, 0.448, expected = Some(0.124)))
    // ...while a 60 ms query tripling (0.18 s) stays muted
    assert(!Bench.needsDeferredRetry(0.18, 0.18, expected = Some(0.06)))
    // and a 120 ms line at 2x (0.25 s, under both 3x and the 0.3 floor)
    // is still treated as scheduler noise
    assert(!Bench.needsDeferredRetry(0.25, 0.25, expected = Some(0.124)))
  }

  test("suspect flag marks residual >= 3x readings only") {
    assert(Bench.isSuspect(3.1, Some(1.0)))
    assert(!Bench.isSuspect(2.9, Some(1.0)))
    assert(!Bench.isSuspect(3.1, None))
    // r12: floor lowered 0.5 -> 0.3 (the q_sample_hash crack); a 450 ms
    // reading at 3x+ a small line is now a flagged suspect...
    assert(Bench.isSuspect(0.45, Some(0.01)))
    assert(Bench.isSuspect(0.448, Some(0.124)))
    // ...but sub-300ms readings stay exempt (scheduler noise)
    assert(!Bench.isSuspect(0.29, Some(0.05)))
    // a zero/negative expectation line must not divide-by-zero its way
    // into a spurious retry storm
    assert(!Bench.isSuspect(3.1, Some(0.0)))
  }

  test("drift flag surfaces the silent 1.5-3x band") {
    assert(Bench.isDrifted(1.6, Some(1.0)))
    assert(Bench.isDrifted(2.7, Some(1.0))) // the r9 case that slid through
    assert(Bench.isDrifted(3.5, Some(1.0))) // suspects are also drifted
    assert(!Bench.isDrifted(1.4, Some(1.0)))
    assert(!Bench.isDrifted(1.6, None))
    assert(!Bench.isDrifted(1.6, Some(0.0)))
    // r11: gated on the EXPECTATION (>= 150 ms), not the reading — the
    // old best >= 0.5 floor hid q_interleave at 2.34x (line 0.174 s)
    assert(Bench.isDrifted(0.41, Some(0.174))) // the r10 hidden case
    // r12: a sub-150ms LINE at >= 3x with a >= 0.3 s reading is a suspect,
    // and suspects remain a subset of drifted
    assert(Bench.isDrifted(0.45, Some(0.1)))
    assert(!Bench.isDrifted(0.25, Some(0.1))) // 2.5x on a small line: muted
    // failed queries (-1 sentinel) never read as drifted
    assert(!Bench.isDrifted(-1.0, Some(1.0)))
  }

  test("expectation file round-trips through the TSV format, SF-keyed") {
    val tmp = java.nio.file.Files.createTempFile("bench_expected", ".tsv")
    java.nio.file.Files.write(tmp,
      ("# comment line\n" +
        "# sf sf0.1\n" +
        "q_alpha\t1.234\n" +
        "\n" +
        "q_beta\t0.5\n" +
        "malformed line without tab\n" +
        "q_gamma\tnot_a_number\n").getBytes("UTF-8"))
    val m = Bench.loadExpected(tmp, "/root/testdata/sf0.1")
    assert(m === Map("q_alpha" -> 1.234, "q_beta" -> 0.5))
    // r13: wall expectations are sf0.1 quantities — consulted at another
    // SF they would either flag everything or mute everything, so a
    // mismatched (or absent) sf header yields the empty map
    assert(Bench.loadExpected(tmp, "/root/testdata/sf0.01") === Map.empty)
    java.nio.file.Files.delete(tmp)
    val noHdr = java.nio.file.Files.createTempFile("bench_expected2", ".tsv")
    java.nio.file.Files.write(noHdr, "q_alpha\t1.0\n".getBytes("UTF-8"))
    assert(Bench.loadExpected(noHdr, "/root/testdata/sf0.1") === Map.empty)
    java.nio.file.Files.delete(noHdr)
    // missing file -> empty map (pre-r8 behavior, never a crash)
    assert(Bench.loadExpected(
      java.nio.file.Paths.get("/nonexistent/nope.tsv"),
      "/root/testdata/sf0.1") === Map.empty)
  }

  test("shape-drift flag: records primary (20%), bytes secondary (35%), " +
      "floors muted") {
    // record-count drift trips at 20% in both directions
    assert(Bench.isShapeDrift(1000000L, 130000L, Some((1000000L, 100000L))))
    assert(Bench.isShapeDrift(1000000L, 70000L, Some((1000000L, 100000L))))
    assert(!Bench.isShapeDrift(1000000L, 115000L, Some((1000000L, 100000L))))
    // byte drift alone needs 35% (compression/serialization wiggle on
    // identical rows was observed at ±18% — q_quality_checks)
    assert(!Bench.isShapeDrift(1300000L, 100000L, Some((1000000L, 100000L))))
    assert(Bench.isShapeDrift(1400000L, 100000L, Some((1000000L, 100000L))))
    assert(Bench.isShapeDrift(600000L, 100000L, Some((1000000L, 100000L))))
    // row floor: a bookkeeping-rows query tripling 100 -> 300 is muted...
    assert(!Bench.isShapeDrift(10000L, 300L, Some((10000L, 100L))))
    // ...but a NEW 50k-row shuffle appearing on a near-zero line trips
    assert(Bench.isShapeDrift(10000L, 50000L, Some((10000L, 0L))))
    // byte floor mutes few-KB jitter around tiny lines
    assert(!Bench.isShapeDrift(50000L, 100L, Some((10000L, 100L))))
    // a VANISHED shuffle (expected MBs/many rows, now ~0) trips
    assert(Bench.isShapeDrift(0L, 0L, Some((5000000L, 500000L))))
    // no committed line (new query) or failed run: exempt
    assert(!Bench.isShapeDrift(5000000L, 500000L, None))
    assert(!Bench.isShapeDrift(-1L, -1L, Some((1000000L, 100000L))))
  }

  test("shuffle baseline is SF-keyed: wrong-SF table is ignored") {
    val tmp = java.nio.file.Files.createTempFile("bench_bytes", ".tsv")
    java.nio.file.Files.write(tmp,
      ("# comment\n" +
        "# sf sf0.1\n" +
        "q_alpha\t123456\t7890\n" +
        "q_beta\tnot_a_number\t5\n" +
        "q_gamma\t1\n" + // old two-column format: dropped, not crashed
        "malformed\n").getBytes("UTF-8"))
    // matching SF basename -> parsed (malformed lines dropped)
    assert(Bench.loadExpectedBytes(tmp, "/root/testdata/sf0.1") ===
      Map("q_alpha" -> ((123456L, 7890L))))
    // shuffle volume scales with the data: consulting an sf0.1 table
    // while benching sf0.01 would flag every query at -90% — must be
    // EMPTY
    assert(Bench.loadExpectedBytes(tmp, "/root/testdata/sf0.01") ===
      Map.empty)
    java.nio.file.Files.delete(tmp)
    // a table with NO sf header never matches (fail closed), as does a
    // missing file
    val noHdr = java.nio.file.Files.createTempFile("bench_bytes2", ".tsv")
    java.nio.file.Files.write(noHdr, "q_alpha\t1\t1\n".getBytes("UTF-8"))
    assert(Bench.loadExpectedBytes(noHdr, "/root/testdata/sf0.1") ===
      Map.empty)
    java.nio.file.Files.delete(noHdr)
    assert(Bench.loadExpectedBytes(
      java.nio.file.Paths.get("/nonexistent/nope.tsv"),
      "/root/testdata/sf0.1") === Map.empty)
  }

  test("baselines are multi-section: each SF loads only its own lines " +
      "(r14)") {
    // one file, two '# sf' sections — each SF must see exactly its own
    // section. Pre-r14 the single-header parse meant an sf0.01 bench ran
    // with bytes_expected_n: 0, i.e. zero shape-drift protection on the
    // correctness-gate SF.
    val tmp = java.nio.file.Files.createTempFile("bench_multi", ".tsv")
    java.nio.file.Files.write(tmp,
      ("# comment before any section\n" +
        "q_orphan\t9\t9\n" + // before any header: belongs to no SF
        "# sf sf0.1\n" +
        "q_alpha\t1000\t100\n" +
        "# an interior comment must not end the section\n" +
        "q_beta\t2000\t200\n" +
        "# sf sf0.01\n" +
        "q_alpha\t10\t1\n").getBytes("UTF-8"))
    assert(Bench.loadExpectedBytes(tmp, "/root/testdata/sf0.1") ===
      Map("q_alpha" -> ((1000L, 100L)), "q_beta" -> ((2000L, 200L))))
    assert(Bench.loadExpectedBytes(tmp, "/root/testdata/sf0.01") ===
      Map("q_alpha" -> ((10L, 1L))))
    assert(Bench.loadExpectedBytes(tmp, "/root/testdata/sf1") ===
      Map.empty)
    java.nio.file.Files.delete(tmp)
    // the wall table shares the section parser
    val tmp2 = java.nio.file.Files.createTempFile("bench_multi2", ".tsv")
    java.nio.file.Files.write(tmp2,
      ("# sf sf0.1\nq_a\t1.5\n# sf sf0.01\nq_a\t0.2\nq_b\t0.3\n")
        .getBytes("UTF-8"))
    assert(Bench.loadExpected(tmp2, "/root/testdata/sf0.1") ===
      Map("q_a" -> 1.5))
    assert(Bench.loadExpected(tmp2, "/root/testdata/sf0.01") ===
      Map("q_a" -> 0.2, "q_b" -> 0.3))
    java.nio.file.Files.delete(tmp2)
  }

  test("committed byte baseline carries an sf0.01 section covering the " +
      "registry (r14)") {
    val path = java.nio.file.Paths.get("tools", "bench_bytes_expected.tsv")
    assume(java.nio.file.Files.exists(path), "byte baseline not generated")
    val m = Bench.loadExpectedBytes(path, "/root/testdata/sf0.01")
    assert(m.nonEmpty,
      "committed table must carry an '# sf sf0.01' section — the " +
        "correctness-gate SF gets no shape-drift protection without it")
    val registry = SparkEntry.queries.keySet
    val orphans = m.keySet.diff(registry)
    assert(orphans.isEmpty, s"sf0.01 byte lines for unknown queries: $orphans")
    assert(m.size > 50, s"sf0.01 byte baseline has only ${m.size} entries")
  }

  test("committed byte baseline covers the registry") {
    val path = java.nio.file.Paths.get("tools", "bench_bytes_expected.tsv")
    assume(java.nio.file.Files.exists(path), "byte baseline not generated")
    val m = Bench.loadExpectedBytes(path, "/root/testdata/sf0.1")
    assert(m.nonEmpty, "committed table must carry '# sf sf0.1' and rows")
    val registry = SparkEntry.queries.keySet
    val orphans = m.keySet.diff(registry)
    assert(orphans.isEmpty, s"byte lines for unknown queries: $orphans")
    assert(m.size > 50, s"byte baseline has only ${m.size} entries")
  }

  test("committed baseline carries an sf0.01 section covering the " +
      "registry (r15, VERDICT #7)") {
    // the 3x-line retry heuristic was inert at the correctness-gate SF
    // while the wall table had only an sf0.1 section; the sf0.01
    // section closes that (rows still carry the real signal there)
    val path = java.nio.file.Paths.get("tools", "bench_expected.tsv")
    assume(java.nio.file.Files.exists(path), "baseline not yet generated")
    val m = Bench.loadExpected(path, "/root/testdata/sf0.01")
    assert(m.nonEmpty, "committed table must carry '# sf sf0.01' and rows")
    val registry = SparkEntry.queries.keySet
    val orphans = m.keySet.diff(registry)
    assert(orphans.isEmpty, s"sf0.01 lines for unknown queries: $orphans")
    assert(m.size > 50, s"sf0.01 section has only ${m.size} entries")
  }

  test("committed baseline covers the registry") {
    val path = java.nio.file.Paths.get("tools", "bench_expected.tsv")
    assume(java.nio.file.Files.exists(path), "baseline not yet generated")
    val m = Bench.loadExpected(path, "/root/testdata/sf0.1")
    assert(m.nonEmpty, "committed table must carry '# sf sf0.1' and rows")
    // every baseline line names a real registry query (a rename would
    // silently orphan its expectation and disable the 3x trigger for the
    // renamed query)
    val registry = SparkEntry.queries.keySet
    val orphans = m.keySet.diff(registry)
    assert(orphans.isEmpty, s"baseline lines for unknown queries: $orphans")
    // and the baseline isn't degenerate
    assert(m.size > 50, s"baseline has only ${m.size} entries")
  }
}
