package graft

import graft.io.{Csv, QualtricsReader}
import graft.ops.{Dashboard, Recency}
import graft.pipeline.{VarinfoConfig, VarinfoUpdate}
import org.apache.spark.sql.functions._

/** End-to-end golden test on the reference's own example fixtures
  * (read in place from /root/reference/examples — read-only). Asserts the
  * invariants SURVEY.md §5.2 derives from the semantics. */
class PipelineSpec extends SparkSpec {

  private val responses =
    "/root/reference/examples/Qualtrics_raw_UCGSES2025.csv"
  private val prior =
    "/root/reference/examples/experience_cumulative-varinfo_updated-2024.csv"

  private def fixturesPresent: Boolean =
    new java.io.File(responses).exists && new java.io.File(prior).exists

  private lazy val cfg = VarinfoConfig(
    surveyYear = "2025",
    joinColumnText = "QuestionText.2023",
    joinColumnVar = "ITEM_NAME",
    maxStringDistance = 6)

  test("Qualtrics ingest: 262 variables + sentinel, multiline text intact") {
    assume(fixturesPresent)
    val ci = QualtricsReader.loadSurveyColumnInfo(spark, responses, "2025")
    assert(ci.count() === 263)
    assert(ci.columns.toSeq === Seq("QualtricsVariableName.2025",
      "QuestionText.2025", "SurveyAdminYear.2025"))
    // sentinel: NULL variable name, "" question text
    val sentinel = ci.filter(col("`QualtricsVariableName.2025`").isNull)
    assert(sentinel.count() === 1)
    assert(sentinel.select("`QuestionText.2025`").head().getString(0) === "")
    // the consent question text (column Q2) spans multiple lines in the
    // raw CSV — multiLine parsing must keep the embedded newlines
    val consent = ci.filter(col("`QualtricsVariableName.2025`") === "Q2")
      .select("`QuestionText.2025`").head().getString(0)
    assert(consent != null && consent.contains("\n"))
    assert(consent.startsWith("CONSENT TO PARTICIPATE"))
  }

  test("joinVarinfo: one row per prior codebook row, sane match stats") {
    assume(fixturesPresent)
    val ci = QualtricsReader.loadSurveyColumnInfo(spark, responses, "2025")
    val priorDf = Csv.readAsStrings(spark, prior)
    assert(priorDf.count() === 420)
    val (joined, unmatched, stats) =
      VarinfoUpdate.joinVarinfo(priorDf, ci, cfg)
    // left join + top-1 per row_id: exactly one output row per prior row
    assert(joined.count() === 420)
    assert(stats.totalVars === 263)
    assert(stats.exact > 0)       // identical question texts exist
    assert(stats.totalMatched >= stats.exact + stats.fuzzy - 1)
    // joined carries the dynamic columns + bookkeeping
    Seq("QualtricsVariableName.2025", "QuestionText.2025",
      "SurveyAdminYear.2025", "row_id", "string_distance").foreach { c =>
      assert(joined.columns.contains(c), s"missing $c")
    }
    // no unmatched variable appears among the matched ones
    val matchedVars = joined
      .select(col("`QualtricsVariableName.2025`")).na.drop()
      .collect().map(_.getString(0)).toSet
    val unmatchedVars = unmatched
      .select(col("`QualtricsVariableName.2025`")).na.drop()
      .collect().map(_.getString(0)).toSet
    assert(unmatchedVars.intersect(matchedVars).isEmpty)
    assert(unmatchedVars.nonEmpty)
  }

  test("sort_varinfo on the joined codebook: admin/meta first, ranked recency") {
    assume(fixturesPresent)
    val ci = QualtricsReader.loadSurveyColumnInfo(spark, responses, "2025")
    val priorDf = Csv.readAsStrings(spark, prior)
    val (joined, _, _) = VarinfoUpdate.joinVarinfo(priorDf, ci, cfg)
    val sorted = Recency.sortVarinfo(joined)
    assert(sorted.count() === 420)
    assert(sorted.columns.contains("most_recent"))
    // phase-1 bookkeeping (row_id/string_distance) survives into the full
    // codebook, as in the reference's written manual-update file; only the
    // internal sort helpers are dropped
    assert(!sorted.columns.contains("__graft_row_id"))
    assert(!sorted.columns.contains("__graft_priority"))
    val rows = sorted.select("ITEM_TYPE", "most_recent").collect()
    // every most_recent is a year the codebook knows, or null
    val years = Set("2021", "2022", "2023", "2024", "2025")
    assert(rows.forall(r => r.isNullAt(1) || years.contains(r.getString(1))))
    // the admin/metadata block is a prefix of the output
    val types = rows.map(r => Option(r.getString(0)).getOrElse(""))
    val firstNonAdmin = types.indexWhere(t =>
      t != "administrative" && t != "metadata")
    assert(types.drop(firstNonAdmin)
      .forall(t => t != "administrative" && t != "metadata"))
  }

  test("dashboard trim: no admin/meta/CONSENT, allow-listed columns only") {
    assume(fixturesPresent)
    val ci = QualtricsReader.loadSurveyColumnInfo(spark, responses, "2025")
    val priorDf = Csv.readAsStrings(spark, prior)
    val (joined, _, _) = VarinfoUpdate.joinVarinfo(priorDf, ci, cfg)
    val sorted = Recency.sortVarinfo(joined)
    val dash = Dashboard.dashboard(sorted, cfg.joinColumnVar)
    val allowed = (cfg.joinColumnVar +: Dashboard.DefaultColumns).toSet
    assert(dash.columns.forall(allowed.contains))
    val bad = dash.filter(col("ITEM_TYPE").isin("administrative", "metadata") ||
      col("ITEM_NAME") === "CONSENT")
    assert(bad.count() === 0)
  }

  test("blocked similarity kernel yields the identical joined codebook") {
    assume(fixturesPresent)
    val ci = QualtricsReader.loadSurveyColumnInfo(spark, responses, "2025")
    val priorDf = Csv.readAsStrings(spark, prior)
    val (broadcastJoined, _, statsA) =
      VarinfoUpdate.joinVarinfo(priorDf, ci, cfg)
    val (blockedJoined, _, statsB) = VarinfoUpdate.joinVarinfo(
      priorDf, ci, cfg.copy(broadcastRightLimit = 0L))
    assert(statsA === statsB)
    val key = Seq("row_id", "QualtricsVariableName.2025", "string_distance")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(key.map(c => col(s"`$c`")): _*).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
          Option(r.get(2)).map(_.toString))).toSet
    assert(snap(blockedJoined) === snap(broadcastJoined))
  }

  test("phase 2 rediscovers SurveyAdmin* from a human-EDITED schema") {
    import spark.implicits._
    // the phase-2 input is a file the engine didn't write (README.md:57-59):
    // the human may add/drop columns — recency discovery must work off the
    // actual runtime schema, never the phase-1 config
    val df = Seq(
      ("v1", "question", "2030", "x"),
      ("v2", "metadata", "2030", "y"),
      ("v3", "question", "", "z")
    ).toDF("ITEM_NAME", "ITEM_TYPE", "SurveyAdminEdited2030", "OTHER")
    val sorted = Recency.sortVarinfo(df)
    val rows = sorted.select("ITEM_NAME", "most_recent").collect()
    // the human-invented SurveyAdminEdited2030 column was discovered
    assert(rows.collect {
      case r if !r.isNullAt(1) => r.getString(1)
    }.toSet === Set("2030"))
    // metadata first, then ranked, then the no-value row last
    assert(rows.map(_.getString(0)).toSeq === Seq("v2", "v1", "v3"))
  }

  test("two-phase checkpoint protocol writes single-file CSVs") {
    assume(fixturesPresent)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val c = cfg.copy(responseFile = responses, priorVarinfoFile = prior,
      workDir = tmp, varinfoFolder = tmp)
    VarinfoUpdate.phase1(spark, c)
    assert(new java.io.File(c.needsManualUpdateFile).isFile)
    assert(new java.io.File(c.unmatchedVarsFile).isFile)
    // simulate the human edit: accept the file unchanged
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(c.needsManualUpdateFile),
      java.nio.file.Paths.get(c.manuallyUpdatedFile))
    val sorted = VarinfoUpdate.phase2(spark, c)
    assert(new java.io.File(c.outputFile).isFile)
    assert(new java.io.File(c.trimmedOutputFile).isFile)
    assert(sorted.count() === 420)
    // resumed file round-trips through CSV with embedded newlines intact
    val reread = Csv.readAsStrings(spark, c.outputFile)
    assert(reread.count() === 420)
    // the cumulative codebook must not leak phase 1's join internals: the
    // reference's own cumulative fixture carries neither, and the NEXT
    // cycle reuses this file as priorVarinfoFile — withRowId1 would hit
    // an ambiguous row_id reference otherwise
    assert(!reread.columns.contains("row_id") &&
      !reread.columns.contains("string_distance"),
      "phase-2 output must drop row_id/string_distance")
    // full next-cycle round trip: the output joins as the prior codebook
    // under the NEXT survey year (the real cadence — this year's columns
    // are already in the cumulative file, next cycle brings new names)
    val c2 = c.copy(surveyYear = "2026")
    val ci = QualtricsReader.loadSurveyColumnInfo(
      spark, c2.responseFile, c2.surveyYear)
    val (joined2, _, stats2) = VarinfoUpdate.joinVarinfo(reread, ci, c2)
    assert(joined2.count() === 420 && stats2.totalVars > 0)
  }

  test("permissive JSONL read quarantines malformed lines, keeps good ones") {
    import graft.io.Jsonl
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "batch.jsonl"),
      """{"id": 1, "text": "good"}
        |{"id": 2 "text": MALFORMED
        |{"id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // Spark disallows plans that reference ONLY the corrupt column over
    // raw JSON (it would skip parsing entirely) — cache the parsed batch
    // first, the documented pattern for quarantine flows
    val out = Jsonl.readPermissive(spark, dir, schema).cache()
    assert(out.count() === 3)
    val bad = out.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1 && bad(0).isNullAt(0),
      "malformed line lands with null fields + raw line preserved")
    assert(out.filter(col("_corrupt_record").isNull).count() === 2)
  }

  test("CSV round-trips adversarial quoted content exactly (seeded fuzz)") {
    import graft.io.Csv
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(2024)
    // the characters that break naive CSV: quotes, commas, newlines, CRs,
    // backslashes (Spark's default escape), leading/trailing spaces
    val alphabet = Array('a', 'b', '"', ',', '\n', '\r', '\\', ' ', '\'')
    def cell(): Option[String] =
      if (rnd.nextInt(10) == 0) None // genuine nulls must survive as NA
      else Some((0 until rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val spark2 = spark
    import spark2.implicits._
    val rows = (1 to 300).map(i => (i.toLong, cell(), cell()))
    val df = rows.toDF("id", "c1", "c2")
    val path = java.nio.file.Files.createTempDirectory("graft_csvfuzz")
      .toString + "/fuzz.csv"
    Csv.writeSingle(df, path)
    val back = Csv.readAsStrings(spark, path)
      .select(col("id").cast("long"), col("c1"), col("c2"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1)
    // readr semantics folded in: empty string reads back as "" (kept),
    // null writes as NA and reads back as null; everything else must be
    // byte-identical through quoting, escaping, and embedded newlines.
    // One irreducible ambiguity: a cell containing the literal text "NA"
    // would ALSO read back as null (same as readr) — the alphabet above
    // cannot produce it, so the expectation is exact.
    val expected = rows.map { case (i, a, b) =>
      (i, a.filter(_ => a.get != "NA"), b.filter(_ => b.get != "NA"))
    }.sortBy(_._1)
    assert(back.toSeq === expected)
  }

  test("splittable CSV reader is byte-identical to multiLine on the fixtures") {
    assume(fixturesPresent)
    import graft.io.CsvSplit
    // blockSize far below file size forces many splits, with boundaries
    // landing inside the CONSENT rows' quoted embedded newlines — the
    // case plain TextInputFormat splitting corrupts
    for (f <- Seq(prior, responses)) {
      val stock = Csv.readAsStrings(spark, f)
      val split = CsvSplit.read(spark, f, inferSchema = false,
        blockSize = 4096)
      assert(split.schema === stock.schema, s"schema parity for $f")
      assert(split.collect().toSeq === stock.collect().toSeq,
        s"row parity (incl. order) for $f")
    }
    // inferSchema parity too: typed columns must infer identically
    val stockTyped = Csv.read(spark, prior)
    val splitTyped = CsvSplit.read(spark, prior, blockSize = 4096)
    assert(splitTyped.schema === stockTyped.schema)
    assert(splitTyped.collect().toSeq === stockTyped.collect().toSeq)
  }

  test("splittable CSV survives adversarial quoting at 64-byte splits") {
    import graft.io.{Csv, CsvSplit}
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(4031)
    val alphabet = Array('a', 'b', '"', ',', '\n', '\r', ' ', '\'')
    def cell(): Option[String] =
      if (rnd.nextInt(10) == 0) None
      else Some((0 until rnd.nextInt(16))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val spark2 = spark
    import spark2.implicits._
    val rows = (1 to 400).map(i => (i.toLong, cell(), cell()))
    val dir = java.nio.file.Files.createTempDirectory("graft_csvsplit")
      .toString
    Csv.writeSingle(rows.toDF("id", "c1", "c2"), s"$dir/fuzz.csv")
    val stock = Csv.readAsStrings(spark, s"$dir/fuzz.csv")
    // 64-byte blocks: every record spans blocks, most quoted fields
    // straddle a boundary, many blocks START inside quotes
    val split = CsvSplit.read(spark, s"$dir/fuzz.csv",
      inferSchema = false, blockSize = 64)
    assert(split.schema === stock.schema)
    assert(split.collect().toSeq === stock.collect().toSeq)
  }

  test("splittable CSV edge cases: EOF, CRLF, header-only, huge blocks") {
    import graft.io.{Csv, CsvSplit}
    val dir = java.nio.file.Files.createTempDirectory("graft_csvedge")
    def write(name: String, text: String) = {
      val f = dir.resolve(name)
      java.nio.file.Files.write(f, text.getBytes("UTF-8"))
      f.toString
    }
    def parity(path: String, blockSize: Long): Unit = {
      val stock = Csv.readAsStrings(spark, path)
      val split = CsvSplit.read(spark, path, inferSchema = false, blockSize)
      assert(split.schema === stock.schema, s"schema parity for $path")
      assert(split.collect().toSeq === stock.collect().toSeq,
        s"row parity for $path at blockSize=$blockSize")
    }
    // no trailing newline — final record ends at EOF
    parity(write("noeol.csv", "a,b\n1,x\n2,y"), 16)
    // quoted field runs to the last byte of the file
    parity(write("qeof.csv", "a,b\n1,\"x\ny\""), 16)
    // CRLF terminators throughout, including inside a quoted field
    parity(write("crlf.csv", "a,b\r\n1,\"x\r\nz\"\r\n2,y\r\n"), 16)
    // header only, no data rows
    parity(write("hdr.csv", "a,b\n"), 16)
    // blockSize far larger than the file — single block, single task
    parity(write("big.csv", "a,b\n1,x\n2,y\n"), 1 << 20)
    // header with a quoted embedded newline in a column name
    parity(write("qhdr.csv", "\"a\nx\",b\n1,y\n"), 16)
    // quoted bare \n BEFORE the first \r\n terminator: univocity's
    // separator detector scans raw chars (quote-blind) and picks \n, so
    // quoted \r\n is NOT normalized — the splitter must agree
    parity(write("qhdrcrlf.csv", "\"a\nx\",b\r\n1,\"p\r\nq\"\r\n"), 16)
  }

  test("splittable CSV keeps data rows byte-equal to the header line") {
    import graft.io.{Csv, CsvSplit}
    val dir = java.nio.file.Files.createTempDirectory("graft_csvhdr")
    val f = dir.resolve("h.csv")
    // row 2 repeats the header verbatim (concatenated exports do this);
    // the multiLine file reader keeps it as a data row — the splitter
    // must too (csv(Dataset[String]) with header=true would drop it)
    java.nio.file.Files.write(f,
      "id,c1,c2\n1,a,b\nid,c1,c2\n2,c,d\n".getBytes("UTF-8"))
    val stock = Csv.readAsStrings(spark, f.toString)
    val split = CsvSplit.read(spark, f.toString, inferSchema = false,
      blockSize = 16)
    assert(stock.count() === 3, "stock reader keeps the interior header row")
    assert(split.schema === stock.schema)
    assert(split.collect().toSeq === stock.collect().toSeq)
  }

  test("splittable CSV reads a multi-file directory like the stock reader") {
    import graft.io.{Csv, CsvSplit}
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csvdir")
      .toString
    val a = (1 to 50).map(i => (i.toLong, s"alpha\n$i", s"x,$i"))
    val b = (51 to 90).map(i => (i.toLong, s"beta \"$i\"", s"y\r\n$i"))
    Csv.writeSingle(a.toDF("id", "c1", "c2"), s"$dir/a.csv")
    Csv.writeSingle(b.toDF("id", "c1", "c2"), s"$dir/b.csv")
    val stock = Csv.readAsStrings(spark, dir)
    val split = CsvSplit.read(spark, dir, inferSchema = false,
      blockSize = 128)
    assert(split.schema === stock.schema)
    // the stock reader packs whole files into partitions by SIZE, so row
    // order across files differs by design — compare as ordered-by-key
    val key = col("id").cast("long")
    assert(split.orderBy(key).collect().toSeq ===
      stock.orderBy(key).collect().toSeq)
    // every later file's header line is dropped exactly once
    assert(split.count() === 90)
  }

  test("compressed CSV: routing contract + decompress-then-split parity") {
    import graft.io.{Csv, CsvSplit}
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csvgz")
      .toString
    val rows = (1 to 80).map(i => (i.toLong, s"v\n$i", s"q\"$i\""))
    Csv.writeSingle(rows.toDF("id", "c1", "c2"), s"$dir/data.csv")
    // gzip the file the way an exporter would (plaintext removed)
    val plain = java.nio.file.Paths.get(s"$dir/data.csv")
    val gz = java.nio.file.Paths.get(s"$dir/data.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    try out.write(java.nio.file.Files.readAllBytes(plain))
    finally out.close()
    java.nio.file.Files.delete(plain)
    // the stock reader handles the .gz transparently — this is the path
    // Csv.read routes compressed inputs to regardless of size
    val stock = Csv.readAsStrings(spark, dir)
    assert(stock.count() === 80)
    // decompress-then-split: staged plaintext through the splittable
    // reader is row-identical to the stock read of the gzip
    val staging = java.nio.file.Files
      .createTempDirectory("graft_csvgz_stage").toString
    val effective = CsvSplit.decompressToSplittable(spark, dir, staging)
    val split = CsvSplit.readFiles(spark, effective, inferSchema = false,
      blockSize = 128)
    assert(split.schema === stock.schema)
    val key = col("id").cast("long")
    assert(split.orderBy(key).collect().toSeq ===
      stock.orderBy(key).collect().toSeq)
    // staged name = digest(full source path) + source name + ".raw":
    // the digest keeps same-basename files from different directories
    // apart, keeping the source name keeps data.csv.gz apart from a
    // plain data.csv twin, and the .raw suffix keeps the plaintext from
    // re-matching the codec factory
    val stagedNames = new java.io.File(staging).listFiles.map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
    assert(stagedNames.size === 1 &&
      stagedNames.head.matches("[0-9a-f]{12}_data\\.csv\\.gz\\.raw"),
      s"unexpected staged names: $stagedNames")
    // r12: plain members are NOT copied through staging — they are read
    // in place (the returned list points at the originals)
    val twinDir = java.nio.file.Files
      .createTempDirectory("graft_csvgz_twin").toString
    val hdr = "id,c1\n" + (0 until 3).map(i => s"$i,x$i").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(twinDir, "data.csv"), hdr)
    val gzo = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(twinDir, "data.csv.gz")))
    try gzo.write(("id,c1\n" + (10 until 13).map(i => s"$i,y$i")
      .mkString("\n")).getBytes("UTF-8"))
    finally gzo.close()
    val twinStage = java.nio.file.Files
      .createTempDirectory("graft_csvgz_tst").toString
    val twinEff = CsvSplit.decompressToSplittable(spark, twinDir, twinStage)
    assert(new java.io.File(twinStage).listFiles.map(_.getName)
      .filterNot(_.startsWith(".")).toSeq
      .forall(_.matches("[0-9a-f]{12}_data\\.csv\\.gz\\.raw")),
      "only the compressed twin may be staged")
    assert(twinEff.exists(_.endsWith("data.csv")) &&
      twinEff.exists(_.endsWith(".raw")) && twinEff.size === 2,
      s"effective list must mix in-place plain + staged: $twinEff")
    assert(CsvSplit.readFiles(spark, twinEff, inferSchema = false,
      blockSize = 128).count() === 6, "both twins' rows must survive")
    // r12 regression: same-BASENAME compressed files matched from
    // DIFFERENT directories must not clobber each other in staging (the
    // pre-digest naming staged both to one destination and silently
    // dropped a whole input file's rows)
    val multiRoot = java.nio.file.Files
      .createTempDirectory("graft_csvgz_multi")
    for ((sub, base) <- Seq(("day1", 100), ("day2", 200))) {
      val d = multiRoot.resolve(sub)
      java.nio.file.Files.createDirectory(d)
      val gz = new java.util.zip.GZIPOutputStream(
        java.nio.file.Files.newOutputStream(d.resolve("part-0.csv.gz")))
      try gz.write(("id,c1\n" + (base until base + 3)
        .map(i => s"$i,z$i").mkString("\n")).getBytes("UTF-8"))
      finally gz.close()
    }
    val multiStage = java.nio.file.Files
      .createTempDirectory("graft_csvgz_mst").toString
    val multiEff = CsvSplit.decompressToSplittable(
      spark, s"$multiRoot/*", multiStage)
    assert(multiEff.size === 2 && multiEff.distinct.size === 2,
      s"two staged destinations expected: $multiEff")
    val multiRows = CsvSplit.readFiles(spark, multiEff,
      inferSchema = false, blockSize = 128)
    assert(multiRows.count() === 6,
      "rows from BOTH same-basename sources must survive staging")
    assert(multiRows.select(col("id").cast("long")).collect()
      .map(_.getLong(0)).toSet === Set(100L, 101L, 102L, 200L, 201L, 202L))
  }

  test("splittable CSV refuses multi-file inputs with disagreeing headers") {
    import graft.io.{Csv, CsvSplit}
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csvhdr")
      .toString
    Csv.writeSingle(Seq((1L, "a")).toDF("id", "c1"), s"$dir/a.csv")
    Csv.writeSingle(Seq((2L, "b")).toDF("id", "OTHER"), s"$dir/b.csv")
    val e = intercept[IllegalArgumentException] {
      CsvSplit.read(spark, dir, inferSchema = false, blockSize = 128)
    }
    assert(e.getMessage.contains("headers disagree"))
  }

  test("JSONL sink/source round-trips documents exactly (schema-first read)") {
    import graft.io.Jsonl
    import org.apache.spark.sql.functions.col
    val docs = Util.table(spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, docs.schema)
    assert(back.schema === docs.schema)
    val a = docs.orderBy(col("doc_id")).collect().map(_.toSeq)
    val b = back.orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
