package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** S1 at scale — splittable RFC-4180 CSV ingest
  * (reference varinfo-update.R:54 `read_csv`; SURVEY §7.4 scale note).
  *
  * Spark's `multiLine=true` CSV reader — which S1 fidelity needs for the
  * CONSENT rows' embedded newlines — disables input splitting: one task
  * per file, however large. This is the two-pass quoted-newline-aware
  * splitter that restores parallelism:
  *
  *  - '''pass 1''' (parallel): count quote bytes per fixed-size block —
  *    one long per block. The driver folds the counts into the quote
  *    PARITY at each block start. RFC-4180 has no backslash escapes:
  *    every `"` toggles quoted state, and a doubled `""` toggles twice
  *    (net zero), so parity-at-offset == "is offset inside a quoted
  *    field" without parsing anything.
  *  - '''pass 2''' (parallel): each block, seeded with its start parity,
  *    scans for record boundaries (newlines at unquoted positions) and
  *    emits the raw text of the records it OWNS — TextInputFormat's
  *    ownership contract generalized to quotes: block 0 owns records
  *    starting in `[0, end]`, later blocks `(start, end]`, each reading
  *    past its `end` to finish a tail record. No record is emitted
  *    twice, none is dropped, and no task ever holds more than one
  *    block plus one record.
  *
  * The record strings then feed Spark's OWN univocity parser via
  * `csv(Dataset[String])` with `header=false` and an explicitly-bound
  * schema (per-file header records are dropped by the splitter itself —
  * the dataset path's header=true would drop every data row byte-equal
  * to the header, which the file reader keeps), so quoting, escape,
  * nullValue, header naming and schema-inference semantics are identical
  * to [[Csv.read]] — only record-boundary discovery is replaced.
  * PipelineSpec pins both paths byte-identical on the reference's
  * CONSENT fixture and on synthetic multi-split corpora with boundaries
  * landing inside quoted newlines. Known divergence: whitespace-only
  * records are dropped here (Spark's dataset-CSV line filter) but
  * surface as a one-field row from the file reader; RFC-4180 writers
  * produce neither.
  *
  * Scale ledger: driver state is O(blocks) — the pass-1 count map, the
  * range and block descriptor lists and the parity map together cost
  * ~100-200 bytes per block with JVM boxing, so a 100 TB input at the
  * default 32 MiB blocks (~3.3M blocks) holds roughly 300-600 MB on the
  * driver, and pass 2 schedules one task per block. At that scale raise
  * `blockSize` to 128-256 MiB: driver state and task count shrink
  * linearly (and a 256 MiB block is still one in-memory buffer per
  * task). The default suits the tens-of-GB class the reference's
  * exports actually reach. Requires well-formed RFC-4180 quoting
  * (readr, Qualtrics exports and Spark's own writer all produce it),
  * `\n` / `\r\n` line endings, and UNCOMPRESSED input — byte ranges of
  * a compressed stream are not scannable ([[Csv.read]] never routes
  * compressed files here; [[decompressToSplittable]] stages them).
  */
object CsvSplit {

  /** Splittable equivalent of [[Csv.read]]. `blockSize` is the split
    * granularity; tests shrink it to force many splits over tiny files.
    * With `inferSchema=true` the inference pass re-reads the input once
    * more (same cost class as the file-based reader's inference scan). */
  def read(spark: SparkSession, path: String,
           inferSchema: Boolean = true,
           blockSize: Long = 32L * 1024 * 1024): DataFrame = {
    val sconf = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(path).getFileSystem(sconf.value)
    // same file set Spark's csv(path) would read: data files only, no
    // _SUCCESS / hidden files; deterministic order so the global first
    // record is file 0's header
    val rootStatus = fs.globStatus(new Path(path))
    require(rootStatus != null && rootStatus.nonEmpty,
      s"csv input not found: $path")
    val children = rootStatus.toSeq.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }
    // one flat level only — nested layouts (hive partitions etc.) would
    // silently lose their files here; fail loudly and leave those to the
    // stock reader's partition discovery
    val nested = children.filter(s => s.isDirectory &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    require(nested.isEmpty,
      s"CsvSplit.read expects a file or a flat directory of files; $path " +
        s"contains subdirectories (${nested.take(3).map(_.getPath.getName)
          .mkString(", ")}...) — read nested layouts with the stock reader")
    val files: Seq[(String, Long)] = children
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => (st.getPath.toString, st.getLen))
      .filter(_._2 > 0L)
      .sortBy(_._1)

    if (files.isEmpty)
      return Csv.read(spark, path, inferSchema) // empty input: same answer
    readCore(spark, sconf, files, inferSchema, blockSize, path)
  }

  /** Splittable reader over an EXPLICIT file list (no glob expansion) —
    * the decompress route reads staged plaintext and untouched plain
    * originals IN PLACE, possibly from different directories or even
    * different filesystems, without copying the plain members anywhere.
    * Same parsing contract as [[read]]. */
  def readFiles(spark: SparkSession, paths: Seq[String],
                inferSchema: Boolean = true,
                blockSize: Long = 32L * 1024 * 1024): DataFrame = {
    require(paths.nonEmpty, "readFiles needs at least one path")
    val sconf = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val files: Seq[(String, Long)] = paths.map { p =>
      val hp = new Path(p)
      val st = hp.getFileSystem(sconf.value).getFileStatus(hp)
      require(st.isFile, s"readFiles takes concrete files, got " +
        s"directory $p — enumerate it (or use read) first")
      (st.getPath.toString, st.getLen)
    }.filter(_._2 > 0L).sortBy(_._1)
    if (files.isEmpty) // every input empty: the stock reader's answer
      return spark.read
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", "\"")
        .option("nullValue", "NA")
        .option("inferSchema", inferSchema.toString)
        .csv(paths: _*)
    readCore(spark, sconf, files, inferSchema, blockSize,
      if (paths.size == 1) paths.head
      else s"${paths.head} (+${paths.size - 1} more)")
  }

  /** The two-pass splittable scan over a resolved (path, length) list.
    * `label` only feeds error messages. */
  private def readCore(spark: SparkSession,
                       sconf: SerializableWritable[Configuration],
                       files: Seq[(String, Long)], inferSchema: Boolean,
                       blockSize: Long, label: String): DataFrame = {
    require(blockSize >= 16, s"blockSize must be >= 16 bytes, got $blockSize")
    val path = label

    // block ranges per file
    val ranges: Seq[(String, Int, Int, Long, Long)] = for {
      ((f, len), fi) <- files.zipWithIndex
      nBlocks = ((len + blockSize - 1) / blockSize).toInt
      bi <- 0 until nBlocks
    } yield (f, fi, bi, bi * blockSize, math.min((bi + 1L) * blockSize, len))

    // pass 1: quote count per block (distributed; result is block-count
    // longs — the only driver-resident state this reader keeps). Block 0
    // of each file also reports the file's line-terminator style (was
    // the first unquoted newline preceded by \r?) — univocity normalizes
    // \r\n INSIDE quoted values to \n when the file's separator is \r\n,
    // and pass 2 must reproduce that to stay byte-identical.
    val pass1: Map[(Int, Int), (Long, Option[Boolean])] = spark.sparkContext
      .parallelize(ranges, ranges.size)
      .map { case (f, fi, bi, s, e) =>
        ((fi, bi), scanBlock(sconf.value, f, s, e, detectTerm = bi == 0))
      }
      .collect().toMap
    val counts = pass1.view.mapValues(_._1).toMap
    val crlfByFile: Map[Int, Boolean] = files.indices.map { fi =>
      fi -> pass1((fi, 0))._2.getOrElse(
        // header longer than one block (no terminator in block 0):
        // resolve with a driver scan of that file
        usesCrlf(sconf.value, files(fi)._1))
    }.toMap

    // prefix parity: is block (fi, bi)'s first byte inside a quoted field?
    val parity: Map[(Int, Int), Boolean] = ranges.groupBy(_._2).flatMap {
      case (fi, rs) =>
        var acc = 0L
        rs.sortBy(_._3).map { case (_, _, bi, _, _) =>
          val p = (fi, bi) -> ((acc & 1L) == 1L)
          acc += counts((fi, bi))
          p
        }
    }

    val blocks = ranges.map { case (f, fi, bi, s, e) =>
      // Spark's file reader drops the first line of EVERY file under
      // header=true; mirror that here. The header itself is parsed
      // separately below — feeding it through csv(ds) with header=true
      // would trip Spark's filterHeaderLine, which drops EVERY data row
      // byte-equal to the header (unlike the file reader).
      Block(f, s, e, parity((fi, bi)), dropFirst = bi == 0,
        crlf = crlfByFile(fi))
    }

    // column names via Spark's own header machinery (quoting, duplicate-
    // name deduplication) — a one-element dataset parse, no data rows.
    // Every file's header must MATCH the first file's: the stock reader
    // binds names from its own partition-packing order (size-descending),
    // so disagreeing per-file headers would make the two paths silently
    // bind different column names — fail loudly instead. (One driver
    // read of the first record per file, the same cost class as the
    // crlf fallback scan.)
    val header = headerRecord(sconf.value, files.head._1, crlfByFile(0))
    files.zipWithIndex.drop(1).foreach { case ((f, _), fi) =>
      val h = headerRecord(sconf.value, f, crlfByFile(fi))
      require(h == header,
        s"csv at $path: per-file headers disagree — ${files.head._1} has " +
          s"'$header' but $f has '$h'; the splittable reader requires one " +
          "shared header (and the stock reader would bind names " +
          "arbitrarily by partition packing order)")
    }
    val names = spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", "NA")
      .csv(spark.createDataset(Seq(header))(Encoders.STRING))
      .schema.fieldNames

    // pass 2: records in file order (parallelize keeps Seq order across
    // partitions; flatMap keeps order within each), parsed by Spark's own
    // csv reader with the exact Csv.read option set sans multiLine.
    // header=false everywhere below: the per-file header records are
    // already dropped above, so a data row that happens to equal the
    // header line survives, exactly as in the multiLine file reader.
    val recordsRdd = spark.sparkContext
      .parallelize(blocks, blocks.size)
      .flatMap(b => records(sconf.value, b))
    val ds = spark.createDataset(recordsRdd)(Encoders.STRING)
    val strings = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType, nullable = true)))
    def parse(dataSchema: org.apache.spark.sql.types.StructType) =
      spark.read
        .option("header", "false")
        .option("escape", "\"")
        .option("nullValue", "NA")
        .schema(dataSchema)
        .csv(ds)
    if (!inferSchema) parse(strings)
    else {
      // infer types with Spark's own CSV inference over the data records
      // (same pass the stock reader runs), then bind the header's names
      val inferred = spark.read
        .option("header", "false")
        .option("inferSchema", "true")
        .option("escape", "\"")
        .option("nullValue", "NA")
        .csv(ds)
        .schema
      if (inferred.isEmpty) parse(strings) // header-only input: no rows
      else {
        require(inferred.length == names.length,
          s"csv at $path: ${names.length} header columns but data rows " +
            s"infer ${inferred.length} columns — ragged input needs " +
            "inferSchema=false")
        parse(org.apache.spark.sql.types.StructType(
          names.zip(inferred).map { case (n, f) => f.copy(name = n) }))
      }
    }
  }

  /** Stage the COMPRESSED members of `path` as splittable plaintext
    * under `stagingDir` and return the effective file list for
    * [[readFiles]]: the staged plaintext plus the untouched plain
    * originals IN PLACE. (Pre-r12 this copied plain files through the
    * staging dir too — pure wasted sequential I/O and doubled storage
    * when one oversized .gz sits next to terabytes of already-splittable
    * plaintext.) Each compressed file (by Hadoop codec extension)
    * decompresses in one distributed task — the stream is inherently
    * sequential, but every DOWNSTREAM pass over the staged bytes is
    * splittable, which is the trade a >256 MiB gzip member forces.
    * Staged names carry a digest of the FULL source path, so
    * same-basename files matched from different directories (a glob
    * like /exports/[star]/part-00000.csv.gz) never clobber each other;
    * keeping the full source name after the digest (rather than
    * stripping the codec suffix) keeps data.csv.gz apart from a plain
    * data.csv twin, and the .raw suffix keeps the staged file from
    * re-matching the codec factory downstream. Idempotent: outputs are
    * overwritten, so a re-run (or a crashed earlier run) converges. The
    * caller owns deleting `stagingDir` when done. */
  def decompressToSplittable(spark: SparkSession, path: String,
                             stagingDir: String): Seq[String] = {
    val sconf = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(path).getFileSystem(sconf.value)
    val rootStatus = fs.globStatus(new Path(path))
    require(rootStatus != null && rootStatus.nonEmpty,
      s"csv input not found: $path")
    val files = rootStatus.toSeq
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString)
    // split by CODEC detection (driver-side; the factory keys on
    // extension, same as the executors') so a codec-known extension
    // outside Csv's routing list still decompresses rather than being
    // left in place and parsed downstream as garbage bytes
    val factory = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      sconf.value)
    val (compressed, plain) = files.partition { f =>
      factory.getCodec(new Path(f)) != null ||
        Csv.isCompressedName(new Path(f).getName)
    }
    def stagedName(f: String): String = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(6).map("%02x".format(_)).mkString
      digest + "_" + new Path(f).getName + ".raw"
    }
    if (compressed.nonEmpty) {
      new Path(stagingDir).getFileSystem(sconf.value)
        .mkdirs(new Path(stagingDir))
      spark.sparkContext
        .parallelize(compressed, math.max(1, compressed.size))
        .foreach { f =>
          val conf = sconf.value
          val src = new Path(f)
          val srcFs = src.getFileSystem(conf)
          val codec = Option(
            new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
              .getCodec(src))
          // a compressed-by-extension file whose codec is unavailable
          // (e.g. zstd without native hadoop libs) must fail here, not
          // get staged verbatim and parsed downstream as garbage
          // plaintext
          require(codec.nonEmpty,
            s"no hadoop codec available for compressed file $f — " +
              "decompress it externally or add the codec to the cluster")
          val dst = new Path(stagingDir, stagedName(f))
          val dstFs = dst.getFileSystem(conf)
          val in = codec.get.createInputStream(srcFs.open(src))
          try {
            val out = dstFs.create(dst, true)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n >= 0) {
                if (n > 0) out.write(buf, 0, n)
                n = in.read(buf)
              }
            } finally out.close()
          } finally in.close()
        }
    }
    compressed.map(f => new Path(stagingDir, stagedName(f)).toString) ++
      plain
  }

  private case class Block(file: String, start: Long, end: Long,
                           startsInQuote: Boolean, dropFirst: Boolean,
                           crlf: Boolean)

  /** First record of the file — the header — with the same quote-aware
    * scan and \r\n normalization pass 2 applies (headers can contain
    * quoted embedded newlines). Standalone so the driver-side read
    * closes its stream deterministically. */
  private def headerRecord(conf: Configuration, file: String,
                           crlf: Boolean): String = {
    val raw = new Path(file).getFileSystem(conf).open(new Path(file))
    val in = new java.io.BufferedInputStream(raw, ReadBuf)
    try {
      val buf = new java.io.ByteArrayOutputStream(256)
      var inQuote = false
      var done = false
      var pushback = -2
      def nb(): Int =
        if (pushback != -2) { val v = pushback; pushback = -2; v }
        else in.read()
      while (!done) {
        if (buf.size >= MaxRecordBytes) throw new java.io.IOException(
          s"csv header of $file exceeds $MaxRecordBytes bytes — " +
            "unbalanced quote in the input?")
        val v = nb()
        if (v < 0) done = true
        else if (v == '"') { inQuote = !inQuote; buf.write(v) }
        else if (v == '\n' && !inQuote) done = true
        else if (v == '\r' && inQuote && crlf) {
          val n2 = nb()
          if (n2 == '\n') buf.write('\n')
          else { buf.write('\r'); pushback = n2 }
        }
        else buf.write(v)
      }
      val bytes = buf.toByteArray
      val n = // same conditional \r strip as records() — see there
        if (crlf && bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
          bytes.length - 1
        else bytes.length
      new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  private val ReadBuf = 1 << 16

  /** Pass 1 kernel: `"` bytes in `[start, end)`, plus (for block 0) the
    * file's terminator style — Some(true) when the FIRST newline (quote-
    * BLIND, matching univocity's raw-stream separator detector) is
    * preceded by `\r`; None if the block holds no newline at all. Quote
    * and newline are single bytes that never occur inside UTF-8
    * multibyte sequences, so byte-level scanning is encoding-safe. */
  private def scanBlock(conf: Configuration, file: String,
                        start: Long, end: Long,
                        detectTerm: Boolean): (Long, Option[Boolean]) = {
    val in = new Path(file).getFileSystem(conf).open(new Path(file))
    try {
      in.seek(start)
      val buf = new Array[Byte](ReadBuf)
      var remaining = end - start
      var quotes = 0L
      var term: Option[Boolean] = None
      var prev: Int = -1
      while (remaining > 0) {
        val n = in.read(buf, 0, math.min(remaining, ReadBuf.toLong).toInt)
        if (n < 0) remaining = 0
        else {
          var i = 0
          while (i < n) {
            val v = buf(i)
            if (v == '"') quotes += 1
            if (detectTerm && term.isEmpty && v == '\n')
              term = Some(prev == '\r')
            prev = v
            i += 1
          }
          remaining -= n
        }
      }
      (quotes, term)
    } finally in.close()
  }

  /** Driver fallback for [[scanBlock]]'s terminator detection when a
    * file's first newline sits past block 0 (quote-blind, like the
    * block-0 scan — see scanBlock). */
  private def usesCrlf(conf: Configuration, file: String): Boolean = {
    val raw = new Path(file).getFileSystem(conf).open(new Path(file))
    val in = new java.io.BufferedInputStream(raw, ReadBuf)
    try {
      var prev = -1
      var v = in.read()
      while (v >= 0) {
        if (v == '\n') return prev == '\r'
        prev = v
        v = in.read()
      }
      false
    } finally in.close()
  }

  /** A malformed file (unbalanced quote) would otherwise make "one
    * record" swallow the rest of the input silently. */
  private val MaxRecordBytes = 256 << 20

  /** Pass 2 kernel: the records owned by `b`, in order, as raw strings
    * (terminator excluded, one trailing `\r` stripped — univocity sees
    * the same text the multiLine file parser would). */
  private def records(conf: Configuration, b: Block): Iterator[String] = {
    val raw = new Path(b.file).getFileSystem(conf).open(new Path(b.file))
    raw.seek(b.start)
    val in = new java.io.BufferedInputStream(raw, ReadBuf)
    // the parser may stop consuming early (limit pushdown); close on task
    // completion, not on iterator exhaustion
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
    var pos = b.start
    var inQuote = b.startsInQuote
    var eof = false
    // one-byte pushback for the quoted-\r\n lookahead; always drained
    // before a record boundary, never double-counted in pos
    var pushback = -2

    def nextByte(): Int = {
      val v = in.read()
      if (v < 0) { eof = true; in.close() } else pos += 1
      v
    }
    def nb(): Int =
      if (pushback != -2) { val v = pushback; pushback = -2; v }
      else nextByte()

    // phase A: a block that starts mid-stream discards bytes through the
    // first unquoted newline — that newline terminates a record owned by
    // the PREVIOUS block (which read past its end to finish it)
    if (b.start > 0) {
      var boundary = false
      while (!boundary && !eof) {
        val v = nextByte()
        if (v == '"') inQuote = !inQuote
        else if (v == '\n' && !inQuote) boundary = true
      }
    }

    new Iterator[String] {
      private var nextRec: String = null
      private var dropped = !b.dropFirst
      advance()

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null) {
          // ownership: the record about to start at `pos` is ours only
          // while pos <= end (TextInputFormat contract, see scaladoc)
          if (eof || pos > b.end) return
          val recStart = pos
          val buf = new java.io.ByteArrayOutputStream(256)
          var done = false
          while (!done) {
            // guard BEFORE dispatch so quote bytes and normalized
            // newlines count too — an unbalanced-quote file dominated by
            // '"' must throw, not buffer to OOM
            if (buf.size >= MaxRecordBytes) throw new java.io.IOException(
              s"csv record at ${b.file}:$recStart exceeds $MaxRecordBytes " +
                "bytes — unbalanced quote in the input?")
            val v = nb()
            if (v < 0) done = true
            else if (v == '"') { inQuote = !inQuote; buf.write(v) }
            else if (v == '\n' && !inQuote) done = true
            else if (v == '\r' && inQuote && b.crlf) {
              // the file's separator is \r\n: univocity normalizes that
              // sequence to \n inside quoted values — reproduce it
              val n2 = nb()
              if (n2 == '\n') buf.write('\n')
              else { buf.write('\r'); pushback = n2 }
            }
            else buf.write(v)
          }
          val bytes = buf.toByteArray
          // strip the \r of a \r\n terminator — ONLY in \r\n files: when
          // the detected separator is \n, univocity keeps a stray \r
          // before the terminator as field content (probed empirically)
          val n =
            if (b.crlf && bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
              bytes.length - 1
            else bytes.length
          if (eof && n == 0) { return } // file ended exactly at a newline
          val s = new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8)
          if (!dropped) dropped = true // header line of a non-first file
          else nextRec = s
        }
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): String = {
        val r = nextRec
        advance()
        r
      }
    }
  }
}
