package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded exhaustive/random sweeps) for the soundness
  * claims the scale optimizations rest on (SURVEY.md §7.4 risk list).
  * Pure JVM — no Spark session needed. */
class PropertySpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val rnd = new scala.util.Random(1234)
  private def randStr(maxLen: Int, alphabet: Int = 3): String =
    (0 until rnd.nextInt(maxLen + 1))
      .map(_ => ('a' + rnd.nextInt(alphabet)).toChar).mkString

  test("length band never prunes a true Levenshtein match (10k samples)") {
    (1 to 10000).foreach { _ =>
      val (a, b, d) = (randStr(8), randStr(8), rnd.nextInt(6))
      if (lev(a, b) <= d)
        assert(math.abs(a.length - b.length) <= d,
          s"band pruned true match: '$a' '$b' d=$d lev=${lev(a, b)}")
    }
  }

  test("Jaccard size band never prunes a true match (10k samples)") {
    (1 to 10000).foreach { _ =>
      val a = Set.fill(rnd.nextInt(15))(rnd.nextInt(20))
      val b = Set.fill(rnd.nextInt(15))(rnd.nextInt(20))
      val t = (rnd.nextInt(10) + 1) / 10.0
      val union = (a ++ b).size
      if (union > 0) {
        val jac = a.intersect(b).size.toDouble / union
        if (jac >= t) {
          val (mn, mx) = (math.min(a.size, b.size), math.max(a.size, b.size))
          assert(mn + 1e-9 >= t * mx,
            s"size band pruned true match: |a|=${a.size} |b|=${b.size} t=$t jac=$jac")
        }
      }
    }
  }

  test("recency rank: first occurrence wins for duplicate values") {
    import graft.ops.Recency
    val r = Recency.recencyRank(Seq(Some("2025"), Some("2023"),
      Some("2025"), None, Some("2021")))
    assert(r.toMap === Map("2025" -> 1, "2023" -> 2, "2021" -> 5))
    assert(r.map(_._1) === Seq("2025", "2023", "2021"))
  }

  test("Morton z-value is a bijection on 21-bit pairs (10k samples)") {
    // JVM replica of Layout.zValue's bit math + its exact inverse; a
    // round-trip failure would mean interleave collisions, i.e. files
    // whose "rectangles" overlap and a manifest that can't skip
    def z(a: Long, b: Long): Long =
      (0 until graft.io.Layout.BitsPerDim).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    def unz(v: Long): (Long, Long) =
      (0 until graft.io.Layout.BitsPerDim).foldLeft((0L, 0L)) {
        case ((a, b), i) =>
          (a | (((v >> (2 * i)) & 1L) << i),
            b | (((v >> (2 * i + 1)) & 1L) << i))
      }
    val mask = (1L << graft.io.Layout.BitsPerDim) - 1
    for (_ <- 1 to 10000) {
      val a = rnd.nextLong().abs & mask
      val b = rnd.nextLong().abs & mask
      val v = z(a, b)
      assert(v >= 0L, "z-values must stay positive for range partitioning")
      assert(unz(v) === ((a, b)), s"round-trip failed for ($a, $b)")
    }
    // locality anchor: the four 1-bit neighbors of a point differ in one
    // interleaved bit, so they stay within 2^(2*21) of each other trivially;
    // the useful property pinned here is prefix-sharing: equal high bits of
    // a AND b imply equal high z-bits (files = z-ranges = aligned rectangles)
    val (a1, b1) = (0x155555L, 0x0AAAAAL)
    assert(z(a1, b1) >> 2 === z(a1 ^ 1L, b1 ^ 1L) >> 2)
  }

  test("digit key concatenates all digit runs") {
    import graft.ops.Recency
    assert(Recency.digitKey("SurveyAdminTerm25-2") === 252L)
    assert(Recency.digitKey("SurveyAdminYear2023") === 2023L)
    assert(Recency.digitKey("NoDigitsHere") === Long.MinValue)
    // digit overflow clamps instead of throwing
    assert(Recency.digitKey("X99999999999999999999999") === Long.MaxValue)
  }

  test("BPE encode is lossless and merges shrink monotonically (5k samples)") {
    import graft.llm.BpeTrain
    (1 to 5000).foreach { _ =>
      val word = randStr(12, 2)
      if (word.nonEmpty) {
        val nRules = rnd.nextInt(5)
        def sym(): String = { val s = randStr(2, 2); if (s.isEmpty) "a" else s }
        val rules = (0 until nRules).map(_ => (sym(), sym()))
        // every prefix of the rule list yields pieces that concatenate
        // back to the word (no tokens invented or lost) and piece counts
        // never increase as more merges apply
        val counts = (0 to nRules).map { i =>
          val pieces = BpeTrain.encodeLocal(word, rules.take(i))
          assert(pieces.mkString("") === word,
            s"lossy encode: '$word' via ${rules.take(i)} -> $pieces")
          pieces.length
        }
        assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
          s"piece count grew: $counts for '$word' $rules")
      }
    }
  }

  test("PCM16 window algebra: windows partition the samples and conserve " +
      "total |amplitude| (2k samples)") {
    import graft.llm.Multimodal
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val samples = Multimodal.pcm16Le(bytes)
      // decode: every LE pair round-trips to a signed 16-bit value
      assert(samples.length === bytes.length / 2)
      samples.zipWithIndex.foreach { case (sm, i) =>
        assert(sm >= -32768 && sm <= 32767)
        val want = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
        assert(sm === want)
      }
      // window algebra, checked through the same loop audioWindows runs:
      // the (j*W)/nS split partitions [0, nS) into W contiguous ranges
      val w = 1 + rnd.nextInt(20)
      val nS = samples.length
      if (nS > 0) {
        val wins = (0 until nS).map(j => ((j.toLong * w) / nS).toInt)
        assert(wins.forall(x => x >= 0 && x < w))
        assert(wins.zip(wins.tail).forall { case (a, b) => a <= b },
          "window ids must be monotone in sample index")
        // conservation: per-window counts/sums total the whole stream
        val byWin = (0 until nS).groupBy(wins)
        assert(byWin.values.map(_.size).sum === nS)
        assert(byWin.values.flatten.map(j => math.abs(samples(j).toLong))
          .sum === samples.map(s => math.abs(s.toLong)).sum)
        // every window gets at least one sample when nS >= w (no gaps a
        // rank-based oracle would disagree on)
        if (nS >= w) assert(byWin.size === w,
          s"nS=$nS w=$w produced only ${byWin.size} windows")
      }
    }
  }

  test("decodePcm16 decodes both endiannesses and they agree under " +
      "byte-pair swap (2k samples)") {
    import graft.llm.Multimodal
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(100)
      val data = Array.fill(2 * n + rnd.nextInt(2))( // odd tails dropped
        rnd.nextInt(256).toByte)
      val le = Multimodal.decodePcm16(data, bigEndian = false)
      val be = Multimodal.decodePcm16(data, bigEndian = true)
      assert(le.length === n && be.length === n)
      for (i <- 0 until n) {
        assert(le(i) === ((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)))
        assert(be(i) === ((data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)))
      }
      // swapping each byte pair converts one endianness into the other
      val swapped = data.take(2 * n).grouped(2)
        .flatMap(p => Array(p(1), p(0))).toArray
      assert(Multimodal.decodePcm16(swapped, bigEndian = true).toSeq ===
        le.toSeq)
    }
  }

  test("WAV real arm round-trips random PCM16 sample buffers exactly " +
      "(200 buffers via javax.sound; WAVE PCM is little-endian)") {
    import graft.llm.Multimodal
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val src = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        pcm(2 * i) = (src(i) & 0xff).toByte
        pcm(2 * i + 1) = ((src(i) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
        false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val got = Multimodal.realWavSamples(bos.toByteArray)
      assert(got.isDefined, "a generated PCM16 WAV must take the real arm")
      assert(got.get.toSeq === src.map(_.toInt).toSeq,
        s"WAV round-trip diverged at n=$n")
    }
  }

  test("class-count signature bound never prunes a true Levenshtein " +
      "match (20k samples, saturation + out-of-class chars included)") {
    // JVM replica of SimilarityJoin.classCountSignature's class
    // partition: [a-d] [e-h] [i-l] [m-p] [q-t] [u-x] [y-z] [^a-z],
    // counts saturated at 255 — the packed-long layout is irrelevant to
    // the bound, only the per-class saturated counts are
    def sig(s: String): Array[Int] = {
      val c = new Array[Int](8)
      s.foreach { ch =>
        val i = if (ch >= 'a' && ch <= 'x') (ch - 'a') / 4
          else if (ch == 'y' || ch == 'z') 6 else 7
        c(i) += 1
      }
      c.map(math.min(_, 255))
    }
    def l1(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    // alphabet 30 spans several classes plus chars outside [a-z]
    // ('a'+26..29 = '{' '|' '}' '~' land in the catch-all class)
    (1 to 20000).foreach { _ =>
      val (a, b) = (randStr(12, 30), randStr(12, 30))
      val d = rnd.nextInt(6)
      if (lev(a, b) <= d)
        assert(l1(sig(a), sig(b)) <= 2 * d,
          s"signature pruned true match: '$a' '$b' d=$d lev=${lev(a, b)}")
    }
    // saturation arm: long strings whose true counts exceed 255 — the
    // saturated bound must still hold for near-identical pairs
    (1 to 200).foreach { _ =>
      val base = (1 to 600).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val edited = base.patch(rnd.nextInt(base.length), "e", 1)
      assert(l1(sig(base), sig(edited)) <= 2,
        "saturated signature bound broken on a 1-edit pair")
    }
  }
}
