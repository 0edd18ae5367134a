package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2 layer 3) — pure-function
  * properties over ScalaCheck generators; distributed analogs are pinned
  * by the operator specs.
  */
class PropertySpec extends AnyFunSuite {
  import graft.cal.BusdayCount
  import graft.dedup.{MinHash, NgramJaccard, SimHash}
  import org.apache.spark.unsafe.types.UTF8String

  private val day = Gen.choose(8000, 13000) // ~1991..2005 epoch days
  private val text = Gen.listOfN(30,
    Gen.oneOf("the", "spark", "row", "data", "join", "key", "scan", "x1"))
    .map(_.mkString(" "))

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(n).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
    }
  }

  test("busday_count is interval-additive: [a,c) = [a,b) + [b,c)") {
    val h = BusdayCount.defaultHolidays
    forAllN(Gen.zip(day, day, day)) { case (x, y, z) =>
      val Seq(a, b, c) = Seq(x, y, z).sorted
      assert(BusdayCount.count(a, c, h)
        == BusdayCount.count(a, b, h) + BusdayCount.count(b, c, h))
    }
  }

  test("busday_count reversal follows the (end,start] antisymmetry") {
    val h = BusdayCount.defaultHolidays
    forAllN(Gen.zip(day, day)) { case (x, y) =>
      val a = math.min(x, y); val b = math.max(x, y)
      // np.busday_count(b, a) = -(count over (a, b]) for a <= b
      assert(BusdayCount.count(b, a, h)
        == -BusdayCount.count(a + 1, b + 1, h))
    }
  }

  test("minhash signatures are deterministic and self-agree fully") {
    forAllN(text) { t =>
      val s1 = MinHash.signature(UTF8String.fromString(t), 16)
      val s2 = MinHash.signature(UTF8String.fromString(t), 16)
      assert(s1.sameElements(s2))
    }
  }

  test("jaccardSorted is symmetric, bounded, 1 on equal non-empty sets") {
    forAllN(Gen.zip(text, text)) { case (a, b) =>
      val ga = NgramJaccard.gramHashes(UTF8String.fromString(a), 2)
      val gb = NgramJaccard.gramHashes(UTF8String.fromString(b), 2)
      val j1 = NgramJaccard.jaccardSorted(ga, gb)
      val j2 = NgramJaccard.jaccardSorted(gb, ga)
      assert(j1 == j2 && j1 >= 0.0 && j1 <= 1.0)
      if (ga.numElements() > 0)
        assert(NgramJaccard.jaccardSorted(ga, ga) == 1.0)
    }
  }

  test("simhash is invariant under token permutation (order-free)") {
    val rnd = new scala.util.Random(7)
    forAllN(text) { t =>
      val perm = rnd.shuffle(t.split(" ").toList).mkString(" ")
      assert(SimHash.simhash(UTF8String.fromString(t))
        == SimHash.simhash(UTF8String.fromString(perm)))
    }
  }

  test("gram hash sets are sorted and distinct by construction") {
    forAllN(text) { t =>
      val g = NgramJaccard.gramHashes(UTF8String.fromString(t), 2)
      val arr = (0 until g.numElements()).map(g.getLong)
      assert(arr == arr.sorted && arr.distinct == arr)
    }
  }

  // recursive optimal-string-alignment (adjacent transpose, block never
  // re-edited) — NOT the unrestricted DL, but its proven upper bound:
  // osa/2 <= dl <= osa, with equality whenever no re-editing of a
  // transposed block helps
  private def osaBrute(a: String, b: String): Int = {
    val memo = scala.collection.mutable.Map.empty[(String, String), Int]
    def go(x: String, y: String): Int = memo.getOrElseUpdate((x, y), {
      if (x.isEmpty) y.length
      else if (y.isEmpty) x.length
      else {
        var best = math.min(
          go(x.tail, y) + 1,
          math.min(go(x, y.tail) + 1,
            go(x.tail, y.tail) + (if (x.head == y.head) 0 else 1)))
        if (x.length >= 2 && y.length >= 2 &&
            x(0) == y(1) && x(1) == y(0))
          best = math.min(best, go(x.drop(2), y.drop(2)) + 1)
        best
      }
    })
    go(a, b)
  }

  test("damerau-levenshtein is bounded by OSA on short strings") {
    import graft.functions.DamerauLevenshtein.distance
    val short = Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    var diverged = 0
    forAllN(Gen.zip(short, short), n = 300) { case (a, b) =>
      val dl = distance(UTF8String.fromString(a), UTF8String.fromString(b))
      val osa = osaBrute(a, b)
      assert(dl <= osa, s"dl('$a','$b')=$dl exceeds osa=$osa")
      assert(2 * dl >= osa, s"dl('$a','$b')=$dl below osa/2 (osa=$osa)")
      if (dl != osa) diverged += 1
    }
    // the two variants genuinely differ on this alphabet (else the bound
    // test would be vacuous) — and where they differ, DuckDB's built-in
    // (the oracle for link_block_damerau) sides with the unrestricted
    // value, e.g. dl('abbaba','bcaacb') = 4 vs osa 5, probed directly
    assert(diverged > 0)
    assert(distance(UTF8String.fromString("abbaba"),
                    UTF8String.fromString("bcaacb")) == 4)
  }

  test("damerau-levenshtein metric properties") {
    import graft.functions.DamerauLevenshtein.distance
    def d(a: String, b: String) =
      distance(UTF8String.fromString(a), UTF8String.fromString(b))
    val s = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    forAllN(Gen.zip(s, s)) { case (a, b) =>
      assert(d(a, b) == d(b, a))                    // symmetry
      assert(d(a, b) >= 0 && (d(a, b) == 0) == (a == b))
      assert(d(a, b) <= math.max(a.length, b.length)) // upper bound
    }
  }

  test("wav codec round-trips arbitrary sample buffers exactly") {
    import graft.multimodal.Media.WavCodec
    val bytes = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    forAllN(bytes, n = 60) { samples =>
      val wav = WavCodec.encodePcm8(8000, samples)
      assert(WavCodec.isWav(wav))
      val (rate, ch, n, e) = WavCodec.decode(wav)
      assert(rate == 8000 && ch == 1 && n == samples.length.toLong)
      val expected = samples.map { s =>
        val v = (s & 0xff) - 128; v.toLong * v }.sum
      assert(e == expected)
    }
  }

  test("png codec round-trips arbitrary small rasters exactly") {
    import graft.multimodal.Media.PngCodec
    val dims = Gen.zip(Gen.choose(1, 9), Gen.choose(1, 9),
                       Gen.choose(0L, Long.MaxValue / 2))
    forAllN(dims, n = 40) { case (w, h, seed) =>
      def pixel(x: Int, y: Int): Int =
        (((seed + x * 31 + y * 131) % 256) + 256).toInt % 256
      val png = PngCodec.encodeGray(w, h, pixel)
      assert(PngCodec.isPng(png))
      val (dw, dh, sum) = PngCodec.decode(png)
      assert(dw == w && dh == h)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield pixel(x, y).toLong).sum % 2147483647L
      assert(sum == expected)
    }
  }

  test("jpeg codec: real lossy round-trip — exact dims, bounded error, " +
       "same-codec determinism") {
    import graft.multimodal.Media.JpegCodec
    // smooth ramp: JPEG's DCT keeps low-frequency content nearly intact,
    // so the fidelity bound is tight
    val dims = Gen.zip(Gen.choose(8, 24), Gen.choose(8, 24),
                       Gen.choose(0L, Long.MaxValue / 2))
    forAllN(dims, n = 20) { case (w, h, seed) =>
      def ramp(x: Int, y: Int): Int =
        (((seed % 64) + x * 4 + y * 4) % 256).toInt
      val jpg = JpegCodec.encodeGray(w, h, ramp)
      assert(JpegCodec.isJpeg(jpg))
      val (dw, dh, sum, mae) = JpegCodec.decodeFidelity(jpg, ramp)
      assert(dw == w && dh == h, "JPEG must preserve dimensions exactly")
      assert(mae >= 0L, "decode fell back to the stub")
      assert(mae <= 16 * 1024L,
        s"smooth-ramp MAE ${mae / 1024.0} gray levels exceeds bound")
      // lossy but DETERMINISTIC within one codec: a second round-trip
      // reproduces the identical decoded raster
      assert(JpegCodec.decodeFidelity(
        JpegCodec.encodeGray(w, h, ramp), ramp) == ((dw, dh, sum, mae)))
    }
    // noisy raster: high-frequency content takes real quantization loss —
    // the point of emitting mae is that the loss is measured, not hidden
    def noise(x: Int, y: Int): Int = (x * 97 + y * 61) % 256
    val (nw, nh, _, nMae) =
      JpegCodec.decodeFidelity(JpegCodec.encodeGray(16, 16, noise), noise)
    assert(nw == 16 && nh == 16)
    assert(nMae > 0L && nMae <= 128 * 1024L)
  }

  test("mm_jpeg_decode: every doc decodes through the real jpeg path") {
    val sp = SparkTestSession.spark
    val out = SparkEntry.queries("mm_jpeg_decode")(
      sp, "/root/testdata/sf0.001").collect()
    val nDocs = Tables.documents(sp, "/root/testdata/sf0.001").count()
    assert(out.length.toLong == nDocs)
    out.foreach { r =>
      assert(r.getAs[Long]("width") == 8 + r.getAs[Long]("media_id") % 9)
      assert(r.getAs[Long]("mae_q10") >= 0L,
        s"media ${r.getAs[Long]("media_id")} fell back to the stub")
      assert(r.getAs[Long]("n_bytes") > 0L)
    }
  }

  test("gvid container round-trips arbitrary frame sets exactly") {
    import graft.multimodal.Media.VideoContainer
    val frames = Gen.listOfN(4,
      Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
    forAllN(frames, n = 40) { fs =>
      val video = VideoContainer.pack(fs)
      assert(VideoContainer.isGvid(video))
      val (declared, out) = VideoContainer.unpack(video)
      assert(declared == fs.length && out.length == fs.length)
      fs.zip(out).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
    // a truncated container parses the clean prefix and says so loudly:
    // declared count stays larger than the recovered frames
    val v = VideoContainer.pack(Seq(Array[Byte](1, 2, 3), Array[Byte](4)))
    val (d, out) = VideoContainer.unpack(v.dropRight(3))
    assert(d == 2 && out.length == 1)
    assert(VideoContainer.unpack(Array[Byte](1, 2)) == ((0, Nil)))
  }

  test("mm_mjpeg_scene_cut: real per-frame decode finds every known cut") {
    val sp = SparkTestSession.spark
    val out = SparkEntry.queries("mm_mjpeg_scene_cut")(
      sp, "/root/testdata/sf0.001").collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getAs[Long]("n_frames_declared") == r.getAs[Long]("n_frames"),
        s"media ${r.getAs[Long]("media_id")}: truncated container")
      assert(r.getAs[Long]("cut_correct") == 1L,
        s"media ${r.getAs[Long]("media_id")}: cut at " +
          s"${r.getAs[Long]("cut_at")} expected " +
          s"${r.getAs[Long]("expected_cut")}")
      // the designed scene jump survives the lossy decode: bright scene
      // mean stays well above the dim scene mean on REAL pixels
      assert(r.getAs[Long]("luma_last_q10")
        - r.getAs[Long]("luma_first_q10") > 64 * 1024L)
    }
  }

  test("png decodeAvgHash: aHash bits replay; halves stay unsigned") {
    import graft.multimodal.Media.PngCodec
    val dims = Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8),
                       Gen.choose(0L, Long.MaxValue / 2))
    forAllN(dims, n = 40) { case (w, h, seed) =>
      def pixel(x: Int, y: Int): Int =
        (((seed + x * 31 + y * 131) % 256) + 256).toInt % 256
      val png = PngCodec.encodeGray(w, h, pixel)
      val (dw, dh, lo, hi, nSet) = PngCodec.decodeAvgHash(png)
      assert(dw == w && dh == h)
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield pixel(x, y).toLong).sum
      val mean = sum / (w.toLong * h)
      var elo = 0L; var ehi = 0L; var en = 0L
      for (y <- 0 until h; x <- 0 until w)
        if (pixel(x, y) > mean) {
          val i = y * w + x
          if (i < 32) elo |= 1L << i else ehi |= 1L << (i - 32)
          en += 1
        }
      assert(lo == elo && hi == ehi && nSet == en)
      assert(lo >= 0 && hi >= 0) // 32-bit halves never touch the sign bit
      assert(java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)
        == nSet)
    }
  }

  test("png decodeHalf: stride-2 sample of the decoded raster, any parity") {
    import graft.multimodal.Media.PngCodec
    val dims = Gen.zip(Gen.choose(1, 9), Gen.choose(1, 9),
                       Gen.choose(0L, Long.MaxValue / 2))
    forAllN(dims, n = 40) { case (w, h, seed) =>
      def pixel(x: Int, y: Int): Int =
        (((seed + x * 31 + y * 131) % 256) + 256).toInt % 256
      val png = PngCodec.encodeGray(w, h, pixel)
      val (tw, th, sum) = PngCodec.decodeHalf(png)
      assert(tw == (w + 1) / 2 && th == (h + 1) / 2)
      val expected = (for (y <- 0 until th; x <- 0 until tw)
        yield pixel(2 * x, 2 * y).toLong).sum % 2147483647L
      assert(sum == expected)
      // 1x1 stays 1x1 and keeps its single pixel
      val (ow, oh, os) = PngCodec.decodeHalf(
        PngCodec.encodeGray(1, 1, (_, _) => pixel(0, 0)))
      assert(ow == 1 && oh == 1 && os == pixel(0, 0).toLong % 2147483647L)
    }
  }

}
