package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 statistics/mining batch: ANOVA F, DDSketch-style relative-error
  * quantiles, Page–Hinkley drift, Hurst R/S, SAX motifs, Neyman
  * allocation — each pinned against an independent local brute-force
  * replay (bitwise where the query's portability contract promises it),
  * not just the DuckDB oracle.
  */
class StatsMiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // (type, ts-micros for ordering, event_id, cents, session-TZ date
  // string, user_id) — the date comes from Spark itself so the replay
  // can't drift from the session timezone the queries group by.
  private lazy val events: Seq[(String, Long, Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        col("event_id"), graft.olap.Exact.cents(col("value")).as("c"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toSeq

  test("anova f: bitwise replay of the fixed-fold moment chain") {
    val row = SparkEntry.queries("agg_anova_f")(spark, sfDir).collect().head
    val groups = events.groupBy(_._1).toSeq.sortBy(_._1)
    val moments = groups.map { case (et, rows) =>
      val cs = rows.map(_._4)
      (et, cs.size.toLong, cs.sum, cs.map(c => BigInt(c) * c).sum)
    }
    val k = moments.size.toLong
    val n = moments.map(_._2).sum
    val sTot = moments.map(c => BigInt(c._3)).sum
    val ssTot = moments.map(_._4).sum
    // fixed event_type fold order, one IEEE division per group
    val tBetween = moments.map { case (_, ng, sg, _) =>
      (BigInt(sg) * sg).toDouble / ng.toDouble
    }.foldLeft(0.0)(_ + _)
    val ssb = tBetween - (sTot * sTot).toDouble / n.toDouble
    val ssw = ssTot.toDouble - tBetween
    val f = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    assert(row.getAs[Long]("k") == k && row.getAs[Long]("n_total") == n)
    assert(row.getAs[Double]("ssb") == ssb)
    assert(row.getAs[Double]("ssw") == ssw)
    assert(row.getAs[Double]("f_stat") == f)
    assert(f > 0.0)
  }

  test("ddsketch quantiles: est <= exact within one gamma bucket") {
    val rows = SparkEntry.queries("sketch_ddsketch_quantiles")(spark, sfDir)
      .collect()
    // 3 percentiles x every type present
    val types = events.map(_._1).distinct.size
    assert(rows.length == 3 * types)
    val gamma = math.pow(2.0, 1.0 / 16.0)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_value")
      val exact = r.getAs[Double]("exact_value")
      // estimate is the bucket's observed min; the exact quantile sits in
      // the same log-bucket, so est <= exact < est * gamma (+lattice slack)
      assert(est <= exact)
      assert(exact / est <= gamma * 1.0001,
        s"relative error above the gamma band: $est vs $exact")
    }
  }

  test("page-hinkley: bitwise replay of the integer drift recurrence") {
    val out = SparkEntry.queries("ts_page_hinkley")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) =>
        (et, d, rows.map(_._4).sum, rows.size.toLong) }
      .toSeq
    daily.groupBy(_._1).foreach { case (et, days) =>
      // m starts at 0 and the first PH term is always 0, so min/max seed 0
      var cum = 0L; var m = 0L; var mn = 0L; var mx = 0L; var t = 0L
      days.sortBy(_._2).foreach { case (_, d, s, n) =>
        val x = (s * 10000L) / n
        t += 1; cum += x
        m += x - cum / t
        mn = math.min(mn, m); mx = math.max(mx, m)
        assert(out((et, d)) == ((x, m, m - mn, mx - m)), s"$et $d")
      }
    }
  }

  test("hurst r/s: bitwise replay via the shared FixedLog2 lattice") {
    val out = SparkEntry.queries("ts_hurst_rs")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.map(_._4).sum) }
      .toSeq
    daily.groupBy(_._1).foreach { case (et, days) =>
      val xs = days.sortBy(_._2).map(_._3).toArray
      val perScale = Seq(5, 10, 15).flatMap { n =>
        val ys = xs.grouped(n).filter(_.length == n).flatMap { b =>
          val sb = b.sum
          val ssb = b.map(x => BigInt(x) * x).sum
          val devs = b.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
            case (cum, i0) => n * cum - (i0 + 1).toLong * sb }
          val rs = devs.max - devs.min
          val vn = (BigInt(n) * ssb - BigInt(sb) * sb).toLong
          if (rs > 0 && vn > 0)
            Some(2 * graft.functions.FixedLog2.log2fp(rs) -
              graft.functions.FixedLog2.log2fp(vn))
          else None
        }.toSeq
        if (ys.isEmpty) None
        else Some((graft.functions.FixedLog2.log2fp(n.toLong),
          ys.size.toLong, ys.sum))
      }
      val k = perScale.size.toLong
      val bigm = perScale.map(_._2).product
      val yp = perScale.map { case (x, m, y) => (x, y * (bigm / m)) }
      val sx = yp.map(s => BigInt(s._1)).sum
      val sxx = yp.map(s => BigInt(s._1) * s._1).sum
      val sxy = yp.map(s => BigInt(s._1) * s._2).sum
      val sy = yp.map(s => BigInt(s._2)).sum
      val hurst = (BigInt(k) * sxy - sx * sy).toDouble /
        (BigInt(bigm) * (BigInt(k) * sxx - sx * sx)).toDouble / 2.0
      val (gotK, gotB, gotH) = out(et)
      assert(gotK == k && gotB == perScale.map(_._2).sum)
      assert(gotH == hurst, s"$et hurst $gotH vs $hurst")
    }
  }

  test("sax motifs: bitwise replay incl. ntile quartile boundaries") {
    val out = SparkEntry.queries("ts_sax_symbols")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    events.groupBy(_._1).foreach { case (et, rows) =>
      val ordered = rows.sortBy(e => (e._2, e._3)).map(_._4)
      val frames = ordered.grouped(64).zipWithIndex
        .filter(_._1.length == 64)
        .map { case (b, i) => (i.toLong, b.sum) }.toSeq
      if (frames.nonEmpty) {
        // ntile(4): first (m mod 4) buckets get (m div 4 + 1) rows
        val m = frames.size
        val sorted = frames.sortBy(f => (f._2, f._1))
        val q = sorted.zipWithIndex.map { case ((frame, _), idx) =>
          val base = m / 4; val rem = m % 4
          val bucket =
            if (idx < (base + 1) * rem) idx / (base + 1)
            else if (base == 0) rem - 1 // fewer rows than tiles
            else rem + (idx - (base + 1) * rem) / base
          frame -> ('a' + bucket).toChar
        }.toMap
        val syms = frames.sortBy(_._1).map(f => q(f._1))
        val words = syms.sliding(3).filter(_.size == 3).map(_.mkString)
          .toSeq
        val top = words.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
        val got = out.filter(_._1 == et).map(r => (r._2, r._3))
        assert(got.toSet == top.toSet, s"$et: $got vs $top")
      }
    }
  }

  test("neyman allocation: weights replay; selection honors allocation") {
    val rows = SparkEntry.queries("sample_neyman_allocation")(spark, sfDir)
      .collect()
    val byType = events.groupBy(_._1)
    var totalAlloc = 0L
    rows.foreach { r =>
      val et = r.getString(0)
      val cs = byType(et).map(_._4)
      val n = cs.size.toLong
      val sc = cs.sum
      val ss = cs.map(c => BigInt(c) * c).sum
      val varNum = (BigInt(n) * ss - BigInt(sc) * sc).toLong
      val wt = math.floor(math.sqrt((n * (varNum / (n - 1))).toDouble))
        .toLong
      assert(r.getAs[Long]("n_class") == n)
      assert(r.getAs[Long]("wt") == wt, s"$et weight")
      // raw Neyman allocation can exceed a small stratum; the rank
      // selection then takes the whole stratum (census for that stratum)
      assert(r.getAs[Long]("n_selected") ==
        math.min(r.getAs[Long]("n_alloc"), n))
      totalAlloc += r.getAs[Long]("n_alloc")
    }
    // floor allocation never exceeds the budget
    assert(totalAlloc <= 1000 && totalAlloc > 0)
  }

  test("multiprobe lsh: beats exact-bucket recall; results share a probe") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val planes = graft.similarity.HyperplaneLsh.planes(8, 64)
    def bucket(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (dot(v, p) > 0) 1L << i else 0L }.sum
    val buckets = vecs.map { case (id, v) => id -> bucket(v) }
    val out = SparkEntry.queries("sim_lsh_multiprobe")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (query, neighbor)
    val queries = vecs.keys.filter(_ < 10).toSeq
    out.foreach { case (q, v) =>
      val probes = buckets(q) +: (0 until 8).map(i =>
        buckets(q) ^ (1L << i))
      assert(probes.contains(buckets(v)), s"$v not in $q's probe set")
    }
    // multi-probe recall@5 vs brute-force dominates exact-bucket recall
    def top5(cands: Iterable[Long], q: Long): Set[Long] =
      cands.filter(_ != q).toSeq
        .sortBy(v => (-cos(vecs(q), vecs(v)), v)).take(5).toSet
    var multiHit = 0; var exactHit = 0
    queries.foreach { q =>
      val truth = top5(vecs.keys, q)
      val probes = (buckets(q) +: (0 until 8).map(i =>
        buckets(q) ^ (1L << i))).toSet
      val multi = top5(vecs.keys.filter(v => probes(buckets(v))), q)
      val exact = top5(vecs.keys.filter(v => buckets(v) == buckets(q)), q)
      multiHit += (truth & multi).size
      exactHit += (truth & exact).size
      // the query's emitted set IS the local multi-probe top-5
      assert(out.filter(_._1 == q).map(_._2).toSet == multi)
    }
    assert(multiHit >= exactHit)
  }

  test("levene/brown-forsythe: bitwise replay incl. exact 2-median") {
    val row = SparkEntry.queries("agg_levene_bf")(spark, sfDir)
      .collect().head
    val groups = events.groupBy(_._1).toSeq.sortBy(_._1)
    val zs = groups.map { case (et, rows) =>
      val cs = rows.map(_._4).sorted
      val n = cs.size
      val m2 = cs((n + 1) / 2 - 1) + cs((n + 2) / 2 - 1)
      (et, rows.map(r => math.abs(r._4 * 2 - m2)))
    }
    val moments = zs.map { case (et, z) =>
      (et, z.size.toLong, z.sum, z.map(v => BigInt(v) * v).sum) }
    val k = moments.size.toLong
    val n = moments.map(_._2).sum
    val sTot = moments.map(m => BigInt(m._3)).sum
    val ssTot = moments.map(_._4).sum
    val tBetween = moments.map { case (_, ng, sg, _) =>
      (BigInt(sg) * sg).toDouble / ng.toDouble }.foldLeft(0.0)(_ + _)
    val ssb = tBetween - (sTot * sTot).toDouble / n.toDouble
    val ssw = ssTot.toDouble - tBetween
    val wStat = (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble)
    assert(row.getAs[Long]("k") == k && row.getAs[Long]("n_total") == n)
    assert(row.getAs[Double]("w_stat") == wStat)
  }

  test("cuped: bitwise theta/rho2 replay; arms partition the users") {
    val row = SparkEntry.queries("agg_cuped_adjustment")(spark, sfDir)
      .collect().head
    def spread(id: Long): Long = {
      val h0 = id.toString.foldLeft(0L)((a, c) => (a * 31 + c.toInt)
        % 2147483647L)
      val h1 = (h0 * 1103515245L + 12345L) % 2147483647L
      val h2 = (h1 * h1) % 2147483647L
      (h2 * 69069L + 362437L) % 2147483647L
    }
    val minD = events.map(_._5).min
    val midD = java.time.LocalDate.parse(minD).plusDays(15).toString
    val users = events.groupBy(_._6).flatMap { case (uid, rows) =>
      val pre = rows.filter(_._5 < midD).map(_._4)
      val post = rows.filter(_._5 >= midD).map(_._4)
      if (pre.nonEmpty && post.nonEmpty)
        Some((uid, spread(uid) % 2,
          pre.sum * 10000L / pre.size, post.sum * 10000L / post.size))
      else None
    }.toSeq
    val n = users.size.toLong
    def mom(f: ((Long, Long, Long, Long)) => (Long, Long)) =
      users.map { u => val (a, b) = f(u); BigInt(a) * b }.sum
    val (sx, sy) = (users.map(u => BigInt(u._3)).sum,
      users.map(u => BigInt(u._4)).sum)
    val sxx = mom(u => (u._3, u._3)); val sxy = mom(u => (u._3, u._4))
    val syy = mom(u => (u._4, u._4))
    val num = BigInt(n) * sxy - sx * sy
    val theta = num.toDouble / (BigInt(n) * sxx - sx * sx).toDouble
    val rho2 = (num.toDouble * num.toDouble) /
      ((BigInt(n) * sxx - sx * sx).toDouble *
       (BigInt(n) * syy - sy * sy).toDouble)
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == n)
    assert(row.getAs[Double]("theta") == theta)
    assert(row.getAs[Double]("rho2") == rho2)
    assert(rho2 >= 0.0 && rho2 <= 1.0)
  }

  test("ratio delta se: bitwise moment-chain replay; se positive") {
    val row = SparkEntry.queries("agg_ratio_delta_se")(spark, sfDir)
      .collect().head
    // .toSeq BEFORE the map: mapping a Map to pairs would re-key on x
    // and silently collapse users with equal event counts
    val users = events.groupBy(_._6).toSeq.map { case (_, rows) =>
      (rows.size.toLong, rows.map(_._4).sum) }
    val n = users.size.toLong
    val sx = users.map(u => BigInt(u._1)).sum
    val sy = users.map(u => BigInt(u._2)).sum
    val sxx = users.map(u => BigInt(u._1) * u._1).sum
    val sxy = users.map(u => BigInt(u._1) * u._2).sum
    val syy = users.map(u => BigInt(u._2) * u._2).sum
    val xbar = sx.toDouble / n.toDouble
    val r = sy.toDouble / sx.toDouble
    def cm(a: BigInt) = a.toDouble / (n * (n - 1)).toDouble
    val varX = cm(BigInt(n) * sxx - sx * sx)
    val varY = cm(BigInt(n) * syy - sy * sy)
    val covXy = cm(BigInt(n) * sxy - sx * sy)
    val se = math.sqrt((varY - 2.0 * r * covXy + r * r * varX)
      / (n.toDouble * xbar * xbar)) / 100.0
    assert(row.getAs[Long]("n_users") == n)
    assert(row.getAs[Double]("ratio") == r / 100.0)
    assert(row.getAs[Double]("se_delta") == se)
    assert(se > 0.0)
  }

  test("rag chunking: overlap integrity, coverage, hash replay") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("text_rag_chunking")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def fold(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      h
    }
    docs.foreach { case (id, text) =>
      // the fixture contract: n_chars == length(text); chunks cover the
      // doc at stride 150 with 50 overlap
      val n = text.length
      val expIdx = if (n == 0) -1 else (n - 1) / 150
      (0L to expIdx).foreach { k =>
        val chunk = text.substring((k * 150).toInt,
          math.min(k * 150 + 200, n).toInt)
        val (len, _, hash) = out((id, k))
        assert(len == chunk.length)
        assert(hash == fold(chunk), s"doc $id chunk $k hash")
        if (k > 0) {
          // 50-char overlap: this chunk starts inside the previous one
          val prev = text.substring(((k - 1) * 150).toInt,
            math.min((k - 1) * 150 + 200, n).toInt)
          if (prev.length == 200)
            assert(prev.substring(150) == chunk.substring(0,
              math.min(50, chunk.length)))
        }
      }
      assert(out.keys.count(_._1 == id) == expIdx + 1)
    }
  }

  test("esd outliers: bitwise replay of the remove-and-recompute rounds") {
    val out = SparkEntry.queries("ts_esd_outliers")(spark, sfDir)
      .collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        ((r.getDate(2).toString, r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.map(_._4).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (et, days0) =>
      var days = days0.map(e => (e._2, e._3))
      (1 to 3).foreach { r =>
        val n = days.size.toLong
        val s = days.map(_._2).sum
        val ss = days.map(v => BigInt(v._2) * v._2).sum
        val pick = days.maxBy(v => (math.abs(v._2 * n - s), v._1))
        val dev = math.abs(pick._2 * n - s)
        val z = dev.toDouble / (n.toDouble *
          math.sqrt((BigInt(n) * ss - BigInt(s) * s).toDouble /
            (n * (n - 1)).toDouble))
        assert(out((et, r.toLong)) == ((pick._1, pick._2, dev, n, z)),
          s"$et round $r")
        days = days.filterNot(_ == pick)
      }
    }
  }

  test("phash hamming: banded join finds EVERY ham<=3 pair (pigeonhole)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def hash(id: Long, nChars: Long): (Long, Long, Long) = {
      val w = (1 + id % 8).toInt; val h = (1 + nChars % 8).toInt
      val px = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 13) % 256, y * w + x)
      val mean = px.map(_._1).sum / (w.toLong * h)
      var lo = 0L; var hi = 0L; var n = 0L
      px.foreach { case (p, i) =>
        if (p > mean) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32); n += 1 } }
      (lo, hi, n)
    }
    val informative = docs.map { case (id, nc) => id -> hash(id, nc) }
      .filter(_._2._3 >= 8)
    val expected = (for {
      (a, (loA, hiA, _)) <- informative
      (b, (loB, hiB, _)) <- informative if a < b
      ham = java.lang.Long.bitCount(loA ^ loB) +
        java.lang.Long.bitCount(hiA ^ hiB) if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    val got = SparkEntry.queries("dedup_phash_hamming")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // 4 bands over 64 bits: <=3 flipped bits leave one band untouched,
    // so the banded index has NO recall loss at this radius
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("sql api lattice report: registered SQL functions replay") {
    val rows = SparkEntry.queries("sql_api_lattice_report")(spark, sfDir)
      .collect()
    def fold(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483647L)
    val byType = events.groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val n = byType(et).size.toLong
      assert(r.getAs[Long]("type_hash") == fold(et))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("log2_n_q20") ==
        graft.functions.FixedLog2.log2fp(n))
      // [min, max) business days, default 3-holiday calendar
      val ds = byType(et).map(_._5)
      var cur = java.time.LocalDate.parse(ds.min)
      val end = java.time.LocalDate.parse(ds.max)
      var busdays = 0
      while (cur.isBefore(end)) {
        val hol = (cur.getMonthValue, cur.getDayOfMonth) match {
          case (1, 1) | (7, 4) | (12, 25) => true
          case _ => false
        }
        if (cur.getDayOfWeek.getValue <= 5 && !hol) busdays += 1
        cur = cur.plusDays(1)
      }
      assert(r.getAs[Int]("busdays") == busdays, s"$et busdays")
    }
  }

  test("forecast baselines: bitwise lag-error replay") {
    val out = SparkEntry.queries("ts_forecast_baseline_eval")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getLong(5)))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.map(_._4).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (et, days) =>
      val xs = days.sortBy(_._2).map(_._3).toArray
      val evals = (7 until xs.length).map { i =>
        (xs(i), xs(i - 1), xs(i - 7)) }
      val n = evals.size.toLong
      val ae1 = evals.map(e => math.abs(e._1 - e._2)).sum
      val ae7 = evals.map(e => math.abs(e._1 - e._3)).sum
      val sm1 = evals.map(e =>
        math.abs(e._1 - e._2) * 1000000L / (e._1 + e._2)).sum
      val sm7 = evals.map(e =>
        math.abs(e._1 - e._3) * 1000000L / (e._1 + e._3)).sum
      assert(out(et) == ((n, ae1.toDouble / n.toDouble / 100.0,
        ae7.toDouble / n.toDouble / 100.0, sm1 / n, sm7 / n)), et)
    }
  }

  test("expansion estimate: unbiased-ish estimator replay + signed ppm") {
    val rows = SparkEntry.queries("sample_expansion_estimate")(spark, sfDir)
      .collect()
    def spread(id: Long): Long = {
      val h0 = id.toString.foldLeft(0L)((a, c) => (a * 31 + c.toInt)
        % 2147483647L)
      val h1 = (h0 * 1103515245L + 12345L) % 2147483647L
      val h2 = (h1 * h1) % 2147483647L
      (h2 * 69069L + 362437L) % 2147483647L
    }
    rows.foreach { r =>
      val et = r.getString(0)
      val all = events.filter(_._1 == et)
      val trueCents = all.map(_._4).sum
      assert(r.getAs[Long]("true_cents") == trueCents)
      val nSel = r.getAs[Long]("n_sel")
      val sel = all.sortBy(e => (spread(e._3), e._3)).take(nSel.toInt)
      val est = sel.map(_._4).sum * r.getAs[Long]("n_class") / nSel
      assert(r.getAs[Long]("est_cents") == est, s"$et estimate")
      val err = est - trueCents
      val ppm = Math.floorDiv(err * 1000000L, trueCents)
      assert(r.getAs[Long]("err_ppm") == ppm, s"$et ppm")
      // the expansion estimator lands within 25% of truth on this sample
      assert(math.abs(err) < trueCents / 4)
    }
  }

  test("psi drift: bitwise lattice replay; psi nonnegative") {
    val out = SparkEntry.queries("dq_psi_value_drift")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val minD = events.map(_._5).min
    val midD = java.time.LocalDate.parse(minD).plusDays(15).toString
    events.filter(_._4 > 0).groupBy(_._1).foreach { case (et, rows) =>
      def bin(c: Long): Long = graft.functions.FixedLog2.log2fp(c) / 1048576L
      val side1 = rows.filter(_._5 < midD).groupBy(e => bin(e._4))
        .view.mapValues(_.size.toLong).toMap
      val side2 = rows.filter(_._5 >= midD).groupBy(e => bin(e._4))
        .view.mapValues(_.size.toLong).toMap
      val bins = (side1.keySet ++ side2.keySet).toSeq.sorted
      val sm = bins.map(b => (side1.getOrElse(b, 0L) + 1L,
        side2.getOrElse(b, 0L) + 1L))
      val n1 = sm.map(_._1).sum; val n2 = sm.map(_._2).sum
      val tsum = sm.map { case (a, b) =>
        BigInt(a * n2 - b * n1) *
          (graft.functions.FixedLog2.log2fp(a * n2)
            - graft.functions.FixedLog2.log2fp(b * n1))
      }.sum
      val psi = tsum.toDouble * 0.6931471805599453 /
        (n1.toDouble * n2.toDouble * 1048576.0)
      val (gb, gn1, gn2, gpsi) = out(et)
      assert(gb == bins.size && gn1 == n1 && gn2 == n2)
      assert(gpsi == psi, s"$et psi")
      assert(psi >= 0.0)
    }
  }

  test("xcorr lags: bitwise moment replay; lag 0 equals plain pearson") {
    val out = SparkEntry.queries("ts_xcorr_lags")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val daily = events.filter(e => e._1 == "click" || e._1 == "purchase")
      .groupBy(e => (e._5, e._1))
      .map { case ((d, et), rows) => (d, et, rows.map(_._4).sum) }.toSeq
    val byDay = daily.groupBy(_._1).collect {
      case (d, rows) if rows.size == 2 =>
        (d, rows.find(_._2 == "click").get._3,
         rows.find(_._2 == "purchase").get._3)
    }.toSeq.sortBy(_._1)
    (0 to 3).foreach { l =>
      val pairs = byDay.dropRight(l).map(_._2)
        .zip(byDay.drop(l).map(_._3))
      val n = pairs.size.toLong
      val sa = pairs.map(p => BigInt(p._1)).sum
      val sb = pairs.map(p => BigInt(p._2)).sum
      val sab = pairs.map(p => BigInt(p._1) * p._2).sum
      val saa = pairs.map(p => BigInt(p._1) * p._1).sum
      val sbb = pairs.map(p => BigInt(p._2) * p._2).sum
      val r = (BigInt(n) * sab - sa * sb).toDouble /
        (math.sqrt((BigInt(n) * saa - sa * sa).toDouble) *
         math.sqrt((BigInt(n) * sbb - sb * sb).toDouble))
      assert(out(l.toLong) == ((n, r)), s"lag $l")
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("b-bit minhash: same candidates as full lsh; unbiased direction") {
    val full = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getDouble(2)).toMap
    val bbit = SparkEntry.queries("dedup_bbit_minhash")(spark, sfDir)
      .collect()
    // identical pair set (both filter est_full >= 0.5 over the SAME
    // shared candidate generation) and identical full-width estimate
    assert(bbit.map(r => (r.getLong(0), r.getLong(1))).toSet
      == full.keySet)
    bbit.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getAs[Double]("est_full") == full(key))
      val eqFull = r.getAs[Long]("eq_full")
      val eqBits = r.getAs[Long]("eq_bits")
      // equal components always have equal low bits
      assert(eqBits >= eqFull)
      assert(r.getAs[Double]("est_1bit") ==
        2.0 * eqBits.toDouble / 16.0 - 1.0)
    }
  }

  test("mann-kendall: bitwise pair-sign replay incl. tie variance") {
    val out = SparkEntry.queries("ts_mann_kendall")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.map(_._4).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (et, days) =>
      val xs = days.sortBy(_._2).map(_._3)
      val n = xs.size.toLong
      val sStat = (for {
        i <- xs.indices; j <- (i + 1) until xs.size
      } yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tie18 = xs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (t * 2 + 5) })
        .sum
      val var18 = n * (n - 1) * (n * 2 + 5) - tie18
      val sAdj = if (sStat > 0) sStat - 1
        else if (sStat < 0) sStat + 1 else 0L
      val z = sAdj.toDouble / math.sqrt(var18.toDouble / 18.0)
      val tau = sStat.toDouble * 2.0 / (n * (n - 1)).toDouble
      assert(out(et) == ((n, sStat, var18, z, tau)), et)
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("stl decompose: identity det7 = seasonal + resid; trend replay") {
    val rows = SparkEntry.queries("ts_stl_decompose")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("det7") ==
        r.getAs[Long]("seasonal") + r.getAs[Long]("resid"))
      assert(r.getAs[Long]("det7") ==
        r.getAs[Long]("x") * 7 - r.getAs[Long]("trend7"))
    }
    // trend7 replay: centered 7-day sum over the daily series
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rs) => (et, d, rs.map(_._4).sum) }
      .toSeq.groupBy(_._1)
    val got = rows.map(r => (r.getString(0), r.getDate(1).toString) ->
      r.getAs[Long]("trend7")).toMap
    daily.foreach { case (et, days) =>
      val xs = days.sortBy(_._2)
      xs.indices.drop(3).dropRight(3).foreach { i =>
        val tr = (i - 3 to i + 3).map(j => xs(j)._3).sum
        assert(got((et, xs(i)._2)) == tr)
      }
      // exactly the interior rows are emitted
      assert(got.keys.count(_._1 == et) == math.max(0, xs.size - 6))
    }
  }
}
