package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 adaptive-indicator / resampling / fingerprint / kNN-graph
  * batch: KAMA packed-integer fold, Amihud illiquidity lattice, Poisson
  * bootstrap weights, partition checksums, mutual-kNN edges — each pinned
  * against an independent local brute-force replay.
  */
class KamaKnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // (type, ts-micros, event_id, cents, session-TZ date string)
  private lazy val events: Seq[(String, Long, Long, Long, String)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        col("event_id"), graft.olap.Exact.cents(col("value")).as("c"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq

  // daily close per (type, date): value of the max-ts event (ts unique
  // per group in the fixture, as ts_ohlc_resample already relies on)
  private lazy val dailyClose: Map[String, Seq[(String, Long)]] =
    events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.maxBy(_._2)._4) }
      .toSeq.groupBy(_._1)
      .map { case (et, rows) =>
        et -> rows.sortBy(_._2).map(r => (r._2, r._3)) }

  test("kama: bitwise replay of the packed-integer adaptive fold") {
    val out = SparkEntry.queries("ts_kama")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    dailyClose.foreach { case (et, series) =>
      val ps = series.map(_._2)
      // warmup: need lag10 and a full 10-window of |daily move|
      var kama = 0L
      var seeded = false
      ps.indices.drop(10).foreach { i =>
        val mom = math.abs(ps(i) - ps(i - 10))
        val vol10 = (i - 9 to i).map(j => math.abs(ps(j) - ps(j - 1))).sum
        val er = if (vol10 > 0) mom * 1000000L / vol10 else 0L
        val scr = er * 602150L / 1000000L + 64516L
        val sc2 = scr * scr / 1000000L
        assert(sc2 >= 0L && sc2 < 1048576L, "sc2 must fit the pack field")
        if (!seeded) { kama = ps(i); seeded = true }
        else {
          val delta = sc2 * (ps(i) - kama)
          // Long division truncates toward zero = Spark div = DuckDB //
          kama = kama + delta / 1000000L
        }
        val (qClose, qSc, qKama) = out((et, series(i)._1))
        assert(qClose == ps(i) && qSc == sc2 && qKama == kama,
          s"$et ${series(i)._1}: ($qClose,$qSc,$qKama) vs (${ps(i)},$sc2,$kama)")
      }
    }
    assert(out.nonEmpty)
  }

  test("amihud: bitwise replay of the ppm illiquidity lattice") {
    val out = SparkEntry.queries("ts_amihud_illiquidity")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDate(5).toString))).toMap
    val dailyVal = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => ((et, d), rows.map(_._4).sum) }
    dailyClose.foreach { case (et, series) =>
      val illiqs = series.indices.drop(1).flatMap { i =>
        val prev = series(i - 1)._2
        val dv = dailyVal((et, series(i)._1))
        if (prev > 0 && dv > 0) {
          val ret = (series(i)._2 - prev) * 1000000L / prev
          Some((series(i)._1, math.abs(ret) * 1000000L / dv))
        } else None
      }
      val (n, sumI, meanI, maxI, worst) = out(et)
      assert(n == illiqs.size.toLong)
      assert(sumI == illiqs.map(_._2).sum)
      assert(meanI == illiqs.map(_._2).sum / illiqs.size)
      assert(maxI == illiqs.map(_._2).max)
      val expWorst = illiqs.maxBy(x => (x._2, x._1))._1
      assert(worst == expWorst)
    }
  }

  test("poisson bootstrap: weight replay, exact totals, SE > 0") {
    val out = SparkEntry.queries("sample_poisson_bootstrap")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val m = 2147483647L
    def weight(id: Long, r: Long): Long = {
      val b0 = ((id % m) * 37L + r) % m
      val h1 = (b0 * 1103515245L + 12345L) % m
      val hm = (h1 * h1) % m
      val u = ((hm * 69069L + 362437L) % m) % 1000000L
      if (u < 367879L) 0L else if (u < 735759L) 1L
      else if (u < 919699L) 2L else if (u < 980988L) 3L
      else if (u < 996312L) 4L else if (u < 999380L) 5L else 6L
    }
    events.groupBy(_._1).foreach { case (et, rows) =>
      val census = rows.map(_._4).sum
      val totals = (1L to 32L).map(r =>
        rows.map(e => weight(e._3, r) * e._4).sum)
      val s1 = totals.map(BigInt(_)).sum
      val s2 = totals.map(t => BigInt(t) * t).sum
      val mean = s1.toDouble / 32.0
      val se = math.sqrt((BigInt(32) * s2 - s1 * s1).toDouble / 992.0)
      val (nReps, qCensus, qMean, qSe) = out(et)
      assert(nReps == 32L && qCensus == census)
      assert(qMean == mean && qSe == se)
      assert(se > 0.0, "32 hashed replicates cannot be identical")
      // the bootstrap mean of a Poisson(1) scheme estimates the census
      assert(math.abs(mean - census.toDouble) < 6.0 * se)
    }
  }

  test("partition checksum: bitwise replay of the LCG-mix fingerprint") {
    val out = SparkEntry.queries("dq_partition_checksum")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    val m = 2147483647L
    def hv(id: Long): Long = {
      val h1 = ((id % m) * 1103515245L + 12345L) % m
      val hm = (h1 * h1) % m
      (hm * 69069L + 362437L) % m
    }
    events.groupBy(e => (e._1, e._5)).foreach { case ((et, d), rows) =>
      val (n, ck, sc, mn, mx) = out((et, d))
      assert(n == rows.size.toLong)
      assert(ck == rows.map(e => hv(e._3)).sum)
      assert(sc == rows.map(_._4).sum)
      assert(mn == rows.map(_._3).min && mx == rows.map(_._3).max)
    }
    // fingerprints must discriminate: not all checksums identical
    assert(out.values.map(_._2).toSet.size > 1)
  }

  test("knn graph: mutual edges replay the bucketed top-3 exactly") {
    val rows = SparkEntry.queries("sim_knn_graph")(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getInt(3), r.getInt(4))).toSet
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    // replicate the engine's fold order exactly: seed 0.0, index order
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    val planes = graft.similarity.HyperplaneLsh.planes(4, 64)
    def bucket(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (dot(v, p) > 0) 1L << i else 0L }.sum
    val byBucket = vecs.groupBy(v => bucket(v._2))
    val topk = byBucket.values.flatMap { bs =>
      bs.flatMap { case (va, ea) =>
        bs.filter(_._1 != va)
          .map { case (vb, eb) =>
            (vb, dot(ea, eb) / (math.sqrt(dot(ea, ea))
              * math.sqrt(dot(eb, eb)))) }
          .sortBy { case (vb, cos) => (-cos, vb) }
          .take(3).zipWithIndex
          .map { case ((vb, cos), i) => (va, vb) -> ((cos, i + 1)) }
      }
    }.toMap
    val expect = topk.collect {
      case ((a, b), (cos, rab)) if a < b && topk.contains((b, a)) =>
        (a, b, cos, rab, topk((b, a))._2)
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
    got.foreach { case (a, b, _, rab, rba) =>
      assert(a < b && rab <= 3 && rba <= 3)
    }
  }

  test("cusum: bitwise replay of the branch-free one-sided folds") {
    val out = SparkEntry.queries("ts_cusum")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    dailyClose.foreach { case (et, series) =>
      val ps = series.map(_._2)
      val b10 = ps.take(10).sum / 10
      val k = b10 / 50
      val h = b10 / 10
      var sp = 0L; var sm = 0L
      def max0(v: Long) = (v + math.abs(v)) / 2
      ps.indices.drop(10).foreach { i =>
        sp = max0(sp + (ps(i) - b10 - k))
        sm = max0(sm + (b10 - ps(i) - k))
        val (qp, qsp, qsm, qa) = out((et, series(i)._1))
        assert(qp == ps(i) && qsp == sp && qsm == sm)
        assert(qa == (sp > h || sm > h))
      }
    }
    assert(out.nonEmpty)
  }

  test("garman-klass: lattice replay and agreement with true-log GK") {
    import graft.functions.FixedLog2
    val rows = SparkEntry.queries("ts_garman_klass_vol")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val ohlc = events.groupBy(e => (e._1, e._5)).map { case ((et, d), rs) =>
      val cs = rs.map(_._4)
      (et, d, cs.max, cs.min, rs.minBy(_._2)._4, rs.maxBy(_._2)._4)
    }.toSeq
    ohlc.groupBy(_._1).foreach { case (et, days) =>
      val terms = days.filter(_._4 > 0).map { case (_, _, h, l, o, c) =>
        val hl = BigInt(FixedLog2.log2fp(h) - FixedLog2.log2fp(l))
        val co = BigInt(FixedLog2.log2fp(c) - FixedLog2.log2fp(o))
        hl * hl * 500000 - co * co * 386294
      }
      val gs = terms.sum
      val n = terms.size.toLong
      val mean = gs.toDouble / (n.toDouble * 1.099511627776e12 * 1.0e6)
      val (qn, qMean, qVol) = rows(et)
      assert(qn == n && qMean == mean)
      assert(qVol == (if (gs > 0)
        Some(math.sqrt(gs.toDouble / (n.toDouble * 1.099511627776e12
          * 1.0e6))) else None))
      // lattice GK tracks the true-log GK within quantization slack
      val trueGk = days.filter(_._4 > 0).map { case (_, _, h, l, o, c) =>
        val hl = math.log(h.toDouble / l) / math.log(2.0)
        val co = math.log(c.toDouble / o) / math.log(2.0)
        0.5 * hl * hl - 0.386294 * co * co
      }.sum / n
      assert(math.abs(mean - trueGk) < 1e-4)
    }
  }

  test("transition lift: exact rational replay over consecutive pairs") {
    val out = SparkEntry.queries("mine_transition_lift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap
    // rebuild consecutive pairs per user ordered by (ts, event_id)
    val evU = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evU.groupBy(_._1).values.flatMap { rs =>
      val s = rs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq
    val n = trans.size.toLong
    val cab = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ca = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cb = trans.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    assert(out.size == cab.size)
    cab.foreach { case ((a, b), c) =>
      val (qc, qca, qcb, qn, qppm, qlift) = out((a, b))
      assert(qc == c && qca == ca(a) && qcb == cb(b) && qn == n)
      assert(qppm == (BigInt(c) * n * 1000000 / (BigInt(ca(a)) * cb(b))))
      assert(qlift == (BigInt(c) * n).toDouble /
        (BigInt(ca(a)) * cb(b)).toDouble)
    }
  }

  test("trimmed mean: histogram-overlap replay equals the sorted trim") {
    val out = SparkEntry.queries("agg_trimmed_mean")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    events.groupBy(_._1).foreach { case (et, rows) =>
      val cs = rows.map(_._4).sorted
      val n = cs.size
      val lo = n / 10
      val kept = cs.slice(lo, n - lo)
      val (qn, qnt, qMean, qtMean, qtFloor) = out(et)
      assert(qn == n.toLong && qnt == kept.size.toLong)
      assert(qMean == cs.sum.toDouble / n.toDouble)
      assert(qtMean == kept.sum.toDouble / kept.size.toDouble)
      assert(qtFloor == kept.sum / kept.size)
      // trimming moves the estimate toward the middle: bounded spread
      assert(math.abs(qtMean) <= math.abs(qMean) * 2)
    }
  }

  test("shape outliers: top-10 |z| replay over quantized L1 mass") {
    val rows = SparkEntry.queries("emb_norm_outliers")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 10)
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    // Spark round() is HALF_UP (away from zero on ties), not rint
    def roundHalfUp(v: Double): Long =
      (math.signum(v) * math.floor(math.abs(v) + 0.5)).toLong
    val nqs = vecs.flatMap { case (id, lb, emb) =>
      val norm = math.sqrt(dot(emb, emb))
      if (norm > 0)
        Some((id, lb,
          emb.map(x => math.abs(roundHalfUp(x.toDouble / norm * 127.0))).sum))
      else None
    }
    val byLabel = nqs.groupBy(_._2).map { case (lb, vs) =>
      val n = vs.size.toLong
      val s1 = vs.map(_._3).sum
      val s2 = vs.map(v => BigInt(v._3) * v._3).sum
      lb -> ((n, s1, (BigInt(n) * s2 - BigInt(s1) * s1).toLong))
    }
    val zs = nqs.flatMap { case (id, lb, nq) =>
      val (n, s1, varNum) = byLabel(lb)
      if (varNum > 0)
        Some((id, lb, nq, (n * nq - s1).toDouble / math.sqrt(varNum.toDouble)))
      else None
    }
    val expect = zs.sortBy(v => (-math.abs(v._4), v._1)).take(10).toSeq
    assert(rows.toSeq == expect)
  }
}
