package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch: ADF unit-root screen, runs test, hash-uniformity KS,
  * streaming volume monitor — local replays plus the streamed==batch pin.
  */
class RunsAdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val dailyClose: Map[String, Seq[(String, Long)]] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        graft.olap.Exact.cents(col("value")).as("c"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(e => (e._1, e._4))
      .map { case ((et, d), rows) => (et, d, rows.maxBy(_._2)._3) }
      .toSeq.groupBy(_._1)
      .map { case (et, rows) =>
        et -> rows.sortBy(_._2).map(r => (r._2, r._3)) }

  test("adf screen: bitwise replay of the lag-and-trend regression") {
    val out = SparkEntry.queries("ts_adf_screen")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    dailyClose.foreach { case (et, series) =>
      val ps = series.map(_._2)
      // (y = Δp, x1 = p lag, x2 = row index starting at 2)
      val rows = ps.indices.drop(1).map(i =>
        (ps(i) - ps(i - 1), ps(i - 1), (i + 1).toLong))
      val n = rows.size.toLong
      def bs(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
      val sy = bs(r => BigInt(r._1)); val s1 = bs(r => BigInt(r._2))
      val s2 = bs(r => BigInt(r._3))
      val c11 = (n * bs(r => BigInt(r._2) * r._2) - s1 * s1).toDouble
      val c22 = (n * bs(r => BigInt(r._3) * r._3) - s2 * s2).toDouble
      val c12 = (n * bs(r => BigInt(r._2) * r._3) - s1 * s2).toDouble
      val c1y = (n * bs(r => BigInt(r._2) * r._1) - s1 * sy).toDouble
      val c2y = (n * bs(r => BigInt(r._3) * r._1) - s2 * sy).toDouble
      val cyy = (n * bs(r => BigInt(r._1) * r._1) - sy * sy).toDouble
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val sse = cyy - b1 * c1y - b2 * c2y
      val t = b1 / math.sqrt((sse / (n.toDouble * (n - 3).toDouble))
        * n.toDouble * c22 / det)
      val (qn, qg, qtr, qt) = out(et)
      assert(qn == n && qg == b1 && qtr == b2 && qt == t)
      // a mean-reverting daily series rejects the unit root: gamma < 0
      assert(b1 < 0.0)
    }
  }

  test("runs test: integer runs replay and z formula") {
    val out = SparkEntry.queries("ts_runs_test")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    dailyClose.foreach { case (et, series) =>
      val ps = series.map(_._2)
      val sgns = ps.indices.drop(1).flatMap { i =>
        if (ps(i) > ps(i - 1)) Some(1) else if (ps(i) < ps(i - 1)) Some(-1)
        else None
      }
      val n1 = sgns.count(_ == 1).toLong
      val n2 = sgns.count(_ == -1).toLong
      val runs = 1L + sgns.zip(sgns.drop(1)).count(p => p._1 != p._2)
      val n = (n1 + n2).toDouble
      val mu = 2.0 * n1 * n2 / n + 1.0
      val vr = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
      val (qn1, qn2, qr, qz) = out(et)
      assert(qn1 == n1 && qn2 == n2 && qr == runs)
      assert(qz == (runs.toDouble - mu) / math.sqrt(vr))
    }
  }

  test("hash uniformity: lattice D replay and the LCG passes KS") {
    val row = SparkEntry.queries("agg_hash_uniformity_ks")(spark, sfDir)
      .collect().head
    val m = 2147483647L
    val us = Tables.events(spark, sfDir).select("event_id").collect()
      .map { r =>
        val id = r.getLong(0)
        val h1 = ((id % m) * 1103515245L + 12345L) % m
        val hm = (h1 * h1) % m
        ((hm * 69069L + 362437L) % m) % 1000000L
      }
    val n = us.length.toLong
    val cells = us.groupBy(identity).map { case (u, v) =>
      (u, v.length.toLong) }.toSeq.sortBy(_._1)
    var cum = 0L
    var dNum = 0L
    cells.foreach { case (u, cnt) =>
      val lo = math.abs(cum * 1000000L - n * u)
      cum += cnt
      val hi = math.abs(cum * 1000000L - n * (u + 1))
      dNum = math.max(dNum, math.max(lo, hi))
    }
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("d_num") == dNum)
    val d = dNum.toDouble / (n.toDouble * 1.0e6)
    assert(row.getAs[Double]("d_stat") == d)
    assert(row.getAs[Double]("d_sqrt_n") == d * math.sqrt(n.toDouble))
    // the mix chain must actually BE uniform (KS 1% critical ≈ 1.63)
    assert(d * math.sqrt(n.toDouble) < 1.63,
      s"spread hash fails uniformity: D·√n = ${d * math.sqrt(n.toDouble)}")
  }

  test("streaming volume monitor is bitwise the batch anomaly gate") {
    val streamed = SparkEntry.queries("stream_volume_anomaly")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("dq_volume_anomaly")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("mde power: bitwise replay and the n^-1/2 scaling sanity") {
    val out = SparkEntry.queries("agg_mde_power")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val cs = rows.map(_._2)
      val n = cs.size.toLong
      val sc = cs.sum
      val ss = cs.map(c => BigInt(c) * c).sum
      val nArm = n / 2
      val v = (BigInt(n) * ss - BigInt(sc) * sc).toDouble /
        (n * (n - 1)).toDouble
      val mde = (1.96 + 0.8416) * math.sqrt(2.0 * v / nArm.toDouble)
      val (qn, qna, qMean, qVar, qAbs, qRel) = out(et)
      assert(qn == n && qna == nArm)
      assert(qMean == sc.toDouble / n.toDouble / 100.0)
      assert(qVar == v / 10000.0)
      assert(qAbs == mde / 100.0)
      assert(qRel == mde / (sc.toDouble / n.toDouble))
      // a realistic metric at this n: detectable lift is a few percent+
      assert(qRel > 0.0 && qRel < 1.0)
    }
  }

  test("markov holding: geometric dwell replay from transitions") {
    val out = SparkEntry.queries("ts_markov_holding")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val evU = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evU.groupBy(_._1).values.flatMap { rs =>
      val s = rs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq
    trans.groupBy(_._1).foreach { case (a, ts) =>
      val cTotal = ts.size.toLong
      val cSelf = ts.count(p => p._2 == a).toLong
      if (cTotal > cSelf) {
        val (qt, qs, qp, qh, qd) = out(a)
        assert(qt == cTotal && qs == cSelf)
        assert(qp == 1000000L * cSelf / cTotal)
        assert(qh == 1000000L * cTotal / (cTotal - cSelf))
        assert(qd == cTotal.toDouble / (cTotal - cSelf).toDouble)
        assert(qd >= 1.0)
      }
    }
    assert(out.nonEmpty)
  }

  test("intrinsic dimension: bucketed TwoNN replay, sane ID band") {
    import graft.functions.FixedLog2
    val row = SparkEntry.queries("emb_intrinsic_dim")(spark, sfDir)
      .collect().head
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    val planes = graft.similarity.HyperplaneLsh.planes(4, 64)
    def bucket(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (dot(v, p) > 0) 1L << i else 0L }.sum
    val mus = vecs.groupBy(v => bucket(v._2)).values.flatMap { bs =>
      bs.flatMap { case (va, ea) =>
        val ds = bs.filter(_._1 != va)
          .map { case (vb, eb) =>
            (1.0 - dot(ea, eb) / (math.sqrt(dot(ea, ea))
              * math.sqrt(dot(eb, eb))), vb) }
          .sortBy(identity).take(2)
        if (ds.size == 2 && ds.head._1 > 0)
          Some(math.floor(ds(1)._1 / ds.head._1 * 1000000.0).toLong)
        else None
      }
    }.filter(_ > 1000000L).toSeq
    val n = mus.size.toLong
    val denom = mus.map(mu =>
      FixedLog2.log2fp(mu) - FixedLog2.log2fp(1000000L)).sum
    assert(row.getAs[Long]("n_points") == n)
    assert(row.getAs[Long]("denom_bits") == denom)
    val id = n.toDouble * 1048576.0 / (denom.toDouble * 0.6931471805599453)
    assert(row.getAs[Double]("id_hat") == id)
    // a 64-d embedding's intrinsic dimension lives in (2, 64]
    assert(id > 2.0 && id <= 64.0)
  }

  test("sprt monitor: exact integer score replay and decisions") {
    val out = SparkEntry.queries("agg_sprt_monitor")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(e => (e._1, e._2))
      .map { case ((et, d), rows) => (et, d, rows.map(_._3).sum) }
      .toSeq.groupBy(_._1)
      .map { case (et, rows) => et -> rows.sortBy(_._2) }
    daily.foreach { case (et, series) =>
      val base = series.take(10).map(_._3)
      val mu0 = base.sum / 10
      val mu1 = mu0 + mu0 / 20
      val varNum = (BigInt(10) * base.map(x => BigInt(x) * x).sum
        - BigInt(base.sum) * base.sum).toLong
      val thr = 2.0 * (varNum.toDouble / 90.0) * 2.9444389791664403
      var cum = 0L
      series.drop(10).foreach { case (_, d, x) =>
        cum += 2L * (mu1 - mu0) * x - (mu1 * mu1 - mu0 * mu0)
        val (qx, qc, qd) = out((et, d))
        assert(qx == x && qc == cum)
        val expect = if (cum.toDouble >= thr) "accept_lift"
          else if (cum.toDouble <= -thr) "accept_baseline"
          else "continue"
        assert(qd == expect)
      }
    }
    // non-degenerate at this SF: the walk actually moves both ways
    // (boundary crossings appear at larger SFs; sf0.001 stays inside)
    val cums = out.values.map(_._2)
    assert(cums.exists(_ > 0L) || cums.exists(_ < 0L))
    assert(cums.toSet.size > 1)
  }

  test("doc length outliers: MAD flags replay per source") {
    val out = SparkEntry.queries("dq_doc_length_outliers")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.size
      val med = sorted((n + 1) / 2 - 1)._3
      val devs = rows.map(r => (math.abs(r._3 - med), r._2))
        .sortBy(identity)
      val mad = devs((n + 1) / 2 - 1)._1
      val outliers = devs.count(d => d._1 * 10000L > mad * 3L * 14826L)
      val (qn, qMed, qMad, qOut) = out(src)
      assert(qn == n.toLong && qMed == med && qMad == mad)
      assert(qOut == outliers.toLong)
    }
    assert(out.nonEmpty)
  }
}
