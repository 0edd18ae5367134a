package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch: bipartite butterflies, Granger lead screen, Simpson
  * sign-flip tripwire, real-decode image entropy, TTL partition sweep —
  * each against an independent local replay.
  */
class ButterflyGrangerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("butterflies: wedge census replays the bipartite count") {
    val row = SparkEntry.queries("graph_butterflies")(spark, sfDir)
      .collect().head
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairCnt = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size)
        yield (ps(i), ps(j))
    }.groupBy(identity).map(_._2.size.toLong)
    assert(row.getAs[Long]("n_pairs") == pairCnt.size.toLong)
    assert(row.getAs[Long]("n_wedges") == pairCnt.sum)
    assert(row.getAs[Long]("n_butterflies") ==
      pairCnt.map(c => c * (c - 1) / 2).sum)
    assert(row.getAs[Long]("max_copairs") == pairCnt.max)
    assert(row.getAs[Long]("n_butterflies") > 0)
  }

  test("granger screen: bitwise replay of the 2x2 normal equations") {
    val row = SparkEntry.queries("ts_granger_screen")(spark, sfDir)
      .collect().head
    val daily = Tables.events(spark, sfDir)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        col("event_type"), graft.olap.Exact.cents(col("value")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rows) =>
        (d, rows.filter(_._2 == "purchase").map(_._3).sum,
          rows.filter(_._2 == "click").map(_._3).sum) }
    val triples = daily.indices.drop(1).map(i =>
      (daily(i)._2, daily(i - 1)._2, daily(i - 1)._3))
    val n = triples.size.toLong
    def bsum(f: ((Long, Long, Long)) => BigInt) = triples.map(f).sum
    val sy = bsum(t => BigInt(t._1)); val s1 = bsum(t => BigInt(t._2))
    val s2 = bsum(t => BigInt(t._3))
    val c11 = (n * bsum(t => BigInt(t._2) * t._2) - s1 * s1).toDouble
    val c22 = (n * bsum(t => BigInt(t._3) * t._3) - s2 * s2).toDouble
    val c12 = (n * bsum(t => BigInt(t._2) * t._3) - s1 * s2).toDouble
    val c1y = (n * bsum(t => BigInt(t._2) * t._1) - s1 * sy).toDouble
    val c2y = (n * bsum(t => BigInt(t._3) * t._1) - s2 * sy).toDouble
    val cyy = (n * bsum(t => BigInt(t._1) * t._1) - sy * sy).toDouble
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val sseF = cyy - b1 * c1y - b2 * c2y
    val sseR = cyy - (c1y / c11) * c1y
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Double]("beta_own_lag") == b1)
    assert(row.getAs[Double]("beta_click_lag") == b2)
    assert(row.getAs[Double]("sse_full") == sseF)
    assert(row.getAs[Double]("sse_restricted") == sseR)
    assert(row.getAs[Double]("f_stat") ==
      (sseR - sseF) / (sseF / (n - 3).toDouble))
    // adding a regressor can only reduce SSE
    assert(sseF <= sseR)
  }

  test("simpson check: integer cov signs replay; pooled sign present") {
    val rows = SparkEntry.queries("agg_simpson_check")(spark, sfDir)
      .collect()
    val j = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_brand"), graft.olap.Exact.cents(col("l_discount")),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def covNum(rs: Seq[(String, Long, Long)]): BigInt = {
      val n = rs.size
      BigInt(n) * rs.map(r => BigInt(r._2) * r._3).sum -
        BigInt(rs.map(_._2).sum) * rs.map(_._3).sum
    }
    val pooledSign = covNum(j.toSeq).signum.toLong
    rows.foreach { r =>
      val sub = j.filter(_._1 == r.getString(0)).toSeq
      val cn = covNum(sub)
      assert(r.getAs[Long]("n") == sub.size.toLong)
      assert(BigInt(r.getAs[Long]("cov_num")) == cn)
      assert(r.getAs[Long]("assoc_sign") == cn.signum.toLong)
      assert(r.getAs[Long]("pooled_sign") == pooledSign)
      assert(r.getAs[Boolean]("sign_flip") ==
        (cn.signum != 0 && cn.signum.toLong != pooledSign))
    }
    // the fixture genuinely exhibits the paradox somewhere
    assert(rows.exists(_.getAs[Boolean]("sign_flip")))
  }

  test("image entropy: real-decode histogram equals the formula replay") {
    import graft.functions.FixedLog2
    val rows = SparkEntry.queries("mm_image_entropy")(spark, sfDir)
      .collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == docs.length)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, nChars) =>
      val w = (1 + id % 8).toInt
      val h = (1 + nChars % 8).toInt
      val bins = new Array[Long](16)
      for (x <- 0 until w; y <- 0 until h)
        bins(((id * 31 + x * 7 + y * 13) % 256).toInt / 16) += 1
      val nz = bins.filter(_ > 0)
      val nPix = nz.sum
      val sclog = nz.map(c => BigInt(c) * FixedLog2.log2fp(c)).sum
      val ent = (BigInt(nPix) * FixedLog2.log2fp(nPix) - sclog).toDouble /
        nPix.toDouble / 1048576.0
      val r = byId(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getAs[Long]("n_pixels") == nPix)
      assert(r.getAs[Long]("n_bins") == nz.length.toLong)
      assert(r.getAs[Double]("entropy_bits") == ent)
      // 16 bins bound the entropy at 4 bits
      assert(ent >= 0.0 && ent <= 4.0 + 1e-9)
    }
  }

  test("ttl sweep: survivors match the 10-day retention rule exactly") {
    val rows = SparkEntry.queries("layout_ttl_sweep")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val maxDt = rows.map(_._1).max
    val cutoff = java.time.LocalDate.parse(maxDt).minusDays(9).toString
    rows.foreach { case (dt, nRows, action, nKept) =>
      if (dt >= cutoff) {
        assert(action == "kept" && nKept == nRows)
      } else {
        assert(action == "dropped" && nKept == 0L)
      }
    }
    assert(rows.exists(_._3 == "kept") && rows.exists(_._3 == "dropped"))
  }

  test("rolling beta: bitwise replay of the exact window moments") {
    val out = SparkEntry.queries("ts_rolling_beta")(spark, sfDir)
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val daily = Tables.events(spark, sfDir)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        col("event_type"), graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rows) =>
        (d, rows.filter(_._2 == "click").map(_._3).sum,
          rows.filter(_._2 == "purchase").map(_._3).sum) }
    daily.indices.drop(9).foreach { i =>
      val win = daily.slice(i - 9, i + 1)
      val sx = win.map(w => BigInt(w._2)).sum
      val sy = win.map(w => BigInt(w._3)).sum
      val sxx = win.map(w => BigInt(w._2) * w._2).sum
      val sxy = win.map(w => BigInt(w._2) * w._3).sum
      val varNum = (BigInt(10) * sxx - sx * sx).toDouble
      val beta = if (varNum > 0)
        Some((BigInt(10) * sxy - sx * sy).toDouble / varNum) else None
      val (qx, qy, qb) = out(daily(i)._1)
      assert(qx == daily(i)._2 && qy == daily(i)._3 && qb == beta)
    }
    assert(out.nonEmpty)
  }

  test("audio silence: below-mean windows replay from the text bytes") {
    val rows = SparkEntry.queries("mm_audio_silence")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.filter(_._2.nonEmpty).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nWin = (bytes.length - 1) / 32 + 1
      val energies = (0 until nWin).map { i =>
        bytes.slice(i * 32, math.min(i * 32 + 64, bytes.length))
          .map { b => val s = (b & 0xff) - 128; s.toLong * s }.sum
      }
      val total = energies.sum
      val silent = energies.count(e => e * nWin < total).toLong
      val (qn, qs, qt, qm) = rows(id)
      assert(qn == nWin.toLong && qs == silent && qt == total
        && qm == energies.max)
    }
    assert(rows.nonEmpty)
  }

  test("top decile share: histogram overlap equals the sorted top slice") {
    val out = SparkEntry.queries("agg_top_decile_share")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val cs = rows.map(_._2).sorted
      val n = cs.size
      val lo = n / 10
      val top = cs.takeRight(lo)
      val (qn, qnt, qts, qppm, qshare) = out(et)
      assert(qn == n.toLong && qnt == lo.toLong)
      assert(qts == top.sum)
      assert(qppm == BigInt(1000000) * top.sum / cs.sum)
      assert(qshare == top.sum.toDouble / cs.sum.toDouble)
      // a decile of a nonuniform distribution carries > 10% of value
      assert(qshare > 0.10)
    }
  }

  test("linear counting: occupancy replay and close-to-true estimate") {
    import graft.functions.FixedLog2
    val out = SparkEntry.queries("sketch_linear_counting")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val m = 2147483647L
    def pos(uid: Long): Long = {
      val h1 = ((uid % m) * 1103515245L + 12345L) % m
      val hm = (h1 * h1) % m
      ((hm * 69069L + 362437L) % m) % 1024L
    }
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val users = rows.map(_._2).distinct
      val z = 1024L - users.map(pos).distinct.size
      val est = 1024L * (FixedLog2.log2fp(1024L) - FixedLog2.log2fp(z))
      val estLc = est.toDouble * 0.6931471805599453 / 1048576.0
      val (qz, qTrue, qEst) = out(et)
      assert(qz == z && qTrue == users.size.toLong && qEst == estLc)
      // LC is accurate well below saturation
      assert(math.abs(estLc - users.size) / users.size < 0.15)
    }
  }

  test("reciprocity: directed-edge replay over consecutive transitions") {
    val row = SparkEntry.queries("graph_transition_reciprocity")(
      spark, sfDir).collect().head
    val evU = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evU.groupBy(_._1).values.flatMap { rs =>
      val s = rs.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1)).filter(p => p._1 != p._2)
    }.toSeq
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nDir = c.size.toLong
    val nRec = c.keys.count(k => c.contains((k._2, k._1))).toLong
    val wTotal = c.values.sum
    val wMin = c.map { case ((a, b), v) =>
      math.min(v, c.getOrElse((b, a), 0L)) }.sum
    assert(row.getAs[Long]("n_directed") == nDir)
    assert(row.getAs[Long]("n_reciprocated") == nRec)
    assert(row.getAs[Long]("r_binary_ppm") == 1000000L * nRec / nDir)
    assert(row.getAs[Long]("w_total") == wTotal)
    assert(row.getAs[Long]("w_min") == wMin)
    assert(row.getAs[Long]("r_weighted_ppm") == 1000000L * wMin / wTotal)
  }
}
