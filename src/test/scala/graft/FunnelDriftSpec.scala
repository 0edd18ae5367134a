package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 funnel/drift/indicator batch: windowFunnel conversion depth,
  * pooled-t/Cohen's-d effect sizes, stochastic oscillator, ingest-volume
  * anomaly gate, event-sequence regex matching — each pinned against an
  * independent local brute-force replay (bitwise where the query's
  * portability contract promises it), not just the DuckDB oracle.
  */
class FunnelDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // (type, ts-micros, event_id, cents, session-TZ date string, user_id)
  private lazy val events: Seq[(String, Long, Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        col("event_id"), graft.olap.Exact.cents(col("value")).as("c"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5))).toSeq

  test("window funnel: stage counts replay the 3-day anchored chain") {
    val rows = SparkEntry.queries("olap_window_funnel")(spark, sfDir)
      .collect().map(r => r.getString(1) -> r.getAs[Long]("n_users")).toMap
    val horizonMicros = 3L * 24 * 3600 * 1000000
    val byUser = events.groupBy(_._6)
    var nV = 0L; var nC = 0L; var nP = 0L
    byUser.foreach { case (_, evs) =>
      val views = evs.filter(_._1 == "view").map(_._2)
      if (views.nonEmpty) {
        nV += 1
        val t1 = views.min
        val clicks = evs.filter(e => e._1 == "click" && e._2 >= t1 &&
          e._2 <= t1 + horizonMicros).map(_._2)
        if (clicks.nonEmpty) {
          nC += 1
          val t2 = clicks.min
          val buys = evs.filter(e => e._1 == "purchase" && e._2 >= t2 &&
            e._2 <= t1 + horizonMicros)
          if (buys.nonEmpty) nP += 1
        }
      }
    }
    assert(rows("view") == nV)
    assert(rows("click_in_window") == nC)
    assert(rows("purchase_in_window") == nP)
    assert(nV >= nC && nC >= nP && nP > 0, "funnel must be monotone with signal")
  }

  test("effect size: bitwise replay of the pooled t / d / welch-df chain") {
    val out = SparkEntry.queries("agg_effect_size_t")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("t_pooled"), r.getAs[Double]("cohen_d"),
          r.getAs[Double]("df_welch")))).toMap
    val stats = events.groupBy(_._1).map { case (et, rows) =>
      val cs = rows.map(_._4)
      val n = cs.size.toLong
      val sc = cs.sum
      val ss = cs.map(c => BigInt(c) * c).sum
      et -> ((n, sc, ss))
    }
    val types = stats.keys.toSeq.sorted
    for (ia <- types.indices; ib <- (ia + 1) until types.size) {
      val (na, sca, ssa) = stats(types(ia))
      val (nb, scb, ssb) = stats(types(ib))
      val ma = sca.toDouble / na.toDouble
      val mb = scb.toDouble / nb.toDouble
      val va = (BigInt(na) * ssa - BigInt(sca) * sca).toDouble /
        (na * (na - 1)).toDouble
      val vb = (BigInt(nb) * ssb - BigInt(scb) * scb).toDouble /
        (nb * (nb - 1)).toDouble
      val sp2 = ((na - 1).toDouble * va + (nb - 1).toDouble * vb) /
        (na + nb - 2).toDouble
      val t = (ma - mb) / (math.sqrt(sp2) *
        math.sqrt(1.0 / na.toDouble + 1.0 / nb.toDouble))
      val d = (ma - mb) / math.sqrt(sp2)
      val vna = va / na.toDouble; val vnb = vb / nb.toDouble
      val df = (vna + vnb) * (vna + vnb) /
        (vna * vna / (na - 1).toDouble + vnb * vnb / (nb - 1).toDouble)
      val (qt, qd, qdf) = out((types(ia), types(ib)))
      assert(qt == t && qd == d && qdf == df,
        s"${types(ia)}/${types(ib)}: ($qt,$qd,$qdf) vs ($t,$d,$df)")
      // Welch df sits between min(na,nb)-1 and na+nb-2
      assert(df >= (math.min(na, nb) - 1).toDouble - 1e-9 &&
        df <= (na + nb - 2).toDouble + 1e-9)
    }
  }

  test("stochastic oscillator: %K in [0,1e6], %D replay, NULL gating") {
    val rows = SparkEntry.queries("ts_stochastic_oscillator")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      val ks = sorted.map(r =>
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
      // warm-up gate: first 13 rows have no %K
      assert(ks.take(13).forall(_.isEmpty))
      ks.flatten.foreach(k => assert(k >= 0L && k <= 1000000L))
      // %D = floor mean of a full 3-window of non-null %K
      sorted.indices.foreach { i =>
        val dv = if (sorted(i).isNullAt(4)) None
                 else Some(sorted(i).getLong(4))
        val window = (i - 2 to i).filter(_ >= 0).flatMap(j => ks(j))
        if (i >= 2 && window.size == 3)
          assert(dv.contains(window.sum / 3))
        else assert(dv.isEmpty)
      }
    }
  }

  test("volume anomaly: bitwise replay of the trailing-7 lattice z") {
    val out = SparkEntry.queries("dq_volume_anomaly")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val daily = events.groupBy(e => (e._1, e._5))
      .map { case ((et, d), rows) => (et, d, rows.size.toLong) }.toSeq
    daily.groupBy(_._1).foreach { case (et, days) =>
      val counts = days.sortBy(_._2).map(d => (d._2, d._3))
      counts.indices.drop(7).foreach { i =>
        val trail = counts.slice(i - 7, i).map(_._2)
        val n = counts(i)._2
        val s1 = trail.sum
        val s2 = trail.map(x => x * x).sum
        val varNum = 7 * s2 - s1 * s1
        val z = if (varNum > 0)
          Some((7 * n - s1).toDouble / math.sqrt(varNum.toDouble))
        else None
        val (qn, qs1, qvar, qz) = out((et, counts(i)._1))
        assert(qn == n && qs1 == s1 && qvar == varNum && qz == z)
      }
    }
    // rows exist only where the trailing window is full
    assert(out.nonEmpty)
  }

  test("sequence match: java-regex replay over per-user transcripts") {
    val rows = SparkEntry.queries("olap_sequence_match")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        r.getAs[Long]("n_users"), r.getAs[Double]("frac")))).toMap
    val strings = events.groupBy(_._6).map { case (_, evs) =>
      evs.sortBy(e => (e._2, e._3)).map(_._1.head).mkString
    }.toSeq
    val total = strings.size
    rows.foreach { case (_, (pat, n, frac)) =>
      val rx = pat.r
      val expect = strings.count(s => rx.findFirstIn(s).isDefined)
      assert(n == expect.toLong)
      assert(frac == expect.toDouble / total.toDouble)
    }
    // the fixture has real funnel signal
    assert(rows("funnel_ordered")._2 > 0)
  }
}
