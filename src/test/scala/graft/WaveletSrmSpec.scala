package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch: Theil–Sen slope, Haar wavelet energy, binary-seg
  * changepoint, sample-ratio-mismatch guardrail, cumulative-distinct
  * curve — local brute-force replays (bitwise where the portability
  * contract promises it) plus one semantic pin each.
  */
class WaveletSrmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // (type -> ordered day cells (epochDay, closeCents, dailyTotalCents))
  private lazy val dayCells: Map[String, Seq[(Long, Long, Long)]] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("tsl"),
        graft.olap.Exact.cents(col("value")).as("c"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("dn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(e => (e._1, e._4))
      .map { case ((et, dn), rows) =>
        (et, dn, rows.maxBy(_._2)._3, rows.map(_._3).sum) }
      .toSeq.groupBy(_._1)
      .map { case (et, rows) =>
        et -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4)) }

  test("theil-sen: brute pairwise-slope replay, exact ppm median") {
    val out = SparkEntry.queries("ts_theil_sen_days")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_ppm_med")))).toMap
    dayCells.foreach { case (et, cells) =>
      val slopes = (for {
        a <- cells; b <- cells; if a._1 < b._1
      } yield {
        val num = BigInt(b._2 - a._2) * 1000000
        val den = BigInt(b._1 - a._1)
        // floor division (both engines' spelled-out pmod formula)
        val q = (num - (((num % den) + den) % den)) / den
        q.toLong
      }).sorted
      val n = slopes.length
      // first rank r with 2r >= n+1 is ceil((n+1)/2) = (n+2)/2 in ints
      val med = slopes((n + 2) / 2 - 1)
      val (qn, qm) = out(et)
      assert(qn == n.toLong && qm == med, et)
      // a slope estimator on the fixture's bounded closes stays bounded
      assert(math.abs(qm) < 1000000L * 100000L, et)
    }
  }

  test("haar energy: per-level detail replay, exact energies") {
    val out = SparkEntry.queries("ts_haar_energy")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("level")) ->
        ((r.getAs[Long]("n_blocks"), r.getAs[Long]("energy")))).toMap
    dayCells.foreach { case (et, cells) =>
      val cs = cells.take(32).map(_._2)
      for (level <- 1 to 3) {
        val w = 1 << level
        val blocks = cs.grouped(w).filter(_.size == w).toSeq
        val energy = blocks.map { b =>
          val d = b.take(w / 2).map(BigInt(_)).sum -
            b.drop(w / 2).map(BigInt(_)).sum
          d * d
        }.sum
        if (blocks.nonEmpty) {
          val (qn, qe) = out((et, level.toLong))
          assert(qn == blocks.size.toLong, s"$et/$level")
          assert(BigInt(qe) == energy, s"$et/$level")
        } else assert(!out.contains((et, level.toLong)), s"$et/$level")
      }
    }
  }

  test("changepoint: exhaustive objective replay, exact argmax") {
    val out = SparkEntry.queries("ts_changepoint_binseg")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("t_star"),
          r.getAs[Long]("f_q"), r.getAs[Long]("mean_before_c"),
          r.getAs[Long]("mean_after_c")))).toMap
    dayCells.foreach { case (et, cells) =>
      val tot = cells.map(_._3)
      val n = tot.length
      val st = tot.map(BigInt(_)).sum
      def fq(t: Int): Long = {
        val sl = tot.take(t).map(BigInt(_)).sum
        // BigInt / truncates toward zero for positives == both engines
        (sl * sl / t + (st - sl) * (st - sl) / (n - t)).toLong
      }
      val (tStar, f) = (1 until n).map(t => (t, fq(t)))
        .maxBy { case (t, v) => (v, -t) }
      val sl = tot.take(tStar).map(BigInt(_)).sum
      val (qn, qt, qf, qb, qa) = out(et)
      assert(qn == n.toLong && qt == tStar.toLong && qf == f, et)
      assert(BigInt(qb) == sl / tStar, et)
      assert(BigInt(qa) == (st - sl) / (n - tStar), et)
    }
  }

  test("srm: exact arm-count replay; fixture trips the signup flag") {
    val out = SparkEntry.queries("agg_srm_check")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Long]("srm_num"),
          r.getAs[Double]("srm_chi2"), r.getAs[Long]("srm_flag")))).toMap
    val m = 2147483647L
    val arms = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0),
        if ((((r.getLong(1) % m) * 1103515245L + 12345L) % m) % 2 == 0) "a"
        else "b"))
    arms.groupBy(_._1).foreach { case (et, es) =>
      val na = es.count(_._2 == "a").toLong
      val nb = es.count(_._2 == "b").toLong
      val (qna, qnb, qnum, qchi, qflag) = out(et)
      assert(qna == na && qnb == nb, et)
      assert(qnum == (na - nb) * (na - nb), et)
      assert(qchi == ((na - nb) * (na - nb)).toDouble / (na + nb).toDouble,
        et)
      assert(qflag ==
        (if (BigInt((na - nb) * (na - nb)) * 10000 >
             BigInt(na + nb) * 38415) 1L else 0L), et)
    }
    // the guardrail must be able to fire: at sf0.01 the signup split
    // genuinely mismatches; at any SF the flags must not ALL fire
    assert(out.values.map(_._5).sum < out.size.toLong)
  }

  test("cumulative distinct: first-day replay, monotone curve") {
    val out = SparkEntry.queries("olap_cumulative_distinct")(spark, sfDir)
      .withColumn("ds", date_format(col("dt"), "yyyy-MM-dd"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("ds")) ->
        ((r.getAs[Long]("new_users"), r.getAs[Long]("cum_users")))).toMap
    val fd = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(e => (e._1, e._2))
      .map { case ((et, u), rows) => (et, u, rows.map(_._3).min) }
    fd.groupBy(_._1).foreach { case (et, us) =>
      val byDay = us.groupBy(_._3).map { case (d, g) => d -> g.size.toLong }
      var cum = 0L
      byDay.toSeq.sortBy(_._1).foreach { case (d, nu) =>
        cum += nu
        val (qn, qc) = out((et, d))
        assert(qn == nu && qc == cum, s"$et/$d")
      }
      // the curve ends at the series' total distinct users
      assert(cum == us.map(_._2).toSeq.distinct.size.toLong, et)
    }
  }
}
