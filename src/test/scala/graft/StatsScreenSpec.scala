package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedLog2.log2fp

/** Round-6 batch 3: G-test, Poisson rate screen, Tukey HSD, systematic
  * thinning, OU half-life — bitwise brute-force replays on the sf0.001
  * base rows (cents/dates lifted via Spark so the replay exercises the
  * statistic, not the casts).
  */
class StatsScreenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // (event_type, day string, ts micros, event_id, cents)
  private lazy val base: Seq[(String, String, Long, Long, Long)] = {
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        graft.olap.Exact.cents(col("value")).as("cc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("g-test: exact lattice replay on the 15-cell contingency") {
    val out = SparkEntry.queries("agg_g_test")(spark, sfDir).collect()
    assert(out.length == 1)
    val cells = base.groupBy(t => (t._1, math.min(2L, t._5 / 7500)))
      .map { case (k, g) => k -> g.size.toLong }
    val n = cells.values.sum
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val g = cells.map { case ((et, vb), o) =>
      BigInt(o) * (log2fp(o * n) - log2fp(rt(et) * ct(vb)))
    }.sum
    val r = out.head
    assert(r.getAs[Long]("n_events") == n)
    assert(r.getAs[Long]("n_cells") == cells.size.toLong)
    assert(r.getAs[Long]("g_scaled") == g.toLong)
    // independence cannot be bit-exact zero on finite data: the lattice
    // statistic must carry signal even when the flag stays down
    assert(g > 0)
    assert(r.getAs[Long]("reject_flag") ==
      (if (g > 11729304L) 1L else 0L))
  }

  test("poisson rate screen: split-count replay, exact score compare") {
    val out = SparkEntry.queries("agg_poisson_rate_test")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val days = base.map(_._2)
    val (mn, mx) = (days.min, days.max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(mn), java.time.LocalDate.parse(mx))
    val mid = java.time.LocalDate.parse(mn).plusDays((span + 1) / 2)
    val e1 = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(mn), mid)
    val e2 = java.time.temporal.ChronoUnit.DAYS.between(
      mid, java.time.LocalDate.parse(mx)) + 1
    base.groupBy(_._1).foreach { case (et, g) =>
      val n1 = g.count(t => java.time.LocalDate.parse(t._2).isBefore(mid))
        .toLong
      val n2 = g.size - n1
      val r = out(et)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2, et)
      assert(r.getAs[Long]("e1") == e1 && r.getAs[Long]("e2") == e2, et)
      val num = BigInt(n1 * (e1 + e2) - (n1 + n2) * e1)
      val den = BigInt((n1 + n2) * e1 * e2)
      assert(r.getAs[Long]("score_q4") == (num * num * 10000 / den).toLong,
        et)
      assert(r.getAs[Long]("rate_shift_flag") ==
        (if (num * num * 10000 > den * 38415) 1L else 0L), et)
    }
  }

  test("tukey hsd: pairwise lattice replay over the 5 type groups") {
    val out = SparkEntry.queries("agg_tukey_hsd")(spark, sfDir).collect()
    assert(out.length == 10)
    val g = base.groupBy(_._1).map { case (et, rows) =>
      et -> ((rows.size.toLong, rows.map(_._5).sum,
        rows.map(t => BigInt(t._5) * t._5).sum))
    }
    val nn = g.values.map(_._1).sum
    val k = g.size.toLong
    val ssw = g.values.map { case (n, s, ss) => ss - BigInt(s) * s / n }.sum
    out.foreach { r =>
      val (na, sa, _) = g(r.getAs[String]("type_a"))
      val (nb, sb, _) = g(r.getAs[String]("type_b"))
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val dq = BigInt(256) * sa / na - BigInt(256) * sb / nb
      assert(r.getAs[Long]("mean_diff_q8") == dq.toLong)
      val lhs = 100 * dq * dq * (nn - k) * 2 * na * nb
      val rhs = BigInt(1488) * 65536 * ssw * (na + nb)
      assert(r.getAs[Long]("hsd_ratio_q4") == (10000 * lhs / rhs).toLong)
      assert(r.getAs[Long]("hsd_flag") == (if (lhs > rhs) 1L else 0L))
    }
  }

  test("systematic thinning: rank replay per (type, day) cell") {
    val out = SparkEntry.queries("sample_systematic")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val kept = base.groupBy(t => (t._1, t._2)).toSeq.flatMap {
      case (_, rows) =>
        rows.sortBy(t => (t._3, t._4)).zipWithIndex
          .collect { case (t, i) if (i + 1) % 20 == 7 => t }
    }
    base.groupBy(_._1).foreach { case (et, g) =>
      val kg = kept.filter(_._1 == et)
      val r = out(et)
      assert(r.getAs[Long]("n_total") == g.size.toLong, et)
      assert(r.getAs[Long]("n_kept") == kg.size.toLong, et)
      assert(r.getAs[Long]("id_checksum") == kg.map(_._4).sum, et)
      assert(r.getAs[Long]("cents_kept") == kg.map(_._5).sum, et)
      // even spacing: one kept row per full stride in every cell
      assert(kg.nonEmpty && kg.size <= g.size / 20 +
        g.groupBy(_._2).size, et)
    }
  }

  test("ou half-life: AR(1) lattice replay on daily cents totals") {
    val out = SparkEntry.queries("ts_ou_halflife")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    base.groupBy(_._1).foreach { case (et, g) =>
      val daily = g.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, rows) => rows.map(_._5).sum }
      val pairs = daily.zip(daily.tail).map { case (px, x) => (px, x) }
      val n = pairs.size.toLong
      val sxy = pairs.map { case (px, x) => BigInt(x) * px }.sum
      val sx = pairs.map(_._2).sum
      val sp = pairs.map(_._1).sum
      val spp = pairs.map { case (px, _) => BigInt(px) * px }.sum
      val num = BigInt(n) * sxy - BigInt(sx) * sp
      val den = BigInt(n) * spp - BigInt(sp) * sp
      // BigInt / truncates toward zero like DIV on both engines
      val phi = (65536 * num / den).toLong
      val r = out(et)
      assert(r.getAs[Long]("n") == n, et)
      assert(r.getAs[Long]("phi_q16") == phi, et)
      val aphi = math.abs(phi)
      if (aphi >= 1 && aphi <= 65535) {
        assert(r.getAs[Long]("reverting_flag") == 1L, et)
        assert(r.getAs[Long]("halflife_q8") ==
          268435456L / (16777216L - log2fp(aphi)), et)
      } else assert(r.getAs[Long]("reverting_flag") == 0L, et)
      // the fixture's daily totals are stationary: |phi| < 1 for every
      // series, so the half-life column genuinely populates
      assert(aphi < 65536L, et)
    }
  }
}
