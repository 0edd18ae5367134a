package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 coverage-gap suite: local brute-force replays for the five
  * queries that shipped in late round-5 batches with oracles but no spec
  * (VERDICT r5 "What's missing" #3) — sliding 2-day windows, seasonal
  * Mann–Kendall, ABC class migration, the neighbor-degree curve, and the
  * two-step transition matrix square.
  */
class MigrationCurveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sliding 2d windows: every event lands in exactly its two windows") {
    val out = SparkEntry.queries("ts_sliding_window_2d")(spark, sfDir)
      .withColumn("ws", date_format(col("window_start"), "yyyy-MM-dd"))
      .collect()
      .map(r => (r.getAs[String]("ws"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("sum_value")))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // event on day d → windows starting d-1 and d (2-day width, 1-day step)
    val cells = ev.flatMap { case (et, d, c) =>
      val day = java.time.LocalDate.parse(d)
      Seq((day.minusDays(1).toString, et, c), (d, et, c))
    }.groupBy(e => (e._1, e._2))
    assert(out.keySet == cells.keySet)
    cells.foreach { case (k, es) =>
      assert(out(k)._1 == es.size.toLong, k)
      assert(out(k)._2 == es.map(e => BigInt(e._3)).sum.toDouble / 100.0, k)
    }
  }

  test("seasonal mann-kendall: stratified pair-sign replay, bitwise z") {
    val out = SparkEntry.queries("ts_seasonal_mann_kendall")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
          r.getAs[Long]("var18"), r.getAs[Double]("z")))).toMap
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(e => (e._1, e._2))
      .map { case ((et, d), rows) => (et, d, rows.map(_._3).sum) }.toSeq
    daily.groupBy(_._1).foreach { case (et, cells) =>
      // Sunday=1 convention matches Spark's dayofweek
      def dow(d: String): Int =
        java.time.LocalDate.parse(d).getDayOfWeek.getValue % 7 + 1
      val strata = cells.map(c => (dow(c._2), c._2, c._3)).groupBy(_._1)
      val s = strata.values.map { st =>
        (for {
          i <- st; j <- st; if i._2 < j._2
        } yield math.signum((j._3 - i._3).toDouble).toLong).sum
      }.sum
      val var18 = strata.values.map { st =>
        val n = st.size.toLong
        val ties = st.groupBy(_._3).values
          .map(g => g.size.toLong)
          .map(t => t * (t - 1) * (t * 2 + 5)).sum
        n * (n - 1) * (n * 2 + 5) - ties
      }.sum
      val sAdj = if (s > 0) s - 1 else if (s < 0) s + 1 else 0L
      val z = sAdj.toDouble / math.sqrt(var18.toDouble / 18.0)
      val (qn, qs, qv, qz) = out(et)
      assert(qn == cells.size.toLong, et)
      assert(qs == s && qv == var18, et)
      assert(qz == z, et)
    }
  }

  test("abc migration: sorted cum-share replay of both halves") {
    val out = SparkEntry.queries("olap_abc_migration")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("class_h1"),
        r.getAs[String]("class_h2")) -> r.getAs[Long]("n_parts")).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("l_extendedprice")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def classify(rows: Seq[(Long, Long)]): Map[Long, String] = {
      val total = rows.map(r => BigInt(r._2)).sum
      var cum = BigInt(0)
      rows.sortBy(r => (-r._2, r._1)).map { case (pk, c) =>
        cum += c
        pk -> (if (cum * 100 <= total * 80) "A"
               else if (cum * 100 <= total * 95) "B" else "C")
      }.toMap
    }
    def half(pred: String => Boolean) = classify(
      li.filter(e => pred(e._2)).groupBy(_._1)
        .map { case (pk, es) => pk -> es.map(_._3).sum }.toSeq)
    val h1 = half(_ < "1995-01-01"); val h2 = half(_ >= "1995-01-01")
    val matrix = h1.keySet.intersect(h2.keySet).toSeq
      .map(pk => (h1(pk), h2(pk))).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(out == matrix)
    // conservation: every common part lands in exactly one matrix cell
    assert(out.values.sum == h1.keySet.intersect(h2.keySet).size.toLong)
  }

  test("knn degree curve: per-bucket brute replay, exact then bitwise") {
    val out = SparkEntry.queries("graph_knn_degree_curve")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("log2_degree") ->
        ((r.getAs[Long]("n_edges"), r.getAs[Long]("sum_nb_deg"),
          r.getAs[Long]("knn_floor"), r.getAs[Double]("knn")))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val e = li.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps; if a < b) yield (a, b)
    }.toSeq.distinct
    val sym = e ++ e.map(p => (p._2, p._1))
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val buckets = sym.map { case (c, x) =>
      (63 - java.lang.Long.numberOfLeadingZeros(deg(c)), deg(x))
    }.groupBy(_._1)
    assert(out.keySet == buckets.keySet.map(_.toLong))
    buckets.foreach { case (kb, es) =>
      val (n, sumNb, floor, knn) = out(kb.toLong)
      assert(n == es.size.toLong && sumNb == es.map(_._2).sum, kb)
      assert(floor == sumNb / n, kb)
      assert(knn == sumNb.toDouble / n.toDouble, kb)
    }
  }

  test("transition 2-step: matrix-square replay, exact ppm") {
    val out = SparkEntry.queries("mine_transition_2step")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("c")) ->
        ((r.getAs[Long]("n2"), r.getAs[Long]("p2_ppm"),
          r.getAs[Double]("p2")))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val c1 = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n2 = (for {
      ((a, b1), cab) <- c1.toSeq; ((b2, c), cbc) <- c1.toSeq; if b1 == b2
    } yield ((a, c), BigInt(cab) * cbc))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val rowTot = n2.toSeq.groupBy(_._1._1)
      .map { case (a, v) => a -> v.map(_._2).sum }
    assert(out.keySet == n2.keySet)
    n2.foreach { case ((a, c), v) =>
      val (qn2, qppm, qp2) = out((a, c))
      assert(BigInt(qn2) == v, (a, c))
      assert(BigInt(qppm) == v * 1000000 / rowTot(a), (a, c))
      assert(qp2 == v.toDouble / rowTot(a).toDouble, (a, c))
    }
  }
}
