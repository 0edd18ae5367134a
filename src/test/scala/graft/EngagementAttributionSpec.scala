package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 7: DAU/MAU stickiness (SlidingDistinct operator),
  * last-touch attribution, LCC share, delete-one-day jackknife —
  * brute-force replays on the sf0.001 base rows.
  */
class EngagementAttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("dau/mau stickiness: brute 30-day window replay, every day") {
    val out = SparkEntry.queries("olap_dau_mau_stickiness")(spark, sfDir)
      .collect()
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    out.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toLocalDate
      val mau = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(29))
      }.map(_._1).distinct.length.toLong
      val dau = ud.filter(_._2 == day).map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("mau") == mau, day)
      assert(r.getAs[Long]("dau") == dau, day)
      assert(r.getAs[Double]("stickiness") ==
        dau.toDouble / mau.toDouble, day)
      // stickiness is a share: DAU can never exceed the window's reach
      assert(dau <= mau)
    }
  }

  test("last-touch attribution: per-purchase prior-event scan replay") {
    val out = SparkEntry.queries("olap_attribution_lasttouch")(spark, sfDir)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(t => (t._2, t._3))
    }
    val credited = byUser.values.flatMap { rows =>
      rows.zipWithIndex.collect {
        case ((_, us, _, "purchase"), i) =>
          val prior = rows.take(i).reverse.find(_._4 != "purchase")
          prior match {
            case Some((_, pus, _, pt)) => (pt, Some((us - pus) / 1000000L))
            case None                  => ("none", None)
          }
      }
    }.toSeq
    credited.groupBy(_._1).foreach { case (ch, rows) =>
      val r = out(ch)
      assert(r.getAs[Long]("n_purchases") == rows.length.toLong, ch)
      assert(r.getAs[Long]("lag_seconds_sum") ==
        rows.flatMap(_._2).sum, ch)
      if (ch != "none")
        assert(r.getAs[Double]("avg_lag_seconds") ==
          rows.flatMap(_._2).sum.toDouble / rows.length.toDouble, ch)
    }
    assert(out.keySet == credited.map(_._1).toSet)
    // the channel mix is genuinely plural (not everything lands on one)
    assert(out.size >= 3)
  }

  test("lcc share: brute union-find replay + component-count certificate") {
    val out = SparkEntry.queries("graph_lcc_share")(spark, sfDir).collect()
    assert(out.length == 1)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] =
      li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val ps = rows.map(_._2).distinct.sorted.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val comps = parent.keys.toSeq.map(find).groupBy(identity)
      .map { case (_, v) => v.size.toLong }
    val r = out.head
    assert(r.getAs[Long]("n_nodes") == parent.size.toLong)
    assert(r.getAs[Long]("n_components") == comps.size.toLong)
    assert(r.getAs[Long]("lcc_size") == comps.max)
    assert(r.getAs[Double]("lcc_share") ==
      comps.max.toDouble / parent.size.toDouble)
    // and on a synthetic forest the labels split components correctly:
    // {1-2-3}, {10-11}, {20-21-22-23} -> sizes 3, 2, 4
    import spark.implicits._
    val syn = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).toDF("u", "v")
    val sizes = graft.dedup.Components.canonicalLabels(syn, "u", "v")
      .groupBy("canonical_id").count().collect()
      .map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 10L -> 2L, 20L -> 4L))
  }

  test("jackknife variance: delete-one-day lattice replay per type") {
    val out = SparkEntry.queries("agg_jackknife_variance")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val base = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("value")).as("cc")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    base.groupBy(_._1).foreach { case (et, rows) =>
      val cells = rows.groupBy(_._2).toSeq.map { case (_, g) =>
        (g.size.toLong, g.map(_._3).sum)
      }
      val n = cells.map(_._1).sum
      val s = cells.map(_._2).sum
      val thetas = cells.map { case (ni, si) =>
        1024L * (s - si) / (n - ni)
      }
      val d = thetas.size.toLong
      val st = thetas.sum
      val stt = thetas.map(x => BigInt(x) * x).sum
      val core = (d * stt - BigInt(st) * st).toLong
      val num = (d - 1) * core / (d * d)
      val r = out(et)
      assert(r.getAs[Long]("n_days") == d, et)
      assert(r.getAs[Long]("mean_q10") == 1024L * s / n, et)
      assert(r.getAs[Long]("jk_var_num_q20") == num, et)
      assert(r.getAs[Double]("jk_se") ==
        math.sqrt(num.toDouble) / 1024.0, et)
      // grouped SE is a real number on real data, not degenerate zero
      assert(num > 0, et)
    }
  }
}
