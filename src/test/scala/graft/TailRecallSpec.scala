package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedLog2.log2fp

/** Round-6 batch 9: Hill tail index, MATTR diversity, order→ship busday
  * lag, recall@k curve — brute-force replays on the sf0.001 base rows.
  */
class TailRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("hill tail index: top-201 order-statistic log replay") {
    val out = SparkEntry.queries("agg_hill_tail_index")(spark, sfDir)
      .collect()
    assert(out.length == 1)
    val xs = Tables.orders(spark, sfDir)
      .select(graft.olap.Exact.cents(col("o_totalprice")).as("x"))
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val top = xs.take(200)
    val xk = xs(200)
    val s = top.map(log2fp).sum - 200L * log2fp(xk)
    val r = out.head
    assert(r.getAs[Long]("k") == 200L)
    assert(r.getAs[Long]("s_q20") == s)
    assert(r.getAs[Double]("hill_alpha") ==
      200.0 * 1048576.0 / (s.toDouble * 0.6931471805599453))
    // the tail is genuinely ordered: every top value >= the threshold
    assert(top.forall(_ >= xk) && s > 0)
  }

  test("mattr: sliding 50-token window distinct replay per source") {
    val out = SparkEntry.queries("text_mattr_diversity")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.map { case (src, text) =>
      val toks = text.split(" ")
      val nW = math.max(toks.length - 49, 0)
      val dsum = (0 until nW).map { i =>
        toks.slice(i, i + 50).distinct.length.toLong
      }.sum
      (src, nW.toLong, dsum)
    }.filter(_._2 > 0)
    cells.groupBy(_._1).foreach { case (src, rows) =>
      val nw = rows.map(_._2).sum
      val ds = rows.map(_._3).sum
      val r = out(src)
      assert(r.getAs[Long]("n_windows") == nw, src)
      assert(r.getAs[Long]("distinct_sum") == ds, src)
      assert(r.getAs[Double]("mattr") ==
        ds.toDouble / nw.toDouble / 50.0, src)
    }
    // MATTR is a ratio in (0, 1]: 50 tokens hold at most 50 types
    assert(out.values.forall { r =>
      val m = r.getAs[Double]("mattr"); m > 0.0 && m <= 1.0
    })
  }

  test("order-ship busdays: calendar counting replay, total coverage") {
    val out = SparkEntry.queries("cal_order_ship_busdays")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("lag_bucket") ->
        (r.getAs[Long]("n_lineitems"), r.getAs[Long]("revenue_cents")))
      .toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        date_format(to_date(col("o_orderdate")), "yyyy-MM-dd")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        date_format(to_date(col("l_shipdate")), "yyyy-MM-dd"),
        graft.olap.Exact.cents(col("l_extendedprice"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def isBus(d: java.time.LocalDate): Boolean = {
      val dow = d.getDayOfWeek.getValue
      dow <= 5 &&
        !(d.getMonthValue == 1 && d.getDayOfMonth == 1) &&
        !(d.getMonthValue == 7 && d.getDayOfMonth == 4) &&
        !(d.getMonthValue == 12 && d.getDayOfMonth == 25)
    }
    val buckets = li.map { case (ok, sds, cents) =>
      val od = java.time.LocalDate.parse(orders(ok))
      val sd = java.time.LocalDate.parse(sds)
      val bucket = if (!sd.isAfter(od)) -1L
      else {
        val n = Iterator.iterate(od)(_.plusDays(1))
          .takeWhile(_.isBefore(sd)).count(isBus)
        (63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1))).toLong
          .max(0L) // length(bin(n)) - 1, with bin(0) -> bucket 0
      }
      (bucket, cents)
    }
    val hist = buckets.groupBy(_._1).map { case (b, rows) =>
      b -> (rows.length.toLong, rows.map(_._2).sum)
    }
    assert(out == hist)
    assert(out.values.map(_._1).sum == li.length.toLong)
  }

  test("recall@k curve: bounds, monotone counts, k=5 cross-query pin") {
    val out = SparkEntry.queries("sim_recall_at_k_curve")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.keySet == Set(1L, 3L, 5L, 10L))
    out.foreach { case (k, r) =>
      assert(r.getAs[Long]("n_possible") == 10 * k)
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 10 * k, k)
      assert(r.getAs[Double]("recall_at_k") ==
        hits.toDouble / (10.0 * k), k)
    }
    // hit counts can only grow with k (supersets of retrieved/true sets)
    assert(out(1L).getAs[Long]("n_hits") <= out(3L).getAs[Long]("n_hits"))
    assert(out(3L).getAs[Long]("n_hits") <= out(5L).getAs[Long]("n_hits"))
    assert(out(5L).getAs[Long]("n_hits") <= out(10L).getAs[Long]("n_hits"))
    // the k=5 point must agree exactly with sim_ivf_recall (same gt,
    // same index, same probes — two independent implementations)
    val ivf5 = SparkEntry.queries("sim_ivf_recall")(spark, sfDir)
      .agg(sum("n_hits")).collect().head.getLong(0)
    assert(out(5L).getAs[Long]("n_hits") == ivf5)
    // the index genuinely retrieves: recall@10 is far above zero
    assert(out(10L).getAs[Double]("recall_at_k") > 0.5)
  }
}
