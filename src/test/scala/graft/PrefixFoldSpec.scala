package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The declarative prefix-list window forms
  * (`collect_list(...).over(unboundedPreceding..currentRow)` + `aggregate`)
  * are the SEMANTIC DEFINITION of the recursive indicators, but they are
  * O(n²) in per-series length, so the shipped plans route through the
  * linear `graft.ts.PrefixFold` one-pass fold (VERDICT r6 item 2). This
  * suite keeps the window forms alive as cross-checks: for each rewritten
  * query it recomputes the declarative form on the same inputs and pins
  * shipped == declarative CELL FOR CELL (doubles compared by raw bits),
  * plus a direct unit pin of PrefixFold's key-reset behavior.
  */
class PrefixFoldSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Collect a frame into (sorted row-string) sequence with doubles
    * rendered as raw IEEE bits so "equal" means bitwise.
    */
  private def cells(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val names = df.schema.fieldNames.sorted
    df.collect().map { r =>
      names.map { n =>
        val i = r.fieldIndex(n)
        if (r.isNullAt(i)) "null"
        else r.get(i) match {
          case d: java.lang.Double =>
            java.lang.Long.toHexString(
              java.lang.Double.doubleToRawLongBits(d))
          case v => v.toString
        }
      }.mkString("|")
    }.toSeq.sorted
  }

  private def shipped(name: String) =
    cells(SparkEntry.queries(name)(spark, dir))

  test("ts_ema: shipped one-pass == declarative prefix window") {
    val bars = graft.ts.Ohlc.dailyBars(Tables.events(spark, dir))
      .select("event_type", "date", "close")
    val declarative = graft.ts.Ema.withEma(bars, 0.25, Seq("event_type"))
      .orderBy("event_type", "date")
    val got = shipped("ts_ema")
    assert(got.nonEmpty && got == cells(declarative))
  }

  test("ts_holt_linear: shipped one-pass == declarative prefix window") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("date")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val declarative = graft.ts.Ohlc.dailyBars(Tables.events(spark, dir))
      .select(col("event_type"), col("date"), col("close"))
      .withColumn("cl", collect_list(col("close")).over(w))
      .withColumn("st", expr(
        """aggregate(slice(cl, 2, size(cl) - 1),
             named_struct('l', CAST(element_at(cl, 1) AS DOUBLE),
                          'b', CAST(0.0 AS DOUBLE)),
             (a, x) -> named_struct(
               'l', 0.25D * x + 0.75D * (a.l + a.b),
               'b', 0.125D * ((0.25D * x + 0.75D * (a.l + a.b)) - a.l)
                    + 0.875D * a.b))"""))
      .select(col("event_type"), col("date"), col("close"),
        col("st.l").as("level"), col("st.b").as("trend"))
      .orderBy("event_type", "date")
    val got = shipped("ts_holt_linear")
    assert(got.nonEmpty && got == cells(declarative))
  }

  test("ts_kama: shipped one-pass == declarative prefix window") {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("event_type").orderBy("dt")
    val w10 = w.rowsBetween(-9, 0)
    val wl = w.rowsBetween(W.unboundedPreceding, 0)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(max_by(graft.olap.Exact.cents(col("value")), col("ts")).as("p"))
    val sc = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("v", abs(col("p") - lag("p", 1).over(w)))
      .withColumn("mom", abs(col("p") - lag("p", 10).over(w)))
      .withColumn("vol10", sum("v").over(w10))
      .filter(col("rn") >= 11)
      .withColumn("er_ppm", when(col("vol10") > 0,
        expr("(mom * 1000000) div vol10")).otherwise(0L))
      .withColumn("scr", expr("(er_ppm * 602150) div 1000000 + 64516"))
      .withColumn("sc2", expr("(scr * scr) div 1000000"))
      .withColumn("packed", col("p") * 1048576L + col("sc2"))
    val declarative = sc
      .withColumn("pl", collect_list(col("packed")).over(wl))
      .withColumn("kama_c", expr(
        "aggregate(slice(pl, 2, greatest(size(pl) - 1, 0)), " +
        "element_at(pl, 1) div 1048576, " +
        "(a, x) -> a + ((x % 1048576) * ((x div 1048576) - a)) " +
        "div 1000000)"))
      .select(col("event_type"), col("dt"), col("p").as("close_c"),
        col("sc2").as("sc_ppm"), col("kama_c"))
      .orderBy("event_type", "dt")
    val got = shipped("ts_kama")
    assert(got.nonEmpty && got == cells(declarative))
  }

  test("ts_cusum: shipped one-pass == declarative prefix window") {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("event_type").orderBy("dt")
    val wl = w.rowsBetween(W.unboundedPreceding, 0)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(max_by(graft.olap.Exact.cents(col("value")), col("ts")).as("p"))
      .withColumn("rn", row_number().over(w))
    val base = daily.filter(col("rn") <= 10)
      .groupBy("event_type")
      .agg(expr("sum(p) div 10").as("b10"))
    val inc = daily.filter(col("rn") >= 11)
      .join(base, "event_type")
      .withColumn("k", expr("b10 div 50"))
      .withColumn("h", expr("b10 div 10"))
      .withColumn("dp", col("p") - col("b10") - col("k"))
      .withColumn("dm", col("b10") - col("p") - col("k"))
    val fold = "(a, x) -> ((a + x) + abs(a + x)) div 2"
    val declarative = inc
      .withColumn("lp", collect_list(col("dp")).over(wl))
      .withColumn("lm", collect_list(col("dm")).over(wl))
      .withColumn("s_plus", expr(s"aggregate(lp, 0L, $fold)"))
      .withColumn("s_minus", expr(s"aggregate(lm, 0L, $fold)"))
      .select(col("event_type"), col("dt"), col("p").as("close_c"),
        col("s_plus"), col("s_minus"),
        (col("s_plus") > col("h") || col("s_minus") > col("h"))
          .as("alarm"))
      .orderBy("event_type", "dt")
    val got = shipped("ts_cusum")
    assert(got.nonEmpty && got == cells(declarative))
  }

  test("ts_ewma_irregular: shipped one-pass == declarative prefix window") {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("event_type").orderBy("date")
    val pows = graft.olap.Exact.threeQuarterPows(30)
    val bars = graft.ts.Ohlc.dailyBars(
        Tables.events(spark, dir).filter(col("user_id") % 97 === 0))
      .select(col("event_type"), col("date"), col("close"))
    val withW = bars
      .withColumn("dt", datediff(col("date"),
        lag(col("date"), 1).over(w)))
      .withColumn("wgt", element_at(
        array(pows.map(p => lit(p.doubleValue)): _*),
        least(coalesce(col("dt"), lit(1)), lit(30)).cast("int")))
    val lst = collect_list(struct(col("close").as("c"),
      col("wgt").as("g"))).over(w.rowsBetween(W.unboundedPreceding, 0))
    val declarative = withW
      .withColumn("ewma", aggregate(
        slice(lst, lit(2), greatest(size(lst) - 1, lit(0))),
        element_at(lst, 1).getField("c"),
        (acc, e) => acc * e.getField("g")
          + e.getField("c") * (lit(1.0) - e.getField("g"))))
      .select(col("event_type"), col("date"), col("close"),
        coalesce(col("dt"), lit(1)).cast("long").as("gap_days"),
        col("ewma"))
      .orderBy("event_type", "date")
    val got = shipped("ts_ewma_irregular")
    assert(got.nonEmpty && got == cells(declarative))
  }

  test("ts_kalman_level: shipped fold == driver-side replay, bitwise") {
    val bars = graft.ts.Ohlc.dailyBars(Tables.events(spark, dir))
      .select("event_type", "date", "close")
      .orderBy("event_type", "date").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    // plain-Scala replay of the published recursion per key
    val expected = scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
    var key: String = null; var l = 0.0; var p = 0.0
    bars.foreach { case (k, x) =>
      if (k != key) { key = k; l = x; p = 1.0; expected += ((l, 0.0, p)) }
      else {
        val pp = p + 0.015625
        val kg = pp / (pp + 1.0)
        l = l + kg * (x - l); p = (1.0 - kg) * pp
        expected += ((l, kg, p))
      }
    }
    val got = SparkEntry.queries("ts_kalman_level")(spark, dir)
      .orderBy("event_type", "date").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == expected.length && got.length > 50)
    got.zip(expected).foreach { case (g, e) =>
      assert(java.lang.Double.doubleToRawLongBits(g._1) ==
             java.lang.Double.doubleToRawLongBits(e._1))
      assert(java.lang.Double.doubleToRawLongBits(g._2) ==
             java.lang.Double.doubleToRawLongBits(e._2))
      assert(java.lang.Double.doubleToRawLongBits(g._3) ==
             java.lang.Double.doubleToRawLongBits(e._3))
    }
    // the gain SHRINKS as the filter converges (the adaptive-α property
    // that distinguishes Kalman from fixed-α EMA)
    val gains = got.map(_._2).drop(1).take(20)
    assert(gains.head > gains.last && gains.last > 0.0)
  }

  test("ts_holt_winters_weekly: shipped fold == driver-side replay, " +
       "bitwise (array state)") {
    val bars = graft.ts.Ohlc.dailyBars(Tables.events(spark, dir))
      .select("event_type", "date", "close")
      .orderBy("event_type", "date").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val expected = scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
    var key: String = null; var l = 0.0; var b = 0.0
    var sv: Array[Double] = null; var rn = 0
    bars.foreach { case (k, x) =>
      if (k != key) {
        key = k; l = x; b = 0.0; sv = Array.fill(7)(0.0); rn = 1
        expected += ((l, b, 0.0))
      } else {
        val i = rn % 7
        val si = sv(i)
        val l2 = 0.25 * (x - si) + 0.75 * (l + b)
        val b2 = 0.125 * (l2 - l) + 0.875 * b
        val s2 = 0.25 * (x - l2) + 0.75 * si
        sv(i) = s2; l = l2; b = b2; rn += 1
        expected += ((l2, b2, s2))
      }
    }
    val got = SparkEntry.queries("ts_holt_winters_weekly")(spark, dir)
      .orderBy("event_type", "date").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == expected.length && got.length > 50)
    got.zip(expected).foreach { case (g, e) =>
      assert(java.lang.Double.doubleToRawLongBits(g._1) ==
             java.lang.Double.doubleToRawLongBits(e._1))
      assert(java.lang.Double.doubleToRawLongBits(g._2) ==
             java.lang.Double.doubleToRawLongBits(e._2))
      assert(java.lang.Double.doubleToRawLongBits(g._3) ==
             java.lang.Double.doubleToRawLongBits(e._3))
    }
    // seasonality actually accumulates: some late seasonal is nonzero
    assert(got.drop(20).exists(_._3 != 0.0))
  }

  test("PrefixFold resets state on key change and respects fold order") {
    import spark.implicits._
    // two keys interleaved in input order; the fold must see each key's
    // rows in (key, order) sequence regardless of input layout
    val df = Seq(("b", 2, 10L), ("a", 1, 1L), ("b", 1, 100L),
                 ("a", 2, 2L), ("a", 3, 3L))
      .toDF("k", "o", "x").repartition(7)
    val out = graft.ts.PrefixFold.keyedFold[Long](df, Seq("k"), Seq("o"),
        Seq(org.apache.spark.sql.types.StructField("run",
          org.apache.spark.sql.types.LongType)))(
      init = r => r.getLong(2),
      step = (a, r) => a + r.getLong(2),
      emit = (st, _) => Seq(st))
      .orderBy("k", "o")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 1, 1L), ("a", 2, 3L), ("a", 3, 6L),
                            ("b", 1, 100L), ("b", 2, 110L)))
  }
}
