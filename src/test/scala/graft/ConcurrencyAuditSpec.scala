package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 2: peak concurrency, hapax ratio, timestamp
  * monotonicity, inter-visit gaps, simhash bit balance — local replays
  * plus the monotonicity counter's does-it-count proof.
  */
class ConcurrencyAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("peak concurrency: distinct-per-hour replay") {
    val out = SparkEntry.queries("olap_peak_concurrency")(spark, sfDir)
      .withColumn("ds", date_format(col("dt"), "yyyy-MM-dd"))
      .collect().map(r => r.getAs[String]("ds") ->
        ((r.getAs[Long]("n_active_hours"), r.getAs[Long]("peak_hourly_users"),
          r.getAs[Long]("user_hours")))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("h"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (d, es) =>
      val perHour = es.groupBy(_._2).map { case (_, g) =>
        g.map(_._3).distinct.size.toLong }
      val (qh, qp, qu) = out(d)
      assert(qh == perHour.size.toLong, d)
      assert(qp == perHour.max, d)
      assert(qu == perHour.sum, d)
    }
  }

  test("hapax ratio: token census replay, exact ppm") {
    val out = SparkEntry.queries("text_hapax_ratio")(spark, sfDir)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"),
          r.getAs[Long]("hapax_ppm")))).toMap
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(graft.text.TextAnalysis.tokens("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    toks.groupBy(_._1).foreach { case (lang, ts) =>
      val tf = ts.groupBy(_._2).map(_._2.size)
      val hapax = tf.count(_ == 1).toLong
      val (qt, qh, qp) = out(lang)
      assert(qt == tf.size.toLong && qh == hapax, lang)
      assert(qp == 1000000L * hapax / tf.size, lang)
    }
  }

  test("ts monotonicity: clean fixture certified AND the counter counts") {
    val out = SparkEntry.queries("dq_ts_monotonicity")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_regressions") == 0L
        && r.getAs[Long]("regression_ppm") == 0L,
        r.getAs[String]("event_type"))
    }
    // the zero above is only a certification if the counter can count:
    // replay the same lag-compare on a frame with KNOWN inversions
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("et").orderBy("id")
    val synth = Seq(("x", 1L, 100L), ("x", 2L, 90L), ("x", 3L, 95L),
        ("x", 4L, 200L))
      .toDF("et", "id", "tsv")
      .withColumn("p", lag(col("tsv"), 1).over(w))
      .filter(col("p").isNotNull)
      .agg(sum(when(col("tsv") < col("p"), 1L).otherwise(0L)).as("nr"))
      .collect()(0).getLong(0)
    assert(synth == 1L) // 100 -> 90 is the one regression
  }

  test("inter-visit gap: brute gap replay, exact rank picks") {
    val out = SparkEntry.queries("olap_intervisit_gap")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("median_gap_min"),
          r.getAs[Long]("p90_gap_min")))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    ev.groupBy(_._1).foreach { case (et, es) =>
      val gaps = es.groupBy(_._2).values.flatMap { us =>
        val s = us.sortBy(e => (e._3, e._4)).map(_._3)
        s.zip(s.drop(1)).map { case (a, b) => (b - a) / 60000000L }
      }.toSeq.sorted
      val n = gaps.length
      val (qn, qm, qp) = out(et)
      assert(qn == n.toLong, et)
      // first rank r with 2r >= n+1 is ceil((n+1)/2) = (n+2)/2 in ints
      assert(qm == gaps((n + 2) / 2 - 1), et)
      assert(qp == gaps(((9 * n + 9) / 10) - 1), et)
      assert(qm <= qp, et)
    }
  }

  test("simhash bit balance: bit-count replay; corpus is not all-biased") {
    val out = SparkEntry.queries("dedup_simhash_bit_balance")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("bit") ->
        ((r.getAs[Long]("n_set"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("imbalance"), r.getAs[Long]("biased_flag")))).toMap
    assert(out.keySet == (0L to 31L).toSet)
    val hashes = Tables.documents(spark, sfDir)
      .select(graft.dedup.SimHash.simhash32(col("text")).as("h"))
      .collect().map(_.getLong(0))
    for (b <- 0 until 32) {
      val set = hashes.count(h => ((h >> b) & 1L) == 1L).toLong
      val (qs, qn, qi, qf) = out(b.toLong)
      assert(qn == hashes.length.toLong && qs == set, b)
      assert(qi == 2 * set - hashes.length, b)
      assert(qf == (if (BigInt(qi) * qi * 100 > BigInt(qn) * 961) 1L
                    else 0L), b)
    }
    // the word-salad fixture's 31-type vocabulary legitimately biases
    // most bits (few token hashes drive each bit) — the pin is that the
    // flag DISCRIMINATES: at least one bit each side of the threshold
    assert(out.values.exists(_._4 == 1L))
    assert(out.values.exists(_._4 == 0L))
  }
}
