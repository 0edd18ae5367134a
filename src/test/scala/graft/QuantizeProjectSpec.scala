package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions: SQ8 scalar quantization, JL random projection,
  * watermark-TTL'd streaming dedup, pinball-loss forecast scoring — each
  * pinned against an independent formulation (the quantizer's error
  * contract, the JL concentration bound, exact distinct counts, the
  * τ-quantile's loss-minimizer identity), not just the DuckDB oracle.
  */
class QuantizeProjectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("sq8: reconstruction error bounded by one code step per dimension") {
    // decode(encode(q)) must sit within ⌈(hi−lo)/255⌉ of q on every
    // dimension — the defining contract of 8-bit scalar quantization.
    // Recompute bounds + codes independently on the driver.
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
    val qs = rows.map(r => r.getSeq[Float](1).toArray
      .map(x => math.floor(x.toDouble * 65536).toLong))
    val d = qs.head.length
    val lo = Array.tabulate(d)(i => qs.map(_(i)).min)
    val hi = Array.tabulate(d)(i => qs.map(_(i)).max)
    for (q <- qs; i <- 0 until d) {
      val span = hi(i) - lo(i)
      val dq = if (span == 0L) lo(i)
        else lo(i) + (((q(i) - lo(i)) * 255) / span) * span / 255
      val step = if (span == 0L) 0L else span / 255 + 1
      assert(math.abs(q(i) - dq) <= step,
        s"dim $i: |${q(i)} - $dq| > $step (span $span)")
    }
    // and the shipped query's top-1 self-consistency: dist2 is
    // monotone nondecreasing in rank within each query
    val topk = SparkEntry.queries("sim_sq8_adc_topk")(spark, sfDir)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
    topk.values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("dist2"))
      assert(byRank.length == 5 && byRank.sameElements(byRank.sorted))
    }
  }

  test("jl projection: ±1 concentration — every ratio positive, mean near 1") {
    val rows = SparkEntry.queries("emb_random_projection")(spark, sfDir)
      .collect()
    assert(rows.length == 32 * 31 / 2)
    val ratios = rows.map(_.getAs[Double]("jl_ratio"))
    rows.foreach { r =>
      assert(r.getAs[Long]("d2_orig") > 0L && r.getAs[Long]("d2_proj") >= 0L)
    }
    // E[d2_proj] = k·d2_orig for a ±1 projection; k=16 concentrates the
    // per-pair ratio — the mean over 496 pairs is far tighter
    val mean = ratios.sum / ratios.length
    assert(mean > 0.75 && mean < 1.3, s"mean JL ratio $mean")
    // per-pair tails are wide at k=16 (measured 0.09–4.9 on the
    // fixture); the envelope only guards against a broken projection
    // (ratio ~0 or ~k), not against honest JL variance
    assert(ratios.forall(r => r > 0.01 && r < 10.0))
  }

  test("stream ttl dedup: emitted stream holds exactly one row per event_id") {
    val emitted = graft.streaming.EventStream.runDedupTtl(spark, sfDir)
    val got = emitted.agg(sum("n_unique")).collect()(0).getLong(0)
    val want = Tables.events(spark, sfDir)
      .select("event_id").distinct().count()
    assert(got == want, s"emitted $got rows, distinct ids $want")
  }

  test("streaming session_window: emitted set == batch sessions below watermark") {
    val streamed = SparkEntry.queries("stream_session_window")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))))
      .toMap
    // the batch twin + the finalization filter (gap-extended end at or
    // below max event time − 1 h, Spark's ms watermark grain)
    val batch = SparkEntry.queries("sessionize_builtin_window")(spark, sfDir)
      .collect()
    val maxTs = Tables.events(spark, sfDir)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val finalized = batch.filter(r =>
      r.getAs[java.sql.Timestamp]("session_end").getTime + 1800000L <=
        maxTs - 3600000L)
    assert(streamed.size == finalized.length,
      s"streamed ${streamed.size} vs batch-finalized ${finalized.length}")
    finalized.foreach { r =>
      val k = (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start").getTime)
      val (n, sv) = streamed(k)
      assert(n == r.getAs[Long]("n_events")
        && sv == r.getAs[Double]("sum_value"))
    }
  }

  test("ndcg: bounded by 1, exact self-ranking scores 1") {
    val rows = SparkEntry.queries("sim_ndcg_eval")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (nd, ov) = (r.getAs[Double]("ndcg"), r.getAs[Long]("n_overlap"))
      assert(nd >= 0.0 && nd <= 1.0 && ov >= 0L && ov <= 10L)
      // full-overlap in-order retrieval is the only way to score 1
      if (nd == 1.0) assert(ov == 10L)
    }
    // the weights are strictly decreasing on the q20 lattice and IDCG is
    // their graded sum — the literal contract both engines inline
    val w = graft.queries.Shared.ndcgWeightsQ20
    assert(w.length == 10 && w.head == 1048576L
      && w.sliding(2).forall(p => p(0) > p(1)))
    assert(graft.queries.Shared.ndcgIdcgQ20 ==
      (1 to 10).map(i => (11L - i) * w(i - 1)).sum)
  }

  test("q17 small-qty revenue: exact threshold replay") {
    val r = SparkEntry.queries("join_small_qty_revenue")(spark, sfDir)
      .collect()(0)
    // brute-force replay: per selected part, 5·n·q < Σq on cents
    val sel = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#4" && col("p_size") <= 15)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), graft.olap.Exact.cents(col("l_quantity")),
        graft.olap.Exact.cents(col("l_extendedprice")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byPart = li.groupBy(_._1)
    val picked = for {
      (pk, rows) <- byPart.toSeq if sel(pk)
      sumQ = rows.map(_._2).sum; n = rows.length
      (_, qc, pc) <- rows if qc * n * 5 < sumQ
    } yield pc
    assert(r.getAs[Long]("n_lineitems") == picked.length)
    assert(r.getAs[Double]("sum_extendedprice") ==
      picked.sum.toDouble / 100.0)
    assert(r.getAs[Double]("avg_yearly") ==
      picked.sum.toDouble / 100.0 / 7.0)
  }

  test("dtw: identity, symmetry, full-DP equality, hand example") {
    import graft.ts.Dtw
    val rnd = new scala.util.Random(7)
    val a = Array.fill(40)(rnd.nextInt(2000).toLong)
    val b = Array.fill(33)(rnd.nextInt(2000).toLong)
    assert(Dtw.banded(a, a, 8) == 0L)
    assert(Dtw.banded(a, b, 8) == Dtw.banded(b, a, 8))
    // a band covering the whole matrix must equal the classic full DP
    def full(x: Array[Long], y: Array[Long]): Long = {
      val inf = Long.MaxValue / 4
      val d = Array.fill(x.length + 1, y.length + 1)(inf)
      d(0)(0) = 0L
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.abs(x(i - 1) - y(j - 1)) +
          math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      d(x.length)(y.length)
    }
    assert(Dtw.banded(a, b, 100) == full(a, b))
    // phase shift: DTW forgives what pointwise distance cannot
    val s1 = Array[Long](0, 0, 10, 0, 0)
    val s2 = Array[Long](0, 0, 0, 10, 0)
    assert(Dtw.banded(s1, s2, 8) == 0L)
    // and the shipped query agrees with a driver-side replay
    val rows = SparkEntry.queries("ts_dtw_band")(spark, sfDir).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    val ser = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("date"))
      .agg(max_by(col("value"), col("ts")).as("close"))
      .select(col("event_type"), col("date"),
        graft.olap.Exact.cents(col("close")).as("cc"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).take(64).toArray).toMap
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(r.getAs[Long]("dtw_cents") ==
        Dtw.banded(ser(ta), ser(tb), 8))
    }
  }

  test("audio downsample: lossless codec round-trip, FIR invariants") {
    import graft.multimodal.Media.WavCodec
    // PCM8 WAV is lossless: the real encode→decode chain is the identity
    val raw = Array.tabulate(97)(i => ((i * 37 + 5) % 256).toByte)
    val (rate, back) = WavCodec.decodeSamples(WavCodec.encodePcm8(8000, raw))
    assert(rate == 8000 && back.sameElements(raw.map(_ & 0xff)))
    // a constant signal is a fixed point of the [1,2,1]/4 FIR
    val const = Array.fill(64)(200.toByte)
    val (_, c) = WavCodec.decodeSamples(WavCodec.encodePcm8(8000, const))
    assert(c.forall(_ == 200))
    val rows = SparkEntry.queries("mm_audio_downsample")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") == r.getAs[Long]("n_in") / 2)
      assert(r.getAs[Int]("out_rate") == 4000)
      // the low-pass cannot raise per-sample energy above the input's
      // peak-possible: bounded by 127² per sample
      assert(r.getAs[Long]("energy_out") <=
        r.getAs[Long]("n_out") * 128L * 128L)
    }
  }

  test("variant round-trip: typed extraction equals the source columns row-for-row") {
    // per-row (not just aggregate) losslessness of build→shred→extract,
    // including the double path through JSON text
    val got = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        to_json(struct(
          col("event_id").as("id"),
          struct(col("event_type").as("t"), col("value").as("v")).as("m")))
          .as("js"))
      .select(col("event_id"), col("event_type"), col("value"),
        parse_json(col("js")).as("vr"))
      .select(col("event_id"), col("event_type"), col("value"),
        expr("variant_get(vr, '$.id', 'long')").as("id2"),
        expr("variant_get(vr, '$.m.t', 'string')").as("t2"),
        expr("variant_get(vr, '$.m.v', 'double')").as("v2"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("event_id") == r.getAs[Long]("id2"))
      assert(r.getAs[String]("event_type") == r.getAs[String]("t2"))
      // bitwise double equality — JSON numeric text must round-trip
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("value")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("v2")))
    }
  }

  test("pinball loss: the τ-quantile minimizes its own loss") {
    val res = SparkEntry.queries("agg_pinball_loss")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("q90"), r.getAs[Double]("pinball_90"),
          r.getAs[Double]("q50"), r.getAs[Double]("pinball_50")))).toMap
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def loss(vs: Array[Long], qc: Long, tau10: Long): Double =
      vs.map(v => if (v >= qc) (v - qc) * tau10
                  else (qc - v) * (10 - tau10)).sum.toDouble /
        (vs.length * 1000.0)
    for ((t, (q90, p90, q50, p50)) <- res) {
      val vs = byType(t)
      val q90c = math.round(q90 * 100)
      val q50c = math.round(q50 * 100)
      // shipped loss == independent replay at the quantile...
      assert(math.abs(loss(vs, q90c, 9L) - p90) < 1e-9)
      assert(math.abs(loss(vs, q50c, 5L) - p50) < 1e-9)
      // ...and the quantile is the minimizer: nudging the predictor a
      // cent in either direction can only raise the loss
      assert(loss(vs, q90c + 1, 9L) >= p90 - 1e-9)
      assert(loss(vs, q90c - 1, 9L) >= p90 - 1e-9)
      assert(loss(vs, q50c + 1, 5L) >= p50 - 1e-9)
      assert(loss(vs, q50c - 1, 5L) >= p50 - 1e-9)
    }
  }
}
