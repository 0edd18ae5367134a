package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-3 operators: EMA fold, SCD2 history,
  * bloom-filter pruning, mergeable KMV sketches, audio windowing.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("EMA fold equals the explicit per-series recursion") {
    import spark.implicits._
    val bars = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 12.0),
      ("a", "2024-01-03", 8.0), ("a", "2024-01-04", 11.0),
      ("b", "2024-01-01", 100.0), ("b", "2024-01-02", 90.0))
      .toDF("event_type", "date", "close")
    val got = graft.ts.Ema.withEma(bars, 0.25, Seq("event_type"))
      .orderBy("event_type", "date")
      .select("event_type", "ema").as[(String, Double)].collect()
    def rec(xs: Seq[Double]): Seq[Double] =
      xs.tail.scanLeft(xs.head)((acc, x) => acc * 0.75 + x * 0.25)
    val want = rec(Seq(10.0, 12.0, 8.0, 11.0)).map(("a", _)) ++
      rec(Seq(100.0, 90.0)).map(("b", _))
    assert(got.toSeq == want, "bitwise: same fold order, same doubles")
  }

  test("SCD2 history partitions each key's timeline") {
    import spark.implicits._
    val h = graft.inc.Scd2.history(
      Tables.events(spark, sf)
        .filter(col("event_type") === "purchase" && col("user_id") < 50)
        .select("user_id", "event_id", "ts", "value"),
      Seq("user_id"), "ts", "event_id")
    // exactly one open (current) version per key
    val open = h.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1).count()
    assert(open == 0)
    // versions are 1..n contiguous and intervals chain: valid_to of v ==
    // valid_from of v+1
    val chain = h.as("a").join(h.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
      .filter(col("a.valid_to") =!= col("b.valid_from")).count()
    assert(chain == 0)
    val counts = h.groupBy("user_id").agg(count(lit(1)).as("n"),
      max(col("version")).as("vmax"))
      .filter(col("n") =!= col("vmax")).count()
    assert(counts == 0)
  }

  test("bloom filter admits every true key (no false negatives)") {
    import graft.olap.BloomJoin
    val build = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val probe = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k")).distinct()
    val pos = BloomJoin.buildPositions(build, "o_orderkey", 65536, 3)
    val cands = BloomJoin.candidateKeys(probe, "k", pos, 65536, 3)
    val trueKeys = probe.join(build, col("k") === col("o_orderkey"),
      "leftsemi")
    // the bloom guarantee: candidates ⊇ true matches
    assert(trueKeys.exceptAll(cands).count() == 0)
    // and it actually prunes something on this data
    assert(cands.count() < probe.count())
  }

  test("KMV union-of-sketches equals the sketch of the union (mergeable)") {
    import graft.olap.Sketch
    val li = Tables.lineitem(spark, sf)
    val merged = Sketch.kmvGroupsWithUnion(li, col("l_returnflag"),
        col("l_partkey"), k = 128)
      .filter(col("scope") === "__union")
      .select("k_actual", "kth_hash", "est_distinct")
      .collect().head
    val direct = Sketch.kmvDistinct(li, col("l_partkey"), k = 128)
      .collect().head
    // exact equality: merging per-group k-mins loses nothing — the global
    // k smallest hashes all live in some group's k smallest
    assert(merged.getLong(0) == direct.getLong(0))
    assert(merged.getLong(1) == direct.getLong(1))
    assert(merged.getDouble(2) == direct.getDouble(2))
  }

  test("count-min never underestimates and merges by addition") {
    import graft.olap.Sketch
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.tokens("text")).as("token"))
    val w = 256 // narrow on purpose: forces collisions, so est > exact too
    val cms = Sketch.cmsBuild(toks, col("token"), w)
    val est = Sketch.cmsEstimate(toks, col("token"), cms, w)
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val both = exact.join(est, col("token") === col("item")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("exact_n"),
        s"underestimate for ${r.getAs[String]("token")}")
    }
    // mergeability: shard sketches sum into the corpus sketch exactly
    val docs = Tables.documents(spark, sf)
    def shard(p: org.apache.spark.sql.Column) = Sketch.cmsBuild(
      docs.filter(p).select(
        explode(graft.text.TextAnalysis.tokens("text")).as("token")),
      col("token"), w)
    val summed = shard(col("doc_id") % 2 === 0)
      .unionByName(shard(col("doc_id") % 2 === 1))
      .groupBy("r", "bucket").agg(sum("counter").as("counter"))
    assert(summed.orderBy("r", "bucket").collect().toSeq ==
      cms.orderBy("r", "bucket").collect().toSeq)
  }

  test("histogram quantiles bracket the exact percentile within one bin") {
    val rows = SparkEntry.queries("sketch_histogram_quantiles")(spark, sf)
      .collect()
    assert(rows.length == 15) // 5 series x 3 percentiles
    rows.foreach { r =>
      val est = r.getAs[Double]("est_value")
      val exact = r.getAs[Double]("exact_value")
      // the estimate is the midpoint of the bin containing the exact
      // percentile -> error is bounded by half the $10 bin width
      assert(math.abs(est - exact) <= 5.0,
        s"${r.getAs[String]("event_type")} p${r.getAs[Long]("p")}")
    }
  }

  test("audio windows cover the payload with the declared overlap") {
    import spark.implicits._
    import graft.multimodal.Media
    val text = ('a' to 'z').mkString * 4 // 104 ASCII bytes
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Media.audioWindows(Media.asMedia(docs, "doc_id", "text"),
        windowSize = 64, hop = 32)
      .orderBy("window_idx").collect()
    val bytes = text.getBytes("UTF-8")
    val expected = (0 until 4).map { i =>
      val start = i * 32
      val end = math.min(start + 64, bytes.length)
      val e = (start until end).map { j =>
        val s = (bytes(j) & 0xff) - 128; s.toLong * s
      }.sum
      (i, (end - start).toLong, e)
    }
    assert(got.length == 4) // ceil((104-1)/32)+1 windows while start < n
    got.zip(expected).foreach { case (row, (i, ns, e)) =>
      assert(row.window_idx == i)
      assert(row.n_samples == ns)
      assert(row.energy == e)
    }
  }

  test("latest-wins upsert is idempotent and equals the window form") {
    import org.apache.spark.sql.expressions.Window
    val changes = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val once = graft.inc.Watermark.latestByKey(changes,
      Seq("user_id"), "ts", "event_id", Seq("value"))
    // compacting a compaction changes nothing (CDC replay safety)
    val twice = graft.inc.Watermark.latestByKey(once,
      Seq("user_id"), "ts", "event_id", Seq("value"))
    assert(once.exceptAll(twice).count() == 0 &&
           twice.exceptAll(once).count() == 0)
    // and the partial-aggregable max_by picks the same rows as the
    // window row_number formulation
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(once.exceptAll(viaWindow).count() == 0 &&
           viaWindow.exceptAll(once).count() == 0)
  }

  test("KMV Jaccard is exact when the sets fit inside the sketch") {
    import spark.implicits._
    // |A|=60, |B|=60, |A∩B|=30, |A∪B|=90 — all under k=128, so the
    // sketches ARE the sets and the estimate must equal 30/90 exactly
    val a = (1 to 60).toDF("k")
    val b = (31 to 90).toDF("k")
    val r = graft.olap.Sketch.kmvJaccard(a, col("k"), b, col("k"), k = 128)
      .collect().head
    assert(r.getAs[Double]("jaccard_est") == 30.0 / 90.0)
  }

  test("quality gate counts violations on dirty data") {
    import spark.implicits._
    import graft.olap.Quality
    val dirty = Seq(
      (Some(1L), 5.0, 0.1),  // clean
      (None, 5.0, 0.1),      // null key
      (Some(2L), -1.0, 0.1), // nonpositive qty
      (Some(3L), 5.0, 1.5),  // discount out of range
      (Some(3L), 5.0, 1.5))  // duplicate of the row above
      .toDF("k", "qty", "disc")
    val rows = Quality.violationCounts(dirty, Seq(
        "null_key" -> col("k").isNull,
        "bad_qty" -> (col("qty") <= 0),
        "bad_disc" -> (col("disc") < 0 || col("disc") > 1)))
      .unionByName(Quality.duplicateCount(dirty, Seq("k", "qty", "disc"),
        "dups"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("null_key" -> 1L, "bad_qty" -> 1L,
      "bad_disc" -> 2L, "dups" -> 1L))
    val parent = Seq(1L, 2L).toDF("pk")
    val orphans = Quality.orphanCount(
      dirty.filter(col("k").isNotNull).select(col("k")), "k",
      parent, "pk", "orphans").collect().head
    assert(orphans.getLong(1) == 2) // the two k=3 rows
  }

  test("z-order key interleaves bits exactly") {
    import spark.implicits._
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.olap.ZOrder.zkey(col("a"), col("b"), 3).as("z"))
      .first().getLong(0)
    // a=101b -> positions 0,4 (1+16); b=011b -> positions 1,3 (2+8)
    assert(got == 27L)
    // round-trip property on a grid: the key is a bijection, so distinct
    // inputs give distinct keys
    val grid = (for (a <- 0L to 15L; b <- 0L to 15L) yield (a, b))
      .toDF("a", "b")
      .select(graft.olap.ZOrder.zkey(col("a"), col("b"), 4).as("z"))
    assert(grid.distinct().count() == 256)
  }

  test("snapshot diff classifies all four key fates") {
    import spark.implicits._
    val older = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val newer = Seq((2L, 20L), (3L, 99L), (4L, 40L)).toDF("k", "v")
    val r = graft.inc.SnapshotDiff.classify(older, newer, "k", "v")
      .collect().head
    assert(r.getAs[Long]("n_added") == 1)     // key 4
    assert(r.getAs[Long]("n_removed") == 1)   // key 1
    assert(r.getAs[Long]("n_changed") == 1)   // key 3
    assert(r.getAs[Long]("n_unchanged") == 1) // key 2
  }

  test("basket cap: loose bound is the identity, tight bound drops" +
      " whole wide baskets and nothing else") {
    import spark.implicits._
    val G = graft.olap.GraphFrames
    // synthetic item sets: basket 1 width 2, basket 2 width 3,
    // basket 3 width 5 (the mega-basket)
    val items = (Seq((1L, 10L), (1L, 11L)) ++
      Seq((2L, 10L), (2L, 12L), (2L, 13L)) ++
      (1L to 5L).map(p => (3L, 100L + p)))
      .toDF("ok", "pk")
    // loose cap: identity (row-set equality both directions)
    assert(G.capBaskets(items, "ok", 5).exceptAll(items).count() == 0)
    assert(items.exceptAll(G.capBaskets(items, "ok", 5)).count() == 0)
    // tight cap: basket 3 vanishes WHOLE; baskets 1-2 untouched
    val capped = G.capBaskets(items, "ok", 4)
    assert(capped.filter(col("ok") === 3L).count() == 0)
    assert(capped.count() == 5)
    // the default production bound never binds on the fixture corpus —
    // the capped weighted build ≡ the uncapped self-join, bitwise
    val li = G.orderPartItems(spark, sf)
    val uncapped = li.as("a")
      .join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("w"))
    val viaGuard = G.coPurchaseWeighted(spark, sf)
    assert(viaGuard.exceptAll(uncapped).count() == 0)
    assert(uncapped.exceptAll(viaGuard).count() == 0)
  }

  test("fixture basket widths stay under the default co-purchase cap") {
    // ADVICE r9: ~10 oracled co-purchase queries share the default-256
    // capped coPurchaseWeighted build, and none of their DuckDB oracles
    // mirror the cap — correctness rests on the invariant that no
    // fixture basket is wider than the cap. Pin it against EVERY fixture
    // dir, so a future wider fixture fails HERE with the invariant named
    // instead of flipping the whole family red at the oracle gate.
    val G = graft.olap.GraphFrames
    val cap = G.maxBasket(spark)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val maxW = G.orderPartItems(spark, dir)
        .groupBy("ok").agg(count(lit(1)).as("w"))
        .agg(max(col("w"))).collect().head.getLong(0)
      assert(maxW <= cap,
        s"fixture $dir max basket width $maxW exceeds the default cap " +
          s"$cap: the co-purchase oracles do not mirror the cap, so the " +
          "whole family would diverge — raise the cap or regenerate")
    }
  }

  test("basket-width census predicts the pair join's exact output mass") {
    // the census exists to forecast the join without running it — pin
    // that the forecast is EXACT: Σ pair_mass over the histogram equals
    // the total pair multiplicity the per-order self-join produces
    val G = graft.olap.GraphFrames
    val li = G.orderPartItems(spark, sf)
    val predicted = li.groupBy("ok").agg(count(lit(1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_orders"))
      .select(expr("sum(((w * (w - 1)) div 2) * n_orders)").as("m"))
      .collect().head.getLong(0)
    val actual = li.as("a")
      .join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .count()
    assert(predicted == actual)
  }

  test("stream-static enrich matches the batch join") {
    val streamed = graft.streaming.EventStream.runStaticEnrich(spark, sf)
      .orderBy("c_mktsegment", "event_type")
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("c_mktsegment", "event_type")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
