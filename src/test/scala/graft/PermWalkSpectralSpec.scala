package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedLog2.log2fp

/** Round-6 batch 6: hash-split permutation test, held-out unigram
  * perplexity, PNG tile census, Goertzel spectral power, deterministic
  * random walks — bitwise brute-force replays on sf0.001 base rows.
  */
class PermWalkSpectralSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def spreadHash(s: String): Long = {
    val h0 = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)
    val h1 = (h0 * 1103515245L + 12345L) % 2147483647L
    val h2 = (h1 * h1) % 2147483647L
    (h2 * 69069L + 362437L) % 2147483647L
  }

  test("permutation test: 64-split sign replay, exact decimal statistic") {
    val out = SparkEntry.queries("agg_permutation_test")(spark, sfDir)
      .collect()
    assert(out.length == 1)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        graft.olap.Exact.cents(col("value")).as("cc")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = ev.length.toLong
    val s = ev.map(_._3).sum
    val sObs = ev.filter(_._2 == "purchase").map(_._3).sum
    val nObs = ev.count(_._2 == "purchase").toLong
    val dObs = (BigInt(n) * sObs - BigInt(nObs) * s).abs
    val h3s = ev.map(t => (spreadHash(t._1.toString), t._3))
    val nGe = (0 until 64).count { p =>
      var sp = 0L; var mp = 0L
      h3s.foreach { case (h3, cc) =>
        if ((((h3 * 1000003L + p * 7919L + 12345L) % 2147483647L) >> 7
          & 1L) == 1L) { sp += cc; mp += 1 }
      }
      (BigInt(n) * sp - BigInt(mp) * s).abs >= dObs
    }.toLong
    val r = out.head
    assert(r.getAs[Long]("n_events") == n)
    assert(r.getAs[Long]("n_treat") == nObs)
    assert(r.getAs[Long]("d_obs") == dObs.toLong)
    assert(r.getAs[Long]("n_perm_ge") == nGe)
    assert(r.getAs[Double]("p_value") == (nGe + 1).toDouble / 65.0)
    // the splits genuinely vary: not all 64 splits beat the observed
    // statistic AND the null statistic is not degenerate zero
    assert(dObs > 0 && nGe < 64)
  }

  test("held-out perplexity: add-one unigram lattice replay per source") {
    val out = SparkEntry.queries("text_heldout_perplexity")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val trainCounts = docs.filter(_._1 % 2 == 0)
      .flatMap(_._3.split(" ")).groupBy(identity)
      .map { case (w, v) => w -> v.length.toLong }
    val tTrain = trainCounts.values.sum
    val vTrain = trainCounts.size.toLong
    val lTot = log2fp(tTrain + vTrain)
    val evTok = docs.filter(_._1 % 2 == 1)
      .flatMap(d => d._3.split(" ").map(w => (d._2, w)))
    evTok.groupBy(_._1).foreach { case (src, toks) =>
      val bits = toks.map { case (_, w) =>
        lTot - log2fp(trainCounts.getOrElse(w, 0L) + 1L)
      }.sum
      val r = out(src)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong, src)
      assert(r.getAs[Long]("bits_q20") == bits, src)
      // a shared-vocabulary corpus scores far below the OOV ceiling
      assert(r.getAs[Double]("bits_per_token") <
        lTot.toDouble / 1048576.0, src)
    }
  }

  test("image tiles: real decode equals the synthesis formula per tile") {
    val out = SparkEntry.queries("mm_image_tiles")(spark, sfDir).collect()
    val dims = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every (media, tile) against the arithmetic formula
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (w, h) = ((1 + id % 8).toInt, (1 + dims(id) % 8).toInt)
      assert(r.getAs[Long]("width") == w.toLong)
      assert(r.getAs[Long]("height") == h.toLong)
      val (tw, th) = ((w + 1) / 2, (h + 1) / 2)
      val (tr, tc) = (r.getAs[Long]("tile_row").toInt,
        r.getAs[Long]("tile_col").toInt)
      val (x0, x1) = if (tc == 0) (0, tw - 1) else (tw, w - 1)
      val (y0, y1) = if (tr == 0) (0, th - 1) else (th, h - 1)
      val sum = (for (y <- y0 to y1; x <- x0 to x1)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(r.getAs[Long]("n_px") == (x1 - x0 + 1).toLong * (y1 - y0 + 1))
      assert(r.getAs[Long]("px_sum") == sum)
    }
    // tile counts: 4 per image unless width or height is 1
    val perImage = out.groupBy(_.getAs[Long]("media_id"))
    perImage.foreach { case (id, tiles) =>
      val (w, h) = (1 + id % 8, 1 + dims(id) % 8)
      val expect = (if (w == 1) 1 else 2) * (if (h == 1) 1 else 2)
      assert(tiles.length == expect, id)
    }
    // quadrant sums reassemble the full image sum (partition property)
    perImage.foreach { case (id, tiles) =>
      val (w, h) = ((1 + id % 8).toInt, (1 + dims(id) % 8).toInt)
      val full = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(tiles.map(_.getAs[Long]("px_sum")).sum == full, id)
    }
  }

  test("goertzel power: packed integer fold replay per series") {
    val out = SparkEntry.queries("ts_goertzel_power")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"),
        graft.olap.Exact.cents(col("value")).as("cc")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((et, d), rows) => (et, d, rows.map(_._3).sum) }
    def goertzel(ys: Seq[Long], cq: Long): Long = {
      var s1 = 0L; var s2 = 0L
      ys.foreach { y =>
        val nxt = y + cq * s1 / 65536 - s2
        s2 = s1; s1 = nxt
      }
      s1 * s1 + s2 * s2 - cq * s1 * s2 / 65536
    }
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.toSeq.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val mean = xs.sum / n
      val ys = xs.map(x => (x - mean) / 1024)
      val p7 = goertzel(ys, 81722L)
      val p10 = goertzel(ys, 106039L)
      val r = out(et)
      assert(r.getAs[Long]("n_days") == n, et)
      assert(r.getAs[Long]("power_p7") == p7, et)
      assert(r.getAs[Long]("power_p10") == p10, et)
      assert(r.getAs[Long]("weekly_dominant") ==
        (if (p7 > p10) 1L else 0L), et)
    }
    // a synthetic period-7 square wave resonates at p7, not p10
    val sq = (0 until 28).map(i => if (i % 7 == 0) 7000L else -1000L)
    assert(goertzel(sq, 81722L) > 10L * goertzel(sq, 106039L))
  }

  test("random walks: deterministic hash-steered replay, every step") {
    val out = SparkEntry.queries("graph_random_walk_visits")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("visits"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] =
      li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val ps = rows.map(_._2).distinct.sorted.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSet
    val adj: Map[Long, Seq[Long]] =
      edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    val seeds = adj.toSeq.map { case (c, ns) => (c, ns.size) }
      .sortBy { case (c, d) => (-d, c) }.take(64).map(_._1)
    val visits = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    seeds.foreach { seed =>
      var node = seed
      (1 to 6).foreach { t =>
        val mix = (seed * 1000003L + t * 7919L + 12345L + node * 31L) %
          2147483647L
        node = adj(node)((mix % adj(node).size).toInt)
        visits(node) += 1L
      }
    }
    val top = visits.toSeq.sortBy { case (nd, v) => (-v, nd) }.take(20)
    assert(out.toSeq == top)
    // walks genuinely move: some node is visited more than once
    assert(top.head._2 > 1L)
  }
}
