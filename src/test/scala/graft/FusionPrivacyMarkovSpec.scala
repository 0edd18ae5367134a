package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 11: RRF hybrid fusion, k-anonymity census, Markov
  * removal-effect attribution — brute-force replays on sf0.001.
  */
class FusionPrivacyMarkovSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("rrf: fused ranking replays from the two exact rankings") {
    val out = SparkEntry.queries("sim_rrf_fusion")(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    for (qid <- vecs.map(_._1).filter(_ < 10)) {
      val eq = vecs.find(_._1 == qid).get._2
      val others = vecs.filter(_._1 != qid)
      def top20(score: Array[Float] => Double): Seq[(Long, Int)] =
        others.map { case (id, ex) => (id, score(ex)) }
          .sortBy { case (id, sc) => (-sc, id) }.take(20)
          .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }.toSeq
      val rc = top20(ex => dot(eq, ex) / (norm(eq) * norm(ex)))
      val rd = top20(ex => dot(eq, ex))
      val fused = (rc ++ rd).groupBy(_._1).map { case (id, rs) =>
        (id, rs.map { case (_, r) => 1048576L / (60 + r) }.sum,
          rs.size.toLong)
      }.toSeq.sortBy { case (id, q, _) => (-q, id) }.take(5)
      val got = out.filter(_.getAs[Long]("query_id") == qid)
        .sortBy(_.getAs[Int]("rank"))
      assert(got.length == 5, s"q$qid")
      fused.zip(got).foreach { case ((id, q20, nl), r) =>
        assert(r.getAs[Long]("vec_id") == id, s"q$qid")
        assert(r.getAs[Long]("rrf_q20") == q20, s"q$qid")
        assert(r.getAs[Long]("n_lists") == nl, s"q$qid")
        assert(r.getAs[Double]("rrf") == q20.toDouble / 1048576.0)
      }
      // a member of both lists outranks a single-list straggler: the
      // top fused hit is always in at least one top-5
      assert(got.head.getAs[Long]("n_lists") >= 1L)
    }
  }

  test("k-anonymity: group census replay and mass conservation") {
    val out = SparkEntry.queries("dq_k_anonymity")(spark, sfDir).collect()
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), dayofweek(to_date(col("ts"))).as("dow"),
        graft.olap.Exact.cents(col("value")).as("cc"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2) / 2000))
    val ks = rows.groupBy(identity).map(_._2.length.toLong).toSeq
    val total = ks.sum
    val byKb = ks.groupBy(k => 63 - java.lang.Long.numberOfLeadingZeros(k))
    assert(out.length == byKb.size)
    out.foreach { r =>
      val kb = r.getAs[Long]("log2_k")
      val grp = byKb(kb.toInt)
      assert(r.getAs[Long]("n_groups") == grp.size.toLong, s"kb$kb")
      assert(r.getAs[Long]("n_rows") == grp.sum, s"kb$kb")
      assert(r.getAs[Long]("n_rows_at_risk") ==
        grp.filter(_ < 5).sum, s"kb$kb")
      assert(r.getAs[Double]("row_share") ==
        grp.sum.toDouble / total.toDouble, s"kb$kb")
    }
    // census is a partition of the fact rows
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
  }

  test("markov attribution: exact transition + absorption replay") {
    val out = SparkEntry.queries("olap_attribution_markov")(spark, sfDir)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, rs) =>
      val path0 = rs
        .sortBy(r => (r._2.getTime / 1000, r._2.getNanos, r._3))
        .map(r => if (r._4 == "purchase") "conv" else r._4).toSeq
      val cut = path0.indexOf("conv")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      val hops = ("start" +: path) :+ (if (cut >= 0) "" else "null")
      hops.sliding(2).foreach {
        case Seq(a, b) if b.nonEmpty =>
          trans((a, b)) = trans.getOrElse((a, b), 0L) + 1L
        case _ => ()
      }
    }
    val tot = trans.groupBy(_._1._1).map { case (a, m) =>
      a -> m.values.sum
    }
    val states = tot.keys.toSeq.sorted
    def absorb(removed: Option[String]): Long = {
      var p = Map.empty[String, Long]
      for (_ <- 1 to 12) {
        p = states.map { a =>
          val num = trans.iterator.filter(_._1._1 == a).map {
            case ((_, b), c) =>
              val v =
                if (b == "conv") 1048576L
                else if (b == "null") 0L
                else if (removed.contains(b)) 0L
                else p.getOrElse(b, 0L)
              c * v
          }.sum
          a -> num / tot(a)
        }.toMap
      }
      p.getOrElse("start", 0L)
    }
    val pb = absorb(None)
    val channels = Seq("click", "error", "signup", "view")
    val diffs = channels.map(c => c -> (pb - absorb(Some(c))))
    val sd = diffs.map(_._2).sum
    diffs.foreach { case (c, d) =>
      val r = out(c)
      assert(r.getAs[Long]("p_base_q20") == pb, c)
      assert(r.getAs[Long]("p_removed_q20") == pb - d, c)
      assert(d >= 0L, s"$c removal must be nonnegative")
      assert(r.getAs[Long]("removal_ppm") ==
        (if (pb > 0) 1000000L * d / pb else 0L), c)
      assert(r.getAs[Long]("share_ppm") ==
        (if (sd > 0) 1000000L * d / sd else 0L), c)
    }
    // conversions exist in the fixture, so the base absorption is real
    assert(pb > 0L && pb <= 1048576L)
  }
}
