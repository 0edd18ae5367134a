package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedLog2.log2fp

/** Round-6 batch 4: Cohen's kappa, Markov stationary distribution,
  * Adamic-Adar link prediction, audio zero-crossing rate, embedding
  * hubness — bitwise brute-force replays on the sf0.001 base rows.
  */
class LinkHubAudioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("cohens kappa: contingency replay from raw label rules") {
    val out = SparkEntry.queries("agg_cohens_kappa")(spark, sfDir).collect()
    assert(out.length == 1)
    val docs = Tables.documents(spark, sfDir)
      .select(col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val labels = docs.map { case (nc, text) =>
      val la = if (nc < 220) 0 else if (nc < 380) 1 else 2
      val words = text.count(_ == ' ') + 1
      val lb = if (words < 40) 0 else if (words < 69) 1 else 2
      (la, lb)
    }
    val n = labels.length.toLong
    val agree = labels.count(t => t._1 == t._2).toLong
    val chance = (0 to 2).map { i =>
      labels.count(_._1 == i).toLong * labels.count(_._2 == i).toLong
    }.sum
    val r = out.head
    assert(r.getAs[Long]("n_total") == n)
    assert(r.getAs[Long]("n_agree") == agree)
    assert(r.getAs[Long]("chance") == chance)
    assert(r.getAs[Long]("kappa_num") == n * agree - chance)
    assert(r.getAs[Long]("kappa_den") == n * n - chance)
    // the two length labelings are correlated but not identical: kappa
    // must show strong-but-imperfect agreement, not a degenerate 0 or 1
    val kappa = r.getAs[Double]("kappa")
    assert(kappa > 0.5 && kappa < 1.0)
  }

  test("markov stationary: 3-step q16 power-iteration replay") {
    val out = SparkEntry.queries("mine_markov_stationary")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(t => (t._2, t._3)).map(_._4)
      s.zip(s.tail)
    }
    val counts = trans.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val rowN = counts.groupBy(_._1._1).map { case (k, m) =>
      k -> m.values.sum
    }
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    var pi: Map[String, Long] = states.map(_ -> 65536L).toMap
    for (_ <- 1 to 3) {
      pi = states.map { j =>
        j -> states.map { i =>
          counts.get((i, j)).fold(0L)(c => pi(i) * c / rowN(i))
        }.sum
      }.toMap
    }
    val total = pi.values.sum
    states.foreach { st =>
      val r = out(st)
      assert(r.getAs[Long]("pi_q16") == pi(st), st)
      assert(r.getAs[Double]("pi_share") ==
        pi(st).toDouble / total.toDouble, st)
    }
    // the chain mixes: every state retains q16 mass near uniform
    assert(pi.values.forall(v => v > 32768L && v < 131072L))
  }

  test("adamic-adar: brute-force capped wedge replay, exact q20 terms") {
    val out = SparkEntry.queries("graph_adamic_adar")(spark, sfDir).collect()
    assert(out.length == 20)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] =
      li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val ps = rows.map(_._2).distinct.sorted.toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSet
    val adj: Map[Long, Set[Long]] =
      edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val term = adj.collect {
      case (c, nbrs) if nbrs.size >= 2 && nbrs.size <= 64 =>
        c -> 1099511627776L / log2fp(nbrs.size.toLong)
    }
    val scores = term.toSeq.flatMap { case (c, t) =>
      val nbrs = adj(c).toSeq.sorted
      for (a <- nbrs; b <- nbrs if a < b) yield ((a, b), t)
    }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum, v.size) }
      .filterNot { case ((a, b), _, _) => edges.contains((a, b)) }
    val top = scores.toSeq
      .sortBy { case ((a, b), s, _) => (-s, a, b) }.take(20)
    out.zip(top).foreach { case (r, ((x, y), aa, cn)) =>
      assert(r.getAs[Long]("x") == x && r.getAs[Long]("y") == y)
      assert(r.getAs[Long]("aa_q20") == aa)
      assert(r.getAs[Long]("cn") == cn.toLong)
    }
  }

  test("audio zcr: byte replay + synthetic alternation is counted") {
    val out = SparkEntry.queries("mm_audio_zcr")(spark, sfDir)
      .collect().map(r => ((r.getAs[Long]("media_id"),
        r.getAs[Int]("window_idx")), r)).toMap
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var checked = 0
    docs.take(20).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nWin = if (bytes.length == 0) 0 else (bytes.length - 1) / 32 + 1
      (0 until nWin).foreach { i =>
        val start = i * 32
        val end = math.min(start + 64, bytes.length)
        val ns = (end - start).toLong
        val wsum = (start until end).map(j => (bytes(j) & 0xff).toLong).sum
        val cr = (start until end - 1).count { j =>
          val a = ns * (bytes(j) & 0xff) - wsum
          val b = ns * (bytes(j + 1) & 0xff) - wsum
          a * b < 0
        }.toLong
        val r = out((id, i))
        assert(r.getAs[Long]("n_samples") == ns)
        assert(r.getAs[Long]("crossings") == cr)
        checked += 1
      }
    }
    assert(checked > 20)
    // signal exists: word boundaries cross the window mean
    assert(out.values.exists(_.getAs[Long]("crossings") > 10L))
    // a perfectly alternating synthetic signal crosses at every step
    import spark.implicits._
    val alt = Seq((1L, Array.tabulate(64)(j => if (j % 2 == 0) 'a' else ' ')
      .mkString)).toDF("doc_id", "text")
    val z = graft.multimodal.Media.audioZcr(
      graft.multimodal.Media.asMedia(alt, "doc_id", "text"), 64, 32)
      .collect().head
    assert(z.crossings == 63L) // every one of the 63 adjacent pairs crosses
  }

  test("hubness: brute-force k-occurrence census from raw embeddings") {
    val out = SparkEntry.queries("emb_hubness")(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planes = graft.similarity.HyperplaneLsh.planes(4, 64)
    def bucket(e: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        val d = p.zip(e).map { case (a, b) => a.toDouble * b }.sum
        if (d > 0) 1L << i else 0L
      }.sum
    val byBucket = vecs.groupBy(v => bucket(v._2))
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val occ = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    byBucket.values.foreach { bv =>
      bv.foreach { case (va, ea) =>
        bv.filter(_._1 != va)
          .map { case (vb, eb) => (vb, cosine(ea, eb)) }
          .sortBy { case (vb, c) => (-c, vb) }.take(3)
          .foreach { case (vb, _) => occ(vb) += 1L }
      }
    }
    val hist = vecs.map(v => occ(v._1)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val got = out.map(r => r.getAs[Long]("n_k") ->
      r.getAs[Long]("n_vectors")).toMap
    assert(got == hist)
    // census covers every vector, and true hubs (n_k > k) exist
    assert(got.values.sum == vecs.length.toLong)
    assert(hist.keys.max > 3L)
  }
}
