package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: the IVF+PQ composite index, asymmetric containment,
  * ingest-time incremental dedup, survivorship policy, and the domain
  * mixture allocator — each pinned against an independent driver-side
  * recompute (or the operator's defining algebraic property), not just
  * the DuckDB oracle.
  */
class CompositeMixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // plain-double ascending-fold dot/cosine — an INDEPENDENT formulation
  // of the arithmetic VecOps implements as a codegen expression
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cosine(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("ivf+pq composite matches a from-scratch driver recompute") {
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val centroids = rows.filter(_._1 < 8)
    val codewords = rows.filter(_._1 < 16)
    val queryIds = rows.keys.filter(_ < 10).toSeq.sorted
    val (nprobe, m, dsub, k) = (2, 4, 16, 5)
    // coarse assignment: nearest centroid by cosine, ties to lower id
    val assign = rows.map { case (id, v) =>
      id -> centroids.toSeq
        .map { case (cid, c) => (cid, cosine(v, c)) }
        .minBy { case (cid, cos) => (-cos, cid) }._1
    }
    // per-subspace PQ codes: inner-product-nearest codeword, ties low
    def sub(v: Array[Float], s: Int) = v.slice(s * dsub, (s + 1) * dsub)
    val codes = rows.map { case (id, v) =>
      id -> (0 until m).map { s =>
        codewords.toSeq
          .map { case (cid, c) => (cid, dot(sub(v, s), sub(c, s))) }
          .minBy { case (cid, d) => (-d, cid) }._1
      }
    }
    val expected = queryIds.flatMap { q =>
      val probed = centroids.toSeq
        .map { case (cid, c) => (cid, cosine(rows(q), c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(nprobe).map(_._1).toSet
      val cand = rows.keys.filter(v => v != q && probed(assign(v)))
      val scored = cand.toSeq.map { v =>
        val est = (0 until m).map(s =>
          dot(sub(rows(q), s), sub(codewords(codes(v)(s)), s))).sum
        (v, est)
      }.sortBy { case (v, est) => (-est, v) }.take(k)
      scored.zipWithIndex.map { case ((v, est), i) => (q, i + 1, v, est) }
    }
    val got = SparkEntry.queries("sim_ivf_pq_topk")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("est_sim")))
      .sortBy(t => (t._1, t._2))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"composite row $g != recomputed $e")
      assert(math.abs(g._4 - e._4) <= 1e-6 * math.max(1.0, math.abs(e._4)),
        s"est_sim ${g._4} != ${e._4} for $g")
    }
  }

  test("containment: subset text scores 1.0 toward its superset, asymmetric back") {
    import spark.implicits._
    import graft.dedup.NgramJaccard
    val short = "alpha beta gamma delta epsilon zeta"
    val long = s"prologue before the body $short and an epilogue after it"
    val other = "entirely disjoint vocabulary nothing shared here at all"
    val docs = Seq((1L, short), (2L, long), (3L, other))
      .toDF("doc_id", "text")
      .select(col("doc_id"), NgramJaccard.gram_hashes(col("text"), 2).as("g"))
    val g = docs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val pairs = docs.select(col("doc_id").as("a"), col("g").as("ga"))
      .join(docs.select(col("doc_id").as("b"), col("g").as("gb")),
        col("a") =!= col("b"))
      .withColumn("inter",
        NgramJaccard.intersect_count_sorted(col("ga"), col("gb")))
      .withColumn("containment",
        col("inter").cast("double") / size(col("ga")).cast("double"))
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Double]("containment")).toMap
    // every bigram of `short` occurs in `long` => containment(1->2) = 1.0
    assert(pairs((1L, 2L)) == 1.0)
    // but long has grams of its own: strictly asymmetric
    assert(pairs((2L, 1L)) < 1.0 && pairs((2L, 1L)) > 0.0)
    assert(pairs((2L, 1L)) == g(1L).toSet.intersect(g(2L).toSet).size.toDouble
      / g(2L).size)
    // disjoint docs share nothing in either direction
    assert(pairs((1L, 3L)) == 0.0 && pairs((3L, 1L)) == 0.0)
  }

  test("incremental ingest verdicts agree with the batch banded pair set") {
    val banded = SparkEntry.queries("dedup_simhash_banded")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // expected: a new doc (id%5==0) is a dup iff some banded Hamming<=1
    // pair links it to an existing doc (id%5!=0)
    val flagged = banded.flatMap { case (a, b) =>
      Seq(a, b).filter(x => x % 5 == 0 &&
        (if (x == a) b % 5 != 0 else a % 5 != 0))
    }.toSet
    val got = SparkEntry.queries("dedup_incremental_ingest")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_dup_of_existing")).toMap
    assert(got.nonEmpty && got.keySet.forall(_ % 5 == 0))
    got.foreach { case (id, hit) =>
      assert(hit == flagged(id), s"doc $id: got $hit, pairs say ${flagged(id)}")
    }
  }

  test("survivor policy picks (max n_chars, min doc_id) per CC cluster") {
    val labels = SparkEntry.queries("dedup_cc_canonical")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id"))
    val chars = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = labels.groupBy(_._2).map { case (can, members) =>
      val ids = members.map(_._1)
      val survivor = ids.minBy(id => (-chars(id), id))
      can -> (ids.length.toLong, survivor, chars(survivor))
    }
    val got = SparkEntry.queries("dedup_survivor_policy")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("canonical_id") ->
        ((r.getAs[Long]("cluster_sz"), r.getAs[Long]("survivor_id"),
          r.getAs[Long]("survivor_chars")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (can, e) =>
      assert(got(can) == e, s"cluster $can: got ${got(can)}, want $e")
    }
  }

  test("domain mixture: sqrt-mass lattice allocation recomputed on the driver") {
    val src = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("sc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val wt = src.map { case (s, n, sc) =>
      (s, n, sc, math.floor(math.sqrt(sc.toDouble)).toLong) }
    val total = wt.map(_._4).sum
    val expected = wt.map { case (s, n, sc, w) =>
      val alloc = 10000L * w / total
      (s, n, sc, w, alloc, 1000000L * alloc / n)
    }.sortBy(_._1)
    val got = SparkEntry.queries("sample_domain_mixture")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_chars"), r.getAs[Long]("wt"),
        r.getAs[Long]("n_alloc"), r.getAs[Long]("rate_ppm")))
    assert(got.toSeq == expected.toSeq)
    // floor-div split can undershoot but never overshoot the budget
    val spent = got.map(_._5).sum
    assert(spent <= 10000L && spent > 10000L - got.length * 2L)
  }
}
