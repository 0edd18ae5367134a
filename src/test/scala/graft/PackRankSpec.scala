package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing (graft.text.Packing) and fixed-iteration PageRank
  * (graft.olap.PageRank): the properties that make both safe at cluster
  * scale — partitioning-invariance of every result, two-level prefix sum
  * equivalence with the single-window reference form, and conservation
  * invariants a packing/ranking must satisfy regardless of data.
  */
class PackRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docTokens = {
    Tables.documents(spark, sfDir).select(col("doc_id"),
      size(graft.text.TextAnalysis.tokens("text")).cast("long")
        .as("n_tokens"))
  }

  test("two-level prefix sum equals the single-window reference form") {
    val twoLevel = graft.text.Packing
      .withStreamOffset(docTokens, "doc_id", "n_tokens", "tok_start",
        bucketSize = 7L) // deliberately tiny, non-divisor bucket
      .select("doc_id", "tok_start")
    // constant key = the deliberate single-partition reference form the
    // two-level scan must reproduce (sf0.001 only; keyed so WindowExec's
    // missing-partition warning can't fire — the computation is identical)
    val w = Window.partitionBy(graft.olap.Exact.onePartition(col("doc_id")))
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = docTokens
      .withColumn("tok_start", sum("n_tokens").over(w) - col("n_tokens"))
      .select("doc_id", "tok_start")
    assert(twoLevel.orderBy("doc_id").collect().toSeq ==
      reference.orderBy("doc_id").collect().toSeq)
  }

  test("packing conserves tokens and fills every interior sequence") {
    val seqLen = 256L
    val packed = graft.text.Packing
      .packSequences(docTokens, "doc_id", "n_tokens", seqLen,
        bucketSize = 100L)
    val perSeq = packed.groupBy("seq_id")
      .agg(sum("n_overlap").as("filled")).collect()
    val totalTokens = docTokens.agg(sum("n_tokens")).head.getLong(0)
    // conservation: every token lands in exactly one sequence
    assert(perSeq.map(_.getAs[Long]("filled")).sum == totalTokens)
    val lastSeq = perSeq.map(_.getAs[Long]("seq_id")).max
    perSeq.foreach { r =>
      val (sid, filled) = (r.getAs[Long]("seq_id"), r.getAs[Long]("filled"))
      if (sid < lastSeq) assert(filled == seqLen, s"seq $sid underfilled")
      else assert(filled > 0 && filled <= seqLen)
    }
    // partitioning invariance: bucket size must not change the result
    val alt = graft.text.Packing
      .packSequences(docTokens.repartition(13), "doc_id", "n_tokens",
        seqLen, bucketSize = 37L)
    assert(packed.select("doc_id", "seq_id", "n_overlap")
      .orderBy("doc_id", "seq_id").collect().toSeq ==
      alt.select("doc_id", "seq_id", "n_overlap")
        .orderBy("doc_id", "seq_id").collect().toSeq)
  }

  test("pagerank: hand graph, base rank floor, and exact first step") {
    import spark.implicits._
    // a -> b, b -> a (2-cycle): symmetric, so ranks stay equal; after any
    // iteration rank = 0.15 + 0.85 * 0.5 exactly (outdeg 1, no rounding
    // loss at 0.5 * 1e12)
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = graft.olap.PageRank.run(edges, "src", "dst", iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == r(2L))
    assert(r(1L) == 0.15 + 0.85 * 0.5)
  }

  test("pagerank: deep iteration keeps plan depth constant and converges") {
    import spark.implicits._
    // star into a hub plus a 2-cycle: checkpoint discipline must keep the
    // per-iteration plan flat, so 12 iterations is as analyzable as 3
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val r = graft.olap.PageRank.run(edges, "src", "dst", iterations = 12)
    // lineage is truncated: the returned frame scans a checkpointed RDD,
    // not a 12-deep join chain
    val logical = r.queryExecution.optimizedPlan.toString
    assert(logical.contains("LogicalRDD") || logical.contains("Scan"),
      s"expected a checkpoint scan, got:\n$logical")
    assert(!logical.contains("Join"),
      "deep-iteration plan must not chain joins through all iterations")
    val ranks = r.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // mass conservation within quantization: total rank ≈ n*base/(1-d)
    // is not exact, but all ranks are positive and the hub dominates
    assert(ranks.size == 4)
    assert(ranks(9L) > ranks(1L) && ranks(1L) > ranks(3L))
    assert(ranks.values.forall(v => v >= 0.15 && v.isFinite))
    // determinism: a second run at different partitioning is bitwise equal
    val again = graft.olap.PageRank
      .run(edges.repartition(7), "src", "dst", iterations = 12)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again == ranks)
  }

  test("triangles: hand graphs with known counts") {
    import spark.implicits._
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = graft.olap.Triangles.stats(edges.toDF("u", "v")).collect()(0)
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
       r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    }
    // K4: 4 nodes, 6 edges, C(3,2)*4 = 12 wedges, 4 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == ((4L, 6L, 12L, 4L)))
    // K4 + pendant node: pendant adds 1 edge, 3 wedges (hub deg 4), 0 tris
    assert(tri(k4 :+ (1L, 5L)) == ((5L, 7L, 15L, 4L)))
    // a square (4-cycle): wedges but no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) ==
      ((4L, 4L, 4L, 0L)))
    // two triangles sharing an edge
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))._4 == 2L)
  }

  test("per-node triangle counts: hand graphs, partitioning invariance") {
    import spark.implicits._
    def counts(edges: Seq[(Long, Long)], parts: Int = 1): Map[Long, (Long, Long)] =
      graft.olap.Triangles
        .perNodeCounts(edges.toDF("u", "v").repartition(parts))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // K4: every node degree 3, in all C(3,2) = 3 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(counts(k4) == (1L to 4L).map(_ -> (3L, 3L)).toMap)
    // K4 + pendant off node 1: pendant has degree 1, zero triangles;
    // node 1's triangle count unchanged
    val p = counts(k4 :+ (1L, 5L))
    assert(p(5L) == ((1L, 0L)) && p(1L) == ((4L, 3L)))
    // two triangles sharing edge (1,2): shared nodes in 2, others in 1
    val shared = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(counts(shared) ==
      Map(1L -> (3L, 2L), 2L -> (3L, 2L), 3L -> (2L, 1L), 4L -> (2L, 1L)))
    // square: wedges but no triangles — every node present with t = 0
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
      .values.forall(_ == ((2L, 0L))))
    // same answers regardless of input partitioning
    assert(counts(shared, parts = 13) == counts(shared))
    // conservation: corner credits sum to 3 × total triangle count
    val t4 = graft.olap.Triangles.stats(k4.toDF("u", "v")).collect()(0)
      .getAs[Long]("n_triangles")
    assert(counts(k4).values.map(_._2).sum == 3 * t4)
  }

  test("modularity: exact rational arithmetic and cross-query consistency") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("graph_modularity")(spark, sf).collect()(0)
    val (m, intra) = (r.getAs[Long]("m_edges"), r.getAs[Long]("intra_edges"))
    val (num, den) = (r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
    // the rational IS the formula: den = 4m², num consistent with intra
    assert(den == 4 * m * m && intra <= m && intra >= 0)
    val q = r.getAs[Double]("modularity")
    assert(q == num.toDouble / den.toDouble && q >= -0.5 && q <= 1.0)
    // same partition as graph_label_prop: community count agrees
    val nComm = SparkEntry.queries("graph_label_prop")(spark, sf)
      .count()
    assert(r.getAs[Long]("n_communities") == nComm)
  }

  test("katz attenuated path counts: star center dominates, exact floors") {
    import spark.implicits._
    // star: center 0 <-> leaves 1..8 (symmetric edges)
    val base = (1L to 8L).flatMap(l => Seq((0L, l), (l, 0L)))
    val e = base.toDF("src", "dst")
    var v = e.select(col("src").as("node")).distinct()
      .withColumn("katz", lit(1L))
    for (_ <- 1 to 3) {
      v = e.join(v, col("dst") === col("node"))
        .groupBy(col("src").as("n2")).agg(sum(col("katz")).as("m"))
        .select(col("n2").as("node"), (lit(1L) + expr("m DIV 4")).as("katz"))
    }
    val got = v.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-applied v' = 1 + floor(sum(neighbors)/4):
    // r1: center 1+8/4=3, leaf 1+1/4=1
    // r2: center 1+8/4=3, leaf 1+3/4=1  (stable)
    assert(got(0L) == 3L && (1L to 8L).forall(got(_) == 1L))
  }

  test("hits lattice: renormalized scores peak at 4096, calmar signs agree") {
    val sf = "/root/testdata/sf0.001"
    val hits = SparkEntry.queries("graph_hits")(spark, sf).collect()
    val byRole = hits.groupBy(_.getAs[String]("role"))
    // each role's top score is exactly the 4096 lattice bound
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("score")).max == 4096L)
      assert(rs.forall(r => r.getAs[Long]("score") >= 0L))
    }
    // calmar: sign follows the total return; NULL only when no drawdown
    SparkEntry.queries("ts_calmar_ratio")(spark, sf).collect().foreach { r =>
      val ret = r.getAs[Long]("total_return_bp")
      if (!r.isNullAt(r.fieldIndex("calmar"))) {
        val c = r.getAs[Double]("calmar")
        assert(math.signum(c) == math.signum(ret.toDouble))
        assert(r.getAs[Long]("max_dd_bp") > 0)
      } else assert(r.getAs[Long]("max_dd_bp") == 0)
    }
  }

  test("label propagation: hand graph, deterministic tie-breaks") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4; hand-applying
    // "most frequent neighbor label, ties to smallest" for 2 rounds:
    // r1 = {1→2, 2→1, 3→1, 4→3, 5→4, 6→4}
    // r2 = {1→1, 2→1, 3→1, 4→4, 5→3, 6→3}
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
                   (4L, 6L), (5L, 6L))
    val sym = (base ++ base.map(_.swap)).toDF("src", "dst")
    val got = graft.olap.LabelProp.labels(sym, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      4L -> 4L, 5L -> 3L, 6L -> 3L))
    // partitioning invariance: shuffled input, same labels
    val again = graft.olap.LabelProp.labels(sym.repartition(11), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("bounded BFS: exact distances on a hand graph") {
    import spark.implicits._
    // path 1-2-3-4-5 plus chord 2-4: distances from 1 are
    // {1:0, 2:1, 3:2, 4:2 (via chord), 5:3}
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 4L))
    val sym = (base ++ base.map(_.swap)).toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val got = graft.olap.Bfs.distanceCounts(sym, src, 3)
      .orderBy("distance").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((0, 1L), (1, 1L), (2, 2L), (3, 1L)))
    // hop bound respected: with maxHops=1 only two rows come back
    assert(graft.olap.Bfs.distanceCounts(sym, src, 1).count() == 2)
  }

  test("k-core peel cascades on a hand graph with known median degree") {
    import spark.implicits._
    // triangle {1,2,3} + tail 3-4-5. degrees (d,n)-sorted:
    // (1,5)(2,1)(2,2)(2,4)(3,3) -> median k=2. peel 1 drops node 5,
    // peel 2 drops the now-degree-1 node 4, peel 3 is stable (triangle).
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = graft.olap.KCore.peelStats(e, 3).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 5L, 5L), (1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)))
  }

  test("pagerank is bitwise partitioning-invariant on real data") {
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    def edges(shuffled: Boolean) = {
      val base = pairs.select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .union(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst")))
      if (shuffled) base.repartition(17).sortWithinPartitions("dst") else base
    }
    val a = graft.olap.PageRank.run(edges(false), "src", "dst", 2)
      .orderBy("node_id").collect().toSeq
    val b = graft.olap.PageRank.run(edges(true), "src", "dst", 2)
      .orderBy("node_id").collect().toSeq
    // quantized-integer accumulation => identical DOUBLE bits either way
    assert(a == b)
    // every node keeps at least the damping base; total mass follows the
    // closed form sum_k = 0.15*N*(1 + 0.85) + 0.85^2 * sum_0 with sum_0 = 1
    // (mass only leaks through contribution quantization, bounded by
    // #edges/Scale)
    val ranks = a.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ >= 0.15))
    val expected = 0.15 * ranks.size * (1 + 0.85) + 0.85 * 0.85 * 1.0
    assert(math.abs(ranks.sum - expected) / expected < 1e-6)
  }

  test("jaccard links: bounds, cn dominance, non-adjacency") {
    val rows = SparkEntry.queries("graph_jaccard_links")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // edges of the same co-purchase graph, for the non-adjacency check
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val edges = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      val (cn, du, dv) = (r.getAs[Long]("cn"), r.getAs[Long]("du"),
                          r.getAs[Long]("dv"))
      val j = r.getAs[Double]("jaccard")
      assert(x < y && !edges.contains((x, y)), s"adjacent pair ($x,$y)")
      assert(cn >= 1 && cn <= math.min(du, dv))
      assert(j > 0.0 && j <= 1.0)
      assert(j == cn.toDouble / (du + dv - cn).toDouble)
    }
    // boundary order is the declared total order
    val key = rows.map(r => (-r.getAs[Double]("jaccard"),
      r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(key.sameElements(key.sorted))
  }

  test("mixture balance hits its quotas exactly") {
    val out = SparkEntry.queries("sample_mixture_balance")(spark, sfDir)
      .collect().map(r => r.getAs[String]("lang")
        -> r.getAs[Long]("n_selected")).toMap
    val counts = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count"))
      .toMap
    val wt = Map("en" -> 5L, "es" -> 2L, "de" -> 1L, "fr" -> 1L, "zh" -> 1L)
    val m = wt.keys.map(l => counts(l) * 10L / wt(l)).min
    wt.foreach { case (l, w) =>
      assert(out(l) == w * m / 10L, s"quota for $l")
      assert(out(l) <= counts(l))
    }
  }

  test("filter funnel counts are monotonically non-increasing") {
    val rows = SparkEntry.queries("pipeline_filter_funnel")(spark, sfDir)
      .collect().map(r => r.getAs[String]("stage")
        -> r.getAs[Long]("n_docs"))
    assert(rows.map(_._1).toSeq ==
      Seq("s0_all", "s1_lang", "s2_length", "s3_stopwords", "s4_repetition"))
    rows.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
