package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pinned-shared-frame equivalences: every operator whose input
  * moved onto a pinned derived table (or whose internals grew a
  * pinned-input fast path) is pinned bitwise-equal to the inline
  * construction it replaced, on the fixture corpus — beyond the DuckDB
  * oracle rows (which certify the end results separately).
  */
class SharedFrameEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("partSuppSym == inline symmetrized doubled-id frame") {
    val pairs = graft.olap.GraphFrames.partSuppPairs(spark, sf)
    val inline = pairs.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
    assertSameRows(graft.olap.GraphFrames.partSuppSym(spark, sf), inline)
    CacheRegistry.releaseAll()
  }

  test("coPurchaseSym == inline symmetrized co-purchase frame") {
    val e = graft.olap.GraphFrames.coPurchaseEdges(spark, sf)
    val inline = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    assertSameRows(graft.olap.GraphFrames.coPurchaseSym(spark, sf), inline)
    CacheRegistry.releaseAll()
  }

  test("eventSeqLeads/eventBigramCounts == independent window replay") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val replay = Tables.events(spark, sf)
      .select(col("event_type").as("et"),
        lead(col("event_type"), 1).over(w).as("l1"),
        lead(col("event_type"), 3).over(w).as("l3"))
    // bigram counts replay (the frame six transition queries read)
    val wantBigrams = replay.filter(col("l1").isNotNull)
      .groupBy(col("et").as("a"), col("l1").as("b"))
      .agg(count(lit(1)).as("n"))
    assertSameRows(graft.queries.Shared.eventBigramCounts(spark, sf), wantBigrams)
    // a non-adjacent lead off the pinned frame (the seq_gap consumers)
    val gotL3 = graft.queries.Shared.eventSeqLeads(spark, sf)
      .filter(col("l3").isNotNull)
      .groupBy(col("et"), col("l3")).agg(count(lit(1)).as("n"))
    val wantL3 = replay.filter(col("l3").isNotNull)
      .groupBy(col("et"), col("l3")).agg(count(lit(1)).as("n"))
    assertSameRows(gotL3, wantL3)
    CacheRegistry.releaseAll()
  }

  test("canonicalLabels symInput fast path == plain edge-list path") {
    val e = graft.olap.GraphFrames.coPurchaseEdges(spark, sf)
    val plain = graft.dedup.Components.canonicalLabels(e, "u", "v")
    val pinnedPath = graft.dedup.Components.canonicalLabels(
      graft.olap.GraphFrames.coPurchaseSym(spark, sf), "u", "v",
      symInput = true)
    assertSameRows(pinnedPath, plain)
    CacheRegistry.releaseAll()
  }

  test("PageRank.run with pinned edges + prebuilt nodes/outdeg ==" +
      " self-derived run") {
    val G = graft.olap.GraphFrames
    val pairs = G.partSuppPairs(spark, sf)
    val inline = pairs.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
    val plain = graft.olap.PageRank.run(inline, "src", "dst", 3)
    val deg = G.partSuppDegrees(spark, sf)
    val pinned = graft.olap.PageRank.run(G.partSuppSym(spark, sf),
      "src", "dst", 3, edgesPinned = true,
      nodesOpt = Some(deg.select(col("n").as("node_id"))),
      outdegOpt = Some(deg.select(col("n").as("src"),
        col("d").as("outdeg"))))
    assertSameRows(pinned, plain)
    CacheRegistry.releaseAll()
  }

  test("Bfs pinned-edges path == self-persisted path") {
    val G = graft.olap.GraphFrames
    val pairs = G.partSuppPairs(spark, sf)
    val inline = pairs.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
        (col("l_partkey") * 2).as("dst")))
    val source = inline.agg(min(col("src")).as("node"))
    val plain = graft.olap.Bfs.distanceCounts(inline, source, 3)
    val pinned = graft.olap.Bfs.distanceCounts(G.partSuppSym(spark, sf),
      G.partSuppDegrees(spark, sf).agg(min(col("n")).as("node")), 3,
      edgesPinned = true)
    assertSameRows(pinned, plain)
    CacheRegistry.releaseAll()
  }

  test("katz src-keyed matvec == dst-keyed matvec on the symmetric graph") {
    // the r11 join flip: on a symmetric edge set, summing ranks over
    // in-neighbors (join on dst, group by src) and over out-neighbors
    // (join on src, group by dst) are the same integer multiset
    val G = graft.olap.GraphFrames
    val e = G.partSuppSym(spark, sf)
    var vOld = e.select(col("src").as("node")).distinct()
      .withColumn("katz", lit(1L))
    var vNew = G.partSuppDegrees(spark, sf).select(col("n").as("node"))
      .withColumn("katz", lit(1L))
    for (_ <- 1 to 3) {
      vOld = e.join(vOld, col("dst") === col("node"))
        .groupBy(col("src").as("n2")).agg(sum(col("katz")).as("m"))
        .select(col("n2").as("node"), (lit(1L) + expr("m DIV 4")).as("katz"))
      vNew = e.join(vNew, col("src") === col("node"))
        .groupBy(col("dst").as("n2")).agg(sum(col("katz")).as("m"))
        .select(col("n2").as("node"), (lit(1L) + expr("m DIV 4")).as("katz"))
    }
    assertSameRows(vNew, vOld)
    CacheRegistry.releaseAll()
  }
}
