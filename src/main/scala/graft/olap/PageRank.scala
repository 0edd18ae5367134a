package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list, with arithmetic chosen so
  * the result is bitwise-reproducible on any engine and any partitioning:
  * the per-node received mass is accumulated as a scaled BIGINT (each
  * contribution floors `rank/outdeg * SCALE` — two IEEE-exact double ops +
  * floor), so the shuffle-side sum is integer-exact and order-independent;
  * the rank update `base + damping * received` is then a fixed chain of
  * single double ops. Same trick as the engine's exact moment statistics
  * (graft.olap.Exact): quantize once per term, sum integers, convert once.
  *
  * Scale posture per iteration: one join edges⋈ranks on src (ranks is
  * per-node, i.e. orders of magnitude smaller than edges; both hash on the
  * same key so the edge side's shuffle layout is reusable across
  * iterations — cache the pre-partitioned edge frame exactly like
  * graft.dedup.Components does), one partial-aggregable groupBy(dst), one
  * join back to the node list. No collect, no windows, no per-edge state.
  */
object PageRank {

  val Scale = 1000000000000L // 1e12: rank mass * Scale stays << 2^63

  /** @param edges    directed edge list (deduplicated by the caller)
    * @param srcCol   source node id column (integral)
    * @param dstCol   destination node id column
    * @param iterations fixed iteration count (no convergence probe — the
    *                   plan is a static chain, as a scheduled 100 TB job
    *                   would run it)
    * @return (node_id, rank) — every node that appears as a source or
    *         destination; nodes with no in-edges hold the base rank
    */
  /** @param edgesPinned  the caller passes an edge frame ALREADY
    *                      persisted and pre-partitioned on the source
    *                      column (GraphFrames.partSuppSym) — skip the
    *                      per-call repartition/persist/unpersist so the
    *                      shared layout is built once per process+SF
    *                      instead of once per call (guide §2.1/§2.4)
    * @param nodesOpt      prebuilt (node_id) frame ≡ the distinct
    *                      endpoints of `edges` (e.g. the pinned degree
    *                      frame's node column) — skips the per-call
    *                      node-sized distinct
    * @param outdegOpt     prebuilt (src, outdeg) frame ≡
    *                      edges.groupBy(src).count
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, damping: Double = 0.85,
          base: Double = 0.15, edgesPinned: Boolean = false,
          nodesOpt: Option[DataFrame] = None,
          outdegOpt: Option[DataFrame] = None): DataFrame = {
    // pre-shuffled on the per-iteration join key and persisted: every
    // iteration reuses the cached layout (the iterative analog of
    // bucketing — same trick as graft.dedup.Components), so the big edge
    // side is scanned, shuffled, and sorted exactly once no matter the
    // iteration count. nodes/outdeg are node-sized (orders of magnitude
    // smaller) but also referenced every iteration, so they persist too.
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (edgesPinned) e0 else e0.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = nodesOpt.getOrElse(e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val outdeg = outdegOpt.getOrElse(
      e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // 1/N initial rank: N via a 1-row aggregate, combined by broadcast
    // cross join (scalar combine — not a data-data cartesian)
    val n = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .withColumn("rank", lit(1.0) / col("__n").cast("double"))
      .select("node_id", "rank")
    for (_ <- 1 to iterations) {
      // per-source quantized contribution: floor(rank/outdeg * SCALE)
      val perSrc = ranks.join(outdeg, ranks("node_id") === outdeg("src"))
        .select(col("src"),
          floor(col("rank") / col("outdeg").cast("double")
            * lit(Scale.toDouble)).cast("long").as("c"))
      val received = e.join(perSrc, "src")
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .withColumnRenamed("dst", "node_id")
      ranks = nodes.join(received, Seq("node_id"), "left")
        .withColumn("rank",
          lit(base) + lit(damping)
            * (coalesce(col("sc"), lit(0L)).cast("double")
               / lit(Scale.toDouble)))
        .select("node_id", "rank")
        // truncate lineage each iteration (same discipline as
        // graft.dedup.Components): without this the plan chains through
        // every prior iteration, and analysis/optimization cost grows
        // with depth — fine at 3 iterations, a hazard when a caller asks
        // for 20. Checkpointing keeps per-iteration plan depth constant,
        // so wall time stays flat in the iteration count.
        .localCheckpoint()
    }
    // the checkpointed result no longer references their lineage, so the
    // iteration-scoped caches can be released instead of accumulating
    // across invocations (bench runs every query twice); pinned/prebuilt
    // frames belong to the caller and are never released here
    if (!edgesPinned) e.unpersist(false)
    if (nodesOpt.isEmpty) nodes.unpersist(false)
    if (outdegOpt.isEmpty) outdeg.unpersist(false)
    ranks
  }

  /** Personalized PageRank: the teleport mass lands on a SEED set instead
    * of uniformly — the "similar to these" primitive behind related-item
    * recommendation and seed-expansion labeling. Same quantized-lattice
    * per-iteration arithmetic as [[run]] (floor-scaled contributions sum
    * as integers, so the shuffle is order-independent and the result
    * bitwise-portable); the only change is the rank recurrence
    * `r = (1-d)·e_S + d·A^T r` with e_S = 1/|S| on seeds, 0 elsewhere —
    * non-seed nodes hold rank ONLY through incoming walk mass, so rank
    * decays with graph distance from the seeds.
    *
    * Scale posture: identical to [[run]] — the edge frame pre-shuffles on
    * the join key once and persists across iterations; seeds is a
    * node-sized column joined once into the base-rank frame. No collect.
    *
    * @param seeds one column `node_id` — must be a subset of the graph's
    *              nodes for the teleport mass to be conserved
    * @param base  the teleport coefficient 1-damping, supplied as a
    *              LITERAL (like [[run]]'s base) — computing `1.0 - 0.85`
    *              at runtime yields 0.15000000000000002, one ulp off the
    *              literal 0.15 the oracle spells, and the whole point of
    *              the lattice arithmetic is that no such drift exists
    */
  def runPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                      seeds: DataFrame, iterations: Int,
                      damping: Double = 0.85,
                      base: Double = 0.15, edgesPinned: Boolean = false,
                      nodesOpt: Option[DataFrame] = None,
                      outdegOpt: Option[DataFrame] = None): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = if (edgesPinned) e0 else e0.repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sd = seeds.select(col("node_id")).distinct()
    val nodes = nodesOpt.getOrElse(e.select(col("src").as("node_id"))
        .union(e.select(col("dst").as("node_id"))).distinct())
      .join(sd.withColumn("is_seed", lit(true)), Seq("node_id"), "left")
      .withColumn("is_seed", coalesce(col("is_seed"), lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = outdegOpt.getOrElse(
      e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // teleport mass per seed: (1-d) * (1 / |S|) — two single IEEE ops,
    // identical chain in the oracle; |S| via a 1-row scalar combine
    val nSeeds = nodes.filter(col("is_seed"))
      .agg(count(lit(1)).as("__ns"))
    var ranks = nodes.crossJoin(broadcast(nSeeds))
      .withColumn("rank",
        when(col("is_seed"), lit(1.0) / col("__ns").cast("double"))
          .otherwise(lit(0.0)))
      .select("node_id", "is_seed", "rank")
    for (_ <- 1 to iterations) {
      val perSrc = ranks.join(outdeg, ranks("node_id") === outdeg("src"))
        .select(col("src"),
          floor(col("rank") / col("outdeg").cast("double")
            * lit(Scale.toDouble)).cast("long").as("c"))
      val received = e.join(perSrc, "src")
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .withColumnRenamed("dst", "node_id")
      ranks = nodes.crossJoin(broadcast(nSeeds))
        .join(received, Seq("node_id"), "left")
        .withColumn("rank",
          when(col("is_seed"),
            lit(base) * (lit(1.0) / col("__ns").cast("double")))
            .otherwise(lit(0.0))
          + lit(damping)
            * (coalesce(col("sc"), lit(0L)).cast("double")
               / lit(Scale.toDouble)))
        .select("node_id", "is_seed", "rank")
        .localCheckpoint() // constant plan depth per iteration, as in run()
    }
    // nodes (the per-call seed-flag join) is always function-owned;
    // pinned/prebuilt edge and outdeg frames belong to the caller
    if (!edgesPinned) e.unpersist(false)
    nodes.unpersist(false)
    if (outdegOpt.isEmpty) outdeg.unpersist(false)
    ranks
  }
}
