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
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int, damping: Double = 0.85,
          base: Double = 0.15): DataFrame = {
    // pre-shuffled on the per-iteration join key and persisted: every
    // iteration reuses the cached layout (the iterative analog of
    // bucketing — same trick as graft.dedup.Components), so the big edge
    // side is scanned, shuffled, and sorted exactly once no matter the
    // iteration count. nodes/outdeg are node-sized (orders of magnitude
    // smaller) but also referenced every iteration, so they persist too.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    // across invocations (bench runs every query twice)
    e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
    ranks
  }
}
