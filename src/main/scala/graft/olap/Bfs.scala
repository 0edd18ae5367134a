package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded breadth-first search: exact-distance node counts from a source
  * node, up to a fixed hop limit — the reachability/radius primitive of
  * the graph suite (alongside components, ranking, triangles, k-core and
  * label propagation).
  *
  * Per hop: one keyed join (frontier⋈edges) + one distinct + one anti-join
  * against the visited set — all shuffle-on-key, no windows, no
  * per-node state on the driver. EAGER like [[KCore]]: each hop's
  * frontier is materialized by its own 1-row count, so the visited/frontier
  * caches of finished hops are released immediately and the driver only
  * ever holds one (distance, n_nodes) pair per hop.
  */
object Bfs {

  /** @param edges SYMMETRIC edge list (src, dst)
    * @param source 1-row frame with a `node` column (the BFS root set)
    * @param maxHops fixed hop bound (unrollable into oracle CTEs)
    * @param edgesPinned the caller passes a frame ALREADY persisted and
    *                    pre-partitioned on `src` (GraphFrames.partSuppSym)
    *                    — skip the per-call persist/unpersist so the
    *                    per-hop join reuses the cached layout (§2.1/§2.4)
    * @return (distance, n_nodes): nodes at EXACT distance d, d = 0..maxHops
    */
  def distanceCounts(edges: DataFrame, source: DataFrame,
                     maxHops: Int, edgesPinned: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (edgesPinned) e0
      else e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frontier = source.select(col("node")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // visited = LAZY union of the already-persisted per-hop frontiers:
    // the old per-hop `newVisited` persist + count paid one extra action
    // and one extra cached copy per hop for a frame whose every input is
    // already materialized — the anti-join reads the ≤(maxHops+1)-deep
    // union of cached node frames directly (r11; guide §1.2 — fewer
    // jobs, identical rows)
    var visited = frontier
    var out = List((0, frontier.count()))
    val retired = scala.collection.mutable.ListBuffer.empty[DataFrame]
    retired += frontier
    for (d <- 1 to maxHops) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out = out :+ ((d, next.count())) // materializes `next`
      retired += next
      visited = visited.unionAll(next)
      frontier = next
    }
    retired.foreach(_.unpersist(false))
    if (!edgesPinned) e.unpersist(false)
    out.toDF("distance", "n_nodes")
  }
}
