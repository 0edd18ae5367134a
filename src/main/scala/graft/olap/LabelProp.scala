package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round label propagation (community detection): every node starts
  * in its own community (label = node id) and each round adopts the most
  * frequent label among its neighbors, ties broken by the smallest label —
  * the classic LPA update, made deterministic by the total (count desc,
  * label asc) order.
  *
  * Scale shape, per round: one keyed join edges⋈labels + one
  * partial-aggregable groupBy(node, label) count + one partial-aggregable
  * `max_by` argmax per node — no windows, no collects, the same
  * bounded-iteration posture as [[PageRank]] and [[KCore]]. The argmax
  * packs (count, −label) so "most frequent, then smallest" is a single
  * lexicographic max that pre-reduces map-side.
  */
object LabelProp {

  /** @param edges SYMMETRIC edge list (caller provides both directions)
    * @param rounds fixed round count (unrollable into oracle CTEs)
    * @param edgesPinned the caller passes a frame that is ALREADY
    *                    persisted and pre-partitioned on the join key
    *                    (e.g. GraphFrames.partSuppSym) — skip the
    *                    per-call persist and the exit unpersist so the
    *                    shared layout survives (guide §2.1/§2.4)
    * @return (node, label) after `rounds` updates
    */
  def labels(edges: DataFrame, rounds: Int,
             edgesPinned: Boolean = false): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (edgesPinned) e0
      else e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // symmetric edges: every node appears as a src
    var l = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      l = e.join(l, e("src") === l("node"))
        .groupBy(col("dst").as("n2"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("n2").as("node"))
        .agg(max_by(col("label"), struct(col("c"), negate(col("label"))))
          .as("label"))
    }
    // the loop is short and bounded, but eager-checkpoint the result so
    // the edge cache can be released instead of accumulating (the same
    // exit discipline as PageRank)
    val out = l.localCheckpoint()
    if (!edgesPinned) e.unpersist(false)
    out
  }
}
