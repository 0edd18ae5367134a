package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair list — the step that
  * turns candidate pairs into dedup *decisions*: every document in a
  * component maps to the component's canonical (minimum) id, and the
  * non-canonical members are the rows a dedup pass drops.
  *
  * Algorithm: min-label propagation with pointer jumping (path halving).
  * Each node starts labeled with itself; every round it takes the minimum
  * of its own label and its neighbors' labels, then resolves its label
  * through the label map once more (label := label(label)). The plain
  * propagation needs O(component diameter) rounds — near-dup chains from
  * Hamming-1 links can be hundreds long — while path halving converges in
  * O(log diameter). The fixpoint (component minimum everywhere) is unique
  * regardless of partitioning or iteration order, so the result is
  * deterministic and the DuckDB oracle (recursive transitive closure)
  * reproduces it exactly.
  *
  * Scale shape: each round is two keyed equi-joins plus a
  * partial-aggregable min — no driver-side data beyond one exact decimal
  * sum per round (the convergence check: labels only decrease, so the
  * label sum strictly decreases until the fixpoint; decimal so 10¹⁰ nodes
  * with 10¹⁰-sized ids can't overflow). AQE right-sizes the tiny
  * post-shuffle partitions locally; at cluster scale the same joins
  * shuffle on node id. `localCheckpoint` is the single-job lineage
  * truncation; a production run on a lossy cluster would swap it for a
  * reliable `checkpoint` dir (same call shape) so an executor loss
  * recovers from storage instead of recomputing rounds.
  */
object Components {

  /** (doc_id, canonical_id) for every node appearing in `edges`
    * (columns aCol, bCol). canonical_id = min doc id of the component.
    */
  def canonicalLabels(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
                         col(bCol).cast("long").as("b"))
    // cached pre-shuffled AND pre-sorted on the join key: the cached frame
    // carries HashPartitioning(a) + per-partition order, so every round's
    // neighbor-min join reuses the layout (no re-exchange, no re-sort of
    // the edge frame — it is the big side; only the tiny label frame moves
    // per round). This is the iterative-algorithm analog of bucketing.
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a"))
      .sortWithinPartitions("a")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed with round 1 for free: label₀ = min(self, neighbors) is ONE
    // partial-aggregable aggregation over the symmetric edge frame —
    // the same result the first propagation round would produce via two
    // joins (sym is symmetric, so grouping on `a` covers every node)
    var labels = sym.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .localCheckpoint()
    var prevSum: java.math.BigDecimal = null
    var converged = false
    while (!converged) {
      // 1. neighbor minimum: keyed join + partial-aggregable min
      val nm = sym.join(labels, sym("a") === labels("node"))
        .groupBy(sym("b").as("node"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels
        .join(nm.withColumnRenamed("node", "n2"),
              col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // 2. pointer jumping: label := label(label) — every label is itself
      // a node, so the inner join is total; halves remaining path lengths
      // (log₂ rounds instead of O(diameter)). localCheckpoint (not just
      // persist): the self-join references `stepped` twice, so without
      // lineage truncation the logical plan doubles per round and plan
      // handling goes exponential. (A second jump per round was tried and
      // is a net loss here: the extra multiply-referenced intermediate
      // recomputes under cache races and adds shuffles worth more than
      // the saved rounds.)
      val next = stepped.as("x")
        .join(stepped.select(col("node").as("n2"), col("label").as("l2"))
          .as("y"), col("x.label") === col("n2"))
        .select(col("x.node").as("node"),
                least(col("x.label"), col("l2")).as("label"))
        .localCheckpoint()
      // labels only decrease, so the exact label sum strictly decreases
      // until the fixpoint — one aggregate action per round
      val s = next.agg(sum(col("label").cast("decimal(38,0)")).as("s"))
        .first().getDecimal(0)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      stepped.unpersist()
      labels = next
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("canonical_id"))
  }
}
