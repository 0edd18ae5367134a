package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CacheRegistry.QueryCached
import graft.dedup.NgramJaccard

/** Triangle counting by degree-ordered orientation.
  *
  * Direct each undirected edge from its (degree, id)-smaller endpoint:
  * every triangle then has exactly ONE node with out-edges to the other
  * two, and the out-degree under this orientation is bounded by ~sqrt(2m),
  * so hub nodes cannot explode the closure the way a naive neighbor
  * self-join does (the "forward" algorithm of Schank & Wagner 2005).
  *
  * The closure itself is the compact-forward refinement: build each node's
  * sorted out-neighbor list once, then per oriented edge (a→b) count
  * |N⁺(a) ∩ N⁺(b)| with the codegen'd linear-merge intersect — no wedge
  * frame is ever materialized. Versus the wedge-join + semi-join
  * formulation this removes the O(Σ C(outdeg,2)) intermediate (tens of
  * millions of rows on a co-purchase graph) and its shuffle + hash build;
  * what remains is one groupBy to build adjacency and one equi-join probe
  * whose per-row cost is a merge over two bounded lists.
  */
object Triangles {

  /** Per-node triangle participation counts under the same degree-ordered
    * orientation. Instead of summing |N⁺(a) ∩ N⁺(b)| per oriented edge,
    * the intersection is materialized (`array_intersect` of the two sorted
    * neighbor lists) and exploded, so each triangle (a, b, w) is emitted
    * exactly once and credited to all three corners. Output volume is
    * 3·T rows pre-aggregation — linear in the triangle count, never in
    * wedge count — and the only shuffles are the adjacency groupBy and
    * the final per-node count.
    *
    * @param e undirected edge list in canonical form (u < v, distinct)
    * @return (n, d, t): every node with its undirected degree and the
    *         number of triangles it participates in (t = 0 included)
    */
  def perNodeCounts(e: DataFrame): DataFrame = {
    // node-sized and referenced 3× (both endpoint-degree joins + the final
    // left join); uncached, each reference re-runs the full degree
    // aggregation over the edge frame
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .tracked
    val ed = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = ed.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
      .tracked // consumed twice: adjacency build + per-edge probe (registered for post-query release)
    val adj = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
      .tracked // consumed twice (na + nb probes); adjacency build is the query's priciest aggregate
    val corners = oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        explode(array_intersect(col("na"), col("nb"))).as("w"))
      .select(explode(array(col("a"), col("b"), col("w"))).as("n"))
    val tc = corners.groupBy("n").agg(count(lit(1)).as("t"))
    deg.join(tc, Seq("n"), "left")
      .select(col("n"), col("d"), coalesce(col("t"), lit(0L)).as("t"))
  }

  /** @param e undirected edge list in canonical form (u < v, distinct).
    *          Persisted by the caller if reused.
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles)
    */
  def stats(e: DataFrame): DataFrame = {
    // referenced 3× (endpoint-degree joins + wedge aggregate) — cached so
    // the degree aggregation runs once (same fix as perNodeCounts)
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .tracked
    val ed = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = ed.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
      .tracked
    val adj = oriented.groupBy(col("a"))
      .agg(sort_array(collect_list(col("b"))).as("nbrs"))
      .tracked // consumed twice (na + nb probes)
    // every oriented edge's source has an adjacency row (inner join is
    // lossless); the target may have none (left join, counts 0)
    val tri = oriented
      .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("a").as("b"), col("nbrs").as("nb")),
            Seq("b"), "left")
      .agg(coalesce(
        sum(when(col("nb").isNull, lit(0L)).otherwise(
          NgramJaccard.intersect_count_sorted(col("na"), col("nb")))),
        lit(0L)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(edges).crossJoin(tri) // 1-row scalar combines
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
              col("n_triangles"))
  }
}
