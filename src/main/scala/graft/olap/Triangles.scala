package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered orientation.
  *
  * Direct each undirected edge from its (degree, id)-smaller endpoint:
  * every triangle then has exactly ONE node with out-edges to the other
  * two, so one wedge join + one closure semi-join counts each triangle
  * once — and the out-degree under this orientation is bounded by
  * ~sqrt(2m), so hub nodes cannot explode the wedge join the way a naive
  * neighbor self-join does (the standard scalable formulation; cf. the
  * "forward" algorithm of Schank & Wagner 2005).
  */
object Triangles {

  /** @param e undirected edge list in canonical form (u < v, distinct).
    *          Persisted by the caller if reused.
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles)
    */
  def stats(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    val oriented = ed.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"))
      .persist()
    val wedges = oriented.as("x")
      .join(oriented.as("y"),
            col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(least(col("x.b"), col("y.b")).as("u"),
              greatest(col("x.b"), col("y.b")).as("v"))
    val tri = wedges.join(e, Seq("u", "v"), "leftsemi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(edges).crossJoin(tri) // 1-row scalar combines
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
              col("n_triangles"))
  }
}
