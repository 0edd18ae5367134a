package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling: repeatedly delete nodes of degree < k and
  * take the induced subgraph. Full decomposition iterates to a fixpoint;
  * like PageRank's fixed iterations, a bounded number of peel rounds keeps
  * the plan finite and the oracle expressible as unrolled CTEs — each
  * round is one partial-aggregable degree count + two semi-joins, so a
  * round costs two shuffles of the (shrinking) edge list.
  *
  * The threshold is data-dependent: the positional median degree of the
  * ORIGINAL graph (exact integer order statistic, ties totalized by node
  * id), so the operator exercises real cascading deletion at any scale
  * factor instead of hardcoding a constant that peels everything or
  * nothing.
  */
object KCore {

  /** Per-round survivor stats. Round 0 = input graph; round r>0 = after r
    * peels at k = median degree of round 0. Output: (round, n_nodes,
    * n_edges), nodes = distinct endpoints of surviving edges.
    */
  def peelStats(e0: DataFrame, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
    // positional median over (d, n): constant-partitioned window keeps the
    // plan a partitioned WindowExec (input is one row per node — already
    // reduced); the single-partition sort is over node-count rows, not
    // edges
    val d0 = degrees(e0)
    val w = Window.partitionBy(lit(true)).orderBy(col("d"), col("n"))
    val kth = d0
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(lit(true))))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("d").as("kth"))
    def stats(e: DataFrame, round: Int): DataFrame =
      e.agg(count(lit(1)).as("n_edges")).crossJoin(
        e.select(explode(array(col("u"), col("v"))).as("n"))
          .agg(countDistinct(col("n")).as("n_nodes")))
        .select(lit(round).as("round"), col("n_nodes"), col("n_edges"))
    var e = e0
    var out = stats(e0, 0)
    for (r <- 1 to rounds) {
      val keep = degrees(e).crossJoin(broadcast(kth))
        .filter(col("d") >= col("kth")).select("n")
      e = e
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "leftsemi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "leftsemi")
        .select("u", "v")
        // each round's survivors are read 4+ times (next round's degree
        // count + both semi-join probes + two stat aggregates); without a
        // cache the lineage re-executes every prior round per read and
        // the plan cost goes exponential in the round count
        .persist()
      out = out.unionAll(stats(e, r))
    }
    out
  }
}
