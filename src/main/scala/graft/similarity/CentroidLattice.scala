package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared centroid machinery for the clustering-QA metrics
  * (emb_silhouette_simplified, emb_davies_bouldin): per-label centroid
  * mean arrays and vector→centroid distances, all on the q=⌊x·2¹⁶⌋
  * integer lattice so per-dimension sums are exact and order-free and
  * the distance folds are bitwise-portable (index-order accumulation,
  * IEEE-exact division by the 2¹⁶ dyadic).
  *
  * One definition, two consumers: FixedLog2Spec pins the Davies–Bouldin
  * scatter EQUAL to the silhouette's intra-distance, and that invariant
  * should be structural — a lattice-scale change must hit both queries
  * or neither.
  */
object CentroidLattice {

  /** SQL fragment: the embedding column quantized to the q-lattice. */
  val qArraySql: String =
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 65536) AS BIGINT))"

  /** SQL fragment: squared euclidean distance between a q-lattice array
    * `qa` and a centroid mean array `c`, folded in index order.
    */
  def dist2Sql(qa: String, c: String): String =
    s"""aggregate(zip_with($qa, $c,
          (q, m) -> (CAST(q AS DOUBLE) / 65536.0D - m)
                    * (CAST(q AS DOUBLE) / 65536.0D - m)),
        CAST(0.0 AS DOUBLE), (a, x) -> a + x)"""

  /** Per-label centroid mean arrays: exact integer per-dimension sums on
    * the q-lattice, one deterministic double division per dimension,
    * assembled in index order. Output: (label LONG, c ARRAY<DOUBLE>).
    */
  def centroidArrays(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("label"), (col("p") + 1).as("i"),
        floor(col("x").cast("double") * lit(65536)).cast("long").as("q"))
      .groupBy("label", "i")
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(named_struct(" +
        "'i', i, 'm', CAST(sq AS DOUBLE) / CAST(n * 65536 AS DOUBLE)))), " +
        "x -> x.m)").as("c"))
}
