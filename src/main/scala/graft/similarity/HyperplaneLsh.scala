package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VecOps

/** Random-hyperplane LSH for cosine similarity (the bucketed scale path
  * complementing IVF): vectors whose dot products with a fixed set of
  * pseudo-random ±1 hyperplanes share all sign bits land in the same
  * bucket; near-duplicate search then touches only same-bucket pairs.
  *
  * The hyperplanes are deterministic LCG-derived ±1 vectors (no RNG state,
  * no stored model): reruns, retried tasks, and the DuckDB oracle all see
  * identical planes — the oracle gets the same arrays inlined as literals.
  */
object HyperplaneLsh {

  /** ±1 hyperplane components, LCG-scrambled (plain parity of p,d would
    * make alternate planes identical).
    */
  def planeComponent(plane: Int, dim: Int): Float = {
    val seed = plane * 1000003L + dim * 7919L + 12345L
    val x = (seed * 1103515245L + 12345L) % 2147483647L
    if (((x >> 7) & 1L) == 0L) 1.0f else -1.0f
  }

  def planes(nPlanes: Int, dim: Int): Seq[Array[Float]] =
    (0 until nPlanes).map(p =>
      Array.tabulate(dim)(d => planeComponent(p, d)))

  /** Bucket id = sign-bit signature over the hyperplanes. One narrow
    * projection per vector; at scale the corpus is then repartitioned (or
    * bucketed at ingest) by this key, making near-dup search a per-bucket
    * local problem.
    */
  def buckets(vectors: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    withBuckets(vectors, nPlanes, dim).select("vec_id", "bucket")

  /** (vec_id, embedding, bucket) — the signature projection keeping the
    * vector alongside, for callers that verify candidates with the exact
    * metric (near-dup pairs, multi-probe search).
    */
  def withBuckets(vectors: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val sig = planes(nPlanes, dim).zipWithIndex.map { case (p, i) =>
      when(VecOps.dot(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    vectors.select(col("vec_id"), col("embedding"), sig.as("bucket"))
  }

  /** THE shared LSH candidate generation: every same-bucket ordered pair
    * (va ≠ vb) with its exact cosine attached — the one definition of
    * "candidates share a sign-bit bucket" that nearDupPairs, knnGraph
    * and the intrinsic-dimension estimator all build on, so the
    * bucketing/pruning convention cannot silently diverge between them.
    * Returns (bucket, va, vb, cosine).
    */
  def bucketPairs(vectors: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val b = withBuckets(vectors, nPlanes, dim)
    b.select(col("bucket"), col("vec_id").as("va"),
        col("embedding").as("ea"))
      .join(b.select(col("bucket"), col("vec_id").as("vb"),
        col("embedding").as("eb")), Seq("bucket"))
      .filter(col("va") =!= col("vb"))
      .withColumn("cosine", VecOps.cosine(col("ea"), col("eb")))
      .select("bucket", "va", "vb", "cosine")
  }

  /** Prune-then-verify near-dup search: candidate pairs share a bucket
    * (the shuffle is the bucket self-join, not an O(n²) cross), then exact
    * cosine verifies. Recall trades against `nPlanes` (more planes →
    * smaller buckets → cheaper + lower recall), the standard LSH dial.
    */
  def nearDupPairs(vectors: DataFrame, nPlanes: Int, dim: Int,
                   minCosine: Double): DataFrame =
    bucketPairs(vectors, nPlanes, dim)
      .filter(col("va") < col("vb"))
      .filter(col("cosine") >= minCosine)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"), col("cosine"))

  /** Mutual k-NN graph over the LSH buckets: each vector's top-k
    * same-bucket neighbors by (cosine desc, vec_id) — a keyed window over
    * bucket-local candidates, never the full cross — then an edge
    * survives only if BOTH endpoints rank each other (the mutual-kNN
    * criterion k-NN-graph clustering and dedup-canopy construction use).
    * Canonical (vec_a < vec_b) output with both ranks.
    */
  /** k-occurrence (hubness) census over the DIRECTED bucket-bounded kNN
    * lists: N_k(x) = how many other vectors list x among their top-k
    * same-bucket neighbors (cosine desc, vec_id tiebreak — the knnGraph
    * ranking stage before the mutual filter). High-dimensional corpora
    * grow hubs (N_k ≫ k) and antihubs (N_k = 0); the census is the
    * standard retrieval-quality diagnostic for both. Left join keeps the
    * antihubs explicit as n_k = 0.
    */
  def kOccurrence(vectors: DataFrame, nPlanes: Int, dim: Int,
                  k: Int): DataFrame = {
    val pairs = bucketPairs(vectors, nPlanes, dim)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("va").orderBy(col("cosine").desc, col("vb"))
    val occ = pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("vb").as("vec_id"))
      .agg(count(lit(1)).as("occ"))
    vectors.select("vec_id")
      .join(occ, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("occ"), lit(0L)).as("n_k"))
  }

  def knnGraph(vectors: DataFrame, nPlanes: Int, dim: Int,
               k: Int): DataFrame = {
    val pairs = bucketPairs(vectors, nPlanes, dim)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("va").orderBy(col("cosine").desc, col("vb"))
    val ranked = pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("va", "vb", "cosine", "rk")
    ranked.as("x").join(ranked.as("y"),
        col("x.va") === col("y.vb") && col("x.vb") === col("y.va"))
      .filter(col("x.va") < col("x.vb"))
      .select(col("x.va").as("vec_a"), col("x.vb").as("vec_b"),
        col("x.cosine").as("cosine"), col("x.rk").as("rank_ab"),
        col("y.rk").as("rank_ba"))
  }
}
