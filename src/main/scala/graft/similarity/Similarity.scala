package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecOps

/** Approximate-nearest-neighbor building blocks over an embedding column
  * (north-star extension).
  *
  * Scale posture: brute-force is the correctness baseline — a broadcast of
  * the (small) query set against a full scan of the corpus, no shuffle
  * until the per-query top-k (window over query_id, which partitions
  * perfectly). The IVF path is the scale route: one pass assigns every
  * vector to its nearest coarse centroid (broadcast centroids); probing
  * then touches only the lists of the closest centroids instead of the
  * full corpus, cutting the scan by ~n_lists×.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector, by cosine. Ties broken by
    * vec_id so results are total-ordered and reproducible.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vec_id"),
                          col("embedding").as("emb_c"))
    val q = queries.select(col("vec_id").as("query_id"),
                           col("embedding").as("emb_q"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cosine", VecOps.cosine(col("emb_q"), col("emb_c")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** IVF coarse assignment: nearest centroid per vector (argmax cosine,
    * ties to the lower centroid id). Returns the inverted-list sizes —
    * the partitioning a probe would exploit.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
                             col("embedding").as("emb_cent"))
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(c))
      .withColumn("cosine", VecOps.cosine(col("embedding"), col("emb_cent")))
    // argmax as max_by, not a row_number window: partial-aggregable, so
    // the n_vectors×n_centroids scored rows combine map-side and only one
    // pre-reduced row per vector shuffles — a window would move them all.
    // Tie-break to the lower centroid id via the negated field.
    scored.groupBy(col("vec_id"))
      .agg(max_by(col("centroid_id"),
        struct(col("cosine"), (-col("centroid_id")).as("neg")))
        .as("centroid_id"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_assigned"))
  }

  /** IVF probe: approximate top-k — each query searches only the inverted
    * lists of its `nprobe` nearest centroids instead of the full corpus.
    * Both the assignment and the probe broadcast the centroid set; the one
    * shuffle is the probe⋈list join keyed on centroid_id, which is exactly
    * the inverted-list locality a vector store exploits (lists can be
    * pre-partitioned/bucketed by centroid at ingest, making the probe a
    * co-located join at 100 TB).
    */
  /** Corpus→nearest-centroid assignment frame (centroid_id, vec_id,
    * embedding): the max_by argmax (map-side partial agg, no window
    * shuffle of the scored cross product); the vector's embedding rides
    * in the max_by payload so no rejoin is needed. Shared by the IVF
    * probe and the k-means update step.
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
                             col("embedding").as("emb_cent"))
    corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(c))
      .withColumn("cosine", VecOps.cosine(col("embedding"), col("emb_cent")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("centroid_id"), col("embedding")),
        struct(col("cosine"), (-col("centroid_id")).as("neg"))).as("b"))
      .select(col("b.centroid_id").as("centroid_id"), col("vec_id"),
              col("b.embedding").as("embedding"))
  }

  /** One distributed Lloyd update: per-centroid, per-dimension mean of
    * the assigned vectors. The mean runs over exact integer micro-units
    * (round(v·10⁶) as long — order-independent sums, so the result is
    * bitwise-stable under any partitioning and reproducible in the
    * oracle) with one double division at the end. Long output shape
    * (centroid_id, dim, mean_val) — no float-array aggregation needed.
    */
  def kmeansUpdate(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignToCentroids(corpus, centroids)
      .select(col("centroid_id"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("centroid_id", "dim")
      .agg((sum(expr("CAST(round(CAST(v AS DOUBLE) * 1000000.0, 0) AS BIGINT)"))
        .cast("double") / (count(lit(1)) * lit(1000000.0))).as("mean_val"))

  def ivfProbeTopK(corpus: DataFrame, centroids: DataFrame,
                   queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
                             col("embedding").as("emb_cent"))
    val assigned = assignToCentroids(corpus, centroids)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("centroid_id").asc)
    val probes = queries.select(col("vec_id").as("query_id"),
                                col("embedding").as("emb_q"))
      .join(broadcast(c))
      .withColumn("cosine", VecOps.cosine(col("emb_q"), col("emb_cent")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("query_id", "centroid_id", "emb_q")
    val wTopK = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    probes.join(assigned, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VecOps.cosine(col("emb_q"), col("embedding")))
      .withColumn("rank", row_number().over(wTopK))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Splits a d-dim vector into `m` contiguous subspaces of `dsub` dims:
    * array of (sub_id, sub_vec) structs, explode-ready. slice is 1-based.
    */
  private def subspaces(v: org.apache.spark.sql.Column, m: Int, dsub: Int) =
    array((0 until m).map(s =>
      struct(lit(s).as("sub_id"),
             slice(v, s * dsub + 1, dsub).as("sub_vec"))): _*)

  /** Product-quantization codes: per vector, per subspace, the id of the
    * inner-product-nearest codeword (ties to the lower code id). One
    * explode (m rows per vector) + one broadcast join against the m·2^b
    * codebook + one partial-aggregable argmax — the join/agg cost does not
    * grow with m. Codewords here are subspace slices of designated corpus
    * vectors (deterministic; a production codebook comes from k-means per
    * subspace — `kmeansUpdate` is that training step).
    */
  def pqEncode(corpus: DataFrame, codewords: DataFrame,
               m: Int, dsub: Int): DataFrame = {
    val cb = codewords
      .select(col("vec_id").as("code_id"),
              explode(subspaces(col("embedding"), m, dsub)).as("c"))
      .select(col("code_id"), col("c.sub_id").as("sub_id"),
              col("c.sub_vec").as("code_vec"))
    corpus
      .select(col("vec_id"), explode(subspaces(col("embedding"), m, dsub))
        .as("x"))
      .select(col("vec_id"), col("x.sub_id").as("sub_id"),
              col("x.sub_vec").as("sub_vec"))
      .join(broadcast(cb), Seq("sub_id"))
      .withColumn("dot", VecOps.dot(col("sub_vec"), col("code_vec")))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(max_by(col("code_id"),
        struct(col("dot"), (-col("code_id")).as("neg"))).as("code_id"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query is scored
    * against every CODEWORD once (the m·2^b lookup table — broadcast), and
    * each corpus vector's estimated similarity is the sum of its m table
    * entries. The corpus embeddings are never touched at query time —
    * that is the point of PQ: the scan reads b·m bits per vector.
    *
    * Bitwise contract: each subspace contribution is selected (max over a
    * single-row group), then summed in fixed subspace order s0+s1+…, so
    * the estimate is one deterministic IEEE chain on both engines.
    */
  def pqAdcTopK(codes: DataFrame, codewords: DataFrame, queries: DataFrame,
                m: Int, dsub: Int, k: Int): DataFrame = {
    val cb = codewords
      .select(col("vec_id").as("code_id"),
              explode(subspaces(col("embedding"), m, dsub)).as("c"))
      .select(col("code_id"), col("c.sub_id").as("sub_id"),
              col("c.sub_vec").as("code_vec"))
    val lut = queries
      .select(col("vec_id").as("query_id"),
              explode(subspaces(col("embedding"), m, dsub)).as("x"))
      .select(col("query_id"), col("x.sub_id").as("sub_id"),
              col("x.sub_vec").as("sub_vec"))
      .join(cb, Seq("sub_id"))
      .withColumn("dot", VecOps.dot(col("sub_vec"), col("code_vec")))
      .select("query_id", "sub_id", "code_id", "dot")
    val subCols = (0 until m).map(s =>
      max(when(col("sub_id") === s, col("dot"))).as(s"s$s"))
    val est = codes.join(broadcast(lut), Seq("sub_id", "code_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(subCols.head, subCols.tail: _*)
      .withColumn("est_sim",
        (0 until m).map(s => col(s"s$s")).reduce(_ + _))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_sim").desc, col("vec_id").asc)
    est.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "est_sim")
  }

  /** IVF + PQ composite (the FAISS-style index shape): the coarse
    * quantizer prunes the corpus to the queries' `nprobe` inverted
    * lists, and ONLY those candidates are scored — by ADC over their PQ
    * codes, never their embeddings. At query time the corpus embeddings
    * are untouched end-to-end: the probe join carries (centroid_id,
    * vec_id) list entries and the scoring join carries b·m-bit codes,
    * which is the whole storage story of a 100 TB vector index (lists
    * bucketed by centroid at ingest → co-located probe join; codes
    * stored inline with the list entries → the scoring join below is a
    * read of the same partition, not a second shuffle). Codes here
    * quantize the raw vectors (IVF-Flat-PQ); residual encoding
    * (vector − centroid) is the production refinement and changes only
    * the encode step. Subspace contributions sum in fixed order s0+s1+…
    * (one deterministic IEEE chain, bitwise-portable).
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame,
                codewords: DataFrame, queries: DataFrame,
                nprobe: Int, m: Int, dsub: Int, k: Int): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
                             col("embedding").as("emb_cent"))
    val lists = assignToCentroids(corpus, centroids)
      .select("centroid_id", "vec_id")
    val codes = pqEncode(corpus, codewords, m, dsub)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("centroid_id").asc)
    val probes = queries.select(col("vec_id").as("query_id"),
                                col("embedding").as("emb_q"))
      .join(broadcast(c))
      .withColumn("cosine", VecOps.cosine(col("emb_q"), col("emb_cent")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("query_id", "centroid_id")
    val cand = probes.join(lists, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id")
    val cb = codewords
      .select(col("vec_id").as("code_id"),
              explode(subspaces(col("embedding"), m, dsub)).as("c"))
      .select(col("code_id"), col("c.sub_id").as("sub_id"),
              col("c.sub_vec").as("code_vec"))
    val lut = queries
      .select(col("vec_id").as("query_id"),
              explode(subspaces(col("embedding"), m, dsub)).as("x"))
      .select(col("query_id"), col("x.sub_id").as("sub_id"),
              col("x.sub_vec").as("sub_vec"))
      .join(cb, Seq("sub_id"))
      .withColumn("dot", VecOps.dot(col("sub_vec"), col("code_vec")))
      .select("query_id", "sub_id", "code_id", "dot")
    val subCols = (0 until m).map(s =>
      max(when(col("sub_id") === s, col("dot"))).as(s"s$s"))
    val est = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "sub_id", "code_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(subCols.head, subCols.tail: _*)
      .withColumn("est_sim",
        (0 until m).map(s => col(s"s$s")).reduce(_ + _))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_sim").desc, col("vec_id").asc)
    est.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "est_sim")
  }

  /** Embedding-cosine near-duplicate pairs over a bounded id range (the
    * exact-pairwise oracle path; LSH/IVF prunes the same computation at
    * scale).
    */
  def cosineNearDupPairs(vectors: DataFrame, maxId: Long,
                         minCosine: Double): DataFrame = {
    val a = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = vectors.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", VecOps.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= minCosine)
      .select("vec_a", "vec_b", "cosine")
  }
}
