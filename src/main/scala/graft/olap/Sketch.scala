package graft.olap

import graft.CacheRegistry.QueryCached
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CharFold

/** Distributed cardinality sketching (north-star extension: estimating
  * distinct counts — dedup rates, vocabulary sizes, key cardinalities —
  * without a full distinct aggregation is a staple of large-corpus
  * pipelines).
  *
  * KMV (k-minimum-values) rather than HLL, deliberately: the estimator is
  * the k smallest distinct *portable* hash values plus one double division,
  * so the result is bitwise-reproducible in any engine (the DuckDB oracle
  * computes the identical number) — an HLL would tie the answer to one
  * library's register layout. Standard estimator: with h_(k) the k-th
  * smallest of n distinct hashes drawn uniformly from [0, M],
  * E[n] ≈ (k-1) · M / h_(k); relative error ~ 1/√k.
  *
  * Scale shape: the map side dedups (partial aggregate of the distinct) and
  * the k-smallest selection plans as TakeOrderedAndProject — per-partition
  * heaps of k rows, driver-side merge of p·k values; no global sort. At
  * extreme cardinalities a bounded k-min set per partition (typed
  * Aggregator) would replace the distinct's shuffle entirely; the
  * declarative form keeps the estimator oracle-checkable.
  */
object Sketch {

  final val HashSpace = 2147483647L // portable fold modulus (2^31 - 1)

  // Spread steps: the raw polynomial fold of SHORT strings (numeric
  // keys!) occupies only the low end of the space, which wrecks the
  // uniformity KMV's estimator and mod-100 bucketing assume. Affine maps
  // alone compose to affine (still lumpy mod small ranges), so the mix is
  // affine → SQUARE mod prime (non-linear) → affine. Exact integer
  // arithmetic throughout: every intermediate < 2^62 fits a BIGINT, so
  // the oracle reproduces the hash bit-for-bit.
  final val MixA = 1103515245L
  final val MixB = 12345L
  final val MixA2 = 69069L
  final val MixB2 = 362437L

  /** Portable uniform-ish hash of any column: the engine fold + spread.
    * Shared by the KMV sketch and deterministic hash-based
    * sampling/splitting (same reproducibility contract).
    */
  def spreadHash(c: Column): Column = {
    val h1 = (CharFold.char_fold_hash(c.cast("string"))
      * lit(MixA) + lit(MixB)) % lit(HashSpace)
    val h2 = (h1 * h1) % lit(HashSpace)
    (h2 * lit(MixA2) + lit(MixB2)) % lit(HashSpace)
  }

  /** One-row sketch summary of `c`'s distinct count: (k_actual, kth_hash,
    * est_distinct). When fewer than k distinct hashes exist the sketch IS
    * the exact distinct set, so the estimate degrades gracefully to the
    * exact count.
    */
  def kmvDistinct(df: DataFrame, c: Column, k: Int): DataFrame = {
    val hashes = df.select(spreadHash(c).as("hv")).distinct()
    val kmin = hashes.orderBy(col("hv").asc).limit(k)
    kmin.agg(kmvSummary(k).head, kmvSummary(k).tail: _*)
  }

  /** The KMV estimator columns over a frame of sketch hashes. */
  private def kmvSummary(k: Int): Seq[Column] = {
    val cnt = count(lit(1))
    Seq(
      cnt.cast("long").as("k_actual"),
      max(col("hv")).as("kth_hash"),
      when(cnt < k, cnt.cast("double"))
        .otherwise((cnt - 1).cast("double") * lit(HashSpace.toDouble)
          / max(col("hv")).cast("double"))
        .as("est_distinct"))
  }

  /** Per-group KMV sketches PLUS their merged union — the property that
    * makes sketches a distributed primitive: the union estimate is computed
    * only from the per-group sketch rows (union the hash sets, re-take the
    * k smallest), never re-touching the raw data. That is exactly how a
    * 1000-executor job combines per-partition sketches, and how
    * day-level sketches roll up to month-level without a rescan.
    *
    * One scan of `df`: the per-group k-min frame (≤ groups·k rows) is
    * persisted and both the per-group summaries and the merged union read
    * it. Per-group k-min is a keyed window rank — the hashes frame is
    * already one row per distinct (group, hash) after the map-side-partial
    * distinct.
    */
  def kmvGroupsWithUnion(df: DataFrame, grpCol: Column, c: Column,
                         k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("scope")).orderBy(col("hv").asc)
    val sketches = df
      .select(grpCol.cast("string").as("scope"), spreadHash(c).as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("scope", "hv")
      .tracked // registered: released by Bench/Verify post-materialization
    val perGroup = sketches.groupBy("scope").agg(kmvSummary(k).head,
      kmvSummary(k).tail: _*)
    // global k-min of the merged hash sets: sort+limit plans as
    // TakeOrderedAndProject (per-partition heaps), no window needed
    val union = sketches.select(col("hv")).distinct()
      .orderBy(col("hv").asc).limit(k)
      .agg(kmvSummary(k).head, kmvSummary(k).tail: _*)
      .select(lit("__union").as("scope"), col("k_actual"), col("kth_hash"),
        col("est_distinct"))
    perGroup.select(col("scope"), col("k_actual"), col("kth_hash"),
        col("est_distinct"))
      .unionByName(union)
  }

  /** Sketch-only Jaccard estimate between two key sets: J ≈ |{h ∈ M :
    * h ∈ S_A ∧ h ∈ S_B}| / |M| where M is the k smallest of S_A ∪ S_B —
    * the classic KMV set-similarity estimator. Touches only the two
    * sketches (≤ k rows each), never the raw sets; deterministic because
    * the underlying hash is the portable spread hash, so any engine
    * produces the identical estimate (not just one within tolerance).
    */
  def kmvJaccard(a: DataFrame, ca: Column, b: DataFrame, cb: Column,
                 k: Int): DataFrame = {
    def sketch(df: DataFrame, c: Column) =
      df.select(spreadHash(c).as("hv")).distinct()
        .orderBy(col("hv").asc).limit(k)
        .tracked // registered: released by Bench/Verify post-materialization
    val sa = sketch(a, ca)
    val sb = sketch(b, cb)
    val merged = sa.unionByName(sb).distinct().orderBy(col("hv").asc).limit(k)
    val inBoth = merged
      .join(sa, Seq("hv"), "leftsemi")
      .join(sb, Seq("hv"), "leftsemi")
    merged.agg(count(lit(1)).cast("long").as("k_merged"))
      .crossJoin(inBoth.agg(count(lit(1)).cast("long").as("n_both")))
      .withColumn("jaccard_est",
        col("n_both").cast("double") / col("k_merged").cast("double"))
  }

  /** Sketch-only set-DIFFERENCE estimate |A \ B| — completes the KMV set
    * algebra next to [[kmvGroupsWithUnion]] (union) and [[kmvJaccard]]
    * (intersection share): est(A\B) = est(A∪B) − est(B) by
    * inclusion–exclusion, computed from the two k-min sketches alone
    * (≤ k rows each; the raw sets are never re-touched — the same merge
    * contract shard sketches use). Deterministic because every estimate
    * is the portable-hash KMV estimator; the subtraction is one IEEE op.
    */
  def kmvDifference(a: DataFrame, ca: Column, b: DataFrame, cb: Column,
                    k: Int): DataFrame = {
    def sketch(df: DataFrame, c: Column) =
      df.select(spreadHash(c).as("hv")).distinct()
        .orderBy(col("hv").asc).limit(k)
        .tracked // registered: released by Bench/Verify post-materialization
    val sa = sketch(a, ca)
    val sb = sketch(b, cb)
    val merged = sa.unionByName(sb).distinct().orderBy(col("hv").asc)
      .limit(k)
    def est(df: DataFrame, name: String) =
      df.agg(kmvSummary(k).head, kmvSummary(k).tail: _*)
        .select(col("est_distinct").as(name))
    est(sa, "est_a").crossJoin(est(sb, "est_b"))
      .crossJoin(est(merged, "est_union"))
      .withColumn("est_a_minus_b", col("est_union") - col("est_b"))
  }

  // Count-min row mixers: depth-3, each row an affine remix of the spread
  // hash (a pairwise-independent-style family with exact BIGINT
  // arithmetic). Row 0 is the spread hash itself.
  final val CmsRows: Seq[(Long, Long)] =
    Seq((1L, 0L), (MixA2, MixB2), (MixA, MixB))

  /** Bucket index of `c` in count-min row `r` (width `w`). */
  def cmsBucket(c: Column, r: Int, w: Int): Column = {
    val (a, b) = CmsRows(r)
    ((spreadHash(c) * lit(a) + lit(b)) % lit(HashSpace)) % lit(w.toLong)
  }

  /** Count-min sketch of `c`'s frequency distribution: (row, bucket) →
    * counter. Counters are plain sums, so the sketch is insertion-order
    * independent (bitwise-deterministic), mergeable by addition (shard
    * sketches sum into the corpus sketch — spec-pinned), and the whole
    * build is one partial-aggregable groupBy over a d× map-side explode.
    * The result is d·w rows regardless of input size: broadcastable.
    */
  def cmsBuild(df: DataFrame, c: Column, w: Int): DataFrame =
    df.select(posexplode(array(CmsRows.indices.map(r =>
        cmsBucket(c, r, w)): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("counter"))

  /** Point-estimate lookups: for each distinct value of `c` in `items`,
    * the count-min estimate min over rows of counter(r, bucket_r(v)) —
    * never an underestimate (spec-pinned). The sketch side is tiny by
    * construction, so the lookup join broadcasts: the probe is map-side.
    */
  def cmsEstimate(items: DataFrame, c: Column, cms: DataFrame,
                  w: Int): DataFrame =
    items.select(c.as("item")).distinct()
      .select(col("item"), posexplode(array(CmsRows.indices.map(r =>
        cmsBucket(col("item"), r, w)): _*)).as(Seq("r", "bucket")))
      .join(broadcast(cms), Seq("r", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("counter"), lit(0L))).as("est_n"))
}
