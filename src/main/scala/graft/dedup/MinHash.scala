package graft.dedup

import graft.CacheRegistry.QueryCached
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash + LSH near-duplicate detection (north-star extension):
  * shingle → minhash → band → bucket-join.
  *
  * Pipeline shape (the one that scales to 100 TB):
  *   1. per doc, one fused codegen pass computes the k-component minhash
  *      signature over word-3-shingle hashes (no shingle array materialized);
  *   2. band keys (r consecutive signature components folded) explode to
  *      (band, key) rows — the ONLY shuffle in the pipeline is the
  *      self-join on (band, key), i.e. candidates collide in buckets
  *      instead of an O(n²) cross join;
  *   3. candidate pairs are scored by signature agreement (estimated
  *      Jaccard) and thresholded.
  *
  * All hashing is the engine-portable polynomial fold (graft.functions
  * .CharFold) with LCG-derived (aᵢ, bᵢ) coefficients — exact integer
  * arithmetic reproducible in the DuckDB oracle; deliberately not
  * xxhash/murmur.
  */
object MinHash {
  final val P = 2147483647L
  final val DefaultK = 16
  final val DefaultBandSize = 4

  /** Deterministic per-component coefficients (classic LCG constants). */
  def coeffA(i: Int): Long = {
    val a = (1103515245L * (i + 1) + 12345L) % P
    if (a == 0L) 1L else a
  }
  def coeffB(i: Int): Long = (69069L * (i + 1) + 362437L) % P

  /** Tokenize ([a-z0-9]+ runs of lowercased text), hash tokens with the
    * portable fold, slide word-3-shingles, and keep per-component minima of
    * (aᵢ·x + bᵢ) mod P. Components stay P when the doc has <3 tokens
    * (no shingles) — callers filter those out before LSH.
    */
  def signature(s: UTF8String, k: Int): Array[Long] = {
    val sig = Array.fill(k)(P)
    val str = s.toString
    val n = str.length
    var h1 = -1L; var h2 = -1L
    var tok = 0L
    var inTok = false
    var i = 0
    while (i <= n) {
      var cp = -1
      if (i < n) {
        cp = str.codePointAt(i)
        if (cp >= 'A' && cp <= 'Z') cp += 32
      }
      val isTokChar = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (isTokChar) {
        tok = (tok * 31 + cp) % P
        inTok = true
      } else if (inTok) {
        if (h1 >= 0) {
          val sh = ((h1 * 31 + h2) * 31 + tok) % P
          var j = 0
          while (j < k) {
            val hv = (coeffA(j) * sh + coeffB(j)) % P
            if (hv < sig(j)) sig(j) = hv
            j += 1
          }
        }
        h1 = h2; h2 = tok
        tok = 0L; inTok = false
      }
      i += (if (cp < 0) 1 else Character.charCount(cp))
    }
    sig
  }

  def signatureData(s: UTF8String, k: Int): ArrayData =
    new GenericArrayData(signature(s, k))

  /** Band keys: fold r consecutive signature components per band. */
  def bandKeysData(s: UTF8String, k: Int, r: Int): ArrayData = {
    val sig = signature(s, k)
    val bands = Array.ofDim[Long](k / r)
    var b = 0
    while (b < bands.length) {
      var h = 0L
      var j = 0
      while (j < r) { h = (h * 31 + sig(b * r + j)) % P; j += 1 }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  def minhash_signature(text: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), k))

  def lsh_band_keys(text: Column, k: Int = DefaultK,
                    r: Int = DefaultBandSize): Column =
    ColumnBridge.column(LshBandKeysExpr(ColumnBridge.expression(text), k, r))

  /** Candidate near-duplicate pairs with estimated Jaccard (fraction of
    * agreeing signature components), thresholded. Input needs columns
    * (idCol, textCol).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = DefaultK, r: Int = DefaultBandSize,
                   minEstJaccard: Double = 0.2): DataFrame =
    candidatePairs(docs, idCol, textCol, k, r)
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (a, b) -> a = b), x -> x))")
          .cast("double") / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_a", "doc_b", "est_jaccard")

  /** LSH candidate pairs carrying BOTH signatures — the shared
    * generation stage behind [[nearDupPairs]] and the b-bit estimator
    * comparison (ONE definition of the banded join so estimator variants
    * can never disagree on candidates). Output:
    * (doc_a, doc_b, sig_a, sig_b), one row per pair.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = DefaultK, r: Int = DefaultBandSize)
      : DataFrame =
    pairsFromBuckets(bucketFrame(docs, idCol, textCol, k, r))

  /** The (doc_id, sig, band, key) LSH bucket frame — the shared base of
    * the candidate join, the bucket-size cap and the skew observability
    * query. Signature rides along through the explode so candidate pairs
    * already carry both signatures — no per-side rejoin back to the
    * corpus (the naive shape re-scans the corpus twice more and
    * recomputes minhash per rejoin; carrying k longs through the
    * (band,key) shuffle is far cheaper than extra scans at 100 TB).
    */
  def bucketFrame(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = DefaultK, r: Int = DefaultBandSize)
      : DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        minhash_signature(col(textCol), k).as("sig"),
        posexplode(lsh_band_keys(col(textCol), k, r)).as(Seq("band", "key")))
      // docs with <3 tokens have no shingles: every component is the
      // sentinel, which would spuriously bucket them all together
      .filter(element_at(col("sig"), 1) =!= lit(P))
      // materialize the bucket frame once: both sides of the self-join
      // read it from cache, so the corpus is scanned (and every signature
      // computed) exactly once — the single-job equivalent of
      // pre-materializing the signature table at real scale. Registered
      // with CacheRegistry (not a raw persist) so Bench/Verify release it
      // after the query materializes — two queries share candidatePairs
      // and a leaked cache per call is the accumulating-cache failure
      // mode the registry exists to prevent.
      .tracked

  private def pairsFromBuckets(buckets: DataFrame): DataFrame =
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      // dedupe multi-band collisions: one row per pair
      .groupBy("doc_a", "doc_b")
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))

  /** [[candidatePairs]] with the production skew guard: buckets larger
    * than `maxBucket` are dropped BEFORE the self-join. LSH banding keys
    * are hash substrings, so a templated/boilerplate-heavy corpus piles
    * into a few hot buckets and the candidate join goes quadratic in the
    * hot bucket — measured in this repo's scaling study (SCALING.md: a
    * constant per-replica salt token sent the CC pipeline 6.2 s → 303 s
    * at 10× data). Every production near-dup pipeline caps or drops hot
    * buckets (a bucket of 10⁶ members is boilerplate, not 10¹² useful
    * dup pairs); the cap trades bounded recall loss on exactly those
    * keys for a hard O(maxBucket²·n_buckets) candidate ceiling. The
    * bucket-size aggregate is partial-aggregable and joins back keyed —
    * two shuffles of the bucket frame, nothing corpus-quadratic.
    */
  def candidatePairsCapped(docs: DataFrame, idCol: String, textCol: String,
                           maxBucket: Int,
                           k: Int = DefaultK, r: Int = DefaultBandSize)
      : DataFrame = {
    val buckets = bucketFrame(docs, idCol, textCol, k, r)
    val sizes = buckets.groupBy("band", "key")
      .agg(count(lit(1)).as("bucket_sz"))
    val kept = buckets.join(sizes, Seq("band", "key"))
      .filter(col("bucket_sz") <= maxBucket)
      .select("doc_id", "sig", "band", "key")
      .tracked // both self-join sides read the capped frame once
    pairsFromBuckets(kept)
  }
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    MinHash.signatureData(s.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.dedup.MinHash.signatureData($s, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class LshBandKeysExpr(child: Expression, k: Int, r: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    MinHash.bandKeysData(s.asInstanceOf[UTF8String], k, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.dedup.MinHash.bandKeysData($s, $k, $r)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
