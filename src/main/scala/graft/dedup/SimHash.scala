package graft.dedup

import graft.CacheRegistry.QueryCached
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash over token hashes (north-star dedup family).
  *
  * bit b of the result is set iff more token hashes have bit b set than
  * clear (strictly positive majority). Token hashes are the portable
  * polynomial fold, so the whole computation is reproducible in the DuckDB
  * oracle with integer arithmetic. Near-duplicates then surface as pairs
  * with small Hamming distance (bit_count(xor)).
  *
  * Fused single-pass codegen expression for the same reason as
  * DocFingerprint: per-token lambda formulations are interpreted and
  * 1-2 orders slower on the scan hot path.
  */
object SimHash {
  final val Bits = 32

  def simhash(s: UTF8String): Long = {
    val counts = new Array[Int](Bits)
    val str = s.toString
    val n = str.length
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
        tok = (tok * 31 + cp) % 2147483647L
        inTok = true
      } else if (inTok) {
        var b = 0
        while (b < Bits) {
          if (((tok >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        tok = 0L; inTok = false
      }
      i += (if (cp < 0) 1 else Character.charCount(cp))
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash32(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))

  /** Band-bucketed Hamming-ball search — the scale path for simhash
    * near-dup (the all-pairs form is ground truth on a bounded id range
    * only). Pigeonhole: a pair within Hamming distance d agrees exactly on
    * at least one of d+1 disjoint bit bands, so candidates collide in
    * (band, band_bits) buckets and only bucket-mates are verified with the
    * exact bit_count(xor) — same shape as MinHash LSH, no O(n²) pass.
    * `bands` must be >= maxHamming + 1 for 100% recall.
    */
  def bandedNearDupPairs(docs: DataFrame, idCol: String,
                         textCol: String, maxHamming: Int = 1,
                         bands: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(bands >= maxHamming + 1,
      s"need >= ${maxHamming + 1} bands for Hamming<=$maxHamming recall")
    val width = Bits / bands
    val mask = (1L << width) - 1L
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("key"))
    }
    // one scan: simhash computed once, banded frame persisted across the
    // self-join exactly like the MinHash bucket frame
    val banded = docs
      .select(col(idCol).as("doc_id"), simhash32(col(textCol)).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .tracked // registered: released by Bench/Verify post-materialization
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct() // multi-band collisions -> one candidate per pair
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Hamming<=1 near-dup via bit-flip neighbor enumeration — the variant
    * to prefer when the corpus is templated: banding keys are substrings
    * of the hash, so boilerplate-heavy corpora concentrate in a few
    * (band, bits) buckets and the candidate set goes quadratic in the hot
    * bucket. Here the bucket key is the FULL 32-bit hash: each doc emits
    * its own hash (exact side) plus 32 single-bit flips (neighbor side);
    * a Hamming-0 pair collides exact↔exact, a Hamming-1 pair collides
    * exact↔neighbor exactly once under doc_a < doc_b. Candidate volume is
    * therefore bounded by the OUTPUT size, at the cost of a 33× key
    * blowup — linear, and the right trade at 100 TB.
    */
  def neighborNearDupPairs(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sh = docs
      .select(col(idCol).as("doc_id"), simhash32(col(textCol)).as("simhash"))
      .tracked // registered: released by Bench/Verify post-materialization
    val exact = sh.select(col("doc_id"), col("simhash"),
      col("simhash").as("key"))
    val flips = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until Bits).map(b =>
        col("simhash").bitwiseXOR(lit(1L << b))): _*)).as("key"))
    val h0 = exact.as("x").join(exact.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
    val h1 = exact.as("x").join(flips.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
    h0.unionByName(h1)
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
      .select("doc_a", "doc_b", "hamming")
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    SimHash.simhash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.dedup.SimHash.simhash($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
