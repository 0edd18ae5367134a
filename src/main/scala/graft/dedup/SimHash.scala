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
    // HASH-GROUP COLLAPSE (round 9 — found by the sf10 scaling probe):
    // whether two docs are candidates depends ONLY on their hashes
    // (bucket membership is a function of the hash; so is Hamming), so
    // the banded self-join runs over the DISTINCT hashes and doc pairs
    // are re-expanded afterwards, output-bound. The doc-level join
    // saturates quadratically once the corpus outgrows the 2^16 key
    // space — measured at sf10 (500 k docs, 71 k distinct hashes):
    // candidate mass 14.0e9 doc pairs vs 105e6 hash pairs, a 134×
    // reduction (hot buckets collapse superlinearly because duplicate-
    // heavy corpora repeat whole hashes, not just band keys).
    val sh = docs
      .select(col(idCol).as("doc_id"), simhash32(col(textCol)).as("simhash"))
      .tracked // h0 self-join + both expansion joins read it
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("key"))
    }
    val banded = sh.select("simhash").distinct()
      .select(col("simhash"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("simhash"), col("bk.band").as("band"),
        col("bk.key").as("key"))
      .tracked // both sides of the hash-level self-join
    val candHash = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.simhash") < col("y.simhash"))
      .select(col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct() // multi-band collisions -> one candidate per hash pair
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
    // Hamming-0 pairs: every doc pair inside one hash group (same hash
    // ⇒ same buckets, trivially candidates). The self-join keys on the
    // full hash, so its volume IS the output volume.
    val h0 = sh.as("a").join(sh.as("b"),
        col("a.simhash") === col("b.simhash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))
    // cross-hash expansion: hash-keyed joins, volume = output volume.
    // (ha, hb) is unique per unordered doc pair, so no distinct needed;
    // least/greatest restores the doc_a < doc_b contract.
    val h1 = candHash
      .join(sh.select(col("simhash").as("ha"), col("doc_id").as("da")),
        "ha")
      .join(sh.select(col("simhash").as("hb"), col("doc_id").as("db")),
        "hb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    h0.unionByName(h1).select("doc_a", "doc_b", "hamming")
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
    // same hash-group collapse as the banded plan: candidacy and
    // Hamming are functions of the hash alone, so the 33× key blowup
    // rides the DISTINCT hashes (7× fewer at sf10) and doc pairs
    // re-expand output-bound
    val sh = docs
      .select(col(idCol).as("doc_id"), simhash32(col(textCol)).as("simhash"))
      .tracked // h0 self-join + both expansion joins read it
    val hs = sh.select("simhash").distinct()
      .tracked // exact + flips sides of the hash-level join
    val exact = hs.select(col("simhash"), col("simhash").as("key"))
    val flips = hs.select(col("simhash"),
      explode(array((0 until Bits).map(b =>
        col("simhash").bitwiseXOR(lit(1L << b))): _*)).as("key"))
    // each Hamming-1 hash pair collides exact↔neighbor in both
    // directions; the < keeps it once
    val candHash = exact.as("x").join(flips.as("y"),
        col("x.key") === col("y.key")
          && col("x.simhash") < col("y.simhash"))
      .select(col("x.simhash").as("ha"), col("y.simhash").as("hb"))
    val h0 = sh.as("a").join(sh.as("b"),
        col("a.simhash") === col("b.simhash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))
    val h1 = candHash
      .join(sh.select(col("simhash").as("ha"), col("doc_id").as("da")),
        "ha")
      .join(sh.select(col("simhash").as("hb"), col("doc_id").as("db")),
        "hb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        lit(1).cast("int").as("hamming"))
    h0.unionByName(h1).select("doc_a", "doc_b", "hamming")
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
