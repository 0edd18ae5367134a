package graft.olap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** HyperLogLog as a NATIVE Catalyst aggregate (Flajolet et al. 2007) —
  * the mergeable distinct-count sketch that scales where exact
  * count(DISTINCT) shuffles every key: 512 single-byte registers summarize
  * any number of rows, partial-aggregate map-side, and merge by bytewise
  * max (associative + commutative ⇒ partition-count invariant).
  *
  * Deliberately deterministic/engine-portable, like every graft sketch
  * (KMV, CMS — `Sketch.scala`): input is the engine's 31-bit spread hash,
  * `bucket = h mod 512`, `rho = 22 - bitlength(h div 512) + 1` (the
  * remaining hash is exactly 22 bits wide), and the raw estimator
  * `alpha·m²/Σ2^(-r_j)` is computed from the EXACT integer
  * `S = Σ 2^(32 - r_j)` (a BIGINT ≤ 512·2^32) with one int→double
  * conversion and one IEEE division — so a DuckDB oracle reproduces the
  * estimate bit-for-bit via `bin()`/`max`/`<<`. The small/large-range
  * corrections of the paper need `ln()`, which is NOT bit-portable across
  * libm builds; the engine emits the raw estimator plus the zero-register
  * count so callers can apply any correction policy (the oracle-gated
  * query carries the exact count alongside to make the error visible).
  *
  * Unlike Spark's built-in `approx_count_distinct` (xxhash64-based HLL++,
  * neither portable nor exposed as a reusable sketch), the register frame
  * is a first-class BINARY value: group sketches can be stored, shipped,
  * and re-merged later — the same contract as the KMV/CMS/histogram
  * sketches.
  */
object Hll {
  final val M = 512  // registers (p = 9)
  final val W = 22   // hash bits left after the bucket index: (2^31-1)/512
  final val K = 32   // S = Σ 2^(K - r_j); r_j ≤ W + 1 = 23 < K

  /** alpha_m · m² · 2^K in the same left-associated order as the oracle. */
  val AlphaNum: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    ((alpha * 512.0) * 512.0) * 4294967296.0
  }

  def rho(hv: Long): Int = {
    val w = hv / M
    if (w == 0) W + 1 else W - (63 - java.lang.Long.numberOfLeadingZeros(w))
  }

  def update(regs: Array[Byte], hv: Long): Unit = {
    val b = (hv % M).toInt
    val r = rho(hv)
    if (regs(b) < r) regs(b) = r.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (into(i) < from(i)) into(i) = from(i); i += 1 }
  }

  /** Raw HLL estimate from the registers — static helper the generated
    * code calls directly.
    */
  def estimate(regs: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < M) { s += 1L << (K - regs(i)); i += 1 }
    AlphaNum / s.toDouble
  }

  def zeroRegisters(regs: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < M) { if (regs(i) == 0) n += 1; i += 1 }
    n
  }

  // ---- Column API ----

  /** Aggregate a spread-hash column into the 512-byte register sketch. */
  def sketchAgg(hash: Column): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(hash)).toAggregateExpression())

  /** Merge a column of sketches into one (bytewise max). */
  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Raw distinct-count estimate of a sketch. */
  def estimate(sketch: Column): Column =
    ColumnBridge.column(HllEstimateExpr(ColumnBridge.expression(sketch)))

  /** Count of never-hit registers (the linear-counting input). */
  def zeroRegs(sketch: Column): Column =
    ColumnBridge.column(HllZeroRegsExpr(ColumnBridge.expression(sketch)))
}

private[olap] trait HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)
  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buffer, input); buffer
  }
  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** `hll_sketch(spread_hash)` → 512-byte register frame. */
case class HllSketchAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends HllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_sketch"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs the BIGINT spread hash, got ${child.dataType}")

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_merge(sketch)` — re-aggregate stored sketches (bytewise max). */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends HllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge needs a sketch (BINARY), got ${child.dataType}")

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.mergeInto(buffer, v.asInstanceOf[Array[Byte]])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_estimate(sketch)` → raw estimate (codegen'd scalar). */
case class HllEstimateExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_estimate needs a sketch (BINARY), got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    Hll.estimate(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.olap.Hll.estimate($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_zero_regs(sketch)` → count of empty registers. */
case class HllZeroRegsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_zero_regs needs a sketch (BINARY), got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_zero_regs"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    Hll.zeroRegisters(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.olap.Hll.zeroRegisters($s)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
