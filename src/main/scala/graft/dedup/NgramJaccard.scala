package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact n-gram Jaccard over token-shingle hash sets, fused for the
  * pairwise hot path.
  *
  * `gram_hashes(text, n)` computes the SORTED DISTINCT set of n-gram hashes
  * (portable polynomial fold over token hashes) in one pass; `jaccard_sorted`
  * then intersects two sorted sets with a linear merge — no string arrays,
  * no interpreted array_intersect on the O(pairs) inner loop. Working over
  * hashes instead of gram strings is part of the operator's contract (the
  * DuckDB oracle computes the same hash sets), so the rare collision is a
  * semantic constant, not an engine divergence.
  */
object NgramJaccard {
  final val P = 2147483647L

  def gramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val hs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val window = new Array[Long](n)
    var filled = 0
    var tok = 0L
    var inTok = false
    var i = 0
    while (i <= len) {
      var cp = -1
      if (i < len) {
        cp = str.codePointAt(i)
        if (cp >= 'A' && cp <= 'Z') cp += 32
      }
      val isTokChar = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (isTokChar) {
        tok = (tok * 31 + cp) % P
        inTok = true
      } else if (inTok) {
        // slide the token-hash window, emit the gram hash once full
        var j = 0
        while (j < n - 1) { window(j) = window(j + 1); j += 1 }
        window(n - 1) = tok
        if (filled < n) filled += 1
        if (filled == n) {
          var g = 0L
          var m = 0
          while (m < n) { g = (g * 31 + window(m)) % P; m += 1 }
          hs += g
        }
        tok = 0L; inTok = false
      }
      i += (if (cp < 0) 1 else Character.charCount(cp))
    }
    val arr = hs.distinct.sorted.toArray
    new GenericArrayData(arr)
  }

  /** Jaccard of two sorted distinct long arrays by linear merge. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Intersection size of two sorted distinct long arrays, same linear
    * merge — the building block for asymmetric containment (|A∩B|/|A|),
    * where the fused form skips array_intersect's result allocation on
    * the O(pairs) inner loop.
    */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  def gram_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(GramHashesExpr(ColumnBridge.expression(text), n))

  def jaccard_sorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSortedExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def intersect_count_sorted(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCountSortedExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class GramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    NgramJaccard.gramHashes(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.dedup.NgramJaccard.gramHashes($s, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class IntersectCountSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count_sorted needs (array<long>, array<long>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.intersectCountSorted(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.dedup.NgramJaccard.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted needs (array<long>, array<long>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.dedup.NgramJaccard.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
