package graft.dedup

import org.apache.spark.sql.Column
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
