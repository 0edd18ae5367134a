package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (insert, delete,
  * substitute, transpose — transposed blocks may be edited again, unlike
  * the optimal-string-alignment restriction) as a codegen'd Catalyst
  * expression: Spark ships only plain `levenshtein`, and a lambda/UDF
  * formulation would interpret per pair.
  *
  * The Lowrance–Wagner dynamic program, O(|a|·|b|) time, O(|a|·|b|) ints:
  * `d[k][l] + (i-k-1) + 1 + (j-l-1)` is the transposition arc, with
  * `da`/`db` tracking the last row/column where each character matched.
  * Integer output, so cross-engine comparison is exact — the oracle is
  * DuckDB's built-in `damerau_levenshtein` (verified unrestricted:
  * dl("ca","abc") = 2, where OSA gives 3). Distances are computed over
  * CODE POINTS (not UTF-16 code units), matching DuckDB's semantics for
  * non-BMP input (emoji, rare CJK) — ADVICE r4.
  */
object DamerauLevenshtein {

  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    val inf = n + m
    d(0) = inf
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1)
      j = 1
      while (j <= m) {
        val bj = b(j - 1)
        val k = { val v = da.get(bj); if (v == null) 0 else v.intValue() }
        val l = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  def damerau_levenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshteinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein needs (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
