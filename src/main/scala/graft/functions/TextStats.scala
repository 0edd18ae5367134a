package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document token statistics in ONE codegen'd pass.
  *
  * Returns struct(n_tokens, n_ws_tokens, n_subwords, sum_tok_len, n_chars,
  * n_punct, hits: array<long>) where hits(i) counts tokens contained in the
  * i-th word list (stopwords, per-language markers, …).
  *
  * Why fused: the composable formulation (regexp_extract_all + lambda
  * filters per stat) gets re-inlined by CollapseProject into every
  * consuming expression — the language-ID cascade alone re-tokenized each
  * row ~10×, benching 10s at sf0.1 vs sub-second fused. Semantics are
  * pinned to the composable form by the oracle queries, which still use
  * the regexp/list formulation in DuckDB.
  *
  * Token = maximal [a-z0-9]+ run of the lowercased text;
  * whitespace-token = maximal non-whitespace run; subwords = ceil(len/4)
  * per token; punct = chars outside [a-zA-Z0-9 ].
  */
object TextStats {

  val statsType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))

  def compute(s: UTF8String, lists: Array[java.util.HashSet[String]]): InternalRow = {
    val str = s.toString
    val n = str.length
    var nTokens = 0L; var nWs = 0L; var nSub = 0L; var sumLen = 0L
    var nChars = 0L; var nPunct = 0L
    val hits = new Array[Long](lists.length)
    val tok = new java.lang.StringBuilder(32)
    var inWs = false // inside a non-whitespace run
    var i = 0
    while (i <= n) {
      val cp = if (i < n) str.codePointAt(i) else -1
      val lower =
        if (cp >= 'A' && cp <= 'Z') cp + 32 else cp
      val isTokChar = (lower >= 'a' && lower <= 'z') ||
        (lower >= '0' && lower <= '9')
      val isSpace = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
        cp == '\f' || cp == 0x0b
      if (cp >= 0) {
        nChars += 1
        if (!(isTokChar || cp == ' ')) nPunct += 1
        if (!isSpace) { if (!inWs) { nWs += 1; inWs = true } }
        else inWs = false
      }
      if (isTokChar && cp >= 0) {
        tok.appendCodePoint(lower)
      } else if (tok.length > 0) {
        val t = tok.toString
        nTokens += 1
        sumLen += t.length
        nSub += (t.length + 3) / 4
        var j = 0
        while (j < lists.length) {
          if (lists(j).contains(t)) hits(j) += 1
          j += 1
        }
        tok.setLength(0)
      }
      i += (if (cp < 0) 1 else Character.charCount(cp))
    }
    new GenericInternalRow(Array[Any](nTokens, nWs, nSub, sumLen, nChars,
      nPunct, new GenericArrayData(hits)))
  }

  def toSets(lists: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    lists.map { l =>
      val s = new java.util.HashSet[String]()
      l.foreach(s.add)
      s
    }.toArray

  def text_stats(text: Column, wordLists: Seq[Seq[String]]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(text), wordLists))
}

case class TextStatsExpr(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats needs string, got ${child.dataType}")

  override def dataType: DataType = TextStats.statsType
  override def prettyName: String = "text_stats"
  override def nullIntolerant: Boolean = true

  @transient private lazy val sets = TextStats.toSets(wordLists)

  override protected def nullSafeEval(s: Any): Any =
    TextStats.compute(s.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextStats.compute($s, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
