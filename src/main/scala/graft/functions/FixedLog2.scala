package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic fixed-point log2 over positive integers: 20 fractional
  * bits, pure integer arithmetic, identical on every engine.
  *
  * Motivation: entropy / PMI / Theil-style statistics need real logarithms,
  * but libm `log` is NOT bitwise portable — a 200k-sample probe of DuckDB's
  * `ln` against Java's `Math.log` showed ~0.006% last-ulp divergence, which
  * is exactly the kind of silent cross-engine drift the exact-arithmetic
  * house rules exist to rule out (see graft.olap.Exact). Floor-log2 via
  * `length(bin(x))-1` (the trick text_surprisal_bits/text_zipf_spectrum
  * use) is portable but only integer-resolution.
  *
  * This expression closes the gap: log2fp(c) = the first 20 fractional bits
  * of log2(c) by mantissa repeated squaring — ilog2 from the bit length,
  * mantissa normalized to Q30, then 20 rounds of square-and-renormalize,
  * each emitting one bit. Every step is integer multiply/shift/compare, so
  * the result is one exact BIGINT on any engine: per-row values match
  * bitwise, and SUMS of them are order-free (partial-aggregable, no sorted-
  * list folds needed). The DuckDB oracle reproduces the identical
  * recurrence with a `list_reduce` fold (see [[FixedLog2.sql]]).
  *
  * Max absolute error vs true log2 is < 2^-20 + 2^-24 (quantization plus
  * the Q30 mantissa truncation for inputs above 2^31); the query semantics
  * are DEFINED as this lattice value, so both engines agree exactly.
  */
object FixedLog2 {
  final val FracBits = 20
  final val One: Long = 1L << FracBits // log2fp(2) == One

  /** Static hot-path helper the generated code calls directly.
    * Requires c > 0, ENFORCED: on c = 0 the unguarded recurrence would
    * return -2²⁰·1 here while the DuckDB mirror's length(bin(0))-1 seed
    * yields 0 — a silent bitwise cross-engine divergence, the exact
    * failure mode this expression exists to prevent. Counts are ≥ 1 by
    * construction in every current query; an unguarded zero (e.g. a
    * future coalesce(c, 0) grid cell) must fail loudly, not drift.
    */
  def log2fp(c: Long): Long = {
    if (c <= 0) throw new IllegalArgumentException(
      s"log2_fp requires a positive input, got $c")
    val il = 63 - java.lang.Long.numberOfLeadingZeros(c)
    // Q30 mantissa in [2^30, 2^31): squares stay under 2^62 (signed-safe)
    var u = if (il <= 30) c << (30 - il) else c >> (il - 30)
    var f = il.toLong
    var i = 0
    while (i < FracBits) {
      val v = u * u // Q60
      if (v >= (1L << 61)) { f = f * 2 + 1; u = v >> 31 }
      else { f = f * 2; u = v >> 30 }
      i += 1
    }
    f
  }

  def log2_fp(c: Column): Column =
    ColumnBridge.column(FixedLog2Expr(ColumnBridge.expression(c)))

  /** DuckDB SQL computing the identical recurrence for BIGINT expr `x`
    * (must be a simple positive column/expression — it is inlined three
    * times). list_reduce seeds with the prepended Q30 state and folds the
    * 20 square-and-renormalize rounds in index order; `.f` is the result.
    *
    * The fold body is deliberately BRANCH-FREE and field-order-pinned:
    * DuckDB 1.0's list_reduce updates a struct accumulator field-by-field
    * IN PLACE (a later field's expression observes earlier fields already
    * overwritten), and its vectorized CASE inside the lambda can select
    * the wrong branch's struct under batching (both measured here — a
    * u-state drifted to Q31 and overflowed INT64 on batch inputs that
    * passed row-at-a-time). So: the step extracts the bit arithmetically
    * (v>>61 ∈ {0,1}, renormalize via fixed shift + integer division), and
    * writes 'f' BEFORE 'u' so no field's RHS reads a field already
    * written — the fold then computes the identical sequence under both
    * in-place and snapshot lambda semantics, i.e. it stays correct when a
    * newer DuckDB fixes the aliasing.
    */
  def sql(x: String): String = {
    val il = s"(length(bin($x)) - 1)"
    s"""(list_reduce(list_prepend(
       |  {'f': CAST($il AS BIGINT),
       |   'u': CASE WHEN $il <= 30 THEN $x << (30 - $il)
       |             ELSE $x >> ($il - 30) END},
       |  list_transform(range(20),
       |    i -> {'f': CAST(0 AS BIGINT), 'u': CAST(0 AS BIGINT)})),
       |  (a, e) -> {'f': a.f * 2 + ((a.u * a.u) >> 61),
       |             'u': ((a.u * a.u) >> 30) // (1 + ((a.u * a.u) >> 61))})).f"""
      .stripMargin
  }
}

case class FixedLog2Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"log2_fp needs bigint, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "log2_fp"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(c: Any): Any =
    FixedLog2.log2fp(c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedLog2.log2fp($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
