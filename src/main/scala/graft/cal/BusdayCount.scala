package graft.cal

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Business-day counting with a holiday calendar (SURVEY.md §2.5 F3/F4,
  * reference `av_etl.py:50-51,95,148-151`: `np.busday_count(start, end,
  * holidays)` — the count of Mon–Fri dates in [start, end) minus listed
  * holidays).
  *
  * Implemented as a native Catalyst `Expression` with codegen (not a Scala
  * UDF): the arithmetic is branch-light integer math on date epoch-days and
  * stays inside whole-stage codegen, with the holiday set referenced as a
  * sorted int array (binary-searchable, shipped once per task via the
  * codegen references array — effectively a broadcast of the calendar).
  */
object BusdayCount {

  /** Count of business days in [startDay, endDay) as epoch days.
    * weekday(d) = (d + 3) % 7 with Monday=0 (epoch day 0 = Thu 1970-01-01).
    * Mirrors np.busday_count exactly, including its reversed-range rule:
    * for end < start the result is -count over (end, start] (verified
    * against np.busday_count — the reversed interval flips which endpoint
    * is closed).
    */
  def count(startDay: Int, endDay: Int, holidays: Array[Int]): Int =
    if (endDay < startDay) -count(endDay + 1, startDay + 1, holidays)
    else weekdaysBefore(endDay) - weekdaysBefore(startDay) -
      weekdayHolidaysIn(startDay, endDay, holidays)

  /** Number of weekdays in [0, x) for x >= 0. */
  private def weekdaysBefore(x: Int): Int = {
    val full = x / 7 * 5
    var rem = 0
    var d = x / 7 * 7
    while (d < x) { if ((d + 3) % 7 < 5) rem += 1; d += 1 }
    full + rem
  }

  /** Holidays h in [s, e) that fall on weekdays (weekend holidays are
    * already excluded by the weekday count). `holidays` must be sorted.
    */
  private def weekdayHolidaysIn(s: Int, e: Int, holidays: Array[Int]): Int = {
    var lo = java.util.Arrays.binarySearch(holidays, s)
    if (lo < 0) lo = -lo - 1
    var n = 0
    var i = lo
    while (i < holidays.length && holidays(i) < e) {
      if ((holidays(i) + 3) % 7 < 5) n += 1
      i += 1
    }
    n
  }

  /** Fixed-date US holiday rule used by the engine's default calendar:
    * New Year's Day, Independence Day, Christmas, expanded over a year
    * range into explicit epoch-day values (the calendar is *data*, not a
    * library call — SURVEY.md §7.4 item 3).
    */
  def fixedDateHolidays(fromYear: Int, toYear: Int): Array[Int] =
    (fromYear to toYear).flatMap { y =>
      Seq(LocalDate.of(y, 1, 1), LocalDate.of(y, 7, 4), LocalDate.of(y, 12, 25))
    }.map(_.toEpochDay.toInt).sorted.toArray

  val defaultHolidays: Array[Int] = fixedDateHolidays(1990, 2035)

  /** Column API: busday_count(start, end) over the default calendar. */
  def busday_count(start: Column, end: Column): Column =
    busday_count(start, end, defaultHolidays)

  def busday_count(start: Column, end: Column, holidays: Array[Int]): Column =
    ColumnBridge.column(BusdayCountExpr(
      ColumnBridge.expression(start), ColumnBridge.expression(end), holidays))
}

/** `busday_count(start, end)`: DateType × DateType → IntegerType.
  * Codegen emits a static call so the expression participates in
  * whole-stage codegen (no per-row virtual dispatch).
  */
case class BusdayCountExpr(left: Expression, right: Expression,
                           holidays: Array[Int])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DateType && right.dataType == DateType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"busday_count needs (date, date), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "busday_count"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any, e: Any): Any =
    BusdayCount.count(s.asInstanceOf[Int], e.asInstanceOf[Int], holidays)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hol = ctx.addReferenceObj("holidays", holidays, "int[]")
    defineCodeGen(ctx, ev, (s, e) => s"graft.cal.BusdayCount.count($s, $e, $hol)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
