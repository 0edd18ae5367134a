package graft.cal

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

/** NYSE trading-holiday calendar, generated from the exchange's published
  * rules (the reference takes this from `mcal.get_calendar('NYSE')
  * .holidays()`, av_etl.py:50-51,148-149 — here the rules themselves are
  * implemented so the calendar stays *data*: an explicit sorted epoch-day
  * array consumed by [[BusdayCount]] unchanged).
  *
  * Rules (modern era, valid for the 1990+ range this engine generates):
  *  - New Year's Day: Jan 1; Sunday→observed Monday; Saturday→NOT observed
  *    (the exchange does not close the preceding Dec 31).
  *  - Martin Luther King Jr. Day: 3rd Monday of January, since 1998.
  *  - Washington's Birthday: 3rd Monday of February.
  *  - Good Friday: 2 days before Easter Sunday (Gregorian computus).
  *  - Memorial Day: last Monday of May.
  *  - Juneteenth: June 19, since 2022; Sat→Fri / Sun→Mon observed.
  *  - Independence Day: July 4; Sat→Fri / Sun→Mon observed.
  *  - Labor Day: 1st Monday of September.
  *  - Thanksgiving: 4th Thursday of November.
  *  - Christmas: Dec 25; Sat→Fri / Sun→Mon observed.
  * Plus the ad-hoc full-day closures since 1990 (presidential mourning
  * days, September 11 2001, Hurricane Sandy) — future ad-hoc closures are
  * unknowable and would be appended as data, exactly like these.
  */
object NyseCalendar {

  /** Easter Sunday by the anonymous Gregorian computus. */
  def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = (h + l - 7 * m + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  private def nth(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate =
    LocalDate.of(year, month, 1)
      .`with`(TemporalAdjusters.dayOfWeekInMonth(n, dow))

  private def lastMondayOfMay(year: Int): LocalDate =
    LocalDate.of(year, 5, 31).`with`(TemporalAdjusters.lastInMonth(DayOfWeek.MONDAY))

  /** Sat→preceding Friday, Sun→following Monday (the exchange's observed
    * rule for fixed-date holidays other than New Year's).
    */
  private def satFriSunMon(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY => d.plusDays(1)
    case _ => d
  }

  /** New Year's observed rule: Sunday→Monday Jan 2; Saturday→no closure. */
  private def newYears(year: Int): Option[LocalDate] = {
    val d = LocalDate.of(year, 1, 1)
    d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => None
      case DayOfWeek.SUNDAY => Some(d.plusDays(1))
      case _ => Some(d)
    }
  }

  /** Weekday market closures outside the rule system, 1990–present:
    * Nixon / Reagan / Ford / G.H.W. Bush / Carter national days of
    * mourning, September 11 2001 (through the 14th), Hurricane Sandy.
    */
  val adHocClosures: Seq[LocalDate] = Seq(
    LocalDate.of(1994, 4, 27),
    LocalDate.of(2001, 9, 11), LocalDate.of(2001, 9, 12),
    LocalDate.of(2001, 9, 13), LocalDate.of(2001, 9, 14),
    LocalDate.of(2004, 6, 11),
    LocalDate.of(2007, 1, 2),
    LocalDate.of(2012, 10, 29), LocalDate.of(2012, 10, 30),
    LocalDate.of(2018, 12, 5),
    LocalDate.of(2025, 1, 9),
  )

  /** The rule-generated holiday dates for one year (observed dates). */
  def holidayDates(year: Int): Seq[LocalDate] = {
    val rules = Seq.newBuilder[LocalDate]
    newYears(year).foreach(rules += _)
    if (year >= 1998) rules += nth(year, 1, DayOfWeek.MONDAY, 3) // MLK
    rules += nth(year, 2, DayOfWeek.MONDAY, 3) // Washington's Birthday
    rules += easterSunday(year).minusDays(2) // Good Friday
    rules += lastMondayOfMay(year) // Memorial Day
    if (year >= 2022) rules += satFriSunMon(LocalDate.of(year, 6, 19))
    rules += satFriSunMon(LocalDate.of(year, 7, 4))
    rules += nth(year, 9, DayOfWeek.MONDAY, 1) // Labor Day
    rules += nth(year, 11, DayOfWeek.THURSDAY, 4) // Thanksgiving
    rules += satFriSunMon(LocalDate.of(year, 12, 25))
    rules.result() ++ adHocClosures.filter(_.getYear == year)
  }

  /** Sorted epoch-day array over a year range — the calendar shape
    * [[BusdayCount.busday_count]] consumes (binary-searched inside the
    * codegen expression, shipped once per task).
    */
  def holidays(fromYear: Int, toYear: Int): Array[Int] =
    (fromYear to toYear).flatMap(holidayDates)
      .map(_.toEpochDay.toInt).distinct.sorted.toArray

  /** Default span matches the engine's fixed-date default calendar. */
  val default: Array[Int] = holidays(1990, 2035)

  /** The default span as ISO date strings (oracle-side literal list). */
  def defaultDateLiterals: Seq[String] =
    default.map(d => LocalDate.ofEpochDay(d.toLong).toString).toSeq
}
