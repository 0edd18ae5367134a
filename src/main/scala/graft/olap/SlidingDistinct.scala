package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT sliding-window distinct-count per day — the operator behind
  * WAU/MAU-style rolling-reach metrics, which no engine offers natively
  * (COUNT(DISTINCT) OVER a RANGE frame is unsupported everywhere because
  * a naive implementation rescans the window's history per day).
  *
  * Re-expressed as the first-in-window difference array: for a key's
  * active day d with previous active day `prev`, that day is the key's
  * FIRST appearance inside exactly the windows ending e ∈
  * [max(d, prev + w), d + w − 1]. Emitting +1 at the range start and −1
  * past its end, then prefix-summing over the (bounded, dimension-sized)
  * day axis yields the exact distinct count for every window position.
  *
  * Cost shape at any scale: ONE (key, day) dedup shuffle + ONE keyed lag
  * window + a day-axis aggregation whose cardinality is the calendar,
  * not the data. Never a day×history rescan, never an explode-w
  * re-dedup. The day-axis cumulative runs on the deliberate
  * [[Exact.onePartition]] key (calendar-sized frame by construction).
  */
object SlidingDistinct {

  /** (day, n_distinct) for every calendar day between min and max of
    * `dayCol` (inclusive): the number of distinct `keyCol` values with at
    * least one row in the `windowDays`-day window ending that day.
    */
  def perDay(df: DataFrame, keyCol: Column, dayCol: Column,
             windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = df.select(keyCol.as("k"), dayCol.as("d")).distinct()
    val seg = ud.withColumn("prev",
      lag(col("d"), 1).over(Window.partitionBy("k").orderBy("d")))
    val delta = seg.select(
        when(col("prev").isNull, col("d"))
          .otherwise(greatest(col("d"), date_add(col("prev"), windowDays)))
          .as("e"), lit(1L).as("v"))
      .unionAll(seg.select(date_add(col("d"), windowDays).as("e"),
        lit(-1L).as("v")))
      .groupBy("e").agg(sum("v").as("dv"))
    val days = df
      .agg(min(dayCol).as("mn"), max(dayCol).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    days.join(delta, days("day") === delta("e"), "left")
      .select(col("day"), coalesce(col("dv"), lit(0L)).as("dv"))
      .withColumn("n_distinct", sum("dv").over(
        Window.partitionBy(Exact.onePartition(col("day"))).orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("day", "n_distinct")
  }
}
