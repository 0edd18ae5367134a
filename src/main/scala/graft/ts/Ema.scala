package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponential moving average over a keyed daily-bar frame — the recursive
  * indicator (ema_i = α·x_i + (1−α)·ema_{i−1}, seeded ema_0 = x_0) that the
  * reference's SMA report frame is the windowed cousin of.
  *
  * The recursion is inherently sequential per series, so it is expressed as
  * an ordered prefix fold: a running `collect_list` window feeds a single
  * `aggregate` whose lambda applies exactly `acc·(1−α) + x·α` in index
  * order. IEEE double ops are deterministic — only reassociation isn't —
  * so any engine folding the same order reproduces the doubles bitwise
  * (the DuckDB oracle uses `list_reduce` over the same running list).
  *
  * Scale posture: the fold runs on BAR rows (one per series·day — O(10³)
  * rows/decade regardless of tick volume), keyed by the series column, so
  * the window exchange partitions perfectly. The prefix-list form is
  * O(n²) in series length; for genuinely long per-key sequences the scale
  * path is one `mapPartitions` fold over a `repartition(key).sortWithin
  * Partitions(key, ts)` layout (same result, one pass) — the declarative
  * form is kept here because it is oracle-checkable expression-for-
  * expression.
  */
object Ema {

  /** Adds `ema` for `closeCol` per `partitionCols` series, ordered by
    * `orderCol`. `alpha` must be an exactly-representable double (0.25,
    * 0.5, …) so the oracle's literal parses to the identical bits.
    */
  def withEma(bars: DataFrame, alpha: Double, partitionCols: Seq[String],
              orderCol: String = "date",
              closeCol: String = "close"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lst: Column = collect_list(col(closeCol)).over(w)
    // seed = first element; fold the rest in order. slice length 0 (the
    // first row) returns the empty tail and aggregate yields the seed.
    val ema = aggregate(
      slice(lst, lit(2), greatest(size(lst) - 1, lit(0))),
      element_at(lst, 1),
      (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha))
    bars.withColumn("ema", ema)
  }
}
