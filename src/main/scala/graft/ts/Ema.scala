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
  * path is [[withEmaOnePass]] — one `mapPartitions` fold over a
  * `repartition(key).sortWithinPartitions(key, ts)` layout, spec-pinned
  * bitwise-equal. The declarative form remains the oracle-checkable
  * default, expression-for-expression.
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

  /** The SCALE variant of [[withEma]]: one `mapPartitions` pass over a
    * `repartition(key).sortWithinPartitions(key, order)` layout. The
    * prefix-list window above is O(n²) in per-key series length (each row
    * materializes its whole history); this form carries one running double
    * per key and is O(n) with zero extra memory — the shape to run when a
    * key holds 10⁶ ticks instead of 10³ daily bars.
    *
    * Bitwise-identical to the declarative form by construction: the same
    * seed (first non-null value per key) and the same per-step IEEE chain
    * `acc·(1−α) + x·α` in the same order, just without materializing the
    * prefix. Null values are passed over exactly like `collect_list` skips
    * them: the row keeps the EMA of its non-null prefix (NULL before the
    * first value). `closeCol` must be DOUBLE (the bars' native type).
    */
  def withEmaOnePass(bars: DataFrame, alpha: Double,
                     partitionCols: Seq[String], orderCol: String = "date",
                     closeCol: String = "close"): DataFrame = {
    val spark = bars.sparkSession
    val schema = bars.schema
    val outSchema = schema.add(
      org.apache.spark.sql.types.StructField(
        "ema", org.apache.spark.sql.types.DoubleType, nullable = true))
    val keyIdx = partitionCols.map(schema.fieldIndex)
    val closeIdx = schema.fieldIndex(closeCol)
    // co-locate each key, order within it: all of a key's rows arrive at
    // one task in fold order, so the sequential recursion is local
    val sorted = bars.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ orderCol).map(col): _*)
    val rows = sorted.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var ema: java.lang.Double = null
      it.map { row =>
        val k = keyIdx.map(row.get)
        if (k != curKey) { curKey = k; ema = null }
        if (!row.isNullAt(closeIdx)) {
          val x = row.getDouble(closeIdx)
          ema = if (ema == null) x
                else ema * (1.0 - alpha) + x * alpha
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (ema: Any))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
