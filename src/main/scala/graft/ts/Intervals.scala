package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union (coverage): merge overlapping-or-touching [start, end)
  * intervals per key into maximal islands and measure total covered time.
  * The complement of gap sessionization: Sessionize groups POINTS by gap;
  * this merges SPANS by overlap — the running-max-end islands algorithm.
  *
  * All arithmetic is exact epoch-microsecond longs (unix_micros ↔ DuckDB
  * epoch_us), so coverage sums are order-independent and bitwise-portable.
  *
  * Scale posture: one exchange on the key; both windows share the same
  * partitioning+ordering so Catalyst reuses one sort; the island groupBy
  * is partial-aggregable. State per row is O(1) (running max / running
  * sum over an unbounded-preceding frame).
  */
object Intervals {

  /** Per-key islands: each input row becomes [tsCol, tsCol + spanSeconds);
    * output one row per merged island with its bounds (micros).
    */
  def islands(df: DataFrame, keyCol: String, tsCol: String,
              spanSeconds: Long): DataFrame = {
    val s = unix_micros(col(tsCol))
    val e = s + lit(spanSeconds * 1000000L)
    val base = df.select(col(keyCol), s.as("s"), e.as("e"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    // end-exclusive: touching intervals (s == prevMax) merge
    val isNew = when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L)
    base
      .withColumn("island",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("s")).as("island_start_us"),
           max(col("e")).as("island_end_us"))
  }

  /** Per-key coverage: island count and total covered microseconds. */
  def coverage(df: DataFrame, keyCol: String, tsCol: String,
               spanSeconds: Long): DataFrame =
    islands(df, keyCol, tsCol, spanSeconds)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
           sum(col("island_end_us") - col("island_start_us"))
             .as("covered_us"))
}
