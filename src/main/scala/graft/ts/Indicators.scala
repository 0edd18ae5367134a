package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.olap.Exact

/** Technical-analysis indicators over keyed daily-bar frames — the
  * derived-metrics family the reference's SMA report (data_viz.py:100-109)
  * belongs to, extended to the rest of the standard indicator set: running
  * peak / drawdown, VWAP, Bollinger bands, and RSI.
  *
  * Bitwise contract (same as Ohlc.withSma): every accumulation runs in
  * exact integer cents — sums of longs are associative, so results are
  * independent of partitioning and accumulation order — and each result
  * comes back to double through ONE fixed sequence of IEEE operations
  * (cast, divide, sqrt, multiply-add in a pinned order). sqrt is IEEE-754
  * correctly rounded, so even the Bollinger band width is bit-portable
  * across engines.
  *
  * Scale posture: all windows are keyed by the series columns — one
  * exchange on the series key, sort within partitions, rows-bounded frames
  * (running aggregates over bounded frames are O(1) per row in Spark's
  * WindowExec sliding-frame processor). Bars are one row per series·day,
  * so the window input is O(10^3) rows per series per decade regardless of
  * tick volume.
  */
object Indicators {

  private def keyed(partitionCols: Seq[String], orderCol: String) = {
    // empty = deliberate single series; key by a constant, non-foldable
    // expression (graft.olap.Exact.onePartition) so the plan stays a
    // partitioned WindowExec under Spark 4's EliminateWindowPartitions
    val keys =
      if (partitionCols.isEmpty) Seq(graft.olap.Exact.onePartition(col(orderCol)))
      else partitionCols.map(col)
    Window.partitionBy(keys: _*)
  }

  /** Running all-time peak and percent drawdown from it. peak is a
    * selection (window max), so it is exact; the drawdown is two IEEE ops
    * in fixed order: (close − peak)/peak·100.
    */
  def withDrawdown(bars: DataFrame, partitionCols: Seq[String],
                   orderCol: String = "date",
                   closeCol: String = "close"): DataFrame = {
    val w = keyed(partitionCols, orderCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = max(col(closeCol)).over(w)
    bars.withColumn("peak", peak)
      .withColumn("drawdown_pct",
        (col(closeCol) - col("peak")) / col("peak") * lit(100.0))
  }

  /** Volume-weighted average price per (series, bucket) from daily bars:
    * Σ(close·volume)/Σ(volume). Both sums run as exact longs (cents ×
    * share count), then one double division chain. Plain partial-aggregable
    * groupBy — the shuffle carries one row per (series, bucket).
    */
  def vwap(bars: DataFrame, bucket: Column, partitionCols: Seq[String],
           closeCol: String = "close", volumeCol: String = "volume"): DataFrame = {
    val keys = partitionCols.map(col) :+ bucket
    bars.groupBy(keys: _*)
      .agg(sum(Exact.cents(col(closeCol)) * col(volumeCol)).as("cv"),
           sum(col(volumeCol)).as("volume"))
      .withColumn("vwap",
        col("cv").cast("double") / col("volume").cast("double") / lit(100.0))
      .drop("cv")
  }

  /** Bollinger bands: n-row trailing (inclusive) mean ± k·population
    * stddev, NULL until the frame is full. The moment sums Σc and Σc² are
    * exact longs; variance numerator n·Σc² − (Σc)² is exact integer
    * arithmetic (Cauchy–Schwarz keeps it ≥ 0), and
    * sd = sqrt(double(num))/(n·100) is two correctly-rounded IEEE ops.
    */
  def withBollinger(bars: DataFrame, n: Int, k: Double,
                    partitionCols: Seq[String],
                    orderCol: String = "date",
                    closeCol: String = "close"): DataFrame = {
    val w = keyed(partitionCols, orderCol).orderBy(col(orderCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    val c = Exact.cents(col(closeCol))
    val cnt = count(c).over(w)
    val sc = sum(c).over(w)
    val sc2 = sum(c * c).over(w)
    val full = cnt === n
    val mid = sc.cast("double") / lit(n * 100.0)
    val sd = sqrt((lit(n.toLong) * sc2 - sc * sc).cast("double")) /
      lit(n * 100.0)
    bars
      .withColumn("bb_mid", when(full, mid))
      .withColumn("bb_sd", when(full, sd))
      .withColumn("bb_upper", when(full, mid + lit(k) * sd))
      .withColumn("bb_lower", when(full, mid - lit(k) * sd))
  }

  /** Cutler's RSI over an n-day trailing frame of close-to-close deltas:
    * rsi = 100·Σgain/(Σgain+Σloss). Deltas are exact cent differences;
    * the /n in avgGain/avgLoss cancels, leaving one multiply and one
    * divide in doubles. NULL until n deltas exist and when the frame is
    * flat (Σgain+Σloss = 0). The CASE-based gain/loss split (not
    * greatest/least) is deliberate: NULL comparison semantics of CASE are
    * identical across engines, while greatest(NULL, 0) is not.
    */
  def withRsi(bars: DataFrame, n: Int, partitionCols: Seq[String],
              orderCol: String = "date",
              closeCol: String = "close"): DataFrame = {
    val ord = keyed(partitionCols, orderCol).orderBy(col(orderCol))
    val w = ord.rowsBetween(-(n - 1), Window.currentRow)
    val c = Exact.cents(col(closeCol))
    val delta = c - lag(c, 1).over(ord)
    val gain = when(delta > lit(0L), delta).otherwise(lit(0L))
    val loss = when(delta < lit(0L), -delta).otherwise(lit(0L))
    val cnt = count(delta).over(w)
    val sg = sum(gain).over(w)
    val sl = sum(loss).over(w)
    bars.withColumn(s"rsi_$n",
      when(cnt === n && (sg + sl) =!= lit(0L),
        sg.cast("double") * lit(100.0) / (sg + sl).cast("double")))
  }
}
