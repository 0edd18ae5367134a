package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization: consecutive events of a key belong to one
  * session while the gap stays under `gapSeconds`; a larger gap starts a
  * new session. The batch formulation is the classic lag + running-sum of
  * session-start flags — two keyed windows over one shuffle+sort (Catalyst
  * reuses the exchange and sort for both windows since they share
  * partitioning and ordering).
  */
object Sessionize {

  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_seq",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double")
          .as("sum_value"))
  }
}
