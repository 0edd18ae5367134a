package graft.inc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change stream — the
  * incremental-model extension of the reference's high-watermark append
  * (SURVEY.md §2.8): instead of keeping only the latest row per key, every
  * change becomes a version row with a validity interval, so point-in-time
  * joins ("what was this attribute when the fact happened") stay exact.
  *
  * Pure keyed-window construction: one exchange on the dimension key, then
  * `row_number` (version), `lead` (valid_to), and a null test (is_current)
  * over the per-key sort. At 100 TB the exchange is the same shuffle any
  * keyed window pays; there is no state beyond the window sort, and a
  * bucketed-by-key layout removes even that exchange.
  */
object Scd2 {

  /** Versioned history: one row per change with
    * (version, valid_from, valid_to, is_current). `tieCol` makes the
    * per-key order total when `tsCol` alone has duplicates — version
    * assignment must be deterministic or replays renumber history.
    */
  def history(changes: DataFrame, keyCols: Seq[String], tsCol: String,
              tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
