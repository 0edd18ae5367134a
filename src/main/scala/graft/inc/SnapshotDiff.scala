package graft.inc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the audit step of every incremental pipeline:
  * given two per-key snapshots (e.g. yesterday's aggregate vs today's),
  * classify every key as added / removed / changed / unchanged. One
  * full-outer join on the key; with exact-integer snapshot values the
  * "changed" class is exact, never float-fuzzy.
  *
  * Scale shape: the join shuffles on the key like any equi-join (or stays
  * co-located under a bucketed snapshot layout); the classification is one
  * projection and the rollup one partial-aggregable sum per class.
  */
object SnapshotDiff {

  /** One-row (n_added, n_removed, n_changed, n_unchanged) summary.
    * `older`/`newer` must be one row per `keyCol` with the comparison
    * value in `valueCol`.
    */
  def classify(older: DataFrame, newer: DataFrame, keyCol: String,
               valueCol: String): DataFrame = {
    val o = older.select(col(keyCol).as("__k_old"),
      col(valueCol).as("__v_old"))
    val n = newer.select(col(keyCol).as("__k_new"),
      col(valueCol).as("__v_new"))
    o.join(n, col("__k_old") === col("__k_new"), "full_outer")
      .agg(
        sum(when(col("__k_old").isNull, 1).otherwise(0)).as("n_added"),
        sum(when(col("__k_new").isNull, 1).otherwise(0)).as("n_removed"),
        sum(when(col("__k_old").isNotNull && col("__k_new").isNotNull
                 && col("__v_old") =!= col("__v_new"), 1).otherwise(0))
          .as("n_changed"),
        sum(when(col("__k_old").isNotNull && col("__k_new").isNotNull
                 && col("__v_old") === col("__v_new"), 1).otherwise(0))
          .as("n_unchanged"))
  }
}
