package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval join: "events within [anchor+lower, anchor+upper) of
  * each anchor, per key".
  *
  * A naive range join plans as a nested loop (or an equi-join on the key
  * alone followed by a filter — which materializes every (anchor, event)
  * pair per key before filtering). The scalable formulation buckets time
  * into window-length slots: each event lands in exactly one bucket, each
  * anchor's window spans at most two, so the join is an equi-join on
  * (key, bucket) with a residual range predicate — candidate pairs shrink
  * from O(|A_k|·|E_k|) per key to only near-in-time ones, and the shuffle
  * is a plain hash exchange both sides.
  */
object RangeJoin {

  /** Count matching events per anchor row (left semantics: anchors with no
    * events in range keep count 0).
    *
    * @param anchors   (keyCols, anchorTs, idCol) — idCol must uniquely
    *                  identify an anchor row
    * @param events    (keyCols, eventTs)
    * @param lowerUs/upperUs window relative to the anchor timestamp,
    *                  microseconds, [lower, upper)
    */
  def countEventsWithin(anchors: DataFrame, events: DataFrame,
                        keyCols: Seq[String], idCol: String,
                        anchorTs: String, eventTs: String,
                        lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty window")
    val w = upperUs - lowerUs
    val aUs = unix_micros(col(anchorTs))
    val eUs = unix_micros(col(eventTs))
    val a = anchors
      .withColumn("__lo", aUs + lit(lowerUs))
      .withColumn("__hi", aUs + lit(upperUs))
      .withColumn("__bucket", explode(array_distinct(array(
        floorDivCol(col("__lo"), w), floorDivCol(col("__hi") - 1, w)))))
    val e = events
      .withColumn("__ets", eUs)
      .withColumn("__bucket", floorDivCol(eUs, w))
      .select((keyCols.map(col) :+ col("__bucket") :+ col("__ets")): _*)
    val joined = a.join(e,
      keyCols.map(k => a(k) === e(k)).reduce(_ && _)
        && a("__bucket") === e("__bucket")
        && col("__ets") >= col("__lo") && col("__ets") < col("__hi"),
      "left")
    joined.groupBy(col(idCol))
      .agg(count(col("__ets")).as("n_in_range"))
  }

  /** floorDiv as a Column: exact integer arithmetic — (c - c mod d) / d.
    * Operands are positive epoch-micros < 2^53, so the double division of
    * the exact multiple is exact.
    */
  private def floorDivCol(c: Column, divisor: Long): Column =
    ((c - pmod(c, lit(divisor))) / lit(divisor)).cast("long")
}
