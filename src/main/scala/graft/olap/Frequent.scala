package graft.olap

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items summary, distributed as prune-then-verify.
  *
  * Per partition, the classic k−1 counter summary (Misra & Gries 1982):
  * count matches, decrement ALL counters when a new item arrives with the
  * table full. Guarantee per partition p: any item with local frequency
  * > n_p/k survives. By pigeonhole, an item with GLOBAL frequency > n/k
  * exceeds n_p/k in at least one partition, so the union of per-partition
  * candidate sets is a superset of the true heavy hitters — no exact
  * global pass over all distinct items is ever needed.
  *
  * The verify stage then counts ONLY the candidates exactly: a broadcast
  * semi-join (candidate set ≤ (k−1)·#partitions rows) followed by a
  * partial-aggregable groupBy, and the threshold test freq·k > n runs in
  * exact integer arithmetic. At 100 TB this is the standard two-pass
  * heavy-hitter shape: pass 1 streams each partition in O(k) memory,
  * pass 2 aggregates a filtered stream whose key cardinality is bounded
  * by the summary size, not the vocabulary.
  */
object Frequent {

  /** Union of per-partition Misra-Gries candidate sets (distinct). */
  def mgCandidates(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string").as("item"))
      .as[String]
      .mapPartitions { it =>
        val counters = mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          counters.get(x) match {
            case Some(c) => counters(x) = c + 1
            case None if counters.size < k - 1 => counters(x) = 1L
            case None =>
              val dead = mutable.ArrayBuffer.empty[String]
              counters.keysIterator.foreach { key =>
                val c = counters(key) - 1
                if (c == 0) dead += key else counters(key) = c
              }
              dead.foreach(counters.remove)
          }
        }
        counters.keysIterator
      }
      .toDF("item").distinct()
  }

  /** Exact heavy hitters (frequency > n/k) via MG prune + exact verify. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val cands = mgCandidates(items, itemCol, k)
    val verified = items.select(col(itemCol).cast("string").as("item"))
      .join(broadcast(cands), Seq("item"), "leftsemi")
      .groupBy("item").agg(count(lit(1)).as("freq"))
    val tot = items.agg(count(lit(1)).as("n_total"))
    verified.crossJoin(tot)
      .filter(col("freq") * lit(k.toLong) > col("n_total"))
      .select("item", "freq")
  }
}
