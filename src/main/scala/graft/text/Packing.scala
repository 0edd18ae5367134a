package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order into one token stream and chop it into fixed-length
  * training sequences, mapping every document to the sequence(s) it lands
  * in (a document spans two or more sequences when it straddles a
  * boundary). This is the batch "pack-and-chunk" step every pretraining
  * data pipeline runs after filtering/dedup.
  *
  * Scale posture: the only global state is a prefix sum of token counts in
  * document order. A single unpartitioned window would serialize 100 TB
  * through one task, so the prefix sum is two-level (the textbook
  * distributed scan):
  *   1. per-bucket running sums — window PARTITIONED by bucket (parallel);
  *   2. bucket offsets — running sum over the per-bucket totals, a frame
  *      with one row per bucket (O(#buckets), broadcast back).
  * Bucket = idCol div bucketSize, so bucket boundaries follow the sort key
  * and level 2 stays tiny by construction. Everything after the prefix sum
  * is per-row arithmetic + one explode — map-side, no shuffle.
  */
object Packing {

  /** Adds `<outCol>` = exclusive prefix sum of `valueCol` in `idCol` order
    * (i.e. the stream offset where this row's payload begins).
    */
  def withStreamOffset(df: DataFrame, idCol: String, valueCol: String,
                       outCol: String, bucketSize: Long): DataFrame = {
    val bucket = "__pack_bucket"
    val intra = "__pack_intra"
    val offset = "__pack_offset"
    val bucketed = df.withColumn(bucket, expr(s"$idCol div $bucketSize"))
    // level 1: running sum inside each bucket (parallel across buckets)
    val wIntra = Window.partitionBy(col(bucket)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIntra = bucketed.withColumn(intra,
      sum(col(valueCol)).over(wIntra))
    // level 2: exclusive running sum over per-bucket totals (#buckets rows).
    // The single partition is DELIBERATE (constant, non-foldable key — see
    // Exact.onePartition): this frame is O(#buckets) by construction, the
    // whole point of the two-level scan.
    val wBuckets = Window
      .partitionBy(graft.olap.Exact.onePartition(col(bucket)))
      .orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy(col(bucket))
      .agg(sum(col(valueCol)).as("__pack_total"))
      .withColumn(offset,
        sum(col("__pack_total")).over(wBuckets) - col("__pack_total"))
      .select(col(bucket), col(offset))
    withIntra.join(broadcast(offsets), bucket)
      .withColumn(outCol, col(offset) + col(intra) - col(valueCol))
      .drop(bucket, intra, offset)
  }

  /** Adds `<outCol>` = INCLUSIVE running sum of `valCol` over the total
    * order (valCol DESC, keyCol ASC) — the Pareto/ABC cumulative — via the
    * same two-level scan as [[withStreamOffset]], so the data-sized frame
    * never serializes through one window partition. The level-1 bucket is
    * `-(valCol div cellSize)`: a value-aligned coarsening that ascends as
    * valCol descends, so bucket order composes with the in-bucket
    * (valCol desc, keyCol) order into exactly the old single-window total
    * order — cum values are bit-identical. Equal values always share a
    * bucket (bucket is a function of valCol alone), so the tiebreak never
    * crosses buckets. Level 2 runs over O(distinct valCol cells) rows.
    */
  def withCumDesc(df: DataFrame, keyCol: String, valCol: String,
                  outCol: String, cellSize: Long = 1048576L): DataFrame = {
    val b = "__cum_bucket"
    val t = "__cum_total"
    val off = "__cum_offset"
    val bucketed = df.withColumn(b, expr(s"-($valCol div $cellSize)"))
    val wIntra = Window.partitionBy(col(b))
      .orderBy(col(valCol).desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // O(#cells) by construction — the deliberate small-frame single
    // partition, keyed non-foldably (see Exact.onePartition)
    val wB = Window.partitionBy(graft.olap.Exact.onePartition(col(b)))
      .orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy(col(b))
      .agg(sum(col(valCol)).as(t))
      .withColumn(off, sum(col(t)).over(wB) - col(t))
      .select(col(b), col(off))
    bucketed.join(broadcast(offsets), b)
      .withColumn(outCol, col(off) + sum(col(valCol)).over(wIntra))
      .drop(b, off)
  }

  /** Maps each document to the training sequences it occupies: explodes to
    * one row per (document, sequence) with the token overlap. Sequences are
    * `seqLen` tokens each, numbered from 0 over the concatenated stream.
    * Zero-token documents occupy no sequence and are dropped.
    *
    * Output: input columns + `tok_start`, `seq_id`, `n_overlap`.
    */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: String,
                    seqLen: Long, bucketSize: Long = 1000L): DataFrame = {
    val withStart =
      withStreamOffset(docs, idCol, nTokCol, "tok_start", bucketSize)
    withStart.filter(col(nTokCol) > 0)
      .withColumn("seq_id",
        explode(sequence(expr(s"tok_start div $seqLen"),
          expr(s"(tok_start + $nTokCol - 1) div $seqLen"))))
      .withColumn("n_overlap",
        least(col("tok_start") + col(nTokCol), (col("seq_id") + 1) * seqLen)
          - greatest(col("tok_start"), col("seq_id") * seqLen))
  }
}
