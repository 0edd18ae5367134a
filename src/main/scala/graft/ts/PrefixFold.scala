package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Linear one-pass engine for per-key recursive indicators — the SHIPPED
  * replacement for the quadratic
  * `collect_list(...).over(unboundedPreceding..currentRow)` + `aggregate`
  * prefix-fold idiom (each row of that form materializes its entire
  * history: O(n²) array cells per series, a scale-killer once a key holds
  * 10⁶ ticks instead of 10³ daily bars).
  *
  * Shape: co-locate each key with `repartition(keys)`, order within the
  * partition by (keys, order), then run the sequential recursion as ONE
  * `mapPartitions` carrying a single accumulator per key — O(n) time,
  * O(1) state, no per-row arrays, and the shuffle is the same keyed
  * exchange the window form needed anyway. This is the one legitimate
  * per-partition imperative case: an inherently sequential recurrence.
  *
  * Bitwise-identical to the declarative window form by construction — the
  * same seed and the same per-step IEEE/integer op chain in the same
  * order, just without the prefix arrays. The window forms remain in the
  * test suite as the cross-checked semantic definition (PrefixFoldSpec
  * pins shipped == declarative cell-for-cell), and the DuckDB oracles
  * still replay the identical fold via `list_reduce`/`aggregate`.
  *
  * Generalizes `Ema.withEmaOnePass` (single running double) to arbitrary
  * state: Holt's (level, trend) pair, KAMA's packed-long accumulator,
  * CUSUM's two one-sided statistics, the irregular-gap EWMA's
  * weight-carrying smoother.
  */
object PrefixFold {

  /** Adds `outFields` columns computed from a running per-key state.
    *
    * @param keyCols    series key — each key's rows are co-located and the
    *                   state resets on key change
    * @param orderCols  total order within a key (fold order)
    * @param init       state from the first row of a key
    * @param step       state transition for every subsequent row
    * @param emit       the appended column values for the CURRENT row
    *                   given the post-step state
    */
  def keyedFold[S](df: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[String], outFields: Seq[StructField])(
      init: Row => S, step: (S, Row) => S,
      emit: (S, Row) => Seq[Any]): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val outSchema = StructType(schema.fields ++ outFields)
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val sorted = df.repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val rows = sorted.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: Option[S] = None
      it.map { row =>
        val k = keyIdx.toIndexedSeq.map(row.get)
        if (k != curKey) { curKey = k; state = None }
        val next = state match {
          case None     => init(row)
          case Some(s0) => step(s0, row)
        }
        state = Some(next)
        Row.fromSeq(row.toSeq ++ emit(next, row))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
