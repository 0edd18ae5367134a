package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics.
  *
  * Deciles are selected by integer rank positions over a keyed window —
  * no interpolation, so every returned value is a row that exists in the
  * data and compares bitwise across engines (interpolated quantiles would
  * re-open the float-arithmetic parity question for no analytical gain at
  * corpus scale). One exchange on the series key, like any keyed sort.
  */
object OrderStats {

  /** One row per (key, decile 1..9): the value at rank
    * `(n-1)·q/10 + 1` within the key's ordering by (valueCol, tieCol) —
    * tieCol must make the ordering total or the selected row is
    * partition-dependent.
    */
  def deciles(df: DataFrame, keyCols: Seq[String], valueCol: String,
              tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(valueCol).asc, col(tieCol).asc)
    df.select(keyCols.map(col) :+ col(tieCol) :+ col(valueCol): _*)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("decile", explode(expr(
        "filter(sequence(1, 9), q -> (cnt - 1) * q div 10 + 1 = rn)")))
      .select(keyCols.map(col)
        :+ col("decile").cast("long").as("decile") :+ col(valueCol): _*)
  }
}
