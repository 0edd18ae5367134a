package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * right.time <= left.time within the same key (SURVEY.md §2.4 — the
  * natural generalization of the reference's date equi-join J1: "join the
  * rate at or before date d").
  *
  * Implemented as the merge-style union + keyed ordered window, NOT as a
  * range join + groupBy: a range join materializes O(|L|·|R|) candidate
  * pairs per key before reducing, while the union form is one shuffle on
  * the key, one sort, one linear pass — the same asymptotics a native
  * sort-merge as-of operator would have, using only built-in operators
  * (Catalyst plans the window as a single exchange + sort).
  */
object AsOfJoin {

  /** @param left      probe side; columns preserved in the output
    * @param right     reference side: keyCols ++ (timeCol +: payloadCols)
    * @param keyCols   equi-join keys
    * @param timeCol   ordering column (same name both sides)
    * @param payloadCols right-side columns carried to the output as
    *                    `asof_<name>` (+ `asof_<timeCol>`); NULL when no
    *                    right row is at or before the left row's time
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           timeCol: String, payloadCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCols, timeCol, payloadCols, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * right.time >= left.time ("the next quote at or after t"). The mirror
    * traversal of the backward join: the same union + one keyed window,
    * ordered descending, so the linear-pass asymptotics are identical.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  timeCol: String, payloadCols: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCols, timeCol, payloadCols, forward = true)

  /** Nearest as-of (pandas `merge_asof(direction='nearest')`): the right
    * row with the smallest |right.time − left.time| per key; equidistant
    * ties resolve BACKWARD (the at-or-before row), matching pandas. One
    * union frame, two keyed window passes (the backward and forward
    * traversals share the shuffle), one comparison — not two separate
    * joins stitched by a second shuffle.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val sideCol = "__graft_is_left"
    val packCol = "__graft_asof_pack"
    val backCol = "__graft_asof_back"
    val fwdCol = "__graft_asof_fwd"
    val (l, r, carriedSrc) =
      packedSides(left, right, keyCols, timeCol, payloadCols,
        sideCol, packCol)
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col(sideCol).asc, col(packCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).desc, col(sideCol).asc, col(packCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn(backCol, last(col(packCol), ignoreNulls = true).over(wb))
      .withColumn(fwdCol, last(col(packCol), ignoreNulls = true).over(wf))
      .filter(col(sideCol) === 1)
    // exact µs distances; equidistant → backward, like pandas
    val backT = unix_micros(col(backCol).getField(timeCol))
    val fwdT = unix_micros(col(fwdCol).getField(timeCol))
    val t = unix_micros(col(timeCol))
    val chosen = when(col(backCol).isNull, col(fwdCol))
      .when(col(fwdCol).isNull, col(backCol))
      .when(t - backT <= fwdT - t, col(backCol))
      .otherwise(col(fwdCol))
    carriedSrc.foldLeft(filled.withColumn(packCol, chosen)) { (df, c) =>
        df.withColumn(s"asof_$c", col(packCol).getField(c))
      }
      .drop(sideCol, packCol, backCol, fwdCol)
  }

  /** Builds the packed union sides shared by every as-of variant: left
    * rows tagged side=1 with a NULL pack, right rows reduced to
    * (keys, pack) and reshaped to the left schema with side=0.
    */
  private def packedSides(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String], timeCol: String,
                          payloadCols: Seq[String], sideCol: String,
                          packCol: String)
      : (DataFrame, DataFrame, Seq[String]) = {
    val leftType = left.schema.map(f => f.name -> f.dataType).toMap
    val carriedSrc = timeCol +: payloadCols
    val packType = org.apache.spark.sql.types.StructType(
      carriedSrc.map(c => right.schema(c)))
    val l = left
      .withColumn(sideCol, lit(1))
      .withColumn(packCol, lit(null).cast(packType))
    val r0 = right.select(
      keyCols.map(col) :+
        struct(carriedSrc.map(col): _*).cast(packType).as(packCol): _*)
    val extraLeftCols = l.columns.filterNot(c =>
      keyCols.contains(c) || c == packCol || c == sideCol)
    val r = extraLeftCols.foldLeft(r0) { (df, c) =>
        df.withColumn(c, lit(null).cast(leftType(c)))
      }
      .withColumn(sideCol, lit(0))
      .withColumn(timeCol, col(packCol).getField(timeCol))
      .select(l.columns.map(col): _*)
    (l, r, carriedSrc)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], timeCol: String,
                       payloadCols: Seq[String],
                       forward: Boolean): DataFrame = {
    val sideCol = "__graft_is_left"
    val packCol = "__graft_asof_pack"
    // the carried right-side columns ride in ONE struct: the struct itself
    // is non-null for every right row, so last(ignoreNulls) always lands on
    // the latest right row — per-column last() would skip a latest row
    // whose payload value happens to be NULL and wrongly surface an older
    // one. (Also: one window function instead of N.)
    val (l, r, carriedSrc) =
      packedSides(left, right, keyCols, timeCol, payloadCols,
        sideCol, packCol)
    // order right rows before left rows at equal time, so equality
    // matches in both directions: ascending traversal gives `<=`
    // (latest at-or-before), descending gives `>=` (earliest at-or-after).
    // The packed struct is the final sort key: when several right rows
    // share (key, time), the winning payload is the lexicographically
    // greatest struct on every engine and partitioning, instead of
    // whichever row the shuffle happened to order last.
    val timeOrd = if (forward) col(timeCol).desc else col(timeCol).asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrd, col(sideCol).asc, col(packCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn(packCol, last(col(packCol), ignoreNulls = true).over(w))
    carriedSrc.foldLeft(filled.filter(col(sideCol) === 1)) { (df, c) =>
        df.withColumn(s"asof_$c", col(packCol).getField(c))
      }
      .drop(sideCol, packCol)
  }

  /** As-of join with a match tolerance (pandas `merge_asof(tolerance=…)`):
    * a latest-at-or-before match older than `toleranceSeconds` is treated
    * as no match — every carried `asof_*` column goes NULL. One post-pass
    * predicate over the asOf output; the join plan is unchanged.
    */
  def asOfWithTolerance(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String], timeCol: String,
                        payloadCols: Seq[String],
                        toleranceSeconds: Long): DataFrame = {
    val joined = asOf(left, right, keyCols, timeCol, payloadCols)
    val within = col(s"asof_$timeCol").isNotNull &&
      col(s"asof_$timeCol") >=
        col(timeCol) - expr(s"INTERVAL $toleranceSeconds SECOND")
    (timeCol +: payloadCols).foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(within, col(s"asof_$c")))
    }
  }
}
