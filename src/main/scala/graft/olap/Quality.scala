package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gate (Deequ-style constraint checking): named row-level
  * predicates evaluated in ONE aggregation pass over the table — each
  * check is a conditional count, all partial-aggregable, so the gate
  * costs one scan regardless of how many constraints it carries. The
  * wide one-row result unpivots to (check_name, n_violations) rows via
  * `stack` (no shuffle beyond the single agg).
  *
  * Table-level checks that need their own plan shape (referential
  * orphans = anti-join, duplicate keys = group-count) compose as extra
  * frames unioned onto the same output schema.
  */
object Quality {

  /** One row per check: (constraint, n_violations). */
  def violationCounts(df: DataFrame,
                      checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(pred, 1).otherwise(0)).cast("long").as(name)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${checks.size}, " +
      checks.map { case (name, _) => s"'$name', $name" }.mkString(", ") +
      ") as (check_name, n_violations)"
    one.select(expr(stackExpr))
  }

  /** Referential-integrity orphans: rows of `child` whose `childKey` has
    * no match in `parent.parentKey` (left-anti — the minimal plan).
    */
  def orphanCount(child: DataFrame, childKey: String, parent: DataFrame,
                  parentKey: String, name: String): DataFrame =
    child.join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"),
        col("n_violations").cast("long"))

  /** Uniqueness violations: rows beyond the first per key combination. */
  def duplicateCount(df: DataFrame, keys: Seq[String],
                     name: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).cast("long")
        .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))
}
