package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.plans.PresentSortRule's firing conditions: a root
  * presentation sort over a provably-small input becomes a
  * single-partition sort (no range exchange, no sampling job), a
  * large-by-stats input keeps its range exchange, interior sorts are
  * untouched, and the rewritten plan's output order is bitwise the
  * range-sorted order.
  */
class PresentSortSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("root sort over a small scan goes single-partition") {
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val p = planOf(df)
    assert(p.contains("SinglePartition"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("above the size gate the range exchange is kept") {
    val low = "spark.graft.presentSort.maxBytes"
    val prev = spark.conf.getOption(low)
    spark.conf.set(low, "1") // nothing is provably under 1 byte
    try {
      val df = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      val p = planOf(df)
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("REPARTITION_BY_NUM"), p)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(low, v)
        case None => spark.conf.unset(low)
      }
    }
  }

  test("interior sorts (window framing) are untouched") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val df = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
    // no root sort here at all — the rule must not touch the window's
    // required interior sort, and must not introduce an exchange
    val p = planOf(df)
    assert(!p.contains("REPARTITION_BY_NUM"), p)
  }

  test("rewritten output order is bitwise the range-sorted order") {
    val q = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum("n_chars").as("sc"))
      .orderBy(col("n").desc, col("source"))
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    // reference order computed on the driver from the same rows
    val want = got.sortBy { case (s, n, _) => (-n, s) }
    assert(got.toSeq == want.toSeq)
    assert(planOf(q).contains("SinglePartition"))
  }
}
