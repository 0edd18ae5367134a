package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join plan node (graft.plans.AsOfJoinExec): bitwise
  * equality with the composable union+window formulation, the physical
  * shape (merge node present, no window state), and the edge cases a
  * single-pass merge can get wrong (empty sides, keys with no match,
  * equal-time ties, null times).
  */
class AsOfExecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def sides = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    (purchases, views)
  }

  test("native exec is row-identical to the union+window formulation") {
    val (purchases, views) = sides
    val native = graft.plans.AsOfJoinPlan.asOf(purchases,
        views.select(col("user_id").as("r_user_id"),
          col("ts").as("asof_ts"), col("value").as("asof_value")),
        Seq("user_id"), Seq("r_user_id"), "ts", "asof_ts")
      .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
    val composed = graft.ts.AsOfJoin
      .asOf(purchases, views, Seq("user_id"), "ts", Seq("value"))
      .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
    assert(native.orderBy("event_id").collect().toSeq ==
      composed.orderBy("event_id").collect().toSeq)
  }

  test("plan contains the custom exec node and no window state") {
    val (purchases, views) = sides
    val plan = graft.plans.AsOfJoinPlan.asOf(purchases,
        views.select(col("user_id").as("r_user_id"),
          col("ts").as("asof_ts"), col("value").as("asof_value")),
        Seq("user_id"), Seq("r_user_id"), "ts", "asof_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("point-in-time SCD2 pick lands inside the validity interval") {
    val q = SparkEntry.queries("inc_scd2_pointintime")(spark, sfDir)
    assert(q.queryExecution.executedPlan.toString.contains("AsOfJoinExec"))
    val dim = graft.inc.Scd2.history(
        Tables.events(spark, sfDir)
          .filter(col("event_type") === "purchase" && col("user_id") < 50)
          .select("user_id", "event_id", "ts", "value"),
        keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id")
      .select("user_id", "version", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2), Option(r.getTimestamp(3))))
      .toMap
    val rows = q.collect()
    assert(rows.nonEmpty && rows.exists(!_.isNullAt(3)))
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val (user, ts) = (r.getLong(1), r.getTimestamp(2))
      val (from, to) = dim((user, r.getLong(3)))
      assert(!from.after(ts), s"version starts after fact: $r")
      to.foreach(t => assert(ts.before(t), s"fact past version end: $r"))
    }
  }

  test("edge cases: no match, tie on time, null right time, empty right") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L),
                   (4L, "c", 7L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 6L, 3.0),
                    ("d", 1L, 4.0))
      .toDF("rk", "rt", "rv")
    val out = graft.plans.AsOfJoinPlan
      .asOf(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 10L, 1.0),   // tie: rt == t matches (<= semantics)
      (2L, 15L, 2.0),   // latest of several
      (3L, null, null), // right exists but only later
      (4L, null, null)  // key with no right rows at all
    ))
    // null right time never matches; null left time matches nothing
    val rightNull = Seq(("a", Option.empty[Long], 9.0),
                        ("a", Some(10L), 1.0)).toDF("rk", "rt", "rv")
    val leftNull = Seq((1L, "a", Some(12L)), (2L, "a", Option.empty[Long]))
      .toDF("id", "k", "t")
    val out2 = graft.plans.AsOfJoinPlan
      .asOf(leftNull, rightNull, Seq("k"), Seq("rk"), "t", "rt")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(5)) null else r.getDouble(5)))
    assert(out2.toSeq == Seq((1L, 1.0), (2L, null)))
    // empty right side: all left rows pass through with nulls
    val outEmpty = graft.plans.AsOfJoinPlan
      .asOf(left, right.filter(lit(false)), Seq("k"), Seq("rk"), "t", "rt")
      .collect()
    assert(outEmpty.length == 4 && outEmpty.forall(_.isNullAt(4)))
  }
}
