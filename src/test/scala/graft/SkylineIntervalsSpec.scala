package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.olap.Skyline
import graft.ts.Intervals

/** Pins the 2D skyline scan and interval-union islands against hand-built
  * dominance/overlap cases, including the edge semantics the sorted-scan
  * algorithms must get right: equal-cost domination, duplicate points,
  * end-exclusive touching intervals.
  */
class SkylineIntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pareto2d: dominated, tied and duplicate points resolve correctly") {
    import spark.implicits._
    val pts = Seq(
      // group g1: frontier is (5, 1.0), (3, 0.5); (4, 1.0) is dominated by
      // (5, 1.0) via equal cost + larger size; (3, 2.0) by (3, 0.5) via
      // the per-size min reduction; (2, 0.5) by (3, 0.5) equal cost.
      ("g1", 5, 1.0), ("g1", 4, 1.0), ("g1", 3, 0.5), ("g1", 3, 2.0),
      ("g1", 2, 0.5), ("g1", 2, 0.4),
      // duplicates collapse to one frontier point
      ("g2", 1, 9.0), ("g2", 1, 9.0)
    ).toDF("g", "size", "cost")
    val got = Skyline.pareto2d(pts, Seq("g"), "size", "cost")
      .orderBy("g", "size")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("g1", 2, 0.4), ("g1", 3, 0.5), ("g1", 5, 1.0), ("g2", 1, 9.0)))
    // frontier invariant: strictly increasing size => strictly increasing
    // cost within a group (a cheaper-or-equal larger point would dominate)
    got.toSeq.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._3 < b._3)
        case _         =>
      }
    }
  }

  test("islands: overlap merges, touching merges (end-exclusive), gap splits") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "2024-01-01 00:00:00"), // [0, 30)
      ("u1", "2024-01-01 00:10:00"), // overlaps -> same island
      ("u1", "2024-01-01 00:40:00"), // touches 00:10+30 = 00:40 -> merges
      ("u1", "2024-01-01 02:00:00"), // gap -> new island
      ("u2", "2024-01-01 00:00:00")
    ).toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val isl = Intervals.islands(ev, "user_id", "ts", 1800L)
      .orderBy("user_id", "island").collect()
    assert(isl.length == 3)
    val cov = Intervals.coverage(ev, "user_id", "ts", 1800L)
      .orderBy("user_id").collect()
    assert(cov(0).getAs[Long]("n_intervals") == 2L)
    // island 1: [00:00, 01:10) = 70 min; island 2: 30 min
    assert(cov(0).getAs[Long]("covered_us") == (70L + 30L) * 60 * 1000000)
    assert(cov(1).getAs[Long]("n_intervals") == 1L)
    assert(cov(1).getAs[Long]("covered_us") == 30L * 60 * 1000000)
  }
}
