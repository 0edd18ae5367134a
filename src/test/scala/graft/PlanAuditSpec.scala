package graft

import org.scalatest.funsuite.AnyFunSuite

/** Prints executed plans for manual audit (run with testOnly ... -- -z audit). */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("audit plans") {
    for (q <- Seq("inc_idempotent_antijoin", "dedup_minhash_lsh",
                  "sim_bruteforce_topk", "asof_join_latest_view")) {
      println(s"========== $q ==========")
      println(SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        .toString.linesIterator.take(40).mkString("\n"))
    }
  }
}
