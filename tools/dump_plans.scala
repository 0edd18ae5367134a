import java.io.PrintWriter
val out = new PrintWriter("/tmp/plans_raw.txt")
val sf = "/root/testdata/sf0.001"
for (q <- Seq("agg_pricing_summary", "join_region_revenue", "dedup_minhash_lsh",
              "sim_ivf_probe_topk", "ts_sma_multi_series", "sort_topk_newest",
              "asof_join_latest_view")) {
  out.println(s"========== $q ==========")
  out.println(graft.SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode).linesIterator.take(60).mkString("\n"))
}
out.close()
sys.exit(0)
