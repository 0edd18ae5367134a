package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds: writes each named
  * query's `explain("formatted")` output to `<outDir>/<query>_<tag>.txt`
  * so before/after plan claims in OPTIMIZATION_r{N}.md are committed
  * artifacts (plans/r10/...), checkable without running Spark.
  *
  * The session mirrors graft.Bench exactly (shuffle partitions, AQE
  * posture, PresentSortRule) — the dumped plan is the plan the bench
  * times, not a default-config lookalike. With AQE on, this is the
  * initial plan (`AdaptiveSparkPlan isFinalPlan=false`): join strategies,
  * exchanges, pushed filters and read schemas are all decided here;
  * AQE's runtime re-optimization only coalesces/splits partitions and
  * can rewrite SMJ→BHJ at runtime, which the text notes where claimed.
  *
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> <tag> <q1,q2,...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: DumpPlans <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(sfDir, outDir, tag, qcsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.max(8, cpus.toInt / 4).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++=
      Seq(graft.plans.PresentSortRule)
    Files.createDirectories(Paths.get(outDir))
    import org.apache.spark.sql.functions.col
    // virtual entry: the walk query eagerly localCheckpoints each step,
    // which TRUNCATES lineage — the committed final plan would not show
    // the per-step join at all. This explains ONE un-checkpointed
    // node-partitioned-tier step (ceiling forced to 1) so the plan
    // evidence shows the actual per-step shape.
    def frame(q: String) = q match {
      case "walk_step_node_tier" =>
        sys.props("graft.walk.maxBroadcastRows") = "1"
        val seeds = graft.olap.GraphFrames.coPurchaseDegrees(spark, sfDir)
          .orderBy(col("d").desc, col("n")).limit(64)
          .select(col("n").cast("long").as("seed"),
            col("n").cast("long").as("node"))
        graft.olap.GraphFrames.walkStep(spark, sfDir, seeds, 1L)
      case _ => SparkEntry.queries(q)(spark, sfDir)
    }
    for (q <- qcsv.split(",").toSeq) {
      graft.CacheRegistry.setContext(q)
      val df = frame(q)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"), txt)
      graft.CacheRegistry.releaseAll()
      println(s"[plans] wrote $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
