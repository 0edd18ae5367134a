package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop plan inspector: print the executed plan of named queries,
  * with PresentSortRule toggled by SPARK_GRAFT_PRESENTSORT (same env
  * contract as Bench), so plan deltas from the rewrite are auditable.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_PRESENTSORT", "true") != "false")
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.PresentSortRule)
    for (name <- args(0).split(",")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
