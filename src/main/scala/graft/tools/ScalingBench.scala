package graft.tools

import graft.{CacheRegistry, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scaling-curve runner (VERDICT r7 item 2): times the headline
  * scale-sensitive queries at each supplied SF directory and prints one
  * JSON line per (dir, query) with wall / process-CPU / GC seconds —
  * the raw material for SCALING.md. Single-run (not min-of-2): the
  * curve's signal is the SHAPE across SFs, and at the top SF a second
  * run doubles a multi-minute sweep for one significant digit.
  *
  * Usage:
  *   runMain graft.tools.ScalingBench <dir1,dir2,...> [q1,q2,...]
  * Defaults to the judge-named headline set.
  */
object ScalingBench {
  val defaultQueries: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_cc_canonical", "sim_ivf_probe_topk",
    "pack_sequences", "graph_pagerank", "graph_random_walk_visits",
    "stream_sessionize_stateful")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScalingBench <dir1,dir2,...> [queries]")
    val dirs = args(0).split(",").toSeq
    val queries =
      if (args.length > 1) args(1).split(",").toSeq else defaultQueries
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // same session posture as graft.Bench so the sf0.1 point of the
      // curve is comparable with the committed bench artifact
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.ui.enabled", "false")
      // bounded micro-batches over the multi-part scaled stream fixtures
      // (VERDICT r8 item 5): 4 files per trigger so the watermark
      // advances between batches and state evicts mid-run instead of the
      // whole scaled table landing as one batch. Single-file fixtures
      // are unaffected (1 file = 1 batch either way).
      .config("spark.graft.stream.maxFilesPerTrigger",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_MAXFILES", "4"))
      // streaming measured through a foreachBatch parquet sink instead
      // of format("memory") (VERDICT r9 item 5): the memory sink holds
      // the FULL emitted row set at the driver, which is what blocked
      // the sf10 sessionize point at the 8 GiB protocol — a harness
      // artifact, not state growth. Driver runs (Bench/Verify) never
      // set this conf and keep the memory sink.
      .config("spark.graft.stream.scalingSink",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_SINKDIR",
          "/tmp/graft_scaling_sink"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSec(): Double = {
      val t = osBean.getProcessCpuTime
      if (t < 0) 0.0 else t / 1e9
    }
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ >= 0).sum / 1e3
    }
    def f(d: Double): String = "%.3f".format(d)
    // one JIT warmup at the smallest dir so the first measured point
    // isn't paying classload for the whole engine
    for (q <- queries)
      try SparkEntry.queries(q)(spark, dirs.head)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scaling] warmup $q: ${e.getMessage}") }
    CacheRegistry.releaseAll()
    CacheRegistry.releasePinned()
    for (dir <- dirs; q <- queries) {
      val t0 = System.nanoTime(); val c0 = cpuSec(); val g0 = gcSec()
      val status =
        try {
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          "ok"
        } catch { case e: Throwable =>
          s"fail: ${e.getClass.getSimpleName}" }
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = cpuSec() - c0
      val dg = gcSec() - g0
      CacheRegistry.releaseAll()
      // localCheckpoint blocks (CC/pagerank rounds) are reclaimed by the
      // ASYNC ContextCleaner only after their RDDs are GC'd — without a
      // nudge, a multi-GB sf10 query inherits the previous query's stale
      // blocks and execution memory starves (measured: dedup_cc_canonical
      // OOM'd mid-sweep at sf10 yet passes in isolation). Outside the
      // timed region, same rationale as Bench's periodic GC.
      System.gc()
      println(s"""{"scaling":true,"dir":"$dir","query":"$q",""" +
        s""""wall":${f(dt)},"cpu":${f(dc)},"gc":${f(dg)},""" +
        s""""status":"$status"}""")
      if (q == queries.last) CacheRegistry.releasePinned()
    }
    spark.stop()
  }
}
