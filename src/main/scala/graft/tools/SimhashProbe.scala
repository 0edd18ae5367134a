package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off dev probe for the simhash banding saturation study (round 9):
  * prints doc count, distinct simhash count, bucket-census candidate
  * mass at hash level vs doc level — the numbers that decide whether the
  * hash-group collapse is worth it on a given corpus.
  * Usage: runMain graft.tools.SimhashProbe <dir>
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, args(0))
    val sh = docs.select(col("doc_id"),
      graft.dedup.SimHash.simhash32(col("text")).as("sh")).cache()
    val nDocs = sh.count()
    val nHash = sh.select("sh").distinct().count()
    // doc-level vs hash-level bucket pair mass for the 2x16-bit banding
    def mass(df: org.apache.spark.sql.DataFrame): Long = {
      val b = df.select(col("sh"),
        explode(array(col("sh").bitwiseAND(lit(65535L)),
          shiftright(col("sh"), 16).bitwiseAND(lit(65535L)))).as("key"))
      b.groupBy("key").agg(count(lit(1)).as("s"))
        .select(expr("sum(s * (s - 1) div 2)").as("m"))
        .collect().head.getLong(0)
    }
    val mDoc = mass(sh)
    val mHash = mass(sh.select("sh").distinct())
    println(s"""{"dir":"${args(0)}","n_docs":$nDocs,"n_hashes":$nHash,""" +
      s""""pair_mass_doc":$mDoc,"pair_mass_hash":$mHash}""")
    spark.stop()
  }
}
