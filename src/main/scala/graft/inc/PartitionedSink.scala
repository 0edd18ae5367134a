package graft.inc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout (SURVEY.md §4: the reference's
  * compact-vs-full fetch becomes partition pruning once the sink is
  * date-partitioned).
  *
  * At 100 TB the partition column is the primary pruning axis: a watermark
  * predicate (`date > wm`) touches only the trailing partitions'
  * directories, so incremental runs read days, not history. Pair with
  * `Watermark.dedupAgainst` for idempotent incremental appends.
  */
object PartitionedSink {

  /** Write `df` partitioned by the year of `dateCol` (year granularity
    * keeps directory counts sane at fixture scale; production uses
    * year/month/day nesting the same way).
    */
  def writeYearPartitioned(df: DataFrame, dateCol: String,
                           path: String): Unit =
    df.withColumn("part_year", year(col(dateCol)))
      .write.partitionBy("part_year").mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
