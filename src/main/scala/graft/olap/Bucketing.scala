package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (the ingest-time answer to
  * the shuffle: two tables bucketed by their join key with the same bucket
  * count join with NO exchange — each task reads matching bucket files
  * from both sides).
  *
  * At 100 TB this turns the recurring fact⋈fact join from a full network
  * shuffle into local disk reads; the write-side cost is one sort per
  * bucket, paid once at ingest. The spec (ScaleSpec) pins the property:
  * bucketed join plan contains no ShuffleExchange.
  */
object Bucketing {

  /** `path=None` → managed table in the warehouse; pass an explicit path
    * for an external table (e.g. a per-run temp dir in tests — a managed
    * table's warehouse directory outlives the in-memory metastore, and a
    * fresh session then refuses the stale location).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
