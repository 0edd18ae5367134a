package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CalIncIngestSpec extends AnyFunSuite {
  import graft.cal.BusdayCount
  import graft.inc.Watermark
  import graft.ingest.AvJson
  lazy val spark = SparkTestSession.spark

  private def day(s: String): Int =
    java.time.LocalDate.parse(s).toEpochDay.toInt

  test("busday_count matches np.busday_count golden vectors") {
    val h = BusdayCount.defaultHolidays
    // golden values generated with np.busday_count against the same
    // fixed-date holiday expansion (1/1, 7/4, 12/25 over 1990-2035)
    val cases = Seq(
      ("1995-01-01", "1995-01-31", 21), // Jan 1 1995 is a Sunday
      ("1995-12-20", "1996-01-05", 10), // crosses Christmas + New Year
      ("2000-06-28", "2000-07-12", 9),  // crosses July 4 (a Tuesday)
      ("2001-08-01", "2001-08-01", 0),
      ("2001-08-06", "2001-08-13", 5),
      ("1999-12-31", "2000-01-04", 2))  // Jan 1 2000 is a Saturday
    cases.foreach { case (s, e, want) =>
      assert(BusdayCount.count(day(s), day(e), h) == want, s"$s..$e")
    }
    // np's reversed-range rule: -count over (end, start]
    assert(BusdayCount.count(day("1995-01-31"), day("1995-01-01"), h) == -22)
  }

  test("busday_count expression works through codegen on a DataFrame") {
    import spark.implicits._
    val df = Seq(("1995-12-20", "1996-01-05"), ("2001-08-06", "2001-08-13"))
      .toDF("s", "e")
      .select(to_date(col("s")).as("s"), to_date(col("e")).as("e"))
    val got = df.select(
      BusdayCount.busday_count(col("s"), col("e")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(10, 5))
  }

  test("idempotent append: running twice equals running once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val sink = s"$dir/sink"
    val batch1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val batch2 = Seq((2, "B"), (3, "c")).toDF("k", "v") // k=2 is a replay
    Watermark.appendIdempotent(spark, batch1, sink, Seq("k"))
    Watermark.appendIdempotent(spark, batch2, sink, Seq("k"))
    Watermark.appendIdempotent(spark, batch2, sink, Seq("k")) // replay all
    val got = spark.read.parquet(sink).orderBy("k").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(got(1).getString(1) == "b") // first write wins, replay rejected
  }

  test("newerThan keeps only rows strictly past the watermark") {
    import spark.implicits._
    val rows = Seq(1, 2, 3, 4, 5).toDF("k")
    val wm = rows.filter(col("k") <= 3).agg(max(col("k")).as("watermark"))
    val got = Watermark.newerThan(rows, wm, "k").collect().map(_.getInt(0))
    assert(got.sorted.toSeq == Seq(4, 5))
  }

  test("AvJson fixture parses to 8 typed bars, oldest first after sort") {
    val bars = AvJson.parseDailyBars(AvJson.equityFixtureDf(spark),
      "payload", "Time Series (Daily)", withVolume = true).orderBy("date")
    val got = bars.collect()
    assert(got.length == 8)
    assert(got.head.getAs[java.sql.Date]("date").toString == "2026-07-29")
    assert(got.head.getAs[Double]("open") == 460.00)
    assert(got.last.getAs[Long]("volume") == 71234567L)
    assert(bars.schema("date").dataType.typeName == "date")
  }

  test("FX-shaped payload (no volume) omits the volume column") {
    import spark.implicits._
    val fx = """{"Time Series FX (Daily)": {
      "2026-08-07": {"1. open": "3.9810", "2. high": "4.0125", "3. low": "3.9700", "4. close": "4.0050"}}}"""
    val df = AvJson.parseDailyBars(Seq(fx).toDF("payload"), "payload",
      "Time Series FX (Daily)", withVolume = false)
    assert(!df.columns.contains("volume"))
    assert(df.collect()(0).getAs[Double]("close") == 4.0050)
  }
}
