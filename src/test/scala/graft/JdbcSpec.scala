package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end JDBC coverage against embedded Apache Derby — a real SQL
  * database with a real JDBC driver that ships inside Spark's own jars, so
  * the reference's actual store shape (`av_etl.py:30-38,161-185`) is
  * executable in the zero-egress sandbox: round-trip write/read, keyed
  * idempotent append, watermark probe, and filter pushdown into the
  * database scan.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.sources.JdbcStore

  private val url = "jdbc:derby:memory:graftdb;create=true"
  // Derby maps Spark strings to CLOB, which is not comparable — pin the
  // key column to VARCHAR so pushed predicates work (the documented
  // writeOpts contract)
  private val symbolType = Map("createTableColumnTypes" -> "symbol VARCHAR(16)")

  private def bars(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("symbol", "d", "close")
      .withColumn("trade_date", to_date(col("d"))).drop("d")
      .select("symbol", "trade_date", "close")
  }

  test("round-trip: write, read back, values and schema survive") {
    val in = bars(Seq(("SPY", "2026-01-05", 470.25),
                      ("SPY", "2026-01-06", 471.00),
                      ("QQQ", "2026-01-05", 399.75)))
    JdbcStore.appendIdempotent(spark, in, url, "bars_rt",
      Seq("symbol", "trade_date"), symbolType)
    val back = JdbcStore.read(spark, url, "bars_rt")
    assert(back.columns.toSeq.map(_.toLowerCase) ==
      Seq("symbol", "trade_date", "close"))
    val got = back.orderBy("symbol", "trade_date").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    assert(got.toSeq == Seq(("QQQ", "2026-01-05", 399.75),
      ("SPY", "2026-01-05", 470.25), ("SPY", "2026-01-06", 471.0)))
  }

  test("idempotent append: replay adds nothing, new keys append") {
    val day1 = bars(Seq(("SPY", "2026-01-05", 470.25),
                        ("QQQ", "2026-01-05", 399.75)))
    val keys = Seq("symbol", "trade_date")
    JdbcStore.appendIdempotent(spark, day1, url, "bars_idem", keys,
      symbolType)
    // exact replay: the PK-reject contract — nothing duplicates
    JdbcStore.appendIdempotent(spark, day1, url, "bars_idem", keys,
      symbolType)
    assert(JdbcStore.read(spark, url, "bars_idem").count() == 2)
    // overlapping batch: only the genuinely new key lands
    val day2 = bars(Seq(("SPY", "2026-01-05", 999.99), // dupe key, dropped
                        ("SPY", "2026-01-06", 471.00)))
    JdbcStore.appendIdempotent(spark, day2, url, "bars_idem", keys,
      symbolType)
    val after = JdbcStore.read(spark, url, "bars_idem")
    assert(after.count() == 3)
    // the duplicate key kept its ORIGINAL payload (insert-wins, like PK)
    val spy5 = after.filter(col("symbol") === "SPY" &&
      col("trade_date") === lit("2026-01-05").cast("date")).collect()
    assert(spy5.length == 1 && spy5(0).getAs[Double]("close") == 470.25)
  }

  test("watermark probe and filter pushdown reach the database scan") {
    val in = bars(Seq(("SPY", "2026-01-05", 470.25),
                      ("SPY", "2026-01-06", 471.00),
                      ("SPY", "2026-01-07", 472.50)))
    JdbcStore.appendIdempotent(spark, in, url, "bars_wm",
      Seq("symbol", "trade_date"), symbolType)
    val wm = JdbcStore.highWatermark(spark, url, "bars_wm", "trade_date")
      .collect()(0).getDate(0).toString
    assert(wm == "2026-01-07")
    // incremental read: the date predicate must be pushed into the JDBC
    // scan (the database filters, Spark doesn't pull the full table)
    val inc = JdbcStore.read(spark, url, "bars_wm")
      .filter(col("trade_date") > lit("2026-01-05").cast("date"))
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"date filter not pushed to JDBC:\n$plan")
    assert(inc.count() == 2)
    // column pruning also reaches the scan: only the key column is read
    val probePlan = JdbcStore
      .highWatermark(spark, url, "bars_wm", "trade_date")
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("close"),
      s"watermark probe must not read payload columns:\n$probePlan")
  }
}
