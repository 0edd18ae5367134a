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

  test("dialect seam: recorded PostgreSQL behaviors and url routing") {
    import graft.sources.{DerbyDialect, PostgresDialect, SqlDialect}
    // identifier case folding: Postgres lower, Derby upper — the exact
    // reason one probe casing cannot serve both catalogs
    assert(PostgresDialect.foldIdentifier("Bars_RT") == "bars_rt")
    assert(DerbyDialect.foldIdentifier("Bars_RT") == "BARS_RT")
    // quoting preserves case and escapes embedded quotes (both dialects)
    assert(PostgresDialect.quote("""we"ird""") == "\"we\"\"ird\"")
    // the documented native insert-unless-exists form (Postgres >= 9.5)
    assert(PostgresDialect.insertIgnoreSql("bars",
        Seq("symbol", "trade_date", "close"),
        Seq("symbol", "trade_date")) ==
      Some("""INSERT INTO bars ("symbol", "trade_date", "close") """ +
        """VALUES (?, ?, ?) """ +
        """ON CONFLICT ("symbol", "trade_date") DO NOTHING"""))
    // Derby has none — the per-row PK-reject fallback must engage
    assert(DerbyDialect.insertIgnoreSql("bars", Seq("a"), Seq("a")).isEmpty)
    // NOT NULL DDL differs (the Spark writer creates nullable columns
    // and neither database accepts a PK over them)
    assert(PostgresDialect.setNotNullSql("bars", "symbol") ==
      """ALTER TABLE bars ALTER COLUMN "symbol" SET NOT NULL""")
    assert(DerbyDialect.setNotNullSql("bars", "symbol") ==
      """ALTER TABLE bars ALTER COLUMN "symbol" NOT NULL""")
    // unique_violation is the SQL-standard 23505 on BOTH databases
    assert(PostgresDialect.pkViolationStates == Set("23505"))
    assert(DerbyDialect.pkViolationStates == Set("23505"))
    assert(SqlDialect.forUrl("jdbc:postgresql://db/x") == PostgresDialect)
    assert(SqlDialect.forUrl(url) == DerbyDialect)
  }

  test("PK-reject upsert through the dialect seam (real constraint)") {
    import graft.sources.DerbyDialect
    val keys = Seq("symbol", "trade_date")
    val day1 = bars(Seq(("SPY", "2026-01-05", 470.25),
                        ("QQQ", "2026-01-05", 399.75)))
    // create via the Spark writer, then add the reference table's
    // composite PK so the DATABASE enforces uniqueness from here on
    JdbcStore.appendIdempotent(spark, day1, url, "bars_upsert", keys,
      symbolType)
    JdbcStore.ensurePrimaryKey(url, "bars_upsert", keys)
    // the raw duplicate really is rejected with the dialect's SQLSTATE —
    // executable proof the PK-violation mapping matches the database
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        "INSERT INTO bars_upsert VALUES (?, ?, ?)")
      st.setString(1, "SPY")
      st.setDate(2, java.sql.Date.valueOf("2026-01-05"))
      st.setDouble(3, 1.0)
      val e = intercept[java.sql.SQLException] { st.executeUpdate() }
      assert(DerbyDialect.isPkViolation(e), s"state=${e.getSQLState}")
    } finally conn.close()
    // distributed upsert: exact replay + one new key, per-row PK-reject
    // path (Derby has no native ON CONFLICT) — no read-before-write
    val day2 = bars(Seq(("SPY", "2026-01-05", 999.99), // dupe, rejected
                        ("SPY", "2026-01-06", 471.00)))
    JdbcStore.upsertByPartition(day1.unionAll(day2), url, "bars_upsert",
      keys)
    val after = JdbcStore.read(spark, url, "bars_upsert")
    assert(after.count() == 3)
    val spy5 = after.filter(col("symbol") === "SPY" &&
      col("trade_date") === lit("2026-01-05").cast("date")).collect()
    assert(spy5.length == 1 && spy5(0).getAs[Double]("close") == 470.25)
    // replaying the whole upsert is a no-op
    JdbcStore.upsertByPartition(day1.unionAll(day2), url, "bars_upsert",
      keys)
    assert(JdbcStore.read(spark, url, "bars_upsert").count() == 3)
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
