package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ts.Ohlc

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the north-star
  * extensions) is exposed as a `queries` entry `(spark, sfDir) => DataFrame`
  * with a DuckDB-equivalent `oracleSql`. Column names are lowercase
  * snake_case on both sides (the driver's compare sorts columns by name);
  * every query imposes a deterministic total row order on both sides; and
  * double aggregates go through exact decimal sums cast back to double so
  * results are bitwise-reproducible regardless of partitioning/accumulation
  * order (see graft.ts.Ohlc.withSma doc).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.1): tick stream → daily OHLC bars for a
    * price series and an FX series → inner join on date → price in second
    * currency, banker's-rounded → trailing SMAs. Driver smoke-checks rows>0
    * on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    flagship(spark, "/root/testdata/sf0.001")

  private def flagship(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val price = Ohlc.dailyBars(ev.filter(col("event_type") === "purchase"))
    val fx = Ohlc.dailyBars(ev.filter(col("event_type") === "view"))
    val derived = Ohlc.ccyDerive(price, fx)
    val s5 = Ohlc.withSma(derived, 5, Nil, "date", "close_price_ccy")
    Ohlc.withSma(s5, 20, Nil, "date", "close_price_ccy")
      .select("date", "close_price_usd", "close_rate", "close_price_ccy",
              "sma_5", "sma_20")
      .orderBy("date")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.7 group-by resample (row "group-by aggregation"): tick stream →
    // daily OHLCV bars per series. Covers S3 scan, P1 projection, R3/R4
    // casts (ts → date), O1 sort.
    "ts_ohlc_resample" -> ((s, dir) =>
      Ohlc.dailyBars(Tables.events(s, dir))
        .orderBy("event_type", "date")),

    // §2.4 J1 + §2.5 F1/F2 + §2.2 R5: keyed inner join of two daily series,
    // rename, multiply, bround (half-even) — the reference's
    // prd_{sym}_price_{ccy} table (av_etl.py:186-195).
    "ts_ccy_join_derive" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Ohlc.ccyDerive(
          Ohlc.dailyBars(ev.filter(col("event_type") === "purchase")),
          Ohlc.dailyBars(ev.filter(col("event_type") === "view")))
        .select("date", "close_price_usd", "close_rate", "close_price_ccy")
        .orderBy("date")
    }),

    // §2.7 W1: NULL-gated exclusive trailing SMA (data_viz.py:100-109
    // semantics: avg of the n rows strictly before the current one, NULL
    // until n predecessors exist).
    "ts_sma" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      val bars = Ohlc.dailyBars(ev).select("date", "close")
      Ohlc.withSma(Ohlc.withSma(bars, 5), 20)
        .select("date", "close", "sma_5", "sma_20")
        .orderBy("date")
    }),

    // §2.1 S4 / §2.7 W2: high-watermark scalar probe — max(date) of the
    // sink (av_etl.py:12-19; ORDER BY date DESC LIMIT 1 ≡ max(date)).
    "wm_watermark_max" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .agg(max(to_date(col("l_shipdate"))).as("watermark"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "ts_ohlc_resample" ->
      """SELECT event_type, CAST(ts AS DATE) AS date,
         arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         arg_max(value, ts) AS close, count(*) AS volume
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "ts_ccy_join_derive" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
              f AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'view' GROUP BY 1)
         SELECT p.date AS date, p.close AS close_price_usd,
                f.close AS close_rate,
                round_even(CAST(p.close AS DECIMAL(18,2)) *
                           CAST(f.close AS DECIMAL(18,2)), 2) AS close_price_ccy
         FROM p JOIN f USING (date) ORDER BY date""",

    "ts_sma" ->
      """WITH b AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT date, close,
           CASE WHEN count(close) OVER w5 = 5
                THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER w5 AS DOUBLE) / 5
           END AS sma_5,
           CASE WHEN count(close) OVER w20 = 20
                THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER w20 AS DOUBLE) / 20
           END AS sma_20
         FROM b
         WINDOW w5 AS (ORDER BY date ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
                w20 AS (ORDER BY date ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
         ORDER BY date""",

    "wm_watermark_max" ->
      "SELECT max(CAST(l_shipdate AS DATE)) AS watermark FROM lineitem",
  )
}
