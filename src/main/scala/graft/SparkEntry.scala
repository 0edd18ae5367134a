package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.cal.BusdayCount
import graft.inc.Watermark
import graft.ingest.AvJson
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
      Watermark.highWatermark(
        Tables.lineitem(s, dir).select(to_date(col("l_shipdate")).as("d")),
        "d")),

    // §2.8 I1 / §2.3 P2: missing-suffix incremental fetch — the reference's
    // positional tail(k) re-expressed as a key predicate over the watermark
    // (scales: pushes to row-group skipping on a date-partitioned sink).
    "inc_missing_suffix" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("ship_date", to_date(col("l_shipdate")))
      val wm = li.agg(date_sub(max(col("ship_date")), 90).as("watermark"))
      Watermark.newerThan(li, wm, "ship_date")
        .select("l_orderkey", "l_linenumber", "ship_date", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.8 I2: keyed idempotent append — incoming daily aggregates whose
    // key is absent from the sink (left-anti ≡ the PK-reject of
    // av_etl.py:34-38). Revenue summed in exact decimal, cast back.
    "inc_idempotent_antijoin" -> ((s, dir) => {
      val incoming = Tables.lineitem(s, dir)
        .groupBy(to_date(col("l_shipdate")).as("ship_date"))
        .agg(count(lit(1)).as("n_items"),
             sum(col("l_extendedprice").cast(DecimalType(18, 4)))
               .cast("double").as("revenue"))
      val existing = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("ship_date"))
      Watermark.dedupAgainst(incoming, existing, Seq("ship_date"))
        .orderBy("ship_date")
    }),

    // §2.6 O2: sort + limit-k (top-k newest) — planned as
    // TakeOrderedAndProject (distributed per-partition top-k + merge,
    // no global sort).
    "sort_topk_newest" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
                to_date(col("l_shipdate")).as("ship_date"),
                col("l_extendedprice"))
        .orderBy(col("ship_date").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .limit(100)),

    // §2.5 F3/F4: busday_count with holiday calendar — custom Catalyst
    // Expression with codegen (graft.cal.BusdayCountExpr).
    "cal_busday_count" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("start_date")).distinct()
        .withColumn("busdays", BusdayCount.busday_count(
          col("start_date"), date_add(col("start_date"), 30)))
        .orderBy("start_date")),

    // §2.5 F5 + §2.3 P3: weekday predicate + drop-newest-row filter (the
    // reference's still-forming-bar drop, av_etl.py:123-127).
    "cal_weekday_filter" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n_events"))
      val wm = daily.agg(max(col("date")).as("watermark"))
      daily.join(broadcast(wm), col("date") < col("watermark"))
        .drop("watermark")
        .withColumn("dow", (expr("weekday(date)") + 1).cast("long"))
        .filter(col("dow") <= 5)
        .select("date", "dow", "n_events")
        .orderBy("date")
    }),

    // §2.2 R1–R4: map-of-maps JSON ingest — the Alpha Vantage wire format
    // decoded via from_json + explode(map_entries), string→double/long/date
    // casts (av_etl.py:76-81 semantics, distributed).
    "ingest_av_json" -> ((s, dir) =>
      AvJson.parseDailyBars(AvJson.equityFixtureDf(s), "payload",
                            "Time Series (Daily)", withVolume = true)
        .orderBy("date")),

    // JSON field extraction over a data column (events.props) + group-agg;
    // long sums are exact integer arithmetic on both engines.
    "json_props_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")),
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

    "inc_missing_suffix" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
                l_quantity
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >
               (SELECT max(CAST(l_shipdate AS DATE)) - 90 FROM lineitem)
         ORDER BY l_orderkey, l_linenumber""",

    "inc_idempotent_antijoin" ->
      """SELECT CAST(l_shipdate AS DATE) AS ship_date, count(*) AS n_items,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                  AS revenue
         FROM lineitem
         GROUP BY 1
         HAVING NOT EXISTS (SELECT 1 FROM orders
                            WHERE CAST(o_orderdate AS DATE)
                                  = CAST(l_shipdate AS DATE))
         ORDER BY 1""",

    "sort_topk_newest" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
                l_extendedprice
         FROM lineitem
         ORDER BY ship_date DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",

    "cal_busday_count" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS start_date
                    FROM orders),
              g AS (SELECT start_date,
                           CAST(unnest(generate_series(start_date,
                                start_date + 29, INTERVAL 1 DAY)) AS DATE) AS day
                    FROM d)
         SELECT start_date,
                CAST(count(*) FILTER (WHERE isodow(day) <= 5 AND NOT (
                       (month(day) = 1  AND day(day) = 1) OR
                       (month(day) = 7  AND day(day) = 4) OR
                       (month(day) = 12 AND day(day) = 25))) AS INT) AS busdays
         FROM g GROUP BY 1 ORDER BY 1""",

    "cal_weekday_filter" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS date, count(*) AS n_events
                        FROM events GROUP BY 1)
         SELECT date, isodow(date) AS dow, n_events
         FROM daily
         WHERE date < (SELECT max(date) FROM daily) AND isodow(date) <= 5
         ORDER BY date""",

    "ingest_av_json" -> {
      val path = "'$.\"Time Series (Daily)\".\"' || d || '\""
      s"""WITH p AS (SELECT '${AvJson.equityFixture}' AS j),
               k AS (SELECT unnest(json_keys(j, '$$."Time Series (Daily)"')) AS d, j
                     FROM p)
          SELECT CAST(d AS DATE) AS date,
                 CAST(j->>($path."1. open"') AS DOUBLE) AS open,
                 CAST(j->>($path."2. high"') AS DOUBLE) AS high,
                 CAST(j->>($path."3. low"') AS DOUBLE) AS low,
                 CAST(j->>($path."4. close"') AS DOUBLE) AS close,
                 CAST(j->>($path."5. volume"') AS BIGINT) AS volume
          FROM k ORDER BY date"""
    },

    "json_props_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1""",
  )
}
