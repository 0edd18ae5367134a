package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Map-of-maps JSON ingest (SURVEY.md §2.2 R1–R4): the Alpha Vantage payload
  * shape `{"Time Series (Daily)": {"2024-01-05": {"1. open": "472.16", ...}}}`
  * — outer map date→record, inner map metric→string-encoded number — decoded
  * into one typed row per date.
  *
  * The reference does `pd.DataFrame(payload[key]).transpose().iloc[::-1]`
  * (av_etl.py:76,121); here the same restructure is `from_json` +
  * `explode(map_entries(...))` + per-metric casts, which distributes over
  * however many payloads/symbols arrive at once (one row per map entry, no
  * driver-side pivot).
  */
object AvJson {

  /** Series subtree schema: {date → {metric-name → string-encoded number}}.
    * The payload's other entries ("Meta Data" etc.) are heterogeneous, so the
    * series object is sliced out with get_json_object before the typed
    * from_json parse.
    */
  private val seriesType = MapType(StringType, MapType(StringType, StringType))

  /** Parse a column of JSON payload strings into daily bars.
    *
    * @param seriesKey the outer key holding the series
    *                  (`"Time Series (Daily)"` / `"Time Series FX (Daily)"`)
    * @param withVolume equity payloads carry `"5. volume"`; FX ones don't
    *                   (av_etl.py:113-121).
    */
  def parseDailyBars(payloads: DataFrame, payloadCol: String,
                     seriesKey: String, withVolume: Boolean): DataFrame = {
    val series = from_json(
      get_json_object(col(payloadCol), s"$$['$seriesKey']"), seriesType)
    val exploded = payloads
      .select(explode(map_entries(series)).as("e"))
      .select(
        to_date(col("e.key"), "yyyy-MM-dd").as("date"),
        col("e.value").as("m"))
    val metrics = Seq(
      element_at(col("m"), "1. open").cast("double").as("open"),
      element_at(col("m"), "2. high").cast("double").as("high"),
      element_at(col("m"), "3. low").cast("double").as("low"),
      element_at(col("m"), "4. close").cast("double").as("close")) ++
      (if (withVolume)
         Seq(element_at(col("m"), "5. volume").cast("long").as("volume"))
       else Nil)
    exploded.select(col("date") +: metrics: _*)
  }

  /** Checked-in equity fixture (FIXTURES.md §A shape): 8 trading days,
    * string-encoded numbers, newest-first key order — exactly the wire
    * format the reference's extract step receives.
    */
  val equityFixture: String =
    """{"Meta Data": {"2. Symbol": "SPY", "3. Last Refreshed": "2026-08-07"},
      |"Time Series (Daily)": {
      |"2026-08-07": {"1. open": "472.16", "2. high": "474.40", "3. low": "470.00", "4. close": "473.25", "5. volume": "71234567"},
      |"2026-08-06": {"1. open": "469.90", "2. high": "472.50", "3. low": "468.11", "4. close": "471.80", "5. volume": "65432100"},
      |"2026-08-05": {"1. open": "468.00", "2. high": "470.20", "3. low": "467.55", "4. close": "469.95", "5. volume": "58273645"},
      |"2026-08-04": {"1. open": "465.30", "2. high": "468.90", "3. low": "465.05", "4. close": "468.02", "5. volume": "61029384"},
      |"2026-08-03": {"1. open": "466.10", "2. high": "466.80", "3. low": "463.20", "4. close": "465.15", "5. volume": "70192837"},
      |"2026-07-31": {"1. open": "464.75", "2. high": "467.00", "3. low": "464.10", "4. close": "466.55", "5. volume": "55647382"},
      |"2026-07-30": {"1. open": "462.20", "2. high": "465.45", "3. low": "461.90", "4. close": "464.80", "5. volume": "59873645"},
      |"2026-07-29": {"1. open": "460.00", "2. high": "463.10", "3. low": "459.35", "4. close": "462.25", "5. volume": "64738291"}}}"""
      .stripMargin.replace("\n", " ")

  /** The fixture as a 1-payload DataFrame (the engine is storage-agnostic:
    * live payloads would arrive the same way via any source that yields a
    * string column — SURVEY.md §2.1 S1).
    */
  def equityFixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(equityFixture).toDF("payload")
  }

  /** Checked-in FX fixture — the reference's second of two extract paths
    * (av_etl.py:113-121): `FX_DAILY` payloads keyed `"Time Series FX
    * (Daily)"` with four metrics and NO volume field. Same wire shape
    * otherwise (string-encoded numbers, newest-first key order).
    */
  val fxFixture: String =
    """{"Meta Data": {"2. From Symbol": "USD", "3. To Symbol": "PLN", "5. Last Refreshed": "2026-08-07 21:05:00"},
      |"Time Series FX (Daily)": {
      |"2026-08-07": {"1. open": "3.91200", "2. high": "3.94550", "3. low": "3.90110", "4. close": "3.93880"},
      |"2026-08-06": {"1. open": "3.90450", "2. high": "3.92270", "3. low": "3.89760", "4. close": "3.91180"},
      |"2026-08-05": {"1. open": "3.92810", "2. high": "3.93400", "3. low": "3.90020", "4. close": "3.90470"},
      |"2026-08-04": {"1. open": "3.95130", "2. high": "3.96880", "3. low": "3.92260", "4. close": "3.92850"},
      |"2026-08-03": {"1. open": "3.93670", "2. high": "3.95720", "3. low": "3.93210", "4. close": "3.95100"},
      |"2026-07-31": {"1. open": "3.97040", "2. high": "3.97550", "3. low": "3.93330", "4. close": "3.93700"},
      |"2026-07-30": {"1. open": "3.94880", "2. high": "3.97940", "3. low": "3.94410", "4. close": "3.97060"},
      |"2026-07-29": {"1. open": "3.96230", "2. high": "3.96890", "3. low": "3.93960", "4. close": "3.94900"}}}"""
      .stripMargin.replace("\n", " ")

  def fxFixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(fxFixture).toDF("payload")
  }
}
