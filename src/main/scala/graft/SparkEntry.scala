package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.CacheRegistry.QueryCached
import graft.cal.BusdayCount
import graft.dedup.{MinHash, NgramJaccard, SimHash}
import graft.inc.Watermark
import graft.ingest.AvJson
import graft.olap.{Exact, Skyline}
import graft.similarity.Similarity
import graft.text.TextAnalysis
import graft.ts.{Indicators, Intervals, Ohlc}

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
    // the price-side series key rides through the join so the SMA windows
    // partition on a real data column (see Ohlc.ccyDerive carryCols)
    val derived = Ohlc.ccyDerive(price, fx, carryCols = Seq("event_type"))
    val s5 = Ohlc.withSma(derived, 5, Seq("event_type"), "date",
      "close_price_ccy")
    Ohlc.withSma(s5, 20, Seq("event_type"), "date", "close_price_ccy")
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

    // Resample generality: the same partial-aggregable OHLC over weekly
    // buckets (any granularity is just a different grouping expression).
    "ts_ohlc_resample_weekly" -> ((s, dir) =>
      Ohlc.bars(Tables.events(s, dir),
          date_trunc("week", col("ts")).cast("date").as("week_start"))
        .orderBy("event_type", "week_start")),

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
      // the real series column keys the window even with one series, so
      // this plan is literally the multi-series plan at width 1
      val bars = Ohlc.dailyBars(ev).select("event_type", "date", "close")
      Ohlc.withSma(Ohlc.withSma(bars, 5, Seq("event_type")), 20,
          Seq("event_type"))
        .select("date", "close", "sma_5", "sma_20")
        .orderBy("date")
    }),

    // §2.9 V2 data side / FIXTURES.md §C report frame: the joined derived
    // table with NULL-gated SMAs over BOTH price columns — the exact table
    // the reference's dual-axis report consumes (rendering stays out of
    // engine scope per SURVEY §7.5).
    "ts_report_frame" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val derived = Ohlc.ccyDerive(
        Ohlc.dailyBars(ev.filter(col("event_type") === "purchase")),
        Ohlc.dailyBars(ev.filter(col("event_type") === "view")),
        carryCols = Seq("event_type"))
      val k = Seq("event_type") // real series key -> partitioned windows
      val withCcySma =
        Ohlc.withSma(Ohlc.withSma(derived, 5, k, "date", "close_price_ccy"),
          20, k, "date", "close_price_ccy")
          .withColumnRenamed("sma_5", "sma_5_ccy")
          .withColumnRenamed("sma_20", "sma_20_ccy")
      val withUsdSma =
        Ohlc.withSma(Ohlc.withSma(withCcySma, 5, k, "date", "close_price_usd"),
          20, k, "date", "close_price_usd")
          .withColumnRenamed("sma_5", "sma_5_usd")
          .withColumnRenamed("sma_20", "sma_20_usd")
      // the reference's report also SMAs the exchange-rate series itself
      // (data_viz.py:103-104) — all three report figures get their frames
      Ohlc.withSma(Ohlc.withSma(withUsdSma, 5, k, "date", "close_rate"),
          20, k, "date", "close_rate")
        .withColumnRenamed("sma_5", "sma_5_rate")
        .withColumnRenamed("sma_20", "sma_20_rate")
        .select("date", "close_price_usd", "close_rate", "close_price_ccy",
                "sma_5_ccy", "sma_20_ccy", "sma_5_usd", "sma_20_usd",
                "sma_5_rate", "sma_20_rate")
        .orderBy("date")
    }),

    // Lag-family window: day-over-day simple returns per series — the
    // other half of the reference's derived-metrics surface (SMA is the
    // frame average; returns are the frame delta). Keyed window, exact
    // division order on both engines.
    "ts_daily_returns" -> ((s, dir) =>
      Ohlc.withReturns(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select(col("event_type"), col("date"), col("close")),
          Seq("event_type"))
        .orderBy("event_type", "date")),

    // W1 at scale: the same SMA with the window keyed by series — the
    // form every multi-series caller uses (one exchange on the series key,
    // sort within partitions; no single-partition global window).
    "ts_sma_multi_series" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select("event_type", "date", "close")
      Ohlc.withSma(bars, 5, Seq("event_type"))
        .select("event_type", "date", "close", "sma_5")
        .orderBy("event_type", "date")
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
        // (l_orderkey, l_linenumber) is NOT unique in this generator —
        // order by every output column for a total order (identical full
        // rows are then interchangeable)
        .orderBy("l_orderkey", "l_linenumber", "ship_date", "l_quantity")
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

    // Backfill planner: calendar-spine anti-join finds the date gaps an
    // incremental pipeline must re-fetch — the complement of the
    // missing-suffix watermark (holes INSIDE history, not just the tail).
    // Spine from one 2-value aggregate, explode, left-anti on distinct
    // present dates, monthly rollup.
    "inc_backfill_missing" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("d"))
      val b = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val spine = b.select(explode(sequence(col("lo"), col("hi"))).as("d"))
      spine.join(o.distinct(), Seq("d"), "left_anti")
        .groupBy(date_trunc("month", col("d")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_missing"),
             min(col("d")).as("first_missing"),
             max(col("d")).as("last_missing"))
        .orderBy("month")
    }),

    // Window value-position family: first/last/nth over the full frame
    // plus symmetric lead/lag offsets — completes the window-function
    // surface next to the rank family (window_rank_suite). Order is
    // tie-free (date unique per series), so every engine agrees.
    "window_value_positions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("date"))
      val wf = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Ohlc.dailyBars(Tables.events(s, dir))
        .select("event_type", "date", "close")
        .withColumn("first_close", first(col("close")).over(wf))
        .withColumn("last_close", last(col("close")).over(wf))
        .withColumn("third_close", nth_value(col("close"), 3).over(wf))
        .withColumn("lead2", lead(col("close"), 2).over(w))
        .withColumn("lag2", lag(col("close"), 2).over(w))
        .orderBy("event_type", "date")
    }),

    // §2.8 I3: derived-table incremental rebuild — the ccy-derive join over
    // ONLY the missing suffix: the watermark predicate lands on both source
    // scans (filter-below-join), so the rebuild touches k days, not
    // history (av_etl.py:158-172's LIMIT-k reads as key predicates).
    "inc_derived_rebuild" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wm = ev.agg(date_sub(max(to_date(col("ts"))), 10).as("watermark"))
      val recent = Watermark.newerThan(
        ev.withColumn("date", to_date(col("ts"))), wm, "date").drop("date")
      Ohlc.ccyDerive(
          Ohlc.dailyBars(recent.filter(col("event_type") === "purchase")),
          Ohlc.dailyBars(recent.filter(col("event_type") === "view")))
        .select("date", "close_price_usd", "close_rate", "close_price_ccy")
        .orderBy("date")
    }),

    // Sliding event-time windows (2-day windows, 1-day step): each event
    // lands in two windows — the windowed-aggregation shape shared by the
    // batch and streaming paths.
    "ts_sliding_window_2d" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(Exact.cents(col("value"))).cast("double")./(lit(100.0))
               .as("sum_value"))
        .select(col("window.start").cast("date").as("window_start"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    // MACD (12/26/9): the EMA prefix fold composed three times — fast and
    // slow EMAs of close, then the signal EMA over the derived MACD
    // sequence itself. Alphas are 2/(n+1) computed as one IEEE division
    // on both engines (identical bits), folds are step-for-step identical.
    "ts_macd" -> ((s, dir) => {
      import graft.ts.Ema
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select("event_type", "date", "close")
      val e12 = Ema.withEma(bars, 2.0 / 13.0, Seq("event_type"))
        .withColumnRenamed("ema", "ema12")
      val e26 = Ema.withEma(e12, 2.0 / 27.0, Seq("event_type"))
        .withColumnRenamed("ema", "ema26")
      val m = e26.withColumn("macd", col("ema12") - col("ema26"))
      Ema.withEma(m, 2.0 / 10.0, Seq("event_type"), closeCol = "macd")
        .withColumnRenamed("ema", "signal")
        .withColumn("histogram", col("macd") - col("signal"))
        .select("event_type", "date", "macd", "signal", "histogram")
        .orderBy("event_type", "date")
    }),

    // Running peak + percent drawdown per series — the prefix-max half of
    // the indicator family (SMA = prefix average, returns = prefix delta).
    // Keyed running-max window; two fixed-order IEEE ops for the percent.
    "ts_drawdown" -> ((s, dir) =>
      Indicators.withDrawdown(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select("event_type", "date", "close"),
          Seq("event_type"))
        .orderBy("event_type", "date")),

    // Monthly VWAP per series from daily bars: exact long Σ(cents·volume)
    // and Σvolume (partial-aggregable groupBy — one row per series·month
    // on the shuffle), one double division chain.
    "ts_vwap_monthly" -> ((s, dir) =>
      Indicators.vwap(
          Ohlc.dailyBars(Tables.events(s, dir)),
          date_trunc("month", col("date")).cast("date").as("month"),
          Seq("event_type"))
        .select("event_type", "month", "volume", "vwap")
        .orderBy("event_type", "month")),

    // Bollinger bands (20-day, 2σ): trailing mean ± k·population stddev
    // from exact integer moment sums (Σc, Σc² as longs), sd via one
    // correctly-rounded sqrt — bit-portable like agg_value_stats.
    "ts_bollinger" -> ((s, dir) =>
      Indicators.withBollinger(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select("event_type", "date", "close"),
          20, 2.0, Seq("event_type"))
        .select("event_type", "date", "close",
                "bb_mid", "bb_sd", "bb_upper", "bb_lower")
        .orderBy("event_type", "date")),

    // Cutler's RSI (14-day): trailing gain/loss split of exact cent
    // deltas; the /n cancels so the result is one multiply + one divide.
    "ts_rsi" -> ((s, dir) =>
      Indicators.withRsi(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select("event_type", "date", "close"),
          14, Seq("event_type"))
        .select("event_type", "date", "close", "rsi_14")
        .orderBy("event_type", "date")),

    // 7-day sliding distinct users: each event lands in the 7 windows
    // ending on days d..d+6 (explode of a constant offset range — linear,
    // no self-join), then an exact distinct per window end. At 100 TB the
    // scale path replaces countDistinct with merged daily HLL sketches
    // (sketch_hll_distinct) — same window explode, mergeable state.
    "ts_sliding_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .select(col("user_id"),
                explode(sequence(lit(0), lit(6))).as("off"), col("d"))
        .select(col("user_id"), date_add(col("d"), col("off")).as("wend"))
        .groupBy("wend")
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("wend")),

    // BPE merge-candidate table: adjacent pre-token pair frequencies
    // across the corpus — the count step of one BPE merge iteration.
    // One explode + partial-aggregable groupBy; top-k as ordered limit.
    "text_bpe_pair_counts" -> ((s, dir) => {
      import graft.text.TextAnalysis.{asciiLower, asciiUpper}
      val pieces = regexp_extract_all(
        translate(col("text"), asciiUpper, asciiLower),
        lit("[a-z]+|[0-9]+|[.,;:!?()/_-]+"), lit(0))
      Tables.documents(s, dir)
        .withColumn("pieces", pieces)
        .select(explode(transform(
          slice(col("pieces"), lit(1),
                greatest(size(col("pieces")) - 1, lit(0))),
          (x, i) => concat_ws(" ", x, element_at(col("pieces"), i + 2))))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("pair").asc)
        .limit(50)
    }),

    // Small-file compaction (OPTIMIZE): fragment events into 64 splinter
    // files, compact to right-sized ones, read the compacted layout back
    // and prove content integrity against the base table. File-count
    // assertions live in BucketingSpec; the oracle checks the data
    // survived the rewrite bit-for-bit.
    "layout_compact_small_files" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_compact").toString
      Tables.events(s, dir).select("event_id", "event_type", "value")
        .repartition(64)
        .write.mode("overwrite").parquet(s"$base/frag")
      graft.olap.Layout.compactSmallFiles(
        s, s.read.parquet(s"$base/frag"), s"$base/compact", 100000L)
      s.read.parquet(s"$base/compact")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             (sum(Exact.cents(col("value"))).cast("double") / lit(100.0))
               .as("sum_value"))
        .orderBy("event_type")
    }),

    // Misra-Gries heavy hitters over the token stream: per-partition O(k)
    // summaries whose union is a guaranteed superset of all items with
    // freq > n/k (pigeonhole), then an exact verify over only the
    // candidates — the two-pass shape that never aggregates the full
    // vocabulary. Threshold test in exact integers (freq·k > n).
    "sketch_mg_heavy" -> ((s, dir) =>
      graft.olap.Frequent.heavyHitters(
          Tables.documents(s, dir)
            .select(explode(TextAnalysis.tokens("text")).as("token")),
          "token", 40)
        .orderBy(col("freq").desc, col("item").asc)),

    // Typed Dataset surface: case-class rows, groupByKey + custom
    // Aggregator (partial-aggregable typed buffer in exact cents) —
    // bitwise-equal to the SQL formulation.
    "ds_typed_agg" -> ((s, dir) => {
      import s.implicits._
      import graft.olap.TypedAgg
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
                col("l_quantity"), col("l_extendedprice"))
        .as[TypedAgg.LiRow]
        .filter((r: TypedAgg.LiRow) => r.l_quantity > 10.0)
        .groupByKey(r => (r.l_returnflag, r.l_linestatus))
        .agg(TypedAgg.flagStats.toColumn)
        .map { case ((f, st), v) =>
          (f, st, v.n_items, v.qty_cents.toDouble / 100.0,
           v.price_cents.toDouble / 100.0)
        }
        .toDF("l_returnflag", "l_linestatus", "n_items", "sum_qty",
              "sum_price")
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Deterministic weighted (probability-proportional-to-size) sample:
    // priority = spread_hash(id)/weight, k smallest per stratum — seedless,
    // mergeable (k smallest of a union = k smallest of per-shard k
    // smallest), and bitwise-portable (one IEEE division; ties totalized
    // by doc_id).
    "sample_weighted_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("priority").asc, col("doc_id").asc)
      Tables.documents(s, dir)
        .withColumn("priority",
          graft.olap.Sketch.spreadHash(col("doc_id")).cast("double") /
            col("n_chars").cast("double"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("lang", "doc_id", "n_chars", "priority")
        .orderBy("lang", "doc_id")
    }),

    // 2-D histogram (value decile band × ISO weekday): the heatmap feed
    // a monitoring dashboard renders — two integer bucketings, one
    // partial-aggregable groupBy, exact cent sums per cell.
    "agg_heatmap_2d" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .select(
          expr("(cc - ((cc % 10000) + 10000) % 10000) DIV 10000")
            .as("value_band"),
          (weekday(col("ts").cast("date")) + 1).cast("long").as("dow"),
          col("cc"))
        .groupBy("value_band", "dow")
        .agg(count(lit(1)).as("n"), sum(col("cc")).as("sum_cents"))
        .orderBy("value_band", "dow")),

    // Chi-square independence test, per cell: is event type independent of
    // ISO weekday? Every cell carries its exact rational contribution —
    // numerator (o·N − r·c)² in DECIMAL(38,0) (the cross term tops 10^20,
    // past BIGINT), denominator N·r·c in BIGINT — and ONE IEEE division
    // for the double. No summed-doubles total (accumulation order is not
    // portable); a consumer sums the rationals. Marginals come from one
    // count pass re-aggregated two ways — all partial-aggregable.
    "agg_chi2_contingency" -> ((s, dir) => {
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (weekday(col("ts").cast("date")) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
        .tracked // marginals + cells: three readers of one tiny frame
      val rowTot = cells.groupBy("event_type").agg(sum("o").as("r"))
      val colTot = cells.groupBy("dow").agg(sum("o").as("c"))
      val n = cells.agg(sum("o").as("n"))
      cells.join(rowTot, "event_type").join(colTot, "dow")
        .crossJoin(broadcast(n))
        .withColumn("dev", col("o") * col("n") - col("r") * col("c"))
        // dev² computed in DECIMAL(38,0) but OUTPUT as checked BIGINT:
        // decimal output columns hash engine-dependently downstream, and
        // the loud checkedLong overflow is the house discipline anyway
        .select(col("event_type"), col("dow"), col("o"), col("r"), col("c"),
          Exact.checkedLong(col("dev").cast("decimal(38,0)")
              * col("dev").cast("decimal(38,0)"))
            .as("chi2_num"),
          (col("n") * col("r") * col("c")).as("chi2_den"))
        .withColumn("chi2_cell",
          col("chi2_num").cast("double") / col("chi2_den").cast("double"))
        .orderBy("event_type", "dow")
    }),

    // Primary-key uniqueness audit across every table in the warehouse:
    // rows / distinct keys / duplicated keys / excess rows per table, the
    // load-correctness certification that catches double-applied batches
    // before they poison joins. Each table reduces to per-key counts
    // FIRST (partial-aggregable; join-free), then to one audit row; the
    // union of 10 one-row frames is the report. Not a vacuous pass: the
    // synthetic generator does NOT enforce lineitem's composite
    // (l_orderkey, l_linenumber) key, and the audit surfaces those
    // duplicates at every SF.
    "dq_duplicate_pk_audit" -> ((s, dir) => {
      def audit(table: String, df: DataFrame, key: Seq[String]): DataFrame =
        df.groupBy(key.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_rows"),
               count(lit(1)).as("n_keys"),
               sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
               sum(col("cnt") - 1).as("n_excess_rows"))
          .select(lit(table).as("table_name"), col("n_rows"), col("n_keys"),
                  col("n_dup_keys"), col("n_excess_rows"))
      audit("customer", Tables.customer(s, dir), Seq("c_custkey"))
        .unionAll(audit("documents", Tables.documents(s, dir), Seq("doc_id")))
        .unionAll(audit("embeddings", Tables.embeddings(s, dir), Seq("vec_id")))
        .unionAll(audit("events", Tables.events(s, dir), Seq("event_id")))
        .unionAll(audit("lineitem", Tables.lineitem(s, dir),
          Seq("l_orderkey", "l_linenumber")))
        .unionAll(audit("nation", Tables.nation(s, dir), Seq("n_nationkey")))
        .unionAll(audit("orders", Tables.orders(s, dir), Seq("o_orderkey")))
        .unionAll(audit("part", Tables.part(s, dir), Seq("p_partkey")))
        .unionAll(audit("region", Tables.region(s, dir), Seq("r_regionkey")))
        .unionAll(audit("supplier", Tables.supplier(s, dir), Seq("s_suppkey")))
        .orderBy("table_name")
    }),

    // Herfindahl concentration index per month: Σ share² of event-type
    // revenue — deliberately the RATIONAL concentration metric (entropy
    // needs ln, which is not bit-portable); exact long numerator Σcᵢ²
    // and denominator (Σc)², one division.
    "agg_concentration_hhi" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("month", col("ts")).cast("date").as("month"),
                 col("event_type"))
        .agg(sum(Exact.cents(col("value"))).as("c"))
        // quantize per-type revenue to whole dollars before squaring:
        // keeps s1² far from Long.Max at any SF while numerator and
        // denominator stay exact integers. FLOOR division, spelled out in
        // integers on BOTH engines: Spark DIV and DuckDB // each truncate
        // toward zero on negatives, so the oracle mirrors this exact
        // (a - pmod(a, b)) DIV b formula rather than relying on either
        .withColumn("d", expr("(c - ((c % 100) + 100) % 100) DIV 100"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_types"),
             sum(col("d") * col("d")).as("s2"),
             sum(col("d")).as("s1"))
        .select(col("month"), col("n_types"),
          (col("s2").cast("double") / (col("s1") * col("s1")).cast("double"))
            .as("hhi"))
        .orderBy("month")),

    // RANGE window frame (value-distance, not row-count): per series, how
    // many bars close within ±50 cents of each bar, and their exact cent
    // sum — the frame type ROWS cannot express; completes the window
    // frame surface (ROWS bounded/unbounded + RANGE now covered).
    "window_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"))
        .rangeBetween(-50L, 50L)
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("cents"))
        .withColumn("n_near", count(lit(1)).over(w))
        .withColumn("sum_near", sum(col("cents")).over(w))
        .select(col("event_type"), col("date"), col("cents"),
                col("n_near"), col("sum_near"))
        .orderBy("event_type", "date")
    }),

    // Gini coefficient per group from the rank formula
    // G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx) over ascending cents — the
    // numerator and denominator are exact longs (value-equal rank swaps
    // cannot change Σ i·xᵢ), one final division.
    "agg_gini" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
                Exact.cents(col("value")).as("cents"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("cents")).as("sx"),
             sum(col("rn") * col("cents")).as("six"))
        .select(col("event_type"), col("n"),
          ((lit(2L) * col("six") - (col("n") + 1L) * col("sx"))
            .cast("double") / (col("n") * col("sx")).cast("double"))
            .as("gini"))
        .orderBy("event_type")
    }),

    // Day-of-week seasonality: per-series ISO-dow average close vs the
    // series overall average — exact cent sums, two fixed division
    // chains, ratio > 1 means the weekday trades rich.
    "ts_seasonality_dow" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("cents"))
      val dow = bars.groupBy(col("event_type"),
          (weekday(col("date")) + 1).as("dow"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      val tot = bars.groupBy("event_type")
        .agg(count(lit(1)).as("tn"), sum(col("cents")).as("tc"))
      val avgDow = col("sc").cast("double") / col("n").cast("double") /
        lit(100.0)
      val avgAll = col("tc").cast("double") / col("tn").cast("double") /
        lit(100.0)
      dow.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          avgDow.as("avg_close"), (avgDow / avgAll).as("ratio_to_mean"))
        .orderBy("event_type", "dow")
    }),

    // Winsorization: clamp values at the exact positional p05/p95 per
    // group (k = ceil(q·n) in integer math, same rank both engines) and
    // report clamp counts + the winsorized mean — the outlier-capping
    // cleaning pass, exact end to end.
    "agg_winsorize" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
                Exact.cents(col("value")).as("cents"))
      val n = v.groupBy("event_type").agg(count(lit(1)).as("n"))
      val bounds = v
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("cents", "event_id")))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n * 5 + 99) div 100") ||
                col("rn") === expr("(n * 95 + 99) div 100"))
        .groupBy("event_type")
        .agg(min(col("cents")).as("p05_cents"),
             max(col("cents")).as("p95_cents"))
      v.join(broadcast(bounds), "event_type")
        .withColumn("cl",
          greatest(least(col("cents"), col("p95_cents")), col("p05_cents")))
        .groupBy("event_type", "p05_cents", "p95_cents")
        .agg(count(lit(1)).as("n"),
             sum(when(col("cents") < col("p05_cents"), 1L).otherwise(0L))
               .as("n_clamped_low"),
             sum(when(col("cents") > col("p95_cents"), 1L).otherwise(0L))
               .as("n_clamped_high"),
             sum(col("cl")).as("sc"))
        .select(col("event_type"), col("n"),
          (col("p05_cents").cast("double") / lit(100.0)).as("p05"),
          (col("p95_cents").cast("double") / lit(100.0)).as("p95"),
          col("n_clamped_low"), col("n_clamped_high"),
          (col("sc").cast("double") / col("n").cast("double") / lit(100.0))
            .as("winsorized_mean"))
        .orderBy("event_type")
    }),

    // Ratio-to-report: per (series, month) value share within the month
    // and of the grand total — numerators and denominators all exact long
    // cents (order-independent), one fixed double division each.
    "agg_share_of_total" -> ((s, dir) => {
      val m = Tables.events(s, dir)
        .groupBy(col("event_type"),
                 date_trunc("month", col("ts")).cast("date").as("month"))
        .agg(count(lit(1)).as("n"), sum(Exact.cents(col("value"))).as("c"))
      val wMonth = org.apache.spark.sql.expressions.Window
        .partitionBy(col("month"))
      val tot = m.agg(sum(col("c")).as("tc"))
      m.withColumn("mc", sum(col("c")).over(wMonth))
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("month"), col("n"),
          (col("c").cast("double") / lit(100.0)).as("sum_value"),
          (col("c").cast("double") / col("mc").cast("double"))
            .as("share_of_month"),
          (col("c").cast("double") / col("tc").cast("double"))
            .as("share_of_total"))
        .orderBy("event_type", "month")
    }),

    // Cross-sectional daily rank: each day, rank the series by simple
    // return — the per-date window is the transpose of the per-series
    // return window (two keyed exchanges). First-day NULL returns are
    // filtered before ranking: engines disagree on default NULL ordering.
    "ts_cross_sectional_rank" -> ((s, dir) => {
      val ret = Ohlc.withReturns(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select("event_type", "date", "close"),
          Seq("event_type"))
        .filter(col("return_pct").isNotNull)
      val wDate = org.apache.spark.sql.expressions.Window
        .partitionBy(col("date"))
        .orderBy(col("return_pct").desc, col("event_type").asc)
      ret.withColumn("day_rank", rank().over(wDate))
        .select("date", "event_type", "return_pct", "day_rank")
        .orderBy("date", "event_type")
    }),

    // Rolling 20-day correlation of the purchase and view series: all six
    // moment sums exact longs over the trailing window, one fixed-order
    // double formula (sqrt correctly rounded) — the pairwise cousin of
    // emb_dim_correlation, NULL until the frame fills or when degenerate.
    "ts_rolling_corr" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
      val x = bars.filter(col("event_type") === "purchase")
        .select(col("date"), Exact.cents(col("close")).as("cx"))
      val y = bars.filter(col("event_type") === "view")
        .select(col("date"), Exact.cents(col("close")).as("cy"))
      val j = x.join(y, Seq("date"))
      // one date-joined series by construction — deliberate single
      // partition, keyed so the intent survives constant folding
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("cx")))
        .orderBy(col("date")).rowsBetween(-19, 0)
      val n = count(lit(1)).over(w)
      val sx = sum(col("cx")).over(w)
      val sy = sum(col("cy")).over(w)
      val sxx = sum(col("cx") * col("cx")).over(w)
      val syy = sum(col("cy") * col("cy")).over(w)
      val sxy = sum(col("cx") * col("cy")).over(w)
      val num = lit(20L) * sxy - sx * sy
      val dx = lit(20L) * sxx - sx * sx
      val dy = lit(20L) * syy - sy * sy
      j.withColumn("corr_20",
          when(n === 20 && dx > 0L && dy > 0L,
            num.cast("double") /
              (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))))
        .select("date", "corr_20")
        .orderBy("date")
    }),

    // 2D skyline (Pareto frontier) per brand: maximize size, minimize
    // price. Implemented as groupBy-reduce + one keyed running-min scan;
    // the oracle keeps the O(n²) NOT-EXISTS dominance formulation — a
    // different algorithm reaching the same set.
    "olap_skyline_parts" -> ((s, dir) =>
      Skyline.pareto2d(
          Tables.part(s, dir).select("p_brand", "p_size", "p_retailprice"),
          Seq("p_brand"), "p_size", "p_retailprice")
        .orderBy("p_brand", "p_size")),

    // Interval union / coverage per user: each event spans 30 min; merge
    // overlapping-or-touching spans into islands (running-max-end), count
    // them and sum covered time — exact epoch-microsecond longs.
    "ts_interval_coverage" -> ((s, dir) =>
      Intervals.coverage(Tables.events(s, dir), "user_id", "ts", 1800L)
        .orderBy("user_id")),

    // §2.6 O2: sort + limit-k (top-k newest) — planned as
    // TakeOrderedAndProject (distributed per-partition top-k + merge,
    // no global sort).
    "sort_topk_newest" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
                to_date(col("l_shipdate")).as("ship_date"),
                col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is the lineitem primary key, so the
        // sort is already total — extendedprice in the key would only add
        // comparator work to every heap sift in TakeOrderedAndProject
        .orderBy(col("ship_date").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
        .limit(100)),

    // §2.5 F3/F4: busday_count with holiday calendar — custom Catalyst
    // Expression with codegen (graft.cal.BusdayCountExpr).
    // numpy busday_offset(roll='forward') companion to busday_count:
    // shift each date +10 business days in closed form — roll weekend
    // starts to Monday, then result = rolled + n + 2·((w0 + n) DIV 5)
    // calendar days, where w0 = Monday-based weekday. Pure integer date
    // arithmetic, identical on both engines; no generator, no join.
    "cal_busday_offset" -> ((s, dir) => {
      val n = 10
      Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("start_date")).distinct()
        .withColumn("rolled",
          when(weekday(col("start_date")) >= 5,
            date_add(col("start_date"),
              lit(7) - weekday(col("start_date"))))
            .otherwise(col("start_date")))
        .withColumn("busday10",
          date_add(col("rolled"),
            (lit(n) + lit(2) * expr(s"(weekday(rolled) + $n) DIV 5"))
              .cast("int")))
        .select("start_date", "busday10")
        .orderBy("start_date")
    }),

    "cal_busday_count" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("start_date")).distinct()
        .withColumn("busdays", BusdayCount.busday_count(
          col("start_date"), date_add(col("start_date"), 30)))
        .orderBy("start_date")),

    // §2.5 F3/F4 at full fidelity: the same codegen busday expression over
    // the rule-generated NYSE trading calendar (MLK, Presidents, Good
    // Friday via computus, Memorial, Juneteenth, Labor, Thanksgiving,
    // observed-date shifts, ad-hoc closures) — the reference's
    // mcal.get_calendar('NYSE').holidays() as data (av_etl.py:50-51).
    "cal_busday_nyse" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("start_date")).distinct()
        .withColumn("busdays", BusdayCount.busday_count(
          col("start_date"), date_add(col("start_date"), 30),
          graft.cal.NyseCalendar.default))
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

    // §2.5 F6 as data functions: the reference's casing/format ops
    // (constants.py:9-11, data_viz titles) applied to a column — lower/
    // upper/capitalize/concat (capitalize composed from substrings since
    // not every engine ships initcap).
    "fn_string_casing" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          lower(col("n_name")).as("lower_name"),
          upper(col("n_name")).as("upper_name"),
          expr("concat(upper(substr(lower(n_name), 1, 1)), substr(lower(n_name), 2))")
            .as("capitalized"),
          concat(lit("nation: "), lower(col("n_name")),
                 lit(" ("), col("n_nationkey").cast("string"), lit(")"))
            .as("label"),
          length(col("n_name")).cast("long").as("name_len"))
        .orderBy("n_nationkey")),

    // §2.2 restructuring, pivot direction: long→wide with a FIXED value
    // set (dynamic pivot would need a driver-side distinct pass; the
    // explicit list keeps the plan static and the schema declared).
    "restructure_pivot_daily" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("date"))
        .pivot("event_type",
               Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("date")),

    // §2.2 restructuring, unpivot direction: wide→long (the relational
    // form of the reference's transpose at av_etl.py:76) — OHLC columns
    // melt to (date, metric, value) rows.
    "restructure_unpivot_ohlc" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(
        Tables.events(s, dir).filter(col("event_type") === "purchase"))
      bars.select(col("date"), col("open"), col("high"), col("low"),
                  col("close"))
        .unpivot(Array(col("date")),
                 Array(col("open"), col("high"), col("low"), col("close")),
                 "metric", "value")
        .orderBy("date", "metric")
    }),

    // §2.2 R1–R4: map-of-maps JSON ingest — the Alpha Vantage wire format
    // decoded via from_json + explode(map_entries), string→double/long/date
    // casts (av_etl.py:76-81 semantics, distributed).
    "ingest_av_json" -> ((s, dir) =>
      AvJson.parseDailyBars(AvJson.equityFixtureDf(s), "payload",
                            "Time Series (Daily)", withVolume = true)
        .orderBy("date")),

    // §2.2 ingest, FX variant (av_etl.py:113-121): "Time Series FX
    // (Daily)" outer key, four metrics, no volume — the reference's
    // second of two extract paths.
    "ingest_av_fx_json" -> ((s, dir) =>
      AvJson.parseDailyBars(AvJson.fxFixtureDf(s), "payload",
                            "Time Series FX (Daily)", withVolume = false)
        .orderBy("date")),

    // §2.1 S1 as a full DataSource V2 connector: spark.read.format(
    // "graft-series") plans one InputPartition per (symbol × month) — the
    // unit a remote quote API pages by — pushes symbol/date predicates
    // into partition pruning (server-side filtering in the live reading),
    // and prunes columns in the reader. The deterministic generator
    // (graft.sources.SeriesGen) stands in for the wire fetch; the oracle
    // replays its exact integer arithmetic.
    "source_dsv2_series" -> ((s, dir) =>
      s.read.format("graft-series")
        .option("symbols", "SPY,QQQ,IWM")
        .option("start", "2026-01-05")
        .option("end", "2026-03-31")
        .load()
        .filter(col("trade_date") >= lit("2026-02-02").cast("date") &&
                col("symbol").isin("SPY", "QQQ"))
        .select("symbol", "trade_date", "open", "high", "low", "close",
                "volume")
        .orderBy("symbol", "trade_date")),

    // DSv2 aggregate pushdown (SupportsPushDownAggregates, COMPLETE
    // pushdown): groupBy(symbol) count/min/max evaluate inside the
    // source — one partition per symbol, one emitted row per group, NO
    // Aggregate node in the plan (the quote-API summary-endpoint shape).
    // Sound because each group is computed wholly inside one reader.
    "source_dsv2_agg_pushdown" -> ((s, dir) =>
      s.read.format("graft-series")
        .option("symbols", "SPY,QQQ,IWM")
        .option("start", "2026-01-05")
        .option("end", "2026-03-31")
        .load()
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_days"),
             min(col("low")).as("min_low"),
             max(col("high")).as("max_high"),
             max(col("volume")).as("max_volume"))
        .orderBy("symbol")),

    // The SAME connector read as a micro-batch STREAM: the date range is
    // revealed 10 days per trigger (a bounded replay of a live feed),
    // complete-mode monthly aggregate converges to the batch answer —
    // one declarative transform, two execution modes.
    "stream_dsv2_source" -> ((s, dir) => {
      val name = "graft_stream_dsv2"
      val key = "spark.sql.shuffle.partitions"
      val old = s.conf.get(key)
      s.conf.set(key, "8")
      try {
        val q = s.readStream.format("graft-series")
          .option("symbols", "SPY,QQQ")
          .option("start", "2026-01-05")
          .option("end", "2026-02-27")
          .option("maxDaysPerTrigger", "10")
          .load()
          .groupBy(col("symbol"),
                   date_trunc("month", col("trade_date")).cast("date")
                     .as("month"))
          .agg(count(lit(1)).as("n_days"),
               sum(Exact.cents(col("close"))).cast("double")./(lit(100.0))
                 .as("sum_close"),
               min(col("low")).as("min_low"),
               max(col("high")).as("max_high"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set(key, old)
      s.table(name).orderBy("symbol", "month")
    }),

    // JSON field extraction over a data column (events.props) + group-agg;
    // long sums are exact integer arithmetic on both engines.
    "json_props_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")),

    // Bucketed-table layout (graft.olap.Layout): both join sides written
    // bucketed+sorted on the key, so the equi-join plans with NO exchange
    // on either side — the one-time-layout-cost vs per-query-shuffle
    // trade that bucketing buys at 100 TB. The only shuffle left is the
    // final 5-group aggregation (BucketingSpec pins exactly one Exchange
    // in the whole plan; the remaining join-side sorts are
    // partition-local).
    "layout_bucketed_join" -> ((s, dir) => {
      val sfx = math.abs(dir.hashCode).toString
      val orders = graft.olap.Layout.writeBucketed(s,
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        s"orders_b_$sfx", "o_custkey", 8)
      val cust = graft.olap.Layout.writeBucketed(s,
        Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
        s"customer_b_$sfx", "c_custkey", 8)
      orders.hint("merge")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
               .as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // Hive-style partitioned layout: events written partitioned by
    // event_type, read back with a partition predicate — the filter never
    // touches row data, it prunes whole directories at planning time
    // (PartitionFilters in the scan, 1 of 5 partitions read;
    // BucketingSpec pins both). At 100 TB this is THE first-line scan
    // reducer: partition by the column every query filters on.
    "layout_partition_prune" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_part_events").toString
      Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .filter(col("event_type") === "purchase")
        .groupBy("event_date")
        .agg(count(lit(1)).as("n"),
             sum(Exact.cents(col("value"))).cast("double")./(lit(100.0))
               .as("sum_value"))
        .orderBy("event_date")
    }),

    // Wide-scan grouped aggregation (TPC-H Q1 shape): full map-side partial
    // agg, 4-group shuffle, exact decimal sums. The scan reads only the 7
    // referenced columns (check ReadSchema in .explain).
    "agg_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        // raw-timestamp filter (ship timestamps are midnight-only): a
        // to_date() wrapper would block parquet predicate pushdown
        .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.sumMoney(col("l_quantity")).as("sum_qty"),
          Exact.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          Exact.avgMoney(col("l_quantity")).as("avg_qty"),
          Exact.avgMoney(col("l_extendedprice")).as("avg_price"),
          (sum(Exact.rate(col("l_discount"))).cast("double")
            / count(lit(1)).cast("double")).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Distinct aggregation (planned as Expand + two-phase agg): exact
    // distinct counts alongside plain counts.
    "agg_distinct_parts" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // North-star sketch: KMV distinct-count estimation — portable-hash
    // k-minimum-values, bitwise-reproducible in the oracle (unlike HLL,
    // whose answer is a library artifact). k-smallest plans as
    // TakeOrderedAndProject; the estimate is one double division.
    "sketch_kmv_distinct" -> ((s, dir) =>
      graft.olap.Sketch.kmvDistinct(Tables.lineitem(s, dir),
        col("l_partkey"), k = 256)),

    // HyperLogLog as a NATIVE Catalyst aggregate (graft.olap.Hll): 512
    // one-byte registers per group, partial-aggregated map-side, merged by
    // bytewise max. The ALL row is hll_merge over the per-group sketches —
    // re-aggregation of STORED sketches, the property that lets 100 TB
    // distinct counts run as daily sketch unions instead of re-scans. The
    // oracle computes the ALL registers directly from all rows: max is
    // associative, so merged == direct, bit-for-bit; exact counts ride
    // along so the (raw-estimator) error stays visible.
    "sketch_hll_distinct" -> ((s, dir) => {
      import graft.olap.Hll
      val base = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
                graft.olap.Sketch.spreadHash(col("user_id")).as("hv"))
      val perType = base.groupBy("event_type")
        .agg(Hll.sketchAgg(col("hv")).as("sk"),
             countDistinct(col("user_id")).as("n_exact"))
      val per = perType.select(col("event_type").as("scope"),
        Hll.estimate(col("sk")).as("hll_est"),
        Hll.zeroRegs(col("sk")).as("zero_regs"),
        col("n_exact"))
      val merged = perType.agg(Hll.mergeAgg(col("sk")).as("sk"))
      val globExact = base.agg(countDistinct(col("user_id")).as("n_exact"))
      val all = merged.crossJoin(globExact) // 1-row × 1-row scalar combine
        .select(lit("ALL").as("scope"),
                Hll.estimate(col("sk")).as("hll_est"),
                Hll.zeroRegs(col("sk")).as("zero_regs"),
                col("n_exact"))
      per.unionByName(all).orderBy("scope")
    }),

    // Semi-join (EXISTS, TPC-H Q4 shape): priority counts over orders
    // having at least one returned lineitem. leftsemi materializes no
    // right-side columns and short-circuits per key — with the date
    // window pushed into the orders scan before the join.
    "join_semi_late_orders" -> ((s, dir) => {
      val late = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "leftsemi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Exact distributed order statistics: per-series value deciles via a
    // keyed window (rank + per-group count, positions by integer
    // arithmetic — no interpolation, so the decile values are rows that
    // exist and compare bitwise). The window partitions by series; at
    // scale this is one exchange on the series key, like any keyed sort.
    "agg_value_deciles" -> ((s, dir) =>
      graft.olap.OrderStats.deciles(Tables.events(s, dir),
          Seq("event_type"), "value", "event_id")
        .orderBy("event_type", "decile")),

    // Rollup (grouping sets): per-(flag,status) + per-flag + grand total
    // in one pass; grouping_id distinguishes the levels.
    "agg_rollup_counts" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(Exact.cents(col("l_quantity"))).cast("double")./(lit(100.0))
               .as("sum_qty"),
             grouping_id().cast("long").as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // Selective 3-way join + top-k (TPC-H Q3 shape): the customer dim is
    // broadcast (no shuffle of lineitem for it); orders⋈lineitem shuffles
    // on the order key; top-10 via TakeOrderedAndProject.
    "join_shipping_priority" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
                to_date(col("o_orderdate")).as("order_date"),
                col("o_orderpriority"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "order_date", "o_orderpriority")
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // 6-way star join (TPC-H Q5 shape): region/nation/supplier broadcast,
    // customer⋈orders⋈lineitem shuffle on their keys, nation-local
    // supplier constraint, exact revenue per nation.
    // ABC / Pareto classification of parts by cumulative revenue share
    // (A ≤ 80%, B ≤ 95%, C rest) — the inventory-analysis classic. The
    // cumulative walk runs over PART-LEVEL aggregates (dimension-sized,
    // like the k-core degree histogram — never the fact table), ordered
    // totally by (revenue desc, partkey); thresholds compare exact
    // integers (cum·100 vs total·k), no percent doubles in the cut.
    "olap_abc_classification" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("cents"))
      val total = rev.agg(sum(col("cents")).as("total_cents"))
      // keyed two-level cumulative (Packing.withCumDesc): the part-sized
      // revenue walk runs per revenue cell, never through one partition —
      // holds at 10^9 parts where the old onePartition window serialized
      graft.text.Packing.withCumDesc(rev, "l_partkey", "cents", "cum")
        .crossJoin(broadcast(total))
        .withColumn("abc_class",
          when(col("cum") * 100 <= col("total_cents") * 80, "A")
            .when(col("cum") * 100 <= col("total_cents") * 95, "B")
            .otherwise("C"))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"),
             sum(col("cents")).as("class_cents"),
             max(col("total_cents")).as("total_cents"))
        .select(col("abc_class"), col("n_parts"), col("class_cents"),
          (col("class_cents").cast("double")
            / col("total_cents").cast("double")).as("revenue_share"))
        .orderBy("abc_class")
    }),

    // Percent-of-parent hierarchy report (the drill-down table every BI
    // layer renders): order revenue per nation, each nation's share of
    // its region, each region's share of the grand total — exact cent
    // sums at the leaf level, parents by re-aggregation (never a second
    // scan), shares as one division each. Dims broadcast.
    "olap_percent_of_parent" -> ((s, dir) => {
      val geo = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val perNation = Tables.orders(s, dir)
        .select(col("o_custkey"), Exact.cents(col("o_totalprice")).as("c"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("c")).as("nation_cents"))
      val perRegion = perNation.groupBy("r_name")
        .agg(sum(col("nation_cents")).as("region_cents"))
      val total = perRegion.agg(sum(col("region_cents")).as("total_cents"))
      perNation.join(perRegion, "r_name")
        .crossJoin(broadcast(total))
        .select(col("r_name"), col("n_name"),
          col("nation_cents"), col("region_cents"),
          (col("nation_cents").cast("double")
            / col("region_cents").cast("double")).as("share_in_region"),
          (col("region_cents").cast("double")
            / col("total_cents").cast("double")).as("region_share"))
        .orderBy("r_name", "n_name")
    }),

    "join_region_revenue" -> ((s, dir) => {
      val nat = Tables.nation(s, dir).join(
        broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // North-star dedup: exact duplicate groups by full content (hash-free —
    // group directly on the text; Spark hashes internally for the shuffle).
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_doc_id"),
             count(lit(1)).as("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")),

    // North-star dedup: normalization-then-exact — ASCII casefold +
    // whitespace collapse before grouping (catches trivially-reformatted
    // copies that byte-exact dedup misses; the cheap pass before MinHash).
    // The whitespace class is written out explicitly: Java \s and RE2 \s
    // disagree on vertical tab, so both engines get the same 6 characters.
    "dedup_normalized" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(trim(regexp_replace(
            translate(col("text"), TextAnalysis.asciiUpper,
              TextAnalysis.asciiLower),
            "[ \\t\\n\\r\\f\\x0B]+", " "))
          .as("norm_text"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
             count(lit(1)).as("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")),

    // North-star quality filter (Gopher-style repetition signal): the
    // fraction of duplicate word-2-grams per document — templated /
    // boilerplate text scores high. Per-row projection, zero shuffle.
    "text_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          (size(TextAnalysis.tokens("text")) - 1)
            .cast("long").as("n_grams"),
          size(NgramJaccard.gram_hashes(col("text"), 2))
            .cast("long").as("n_distinct_grams"))
        .withColumn("dup_gram_ratio",
          when(col("n_grams") > 0,
            lit(1.0).cast("double") - col("n_distinct_grams").cast("double")
              / col("n_grams").cast("double")))
        .orderBy("doc_id")),

    // North-star train/val/test split: deterministic hash-mod bucketing
    // (the engine-portable spread hash) — reproducible on any engine and
    // any cluster size, no RNG state to coordinate.
    "sample_hash_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bucket",
          (graft.olap.Sketch.spreadHash(col("doc_id")) % 100).cast("int"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "validation")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
             min(col("doc_id")).as("min_doc_id"),
             max(col("doc_id")).as("max_doc_id"))
        .orderBy("split")),

    // North-star pretraining packing: concatenate documents in doc_id
    // order into one token stream, chop into 256-token training
    // sequences, report per-sequence occupancy. The global offset is a
    // two-level distributed prefix sum (Packing.withStreamOffset) — never
    // a single unpartitioned window.
    "pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        size(TextAnalysis.tokens("text")).cast("long").as("n_tokens"))
      graft.text.Packing
        .packSequences(docs, "doc_id", "n_tokens", seqLen = 256L,
          bucketSize = 100L)
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_overlap").as("n_tokens"),
             min("doc_id").as("min_doc_id"),
             max("doc_id").as("max_doc_id"))
        .orderBy("seq_id")
    }),

    // North-star mixture temperature resampling (the multilingual
    // upsampling rule: p_l^α with α = 0.5): per-language weight relative
    // to the LARGEST language — sqrt(n)/sqrt(n_max) is a fixed IEEE chain
    // (two sqrts + one division, no cross-group double sum whose
    // accumulation order could differ between engines), so weights and
    // the derived integer targets are bitwise-portable. One
    // partial-aggregable groupBy + a broadcast 1-row max.
    "sample_temperature" -> ((s, dir) => {
      val n = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val m = n.agg(max(col("n_docs")).as("nmax"))
      n.crossJoin(broadcast(m))
        .withColumn("rel_weight",
          sqrt(col("n_docs").cast("double"))
            / sqrt(col("nmax").cast("double")))
        .select(col("lang"), col("n_docs"), col("rel_weight"),
          floor(lit(1000.0) * col("rel_weight")).cast("long")
            .as("target_docs"))
        .orderBy("lang")
    }),

    // North-star mixture balancing: the largest corpus that matches the
    // target per-language proportions exactly (pure integer arithmetic:
    // M = min over strata of count*10 div weight; quota = weight*M div
    // 10), members picked deterministically per stratum by the engine's
    // spread hash — reproducible on any engine/cluster size. At 100 TB
    // the per-stratum rank becomes the k-smallest-hash threshold trick
    // (see sample_stratified); the quota math is unchanged.
    "sample_mixture_balance" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .withColumn("wt", when(col("lang") === "en", 5L)
          .when(col("lang") === "es", 2L).otherwise(1L))
      val m = counts.agg(min(expr("cnt * 10 div wt")).as("m"))
      val quota = counts.crossJoin(broadcast(m))
        .withColumn("k", expr("wt * m div 10"))
        .select("lang", "k")
      docs
        .withColumn("rn", row_number().over(w.partitionBy("lang")
          .orderBy(graft.olap.Sketch.spreadHash(col("doc_id")),
                   col("doc_id"))))
        .join(broadcast(quota), "lang")
        .filter(col("rn") <= col("k"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_selected"),
             min("doc_id").as("min_doc_id"),
             max("doc_id").as("max_doc_id"),
             sum("doc_id").as("sum_doc_id"))
        .orderBy("lang")
    }),

    // North-star quality-filter funnel: the cumulative-conjunction survival
    // count per pipeline stage (language -> length -> stopword ratio ->
    // repetition), i.e. the acceptance report a pretraining filter chain
    // emits. One scan; flags are per-row projections; the 5x explode is
    // map-side and partially aggregated.
    "pipeline_filter_funnel" -> ((s, dir) => {
      val flags = TextAnalysis.withTokenStats(Tables.documents(s, dir))
        .withColumn("stop_ratio",
          when(col("n_tokens") > 0,
            col("n_stopwords").cast("double")
              / col("n_tokens").cast("double")).otherwise(lit(0.0)))
        .withColumn("distinct_ratio",
          when(col("n_tokens") > 0,
            size(array_distinct(TextAnalysis.tokens("text"))).cast("double")
              / col("n_tokens").cast("double")).otherwise(lit(0.0)))
        .withColumn("c1", col("lang") === "en")
        .withColumn("c2", col("c1") && col("n_tokens").between(20, 500))
        .withColumn("c3", col("c2") && col("stop_ratio") >= lit(0.05))
        .withColumn("c4", col("c3") && col("distinct_ratio") >= lit(0.3))
      flags.select(col("doc_id"), explode(array(
          struct(lit("s0_all").as("stage"), lit(true).as("pass")),
          struct(lit("s1_lang").as("stage"), col("c1").as("pass")),
          struct(lit("s2_length").as("stage"), col("c2").as("pass")),
          struct(lit("s3_stopwords").as("stage"), col("c3").as("pass")),
          struct(lit("s4_repetition").as("stage"), col("c4").as("pass"))))
          .as("st"))
        .select(col("doc_id"), col("st.stage").as("stage"),
                col("st.pass").as("pass"))
        .groupBy("stage")
        .agg(sum(when(col("pass"), 1L).otherwise(0L)).as("n_docs"),
             sum(when(col("pass"), col("doc_id")).otherwise(0L))
               .as("sum_doc_id"))
        .orderBy("stage")
    }),

    // Graph analytics: fixed-iteration PageRank over the part<->supplier
    // bipartite graph from lineitem (both directions), quantized-integer
    // accumulation for bitwise reproducibility (graft.olap.PageRank).
    // Triangle counting with DEGREE-ORDERED ORIENTATION (the classic
    // scalable formulation): each undirected edge is directed from its
    // (degree, id)-smaller endpoint, so every triangle is generated by
    // exactly one wedge at its smallest-degree corner and the per-node
    // out-degree is bounded by ~sqrt(2m) — the wedge join cannot blow up
    // on hubs the way a naive neighbor self-join does. Graph = parts
    // co-purchased in the same order (order size is bounded, so edge
    // generation is linear in lineitems). The edge frame is persisted:
    // degrees, wedges, and closures all reuse one scan.
    "graph_triangles" -> ((s, dir) => {
      // shared pinned frames (GraphFrames): edges, degrees, orientation
      // AND sorted adjacency built once per process+SF — the
      // materialized-derived-table posture; clustering_coeff shares all 4
      val G = graft.olap.GraphFrames
      graft.olap.Triangles.stats(G.coPurchaseEdges(s, dir),
          G.coPurchaseDegrees(s, dir), G.coPurchaseOriented(s, dir),
          G.coPurchaseAdjacency(s, dir))
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
                (lit(3.0) * col("n_triangles").cast("double")
                  / col("n_wedges").cast("double")).as("transitivity"))
    }),

    // k-core peeling, 3 fixed rounds at k = median degree of the input
    // graph (exact positional order statistic): repeated degree count +
    // induced-subgraph semi-joins over a shrinking edge list — the
    // bounded-iteration shape shared with graph_pagerank.
    "graph_kcore" -> ((s, dir) => {
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      // peelStats is eager (per-round 1-row collects), so the base edge
      // cache can be released before returning the tiny result frame
      val out = graft.olap.KCore.peelStats(e, 3).orderBy("round")
      e.unpersist(false)
      out
    }),

    // Degree distribution in log₂ buckets — the first diagnostic run on
    // any production graph (power-law or not?): one degree count + one
    // bucket groupBy, both partial-aggregable, portable floor(log2).
    "graph_degree_distribution" -> ((s, dir) => {
      graft.olap.GraphFrames.partSuppDegrees(s, dir)
        .withColumn("bucket", (length(bin(col("d"))) - 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_nodes"), min(col("d")).as("min_degree"),
             max(col("d")).as("max_degree"))
        .orderBy("bucket")
    }),

    // Degree assortativity (Newman's r): do high-degree nodes attach to
    // high-degree nodes? Pearson correlation over the (deg(u), deg(v))
    // pairs of every directed edge — all sums are exact BIGINTs over
    // integer degrees (partial-aggregable; DECIMAL(38,0) where products
    // of sums appear), a single fixed IEEE chain at the end. Two keyed
    // joins to attach endpoint degrees, one global aggregate.
    "graph_assortativity" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("u"),
                           (col("l_suppkey") * 2 + 1).as("v"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("u"),
                               (col("l_partkey") * 2).as("v")))
      val deg = graft.olap.GraphFrames.partSuppDegrees(s, dir)
      val withDeg = e
        .join(deg.select(col("n").as("u"), col("d").as("ju")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("kv")), "v")
      val agg = withDeg.agg(
        count(lit(1)).as("m"),
        sum(col("ju") * col("kv")).as("sjk"),
        sum(col("ju") + col("kv")).as("sj"),
        sum(col("ju") * col("ju") + col("kv") * col("kv")).as("sj2"))
      // r = (4·m·Σjk − (Σ(j+k))²) / (2·m·Σ(j²+k²) − (Σ(j+k))²), the
      // standard formula cleared of fractions — every product taken in
      // DECIMAL(38,0) BEFORE any overflow can occur, one division
      val md = col("m").cast("decimal(38,0)")
      val sjd = col("sj").cast("decimal(38,0)")
      agg.select(col("m"),
        ((lit(4).cast("decimal(38,0)") * md * col("sjk") - sjd * sjd)
          .cast("double")
          / (lit(2).cast("decimal(38,0)") * md * col("sj2") - sjd * sjd)
            .cast("double"))
          .as("assortativity"))
    }),

    // Market-basket mining: top co-occurring part pairs across orders
    // with association confidence. Pair generation is a per-order
    // self-join — bounded by items-per-order (TPC-H ≈ 4, never corpus
    // size), the blocking that keeps basket mining feasible at any scale;
    // support and confidence are exact counts + one division each.
    "mine_frequent_pairs" -> ((s, dir) => {
      val items = graft.olap.GraphFrames.orderPartItems(s, dir)
      val itemCnt = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pairs = items.as("a")
        .join(items.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("n_pair"))
      pairs
        .join(itemCnt.select(col("pk").as("part_a"),
          col("n_item").as("n_a")), Seq("part_a"))
        .join(itemCnt.select(col("pk").as("part_b"),
          col("n_item").as("n_b")), Seq("part_b"))
        .select(col("part_a"), col("part_b"), col("n_pair"), col("n_a"),
          col("n_b"),
          (col("n_pair").cast("double") / col("n_a").cast("double"))
            .as("conf_a_b"))
        .orderBy(col("n_pair").desc, col("part_a"), col("part_b"))
        .limit(50)
    }),

    // Bounded BFS from the smallest node id over the bipartite
    // part–supplier graph: exact-distance frontier counts for 3 hops —
    // per hop one keyed join + distinct + anti-join vs visited, eagerly
    // materialized per round (the KCore discipline) so finished frontiers
    // release their caches.
    "graph_bfs_reach" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("src"),
                           (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                               (col("l_partkey") * 2).as("dst")))
      val source = e.agg(min(col("src")).as("node"))
      graft.olap.Bfs.distanceCounts(e, source, 3).orderBy("distance")
    }),

    // Label-propagation community detection over the bipartite
    // part–supplier graph, 2 fixed rounds: most-frequent neighbor label,
    // ties to the smallest — per round one keyed join + two
    // partial-aggregable aggregates (the max_by packs (count, −label) so
    // the tie-break rides inside the lexicographic max). Output is the
    // community-size histogram.
    "graph_label_prop" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("src"),
                           (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                               (col("l_partkey") * 2).as("dst")))
      graft.olap.LabelProp.labels(e, 2)
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("community")
    }),

    "graph_pagerank" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val fwd = pairs.select((col("l_partkey") * 2).as("src"),
                             (col("l_suppkey") * 2 + 1).as("dst"))
      val rev = pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                             (col("l_partkey") * 2).as("dst"))
      graft.olap.PageRank.run(fwd.union(rev), "src", "dst", iterations = 3)
        .withColumn("node_type",
          when(col("node_id") % 2 === 0, "part").otherwise("supplier"))
        .select("node_id", "node_type", "rank")
        .orderBy(col("rank").desc, col("node_id"))
        .limit(50)
    }),

    // North-star frequency sketch: count-min over the corpus token stream
    // (depth 3 × width 1024). Counters are order-independent sums —
    // mergeable by addition, bitwise-deterministic; the sketch is d·w rows
    // regardless of corpus size, so estimate lookups broadcast it. Output:
    // top-20 tokens with exact counts next to CMS estimates (never an
    // underestimate — spec-pinned).
    "sketch_cms_topk" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens("text")).as("token"))
      val cms = graft.olap.Sketch.cmsBuild(toks, col("token"), w = 1024)
      val est = graft.olap.Sketch.cmsEstimate(toks, col("token"), cms,
        w = 1024)
      toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .join(est, col("token") === est("item"))
        .select(col("token"), col("exact_n"), col("est_n"))
        .orderBy(col("exact_n").desc, col("token").asc)
        .limit(20)
    }),

    // Mergeable approximate quantiles: invert the CDF of the fixed-width
    // histogram (the histogram is additive across shards — the same merge
    // contract as the KMV/CMS sketches — so p50/p90/p99 come from a
    // bin-count frame thousands of times smaller than the data). Exact
    // positional percentiles ride along for the error to be visible.
    "sketch_histogram_quantiles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val binW = 1000L // cents: $10 bins
      val v = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("cents"))
      val n = v.groupBy("event_type").agg(count(lit(1)).as("n"))
      val cum = v
        .groupBy(col("event_type"), expr(s"cents div $binW").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          w.partitionBy("event_type").orderBy("bin")
            .rowsBetween(w.unboundedPreceding, w.currentRow)))
      val ps = n.select(col("event_type"), col("n"),
          explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
        .withColumn("k", expr("(n * p + 99) div 100"))
      val est = cum.join(broadcast(ps), "event_type")
        .filter(col("cum") >= col("k"))
        .groupBy("event_type", "p").agg(min("bin").as("est_bin"))
        .withColumn("est_value",
          (col("est_bin") * binW + binW / 2).cast("double") / lit(100.0))
      val exact = v
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("cents")))
        .join(broadcast(ps), "event_type")
        .filter(col("rn") === col("k"))
        .select(col("event_type"), col("p"),
          (col("cents").cast("double") / lit(100.0)).as("exact_value"))
      est.join(exact, Seq("event_type", "p"))
        .select("event_type", "p", "est_value", "exact_value")
        .orderBy("event_type", "p")
    }),

    // The composed pretraining pipeline, end-to-end in ONE declarative
    // plan: quality filter -> normalized dedup (keep min doc per key) ->
    // deterministic train split -> 256-token sequence packing. Each stage
    // is an already-verified operator; composing them costs no extra
    // passes — Catalyst pipelines the filters/projections into the scans
    // and the only shuffles are the dedup key, the split-survivor prefix
    // sum, and the final per-sequence aggregate.
    "pipeline_pretrain_e2e" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val kept = TextAnalysis.withTokenStats(Tables.documents(s, dir))
        .withColumn("stop_ratio",
          when(col("n_tokens") > 0,
            col("n_stopwords").cast("double")
              / col("n_tokens").cast("double")).otherwise(lit(0.0)))
        .withColumn("distinct_ratio",
          when(col("n_tokens") > 0,
            size(array_distinct(TextAnalysis.tokens("text"))).cast("double")
              / col("n_tokens").cast("double")).otherwise(lit(0.0)))
        .filter(col("lang") === "en" && col("n_tokens").between(20, 500)
          && col("stop_ratio") >= lit(0.05)
          && col("distinct_ratio") >= lit(0.3))
      val deduped = kept
        .withColumn("norm_text", trim(regexp_replace(
          translate(col("text"), TextAnalysis.asciiUpper,
            TextAnalysis.asciiLower),
          "[ \\t\\n\\r\\f\\x0B]+", " ")))
        .withColumn("rn", row_number().over(
          w.partitionBy("norm_text").orderBy("doc_id")))
        .filter(col("rn") === 1)
      val train = deduped
        .filter((graft.olap.Sketch.spreadHash(col("doc_id")) % 100) < 90)
        .select(col("doc_id"), col("n_tokens"))
      graft.text.Packing
        .packSequences(train, "doc_id", "n_tokens", seqLen = 256L,
          bucketSize = 100L)
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_overlap").as("n_tokens"),
             min("doc_id").as("min_doc_id"),
             max("doc_id").as("max_doc_id"))
        .orderBy("seq_id")
    }),

    // The pure-SQL entry path: the registered function surface
    // (GraftExtensions.registerAll) driving a query through spark.sql —
    // the engine's custom codegen expressions are first-class SQL
    // citizens, not just DataFrame helpers. Same plan as the DataFrame
    // formulation (the parser resolves to the identical expressions).
    "sql_api_dedup_report" -> ((s, dir) => {
      GraftExtensions.registerAll(s)
      Tables.documents(s, dir).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT simhash32(text) AS sh,
               count(*) AS n_docs,
               min(doc_id) AS min_doc_id,
               min(doc_fingerprint(text)) AS min_fingerprint
        FROM documents_v
        GROUP BY simhash32(text)
        ORDER BY n_docs DESC, sh ASC
        LIMIT 25""")
    }),

    // IR: inverted-index build — token -> posting statistics (document
    // frequency, total term frequency, span, and an order-independent
    // postings checksum so the full posting list is verified without
    // emitting arrays). One explode + one partial-aggregable groupBy; at
    // 100 TB this is the standard index-build shuffle keyed by token.
    "text_inverted_index" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens("text")).as(Seq("pos", "token")))
      toks.groupBy("token")
        .agg(countDistinct("doc_id").as("df"),
             count(lit(1)).as("total_tf"),
             min("doc_id").as("first_doc"),
             max("doc_id").as("last_doc"),
             sum((col("doc_id") * lit(131071L) + col("pos"))
               % lit(2147483647L)).as("postings_checksum"))
        .orderBy(col("total_tf").desc, col("token").asc)
        .limit(100)
    }),

    // Matryoshka-style prefix-dimension retrieval QA: does the top-1
    // neighbor under the first-16-dims cosine agree with the full-dim
    // top-1? The MRL question every embedding-truncation rollout asks.
    // Broadcast query set × corpus scan (the sim_bruteforce shape), both
    // argmaxes as partial-aggregable max_by with (cosine, −vec_id) ties —
    // no windows over the corpus.
    "emb_matryoshka_agreement" -> ((s, dir) => {
      import graft.functions.VecOps
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val c = emb.filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("embedding").as("e"))
      val qp = slice(col("qe"), 1, 16)
      val ep = slice(col("e"), 1, 16)
      c.crossJoin(broadcast(q))
        .select(col("q_id"), col("vec_id"),
          VecOps.cosine(col("qe"), col("e")).as("cos_full"),
          (VecOps.dot(qp, ep)
            / (sqrt(VecOps.dot(qp, qp)) * sqrt(VecOps.dot(ep, ep))))
            .as("cos_pre"))
        .groupBy("q_id")
        .agg(
          max_by(col("vec_id"), struct(col("cos_full"), negate(col("vec_id"))))
            .as("top1_full"),
          max_by(col("vec_id"), struct(col("cos_pre"), negate(col("vec_id"))))
            .as("top1_prefix"))
        .select(col("q_id"), col("top1_full"), col("top1_prefix"),
                (col("top1_full") === col("top1_prefix")).as("agree"))
        .orderBy("q_id")
    }),

    // Embedding drift monitor: L2 distance between per-language centroids
    // of two corpus halves (doc-id parity split) — the "did my embedding
    // distribution move" check a pipeline runs between snapshots. All
    // arithmetic is exact until one final sqrt: quantized BIGINT sums per
    // (lang, dim), the mean difference cross-multiplied to the common
    // denominator (s1·n2 − s2·n1, squared in DECIMAL(38,0) so 64-dim sums
    // cannot overflow), one cast + sqrt + division at the end.
    "emb_centroid_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .join(Tables.documents(s, dir)
          .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
      val dims = emb
        .select(col("lang"), (col("vec_id") % 2 === 0).as("h1"),
          posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("lang"), col("h1"), col("i"),
          floor(col("x").cast("double") * lit(65536.0)).cast("long")
            .as("q"))
      val perDim = dims.groupBy("lang", "i")
        .agg(sum(when(col("h1"), col("q")).otherwise(0L)).as("s1"),
             sum(when(!col("h1"), col("q")).otherwise(0L)).as("s2"),
             sum(when(col("h1"), 1L).otherwise(0L)).as("n1"),
             sum(when(!col("h1"), 1L).otherwise(0L)).as("n2"))
        .withColumn("d",
          // cast BEFORE the cross-multiply: s1·n2 at corpus scale can
          // overflow BIGINT (Spark wraps silently; DuckDB's HUGEINT does
          // not) — the decimal(38,0) widening must wrap the operands,
          // mirroring the oracle's CAST(... AS HUGEINT) placement
          (col("s1").cast("decimal(38,0)") * col("n2").cast("decimal(38,0)")
            - col("s2").cast("decimal(38,0)")
              * col("n1").cast("decimal(38,0)")))
      perDim.groupBy("lang")
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
             sum(col("d") * col("d")).as("sd2"))
        .select(col("lang"), col("n1"), col("n2"),
          (sqrt(col("sd2").cast("double"))
            / (col("n1") * col("n2")).cast("double")
            / lit(65536.0)).as("drift"))
        .orderBy("lang")
    }),

    // Embedding analytics: dimension-correlation matrix from one pass of
    // exact quantized sums (floor(x·2^16) — float→double→·2^16→floor are
    // all IEEE-exact, sums are BIGINT and order-independent), then a
    // fixed-order double formula per pair; sqrt is IEEE correctly-rounded,
    // so the correlations are bitwise-portable. Top-10 |corr| pairs. Pair
    // products come from a vec_id self-join of the exploded dims (64²
    // rows/vector, partial-aggregated map-side before the 2016-key
    // shuffle).
    "emb_dim_correlation" -> ((s, dir) => {
      val dims = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("p", "x")))
        .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
          floor(col("x").cast("double") * lit(65536.0)).as("q"))
      val stats = dims.groupBy("i")
        .agg(count(lit(1)).as("n"), sum("q").as("s"),
             sum(col("q") * col("q")).as("ss"))
      val a = dims.select(col("vec_id"), col("i"), col("q"))
      val b = dims.select(col("vec_id"), col("i").as("j"),
        col("q").as("qj"))
      val pairs = a.join(b, "vec_id").filter(col("i") < col("j"))
        .groupBy("i", "j").agg(sum(col("q") * col("qj")).as("sp"))
      val si = broadcast(stats.select(col("i"), col("n"),
        col("s").as("si"), col("ss").as("ssi")))
      val sj = broadcast(stats.select(col("i").as("j"),
        col("s").as("sj"), col("ss").as("ssj")))
      val nD = col("n").cast("double")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      pairs.join(si, "i").join(sj, "j")
        .withColumn("corr",
          (nD * d(col("sp")) - d(col("si")) * d(col("sj")))
            / (sqrt(nD * d(col("ssi")) - d(col("si")) * d(col("si")))
               * sqrt(nD * d(col("ssj")) - d(col("sj")) * d(col("sj")))))
        .select(col("i").as("dim_i"), col("j").as("dim_j"), col("corr"),
          abs(col("corr")).as("corr_abs"))
        .orderBy(col("corr_abs").desc, col("dim_i"), col("dim_j"))
        .limit(10)
    }),

    // Record linkage: blocking + edit-distance verify (the fuzzy-match
    // pattern: a cheap equi-join block key bounds the candidate pairs,
    // then Levenshtein — available and identical in both engines — scores
    // only the pairs that survive). The block key is (lang, length
    // bucket, first token): blocking must keep blocks small enough that
    // the quadratic-per-block verify stays linear overall — the coarse
    // (lang, length) key alone left ~100k pairs at sf0.1 (90 s of DP);
    // adding the first token cuts that 30×. Aggregated per language.
    "link_block_levenshtein" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"),
          expr("n_chars div 16").as("blk"),
          substring_index(col("text"), " ", 1).as("ft"))
      val a = d.select(col("doc_id").as("id_a"), col("lang"), col("blk"),
        col("ft"), col("text").as("text_a"))
      val b = d.select(col("doc_id").as("id_b"), col("lang"), col("blk"),
        col("ft"), col("text").as("text_b"))
      a.join(b, Seq("lang", "blk", "ft")).filter(col("id_a") < col("id_b"))
        // spread pairs before the quadratic DP — see link_block_damerau
        .repartition(32, col("id_a"), col("id_b"))
        .withColumn("lev", levenshtein(col("text_a"), col("text_b"))
          .cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_pairs"),
             min("lev").as("min_lev"),
             sum("lev").as("sum_lev"),
             sum(when(col("lev") <= 64, 1L).otherwise(0L)).as("n_close"))
        .orderBy("lang")
    }),

    // Record linkage with the unrestricted Damerau–Levenshtein distance —
    // a custom codegen Catalyst expression (Spark ships only plain
    // levenshtein); same prune-then-verify blocking as
    // link_block_levenshtein, and the integer distances cross-check
    // bitwise against DuckDB's built-in damerau_levenshtein on every
    // surviving pair.
    "link_block_damerau" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"),
          expr("n_chars div 16").as("blk"),
          substring_index(col("text"), " ", 1).as("ft"))
      val a = d.select(col("doc_id").as("id_a"), col("lang"), col("blk"),
        col("ft"), col("text").as("text_a"))
      val b = d.select(col("doc_id").as("id_b"), col("lang"), col("blk"),
        col("ft"), col("text").as("text_b"))
      a.join(b, Seq("lang", "blk", "ft")).filter(col("id_a") < col("id_b"))
        // spread the candidate pairs uniformly BEFORE the O(len²) DP: the
        // block join leaves them partitioned by (lang, blk, ft) — a few
        // hot blocking keys concentrate the quadratic work in 1-2 tasks
        // (measured: wall ≈ cpu, i.e. single-threaded). The partition
        // count must be EXPLICIT: AQE sizes shuffles by bytes, and these
        // few-MB pair rows coalesce straight back into one task while
        // their per-row cost is quadratic in text length (measured: the
        // no-number form re-serialized the DP). 32 = the local lane
        // count; a cluster deployment sizes this like any other
        // compute-bound stage, by cores not bytes.
        .repartition(32, col("id_a"), col("id_b"))
        .withColumn("dl", graft.functions.DamerauLevenshtein
          .damerau_levenshtein(col("text_a"), col("text_b")).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_pairs"),
             min("dl").as("min_dl"),
             sum("dl").as("sum_dl"),
             sum(when(col("dl") <= 64, 1L).otherwise(0L)).as("n_close"))
        .orderBy("lang")
    }),

    // Gaps-and-islands: longest up/down streak of daily closes per series
    // via the rank-difference trick (two keyed row_numbers, no iteration).
    // Calendar completeness audit per series: expected weekdays between
    // the series' own first and last bar vs the weekday bars actually
    // present — the missing-bar count a market-data QA job alerts on.
    // The per-series day range explodes from a 1-row-per-series bound
    // frame (sequence + explode), never from the bar rows themselves.
    "ts_calendar_gaps" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"))
      val isWeekday = !dayofweek(col("day")).isin(1, 7)
      val bounds = bars.groupBy("event_type")
        .agg(min(col("date")).as("dmin"), max(col("date")).as("dmax"),
             countDistinct(when(!dayofweek(col("date")).isin(1, 7),
               col("date"))).as("n_observed"))
      bounds
        .withColumn("day", explode(sequence(col("dmin"), col("dmax"))))
        .filter(isWeekday)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_expected"),
             max(col("n_observed")).as("n_observed"))
        .select(col("event_type"), col("n_expected"), col("n_observed"),
                (col("n_expected") - col("n_observed")).as("n_missing"))
        .orderBy("event_type")
    }),

    // Regular-grid resample + forward fill (pandas resample().ffill()):
    // project each series onto a uniform 6-hour grid spanning its own
    // range, carrying the last event value at-or-before each grid point
    // via the engine's as-of join. The grid explodes from a
    // 1-row-per-series bounds frame, so grid generation is never
    // proportional to event rows; the fill is one keyed as-of shuffle.
    "ts_resample_grid_ffill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("value"))
      val grid = ev.groupBy("event_type")
        .agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
        .withColumn("ts", explode(sequence(
          date_trunc("hour", col("tmin")),
          col("tmax"), expr("INTERVAL 6 HOURS"))))
        .select("event_type", "ts")
      graft.ts.AsOfJoin.asOf(grid, ev, Seq("event_type"), "ts",
          Seq("value"))
        .select(col("event_type"), col("ts"),
                col("asof_ts"), col("asof_value"))
        .orderBy("event_type", "ts")
    }),

    // Regular-grid resample + LINEAR INTERPOLATION (pandas
    // resample().interpolate()): each 6-hour grid point takes
    // prev + (next − prev)·(t − t_prev)/(t_next − t_prev) between its
    // surrounding events — backward and forward as-of joins supply the
    // brackets, the fraction is µs-exact integers divided once. Grid
    // boundary rows (no bracket on one side) carry the available side.
    "ts_resample_interpolate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("value"))
      val grid = ev.groupBy("event_type")
        .agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
        .withColumn("ts", explode(sequence(
          date_trunc("hour", col("tmin")),
          col("tmax"), expr("INTERVAL 6 HOURS"))))
        .select("event_type", "ts")
      val back = graft.ts.AsOfJoin.asOf(grid, ev, Seq("event_type"), "ts",
          Seq("value"))
        .select(col("event_type"), col("ts"),
                col("asof_ts").as("bt"), col("asof_value").as("bv"))
      val fwd = graft.ts.AsOfJoin.asOfForward(grid, ev, Seq("event_type"),
          "ts", Seq("value"))
        .select(col("event_type"), col("ts"),
                col("asof_ts").as("ft"), col("asof_value").as("fv"))
      val t = unix_micros(col("ts"))
      val bt = unix_micros(col("bt"))
      val ft = unix_micros(col("ft"))
      back.join(fwd, Seq("event_type", "ts"))
        .withColumn("interp",
          when(col("bt").isNull, col("fv"))
            .when(col("ft").isNull, col("bv"))
            .when(col("ft") === col("bt"), col("bv"))
            .otherwise(col("bv") + (col("fv") - col("bv"))
              * ((t - bt).cast("double") / (ft - bt).cast("double"))))
        .select(col("event_type"), col("ts"), col("bt"), col("ft"),
                col("interp"))
        .orderBy("event_type", "ts")
    }),

    // Sequential pattern matching (the MATCH_RECOGNIZE shape): count
    // down-down-up reversals per series via a lag chain over exact
    // cents — keyed window, three comparisons, one partial-aggregable
    // summary; ties (flat days) count as neither down nor up.
    "ts_pattern_ddu" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("c1", lag(col("c"), 1).over(w))
        .withColumn("c2", lag(col("c"), 2).over(w))
        .withColumn("c3", lag(col("c"), 3).over(w))
        .withColumn("is_ddu",
          when(col("c3").isNotNull &&
               col("c2") < col("c3") && col("c1") < col("c2") &&
               col("c") > col("c1"), 1L)
            .otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             sum(col("is_ddu")).as("n_patterns"),
             min(when(col("is_ddu") === 1, col("date"))).as("first_hit"))
        .orderBy("event_type")
    }),

    // Running distinct users per series — the cumulative-cardinality
    // curve, computed WITHOUT any running distinct state: a user's first
    // (series, date) is one groupBy min, the per-date first-seen counts
    // are partial-aggregable, and the running sum is a keyed window over
    // date rows (one per series·day). The trick that turns an O(n·d)
    // distinct-scan into two aggregates + a tiny window.
    "ts_running_distinct_users" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val firstSeen = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
                col("ts").cast("date").as("date"))
        .groupBy("event_type", "user_id")
        .agg(min(col("date")).as("first_date"))
      firstSeen.groupBy(col("event_type"), col("first_date").as("date"))
        .agg(count(lit(1)).as("n_new"))
        .withColumn("cum_distinct_users", sum(col("n_new")).over(w))
        .orderBy("event_type", "date")
    }),

    // Right-to-erasure propagation (the GDPR deletion sweep): a
    // deterministic erasure list (user_id ≡ 0 mod 97) anti-joins through
    // every user-keyed table; the report shows per-table rows erased vs
    // retained — the audit evidence a deletion job must emit. Broadcast
    // erasure set, one anti/semi-join pair per table, no full rewrite in
    // the query (the write is the sink's idempotent append of survivors).
    "inc_gdpr_erasure" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val erase = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 97 === 0)
      val evErased = ev.join(broadcast(erase), Seq("user_id"), "leftsemi")
        .agg(count(lit(1)).as("n_erased"))
      val evKept = ev.join(broadcast(erase), Seq("user_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"))
      val sess = graft.ts.Sessionize
        .sessions(ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("ts"), col("value")),
          "user_id", "ts", "value", 1800)
      val seErased = sess.join(broadcast(erase), Seq("user_id"), "leftsemi")
        .agg(count(lit(1)).as("n_erased"))
      val seKept = sess.join(broadcast(erase), Seq("user_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"))
      val s1 = evErased.crossJoin(evKept)
        .select(lit("events").as("table_name"), col("n_erased"),
                col("n_kept"))
      val s2 = seErased.crossJoin(seKept)
        .select(lit("view_sessions").as("table_name"), col("n_erased"),
                col("n_kept"))
      s1.unionByName(s2).orderBy("table_name")
    }),

    // Data freshness report — the staleness check an incremental
    // pipeline alerts on: per series, last event time and its lag behind
    // the globally freshest series, in exact microseconds.
    "wm_freshness_report" -> ((s, dir) => {
      val last = Tables.events(s, dir)
        .groupBy("event_type").agg(max(col("ts")).as("last_event"))
      val global = last.agg(max(col("last_event")).as("global_max"))
      last.crossJoin(broadcast(global))
        .select(col("event_type"), col("last_event"),
          expr("(unix_micros(global_max) - unix_micros(last_event)) " +
               "DIV 1000000").as("lag_seconds"))
        .orderBy("event_type")
    }),

    // Cross-series return correlation matrix (the portfolio risk
    // diagonal's off-diagonal): Pearson r for every series pair over
    // date-aligned quantized returns — the ts_beta template applied
    // pairwise, exact BIGINT cross-sums, DECIMAL products of sums, one
    // fixed final chain per pair. The date equi-join aligns pairs; pair
    // count is (k choose 2) over a handful of series, never data-sized.
    "ts_corr_matrix" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("date"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("r"))
      val a = rq.select(col("event_type").as("type_a"), col("date"),
                        col("r").as("x"))
      val b = rq.select(col("event_type").as("type_b"), col("date"),
                        col("r").as("y"))
      val agg = a.join(b, "date").filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      agg.select(col("type_a"), col("type_b"), col("n"),
        ((nd * col("sxy") - d(col("sx")) * col("sy")).cast("double")
          / (sqrt((nd * col("sxx") - d(col("sx")) * col("sx"))
               .cast("double"))
             * sqrt((nd * col("syy") - d(col("sy")) * col("sy"))
               .cast("double"))))
          .as("corr"))
        .orderBy("type_a", "type_b")
    }),

    // Realized volatility per series: sqrt(Σ r²) over the once-quantized
    // daily returns — the exact-integer sum of squares makes the whole
    // statistic one sqrt + one division from a BIGINT.
    "ts_realized_vol" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("rq"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("rq") * col("rq")).as("s2"))
        .select(col("event_type"), col("n"),
          (sqrt(col("s2").cast("double")) / lit(1048576.0))
            .as("realized_vol"))
        .orderBy("event_type")
    }),

    // Lag-1 autocorrelation of daily returns per series (the momentum /
    // mean-reversion diagnostic): Pearson r over (return_t, return_{t-1})
    // pairs with the same once-quantized returns as ts_beta — every
    // cross-sum exact BIGINT, products of sums in DECIMAL(38,0), one
    // final fixed IEEE chain (two sqrts + a division).
    "ts_autocorr_lag1" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("date"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("x"))
      val pairs = rq
        .withColumn("y", lag(col("x"), 1).over(w))
        .filter(col("y").isNotNull)
      val agg = pairs.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      agg.select(col("event_type"), col("n"),
        ((nd * col("sxy") - d(col("sx")) * col("sy")).cast("double")
          / (sqrt((nd * col("sxx") - d(col("sx")) * col("sx"))
               .cast("double"))
             * sqrt((nd * col("syy") - d(col("sy")) * col("sy"))
               .cast("double"))))
          .as("autocorr_lag1"))
        .orderBy("event_type")
    }),

    // Per-series market beta — the reference domain's flagship analytic:
    // β = cov(series, market) / var(market) over daily returns, with the
    // market as the equal-weight basket of all series. Returns are
    // quantized once (floor(r·2²⁰), a fixed IEEE chain), so every
    // covariance term is an exact BIGINT sum; with m the per-date SUM of
    // quantized returns (n·mean), β = n·(TΣxm − ΣxΣm)/(TΣm² − (Σm)²) —
    // products of sums in DECIMAL(38,0), one final division.
    "ts_beta" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("date"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("rq"))
      val nSeries = rq.agg(countDistinct(col("event_type")).as("n"))
      // market: per-date sum over ALL series, kept only where every
      // series traded (so n is a constant scale, not a per-date one)
      val mkt = rq.groupBy("date")
        .agg(sum(col("rq")).as("m"), count(lit(1)).as("k"))
        .crossJoin(broadcast(nSeries))
        .filter(col("k") === col("n"))
        .select(col("date"), col("m"), col("n"))
      rq.join(mkt, "date")
        .groupBy("event_type")
        .agg(count(lit(1)).as("t"),
             sum(col("rq") * col("m")).as("sxm"),
             sum(col("rq")).as("sx"),
             sum(col("m")).as("sm"),
             sum(col("m") * col("m")).as("smm"),
             max(col("n")).as("n"))
        .select(col("event_type"), col("t"),
          (col("n").cast("decimal(38,0)")
            * (col("t").cast("decimal(38,0)") * col("sxm")
               - col("sx").cast("decimal(38,0)") * col("sm")))
            .cast("double")
            ./((col("t").cast("decimal(38,0)") * col("smm")
                - col("sm").cast("decimal(38,0)") * col("sm"))
              .cast("double"))
            .as("beta"))
        .orderBy("event_type")
    }),

    // Min-max feature scaling per series (the preprocessing normalizer):
    // scaled = (c − min)/(max − min) from exact cents, one division per
    // row against broadcast per-series bounds; constant series scale to
    // 0.5 by convention (not NaN).
    "ts_minmax_scale" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
      val bounds = bars.groupBy("event_type")
        .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
      bars.join(broadcast(bounds), "event_type")
        .select(col("event_type"), col("date"),
          when(col("cmax") === col("cmin"), lit(0.5))
            .otherwise((col("c") - col("cmin")).cast("double")
              / (col("cmax") - col("cmin")).cast("double"))
            .as("scaled"))
        .orderBy("event_type", "date")
    }),

    // Theil–Sen robust trend per series: the positional median of all
    // pairwise slopes (y_j−y_i)/(j−i) over the daily bars — the
    // outlier-immune counterpart of ts_linreg_trend's OLS. Slopes are one
    // IEEE division of exact integers (deterministic bits on any engine);
    // the median is a keyed positional pick with (slope, i, j) totalized.
    // O(n²) pairs per series, bounded by daily-bar counts (same posture
    // as the EMA prefix form: 10³ bars/decade regardless of tick volume),
    // and the window is keyed by series — never global.
    "ts_theil_sen" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val b = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("cents"))
        .withColumn("i", row_number().over(
          w.partitionBy("event_type").orderBy("date")))
      val x = b.select(col("event_type"), col("i").as("ia"),
                       col("cents").as("ca"))
      val y = b.select(col("event_type"), col("i").as("ib"),
                       col("cents").as("cb"))
      val pairs = x.join(y, Seq("event_type")).filter(col("ia") < col("ib"))
        .select(col("event_type"), col("ia"), col("ib"),
          ((col("cb") - col("ca")).cast("double")
            / (col("ib") - col("ia")).cast("double")).as("slope"))
      val ws = w.partitionBy("event_type")
        .orderBy(col("slope"), col("ia"), col("ib"))
      pairs
        .withColumn("rn", row_number().over(ws))
        .withColumn("m", count(lit(1)).over(w.partitionBy("event_type")))
        .filter(col("rn") === expr("(m + 1) DIV 2"))
        .select(col("event_type"), col("slope").as("theil_sen_slope"),
                col("m").as("n_pairs"))
        .orderBy("event_type")
    }),

    // Changepoint detection per series: the point where the prefix sum
    // deviates most from uniform drift — argmax_i |n·S_i − i·S_n| over
    // exact cent integers (the CUSUM-style statistic with the mean
    // factored out so no division ever happens; ties → earliest date).
    // Keyed window prefix sum + partial-aggregable argmax; magnitudes
    // bounded by n·S_n ≈ 10¹³ at sf0.1, far inside BIGINT even at 100×.
    "ts_changepoint" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("cents"))
      val p = bars
        .withColumn("i", row_number().over(
          w.partitionBy("event_type").orderBy("date")).cast("long"))
        .withColumn("s", sum(col("cents")).over(
          w.partitionBy("event_type").orderBy("date")
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      val t = p.groupBy("event_type")
        .agg(max(col("i")).as("n"), sum(col("cents")).as("sn"))
      p.join(t, "event_type")
        .withColumn("stat", abs(col("n") * col("s") - col("i") * col("sn")))
        .withColumn("d", datediff(col("date"), lit("1970-01-01")))
        .groupBy("event_type")
        .agg(max(col("n")).as("n_days"),
             max_by(col("date"), struct(col("stat"), negate(col("d"))))
               .as("change_date"),
             max(col("stat")).as("max_stat"))
        .orderBy("event_type")
    }),

    "ts_streaks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select("event_type", "date", "close")
      val wd = w.partitionBy("event_type").orderBy("date")
      val dir0 = bars.withColumn("prev", lag("close", 1).over(wd))
        .filter(col("prev").isNotNull)
        .withColumn("dir",
          when(col("close") > col("prev"), lit("up")).otherwise(lit("down")))
      val isl = dir0.withColumn("island",
        row_number().over(wd)
          - row_number().over(w.partitionBy("event_type", "dir")
              .orderBy("date")))
      isl.groupBy("event_type", "dir", "island")
        .agg(count(lit(1)).as("len"))
        .groupBy("event_type")
        .agg(max(when(col("dir") === "up", col("len"))).as("max_up_streak"),
             max(when(col("dir") === "down", col("len")))
               .as("max_down_streak"),
             sum(when(col("dir") === "up", 1L).otherwise(0L))
               .as("n_up_streaks"),
             sum(when(col("dir") === "down", 1L).otherwise(0L))
               .as("n_down_streaks"))
        .orderBy("event_type")
    }),

    // Imputation: last-observation-carried-forward over a complete daily
    // spine (bars thinned deterministically to exercise the fill). The
    // fill is last(ignoreNulls) over a keyed window — one exchange on the
    // series key, linear state.
    "ts_locf_impute" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select("event_type", "date", "close")
      val thinned = bars.filter(dayofmonth(col("date")) % 3 =!= 0)
      val spine = bars.groupBy("event_type")
        .agg(min("date").as("d0"), max("date").as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("date"))
      spine.join(thinned, Seq("event_type", "date"), "left")
        .withColumn("close_filled",
          last("close", ignoreNulls = true).over(
            w.partitionBy("event_type").orderBy("date")
              .rowsBetween(w.unboundedPreceding, w.currentRow)))
        .withColumn("is_imputed", col("close").isNull)
        .orderBy("event_type", "date")
    }),

    // Robust statistics: median + MAD (median absolute deviation) per
    // series in exact integer cents — positional selection over keyed
    // ranks, so the "median" is an existing value and every comparison is
    // integer-exact; outliers = |v - med| > 3·MAD.
    "agg_mad_outliers" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("cents"))
      val n = v.groupBy("event_type").agg(count(lit(1)).as("n"))
      val med = v
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("cents")))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("cents").as("med_cents"))
      val dev = v.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cents") - col("med_cents")))
      val mad = dev
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("adev")))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("adev").as("mad_cents"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(count(lit(1)).as("n"),
             sum(when(col("adev") > col("mad_cents") * 3, 1L).otherwise(0L))
               .as("n_outliers"))
        .select(col("event_type"), col("n"),
          (col("med_cents").cast("double") / lit(100.0)).as("median_value"),
          (col("mad_cents").cast("double") / lit(100.0)).as("mad_value"),
          col("n_outliers"))
        .orderBy("event_type")
    }),

    // Set algebra over customer cohorts (1995 vs 1996 order years) as ONE
    // partial-aggregable pass: per-key membership flags, then counts of
    // intersection / differences / union — the plan you want instead of
    // four separate INTERSECT/EXCEPT scans (equality with Spark's
    // intersect()/except() operators is spec-pinned).
    "set_ops_customers" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
        .filter(col("y").isin(1995, 1996))
      o.groupBy("o_custkey")
        .agg(max(when(col("y") === 1995, 1L).otherwise(0L)).as("in95"),
             max(when(col("y") === 1996, 1L).otherwise(0L)).as("in96"))
        .agg(sum("in95").as("n_1995"),
             sum("in96").as("n_1996"),
             sum(col("in95") * col("in96")).as("n_both"),
             sum(col("in95") * (lit(1L) - col("in96"))).as("n_only_1995"),
             sum((lit(1L) - col("in95")) * col("in96")).as("n_only_1996"),
             count(lit(1)).as("n_union"))
    }),

    // North-star decontamination: corpus documents sharing any word-5-gram
    // with a benchmark set (here: doc_id < 20 standing in for the eval
    // suite). Benchmark gram set broadcasts; the corpus side is one scan +
    // map-side semi-join — the standard eval-leak check at 100 TB.
    "text_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(col("doc_id") < 20)
        .select(explode(NgramJaccard.gram_hashes(col("text"), 5))
          .as("gram")).distinct()
      docs.filter(col("doc_id") >= 20)
        .select(col("doc_id"),
          explode(NgramJaccard.gram_hashes(col("text"), 5)).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared_grams"))
        .orderBy("doc_id")
    }),

    // North-star text analysis: corpus vocabulary — token frequencies,
    // top-k (explode → count → distributed top-k).
    "text_vocab_topk" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens("text")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(50)),

    // Zipf frequency spectrum: tokens bucketed by floor(log2(frequency))
    // (exact bit-length — the engine's portable log2), with the corpus'
    // Zipf exponent proxied by an exact-integer OLS slope over
    // (bucket, floor(log2(tokens in bucket))). The spectrum formulation
    // needs NO global rank — a per-token rank is a vocabulary-sized
    // total order (the thing a 100 TB corpus can't window), while the
    // spectrum is one partial-aggregable groupBy cascade; all sums are
    // exact longs, one final IEEE division for the slope.
    "text_zipf_spectrum" -> ((s, dir) => {
      val freq = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens("text")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"))
      // ~log2(corpus size) rows, but its lineage is the full token scan —
      // cache: it feeds both the report rows and the slope points
      val spec = freq
        .groupBy((length(bin(col("tf"))) - 1).cast("long").as("b"))
        .agg(count(lit(1)).as("n_tokens"),
             sum(col("tf")).as("n_occurrences"))
        .tracked
      val pts = spec.select(col("b"),
        (length(bin(col("n_tokens"))) - 1).cast("long").as("y"))
      val slope = pts.agg(count(lit(1)).as("n"), sum("b").as("sx"),
          sum("y").as("sy"), sum(col("b") * col("y")).as("sxy"),
          sum(col("b") * col("b")).as("sx2"))
        .select(((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
          / (col("n") * col("sx2") - col("sx") * col("sx")).cast("double"))
          .as("zipf_slope"))
      spec.crossJoin(broadcast(slope)).orderBy("b")
    }),

    // North-star text analysis: tokenization + whitespace/BPE-ish/stopword
    // counting.
    "text_token_stats" -> ((s, dir) =>
      TextAnalysis.withTokenStats(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "n_ws_tokens", "n_subwords",
                "n_stopwords", "avg_word_len")
        .orderBy("doc_id")),

    // North-star text analysis: quality scoring (pure-arithmetic ratios).
    "text_quality" -> ((s, dir) =>
      TextAnalysis.withQuality(Tables.documents(s, dir))
        .select("doc_id", "punct_ratio", "stopword_ratio", "quality_score")
        .orderBy("doc_id")),

    // North-star text analysis: marker-based language ID with a
    // deterministic priority cascade.
    "text_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir))
        .select("doc_id", "score_en", "score_de", "score_es", "score_fr",
                "predicted_lang")
        .orderBy("doc_id")),

    // Language-router QA: confusion matrix of declared vs predicted
    // language — one partial-aggregable groupBy over the langid pass.
    "text_lang_confusion" -> ((s, dir) =>
      TextAnalysis.withLangId(Tables.documents(s, dir))
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted_lang")),

    // North-star text analysis: rolling-hash document fingerprint over
    // word 3-shingles (portable polynomial hash, no engine-specific hash).
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprint(Tables.documents(s, dir))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")),

    // Contamination-safe train/val/test split: hash the near-dup
    // CLUSTER id, not the document id, so every member of a duplicate
    // cluster lands in the same split — the leakage bug (train/test
    // near-dups) that plain per-doc hashing bakes into an eval set.
    // Composition: banded SimHash pairs → connected components →
    // canonical-id hash split; singletons are their own canonical.
    "sample_dedup_aware_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = nearDupLabels(s, dir)
      docs.select("doc_id").join(labels, Seq("doc_id"), "left")
        .withColumn("canonical_id",
          coalesce(col("canonical_id"), col("doc_id")))
        .withColumn("bucket",
          (graft.olap.Sketch.spreadHash(col("canonical_id")) % 100)
            .cast("int"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "validation")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("canonical_id")).as("n_clusters"),
             min(col("doc_id")).as("min_doc_id"),
             max(col("doc_id")).as("max_doc_id"))
        .orderBy("split")
    }),

    // The admission gate every training pipeline runs: ordered accept/
    // reject rules over the engine's own quality signals (first failing
    // rule wins, so reject reasons are deterministic and auditable).
    // Pure composition — length, quality score, language agreement — in
    // one pass over the corpus; the gate summary is one partial-
    // aggregable groupBy.
    "pipeline_quality_gate" -> ((s, dir) => {
      val scored = TextAnalysis.withLangId(
        TextAnalysis.withQuality(Tables.documents(s, dir)))
      scored
        .withColumn("reason",
          when(col("n_chars") < 50, "too_short")
            .when(col("quality_score") < 0.5, "low_quality")
            .when(col("predicted_lang") =!= col("lang"), "lang_mismatch")
            .otherwise("accept"))
        .groupBy("lang", "reason")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "reason")
    }),

    // Passage-level exact dedup (the sub-document pass corpus pipelines
    // run after doc-level dedup): split every document into fixed
    // 64-char passages, find passages occurring in more than one place
    // corpus-wide, and score each doc by its duplicated-passage ratio.
    // Chunking explodes from per-doc arithmetic (never a cross join);
    // duplicate detection is one groupBy on the passage itself.
    "dedup_passage_exact" -> ((s, dir) => {
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(sequence(lit(0),
            ((col("n_chars") - 1) / lit(64)).cast("int"))).as("i"))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id")
        .select(col("doc_id"),
          col("text").substr(col("i") * 64 + 1, lit(64)).as("chunk"))
        .filter(length(col("chunk")) > 0)
      val dupCount = chunks.groupBy("chunk")
        .agg(count(lit(1)).as("occ"))
      chunks.join(dupCount, "chunk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
             sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup"),
          (col("n_dup").cast("double") / col("n_chunks").cast("double"))
            .as("dup_ratio"))
        .orderBy("doc_id")
    }),

    // N-gram novelty: the fraction of a document's distinct token
    // 2-grams not seen in ANY lower-id document — the dedup-adjacent
    // freshness signal a crawl pipeline scores before admitting a page.
    // "Seen earlier" distributes as first-occurrence: one groupBy(gram)
    // min(doc_id), then a gram-keyed join back; a gram is novel for
    // exactly the doc that owns its minimum. No sequential scan, no
    // window over the corpus.
    "text_ngram_novelty" -> ((s, dir) => {
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.dedup.NgramJaccard.gram_hashes(col("text"), 2))
            .as("g"))
      val first = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      grams.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
               .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_grams").cast("double"))
            .as("novelty"))
        .orderBy("doc_id")
    }),

    // Sequence-length histogram in log₂ buckets — the distribution a
    // packing/batching layer sizes itself from. Bucket = floor(log2
    // n_chars) via the portable length(bin(n))−1 idiom; one
    // partial-aggregable groupBy.
    "text_length_log_histogram" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("n_chars") > 0)
        .withColumn("bucket", (length(bin(col("n_chars"))) - 1)
          .cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("sum_chars"),
             min(col("n_chars")).as("min_chars"),
             max(col("n_chars")).as("max_chars"))
        .orderBy("bucket")),

    // LM-flavored quality signal: token surprisal in EXACT integer bits —
    // per token, B = 32 − floor(log2(corpus_frequency)) (rare tokens
    // contribute more bits), summed per document. floor(log2 n) is
    // length(bin(n)) − 1 on both engines (the HLL oracle's proven
    // portable idiom), so this perplexity proxy needs no floating log at
    // all. One token-keyed join (the frequency table is vocabulary-sized,
    // orders smaller than the token stream) + one partial-aggregable sum.
    "text_surprisal_bits" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens("text")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      toks.join(freq, "tok")
        .withColumn("bits", lit(32L) - (length(bin(col("tf"))) - 1))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             sum(col("bits")).as("sum_bits"))
        .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
          (col("sum_bits").cast("double") / col("n_tokens").cast("double"))
            .as("mean_bits"))
        .orderBy("doc_id")
    }),

    // Training-data hygiene: PII detection + redaction. The synthetic
    // corpus carries no natural PII, so deterministic emails/phones are
    // injected first (identically in the oracle), then detected with
    // regexp_count and scrubbed with regexp_replace — all codegen'd
    // string expressions, zero shuffle, linear per-row work. Patterns
    // stay in the RE2∩Java-regex common subset so both engines compile
    // them identically.
    "text_pii_scrub" -> ((s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
      Tables.documents(s, dir)
        .withColumn("raw", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
                   lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-867-"),
                   lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(emailRe)).cast("long")
            .as("n_emails"),
          regexp_count(col("raw"), lit(phoneRe)).cast("long")
            .as("n_phones"),
          length(regexp_replace(
              regexp_replace(col("raw"), emailRe, "[EMAIL]"),
              phoneRe, "[PHONE]")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    }),

    // North-star dedup: MinHash+LSH near-dup pairs — shingle→minhash→band→
    // bucket-join; the only shuffle is the (band,key) self-join.
    "dedup_minhash_lsh" -> ((s, dir) =>
      MinHash.nearDupPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 16, r = 4, minEstJaccard = 0.5)
        .orderBy("doc_a", "doc_b")),

    // North-star dedup: 32-bit SimHash per document (fused codegen pass).
    "dedup_simhash" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), SimHash.simhash32(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // The simhash SCALE path: band-bucketed Hamming-ball search over the
    // FULL corpus — pairs within Hamming<=1 must agree on one of the two
    // 16-bit halves (pigeonhole), so candidates collide in buckets and
    // only bucket-mates get the exact bit_count(xor) verify. No O(n²).
    "dedup_simhash_banded" -> ((s, dir) =>
      SimHash.bandedNearDupPairs(Tables.documents(s, dir), "doc_id", "text",
          maxHamming = 1, bands = 2)
        .orderBy("doc_a", "doc_b")),

    // ANN index training: one distributed Lloyd (k-means) update — the
    // step that makes the IVF centroids trainable rather than fixed.
    // Assignment is the shared max_by argmax; the per-dimension mean runs
    // over exact integer micro-units so it's order-independent.
    "sim_kmeans_update" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.kmeansUpdate(emb, emb.filter(col("vec_id") < 8))
        .orderBy("centroid_id", "dim")
    }),

    // The dedup DECISION step: near-dup pairs → connected components →
    // canonical (min-id) survivor per cluster. Min-label propagation,
    // keyed joins + partial-aggregable min per round, deterministic
    // fixpoint — completes signature → candidates → clusters → survivors.
    "dedup_cc_canonical" -> ((s, dir) => {
      nearDupLabels(s, dir).orderBy("doc_id")
    }),

    // Corpus duplication report: cluster-size histogram over the CC
    // near-dup clusters + how many docs dedup would drop — the "how much
    // of my corpus is duplicated" summary a pipeline emits after
    // clustering. Two partial-aggregable groupBys over the label frame.
    "dedup_cluster_stats" -> ((s, dir) => {
      nearDupLabels(s, dir)
        .groupBy("canonical_id").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .withColumn("docs_to_drop", (col("sz") - 1) * col("n_clusters"))
        .orderBy("sz")
    }),

    // SimHash near-dup pairs by Hamming distance over a bounded id range.
    "dedup_simhash_pairs" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 250)
        .select(col("doc_id"), SimHash.simhash32(col("text")).as("simhash"))
      d.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
        .join(d.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")),
              col("doc_a") < col("doc_b"))
        .withColumn("hamming",
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int"))
        .filter(col("hamming") <= 1)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    }),

    // North-star dedup: exact token-2-gram Jaccard over a bounded id range
    // (the brute-force ground truth the LSH variants approximate). Gram
    // sets are sorted distinct hash arrays built in one fused pass;
    // pairwise scoring is a codegen'd linear merge-intersect.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      import graft.dedup.NgramJaccard
      val g = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"),
                NgramJaccard.gram_hashes(col("text"), 2).as("grams"))
      g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"))
        .join(g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")),
              col("doc_a") < col("doc_b"))
        .withColumn("jaccard",
          NgramJaccard.jaccard_sorted(col("grams_a"), col("grams_b")))
        .filter(col("jaccard") >= 0.10)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    }),

    // North-star dedup: embedding-cosine near-dup pairs (bounded exact
    // pairwise; IVF/LSH prune the same metric at scale).
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
          maxId = 200, minCosine = 0.35)
        .orderBy("vec_a", "vec_b")),

    // North-star similarity: brute-force cosine top-k (broadcast queries ×
    // corpus scan, per-query window top-k).
    "sim_bruteforce_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),

    // North-star similarity: IVF coarse assignment (broadcast centroids,
    // argmax-cosine partitioning — the scale path's inverted lists).
    "sim_ivf_assign" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfAssign(emb, emb.filter(col("vec_id") < 8))
        .orderBy("centroid_id")
    }),

    // North-star similarity: IVF probe — approximate top-k searching only
    // the nprobe nearest centroids' inverted lists (the 100 TB search
    // path; sim_bruteforce_topk is its ground truth).
    "sim_ivf_probe_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfProbeTopK(emb, emb.filter(col("vec_id") < 8),
          emb.filter(col("vec_id") < 10), nprobe = 2, k = 5)
        .orderBy("query_id", "rank")
    }),

    // Product quantization, encode step: 4 subspaces × 16 codewords; one
    // explode + broadcast codebook join + partial-aggregable argmax (cost
    // independent of m). Codewords = designated corpus vectors;
    // sim_kmeans_update is the training step a production codebook adds.
    "sim_pq_codes" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqEncode(emb, emb.filter(col("vec_id") < 16), 4, 16)
        .orderBy("vec_id", "sub_id")
    }),

    // PQ asymmetric-distance top-k: query scored against the 64-entry
    // codebook once (broadcast LUT); corpus vectors ranked by the sum of
    // their m table entries — embeddings never touched at query time.
    // Subspace contributions summed in fixed order (bitwise-portable).
    "sim_pq_adc_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cw = emb.filter(col("vec_id") < 16)
      Similarity.pqAdcTopK(Similarity.pqEncode(emb, cw, 4, 16), cw,
          emb.filter(col("vec_id") < 10), 4, 16, 5)
        .orderBy("query_id", "rank")
    }),

    // North-star similarity: random-hyperplane LSH bucketing (the cosine
    // analog of the minhash band join) — bucket sizes of the sign-bit
    // signature space.
    "sim_hyperplane_lsh" -> ((s, dir) =>
      graft.similarity.HyperplaneLsh
        .buckets(Tables.embeddings(s, dir), nPlanes = 8, dim = 64)
        .groupBy("bucket").agg(count(lit(1)).as("n_vectors"))
        .orderBy("bucket")),

    // Prune-then-verify over the LSH buckets: candidates share a sign-bit
    // bucket (4 planes here so buckets stay populated), exact cosine
    // verifies — the two-stage shape every at-scale near-dup pass uses.
    "sim_hyperplane_neardup" -> ((s, dir) =>
      graft.similarity.HyperplaneLsh
        .nearDupPairs(Tables.embeddings(s, dir), nPlanes = 4, dim = 64,
          minCosine = 0.30)
        .orderBy("vec_a", "vec_b")),

    // North-star streaming: tumbling daily windows + watermark over the
    // events stream (Structured Streaming, memory sink; batch-equivalent
    // by construction, which is exactly what the oracle checks).
    "stream_tumbling_daily" -> ((s, dir) =>
      graft.streaming.EventStream.runTumblingDaily(s, dir)
        .orderBy("date", "event_type")),

    // The mergeable HLL sketch maintained by streaming state: per-day
    // distinct-user estimates where the TypedImperativeAggregate's
    // serialized registers ARE the state rows — sketches at 100 TB are
    // only useful if the stream can keep them, and this pins that the
    // custom aggregate survives incremental merge + state round-trips
    // with the estimator's bitwise-portable arithmetic intact.
    "stream_hll_daily" -> ((s, dir) =>
      graft.streaming.EventStream.runHllDaily(s, dir)
        .orderBy("date")),

    // Sliding windows in streaming: the batch ts_sliding_window_2d shape
    // declared against the unbounded source — each event in two open
    // windows, state watermark-bounded, streamed == batch bitwise (same
    // oracle SQL as the batch query).
    "stream_sliding_2d" -> ((s, dir) =>
      graft.streaming.EventStream.runSlidingTwoDay(s, dir)
        .orderBy("window_start", "event_type")),

    // §2.4 extension: as-of join — for each purchase, the user's latest
    // view at or before it (merge-style union + keyed window; one shuffle,
    // no O(|L|·|R|) range-join blowup).
    "asof_join_latest_view" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      graft.ts.AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts",
          Seq("value"))
        .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
        .orderBy("event_id")
    }),

    // Forward as-of: the EARLIEST view at-or-after each purchase — the
    // mirror traversal of the backward join (descending window, identical
    // one-shuffle asymptotics). DuckDB's native ASOF with v.ts >= p.ts
    // cross-checks the direction semantics.
    "asof_join_next_view" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      graft.ts.AsOfJoin.asOfForward(purchases, views, Seq("user_id"), "ts",
          Seq("value"))
        .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
        .orderBy("event_id")
    }),

    // As-of nearest (pandas merge_asof(direction='nearest')): the view
    // with the smallest |view.ts − purchase.ts|, equidistant ties going
    // backward — both traversals share one shuffle (two window passes
    // over the same union frame), then a µs-exact comparison picks.
    "asof_join_nearest_view" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      graft.ts.AsOfJoin.asOfNearest(purchases, views, Seq("user_id"), "ts",
          Seq("value"))
        .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
        .orderBy("event_id")
    }),

    // As-of with a match tolerance (pandas merge_asof(tolerance=...)):
    // the latest view older than 30 minutes is no match — asof_* go NULL.
    "asof_join_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      graft.ts.AsOfJoin.asOfWithTolerance(purchases, views, Seq("user_id"),
          "ts", Seq("value"), toleranceSeconds = 1800)
        .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
        .orderBy("event_id")
    }),

    // The same as-of join as a NATIVE plan node (graft.plans.AsOfJoinExec:
    // custom LogicalPlan + SparkStrategy + SparkPlan via
    // SparkSessionExtensions) — sort-merge with O(1) per-partition state
    // instead of the union+window formulation; one exchange per side, none
    // when bucketed. Same oracle as asof_join_latest_view.
    "asof_join_exec" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("r_user_id"), col("ts").as("asof_ts"),
                col("value").as("asof_value"))
      graft.plans.AsOfJoinPlan.asOf(purchases, views,
          Seq("user_id"), Seq("r_user_id"), "ts", "asof_ts")
        .select("event_id", "user_id", "ts", "asof_ts", "asof_value")
        .orderBy("event_id")
    }),

    // Range (interval) join via time bucketing: views in the hour before
    // each purchase, per user — equi-join on (user, hour-bucket) +
    // residual predicate instead of the nested-loop/filter-after-key-join
    // a naive range join produces.
    "range_join_prior_views" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.ts.RangeJoin.countEventsWithin(
          anchors = ev.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts"),
          events = ev.filter(col("event_type") === "view")
            .select("user_id", "ts"),
          keyCols = Seq("user_id"), idCol = "event_id",
          anchorTs = "ts", eventTs = "ts",
          lowerUs = -3600L * 1000000L, upperUs = 0L)
        .orderBy("event_id")
    }),

    // North-star streaming-adjacent: gap-based sessionization (30-min
    // inactivity gap) as lag + running session counter over one keyed
    // shuffle+sort.
    "sessionize_events" -> ((s, dir) =>
      graft.ts.Sessionize.sessions(Tables.events(s, dir), "user_id", "ts",
          "value", gapSeconds = 1800)
        .orderBy("user_id", "session_seq")),

    // The same gap sessionization through Spark's BUILT-IN session_window
    // aggregate (one partial-aggregable pass with in-operator session
    // merging — no lag/running-sum windows at all). The oracle is the
    // composable lag+cumsum formulation, so this pins the built-in
    // operator's semantics against the hand-rolled one bitwise.
    "sessionize_builtin_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"),
             max(col("ts")).as("session_end"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double")
               .as("sum_value"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")),

    // North-star streaming: deduplication over an at-least-once stream —
    // the fixture replayed twice (union) collapses back to exact counts
    // via dropDuplicates on the event key (streaming form of I2).
    "stream_dedup_replay" -> ((s, dir) =>
      graft.streaming.EventStream.runDedupedCounts(s, dir)
        .orderBy("event_type")),

    // North-star streaming: custom keyed state via flatMapGroupsWithState —
    // sessions spanning micro-batches, closed by gap or event-time timeout.
    // The emitted set IS SQL-expressible (gap-closed sessions plus final
    // sessions timed out below the final watermark), so this has a full
    // oracle; the spec additionally pins batch equivalence.
    "stream_sessionize_stateful" -> ((s, dir) =>
      graft.streaming.StatefulSessions.runOverFixture(s, dir)
        .orderBy("user_id", "session_start")),

    // Streaming extension: stream-stream time-bounded inner join — both
    // sides watermarked, state bounded by the range condition (one hour
    // of activity, not history). Emitted set == the batch join over a
    // bounded replay.
    "stream_stream_join" -> ((s, dir) =>
      graft.streaming.EventStream.runStreamStreamJoin(s, dir)
        .orderBy("event_id", "view_ts", "view_value")),

    // North-star multimodal: binary payload column + typed metadata via a
    // batched per-partition decode (codec stubbed; plumbing real).
    "mm_media_meta" -> ((s, dir) =>
      graft.multimodal.Media.mediaMeta(s, Tables.documents(s, dir))
        .orderBy("media_id")),

    // North-star multimodal: REAL image codec round-trip — encode each
    // doc's deterministic grayscale raster as actual compressed PNG bytes
    // (javax.imageio, in the JDK), then decode them back through the real
    // decoder and emit the decoded header dims + pixel sum. Grayscale PNG
    // is lossless, so the oracle recomputes the decoded checksum
    // arithmetically without any codec — the stub contract is retired for
    // images. Both stages are batched mapPartitions (codec init amortizes
    // per partition), zero shuffle.
    "mm_png_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nChars) =>
            val w = (1 + id % 8).toInt
            val h = (1 + nChars % 8).toInt
            graft.multimodal.Media.MediaRow(id,
              graft.multimodal.Media.PngCodec.encodeGray(w, h,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt),
              "png")
          }
        }
      graft.multimodal.Media.extractMeta(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
                col("checksum"))
        .orderBy("media_id")
    }),

    // North-star multimodal: REAL audio codec round-trip — synthesize each
    // doc's deterministic 8-bit PCM signal, wrap it in an actual WAV
    // container (javax.sound.sampled, in the JDK), decode it back through
    // the real audio API and emit the decoded header fields + exact
    // sample energy. PCM is uncompressed, so the oracle recomputes the
    // decoded energy arithmetically — the audio stub is retired alongside
    // the PNG image stub.
    "mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = (32 + id % 64).toInt
            val samples = Array.tabulate(n)(i =>
              ((id * 17 + i * 29) % 256).toByte)
            graft.multimodal.Media.MediaRow(id,
              graft.multimodal.Media.WavCodec.encodePcm8(8000, samples),
              "wav")
          }
        }
      media.mapPartitions { it =>
        it.map { m =>
          val (rate, ch, n, e) =
            graft.multimodal.Media.WavCodec.decode(m.payload)
          (m.media_id, rate, ch, n, e)
        }
      }.toDF("media_id", "sample_rate", "channels", "n_samples", "energy")
        .orderBy("media_id")
    }),

    // North-star multimodal: frame sampling — one media row fans out to
    // per-frame rows (fixed 256-byte chunks standing in for keyframes),
    // turning per-media work into per-frame parallelism.
    "mm_frame_sample" -> ((s, dir) =>
      graft.multimodal.Media.sampleFrames(
          graft.multimodal.Media.asMedia(Tables.documents(s, dir),
            "doc_id", "text"), frameBytes = 256)
        .toDF()
        .orderBy("media_id", "frame_idx")),

    // Scene-cut segmentation over the sampled frames: a cut where the
    // frame-delta (|checksum_t − checksum_{t−1}|, the STUB stand-in for a
    // visual difference metric) exceeds threshold, then gaps-and-islands
    // into scenes — the shot-boundary pass a video training pipeline runs
    // after frame sampling. Keyed windows + partial-aggregable groupBy.
    "mm_scene_cuts" -> ((s, dir) => {
      val frames = graft.multimodal.Media.sampleFrames(
          graft.multimodal.Media.asMedia(Tables.documents(s, dir),
            "doc_id", "text"), frameBytes = 256)
        .toDF()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id")).orderBy(col("frame_idx"))
      val prev = lag(col("checksum"), 1).over(w)
      val isCut = when(prev.isNull ||
        abs(col("checksum") - prev) > lit(20000L), 1L).otherwise(0L)
      frames
        .withColumn("scene_idx",
          sum(isCut).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("media_id", "scene_idx")
        .agg(min(col("frame_idx")).as("start_frame"),
             max(col("frame_idx")).as("end_frame"),
             count(lit(1)).as("n_frames"))
        .orderBy("media_id", "scene_idx")
    }),

    // North-star multimodal: audio-style overlapping sample windows —
    // the STFT/feature-frame fan-out (64-sample windows every 32), exact
    // integer energy per window. Same explode parallelism as frames, with
    // overlap.
    "mm_audio_window" -> ((s, dir) =>
      graft.multimodal.Media.audioWindows(
          graft.multimodal.Media.asMedia(
            Tables.documents(s, dir).filter(col("doc_id") < 200),
            "doc_id", "text"), windowSize = 64, hop = 32)
        .toDF()
        .orderBy("media_id", "window_idx")),

    // Cube (full grouping-sets lattice — rollup's superset): every
    // (flag, status) combination plus both one-dimension margins plus the
    // grand total in one pass, levels tagged by grouping_id.
    // Mode (most frequent value) per group with deterministic ties
    // (smallest value wins) — expressed window-free as count → per-group
    // max → equality join back → min, every stage partial-aggregable;
    // engines disagree on native mode() tie-breaking, so the explicit
    // form is both portable and the scale shape.
    "agg_mode_per_group" -> ((s, dir) => {
      val c = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val m = c.groupBy("o_orderstatus").agg(max(col("cnt")).as("mx"))
      c.join(m, "o_orderstatus").filter(col("cnt") === col("mx"))
        .groupBy("o_orderstatus")
        .agg(min(col("o_orderpriority")).as("mode_priority"),
             max(col("mx")).as("n_mode"))
        .orderBy("o_orderstatus")
    }),

    // Benford first-digit audit (the classic fabricated-data screen):
    // distribution of leading digits of order totals. The digit comes
    // from the integer-cent string — never from double formatting, which
    // differs across engines — so the whole audit is exact.
    "dq_benford_digits" -> ((s, dir) => {
      val cents = Exact.cents(col("o_totalprice"))
      val total = Tables.orders(s, dir).agg(count(lit(1)).as("n_total"))
      Tables.orders(s, dir)
        .select(substring(cents.cast("string"), 1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("n_total").cast("double"))
            .as("share"))
        .orderBy("digit")
    }),

    // Data-quality table profiler: per-column null count + exact distinct
    // cardinality + the table row count, all from ONE scan (the multiple
    // exact countDistincts plan as a single Expand + aggregate — one pass
    // over the data, the standard exact shape; the 100 TB variant swaps
    // the exact distincts for the engine's mergeable HLL sketches, same
    // output schema, see sketch_hll_distinct). Wide-to-long via stack().
    "dq_profile_table" -> ((s, dir) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
                     "o_totalprice", "o_orderdate", "o_orderpriority")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct")))
      val stackArgs = cols.map(c =>
        s"'$c', ${c}__nulls, ${c}__distinct").mkString(", ")
      Tables.orders(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .select(
          expr(s"stack(${cols.size}, $stackArgs) AS " +
            "(column_name, n_nulls, n_distinct)"),
          col("n_rows"))
        .orderBy("column_name")
    }),

    // The general GROUPING SETS form (cube/rollup are its specializations,
    // both covered): an explicit, non-hierarchical set list — exactly the
    // shape a reporting layer asks for ("by lang, by source, by both,
    // grand total" without the unused (source-only-within-lang) stratum a
    // cube would add). grouping() markers disambiguate rollup NULLs from
    // data NULLs; Spark expands the sets into one Expand + one aggregate,
    // so the scan stays single-pass.
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("graft_docs_gs")
      s.sql("""SELECT lang, source,
                      CAST(grouping(lang) AS BIGINT) AS g_lang,
                      CAST(grouping(source) AS BIGINT) AS g_source,
                      count(*) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS sum_chars
               FROM graft_docs_gs
               GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
               ORDER BY g_lang, g_source,
                        coalesce(lang, ''), coalesce(source, '')""")
    }),

    "agg_cube_counts" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(Exact.cents(col("l_quantity"))).cast("double")./(lit(100.0))
               .as("sum_qty"),
             grouping_id().cast("long").as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // Skew-mitigation join: the salted form (big side scattered over 8
    // deterministic sub-keys, small side replicated 8×) — bit-identical
    // to the plain join, which is exactly what the oracle checks. The
    // explicit fallback for when one key exceeds an executor and AQE's
    // partition-split can't help (it can split a partition, not a single
    // key's sorted run).
    "join_salted_skew" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_suppkey", "l_quantity")
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.olap.SkewJoin.saltedJoin(li, supp, Seq("l_suppkey"), salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
             Exact.sumMoney(col("l_quantity")).as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    // EMA: the recursive per-series indicator as an ordered prefix fold
    // (see graft.ts.Ema) — sequential double arithmetic reproduced
    // fold-step-for-fold-step by the oracle's list_reduce.
    "ts_ema" -> ((s, dir) =>
      graft.ts.Ema.withEma(
          Ohlc.dailyBars(Tables.events(s, dir))
            .select("event_type", "date", "close"),
          alpha = 0.25, partitionCols = Seq("event_type"))
        .orderBy("event_type", "date")),

    // SCD2 dimension history from a change stream: every purchase
    // versions the user's attribute with a validity interval — the
    // point-in-time-join form of the reference's latest-wins watermark
    // table. Keyed window; (ts, event_id) makes versioning total.
    "inc_scd2_history" -> ((s, dir) =>
      graft.inc.Scd2.history(
          Tables.events(s, dir)
            .filter(col("event_type") === "purchase" && col("user_id") < 50)
            .select("user_id", "event_id", "ts", "value"),
          keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id")
        .select("user_id", "version", "valid_from", "valid_to", "value",
                "is_current")
        .orderBy("user_id", "version")),

    // Point-in-time dimension join: facts pick the SCD2 version valid at
    // fact time — expressed as an as-of join on valid_from and executed by
    // the NATIVE AsOfJoinExec plan node (its second production context:
    // same operator, warehouse semantics). The as-of pick automatically
    // satisfies valid_from <= ts < valid_to since valid_to is the next
    // version's valid_from.
    "inc_scd2_pointintime" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dim = graft.inc.Scd2.history(
          ev.filter(col("event_type") === "purchase" && col("user_id") < 50)
            .select("user_id", "event_id", "ts", "value"),
          keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id")
        .select(col("user_id").as("dim_user_id"), col("valid_from"),
          col("version").as("dim_version"), col("value").as("dim_value"))
      val facts = ev
        .filter(col("event_type") === "view" && col("user_id") < 50)
        .select("event_id", "user_id", "ts")
      graft.plans.AsOfJoinPlan.asOf(facts, dim,
          Seq("user_id"), Seq("dim_user_id"), "ts", "valid_from")
        .select("event_id", "user_id", "ts", "dim_version", "dim_value",
          "valid_from")
        .orderBy("event_id")
    }),

    // Mergeable sketches: per-group KMV plus the union estimated ONLY from
    // the per-group sketch rows — the roll-up property that makes sketches
    // distributed primitives (per-partition → global, daily → monthly,
    // no rescan).
    "sketch_kmv_union" -> ((s, dir) =>
      graft.olap.Sketch.kmvGroupsWithUnion(Tables.lineitem(s, dir),
          col("l_returnflag"), col("l_partkey"), k = 128)
        .orderBy("scope")),

    // Bloom-filter join pruning (explicit runtime-filter): selective build
    // side → broadcast position set → probe-side candidacy before the real
    // join; the output counts the filter's exact false-positive tally.
    "sketch_bloom_join" -> ((s, dir) => {
      import graft.olap.BloomJoin
      val bits = 65536
      val hashes = 3
      val build = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
        .select(col("o_orderkey"))
      val probeKeys = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("k")).distinct()
      val positions = BloomJoin.buildPositions(build, "o_orderkey",
        bits, hashes)
      val cands = BloomJoin.candidateKeys(probeKeys, "k", positions,
        bits, hashes)
      val trues = probeKeys.join(build,
        col("k") === col("o_orderkey"), "leftsemi")
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(trues.agg(count(lit(1)).as("n_true")))
        .crossJoin(probeKeys.agg(count(lit(1)).as("n_probe_keys")))
        .select(col("n_probe_keys"), col("n_true"), col("n_candidates"),
                (col("n_candidates") - col("n_true")).as("n_false_pos"))
    }),

    // Embedding normalization + int8 quantization (the storage/serving
    // transform ANN shards apply at ingest): L2 norm via the fused dot,
    // per-dimension round(x/norm·127) — all per-row projection, zero
    // shuffle.
    "emb_normalize_quantize" -> ((s, dir) => {
      import graft.functions.VecOps
      val e = Tables.embeddings(s, dir)
        .withColumn("norm",
          sqrt(VecOps.dot(col("embedding"), col("embedding"))))
        .filter(col("norm") > 0)
        .withColumn("q", transform(col("embedding"), x =>
          round(x.cast("double") / col("norm") * lit(127.0), 0).cast("int")))
      e.select(col("vec_id"), col("norm"),
          array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"),
          aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long"))
            .as("q_sum"))
        .orderBy("vec_id")
    }),

    // BPE-style pre-tokenization: maximal letter / digit / punctuation
    // runs (explicit ASCII classes so Java and RE2 agree codepoint for
    // codepoint), with a sequential piece-hash checksum — the
    // deterministic skeleton a real BPE vocabulary merge would refine.
    "text_bpe_tokens" -> ((s, dir) => {
      import graft.text.TextAnalysis.{asciiLower, asciiUpper}
      val pieces = regexp_extract_all(
        translate(col("text"), asciiUpper, asciiLower),
        lit("[a-z]+|[0-9]+|[.,;:!?()/_-]+"), lit(0))
      val p = lit(2147483647L)
      Tables.documents(s, dir)
        .withColumn("pieces", pieces)
        .select(col("doc_id"),
          size(col("pieces")).cast("long").as("n_pieces"),
          size(filter(col("pieces"), x => x.rlike("^[a-z]"))).cast("long")
            .as("n_alpha"),
          size(filter(col("pieces"), x => x.rlike("^[0-9]"))).cast("long")
            .as("n_num"),
          aggregate(
            transform(col("pieces"),
              x => graft.functions.CharFold.char_fold_hash(x)),
            lit(0L), (a, h) => pmod(a * 31 + h, p)).as("piece_checksum"))
        .withColumn("n_punct",
          col("n_pieces") - col("n_alpha") - col("n_num"))
        .select("doc_id", "n_pieces", "n_alpha", "n_num", "n_punct",
                "piece_checksum")
        .orderBy("doc_id")
    }),

    // Streaming extension: stream-static enrich — unbounded events joined
    // to the broadcast customer dimension (stateless; no watermark, no
    // join state), then aggregated per segment.
    "stream_static_enrich" -> ((s, dir) =>
      graft.streaming.EventStream.runStaticEnrich(s, dir)
        .orderBy("c_mktsegment", "event_type")),

    // Deterministic stratified sampling: per stratum, the k rows with the
    // smallest portable hash — a uniform-ish sample that is REPRODUCIBLE
    // (no RNG state, no seed drift across engines/retries) and mergeable
    // (the k smallest of a union are the k smallest of the per-shard k
    // smallest). Keyed window rank; hash ties totalized by event_id.
    "sample_stratified" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("hv").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("hv", graft.olap.Sketch.spreadHash(col("event_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("event_type", "event_id", "value")
        .orderBy("event_type", "event_id")
    }),

    // Fixed-width histogram per series: fully partial-aggregable (the bin
    // is just a grouping expression), exact decimal mass per bin — the
    // profiling primitive for value distributions at scale.
    "agg_value_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("value") / lit(50.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double")
               .as("sum_value"))
        .orderBy("event_type", "bin")),

    // CDC compaction (latest-wins upsert): one surviving row per key via
    // partial-aggregable max_by over the packed payload — the shuffle
    // carries one pre-reduced row per key per map partition, not the
    // change log (a window formulation would sort every change).
    "inc_upsert_latest" -> ((s, dir) =>
      graft.inc.Watermark.latestByKey(
          Tables.events(s, dir).filter(col("event_type") === "purchase")
            .select("user_id", "ts", "event_id", "value"),
          keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
          payloadCols = Seq("value"))
        .orderBy("user_id")),

    // Asymmetric containment |A∩B|/|A| over token-2-gram sets (bounded
    // exact pairs): catches subset/quotation duplication that symmetric
    // Jaccard under-scores — the other half of the near-dup decision.
    "text_ngram_containment" -> ((s, dir) => {
      import graft.dedup.NgramJaccard
      val g = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"),
                NgramJaccard.gram_hashes(col("text"), 2).as("grams"))
      g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"))
        .filter(size(col("grams_a")) > 0)
        .join(g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")),
              col("doc_a") =!= col("doc_b"))
        .withColumn("containment",
          NgramJaccard.intersect_count_sorted(col("grams_a"), col("grams_b"))
            .cast("double") / size(col("grams_a")).cast("double"))
        .filter(col("containment") >= 0.20)
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    }),

    // Data-quality gate (Deequ-style): five row-level constraints in ONE
    // aggregation pass (conditional counts, partial-aggregable) plus two
    // table-level checks with their own minimal plans (anti-join orphans,
    // group-count duplicates), unioned to one (check_name, n_violations)
    // report — the pre-ingest gate every pipeline runs.
    "dq_constraint_checks" -> ((s, dir) => {
      import graft.olap.Quality
      val li = Tables.lineitem(s, dir)
      val rowChecks = Quality.violationCounts(li, Seq(
        "null_orderkey" -> col("l_orderkey").isNull,
        "nonpositive_quantity" -> (col("l_quantity") <= 0),
        "discount_out_of_range" ->
          (col("l_discount") < 0 || col("l_discount") > 1),
        "null_shipdate" -> col("l_shipdate").isNull,
        "flag_domain" -> !col("l_returnflag").isin("A", "N", "R")))
      rowChecks
        .unionByName(Quality.orphanCount(li, "l_orderkey",
          Tables.orders(s, dir), "o_orderkey", "orphan_orderkey"))
        .unionByName(Quality.duplicateCount(li,
          Seq("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
          "duplicate_line_identity"))
        .orderBy("check_name")
    }),

    // Algebraic partial-aggregate merge — the property incremental
    // aggregate maintenance rests on: agg(history) ⊕ agg(increment) ==
    // agg(all), checked against the oracle computing agg(all) directly.
    // Counts and exact cent sums merge by addition; the watermark splits
    // the input the same way an incremental run would.
    "inc_agg_merge" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wm = ev.agg(max(to_date(col("ts"))).as("maxd"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum(Exact.cents(col("value"))).as("cents"))
      val hist = partial(ev.join(broadcast(wm),
        to_date(col("ts")) <= date_sub(col("maxd"), 10)))
      val delta = partial(ev.join(broadcast(wm),
        to_date(col("ts")) > date_sub(col("maxd"), 10)))
      hist.unionByName(delta)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        .select(col("event_type"), col("n"),
          (col("cents").cast("double") / lit(100.0)).as("sum_value"))
        .orderBy("event_type")
    }),

    // Z-order layout key (the OPTIMIZE ZORDER primitive): Morton-
    // interleave (user, day) so min/max row-group stats prune scans on
    // EITHER dimension; exact bit arithmetic, engine-portable. The query
    // emits the curve positions for the distinct (user, day) grid — the
    // exact sort key an ingest-time layout pass would cluster by.
    "layout_zorder_key" -> ((s, dir) => {
      val day = datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long")
      Tables.events(s, dir)
        .select(col("user_id"), day.as("day"))
        .distinct()
        .withColumn("zkey",
          graft.olap.ZOrder.zkey(col("user_id"), col("day"), bits = 16))
        .orderBy("zkey", "user_id", "day")
        .limit(200)
    }),

    // Snapshot reconciliation — the audit step of every incremental
    // pipeline: diff two watermark-relative snapshots (history ≤ wm−10
    // vs trailing 20 days) per key, classify added / removed / changed /
    // unchanged. One full-outer join on the key; the per-key sums are
    // exact cents so "changed" is exact, not float-fuzzy.
    "inc_snapshot_diff" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
      val wm = ev.agg(max(to_date(col("ts"))).as("maxd"))
      val older = ev.join(broadcast(wm),
          to_date(col("ts")) <= date_sub(col("maxd"), 10))
        .groupBy("user_id")
        .agg(sum(Exact.cents(col("value"))).as("cents_old"))
      val newer = ev.join(broadcast(wm),
          to_date(col("ts")) > date_sub(col("maxd"), 20))
        .groupBy(col("user_id").as("user_id_n"))
        .agg(sum(Exact.cents(col("value"))).as("cents_new"))
      graft.inc.SnapshotDiff.classify(
        older.select(col("user_id"), col("cents_old").as("cents")),
        newer.select(col("user_id_n").as("user_id"),
          col("cents_new").as("cents")),
        "user_id", "cents")
    }),

    // Exact rolling median (windowed order statistic): NULL-gated like the
    // SMA (full 5-row window only), the middle of a sorted window — an
    // order statistic no associative aggregate expresses; the bounded
    // window keeps the per-row sort O(w log w).
    "ts_rolling_median" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("date"))
        .rowsBetween(-4, 0)
      val lst = sort_array(collect_list(col("close")).over(w))
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"), col("close"))
        .withColumn("median_5",
          when(size(lst) === 5, element_at(lst, 3)))
        .orderBy("event_type", "date")
    }),

    // Cohort retention: users bucketed by first-activity date, activity
    // counted per day offset — two keyed aggregations (first-touch, then
    // cohort×offset distincts); the warehouse query behind every
    // retention curve.
    "agg_retention_cohorts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("activity_date"))
        .distinct()
      val firsts = ev.groupBy("user_id")
        .agg(min(col("activity_date")).as("cohort_date"))
      ev.join(firsts, Seq("user_id"))
        .groupBy(col("cohort_date"),
          datediff(col("activity_date"), col("cohort_date")).cast("long")
            .as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_date", "day_offset")
    }),

    // Session funnel: per session, did a view precede a purchase? The
    // session assignment is the same gap logic as sessionize_events; the
    // conversion test is first-view-ts <= last-purchase-ts within the
    // session — ordered-sequence analytics over keyed windows.
    "sessionize_funnel" -> ((s, dir) => {
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      val ev = Tables.events(s, dir)
        .withColumn("is_new",
          when(lag(col("ts"), 1).over(wu).isNull ||
               unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1)
                 .over(wu)) > 1800000000L, 1).otherwise(0))
        .withColumn("session_seq",
          sum(col("is_new")).over(wu.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      ev.groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min(when(col("event_type") === "view", col("ts")))
            .as("first_view"),
          max(when(col("event_type") === "purchase", col("ts")))
            .as("last_purchase"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("first_view").isNotNull &&
                   col("last_purchase").isNotNull &&
                   col("first_view") <= col("last_purchase"), 1)
            .otherwise(0)).as("n_converted"))
        .orderBy("user_id")
    }),

    // Corpus TF-IDF with a RATIONAL idf (tf·N/df — no ln(), which is not
    // bit-portable across libm builds): document frequency over the full
    // corpus (one token shuffle), term frequency only for the output
    // slice, top-3 terms per document via keyed window. The weighting
    // every retrieval/quality pipeline starts from.
    "text_tfidf_topk" -> ((s, dir) => {
      import graft.text.TextAnalysis
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens("text")).as("token"))
      val tf = toks.filter(col("doc_id") < 100)
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token").asc)
      tf.join(dfreq, "token").crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf").cast("double")
          * col("n_docs").cast("double") / col("df").cast("double"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "token", "tfidf")
        .orderBy("doc_id", "rk")
    }),

    // Outlier ranking by z-score against the exact-sum series moments:
    // the top-50 most anomalous events corpus-wide, ranked on doubles
    // that both engines compute identically (TakeOrderedAndProject — no
    // full sort).
    "ts_zscore_topk" -> ((s, dir) => {
      val c = Exact.cents(col("value"))
      val stats = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(c).as("sc"), sum(c * c).as("ssq"))
        .select(col("event_type"),
          (col("sc").cast("double") / (col("n").cast("double") * lit(100.0)))
            .as("mean_value"),
          sqrt(col("ssq").cast("double")
             / (col("n").cast("double") * lit(10000.0))
           - (col("sc").cast("double")
              / (col("n").cast("double") * lit(100.0)))
             * (col("sc").cast("double")
                / (col("n").cast("double") * lit(100.0))))
            .as("stddev"))
      Tables.events(s, dir)
        .join(broadcast(stats), Seq("event_type"))
        .withColumn("z",
          (col("value") - col("mean_value")) / col("stddev"))
        .select("event_type", "event_id", "value", "z")
        .orderBy(abs(col("z")).desc, col("event_id").asc)
        .limit(50)
    }),

    // Moment statistics per series from EXACT integer sums (cents and
    // squared cents both fit BIGINT), converted to doubles once in a
    // fixed expression order — mean/variance/stddev reproducible bitwise
    // under any partitioning (a naive double sum would drift).
    // Higher central moments, exactly: skewness and excess kurtosis per
    // group from raw power sums Σd..Σd⁴ over DOLLAR-quantized values
    // (explicit integer floor division, the HHI idiom). Dollars, not
    // cents, on purpose: it keeps Σd⁴ under 2⁶³, where BOTH engines'
    // integer→double conversions are a single correctly-rounded step —
    // DuckDB's HUGEINT→DOUBLE above 2⁶⁴ rounds TWICE (upper·2⁶⁴ + lower)
    // and loses the last bits. Final formulas are one fixed IEEE chain
    // with m2·sqrt(m2) instead of pow(x, 1.5) — pow is not
    // correctly-rounded across engines, sqrt is.
    "agg_skew_kurtosis" -> ((s, dir) => {
      def dd(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val agg = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .withColumn("d", expr("(cc - ((cc % 100) + 100) % 100) DIV 100"))
        .groupBy("event_type")
        // third/fourth powers on the DECIMAL lattice: d⁴ ≈ 1e14 per row
        // wraps a raw BIGINT sum within ~1e5 rows — silently on Spark,
        // loudly on the oracle (the effect-size-t asymmetry)
        .agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
             sum(dd(col("d")) * dd(col("d"))).as("s2"),
             sum(dd(col("d")) * dd(col("d")) * dd(col("d"))).as("s3"),
             sum(dd(col("d")) * dd(col("d")) * dd(col("d")) * dd(col("d")))
               .as("s4"))
      val nd = col("n").cast("double")
      val m = col("s1").cast("double") / nd
      val e2 = col("s2").cast("double") / nd
      val e3 = col("s3").cast("double") / nd
      val e4 = col("s4").cast("double") / nd
      val m2 = e2 - m * m
      agg.select(col("event_type"), col("n"),
        ((e3 - lit(3.0) * m * e2 + lit(2.0) * m * m * m)
          / (m2 * sqrt(m2))).as("skewness"),
        ((e4 - lit(4.0) * m * e3 + lit(6.0) * m * m * e2
           - lit(3.0) * m * m * m * m) / (m2 * m2) - lit(3.0))
          .as("excess_kurtosis"))
        .orderBy("event_type")
    }),

    // Quantity-weighted median price per return flag: the exact weighted
    // order statistic (first value whose cumulative weight reaches half
    // the total) — cumulative weights by a keyed window over a totalized
    // (price, pk) order, the pick a partial-aggregable min over the
    // qualifying suffix. All integers until the final /100.
    "agg_weighted_median" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("flag").orderBy("cents", "ok", "ln")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
                Exact.cents(col("l_extendedprice")).as("cents"),
                col("l_quantity").cast("long").as("qty"),
                col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      val tot = li.groupBy("flag").agg(sum(col("qty")).as("total_qty"))
      li.withColumn("cum", sum(col("qty")).over(w))
        .join(tot, "flag")
        .filter(col("cum") * 2 >= col("total_qty"))
        .groupBy("flag")
        .agg(max(col("total_qty")).as("total_qty"),
             min(col("cents")).as("median_cents"))
        .select(col("flag"), col("total_qty"),
          (col("median_cents").cast("double") / lit(100.0))
            .as("weighted_median_price"))
        .orderBy("flag")
    }),

    "agg_value_stats" -> ((s, dir) => {
      val c = Exact.cents(col("value"))
      val cd = c.cast("decimal(38,0)")
      Tables.events(s, dir)
        .groupBy("event_type")
        // Σc² on the decimal lattice: c² ≈ 1e11 per row wraps a raw
        // BIGINT sum at corpus row counts — silently on Spark only
        .agg(count(lit(1)).as("n"), sum(c).as("sc"),
             sum(cd * cd).as("ssq"))
        .select(col("event_type"), col("n"),
          (col("sc").cast("double") / (col("n").cast("double") * lit(100.0)))
            .as("mean_value"),
          (col("ssq").cast("double")
             / (col("n").cast("double") * lit(10000.0))
           - (col("sc").cast("double")
              / (col("n").cast("double") * lit(100.0)))
             * (col("sc").cast("double")
                / (col("n").cast("double") * lit(100.0))))
            .as("variance"),
          sqrt(col("ssq").cast("double")
             / (col("n").cast("double") * lit(10000.0))
           - (col("sc").cast("double")
              / (col("n").cast("double") * lit(100.0)))
             * (col("sc").cast("double")
                / (col("n").cast("double") * lit(100.0))))
            .as("stddev"))
        .orderBy("event_type")
    }),

    // Per-series least-squares trend over (epoch day, close cents): all
    // five sums exact BIGINT, slope/intercept/r² as one fixed-order
    // double projection — the regression every drift monitor runs, with
    // the same bitwise-reproducibility contract as the SMA.
    "ts_linreg_trend" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
      val d = datediff(col("date"), lit("1970-01-01").cast("date"))
        .cast("long")
      val c = Exact.cents(col("close"))
      val agg = bars.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(d).as("sx"), sum(c).as("sy"),
             sum(d * d).as("sxx"), sum(c * c).as("syy"),
             sum(d * c).as("sxy"))
      val num = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double")
      val den = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      val deny = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double")
      agg.select(col("event_type"), col("n"),
          (num / den / lit(100.0)).as("slope_per_day"),
          (col("sy").cast("double") / (col("n").cast("double") * lit(100.0))
            - num / den / lit(100.0)
              * (col("sx").cast("double") / col("n").cast("double")))
            .as("intercept"),
          (num * num / (den * deny)).as("r2"))
        .orderBy("event_type")
    }),

    // End-to-end exactly-once streaming SINK: at-least-once delivery
    // (every event twice) through foreachBatch + keyed idempotent append
    // into parquet; the sink holds each event exactly once (n_rows ==
    // n_unique is part of the checked output).
    "stream_foreach_upsert" -> ((s, dir) => {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_upsert_sink").toString
      graft.streaming.EventStream.runForeachBatchUpsert(s, dir, sink)
        .orderBy("event_type")
    }),

    // Streaming point-in-time enrichment: streamed purchases as-of join
    // a static view history per micro-batch — batch boundaries can't
    // change any row's match, so streamed == batch as-of bitwise (the
    // oracle is DuckDB's native ASOF, same as the batch query).
    // The admission gate running per micro-batch over a document file
    // stream: row-local rules mean per-batch partial summaries ADD, so
    // streamed == batch bitwise — same oracle as pipeline_quality_gate.
    "stream_quality_gate" -> ((s, dir) => {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_gate_sink").toString
      graft.streaming.EventStream.runQualityGate(s, dir, sink)
        .orderBy("lang", "reason")
    }),

    "stream_asof_enrich" -> ((s, dir) => {
      val sink = java.nio.file.Files
        .createTempDirectory("graft_asof_sink").toString
      graft.streaming.EventStream.runAsOfEnrich(s, dir, sink)
        .orderBy("event_id")
    }),

    // The full rank-function family in one keyed window pass: rank /
    // dense_rank / percent_rank / cume_dist over the value order (tie
    // semantics exercised — gaps, plateaus, inclusive fractions), ntile
    // over the totalized order (ntile is positional, so its window must
    // be a total order or engines may disagree within ties).
    "window_rank_suite" -> ((s, dir) => {
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"))
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("event_type"), col("event_id"), col("value"),
          rank().over(wv).cast("long").as("rnk"),
          dense_rank().over(wv).cast("long").as("drnk"),
          percent_rank().over(wv).as("prnk"),
          cume_dist().over(wv).as("cdist"),
          ntile(4).over(wt).cast("long").as("tile"))
        .orderBy("event_type", "event_id")
    }),

    // Sketch-only set similarity: Jaccard estimated from two KMV sketches
    // (merged k-min ∩ both sketches) — compares 100 TB key sets by
    // touching 2·k sketch rows; exact figures ride along to show the
    // estimator's error on this data.
    "sketch_kmv_jaccard" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.filter(col("l_returnflag") === "R")
      val b = li.filter(col("l_returnflag") === "A")
      val sk = graft.olap.Sketch.kmvJaccard(a, col("l_partkey"),
        b, col("l_partkey"), k = 128)
      val aK = a.select(col("l_partkey").as("k")).distinct()
      val bK = b.select(col("l_partkey").as("k")).distinct()
      sk.crossJoin(aK.join(bK, Seq("k"), "leftsemi")
          .agg(count(lit(1)).as("n_inter")))
        .crossJoin(aK.unionByName(bK).distinct()
          .agg(count(lit(1)).as("n_union")))
        .withColumn("jaccard_exact",
          col("n_inter").cast("double") / col("n_union").cast("double"))
    }),

    // Local clustering coefficient distribution: per-node triangle counts
    // from the degree-ordered orientation (each triangle materialized once,
    // credited to all three corners — 3·T rows, never wedge-count rows),
    // then cc = 2t/(d(d-1)) bucketed into deciles with EXACT integer floor
    // division; sum_cc_micro is the per-node floor(2t·10⁶/(d(d-1))) summed
    // as BIGINT, so the distribution's mass is order-independent and
    // bitwise-portable. Nodes with d < 2 (cc undefined) land in bucket -1.
    "graph_clustering_coeff" -> ((s, dir) => {
      // pinned shared frames — one adjacency build serves triangles too
      val G = graft.olap.GraphFrames
      graft.olap.Triangles.perNodeCounts(G.coPurchaseEdges(s, dir),
          G.coPurchaseDegrees(s, dir), G.coPurchaseOriented(s, dir),
          G.coPurchaseAdjacency(s, dir))
        .select(
          when(col("d") < 2, lit(-1L)).otherwise(
            least(expr("(20 * t) DIV (d * (d - 1))"), lit(9L)))
            .as("cc_decile"),
          when(col("d") < 2, lit(0L)).otherwise(
            expr("(2000000 * t) DIV (d * (d - 1))")).as("ccm"),
          col("t"))
        .groupBy("cc_decile")
        .agg(count(lit(1)).as("n_nodes"), sum(col("t")).as("sum_tri"),
             sum(col("ccm")).as("sum_cc_micro"))
        .orderBy("cc_decile")
    }),

    // Common-neighbor link prediction: for every non-adjacent node pair,
    // count shared neighbors and keep the top 20 candidates. Wedges are
    // generated per CENTER via a keyed self-join on the symmetrized edge
    // list, with hub centers above the documented degree cap excluded —
    // the standard bound that keeps wedge volume Σ C(min(d,cap),2) linear
    // ish instead of quadratic in hub degree at 100 TB (super-hub centers
    // add near-zero signal to common-neighbor scores). Existing edges are
    // removed by an anti-join on the canonical form; the limit boundary is
    // made deterministic by the (cn desc, x, y) total order.
    "graph_common_neighbors" -> ((s, dir) => {
      val cap = 32L
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      val sym = e.select(col("u").as("c"), col("v").as("x"))
        .unionAll(e.select(col("v").as("c"), col("u").as("x")))
      // pinned full-degree frame (≡ sym.groupBy count) serves the cap
      val okc = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .filter(col("d") <= cap).select(col("n").as("c"))
      // the capped adjacency is BOTH wedge sides — cache it so the
      // degree-filter semi-join runs once, not once per side
      val capped = sym.join(okc, Seq("c"), "leftsemi").tracked
      val wedges = capped.as("s1")
        .join(capped.as("s2"), Seq("c"))
        .filter(col("s1.x") < col("s2.x"))
        .select(col("s1.x").as("x"), col("s2.x").as("y"))
      wedges.groupBy("x", "y").agg(count(lit(1)).as("cn"))
        .join(e, col("x") === col("u") && col("y") === col("v"), "leftanti")
        .orderBy(col("cn").desc, col("x"), col("y"))
        .limit(20)
    }),

    // Jaccard link prediction: common_neighbors' union-normalized sibling —
    // J(x,y) = |N(x)∩N(y)| / |N(x)∪N(y)| = cn/(du+dv−cn), the score that
    // does not favor hubs. Same degree-capped wedge generation (cap 64 —
    // the documented bound keeping wedge volume linear at 100 TB; cn
    // counts common neighbors of capped degree, du/dv are FULL degrees,
    // so J is the capped lower-bound estimate), exact integers until one
    // IEEE division, deterministic (jaccard desc, x, y) top-20 boundary.
    "graph_jaccard_links" -> ((s, dir) => {
      val cap = 64L
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      val sym = e.select(col("u").as("c"), col("v").as("x"))
        .unionAll(e.select(col("v").as("c"), col("u").as("x")))
      // pinned full-degree frame serves the cap filter AND du/dv lookups
      val deg = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .select(col("n").as("c"), col("d").as("dc"))
      val okc = deg.filter(col("dc") <= cap).select("c")
      val capped = sym.join(okc, Seq("c"), "leftsemi").tracked
      val cnPairs = capped.as("s1").join(capped.as("s2"), Seq("c"))
        .filter(col("s1.x") < col("s2.x"))
        .select(col("s1.x").as("x"), col("s2.x").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("cn"))
      cnPairs
        .join(e, col("x") === col("u") && col("y") === col("v"), "leftanti")
        .join(deg.select(col("c").as("x"), col("dc").as("du")), "x")
        .join(deg.select(col("c").as("y"), col("dc").as("dv")), "y")
        .select(col("x"), col("y"), col("cn"), col("du"), col("dv"),
          (col("cn").cast("double")
            / (col("du") + col("dv") - col("cn")).cast("double"))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("x"), col("y"))
        .limit(20)
    }),

    // Referential-integrity audit across the star schema: per FK relation,
    // child rows, distinct / null keys, and orphan keys+rows (non-null key
    // with no parent). Child keys are pre-aggregated per key BEFORE the
    // parent anti-join, so the join input is |distinct keys| not |rows|,
    // and small parents broadcast. The audit-over-clean-data output (zero
    // orphans here) is the point: it is the certification a 100 TB
    // warehouse runs after every load.
    "dq_referential_integrity" -> ((s, dir) => {
      def audit(rel: String, child: DataFrame, key: org.apache.spark.sql.Column,
                parent: DataFrame, pkey: org.apache.spark.sql.Column) = {
        val keyed = child.select(key.as("k"))
        val counts = keyed.groupBy("k").agg(count(lit(1)).as("cnt"))
        val orphans = counts.filter(col("k").isNotNull)
          .join(broadcast(parent.select(pkey.as("k")).distinct()),
                Seq("k"), "leftanti")
          .agg(coalesce(count(lit(1)), lit(0L)).as("n_orphan_keys"),
               coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"))
        keyed.agg(count(lit(1)).as("n_child_rows"),
            count_distinct(col("k")).as("n_distinct_keys"),
            sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
          .crossJoin(orphans)
          .select(lit(rel).as("relation"), col("n_child_rows"),
                  col("n_distinct_keys"), col("n_null_keys"),
                  col("n_orphan_keys"), col("n_orphan_rows"))
      }
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      audit("lineitem.orderkey->orders", li, col("l_orderkey"),
            o, col("o_orderkey"))
        .unionByName(audit("lineitem.partkey->part", li, col("l_partkey"),
            Tables.part(s, dir), col("p_partkey")))
        .unionByName(audit("lineitem.suppkey->supplier", li, col("l_suppkey"),
            Tables.supplier(s, dir), col("s_suppkey")))
        .unionByName(audit("orders.custkey->customer", o, col("o_custkey"),
            Tables.customer(s, dir), col("c_custkey")))
        .unionByName(audit("events.user_id->customer",
            Tables.events(s, dir), col("user_id"),
            Tables.customer(s, dir), col("c_custkey")))
        .orderBy("relation")
    }),

    // Multi-lag autocorrelation function (ACF lags 1-3) per series — the
    // generalization of ts_autocorr_lag1: ONE keyed window pass computes
    // all three lagged partners, stack() unpivots to (lag, x, y) rows, and
    // each (series, lag) Pearson is the exact quantized-moment formula
    // (floor(r·2²⁰) once, BIGINT/DECIMAL sums, one final double chain).
    // One window exchange + one partial-aggregable groupBy regardless of
    // the lag count.
    "ts_acf_multilag" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("date"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("x"))
      val pairs = rq
        .withColumn("y1", lag(col("x"), 1).over(w))
        .withColumn("y2", lag(col("x"), 2).over(w))
        .withColumn("y3", lag(col("x"), 3).over(w))
        .select(col("event_type"), col("x"),
          expr("stack(3, 1L, y1, 2L, y2, 3L, y3) AS (lag, y)"))
        .filter(col("y").isNotNull)
      val agg = pairs.groupBy("event_type", "lag")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      agg.select(col("event_type"), col("lag"), col("n"),
        ((nd * col("sxy") - d(col("sx")) * col("sy")).cast("double")
          / (sqrt((nd * col("sxx") - d(col("sx")) * col("sx"))
               .cast("double"))
             * sqrt((nd * col("syy") - d(col("sy")) * col("sy"))
               .cast("double"))))
          .as("acf"))
        .orderBy("event_type", "lag")
    }),

    // Turning-point census per series: strict local maxima/minima and
    // flat steps of the daily close, from one keyed window pass
    // (lag + lead on exact cents — integer comparisons, no doubles).
    // The shape statistic behind peak/trough detection and trend-quality
    // screens; series ends (no two-sided neighborhood) are excluded by
    // the null filter.
    "ts_turning_points" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("p", lag(col("c"), 1).over(w))
        .withColumn("nx", lead(col("c"), 1).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("p").isNotNull && col("nx").isNotNull &&
                   col("p") < col("c") && col("c") > col("nx"), 1L)
            .otherwise(0L)).as("n_maxima"),
          sum(when(col("p").isNotNull && col("nx").isNotNull &&
                   col("p") > col("c") && col("c") < col("nx"), 1L)
            .otherwise(0L)).as("n_minima"),
          sum(when(col("p").isNotNull && col("p") === col("c"), 1L)
            .otherwise(0L)).as("n_flat"))
        .orderBy("event_type")
    }),

    // CDC apply with delete semantics: events are a change stream where
    // event_type = 'error' marks a key deletion and everything else
    // upserts (documented synthetic mapping). The final state per key is
    // decided by the LAST op in (ts, event_id) order — computed with a
    // partial-aggregable max_by over the packed op struct (no window, no
    // full-history shuffle beyond the one keyed aggregate), then delete
    // finals drop out. This is MERGE INTO semantics as one aggregate —
    // the shape that survives a 100 TB changelog.
    "inc_cdc_apply" -> ((s, dir) => {
      val fin = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"), Exact.cents(col("value")).as("vc"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ops"),
          max_by(struct(col("event_type").as("et"), col("event_id").as("eid"),
                        col("vc")),
                 struct(col("ts"), col("event_id"))).as("last"))
      fin.filter(col("last.et") =!= "error")
        .select(col("user_id"), col("n_ops"),
                col("last.eid").as("last_event_id"),
                col("last.vc").as("last_value_cents"))
        .orderBy("user_id")
    }),

    // Token co-occurrence mining: top pairs of long tokens (length ≥ 4,
    // the noise bound) appearing in the same document. Document-level
    // DISTINCT token sets first (so a pair counts once per doc), then a
    // keyed self-join on doc_id with a < b — pair volume is Σ C(k_doc, 2),
    // bounded by document length exactly like the co-purchase edge gen,
    // never corpus-quadratic. Deterministic (n_docs desc, a, b) top-30
    // boundary. The collocation signal behind phrase mining and
    // compound-token vocabulary induction.
    "text_cooccurrence_topk" -> ((s, dir) => {
      val tk = Tables.documents(s, dir)
        .select(col("doc_id"),
                explode(graft.text.TextAnalysis.tokens("text")).as("token"))
        .filter(length(col("token")) >= 4)
        .distinct()
      tk.select(col("doc_id"), col("token").as("tok_a")).as("a")
        .join(tk.select(col("doc_id"), col("token").as("tok_b")).as("b"),
              Seq("doc_id"))
        .filter(col("tok_a") < col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("tok_a"), col("tok_b"))
        .limit(30)
    }),

    // Streaming windowed top-k: per-day event-type counts maintained by
    // the watermarked tumbling aggregation, deterministic per-day top-3
    // rank applied to the finalized sink table (see
    // EventStream.runWindowedTopk for why the rank lives sink-side).
    "stream_windowed_topk" -> ((s, dir) =>
      graft.streaming.EventStream.runWindowedTopk(s, dir)
        .orderBy("date", "rnk")),

    // Newman modularity of the label-propagation partition — the quality
    // score that closes the community-detection loop. Q = ΣL_c/m −
    // Σd_c²/(4m²) is computed as ONE exact rational: q_num = 4m·ΣL_c −
    // Σd_c² and q_den = 4m² in BIGINT (all sums partial-aggregable), one
    // final double division. The labels frame is computed once and
    // persisted for its two consumers (intra-edge count + degree mass);
    // magnitudes stay < 2⁵³ so the double conversion is exact on both
    // engines.
    "graph_modularity" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("src"),
                           (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                               (col("l_partkey") * 2).as("dst")))
      val lab = graft.olap.LabelProp.labels(e, 2).tracked
      val m = pairs.agg(count(lit(1)).as("m_edges"))
      val intra = pairs
        .join(lab.select((col("node")).as("pn"), col("label").as("la")),
              col("pn") === col("l_partkey") * 2)
        .join(lab.select(col("node").as("sn"), col("label").as("lb")),
              col("sn") === col("l_suppkey") * 2 + 1)
        .agg(sum(when(col("la") === col("lb"), 1L).otherwise(0L))
          .as("intra_edges"))
      val dc = e.groupBy("src").agg(count(lit(1)).as("d"))
        .join(lab, col("src") === col("node"))
        .groupBy("label").agg(sum(col("d")).as("dsum"))
      val dstats = dc.agg(count(lit(1)).as("n_communities"),
                          sum(col("dsum") * col("dsum")).as("sum_dc2"))
      m.crossJoin(intra).crossJoin(dstats)
        .select(col("n_communities"), col("m_edges"), col("intra_edges"),
          (lit(4L) * col("m_edges") * col("intra_edges") - col("sum_dc2"))
            .as("q_num"),
          (lit(4L) * col("m_edges") * col("m_edges")).as("q_den"))
        .withColumn("modularity",
          col("q_num").cast("double") / col("q_den").cast("double"))
    }),

    // Sequential pattern mining: the top event-type trigrams users emit
    // (behavioral path analysis). Per-user strict (ts, event_id) order,
    // two leads from ONE keyed window pass, then a partial-aggregable
    // trigram count with a deterministic top-10 boundary. The shape
    // behind funnel discovery — where sessionize_funnel checks a GIVEN
    // path, this MINES the paths.
    "mine_event_trigrams" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("e1"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(10)
    }),

    // Duplicate-rate report by source: the per-origin contamination view
    // over the SAME normalization key as dedup_normalized (fold case,
    // collapse whitespace), so the numbers reconcile with the global
    // dedup. One scan, one partial-aggregable groupBy; the distinct
    // count is per (source, norm) — no global distinct state.
    "dedup_rate_by_source" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          trim(regexp_replace(
            translate(col("text"), TextAnalysis.asciiUpper,
              TextAnalysis.asciiLower),
            "[ \\t\\n\\r\\f\\x0B]+", " ")).as("norm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             count_distinct(col("norm")).as("n_distinct"))
        .withColumn("n_dupes", col("n_docs") - col("n_distinct"))
        .withColumn("dup_rate",
          col("n_dupes").cast("double") / col("n_docs").cast("double"))
        .orderBy("source")),

    // Inter-event gap histogram: per-user gaps in EXACT integer seconds
    // (unix_micros diffs floor-divided — no timestamp-to-double), log₂
    // buckets via the portable length(bin(n+1))−1 trick, one keyed window
    // pass + one partial-aggregable groupBy. The arrival-process
    // diagnostic behind session-timeout and watermark-delay tuning.
    "ts_gap_histogram" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(expr("(us - prev_us) DIV 1000000").as("gap_s"))
        .select((length(bin(col("gap_s") + 1)) - 1).cast("long")
          .as("gap_bucket"), col("gap_s"))
        .groupBy("gap_bucket")
        .agg(count(lit(1)).as("n_gaps"), min(col("gap_s")).as("min_gap_s"),
             max(col("gap_s")).as("max_gap_s"))
        .orderBy("gap_bucket")
    }),

    // REAL image resize: encode the deterministic gradient corpus as
    // actual compressed PNGs, then decode each through javax.imageio and
    // nearest-neighbor downsample 2× (source index = 2·target index) in
    // the same batched mapPartitions pass. The oracle recomputes the
    // sampled checksums arithmetically from the synthesis formula —
    // a full encode → real decode → resample round-trip, not a stub.
    "mm_png_resize" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nChars) =>
            val w = (1 + id % 8).toInt
            val h = (1 + nChars % 8).toInt
            graft.multimodal.Media.MediaRow(id,
              graft.multimodal.Media.PngCodec.encodeGray(w, h,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt),
              "png")
          }
        }
      graft.multimodal.Media.resizeMeta(media).toDF()
        .select(col("media_id"), col("width"), col("height"),
                col("checksum"))
        .orderBy("media_id")
    }),

    // Two-sample z-test over every event-type pair: the A/B-experiment
    // readout next to the KS drift test. Per-group moments are ONE
    // partial-aggregable pass of exact cent sums; the variance numerator
    // n·Σx² − (Σx)² is taken in DECIMAL(38,0) ((Σx)² tops BIGINT at
    // corpus scale), and the z chain is written in one fixed operand
    // order mirrored token-for-token by the oracle, so the doubles are
    // bitwise. Pairs come from a self-join of the GROUP-COUNT-sized
    // stats frame — never of the data.
    "agg_two_sample_z" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val stats = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
        .groupBy("event_type")
        // Σx² on the decimal lattice from the first product: a raw BIGINT
        // c·c sum wraps SILENTLY at corpus scale where the oracle aborts
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
             sum(dec(col("c")) * dec(col("c"))).as("ss"))
        .tracked // both sides of the pair self-join
      val a = stats.select(col("event_type").as("et_a"), col("n").as("na"),
        col("sc").as("sca"), col("ss").as("ssa"))
      val b = stats.select(col("event_type").as("et_b"), col("n").as("nb"),
        col("sc").as("scb"), col("ss").as("ssb"))
      val ma = d(col("sca")) / d(col("na"))
      val mb = d(col("scb")) / d(col("nb"))
      val va = (dec(col("na")) * dec(col("ssa"))
        - dec(col("sca")) * dec(col("sca"))).cast("double") /
        d(col("na") * (col("na") - 1L))
      val vb = (dec(col("nb")) * dec(col("ssb"))
        - dec(col("scb")) * dec(col("scb"))).cast("double") /
        d(col("nb") * (col("nb") - 1L))
      a.join(b, col("et_a") < col("et_b"))
        .select(col("et_a"), col("et_b"), col("na"), col("nb"),
          (ma / 100.0).as("mean_a"), (mb / 100.0).as("mean_b"),
          ((ma - mb) / sqrt(va / d(col("na")) + vb / d(col("nb"))))
            .as("z"))
        .orderBy("et_a", "et_b")
    }),

    // Two-sample Kolmogorov–Smirnov statistic (click vs view value
    // distributions) — EXACT: D = max|F₁−F₂| is computed on the integer
    // lattice as max|n₂·cum₁(v) − n₁·cum₂(v)| over the merged support,
    // one final division. The cumulative counts use the two-level
    // distributed prefix sum (graft.text.Packing) — value-bucketed level
    // 1 in parallel, #buckets-row level 2 — NEVER a single-partition
    // window over the support. The distribution-drift test a 100 TB
    // feature pipeline runs between snapshots.
    "agg_ks_statistic" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), Exact.cents(col("value")).as("v"))
      val counts = ev.groupBy("v")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
               .as("c1"),
             sum(when(col("event_type") === "view", 1L).otherwise(0L))
               .as("c2"))
      val cum1 = graft.text.Packing.withStreamOffset(
        counts, "v", "c1", "cum1x", bucketSize = 1000L)
      val cum = graft.text.Packing.withStreamOffset(
        cum1, "v", "c2", "cum2x", bucketSize = 1000L)
        .select(col("v"),
          (col("cum1x") + col("c1")).as("cum1"),
          (col("cum2x") + col("c2")).as("cum2"))
      val n = ev.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n2"))
      cum.crossJoin(broadcast(n))
        .select(col("n1"), col("n2"), col("v"),
          abs(col("n2") * col("cum1") - col("n1") * col("cum2")).as("dn"))
        .groupBy("n1", "n2")
        .agg(max(col("dn")).as("d_num"),
             max_by(col("v"), struct(col("dn"), (-col("v")).as("nv")))
               .as("ks_at_value"))
        .withColumn("d_stat", col("d_num").cast("double")
          / (col("n1") * col("n2")).cast("double"))
        .select("n1", "n2", "d_num", "ks_at_value", "d_stat")
    }),

    // Schema evolution on read: two parquet snapshots written with
    // DIFFERENT schemas (the second adds a column), unified by
    // mergeSchema — the missing column surfaces as NULLs for old
    // snapshot rows. The report certifies the merged read: per-parity
    // row counts, nulls in the late-added column, exact cent sums.
    // The append-only schema-drift story every long-lived 100 TB table
    // eventually needs.
    "inc_schema_evolution" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_schema_evo").toString
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$base/snap=0")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$base/snap=1")
      s.read.option("mergeSchema", "true").parquet(base)
        .groupBy((col("o_orderkey") % 2).as("parity"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
            .as("n_null_priority"),
          sum(Exact.cents(col("o_totalprice"))).as("sum_cents"))
        .orderBy("parity")
    }),

    // Audience overlap matrix: distinct users shared by every event-type
    // pair, with exact Jaccard. Membership is reduced to distinct
    // (user, type) pairs FIRST (one partial-aggregable distinct), so the
    // keyed self-join on user_id fans out C(types_per_user, 2) ≤ C(5,2)
    // rows per user — bounded by the type-universe, never by event
    // volume. The segmentation-overlap report behind audience targeting.
    "olap_audience_overlap" -> ((s, dir) => {
      val m = Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct().tracked
      val sizes = m.groupBy("event_type").agg(count(lit(1)).as("sz"))
      val ov = m.select(col("user_id"), col("event_type").as("type_a"))
        .join(m.select(col("user_id"), col("event_type").as("type_b")),
              Seq("user_id"))
        .filter(col("type_a") <= col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_shared"))
      ov.join(broadcast(sizes.select(col("event_type").as("type_a"),
                                     col("sz").as("sz_a"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
                                     col("sz").as("sz_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            (col("sz_a") + col("sz_b") - col("n_shared")).cast("double"))
            .as("jaccard"))
        .orderBy("type_a", "type_b")
    }),

    // Temporal train/test split with a purge gap (leakage hygiene for
    // time-series ML): the boundary is the DATA-DEPENDENT exact 70th
    // percentile day, found with the same histogram + broadcast
    // cumulative pick as KCore's median (O(distinct days), no window,
    // nothing event-sized single-partition); a 2-day purge zone between
    // train and test absorbs look-ahead from windowed features. Split
    // sizes, user reach, and day bounds certify the cut.
    "sample_time_purged_split" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
                expr("unix_micros(ts) DIV 86400000000").as("day"))
      val hist = ev.groupBy("day").agg(count(lit(1)).as("c"))
      val cum = hist.as("a")
        .join(broadcast(hist.as("b")), col("b.day") <= col("a.day"))
        .groupBy(col("a.day").as("day")).agg(sum(col("b.c")).as("cum"))
      val rank = hist.agg(
        expr("CAST((sum(c) * 7 + 9) DIV 10 AS BIGINT)").as("r"))
      val d70 = cum.join(broadcast(rank))
        .filter(col("cum") >= col("r"))
        .agg(min(col("day")).as("d70"))
      ev.crossJoin(broadcast(d70))
        .select(col("user_id"), col("event_id"), col("day"),
          when(col("day") < col("d70"), "1_train")
            .when(col("day") < col("d70") + 2, "2_purged")
            .otherwise("3_test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
             count_distinct(col("user_id")).as("n_users"),
             min(col("day")).as("min_day"), max(col("day")).as("max_day"))
        .orderBy("split")
    }),

    // Value-at-Risk + Expected Shortfall per series (the reference
    // domain's tail-risk pair): VaR(5%) is the EXACT positional order
    // statistic of quantized daily returns — per-series return histogram
    // + broadcast triangular cumulative pick (the KCore-median shape,
    // O(distinct returns), no window over the return frame) — and ES is
    // the exact integer mean of the tail at-or-below VaR. One final
    // division each; everything else BIGINT.
    "ts_var_es" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("x"))
        .tracked
      val hist = rq.groupBy("event_type", "x").agg(count(lit(1)).as("cnt"))
      val cum = hist.as("a")
        .join(broadcast(hist.as("b")),
              col("a.event_type") === col("b.event_type") &&
              col("b.x") <= col("a.x"))
        .groupBy(col("a.event_type").as("event_type"), col("a.x").as("x"))
        .agg(sum(col("b.cnt")).as("cum"))
      val rank = hist.groupBy("event_type")
        .agg(expr("CAST((sum(cnt) + 19) DIV 20 AS BIGINT)").as("r"),
             sum(col("cnt")).as("n_days"))
      val varq = cum.join(broadcast(rank), Seq("event_type"))
        .filter(col("cum") >= col("r"))
        .groupBy("event_type")
        .agg(min(col("x")).as("var_q"))
      rq.join(broadcast(varq), Seq("event_type"))
        .filter(col("x") <= col("var_q"))
        .groupBy("event_type")
        .agg(sum(col("x")).as("tail_sum"), count(lit(1)).as("tail_n"),
             min(col("var_q")).as("var_q"))
        .join(broadcast(rank.select("event_type", "n_days")),
              Seq("event_type"))
        .select(col("event_type"), col("n_days"), col("var_q"),
          col("tail_sum"), col("tail_n"),
          (col("var_q").cast("double") / lit(1048576.0)).as("var_return"),
          (col("tail_sum").cast("double")
            / (col("tail_n") * lit(1048576L)).cast("double"))
            .as("es_return"))
        .orderBy("event_type")
    }),

    // Watermark-lateness what-if: replay events in (deterministic
    // hash-jittered) ARRIVAL order and count, per source partition
    // (event_type — the Kafka-partition model, where watermarks are
    // tracked per partition), how many events each candidate watermark
    // delay would drop: event late iff its event time is older than the
    // partition's running max event time at arrival minus the threshold.
    // One keyed window pass (exclusive running max), three thresholds
    // counted in the same aggregate — the tuning report that sizes
    // withWatermark() before a stream ships.
    "wm_lateness_whatif" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("arrival_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
                unix_micros(col("ts")).as("us"))
        .withColumn("delay_s",
          pmod(col("event_id") * lit(2654435761L), lit(2147483647L))
            % lit(7200L))
        .withColumn("arrival_us", col("us") + col("delay_s") * lit(1000000L))
        .withColumn("wm_us", max(col("us")).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("us") < col("wm_us") - lit(900L * 1000000L), 1L)
            .otherwise(0L)).as("late_15m"),
          sum(when(col("us") < col("wm_us") - lit(3600L * 1000000L), 1L)
            .otherwise(0L)).as("late_1h"),
          sum(when(col("us") < col("wm_us") - lit(7200L * 1000000L), 1L)
            .otherwise(0L)).as("late_2h"))
        .orderBy("event_type")
    }),

    // Iterative linear algebra as joins: 3 fixed power-iteration rounds
    // toward the top eigenvector of the 64×64 dimension-correlation
    // matrix (PCA's first component — the embedding-drift direction).
    // The matrix entries are quantized once (floor(corr·2²⁰)) and every
    // matvec is an exact keyed join + partial-aggregable BIGINT sum; each
    // round renormalizes to a ±4096 lattice with explicit FLOOR division
    // (truncation would diverge from the oracle on negatives). The
    // pattern that runs PCA/eigen-centrality at matrix sizes where the
    // matrix itself is a distributed frame.
    "emb_power_iteration" -> ((s, dir) => {
      val dims = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("p", "x")))
        .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
          floor(col("x").cast("double") * lit(65536.0)).as("q"))
      // stats (one corpus scan reduced to 64 rows) is referenced FOUR
      // times — both broadcast sides, the diagonal, and the iteration
      // seed; uncached, every broadcast-subquery round re-ran the scan
      val stats = dims.groupBy("i")
        .agg(count(lit(1)).as("n"), sum("q").as("s"),
             sum(col("q") * col("q")).as("ss"))
        .tracked
      val pairs = dims.select(col("vec_id"), col("i"), col("q"))
        .join(dims.select(col("vec_id"), col("i").as("j"),
              col("q").as("qj")), "vec_id")
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(sum(col("q") * col("qj")).as("sp"))
      val si = broadcast(stats.select(col("i"), col("n"),
        col("s").as("si"), col("ss").as("ssi")))
      val sj = broadcast(stats.select(col("i").as("j"),
        col("s").as("sj"), col("ss").as("ssj")))
      val nD = col("n").cast("double")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      // upper sits on BOTH sides of the symmetrizing union — cache it or
      // the corpus-wide pair aggregation runs twice
      val upper = pairs.join(si, "i").join(sj, "j")
        .select(col("i"), col("j"),
          floor(((nD * d(col("sp")) - d(col("si")) * d(col("sj")))
            / (sqrt(nD * d(col("ssi")) - d(col("si")) * d(col("si")))
               * sqrt(nD * d(col("ssj")) - d(col("sj")) * d(col("sj")))))
            * lit(1048576.0)).cast("long").as("cq"))
        .tracked
      // re-key the union: without it the cached matrix inherits 3x32
      // near-empty partitions (one set per union branch) and every
      // iteration stage pays 96 tasks to scan a dims²-row frame
      val mat = upper
        .unionByName(upper.select(col("j").as("i"), col("i").as("j"),
          col("cq")))
        .unionByName(stats.select(col("i"), col("i").as("j"),
          lit(1048576L).as("cq")))
        .repartition(col("i"))
        .tracked
      var v = stats.select(col("i").as("j"), lit(4096L).as("v"))
      for (_ <- 1 to 3) {
        val x = mat.join(v, "j").groupBy("i")
          .agg(sum(col("cq") * col("v")).as("x"))
        val mx = x.agg(max(abs(col("x"))).as("mx"))
        v = x.crossJoin(broadcast(mx))
          .select(col("i").as("j"),
            expr("(x * 4096 - (((x * 4096) % mx) + mx) % mx) DIV mx")
              .as("v"))
      }
      v.select(col("j").as("dim"), col("v").as("v3")).orderBy("dim")
    }),

    // Average True Range (Wilder's volatility), on the REAL OHLC bars:
    // TR = max(high−low, |high−prev_close|, |low−prev_close|) — pure
    // IEEE single ops, bit-identical across engines — smoothed by the
    // same deterministic prefix-fold EMA as ts_ema (first TR seeds the
    // fold; oracle replays the identical fold with list_reduce). The
    // band-width input for Keltner/Supertrend overlays.
    "ts_atr" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"), col("high"), col("low"),
                col("close"))
        .withColumn("prev_close", lag(col("close"), 1).over(w))
        .filter(col("prev_close").isNotNull)
        .withColumn("tr", greatest(col("high") - col("low"),
          abs(col("high") - col("prev_close")),
          abs(col("low") - col("prev_close"))))
      graft.ts.Ema.withEma(bars, 0.25, Seq("event_type"), closeCol = "tr")
        .select(col("event_type"), col("date"), col("tr"),
                col("ema").as("atr"))
        .orderBy("event_type", "date")
    }),

    // Pure-SQL surface parity: the whole query is one spark.sql() text
    // (CTE + windowed rank over an aggregate) against registered views —
    // what a SQL-first consumer of the engine writes. Exact integer
    // cents; deterministic rank tie-break.
    "sql_api_topdays_report" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
      s.sql("""
        WITH d AS (SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS sd,
                          sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                            AS cents
                   FROM lineitem_v GROUP BY 1, 2),
             r AS (SELECT rf, sd, cents,
                          CAST(row_number() OVER (PARTITION BY rf
                            ORDER BY cents DESC, sd) AS BIGINT) AS rn
                   FROM d)
        SELECT rf, sd, cents, rn FROM r WHERE rn <= 3
        ORDER BY rf, rn""")
    }),

    // Dynamic partition overwrite: the day-partitioned table is rewritten
    // with mode=dynamic so ONLY the partitions present in the incoming
    // frame are replaced — here one day is compacted to its even event
    // ids while every other day's files are untouched. This is the
    // surgical-backfill mechanic of a partitioned 100 TB table (static
    // overwrite would truncate the whole table). The read-back report
    // certifies exactly one day changed.
    "inc_dynamic_partition_overwrite" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_dyn_overwrite").toString
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
                Exact.cents(col("value")).as("cents"),
                expr("unix_micros(ts) DIV 86400000000").as("day"))
      ev.write.partitionBy("day").mode("overwrite").parquet(base)
      val d0 = ev.agg(min(col("day"))).collect()(0).getLong(0)
      val old = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        ev.filter(col("day") === d0 && col("event_id") % 2 === 0)
          .write.partitionBy("day").mode("overwrite").parquet(base)
      } finally old match {
        case Some(v) =>
          s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(base)
        // partition-column inference narrows day to INT32 on read-back;
        // restore the BIGINT the rest of the engine (and oracle) uses
        .groupBy(col("day").cast("long").as("day"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .orderBy("day")
    }),

    // Deterministic Poisson-style bootstrap: 32 hash-weighted replicates
    // of the mean purchase value in ONE pass (explode the replicate id,
    // weight = hash(event_id, b) mod 3 ∈ {0,1,2}, E[w] = 1), each
    // replicate an exact integer (Σw·c, Σw) pair with one division; the
    // 90% CI is the exact positional P5/P95 over the B = 32 replicate
    // means (a constant-bounded 32-row rank, never data-sized). The
    // uncertainty quantification a pipeline attaches to headline metrics
    // without a second data pass.
    "agg_bootstrap_ci" -> ((s, dir) => {
      val reps = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), Exact.cents(col("value")).as("c"))
        .select(col("event_id"), col("c"),
                explode(sequence(lit(0L), lit(31L))).as("b"))
        .withColumn("wgt",
          pmod((col("event_id") * lit(31L) + col("b")) * lit(2654435761L),
               lit(2147483647L)) % lit(3L))
        .groupBy("b")
        .agg((sum(col("wgt") * col("c")).cast("double")
          / sum(col("wgt")).cast("double")).as("rep_mean"))
      // constant partition key: 32 rows by construction (B is constant), so
      // the single partition is deliberate, not a missing key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("b"))).orderBy("rep_mean", "b")
      val ranked = reps.withColumn("rn", row_number().over(w))
      val point = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .agg((sum(Exact.cents(col("value"))).cast("double")
          / count(lit(1)).cast("double")).as("point_mean"))
      ranked.agg(count(lit(1)).as("n_replicates"),
          max(when(col("rn") === 2, col("rep_mean"))).as("ci_lo"),
          max(when(col("rn") === 31, col("rep_mean"))).as("ci_hi"))
        .crossJoin(point)
        .select("n_replicates", "point_mean", "ci_lo", "ci_hi")
    }),

    // Streaming CDC apply (delete semantics) over three replayed
    // micro-batches with versioned compacted key state — same output
    // columns and SAME oracle as the batch inc_cdc_apply, so the driver
    // compare itself pins streamed == batch (see EventStream.runCdcApply
    // for why deletes must stay in state until read time).
    "stream_cdc_apply" -> ((s, dir) => {
      val work = java.nio.file.Files
        .createTempDirectory("graft_cdc_stream").toString
      graft.streaming.EventStream.runCdcApply(s, dir, work)
        .orderBy("user_id")
    }),

    // Seasonality strength as one-way ANOVA: η² = SS_between / SS_total
    // of daily closes grouped by day-of-week, per series — EXACT end to
    // end: SST = n·Σx²−S² in BIGINT, and each DOW group's
    // (n·s_g − n_g·S)² DIV (n_g·n) is an exact non-negative integer
    // quotient (truncation == floor), summed partial-aggregably. The
    // "is the weekly pattern real" screen behind ts_seasonality_dow's
    // per-DOW means.
    "ts_seasonality_strength" -> ((s, dir) => {
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"),
                (weekday(col("date")) + 1).cast("long").as("dow"),
                Exact.cents(col("close")).as("x"))
      val tot = bars.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
             sum(col("x") * col("x")).as("ss"))
      val grp = bars.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
      val ssb = grp.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"),
          expr("""(n * sg - ng * s) * (n * sg - ng * s)
                  DIV (ng * n)""").as("qg"))
        .groupBy("event_type")
        .agg(sum(col("qg")).as("ssb_q"), count(lit(1)).as("n_groups"))
      tot.select(col("event_type"), col("n"),
          (col("n") * col("ss") - col("s") * col("s")).as("sst"))
        .join(ssb, Seq("event_type"))
        .select(col("event_type"), col("n"), col("n_groups"),
          col("ssb_q"), col("sst"),
          (col("ssb_q").cast("double") / col("sst").cast("double"))
            .as("eta_sq"))
        .orderBy("event_type")
    }),

    // Sketch-only set intersection: |A∩B| ≈ |A| + |B| − |A∪B| by
    // inclusion-exclusion over three HLL estimates — the union sketch is
    // ONE register-wise merge of the two per-set sketches (the native
    // TypedImperativeAggregate's mergeAgg), so two 100 TB key sets are
    // intersected by touching 2·512 register bytes. Exact figures ride
    // along to show the estimator's error here.
    "sketch_hll_intersection" -> ((s, dir) => {
      import graft.olap.Hll
      val base = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), col("user_id"),
                graft.olap.Sketch.spreadHash(col("user_id")).as("hv"))
      val perType = base.groupBy("event_type")
        .agg(Hll.sketchAgg(col("hv")).as("sk"),
             count_distinct(col("user_id")).as("n_exact"))
        .tracked
      val est = perType.agg(
        max(when(col("event_type") === "click",
          Hll.estimate(col("sk")))).as("est_a"),
        max(when(col("event_type") === "view",
          Hll.estimate(col("sk")))).as("est_b"),
        max(when(col("event_type") === "click", col("n_exact"))).as("n_a"),
        max(when(col("event_type") === "view", col("n_exact"))).as("n_b"))
      val uni = perType.agg(Hll.mergeAgg(col("sk")).as("sk"))
        .select(Hll.estimate(col("sk")).as("est_union"))
      val aU = base.filter(col("event_type") === "click")
        .select("user_id").distinct()
      val bU = base.filter(col("event_type") === "view")
        .select("user_id").distinct()
      val interExact = aU.join(bU, Seq("user_id"), "leftsemi")
        .agg(count(lit(1)).as("n_inter_exact"))
      est.crossJoin(uni).crossJoin(interExact)
        .select(col("est_a"), col("est_b"), col("est_union"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
          col("n_a"), col("n_b"), col("n_inter_exact"))
    }),

    // Shewhart control chart: flag days whose mean ticket leaves the
    // ±3σ band around the global mean — the out-of-control test done as
    // ONE exact integer comparison with all fractions cleared:
    // (n·s_d − n_d·S)² > 9·n_d²·(n·Σx² − S²), DECIMAL(38,0) vs HUGEINT
    // bit-identical. Two partial-aggregable passes (global + per-day)
    // and a broadcast scalar join; the monitoring primitive behind
    // metric regression alerts.
    "agg_control_chart" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
                Exact.cents(col("value")).as("x"))
      val tot = ev.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
                       sum(col("x") * col("x")).as("ss"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val a = d38(col("n")) * col("sd") - d38(col("nd")) * col("s")
      val rhs = lit(9) * d38(col("nd")) * col("nd") *
        (d38(col("n")) * col("ss") - d38(col("s")) * col("s"))
      ev.groupBy("day")
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd"))
        .crossJoin(broadcast(tot))
        .select(col("day"), col("nd"),
          (col("sd").cast("double") / col("nd").cast("double"))
            .as("day_mean_cents"),
          (a * a > rhs).as("ooc"))
        .orderBy("day")
    }),

    // Period-over-period growth (the WoW report): exact weekly cent sums
    // per series, previous week via one keyed lag, growth as one
    // division of exact integers. NULL growth on each series' first week
    // and on zero-revenue previous weeks (division guarded, not Inf).
    "olap_period_over_period" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("week")
      Tables.events(s, dir)
        .groupBy(col("event_type"),
                 date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(sum(Exact.cents(col("value"))).as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("growth",
          when(col("prev_cents").isNotNull && col("prev_cents") =!= 0L,
            (col("cents") - col("prev_cents")).cast("double")
              / col("prev_cents").cast("double")))
        .orderBy("event_type", "week")
    }),

    // Conversion lag: per user, first signup → first purchase AT OR
    // AFTER it; exact integer minute deltas, with quartiles as EXACT
    // positional order statistics picked from a cumulative delta
    // histogram built by the two-level distributed prefix sum (Packing)
    // — no window over the conversion frame, no triangular join, so the
    // same plan stands when conversions are billions of rows. The
    // time-to-convert funnel metric behind activation dashboards.
    "agg_time_to_convert" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
                unix_micros(col("ts")).as("us"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("us")).as("su_us"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("us") >= col("su_us"))
        .groupBy("user_id")
        .agg(min(col("us")).as("pu_us"), min(col("su_us")).as("su_us"))
        .select(col("user_id"),
          expr("(pu_us - su_us) DIV 60000000").as("delta_m"))
        .tracked
      val counts = conv.groupBy("delta_m").agg(count(lit(1)).as("cnt"))
      val cum = graft.text.Packing.withStreamOffset(
          counts, "delta_m", "cnt", "cum0", bucketSize = 1000L)
        .select(col("delta_m"), (col("cum0") + col("cnt")).as("cum"))
      val ranks = conv.agg(count(lit(1)).as("n_converted"),
        expr("CAST((count(1) + 3) DIV 4 AS BIGINT)").as("r1"),
        expr("CAST((count(1) + 1) DIV 2 AS BIGINT)").as("r2"),
        expr("CAST((3 * count(1) + 3) DIV 4 AS BIGINT)").as("r3"))
      val nSignup = su.agg(count(lit(1)).as("n_signup_users"))
      cum.crossJoin(broadcast(ranks))
        .agg(min(when(col("cum") >= col("r1"), col("delta_m"))).as("q1_m"),
             min(when(col("cum") >= col("r2"), col("delta_m")))
               .as("median_m"),
             min(when(col("cum") >= col("r3"), col("delta_m"))).as("q3_m"),
             min(col("n_converted")).as("n_converted"))
        .crossJoin(nSignup)
        .select(col("n_signup_users"), col("n_converted"),
          (col("n_converted").cast("double")
            / col("n_signup_users").cast("double")).as("conversion_rate"),
          col("q1_m"), col("median_m"), col("q3_m"))
    }),

    // Distinct users at three time grains in ONE grouping-sets pass:
    // count_distinct under GROUPING SETS (day), (week), (month) — the
    // expand operator fans each row into its grains and the distinct
    // aggregate dedups per grain, one shuffle total. Grain keys are
    // coalesced into one label column (both engines order NULLs
    // differently — the proven grouping-sets discipline).
    "olap_distinct_rollup" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"),
          date_trunc("week", col("ts")).cast("date").as("week"),
          date_trunc("month", col("ts")).cast("date").as("month"))
        .createOrReplaceTempView("graft_ev_grains")
      s.sql("""SELECT CASE WHEN day IS NOT NULL THEN '1_day'
                           WHEN week IS NOT NULL THEN '2_week'
                           ELSE '3_month' END AS grain,
                      coalesce(CAST(day AS STRING), CAST(week AS STRING),
                               CAST(month AS STRING)) AS bucket,
                      count(DISTINCT user_id) AS n_users,
                      count(*) AS n_events
               FROM graft_ev_grains
               GROUP BY GROUPING SETS ((day), (week), (month))
               ORDER BY grain, bucket""")
    }),

    // Group-aware k-fold assignment: every event of a user lands in the
    // SAME fold (fold = multiplicative hash of user_id mod 5 — the
    // grouped split that stops per-user leakage across folds), plus the
    // balance report that certifies the split. One scan, one
    // partial-aggregable groupBy; assignment is pure arithmetic, so
    // re-runs and late data agree forever.
    "sample_group_kfold" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          pmod(col("user_id") * lit(2654435761L), lit(2147483647L))
            .mod(lit(5L)).as("fold"))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_events"),
             count_distinct(col("user_id")).as("n_users"))
        .orderBy("fold")),

    // Estimator quality as a first-class query: precision/recall of the
    // MinHash-LSH near-dup pipeline against exact shingle Jaccard ≥ 0.5
    // on the declared id-bounded range (the same bound every exact-pairs
    // ground truth in this engine uses — the all-pairs side is the
    // oracle, never the production path). The shingle chain is shared
    // bit-for-bit between the LSH signatures and the exact sets
    // (gram_hashes(3) ≡ the signature shingles), so this measures
    // exactly the banding+estimation loss, nothing else.
    "dedup_lsh_quality" -> ((s, dir) => {
      import graft.dedup.{MinHash, NgramJaccard}
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val lsh = MinHash.nearDupPairs(docs, "doc_id", "text",
          k = 16, r = 4, minEstJaccard = 0.5)
        .select(col("doc_a"), col("doc_b")).tracked
      val g = docs.select(col("doc_id"),
          NgramJaccard.gram_hashes(col("text"), 3).as("gr"))
        .filter(size(col("gr")) > 0)
      val exact = g.select(col("doc_id").as("doc_a"), col("gr").as("ga"))
        .join(g.select(col("doc_id").as("doc_b"), col("gr").as("gb")),
              col("doc_a") < col("doc_b"))
        .filter(NgramJaccard.jaccard_sorted(col("ga"), col("gb")) >= 0.5)
        .select(col("doc_a"), col("doc_b")).tracked
      val tp = lsh.join(exact, Seq("doc_a", "doc_b"), "leftsemi")
        .agg(count(lit(1)).as("tp"))
      lsh.agg(count(lit(1)).as("n_lsh"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(tp)
        .select(col("n_lsh"), col("n_exact"), col("tp"),
          (col("n_lsh") - col("tp")).as("fp"),
          (col("n_exact") - col("tp")).as("fn"),
          when(col("n_lsh") > 0,
            col("tp").cast("double") / col("n_lsh").cast("double"))
            .as("precision"),
          when(col("n_exact") > 0,
            col("tp").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    }),

    // Donchian channels: trailing-10-bar high/low band per series from
    // one keyed ROWS window on exact cents (integer min/max — no
    // doubles anywhere), with breakout flags as integer equality against
    // the band edges. NULL band while the frame fills (positional
    // semantics pinned by the row count guard). The breakout primitive
    // under turtle-style trend systems.
    "ts_donchian_channels" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date").rowsBetween(-9, 0)
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("high")).as("hi_c"),
                Exact.cents(col("low")).as("lo_c"),
                Exact.cents(col("close")).as("cl_c"))
        .withColumn("n_in_frame", count(lit(1)).over(w))
        .withColumn("chan_hi",
          when(col("n_in_frame") === 10, max(col("hi_c")).over(w)))
        .withColumn("chan_lo",
          when(col("n_in_frame") === 10, min(col("lo_c")).over(w)))
        .select(col("event_type"), col("date"), col("cl_c"),
          col("chan_hi"), col("chan_lo"),
          (col("chan_hi").isNotNull &&
            col("cl_c") === col("chan_hi")).as("breakout_up"),
          (col("chan_lo").isNotNull &&
            col("cl_c") === col("chan_lo")).as("breakout_down"))
        .orderBy("event_type", "date")
    }),

    // Discount elasticity: exact OLS slope of quantity on discount per
    // return flag — every moment an integer sum on the (discount-bp ×
    // quantity-q) lattice, cross-products cleared of fractions in
    // DECIMAL(38,0) ≡ HUGEINT, one fixed double chain per figure. The
    // price-sensitivity screen, same cleared-fraction OLS as
    // ts_linreg_trend.
    "agg_discount_elasticity" -> ((s, dir) => {
      val x = expr("CAST(round(l_discount * 10000, 0) AS BIGINT)")
      val y = expr("CAST(round(l_quantity * 100, 0) AS BIGINT)")
      val agg = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
             sum(col("x") * col("y")).as("sxy"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val num = (d38(col("n")) * col("sxy") - d38(col("sx")) * col("sy"))
        .cast("double")
      val den = (d38(col("n")) * col("sxx") - d38(col("sx")) * col("sx"))
        .cast("double")
      agg.select(col("l_returnflag"), col("n"),
          (num / den).as("slope_q_per_bp"),
          (col("sy").cast("double") / col("n").cast("double")
            - num / den
              * (col("sx").cast("double") / col("n").cast("double")))
            .as("intercept_q"))
        .orderBy("l_returnflag")
    }),

    // Feature hashing (the hashing-trick embedding): every token routed
    // to one of 64 dimensions by the portable char-fold hash, signed by
    // the next hash bit, summed per (doc, dim) — the fixed-width
    // document vector a linear probe trains on, with NO vocabulary state
    // at any scale. One explode + one partial-aggregable groupBy;
    // zero-weight cells (sign cancellation) drop out.
    "text_feature_hashing" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.text.TextAnalysis.tokens("text")).as("tok"))
        .select(col("doc_id"),
          graft.functions.CharFold.char_fold_hash(col("tok")).as("h"))
        .select(col("doc_id"), (col("h") % 64).as("dim"),
          when(expr("(h DIV 64) % 2") === 0, 1L).otherwise(-1L).as("sgn"))
        .groupBy("doc_id", "dim")
        .agg(sum(col("sgn")).as("weight"))
        .filter(col("weight") =!= 0L)
        .orderBy("doc_id", "dim")),

    // Business-calendar feature frame (ML feature engineering over the
    // real NYSE rule-set calendar): per order date — weekend/holiday/
    // business-day flags and the roll-forward distance to the next
    // business day, found as the MIN qualifying offset over a 7-day
    // explode (a holiday weekend is never longer). Broadcast holiday
    // set; all flags exact; the oracle carries the same pinned holiday
    // literals the calendar spec pins against numpy.
    "cal_feature_frame" -> ((s, dir) => {
      val hol = graft.cal.NyseCalendar.defaultDateLiterals
        .map(java.sql.Date.valueOf)
      val holDf = broadcast(s.createDataFrame(
        s.sparkContext.parallelize(hol.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("hday",
            org.apache.spark.sql.types.DateType)))))
      val d = Tables.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("d")).distinct()
      val flagged = d
        .join(holDf, col("d") === col("hday"), "left")
        .select(col("d"), (weekday(col("d")) >= 5).as("is_weekend"),
                col("hday").isNotNull.as("is_holiday"))
        .withColumn("is_busday", !col("is_weekend") && !col("is_holiday"))
      flagged
        .select(col("d"), col("is_weekend"), col("is_holiday"),
          col("is_busday"), explode(sequence(lit(0), lit(7))).as("off"))
        .withColumn("cand", date_add(col("d"), col("off")))
        .join(holDf, col("cand") === col("hday"), "left")
        .filter(weekday(col("cand")) < 5 && col("hday").isNull)
        .groupBy("d")
        .agg(min(col("is_weekend")).as("is_weekend"),
             min(col("is_holiday")).as("is_holiday"),
             min(col("is_busday")).as("is_busday"),
             min(col("off")).cast("long").as("days_to_next_busday"))
        .orderBy("d")
    }),

    // Inline pipeline metrics via the Observation API: the aggregation
    // pass ships its own audit counters (row count, exact cent sum,
    // shipdate bounds) as observe() metrics — zero extra scan, the
    // metrics ride the same job — and the query's result IS the observed
    // metric row. The pattern that instruments a 100 TB job without a
    // second pass.
    "dq_observe_metrics" -> ((s, dir) => {
      val obs = new org.apache.spark.sql.Observation()
      val li = Tables.lineitem(s, dir)
        .observe(obs, count(lit(1)).as("n_rows"),
          sum(Exact.cents(col("l_extendedprice"))).as("sum_cents"),
          min(to_date(col("l_shipdate"))).as("min_ship"),
          max(to_date(col("l_shipdate"))).as("max_ship"))
      li.write.format("noop").mode("overwrite").save() // one real pass
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
           m("sum_cents").asInstanceOf[Long],
           m("min_ship").asInstanceOf[java.sql.Date].toString,
           m("max_ship").asInstanceOf[java.sql.Date].toString))
        .toDF("n_rows", "sum_cents", "min_ship_s", "max_ship_s")
        .select(col("n_rows"), col("sum_cents"),
                to_date(col("min_ship_s")).as("min_ship"),
                to_date(col("max_ship_s")).as("max_ship"))
    }),

    // First-order Markov transition matrix over user event sequences:
    // lag-1 pairs from ONE keyed window pass, transition counts + exact
    // row-normalized probabilities (one division per cell from integer
    // counts) — the Sankey/flow view of behavior that mine_event_trigrams
    // samples at depth 3. 5×5 output here; the same plan is the n²-cell
    // estimation at any state-space size.
    "mine_transition_matrix" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("e_from"))
        .withColumn("e_to", lead(col("e_from"), 1).over(w))
        .filter(col("e_to").isNotNull)
        .groupBy("e_from", "e_to").agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("e_from").agg(sum(col("n")).as("row_n"))
      pairs.join(broadcast(totals), Seq("e_from"))
        .select(col("e_from"), col("e_to"), col("n"),
          (col("n").cast("double") / col("row_n").cast("double"))
            .as("prob"))
        .orderBy("e_from", "e_to")
    }),

    // Sharpe and Sortino in one pass: per-series quantized daily returns
    // (floor(r·2²⁰), the shared exact lattice), then mean, variance, and
    // downside second moment as BIGINT/DECIMAL sums; each ratio is one
    // fixed IEEE chain (mean/σ and mean/downside-σ), NULL when the
    // deviation is zero. The two risk-adjusted return figures every
    // portfolio report pairs.
    "ts_sharpe_sortino" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("x"))
      val agg = rq.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("x") * col("x")).as("sxx"),
             sum(when(col("x") < 0, col("x") * col("x")).otherwise(0L))
               .as("sdd"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val nd = d(col("n"))
      agg.select(col("event_type"), col("n"),
          (d(col("sx")) / nd).as("mean_q"),
          sqrt((nd * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
            .divide(nd).as("std_q"),
          sqrt(d(col("sdd")) / nd).as("downside_q"))
        .select(col("event_type"), col("n"),
          when(col("std_q") > 0.0, col("mean_q") / col("std_q"))
            .as("sharpe"),
          when(col("downside_q") > 0.0, col("mean_q") / col("downside_q"))
            .as("sortino"))
        .orderBy("event_type")
    }),

    // HITS hubs & authorities on the DIRECTED part→supplier bipartite
    // graph: alternating matvecs a ← Aᵀh, h ← Aa, each rescaled to the
    // ±4096 integer lattice (scores are non-negative, so plain DIV is
    // floor) — the same quantized-iteration discipline as
    // emb_power_iteration, with every matvec one keyed join + one
    // partial-aggregable sum. Two full rounds; deterministic top-10 per
    // role. Where PageRank ranks by random-walk mass and Katz by
    // attenuated paths, HITS separates pointing-well (hubs = parts)
    // from pointed-at-well (authorities = suppliers).
    "graph_hits" -> ((s, dir) => {
      val e = graft.olap.GraphFrames.partSuppPairs(s, dir)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
      def norm(x: DataFrame, keyCol: String, vCol: String): DataFrame = {
        val mx = x.agg(max(col(vCol)).as("mx"))
        x.crossJoin(broadcast(mx))
          .select(col(keyCol), expr(s"($vCol * 4096) DIV mx").as(vCol))
      }
      // each normalized frame is persisted and the retired one released:
      // without this the alternating lineage recomputes every earlier
      // round on both output branches (the Components discipline)
      var h = e.select(col("p")).distinct().withColumn("hv", lit(1L))
        .tracked
      var a: DataFrame = null
      for (_ <- 1 to 2) {
        val a2 = norm(e.join(h, Seq("p"))
          .groupBy("sk").agg(sum(col("hv")).as("av")), "sk", "av")
          .tracked
        a2.count() // materialize before releasing the inputs
        if (a != null) a.unpersist(false)
        a = a2
        val h2 = norm(e.join(a, Seq("sk"))
          .groupBy("p").agg(sum(col("av")).as("hv")), "p", "hv")
          .tracked
        h2.count()
        h.unpersist(false)
        h = h2
      }
      h.select(lit("hub").as("role"), col("p").as("node"),
               col("hv").as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
        .unionAll(
          a.select(lit("authority").as("role"), col("sk").as("node"),
                   col("av").as("score"))
            .orderBy(col("score").desc, col("node")).limit(10))
        .orderBy(col("role"), col("score").desc, col("node"))
    }),

    // Calmar ratio: total return over the window divided by the maximum
    // drawdown — both sides exact integer basis points first (explicit
    // FLOOR division for the possibly-negative return; positive DIV for
    // the drawdown), one final double division, NULL when the series
    // never drew down. The risk-adjusted companion to ts_ulcer_index.
    "ts_calmar_ratio" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
      val dd = bars.withColumn("p", max(col("c")).over(w))
        .select(col("event_type"),
                expr("((p - c) * 10000) DIV p").as("dd_bp"))
        .groupBy("event_type").agg(max(col("dd_bp")).as("max_dd_bp"))
      bars.groupBy("event_type")
        .agg(min_by(col("c"), col("date")).as("first_cents"),
             max_by(col("c"), col("date")).as("last_cents"))
        .withColumn("ret_num", (col("last_cents") - col("first_cents"))
          * lit(10000L))
        .select(col("event_type"), col("first_cents"), col("last_cents"),
          expr("""(ret_num - (((ret_num % first_cents) + first_cents)
                   % first_cents)) DIV first_cents""")
            .as("total_return_bp"))
        .join(dd, Seq("event_type"))
        .withColumn("calmar",
          when(col("max_dd_bp") > 0,
            col("total_return_bp").cast("double")
              / col("max_dd_bp").cast("double")))
        .orderBy("event_type")
    }),

    // Holiday-adjacency effect: mean daily return (exact basis points,
    // floor division handling negative moves) per series, split by
    // whether the bar lands ON an NYSE holiday, the day BEFORE one, the
    // day AFTER one, or a regular day — the event-study view a calendar
    // expression exists to serve. The holiday set is the same
    // NyseCalendar rule table the busday family uses; classification is
    // a broadcast-friendly isin over date literals, no join.
    "ts_holiday_effect" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val hol = graft.cal.NyseCalendar.defaultDateLiterals
        .map(java.sql.Date.valueOf)
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("p", lag(col("c"), 1).over(w))
        .filter(col("p").isNotNull)
        .withColumn("rn", (col("c") - col("p")) * lit(10000L))
        .withColumn("ret_bp",
          expr("(rn - (((rn % p) + p) % p)) DIV p"))
      bars
        .withColumn("day_class",
          when(col("date").isin(hol: _*), "holiday")
            .when(date_add(col("date"), 1).isin(hol: _*), "pre_holiday")
            .when(date_sub(col("date"), 1).isin(hol: _*), "post_holiday")
            .otherwise("regular"))
        .groupBy("event_type", "day_class")
        .agg(count(lit(1)).as("n_days"),
             sum(col("ret_bp")).as("sum_ret_bp"))
        .select(col("event_type"), col("day_class"), col("n_days"),
          (col("sum_ret_bp").cast("double") / col("n_days").cast("double"))
            .as("mean_ret_bp"))
        .orderBy("event_type", "day_class")
    }),

    // Drawdown duration: the longest consecutive underwater spell (bars
    // strictly below the running peak) per series, with total underwater
    // bars and the deepest drawdown — the recovery-time view that calmar
    // and ulcer flatten away. Islands come from the rank-difference trick
    // (two keyed row_numbers, no iteration); every quantity is an exact
    // integer, so the cross-engine check is bitwise.
    "ts_drawdown_duration" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("event_type").orderBy("date")
      val bars = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("peak", max(col("c")).over(
          w.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("uw", col("c") < col("peak"))
        .withColumn("rn_all", row_number().over(w))
      val spells = bars.filter(col("uw"))
        .withColumn("rn_uw", row_number().over(w))
        .withColumn("grp", col("rn_all") - col("rn_uw"))
        .groupBy("event_type", "grp")
        .agg(count(lit(1)).as("len"),
             max(expr("((peak - c) * 10000) DIV peak")).as("dd_bp"))
      spells.groupBy("event_type")
        .agg(sum(col("len")).as("n_underwater_days"),
             max(col("len")).as("longest_spell_days"),
             max(col("dd_bp")).as("deepest_dd_bp"))
        .orderBy("event_type")
    }),

    // Time-travel diff: the CDC state as of snapshot 1 (first chunk of
    // the changelog) vs the final state, compared key-by-key into an
    // added / changed / deleted / unchanged census — the audit a
    // versioned table (Delta/Iceberg time travel) answers with two
    // snapshot reads. Both snapshots are rebuilt deterministically with
    // the same partial-aggregable max_by fold as inc_cdc_apply; the diff
    // is one full-outer join on the key.
    "inc_time_travel_diff" -> ((s, dir) => {
      def stateOf(f: DataFrame): DataFrame = f
        .groupBy("user_id")
        .agg(max_by(struct(col("event_type").as("et"),
                           col("event_id").as("eid"), col("vc")),
                    struct(col("ts"), col("event_id"))).as("last"))
        .filter(col("last.et") =!= "error")
        .select(col("user_id"), col("last.eid").as("eid"),
                col("last.vc").as("vc"))
      val ops = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"), Exact.cents(col("value")).as("vc"))
      val s1 = stateOf(ops.filter(col("event_id") % 3 === 0))
      val s2 = stateOf(ops)
      s1.select(col("user_id"), col("eid").as("eid1"), col("vc").as("vc1"))
        .join(s2.select(col("user_id"), col("eid").as("eid2"),
                        col("vc").as("vc2")), Seq("user_id"), "full_outer")
        .select(
          when(col("eid1").isNull, "added")
            .when(col("eid2").isNull, "deleted")
            .when(col("eid1") === col("eid2") && col("vc1") === col("vc2"),
              "unchanged")
            .otherwise("changed").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n_keys"))
        .orderBy("status")
    }),

    // Cross-table reconciliation: does each order's header total match
    // the sum of its line items? Exact integer cents on both sides, a
    // per-order delta histogram bucketed by delta sign/size — the
    // financial-close audit that catches partial loads and double
    // applies. One keyed aggregate + one broadcast-joined census.
    "dq_order_total_reconciliation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("li_cents"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), Exact.cents(col("o_totalprice"))
          .as("hdr_cents"))
        .join(li, Seq("o_orderkey"), "left")
        .select(
          when(col("li_cents").isNull, "1_no_lineitems")
            .when(col("hdr_cents") === col("li_cents"), "2_exact_match")
            .when(abs(col("hdr_cents") - col("li_cents")) <= 100L,
              "3_within_dollar")
            .otherwise("4_mismatch").as("status"),
          coalesce(abs(col("hdr_cents") - col("li_cents")), lit(0L))
            .as("abs_delta"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_orders"),
             sum(col("abs_delta")).as("sum_abs_delta_cents"),
             max(col("abs_delta")).as("max_abs_delta_cents"))
        .orderBy("status")
    }),

    // Ulcer index (downside-volatility): sqrt(mean(drawdown²)) per
    // series with the drawdown quantized to EXACT integer basis points
    // first — running-max peak on integer cents, dd_bp = (p−c)·10⁴ DIV p
    // (positive floor division, identical on both engines), so Σdd_bp²
    // is an order-free BIGINT and only the final sqrt-of-mean is a fixed
    // double chain. The drawdown-severity cousin of ts_realized_vol.
    "ts_ulcer_index" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("p", max(col("c")).over(w))
        .select(col("event_type"),
                expr("((p - c) * 10000) DIV p").as("dd_bp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             sum(col("dd_bp") * col("dd_bp")).as("sum_sq_bp"),
             max(col("dd_bp")).as("max_dd_bp"))
        .withColumn("ulcer_pct",
          sqrt(col("sum_sq_bp").cast("double")
            / col("n_days").cast("double")) / lit(100.0))
        .orderBy("event_type")
    }),

    // Heaps-law vocabulary growth: cumulative corpus tokens vs cumulative
    // DISTINCT vocabulary at 50-doc checkpoints. Each token's vocabulary
    // contribution is its FIRST document (one partial-aggregable min —
    // the first-occurrence trick, no running-distinct state), and both
    // cumulatives come from the two-level distributed prefix sum — no
    // window over anything data-sized. The diminishing-returns curve
    // behind corpus-size planning.
    "text_vocab_growth" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
                explode(graft.text.TextAnalysis.tokens("text")).as("token"))
      val tokCounts = toks
        .groupBy(expr("doc_id DIV 50").as("bucket"))
        .agg(count(lit(1)).as("n_tok"))
      val vocCounts = toks.groupBy("token")
        .agg(min(col("doc_id")).as("first_doc"))
        .groupBy(expr("first_doc DIV 50").as("bucket"))
        .agg(count(lit(1)).as("n_voc"))
      val joined = tokCounts.join(vocCounts, Seq("bucket"), "left")
        .select(col("bucket"), col("n_tok"),
                coalesce(col("n_voc"), lit(0L)).as("n_voc"))
      val c1 = graft.text.Packing.withStreamOffset(
        joined, "bucket", "n_tok", "ct0", bucketSize = 16L)
      graft.text.Packing.withStreamOffset(
          c1, "bucket", "n_voc", "cv0", bucketSize = 16L)
        .select(col("bucket"),
          (col("ct0") + col("n_tok")).as("cum_tokens"),
          (col("cv0") + col("n_voc")).as("cum_vocab"))
        .withColumn("ttr", col("cum_vocab").cast("double")
          / col("cum_tokens").cast("double"))
        .orderBy("bucket")
    }),

    // Truncated Katz centrality: 3 attenuated path-count rounds,
    // v' = 1 + (A·v) DIV 4, all exact integers (the DIV-4 attenuation is
    // the quantized α = 1/4; per-round floor keeps every value a
    // portable BIGINT). Same matvec-as-keyed-join shape as PageRank but
    // counting attenuated PATHS, not random-walk mass — no out-degree
    // normalization, no teleport. Edge frame persisted across rounds;
    // deterministic (katz desc, node) top-20 boundary.
    "graph_katz_centrality" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("src"),
                           (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                               (col("l_partkey") * 2).as("dst")))
        .tracked
      var v = e.select(col("src").as("node")).distinct()
        .withColumn("katz", lit(1L))
      for (_ <- 1 to 3) {
        v = e.join(v, col("dst") === col("node"))
          .groupBy(col("src").as("n2"))
          .agg(sum(col("katz")).as("m"))
          .select(col("n2").as("node"),
                  (lit(1L) + expr("m DIV 4")).as("katz"))
      }
      v.select(col("node"), col("katz"))
        .orderBy(col("katz").desc, col("node"))
        .limit(20)
    }),

    // Sentence segmentation stats: split on [.!?]+ runs, count non-empty
    // trimmed segments, exact character tallies — the doc-shape signal
    // (avg sentence length) quality filters threshold on. Identical
    // regex semantics mirrored in the oracle via regexp_split + filter.
    "text_sentence_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(transform(split(col("text"), "[.!?]+"),
                           x => trim(x)),
                 x => length(x) > 0).as("sents"))
        .select(col("doc_id"), size(col("sents")).cast("long")
            .as("n_sentences"),
          coalesce(aggregate(col("sents"), lit(0L),
            (a, x) => a + length(x)), lit(0L)).as("n_sent_chars"))
        .withColumn("avg_sent_len",
          when(col("n_sentences") > 0,
            col("n_sent_chars").cast("double")
              / col("n_sentences").cast("double")))
        .orderBy("doc_id")),

    // Mann–Whitney U (rank-sum) over every event-type pair: the
    // nonparametric companion to agg_two_sample_z. Doubled-U stays on the
    // integer lattice — 2U_a = Σ_v c_a(v)·(2·cum_b(<v) + c_b(v)) — so no
    // per-row ranks and no vocabulary-sized global window: per-type
    // cumulative counts run over the merged value support via the
    // two-level prefix sum keyed by (type, bucket); the support×type grid
    // is a broadcast of the bounded type universe against the distinct
    // value frame; the tie-corrected normal z carries the exact Σ(t³−t)
    // tie term in DECIMAL(38,0) and spends ONE fixed IEEE chain. The
    // value-keyed pair join fans each support row to C(k,2) pairs —
    // bounded by the type universe, never by event volume.
    "agg_mann_whitney_u" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val cnt = Tables.events(s, dir)
        .select(col("event_type").as("et"),
                Exact.cents(col("value")).as("v"))
        .groupBy("et", "v").agg(count(lit(1)).as("c"))
      val grid = cnt.select("v").distinct()
        .crossJoin(broadcast(cnt.select("et").distinct()))
        .join(cnt, Seq("et", "v"), "left")
        .select(col("et"), col("v"),
                coalesce(col("c"), lit(0L)).as("c"))
        .withColumn("b", expr("v div 1000"))
      val w1 = W.partitionBy("et", "b").orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val w2 = W.partitionBy("et").orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val off = grid.groupBy("et", "b").agg(sum("c").as("tot"))
        .withColumn("off", sum("tot").over(w2) - col("tot"))
        .select("et", "b", "off")
      val g = grid
        .withColumn("intra", sum("c").over(w1))
        .join(broadcast(off), Seq("et", "b"))
        .select(col("et"), col("v"), col("c"),
                (col("off") + col("intra") - col("c")).as("cum"))
        .tracked // both sides of the pair join read it
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val a = g.select(col("et").as("et_a"), col("v"), col("c").as("ca"))
      val bb = g.select(col("et").as("et_b"), col("v"),
        col("c").as("cb"), col("cum").as("cumb"))
      val t = dec(col("ca") + col("cb"))
      val nn = col("na") + col("nb")
      a.join(bb, Seq("v")).filter(col("et_a") < col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(sum("ca").as("na"), sum("cb").as("nb"),
             sum(dec(col("ca"))
                 * (dec(col("cumb")) * lit(2L) + dec(col("cb"))))
               .as("u2"),
             sum(t * t * t - t).as("tie3"))
        // doubled-U leaves the decimal lattice as a checked BIGINT here:
        // decimal output columns hash engine-dependently downstream
        .withColumn("u2", Exact.checkedLong(col("u2")))
        // all-tied pair ⇒ σ = 0 (tie3 hits its N³−N ceiling): null z, not
        // an engine-dependent inf/nan — the guard is an EXACT integer
        // comparison, portable by construction
        .withColumn("z",
          when(col("tie3") < dec(nn) * dec(nn) * dec(nn) - dec(nn),
            (col("u2") - dec(col("na")) * dec(col("nb"))).cast("double")
              / (lit(2.0) * sqrt(
                   (dec(col("na")) * dec(col("nb"))).cast("double")
                     / lit(12.0)
                   * ((nn + 1).cast("double")
                      - col("tie3").cast("double")
                        / (dec(nn) * dec(nn - 1)).cast("double"))))))
        .select("et_a", "et_b", "na", "nb", "u2", "z")
        .orderBy("et_a", "et_b")
    }),

    // Spearman rank correlation (part size vs retail price, per brand):
    // tie-aware average ranks kept exact by DOUBLING — 2·r̄ = 2·rank_min
    // + tie_count − 1 is always an integer — then Pearson over the 2r
    // lattice with exact DECIMAL(38,0) moments and one fixed IEEE chain.
    // Rank windows partition by brand (keyed, never global); moments are
    // partial-aggregable.
    "agg_spearman_corr" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val r = Tables.part(s, dir)
        .select(col("p_brand").as("brand"),
                col("p_size").cast("long").as("x"),
                Exact.cents(col("p_retailprice")).as("y"))
        .withColumn("rx2",
          rank().over(W.partitionBy("brand").orderBy("x")).cast("long")
            * 2 + count(lit(1)).over(W.partitionBy("brand", "x")) - 1)
        .withColumn("ry2",
          rank().over(W.partitionBy("brand").orderBy("y")).cast("long")
            * 2 + count(lit(1)).over(W.partitionBy("brand", "y")) - 1)
      r.groupBy("brand")
        .agg(count(lit(1)).as("n"),
             sum("rx2").as("sx"), sum("ry2").as("sy"),
             sum(dec(col("rx2")) * dec(col("ry2"))).as("sxy"),
             sum(dec(col("rx2")) * dec(col("rx2"))).as("sxx"),
             sum(dec(col("ry2")) * dec(col("ry2"))).as("syy"))
        // constant-x or constant-y group ⇒ zero denominator: null rho via
        // EXACT integer guards, never an engine-dependent 0/0
        .select(col("brand"), col("n"),
          when(dec(col("n")) * col("sxx")
                 - dec(col("sx")) * dec(col("sx")) > 0 &&
               dec(col("n")) * col("syy")
                 - dec(col("sy")) * dec(col("sy")) > 0,
            ((dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
               .cast("double")
             / (sqrt((dec(col("n")) * col("sxx")
                      - dec(col("sx")) * dec(col("sx"))).cast("double"))
                * sqrt((dec(col("n")) * col("syy")
                        - dec(col("sy")) * dec(col("sy"))).cast("double")))))
            .as("rho"))
        .orderBy("brand")
    }),

    // Simpson diversity of the token distribution per language: the
    // probability two random tokens coincide, D = Σ n_i(n_i−1) / (N(N−1))
    // — the repetition/diversity score a corpus-mix dashboard tracks next
    // to Heaps' law. Exact integer numerator in DECIMAL(38,0) (tf² sums
    // overflow BIGINT at corpus scale), one final division; two
    // partial-aggregable groupBys, no window at all.
    "text_simpson_diversity" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      Tables.documents(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokens("text")).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("tf"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_types"),
             sum("tf").as("n_tokens"),
             Exact.checkedLong(
               sum(dec(col("tf")) * (dec(col("tf")) - lit(1L))))
               .as("rep_pairs"))
        .withColumn("simpson",
          when(col("n_tokens") > 1L,
            col("rep_pairs").cast("double")
              / (dec(col("n_tokens")) * dec(col("n_tokens") - 1L))
                  .cast("double")))
        .orderBy("lang")
    }),

    // Ordered conversion funnel view → click → purchase: a user reaches
    // stage k only via an event at-or-after their stage-(k−1) entry time.
    // Three user-keyed min-aggregates chained by inner joins (each stage
    // frame shrinks), one broadcast of the 1-row top-of-funnel count for
    // the fractions — the product-analytics staple, exact end to end.
    "agg_funnel_stages" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .tracked // three stage scans
      // v is consumed 4× (click join, stage-1 count, top-of-funnel
      // count), c twice — cache the user-keyed aggregates, not just the
      // scan, or each reference repeats the groupBy shuffle
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1")).tracked
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2")).tracked
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val stages = v.agg(count(lit(1)).as("n_users"))
        .select(lit(1L).as("stage"), lit("view").as("stage_name"),
                col("n_users"))
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit(2L).as("stage"), lit("click").as("stage_name"),
                  col("n_users")))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit(3L).as("stage"), lit("purchase").as("stage_name"),
                  col("n_users")))
      stages
        .crossJoin(broadcast(v.agg(count(lit(1)).as("n_top"))))
        .withColumn("frac_of_top",
          col("n_users").cast("double") / col("n_top").cast("double"))
        .select("stage", "stage_name", "n_users", "frac_of_top")
        .orderBy("stage")
    }),

    // Association rules over the co-purchase pairs: confidence both
    // directions, lift and leverage — the rule-quality metrics on top of
    // mine_frequent_pairs' support counts. All cross terms (n_pair·N,
    // n_a·n_b, N²) go through DECIMAL(38,0) (basket-count products
    // overflow BIGINT at warehouse scale) with ONE IEEE division per
    // metric; support floor ≥3 keeps the rule set honest, top-25 by
    // (lift, part_a, part_b) is a deterministic total order.
    "mine_association_rules" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      // pinned shared (order, part) items — basket count + item counts +
      // pair self-join all read the one cached frame
      val items = graft.olap.GraphFrames.orderPartItems(s, dir)
      val nBaskets = items.select("ok").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val itemCnt = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pairs = items.as("a")
        .join(items.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 3)
      pairs
        .join(itemCnt.select(col("pk").as("part_a"),
          col("n_item").as("n_a")), Seq("part_a"))
        .join(itemCnt.select(col("pk").as("part_b"),
          col("n_item").as("n_b")), Seq("part_b"))
        .crossJoin(broadcast(nBaskets))
        .select(col("part_a"), col("part_b"), col("n_pair"), col("n_a"),
          col("n_b"), col("n_baskets"),
          (col("n_pair").cast("double") / col("n_a").cast("double"))
            .as("conf_a_b"),
          (col("n_pair").cast("double") / col("n_b").cast("double"))
            .as("conf_b_a"),
          ((dec(col("n_pair")) * dec(col("n_baskets"))).cast("double")
            / (dec(col("n_a")) * dec(col("n_b"))).cast("double"))
            .as("lift"),
          ((dec(col("n_pair")) * dec(col("n_baskets"))
            - dec(col("n_a")) * dec(col("n_b"))).cast("double")
            / (dec(col("n_baskets")) * dec(col("n_baskets")))
                .cast("double"))
            .as("leverage"))
        .orderBy(col("lift").desc, col("part_a"), col("part_b"))
        .limit(25)
    }),

    // Cramér's V — the χ² total agg_chi2_contingency deliberately refuses
    // to sum (accumulation order of doubles is not portable), made
    // portable the same way as Kruskal–Wallis: per-cell exact rational
    // contributions (over the FULL type×weekday grid, so empty cells
    // contribute (0−E)²/E like the statistic requires — the observed-only
    // report can't see them), one IEEE division each, folded in a FIXED
    // (type, dow) order via sort_array→aggregate ≡ list_sort→list_reduce.
    // V = sqrt(χ²/(N·min(R−1,C−1))) on 1-row scalars.
    "agg_cramers_v" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"),
          (weekday(col("ts").cast("date")) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
        .tracked // grid + marginals read it
      val grid = cells.select("event_type").distinct()
        .crossJoin(broadcast(cells.select("dow").distinct()))
        .join(cells, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("dow"),
                coalesce(col("o"), lit(0L)).as("o"))
      val rowTot = cells.groupBy("event_type").agg(sum("o").as("r"))
      val colTot = cells.groupBy("dow").agg(sum("o").as("c"))
      val n = cells.agg(sum("o").as("n"),
        countDistinct("event_type").as("nr"), countDistinct("dow").as("nc"))
      grid.join(rowTot, "event_type").join(colTot, "dow")
        .crossJoin(broadcast(n))
        .withColumn("dev", col("o") * col("n") - col("r") * col("c"))
        .withColumn("cell", (dec(col("dev")) * dec(col("dev")))
          .cast("double") / (col("n") * col("r") * col("c")).cast("double"))
        .groupBy("n", "nr", "nc")
        .agg(aggregate(sort_array(collect_list(
            struct(col("event_type"), col("dow"), col("cell")))),
          lit(0.0), (a, x) => a + x.getField("cell")).as("chi2"))
        .select(col("n").as("n_total"), col("nr").as("n_rows"),
          col("nc").as("n_cols"), col("chi2"),
          sqrt(col("chi2") / (col("n").cast("double")
            * least(col("nr") - 1, col("nc") - 1).cast("double")))
            .as("cramers_v"))
    }),

    // Cohort LTV curve: cumulative purchase revenue per signup cohort by
    // day-offset, normalized per cohort member — the companion to
    // agg_retention_cohorts that tracks VALUE instead of presence.
    // Revenue reduces to (cohort, offset) cells FIRST (partial-agg), the
    // running total is a keyed window over those cells (cohort-sized
    // partitions of offset-counted rows, never event volume), and cents
    // stay integers until the one ltv division.
    "agg_cohort_ltv_curve" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"),
                col("event_type"), Exact.cents(col("value")).as("cents"))
        .tracked // cohort assignment + revenue cells read it
      val firsts = ev.groupBy("user_id").agg(min(col("d")).as("cohort_date"))
      val sizes = firsts.groupBy("cohort_date")
        .agg(count(lit(1)).as("n_cohort_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(firsts, "user_id")
        .groupBy(col("cohort_date"),
          datediff(col("d"), col("cohort_date")).cast("long")
            .as("day_offset"))
        .agg(sum("cents").as("rev_cents"))
      rev.join(sizes, "cohort_date")
        .withColumn("cum_rev_cents", sum("rev_cents").over(
          W.partitionBy("cohort_date").orderBy("day_offset")
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("ltv_per_user", col("cum_rev_cents").cast("double")
          / (lit(100.0) * col("n_cohort_users").cast("double")))
        .select("cohort_date", "day_offset", "rev_cents", "cum_rev_cents",
                "n_cohort_users", "ltv_per_user")
        .orderBy("cohort_date", "day_offset")
    }),

    // BM25 retrieval scoring for the query {scan, join, window} — tf
    // saturation (k1=1.2) + length normalization (b=0.75), with the
    // RATIONAL idf substitute (N−df+1)/(df+1) the tfidf operator
    // established (ln() is not bit-portable across libm builds). Doc
    // length enters as the exact integer len·N over total tokens T, so
    // the whole per-term score is one fixed IEEE chain; the ≤3 per-doc
    // term scores combine in a FIXED fold order (sort_array→aggregate).
    // Top-10 docs via TakeOrderedAndProject, never a full sort.
    "text_bm25_topk" -> ((s, dir) => {
      val terms = Seq("scan", "join", "window")
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.tokens("text"))
          .as("token"))
        .tracked // doc lengths, df, tf all read it
      val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val dfreq = toks.filter(col("token").isin(terms: _*))
        .select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val tf = toks.filter(col("token").isin(terms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val tot = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
        .crossJoin(toks.agg(count(lit(1)).as("t_tokens")))
      val scored = tf.join(lens, "doc_id").join(broadcast(dfreq), "token")
        .crossJoin(broadcast(tot))
        .withColumn("s",
          ((col("n_docs") - col("df") + 1).cast("double")
             / (col("df") + 1).cast("double"))
          * (col("tf").cast("double") * lit(2.2)
             / (col("tf").cast("double")
                + lit(1.2) * (lit(0.25) + lit(0.75)
                  * ((col("len") * col("n_docs")).cast("double")
                     / col("t_tokens").cast("double"))))))
      scored.groupBy("doc_id")
        .agg(max("len").as("len"),
          aggregate(sort_array(collect_list(struct(col("token"), col("s")))),
            lit(0.0), (a, x) => a + x.getField("s")).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    }),

    // Kruskal–Wallis H (the k-group Mann–Whitney): one GLOBAL combined
    // ranking instead of per-pair ranks — doubled tie-average rank at
    // value v is 2r̄ = 2·cum_all(<v) + c_all(v) + 1 (always integer), so
    // each group's doubled rank-sum 2R_i is an exact Σ over its value
    // counts, with the global cumulative from the two-level prefix sum.
    // Per-group terms (2R_i)²/(4n_i) are kept EXACT as q16 fixed-point
    // integers ⌊16·(2R_i)²/(4n_i)⌋, so the cross-group sum is order-free
    // partial aggregation (no double fold of any kind — the previous
    // fixed-order sort_array→aggregate fold proved DuckDB-build-sensitive
    // through list_reduce and HUGEINT→DOUBLE); tie correction
    // 1 − Σ(t³−t)/(N³−N) stays exact until its final division, every
    // →DOUBLE cast routed through BIGINT (the one conversion that is
    // correctly rounded on every build). H rides on every group row via a
    // 1-row broadcast.
    "agg_kruskal_wallis" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val cnt = Tables.events(s, dir)
        .select(col("event_type").as("et"),
                Exact.cents(col("value")).as("v"))
        .groupBy("et", "v").agg(count(lit(1)).as("c"))
        .tracked // read twice: per-value totals and per-group rank sums
      val tot = graft.text.Packing.withStreamOffset(
        cnt.groupBy("v").agg(sum("c").as("ct")),
        "v", "ct", "cum", 1000L)
      val g = cnt.join(tot, "v")
        .groupBy("et")
        .agg(sum("c").as("n"),
             sum(dec(col("c")) * (dec(col("cum")) * lit(2L)
                 + dec(col("ct")) + lit(1L))).as("r2"))
        // q16 fixed-point per-group term ⌊16·R²/(4n)⌋ — an EXACT BIGINT,
        // so the cross-group sum is order-free partial aggregation. The
        // old formulation folded DOUBLE terms in a fixed sort order and
        // leaned on HUGEINT→DOUBLE casts, both of which proved DuckDB-
        // build-sensitive; this needs neither (BIGINT→DOUBLE is the one
        // correctly-rounded-everywhere conversion).
        .withColumn("term_q16", expr("(r2 * r2 * 16) DIV (4 * n)"))
        .tracked // feeds both the H scalar and the report rows
      val ties = tot.agg(
        sum(dec(col("ct")) * dec(col("ct")) * dec(col("ct"))
            - dec(col("ct"))).as("t3"))
      val h = g.agg(sum("n").as("nt"),
          sum(dec(col("term_q16"))).as("sq"))
        .crossJoin(ties)
        .select(col("nt"),
          (lit(12.0)
             / Exact.checkedLong(dec(col("nt")) * dec(col("nt") + 1))
                 .cast("double")
             * (Exact.checkedLong(col("sq")).cast("double") / lit(16.0))
           - lit(3.0) * (col("nt") + 1).cast("double")).as("h"),
          (lit(1.0) - Exact.checkedLong(col("t3")).cast("double")
             / Exact.checkedLong(dec(col("nt")) * dec(col("nt"))
                 * dec(col("nt")) - dec(col("nt"))).cast("double"))
            .as("corr"))
      g.crossJoin(broadcast(h))
        // 2R_i leaves the decimal lattice as a checked BIGINT at output
        .select(col("et").as("event_type"), col("n"),
                Exact.checkedLong(col("r2")).as("r2"),
                col("nt").as("n_total"), col("h"),
                // corr = 0 ⇔ every value tied (one group of size N):
                // null, not an engine-dependent division by zero
                when(col("corr") =!= 0.0, col("h") / col("corr"))
                  .as("h_tie_corrected"))
        .orderBy("event_type")
    }),

    // Rich-club coefficient φ(k) = E_{>k} / (N_{>k}(N_{>k}−1)) on the
    // directed edge set (so E counts each undirected edge twice — the 2E
    // in the usual formula): do high-degree nodes preferentially link to
    // each other? NO per-threshold scan: per-edge min(deg_u, deg_v) and
    // per-node degree reduce once into conditional sums for the whole
    // threshold ladder (one aggregate row), unpivoted via stack — the
    // same two keyed degree joins graph_assortativity makes, zero extra
    // shuffles, thresholds bounded by the ladder not the data.
    "graph_rich_club" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("u"),
                           (col("l_suppkey") * 2 + 1).as("v"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("u"),
                               (col("l_partkey") * 2).as("v")))
      val deg = graft.olap.GraphFrames.partSuppDegrees(s, dir)
      val em = e
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(least(col("du"), col("dv")).as("m"))
      val ks = Seq(2L, 4L, 8L, 16L)
      val ec = em.agg(
        sum(when(col("m") > ks(0), 1L).otherwise(0L)).as("e0"),
        sum(when(col("m") > ks(1), 1L).otherwise(0L)).as("e1"),
        sum(when(col("m") > ks(2), 1L).otherwise(0L)).as("e2"),
        sum(when(col("m") > ks(3), 1L).otherwise(0L)).as("e3"))
      val nc = deg.agg(
        sum(when(col("d") > ks(0), 1L).otherwise(0L)).as("n0"),
        sum(when(col("d") > ks(1), 1L).otherwise(0L)).as("n1"),
        sum(when(col("d") > ks(2), 1L).otherwise(0L)).as("n2"),
        sum(when(col("d") > ks(3), 1L).otherwise(0L)).as("n3"))
      ec.crossJoin(nc)
        .select(expr(
          """stack(4, CAST(2 AS BIGINT), n0, e0, CAST(4 AS BIGINT), n1, e1,
             CAST(8 AS BIGINT), n2, e2, CAST(16 AS BIGINT), n3, e3)""")
          .as(Seq("k", "n_rich", "e_rich")))
        .withColumn("phi",
          when(col("n_rich") > 1L,
            col("e_rich").cast("double")
              / (col("n_rich").cast("decimal(38,0)")
                 * (col("n_rich") - 1L).cast("decimal(38,0)"))
                  .cast("double")))
        .orderBy("k")
    }),

    // Token burstiness: variance-to-mean ratio of a token's per-document
    // count across its language's corpus (zeros included analytically —
    // absent docs add nothing to Σx or Σx², so the exact moments
    // D·Σx²−(Σx)² need only the docs that CONTAIN the token). Bursty
    // content words (VMR ≫ 1) vs evenly-spread function words is the
    // classic keyword signal. Top-20 per language by (tf desc, token)
    // through a keyed window over the aggregate, never the raw tokens.
    "text_burstiness" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val W = org.apache.spark.sql.expressions.Window
      val perDoc = Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
                explode(TextAnalysis.tokens("text")).as("token"))
        .groupBy("lang", "doc_id", "token").agg(count(lit(1)).as("c"))
      val nDocs = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("nd"))
      val tok = perDoc.groupBy("lang", "token")
        .agg(sum("c").as("tf"), count(lit(1)).as("n_docs_with"),
             sum(dec(col("c")) * dec(col("c"))).as("sxx"))
        .withColumn("rnk", row_number().over(
          W.partitionBy("lang").orderBy(col("tf").desc, col("token"))))
        .filter(col("rnk") <= 20)
      tok.join(broadcast(nDocs), "lang")
        // a 1-doc language has no across-doc variance: null, not 0/0
        .select(col("lang"), col("token"), col("tf"), col("n_docs_with"),
          when(col("nd") > 1L,
            ((dec(col("nd")) * col("sxx") - dec(col("tf")) * dec(col("tf")))
               .cast("double")
             / ((dec(col("nd")) - lit(1L)) * dec(col("tf"))).cast("double")))
            .as("vmr"))
        .orderBy(col("lang"), col("tf").desc, col("token"))
    }),

    // Gini coefficient of the degree distribution — "how concentrated is
    // this graph's connectivity?" in one number, the scalar companion to
    // graph_degree_distribution. Works entirely on the degree HISTOGRAM
    // (support = distinct degree values, tiny), never ranking nodes: a
    // block of m nodes at degree d after c smaller-degree nodes occupies
    // ranks (c, c+m], so 2·Σ rank·x over the block = d·(2·m·c + m·(m+1)).
    // Histogram prefix runs through the two-level prefix sum; all moments
    // exact DECIMAL(38,0); one fixed IEEE chain.
    "graph_degree_gini" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val hist = graft.olap.GraphFrames.partSuppDegrees(s, dir)
        .groupBy("d").agg(count(lit(1)).as("m"))
      graft.text.Packing.withStreamOffset(hist, "d", "m", "cumm", 64L)
        .agg(sum("m").as("n_nodes"),
             sum(dec(col("d")) * dec(col("m"))).as("sum_deg"),
             sum(dec(col("d")) * (dec(col("m")) * dec(col("cumm")) * lit(2L)
                 + dec(col("m")) * (dec(col("m")) + lit(1L)))).as("tw"))
        .select(col("n_nodes"),
          col("sum_deg").cast("long").as("sum_degree"),
          ((col("tw") - (dec(col("n_nodes")) + lit(1L)) * col("sum_deg"))
             .cast("double")
           / (dec(col("n_nodes")) * col("sum_deg")).cast("double"))
            .as("gini"))
    }),

    // Shannon entropy of the event-type mix per ISO weekday — the label-
    // balance diagnostic every training pipeline runs over its class/source
    // distribution. Real logarithms are NOT bitwise portable across
    // engines (libm last-ulp drift, measured at ~0.006%/200k samples), so
    // the per-type term uses graft.functions.FixedLog2: a deterministic
    // 20-fractional-bit integer log2 whose per-row value is one exact
    // BIGINT on any engine — sums stay order-free and partial-aggregable
    // (no sorted-list folds). H_bits = (N·log2fp(N) − Σ c·log2fp(c)) /
    // (N·2^20) via the identity H = log2 N − (1/N)Σ c log2 c.
    "agg_entropy_by_group" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val c = Tables.events(s, dir)
        .groupBy((weekday(to_date(col("ts"))) + 1).cast("long").as("dow"),
                 col("event_type"))
        .agg(count(lit(1)).as("c"))
      c.groupBy("dow")
        .agg(sum(col("c")).as("n_events"),
             count(lit(1)).as("n_types"),
             sum(dec(col("c")) * dec(L(col("c")))).as("sclog"))
        .select(col("dow"), col("n_events"), col("n_types"),
          ((dec(col("n_events")) * dec(L(col("n_events"))) - col("sclog"))
             .cast("double")
           / col("n_events").cast("double") / lit(1048576.0))
            .as("entropy_bits"))
        .orderBy("dow")
    }),

    // Theil T inequality index of order revenue per market segment:
    // T = (1/n)Σ (x/μ)ln(x/μ). On the cents lattice x_i/μ = c_i·n/S
    // exactly, so the per-row term is c_i·(log2fp(c_i·n) − log2fp(S)) —
    // exact integers, decimal-summed order-free — and one final double
    // conversion applies ln2/(S·2^20). The broadcast join-back of the
    // 5-row segment aggregate is the standard two-pass moment shape.
    "agg_theil_index" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), Exact.cents(col("o_totalprice")).as("cents"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      val j = o.join(broadcast(cust), "o_custkey")
        .select("c_mktsegment", "cents").tracked
      val g = j.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s_cents"))
      j.join(broadcast(g), "c_mktsegment")
        .withColumn("term",
          dec(col("cents")) * dec(L(col("cents") * col("n")) -
                                  L(col("s_cents"))))
        .groupBy("c_mktsegment")
        .agg(first(col("n")).as("n_orders"),
             first(col("s_cents")).as("sc"),
             sum(col("term")).as("tnum"))
        .select(col("c_mktsegment"), col("n_orders"),
          (col("sc").cast("double") / lit(100.0)).as("total_revenue"),
          (col("tnum").cast("double") * lit(0.6931471805599453)
            / (col("sc").cast("double") * lit(1048576.0)))
            .as("theil"))
        .orderBy("c_mktsegment")
    }),

    // Collocation mining: PMI of adjacent token bigrams corpus-wide —
    // log2(c_ab·N / (c_a·c_b)) on the FixedLog2 lattice, so the score is
    // exact and the top-k order is total. Bigrams come from per-row array
    // arithmetic (never a self-join); the two unigram joins are keyed.
    "text_collocation_pmi" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val toks = Tables.documents(s, dir)
        .select(TextAnalysis.tokens("text").as("t")).tracked
      val pairs = toks.select(explode(expr(
          "transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
          "(w, i) -> named_struct('w1', w, 'w2', element_at(t, i + 2)))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")).tracked
      val tot = uni.agg(sum(col("c")).as("n_tok"))
      bc.join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
        .crossJoin(broadcast(tot))
        .withColumn("pmi_q20",
          L(col("c_ab") * col("n_tok")) - L(col("c_a") * col("c_b")))
        .select(col("w1"), col("w2"), col("c_ab"),
          (col("pmi_q20").cast("double") / lit(1048576.0)).as("pmi_bits"))
        .orderBy(col("pmi_bits").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // Mixture reweighting: per-language importance weights that rebalance
    // the corpus to the uniform target mixture — w = N/(L·n_lang) on the
    // parts-per-million integer lattice (exact floor division, no double
    // shares). The training-pipeline step between "measure the mixture"
    // and "sample to the target mixture".
    "sample_importance_reweight" -> ((s, dir) => {
      val byLang = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val tot = byLang.agg(sum(col("n_docs")).as("n_total"),
                           count(lit(1)).as("n_langs"))
      byLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          expr("n_total * 1000000 DIV (n_langs * n_docs)").as("w_ppm"),
          expr("1000000 DIV n_langs").as("target_share_ppm"),
          expr("n_docs * 1000000 DIV n_total").as("actual_share_ppm"))
        .orderBy("lang")
    }),

    // Holt's linear (level+trend) exponential smoothing per series — the
    // two-state generalization of ts_ema's recursive fold. α=0.25 and
    // β=0.125 are binary-exact; the fold carries a (level, trend) struct
    // and the oracle's list_reduce replays the identical IEEE sequence
    // step-for-step (seed l₁=x₁, b₁=0). Same scale contract as ts_ema:
    // the running-list window is bounded by days-per-series, and a
    // longer-horizon run would switch to the one-pass mapPartitions form
    // (graft.ts.Ema.onePass) without changing semantics.
    "ts_holt_linear" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"), col("close"))
        .withColumn("cl", collect_list(col("close")).over(w))
        .withColumn("st", expr(
          """aggregate(slice(cl, 2, size(cl) - 1),
               named_struct('l', CAST(element_at(cl, 1) AS DOUBLE),
                            'b', CAST(0.0 AS DOUBLE)),
               (a, x) -> named_struct(
                 'l', 0.25D * x + 0.75D * (a.l + a.b),
                 'b', 0.125D * ((0.25D * x + 0.75D * (a.l + a.b)) - a.l)
                      + 0.875D * a.b))"""))
        .select(col("event_type"), col("date"), col("close"),
          col("st.l").as("level"), col("st.b").as("trend"))
        .orderBy("event_type", "date")
    }),

    // Truncated harmonic centrality (radius 2) from the 4 smallest part-
    // nodes of the bipartite part–supplier graph: h = n₁ + n₂/2, kept
    // exact on the ×2 integer lattice. Multi-source BFS as (source, node)
    // pair state — two rounds of keyed join + distinct + anti-join, the
    // same frontier shape as graph_bfs_reach but batched over sources so
    // the engine amortizes one edge scan per round across all of them.
    "graph_harmonic_sample" -> ((s, dir) => {
      val pairs = graft.olap.GraphFrames.partSuppPairs(s, dir)
      val e = pairs.select((col("l_partkey") * 2).as("src"),
                           (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
                               (col("l_partkey") * 2).as("dst")))
        .tracked
      // layer-0 per source is just {s} (node == source), so the layer-1/2
      // "not already visited at distance 0" exclusion is node =!= s; the
      // layer-2-vs-layer-1 exclusion is a keyed anti-join on (s, node)
      val d0 = e.filter(col("src") % 2 === 0).select(col("src").as("s"))
        .distinct().orderBy("s").limit(4).tracked
      val d1 = e.join(broadcast(d0), e("src") === d0("s"))
        .select(d0("s"), e("dst").as("node")).distinct()
        .filter(col("node") =!= col("s"))
        .tracked
      val d2 = e.join(d1, e("src") === d1("node"))
        .select(d1("s"), e("dst").as("node")).distinct()
        .filter(col("node") =!= col("s"))
        .join(d1.select(col("s").as("s1"), col("node").as("n1")),
              col("s") === col("s1") && col("node") === col("n1"), "left_anti")
      val c1 = d1.groupBy("s").agg(count(lit(1)).as("n1"))
      val c2 = d2.groupBy("s").agg(count(lit(1)).as("n2"))
      d0.select(col("s").as("source"))
        .join(c1.withColumnRenamed("s", "source"), Seq("source"), "left")
        .join(c2.withColumnRenamed("s", "source"), Seq("source"), "left")
        .select(col("source"),
          coalesce(col("n1"), lit(0L)).as("n1"),
          coalesce(col("n2"), lit(0L)).as("n2"))
        .withColumn("h2", col("n1") * 2 + col("n2"))
        .withColumn("harmonic", col("h2").cast("double") / lit(2.0))
        .orderBy("source")
    }),

    // Simplified silhouette over the embedding corpus: a = distance to the
    // own-label centroid, b = nearest other centroid, s = (b−a)/max(a,b) —
    // the clustering-QA score at O(N·k) instead of O(N²). Centroids live
    // on the q=⌊x·2¹⁶⌋ lattice (exact integer sums → one deterministic
    // mean); per-vector distances fold dims in index order (bitwise-
    // portable); per-label means go through the ⌊s·2²⁰⌋ lattice so the
    // final aggregation is order-free. k centroids ride a broadcast
    // constant-key hash join — never a shuffle of the corpus.
    "emb_silhouette_simplified" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centArr = graft.similarity.CentroidLattice.centroidArrays(emb)
        .select(col("label").as("clabel"), col("c"))
      val v = emb.select(col("vec_id"), col("label").cast("long").as("label"),
        expr(graft.similarity.CentroidLattice.qArraySql).as("qa"))
      val p = v.crossJoin(broadcast(centArr))
        .withColumn("dist2",
          expr(graft.similarity.CentroidLattice.dist2Sql("qa", "c")))
      val ab = p.groupBy("vec_id", "label")
        .agg(sqrt(min(when(col("clabel") === col("label"), col("dist2"))))
               .as("a"),
             sqrt(min(when(col("clabel") =!= col("label"), col("dist2"))))
               .as("b"))
      ab.select(col("label"),
          when(greatest(col("a"), col("b")) > 0,
            floor((col("b") - col("a")) / greatest(col("a"), col("b"))
                  * lit(1048576)).cast("long")).otherwise(lit(0L)).as("sq20"),
          floor(col("a") * lit(1048576)).cast("long").as("aq20"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
             (sum(col("sq20")).cast("double") / count(lit(1)).cast("double")
               / lit(1048576.0)).as("avg_silhouette"),
             (sum(col("aq20")).cast("double") / count(lit(1)).cast("double")
               / lit(1048576.0)).as("avg_intra_dist"))
        .orderBy("label")
    }),

    // Mutual information between event type and ISO weekday (one row):
    // MI = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))) = (Σ c_xy·(log2fp(c_xy·N) −
    // log2fp(c_x·c_y))) / (N·2²⁰) on the FixedLog2 lattice — exact
    // integers end to end, alongside both marginal entropies (the
    // normalizers for NMI). The feature-vs-label dependence screen a
    // training pipeline runs before trusting a stratification column.
    "agg_mutual_information" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val cells = Tables.events(s, dir)
        .groupBy(col("event_type"),
                 (weekday(to_date(col("ts"))) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("c_xy")).tracked
      val mx = cells.groupBy("event_type").agg(sum(col("c_xy")).as("c_x"))
        .tracked
      val my = cells.groupBy("dow").agg(sum(col("c_xy")).as("c_y")).tracked
      val n = cells.agg(sum(col("c_xy")).as("n"))
      val mi = cells.join(broadcast(mx), "event_type")
        .join(broadcast(my), "dow")
        .crossJoin(broadcast(n.select(col("n").as("nn"))))
        .withColumn("mterm",
          dec(col("c_xy")) * dec(L(col("c_xy") * col("nn")) -
                                 L(col("c_x") * col("c_y"))))
        .agg(sum(col("mterm")).as("minum"))
      val hx = mx.agg(sum(dec(col("c_x")) * dec(L(col("c_x")))).as("sxlog"))
      val hy = my.agg(sum(dec(col("c_y")) * dec(L(col("c_y")))).as("sylog"))
      n.crossJoin(broadcast(mi)).crossJoin(broadcast(hx))
        .crossJoin(broadcast(hy))
        .select(col("n"),
          (col("minum").cast("double") / col("n").cast("double")
            / lit(1048576.0)).as("mi_bits"),
          ((dec(col("n")) * dec(L(col("n"))) - col("sxlog")).cast("double")
            / col("n").cast("double") / lit(1048576.0)).as("h_type_bits"),
          ((dec(col("n")) * dec(L(col("n"))) - col("sylog")).cast("double")
            / col("n").cast("double") / lit(1048576.0)).as("h_dow_bits"))
    }),

    // Distribution-shift audit: KL(source ‖ corpus) over token unigrams,
    // per source — the "which slice drifted from the mixture" check run
    // around every ingestion. Same lattice identity: the per-token term
    // is c_sw·(log2fp(c_sw·T) − log2fp(T_s·c_w)), summed exactly.
    "text_kl_source_shift" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val st = Tables.documents(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens("text")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw")).tracked
      val cw = st.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
      val tsrc = st.groupBy("source").agg(sum(col("c_sw")).as("t_s")).tracked
      val tot = tsrc.agg(sum(col("t_s")).as("t"))
      st.join(cw, "w").join(broadcast(tsrc), "source")
        .crossJoin(broadcast(tot))
        .withColumn("term",
          dec(col("c_sw")) * dec(L(col("c_sw") * col("t")) -
                                 L(col("t_s") * col("c_w"))))
        .groupBy("source")
        .agg(first(col("t_s")).as("n_tokens"), sum(col("term")).as("num"))
        .select(col("source"), col("n_tokens"),
          (col("num").cast("double") / col("n_tokens").cast("double")
            / lit(1048576.0)).as("kl_bits"))
        .orderBy("source")
    }),

    // Conditional entropy of the next event type given the current one,
    // per from-state — the sequence-predictability complement of
    // mine_transition_matrix (same per-user lead transitions): H(next|i)
    // = Σ_j (c_ij/c_i)·log2(c_i/c_ij), exact on the lattice.
    "mine_transition_entropy" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("e_from"))
        .withColumn("e_to", lead(col("e_from"), 1).over(w))
        .filter(col("e_to").isNotNull)
        .groupBy("e_from", "e_to").agg(count(lit(1)).as("n")).tracked
      val totals = pairs.groupBy("e_from").agg(sum(col("n")).as("row_n"))
      pairs.join(broadcast(totals), "e_from")
        .withColumn("term",
          dec(col("n")) * dec(L(col("row_n")) - L(col("n"))))
        .groupBy("e_from")
        .agg(first(col("row_n")).as("n_out"), sum(col("term")).as("num"))
        .select(col("e_from"), col("n_out"),
          (col("num").cast("double") / col("n_out").cast("double")
            / lit(1048576.0)).as("h_next_bits"))
        .orderBy("e_from")
    }),

    // Permutation entropy (order-3) per series: each consecutive close
    // triple maps to its comparison pattern (three pairwise > tests on
    // the exact cents lattice → 3-bit id), and the pattern histogram's
    // entropy — the model-free complexity/randomness score — comes out
    // exact via FixedLog2. Keyed lead window, partial-aggregable counts.
    "ts_perm_entropy" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("x1", lead(col("c"), 1).over(w))
        .withColumn("x2", lead(col("c"), 2).over(w))
        .filter(col("x2").isNotNull)
        .select(col("event_type"),
          ((col("x1") > col("c")).cast("long") * 4 +
           (col("x2") > col("x1")).cast("long") * 2 +
           (col("x2") > col("c")).cast("long")).as("pid"))
        .groupBy("event_type", "pid").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(sum(col("c")).as("n_windows"),
             count(lit(1)).as("n_patterns"),
             sum(dec(col("c")) * dec(L(col("c")))).as("sclog"))
        .select(col("event_type"), col("n_windows"), col("n_patterns"),
          ((dec(col("n_windows")) * dec(L(col("n_windows"))) - col("sclog"))
             .cast("double")
           / col("n_windows").cast("double") / lit(1048576.0))
            .as("perm_entropy_bits"))
        .orderBy("event_type")
    }),

    // Jensen–Shannon divergence between every language pair's token
    // distribution — the symmetric, bounded [0,1]-bits corpus-drift
    // metric. The mixture entropy term needs the UNION vocabulary of
    // each pair; rather than a full-outer join per pair, one directed
    // left-join frame D(la,lb) = Σ_{w∈vocab(la)} a_w·(log2fp(2T_aT_b) −
    // log2fp(a_w)) with a_w = c_aw·T_b + c_bw·T_a covers it via
    // inclusion–exclusion: S(pair) = D(a,b) + D(b,a) − I(pair), where I
    // sums the both-present terms once (a_w is symmetric). Everything is
    // exact lattice integers until three final double divisions.
    "text_js_divergence" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val lt = Tables.documents(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokens("text")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c")).tracked
      val tl = lt.groupBy("lang").agg(sum(col("c")).as("t")).tracked
      val dirFrame = lt
        .select(col("lang").as("la"), col("w"), col("c").as("c_a"))
        .join(broadcast(tl.select(col("lang").as("lb"), col("t").as("t_b"))),
              col("la") =!= col("lb"))
        .join(lt.select(col("lang").as("lb2"), col("w").as("w2"),
                        col("c").as("c_b")),
              col("lb") === col("lb2") && col("w") === col("w2"), "left")
        .drop("lb2", "w2")
        .na.fill(0L, Seq("c_b"))
        .join(broadcast(tl.select(col("lang").as("la"), col("t").as("t_a"))),
              "la")
        .withColumn("aw", col("c_a") * col("t_b") + col("c_b") * col("t_a"))
        .withColumn("term",
          dec(col("aw")) * dec(L(lit(2L) * col("t_a") * col("t_b")) -
                               L(col("aw"))))
        .tracked
      val d = dirFrame.groupBy("la", "lb").agg(sum(col("term")).as("dsum"))
        .tracked
      val i = dirFrame.filter(col("c_b") > 0 && col("la") < col("lb"))
        .groupBy("la", "lb").agg(sum(col("term")).as("isum"))
      val hn = lt.groupBy("lang")
        .agg(sum(dec(col("c")) * dec(L(col("c")))).as("sclog"))
        .join(tl, "lang")
        .select(col("lang"), col("t"),
          (dec(col("t")) * dec(L(col("t"))) - col("sclog")).as("hnum"))
      d.filter(col("la") < col("lb"))
        .join(d.select(col("lb").as("la"), col("la").as("lb"),
                       col("dsum").as("dsum_r")), Seq("la", "lb"))
        .join(i, Seq("la", "lb"))
        .join(broadcast(hn.select(col("lang").as("la"),
          col("t").as("t_a"), col("hnum").as("hnum_a"))), "la")
        .join(broadcast(hn.select(col("lang").as("lb"),
          col("t").as("t_b"), col("hnum").as("hnum_b"))), "lb")
        .select(col("la").as("lang_a"), col("lb").as("lang_b"),
          (((col("dsum") + col("dsum_r") - col("isum")).cast("double")
             / (col("t_a") * col("t_b") * lit(2L)).cast("double")
             / lit(1048576.0))
           - (col("hnum_a").cast("double") / col("t_a").cast("double")
                / lit(1048576.0)
              + col("hnum_b").cast("double") / col("t_b").cast("double")
                / lit(1048576.0)) / lit(2.0)).as("jsd_bits"))
        .orderBy("lang_a", "lang_b")
    }),

    // ANN quality as a first-class oracle-checked query (the estimator-
    // census pattern dedup_lsh_quality established, applied to the
    // vector-search path): recall@5 of the IVF probe (nprobe=2) against
    // the exact brute-force top-5 per probe vector. Both sides reuse the
    // verified operators; the per-query miss census is exactly what an
    // index-tuning loop monitors when trading nprobe against scan cost.
    "sim_ivf_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
      val gt = Similarity.bruteForceTopK(emb, probes, k = 5)
        .select(col("query_id"), col("vec_id"))
      val ivf = Similarity.ivfProbeTopK(emb,
          emb.filter(col("vec_id") < 8), probes, nprobe = 2, k = 5)
        .select(col("query_id"), col("vec_id"))
      val hits = gt.join(ivf, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      probes.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall_at_5",
          col("n_hits").cast("double") / lit(5.0))
        .orderBy("query_id")
    }),

    // Embedding-quality evaluation: leave-one-out 3-NN label accuracy
    // over an id-bounded probe set — the standard "are these embeddings
    // any good" harness. Exact cosine neighbors from the brute-force
    // baseline (broadcast probes × one corpus scan), majority vote with
    // (votes, best-rank, label) tie-break as one partial-aggregable
    // max_by, per-label accuracy as an exact count ratio.
    "sim_knn_loo_accuracy" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nn = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 200), k = 3)
      val lbl = emb.select(col("vec_id"), col("label").cast("long").as("lbl"))
        .tracked
      val pred = nn.join(lbl, "vec_id")
        .groupBy("query_id", "lbl")
        .agg(count(lit(1)).as("v"), min(col("rank")).as("best"))
        .groupBy("query_id")
        .agg(max_by(col("lbl"),
          struct(col("v"), (-col("best")).as("nb"), (-col("lbl")).as("nl")))
          .as("pred"))
      pred.join(lbl.select(col("vec_id").as("query_id"),
                           col("lbl").as("truth")), "query_id")
        .groupBy(col("truth").as("label"))
        .agg(count(lit(1)).as("n_queries"),
             sum((col("pred") === col("truth")).cast("long"))
               .as("n_correct"))
        .select(col("label"), col("n_queries"), col("n_correct"),
          (col("n_correct").cast("double") / col("n_queries").cast("double"))
            .as("accuracy"))
        .orderBy("label")
    }),

    // RAKE keyphrase extraction: stopword-delimited token runs (≤3 words)
    // are the candidate phrases; each word scores deg/freq (deg = summed
    // length of the phrases it appears in), each phrase the sum of its
    // word scores. The division lives on the ⌊·2²⁰⌋ integer lattice so
    // scores and the top-k order are exact. Run segmentation is a keyed
    // running sum (stopword prefix count), never a per-doc UDF loop.
    "text_keyphrase_rake" -> ((s, dir) => {
      val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val g = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens("text")).as(Seq("pos", "w")))
        .withColumn("stop", array_contains(stopArr, col("w")).cast("long"))
        .withColumn("gid", sum(col("stop")).over(w))
        .filter(col("stop") === 0)
      val ph = g.groupBy("doc_id", "gid")
        .agg(expr("transform(array_sort(collect_list(named_struct(" +
          "'pos', pos, 'w', w))), x -> x.w)").as("ws"))
        .filter(size(col("ws")) <= 3)
        .withColumn("phrase", array_join(col("ws"), " "))
        .withColumn("len", size(col("ws")).cast("long"))
        .tracked
      val wordScore = ph.select(col("len"), explode(col("ws")).as("w"))
        .groupBy("w")
        .agg(expr("sum(len) * 1048576 DIV count(1)").as("wscore"))
      ph.select(col("doc_id"), col("gid"), col("phrase"),
          explode(col("ws")).as("w"))
        .join(wordScore, "w")
        .groupBy("doc_id", "gid", "phrase")
        .agg(sum(col("wscore")).as("pscore"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occurrences"),
             max(col("pscore")).as("score_q20"))
        .select(col("phrase"), col("n_occurrences"),
          (col("score_q20").cast("double") / lit(1048576.0))
            .as("rake_score"))
        .orderBy(col("rake_score").desc, col("phrase"))
        .limit(20)
    }),

    // Streaming mixture monitor: per-day event-type entropy where the
    // stream holds only watermark-bounded (day, type) counts and the
    // exact lattice entropy derives on the finalized sink — the live
    // label-balance drift alarm over ingest, bitwise-equal to its batch
    // formulation (which is what the oracle pins).
    "stream_entropy_daily" -> ((s, dir) =>
      graft.streaming.EventStream.runEntropyDaily(s, dir)
        .orderBy("date")),

    // Ingest-time near-duplicate detection: the LSH band buckets as
    // streaming state — each (band, key) group holds its members, a pair
    // emits exactly when its second member arrives, and the emitted SET
    // is micro-batch-boundary-invariant, so streamed == the batch banded
    // self-join (whose oracle text this query shares verbatim). The
    // streaming half of the dedup pipeline's signature → candidates
    // chain.
    "stream_lsh_neardup" -> ((s, dir) =>
      graft.streaming.StreamNearDup.pairs(s, dir)
        .orderBy("doc_a", "doc_b")),

    // Ljung–Box portmanteau test per series: Q = n(n+2)·Σ_k r_k²/(n−k)
    // over the same lag-1..3 autocorrelations ts_acf_multilag computes
    // (identical lattice moments, identical r chain), with the 3-term
    // sum folded in fixed lag order. The "is this series white noise"
    // gate run before fitting anything autoregressive.
    "ts_ljung_box" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("date")
      val rq = Ohlc.dailyBars(Tables.events(s, dir))
        .select(col("event_type"), col("date"),
                Exact.cents(col("close")).as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("date"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0)).cast("long")
            .as("x"))
        .tracked
      val pairs = rq
        .withColumn("y1", lag(col("x"), 1).over(w))
        .withColumn("y2", lag(col("x"), 2).over(w))
        .withColumn("y3", lag(col("x"), 3).over(w))
        .select(col("event_type"), col("x"),
          expr("stack(3, 1L, y1, 2L, y2, 3L, y3) AS (lag, y)"))
        .filter(col("y").isNotNull)
      val agg = pairs.groupBy("event_type", "lag")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
             sum(col("x") * col("x")).as("sxx"),
             sum(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val r = agg.select(col("event_type"), col("lag"),
        ((nd * col("sxy") - d(col("sx")) * col("sy")).cast("double")
          / (sqrt((nd * col("sxx") - d(col("sx")) * col("sx"))
               .cast("double"))
             * sqrt((nd * col("syy") - d(col("sy")) * col("sy"))
               .cast("double")))).as("r"))
      val ns = rq.groupBy("event_type").agg(count(lit(1)).as("n_obs"))
      r.join(broadcast(ns), "event_type")
        .withColumn("term", col("r") * col("r")
          / (col("n_obs") - col("lag")).cast("double"))
        .groupBy("event_type")
        .agg(first(col("n_obs")).as("n_obs"),
             expr("aggregate(array_sort(collect_list(named_struct(" +
               "'lag', lag, 't', term))), CAST(0.0 AS DOUBLE), " +
               "(a, x) -> a + x.t)").as("tsum"))
        .select(col("event_type"), col("n_obs"), lit(3L).as("df"),
          (col("n_obs").cast("double")
            * (col("n_obs") + lit(2)).cast("double") * col("tsum"))
            .as("q_stat"))
        .orderBy("event_type")
    }),

    // Two REAL BPE training iterations over the corpus: count adjacent
    // token pairs → pick the top merge (count desc, then lexicographic;
    // self-pairs excluded so the greedy merge has no overlap ambiguity
    // and applies embarrassingly parallel) → rewrite every occurrence
    // corpus-wide → recount. Each rewrite is one keyed lag/lead window
    // pass + re-rank, never a per-doc loop; the two top-pair picks are
    // 1-row scalar collects (the allowed driver-side pattern). Output:
    // the post-merge pair counts, where the merged tokens now appear as
    // single units — the actual inner loop of tokenizer training,
    // distributed.
    "text_bpe_train_steps" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val dw = W.partitionBy("doc_id").orderBy("pos")
      def pairs(tok: DataFrame): DataFrame = tok
        .withColumn("w2", lead(col("w"), 1).over(dw))
        .filter(col("w2").isNotNull)
        .groupBy(col("w").as("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      def topPair(bg: DataFrame): (String, String) = {
        val r = bg.filter(col("w1") =!= col("w2"))
          .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
          .collect().head
        (r.getString(0), r.getString(1))
      }
      def merge(tok: DataFrame, a: String, b: String): DataFrame = tok
        .withColumn("pw", lag(col("w"), 1).over(dw))
        .withColumn("nw", lead(col("w"), 1).over(dw))
        .withColumn("w",
          when(col("w") === a && col("nw") === b, lit(a + "_" + b))
            .when(col("pw") === a && col("w") === b, lit(null))
            .otherwise(col("w")))
        .filter(col("w").isNotNull)
        .select(col("doc_id"),
          row_number().over(dw).as("pos"), col("w"))
      val tok0 = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens("text")).as(Seq("pos", "w")))
        .tracked
      val (a0, b0) = topPair(pairs(tok0))
      val tok1 = merge(tok0, a0, b0).tracked
      val (a1, b1) = topPair(pairs(tok1))
      val tok2 = merge(tok1, a1, b1)
      pairs(tok2)
        .orderBy(col("cnt").desc, col("w1"), col("w2"))
        .limit(10)
    }),

    // Kaplan–Meier survival over user lifetimes (first→last event day):
    // S(t) = Π_{i≤t}(1 − dᵢ/nᵢ) is a product of exact rationals, kept
    // portable as log2 S(t) = Σ(log2fp(nᵢ−dᵢ) − log2fp(nᵢ)) — an exact
    // lattice prefix sum over the lifetime histogram (bounded by max
    // lifetime, so the deliberate single-partition window is justified
    // and keyed non-foldably). NULL once survivors hit zero (S = 0, log
    // undefined). The retention-curve statistic behind cohort LTV.
    "agg_kaplan_meier" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val lives = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          .cast("long").as("t"))
      val hist = lives.groupBy("t").agg(count(lit(1)).as("d"))
      val W = org.apache.spark.sql.expressions.Window
      val base = W.partitionBy(Exact.onePartition(col("t"))).orderBy("t")
      val suffix = base.rowsBetween(W.currentRow, W.unboundedFollowing)
      val prefix = base.rowsBetween(W.unboundedPreceding, W.currentRow)
      hist
        .withColumn("n_at_risk", sum(col("d")).over(suffix))
        .withColumn("surv",
          when(col("n_at_risk") > col("d"),
            L(col("n_at_risk") - col("d")) - L(col("n_at_risk"))))
        .withColumn("log2_survival",
          when(col("surv").isNotNull,
            sum(col("surv")).over(prefix).cast("double") / lit(1048576.0)))
        .select(col("t").as("lifetime_days"), col("n_at_risk"),
          col("d").as("n_churned"), col("log2_survival"))
        .orderBy("lifetime_days")
    }),

    // Negative-sampling table (word2vec's unigram^¾ distribution) kept
    // EXACT: c^¾ = ⌊⁴√(c³)⌋ via two nested integer square roots
    // (⌊√⌊√x⌋⌋ = ⌊x^¼⌋; c³ < 2⁵³ so the double conversions are exact
    // and sqrt is IEEE correctly-rounded — no libm pow). Weights and
    // ppm shares are exact integers, the top-k order total.
    "sample_negative_table" -> ((s, dir) => {
      val uc = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens("text")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .withColumn("wt",
          floor(sqrt(floor(sqrt((col("c") * col("c") * col("c"))
            .cast("double"))))).cast("long"))
        .tracked
      val tot = uc.agg(sum(col("wt")).as("total_wt"))
      uc.crossJoin(broadcast(tot))
        .select(col("w").as("token"), col("c").as("freq"), col("wt"),
          expr("wt * 1000000 DIV total_wt").as("share_ppm"))
        .orderBy(col("wt").desc, col("token"))
        .limit(30)
    }),

    // Davies–Bouldin separation per cluster — the companion metric to
    // the silhouette: R_i = max_{j≠i} (s_i + s_j)/d(c_i, c_j) with s =
    // mean member→centroid distance. Member distances need only the OWN
    // centroid (a keyed broadcast join — O(N), cheaper than the
    // silhouette's O(N·k)); the k² centroid-pair frame is broadcast-tiny.
    // Scatters ride the ⌊d·2²⁰⌋ lattice; the max over j is order-free.
    "emb_davies_bouldin" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val centArr = graft.similarity.CentroidLattice.centroidArrays(emb)
        .tracked
      val scatters = emb
        .select(col("label").cast("long").as("label"),
          expr(graft.similarity.CentroidLattice.qArraySql).as("qa"))
        .join(broadcast(centArr), "label")
        .withColumn("dq20",
          floor(sqrt(expr(graft.similarity.CentroidLattice
              .dist2Sql("qa", "c"))) * lit(1048576)).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), sum(col("dq20")).as("sdq"))
        .select(col("label"), col("n_vecs"),
          (col("sdq").cast("double") / col("n_vecs").cast("double")
            / lit(1048576.0)).as("scatter"))
        .tracked
      val cd = (x: String, y: String) =>
        s"""sqrt(aggregate(zip_with($x, $y,
              (a, b) -> (a - b) * (a - b)),
            CAST(0.0 AS DOUBLE), (a, x) -> a + x))"""
      val pairs = centArr.select(col("label").as("li"), col("c").as("ci"))
        .crossJoin(broadcast(
          centArr.select(col("label").as("lj"), col("c").as("cj"))))
        .filter(col("li") =!= col("lj"))
        .withColumn("d_ij", expr(cd("ci", "cj")))
        .select("li", "lj", "d_ij")
      pairs
        .join(broadcast(scatters.select(col("label").as("li"),
          col("n_vecs"), col("scatter").as("s_i"))), "li")
        .join(broadcast(scatters.select(col("label").as("lj"),
          col("scatter").as("s_j"))), "lj")
        .groupBy(col("li").as("label"))
        .agg(first(col("n_vecs")).as("n_vecs"),
             first(col("s_i")).as("scatter"),
             max((col("s_i") + col("s_j")) / col("d_ij")).as("r_worst"))
        .orderBy("label")
    }),

    // Per-document cross-entropy under the corpus's own bigram LM — the
    // LM-score quality filter every pretraining pipeline runs, with the
    // unsmoothed MLE model trained on the corpus itself so every doc
    // bigram has support. Per-bigram surprisal −log2 p(w₂|w₁) =
    // log2fp(c_a) − log2fp(c_ab) ≥ 0 exactly on the lattice; per-doc
    // sums are exact integers, so the flagged tail (top-20 most
    // surprising docs) is totally ordered. One bigram-keyed join against
    // the corpus counts — no per-doc state.
    "text_bigram_surprisal" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.tokens("text").as("t")).tracked
      val bg = toks.select(col("doc_id"), explode(expr(
          "transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
          "(w, i) -> named_struct('w1', w, 'w2', element_at(t, i + 2)))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .tracked
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      val uc = bg.groupBy("w1").agg(count(lit(1)).as("c_a"))
      bg.join(bc, Seq("w1", "w2")).join(uc, Seq("w1"))
        .withColumn("bits_q20", L(col("c_a")) - L(col("c_ab")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
             sum(col("bits_q20")).as("sbits"))
        .select(col("doc_id"), col("n_bigrams"),
          (col("sbits").cast("double") / col("n_bigrams").cast("double")
            / lit(1048576.0)).as("mean_bits"))
        .orderBy(col("mean_bits").desc, col("doc_id"))
        .limit(20)
    }),

    // Class-balanced downsampling: cap every label at the minority-class
    // size, picking members by the portable spread hash (so the selection
    // is deterministic, seedless, and identical on any engine/partition
    // layout — the same reproducibility contract as sample_hash_split).
    // The id-sum checksum pins the exact selected SET, not just its size.
    "sample_class_balanced" -> ((s, dir) => {
      val lbl = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val counts = lbl.groupBy("label").agg(count(lit(1)).as("n_class"))
        .tracked
      val minN = counts.agg(min(col("n_class")).as("m"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label")
        .orderBy(graft.olap.Sketch.spreadHash(col("vec_id")), col("vec_id"))
      lbl.withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(minN))
        .filter(col("rk") <= col("m"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_selected"),
             sum(col("vec_id")).as("id_checksum"))
        .join(broadcast(counts), "label")
        .select(col("label"), col("n_class"), col("n_selected"),
                col("id_checksum"))
        .orderBy("label")
    }),

    // One-way ANOVA F across event types on value cents — the "does this
    // slice move the metric" test a feature pipeline runs before shipping
    // a segment. Per-group moments (n, Σc, Σc²) come from ONE
    // partial-aggregable scan (Σc² summed in DECIMAL(38,0) so the moment
    // never wraps at corpus scale — the emb_centroid_drift lesson); the k
    // between-group terms s_g²/n_g spend one IEEE division each and fold
    // in a FIXED event_type order (sort_array→aggregate ≡
    // list_sort→list_reduce, the Cramér's-V discipline), so F is bitwise
    // portable. k is the bounded type universe, never event volume.
    "agg_anova_f" -> ((s, dir) =>
      fixedFoldF(Tables.events(s, dir)
          .select(col("event_type"), Exact.cents(col("value")).as("v")))
        .select(col("k"), col("n_total"), col("ssb"), col("ssw"),
                col("stat").as("f_stat"))),

    // DDSketch-flavored relative-error quantiles: the log-bucketed
    // companion to sketch_histogram_quantiles' fixed-width bins. Bucket =
    // log2_fp(cents) DIV 2^16 keeps 4 fractional bits — γ = 2^(1/16)
    // spacing, ≈4.4% worst-case relative width at ANY magnitude, which is
    // the guarantee latency/value sketches actually want (a $10 linear bin
    // is useless at $0.50 and wasteful at $40k). The bucket-count frame is
    // additive across shards (same merge contract as KMV/CMS/HLL), the
    // per-type cumulative walks ~250 bucket rows, and the reported
    // estimate is the bucket's own observed min — exact integers on the
    // shared lattice, no pow() inversion. Exact positional percentiles
    // ride along so the relative error is visible.
    "sketch_ddsketch_quantiles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val L = graft.functions.FixedLog2.log2_fp _
      val v = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("cents"))
        .filter(col("cents") > 0) // lattice domain; fixture min is 1 cent
        .tracked // bucket counts + rank targets + exact pick read it
      val n = v.groupBy("event_type").agg(count(lit(1)).as("n"))
      val bc = v.withColumn("lg", L(col("cents")))
        .withColumn("bucket", expr("lg div 65536"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("cnt"), min("cents").as("lo"))
        .withColumn("cum", sum("cnt").over(
          w.partitionBy("event_type").orderBy("bucket")
            .rowsBetween(w.unboundedPreceding, w.currentRow)))
      val ps = n.select(col("event_type"), col("n"),
          explode(array(lit(50L), lit(90L), lit(99L))).as("p"))
        .withColumn("k", expr("(n * p + 99) div 100"))
      val est = bc.join(broadcast(ps), "event_type")
        .filter(col("cum") >= col("k"))
        .groupBy("event_type", "p").agg(min("bucket").as("bucket"))
        .join(bc.select("event_type", "bucket", "lo"),
              Seq("event_type", "bucket"))
        .withColumn("est_value", col("lo").cast("double") / lit(100.0))
      val exact = v
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("cents")))
        .join(broadcast(ps), "event_type")
        .filter(col("rn") === col("k"))
        .select(col("event_type"), col("p"),
          (col("cents").cast("double") / lit(100.0)).as("exact_value"))
      est.join(exact, Seq("event_type", "p"))
        .select("event_type", "p", "bucket", "est_value", "exact_value")
        .orderBy("event_type", "p")
    }),

    // Page–Hinkley drift detection over each type's daily mean value —
    // the sequential change monitor a feature pipeline runs on every
    // metric stream. Entirely on the integer lattice: the daily mean is
    // (Σcents·10⁴) DIV n (explicit floor-division, the HHI discipline),
    // the running mean inside the PH term is cum DIV t, so m_t and both
    // one-sided statistics (m − run-min for upward drift, run-max − m for
    // downward) are exact BIGINTs — no double accumulation order to
    // diverge. Events reduce to (type, day) cells FIRST; every window is
    // keyed by type over day-counted rows, never event volume.
    "ts_page_hinkley" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val byT = w.partitionBy("event_type").orderBy("d")
      val run = byT.rowsBetween(w.unboundedPreceding, w.currentRow)
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(Exact.cents(col("value"))).as("s"), count(lit(1)).as("n"))
        .withColumn("x", expr("(s * 10000) div n"))
        .withColumn("t", row_number().over(byT).cast("long"))
        .withColumn("cumx", sum("x").over(run))
        .withColumn("term", col("x") - expr("cumx div t"))
        .withColumn("m", sum("term").over(run))
        .withColumn("ph_inc", col("m") - min("m").over(run))
        .withColumn("ph_dec", max("m").over(run) - col("m"))
        .select("event_type", "d", "x", "m", "ph_inc", "ph_dec")
        .orderBy("event_type", "d")
    }),

    // Hurst exponent via rescaled-range (R/S) analysis of each type's
    // daily-total series — the long-memory diagnostic for metric streams
    // (H≈0.5 random walk, >0.5 trending, <0.5 mean-reverting). Blocks of
    // n ∈ {5,10,15} days; per full block the scaled deviation range n·R
    // and variance numerator n·Σx²−S² are exact BIGINTs, so
    // y = 2·L(n·R) − L(n·Σx²−S²) = 2·log2(R/σ) lands on the FixedLog2
    // lattice and per-scale sums are order-free. H is half the OLS slope
    // of mean(y) on L(n): the per-scale means get a common denominator
    // M = Πm_s (exact ≤3-element integer fold), so slope numerator and
    // denominator are exact DECIMAL(38,0) with ONE final double division.
    // Frames after the daily reduce are day-counted (≤ 3·days rows per
    // type), never event volume.
    "ts_hurst_rs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val L = graft.functions.FixedLog2.log2_fp _
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .withColumn("t", row_number().over(
          w.partitionBy("event_type").orderBy("d")).cast("long"))
      val bl = daily
        .withColumn("n", explode(array(lit(5L), lit(10L), lit(15L))))
        .withColumn("block", expr("(t - 1) div n"))
        .withColumn("i", (col("t") - 1) % col("n") + 1)
      val wb = w.partitionBy("event_type", "n", "block")
      val dv = bl
        .withColumn("cum", sum("x").over(wb.orderBy("i")))
        .withColumn("sb", sum("x").over(wb))
        .withColumn("ssb", sum(dec(col("x")) * dec(col("x"))).over(wb))
        .withColumn("cnt", count(lit(1)).over(wb))
        .filter(col("cnt") === col("n")) // classic R/S drops partial blocks
        .groupBy("event_type", "n", "block")
        .agg(max(col("n") * col("cum") - col("i") * col("sb")).as("mx"),
             min(col("n") * col("cum") - col("i") * col("sb")).as("mn"),
             first(Exact.checkedLong(dec(col("n")) * col("ssb")
               - dec(col("sb")) * dec(col("sb"))))
               .as("var_num"))
        .withColumn("rs_num", col("mx") - col("mn"))
        .filter(col("rs_num") > 0 && col("var_num") > 0) // degenerate flat
        .withColumn("y", L(col("rs_num")) * 2 - L(col("var_num")))
      val perScale = dv.groupBy("event_type", "n")
        .agg(count(lit(1)).as("m"), sum("y").as("ys"))
        .withColumn("xs", L(col("n")))
        .tracked // the M-product aggregate and the final join both read it
      val prod = perScale.groupBy("event_type")
        .agg(count(lit(1)).as("k"),
             aggregate(collect_list(col("m")), lit(1L), (a, b) => a * b)
               .as("bigm")) // exact integer product — order-free
      perScale.join(broadcast(prod), "event_type")
        .withColumn("yp", col("ys") * expr("bigm div m")) // M/m_s exact
        .groupBy("event_type")
        .agg(first("k").as("n_scales"), sum("m").as("n_blocks"),
             first("bigm").as("bigm"),
             sum("xs").as("sx"),
             sum(dec(col("xs")) * dec(col("xs"))).as("sxx"),
             sum(dec(col("xs")) * dec(col("yp"))).as("sxy"),
             sum(dec(col("yp"))).as("sy"))
        .select(col("event_type"), col("n_scales"), col("n_blocks"),
          (((dec(col("n_scales")) * col("sxy") - dec(col("sx")) * col("sy"))
              .cast("double")
            / (dec(col("bigm")) * (dec(col("n_scales")) * col("sxx")
               - dec(col("sx")) * dec(col("sx")))).cast("double"))
           / lit(2.0)).as("hurst"))
        .orderBy("event_type")
    }),

    // SAX symbolization + motif mining over each type's event-value
    // stream: PAA frames of 64 events (frame total = 64·mean, same
    // symbolization since monotone), per-type quartile breakpoints via
    // ntile(4) on the totally-ordered (total, frame) key, 3-symbol words
    // via lead, top-10 motifs per type. Everything after the 64:1 frame
    // reduce is frame-counted; the rank window inside each type is the
    // declared keyed-window path (the two-level prefix sum is the 100 TB
    // substitute, as in agg_ks_statistic). Symbols and counts are exact
    // integers — no floats anywhere.
    "ts_sax_symbols" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val byT = w.partitionBy("event_type")
      val frames = Tables.events(s, dir)
        .select(col("event_type"), col("ts"), col("event_id"),
                Exact.cents(col("value")).as("cents"))
        .withColumn("rn", row_number().over(
          byT.orderBy("ts", "event_id")).cast("long"))
        .withColumn("frame", expr("(rn - 1) div 64"))
        .groupBy("event_type", "frame")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("fsum"))
        .filter(col("cnt") === 64) // full frames only
        .withColumn("q", ntile(4).over(byT.orderBy("fsum", "frame")))
        .withColumn("sym", expr("substr('abcd', q, 1)"))
      frames
        .withColumn("s2", lead("sym", 1).over(byT.orderBy("frame")))
        .withColumn("s3", lead("sym", 2).over(byT.orderBy("frame")))
        .filter(col("s3").isNotNull)
        .withColumn("word", concat(col("sym"), col("s2"), col("s3")))
        .groupBy("event_type", "word").agg(count(lit(1)).as("n_frames"))
        .withColumn("rk", row_number().over(
          byT.orderBy(col("n_frames").desc, col("word"))))
        .filter(col("rk") <= 10).drop("rk")
        .orderBy(col("event_type"), col("n_frames").desc, col("word"))
    }),

    // Neyman-allocation stratified sampling: budget 1000 rows split across
    // event-type strata ∝ N_h·S_h (minimum-variance allocation for a mean
    // estimate — uniform sampling wastes budget on low-variance strata).
    // The weight is the exact lattice surrogate
    // isqrt(N·((N·Σc²−S²) div (N−1))): moments from one partial-agg scan,
    // explicit floor-div, floor(sqrt(double)) — deterministic on any
    // engine (long→double rounding and IEEE sqrt are both
    // correctly-rounded, the sample_negative_table discipline). Members
    // are picked by the seedless spread-hash rank (mergeable, partition-
    // independent); the id-sum checksum pins the exact selected set.
    "sample_neyman_allocation" -> ((s, dir) => {
      val (alloc, selected) = neymanSample(s, dir)
      val sel = selected.groupBy("event_type")
        .agg(count(lit(1)).as("n_selected"),
             sum(col("event_id")).as("id_checksum"))
      alloc.join(sel, "event_type")
        .select("event_type", "n_class", "wt", "n_alloc", "n_selected",
                "id_checksum")
        .orderBy("event_type")
    }),

    // Multi-probe hyperplane LSH top-k: the recall dial that does NOT
    // rebuild the index — each query probes its own bucket plus the 8
    // Hamming-1 neighbors (flip each sign bit), so candidates come from 9
    // keyed bucket lookups instead of a corpus scan. A vector lives in
    // exactly one bucket and probes are distinct, so no candidate dedup
    // shuffle is needed; exact cosine verifies (fixed-fold dot — the
    // sim_bruteforce_topk chain) and ranks. At 100 TB the corpus is
    // bucket-partitioned at ingest and each probe is a partition-pruned
    // read.
    "sim_lsh_multiprobe" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val b = graft.similarity.HyperplaneLsh
        .withBuckets(Tables.embeddings(s, dir), nPlanes = 8, dim = 64)
        .tracked // corpus side + query side read it
      val q = b.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("bucket").as("qb"),
                col("embedding").as("emb_q"))
        .withColumn("probe", explode(array(
          col("qb") +: (0 until 8).map(i =>
            col("qb").bitwiseXOR(lit(1L << i))): _*)))
        .drop("qb")
      b.select(col("vec_id"), col("bucket").as("probe"),
               col("embedding").as("emb_c"))
        .join(broadcast(q), "probe")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cosine",
          graft.functions.VecOps.cosine(col("emb_q"), col("emb_c")))
        .withColumn("rank", row_number().over(
          w.partitionBy("query_id")
            .orderBy(col("cosine").desc, col("vec_id").asc)))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    }),

    // Brown–Forsythe (median-based Levene) variance-equality test across
    // event types — the heteroscedasticity gate that decides whether
    // agg_anova_f's pooled-variance assumption holds. The per-type median
    // stays exact as 2·median = the two middle order statistics (rank
    // picks via conditional sums — no DOUBLE percentile); spreads
    // z = |2c − 2·median| are exact BIGINTs; then the same fixed-fold
    // one-way-F chain as agg_anova_f runs on z. Two scans of the cents
    // frame (rank pick + spread moments), both keyed by type.
    "agg_levene_bf" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val v = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
        .tracked // median ranks + spread moments read it
      val med2 = v
        .withColumn("rn", row_number().over(
          w.partitionBy("event_type").orderBy("c")).cast("long"))
        .withColumn("n", count(lit(1)).over(w.partitionBy("event_type")))
        .groupBy("event_type")
        .agg((sum(when(col("rn") === expr("(n + 1) div 2"), col("c"))
                .otherwise(0L))
              + sum(when(col("rn") === expr("(n + 2) div 2"), col("c"))
                .otherwise(0L))).as("m2"))
      fixedFoldF(v.join(broadcast(med2), "event_type")
          .select(col("event_type"),
                  abs(col("c") * 2 - col("m2")).as("v")))
        .select(col("k"), col("n_total"), col("stat").as("w_stat"))
    }),

    // STL-lite decomposition of each type's daily series into
    // trend + day-of-week seasonal + remainder — the decomposition a
    // metric pipeline runs before anomaly rules. Entirely on the integer
    // lattice: trend is the centered 7-day SUM (trend×7, full windows
    // only), detrended = 7·x − trend7, the seasonal index is the exact
    // floor-divided per-(type, dow) mean of detrended (the explicit
    // make-divisible floor-div portable on both engines), remainder
    // closes the identity det7 = seasonal + remainder exactly. Events
    // reduce to day cells first; windows are type-keyed over day-counted
    // rows; the 35-row seasonal index broadcasts back.
    "ts_stl_decompose" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val byT = w.partitionBy("event_type").orderBy("t")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .withColumn("t", row_number().over(
          w.partitionBy("event_type").orderBy("d")).cast("long"))
        .withColumn("dow", (weekday(col("d")) + 1).cast("long"))
      val tr = daily
        .withColumn("trend7", sum("x").over(byT.rowsBetween(-3, 3)))
        .withColumn("cnt7", count(lit(1)).over(byT.rowsBetween(-3, 3)))
        .filter(col("cnt7") === 7)
        .withColumn("det7", col("x") * 7 - col("trend7"))
        .tracked // seasonal index + final join both read it
      val seas = tr.groupBy("event_type", "dow")
        .agg(sum("det7").as("s_num"), count(lit(1)).as("s_cnt"))
        .withColumn("seasonal", expr(
          "(s_num - ((s_num % s_cnt) + s_cnt) % s_cnt) div s_cnt"))
        .select("event_type", "dow", "seasonal")
      tr.join(broadcast(seas), Seq("event_type", "dow"))
        .withColumn("resid", col("det7") - col("seasonal"))
        .select("event_type", "d", "x", "trend7", "det7", "seasonal",
                "resid")
        .orderBy("event_type", "d")
    }),

    // CUPED variance reduction — the experimentation-platform adjustment:
    // split users into pseudo-arms by the seedless spread hash, use each
    // user's first-half-of-window mean value as the pre-period covariate,
    // and report the hash-arm difference raw vs CUPED-adjusted
    // (diff − θ·covariate-diff) plus θ and ρ² (the variance fraction the
    // covariate removes). Per-user means live on the ·10⁴ floor-div
    // lattice; θ and ρ² come from exact DECIMAL(38,0) cross-moments with
    // one IEEE division each. One partial-agg pass to user cells, one to
    // arm/global moments; the window-midpoint scalar is a 1-row
    // broadcast.
    "agg_cuped_adjustment" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dt"),
                Exact.cents(col("value")).as("c"))
        .tracked // midpoint scalar + user cells read it
      val mid = ev.agg(date_add(min(col("dt")), 15).as("mid_d"))
      val users = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("dt") < col("mid_d"), col("c"))).as("sx"),
             sum(when(col("dt") < col("mid_d"), 1L)).as("nx"),
             sum(when(col("dt") >= col("mid_d"), col("c"))).as("sy"),
             sum(when(col("dt") >= col("mid_d"), 1L)).as("ny"))
        .filter(col("nx").isNotNull && col("ny").isNotNull)
        .withColumn("x", expr("(sx * 10000) div nx"))
        .withColumn("y", expr("(sy * 10000) div ny"))
        .withColumn("arm",
          pmod(graft.olap.Sketch.spreadHash(col("user_id")), lit(2)))
        .select("user_id", "arm", "x", "y")
        .tracked // pooled moments + per-arm means read it
      val pooled = users.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"),
          sum(dec(col("y")) * dec(col("y"))).as("syy"))
        .withColumn("theta",
          (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .cast("double")
          / (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
            .cast("double"))
        .withColumn("rho2",
          ((dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
             .cast("double")
           * (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
             .cast("double"))
          / ((dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
               .cast("double")
             * (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
               .cast("double")))
      val arms = users.groupBy("arm")
        .agg(count(lit(1)).as("na"), sum("x").as("sxa"), sum("y").as("sya"))
      val a0 = arms.filter(col("arm") === 0)
        .select(col("na").as("n_a"), col("sxa").as("sx_a"),
                col("sya").as("sy_a"))
      val a1 = arms.filter(col("arm") === 1)
        .select(col("na").as("n_b"), col("sxa").as("sx_b"),
                col("sya").as("sy_b"))
      a0.crossJoin(a1).crossJoin(broadcast(pooled))
        .withColumn("diff_raw",
          d(col("sy_a")) / d(col("n_a")) - d(col("sy_b")) / d(col("n_b")))
        .withColumn("diff_x",
          d(col("sx_a")) / d(col("n_a")) - d(col("sx_b")) / d(col("n_b")))
        .select(col("n_a"), col("n_b"),
          (col("diff_raw") / lit(10000.0) / lit(100.0)).as("diff_raw"),
          ((col("diff_raw") - col("theta") * col("diff_x"))
            / lit(10000.0) / lit(100.0)).as("diff_cuped"),
          col("theta"), col("rho2"))
    }),

    // Delta-method standard error of a ratio metric (value per event)
    // under user-level clustering — the correct SE every experimentation
    // platform needs because events within a user correlate: naive
    // per-event SE is anticonservative. Per-user totals (x = events,
    // y = cents) are exact integers from one partial-agg pass;
    // R = ȳ/x̄ and Var(R) ≈ (Var(y) − 2R·Cov + R²·Var(x))/(n·x̄²) use
    // exact DECIMAL(38,0) moments with a FIXED IEEE chain (each moment
    // one division, combined once). Output in dollars per event.
    "agg_ratio_delta_se" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val u = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("x"), sum(Exact.cents(col("value"))).as("y"))
      u.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(dec(col("x")) * dec(col("x"))).as("sxx"),
            sum(dec(col("x")) * dec(col("y"))).as("sxy"),
            sum(dec(col("y")) * dec(col("y"))).as("syy"))
        .withColumn("xbar", d(col("sx")) / d(col("n")))
        .withColumn("r", d(col("sy")) / d(col("sx")))
        .withColumn("var_x",
          (dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx")))
            .cast("double") / d(col("n") * (col("n") - 1)))
        .withColumn("var_y",
          (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy")))
            .cast("double") / d(col("n") * (col("n") - 1)))
        .withColumn("cov_xy",
          (dec(col("n")) * col("sxy") - dec(col("sx")) * dec(col("sy")))
            .cast("double") / d(col("n") * (col("n") - 1)))
        .select(col("n").as("n_users"),
          (col("r") / lit(100.0)).as("ratio"),
          (sqrt((col("var_y") - lit(2.0) * col("r") * col("cov_xy")
                 + col("r") * col("r") * col("var_x"))
                / (d(col("n")) * col("xbar") * col("xbar")))
            / lit(100.0)).as("se_delta"))
    }),

    // Perceptual average-hash over the REAL PNG codec round-trip — the
    // image-dedup signature (aHash: pixel > floor-mean, row-major bits)
    // computed from actually-decoded rasters, split into two 32-bit
    // halves so no engine touches the BIGINT sign bit. Batched
    // mapPartitions encode→decode like mm_png_decode (codec init
    // amortizes per partition), zero shuffle before the output sort; the
    // oracle recomputes the hash arithmetically from the synthesis
    // formula — lossless grayscale PNG means decoded == synthesized.
    "mm_image_phash" -> ((s, dir) =>
      phashFrame(s, dir)
        .select(col("media_id"), col("width"), col("height"),
          col("lo").as("phash_lo"), col("hi").as("phash_hi"), col("n_set"))
        .orderBy("media_id")),

    // RAG-style sliding-window chunking: 200-char chunks at 150-char
    // stride (50-char overlap so no retrieval boundary loses context) —
    // the corpus-preparation pass every retrieval pipeline runs. The
    // chunk grid derives from n_chars arithmetic (no second text scan),
    // chunks come from one explode + substring per doc (embarrassingly
    // parallel, zero shuffle before the output sort), and each chunk
    // carries its token count plus the portable codepoint-fold hash so
    // downstream chunk-level dedup is a groupBy away.
    "text_rag_chunking" -> ((s, dir) => {
      val chunks = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("n_chars"))
        .filter(col("n_chars") > 0)
        .withColumn("chunk_idx",
          explode(sequence(lit(0L), expr("(n_chars - 1) div 150"))))
        .withColumn("chunk", expr(
          "substring(text, cast(chunk_idx * 150 + 1 as int), 200)"))
      chunks
        .select(col("doc_id"), col("chunk_idx"),
          length(col("chunk")).cast("long").as("chunk_len"),
          size(TextAnalysis.tokens("chunk")).cast("long").as("n_tokens"),
          graft.functions.CharFold.char_fold_hash(col("chunk"))
            .as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Generalized-ESD-style iterative outlier extraction over each type's
    // daily totals: 3 rounds of "flag the farthest point, remove it,
    // recompute" — the anomaly sweep that a single z-pass gets wrong
    // because extreme points inflate the very moments they're judged by.
    // The argmax key |n·x − S| is an exact BIGINT (ties to the later
    // date), per-round moments are one partial-agg over the shrinking
    // day-cell frame, and only the reported z spends a fixed IEEE chain.
    // Three unrolled rounds = bounded lineage, no driver collects.
    "ts_esd_outliers" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .tracked // three shrinking rounds re-scan it
      var cur = daily
      val picks = (1 to 3).map { r =>
        val moms = cur.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("s"),
               sum(dec(col("x")) * dec(col("x"))).as("ss"))
        val dv = cur.join(broadcast(moms), "event_type")
          .withColumn("dev", abs(col("x") * col("n") - col("s")))
          .withColumn("rk", row_number().over(
            w.partitionBy("event_type")
              .orderBy(col("dev").desc, col("d").desc)))
        val pick = dv.filter(col("rk") === 1)
          .select(lit(r.toLong).as("round"), col("event_type"), col("d"),
            col("x"), col("dev"), col("n"),
            (d(col("dev")) / (d(col("n"))
              * sqrt((dec(col("n")) * col("ss")
                      - dec(col("s")) * dec(col("s"))).cast("double")
                     / d(col("n") * (col("n") - 1))))).as("z"))
        cur = dv.filter(col("rk") =!= 1).select("event_type", "d", "x")
        pick
      }
      picks.reduce(_ unionAll _).orderBy("event_type", "round")
    }),

    // Banded-Hamming near-dup pairs over the perceptual hashes — the
    // image-dedup candidate chain closing the loop from mm_image_phash:
    // split each 64-bit aHash into 4×16-bit bands (an exact-match band is
    // the LSH bucket — Hamming ≤ 3 guarantees one clean band by
    // pigeonhole), keyed self-join per band, distinct pairs, popcount
    // verify (bit_count, codegen'd both engines). Only informative hashes
    // (≥ 8 set bits) enter the index, mirroring production phash dedup.
    // The banded join is the ONLY shuffle — never an all-pairs compare.
    "dedup_phash_hamming" -> ((s, dir) => {
      val hashes = phashFrame(s, dir)
        .select("media_id", "lo", "hi", "n_set")
        .filter(col("n_set") >= 8)
        .tracked // band explode + both join sides read it
      val banded = hashes.withColumn("band", explode(array(
          struct(lit(0L).as("b"), (col("lo") % 65536).as("v")),
          struct(lit(1L).as("b"), expr("lo div 65536").as("v")),
          struct(lit(2L).as("b"), (col("hi") % 65536).as("v")),
          struct(lit(3L).as("b"), expr("hi div 65536").as("v")))))
        .select(col("media_id"), col("lo"), col("hi"),
          col("band.b").as("b"), col("band.v").as("v"))
      banded.select(col("media_id").as("media_a"), col("lo").as("lo_a"),
          col("hi").as("hi_a"), col("b"), col("v"))
        .join(banded.select(col("media_id").as("media_b"),
          col("lo").as("lo_b"), col("hi").as("hi_b"), col("b"), col("v")),
          Seq("b", "v"))
        .filter(col("media_a") < col("media_b"))
        .select("media_a", "media_b", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct() // multi-band collisions emit once
        .withColumn("hamming",
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))
            + bit_count(col("hi_a").bitwiseXOR(col("hi_b"))))
        .filter(col("hamming") <= 3)
        .select(col("media_a"), col("media_b"),
                col("hamming").cast("long").as("hamming"))
        .orderBy("media_a", "media_b")
    }),

    // Pure-SQL surface over the registered custom expressions: one
    // spark.sql query exercising char_fold_hash, log2_fp AND busday_count
    // together through the FunctionRegistry (GraftExtensions) — the
    // contract that a SQL-only client of the engine gets the same
    // portable lattice primitives the DataFrame API uses, oracle-checked
    // end-to-end.
    "sql_api_lattice_report" -> ((s, dir) => {
      GraftExtensions.registerAll(s)
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql("""
        SELECT event_type,
               char_fold_hash(event_type) AS type_hash,
               count(*) AS n,
               log2_fp(count(*)) AS log2_n_q20,
               busday_count(min(cast(ts as date)), max(cast(ts as date)))
                 AS busdays
        FROM events_v
        GROUP BY event_type
        ORDER BY event_type""")
    }),

    // Forecast-baseline evaluation: naive (lag-1) vs seasonal-naive
    // (lag-7) one-step-ahead error on each type's daily totals — the
    // benchmark every forecasting pipeline must beat before it ships.
    // MAE stays exact cents until ONE division; sMAPE lands on the ppm
    // lattice via explicit floor-div (positives only). Eval rows need
    // both lags (t ≥ 8), windows are type-keyed over day cells.
    "ts_forecast_baseline_eval" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val byT = w.partitionBy("event_type").orderBy("d")
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .withColumn("p1", lag("x", 1).over(byT))
        .withColumn("p7", lag("x", 7).over(byT))
        .filter(col("p7").isNotNull)
        .withColumn("smape1",
          expr("(abs(x - p1) * 1000000) div (x + p1)"))
        .withColumn("smape7",
          expr("(abs(x - p7) * 1000000) div (x + p7)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_eval"),
             sum(abs(col("x") - col("p1"))).as("ae1"),
             sum(abs(col("x") - col("p7"))).as("ae7"),
             sum("smape1").as("sm1"), sum("smape7").as("sm7"))
        .select(col("event_type"), col("n_eval"),
          (col("ae1").cast("double") / col("n_eval").cast("double")
            / lit(100.0)).as("mae_naive"),
          (col("ae7").cast("double") / col("n_eval").cast("double")
            / lit(100.0)).as("mae_snaive"),
          expr("sm1 div n_eval").as("smape_naive_ppm"),
          expr("sm7 div n_eval").as("smape_snaive_ppm"))
        .orderBy("event_type")
    }),

    // Stratified expansion (Horvitz–Thompson) estimation from the Neyman
    // sample: per stratum N_h·(sample sum)/n_h on the exact lattice
    // (floor-div), next to the true total the census knows — the
    // estimator-quality loop every sampling pipeline closes. Signed
    // relative error uses the make-divisible floor-div so both engines
    // truncate identically below zero.
    "sample_expansion_estimate" -> ((s, dir) => {
      val (alloc, selected) = neymanSample(s, dir)
      val est = selected.groupBy("event_type")
        .agg(count(lit(1)).as("n_sel"), sum("c").as("sel_cents"))
      alloc.withColumnRenamed("sc", "true_cents")
        .join(est, "event_type")
        .withColumn("est_cents",
          expr("(sel_cents * n_class) div n_sel"))
        .withColumn("err", col("est_cents") - col("true_cents"))
        .withColumn("err_ppm", expr(
          "(err * 1000000 - ((err * 1000000 % true_cents) + true_cents)" +
          " % true_cents) div true_cents"))
        .select("event_type", "n_class", "n_sel", "est_cents",
                "true_cents", "err_ppm")
        .orderBy("event_type")
    }),

    // Population Stability Index between each type's first-15-day and
    // remaining value distributions — the drift alarm scoring pipelines
    // run between snapshots. Bins are integer log2 magnitudes (the
    // relative-error binning that works at any scale), the full
    // type×bin×side grid gets add-1 smoothing so empty cells contribute,
    // and PSI = ln2·Σ(p−q)log2(p/q) is EXACT on the FixedLog2 lattice:
    // term = (a·n2 − b·n1)·(L(a·n2) − L(b·n1)) in DECIMAL(38,0), one
    // final double conversion.
    "dq_psi_value_drift" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("dt"),
                Exact.cents(col("value")).as("c"))
        .filter(col("c") > 0)
        .tracked // midpoint + both sides scan it
      val mid = ev.agg(date_add(min(col("dt")), 15).as("mid_d"))
      val binned = ev.crossJoin(broadcast(mid))
        .withColumn("lg", L(col("c")))
        .withColumn("bin", expr("lg div 1048576"))
        .withColumn("side", when(col("dt") < col("mid_d"), 1L)
          .otherwise(2L))
        .groupBy("event_type", "bin", "side")
        .agg(count(lit(1)).as("cnt"))
        .tracked // grid + totals read it
      val grid = binned.select("event_type", "bin").distinct()
        .join(binned.groupBy("event_type", "side").agg(sum("cnt").as("nr"))
          .select("event_type", "side"), Seq("event_type"))
        .join(binned, Seq("event_type", "bin", "side"), "left")
        .select(col("event_type"), col("bin"), col("side"),
          (coalesce(col("cnt"), lit(0L)) + 1L).as("sm"))
      val wide = grid.groupBy("event_type", "bin")
        .agg(sum(when(col("side") === 1L, col("sm"))).as("a"),
             sum(when(col("side") === 2L, col("sm"))).as("b"))
      val totals = wide.groupBy("event_type")
        .agg(sum("a").as("n1"), sum("b").as("n2"),
             count(lit(1)).as("n_bins"))
      wide.join(broadcast(totals), "event_type")
        .withColumn("term",
          dec(col("a") * col("n2") - col("b") * col("n1"))
            * dec(L(col("a") * col("n2")) - L(col("b") * col("n1"))))
        .groupBy("event_type")
        .agg(first("n_bins").as("n_bins"), first("n1").as("n1"),
             first("n2").as("n2"), sum("term").as("tsum"))
        .select(col("event_type"), col("n_bins"), col("n1"), col("n2"),
          (col("tsum").cast("double") * lit(0.6931471805599453)
            / (col("n1").cast("double") * col("n2").cast("double")
               * lit(1048576.0))).as("psi"))
        .orderBy("event_type")
    }),

    // Lagged cross-correlation between the click and purchase daily
    // series (lags 0..3) — the lead-lag discovery a metric pipeline runs
    // before claiming one stream predicts another. Day cells first; the
    // aligned (a_t, b_{t+ℓ}) pairs come from 3 leads + one stack over the
    // single 30-row joint series (deliberately one partition, keyed by
    // the non-foldable Exact.onePartition); per-lag Pearson uses exact
    // DECIMAL(38,0) moments and a fixed two-sqrt IEEE chain.
    "ts_xcorr_lags" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val w = org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
      val ab = daily.groupBy("d")
        .agg(sum(when(col("event_type") === "click", col("x"))).as("a"),
             sum(when(col("event_type") === "purchase", col("x"))).as("b"))
        .filter(col("a").isNotNull && col("b").isNotNull)
      val wOne = w.partitionBy(Exact.onePartition(col("d"))).orderBy("d")
      val lagged = ab
        .withColumn("b1", lead("b", 1).over(wOne))
        .withColumn("b2", lead("b", 2).over(wOne))
        .withColumn("b3", lead("b", 3).over(wOne))
        .select(col("a"), expr(
          "stack(4, 0L, b, 1L, b1, 2L, b2, 3L, b3) as (lag, bb)"))
        .filter(col("bb").isNotNull)
      lagged.groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
             sum(dec(col("a"))).as("sa"), sum(dec(col("bb"))).as("sb"),
             sum(dec(col("a")) * dec(col("bb"))).as("sab"),
             sum(dec(col("a")) * dec(col("a"))).as("saa"),
             sum(dec(col("bb")) * dec(col("bb"))).as("sbb"))
        .select(col("lag"), col("n_pairs"),
          ((dec(col("n_pairs")) * col("sab") - col("sa") * col("sb"))
             .cast("double")
           / (sqrt((dec(col("n_pairs")) * col("saa")
                    - col("sa") * col("sa")).cast("double"))
              * sqrt((dec(col("n_pairs")) * col("sbb")
                      - col("sb") * col("sb")).cast("double"))))
            .as("xcorr"))
        .orderBy("lag")
    }),

    // b-bit minhash (b = 1, Li & König): keep only each signature
    // component's lowest bit — 1/64 the sketch storage — and recover
    // Jaccard from bit agreement via Ĵ = 2·(eq/k) − 1 (random bits agree
    // half the time). Candidates come from the SAME banded-LSH join as
    // dedup_minhash_lsh (shared MinHash.candidatePairs — one definition,
    // estimator variants can't disagree on candidates); the full-width
    // estimate rides along so the storage/accuracy trade is visible per
    // pair. At 100 TB the 1-bit sketch is what actually fits in the
    // signature store.
    "dedup_bbit_minhash" -> ((s, dir) =>
      MinHash.candidatePairs(Tables.documents(s, dir), "doc_id", "text",
          k = 16, r = 4)
        .withColumn("eq_full", expr(
          "size(filter(zip_with(sig_a, sig_b, (a, b) -> a = b), x -> x))")
          .cast("long"))
        .withColumn("eq_bits", expr(
          "size(filter(zip_with(sig_a, sig_b," +
          " (a, b) -> a % 2 = b % 2), x -> x))").cast("long"))
        .withColumn("est_full", col("eq_full").cast("double") / lit(16.0))
        .withColumn("est_1bit",
          lit(2.0) * col("eq_bits").cast("double") / lit(16.0) - lit(1.0))
        .filter(col("est_full") >= 0.5)
        .select("doc_a", "doc_b", "eq_full", "eq_bits", "est_full",
                "est_1bit")
        .orderBy("doc_a", "doc_b")),

    // Mann–Kendall trend test per type's daily series — the standard
    // nonparametric "is this metric trending" gate (no distribution or
    // linearity assumption, unlike ts_linreg_trend). S = Σ sign(x_j−x_i)
    // over ordered day pairs and the tie-corrected variance (×18 to stay
    // integral) are exact BIGINTs; the pair self-join is over DAY CELLS
    // (n² in days per key, not events — bounded by horizon), and z spends
    // one fixed IEEE chain. Kendall's tau rides along from the same S.
    "ts_mann_kendall" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .tracked // pairs (both sides) + tie census read it
      val a = daily.select(col("event_type"), col("dt").as("d_i"),
        col("x").as("x_i"))
      val b = daily.select(col("event_type"), col("dt").as("d_j"),
        col("x").as("x_j"))
      val sPerType = a.join(b, Seq("event_type"))
        .filter(col("d_i") < col("d_j"))
        .groupBy("event_type")
        .agg(sum(when(col("x_j") > col("x_i"), 1L)
          .when(col("x_j") < col("x_i"), -1L).otherwise(0L)).as("s_stat"))
      val ties = daily.groupBy("event_type", "x")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(lit(1L)).as("n_distinct"), sum("t").as("n_days"),
             sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
               .as("tie18"))
      sPerType.join(ties, "event_type")
        .withColumn("var18",
          col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
            - col("tie18"))
        .withColumn("s_adj",
          when(col("s_stat") > 0, col("s_stat") - 1)
            .when(col("s_stat") < 0, col("s_stat") + 1).otherwise(0L))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("var18"),
          (d(col("s_adj")) / sqrt(d(col("var18")) / lit(18.0))).as("z"),
          (d(col("s_stat")) * 2.0
            / d(col("n_days") * (col("n_days") - 1))).as("tau"))
        .orderBy("event_type")
    }),

    // ClickHouse-style windowFunnel: conversion depth where every later
    // stage must land within T = 3 days of the user's FIRST view (the
    // anchor), unlike agg_funnel_stages' unbounded chain. Deterministic
    // variant: the anchor is min(view ts), each stage advances via
    // min-in-window — three user-keyed aggregates + broadcast-sized
    // stage counts, no per-user state machine. At 100 TB each stage is
    // one partial-aggregable groupBy over a time-pruned slice.
    "olap_window_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .tracked // three stage scans
      val horizon = expr("INTERVAL 3 DAYS")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1")).tracked
      val c2 = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + horizon)
        .groupBy("user_id").agg(min("ts").as("t2")).tracked
      val p3 = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").join(c2, "user_id")
        .filter(col("ts") >= col("t2") && col("ts") <= col("t1") + horizon)
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_users"))
        .select(lit(1L).as("stage"), lit("view").as("stage_name"),
                col("n_users"))
        .unionByName(c2.agg(count(lit(1)).as("n_users"))
          .select(lit(2L).as("stage"), lit("click_in_window").as("stage_name"),
                  col("n_users")))
        .unionByName(p3.agg(count(lit(1)).as("n_users"))
          .select(lit(3L).as("stage"),
                  lit("purchase_in_window").as("stage_name"),
                  col("n_users")))
        .orderBy("stage")
    }),

    // Pooled-variance Student t, Cohen's d effect size and the
    // Welch–Satterthwaite df for every event-type pair — the effect-size
    // report A/B readouts need next to agg_two_sample_z's z. Moments are
    // exact (cents lattice, DECIMAL(38,0) cross terms); the t/d/df
    // formulas spend fixed IEEE chains mirrored verbatim in the oracle.
    "agg_effect_size_t" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val stats = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
        .groupBy("event_type")
        // second moment in DECIMAL(38,0): a raw BIGINT c·c sum wraps
        // SILENTLY at corpus scale on Spark while the oracle's HUGEINT
        // sum → BIGINT cast aborts loudly — the decimal lattice keeps
        // both engines exact (the neighboring anova/mde discipline)
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
             sum(dec(col("c")) * dec(col("c"))).as("ss"))
        .tracked // both sides of the pair self-join
      val a = stats.select(col("event_type").as("et_a"), col("n").as("na"),
        col("sc").as("sca"), col("ss").as("ssa"))
      val b = stats.select(col("event_type").as("et_b"), col("n").as("nb"),
        col("sc").as("scb"), col("ss").as("ssb"))
      val ma = d(col("sca")) / d(col("na"))
      val mb = d(col("scb")) / d(col("nb"))
      val va = (dec(col("na")) * dec(col("ssa"))
        - dec(col("sca")) * dec(col("sca"))).cast("double") /
        d(col("na") * (col("na") - 1L))
      val vb = (dec(col("nb")) * dec(col("ssb"))
        - dec(col("scb")) * dec(col("scb"))).cast("double") /
        d(col("nb") * (col("nb") - 1L))
      val sp2 = (d(col("na") - 1L) * va + d(col("nb") - 1L) * vb) /
        d(col("na") + col("nb") - 2L)
      val vna = va / d(col("na"))
      val vnb = vb / d(col("nb"))
      a.join(b, col("et_a") < col("et_b"))
        .select(col("et_a"), col("et_b"), col("na"), col("nb"),
          ((ma - mb) / (sqrt(sp2)
            * sqrt(lit(1.0) / d(col("na")) + lit(1.0) / d(col("nb")))))
            .as("t_pooled"),
          ((ma - mb) / sqrt(sp2)).as("cohen_d"),
          ((vna + vnb) * (vna + vnb)
            / (vna * vna / d(col("na") - 1L)
               + vnb * vnb / d(col("nb") - 1L))).as("df_welch"))
        .orderBy("et_a", "et_b")
    }),

    // Stochastic oscillator %K/%D over each type's daily closes — the
    // bounded-momentum indicator next to ts_rsi/ts_macd. %K lives on the
    // ppm lattice ((close−min14)·10⁶ DIV (max14−min14), numerator
    // non-negative so Spark div ≡ DuckDB //); %D is the 3-day floor
    // average of %K, NULL until its window is full (the NULL-gated SMA
    // convention). Windows are keyed by event_type — day cells per key,
    // never event rows, so the frame is horizon-bounded at any corpus
    // size.
    "ts_stochastic_oscillator" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val w14 = w.rowsBetween(-13, 0)
      val w3 = w.rowsBetween(-2, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("close_c"))
      val k = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("mn", min("close_c").over(w14))
        .withColumn("mx", max("close_c").over(w14))
        .withColumn("k_ppm",
          when(col("rn") >= 14 && col("mx") > col("mn"),
            expr("((close_c - mn) * 1000000) div (mx - mn)")))
      k.withColumn("k3n", count(col("k_ppm")).over(w3))
        .withColumn("k3s", sum(col("k_ppm")).over(w3))
        .withColumn("d_ppm", when(col("k3n") === 3, expr("k3s div 3")))
        .select("event_type", "dt", "close_c", "k_ppm", "d_ppm")
        .orderBy("event_type", "dt")
    }),

    // Daily ingest-volume anomaly gate: each (type, day) count against
    // its own trailing 7 closed days — z = (7n−Σn)/√(7Σn²−(Σn)²), the
    // population-σ lattice form with ONE IEEE division, |z|>3 flags. The
    // volume sentinel every scheduled 100 TB ingest runs before
    // publishing a partition; day cells per key keep the window frame
    // horizon-bounded.
    "dq_volume_anomaly" -> ((s, dir) =>
      trailing7VolumeGate(
        Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
          .agg(count(lit(1)).as("n")))),

    // Event-sequence pattern matching (the MATCH_RECOGNIZE / ClickHouse
    // sequenceMatch niche): each user's history becomes one ordered
    // symbol string (first letter of event_type — v/c/p/s/e are
    // distinct), then a broadcast pattern table counts matching users
    // per regex. Per-user strings are bounded by events-per-user (~100
    // here; a 100 TB run sessionizes or caps first — the string is a
    // session transcript, not an unbounded corpus), and the patterns
    // stay in the Java∩RE2 common subset so any engine pair agrees.
    "olap_sequence_match" -> ((s, dir) => {
      import s.implicits._
      val pats = Seq(
        ("funnel_ordered", "v.*c.*p"),
        ("click_purchase_adjacent", "cp"),
        ("starts_with_signup", "^s"),
        ("repeat_purchase", "pp"),
        ("error_mid_funnel", "v[^p]*e[^p]*p"))
        .toDF("pattern_name", "pattern")
      val users = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("sym")))),
          x => x.getField("sym"))).as("s"))
      users.join(broadcast(pats))
        .groupBy("pattern_name", "pattern")
        .agg(sum(when(regexp_like(col("s"), col("pattern")), 1L)
               .otherwise(0L)).as("n_users"),
             (sum(when(regexp_like(col("s"), col("pattern")), 1L)
               .otherwise(0L)).cast("double")
               / count(lit(1)).cast("double")).as("frac"))
        .orderBy("pattern_name")
    }),

    // Kaufman adaptive moving average: EMA whose smoothing follows the
    // efficiency ratio er = |10-day move| / Σ|daily moves| — fast in
    // trends, glacial in chop. ENTIRELY on the integer lattice: er/sc in
    // ppm, (price, sc²) packed into ONE BIGINT (p·2²⁰ + sc2, both fields
    // bounded and non-negative) so the per-series recursion folds a
    // single-value accumulator — the same prefix-fold shape as ts_ema,
    // immune to the DuckDB in-place-struct-accumulator hazard because
    // there is no struct. Day cells per key bound the fold length by
    // horizon, not corpus size.
    "ts_kama" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val w10 = w.rowsBetween(-9, 0)
      val wl = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("p"))
      // per-row smoothing constant is price-only, so it precomputes:
      // scr = er·(fast−slow)+slow with fast = 2/3, slow = 2/31 in ppm
      val sc = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("v", abs(col("p") - lag("p", 1).over(w)))
        .withColumn("mom", abs(col("p") - lag("p", 10).over(w)))
        .withColumn("vol10", sum("v").over(w10))
        .filter(col("rn") >= 11)
        .withColumn("er_ppm", when(col("vol10") > 0,
          expr("(mom * 1000000) div vol10")).otherwise(0L))
        .withColumn("scr", expr("(er_ppm * 602150) div 1000000 + 64516"))
        .withColumn("sc2", expr("(scr * scr) div 1000000"))
        .withColumn("packed", col("p") * 1048576L + col("sc2"))
      sc.withColumn("pl", collect_list(col("packed")).over(wl))
        .withColumn("kama_c", expr(
          "aggregate(slice(pl, 2, greatest(size(pl) - 1, 0)), " +
          "element_at(pl, 1) div 1048576, " +
          "(a, x) -> a + ((x % 1048576) * ((x div 1048576) - a)) " +
          "div 1000000)"))
        .select(col("event_type"), col("dt"), col("p").as("close_c"),
          col("sc2").as("sc_ppm"), col("kama_c"))
        .orderBy("event_type", "dt")
    }),

    // Amihud illiquidity: mean |daily return| per unit of daily traded
    // value — THE price-impact proxy from public market microstructure.
    // ret and illiq live on the ppm lattice (signed div truncates toward
    // zero identically in both engines), the per-type mean is a floor
    // division, and the worst day is an argmax over a packed
    // (illiq, epoch-day) BIGINT so ties break deterministically without
    // composite arg_max.
    "ts_amihud_illiquidity" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("close_c"),
             sum(Exact.cents(col("value"))).as("dv"))
      daily
        .withColumn("prev", lag("close_c", 1).over(w))
        .filter(col("prev").isNotNull && col("prev") > 0 && col("dv") > 0)
        .withColumn("ret_ppm",
          expr("((close_c - prev) * 1000000) div prev"))
        .withColumn("illiq", expr("(abs(ret_ppm) * 1000000) div dv"))
        .withColumn("pk", col("illiq") * 100000L
          + datediff(col("dt"), lit("1970-01-01")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("illiq").as("sum_illiq"),
             max("illiq").as("max_illiq"),
             max_by(col("dt"), col("pk")).as("worst_day"))
        .withColumn("mean_illiq", expr("sum_illiq div n_days"))
        .select("event_type", "n_days", "sum_illiq", "mean_illiq",
                "max_illiq", "worst_day")
        .orderBy("event_type")
    }),

    // Poisson(1) bootstrap — the resampling scheme that actually works
    // distributed (each row draws its replicate weights independently
    // from a hashed uniform; no global permutation, no sampling state).
    // Weights come from the fixed ppm CDF thresholds of Poisson(1), the
    // uniform from the portable 3-step LCG mix (mod-first so the chain
    // never exceeds 2⁶² at any id scale). Replicate TOTALS stay exact
    // BIGINTs; the bootstrap SE spends one IEEE chain on the exact
    // DECIMAL(38,0) replicate moments. 32 replicates ride one explode —
    // a constant 32× map-side expansion, partial-aggregated immediately.
    "sample_poisson_bootstrap" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val m = 2147483647L
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
                Exact.cents(col("value")).as("c"))
        .tracked // census + replicate expansion both scan it
      val reps = ev
        .withColumn("r", explode(sequence(lit(1L), lit(32L))))
        // mod-first: (id % m)·37 + r ≡ id·37 + r (mod m) with identical
        // non-negative b0, but never exceeds 2⁶² at any id scale
        .withColumn("b0", ((col("event_id") % m) * 37L + col("r")) % m)
        .withColumn("h1", (col("b0") * 1103515245L + 12345L) % m)
        .withColumn("hm", (col("h1") * col("h1")) % m)
        .withColumn("u", ((col("hm") * 69069L + 362437L) % m) % 1000000L)
        .withColumn("wt",
          when(col("u") < 367879L, 0L).when(col("u") < 735759L, 1L)
            .when(col("u") < 919699L, 2L).when(col("u") < 980988L, 3L)
            .when(col("u") < 996312L, 4L).when(col("u") < 999380L, 5L)
            .otherwise(6L))
      val totals = reps.groupBy("event_type", "r")
        .agg(sum(col("wt") * col("c")).as("swc"))
      val boot = totals.groupBy("event_type")
        .agg(count(lit(1)).as("n_reps"), sum("swc").as("s1"),
             sum(dec(col("swc")) * dec(col("swc"))).as("s2"))
      val census = ev.groupBy("event_type").agg(sum("c").as("census_total"))
      boot.join(census, "event_type")
        .select(col("event_type"), col("n_reps"), col("census_total"),
          (col("s1").cast("double") / lit(32.0)).as("boot_mean_total"),
          sqrt((dec(lit(32L)) * col("s2") - dec(col("s1")) * dec(col("s1")))
            .cast("double") / lit(992.0)).as("boot_se_total"))
        .orderBy("event_type")
    }),

    // Partition fingerprints: per (type, day) row count, portable
    // LCG-mix checksum of the id set, exact cent total and id bounds —
    // what a 100 TB replication/backfill audit compares across clusters
    // instead of re-reading both copies. Order-free sums only, so the
    // fingerprint is partial-aggregable and layout-independent.
    "dq_partition_checksum" -> ((s, dir) => {
      val m = 2147483647L
      Tables.events(s, dir)
        .withColumn("h1", ((col("event_id") % m) * 1103515245L + 12345L) % m)
        .withColumn("hm", (col("h1") * col("h1")) % m)
        .withColumn("hv", (col("hm") * 69069L + 362437L) % m)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"), sum("hv").as("checksum"),
             sum(Exact.cents(col("value"))).as("sum_c"),
             min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("event_type", "dt")
    }),

    // Mutual k-NN graph over the hyperplane-LSH buckets: top-3 neighbors
    // per vector among same-bucket candidates (keyed window, never the
    // full cross), edge kept only when both endpoints rank each other —
    // the construction k-NN-graph clustering and dedup canopies start
    // from. Recall is bucket-bounded by design (the LSH dial), which is
    // exactly the 100 TB posture.
    "sim_knn_graph" -> ((s, dir) =>
      graft.similarity.HyperplaneLsh
        .knnGraph(Tables.embeddings(s, dir), nPlanes = 4, dim = 64, k = 3)
        .orderBy("vec_a", "vec_b")),

    // CUSUM control chart (both one-sided statistics) against a
    // first-10-day baseline: S⁺ = max(0, S⁺ + d − k), S⁻ symmetric,
    // entirely on the cents lattice with the BRANCH-FREE max
    // (v + |v|) DIV 2 — no CASE inside the fold lambda, the documented
    // DuckDB vectorized-CASE hazard. Two single-state prefix folds (the
    // ts_ema shape) over per-row increments precomputed as columns;
    // allowance k = 2% and alarm h = 10% of baseline. Day cells per key.
    "ts_cusum" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val wl = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("p"))
        .withColumn("rn", row_number().over(w))
        .tracked // baseline aggregate + fold rows both read it
      val base = daily.filter(col("rn") <= 10)
        .groupBy("event_type")
        .agg(expr("sum(p) div 10").as("b10"))
      val inc = daily.filter(col("rn") >= 11)
        .join(base, "event_type")
        .withColumn("k", expr("b10 div 50"))
        .withColumn("h", expr("b10 div 10"))
        .withColumn("dp", col("p") - col("b10") - col("k"))
        .withColumn("dm", col("b10") - col("p") - col("k"))
      val fold = "(a, x) -> ((a + x) + abs(a + x)) div 2"
      inc
        .withColumn("lp", collect_list(col("dp")).over(wl))
        .withColumn("lm", collect_list(col("dm")).over(wl))
        .withColumn("s_plus",
          expr(s"aggregate(lp, 0L, $fold)"))
        .withColumn("s_minus",
          expr(s"aggregate(lm, 0L, $fold)"))
        .select(col("event_type"), col("dt"), col("p").as("close_c"),
          col("s_plus"), col("s_minus"),
          (col("s_plus") > col("h") || col("s_minus") > col("h"))
            .as("alarm"))
        .orderBy("event_type", "dt")
    }),

    // Garman–Klass range volatility on the FixedLog2 lattice: the OHLC
    // estimator 0.5·(ln H/L)² − (2ln2−1)·(ln C/O)² with both log-ratios
    // as exact 2²⁰-scaled BIGINTs (hl = log2fp(H)−log2fp(L)) and the two
    // irrational constants as ppm integers — every per-day term is an
    // exact DECIMAL(38,0), the per-type sum is order-free, and ONE
    // final sqrt/division chain converts to daily bits-volatility.
    // Positive-price filter keeps log2_fp's loud domain guard happy.
    "ts_garman_klass_vol" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max(Exact.cents(col("value"))).as("hc"),
             min(Exact.cents(col("value"))).as("lc"),
             min_by(Exact.cents(col("value")), col("ts")).as("oc"),
             max_by(Exact.cents(col("value")), col("ts")).as("cc"))
        .filter(col("lc") > 0)
      val terms = daily
        .withColumn("hl", L(col("hc")) - L(col("lc")))
        .withColumn("co", L(col("cc")) - L(col("oc")))
        .withColumn("gk", dec(col("hl")) * dec(col("hl")) * lit(500000L)
          - dec(col("co")) * dec(col("co")) * lit(386294L))
      terms.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("gk")).as("gs"))
        .select(col("event_type"), col("n_days"),
          (d(col("gs")) / (d(col("n_days")) * lit(1.099511627776e12)
            * lit(1.0e6))).as("gk_mean_bits2"),
          when(col("gs") > 0,
            sqrt(d(col("gs")) / (d(col("n_days")) * lit(1.099511627776e12)
              * lit(1.0e6)))).as("vol_bits_daily"))
        .orderBy("event_type")
    }),

    // Transition lift: P(b follows a) against independence —
    // lift = c_ab·N / (c_a·c_b) as exact DECIMAL rationals with BOTH a
    // ppm floor form and one IEEE division, over the same consecutive
    // (user-keyed lead) pairs as mine_transition_matrix. The
    // sequence-mining score that separates real funnels from frequency
    // artifacts.
    "mine_transition_lift" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .filter(col("b").isNotNull)
        .select("a", "b")
        .tracked // pair counts + both marginals scan it
      val cab = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val ca = pairs.groupBy("a").agg(count(lit(1)).as("c_a"))
      val cb = pairs.groupBy("b").agg(count(lit(1)).as("c_b"))
      val n = pairs.agg(count(lit(1)).as("n_trans"))
      cab.join(ca, "a").join(cb, "b").crossJoin(broadcast(n))
        .withColumn("lift_ppm", expr(
          "(cast(c_ab as decimal(38,0)) * n_trans * 1000000)" +
          " div (cast(c_a as decimal(38,0)) * c_b)"))
        .withColumn("lift",
          (dec(col("c_ab")) * dec(col("n_trans"))).cast("double")
            / (dec(col("c_a")) * dec(col("c_b"))).cast("double"))
        .select("a", "b", "c_ab", "c_a", "c_b", "n_trans", "lift_ppm",
                "lift")
        .orderBy("a", "b")
    }),

    // 10% trimmed mean per type WITHOUT a row-level rank: cumulative
    // counts over the (type, value) HISTOGRAM cells (keyed window over
    // the value support, never event rows), each cell contributing
    // max(0, overlap of its cumulative range with the kept band) — the
    // robust-location estimate at 100 TB, where sorting rows per key is
    // the thing you must not do.
    "agg_trimmed_mean" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
      val cells = ev.groupBy("event_type", "c")
        .agg(count(lit(1)).as("cnt"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("c")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("s_all"))
      cells
        .withColumn("cum", sum("cnt").over(wc))
        .withColumn("cum_prev", col("cum") - col("cnt"))
        .join(tot, "event_type")
        .withColumn("lo", expr("n div 10"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("n") - col("lo"))
            - greatest(col("cum_prev") + 1L, col("lo") + 1L) + 1L))
        .groupBy("event_type")
        .agg(max("n").as("n"), max("s_all").as("s_all"),
             sum("kept").as("n_trimmed"),
             sum(col("c") * col("kept")).as("t_sum"))
        .select(col("event_type"), col("n"), col("n_trimmed"),
          (col("s_all").cast("double") / col("n").cast("double"))
            .as("mean_c"),
          (col("t_sum").cast("double") / col("n_trimmed").cast("double"))
            .as("trimmed_mean_c"),
          expr("t_sum div n_trimmed").as("trimmed_floor_c"))
        .orderBy("event_type")
    }),

    // Embedding-shape outliers — the broken-vector detector every
    // embedding pipeline runs before indexing (zeroed runs, truncated
    // writes, fp8 blowups all distort how mass spreads over dimensions;
    // the corpus is unit-normalized, so the L2 norm itself carries no
    // signal). Statistic: the L1 mass Σ|qᵢ| of the 127-quantized unit
    // vector — peaked directions score low, diffuse ones high — exact
    // integers via the established quantize convention, per-label
    // moments exact, z the same one-division population form as
    // dq_volume_anomaly, top-10 total-ordered by (|z| desc, vec_id).
    "emb_norm_outliers" -> ((s, dir) => {
      import graft.functions.VecOps
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val e = Tables.embeddings(s, dir)
        .withColumn("norm",
          sqrt(VecOps.dot(col("embedding"), col("embedding"))))
        .filter(col("norm") > 0)
        .withColumn("nq", aggregate(
          transform(col("embedding"), x =>
            abs(round(x.cast("double") / col("norm") * lit(127.0), 0)
              .cast("long"))),
          lit(0L), (a, x) => a + x))
        .select("vec_id", "label", "nq")
        .tracked // moments + z projection both scan it
      val stats = e.groupBy("label")
        .agg(count(lit(1)).as("n"), sum("nq").as("s1"),
             sum(dec(col("nq")) * dec(col("nq"))).as("s2"))
        .withColumn("var_num",
          Exact.checkedLong(dec(col("n")) * col("s2")
            - dec(col("s1")) * dec(col("s1"))))
      e.join(broadcast(stats), "label")
        .filter(col("var_num") > 0)
        .withColumn("z", (col("n") * col("nq") - col("s1")).cast("double")
          / sqrt(col("var_num").cast("double")))
        .select("vec_id", "label", "nq", "z")
        .orderBy(abs(col("z")).desc, col("vec_id"))
        .limit(10)
    }),

    // Butterfly (2×2 biclique) census of the order–part BIPARTITE graph —
    // the bipartite clustering primitive, and the scale-correct way to
    // count co-purchase squares: wedges are generated per ORDER, so the
    // join volume is Σ C(order width, 2) — bounded by basket size, never
    // by part degree (the projection's hub problem that forced degree
    // caps on the unipartite queries). Butterflies = Σ C(co-orders, 2),
    // exact integers end-to-end.
    "graph_butterflies" -> ((s, dir) => {
      val li = graft.olap.GraphFrames.orderPartItems(s, dir)
        .select(col("ok"), col("pk").as("p"))
      val wedges = li.as("a")
        .join(li.as("b"), col("a.ok") === col("b.ok")
          && col("a.p") < col("b.p"))
        .select(col("a.p").as("x"), col("b.p").as("y"))
      wedges.groupBy("x", "y").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_pairs"), sum("cnt").as("n_wedges"),
             sum(expr("cnt * (cnt - 1) div 2")).as("n_butterflies"),
             max("cnt").as("max_copairs"))
    }),

    // Granger-style lead screen: does yesterday's click revenue improve
    // the purchase forecast beyond purchase's own lag? Exact centered
    // moments (day cells, DECIMAL(38,0) cross terms), then ONE fixed
    // IEEE chain solves the 2×2 normal equations and forms the nested-SSE
    // F — the causality triage a metrics warehouse runs before any real
    // model. One aggregate row; nothing here scales with event volume.
    "ts_granger_screen" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(sum(when(col("event_type") === "purchase",
               Exact.cents(col("value"))).otherwise(0L)).as("pc"),
             sum(when(col("event_type") === "click",
               Exact.cents(col("value"))).otherwise(0L)).as("cc"))
      // single-key series: the one-partition window is deliberate and
      // keyed non-foldably (day cells only — see Exact.onePartition)
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("dt"))).orderBy("dt")
      val lagged = daily
        .withColumn("x1", lag("pc", 1).over(wk))
        .withColumn("x2", lag("cc", 1).over(wk))
        .filter(col("x1").isNotNull)
        .select(col("pc").as("y"), col("x1"), col("x2"))
      val mom = lagged.agg(
        count(lit(1)).as("n"), sum("y").as("sy"), sum("x1").as("s1"),
        sum("x2").as("s2"),
        sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
        sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
        sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
        sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
        sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      val c11 = (dec(col("n")) * col("s11") - dec(col("s1")) * dec(col("s1"))).cast("double")
      val c22 = (dec(col("n")) * col("s22") - dec(col("s2")) * dec(col("s2"))).cast("double")
      val c12 = (dec(col("n")) * col("s12") - dec(col("s1")) * dec(col("s2"))).cast("double")
      val c1y = (dec(col("n")) * col("s1y") - dec(col("s1")) * dec(col("sy"))).cast("double")
      val c2y = (dec(col("n")) * col("s2y") - dec(col("s2")) * dec(col("sy"))).cast("double")
      val cyy = (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy"))).cast("double")
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val sseF = cyy - b1 * c1y - b2 * c2y
      val sseR = cyy - (c1y / c11) * c1y
      mom.select(col("n"), b1.as("beta_own_lag"), b2.as("beta_click_lag"),
        sseF.as("sse_full"), sseR.as("sse_restricted"),
        ((sseR - sseF) / (sseF / d(col("n") - 3L))).as("f_stat"))
    }),

    // Simpson's-paradox screen: the (discount → quantity) association
    // judged pooled AND per brand, with only the SIGNS of exact centered
    // covariance numerators compared — signs of integers, so the flip
    // report is bitwise trivially and immune to IEEE noise. The
    // aggregation-bias tripwire every metrics rollup should run before
    // shipping a "discounts don't work" conclusion.
    "agg_simpson_check" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      def covSign(g: DataFrame): DataFrame = g
        .withColumn("cov_num", Exact.checkedLong(
          dec(col("n")) * col("sdq") - dec(col("sd")) * dec(col("sq"))))
        .withColumn("assoc_sign", signum(col("cov_num")).cast("long"))
      val j = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir),
          col("p_partkey") === col("l_partkey"))
        .select(col("p_brand"),
          Exact.cents(col("l_discount")).as("d"),
          col("l_quantity").cast("long").as("q"))
        .tracked // pooled + per-brand moments scan it
      val perBrand = covSign(j.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("d").as("sd"), sum("q").as("sq"),
             sum(dec(col("d")) * dec(col("q"))).as("sdq")))
      val pooled = covSign(j.agg(count(lit(1)).as("n"), sum("d").as("sd"),
          sum("q").as("sq"), sum(dec(col("d")) * dec(col("q"))).as("sdq")))
        .select(col("assoc_sign").as("pooled_sign"))
      perBrand.crossJoin(broadcast(pooled))
        .select(col("p_brand"), col("n"), col("cov_num"),
          col("assoc_sign"), col("pooled_sign"),
          (col("assoc_sign") =!= lit(0L)
            && col("assoc_sign") =!= col("pooled_sign")).as("sign_flip"))
        .orderBy("p_brand")
    }),

    // Image entropy over the REAL PNG decode: 16-bin luminance histogram
    // per image (one raster pass), then Shannon entropy on the FixedLog2
    // lattice — (N·log2fp N − Σ c·log2fp c)/N/2²⁰, the same exact-entropy
    // chain as agg_entropy_by_group — the flat-image / noise-image
    // quality gate a multimodal ingest runs per asset. Decode is
    // per-row local; the entropy is partial-aggregable per image.
    "mm_image_entropy" -> ((s, dir) => {
      import s.implicits._
      val L = graft.functions.FixedLog2.log2_fp _
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nChars) =>
            val w = (1 + id % 8).toInt
            val h = (1 + nChars % 8).toInt
            val (dw, dh, bins) = graft.multimodal.Media.PngCodec
              .decodeHistogram16(graft.multimodal.Media.PngCodec
                .encodeGray(w, h,
                  (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
            (id, dw, dh, bins)
          }
        }
        .toDF("media_id", "width", "height", "bins")
      media
        .select(col("media_id"), col("width"), col("height"),
          explode(col("bins")).as("cnt"))
        .filter(col("cnt") > 0)
        .groupBy("media_id", "width", "height")
        .agg(sum("cnt").as("n_pixels"), count(lit(1)).as("n_bins"),
             sum(col("cnt") * L(col("cnt"))).as("sclog"))
        .select(col("media_id"), col("width"), col("height"),
          col("n_pixels"), col("n_bins"),
          ((col("n_pixels") * L(col("n_pixels")) - col("sclog"))
            .cast("double") / col("n_pixels").cast("double")
            / lit(1048576.0)).as("entropy_bits"))
        .orderBy("media_id")
    }),

    // Partition-level TTL retention: write the events day-partitioned,
    // sweep everything older than the last 10 days as a pure METADATA
    // directory drop (zero data rewrite — what makes retention affordable
    // at 100 TB), then certify the sweep by joining the survivors back
    // against the full per-day source counts. A partition the sweep
    // should have dropped but didn't (or vice versa) fails the oracle.
    "layout_ttl_sweep" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_ttl").toString
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("ts"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("dt"))
      ev.write.mode("overwrite").partitionBy("dt").parquet(base)
      graft.olap.Layout.ttlSweep(s, base, "dt", keepDays = 10)
      val kept = s.read.parquet(base)
        .groupBy(col("dt").cast("string").as("dt"))
        .agg(count(lit(1)).as("n_kept"))
      ev.groupBy("dt").agg(count(lit(1)).as("n_rows"))
        .join(kept, Seq("dt"), "left")
        .select(col("dt"), col("n_rows"),
          when(col("n_kept").isNotNull, lit("kept")).otherwise(lit("dropped"))
            .as("action"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("dt")
    }),

    // Rolling 10-day beta of purchase revenue on click revenue — the
    // windowed-regression form of ts_beta: exact DECIMAL window moments
    // over day cells (w·Sxy−SxSy over w·Sxx−Sx², ONE IEEE division per
    // day). Single joint series ⇒ the deliberate one-partition window,
    // keyed non-foldably (Exact.onePartition) per the house rule; the
    // frame is day cells, horizon-bounded at any volume.
    "ts_rolling_beta" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("dt"))).orderBy("dt")
      val w10 = wk.rowsBetween(-9, 0)
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(sum(when(col("event_type") === "click",
               Exact.cents(col("value"))).otherwise(0L)).as("x"),
             sum(when(col("event_type") === "purchase",
               Exact.cents(col("value"))).otherwise(0L)).as("y"))
      daily
        .withColumn("rn", row_number().over(wk))
        .withColumn("sx", sum("x").over(w10))
        .withColumn("sy", sum("y").over(w10))
        .withColumn("sxx", sum(dec(col("x")) * dec(col("x"))).over(w10))
        .withColumn("sxy", sum(dec(col("x")) * dec(col("y"))).over(w10))
        .filter(col("rn") >= 10)
        .withColumn("var_num", (lit(10L) * col("sxx")
          - dec(col("sx")) * dec(col("sx"))).cast("double"))
        .select(col("dt"), col("x"), col("y"),
          when(col("var_num") > 0,
            (lit(10L) * col("sxy") - dec(col("sx")) * dec(col("sy")))
              .cast("double") / col("var_num")).as("beta_10d"))
        .orderBy("dt")
    }),

    // Low-energy (silence-proxy) window ratio per audio asset: windows
    // whose energy falls below the asset's own mean — silent = e·W < Σe
    // in exact integers, no IEEE threshold. The trim-silence triage step
    // of an audio ingest, riding the same real windowing machinery as
    // mm_audio_window.
    "mm_audio_silence" -> ((s, dir) => {
      val w = graft.multimodal.Media.audioWindows(
          graft.multimodal.Media.asMedia(
            Tables.documents(s, dir).filter(col("doc_id") < 200),
            "doc_id", "text"), windowSize = 64, hop = 32)
        .toDF()
        .tracked // per-media totals + the flag pass both scan it
      val tot = w.groupBy("media_id")
        .agg(count(lit(1)).as("n_windows"),
             sum("energy").as("total_energy"),
             max("energy").as("max_energy"))
      w.join(tot, "media_id")
        .withColumn("is_silent",
          col("energy") * col("n_windows") < col("total_energy"))
        .groupBy("media_id", "n_windows", "total_energy", "max_energy")
        .agg(sum(when(col("is_silent"), 1L).otherwise(0L))
          .as("n_silent"))
        .select("media_id", "n_windows", "n_silent", "total_energy",
                "max_energy")
        .orderBy("media_id")
    }),

    // Top-decile value concentration: what share of each type's total
    // value the top 10% of events carry — the same histogram-overlap
    // machinery as agg_trimmed_mean (cumulative counts over value CELLS,
    // never a row-level rank), share exact in ppm plus one IEEE double.
    "agg_top_decile_share" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
      val cells = ev.groupBy("event_type", "c")
        .agg(count(lit(1)).as("cnt"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("c")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("s_all"))
      cells
        .withColumn("cum", sum("cnt").over(wc))
        .withColumn("cum_prev", col("cum") - col("cnt"))
        .join(tot, "event_type")
        .withColumn("lo", expr("n div 10"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("n"))
            - greatest(col("cum_prev") + 1L, col("n") - col("lo") + 1L)
            + 1L))
        .groupBy("event_type")
        .agg(max("n").as("n"), max("s_all").as("s_all"),
             sum("kept").as("n_top"),
             sum(col("c") * col("kept")).as("top_sum"))
        .select(col("event_type"), col("n"), col("n_top"), col("top_sum"),
          expr("(1000000 * cast(top_sum as decimal(38,0))) div s_all")
            .as("share_ppm"),
          (col("top_sum").cast("double") / col("s_all").cast("double"))
            .as("share"))
        .orderBy("event_type")
    }),

    // Linear counting — the small-cardinality sketch that beats HLL below
    // ~m distinct (the regime where HLL's estimator biases): m = 1024
    // hashed bitmap positions per type, est = m·ln(m/z) with the log on
    // the FixedLog2 lattice (exact BIGINT bits), ONE double multiply by
    // ln 2 at the end. True distinct rides along for the error readout.
    "sketch_linear_counting" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val m = 2147483647L
      val pos = Tables.events(s, dir)
        .withColumn("h1",
          ((col("user_id") % m) * 1103515245L + 12345L) % m)
        .withColumn("hm", (col("h1") * col("h1")) % m)
        .withColumn("p", ((col("hm") * 69069L + 362437L) % m) % 1024L)
        .select(col("event_type"), col("p"), col("user_id"))
        .tracked // occupancy + true-distinct both scan it
      val occ = pos.groupBy("event_type")
        .agg(countDistinct("p").as("occupied"),
             countDistinct("user_id").as("n_true"))
        .withColumn("z", lit(1024L) - col("occupied"))
      occ
        .withColumn("est_bits",
          when(col("z") > 0, lit(1024L) * (L(lit(1024L)) - L(col("z")))))
        .select(col("event_type"), lit(1024L).as("m"), col("z"),
          col("n_true"),
          (col("est_bits").cast("double") * lit(0.6931471805599453)
            / lit(1048576.0)).as("est_lc"))
        .orderBy("event_type")
    }),

    // Reciprocity of the directed transition graph (a→b consecutive
    // event types per user): binary — reciprocated directed edges over
    // all directed edges — and weighted — Σ min(c_ab, c_ba) / Σ c_ab —
    // both exact integers until one ppm floor-div each. The symmetry
    // diagnostic for any directed interaction graph.
    "graph_transition_reciprocity" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .filter(col("b").isNotNull && col("b") =!= col("a"))
        .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
        .tracked // both directions of the reverse join
      val rev = pairs.select(col("a").as("b"), col("b").as("a"),
        col("c_ab").as("c_ba"))
      pairs.join(rev, Seq("a", "b"), "left")
        .agg(count(lit(1)).as("n_directed"),
             sum(when(col("c_ba").isNotNull, 1L).otherwise(0L))
               .as("n_reciprocated"),
             sum("c_ab").as("w_total"),
             sum(least(col("c_ab"), coalesce(col("c_ba"), lit(0L))))
               .as("w_min"))
        .select(col("n_directed"), col("n_reciprocated"),
          expr("(1000000 * n_reciprocated) div n_directed")
            .as("r_binary_ppm"),
          col("w_total"), col("w_min"),
          expr("(1000000 * w_min) div w_total").as("r_weighted_ppm"))
    }),

    // ADF-style unit-root screen per type: regress Δp on (p lag, time
    // index) — the same exact-moment 2×2 solve as ts_granger_screen —
    // and report the lag coefficient's t statistic (a strongly negative
    // t rejects the random-walk null). Every moment is an exact
    // DECIMAL(38,0); the t spends one fixed IEEE chain including the
    // (X'X)⁻¹ diagonal term σ̂²·n·c22/det. Day cells per key.
    "ts_adf_screen" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val rows = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("p"))
        .withColumn("x1", lag("p", 1).over(w))
        .withColumn("x2", row_number().over(w).cast("long"))
        .filter(col("x1").isNotNull)
        .withColumn("y", col("p") - col("x1"))
      val mom = rows.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("y").as("sy"), sum("x1").as("s1"),
        sum("x2").as("s2"),
        sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
        sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
        sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
        sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
        sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      val c11 = (dec(col("n")) * col("s11") - dec(col("s1")) * dec(col("s1"))).cast("double")
      val c22 = (dec(col("n")) * col("s22") - dec(col("s2")) * dec(col("s2"))).cast("double")
      val c12 = (dec(col("n")) * col("s12") - dec(col("s1")) * dec(col("s2"))).cast("double")
      val c1y = (dec(col("n")) * col("s1y") - dec(col("s1")) * dec(col("sy"))).cast("double")
      val c2y = (dec(col("n")) * col("s2y") - dec(col("s2")) * dec(col("sy"))).cast("double")
      val cyy = (dec(col("n")) * col("syy") - dec(col("sy")) * dec(col("sy"))).cast("double")
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val sse = cyy - b1 * c1y - b2 * c2y
      val tStat = b1 / sqrt((sse / (d(col("n")) * d(col("n") - 3L)))
        * d(col("n")) * c22 / det)
      mom.select(col("event_type"), col("n"), b1.as("gamma"),
          b2.as("trend"), tStat.as("t_stat"))
        .orderBy("event_type")
    }),

    // Wald–Wolfowitz runs test on each type's daily up/down sequence —
    // the randomness screen (too few runs = trending, too many =
    // mean-reverting). Runs/n1/n2 are exact integers from keyed lag
    // comparisons (ties dropped, the standard convention); z is one
    // fixed IEEE chain from those integers.
    "ts_runs_test" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val signs = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("p"))
        .withColumn("prev", lag("p", 1).over(w))
        .filter(col("prev").isNotNull && col("p") =!= col("prev"))
        .withColumn("sgn", when(col("p") > col("prev"), 1L).otherwise(-1L))
      val runs = signs
        .withColumn("prev_sgn", lag("sgn", 1).over(w))
        .groupBy("event_type")
        .agg(sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n1"),
             sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n2"),
             (sum(when(col("prev_sgn").isNull
                 || col("sgn") =!= col("prev_sgn"), 1L).otherwise(0L)))
               .as("runs"))
      val n = d(col("n1") + col("n2"))
      val mu = lit(2.0) * d(col("n1")) * d(col("n2")) / n + lit(1.0)
      val vr = (lit(2.0) * d(col("n1")) * d(col("n2"))
        * (lit(2.0) * d(col("n1")) * d(col("n2")) - n)) /
        (n * n * (n - lit(1.0)))
      runs.select(col("event_type"), col("n1"), col("n2"), col("runs"),
          ((d(col("runs")) - mu) / sqrt(vr)).as("z"))
        .orderBy("event_type")
    }),

    // KS uniformity audit of the engine's own LCG spread hash — the
    // self-test any hash-partitioned sampler owes its users: D =
    // max|F̂(u) − u/10⁶| evaluated on the integer lattice at both sides
    // of every occupied cell (the discrete-KS boundary convention), via
    // the global two-level prefix sum — never a single-partition window
    // over the support.
    "agg_hash_uniformity_ks" -> ((s, dir) => {
      val m = 2147483647L
      val cells = Tables.events(s, dir)
        .withColumn("h1", ((col("event_id") % m) * 1103515245L + 12345L) % m)
        .withColumn("hm", (col("h1") * col("h1")) % m)
        .withColumn("u", ((col("hm") * 69069L + 362437L) % m) % 1000000L)
        .groupBy("u").agg(count(lit(1)).as("cnt"))
      val cum = graft.text.Packing.withStreamOffset(
        cells, "u", "cnt", "cum_prev", bucketSize = 10000L)
        .withColumn("cum", col("cum_prev") + col("cnt"))
      val tot = cells.agg(sum("cnt").as("n"))
      cum.crossJoin(broadcast(tot))
        .select(col("n"),
          greatest(
            abs(col("cum") * lit(1000000L) - col("n") * (col("u") + 1L)),
            abs(col("cum_prev") * lit(1000000L) - col("n") * col("u")))
            .as("dn"))
        .groupBy("n").agg(max("dn").as("d_num"))
        .select(col("n"), col("d_num"),
          (col("d_num").cast("double")
            / (col("n").cast("double") * lit(1.0e6))).as("d_stat"),
          ((col("d_num").cast("double")
            / (col("n").cast("double") * lit(1.0e6)))
            * sqrt(col("n").cast("double"))).as("d_sqrt_n"))
    }),

    // The dq_volume_anomaly gate as a STREAMING monitor: per-day counts
    // come from the watermarked tumbling aggregation (the unbounded
    // ingest path), the trailing-7 z runs sink-side on finalized windows
    // — the split a production monitor uses, since an anomaly verdict is
    // only meaningful once its window is final. Streamed counts == batch
    // counts, so the oracle is the batch SQL verbatim.
    "stream_volume_anomaly" -> ((s, dir) =>
      trailing7VolumeGate(
        graft.streaming.EventStream.runTumblingDaily(s, dir)
          .select(col("event_type"), col("date").as("dt"), col("n")))),

    // Power analysis / minimum detectable effect per metric: with this
    // type's variance and a 50/50 split of its current volume, what
    // lift could a two-arm test detect at α = 0.05, power = 0.8?
    // mde = (z_α/2 + z_β)·√(2σ²/n_arm) with the two z's as DEFINED
    // constants (1.96, 0.8416) — variance from exact DECIMAL moments,
    // the mde one fixed IEEE chain. The sizing readout every experiment
    // platform publishes next to its metrics.
    "agg_mde_power" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val stats = Tables.events(s, dir)
        .select(col("event_type"), Exact.cents(col("value")).as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("sc"),
             sum(dec(col("c")) * dec(col("c"))).as("ss"))
        .withColumn("n_arm", expr("n div 2"))
      val v = (dec(col("n")) * col("ss") - dec(col("sc")) * dec(col("sc")))
        .cast("double") / d(col("n") * (col("n") - 1L))
      val mde = lit(1.96 + 0.8416) * sqrt(lit(2.0) * v / d(col("n_arm")))
      stats.select(col("event_type"), col("n"), col("n_arm"),
          (d(col("sc")) / d(col("n")) / lit(100.0)).as("mean_value"),
          (v / lit(10000.0)).as("var_value"),
          (mde / lit(100.0)).as("mde_abs"),
          (mde / (d(col("sc")) / d(col("n")))).as("mde_rel"))
        .orderBy("event_type")
    }),

    // Markov holding times from the self-inclusive transition counts:
    // P(stay) = c_aa/c_a· and the geometric expected dwell
    // E[steps] = c_a·/(c_a·−c_aa), both exact to one ppm floor-div plus
    // one IEEE division — how long a user lingers in each behavioral
    // state, the summary a session model starts from.
    "ts_markov_holding" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .filter(col("b").isNotNull)
        .groupBy("a")
        .agg(count(lit(1)).as("c_total"),
             sum(when(col("b") === col("a"), 1L).otherwise(0L)).as("c_self"))
        .filter(col("c_total") > col("c_self"))
        .select(col("a").as("state"), col("c_total"), col("c_self"),
          expr("(1000000 * c_self) div c_total").as("p_self_ppm"),
          expr("(1000000 * c_total) div (c_total - c_self)")
            .as("hold_steps_ppm"),
          (col("c_total").cast("double")
            / (col("c_total") - col("c_self")).cast("double"))
            .as("hold_steps"))
        .orderBy("state")
    }),

    // Per-source document-length outliers — the corpus-intake screen
    // (truncated scrapes, concatenated pages) as robust MAD flags on
    // n_chars: median and MAD by positional rank (exact, an existing
    // value), the 1.4826 normal-consistency constant as the DEFINED
    // integer 14826/10⁴ so the flag comparison stays on the integer
    // lattice. The agg_mad_outliers machinery pointed at the corpus.
    "dq_doc_length_outliers" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val v = Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .tracked // median, MAD and flag passes scan it
      val n = v.groupBy("source").agg(count(lit(1)).as("n"))
      val med = v
        .withColumn("rn", row_number().over(
          w.partitionBy("source").orderBy("n_chars", "doc_id")))
        .join(broadcast(n), "source")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col("n_chars").as("med_len"))
      val dev = v.join(broadcast(med), "source")
        .withColumn("adev", abs(col("n_chars") - col("med_len")))
      val mad = dev
        .withColumn("rn", row_number().over(
          w.partitionBy("source").orderBy("adev", "doc_id")))
        .join(broadcast(n), "source")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col("adev").as("mad_len"))
      dev.join(broadcast(mad), "source")
        .groupBy("source", "med_len", "mad_len")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("adev") * 10000L > col("mad_len") * 3L * 14826L,
               1L).otherwise(0L)).as("n_outliers"))
        .select("source", "n_docs", "med_len", "mad_len", "n_outliers")
        .orderBy("source")
    }),

    // TwoNN intrinsic-dimension estimate (Facco et al., public method)
    // of the embedding corpus: per point the ratio μ = r₂/r₁ of its two
    // nearest cosine distances, ID = n/Σln μ. Neighbors come from the
    // hyperplane-LSH buckets (per-bucket join — the scale path; a
    // bucket-local 2-NN is the standard lower-bound variant), μ is
    // floored to the ppm lattice from bitwise-identical distance chains,
    // the log runs on the FixedLog2 lattice, and ONE IEEE chain converts
    // bits → nats at the end. The manifold-dimension QA that decides
    // whether an embedding column deserves its width.
    "emb_intrinsic_dim" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val pairs = graft.similarity.HyperplaneLsh
        .bucketPairs(Tables.embeddings(s, dir), nPlanes = 4, dim = 64)
        .withColumn("dist", lit(1.0) - col("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("va").orderBy(col("dist"), col("vb"))
      val two = pairs
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .groupBy("va")
        .agg(max(when(col("rk") === 1, col("dist"))).as("r1"),
             max(when(col("rk") === 2, col("dist"))).as("r2"))
        .filter(col("r1") > 0 && col("r2").isNotNull)
        .withColumn("mu_ppm",
          floor(col("r2") / col("r1") * lit(1000000.0)).cast("long"))
        .filter(col("mu_ppm") > 1000000L)
      two.agg(count(lit(1)).as("n_points"),
          sum(L(col("mu_ppm")) - L(lit(1000000L))).as("denom_bits"))
        .select(col("n_points"), col("denom_bits"),
          (col("n_points").cast("double") * lit(1048576.0)
            / (col("denom_bits").cast("double")
               * lit(0.6931471805599453))).as("id_hat"))
    }),

    // Sequential probability ratio test per metric: is the daily total
    // running at baseline μ₀ or at a 5% lift μ₁? The LLR is kept as the
    // EXACT integer score Σ(2Δμ·x − (μ₁²−μ₀²)) (the 2σ² factor moved to
    // the boundary), baseline moments come from the first 10 days, and
    // the accept/reject boundaries spend one IEEE chain with ln 19 as a
    // DEFINED constant. The always-on alternative to fixed-horizon
    // testing — decisions per day, exact cumulative state.
    "agg_sprt_monitor" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("dt")
      val wcum = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .withColumn("rn", row_number().over(w))
        .tracked // baseline + monitored slice both read it
      val base = daily.filter(col("rn") <= 10)
        .groupBy("event_type")
        .agg(expr("sum(x) div 10").as("mu0"),
             sum(dec(col("x")) * dec(col("x"))).as("ss"),
             sum("x").as("sx"))
        .withColumn("var_num", Exact.checkedLong(
          dec(lit(10L)) * col("ss") - dec(col("sx")) * dec(col("sx"))))
        .withColumn("mu1", col("mu0") + expr("mu0 div 20"))
        .select("event_type", "mu0", "mu1", "var_num")
      val scored = daily.filter(col("rn") >= 11)
        .join(broadcast(base), "event_type")
        .withColumn("term", lit(2L) * (col("mu1") - col("mu0")) * col("x")
          - (col("mu1") * col("mu1") - col("mu0") * col("mu0")))
        .withColumn("cum_score", sum("term").over(wcum))
      // boundary: LLR >= ln 19 ⇔ score >= 2σ²·ln 19, σ² = var_num/90
      val thr = lit(2.0) * (d(col("var_num")) / lit(90.0)) *
        lit(2.9444389791664403)
      scored.select(col("event_type"), col("dt"), col("x"),
          col("cum_score"),
          when(d(col("cum_score")) >= thr, lit("accept_lift"))
            .when(d(col("cum_score")) <= -thr, lit("accept_baseline"))
            .otherwise(lit("continue")).as("decision"))
        .orderBy("event_type", "dt")
    }),

    // Seasonal Mann–Kendall: the trend gate that ignores day-of-week
    // cycles by comparing only same-weekday day pairs — S and the
    // tie-corrected ×18 variance computed per (type, dow) stratum and
    // SUMMED (the Hirsch–Slack form), everything exact BIGINTs until
    // one z chain. Pair volume is Σ_dow C(n_dow, 2) per key — 7× less
    // than plain MK and still horizon-bounded.
    "ts_seasonal_mann_kendall" -> ((s, dir) => {
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum(Exact.cents(col("value"))).as("x"))
        .withColumn("dow", dayofweek(col("dt")).cast("long"))
        .tracked // pair sides + tie census read it
      val a = daily.select(col("event_type"), col("dow"),
        col("dt").as("d_i"), col("x").as("x_i"))
      val b = daily.select(col("event_type"), col("dow"),
        col("dt").as("d_j"), col("x").as("x_j"))
      val sPerType = a.join(b, Seq("event_type", "dow"))
        .filter(col("d_i") < col("d_j"))
        .groupBy("event_type")
        .agg(sum(when(col("x_j") > col("x_i"), 1L)
          .when(col("x_j") < col("x_i"), -1L).otherwise(0L)).as("s_stat"))
      val strata = daily.groupBy("event_type", "dow", "x")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type", "dow")
        .agg(sum("t").as("n_d"),
             sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
               .as("tie18"))
        .groupBy("event_type")
        .agg(sum("n_d").as("n_days"),
             sum(col("n_d") * (col("n_d") - 1) * (col("n_d") * 2 + 5)
               - col("tie18")).as("var18"))
      sPerType.join(strata, "event_type")
        .withColumn("s_adj",
          when(col("s_stat") > 0, col("s_stat") - 1)
            .when(col("s_stat") < 0, col("s_stat") + 1).otherwise(0L))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("var18"),
          (d(col("s_adj")) / sqrt(d(col("var18")) / lit(18.0))).as("z"))
        .orderBy("event_type")
    }),

    // Theil–Sen slope per series, CALENDAR-DAY variant: where the
    // original ts_theil_sen takes IEEE slopes over bar indices, this one
    // measures cents/day over actual date gaps with slopes quantized to
    // the EXACT ppm lattice via the spelled-out floor division (both
    // engines), the median a rank pick over the keyed pair frame. Pair
    // volume is C(n_days, 2) per key — horizon-bounded, never event rows.
    "ts_theil_sen_days" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("c"))
        .withColumn("dn",
          datediff(col("dt"), lit("1970-01-01").cast("date")).cast("long"))
        .tracked // both sides of the pair join
      val a = d.select(col("event_type"), col("c").as("ca"),
        col("dn").as("da"))
      val b = d.select(col("event_type"), col("c").as("cb"),
        col("dn").as("db"))
      val p = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
        .withColumn("num", (col("cb") - col("ca")) * lit(1000000L))
        .withColumn("den", col("db") - col("da"))
        // floor division spelled out in integers (Spark DIV and DuckDB //
        // both truncate toward zero; the pmod makes the numerator exactly
        // divisible, so truncate ≡ floor on both)
        .withColumn("slope_ppm",
          expr("(num - ((num % den) + den) % den) DIV den"))
      p.withColumn("rn",
          row_number().over(W.partitionBy("event_type").orderBy("slope_ppm")))
        .withColumn("np",
          count(lit(1)).over(W.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("np").as("n_pairs"),
             // lower median: the first order statistic with 2·rn ≥ n+1 —
             // deterministic under ties (value-defined, not row-defined)
             min(when(col("rn") * 2 >= col("np") + 1, col("slope_ppm")))
               .as("slope_ppm_med"))
        .orderBy("event_type")
    }),

    // Haar wavelet energy per series and level (1..3 = 2/4/8-day scales)
    // over the first 32 daily closes: detail coefficient per block is the
    // first-half-minus-second-half EXACT cent sum (the unnormalized Haar
    // transform — integers end to end), energy the DECIMAL sum of squares
    // leaving as a checked BIGINT. The multi-scale volatility
    // decomposition a regime dashboard plots; incomplete tail blocks are
    // dropped (count = 2^level), so the transform is well-defined at any
    // series length.
    "ts_haar_energy" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val W = org.apache.spark.sql.expressions.Window
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("c"))
        .withColumn("i", row_number()
          .over(W.partitionBy("event_type").orderBy("dt")).cast("long") - 1)
        .filter(col("i") < 32)
      val lv = d.select(col("event_type"), col("c"), col("i"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("level"))
        .withColumn("blk", expr("i div shiftleft(1, int(level))"))
        .withColumn("sc",
          when(expr("(i div shiftleft(1, int(level) - 1)) % 2") === 0,
            col("c")).otherwise(-col("c")))
      lv.groupBy("level", "event_type", "blk")
        .agg(sum("sc").as("detail"), count(lit(1)).as("m"))
        .filter(col("m") === expr("cast(shiftleft(1, int(level)) as bigint)"))
        .groupBy("event_type", "level")
        .agg(count(lit(1)).as("n_blocks"),
             Exact.checkedLong(sum(dec(col("detail")) * dec(col("detail"))))
               .as("energy"))
        .orderBy("event_type", "level")
    }),

    // Single changepoint by binary segmentation on daily revenue: t*
    // maximizes the between-segment objective S_L²/n_L + S_R²/n_R,
    // quantized to the EXACT integer f_q = ⌊S_L²/n_L⌋ + ⌊S_R²/n_R⌋
    // (DECIMAL squares, one DIV each — quantization error ≤ 2 on a ~1e12
    // objective, deterministic on both engines); the argmax is a keyed
    // rank over (f_q desc, t). Prefix sums come from one keyed window
    // over day cells — horizon-bounded.
    "ts_changepoint_binseg" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val wcum = W.partitionBy("event_type").orderBy("dt")
        .rowsBetween(W.unboundedPreceding, 0)
      val wall = W.partitionBy("event_type")
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum(Exact.cents(col("value"))).as("c"))
        .withColumn("i", row_number()
          .over(W.partitionBy("event_type").orderBy("dt")).cast("long"))
        .withColumn("n", count(lit(1)).over(wall))
        .withColumn("sl", sum("c").over(wcum))
        .withColumn("st", sum("c").over(wall))
      val f = d.filter(col("i") < col("n"))
        .withColumn("fq",
          expr("(cast(sl as decimal(38,0)) * sl) DIV i")
            + expr("(cast(st - sl as decimal(38,0)) * (st - sl)) DIV (n - i)"))
      f.withColumn("rk", row_number().over(
          W.partitionBy("event_type").orderBy(col("fq").desc, col("i"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("i").as("t_star"), col("fq").as("f_q"),
          expr("sl DIV i").as("mean_before_c"),
          expr("(st - sl) DIV (n - i)").as("mean_after_c"))
        .orderBy("event_type")
    }),

    // Sample-ratio-mismatch guardrail: the 1-df χ² of the hash-split arm
    // counts against 50/50 — THE first check an experimentation readout
    // runs before any metric (a biased splitter invalidates everything
    // downstream). Seed reduces mod-first (the documented overflow-safe
    // LCG discipline); χ² numerator exact through DECIMAL, the 3.8415
    // critical compare done in scaled integers so the flag is portable.
    // The fixture's signup split genuinely trips it.
    "agg_srm_check" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val m = 2147483647L
      val arm = ((col("user_id") % m) * 1103515245L + 12345L) % m
      Tables.events(s, dir)
        .withColumn("arm", when(arm % 2 === 0, "a").otherwise("b"))
        .groupBy("event_type")
        .agg(sum(when(col("arm") === "a", 1L).otherwise(0L)).as("na"),
             sum(when(col("arm") === "b", 1L).otherwise(0L)).as("nb"))
        .withColumn("srm_num", Exact.checkedLong(
          dec(col("na") - col("nb")) * dec(col("na") - col("nb"))))
        .withColumn("srm_den", col("na") + col("nb"))
        .withColumn("srm_chi2",
          col("srm_num").cast("double") / col("srm_den").cast("double"))
        .withColumn("srm_flag",
          when(dec(col("srm_num")) * lit(10000L)
                 > dec(col("srm_den")) * lit(38415L), 1L).otherwise(0L))
        .select("event_type", "na", "nb", "srm_num", "srm_den",
          "srm_chi2", "srm_flag")
        .orderBy("event_type")
    }),

    // Peak concurrency report: distinct users per (day, hour) cell, then
    // per-day active hours / peak hourly users / user-hours — the
    // capacity-planning readout. Distinct-per-cell is the only shuffle;
    // cells are horizon-bounded (24/day) regardless of event volume.
    "olap_peak_concurrency" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("dt"),
                 date_trunc("hour", col("ts")).as("hr"))
        .agg(countDistinct("user_id").as("u"))
        .groupBy("dt")
        .agg(count(lit(1)).as("n_active_hours"),
             max("u").as("peak_hourly_users"),
             sum("u").as("user_hours"))
        .orderBy("dt")),

    // Hapax-legomena share per language: the vocabulary-richness /
    // boilerplate tripwire next to Heaps' law — a corpus whose hapax
    // share collapses is template-flooded. Exact ppm floor division.
    "text_hapax_ratio" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokens("text")).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("tf"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_types"),
             sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("hapax_ppm", expr("(1000000 * n_hapax) DIV n_types"))
        .orderBy("lang")),

    // Ingest-order vs event-time certification: timestamp regressions per
    // type along the event_id sequence. The fixture is CLEAN (zero
    // regressions at every SF) and that certification is the point —
    // like the referential-integrity audit, the value is the proved
    // invariant plus a counter that a spec proves actually counts.
    "dq_ts_monotonicity" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      Tables.events(s, dir)
        .withColumn("pts", lag(col("ts"), 1)
          .over(W.partitionBy("event_type").orderBy("event_id")))
        .filter(col("pts").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_checked"),
             sum(when(col("ts") < col("pts"), 1L).otherwise(0L))
               .as("n_regressions"))
        .withColumn("regression_ppm",
          expr("(1000000 * n_regressions) DIV n_checked"))
        .orderBy("event_type")
    }),

    // Inter-visit gap per series: median and p90 of the minutes between a
    // user's consecutive same-type events — rank picks over the (type,
    // gap-minute) HISTOGRAM (weighted-median discipline: cells, never a
    // row-level global rank), gaps from one user-keyed lag.
    "olap_intervisit_gap" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val g = Tables.events(s, dir)
        .withColumn("pts", lag(col("ts"), 1).over(
          W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")))
        .filter(col("pts").isNotNull)
        .select(col("event_type"),
          expr("(unix_micros(ts) - unix_micros(pts)) DIV 60000000")
            .as("gap_min"))
      val wc = W.partitionBy("event_type").orderBy("gap_min")
        .rowsBetween(W.unboundedPreceding, 0)
      g.groupBy("event_type", "gap_min").agg(count(lit(1)).as("m"))
        .withColumn("cum", sum("m").over(wc))
        .withColumn("n", sum("m").over(W.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("n").as("n_gaps"),
             min(when(col("cum") * 2 >= col("n") + 1, col("gap_min")))
               .as("median_gap_min"),
             min(when(col("cum") * 10 >= col("n") * 9, col("gap_min")))
               .as("p90_gap_min"))
        .orderBy("event_type")
    }),

    // Per-bit balance of the corpus simhash — the dedup-health sibling of
    // the sampler-hash KS audit: a biased bit halves banding entropy and
    // floods buckets. Imbalance 2·n_set − n, the 3.1σ critical compare in
    // scaled integers ((2s−n)²·100 > n·961) so the flag is portable.
    "dedup_simhash_bit_balance" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      Tables.documents(s, dir)
        .select(SimHash.simhash32(col("text")).as("simhash"))
        .select(col("simhash"),
          explode(sequence(lit(0L), lit(31L))).as("bit"))
        .groupBy("bit")
        .agg(sum(expr("(simhash div shiftleft(1, int(bit))) % 2"))
               .as("n_set"),
             count(lit(1)).as("n_docs"))
        .withColumn("imbalance", col("n_set") * 2 - col("n_docs"))
        .withColumn("biased_flag",
          when(dec(col("imbalance")) * dec(col("imbalance")) * lit(100L)
                 > dec(col("n_docs")) * lit(961L), 1L).otherwise(0L))
        .select("bit", "n_set", "n_docs", "imbalance", "biased_flag")
        .orderBy("bit")
    }),

    // G-test of value-mix homogeneity: are the three fixed value buckets
    // ($0-75 / 75-150 / 150+) distributed identically across event types?
    // The log-likelihood-ratio sibling of agg_chi2_contingency, and a
    // FixedLog2 showcase: each cell's O·ln(O·N/(R·C)) term is the exact
    // integer O·(log2fp(O·N) − log2fp(R·C)), decimal-summed order-free;
    // the df=8 critical compare happens on the same lattice
    // (crit_q = ⌊15.507/(2ln2)·2²⁰⌋ = 11729304) so the flag is portable.
    // 15 cells by construction — every frame after the first groupBy is
    // bounded, and the 1-row total attaches via broadcast.
    "agg_g_test" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val L = graft.functions.FixedLog2.log2_fp _
      val c = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy(col("event_type"),
                 least(lit(2L), expr("cc DIV 7500")).as("vb"))
        .agg(count(lit(1)).as("o")).tracked
      val r = c.groupBy("event_type").agg(sum("o").as("rt"))
      val k = c.groupBy("vb").agg(sum("o").as("ct"))
      val n = c.agg(sum("o").as("nt"))
      c.join(broadcast(r), "event_type").join(broadcast(k), "vb")
        .crossJoin(broadcast(n))
        .withColumn("term",
          dec(col("o")) * dec(L(col("o") * col("nt")) -
                              L(col("rt") * col("ct"))))
        .agg(max("nt").as("n_events"), count(lit(1)).as("n_cells"),
             sum("term").cast("long").as("g_scaled"))
        .select(col("n_events"), col("n_cells"), col("g_scaled"),
          lit(8L).as("df"),
          (col("g_scaled").cast("double") * lit(1.3862943611198906)
            / lit(1048576.0)).as("g_stat"),
          when(col("g_scaled") > lit(11729304L), 1L).otherwise(0L)
            .as("reject_flag"))
    }),

    // Poisson rate-shift guardrail: per type, first-half vs second-half
    // event counts against their day exposures — the conditional-binomial
    // score test (n1·E − n·e1)²/(n·e1·e2) vs χ²(1), cross-multiplied into
    // one exact integer compare (10⁴·num² > 38415·den) so the flag is
    // portable. The global date bounds attach as a 1-row broadcast.
    "agg_poisson_rate_test" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("d")).tracked
      val b = ev.agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("mn"),
          date_add(col("mn"),
            ((datediff(col("mx"), col("mn")) + 1) / 2)
              .cast("int")).as("mid"), col("mx"))
      ev.crossJoin(broadcast(b))
        .groupBy("event_type")
        .agg(sum(when(col("d") < col("mid"), 1L).otherwise(0L)).as("n1"),
             sum(when(col("d") >= col("mid"), 1L).otherwise(0L)).as("n2"),
             datediff(min("mid"), min("mn")).cast("long").as("e1"),
             (datediff(min("mx"), min("mid")) + 1).cast("long").as("e2"))
        .withColumn("num", col("n1") * (col("e1") + col("e2")) -
                           (col("n1") + col("n2")) * col("e1"))
        .withColumn("den", (col("n1") + col("n2")) * col("e1") * col("e2"))
        .select(col("event_type"), col("n1"), col("n2"), col("e1"),
          col("e2"),
          expr("(10000 * n1 * e2) DIV (n2 * e1)").as("rate_ratio_q4"),
          expr("""CAST((CAST(num AS DECIMAL(38,0)) * num * 10000) DIV den
                  AS BIGINT)""").as("score_q4"),
          when(expr("CAST(num AS DECIMAL(38,0)) * num * 10000") >
               expr("CAST(den AS DECIMAL(38,0)) * 38415"), 1L)
            .otherwise(0L).as("rate_shift_flag"))
        .orderBy("event_type")
    }),

    // Tukey HSD post-hoc: after the one-way ANOVA, which of the 10 type
    // pairs actually differ in mean value? Means quantized to the q8 cents
    // lattice (⌊256·S/n⌋), within-group SS to ⌊S²/n⌋ cells — the
    // statistic is DEFINED on those lattices (the kruskal discipline) so
    // both engines compare identical integers: 100·Δq²·(N−k)·2·nₐn_b vs
    // 1488·2¹⁶·SSW·(nₐ+n_b), q²(5,∞)=14.88 truncated at 2dp; the q4 ratio
    // of the two sides carries continuous signal beside the flag. The
    // 5-row stats self-join and 1-row totals combine are bounded
    // broadcasts (allowlisted BNLJ shapes).
    "agg_tukey_hsd" -> ((s, dir) => {
      val g = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cc").as("s"),
             sum(expr("CAST(cc AS DECIMAL(38,0)) * cc")).as("ss")).tracked
      val t = g.agg(sum("n").cast("long").as("nn"),
                    count(lit(1)).as("k"),
                    sum(expr("ss - (CAST(s AS DECIMAL(38,0)) * s) DIV n"))
                      .cast("long").as("ssw_q"))
      val a = g.select(col("event_type").as("type_a"), col("n").as("n_a"),
                       col("s").as("s_a"))
      val b = g.select(col("event_type").as("type_b"), col("n").as("n_b"),
                       col("s").as("s_b"))
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .crossJoin(broadcast(t))
        .withColumn("dq", expr("(256 * s_a) DIV n_a - (256 * s_b) DIV n_b"))
        .withColumn("lhs", expr(
          "CAST(100 AS DECIMAL(38,0)) * dq * dq * (nn - k) * 2 * n_a * n_b"))
        .withColumn("rhs", expr(
          "CAST(1488 AS DECIMAL(38,0)) * 65536 * ssw_q * (n_a + n_b)"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("dq").as("mean_diff_q8"),
          expr("CAST((CAST(10000 AS DECIMAL(38,0)) * lhs) DIV rhs AS BIGINT)")
            .as("hsd_ratio_q4"),
          when(col("lhs") > col("rhs"), 1L).otherwise(0L).as("hsd_flag"))
        .orderBy("type_a", "type_b")
    }),

    // Systematic time-spaced thinning: within each (type, day) cell, rank
    // by (ts, event_id) and keep every 20th row at offset 7 — the
    // even-spacing downsample a hash split can't give. Windows are keyed
    // by day cell so no partition outgrows a day at any volume; the
    // report is per-type kept counts with id/cents checksums.
    "sample_systematic" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val o = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .withColumn("r", row_number().over(
          W.partitionBy(col("event_type"), to_date(col("ts")))
            .orderBy("ts", "event_id")))
      val tot = o.groupBy("event_type").agg(count(lit(1)).as("n_total"))
      val kept = o.filter(col("r") % 20 === 7)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), sum("event_id").as("id_checksum"),
             sum("cc").as("cents_kept"))
      tot.join(kept, "event_type")
        .select("event_type", "n_total", "n_kept", "id_checksum",
                "cents_kept")
        .orderBy("event_type")
    }),

    // Ornstein-Uhlenbeck mean-reversion half-life per type: AR(1) slope of
    // the daily cents totals on the q16 lattice (φ_q16 = ⌊2¹⁶·(nΣxy −
    // ΣxΣy)/(nΣx² − (Σx)²)⌋, exact decimal moments), then half-life
    // −ln2/ln|φ| = 2²⁰/(16·2²⁰ − log2fp(|φ|_q16)) on the FixedLog2
    // lattice, q8 — integers end to end, defined only for 0 < |φ| < 1.
    // Day cells bound every frame; the lag window is keyed per type.
    "ts_ou_halflife" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val L = graft.functions.FixedLog2.log2_fp _
      val d = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum("cc").as("x"))
      d.withColumn("px",
          lag(col("x"), 1).over(W.partitionBy("event_type").orderBy("dt")))
        .filter(col("px").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(expr("CAST(x AS DECIMAL(38,0)) * px")).as("sxy"),
             sum("x").as("sx"), sum("px").as("sp"),
             sum(expr("CAST(px AS DECIMAL(38,0)) * px")).as("spp"))
        .withColumn("phi_q16", expr(
          """CAST((65536 * (CAST(n AS DECIMAL(38,0)) * sxy -
             CAST(sx AS DECIMAL(38,0)) * sp)) DIV
             (CAST(n AS DECIMAL(38,0)) * spp -
              CAST(sp AS DECIMAL(38,0)) * sp) AS BIGINT)"""))
        .withColumn("aphi", abs(col("phi_q16")))
        .withColumn("lphi", when(col("aphi") >= 1L, L(col("aphi"))))
        .select(col("event_type"), col("n"), col("phi_q16"),
          when(col("aphi").between(1L, 65535L),
            expr("268435456 DIV (16777216 - lphi)"))
            .as("halflife_q8"),
          when(col("aphi").between(1L, 65535L), 1L).otherwise(0L)
            .as("reverting_flag"))
        .orderBy("event_type")
    }),

    // Cohen's kappa inter-labeler agreement between the two cheap length
    // labelings every curation pipeline accumulates (char-class terciles
    // vs word-count terciles): κ = (N·ΣOᵢᵢ − ΣRᵢCᵢ)/(N² − ΣRᵢCᵢ), exact
    // integers through one final IEEE division. The contingency is ≤ 9
    // cells after the first groupBy, so margins and totals are bounded
    // 1-row broadcasts (allowlisted scalar combines).
    "agg_cohens_kappa" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val words = length(col("text")) -
        length(regexp_replace(col("text"), lit(" "), lit(""))) + 1
      val l = Tables.documents(s, dir).select(
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L).as("la"),
        when(words < 40, 0L).when(words < 69, 1L).otherwise(2L).as("lb"))
      val o = l.groupBy("la", "lb").agg(count(lit(1)).as("n")).tracked
      val tot = o.agg(sum("n").cast("long").as("n_total"),
        sum(when(col("la") === col("lb"), col("n")).otherwise(0L))
          .cast("long").as("n_agree"))
      val r = o.groupBy("la").agg(sum("n").as("rn"))
      val k = o.groupBy("lb").agg(sum("n").as("cn"))
      val chance = r.join(k, col("la") === col("lb"))
        .agg(Exact.checkedLong(sum(dec(col("rn")) * dec(col("cn"))))
          .as("chance"))
      tot.crossJoin(broadcast(chance))
        .select(col("n_total"), col("n_agree"), col("chance"),
          Exact.checkedLong(dec(col("n_total")) * dec(col("n_agree"))
            - dec(col("chance"))).as("kappa_num"),
          Exact.checkedLong(dec(col("n_total")) * dec(col("n_total"))
            - dec(col("chance"))).as("kappa_den"))
        .withColumn("kappa", col("kappa_num").cast("double")
          / col("kappa_den").cast("double"))
    }),

    // Stationary distribution of the user-journey Markov chain: three q16
    // power-iteration steps π′ⱼ = Σᵢ (πᵢ·nᵢⱼ) div rᵢ over the transition
    // counts — integer floor-division per term on both engines, so the
    // iterate is DEFINED on the lattice and bitwise portable. The chain is
    // k×k (k = event types) after one user-keyed lead window, so every
    // iteration frame is bounded and broadcast; the normalizer is the
    // allowlisted 1-row combine.
    "mine_markov_stationary" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = Tables.events(s, dir)
        .select(col("event_type").as("e_from"),
          lead(col("event_type"), 1).over(W).as("e_to"))
        .filter(col("e_to").isNotNull)
      val p = pairs.groupBy("e_from", "e_to").agg(count(lit(1)).as("n"))
      val t = p.groupBy("e_from").agg(sum("n").cast("long").as("row_n"))
      val pt = p.join(t, "e_from").tracked // k² rows, read 3×
      val st = p.select(col("e_from").as("event_type")).distinct().tracked
      var pi = st.select(col("event_type"), lit(65536L).as("v"))
      for (_ <- 1 to 3) {
        val mass = broadcast(pt)
          .join(broadcast(pi),
            pi("event_type") === pt("e_from"))
          .select(col("e_to"), expr("(v * n) DIV row_n").as("m"))
          .groupBy(col("e_to")).agg(sum("m").cast("long").as("mv"))
        pi = st.join(mass, st("event_type") === mass("e_to"), "left")
          .select(st("event_type"), coalesce(col("mv"), lit(0L)).as("v"))
      }
      val z = pi.agg(sum("v").cast("long").as("total"))
      pi.crossJoin(broadcast(z))
        .select(col("event_type"), col("v").as("pi_q16"),
          (col("v").cast("double") / col("total").cast("double"))
            .as("pi_share"))
        .orderBy("event_type")
    }),

    // Adamic-Adar link prediction on the co-purchase graph: the
    // hub-discounted sibling of jaccard_links — AA(x,y) = Σ_z 1/log d(z)
    // over common neighbors z, each reciprocal-log an exact q20 integer
    // ⌊2⁴⁰/log2fp(d)⌋ (the subtract-the-remainder form keeps the division
    // exact in both engines; ln vs log2 is a constant factor that never
    // reorders scores). Same degree-capped wedge generation as the other
    // link predictors; deterministic (aa desc, x, y) top-20 boundary.
    "graph_adamic_adar" -> ((s, dir) => {
      val cap = 64L
      val L = graft.functions.FixedLog2.log2_fp _
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      val sym = e.select(col("u").as("c"), col("v").as("x"))
        .unionAll(e.select(col("v").as("c"), col("u").as("x")))
      val deg = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .select(col("n").as("c"), col("d").as("dc"))
      // wedge centers have dc >= 2 by construction, so log2fp(dc) >= 2^20
      // and the per-center term is exact: 2^40 minus its remainder mod L
      // divides L exactly — the double division below is then lossless.
      val term = deg.filter(col("dc") <= cap && col("dc") >= 2L)
        .withColumn("lg", L(col("dc")))
        .select(col("c"),
          ((lit(1099511627776L) - pmod(lit(1099511627776L), col("lg")))
            / col("lg")).cast("long").as("aa_term"))
      val capped = sym.join(term, Seq("c")).tracked
      capped.as("s1")
        .join(capped.as("s2"), Seq("c"))
        .filter(col("s1.x") < col("s2.x"))
        .select(col("s1.x").as("x"), col("s2.x").as("y"),
          col("s1.aa_term").as("aa_term"))
        .groupBy("x", "y")
        .agg(count(lit(1)).as("cn"), sum("aa_term").as("aa_q20"))
        .join(e, col("x") === col("u") && col("y") === col("v"), "leftanti")
        .select(col("x"), col("y"), col("cn"), col("aa_q20"),
          (col("aa_q20").cast("double") / lit(1048576.0)).as("adamic_adar"))
        .orderBy(col("aa_q20").desc, col("x"), col("y"))
        .limit(20)
    }),

    // North-star multimodal: DC-removed zero-crossing rate over the same
    // 64/32 overlapping sample windows as mm_audio_window — the voicing /
    // spectral-tilt feature beside energy in every VAD front-end. Exact
    // integer DC removal (ns·b[j] vs window sum), strict sign-change
    // count; row-local flatMap, zero shuffle.
    "mm_audio_zcr" -> ((s, dir) =>
      graft.multimodal.Media.audioZcr(
          graft.multimodal.Media.asMedia(
            Tables.documents(s, dir).filter(col("doc_id") < 200),
            "doc_id", "text"), windowSize = 64, hop = 32)
        .toDF()
        .withColumn("zcr", when(col("n_samples") >= 2L,
          col("crossings").cast("double")
            / (col("n_samples") - 1L).cast("double")))
        .orderBy("media_id", "window_idx")),

    // Hubness census of the embedding space: the k-occurrence histogram
    // N_k(x) = how many vectors list x in their directed bucket-bounded
    // top-3 neighbor lists. Hubs (N_k ≫ k) poison ANN recall and dedup
    // canopies; antihubs (N_k = 0, kept explicit via the left join) are
    // unreachable — this is the standard diagnostic for both, over the
    // same LSH candidate generation as every other sim_* query.
    "emb_hubness" -> ((s, dir) =>
      graft.similarity.HyperplaneLsh
        .kOccurrence(Tables.embeddings(s, dir), nPlanes = 4, dim = 64, k = 3)
        .groupBy("n_k").agg(count(lit(1)).as("n_vectors"))
        .orderBy("n_k")),

    // EXACT sliding 7-day distinct users (WAU) per day — the window-
    // distinct that has no direct operator anywhere: re-expressed as the
    // first-in-window difference array. A user-day (d, prev) is the
    // user's first active day inside windows ending e ∈ [max(d, prev+7),
    // d+6]; emitting +1/−1 at the range bounds and prefix-summing the
    // (bounded, ~90-row) day axis gives the exact count with ONE user-day
    // dedup shuffle + ONE keyed lag window — never a day×history rescan
    // or an explode-7 re-dedup. The day-axis cumulative runs on the
    // deliberate onePartition key (dimension-sized frame).
    "olap_wau_sliding_distinct" -> ((s, dir) =>
      graft.olap.SlidingDistinct.perDay(Tables.events(s, dir),
          col("user_id"), to_date(col("ts")), windowDays = 7)
        .withColumnRenamed("n_distinct", "wau")
        .orderBy("day")),

    // DAU/MAU stickiness per day — "what share of the monthly audience
    // shows up daily?", the engagement ratio every growth dashboard
    // tracks. DAU is one per-day distinct; MAU is the 30-day sliding
    // distinct through the SAME SlidingDistinct difference-array operator
    // as WAU (one operator, every window length), exact at any scale.
    "olap_dau_mau_stickiness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mau = graft.olap.SlidingDistinct.perDay(ev,
          col("user_id"), to_date(col("ts")), windowDays = 30)
        .withColumnRenamed("n_distinct", "mau")
      val dau = ev.select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
        .groupBy("d").agg(count(lit(1)).as("dau"))
      mau.join(dau, mau("day") === dau("d"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("mau"),
          when(col("mau") > 0, coalesce(col("dau"), lit(0L)).cast("double")
            / col("mau").cast("double")).as("stickiness"))
        .orderBy("day")
    }),

    // Last-touch attribution: for every purchase, the user's most recent
    // strictly-prior non-purchase event is the credited channel — ONE
    // keyed window with an (unbounded, −1) frame and an ignore-nulls
    // last(), never a self-join against history. Purchases with no prior
    // touch stay explicit as 'none'; lag sums are exact integer seconds.
    "olap_attribution_lasttouch" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("ts"), expr("unix_micros(ts)").as("us"))
      e.withColumn("channel",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(W))
        .withColumn("ch_us",
          last(when(col("event_type") =!= "purchase", col("us")),
            ignoreNulls = true).over(W))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("channel"), lit("none")).as("channel"),
          when(col("channel").isNotNull,
            expr("(us - ch_us) DIV 1000000")).as("lag_s"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          coalesce(sum("lag_s"), lit(0L)).as("lag_seconds_sum"))
        .withColumn("avg_lag_seconds",
          when(col("channel") =!= "none",
            col("lag_seconds_sum").cast("double")
              / col("n_purchases").cast("double")))
        .orderBy("channel")
    }),

    // Largest-connected-component share of the co-purchase graph — the
    // connectivity certification run before any graph algorithm is
    // trusted (a fragmented graph silently voids centrality/propagation
    // results). Reuses the dedup suite's pointer-jumping connected
    // components (log-round convergence, pre-partitioned edge cache) on
    // the graph edge frame; the census is component-sized, not edge-sized.
    "graph_lcc_share" -> ((s, dir) => {
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      graft.dedup.Components.canonicalLabels(e, "u", "v")
        .groupBy("canonical_id").agg(count(lit(1)).as("sz"))
        .agg(sum("sz").cast("long").as("n_nodes"),
          count(lit(1)).as("n_components"),
          max("sz").as("lcc_size"))
        .select(col("n_nodes"), col("n_components"), col("lcc_size"),
          (col("lcc_size").cast("double") / col("n_nodes").cast("double"))
            .as("lcc_share"))
    }),

    // Delete-one-DAY jackknife variance of the per-type mean value — the
    // grouped-resampling SE that respects within-day correlation (the
    // i.i.d. formula understates it). Leave-one-out means on the q10
    // lattice θᵢ = ⌊2¹⁰(S−sᵢ)/(n−nᵢ)⌋, then the (d−1)(dΣθ²−(Σθ)²)/d²
    // spread with decimal-exact moments — integers end to end, one final
    // sqrt. Day cells bound every frame; the per-type totals broadcast.
    "agg_jackknife_variance" -> ((s, dir) => {
      val g = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("ni"), sum("cc").as("si"))
      val t = g.groupBy("event_type")
        .agg(sum("ni").cast("long").as("n"), sum("si").cast("long").as("s"))
      val th = g.join(broadcast(t), "event_type")
        .select(col("event_type"),
          expr("(1024 * (s - si)) DIV (n - ni)").as("theta"))
      th.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("theta").cast("long").as("st"),
          sum(expr("CAST(theta AS DECIMAL(38,0)) * theta")).as("stt"))
        .join(broadcast(t), "event_type")
        // the θ-spread core leaves the decimal lattice as a checked
        // BIGINT BEFORE the final division: DuckDB's DECIMAL `//`
        // ROUNDS (measured: N/900 = x.74 gave x+1) where BIGINT `//`
        // truncates like Spark's DIV — and θ is mean-scaled, so the
        // core is BIGINT-safe at any data volume
        .withColumn("core", Exact.checkedLong(expr(
          "n_days * stt - CAST(st AS DECIMAL(38,0)) * st")))
        .select(col("event_type"), col("n_days"),
          expr("(1024 * s) DIV n").as("mean_q10"),
          expr("((n_days - 1) * core) DIV (n_days * n_days)")
            .as("jk_var_num_q20"),
          (sqrt(expr("((n_days - 1) * core) DIV (n_days * n_days)")
            .cast("double")) / lit(1024.0)).as("jk_se"))
        .orderBy("event_type")
    }),

    // Global path-motif census: nodes, edges, wedges, triangles and open
    // 3-paths in one report — P₃ = Σ_e (dᵤ−1)(dᵥ−1) − 3T needs only the
    // pinned degree frame joined back to edges (never a path
    // materialization), and T reuses the shared compact-forward closure.
    // The motif ratios are the graph's shape fingerprint (tree-like vs
    // clustered) at any scale.
    "graph_path3_census" -> ((s, dir) => {
      val G = graft.olap.GraphFrames
      val e = G.coPurchaseEdges(s, dir)
      val deg = G.coPurchaseDegrees(s, dir)
      val base = graft.olap.Triangles.stats(e, deg,
        G.coPurchaseOriented(s, dir), G.coPurchaseAdjacency(s, dir))
      val p3 = e
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .agg(sum((col("du") - 1) * (col("dv") - 1)).as("pp"))
      base.crossJoin(broadcast(p3))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          (col("pp") - lit(3L) * col("n_triangles")).as("n_path3"))
    }),

    // Historical VaR(5%) + CVaR (expected shortfall) per series: the exact
    // positional ⌈0.05n⌉-th worst q20 daily return and the exact mean of
    // the tail — rank picks over keyed windows (ties at the boundary are
    // value-equal, so every output is order-free), integer sums until the
    // final divisions. The risk pair every returns pipeline reports.
    "ts_var_cvar" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val bars = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("date"))
        .agg(max_by(Exact.cents(col("value")), col("ts")).as("c"))
      val rets = bars
        .withColumn("prev", lag(col("c"), 1).over(
          W.partitionBy("event_type").orderBy("date")))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          floor((col("c") - col("prev")).cast("double")
            / col("prev").cast("double") * lit(1048576.0))
            .cast("long").as("x"))
      val ranked = rets
        .withColumn("rn", row_number().over(
          W.partitionBy("event_type").orderBy("x")))
        .withColumn("n", count(lit(1)).over(W.partitionBy("event_type")))
        .withColumn("kk", expr("(n * 5 + 99) DIV 100"))
      ranked.filter(col("rn") <= col("kk"))
        .groupBy("event_type")
        .agg(max("n").as("n_days"), max("kk").as("n_tail"),
          max("x").as("var_q20"), sum("x").as("tail_sum"))
        .select(col("event_type"), col("n_days"), col("n_tail"),
          col("var_q20"),
          (col("var_q20").cast("double") / lit(1048576.0)).as("var_5pct"),
          (col("tail_sum").cast("double") / col("n_tail").cast("double")
            / lit(1048576.0)).as("cvar_5pct"))
        .orderBy("event_type")
    }),

    // Truss support: per co-purchase edge, the number of triangles through
    // it — the edge-strength measure k-truss decomposition peels on. The
    // shared compact-forward closure emits each triangle ONCE; exploding
    // its three canonical edges and counting is 3·T rows (linear in
    // triangles, never wedges), left-joined back so support-0 edges stay
    // explicit. Output is the support histogram — the truss profile.
    "graph_truss_support" -> ((s, dir) => {
      val G = graft.olap.GraphFrames
      val e = G.coPurchaseEdges(s, dir)
      val adj = G.coPurchaseAdjacency(s, dir)
      val tris = G.coPurchaseOriented(s, dir)
        .join(adj.select(col("a"), col("nbrs").as("na")), Seq("a"))
        .join(adj.select(col("a").as("b"), col("nbrs").as("nb")), Seq("b"))
        .select(col("a"), col("b"),
          explode(array_intersect(col("na"), col("nb"))).as("w"))
      val sup = tris.select(explode(array(
          struct(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v")),
          struct(least(col("a"), col("w")).as("u"),
            greatest(col("a"), col("w")).as("v")),
          struct(least(col("b"), col("w")).as("u"),
            greatest(col("b"), col("w")).as("v")))).as("ed"))
        .select(col("ed.u").as("u"), col("ed.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      e.join(sup, Seq("u", "v"), "left")
        .select(coalesce(col("support"), lit(0L)).as("support"))
        .groupBy("support").agg(count(lit(1)).as("n_edges"))
        .orderBy("support")
    }),

    // Randomization (permutation) test for the purchase-vs-rest value
    // difference: 64 deterministic sign-splits from the spread-hash chain,
    // statistic d = |n·S₁ − n₁·S| (zero-mean under exchangeability),
    // DECIMAL-exact per split, p̂ = (#{|d_p| ≥ |d_obs|}+1)/65. ONE pass:
    // the 64 re-labelings are gated sums inside a single wide partial
    // aggregation — never 64 scans and never an explode — which is the
    // only shape that survives 100 TB. Monte-Carlo over fixed hash splits,
    // so reruns, retries and the oracle all see identical permutations.
    "agg_permutation_test" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val h = Tables.events(s, dir).select(
        col("event_type"), Exact.cents(col("value")).as("cc"),
        graft.olap.Sketch.spreadHash(col("event_id")).as("h3"))
      def bit(p: Int) = expr(
        s"((h3 * 1000003 + ${p * 7919 + 12345}) % 2147483647 >> 7) & 1")
      val base = Seq(
        count(lit(1)).as("n"), sum(col("cc")).as("s"),
        sum(when(col("event_type") === "purchase", col("cc"))
          .otherwise(0L)).as("s_obs"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_obs"))
      val perms = (0 until 64).flatMap { p =>
        Seq(sum(when(bit(p) === 1, col("cc")).otherwise(0L)).as(s"s$p"),
            sum(when(bit(p) === 1, 1L).otherwise(0L)).as(s"m$p"))
      }
      val agg = h.agg((base ++ perms).head, (base ++ perms).tail: _*)
      val dObs = abs(dec(col("n")) * dec(col("s_obs"))
        - dec(col("n_obs")) * dec(col("s")))
      val ge = (0 until 64).map { p =>
        when(abs(dec(col("n")) * dec(col(s"s$p"))
          - dec(col(s"m$p")) * dec(col("s"))) >= dObs, 1L).otherwise(0L)
      }.reduce(_ + _)
      agg.select(col("n").as("n_events"), col("n_obs").as("n_treat"),
        Exact.checkedLong(dObs).as("d_obs"), ge.as("n_perm_ge"),
        ((ge + lit(1L)).cast("double") / lit(65.0)).as("p_value"))
    }),

    // Held-out unigram perplexity — the data-quality statistic an LLM
    // pretraining pipeline runs per source: train add-one-smoothed
    // unigram counts on even doc_ids, score the odd half, cross-entropy
    // bits on the FixedLog2 lattice (order-free exact sums). Sources
    // whose held-out half surprises the other half's LM are drifted or
    // contaminated. Vocab join is the only shuffle beside the two
    // tokenize groupBys; the (T, V) scalars ride a 1-row broadcast.
    "text_heldout_perplexity" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w")).tracked
      val tr = tok.filter(col("doc_id") % 2 === 0)
        .groupBy("w").agg(count(lit(1)).as("c")).tracked
      val stats = tr.agg(sum("c").cast("long").as("t_train"),
        count(lit(1)).as("v_train"))
      tok.filter(col("doc_id") % 2 === 1)
        .join(tr, Seq("w"), "left")
        .crossJoin(broadcast(stats))
        .withColumn("bits_term",
          L(col("t_train") + col("v_train"))
            - L(coalesce(col("c"), lit(0L)) + 1L))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("bits_term").cast("decimal(38,0)")).cast("long")
            .as("bits_q20"))
        .withColumn("bits_per_token",
          col("bits_q20").cast("double") / col("n_tokens").cast("double")
            / lit(1048576.0))
        .orderBy("source")
    }),

    // North-star multimodal: 2×2 tile census through the REAL PNG codec —
    // encode each doc's deterministic grayscale raster as compressed PNG
    // bytes, decode them back and emit per-quadrant pixel counts + sums
    // (the ViT-patching shape). Grayscale PNG is lossless, so the oracle
    // recomputes every tile sum arithmetically from the synthesis
    // formula. Batched mapPartitions both stages, zero shuffle.
    "mm_image_tiles" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, nChars) =>
            val w = (1 + id % 8).toInt
            val h = (1 + nChars % 8).toInt
            graft.multimodal.Media.MediaRow(id,
              graft.multimodal.Media.PngCodec.encodeGray(w, h,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt),
              "png")
          }
        }
      media.mapPartitions { rows =>
        rows.flatMap { m =>
          val (w, h, tiles) =
            graft.multimodal.Media.PngCodec.decodeQuadrants(m.payload)
          tiles.map { case (r, c, npx, sum) =>
            (m.media_id, w.toLong, h.toLong, r.toLong, c.toLong, npx, sum)
          }
        }
      }.toDF("media_id", "width", "height", "tile_row", "tile_col",
          "n_px", "px_sum")
        .orderBy("media_id", "tile_row", "tile_col")
    }),

    // Goertzel spectral power at periods 7 and 10 of the centered daily
    // totals — "is the series weekly-seasonal?" asked in the frequency
    // domain. The two-term recurrence sₙ = yₙ + (c·sₙ₋₁) div 2¹⁶ − sₙ₋₂
    // runs on the q16 coefficient lattice (c = ⌊2¹⁶·2cos(2π/k)⌋) with the
    // (s₁,s₂) state packed into ONE BIGINT — the documented DuckDB
    // in-place-struct fold hazard — so both engines fold the identical
    // branch-free integer sequence. Day cells bound the series; the fold
    // is a codegen higher-order aggregate over a per-type array.
    "ts_goertzel_power" -> ((s, dir) => {
      val B = 1073741824L // 2^30: state bias
      val M = 2147483648L // 2^31: pack modulus
      def fold(cq: Long) =
        s"""aggregate(ys, CAST(${B * M + B} AS BIGINT), (a, yq) ->
           |  (yq + ($cq * (a div $M - $B)) div 65536
           |     - (a % $M - $B) + $B) * $M
           |  + (a div $M - $B) + $B)""".stripMargin
      def power(cq: Long, k: String) = {
        val s1 = s"($k div $M - $B)"
        val s2 = s"($k % $M - $B)"
        s"($s1 * $s1 + $s2 * $s2 - ($cq * $s1 * $s2) div 65536)"
      }
      Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
        .agg(sum("cc").as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sort_array(collect_list(struct(col("dt"), col("x")))).as("xs"))
        .withColumn("ys",
          expr("transform(xs, v -> (v.x - sx div n_days) div 1024)"))
        .withColumn("k7", expr(fold(81722L)))
        .withColumn("k10", expr(fold(106039L)))
        .select(col("event_type"), col("n_days"),
          expr(power(81722L, "k7")).as("power_p7"),
          expr(power(106039L, "k10")).as("power_p10"),
          when(expr(power(81722L, "k7")) > expr(power(106039L, "k10")), 1L)
            .otherwise(0L).as("weekly_dominant"))
        .orderBy("event_type")
    }),

    // Deterministic hash-steered random walks (the node2vec/PPR sampling
    // primitive): 6 steps from the 64 highest-degree parts, next hop =
    // neighbor at index hash(seed, step, node) mod degree over the
    // indexed adjacency. Each step is one equi-join against the tracked
    // adjacency — walk fan-out never touches non-frontier nodes, the
    // sampling posture that makes walks tractable on a 100 TB graph.
    // Reruns and the oracle see identical walks (no RNG state).
    "graph_random_walk_visits" -> ((s, dir) => {
      val adj = graft.olap.GraphFrames.coPurchaseIndexedSym(s, dir)
      val deg = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .select(col("n").as("node"), col("d").as("dn"))
      val seeds = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .orderBy(col("d").desc, col("n")).limit(64)
        .select(col("n").as("seed"), col("n").as("node"))
      var frontier = seeds
      var visits: DataFrame = null
      for (t <- 1 to 6) {
        val mix = (col("seed") * lit(1000003L)
          + lit(t.toLong * 7919L + 12345L)
          + col("node") * lit(31L)) % lit(2147483647L)
        // eager localCheckpoint, like KCore: each ≤64-row frontier feeds
        // BOTH the next step AND the visits union, and lazy persist left
        // every reference re-deriving the full step chain (21 adjacency
        // probes instead of 6 — measured 23.9 s; lineage truncation +
        // the pinned indexed adjacency + broadcasting the frontier side
        // of the probe → 3.3 s at sf0.1). The adjacency is only ever the
        // build (probe) side of a broadcast join, never shuffled.
        frontier = broadcast(frontier.join(broadcast(deg), "node")
          .withColumn("pick", mix % col("dn")))
          .join(adj, col("c") === col("node") && col("idx") === col("pick"))
          .select(col("seed"), col("x").as("node"))
          .localCheckpoint(true)
        visits = if (visits == null) frontier.select("node")
          else visits.unionAll(frontier.select("node"))
      }
      visits.groupBy("node").agg(count(lit(1)).as("visits"))
        .orderBy(col("visits").desc, col("node"))
        .limit(20)
    }),

    // Lincoln–Petersen capture–recapture: estimate the per-type user
    // population from two single-day "capture" samples (first and last
    // active day) — the coverage estimator crawl/census pipelines use
    // when the full population is unobservable. N̂ = n₁n₂ div m₁₂ exact;
    // the true count rides along so the estimator's bias is measured,
    // not assumed. Global date bounds attach as the 1-row broadcast.
    "agg_capture_recapture" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          to_date(col("ts")).as("d")).tracked
      val b = ev.agg(min("d").as("mn"), max("d").as("mx"))
      ev.crossJoin(broadcast(b))
        .groupBy("event_type", "user_id")
        .agg(max(when(col("d") === col("mn"), 1L).otherwise(0L)).as("c1"),
             max(when(col("d") === col("mx"), 1L).otherwise(0L)).as("c2"))
        .groupBy("event_type")
        .agg(sum("c1").cast("long").as("n1"),
          sum("c2").cast("long").as("n2"),
          sum(col("c1") * col("c2")).cast("long").as("m12"),
          sum(when(col("c1") === 1L || col("c2") === 1L, 1L).otherwise(0L))
            .cast("long").as("n_seen"),
          count(lit(1)).as("n_true"))
        .select(col("event_type"), col("n1"), col("n2"), col("m12"),
          col("n_seen"), col("n_true"),
          when(col("m12") > 0, expr("(n1 * n2) DIV m12")).as("n_hat"),
          when(col("m12") > 0,
            (expr("(n1 * n2) DIV m12") - col("n_true")).cast("double")
              / col("n_true").cast("double")).as("rel_bias"))
        .orderBy("event_type")
    }),

    // Spectral flatness of the per-window audio energies (Wiener
    // entropy): geometric vs arithmetic mean in the FixedLog2 domain —
    // tonal media score near −∞, noise near 0, the VAD/music-speech
    // discriminator. Zero-energy windows can't enter the log and are
    // counted out LOUDLY as their own column. Same audioWindows explode
    // as mm_audio_window; per-media aggregation is the only shuffle.
    "mm_audio_flatness" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val w = graft.multimodal.Media.audioWindows(
          graft.multimodal.Media.asMedia(
            Tables.documents(s, dir).filter(col("doc_id") < 200),
            "doc_id", "text"), windowSize = 64, hop = 32)
        .toDF().tracked
      val nz = w.filter(col("energy") > 0)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(L(col("energy"))).cast("long").as("sle"),
          sum("energy").cast("long").as("se"))
      val z = w.filter(col("energy") === 0)
        .groupBy("media_id").agg(count(lit(1)).as("nzero"))
      nz.join(z, Seq("media_id"), "left")
        .withColumn("flatness_log2_q20",
          expr("sle DIV n_windows") - L(expr("se DIV n_windows")))
        .select(col("media_id"), col("n_windows"),
          coalesce(col("nzero"), lit(0L)).as("n_zero_windows"),
          col("flatness_log2_q20"),
          (col("flatness_log2_q20").cast("double") / lit(1048576.0))
            .as("flatness_log2"))
        .orderBy("media_id")
    }),

    // Engle–Granger-lite cointegration screen between the purchase and
    // view daily totals: exact q16 hedge ratio (decimal moments), exact
    // integer residuals scaled through the regression denominator, then
    // the residual lag-1 autocorrelation with BIGINT-checked moments —
    // the pairs-trading / do-these-series-share-a-trend screen. The
    // stationarity flag is the EXACT cross-multiplied compare ρ < 1/2
    // (4·num² < den_a·den_b in DECIMAL), so no double ever gates it.
    "ts_cointegration_screen" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .withColumn("cc", Exact.cents(col("value")))
        .groupBy(to_date(col("ts")).as("dt"))
        .agg(sum(when(col("event_type") === "purchase", col("cc"))
          .otherwise(0L)).as("y"),
          sum(when(col("event_type") === "view", col("cc"))
            .otherwise(0L)).as("x")).tracked
      val m = d.agg(count(lit(1)).as("n"),
        sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      val bet = m.select(col("n"), col("sx"), col("sy"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("bnum"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("bden"))
      val res = d.crossJoin(broadcast(bet))
        .select(col("dt"), col("n"), col("bnum"), col("bden"),
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * bden * y
                 - bden * sy
                 - bnum * (CAST(n AS DECIMAL(38,0)) * x - sx))
                 DIV (CAST(bden AS DECIMAL(38,0)) * n) AS BIGINT)""")
            .as("r"))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("dt"))).orderBy("dt")
      val ac = res
        .withColumn("pr", lag(col("r"), 1).over(W))
        .filter(col("pr").isNotNull)
        .agg(count(lit(1)).as("np"),
          sum("r").cast("long").as("sr"), sum("pr").cast("long").as("sp"),
          Exact.checkedLong(sum(expr("CAST(r AS DECIMAL(38,0)) * pr")))
            .as("srp"),
          Exact.checkedLong(sum(expr("CAST(r AS DECIMAL(38,0)) * r")))
            .as("srr"),
          Exact.checkedLong(sum(expr("CAST(pr AS DECIMAL(38,0)) * pr")))
            .as("spp"))
        .select(col("np"),
          (col("np") * col("srp") - col("sr") * col("sp")).as("rnum"),
          (col("np") * col("srr") - col("sr") * col("sr")).as("ra"),
          (col("np") * col("spp") - col("sp") * col("sp")).as("rb"))
      bet.crossJoin(broadcast(ac))
        .select(col("n").as("n_days"),
          expr("CAST((65536 * bnum) DIV bden AS BIGINT)").as("beta_q16"),
          col("np").as("n_pairs"), col("rnum").as("rho_num"),
          col("ra").as("rho_den_a"), col("rb").as("rho_den_b"),
          (col("rnum").cast("double")
            / sqrt(col("ra").cast("double") * col("rb").cast("double")))
            .as("resid_autocorr"),
          when(col("rnum") < 0 ||
            expr("CAST(4 AS DECIMAL(38,0)) * rnum * rnum") <
              expr("CAST(ra AS DECIMAL(38,0)) * rb"), 1L)
            .otherwise(0L).as("cointegrated_flag"))
    }),

    // Contrastive pair sampling — the training-pair generator embedding
    // models consume: per doc, up to 2 hash-ordered DIFFERENT-source
    // negatives drawn from the doc's hash bucket (bucketed candidate
    // generation: the window never orders more than one bucket, so the
    // sort is keyed and the pairing is reproducible at any scale — no
    // RNG state, no global sort). Per-source census with an id checksum
    // so the exact pairing is oracle-pinned.
    "sample_contrastive_pairs" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("hv", "doc_id")
      var df = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          graft.olap.Sketch.spreadHash(col("doc_id")).as("hv"))
        .withColumn("bucket", col("hv") % 8)
      for (k <- 1 to 6) {
        df = df.withColumn(s"d$k", lead(col("doc_id"), k).over(W))
          .withColumn(s"s$k", lead(col("source"), k).over(W))
      }
      val negs = expr(
        """filter(array(named_struct('d', d1, 's', s1),
           named_struct('d', d2, 's', s2), named_struct('d', d3, 's', s3),
           named_struct('d', d4, 's', s4), named_struct('d', d5, 's', s5),
           named_struct('d', d6, 's', s6)),
           c -> c.d IS NOT NULL AND c.s <> source)""")
      df.withColumn("negs", negs)
        .select(col("source"),
          when(size(col("negs")) >= 1, expr("negs[0].d")).as("neg1"),
          when(size(col("negs")) >= 2, expr("negs[1].d")).as("neg2"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("neg1").isNotNull, 1L).otherwise(0L))
            .as("n_with_neg1"),
          sum(when(col("neg2").isNotNull, 1L).otherwise(0L))
            .as("n_with_neg2"),
          sum(coalesce(col("neg1"), lit(0L))
            + coalesce(col("neg2"), lit(0L))).as("neg_id_checksum"))
        .orderBy("source")
    }),

    // Hill tail-index estimator over the top-200 order totals — "how
    // heavy is the revenue tail?" (α ≈ 1 Zipf-like, α large thin). The
    // order statistics come from one rank window, the log-moment is the
    // exact FixedLog2 sum Σ(log2fp(xᵢ) − log2fp(x₍ₖ₊₁₎)), and α spends
    // one IEEE chain. Pairs with the Zipf/Heaps text laws on the exact
    // same lattice.
    "agg_hill_tail_index" -> ((s, dir) => {
      val L = graft.functions.FixedLog2.log2_fp _
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(Exact.onePartition(col("x"))).orderBy(col("x").desc)
      // distributed top-k first (TakeOrderedAndProject — per-partition
      // heads, never a global sort); the rank window then runs over the
      // 201-row frame (deliberate onePartition). Value ties at either
      // boundary are harmless: the statistic reads only the x multiset.
      val r = Tables.orders(s, dir)
        .select(Exact.cents(col("o_totalprice")).as("x"))
        .orderBy(col("x").desc).limit(201)
        .withColumn("rn", row_number().over(W))
        .tracked
      val xk = r.filter(col("rn") === 201).select(L(col("x")).as("lxk"))
      r.filter(col("rn") <= 200)
        .crossJoin(broadcast(xk))
        .agg(count(lit(1)).as("k"),
          (sum(L(col("x"))) - lit(200L) * max("lxk")).cast("long")
            .as("s_q20"))
        .withColumn("hill_alpha",
          col("k").cast("double") * lit(1048576.0)
            / (col("s_q20").cast("double") * lit(0.6931471805599453)))
    }),

    // MATTR lexical diversity (moving-average type-token ratio): distinct
    // tokens per sliding 50-token window, averaged per source — the
    // length-robust diversity score (plain TTR collapses as docs grow;
    // MATTR does not). Entirely row-local via codegen higher-order
    // functions (transform/slice/array_distinct) — zero shuffle until
    // the per-source reduce.
    "text_mattr_diversity" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .select(col("source"),
          greatest(size(col("toks")) - 49, lit(0)).cast("long")
            .as("n_windows"),
          coalesce(expr(
            """aggregate(transform(sequence(0, size(toks) - 50),
               i -> size(array_distinct(slice(toks, i + 1, 50)))),
               CAST(0 AS BIGINT), (a, x) -> a + x)"""), lit(0L))
            .as("dsum"))
        .filter(col("n_windows") > 0)
        .groupBy("source")
        .agg(sum("n_windows").cast("long").as("n_windows"),
          sum("dsum").cast("long").as("distinct_sum"))
        .withColumn("mattr", col("distinct_sum").cast("double")
          / col("n_windows").cast("double") / lit(50.0))
        .orderBy("source"))
      ,

    // Order-to-ship business-day lag histogram through the codegen
    // busday expression over the lineitem→orders FK join (the one real
    // fact-to-fact equi-join in the calendar family): [order, ship)
    // busdays in O(1) per row, log₂ lag buckets, non-positive spans kept
    // explicit as bucket −1 (a data-quality signal, not a silent drop).
    "cal_order_ship_busdays" -> ((s, dir) => {
      val j = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          to_date(col("l_shipdate")).as("sd"),
          Exact.cents(col("l_extendedprice")).as("cents"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"),
            to_date(col("o_orderdate")).as("od")), "l_orderkey")
      j.withColumn("lag_bucket",
          when(col("sd") <= col("od"), lit(-1L))
            .otherwise((length(bin(
              BusdayCount.busday_count(col("od"), col("sd")))) - 1)
              .cast("long")))
        .groupBy("lag_bucket")
        .agg(count(lit(1)).as("n_lineitems"),
          sum("cents").cast("long").as("revenue_cents"))
        .orderBy("lag_bucket")
    }),

    // Recall@k curve for the IVF index against brute-force ground truth —
    // one number per k ∈ {1,3,5,10} instead of sim_ivf_recall's single
    // operating point: the tuning curve an ANN deployment reads before
    // picking k/nprobe. Ground truth is query-bounded (10 probes), so
    // the brute pass is a bounded cross, and both sides reuse the shared
    // Similarity machinery.
    "sim_recall_at_k_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 10)
      val gt = graft.similarity.Similarity
        .bruteForceTopK(emb, probes, k = 10)
        .select(col("query_id"), col("vec_id"), col("rank").as("gr"))
      val ivf = graft.similarity.Similarity
        .ivfProbeTopK(emb, emb.filter(col("vec_id") < 8), probes,
          nprobe = 2, k = 10)
        .select(col("query_id"), col("vec_id"), col("rank").as("ir"))
      val j = gt.join(ivf, Seq("query_id", "vec_id")).tracked
      val ks = Tables.embeddings(s, dir).sparkSession
        .range(0, 1).select(explode(typedLit(Seq(1L, 3L, 5L, 10L))).as("k"))
      ks.join(j, col("gr") <= col("k") && col("ir") <= col("k"), "left")
        .groupBy("k")
        .agg(sum(when(col("gr").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .select(col("k"), col("n_hits"),
          (col("k") * 10L).as("n_possible"),
          (col("n_hits").cast("double") / (col("k") * 10L).cast("double"))
            .as("recall_at_k"))
        .orderBy("k")
    }),

    // Cumulative-distinct-users curve per series: each user reduces to
    // their first day ONCE (the partial-aggregable trick — a naive
    // count(distinct) per day rescans all history per cell), then one
    // keyed running sum over day cells. The audience-growth curve every
    // dashboard draws, exact and shuffle-minimal at any scale.
    "olap_cumulative_distinct" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(to_date(col("ts"))).as("dt"))
        .groupBy("event_type", "dt")
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          sum("new_users").over(W.partitionBy("event_type").orderBy("dt")
            .rowsBetween(W.unboundedPreceding, 0)))
        .orderBy("event_type", "dt")
    }),

    // ABC class migration between the horizon's two halves — does a
    // part's revenue class persist? Each half reuses the established
    // cum-share classification (keyed two-level cumulative — scales to
    // 10^9 parts), the migration matrix is one exact count per
    // (class_h1, class_h2) cell. The assortment-drift report a
    // replenishment pipeline runs monthly.
    "olap_abc_migration" -> ((s, dir) => {
      def classify(rev: DataFrame): DataFrame = {
        val total = rev.agg(sum(col("cents")).as("total_cents"))
        // keyed two-level cumulative — see olap_abc_classification
        graft.text.Packing.withCumDesc(rev, "l_partkey", "cents", "cum")
          .crossJoin(broadcast(total))
          .withColumn("abc_class",
            when(col("cum") * 100 <= col("total_cents") * 80, "A")
              .when(col("cum") * 100 <= col("total_cents") * 95, "B")
              .otherwise("C"))
          .select("l_partkey", "abc_class")
      }
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_shipdate"),
          Exact.cents(col("l_extendedprice")).as("c"))
        .tracked // both halves scan it
      def half(pred: org.apache.spark.sql.Column) = classify(
        li.filter(pred).groupBy("l_partkey").agg(sum("c").as("cents")))
      val cut = lit("1995-01-01").cast("date")
      half(col("l_shipdate") < cut)
        .withColumnRenamed("abc_class", "class_h1")
        .join(half(col("l_shipdate") >= cut)
          .withColumnRenamed("abc_class", "class_h2"), "l_partkey")
        .groupBy("class_h1", "class_h2")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("class_h1", "class_h2")
    }),

    // Average-neighbor-degree curve k_nn(k) — assortativity's richer
    // sibling: for each log2 degree bucket, the edge-weighted mean
    // neighbor degree, exact integers to one floor-div + one double.
    // Rising curve = hubs prefer hubs. Same symmetrized co-purchase
    // edges as graph_assortativity; degrees join back per endpoint.
    "graph_knn_degree_curve" -> ((s, dir) => {
      val e = graft.olap.GraphFrames.coPurchaseEdges(s, dir)
      val sym = e.select(col("u").as("c"), col("v").as("x"))
        .unionAll(e.select(col("v").as("c"), col("u").as("x")))
      // pinned full-degree frame (≡ sym.groupBy count), renamed
      val deg = graft.olap.GraphFrames.coPurchaseDegrees(s, dir)
        .select(col("n").as("c"), col("d").as("dc"))
      sym
        // the degree frame is part-cardinality (a dimension): broadcast
        // both probes so the 2|E| edge stream never shuffles
        .join(broadcast(deg.select(col("c"), col("dc").as("deg_c"))), "c")
        .join(broadcast(
          deg.select(col("c").as("x"), col("dc").as("deg_x"))), "x")
        .withColumn("kb", expr("length(bin(deg_c)) - 1"))
        .groupBy("kb")
        .agg(count(lit(1)).as("n_edges"), sum("deg_x").as("sum_nb_deg"))
        .select(col("kb").as("log2_degree"), col("n_edges"),
          col("sum_nb_deg"),
          expr("sum_nb_deg div n_edges").as("knn_floor"),
          (col("sum_nb_deg").cast("double")
            / col("n_edges").cast("double")).as("knn"))
        .orderBy("log2_degree")
    }),

    // Two-step transition structure: path counts n₂(a,c) = Σ_b c_ab·c_bc
    // — the matrix square, expressed as the keyed self-join matrix
    // multiply (the shape a distributed Markov power iteration uses) —
    // plus each row's two-step distribution in ppm. Exact integers to
    // one floor-div + one IEEE division.
    "mine_transition_2step" -> ((s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val c1 = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type").as("a"))
        .withColumn("b", lead("a", 1).over(w))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
        .tracked // both sides of the matrix square
      val n2 = c1.select(col("a"), col("b"), col("c_ab"))
        .join(c1.select(col("a").as("b"), col("b").as("cc"),
          col("c_ab").as("c_bc")), "b")
        .groupBy("a", "cc")
        // sum the DECIMAL products FIRST, checkedLong the aggregate: the
        // per-term check left a BIGINT sum that could still wrap silently
        // where the oracle's HUGEINT sum + one cast aborts loudly
        .agg(Exact.checkedLong(
          sum(dec(col("c_ab")) * dec(col("c_bc")))).as("n2"))
      val rowTot = n2.groupBy("a").agg(sum("n2").as("row_total"))
      n2.join(rowTot, "a")
        .select(col("a"), col("cc").as("c"), col("n2"),
          expr("(1000000 * cast(n2 as decimal(38,0))) div row_total")
            .as("p2_ppm"),
          (col("n2").cast("double") / col("row_total").cast("double"))
            .as("p2"))
        .orderBy("a", "c")
    }),
  )

  /** THE trailing-7-day volume z gate shared by `dq_volume_anomaly`
    * (batch daily counts) and `stream_volume_anomaly` (the watermarked
    * tumbling counts) — ONE definition of the window, the lattice
    * z = (7n−Σn)/√(7Σn²−(Σn)²) and the |z|>3 flag, so the
    * streamed == batch bitwise pin is structural rather than maintained.
    * Input schema: (event_type, dt, n).
    */
  /** Pinned canonical near-dup labels over the standard corpus banding
    * (SimHash banded, Hamming ≤ 1, 2 bands): three queries — canonical
    * labels, cluster stats, dedup-aware split — derive from this one
    * clustering, and connected components is the most expensive dedup
    * step, so it runs once per process+SF (the materialized-dedup-table
    * posture a production corpus pipeline takes).
    */
  private def nearDupLabels(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    CacheRegistry.pinned(s"neardup_labels:$dir") {
      graft.dedup.Components.canonicalLabels(
        SimHash.bandedNearDupPairs(docs, "doc_id", "text",
          maxHamming = 1, bands = 2), "doc_a", "doc_b")
    }
  }

  private def trailing7VolumeGate(daily: DataFrame): DataFrame = {
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("dt").rowsBetween(-7, -1)
    val z = (col("n") * 7L - col("s1")).cast("double") /
      sqrt(col("var_num").cast("double"))
    daily
      .withColumn("wn", count(lit(1)).over(tw))
      .withColumn("s1", sum("n").over(tw))
      .withColumn("s2", sum(col("n") * col("n")).over(tw))
      .filter(col("wn") === 7)
      .withColumn("var_num", col("s2") * 7L - col("s1") * col("s1"))
      .select(col("event_type"), col("dt"), col("n"),
        col("s1").as("trail_sum"), col("var_num"),
        when(col("var_num") > 0, z).as("z"),
        when(col("var_num") > 0, abs(z) > lit(3.0)).as("is_anomaly"))
      .orderBy("event_type", "dt")
  }

  /** Shared Neyman-allocation machinery for `sample_neyman_allocation`
    * and `sample_expansion_estimate` — ONE definition of the weight
    * surrogate, budget split and spread-hash selection so the sampler and
    * its estimator can never silently disagree. Returns
    * (alloc: event_type, n_class, sc, wt, n_alloc;
    *  selected rows: event_type, event_id, c + alloc columns).
    * The DECIMAL variance numerator enters BIGINT via Exact.checkedLong —
    * a loud failure on overflow instead of Spark's silent NULL cast (the
    * oracle's CAST would raise; both engines must agree on failing).
    */
  private def neymanSample(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
              Exact.cents(col("value")).as("c"))
      .tracked // moments + selection both scan it
    val g = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_class"), sum("c").as("sc"),
           sum(dec(col("c")) * dec(col("c"))).as("ss"))
      .withColumn("var_num", Exact.checkedLong(
        dec(col("n_class")) * col("ss") - dec(col("sc")) * dec(col("sc"))))
      .withColumn("wt", floor(sqrt(
        (col("n_class") * expr("var_num div (n_class - 1)"))
          .cast("double"))).cast("long"))
    val tot = g.agg(sum("wt").as("total_wt"))
    val alloc = g.crossJoin(broadcast(tot))
      .withColumn("n_alloc", expr("(1000 * wt) div total_wt"))
      .select("event_type", "n_class", "sc", "wt", "n_alloc")
    val selected = ev.join(broadcast(alloc), "event_type")
      .withColumn("rk", row_number().over(
        w.partitionBy("event_type")
          .orderBy(graft.olap.Sketch.spreadHash(col("event_id")),
                   col("event_id"))))
      .filter(col("rk") <= col("n_alloc"))
    (alloc, selected)
  }

  /** Fixed-fold one-way F chain shared by `agg_anova_f` (on raw cents)
    * and `agg_levene_bf` (on median spreads) — ONE definition of the
    * bitwise-portability-critical fold: per-group moments from a
    * (event_type, v) frame, k between-terms s_g²/n_g folded in FIXED
    * event_type order (sort_array→aggregate ≡ list_sort→list_reduce),
    * F = (ssb/(k−1))/(ssw/(N−k)). Returns one row
    * (k, n_total, ssb, ssw, stat).
    */
  private def fixedFoldF(rows: DataFrame): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    rows.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
           sum(dec(col("v")) * dec(col("v"))).as("ss"))
      .withColumn("t_g", (dec(col("sv")) * dec(col("sv"))).cast("double")
        / col("n").cast("double"))
      .agg(count(lit(1)).as("k"), sum("n").as("n_total"),
           sum(dec(col("sv"))).as("s_total"), sum(col("ss")).as("ss_total"),
           aggregate(sort_array(collect_list(
               struct(col("event_type"), col("t_g")))),
             lit(0.0), (a, x) => a + x.getField("t_g")).as("t_between"))
      .withColumn("ssb", col("t_between")
        - (col("s_total") * col("s_total")).cast("double")
          / col("n_total").cast("double"))
      .withColumn("ssw", col("ss_total").cast("double") - col("t_between"))
      .withColumn("stat",
        (col("ssb") / (col("k") - 1).cast("double"))
          / (col("ssw") / (col("n_total") - col("k")).cast("double")))
  }

  /** DuckDB CTE chain mirroring [[fixedFoldF]]: expects a CTE named
    * `$src` with columns (event_type, $valCol); terminates in `f`
    * (k, n_total, ssb, ssw) — the caller's SELECT forms the statistic
    * with the identical division chain.
    */
  private def duckFixedFoldF(src: String, valCol: String): String =
    s"""fg AS (SELECT event_type, count(*) AS n,
                      CAST(sum($valCol) AS BIGINT) AS sv,
                      CAST(sum(CAST($valCol AS HUGEINT) * $valCol)
                        AS HUGEINT) AS ss
               FROM $src GROUP BY 1),
        ft AS (SELECT event_type, n, sv, ss,
                      CAST(CAST(CAST(sv AS HUGEINT) * sv AS BIGINT) AS DOUBLE)
                        / CAST(n AS DOUBLE) AS t_g
               FROM fg),
        fa AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_total,
                      CAST(sum(sv) AS HUGEINT) AS s_total,
                      CAST(sum(ss) AS HUGEINT) AS ss_total,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(list_sort(list(struct_pack(
                          event_type := event_type, t_g := t_g))),
                          x -> x.t_g)),
                        (a, b) -> a + b) AS t_between
               FROM ft),
        f AS (SELECT k, n_total,
                     t_between - CAST(s_total * s_total AS DOUBLE)
                       / CAST(n_total AS DOUBLE) AS ssb,
                     CAST(ss_total AS DOUBLE) - t_between AS ssw
              FROM fa)"""

  /** Shared perceptual-hash frame for `mm_image_phash` and
    * `dedup_phash_hamming` — ONE definition of the raster synthesis and
    * the codec round-trip so the hash the dedup indexes is exactly the
    * hash the decode query reports. Batched mapPartitions (codec init
    * amortizes per partition), zero shuffle. Columns:
    * (media_id, width, height, lo, hi, n_set).
    */
  private def phashFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = (1 + id % 8).toInt
          val h = (1 + nChars % 8).toInt
          val png = graft.multimodal.Media.PngCodec.encodeGray(w, h,
            (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          val (dw, dh, lo, hi, nSet) =
            graft.multimodal.Media.PngCodec.decodeAvgHash(png)
          (id, dw.toLong, dh.toLong, lo, hi, nSet)
        }
      }
      .toDF("media_id", "width", "height", "lo", "hi", "n_set")
  }

  /** DuckDB CTE chain mirroring [[phashFrame]] — the arithmetic raster
    * recomputation both phash oracles compose (lossless grayscale PNG ⇒
    * decoded == synthesized). Terminates in `hs` (media_id, width,
    * height, lo, hi, n_set).
    */
  private val duckPhashCtes: String =
    """px AS (SELECT d.doc_id, 1 + d.doc_id % 8 AS w,
                     1 + d.n_chars % 8 AS h, xx.x, yy.y,
                     (d.doc_id * 31 + xx.x * 7 + yy.y * 13) % 256 AS p
              FROM documents d
              CROSS JOIN (SELECT unnest(range(8)) AS x) xx
              CROSS JOIN (SELECT unnest(range(8)) AS y) yy
              WHERE xx.x < 1 + d.doc_id % 8
                AND yy.y < 1 + d.n_chars % 8),
       m AS (SELECT doc_id, CAST(sum(p) AS BIGINT) AS sump,
                    count(*) AS np
             FROM px GROUP BY 1),
       b AS (SELECT px.doc_id, px.w, px.h,
                    CASE WHEN px.p > m.sump // m.np THEN 1 ELSE 0 END
                      AS bit,
                    px.y * px.w + px.x AS i
             FROM px JOIN m ON m.doc_id = px.doc_id),
       hs AS (SELECT doc_id AS media_id,
                     CAST(any_value(w) AS BIGINT) AS width,
                     CAST(any_value(h) AS BIGINT) AS height,
                     CAST(sum(CASE WHEN i < 32
                       THEN bit * (CAST(1 AS BIGINT) << i)
                       ELSE 0 END) AS BIGINT) AS lo,
                     CAST(sum(CASE WHEN i >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (i - 32))
                       ELSE 0 END) AS BIGINT) AS hi,
                     CAST(sum(bit) AS BIGINT) AS n_set
              FROM b GROUP BY 1)"""

  /** DuckDB CTE chain mirroring [[MinHash.candidatePairs]] at k=16, r=4 —
    * ONE oracle definition of signatures, banding and the candidate join,
    * composed by `dedup_minhash_lsh` and `dedup_bbit_minhash`.
    * Terminates in `cand` (doc_a, doc_b, sig_a, sig_b).
    */
  private lazy val duckMinhashCandCtes: String = {
    val k = 16; val r = 4
    val as = (0 until k).map(MinHash.coeffA).mkString("[", ", ", "]")
    val bs = (0 until k).map(MinHash.coeffB).mkString("[", ", ", "]")
    s"""h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
        sh AS (SELECT doc_id,
                 list_transform(generate_series(1, len(th) - 2), i ->
                   ((th[i] * 31 + th[i+1]) * 31 + th[i+2]) % 2147483647)
                   AS s
               FROM h WHERE len(th) >= 3),
        sg AS (SELECT doc_id,
                 list_transform(generate_series(1, $k), i ->
                   list_min(list_transform(s, x ->
                     ($as[i] * x + $bs[i]) % 2147483647))) AS sig
               FROM sh),
        bd AS (SELECT doc_id, sig,
                 list_transform(generate_series(0, ${k / r - 1}), b ->
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, $r), j ->
                         sig[b * $r + j])),
                     (h, x) -> (h * 31 + x) % 2147483647)) AS bands
               FROM sg),
        bk AS (SELECT doc_id, sig,
                      unnest(bands) AS key,
                      unnest(generate_series(1, len(bands))) AS band
               FROM bd),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                        x.sig AS sig_a, y.sig AS sig_b
                 FROM bk x JOIN bk y
                   ON x.band = y.band AND x.key = y.key
                      AND x.doc_id < y.doc_id)"""
  }

  /** DuckDB CTE chain mirroring [[neymanSample]] — ONE oracle definition
    * of the weight surrogate, budget split and spread-hash rank, composed
    * by both sampling oracles. Terminates in `alloc` (event_type,
    * n_class, sc, wt, n_alloc) and `rk` (selection rank over the event
    * rows, carrying c for estimators).
    */
  private val duckNeymanCtes: String =
    """ev AS (SELECT event_type, event_id,
                     CAST(round(value * 100, 0) AS BIGINT) AS c
              FROM events),
       g AS (SELECT event_type, count(*) AS n_class,
                    CAST(sum(c) AS BIGINT) AS sc,
                    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
             FROM ev GROUP BY 1),
       v AS (SELECT event_type, n_class, sc,
                    CAST(CAST(n_class AS HUGEINT) * ss
                         - CAST(sc AS HUGEINT) * sc AS BIGINT) AS var_num
             FROM g),
       wt AS (SELECT event_type, n_class, sc,
                     CAST(floor(sqrt(CAST(n_class
                       * (var_num // (n_class - 1)) AS DOUBLE)))
                       AS BIGINT) AS wt
              FROM v),
       tot AS (SELECT CAST(sum(wt) AS BIGINT) AS total_wt FROM wt),
       alloc AS (SELECT event_type, n_class, sc, wt,
                        (1000 * wt) // total_wt AS n_alloc
                 FROM wt CROSS JOIN tot),
       f AS (SELECT event_type, event_id, c,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   string_split(CAST(event_id AS VARCHAR), ''),
                   ch -> CAST(ascii(ch) AS BIGINT))),
                 (a, c2) -> (a * 31 + c2) % 2147483647) AS h0
             FROM ev),
       m1 AS (SELECT event_type, event_id, c,
                (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
       m2 AS (SELECT event_type, event_id, c, (h1 * h1) % 2147483647
                AS h2 FROM m1),
       hh AS (SELECT event_type, event_id, c,
                (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
       rk AS (SELECT event_type, event_id, c,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY hv, event_id) AS rk
              FROM hh)"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "ts_ohlc_resample" ->
      """SELECT event_type, CAST(ts AS DATE) AS date,
         arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         arg_max(value, ts) AS close, count(*) AS volume
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "ts_ohlc_resample_weekly" ->
      """SELECT event_type, date_trunc('week', ts) AS week_start,
         arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         arg_max(value, ts) AS close, count(*) AS volume
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "ts_daily_returns" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2)
         SELECT event_type, date, close,
                lag(close) OVER w AS prev_close,
                (close - lag(close) OVER w) / lag(close) OVER w * 100.0
                  AS return_pct
         FROM b WINDOW w AS (PARTITION BY event_type ORDER BY date)
         ORDER BY event_type, date""",

    "ts_ccy_join_derive" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
              f AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'view' GROUP BY 1)
         SELECT p.date AS date, p.close AS close_price_usd,
                f.close AS close_rate,
                round_even(CAST(p.close AS DECIMAL(18,2)) *
                           CAST(f.close AS DECIMAL(18,4)), 2) AS close_price_ccy
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

    "ts_report_frame" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
              f AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'view' GROUP BY 1),
              d AS (SELECT p.date AS date, p.close AS close_price_usd,
                           f.close AS close_rate,
                           round_even(CAST(p.close AS DECIMAL(18,2)) *
                                      CAST(f.close AS DECIMAL(18,4)), 2)
                             AS close_price_ccy
                    FROM p JOIN f USING (date))
         SELECT date, close_price_usd, close_rate, close_price_ccy,
           CASE WHEN count(close_price_ccy) OVER w5 = 5
                THEN CAST(sum(CAST(close_price_ccy AS DECIMAL(18,4))) OVER w5
                          AS DOUBLE) / 5 END AS sma_5_ccy,
           CASE WHEN count(close_price_ccy) OVER w20 = 20
                THEN CAST(sum(CAST(close_price_ccy AS DECIMAL(18,4))) OVER w20
                          AS DOUBLE) / 20 END AS sma_20_ccy,
           CASE WHEN count(close_price_usd) OVER w5 = 5
                THEN CAST(sum(CAST(close_price_usd AS DECIMAL(18,4))) OVER w5
                          AS DOUBLE) / 5 END AS sma_5_usd,
           CASE WHEN count(close_price_usd) OVER w20 = 20
                THEN CAST(sum(CAST(close_price_usd AS DECIMAL(18,4))) OVER w20
                          AS DOUBLE) / 20 END AS sma_20_usd,
           CASE WHEN count(close_rate) OVER w5 = 5
                THEN CAST(sum(CAST(close_rate AS DECIMAL(18,4))) OVER w5
                          AS DOUBLE) / 5 END AS sma_5_rate,
           CASE WHEN count(close_rate) OVER w20 = 20
                THEN CAST(sum(CAST(close_rate AS DECIMAL(18,4))) OVER w20
                          AS DOUBLE) / 20 END AS sma_20_rate
         FROM d
         WINDOW w5 AS (ORDER BY date ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
                w20 AS (ORDER BY date ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
         ORDER BY date""",

    "ts_sma_multi_series" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2)
         SELECT event_type, date, close,
           CASE WHEN count(close) OVER w5 = 5
                THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER w5 AS DOUBLE) / 5
           END AS sma_5
         FROM b
         WINDOW w5 AS (PARTITION BY event_type ORDER BY date
                       ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
         ORDER BY event_type, date""",

    "wm_watermark_max" ->
      "SELECT max(CAST(l_shipdate AS DATE)) AS watermark FROM lineitem",

    "inc_missing_suffix" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
                l_quantity
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >
               (SELECT max(CAST(l_shipdate AS DATE)) - 90 FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, ship_date, l_quantity""",

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

    "inc_derived_rebuild" ->
      """WITH wm AS (SELECT max(CAST(ts AS DATE)) - 10 AS watermark FROM events),
              r AS (SELECT * FROM events
                    WHERE CAST(ts AS DATE) > (SELECT watermark FROM wm)),
              p AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM r WHERE event_type = 'purchase' GROUP BY 1),
              f AS (SELECT CAST(ts AS DATE) AS date, arg_max(value, ts) AS close
                    FROM r WHERE event_type = 'view' GROUP BY 1)
         SELECT p.date AS date, p.close AS close_price_usd,
                f.close AS close_rate,
                round_even(CAST(p.close AS DECIMAL(18,2)) *
                           CAST(f.close AS DECIMAL(18,4)), 2) AS close_price_ccy
         FROM p JOIN f USING (date) ORDER BY date""",

    "ts_sliding_window_2d" ->
      """WITH e AS (SELECT event_type, value,
                           unnest([date_trunc('day', ts) - INTERVAL 1 DAY,
                                   date_trunc('day', ts)]) AS wstart
                    FROM events)
         SELECT CAST(wstart AS DATE) AS window_start, event_type,
                count(*) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_value
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",

    "ts_macd" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, date, close,
                           list(close) OVER (PARTITION BY event_type
                             ORDER BY date ROWS UNBOUNDED PRECEDING) AS cl
                    FROM b),
              m AS (SELECT event_type, date,
                      list_reduce(cl, (a, x) ->
                          a * (CAST(1 AS DOUBLE)
                               - CAST(2 AS DOUBLE) / CAST(13 AS DOUBLE))
                        + x * (CAST(2 AS DOUBLE) / CAST(13 AS DOUBLE)))
                      - list_reduce(cl, (a, x) ->
                          a * (CAST(1 AS DOUBLE)
                               - CAST(2 AS DOUBLE) / CAST(27 AS DOUBLE))
                        + x * (CAST(2 AS DOUBLE) / CAST(27 AS DOUBLE)))
                        AS macd
                    FROM l),
              sl AS (SELECT event_type, date, macd,
                            list(macd) OVER (PARTITION BY event_type
                              ORDER BY date ROWS UNBOUNDED PRECEDING) AS ml
                     FROM m),
              sg AS (SELECT event_type, date, macd,
                       list_reduce(ml, (a, x) ->
                           a * (CAST(1 AS DOUBLE)
                                - CAST(2 AS DOUBLE) / CAST(10 AS DOUBLE))
                         + x * (CAST(2 AS DOUBLE) / CAST(10 AS DOUBLE)))
                         AS signal
                     FROM sl)
         SELECT event_type, date, macd, signal,
                macd - signal AS histogram
         FROM sg ORDER BY event_type, date""",

    "ts_drawdown" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2)
         SELECT event_type, date, close,
                max(close) OVER w AS peak,
                (close - max(close) OVER w) / max(close) OVER w
                  * CAST(100 AS DOUBLE) AS drawdown_pct
         FROM b
         WINDOW w AS (PARTITION BY event_type ORDER BY date
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_type, date""",

    "ts_vwap_monthly" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close, count(*) AS volume
                    FROM events GROUP BY 1, 2)
         SELECT event_type, CAST(date_trunc('month', date) AS DATE) AS month,
                CAST(sum(volume) AS BIGINT) AS volume,
                CAST(sum(CAST(round(close * 100, 0) AS BIGINT) * volume)
                     AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE) / CAST(100 AS DOUBLE) AS vwap
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",

    "ts_bollinger" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              c AS (SELECT event_type, date, close,
                           CAST(round(close * 100, 0) AS BIGINT) AS cts
                    FROM b),
              m AS (SELECT event_type, date, close,
                           count(*) OVER w AS cnt,
                           sum(cts) OVER w AS sc,
                           sum(cts * cts) OVER w AS sc2
                    FROM c
                    WINDOW w AS (PARTITION BY event_type ORDER BY date
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
              d AS (SELECT event_type, date, close, cnt,
                           CAST(sc AS DOUBLE) / CAST(2000 AS DOUBLE) AS mid,
                           sqrt(CAST(20 * sc2 - sc * sc AS DOUBLE))
                             / CAST(2000 AS DOUBLE) AS sd
                    FROM m)
         SELECT event_type, date, close,
                CASE WHEN cnt = 20 THEN mid END AS bb_mid,
                CASE WHEN cnt = 20 THEN sd END AS bb_sd,
                CASE WHEN cnt = 20
                     THEN mid + CAST(2 AS DOUBLE) * sd END AS bb_upper,
                CASE WHEN cnt = 20
                     THEN mid - CAST(2 AS DOUBLE) * sd END AS bb_lower
         FROM d ORDER BY event_type, date""",

    "ts_rsi" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              c AS (SELECT event_type, date, close,
                           CAST(round(close * 100, 0) AS BIGINT) AS cts
                    FROM b),
              d AS (SELECT event_type, date, close,
                           cts - lag(cts, 1) OVER
                             (PARTITION BY event_type ORDER BY date) AS delta
                    FROM c),
              g AS (SELECT event_type, date, close, delta,
                           CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
                           CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss
                    FROM d),
              m AS (SELECT event_type, date, close,
                           count(delta) OVER w AS cnt,
                           sum(gain) OVER w AS sg,
                           sum(loss) OVER w AS sl
                    FROM g
                    WINDOW w AS (PARTITION BY event_type ORDER BY date
                                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT event_type, date, close,
                CASE WHEN cnt = 14 AND sg + sl <> 0
                     THEN CAST(sg AS DOUBLE) * CAST(100 AS DOUBLE)
                          / CAST(sg + sl AS DOUBLE)
                END AS rsi_14
         FROM m ORDER BY event_type, date""",

    "ts_sliding_distinct_users" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
              x AS (SELECT user_id, d + off AS wend
                    FROM e CROSS JOIN
                         (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS off) t)
         SELECT wend, count(*) AS n_events,
                count(DISTINCT user_id) AS n_users
         FROM x GROUP BY 1 ORDER BY 1""",

    "text_bpe_pair_counts" ->
      """WITH t AS (SELECT doc_id,
                      regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[.,;:!?()/_-]+') AS pieces
                    FROM documents)
         SELECT pair, count(*) AS freq FROM (
           SELECT unnest(list_transform(range(1, len(pieces)),
             i -> pieces[i] || ' ' || pieces[i + 1])) AS pair
           FROM t)
         GROUP BY 1 ORDER BY freq DESC, pair ASC LIMIT 50""",

    "layout_compact_small_files" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "sketch_mg_heavy" ->
      """WITH t AS (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS item
                    FROM documents),
              n AS (SELECT count(*) AS tot FROM t)
         SELECT item, count(*) AS freq
         FROM t, n GROUP BY item, tot
         HAVING count(*) * 40 > tot
         ORDER BY freq DESC, item ASC""",

    "ds_typed_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS sum_qty,
                CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS DOUBLE) / 100.0 AS sum_price
         FROM lineitem WHERE l_quantity > 10.0
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "sample_weighted_topk" ->
      """WITH f AS (SELECT lang, doc_id, n_chars,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM documents),
              m1 AS (SELECT lang, doc_id, n_chars,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT lang, doc_id, n_chars,
                       (h1 * h1) % 2147483647 AS h2 FROM m1),
              h AS (SELECT lang, doc_id, n_chars,
                      CAST((h2 * 69069 + 362437) % 2147483647 AS DOUBLE)
                        / CAST(n_chars AS DOUBLE) AS priority FROM m2),
              r AS (SELECT lang, doc_id, n_chars, priority,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY priority, doc_id) AS rn FROM h)
         SELECT lang, doc_id, n_chars, priority FROM r WHERE rn <= 10
         ORDER BY lang, doc_id""",

    "agg_winsorize" ->
      """WITH v AS (SELECT event_type, event_id,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events),
              nn AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
              r AS (SELECT v.event_type, v.cents, nn.n,
                           row_number() OVER (PARTITION BY v.event_type
                             ORDER BY cents, event_id) AS rn
                    FROM v JOIN nn USING (event_type)),
              b AS (SELECT event_type, min(cents) AS p05_cents,
                           max(cents) AS p95_cents
                    FROM r WHERE rn = (n * 5 + 99) // 100
                       OR rn = (n * 95 + 99) // 100
                    GROUP BY 1),
              c AS (SELECT v.event_type, cents, p05_cents, p95_cents,
                           greatest(least(cents, p95_cents), p05_cents) AS cl
                    FROM v JOIN b USING (event_type))
         SELECT event_type, count(*) AS n,
                CAST(p05_cents AS DOUBLE) / 100.0 AS p05,
                CAST(p95_cents AS DOUBLE) / 100.0 AS p95,
                CAST(sum(CASE WHEN cents < p05_cents THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clamped_low,
                CAST(sum(CASE WHEN cents > p95_cents THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_clamped_high,
                CAST(sum(cl) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
                  AS winsorized_mean
         FROM c GROUP BY event_type, p05_cents, p95_cents
         ORDER BY event_type""",

    "agg_share_of_total" ->
      """WITH m AS (SELECT event_type,
                           CAST(date_trunc('month', ts) AS DATE) AS month,
                           count(*) AS n,
                           sum(CAST(round(value * 100, 0) AS BIGINT)) AS c
                    FROM events GROUP BY 1, 2),
              w AS (SELECT event_type, month, n, c,
                           sum(c) OVER (PARTITION BY month) AS mc,
                           sum(c) OVER () AS tc
                    FROM m)
         SELECT event_type, month, n,
                CAST(c AS DOUBLE) / 100.0 AS sum_value,
                CAST(c AS DOUBLE) / CAST(mc AS DOUBLE) AS share_of_month,
                CAST(c AS DOUBLE) / CAST(tc AS DOUBLE) AS share_of_total
         FROM w ORDER BY event_type, month""",

    "ts_cross_sectional_rank" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, close,
                           lag(close, 1) OVER (PARTITION BY event_type
                                               ORDER BY date) AS prev_close
                    FROM b),
              p AS (SELECT event_type, date,
                           (close - prev_close) / prev_close * 100.0
                             AS return_pct
                    FROM r WHERE prev_close IS NOT NULL)
         SELECT date, event_type, return_pct,
                rank() OVER (PARTITION BY date
                             ORDER BY return_pct DESC, event_type ASC)
                  AS day_rank
         FROM p ORDER BY date, event_type""",

    "ts_rolling_corr" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              x AS (SELECT date, CAST(round(close * 100, 0) AS BIGINT) AS cx
                    FROM b WHERE event_type = 'purchase'),
              y AS (SELECT date, CAST(round(close * 100, 0) AS BIGINT) AS cy
                    FROM b WHERE event_type = 'view'),
              j AS (SELECT x.date, cx, cy FROM x JOIN y USING (date)),
              m AS (SELECT date,
                           count(*) OVER w AS n,
                           sum(cx) OVER w AS sx, sum(cy) OVER w AS sy,
                           sum(cx * cx) OVER w AS sxx,
                           sum(cy * cy) OVER w AS syy,
                           sum(cx * cy) OVER w AS sxy
                    FROM j
                    WINDOW w AS (ORDER BY date
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         SELECT date,
                CASE WHEN n = 20 AND 20 * sxx - sx * sx > 0
                              AND 20 * syy - sy * sy > 0
                     THEN CAST(20 * sxy - sx * sy AS DOUBLE)
                          / (sqrt(CAST(20 * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(20 * syy - sy * sy AS DOUBLE)))
                END AS corr_20
         FROM m ORDER BY date""",

    "olap_skyline_parts" ->
      """WITH c AS (SELECT p_brand, p_size, min(p_retailprice) AS p_retailprice
                    FROM part GROUP BY 1, 2)
         SELECT p_brand, p_size, p_retailprice FROM c a
         WHERE NOT EXISTS (SELECT 1 FROM c b
                           WHERE b.p_brand = a.p_brand
                             AND b.p_size >= a.p_size
                             AND b.p_retailprice <= a.p_retailprice
                             AND (b.p_size > a.p_size
                                  OR b.p_retailprice < a.p_retailprice))
         ORDER BY p_brand, p_size""",

    "ts_interval_coverage" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                            epoch_us(ts) + 1800000000 AS e
                     FROM events),
              m AS (SELECT user_id, s, e,
                           max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm
                    FROM iv),
              i AS (SELECT user_id, s, e,
                           sum(CASE WHEN pm IS NULL OR s > pm
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island
                    FROM m),
              g AS (SELECT user_id, island, min(s) AS st, max(e) AS en
                    FROM i GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_intervals,
                CAST(sum(en - st) AS BIGINT) AS covered_us
         FROM g GROUP BY 1 ORDER BY user_id""",

    "sort_topk_newest" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
                l_extendedprice
         FROM lineitem
         ORDER BY ship_date DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",

    "cal_busday_offset" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS start_date
                    FROM orders),
              r AS (SELECT start_date,
                           CASE WHEN isodow(start_date) - 1 >= 5
                                THEN start_date
                                  + CAST(7 - (isodow(start_date) - 1)
                                         AS INT)
                                ELSE start_date END AS rolled
                    FROM d)
         SELECT start_date,
                rolled + CAST(10 + 2 * (((isodow(rolled) - 1) + 10) // 5)
                              AS INT) AS busday10
         FROM r ORDER BY start_date""",

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

    // The oracle carries the same explicit holiday-date list the engine
    // generated (both sides then agree by construction on the *rules*,
    // which the spec pins independently against hand-written NYSE dates).
    "cal_busday_nyse" -> {
      val dates = graft.cal.NyseCalendar.defaultDateLiterals
        .map(d => s"DATE '$d'").mkString(", ")
      s"""WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS start_date
                     FROM orders),
               g AS (SELECT start_date,
                            CAST(unnest(generate_series(start_date,
                                 start_date + 29, INTERVAL 1 DAY)) AS DATE)
                              AS day
                     FROM d)
          SELECT start_date,
                 CAST(count(*) FILTER (WHERE isodow(day) <= 5
                        AND day NOT IN ($dates)) AS INT) AS busdays
          FROM g GROUP BY 1 ORDER BY 1"""
    },

    "cal_weekday_filter" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS date, count(*) AS n_events
                        FROM events GROUP BY 1)
         SELECT date, isodow(date) AS dow, n_events
         FROM daily
         WHERE date < (SELECT max(date) FROM daily) AND isodow(date) <= 5
         ORDER BY date""",

    "fn_string_casing" ->
      """SELECT n_nationkey, lower(n_name) AS lower_name,
                upper(n_name) AS upper_name,
                concat(upper(substr(lower(n_name), 1, 1)),
                       substr(lower(n_name), 2)) AS capitalized,
                concat('nation: ', lower(n_name), ' (',
                       CAST(n_nationkey AS VARCHAR), ')') AS label,
                CAST(length(n_name) AS BIGINT) AS name_len
         FROM nation ORDER BY n_nationkey""",

    "restructure_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS date,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'error') AS error,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "restructure_unpivot_ohlc" ->
      """WITH b AS (SELECT CAST(ts AS DATE) AS date,
                           arg_min(value, ts) AS open, max(value) AS high,
                           min(value) AS low, arg_max(value, ts) AS close
                    FROM events WHERE event_type = 'purchase' GROUP BY 1)
         SELECT date, metric, value FROM (
           SELECT date, 'open' AS metric, open AS value FROM b
           UNION ALL SELECT date, 'high', high FROM b
           UNION ALL SELECT date, 'low', low FROM b
           UNION ALL SELECT date, 'close', close FROM b)
         ORDER BY date, metric""",

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

    "ingest_av_fx_json" -> {
      val path = "'$.\"Time Series FX (Daily)\".\"' || d || '\""
      s"""WITH p AS (SELECT '${AvJson.fxFixture}' AS j),
               k AS (SELECT unnest(json_keys(j, '$$."Time Series FX (Daily)"')) AS d, j
                     FROM p)
          SELECT CAST(d AS DATE) AS date,
                 CAST(j->>($path."1. open"') AS DOUBLE) AS open,
                 CAST(j->>($path."2. high"') AS DOUBLE) AS high,
                 CAST(j->>($path."3. low"') AS DOUBLE) AS low,
                 CAST(j->>($path."4. close"') AS DOUBLE) AS close
          FROM k ORDER BY date"""
    },

    // replays graft.sources.SeriesGen bit-for-bit: the affine→square→affine
    // spread in exact BIGINT steps, prices as one int→double conversion +
    // one correctly-rounded division (both IEEE-exact on each engine)
    "source_dsv2_series" ->
      s"""WITH ${duckSeriesBars("('SPY'), ('QQQ')", "2026-02-02", "2026-03-31")}
         SELECT symbol, trade_date, open, high, low, close, volume
         FROM bars ORDER BY symbol, trade_date""",

    "source_dsv2_agg_pushdown" ->
      s"""WITH ${duckSeriesBars("('SPY'), ('QQQ'), ('IWM')", "2026-01-05", "2026-03-31")}
         SELECT symbol, count(*) AS n_days, min(low) AS min_low,
                max(high) AS max_high, max(volume) AS max_volume
         FROM bars GROUP BY 1 ORDER BY 1""",

    // the streaming read of the same connector must converge to the batch
    // semantics: monthly aggregate over the full revealed range
    "stream_dsv2_source" ->
      s"""WITH ${duckSeriesBars("('SPY'), ('QQQ')", "2026-01-05", "2026-02-27")}
         SELECT symbol, date_trunc('month', trade_date) AS month,
                count(*) AS n_days,
                CAST(sum(CAST(round(close * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_close,
                min(low) AS min_low, max(high) AS max_high
         FROM bars GROUP BY 1, 2 ORDER BY 1, 2""",

    "json_props_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1""",

    // the partitioned layout changes the SCAN, not the answer
    "layout_partition_prune" ->
      """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY 1""",

    // the bucketed layout changes the PLAN, not the answer: the oracle is
    // the plain join+agg
    "layout_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",

    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base_price,
                 CAST(sum(${Exact.revenueSql}) AS DOUBLE) AS sum_disc_price,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_price,
                 CAST(sum(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_disc,
                 count(*) AS n
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-31'
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "agg_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // HLL registers replayed exactly: same spread hash, bucket = hv mod 512,
    // rho = 23 - bitlength(hv div 512) (bin() is minimal-width), registers
    // as max(rho), estimate from the exact BIGINT S = sum 2^(32-r) with one
    // int->double conversion + one IEEE division. The ALL row recomputes
    // registers directly from all rows — max is associative, so the
    // engine's hll_merge of group sketches must equal it bit-for-bit.
    "sketch_hll_distinct" ->
      """WITH f AS (SELECT event_type, user_id,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(user_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM events),
              m1 AS (SELECT event_type, user_id,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT event_type, user_id, (h1 * h1) % 2147483647 AS h2
                     FROM m1),
              m3 AS (SELECT event_type, user_id,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT event_type, hv % 512 AS bucket,
                      CASE WHEN hv // 512 = 0 THEN 23
                           ELSE 23 - length(bin(hv // 512)) END AS rho
                    FROM m3),
              regs AS (SELECT event_type, bucket, max(rho) AS r
                       FROM r GROUP BY 1, 2),
              sq AS (SELECT event_type,
                       CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT)
                         + (512 - count(*)) * CAST(4294967296 AS BIGINT) AS s,
                       512 - count(*) AS zero_regs
                     FROM regs GROUP BY 1),
              ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
                     FROM events GROUP BY 1),
              rall AS (SELECT bucket, max(rho) AS r FROM r GROUP BY 1),
              sqall AS (SELECT
                          CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT)
                            + (512 - count(*)) * CAST(4294967296 AS BIGINT) AS s,
                          512 - count(*) AS zero_regs
                        FROM rall),
              exall AS (SELECT count(DISTINCT user_id) AS n_exact FROM events),
              u AS (SELECT sq.event_type AS scope, sq.s, sq.zero_regs,
                           ex.n_exact
                    FROM sq JOIN ex ON sq.event_type = ex.event_type
                    UNION ALL
                    SELECT 'ALL', sqall.s, sqall.zero_regs, exall.n_exact
                    FROM sqall, exall)
         SELECT scope,
                (((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                    + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE)))
                  * CAST(512 AS DOUBLE)) * CAST(512 AS DOUBLE))
                  * CAST(4294967296 AS DOUBLE) / CAST(s AS DOUBLE) AS hll_est,
                CAST(zero_regs AS BIGINT) AS zero_regs, n_exact
         FROM u ORDER BY scope""",

    // identical estimator arithmetic: k smallest distinct portable hashes,
    // (k-1)*M/h_k in left-associated double ops on both engines
    "sketch_kmv_distinct" ->
      """WITH f AS (SELECT DISTINCT
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(l_partkey AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM lineitem),
              m1 AS (SELECT (h0 * 1103515245 + 12345) % 2147483647 AS h1
                     FROM f),
              m2 AS (SELECT (h1 * h1) % 2147483647 AS h2 FROM m1),
              h AS (SELECT DISTINCT (h2 * 69069 + 362437) % 2147483647 AS hv
                    FROM m2),
              t AS (SELECT hv FROM h ORDER BY hv LIMIT 256)
         SELECT CAST(count(*) AS BIGINT) AS k_actual,
                CAST(max(hv) AS BIGINT) AS kth_hash,
                CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                     ELSE CAST(count(*) - 1 AS DOUBLE) * 2147483647.0
                          / CAST(max(hv) AS DOUBLE) END AS est_distinct
         FROM t""",

    "join_semi_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
           AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_returnflag = 'R')
         GROUP BY 1 ORDER BY 1""",

    "agg_value_deciles" ->
      """WITH r AS (SELECT event_type, event_id, value,
                      CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS BIGINT) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS cnt
                    FROM events)
         SELECT event_type, CAST(q AS BIGINT) AS decile, value
         FROM r, unnest(generate_series(1, 9)) AS t(q)
         WHERE ((cnt - 1) * q) // 10 + 1 = rn
         ORDER BY event_type, decile""",

    "agg_rollup_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_qty,
                CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                  AS BIGINT) AS lvl
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY lvl, l_returnflag ASC NULLS FIRST,
                  l_linestatus ASC NULLS FIRST""",

    "join_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                 o_orderpriority,
                 CAST(sum(${Exact.revenueSql}) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND CAST(o_orderdate AS DATE) < DATE '1998-07-01'
            AND CAST(l_shipdate AS DATE) > DATE '1998-07-01'
          GROUP BY 1, 2, 3
          ORDER BY revenue DESC, l_orderkey ASC
          LIMIT 10""",

    "olap_abc_classification" ->
      """WITH rev AS (SELECT l_partkey,
                             CAST(sum(CAST(round(l_extendedprice * 100, 0)
                               AS BIGINT)) AS BIGINT) AS cents
                      FROM lineitem GROUP BY 1),
              t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents
                    FROM rev),
              c AS (SELECT l_partkey, cents,
                           CAST(sum(cents) OVER (ORDER BY cents DESC,
                             l_partkey ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum
                    FROM rev),
              k AS (SELECT c.cents,
                           CASE WHEN c.cum * 100 <= t.total_cents * 80
                                THEN 'A'
                                WHEN c.cum * 100 <= t.total_cents * 95
                                THEN 'B'
                                ELSE 'C' END AS abc_class,
                           t.total_cents
                    FROM c, t)
         SELECT abc_class, count(*) AS n_parts,
                CAST(sum(cents) AS BIGINT) AS class_cents,
                CAST(sum(cents) AS DOUBLE) / CAST(max(total_cents) AS DOUBLE)
                  AS revenue_share
         FROM k GROUP BY 1 ORDER BY 1""",

    "olap_percent_of_parent" ->
      """WITH pn AS (SELECT r.r_name, n.n_name,
                            CAST(sum(CAST(round(o.o_totalprice * 100, 0)
                              AS BIGINT)) AS BIGINT) AS nation_cents
                     FROM orders o
                     JOIN customer c ON c.c_custkey = o.o_custkey
                     JOIN nation n ON n.n_nationkey = c.c_nationkey
                     JOIN region r ON r.r_regionkey = n.n_regionkey
                     GROUP BY 1, 2),
              pr AS (SELECT r_name,
                            CAST(sum(nation_cents) AS BIGINT)
                              AS region_cents
                     FROM pn GROUP BY 1),
              t AS (SELECT CAST(sum(region_cents) AS BIGINT)
                      AS total_cents FROM pr)
         SELECT pn.r_name, pn.n_name, pn.nation_cents, pr.region_cents,
                CAST(pn.nation_cents AS DOUBLE)
                  / CAST(pr.region_cents AS DOUBLE) AS share_in_region,
                CAST(pr.region_cents AS DOUBLE)
                  / CAST(t.total_cents AS DOUBLE) AS region_share
         FROM pn JOIN pr ON pr.r_name = pn.r_name, t
         ORDER BY pn.r_name, pn.n_name""",

    "join_region_revenue" ->
      s"""SELECT n_name, CAST(sum(${Exact.revenueSql}) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
                       AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
                                              AND DATE '1996-12-31'
          GROUP BY 1 ORDER BY revenue DESC, n_name ASC""",

    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents GROUP BY text ORDER BY 1""",

    // explicit whitespace class (Java \s vs RE2 \s disagree on \x0B);
    // ASCII fold via translate, matching the engine's tokenizer contract
    "dedup_normalized" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
         FROM documents
         GROUP BY trim(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\r\f\x0B]+', ' ', 'g'))
         ORDER BY 1""",

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
             g AS (SELECT doc_id, CAST(len(th) - 1 AS BIGINT) AS n_grams,
                     CAST(len(list_distinct(list_transform(
                       generate_series(1, len(th) - 1), i ->
                         (th[i] * 31 + th[i+1]) % 2147483647)))
                       AS BIGINT) AS n_distinct_grams
                   FROM t)
         SELECT doc_id, n_grams, n_distinct_grams,
                CASE WHEN n_grams > 0
                     THEN CAST(1.0 AS DOUBLE)
                          - CAST(n_distinct_grams AS DOUBLE)
                            / CAST(n_grams AS DOUBLE) END AS dup_gram_ratio
         FROM g ORDER BY doc_id""",

    "sample_hash_split" ->
      """WITH f AS (SELECT doc_id,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM documents),
              m1 AS (SELECT doc_id,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT doc_id, (h1 * h1) % 2147483647 AS h2 FROM m1),
              b AS (SELECT doc_id,
                      ((h2 * 69069 + 362437) % 2147483647) % 100 AS bucket
                    FROM m2)
         SELECT CASE WHEN bucket < 90 THEN 'train'
                     WHEN bucket < 95 THEN 'validation'
                     ELSE 'test' END AS split,
                count(*) AS n_docs, min(doc_id) AS min_doc_id,
                max(doc_id) AS max_doc_id
         FROM b GROUP BY 1 ORDER BY 1""",

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id,
                      CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS BIGINT) AS n
                    FROM documents),
              c AS (SELECT doc_id, n,
                      CAST(sum(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n AS BIGINT) AS tok_start
                    FROM t),
              e AS (SELECT doc_id, n, tok_start,
                      unnest(generate_series(tok_start // 256,
                        (tok_start + n - 1) // 256)) AS seq_id
                    FROM c WHERE n > 0)
         SELECT seq_id, count(*) AS n_docs,
                CAST(sum(least(tok_start + n, (seq_id + 1) * 256)
                       - greatest(tok_start, seq_id * 256)) AS BIGINT)
                  AS n_tokens,
                min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         FROM e GROUP BY 1 ORDER BY 1""",

    "sample_temperature" ->
      """WITH n AS (SELECT lang, count(*) AS n_docs FROM documents
                    GROUP BY 1),
              m AS (SELECT max(n_docs) AS nmax FROM n)
         SELECT lang, n_docs,
                sqrt(CAST(n_docs AS DOUBLE)) / sqrt(CAST(nmax AS DOUBLE))
                  AS rel_weight,
                CAST(floor(1000.0 * (sqrt(CAST(n_docs AS DOUBLE))
                       / sqrt(CAST(nmax AS DOUBLE)))) AS BIGINT)
                  AS target_docs
         FROM n, m ORDER BY lang""",

    "sample_mixture_balance" ->
      """WITH f AS (SELECT doc_id, lang,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM documents),
              m1 AS (SELECT doc_id, lang,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT doc_id, lang, (h1 * h1) % 2147483647 AS h2 FROM m1),
              hv AS (SELECT doc_id, lang,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
                        AS rn
                    FROM hv),
              c AS (SELECT lang, count(*) AS cnt,
                      CAST(CASE lang WHEN 'en' THEN 5 WHEN 'es' THEN 2
                           ELSE 1 END AS BIGINT) AS wt
                    FROM documents GROUP BY 1),
              m AS (SELECT min(cnt * 10 // wt) AS m FROM c),
              q AS (SELECT lang, wt * m // 10 AS k FROM c, m)
         SELECT r.lang, count(*) AS n_selected,
                min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
                CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
         FROM r JOIN q USING (lang) WHERE rn <= k
         GROUP BY 1 ORDER BY 1""",

    "pipeline_filter_funnel" -> {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, lang,
                       regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents),
              s AS (SELECT doc_id, lang,
                      CAST(len(toks) AS BIGINT) AS n_tokens,
                      CAST(len(list_filter(toks, t -> list_contains($stops, t)))
                        AS BIGINT) AS n_stop,
                      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                    FROM t),
              f AS (SELECT doc_id,
                      lang = 'en' AS c1,
                      CASE WHEN n_tokens > 0
                           THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                           ELSE CAST(0 AS DOUBLE) END AS stop_ratio,
                      CASE WHEN n_tokens > 0
                           THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                           ELSE CAST(0 AS DOUBLE) END AS distinct_ratio,
                      n_tokens
                    FROM s),
              fl AS (SELECT doc_id, c1,
                       c1 AND n_tokens BETWEEN 20 AND 500 AS c2,
                       c1 AND n_tokens BETWEEN 20 AND 500
                          AND stop_ratio >= CAST(0.05 AS DOUBLE) AS c3,
                       c1 AND n_tokens BETWEEN 20 AND 500
                          AND stop_ratio >= CAST(0.05 AS DOUBLE)
                          AND distinct_ratio >= CAST(0.3 AS DOUBLE) AS c4
                     FROM f)
         SELECT stage, n_docs, sum_doc_id FROM (
           SELECT 's0_all' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id FROM fl
           UNION ALL
           SELECT 's1_lang', CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN c1 THEN doc_id ELSE 0 END) AS BIGINT) FROM fl
           UNION ALL
           SELECT 's2_length', CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN c2 THEN doc_id ELSE 0 END) AS BIGINT) FROM fl
           UNION ALL
           SELECT 's3_stopwords', CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN c3 THEN doc_id ELSE 0 END) AS BIGINT) FROM fl
           UNION ALL
           SELECT 's4_repetition', CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(CASE WHEN c4 THEN doc_id ELSE 0 END) AS BIGINT) FROM fl
         ) ORDER BY stage"""
    },

    // the oracle counts triangles by the direct ordered triple join
    // (u < v < w via the canonical edge direction) — a different
    // algorithm from the engine's degree-ordered orientation, same count
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              deg AS (SELECT n, count(*) AS d
                      FROM (SELECT u AS n FROM e
                            UNION ALL SELECT v AS n FROM e)
                      GROUP BY 1),
              t AS (SELECT count(*) AS n_triangles
                    FROM e e1
                    JOIN e e2 ON e2.u = e1.v
                    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
              s AS (SELECT count(*) AS n_nodes,
                           CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
                    FROM deg),
              m AS (SELECT count(*) AS n_edges FROM e)
         SELECT s.n_nodes, m.n_edges, t.n_triangles,
                CAST(3 AS DOUBLE) * CAST(t.n_triangles AS DOUBLE)
                  / CAST(s.n_wedges AS DOUBLE) AS transitivity
         FROM s, m, t""",

    "graph_degree_distribution" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              deg AS (SELECT u AS n, count(*) AS d FROM e GROUP BY 1)
         SELECT length(bin(d)) - 1 AS bucket, count(*) AS n_nodes,
                CAST(min(d) AS BIGINT) AS min_degree,
                CAST(max(d) AS BIGINT) AS max_degree
         FROM deg GROUP BY 1 ORDER BY 1""",

    "ts_realized_vol" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, c,
                           lag(c, 1) OVER (PARTITION BY event_type
                                           ORDER BY date) AS prev
                    FROM b),
              q AS (SELECT event_type,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS rq
                    FROM r WHERE prev IS NOT NULL)
         SELECT event_type, count(*) AS n,
                sqrt(CAST(CAST(sum(rq * rq) AS BIGINT) AS DOUBLE))
                  / CAST(1048576 AS DOUBLE) AS realized_vol
         FROM q GROUP BY 1 ORDER BY 1""",

    "graph_assortativity" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              deg AS (SELECT u AS n, count(*) AS d FROM e GROUP BY 1),
              wd AS (SELECT du.d AS ju, dv.d AS kv
                     FROM e JOIN deg du ON du.n = e.u
                            JOIN deg dv ON dv.n = e.v),
              ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
                            CAST(sum(ju * kv) AS HUGEINT) AS sjk,
                            CAST(sum(ju + kv) AS HUGEINT) AS sj,
                            CAST(sum(ju * ju + kv * kv) AS HUGEINT) AS sj2
                     FROM wd)
         SELECT m,
                CAST(CAST(4 * m * sjk - sj * sj AS BIGINT) AS DOUBLE)
                  / CAST(CAST(2 * m * sj2 - sj * sj AS BIGINT) AS DOUBLE)
                  AS assortativity
         FROM ag""",

    "mine_frequent_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM lineitem),
              ic AS (SELECT pk, count(*) AS n_item FROM items GROUP BY 1),
              p AS (SELECT a.pk AS part_a, b.pk AS part_b,
                           count(*) AS n_pair
                    FROM items a JOIN items b
                      ON a.ok = b.ok AND a.pk < b.pk
                    GROUP BY 1, 2)
         SELECT p.part_a, p.part_b, p.n_pair,
                ia.n_item AS n_a, ib.n_item AS n_b,
                CAST(p.n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
                  AS conf_a_b
         FROM p JOIN ic ia ON ia.pk = p.part_a
                JOIN ic ib ON ib.pk = p.part_b
         ORDER BY p.n_pair DESC, p.part_a, p.part_b LIMIT 50""",

    "graph_bfs_reach" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              d0 AS (SELECT min(src) AS node FROM e),
              d1 AS (SELECT DISTINCT e.dst AS node
                     FROM e JOIN d0 ON e.src = d0.node
                     WHERE e.dst NOT IN (SELECT node FROM d0)),
              d2 AS (SELECT DISTINCT e.dst AS node
                     FROM e JOIN d1 ON e.src = d1.node
                     WHERE e.dst NOT IN (SELECT node FROM d0)
                       AND e.dst NOT IN (SELECT node FROM d1)),
              d3 AS (SELECT DISTINCT e.dst AS node
                     FROM e JOIN d2 ON e.src = d2.node
                     WHERE e.dst NOT IN (SELECT node FROM d0)
                       AND e.dst NOT IN (SELECT node FROM d1)
                       AND e.dst NOT IN (SELECT node FROM d2))
         SELECT 0 AS distance, count(*) AS n_nodes FROM d0
         UNION ALL SELECT 1, count(*) FROM d1
         UNION ALL SELECT 2, count(*) FROM d2
         UNION ALL SELECT 3, count(*) FROM d3
         ORDER BY distance""",

    "graph_label_prop" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
              c1 AS (SELECT e.dst AS node, l.label, count(*) AS c
                     FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
              l1 AS (SELECT node, label FROM
                       (SELECT node, label,
                               row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, label ASC) AS rn
                        FROM c1) WHERE rn = 1),
              c2 AS (SELECT e.dst AS node, l.label, count(*) AS c
                     FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
              l2 AS (SELECT node, label FROM
                       (SELECT node, label,
                               row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, label ASC) AS rn
                        FROM c2) WHERE rn = 1)
         SELECT label AS community, count(*) AS n_nodes
         FROM l2 GROUP BY 1 ORDER BY 1""",

    "graph_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
                     FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              d0 AS (SELECT n, count(*) AS d FROM
                       (SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0)
                     GROUP BY 1),
              kv AS (SELECT d AS kth FROM
                       (SELECT d, n, row_number() OVER (ORDER BY d, n) AS rn,
                               count(*) OVER () AS cnt FROM d0)
                     WHERE rn = (cnt + 1) // 2),
              k1 AS (SELECT n FROM d0, kv WHERE d >= kth),
              e1 AS (SELECT u, v FROM e0
                     WHERE u IN (SELECT n FROM k1)
                       AND v IN (SELECT n FROM k1)),
              d1 AS (SELECT n, count(*) AS d FROM
                       (SELECT u AS n FROM e1 UNION ALL SELECT v AS n FROM e1)
                     GROUP BY 1),
              k2 AS (SELECT n FROM d1, kv WHERE d >= kth),
              e2 AS (SELECT u, v FROM e1
                     WHERE u IN (SELECT n FROM k2)
                       AND v IN (SELECT n FROM k2)),
              d2 AS (SELECT n, count(*) AS d FROM
                       (SELECT u AS n FROM e2 UNION ALL SELECT v AS n FROM e2)
                     GROUP BY 1),
              k3 AS (SELECT n FROM d2, kv WHERE d >= kth),
              e3 AS (SELECT u, v FROM e2
                     WHERE u IN (SELECT n FROM k3)
                       AND v IN (SELECT n FROM k3))
         SELECT 0 AS round,
                (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e0
                   UNION ALL SELECT v AS n FROM e0)) AS n_nodes,
                (SELECT count(*) FROM e0) AS n_edges
         UNION ALL
         SELECT 1, (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e1
                      UNION ALL SELECT v AS n FROM e1)),
                (SELECT count(*) FROM e1)
         UNION ALL
         SELECT 2, (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e2
                      UNION ALL SELECT v AS n FROM e2)),
                (SELECT count(*) FROM e2)
         UNION ALL
         SELECT 3, (SELECT count(DISTINCT n) FROM (SELECT u AS n FROM e3
                      UNION ALL SELECT v AS n FROM e3)),
                (SELECT count(*) FROM e3)
         ORDER BY round""",

    "graph_pagerank" -> {
      def iter(i: Int, prev: String): String =
        s"""c$i AS (SELECT src,
                      CAST(floor(rank / CAST(d AS DOUBLE)
                        * CAST(1000000000000 AS DOUBLE)) AS BIGINT) AS c
                    FROM $prev JOIN outdeg ON node_id = src),
             s$i AS (SELECT dst AS node_id, CAST(sum(c) AS BIGINT) AS sc
                     FROM edges JOIN c$i USING (src) GROUP BY 1),
             r$i AS (SELECT n2.node_id,
                       CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE)
                         * (CAST(coalesce(sc, 0) AS DOUBLE)
                            / CAST(1000000000000 AS DOUBLE)) AS rank
                     FROM nodes n2 LEFT JOIN s$i USING (node_id))"""
      s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src,
                        l_suppkey * 2 + 1 AS dst FROM lineitem),
              edges AS (SELECT src, dst FROM e0
                        UNION ALL SELECT e0.dst AS src, e0.src AS dst FROM e0),
              nodes AS (SELECT DISTINCT src AS node_id FROM edges),
              nn AS (SELECT count(*) AS n FROM nodes),
              outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
              r0 AS (SELECT node_id, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE)
                       AS rank FROM nodes, nn),
              ${iter(1, "r0")},
              ${iter(2, "r1")},
              ${iter(3, "r2")}
         SELECT node_id,
                CASE WHEN node_id % 2 = 0 THEN 'part' ELSE 'supplier' END
                  AS node_type,
                rank
         FROM r3 ORDER BY rank DESC, node_id LIMIT 50"""
    },

    "sketch_cms_topk" ->
      """WITH tok AS (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                     FROM documents),
              f AS (SELECT token,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(token, ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM tok),
              m1 AS (SELECT token,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT token, (h1 * h1) % 2147483647 AS h2 FROM m1),
              sp AS (SELECT token,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              bk AS (SELECT token, hv % 1024 AS b0,
                       ((hv * 69069 + 362437) % 2147483647) % 1024 AS b1,
                       ((hv * 1103515245 + 12345) % 2147483647) % 1024 AS b2
                     FROM sp),
              cms AS (SELECT r, bucket, count(*) AS counter FROM (
                        SELECT 0 AS r, b0 AS bucket FROM bk
                        UNION ALL SELECT 1, b1 FROM bk
                        UNION ALL SELECT 2, b2 FROM bk)
                      GROUP BY 1, 2),
              dtok AS (SELECT DISTINCT token, b0, b1, b2 FROM bk),
              probe AS (SELECT token, 0 AS r, b0 AS bucket FROM dtok
                        UNION ALL SELECT token, 1, b1 FROM dtok
                        UNION ALL SELECT token, 2, b2 FROM dtok),
              est AS (SELECT token, CAST(min(counter) AS BIGINT) AS est_n
                      FROM probe JOIN cms USING (r, bucket) GROUP BY 1),
              exact AS (SELECT token, count(*) AS exact_n FROM tok GROUP BY 1)
         SELECT token, exact_n, est_n FROM exact JOIN est USING (token)
         ORDER BY exact_n DESC, token ASC LIMIT 20""",

    "sketch_histogram_quantiles" ->
      """WITH v AS (SELECT event_type,
                      CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events),
              n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
              hist AS (SELECT event_type, cents // 1000 AS bin,
                         count(*) AS cnt
                       FROM v GROUP BY 1, 2),
              cum AS (SELECT event_type, bin,
                        CAST(sum(cnt) OVER (PARTITION BY event_type
                               ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum
                      FROM hist),
              ps AS (SELECT event_type, n, CAST(u.p AS BIGINT) AS p,
                       (n * u.p + 99) // 100 AS k
                     FROM n, unnest([50, 90, 99]) AS u(p)),
              est AS (SELECT cum.event_type, p, min(bin) AS est_bin
                      FROM cum JOIN ps USING (event_type)
                      WHERE cum >= k GROUP BY 1, 2),
              e2 AS (SELECT event_type, p,
                       CAST(est_bin * 1000 + 500 AS DOUBLE)
                         / CAST(100 AS DOUBLE) AS est_value
                     FROM est),
              r AS (SELECT event_type, cents,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY cents) AS rn
                    FROM v),
              ex AS (SELECT r.event_type, p,
                       CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE)
                         AS exact_value
                     FROM r JOIN ps USING (event_type) WHERE rn = k)
         SELECT event_type, p, est_value, exact_value
         FROM e2 JOIN ex USING (event_type, p) ORDER BY 1, 2""",

    "pipeline_pretrain_e2e" -> {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, lang, text,
                       regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents),
              s AS (SELECT doc_id, lang, text,
                      CAST(len(toks) AS BIGINT) AS n_tokens,
                      CAST(len(list_filter(toks, t2 -> list_contains($stops, t2)))
                        AS BIGINT) AS n_stop,
                      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                    FROM t),
              kept AS (SELECT doc_id, text, n_tokens FROM s
                       WHERE lang = 'en' AND n_tokens BETWEEN 20 AND 500
                         AND CASE WHEN n_tokens > 0
                             THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                             ELSE CAST(0 AS DOUBLE) END >= CAST(0.05 AS DOUBLE)
                         AND CASE WHEN n_tokens > 0
                             THEN CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                             ELSE CAST(0 AS DOUBLE) END >= CAST(0.3 AS DOUBLE)),
              ded AS (SELECT doc_id, n_tokens,
                        row_number() OVER (
                          PARTITION BY trim(regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))
                          ORDER BY doc_id) AS rn
                      FROM kept),
              d1 AS (SELECT doc_id, n_tokens FROM ded WHERE rn = 1),
              hf AS (SELECT doc_id, n_tokens,
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                           ch -> CAST(ascii(ch) AS BIGINT))),
                         (a, c) -> (a * 31 + c) % 2147483647) AS h0
                     FROM d1),
              hm AS (SELECT doc_id, n_tokens,
                       (((h0 * 1103515245 + 12345) % 2147483647)
                        * ((h0 * 1103515245 + 12345) % 2147483647))
                         % 2147483647 AS h2
                     FROM hf),
              train AS (SELECT doc_id, n_tokens AS n FROM hm
                        WHERE ((h2 * 69069 + 362437) % 2147483647) % 100 < 90),
              c AS (SELECT doc_id, n,
                      CAST(sum(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n AS BIGINT) AS tok_start
                    FROM train),
              e AS (SELECT doc_id, n, tok_start,
                      unnest(generate_series(tok_start // 256,
                        (tok_start + n - 1) // 256)) AS seq_id
                    FROM c WHERE n > 0)
         SELECT seq_id, count(*) AS n_docs,
                CAST(sum(least(tok_start + n, (seq_id + 1) * 256)
                       - greatest(tok_start, seq_id * 256)) AS BIGINT)
                  AS n_tokens,
                min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         FROM e GROUP BY 1 ORDER BY 1"""
    },

    "sql_api_dedup_report" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
              x AS (SELECT doc_id, $duckSimhash AS sh,
                      CASE WHEN len(th) >= 3 THEN
                        list_min(list_transform(generate_series(1, len(th) - 2), i ->
                          ((th[i] * 31 + th[i+1]) * 31 + th[i+2]) % 2147483647))
                      ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                             (a, b) -> a * 31 + b) % 2147483647
                      END AS fp
                    FROM h)
         SELECT sh, count(*) AS n_docs, min(doc_id) AS min_doc_id,
                min(fp) AS min_fingerprint
         FROM x GROUP BY 1 ORDER BY n_docs DESC, sh ASC LIMIT 25""",

    "text_inverted_index" ->
      """WITH t AS (SELECT doc_id,
                      regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                    FROM documents),
              p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS token
                    FROM t, unnest(generate_series(1, len(toks))) AS u(i))
         SELECT token, count(DISTINCT doc_id) AS df, count(*) AS total_tf,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc,
                CAST(sum((doc_id * 131071 + pos) % 2147483647) AS BIGINT)
                  AS postings_checksum
         FROM p GROUP BY 1 ORDER BY total_tf DESC, token ASC LIMIT 100""",

    "emb_centroid_drift" ->
      """WITH base AS (SELECT em.vec_id, d.lang, em.embedding
                       FROM embeddings em
                       JOIN documents d ON d.doc_id = em.vec_id),
              dims AS (SELECT lang, vec_id % 2 = 0 AS h1,
                              unnest(generate_series(1, 64)) AS i,
                              embedding
                       FROM base),
              q AS (SELECT lang, h1, i,
                           CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536)
                             AS BIGINT) AS q
                    FROM dims),
              pd AS (SELECT lang, i,
                       CAST(sum(CASE WHEN h1 THEN q ELSE 0 END) AS BIGINT)
                         AS s1,
                       CAST(sum(CASE WHEN NOT h1 THEN q ELSE 0 END)
                         AS BIGINT) AS s2,
                       CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n1,
                       CAST(sum(CASE WHEN NOT h1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS n2
                     FROM q GROUP BY 1, 2),
              dd AS (SELECT lang, n1, n2,
                            CAST(s1 * n2 - s2 * n1 AS HUGEINT) AS d
                     FROM pd),
              ag AS (SELECT lang, max(n1) AS n1, max(n2) AS n2,
                            sum(d * d) AS sd2
                     FROM dd GROUP BY 1)
         SELECT lang, n1, n2,
                sqrt(CAST(sd2 AS DOUBLE)) / CAST(n1 * n2 AS DOUBLE)
                  / CAST(65536 AS DOUBLE) AS drift
         FROM ag ORDER BY lang""",

    "emb_matryoshka_agreement" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                     FROM embeddings WHERE vec_id < 8),
              c AS (SELECT vec_id, embedding AS e
                    FROM embeddings WHERE vec_id >= 8),
              s AS (SELECT q.q_id, c.vec_id,
                      ${duckDot("qe", "e")}
                        / (sqrt(${duckDot("qe", "qe")})
                           * sqrt(${duckDot("e", "e")})) AS cos_full,
                      ${duckDotSub("qe", "e", "0")}
                        / (sqrt(${duckDotSub("qe", "qe", "0")})
                           * sqrt(${duckDotSub("e", "e", "0")})) AS cos_pre
                    FROM q, c),
              f AS (SELECT q_id, vec_id FROM
                      (SELECT q_id, vec_id, row_number() OVER
                         (PARTITION BY q_id
                          ORDER BY cos_full DESC, vec_id ASC) AS rn
                       FROM s) WHERE rn = 1),
              p AS (SELECT q_id, vec_id FROM
                      (SELECT q_id, vec_id, row_number() OVER
                         (PARTITION BY q_id
                          ORDER BY cos_pre DESC, vec_id ASC) AS rn
                       FROM s) WHERE rn = 1)
         SELECT f.q_id, f.vec_id AS top1_full, p.vec_id AS top1_prefix,
                f.vec_id = p.vec_id AS agree
         FROM f JOIN p ON p.q_id = f.q_id
         ORDER BY f.q_id""",

    "emb_dim_correlation" ->
      """WITH dims AS (SELECT vec_id, i,
                        CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536)
                          AS BIGINT) AS q
                      FROM (SELECT vec_id, embedding,
                              unnest(generate_series(1, 64)) AS i
                            FROM embeddings)),
              st AS (SELECT i, count(*) AS n, sum(q) AS s,
                       sum(q * q) AS ss
                     FROM dims GROUP BY 1),
              pr AS (SELECT a.i AS i, b.i AS j,
                       CAST(sum(a.q * b.q) AS BIGINT) AS sp
                     FROM dims a JOIN dims b ON a.vec_id = b.vec_id
                     WHERE a.i < b.i GROUP BY 1, 2),
              c AS (SELECT pr.i AS dim_i, pr.j AS dim_j,
                      (CAST(si.n AS DOUBLE) * CAST(sp AS DOUBLE)
                        - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE))
                      / (sqrt(CAST(si.n AS DOUBLE) * CAST(si.ss AS DOUBLE)
                              - CAST(si.s AS DOUBLE) * CAST(si.s AS DOUBLE))
                         * sqrt(CAST(si.n AS DOUBLE) * CAST(sj.ss AS DOUBLE)
                                - CAST(sj.s AS DOUBLE) * CAST(sj.s AS DOUBLE)))
                        AS corr
                    FROM pr JOIN st si ON pr.i = si.i
                            JOIN st sj ON pr.j = sj.i)
         SELECT dim_i, dim_j, corr, abs(corr) AS corr_abs
         FROM c ORDER BY corr_abs DESC, dim_i, dim_j LIMIT 10""",

    "link_block_levenshtein" ->
      """WITH d AS (SELECT doc_id, lang, text, n_chars // 16 AS blk,
                           split_part(text, ' ', 1) AS ft
                    FROM documents),
              p AS (SELECT a.lang,
                      CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
                    FROM d a JOIN d b
                      ON a.lang = b.lang AND a.blk = b.blk AND a.ft = b.ft
                     AND a.doc_id < b.doc_id)
         SELECT lang, count(*) AS n_pairs, min(lev) AS min_lev,
                CAST(sum(lev) AS BIGINT) AS sum_lev,
                CAST(sum(CASE WHEN lev <= 64 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_close
         FROM p GROUP BY 1 ORDER BY 1""",

    "link_block_damerau" ->
      """WITH d AS (SELECT doc_id, lang, text, n_chars // 16 AS blk,
                           split_part(text, ' ', 1) AS ft
                    FROM documents),
              p AS (SELECT a.lang,
                      CAST(damerau_levenshtein(a.text, b.text) AS BIGINT)
                        AS dl
                    FROM d a JOIN d b
                      ON a.lang = b.lang AND a.blk = b.blk AND a.ft = b.ft
                     AND a.doc_id < b.doc_id)
         SELECT lang, count(*) AS n_pairs, min(dl) AS min_dl,
                CAST(sum(dl) AS BIGINT) AS sum_dl,
                CAST(sum(CASE WHEN dl <= 64 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_close
         FROM p GROUP BY 1 ORDER BY 1""",

    "ts_calendar_gaps" ->
      """WITH b AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS date
                    FROM events),
              bounds AS (SELECT event_type, min(date) AS dmin,
                                max(date) AS dmax,
                                CAST(count(DISTINCT CASE WHEN isodow(date) <= 5
                                  THEN date END) AS BIGINT) AS n_observed
                         FROM b GROUP BY 1),
              days AS (SELECT event_type, n_observed,
                              CAST(unnest(generate_series(dmin, dmax,
                                INTERVAL 1 DAY)) AS DATE) AS day
                       FROM bounds),
              exp AS (SELECT event_type, count(*) AS n_expected,
                             max(n_observed) AS n_observed
                      FROM days WHERE isodow(day) <= 5 GROUP BY 1)
         SELECT event_type, n_expected, n_observed,
                n_expected - n_observed AS n_missing
         FROM exp ORDER BY event_type""",

    "ts_resample_interpolate" ->
      """WITH ev AS (SELECT event_type, ts, value FROM events),
              b AS (SELECT event_type, min(ts) AS tmin, max(ts) AS tmax
                    FROM ev GROUP BY 1),
              g AS (SELECT event_type,
                           unnest(generate_series(date_trunc('hour', tmin),
                             tmax, INTERVAL 6 HOUR)) AS ts
                    FROM b),
              bk AS (SELECT g.event_type, g.ts, e.ts AS bt, e.value AS bv
                     FROM g ASOF LEFT JOIN ev e
                       ON g.event_type = e.event_type AND e.ts <= g.ts),
              fw AS (SELECT g.event_type, g.ts, e.ts AS ft, e.value AS fv
                     FROM g ASOF LEFT JOIN ev e
                       ON g.event_type = e.event_type AND e.ts >= g.ts)
         SELECT bk.event_type, bk.ts, bk.bt, fw.ft,
                CASE WHEN bk.bt IS NULL THEN fw.fv
                     WHEN fw.ft IS NULL THEN bk.bv
                     WHEN fw.ft = bk.bt THEN bk.bv
                     ELSE bk.bv + (fw.fv - bk.bv)
                       * (CAST(epoch_us(bk.ts) - epoch_us(bk.bt) AS DOUBLE)
                          / CAST(epoch_us(fw.ft) - epoch_us(bk.bt)
                                 AS DOUBLE))
                END AS interp
         FROM bk JOIN fw ON fw.event_type = bk.event_type
                        AND fw.ts = bk.ts
         ORDER BY bk.event_type, bk.ts""",

    "ts_resample_grid_ffill" ->
      """WITH ev AS (SELECT event_type, ts, value FROM events),
              b AS (SELECT event_type, min(ts) AS tmin, max(ts) AS tmax
                    FROM ev GROUP BY 1),
              g AS (SELECT event_type,
                           unnest(generate_series(date_trunc('hour', tmin),
                             tmax, INTERVAL 6 HOUR)) AS ts
                    FROM b)
         SELECT g.event_type, g.ts, e.ts AS asof_ts, e.value AS asof_value
         FROM g ASOF LEFT JOIN ev e
           ON g.event_type = e.event_type AND e.ts <= g.ts
         ORDER BY g.event_type, g.ts""",

    "ts_pattern_ddu" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, date, c,
                           lag(c, 1) OVER w AS c1,
                           lag(c, 2) OVER w AS c2,
                           lag(c, 3) OVER w AS c3
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              m AS (SELECT event_type, date,
                           CASE WHEN c3 IS NOT NULL AND c2 < c3
                                 AND c1 < c2 AND c > c1
                                THEN 1 ELSE 0 END AS is_ddu
                    FROM l)
         SELECT event_type, count(*) AS n_days,
                CAST(sum(is_ddu) AS BIGINT) AS n_patterns,
                min(CASE WHEN is_ddu = 1 THEN date END) AS first_hit
         FROM m GROUP BY 1 ORDER BY 1""",

    "ts_running_distinct_users" ->
      """WITH fs AS (SELECT event_type, user_id,
                            min(CAST(ts AS DATE)) AS first_date
                     FROM events GROUP BY 1, 2),
              nn AS (SELECT event_type, first_date AS date,
                            count(*) AS n_new
                     FROM fs GROUP BY 1, 2)
         SELECT event_type, date, n_new,
                CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_distinct_users
         FROM nn ORDER BY event_type, date""",

    "wm_freshness_report" ->
      """WITH l AS (SELECT event_type, max(ts) AS last_event
                    FROM events GROUP BY 1),
              g AS (SELECT max(last_event) AS global_max FROM l)
         SELECT l.event_type, l.last_event,
                (epoch_us(g.global_max) - epoch_us(l.last_event)) // 1000000
                  AS lag_seconds
         FROM l, g ORDER BY l.event_type""",

    "ts_corr_matrix" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER (PARTITION BY event_type
                                           ORDER BY date) AS prev
                    FROM b),
              q AS (SELECT event_type, date,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS r
                    FROM r WHERE prev IS NOT NULL),
              p AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
                           x.r AS x, y.r AS y
                    FROM q x JOIN q y ON x.date = y.date
                     AND x.event_type < y.event_type),
              ag AS (SELECT type_a, type_b,
                            CAST(count(*) AS HUGEINT) AS n,
                            CAST(sum(x) AS HUGEINT) AS sx,
                            CAST(sum(y) AS HUGEINT) AS sy,
                            CAST(sum(x * y) AS HUGEINT) AS sxy,
                            CAST(sum(x * x) AS HUGEINT) AS sxx,
                            CAST(sum(y * y) AS HUGEINT) AS syy
                     FROM p GROUP BY 1, 2)
         SELECT type_a, type_b, CAST(n AS BIGINT) AS n,
                CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(n * sxx - sx * sx AS BIGINT) AS DOUBLE))
                     * sqrt(CAST(CAST(n * syy - sy * sy AS BIGINT)
                                 AS DOUBLE))) AS corr
         FROM ag ORDER BY type_a, type_b""",

    "ts_autocorr_lag1" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER w AS prev
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              q AS (SELECT event_type, date,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM r WHERE prev IS NOT NULL),
              p AS (SELECT event_type, x,
                           lag(x, 1) OVER (PARTITION BY event_type
                                           ORDER BY date) AS y
                    FROM q),
              ag AS (SELECT event_type,
                            CAST(count(*) AS HUGEINT) AS n,
                            CAST(sum(x) AS HUGEINT) AS sx,
                            CAST(sum(y) AS HUGEINT) AS sy,
                            CAST(sum(x * y) AS HUGEINT) AS sxy,
                            CAST(sum(x * x) AS HUGEINT) AS sxx,
                            CAST(sum(y * y) AS HUGEINT) AS syy
                     FROM p WHERE y IS NOT NULL GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n,
                CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(n * sxx - sx * sx AS BIGINT) AS DOUBLE))
                     * sqrt(CAST(CAST(n * syy - sy * sy AS BIGINT)
                                 AS DOUBLE)))
                  AS autocorr_lag1
         FROM ag ORDER BY event_type""",

    "ts_beta" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER (PARTITION BY event_type
                                           ORDER BY date) AS prev
                    FROM b),
              q AS (SELECT event_type, date,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS rq
                    FROM r WHERE prev IS NOT NULL),
              nn AS (SELECT count(DISTINCT event_type) AS n FROM q),
              mk AS (SELECT date, CAST(sum(rq) AS BIGINT) AS m,
                            count(*) AS k
                     FROM q GROUP BY 1),
              mkt AS (SELECT mk.date, mk.m, nn.n
                      FROM mk, nn WHERE mk.k = nn.n),
              ag AS (SELECT q.event_type,
                            CAST(count(*) AS HUGEINT) AS t,
                            CAST(sum(q.rq * mkt.m) AS HUGEINT) AS sxm,
                            CAST(sum(q.rq) AS HUGEINT) AS sx,
                            CAST(sum(mkt.m) AS HUGEINT) AS sm,
                            CAST(sum(mkt.m * mkt.m) AS HUGEINT) AS smm,
                            CAST(max(mkt.n) AS HUGEINT) AS n
                     FROM q JOIN mkt ON mkt.date = q.date
                     GROUP BY 1)
         SELECT event_type, CAST(t AS BIGINT) AS t,
                CAST(CAST(n * (t * sxm - sx * sm) AS BIGINT) AS DOUBLE)
                  / CAST(CAST(t * smm - sm * sm AS BIGINT) AS DOUBLE)
                  AS beta
         FROM ag ORDER BY event_type""",

    "ts_theil_sen" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS cents
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, cents,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY date) AS i
                    FROM b),
              p AS (SELECT x.event_type, x.i AS ia, y.i AS ib,
                           CAST(y.cents - x.cents AS DOUBLE)
                             / CAST(y.i - x.i AS DOUBLE) AS slope
                    FROM r x JOIN r y
                      ON x.event_type = y.event_type AND x.i < y.i),
              k AS (SELECT event_type, ia, ib, slope,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY slope, ia, ib) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS m
                    FROM p)
         SELECT event_type, slope AS theil_sen_slope,
                CAST(m AS BIGINT) AS n_pairs
         FROM k WHERE rn = (m + 1) // 2
         ORDER BY event_type""",

    "ts_changepoint" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS cents
                    FROM events GROUP BY 1, 2),
              p AS (SELECT event_type, date, cents,
                           CAST(row_number() OVER w AS BIGINT) AS i,
                           CAST(sum(cents) OVER (PARTITION BY event_type
                             ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS s
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              t AS (SELECT event_type, max(i) AS n,
                           CAST(sum(cents) AS BIGINT) AS sn
                    FROM p GROUP BY 1),
              j AS (SELECT p.event_type, p.date, t.n,
                           abs(t.n * p.s - p.i * t.sn) AS stat
                    FROM p JOIN t ON t.event_type = p.event_type),
              r AS (SELECT event_type, date, n, stat,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY stat DESC, date ASC) AS rn
                    FROM j)
         SELECT event_type, CAST(n AS BIGINT) AS n_days,
                date AS change_date, CAST(stat AS BIGINT) AS max_stat
         FROM r WHERE rn = 1 ORDER BY event_type""",

    "ts_streaks" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, date, close,
                           lag(close) OVER (PARTITION BY event_type
                                            ORDER BY date) AS prev
                    FROM b),
              d AS (SELECT event_type, date,
                           CASE WHEN close > prev THEN 'up' ELSE 'down' END
                             AS dir
                    FROM l WHERE prev IS NOT NULL),
              i AS (SELECT event_type, dir,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY date)
                           - row_number() OVER (PARTITION BY event_type, dir
                                                ORDER BY date) AS island
                    FROM d),
              s AS (SELECT event_type, dir, island, count(*) AS len
                    FROM i GROUP BY 1, 2, 3)
         SELECT event_type,
                max(CASE WHEN dir = 'up' THEN len END) AS max_up_streak,
                max(CASE WHEN dir = 'down' THEN len END) AS max_down_streak,
                CAST(sum(CASE WHEN dir = 'up' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_up_streaks,
                CAST(sum(CASE WHEN dir = 'down' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_down_streaks
         FROM s GROUP BY 1 ORDER BY 1""",

    "ts_locf_impute" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              th AS (SELECT * FROM b WHERE day(date) % 3 <> 0),
              sp AS (SELECT event_type,
                       CAST(unnest(generate_series(
                         CAST(min(date) AS TIMESTAMP),
                         CAST(max(date) AS TIMESTAMP),
                         INTERVAL 1 DAY)) AS DATE) AS date
                     FROM b GROUP BY event_type),
              j AS (SELECT sp.event_type, sp.date, th.close
                    FROM sp LEFT JOIN th USING (event_type, date))
         SELECT event_type, date, close,
                last_value(close IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY date
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS close_filled,
                close IS NULL AS is_imputed
         FROM j ORDER BY event_type, date""",

    "agg_mad_outliers" ->
      """WITH v AS (SELECT event_type,
                      CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events),
              n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
              r AS (SELECT event_type, cents,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY cents) AS rn
                    FROM v),
              med AS (SELECT r.event_type, cents AS med_cents
                      FROM r JOIN n USING (event_type)
                      WHERE rn = (n + 1) // 2),
              dev AS (SELECT v.event_type, v.cents, med.med_cents,
                        abs(v.cents - med.med_cents) AS adev
                      FROM v JOIN med USING (event_type)),
              r2 AS (SELECT event_type, adev,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY adev) AS rn
                     FROM dev),
              mad AS (SELECT r2.event_type, adev AS mad_cents
                      FROM r2 JOIN n USING (event_type)
                      WHERE rn = (n + 1) // 2)
         SELECT dev.event_type, count(*) AS n,
                CAST(med_cents AS DOUBLE) / CAST(100 AS DOUBLE)
                  AS median_value,
                CAST(mad_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS mad_value,
                CAST(sum(CASE WHEN adev > mad_cents * 3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
         FROM dev JOIN mad USING (event_type)
         GROUP BY dev.event_type, med_cents, mad_cents
         ORDER BY dev.event_type""",

    "set_ops_customers" ->
      """WITH o AS (SELECT o_custkey, year(o_orderdate) AS y FROM orders
                    WHERE year(o_orderdate) IN (1995, 1996)),
              f AS (SELECT o_custkey,
                      max(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS in95,
                      max(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS in96
                    FROM o GROUP BY 1)
         SELECT CAST(sum(in95) AS BIGINT) AS n_1995,
                CAST(sum(in96) AS BIGINT) AS n_1996,
                CAST(sum(in95 * in96) AS BIGINT) AS n_both,
                CAST(sum(in95 * (1 - in96)) AS BIGINT) AS n_only_1995,
                CAST(sum((1 - in95) * in96) AS BIGINT) AS n_only_1996,
                count(*) AS n_union
         FROM f""",

    "text_contamination" ->
      s"""WITH t AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
             g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                     generate_series(1, len(th) - 4), i ->
                       ((((th[i] * 31 + th[i+1]) % 2147483647 * 31
                          + th[i+2]) % 2147483647 * 31
                          + th[i+3]) % 2147483647 * 31
                          + th[i+4]) % 2147483647))) AS gram
                   FROM t),
             bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
             corp AS (SELECT doc_id, gram FROM g WHERE doc_id >= 20)
         SELECT doc_id, count(*) AS n_shared_grams
         FROM corp JOIN bench USING (gram)
         GROUP BY 1 ORDER BY 1""",

    "sample_dedup_aware_split" ->
      s"""WITH RECURSIVE
            h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
            s AS (SELECT doc_id, $duckSimhash AS simhash FROM h),
            b AS (SELECT doc_id, simhash, 0 AS band,
                         simhash & 65535 AS key FROM s
                  UNION ALL
                  SELECT doc_id, simhash, 1,
                         (simhash >> 16) & 65535 FROM s),
            cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                            x.simhash AS sh_a, y.simhash AS sh_b
                     FROM b x JOIN b y
                       ON x.band = y.band AND x.key = y.key
                          AND x.doc_id < y.doc_id),
            pairs AS (SELECT doc_a, doc_b FROM cand
                      WHERE bit_count(xor(sh_a, sh_b)) <= 1),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION
                      SELECT doc_b, doc_a FROM pairs),
            reach(n, m) AS (
              SELECT a, a FROM edges
              UNION
              SELECT a, b FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
            lab AS (SELECT n AS doc_id, CAST(min(m) AS BIGINT)
                      AS canonical_id
                    FROM reach GROUP BY 1),
            allx AS (SELECT d.doc_id,
                            coalesce(l.canonical_id, d.doc_id)
                              AS canonical_id
                     FROM documents d
                     LEFT JOIN lab l ON l.doc_id = d.doc_id),
            f AS (SELECT doc_id, canonical_id,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                        string_split(CAST(canonical_id AS VARCHAR), ''),
                        ch -> CAST(ascii(ch) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 2147483647) AS h0
                  FROM allx),
            m1 AS (SELECT doc_id, canonical_id,
                     (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
            m2 AS (SELECT doc_id, canonical_id,
                     (h1 * h1) % 2147483647 AS h2 FROM m1),
            bk AS (SELECT doc_id, canonical_id,
                     ((h2 * 69069 + 362437) % 2147483647) % 100 AS bucket
                   FROM m2)
         SELECT CASE WHEN bucket < 90 THEN 'train'
                     WHEN bucket < 95 THEN 'validation'
                     ELSE 'test' END AS split,
                count(*) AS n_docs,
                CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters,
                min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         FROM bk GROUP BY 1 ORDER BY 1""",

    "pipeline_quality_gate" -> qualityGateOracle,

    // identical semantics streamed per micro-batch (row-local rules, so
    // partial summaries add): same oracle
    "stream_quality_gate" -> qualityGateOracle,

    "dedup_passage_exact" ->
      """WITH ch AS (SELECT doc_id,
                            unnest(range(0, (n_chars + 63) // 64)) AS i,
                            text
                     FROM documents),
              c AS (SELECT doc_id,
                           substr(text, CAST(i * 64 + 1 AS INT), 64)
                             AS chunk
                    FROM ch),
              cc AS (SELECT doc_id, chunk FROM c WHERE length(chunk) > 0),
              d AS (SELECT chunk, count(*) AS occ FROM cc GROUP BY 1)
         SELECT cc.doc_id, count(*) AS n_chunks,
                CAST(sum(CASE WHEN d.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup,
                CAST(sum(CASE WHEN d.occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS dup_ratio
         FROM cc JOIN d ON d.chunk = cc.chunk
         GROUP BY 1 ORDER BY 1""",

    "text_ngram_novelty" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
              g AS (SELECT doc_id,
                           unnest(list_distinct(list_transform(
                             generate_series(1, len(th) - 1), i ->
                               (th[i] * 31 + th[i+1]) % 2147483647))) AS g
                    FROM h),
              f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1)
         SELECT gg.doc_id, count(*) AS n_grams,
                CAST(sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel,
                CAST(sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         FROM g gg JOIN f ON f.g = gg.g
         GROUP BY 1 ORDER BY 1""",

    "text_length_log_histogram" ->
      """SELECT length(bin(n_chars)) - 1 AS bucket,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents WHERE n_chars > 0
         GROUP BY 1 ORDER BY 1""",

    "ts_minmax_scale" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              m AS (SELECT event_type, min(c) AS cmin, max(c) AS cmax
                    FROM b GROUP BY 1)
         SELECT b.event_type, b.date,
                CASE WHEN m.cmax = m.cmin THEN CAST(0.5 AS DOUBLE)
                     ELSE CAST(b.c - m.cmin AS DOUBLE)
                          / CAST(m.cmax - m.cmin AS DOUBLE) END AS scaled
         FROM b JOIN m ON m.event_type = b.event_type
         ORDER BY b.event_type, b.date""",

    "text_surprisal_bits" ->
      """WITH toks AS (SELECT doc_id,
                unnest(regexp_extract_all(translate(text,
                  'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                  'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS tok
              FROM documents),
              freq AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
              j AS (SELECT t.doc_id,
                           32 - (length(bin(f.tf)) - 1) AS bits
                    FROM toks t JOIN freq f ON f.tok = t.tok)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(bits) AS BIGINT) AS sum_bits,
                CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  AS mean_bits
         FROM j GROUP BY 1 ORDER BY 1""",

    "text_vocab_topk" ->
      """SELECT token, count(*) AS freq FROM (
           SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
           FROM documents)
         GROUP BY 1 ORDER BY freq DESC, token ASC LIMIT 50""",

    "text_zipf_spectrum" ->
      """WITH freq AS (SELECT token, count(*) AS tf FROM (
                SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                FROM documents) GROUP BY 1),
              spec AS (SELECT CAST(length(bin(tf)) - 1 AS BIGINT) AS b,
                              count(*) AS n_tokens,
                              CAST(sum(tf) AS BIGINT) AS n_occurrences
                       FROM freq GROUP BY 1),
              pts AS (SELECT b,
                             CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS y
                      FROM spec),
              sl AS (SELECT CAST(count(*) * sum(b * y) - sum(b) * sum(y)
                              AS DOUBLE)
                            / CAST(count(*) * sum(b * b) - sum(b) * sum(b)
                                AS DOUBLE) AS zipf_slope
                     FROM pts)
         SELECT spec.b, spec.n_tokens, spec.n_occurrences, sl.zipf_slope
         FROM spec CROSS JOIN sl ORDER BY spec.b""",

    "text_token_stats" -> {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, text,
                            regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents)
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(regexp_extract_all(text, '[^\\s]+')) AS BIGINT)
                   AS n_ws_tokens,
                 CAST(coalesce(list_sum(list_transform(toks,
                   t -> CAST(ceil(length(t) / 4.0) AS BIGINT))), 0)
                   AS BIGINT) AS n_subwords,
                 CAST(len(list_filter(toks, t -> list_contains($stops, t)))
                   AS BIGINT) AS n_stopwords,
                 CASE WHEN len(toks) > 0 THEN
                   CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) END AS avg_word_len
          FROM t ORDER BY doc_id"""
    },

    "text_quality" -> {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, text,
                            regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents),
               r AS (SELECT doc_id,
                            CAST(len(toks) AS BIGINT) AS n_tokens,
                            CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                              AS DOUBLE) / CAST(length(text) AS DOUBLE)
                              AS punct_ratio,
                            CASE WHEN len(toks) > 0 THEN
                              CAST(len(list_filter(toks,
                                t -> list_contains($stops, t))) AS DOUBLE)
                                / CAST(len(toks) AS DOUBLE)
                            ELSE 0.0 END AS stopword_ratio
                     FROM t)
          SELECT doc_id, punct_ratio, stopword_ratio,
                 least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                   + (1.0 - punct_ratio) * 0.3
                   + stopword_ratio * 0.3 AS quality_score
          FROM r ORDER BY doc_id"""
    },

    "text_langid" -> {
      def markers(lang: String) = TextAnalysis.langMarkers.toMap.apply(lang)
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val scoreCols = TextAnalysis.langMarkers.map { case (lang, _) =>
        s"CAST(len(list_filter(toks, t -> list_contains(${markers(lang)}, t))) AS BIGINT) AS score_$lang"
      }.mkString(",\n                 ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val cascade = langs.map { lang =>
        val beats = langs.filter(_ != lang)
          .map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN score_$lang > 0 AND $beats THEN '$lang'"
      }.mkString("\n                 ")
      s"""WITH t AS (SELECT doc_id,
                            regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents),
               sc AS (SELECT doc_id,
                 $scoreCols
                 FROM t)
          SELECT doc_id, score_en, score_de, score_es, score_fr,
                 CASE $cascade
                 ELSE 'und' END AS predicted_lang
          FROM sc ORDER BY doc_id"""
    },

    "text_lang_confusion" -> {
      def markers(lang: String) = TextAnalysis.langMarkers.toMap.apply(lang)
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val scoreCols = TextAnalysis.langMarkers.map { case (lang, _) =>
        s"CAST(len(list_filter(toks, t -> list_contains(${markers(lang)}, t))) AS BIGINT) AS score_$lang"
      }.mkString(",\n                 ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val cascade = langs.map { lang =>
        val beats = langs.filter(_ != lang)
          .map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN score_$lang > 0 AND $beats THEN '$lang'"
      }.mkString("\n                 ")
      s"""WITH t AS (SELECT doc_id, lang,
                            regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
                     FROM documents),
               sc AS (SELECT doc_id, lang,
                 $scoreCols
                 FROM t),
               p AS (SELECT lang,
                       CASE $cascade
                       ELSE 'und' END AS predicted_lang
                     FROM sc)
          SELECT lang, predicted_lang, count(*) AS n
          FROM p GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "inc_backfill_missing" ->
      """WITH o AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
                    FROM orders),
              b AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
              spine AS (SELECT CAST(unnest(generate_series(lo, hi,
                               INTERVAL 1 DAY)) AS DATE) AS d FROM b),
              m AS (SELECT d FROM spine
                    WHERE d NOT IN (SELECT d FROM o))
         SELECT CAST(date_trunc('month', d) AS DATE) AS month,
                count(*) AS n_missing, min(d) AS first_missing,
                max(d) AS last_missing
         FROM m GROUP BY 1 ORDER BY 1""",

    "window_value_positions" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2)
         SELECT event_type, date, close,
                first_value(close) OVER wf AS first_close,
                last_value(close) OVER wf AS last_close,
                nth_value(close, 3) OVER wf AS third_close,
                lead(close, 2) OVER w AS lead2,
                lag(close, 2) OVER w AS lag2
         FROM b
         WINDOW w AS (PARTITION BY event_type ORDER BY date),
                wf AS (PARTITION BY event_type ORDER BY date
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
         ORDER BY event_type, date""",

    "text_pii_scrub" ->
      """WITH raw AS (SELECT doc_id,
                text ||
                CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com' ELSE '' END ||
                CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-867-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS raw
              FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(raw,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(raw, '\d{3}-\d{3}-\d{4}'))
                  AS BIGINT) AS n_phones,
                CAST(length(regexp_replace(regexp_replace(raw,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '[EMAIL]', 'g'), '\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'))
                  AS BIGINT) AS clean_len
         FROM raw ORDER BY doc_id""",

    "text_fingerprint" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents)
          SELECT doc_id,
                 CASE WHEN len(th) >= 3 THEN
                   list_min(list_transform(generate_series(1, len(th) - 2), i ->
                     ((th[i] * 31 + th[i+1]) * 31 + th[i+2]) % 2147483647))
                 ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                        (a, b) -> a * 31 + b) % 2147483647
                 END AS fingerprint
          FROM h ORDER BY doc_id""",

    "dedup_minhash_lsh" ->
      s"""WITH $duckMinhashCandCtes
          SELECT doc_a, doc_b,
                 CAST(len(list_filter(generate_series(1, 16), i ->
                   sig_a[i] = sig_b[i])) AS DOUBLE) / 16.0 AS est_jaccard
          FROM cand
          WHERE CAST(len(list_filter(generate_series(1, 16), i ->
                  sig_a[i] = sig_b[i])) AS DOUBLE) / 16.0 >= 0.5
          ORDER BY doc_a, doc_b""",

    "dedup_simhash" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents)
          SELECT doc_id, $duckSimhash AS simhash
          FROM h ORDER BY doc_id""",

    // oracle of the banded scale path: identical bucketing in SQL (two
    // 16-bit halves), then exact Hamming verify — on the full corpus
    "dedup_simhash_banded" -> bandedPairsOracle,

    // the streamed stateful detector's pair set == the batch banded
    // self-join's, by construction — same oracle text, shared
    "stream_lsh_neardup" -> bandedPairsOracle,

    // transitive closure over the banded pairs; min reachable id (incl.
    // self) per node == the min-label propagation fixpoint
    "dedup_cc_canonical" ->
      s"""WITH RECURSIVE
            h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
            s AS (SELECT doc_id, $duckSimhash AS simhash FROM h),
            b AS (SELECT doc_id, simhash, 0 AS band,
                         simhash & 65535 AS key FROM s
                  UNION ALL
                  SELECT doc_id, simhash, 1,
                         (simhash >> 16) & 65535 FROM s),
            cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                            x.simhash AS sh_a, y.simhash AS sh_b
                     FROM b x JOIN b y
                       ON x.band = y.band AND x.key = y.key
                          AND x.doc_id < y.doc_id),
            pairs AS (SELECT doc_a, doc_b FROM cand
                      WHERE bit_count(xor(sh_a, sh_b)) <= 1),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION
                      SELECT doc_b, doc_a FROM pairs),
            reach(n, m) AS (
              SELECT a, a FROM edges
              UNION
              SELECT a, b FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a)
          SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS canonical_id
          FROM reach GROUP BY 1 ORDER BY 1""",

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE
            h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
            s AS (SELECT doc_id, $duckSimhash AS simhash FROM h),
            b AS (SELECT doc_id, simhash, 0 AS band,
                         simhash & 65535 AS key FROM s
                  UNION ALL
                  SELECT doc_id, simhash, 1,
                         (simhash >> 16) & 65535 FROM s),
            cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                            x.simhash AS sh_a, y.simhash AS sh_b
                     FROM b x JOIN b y
                       ON x.band = y.band AND x.key = y.key
                          AND x.doc_id < y.doc_id),
            pairs AS (SELECT doc_a, doc_b FROM cand
                      WHERE bit_count(xor(sh_a, sh_b)) <= 1),
            edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                      UNION
                      SELECT doc_b, doc_a FROM pairs),
            reach(n, m) AS (
              SELECT a, a FROM edges
              UNION
              SELECT a, b FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
            lbl AS (SELECT n AS doc_id, min(m) AS canonical_id
                    FROM reach GROUP BY 1),
            cz AS (SELECT canonical_id, count(*) AS sz FROM lbl GROUP BY 1)
          SELECT sz, count(*) AS n_clusters,
                 CAST((sz - 1) * count(*) AS BIGINT) AS docs_to_drop
          FROM cz GROUP BY 1 ORDER BY 1""",

    "agg_concentration_hhi" ->
      """WITH s AS (SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
                           event_type,
                           CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
              m AS (SELECT month, event_type,
                           (c - (((c % 100) + 100) % 100)) // 100 AS d
                    FROM s)
         SELECT month, count(*) AS n_types,
                CAST(sum(d * d) AS DOUBLE)
                  / CAST(sum(d) * sum(d) AS DOUBLE) AS hhi
         FROM m GROUP BY 1 ORDER BY 1""",

    "window_range_frame" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS cents
                    FROM events GROUP BY 1, 2)
         SELECT event_type, date, cents,
                count(*) OVER w AS n_near,
                CAST(sum(cents) OVER w AS BIGINT) AS sum_near
         FROM b
         WINDOW w AS (PARTITION BY event_type ORDER BY cents
                      RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING)
         ORDER BY event_type, date""",

    "agg_gini" ->
      """WITH v AS (SELECT event_type, event_id,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events),
              r AS (SELECT event_type, cents,
                           CAST(row_number() OVER (PARTITION BY event_type
                             ORDER BY cents, event_id) AS BIGINT) AS rn
                    FROM v),
              g AS (SELECT event_type, count(*) AS n, sum(cents) AS sx,
                           sum(rn * cents) AS six
                    FROM r GROUP BY 1)
         SELECT event_type, n,
                CAST(2 * six - (n + 1) * sx AS DOUBLE)
                  / CAST(n * sx AS DOUBLE) AS gini
         FROM g ORDER BY 1""",

    "ts_seasonality_dow" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS cents
                    FROM events GROUP BY 1, 2),
              d AS (SELECT event_type, isodow(date) AS dow, count(*) AS n,
                           sum(cents) AS sc
                    FROM b GROUP BY 1, 2),
              t AS (SELECT event_type, count(*) AS tn, sum(cents) AS tc
                    FROM b GROUP BY 1)
         SELECT d.event_type, d.dow, d.n,
                CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS avg_close,
                (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)
                  / (CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE) / 100.0)
                  AS ratio_to_mean
         FROM d JOIN t ON d.event_type = t.event_type
         ORDER BY d.event_type, d.dow""",

    "dedup_simhash_pairs" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th
                     FROM documents WHERE doc_id < 250),
            s AS (SELECT doc_id, $duckSimhash AS simhash FROM h)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
          ORDER BY doc_a, doc_b""",

    "dedup_ngram_jaccard" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th
                     FROM documents WHERE doc_id < 150),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(
                           generate_series(1, len(th) - 1), i ->
                             (th[i] * 31 + th[i+1]) % 2147483647)) AS grams
                  FROM h)
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / CAST(len(a.grams) + len(b.grams)
                           - len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    AS jaccard
           FROM g a JOIN g b ON a.doc_id < b.doc_id)
         WHERE jaccard >= 0.10
         ORDER BY doc_a, doc_b""",

    "dedup_embedding_cosine" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e
                     FROM embeddings WHERE vec_id < 200)
          SELECT vec_a, vec_b, cosine FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ${duckDot("a.e", "b.e")}
                     / (sqrt(${duckDot("a.e", "a.e")})
                        * sqrt(${duckDot("b.e", "b.e")})) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
          WHERE cosine >= 0.35
          ORDER BY vec_a, vec_b""",

    "sim_bruteforce_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS eq
                     FROM embeddings WHERE vec_id < 10),
            d AS (SELECT query_id, vec_id,
                    ${duckDot("eq", "embedding")}
                      / (sqrt(${duckDot("eq", "eq")})
                         * sqrt(${duckDot("embedding", "embedding")})) AS cosine
                  FROM q JOIN embeddings ON vec_id <> query_id),
            r AS (SELECT query_id, vec_id, cosine,
                    CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
                  FROM d)
          SELECT query_id, rank, vec_id, cosine FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // Byte-exact frames: chunk the UTF-8 *byte* stream (512 hex chars =
    // 256 bytes), mirroring Spark's payload.grouped(256); char-based
    // substr would misalign frames on any non-ASCII text. CAST pins
    // list_sum's HUGEINT to int64.
    "mm_frame_sample" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents WHERE octet_length(encode(text)) > 0),
             f AS (SELECT media_id, h,
                          CAST(unnest(generate_series(0,
                            CAST(floor((nb - 1) / 256.0) AS INT)))
                            AS INT) AS frame_idx
                   FROM hx),
             c AS (SELECT media_id, frame_idx,
                          substr(h, frame_idx * 512 + 1, 512) AS ch
                   FROM f)
         SELECT media_id, frame_idx,
                CAST(length(ch) // 2 AS BIGINT) AS n_bytes,
                CAST(list_sum(${duckHexBytes("ch")}) % 2147483647
                     AS BIGINT) AS checksum
         FROM c ORDER BY media_id, frame_idx""",

    // same byte-exact frame chunking as mm_frame_sample, then lag-delta
    // cuts and rank-free islands over the checksum stream
    "mm_scene_cuts" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents WHERE octet_length(encode(text)) > 0),
             f AS (SELECT media_id, h,
                          CAST(unnest(generate_series(0,
                            CAST(floor((nb - 1) / 256.0) AS INT)))
                            AS INT) AS frame_idx
                   FROM hx),
             c AS (SELECT media_id, frame_idx,
                          substr(h, frame_idx * 512 + 1, 512) AS ch
                   FROM f),
             k AS (SELECT media_id, frame_idx,
                          CAST(list_sum(${duckHexBytes("ch")}) % 2147483647
                               AS BIGINT) AS checksum
                   FROM c),
             d AS (SELECT media_id, frame_idx, checksum,
                          lag(checksum) OVER (PARTITION BY media_id
                                              ORDER BY frame_idx) AS prev
                   FROM k),
             s AS (SELECT media_id, frame_idx,
                          sum(CASE WHEN prev IS NULL
                                     OR abs(checksum - prev) > 20000
                                   THEN 1 ELSE 0 END)
                            OVER (PARTITION BY media_id ORDER BY frame_idx
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS scene_idx
                   FROM d)
         SELECT media_id, CAST(scene_idx AS BIGINT) AS scene_idx,
                min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
                count(*) AS n_frames
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "sim_ivf_probe_topk" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS ec
                     FROM embeddings WHERE vec_id < 8),
            asg AS (SELECT centroid_id, vec_id, embedding FROM (
                      SELECT e.vec_id, c.centroid_id, e.embedding,
                        row_number() OVER (PARTITION BY e.vec_id ORDER BY
                          ${duckDot("e.embedding", "c.ec")}
                            / (sqrt(${duckDot("e.embedding", "e.embedding")})
                               * sqrt(${duckDot("c.ec", "c.ec")})) DESC,
                          c.centroid_id ASC) AS rn
                      FROM embeddings e CROSS JOIN c)
                    WHERE rn = 1),
            prb AS (SELECT query_id, centroid_id, emb_q FROM (
                      SELECT q.vec_id AS query_id, c.centroid_id,
                             q.embedding AS emb_q,
                        row_number() OVER (PARTITION BY q.vec_id ORDER BY
                          ${duckDot("q.embedding", "c.ec")}
                            / (sqrt(${duckDot("q.embedding", "q.embedding")})
                               * sqrt(${duckDot("c.ec", "c.ec")})) DESC,
                          c.centroid_id ASC) AS rn
                      FROM embeddings q CROSS JOIN c WHERE q.vec_id < 10)
                    WHERE rn <= 2),
            sc AS (SELECT p.query_id, a.vec_id,
                     ${duckDot("p.emb_q", "a.embedding")}
                       / (sqrt(${duckDot("p.emb_q", "p.emb_q")})
                          * sqrt(${duckDot("a.embedding", "a.embedding")}))
                       AS cosine
                   FROM prb p JOIN asg a USING (centroid_id)
                   WHERE a.vec_id <> p.query_id),
            r AS (SELECT query_id, vec_id, cosine,
                    CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
                  FROM sc)
          SELECT query_id, rank, vec_id, cosine FROM r
          WHERE rank <= 5 ORDER BY query_id, rank""",

    "sim_hyperplane_lsh" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(8, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      s"""SELECT bucket, count(*) AS n_vectors FROM (
            SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM embeddings)
          GROUP BY 1 ORDER BY 1"""
    },

    "sim_hyperplane_neardup" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(4, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH b AS (SELECT vec_id, embedding, $bits AS bucket
                     FROM embeddings)
          SELECT vec_a, vec_b, cosine FROM (
            SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
                   ${duckDot("a.embedding", "b2.embedding")}
                     / (sqrt(${duckDot("a.embedding", "a.embedding")})
                        * sqrt(${duckDot("b2.embedding", "b2.embedding")}))
                     AS cosine
            FROM b a JOIN b b2 ON a.bucket = b2.bucket
                               AND a.vec_id < b2.vec_id)
          WHERE cosine >= 0.30
          ORDER BY vec_a, vec_b"""
    },

    "stream_dedup_replay" ->
      """SELECT event_type, count(DISTINCT event_id) AS n_unique
         FROM events GROUP BY 1 ORDER BY 1""",

    // The stateful sessionizer's emitted set is deterministic: every
    // gap-closed session (a later same-user event exists past the gap),
    // plus each user's final session iff its event-time timeout
    // (session_end + gap, in ms — Spark tracks watermarks in millis) is
    // strictly below the final watermark (max ts - 1 hour). Expressed as
    // the batch sessionize SQL plus that one filter.
    "stream_sessionize_stateful" ->
      """WITH x AS (SELECT user_id, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                           THEN 1 ELSE 0 END AS is_new
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              y AS (SELECT user_id, ts, value,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                    FROM x),
              s AS (SELECT user_id, session_seq,
                      min(ts) AS session_start, max(ts) AS session_end,
                      count(*) AS n_events,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                        AS sum_value
                    FROM y GROUP BY 1, 2),
              s2 AS (SELECT *,
                       max(session_seq) OVER (PARTITION BY user_id)
                         AS last_seq
                     FROM s),
              m AS (SELECT (max(epoch_us(ts)) // 1000) - 3600000 AS wm_ms
                    FROM events)
         SELECT user_id, session_start, session_end, n_events, sum_value
         FROM s2, m
         WHERE session_seq < last_seq
            OR (epoch_us(session_end) // 1000) + 1800000 < wm_ms
         ORDER BY user_id, session_start""",

    "stream_tumbling_daily" ->
      """SELECT CAST(ts AS DATE) AS date, event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "agg_heatmap_2d" ->
      """WITH c AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS cc,
                           isodow(CAST(ts AS DATE)) AS dow
                    FROM events)
         SELECT (cc - ((cc % 10000) + 10000) % 10000) // 10000
                  AS value_band,
                CAST(dow AS BIGINT) AS dow, count(*) AS n,
                CAST(sum(cc) AS BIGINT) AS sum_cents
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",

    "agg_chi2_contingency" ->
      """WITH cells AS (SELECT event_type,
                               CAST(isodow(CAST(ts AS DATE)) AS BIGINT)
                                 AS dow,
                               count(*) AS o
                        FROM events GROUP BY 1, 2),
              rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
                     FROM cells GROUP BY 1),
              ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c
                     FROM cells GROUP BY 1),
              n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
              j AS (SELECT cells.event_type, cells.dow, cells.o,
                           rt.r, ct.c, n.n,
                           cells.o * n.n - rt.r * ct.c AS dev
                    FROM cells
                    JOIN rt ON rt.event_type = cells.event_type
                    JOIN ct ON ct.dow = cells.dow
                    CROSS JOIN n)
         SELECT event_type, dow, o, r, c,
                CAST(CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT)
                     AS BIGINT) AS chi2_num,
                n * r * c AS chi2_den,
                CAST(CAST(CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT)
                          AS BIGINT) AS DOUBLE)
                  / CAST(n * r * c AS DOUBLE) AS chi2_cell
         FROM j ORDER BY event_type, dow""",

    "dq_duplicate_pk_audit" -> {
      val tables = Seq(
        "customer" -> "c_custkey", "documents" -> "doc_id",
        "embeddings" -> "vec_id", "events" -> "event_id",
        "lineitem" -> "l_orderkey, l_linenumber", "nation" -> "n_nationkey",
        "orders" -> "o_orderkey", "part" -> "p_partkey",
        "region" -> "r_regionkey", "supplier" -> "s_suppkey")
      tables.map { case (t, k) =>
        s"""SELECT '$t' AS table_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
                   count(*) AS n_keys,
                   CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_keys,
                   CAST(sum(cnt - 1) AS BIGINT) AS n_excess_rows
            FROM (SELECT count(*) AS cnt FROM $t GROUP BY $k)"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    // same register arithmetic as sketch_hll_distinct, grouped per day
    "stream_hll_daily" ->
      """WITH f AS (SELECT CAST(ts AS DATE) AS date, user_id,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(user_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM events),
              m1 AS (SELECT date, user_id,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT date, user_id, (h1 * h1) % 2147483647 AS h2
                     FROM m1),
              m3 AS (SELECT date, user_id,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT date, hv % 512 AS bucket,
                      CASE WHEN hv // 512 = 0 THEN 23
                           ELSE 23 - length(bin(hv // 512)) END AS rho
                    FROM m3),
              regs AS (SELECT date, bucket, max(rho) AS r
                       FROM r GROUP BY 1, 2),
              sq AS (SELECT date,
                       CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT)
                         + (512 - count(*)) * CAST(4294967296 AS BIGINT) AS s,
                       512 - count(*) AS zero_regs
                     FROM regs GROUP BY 1)
         SELECT date,
                (((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                    + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE)))
                  * CAST(512 AS DOUBLE)) * CAST(512 AS DOUBLE))
                  * CAST(4294967296 AS DOUBLE) / CAST(s AS DOUBLE) AS hll_est,
                CAST(zero_regs AS BIGINT) AS zero_regs
         FROM sq ORDER BY date""",

    "stream_sliding_2d" ->
      """WITH e AS (SELECT event_type, value,
                           unnest([date_trunc('day', ts) - INTERVAL 1 DAY,
                                   date_trunc('day', ts)]) AS wstart
                    FROM events)
         SELECT CAST(wstart AS DATE) AS window_start, event_type,
                count(*) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_value
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",

    "stream_stream_join" ->
      """SELECT p.event_id, p.user_id, p.ts,
                v.ts AS view_ts, v.value AS view_value
         FROM events p JOIN events v
           ON p.event_type = 'purchase' AND v.event_type = 'view'
          AND p.user_id = v.user_id
          AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
         ORDER BY p.event_id, view_ts, view_value""",

    "asof_join_latest_view" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.ts,
                v.ts AS asof_ts, v.value AS asof_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.ts <= p.ts
         ORDER BY p.event_id""",

    "asof_join_exec" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.ts,
                v.ts AS asof_ts, v.value AS asof_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.ts <= p.ts
         ORDER BY p.event_id""",

    "stream_asof_enrich" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.ts,
                v.ts AS asof_ts, v.value AS asof_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.ts <= p.ts
         ORDER BY p.event_id""",

    "asof_join_next_view" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.ts,
                v.ts AS asof_ts, v.value AS asof_value
         FROM p ASOF LEFT JOIN v
           ON p.user_id = v.user_id AND v.ts >= p.ts
         ORDER BY p.event_id""",

    "asof_join_nearest_view" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view'),
              bk AS (SELECT p.event_id, p.user_id, p.ts,
                            b.ts AS bts, b.value AS bval
                     FROM p ASOF LEFT JOIN v b
                       ON p.user_id = b.user_id AND b.ts <= p.ts),
              fw AS (SELECT p.event_id, f.ts AS fts, f.value AS fval
                     FROM p ASOF LEFT JOIN v f
                       ON p.user_id = f.user_id AND f.ts >= p.ts)
         SELECT bk.event_id, bk.user_id, bk.ts,
                CASE WHEN bk.bts IS NULL THEN fw.fts
                     WHEN fw.fts IS NULL THEN bk.bts
                     WHEN epoch_us(bk.ts) - epoch_us(bk.bts)
                          <= epoch_us(fw.fts) - epoch_us(bk.ts)
                     THEN bk.bts ELSE fw.fts END AS asof_ts,
                CASE WHEN bk.bts IS NULL THEN fw.fval
                     WHEN fw.fts IS NULL THEN bk.bval
                     WHEN epoch_us(bk.ts) - epoch_us(bk.bts)
                          <= epoch_us(fw.fts) - epoch_us(bk.ts)
                     THEN bk.bval ELSE fw.fval END AS asof_value
         FROM bk JOIN fw ON fw.event_id = bk.event_id
         ORDER BY bk.event_id""",

    "asof_join_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view'),
              a AS (SELECT p.event_id, p.user_id, p.ts,
                           v.ts AS asof_ts, v.value AS asof_value
                    FROM p ASOF LEFT JOIN v
                      ON p.user_id = v.user_id AND v.ts <= p.ts)
         SELECT event_id, user_id, ts,
                CASE WHEN asof_ts >= ts - INTERVAL 30 MINUTE
                     THEN asof_ts END AS asof_ts,
                CASE WHEN asof_ts >= ts - INTERVAL 30 MINUTE
                     THEN asof_value END AS asof_value
         FROM a ORDER BY event_id""",

    "range_join_prior_views" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
              v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
         SELECT p.event_id, count(v.ts) AS n_in_range
         FROM p LEFT JOIN v
           ON v.user_id = p.user_id
          AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
         GROUP BY 1 ORDER BY 1""",

    "inc_gdpr_erasure" ->
      """WITH erase AS (SELECT DISTINCT user_id FROM events
                       WHERE user_id % 97 = 0),
              ev AS (SELECT 'events' AS table_name,
                CAST(count(*) FILTER (WHERE user_id IN
                  (SELECT user_id FROM erase)) AS BIGINT) AS n_erased,
                CAST(count(*) FILTER (WHERE user_id NOT IN
                  (SELECT user_id FROM erase)) AS BIGINT) AS n_kept
                FROM events),
              x AS (SELECT user_id, ts,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                           THEN 1 ELSE 0 END AS is_new
                    FROM events WHERE event_type = 'view'
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              sess AS (SELECT user_id,
                         CAST(sum(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_seq
                       FROM x),
              sg AS (SELECT user_id, session_seq FROM sess
                     GROUP BY 1, 2),
              se AS (SELECT 'view_sessions' AS table_name,
                CAST(count(*) FILTER (WHERE user_id IN
                  (SELECT user_id FROM erase)) AS BIGINT) AS n_erased,
                CAST(count(*) FILTER (WHERE user_id NOT IN
                  (SELECT user_id FROM erase)) AS BIGINT) AS n_kept
                FROM sg)
         SELECT * FROM ev UNION ALL SELECT * FROM se
         ORDER BY table_name""",

    "sessionize_events" ->
      """WITH x AS (SELECT user_id, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                           THEN 1 ELSE 0 END AS is_new
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              y AS (SELECT user_id, ts, value,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                    FROM x)
         SELECT user_id, session_seq,
                min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM y GROUP BY 1, 2 ORDER BY 1, 2""",

    "inc_scd2_pointintime" ->
      """WITH ch AS (SELECT user_id, event_id, ts, value FROM events
                     WHERE event_type = 'purchase' AND user_id < 50),
              d AS (SELECT user_id AS dim_user_id, ts AS valid_from,
                      value AS dim_value,
                      CAST(row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS BIGINT) AS dim_version
                    FROM ch),
              f AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'view' AND user_id < 50)
         SELECT f.event_id, f.user_id, f.ts, d.dim_version, d.dim_value,
                d.valid_from
         FROM f ASOF LEFT JOIN d
           ON f.user_id = d.dim_user_id AND d.valid_from <= f.ts
         ORDER BY f.event_id""",

    "sessionize_builtin_window" ->
      """WITH x AS (SELECT user_id, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                           THEN 1 ELSE 0 END AS is_new
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              y AS (SELECT user_id, ts, value,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                    FROM x)
         SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM y GROUP BY user_id, session_seq
         ORDER BY user_id, session_start""",

    // Byte-exact: enumerate the UTF-8 *bytes* of the payload (via hex
    // expansion), matching Spark's cast-to-binary — not codepoints, which
    // silently diverge the day a fixture gains non-ASCII text. The final
    // CAST pins list_sum's HUGEINT to int64.
    "mm_media_meta" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, 'txt' AS format,
                             hex(encode(text)) AS h,
                             CAST(octet_length(encode(text)) AS BIGINT)
                               AS n_bytes
                      FROM documents),
             b AS (SELECT media_id, format, n_bytes,
                          ${duckHexBytes("h")} AS bytes
                   FROM hx)
         SELECT media_id, format, n_bytes,
                CAST(64 + CASE WHEN n_bytes > 0 THEN bytes[1] % 64
                               ELSE 0 END AS INT) AS width,
                CAST(64 + CASE WHEN n_bytes > 0 THEN bytes[len(bytes)] % 64
                               ELSE 0 END AS INT) AS height,
                CAST(CASE WHEN n_bytes > 0
                          THEN list_sum(bytes) % 2147483647
                          ELSE 0 END AS BIGINT) AS checksum
         FROM b ORDER BY media_id""",

    // PNG is lossless: the decoded raster equals the encoded pixel
    // function, so the round-trip checksum is plain arithmetic here
    "mm_png_decode" ->
      """WITH dims AS (SELECT doc_id,
                              CAST(1 + doc_id % 8 AS INT) AS width,
                              CAST(1 + n_chars % 8 AS INT) AS height
                       FROM documents),
              xs AS (SELECT doc_id, width, height,
                            unnest(range(0, CAST(width AS BIGINT))) AS x
                     FROM dims),
              xy AS (SELECT doc_id, x,
                            unnest(range(0, CAST(height AS BIGINT))) AS y
                     FROM xs),
              px AS (SELECT doc_id,
                            sum((doc_id * 31 + x * 7 + y * 13) % 256) AS s
                     FROM xy GROUP BY 1)
         SELECT d.doc_id AS media_id, d.width, d.height,
                CAST(p.s % 2147483647 AS BIGINT) AS checksum
         FROM dims d JOIN px p ON p.doc_id = d.doc_id
         ORDER BY media_id""",

    // PCM is uncompressed: decoded samples equal the synthesized signal,
    // so the decoded energy is plain arithmetic here
    "mm_wav_decode" ->
      """WITH d AS (SELECT doc_id, CAST(32 + doc_id % 64 AS BIGINT) AS n
                    FROM documents),
              sx AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
              e AS (SELECT doc_id,
                           sum(((doc_id * 17 + i * 29) % 256 - 128)
                               * ((doc_id * 17 + i * 29) % 256 - 128))
                             AS energy
                    FROM sx GROUP BY 1)
         SELECT d.doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
                d.n AS n_samples, CAST(e.energy AS BIGINT) AS energy
         FROM d JOIN e ON e.doc_id = d.doc_id
         ORDER BY media_id""",

    "sim_kmeans_update" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS ec
                     FROM embeddings WHERE vec_id < 8),
            d AS (SELECT vec_id, centroid_id, embedding,
                    ${duckDot("embedding", "ec")}
                      / (sqrt(${duckDot("embedding", "embedding")})
                         * sqrt(${duckDot("ec", "ec")})) AS cosine
                  FROM embeddings CROSS JOIN c),
            asg AS (SELECT vec_id, centroid_id, embedding FROM (
                      SELECT vec_id, centroid_id, embedding,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY cosine DESC, centroid_id ASC) AS rn
                      FROM d) WHERE rn = 1),
            x AS (SELECT centroid_id, CAST(i - 1 AS INT) AS dim,
                         embedding[i] AS v
                  FROM asg, unnest(generate_series(1, len(embedding)))
                    AS t(i))
          SELECT centroid_id, dim,
                 CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000.0, 0)
                               AS BIGINT)) AS DOUBLE)
                   / (count(*) * 1000000.0) AS mean_val
          FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

    "sim_pq_codes" ->
      s"""WITH sub AS (SELECT unnest([0, 1, 2, 3]) AS sub_id),
              cb AS (SELECT e.vec_id AS code_id, s.sub_id, e.embedding AS ce
                     FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 16),
              cs AS (SELECT e.vec_id, s.sub_id, e.embedding AS ve
                     FROM embeddings e CROSS JOIN sub s),
              d AS (SELECT cs.vec_id, cs.sub_id, cb.code_id,
                      ${duckDotSub("ve", "ce", "cs.sub_id * 16")} AS dot
                    FROM cs JOIN cb ON cb.sub_id = cs.sub_id),
              r AS (SELECT vec_id, sub_id, code_id,
                      row_number() OVER (PARTITION BY vec_id, sub_id
                        ORDER BY dot DESC, code_id ASC) AS rn FROM d)
         SELECT vec_id, sub_id, code_id FROM r WHERE rn = 1
         ORDER BY vec_id, sub_id""",

    "sim_pq_adc_topk" ->
      s"""WITH sub AS (SELECT unnest([0, 1, 2, 3]) AS sub_id),
              cb AS (SELECT e.vec_id AS code_id, s.sub_id, e.embedding AS ce
                     FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 16),
              cs AS (SELECT e.vec_id, s.sub_id, e.embedding AS ve
                     FROM embeddings e CROSS JOIN sub s),
              d AS (SELECT cs.vec_id, cs.sub_id, cb.code_id,
                      ${duckDotSub("ve", "ce", "cs.sub_id * 16")} AS dot
                    FROM cs JOIN cb ON cb.sub_id = cs.sub_id),
              codes AS (SELECT vec_id, sub_id, code_id FROM (
                          SELECT vec_id, sub_id, code_id,
                            row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY dot DESC, code_id ASC) AS rn FROM d)
                        WHERE rn = 1),
              q AS (SELECT e.vec_id AS query_id, s.sub_id,
                           e.embedding AS qe
                    FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 10),
              lut AS (SELECT q.query_id, q.sub_id, cb.code_id,
                        ${duckDotSub("qe", "ce", "q.sub_id * 16")} AS dot
                      FROM q JOIN cb ON cb.sub_id = q.sub_id),
              est AS (SELECT l.query_id, c.vec_id,
                        max(CASE WHEN c.sub_id = 0 THEN l.dot END) AS s0,
                        max(CASE WHEN c.sub_id = 1 THEN l.dot END) AS s1,
                        max(CASE WHEN c.sub_id = 2 THEN l.dot END) AS s2,
                        max(CASE WHEN c.sub_id = 3 THEN l.dot END) AS s3
                      FROM codes c JOIN lut l ON l.sub_id = c.sub_id
                                            AND l.code_id = c.code_id
                      WHERE l.query_id <> c.vec_id
                      GROUP BY 1, 2),
              r AS (SELECT query_id, vec_id,
                      s0 + s1 + s2 + s3 AS est_sim,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY s0 + s1 + s2 + s3 DESC, vec_id ASC)
                        AS rank
                    FROM est)
         SELECT query_id, rank, vec_id, est_sim FROM r WHERE rank <= 5
         ORDER BY query_id, rank""",

    "sim_ivf_assign" ->
      s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS ec
                     FROM embeddings WHERE vec_id < 8),
            d AS (SELECT vec_id, centroid_id,
                    ${duckDot("embedding", "ec")}
                      / (sqrt(${duckDot("embedding", "embedding")})
                         * sqrt(${duckDot("ec", "ec")})) AS cosine
                  FROM embeddings CROSS JOIN c),
            r AS (SELECT vec_id, centroid_id,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cosine DESC, centroid_id ASC) AS rn
                  FROM d)
          SELECT centroid_id, count(*) AS n_assigned
          FROM r WHERE rn = 1
          GROUP BY 1 ORDER BY 1""",

    // overlapping 64-sample windows every 32 over the UTF-8 byte stream;
    // windows enumerated while start < n_bytes, so the last window may be
    // short (least(64, nb - start)) — matching the Spark flatMap exactly
    "mm_audio_window" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                      WHERE doc_id < 200 AND octet_length(encode(text)) > 0),
             b AS (SELECT media_id, nb, ${duckHexBytes("h")} AS bytes
                   FROM hx),
             w AS (SELECT media_id, nb, bytes,
                          CAST(unnest(generate_series(0,
                            CAST((nb - 1) // 32 AS INT))) AS INT)
                            AS window_idx
                   FROM b),
             c AS (SELECT media_id, window_idx, bytes,
                          least(64, nb - window_idx * 32) AS ns
                   FROM w)
         SELECT media_id, window_idx, CAST(ns AS BIGINT) AS n_samples,
                CAST(list_sum(list_transform(
                  generate_series(window_idx * 32 + 1, window_idx * 32 + ns),
                  j -> (bytes[j] - 128) * (bytes[j] - 128)))
                  AS BIGINT) AS energy
         FROM c ORDER BY media_id, window_idx""",

    "agg_mode_per_group" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority,
                           count(*) AS cnt
                    FROM orders GROUP BY 1, 2),
              m AS (SELECT o_orderstatus, max(cnt) AS mx
                    FROM c GROUP BY 1)
         SELECT c.o_orderstatus,
                min(c.o_orderpriority) AS mode_priority,
                CAST(max(m.mx) AS BIGINT) AS n_mode
         FROM c JOIN m ON m.o_orderstatus = c.o_orderstatus
                      AND c.cnt = m.mx
         GROUP BY 1 ORDER BY 1""",

    "dq_benford_digits" ->
      """WITH c AS (SELECT substr(CAST(CAST(round(o_totalprice * 100, 0)
                      AS BIGINT) AS VARCHAR), 1, 1) AS digit
                    FROM orders),
              t AS (SELECT count(*) AS n_total FROM orders)
         SELECT digit, count(*) AS n,
                CAST(count(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                  AS share
         FROM c, t GROUP BY digit, t.n_total ORDER BY digit""",

    "dq_profile_table" ->
      """WITH prof AS (
           SELECT 'o_orderkey' AS column_name,
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
           FROM orders
           UNION ALL
           SELECT 'o_custkey',
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
                  CAST(count(DISTINCT o_custkey) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus',
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
                  CAST(count(DISTINCT o_orderstatus) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'o_totalprice',
                  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
                  CAST(count(DISTINCT o_totalprice) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'o_orderdate',
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
                  CAST(count(DISTINCT o_orderdate) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'o_orderpriority',
                  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
                  CAST(count(DISTINCT o_orderpriority) AS BIGINT)
           FROM orders)
         SELECT p.column_name, p.n_nulls, p.n_distinct,
                (SELECT count(*) FROM orders) AS n_rows
         FROM prof p ORDER BY column_name""",

    "agg_grouping_sets" ->
      """SELECT lang, source,
                CAST(grouping(lang) AS BIGINT) AS g_lang,
                CAST(grouping(source) AS BIGINT) AS g_source,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
         ORDER BY g_lang, g_source, coalesce(lang, ''),
                  coalesce(source, '')""",

    "agg_cube_counts" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                  / 100.0 AS sum_qty,
                CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                  AS BIGINT) AS lvl
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY lvl, l_returnflag ASC NULLS FIRST,
                  l_linestatus ASC NULLS FIRST""",

    // the salted join must be bit-identical to the plain join — the
    // oracle IS the plain join
    "join_salted_skew" ->
      """SELECT s_nationkey, count(*) AS n_items,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1 ORDER BY 1""",

    // list_reduce seeds with the first element and folds left in index
    // order — the identical sequential double recursion as the Spark
    // aggregate over the running collect_list
    "ts_ema" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, date, close,
                           list(close) OVER (PARTITION BY event_type
                             ORDER BY date ROWS UNBOUNDED PRECEDING) AS cl
                    FROM b)
         SELECT event_type, date, close,
                list_reduce(cl, (a, x) -> a * CAST(0.75 AS DOUBLE)
                                          + x * CAST(0.25 AS DOUBLE)) AS ema
         FROM l ORDER BY event_type, date""",

    "inc_scd2_history" ->
      """SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
                ts AS valid_from, lead(ts) OVER w AS valid_to, value,
                lead(ts) OVER w IS NULL AS is_current
         FROM events
         WHERE event_type = 'purchase' AND user_id < 50
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, version""",

    // per-group k-min sketches; the union row re-takes the k smallest of
    // the UNION OF THE SKETCH ROWS only (mergeability), never the raw data
    "sketch_kmv_union" ->
      """WITH f AS (SELECT DISTINCT l_returnflag AS scope,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(l_partkey AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM lineitem),
              m1 AS (SELECT scope,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT scope, (h1 * h1) % 2147483647 AS h2 FROM m1),
              h AS (SELECT DISTINCT scope,
                      (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT scope, hv, row_number() OVER (PARTITION BY scope
                      ORDER BY hv) AS rn FROM h),
              sk AS (SELECT scope, hv FROM r WHERE rn <= 128),
              per AS (SELECT scope, CAST(count(*) AS BIGINT) AS k_actual,
                        CAST(max(hv) AS BIGINT) AS kth_hash,
                        CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
                             ELSE CAST(count(*) - 1 AS DOUBLE) * 2147483647.0
                                  / CAST(max(hv) AS DOUBLE)
                        END AS est_distinct
                      FROM sk GROUP BY 1),
              u AS (SELECT DISTINCT hv FROM sk ORDER BY hv LIMIT 128),
              uni AS (SELECT '__union' AS scope,
                        CAST(count(*) AS BIGINT) AS k_actual,
                        CAST(max(hv) AS BIGINT) AS kth_hash,
                        CASE WHEN count(*) < 128 THEN CAST(count(*) AS DOUBLE)
                             ELSE CAST(count(*) - 1 AS DOUBLE) * 2147483647.0
                                  / CAST(max(hv) AS DOUBLE)
                        END AS est_distinct
                      FROM u)
         SELECT * FROM per UNION ALL SELECT * FROM uni ORDER BY scope""",

    // spread("key#salt") % bits on both sides; candidacy = all 3 positions
    // set; n_false_pos is the filter's exact false-positive tally
    "sketch_bloom_join" ->
      """WITH bk AS (SELECT DISTINCT o_orderkey AS k FROM orders
                     WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                       AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'),
              pk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
              bs AS (SELECT k, CAST(unnest(generate_series(0, 2)) AS INT)
                       AS salt FROM bk),
              bf AS (SELECT
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(
                          CAST(k AS VARCHAR) || '#' || CAST(salt AS VARCHAR),
                          ''), ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                     FROM bs),
              bm1 AS (SELECT (h0 * 1103515245 + 12345) % 2147483647 AS h1
                      FROM bf),
              bm2 AS (SELECT (h1 * h1) % 2147483647 AS h2 FROM bm1),
              bpos AS (SELECT DISTINCT
                         ((h2 * 69069 + 362437) % 2147483647) % 65536 AS pos
                       FROM bm2),
              ps AS (SELECT k, CAST(unnest(generate_series(0, 2)) AS INT)
                       AS salt FROM pk),
              pf AS (SELECT k,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(
                          CAST(k AS VARCHAR) || '#' || CAST(salt AS VARCHAR),
                          ''), ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                     FROM ps),
              pm1 AS (SELECT k, (h0 * 1103515245 + 12345) % 2147483647 AS h1
                      FROM pf),
              pm2 AS (SELECT k, (h1 * h1) % 2147483647 AS h2 FROM pm1),
              ppos AS (SELECT k,
                         ((h2 * 69069 + 362437) % 2147483647) % 65536 AS pos
                       FROM pm2),
              hits AS (SELECT k, count(*) AS n_hit
                       FROM ppos JOIN bpos USING (pos) GROUP BY 1),
              cand AS (SELECT k FROM hits WHERE n_hit = 3)
         SELECT (SELECT count(*) FROM pk) AS n_probe_keys,
                (SELECT count(*) FROM pk
                 WHERE k IN (SELECT k FROM bk)) AS n_true,
                (SELECT count(*) FROM cand) AS n_candidates,
                (SELECT count(*) FROM cand)
                  - (SELECT count(*) FROM pk
                     WHERE k IN (SELECT k FROM bk)) AS n_false_pos""",

    "emb_normalize_quantize" ->
      s"""WITH n AS (SELECT vec_id, embedding,
                       sqrt(${duckDot("embedding", "embedding")}) AS norm
                     FROM embeddings),
              q AS (SELECT vec_id, norm,
                      list_transform(generate_series(1, len(embedding)),
                        i -> CAST(round(CAST(embedding[i] AS DOUBLE) / norm
                                        * CAST(127 AS DOUBLE), 0) AS INT))
                        AS qs
                    FROM n WHERE norm > 0)
         SELECT vec_id, norm,
                CAST(list_min(qs) AS INT) AS q_min,
                CAST(list_max(qs) AS INT) AS q_max,
                CAST(list_sum(list_transform(qs, x -> CAST(x AS BIGINT)))
                  AS BIGINT) AS q_sum
         FROM q ORDER BY vec_id""",

    // identical explicit ASCII classes in both regex engines (Java and
    // RE2 agree codepoint-for-codepoint on these); sequential left fold
    // for the checksum on both sides
    "text_bpe_tokens" ->
      """WITH t AS (SELECT doc_id,
                      regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[.,;:!?()/_-]+') AS pieces
                    FROM documents)
         SELECT doc_id,
                CAST(len(pieces) AS BIGINT) AS n_pieces,
                CAST(len(list_filter(pieces,
                  x -> regexp_matches(x, '^[a-z]'))) AS BIGINT) AS n_alpha,
                CAST(len(list_filter(pieces,
                  x -> regexp_matches(x, '^[0-9]'))) AS BIGINT) AS n_num,
                CAST(len(pieces)
                  - len(list_filter(pieces, x -> regexp_matches(x, '^[a-z]')))
                  - len(list_filter(pieces, x -> regexp_matches(x, '^[0-9]')))
                  AS BIGINT) AS n_punct,
                CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(pieces, tk ->
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(tk, ''),
                        ch -> CAST(ascii(ch) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 2147483647))),
                  (a, h) -> (a * 31 + h) % 2147483647) AS BIGINT)
                  AS piece_checksum
         FROM t ORDER BY doc_id""",

    "stream_static_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "sample_stratified" ->
      """WITH f AS (SELECT event_type, event_id, value,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(event_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM events),
              m1 AS (SELECT event_type, event_id, value,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT event_type, event_id, value,
                       (h1 * h1) % 2147483647 AS h2 FROM m1),
              h AS (SELECT event_type, event_id, value,
                      (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT event_type, event_id, value,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY hv, event_id) AS rn FROM h)
         SELECT event_type, event_id, value FROM r WHERE rn <= 20
         ORDER BY event_type, event_id""",

    "agg_value_histogram" ->
      """SELECT event_type,
                CAST(floor(value / CAST(50 AS DOUBLE)) AS BIGINT) AS bin,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "inc_upsert_latest" ->
      """SELECT user_id, ts, event_id, value FROM (
           SELECT user_id, ts, event_id, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE event_type = 'purchase')
         WHERE rn = 1 ORDER BY user_id""",

    "text_ngram_containment" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th
                     FROM documents WHERE doc_id < 150),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(
                           generate_series(1, len(th) - 1), i ->
                             (th[i] * 31 + th[i+1]) % 2147483647)) AS grams
                  FROM h)
         SELECT doc_a, doc_b, containment FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / CAST(len(a.grams) AS DOUBLE) AS containment
           FROM g a JOIN g b ON a.doc_id <> b.doc_id
           WHERE len(a.grams) > 0)
         WHERE containment >= 0.20
         ORDER BY doc_a, doc_b""",

    "dq_constraint_checks" ->
      """SELECT check_name, n_violations FROM (
           SELECT 'null_orderkey' AS check_name,
                  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations FROM lineitem
           UNION ALL
           SELECT 'nonpositive_quantity',
                  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'discount_out_of_range',
                  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                                THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'null_shipdate',
                  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'flag_domain',
                  CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                                THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           UNION ALL
           SELECT 'orphan_orderkey', CAST(count(*) AS BIGINT) FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = l_orderkey)
           UNION ALL
           SELECT 'duplicate_line_identity',
                  CAST(coalesce(sum(n - 1), 0) AS BIGINT)
           FROM (SELECT count(*) AS n FROM lineitem
                 GROUP BY l_orderkey, l_linenumber, l_shipdate, l_quantity))
         ORDER BY check_name""",

    "inc_agg_merge" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "layout_zorder_key" ->
      """WITH d AS (SELECT DISTINCT user_id,
                      CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                        AS day
                    FROM events)
         SELECT user_id, day,
                CAST(list_sum(list_transform(generate_series(0, 15), i ->
                  (((user_id >> i) & 1) << (2 * i))
                  + (((day >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS zkey
         FROM d ORDER BY zkey, user_id, day LIMIT 200""",

    "inc_snapshot_diff" ->
      """WITH wm AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events
                     WHERE event_type = 'purchase'),
              o AS (SELECT user_id,
                      sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents_old
                    FROM events, wm
                    WHERE event_type = 'purchase'
                      AND CAST(ts AS DATE) <= maxd - 10
                    GROUP BY 1),
              n AS (SELECT user_id,
                      sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents_new
                    FROM events, wm
                    WHERE event_type = 'purchase'
                      AND CAST(ts AS DATE) > maxd - 20
                    GROUP BY 1),
              j AS (SELECT o.user_id AS uo, n.user_id AS un,
                           cents_old, cents_new
                    FROM o FULL OUTER JOIN n ON o.user_id = n.user_id)
         SELECT CAST(sum(CASE WHEN uo IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_added,
                CAST(sum(CASE WHEN un IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_removed,
                CAST(sum(CASE WHEN uo IS NOT NULL AND un IS NOT NULL
                               AND cents_old <> cents_new
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
                CAST(sum(CASE WHEN uo IS NOT NULL AND un IS NOT NULL
                               AND cents_old = cents_new
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
         FROM j""",

    "ts_rolling_median" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, date, close,
                           list(close) OVER (PARTITION BY event_type
                             ORDER BY date ROWS BETWEEN 4 PRECEDING
                             AND CURRENT ROW) AS cl
                    FROM b)
         SELECT event_type, date, close,
                CASE WHEN len(cl) = 5 THEN list_sort(cl)[3] END AS median_5
         FROM l ORDER BY event_type, date""",

    "agg_retention_cohorts" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE)
                       AS activity_date FROM events),
              f AS (SELECT user_id, min(activity_date) AS cohort_date
                    FROM ev GROUP BY 1)
         SELECT cohort_date,
                CAST(activity_date - cohort_date AS BIGINT) AS day_offset,
                count(DISTINCT ev.user_id) AS n_users
         FROM ev JOIN f ON ev.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "sessionize_funnel" ->
      """WITH x AS (SELECT user_id, ts, event_type,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > 1800000000
                           THEN 1 ELSE 0 END AS is_new
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
              y AS (SELECT user_id, ts, event_type,
                      CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                    FROM x),
              s AS (SELECT user_id, session_seq, count(*) AS n_events,
                      min(CASE WHEN event_type = 'view' THEN ts END)
                        AS first_view,
                      max(CASE WHEN event_type = 'purchase' THEN ts END)
                        AS last_purchase
                    FROM y GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_sessions,
                CAST(sum(CASE WHEN first_view IS NOT NULL
                               AND last_purchase IS NOT NULL
                               AND first_view <= last_purchase
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
         FROM s GROUP BY 1 ORDER BY 1""",

    "text_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id,
                         unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                       FROM documents),
              tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                     WHERE doc_id < 100 GROUP BY 1, 2),
              df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
                     GROUP BY 1),
              n AS (SELECT count(*) AS n_docs FROM documents),
              sc AS (SELECT doc_id, tf.token AS token,
                       CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE)
                         / CAST(df AS DOUBLE) AS tfidf
                     FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
              r AS (SELECT doc_id, token, tfidf,
                      CAST(row_number() OVER (PARTITION BY doc_id
                        ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rk
                    FROM sc)
         SELECT doc_id, rk, token, tfidf FROM r WHERE rk <= 3
         ORDER BY doc_id, rk""",

    // ranked on doubles both engines compute identically from the exact
    // integer moment sums; ties totalized by event_id
    "ts_zscore_topk" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
                      sum(CAST(round(value * 100, 0) AS BIGINT)) AS sc,
                      sum(CAST(round(value * 100, 0) AS BIGINT)
                          * CAST(round(value * 100, 0) AS BIGINT)) AS ssq
                    FROM events GROUP BY 1),
              s AS (SELECT event_type,
                      CAST(sc AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE))
                        AS mean_value,
                      sqrt(CAST(ssq AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(10000 AS DOUBLE))
                        - (CAST(sc AS DOUBLE)
                           / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)))
                          * (CAST(sc AS DOUBLE)
                             / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE))))
                        AS stddev
                    FROM a)
         SELECT event_type, event_id, value,
                (value - mean_value) / stddev AS z
         FROM events JOIN s USING (event_type)
         ORDER BY abs((value - mean_value) / stddev) DESC, event_id ASC
         LIMIT 50""",

    // exact BIGINT moment sums; identical double expression order for the
    // final mean/variance/stddev projection on both engines
    "agg_weighted_median" ->
      """WITH li AS (SELECT l_returnflag AS flag,
                            CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                              AS cents,
                            CAST(l_quantity AS BIGINT) AS qty,
                            l_orderkey AS ok, l_linenumber AS ln
                     FROM lineitem),
              t AS (SELECT flag, CAST(sum(qty) AS BIGINT) AS total_qty
                    FROM li GROUP BY 1),
              c AS (SELECT flag, cents,
                           CAST(sum(qty) OVER (PARTITION BY flag
                             ORDER BY cents, ok, ln
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum
                    FROM li)
         SELECT c.flag, max(t.total_qty) AS total_qty,
                CAST(min(c.cents) AS DOUBLE) / CAST(100 AS DOUBLE)
                  AS weighted_median_price
         FROM c JOIN t ON t.flag = c.flag
         WHERE c.cum * 2 >= t.total_qty
         GROUP BY 1 ORDER BY 1""",

    "agg_skew_kurtosis" ->
      """WITH cc AS (SELECT event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS cc
                     FROM events),
              c AS (SELECT event_type,
                           (cc - ((cc % 100) + 100) % 100) // 100 AS c
                    FROM cc),
              a AS (SELECT event_type,
                           CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(c) AS BIGINT) AS s1,
                           CAST(sum(c * c) AS BIGINT) AS s2,
                           CAST(sum(c * c * c) AS BIGINT) AS s3,
                           CAST(sum(c * c * c * c) AS BIGINT) AS s4
                    FROM c GROUP BY 1),
              d AS (SELECT event_type, n,
                           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
                           CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
                           CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
                           CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
                    FROM a)
         SELECT event_type, n,
                (e3 - CAST(3 AS DOUBLE) * m * e2
                  + CAST(2 AS DOUBLE) * m * m * m)
                  / ((e2 - m * m) * sqrt(e2 - m * m)) AS skewness,
                (e4 - CAST(4 AS DOUBLE) * m * e3
                  + CAST(6 AS DOUBLE) * m * m * e2
                  - CAST(3 AS DOUBLE) * m * m * m * m)
                  / ((e2 - m * m) * (e2 - m * m)) - CAST(3 AS DOUBLE)
                  AS excess_kurtosis
         FROM d ORDER BY event_type""",

    "agg_value_stats" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
                      sum(CAST(round(value * 100, 0) AS BIGINT)) AS sc,
                      sum(CAST(round(value * 100, 0) AS BIGINT)
                          * CAST(round(value * 100, 0) AS BIGINT)) AS ssq
                    FROM events GROUP BY 1)
         SELECT event_type, n,
                CAST(sc AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)) AS mean_value,
                CAST(ssq AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(10000 AS DOUBLE))
                  - (CAST(sc AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)))
                    * (CAST(sc AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)))
                  AS variance,
                sqrt(CAST(ssq AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(10000 AS DOUBLE))
                  - (CAST(sc AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)))
                    * (CAST(sc AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE))))
                  AS stddev
         FROM a ORDER BY event_type""",

    "ts_linreg_trend" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              x AS (SELECT event_type,
                      CAST(date - DATE '1970-01-01' AS BIGINT) AS d,
                      CAST(round(close * 100, 0) AS BIGINT) AS c
                    FROM b),
              g AS (SELECT event_type, count(*) AS n, sum(d) AS sx,
                      sum(c) AS sy, sum(d * d) AS sxx, sum(c * c) AS syy,
                      sum(d * c) AS sxy
                    FROM x GROUP BY 1)
         SELECT event_type, n,
                CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)
                  / CAST(100 AS DOUBLE) AS slope_per_day,
                CAST(sy AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE))
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    / CAST(100 AS DOUBLE)
                    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS intercept,
                CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
         FROM g ORDER BY event_type""",

    // the sink must hold each event exactly once despite double delivery:
    // n_rows == n_unique == the batch distinct count
    "stream_foreach_upsert" ->
      """SELECT event_type, count(*) AS n_rows,
                count(DISTINCT event_id) AS n_unique,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "window_rank_suite" ->
      """SELECT event_type, event_id, value,
                CAST(rank() OVER wv AS BIGINT) AS rnk,
                CAST(dense_rank() OVER wv AS BIGINT) AS drnk,
                percent_rank() OVER wv AS prnk,
                cume_dist() OVER wv AS cdist,
                CAST(ntile(4) OVER wt AS BIGINT) AS tile
         FROM events WHERE user_id < 20
         WINDOW wv AS (PARTITION BY event_type ORDER BY value),
                wt AS (PARTITION BY event_type ORDER BY value, event_id)
         ORDER BY event_type, event_id""",

    "sketch_kmv_jaccard" ->
      """WITH f0 AS (SELECT DISTINCT l_returnflag AS scope, l_partkey
                     FROM lineitem WHERE l_returnflag IN ('R', 'A')),
              f AS (SELECT scope, l_partkey,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(l_partkey AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM f0),
              m1 AS (SELECT scope,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT scope, (h1 * h1) % 2147483647 AS h2 FROM m1),
              h AS (SELECT DISTINCT scope,
                      (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              sa AS (SELECT hv FROM h WHERE scope = 'R'
                     ORDER BY hv LIMIT 128),
              sb AS (SELECT hv FROM h WHERE scope = 'A'
                     ORDER BY hv LIMIT 128),
              m AS (SELECT DISTINCT hv FROM
                      (SELECT hv FROM sa UNION ALL SELECT hv FROM sb)
                    ORDER BY hv LIMIT 128),
              nb AS (SELECT count(*) AS n_both FROM m
                     WHERE hv IN (SELECT hv FROM sa)
                       AND hv IN (SELECT hv FROM sb)),
              ni AS (SELECT count(DISTINCT a.l_partkey) AS n_inter
                     FROM f0 a JOIN f0 b ON a.l_partkey = b.l_partkey
                     WHERE a.scope = 'R' AND b.scope = 'A'),
              nu AS (SELECT count(DISTINCT l_partkey) AS n_union FROM f0)
         SELECT (SELECT count(*) FROM m) AS k_merged,
                (SELECT n_both FROM nb) AS n_both,
                CAST((SELECT n_both FROM nb) AS DOUBLE)
                  / CAST((SELECT count(*) FROM m) AS DOUBLE) AS jaccard_est,
                (SELECT n_inter FROM ni) AS n_inter,
                (SELECT n_union FROM nu) AS n_union,
                CAST((SELECT n_inter FROM ni) AS DOUBLE)
                  / CAST((SELECT n_union FROM nu) AS DOUBLE)
                  AS jaccard_exact""",

    // per-node triangle counts from the ordered triple join (u < v < w,
    // each triangle exactly once, credited to all three corners) — a
    // different algorithm from the engine's oriented-intersect explode
    "graph_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              deg AS (SELECT n, count(*) AS d
                      FROM (SELECT u AS n FROM e
                            UNION ALL SELECT v AS n FROM e)
                      GROUP BY 1),
              t3 AS (SELECT e1.u AS u, e1.v AS v, e2.v AS w
                     FROM e e1
                     JOIN e e2 ON e2.u = e1.v
                     JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
              corners AS (SELECT u AS n FROM t3
                          UNION ALL SELECT v FROM t3
                          UNION ALL SELECT w FROM t3),
              tc AS (SELECT n, count(*) AS t FROM corners GROUP BY 1),
              nd AS (SELECT deg.n, deg.d, coalesce(tc.t, 0) AS t
                     FROM deg LEFT JOIN tc USING (n)),
              b AS (SELECT CASE WHEN d < 2 THEN -1
                                ELSE least((20 * t) // (d * (d - 1)), 9)
                           END AS cc_decile,
                           CASE WHEN d < 2 THEN 0
                                ELSE (2000000 * t) // (d * (d - 1))
                           END AS ccm, t
                    FROM nd)
         SELECT CAST(cc_decile AS BIGINT) AS cc_decile,
                count(*) AS n_nodes,
                CAST(sum(t) AS BIGINT) AS sum_tri,
                CAST(sum(ccm) AS BIGINT) AS sum_cc_micro
         FROM b GROUP BY 1 ORDER BY 1""",

    "graph_common_neighbors" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              sym AS (SELECT u AS c, v AS x FROM e
                      UNION ALL SELECT v, u FROM e),
              okc AS (SELECT c FROM (SELECT c, count(*) AS dc FROM sym
                                     GROUP BY 1)
                      WHERE dc <= 32),
              w AS (SELECT s1.x AS x, s2.x AS y
                    FROM sym s1
                    JOIN sym s2 ON s1.c = s2.c AND s1.x < s2.x
                    WHERE s1.c IN (SELECT c FROM okc)),
              cn AS (SELECT x, y, count(*) AS cn FROM w GROUP BY 1, 2),
              nz AS (SELECT cn.x, cn.y, cn.cn FROM cn
                     WHERE NOT EXISTS (SELECT 1 FROM e
                                       WHERE e.u = cn.x AND e.v = cn.y))
         SELECT x, y, cn FROM nz
         ORDER BY cn DESC, x, y LIMIT 20""",

    "graph_jaccard_links" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              sym AS (SELECT u AS c, v AS x FROM e
                      UNION ALL SELECT v, u FROM e),
              deg AS (SELECT c, count(*) AS dc FROM sym GROUP BY 1),
              w AS (SELECT s1.x AS x, s2.x AS y
                    FROM sym s1
                    JOIN sym s2 ON s1.c = s2.c AND s1.x < s2.x
                    WHERE s1.c IN (SELECT c FROM deg WHERE dc <= 64)),
              cn AS (SELECT x, y, count(*) AS cn FROM w GROUP BY 1, 2),
              nz AS (SELECT cn.x, cn.y, cn.cn FROM cn
                     WHERE NOT EXISTS (SELECT 1 FROM e
                                       WHERE e.u = cn.x AND e.v = cn.y))
         SELECT nz.x, nz.y, nz.cn, dx.dc AS du, dy.dc AS dv,
                CAST(nz.cn AS DOUBLE)
                  / CAST(dx.dc + dy.dc - nz.cn AS DOUBLE) AS jaccard
         FROM nz
         JOIN deg dx ON dx.c = nz.x
         JOIN deg dy ON dy.c = nz.y
         ORDER BY jaccard DESC, x, y LIMIT 20""",

    "dq_referential_integrity" ->
      """WITH a1 AS (SELECT 'lineitem.orderkey->orders' AS relation,
                            count(*) AS n_child_rows,
                            count(DISTINCT l_orderkey) AS n_distinct_keys,
                            CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1
                                          ELSE 0 END) AS BIGINT)
                              AS n_null_keys,
                            (SELECT count(*) FROM
                              (SELECT l_orderkey AS k FROM lineitem
                               WHERE l_orderkey IS NOT NULL GROUP BY 1) ck
                             WHERE NOT EXISTS (SELECT 1 FROM orders
                                               WHERE o_orderkey = ck.k))
                              AS n_orphan_keys,
                            (SELECT count(*) FROM lineitem
                             WHERE l_orderkey IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM orders
                                     WHERE o_orderkey = l_orderkey))
                              AS n_orphan_rows
                     FROM lineitem),
              a2 AS (SELECT 'lineitem.partkey->part',
                            count(*),
                            count(DISTINCT l_partkey),
                            CAST(sum(CASE WHEN l_partkey IS NULL THEN 1
                                          ELSE 0 END) AS BIGINT),
                            (SELECT count(*) FROM
                              (SELECT l_partkey AS k FROM lineitem
                               WHERE l_partkey IS NOT NULL GROUP BY 1) ck
                             WHERE NOT EXISTS (SELECT 1 FROM part
                                               WHERE p_partkey = ck.k)),
                            (SELECT count(*) FROM lineitem
                             WHERE l_partkey IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM part
                                     WHERE p_partkey = l_partkey))
                     FROM lineitem),
              a3 AS (SELECT 'lineitem.suppkey->supplier',
                            count(*),
                            count(DISTINCT l_suppkey),
                            CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1
                                          ELSE 0 END) AS BIGINT),
                            (SELECT count(*) FROM
                              (SELECT l_suppkey AS k FROM lineitem
                               WHERE l_suppkey IS NOT NULL GROUP BY 1) ck
                             WHERE NOT EXISTS (SELECT 1 FROM supplier
                                               WHERE s_suppkey = ck.k)),
                            (SELECT count(*) FROM lineitem
                             WHERE l_suppkey IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM supplier
                                     WHERE s_suppkey = l_suppkey))
                     FROM lineitem),
              a4 AS (SELECT 'orders.custkey->customer',
                            count(*),
                            count(DISTINCT o_custkey),
                            CAST(sum(CASE WHEN o_custkey IS NULL THEN 1
                                          ELSE 0 END) AS BIGINT),
                            (SELECT count(*) FROM
                              (SELECT o_custkey AS k FROM orders
                               WHERE o_custkey IS NOT NULL GROUP BY 1) ck
                             WHERE NOT EXISTS (SELECT 1 FROM customer
                                               WHERE c_custkey = ck.k)),
                            (SELECT count(*) FROM orders
                             WHERE o_custkey IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM customer
                                     WHERE c_custkey = o_custkey))
                     FROM orders),
              a5 AS (SELECT 'events.user_id->customer',
                            count(*),
                            count(DISTINCT user_id),
                            CAST(sum(CASE WHEN user_id IS NULL THEN 1
                                          ELSE 0 END) AS BIGINT),
                            (SELECT count(*) FROM
                              (SELECT user_id AS k FROM events
                               WHERE user_id IS NOT NULL GROUP BY 1) ck
                             WHERE NOT EXISTS (SELECT 1 FROM customer
                                               WHERE c_custkey = ck.k)),
                            (SELECT count(*) FROM events
                             WHERE user_id IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM customer
                                     WHERE c_custkey = user_id))
                     FROM events)
         SELECT * FROM (
           SELECT * FROM a1 UNION ALL SELECT * FROM a2
           UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4
           UNION ALL SELECT * FROM a5)
           t(relation, n_child_rows, n_distinct_keys, n_null_keys,
             n_orphan_keys, n_orphan_rows)
         ORDER BY relation""",

    "ts_acf_multilag" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER w AS prev
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              q AS (SELECT event_type, date,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM r WHERE prev IS NOT NULL),
              p0 AS (SELECT event_type, x,
                            lag(x, 1) OVER w AS y1,
                            lag(x, 2) OVER w AS y2,
                            lag(x, 3) OVER w AS y3
                     FROM q
                     WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              p AS (SELECT event_type, CAST(1 AS BIGINT) AS lag, x, y1 AS y
                    FROM p0
                    UNION ALL
                    SELECT event_type, 2, x, y2 FROM p0
                    UNION ALL
                    SELECT event_type, 3, x, y3 FROM p0),
              ag AS (SELECT event_type, lag,
                            CAST(count(*) AS HUGEINT) AS n,
                            CAST(sum(x) AS HUGEINT) AS sx,
                            CAST(sum(y) AS HUGEINT) AS sy,
                            CAST(sum(x * y) AS HUGEINT) AS sxy,
                            CAST(sum(x * x) AS HUGEINT) AS sxx,
                            CAST(sum(y * y) AS HUGEINT) AS syy
                     FROM p WHERE y IS NOT NULL GROUP BY 1, 2)
         SELECT event_type, lag, CAST(n AS BIGINT) AS n,
                CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(n * sxx - sx * sx AS BIGINT) AS DOUBLE))
                     * sqrt(CAST(CAST(n * syy - sy * sy AS BIGINT)
                                 AS DOUBLE)))
                  AS acf
         FROM ag ORDER BY event_type, lag""",

    "ts_turning_points" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, c,
                           lag(c, 1) OVER w AS p,
                           lead(c, 1) OVER w AS nx
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date))
         SELECT event_type,
                count(*) AS n_days,
                CAST(sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                               AND p < c AND c > nx THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_maxima,
                CAST(sum(CASE WHEN p IS NOT NULL AND nx IS NOT NULL
                               AND p > c AND c < nx THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_minima,
                CAST(sum(CASE WHEN p IS NOT NULL AND p = c THEN 1
                              ELSE 0 END) AS BIGINT) AS n_flat
         FROM r GROUP BY 1 ORDER BY event_type""",

    // final op per key via the positional window (a different algorithm
    // from the engine's partial-aggregable max_by)
    "inc_cdc_apply" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
                           CAST(round(value * 100, 0) AS BIGINT) AS vc,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY ts DESC,
                                                       event_id DESC) AS rn,
                           count(*) OVER (PARTITION BY user_id) AS n_ops
                    FROM events)
         SELECT user_id, n_ops, event_id AS last_event_id,
                vc AS last_value_cents
         FROM o WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",

    "text_cooccurrence_topk" ->
      """WITH tk AS (SELECT DISTINCT doc_id, t AS token FROM (
                       SELECT doc_id,
                              unnest(regexp_extract_all(translate(text,
                                'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                'abcdefghijklmnopqrstuvwxyz'),
                                '[a-z0-9]+')) AS t
                       FROM documents)
                     WHERE length(t) >= 4)
         SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_docs
         FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.token < b.token
         GROUP BY 1, 2
         ORDER BY n_docs DESC, tok_a, tok_b LIMIT 30""",

    "stream_windowed_topk" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS date, event_type,
                           count(*) AS n
                    FROM events GROUP BY 1, 2),
              r AS (SELECT date, event_type, n,
                           row_number() OVER (PARTITION BY date
                                              ORDER BY n DESC,
                                                       event_type) AS rnk
                    FROM c)
         SELECT date, event_type, n, rnk FROM r
         WHERE rnk <= 3 ORDER BY date, rnk""",

    // the same 2-round LPA unroll as graph_label_prop, extended with the
    // exact rational modularity of the resulting partition
    "graph_modularity" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
              c1 AS (SELECT e.dst AS node, l.label, count(*) AS c
                     FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
              l1 AS (SELECT node, label FROM
                       (SELECT node, label,
                               row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, label ASC) AS rn
                        FROM c1) WHERE rn = 1),
              c2 AS (SELECT e.dst AS node, l.label, count(*) AS c
                     FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
              l2 AS (SELECT node, label FROM
                       (SELECT node, label,
                               row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, label ASC) AS rn
                        FROM c2) WHERE rn = 1),
              mm AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM pairs),
              intra AS (SELECT CAST(sum(CASE WHEN la.label = lb.label
                                             THEN 1 ELSE 0 END) AS BIGINT)
                               AS intra_edges
                        FROM pairs p
                        JOIN l2 la ON la.node = p.l_partkey * 2
                        JOIN l2 lb ON lb.node = p.l_suppkey * 2 + 1),
              deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
              dc AS (SELECT l.label, CAST(sum(deg.d) AS BIGINT) AS dsum
                     FROM l2 l JOIN deg ON deg.node = l.node GROUP BY 1),
              ds AS (SELECT count(*) AS n_communities,
                            CAST(sum(dsum * dsum) AS BIGINT) AS sum_dc2
                     FROM dc)
         SELECT ds.n_communities, mm.m_edges, intra.intra_edges,
                CAST(4 * mm.m_edges * intra.intra_edges - ds.sum_dc2
                     AS BIGINT) AS q_num,
                CAST(4 * mm.m_edges * mm.m_edges AS BIGINT) AS q_den,
                CAST(CAST(4 * mm.m_edges * intra.intra_edges - ds.sum_dc2
                          AS BIGINT) AS DOUBLE)
                  / CAST(CAST(4 * mm.m_edges * mm.m_edges AS BIGINT)
                         AS DOUBLE) AS modularity
         FROM mm, intra, ds""",

    "mine_event_trigrams" ->
      """WITH s AS (SELECT event_type AS e1,
                           lead(event_type, 1) OVER w AS e2,
                           lead(event_type, 2) OVER w AS e3
                    FROM events
                    WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id))
         SELECT e1, e2, e3, count(*) AS n FROM s
         WHERE e3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n DESC, e1, e2, e3 LIMIT 10""",

    "dedup_rate_by_source" ->
      """WITH n AS (SELECT source,
                           trim(regexp_replace(translate(text,
                             'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                             'abcdefghijklmnopqrstuvwxyz'),
                             '[ \t\n\r\f\x0B]+', ' ', 'g')) AS norm
                    FROM documents)
         SELECT source, count(*) AS n_docs,
                count(DISTINCT norm) AS n_distinct,
                count(*) - count(DISTINCT norm) AS n_dupes,
                CAST(count(*) - count(DISTINCT norm) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS dup_rate
         FROM n GROUP BY 1 ORDER BY source""",

    "ts_gap_histogram" ->
      """WITH g AS (SELECT (epoch_us(ts) - lag(epoch_us(ts), 1)
                              OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) // 1000000
                             AS gap_s
                    FROM events)
         SELECT length(bin(gap_s + 1)) - 1 AS gap_bucket,
                count(*) AS n_gaps,
                min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
         FROM g WHERE gap_s IS NOT NULL
         GROUP BY 1 ORDER BY gap_bucket""",

    // stride-2 nearest-neighbor: sampled pixel (x,y) of the resized image
    // is source pixel (2x, 2y) of the synthesis formula
    "mm_png_resize" ->
      """WITH dims AS (SELECT doc_id,
                              CAST(1 + doc_id % 8 AS INT) AS width,
                              CAST(1 + n_chars % 8 AS INT) AS height
                       FROM documents),
              t AS (SELECT doc_id,
                           CAST((width + 1) // 2 AS INT) AS tw,
                           CAST((height + 1) // 2 AS INT) AS th
                    FROM dims),
              xs AS (SELECT doc_id, tw, th,
                            unnest(range(0, CAST(tw AS BIGINT))) AS x
                     FROM t),
              xy AS (SELECT doc_id, x,
                            unnest(range(0, CAST(th AS BIGINT))) AS y
                     FROM xs),
              px AS (SELECT doc_id,
                            sum((doc_id * 31 + 2 * x * 7 + 2 * y * 13) % 256)
                              AS s
                     FROM xy GROUP BY 1)
         SELECT t.doc_id AS media_id, t.tw AS width, t.th AS height,
                CAST(p.s % 2147483647 AS BIGINT) AS checksum
         FROM t JOIN px p ON p.doc_id = t.doc_id
         ORDER BY media_id""",

    "agg_two_sample_z" ->
      """WITH c AS (SELECT event_type,
                           CAST(round(value * 100, 0) AS BIGINT) AS c
                    FROM events),
              s AS (SELECT event_type, count(*) AS n,
                           CAST(sum(c) AS BIGINT) AS sc,
                           CAST(sum(c * c) AS BIGINT) AS ss
                    FROM c GROUP BY 1)
         SELECT a.event_type AS et_a, b.event_type AS et_b,
                a.n AS na, b.n AS nb,
                CAST(a.sc AS DOUBLE) / CAST(a.n AS DOUBLE) / 100.0
                  AS mean_a,
                CAST(b.sc AS DOUBLE) / CAST(b.n AS DOUBLE) / 100.0
                  AS mean_b,
                (CAST(a.sc AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(b.sc AS DOUBLE) / CAST(b.n AS DOUBLE))
                / sqrt(
                    (CAST(CAST(CAST(a.n AS HUGEINT) * a.ss
                          - CAST(a.sc AS HUGEINT) * a.sc AS BIGINT) AS DOUBLE)
                     / CAST(a.n * (a.n - 1) AS DOUBLE))
                      / CAST(a.n AS DOUBLE)
                  + (CAST(CAST(CAST(b.n AS HUGEINT) * b.ss
                          - CAST(b.sc AS HUGEINT) * b.sc AS BIGINT) AS DOUBLE)
                     / CAST(b.n * (b.n - 1) AS DOUBLE))
                      / CAST(b.n AS DOUBLE)) AS z
         FROM s a JOIN s b ON a.event_type < b.event_type
         ORDER BY 1, 2""",

    "agg_ks_statistic" ->
      """WITH ev AS (SELECT event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS v
                     FROM events WHERE event_type IN ('click', 'view')),
              c AS (SELECT v,
                           sum(CASE WHEN event_type = 'click' THEN 1
                                    ELSE 0 END) AS c1,
                           sum(CASE WHEN event_type = 'view' THEN 1
                                    ELSE 0 END) AS c2
                    FROM ev GROUP BY 1),
              cc AS (SELECT v, sum(c1) OVER (ORDER BY v) AS cum1,
                            sum(c2) OVER (ORDER BY v) AS cum2
                     FROM c),
              n AS (SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1
                                         ELSE 0 END) AS BIGINT) AS n1,
                           CAST(sum(CASE WHEN event_type = 'view' THEN 1
                                         ELSE 0 END) AS BIGINT) AS n2
                    FROM ev),
              d AS (SELECT n.n1, n.n2, cc.v,
                           CAST(abs(n.n2 * cc.cum1 - n.n1 * cc.cum2)
                                AS BIGINT) AS dn,
                           row_number() OVER (
                             ORDER BY abs(n.n2 * cc.cum1 - n.n1 * cc.cum2)
                               DESC, cc.v ASC) AS rn
                    FROM cc, n)
         SELECT n1, n2, dn AS d_num, v AS ks_at_value,
                CAST(dn AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS d_stat
         FROM d WHERE rn = 1""",

    // parity 0 rows were written WITHOUT the priority column, so the
    // merged read surfaces NULL for every one of them
    "inc_schema_evolution" ->
      """SELECT o_orderkey % 2 AS parity, count(*) AS n_rows,
                CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1
                              WHEN o_orderpriority IS NULL THEN 1
                              ELSE 0 END) AS BIGINT) AS n_null_priority,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS BIGINT) AS sum_cents
         FROM orders GROUP BY 1 ORDER BY parity""",

    "olap_audience_overlap" ->
      """WITH m AS (SELECT DISTINCT user_id, event_type FROM events),
              sz AS (SELECT event_type, count(*) AS sz FROM m GROUP BY 1),
              ov AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                            count(*) AS n_shared
                     FROM m a JOIN m b ON a.user_id = b.user_id
                     WHERE a.event_type <= b.event_type
                     GROUP BY 1, 2)
         SELECT ov.type_a, ov.type_b, ov.n_shared,
                CAST(ov.n_shared AS DOUBLE)
                  / CAST(sa.sz + sb.sz - ov.n_shared AS DOUBLE) AS jaccard
         FROM ov
         JOIN sz sa ON sa.event_type = ov.type_a
         JOIN sz sb ON sb.event_type = ov.type_b
         ORDER BY type_a, type_b""",

    "sample_time_purged_split" ->
      """WITH ev AS (SELECT user_id, event_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
              h AS (SELECT day, count(*) AS c FROM ev GROUP BY 1),
              cum AS (SELECT day, sum(c) OVER (ORDER BY day) AS cum FROM h),
              r AS (SELECT (sum(c) * 7 + 9) // 10 AS r FROM h),
              d70 AS (SELECT min(day) AS d70 FROM cum, r
                      WHERE cum.cum >= r.r),
              s AS (SELECT user_id, event_id, day,
                           CASE WHEN day < d70 THEN '1_train'
                                WHEN day < d70 + 2 THEN '2_purged'
                                ELSE '3_test' END AS split
                    FROM ev, d70)
         SELECT split, count(*) AS n_events,
                count(DISTINCT user_id) AS n_users,
                min(day) AS min_day, max(day) AS max_day
         FROM s GROUP BY 1 ORDER BY split""",

    "ts_var_es" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER w AS prev
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              q AS (SELECT event_type,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM r WHERE prev IS NOT NULL),
              n AS (SELECT event_type, count(*) AS n_days,
                           (count(*) + 19) // 20 AS rk
                    FROM q GROUP BY 1),
              cum AS (SELECT event_type, x,
                             CAST(count(*) AS BIGINT) AS cnt,
                             sum(count(*)) OVER (PARTITION BY event_type
                                                 ORDER BY x) AS cum
                      FROM q GROUP BY 1, 2),
              v AS (SELECT c.event_type, min(c.x) AS var_q
                    FROM cum c JOIN n ON n.event_type = c.event_type
                    WHERE c.cum >= n.rk GROUP BY 1),
              t AS (SELECT q.event_type,
                           CAST(sum(q.x) AS BIGINT) AS tail_sum,
                           count(*) AS tail_n
                    FROM q JOIN v ON v.event_type = q.event_type
                    WHERE q.x <= v.var_q GROUP BY 1)
         SELECT n.event_type, n.n_days, v.var_q, t.tail_sum, t.tail_n,
                CAST(v.var_q AS DOUBLE) / 1048576.0 AS var_return,
                CAST(t.tail_sum AS DOUBLE)
                  / CAST(CAST(t.tail_n * 1048576 AS BIGINT) AS DOUBLE)
                  AS es_return
         FROM n JOIN v ON v.event_type = n.event_type
                JOIN t ON t.event_type = n.event_type
         ORDER BY n.event_type""",

    "wm_lateness_whatif" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us,
                           (((event_id * 2654435761) % 2147483647)
                            + 2147483647) % 2147483647 % 7200 AS delay_s
                    FROM events),
              a AS (SELECT event_type, event_id, us,
                           us + delay_s * 1000000 AS arrival_us
                    FROM e),
              m AS (SELECT event_type, us,
                           max(us) OVER (PARTITION BY event_type
                                         ORDER BY arrival_us, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS wm_us
                    FROM a)
         SELECT event_type, count(*) AS n_events,
                CAST(sum(CASE WHEN us < wm_us - 900 * CAST(1000000 AS BIGINT)
                              THEN 1 ELSE 0 END) AS BIGINT) AS late_15m,
                CAST(sum(CASE WHEN us < wm_us - 3600 * CAST(1000000 AS BIGINT)
                              THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
                CAST(sum(CASE WHEN us < wm_us - 7200 * CAST(1000000 AS BIGINT)
                              THEN 1 ELSE 0 END) AS BIGINT) AS late_2h
         FROM m GROUP BY 1 ORDER BY event_type""",

    // the same quantized correlation matrix as emb_dim_correlation,
    // then 3 unrolled matvec + floor-renormalize rounds (DuckDB //
    // TRUNCATES on negatives, so the oracle spells out the same
    // explicit floor formula the engine uses)
    "emb_power_iteration" ->
      """WITH dims AS (SELECT vec_id, i,
                        CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536)
                          AS BIGINT) AS q
                      FROM (SELECT vec_id, embedding,
                              unnest(generate_series(1, 64)) AS i
                            FROM embeddings)),
              st AS (SELECT i, count(*) AS n, sum(q) AS s,
                       sum(q * q) AS ss
                     FROM dims GROUP BY 1),
              pr AS (SELECT a.i AS i, b.i AS j,
                       CAST(sum(a.q * b.q) AS BIGINT) AS sp
                     FROM dims a JOIN dims b ON a.vec_id = b.vec_id
                     WHERE a.i < b.i GROUP BY 1, 2),
              up AS (SELECT pr.i, pr.j,
                       CAST(floor(
                         ((CAST(si.n AS DOUBLE) * CAST(sp AS DOUBLE)
                           - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE))
                          / (sqrt(CAST(si.n AS DOUBLE)
                                    * CAST(si.ss AS DOUBLE)
                                  - CAST(si.s AS DOUBLE)
                                    * CAST(si.s AS DOUBLE))
                             * sqrt(CAST(si.n AS DOUBLE)
                                      * CAST(sj.ss AS DOUBLE)
                                    - CAST(sj.s AS DOUBLE)
                                      * CAST(sj.s AS DOUBLE))))
                         * 1048576) AS BIGINT) AS cq
                     FROM pr JOIN st si ON pr.i = si.i
                             JOIN st sj ON pr.j = sj.i),
              m AS (SELECT i, j, cq FROM up
                    UNION ALL SELECT j, i, cq FROM up
                    UNION ALL SELECT i, i, CAST(1048576 AS BIGINT) FROM st),
              v0 AS (SELECT i AS j, CAST(4096 AS BIGINT) AS v FROM st),
              x1 AS (SELECT m.i, CAST(sum(m.cq * v0.v) AS BIGINT) AS x
                     FROM m JOIN v0 ON v0.j = m.j GROUP BY 1),
              m1 AS (SELECT max(abs(x)) AS mx FROM x1),
              v1 AS (SELECT i AS j, (x * 4096 - (((x * 4096) % mx) + mx) % mx) // mx AS v FROM x1, m1),
              x2 AS (SELECT m.i, CAST(sum(m.cq * v1.v) AS BIGINT) AS x
                     FROM m JOIN v1 ON v1.j = m.j GROUP BY 1),
              m2 AS (SELECT max(abs(x)) AS mx FROM x2),
              v2 AS (SELECT i AS j, (x * 4096 - (((x * 4096) % mx) + mx) % mx) // mx AS v FROM x2, m2),
              x3 AS (SELECT m.i, CAST(sum(m.cq * v2.v) AS BIGINT) AS x
                     FROM m JOIN v2 ON v2.j = m.j GROUP BY 1),
              m3 AS (SELECT max(abs(x)) AS mx FROM x3),
              v3 AS (SELECT i AS j, (x * 4096 - (((x * 4096) % mx) + mx) % mx) // mx AS v FROM x3, m3)
         SELECT j AS dim, v AS v3 FROM v3 ORDER BY dim""",

    "ts_atr" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           max(value) AS high, min(value) AS low,
                           arg_max(value, ts) AS close
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, high, low,
                           lag(close, 1) OVER (PARTITION BY event_type
                                               ORDER BY date) AS prev_close
                    FROM b),
              t AS (SELECT event_type, date,
                           greatest(high - low, abs(high - prev_close),
                                    abs(low - prev_close)) AS tr
                    FROM r WHERE prev_close IS NOT NULL),
              l AS (SELECT event_type, date, tr,
                           list(tr) OVER (PARTITION BY event_type
                             ORDER BY date ROWS UNBOUNDED PRECEDING) AS cl
                    FROM t)
         SELECT event_type, date, tr,
                list_reduce(cl, (a, x) -> a * CAST(0.75 AS DOUBLE)
                                          + x * CAST(0.25 AS DOUBLE)) AS atr
         FROM l ORDER BY event_type, date""",

    "sql_api_topdays_report" ->
      """WITH d AS (SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE)
                            AS sd,
                          CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM lineitem GROUP BY 1, 2),
             r AS (SELECT rf, sd, cents,
                          CAST(row_number() OVER (PARTITION BY rf
                            ORDER BY cents DESC, sd) AS BIGINT) AS rn
                   FROM d)
        SELECT rf, sd, cents, rn FROM r WHERE rn <= 3
        ORDER BY rf, rn""",

    // day d0 keeps only its even event ids after the dynamic overwrite;
    // every other day is untouched
    "inc_dynamic_partition_overwrite" ->
      """WITH ev AS (SELECT event_id,
                            CAST(round(value * 100, 0) AS BIGINT) AS cents,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
              d0 AS (SELECT min(day) AS d0 FROM ev),
              f AS (SELECT ev.* FROM ev, d0
                    WHERE ev.day <> d0.d0 OR ev.event_id % 2 = 0)
         SELECT day, count(*) AS n_events,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM f GROUP BY 1 ORDER BY day""",

    "agg_bootstrap_ci" ->
      """WITH p AS (SELECT event_id,
                           CAST(round(value * 100, 0) AS BIGINT) AS c
                    FROM events WHERE event_type = 'purchase'),
              r AS (SELECT t.b, event_id, c,
                           ((((event_id * 31 + t.b) * 2654435761)
                             % 2147483647) + 2147483647) % 2147483647 % 3
                             AS wgt
                    FROM p, unnest(range(0, 32)) AS t(b)),
              m AS (SELECT b,
                           CAST(CAST(sum(wgt * c) AS BIGINT) AS DOUBLE)
                             / CAST(CAST(sum(wgt) AS BIGINT) AS DOUBLE)
                             AS rep_mean
                    FROM r GROUP BY 1),
              rk AS (SELECT b, rep_mean,
                            row_number() OVER (ORDER BY rep_mean, b) AS rn
                     FROM m),
              pt AS (SELECT CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
                              / CAST(count(*) AS DOUBLE) AS point_mean
                     FROM p)
         SELECT (SELECT count(*) FROM rk) AS n_replicates,
                pt.point_mean,
                (SELECT rep_mean FROM rk WHERE rn = 2) AS ci_lo,
                (SELECT rep_mean FROM rk WHERE rn = 31) AS ci_hi
         FROM pt""",

    // identical to inc_cdc_apply's oracle: the stream must converge to
    // exactly the batch CDC result regardless of micro-batch boundaries
    "stream_cdc_apply" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
                           CAST(round(value * 100, 0) AS BIGINT) AS vc,
                           row_number() OVER (PARTITION BY user_id
                                              ORDER BY ts DESC,
                                                       event_id DESC) AS rn,
                           count(*) OVER (PARTITION BY user_id) AS n_ops
                    FROM events)
         SELECT user_id, n_ops, event_id AS last_event_id,
                vc AS last_value_cents
         FROM o WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",

    "ts_seasonality_strength" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS x
                    FROM events GROUP BY 1, 2),
              d AS (SELECT event_type,
                           CAST(isodow(date) AS BIGINT) AS dow, x
                    FROM b),
              t AS (SELECT event_type, count(*) AS n,
                           CAST(sum(x) AS BIGINT) AS s,
                           CAST(sum(x * x) AS BIGINT) AS ss
                    FROM d GROUP BY 1),
              g AS (SELECT event_type, dow, count(*) AS ng,
                           CAST(sum(x) AS BIGINT) AS sg
                    FROM d GROUP BY 1, 2),
              q AS (SELECT g.event_type,
                           ((t.n * g.sg - g.ng * t.s)
                            * (t.n * g.sg - g.ng * t.s))
                             // (g.ng * t.n) AS qg
                    FROM g JOIN t ON t.event_type = g.event_type),
              sb AS (SELECT event_type, CAST(sum(qg) AS BIGINT) AS ssb_q,
                            count(*) AS n_groups
                     FROM q GROUP BY 1)
         SELECT t.event_type, t.n, sb.n_groups, sb.ssb_q,
                CAST(t.n * t.ss - t.s * t.s AS BIGINT) AS sst,
                CAST(sb.ssb_q AS DOUBLE)
                  / CAST(CAST(t.n * t.ss - t.s * t.s AS BIGINT) AS DOUBLE)
                  AS eta_sq
         FROM t JOIN sb ON sb.event_type = t.event_type
         ORDER BY t.event_type""",

    // the same portable register emulation as sketch_hll_distinct,
    // restricted to the two sets, plus the register-wise union merge
    "sketch_hll_intersection" ->
      """WITH f0 AS (SELECT event_type, user_id FROM events
                     WHERE event_type IN ('click', 'view')),
              f AS (SELECT event_type, user_id,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(user_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM f0),
              m1 AS (SELECT event_type, user_id,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT event_type, user_id, (h1 * h1) % 2147483647 AS h2
                     FROM m1),
              m3 AS (SELECT event_type, user_id,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              r AS (SELECT event_type, hv % 512 AS bucket,
                      CASE WHEN hv // 512 = 0 THEN 23
                           ELSE 23 - length(bin(hv // 512)) END AS rho
                    FROM m3),
              regs AS (SELECT event_type, bucket, max(rho) AS r
                       FROM r GROUP BY 1, 2),
              sq AS (SELECT event_type,
                       CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT)
                         + (512 - count(*)) * CAST(4294967296 AS BIGINT) AS s
                     FROM regs GROUP BY 1),
              rall AS (SELECT bucket, max(rho) AS r FROM r GROUP BY 1),
              squ AS (SELECT
                        CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT)
                          + (512 - count(*)) * CAST(4294967296 AS BIGINT) AS s
                      FROM rall),
              e AS (SELECT event_type,
                      (((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                          + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE)))
                        * CAST(512 AS DOUBLE)) * CAST(512 AS DOUBLE))
                        * CAST(4294967296 AS DOUBLE) / CAST(s AS DOUBLE)
                        AS est
                    FROM sq),
              eu AS (SELECT
                       (((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                           + CAST(1.079 AS DOUBLE) / CAST(512 AS DOUBLE)))
                         * CAST(512 AS DOUBLE)) * CAST(512 AS DOUBLE))
                         * CAST(4294967296 AS DOUBLE) / CAST(s AS DOUBLE)
                         AS est_union
                     FROM squ),
              es AS (SELECT
                       max(CASE WHEN event_type = 'click' THEN est END)
                         AS est_a,
                       max(CASE WHEN event_type = 'view' THEN est END)
                         AS est_b
                     FROM e),
              ex AS (SELECT
                       count(DISTINCT CASE WHEN event_type = 'click'
                                           THEN user_id END) AS n_a,
                       count(DISTINCT CASE WHEN event_type = 'view'
                                           THEN user_id END) AS n_b
                     FROM f0),
              xi AS (SELECT count(*) AS n_inter_exact FROM
                       (SELECT DISTINCT a.user_id
                        FROM f0 a JOIN f0 b ON a.user_id = b.user_id
                        WHERE a.event_type = 'click'
                          AND b.event_type = 'view'))
         SELECT es.est_a, es.est_b, eu.est_union,
                es.est_a + es.est_b - eu.est_union AS est_inter,
                ex.n_a, ex.n_b, xi.n_inter_exact
         FROM es, eu, ex, xi""",

    "agg_control_chart" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day,
                            CAST(round(value * 100, 0) AS BIGINT) AS x
                     FROM events),
              t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
                           CAST(sum(x * x) AS BIGINT) AS ss
                    FROM ev),
              d AS (SELECT day, count(*) AS nd,
                           CAST(sum(x) AS BIGINT) AS sd
                    FROM ev GROUP BY 1)
         SELECT day, nd,
                CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE) AS day_mean_cents,
                (CAST(t.n AS HUGEINT) * sd - CAST(nd AS HUGEINT) * t.s)
                  * (CAST(t.n AS HUGEINT) * sd - CAST(nd AS HUGEINT) * t.s)
                  > 9 * CAST(nd AS HUGEINT) * nd
                    * (CAST(t.n AS HUGEINT) * t.ss
                       - CAST(t.s AS HUGEINT) * t.s) AS ooc
         FROM d, t ORDER BY day""",

    "olap_period_over_period" ->
      """WITH w AS (SELECT event_type,
                           CAST(date_trunc('week', ts) AS DATE) AS week,
                           CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                AS BIGINT) AS cents
                    FROM events GROUP BY 1, 2),
              l AS (SELECT event_type, week, cents,
                           lag(cents, 1) OVER (PARTITION BY event_type
                                               ORDER BY week) AS prev_cents
                    FROM w)
         SELECT event_type, week, cents, prev_cents,
                CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
                     THEN CAST(cents - prev_cents AS DOUBLE)
                            / CAST(prev_cents AS DOUBLE)
                END AS growth
         FROM l ORDER BY event_type, week""",

    "agg_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                     FROM events),
              su AS (SELECT user_id, min(us) AS su_us FROM ev
                     WHERE event_type = 'signup' GROUP BY 1),
              conv AS (SELECT ev.user_id,
                              (min(ev.us) - min(su.su_us)) // 60000000
                                AS delta_m
                       FROM ev JOIN su ON su.user_id = ev.user_id
                       WHERE ev.event_type = 'purchase'
                         AND ev.us >= su.su_us
                       GROUP BY 1),
              c AS (SELECT delta_m, count(*) AS cnt FROM conv GROUP BY 1),
              cum AS (SELECT delta_m,
                             sum(cnt) OVER (ORDER BY delta_m) AS cum
                      FROM c),
              r AS (SELECT count(*) AS n_converted,
                           (count(*) + 3) // 4 AS r1,
                           (count(*) + 1) // 2 AS r2,
                           (3 * count(*) + 3) // 4 AS r3
                    FROM conv),
              ns AS (SELECT count(*) AS n_signup_users FROM su),
              p AS (SELECT min(CASE WHEN cum >= r.r1 THEN delta_m END)
                             AS q1_m,
                           min(CASE WHEN cum >= r.r2 THEN delta_m END)
                             AS median_m,
                           min(CASE WHEN cum >= r.r3 THEN delta_m END)
                             AS q3_m
                    FROM cum, r)
         SELECT ns.n_signup_users, r.n_converted,
                CAST(r.n_converted AS DOUBLE)
                  / CAST(ns.n_signup_users AS DOUBLE) AS conversion_rate,
                p.q1_m, p.median_m, p.q3_m
         FROM ns, r, p""",

    "olap_distinct_rollup" ->
      """WITH g AS (SELECT user_id,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(date_trunc('week', ts) AS DATE) AS week,
                           CAST(date_trunc('month', ts) AS DATE) AS month
                    FROM events)
         SELECT CASE WHEN day IS NOT NULL THEN '1_day'
                     WHEN week IS NOT NULL THEN '2_week'
                     ELSE '3_month' END AS grain,
                coalesce(CAST(day AS VARCHAR), CAST(week AS VARCHAR),
                         CAST(month AS VARCHAR)) AS bucket,
                count(DISTINCT user_id) AS n_users,
                count(*) AS n_events
         FROM g GROUP BY GROUPING SETS ((day), (week), (month))
         ORDER BY grain, bucket""",

    "sample_group_kfold" ->
      """SELECT (((user_id * 2654435761) % 2147483647) + 2147483647)
                  % 2147483647 % 5 AS fold,
                count(*) AS n_events,
                count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY fold""",

    // the LSH side is the dedup_minhash_lsh oracle restricted to the id
    // bound; the exact side is all-pairs Jaccard over the SAME distinct
    // shingle sets
    "dedup_lsh_quality" -> {
      val k = 16; val r = 4
      val as = (0 until k).map(MinHash.coeffA).mkString("[", ", ", "]")
      val bs = (0 until k).map(MinHash.coeffB).mkString("[", ", ", "]")
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents
                     WHERE doc_id < 200),
            sh AS (SELECT doc_id,
                     list_transform(generate_series(1, len(th) - 2), i ->
                       ((th[i] * 31 + th[i+1]) * 31 + th[i+2]) % 2147483647) AS s
                   FROM h WHERE len(th) >= 3),
            es AS (SELECT doc_id, list_distinct(s) AS gs FROM sh),
            ex AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
                   FROM es x JOIN es y ON x.doc_id < y.doc_id
                   WHERE CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
                         / CAST(len(x.gs) + len(y.gs)
                                - len(list_intersect(x.gs, y.gs))
                                AS DOUBLE) >= 0.5),
            sg AS (SELECT doc_id,
                     list_transform(generate_series(1, $k), i ->
                       list_min(list_transform(s, x ->
                         ($as[i] * x + $bs[i]) % 2147483647))) AS sig
                   FROM sh),
            bd AS (SELECT doc_id, sig,
                     list_transform(generate_series(0, ${k / r - 1}), b ->
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, $r), j ->
                             sig[b * $r + j])),
                         (h, x) -> (h * 31 + x) % 2147483647)) AS bands
                   FROM sg),
            bk AS (SELECT doc_id, sig,
                          unnest(bands) AS key,
                          unnest(generate_series(1, len(bands))) AS band
                   FROM bd),
            cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                            x.sig AS sig_a, y.sig AS sig_b
                     FROM bk x JOIN bk y
                       ON x.band = y.band AND x.key = y.key
                          AND x.doc_id < y.doc_id),
            lshp AS (SELECT doc_a, doc_b FROM cand
                     WHERE CAST(len(list_filter(generate_series(1, $k),
                             i -> sig_a[i] = sig_b[i])) AS DOUBLE) / $k.0
                           >= 0.5),
            nl AS (SELECT count(*) AS n_lsh FROM lshp),
            ne AS (SELECT count(*) AS n_exact FROM ex),
            tp AS (SELECT count(*) AS tp FROM lshp
                   JOIN ex ON ex.doc_a = lshp.doc_a
                          AND ex.doc_b = lshp.doc_b)
          SELECT nl.n_lsh, ne.n_exact, tp.tp,
                 nl.n_lsh - tp.tp AS fp, ne.n_exact - tp.tp AS fn,
                 CASE WHEN nl.n_lsh > 0 THEN
                   CAST(tp.tp AS DOUBLE) / CAST(nl.n_lsh AS DOUBLE)
                 END AS precision,
                 CASE WHEN ne.n_exact > 0 THEN
                   CAST(tp.tp AS DOUBLE) / CAST(ne.n_exact AS DOUBLE)
                 END AS recall
          FROM nl, ne, tp"""
    },

    "ts_donchian_channels" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(max(value) * 100, 0) AS BIGINT)
                             AS hi_c,
                           CAST(round(min(value) * 100, 0) AS BIGINT)
                             AS lo_c,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS cl_c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, cl_c,
                           count(*) OVER w AS n_in_frame,
                           max(hi_c) OVER w AS mh,
                           min(lo_c) OVER w AS ml
                    FROM b
                    WINDOW w AS (PARTITION BY event_type ORDER BY date
                                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         SELECT event_type, date, cl_c,
                CASE WHEN n_in_frame = 10 THEN mh END AS chan_hi,
                CASE WHEN n_in_frame = 10 THEN ml END AS chan_lo,
                (n_in_frame = 10 AND cl_c = mh) AS breakout_up,
                (n_in_frame = 10 AND cl_c = ml) AS breakout_down
         FROM r ORDER BY event_type, date""",

    "agg_discount_elasticity" ->
      """WITH d AS (SELECT l_returnflag,
                           CAST(round(l_discount * 10000, 0) AS BIGINT) AS x,
                           CAST(round(l_quantity * 100, 0) AS BIGINT) AS y
                    FROM lineitem),
              a AS (SELECT l_returnflag, count(*) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(x * x) AS BIGINT) AS sxx,
                           CAST(sum(x * y) AS BIGINT) AS sxy
                    FROM d GROUP BY 1),
              m AS (SELECT l_returnflag, n,
                           CAST(CAST(CAST(n AS HUGEINT) * sxy
                                     - CAST(sx AS HUGEINT) * sy AS BIGINT)
                                AS DOUBLE) AS num,
                           CAST(CAST(CAST(n AS HUGEINT) * sxx
                                     - CAST(sx AS HUGEINT) * sx AS BIGINT)
                                AS DOUBLE) AS den,
                           sx, sy
                    FROM a)
         SELECT l_returnflag, n, num / den AS slope_q_per_bp,
                CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                  - num / den * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  AS intercept_q
         FROM m ORDER BY l_returnflag""",

    "text_feature_hashing" -> {
      val th =
        "list_transform(regexp_extract_all(translate(text, " +
        "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), " +
        "'[a-z0-9]+'), t -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(t, ''), ch -> CAST(ascii(ch) AS " +
        "BIGINT))), (h, c) -> (h * 31 + c) % 2147483647))"
      s"""WITH t AS (SELECT doc_id, unnest($th) AS h FROM documents),
              w AS (SELECT doc_id, h % 64 AS dim,
                           CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END
                             AS sgn
                    FROM t)
         SELECT doc_id, dim, CAST(sum(sgn) AS BIGINT) AS weight
         FROM w GROUP BY 1, 2
         HAVING sum(sgn) <> 0
         ORDER BY doc_id, dim"""
    },

    "cal_feature_frame" -> {
      val dates = graft.cal.NyseCalendar.defaultDateLiterals
        .map(d => s"DATE '$d'").mkString(", ")
      s"""WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
                     FROM orders),
              f AS (SELECT d, isodow(d) >= 6 AS is_weekend,
                           d IN ($dates) AS is_holiday
                    FROM d),
              g AS (SELECT d, CAST(unnest(generate_series(0, 7)) AS INT)
                             AS off
                    FROM d),
              c AS (SELECT d, off, d + off AS cand FROM g),
              ok AS (SELECT d, CAST(min(off) AS BIGINT)
                              AS days_to_next_busday
                     FROM c
                     WHERE isodow(cand) <= 5 AND cand NOT IN ($dates)
                     GROUP BY 1)
         SELECT f.d, f.is_weekend, f.is_holiday,
                (NOT f.is_weekend AND NOT f.is_holiday) AS is_busday,
                ok.days_to_next_busday
         FROM f JOIN ok ON ok.d = f.d ORDER BY f.d"""
    },

    // the observed metrics are exactly the one-pass aggregates
    "dq_observe_metrics" ->
      """SELECT count(*) AS n_rows,
                CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS BIGINT) AS sum_cents,
                min(CAST(l_shipdate AS DATE)) AS min_ship,
                max(CAST(l_shipdate AS DATE)) AS max_ship
         FROM lineitem""",

    "mine_transition_matrix" ->
      """WITH s AS (SELECT event_type AS e_from,
                           lead(event_type, 1) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS e_to
                    FROM events),
              p AS (SELECT e_from, e_to, count(*) AS n FROM s
                    WHERE e_to IS NOT NULL GROUP BY 1, 2),
              t AS (SELECT e_from, CAST(sum(n) AS BIGINT) AS row_n
                    FROM p GROUP BY 1)
         SELECT p.e_from, p.e_to, p.n,
                CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS prob
         FROM p JOIN t ON t.e_from = p.e_from
         ORDER BY p.e_from, p.e_to""",

    "ts_sharpe_sortino" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type, date, c,
                           lag(c, 1) OVER (PARTITION BY event_type
                                           ORDER BY date) AS prev
                    FROM b),
              q AS (SELECT event_type,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM r WHERE prev IS NOT NULL),
              a AS (SELECT event_type, count(*) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(x * x) AS BIGINT) AS sxx,
                           CAST(sum(CASE WHEN x < 0 THEN x * x ELSE 0 END)
                                AS BIGINT) AS sdd
                    FROM q GROUP BY 1),
              m AS (SELECT event_type, n,
                           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
                           sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             / CAST(n AS DOUBLE) AS std_q,
                           sqrt(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE))
                             AS downside_q
                    FROM a)
         SELECT event_type, n,
                CASE WHEN std_q > 0 THEN mean_q / std_q END AS sharpe,
                CASE WHEN downside_q > 0 THEN mean_q / downside_q END
                  AS sortino
         FROM m ORDER BY event_type""",

    "graph_hits" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk
                    FROM lineitem),
              h0 AS (SELECT DISTINCT p, CAST(1 AS BIGINT) AS hv FROM e),
              a1r AS (SELECT e.sk, CAST(sum(h0.hv) AS BIGINT) AS av
                      FROM e JOIN h0 ON h0.p = e.p GROUP BY 1),
              a1m AS (SELECT max(av) AS mx FROM a1r),
              a1 AS (SELECT sk, (av * 4096) // mx AS av FROM a1r, a1m),
              h1r AS (SELECT e.p, CAST(sum(a1.av) AS BIGINT) AS hv
                      FROM e JOIN a1 ON a1.sk = e.sk GROUP BY 1),
              h1m AS (SELECT max(hv) AS mx FROM h1r),
              h1 AS (SELECT p, (hv * 4096) // mx AS hv FROM h1r, h1m),
              a2r AS (SELECT e.sk, CAST(sum(h1.hv) AS BIGINT) AS av
                      FROM e JOIN h1 ON h1.p = e.p GROUP BY 1),
              a2m AS (SELECT max(av) AS mx FROM a2r),
              a2 AS (SELECT sk, (av * 4096) // mx AS av FROM a2r, a2m),
              h2r AS (SELECT e.p, CAST(sum(a2.av) AS BIGINT) AS hv
                      FROM e JOIN a2 ON a2.sk = e.sk GROUP BY 1),
              h2m AS (SELECT max(hv) AS mx FROM h2r),
              h2 AS (SELECT p, (hv * 4096) // mx AS hv FROM h2r, h2m),
              top AS (SELECT 'hub' AS role, p AS node,
                             CAST(hv AS BIGINT) AS score
                      FROM h2 ORDER BY score DESC, node LIMIT 10),
              topa AS (SELECT 'authority' AS role, sk AS node,
                              CAST(av AS BIGINT) AS score
                       FROM a2 ORDER BY score DESC, node LIMIT 10)
         SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM topa)
         ORDER BY role, score DESC, node""",

    "ts_calmar_ratio" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              p AS (SELECT event_type,
                           max(c) OVER (PARTITION BY event_type
                                        ORDER BY date
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS p, c
                    FROM b),
              dd AS (SELECT event_type,
                            max(((p - c) * 10000) // p) AS max_dd_bp
                     FROM p GROUP BY 1),
              fl AS (SELECT event_type,
                            arg_min(c, date) AS first_cents,
                            arg_max(c, date) AS last_cents
                     FROM b GROUP BY 1),
              r AS (SELECT event_type, first_cents, last_cents,
                           (last_cents - first_cents) * 10000 AS rn
                    FROM fl),
              t AS (SELECT event_type, first_cents, last_cents,
                           (rn - (((rn % first_cents) + first_cents)
                                  % first_cents)) // first_cents
                             AS total_return_bp
                    FROM r)
         SELECT t.event_type, t.first_cents, t.last_cents,
                t.total_return_bp, dd.max_dd_bp,
                CASE WHEN dd.max_dd_bp > 0 THEN
                  CAST(t.total_return_bp AS DOUBLE)
                    / CAST(dd.max_dd_bp AS DOUBLE)
                END AS calmar
         FROM t JOIN dd ON dd.event_type = t.event_type
         ORDER BY t.event_type""",

    "ts_holiday_effect" -> {
      val dates = graft.cal.NyseCalendar.defaultDateLiterals
        .map(d => s"DATE '$d'").mkString(", ")
      s"""WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                            CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                              AS c
                     FROM events GROUP BY 1, 2),
               r AS (SELECT event_type, date, c,
                            lag(c) OVER (PARTITION BY event_type
                                         ORDER BY date) AS p
                     FROM b),
               t AS (SELECT event_type, date,
                            (c - p) * 10000 AS rn, p
                     FROM r WHERE p IS NOT NULL),
               f AS (SELECT event_type,
                            CASE WHEN date IN ($dates) THEN 'holiday'
                                 WHEN date + 1 IN ($dates) THEN 'pre_holiday'
                                 WHEN date - 1 IN ($dates) THEN 'post_holiday'
                                 ELSE 'regular' END AS day_class,
                            (rn - (((rn % p) + p) % p)) // p AS ret_bp
                     FROM t)
          SELECT event_type, day_class, count(*) AS n_days,
                 CAST(sum(ret_bp) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mean_ret_bp
          FROM f GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "ts_drawdown_duration" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              p AS (SELECT event_type, date, c,
                           max(c) OVER (PARTITION BY event_type
                                        ORDER BY date
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS peak,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY date) AS rn_all
                    FROM b),
              u AS (SELECT event_type, peak, c,
                           rn_all - row_number()
                             OVER (PARTITION BY event_type ORDER BY date)
                             AS grp
                    FROM p WHERE c < peak),
              g AS (SELECT event_type, grp, count(*) AS len,
                           max(((peak - c) * 10000) // peak) AS dd_bp
                    FROM u GROUP BY 1, 2)
         SELECT event_type,
                CAST(sum(len) AS BIGINT) AS n_underwater_days,
                max(len) AS longest_spell_days,
                max(dd_bp) AS deepest_dd_bp
         FROM g GROUP BY 1 ORDER BY 1""",

    "inc_time_travel_diff" ->
      """WITH ops AS (SELECT user_id, ts, event_id, event_type,
                             CAST(round(value * 100, 0) AS BIGINT) AS vc
                      FROM events),
              s1 AS (SELECT user_id, event_id AS eid1, vc AS vc1 FROM (
                       SELECT user_id, event_id, event_type, vc,
                              row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
                       FROM ops WHERE event_id % 3 = 0)
                     WHERE rn = 1 AND event_type <> 'error'),
              s2 AS (SELECT user_id, event_id AS eid2, vc AS vc2 FROM (
                       SELECT user_id, event_id, event_type, vc,
                              row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
                       FROM ops)
                     WHERE rn = 1 AND event_type <> 'error'),
              d AS (SELECT CASE
                             WHEN s1.user_id IS NULL THEN 'added'
                             WHEN s2.user_id IS NULL THEN 'deleted'
                             WHEN s1.eid1 = s2.eid2 AND s1.vc1 = s2.vc2
                               THEN 'unchanged'
                             ELSE 'changed' END AS status
                    FROM s1 FULL OUTER JOIN s2
                      ON s1.user_id = s2.user_id)
         SELECT status, count(*) AS n_keys FROM d
         GROUP BY 1 ORDER BY status""",

    "dq_order_total_reconciliation" ->
      """WITH li AS (SELECT l_orderkey AS o_orderkey,
                            CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                          AS BIGINT)) AS BIGINT) AS li_cents
                     FROM lineitem GROUP BY 1),
              j AS (SELECT o.o_orderkey,
                           CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                             AS hdr_cents,
                           li.li_cents
                    FROM orders o LEFT JOIN li USING (o_orderkey)),
              c AS (SELECT CASE
                             WHEN li_cents IS NULL THEN '1_no_lineitems'
                             WHEN hdr_cents = li_cents THEN '2_exact_match'
                             WHEN abs(hdr_cents - li_cents) <= 100
                               THEN '3_within_dollar'
                             ELSE '4_mismatch' END AS status,
                           coalesce(abs(hdr_cents - li_cents), 0)
                             AS abs_delta
                    FROM j)
         SELECT status, count(*) AS n_orders,
                CAST(sum(abs_delta) AS BIGINT) AS sum_abs_delta_cents,
                max(abs_delta) AS max_abs_delta_cents
         FROM c GROUP BY 1 ORDER BY status""",

    "ts_ulcer_index" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              p AS (SELECT event_type,
                           max(c) OVER (PARTITION BY event_type
                                        ORDER BY date
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS p, c
                    FROM b),
              d AS (SELECT event_type, ((p - c) * 10000) // p AS dd_bp
                    FROM p)
         SELECT event_type, count(*) AS n_days,
                CAST(sum(dd_bp * dd_bp) AS BIGINT) AS sum_sq_bp,
                max(dd_bp) AS max_dd_bp,
                sqrt(CAST(sum(dd_bp * dd_bp) AS BIGINT)
                     / CAST(count(*) AS DOUBLE)) / CAST(100 AS DOUBLE)
                  AS ulcer_pct
         FROM d GROUP BY 1 ORDER BY event_type""",

    "text_vocab_growth" ->
      """WITH toks AS (SELECT doc_id,
                              unnest(regexp_extract_all(translate(text,
                                'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                'abcdefghijklmnopqrstuvwxyz'),
                                '[a-z0-9]+')) AS token
                       FROM documents),
              tc AS (SELECT doc_id // 50 AS bucket, count(*) AS n_tok
                     FROM toks GROUP BY 1),
              fo AS (SELECT token, min(doc_id) AS first_doc FROM toks
                     GROUP BY 1),
              vc AS (SELECT first_doc // 50 AS bucket, count(*) AS n_voc
                     FROM fo GROUP BY 1),
              j AS (SELECT tc.bucket, tc.n_tok,
                           coalesce(vc.n_voc, 0) AS n_voc
                    FROM tc LEFT JOIN vc ON vc.bucket = tc.bucket),
              c AS (SELECT bucket,
                           sum(n_tok) OVER (ORDER BY bucket) AS cum_tokens,
                           sum(n_voc) OVER (ORDER BY bucket) AS cum_vocab
                    FROM j)
         SELECT bucket, CAST(cum_tokens AS BIGINT) AS cum_tokens,
                CAST(cum_vocab AS BIGINT) AS cum_vocab,
                CAST(cum_vocab AS DOUBLE) / CAST(cum_tokens AS DOUBLE)
                  AS ttr
         FROM c ORDER BY bucket""",

    "graph_katz_centrality" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              v0 AS (SELECT DISTINCT src AS node, CAST(1 AS BIGINT) AS katz
                     FROM e),
              v1 AS (SELECT e.src AS node,
                            CAST(1 + CAST(sum(v0.katz) AS BIGINT) // 4
                                 AS BIGINT) AS katz
                     FROM e JOIN v0 ON v0.node = e.dst GROUP BY e.src),
              v2 AS (SELECT e.src AS node,
                            CAST(1 + CAST(sum(v1.katz) AS BIGINT) // 4
                                 AS BIGINT) AS katz
                     FROM e JOIN v1 ON v1.node = e.dst GROUP BY e.src),
              v3 AS (SELECT e.src AS node,
                            CAST(1 + CAST(sum(v2.katz) AS BIGINT) // 4
                                 AS BIGINT) AS katz
                     FROM e JOIN v2 ON v2.node = e.dst GROUP BY e.src)
         SELECT node, katz FROM v3
         ORDER BY katz DESC, node LIMIT 20""",

    "text_sentence_stats" ->
      """WITH s AS (SELECT doc_id,
                           list_filter(list_transform(
                             regexp_split_to_array(text, '[.!?]+'),
                             x -> trim(x)), x -> length(x) > 0) AS sents
                    FROM documents)
         SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
                CAST(coalesce(list_sum(list_transform(sents,
                  x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT)
                  AS n_sent_chars,
                CASE WHEN len(sents) > 0 THEN
                  CAST(coalesce(list_sum(list_transform(sents,
                    x -> CAST(length(x) AS BIGINT))), 0) AS DOUBLE)
                    / CAST(len(sents) AS DOUBLE)
                END AS avg_sent_len
         FROM s ORDER BY doc_id""",

    "agg_mann_whitney_u" ->
      """WITH c AS (SELECT event_type AS et,
                           CAST(round(value * 100, 0) AS BIGINT) AS v,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              grid AS (SELECT e.et, s.v, coalesce(c.c, 0) AS c
                       FROM (SELECT DISTINCT et FROM c) e
                       CROSS JOIN (SELECT DISTINCT v FROM c) s
                       LEFT JOIN c ON c.et = e.et AND c.v = s.v),
              g AS (SELECT et, v, c,
                           CAST(coalesce(sum(c) OVER (PARTITION BY et
                             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS cum
                    FROM grid),
              p AS (SELECT a.et AS et_a, b.et AS et_b,
                           CAST(sum(a.c) AS BIGINT) AS na,
                           CAST(sum(b.c) AS BIGINT) AS nb,
                           CAST(sum(CAST(a.c AS HUGEINT)
                             * (CAST(b.cum AS HUGEINT) * 2 + b.c))
                             AS BIGINT) AS u2,
                           CAST(sum(CAST(a.c + b.c AS HUGEINT)
                             * (a.c + b.c) * (a.c + b.c) - (a.c + b.c))
                             AS HUGEINT) AS tie3
                    FROM g a JOIN g b ON a.v = b.v AND a.et < b.et
                    GROUP BY 1, 2)
         SELECT et_a, et_b, na, nb, u2,
                CASE WHEN tie3 < CAST(na + nb AS HUGEINT) * (na + nb)
                                 * (na + nb) - (na + nb) THEN
                CAST(CAST(CAST(u2 AS HUGEINT) - CAST(na AS HUGEINT) * nb
                     AS BIGINT) AS DOUBLE)
                  / (2.0 * sqrt(
                      CAST(CAST(CAST(na AS HUGEINT) * nb AS BIGINT)
                           AS DOUBLE) / 12.0
                      * (CAST(na + nb + 1 AS DOUBLE)
                         - CAST(CAST(tie3 AS BIGINT) AS DOUBLE)
                           / CAST(CAST(CAST(na + nb AS HUGEINT)
                                  * (na + nb - 1) AS BIGINT) AS DOUBLE))))
                END AS z
         FROM p ORDER BY 1, 2""",

    "agg_spearman_corr" ->
      """WITH b AS (SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS x,
                           CAST(round(p_retailprice * 100, 0) AS BIGINT)
                             AS y
                    FROM part),
              r AS (SELECT brand,
                           CAST(rank() OVER (PARTITION BY brand
                             ORDER BY x) AS BIGINT) * 2
                             + count(*) OVER (PARTITION BY brand, x) - 1
                             AS rx2,
                           CAST(rank() OVER (PARTITION BY brand
                             ORDER BY y) AS BIGINT) * 2
                             + count(*) OVER (PARTITION BY brand, y) - 1
                             AS ry2
                    FROM b),
              m AS (SELECT brand, count(*) AS n,
                           CAST(sum(rx2) AS HUGEINT) AS sx,
                           CAST(sum(ry2) AS HUGEINT) AS sy,
                           CAST(sum(CAST(rx2 AS HUGEINT) * ry2)
                                AS HUGEINT) AS sxy,
                           CAST(sum(CAST(rx2 AS HUGEINT) * rx2)
                                AS HUGEINT) AS sxx,
                           CAST(sum(CAST(ry2 AS HUGEINT) * ry2)
                                AS HUGEINT) AS syy
                    FROM r GROUP BY 1)
         SELECT brand, n,
                CASE WHEN n * sxx - sx * sx > 0
                      AND n * syy - sy * sy > 0 THEN
                  CAST(n * sxy - sx * sy AS DOUBLE)
                    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                       * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                END AS rho
         FROM m ORDER BY brand""",

    "text_simpson_diversity" ->
      """WITH f AS (SELECT lang, token, count(*) AS tf FROM (
                SELECT lang, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                FROM documents) GROUP BY 1, 2)
         SELECT lang, count(*) AS n_types,
                CAST(sum(tf) AS BIGINT) AS n_tokens,
                CAST(sum(CAST(tf AS HUGEINT) * (tf - 1)) AS BIGINT)
                  AS rep_pairs,
                CASE WHEN sum(tf) > 1 THEN
                  CAST(CAST(sum(CAST(tf AS HUGEINT) * (tf - 1))
                       AS BIGINT) AS DOUBLE)
                    / CAST(CAST(CAST(sum(tf) AS HUGEINT)
                           * (CAST(sum(tf) AS HUGEINT) - 1)
                           AS BIGINT) AS DOUBLE)
                END AS simpson
         FROM f GROUP BY lang ORDER BY lang""",

    "agg_funnel_stages" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                    JOIN v ON v.user_id = e.user_id AND e.ts >= v.t1
                    WHERE e.event_type = 'click' GROUP BY 1),
              p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                    JOIN c ON c.user_id = e.user_id AND e.ts >= c.t2
                    WHERE e.event_type = 'purchase' GROUP BY 1),
              s AS (SELECT 1 AS stage, 'view' AS stage_name,
                           count(*) AS n_users FROM v
                    UNION ALL
                    SELECT 2, 'click', count(*) FROM c
                    UNION ALL
                    SELECT 3, 'purchase', count(*) FROM p)
         SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_users,
                CAST(n_users AS DOUBLE)
                  / CAST((SELECT count(*) FROM v) AS DOUBLE) AS frac_of_top
         FROM s ORDER BY stage""",

    "mine_association_rules" ->
      """WITH i AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                    FROM lineitem),
              nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM i),
              ic AS (SELECT pk, count(*) AS n_item FROM i GROUP BY 1),
              p AS (SELECT a.pk AS part_a, b.pk AS part_b,
                           count(*) AS n_pair
                    FROM i a JOIN i b ON a.ok = b.ok AND a.pk < b.pk
                    GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT p.part_a, p.part_b, p.n_pair,
                ia.n_item AS n_a, ib.n_item AS n_b, nb.n_baskets,
                CAST(p.n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
                  AS conf_a_b,
                CAST(p.n_pair AS DOUBLE) / CAST(ib.n_item AS DOUBLE)
                  AS conf_b_a,
                CAST(CAST(CAST(p.n_pair AS HUGEINT) * nb.n_baskets AS BIGINT) AS DOUBLE)
                  / CAST(CAST(CAST(ia.n_item AS HUGEINT) * ib.n_item AS BIGINT) AS DOUBLE)
                  AS lift,
                CAST(CAST(CAST(p.n_pair AS HUGEINT) * nb.n_baskets
                     - CAST(ia.n_item AS HUGEINT) * ib.n_item AS BIGINT) AS DOUBLE)
                  / CAST(CAST(CAST(nb.n_baskets AS HUGEINT) * nb.n_baskets AS BIGINT) AS DOUBLE) AS leverage
         FROM p
         JOIN ic ia ON ia.pk = p.part_a
         JOIN ic ib ON ib.pk = p.part_b
         CROSS JOIN nb
         ORDER BY lift DESC, part_a, part_b LIMIT 25""",

    "agg_cramers_v" ->
      """WITH cells AS (SELECT event_type,
                               CAST(isodow(CAST(ts AS DATE)) AS BIGINT)
                                 AS dow,
                               count(*) AS o
                        FROM events GROUP BY 1, 2),
              grid AS (SELECT e.event_type, d.dow, coalesce(c.o, 0) AS o
                       FROM (SELECT DISTINCT event_type FROM cells) e
                       CROSS JOIN (SELECT DISTINCT dow FROM cells) d
                       LEFT JOIN cells c ON c.event_type = e.event_type
                                        AND c.dow = d.dow),
              rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r
                     FROM cells GROUP BY 1),
              ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c
                     FROM cells GROUP BY 1),
              n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                           count(DISTINCT event_type) AS nr,
                           count(DISTINCT dow) AS nc
                    FROM cells),
              j AS (SELECT g.event_type, g.dow, n.n, n.nr, n.nc,
                           g.o * n.n - rt.r * ct.c AS dev, rt.r, ct.c
                    FROM grid g
                    JOIN rt ON rt.event_type = g.event_type
                    JOIN ct ON ct.dow = g.dow
                    CROSS JOIN n),
              t AS (SELECT event_type, dow, n, nr, nc,
                           CAST(CAST(CAST(dev AS HUGEINT) * dev AS BIGINT) AS DOUBLE)
                             / CAST(n * r * c AS DOUBLE) AS cell
                    FROM j),
              f AS (SELECT n AS n_total, nr AS n_rows, nc AS n_cols,
                           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list_transform(list_sort(list(struct_pack(
                               event_type := event_type, dow := dow,
                               cell := cell))),
                               x -> x.cell)),
                             (a, b) -> a + b) AS chi2
                    FROM t GROUP BY 1, 2, 3)
         SELECT n_total, n_rows, n_cols, chi2,
                sqrt(chi2 / (CAST(n_total AS DOUBLE)
                  * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE)))
                  AS cramers_v
         FROM f""",

    "agg_cohort_ltv_curve" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS cents
                     FROM events),
              firsts AS (SELECT user_id, min(d) AS cohort_date
                         FROM ev GROUP BY 1),
              sizes AS (SELECT cohort_date, count(*) AS n_cohort_users
                        FROM firsts GROUP BY 1),
              rev AS (SELECT f.cohort_date,
                             CAST(date_diff('day', f.cohort_date, e.d)
                                  AS BIGINT) AS day_offset,
                             CAST(sum(e.cents) AS BIGINT) AS rev_cents
                      FROM ev e JOIN firsts f ON f.user_id = e.user_id
                      WHERE e.event_type = 'purchase' GROUP BY 1, 2),
              c AS (SELECT r.cohort_date, r.day_offset, r.rev_cents,
                           s.n_cohort_users,
                           CAST(sum(r.rev_cents) OVER (
                             PARTITION BY r.cohort_date
                             ORDER BY r.day_offset
                             ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS BIGINT) AS cum_rev_cents
                    FROM rev r
                    JOIN sizes s ON s.cohort_date = r.cohort_date)
         SELECT cohort_date, day_offset, rev_cents, cum_rev_cents,
                n_cohort_users,
                CAST(cum_rev_cents AS DOUBLE)
                  / (100.0 * CAST(n_cohort_users AS DOUBLE))
                  AS ltv_per_user
         FROM c ORDER BY cohort_date, day_offset""",

    "text_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                       FROM documents),
              lens AS (SELECT doc_id, count(*) AS len FROM toks
                       GROUP BY 1),
              dfq AS (SELECT token, count(DISTINCT doc_id) AS df
                      FROM toks
                      WHERE token IN ('scan', 'join', 'window')
                      GROUP BY 1),
              tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                     WHERE token IN ('scan', 'join', 'window')
                     GROUP BY 1, 2),
              tot AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                             (SELECT count(*) FROM toks) AS t_tokens),
              sc AS (SELECT tf.doc_id, tf.token, lens.len,
                            (CAST(tot.n_docs - dfq.df + 1 AS DOUBLE)
                               / CAST(dfq.df + 1 AS DOUBLE))
                            * (CAST(tf.tf AS DOUBLE) * 2.2
                               / (CAST(tf.tf AS DOUBLE)
                                  + 1.2 * (0.25 + 0.75
                                    * (CAST(lens.len * tot.n_docs
                                            AS DOUBLE)
                                       / CAST(tot.t_tokens AS DOUBLE)))))
                              AS s
                     FROM tf
                     JOIN lens ON lens.doc_id = tf.doc_id
                     JOIN dfq ON dfq.token = tf.token
                     CROSS JOIN tot)
         SELECT doc_id, CAST(max(len) AS BIGINT) AS len,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(list_sort(list(struct_pack(
                    token := token, s := s))), x -> x.s)),
                  (a, b) -> a + b) AS bm25
         FROM sc GROUP BY doc_id
         ORDER BY bm25 DESC, doc_id LIMIT 10""",

    "agg_kruskal_wallis" ->
      """WITH c AS (SELECT event_type AS et,
                           CAST(round(value * 100, 0) AS BIGINT) AS v,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
              t0 AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct
                     FROM c GROUP BY 1),
              tot AS (SELECT v, ct,
                             CAST(coalesce(sum(ct) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING AND
                               1 PRECEDING), 0) AS BIGINT) AS cum
                      FROM t0),
              g AS (SELECT c.et, CAST(sum(c.c) AS BIGINT) AS n,
                           CAST(sum(CAST(c.c AS HUGEINT)
                             * (CAST(tot.cum AS HUGEINT) * 2 + tot.ct + 1))
                             AS DECIMAL(38,0)) AS r2
                    FROM c JOIN tot ON tot.v = c.v GROUP BY 1),
              terms AS (SELECT et, n, r2,
                               CAST(CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT)
                                    * 16 // (4 * CAST(n AS HUGEINT))
                                    AS BIGINT) AS term_q16
                        FROM g),
              ties AS (SELECT CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct)
                              AS BIGINT) AS t3
                       FROM t0),
              hh AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                            CAST(sum(CAST(term_q16 AS HUGEINT)) AS BIGINT)
                              AS sq
                     FROM terms),
              hs AS (SELECT nt,
                            12.0 / CAST(CAST(CAST(nt AS HUGEINT) * (nt + 1)
                                        AS BIGINT) AS DOUBLE)
                              * (CAST(sq AS DOUBLE) / 16.0)
                              - 3.0 * CAST(nt + 1 AS DOUBLE) AS h,
                            1.0 - CAST((SELECT t3 FROM ties) AS DOUBLE)
                              / CAST(CAST(CAST(nt AS HUGEINT) * nt * nt - nt
                                     AS BIGINT) AS DOUBLE) AS corr
                     FROM hh)
         SELECT terms.et AS event_type, terms.n,
                CAST(terms.r2 AS BIGINT) AS r2,
                hs.nt AS n_total, hs.h,
                CASE WHEN hs.corr <> 0.0 THEN hs.h / hs.corr
                END AS h_tie_corrected
         FROM terms CROSS JOIN hs ORDER BY event_type""",

    "ts_theil_sen_days" ->
      """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                            CAST(round(arg_max(value, ts) * 100, 0)
                                 AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
              d AS (SELECT event_type, c,
                           CAST(datediff('day', DATE '1970-01-01', dt)
                                AS BIGINT) AS dn
                    FROM d0),
              p AS (SELECT a.event_type,
                           (b.c - a.c) * 1000000 AS num,
                           b.dn - a.dn AS den
                    FROM d a JOIN d b ON a.event_type = b.event_type
                                     AND a.dn < b.dn),
              sl AS (SELECT event_type,
                            CAST((num - ((num % den) + den) % den) // den
                                 AS BIGINT) AS slope_ppm
                     FROM p),
              r AS (SELECT event_type, slope_ppm,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY slope_ppm) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM sl)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
                CAST(min(CASE WHEN rn * 2 >= n + 1 THEN slope_ppm END)
                     AS BIGINT) AS slope_ppm_med
         FROM r GROUP BY 1 ORDER BY 1""",

    "ts_haar_energy" ->
      """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                            CAST(round(arg_max(value, ts) * 100, 0)
                                 AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
              d AS (SELECT event_type, c,
                           row_number() OVER (PARTITION BY event_type
                             ORDER BY dt) - 1 AS i
                    FROM d0 QUALIFY i < 32),
              lv AS (SELECT l.level, d.event_type,
                            d.i // (1 << l.level) AS blk,
                            CASE WHEN (d.i // (1 << (l.level - 1))) % 2 = 0
                                 THEN d.c ELSE -d.c END AS sc
                     FROM d CROSS JOIN
                       (SELECT unnest([1, 2, 3]) AS level) l),
              det AS (SELECT level, event_type, blk,
                             CAST(sum(sc) AS BIGINT) AS detail
                      FROM lv GROUP BY 1, 2, 3
                      HAVING count(*) = (1 << level))
         SELECT event_type, CAST(level AS BIGINT) AS level,
                count(*) AS n_blocks,
                CAST(sum(CAST(detail AS HUGEINT) * detail) AS BIGINT)
                  AS energy
         FROM det GROUP BY 1, 2 ORDER BY event_type, level""",

    "ts_changepoint_binseg" ->
      """WITH d0 AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                            CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                 AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
              d AS (SELECT event_type, dt, c,
                           CAST(row_number() OVER (PARTITION BY event_type
                             ORDER BY dt) AS BIGINT) AS i,
                           CAST(count(*) OVER (PARTITION BY event_type)
                                AS BIGINT) AS n,
                           CAST(sum(c) OVER (PARTITION BY event_type
                             ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS sl,
                           CAST(sum(c) OVER (PARTITION BY event_type)
                                AS BIGINT) AS st
                    FROM d0),
              f AS (SELECT event_type, i, n, sl, st,
                           CAST(CAST(sl AS HUGEINT) * sl // i
                                + CAST(st - sl AS HUGEINT) * (st - sl)
                                  // (n - i) AS BIGINT) AS fq
                    FROM d WHERE i < n)
         SELECT event_type, n AS n_days, i AS t_star, fq AS f_q,
                sl // i AS mean_before_c,
                (st - sl) // (n - i) AS mean_after_c
         FROM f
         QUALIFY row_number() OVER (PARTITION BY event_type
           ORDER BY fq DESC, i) = 1
         ORDER BY event_type""",

    "agg_srm_check" ->
      """WITH h AS (SELECT event_type,
                           CASE WHEN (((user_id % 2147483647) * 1103515245
                                       + 12345) % 2147483647) % 2 = 0
                                THEN 'a' ELSE 'b' END AS arm
                    FROM events),
              c AS (SELECT event_type,
                           CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END)
                                AS BIGINT) AS na,
                           CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END)
                                AS BIGINT) AS nb
                    FROM h GROUP BY 1)
         SELECT event_type, na, nb,
                CAST(CAST(na - nb AS HUGEINT) * (na - nb) AS BIGINT)
                  AS srm_num,
                na + nb AS srm_den,
                CAST(CAST(CAST(na - nb AS HUGEINT) * (na - nb) AS BIGINT)
                     AS DOUBLE) / CAST(na + nb AS DOUBLE) AS srm_chi2,
                CASE WHEN CAST(na - nb AS HUGEINT) * (na - nb) * 10000
                          > CAST(na + nb AS HUGEINT) * 38415
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                END AS srm_flag
         FROM c ORDER BY event_type""",

    "olap_peak_concurrency" ->
      """WITH h AS (SELECT CAST(ts AS DATE) AS dt,
                           date_trunc('hour', ts) AS hr,
                           count(DISTINCT user_id) AS u
                    FROM events GROUP BY 1, 2)
         SELECT dt, count(*) AS n_active_hours,
                CAST(max(u) AS BIGINT) AS peak_hourly_users,
                CAST(sum(u) AS BIGINT) AS user_hours
         FROM h GROUP BY 1 ORDER BY 1""",

    "text_hapax_ratio" ->
      """WITH f AS (SELECT lang, token, count(*) AS tf FROM (
                SELECT lang, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                FROM documents) GROUP BY 1, 2)
         SELECT lang, count(*) AS n_types,
                CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hapax,
                CAST(1000000 * sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
                     // count(*) AS BIGINT) AS hapax_ppm
         FROM f GROUP BY 1 ORDER BY 1""",

    "dq_ts_monotonicity" ->
      """WITH o AS (SELECT event_type, ts,
                           lag(ts) OVER (PARTITION BY event_type
                             ORDER BY event_id) AS pts
                    FROM events)
         SELECT event_type, count(*) AS n_checked,
                CAST(sum(CASE WHEN ts < pts THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_regressions,
                CAST(1000000 * sum(CASE WHEN ts < pts THEN 1 ELSE 0 END)
                     // count(*) AS BIGINT) AS regression_ppm
         FROM o WHERE pts IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "olap_intervisit_gap" ->
      """WITH o AS (SELECT event_type, user_id, ts,
                           lag(ts) OVER (PARTITION BY event_type, user_id
                             ORDER BY ts, event_id) AS pts
                    FROM events),
              g AS (SELECT event_type,
                           CAST(datediff('microsecond', pts, ts)
                                // 60000000 AS BIGINT) AS gap_min
                    FROM o WHERE pts IS NOT NULL),
              h AS (SELECT event_type, gap_min, count(*) AS m
                    FROM g GROUP BY 1, 2),
              c AS (SELECT event_type, gap_min, m,
                           CAST(sum(m) OVER (PARTITION BY event_type
                             ORDER BY gap_min ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                           CAST(sum(m) OVER (PARTITION BY event_type)
                                AS BIGINT) AS n
                    FROM h)
         SELECT event_type, max(n) AS n_gaps,
                CAST(min(CASE WHEN cum * 2 >= n + 1 THEN gap_min END)
                     AS BIGINT) AS median_gap_min,
                CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap_min END)
                     AS BIGINT) AS p90_gap_min
         FROM c GROUP BY 1 ORDER BY 1""",

    "dedup_simhash_bit_balance" ->
      s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
              sh AS (SELECT doc_id, $duckSimhash AS simhash FROM h),
              bb AS (SELECT bit,
                            CAST(sum((sh.simhash // (1 << bit)) % 2)
                                 AS BIGINT) AS n_set,
                            count(*) AS n_docs
                     FROM sh CROSS JOIN
                       (SELECT unnest(generate_series(0, 31)) AS bit) b
                     GROUP BY 1)
          SELECT CAST(bit AS BIGINT) AS bit, n_set, n_docs,
                 2 * n_set - n_docs AS imbalance,
                 CASE WHEN CAST(2 * n_set - n_docs AS HUGEINT)
                           * (2 * n_set - n_docs) * 100
                           > CAST(n_docs AS HUGEINT) * 961
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS biased_flag
          FROM bb ORDER BY bit""",

    "agg_g_test" -> {
      val lon = graft.functions.FixedLog2.sql("on_")
      val lrc = graft.functions.FixedLog2.sql("rc")
      s"""WITH c AS (SELECT event_type,
                            least(CAST(2 AS BIGINT),
                                  CAST(round(value*100,0) AS BIGINT) // 7500)
                              AS vb, count(*) AS o
                     FROM events GROUP BY 1, 2),
               r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
                     FROM c GROUP BY 1),
               k AS (SELECT vb, CAST(sum(o) AS BIGINT) AS ct
                     FROM c GROUP BY 1),
               n AS (SELECT CAST(sum(o) AS BIGINT) AS nt FROM c),
               t AS (SELECT c.o, c.o * n.nt AS on_, r.rt * k.ct AS rc
                     FROM c JOIN r USING (event_type) JOIN k USING (vb)
                     CROSS JOIN n)
          SELECT (SELECT nt FROM n) AS n_events,
                 CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(CAST(o AS HUGEINT) * ($lon - $lrc)) AS BIGINT)
                   AS g_scaled,
                 CAST(8 AS BIGINT) AS df,
                 CAST(CAST(sum(CAST(o AS HUGEINT) * ($lon - $lrc))
                      AS BIGINT) AS DOUBLE)
                   * 1.3862943611198906 / 1048576.0 AS g_stat,
                 CASE WHEN CAST(sum(CAST(o AS HUGEINT) * ($lon - $lrc))
                           AS BIGINT) > 11729304
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS reject_flag
          FROM t"""
    },

    "agg_poisson_rate_test" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn,
                           max(CAST(ts AS DATE)) AS mx FROM events),
              s AS (SELECT mn,
                           mn + CAST((datediff('day', mn, mx) + 1) // 2
                                     AS INTEGER) AS mid,
                           mx FROM b),
              g AS (SELECT event_type,
                           CAST(sum(CASE WHEN CAST(ts AS DATE) < s.mid
                                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                           CAST(sum(CASE WHEN CAST(ts AS DATE) >= s.mid
                                         THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                           CAST(datediff('day', min(s.mn), min(s.mid))
                                AS BIGINT) AS e1,
                           CAST(datediff('day', min(s.mid), min(s.mx)) + 1
                                AS BIGINT) AS e2
                    FROM events, s GROUP BY 1)
         SELECT event_type, n1, n2, e1, e2,
                CAST((10000 * n1 * e2) // (n2 * e1) AS BIGINT)
                  AS rate_ratio_q4,
                CAST((CAST(n1*(e1+e2) - (n1+n2)*e1 AS HUGEINT)
                      * (n1*(e1+e2) - (n1+n2)*e1) * 10000)
                     // ((n1+n2) * e1 * e2) AS BIGINT) AS score_q4,
                CASE WHEN CAST(n1*(e1+e2) - (n1+n2)*e1 AS HUGEINT)
                          * (n1*(e1+e2) - (n1+n2)*e1) * 10000
                          > CAST((n1+n2) AS HUGEINT) * e1 * e2 * 38415
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                END AS rate_shift_flag
         FROM g ORDER BY event_type""",

    "agg_tukey_hsd" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                AS BIGINT) AS s,
                           CAST(sum(CAST(CAST(round(value * 100, 0)
                                    AS BIGINT) AS HUGEINT)
                                    * CAST(round(value * 100, 0) AS BIGINT))
                                AS BIGINT) AS ss
                    FROM events GROUP BY 1),
              t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                           CAST(count(*) AS BIGINT) AS k,
                           CAST(sum(ss - (CAST(s AS HUGEINT) * s) // n)
                                AS BIGINT) AS ssw_q
                    FROM g),
              p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                           a.n AS n_a, b.n AS n_b,
                           (256 * a.s) // a.n - (256 * b.s) // b.n AS dq,
                           100 * CAST((256*a.s)//a.n - (256*b.s)//b.n
                                      AS HUGEINT)
                               * ((256*a.s)//a.n - (256*b.s)//b.n)
                               * (t.nn - t.k) * 2 * a.n * b.n AS lhs,
                           1488 * 65536 * CAST(t.ssw_q AS HUGEINT)
                               * (a.n + b.n) AS rhs
                    FROM g a JOIN g b ON a.event_type < b.event_type
                    CROSS JOIN t)
         SELECT type_a, type_b, n_a, n_b,
                CAST(dq AS BIGINT) AS mean_diff_q8,
                CAST((10000 * lhs) // rhs AS BIGINT) AS hsd_ratio_q4,
                CASE WHEN lhs > rhs THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS hsd_flag
         FROM p ORDER BY type_a, type_b""",

    "sample_systematic" ->
      """WITH o AS (SELECT event_type, event_id,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents,
                           row_number() OVER (
                             PARTITION BY event_type, CAST(ts AS DATE)
                             ORDER BY ts, event_id) AS r
                    FROM events),
              tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
                      FROM o GROUP BY 1),
              kept AS (SELECT event_type,
                              CAST(count(*) AS BIGINT) AS n_kept,
                              CAST(sum(event_id) AS BIGINT) AS id_checksum,
                              CAST(sum(cents) AS BIGINT) AS cents_kept
                       FROM o WHERE r % 20 = 7 GROUP BY 1)
         SELECT event_type, n_total, n_kept, id_checksum, cents_kept
         FROM tot JOIN kept USING (event_type) ORDER BY event_type""",

    "ts_ou_halflife" -> {
      val lphi = graft.functions.FixedLog2.sql("abs(phi_q16)")
      s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                            CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                 AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
               l AS (SELECT event_type, x,
                            lag(x) OVER (PARTITION BY event_type
                                         ORDER BY dt) AS px
                     FROM d),
               a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                            CAST(sum(CAST(x AS HUGEINT) * px) AS BIGINT)
                              AS sxy,
                            CAST(sum(x) AS BIGINT) AS sx,
                            CAST(sum(px) AS BIGINT) AS sp,
                            CAST(sum(CAST(px AS HUGEINT) * px) AS BIGINT)
                              AS spp
                     FROM l WHERE px IS NOT NULL GROUP BY 1),
               p AS (SELECT event_type, n,
                            CAST((65536 * (CAST(n AS HUGEINT)*sxy
                                           - CAST(sx AS HUGEINT)*sp))
                                 // (CAST(n AS HUGEINT)*spp
                                     - CAST(sp AS HUGEINT)*sp) AS BIGINT)
                              AS phi_q16
                     FROM a)
          SELECT event_type, n, phi_q16,
                 CASE WHEN abs(phi_q16) BETWEEN 1 AND 65535
                      THEN CAST(268435456 // (16777216 - $lphi) AS BIGINT)
                      ELSE NULL END AS halflife_q8,
                 CASE WHEN abs(phi_q16) BETWEEN 1 AND 65535
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS reverting_flag
          FROM p ORDER BY event_type"""
    },

    "agg_cohens_kappa" ->
      """WITH l AS (SELECT CASE WHEN n_chars < 220 THEN 0
                                WHEN n_chars < 380 THEN 1 ELSE 2 END AS la,
                           CASE WHEN length(text)
                                     - length(replace(text, ' ', '')) + 1
                                     < 40 THEN 0
                                WHEN length(text)
                                     - length(replace(text, ' ', '')) + 1
                                     < 69 THEN 1
                                ELSE 2 END AS lb
                    FROM documents),
              o AS (SELECT la, lb, count(*) AS n FROM l GROUP BY 1, 2),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
                             CAST(sum(CASE WHEN la = lb THEN n ELSE 0 END)
                                  AS BIGINT) AS n_agree
                      FROM o),
              marg AS (SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS chance
                       FROM (SELECT la, sum(n) AS rn FROM o GROUP BY 1) r
                       JOIN (SELECT lb, sum(n) AS cn FROM o GROUP BY 1) c
                         ON r.la = c.lb)
         SELECT t.n_total, t.n_agree, m.chance,
                CAST(t.n_total * t.n_agree - m.chance AS BIGINT)
                  AS kappa_num,
                CAST(t.n_total * t.n_total - m.chance AS BIGINT)
                  AS kappa_den,
                CAST(t.n_total * t.n_agree - m.chance AS DOUBLE)
                  / CAST(t.n_total * t.n_total - m.chance AS DOUBLE)
                  AS kappa
         FROM tot t, marg m""",

    "mine_markov_stationary" ->
      """WITH s AS (SELECT event_type AS e_from,
                           lead(event_type, 1) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS e_to
                    FROM events),
              p AS (SELECT e_from, e_to, count(*) AS n FROM s
                    WHERE e_to IS NOT NULL GROUP BY 1, 2),
              t AS (SELECT e_from, CAST(sum(n) AS BIGINT) AS row_n
                    FROM p GROUP BY 1),
              st AS (SELECT DISTINCT e_from AS event_type FROM p),
              pi0 AS (SELECT event_type, CAST(65536 AS BIGINT) AS v FROM st),
              pi1 AS (SELECT st.event_type,
                             coalesce(CAST(sum((pi0.v * p.n) // t.row_n)
                               AS BIGINT), 0) AS v
                      FROM st
                      LEFT JOIN p ON p.e_to = st.event_type
                      LEFT JOIN pi0 ON pi0.event_type = p.e_from
                      LEFT JOIN t ON t.e_from = p.e_from
                      GROUP BY 1),
              pi2 AS (SELECT st.event_type,
                             coalesce(CAST(sum((pi1.v * p.n) // t.row_n)
                               AS BIGINT), 0) AS v
                      FROM st
                      LEFT JOIN p ON p.e_to = st.event_type
                      LEFT JOIN pi1 ON pi1.event_type = p.e_from
                      LEFT JOIN t ON t.e_from = p.e_from
                      GROUP BY 1),
              pi3 AS (SELECT st.event_type,
                             coalesce(CAST(sum((pi2.v * p.n) // t.row_n)
                               AS BIGINT), 0) AS v
                      FROM st
                      LEFT JOIN p ON p.e_to = st.event_type
                      LEFT JOIN pi2 ON pi2.event_type = p.e_from
                      LEFT JOIN t ON t.e_from = p.e_from
                      GROUP BY 1),
              z AS (SELECT CAST(sum(v) AS BIGINT) AS total FROM pi3)
         SELECT pi3.event_type, pi3.v AS pi_q16,
                CAST(pi3.v AS DOUBLE) / CAST(z.total AS DOUBLE) AS pi_share
         FROM pi3, z ORDER BY event_type""",

    "graph_adamic_adar" -> {
      val lg = graft.functions.FixedLog2.sql("dc")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                      FROM lineitem),
               e AS (SELECT DISTINCT a.p AS u, b.p AS v
                     FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
               sym AS (SELECT u AS c, v AS x FROM e
                       UNION ALL SELECT v, u FROM e),
               deg AS (SELECT c, CAST(count(*) AS BIGINT) AS dc
                       FROM sym GROUP BY 1),
               term AS (SELECT c,
                          CAST(1099511627776 // $lg AS BIGINT) AS aa_term
                        FROM deg WHERE dc <= 64 AND dc >= 2),
               w AS (SELECT s1.x AS x, s2.x AS y, term.aa_term
                     FROM sym s1
                     JOIN sym s2 ON s1.c = s2.c AND s1.x < s2.x
                     JOIN term ON term.c = s1.c),
               sc AS (SELECT x, y, count(*) AS cn,
                             CAST(sum(aa_term) AS BIGINT) AS aa_q20
                      FROM w GROUP BY 1, 2),
               nz AS (SELECT sc.* FROM sc
                      WHERE NOT EXISTS (SELECT 1 FROM e
                                        WHERE e.u = sc.x AND e.v = sc.y))
          SELECT x, y, cn, aa_q20,
                 CAST(aa_q20 AS DOUBLE) / CAST(1048576 AS DOUBLE)
                   AS adamic_adar
          FROM nz ORDER BY aa_q20 DESC, x, y LIMIT 20"""
    },

    // same 64/32 window enumeration as mm_audio_window; centered samples
    // are ns·b[j] − wsum (exact integer DC removal), a crossing is a
    // strict sign change, counted branch-free as (1 − sign(prod)) // 2
    "mm_audio_zcr" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                      WHERE doc_id < 200 AND octet_length(encode(text)) > 0),
             b AS (SELECT media_id, nb, ${duckHexBytes("h")} AS bytes
                   FROM hx),
             w AS (SELECT media_id, nb, bytes,
                          CAST(unnest(generate_series(0,
                            CAST((nb - 1) // 32 AS INT))) AS INT)
                            AS window_idx
                   FROM b),
             c AS (SELECT media_id, window_idx, bytes,
                          least(64, nb - window_idx * 32) AS ns
                   FROM w),
             d AS (SELECT media_id, window_idx, bytes, ns,
                          CAST(list_sum(list_transform(
                            generate_series(window_idx * 32 + 1,
                                            window_idx * 32 + ns),
                            j -> bytes[j])) AS BIGINT) AS wsum
                   FROM c),
             x AS (SELECT media_id, window_idx, ns,
                          CAST(coalesce(list_sum(list_transform(
                            generate_series(window_idx * 32 + 1,
                                            window_idx * 32 + ns - 1),
                            j -> (1 - sign((ns * bytes[j] - wsum)
                                   * (ns * bytes[j + 1] - wsum))) // 2)), 0)
                            AS BIGINT) AS crossings
                   FROM d)
         SELECT media_id, window_idx, CAST(ns AS BIGINT) AS n_samples,
                crossings,
                CASE WHEN ns >= 2 THEN CAST(crossings AS DOUBLE)
                       / CAST(ns - 1 AS DOUBLE) END AS zcr
         FROM x ORDER BY media_id, window_idx""",

    "emb_hubness" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(4, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH b AS (SELECT vec_id, embedding, $bits AS bucket
                     FROM embeddings),
              pairs AS (SELECT a.vec_id AS va, b2.vec_id AS vb,
                          ${duckDot("a.embedding", "b2.embedding")}
                            / (sqrt(${duckDot("a.embedding", "a.embedding")})
                               * sqrt(${duckDot("b2.embedding",
                                 "b2.embedding")})) AS cosine
                        FROM b a JOIN b b2 ON a.bucket = b2.bucket
                                           AND a.vec_id <> b2.vec_id),
              ranked AS (SELECT va, vb,
                           row_number() OVER (PARTITION BY va
                             ORDER BY cosine DESC, vb) AS rk
                         FROM pairs QUALIFY rk <= 3),
              occ AS (SELECT vb AS vec_id, count(*) AS occ
                      FROM ranked GROUP BY 1),
              allv AS (SELECT e.vec_id, coalesce(o.occ, 0) AS n_k
                       FROM embeddings e
                       LEFT JOIN occ o ON o.vec_id = e.vec_id)
          SELECT n_k, CAST(count(*) AS BIGINT) AS n_vectors
          FROM allv GROUP BY 1 ORDER BY 1"""
    },

    // first-in-window difference array: user-day (d, prev) is first inside
    // windows ending e in [max(d, prev+7), d+6]; +1/-1 at the bounds,
    // prefix sum over the bounded day axis = exact sliding distinct
    "olap_wau_sliding_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                     FROM events),
              lagd AS (SELECT user_id, d,
                              lag(d) OVER (PARTITION BY user_id
                                           ORDER BY d) AS prev
                       FROM ud),
              seg AS (SELECT CASE WHEN prev IS NULL THEN d
                                  ELSE greatest(d, prev + 7) END AS e_start,
                             d + 7 AS e_next
                      FROM lagd),
              delta AS (SELECT e_start AS e, 1 AS v FROM seg
                        UNION ALL SELECT e_next, -1 FROM seg),
              dd AS (SELECT e, CAST(sum(v) AS BIGINT) AS dv
                     FROM delta GROUP BY 1),
              bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
                                max(CAST(ts AS DATE)) AS mx FROM events),
              days AS (SELECT CAST(unnest(generate_series(mn, mx,
                                INTERVAL 1 DAY)) AS DATE) AS day
                       FROM bounds),
              cum AS (SELECT days.day, coalesce(dd.dv, 0) AS dv
                      FROM days LEFT JOIN dd ON dd.e = days.day)
         SELECT day, CAST(sum(dv) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS wau
         FROM cum ORDER BY day""",

    "graph_path3_census" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              sym AS (SELECT u AS c, v AS x FROM e
                      UNION ALL SELECT v, u FROM e),
              deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d
                      FROM sym GROUP BY 1),
              ord AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
                      FROM e JOIN deg du ON du.c = e.u
                             JOIN deg dv ON dv.c = e.v),
              dir AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v)
                                  THEN u ELSE v END AS a,
                             CASE WHEN du < dv OR (du = dv AND u < v)
                                  THEN v ELSE u END AS b
                      FROM ord),
              tri AS (SELECT CAST(count(*) AS BIGINT) AS t
                      FROM dir d1
                      JOIN dir d2 ON d2.a = d1.b
                      JOIN dir d3 ON d3.a = d1.a AND d3.b = d2.b),
              w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges
                    FROM deg),
              p3 AS (SELECT CAST(sum((du.d - 1) * (dv.d - 1)) AS BIGINT)
                       AS pp
                     FROM e JOIN deg du ON du.c = e.u
                            JOIN deg dv ON dv.c = e.v),
              ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
              nv AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
         SELECT nv.n_nodes, ne.n_edges, w.wedges AS n_wedges,
                tri.t AS n_triangles, p3.pp - 3 * tri.t AS n_path3
         FROM nv, ne, w, tri, p3""",

    "ts_var_cvar" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              r AS (SELECT event_type,
                           CAST(floor(CAST(c - lag(c) OVER w AS DOUBLE)
                                / CAST(lag(c) OVER w AS DOUBLE)
                                * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM b WINDOW w AS (PARTITION BY event_type
                                        ORDER BY date)),
              q AS (SELECT event_type, x,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY x) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM r WHERE x IS NOT NULL),
              v AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
                           CAST(max((n * 5 + 99) // 100) AS BIGINT)
                             AS n_tail,
                           max(x) AS var_q20,
                           CAST(sum(x) AS BIGINT) AS tail_sum
                    FROM q WHERE rn <= (n * 5 + 99) // 100
                    GROUP BY 1)
         SELECT event_type, n_days, n_tail, var_q20,
                CAST(var_q20 AS DOUBLE) / CAST(1048576 AS DOUBLE)
                  AS var_5pct,
                CAST(tail_sum AS DOUBLE) / CAST(n_tail AS DOUBLE)
                  / CAST(1048576 AS DOUBLE) AS cvar_5pct
         FROM v ORDER BY event_type""",

    // triangle multiset is method-independent, so the wedge-free support
    // census here matches Spark's compact-forward enumeration exactly
    "graph_truss_support" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              sym AS (SELECT u AS c, v AS x FROM e
                      UNION ALL SELECT v, u FROM e),
              deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d
                      FROM sym GROUP BY 1),
              ord AS (SELECT e.u, e.v, du.d AS du, dv.d AS dv
                      FROM e JOIN deg du ON du.c = e.u
                             JOIN deg dv ON dv.c = e.v),
              dir AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v)
                                  THEN u ELSE v END AS a,
                             CASE WHEN du < dv OR (du = dv AND u < v)
                                  THEN v ELSE u END AS b
                      FROM ord),
              tri AS (SELECT d1.a AS x, d1.b AS y, d2.b AS z
                      FROM dir d1
                      JOIN dir d2 ON d2.a = d1.b
                      JOIN dir d3 ON d3.a = d1.a AND d3.b = d2.b),
              sup AS (SELECT u, v, CAST(count(*) AS BIGINT) AS support
                      FROM (SELECT least(x, y) AS u, greatest(x, y) AS v
                            FROM tri
                            UNION ALL SELECT least(y, z), greatest(y, z)
                            FROM tri
                            UNION ALL SELECT least(x, z), greatest(x, z)
                            FROM tri)
                      GROUP BY 1, 2),
              alle AS (SELECT coalesce(s.support, 0) AS support
                       FROM e LEFT JOIN sup s ON s.u = e.u AND s.v = e.v)
         SELECT support, CAST(count(*) AS BIGINT) AS n_edges
         FROM alle GROUP BY 1 ORDER BY 1""",

    // 64 hash sign-splits as gated sums in one wide aggregation; the
    // spread-hash chain replayed inline exactly as sample_hash_split does
    "agg_permutation_test" -> {
      val sums = (0 until 64).map { p =>
        s"""sum(CASE WHEN ((h3 * 1000003 + ${p * 7919 + 12345})
           |  % 2147483647 >> 7) & 1 = 1 THEN cc ELSE 0 END) AS s$p,
           |sum(CASE WHEN ((h3 * 1000003 + ${p * 7919 + 12345})
           |  % 2147483647 >> 7) & 1 = 1 THEN 1 ELSE 0 END) AS m$p"""
          .stripMargin
      }.mkString(",\n")
      val dterms = (0 until 64).map { p =>
        s"abs(CAST(n AS DECIMAL(38,0)) * s$p" +
          s" - CAST(m$p AS DECIMAL(38,0)) * s) AS d$p"
      }.mkString(",\n")
      val cnt = (0 until 64)
        .map(p => s"(CASE WHEN d$p >= d_obs THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT event_id, event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS cc
                     FROM events),
              f AS (SELECT *,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(event_id AS VARCHAR),
                                                    ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM e),
              h AS (SELECT event_id, event_type, cc,
                           ((((h0 * 1103515245 + 12345) % 2147483647)
                             * ((h0 * 1103515245 + 12345) % 2147483647))
                            % 2147483647
                            * 69069 + 362437) % 2147483647 AS h3
                    FROM f),
              agg AS (SELECT count(*) AS n, sum(cc) AS s,
                             sum(CASE WHEN event_type = 'purchase'
                                      THEN cc ELSE 0 END) AS s_obs,
                             sum(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) AS n_obs,
                             $sums
                      FROM h),
              d AS (SELECT n, s, n_obs, s_obs,
                           abs(CAST(n AS DECIMAL(38,0)) * s_obs
                               - CAST(n_obs AS DECIMAL(38,0)) * s) AS d_obs,
                           $dterms
                    FROM agg)
         SELECT CAST(n AS BIGINT) AS n_events,
                CAST(n_obs AS BIGINT) AS n_treat,
                CAST(d_obs AS BIGINT) AS d_obs,
                CAST($cnt AS BIGINT) AS n_perm_ge,
                CAST(($cnt) + 1 AS DOUBLE) / CAST(65 AS DOUBLE) AS p_value
         FROM d"""
    },

    "text_heldout_perplexity" -> {
      val lTot =
        graft.functions.FixedLog2.sql("(SELECT t_train + v_train FROM stats)")
      val lCp = graft.functions.FixedLog2.sql("cp")
      s"""WITH tok AS (SELECT doc_id, source,
                              unnest(string_split(text, ' ')) AS w
                       FROM documents),
               tr AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                      FROM tok WHERE doc_id % 2 = 0 GROUP BY 1),
               stats AS (SELECT CAST(sum(c) AS BIGINT) AS t_train,
                                CAST(count(*) AS BIGINT) AS v_train
                         FROM tr),
               ev AS (SELECT tok.source, coalesce(tr.c, 0) + 1 AS cp
                      FROM tok LEFT JOIN tr ON tr.w = tok.w
                      WHERE tok.doc_id % 2 = 1),
               terms AS (SELECT source, $lTot - $lCp AS bits_q20 FROM ev)
          SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(bits_q20) AS BIGINT) AS bits_q20,
                 CAST(sum(bits_q20) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   / CAST(1048576 AS DOUBLE) AS bits_per_token
          FROM terms GROUP BY 1 ORDER BY 1"""
    },

    // lossless grayscale PNG: every tile sum recomputed arithmetically
    // from the synthesis formula pixel(x,y) = (id*31 + x*7 + y*13) % 256
    "mm_image_tiles" ->
      """WITH m AS (SELECT doc_id AS media_id,
                           CAST(1 + doc_id % 8 AS BIGINT) AS w,
                           CAST(1 + n_chars % 8 AS BIGINT) AS h
                    FROM documents WHERE doc_id < 500),
              t AS (SELECT media_id, w, h,
                           (w + 1) // 2 AS tw, (h + 1) // 2 AS th,
                           unnest([0, 0, 1, 1]) AS tile_row,
                           unnest([0, 1, 0, 1]) AS tile_col
                    FROM m),
              b AS (SELECT *,
                           CASE WHEN tile_col = 0 THEN 0 ELSE tw END AS x0,
                           CASE WHEN tile_col = 0 THEN tw - 1 ELSE w - 1
                           END AS x1,
                           CASE WHEN tile_row = 0 THEN 0 ELSE th END AS y0,
                           CASE WHEN tile_row = 0 THEN th - 1 ELSE h - 1
                           END AS y1
                    FROM t),
              nz AS (SELECT * FROM b WHERE x1 >= x0 AND y1 >= y0)
         SELECT media_id, w AS width, h AS height,
                CAST(tile_row AS BIGINT) AS tile_row,
                CAST(tile_col AS BIGINT) AS tile_col,
                CAST((x1 - x0 + 1) * (y1 - y0 + 1) AS BIGINT) AS n_px,
                CAST(list_sum(flatten(list_transform(
                  generate_series(y0, y1), y ->
                    list_transform(generate_series(x0, x1), x ->
                      (media_id * 31 + x * 7 + y * 13) % 256))))
                  AS BIGINT) AS px_sum
         FROM nz ORDER BY media_id, tile_row, tile_col""",

    // identical packed-state fold as the Spark higher-order aggregate;
    // state (s1,s2) biased by 2^30 and packed into one BIGINT so the
    // documented DuckDB in-place-struct hazard cannot touch it
    "ts_goertzel_power" -> {
      val B = 1073741824L
      val M = 2147483648L
      def fold(cq: Long) =
        s"""list_reduce(list_prepend(CAST(${B * M + B} AS BIGINT), ys),
           |  (a, yq) ->
           |    (yq + ($cq * (a // $M - $B)) // 65536
           |       - (a % $M - $B) + $B) * $M
           |    + (a // $M - $B) + $B)""".stripMargin
      def power(cq: Long, k: String) = {
        val s1 = s"($k // $M - $B)"
        val s2 = s"($k % $M - $B)"
        s"($s1 * $s1 + $s2 * $s2 - ($cq * $s1 * $s2) // 65536)"
      }
      s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                            CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                                 AS BIGINT) AS x
                     FROM events GROUP BY 1, 2),
              sgg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                             CAST(sum(x) AS BIGINT) AS sx,
                             list(x ORDER BY dt) AS xs
                      FROM d GROUP BY 1),
              y AS (SELECT event_type, n_days,
                           list_transform(xs,
                             v -> (v - sx // n_days) // 1024) AS ys
                    FROM sgg),
              g AS (SELECT event_type, n_days,
                           ${fold(81722L)} AS k7,
                           ${fold(106039L)} AS k10
                    FROM y)
          SELECT event_type, n_days,
                 CAST(${power(81722L, "k7")} AS BIGINT) AS power_p7,
                 CAST(${power(106039L, "k10")} AS BIGINT) AS power_p10,
                 CASE WHEN ${power(81722L, "k7")}
                        > ${power(106039L, "k10")}
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS weekly_dominant
          FROM g ORDER BY event_type"""
    },

    "graph_random_walk_visits" -> {
      def step(t: Int) =
        s"""w$t AS (SELECT w.seed, adj.x AS node
           |        FROM w${t - 1} w
           |        JOIN deg d ON d.c = w.node
           |        JOIN adj ON adj.c = w.node
           |         AND adj.idx = (w.seed * 1000003 + ${t * 7919 + 12345}
           |                        + w.node * 31) % 2147483647 % d.d)"""
          .stripMargin
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                      FROM lineitem),
               e AS (SELECT DISTINCT a.p AS u, b.p AS v
                     FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
               sym AS (SELECT u AS c, v AS x FROM e
                       UNION ALL SELECT v, u FROM e),
               deg AS (SELECT c, CAST(count(*) AS BIGINT) AS d
                       FROM sym GROUP BY 1),
               adj AS (SELECT c, x,
                              row_number() OVER (PARTITION BY c
                                                 ORDER BY x) - 1 AS idx
                       FROM sym),
               seeds AS (SELECT c FROM deg ORDER BY d DESC, c LIMIT 64),
               w0 AS (SELECT c AS seed, c AS node FROM seeds),
               ${step(1)},
               ${step(2)},
               ${step(3)},
               ${step(4)},
               ${step(5)},
               ${step(6)},
               visits AS (SELECT node FROM w1 UNION ALL SELECT node FROM w2
                          UNION ALL SELECT node FROM w3
                          UNION ALL SELECT node FROM w4
                          UNION ALL SELECT node FROM w5
                          UNION ALL SELECT node FROM w6)
          SELECT node, CAST(count(*) AS BIGINT) AS visits
          FROM visits GROUP BY 1 ORDER BY visits DESC, node LIMIT 20"""
    },

    "olap_dau_mau_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                     FROM events),
              dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
                      FROM ud GROUP BY 1),
              lagd AS (SELECT user_id, d,
                              lag(d) OVER (PARTITION BY user_id
                                           ORDER BY d) AS prev
                       FROM ud),
              seg AS (SELECT CASE WHEN prev IS NULL THEN d
                                  ELSE greatest(d, prev + 30) END AS e_start,
                             d + 30 AS e_next
                      FROM lagd),
              delta AS (SELECT e_start AS e, 1 AS v FROM seg
                        UNION ALL SELECT e_next, -1 FROM seg),
              dd AS (SELECT e, CAST(sum(v) AS BIGINT) AS dv
                     FROM delta GROUP BY 1),
              bounds AS (SELECT min(CAST(ts AS DATE)) AS mn,
                                max(CAST(ts AS DATE)) AS mx FROM events),
              days AS (SELECT CAST(unnest(generate_series(mn, mx,
                                INTERVAL 1 DAY)) AS DATE) AS day
                       FROM bounds),
              cum AS (SELECT days.day, coalesce(dd.dv, 0) AS dv
                      FROM days LEFT JOIN dd ON dd.e = days.day),
              mau AS (SELECT day, CAST(sum(dv) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS mau
                      FROM cum)
         SELECT m.day, coalesce(da.dau, 0) AS dau, m.mau,
                CASE WHEN m.mau > 0 THEN CAST(coalesce(da.dau, 0) AS DOUBLE)
                       / CAST(m.mau AS DOUBLE) END AS stickiness
         FROM mau m LEFT JOIN dau da ON da.d = m.day
         ORDER BY m.day""",

    "olap_attribution_lasttouch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
                           epoch_us(ts) AS us FROM events),
              w AS (SELECT event_type, us,
                           last_value(CASE WHEN event_type <> 'purchase'
                                      THEN event_type END IGNORE NULLS)
                             OVER pre AS channel,
                           last_value(CASE WHEN event_type <> 'purchase'
                                      THEN us END IGNORE NULLS)
                             OVER pre AS ch_us
                    FROM e
                    WINDOW pre AS (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING)),
              p AS (SELECT coalesce(channel, 'none') AS channel,
                           CASE WHEN channel IS NOT NULL
                                THEN (us - ch_us) // 1000000 END AS lag_s
                    FROM w WHERE event_type = 'purchase')
         SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
                CAST(coalesce(sum(lag_s), 0) AS BIGINT) AS lag_seconds_sum,
                CASE WHEN channel <> 'none'
                     THEN CAST(sum(lag_s) AS DOUBLE)
                            / CAST(count(*) AS DOUBLE)
                END AS avg_lag_seconds
         FROM p GROUP BY 1 ORDER BY 1""",

    // component labels via recursive min-label closure: the label SET is
    // method-independent, so sizes match Spark's pointer jumping exactly
    "graph_lcc_share" ->
      """WITH RECURSIVE
              li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
              e AS (SELECT DISTINCT a.p AS u, b.p AS v
                    FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
              sym AS (SELECT u AS a, v AS b FROM e
                      UNION ALL SELECT v, u FROM e),
              reach(node, label) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM sym)
                UNION
                SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
                WHERE r.label < s.b),
              lab AS (SELECT node, min(label) AS label
                      FROM reach GROUP BY 1),
              comp AS (SELECT label, CAST(count(*) AS BIGINT) AS sz
                       FROM lab GROUP BY 1)
         SELECT CAST(sum(sz) AS BIGINT) AS n_nodes,
                CAST(count(*) AS BIGINT) AS n_components,
                CAST(max(sz) AS BIGINT) AS lcc_size,
                CAST(max(sz) AS DOUBLE) / CAST(sum(sz) AS DOUBLE)
                  AS lcc_share
         FROM comp""",

    "agg_jackknife_variance" ->
      """WITH r AS (SELECT event_type, CAST(ts AS DATE) AS d,
                           CAST(round(value * 100, 0) AS BIGINT) AS cc
                    FROM events),
              g AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS ni,
                           CAST(sum(cc) AS BIGINT) AS si
                    FROM r GROUP BY 1, 2),
              t AS (SELECT event_type, CAST(sum(ni) AS BIGINT) AS n,
                           CAST(sum(si) AS BIGINT) AS s
                    FROM g GROUP BY 1),
              th AS (SELECT g.event_type,
                            (1024 * (t.s - g.si)) // (t.n - g.ni) AS theta
                     FROM g JOIN t ON t.event_type = g.event_type),
              a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                           CAST(sum(theta) AS BIGINT) AS st,
                           CAST(sum(CAST(theta AS DECIMAL(38,0)) * theta)
                                AS DECIMAL(38,0)) AS stt
                    FROM th GROUP BY 1),
              core AS (SELECT event_type, n_days, st,
                              CAST(n_days * stt
                                   - CAST(st AS DECIMAL(38,0)) * st
                                   AS BIGINT) AS core
                       FROM a)
         SELECT c.event_type, c.n_days,
                (1024 * t.s) // t.n AS mean_q10,
                ((c.n_days - 1) * c.core)
                  // (c.n_days * c.n_days) AS jk_var_num_q20,
                sqrt(CAST(((c.n_days - 1) * c.core)
                     // (c.n_days * c.n_days) AS DOUBLE))
                  / CAST(1024 AS DOUBLE) AS jk_se
         FROM core c JOIN t ON t.event_type = c.event_type
         ORDER BY c.event_type""",

    "agg_capture_recapture" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS mn,
                           max(CAST(ts AS DATE)) AS mx FROM events),
              u AS (SELECT event_type, user_id,
                           max(CASE WHEN CAST(ts AS DATE) =
                               (SELECT mn FROM b) THEN 1 ELSE 0 END) AS c1,
                           max(CASE WHEN CAST(ts AS DATE) =
                               (SELECT mx FROM b) THEN 1 ELSE 0 END) AS c2
                    FROM events GROUP BY 1, 2),
              a AS (SELECT event_type,
                           CAST(sum(c1) AS BIGINT) AS n1,
                           CAST(sum(c2) AS BIGINT) AS n2,
                           CAST(sum(c1 * c2) AS BIGINT) AS m12,
                           CAST(sum(CASE WHEN c1 = 1 OR c2 = 1
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
                           CAST(count(*) AS BIGINT) AS n_true
                    FROM u GROUP BY 1)
         SELECT event_type, n1, n2, m12, n_seen, n_true,
                CASE WHEN m12 > 0 THEN (n1 * n2) // m12 END AS n_hat,
                CASE WHEN m12 > 0 THEN
                  CAST((n1 * n2) // m12 - n_true AS DOUBLE)
                    / CAST(n_true AS DOUBLE) END AS rel_bias
         FROM a ORDER BY event_type""",

    "mm_audio_flatness" -> {
      val le = graft.functions.FixedLog2.sql("e")
      val lm = graft.functions.FixedLog2.sql("(a.se // a.n_windows)")
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                      WHERE doc_id < 200 AND octet_length(encode(text)) > 0),
             b AS (SELECT media_id, nb, ${duckHexBytes("h")} AS bytes
                   FROM hx),
             w AS (SELECT media_id, nb, bytes,
                          CAST(unnest(generate_series(0,
                            CAST((nb - 1) // 32 AS INT))) AS INT)
                            AS window_idx
                   FROM b),
             c AS (SELECT media_id, window_idx, bytes,
                          least(64, nb - window_idx * 32) AS ns
                   FROM w),
             en AS (SELECT media_id,
                           CAST(list_sum(list_transform(
                             generate_series(window_idx * 32 + 1,
                                             window_idx * 32 + ns),
                             j -> (bytes[j] - 128) * (bytes[j] - 128)))
                             AS BIGINT) AS e
                    FROM c),
             nz AS (SELECT media_id, e, $le AS le FROM en WHERE e > 0),
             ag AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_windows,
                           CAST(sum(le) AS BIGINT) AS sle,
                           CAST(sum(e) AS BIGINT) AS se
                    FROM nz GROUP BY 1),
             z AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_zero
                   FROM en WHERE e = 0 GROUP BY 1)
         SELECT a.media_id, a.n_windows,
                coalesce(z.n_zero, 0) AS n_zero_windows,
                CAST(a.sle // a.n_windows - $lm AS BIGINT)
                  AS flatness_log2_q20,
                CAST(a.sle // a.n_windows - $lm AS DOUBLE)
                  / CAST(1048576 AS DOUBLE) AS flatness_log2
         FROM ag a LEFT JOIN z ON z.media_id = a.media_id
         ORDER BY a.media_id"""
    },

    "ts_cointegration_screen" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS dt,
                           CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y,
                           CAST(sum(CASE WHEN event_type = 'view'
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x
                    FROM events GROUP BY 1),
              m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x) AS BIGINT) AS sx,
                           CAST(sum(y) AS BIGINT) AS sy,
                           CAST(sum(CAST(x AS DECIMAL(38,0)) * x)
                                AS DECIMAL(38,0)) AS sxx,
                           CAST(sum(CAST(x AS DECIMAL(38,0)) * y)
                                AS DECIMAL(38,0)) AS sxy
                    FROM d),
              bet AS (SELECT n, sx, sy,
                             CAST(n AS DECIMAL(38,0)) * sxy
                               - CAST(sx AS DECIMAL(38,0)) * sy AS bnum,
                             CAST(n AS DECIMAL(38,0)) * sxx
                               - CAST(sx AS DECIMAL(38,0)) * sx AS bden
                      FROM m),
              -- the residual division must TRUNCATE like Spark's DIV:
              -- DECIMAL // rounds in DuckDB, HUGEINT // truncates, so the
              -- exact decimal dividend/divisor route through HUGEINT
              res AS (SELECT d.dt,
                             CAST(CAST(CAST(bet.n AS DECIMAL(38,0))
                                     * bet.bden * d.y
                               - bet.bden * bet.sy
                               - bet.bnum * (CAST(bet.n AS DECIMAL(38,0))
                                               * d.x - bet.sx) AS HUGEINT)
                               // CAST(CAST(bet.bden AS DECIMAL(38,0))
                                       * bet.n AS HUGEINT)
                               AS BIGINT) AS r
                      FROM d, bet),
              lagr AS (SELECT dt, r, lag(r) OVER (ORDER BY dt) AS pr
                       FROM res),
              ac AS (SELECT CAST(count(*) AS BIGINT) AS np,
                            CAST(sum(r) AS BIGINT) AS sr,
                            CAST(sum(pr) AS BIGINT) AS sp,
                            CAST(sum(CAST(r AS DECIMAL(38,0)) * pr)
                                 AS BIGINT) AS srp,
                            CAST(sum(CAST(r AS DECIMAL(38,0)) * r)
                                 AS BIGINT) AS srr,
                            CAST(sum(CAST(pr AS DECIMAL(38,0)) * pr)
                                 AS BIGINT) AS spp
                     FROM lagr WHERE pr IS NOT NULL),
              rho AS (SELECT np,
                             np * srp - sr * sp AS rnum,
                             np * srr - sr * sr AS ra,
                             np * spp - sp * sp AS rb
                      FROM ac)
         SELECT b.n AS n_days,
                CAST(CAST(65536 * b.bnum AS HUGEINT)
                     // CAST(b.bden AS HUGEINT) AS BIGINT) AS beta_q16,
                r2.np AS n_pairs, r2.rnum AS rho_num, r2.ra AS rho_den_a,
                r2.rb AS rho_den_b,
                CAST(r2.rnum AS DOUBLE)
                  / sqrt(CAST(r2.ra AS DOUBLE) * CAST(r2.rb AS DOUBLE))
                  AS resid_autocorr,
                CASE WHEN r2.rnum < 0 OR
                          CAST(4 AS DECIMAL(38,0)) * r2.rnum * r2.rnum
                            < CAST(r2.ra AS DECIMAL(38,0)) * r2.rb
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                END AS cointegrated_flag
         FROM bet b, rho r2""",

    "sample_contrastive_pairs" ->
      """WITH f AS (SELECT doc_id, source,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(doc_id AS VARCHAR),
                                                    ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM documents),
              hsh AS (SELECT doc_id, source,
                             ((((h0 * 1103515245 + 12345) % 2147483647)
                               * ((h0 * 1103515245 + 12345) % 2147483647))
                              % 2147483647
                              * 69069 + 362437) % 2147483647 AS hv
                      FROM f),
              w AS (SELECT doc_id, source, hv, hv % 8 AS bucket FROM hsh),
              nxt AS (SELECT doc_id, source, bucket,
                             lead(doc_id, 1) OVER win AS d1,
                             lead(source, 1) OVER win AS s1,
                             lead(doc_id, 2) OVER win AS d2,
                             lead(source, 2) OVER win AS s2,
                             lead(doc_id, 3) OVER win AS d3,
                             lead(source, 3) OVER win AS s3,
                             lead(doc_id, 4) OVER win AS d4,
                             lead(source, 4) OVER win AS s4,
                             lead(doc_id, 5) OVER win AS d5,
                             lead(source, 5) OVER win AS s5,
                             lead(doc_id, 6) OVER win AS d6,
                             lead(source, 6) OVER win AS s6
                      FROM w WINDOW win AS (PARTITION BY bucket
                                            ORDER BY hv, doc_id)),
              cand AS (SELECT doc_id, source,
                              list_filter([
                                {'d': d1, 's': s1}, {'d': d2, 's': s2},
                                {'d': d3, 's': s3}, {'d': d4, 's': s4},
                                {'d': d5, 's': s5}, {'d': d6, 's': s6}],
                                c -> c.d IS NOT NULL AND c.s <> source)
                                AS negs
                       FROM nxt),
              pick AS (SELECT doc_id, source,
                              CASE WHEN len(negs) >= 1 THEN negs[1].d END
                                AS neg1,
                              CASE WHEN len(negs) >= 2 THEN negs[2].d END
                                AS neg2
                       FROM cand)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN neg1 IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_with_neg1,
                CAST(sum(CASE WHEN neg2 IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_with_neg2,
                CAST(sum(coalesce(neg1, 0) + coalesce(neg2, 0)) AS BIGINT)
                  AS neg_id_checksum
         FROM pick GROUP BY 1 ORDER BY 1""",

    "agg_hill_tail_index" -> {
      val lx = graft.functions.FixedLog2.sql("r.x")
      val lxk = graft.functions.FixedLog2.sql("xk")
      s"""WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       AS x
                     FROM orders),
               r AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn
                     FROM c),
               k AS (SELECT x AS xk FROM r WHERE rn = 201),
               top AS (SELECT r.x, $lx AS lx FROM r WHERE rn <= 200),
               s AS (SELECT CAST(count(*) AS BIGINT) AS k,
                            CAST(sum(lx) AS BIGINT)
                              - 200 * (SELECT $lxk FROM k) AS s_q20
                     FROM top)
          SELECT k, s_q20,
                 CAST(k AS DOUBLE) * 1048576.0
                   / (CAST(s_q20 AS DOUBLE) * 0.6931471805599453)
                   AS hill_alpha
          FROM s"""
    },

    "text_mattr_diversity" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                    FROM documents),
              e AS (SELECT doc_id, source,
                           CAST(coalesce(list_sum(list_transform(
                             generate_series(0, len(toks) - 50),
                             i -> len(list_distinct(
                               list_slice(toks, i + 1, i + 50))))), 0)
                             AS BIGINT) AS dsum,
                           CAST(greatest(len(toks) - 49, 0) AS BIGINT)
                             AS n_windows
                    FROM t)
         SELECT source,
                CAST(sum(n_windows) AS BIGINT) AS n_windows,
                CAST(sum(dsum) AS BIGINT) AS distinct_sum,
                CAST(sum(dsum) AS DOUBLE)
                  / CAST(sum(n_windows) AS DOUBLE) / CAST(50 AS DOUBLE)
                  AS mattr
         FROM e WHERE n_windows > 0 GROUP BY 1 ORDER BY 1""",

    // busdays via the calendar-cumulative join (cum[sd] - cum[od] over
    // the [start, end) convention), the day-enumeration-free replay of
    // the codegen busday expression
    "cal_order_ship_busdays" ->
      """WITH j AS (SELECT CAST(o.o_orderdate AS DATE) AS od,
                           CAST(l.l_shipdate AS DATE) AS sd,
                           CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                             AS cents
                    FROM lineitem l
                    JOIN orders o ON o.o_orderkey = l.l_orderkey),
              bounds AS (SELECT min(od) AS mn, max(sd) AS mx FROM j),
              cal AS (SELECT CAST(unnest(generate_series(mn, mx,
                               INTERVAL 1 DAY)) AS DATE) AS day
                      FROM bounds),
              cb AS (SELECT day,
                            CAST(coalesce(sum(CASE WHEN isodow(day) <= 5
                              AND NOT (
                                (month(day) = 1  AND day(day) = 1) OR
                                (month(day) = 7  AND day(day) = 4) OR
                                (month(day) = 12 AND day(day) = 25))
                              THEN 1 ELSE 0 END)
                              OVER (ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS cum
                     FROM cal),
              lag_ AS (SELECT c2.cum - c1.cum AS busdays, j.cents,
                              j.sd, j.od
                       FROM j JOIN cb c1 ON c1.day = j.od
                              JOIN cb c2 ON c2.day = j.sd),
              allb AS (SELECT CASE WHEN sd <= od THEN -1
                                   ELSE CAST(length(bin(busdays)) - 1
                                             AS BIGINT)
                              END AS lag_bucket, cents
                       FROM lag_)
         SELECT lag_bucket, CAST(count(*) AS BIGINT) AS n_lineitems,
                CAST(sum(cents) AS BIGINT) AS revenue_cents
         FROM allb GROUP BY 1 ORDER BY 1""",

    "sim_recall_at_k_curve" -> {
      def dot(a: String, b: String) =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list_transform(generate_series(1, len($a)), i ->
           |    CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
           |  (x, y) -> x + y)""".stripMargin
      def cs(a: String, b: String) =
        s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS eq
                     FROM embeddings WHERE vec_id < 10),
              gt AS (SELECT query_id, vec_id, rank AS gr FROM (
                       SELECT query_id, vec_id,
                         row_number() OVER (PARTITION BY query_id ORDER BY
                           ${cs("eq", "embedding")} DESC, vec_id ASC)
                           AS rank
                       FROM q JOIN embeddings ON vec_id <> query_id)
                     WHERE rank <= 10),
              c AS (SELECT vec_id AS centroid_id, embedding AS ec
                    FROM embeddings WHERE vec_id < 8),
              asg AS (SELECT centroid_id, vec_id, embedding FROM (
                        SELECT e.vec_id, c.centroid_id, e.embedding,
                          row_number() OVER (PARTITION BY e.vec_id ORDER BY
                            ${cs("e.embedding", "c.ec")} DESC,
                            c.centroid_id ASC) AS rn
                        FROM embeddings e CROSS JOIN c)
                      WHERE rn = 1),
              prb AS (SELECT query_id, centroid_id, emb_q FROM (
                        SELECT q2.vec_id AS query_id, c.centroid_id,
                               q2.embedding AS emb_q,
                          row_number() OVER (PARTITION BY q2.vec_id
                            ORDER BY ${cs("q2.embedding", "c.ec")} DESC,
                            c.centroid_id ASC) AS rn
                        FROM embeddings q2 CROSS JOIN c
                        WHERE q2.vec_id < 10)
                      WHERE rn <= 2),
              sc AS (SELECT p.query_id, a.vec_id,
                            ${cs("p.emb_q", "a.embedding")} AS cosine
                     FROM prb p JOIN asg a USING (centroid_id)
                     WHERE a.vec_id <> p.query_id),
              ivf AS (SELECT query_id, vec_id, rank AS ir FROM (
                        SELECT query_id, vec_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
                        FROM sc)
                      WHERE rank <= 10),
              j AS (SELECT gt.gr, ivf.ir FROM gt
                    JOIN ivf ON ivf.query_id = gt.query_id
                            AND ivf.vec_id = gt.vec_id),
              ks AS (SELECT CAST(unnest([1, 3, 5, 10]) AS BIGINT) AS k)
          SELECT ks.k,
                 CAST(coalesce(sum(CASE WHEN j.gr <= ks.k
                                         AND j.ir <= ks.k
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_hits,
                 CAST(ks.k * 10 AS BIGINT) AS n_possible,
                 CAST(coalesce(sum(CASE WHEN j.gr <= ks.k
                                         AND j.ir <= ks.k
                                    THEN 1 ELSE 0 END), 0) AS DOUBLE)
                   / CAST(ks.k * 10 AS DOUBLE) AS recall_at_k
          FROM ks LEFT JOIN j ON TRUE
          GROUP BY ks.k ORDER BY ks.k"""
    },

    "olap_cumulative_distinct" ->
      """WITH fd AS (SELECT event_type, user_id,
                            min(CAST(ts AS DATE)) AS dt
                     FROM events GROUP BY 1, 2),
              nw AS (SELECT event_type, dt, count(*) AS new_users
                     FROM fd GROUP BY 1, 2)
         SELECT event_type, dt, CAST(new_users AS BIGINT) AS new_users,
                CAST(sum(new_users) OVER (PARTITION BY event_type
                  ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND
                  CURRENT ROW) AS BIGINT) AS cum_users
         FROM nw ORDER BY event_type, dt""",

    "graph_rich_club" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              deg AS (SELECT u AS n, count(*) AS d FROM e GROUP BY 1),
              em AS (SELECT least(du.d, dv.d) AS m
                     FROM e JOIN deg du ON du.n = e.u
                            JOIN deg dv ON dv.n = e.v),
              ec AS (SELECT
                       CAST(sum(CASE WHEN m > 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS e0,
                       CAST(sum(CASE WHEN m > 4 THEN 1 ELSE 0 END)
                            AS BIGINT) AS e1,
                       CAST(sum(CASE WHEN m > 8 THEN 1 ELSE 0 END)
                            AS BIGINT) AS e2,
                       CAST(sum(CASE WHEN m > 16 THEN 1 ELSE 0 END)
                            AS BIGINT) AS e3
                     FROM em),
              nc AS (SELECT
                       CAST(sum(CASE WHEN d > 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n0,
                       CAST(sum(CASE WHEN d > 4 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN d > 8 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n2,
                       CAST(sum(CASE WHEN d > 16 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n3
                     FROM deg),
              r AS (SELECT CAST(2 AS BIGINT) AS k, n0 AS n_rich,
                           e0 AS e_rich FROM ec CROSS JOIN nc
                    UNION ALL
                    SELECT 4, n1, e1 FROM ec CROSS JOIN nc
                    UNION ALL
                    SELECT 8, n2, e2 FROM ec CROSS JOIN nc
                    UNION ALL
                    SELECT 16, n3, e3 FROM ec CROSS JOIN nc)
         SELECT k, n_rich, e_rich,
                CASE WHEN n_rich > 1 THEN
                  CAST(e_rich AS DOUBLE)
                    / CAST(CAST(CAST(n_rich AS HUGEINT) * (n_rich - 1) AS BIGINT) AS DOUBLE)
                END AS phi
         FROM r ORDER BY k""",

    "text_burstiness" ->
      """WITH pd AS (SELECT lang, doc_id, token, count(*) AS c FROM (
                SELECT lang, doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS token
                FROM documents) GROUP BY 1, 2, 3),
              nd AS (SELECT lang, count(*) AS nd FROM documents
                     GROUP BY 1),
              tok AS (SELECT lang, token, CAST(sum(c) AS BIGINT) AS tf,
                             count(*) AS n_docs_with,
                             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
                               AS sxx
                      FROM pd GROUP BY 1, 2),
              top AS (SELECT *, row_number() OVER (PARTITION BY lang
                        ORDER BY tf DESC, token) AS rnk
                      FROM tok)
         SELECT t.lang, t.token, t.tf, t.n_docs_with,
                CASE WHEN nd.nd > 1 THEN
                  CAST(CAST(CAST(nd.nd AS HUGEINT) * t.sxx
                       - CAST(t.tf AS HUGEINT) * t.tf AS BIGINT) AS DOUBLE)
                    / CAST(CAST((CAST(nd.nd AS HUGEINT) - 1) * t.tf AS BIGINT) AS DOUBLE)
                END AS vmr
         FROM top t JOIN nd ON nd.lang = t.lang
         WHERE t.rnk <= 20
         ORDER BY t.lang, t.tf DESC, t.token""",

    "graph_degree_gini" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
              hist AS (SELECT d, count(*) AS m FROM deg GROUP BY 1),
              cum AS (SELECT d, m,
                             CAST(coalesce(sum(m) OVER (ORDER BY d
                               ROWS BETWEEN UNBOUNDED PRECEDING AND
                               1 PRECEDING), 0) AS BIGINT) AS cumm
                      FROM hist),
              agg AS (SELECT CAST(sum(m) AS BIGINT) AS n_nodes,
                             CAST(sum(CAST(d AS HUGEINT) * m) AS HUGEINT)
                               AS sum_deg,
                             CAST(sum(CAST(d AS HUGEINT)
                               * (CAST(m AS HUGEINT) * cumm * 2
                                  + CAST(m AS HUGEINT) * (m + 1)))
                               AS HUGEINT) AS tw
                      FROM cum)
         SELECT n_nodes, CAST(sum_deg AS BIGINT) AS sum_degree,
                CAST(CAST(tw - CAST(n_nodes + 1 AS HUGEINT) * sum_deg AS BIGINT) AS DOUBLE)
                  / CAST(CAST(CAST(n_nodes AS HUGEINT) * sum_deg AS BIGINT) AS DOUBLE)
                  AS gini
         FROM agg""",

    "agg_entropy_by_group" -> {
      val lc = graft.functions.FixedLog2.sql("c")
      val ln = graft.functions.FixedLog2.sql("n_events")
      s"""WITH c AS (SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
                            event_type, count(*) AS c
                     FROM events GROUP BY 1, 2),
               g AS (SELECT dow, CAST(sum(c) AS BIGINT) AS n_events,
                            count(*) AS n_types,
                            CAST(sum(CAST(c AS HUGEINT) * $lc) AS HUGEINT)
                              AS sclog
                     FROM c GROUP BY 1)
          SELECT dow, n_events, n_types,
                 CAST(CAST(CAST(n_events AS HUGEINT) * $ln - sclog AS BIGINT) AS DOUBLE)
                   / CAST(n_events AS DOUBLE) / 1048576.0 AS entropy_bits
          FROM g ORDER BY dow"""
    },

    "agg_theil_index" -> {
      val lcn = graft.functions.FixedLog2.sql("cn")
      val ls = graft.functions.FixedLog2.sql("s_cents")
      s"""WITH j AS (SELECT c.c_mktsegment,
                            CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                              AS cents
                     FROM orders o JOIN customer c
                       ON o.o_custkey = c.c_custkey),
               g AS (SELECT c_mktsegment, count(*) AS n,
                            CAST(sum(cents) AS BIGINT) AS s_cents
                     FROM j GROUP BY 1),
               t AS (SELECT j.c_mktsegment, j.cents, g.n, g.s_cents,
                            j.cents * g.n AS cn
                     FROM j JOIN g ON j.c_mktsegment = g.c_mktsegment),
               u AS (SELECT c_mktsegment,
                            CAST(cents AS HUGEINT) * ($lcn - $ls) AS term,
                            n, s_cents
                     FROM t)
          SELECT c_mktsegment, any_value(n) AS n_orders,
                 CAST(any_value(s_cents) AS DOUBLE) / 100.0
                   AS total_revenue,
                 CAST(sum(term) AS DOUBLE) * 0.6931471805599453
                   / (CAST(any_value(s_cents) AS DOUBLE) * 1048576.0)
                   AS theil
          FROM u GROUP BY 1 ORDER BY 1"""
    },

    "text_collocation_pmi" -> {
      val lnum = graft.functions.FixedLog2.sql("num")
      val lden = graft.functions.FixedLog2.sql("den")
      s"""WITH toks AS (SELECT regexp_extract_all(translate(text,
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS t
                        FROM documents),
               bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
                      FROM (SELECT t, unnest(generate_series(1, len(t) - 1))
                              AS i
                            FROM toks)),
               bc AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2
                      HAVING count(*) >= 5),
               uni AS (SELECT unnest(t) AS w FROM toks),
               uc AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
               tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uc),
               p AS (SELECT bc.w1, bc.w2, bc.c_ab,
                            bc.c_ab * tot.n_tok AS num,
                            a.c * b.c AS den
                     FROM bc JOIN uc a ON a.w = bc.w1
                             JOIN uc b ON b.w = bc.w2
                             CROSS JOIN tot)
          SELECT w1, w2, c_ab,
                 CAST($lnum - $lden AS DOUBLE) / 1048576.0 AS pmi_bits
          FROM p ORDER BY pmi_bits DESC, w1, w2 LIMIT 20"""
    },

    "sample_importance_reweight" ->
      """WITH b AS (SELECT lang, count(*) AS n_docs FROM documents
                    GROUP BY 1),
              t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
                           count(*) AS n_langs
                    FROM b)
         SELECT lang, n_docs,
                n_total * 1000000 // (n_langs * n_docs) AS w_ppm,
                1000000 // n_langs AS target_share_ppm,
                n_docs * 1000000 // n_total AS actual_share_ppm
         FROM b CROSS JOIN t ORDER BY lang""",

    // recursive CTE rather than a list_reduce struct fold: the (l, b)
    // state is mutually cross-dependent, which DuckDB 1.0's in-place
    // field-by-field lambda accumulator update cannot express safely
    // (see FixedLog2.sql). The row-at-a-time recursion replays the exact
    // IEEE sequence of the Spark aggregate fold.
    "ts_holt_linear" ->
      """WITH RECURSIVE bars AS (
                SELECT event_type, CAST(ts AS DATE) AS date,
                       arg_max(value, ts) AS close,
                       row_number() OVER (PARTITION BY event_type
                         ORDER BY CAST(ts AS DATE)) AS rn
                FROM events GROUP BY 1, 2),
              rec AS (
                SELECT event_type, date, close, rn,
                       CAST(close AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
                FROM bars WHERE rn = 1
                UNION ALL
                SELECT n.event_type, n.date, n.close, n.rn,
                       0.25 * n.close + 0.75 * (r.l + r.b) AS l,
                       0.125 * ((0.25 * n.close + 0.75 * (r.l + r.b)) - r.l)
                         + 0.875 * r.b AS b
                FROM rec r JOIN bars n
                  ON n.event_type = r.event_type AND n.rn = r.rn + 1)
         SELECT event_type, date, close, l AS level, b AS trend
         FROM rec ORDER BY event_type, date""",

    "graph_harmonic_sample" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
              e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                    FROM pairs
                    UNION ALL
                    SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
              srcs AS (SELECT src AS s FROM (SELECT DISTINCT src FROM e
                         WHERE src % 2 = 0 ORDER BY src LIMIT 4)),
              d1 AS (SELECT DISTINCT srcs.s, e.dst AS node
                     FROM e JOIN srcs ON e.src = srcs.s
                     WHERE e.dst <> srcs.s),
              d2 AS (SELECT DISTINCT d1.s, e.dst AS node
                     FROM e JOIN d1 ON e.src = d1.node
                     WHERE e.dst <> d1.s
                       AND NOT EXISTS (SELECT 1 FROM d1 y
                                       WHERE y.s = d1.s AND y.node = e.dst)),
              c1 AS (SELECT s, count(*) AS n1 FROM d1 GROUP BY 1),
              c2 AS (SELECT s, count(*) AS n2 FROM d2 GROUP BY 1)
         SELECT srcs.s AS source,
                CAST(coalesce(c1.n1, 0) AS BIGINT) AS n1,
                CAST(coalesce(c2.n2, 0) AS BIGINT) AS n2,
                CAST(coalesce(c1.n1, 0) * 2 + coalesce(c2.n2, 0) AS BIGINT)
                  AS h2,
                CAST(coalesce(c1.n1, 0) * 2 + coalesce(c2.n2, 0) AS DOUBLE)
                  / 2.0 AS harmonic
         FROM srcs LEFT JOIN c1 ON c1.s = srcs.s
                   LEFT JOIN c2 ON c2.s = srcs.s
         ORDER BY source""",

    "emb_silhouette_simplified" ->
      """WITH dims AS (SELECT CAST(label AS BIGINT) AS label, i,
                        CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536)
                          AS BIGINT) AS q
                      FROM (SELECT label, embedding,
                              unnest(generate_series(1, 64)) AS i
                            FROM embeddings)),
              cent AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS sq,
                              count(*) AS n
                       FROM dims GROUP BY 1, 2),
              ca AS (SELECT label AS clabel,
                            list_transform(list_sort(list(
                              {'i': i, 'm': CAST(sq AS DOUBLE)
                                / CAST(n * 65536 AS DOUBLE)})),
                              x -> x.m) AS c
                     FROM cent GROUP BY 1),
              v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      list_transform(embedding, x ->
                        CAST(floor(CAST(x AS DOUBLE) * 65536) AS BIGINT))
                        AS qa
                    FROM embeddings),
              p AS (SELECT v.vec_id, v.label, ca.clabel,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, 64), i ->
                          (CAST(qa[i] AS DOUBLE) / 65536.0 - c[i])
                          * (CAST(qa[i] AS DOUBLE) / 65536.0 - c[i]))),
                        (a, x) -> a + x) AS dist2
                    FROM v CROSS JOIN ca),
              s AS (SELECT vec_id, label,
                      sqrt(min(CASE WHEN clabel = label THEN dist2 END))
                        AS a,
                      sqrt(min(CASE WHEN clabel <> label THEN dist2 END))
                        AS b
                    FROM p GROUP BY 1, 2),
              u AS (SELECT label,
                      CASE WHEN greatest(a, b) > 0 THEN
                        CAST(floor((b - a) / greatest(a, b) * 1048576)
                          AS BIGINT)
                      ELSE 0 END AS sq20,
                      CAST(floor(a * 1048576) AS BIGINT) AS aq20
                    FROM s)
         SELECT label, count(*) AS n_vecs,
                CAST(sum(sq20) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  / 1048576.0 AS avg_silhouette,
                CAST(sum(aq20) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  / 1048576.0 AS avg_intra_dist
         FROM u GROUP BY 1 ORDER BY 1""",

    "agg_mutual_information" -> {
      val lxy = graft.functions.FixedLog2.sql("cn")
      val lmm = graft.functions.FixedLog2.sql("cxy")
      val lcx = graft.functions.FixedLog2.sql("c_x")
      val lcy = graft.functions.FixedLog2.sql("c_y")
      val ln = graft.functions.FixedLog2.sql("n")
      s"""WITH cells AS (SELECT event_type,
                                CAST(isodow(CAST(ts AS DATE)) AS BIGINT)
                                  AS dow,
                                count(*) AS c_xy
                         FROM events GROUP BY 1, 2),
               mx AS (SELECT event_type, CAST(sum(c_xy) AS BIGINT) AS c_x
                      FROM cells GROUP BY 1),
               my AS (SELECT dow, CAST(sum(c_xy) AS BIGINT) AS c_y
                      FROM cells GROUP BY 1),
               nn AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells),
               terms AS (SELECT cells.c_xy,
                                cells.c_xy * nn.n AS cn,
                                mx.c_x * my.c_y AS cxy
                         FROM cells JOIN mx ON mx.event_type = cells.event_type
                                    JOIN my ON my.dow = cells.dow
                                    CROSS JOIN nn),
               mi AS (SELECT CAST(sum(CAST(c_xy AS HUGEINT)
                          * ($lxy - $lmm)) AS HUGEINT) AS minum
                      FROM terms),
               hx AS (SELECT CAST(sum(CAST(c_x AS HUGEINT) * $lcx)
                          AS HUGEINT) AS sxlog FROM mx),
               hy AS (SELECT CAST(sum(CAST(c_y AS HUGEINT) * $lcy)
                          AS HUGEINT) AS sylog FROM my)
          SELECT n,
                 CAST(minum AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0
                   AS mi_bits,
                 CAST(CAST(CAST(n AS HUGEINT) * $ln - sxlog AS BIGINT) AS DOUBLE)
                   / CAST(n AS DOUBLE) / 1048576.0 AS h_type_bits,
                 CAST(CAST(CAST(n AS HUGEINT) * $ln - sylog AS BIGINT) AS DOUBLE)
                   / CAST(n AS DOUBLE) / 1048576.0 AS h_dow_bits
          FROM nn CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy"""
    },

    "text_kl_source_shift" -> {
      val lnum = graft.functions.FixedLog2.sql("cst")
      val lden = graft.functions.FixedLog2.sql("tcw")
      s"""WITH st AS (SELECT source, w, count(*) AS c_sw FROM (
                        SELECT source, unnest(regexp_extract_all(
                          translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS w
                        FROM documents) GROUP BY 1, 2),
               cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
                      FROM st GROUP BY 1),
               tsrc AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS t_s
                        FROM st GROUP BY 1),
               tot AS (SELECT CAST(sum(t_s) AS BIGINT) AS t FROM tsrc),
               terms AS (SELECT st.source, st.c_sw, tsrc.t_s,
                                st.c_sw * tot.t AS cst,
                                tsrc.t_s * cw.c_w AS tcw
                         FROM st JOIN cw ON cw.w = st.w
                                 JOIN tsrc ON tsrc.source = st.source
                                 CROSS JOIN tot)
          SELECT source, any_value(t_s) AS n_tokens,
                 CAST(CAST(sum(CAST(c_sw AS HUGEINT) * ($lnum - $lden)) AS BIGINT) AS DOUBLE)
                   / CAST(any_value(t_s) AS DOUBLE) / 1048576.0 AS kl_bits
          FROM terms GROUP BY 1 ORDER BY 1"""
    },

    "mine_transition_entropy" -> {
      val li = graft.functions.FixedLog2.sql("row_n")
      val lj = graft.functions.FixedLog2.sql("n")
      s"""WITH s AS (SELECT event_type AS e_from,
                            lead(event_type, 1) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS e_to
                     FROM events),
               p AS (SELECT e_from, e_to, count(*) AS n FROM s
                     WHERE e_to IS NOT NULL GROUP BY 1, 2),
               t AS (SELECT e_from, CAST(sum(n) AS BIGINT) AS row_n
                     FROM p GROUP BY 1),
               terms AS (SELECT p.e_from, p.n, t.row_n
                         FROM p JOIN t ON t.e_from = p.e_from)
          SELECT e_from, any_value(row_n) AS n_out,
                 CAST(CAST(sum(CAST(n AS HUGEINT) * ($li - $lj)) AS BIGINT) AS DOUBLE)
                   / CAST(any_value(row_n) AS DOUBLE) / 1048576.0
                   AS h_next_bits
          FROM terms GROUP BY 1 ORDER BY 1"""
    },

    "ts_perm_entropy" -> {
      val lc = graft.functions.FixedLog2.sql("c")
      val lnw = graft.functions.FixedLog2.sql("n_windows")
      s"""WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                            CAST(round(arg_max(value, ts) * 100, 0)
                              AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
               t AS (SELECT event_type, c,
                            lead(c, 1) OVER w AS x1,
                            lead(c, 2) OVER w AS x2
                     FROM b WINDOW w AS (PARTITION BY event_type
                                         ORDER BY date)),
               pid AS (SELECT event_type,
                              (CASE WHEN x1 > c THEN 4 ELSE 0 END
                               + CASE WHEN x2 > x1 THEN 2 ELSE 0 END
                               + CASE WHEN x2 > c THEN 1 ELSE 0 END) AS pid
                       FROM t WHERE x2 IS NOT NULL),
               h AS (SELECT event_type, pid, count(*) AS c
                     FROM pid GROUP BY 1, 2),
               g AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_windows,
                            count(*) AS n_patterns,
                            CAST(sum(CAST(c AS HUGEINT) * $lc) AS HUGEINT)
                              AS sclog
                     FROM h GROUP BY 1)
          SELECT event_type, n_windows, n_patterns,
                 CAST(CAST(CAST(n_windows AS HUGEINT) * $lnw - sclog AS BIGINT) AS DOUBLE)
                   / CAST(n_windows AS DOUBLE) / 1048576.0
                   AS perm_entropy_bits
          FROM g ORDER BY event_type"""
    },

    "text_js_divergence" -> {
      val lb2 = graft.functions.FixedLog2.sql("bb")
      val law = graft.functions.FixedLog2.sql("aw")
      val lc = graft.functions.FixedLog2.sql("c")
      val lt2 = graft.functions.FixedLog2.sql("t")
      s"""WITH lt AS (SELECT lang, w, count(*) AS c FROM (
                        SELECT lang, unnest(regexp_extract_all(
                          translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS w
                        FROM documents) GROUP BY 1, 2),
               tl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t
                      FROM lt GROUP BY 1),
               dirf AS (SELECT a.lang AS la, tb.lang AS lb, a.w,
                               a.c AS c_a, coalesce(b.c, 0) AS c_b,
                               ta.t AS t_a, tb.t AS t_b,
                               a.c * tb.t + coalesce(b.c, 0) * ta.t AS aw,
                               2 * ta.t * tb.t AS bb
                        FROM lt a
                        JOIN tl tb ON tb.lang <> a.lang
                        LEFT JOIN lt b ON b.lang = tb.lang AND b.w = a.w
                        JOIN tl ta ON ta.lang = a.lang),
               terms AS (SELECT la, lb, c_b, t_a, t_b,
                                CAST(aw AS HUGEINT) * ($lb2 - $law) AS term
                         FROM dirf),
               d AS (SELECT la, lb, CAST(sum(term) AS HUGEINT) AS dsum
                     FROM terms GROUP BY 1, 2),
               i AS (SELECT la, lb, CAST(sum(term) AS HUGEINT) AS isum
                     FROM terms WHERE c_b > 0 AND la < lb GROUP BY 1, 2),
               hn AS (SELECT lt.lang, tl.t,
                             CAST(CAST(tl.t AS HUGEINT) * $lt2
                               - sum(CAST(c AS HUGEINT) * $lc) AS HUGEINT)
                               AS hnum
                      FROM lt JOIN tl ON tl.lang = lt.lang
                      GROUP BY 1, 2)
          SELECT d.la AS lang_a, d.lb AS lang_b,
                 (CAST(d.dsum + dr.dsum - i.isum AS DOUBLE)
                    / CAST(ha.t * hb.t * 2 AS DOUBLE) / 1048576.0)
                 - (CAST(ha.hnum AS DOUBLE) / CAST(ha.t AS DOUBLE)
                      / 1048576.0
                    + CAST(hb.hnum AS DOUBLE) / CAST(hb.t AS DOUBLE)
                      / 1048576.0) / 2.0 AS jsd_bits
          FROM d JOIN d dr ON dr.la = d.lb AND dr.lb = d.la
                 JOIN i ON i.la = d.la AND i.lb = d.lb
                 JOIN hn ha ON ha.lang = d.la
                 JOIN hn hb ON hb.lang = d.lb
          WHERE d.la < d.lb
          ORDER BY lang_a, lang_b"""
    },

    "sim_ivf_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS eq
                     FROM embeddings WHERE vec_id < 10),
            gt AS (SELECT query_id, vec_id FROM (
                     SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY
                         ${duckDot("eq", "embedding")}
                           / (sqrt(${duckDot("eq", "eq")})
                              * sqrt(${duckDot("embedding", "embedding")}))
                           DESC, vec_id ASC) AS rank
                     FROM q JOIN embeddings ON vec_id <> query_id)
                   WHERE rank <= 5),
            c AS (SELECT vec_id AS centroid_id, embedding AS ec
                  FROM embeddings WHERE vec_id < 8),
            asg AS (SELECT centroid_id, vec_id, embedding FROM (
                      SELECT e.vec_id, c.centroid_id, e.embedding,
                        row_number() OVER (PARTITION BY e.vec_id ORDER BY
                          ${duckDot("e.embedding", "c.ec")}
                            / (sqrt(${duckDot("e.embedding", "e.embedding")})
                               * sqrt(${duckDot("c.ec", "c.ec")})) DESC,
                          c.centroid_id ASC) AS rn
                      FROM embeddings e CROSS JOIN c)
                    WHERE rn = 1),
            prb AS (SELECT query_id, centroid_id, emb_q FROM (
                      SELECT q.vec_id AS query_id, c.centroid_id,
                             q.embedding AS emb_q,
                        row_number() OVER (PARTITION BY q.vec_id ORDER BY
                          ${duckDot("q.embedding", "c.ec")}
                            / (sqrt(${duckDot("q.embedding", "q.embedding")})
                               * sqrt(${duckDot("c.ec", "c.ec")})) DESC,
                          c.centroid_id ASC) AS rn
                      FROM embeddings q CROSS JOIN c WHERE q.vec_id < 10)
                    WHERE rn <= 2),
            sc AS (SELECT p.query_id, a.vec_id,
                     ${duckDot("p.emb_q", "a.embedding")}
                       / (sqrt(${duckDot("p.emb_q", "p.emb_q")})
                          * sqrt(${duckDot("a.embedding", "a.embedding")}))
                       AS cosine
                   FROM prb p JOIN asg a USING (centroid_id)
                   WHERE a.vec_id <> p.query_id),
            ivf AS (SELECT query_id, vec_id FROM (
                      SELECT query_id, vec_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, vec_id ASC) AS rank
                      FROM sc)
                    WHERE rank <= 5),
            h AS (SELECT gt.query_id, count(*) AS n_hits
                  FROM gt JOIN ivf ON ivf.query_id = gt.query_id
                                  AND ivf.vec_id = gt.vec_id
                  GROUP BY 1)
          SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT)
                   AS n_hits,
                 CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0
                   AS recall_at_5
          FROM q LEFT JOIN h ON h.query_id = q.query_id
          ORDER BY q.query_id""",

    "sim_knn_loo_accuracy" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS eq
                     FROM embeddings WHERE vec_id < 200),
              d AS (SELECT query_id, vec_id,
                      ${duckDot("eq", "embedding")}
                        / (sqrt(${duckDot("eq", "eq")})
                           * sqrt(${duckDot("embedding", "embedding")}))
                        AS cosine
                    FROM q JOIN embeddings ON vec_id <> query_id),
              r AS (SELECT query_id, vec_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, vec_id ASC) AS rank
                    FROM d),
              nn AS (SELECT r.query_id, CAST(e.label AS BIGINT) AS lbl,
                            r.rank
                     FROM r JOIN embeddings e ON e.vec_id = r.vec_id
                     WHERE r.rank <= 3),
              v AS (SELECT query_id, lbl, count(*) AS v, min(rank) AS best
                    FROM nn GROUP BY 1, 2),
              p AS (SELECT query_id, lbl AS pred FROM (
                      SELECT query_id, lbl,
                             row_number() OVER (PARTITION BY query_id
                               ORDER BY v DESC, best ASC, lbl ASC) AS rn
                      FROM v) WHERE rn = 1),
              t AS (SELECT p.pred, CAST(e.label AS BIGINT) AS truth
                    FROM p JOIN embeddings e ON e.vec_id = p.query_id)
         SELECT truth AS label, count(*) AS n_queries,
                CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct,
                CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
         FROM t GROUP BY 1 ORDER BY 1""",

    "text_keyphrase_rake" -> {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'")
        .mkString("[", ", ", "]")
      s"""WITH tok AS (SELECT doc_id, i AS pos, t[i] AS w
                       FROM (SELECT doc_id, t,
                               unnest(generate_series(1, len(t))) AS i
                             FROM (SELECT doc_id, regexp_extract_all(
                                     translate(text,
                                       'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                       'abcdefghijklmnopqrstuvwxyz'),
                                     '[a-z0-9]+') AS t
                                   FROM documents))),
               f AS (SELECT doc_id, pos, w,
                            CASE WHEN list_contains($stops, w)
                              THEN 1 ELSE 0 END AS stop
                     FROM tok),
               gg AS (SELECT doc_id, pos, w, stop,
                             CAST(sum(stop) OVER (PARTITION BY doc_id
                               ORDER BY pos) AS BIGINT) AS gid
                      FROM f),
               ph AS (SELECT doc_id, gid,
                             string_agg(w, ' ' ORDER BY pos) AS phrase,
                             CAST(count(*) AS BIGINT) AS len,
                             list(w ORDER BY pos) AS ws
                      FROM gg WHERE stop = 0 GROUP BY 1, 2
                      HAVING count(*) <= 3),
               mem AS (SELECT len, unnest(ws) AS w FROM ph),
               wsc AS (SELECT w, CAST(sum(len) AS BIGINT) * 1048576
                              // count(*) AS wscore
                       FROM mem GROUP BY 1),
               occ AS (SELECT p.doc_id, p.gid, p.phrase,
                              CAST(sum(wsc.wscore) AS BIGINT) AS pscore
                       FROM (SELECT doc_id, gid, phrase, unnest(ws) AS w
                             FROM ph) p
                       JOIN wsc ON wsc.w = p.w GROUP BY 1, 2, 3)
          SELECT phrase, count(*) AS n_occurrences,
                 CAST(max(pscore) AS DOUBLE) / 1048576.0 AS rake_score
          FROM occ GROUP BY 1 ORDER BY rake_score DESC, phrase LIMIT 20"""
    },

    "stream_entropy_daily" -> {
      val lc = graft.functions.FixedLog2.sql("c")
      val ln = graft.functions.FixedLog2.sql("n_events")
      s"""WITH c AS (SELECT CAST(ts AS DATE) AS date, event_type,
                            count(*) AS c
                     FROM events GROUP BY 1, 2),
               g AS (SELECT date, CAST(sum(c) AS BIGINT) AS n_events,
                            count(*) AS n_types,
                            CAST(sum(CAST(c AS HUGEINT) * $lc) AS HUGEINT)
                              AS sclog
                     FROM c GROUP BY 1)
          SELECT date, n_events, n_types,
                 CAST(CAST(CAST(n_events AS HUGEINT) * $ln - sclog AS BIGINT) AS DOUBLE)
                   / CAST(n_events AS DOUBLE) / 1048576.0 AS entropy_bits
          FROM g ORDER BY date"""
    },

    "ts_ljung_box" ->
      """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS date,
                           CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                             AS c
                    FROM events GROUP BY 1, 2),
              rr AS (SELECT event_type, date, c,
                            lag(c, 1) OVER w AS prev
                     FROM b
                     WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              q AS (SELECT event_type, date,
                           CAST(floor(CAST(c - prev AS DOUBLE)
                             / CAST(prev AS DOUBLE)
                             * CAST(1048576 AS DOUBLE)) AS BIGINT) AS x
                    FROM rr WHERE prev IS NOT NULL),
              p0 AS (SELECT event_type, x,
                            lag(x, 1) OVER w AS y1,
                            lag(x, 2) OVER w AS y2,
                            lag(x, 3) OVER w AS y3
                     FROM q
                     WINDOW w AS (PARTITION BY event_type ORDER BY date)),
              p AS (SELECT event_type, CAST(1 AS BIGINT) AS lag, x, y1 AS y
                    FROM p0
                    UNION ALL
                    SELECT event_type, 2, x, y2 FROM p0
                    UNION ALL
                    SELECT event_type, 3, x, y3 FROM p0),
              ag AS (SELECT event_type, lag,
                            CAST(count(*) AS HUGEINT) AS n,
                            CAST(sum(x) AS HUGEINT) AS sx,
                            CAST(sum(y) AS HUGEINT) AS sy,
                            CAST(sum(x * y) AS HUGEINT) AS sxy,
                            CAST(sum(x * x) AS HUGEINT) AS sxx,
                            CAST(sum(y * y) AS HUGEINT) AS syy
                     FROM p WHERE y IS NOT NULL GROUP BY 1, 2),
              r AS (SELECT event_type, lag,
                      CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                        / (sqrt(CAST(CAST(n * sxx - sx * sx AS BIGINT)
                                     AS DOUBLE))
                           * sqrt(CAST(CAST(n * syy - sy * sy AS BIGINT)
                                       AS DOUBLE))) AS r
                    FROM ag),
              ns AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
                     FROM q GROUP BY 1),
              t AS (SELECT r.event_type, ns.n_obs, r.lag,
                           r.r * r.r / CAST(ns.n_obs - r.lag AS DOUBLE)
                             AS term
                    FROM r JOIN ns ON ns.event_type = r.event_type)
         SELECT event_type, any_value(n_obs) AS n_obs,
                CAST(3 AS BIGINT) AS df,
                CAST(any_value(n_obs) AS DOUBLE)
                  * CAST(any_value(n_obs) + 2 AS DOUBLE)
                  * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(list_sort(list({'lag': lag,
                        't': term})), x -> x.t)),
                      (a, x) -> a + x) AS q_stat
         FROM t GROUP BY 1 ORDER BY 1""",

    "text_bpe_train_steps" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(translate(text,
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS t
                       FROM documents),
              tok0 AS (SELECT doc_id, i AS pos, t[i] AS w
                       FROM (SELECT doc_id, t,
                               unnest(generate_series(1, len(t))) AS i
                             FROM toks)),
              bg0 AS (SELECT w AS w1, w2, count(*) AS cnt FROM (
                        SELECT w, lead(w) OVER (PARTITION BY doc_id
                          ORDER BY pos) AS w2
                        FROM tok0)
                      WHERE w2 IS NOT NULL GROUP BY 1, 2),
              p0 AS (SELECT w1 AS a, w2 AS b FROM bg0 WHERE w1 <> w2
                     ORDER BY cnt DESC, w1, w2 LIMIT 1),
              m1 AS (SELECT doc_id, pos,
                       CASE WHEN w = p0.a AND nw = p0.b
                              THEN p0.a || '_' || p0.b
                            WHEN pw = p0.a AND w = p0.b THEN NULL
                            ELSE w END AS w
                     FROM (SELECT doc_id, pos, w,
                             lag(w) OVER (PARTITION BY doc_id
                               ORDER BY pos) AS pw,
                             lead(w) OVER (PARTITION BY doc_id
                               ORDER BY pos) AS nw
                           FROM tok0) CROSS JOIN p0),
              tok1 AS (SELECT doc_id, row_number() OVER (PARTITION BY
                         doc_id ORDER BY pos) AS pos, w
                       FROM m1 WHERE w IS NOT NULL),
              bg1 AS (SELECT w AS w1, w2, count(*) AS cnt FROM (
                        SELECT w, lead(w) OVER (PARTITION BY doc_id
                          ORDER BY pos) AS w2
                        FROM tok1)
                      WHERE w2 IS NOT NULL GROUP BY 1, 2),
              p1 AS (SELECT w1 AS a, w2 AS b FROM bg1 WHERE w1 <> w2
                     ORDER BY cnt DESC, w1, w2 LIMIT 1),
              m2 AS (SELECT doc_id, pos,
                       CASE WHEN w = p1.a AND nw = p1.b
                              THEN p1.a || '_' || p1.b
                            WHEN pw = p1.a AND w = p1.b THEN NULL
                            ELSE w END AS w
                     FROM (SELECT doc_id, pos, w,
                             lag(w) OVER (PARTITION BY doc_id
                               ORDER BY pos) AS pw,
                             lead(w) OVER (PARTITION BY doc_id
                               ORDER BY pos) AS nw
                           FROM tok1) CROSS JOIN p1),
              tok2 AS (SELECT doc_id, row_number() OVER (PARTITION BY
                         doc_id ORDER BY pos) AS pos, w
                       FROM m2 WHERE w IS NOT NULL),
              bg2 AS (SELECT w AS w1, w2, count(*) AS cnt FROM (
                        SELECT w, lead(w) OVER (PARTITION BY doc_id
                          ORDER BY pos) AS w2
                        FROM tok2)
                      WHERE w2 IS NOT NULL GROUP BY 1, 2)
         SELECT w1, w2, cnt FROM bg2
         ORDER BY cnt DESC, w1, w2 LIMIT 10""",

    "agg_kaplan_meier" -> {
      val ls = graft.functions.FixedLog2.sql("svv")
      val ln = graft.functions.FixedLog2.sql("n_at_risk")
      s"""WITH lives AS (SELECT user_id,
                           CAST(date_diff('day', min(CAST(ts AS DATE)),
                             max(CAST(ts AS DATE))) AS BIGINT) AS t
                         FROM events GROUP BY 1),
               hist AS (SELECT t, count(*) AS d FROM lives GROUP BY 1),
               ar AS (SELECT t, d,
                        CAST(sum(d) OVER (ORDER BY t ROWS BETWEEN
                          CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                          AS n_at_risk
                      FROM hist),
               sv AS (SELECT t, d, n_at_risk,
                        n_at_risk - d AS svv
                      FROM ar),
               tm AS (SELECT t, d, n_at_risk,
                        CASE WHEN n_at_risk > d
                          THEN $ls - $ln END AS surv
                      FROM sv)
          SELECT t AS lifetime_days, n_at_risk, d AS n_churned,
                 CASE WHEN surv IS NOT NULL THEN
                   CAST(sum(surv) OVER (ORDER BY t ROWS BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / 1048576.0 END AS log2_survival
          FROM tm ORDER BY lifetime_days"""
    },

    "sample_negative_table" ->
      """WITH uc AS (SELECT w, count(*) AS c FROM (
                       SELECT unnest(regexp_extract_all(translate(text,
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS w
                       FROM documents) GROUP BY 1),
              wt AS (SELECT w, c,
                       CAST(floor(sqrt(floor(sqrt(
                         CAST(c * c * c AS DOUBLE))))) AS BIGINT) AS wt
                     FROM uc),
              tot AS (SELECT CAST(sum(wt) AS BIGINT) AS total_wt FROM wt)
         SELECT w AS token, c AS freq, wt,
                wt * 1000000 // total_wt AS share_ppm
         FROM wt CROSS JOIN tot
         ORDER BY wt DESC, token LIMIT 30""",

    "emb_davies_bouldin" ->
      """WITH dims AS (SELECT CAST(label AS BIGINT) AS label, i,
                        CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536)
                          AS BIGINT) AS q
                      FROM (SELECT label, embedding,
                              unnest(generate_series(1, 64)) AS i
                            FROM embeddings)),
              cent AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS sq,
                              count(*) AS n
                       FROM dims GROUP BY 1, 2),
              ca AS (SELECT label,
                            list_transform(list_sort(list(
                              {'i': i, 'm': CAST(sq AS DOUBLE)
                                / CAST(n * 65536 AS DOUBLE)})),
                              x -> x.m) AS c
                     FROM cent GROUP BY 1),
              v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      list_transform(embedding, x ->
                        CAST(floor(CAST(x AS DOUBLE) * 65536) AS BIGINT))
                        AS qa
                    FROM embeddings),
              sc AS (SELECT v.label, count(*) AS n_vecs,
                       CAST(sum(CAST(floor(sqrt(
                           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list_transform(generate_series(1, 64), i ->
                               (CAST(qa[i] AS DOUBLE) / 65536.0 - c[i])
                               * (CAST(qa[i] AS DOUBLE) / 65536.0 - c[i]))),
                             (a, x) -> a + x)) * 1048576) AS BIGINT))
                         AS BIGINT) AS sdq
                     FROM v JOIN ca ON ca.label = v.label
                     GROUP BY 1),
              st AS (SELECT label, n_vecs,
                            CAST(sdq AS DOUBLE) / CAST(n_vecs AS DOUBLE)
                              / 1048576.0 AS scatter
                     FROM sc),
              pr AS (SELECT a.label AS li, b.label AS lj,
                       sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list_transform(generate_series(1, 64), i ->
                           (a.c[i] - b.c[i]) * (a.c[i] - b.c[i]))),
                         (x, y) -> x + y)) AS d_ij
                     FROM ca a JOIN ca b ON a.label <> b.label)
         SELECT pr.li AS label, any_value(si.n_vecs) AS n_vecs,
                any_value(si.scatter) AS scatter,
                max((si.scatter + sj.scatter) / pr.d_ij) AS r_worst
         FROM pr JOIN st si ON si.label = pr.li
                 JOIN st sj ON sj.label = pr.lj
         GROUP BY 1 ORDER BY 1""",

    "text_bigram_surprisal" -> {
      val la = graft.functions.FixedLog2.sql("c_a")
      val lab = graft.functions.FixedLog2.sql("c_ab")
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(translate(text,
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS t
                        FROM documents),
               bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
                      FROM (SELECT doc_id, t,
                              unnest(generate_series(1, len(t) - 1)) AS i
                            FROM toks)),
               bc AS (SELECT w1, w2, count(*) AS c_ab FROM bg
                      GROUP BY 1, 2),
               uc AS (SELECT w1, count(*) AS c_a FROM bg GROUP BY 1),
               j AS (SELECT bg.doc_id, uc.c_a, bc.c_ab
                     FROM bg JOIN bc ON bc.w1 = bg.w1 AND bc.w2 = bg.w2
                             JOIN uc ON uc.w1 = bg.w1),
               t2 AS (SELECT doc_id, count(*) AS n_bigrams,
                             CAST(sum($la - $lab) AS BIGINT) AS sbits
                      FROM j GROUP BY 1)
          SELECT doc_id, n_bigrams,
                 CAST(sbits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                   / 1048576.0 AS mean_bits
          FROM t2 ORDER BY mean_bits DESC, doc_id LIMIT 20"""
    },

    "sample_class_balanced" ->
      """WITH f AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(CAST(vec_id AS VARCHAR),
                          ''), ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM embeddings),
              m1 AS (SELECT vec_id, label,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT vec_id, label, (h1 * h1) % 2147483647 AS h2
                     FROM m1),
              hh AS (SELECT vec_id, label,
                       (h2 * 69069 + 362437) % 2147483647 AS hv FROM m2),
              rk AS (SELECT vec_id, label,
                       row_number() OVER (PARTITION BY label
                         ORDER BY hv, vec_id) AS rk
                     FROM hh),
              cnt AS (SELECT label, count(*) AS n_class FROM f GROUP BY 1),
              mm AS (SELECT min(n_class) AS m FROM cnt),
              sel AS (SELECT label, count(*) AS n_selected,
                        CAST(sum(vec_id) AS BIGINT) AS id_checksum
                      FROM rk CROSS JOIN mm WHERE rk <= mm.m GROUP BY 1)
         SELECT sel.label, cnt.n_class, sel.n_selected, sel.id_checksum
         FROM sel JOIN cnt ON cnt.label = sel.label
         ORDER BY sel.label""",

    "agg_anova_f" ->
      s"""WITH c AS (SELECT event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS c
                     FROM events),
              ${duckFixedFoldF("c", "c")}
         SELECT k, n_total, ssb, ssw,
                (ssb / CAST(k - 1 AS DOUBLE))
                  / (ssw / CAST(n_total - k AS DOUBLE)) AS f_stat
         FROM f""",

    "sketch_ddsketch_quantiles" -> {
      val lg = graft.functions.FixedLog2.sql("cents")
      s"""WITH v AS (SELECT event_type,
                            CAST(round(value * 100, 0) AS BIGINT) AS cents
                     FROM events
                     WHERE CAST(round(value * 100, 0) AS BIGINT) > 0),
               l AS (SELECT event_type, cents, $lg AS lg FROM v),
               bc AS (SELECT event_type, lg // 65536 AS bucket,
                             count(*) AS cnt,
                             CAST(min(cents) AS BIGINT) AS lo
                      FROM l GROUP BY 1, 2),
               cm AS (SELECT event_type, bucket, cnt, lo,
                             CAST(sum(cnt) OVER (PARTITION BY event_type
                               ORDER BY bucket) AS BIGINT) AS cum
                      FROM bc),
               n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
               ps AS (SELECT event_type, n,
                             CAST(unnest([50, 90, 99]) AS BIGINT) AS p
                      FROM n),
               ks AS (SELECT event_type, p, (n * p + 99) // 100 AS k
                      FROM ps),
               est AS (SELECT c.event_type, k.p,
                              CAST(min(c.bucket) AS BIGINT) AS bucket
                       FROM cm c JOIN ks k
                         ON k.event_type = c.event_type AND c.cum >= k.k
                       GROUP BY 1, 2),
               eb AS (SELECT e.event_type, e.p, e.bucket,
                             CAST(b.lo AS DOUBLE) / 100.0 AS est_value
                      FROM est e JOIN bc b
                        ON b.event_type = e.event_type
                       AND b.bucket = e.bucket),
               rk AS (SELECT event_type, cents,
                             row_number() OVER (PARTITION BY event_type
                               ORDER BY cents) AS rn
                      FROM v),
               ex AS (SELECT r.event_type, k.p,
                             CAST(r.cents AS DOUBLE) / 100.0 AS exact_value
                      FROM rk r JOIN ks k
                        ON k.event_type = r.event_type AND r.rn = k.k)
          SELECT eb.event_type, eb.p, eb.bucket, eb.est_value,
                 ex.exact_value
          FROM eb JOIN ex ON ex.event_type = eb.event_type
                         AND ex.p = eb.p
          ORDER BY 1, 2"""
    },

    "ts_page_hinkley" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(round(value * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS s,
                               count(*) AS n
                        FROM events GROUP BY 1, 2),
              x AS (SELECT event_type, d, (s * 10000) // n AS x FROM daily),
              c AS (SELECT event_type, d, x,
                           CAST(row_number() OVER w AS BIGINT) AS t,
                           CAST(sum(x) OVER w AS BIGINT) AS cumx
                    FROM x WINDOW w AS (PARTITION BY event_type
                                        ORDER BY d)),
              tm AS (SELECT event_type, d, x, x - cumx // t AS term FROM c),
              mm AS (SELECT event_type, d, x,
                            CAST(sum(term) OVER w AS BIGINT) AS m
                     FROM tm WINDOW w AS (PARTITION BY event_type
                                          ORDER BY d)),
              ph AS (SELECT event_type, d, x, m,
                            m - CAST(min(m) OVER w AS BIGINT) AS ph_inc,
                            CAST(max(m) OVER w AS BIGINT) - m AS ph_dec
                     FROM mm WINDOW w AS (PARTITION BY event_type
                                          ORDER BY d))
         SELECT event_type, d, x, m, ph_inc, ph_dec
         FROM ph ORDER BY 1, 2""",

    "ts_hurst_rs" -> {
      val lrs = graft.functions.FixedLog2.sql("rs_num")
      val lvar = graft.functions.FixedLog2.sql("var_num")
      val ln = graft.functions.FixedLog2.sql("n")
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                                CAST(sum(CAST(round(value * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS x
                         FROM events GROUP BY 1, 2),
               tt AS (SELECT event_type, x,
                             CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY d) AS BIGINT) AS t
                      FROM daily),
               sc AS (SELECT event_type, x, t, n
                      FROM tt CROSS JOIN (SELECT CAST(unnest([5, 10, 15])
                        AS BIGINT) AS n)),
               bl AS (SELECT event_type, x, n, (t - 1) // n AS block,
                             ((t - 1) % n) + 1 AS i
                      FROM sc),
               wc AS (SELECT event_type, n, block, i, x,
                             CAST(sum(x) OVER (PARTITION BY event_type, n,
                               block ORDER BY i) AS BIGINT) AS cum,
                             CAST(sum(x) OVER (PARTITION BY event_type, n,
                               block) AS BIGINT) AS sb,
                             CAST(sum(CAST(x AS HUGEINT) * x)
                               OVER (PARTITION BY event_type, n, block)
                               AS HUGEINT) AS ssb,
                             count(*) OVER (PARTITION BY event_type, n,
                               block) AS cnt
                      FROM bl),
               dvp AS (SELECT event_type, n, block,
                              max(n * cum - i * sb)
                                - min(n * cum - i * sb) AS rs_num,
                              CAST(any_value(CAST(n AS HUGEINT) * ssb
                                - CAST(sb AS HUGEINT) * sb) AS BIGINT)
                                AS var_num
                       FROM wc WHERE cnt = n GROUP BY 1, 2, 3),
               dv AS (SELECT event_type, n,
                             2 * $lrs - $lvar AS y
                      FROM dvp WHERE rs_num > 0 AND var_num > 0),
               ps AS (SELECT event_type, n, count(*) AS m,
                             CAST(sum(y) AS BIGINT) AS ys, $ln AS xs
                      FROM dv GROUP BY 1, 2),
               pr AS (SELECT event_type, count(*) AS k,
                             list_reduce(list_prepend(CAST(1 AS BIGINT),
                               list(m)), (a, b) -> a * b) AS bigm
                      FROM ps GROUP BY 1),
               jn AS (SELECT ps.event_type, ps.m, ps.xs,
                             ps.ys * (pr.bigm // ps.m) AS yp,
                             pr.k, pr.bigm
                      FROM ps JOIN pr ON pr.event_type = ps.event_type),
               ag AS (SELECT event_type, any_value(k) AS n_scales,
                             CAST(sum(m) AS BIGINT) AS n_blocks,
                             any_value(bigm) AS bigm,
                             CAST(sum(xs) AS BIGINT) AS sx,
                             CAST(sum(CAST(xs AS HUGEINT) * xs) AS HUGEINT)
                               AS sxx,
                             CAST(sum(CAST(xs AS HUGEINT) * yp) AS HUGEINT)
                               AS sxy,
                             CAST(sum(CAST(yp AS HUGEINT)) AS HUGEINT)
                               AS sy
                      FROM jn GROUP BY 1)
          SELECT event_type, n_scales, n_blocks,
                 CAST(CAST(CAST(n_scales AS HUGEINT) * sxy
                      - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                   / CAST(CAST(CAST(bigm AS HUGEINT)
                          * (CAST(n_scales AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS DOUBLE)
                   / 2.0 AS hurst
          FROM ag ORDER BY event_type"""
    },

    "ts_sax_symbols" ->
      """WITH ev AS (SELECT event_type, ts, event_id,
                            CAST(round(value * 100, 0) AS BIGINT) AS cents
                     FROM events),
              rn AS (SELECT event_type, cents,
                            CAST(row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS BIGINT) AS rn
                     FROM ev),
              fr AS (SELECT event_type, (rn - 1) // 64 AS frame,
                            count(*) AS cnt,
                            CAST(sum(cents) AS BIGINT) AS fsum
                     FROM rn GROUP BY 1, 2),
              ff AS (SELECT event_type, frame, fsum,
                            ntile(4) OVER (PARTITION BY event_type
                              ORDER BY fsum, frame) AS q
                     FROM fr WHERE cnt = 64),
              sy AS (SELECT event_type, frame,
                            substr('abcd', q, 1) AS sym
                     FROM ff),
              wd AS (SELECT event_type,
                            sym || lead(sym, 1) OVER w
                                || lead(sym, 2) OVER w AS word,
                            lead(sym, 2) OVER w AS s3
                     FROM sy WINDOW w AS (PARTITION BY event_type
                                          ORDER BY frame)),
              ct AS (SELECT event_type, word, count(*) AS n_frames
                     FROM wd WHERE s3 IS NOT NULL GROUP BY 1, 2),
              rk AS (SELECT event_type, word, n_frames,
                            row_number() OVER (PARTITION BY event_type
                              ORDER BY n_frames DESC, word) AS rk
                     FROM ct)
         SELECT event_type, word, n_frames
         FROM rk WHERE rk <= 10
         ORDER BY event_type, n_frames DESC, word""",

    "sample_neyman_allocation" ->
      s"""WITH $duckNeymanCtes,
              sel AS (SELECT r.event_type, count(*) AS n_selected,
                             CAST(sum(r.event_id) AS BIGINT) AS id_checksum
                      FROM rk r JOIN alloc a
                        ON a.event_type = r.event_type
                       AND r.rk <= a.n_alloc
                      GROUP BY 1)
         SELECT a.event_type, a.n_class, a.wt, a.n_alloc,
                s.n_selected, s.id_checksum
         FROM alloc a JOIN sel s ON s.event_type = a.event_type
         ORDER BY a.event_type""",

    "sim_lsh_multiprobe" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(8, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      val probes = ("qb" +: (0 until 8).map(i => s"xor(qb, ${1L << i})"))
        .mkString("[", ", ", "]")
      s"""WITH b AS (SELECT vec_id, embedding,
                            CAST($bits AS BIGINT) AS bucket
                     FROM embeddings),
              q AS (SELECT vec_id AS query_id, bucket AS qb,
                           embedding AS emb_q
                    FROM b WHERE vec_id < 10),
              pr AS (SELECT query_id, emb_q,
                            unnest($probes) AS probe
                     FROM q),
              cand AS (SELECT p.query_id, c.vec_id,
                              ${duckDot("p.emb_q", "c.embedding")}
                                / (sqrt(${duckDot("p.emb_q", "p.emb_q")})
                                   * sqrt(${duckDot("c.embedding",
                                                    "c.embedding")}))
                                AS cosine
                       FROM b c JOIN pr p ON c.bucket = p.probe
                       WHERE c.vec_id <> p.query_id),
              rk AS (SELECT query_id, vec_id, cosine,
                            CAST(row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS INT)
                              AS rank
                     FROM cand)
          SELECT query_id, rank, vec_id, cosine FROM rk
          WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "agg_levene_bf" ->
      s"""WITH v AS (SELECT event_type,
                           CAST(round(value * 100, 0) AS BIGINT) AS c
                    FROM events),
              r AS (SELECT event_type, c,
                           CAST(row_number() OVER (PARTITION BY event_type
                             ORDER BY c) AS BIGINT) AS rn,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM v),
              md AS (SELECT event_type,
                            CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN c
                                          ELSE 0 END)
                              + sum(CASE WHEN rn = (n + 2) // 2 THEN c
                                         ELSE 0 END) AS BIGINT) AS m2
                     FROM r GROUP BY 1),
              z AS (SELECT v.event_type, abs(v.c * 2 - md.m2) AS z
                    FROM v JOIN md ON md.event_type = v.event_type),
              ${duckFixedFoldF("z", "z")}
         SELECT k, n_total,
                (ssb / CAST(k - 1 AS DOUBLE))
                  / (ssw / CAST(n_total - k AS DOUBLE)) AS w_stat
         FROM f""",

    "ts_stl_decompose" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(round(value * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS x
                        FROM events GROUP BY 1, 2),
              tt AS (SELECT event_type, d, x,
                            CAST(isodow(d) AS BIGINT) AS dow,
                            CAST(row_number() OVER (PARTITION BY event_type
                              ORDER BY d) AS BIGINT) AS t
                     FROM daily),
              tr AS (SELECT event_type, d, x, dow,
                            CAST(sum(x) OVER w AS BIGINT) AS trend7,
                            count(*) OVER w AS cnt7
                     FROM tt WINDOW w AS (PARTITION BY event_type
                       ORDER BY t ROWS BETWEEN 3 PRECEDING
                       AND 3 FOLLOWING)),
              dt AS (SELECT event_type, d, x, dow, trend7,
                            x * 7 - trend7 AS det7
                     FROM tr WHERE cnt7 = 7),
              se AS (SELECT event_type, dow,
                            CAST(sum(det7) AS BIGINT) AS s_num,
                            count(*) AS s_cnt
                     FROM dt GROUP BY 1, 2),
              si AS (SELECT event_type, dow,
                            (s_num - ((s_num % s_cnt) + s_cnt) % s_cnt)
                              // s_cnt AS seasonal
                     FROM se)
         SELECT dt.event_type, dt.d, dt.x, dt.trend7, dt.det7,
                si.seasonal, dt.det7 - si.seasonal AS resid
         FROM dt JOIN si ON si.event_type = dt.event_type
                        AND si.dow = dt.dow
         ORDER BY dt.event_type, dt.d""",

    "agg_cuped_adjustment" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS dt,
                            CAST(round(value * 100, 0) AS BIGINT) AS c
                     FROM events),
              mid AS (SELECT min(dt) + 15 AS mid_d FROM ev),
              uu AS (SELECT user_id,
                            CAST(sum(CASE WHEN dt < mid_d THEN c END)
                              AS BIGINT) AS sx,
                            CAST(sum(CASE WHEN dt < mid_d THEN 1 END)
                              AS BIGINT) AS nx,
                            CAST(sum(CASE WHEN dt >= mid_d THEN c END)
                              AS BIGINT) AS sy,
                            CAST(sum(CASE WHEN dt >= mid_d THEN 1 END)
                              AS BIGINT) AS ny
                     FROM ev CROSS JOIN mid GROUP BY 1),
              ux AS (SELECT user_id, (sx * 10000) // nx AS x,
                            (sy * 10000) // ny AS y
                     FROM uu
                     WHERE nx IS NOT NULL AND ny IS NOT NULL),
              f AS (SELECT user_id, x, y,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(
                          string_split(CAST(user_id AS VARCHAR), ''),
                          ch -> CAST(ascii(ch) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 2147483647) AS h0
                    FROM ux),
              m1 AS (SELECT user_id, x, y,
                       (h0 * 1103515245 + 12345) % 2147483647 AS h1 FROM f),
              m2 AS (SELECT user_id, x, y, (h1 * h1) % 2147483647 AS h2
                     FROM m1),
              ar AS (SELECT user_id, x, y,
                       ((h2 * 69069 + 362437) % 2147483647) % 2 AS arm
                     FROM m2),
              po AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                            CAST(sum(y) AS BIGINT) AS sy,
                            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                              AS sxx,
                            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                              AS sxy,
                            CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                              AS syy
                     FROM ar),
              th AS (SELECT n,
                            CAST(CAST(CAST(n AS HUGEINT) * sxy
                                 - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                              / CAST(CAST(CAST(n AS HUGEINT) * sxx
                                 - CAST(sx AS HUGEINT) * sx AS BIGINT) AS DOUBLE)
                              AS theta,
                            (CAST(CAST(CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                             * CAST(CAST(CAST(n AS HUGEINT) * sxy
                                  - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE))
                              / (CAST(CAST(CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx AS BIGINT) AS DOUBLE)
                                 * CAST(CAST(CAST(n AS HUGEINT) * syy
                                   - CAST(sy AS HUGEINT) * sy AS BIGINT) AS DOUBLE))
                              AS rho2
                     FROM po),
              am AS (SELECT arm, count(*) AS na,
                            CAST(sum(x) AS BIGINT) AS sxa,
                            CAST(sum(y) AS BIGINT) AS sya
                     FROM ar GROUP BY 1),
              ab AS (SELECT a0.na AS n_a, a1.na AS n_b,
                            CAST(a0.sya AS DOUBLE) / CAST(a0.na AS DOUBLE)
                              - CAST(a1.sya AS DOUBLE)
                                / CAST(a1.na AS DOUBLE) AS diff_raw,
                            CAST(a0.sxa AS DOUBLE) / CAST(a0.na AS DOUBLE)
                              - CAST(a1.sxa AS DOUBLE)
                                / CAST(a1.na AS DOUBLE) AS diff_x
                     FROM (SELECT * FROM am WHERE arm = 0) a0
                     CROSS JOIN (SELECT * FROM am WHERE arm = 1) a1)
         SELECT ab.n_a, ab.n_b,
                ab.diff_raw / 10000.0 / 100.0 AS diff_raw,
                (ab.diff_raw - th.theta * ab.diff_x) / 10000.0 / 100.0
                  AS diff_cuped,
                th.theta, th.rho2
         FROM ab CROSS JOIN th""",

    "agg_ratio_delta_se" ->
      """WITH u AS (SELECT user_id, count(*) AS x,
                           CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                             AS BIGINT) AS y
                    FROM events GROUP BY 1),
              po AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                            CAST(sum(y) AS BIGINT) AS sy,
                            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                              AS sxx,
                            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                              AS sxy,
                            CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                              AS syy
                     FROM u),
              m AS (SELECT n,
                           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
                           CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
                           CAST(CAST(CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS BIGINT) AS DOUBLE)
                             / CAST(n * (n - 1) AS DOUBLE) AS var_x,
                           CAST(CAST(CAST(n AS HUGEINT) * syy
                                - CAST(sy AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                             / CAST(n * (n - 1) AS DOUBLE) AS var_y,
                           CAST(CAST(CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                             / CAST(n * (n - 1) AS DOUBLE) AS cov_xy
                    FROM po)
         SELECT n AS n_users, r / 100.0 AS ratio,
                sqrt((var_y - 2.0 * r * cov_xy + r * r * var_x)
                     / (CAST(n AS DOUBLE) * xbar * xbar)) / 100.0
                  AS se_delta
         FROM m""",

    "mm_image_phash" ->
      s"""WITH $duckPhashCtes
         SELECT media_id, width, height, lo AS phash_lo, hi AS phash_hi,
                n_set
         FROM hs ORDER BY media_id""",

    "text_rag_chunking" ->
      """WITH d AS (SELECT doc_id, text, n_chars FROM documents
                    WHERE n_chars > 0),
              ch AS (SELECT doc_id, text,
                            CAST(unnest(range(((n_chars - 1) // 150) + 1))
                              AS BIGINT) AS chunk_idx
                     FROM d),
              cc AS (SELECT doc_id, chunk_idx,
                            substr(text, CAST(chunk_idx * 150 + 1 AS INT),
                                   200) AS chunk
                     FROM ch)
         SELECT doc_id, chunk_idx,
                CAST(length(chunk) AS BIGINT) AS chunk_len,
                CAST(len(regexp_extract_all(translate(chunk,
                  'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                  'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+')) AS BIGINT)
                  AS n_tokens,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(chunk, ''),
                    c -> CAST(ascii(c) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % 2147483647) AS chunk_hash
         FROM cc ORDER BY doc_id, chunk_idx""",

    "ts_esd_outliers" -> {
      def round(i: Int): String =
        s"""m$i AS (SELECT event_type, count(*) AS n,
                          CAST(sum(x) AS BIGINT) AS s,
                          CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                            AS ss
                   FROM c$i GROUP BY 1),
            d$i AS (SELECT c.event_type, c.d, c.x, m.n, m.s, m.ss,
                           abs(c.x * m.n - m.s) AS dev,
                           row_number() OVER (PARTITION BY c.event_type
                             ORDER BY abs(c.x * m.n - m.s) DESC, c.d DESC)
                             AS rk
                    FROM c$i c JOIN m$i m
                      ON m.event_type = c.event_type),
            p$i AS (SELECT CAST($i AS BIGINT) AS round, event_type, d, x,
                           dev, n,
                           CAST(dev AS DOUBLE) / (CAST(n AS DOUBLE)
                             * sqrt(CAST(CAST(CAST(n AS HUGEINT) * ss
                                      - CAST(s AS HUGEINT) * s AS BIGINT) AS DOUBLE)
                                    / CAST(n * (n - 1) AS DOUBLE))) AS z
                    FROM d$i WHERE rk = 1),
            c${i + 1} AS (SELECT event_type, d, x FROM d$i WHERE rk <> 1)"""
      s"""WITH c1 AS (SELECT event_type, CAST(ts AS DATE) AS d,
                             CAST(sum(CAST(round(value * 100, 0)
                               AS BIGINT)) AS BIGINT) AS x
                      FROM events GROUP BY 1, 2),
              ${round(1)},
              ${round(2)},
              ${round(3)}
          SELECT round, event_type, d, x, dev, n, z FROM p1
          UNION ALL
          SELECT round, event_type, d, x, dev, n, z FROM p2
          UNION ALL
          SELECT round, event_type, d, x, dev, n, z FROM p3
          ORDER BY event_type, round"""
    },

    "dedup_phash_hamming" ->
      s"""WITH $duckPhashCtes,
              hf AS (SELECT * FROM hs WHERE n_set >= 8),
              bd AS (SELECT media_id, lo, hi, bb.b,
                            CASE bb.b WHEN 0 THEN lo % 65536
                                      WHEN 1 THEN lo // 65536
                                      WHEN 2 THEN hi % 65536
                                      ELSE hi // 65536 END AS v
                     FROM hf CROSS JOIN
                       (SELECT unnest([0, 1, 2, 3]) AS b) bb),
              pp AS (SELECT DISTINCT a.media_id AS media_a,
                            c.media_id AS media_b, a.lo AS lo_a,
                            a.hi AS hi_a, c.lo AS lo_b, c.hi AS hi_b
                     FROM bd a JOIN bd c
                       ON a.b = c.b AND a.v = c.v
                      AND a.media_id < c.media_id)
         SELECT media_a, media_b,
                CAST(bit_count(xor(lo_a, lo_b))
                     + bit_count(xor(hi_a, hi_b)) AS BIGINT) AS hamming
         FROM pp
         WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 3
         ORDER BY 1, 2""",

    "sql_api_lattice_report" -> {
      val ln = graft.functions.FixedLog2.sql("n")
      s"""WITH g AS (SELECT event_type, count(*) AS n,
                            min(CAST(ts AS DATE)) AS d0,
                            max(CAST(ts AS DATE)) AS d1
                     FROM events GROUP BY 1),
               h AS (SELECT event_type, n, d0, d1,
                            list_reduce(list_prepend(CAST(0 AS BIGINT),
                              list_transform(string_split(event_type, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
                              (a, c) -> (a * 31 + c) % 2147483647)
                              AS type_hash
                     FROM g),
               bb AS (SELECT event_type,
                             CAST(unnest(generate_series(d0, d1 - 1,
                               INTERVAL 1 DAY)) AS DATE) AS day
                      FROM h),
               bc AS (SELECT event_type,
                             CAST(count(*) FILTER (WHERE isodow(day) <= 5
                               AND NOT ((month(day) = 1 AND day(day) = 1)
                                 OR (month(day) = 7 AND day(day) = 4)
                                 OR (month(day) = 12 AND day(day) = 25)))
                               AS INT) AS busdays
                      FROM bb GROUP BY 1)
          SELECT h.event_type, h.type_hash, h.n, $ln AS log2_n_q20,
                 coalesce(bc.busdays, CAST(0 AS INT)) AS busdays
          FROM h LEFT JOIN bc ON bc.event_type = h.event_type
          ORDER BY h.event_type"""
    },

    "ts_forecast_baseline_eval" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                               CAST(sum(CAST(round(value * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS x
                        FROM events GROUP BY 1, 2),
              lg AS (SELECT event_type, d, x,
                            lag(x, 1) OVER w AS p1,
                            lag(x, 7) OVER w AS p7
                     FROM daily WINDOW w AS (PARTITION BY event_type
                                             ORDER BY d)),
              e AS (SELECT event_type, x, p1, p7,
                           (abs(x - p1) * 1000000) // (x + p1) AS smape1,
                           (abs(x - p7) * 1000000) // (x + p7) AS smape7
                    FROM lg WHERE p7 IS NOT NULL),
              g AS (SELECT event_type, count(*) AS n_eval,
                           CAST(sum(abs(x - p1)) AS BIGINT) AS ae1,
                           CAST(sum(abs(x - p7)) AS BIGINT) AS ae7,
                           CAST(sum(smape1) AS BIGINT) AS sm1,
                           CAST(sum(smape7) AS BIGINT) AS sm7
                    FROM e GROUP BY 1)
         SELECT event_type, n_eval,
                CAST(ae1 AS DOUBLE) / CAST(n_eval AS DOUBLE) / 100.0
                  AS mae_naive,
                CAST(ae7 AS DOUBLE) / CAST(n_eval AS DOUBLE) / 100.0
                  AS mae_snaive,
                sm1 // n_eval AS smape_naive_ppm,
                sm7 // n_eval AS smape_snaive_ppm
         FROM g ORDER BY event_type""",

    "sample_expansion_estimate" ->
      s"""WITH $duckNeymanCtes,
              sel AS (SELECT r.event_type, count(*) AS n_sel,
                             CAST(sum(r.c) AS BIGINT) AS sel_cents
                      FROM rk r JOIN alloc a
                        ON a.event_type = r.event_type
                       AND r.rk <= a.n_alloc
                      GROUP BY 1),
              est AS (SELECT a.event_type, a.n_class, s.n_sel,
                             (s.sel_cents * a.n_class) // s.n_sel
                               AS est_cents,
                             a.sc AS true_cents
                      FROM alloc a JOIN sel s
                        ON s.event_type = a.event_type),
              er AS (SELECT event_type, n_class, n_sel, est_cents,
                            true_cents,
                            est_cents - true_cents AS err
                     FROM est)
         SELECT event_type, n_class, n_sel, est_cents, true_cents,
                (err * 1000000 - ((err * 1000000 % true_cents)
                   + true_cents) % true_cents) // true_cents AS err_ppm
         FROM er ORDER BY event_type""",

    "dq_psi_value_drift" -> {
      val lan2 = graft.functions.FixedLog2.sql("an2")
      val lbn1 = graft.functions.FixedLog2.sql("bn1")
      val lc = graft.functions.FixedLog2.sql("c")
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                             CAST(round(value * 100, 0) AS BIGINT) AS c
                      FROM events
                      WHERE CAST(round(value * 100, 0) AS BIGINT) > 0),
               mid AS (SELECT min(dt) + 15 AS mid_d FROM ev),
               binned AS (SELECT event_type, $lc // 1048576 AS bin,
                                 CASE WHEN dt < mid_d THEN 1 ELSE 2 END
                                   AS side,
                                 count(*) AS cnt
                          FROM ev CROSS JOIN mid GROUP BY 1, 2, 3),
               grid AS (SELECT g.event_type, g.bin, s.side,
                               coalesce(b.cnt, 0) + 1 AS sm
                        FROM (SELECT DISTINCT event_type, bin
                              FROM binned) g
                        JOIN (SELECT DISTINCT event_type, side
                              FROM binned) s
                          ON s.event_type = g.event_type
                        LEFT JOIN binned b
                          ON b.event_type = g.event_type
                         AND b.bin = g.bin AND b.side = s.side),
               wide AS (SELECT event_type, bin,
                               CAST(sum(CASE WHEN side = 1 THEN sm END)
                                 AS BIGINT) AS a,
                               CAST(sum(CASE WHEN side = 2 THEN sm END)
                                 AS BIGINT) AS b
                        FROM grid GROUP BY 1, 2),
               tt AS (SELECT event_type, CAST(sum(a) AS BIGINT) AS n1,
                             CAST(sum(b) AS BIGINT) AS n2,
                             count(*) AS n_bins
                      FROM wide GROUP BY 1),
               tm AS (SELECT w.event_type, t.n_bins, t.n1, t.n2,
                             w.a * t.n2 AS an2, w.b * t.n1 AS bn1
                      FROM wide w JOIN tt t
                        ON t.event_type = w.event_type),
               terms AS (SELECT event_type, n_bins, n1, n2,
                                CAST(an2 - bn1 AS HUGEINT)
                                  * ($lan2 - $lbn1) AS term
                         FROM tm),
               agg AS (SELECT event_type, any_value(n_bins) AS n_bins,
                              any_value(n1) AS n1, any_value(n2) AS n2,
                              CAST(sum(term) AS HUGEINT) AS tsum
                       FROM terms GROUP BY 1)
          SELECT event_type, n_bins, n1, n2,
                 CAST(tsum AS DOUBLE) * 0.6931471805599453
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      * 1048576.0) AS psi
          FROM agg ORDER BY event_type"""
    },

    "ts_xcorr_lags" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type,
                               CAST(sum(CAST(round(value * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS x
                        FROM events
                        WHERE event_type IN ('click', 'purchase')
                        GROUP BY 1, 2),
              ab AS (SELECT d,
                            CAST(sum(CASE WHEN event_type = 'click'
                              THEN x END) AS BIGINT) AS a,
                            CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN x END) AS BIGINT) AS b
                     FROM daily GROUP BY 1),
              f AS (SELECT * FROM ab
                    WHERE a IS NOT NULL AND b IS NOT NULL),
              lg AS (SELECT a, b, lead(b, 1) OVER w AS b1,
                            lead(b, 2) OVER w AS b2,
                            lead(b, 3) OVER w AS b3
                     FROM f WINDOW w AS (ORDER BY d)),
              st AS (SELECT CAST(0 AS BIGINT) AS lag, a, b AS bb FROM lg
                     UNION ALL SELECT 1, a, b1 FROM lg
                     UNION ALL SELECT 2, a, b2 FROM lg
                     UNION ALL SELECT 3, a, b3 FROM lg),
              sf AS (SELECT * FROM st WHERE bb IS NOT NULL),
              g AS (SELECT lag, count(*) AS n_pairs,
                           CAST(sum(a) AS HUGEINT) AS sa,
                           CAST(sum(bb) AS HUGEINT) AS sb,
                           CAST(sum(CAST(a AS HUGEINT) * bb) AS HUGEINT)
                             AS sab,
                           CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT)
                             AS saa,
                           CAST(sum(CAST(bb AS HUGEINT) * bb) AS HUGEINT)
                             AS sbb
                    FROM sf GROUP BY 1)
         SELECT lag, n_pairs,
                CAST(CAST(CAST(n_pairs AS HUGEINT) * sab - sa * sb AS BIGINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(CAST(n_pairs AS HUGEINT) * saa
                               - sa * sa AS BIGINT) AS DOUBLE))
                     * sqrt(CAST(CAST(CAST(n_pairs AS HUGEINT) * sbb
                                 - sb * sb AS BIGINT) AS DOUBLE))) AS xcorr
         FROM g ORDER BY lag""",

    "dedup_bbit_minhash" ->
      s"""WITH $duckMinhashCandCtes,
              eqs AS (SELECT doc_a, doc_b,
                        CAST(len(list_filter(generate_series(1, 16), i ->
                          sig_a[i] = sig_b[i])) AS BIGINT) AS eq_full,
                        CAST(len(list_filter(generate_series(1, 16), i ->
                          sig_a[i] % 2 = sig_b[i] % 2)) AS BIGINT)
                          AS eq_bits
                      FROM cand)
          SELECT doc_a, doc_b, eq_full, eq_bits,
                 CAST(eq_full AS DOUBLE) / 16.0 AS est_full,
                 2.0 * CAST(eq_bits AS DOUBLE) / 16.0 - 1.0 AS est_1bit
          FROM eqs
          WHERE CAST(eq_full AS DOUBLE) / 16.0 >= 0.5
          ORDER BY doc_a, doc_b""",

    "ts_mann_kendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                               CAST(sum(CAST(round(value * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS x
                        FROM events GROUP BY 1, 2),
              sp AS (SELECT a.event_type,
                            CAST(sum(CASE WHEN b.x > a.x THEN 1
                                          WHEN b.x < a.x THEN -1
                                          ELSE 0 END) AS BIGINT) AS s_stat
                     FROM daily a JOIN daily b
                       ON b.event_type = a.event_type AND a.dt < b.dt
                     GROUP BY 1),
              tc AS (SELECT event_type, x, count(*) AS t
                     FROM daily GROUP BY 1, 2),
              ti AS (SELECT event_type,
                            CAST(count(*) AS BIGINT) AS n_distinct,
                            CAST(sum(t) AS BIGINT) AS n_days,
                            CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT)
                              AS tie18
                     FROM tc GROUP BY 1),
              j AS (SELECT s.event_type, t.n_days, s.s_stat,
                           t.n_days * (t.n_days - 1) * (t.n_days * 2 + 5)
                             - t.tie18 AS var18,
                           CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                                WHEN s.s_stat < 0 THEN s.s_stat + 1
                                ELSE 0 END AS s_adj
                    FROM sp s JOIN ti t ON t.event_type = s.event_type)
         SELECT event_type, n_days, s_stat, var18,
                CAST(s_adj AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0) AS z,
                CAST(s_stat AS DOUBLE) * 2.0
                  / CAST(n_days * (n_days - 1) AS DOUBLE) AS tau
         FROM j ORDER BY event_type""",

    "olap_window_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY 1),
              c2 AS (SELECT e.user_id, min(e.ts) AS t2
                     FROM events e JOIN v ON v.user_id = e.user_id
                     WHERE e.event_type = 'click' AND e.ts >= v.t1
                       AND e.ts <= v.t1 + INTERVAL 3 DAY
                     GROUP BY 1),
              p3 AS (SELECT e.user_id, min(e.ts) AS t3
                     FROM events e JOIN v ON v.user_id = e.user_id
                                   JOIN c2 ON c2.user_id = e.user_id
                     WHERE e.event_type = 'purchase' AND e.ts >= c2.t2
                       AND e.ts <= v.t1 + INTERVAL 3 DAY
                     GROUP BY 1)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
                  (SELECT count(*) FROM v) AS n_users
           UNION ALL
           SELECT 2, 'click_in_window', (SELECT count(*) FROM c2)
           UNION ALL
           SELECT 3, 'purchase_in_window', (SELECT count(*) FROM p3))
         ORDER BY stage""",

    "agg_effect_size_t" ->
      """WITH st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                     AS BIGINT) AS sc,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                          * CAST(round(value * 100, 0) AS BIGINT))
                     AS BIGINT) AS ss
            FROM events GROUP BY 1),
     pr AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
                   a.n AS na, b.n AS nb,
                   CAST(a.sc AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
                   CAST(b.sc AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
                   CAST(CAST(CAST(a.n AS HUGEINT) * a.ss
                        - CAST(a.sc AS HUGEINT) * a.sc AS BIGINT) AS DOUBLE)
                     / CAST(a.n * (a.n - 1) AS DOUBLE) AS va,
                   CAST(CAST(CAST(b.n AS HUGEINT) * b.ss
                        - CAST(b.sc AS HUGEINT) * b.sc AS BIGINT) AS DOUBLE)
                     / CAST(b.n * (b.n - 1) AS DOUBLE) AS vb
            FROM st a JOIN st b ON a.event_type < b.event_type)
         SELECT et_a, et_b, na, nb,
                (ma - mb)
                  / (sqrt((CAST(na - 1 AS DOUBLE) * va
                           + CAST(nb - 1 AS DOUBLE) * vb)
                          / CAST(na + nb - 2 AS DOUBLE))
                     * sqrt(1.0 / CAST(na AS DOUBLE)
                            + 1.0 / CAST(nb AS DOUBLE))) AS t_pooled,
                (ma - mb)
                  / sqrt((CAST(na - 1 AS DOUBLE) * va
                          + CAST(nb - 1 AS DOUBLE) * vb)
                         / CAST(na + nb - 2 AS DOUBLE)) AS cohen_d,
                (va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))
                  * (va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))
                  / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE))
                       / CAST(na - 1 AS DOUBLE)
                     + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE))
                       / CAST(nb - 1 AS DOUBLE)) AS df_welch
         FROM pr ORDER BY et_a, et_b""",

    "ts_stochastic_oscillator" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                    AS close_c
           FROM events GROUP BY 1, 2),
     w AS (SELECT event_type, dt, close_c,
                  row_number() OVER
                    (PARTITION BY event_type ORDER BY dt) AS rn,
                  min(close_c) OVER (PARTITION BY event_type ORDER BY dt
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS mn,
                  max(close_c) OVER (PARTITION BY event_type ORDER BY dt
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS mx
           FROM d),
     k AS (SELECT event_type, dt, close_c,
                  CASE WHEN rn >= 14 AND mx > mn
                       THEN ((close_c - mn) * 1000000) // (mx - mn)
                  END AS k_ppm
           FROM w)
         SELECT event_type, dt, close_c, k_ppm,
                CASE WHEN count(k_ppm) OVER (PARTITION BY event_type
                       ORDER BY dt
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 3
                     THEN CAST(sum(k_ppm) OVER (PARTITION BY event_type
                       ORDER BY dt
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) // 3
                       AS BIGINT)
                END AS d_ppm
         FROM k ORDER BY event_type, dt""",

    "dq_volume_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
     w AS (SELECT event_type, dt, n,
                  count(*) OVER tw AS wn,
                  CAST(sum(n) OVER tw AS BIGINT) AS s1,
                  CAST(sum(n * n) OVER tw AS BIGINT) AS s2
           FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY dt
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, dt, n, s1 AS trail_sum,
                7 * s2 - s1 * s1 AS var_num,
                CASE WHEN 7 * s2 - s1 * s1 > 0
                     THEN CAST(7 * n - s1 AS DOUBLE)
                       / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE)) END AS z,
                CASE WHEN 7 * s2 - s1 * s1 > 0
                     THEN abs(CAST(7 * n - s1 AS DOUBLE)
                       / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE))) > 3.0
                END AS is_anomaly
         FROM w WHERE wn = 7 ORDER BY event_type, dt""",

    "olap_sequence_match" ->
      """WITH u AS (SELECT user_id,
                  string_agg(substr(event_type, 1, 1), ''
                             ORDER BY ts, event_id) AS s
           FROM events GROUP BY 1),
     pats AS (SELECT * FROM (VALUES
        ('funnel_ordered', 'v.*c.*p'),
        ('click_purchase_adjacent', 'cp'),
        ('starts_with_signup', '^s'),
        ('repeat_purchase', 'pp'),
        ('error_mid_funnel', 'v[^p]*e[^p]*p'))
        p(pattern_name, pattern))
         SELECT p.pattern_name, p.pattern,
                CAST(sum(CASE WHEN regexp_matches(u.s, p.pattern)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
                CAST(sum(CASE WHEN regexp_matches(u.s, p.pattern)
                              THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) AS frac
         FROM u CROSS JOIN pats p GROUP BY 1, 2 ORDER BY pattern_name""",

    "ts_kama" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS p
           FROM events GROUP BY 1, 2),
     w AS (SELECT event_type, dt, p,
                  row_number() OVER k AS rn,
                  abs(p - lag(p, 1) OVER k) AS v,
                  abs(p - lag(p, 10) OVER k) AS mom
           FROM d WINDOW k AS (PARTITION BY event_type ORDER BY dt)),
     w2 AS (SELECT event_type, dt, p, rn, mom,
                   CAST(sum(v) OVER (PARTITION BY event_type ORDER BY dt
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS vol10
            FROM w),
     s AS (SELECT event_type, dt, p,
                  CASE WHEN vol10 > 0 THEN (mom * 1000000) // vol10
                       ELSE 0 END AS er_ppm
           FROM w2 WHERE rn >= 11),
     s2 AS (SELECT event_type, dt, p,
                   ((er_ppm * 602150) // 1000000 + 64516) AS scr
            FROM s),
     s3 AS (SELECT event_type, dt, p,
                   (scr * scr) // 1000000 AS sc2 FROM s2),
     pk AS (SELECT event_type, dt, p, sc2,
                   p * 1048576 + sc2 AS packed FROM s3),
     l AS (SELECT event_type, dt, p, sc2,
                  list(packed) OVER (PARTITION BY event_type ORDER BY dt
                    ROWS UNBOUNDED PRECEDING) AS pl
           FROM pk)
         SELECT event_type, dt, p AS close_c, sc2 AS sc_ppm,
                list_reduce(list_prepend(pl[1] // 1048576, pl[2:]),
                  (a, x) -> a + ((x % 1048576) * ((x // 1048576) - a))
                              // 1000000) AS kama_c
         FROM l ORDER BY event_type, dt""",

    "ts_amihud_illiquidity" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT)
                    AS close_c,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS dv
           FROM events GROUP BY 1, 2),
     r AS (SELECT event_type, dt, close_c, dv,
                  lag(close_c, 1) OVER (PARTITION BY event_type
                    ORDER BY dt) AS prev
           FROM d),
     i AS (SELECT event_type, dt,
                  (abs(((close_c - prev) * 1000000) // prev) * 1000000)
                    // dv AS illiq
           FROM r WHERE prev IS NOT NULL AND prev > 0 AND dv > 0),
     pkd AS (SELECT event_type, dt, illiq,
                    illiq * 100000 + (dt - DATE '1970-01-01') AS pk
             FROM i)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(illiq) AS BIGINT) AS sum_illiq,
                CAST(sum(illiq) AS BIGINT) // count(*) AS mean_illiq,
                max(illiq) AS max_illiq,
                arg_max(dt, pk) AS worst_day
         FROM pkd GROUP BY 1 ORDER BY event_type""",

    "sample_poisson_bootstrap" ->
      """WITH ev AS (SELECT event_type, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
     reps AS (SELECT event_type, event_id, c, r
              FROM ev CROSS JOIN
                (SELECT unnest(generate_series(1, 32)) AS r)),
     h0 AS (SELECT event_type, c, r,
                   ((event_id % 2147483647) * 37 + r) % 2147483647 AS b0
            FROM reps),
     h1 AS (SELECT event_type, c, r,
                   (b0 * 1103515245 + 12345) % 2147483647 AS h1 FROM h0),
     h2 AS (SELECT event_type, c, r, (h1 * h1) % 2147483647 AS hm FROM h1),
     h3 AS (SELECT event_type, c, r,
                   ((hm * 69069 + 362437) % 2147483647) % 1000000 AS u
            FROM h2),
     wt AS (SELECT event_type, c, r,
                   CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                        WHEN u < 919699 THEN 2 WHEN u < 980988 THEN 3
                        WHEN u < 996312 THEN 4 WHEN u < 999380 THEN 5
                        ELSE 6 END AS w
            FROM h3),
     totals AS (SELECT event_type, r,
                       CAST(sum(w * c) AS BIGINT) AS swc
                FROM wt GROUP BY 1, 2),
     boot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps,
                     CAST(sum(swc) AS BIGINT) AS s1,
                     CAST(sum(CAST(swc AS HUGEINT) * swc) AS HUGEINT) AS s2
              FROM totals GROUP BY 1),
     census AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS census_total
                FROM ev GROUP BY 1)
         SELECT b.event_type, b.n_reps, census.census_total,
                CAST(b.s1 AS DOUBLE) / 32.0 AS boot_mean_total,
                sqrt(CAST(CAST(32 * b.s2 - CAST(b.s1 AS HUGEINT) * b.s1 AS BIGINT) AS DOUBLE) / 992.0) AS boot_se_total
         FROM boot b JOIN census USING (event_type)
         ORDER BY event_type""",

    "dq_partition_checksum" ->
      """WITH h AS (SELECT event_type, CAST(ts AS DATE) AS dt, event_id,
                  CAST(round(value * 100, 0) AS BIGINT) AS c,
                  (((event_id % 2147483647) * 1103515245 + 12345)
                    % 2147483647) AS h1
           FROM events),
     h2 AS (SELECT event_type, dt, event_id, c,
                   (h1 * h1) % 2147483647 AS hm FROM h),
     h3 AS (SELECT event_type, dt, event_id, c,
                   (hm * 69069 + 362437) % 2147483647 AS hv FROM h2)
         SELECT event_type, dt, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(hv) AS BIGINT) AS checksum,
                CAST(sum(c) AS BIGINT) AS sum_c,
                min(event_id) AS min_id, max(event_id) AS max_id
         FROM h3 GROUP BY 1, 2 ORDER BY event_type, dt""",

    "sim_knn_graph" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(4, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH b AS (SELECT vec_id, embedding, $bits AS bucket
                     FROM embeddings),
              pairs AS (SELECT a.vec_id AS va, b2.vec_id AS vb,
                          ${duckDot("a.embedding", "b2.embedding")}
                            / (sqrt(${duckDot("a.embedding", "a.embedding")})
                               * sqrt(${duckDot("b2.embedding",
                                 "b2.embedding")})) AS cosine
                        FROM b a JOIN b b2 ON a.bucket = b2.bucket
                                           AND a.vec_id <> b2.vec_id),
              ranked AS (SELECT va, vb, cosine,
                           row_number() OVER (PARTITION BY va
                             ORDER BY cosine DESC, vb) AS rk
                         FROM pairs QUALIFY rk <= 3)
          SELECT x.va AS vec_a, x.vb AS vec_b, x.cosine AS cosine,
                 x.rk AS rank_ab, y.rk AS rank_ba
          FROM ranked x JOIN ranked y ON x.va = y.vb AND x.vb = y.va
          WHERE x.va < x.vb
          ORDER BY vec_a, vec_b"""
    },

    "ts_cusum" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS p
           FROM events GROUP BY 1, 2),
     r AS (SELECT event_type, dt, p,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY dt) AS rn
           FROM d),
     base AS (SELECT event_type,
                     CAST(sum(p) AS BIGINT) // 10 AS b10
              FROM r WHERE rn <= 10 GROUP BY 1),
     inc AS (SELECT r.event_type, r.dt, r.p, b.b10,
                    b.b10 // 50 AS k, b.b10 // 10 AS h,
                    r.p - b.b10 - b.b10 // 50 AS dp,
                    b.b10 - r.p - b.b10 // 50 AS dm
             FROM r JOIN base b ON b.event_type = r.event_type
             WHERE r.rn >= 11),
     l AS (SELECT event_type, dt, p, h,
                  list(dp) OVER (PARTITION BY event_type ORDER BY dt
                    ROWS UNBOUNDED PRECEDING) AS lp,
                  list(dm) OVER (PARTITION BY event_type ORDER BY dt
                    ROWS UNBOUNDED PRECEDING) AS lm
           FROM inc),
     f AS (SELECT event_type, dt, p, h,
                  list_reduce(list_prepend(CAST(0 AS BIGINT), lp),
                    (a, x) -> ((a + x) + abs(a + x)) // 2) AS s_plus,
                  list_reduce(list_prepend(CAST(0 AS BIGINT), lm),
                    (a, x) -> ((a + x) + abs(a + x)) // 2) AS s_minus
           FROM l)
         SELECT event_type, dt, p AS close_c, s_plus, s_minus,
                s_plus > h OR s_minus > h AS alarm
         FROM f ORDER BY event_type, dt""",

    "ts_garman_klass_vol" -> {
      val lh = graft.functions.FixedLog2.sql("hc")
      val ll = graft.functions.FixedLog2.sql("lc")
      val lcc = graft.functions.FixedLog2.sql("cc")
      val lo = graft.functions.FixedLog2.sql("oc")
      s"""WITH c AS (SELECT event_type, CAST(ts AS DATE) AS dt, ts,
                  CAST(round(value * 100, 0) AS BIGINT) AS cent
           FROM events),
     d AS (SELECT event_type, dt,
                  max(cent) AS hc, min(cent) AS lc,
                  arg_min(cent, ts) AS oc, arg_max(cent, ts) AS cc
           FROM c GROUP BY 1, 2),
     t AS (SELECT event_type, $lh - $ll AS hl, $lcc - $lo AS co
           FROM d WHERE lc > 0),
     g AS (SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_days,
                  CAST(sum(CAST(hl AS HUGEINT) * hl * 500000
                         - CAST(co AS HUGEINT) * co * 386294)
                    AS HUGEINT) AS gs
           FROM t GROUP BY 1)
         SELECT event_type, n_days,
                CAST(gs AS DOUBLE) / (CAST(n_days AS DOUBLE)
                  * 1099511627776.0 * 1000000.0) AS gk_mean_bits2,
                CASE WHEN gs > 0
                     THEN sqrt(CAST(gs AS DOUBLE) / (CAST(n_days AS DOUBLE)
                       * 1099511627776.0 * 1000000.0))
                END AS vol_bits_daily
         FROM g ORDER BY event_type"""
    },

    "mine_transition_lift" ->
      """WITH p AS (SELECT event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS b
           FROM events),
     pp AS (SELECT a, b FROM p WHERE b IS NOT NULL),
     cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
             FROM pp GROUP BY 1, 2),
     ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c_a FROM pp GROUP BY 1),
     cb AS (SELECT b, CAST(count(*) AS BIGINT) AS c_b FROM pp GROUP BY 1),
     n AS (SELECT CAST(count(*) AS BIGINT) AS n_trans FROM pp)
         SELECT cab.a, cab.b, cab.c_ab, ca.c_a, cb.c_b, n.n_trans,
                CAST((CAST(cab.c_ab AS HUGEINT) * n.n_trans * 1000000)
                  // (CAST(ca.c_a AS HUGEINT) * cb.c_b) AS BIGINT)
                  AS lift_ppm,
                CAST(CAST(CAST(cab.c_ab AS HUGEINT) * n.n_trans AS BIGINT) AS DOUBLE)
                  / CAST(CAST(CAST(ca.c_a AS HUGEINT) * cb.c_b AS BIGINT) AS DOUBLE)
                  AS lift
         FROM cab JOIN ca ON ca.a = cab.a
                  JOIN cb ON cb.b = cab.b
                  CROSS JOIN n
         ORDER BY cab.a, cab.b""",

    "agg_trimmed_mean" ->
      """WITH ev AS (SELECT event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
     cells AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
               FROM ev GROUP BY 1, 2),
     cum AS (SELECT event_type, c, cnt,
                    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             FROM cells),
     tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(c) AS BIGINT) AS s_all
             FROM ev GROUP BY 1),
     k AS (SELECT cum.event_type, cum.c, cum.cnt, cum.cum,
                  cum.cum - cum.cnt AS cum_prev,
                  tot.n, tot.s_all, tot.n // 10 AS lo
           FROM cum JOIN tot ON tot.event_type = cum.event_type),
     kept AS (SELECT event_type, c, n, s_all,
                     greatest(CAST(0 AS BIGINT),
                       least(cum, n - lo)
                         - greatest(cum_prev + 1, lo + 1) + 1) AS kept
              FROM k)
         SELECT event_type, max(n) AS n,
                CAST(sum(kept) AS BIGINT) AS n_trimmed,
                CAST(max(s_all) AS DOUBLE) / CAST(max(n) AS DOUBLE)
                  AS mean_c,
                CAST(CAST(sum(c * kept) AS BIGINT) AS DOUBLE)
                  / CAST(CAST(sum(kept) AS BIGINT) AS DOUBLE)
                  AS trimmed_mean_c,
                CAST(sum(c * kept) AS BIGINT)
                  // CAST(sum(kept) AS BIGINT) AS trimmed_floor_c
         FROM kept GROUP BY 1 ORDER BY event_type""",

    "emb_norm_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, embedding,
                  sqrt(${duckDot("embedding", "embedding")}) AS norm
           FROM embeddings),
     q AS (SELECT vec_id, label,
                  CAST(list_sum(list_transform(
                    generate_series(1, len(embedding)),
                    i -> abs(CAST(round(CAST(embedding[i] AS DOUBLE) / norm
                      * CAST(127 AS DOUBLE), 0) AS BIGINT)))) AS BIGINT)
                    AS nq
           FROM e WHERE norm > 0),
     st AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(nq) AS BIGINT) AS s1,
                   CAST(sum(CAST(nq AS HUGEINT) * nq) AS HUGEINT) AS s2
            FROM q GROUP BY 1),
     v AS (SELECT label, n, s1,
                  CAST(CAST(n AS HUGEINT) * s2
                    - CAST(s1 AS HUGEINT) * s1 AS BIGINT) AS var_num
           FROM st)
         SELECT q.vec_id, q.label, q.nq,
                CAST(v.n * q.nq - v.s1 AS DOUBLE)
                  / sqrt(CAST(v.var_num AS DOUBLE)) AS z
         FROM q JOIN v ON v.label = q.label
         WHERE v.var_num > 0
         ORDER BY abs(CAST(v.n * q.nq - v.s1 AS DOUBLE)
           / sqrt(CAST(v.var_num AS DOUBLE))) DESC, q.vec_id
         LIMIT 10""",

    "graph_butterflies" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
     w AS (SELECT a.p AS x, b.p AS y
           FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
     cn AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt
            FROM w GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(cnt) AS BIGINT) AS n_wedges,
                CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS n_butterflies,
                CAST(max(cnt) AS BIGINT) AS max_copairs
         FROM cn""",

    "ts_granger_screen" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS dt,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS pc,
                  CAST(sum(CASE WHEN event_type = 'click'
                    THEN CAST(round(value * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cc
           FROM events GROUP BY 1),
     l AS (SELECT pc AS y, lag(pc) OVER (ORDER BY dt) AS x1,
                  lag(cc) OVER (ORDER BY dt) AS x2
           FROM d),
     r AS (SELECT y, x1, x2 FROM l WHERE x1 IS NOT NULL),
     m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x1) AS BIGINT) AS s1,
                  CAST(sum(x2) AS BIGINT) AS s2,
                  CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
                  CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
                  CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
                  CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
                  CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
                  CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM r),
     c AS (SELECT n,
                  CAST(CAST(n * s11 - CAST(s1 AS HUGEINT) * s1 AS BIGINT) AS DOUBLE) AS c11,
                  CAST(CAST(n * s22 - CAST(s2 AS HUGEINT) * s2 AS BIGINT) AS DOUBLE) AS c22,
                  CAST(CAST(n * s12 - CAST(s1 AS HUGEINT) * s2 AS BIGINT) AS DOUBLE) AS c12,
                  CAST(CAST(n * s1y - CAST(s1 AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS c1y,
                  CAST(CAST(n * s2y - CAST(s2 AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS c2y,
                  CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS cyy
           FROM m),
     b AS (SELECT n, c1y, c2y, cyy, c11,
                  (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
                  (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
           FROM c)
         SELECT n, b1 AS beta_own_lag, b2 AS beta_click_lag,
                cyy - b1 * c1y - b2 * c2y AS sse_full,
                cyy - (c1y / c11) * c1y AS sse_restricted,
                ((cyy - (c1y / c11) * c1y) - (cyy - b1 * c1y - b2 * c2y))
                  / ((cyy - b1 * c1y - b2 * c2y)
                     / CAST(n - 3 AS DOUBLE)) AS f_stat
         FROM b""",

    "agg_simpson_check" ->
      """WITH j AS (SELECT p.p_brand,
                  CAST(round(l.l_discount * 100, 0) AS BIGINT) AS d,
                  CAST(l.l_quantity AS BIGINT) AS q
           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
     g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(d) AS BIGINT) AS sd,
                  CAST(sum(q) AS BIGINT) AS sq,
                  CAST(sum(CAST(d AS HUGEINT) * q) AS HUGEINT) AS sdq
           FROM j GROUP BY 1),
     gb AS (SELECT p_brand, n,
                   CAST(CAST(n AS HUGEINT) * sdq
                     - CAST(sd AS HUGEINT) * sq AS BIGINT) AS cov_num
            FROM g),
     p AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(d) AS BIGINT) AS sd,
                  CAST(sum(q) AS BIGINT) AS sq,
                  CAST(sum(CAST(d AS HUGEINT) * q) AS HUGEINT) AS sdq
           FROM j),
     ps AS (SELECT CAST(sign(CAST(CAST(n AS HUGEINT) * sdq
                     - CAST(sd AS HUGEINT) * sq AS BIGINT)) AS BIGINT)
                     AS pooled_sign
            FROM p)
         SELECT gb.p_brand, gb.n, gb.cov_num,
                CAST(sign(gb.cov_num) AS BIGINT) AS assoc_sign,
                ps.pooled_sign,
                sign(gb.cov_num) <> 0
                  AND CAST(sign(gb.cov_num) AS BIGINT) <> ps.pooled_sign
                  AS sign_flip
         FROM gb CROSS JOIN ps ORDER BY gb.p_brand""",

    "mm_image_entropy" -> {
      val lc = graft.functions.FixedLog2.sql("cnt")
      val ln = graft.functions.FixedLog2.sql("n_pixels")
      s"""WITH dims AS (SELECT doc_id,
                              CAST(1 + doc_id % 8 AS INT) AS width,
                              CAST(1 + n_chars % 8 AS INT) AS height
                       FROM documents),
              xs AS (SELECT doc_id, width, height,
                            unnest(range(0, CAST(width AS BIGINT))) AS x
                     FROM dims),
              xy AS (SELECT doc_id, width, height, x,
                            unnest(range(0, CAST(height AS BIGINT))) AS y
                     FROM xs),
              px AS (SELECT doc_id, width, height,
                            ((doc_id * 31 + x * 7 + y * 13) % 256) // 16
                              AS bin
                     FROM xy),
              bins AS (SELECT doc_id, width, height, bin,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM px GROUP BY 1, 2, 3, 4),
              g AS (SELECT doc_id AS media_id, width, height,
                           CAST(sum(cnt) AS BIGINT) AS n_pixels,
                           CAST(count(*) AS BIGINT) AS n_bins,
                           CAST(sum(CAST(cnt AS HUGEINT) * $lc) AS HUGEINT)
                             AS sclog
                    FROM bins GROUP BY 1, 2, 3)
          SELECT media_id, width, height, n_pixels, n_bins,
                 CAST(CAST(CAST(n_pixels AS HUGEINT) * $ln - sclog AS BIGINT) AS DOUBLE)
                   / CAST(n_pixels AS DOUBLE) / 1048576.0 AS entropy_bits
          FROM g ORDER BY media_id"""
    },

    "layout_ttl_sweep" ->
      """WITH d AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM events GROUP BY 1),
     c AS (SELECT CAST(max(CAST(dt AS DATE)) - 9 AS DATE) AS cutoff FROM d)
         SELECT d.dt, d.n_rows,
                CASE WHEN CAST(d.dt AS DATE) >= c.cutoff THEN 'kept'
                     ELSE 'dropped' END AS action,
                CASE WHEN CAST(d.dt AS DATE) >= c.cutoff THEN d.n_rows
                     ELSE 0 END AS n_kept
         FROM d CROSS JOIN c ORDER BY dt""",

    "ts_rolling_beta" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS dt,
                  CAST(sum(CASE WHEN event_type = 'click'
                    THEN CAST(round(value * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
                  CAST(sum(CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
     w AS (SELECT dt, x, y,
                  row_number() OVER (ORDER BY dt) AS rn,
                  CAST(sum(x) OVER tw AS BIGINT) AS sx,
                  CAST(sum(y) OVER tw AS BIGINT) AS sy,
                  CAST(sum(CAST(x AS HUGEINT) * x) OVER tw AS HUGEINT)
                    AS sxx,
                  CAST(sum(CAST(x AS HUGEINT) * y) OVER tw AS HUGEINT)
                    AS sxy
           FROM d WINDOW tw AS (ORDER BY dt
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
     v AS (SELECT dt, x, y,
                  CAST(CAST(10 * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS DOUBLE)
                    AS var_num,
                  CAST(CAST(10 * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS DOUBLE)
                    AS cov_num
           FROM w WHERE rn >= 10)
         SELECT dt, x, y,
                CASE WHEN var_num > 0 THEN cov_num / var_num END
                  AS beta_10d
         FROM v ORDER BY dt""",

    "mm_audio_silence" ->
      s"""WITH hx AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                      WHERE doc_id < 200 AND octet_length(encode(text)) > 0),
             b AS (SELECT media_id, nb, ${duckHexBytes("h")} AS bytes
                   FROM hx),
             w AS (SELECT media_id, nb, bytes,
                          CAST(unnest(generate_series(0,
                            CAST((nb - 1) // 32 AS INT))) AS INT)
                            AS window_idx
                   FROM b),
             e AS (SELECT media_id, window_idx,
                          CAST(list_sum(list_transform(
                            generate_series(window_idx * 32 + 1,
                              window_idx * 32 + least(64, nb - window_idx * 32)),
                            j -> (bytes[j] - 128) * (bytes[j] - 128)))
                            AS BIGINT) AS energy
                   FROM w),
             t AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_windows,
                          CAST(sum(energy) AS BIGINT) AS total_energy,
                          CAST(max(energy) AS BIGINT) AS max_energy
                   FROM e GROUP BY 1)
         SELECT e.media_id, t.n_windows,
                CAST(sum(CASE WHEN e.energy * t.n_windows < t.total_energy
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
                t.total_energy, t.max_energy
         FROM e JOIN t ON t.media_id = e.media_id
         GROUP BY 1, 2, 4, 5 ORDER BY e.media_id""",

    "agg_top_decile_share" ->
      """WITH ev AS (SELECT event_type,
                  CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
     cells AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
               FROM ev GROUP BY 1, 2),
     cum AS (SELECT event_type, c, cnt,
                    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             FROM cells),
     tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(c) AS BIGINT) AS s_all
             FROM ev GROUP BY 1),
     k AS (SELECT cum.event_type, cum.c, cum.cnt, cum.cum,
                  cum.cum - cum.cnt AS cum_prev,
                  tot.n, tot.s_all, tot.n // 10 AS lo
           FROM cum JOIN tot ON tot.event_type = cum.event_type),
     kept AS (SELECT event_type, c, n, s_all,
                     greatest(CAST(0 AS BIGINT),
                       least(cum, n)
                         - greatest(cum_prev + 1, n - lo + 1) + 1) AS kept
              FROM k)
         SELECT event_type, max(n) AS n,
                CAST(sum(kept) AS BIGINT) AS n_top,
                CAST(sum(c * kept) AS BIGINT) AS top_sum,
                CAST((1000000 * CAST(sum(c * kept) AS HUGEINT))
                  // max(s_all) AS BIGINT) AS share_ppm,
                CAST(CAST(sum(c * kept) AS BIGINT) AS DOUBLE)
                  / CAST(max(s_all) AS DOUBLE) AS share
         FROM kept GROUP BY 1 ORDER BY event_type""",

    "sketch_linear_counting" -> {
      val lm = graft.functions.FixedLog2.sql("1024")
      val lz = graft.functions.FixedLog2.sql("z")
      s"""WITH h AS (SELECT event_type, user_id,
                  ((((user_id % 2147483647) * 1103515245 + 12345)
                     % 2147483647)
                   * (((user_id % 2147483647) * 1103515245 + 12345)
                     % 2147483647)) % 2147483647 AS hm
           FROM events),
     p AS (SELECT event_type, user_id,
                  ((hm * 69069 + 362437) % 2147483647) % 1024 AS p
           FROM h),
     o AS (SELECT event_type,
                  CAST(count(DISTINCT p) AS BIGINT) AS occupied,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
           FROM p GROUP BY 1),
     z AS (SELECT event_type, n_true, 1024 - occupied AS z FROM o),
     e AS (SELECT event_type, n_true, z,
                  CASE WHEN z > 0 THEN 1024 * ($lm - $lz) END AS est_bits
           FROM z)
         SELECT event_type, CAST(1024 AS BIGINT) AS m,
                CAST(z AS BIGINT) AS z, n_true,
                CAST(est_bits AS DOUBLE) * 0.6931471805599453 / 1048576.0
                  AS est_lc
         FROM e ORDER BY event_type"""
    },

    "graph_transition_reciprocity" ->
      """WITH pr AS (SELECT user_id, event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS b
           FROM events),
     c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
           FROM pr WHERE b IS NOT NULL AND b <> a GROUP BY 1, 2),
     j AS (SELECT c.a, c.b, c.c_ab, r.c_ab AS c_ba
           FROM c LEFT JOIN c r ON r.a = c.b AND r.b = c.a)
         SELECT CAST(count(*) AS BIGINT) AS n_directed,
                CAST(sum(CASE WHEN c_ba IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_reciprocated,
                CAST((1000000 * sum(CASE WHEN c_ba IS NOT NULL
                       THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
                  AS r_binary_ppm,
                CAST(sum(c_ab) AS BIGINT) AS w_total,
                CAST(sum(least(c_ab, coalesce(c_ba, 0))) AS BIGINT)
                  AS w_min,
                CAST((1000000 * sum(least(c_ab, coalesce(c_ba, 0))))
                  // sum(c_ab) AS BIGINT) AS r_weighted_ppm
         FROM j""",

    "ts_adf_screen" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS p
           FROM events GROUP BY 1, 2),
     r0 AS (SELECT event_type, dt, p,
                   lag(p) OVER k AS x1,
                   CAST(row_number() OVER k AS BIGINT) AS x2
            FROM d WINDOW k AS (PARTITION BY event_type ORDER BY dt)),
     r AS (SELECT event_type, p - x1 AS y, x1, x2
           FROM r0 WHERE x1 IS NOT NULL),
     m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x1) AS BIGINT) AS s1,
                  CAST(sum(x2) AS BIGINT) AS s2,
                  CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
                  CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
                  CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
                  CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
                  CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
                  CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM r GROUP BY 1),
     c AS (SELECT event_type, n,
                  CAST(CAST(n * s11 - CAST(s1 AS HUGEINT) * s1 AS BIGINT) AS DOUBLE) AS c11,
                  CAST(CAST(n * s22 - CAST(s2 AS HUGEINT) * s2 AS BIGINT) AS DOUBLE) AS c22,
                  CAST(CAST(n * s12 - CAST(s1 AS HUGEINT) * s2 AS BIGINT) AS DOUBLE) AS c12,
                  CAST(CAST(n * s1y - CAST(s1 AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS c1y,
                  CAST(CAST(n * s2y - CAST(s2 AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS c2y,
                  CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS BIGINT) AS DOUBLE) AS cyy
           FROM m),
     b AS (SELECT event_type, n, c1y, c2y, cyy, c11, c22, c12,
                  c11 * c22 - c12 * c12 AS det,
                  (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
                  (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
           FROM c)
         SELECT event_type, n, b1 AS gamma, b2 AS trend,
                b1 / sqrt(((cyy - b1 * c1y - b2 * c2y)
                  / (CAST(n AS DOUBLE) * CAST(n - 3 AS DOUBLE)))
                  * CAST(n AS DOUBLE) * c22 / det) AS t_stat
         FROM b ORDER BY event_type""",

    "ts_runs_test" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS p
           FROM events GROUP BY 1, 2),
     s0 AS (SELECT event_type, dt, p,
                   lag(p) OVER (PARTITION BY event_type ORDER BY dt)
                     AS prev
            FROM d),
     s AS (SELECT event_type, dt,
                  CASE WHEN p > prev THEN 1 ELSE -1 END AS sgn
           FROM s0 WHERE prev IS NOT NULL AND p <> prev),
     s2 AS (SELECT event_type, sgn,
                   lag(sgn) OVER (PARTITION BY event_type ORDER BY dt)
                     AS prev_sgn
            FROM s),
     g AS (SELECT event_type,
                  CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
                  CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
                  CAST(sum(CASE WHEN prev_sgn IS NULL OR sgn <> prev_sgn
                    THEN 1 ELSE 0 END) AS BIGINT) AS runs
           FROM s2 GROUP BY 1)
         SELECT event_type, n1, n2, runs,
                (CAST(runs AS DOUBLE)
                 - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    / CAST(n1 + n2 AS DOUBLE) + 1.0))
                / sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                           - CAST(n1 + n2 AS DOUBLE)))
                       / (CAST(n1 + n2 AS DOUBLE)
                          * CAST(n1 + n2 AS DOUBLE)
                          * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS z
         FROM g ORDER BY event_type""",

    "agg_hash_uniformity_ks" ->
      """WITH h AS (SELECT ((((event_id % 2147483647) * 1103515245
                     + 12345) % 2147483647)
                   * (((event_id % 2147483647) * 1103515245 + 12345)
                     % 2147483647)) % 2147483647 AS hm
           FROM events),
     u AS (SELECT ((hm * 69069 + 362437) % 2147483647) % 1000000 AS u
           FROM h),
     cells AS (SELECT u, CAST(count(*) AS BIGINT) AS cnt
               FROM u GROUP BY 1),
     cum AS (SELECT u, cnt,
                    CAST(sum(cnt) OVER (ORDER BY u
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             FROM cells),
     tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
     d AS (SELECT t.n,
                  greatest(abs(c.cum * 1000000 - t.n * (c.u + 1)),
                           abs((c.cum - c.cnt) * 1000000 - t.n * c.u))
                    AS dn
           FROM cum c CROSS JOIN tot t)
         SELECT n, CAST(max(dn) AS BIGINT) AS d_num,
                CAST(max(dn) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 1000000.0) AS d_stat,
                (CAST(max(dn) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * 1000000.0))
                  * sqrt(CAST(n AS DOUBLE)) AS d_sqrt_n
         FROM d GROUP BY 1""",

    "stream_volume_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
     w AS (SELECT event_type, dt, n,
                  count(*) OVER tw AS wn,
                  CAST(sum(n) OVER tw AS BIGINT) AS s1,
                  CAST(sum(n * n) OVER tw AS BIGINT) AS s2
           FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY dt
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, dt, n, s1 AS trail_sum,
                7 * s2 - s1 * s1 AS var_num,
                CASE WHEN 7 * s2 - s1 * s1 > 0
                     THEN CAST(7 * n - s1 AS DOUBLE)
                       / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE)) END AS z,
                CASE WHEN 7 * s2 - s1 * s1 > 0
                     THEN abs(CAST(7 * n - s1 AS DOUBLE)
                       / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE))) > 3.0
                END AS is_anomaly
         FROM w WHERE wn = 7 ORDER BY event_type, dt""",

    "agg_mde_power" ->
      """WITH st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS sc,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                         * CAST(round(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS ss
           FROM events GROUP BY 1),
     v AS (SELECT event_type, n, sc, n // 2 AS n_arm,
                  CAST(CAST(CAST(n AS HUGEINT) * ss
                       - CAST(sc AS HUGEINT) * sc AS BIGINT) AS DOUBLE)
                    / CAST(n * (n - 1) AS DOUBLE) AS var_c
           FROM st)
         SELECT event_type, n, n_arm,
                CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                  AS mean_value,
                var_c / 10000.0 AS var_value,
                (1.96 + 0.8416) * sqrt(2.0 * var_c
                  / CAST(n_arm AS DOUBLE)) / 100.0 AS mde_abs,
                (1.96 + 0.8416) * sqrt(2.0 * var_c
                  / CAST(n_arm AS DOUBLE))
                  / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_rel
         FROM v ORDER BY event_type""",

    "ts_markov_holding" ->
      """WITH p AS (SELECT event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS b
           FROM events),
     g AS (SELECT a, CAST(count(*) AS BIGINT) AS c_total,
                  CAST(sum(CASE WHEN b = a THEN 1 ELSE 0 END) AS BIGINT)
                    AS c_self
           FROM p WHERE b IS NOT NULL GROUP BY 1)
         SELECT a AS state, c_total, c_self,
                (1000000 * c_self) // c_total AS p_self_ppm,
                (1000000 * c_total) // (c_total - c_self)
                  AS hold_steps_ppm,
                CAST(c_total AS DOUBLE)
                  / CAST(c_total - c_self AS DOUBLE) AS hold_steps
         FROM g WHERE c_total > c_self ORDER BY state""",

    "dq_doc_length_outliers" ->
      """WITH v AS (SELECT source, doc_id, n_chars FROM documents),
     n AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM v GROUP BY 1),
     r AS (SELECT v.source, v.n_chars,
                  row_number() OVER (PARTITION BY v.source
                    ORDER BY v.n_chars, v.doc_id) AS rn, n.n
           FROM v JOIN n ON n.source = v.source),
     med AS (SELECT source, n_chars AS med_len FROM r
             WHERE rn = (n + 1) // 2),
     dev AS (SELECT v.source, v.doc_id,
                    abs(v.n_chars - med.med_len) AS adev, med.med_len
             FROM v JOIN med ON med.source = v.source),
     r2 AS (SELECT dev.source, dev.adev,
                   row_number() OVER (PARTITION BY dev.source
                     ORDER BY dev.adev, dev.doc_id) AS rn, n.n
            FROM dev JOIN n ON n.source = dev.source),
     mad AS (SELECT source, adev AS mad_len FROM r2
             WHERE rn = (n + 1) // 2)
         SELECT dev.source, CAST(count(*) AS BIGINT) AS n_docs,
                max(dev.med_len) AS med_len,
                max(mad.mad_len) AS mad_len,
                CAST(sum(CASE WHEN dev.adev * 10000
                       > mad.mad_len * 3 * 14826
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dev JOIN mad ON mad.source = dev.source
         GROUP BY 1 ORDER BY dev.source""",

    "emb_intrinsic_dim" -> {
      val planeLits = graft.similarity.HyperplaneLsh.planes(4, 64)
        .map(_.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]"))
      val bits = planeLits.zipWithIndex.map { case (pl, i) =>
        s"CASE WHEN ${duckDot("embedding", pl)} > 0 THEN ${1L << i} ELSE 0 END"
      }.mkString(" + ")
      val lmu = graft.functions.FixedLog2.sql("mu_ppm")
      val lone = graft.functions.FixedLog2.sql("1000000")
      s"""WITH b AS (SELECT vec_id, embedding, $bits AS bucket
                     FROM embeddings),
              pairs AS (SELECT a.vec_id AS va, b2.vec_id AS vb,
                          1.0 - ${duckDot("a.embedding", "b2.embedding")}
                            / (sqrt(${duckDot("a.embedding", "a.embedding")})
                               * sqrt(${duckDot("b2.embedding",
                                 "b2.embedding")})) AS dist
                        FROM b a JOIN b b2 ON a.bucket = b2.bucket
                                           AND a.vec_id <> b2.vec_id),
              r AS (SELECT va, dist,
                           row_number() OVER (PARTITION BY va
                             ORDER BY dist, vb) AS rk
                    FROM pairs QUALIFY rk <= 2),
              two AS (SELECT va,
                             max(CASE WHEN rk = 1 THEN dist END) AS r1,
                             max(CASE WHEN rk = 2 THEN dist END) AS r2
                      FROM r GROUP BY 1),
              mu AS (SELECT va,
                            CAST(floor(r2 / r1 * 1000000) AS BIGINT)
                              AS mu_ppm
                     FROM two
                     WHERE r1 > 0 AND r2 IS NOT NULL),
              f AS (SELECT va, mu_ppm FROM mu WHERE mu_ppm > 1000000),
              g AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
                           CAST(sum($lmu - $lone) AS BIGINT)
                             AS denom_bits
                    FROM f)
          SELECT n_points, denom_bits,
                 CAST(n_points AS DOUBLE) * 1048576.0
                   / (CAST(denom_bits AS DOUBLE) * 0.6931471805599453)
                   AS id_hat
          FROM g"""
    },

    "agg_sprt_monitor" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
     r AS (SELECT event_type, dt, x,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY dt) AS rn
           FROM d),
     base AS (SELECT event_type,
                     CAST(sum(x) AS BIGINT) // 10 AS mu0,
                     CAST(10 * sum(CAST(x AS HUGEINT) * x)
                       - CAST(sum(x) AS HUGEINT) * sum(x) AS BIGINT)
                       AS var_num
              FROM r WHERE rn <= 10 GROUP BY 1),
     b2 AS (SELECT event_type, mu0, mu0 + mu0 // 20 AS mu1, var_num
            FROM base),
     sc AS (SELECT r.event_type, r.dt, r.x, b2.var_num,
                   2 * (b2.mu1 - b2.mu0) * r.x
                     - (b2.mu1 * b2.mu1 - b2.mu0 * b2.mu0) AS term
            FROM r JOIN b2 ON b2.event_type = r.event_type
            WHERE r.rn >= 11),
     cumq AS (SELECT event_type, dt, x, var_num,
                     CAST(sum(term) OVER (PARTITION BY event_type
                       ORDER BY dt ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_score
              FROM sc)
         SELECT event_type, dt, x, cum_score,
                CASE WHEN CAST(cum_score AS DOUBLE)
                       >= 2.0 * (CAST(var_num AS DOUBLE) / 90.0)
                          * 2.9444389791664403 THEN 'accept_lift'
                     WHEN CAST(cum_score AS DOUBLE)
                       <= -(2.0 * (CAST(var_num AS DOUBLE) / 90.0)
                          * 2.9444389791664403) THEN 'accept_baseline'
                     ELSE 'continue' END AS decision
         FROM cumq ORDER BY event_type, dt""",

    "ts_seasonal_mann_kendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS dt,
                  CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS x,
                  CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow
           FROM events GROUP BY 1, 2, 4),
     sp AS (SELECT a.event_type,
                   CAST(sum(CASE WHEN b.x > a.x THEN 1
                                 WHEN b.x < a.x THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND b.dow = a.dow
                 AND a.dt < b.dt
            GROUP BY 1),
     tc AS (SELECT event_type, dow, x, count(*) AS t
            FROM daily GROUP BY 1, 2, 3),
     st AS (SELECT event_type, dow, CAST(sum(t) AS BIGINT) AS n_d,
                   CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT)
                     AS tie18
            FROM tc GROUP BY 1, 2),
     v AS (SELECT event_type, CAST(sum(n_d) AS BIGINT) AS n_days,
                  CAST(sum(n_d * (n_d - 1) * (n_d * 2 + 5) - tie18)
                    AS BIGINT) AS var18
           FROM st GROUP BY 1),
     j AS (SELECT s.event_type, v.n_days, s.s_stat, v.var18,
                  CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                       WHEN s.s_stat < 0 THEN s.s_stat + 1
                       ELSE 0 END AS s_adj
           FROM sp s JOIN v ON v.event_type = s.event_type)
         SELECT event_type, n_days, s_stat, var18,
                CAST(s_adj AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0) AS z
         FROM j ORDER BY event_type""",

    "olap_abc_migration" ->
      """WITH li AS (SELECT l_partkey,
                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
                  l_shipdate
           FROM lineitem),
     r1 AS (SELECT l_partkey, CAST(sum(c) AS BIGINT) AS cents
            FROM li WHERE l_shipdate < DATE '1995-01-01' GROUP BY 1),
     t1 AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM r1),
     c1 AS (SELECT r1.l_partkey,
                   CASE WHEN CAST(sum(r1.cents) OVER (ORDER BY r1.cents
                       DESC, r1.l_partkey ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) * 100 <= t1.total_cents * 80 THEN 'A'
                        WHEN CAST(sum(r1.cents) OVER (ORDER BY r1.cents
                       DESC, r1.l_partkey ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) * 100 <= t1.total_cents * 95 THEN 'B'
                        ELSE 'C' END AS class_h1
            FROM r1 CROSS JOIN t1),
     r2 AS (SELECT l_partkey, CAST(sum(c) AS BIGINT) AS cents
            FROM li WHERE l_shipdate >= DATE '1995-01-01' GROUP BY 1),
     t2 AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM r2),
     c2 AS (SELECT r2.l_partkey,
                   CASE WHEN CAST(sum(r2.cents) OVER (ORDER BY r2.cents
                       DESC, r2.l_partkey ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) * 100 <= t2.total_cents * 80 THEN 'A'
                        WHEN CAST(sum(r2.cents) OVER (ORDER BY r2.cents
                       DESC, r2.l_partkey ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) * 100 <= t2.total_cents * 95 THEN 'B'
                        ELSE 'C' END AS class_h2
            FROM r2 CROSS JOIN t2)
         SELECT c1.class_h1, c2.class_h2,
                CAST(count(*) AS BIGINT) AS n_parts
         FROM c1 JOIN c2 ON c2.l_partkey = c1.l_partkey
         GROUP BY 1, 2 ORDER BY class_h1, class_h2""",

    "graph_knn_degree_curve" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
     e AS (SELECT DISTINCT a.p AS u, b.p AS v
           FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
     sym AS (SELECT u AS c, v AS x FROM e
             UNION ALL SELECT v, u FROM e),
     deg AS (SELECT c, CAST(count(*) AS BIGINT) AS dc
             FROM sym GROUP BY 1),
     j AS (SELECT d1.dc AS deg_c, d2.dc AS deg_x
           FROM sym s JOIN deg d1 ON d1.c = s.c
                      JOIN deg d2 ON d2.c = s.x),
     g AS (SELECT CAST(length(bin(deg_c)) - 1 AS BIGINT)
                    AS log2_degree,
                  CAST(count(*) AS BIGINT) AS n_edges,
                  CAST(sum(deg_x) AS BIGINT) AS sum_nb_deg
           FROM j GROUP BY 1)
         SELECT log2_degree, n_edges, sum_nb_deg,
                sum_nb_deg // n_edges AS knn_floor,
                CAST(sum_nb_deg AS DOUBLE) / CAST(n_edges AS DOUBLE)
                  AS knn
         FROM g ORDER BY log2_degree""",

    "mine_transition_2step" ->
      """WITH p AS (SELECT event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS b
           FROM events),
     c1 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
            FROM p WHERE b IS NOT NULL GROUP BY 1, 2),
     n2 AS (SELECT x.a, y.b AS c,
                   CAST(sum(CAST(x.c_ab AS HUGEINT) * y.c_ab) AS BIGINT)
                     AS n2
            FROM c1 x JOIN c1 y ON y.a = x.b
            GROUP BY 1, 2),
     rt AS (SELECT a, CAST(sum(n2) AS BIGINT) AS row_total
            FROM n2 GROUP BY 1)
         SELECT n2.a, n2.c, n2.n2,
                CAST((1000000 * CAST(n2.n2 AS HUGEINT)) // rt.row_total
                  AS BIGINT) AS p2_ppm,
                CAST(n2.n2 AS DOUBLE) / CAST(rt.row_total AS DOUBLE)
                  AS p2
         FROM n2 JOIN rt ON rt.a = n2.a
         ORDER BY n2.a, n2.c""",
  )

  /** DuckDB fragment: decode a hex-string column `h` (as produced by
    * `hex(encode(text))`) into its list of byte values — the portable way
    * to enumerate UTF-8 bytes in DuckDB SQL, byte-exact vs Spark's
    * `cast(text as binary)` payloads even on non-ASCII text.
    */
  private def duckHexBytes(h: String): String =
    s"list_transform(generate_series(1, CAST(length($h) // 2 AS INT)), i -> " +
      s"CAST((strpos('0123456789ABCDEF', substr($h, 2 * i - 1, 1)) - 1) * 16 " +
      s"+ (strpos('0123456789ABCDEF', substr($h, 2 * i, 1)) - 1) AS BIGINT))"

  /** DuckDB CTE chain replaying graft.sources.SeriesGen exactly: spread
    * hash of (symbol fold * 31 + epoch day), five affine→square→affine
    * mixes in exact BIGINT steps, prices as cents / 100 with one
    * int→double conversion + one IEEE division. Terminal CTE is `bars`
    * (symbol, trade_date, open, high, low, close, volume).
    */
  private def duckSeriesBars(symVals: String, start: String, end: String): String =
    s"""syms AS (SELECT * FROM (VALUES $symVals) s(symbol)),
              days AS (SELECT CAST(d AS DATE) AS trade_date
                       FROM generate_series(DATE '$start', DATE '$end',
                                            INTERVAL 1 DAY) t(d)
                       WHERE isodow(CAST(d AS DATE)) <= 5),
              b0 AS (SELECT symbol, trade_date,
                       (list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(symbol, ''),
                            ch -> CAST(ascii(ch) AS BIGINT))),
                          (h, c) -> (h * 31 + c) % 2147483647) * 31
                        + (trade_date - DATE '1970-01-01')) % 2147483647 AS x
                     FROM syms, days),
              s1 AS (SELECT *, (x * 1103515245 + 12345) % 2147483647 AS t0 FROM b0),
              s2 AS (SELECT symbol, trade_date,
                       ((t0 * t0) % 2147483647 * 69069 + 362437) % 2147483647 AS seed
                     FROM s1),
              s3 AS (SELECT *,
                       (((seed + 1) % 2147483647) * 1103515245 + 12345) % 2147483647 AS t1,
                       (((seed + 2) % 2147483647) * 1103515245 + 12345) % 2147483647 AS t2,
                       (((seed + 3) % 2147483647) * 1103515245 + 12345) % 2147483647 AS t3,
                       (((seed + 4) % 2147483647) * 1103515245 + 12345) % 2147483647 AS t4
                     FROM s2),
              s4 AS (SELECT symbol, trade_date, seed,
                       ((t1 * t1) % 2147483647 * 69069 + 362437) % 2147483647 AS m1,
                       ((t2 * t2) % 2147483647 * 69069 + 362437) % 2147483647 AS m2,
                       ((t3 * t3) % 2147483647 * 69069 + 362437) % 2147483647 AS m3,
                       ((t4 * t4) % 2147483647 * 69069 + 362437) % 2147483647 AS m4
                     FROM s3),
              s5 AS (SELECT symbol, trade_date,
                       10000 + seed % 90000 AS open_c,
                       10000 + m1 % 90000 AS close_c,
                       m2 % 500 AS hi_m, m3 % 500 AS lo_m,
                       1000000 + m4 % 9000000 AS vol
                     FROM s4),
              s6 AS (SELECT *, greatest(open_c, close_c) + hi_m AS high_c,
                       least(open_c, close_c) - lo_m AS low_c
                     FROM s5),
              bars AS (SELECT symbol, trade_date,
                       CAST(open_c AS DOUBLE) / CAST(100 AS DOUBLE) AS open,
                       CAST(high_c AS DOUBLE) / CAST(100 AS DOUBLE) AS high,
                       CAST(low_c AS DOUBLE) / CAST(100 AS DOUBLE) AS low,
                       CAST(close_c AS DOUBLE) / CAST(100 AS DOUBLE) AS close,
                       CAST(vol AS BIGINT) AS volume
                     FROM s6)"""

  /** DuckDB fragment: per-token portable polynomial hashes of `text`. */
  private val duckTokHashes: String =
    "list_transform(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+'), t -> " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(t, ''), ch -> CAST(ascii(ch) AS BIGINT))), " +
      "(h, c) -> (h * 31 + c) % 2147483647))"

  /** DuckDB fragment: 32-bit simhash from a token-hash list column `th`.
    * The outer CAST pins the arrow type to int64: DuckDB types `list_sum`
    * as HUGEINT (arrow decimal128), which hash-mismatches Spark's BIGINT
    * even when every value is identical.
    */
  private val duckSimhash: String =
    "CAST(list_sum(list_transform(generate_series(0, 31), b -> " +
      "CASE WHEN list_sum(list_transform(th, x -> " +
      "CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
      "THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT)"

  /** DuckDB fragment: sequential-fold dot product in double precision —
    * the same accumulation order as graft.functions.VecOps.dotProduct, so
    * the doubles agree bitwise.
    */
  /** Shared oracle for banded SimHash near-dup pairs: identical semantics
    * for the batch self-join (dedup_simhash_banded) and the streaming
    * stateful detector (stream_lsh_neardup), whose emitted pair set is
    * batch-boundary-invariant by construction.
    */
  private lazy val bandedPairsOracle: String =
    s"""WITH h AS (SELECT doc_id, $duckTokHashes AS th FROM documents),
          s AS (SELECT doc_id, $duckSimhash AS simhash FROM h),
          b AS (SELECT doc_id, simhash, 0 AS band,
                       simhash & 65535 AS key FROM s
                UNION ALL
                SELECT doc_id, simhash, 1,
                       (simhash >> 16) & 65535 FROM s),
          cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                          x.simhash AS sh_a, y.simhash AS sh_b
                   FROM b x JOIN b y
                     ON x.band = y.band AND x.key = y.key
                        AND x.doc_id < y.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sh_a, sh_b)) <= 1
        ORDER BY doc_a, doc_b"""

  /** Shared oracle for the admission gate: identical semantics for
    * the batch query and its per-micro-batch streamed form.
    */
  private lazy val qualityGateOracle: String = {
      val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      def markers(lang: String) = TextAnalysis.langMarkers.toMap.apply(lang)
        .map(s => s"'$s'").mkString("[", ", ", "]")
      val scoreCols = TextAnalysis.langMarkers.map { case (lang, _) =>
        s"CAST(len(list_filter(toks, t -> list_contains(${markers(lang)}, t))) AS BIGINT) AS score_$lang"
      }.mkString(",\n                 ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val cascade = langs.map { lang =>
        val beats = langs.filter(_ != lang)
          .map(o => s"score_$lang >= score_$o").mkString(" AND ")
        s"WHEN score_$lang > 0 AND $beats THEN '$lang'"
      }.mkString("\n                 ")
      s"""WITH t AS (SELECT doc_id, lang, n_chars, text,
                regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9]+') AS toks
              FROM documents),
              q AS (SELECT doc_id, lang, n_chars,
                           CAST(len(toks) AS BIGINT) AS n_tokens,
                           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                             AS DOUBLE) / CAST(length(text) AS DOUBLE)
                             AS punct_ratio,
                           CASE WHEN len(toks) > 0 THEN
                             CAST(len(list_filter(toks,
                               t -> list_contains($stops, t))) AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                           ELSE 0.0 END AS stopword_ratio,
                           $scoreCols
                    FROM t),
              g AS (SELECT doc_id, lang, n_chars,
                           least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                             + (1.0 - punct_ratio) * 0.3
                             + stopword_ratio * 0.3 AS quality_score,
                           CASE $cascade
                           ELSE 'und' END AS predicted_lang
                    FROM q),
              rr AS (SELECT lang, n_chars,
                            CASE WHEN n_chars < 50 THEN 'too_short'
                                 WHEN quality_score < 0.5 THEN 'low_quality'
                                 WHEN predicted_lang <> lang
                                   THEN 'lang_mismatch'
                                 ELSE 'accept' END AS reason
                     FROM g)
         SELECT lang, reason, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM rr GROUP BY 1, 2 ORDER BY 1, 2"""
    }

  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  /** 16-element subspace dot at 0-based element offset `off` into two
    * full vectors — same ascending fold as duckDot / VecOps.dot.
    */
  private def duckDotSub(a: String, b: String, off: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, 16), i -> " +
      s"CAST($a[$off + i] AS DOUBLE) * CAST($b[$off + i] AS DOUBLE))), " +
      s"(x, y) -> x + y)"
}
