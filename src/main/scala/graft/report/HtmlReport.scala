package graft.report

import java.util.Locale

import org.apache.spark.sql.DataFrame

/** S6 HTML report sink (reference: `data_viz.py` + `to_github_pages.py` —
  * a title block plus one line chart per series with its SMAs, published
  * as a static page). Engine-side equivalent with zero dependencies: the
  * report frame renders to one self-contained HTML document with an
  * inline-SVG polyline chart per numeric column and the data table.
  *
  * Scale posture: a report frame is small BY CONSTRUCTION (one row per
  * business day — a decade is ~2.5k rows regardless of tick volume), so
  * collecting it at the driver is the correct plan; everything upstream
  * (the OHLC/SMA pipeline) stays distributed. The git-publish step stays
  * outside the engine, exactly as Airflow/cron stay outside the reference
  * ETL.
  *
  * Rendering is deterministic: Locale.ROOT, fixed decimal formatting,
  * stable column order — the same frame always yields byte-identical
  * HTML (spec-pinned), so a publish step can diff meaningfully.
  */
object HtmlReport {

  private def fmt(v: Double): String = "%.4f".formatLocal(Locale.ROOT, v)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One polyline chart: x = row index, y scaled into the viewbox; nulls
    * break the line (segments render between consecutive present points).
    */
  private def svgChart(name: String, ys: Seq[Option[Double]],
                       w: Int = 640, h: Int = 160): String = {
    val present = ys.flatten
    if (present.isEmpty) return s"<svg data-series='${esc(name)}'></svg>"
    val (lo, hi) = (present.min, present.max)
    val span = if (hi > lo) hi - lo else 1.0
    val n = math.max(ys.size - 1, 1)
    val pts = ys.zipWithIndex.collect { case (Some(v), i) =>
      val x = i.toDouble * w / n
      val y = h - (v - lo) / span * h
      s"${fmt(x)},${fmt(y)}"
    }
    s"""<figure><figcaption>${esc(name)}</figcaption>
       |<svg viewBox="0 0 $w $h" width="$w" height="$h"
       |     data-series="${esc(name)}" data-points="${pts.size}">
       |<polyline fill="none" stroke="#444444" stroke-width="1"
       |          points="${pts.mkString(" ")}"/>
       |</svg></figure>""".stripMargin
  }

  /** Fixed deterministic stroke palette (the reference cycles a COLORS
    * list the same way, data_viz.py:31).
    */
  private val Colors =
    Seq("#444444", "#8a4444", "#44448a", "#448a44", "#888888", "#bbaa44")

  /** Multi-series polyline chart sharing one y-scale — the 'Line' figure
    * variant (close + its SMA overlays, data_viz.py:57-72).
    */
  private def svgLines(name: String,
                       series: Seq[(String, Seq[Option[Double]])],
                       w: Int = 640, h: Int = 160): String = {
    val present = series.flatMap(_._2.flatten)
    if (present.isEmpty) return s"<svg data-series='${esc(name)}'></svg>"
    val (lo, hi) = (present.min, present.max)
    val span = if (hi > lo) hi - lo else 1.0
    val lines = series.zipWithIndex.map { case ((nm, ys), si) =>
      val n = math.max(ys.size - 1, 1)
      val pts = ys.zipWithIndex.collect { case (Some(v), i) =>
        s"${fmt(i.toDouble * w / n)},${fmt(h - (v - lo) / span * h)}"
      }
      s"""<polyline fill="none" stroke="${Colors(si % Colors.size)}"
         |          stroke-width="${if (si == 0) 2 else 1}"
         |          data-line="${esc(nm)}" data-points="${pts.size}"
         |          points="${pts.mkString(" ")}"/>""".stripMargin
    }
    s"""<figure><figcaption>${esc(name)}</figcaption>
       |<svg viewBox="0 0 $w $h" width="$w" height="$h"
       |     data-series="${esc(name)}">
       |${lines.mkString("\n")}
       |</svg></figure>""".stripMargin
  }

  /** Candlestick or OHLC-glyph chart (reference data_viz.py:41-56): one
    * (open, high, low, close) tuple per slot plus optional overlay lines
    * (the SMA traces the reference adds to every price figure). `glyph =
    * false` draws candle bodies (hollow = rising, filled = falling);
    * `glyph = true` draws the open/close side-tick form. The y-scale
    * spans lows..highs and all overlay values so every mark is inside
    * the viewbox.
    */
  private def svgCandles(name: String,
                         bars: Seq[(Double, Double, Double, Double)],
                         overlays: Seq[(String, Seq[Option[Double]])],
                         glyph: Boolean, w: Int = 640,
                         h: Int = 160): String = {
    if (bars.isEmpty) return s"<svg data-series='${esc(name)}'></svg>"
    val present = bars.flatMap(b => Seq(b._2, b._3)) ++
      overlays.flatMap(_._2.flatten)
    val (lo, hi) = (present.min, present.max)
    val span = if (hi > lo) hi - lo else 1.0
    def y(v: Double): Double = h - (v - lo) / span * h
    val slot = w.toDouble / bars.size
    val bw = math.max(slot * 0.35, 1.0)
    val marks = bars.zipWithIndex.map { case ((o, hh, ll, c), i) =>
      val cx = (i + 0.5) * slot
      val dir = if (c >= o) "up" else "down"
      val wick =
        s"""<line x1="${fmt(cx)}" y1="${fmt(y(hh))}" x2="${fmt(cx)}"
           |      y2="${fmt(y(ll))}" stroke="#444444"/>""".stripMargin
      if (glyph) {
        // OHLC form: left tick = open, right tick = close
        wick +
          s"""<line x1="${fmt(cx - bw)}" y1="${fmt(y(o))}" x2="${fmt(cx)}"
             |      y2="${fmt(y(o))}" stroke="#444444" data-tick="o"/>
             |<line x1="${fmt(cx)}" y1="${fmt(y(c))}" x2="${fmt(cx + bw)}"
             |      y2="${fmt(y(c))}" stroke="#444444" data-tick="c"/>"""
            .stripMargin
      } else {
        val top = math.min(y(o), y(c))
        val hgt = math.abs(y(o) - y(c))
        val fill = if (c >= o) "#ffffff" else "#444444"
        wick +
          s"""<rect x="${fmt(cx - bw)}" y="${fmt(top)}"
             |      width="${fmt(2 * bw)}" height="${fmt(hgt)}"
             |      fill="$fill" stroke="#444444" class="$dir"/>"""
            .stripMargin
      }
    }
    val overlayLines = overlays.zipWithIndex.map { case ((nm, ys), si) =>
      val pts = ys.zipWithIndex.collect { case (Some(v), i) =>
        s"${fmt((i + 0.5) * slot)},${fmt(y(v))}"
      }
      s"""<polyline fill="none" stroke="${Colors((si + 1) % Colors.size)}"
         |          stroke-width="1" data-line="${esc(nm)}"
         |          data-points="${pts.size}"
         |          points="${pts.mkString(" ")}"/>""".stripMargin
    }
    val kind = if (glyph) "ohlc" else "candlestick"
    s"""<figure><figcaption>${esc(name)}</figcaption>
       |<svg viewBox="0 0 $w $h" width="$w" height="$h"
       |     data-series="${esc(name)}" data-kind="$kind"
       |     data-candles="${bars.size}">
       |${marks.mkString("\n")}
       |${overlayLines.mkString("\n")}
       |</svg></figure>""".stripMargin
  }

  /** Dual-axis comparison figure (reference ComparisonFigure,
    * data_viz.py:9-38 with secondary_y): left-axis series and right-axis
    * series share the x slots but carry INDEPENDENT y-scales, each
    * annotated with its own min/max labels. The first series of each
    * side is the highlighted (width-2) trace, like the reference's
    * subplot_num width rule.
    */
  private def svgDualAxis(name: String,
                          left: Seq[(String, Seq[Option[Double]])],
                          right: Seq[(String, Seq[Option[Double]])],
                          w: Int = 640, h: Int = 160): String = {
    def scaleOf(ss: Seq[(String, Seq[Option[Double]])]): (Double, Double) = {
      val present = ss.flatMap(_._2.flatten)
      if (present.isEmpty) (0.0, 1.0)
      else (present.min,
        if (present.max > present.min) present.max - present.min else 1.0)
    }
    val (llo, lspan) = scaleOf(left)
    val (rlo, rspan) = scaleOf(right)
    def lines(ss: Seq[(String, Seq[Option[Double]])], lo: Double,
              span: Double, axis: String, colorOff: Int): Seq[String] =
      ss.zipWithIndex.map { case ((nm, ys), si) =>
        val n = math.max(ys.size - 1, 1)
        val pts = ys.zipWithIndex.collect { case (Some(v), i) =>
          s"${fmt(i.toDouble * w / n)},${fmt(h - (v - lo) / span * h)}"
        }
        s"""<polyline fill="none"
           |          stroke="${Colors((si + colorOff) % Colors.size)}"
           |          stroke-width="${if (si == 0) 2 else 1}"
           |          data-line="${esc(nm)}" data-axis="$axis"
           |          data-points="${pts.size}"
           |          points="${pts.mkString(" ")}"/>""".stripMargin
      }
    s"""<figure><figcaption>${esc(name)}</figcaption>
       |<svg viewBox="0 0 $w $h" width="$w" height="$h"
       |     data-series="${esc(name)}" data-kind="dual-axis">
       |<text x="2" y="12" data-axis-label="left-max">${fmt(llo + lspan)}</text>
       |<text x="2" y="${h - 2}" data-axis-label="left-min">${fmt(llo)}</text>
       |<text x="${w - 70}" y="12" data-axis-label="right-max">${fmt(rlo + rspan)}</text>
       |<text x="${w - 70}" y="${h - 2}" data-axis-label="right-min">${fmt(rlo)}</text>
       |${lines(left, llo, lspan, "left", 0).mkString("\n")}
       |${lines(right, rlo, rspan, "right", 3).mkString("\n")}
       |</svg></figure>""".stripMargin
  }

  private def optCol(rows: Array[org.apache.spark.sql.Row], idx: Int)
      : Seq[Option[Double]] =
    rows.map(r => if (r.isNullAt(idx)) None else Some(r.getDouble(idx)))
      .toSeq

  /** The reference's full three-figure price report (data_viz.py
    * visualize_data), data-equivalent and zero-dep: per price-series a
    * candlestick, an OHLC-glyph and a line figure (each with its SMA
    * overlays), then the DUAL-AXIS comparison of the derived-ccy close
    * (left axis) vs the USD close (right axis), then the data tables.
    * Inputs are already-ordered report-sized frames (see render's scale
    * note): `priceBars`/`rateBars` carry (date, open, high, low, close,
    * sma_5, sma_20); `comparison` is the ts_report_frame output. Byte-
    * deterministic like render.
    */
  def renderPriceReport(priceBars: DataFrame, rateBars: DataFrame,
                        comparison: DataFrame, title: String): String = {
    def collectBars(df: DataFrame) = df.select(
      df.col("date").cast("string"), df.col("open"), df.col("high"),
      df.col("low"), df.col("close"), df.col("sma_5"), df.col("sma_20"))
      .collect()
    def section(nm: String, rows: Array[org.apache.spark.sql.Row]) = {
      val bars = rows.map(r =>
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toSeq
      val overlays = Seq("sma_5" -> optCol(rows, 5),
                         "sma_20" -> optCol(rows, 6))
      val closeLine = ("close" -> optCol(rows, 4)) +: overlays
      svgCandles(s"$nm (candlestick)", bars, overlays, glyph = false) +
        "\n" + svgCandles(s"$nm (ohlc)", bars, overlays, glyph = true) +
        "\n" + svgLines(s"$nm (line)", closeLine)
    }
    val p = collectBars(priceBars)
    val f = collectBars(rateBars)
    val cmpCols = Seq("date", "close_price_ccy", "sma_5_ccy", "sma_20_ccy",
                      "close_price_usd", "sma_5_usd", "sma_20_usd")
    val c = comparison.select(
      comparison.col("date").cast("string") +:
        cmpCols.drop(1).map(comparison.col): _*).collect()
    val dual = svgDualAxis("price comparison",
      left = Seq("close_price_ccy" -> optCol(c, 1),
                 "sma_5_ccy" -> optCol(c, 2), "sma_20_ccy" -> optCol(c, 3)),
      right = Seq("close_price_usd" -> optCol(c, 4),
                  "sma_5_usd" -> optCol(c, 5),
                  "sma_20_usd" -> optCol(c, 6)))
    def table(rows: Array[org.apache.spark.sql.Row],
              cols: Seq[String]): String = {
      val header = cols.map(cl => s"<th>${esc(cl)}</th>").mkString
      val body = rows.map { r =>
        val cells = cols.indices.map { i =>
          val cell =
            if (r.isNullAt(i)) ""
            else if (i == 0) esc(String.valueOf(r.get(0)))
            else fmt(r.getDouble(i))
          s"<td>$cell</td>"
        }.mkString
        s"<tr>$cells</tr>"
      }.mkString("\n")
      s"<table><thead><tr>$header</tr></thead><tbody>\n$body\n</tbody></table>"
    }
    val barCols = Seq("date", "open", "high", "low", "close",
                      "sma_5", "sma_20")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |  #container { margin: auto; text-align: center; }
       |  h1 { color: #444444; }
       |  table { border-collapse: collapse; margin: auto; }
       |  td, th { border: 1px solid #ccc; padding: 2px 8px; }
       |</style></head>
       |<body><div id="container"><h1>${esc(title)}</h1></div>
       |<h2>price in USD</h2>
       |${section("price", p)}
       |<h2>exchange rate</h2>
       |${section("rate", f)}
       |<h2>price comparison</h2>
       |$dual
       |<h2>data</h2>
       |${table(p, barCols)}
       |${table(f, barCols)}
       |${table(c, cmpCols)}
       |</body></html>""".stripMargin
  }

  /** Renders `df` (already ordered by the caller) to a standalone HTML
    * document: title, one SVG chart per `valueCols` entry, data table.
    */
  def render(df: DataFrame, title: String, labelCol: String,
             valueCols: Seq[String]): String = {
    val rows = df.select((labelCol +: valueCols).map(df.col): _*).collect()
    val series = valueCols.zipWithIndex.map { case (c, idx) =>
      c -> rows.map(r =>
        if (r.isNullAt(idx + 1)) None else Some(r.getDouble(idx + 1))).toSeq
    }
    val charts = series.map { case (c, ys) => svgChart(c, ys) }
    val header = (labelCol +: valueCols)
      .map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      val label = s"<td>${esc(String.valueOf(r.get(0)))}</td>"
      val vals = valueCols.indices.map { i =>
        val cell = if (r.isNullAt(i + 1)) "" else fmt(r.getDouble(i + 1))
        s"<td>$cell</td>"
      }.mkString
      s"<tr>$label$vals</tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |  #container { margin: auto; text-align: center; }
       |  h1 { color: #444444; }
       |  table { border-collapse: collapse; margin: auto; }
       |  td, th { border: 1px solid #ccc; padding: 2px 8px; }
       |</style></head>
       |<body><div id="container"><h1>${esc(title)}</h1></div>
       |${charts.mkString("\n")}
       |<table><thead><tr>$header</tr></thead><tbody>
       |$body
       |</tbody></table></body></html>""".stripMargin
  }

  /** Writes the rendered report; returns the byte count. */
  def write(df: DataFrame, path: String, title: String, labelCol: String,
            valueCols: Seq[String]): Long = {
    val html = render(df, title, labelCol, valueCols)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    html.length.toLong
  }
}
