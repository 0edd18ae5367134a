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
