package graft

import org.scalatest.funsuite.AnyFunSuite

/** S6 report sink: structure, null handling, and byte-determinism of the
  * rendered HTML over the real report frame.
  */
class HtmlReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def frame = SparkEntry.queries("ts_report_frame")(spark, sfDir)
  private val cols =
    Seq("close_price_usd", "close_rate", "close_price_ccy")

  test("report renders every series and row, nulls as gaps") {
    val df = frame
    val n = df.count()
    val html = graft.report.HtmlReport.render(df, "demo price report",
      "date", cols :+ "sma_5_ccy")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<h1>demo price report</h1>"))
    cols.foreach(c => assert(html.contains(s"""data-series="$c"""")))
    assert(html.linesIterator.count(_.contains("<tr><td>")) == n)
    // the SMA warms up over the first rows -> fewer chart points than rows
    val smaPoints =
      """data-points="(\d+)"""".r.findAllMatchIn(html).map(_.group(1).toInt)
        .toSeq
    assert(smaPoints.take(3).forall(_ == n.toInt))
    assert(smaPoints(3) < n.toInt && smaPoints(3) > 0)
  }

  test("rendering is byte-deterministic and the sink writes it") {
    val a = graft.report.HtmlReport.render(frame, "t", "date", cols)
    val b = graft.report.HtmlReport.render(frame, "t", "date", cols)
    assert(a == b)
    val out = java.nio.file.Files.createTempDirectory("graft-report")
      .resolve("report.html").toString
    val len = graft.report.HtmlReport.write(frame, out, "t", "date", cols)
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(out)) == len)
  }
}
