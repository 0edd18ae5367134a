package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in live-fetch shell for the S1 ingest source (reference
  * `av_etl.py:22-27` `pull_data_from_api` + the `@retry` policy at
  * `av_etl.py:138`): a thin driver-side URL→JSON-string adapter whose
  * output feeds the EXISTING distributed parse
  * ([[AvJson.parseDailyBars]]) unchanged.
  *
  * Driver-side by design, like the reference: one payload arrives per
  * (symbol, request) — a scalar, not a dataset — and the engine stays
  * storage-agnostic. Distribution starts at [[payloadsDf]]: however many
  * payloads the fetch loop collected become a 1-column frame and the
  * map-of-maps restructure runs as a normal distributed query.
  *
  * Zero new dependencies (java.net only). `file:` URLs replay recorded
  * payloads byte-for-byte, which is how the zero-egress spec drives the
  * exact code path a live `https:` fetch takes.
  */
object LiveFetch {

  /** URL-encoded query string from request params (the reference passes
    * `params` to requests.get the same way).
    */
  def queryString(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

  /** GET `url` (+ params) and return the body as a UTF-8 string, with
    * the reference's bounded-retry policy: `tries` attempts, fixed
    * `backoffMs` between them, the LAST failure propagated loudly. Any
    * non-2xx HTTP status is a failure (a silent error-body would
    * otherwise parse as an empty series and masquerade as "no data").
    */
  def fetchJson(url: String, params: Map[String, String] = Map.empty,
                tries: Int = 3, backoffMs: Long = 500L,
                timeoutMs: Int = 30000): String = {
    require(tries >= 1, s"tries must be >= 1: $tries")
    val full =
      if (params.isEmpty) url
      else url + (if (url.contains("?")) "&" else "?") + queryString(params)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < tries) {
      attempt += 1
      try return fetchOnce(full, timeoutMs)
      catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < tries && backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw new java.io.IOException(
      s"fetch failed after $tries tries: $full", lastErr)
  }

  private def fetchOnce(url: String, timeoutMs: Int): String = {
    val conn = new java.net.URL(url).openConnection()
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn match {
      case http: java.net.HttpURLConnection =>
        http.setRequestMethod("GET")
        val code = http.getResponseCode
        if (code < 200 || code >= 300)
          throw new java.io.IOException(s"HTTP $code from $url")
      case _ => () // file:/jar: replay — no status to check
    }
    val in = conn.getInputStream
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Collected payloads as the 1-column frame [[AvJson.parseDailyBars]]
    * expects — the seam where the driver-side fetch hands off to the
    * distributed restructure.
    */
  def payloadsDf(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        payloads.map(org.apache.spark.sql.Row(_)),
        math.max(1, math.min(payloads.size, 32))),
      StructType(Seq(StructField("payload", StringType))))
  }
}
