package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode/feature-extract runs as batched per-partition functions over the
  * typed Dataset — the Scala analog of a Pandas-UDF/mapInPandas stage.
  *
  * The Spark-side plumbing (schema, binary transport, batch shape,
  * partition-parallel execution) is real and tested. The IMAGE codec is
  * real for PNG (`PngCodec`, JDK `javax.imageio` — actual decode of actual
  * compressed bytes); payloads in formats the JVM cannot decode natively
  * (jpeg, audio, video — no codec libraries in this container) fall back
  * to the deterministic `FakeCodec` STUB. Swapping `FakeCodec.decode` for
  * a JNI/libjpeg call changes no plumbing.
  */
object Media {

  /** A media row in flight: id + raw payload + declared format. */
  case class MediaRow(media_id: Long, payload: Array[Byte], format: String)

  /** Extracted metadata (what a real decoder would emit). */
  case class MediaMeta(media_id: Long, format: String, n_bytes: Long,
                       width: Int, height: Int, checksum: Long)

  /** STUB decoder — deterministic fake in lieu of a real codec (used for
    * payloads that are not a format the JVM can decode natively).
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      // real impl: hand `payload` to the image library; here: derive
      // stable pseudo-dimensions and a byte checksum from the payload
      val first = if (payload.nonEmpty) payload(0) & 0xff else 0
      val last = if (payload.nonEmpty) payload(payload.length - 1) & 0xff else 0
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      (64 + first % 64, 64 + last % 64, sum % 2147483647L)
    }
  }

  /** REAL image codec for PNG payloads via `javax.imageio` (in the JDK —
    * no new dependency): actual decode of actual compressed bytes, closing
    * the codec stub for images. Grayscale PNG is lossless, so the decoded
    * raster is bit-identical to what was encoded — which is what lets an
    * external SQL oracle check a full encode→decode round-trip
    * arithmetically.
    */
  object PngCodec {
    // ImageIO wraps InputStreams in a FileCacheImageInputStream by default:
    // every decode (and encode, on the output side) round-trips the payload
    // through a temp FILE, and 32 executor threads contend on tmpfs create/
    // delete. The payloads here are already in-memory byte arrays — use the
    // memory-cache stream implementations instead. JVM-global, set once at
    // class load on each executor.
    javax.imageio.ImageIO.setUseCache(false)

    private val Magic: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 8 && {
        var i = 0
        while (i < 8 && payload(i) == Magic(i)) i += 1
        i == 8
      }

    /** Decode: true width/height from the PNG header, checksum = sum of
      * decoded band-0 samples mod 2^31−1 (same modulus as FakeCodec, so
      * the MediaMeta contract is uniform across codecs).
      */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read returns null (not an exception) for payloads that
      // carry the 8-byte magic but are truncated/corrupt — fall back to
      // the deterministic stub instead of NPE-ing in the executor
      if (img == null) return FakeCodec.decode(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum % 2147483647L)
    }

    /** Decode + perceptual average-hash in one pass: a REAL imageio
      * decode, then the aHash bits — pixel > floor-mean, row-major index
      * i = y·w + x — split into two 32-bit halves so no engine ever
      * touches the sign bit (images are ≤ 8×8 ⇒ i ≤ 63). Exact integer
      * arithmetic end-to-end; an external oracle recomputes the hash from
      * the synthesis formula without any codec. Returns
      * (w, h, hash_lo bits 0-31, hash_hi bits 32-63, n_set).
      * Undecodable magic-valid payloads fall back to the stub dims with
      * hash = (-1, -1, -1), keeping the fallback loud and distinguishable.
      */
    def decodeAvgHash(payload: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) {
        val (w, h, _) = FakeCodec.decode(payload)
        return (w, h, -1L, -1L, -1L)
      }
      val (w, h) = (img.getWidth, img.getHeight)
      // ENFORCED precondition, not assumed: i = y·w + x must fit the two
      // 32-bit halves. A 9×9 image would shift past bit 63 and silently
      // alias pixels (JVM shifts wrap mod 64) — fail loudly instead, the
      // FixedLog2 discipline.
      if (w.toLong * h > 64)
        throw new IllegalArgumentException(
          s"decodeAvgHash requires <= 64 pixels, got ${w}x$h")
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      val mean = sum / (w.toLong * h)
      var lo = 0L; var hi = 0L; var nSet = 0L
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (raster.getSample(x, y, 0) > mean) {
            val i = y * w + x
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            nSet += 1
          }
          x += 1
        }
        y += 1
      }
      (w, h, lo, hi, nSet)
    }

    /** Decode + nearest-neighbor 2× downsample in one pass: a REAL
      * imageio decode of the compressed PNG, then every other pixel per
      * axis (target (⌈w/2⌉, ⌈h/2⌉), source index = 2·target index — the
      * exact-arithmetic nearest-neighbor convention, so an external
      * oracle can recompute the sampled checksum from the synthesis
      * formula). Returns (new_w, new_h, checksum of sampled band-0).
      */
    def decodeHalf(payload: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      // same undecodable-but-magic-valid fallback as decode
      if (img == null) return FakeCodec.decode(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val (tw, th) = ((w + 1) / 2, (h + 1) / 2)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) { sum += raster.getSample(2 * x, 2 * y, 0); x += 1 }
        y += 1
      }
      (tw, th, sum % 2147483647L)
    }

    /** Decode + 2×2 quadrant census in one pass: the tiling primitive
      * patch-based vision pipelines (ViT patching, tiled augmentation)
      * run after decode. Tile bounds split at ⌈w/2⌉ × ⌈h/2⌉ (left/top
      * tiles take the ceiling half — the decodeHalf convention); a 1-wide
      * or 1-tall image simply has no right/bottom tiles. Per tile:
      * (tile_row, tile_col, n_px, band-0 pixel sum) — exact integers an
      * external oracle recomputes from the synthesis formula.
      * Undecodable magic-valid payloads return the stub dims with an
      * EMPTY tile list (the decodeHistogram16 sentinel convention).
      */
    def decodeQuadrants(payload: Array[Byte])
        : (Int, Int, Seq[(Int, Int, Long, Long)]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) {
        val (w, h, _) = FakeCodec.decode(payload)
        return (w, h, Seq.empty)
      }
      val (w, h) = (img.getWidth, img.getHeight)
      val (tw, th) = ((w + 1) / 2, (h + 1) / 2)
      val raster = img.getRaster
      val tiles = for {
        r <- 0 to 1
        c <- 0 to 1
        x0 = if (c == 0) 0 else tw
        x1 = if (c == 0) tw - 1 else w - 1
        y0 = if (r == 0) 0 else th
        y1 = if (r == 0) th - 1 else h - 1
        if x1 >= x0 && y1 >= y0
      } yield {
        var sum = 0L
        var y = y0
        while (y <= y1) {
          var x = x0
          while (x <= x1) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        (r, c, (x1 - x0 + 1).toLong * (y1 - y0 + 1), sum)
      }
      (w, h, tiles)
    }

    /** Decode + 16-bin luminance histogram (bin = sample DIV 16) in one
      * pass — the distribution input for image-entropy quality scoring.
      * Returns (w, h, bins[16]); undecodable magic-valid payloads return
      * the stub dims with an EMPTY bin array (zero pixels — loud in any
      * downstream count, the decodeAvgHash sentinel convention).
      */
    def decodeHistogram16(payload: Array[Byte]): (Int, Int, Array[Long]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) {
        val (w, h, _) = FakeCodec.decode(payload)
        return (w, h, Array.empty[Long])
      }
      val (w, h) = (img.getWidth, img.getHeight)
      val bins = new Array[Long](16)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val s = raster.getSample(x, y, 0)
          // ENFORCED precondition (the decodeAvgHash discipline): the
          // 16-bin layout assumes 8-bit samples — a 16-bit grayscale
          // PNG would index past the array with a bare AIOOBE otherwise
          if (s < 0 || s > 255)
            throw new IllegalArgumentException(
              s"decodeHistogram16 requires 8-bit samples, got $s")
          bins(s / 16) += 1L
          x += 1
        }
        y += 1
      }
      (w, h, bins)
    }

    /** Decode + HISTOGRAM EQUALIZATION in one pass — the classic contrast
      * remap p' = floor((cdf(p) − cdf_min)·255 / (n − cdf_min)) over the
      * decoded 8-bit raster (cdf_min = the lowest nonzero cdf value, the
      * textbook convention; a flat image where n == cdf_min maps to 0 by
      * definition, mirrored by the oracle). Exact integers end-to-end, so
      * the lossless-PNG round-trip keeps the result SQL-recomputable from
      * the synthesis formula. Returns (w, h, sum_before, sum_after,
      * distinct_before, distinct_after).
      */
    def decodeEqualize(payload: Array[Byte])
        : (Int, Int, Long, Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) {
        val (w, h, _) = FakeCodec.decode(payload)
        return (w, h, -1L, -1L, -1L, -1L)
      }
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val hist = new Array[Long](256)
      var sumB = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val s = raster.getSample(x, y, 0)
          if (s < 0 || s > 255)
            throw new IllegalArgumentException(
              s"decodeEqualize requires 8-bit samples, got $s")
          hist(s) += 1L; sumB += s; x += 1
        }
        y += 1
      }
      val n = w.toLong * h.toLong
      val cdf = new Array[Long](256)
      var acc = 0L
      var v = 0
      while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
      val cdfMin = cdf.find(_ > 0L).getOrElse(0L)
      val remap = Array.tabulate(256)(p =>
        if (n == cdfMin) 0L
        else (cdf(p) - cdfMin) * 255L / (n - cdfMin))
      var sumA = 0L; var dA = 0L; var dB = 0L
      v = 0
      while (v < 256) {
        if (hist(v) > 0L) { dB += 1L; sumA += remap(v) * hist(v) }
        v += 1
      }
      dA = (0 until 256).filter(hist(_) > 0L).map(remap).distinct.size.toLong
      (w, h, sumB, sumA, dB, dA)
    }

    /** Encode a w×h 8-bit grayscale image (pixel(x, y) masked to a byte)
      * as real compressed PNG bytes.
      */
    def encodeGray(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL audio codec for WAV/PCM payloads via `javax.sound.sampled` (in
    * the JDK — no new dependency), closing the codec stub for audio the
    * same way [[PngCodec]] closes it for images: PCM is uncompressed, so
    * the decoded samples are bit-identical to what was encoded and an
    * external SQL oracle can check a full encode→decode round-trip
    * arithmetically.
    */
  object WavCodec {
    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
        payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E'

    /** Encode unsigned 8-bit mono PCM samples as a real WAV container. */
    def encodePcm8(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode: true sample rate / channel count / frame count from the WAV
      * header, energy = Σ(sample−128)² over the decoded unsigned 8-bit
      * samples — the same exact integer statistic as [[audioWindows]], so
      * decoded-vs-synthesized energies are directly comparable.
      */
    def decode(payload: Array[Byte]): (Int, Int, Long, Long) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      var e = 0L
      var i = 0
      while (i < data.length) {
        val s = (data(i) & 0xff) - 128
        e += s.toLong * s
        i += 1
      }
      (fmt.getSampleRate.toInt, fmt.getChannels,
       data.length.toLong / math.max(1, fmt.getFrameSize), e)
      } finally ais.close() // release decoder resources even for the
                            // byte-array-backed path (a provider may
                            // allocate native state behind the stream)
    }

    /** Decode to the raw unsigned 8-bit sample stream (the DSP read
      * path — [[decode]] keeps only summary stats).
      */
    def decodeSamples(payload: Array[Byte]): (Int, Array[Int]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val rate = ais.getFormat.getSampleRate.toInt
        (rate, ais.readAllBytes().map(_ & 0xff))
      } finally ais.close()
    }
  }

  /** Wrap any table with a string column as binary media (fixture adapter:
    * the documents table stands in for a media corpus; payload bytes are
    * the UTF-8 encoding).
    */
  /** REAL image codec for JPEG payloads via `javax.imageio` (the JDK
    * ships a baseline JPEG reader AND writer — no new dependency): actual
    * lossy decode of actual entropy-coded bytes. Unlike PNG, JPEG decode
    * is implementation-defined at the last bit (the IDCT is specified
    * with a tolerance, not exactly), so JPEG queries carry NO bitwise SQL
    * oracle — they are spec-checked with a fidelity bound and a
    * same-codec determinism pin instead, the oracle-exempt contract the
    * HTML report sink (S6) already uses. Within one JDK the encoder and
    * decoder are deterministic, so the driver's rows/schema check and
    * re-runs stay stable.
    */
  object JpegCodec {
    def isJpeg(payload: Array[Byte]): Boolean =
      payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff

    /** Encode a grayscale raster as real baseline JPEG bytes. */
    def encodeGray(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Decode + fidelity against the known source raster in one pass:
      * (width, height, checksum = Σ samples mod 2³¹−1, mae_q10 =
      * ⌊1024·Σ|decoded−expected|/n⌋). Undecodable magic-valid payloads
      * fall back to the stub dims with mae −1 — loud in any assertion.
      */
    def decodeFidelity(payload: Array[Byte],
                       expected: (Int, Int) => Int): (Int, Int, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) {
        val (w, h, sum) = FakeCodec.decode(payload)
        return (w, h, sum, -1L)
      }
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var absErr = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0)
          sum += v
          absErr += math.abs(v - (expected(x, y) & 0xff)).toLong
          x += 1
        }
        y += 1
      }
      (w, h, sum % 2147483647L, 1024L * absErr / (w.toLong * h))
    }

    /** Decoded mean luma, q10 fixed point: ⌊1024·Σsamples/(w·h)⌋ over the
      * RAW sample sum. [[decodeFidelity]]'s third slot is a CHECKSUM
      * (Σ mod 2³¹−1) — using it as a pixel sum silently aliases once a
      * raster holds ~2.9M bright pixels — so luma/scene-cut math must
      * come through here. Errors loudly on undecodable payloads (mean
      * luma of the stub dims would be silent nonsense).
      */
    def meanLumaQ10(payload: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "meanLumaQ10: payload did not decode as image")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      Math.multiplyExact(1024L, sum) / (w.toLong * h)
    }
  }

  /** Minimal MJPEG-style video container: a "GVID" magic, a frame count,
    * then length-prefixed REAL JPEG frames. The container format is ours
    * (the JDK ships no AVI/MP4 demuxer), but everything inside it is a
    * genuine codec path — each frame decodes through [[JpegCodec]] — so
    * the video pipeline's per-frame decode, feature-extract and
    * scene-cut stages run on real lossy-decoded pixels instead of the
    * byte-chunk stand-in. Swapping [[unpack]] for a real demuxer changes
    * no downstream plumbing.
    */
  object VideoContainer {
    private val Magic: Array[Byte] = "GVID".getBytes("US-ASCII")

    def isGvid(payload: Array[Byte]): Boolean =
      payload.length >= 8 && payload(0) == 'G' && payload(1) == 'V' &&
        payload(2) == 'I' && payload(3) == 'D'

    def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(Magic)
      out.writeInt(frames.length)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      out.flush()
      bos.toByteArray
    }

    /** Unpack to frame payloads; truncated/corrupt containers return the
      * frames that parsed cleanly (loud: count mismatch vs header).
      */
    def unpack(payload: Array[Byte]): (Int, Seq[Array[Byte]]) = {
      if (!isGvid(payload)) return (0, Nil)
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
      val declared = in.readInt()
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      try {
        var i = 0
        while (i < declared) {
          val n = in.readInt()
          val buf = new Array[Byte](n)
          in.readFully(buf)
          frames += buf
          i += 1
        }
      } catch { case _: java.io.IOException => () }
      (declared, frames.toSeq)
    }
  }

  def asMedia(docs: DataFrame, idCol: String, contentCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).as("media_id"),
                col(contentCol).cast("binary").as("payload"),
                lit("txt").as("format"))
      .as[MediaRow]
  }

  /** Batched decode: runs once per partition, iterating payloads — the
    * batch shape a vectorized codec wants (and where a real impl would
    * amortize codec init per partition, exactly like mapInPandas batches).
    */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here; dispatch is by payload
      // magic, not the declared format — a real pipeline trusts bytes
      rows.map { m =>
        val (w, h, checksum) =
          if (PngCodec.isPng(m.payload)) PngCodec.decode(m.payload)
          else if (JpegCodec.isJpeg(m.payload))
            // ImageIO sniffs the format from the bytes; the PNG decode
            // loop (read → band-0 sample sum) is codec-agnostic
            PngCodec.decode(m.payload)
          else FakeCodec.decode(m.payload)
        MediaMeta(m.media_id, m.format, m.payload.length.toLong, w, h, checksum)
      }
    }
  }

  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    extractMeta(asMedia(docs, "doc_id", "text")).toDF()

  /** Batched decode-and-resize over PNG payloads: the same per-partition
    * batch shape as [[extractMeta]], but each image goes through the real
    * decode → downsample path ([[PngCodec.decodeHalf]]). Non-PNG payloads
    * are passed through the fake codec untouched (resize is undefined for
    * them) — dispatch is by payload magic, as everywhere.
    */
  def resizeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, checksum) =
          if (PngCodec.isPng(m.payload)) PngCodec.decodeHalf(m.payload)
          else FakeCodec.decode(m.payload)
        MediaMeta(m.media_id, m.format, m.payload.length.toLong, w, h, checksum)
      }
    }
  }

  /** A sampled frame: fixed-stride chunk of the payload (what video frame
    * sampling looks like to the engine: one media row fans out to many
    * frame rows, each independently processable downstream).
    */
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long,
                   checksum: Long)

  /** Frame sampling: split each payload into fixed-size chunks and emit one
    * row per chunk — the explode pattern that turns per-media work into
    * per-frame parallelism (a 2 GB video becomes thousands of
    * independently-schedulable frame tasks instead of one straggler).
    * Chunking stands in for codec-aware keyframe extraction (STUB).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.map { case (chunk, i) =>
        var sum = 0L
        var j = 0
        while (j < chunk.length) { sum += (chunk(j) & 0xff); j += 1 }
        Frame(m.media_id, i, chunk.length.toLong, sum % 2147483647L)
      }
    }
  }

  /** One analysis window over an audio payload: overlapping fixed-size
    * sample windows (the STFT/feature-frame shape), with integer energy —
    * Σ(sample−128)² over the window's unsigned bytes, exact and
    * engine-portable.
    */
  case class AudioWindow(media_id: Long, window_idx: Int, n_samples: Long,
                         energy: Long)

  /** Audio-style windowing: treat the payload as 8-bit PCM samples and fan
    * each media row out to overlapping windows (`windowSize` samples every
    * `hop`). Same explode pattern as frame sampling but with overlap — the
    * shape every audio feature extractor (MFCC, fbank, VAD) consumes. The
    * per-window math is the STUB feature; a real extractor replaces the
    * energy loop and nothing else.
    */
  def audioWindows(media: Dataset[MediaRow], windowSize: Int,
                   hop: Int): Dataset[AudioWindow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val nWin = if (n == 0) 0 else (n - 1) / hop + 1
      (0 until nWin).iterator.map { i =>
        val start = i * hop
        val end = math.min(start + windowSize, n)
        var e = 0L
        var j = start
        while (j < end) {
          val s = (m.payload(j) & 0xff) - 128
          e += s.toLong * s
          j += 1
        }
        AudioWindow(m.media_id, i, (end - start).toLong, e)
      }
    }
  }

  /** One DC-removed zero-crossing count per analysis window: the voicing /
    * spectral-tilt feature VAD front-ends pair with energy. Raw bytes are
    * all-positive, so the DC offset is removed exactly in integers by
    * comparing ns·b[j] against the window sum (≡ b[j] vs the window mean
    * without ever forming a fractional mean); a crossing is a strict sign
    * change between consecutive centered samples.
    */
  case class AudioZcr(media_id: Long, window_idx: Int, n_samples: Long,
                      crossings: Long)

  /** Same 8-bit PCM windowing contract as [[audioWindows]] (windowSize
    * every hop, short tail window), emitting the exact integer
    * zero-crossing count per window. Row-local flatMap — zero shuffle,
    * same explode parallelism as frame sampling.
    */
  def audioZcr(media: Dataset[MediaRow], windowSize: Int,
               hop: Int): Dataset[AudioZcr] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val nWin = if (n == 0) 0 else (n - 1) / hop + 1
      (0 until nWin).iterator.map { i =>
        val start = i * hop
        val end = math.min(start + windowSize, n)
        val ns = (end - start).toLong
        var wsum = 0L
        var j = start
        while (j < end) { wsum += (m.payload(j) & 0xff); j += 1 }
        var cr = 0L
        j = start
        while (j < end - 1) {
          val a = ns * (m.payload(j) & 0xff) - wsum
          val b = ns * (m.payload(j + 1) & 0xff) - wsum
          if (a * b < 0) cr += 1
          j += 1
        }
        AudioZcr(m.media_id, i, ns, cr)
      }
    }
  }

  /** Resize stage (STUB): a real impl re-encodes the payload at the target
    * dimensions; the stub rewrites the declared metadata and truncates the
    * payload proportionally so downstream stages see a consistent
    * (smaller) byte stream. The Spark shape — binary→binary map with new
    * meta — is what matters.
    */
  def resize(media: Dataset[MediaRow], targetW: Int,
             targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, _) = FakeCodec.decode(m.payload)
        val scale = math.min(1.0,
          (targetW.toLong * targetH).toDouble / math.max(1, w.toLong * h))
        val keep = math.max(1, (m.payload.length * scale).toInt)
        m.copy(payload = m.payload.take(keep),
               format = s"${m.format}@${targetW}x$targetH")
      }
    }
  }

  /** Fake feature extraction: fixed-dim float vector from byte statistics
    * (a real impl returns the model's embedding; the Spark shape —
    * binary in, float array out, batched per partition — is identical).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition model/codec init would go here
      rows.map { m =>
        val feats = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          feats(i % dim) += (m.payload(i) & 0xff) / 255.0f
          i += 1
        }
        (m.media_id, feats)
      }
    }.toDF("media_id", "features")
  }
}
