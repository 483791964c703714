package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata structs. PNG and JPEG pixel
 * decode and area-average resize are REAL (`decodeImage` routes BOTH
 * through JDK javax.imageio; 16-bit PCM audio decode is real too). PNG
 * is lossless and therefore bit-deterministic — oracle-pinned by
 * q_media_decode's closed-form corpus. JPEG decode is real but its IDCT
 * output is implementation-defined, so its pixel sums are pinned as a
 * SAME-JVM spec (MultimodalSpec's JPEG case: exact dims + decoded sums
 * from this JDK's codec), not a cross-engine golden — a different JVM
 * vendor may legally produce off-by-one pixel values. Video decode
 * stays a deterministic stub (no codec in this container); everything
 * Spark-side — schema, batch shape, partitioning, the mapPartitions
 * plumbing a Pandas-UDF/`mapInPandas` stage would occupy — is real and
 * tested.
 */
object Multimodal {

  /** Sniffed media kind from magic bytes (real). */
  def mediaKind(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return "unknown"
    def b(i: Int): Int = bytes(i) & 0xff
    if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "image/png"
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) "image/jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "image/gif"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      if (bytes.length >= 12 && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "audio/wav"
      else if (bytes.length >= 12 && b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') "video/avi"
      else "riff"
    }
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') "audio/mpeg"
    else if (bytes.length > 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') "video/mp4"
    else if (b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') "application/pdf"
    else "unknown"
  }

  /** PNG header width/height (real parse of IHDR — deterministic). */
  def pngDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 24) return None
    if (mediaKind(bytes) != "image/png") return None
    def i32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    Some((i32(16), i32(20)))
  }

  /** JPEG width/height (REAL marker-chain scan — dimensions live in plain
    * segment headers, no codec needed). From offset 2 each segment is
    * `FF <marker> <len:u16be>`; any SOF0–SOF15 except DHT(C4)/JPG(C8)/
    * DAC(CC) carries height at +5 (u16be) and width at +7. Standalone
    * markers (RSTn/TEM) and fill FF bytes are skipped; the scan stops at
    * SOS/EOI or truncation. */
  def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int): Int = bytes(i) & 0xff
    if (!(b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff)) return None
    var p = 2
    while (p + 3 < bytes.length) {
      if (b(p) != 0xff) return None // desynced stream
      val m = b(p + 1)
      if (m == 0xff) p += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) p += 2 // standalone
      else {
        val len = (b(p + 2) << 8) | b(p + 3)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (p + 8 >= bytes.length) return None
          return Some((((b(p + 7) << 8) | b(p + 8)), ((b(p + 5) << 8) | b(p + 6))))
        }
        if (m == 0xda || m == 0xd9) return None // SOS/EOI before any SOF
        p += 2 + len
      }
    }
    None
  }

  /** GIF logical-screen width/height (REAL: u16le at bytes 6/8). */
  def gifDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 10) return None
    def b(i: Int): Int = bytes(i) & 0xff
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')) return None
    Some((b(6) | (b(7) << 8), b(8) | (b(9) << 8)))
  }

  /** Parsed WAV `fmt ` header + duration derived from the `data` chunk. */
  final case class WavFormat(channels: Int, sampleRate: Int,
                             bitsPerSample: Int, durationMs: Option[Long])

  /** WAV format (REAL chunk walk — RIFF headers are plain structs, no
    * codec needed): after `RIFF....WAVE`, chunks are `<id:4><size:u32le>`
    * word-aligned; `fmt ` carries channels/rate/bits, `data`'s size over
    * the byte rate gives the duration. Malformed sizes stop the walk. */
  def wavFormat(bytes: Array[Byte]): Option[WavFormat] = {
    if (bytes == null || bytes.length < 36) return None
    def b(i: Int): Int = bytes(i) & 0xff
    def le16(o: Int): Int = b(o) | (b(o + 1) << 8)
    def le32(o: Int): Long =
      (b(o) | (b(o + 1) << 8) | (b(o + 2) << 16)).toLong | (b(o + 3).toLong << 24)
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var p = 12L
    var fmt: Option[(Int, Int, Int, Long)] = None // ch, rate, bits, byteRate
    var dataLen = -1L
    while (p + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val o = p.toInt
      val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(o + 4)
      if (id == "fmt " && o + 24 <= bytes.length)
        fmt = Some((le16(o + 10), le32(o + 12).toInt, le16(o + 22), le32(o + 16)))
      else if (id == "data") dataLen = size
      p += 8L + size + (size & 1L)
    }
    fmt.map { case (ch, rate, bits, byteRate) =>
      WavFormat(ch, rate, bits,
        if (dataLen >= 0 && byteRate > 0) Some(dataLen * 1000L / byteRate) else None)
    }
  }

  /** Decoded PCM summary: exact BIGINT sample statistics. */
  final case class DecodedAudio(n_samples: Long, sum_samples: Long,
                                sum_abs: Long, peak_abs: Long)

  /** REAL audio decode for 16-bit PCM WAV — raw samples need no codec,
    * just the RIFF chunk walk (shared shape with [[wavFormat]]) and
    * little-endian signed reads. Non-PCM/compressed/garbage payloads →
    * None (per-row isolation). Exact integers throughout: sample sum,
    * absolute sum (loudness proxy), peak (clipping check) — the audio
    * QA columns a speech-corpus pipeline filters on. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length < 44) return None
    def b(i: Int): Int = bytes(i) & 0xff
    def le16(o: Int): Int = b(o) | (b(o + 1) << 8)
    def le32(o: Int): Long =
      (b(o) | (b(o + 1) << 8) | (b(o + 2) << 16)).toLong | (b(o + 3).toLong << 24)
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var p = 12L
    var bits = -1
    var fmtCode = -1
    var dataOff = -1L
    var dataLen = -1L
    while (p + 8 <= bytes.length && (bits < 0 || dataOff < 0)) {
      val o = p.toInt
      val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(o + 4)
      if (id == "fmt " && o + 24 <= bytes.length) {
        fmtCode = le16(o + 8); bits = le16(o + 22)
      } else if (id == "data") { dataOff = o + 8L; dataLen = size }
      p += 8L + size + (size & 1L)
    }
    if (fmtCode != 1 || bits != 16 || dataOff < 0) return None
    val end = math.min(bytes.length.toLong, dataOff + dataLen).toInt
    var (n, s, sa, pk) = (0L, 0L, 0L, 0L)
    var o = dataOff.toInt
    while (o + 1 < end) {
      val v = le16(o).toShort.toLong // sign-extend
      n += 1; s += v
      val a = math.abs(v)
      sa += a; if (a > pk) pk = a
      o += 2
    }
    Some(DecodedAudio(n, s, sa, pk))
  }

  /** Real PCM decode over a binary column (same mapPartitions shape as
    * [[withDecodedSummary]]). */
  def withDecodedAudio(df: DataFrame, idCol: String,
                       binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("__b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = decodeWavPcm16(bytes)
        (id, d.map(_.n_samples), d.map(_.sum_samples),
          d.map(_.sum_abs), d.map(_.peak_abs))
      })
      .toDF("media_id", "n_samples", "sum_samples", "sum_abs", "peak_abs")
  }

  /** Deterministic REAL 16-bit PCM corpus with closed-form samples:
    * sample i of clip `id` is ((id·31 + i·7) mod 2001) − 1000 — pure
    * integer arithmetic the oracle reproduces with a generate_series,
    * pinning the decode against independent math (the
    * [[syntheticRealPngs]] pattern for audio). */
  def syntheticRealWavs(spark: org.apache.spark.sql.SparkSession, n: Int,
                        samples: Int = 256): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val data = new Array[Byte](samples * 2)
      var j = 0
      while (j < samples) {
        val v = ((i.toLong * 31 + j.toLong * 7) % 2001 - 1000).toInt
        data(2 * j) = (v & 0xff).toByte
        data(2 * j + 1) = ((v >> 8) & 0xff).toByte
        j += 1
      }
      (i.toLong, syntheticWav(8000, 1, 16, data))
    }.toDF("media_id", "payload")
  }

  /** STUBBED decode: a real implementation would hand batches to an image
    * library (mapInPandas / JNI); this deterministic fake derives a fixed-
    * length feature vector from the payload bytes so the downstream plumbing
    * (schema, similarity, clustering) is fully exercisable. */
  def stubDecodeFeatures(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / dim)
    var d = 0
    while (d < dim) { out(d) /= n; d += 1 }
    out
  }

  // ---------- REAL pixel decode (PNG *and* JPEG via the JDK's
  // javax.imageio — no external library). PNG decode is lossless and
  // therefore bit-deterministic (cross-engine oracle-pinned); JPEG
  // decodes through the same entry point but its IDCT is
  // implementation-defined, so JPEG pixel output is pinned same-JVM only
  // (MultimodalSpec) — see the object scaladoc. ----------

  /** Decoded-raster summary: dims + per-channel pixel-value SUMS as exact
    * BIGINTs (sums, not float means — order-independent, oracle-exact). */
  final case class DecodedImage(width: Int, height: Int,
                                sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real image decode. None on null/truncated/non-image payloads —
    * per-row failure isolation, the Extract error-column discipline.
    * Cost note for 100 TB: decode is CPU-per-byte with no shuffle; the
    * mapPartitions shape below is exactly where a cluster deployment
    * swaps in a vectorized/JNI codec without touching the plan. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(img.getWidth, img.getHeight, sr, sg, sb))
    } catch { case _: Throwable => None }
  }

  /** Real area-average resize on the decoded raster: output pixel (x, y)
    * averages its source box [x·w/w2, (x+1)·w/w2) × [y·h/h2, (y+1)·h/h2)
    * with integer floor division — pure integer arithmetic, no float
    * filter kernels, deterministic on any JVM. Returns the RESIZED
    * raster's summary (the bytes themselves stay an encode-detail; pixel
    * content is the contract). */
  def resizeDecoded(bytes: Array[Byte], w2: Int, h2: Int): Option[DecodedImage] = {
    require(w2 > 0 && h2 > 0, s"target dims must be positive: ${w2}x$h2")
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < w2 || img.getHeight < h2) return None
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y2 = 0
      while (y2 < h2) {
        val y0 = y2 * h / h2; val y1 = (y2 + 1) * h / h2
        var x2 = 0
        while (x2 < w2) {
          val x0 = x2 * w / w2; val x1 = (x2 + 1) * w / w2
          var (br, bg, bb) = (0L, 0L, 0L)
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = img.getRGB(x, y)
              br += (p >> 16) & 0xff; bg += (p >> 8) & 0xff; bb += p & 0xff
              x += 1
            }
            y += 1
          }
          val cnt = (y1 - y0).toLong * (x1 - x0).toLong
          sr += br / cnt; sg += bg / cnt; sb += bb / cnt
          x2 += 1
        }
        y2 += 1
      }
      Some(DecodedImage(w2, h2, sr, sg, sb))
    } catch { case _: Throwable => None }
  }

  /** Real decode + resize over a binary column: per media row, the
    * original raster summary and the `targetW`×`targetH` area-average
    * summary (the mapPartitions shape a cluster codec slots into). */
  def withDecodedSummary(df: DataFrame, idCol: String, binCol: String,
                         targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(binCol).as("__b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val d = decodeImage(bytes)
          val r = resizeDecoded(bytes, targetW, targetH)
          (id,
            d.map(_.width), d.map(_.height),
            d.map(_.sum_r), d.map(_.sum_g), d.map(_.sum_b),
            r.map(_.width), r.map(_.height),
            r.map(_.sum_r), r.map(_.sum_g), r.map(_.sum_b))
        }
      }
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b",
        "r_width", "r_height", "r_sum_r", "r_sum_g", "r_sum_b")
  }

  /** Deterministic REAL-PNG corpus with a closed-form raster: 64×32
    * TYPE_INT_RGB, left 32 columns one solid color, right 32 another,
    * both pure arithmetic in the id — so an oracle can compute the exact
    * decoded (and box-aligned resized) channel sums WITHOUT any decoder,
    * pinning the real decode path against independent arithmetic. */
  def syntheticRealPngs(spark: org.apache.spark.sql.SparkSession,
                        n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(64, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val a = ((i % 256) << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
      val b = (((i * 3) % 256) << 16) | (((i * 5) % 256) << 8) | ((i * 11) % 256)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 64) { img.setRGB(x, y, if (x < 32) a else b); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (i.toLong, bos.toByteArray)
    }.toDF("media_id", "payload")
  }

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach typed metadata + stub feature vector to a binary media column.
    * One typed pass; batch-shaped like a mapInPandas stage (iterator in/out,
    * per-partition amortization). */
  def withMediaFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("media_meta", mediaMetaSchema),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val dims = pngDims(bytes).orElse(jpegDims(bytes)).orElse(gifDims(bytes))
        val wav = wavFormat(bytes)
        val meta = Row(mediaKind(bytes),
          if (bytes == null) 0L else bytes.length.toLong,
          dims.map(_._1).orNull, dims.map(_._2).orNull,
          wav.map(_.sampleRate).orNull, wav.map(_.channels).orNull,
          wav.flatMap(_.durationMs).orNull)
        Row.fromSeq(r.toSeq :+ meta :+ stubDecodeFeatures(bytes, dim).toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** STUBBED resize: emits a PNG-shaped payload with the TARGET dims in a
    * real IHDR and a body that deterministically subsamples the source
    * bytes (a real implementation replaces this one function with an image
    * library call — schema, metadata, and plumbing stay as-is). */
  def stubResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R',
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte)
    val src = if (bytes == null) Array.emptyByteArray else bytes
    // body size tracks the target area; samples stride through the source
    val bodyLen = math.max(1, (w.toLong * h / 64).toInt)
    val body = new Array[Byte](bodyLen)
    if (src.nonEmpty) {
      var j = 0
      while (j < bodyLen) {
        body(j) = src((j.toLong * src.length / bodyLen).toInt)
        j += 1
      }
    }
    sig ++ ihdr ++ body
  }

  /** Attach a resized payload + its metadata struct. Typed per-row pass
    * (mapInPandas-shaped); the pixel transform is the stub above. */
  def withResized(df: DataFrame, binCol: String,
                  targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_meta", mediaMetaSchema)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = stubResize(r.getAs[Array[Byte]](idx), targetW, targetH)
        val dims = pngDims(out)
        Row.fromSeq(r.toSeq :+ out :+ Row(mediaKind(out), out.length.toLong,
          dims.map(_._1).orNull, dims.map(_._2).orNull, null, null, null))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("ts_ms", LongType),
    StructField("frame", BinaryType)))

  /** STUBBED frame sampling: `n` evenly spaced byte windows stand in for
    * decoded frames, timestamped at `frameMs` intervals (a real
    * implementation replaces this with a video decoder; the fan-out shape
    * downstream — explode to per-frame rows — is the real contract). */
  def stubSampleFrames(bytes: Array[Byte], n: Int,
                       frameMs: Long): Seq[(Int, Long, Array[Byte])] = {
    val src = if (bytes == null) Array.emptyByteArray else bytes
    (0 until n).map { i =>
      val start = (i.toLong * src.length / n).toInt
      val end = ((i + 1).toLong * src.length / n).toInt
      (i, i * frameMs, java.util.Arrays.copyOfRange(src, start, math.max(end, start)))
    }
  }

  /** Attach an array-of-frame-structs column (one row per media). */
  def withSampledFrames(df: DataFrame, binCol: String, nFrames: Int,
                        frameMs: Long): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("frames", ArrayType(frameSchema, containsNull = false)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val fs = stubSampleFrames(r.getAs[Array[Byte]](idx), nFrames, frameMs)
          .map { case (i, ts, b) => Row(i, ts, b) }
        Row.fromSeq(r.toSeq :+ fs)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-frame rows (media fan-out — the partition-count multiplier a real
    * video pipeline plans around). Pure Catalyst explode; the big binary
    * parent column is projected AWAY before the explode so the fan-out
    * duplicates only the id. */
  def explodeFrames(framed: DataFrame, idCol: String): DataFrame =
    framed.select(col(idCol), explode(col("frames")).as("f"))
      .select(col(idCol), col("f.frame_idx").as("frame_idx"),
        col("f.ts_ms").as("ts_ms"), col("f.frame").as("frame"))

  /** Deterministic synthetic media corpus (tiny PNG-headed blobs) for tests
    * and rows-only queries — no external data. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val w = 16 + (i % 64)
      val h = 16 + ((i * 7) % 64)
      val body = Array.tabulate[Byte](64)(j => ((i * 31 + j * 7) % 251).toByte)
      val payload = (i % 4) match {
        case 0 => syntheticPng(w, h, body)
        case 1 => syntheticJpeg(w, h, body)
        case 2 => syntheticGif(w, h, body)
        case _ => syntheticWav(8000 + 100 * (i % 40), 1 + (i % 2), 16, body)
      }
      (i.toLong, payload)
    }.toDF("media_id", "payload")
  }

  private def syntheticPng(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R',
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte)
    sig ++ ihdr ++ body
  }

  /** SOI + canonical APP0/JFIF + SOF0 (3 components) + body + EOI. */
  private def syntheticJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16,
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8,
      (h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++ body ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** GIF89a header + logical screen descriptor + body + trailer. */
  private def syntheticGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](w.toByte, (w >> 8).toByte, h.toByte, (h >> 8).toByte, 0, 0, 0) ++
      body ++ Array[Byte](0x3b)

  /** Canonical 44-byte RIFF/WAVE header (PCM fmt) + data chunk. */
  private[ops] def syntheticWav(rate: Int, channels: Int, bits: Int,
                                data: Array[Byte]): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    val blockAlign = channels * bits / 8
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def tag(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    tag("RIFF") ++ le32(36 + data.length) ++ tag("WAVE") ++
      tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(bits) ++
      tag("data") ++ le32(data.length) ++ data
  }
}
