package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("magic-byte sniffing") {
    assert(Multimodal.mediaKind("PNG\r\n".getBytes("ISO-8859-1")) == "image/png")
    assert(Multimodal.mediaKind(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) == "image/jpeg")
    assert(Multimodal.mediaKind("RIFFxxxxWAVEfmt ".getBytes) == "audio/wav")
    assert(Multimodal.mediaKind("RIFFxxxxAVI LIST".getBytes) == "video/avi")
    assert(Multimodal.mediaKind("RIFFxxxx".getBytes) == "riff")
    assert(Multimodal.mediaKind("GIF89a".getBytes) == "image/gif")
    assert(Multimodal.mediaKind("%PDF-1.4".getBytes) == "application/pdf")
    assert(Multimodal.mediaKind(Array[Byte](1, 2, 3, 4)) == "unknown")
    assert(Multimodal.mediaKind(null) == "unknown")
  }

  test("png dims parsed from IHDR") {
    val df = Multimodal.syntheticMedia(spark, 5)
    val bytes = df.orderBy($"media_id").select($"payload").as[Array[Byte]].head()
    assert(Multimodal.pngDims(bytes).contains((16, 16)))
  }

  test("jpeg dims from the SOF marker chain; malformed streams return None") {
    // synthetic corpus id 1 is a JPEG with w=17, h=23 (16+1, 16+7)
    val df = Multimodal.syntheticMedia(spark, 5)
    val jp = df.filter($"media_id" === 1).select($"payload").as[Array[Byte]].head()
    assert(Multimodal.jpegDims(jp).contains((17, 23)))
    // SOF not first segment: the scan walks past APP0 (already the case
    // in the corpus); truncation mid-SOF is None, not a crash
    assert(Multimodal.jpegDims(jp.take(24)).isEmpty)
    // EOI before any SOF
    assert(Multimodal.jpegDims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // desynced (non-FF where a marker should start)
    assert(Multimodal.jpegDims(Array(0xff, 0xd8, 0xff, 0xe0, 0, 4, 1, 1, 7, 7)
      .map(_.toByte)).isEmpty)
    assert(Multimodal.jpegDims(null).isEmpty)
  }

  test("gif dims little-endian; wav chunk walk yields format + duration") {
    val df = Multimodal.syntheticMedia(spark, 8)
    val gf = df.filter($"media_id" === 2).select($"payload").as[Array[Byte]].head()
    assert(Multimodal.gifDims(gf).contains((18, 30))) // 16+2, 16+14
    val wv = df.filter($"media_id" === 3).select($"payload").as[Array[Byte]].head()
    val f = Multimodal.wavFormat(wv).get
    // id 3: rate 8300, 2 channels, 16-bit, 64-byte data
    assert(f.sampleRate == 8300 && f.channels == 2 && f.bitsPerSample == 16)
    assert(f.durationMs.contains(64L * 1000 / (8300L * 2 * 16 / 8)))
    // odd-sized chunk before data: the walk honors word alignment
    def tag(s: String) = s.getBytes("US-ASCII")
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val odd = tag("RIFF") ++ le32(100) ++ tag("WAVE") ++
      tag("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3 + 1 pad
      wv.drop(12)
    val f2 = Multimodal.wavFormat(odd).get
    assert(f2.sampleRate == 8300 && f2.durationMs == f.durationMs)
    // fmt but no data chunk: format parses, duration absent
    val noData = wv.take(36)
    assert(Multimodal.wavFormat(noData).exists(_.durationMs.isEmpty))
    assert(Multimodal.wavFormat("RIFFxxxxAVI ".getBytes).isEmpty)
  }

  test("withMediaFeatures: schema, meta struct, deterministic stub features") {
    val df = Multimodal.syntheticMedia(spark, 50)
    val out = Multimodal.withMediaFeatures(df, "payload", dim = 8)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_meta", "features"))
    val rows = out.select($"media_id", $"media_meta.kind", $"media_meta.width",
      size($"features")).as[(Long, String, Option[Int], Int)].collect()
    assert(rows.length == 50)
    // mixed corpus: kind follows media_id % 4
    val kindById = rows.map(r => r._1 -> r._2).toMap
    assert(kindById(0L) == "image/png" && kindById(1L) == "image/jpeg")
    assert(kindById(2L) == "image/gif" && kindById(3L) == "audio/wav")
    assert(rows.forall(_._4 == 8))
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert(byId(0L).contains(16) && byId(1L).contains(17) && byId(2L).contains(18))
    // audio rows carry format, not dims
    val wavMeta = out.filter($"media_id" === 3)
      .select($"media_meta.width", $"media_meta.sample_rate", $"media_meta.channels")
      .collect()(0)
    assert(wavMeta.isNullAt(0) && wavMeta.getInt(1) == 8300 && wavMeta.getInt(2) == 2)
    // determinism across evaluations
    val f1 = out.orderBy($"media_id").select($"features").as[Seq[Float]].collect().toSeq
    val f2 = Multimodal.withMediaFeatures(df, "payload", dim = 8)
      .orderBy($"media_id").select($"features").as[Seq[Float]].collect().toSeq
    assert(f1 == f2)
  }

  test("withResized: target dims land in a parseable IHDR; deterministic") {
    val df = Multimodal.syntheticMedia(spark, 20)
    val out = Multimodal.withResized(df, "payload", 32, 24)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "resized", "resized_meta"))
    val rows = out.orderBy($"media_id")
      .select($"resized", $"resized_meta.kind", $"resized_meta.width",
        $"resized_meta.height")
      .as[(Array[Byte], String, Int, Int)].collect()
    assert(rows.length == 20)
    rows.foreach { case (bytes, kind, w, h) =>
      assert(kind == "image/png")
      assert((w, h) == (32, 24))
      // metadata agrees with an independent re-parse of the payload
      assert(Multimodal.pngDims(bytes).contains((32, 24)))
    }
    // deterministic across evaluations (oracle md5 compare depends on it)
    val a = out.orderBy($"media_id").select(md5(hex($"resized"))).as[String].collect().toSeq
    val b = Multimodal.withResized(df, "payload", 32, 24)
      .orderBy($"media_id").select(md5(hex($"resized"))).as[String].collect().toSeq
    assert(a == b)
  }

  test("frame sampling: n frames, fps timestamps, windows tile the payload") {
    val payload = Array.tabulate[Byte](103)(i => (i % 251).toByte)
    val frames = Multimodal.stubSampleFrames(payload, 4, 40L)
    assert(frames.map(_._1) == Seq(0, 1, 2, 3))
    assert(frames.map(_._2) == Seq(0L, 40L, 80L, 120L))
    // the windows partition the source exactly (no gaps/overlap/loss)
    assert(frames.flatMap(_._3).toSeq == payload.toSeq)
    // empty payload: n empty frames, not a crash
    val empty = Multimodal.stubSampleFrames(Array.emptyByteArray, 3, 40L)
    assert(empty.length == 3 && empty.forall(_._3.isEmpty))
  }

  test("explodeFrames: per-frame fan-out rows without the parent payload") {
    val df = Multimodal.syntheticMedia(spark, 10)
    val exploded = Multimodal.explodeFrames(
      Multimodal.withSampledFrames(df, "payload", 4, 40L), "media_id")
    assert(exploded.schema.fieldNames.toSeq ==
      Seq("media_id", "frame_idx", "ts_ms", "frame"))
    assert(exploded.count() == 40L)
    val perMedia = exploded.groupBy($"media_id").count()
      .select($"count").as[Long].collect()
    assert(perMedia.forall(_ == 4L))
  }

  test("features feed the similarity operators (plumbing end-to-end)") {
    val out = Multimodal.withMediaFeatures(Multimodal.syntheticMedia(spark, 30), "payload")
    val q = out.filter($"media_id" === 0).select($"features").as[Seq[Float]].head().toArray
    val top = Similarity.bruteForceTopK(out, "media_id", "features", q, 3)
      .select($"media_id").as[Long].collect()
    assert(top.head == 0L) // self is most similar
  }

  private def pngOf(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: REAL decode, hand-known pixels") {
    // 2×1: pure red then pure blue
    val png = pngOf(Array(Array(0xff0000, 0x0000ff)))
    assert(Multimodal.decodeImage(png).contains(
      Multimodal.DecodedImage(2, 1, 255L, 0L, 255L)))
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    // a truncated PNG must isolate, not throw
    assert(Multimodal.decodeImage(png.take(20)).isEmpty)
    // format-agnostic through the same entry point: GIF (lossless LZW +
    // palette; 2 colors quantize exactly) decodes to the same sums
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    assert(Multimodal.decodeImage(bos.toByteArray).contains(
      Multimodal.DecodedImage(2, 1, 255L, 0L, 255L)))
    // JPEG through the same entry point: lossy, so pin dims exactly and
    // a solid mid-gray (DC-only blocks) to a ±2/pixel channel tolerance
    val jimg = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) jimg.setRGB(x, y, 0x808080)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val jd = Multimodal.decodeImage(jbos.toByteArray).get
    assert(jd.width == 16 && jd.height == 8)
    val n = 16L * 8L
    Seq(jd.sum_r, jd.sum_g, jd.sum_b).foreach { s =>
      assert(math.abs(s - 0x80L * n) <= 2L * n, s"channel sum $s")
    }
  }

  test("resizeDecoded: integer box averages, floor division") {
    // 2×2 → 1×1: box holds (255,0,0),(0,0,255),(100,100,100),(3,5,7)
    // floor sums: r=(255+0+100+3)/4=89, g=(0+0+100+5)/4=26,
    // b=(0+255+100+7)/4=90
    val png = pngOf(Array(Array(0xff0000, 0x0000ff),
      Array(0x646464, 0x030507)))
    assert(Multimodal.resizeDecoded(png, 1, 1).contains(
      Multimodal.DecodedImage(1, 1, 89L, 26L, 90L)))
    // upscale request → None (op is a downsampler)
    assert(Multimodal.resizeDecoded(png, 4, 4).isEmpty)
  }

  test("decodeWavPcm16: REAL sample decode, hand-known values") {
    // samples 1000, -1000, 7 → n=3 sum=7 abs=2007 peak=1000
    val data = Array[Byte](
      (1000 & 0xff).toByte, ((1000 >> 8) & 0xff).toByte,
      ((-1000) & 0xff).toByte, (((-1000) >> 8) & 0xff).toByte,
      7, 0)
    val wav = Multimodal.syntheticWav(8000, 1, 16, data)
    assert(Multimodal.decodeWavPcm16(wav).contains(
      Multimodal.DecodedAudio(3L, 7L, 2007L, 1000L)))
    assert(Multimodal.decodeWavPcm16(null).isEmpty)
    assert(Multimodal.decodeWavPcm16(wav.take(30)).isEmpty)
    // 8-bit fmt → not the PCM-16 contract → None, never garbage sums
    val wav8 = Multimodal.syntheticWav(8000, 1, 8, data)
    assert(Multimodal.decodeWavPcm16(wav8).isEmpty)
  }

  test("withDecodedAudio over the closed-form corpus matches arithmetic") {
    val out = Multimodal.withDecodedAudio(
        Multimodal.syntheticRealWavs(spark, 10, samples = 64),
        "media_id", "payload")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val vals = (0 until 64).map(j => (r._1 * 31 + j * 7) % 2001 - 1000)
      assert(r._2.contains(64L))
      assert(r._3.contains(vals.sum))
      assert(r._4.contains(vals.map(math.abs).sum))
      assert(r._5.contains(vals.map(math.abs).max))
    }
  }

  test("withDecodedSummary over the closed-form corpus matches arithmetic") {
    val out = Multimodal.withDecodedSummary(
        Multimodal.syntheticRealPngs(spark, 12), "media_id", "payload", 16, 8)
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Long],
        Option[Long], Option[Int], Option[Int], Option[Long], Option[Long],
        Option[Long])].collect()
    assert(out.length == 12)
    out.foreach { r =>
      val i = r._1
      val (ar, ag, ab) = (i % 256, (i * 7) % 256, (i * 13) % 256)
      val (br, bg, bb) = ((i * 3) % 256, (i * 5) % 256, (i * 11) % 256)
      assert(r._2.contains(64) && r._3.contains(32))
      assert(r._4.contains(32L * (32L * ar + 32L * br)), s"id=$i")
      assert(r._5.contains(32L * (32L * ag + 32L * bg)))
      assert(r._6.contains(32L * (32L * ab + 32L * bb)))
      // 16×8 boxes are 4×4 and never straddle the column-32 split
      assert(r._7.contains(16) && r._8.contains(8))
      assert(r._9.contains(8L * (8L * ar + 8L * br)))
      assert(r._10.contains(8L * (8L * ag + 8L * bg)))
      assert(r._11.contains(8L * (8L * ab + 8L * bb)))
    }
  }
}
