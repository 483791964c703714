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
    assert(Multimodal.mediaKind("%PDF-1.4".getBytes) == "application/pdf")
    assert(Multimodal.mediaKind(Array[Byte](1, 2, 3, 4)) == "unknown")
    assert(Multimodal.mediaKind(null) == "unknown")
  }

  test("png dims parsed from IHDR") {
    val df = Multimodal.syntheticMedia(spark, 5)
    val bytes = df.orderBy($"media_id").select($"payload").as[Array[Byte]].head()
    assert(Multimodal.pngDims(bytes).contains((16, 16)))
  }

  test("withMediaFeatures: schema, meta struct, deterministic stub features") {
    val df = Multimodal.syntheticMedia(spark, 50)
    val out = Multimodal.withMediaFeatures(df, "payload", dim = 8)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_meta", "features"))
    val rows = out.select($"media_id", $"media_meta.kind", $"media_meta.width",
      size($"features")).as[(Long, String, Int, Int)].collect()
    assert(rows.length == 50)
    assert(rows.forall(_._2 == "image/png"))
    assert(rows.forall(_._4 == 8))
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert(byId(0L) == 16 && byId(1L) == 17)
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
}
