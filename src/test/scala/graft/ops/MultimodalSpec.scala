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

  test("features feed the similarity operators (plumbing end-to-end)") {
    val out = Multimodal.withMediaFeatures(Multimodal.syntheticMedia(spark, 30), "payload")
    val q = out.filter($"media_id" === 0).select($"features").as[Seq[Float]].head().toArray
    val top = Similarity.bruteForceTopK(out, "media_id", "features", q, 3)
      .select($"media_id").as[Long].collect()
    assert(top.head == 0L) // self is most similar
  }
}
