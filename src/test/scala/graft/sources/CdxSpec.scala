package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class CdxSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val good = "com,example)/page 20240315120000 " +
    "{\"url\":\"https://example.com/page\",\"mime\":\"text/html\"," +
    "\"status\":\"200\",\"digest\":\"ABC\",\"length\":\"2526\"," +
    "\"offset\":\"312\",\"filename\":\"seg-0.warc.gz\"}"

  test("parse: well-formed line, every field typed; JSON tail with a " +
      "space inside survives the 3-way split") {
    val withSpace = good.replace("\"mime\":\"text/html\"",
      "\"mime\":\"text/html\",\"note\":\"has space here\"")
    val out = Cdx.parse(Seq(good, withSpace).toDF("line")).collect()
    out.foreach { r =>
      assert(r.getAs[String]("urlkey") == "com,example)/page")
      // 2024-03-15T12:00:00Z
      assert(r.getAs[Long]("ts_unix") == 1710504000L)
      assert(r.getAs[String]("url") == "https://example.com/page")
      assert(r.getAs[Int]("status") == 200)
      assert(r.getAs[Long]("length") == 2526L)
      assert(r.getAs[Long]("offset") == 312L)
      assert(r.getAs[String]("filename") == "seg-0.warc.gz")
    }
  }

  test("parse: hostile lines isolate to NULLs, never a dead job (ANSI)") {
    val rows = Seq(
      "oneword",                                   // no spaces at all
      "two words",                                 // no JSON part
      "k 20240101000000 not json at all",          // garbage JSON
      "k 99999999999999 {\"status\":\"200\"}",     // invalid timestamp
      "k 20240101000000 {\"status\":\"12x\",\"length\":\"-\",\"offset\":\"9e9\"}",
      "")                                          // empty line
    val out = Cdx.parse(rows.toDF("line")).collect()
    assert(out.length == rows.length)
    val byKey = out.map(r => Option(r.getAs[String]("urlkey")).getOrElse("∅"))
    assert(byKey.contains("oneword"))
    // invalid ts -> null epoch; unparseable numerics -> null via try_cast
    out.foreach { r =>
      if (r.getAs[String]("urlkey") == "k") {
        assert(r.isNullAt(r.fieldIndex("status")) ||
          r.getAs[Int]("status") == 200)
        assert(r.isNullAt(r.fieldIndex("length")))
      }
    }
  }

  test("fetchRanges: only successful html captures with complete ranges") {
    val lines = Seq(
      good,
      good.replace("\"status\":\"200\"", "\"status\":\"404\""),
      good.replace("\"mime\":\"text/html\"", "\"mime\":\"image/png\""),
      good.replace(",\"filename\":\"seg-0.warc.gz\"", ""))
    val out = Cdx.fetchRanges(Cdx.parse(lines.toDF("line")))
      .as[(String, Long, Long, String)].collect()
    assert(out.toSeq ==
      Seq(("seg-0.warc.gz", 312L, 2526L, "https://example.com/page")))
  }
}
