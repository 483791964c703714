package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Extract, PagesGen, SparkTestBase}

/** End-to-end: the WARC ingestion path (archive → records → HTTP bodies →
  * PageRow) feeds Extract.run and produces BYTE-IDENTICAL docs_clean rows
  * to the same pages arriving as a direct table — the decode boundary
  * (HtmlParser.decode over raw response bytes) and the whole cleaning
  * pipeline are invariant to which source shape delivered the bytes. */
class WarcExtractE2ESpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  test("WARC-sourced extraction == direct-table extraction, byte for byte") {
    import spark.implicits._
    val n = 40
    val base = s"/tmp/graft_warc_e2e_${System.nanoTime()}"
    try {
      val viaWarc = Warc.pages(Warc.syntheticWarcFrame(spark, n,
        withBroken = true, gzipMembers = true))
      val direct = (0 until n).map(i => PagesGen.pageOf(i.toLong))
        .toDS()
      Extract.run(spark, viaWarc, s"$base/warc", "e2e_warc")
      Extract.run(spark, direct, s"$base/direct", "e2e_direct")
      val a = spark.read.parquet(s"$base/warc/docs_clean")
        .select($"url", $"text", $"content_sha256", $"content_kind")
        .as[(String, String, String, String)].collect().sortBy(_._1)
      val b = spark.read.parquet(s"$base/direct/docs_clean")
        .select($"url", $"text", $"content_sha256", $"content_kind")
        .as[(String, String, String, String)].collect().sortBy(_._1)
      assert(a.length == n && b.length == n)
      a.zip(b).foreach { case (x, y) => assert(x == y, x._1) }
    } finally rmrf(new java.io.File(base))
  }
}
