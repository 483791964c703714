package graft.tools

import graft.pipeline.{Extract, PageRow, PagesGen}

/** Empirical probe: which failure_class does each adversarial input land
  * in? (Drives the taxonomy e2e assertions — run, read, pin.) */
object FailureClassProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.pipeline.SparkTestBase.spark
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    val html = PagesGen.htmlOf(1L, 7L).getBytes("UTF-8")
    val probes = Seq(
      ("null-payload", PageRow("https://h/p0.html", ts, null, null, "en")),
      ("null-url-html", PageRow(null, ts, html, null, "en")),
      ("bad-ipv6-url", PageRow("http://[bad/x.html", ts, html, null, "en")),
      ("bad-port-url", PageRow("http://h:99999999999/x.html", ts, html, null, "en")),
      ("truncated-pdf", PageRow("https://h/p.pdf", ts,
        "%PDF-1.4\nstream\nBT (unclosed".getBytes("ISO-8859-1"), null, "en")),
      ("xml-garbage", PageRow("https://h/x.xml", ts,
        "<?xml version=\"1.0\"?><a><b></a>".getBytes("UTF-8"), null, "en")))
    probes.foreach { case (name, row) =>
      val out = Extract.extract(Seq(row).toDS()).collect()(0).doc
      println(s"PROBE $name -> failed=${out.parse_failed} class=${out.failure_class} reason=${out.failure_reason} kind=${out.content_kind}")
    }
    println("PROBE_DONE")
    spark.stop()
  }
}
