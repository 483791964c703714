package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Sitemap seed-table operator (reference parse_sitemap,
  * core/scraper.py:689-714): urlset extraction, closed-world
  * sitemapindex recursion, missing-child tolerance, and the xmltodict
  * single-entry quirk. */
class SitemapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val host = "https://site.example.com"

  test("parseSitemap classifies urlset vs sitemapindex and pulls locs") {
    val (k1, l1) = Sitemap.parseSitemap(
      """<?xml version="1.0"?><urlset><url><loc>https://a/1</loc></url>
        |<url><loc>https://a/2</loc></url></urlset>""".stripMargin)
    assert(k1 == "urlset" && l1 == Seq("https://a/1", "https://a/2"))
    val (k2, l2) = Sitemap.parseSitemap(
      """<?xml version="1.0"?><sitemapindex><sitemap><loc>https://a/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>""".stripMargin)
    assert(k2 == "sitemapindex" && l2 == Seq("https://a/s1.xml", "https://a/s2.xml"))
    assert(Sitemap.parseSitemap("<html><body>not a sitemap</body></html>")._1 == "none")
  }

  test("single-entry sitemap reproduces the reference's xmltodict failure (quirk)") {
    // for one <url> child, the reference iterates the entry dict's KEYS and
    // crashes on url['loc'] — such sitemaps yield no seeds, flagged
    val (k, l) = Sitemap.parseSitemap(
      """<?xml version="1.0"?><urlset><url><loc>https://a/only</loc></url></urlset>""")
    assert(k == "parse_error" && l.isEmpty)
  }

  test("seedUrls: recursive in-corpus resolution, missing children tolerated, orphans excluded") {
    val pages = Sitemap.syntheticSitemapPages(spark)
    val seeds = Sitemap.seedUrls(pages, s"$host/sitemap.xml")
      .as[String].collect().toSet
    assert(seeds == Set(
      s"$host/docs/intro.html", s"$host/docs/guide.html", s"$host/docs/api.html",
      s"$host/blog/post1.html"))
    // orphan urlset not reachable from the root index
    assert(!seeds.exists(_.contains("orphan")))
  }

  test("seedUrls stays distributed: 125k seeds, no driver collect (r02 wrong #1)") {
    import graft.pipeline.PageRow
    val ts = new java.sql.Timestamp(1700000000000L)
    val nSets = 50
    val perSet = 2500
    val rows = PageRow(s"$host/big.xml", ts,
      (s"""<?xml version="1.0"?><sitemapindex>""" +
        (0 until nSets).map(i => s"<sitemap><loc>$host/set$i.xml</loc></sitemap>").mkString +
        "</sitemapindex>").getBytes("UTF-8"), null, "en") +:
      (0 until nSets).map { i =>
        PageRow(s"$host/set$i.xml", ts,
          (s"""<?xml version="1.0"?><urlset>""" +
            (0 until perSet).map(j => s"<url><loc>$host/p/${i}_$j.html</loc></url>").mkString +
            "</urlset>").getBytes("UTF-8"), null, "en")
      }
    val seeds = Sitemap.seedUrls(spark.createDataset(rows), s"$host/big.xml")
    // the returned frame must read executor-side checkpointed partitions,
    // not a driver-materialized LocalRelation (the old collect() shape)
    val logical = seeds.queryExecution.logical.toString()
    assert(!logical.contains("LocalRelation"), s"driver-materialized plan:\n$logical")
    assert(seeds.count() == nSets.toLong * perSet)
  }

  test("frontier hop is a broadcast join, not a literal In/InSet (r03 wrong #4)") {
    import graft.pipeline.PageRow
    val ts = new java.sql.Timestamp(1700000000000L)
    val nSets = 10000
    // a 10^4-child sitemapindex: every child is a frontier member on hop 2
    val rows = PageRow(s"$host/huge.xml", ts,
      (s"""<?xml version="1.0"?><sitemapindex>""" +
        (0 until nSets).map(i => s"<sitemap><loc>$host/h$i.xml</loc></sitemap>").mkString +
        "</sitemapindex>").getBytes("UTF-8"), null, "en") +:
      (0 until 3).map { i => // only a few children exist in-corpus
        PageRow(s"$host/h$i.xml", ts,
          (s"""<?xml version="1.0"?><urlset>""" +
            (0 until 2).map(j => s"<url><loc>$host/hp/${i}_$j.html</loc></url>").mkString +
            "</urlset>").getBytes("UTF-8"), null, "en")
      }
    val e = Sitemap.entries(spark.createDataset(rows))
    val frontier = (0 until nSets).map(i => s"$host/h$i.xml")
    val hit = Sitemap.frontierHits(e, frontier)
    val plan = hit.queryExecution.optimizedPlan.toString()
    assert(!plan.contains(" IN ") && !plan.contains("INSET"),
      s"literal membership predicate in plan:\n${plan.take(2000)}")
    assert(hit.filter(hit("kind") === "urlset").count() == 6)
    // end-to-end through seedUrls: same join path, right seeds
    val seeds = Sitemap.seedUrls(spark.createDataset(rows), s"$host/huge.xml")
    assert(seeds.count() == 6)
  }

  test("null html rows are skipped, not task-fatal") {
    val ts = new java.sql.Timestamp(1700000000000L)
    val withNull = Sitemap.syntheticSitemapPages(spark).union(
      spark.createDataset(Seq(
        graft.pipeline.PageRow(s"$host/broken.xml", ts, null, null, "en"))))
    val e = Sitemap.entries(withNull)
    assert(e.filter(e("url") === s"$host/broken.xml").count() == 0)
    assert(e.count() == Sitemap.entries(Sitemap.syntheticSitemapPages(spark)).count())
  }

  test("CDATA-wrapped locs parse like expat text (xml branch)") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc><![CDATA[https://e.com/a?x=1&y=2]]></loc></url>
      |<url><loc>https://e.com/b</loc></url>
      |</urlset>""".stripMargin
    val (kind, locs) = Sitemap.parseSitemap(xml)
    assert(kind == "urlset")
    assert(locs == Seq("https://e.com/a?x=1&y=2", "https://e.com/b"))
  }

  test("entries emits one row per loc with kind; parse_error rows carry null loc") {
    val e = Sitemap.entries(Sitemap.syntheticSitemapPages(spark))
      .as[(String, String, String)].collect()
    assert(e.count(_._2 == "urlset") == 5 + 2) // A(3) + B(2) — orphan(2) also parses
    assert(e.count(_._2 == "sitemapindex") == 3 + 2)
    val err = e.filter(_._2 == "parse_error")
    assert(err.length == 1 && err(0)._1 == s"$host/sitemap_single.xml" && err(0)._3 == null)
  }
}
