package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HtmlParser

/** update_asset_references (core/scraper.py:916-931) — the raw-vs-joined
  * membership quirk and the os.path.relpath target shape. */
class AssetRewriteSpec extends AnyFunSuite {

  private val base = "https://docs.example.com/docs/page.html"

  test("absolute refs are rewritten to local asset paths; relative refs never match (quirk)") {
    val doc = HtmlParser.parse(
      """<html><head>
        |<link rel="stylesheet" href="https://docs.example.com/theme/site.css">
        |<link rel="stylesheet" href="local/style.css">
        |</head><body>
        |<script src="https://cdn.example.com/js/app.js">var inline = 1;</script>
        |<script src="relative.js">var inline2 = 1;</script>
        |<img src="https://docs.example.com/img/logo.png">
        |<img src="pics/photo.jpg">
        |</body></html>""".stripMargin)
    val n = Sanitize.updateAssetReferences(doc, base)
    assert(n == 3, s"rewrote $n")
    val links = doc.findAll("link").flatMap(_.attr("href"))
    assert(links.contains("assets/css/theme/site.css"), links.toString)
    assert(links.contains("local/style.css")) // relative: joined set misses raw attr
    val scripts = doc.findAll("script").flatMap(_.attr("src"))
    assert(scripts.contains("assets/js/js/app.js"), scripts.toString)
    assert(scripts.contains("relative.js"))
    val imgs = doc.findAll("img").flatMap(_.attr("src"))
    assert(imgs.contains("assets/images/img/logo.png"), imgs.toString)
    assert(imgs.contains("pics/photo.jpg"))
  }

  test("relpath normalization collapses dot segments like os.path.relpath") {
    assert(Sanitize.posixNormpathRel("assets/css/a/../b.css") == "assets/css/b.css")
    assert(Sanitize.posixNormpathRel("assets/css//x/./y.css") == "assets/css/x/y.css")
    assert(Sanitize.posixNormpathRel("assets/css/../../../up.css") == "../up.css")
  }

  test("pipeline position: only surviving script[src]-with-body is rewritten post-clean") {
    // after pass-1 empty-tag removal, void <link>/<img> and bodyless
    // <script src> are gone; a script with BOTH src and a body survives
    // and gets rewritten (reference call order, scraper.py:502-510)
    val html = """<html><body><p>text</p>
      |<script src="https://cdn.example.com/app.js">var kept = true;</script>
      |<script src="https://cdn.example.com/gone.js"></script>
      |</body></html>""".stripMargin
    val res = Cleaner.cleanAndNormalize(html, base)
    Sanitize.updateAssetReferences(res.cleanedDoc, base)
    val srcs = res.cleanedDoc.findAll("script").flatMap(_.attr("src"))
    assert(srcs == Vector("assets/js/app.js"), srcs.toString)
  }
}
