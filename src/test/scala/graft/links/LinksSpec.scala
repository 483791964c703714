package graft.links

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HtmlParser

/** F11 + F20: link extraction, pagination classification, assets, anchors. */
class LinksSpec extends AnyFunSuite {

  private val url = "https://docs.example.com/docs/page.html"

  test("F11 media-tag edges, normalized and classified") {
    val d = HtmlParser.parse(
      """<a href="a.html">A</a><img src="i.png"><video src="v.mp4"></video>
        |<audio src="s.mp3"></audio><source src="x.webm"><iframe src="f.html"></iframe>
        |<a href="pg2.html">2</a><a href="n.html">Next</a><a href="p.html">previous page</a>
        |<a href="f.html">First</a><a href="l.html">Última</a><a href="m.html">load more</a>
        |<a href="no.html">Nexus</a>""".stripMargin)
    val es = LinkExtractor.edges(d, url)
    val byDst = es.map(e => e.dstUrl -> e.kind).toMap
    assert(byDst("https://docs.example.com/docs/a.html") == "link")
    assert(byDst("https://docs.example.com/docs/pg2.html") == "pagination")
    assert(byDst("https://docs.example.com/docs/n.html") == "pagination")
    assert(byDst("https://docs.example.com/docs/p.html") == "pagination")
    assert(byDst("https://docs.example.com/docs/f.html") == "pagination")
    assert(byDst("https://docs.example.com/docs/l.html") == "pagination")
    assert(byDst("https://docs.example.com/docs/m.html") == "pagination")
    // "Nexus" does not contain "Next" — stays a plain link
    assert(byDst("https://docs.example.com/docs/no.html") == "link")
    // img/video/audio/source/iframe edges present
    assert(es.count(_.srcTag == "img") >= 1)
    assert(es.exists(_.srcTag == "video"))
    assert(es.exists(_.srcTag == "source"))
  }

  test("F11b numbered pagination anchored; bs4 .string recursion; fragmented skipped") {
    // bs4 Tag.string recurses through a chain of SINGLE element children,
    // so <a><b>3</b></a> matches the numbered-pagination filter exactly as
    // find_all('a', text=re.compile(r'^\d+$')) does; an anchor with more
    // than one child has .string None and is skipped
    val d = HtmlParser.parse(
      """<a href="x.html">12</a><a href="y.html">12b</a><a href="z.html"><b>3</b></a>
        |<a href="w.html">1<b>2</b></a><a href="v.html"><span><em>Next</em></span></a>""".stripMargin)
    val pag = LinkExtractor.paginationLinks(d, url).toSet
    assert(pag == Set(
      "https://docs.example.com/docs/x.html",
      "https://docs.example.com/docs/z.html",
      "https://docs.example.com/docs/v.html"))
  }

  test("extract_links error granularity is page-level, like the reference") {
    // one link whose normalize raises (port out of range) empties BOTH
    // sets for the page (link_extractor.py:13-31 wraps the WHOLE loop)
    val d = HtmlParser.parse(
      """<a href="/docs/good.html">ok</a><a href="2.html">2</a>
        |<a href="https://docs.example.com:99999/docs/bad.html">boom</a>""".stripMargin)
    val (links, pag) = LinkExtractor.extractLinks(d, url, "docs.example.com", "/docs")
    assert(links.isEmpty && pag.isEmpty)
    // without the poisoned link the same page yields its links
    val ok = HtmlParser.parse("""<a href="/docs/good.html">ok</a><a href="2.html">2</a>""")
    val (links2, pag2) = LinkExtractor.extractLinks(ok, url, "docs.example.com", "/docs")
    // the pagination anchor is ALSO a valid content link (the reference's
    // loop iterates every media tag — the sets overlap)
    assert(links2 == Seq("https://docs.example.com/docs/good.html",
      "https://docs.example.com/docs/2.html"))
    assert(pag2 == Seq("https://docs.example.com/docs/2.html"))
  }

  test("extract_links validity filter: domain + path prefix") {
    val d = HtmlParser.parse(
      """<a href="/docs/in.html">in</a><a href="/other/out.html">out</a>
        |<a href="https://evil.com/docs/x.html">x</a><a href="ftp://f/docs/y">y</a>""".stripMargin)
    val (links, _) = LinkExtractor.extractLinks(d, url, "docs.example.com", "/docs")
    assert(links == Seq("https://docs.example.com/docs/in.html"))
  }

  test("F20 MathJax config extensions → asset edges") {
    val d = HtmlParser.parse(
      """<script>MathJax.Hub.Config({"extensions": ["tex2jax.js", "mml2jax.js"]});</script>""")
    val es = LinkExtractor.assetEdges(d, "https://e.com/p/")
    assert(es.map(_.dstUrl).toSet == Set(
      "https://e.com/p/mathjax/extensions/tex2jax.js.js",
      "https://e.com/p/mathjax/extensions/mml2jax.js.js",
      "https://e.com/p/mathjax/MathJax.js"))
    assert(es.filter(_.kind == "math").size == 2)
  }

  test("css/js/image asset edges") {
    val d = HtmlParser.parse(
      """<link rel="stylesheet" href="s.css"><script src="a.js"></script><img src="i.png">""")
    val es = LinkExtractor.assetEdges(d, "https://e.com/")
    assert(es.map(e => (e.kind, e.dstUrl)).toSet == Set(
      ("css", "https://e.com/s.css"), ("js", "https://e.com/a.js"),
      ("image", "https://e.com/i.png")))
  }

  test("anchor ids: id attrs and a[name]") {
    val d = HtmlParser.parse(
      """<h1 id="intro">I</h1><a name="legacy">x</a><p id="s2">t</p>""")
    assert(LinkExtractor.anchorIds(d) == Seq("intro", "legacy", "s2"))
  }
}
