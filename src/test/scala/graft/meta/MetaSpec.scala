package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HtmlParser

/** F10: metadata extracted from the RAW dom (pre-clean — the reference's own
  * pass order would have emptied every <meta> first; SURVEY §2.3). */
class MetaSpec extends AnyFunSuite {

  private val page = """<html><head>
    <title>My Page</title>
    <meta name="description" content="Desc here">
    <meta name="keywords" content="a,b,c">
    <meta name="author" content="  Ada Lovelace ">
    <meta name="author" content="Linus">
    <meta name="date" content="2024-01-15">
    <meta name="modified" content="2024-03-05T10:30:00">
    <meta name="last-modified" content="2024-02-20">
    <meta property="og:title" content="OG Title">
    <meta property="og:image" content="https://e.com/i.png">
    <link rel="canonical" href="https://example.com/canonical/">
    <script type="application/ld+json">{"@context":"https://schema.org"}</script>
    </head><body><p>b</p></body></html>"""

  private val m = MetadataExtractor.extract(HtmlParser.parse(page))

  test("title") { assert(m.title.contains("My Page")) }
  test("description/keywords") {
    assert(m.description.contains("Desc here"))
    assert(m.keywords.contains("a,b,c"))
  }
  test("authors stripped, in order") {
    assert(m.authors == Seq("Ada Lovelace", "Linus"))
  }
  test("date metas ISO-normalized (dateutil isoformat shape)") {
    assert(m.dateMetas == Seq("date" -> "2024-01-15T00:00:00",
      "modified" -> "2024-03-05T10:30:00"))
  }
  test("last-modified ISO-normalized") {
    assert(m.lastModified.contains("2024-02-20T00:00:00"))
  }
  test("og map sans og: prefix") {
    assert(m.og == Seq("title" -> "OG Title", "image" -> "https://e.com/i.png"))
  }
  test("json-ld raw blocks (syntax-tagged) + og metas as rdfa doc subject") {
    assert(m.structuredData.filter(_.syntax == "json-ld").map(_.data) ==
      Seq("""{"@context":"https://schema.org"}"""))
    // og: metas are RDFa property attrs → one document-level rdfa subject
    // with the og: prefix resolved via the RDFa 1.1 initial context
    assert(m.structuredData.filter(_.syntax == "rdfa").map(_.data) == Seq(
      """{"@id":"","http://ogp.me/ns#title":"OG Title","http://ogp.me/ns#image":"https://e.com/i.png"}"""))
  }
  test("canonical href") {
    assert(m.canonical.contains("https://example.com/canonical/"))
  }
  test("fragmented title yields None (reference handle_metadata_errors)") {
    val d = HtmlParser.parse("<title>a<b>x</b></title>")
    assert(MetadataExtractor.extractTitle(d).isEmpty)
    assert(MetadataExtractor.extract(d).title.isEmpty)
  }
  test("single-tag-wrapped title recurses like bs4 .string") {
    // html.parser parses tags inside <title> (only script/style are CDATA),
    // and Tag.string recurses through a single element child
    val d = HtmlParser.parse("<title><b>T</b></title>")
    assert(MetadataExtractor.extractTitle(d).contains("T"))
    assert(MetadataExtractor.extract(d).title.contains("T"))
  }
  test("unparseable date meta dropped") {
    val d = HtmlParser.parse("""<meta name="date" content="not a date">""")
    assert(MetadataExtractor.extract(d).dateMetas.isEmpty)
  }

  // ---- microdata (WHATWG item crawl; extruct output shape) ----

  private def structured(html: String, url: String = "https://ex.com/p/") =
    MetadataExtractor.extract(HtmlParser.parse(html), url).structuredData

  test("microdata: nested item, multi-value props, per-tag value table") {
    val html = """<div itemscope itemtype="https://schema.org/Person">
      <span itemprop="name">Alice  B.</span>
      <img itemprop="image" src="/a.png">
      <a itemprop="url" href="about.html">home</a>
      <meta itemprop="height" content="170">
      <time itemprop="birthDate" datetime="1990-01-02">Jan 2 1990</time>
      <span itemprop="tag">x</span><span itemprop="tag">y</span>
      <div itemprop="address" itemscope itemtype="https://schema.org/PostalAddress">
        <span itemprop="city">Zurich</span>
      </div></div>"""
    val md = structured(html).filter(_.syntax == "microdata").map(_.data)
    assert(md == Seq("""{"type":"https://schema.org/Person","properties":{""" +
      """"name":"Alice B.","image":"https://ex.com/a.png",""" +
      """"url":"https://ex.com/p/about.html","height":"170",""" +
      """"birthDate":"1990-01-02","tag":["x","y"],""" +
      """"address":{"type":"https://schema.org/PostalAddress","properties":{"city":"Zurich"}}}}"""))
  }

  test("microdata: itemref pulls out-of-tree properties; itemid absolutized") {
    val html = """<div id="meta-block"><span itemprop="band">ACME</span></div>
      <div itemscope itemid="/ids/1" itemref="meta-block missing-id">
        <span itemprop="name">Bob</span></div>"""
    val md = structured(html).filter(_.syntax == "microdata").map(_.data)
    assert(md == Seq("""{"id":"https://ex.com/ids/1","properties":{""" +
      """"name":"Bob","band":"ACME"}}"""))
  }

  test("microdata: multiple itemprop names fan out; base href respected") {
    val html = """<head><base href="https://cdn.ex.org/root/"></head>
      <body><div itemscope><img itemprop="logo icon" src="l.png"></div></body>"""
    val md = structured(html).filter(_.syntax == "microdata").map(_.data)
    assert(md == Seq("""{"properties":{"logo":"https://cdn.ex.org/root/l.png",""" +
      """"icon":"https://cdn.ex.org/root/l.png"}}"""))
  }

  // ---- RDFa Lite ----

  test("rdfa: typeof subject with vocab terms, nested typeof, resource id") {
    val html = """<div vocab="https://schema.org/" typeof="Person" resource="#me">
      <span property="name">Carol</span>
      <a property="url" href="/c">c</a>
      <div property="address" typeof="PostalAddress">
        <span property="addressLocality">Bern</span>
      </div></div>"""
    val r = structured(html).filter(_.syntax == "rdfa").map(_.data)
    assert(r == Seq("""{"@id":"https://ex.com/p/#me","@type":"https://schema.org/Person",""" +
      """"https://schema.org/name":"Carol","https://schema.org/url":"https://ex.com/c",""" +
      """"https://schema.org/address":{"@type":"https://schema.org/PostalAddress",""" +
      """"https://schema.org/addressLocality":"Bern"}}"""))
  }

  test("rdfa: prefix attr declarations resolve CURIEs; unknown prefix verbatim") {
    val html = """<div prefix="ex: http://ex.org/ns#" typeof="ex:Thing">
      <span property="ex:p">v</span><span property="zz:q">w</span></div>"""
    val r = structured(html).filter(_.syntax == "rdfa").map(_.data)
    assert(r == Seq("""{"@type":"http://ex.org/ns#Thing",""" +
      """"http://ex.org/ns#p":"v","zz:q":"w"}"""))
  }

  test("rdfa: bare term without vocab dropped; content attr beats text") {
    val html = """<div typeof="schema:Article">
      <span property="untermed">gone</span>
      <span property="schema:name" content="from-content">from-text</span></div>"""
    val r = structured(html).filter(_.syntax == "rdfa").map(_.data)
    assert(r == Seq("""{"@type":"http://schema.org/Article",""" +
      """"http://schema.org/name":"from-content"}"""))
  }

  test("no structured markup → no microdata/rdfa entries") {
    assert(structured("<p>plain</p>").isEmpty)
  }
}
