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
  test("json-ld raw blocks") {
    assert(m.structuredData == Seq("""{"@context":"https://schema.org"}"""))
  }
  test("canonical href") {
    assert(m.canonical.contains("https://example.com/canonical/"))
  }
  test("fragmented title yields None (reference handle_metadata_errors)") {
    val d = HtmlParser.parse("<title>a<b>x</b></title>")
    assert(MetadataExtractor.extractTitle(d).isEmpty)
  }
  test("unparseable date meta dropped") {
    val d = HtmlParser.parse("""<meta name="date" content="not a date">""")
    assert(MetadataExtractor.extract(d).dateMetas.isEmpty)
  }
}
