package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/**
 * Pipeline-level behavior of the round-3 parser construct work: marked
 * sections, EOF resync, and page rejection flow through `Extract.extractPage`
 * exactly like the reference's per-page processing (bs4 raises
 * ParserRejectedMarkup out of BeautifulSoup(...) → the page errors; CData
 * text joins get_text()).
 */
class ConstructPipelineSpec extends AnyFunSuite {

  private def page(html: String): PageRow =
    PageRow("https://docs.example.com/p/", new Timestamp(1700000000000L),
      html.getBytes("UTF-8"), null, "en")

  test("CDATA marked-section text joins the extracted text") {
    val r = Extract.extractPage(page(
      "<html><body><p>before</p><![CDATA[kept > text]]><p>after</p></body></html>"), 16)
    assert(!r.doc.parse_failed)
    assert(r.doc.text == "beforekept > textafter")
  }

  test("entities inside CDATA unescape in pass 2 (find_all(text=True) matches CData)") {
    val r = Extract.extractPage(page(
      "<html><body><p>a</p><![CDATA[x &amp; y]]></body></html>"), 16)
    assert(!r.doc.parse_failed)
    assert(r.doc.text == "ax & y")
  }

  test("MS-Office conditional section keywords launder into the text (pass-2, r4)") {
    val r = Extract.extractPage(page(
      "<html><body><![if gte mso 9]><p>mso only</p><![endif]><p>t</p></body></html>"), 16)
    assert(!r.doc.parse_failed)
    // the if/endif DECLARATIONS are laundered to plain text by pass 2
    // (bs4 find_all(text=True) + replace_with(str), SURVEY §7.5 #1 —
    // settled r4); the <p> between them is real markup
    assert(r.doc.text == "if gte mso 9mso onlyendift")
  }

  test("unknown marked-section keyword rejects the page as parse_failed") {
    val r = Extract.extractPage(page(
      "<html><body><![foo]><p>t</p></body></html>"), 16)
    assert(r.doc.parse_failed)
    assert(r.doc.failure_reason != null && r.doc.failure_reason.contains("RejectedMarkup"))
  }

  test("unterminated comment resyncs instead of swallowing the document") {
    val r = Extract.extractPage(page(
      "<html><body><p>a</p><!-- open > <p>visible</p></body></html>"), 16)
    assert(!r.doc.parse_failed)
    // CPython resync: "<!-- open >" becomes data; the following <p> still parses.
    // The comment-shaped data chunk survives comment REMOVAL (it is text, not
    // a Comment node) and the whitespace collapse squeezes it.
    assert(r.doc.text.contains("visible"))
    assert(r.doc.text.contains("<!-- open >"))
  }
}
