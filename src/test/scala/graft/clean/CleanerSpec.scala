package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.GoldenJson
import graft.html.{HtmlParser, Serializer}

/** Golden fixture families F0–F9, F14, F19 (FIXTURES.md §2). Expected texts
  * derived from the pinned reference pipeline semantics
  * (processing/content_processor.py:22-29, core/scraper.py:187-231). */
class CleanerSpec extends AnyFunSuite {

  private def text(html: String, url: String = "https://example.com/page/"): String =
    Cleaner.cleanAndNormalize(html, url).text

  test("normalize_whitespace matches CPython golden corpus (F5)") {
    GoldenJson.load("whitespace.json").foreach { c =>
      assert(Cleaner.normalizeWhitespace(c.get("input").asText) == c.get("expected").asText)
    }
  }

  test("F0 smoke: reference __main__ example") {
    assert(text("<html><body><p>Sample content</p></body></html>") == "Sample content")
  }

  test("F1 empty-tag removal: voids and empties go, parents emptied by the pass survive") {
    val html = "<div><p>keep</p><span></span><img src=\"x.png\"><br><hr>" +
      "<ul><li>   </li></ul></div>"
    // pre-order snapshot: ul checked BEFORE its li is removed → ul survives
    assert(text(html) == "keep")
  }

  test("F1b nested-empty single-pass order") {
    // outer checked first (non-empty at check time), inner removed later
    val html = "<section><div><span></span></div><p>x</p></section>"
    val res = Cleaner.cleanAndNormalize(html, "https://e.com/")
    assert(res.text == "x")
    // div survived (checked while span still inside), span removed
    val ser = Serializer.serialize(res.cleanedDoc)
    assert(ser.contains("<div></div>"), ser)
  }

  test("F1c Unicode-whitespace-only tags are empty (Python str.strip, not Java trim)") {
    // &nbsp; decodes to U+00A0 at parse time (convert_charrefs); the
    // reference's get_text(strip=True) probe strips it → tag removed in
    // pass 1. Java trim keeps U+00A0/U+2028/U+3000 — the divergence ADVICE
    // r01 flagged: '<span>a</span><span>&nbsp;</span><span>b</span>' must
    // yield 'ab', not 'a b'.
    assert(text("<div><span>a</span><span>&nbsp;</span><span>b</span></div>") == "ab")
    assert(text("<table><tr><td>&nbsp;</td></tr><tr><td>x</td></tr></table>") == "x")
    assert(text("<p>　 </p><p>y</p>") == "y")
    // non-blank text with surrounding Unicode ws is NOT empty
    assert(text("<p> z </p>") == "z")
  }

  test("F2 entities: parse-time conversion + unescape pass (double unescape)") {
    val html = "<p>a &amp; b &lt;c&gt; &nbsp;&#169; &amp;amp;</p>"
    // parse-time: "a & b <c>  © &amp;"; pass 2: "&amp;"→"&";
    // NBSP collapsed by the Unicode \s+ rule
    assert(text(html) == "a & b <c> © &")
  }

  test("F3 comments and display:none subtrees removed") {
    val html = "<div><!-- secret --><p style=\"display: none\">h1</p>" +
      "<p style=\"display:none\">h2</p><p style=\"display:  none\">h3</p>" +
      "<p style=\"color:red\">visible</p></div>"
    assert(text(html) == "visible")
  }

  test("F4 href absolutization + utm strip (cleaned html, not text)") {
    val html = "<p><a href=\"sub/x.html?utm_source=tw&amp;id=3\">go</a></p>"
    val res = Cleaner.cleanAndNormalize(html, "https://example.com/docs/page.html")
    assert(res.text == "go")
    val a = res.cleanedDoc.findAll("a").head
    assert(a.attr("href").contains("https://example.com/docs/sub/x.html?id=3"))
  }

  test("F4b keep_blank_values and doseq re-encoding") {
    GoldenJson.load("normalize_href.json").foreach { c =>
      val html = s"""<a href="${c.get("href").asText.replace("&", "&amp;")}">x</a>"""
      val res = Cleaner.cleanAndNormalize(html, c.get("base").asText)
      val got = res.cleanedDoc.findAll("a").head.attr("href").get
      assert(got == c.get("expected").asText,
        s"href=${c.get("href").asText}")
    }
  }

  test("F5 whitespace zoo") {
    val html = "<p>a\t\tb\r\nc&nbsp;&nbsp;d　e</p>"
    assert(text(html) == "a b c d e")
  }

  test("F6 script/style contents included in get_text") {
    val html = "<html><head><style>p { color: red; }</style>" +
      "<script>var x = 1 < 2;</script></head><body><p>body</p></body></html>"
    assert(text(html) == "p { color: red; }var x = 1 < 2;body")
  }

  test("F6b entities in script are unescaped once (no parse-time conversion)") {
    val html = "<script>if (a &amp;&amp; b) {}</script><p>t</p>"
    // CDATA content skips convert_charrefs; pass 2 unescapes once
    assert(text(html) == "if (a && b) {}t")
  }

  test("F14 plain-text payload") {
    assert(Cleaner.cleanPlainText("  line one\n\tline two  ") == "line one line two")
  }

  test("F19 tag soup: nesting without auto-close, unmatched end tags ignored") {
    val html = "<p>one<p>two<li>three</wrong></p>four"
    assert(text(html) == "onetwothreefour")
  }

  test("F19b unclosed tags at EOF") {
    assert(text("<div><p>alpha <b>beta") == "alpha beta")
  }

  test("doctype excluded from text") {
    assert(text("<!DOCTYPE html><html><body><p>hi</p></body></html>") == "hi")
  }

  test("hidden removal happens after unescape (order dependence)") {
    // entity-encoded style value decodes at parse time (attributes), so the
    // regex sees the decoded value
    val html = "<p style=\"display:&#32;none\">gone</p><p>kept</p>"
    assert(text(html) == "kept")
  }

  test("element emptied only of comments is removed in pass 1") {
    val html = "<div><!-- only a comment --></div><p>t</p>"
    assert(text(html) == "t")
  }

  test("math span preservation matches CPython re.sub incl. non-DOTALL '.' (golden)") {
    graft.GoldenJson.load("math_spans.json").foreach { c =>
      val in = c.get("in").asText()
      assert(Sanitize.preserveMathjax(in) == c.get("mathjax").asText(), s"mathjax in=$in")
      assert(Sanitize.preserveKatex(in) == c.get("katex").asText(), s"katex in=$in")
    }
  }

  test("display:none predicate matches CPython re.search with unicode \\s (golden)") {
    graft.GoldenJson.load("display_none.json").foreach { c =>
      val style = c.get("style").asText()
      val want = c.get("hidden").asBoolean()
      assert(Cleaner.hasDisplayNone(style) == want, s"style=${style.map(ch => f"\\u${ch.toInt}%04x").mkString}")
    }
  }
}
