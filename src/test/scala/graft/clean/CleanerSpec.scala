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

  test("F3 display:none subtrees removed; comment text SURVIVES (pass-2 laundering)") {
    // Arbitrated r4 (SURVEY §7.5 #1): pass 2's replace_with(str) converts
    // the Comment to plain text BEFORE pass 4's isinstance(_, Comment)
    // runs — the reference's comment removal is vacuous on HTML pages.
    val html = "<div><!-- secret --><p style=\"display: none\">h1</p>" +
      "<p style=\"display:none\">h2</p><p style=\"display:  none\">h3</p>" +
      "<p style=\"color:red\">visible</p></div>"
    assert(text(html) == "secret visible")
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

  test("doctype laundered into text by pass 2 (bs4 Doctype is a NavigableString)") {
    // str(Doctype) is the inner value sans "DOCTYPE " (bs4
    // _htmlparser.handle_decl strips the prefix), so `<!DOCTYPE html>`
    // contributes the text "html" after laundering.
    // get_text concatenates with NO separator: "html" + "hi"
    assert(text("<!DOCTYPE html><html><body><p>hi</p></body></html>") == "htmlhi")
  }

  test("handle_decl prefix strip is case-sensitive and trim-free (bs4-exact, r4)") {
    // bs4 strips only the exact "DOCTYPE " prefix; a lowercase doctype
    // keeps its keyword, which the laundering pass now makes VISIBLE
    assert(text("<!doctype html><p>hi</p>") == "doctype htmlhi")
    // data[8:] keeps the extra inner space — visible mid-document before
    // the final \s+ collapse merges it into a separator
    assert(text("<p>a</p><!DOCTYPE  html><p>b</p>") == "a htmlb")
    // bare "<!DOCTYPE>" maps to the empty string (the elif branch)
    assert(text("<!DOCTYPE><p>hi</p>") == "hi")
    // lowercase bare keyword ≠ "DOCTYPE": kept verbatim
    assert(text("<!doctype><p>hi</p>") == "doctypehi")
  }

  test("hidden removal happens after unescape (order dependence)") {
    // entity-encoded style value decodes at parse time (attributes), so the
    // regex sees the decoded value
    val html = "<p style=\"display:&#32;none\">gone</p><p>kept</p>"
    assert(text(html) == "kept")
  }

  test("element emptied only of comments is removed in pass 1") {
    // pass 1 runs BEFORE laundering: the comment is still a Comment there,
    // get_text (default types = NavigableString/CData) skips it, the div
    // is empty → extracted WITH its comment. Only comments in non-empty
    // contexts survive laundering into the text.
    val html = "<div><!-- only a comment --></div><p>t</p>"
    assert(text(html) == "t")
  }

  // ---- F21 pass-2 laundering family (SURVEY §7.5 #1, arbitrated r4 from
  // public bs4 source: find_all(text=True) matches every NavigableString
  // subclass; replace_with(str) coerces to plain NavigableString) ----

  test("F21 comment text joins get_text at its document position, unescaped once") {
    assert(text("<p>a<!--mid-->b</p>") == "amidb")
    // entities inside comments were NOT decoded at parse time
    // (convert_charrefs skips comments) — laundering unescapes once
    assert(text("<p>x<!-- a &amp; b --></p>") == "x a & b")
    // a comment whose text contains markup stays TEXT (replace_with
    // inserts a string node; nothing is re-parsed)
    assert(text("<p>k<!-- <span>not a tag</span> --></p>") ==
      "k <span>not a tag</span>")
  }

  test("F21b top-level comment (child of the soup) survives as leading/trailing text") {
    assert(text("<!-- header --><p>body</p><!-- footer -->") ==
      "header body footer")
  }

  test("F21c laundered comment re-escapes in str(soup) (minimal formatter)") {
    val res = Cleaner.cleanAndNormalize(
      "<p>k<!-- 1 < 2 & 3 --></p>", "https://e.com/")
    val ser = Serializer.serialize(res.cleanedDoc)
    assert(!ser.contains("<!--"), ser)
    assert(ser.contains("<p>k 1 &lt; 2 &amp; 3 </p>"), ser)
  }

  test("F21d processing instructions and declarations launder into text") {
    // html.parser: "<?php x ?>" → handle_pi("php x ?") → PI node; bs4
    // launders it to the text "php x ?"
    // get_text has no separator: "a"+"php echo 1 ?"+"b"
    assert(text("<p>a</p><?php echo 1 ?><p>b</p>") == "aphp echo 1 ?b")
    // MS-Office conditional marked section → unknown_decl → Declaration
    assert(text("<p>m<![if gte mso 9]>o<![endif]></p>") ==
      "mif gte mso 9oendif")
  }

  test("F21e CDATA launders to plain text (still in get_text, now also in str(soup) as escaped text)") {
    val res = Cleaner.cleanAndNormalize(
      "<p>a<![CDATA[x < y]]>b</p>", "https://e.com/")
    assert(res.text == "ax < yb")
    val ser = Serializer.serialize(res.cleanedDoc)
    assert(!ser.contains("CDATA"), ser)
    assert(ser.contains("x &lt; y"), ser)
  }

  test("F21f comment inside a display:none subtree is removed with it (pass order)") {
    assert(text("<div style=\"display:none\">h<!--c--></div><p>v</p>") == "v")
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
