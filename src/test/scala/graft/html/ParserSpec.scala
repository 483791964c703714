package graft.html

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  private def parse(s: String) = HtmlParser.parse(s)

  test("basic tree structure and getText") {
    val d = parse("<html><body><p>a</p><p>b</p></body></html>")
    assert(d.getText == "ab")
    assert(d.findAll("p").length == 2)
  }

  test("tag and attribute names lowercased, values decoded") {
    val d = parse("""<DIV CLASS="X  y" Data-Foo="a&amp;b">t</DIV>""")
    val div = d.findAll("div").head
    assert(div.attr("class").contains("X y")) // multi-valued collapse
    assert(div.attr("data-foo").contains("a&b"))
  }

  test("valueless and unquoted attributes") {
    val d = parse("<input disabled type=checkbox value=>")
    val in = d.findAll("input").head
    assert(in.attr("disabled").contains(""))
    assert(in.attr("type").contains("checkbox"))
    assert(in.attr("value").contains(""))
  }

  test("void elements take no children") {
    val d = parse("<p><br>after<img src=x>tail</p>")
    val p = d.findAll("p").head
    assert(p.getText == "aftertail")
    assert(d.findAll("br").head.children.isEmpty)
  }

  test("self-closing non-void closes immediately") {
    val d = parse("<div/><span>in</span>")
    assert(d.findAll("div").head.children.isEmpty)
    assert(d.findAll("span").head.getText == "in")
  }

  test("script is CDATA: markup inside preserved as text") {
    val d = parse("<script>if (a<b) { x = '<p>'; }</script>")
    assert(d.findAll("script").head.getText == "if (a<b) { x = '<p>'; }")
    assert(d.findAll("p").isEmpty)
  }

  test("end tag pops to nearest matching; unmatched ignored") {
    val d = parse("<div><span>a</div>b")
    // </div> closes span implicitly
    assert(d.findAll("div").head.getText == "a")
    assert(d.children.collect { case t: Text => t.data }.mkString == "b")
  }

  test("comments, doctype, PI kinds") {
    val d = parse("<!DOCTYPE html><!-- c --><?pi data><p>x</p>")
    assert(d.children.exists(_.isInstanceOf[Doctype]))
    assert(d.children.exists(_.isInstanceOf[Comment]))
    assert(d.children.exists(_.isInstanceOf[ProcIns]))
    assert(d.getText == "x")
  }

  test("literal < in text") {
    val d = parse("<p>1 < 2 and <3</p>")
    assert(d.getText == "1 < 2 and <3")
  }

  test("charrefs converted in data at parse time") {
    val d = parse("<p>&lt;b&gt; &amp;amp;</p>")
    assert(d.findAll("p").head.getText == "<b> &amp;")
  }

  test("serialize escapes text and attributes (bs4 minimal formatter)") {
    val d = parse("<p title='a\"b'>x & y</p>")
    val s = Serializer.serialize(d)
    assert(s == "<p title='a\"b'>x &amp; y</p>")
  }

  test("serialize void as self-closing") {
    assert(Serializer.serialize(parse("<br>")) == "<br/>")
    assert(Serializer.serialize(parse("<img src=x>")) == "<img src=\"x\"/>")
  }

  test("serialize-parse fixpoint on well-formed html") {
    val html = "<html><head><title>T</title></head><body>" +
      "<div class=\"a b\"><p>one</p><p>two &amp; three</p></div></body></html>"
    val once = Serializer.serialize(parse(html))
    val twice = Serializer.serialize(parse(once))
    assert(once == twice)
  }

  test("xml mode preserves case and has no voids") {
    val d = HtmlParser.parse("<urlset><Url><loc>https://e.com/</loc></Url></urlset>", xmlMode = true)
    assert(d.findAll("Url").length == 1)
    assert(d.getText == "https://e.com/")
  }

  test("charset sniffing: BOM and meta charset") {
    val utf8 = "<p>café</p>".getBytes("UTF-8")
    assert(HtmlParser.parseBytes(utf8).getText == "café")
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8
    assert(HtmlParser.parseBytes(bom).getText == "café")
    val latin = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>café</p></body></html>"
      .getBytes("ISO-8859-1")
    assert(HtmlParser.parseBytes(latin).getText == "café")
  }

  test("nested identical tags (html.parser does not auto-close p)") {
    val d = parse("<p>a<p>b</p></p>")
    val ps = d.findAll("p")
    assert(ps.length == 2)
    assert(ps.head.getText == "ab") // inner p nested inside outer
  }

  // ---- CPython 3.11 parse_endtag semantics (pinned against this
  // container's interpreter — see the probe transcripts in the scaladoc) ----

  test("end tags: strict/tolerant/bogus-comment resolution like CPython 3.11") {
    // strict: whitespace (incl. unicode \s) around the name
    assert(parse("<p>a</ p>b").findAll("p").head.getText == "a")
    assert(parse("<p>a</ P >b").findAll("p").head.getText == "a")
    assert(parse("<p>a</p >b").findAll("p").head.getText == "a")
    // tolerant: junk after the name is consumed through '>'
    assert(parse("<div>x</div\tjunk>y").findAll("div").head.getText == "x")
    // tolerant name may contain '<' ("</a<b>" ends tag "a<b" — unmatched)
    val t = parse("<p>x</a<b>y").findAll("p").head
    assert(t.getText == "xy")
    // bogus comment: "</.foo>" and "</ a b>" become Comment nodes
    val d1 = parse("<p>a</.foo>b")
    assert(d1.findAll("p").head.getText == "ab")
    assert(commentsOf(d1) == Seq(".foo"))
    val d2 = parse("<p>x</ a b>y")
    assert(commentsOf(d2) == Seq(" a b"))
    // numeric-start: bogus comment too
    assert(commentsOf(parse("<p>x</1a>y")) == Seq("1a"))
    // '</>' still dropped
    assert(parse("</>x").getText == "x")
  }

  test("comments close at --\\s*> like CPython's _markupbase") {
    val d = parse("<!--a-- >b")
    assert(commentsOf(d) == Seq("a") && d.getText == "b")
    val du = parse("<!--a-- >b")
    assert(commentsOf(du) == Seq("a") && du.getText == "b")
    assert(commentsOf(parse("<!--a--->b")) == Seq("a-"))
    assert(commentsOf(parse("<!--a---->b")) == Seq("a--"))
  }

  test("cdata closes only on the full end tag; EOF tail dropped") {
    // '</script b>' and '</scripts>' and '</style>' are script DATA
    val d1 = parse("<script>a</script b>c</script>d")
    assert(d1.findAll("script").head.getText == "a</script b>c")
    assert(d1.getText == "a</script b>cd")
    val d2 = parse("<script>a</scripts>b</script>c")
    assert(d2.findAll("script").head.getText == "a</scripts>b")
    val d3 = parse("<script>x</style>y</script>z")
    assert(d3.findAll("script").head.getText == "x</style>y")
    // whitespace-padded close still closes
    assert(parse("<script>a</ScRiPt >b").findAll("script").head.getText == "a")
    // unterminated: CPython drops the tail entirely
    val d4 = parse("<script>foo")
    assert(d4.findAll("script").head.getText == "")
    assert(d4.getText == "")
  }

  private def commentsOf(d: graft.html.Document): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(e: graft.html.Element): Unit = e.children.foreach {
      case c: graft.html.Comment => out += c.data
      case el: graft.html.Element => walk(el)
      case _ =>
    }
    walk(d)
    out.toSeq
  }
}
