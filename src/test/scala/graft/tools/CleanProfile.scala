package graft.tools
import graft.pipeline.PagesGen
import graft.html.HtmlParser
import graft.clean.Cleaner
object CleanProfile { def main(a: Array[String]): Unit = {
  val pages = (0 until 3000).map(i => PagesGen.pageOf(i.toLong)).filter(_.url.endsWith(".html")).toArray
  val contents = pages.map(p => HtmlParser.decode(p.html))
  def time(label: String)(f: => Unit): Unit = {
    f; val t0 = System.nanoTime(); f
    println(f"CPROF $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
  }
  time("1 empty")(contents.foreach { c => Cleaner.removeEmptyTags(HtmlParser.parse(c)) })
  time("2 unescape")(contents.foreach { c => Cleaner.unescapeTextNodes(HtmlParser.parse(c)) })
  time("3 hrefs")(contents.zip(pages).foreach { case (c, p) => Cleaner.absolutizeHrefs(HtmlParser.parse(c), p.url) })
  time("4 comments")(contents.foreach { c => Cleaner.removeCommentsAndHidden(HtmlParser.parse(c)) })
  time("5 getText+ws")(contents.foreach { c => Cleaner.normalizeWhitespace(HtmlParser.parse(c).getText) })
  time("0 parse-only")(contents.foreach { c => HtmlParser.parse(c) })
}}
