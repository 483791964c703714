package graft.tools
import graft.pipeline.PagesGen
import graft.html.{HtmlParser, Serializer}
import graft.clean.{Cleaner, Sanitize}
import graft.meta.MetadataExtractor
import graft.links.LinkExtractor
object MicroProfile { def main(a: Array[String]): Unit = {
  val n = 3000
  val pages = (0 until n).map(i => PagesGen.pageOf(i.toLong)).filter(p => p.url.endsWith(".html")).toArray
  val contents = pages.map(p => HtmlParser.decode(p.html))
  def time(label: String)(f: => Unit): Unit = {
    f // warmup
    val t0 = System.nanoTime(); f
    println(f"PROF $label: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
  }
  time("decode")(pages.foreach(p => HtmlParser.decode(p.html)))
  time("parse")(contents.foreach(c => HtmlParser.parse(c)))
  val docs = contents.map(c => HtmlParser.parse(c))
  time("meta")(docs.foreach(d => MetadataExtractor.extract(d)))
  time("edges")(docs.zip(pages).foreach { case (d, p) => LinkExtractor.edges(d, p.url) })
  time("anchors")(docs.foreach(d => LinkExtractor.anchorIds(d)))
  time("clean+text")({
    val fresh = contents.map(c => HtmlParser.parse(c))
    fresh.zip(pages).foreach { case (d, p) => Cleaner.cleanDocument(d, p.url) }
  })
  time("sanitize")(docs.zip(pages).foreach { case (d, p) => Sanitize.processHtmlContent(d, p.url) })
  time("serialize")(docs.foreach(d => Serializer.serialize(d)))
  time("sha")(pages.foreach(p => java.security.MessageDigest.getInstance("SHA-256").digest(p.html)))
}}
