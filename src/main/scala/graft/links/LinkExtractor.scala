package graft.links

import graft.html._
import graft.url.{PyUrl, UrlMemo, UrlNormalizer}
import scala.collection.mutable.{ArrayBuffer, LinkedHashSet}

/** One extracted edge: src page → destination, with classification.
  * kind ∈ {link, pagination, css, js, image, math}. */
final case class Edge(dstUrl: String, kind: String, srcTag: String, anchor: String)

/**
 * Typed-generator surface (SURVEY §2.9): per-page link / pagination / asset
 * extraction, the `flatMap` equivalent of
 * /root/reference/processing/link_extractor.py:13-58 and
 * /root/reference/core/scraper.py:862-895.
 *
 * Deviation pinned in SURVEY §2.9: the reference's
 * `find_all([...], href=True, src=True)` literally requires BOTH attributes
 * (a latent bug that would extract nothing); the inventory maps the intended
 * "href or src" semantics, which we implement.
 */
object LinkExtractor {

  private val mediaTags = Set("a", "img", "video", "audio", "source", "iframe")

  import java.util.regex.{Pattern => P}
  private val numbered = P.compile("^\\d+$")
  private val nextPrev = P.compile(
    "Next|Previous|Próximo|Anterior|Prev|Next Page|Previous Page", P.CASE_INSENSITIVE | P.UNICODE_CASE)
  private val firstLast = P.compile("First|Last|Primeira|Última", P.CASE_INSENSITIVE | P.UNICODE_CASE)
  private val loadMore = P.compile(
    "Load More|Show More|Ver Mais|Carregar Mais", P.CASE_INSENSITIVE | P.UNICODE_CASE)
  /** Hot-path fusion of the three word families: the classification only
    * needs "any of them matched", so one alternation == three `search`es
    * (same union of accepted strings; the reference's four separate
    * patterns are kept above for documentation parity). */
  private val anyPagWord = P.compile(
    "Next|Previous|Próximo|Anterior|Prev|Next Page|Previous Page|" +
      "First|Last|Primeira|Última|Load More|Show More|Ver Mais|Carregar Mais",
    P.CASE_INSENSITIVE | P.UNICODE_CASE)

  private def isPaginationText(s: String): Boolean =
    // numbered kept as a real matcher: `$` has before-trailing-newline
    // semantics a hand loop would get wrong
    numbered.matcher(s).find() || anyPagWord.matcher(s).find()

  /** bs4 text-filter semantics: the element's `.string` — single
    * NavigableString child, recursing through single-Element chains, so
    * `<a><span>Next</span></a>` matches exactly as bs4's
    * `find_all('a', text=...)` does. No match when fragmented. */
  private def anchorString(a: Element): Option[String] = a.bs4String

  /** `extract_pagination_links` (link_extractor.py:33-58): urljoined, NOT
    * normalized, NOT validity-filtered (reference behavior). */
  def paginationLinks(doc: Document, baseUrl: String): Seq[String] = {
    val out = LinkedHashSet.empty[String]
    doc.findAll("a").foreach { a =>
      if (a.hasAttr("href")) anchorString(a).foreach { s =>
        if (isPaginationText(s)) out += UrlMemo.urljoin(baseUrl, a.attr("href").get)
      }
    }
    out.toSeq
  }

  /** `extract_links` (link_extractor.py:13-31): normalized + validity-filtered
    * content links. Returns (links, pagination). Error granularity is the
    * reference's, faithfully: the try wraps the WHOLE function — one link
    * whose normalize raises (bad port, IDNA failure) empties BOTH sets for
    * the page (`except ... return set(), set()`), while pagination
    * extraction has its own inner try (link_extractor.py:56-58) returning
    * just an empty pagination set. (The Spark links-table operator
    * `edges` is a graft-side superset surface with per-row isolation —
    * that is a deliberate robustness deviation, documented there.) */
  def extractLinks(doc: Document, url: String, baseDomain: String,
                   startPath: String): (Seq[String], Seq[String]) = {
    try {
      val pagination =
        try paginationFromAnchors(index(doc).anchors, url)
        catch { case _: Exception => Seq.empty[String] }
      val links = LinkedHashSet.empty[String]
      doc.descendantElements.foreach { el =>
        if (mediaTags.contains(el.name)) {
          val hrefOrSrc = el.attr("href").orElse(el.attr("src"))
          hrefOrSrc.foreach { h =>
            val normalized = UrlMemo.normalize(UrlMemo.urljoin(url, h))
            if (UrlNormalizer.isValidLink(normalized, baseDomain, startPath))
              links += normalized
          }
        }
      }
      (links.toSeq, pagination)
    } catch { case _: Exception => (Seq.empty, Seq.empty) }
  }

  /** One-walk element index for the per-page extractors (meta/link/script/
    * media tags collected in document order — each extractor would otherwise
    * re-traverse the tree). */
  final class PageIndex {
    val media = ArrayBuffer.empty[Element] // a img video audio source iframe
    val anchors = ArrayBuffer.empty[Element] // <a> only
    val linkTags = ArrayBuffer.empty[Element]
    val scripts = ArrayBuffer.empty[Element]
    val imgs = ArrayBuffer.empty[Element]
  }

  def index(doc: Document): PageIndex = {
    val ix = new PageIndex
    def walk(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case c: Element =>
            c.name match {
              case "a" => ix.media += c; ix.anchors += c
              case "img" => ix.media += c; ix.imgs += c
              case "video" | "audio" | "source" | "iframe" => ix.media += c
              case "link" => ix.linkTags += c
              case "script" => ix.scripts += c
              case _ =>
            }
            walk(c)
          case _ =>
        }
        i += 1
      }
    }
    walk(doc)
    ix
  }

  private def paginationFromAnchors(anchors: collection.Seq[Element],
                                    baseUrl: String): Seq[String] = {
    val out = LinkedHashSet.empty[String]
    anchors.foreach { a =>
      if (a.hasAttr("href")) anchorString(a).foreach { s =>
        if (isPaginationText(s)) out += UrlMemo.urljoin(baseUrl, a.attr("href").get)
      }
    }
    out.toSeq
  }

  /** All raw edges for the links table (dedup/joins downstream are
    * relational): every href/src of the media tags, urljoined + normalized,
    * with pagination / asset classification. Single DOM walk via `index`. */
  def edges(doc: Document, url: String): Seq[Edge] = edges(index(doc), url)

  def edges(ix: PageIndex, url: String): Seq[Edge] = {
    val out = ArrayBuffer.empty[Edge]
    val pagination = paginationFromAnchors(ix.anchors, url).toSet
    ix.media.foreach { el =>
      val attrVal = el.attr("href").orElse(el.attr("src"))
      attrVal.foreach { h =>
        val joined = UrlMemo.urljoin(url, h)
        val normalized =
          try UrlMemo.normalize(joined) catch { case _: Exception => joined }
        val anchor = {
          val i = joined.indexOf('#')
          if (i >= 0) joined.substring(i + 1) else ""
        }
        val kind = if (pagination.contains(joined)) "pagination" else "link"
        out += Edge(normalized, kind, el.name, anchor)
      }
    }
    out ++= assetEdges(ix, url)
    out.toSeq
  }

  private val mathjaxConfig = P.compile("MathJax\\.Hub\\.Config\\((.*?)\\)", P.DOTALL)

  /** `extract_asset_links` (core/scraper.py:862-895) as edges. The reference
    * would TypeError on `script.string` None (external scripts); intended
    * semantics (skip bodyless scripts) implemented, deviation documented. */
  def assetEdges(doc: Document, baseUrl: String): Seq[Edge] =
    assetEdges(index(doc), baseUrl)

  def assetEdges(ix: PageIndex, baseUrl: String): Seq[Edge] = {
    val out = ArrayBuffer.empty[Edge]
    ix.linkTags.foreach { l =>
      if (l.attr("rel").exists(r => graft.html.PyStr.splitWs(r).contains("stylesheet")))
        l.attr("href").foreach(h => out += Edge(UrlMemo.urljoin(baseUrl, h), "css", "link", ""))
    }
    ix.scripts.foreach { s =>
      s.attr("src") match {
        case Some(src) => out += Edge(UrlMemo.urljoin(baseUrl, src), "js", "script", "")
        case None =>
          val body = s.getText
          if (body.contains("MathJax.Hub.Config")) {
            val m = mathjaxConfig.matcher(body)
            if (m.find()) {
              parseMathjaxExtensions(m.group(1)).foreach { ext =>
                out += Edge(UrlMemo.urljoin(baseUrl, s"mathjax/extensions/$ext.js"), "math", "script", "")
              }
              out += Edge(UrlMemo.urljoin(baseUrl, "mathjax/MathJax.js"), "js", "script", "")
            }
          }
      }
    }
    ix.imgs.foreach { i =>
      i.attr("src").foreach(src => out += Edge(UrlMemo.urljoin(baseUrl, src), "image", "img", ""))
    }
    out.toSeq
  }

  /** json.loads(config)['extensions'] — minimal JSON array-of-strings pull
    * for the `extensions` key (full JSON parse unnecessary for the contract). */
  private[links] def parseMathjaxExtensions(config: String): Seq[String] = {
    val extKey = P.compile("\"extensions\"\\s*:\\s*\\[([^\\]]*)\\]").matcher(config)
    if (!extKey.find()) return Nil
    val items = P.compile("\"((?:[^\"\\\\]|\\\\.)*)\"").matcher(extKey.group(1))
    val out = ArrayBuffer.empty[String]
    while (items.find()) out += items.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    out.toSeq
  }

  /** Anchor ids for the anchor-existence join (core/scraper.py:791-796):
    * every `id` attribute value plus `<a name=...>` values. */
  def anchorIds(doc: Document): Seq[String] = {
    val out = LinkedHashSet.empty[String]
    def walk(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case el: Element =>
            el.attr("id").foreach(out += _)
            if (el.name == "a") el.attr("name").foreach(out += _)
            walk(el)
          case _ =>
        }
        i += 1
      }
    }
    walk(doc)
    out.toSeq
  }
}
