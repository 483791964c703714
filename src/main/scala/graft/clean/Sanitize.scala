package graft.clean

import graft.html._
import graft.url.PyUrl
import scala.collection.mutable.ArrayBuffer

/**
 * `process_html_content` (/root/reference/processing/content_processor.py:114-124):
 * runs AFTER clean_and_normalize on the cleaned DOM and shapes the stored
 * `cleaned_html` only (never the byte-contract `text`). Pass order pinned:
 * preserve_latex → preserve_math_content → preserve_code_blocks →
 * svg→img → iframe-svg→img.
 */
object Sanitize {

  /** Python re.sub with a literal-group replacement (no $-escape surprises). */
  private def reSub(p: java.util.regex.Pattern, s: String,
                    pre: String, post: String): String = {
    val m = p.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start()).append(pre).append(m.group(1)).append(post)
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  import java.util.regex.{Pattern => P}
  // Python's non-DOTALL `.` excludes ONLY '\n'; Java's also excludes
  // \r/\u0085/\u2028/\u2029 — spell it as [^\n] so inline spans containing
  // a CR still match (math_spans.json golden). DOTALL forms are identical.
  private val mathInline = P.compile("\\$([^\n]+?)\\$")
  private val mathBlock  = P.compile("\\$\\$(.+?)\\$\\$", P.DOTALL)
  private val katexInline = P.compile("\\\\([^\n]+?)\\\\")
  private val katexBlock  = P.compile("\\\\\\[(.+?)\\\\\\]", P.DOTALL)

  /** `preserve_mathjax` (core/scraper.py:360-365) — inline BEFORE block,
    * exactly as the reference (yes, `$$x$$` is consumed by the inline rule
    * first; that mangling is part of the contract). */
  def preserveMathjax(content: String): String = {
    val c1 = reSub(mathInline, content, "<span class=\"math-inline\">", "</span>")
    reSub(mathBlock, c1, "<div class=\"math-block\">", "</div>")
  }

  /** `preserve_katex` (core/scraper.py:367-372). */
  def preserveKatex(content: String): String = {
    val c1 = reSub(katexInline, content, "<span class=\"katex-inline\">", "</span>")
    reSub(katexBlock, c1, "<div class=\"katex-block\">", "</div>")
  }

  private def setString(el: Element, s: String): Unit = {
    el.children.foreach(_.parent = null)
    el.children.clear()
    el.append(new Text(s))
  }

  /** One-walk element index for the whole post-clean pass chain
    * (updateAssetReferences + processHtmlContent previously walked the
    * tree ~9× via findAll — ~10% of per-doc cost). Lists are document
    * order; `mathCands` merges script|span|div in ONE list because
    * `find_all(['script','span','div'])` is doc-ordered across tags. */
  final class PostCleanIndex {
    val links = ArrayBuffer.empty[Element]
    val scripts = ArrayBuffer.empty[Element]
    val imgs = ArrayBuffer.empty[Element]
    val mathCands = ArrayBuffer.empty[Element] // script | span | div
    val preCodes = ArrayBuffer.empty[Element]  // pre | code
    val svgs = ArrayBuffer.empty[Element]
    val iframes = ArrayBuffer.empty[Element]
  }

  def indexPostClean(doc: Document): PostCleanIndex = {
    val ix = new PostCleanIndex
    def walk(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case c: Element =>
            c.name match {
              case "script" => ix.scripts += c; ix.mathCands += c
              case "span" | "div" => ix.mathCands += c
              case "pre" | "code" => ix.preCodes += c
              case "svg" => ix.svgs += c
              case "iframe" => ix.iframes += c
              case "link" => ix.links += c
              case "img" => ix.imgs += c
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

  /** Pass-start snapshot: exactly the elements a fresh `findAll` would
    * return NOW — pre-collected doc-order list minus anything an EARLIER
    * pass detached (within-pass detachments still get processed, matching
    * the reference's snapshot-Vector iteration). */
  private def attached(doc: Document, els: ArrayBuffer[Element]): Seq[Element] =
    els.filter { el =>
      var cur: Element = el
      while (cur.parent != null) cur = cur.parent
      cur eq doc
    }.toSeq

  /** `preserve_latex` (core/scraper.py:374-377). */
  def preserveLatex(doc: Document): Unit =
    preserveLatex(doc.findAll("script"))

  private def preserveLatex(scripts: Seq[Element]): Unit = {
    scripts.foreach { el =>
      if (el.attr("type").contains("math/tex")) {
        val cls = (el.classes :+ "preserved-latex").mkString(" ")
        el.setAttr("class", cls)
        val s = el.getText // .string of a raw-text script
        setString(el, "$$" + s + "$$")
      }
    }
  }

  private val mathClasses =
    Set("math-inline", "math-block", "MathJax", "katex-inline", "katex-block")

  /** `preserve_math_content` (content_processor.py:125-128): the element's
    * OWN serialization is regex-rewritten and becomes its string content —
    * twice (mathjax result re-serialized, then katex applied). */
  def preserveMathContent(doc: Document): Unit =
    preserveMathContent(doc.findAll(Set("script", "span", "div")))

  private def preserveMathContent(cands: Seq[Element]): Unit = {
    cands.foreach { el =>
      if (el.classes.exists(mathClasses.contains)) {
        setString(el, preserveMathjax(Serializer.serialize(el)))
        setString(el, preserveKatex(Serializer.serialize(el)))
      }
    }
  }

  /** `preserve_code_blocks` (content_processor.py:130-132): bleach whitelist
    * {pre, code}, no attributes — the serialized block is re-tokenized,
    * allowed tags kept bare, all other markup entity-escaped, and the result
    * becomes the element's string content. */
  def preserveCodeBlocks(doc: Document): Unit =
    preserveCodeBlocks(doc.findAll(Set("pre", "code")))

  private def preserveCodeBlocks(preCodes: Seq[Element]): Unit = {
    preCodes.foreach { el =>
      setString(el, bleachClean(Serializer.serialize(el), Set("pre", "code")))
    }
  }

  /** bleach.clean(tags=allowed, attributes={'class': []}, strip=False) —
    * allowed tags serialized bare (the attributes dict is keyed by TAG
    * name, so {'class': []} allows nothing on pre/code), disallowed tags
    * escaped. Disallowed-token reconstruction follows bleach's public
    * `BleachSanitizerFilter.disallowed_token` (bleach/sanitizer.py),
    * tightened round 4 from the old bare-name emulation:
    *  - the escaped start tag KEEPS its attributes, rebuilt as
    *    ` name="value"` with the RAW value (bleach inserts `v` unescaped
    *    — the willkg NOTE about serializer double-escaping — and the
    *    whole reconstructed string is then escaped as a Characters
    *    token, so `&`/`<`/`>` in values surface as entities while
    *    embedded quotes stay raw);
    *  - a VOID element is a single EmptyTag token in html5lib's
    *    treewalker stream — ONE escaped token, no fabricated `&lt;/br&gt;`
    *    end tag (the old emulation emitted a pair).
    * Remaining documented divergence (SURVEY §7.5 #2): bleach re-parses
    * the fragment with html5lib's HTML5 tree construction; tag-soup
    * repair differences vs this html.parser-faithful DOM are out of
    * scope (no bleach/html5lib in the container to arbitrate). */
  def bleachClean(htmlFragment: String, allowed: Set[String]): String = {
    val doc = HtmlParser.parse(htmlFragment)
    val sb = new java.lang.StringBuilder
    def walk(n: Node): Unit = n match {
      case t: Text => sb.append(Serializer.escapeText(t.data))
      case c: Comment => // bleach strips comments by default
      case e: Document => e.children.foreach(walk)
      case e: Element =>
        if (allowed.contains(e.name)) {
          sb.append('<').append(e.name).append('>')
          e.children.foreach(walk)
          sb.append("</").append(e.name).append('>')
        } else {
          sb.append("&lt;").append(e.name)
          e.attrs.foreach { case (k, v) =>
            sb.append(' ').append(k).append("=\"")
              .append(Serializer.escapeText(if (v == null) "" else v))
              .append('"')
          }
          sb.append("&gt;")
          e.children.foreach(walk)
          if (!e.isVoid) sb.append("&lt;/").append(e.name).append("&gt;")
        }
      case _ =>
    }
    walk(doc)
    sb.toString
  }

  /** `extract_and_convert_svgs` (core/scraper.py:394-407) — structural part:
    * each `<svg>` replaced by `<img src="diagram_{i}.png"/>` (rasterization
    * is out of the snapshot contract; SURVEY §2.3). Returns count. */
  def convertSvgs(doc: Document): Int = convertSvgs(doc.findAll("svg"))

  private def convertSvgs(svgs: Seq[Element]): Int = {
    svgs.zipWithIndex.foreach { case (svg, i) =>
      val img = new Element("img")
      img.isVoid = true
      img.attrs += (("src", s"diagram_$i.png"))
      if (svg.parent != null) svg.parent.replaceChild(svg, img)
    }
    svgs.length
  }

  /** `extract_and_convert_iframe_svgs` (core/scraper.py:467-479) — iframes
    * with a src are replaced by `<img src="diagram_{i}.png"/>` when the
    * (closed-world) fetch+convert would succeed; we replicate the structural
    * replacement for `.svg` sources only. */
  def convertIframeSvgs(doc: Document, baseUrl: String): Int =
    convertIframeSvgs(doc.findAll("iframe"), baseUrl)

  private def convertIframeSvgs(iframes: Seq[Element], baseUrl: String): Int = {
    var replaced = 0
    // reference enumerates ALL iframe[src]; only convertible (svg) ones are
    // replaced, named by their enumerate index (collisions with convertSvgs
    // outputs are the reference's own behavior)
    iframes.filter(_.hasAttr("src")).zipWithIndex.foreach {
      case (ifr, idx) =>
        val src = ifr.attr("src").get
        val full = graft.url.UrlMemo.urljoin(baseUrl, src)
        if (full.endsWith(".svg") && ifr.parent != null) {
          val img = new Element("img")
          img.isVoid = true
          img.attrs += (("src", s"diagram_$idx.png"))
          ifr.parent.replaceChild(ifr, img)
          replaced += 1
        }
    }
    replaced
  }

  /** POSIX `os.path.normpath` over a relative path (collapses '.', '..',
    * duplicate slashes; keeps leading '..' runs). */
  private[clean] def posixNormpathRel(p: String): String = {
    val out = ArrayBuffer.empty[String]
    p.split("/+").foreach {
      case "" | "."                                   => // drop
      case ".." if out.nonEmpty && out.last != ".."   => out.remove(out.length - 1)
      case seg                                        => out += seg
    }
    if (out.isEmpty) "." else out.mkString("/")
  }

  /** `update_asset_references` (/root/reference/core/scraper.py:916-931):
    * rewrites stylesheet link href / script src / img src to the local
    * asset path `os.path.relpath(join(base, 'assets', <type>,
    * urlparse(attr).path.lstrip('/')), base)` = normpath('assets/<type>/p').
    *
    * Quirks kept faithfully:
    *  - the membership test compares the RAW attribute against the
    *    URLJOINED asset set (`extract_asset_links` stores joined urls,
    *    :872-880) — so only attributes that are already absolute (join is
    *    identity) ever match; relative refs are never rewritten;
    *  - in the reference call order (scraper.py:502-509) this runs on the
    *    CLEANED soup, where pass-1 empty-tag removal has already dropped
    *    void `<link>`/`<img>` and bodyless `<script src>` tags — in
    *    practice only `<script src=abs>with body</script>` survives to be
    *    rewritten; the function itself is generic for direct use.
    * Returns the number of rewritten attributes. */
  def updateAssetReferences(doc: Document, baseUrl: String): Int =
    updateAssetReferences(baseUrl, indexPostClean(doc))

  def updateAssetReferences(baseUrl: String, ix: PostCleanIndex): Int = {
    val pix = new graft.links.LinkExtractor.PageIndex
    pix.linkTags ++= ix.links
    pix.scripts ++= ix.scripts
    pix.imgs ++= ix.imgs
    val assets = graft.links.LinkExtractor.assetEdges(pix, baseUrl)
    def set(kind: String) = assets.filter(_.kind == kind).map(_.dstUrl).toSet
    val css = set("css")
    val js = set("js")
    val images = set("image")
    def target(kindDir: String, attr: String): String =
      posixNormpathRel(s"assets/$kindDir/" +
        PyUrl.urlparse(attr).path.dropWhile(_ == '/'))
    var n = 0
    ix.links.foreach { l =>
      if (l.attr("rel").exists(r => graft.html.PyStr.splitWs(r).contains("stylesheet")))
        l.attr("href").foreach { h =>
          if (css.contains(h)) { l.setAttr("href", target("css", h)); n += 1 }
        }
    }
    ix.scripts.foreach { s =>
      s.attr("src").foreach { src =>
        if (js.contains(src)) { s.setAttr("src", target("js", src)); n += 1 }
      }
    }
    ix.imgs.foreach { i =>
      i.attr("src").foreach { src =>
        if (images.contains(src)) { i.setAttr("src", target("images", src)); n += 1 }
      }
    }
    n
  }

  /** Full `process_html_content` pass order. */
  def processHtmlContent(doc: Document, url: String): Unit =
    processHtmlContent(doc, url, indexPostClean(doc))

  /** Index-sharing variant: each pass starts from the pre-collected list
    * filtered to still-attached elements — byte-equivalent to the fresh
    * findAll the sequential version does at each pass boundary. */
  def processHtmlContent(doc: Document, url: String, ix: PostCleanIndex): Unit = {
    preserveLatex(attached(doc, ix.scripts))
    preserveMathContent(attached(doc, ix.mathCands))
    preserveCodeBlocks(attached(doc, ix.preCodes))
    convertSvgs(attached(doc, ix.svgs))
    convertIframeSvgs(attached(doc, ix.iframes), url)
  }
}
