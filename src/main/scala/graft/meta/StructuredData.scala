package graft.meta

import scala.collection.mutable
import graft.clean.Cleaner
import graft.html.{Document, Element}
import graft.url.PyUrl

/** One structured-data entry, tagged by syntax — the Spark-side shape of
  * the reference's `extruct.extract(..., syntaxes=['json-ld', 'microdata',
  * 'rdfa'])` dict (/root/reference/processing/content_processor.py:92-99).
  * `data` is a canonical compact-JSON rendering (no spaces, insertion-order
  * keys) for microdata/rdfa, and the raw script body for json-ld. */
final case class StructuredEntry(syntax: String, data: String)

/**
 * Microdata + RDFa-Lite structured-data harvest (SURVEY §2.3; VERDICT r02
 * next #1). The reference delegates to extruct; this is a from-scratch
 * deterministic implementation of the two underlying public specs:
 *
 *  - Microdata: the WHATWG item-crawl algorithm (itemscope/itemprop/
 *    itemtype/itemid/itemref) rendered per item as
 *    `{"type":...,"properties":{...}}` — extruct's microdata shape.
 *    Property values follow the spec's per-tag table (meta→content,
 *    img/audio/video/embed/iframe/source/track→src, a/area/link→href,
 *    object→data, data/meter→value, time→datetime|text, else text),
 *    URL-typed values absolutized against the page base.
 *
 *  - RDFa Lite: vocab/prefix/typeof/property/resource harvest. Terms
 *    resolve against the in-scope `vocab`, CURIE prefixes against
 *    ancestor `prefix` declarations plus the RDFa 1.1 initial-context
 *    defaults (og/dc/foaf/schema/...). Each `typeof` element becomes a
 *    subject object (nested under its parent when it carries `property`);
 *    property elements outside any `typeof` scope aggregate into one
 *    document-level subject with `@id` = base url — which is where
 *    `og:*` meta tags land, matching extruct's rdfa output placement.
 *
 * Documented deviations from extruct (no blank-node ids — extruct's
 * `_:N...` counters are process-nondeterministic; unknown-prefix CURIEs
 * kept verbatim instead of dropped) are deterministic by construction.
 */
object StructuredData {

  // ---------- minimal ordered JSON ----------

  sealed trait J
  final case class JStr(s: String) extends J
  final case class JArr(xs: Seq[J]) extends J
  final case class JObj(fields: Seq[(String, J)]) extends J

  private def escapeInto(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
  }

  def render(j: J): String = {
    val sb = new java.lang.StringBuilder(128)
    def go(x: J): Unit = x match {
      case JStr(s) => sb.append('"'); escapeInto(s, sb); sb.append('"')
      case JArr(xs) =>
        sb.append('[')
        var first = true
        xs.foreach { e => if (!first) sb.append(','); first = false; go(e) }
        sb.append(']')
      case JObj(fs) =>
        sb.append('{')
        var first = true
        fs.foreach { case (k, v) =>
          if (!first) sb.append(',')
          first = false
          sb.append('"'); escapeInto(k, sb); sb.append("\":")
          go(v)
        }
        sb.append('}')
    }
    go(j)
    sb.toString
  }

  // ---------- shared helpers ----------

  /** Whitespace-collapsed descendant text (extruct's textContent analog,
    * using the pinned Python-\s collapse semantics). */
  private def textValue(e: Element): String =
    Cleaner.normalizeWhitespace(e.getText)

  private def absolutize(base: String, v: String): String =
    if (base.isEmpty) v
    else try PyUrl.urljoin(base, v) catch { case _: Exception => v }

  private def wsSplit(s: String): Seq[String] =
    graft.html.PyStr.splitWs(s)

  // ---------- microdata ----------

  private val srcTags =
    Set("audio", "embed", "iframe", "img", "source", "track", "video")
  private val hrefTags = Set("a", "area", "link")

  private def mdPropValue(e: Element, base: String): J = {
    val n = e.name
    val v =
      if (n == "meta") e.attr("content").getOrElse("")
      else if (srcTags.contains(n)) absolutize(base, e.attr("src").getOrElse(""))
      else if (hrefTags.contains(n)) absolutize(base, e.attr("href").getOrElse(""))
      else if (n == "object") absolutize(base, e.attr("data").getOrElse(""))
      else if (n == "data" || n == "meter") e.attr("value").getOrElse("")
      else if (n == "time") e.attr("datetime").getOrElse(textValue(e))
      else textValue(e)
    JStr(v)
  }

  private def oneOrList(xs: Seq[J]): J = if (xs.length == 1) xs.head else JArr(xs)

  /** WHATWG item crawl: children (+ itemref'd elements) depth-first;
    * an itemprop element contributes a property; an itemscope element is
    * a nested item and is not descended into. */
  private def itemObject(root: Element, base: String,
                         byId: => Map[String, Element],
                         seen: Set[Element]): JObj = {
    val props = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[J]]
    def addProp(el: Element): Unit = {
      val v: J =
        if (el.hasAttr("itemscope")) {
          if (seen.contains(el)) JStr("") // itemref cycle guard
          else itemObject(el, base, byId, seen + el)
        } else mdPropValue(el, base)
      wsSplit(el.attr("itemprop").get).foreach { name =>
        props.getOrElseUpdate(name, mutable.ArrayBuffer.empty[J]) += v
      }
    }
    def crawl(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case c: Element =>
            if (c.hasAttr("itemprop")) addProp(c)
            if (!c.hasAttr("itemscope")) crawl(c)
          case _ =>
        }
        i += 1
      }
    }
    crawl(root)
    root.attr("itemref").foreach { refs =>
      wsSplit(refs).foreach { id =>
        byId.get(id).foreach { el =>
          if (!seen.contains(el)) {
            if (el.hasAttr("itemprop")) addProp(el)
            if (!el.hasAttr("itemscope")) crawl(el)
          }
        }
      }
    }
    val fields = mutable.ArrayBuffer.empty[(String, J)]
    root.attr("itemtype").foreach { t =>
      val ts = wsSplit(t)
      if (ts.nonEmpty) fields += ("type" -> oneOrList(ts.map(JStr)))
    }
    root.attr("itemid").foreach { id =>
      if (id.nonEmpty) fields += ("id" -> JStr(absolutize(base, id)))
    }
    fields += ("properties" ->
      JObj(props.iterator.map { case (k, vs) => k -> oneOrList(vs.toSeq) }.toSeq))
    JObj(fields.toSeq)
  }

  /** One compact-JSON string per TOP-LEVEL microdata item (itemscope
    * without itemprop), document order. `itemscopeEls` is the pre-collected
    * document-order list (single-walk discipline — the caller already
    * traverses the DOM once). */
  def microdata(itemscopeEls: Seq[Element], base: String): Seq[String] = {
    val tops = itemscopeEls.filterNot(_.hasAttr("itemprop"))
    if (tops.isEmpty) return Nil
    // id map built lazily — only itemref needs it (rare)
    lazy val byId: Map[String, Element] = {
      val m = mutable.HashMap.empty[String, Element]
      def up(e: Element): Element = if (e.parent == null) e else up(e.parent)
      val root = up(tops.head)
      def walk(e: Element): Unit = {
        var i = 0
        while (i < e.children.length) {
          e.children(i) match {
            case c: Element =>
              c.attr("id").foreach(id => if (!m.contains(id)) m(id) = c)
              walk(c)
            case _ =>
          }
          i += 1
        }
      }
      walk(root)
      m.toMap
    }
    tops.map(t => render(itemObject(t, base, byId, Set(t))))
  }

  // ---------- RDFa Lite ----------

  /** RDFa 1.1 initial-context prefixes (public W3C list, the slice that
    * occurs on real pages) — extruct resolves og:/dc:/... through the same
    * table. */
  private val defaultPrefixes: Map[String, String] = Map(
    "og" -> "http://ogp.me/ns#",
    "fb" -> "http://ogp.me/ns/fb#",
    "article" -> "http://ogp.me/ns/article#",
    "profile" -> "http://ogp.me/ns/profile#",
    "book" -> "http://ogp.me/ns/book#",
    "video" -> "http://ogp.me/ns/video#",
    "music" -> "http://ogp.me/ns/music#",
    "dc" -> "http://purl.org/dc/terms/",
    "dcterms" -> "http://purl.org/dc/terms/",
    "dct" -> "http://purl.org/dc/terms/",
    "foaf" -> "http://xmlns.com/foaf/0.1/",
    "schema" -> "http://schema.org/",
    "sioc" -> "http://rdfs.org/sioc/ns#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#")

  private def scopePrefixes(e: Element): Map[String, String] = {
    // outermost declarations first so inner ones override
    var chain: List[Element] = Nil
    var cur: Element = e
    while (cur != null) { chain = cur :: chain; cur = cur.parent }
    var m = defaultPrefixes
    chain.foreach { el =>
      el.attr("prefix").foreach { p =>
        val toks = wsSplit(p)
        var i = 0
        while (i + 1 < toks.length) {
          val t = toks(i)
          if (t.endsWith(":")) { m += (t.dropRight(1) -> toks(i + 1)); i += 2 }
          else i += 1
        }
      }
    }
    m
  }

  private def scopeVocab(e: Element): Option[String] = {
    var cur: Element = e
    while (cur != null) {
      val v = cur.attr("vocab")
      if (v.exists(_.nonEmpty)) return v
      cur = cur.parent
    }
    None
  }

  /** Term resolution: CURIE via in-scope prefixes; bare term via in-scope
    * vocab; absolute IRIs and unknown-prefix CURIEs kept verbatim
    * (deterministic superset of RDFa Lite — extruct drops the latter). */
  private def resolveTerm(tok: String, el: Element): Option[String] = {
    val ci = tok.indexOf(':')
    if (ci > 0) {
      val pfx = tok.substring(0, ci)
      scopePrefixes(el).get(pfx) match {
        case Some(iri) => Some(iri + tok.substring(ci + 1))
        case None      => Some(tok) // absolute IRI or unknown CURIE: verbatim
      }
    } else if (tok.isEmpty) None
    else scopeVocab(el).map(_ + tok)
  }

  private def hasTypeofAncestor(e: Element): Boolean = {
    var cur = e.parent
    while (cur != null) {
      if (cur.hasAttr("typeof")) return true
      cur = cur.parent
    }
    false
  }

  private def rdfaValue(e: Element, base: String): J = {
    e.attr("content") match {
      case Some(c) => JStr(c)
      case None =>
        e.attr("href").orElse(e.attr("src")) match {
          case Some(u) => JStr(absolutize(base, u))
          case None =>
            e.attr("resource") match {
              case Some(r) => JStr(absolutize(base, r))
              case None    => JStr(textValue(e))
            }
        }
    }
  }

  /** Subject object for a `typeof` element: @id (about|resource|href|src,
    * absolutized), @type, properties from the subtree crawl (stopping at
    * nested typeof boundaries — nested subjects embed under their
    * `property` name). */
  private def subjectObject(root: Element, base: String): JObj = {
    val fields = mutable.ArrayBuffer.empty[(String, J)]
    root.attr("about").orElse(root.attr("resource"))
      .orElse(root.attr("href")).orElse(root.attr("src")).foreach { id =>
        fields += ("@id" -> JStr(absolutize(base, id)))
      }
    val types = wsSplit(root.attr("typeof").getOrElse(""))
      .flatMap(resolveTerm(_, root))
    if (types.nonEmpty) fields += ("@type" -> oneOrList(types.map(JStr)))
    val props = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[J]]
    def add(el: Element, v: J): Unit =
      wsSplit(el.attr("property").get).flatMap(resolveTerm(_, el)).foreach { p =>
        props.getOrElseUpdate(p, mutable.ArrayBuffer.empty[J]) += v
      }
    def crawl(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case c: Element =>
            val hasProp = c.hasAttr("property")
            val hasType = c.hasAttr("typeof")
            if (hasProp && hasType) add(c, subjectObject(c, base))
            else if (hasProp) add(c, rdfaValue(c, base))
            if (!hasType) crawl(c) // nested typeof owns its own subtree
          case _ =>
        }
        i += 1
      }
    }
    crawl(root)
    props.foreach { case (k, vs) => fields += (k -> oneOrList(vs.toSeq)) }
    JObj(fields.toSeq)
  }

  /** RDFa harvest over pre-collected candidate lists (document order):
    * one object per top-level `typeof` subject, then one document-level
    * subject (@id = base) aggregating `property` elements outside any
    * typeof scope — og:/dc: meta tags land there, as in extruct. */
  def rdfa(typeofEls: Seq[Element], propertyEls: Seq[Element],
           base: String): Seq[String] = {
    val tops = typeofEls.filter(e =>
      !(e.hasAttr("property") && hasTypeofAncestor(e)))
    val subjects = tops.map(t => render(subjectObject(t, base)))
    val docProps = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[J]]
    propertyEls.foreach { el =>
      if (!el.hasAttr("typeof") && !hasTypeofAncestor(el)) {
        val v = rdfaValue(el, base)
        wsSplit(el.attr("property").getOrElse("")).flatMap(resolveTerm(_, el))
          .foreach { p =>
            docProps.getOrElseUpdate(p, mutable.ArrayBuffer.empty[J]) += v
          }
      }
    }
    if (docProps.isEmpty) subjects
    else subjects :+ render(JObj(
      ("@id" -> JStr(base)) +:
        docProps.iterator.map { case (k, vs) => k -> oneOrList(vs.toSeq) }.toSeq))
  }
}
