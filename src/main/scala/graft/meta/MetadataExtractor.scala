package graft.meta

import graft.html._

/** Extracted per-page metadata struct (SURVEY §1.2 mapping of the metadata
  * dict from /root/reference/processing/content_processor.py:43-112). */
final case class PageMeta(
    title: Option[String],
    description: Option[String],
    keywords: Option[String],
    lastModified: Option[String],          // ISO-8601 string (dateutil.isoformat)
    dateMetas: Seq[(String, String)],      // (name → ISO) for date/pubdate/lastmod/modified
    authors: Seq[String],
    og: Seq[(String, String)],             // og:* property (sans "og:") → content
    structuredData: Seq[StructuredEntry],  // json-ld (raw) + microdata + rdfa
    canonical: Option[String])

/**
 * Port of `extract_and_normalize_metadata` + `extract_metadata`
 * (/root/reference/processing/content_processor.py:43-112) and
 * `get_canonical_url` (/root/reference/core/scraper.py:830-836).
 * Pure DOM pass; `extraction_date` is a job parameter upstream
 * (determinism — SURVEY §7.4 #6), never wall-clock here.
 */
object MetadataExtractor {

  /** `soup.title.string`: the first <title>'s `.string` (single
    * NavigableString child, recursing through single-Element chains —
    * bs4 semantics via `Element.bs4String`); None when absent/fragmented
    * (reference's @handle_metadata_errors → None). */
  def extractTitle(doc: Document): Option[String] =
    doc.findFirst("title").flatMap(_.bs4String)

  private val dateNames = Set("date", "pubdate", "lastmod", "modified")

  /** `dateutil.parser.parse(content).isoformat()` via the PyDateUtil
    * port (fuzz-pinned vs real dateutil — dates_fuzz.json); partial
    * dates (wall-clock-dependent in the reference) map to None. Fast
    * paths keep the two dominant meta shapes off the tokenizer: ASCII
    * digits only, year >= 1 (dateutil MINYEAR), and any miss FALLS
    * THROUGH to the port rather than answering None. */
  def parseDateIso(s: String): Option[String] =
    parseDateIso(s, PyDateUtil.DefaultPivotYear)

  def parseDateIso(s: String, pivotYear: Int): Option[String] = {
    val v = s.trim
    def asciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
    if (v.length == 10 && v.charAt(4) == '-' && v.charAt(7) == '-' &&
        v.forall(c => asciiDigit(c) || c == '-')) {
      try {
        val ld = java.time.LocalDate.parse(v)
        if (ld.getYear >= 1) return Some(v + "T00:00:00")
      } catch { case _: Exception => }
    }
    if (v.length == 19 && v.charAt(10) == 'T' && v.charAt(4) == '-' &&
        v.charAt(13) == ':' &&
        v.forall(c => asciiDigit(c) || c == '-' || c == ':' || c == 'T')) {
      try {
        val ldt = java.time.LocalDateTime.parse(v)
        // the parsed value round-trips verbatim (strict ISO shape), so
        // the input IS the isoformat — no re-format needed
        if (ldt.getYear >= 1) return Some(v)
      } catch { case _: Exception => }
    }
    PyDateUtil.parseIso(s, pivotYear)
  }

  def extract(doc: Document): PageMeta = extract(doc, "")

  def extract(doc: Document, pageUrl: String): PageMeta =
    extract(doc, pageUrl, PyDateUtil.DefaultPivotYear)

  /** `pivotYear` pins the two-digit-year window for date-meta
    * normalization — threaded from the extraction job's determinism
    * params (Extract.run), defaulting to the current year like dateutil. */
  def extract(doc: Document, pageUrl: String, pivotYear: Int): PageMeta = {
    // single walk: metas, json-ld scripts, canonical link, first title,
    // plus the microdata/RDFa candidate lists (itemscope/typeof/property
    // elements, document order) so the structured-data harvest never
    // re-traverses the DOM
    val metas = scala.collection.mutable.ArrayBuffer.empty[Element]
    val ldScripts = scala.collection.mutable.ArrayBuffer.empty[Element]
    val itemscopeEls = scala.collection.mutable.ArrayBuffer.empty[Element]
    val typeofEls = scala.collection.mutable.ArrayBuffer.empty[Element]
    val propertyEls = scala.collection.mutable.ArrayBuffer.empty[Element]
    var canonicalEl: Element = null
    var titleEl: Element = null
    var baseEl: Element = null
    def walk(e: Element): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case el: Element =>
            el.name match {
              case "meta" => metas += el
              case "script" =>
                if (el.attr("type").contains("application/ld+json")) ldScripts += el
              case "link" =>
                if (canonicalEl == null &&
                    el.attr("rel").exists(r => graft.html.PyStr.splitWs(r).contains("canonical")) &&
                    el.attr("href").exists(_.nonEmpty)) canonicalEl = el
              case "title" => if (titleEl == null) titleEl = el
              case "base"  => if (baseEl == null) baseEl = el
              case _ =>
            }
            // one scan over the attr list (3× hasAttr = 3 closure scans)
            val as = el.attrs
            var j = 0
            while (j < as.length) {
              as(j)._1 match {
                case "itemscope" => itemscopeEls += el
                case "typeof"    => typeofEls += el
                case "property"  => propertyEls += el
                case _ =>
              }
              j += 1
            }
            walk(el)
          case _ =>
        }
        i += 1
      }
    }
    walk(doc)

    def metaByName(n: String): Option[Element] =
      metas.find(_.attr("name").contains(n))

    // extract_and_normalize_metadata: date-family metas → ISO
    val dateMetas = metas.flatMap { m =>
      (m.attr("name"), m.attr("content")) match {
        case (Some(n), Some(c)) if dateNames.contains(n) =>
          parseDateIso(c, pivotYear).map(n -> _)
        case _ => None
      }
    }

    val authors = metas.collect {
      case m if m.attr("name").contains("author") && m.hasAttr("content") =>
        m.attr("content").get.trim
    }

    val og = metas.flatMap { m =>
      m.attr("property") match {
        case Some(p) if p.startsWith("og:") =>
          Some(p.substring(3) -> m.attr("content").getOrElse(""))
        case _ => None
      }
    }

    val description = metaByName("description").flatMap(_.attr("content"))
    val keywords = metaByName("keywords").flatMap(_.attr("content"))
    val lastModifiedRaw = metaByName("last-modified").flatMap(_.attr("content"))
    // extract_metadata: raw content first, then ISO-normalized when parseable
    val lastModified = lastModifiedRaw.map(raw => parseDateIso(raw, pivotYear).getOrElse(raw))

    // structured data, extruct syntax order (json-ld, microdata, rdfa):
    // raw <script type="application/ld+json"> bodies; microdata items;
    // RDFa subjects (og:/dc: metas land in the document-level subject)
    val base = baseEl match {
      case null => pageUrl
      case b    => b.attr("href").filter(_.nonEmpty)
        .map(h => try graft.url.PyUrl.urljoin(pageUrl, h)
                  catch { case _: Exception => pageUrl })
        .getOrElse(pageUrl)
    }
    val structured = scala.collection.mutable.ArrayBuffer.empty[StructuredEntry]
    ldScripts.foreach(s => structured += StructuredEntry("json-ld", s.getText))
    if (itemscopeEls.nonEmpty)
      StructuredData.microdata(itemscopeEls.toSeq, base)
        .foreach(structured += StructuredEntry("microdata", _))
    if (typeofEls.nonEmpty || propertyEls.nonEmpty)
      StructuredData.rdfa(typeofEls.toSeq, propertyEls.toSeq, base)
        .foreach(structured += StructuredEntry("rdfa", _))

    // get_canonical_url: <link rel=canonical href>
    val canonical = Option(canonicalEl).flatMap(_.attr("href"))

    // soup.title.string — bs4 semantics incl. single-child recursion
    // (same contract as extractTitle; Element.bs4String is the one source)
    val title = Option(titleEl).flatMap(_.bs4String)

    PageMeta(title, description, keywords, lastModified,
      dateMetas.toSeq, authors.toSeq, og.toSeq, structured.toSeq, canonical)
  }
}
