package graft.meta

import graft.html._
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

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
    structuredData: Seq[String],           // raw JSON-LD script bodies
    canonical: Option[String])

/**
 * Port of `extract_and_normalize_metadata` + `extract_metadata`
 * (/root/reference/processing/content_processor.py:43-112) and
 * `get_canonical_url` (/root/reference/core/scraper.py:830-836).
 * Pure DOM pass; `extraction_date` is a job parameter upstream
 * (determinism — SURVEY §7.4 #6), never wall-clock here.
 */
object MetadataExtractor {

  /** `soup.title.string`: the first <title>'s single text child; None when
    * absent/fragmented (reference's @handle_metadata_errors → None). */
  def extractTitle(doc: Document): Option[String] = {
    doc.findFirst("title").flatMap { t =>
      t.children.toList match {
        case (txt: Text) :: Nil => Some(txt.data)
        case _                  => None
      }
    }
  }

  private val dateNames = Set("date", "pubdate", "lastmod", "modified")

  /** Deterministic stand-in for `dateutil.parser.parse(...).isoformat()`:
    * fixed pattern list (SURVEY §2.3), date-only inputs get T00:00:00. */
  def parseDateIso(s: String): Option[String] = {
    val v = s.trim
    val formats = Seq(
      "yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd'T'HH:mm:ssX",
      "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss",
      "yyyy-MM-dd'T'HH:mm", "yyyy-MM-dd", "yyyy/MM/dd",
      "MM/dd/yyyy", "MMM d, yyyy", "d MMM yyyy",
      "EEE, d MMM yyyy HH:mm:ss zzz")
    val iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    formats.view.flatMap { f =>
      try {
        val fmt = DateTimeFormatter.ofPattern(f, java.util.Locale.US)
        val parsed = fmt.parseBest(v,
          java.time.OffsetDateTime.from(_), LocalDateTime.from(_),
          java.time.LocalDate.from(_))
        val (ldt, off) = parsed match {
          case o: java.time.OffsetDateTime => (o.toLocalDateTime, Some(o.getOffset))
          case l: LocalDateTime            => (l, None)
          case d: java.time.LocalDate      => (d.atStartOfDay, None)
        }
        val base = iso.format(ldt)
        Some(off match {
          case Some(o) if o.getTotalSeconds == 0 => base + "+00:00"
          case Some(o)                           => base + o.getId
          case None                              => base
        })
      } catch { case _: Exception => None }
    }.headOption
  }

  def extract(doc: Document): PageMeta = {
    val metas = doc.findAll("meta")

    def metaByName(n: String): Option[Element] =
      metas.find(_.attr("name").contains(n))

    // extract_and_normalize_metadata: date-family metas → ISO
    val dateMetas = metas.flatMap { m =>
      (m.attr("name"), m.attr("content")) match {
        case (Some(n), Some(c)) if dateNames.contains(n) =>
          parseDateIso(c).map(n -> _)
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
    val lastModified = lastModifiedRaw.map(raw => parseDateIso(raw).getOrElse(raw))

    // structured data: raw <script type="application/ld+json"> bodies
    val jsonLd = doc.findAll("script").collect {
      case s if s.attr("type").contains("application/ld+json") => s.getText
    }

    // get_canonical_url: <link rel=canonical href>
    val canonical = doc.findAll("link").collectFirst {
      case l if l.attr("rel").exists(r =>
            r.split("\\s+").contains("canonical")) && l.attr("href").exists(_.nonEmpty) =>
        l.attr("href").get
    }

    PageMeta(extractTitle(doc), description, keywords, lastModified,
      dateMetas.toSeq, authors.toSeq, og.toSeq, jsonLd.toSeq, canonical)
  }
}
