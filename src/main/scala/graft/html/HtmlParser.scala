package graft.html

import scala.collection.mutable.ArrayBuffer
import java.nio.charset.{Charset, StandardCharsets}

/**
 * Streaming tag tokenizer + tree builder emulating Python's stdlib
 * `html.parser.HTMLParser` (tolerant mode, `convert_charrefs=True`) under
 * BeautifulSoup's `HTMLParserTreeBuilder`, which is what the reference uses
 * for every page (/root/reference/processing/content_processor.py:22,
 * /root/reference/processing/link_extractor.py:17).
 *
 * Pinned behaviors (the byte-identity contract hangs on these; the whole
 * construct layer is differentially pinned against this container's CPython
 * 3.11.7 via the parser_events.json golden — scripts/gen_parser_events.py):
 *  - tag/attribute names lowercased; attribute values entity-decoded at
 *    parse time; valueless attributes become "".
 *  - character references in data converted at parse time (convert_charrefs)
 *    EXCEPT inside `script`/`style` (CDATA content elements).
 *  - NO implicit auto-close on start tags (html.parser nests `<p>a<p>b` as
 *    `<p>a<p>b</p></p>`); end tags pop to the nearest matching open tag and
 *    are ignored when unmatched; everything still open closes at EOF.
 *  - void elements (br, img, hr, …) never take children.
 *  - `<` not opening a construct is literal text; `</>` is dropped;
 *    end tags resolve like CPython 3.11 parse_endtag: strict
 *    `</\s*name\s*>` first, then tagfind_tolerant, then a bogus COMMENT
 *    of the `</...>` span (see parseEndTag).
 *  - unterminated constructs at EOF resync like `goahead(end=1)`
 *    (html/parser.py:184-197): the span through the first `>` (else up to
 *    the next `<`, else one char) becomes DATA — unescaped — and parsing
 *    RESUMES; it does NOT swallow the rest of the document.
 *  - start tags scan with Python-`\s` (unicode) attribute separators,
 *    attrfind_tolerant's `(?<=['"\s/])` lookbehind, and the
 *    `end not in ('>', '/>')` raw-data fallback (parser.py:329-332;
 *    reachable via NUL bytes).
 *  - marked sections (`<![...`, _markupbase.parse_marked_section):
 *    CDATA/TEMP/IGNORE/INCLUDE/RCDATA close at `]\s*]\s*>` and become bs4
 *    CData (text!) when the body starts with literal "CDATA[", else
 *    Declaration; MS-Office if/else/endif close at `]\s*>`; any other
 *    keyword (or no name token) raises — bs4 ParserRejectedMarkup — which
 *    the pipeline maps to a parse_failed row, like the reference's
 *    per-page try/except.
 *
 * XML payloads (`application/xml` branch, /root/reference/core/scraper.py:512-517)
 * parse with `xmlMode = true`: case preserved, no void set, no CDATA-content
 * mode, legacy tolerant start/end tags (that branch emulates xmltodict, not
 * html.parser), plus expat-style literal `<![CDATA[...]]>` text.
 */
object HtmlParser {

  /** bs4 surfaces an AssertionError out of html.parser/_markupbase as
    * `ParserRejectedMarkup`; the reference's per-page error handling then
    * records the page as failed. */
  final class RejectedMarkup(msg: String) extends RuntimeException(msg)

  /** CPython-level parser event — the unit of the parser_events.json
    * differential golden. `attrs` is null for non-tag events; attr values
    * are null for valueless attributes (CPython None). */
  final case class PEvent(kind: String, text: String, attrs: List[(String, String)])

  /** bs4 `HTMLTreeBuilder.empty_element_tags`. */
  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "keygen",
    "link", "menuitem", "meta", "param", "source", "track", "wbr",
    "basefont", "bgsound", "command", "frame", "image", "isindex",
    "nextid", "spacer")

  /** Python `HTMLParser.CDATA_CONTENT_ELEMENTS`. */
  private val cdataElements = Set("script", "style")

  def parse(html: String): Document = parse(html, xmlMode = false)

  def parseBytes(bytes: Array[Byte]): Document = parse(decode(bytes))

  /** Test-only: parse and record the CPython-level event stream. */
  def parseWithEvents(html: String): (Document, Vector[PEvent]) = {
    val ev = ArrayBuffer.empty[PEvent]
    val doc = new Parser(html, xmlMode = false, ev).run()
    (doc, ev.toVector)
  }

  // Charset sniff: BOM → `<meta charset>` → UTF-8 (replacement on error).

  /** Compiled once (was recompiled per page — a visible slice of per-doc
    * cost); CASE_INSENSITIVE replaces the head.toLowerCase allocation.
    * Charset.forName is itself case-insensitive. */
  private val metaCharset = java.util.regex.Pattern.compile(
    """<meta[^>]*charset\s*=\s*["']?([a-z0-9._-]+)""",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  /** ASCII case-insensitive scan for "charset" in the first `len` bytes —
    * the common page has no meta charset (or none in the head), so the
    * 2 KiB head string + regex run only when the literal is present. */
  private def headHasCharset(bytes: Array[Byte], len: Int): Boolean = {
    val lit = "charset"
    var i = 0
    val end = len - lit.length
    while (i <= end) {
      var j = 0
      while (j < lit.length && (bytes(i + j) | 0x20) == lit.charAt(j)) j += 1
      if (j == lit.length) return true
      i += 1
    }
    false
  }

  def decode(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return decodeWith(bytes, 3, StandardCharsets.UTF_8)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return decodeWith(bytes, 2, StandardCharsets.UTF_16LE)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return decodeWith(bytes, 2, StandardCharsets.UTF_16BE)
    val headLen = math.min(bytes.length, 2048)
    if (headHasCharset(bytes, headLen)) {
      val head = new String(bytes, 0, headLen, StandardCharsets.ISO_8859_1)
      val m = metaCharset.matcher(head)
      if (m.find()) {
        try return decodeWith(bytes, 0, Charset.forName(m.group(1)))
        catch { case _: Exception => }
      }
    }
    decodeWith(bytes, 0, StandardCharsets.UTF_8)
  }

  /** `new String(bytes, cs)` has exactly the decoder-with-REPLACE
    * semantics (the constructor always replaces malformed/unmappable
    * sequences) and is JIT-intrinsified — the explicit CharsetDecoder +
    * ByteBuffer path it replaces was ~15% of spin samples. */
  private def decodeWith(bytes: Array[Byte], offset: Int, cs: Charset): String =
    new String(bytes, offset, bytes.length - offset, cs)

  def parse(html: String, xmlMode: Boolean): Document = {
    new Parser(html, xmlMode, null).run()
  }

  private final class Parser(raw: String, xmlMode: Boolean,
                             ev: ArrayBuffer[PEvent]) {
    private val n = raw.length
    private var i = 0
    private val doc = new Document
    private val stack = ArrayBuffer[Element](doc)
    private val pendingText = new java.lang.StringBuilder
    private var cdataElem: String = null // inside <script>/<style>

    private def top: Element = stack(stack.length - 1)

    /** bs4 `BeautifulSoup.endData`: adjacent handle_data calls are JOINED
      * into one NavigableString, flushed when any non-data construct is
      * appended (so "a < b" is ONE text node even though CPython emits
      * three handle_data calls). */
    private def flushText(): Unit = {
      if (pendingText.length > 0) {
        top.append(new Text(pendingText.toString))
        pendingText.setLength(0)
      }
    }

    /** One CPython handle_data call. */
    private def emitData(s: String, convert: Boolean): Unit = {
      if (s.isEmpty) return
      val out = if (convert) Entities.unescape(s) else s
      if (ev != null) ev += PEvent("data", out, null)
      pendingText.append(out)
    }

    def run(): Document = {
      while (i < n) {
        if (cdataElem != null) scanCdata()
        else {
          val lt = raw.indexOf('<', i)
          if (lt < 0) { emitData(raw.substring(i), convert = true); i = n }
          else {
            if (lt > i) emitData(raw.substring(i, lt), convert = true)
            i = lt
            dispatchAngle()
          }
        }
      }
      flushText()
      doc
    }

    /** `goahead(end=1)` resync for an unterminated construct
      * (html/parser.py:184-197): DATA through the first '>' (else up to
      * the next '<', else one char), unescaped, then parsing RESUMES. */
    private def resyncEof(): Unit = {
      val gt = raw.indexOf('>', i + 1)
      val k =
        if (gt >= 0) gt + 1
        else {
          val lt = raw.indexOf('<', i + 1)
          if (lt >= 0) lt else i + 1
        }
      emitData(raw.substring(i, k), convert = true)
      i = k
    }

    /** CDATA mode, pinned against CPython 3.11: the `interesting` regex
      * stops only at the full `</\s*script\s*>` (case-insensitive, unicode
      * \s) — "</script b>c" and "</scripts>" are ordinary cdata content
      * (rescan from lt+1, no special stop), and a different end tag
      * ("</style>" inside script) likewise.
      * Unterminated cdata at EOF is DROPPED (goahead's final data flush is
      * gated on `not cdata_elem`). */
    private def scanCdata(): Unit = {
      var j = i
      while (true) {
        val lt = raw.indexOf('<', j)
        if (lt < 0 || lt + 1 >= n) { // EOF: unflushed cdata tail dropped
          i = n
          cdataElem = null
          return
        }
        if (raw.charAt(lt + 1) != '/') j = lt + 1
        else {
          var k = lt + 2
          while (k < n && PyStr.isPyWs(raw.charAt(k))) k += 1
          if (!raw.regionMatches(true, k, cdataElem, 0, cdataElem.length)) j = lt + 1
          else {
            val gt = raw.indexOf('>', lt + 2)
            if (gt < 0) { i = n; cdataElem = null; return } // EOF, tail dropped
            // strict endtagfind over [lt+2, gt]
            var ns = lt + 2
            while (ns < gt && PyStr.isPyWs(raw.charAt(ns))) ns += 1
            var je = ns
            var ok = ns < gt && isAsciiLetter(raw.charAt(ns))
            if (ok) {
              je = ns + 1
              while (je < gt && isEndNameChar(raw.charAt(je))) je += 1
              var t = je
              while (t < gt && PyStr.isPyWs(raw.charAt(t))) t += 1
              ok = t == gt
            }
            if (ok && raw.regionMatches(true, ns, cdataElem, 0, je - ns) &&
                je - ns == cdataElem.length) {
              emitData(raw.substring(i, lt), convert = false)
              flushText()
              if (ev != null) ev += PEvent("endtag", cdataElem, null)
              popToTag(cdataElem)
              i = gt + 1
              cdataElem = null
              return
            } else j = lt + 1 // candidate rejected: CPython's interesting
            // search advances position-by-position, so a REAL close may
            // START inside the rejected span (`</script x="</script>">`
            // closes at the inner end tag — pinned in parser_events.json)
          }
        }
      }
    }

    private def dispatchAngle(): Unit = {
      // raw(i) == '<'
      if (i + 1 >= n) { emitData("<", convert = false); i = n; return }
      val c = raw.charAt(i + 1)
      if (isAsciiLetter(c)) {
        if (xmlMode) parseStartTagXml() else parseStartTag()
      }
      else if (c == '/') parseEndTag()
      else if (raw.startsWith("<!--", i)) parseComment()
      else if (c == '?') parsePI()
      else if (c == '!') parseDecl()
      else { emitData("<", convert = false); i += 1 }
    }

    private def isAsciiLetter(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    private def parseComment(): Unit = {
      // CPython _markupbase: a comment closes at `--\s*>` (Python \s =
      // unicode whitespace — the pinned PyStr set); unterminated → resync
      var e = i + 4
      var close = -1
      var next = -1
      while (close < 0 && e + 1 < n) {
        if (raw.charAt(e) == '-' && raw.charAt(e + 1) == '-') {
          var k = e + 2
          while (k < n && PyStr.isPyWs(raw.charAt(k))) k += 1
          if (k < n && raw.charAt(k) == '>') { close = e; next = k + 1 }
          else e += 1
        } else e += 1
      }
      if (close < 0) {
        if (xmlMode) { // legacy xml-branch behavior: comment to EOF
          flushText()
          top.append(new Comment(raw.substring(i + 4)))
          i = n
        } else resyncEof()
        return
      }
      val body = raw.substring(i + 4, close)
      flushText()
      if (ev != null) ev += PEvent("comment", body, null)
      top.append(new Comment(body))
      i = next
    }

    private def parsePI(): Unit = {
      val end = raw.indexOf('>', i + 2)
      if (end < 0) {
        if (xmlMode) {
          flushText()
          top.append(new ProcIns(raw.substring(i + 2)))
          i = n
        } else resyncEof()
        return
      }
      val body = raw.substring(i + 2, end)
      flushText()
      if (ev != null) ev += PEvent("pi", body, null)
      top.append(new ProcIns(body))
      i = end + 1
    }

    /** CPython `parse_html_declaration` (html/parser.py:255-272): `<![` →
      * marked section; `<!doctype` (exact prefix at i+2, case-insensitive,
      * NO leading space) → decl to the first '>'; anything else → bogus
      * comment to the first '>'; no '>' → resync. */
    private def parseDecl(): Unit = {
      if (!xmlMode && i + 2 < n && raw.charAt(i + 2) == '[') { parseMarkedSection(); return }
      if (xmlMode && raw.startsWith("<![CDATA[", i)) { parseCdataSectionXml(); return }
      if (!xmlMode && raw.regionMatches(true, i + 2, "doctype", 0, 7)) {
        val gt = raw.indexOf('>', i + 9)
        if (gt < 0) { resyncEof(); return }
        val body = raw.substring(i + 2, gt)
        flushText()
        if (ev != null) ev += PEvent("decl", body, null)
        // bs4 _htmlparser.handle_decl, EXACT (matters for the text
        // contract post-laundering, r4): strip only the case-SENSITIVE
        // "DOCTYPE " prefix, map the bare "DOCTYPE" to "", keep anything
        // else (e.g. lowercase "doctype html") VERBATIM — no trimming
        // anywhere (handle_decl receives rawdata[i+2:gtpos] as-is).
        val dt =
          if (body.startsWith("DOCTYPE ")) body.substring(8)
          else if (body == "DOCTYPE") ""
          else body
        top.append(new Doctype(dt))
        i = gt + 1
        return
      }
      // bogus comment (also the legacy xml-branch path for any `<!...>`)
      val end = raw.indexOf('>', i + 2)
      if (end < 0) {
        if (xmlMode) {
          flushText()
          top.append(new Comment(raw.substring(i + 2)))
          i = n
        } else resyncEof()
        return
      }
      val body = raw.substring(i + 2, end)
      flushText()
      if (xmlMode) {
        val trimmed = body.trim
        if (trimmed.regionMatches(true, 0, "doctype", 0, 7))
          top.append(new Doctype(trimmed.substring(7).trim))
        else top.append(new Comment(body))
      } else {
        if (ev != null) ev += PEvent("comment", body, null)
        top.append(new Comment(body))
      }
      i = end + 1
    }

    /** `[a-zA-Z][-_.a-zA-Z0-9]*` — _markupbase _declname_match charset. */
    private def isDeclNameChar(c: Char): Boolean =
      isAsciiLetter(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.'

    /** _markupbase.parse_marked_section, pinned against CPython 3.11.7:
      * scan the status keyword with _declname_match; temp/cdata/ignore/
      * include/rcdata close at `]\s*]\s*>`, MS-Office if/else/endif at
      * `]\s*>`; unknown keyword or missing name token raises
      * (→ RejectedMarkup); name-to-EOF or no close → resync. The body
      * (including any "CDATA[" prefix) goes to unknown_decl; bs4 maps a
      * literal "CDATA["-prefixed body to CData (dropping the prefix),
      * everything else to Declaration. */
    private def parseMarkedSection(): Unit = {
      // raw(i, i+3) == "<!["
      val s = i + 3
      if (s >= n) { resyncEof(); return } // _scan_name at EOF → -1
      if (!isAsciiLetter(raw.charAt(s)))
        throw new RejectedMarkup(s"expected name token at ${raw.substring(i, math.min(n, i + 20))}")
      var j = s + 1
      while (j < n && isDeclNameChar(raw.charAt(j))) j += 1
      val name = raw.substring(s, j).toLowerCase(java.util.Locale.ROOT)
      while (j < n && PyStr.isPyWs(raw.charAt(j))) j += 1 // \s* tail of _declname_match
      if (j == n) { resyncEof(); return } // match ran to end of buffer → -1
      val standard = name == "temp" || name == "cdata" || name == "ignore" ||
        name == "include" || name == "rcdata"
      val msOffice = name == "if" || name == "else" || name == "endif"
      if (!standard && !msOffice)
        throw new RejectedMarkup(s"unknown status keyword '$name' in marked section")
      // search `]\s*]\s*>` (standard) or `]\s*>` (MS) from i+3
      var p = i + 3
      var closeStart = -1
      var closeEnd = -1
      while (closeStart < 0 && p < n) {
        if (raw.charAt(p) == ']') {
          var q = p + 1
          while (q < n && PyStr.isPyWs(raw.charAt(q))) q += 1
          var okPos = true
          if (standard) {
            if (q < n && raw.charAt(q) == ']') {
              q += 1
              while (q < n && PyStr.isPyWs(raw.charAt(q))) q += 1
            } else okPos = false
          }
          if (okPos && q < n && raw.charAt(q) == '>') { closeStart = p; closeEnd = q + 1 }
        }
        p += 1
      }
      if (closeStart < 0) { resyncEof(); return }
      val body = raw.substring(i + 3, closeStart)
      flushText()
      if (ev != null) ev += PEvent("unknown_decl", body, null)
      if (body.startsWith("CDATA[")) top.append(new CData(body.substring(6)))
      else top.append(new Declaration(body))
      i = closeEnd
    }

    /** Expat-style literal `<![CDATA[...]]>` for the xml branch (xmltodict
      * exposes CDATA content as text): strict close, no `\s` tolerance. */
    private def parseCdataSectionXml(): Unit = {
      val close = raw.indexOf("]]>", i + 9)
      if (close < 0) { // unterminated: keep legacy swallow-as-comment
        flushText()
        top.append(new Comment(raw.substring(i + 2)))
        i = n
        return
      }
      flushText()
      top.append(new CData(raw.substring(i + 9, close)))
      i = close + 3
    }

    // ---- start tags (html mode): faithful port of CPython 3.11
    // parse_starttag + check_for_whole_start_tag + attrfind_tolerant ----

    /** tagfind_tolerant name charset: `[^\t\n\r\f />\x00]` — ASCII-only
      * whitespace exclusions (unicode whitespace is PART of a tag name). */
    private def isTagNameChar(c: Char): Boolean =
      c != '\t' && c != '\n' && c != '\r' && c != '\f' && c != ' ' &&
        c != '/' && c != '>' && c != '\u0000'

    /** attrfind name start `[^\s/>]` (unicode \s). */
    private def isAttrNameStart(c: Char): Boolean =
      !PyStr.isPyWs(c) && c != '/' && c != '>'

    /** attrfind name rest `[^\s/=>]`. */
    private def isAttrNameRest(c: Char): Boolean =
      !PyStr.isPyWs(c) && c != '/' && c != '=' && c != '>'

    /** attrfind lookbehind `(?<=['"\s/])`. */
    private def isLookbehind(c: Char): Boolean =
      c == '\'' || c == '"' || c == '/' || PyStr.isPyWs(c)

    /** `(?:\s|/(?!>))*` — whitespace or '/' not directly before '>'
      * (a trailing '/' at EOF IS consumed: the lookahead succeeds). */
    private def skipPadding(k0: Int): Int = {
      var k = k0
      while (k < n && (PyStr.isPyWs(raw.charAt(k)) ||
        (raw.charAt(k) == '/' && !(k + 1 < n && raw.charAt(k + 1) == '>')))) k += 1
      k
    }

    // Result fields of scanValueGroup (avoids a per-attr tuple):
    private var vgHas = false // value group matched (value may be empty)
    private var vgVs = 0      // value span [vgVs, vgVe) — quotes stripped
    private var vgVe = 0
    private var vgNext = 0    // scan position after the group

    /** The optional `\s*=+\s*('…'|"…"|(?!['"])[^>\s]*)` value group of
      * attrfind_tolerant / locatestarttagend_tolerant, with Python-regex
      * BACKTRACKING semantics (pinned by the fuzz corpus): positioned on an
      * unterminated quote, the engine first gives back one whitespace char
      * (empty bare value one char early), then one '=' (a bare value that
      * starts with '='); only a lone `='…` with no closing quote and no
      * slack fails the whole group (name-only attribute). */
    private def scanValueGroup(k0: Int): Unit = {
      vgHas = false
      vgNext = k0
      var v = k0
      while (v < n && PyStr.isPyWs(raw.charAt(v))) v += 1
      if (v >= n || raw.charAt(v) != '=') return // no value group
      val eqStart = v
      while (v < n && raw.charAt(v) == '=') v += 1
      val p0 = v
      while (v < n && PyStr.isPyWs(raw.charAt(v))) v += 1
      if (v >= n) { vgHas = true; vgVs = n; vgVe = n; vgNext = n; return } // empty bare at EOF
      val c = raw.charAt(v)
      if (c == '\'' || c == '"') {
        val close = raw.indexOf(c, v + 1)
        if (close >= 0) { vgHas = true; vgVs = v + 1; vgVe = close; vgNext = close + 1; return }
        if (v > p0) { // give back one ws: empty bare value
          vgHas = true; vgVs = v - 1; vgVe = v - 1; vgNext = v - 1; return
        }
        if (p0 - eqStart >= 2) { // give back one '=': bare value from that '='
          var e = p0 - 1
          while (e < n && !PyStr.isPyWs(raw.charAt(e)) && raw.charAt(e) != '>') e += 1
          vgHas = true; vgVs = p0 - 1; vgVe = e; vgNext = e; return
        }
        return // group fails: name-only attribute
      }
      var e = v
      while (e < n && !PyStr.isPyWs(raw.charAt(e)) && raw.charAt(e) != '>') e += 1
      vgHas = true; vgVs = v; vgVe = e; vgNext = e
    }

    /** m.end() of locatestarttagend_tolerant matched at `i`. */
    private def locateStartTagEnd(): Int = {
      var k = i + 2 // '<' + first letter
      while (k < n && isTagNameChar(raw.charAt(k))) k += 1
      // optional group: [\s/]* then attributes*
      while (k < n && (PyStr.isPyWs(raw.charAt(k)) || raw.charAt(k) == '/')) k += 1
      var scanning = true
      while (scanning) {
        if (k < n && isLookbehind(raw.charAt(k - 1)) && isAttrNameStart(raw.charAt(k))) {
          k += 1
          while (k < n && isAttrNameRest(raw.charAt(k))) k += 1
          scanValueGroup(k)
          if (vgHas) {
            k = vgNext
            while (k < n && PyStr.isPyWs(raw.charAt(k))) k += 1 // trailing \s* in group
          }
          k = skipPadding(k)
        } else scanning = false
      }
      while (k < n && PyStr.isPyWs(raw.charAt(k))) k += 1 // trailing \s*
      k
    }

    /** check_for_whole_start_tag: endpos, or -1 → goahead resync. */
    private def checkWholeStartTag(): Int = {
      val j = locateStartTagEnd()
      if (j >= n) return -1 // next == "" (end of input)
      val next = raw.charAt(j)
      if (next == '>') return j + 1
      if (next == '/') {
        if (raw.startsWith("/>", j)) return j + 2
        return -1 // lone '/' → "buffer boundary"
      }
      if (isAsciiLetter(next) || next == '=') return -1 // ended in/ before attr
      // bogus input: the tag span ends here without consuming `next`
      if (j > i) j else i + 1
    }

    private def parseStartTag(): Unit = {
      val endpos = checkWholeStartTag()
      if (endpos < 0) { resyncEof(); return }
      // tagfind_tolerant at i+1
      var j = i + 2
      while (j < n && isTagNameChar(raw.charAt(j))) j += 1
      val name = {
        val interned = Interned.lookupLower(raw, i + 1, j)
        if (interned != null) interned
        else raw.substring(i + 1, j).toLowerCase(java.util.Locale.ROOT)
      }
      var k = skipPadding(j)
      // attrs land straight on the element; CPython-level duplicates and
      // null values are recorded for the event sink before the bs4
      // transform (None→"", last-wins replace, class token collapse)
      val el = new Element(name)
      val attrs = el.attrs
      var evAttrs: List[(String, String)] = if (ev != null) Nil else null
      while (k < endpos && isLookbehind(raw.charAt(k - 1)) && isAttrNameStart(raw.charAt(k))) {
        val an = k
        k += 1
        while (k < n && isAttrNameRest(raw.charAt(k))) k += 1
        var aname = Interned.lookupLower(raw, an, k)
        if (aname == null) aname = raw.substring(an, k).toLowerCase(java.util.Locale.ROOT)
        // optional value group — same backtracking as locateStartTagEnd
        // but WITHOUT the trailing \s* inside the group (attrfind)
        scanValueGroup(k)
        val value: String = // null == CPython None (valueless)
          if (vgHas) { k = vgNext; raw.substring(vgVs, vgVe) } else null
        k = skipPadding(k)
        // `if attrvalue: attrvalue = unescape(attrvalue)` — non-empty only
        val unescaped = if (value == null || value.isEmpty) value else Entities.unescape(value)
        if (ev != null) evAttrs = (aname, unescaped) :: evAttrs
        // bs4 layer: None→"", class tokens collapsed, duplicate REPLACE
        val v1 = if (unescaped == null) "" else unescaped
        val v2 =
          if (aname == "class") PyStr.splitWs(v1).mkString(" ")
          else v1
        var existing = -1
        var ai = 0
        while (existing < 0 && ai < attrs.length) {
          if (attrs(ai)._1 == aname) existing = ai
          ai += 1
        }
        if (existing >= 0) attrs(existing) = (aname, v2)
        else attrs += ((aname, v2))
      }
      // `end = rawdata[k:endpos].strip()` must be ">" or "/>"
      var es = k
      var ee = endpos
      while (es < ee && PyStr.isPyWs(raw.charAt(es))) es += 1
      while (ee > es && PyStr.isPyWs(raw.charAt(ee - 1))) ee -= 1
      val len = ee - es
      val isGt = len == 1 && raw.charAt(es) == '>'
      val isSelfClose = len == 2 && raw.charAt(es) == '/' && raw.charAt(es + 1) == '>'
      if (!isGt && !isSelfClose) {
        // bogus start tag: the raw span becomes data (NOT unescaped)
        emitData(raw.substring(i, endpos), convert = false)
        i = endpos
        return
      }
      i = endpos
      flushText()
      if (ev != null)
        ev += PEvent(if (isSelfClose) "startendtag" else "starttag", name, evAttrs.reverse)
      val isVoid = voidElements.contains(name)
      el.isVoid = isVoid
      top.append(el)
      if (!isVoid && !isSelfClose) {
        stack += el
        if (cdataElements.contains(name)) cdataElem = name
      }
    }

    /** Legacy tolerant start tag for the xml branch (case preserved, ASCII
      * whitespace, no lookbehind — that branch emulates xmltodict/expat
      * on machine-generated sitemap XML, not CPython html.parser). */
    private def parseStartTagXml(): Unit = {
      var j = i + 1
      val nameStart = j
      j += 1
      while (j < n && { val c = raw.charAt(j); !isSpace(c) && c != '/' && c != '>' && c != '\u0000' }) j += 1
      val name = {
        val interned = Interned.lookupExact(raw, nameStart, j)
        if (interned != null) interned else raw.substring(nameStart, j)
      }
      val el = new Element(name)
      val attrs = el.attrs
      var selfClosing = false
      var done = false
      while (!done) {
        while (j < n && (isSpace(raw.charAt(j)) || (raw.charAt(j) == '/' && !(j + 1 < n && raw.charAt(j + 1) == '>')))) j += 1
        if (j >= n) { // unterminated tag at EOF → literal data (tolerant)
          emitData(raw.substring(i), convert = true)
          i = n
          return
        }
        val c = raw.charAt(j)
        if (c == '>') { done = true; j += 1 }
        else if (c == '/' && j + 1 < n && raw.charAt(j + 1) == '>') {
          selfClosing = true; done = true; j += 2
        } else {
          val an = j
          j += 1
          while (j < n && { val x = raw.charAt(j); !isSpace(x) && x != '/' && x != '=' && x != '>' }) j += 1
          var aname = Interned.lookupExact(raw, an, j)
          if (aname == null) aname = raw.substring(an, j)
          var k = j
          while (k < n && isSpace(raw.charAt(k))) k += 1
          var value: String = null
          if (k < n && raw.charAt(k) == '=') {
            while (k < n && raw.charAt(k) == '=') k += 1
            while (k < n && isSpace(raw.charAt(k))) k += 1
            if (k < n && (raw.charAt(k) == '"' || raw.charAt(k) == '\'')) {
              val q = raw.charAt(k)
              val vEnd = raw.indexOf(q, k + 1)
              if (vEnd < 0) { value = raw.substring(k + 1); k = n }
              else { value = raw.substring(k + 1, vEnd); k = vEnd + 1 }
            } else {
              val vs = k
              while (k < n && !isSpace(raw.charAt(k)) && raw.charAt(k) != '>') k += 1
              value = raw.substring(vs, k)
            }
            j = k
          }
          val unescaped = if (value == null) "" else Entities.unescape(value)
          var existing = -1
          var ai = 0
          while (existing < 0 && ai < attrs.length) {
            if (attrs(ai)._1 == aname) existing = ai
            ai += 1
          }
          if (existing >= 0) attrs(existing) = (aname, unescaped)
          else attrs += ((aname, unescaped))
        }
      }
      i = j
      flushText()
      top.append(el)
      if (!selfClosing) stack += el
    }

    private def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    /** `[-.a-zA-Z0-9:_]` — CPython endtagfind's name charset. */
    private def isEndNameChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == ':' || c == '_'

    private def endWith(ns: Int, j: Int): Unit = {
      var name =
        if (xmlMode) Interned.lookupExact(raw, ns, j)
        else Interned.lookupLower(raw, ns, j)
      if (name == null)
        name = if (xmlMode) raw.substring(ns, j)
               else raw.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
      flushText()
      if (ev != null) ev += PEvent("endtag", name, null)
      popToTag(name)
    }

    /** CPython 3.11 `parse_endtag`, pinned against this container's
      * interpreter: (1) strict `</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>`
      * (unicode \s — "</ p >" and "</p >" close p); else (2)
      * tagfind_tolerant at i+2 ("</div\tjunk>" ends div, "</a<b>" ends
      * "a<b"); else (3) a BOGUS COMMENT of everything between "</" and
      * the first ">" ("</.foo>" -> Comment(".foo"), "</ a b>" ->
      * Comment(" a b")). "</>" stays dropped; no '>' at all → resync. */
    private def parseEndTag(): Unit = {
      // raw(i,i+1) == "</"
      if (xmlMode) { parseEndTagXml(); return }
      val gt = raw.indexOf('>', i + 1)
      if (gt < 0) { resyncEof(); return } // endendtag.search failed → -1
      if (gt == i + 2) { i = i + 3; return } // '</>' dropped, no event
      // (1) strict endtagfind within [i+2, gt]
      var k = i + 2
      while (k < gt && PyStr.isPyWs(raw.charAt(k))) k += 1
      if (k < gt && isAsciiLetter(raw.charAt(k))) {
        val ns = k
        var j = k + 1
        while (j < gt && isEndNameChar(raw.charAt(j))) j += 1
        var t = j
        while (t < gt && PyStr.isPyWs(raw.charAt(t))) t += 1
        if (t == gt) { endWith(ns, j); i = gt + 1; return }
      }
      // (2) tolerant: letter at i+2, name = [^\t\n\r\f />\0]*, then
      // the first '>' AFTER the name ends the construct
      if (i + 2 < n && isAsciiLetter(raw.charAt(i + 2))) {
        val ns = i + 2
        var j = ns + 1
        while (j < n && isTagNameChar(raw.charAt(j))) j += 1
        val gt2 = raw.indexOf('>', j)
        // gt2 >= 0 always: the name charset cannot cross the '>' at gt
        endWith(ns, j)
        i = gt2 + 1
        return
      }
      // (3) bogus comment
      val body = raw.substring(i + 2, gt)
      flushText()
      if (ev != null) ev += PEvent("comment", body, null)
      top.append(new Comment(body))
      i = gt + 1
    }

    /** XML-mode end tag (sitemap branch): original tolerant behavior. */
    private def parseEndTagXml(): Unit = {
      if (i + 2 >= n) { emitData("</", convert = false); i = n; return }
      if (raw.charAt(i + 2) == '>') { i += 3; return }
      val c = raw.charAt(i + 2)
      if (!isAsciiLetter(c)) { emitData("</", convert = false); i += 2; return }
      val ns = i + 2
      var j = ns + 1
      while (j < n && { val x = raw.charAt(j); !isSpace(x) && x != '/' && x != '>' && x != '\u0000' }) j += 1
      val gt = raw.indexOf('>', j)
      if (gt < 0) { emitData(raw.substring(i), convert = true); i = n; return }
      endWith(ns, j)
      i = gt + 1
    }

    /** bs4 `_popToTag`: pop to nearest matching open tag inclusive; ignore if absent. */
    private def popToTag(name: String): Unit = {
      var idx = stack.length - 1
      while (idx >= 1 && stack(idx).name != name) idx -= 1
      if (idx >= 1) stack.remove(idx, stack.length - idx)
    }
  }
}
