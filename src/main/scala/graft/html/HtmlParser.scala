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
 * Pinned behaviors (the byte-identity contract hangs on these):
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
 *
 * XML payloads (`application/xml` branch, /root/reference/core/scraper.py:512-517)
 * parse with `xmlMode = true`: case preserved, no void set, no CDATA mode.
 */
object HtmlParser {

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
    new Parser(html, xmlMode).run()
  }

  private final class Parser(raw: String, xmlMode: Boolean) {
    private val n = raw.length
    private var i = 0
    private val doc = new Document
    private val stack = ArrayBuffer[Element](doc)
    private val pendingText = new java.lang.StringBuilder
    private var cdataElem: String = null // inside <script>/<style>

    private def top: Element = stack(stack.length - 1)

    private def flushText(): Unit = {
      if (pendingText.length > 0) {
        top.append(new Text(pendingText.toString))
        pendingText.setLength(0)
      }
    }

    private def emitData(s: String, convert: Boolean): Unit = {
      if (s.isEmpty) return
      pendingText.append(if (convert) Entities.unescape(s) else s)
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

    /** CDATA mode, pinned against CPython 3.11: the `interesting` regex
      * stops at `</\s*script` (prefix, case-insensitive, unicode \s), but
      * the element only CLOSES when the full endtagfind
      * `</\s*script\s*>` matches — "</script b>c" and "</scripts>" are
      * cdata DATA (through their '>'), and a different end tag
      * ("</style>" inside script) likewise. Unterminated cdata at EOF is
      * DROPPED (goahead's final data flush is gated on `not cdata_elem`). */
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
              popToTag(cdataElem)
              i = gt + 1
              cdataElem = null
              return
            } else j = gt + 1 // end-tag-shaped junk: cdata data through '>'
          }
        }
      }
    }

    private def dispatchAngle(): Unit = {
      // raw(i) == '<'
      if (i + 1 >= n) { emitData("<", convert = false); i = n; return }
      val c = raw.charAt(i + 1)
      if (isAsciiLetter(c)) parseStartTag()
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
      // unicode whitespace — the pinned PyStr set), not only at "-->"
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
      val (body, nx) =
        if (close < 0) (raw.substring(i + 4), n) else (raw.substring(i + 4, close), next)
      flushText()
      top.append(new Comment(body))
      i = nx
    }

    private def parsePI(): Unit = {
      val end = raw.indexOf('>', i + 2)
      val (body, next) =
        if (end < 0) (raw.substring(i + 2), n) else (raw.substring(i + 2, end), end + 1)
      flushText()
      top.append(new ProcIns(body))
      i = next
    }

    private def parseDecl(): Unit = {
      val end = raw.indexOf('>', i + 2)
      val (body, next) =
        if (end < 0) (raw.substring(i + 2), n) else (raw.substring(i + 2, end), end + 1)
      flushText()
      val trimmed = body.trim
      if (trimmed.regionMatches(true, 0, "doctype", 0, 7))
        top.append(new Doctype(trimmed.substring(7).trim))
      else
        top.append(new Comment(body)) // bogus declaration — keep as comment-ish
      i = next
    }

    private def isSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    private def parseStartTag(): Unit = {
      var j = i + 1
      val nameStart = j
      // tagfind_tolerant: [a-zA-Z][^\t\n\r\f />\x00]*
      j += 1
      while (j < n && { val c = raw.charAt(j); !isSpace(c) && c != '/' && c != '>' && c != '\u0000' }) j += 1
      val name = {
        val interned =
          if (xmlMode) Interned.lookupExact(raw, nameStart, j)
          else Interned.lookupLower(raw, nameStart, j)
        if (interned != null) interned
        else if (xmlMode) raw.substring(nameStart, j)
        else raw.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
      }
      // attrs land straight on the element (the old temp buffer + foreach
      // copy double-handled every attr); class-collapse at insert time is
      // equivalent because collapse is per-value and last-wins
      val el = new Element(name)
      val attrs = el.attrs
      var selfClosing = false
      var done = false
      while (!done) {
        // skip whitespace and '/' not followed by '>'
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
          // attribute name: [^\s/>][^\s/=>]*
          val an = j
          j += 1
          while (j < n && { val x = raw.charAt(j); !isSpace(x) && x != '/' && x != '=' && x != '>' }) j += 1
          var aname =
            if (xmlMode) Interned.lookupExact(raw, an, j)
            else Interned.lookupLower(raw, an, j)
          if (aname == null)
            aname = if (xmlMode) raw.substring(an, j)
                    else raw.substring(an, j).toLowerCase(java.util.Locale.ROOT)
          // optional  \s*=+\s*  then value
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
          // bs4 collapses multi-valued attrs (class) to space-joined tokens
          val v =
            if (!xmlMode && aname == "class")
              unescaped.split("\\s+").filter(_.nonEmpty).mkString(" ")
            else unescaped
          var existing = -1
          var ai = 0
          while (existing < 0 && ai < attrs.length) {
            if (attrs(ai)._1 == aname) existing = ai
            ai += 1
          }
          if (existing >= 0) attrs(existing) = (aname, v) // bs4 REPLACE: last wins
          else attrs += ((aname, v))
        }
      }
      i = j
      flushText()
      val isVoid = !xmlMode && voidElements.contains(name)
      el.isVoid = isVoid
      top.append(el)
      if (!isVoid && !selfClosing) {
        stack += el
        if (!xmlMode && cdataElements.contains(name)) cdataElem = name
      }
    }

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
      popToTag(name)
    }

    /** CPython 3.11 `parse_endtag`, pinned against this container's
      * interpreter: (1) strict `</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>`
      * (unicode \s — "</ p >" and "</p\u00a0>" close p); else (2)
      * tagfind_tolerant at i+2 ("</div\tjunk>" ends div, "</a<b>" ends
      * "a<b"); else (3) a BOGUS COMMENT of everything between "</" and
      * the first ">" ("</.foo>" -> Comment(".foo"), "</ a b>" ->
      * Comment(" a b")). "</>" stays dropped. */
    private def parseEndTag(): Unit = {
      // raw(i,i+1) == "</"
      if (i + 2 >= n) { emitData("</", convert = false); i = n; return }
      if (raw.charAt(i + 2) == '>') { i += 3; return } // '</>' dropped
      if (xmlMode) { parseEndTagXml(); return }
      val gt = raw.indexOf('>', i + 2)
      if (gt < 0) { // no '>' at all: goahead(end=1) data fallback
        emitData(raw.substring(i), convert = true)
        i = n
        return
      }
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
      val c2 = raw.charAt(i + 2)
      if (isAsciiLetter(c2)) {
        val ns = i + 2
        var j = ns + 1
        while (j < n && { val x = raw.charAt(j)
          x != '\t' && x != '\n' && x != '\r' && x != '\f' && x != ' ' &&
            x != '/' && x != '>' && x != '\u0000' }) j += 1
        val gt2 = raw.indexOf('>', j)
        if (gt2 < 0) { emitData(raw.substring(i), convert = true); i = n; return }
        endWith(ns, j)
        i = gt2 + 1
        return
      }
      // (3) bogus comment
      flushText()
      top.append(new Comment(raw.substring(i + 2, gt)))
      i = gt + 1
    }

    /** XML-mode end tag (sitemap branch): original tolerant behavior. */
    private def parseEndTagXml(): Unit = {
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
