package graft.sources

import scala.collection.mutable.ArrayBuffer
import graft.html.PyStr

/**
 * Minimal strict-XML parser emulating expat's ACCEPTANCE — the error
 * classes `xmltodict.parse` surfaces as ExpatError — for the sitemap
 * source. The reference feeds raw sitemap bytes to xmltodict
 * (/root/reference/core/scraper.py:696) and maps ExpatError to an empty
 * result (:712-714); a lenient tokenizer would accept truncated or
 * malformed sitemaps the reference rejects, so this branch needs real
 * well-formedness checking. Every accept/reject decision and every
 * produced text value is pinned against this container's xmltodict/expat
 * by the sitemap_fuzz.json differential corpus (SitemapFuzzSpec;
 * scripts/gen_sitemap_fuzz.py).
 *
 * Two failure channels, matching the reference's exception granularity:
 *  - NotWellFormed — expat's ExpatError, which the reference CATCHES
 *    (empty seed list);
 *  - ExpatUnsupported — conditions where pyexpat/xmltodict raise
 *    ValueError instead (multi-byte declared encodings like shift_jis,
 *    `<!ENTITY` definitions = the billion-laughs guard), which the
 *    reference's `except xmltodict.expat.ExpatError` does NOT catch, so
 *    parse_sitemap crashes — the closed-world mapping is parse_error.
 *
 * Implemented grammar subset (everything sitemap payloads exercise):
 * validated XML declaration at byte 0 only (version first, then optional
 * encoding/standalone, whitespace REQUIRED between them); prolog
 * comments/PIs/one DOCTYPE (external ids skipped; internal subset
 * restricted to ELEMENT/ATTLIST/NOTATION declarations, comments, PIs and
 * `%pe;` refs — ENTITY raises ExpatUnsupported, anything else
 * NotWellFormed); one root element parsed ITERATIVELY (expat handles
 * 30k-deep nesting, so no recursion); strict tags with quoted attribute
 * values ('<' forbidden inside), required whitespace between attributes,
 * duplicate-attribute rejection; the five predefined entities plus
 * `&#ddd;`/`&#xhh;` (lowercase x, any digit count, legal-XML-char
 * targets only); CDATA sections; comments without interior `--`; PIs
 * with non-"xml" targets; `]]>` forbidden in character data; control
 * chars other than tab/LF/CR forbidden; `\r\n`/`\r` normalized to `\n`
 * before parsing; trailing junk after the root rejected.
 */
object StrictXml {

  final class NotWellFormed(msg: String) extends RuntimeException(msg)

  /** pyexpat raises ValueError (not ExpatError) for these — uncaught in
    * the reference, i.e. parse_sitemap CRASHES. */
  final class ExpatUnsupported(msg: String) extends RuntimeException(msg)

  /** Parsed element: child ELEMENTS (document order), attribute names
    * (values are irrelevant to the sitemap outcome), and the raw
    * character-data join (text runs + entity expansions + CDATA chunks,
    * comments/PIs skipped) — exactly what xmltodict's
    * `cdata_separator.join(...)` sees before its strip. */
  final class XElem(val name: String) {
    val attrNames = ArrayBuffer.empty[String]
    val children = ArrayBuffer.empty[XElem]
    private[StrictXml] val text = new java.lang.StringBuilder
    def textJoined: String = text.toString
    def hasAttrs: Boolean = attrNames.nonEmpty
  }

  def parseBytes(bytes: Array[Byte]): XElem = parse(decode(bytes))

  def parse(raw: String): XElem = {
    // XML 1.0 end-of-line normalization happens before tokenizing
    var s = raw
    if (s.indexOf('\r') >= 0) s = s.replace("\r\n", "\n").replace('\r', '\n')
    new P(s).document()
  }

  /** expat's built-in encodings are UTF-8/UTF-16 and ASCII/Latin-1;
    * pyexpat's unknown-encoding handler extends that to any SINGLE-BYTE
    * Python codec (windows-1252, koi8-r, cp437, mac-roman all parse) but
    * raises ValueError("multi-byte encodings are not supported") for
    * shift_jis/euc-jp/gb2312/big5 — probed and pinned in the fuzz corpus. */
  private def decode(bytes: Array[Byte]): String = {
    import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
    def strict(cs: Charset, offset: Int): String = {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try dec.decode(java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString
      catch { case e: Exception => throw new NotWellFormed("bad encoding: " + e.getMessage) }
    }
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return strict(StandardCharsets.UTF_8, 3)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return strict(StandardCharsets.UTF_16LE, 2)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return strict(StandardCharsets.UTF_16BE, 2)
    // declaration encoding sniff (ASCII-compatible prefix)
    val headLen = math.min(bytes.length, 128)
    val head = new String(bytes, 0, headLen, StandardCharsets.ISO_8859_1)
    if (head.startsWith("<?xml")) {
      val m = java.util.regex.Pattern
        .compile("""encoding\s*=\s*["']([A-Za-z0-9._-]+)["']""")
        .matcher(head)
      if (m.find()) {
        val name = m.group(1)
        val cs =
          try Charset.forName(name)
          catch { case _: Exception =>
            // pyexpat surfaces unknown declared encodings as LookupError —
            // NOT ExpatError — so the reference crashes (fuzz-pinned)
            throw new ExpatUnsupported("unknown encoding: " + name)
          }
        val lower = cs.name().toLowerCase(java.util.Locale.ROOT)
        val utfFamily = lower == "utf-8" || lower.startsWith("utf-16") ||
          lower.startsWith("x-utf-16")
        if (!utfFamily) {
          val maxBytes =
            try cs.newEncoder().maxBytesPerChar()
            catch { case _: UnsupportedOperationException => 2.0f }
          if (maxBytes > 1.0f)
            throw new ExpatUnsupported("multi-byte encodings are not supported")
        }
        return strict(cs, 0)
      }
    }
    strict(StandardCharsets.UTF_8, 0)
  }

  private final class P(s: String) {
    private val n = s.length
    private var i = 0

    private def fail(msg: String): Nothing =
      throw new NotWellFormed(s"$msg at offset $i")

    private def isS(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n'
    private def skipS(): Unit = { while (i < n && isS(s.charAt(i))) i += 1 }

    private def isNameStart(c: Char): Boolean =
      c == ':' || c == '_' ||
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= 0xC0 && c <= 0xD6) || (c >= 0xD8 && c <= 0xF6) ||
        (c >= 0xF8 && c <= 0x2FF) || (c >= 0x370 && c <= 0x37D) ||
        (c >= 0x37F && c <= 0x1FFF) || (c >= 0x200C && c <= 0x200D) ||
        (c >= 0x2070 && c <= 0x218F) || (c >= 0x2C00 && c <= 0x2FEF) ||
        (c >= 0x3001 && c <= 0xD7FF) || (c >= 0xF900 && c <= 0xFDCF) ||
        (c >= 0xFDF0 && c <= 0xFFFD) || Character.isSurrogate(c)

    private def isNameChar(c: Char): Boolean =
      isNameStart(c) || c == '-' || c == '.' || (c >= '0' && c <= '9') ||
        c == 0xB7 || (c >= 0x300 && c <= 0x36F) || (c >= 0x203F && c <= 0x2040)

    private def xmlName(): String = {
      if (i >= n || !isNameStart(s.charAt(i))) fail("name expected")
      val start = i
      i += 1
      while (i < n && isNameChar(s.charAt(i))) i += 1
      s.substring(start, i)
    }

    private def isLegalChar(c: Char): Boolean =
      c == '\t' || c == '\n' ||
        (c >= 0x20 && c <= 0xD7FF) || (c >= 0xE000 && c <= 0xFFFD) ||
        Character.isSurrogate(c) // pairs checked by decode; sitemaps: fine

    def document(): XElem = {
      // XML declaration: at offset 0 ONLY, with validated pseudo-attrs
      if (s.startsWith("<?xml") && (n == 5 || !isNameChar(s.charAt(5))))
        xmlDecl()
      var sawDoctype = false
      var scanning = true
      while (scanning) {
        skipS()
        if (s.startsWith("<!--", i)) comment()
        else if (s.startsWith("<!DOCTYPE", i) && !sawDoctype) { doctype(); sawDoctype = true }
        else if (s.startsWith("<?", i)) pi()
        else scanning = false
      }
      if (i >= n) fail("no element found")
      if (s.charAt(i) != '<') fail("junk before document element")
      if (i + 1 >= n || !isNameStart(s.charAt(i + 1))) fail("invalid document element")
      val root = parseRoot()
      var trailing = true
      while (trailing) {
        skipS()
        if (s.startsWith("<!--", i)) comment()
        else if (s.startsWith("<?", i)) pi()
        else trailing = false
      }
      if (i < n) fail("junk after document element")
      root
    }

    /** `<?xml version=… (encoding=…)? (standalone=…)? ?>` — whitespace
      * required between pseudo-attributes, version first (expat rejects
      * `<?xml bogus?>`, `<?xml encoding=…?>` and the no-space form —
      * probed and pinned in the fuzz corpus). */
    private def xmlDecl(): Unit = {
      i = 5
      declPseudoAttr("version", required = true)
      val sawEnc = declPseudoAttr("encoding", required = false)
      declPseudoAttr("standalone", required = false)
      skipS()
      if (!s.startsWith("?>", i)) fail("XML declaration not well-formed")
      i += 2
      locally(sawEnc) // encoding value already consumed by decode()
    }

    /** Consumes `S+ name S* = S* 'value'` when `name` is next; returns
      * whether it matched. The LEADING whitespace is mandatory. */
    private def declPseudoAttr(name: String, required: Boolean): Boolean = {
      val save = i
      if (i >= n || !isS(s.charAt(i))) {
        if (required) fail("XML declaration not well-formed")
        return false
      }
      skipS()
      if (!s.startsWith(name, i)) {
        if (required) fail("XML declaration not well-formed")
        i = save
        return false
      }
      i += name.length
      skipS()
      if (i >= n || s.charAt(i) != '=') fail("XML declaration not well-formed")
      i += 1
      skipS()
      if (i >= n || (s.charAt(i) != '"' && s.charAt(i) != '\'')) fail("XML declaration not well-formed")
      val q = s.charAt(i)
      val e = s.indexOf(q, i + 1)
      if (e < 0) fail("XML declaration not well-formed")
      i = e + 1
      true
    }

    /** `<!DOCTYPE name (SYSTEM lit | PUBLIC lit lit)? ([subset])? >` —
      * the internal subset allows only ELEMENT/ATTLIST/NOTATION decls,
      * comments, PIs and `%pe;` refs; `<!ENTITY` is pyexpat's
      * entities-are-disabled ValueError (ExpatUnsupported). */
    private def doctype(): Unit = {
      i += 9 // <!DOCTYPE
      if (i >= n || !isS(s.charAt(i))) fail("DOCTYPE name expected")
      skipS()
      xmlName()
      skipS()
      // optional ExternalID: SYSTEM lit | PUBLIC lit lit (case-sensitive;
      // arbitrary junk keywords are expat errors — fuzz-pinned)
      def literal(): Unit = {
        if (i >= n || (s.charAt(i) != '"' && s.charAt(i) != '\'')) fail("literal expected in DOCTYPE")
        val q = s.charAt(i)
        val e = s.indexOf(q, i + 1)
        if (e < 0) fail("unclosed literal in DOCTYPE")
        i = e + 1
      }
      if (s.startsWith("SYSTEM", i)) {
        i += 6
        if (i >= n || !isS(s.charAt(i))) fail("space expected after SYSTEM")
        skipS(); literal()
      } else if (s.startsWith("PUBLIC", i)) {
        i += 6
        if (i >= n || !isS(s.charAt(i))) fail("space expected after PUBLIC")
        skipS(); literal()
        if (i >= n || !isS(s.charAt(i))) fail("space expected after public id")
        skipS(); literal()
      }
      skipS()
      if (i < n && s.charAt(i) == '[') { i += 1; internalSubset() }
      skipS()
      if (i >= n || s.charAt(i) != '>') fail("'>' expected in DOCTYPE")
      i += 1
    }

    private def internalSubset(): Unit = {
      var inSubset = true
      while (inSubset) {
        skipS()
        if (i >= n) fail("unclosed internal subset")
        if (s.charAt(i) == ']') { i += 1; inSubset = false }
        else if (s.startsWith("<!--", i)) comment()
        else if (s.startsWith("<?", i)) pi()
        else if (s.startsWith("<!ENTITY", i))
          throw new ExpatUnsupported("entities are disabled")
        else if (s.startsWith("<!ELEMENT", i) || s.startsWith("<!ATTLIST", i) ||
                 s.startsWith("<!NOTATION", i)) {
          // skip the declaration to its '>' (quoted literals honored)
          var open = true
          while (open) {
            if (i >= n) fail("unclosed markup declaration")
            s.charAt(i) match {
              case '>' => i += 1; open = false
              case '"' | '\'' =>
                val q = s.charAt(i)
                val e = s.indexOf(q, i + 1)
                if (e < 0) fail("unclosed literal in declaration")
                i = e + 1
              case _ => i += 1
            }
          }
        }
        else if (s.charAt(i) == '%') {
          i += 1
          xmlName()
          if (i >= n || s.charAt(i) != ';') fail("bad parameter entity reference")
          i += 1
        }
        else fail("junk in internal subset")
      }
    }

    private def comment(): Unit = {
      i += 4 // <!--
      var open = true
      while (open) {
        if (i >= n) fail("unclosed comment")
        val c = s.charAt(i)
        if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
          if (i + 2 < n && s.charAt(i + 2) == '>') { i += 3; open = false }
          else fail("'--' inside comment")
        } else {
          if (!isLegalChar(c)) fail("illegal char in comment")
          i += 1
        }
      }
    }

    private def pi(): Unit = {
      i += 2 // <?
      val target = xmlName()
      if (target.equalsIgnoreCase("xml"))
        fail("XML declaration not at start of entity")
      val e = s.indexOf("?>", i)
      if (e < 0) fail("unclosed processing instruction")
      var j = i
      while (j < e) { if (!isLegalChar(s.charAt(j))) fail("illegal char in PI"); j += 1 }
      i = e + 2
    }

    /** `&...;` — predefined names, `#ddd`, `#xhh` (lowercase x; any
      * length — `&#00000065;` is legal). Appends the expansion to `out`. */
    private def entity(out: java.lang.StringBuilder): Unit = {
      var sc = i + 1
      while (sc < n && s.charAt(sc) != ';' && s.charAt(sc) != '<' &&
             s.charAt(sc) != '&' && !isS(s.charAt(sc))) sc += 1
      if (sc >= n || s.charAt(sc) != ';') fail("undefined entity")
      val body = s.substring(i + 1, sc)
      body match {
        case "amp"  => out.append('&')
        case "lt"   => out.append('<')
        case "gt"   => out.append('>')
        case "quot" => out.append('"')
        case "apos" => out.append('\'')
        case _ =>
          var cp = -1L
          if (body.length > 2 && body.startsWith("#x")) {
            val hex = body.substring(2)
            if (hex.length <= 8 &&
                hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
              cp = java.lang.Long.parseLong(hex, 16)
          } else if (body.length > 1 && body.startsWith("#")) {
            val dec = body.substring(1)
            if (dec.length <= 16 && dec.forall(c => c >= '0' && c <= '9'))
              cp = java.lang.Long.parseLong(dec)
          } else fail("undefined entity")
          val legal = cp == 0x9 || cp == 0xA || cp == 0xD ||
            (cp >= 0x20 && cp <= 0xD7FF) || (cp >= 0xE000 && cp <= 0xFFFD) ||
            (cp >= 0x10000 && cp <= 0x10FFFF)
          if (!legal) fail("reference to invalid character number")
          out.appendCodePoint(cp.toInt)
      }
      i = sc + 1
    }

    /** Start tag at `i` ('<' + NameStart): name + attributes. Returns
      * the element and whether it self-closed. */
    private def startTag(): (XElem, Boolean) = {
      i += 1 // '<'
      val name = xmlName()
      val el = new XElem(name)
      var headOpen = true
      var empty = false
      while (headOpen) {
        val before = i
        skipS()
        if (i >= n) fail("unclosed start tag")
        val c = s.charAt(i)
        if (c == '>') { i += 1; headOpen = false }
        else if (c == '/') {
          if (!s.startsWith("/>", i)) fail("'/' not closing start tag")
          i += 2; headOpen = false; empty = true
        } else {
          if (i == before) fail("whitespace required before attribute")
          val aname = xmlName()
          skipS()
          if (i >= n || s.charAt(i) != '=') fail("'=' expected")
          i += 1
          skipS()
          if (i >= n || (s.charAt(i) != '"' && s.charAt(i) != '\'')) fail("quoted value expected")
          val q = s.charAt(i)
          i += 1
          val scratch = new java.lang.StringBuilder
          var inValue = true
          while (inValue) {
            if (i >= n) fail("unclosed attribute value")
            val vc = s.charAt(i)
            if (vc == q) { i += 1; inValue = false }
            else if (vc == '<') fail("'<' in attribute value")
            else if (vc == '&') entity(scratch)
            else { if (!isLegalChar(vc)) fail("illegal char in attribute"); i += 1 }
          }
          if (el.attrNames.contains(aname)) fail("duplicate attribute")
          el.attrNames += aname
        }
      }
      (el, empty)
    }

    /** Root element, parsed ITERATIVELY with an explicit open-element
      * stack — expat handles arbitrarily deep nesting and a recursive
      * descent would StackOverflowError (an Error, escaping the row-level
      * Exception isolation) on deep payloads. */
    private def parseRoot(): XElem = {
      val (root, rootEmpty) = startTag()
      if (rootEmpty) return root
      val stack = ArrayBuffer[XElem](root)
      while (stack.nonEmpty) {
        if (i >= n) fail("no element found") // EOF inside element
        val cur = stack(stack.length - 1)
        val c = s.charAt(i)
        if (c == '<') {
          if (s.startsWith("</", i)) {
            i += 2
            val enm = xmlName()
            if (enm != cur.name) fail(s"mismatched tag </$enm>")
            skipS()
            if (i >= n || s.charAt(i) != '>') fail("'>' expected in end tag")
            i += 1
            stack.remove(stack.length - 1)
          }
          else if (s.startsWith("<!--", i)) comment()
          else if (s.startsWith("<![CDATA[", i)) {
            i += 9
            val e = s.indexOf("]]>", i)
            if (e < 0) fail("unclosed CDATA section")
            var j = i
            while (j < e) { if (!isLegalChar(s.charAt(j))) fail("illegal char in CDATA"); j += 1 }
            cur.text.append(s, i, e)
            i = e + 3
          }
          else if (s.startsWith("<!", i)) fail("markup declaration in content")
          else if (s.startsWith("<?", i)) pi()
          else if (i + 1 < n && isNameStart(s.charAt(i + 1))) {
            val (el, empty) = startTag()
            cur.children += el
            if (!empty) stack += el
          }
          else fail("bare '<' in content")
        }
        else if (c == '&') entity(cur.text)
        else if (c == ']' && s.startsWith("]]>", i)) fail("']]>' in content")
        else {
          if (!isLegalChar(c)) fail("illegal char in content")
          cur.text.append(c)
          i += 1
        }
      }
      root
    }
  }

  /** xmltodict's value for an element used as a dict member: None when
    * the stripped character data is empty (Python str.strip semantics). */
  def textValue(el: XElem): String = {
    val t = PyStr.strip(el.textJoined)
    if (t.isEmpty) null else t
  }
}
