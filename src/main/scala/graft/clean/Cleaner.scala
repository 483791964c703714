package graft.clean

import graft.html._
import graft.url.PyUrl

/**
 * The reference's per-page cleaning pipeline, pass order pinned to
 * `clean_and_normalize_content` (/root/reference/processing/content_processor.py:20-41):
 *
 *   1. normalize_html_structure — drop empty tags (core/scraper.py:187-196)
 *   2. normalize_character_encoding — html.unescape per text node (:202-207)
 *   3. normalize_urls — absolutize `a[href]`, strip `utm_*` (:209-220)
 *   4. basic_content_cleaning — drop comments + `display:none` (:222-231)
 *   5. text = normalize_whitespace(soup.get_text()) (:198-200 via
 *      content_processor.py:29) — Unicode `\s+` → " ", then strip.
 *
 * Every quirk is intentional:
 *  - pass 1 iterates a PRE-ORDER SNAPSHOT of all elements, so a parent
 *    emptied by the removal of its children SURVIVES the pass (it was
 *    checked first); void tags (img/br/hr) are always empty → removed;
 *  - emptiness = get_text(strip=True) == "" AND no element descendants,
 *    so a tag containing only a comment is "empty" and goes;
 *  - pass 2 runs BEFORE comment/hidden removal AND it LAUNDERS every
 *    string node (bs4's find_all(text=True) + replace_with(str) turn
 *    Comments/Doctypes/CData/PIs/Declarations into plain text — see
 *    launderStringNodes), so pass 4's isinstance(_, Comment) finds
 *    nothing and comment/doctype text SURVIVES into get_text();
 *    entity decoding cannot resurrect markup (text stays text), but
 *    `&nbsp;` becomes U+00A0 which the final UNICODE `\s+` collapse
 *    folds into a single space;
 *  - pass 3 touches only `<a href>`: urljoin against the page url, then
 *    parse_qs(keep_blank_values=True) / drop `utm_*` / urlencode(doseq);
 *  - pass 4's hidden-subtree predicate is `re.search("display:\\s*none")`
 *    on the inline style value only.
 */
object Cleaner {

  /** Python's Unicode `\\s` set exactly (str.isspace semantics): ASCII ws,
    * VT, FS/GS/RS/US (1C-1F), NEL, NBSP, OGHAM, EN QUAD..HAIR SPACE, LS, PS,
    * NNBSP, MMSP, IDEOGRAPHIC SPACE. Java's `\\s` (even with
    * UNICODE_CHARACTER_CLASS) omits 1C-1F -- SURVEY.md hard-part #2. */
  private val unicodeWs = java.util.regex.Pattern.compile(
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]+")

  /** `normalize_whitespace` (core/scraper.py:198-200): every `\s+` run → one
    * space, then strip. Single-pass scanner — byte-identical to
    * `re.sub(r'\s+',' ',t).strip()` (the regex equivalent is pinned by the
    * CPython whitespace goldens). */
  def normalizeWhitespace(text: String): String = {
    val n = text.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      if (isPyWs(text.charAt(i))) { pendingSpace = true; i += 1 }
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        // bulk-append the whole non-ws run (arraycopy, not char-at-a-time)
        var k = i + 1
        while (k < n && !isPyWs(text.charAt(k))) k += 1
        sb.append(text, i, k)
        i = k
      }
    }
    sb.toString
  }

  private def isPyWs(c: Char): Boolean = PyStr.isPyWs(c)

  /** Fusion of `normalize_whitespace(soup.get_text())`: runs the same
    * state machine directly over the text-node walk instead of
    * materializing the full getText concatenation first (the doc-sized
    * intermediate string + second scan were ~15% of per-doc cost).
    * Byte-identical: the machine consumes exactly the concatenation
    * getText would have produced, in the same order. */
  def normalizedText(root: Element): String = {
    val sb = new java.lang.StringBuilder(512)
    var pendingSpace = false
    def feed(s: String): Unit = {
      val n = s.length
      var j = 0
      while (j < n) {
        if (isPyWs(s.charAt(j))) { pendingSpace = true; j += 1 }
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          // bulk-append the non-ws run (same chars, same order —
          // byte-identical; append(char) was ~15% of spin samples)
          var k = j + 1
          while (k < n && !isPyWs(s.charAt(k))) k += 1
          sb.append(s, j, k)
          j = k
        }
      }
    }
    def walk(e: Element): Unit = {
      val cs = e.children
      var i = 0
      while (i < cs.length) {
        cs(i) match {
          case t: Text    => feed(t.data)
          case c: CData   => feed(c.data) // bs4 get_text includes CData
          case c: Element => walk(c)
          case _ =>
        }
        i += 1
      }
    }
    walk(root)
    sb.toString
  }

  /** Pass 1: `normalize_html_structure` (core/scraper.py:187-196).
    * Semantics pinned to bs4: pre-order SNAPSHOT of all elements taken
    * before any removal; empty ⇔ no element descendant AND every text
    * descendant strips to "". The emptiness probe early-exits on the first
    * element child or non-blank text (same answer as the O(subtree)
    * get_text check, without the quadratic walk). */
  def removeEmptyTags(doc: Document): Unit = {
    val snapshot = doc.descendantElements // pre-order, materialized first
    snapshot.foreach { tag =>
      if (tag.parent != null && isEmptyTag(tag)) tag.extract()
    }
  }

  private def isEmptyTag(tag: Element): Boolean = {
    var i = 0
    val cs = tag.children
    while (i < cs.length) {
      cs(i) match {
        case _: Element => return false // any element descendant ⇒ kept
        // Python str.strip() semantics: &nbsp; (decoded to U+00A0 at parse
        // time), U+2028/U+3000/U+0085 etc. count as blank — Java trim would
        // keep the ubiquitous <td>&nbsp;</td> spacer the reference removes.
        case t: Text    => if (!PyStr.isBlank(t.data)) return false
        case c: CData   => if (!PyStr.isBlank(c.data)) return false // in get_text
        case _          => // comments/doctypes don't count as text (bs4)
      }
      i += 1
    }
    true
  }

  /** Pass 2: `normalize_character_encoding` (core/scraper.py:202-207) —
    * the full node-type LAUNDERING, settled by source-level analysis of
    * public bs4 (SURVEY §7.5 item 1, arbitrated round 4):
    *
    *   `for text in soup.find_all(text=True): text.replace_with(
    *    html.unescape(str(text)))`
    *
    *  - `find_all(text=True)` matches EVERY NavigableString subclass:
    *    SoupStrainer.search's NavigableString branch calls
    *    `_matches(markup, True)` which is `markup is not None`
    *    (bs4/element.py), and Comment/Doctype/CData/ProcessingInstruction/
    *    Declaration all subclass NavigableString;
    *  - `str(node)` is the INNER text (NavigableString subclasses str;
    *    PREFIX/SUFFIX like `<!--`/`-->` apply only in output_ready during
    *    serialization);
    *  - `replace_with` inserts via `Tag.insert`, which coerces a bare
    *    Python str into a plain NavigableString (bs4/element.py insert:
    *    `if isinstance(new_child, str) and not isinstance(new_child,
    *    NavigableString): new_child = NavigableString(new_child)`).
    *
    * Net effect: after this pass NO Comment/Doctype/CData/PI/Declaration
    * nodes remain — each becomes a PLAIN TEXT node holding its
    * html.unescape'd inner text. Hence (a) pass 4's
    * `isinstance(text, Comment)` finds nothing (comment removal is
    * vacuous on HTML pages), (b) comment/doctype/PI/declaration text
    * JOINS `get_text()`, and (c) `str(soup)` re-escapes the laundered
    * text with the minimal formatter (a comment's `<` serializes as
    * `&lt;`). Comments inside tags that pass 1 already removed (e.g. a
    * div whose only child is a comment — "empty" under bs4's default
    * interesting-string-types) are gone before this pass runs, so only
    * comments in non-empty contexts survive into the text. */
  def launderStringNodes(doc: Document): Unit = {
    def walk(e: Element): Unit = {
      val cs = e.children
      var i = 0
      while (i < cs.length) {
        cs(i) match {
          case t: Text        => t.data = Entities.unescape(t.data)
          case c: Element     => walk(c)
          // every other string class launders to a plain text node
          // (entities unescape ONCE here — parse-time convert_charrefs
          // never ran inside comments/decls/PIs/cdata)
          case c: CData       => e.replaceChild(c, new Text(Entities.unescape(c.data)))
          case c: Comment     => e.replaceChild(c, new Text(Entities.unescape(c.data)))
          case d: Doctype     => e.replaceChild(d, new Text(Entities.unescape(d.data)))
          case p: ProcIns     => e.replaceChild(p, new Text(Entities.unescape(p.data)))
          case d: Declaration => e.replaceChild(d, new Text(Entities.unescape(d.data)))
        }
        i += 1
      }
    }
    walk(doc)
  }

  /** @deprecated round-3 name; the pass is the full bs4 laundering now. */
  def unescapeTextNodes(doc: Document): Unit = launderStringNodes(doc)

  /** The pure per-href transform of pass 3: urljoin + `utm_*` strip
    * (core/scraper.py:210-220) — exposed for the href_norm_fuzz golden. */
  def normalizeHref(baseUrl: String, href: String): String = {
    val joined = graft.url.UrlMemo.urljoin(baseUrl, href)
    val parsed = PyUrl.urlparse(joined)
    val qd = PyUrl.parseQs(parsed.query, keepBlankValues = true)
    val filtered = qd.filterNot { case (k, _) => k.startsWith("utm_") }
    PyUrl.urlunparse(parsed.copy(query = PyUrl.urlencodeSeq(filtered)))
  }

  /** Pass 3: `normalize_urls` (core/scraper.py:209-220). */
  def absolutizeHrefs(doc: Document, baseUrl: String): Unit = {
    def walk(e: Element): Unit = {
      if (e.name == "a") e.attr("href").foreach { href =>
        // pure transform of (baseUrl, href) — memoized per thread (hot
        // path: every <a> of every page; nav/footer hrefs repeat heavily)
        val abs = graft.url.UrlMemo.hrefAbs(baseUrl, href) {
          normalizeHref(baseUrl, href)
        }
        e.setAttr("href", abs)
      }
      val cs = e.children
      var i = 0
      while (i < cs.length) {
        cs(i) match { case c: Element => walk(c); case _ => }
        i += 1
      }
    }
    walk(doc)
  }

  /** `re.search(r'display:\s*none', style)` — Python \s is UNICODE
    * whitespace (the pinned PyStr set); Java's `\\s` is ASCII-only and
    * would miss e.g. `display: none`. Pinned by display_none.json. */
  private[clean] def hasDisplayNone(st: String): Boolean = {
    var from = st.indexOf("display:")
    while (from >= 0) {
      var k = from + 8
      while (k < st.length && graft.html.PyStr.isPyWs(st.charAt(k))) k += 1
      if (st.regionMatches(k, "none", 0, 4)) return true
      from = st.indexOf("display:", from + 1)
    }
    false
  }

  /** Pass 4: `basic_content_cleaning` (core/scraper.py:222-231).
    * Comments first (all of them), then display:none subtrees — matching
    * the reference's two find_all passes. In-place removal walks backwards
    * so sibling indices stay valid. */
  def removeCommentsAndHidden(doc: Document): Unit = {
    def stripComments(e: Element): Unit = {
      var i = e.children.length - 1
      while (i >= 0) {
        e.children(i) match {
          case c: Comment => c.extract()
          case el: Element => stripComments(el)
          case _ =>
        }
        i -= 1
      }
    }
    stripComments(doc)
    def stripHidden(e: Element): Unit = {
      var i = e.children.length - 1
      while (i >= 0) {
        e.children(i) match {
          case el: Element =>
            val hidden = el.attr("style").exists(hasDisplayNone)
            if (hidden) el.extract() else stripHidden(el)
          case _ =>
        }
        i -= 1
      }
    }
    stripHidden(doc)
  }

  final case class CleanResult(text: String, cleanedDoc: Document)

  /** In-place cleaning of an already-parsed DOM (the pipeline parses ONCE,
    * extracts metadata/links/anchors from the raw tree — the reference does
    * the same for links, link_extractor.py:17 re-parses raw content — then
    * cleans). Returns the byte-contract text. */
  def cleanDocument(doc: Document, url: String): String = {
    removeEmptyTags(doc)
    launderStringNodes(doc)
    absolutizeHrefs(doc, url)
    removeCommentsAndHidden(doc) // vacuous for comments post-laundering —
    // exactly like the reference's pass 4; the display:none half is live
    normalizedText(doc)
  }

  /** Full `clean_and_normalize_content` order; returns the byte-contract
    * text plus the cleaned DOM (for sanitize stages). */
  def cleanAndNormalize(htmlContent: String, url: String): CleanResult = {
    val doc = HtmlParser.parse(htmlContent)
    CleanResult(cleanDocument(doc, url), doc)
  }

  def cleanAndNormalizeBytes(html: Array[Byte], url: String): CleanResult =
    cleanAndNormalize(HtmlParser.decode(html), url)

  /** Plain-text payloads (`text/plain` branch, core/scraper.py:515-517):
    * stored verbatim by the reference; text contract = whitespace-normalized
    * body (the shared `normalize_whitespace` treatment). */
  def cleanPlainText(body: String): String = normalizeWhitespace(body)
}
