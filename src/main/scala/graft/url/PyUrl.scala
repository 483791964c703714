package graft.url

import scala.collection.mutable.ArrayBuffer

/**
 * Semantic port of the `urllib.parse` behaviors the reference relies on
 * (urlparse/urlunparse/urljoin/quote/unquote/parse_qsl/parse_qs/urlencode) —
 * pinned against CPython 3.11 semantics (the container interpreter the
 * goldens/fuzz corpora are generated from: urlunsplit's uses_netloc
 * re-rooting, the rtsps scheme, tab/CR/LF stripping in urlsplit), since
 * the byte-identity contract
 * (normalized URLs embedded in cleaned HTML and the links table) flows
 * through these functions (/root/reference/processing/utils.py:14-87,
 * /root/reference/core/scraper.py:209-220).
 */
object PyUrl {

  /** `urlparse` 6-tuple. */
  final case class Parts(scheme: String, netloc: String, path: String,
                         params: String, query: String, fragment: String) {
    /** `parsed.hostname`: lowercased host, no port/userinfo/brackets. */
    def hostname: String = {
      var h = netloc
      val at = h.lastIndexOf('@')
      if (at >= 0) h = h.substring(at + 1)
      if (h.startsWith("[")) {
        val close = h.indexOf(']')
        if (close >= 0) return h.substring(1, close).toLowerCase(java.util.Locale.ROOT)
      }
      val colon = h.indexOf(':')
      if (colon >= 0) h = h.substring(0, colon)
      h.toLowerCase(java.util.Locale.ROOT)
    }

    /** `parsed.port`, CPython-faithful (urllib.parse SplitResult.port):
      * None when absent or empty; ValueError-analog
      * (IllegalArgumentException) when not ASCII digits or outside
      * 0–65535 — pinned against this container's CPython:
      * "h:" → None, "h:abc"/"h:١٢" → raise, "h:00080" → 80,
      * "h:99999" → raise (out of range). Callers that must not crash
      * catch at the reference's granularity (extract_links page-level). */
    def port: Option[Int] = {
      var h = netloc
      val at = h.lastIndexOf('@')
      if (at >= 0) h = h.substring(at + 1)
      val close = if (h.startsWith("[")) h.indexOf(']') else -1
      val colon = h.indexOf(':', math.max(close, 0))
      if (colon < 0) None
      else {
        val p = h.substring(colon + 1)
        if (p.isEmpty) None
        else if (!p.forall(c => c >= '0' && c <= '9'))
          throw new IllegalArgumentException(
            s"Port could not be cast to integer value as '$p'")
        else {
          val v =
            try p.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException("Port out of range 0-65535") }
          if (v > 65535)
            throw new IllegalArgumentException("Port out of range 0-65535")
          Some(v)
        }
      }
    }
  }

  /** CPython `scheme_chars` — ASCII letters/digits/+-. only (Scala's
    * isLetterOrDigit would admit unicode letters CPython rejects). */
  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** CPython 3.11 `uses_params` — urlparse splits `;params` off the last
    * path segment ONLY for these schemes (notably NOT `file`). */
  private val usesParams = Set("", "ftp", "hdl", "prospero", "http", "imap",
    "https", "shttp", "rtsp", "rtsps", "rtspu", "sip", "sips", "mms", "sftp", "tel")

  /** CPython `urlparse` (allow_fragments=True). urlsplit first REMOVES
    * every tab/CR/LF anywhere in the url (`_UNSAFE_URL_BYTES_TO_REMOVE`,
    * WHATWG-aligned; fuzz-pinned). */
  def urlparse(url: String, defaultScheme: String = ""): Parts = {
    var rest = url
    if (rest.indexOf('\t') >= 0) rest = rest.replace("\t", "")
    if (rest.indexOf('\r') >= 0) rest = rest.replace("\r", "")
    if (rest.indexOf('\n') >= 0) rest = rest.replace("\n", "")
    var scheme = defaultScheme
    val colon = rest.indexOf(':')
    if (colon > 0) {
      val cand = rest.substring(0, colon)
      if (isAsciiAlpha(cand.charAt(0)) && cand.forall(isSchemeChar)) {
        scheme = cand.toLowerCase(java.util.Locale.ROOT)
        rest = rest.substring(colon + 1)
      }
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      var j = 2
      while (j < rest.length && rest.charAt(j) != '/' && rest.charAt(j) != '?' && rest.charAt(j) != '#') j += 1
      netloc = rest.substring(2, j)
      rest = rest.substring(j)
    }
    var fragment = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    var query = ""
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = rest.substring(qm + 1); rest = rest.substring(0, qm) }
    // _splitparams: ';' in the last path segment — uses_params schemes only
    var params = ""
    var path = rest
    if (usesParams.contains(scheme)) {
      val semiFrom = if (rest.contains('/')) rest.lastIndexOf('/') else 0
      val semi = rest.indexOf(';', semiFrom)
      if (semi >= 0) { params = rest.substring(semi + 1); path = rest.substring(0, semi) }
    }
    Parts(scheme, netloc, path, params, query, fragment)
  }

  /** CPython 3.11 `urlunparse` (via urlunsplit). Two pinned quirks: the
    * `uses_netloc` re-rooting ("ftp:z" → "ftp:///z"), and NO re-wrapping
    * when the path itself starts with "//" and netloc is empty — so
    * ("http", "", "//x") reassembles as "http://x", silently promoting
    * the path into a netloc position (3.11 dropped the old
    * `url[:2] == '//'` wrap clause; fuzz-pinned). */
  def urlunparse(p: Parts): String = {
    var url = p.path
    if (p.params.nonEmpty) url = url + ";" + p.params
    if (p.netloc.nonEmpty ||
        (p.scheme.nonEmpty && usesNetloc.contains(p.scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + p.netloc + url
    }
    if (p.scheme.nonEmpty) url = p.scheme + ":" + url
    if (p.query.nonEmpty) url = url + "?" + p.query
    if (p.fragment.nonEmpty) url = url + "#" + p.fragment
    url
  }

  /** CPython `str.encode('idna')` — the STDLIB codec (encodings/idna.py),
    * NOT the idna package. ASCII input takes a fast path that checks ONLY
    * label lengths (intermediate labels 1..63 bytes, last label <64 and
    * may be empty = trailing dot); non-ASCII input splits on the four
    * IDNA dot characters and runs ToASCII per label (nameprep+punycode —
    * java.net.IDN implements the same IDNA2003 family). Throws
    * IllegalArgumentException where CPython raises UnicodeError; the
    * reference's `except idna.IDNAError` (utils.py:29-31) can never catch
    * the codec's UnicodeError, so these failures propagate to its outer
    * except → ParsingError. */
  def encodeIdna(netloc: String): String = {
    if (netloc.isEmpty) return netloc
    var allAscii = true
    var i = 0
    while (allAscii && i < netloc.length) {
      if (netloc.charAt(i) >= 128) allAscii = false
      i += 1
    }
    if (allAscii) {
      val labels = splitKeepAll(netloc, '.')
      var j = 0
      while (j < labels.length - 1) {
        val l = labels(j).length
        if (l == 0 || l >= 64) throw new IllegalArgumentException("label empty or too long")
        j += 1
      }
      if (labels.last.length >= 64) throw new IllegalArgumentException("label too long")
      netloc
    } else {
      val labels = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      var k = 0
      while (k < netloc.length) {
        val c = netloc.charAt(k)
        if (c == '.' || c == '。' || c == '．' || c == '｡') {
          labels += netloc.substring(start, k)
          start = k + 1
        }
        k += 1
      }
      labels += netloc.substring(start)
      var trailingDot = ""
      if (labels.last.isEmpty) { trailingDot = "."; labels.remove(labels.length - 1) }
      val sb = new java.lang.StringBuilder
      labels.foreach { label =>
        if (sb.length > 0) sb.append('.')
        sb.append(toAsciiLabel(label))
      }
      sb.append(trailingDot)
      sb.toString
    }
  }

  private def toAsciiLabel(label: String): String = {
    if (label.forall(_ < 128)) {
      if (label.nonEmpty && label.length < 64) label
      else throw new IllegalArgumentException("label empty or too long")
    } else {
      val ace =
        try java.net.IDN.toASCII(label)
        catch { case e: Exception => throw new IllegalArgumentException("idna: " + e.getMessage) }
      if (ace.nonEmpty && ace.length < 64) ace
      else throw new IllegalArgumentException("label too long")
    }
  }

  /** `urldefrag`: url without fragment. */
  def urldefrag(url: String): String = {
    val hash = url.indexOf('#')
    if (hash < 0) url
    else {
      val p = urlparse(url)
      urlunparse(p.copy(fragment = ""))
    }
  }

  private val usesRelative = Set("", "ftp", "http", "gopher", "nntp", "imap",
    "wais", "file", "https", "shttp", "mms", "prospero", "rtsp", "rtsps",
    "rtspu", "sftp", "svn", "svn+ssh", "ws", "wss")
  /** CPython 3.11 `uses_netloc` — also drives urlunsplit's re-rooting of
    * the path as `//…` even when netloc is empty ("ftp:z" → "ftp:///z"). */
  private val usesNetloc = Set("", "ftp", "http", "gopher", "nntp", "telnet",
    "imap", "wais", "file", "mms", "https", "shttp", "snews", "prospero",
    "rtsp", "rtsps", "rtspu", "rsync", "svn", "svn+ssh", "sftp", "nfs", "git",
    "git+ssh", "ws", "wss")

  /** CPython `urljoin`. */
  def urljoin(base: String, url: String): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base
    val b = urlparse(base)
    val u = urlparse(url, b.scheme)
    if (u.scheme != b.scheme || !usesRelative.contains(u.scheme)) return url
    var netloc = u.netloc
    if (usesNetloc.contains(u.scheme)) {
      if (u.netloc.nonEmpty)
        return urlunparse(Parts(u.scheme, u.netloc, u.path, u.params, u.query, u.fragment))
      netloc = b.netloc
    }
    if (u.path.isEmpty && u.params.isEmpty) {
      val query = if (u.query.isEmpty) b.query else u.query
      return urlunparse(Parts(u.scheme, netloc, b.path, b.params, query, u.fragment))
    }
    val baseParts = ArrayBuffer(splitKeepAll(b.path, '/'): _*)
    if (baseParts.nonEmpty && baseParts.last != "") baseParts.remove(baseParts.length - 1)
    val segments: ArrayBuffer[String] =
      if (u.path.startsWith("/")) ArrayBuffer(splitKeepAll(u.path, '/'): _*)
      else {
        val s = baseParts ++ splitKeepAll(u.path, '/')
        // segments[1:-1] = filter(None, segments[1:-1])
        if (s.length > 2) {
          val mid = s.slice(1, s.length - 1).filter(_.nonEmpty)
          val out = ArrayBuffer(s.head)
          out ++= mid
          out += s.last
          out
        } else s
      }
    val resolved = ArrayBuffer.empty[String]
    segments.foreach {
      case ".." => if (resolved.nonEmpty) resolved.remove(resolved.length - 1)
      case "."  =>
      case seg  => resolved += seg
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved += ""
    val joined = resolved.mkString("/")
    urlunparse(Parts(u.scheme, netloc, if (joined.isEmpty) "/" else joined,
      u.params, u.query, u.fragment))
  }

  /** Python str.split(sep) — keeps empty strings (unlike Java split). */
  def splitKeepAll(s: String, sep: Char): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  private val hex = "0123456789ABCDEF"

  /** Per-`safe` lookup tables, cached (quote runs per URL in the hot map). */
  private val safeTables =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Boolean]]()

  private def safeTable(safe: String): Array[Boolean] = {
    val cached = safeTables.get(safe)
    if (cached != null) return cached
    val t = new Array[Boolean](128)
    var c = 'a'; while (c <= 'z') { t(c) = true; c = (c + 1).toChar }
    c = 'A'; while (c <= 'Z') { t(c) = true; c = (c + 1).toChar }
    c = '0'; while (c <= '9') { t(c) = true; c = (c + 1).toChar }
    "_.-~".foreach(ch => t(ch) = true)
    safe.foreach(ch => if (ch < 128) t(ch) = true)
    safeTables.putIfAbsent(safe, t)
    t
  }

  /** CPython `quote(s, safe)`: UTF-8 %-encode outside always_safe+safe. */
  def quote(s: String, safe: String = "/"): String = {
    val t = safeTable(safe)
    // fast path: nothing to encode
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val ch = s.charAt(i)
      if (ch >= 128 || !t(ch)) clean = false else i += 1
    }
    if (clean) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length + 16)
    var j = 0
    while (j < bytes.length) {
      val b = bytes(j)
      if (b >= 0 && t(b)) sb.append(b.toChar)
      else sb.append('%').append(hex((b >> 4) & 0xf)).append(hex(b & 0xf))
      j += 1
    }
    sb.toString
  }

  /** CPython `quote_plus`. */
  def quotePlus(s: String): String = {
    if (s.indexOf(' ') >= 0) quote(s, " ").replace(' ', '+') else quote(s, "")
  }

  /** CPython `unquote` (utf-8, errors='replace'); '+' NOT converted. */
  def unquote(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    val buf = new java.io.ByteArrayOutputStream()
    def flush(): Unit = {
      if (buf.size() > 0) {
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        sb.append(dec.decode(java.nio.ByteBuffer.wrap(buf.toByteArray)).toString)
        buf.reset()
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && isHex(s, i + 1) && isHex(s, i + 2)) {
        buf.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        flush()
        sb.append(c)
        i += 1
      }
    }
    flush()
    sb.toString
  }

  private def isHex(s: String, i: Int): Boolean =
    i < s.length && {
      val c = s.charAt(i)
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    }

  /** CPython `unquote_plus`. */
  def unquotePlus(s: String): String = unquote(s.replace('+', ' '))

  /** CPython `parse_qsl` (3.10: '&' separator only). */
  def parseQsl(qs: String, keepBlankValues: Boolean = false): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    qs.split("&", -1).foreach { nv =>
      if (nv.nonEmpty) {
        val eq = nv.indexOf('=')
        if (eq < 0) {
          if (keepBlankValues) out += ((unquotePlus(nv), ""))
        } else {
          val v = nv.substring(eq + 1)
          if (v.nonEmpty || keepBlankValues)
            out += ((unquotePlus(nv.substring(0, eq)), unquotePlus(v)))
        }
      }
    }
    out.toSeq
  }

  /** CPython `parse_qs`: grouped dict, first-occurrence key order. */
  def parseQs(qs: String, keepBlankValues: Boolean = false): Seq[(String, Seq[String])] = {
    val order = ArrayBuffer.empty[String]
    val m = scala.collection.mutable.Map.empty[String, ArrayBuffer[String]]
    parseQsl(qs, keepBlankValues).foreach { case (k, v) =>
      m.get(k) match {
        case Some(buf) => buf += v
        case None      => order += k; m(k) = ArrayBuffer(v)
      }
    }
    order.map(k => (k, m(k).toSeq)).toSeq
  }

  /** CPython `urlencode` over pairs (no doseq). */
  def urlencode(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => quotePlus(k) + "=" + quotePlus(v) }.mkString("&")

  /** CPython `urlencode(..., doseq=True)` over grouped pairs. */
  def urlencodeSeq(grouped: Seq[(String, Seq[String])]): String =
    grouped.flatMap { case (k, vs) => vs.map(v => quotePlus(k) + "=" + quotePlus(v)) }
      .mkString("&")
}
