package graft.url

import graft.html.PyStr
import scala.collection.mutable.ArrayBuffer

/**
 * Robots-exclusion evaluation, pinned against CPython 3.11's
 * `urllib.robotparser` (the stdlib the reference's Python ecosystem would
 * reach for; the reference itself crawls WITHOUT robots compliance —
 * no `robots` mention anywhere under /root/reference — so this is a
 * beyond-reference operator a production crawl pipeline needs before the
 * politeness schedule in [[graft.ops.Frontier]] may be executed).
 *
 * Faithfulness notes (all differentially fuzz-pinned by RobotsFuzzSpec
 * against the container's real `urllib.robotparser`):
 *  - the parse state machine (states 0/1/2), including: blank RAW lines
 *    (before comment stripping) drive entry flushes; comment-only lines do
 *    NOT; `Crawl-delay`/`Request-rate` set state=2 even when their value is
 *    rejected; `Sitemap` never changes state; a group whose last directive
 *    was `User-agent` (state 1) is DROPPED at EOF / blank line.
 *  - `'*' in useragents` routes a group to the DEFAULT entry slot (first
 *    default wins, later ones are silently dropped) — robotparser.py:74-80.
 *  - rule paths are normalized `quote(urlunparse(urlparse(path)))` and an
 *    empty `Disallow:` flips to an allow-all rule — robotparser.py:227-233.
 *  - agent matching lowercases the product token before the first '/' and
 *    uses SUBSTRING containment (`agent in useragent`), so an empty
 *    `User-agent:` value matches every agent — robotparser.py:251-262.
 *  - `can_fetch` match-path: `quote(urlunparse(('','',path,params,query,
 *    fragment)))` of the UNQUOTED url, `"/"` when empty; first matching
 *    rule line wins, prefix match via `startswith`, lone `"*"` matches all;
 *    no rule ⇒ allow — robotparser.py:160-177, 235-236, 264-270.
 *  - `Crawl-delay` value gate is Python `str.isdigit()` — which accepts
 *    Numeric_Type=Digit codepoints (superscripts, circled digits, ...)
 *    that `int()` then REFUSES: such a file CRASHES robotparser.parse with
 *    ValueError. Crash parity is kept (IllegalArgumentException), like the
 *    Myers crash parity elsewhere in this repo.
 *  - HTTP-status semantics of `RobotFileParser.read()`: 401/403 ⇒
 *    disallow-all, other 4xx ⇒ allow-all, else parse the body with
 *    UTF-8 `str.splitlines()` line splitting — robotparser.py:58-69.
 *
 * Deviation (documented): crawl-delay values are held in a Long; Python
 * ints are unbounded, so a >19-digit delay would crash here and parse
 * there. Real-world delays are single digits.
 */
object RobotsTxt {

  /** One `Allow:`/`Disallow:` line; `path` is already normalized+quoted. */
  final case class RuleLine(path: String, allowance: Boolean)

  /** A user-agent group (robotparser.py Entry). */
  final case class Entry(useragents: Vector[String], rulelines: Vector[RuleLine],
                         delay: Option[Long], reqRate: Option[(Long, Long)])

  /** Parsed robots state (RobotFileParser fields that drive decisions).
    * `parsed` models `last_checked != 0`: `read()` sets the flags WITHOUT
    * running parse, and a swallowed HTTPError >= 500 leaves the parser in
    * the never-read state where `can_fetch` is always False and
    * `crawl_delay`/`request_rate` are None (robotparser.py:155-159,
    * 179-183). */
  final case class Robots(entries: Vector[Entry], defaultEntry: Option[Entry],
                          sitemaps: Vector[String],
                          disallowAll: Boolean = false,
                          allowAll: Boolean = false,
                          parsed: Boolean = true)

  // ---------------------------------------------------------------- parse

  /** Python `str.splitlines()` terminator set (excluding the \r\n pair,
    * handled inline). */
  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u000b' || c == '\u000c' ||
      c == '\u001c' || c == '\u001d' || c == '\u001e' || c == '\u0085' ||
      c == '\u2028' || c == '\u2029'

  /** Python `str.splitlines()` — no trailing empty line, \r\n is one break. */
  def pySplitlines(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    var start = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isLineTerm(c)) {
        out += s.substring(start, i)
        i += (if (c == '\r' && i + 1 < n && s.charAt(i + 1) == '\n') 2 else 1)
        start = i
      } else i += 1
    }
    if (start < n) out += s.substring(start, n)
    out.result()
  }

  /** Codepoints where Python `str.isdigit()` is true but the category is
    * NOT Nd (Numeric_Type=Digit) — `int()` raises ValueError on every one
    * of these. Enumerated from the container's CPython 3.11 / Unicode 14. */
  private val IsdigitExtras: Set[Int] = Set(
    0xb2, 0xb3, 0xb9, 0x1369, 0x136a, 0x136b, 0x136c, 0x136d, 0x136e, 0x136f,
    0x1370, 0x1371, 0x19da, 0x2070, 0x2074, 0x2075, 0x2076, 0x2077, 0x2078,
    0x2079, 0x2080, 0x2081, 0x2082, 0x2083, 0x2084, 0x2085, 0x2086, 0x2087,
    0x2088, 0x2089, 0x2460, 0x2461, 0x2462, 0x2463, 0x2464, 0x2465, 0x2466,
    0x2467, 0x2468, 0x2474, 0x2475, 0x2476, 0x2477, 0x2478, 0x2479, 0x247a,
    0x247b, 0x247c, 0x2488, 0x2489, 0x248a, 0x248b, 0x248c, 0x248d, 0x248e,
    0x248f, 0x2490, 0x24ea, 0x24f5, 0x24f6, 0x24f7, 0x24f8, 0x24f9, 0x24fa,
    0x24fb, 0x24fc, 0x24fd, 0x24ff, 0x2776, 0x2777, 0x2778, 0x2779, 0x277a,
    0x277b, 0x277c, 0x277d, 0x277e, 0x2780, 0x2781, 0x2782, 0x2783, 0x2784,
    0x2785, 0x2786, 0x2787, 0x2788, 0x278a, 0x278b, 0x278c, 0x278d, 0x278e,
    0x278f, 0x2790, 0x2791, 0x2792, 0x10a40, 0x10a41, 0x10a42, 0x10a43,
    0x10e60, 0x10e61, 0x10e62, 0x10e63, 0x10e64, 0x10e65, 0x10e66, 0x10e67,
    0x10e68, 0x11052, 0x11053, 0x11054, 0x11055, 0x11056, 0x11057, 0x11058,
    0x11059, 0x1105a, 0x1f100, 0x1f101, 0x1f102, 0x1f103, 0x1f104, 0x1f105,
    0x1f106, 0x1f107, 0x1f108, 0x1f109, 0x1f10a)

  /** Python `str.isdigit()`: non-empty, every codepoint Nd or
    * Numeric_Type=Digit. */
  def pyIsDigit(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.getType(cp) != Character.DECIMAL_DIGIT_NUMBER &&
        !IsdigitExtras.contains(cp)) return false
      i += Character.charCount(cp)
    }
    true
  }

  /** Python `int(s)` on a string whose stripped form passed `isdigit()`:
    * strips python-whitespace edges, then every codepoint must be Nd (any
    * script — `int("٥") == 5`); Numeric_Type=Digit codepoints crash
    * exactly like CPython's ValueError. */
  def pyIntDigits(s: String): Long = {
    val t = PyStr.strip(s)
    var v = 0L
    var i = 0
    if (t.isEmpty) throw new IllegalArgumentException(s"int(): '$s'")
    while (i < t.length) {
      val cp = t.codePointAt(i)
      val d = Character.digit(cp, 10)
      if (d < 0 || Character.getType(cp) != Character.DECIMAL_DIGIT_NUMBER)
        throw new IllegalArgumentException(
          s"int(): non-decimal digit U+${cp.toHexString} in '$s'")
      v = Math.addExact(Math.multiplyExact(v, 10L), d.toLong)
      i += Character.charCount(cp)
    }
    v
  }

  private def pyLower(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** robotparser.py:227-233 — RuleLine.__init__. */
  private def mkRule(rawPath: String, allowRaw: Boolean): RuleLine = {
    val allow = if (rawPath.isEmpty && !allowRaw) true else allowRaw
    val normalized = PyUrl.urlunparse(PyUrl.urlparse(rawPath))
    RuleLine(PyUrl.quote(normalized), allow)
  }

  /** robotparser.py:82-146 — the parse state machine over pre-split lines. */
  def parseLines(lines: Seq[String]): Robots = {
    var state = 0
    var agents = Vector.empty[String]
    var rules = Vector.empty[RuleLine]
    var delay: Option[Long] = None
    var reqRate: Option[(Long, Long)] = None
    val entries = ArrayBuffer.empty[Entry]
    var default: Option[Entry] = None
    val sitemaps = Vector.newBuilder[String]

    def resetEntry(): Unit = {
      agents = Vector.empty; rules = Vector.empty; delay = None; reqRate = None
    }
    def addEntry(): Unit = {
      val e = Entry(agents, rules, delay, reqRate)
      if (agents.contains("*")) { if (default.isEmpty) default = Some(e) }
      else entries += e
      resetEntry()
    }

    for (raw <- lines) {
      if (raw.isEmpty) {
        if (state == 1) { resetEntry(); state = 0 }
        else if (state == 2) { addEntry(); state = 0 }
      }
      var line = raw
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      line = PyStr.strip(line)
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon >= 0) {
          val key = pyLower(PyStr.strip(line.substring(0, colon)))
          val value = PyUrl.unquote(PyStr.strip(line.substring(colon + 1)))
          key match {
            case "user-agent" =>
              if (state == 2) addEntry()
              agents :+= value
              state = 1
            case "disallow" =>
              if (state != 0) { rules :+= mkRule(value, allowRaw = false); state = 2 }
            case "allow" =>
              if (state != 0) { rules :+= mkRule(value, allowRaw = true); state = 2 }
            case "crawl-delay" =>
              if (state != 0) {
                if (pyIsDigit(PyStr.strip(value))) delay = Some(pyIntDigits(value))
                state = 2
              }
            case "request-rate" =>
              if (state != 0) {
                val parts = PyUrl.splitKeepAll(value, '/')
                if (parts.length == 2 && pyIsDigit(PyStr.strip(parts(0))) &&
                  pyIsDigit(PyStr.strip(parts(1))))
                  reqRate = Some((pyIntDigits(parts(0)), pyIntDigits(parts(1))))
                state = 2
              }
            case "sitemap" => sitemaps += value // state unchanged
            case _ => // unknown key: ignored, state unchanged
          }
        }
      }
    }
    if (state == 2) addEntry()
    Robots(entries.toVector, default, sitemaps.result())
  }

  /** Parse a robots.txt body (UTF-8 text) — `read()`'s
    * `parse(raw.decode("utf-8").splitlines())`. May THROW on
    * Crawl-delay/Request-rate crash-parity inputs. */
  def parse(body: String): Robots = parseLines(pySplitlines(body))

  /** `RobotFileParser.read()` HTTP-status semantics — robotparser.py:58-69.
    * `status = 401|403` ⇒ disallow-all; other 4xx (incl. a MISSING
    * robots.txt, 404) ⇒ allow-all; >= 500 raises HTTPError which read()
    * CATCHES and ignores — the parser stays never-read (deny everything,
    * no delays); 2xx parses the body. None of the error branches run
    * parse(), so `parsed` stays false on all of them. */
  def fromStatus(status: Int, body: String): Robots =
    if (status == 401 || status == 403)
      Robots(Vector.empty, None, Vector.empty, disallowAll = true, parsed = false)
    else if (status >= 400 && status < 500)
      Robots(Vector.empty, None, Vector.empty, allowAll = true, parsed = false)
    else if (status >= 500)
      Robots(Vector.empty, None, Vector.empty, parsed = false)
    else parse(body)

  // ------------------------------------------------------------- evaluate

  /** The normalized path `can_fetch` matches rule prefixes against —
    * robotparser.py:165-171. */
  def matchPath(url: String): String = {
    val p = PyUrl.urlparse(PyUrl.unquote(url))
    val bare = PyUrl.urlunparse(
      PyUrl.Parts("", "", p.path, p.params, p.query, p.fragment))
    val quoted = PyUrl.quote(bare)
    if (quoted.isEmpty) "/" else quoted
  }

  /** Entry.applies_to — robotparser.py:251-262. Substring containment on
    * the lowered product token; empty agent values match everything. */
  private def appliesTo(e: Entry, useragent: String): Boolean = {
    val base = pyLower(useragent.split("/", 2)(0))
    e.useragents.exists(a => a == "*" || base.contains(pyLower(a)))
  }

  /** Entry.allowance — first matching rule line wins; none ⇒ allow. */
  private def allowance(e: Entry, filename: String): Boolean =
    e.rulelines.find(r => r.path == "*" || filename.startsWith(r.path))
      .forall(_.allowance)

  /** The entry `can_fetch`/`crawl_delay` would consult for this agent:
    * first specific match in file order, else the default entry. */
  def selectEntry(r: Robots, useragent: String): Option[Entry] =
    r.entries.find(appliesTo(_, useragent)).orElse(r.defaultEntry)

  /** RobotFileParser.can_fetch — robotparser.py:148-177. Flag checks come
    * BEFORE the never-read check, in Python's order. */
  def canFetch(r: Robots, useragent: String, url: String): Boolean =
    if (r.disallowAll) false
    else if (r.allowAll) true
    else if (!r.parsed) false
    else selectEntry(r, useragent) match {
      case Some(e) => allowance(e, matchPath(url))
      case None => true
    }

  /** RobotFileParser.crawl_delay — the FIRST applicable entry's delay,
    * even when that entry has none (Python returns its None). */
  def crawlDelay(r: Robots, useragent: String): Option[Long] =
    if (!r.parsed) None else selectEntry(r, useragent).flatMap(_.delay)

  /** RobotFileParser.request_rate. */
  def requestRate(r: Robots, useragent: String): Option[(Long, Long)] =
    if (!r.parsed) None else selectEntry(r, useragent).flatMap(_.reqRate)

  /** RobotFileParser.site_maps — None when empty. */
  def siteMaps(r: Robots): Option[Vector[String]] =
    if (r.sitemaps.isEmpty) None else Some(r.sitemaps)

  // --------------------------------------------------------------- render

  /** `str(RobotFileParser)` — entries then the default, double-newline
    * joined; pins the parsed STRUCTURE byte-for-byte in the fuzz gate. */
  def render(r: Robots): String = {
    def one(e: Entry): String = {
      val b = Vector.newBuilder[String]
      e.useragents.foreach(a => b += s"User-agent: $a")
      e.delay.foreach(d => b += s"Crawl-delay: $d")
      e.reqRate.foreach { case (rq, s) => b += s"Request-rate: $rq/$s" }
      e.rulelines.foreach(l =>
        b += (if (l.allowance) "Allow" else "Disallow") + ": " + l.path)
      b.result().mkString("\n")
    }
    (r.entries ++ r.defaultEntry).map(one).mkString("\n\n")
  }
}
