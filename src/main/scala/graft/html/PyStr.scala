package graft.html

/**
 * Python `str` whitespace semantics (`str.isspace` / no-arg `str.strip()`),
 * shared by the cleaner passes and the DOM text accessors so every
 * "stripped text" probe agrees byte-for-byte with the reference's bs4
 * `get_text(strip=True)` (/root/reference/core/scraper.py:187-196).
 *
 * Java's `String.trim` strips only chars <= U+0020 and `\s` (even with
 * UNICODE_CHARACTER_CLASS) omits FS/GS/RS/US (U+001C-U+001F); Python's set
 * is: ASCII ws, VT, 1C-1F, NEL (U+0085), every SPACE_SEPARATOR (NBSP,
 * OGHAM, EN QUAD..HAIR SPACE, NNBSP, MMSP, IDEOGRAPHIC SPACE), LS, PS.
 */
object PyStr {

  // ASCII table: the normalize/strip scanners test every text char, so
  // one load beats the 5-compare branch tree (exhaustively pinned by the
  // py_isspace_bmp golden like the branches it replaces)
  private[this] val asciiWs: Array[Boolean] = {
    val a = new Array[Boolean](0x80)
    var c = 0
    while (c < 0x80) {
      a(c) = (c >= 0x09 && c <= 0x0d) || c == 0x20 || (c >= 0x1c && c <= 0x1f)
      c += 1
    }
    a
  }

  def isPyWs(c: Char): Boolean =
    if (c < 0x80) asciiWs(c)
    else if (c == 0x85 || c == 0xA0) true
    else if (c < 0x1680) false // no SPACE_SEPARATOR below OGHAM except NBSP
    else Character.getType(c) == Character.SPACE_SEPARATOR ||
      c == 0x2028 || c == 0x2029

  /** Python no-arg `str.strip()`. */
  def strip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPyWs(s.charAt(a))) a += 1
    while (b > a && isPyWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Python `re.findall(r'\S+', s)` — unicode-whitespace tokenization
    * (bs4's multi-valued-attribute split; Java's `\\s` misses NBSP etc.). */
  def splitWs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPyWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isPyWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.result()
  }

  /** True iff `strip(s).isEmpty` — no allocation. */
  def isBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!isPyWs(s.charAt(i))) return false
      i += 1
    }
    true
  }
}
