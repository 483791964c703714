package graft.html

/**
 * Region-interned lookup of common tag / attribute names: the tokenizer
 * allocated `substring` + `toLowerCase` for EVERY tag and attribute name;
 * for the ~160 names that cover virtually all real-world HTML this
 * resolves the region against a static open-addressed table with zero
 * allocation. Misses (unknown or non-ASCII names) fall back to the exact
 * old path, so behavior is unchanged: a hit is returned only when the
 * ASCII-lowercased region equals the interned name char-for-char (full
 * Unicode lowercasing oddities like the Kelvin sign never match and fall
 * through to String.toLowerCase).
 */
private[html] object Interned {

  private val names: Array[String] = Array(
    // tags
    "a", "abbr", "address", "area", "article", "aside", "audio", "b",
    "base", "bdi", "bdo", "blockquote", "body", "br", "button", "canvas",
    "caption", "cite", "code", "col", "colgroup", "data", "datalist",
    "dd", "del", "details", "dfn", "dialog", "div", "dl", "dt", "em",
    "embed", "fieldset", "figcaption", "figure", "footer", "form", "h1",
    "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup", "hr",
    "html", "i", "iframe", "img", "input", "ins", "kbd", "label",
    "legend", "li", "link", "main", "map", "mark", "menu", "meta",
    "meter", "nav", "noscript", "object", "ol", "optgroup", "option",
    "output", "p", "param", "picture", "pre", "progress", "q", "rp",
    "rt", "ruby", "s", "samp", "script", "section", "select", "slot",
    "small", "source", "span", "strong", "style", "sub", "summary",
    "sup", "svg", "table", "tbody", "td", "template", "textarea",
    "tfoot", "th", "thead", "time", "title", "tr", "track", "u", "ul",
    "var", "video", "wbr", "path", "circle", "rect", "line", "polygon",
    "polyline", "ellipse", "g", "use", "defs", "text", "tspan", "center",
    "font", "big", "strike", "tt", "frame", "frameset", "noframes",
    "loc", "url", "urlset", "sitemap", "sitemapindex", "lastmod",
    "changefreq", "priority",
    // attribute names
    "href", "src", "class", "id", "style", "rel", "type", "alt", "name",
    "content", "width", "height", "value", "lang", "dir",
    "target", "charset", "property", "itemprop", "datetime", "role",
    "placeholder", "action", "method", "border", "align", "color",
    "size", "face", "colspan", "rowspan", "srcset", "sizes", "media",
    "async", "defer", "integrity", "crossorigin", "loading", "onclick",
    "data-src", "aria-label", "aria-hidden", "xmlns", "viewbox", "d",
    "fill", "stroke", "cx", "cy", "r", "x", "y", "x1", "y1", "x2", "y2",
    "points", "transform").distinct

  @inline private def low(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def hash(raw: CharSequence, a: Int, b: Int): Int = {
    var h = 0
    var i = a
    while (i < b) { h = h * 31 + low(raw.charAt(i)); i += 1 }
    h
  }

  private val mask = 1023
  private val tbl = new Array[String](mask + 1)
  names.foreach { nm =>
    var idx = hash(nm, 0, nm.length) & mask
    while (tbl(idx) != null) idx = (idx + 1) & mask
    tbl(idx) = nm
  }

  /** Interned lowercase name for the region iff its ASCII-lowercase form
    * matches a known name; null otherwise (caller falls back). */
  def lookupLower(raw: String, a: Int, b: Int): String = {
    val len = b - a
    if (len <= 0 || len > 16) return null
    var idx = hash(raw, a, b) & mask
    while (true) {
      val cand = tbl(idx)
      if (cand == null) return null
      if (cand.length == len) {
        var i = 0
        while (i < len && cand.charAt(i) == low(raw.charAt(a + i))) i += 1
        if (i == len) return cand
      }
      idx = (idx + 1) & mask
    }
    null // unreachable
  }

  /** Exact (case-sensitive) variant for xmlMode. */
  def lookupExact(raw: String, a: Int, b: Int): String = {
    val len = b - a
    if (len <= 0 || len > 16) return null
    var idx = hash(raw, a, b) & mask
    while (true) {
      val cand = tbl(idx)
      if (cand == null) return null
      if (cand.length == len) {
        var i = 0
        while (i < len && cand.charAt(i) == raw.charAt(a + i)) i += 1
        if (i == len) return cand
      }
      idx = (idx + 1) & mask
    }
    null // unreachable
  }
}
