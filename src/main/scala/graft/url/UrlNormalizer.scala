package graft.url

import scala.collection.mutable.ArrayBuffer

/**
 * Port of the reference's `normalize_url`
 * (/root/reference/processing/utils.py:14-87) and `is_session_id`
 * (/root/reference/processing/utils.py:101-112). Pure, deterministic,
 * UDF-free — invoked from typed `Dataset.map` / `mapPartitions` only.
 *
 * Quirks pinned deliberately (byte contract):
 *  - protocol-relative `//…` becomes `http://…`;
 *  - shortener expansion is identity (network-era; fixtures never use them);
 *  - `www.`-fix uses Python's global `str.replace` semantics
 *    (`'www.' + netloc.replace('www.','')`);
 *  - default-port strip REPLACES netloc with `parsed.hostname`, silently
 *    discarding the www/IDNA fixes — reference order is replicated as-is;
 *  - dot-segment resolution can pop the leading empty segment
 *    (`/..` → path "" → "/");
 *  - `//+` collapsed in the path; trailing-slash policy keyed off
 *    `os.path.splitext` extension presence;
 *  - path is unquoted then requoted with `safe='/:@&=+$,'`;
 *  - query: `parse_qsl` (blank values dropped), session-id and empty-value
 *    params dropped, remaining `(k,v)` pairs sorted, re-encoded with
 *    `quote_plus`; fragment dropped.
 */
object UrlNormalizer {

  private val sessionIdPatterns: Seq[java.util.regex.Pattern] = Seq(
    "^(session|sid)$", ".*sessionid.*", "^(s|sess)$", ".*phpsessid.*",
    ".*jsessionid.*", ".*aspsessionid.*", ".*cfid.*", ".*cftoken.*"
  ).map(p => java.util.regex.Pattern.compile(p, java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE))

  /** Python `re.match` (anchored at start only) with IGNORECASE. */
  def isSessionId(param: String): Boolean =
    sessionIdPatterns.exists(p => p.matcher(param).lookingAt())

  // netloc IDNA encoding is PyUrl.encodeIdna — the stdlib-codec emulation
  // whose failures THROW (the reference's `except idna.IDNAError` can never
  // catch the codec's UnicodeError, so they surface as ParsingError there;
  // pinned by the error rows of normalize_url_fuzz.json).

  /** os.path.splitext extension ("" when none). */
  private def splitextExt(path: String): String = {
    val slash = path.lastIndexOf('/')
    val base = path.substring(slash + 1)
    val dot = base.lastIndexOf('.')
    // ext only if some non-dot char precedes the last dot (os.path.splitext)
    if (dot <= 0 || !base.substring(0, dot).exists(_ != '.')) "" else base.substring(dot)
  }

  def normalize(url0: String): String = {
    var url = url0
    if (url.startsWith("//")) url = "http:" + url
    // expand_shortened_url: network-era; identity here (utils.py:89-99)
    url = PyUrl.urldefrag(url)
    val parsed = PyUrl.urlparse(url)

    val scheme = parsed.scheme.toLowerCase(java.util.Locale.ROOT)
    var netloc = parsed.netloc.toLowerCase(java.util.Locale.ROOT)
    netloc = PyUrl.encodeIdna(netloc)

    if (netloc.startsWith("www."))
      netloc = "www." + netloc.replace("www.", "")
    else if (netloc.startsWith("www1.") || netloc.startsWith("www2."))
      netloc = "www." + netloc.substring(5)

    // Python short-circuits `scheme == 'http' and parsed.port == 80`:
    // `.port` (which RAISES on malformed ports) is only evaluated for
    // http/https — "ftp://h:bad/" normalizes fine (fuzz-pinned)
    if ((scheme == "http" && parsed.port.contains(80)) ||
        (scheme == "https" && parsed.port.contains(443)))
      netloc = parsed.hostname

    var path = parsed.path
    // dot-segment resolution over raw '/'-split (utils.py:44-54)
    val resolved = ArrayBuffer.empty[String]
    PyUrl.splitKeepAll(path, '/').foreach {
      case "."  =>
      case ".." => if (resolved.nonEmpty) resolved.remove(resolved.length - 1)
      case seg  => resolved += seg
    }
    path = resolved.mkString("/")
    path = path.replaceAll("//+", "/")

    if (path.nonEmpty) {
      val ext = splitextExt(path)
      path =
        if (ext.isEmpty) stripTrailing(path, '/') + "/"
        else stripTrailing(path, '/')
    } else path = "/"

    path = PyUrl.unquote(path)
    path = PyUrl.quote(path, safe = "/:@&=+$,")

    var query = parsed.query
    if (query.nonEmpty) {
      val params = PyUrl.parseQsl(query)
        .filter { case (k, v) => v.nonEmpty && !isSessionId(k) }
        .sorted
      query = PyUrl.urlencode(params)
    }

    PyUrl.urlunparse(PyUrl.Parts(scheme, netloc, path, parsed.params, query, ""))
  }

  /** Python str.rstrip('/'). */
  private def stripTrailing(s: String, c: Char): String = {
    var end = s.length
    while (end > 0 && s.charAt(end - 1) == c) end -= 1
    s.substring(0, end)
  }

  /** `normalize_query_params` (/root/reference/core/scraper.py:522-532):
    * parse_qsl → drop empty values → sort (key, value) tuples → urlencode;
    * fragment and params KEPT (unlike normalize_url). */
  def normalizeQueryParams(url: String): String = {
    val parsed = PyUrl.urlparse(url)
    val params = PyUrl.parseQsl(parsed.query).filter(_._2.nonEmpty).sorted
    PyUrl.urlunparse(parsed.copy(query = PyUrl.urlencode(params)))
  }

  /** `get_doc_name_from_url` (/root/reference/core/scraper.py:287-288):
    * first manifest source whose url is a SUBSTRING of the page url
    * (`source['url'] in url` — substring, not prefix); netloc fallback. */
  def docNameFromUrl(url: String, sources: Seq[(String, String)]): String =
    sources.collectFirst { case (name, srcUrl) if url.contains(srcUrl) => name }
      .getOrElse(PyUrl.urlparse(url).netloc)

  /** `is_valid_link` relational core (/root/reference/core/scraper.py:379-392):
    * scheme ∈ {http,https} ∧ host == baseDomain ∧ path startswith startPath.
    * Canonical-hop recursion is resolved relationally upstream (SURVEY §2.4). */
  def isValidLink(normalizedUrl: String, baseDomain: String, startPath: String): Boolean = {
    val p = PyUrl.urlparse(normalizedUrl)
    (p.scheme == "http" || p.scheme == "https") &&
      p.netloc == baseDomain && p.path.startsWith(startPath)
  }
}
