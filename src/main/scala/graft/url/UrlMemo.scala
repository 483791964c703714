package graft.url

/**
 * Per-thread memo over the pure URL functions on the per-link hot path
 * (VERDICT r02 next #3). `PyUrl.urljoin` + `UrlNormalizer.normalize` and
 * the cleaner's href transform are ~25% of per-doc extraction cost; web
 * corpora repeat link TARGETS heavily across pages of a host even though
 * every page url is unique — so join results are keyed by the base's
 * DIRECTORY, the only slice of the base a path-type reference depends on
 * (RFC 3986 §5.3 / CPython urljoin: scheme + netloc + path-up-to-last-'/';
 * base query matters only to ""/"#"/"?" references and base fragment
 * never) — UrlMemoSpec pins this dependence property against PyUrl over
 * randomized bases. References in the exempt classes (empty, fragment-,
 * query-only) and schemeless bases fall back to the full base as key, so
 * results stay byte-identical BY CONSTRUCTION for every input class.
 *
 * Thread-local (mapPartitions runs one partition per task thread —
 * contention-free) and bounded: maps are flushed wholesale at `Max`
 * entries (cheaper than LRU bookkeeping; ≈4 MB/thread worst case).
 * Exceptions are not cached — a throwing input re-throws each time.
 */
object UrlMemo {

  private val Max = 16384

  private final class Maps {
    val join = new java.util.HashMap[String, String](1024)
    val norm = new java.util.HashMap[String, String](1024)
    val href = new java.util.HashMap[String, String](1024)
  }

  private val tl: ThreadLocal[Maps] = ThreadLocal.withInitial(() => new Maps)

  /** The base-directory slice a path-type reference's join depends on:
    * scheme://netloc + path up to (and including) the last '/', query and
    * fragment dropped. Returns null when the base must be used whole
    * (schemeless — conservative fallback). */
  private[url] def dirOf(base: String): String = {
    val ss = base.indexOf("://")
    if (ss < 0) return null
    val afterScheme = ss + 3
    val pathStart = {
      val p = base.indexOf('/', afterScheme)
      if (p < 0) base.length else p
    }
    var end = base.length
    val q = base.indexOf('?', pathStart)
    if (q >= 0) end = q
    val f = base.indexOf('#', pathStart)
    if (f >= 0 && f < end) end = f
    var last = -1
    var i = pathStart
    while (i < end) {
      if (base.charAt(i) == '/') last = i
      i += 1
    }
    if (last < 0) base.substring(0, end) else base.substring(0, last + 1)
  }

  /** True when the reference may read more of the base than its directory
    * (empty / fragment-only / query-only references keep base path+query). */
  private def needsFullBase(url: String): Boolean =
    url.isEmpty || url.charAt(0) == '#' || url.charAt(0) == '?'

  /** Length-prefixed pair key — unambiguous for ANY contents. */
  private def pairKey(a: String, b: String): String =
    new java.lang.StringBuilder(a.length + b.length + 12)
      .append(a.length).append(':').append(a).append(b).toString

  private def joinKey(base: String, url: String): String = {
    if (needsFullBase(url)) return pairKey(base, url)
    val dir = dirOf(base)
    if (dir == null) pairKey(base, url) else pairKey(dir, url)
  }

  def urljoin(base: String, url: String): String = {
    val m = tl.get().join
    val k = joinKey(base, url)
    val hit = m.get(k)
    if (hit != null) return hit
    val v = PyUrl.urljoin(base, url)
    if (m.size >= Max) m.clear()
    m.put(k, v)
    v
  }

  /** Memo slot for the cleaner's full `<a href>` transform (urljoin +
    * utm-param strip, Cleaner pass 3). `f` must be the pure transform of
    * exactly (base, href) — and, like the join it wraps, of no more of the
    * base than its directory for path-type hrefs. */
  def hrefAbs(base: String, href: String)(f: => String): String = {
    val m = tl.get().href
    val k = joinKey(base, href)
    val hit = m.get(k)
    if (hit != null) return hit
    val v = f
    if (m.size >= Max) m.clear()
    m.put(k, v)
    v
  }

  def normalize(u: String): String = {
    val m = tl.get().norm
    val hit = m.get(u)
    if (hit != null) return hit
    val v = UrlNormalizer.normalize(u)
    if (m.size >= Max) m.clear()
    m.put(u, v)
    v
  }
}
