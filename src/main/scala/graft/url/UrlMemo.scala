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

  /** Two-level memo: outer key = the base's directory slice, inner key =
    * the reference. A page's links all share one base, so the outer hop
    * amortizes to a single reference compare via the (base eq lastBase)
    * one-entry cache — per link the memo costs ONE inner get on the bare
    * href (the old concatenated pair key allocated + hashed dir+href per
    * lookup; HashMap.getNode + String.hashCode were ~13% of spin samples). */
  private final class Maps {
    val join = new java.util.HashMap[String, java.util.HashMap[String, String]](256)
    val href = new java.util.HashMap[String, java.util.HashMap[String, String]](256)
    val norm = new java.util.HashMap[String, String](1024)
    var joinEntries = 0 // each map gets its own Max budget (like the old
    var hrefEntries = 0 // flat maps — a shared budget clears twice as often)
    var lastBase: String = null
    var lastDir: String = null

    def dirFor(base: String): String = {
      if (base eq lastBase) return lastDir
      val d = dirOf(base)
      lastBase = base
      lastDir = d
      d
    }

    def innerFor(outer: java.util.HashMap[String, java.util.HashMap[String, String]],
                 dir: String): java.util.HashMap[String, String] = {
      var in = outer.get(dir)
      if (in == null) {
        in = new java.util.HashMap[String, String](32)
        outer.put(dir, in)
      }
      in
    }

    def boundJoin(): Unit =
      if (joinEntries >= Max) { join.clear(); joinEntries = 0 }

    def boundHref(): Unit =
      if (hrefEntries >= Max) { href.clear(); hrefEntries = 0 }
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

  /** True when the reference may read more of the base than its directory.
    * These are exactly the routes into PyUrl.urljoin's full-base branch
    * (`u.path.isEmpty && u.params.isEmpty`, which keeps base path+params
    * +query): the reference — after an optional scheme prefix — is empty
    * or starts with '#'/'?'/';' (fragment-/query-/params-only), or is
    * "//" with an EMPTY netloc and empty path ("//", "//?q", "//#f").
    * A ';' start is over-conservative (";x" has params and resolves by
    * directory) but merely skips memoization for a rare class. */
  private[url] def needsFullBase(url: String): Boolean = {
    if (url.isEmpty) return true
    // optional scheme prefix (CPython urlparse: leading alpha then
    // alnum/+/-/. up to ':') — "http:" style refs resolve against the
    // base when schemes match, so the REST after ':' is what matters
    var rest = url
    val colon = url.indexOf(':')
    if (colon > 0 && Character.isLetter(url.charAt(0))) {
      var ok = true
      var j = 1
      while (ok && j < colon) {
        val c = url.charAt(j)
        ok = Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'
        j += 1
      }
      if (ok) rest = url.substring(colon + 1)
    }
    if (rest.isEmpty) return true
    val c0 = rest.charAt(0)
    if (c0 == '#' || c0 == '?' || c0 == ';') return true
    if (rest.length >= 2 && c0 == '/' && rest.charAt(1) == '/') {
      // "//" netloc runs to the next '/', '?', or '#'; an empty netloc
      // with an empty path falls back to the whole base
      if (rest.length == 2) return true
      val c2 = rest.charAt(2)
      if (c2 == '?' || c2 == '#') return true
    }
    false
  }

  def urljoin(base: String, url: String): String = {
    // exempt classes (empty/#/? refs read base path+query; schemeless
    // bases have no dir slice) compute directly — rare, and skipping the
    // memo keeps results byte-identical by construction
    if (needsFullBase(url)) return PyUrl.urljoin(base, url)
    val m = tl.get()
    val dir = m.dirFor(base)
    if (dir == null) return PyUrl.urljoin(base, url)
    val in = m.innerFor(m.join, dir)
    val hit = in.get(url)
    if (hit != null) return hit
    val v = PyUrl.urljoin(base, url)
    m.boundJoin()
    m.innerFor(m.join, dir).put(url, v) // re-resolve: bound may have cleared
    m.joinEntries += 1
    v
  }

  /** Memo slot for the cleaner's full `<a href>` transform (urljoin +
    * utm-param strip, Cleaner pass 3). `f` must be the pure transform of
    * exactly (base, href) — and, like the join it wraps, of no more of the
    * base than its directory for path-type hrefs. */
  def hrefAbs(base: String, href: String)(f: => String): String = {
    if (needsFullBase(href)) return f
    val m = tl.get()
    val dir = m.dirFor(base)
    if (dir == null) return f
    val in = m.innerFor(m.href, dir)
    val hit = in.get(href)
    if (hit != null) return hit
    val v = f
    m.boundHref()
    m.innerFor(m.href, dir).put(href, v)
    m.hrefEntries += 1
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
