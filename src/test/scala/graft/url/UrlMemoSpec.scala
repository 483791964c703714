package graft.url

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** UrlMemo's dir-key assumption, pinned against PyUrl itself: for every
  * reference class the memo dir-keys, two bases sharing (scheme, netloc,
  * path-directory) MUST join identically — regardless of final path
  * segment, query, or fragment. Plus byte-equality memo==direct over
  * randomized inputs (incl. the exempt ""/"#"/"?" classes). */
class UrlMemoSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private val hostG = Gen.oneOf("h.com", "a.example.org", "x", "h.com:8080")
  // dirs always start with '/': an empty dir would glue the file segment
  // onto the netloc, silently generating bases with DIFFERENT authorities
  // (no-path bases are covered by dirOf's full-base fallback, unit-tested)
  private val dirG = Gen.oneOf("/", "/docs/", "/a/b;p/", "/a%20b/")
  private val fileG = Gen.oneOf("", "page.html", "x;params", "a.b.c")
  private val queryG = Gen.oneOf("", "?q=1", "?a=b&c=%20d")
  private val fragG = Gen.oneOf("", "#top", "#a/b?c")
  private val schemeG = Gen.oneOf("https", "http", "ftp")
  private val hrefG = Gen.oneOf(
    "page2.html", "./x", "../up.html", "/root.html", "sub/dir/f.txt",
    "//other.com/y", "https://abs.com/z?k=v#f", "g:h", ".", "..",
    "x.html?only=q", "y.html#only-frag", "a b.html", "%7Euser/",
    "", "#frag", "?q=2", "page.html?utm_source=x&b=2",
    // full-base classes (resolve to the WHOLE base incl. its last path
    // segment/query — must be exempt from dir-keyed memoization)
    ";", ";x", ";#f", "//", "//?q", "//#f", "http:", "https:", "https:?q",
    "http:;", "ftp:", "//;nl")

  private val tailG = Gen.zip(fileG, queryG, fragG)

  test("dir-key dependence: same (scheme,netloc,dir) => same join, for dir-keyed href classes") {
    check(Prop.forAll(schemeG, hostG, dirG, tailG, tailG, hrefG) {
      (sch, host, dir, t1, t2, href) =>
      val b1 = s"$sch://$host$dir${t1._1}${t1._2}${t1._3}"
      val b2 = s"$sch://$host$dir${t2._1}${t2._2}${t2._3}"
      // exempt classes use the full base as key — nothing to prove there
      val exempt = UrlMemo.needsFullBase(href)
      exempt || {
        val j1 = try PyUrl.urljoin(b1, href) catch { case e: Exception => "E:" + e.getClass }
        val j2 = try PyUrl.urljoin(b2, href) catch { case e: Exception => "E:" + e.getClass }
        j1 == j2
      }
    })
  }

  test("memo == direct, byte-for-byte, over all href classes") {
    check(Prop.forAll(schemeG, hostG, dirG, fileG, queryG, fragG, hrefG) {
      (sch, host, dir, f, q, fr, href) =>
        val base = s"$sch://$host$dir$f$q$fr"
        val direct = try PyUrl.urljoin(base, href) catch { case _: Exception => null }
        val memod = try UrlMemo.urljoin(base, href) catch { case _: Exception => null }
        direct == memod
    })
  }

  test("normalize memo == direct") {
    check(Prop.forAll(schemeG, hostG, dirG, fileG, queryG, fragG) {
      (sch, host, dir, f, q, fr) =>
        val u = s"$sch://$host$dir$f$q$fr"
        val direct = try UrlNormalizer.normalize(u) catch { case _: Exception => null }
        val memod = try UrlMemo.normalize(u) catch { case _: Exception => null }
        direct == memod
    })
  }

  test("full-base refs are never dir-memoized across sibling pages (cache-poisoning regression)") {
    // page A and page B share a directory; the ref resolves to the WHOLE
    // base — a dir-keyed cache entry from A would poison B's result
    val pairs = Seq(
      ("https://h.com/docs/a.html?x=1", "https://h.com/docs/b.html"),
      ("https://h.com/d/p1.html#f", "https://h.com/d/p2.html?q=2"))
    val refs = Seq(";", "//", "//?q", "//#f", "http:", "https:", ";#f", "https:?q")
    for ((b1, b2) <- pairs; r <- refs) {
      assert(UrlMemo.needsFullBase(r), s"ref $r must be exempt")
      val m1 = UrlMemo.urljoin(b1, r) // would seed a poisoned entry if memoized
      val m2 = UrlMemo.urljoin(b2, r)
      assert(m1 == PyUrl.urljoin(b1, r), s"($b1, $r)")
      assert(m2 == PyUrl.urljoin(b2, r), s"($b2, $r)")
    }
    // path-type refs with a scheme prefix stay memoizable
    assert(!UrlMemo.needsFullBase("http:x.html"))
    assert(!UrlMemo.needsFullBase("//other.com/y"))
    assert(!UrlMemo.needsFullBase("page.html"))
  }

  test("dirOf edge shapes") {
    assert(UrlMemo.dirOf("https://h/docs/page.html") == "https://h/docs/")
    assert(UrlMemo.dirOf("https://h/docs/page.html?q=1#f") == "https://h/docs/")
    assert(UrlMemo.dirOf("https://h") == "https://h")
    // '?' before any path slash: conservative full-base key (safe — extra
    // key detail only splits cache entries, never merges distinct bases)
    assert(UrlMemo.dirOf("https://h?q=1") == "https://h?q=1")
    assert(UrlMemo.dirOf("https://h/") == "https://h/")
    assert(UrlMemo.dirOf("relative/no/scheme") == null)
  }
}
