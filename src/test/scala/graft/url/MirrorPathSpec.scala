package graft.url

import org.scalatest.funsuite.AnyFunSuite

/** Filesystem-mirror path semantics (core/scraper.py:236-239,481-497),
  * golden-pinned against CPython's own urlparse + os.path over the same
  * inline logic (scripts/gen_mirror_paths.py → mirror_paths.json). */
class MirrorPathSpec extends AnyFunSuite {

  test("golden: save path + raw read-back tail match CPython for every probe") {
    val rows = graft.GoldenJson.load("mirror_paths.json")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.get("url").asText()
      val ct = r.get("ct").asText()
      assert(MirrorPath.relativePath(url, ct) == r.get("rel").asText(),
        s"rel mismatch for ($url, $ct)")
      assert(MirrorPath.contentFilepath("", "", "", url) ==
        MirrorPath.posixJoin("", "docs", "", "", r.get("raw").asText()),
        s"raw mismatch for $url")
    }
  }

  test("directory-like urls default to index.html; extension fix-up by content type") {
    assert(MirrorPath.relativePath("https://e.com/guide/", "text/html") == "guide/index.html")
    assert(MirrorPath.relativePath("https://e.com/guide/intro", "text/html") == "guide/intro.html")
    assert(MirrorPath.relativePath("https://e.com/guide/intro", "application/pdf") == "guide/intro.txt")
    // XML payloads get .txt unless the url path already ends .xml (the
    // reference's fix-up only special-cases text/html)
    assert(MirrorPath.relativePath("https://e.com/feed", "application/xml") == "feed.txt")
    assert(MirrorPath.relativePath("https://e.com/feed.xml", "application/xml") == "feed.xml")
  }

  test("query/fragment/;params never reach the path (collision semantics)") {
    val base = MirrorPath.relativePath("https://e.com/p.html", "text/html")
    assert(MirrorPath.relativePath("https://e.com/p.html?a=1&b=2", "text/html") == base)
    assert(MirrorPath.relativePath("https://e.com/p.html#frag", "text/html") == base)
    assert(MirrorPath.relativePath("https://e.com/p.html;v=2", "text/html") == base)
  }

  test("savePath and contentFilepath assemble the docs/<name>/<version> tree") {
    assert(MirrorPath.savePath("/out", "site", "v3",
      "https://e.com/a/b.html", "text/html") == "/out/docs/site/v3/a/b.html")
    assert(MirrorPath.contentFilepath("/out", "site", "v3",
      "https://e.com/a/") == "/out/docs/site/v3/a/")
    // read-back path has NO index.html default — faithful asymmetry
    assert(MirrorPath.contentFilepath("/out", "site", "v3",
      "https://e.com/a/") !=
      MirrorPath.savePath("/out", "site", "v3", "https://e.com/a/", "text/html"))
  }

  test("posix helpers match posixpath on slash runs") {
    assert(MirrorPath.posixDirname("a//b") == "a")
    assert(MirrorPath.posixDirname("a/b/") == "a/b")
    assert(MirrorPath.posixDirname("b") == "")
    assert(MirrorPath.posixBasename("a//b") == "b")
    assert(MirrorPath.posixJoin("a/", "b") == "a/b")
    assert(MirrorPath.posixJoin("a", "", "b") == "a/b")
    assert(MirrorPath.posixJoin("a", "/abs", "c") == "/abs/c")
    assert(MirrorPath.posixJoin("x", "") == "x/")
  }
}
