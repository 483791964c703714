package graft.url

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.GoldenJson

class UrlSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("normalize_query_params matches CPython golden corpus") {
    GoldenJson.load("normalize_query_params.json").foreach { c =>
      val in = c.get("input").asText
      assert(UrlNormalizer.normalizeQueryParams(in) == c.get("expected").asText,
        s"input=$in")
    }
  }

  test("get_doc_name_from_url: substring manifest match, netloc fallback") {
    val sources = Seq("spark-docs" -> "https://spark.apache.org/docs",
      "duck" -> "duckdb.org")
    assert(UrlNormalizer.docNameFromUrl(
      "https://spark.apache.org/docs/latest/sql.html", sources) == "spark-docs")
    assert(UrlNormalizer.docNameFromUrl(
      "https://duckdb.org/docs/sql/functions.html", sources) == "duck")
    assert(UrlNormalizer.docNameFromUrl(
      "https://other.example.com/x.html", sources) == "other.example.com")
  }

  test("normalize_url matches CPython golden corpus (F13)") {
    GoldenJson.load("normalize_url.json").foreach { c =>
      val in = c.get("input").asText
      val expected = c.get("expected").asText
      assert(UrlNormalizer.normalize(in) == expected, s"input=$in")
    }
  }

  test("is_session_id matches CPython golden corpus") {
    GoldenJson.load("session_id.json").foreach { c =>
      assert(UrlNormalizer.isSessionId(c.get("param").asText) == c.get("expected").asBoolean,
        s"param=${c.get("param").asText}")
    }
  }

  test("urljoin matches CPython golden corpus") {
    GoldenJson.load("urljoin.json").foreach { c =>
      val got = PyUrl.urljoin(c.get("base").asText, c.get("url").asText)
      assert(got == c.get("expected").asText,
        s"base=${c.get("base").asText} url=${c.get("url").asText}")
    }
  }

  test("normalize_url second application matches CPython (idempotent except pinned www2/port quirk)") {
    GoldenJson.load("normalize_url.json").foreach { c =>
      val once = c.get("expected").asText
      assert(UrlNormalizer.normalize(once) == c.get("expected2").asText,
        s"second application diverges: $once")
    }
  }

  test("quote/unquote round-trip on safe alphabet") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '/', '?', '&', '=', '%', 'é', '中')))
      .map(_.mkString)
    check(Prop.forAll(gen) { s => PyUrl.unquote(PyUrl.quote(s, safe = "")) == s })
  }

  test("parse_qsl drops blank values unless kept") {
    assert(PyUrl.parseQsl("a=1&b=&c&d=2") == Seq(("a", "1"), ("d", "2")))
    assert(PyUrl.parseQsl("a=1&b=&c&d=2", keepBlankValues = true) ==
      Seq(("a", "1"), ("b", ""), ("c", ""), ("d", "2")))
  }

  test("port matches CPython SplitResult.port (pinned against this container's CPython)") {
    assert(PyUrl.urlparse("http://h/x").port.isEmpty)
    assert(PyUrl.urlparse("http://h:/x").port.isEmpty)       // empty port → None
    assert(PyUrl.urlparse("http://h:80/x").port.contains(80))
    assert(PyUrl.urlparse("http://h:00080/x").port.contains(80))
    assert(PyUrl.urlparse("http://h:65535/x").port.contains(65535))
    assert(PyUrl.urlparse("http://u@h:8080/x").port.contains(8080))
    // ValueError analogs: non-ASCII-digit or out-of-range ports RAISE
    intercept[IllegalArgumentException](PyUrl.urlparse("http://h:abc/x").port)
    intercept[IllegalArgumentException](PyUrl.urlparse("http://h:123abc/x").port)
    intercept[IllegalArgumentException](PyUrl.urlparse("http://h: 80/x").port)
    intercept[IllegalArgumentException](PyUrl.urlparse("http://h:99999/x").port)
    intercept[IllegalArgumentException](PyUrl.urlparse("http://h:99999999999/x").port)
    // and normalize propagates it (reference normalize_url re-raises as
    // ParsingError; callers catch at page level)
    intercept[Exception](UrlNormalizer.normalize("http://h:99999/x"))
  }

  test("urlparse params split on last segment only") {
    val p = PyUrl.urlparse("https://h/a;x/b;p?q=1#f")
    assert(p.path == "/a;x/b" && p.params == "p" && p.query == "q=1" && p.fragment == "f")
  }
}
