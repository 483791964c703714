package graft.url

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * Fuzz differentials against the REFERENCE's own normalize_url (executed
 * under CPython with offline stubs — scripts/gen_url_fuzz.py), stdlib
 * urljoin, and the per-href utm-strip transform (core/scraper.py:209-220).
 * Error rows pin the reference's exception behavior (ParsingError — e.g.
 * stdlib-idna label failures, non-integer ports): the Scala side must
 * throw on exactly those inputs.
 */
class UrlFuzzSpec extends AnyFunSuite {

  private def show(s: String): String =
    s.flatMap { c => if (c >= ' ' && c < 0x7f) c.toString else f"\\u${c.toInt}%04x" }

  test("normalize_url fuzz parity (incl. idempotence + error rows)") {
    var nErr = 0
    graft.GoldenJson.load("normalize_url_fuzz.json").foreach { c =>
      val in = c.get("input").asText()
      if (c.has("error")) {
        nErr += 1
        assert(util.Try(UrlNormalizer.normalize(in)).isFailure,
          s"expected throw for input=${show(in)} got=${util.Try(UrlNormalizer.normalize(in))}")
      } else {
        val got = UrlNormalizer.normalize(in)
        assert(got == c.get("expected").asText(),
          s"input=${show(in)}\nwant=${show(c.get("expected").asText())}\ngot =${show(got)}")
        if (c.has("error2"))
          assert(util.Try(UrlNormalizer.normalize(got)).isFailure, s"expected 2nd-apply throw for ${show(got)}")
        else
          assert(UrlNormalizer.normalize(got) == c.get("expected2").asText(),
            s"2nd apply diverged for ${show(got)}")
      }
    }
    assert(nErr > 100) // the corpus must exercise the error paths
  }

  test("urljoin fuzz parity") {
    graft.GoldenJson.load("urljoin_fuzz.json").foreach { c =>
      val b = c.get("base").asText()
      val h = c.get("href").asText()
      if (c.has("error"))
        assert(util.Try(PyUrl.urljoin(b, h)).isFailure, s"expected throw base=${show(b)} href=${show(h)}")
      else {
        val got = PyUrl.urljoin(b, h)
        assert(got == c.get("expected").asText(),
          s"base=${show(b)} href=${show(h)}\nwant=${show(c.get("expected").asText())}\ngot =${show(got)}")
      }
    }
  }

  test("normalize_query_params fuzz parity") {
    graft.GoldenJson.load("normalize_qp_fuzz.json").foreach { c =>
      val in = c.get("input").asText()
      if (c.has("error"))
        assert(util.Try(UrlNormalizer.normalizeQueryParams(in)).isFailure, s"expected throw for ${show(in)}")
      else {
        val got = UrlNormalizer.normalizeQueryParams(in)
        assert(got == c.get("expected").asText(),
          s"input=${show(in)}\nwant=${show(c.get("expected").asText())}\ngot =${show(got)}")
      }
    }
  }

  test("href utm-strip transform fuzz parity") {
    graft.GoldenJson.load("href_norm_fuzz.json").foreach { c =>
      val b = c.get("base").asText()
      val h = c.get("href").asText()
      if (c.has("error"))
        assert(util.Try(graft.clean.Cleaner.normalizeHref(b, h)).isFailure,
          s"expected throw base=${show(b)} href=${show(h)}")
      else {
        val got = graft.clean.Cleaner.normalizeHref(b, h)
        assert(got == c.get("expected").asText(),
          s"base=${show(b)} href=${show(h)}\nwant=${show(c.get("expected").asText())}\ngot =${show(got)}")
      }
    }
  }
}
