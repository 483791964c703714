package graft.url

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * Function-level differential (scripts/gen_qs_fuzz.py): parse_qsl /
 * parse_qs(keep_blank_values) / urlencode (plain + doseq) /
 * quote(safe='/:@&=+$,') / quote_plus / unquote pinned alone against
 * CPython, plus the reference's own is_session_id over case/unicode
 * edge parameter names.
 */
class QsFuzzSpec extends AnyFunSuite {

  private val root = {
    val in = getClass.getResourceAsStream("/golden/qs_fuzz.json")
    require(in != null)
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
  }

  private def pairsOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[(String, String)] =
    n.elements().asScala.map(p => (p.get(0).asText(), p.get(1).asText())).toSeq

  test("parse_qsl + urlencode parity") {
    root.get("qsl").elements().asScala.foreach { c =>
      val q = c.get("in").asText()
      assert(PyUrl.parseQsl(q) == pairsOf(c.get("pairs")), s"qsl in=$q")
      assert(PyUrl.parseQsl(q, keepBlankValues = true) == pairsOf(c.get("pairs_blank")),
        s"qsl-blank in=$q")
      assert(PyUrl.urlencode(PyUrl.parseQsl(q)) == c.get("enc").asText(), s"enc in=$q")
    }
  }

  test("parse_qs(keep_blank_values) + urlencode(doseq) parity") {
    root.get("qs").elements().asScala.foreach { c =>
      val q = c.get("in").asText()
      val want = c.get("grouped").elements().asScala.map { g =>
        (g.get(0).asText(), g.get(1).elements().asScala.map(_.asText()).toSeq)
      }.toSeq
      assert(PyUrl.parseQs(q, keepBlankValues = true) == want, s"qs in=$q")
      assert(PyUrl.urlencodeSeq(PyUrl.parseQs(q, keepBlankValues = true)) ==
        c.get("enc_doseq").asText(), s"doseq in=$q")
    }
  }

  test("quote / quote_plus parity") {
    root.get("quote").elements().asScala.foreach { c =>
      val p = c.get("in").asText()
      assert(PyUrl.quote(p, safe = "/:@&=+$,") == c.get("quoted").asText(), s"quote in=$p")
      assert(PyUrl.quotePlus(p) == c.get("plus").asText(), s"plus in=$p")
    }
  }

  test("unquote parity") {
    root.get("unquote").elements().asScala.foreach { c =>
      val p = c.get("in").asText()
      assert(PyUrl.unquote(p) == c.get("out").asText(), s"unquote in=$p")
    }
  }

  test("is_session_id parity (IGNORECASE + unicode case edges)") {
    root.get("session").elements().asScala.foreach { c =>
      val p = c.get("param").asText()
      assert(UrlNormalizer.isSessionId(p) == c.get("hit").asBoolean(), s"param=$p")
    }
  }
}
