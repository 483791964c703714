package graft.html

import org.scalatest.funsuite.AnyFunSuite
import graft.GoldenJson

class EntitiesSpec extends AnyFunSuite {
  test("unescape matches CPython html.unescape golden corpus (F2)") {
    GoldenJson.load("unescape.json").foreach { c =>
      val in = c.get("input").asText
      assert(Entities.unescape(in) == c.get("expected").asText, s"input=$in")
    }
  }
}
