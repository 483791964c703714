package graft.html

import org.scalatest.funsuite.AnyFunSuite
import graft.GoldenJson

/** Exhaustive pin of the Python whitespace set: PyStr.isPyWs must agree
  * with CPython str.isspace for EVERY BMP codepoint (the golden lists the
  * 29 true codepoints; everything else must be false). This is the set
  * normalize_whitespace / get_text(strip=True) / empty-tag removal all
  * hang off — a one-char divergence breaks the byte contract. */
class PyStrSpec extends AnyFunSuite {

  test("isPyWs matches CPython str.isspace over the whole BMP") {
    val truthy = GoldenJson.load("py_isspace_bmp.json").map(_.asInt).toSet
    assert(truthy.size == 29)
    var cp = 0
    while (cp < 0x10000) {
      assert(PyStr.isPyWs(cp.toChar) == truthy.contains(cp),
        f"cp=U+$cp%04X expected=${truthy.contains(cp)}")
      cp += 1
    }
  }

  test("strip/isBlank agree with the set") {
    assert(PyStr.strip(" 　 x  ") == "x")
    assert(PyStr.isBlank("   "))
    assert(!PyStr.isBlank(" . "))
    assert(PyStr.strip("") == "")
  }
}
