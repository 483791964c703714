package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * Differential gate for date-meta normalization against this container's
 * REAL dateutil (scripts/gen_dates_fuzz.py → dates_fuzz.json): full
 * dates must produce byte-identical `.isoformat()` strings through
 * MetadataExtractor.parseDateIso (fast paths + the PyDateUtil port);
 * dateutil errors must map to None. Rows marked `partial` (result
 * depends on TODAY in the reference) are asserted to map to None —
 * the documented deterministic deviation.
 */
class DatesFuzzSpec extends AnyFunSuite {

  test("dateutil.parse().isoformat() parity over the meta-date corpus") {
    var nOk, nErr, nPart = 0
    graft.GoldenJson.load("dates_fuzz.json").foreach { c =>
      val s = c.get("in").asText()
      val got = MetadataExtractor.parseDateIso(s)
      if (c.has("error")) { nErr += 1; assert(got.isEmpty, s"want None for error row in=${s.take(50)} got=$got") }
      else if (c.has("partial")) { nPart += 1; assert(got.isEmpty, s"partial row must map to None in=${s.take(50)} got=$got") }
      else {
        nOk += 1
        assert(got.contains(c.get("iso").asText()),
          s"in=${s.take(60)}\nwant=${c.get("iso").asText()}\ngot =$got")
      }
    }
    assert(nOk > 80 && nErr > 10)
  }
}
