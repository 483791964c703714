package graft.textstats

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class EncodingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def cp(c: Int) = new String(Character.toChars(c))

  private def run(rows: (Long, String)*) =
    Encoding.encodingQuality(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("hand-counted damage signals") {
    val rep = cp(0xFFFD)
    val moji2 = cp(0xC3) + cp(0xAF)            // Latin-1-decoded 2-byte seq
    val moji3 = cp(0xE2) + cp(0x80) + cp(0x99) // 3-byte seq, C1 tails
    val out = run(
      (1L, s"caf$rep broken$rep"),
      (2L, s"na${moji2}ve plan"),
      // the 3-byte mojibake consumes all three chars as ONE event, while
      // its two tail chars count individually as C1
      (3L, s"it${moji3}s quote"),
      (4L, "bad" + cp(0x85) + "line"),
      (5L, "clean ascii text"))
    assert(out(1L) == ((2L, 0L, 0L, true)))
    assert(out(2L) == ((0L, 0L, 1L, true)))
    assert(out(3L) == ((0L, 2L, 1L, true)))
    assert(out(4L) == ((0L, 1L, 0L, true)))
    assert(out(5L) == ((0L, 0L, 0L, false)))
  }

  test("flag boundary is strict: damage*200 == len stays clean") {
    val rep = cp(0xFFFD)
    // 1 damage event in exactly 200 chars → 200 > 200 is false
    val exact = rep + "x" * 199
    // one char shorter → suspect
    val over = rep + "x" * 198
    val out = run((1L, exact), (2L, over))
    assert(out(1L) == ((1L, 0L, 0L, false)))
    assert(out(2L) == ((1L, 0L, 0L, true)))
  }

  test("null and empty text produce zero counts, never a flag") {
    val out = run((1L, null), (2L, ""))
    assert(out(1L) == ((0L, 0L, 0L, false)))
    assert(out(2L) == ((0L, 0L, 0L, false)))
  }

  test("C2-lead 2-byte mojibake (Â + NBSP shadow) counts once") {
    // U+00C2 U+00A0 — the classic Â + no-break-space double-decode
    val out = run((1L, "x" + cp(0xC2) + cp(0xA0) + "y"))
    assert(out(1L) == ((0L, 0L, 1L, true)))
  }
}
