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

  private def mask(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(Privacy.maskPii($"t")).as[String].head()
  }

  test("ssn/card/phone classes: shapes mask, lookalikes survive") {
    // SSN: dashes required — bare 9 digits and IPs survive
    assert(mask("ssn 123-45-6789 ok") == "ssn <SSN> ok")
    assert(mask("id 123456789 ok") == "id 123456789 ok")
    // card: separated 4-4-4-4 only (space or dash, mixed allowed);
    // bare 16 digits deliberately survive (Luhn territory)
    assert(mask("pay 4111 1111 1111 1234 now") == "pay <CARD> now")
    assert(mask("pay 4111-1111 1111-1234 now") == "pay <CARD> now")
    assert(mask("pay 4111111111111234 now") == "pay 4111111111111234 now")
    // phone: leading + required; plain digit runs and dates survive
    assert(mask("call +1 202-555-0123 today") == "call <PHONE> today")
    assert(mask("call +44 20 7946 0958") == "call <PHONE>")
    assert(mask("on 2024-03-12 we shipped") == "on 2024-03-12 we shipped")
    // disjointness: a card is not three SSN-ish groups, a phone tail is
    // not an SSN (no boundary splits a digit group)
    assert(mask("mix +1 303-555-0100 and 987-65-4321 and 1.2.3.4") ==
      "mix <PHONE> and <SSN> and <IP>")
  }

  test("new counts are taken on the original text") {
    import spark.implicits._
    val out = Seq("s 111-22-3333 c 4111 1111 1111 1111 p +1 404-555-0101")
      .toDF("t")
      .select(Privacy.ssnCount($"t"), Privacy.ccardCount($"t"),
        Privacy.phoneCount($"t")).as[(Int, Int, Int)].head()
    assert(out == ((1, 1, 1)))
  }
}
