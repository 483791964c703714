package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * Differential gate for the sitemap per-payload semantics against this
 * container's real xmltodict/expat (scripts/gen_sitemap_fuzz.py →
 * sitemap_fuzz.json): clean parses must yield identical (kind, locs);
 * ExpatError / foreign-root rows map to "none"; the reference's
 * loc-collection crashes and non-string loc members map to "parse_error".
 */
class SitemapFuzzSpec extends AnyFunSuite {

  test("xmltodict/expat parity over the sitemap fuzz corpus") {
    val cases = GoldenJsonLoader2.load("sitemap_fuzz.json")
    assert(cases.nonEmpty)
    var counts = Map.empty[String, Int].withDefaultValue(0)
    cases.foreach { c =>
      val xml = c.get("xml").asText()
      val enc = if (c.has("enc")) c.get("enc").asText() else "UTF-8"
      val (kind, locs) = Sitemap.parseSitemapBytes(xml.getBytes(enc))
      val want = c.get("kind").asText()
      counts = counts.updated(want, counts(want) + 1)
      want match {
        case "urlset" | "sitemapindex" =>
          val wantLocs = c.get("locs").elements().asScala.map(_.asText()).toSeq
          assert(kind == want && locs == wantLocs,
            s"xml=${xml.take(120)}\nwant=($want, $wantLocs)\ngot =($kind, $locs)")
        case "none" =>
          assert(kind == "none", s"xml=${xml.take(120)} want=none got=$kind locs=$locs")
        case "crash" | "nonstr" =>
          assert(kind == "parse_error", s"xml=${xml.take(120)} want=parse_error($want) got=$kind locs=$locs")
      }
    }
    // the corpus must exercise every outcome class
    assert(Seq("urlset", "sitemapindex", "none", "crash", "nonstr").forall(counts(_) > 20), counts.toString)
  }
}

private object GoldenJsonLoader2 {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  def load(name: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource: $name")
    mapper.readTree(in).elements().asScala.toSeq
  }
}
