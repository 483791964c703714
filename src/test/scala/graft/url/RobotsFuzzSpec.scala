package graft.url

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/**
 * Differential gate for [[RobotsTxt]] against the container's REAL
 * `urllib.robotparser` (CPython 3.11.7): 185 documents (hand-built state
 * machine / normalization / unicode-digit corners + a seeded grammar
 * sweep) × 8 agents × 18 urls of can_fetch, plus crawl_delay,
 * request_rate, site_maps, the `str(RobotFileParser)` structure render,
 * and crash parity on isdigit-but-not-int() Crawl-delay values.
 * Generator: scripts/gen_robots_fuzz.py.
 */
class RobotsFuzzSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/golden/robots_fuzz.json")
    require(in != null, "missing golden resource: robots_fuzz.json")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
  }

  private def show(s: String): String =
    s.flatMap { c => if (c >= ' ' && c < 0x7f) c.toString else f"\\u${c.toInt}%04x" }

  test("parse/can_fetch/crawl_delay/request_rate/site_maps/str parity") {
    val agents = root.get("agents").elements().asScala.map(_.asText()).toSeq
    val urls = root.get("urls").elements().asScala.map(_.asText()).toSeq
    var nCrash = 0
    var nFetch = 0
    root.get("rows").elements().asScala.zipWithIndex.foreach { case (row, di) =>
      val doc = row.get("doc").asText()
      val got = util.Try(RobotsTxt.parse(doc))
      if (row.has("crash")) {
        nCrash += 1
        assert(got.isFailure, s"doc#$di: expected parse crash\n${show(doc)}")
      } else {
        assert(got.isSuccess, s"doc#$di: unexpected crash $got\n${show(doc)}")
        val r = got.get
        assert(RobotsTxt.render(r) == row.get("render").asText(),
          s"doc#$di render mismatch\ndoc=${show(doc)}\nwant=${show(row.get("render").asText())}\ngot =${show(RobotsTxt.render(r))}")
        val wantSm = Option(row.get("sitemaps")).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toVector)
        assert(RobotsTxt.siteMaps(r) == wantSm, s"doc#$di sitemaps")
        agents.foreach { a =>
          val ag = row.get("agents").get(a)
          val wantDelay =
            if (ag.get("delay").isNull) None else Some(ag.get("delay").asLong())
          assert(RobotsTxt.crawlDelay(r, a) == wantDelay,
            s"doc#$di agent=${show(a)} crawl_delay\ndoc=${show(doc)}")
          val wantRate = Option(ag.get("rate")).filterNot(_.isNull)
            .map(n => (n.get(0).asLong(), n.get(1).asLong()))
          assert(RobotsTxt.requestRate(r, a) == wantRate,
            s"doc#$di agent=${show(a)} request_rate")
          val fetch = row.get("fetch").get(a)
          urls.foreach { u =>
            nFetch += 1
            assert(RobotsTxt.canFetch(r, a, u) == fetch.get(u).asBoolean(),
              s"doc#$di agent=${show(a)} url=${show(u)} can_fetch\ndoc=${show(doc)}\nrender=${show(RobotsTxt.render(r))}\nmatchPath=${show(RobotsTxt.matchPath(u))}")
          }
        }
      }
    }
    assert(nCrash == 2)
    assert(nFetch > 26000) // 183 non-crash docs x 8 agents x 18 urls
  }

  test("fromStatus: read()'s HTTP branches incl. the swallowed 5xx") {
    val body = "User-agent: *\nDisallow: /x\nSitemap: http://e.com/s.xml\n"
    // 401/403: disallow everything, no delays
    for (st <- Seq(401, 403)) {
      val r = RobotsTxt.fromStatus(st, body)
      assert(!RobotsTxt.canFetch(r, "TestBot", "http://e.com/ok"))
      assert(RobotsTxt.crawlDelay(r, "TestBot").isEmpty)
    }
    // other 4xx (404 = robots.txt absent): allow everything
    for (st <- Seq(400, 404, 418, 451, 499)) {
      val r = RobotsTxt.fromStatus(st, body)
      assert(RobotsTxt.canFetch(r, "TestBot", "http://e.com/x"))
      assert(RobotsTxt.crawlDelay(r, "TestBot").isEmpty)
    }
    // 5xx: HTTPError swallowed, parser never read -> deny everything
    for (st <- Seq(500, 503)) {
      val r = RobotsTxt.fromStatus(st, body)
      assert(!RobotsTxt.canFetch(r, "TestBot", "http://e.com/ok"))
      assert(RobotsTxt.crawlDelay(r, "TestBot").isEmpty)
      assert(RobotsTxt.siteMaps(r).isEmpty)
    }
    // 2xx parses
    val ok = RobotsTxt.fromStatus(200, body)
    assert(!RobotsTxt.canFetch(ok, "TestBot", "http://e.com/x"))
    assert(RobotsTxt.canFetch(ok, "TestBot", "http://e.com/y"))
    assert(RobotsTxt.siteMaps(ok).contains(Vector("http://e.com/s.xml")))
  }
}
