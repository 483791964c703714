package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Frontier.politenessSchedule: the politeness invariant (one host, one
  * worker), the reference's priority-queue order within a host, exact
  * integer wave arithmetic, DynamicRateLimiter delay clamping, and
  * NULL-host visibility. */
class FrontierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val frontier = Seq(
    ("https://a.example.com/high", 900),
    ("https://a.example.com/mid", 500),
    ("https://a.example.com/low", 100),
    ("https://a.example.com/tie1", 500), // priority tie → url asc
    ("https://b.example.com/only", 700),
    ("https://c.example.com/x", 50),
    ("https://c.example.com/y", 60),
    ("not a url at all", 999) // unparsable host stays visible
  ).toDF("url", "priority_score")

  private lazy val out = Frontier
    .politenessSchedule(frontier, numWorkers = 3, delayMs = 3000L)
    .collect()
    .map(r => (r.getString(0), Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      r.getInt(3), r.getLong(4)))

  test("one host maps to exactly one worker") {
    val byHost = out.filter(_._2.isDefined).groupBy(_._2.get)
    byHost.foreach { case (h, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"host $h split across workers")
    }
  }

  test("fetch_seq is the dense per-host priority order with url tie-break") {
    val a = out.filter(_._2.contains("a.example.com")).sortBy(_._4).map(_._1)
    assert(a.toSeq == Seq("https://a.example.com/high",
      "https://a.example.com/mid", "https://a.example.com/tie1",
      "https://a.example.com/low"))
    val c = out.filter(_._2.contains("c.example.com")).sortBy(_._4).map(_._1)
    assert(c.toSeq == Seq("https://c.example.com/y", "https://c.example.com/x"))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), "seq not dense")
    }
  }

  test("est_start_ms is exact (seq-1)*delay integer arithmetic") {
    out.foreach { case (_, _, _, seq, start) =>
      assert(start == (seq - 1) * 3000L)
    }
  }

  test("delay clamps to DynamicRateLimiter's [500, 5000] bounds") {
    def startOfSecond(delay: Long): Long = Frontier
      .politenessSchedule(frontier, numWorkers = 3, delayMs = delay)
      .filter("fetch_seq = 2").select("est_start_ms")
      .as[Long].head()
    assert(startOfSecond(100L) == 500L)   // below min → 0.5 s
    assert(startOfSecond(60000L) == 5000L) // above max → 5 s
    assert(startOfSecond(2000L) == 2000L)  // in bounds → kept
  }

  test("unparsable host → NULL host + NULL worker, row kept") {
    val bad = out.filter(_._1 == "not a url at all")
    assert(bad.length == 1)
    assert(bad.head._2.isEmpty && bad.head._3.isEmpty && bad.head._4 == 1)
  }

  test("urlPatternFamilies: templates collapse, traps flag, fixed regex order") {
    val urls = (1 to 30).map(i => s"https://a.com/page$i.html") ++
      Seq("https://a.com/post?date=2024-01-02&tag=x",
          "https://a.com/post?date=2024-03-09&tag=y",
          // 8+ hex chars → H BEFORE the digit pass (would otherwise split)
          "https://b.com/s/deadbeef1234/view",
          "https://b.com/s/cafebabe5678/view",
          "https://b.com/about")
    val out = Frontier.urlPatternFamilies(
        urls.toDF("url"), "url", trapThreshold = 20L)
      .as[(String, String, Long, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val page = out(("a.com", "https://a.com/pageN.html"))
    assert(page == ((30L, "https://a.com/page1.html", true)))
    // query VALUES collapse to =V (after the digit pass, so dates → N
    // first, then the whole value → V)
    assert(out(("a.com", "https://a.com/post?date=V&tag=V"))._1 == 2L)
    assert(out(("b.com", "https://b.com/s/H/view")) ==
      ((2L, "https://b.com/s/cafebabe5678/view", false)))
    assert(out(("b.com", "https://b.com/about"))._1 == 1L)
  }

  test("demoteFailingHosts: exact cross-multiply fence, strict inequality, " +
      "unparseable urls dropped") {
    import spark.implicits._
    val docs = Seq(
      ("https://bad.com/1", 1L), ("https://bad.com/2", 1L),
      ("https://bad.com/3", 0L),                       // 2/3 > 1/5 → demote
      ("https://edge.com/1", 1L), ("https://edge.com/2", 0L),
      ("https://edge.com/3", 0L), ("https://edge.com/4", 0L),
      ("https://edge.com/5", 0L),                      // 1/5 == 1/5 → keep
      ("https://good.com/1", 0L), ("https://good.com/2", 0L),
      ("not a url", 1L))
      .toDF("url", "failed")
    val out = Frontier.demoteFailingHosts(docs, "url", "failed")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "bad.com" -> ((3L, 2L, true)),
      "edge.com" -> ((5L, 1L, false)),   // strict: exactly at the fence stays
      "good.com" -> ((2L, 0L, false))))
  }

  test("allocateBudget: largest-remainder — exact sum, proportionality, " +
      "deterministic remainder/host tie-break") {
    import spark.implicits._
    // N = 100, B = 7: floors are 7*n/100; remainders decide the leftover
    val hosts = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .toDF("host", "n_pages")
    val out = Frontier.allocateBudget(hosts, budget = 7L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // floors: a=3 (rem 50), b=2 (rem 10), c=1 (rem 5), d=0 (rem 35)
    // leftover = 7-6 = 1 → goes to the largest remainder: a
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 0L))
    // remainder ties break by host ascending: four equal hosts, B=2
    val eq = Seq(("w", 10L), ("x", 10L), ("y", 10L), ("z", 10L))
      .toDF("host", "n_pages")
    val out2 = Frontier.allocateBudget(eq, budget = 2L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out2 == Map("w" -> 1L, "x" -> 1L, "y" -> 0L, "z" -> 0L))
    // invariants on a bigger skewed frame: sum == B, quota <= n_pages
    val big = (0 until 200).map(i => (s"h$i", (i % 17 + 1).toLong))
      .toDF("host", "n_pages")
    val q = Frontier.allocateBudget(big, budget = 137L)
      .as[(String, Long, Long)].collect()
    assert(q.map(_._3).sum == 137L)
    assert(q.forall(r => r._3 <= r._2))
    assert(q.forall(r => r._3 >= 0L))
  }

  test("allocateBudget: uniform host counts — every host in ONE remainder " +
      "class (the VERDICT r5 degenerate-window case) still allocates " +
      "exactly, with the boundary group ranked range-partitioned") {
    import spark.implicits._
    // 500 equal hosts, prime budget: N = 5000, B·n = 1370 for every host
    // → floor 0 rem 1370 → one tie class holding ALL hosts; L = 137
    // bonuses go to the 137 lexicographically smallest host names
    val hosts = (0 until 500).map(i => (f"h$i%03d", 10L))
      .toDF("host", "n_pages")
    val out = Frontier.allocateBudget(hosts, budget = 137L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out.size == 500)
    assert(out.values.sum == 137L)
    val expectPlusOne = (0 until 500).map(i => f"h$i%03d").sorted.take(137).toSet
    out.foreach { case (h, q) =>
      assert(q == (if (expectPlusOne(h)) 1L else 0L), s"host $h quota $q")
    }
    // force the over-gate plan (range-partitioned histogram cumsum AND
    // boundary-group rank): bit-identical allocation to the gated path
    val outBig = Frontier.allocateBudget(hosts, budget = 137L, windowGate = 0L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(outBig == out)
  }

  test("allocateBudget property: Σquota == B, 0 ≤ quota ≤ n_pages, and " +
      "|quota - B·n/N| < 1 fair-share bound (15 seeded random frames)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 15).foreach { trial =>
      val nHosts = 3 + rnd.nextInt(60)
      val hosts = (0 until nHosts)
        .map(i => (s"h$i", 1L + rnd.nextInt(500).toLong))
      val n = hosts.map(_._2).sum
      val b = 1L + rnd.nextInt(math.min(n, 1000L).toInt).toLong
      val out = Frontier.allocateBudget(hosts.toDF("host", "n_pages"), b)
        .as[(String, Long, Long)].collect()
      assert(out.map(_._3).sum == b, s"trial $trial: sum != B")
      out.foreach { case (h, np, qt) =>
        assert(qt >= 0L && qt <= np, s"trial $trial $h")
        // largest-remainder never strays a full unit from the fair share
        val fair = b.toDouble * np.toDouble / n.toDouble
        assert(math.abs(qt - fair) < 1.0 + 1e-9, s"trial $trial $h: $qt vs $fair")
      }
    }
  }
}
