package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** LinkGraph.pageRank: differential-gated against an independent local
  * reference implementation of damped PageRank (same semantics, naive
  * Map-based math), plus the analytic invariants — ranks sum to 1 every
  * iteration because dangling mass is redistributed, hubs outrank leaves,
  * and input hygiene (self-loops, duplicate edges, nulls) is applied. */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Independent reference: naive damped PageRank over the simple graph. */
  private def localPageRank(edges: Seq[(String, String)], iters: Int,
                            d: Double): Map[String, Double] = {
    val e = edges.filter { case (a, b) => a != b }.distinct
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val in = e.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val c = in.getOrElse(v, Nil).map(s => r(s) / out(s)).sum
        v -> ((1.0 - d) / n + d * (c + dang / n))
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    LinkGraph.pageRank(edges.toDF("src_url", "dst_url"), iters)
      .as[(String, Double)].collect().toMap

  test("matches the local reference on a hand graph with dangling + hub") {
    // b and c both point at d (hub); d is dangling; self-loop and a
    // duplicate edge must be ignored
    val edges = Seq(
      "a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "a" -> "d",
      "a" -> "d", // duplicate
      "b" -> "b") // self-loop
    val got = run(edges, 3)
    val want = localPageRank(edges, 3, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (u, r) =>
      assert(math.abs(r - want(u)) < 1e-12, s"$u: $r vs ${want(u)}")
    }
    // the hub d (3 in-links) outranks every leaf
    assert(got("d") > got("b") && got("d") > got("c") && got("d") > got("a"))
  }

  test("matches the local reference on a 60-node pseudo-random graph") {
    // deterministic LCG — no Random, no wall clock
    var x = 12345L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val edges = (0 until 400).map { _ =>
      val s = math.floorMod(next(), 60)
      val t = math.floorMod(next(), 60)
      (s"u$s", s"u$t")
    }.filter { case (a, b) => a != b }
    for (iters <- Seq(0, 1, 4)) {
      val got = run(edges, iters)
      val want = localPageRank(edges, iters, 0.85)
      assert(got.keySet == want.keySet)
      got.foreach { case (u, r) =>
        assert(math.abs(r - want(u)) < 1e-12, s"iters=$iters $u: $r vs ${want(u)}")
      }
      // dangling redistribution keeps total mass at exactly 1
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"iters=$iters sum")
    }
  }

  test("empty edge set returns an empty (url, rank) frame") {
    val out = LinkGraph.pageRank(
      Seq.empty[(String, String)].toDF("src_url", "dst_url"), 3)
    assert(out.columns.toSeq == Seq("url", "rank"))
    assert(out.count() == 0)
  }

  test("null endpoints are dropped, not propagated") {
    val edges = Seq(("a", "b"), ("a", null), (null, "b"))
      .toDF("src_url", "dst_url")
    val got = LinkGraph.pageRank(edges, 2).as[(String, Double)].collect().toMap
    assert(got.keySet == Set("a", "b"))
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }
}
