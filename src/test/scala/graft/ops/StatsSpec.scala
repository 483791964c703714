package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def quantiles(vals: Seq[Long], qs: Seq[Double]): Map[Double, (Long, Long)] =
    Stats.exactIntQuantiles(vals.toDF("v"), "v", qs)
      .as[(Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("exact quantiles: uniform 1..100") {
    val out = quantiles(1L to 100L, Seq(0.25, 0.5, 0.75, 0.99, 1.0))
    assert(out(0.25) == ((25L, 25L)))
    assert(out(0.5) == ((50L, 50L)))
    assert(out(0.75) == ((75L, 75L)))
    assert(out(0.99) == ((99L, 99L)))
    assert(out(1.0) == ((100L, 100L)))
  }

  test("exact quantiles: duplicates and gaps (type-1 discrete definition)") {
    // values [1,1,1,5]: ceil(0.5·4)=2 → value 1 (running count 3 ≥ 2);
    // ceil(0.9·4)=4 → value 5
    val out = quantiles(Seq(1L, 1L, 1L, 5L), Seq(0.5, 0.9))
    assert(out(0.5) == ((1L, 3L)))
    assert(out(0.9) == ((5L, 4L)))
  }

  test("exact quantiles: tiny q never picks below the first value") {
    // ceil(0.001·3) = 1 → the minimum value, via the greatest(1, ...) floor
    val out = quantiles(Seq(7L, 8L, 9L), Seq(0.001))
    assert(out(0.001) == ((7L, 1L)))
  }

  test("grouped quantiles: per-group independence and the same type-1 pick") {
    val rows = (1L to 100L).map(v => ("a", v)) ++
      Seq(("b", 1L), ("b", 1L), ("b", 1L), ("b", 5L))
    val out = Stats.exactIntQuantilesByGroup(
        rows.toDF("src", "v"), "src", "v", Seq(0.5, 0.9))
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", 0.5)) == ((50L, 50L)))
    assert(out(("a", 0.9)) == ((90L, 90L)))
    assert(out(("b", 0.5)) == ((1L, 3L)))
    assert(out(("b", 0.9)) == ((5L, 4L)))
    // grouped result for a single group == the global operator
    val globalB = Stats.exactIntQuantiles(
        Seq(1L, 1L, 1L, 5L).toDF("v"), "v", Seq(0.5, 0.9))
      .as[(Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(globalB(0.5) == out(("b", 0.5)) && globalB(0.9) == out(("b", 0.9)))
  }

  test("exact quantiles: empty input → empty result") {
    assert(Stats.exactIntQuantiles(
      Seq.empty[Long].toDF("v"), "v", Seq(0.5)).count() == 0L)
  }

  test("exact quantiles: matches sorted-scan quantiles on a skewed sample") {
    // Zipf-ish skew: value v appears ~1000/v times
    val vals = (1L to 50L).flatMap(v => Seq.fill((1000 / v).toInt)(v))
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val out = quantiles(vals, qs)
    val sorted = vals.sorted
    for (q <- qs) {
      val rank = math.max(1, math.ceil(q * sorted.length).toLong)
      assert(out(q)._1 == sorted((rank - 1).toInt),
        s"q=$q got ${out(q)._1} want ${sorted((rank - 1).toInt)}")
    }
  }
}
