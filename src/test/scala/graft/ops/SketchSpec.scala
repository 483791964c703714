package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Exact local model of the sketch (independent arithmetic path). */
  private def localHll(keys: Seq[String], p: Int): (Int, Long, Double) = {
    val m = 1 << p
    val f = 60 - p
    val regs = new Array[Int](m)
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foreach { k =>
      md.reset()
      val hex = md.digest(k.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val v = java.lang.Long.parseLong(hex, 16)
      val b = (v >>> f).toInt
      val w = v & ((1L << f) - 1L)
      val rho = if (w == 0L) f + 1 else f + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    val sumFp = regs.map(r => 1L << (f + 1 - r)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val est = alpha * (m.toLong * m).toDouble * math.pow(2.0, (f + 1).toDouble) / sumFp.toDouble
    (regs.count(_ == 0), sumFp, est)
  }

  test("hllDistinct: registers, fixed-point sum, and estimate match an " +
      "independent local recompute EXACTLY; estimate within HLL error") {
    val keys = (0 until 20000).map(i => s"key-${i % 5000}") // 5000 distinct
    val out = Sketch.hllDistinct(keys.toDF("k"), "k", p = 8)
      .as[(Int, Int, Long, Double)].collect()
    assert(out.length == 1)
    val (m, nZero, sumFp, est) = out.head
    val (wantZero, wantSum, wantEst) = localHll(keys.distinct, 8)
    assert(m == 256)
    assert(nZero == wantZero)
    assert(sumFp == wantSum)
    assert(java.lang.Double.doubleToRawLongBits(est) ==
      java.lang.Double.doubleToRawLongBits(wantEst)) // bitwise
    // m=256 → relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"estimate $est")
  }

  test("hllDistinct: partition-invariant bitwise (integer register sum)") {
    val df = (0 until 3000).map(i => s"u$i").toDF("k")
    val a = Sketch.hllDistinct(df.repartition(1), "k")
      .as[(Int, Int, Long, Double)].collect().head
    val b = Sketch.hllDistinct(df.repartition(13), "k")
      .as[(Int, Int, Long, Double)].collect().head
    assert(a == b)
    assert(java.lang.Double.doubleToRawLongBits(a._4) ==
      java.lang.Double.doubleToRawLongBits(b._4))
  }

  test("hllDistinct: duplicates do not move the sketch") {
    val once = (0 until 1000).map(i => s"d$i")
    val thrice = once ++ once ++ once
    val a = Sketch.hllDistinct(once.toDF("k"), "k")
      .as[(Int, Int, Long, Double)].collect().head
    val b = Sketch.hllDistinct(thrice.toDF("k"), "k")
      .as[(Int, Int, Long, Double)].collect().head
    assert(a == b)
  }

  test("hllDistinct: p bounds enforced") {
    intercept[IllegalArgumentException] {
      Sketch.hllDistinct(Seq("x").toDF("k"), "k", p = 13)
    }
  }

  test("hllMerge property: ANY random 4-way sharding merges to the whole " +
      "sketch (20 seeded trials)") {
    val all = (0 until 1500).map(i => s"p$i")
    val whole = Sketch.hllDistinct(all.toDF("k"), "k")
      .as[(Int, Int, Long, Double)].collect().head
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val assign = all.map(k => (k, rnd.nextInt(4)))
      val shards = (0 until 4).map(s =>
        Sketch.hllRegisters(
          assign.filter(_._2 == s).map(_._1).toDF("k"), "k"))
      val merged = Sketch.hllEstimate(Sketch.hllMerge(shards))
        .as[(Int, Int, Long, Double)].collect().head
      assert(merged == whole, s"trial $trial")
    }
  }

  test("hllMerge: union-of-sketches ≡ sketch-of-union, exactly — " +
      "arbitrary overlapping shards, idempotent, order-insensitive") {
    val all = (0 until 4000).map(i => s"m$i").toDF("k")
    val whole = Sketch.hllDistinct(all, "k")
      .as[(Int, Int, Long, Double)].collect().head
    // three OVERLAPPING shards covering the corpus
    val s1 = Sketch.hllRegisters((0 until 2000).map(i => s"m$i").toDF("k"), "k")
    val s2 = Sketch.hllRegisters((1500 until 3200).map(i => s"m$i").toDF("k"), "k")
    val s3 = Sketch.hllRegisters((3000 until 4000).map(i => s"m$i").toDF("k"), "k")
    val merged = Sketch.hllEstimate(Sketch.hllMerge(Seq(s1, s2, s3)))
      .as[(Int, Int, Long, Double)].collect().head
    assert(merged == whole)
    assert(java.lang.Double.doubleToRawLongBits(merged._4) ==
      java.lang.Double.doubleToRawLongBits(whole._4))
    // order-insensitive and idempotent (a shard merged twice)
    val again = Sketch.hllEstimate(Sketch.hllMerge(Seq(s3, s1, s2, s1)))
      .as[(Int, Int, Long, Double)].collect().head
    assert(again == whole)
  }
}
