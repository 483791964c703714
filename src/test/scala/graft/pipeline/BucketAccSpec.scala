package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/**
 * VERDICT r03 wrong #1 gate: driver-side bucket accumulation must be
 * bounded by numBuckets, not by row count. The old
 * `collectionAccumulator[Int]` merged one boxed Integer per extracted row
 * onto the driver — O(rows) driver memory, a guaranteed OOM at the
 * 10^12-doc design point. BucketSetAccumulator's state is a BitSet over
 * bucket ids: bounded, and idempotent under task retry.
 */
class BucketAccSpec extends AnyFunSuite {

  test("1M adds over 32 buckets: value is the bucket set, state stays bounded") {
    val acc = new BucketSetAccumulator
    var i = 0
    while (i < 1000000) { acc.add(i % 32); i += 1 }
    assert(acc.value === (0 until 32).toSet)
    // BitSet state: bounded by the max bucket id, nowhere near O(rows)
    assert(acc.stateBytes < 1024, s"driver state ${acc.stateBytes}B not bounded")
  }

  test("merge unions; retry double-add is a no-op (set semantics)") {
    val a = new BucketSetAccumulator
    val b = new BucketSetAccumulator
    Seq(1, 5, 9).foreach(a.add)
    Seq(5, 9, 13).foreach(b.add)     // overlapping "retried task" adds
    a.merge(b)
    a.merge(b.copy())                // merging the same task twice changes nothing
    assert(a.value === Set(1, 5, 9, 13))
  }

  test("copyAndReset / isZero contract") {
    val a = new BucketSetAccumulator
    a.add(3)
    val c = a.copyAndReset() // Spark contract: returns a ZEROED copy
    assert(c.isZero && !a.isZero && a.value === Set(3))
    a.reset()
    assert(a.isZero)
  }

  test("distributed: run-level bucket set matches relational distinct") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val acc = new BucketSetAccumulator
    spark.sparkContext.register(acc, "spec.buckets")
    val n = 16
    val ds = PagesGen.pages(spark, 500L)
    ds.map { r => acc.add(Extract.urlBucket(r.url, n)); 1 }.count()
    val expected = ds.map(r => Extract.urlBucket(r.url, n))
      .distinct().collect().toSet
    assert(acc.value === expected)
    assert(acc.value.size <= n)
  }
}
