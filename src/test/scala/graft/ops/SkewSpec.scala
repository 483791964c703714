package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Skew operators: exactness vs the naive plans, and balance under a
  * Zipfian key (one host owning most rows — the crawl-scale shape the
  * north star's "salted repartitioning for skewed hosts" targets). */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Zipfian link frame: hot.example.com owns 2,000 of 2,600 rows. */
  private lazy val links = {
    val hot = (0 until 2000).map(i =>
      ("hot.example.com", s"https://hot.example.com/p${i % 37}"))
    val cold = (0 until 600).map(i =>
      (s"host${i % 60}.example.com", s"https://host${i % 60}.example.com/p${i % 7}"))
    (hot ++ cold).toDF("dst_host", "dst_url")
  }

  private lazy val counts = links.groupBy($"dst_host", $"dst_url")
    .agg(count(lit(1)).as("cnt"))

  test("salted top-k per key equals the single-window top-k exactly") {
    val salted = Skew.saltedTopKPerKey(counts, "dst_host", "cnt", "dst_url",
        k = 3, S = 8)
      .select($"dst_host", $"dst_url", $"cnt", $"rnk")
      .as[(String, String, Long, Int)].collect().toSet
    val w = Window.partitionBy($"dst_host").orderBy($"cnt".desc, $"dst_url".asc)
    val naive = counts.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"dst_host", $"dst_url", $"cnt", $"rnk")
      .as[(String, String, Long, Int)].collect().toSet
    assert(salted == naive)
    assert(salted.nonEmpty)
    // every key emits min(k, distinct urls) rows
    assert(salted.count(_._1 == "hot.example.com") == 3)
  }

  test("salted top-k stage 1 windows over (key, salt) — the hot key is split") {
    val plan = Skew.saltedTopKPerKey(counts, "dst_host", "cnt", "dst_url",
      k = 3, S = 8).queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan.takeRight(500))
    // two window nodes: the salted pre-rank and the final rank
    assert("windowspecdefinition".r.findAllIn(plan.toLowerCase).size >= 2)
  }

  test("salted repartition spreads the hot key over many partitions") {
    val parted = Skew.saltedRepartition(links, "dst_host", "dst_url",
      S = 8, numPartitions = 16)
    val hotPerPartition = parted
      .mapPartitions(it => Iterator.single(it.count(_.getString(0) == "hot.example.com")))
      .collect()
    val nonEmpty = hotPerPartition.count(_ > 0)
    assert(nonEmpty > 1, s"hot key stayed in $nonEmpty partition(s)")
    assert(hotPerPartition.max < 2000, "one partition still holds the whole hot key")
    // vs the unsalted repartition: ALL hot rows in exactly one partition
    val naive = links.repartition(16, $"dst_host")
      .mapPartitions(it => Iterator.single(it.count(_.getString(0) == "hot.example.com")))
      .collect()
    assert(naive.count(_ > 0) == 1)
  }

  test("salted join equals the plain join (inner and left_outer)") {
    val dim = (0 until 61).map(i => (s"host$i.example.com", i % 5)) ++
      Seq(("hot.example.com", 99))
    val dimDf = dim.toDF("dst_host", "tier")
    def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Any)] =
      df.select($"dst_host", $"dst_url", $"tier").collect()
        .map(r => (r.getString(0), r.getString(1), r.get(2))).toSet
    val plainInner = canon(links.join(dimDf, Seq("dst_host"), "inner"))
    val saltedInner = canon(Skew.saltedJoin(links, dimDf, "dst_host", "dst_url", S = 8))
    assert(saltedInner == plainInner && saltedInner.nonEmpty)
    val plainLeft = canon(links.join(dimDf, Seq("dst_host"), "left_outer"))
    val saltedLeft = canon(
      Skew.saltedJoin(links, dimDf, "dst_host", "dst_url", S = 8, "left_outer"))
    assert(saltedLeft == plainLeft)
    // unmatched big-side hosts survive left_outer with null tier
    assert(saltedLeft.exists(_._3 == null) == plainLeft.exists(_._3 == null))
  }

  test("salt is deterministic and in range") {
    val salts = links.select(Skew.saltCol("dst_url", 8).as("s"))
      .as[Int].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = links.select(Skew.saltCol("dst_url", 8).as("s"))
      .as[Int].collect()
    assert(salts.toSeq == again.toSeq)
    // null input still salts (xxhash64 of a null row is the seed)
    val nullSalt = Seq(Tuple1[String](null)).toDF("dst_url")
      .select(Skew.saltCol("dst_url", 8).as("s")).as[Int].head()
    assert(nullSalt >= 0 && nullSalt < 8)
  }

  test("rangedRunningSum equals the single-partition window cumsum " +
      "exactly, and its plan range-partitions the ordered step") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 5000).map(i => (rnd.nextLong(), 1L + rnd.nextInt(9)))
      .distinctBy(_._1) // unique order keys (the documented tie contract)
    val df = rows.toDF("k", "c")
    val got = Skew.rangedRunningSum(df, $"k".asc, $"c", "cum")
      .select($"k", $"cum").as[(Long, Long)].collect().toMap
    // local model: cumsum over the sorted keys
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, c) => acc += c; (k, acc) }.toMap
    assert(got == want)
    // descending order flavor (the allocateBudget histogram shape)
    val gotD = Skew.rangedRunningSum(df, $"k".desc, $"c", "cum")
      .select($"k", $"cum").as[(Long, Long)].collect().toMap
    var accD = 0L
    val wantD = rows.sortBy(-_._1).map { case (k, c) => accD += c; (k, accD) }.toMap
    assert(gotD == wantD)
    // the ordered step is range-partitioned, not a global no-partition
    // window over the data (only the P-row offset frame may window
    // globally)
    val plan = Skew.rangedRunningSum(df, $"k".asc, $"c", "cum")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
  }
}
