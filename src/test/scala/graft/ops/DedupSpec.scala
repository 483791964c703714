package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** Dedup operators over a synthetic corpus with PLANTED exact and near
  * duplicates (testdata documents are all unique, so the operators' recall
  * is proven here). */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the rain " +
    "in spain stays mainly on the plain and the cat sat on the mat watching"
  private val docs = {
    val rows =
      (0 until 40).map(i => (i.toLong, s"unique document number $i about topic ${i % 7} " +
        s"with content words ${"alpha beta gamma delta".split(" ")(i % 4)} repeated $i times")) ++
      Seq(
        (100L, base), (101L, base), // exact dups
        (102L, base.replace("lazy dog", "sleepy dog")), // near dup
        (103L, base.replace("rain in spain", "snow in maine")), // near dup
        (104L, "completely different text about spark shuffles and catalyst optimizer rules"))
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
    val dupGroup = groups.filter($"n" > 1).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup(0).getAs[Long]("keeper") == 100L)
    assert(dupGroup(0).getAs[Long]("n") == 2L)
    val drops = Dedup.exactDropIds(docs, "doc_id", "text").as[Long].collect()
    assert(drops.toSet == Set(101L))
  }

  test("minhash LSH finds planted near-dups, verified jaccard is high") {
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text", numPerm = 64, bands = 16)
    val verified = Dedup.verifyJaccard(cands, docs, "doc_id", "text")
      .filter($"jaccard" >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(verified.contains((100L, 101L)))
    assert(verified.contains((100L, 102L)) || verified.contains((101L, 102L)), verified.toString)
    assert(verified.contains((100L, 103L)) || verified.contains((101L, 103L)))
    // no false positives against the unrelated doc
    assert(!verified.exists(p => p._1 == 104L || p._2 == 104L))
  }

  test("simhash pairs: exact dups always found; near-dups found when within the blocking guarantee") {
    import graft.textstats.TextAnalysis
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L))) // hamming 0
    val h102 = TextAnalysis.hamming64(TextAnalysis.simhash(base),
      TextAnalysis.simhash(base.replace("lazy dog", "sleepy dog")))
    if (h102 <= 7) // 8x8-bit multi-index guarantees recall only to hamming 7
      assert(pairs.exists(p => p._2 == 102L || p._1 == 102L), s"h=$h102")
    // verified pairs never exceed the threshold
    val over = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
      .filter($"hamming" > 7).count()
    assert(over == 0)
  }

  test("fingerprints deterministic across evaluations") {
    val a = Dedup.fingerprints(docs, "doc_id", "text").orderBy($"id")
      .select($"id", $"simhash").as[(Long, Long)].collect().toSeq
    val b = Dedup.fingerprints(docs, "doc_id", "text").orderBy($"id")
      .select($"id", $"simhash").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }
}
