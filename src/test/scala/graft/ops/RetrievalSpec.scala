package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Independent local BM25 (same rational-IDF variant + quantization),
    * plain Scala collections — the differential reference. */
  private def localBm25(docs: Seq[(Long, String)], terms: Seq[String],
                        k: Int): Seq[(Long, Long, Int)] = {
    val tokenized = docs
      .map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val n = tokenized.size.toDouble
    val tt = tokenized.map(_._2.size.toLong).sum.toDouble
    val avgdl = tt / n
    val dfm = tokenized.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.size.toDouble }
    val scores = tokenized.flatMap { case (id, ts) =>
      val dl = ts.size.toDouble
      val tfm = ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
      terms.distinct.filter(tfm.contains).map { t =>
        val df = dfm(t)
        val tf = tfm(t)
        val idf = ((n - df) + 0.5) / (df + 0.5)
        val tfs = (tf * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
        id -> math.floor((idf * tfs) * 1048576.0).toLong
      }
    }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum }.toSeq
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
  }

  private val corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana"),
    (3L, "apple cherry cherry durian"),
    (4L, "durian elderberry fig grape hazelnut imbe jackfruit kiwi"),
    (5L, "apple apple apple apple banana"),
    (6L, "fig grape"),
    (7L, "cherry"),
    (8L, ""))

  private def sparkBm25(terms: Seq[String], k: Int) =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("q" -> terms), k = k, salt = 4)
      .as[(String, Long, Long, Int)].collect()
      .sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq

  test("differential vs the independent local implementation") {
    for (terms <- Seq(Seq("apple"), Seq("banana", "cherry"),
        Seq("apple", "banana", "durian"), Seq("fig", "grape", "kiwi"))) {
      assert(sparkBm25(terms, 10) == localBm25(corpus, terms, 10),
        s"terms=$terms")
    }
  }

  test("k truncates by (score DESC, doc_id ASC)") {
    assert(sparkBm25(Seq("apple"), 2) == localBm25(corpus, Seq("apple"), 2))
    assert(sparkBm25(Seq("apple"), 2).size == 2)
  }

  test("query terms absent from the corpus contribute nothing") {
    assert(sparkBm25(Seq("zzz"), 5).isEmpty)
    assert(sparkBm25(Seq("cherry", "zzz"), 5) ==
      localBm25(corpus, Seq("cherry"), 5))
  }

  test("rarer terms outrank common ones at equal tf (IDF direction)") {
    // "durian" (df=2) should outscore "apple" (df=3) for a doc holding
    // one of each and nothing else distinguishing
    val out = sparkBm25(Seq("durian"), 10).map(_._1)
    assert(out.contains(3L) && out.contains(4L))
  }

  /** Independent local TF-IDF keywords (same rational IDF + grid). */
  private def localKeywords(docs: Seq[(Long, String)],
                            m: Int): Map[Long, (String, Long)] = {
    val tokenized = docs
      .map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val n = tokenized.size.toDouble
    val dfm = tokenized.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.size.toDouble }
    tokenized.map { case (id, ts) =>
      val scored = ts.groupBy(identity).toSeq.map { case (t, xs) =>
        val idf = ((n - dfm(t)) + 0.5) / (dfm(t) + 0.5)
        t -> math.floor((xs.size.toDouble * idf) * 1048576.0).toLong
      }
      val top = scored.sortBy { case (t, q) => (-q, t) }.take(m)
      id -> ((top.map(_._1).mkString("|"), top.head._2))
    }.toMap
  }

  test("tfidfKeywords: differential vs the independent local implementation") {
    for (m <- Seq(1, 2, 4)) {
      val got = Retrieval.tfidfKeywords(corpus.toDF("doc_id", "text"),
          "doc_id", "text", m = m)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == localKeywords(corpus, m), s"m=$m")
    }
  }
}
