package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** Tokenizer.fitBpeMerges: differential against an independent naive BPE
  * trainer (tie-breaks included), local-gate == distributed-path
  * equivalence, and the applyMerge boundary/adjacency semantics. */
class TokenizerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Independent reference: naive BPE over word counts, same tie-break
    * (count desc, then code-point-ascending left, then right). */
  private def localBpe(wordCounts: Map[String, Long], nMerges: Int,
                       minCount: Long): Seq[(Int, String, String, Long)] = {
    var words = wordCounts.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
        .toVector :+ "</w>", c)
    }.toVector
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var k = 0
    var stop = false
    while (k < nMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        toks.sliding(2).foreach {
          case Seq(a, b) => counts.update((a, b), counts.getOrElse((a, b), 0L) + c)
          case _ =>
        }
      }
      val cand = counts.toSeq.sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
        if (c1 != c2) c1 > c2
        else {
          val ca = Tokenizer.cpCompare(a1, a2)
          if (ca != 0) ca < 0 else Tokenizer.cpCompare(b1, b2) < 0
        }
      }.headOption
      cand match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((k, a, b, c))
          words = words.map { case (toks, cnt) =>
            val nt = Vector.newBuilder[String]
            var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
                nt += (a + b); i += 2
              } else { nt += toks(i); i += 1 }
            }
            (nt.result(), cnt)
          }
          k += 1
        case _ => stop = true
      }
    }
    out.result()
  }

  private def corpusDf(texts: Seq[String]) = texts.toDF("text")

  test("matches the independent reference on a hand corpus (ties incl.)") {
    val texts = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "aa aa ab ab") // 'aa'/'ab' create tie pressure
    val want = localBpe(
      texts.flatMap(_.split("\\s+")).groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }, 10, 2L)
    val got = Tokenizer.fitBpeMerges(corpusDf(texts), nMerges = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"\ngot =$got\nwant=$want")
    assert(got.nonEmpty)
  }

  test("local gate and distributed rounds produce identical merges") {
    val texts = (0 until 300).map { i =>
      val w = Seq("alpha", "beta", "gamma", "delta", "alphabet", "betamax")
      (0 until 6).map(j => w((i + j) % w.length)).mkString(" ")
    }
    val local = Tokenizer.fitBpeMerges(corpusDf(texts), nMerges = 8,
        localGate = 1000000L)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val dist = Tokenizer.fitBpeMerges(corpusDf(texts), nMerges = 8,
        localGate = 0L) // force the distributed path
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(local == dist, s"\nlocal=$local\ndist =$dist")
    assert(local.size == 8)
  }

  test("applyMerge: adjacency runs, boundaries, self-pairs") {
    assert(Tokenizer.applyMerge("a a a", "a", "a") == "aa a")
    assert(Tokenizer.applyMerge("a a a a", "a", "a") == "aa aa")
    assert(Tokenizer.applyMerge("a b a b", "a", "b") == "ab ab")
    assert(Tokenizer.applyMerge("x a b y", "a", "b") == "x ab y")
    assert(Tokenizer.applyMerge("ab a b", "a", "b") == "ab ab")
    // merged token never re-merges within the same pass
    assert(Tokenizer.applyMerge("a a b", "a", "a") == "aa b")
    assert(Tokenizer.applyMerge("l o w </w>", "o", "w") == "l ow </w>")
  }

  test("bpeTokenCounts: trained merges applied per doc, memo-consistent") {
    val texts = Seq("low low lower", "newest lowest low", "low newest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Tokenizer.fitBpeMerges(df, nMerges = 4)
      .orderBy("merge_idx")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val got = Tokenizer.bpeTokenCounts(df, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.split("\\s+").filter(_.nonEmpty)
      val want = words.map(w => Tokenizer.tokenizeWord(w, merges).length.toLong).sum
      assert(got(i.toLong) == ((words.length.toLong, want)), s"doc $i")
    }
    // merged symbols really shrink the token count vs raw codepoints+</w>
    val raw = texts.map(_.split("\\s+").map(_.length + 1).sum).sum
    assert(got.values.map(_._2).sum < raw)
  }

  test("runs out of pairs below minCount and stops early") {
    val got = Tokenizer.fitBpeMerges(corpusDf(Seq("x y z")), nMerges = 10)
      .collect()
    assert(got.isEmpty) // every pair occurs once < minCount=2
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bpeVocab + encodeBpeIds: hand-derived numbering and id sequences") {
    val docs = Seq((1L, "ab ab ac"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Tokenizer.fitBpeMerges(docs, "text", nMerges = 2, minCount = 2L)
      .orderBy("merge_idx")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // word counts ab:3 ac:1 → round 1: (a,b)=3 ties (b,</w>)=3, lex lhs
    // a<b picks (a,b); round 2: (ab,</w>)=3
    assert(merges == Seq(("a", "b"), ("ab", "</w>")))
    // base symbols code-point-sorted: '<'(0x3C) < 'a' → </w>,a,b,c = 0..3;
    // merge symbols follow: ab=4, ab</w>=5
    val vocab = Tokenizer.bpeVocab(docs, "text", merges)
    assert(vocab.toMap == Map("</w>" -> 0, "a" -> 1, "b" -> 2, "c" -> 3,
      "ab" -> 4, "ab</w>" -> 5))
    // ab → [ab</w>]=[5]; ac → [a,c,</w>]=[1,3,0]
    val out = Tokenizer.encodeBpeIds(docs, "doc_id", "text", merges, vocab)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((5L, md5hex("5 5 1 3 0"))))
    assert(out(2L) == ((1L, md5hex("5"))))
  }

  test("encodeBpeIds: tokens outside the vocab encode as -1") {
    val docs = Seq((3L, "ac")).toDF("doc_id", "text")
    // a vocab missing 'c' (e.g. trained on an older corpus snapshot)
    val vocab = Seq(("</w>", 0), ("a", 1))
    val out = Tokenizer.encodeBpeIds(docs, "doc_id", "text", Nil, vocab)
      .as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((3L, 3L, md5hex("1 -1 0"))))
  }
}
