package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING at corpus scale — the merge-table fit that
 * complements `TextAnalysis.tokenizeBpeish` (counting) and
 * `QualityLm.fitUnigram` (vocab ranking).
 *
 * The scale trick is classical: after the one corpus-sized pass that
 * aggregates the WORD-FREQUENCY table, every merge round operates on
 * vocabulary-sized state (10^5–10^8 rows at web scale, vs 10^12 docs) —
 * pair counts are weighted by word frequency, so the corpus is never
 * touched again. Each round is one map-side-combinable aggregation plus
 * one narrow map over the word table; the word-table state is truncated
 * via [[graft.ops.Checkpoints.truncate]] so lineage stays flat across
 * rounds (the PageRank discipline; reliable-checkpoint capable via
 * `spark.graft.checkpointDir`).
 *
 * Determinism: the winning pair maximizes (count, then LEXICOGRAPHICALLY
 * SMALLEST left, then right) — string order is CODE-POINT order
 * (Spark's UTF8String binary order == DuckDB varchar order; the local
 * path uses an explicit code-point comparator because Java's
 * String.compareTo is UTF-16-unit order, which differs above U+FFFF).
 *
 * Size-gated local finish (the Dedup.components precedent): when the
 * word table fits `localGate`, rounds run in one driver loop over the
 * collected table — byte-identical output to the distributed path
 * (spec-gated equivalence).
 */
object Tokenizer {

  /** ASCII-whitespace word counts — `split(text, '\\s+')` on both engines
    * (Java regex \s and RE2 \s are the same ASCII set, so the oracle's
    * tokenization matches by construction). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word's initial symbol string: space-joined CODE POINTS plus the
    * end-of-word sentinel (the classical BPE pretokenization). */
  def initialSymbols(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 5)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      if (sb.length > 0) sb.append(' ')
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    if (sb.length > 0) sb.append(' ')
    sb.append("</w>")
    sb.toString
  }

  /** Single-pass left-to-right merge application == repeated leftmost
    * collapse (the merged token is a fresh symbol, so no new occurrences
    * form left of the scan point). */
  def applyMerge(syms: String, a: String, b: String): String = {
    val pat = " " + a + " " + b + " "
    val merged = " " + a + b + " "
    var s = " " + syms + " "
    var pos = s.indexOf(pat)
    while (pos >= 0) {
      s = s.substring(0, pos) + merged + s.substring(pos + pat.length)
      pos = s.indexOf(pat, pos + merged.length - 1)
    }
    s.substring(1, s.length - 1)
  }

  /** UTF-8/code-point string order (Spark + DuckDB binary order). */
  private[ops] def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** One merge row (lhs/rhs: `left`/`right` are SQL keywords and these
    * rows flow through the DuckDB oracle verbatim). */
  final case class Merge(merge_idx: Int, lhs: String, rhs: String,
                         pair_count: Long)

  /** Tokenize one word under an ordered merge list (training's exact
    * apply semantics, merge by merge). Returns the symbol tokens. */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var s = initialSymbols(word)
    merges.foreach { case (a, b) => s = applyMerge(s, a, b) }
    s.split(' ')
  }

  /**
   * Apply a trained merge table to a corpus: per-doc BPE token counts.
   * The merge list is a tiny driver-side broadcastable Seq (vocabulary
   * work happened at training); the corpus pass is one typed map with a
   * per-partition word memo — the same word repeats Zipf-style, so the
   * apply cost is ~distinct-words, not ~tokens.
   *
   * Returns (idCol, n_words, n_bpe_tokens).
   */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, text) =>
          val words = (if (text == null) "" else text)
            .split("\\s+").filter(_.nonEmpty)
          var toks = 0L
          words.foreach { w =>
            toks += memo.getOrElseUpdate(w, tokenizeWord(w, merges).length)
          }
          (id, words.length.toLong, toks)
        }
      }.toDF(idCol, "n_words", "n_bpe_tokens")
  }

  /** BPE vocabulary induced by (corpus, merges) — the id table a trainer
    * ships with its merge list: base symbols (every distinct code-point
    * symbol occurring in any word, plus the `</w>` sentinel) take ids
    * 0..B-1 in CODE-POINT order (Spark UTF8String binary order == DuckDB
    * varchar order, so the oracle re-derives the numbering with a plain
    * ORDER BY), and merge k's fused symbol takes id B+k — the classical
    * BPE numbering. A pathological merge chain can fuse a string equal
    * to an existing token (e.g. rebuilding the sentinel from its own
    * characters); ids stay unique by keeping the SMALLEST id per token.
    * Driver-sized by construction: |base| is bounded by the code points
    * in use (≤ Unicode), |merges| is the vocab budget. */
  def bpeVocab(docs: DataFrame, textCol: String,
               merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = wordCounts(docs, textCol).select(col("word")).as[String]
      .flatMap(w => initialSymbols(w).split(' ').toSeq)
      .distinct().collect()
      .sortWith(cpCompare(_, _) < 0)
    val all = base.zipWithIndex.toSeq ++
      merges.zipWithIndex.map { case ((a, b), k) => (a + b, base.length + k) }
    all.groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }
      .toSeq.sortBy(_._2)
  }

  /** Per-doc BPE id ENCODING — the last tokenizer stage a training
    * pipeline runs: every word tokenized under the merge list
    * ([[tokenizeWord]], per-partition word memo — Zipf makes the cost
    * ~distinct-words), tokens mapped through the vocab. Emits
    * (idCol, n_bpe_tokens, ids_md5) where `ids_md5` fingerprints the
    * ENTIRE space-joined decimal id sequence — the whole sequence is
    * pinned (any id, any position) without shipping 10^4 ints per row
    * through the compare. Tokens outside the vocab (impossible when the
    * vocab came from this corpus) encode as -1. */
  def encodeBpeIds(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)],
                   vocab: Seq[(String, Int)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vmap = vocab.toMap
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        it.map { case (id, text) =>
          val words = (if (text == null) "" else text)
            .split("\\s+").filter(_.nonEmpty)
          val sb = new java.lang.StringBuilder
          var n = 0L
          words.foreach { w =>
            val ids = memo.getOrElseUpdate(w,
              tokenizeWord(w, merges).map(t => vmap.getOrElse(t, -1)))
            ids.foreach { tid =>
              if (sb.length > 0) sb.append(' ')
              sb.append(tid)
              n += 1
            }
          }
          (id, n, sb.toString)
        }
      }.toDF(idCol, "n_bpe_tokens", "__ids")
      .select(col(idCol), col("n_bpe_tokens"), md5(col("__ids")).as("ids_md5"))
  }

  /**
   * Fit `nMerges` BPE merges over a document frame. Returns
   * (merge_idx, lhs, rhs, pair_count) — fewer rows than `nMerges` if
   * the corpus runs out of repeated pairs (pair_count never < minCount).
   */
  def fitBpeMerges(docs: DataFrame, textCol: String = "text",
                   nMerges: Int = 16, minCount: Long = 2L,
                   localGate: Long = 200000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words0 = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (initialSymbols(w), c) }
      .toDF("syms", "cnt")
      // identical initial symbol strings merge (words differing only in
      // surrogate pairing cannot occur; this also bounds the table)
      .groupBy("syms").agg(sum("cnt").as("cnt"))
      // the vocab probe (count) and the first consumer both need this
      // frame — without the persist each one re-explodes the corpus
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocabSize = words0.count()
    if (vocabSize <= localGate) {
      // -------- local finish: exact same semantics, one driver loop ----
      val words1 = words0.as[(String, Long)].collect()
      words0.unpersist()
      var words = words1
      val out = Vector.newBuilder[Merge]
      var k = 0
      var continue = true
      while (k < nMerges && continue) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (s, c) =>
          val toks = s.split(' ')
          var i = 0
          while (i < toks.length - 1) {
            val key = (toks(i), toks(i + 1))
            counts.update(key, counts.getOrElse(key, 0L) + c)
            i += 1
          }
        }
        var best: ((String, String), Long) = null
        counts.foreach { case (p, c) =>
          if (best == null || c > best._2 ||
            (c == best._2 && {
              val ca = cpCompare(p._1, best._1._1)
              ca < 0 || (ca == 0 && cpCompare(p._2, best._1._2) < 0)
            })) best = (p, c)
        }
        if (best == null || best._2 < minCount) continue = false
        else {
          out += Merge(k, best._1._1, best._1._2, best._2)
          words = words.map { case (s, c) =>
            (applyMerge(s, best._1._1, best._1._2), c)
          }
          k += 1
        }
      }
      spark.createDataFrame(out.result()).toDF()
    } else {
      // -------- distributed rounds over the vocabulary table ----------
      var words = Checkpoints.truncate(words0)
      words0.unpersist()
      val out = Vector.newBuilder[Merge]
      var k = 0
      var continue = true
      while (k < nMerges && continue) {
        val top = words.as[(String, Long)]
          .flatMap { case (s, c) =>
            val toks = s.split(' ')
            (0 until toks.length - 1).map(i => (toks(i), toks(i + 1), c))
          }
          .toDF("a", "b", "c")
          .groupBy("a", "b").agg(sum("c").as("pc"))
          .orderBy(desc("pc"), asc("a"), asc("b"))
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        if (top.isEmpty || top(0)._3 < minCount) continue = false
        else {
          val (a, b, pc) = top(0)
          out += Merge(k, a, b, pc)
          words = words.as[(String, Long)]
            .map { case (s, c) => (applyMerge(s, a, b), c) }
            .toDF("syms", "cnt")
          words = Checkpoints.truncate(words)
          k += 1
        }
      }
      spark.createDataFrame(out.result()).toDF()
    }
  }
}
