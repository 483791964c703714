package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lexical retrieval over the corpus — the inverted-index primitive behind
 * retrieval-based decontamination ("which training docs answer this eval
 * question?"), targeted corpus audits, and search-style quality probes.
 * BM25 scoring (Robertson–Spärck Jones), with one deliberate variant: the
 * IDF keeps its RATIONAL core ((N - df + 0.5) / (df + 0.5)) instead of
 * wrapping it in a log. Rationale: every arithmetic node is then a single
 * IEEE-754 +,-,*,/ — all correctly rounded and therefore bit-identical
 * across engines with the same expression tree — where log is
 * library-dependent (java.lang.Math vs libm) and would make an exact
 * cross-engine oracle impossible. Per-query ranking is unchanged for
 * single-term queries (log is monotone) and near-identical in practice
 * for short queries; the variant is pinned in the scaladoc and the oracle
 * recomputes it node-for-node.
 *
 * Per-term contributions are quantized to BIGINT (floor(x · 2^20)) before
 * summing, so the per-doc score is an ORDER-INDEPENDENT integer sum — no
 * float-accumulation nondeterminism across partitionings (the
 * temperatureSample precedent).
 *
 * Scale shape at the design point:
 *   - term frequencies: one explode + map-side-combinable agg; the
 *     per-doc length rides a doc-keyed window, never a self-join,
 *   - query terms and their document frequencies broadcast (a query set
 *     is human-sized); the corpus-sized tf table is the probe side of a
 *     broadcast hash join — the full document-frequency table is never
 *     shuffled against it,
 *   - the global (N, total-token) scalar broadcasts,
 *   - top-k per query runs the exact salted two-stage top-k
 *     ([[Skew.saltedTopKPerKey]]) — a query matching half the corpus
 *     never funnels through one task.
 */
object Retrieval {

  /** @param queries (query_id, terms); terms are matched post-lowercase.
    * Emits (query_id, doc_id, score, rnk) — top `k` docs per query by
    * (score DESC, doc_id ASC). Scores are the quantized-integer BM25
    * described above. */
  /** Shared index statistics: (term frequencies + per-doc lengths,
    * document frequencies, the global (N, total-tokens) scalar). */
  private def termStats(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(coalesce(col(textCol), lit(""))), "\\s+"))
          .as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tfdl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // global scalar DERIVED FROM tf (n = docs with ≥1 token, tt = Σtf =
    // total tokens — arithmetically identical to aggregating the raw
    // token explode): all three branches now share the one tf exchange
    // subtree, which AQE's stage reuse materializes once — the previous
    // toks-level aggregate re-tokenized the whole corpus for two numbers
    val g = tf.agg(countDistinct(col("doc_id")).as("n"),
      sum(col("tf")).as("tt"))
    (tfdl, dfq, g)
  }

  /** The rational IDF shared by both scorers (scaladoc above). */
  private def rationalIdf(nD: org.apache.spark.sql.Column,
                          dfD: org.apache.spark.sql.Column) =
    ((nD - dfD) + lit(0.5)) / (dfD + lit(0.5))

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, Seq[String])], k: Int = 10,
               salt: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (tfdl, dfq, g) = termStats(docs, idCol, textCol)
    val qdf = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val qd = broadcast(broadcast(qdf).join(dfq, Seq("term")))
    // every node below mirrors the oracle SQL exactly: same tree, same
    // parenthesization, float literals only where exactly representable
    // or correctly rounded identically by both parsers (1.2, 0.75, 0.5)
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("tt").cast("double") / nD
    val idf = rationalIdf(nD, dfD)
    val tfs = (tfD * (lit(1.2) + lit(1.0))) /
      (tfD + lit(1.2) * ((lit(1.0) - lit(0.75)) + (lit(0.75) * dlD) / avgdl))
    val contrib = floor((idf * tfs) * lit(1048576.0)).cast("long")
    val scored = tfdl.join(qd, Seq("term"))
      .crossJoin(broadcast(g))
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
    Skew.saltedTopKPerKey(scored, "query_id", "score", "doc_id",
        k = k, S = salt)
      .select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
  }

  /** Per-doc TF-IDF keyword extraction — the tagging/topical-audit twin
    * of [[bm25TopK]]: every doc's `m` highest-scoring terms under
    * tf · rational-IDF, quantized to BIGINT with the same 2^20 grid so
    * the ranking is integer-exact and the oracle re-derives it. The
    * per-doc ranking window is SAFE without salting: its partition is
    * one document's distinct terms — bounded by doc length, not corpus
    * size (unlike a per-query ranking, where one key can match half the
    * corpus). Emits (idCol, keywords, top_score) with keywords the
    * '|'-joined top-m terms in (score DESC, term ASC) order. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    m: Int = 3): DataFrame = {
    val (tfdl, dfq, g) = termStats(docs, idCol, textCol)
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val q = floor((tfD * rationalIdf(nD, dfD)) * lit(1048576.0)).cast("long")
    // df is needed for EVERY term here (not a query slice), so the
    // term-keyed join is a real shuffle join — both sides are already
    // (term)-keyed aggregates of the same scan; only the scalar broadcasts
    val ranked = tfdl
      .join(dfq, Seq("term"))
      .crossJoin(broadcast(g))
      .select(col("doc_id"), col("term"), q.as("q"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("q").desc, col("term").asc)))
      .filter(col("rnk") <= m)
    ranked.groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(
            collect_list(struct(col("rnk"), col("term")))),
          s => s("term")), "|").as("keywords"),
        max(when(col("rnk") === 1, col("q"))).as("top_score"))
      .select(col("doc_id").as(idCol), col("keywords"), col("top_score"))
  }
}
