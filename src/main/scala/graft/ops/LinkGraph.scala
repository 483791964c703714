package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Relational link-graph operators (SURVEY §2.4/§2.5):
 *
 *  - `dedupToCanonical`: `<link rel=canonical>` resolution, 1 hop exactly
 *    (the reference re-validates once, core/scraper.py:830-836 + 385-388):
 *    a page whose canonical target EXISTS in the corpus is represented by
 *    the target; unknown targets keep the page itself.
 *  - `integrityReport`: closed-world link integrity
 *    (core/scraper.py:774-828): per destination host, total links, broken
 *    (target not in corpus), internal, and missing-anchor counts — the
 *    snapshot analog of status-code checks.
 */
object LinkGraph {

  /** urls: (url); meta: (url, canonical nullable). Output: (url, representative,
    * via_canonical). Equi-join + coalesce — broadcastable dims at any scale
    * when canonicals are sparse; AQE picks SMJ otherwise. */
  def dedupToCanonical(urls: DataFrame, meta: DataFrame): DataFrame = {
    val canon = meta.select(col("url").as("m_url"), col("canonical"))
      .filter(col("canonical").isNotNull && col("canonical") =!= col("m_url"))
    val known = urls.select(col("url").as("k_url"))
    urls.join(canon, urls("url") === col("m_url"), "left_outer")
      .join(known, col("canonical") === col("k_url"), "left_outer")
      .select(urls("url"),
        coalesce(col("k_url"), urls("url")).as("representative"),
        col("k_url").isNotNull.as("via_canonical"))
  }

  /** Representative groups: canonical targets absorb their aliases;
    * emits (representative, n_aliases). */
  def canonicalGroups(urls: DataFrame, meta: DataFrame): DataFrame =
    dedupToCanonical(urls, meta)
      .groupBy(col("representative"))
      .agg(count(lit(1)).as("n_aliases"),
        sum(when(col("via_canonical"), 1L).otherwise(0L)).as("n_canonicalized"))

  /**
   * links: (src_url, dst_url, kind, anchor); corpus: (url); anchors:
   * (url, anchor_id). Left joins against url + (url, anchor) projections —
   * never payloads; rollup per destination host.
   */
  def integrityReport(links: DataFrame, corpus: DataFrame,
                      anchors: DataFrame): DataFrame = {
    val known = corpus.select(col("url").as("t_url"))
    val anch = anchors.select(col("url").as("a_url"), col("anchor_id"))
    val joined = links
      .join(known, links("dst_url") === col("t_url"), "left_outer")
      .join(anch,
        links("dst_url") === col("a_url") && links("anchor") === col("anchor_id"),
        "left_outer")
      .select(
        expr("parse_url(dst_url, 'HOST')").as("dst_host"),
        col("kind"),
        col("t_url").isNotNull.as("target_exists"),
        (links("anchor") =!= lit("")).as("has_anchor"),
        col("a_url").isNotNull.as("anchor_exists"))
    joined.groupBy(col("dst_host"))
      .agg(count(lit(1)).as("total_links"),
        sum(when(!col("target_exists"), 1L).otherwise(0L)).as("broken"),
        sum(when(col("kind") === "pagination", 1L).otherwise(0L)).as("pagination"),
        sum(when(col("has_anchor") && col("target_exists") && !col("anchor_exists"), 1L)
          .otherwise(0L)).as("missing_anchors"))
  }
}
