package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Faithful port of the reference's crawl-priority scoring
 * (`calculate_priority`, /root/reference/core/scraper.py:316-358,
 * `calculate_keyword_relevance` :352-358, `get_page_update_frequency`,
 * /root/reference/data/db_manager.py:64-88, and the ×1.5 pagination boost,
 * /root/reference/core/scraper_core.py:110-113) as pure Catalyst columns:
 *
 *   priority = 1.0
 *            + min(update_frequency / 10, 1) * 0.3     // factor 1
 *            + freshness * 0.3                         // factor 2
 *            + 1 / (1 + url_depth) * 0.2               // factor 3
 *            + min(keyword_hits / 4, 1) * 0.2          // factor 4
 *   priority *= 1.5 when is_pagination
 *
 * where update_frequency = count(updates in trailing 30 days) /
 * (fractional days since the latest such update + 1) — the SQLite
 * julianday arithmetic re-expressed over epoch seconds — and freshness =
 * 1 / (1 + seconds_since_last_modified / 86400), defaulting to 1 for
 * unseen content (`hash_info` miss).
 *
 * Everything is a projection + one per-url aggregate over the history —
 * no shuffle beyond the frequency groupBy, which map-side combines; at
 * 10^12 rows the history aggregate is the same shape as
 * q_update_frequency (key + two numbers).
 */
object Priority {

  /** calculate_keyword_relevance keyword list (scraper.py:354). */
  val Keywords: Seq[String] = Seq("important", "critical", "update", "new")

  private def epochD(c: Column): Column = unix_timestamp(c).cast("double")

  /** Per-url update frequency over a (url, last_updated) history as of
    * `asOfEpoch` (seconds): rows in the trailing 30 days, divided by
    * (fractional days since the newest of them + 1); urls with no recent
    * rows are absent (callers coalesce to 0 — db_manager.py:76-79). */
  def updateFrequency(history: DataFrame, asOfEpoch: Double): DataFrame =
    history
      .filter(epochD(col("last_updated")) > lit(asOfEpoch - 30.0 * 86400.0))
      .groupBy(col("url"))
      .agg(count(lit(1)).cast("double").as("update_count"),
        max(epochD(col("last_updated"))).as("last_e"))
      .select(col("url"),
        (col("update_count") /
          ((lit(asOfEpoch) - col("last_e")) / lit(86400.0) + lit(1.0)))
          .as("update_frequency"))

  /** 1 / (1 + depth); depth = len(urlparse(url).path.split('/')) - 1
    * (scraper.py:334-336). Spark `split` keeps trailing empties (limit -1),
    * matching Python's str.split. The path comes from the same LEXICAL
    * regex the DuckDB oracle uses — java.net.URI-backed parse_url returns
    * NULL for urls Python's urlparse still splits (spaces, stray chars),
    * which would over-prioritize exactly the malformed frontier urls. */
  def depthScore(urlCol: Column): Column = {
    val path = regexp_extract(urlCol,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    lit(1.0) / (lit(1.0) + (size(split(path, "/")) - lit(1)).cast("double"))
  }

  /** min(keyword substring hits / 4, 1) (scraper.py:352-358). */
  def relevanceScore(urlCol: Column): Column = {
    val hits = Keywords.map(k =>
      when(lower(urlCol).contains(k), 1).otherwise(0)).reduce(_ + _)
    least(hits.cast("double") / lit(Keywords.length.toDouble), lit(1.0))
  }

  /** 1/(1 + seconds_since/86400); 1.0 when last-modified unknown
    * (scraper.py:323-331 — new content gets the highest freshness). */
  def freshnessScore(lastModEpoch: Column, asOfEpoch: Double): Column =
    when(lastModEpoch.isNull, lit(1.0))
      .otherwise(lit(1.0) /
        (lit(1.0) + (lit(asOfEpoch) - lastModEpoch) / lit(86400.0)))

  /**
   * Score candidates: (url, is_pagination, last_modified_epoch nullable
   * double) against a (url, last_updated) history. Emits the factor
   * columns plus the combined priority, each rounded to 6 (the
   * determinism rule for oracle-compared doubles).
   */
  def scores(candidates: DataFrame, history: DataFrame,
             asOfEpoch: Double): DataFrame = {
    val joined = candidates
      .join(updateFrequency(history, asOfEpoch), Seq("url"), "left_outer")
      .withColumn("update_frequency", coalesce(col("update_frequency"), lit(0.0)))
    val freqScore = least(col("update_frequency") / lit(10.0), lit(1.0))
    val fresh = freshnessScore(col("last_modified_epoch"), asOfEpoch)
    val ds = depthScore(col("url"))
    val rs = relevanceScore(col("url"))
    val base = lit(1.0) + freqScore * lit(0.3) + fresh * lit(0.3) +
      ds * lit(0.2) + rs * lit(0.2)
    joined.select(col("url"), col("is_pagination"),
      round(col("update_frequency"), 6).as("update_frequency"),
      round(fresh, 6).as("freshness_score"),
      round(ds, 6).as("depth_score"),
      round(rs, 6).as("relevance_score"),
      round(when(col("is_pagination"), base * lit(1.5)).otherwise(base), 6)
        .as("priority"))
  }
}
