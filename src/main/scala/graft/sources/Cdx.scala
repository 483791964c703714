package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * CDX(J) index-line parser — the Common Crawl lookup format ("urlkey
 * timestamp {json}") that tells a fetch-less pipeline WHERE in which
 * .warc.gz each capture lives. Together with the WARC record-offset
 * index ([[Warc]]) this completes the CC workflow: query the index,
 * prune to (filename, offset, length) ranges, read only those records.
 *
 * Parsing is pure codegen'd Catalyst and defensive per the repo's ANSI
 * discipline (Spark 4 throws where 3.x returned null):
 *  - the 3-way split uses `get()` (null out-of-bounds), never
 *    `element_at` (ANSI-throws on short arrays from malformed lines);
 *  - the 14-digit timestamp goes through `try_to_timestamp` (garbage →
 *    NULL, not a dead job), emitted as epoch seconds so the oracle
 *    compares integers, not timezone renderings;
 *  - numeric JSON fields (CDX stores them as STRINGS) go through
 *    `try_cast` — a hostile index line cannot kill the scan;
 *  - a malformed JSON tail yields a NULL struct → NULL columns, row
 *    isolation identical to the extract pipeline's per-row discipline.
 *
 * Emits (urlkey, ts_unix, url, mime, status, digest, length, offset,
 * filename) — one row per input line.
 */
object Cdx {

  /** The JSON tail schema — all strings, as CDX actually ships them. */
  val JsonSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType), StructField("digest", StringType),
    StructField("length", StringType), StructField("offset", StringType),
    StructField("filename", StringType)))

  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val parts: Column = split(col(lineCol), " ", 3)
    lines
      .select(get(parts, lit(0)).as("urlkey"), get(parts, lit(1)).as("__ts"),
        from_json(get(parts, lit(2)), JsonSchema).as("__r"))
      .select(col("urlkey"),
        unix_timestamp(try_to_timestamp(col("__ts"),
          lit("yyyyMMddHHmmss"))).as("ts_unix"),
        col("__r.url").as("url"), col("__r.mime").as("mime"),
        expr("try_cast(__r.status AS INT)").as("status"),
        col("__r.digest").as("digest"),
        expr("try_cast(__r.length AS BIGINT)").as("length"),
        expr("try_cast(__r.offset AS BIGINT)").as("offset"),
        col("__r.filename").as("filename"))
  }

  /** The fetch plan a pruned re-extraction runs: successful HTML captures
    * only, grouped per archive file, offsets sorted for sequential reads. */
  def fetchRanges(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("status") === 200 && col("mime") === "text/html" &&
        col("filename").isNotNull && col("offset").isNotNull &&
        col("length").isNotNull)
      .select(col("filename"), col("offset"), col("length"), col("url"))
}
