package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch successor of the reference's DynamicRateLimiter + worker pool
 * (/root/reference/core/rate_limiter.py:11-48 — delay bounds 0.5–5 s,
 * initial 3 s; /root/reference/core/scraper_core.py:149-156 — 5 workers,
 * one host never fetched concurrently because each url is fetched by
 * exactly one thread holding its own WebDriver): at corpus scale the
 * politeness constraint becomes a PLAN computed up front, not a runtime
 * limiter guarding a shared queue.
 */
object Frontier {

  /**
   * Assign every frontier url a worker and a fetch wave:
   *
   *  - `worker` = md5-mod of the HOST (the engine-portable md5 sharding
   *    idiom shared with `TrainingData.shardAssignments`): ALL of a
   *    host's urls land on one worker, so no two workers ever hit the
   *    same host — the politeness invariant holds by construction, with
   *    zero fetch-time coordination.
   *  - `fetch_seq` = dense rank of the url within its host by
   *    (priority DESC, url) — the reference's priority-queue pop order
   *    (core/scraper_core.py:118-125), made deterministic by the url
   *    tie-break.
   *  - `est_start_ms` = (fetch_seq − 1) × delay, exact BIGINT millis;
   *    `delayMs` is clamped to DynamicRateLimiter's [500, 5000] bounds
   *    exactly as its `adjust_delay` clamps every runtime update.
   *
   * Scale note: the per-host window is the irreducible part — politeness
   * SERIALIZES a host by definition, so a 10^6-url host costs one sorted
   * task here but 10^6 × delay at fetch time; the planning skew is
   * strictly dominated by the schedule it emits. Only
   * (url, host, priority) tuples shuffle — never payloads. Urls whose
   * host cannot be parsed keep a NULL host (one group, NULL worker) so
   * malformed frontier rows stay visible instead of vanishing.
   *
   * frontier: (urlCol, priorityCol, ...). Returns
   * (url, host, worker, fetch_seq, est_start_ms).
   */
  def politenessSchedule(frontier: DataFrame, numWorkers: Int = 5,
                         delayMs: Long = 3000L,
                         urlCol: String = "url",
                         priorityCol: String = "priority_score"): DataFrame = {
    require(numWorkers > 0, s"numWorkers must be positive: $numWorkers")
    val d = math.min(math.max(delayMs, 500L), 5000L)
    val slim = frontier.select(col(urlCol).as("url"),
      col(priorityCol).as("__p"),
      // try_parse_url: ANSI-mode parse_url THROWS on malformed urls, and a
      // frontier of extracted links is untrusted input by definition
      expr(s"try_parse_url($urlCol, 'HOST')").as("host"))
    val worker = pmod(
      conv(substring(md5(concat(lit("host:"), col("host"))), 1, 8), 16, 10)
        .cast("long"),
      lit(numWorkers.toLong)).cast("int")
    slim
      .withColumn("fetch_seq", row_number().over(
        Window.partitionBy(col("host"))
          .orderBy(col("__p").desc, col("url"))))
      .select(col("url"), col("host"), worker.as("worker"), col("fetch_seq"),
        ((col("fetch_seq") - 1).cast("long") * lit(d)).as("est_start_ms"))
  }
}
