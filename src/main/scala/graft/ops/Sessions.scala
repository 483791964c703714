package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Inactivity-gap sessionization over an event stream — the classic
 * clickstream rollup (a gap longer than `gapSeconds` between consecutive
 * events of one user starts a new session), and the batch twin of the
 * reference's per-run visit grouping (each scheduled crawl run groups
 * its fetches into one logical "visit"; `core/scraper_core.py` run loop).
 *
 * Built to hold at the design point:
 *   - ONE row shuffle, on the user key; both windows and the final
 *     rollup share the (user_id) / (user_id, session_seq) prefix so
 *     Catalyst plans a single Exchange and sorts once,
 *   - the gap test and the session counter are streaming window
 *     functions (lag + running sum) — no per-user buffering beyond the
 *     sort spill, no driver participation,
 *   - timestamps compare as exact MICROSECOND longs (`unix_micros` /
 *     DuckDB `epoch_us`) — no double epochs, no truncation drift between
 *     engines,
 *   - per-user event-time ties break on the unique event id, so the
 *     session numbering is deterministic under any input order.
 *
 * Emits one row per (user, session): start/end micros, event count,
 * distinct event types, and the first/last event ids under the
 * (ts, event_id) order.
 */
object Sessions {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, typeCol: String,
                 gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col("__us"), col(idCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      // NTZ inputs cast through LTZ (wall-clock read in the session tz;
      // the verify harness pins UTC, matching DuckDB's naive epoch_us)
      .select(col(userCol), col(idCol), col(typeCol),
        unix_micros(col(tsCol).cast("timestamp_ltz")).as("__us"))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(byUser) >
          lit(gapSeconds * 1000000L), 1L).otherwise(0L))
      // lag over the first row is NULL: NULL > gap is NULL → otherwise(0),
      // so the first session of every user is seq 0 via the running sum
      .withColumn("session_seq", sum(col("__new")).over(running))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col(typeCol)).as("n_types"),
        min_by(col(idCol), struct(col("__us"), col(idCol)))
          .as("first_event_id"),
        max_by(col(idCol), struct(col("__us"), col(idCol)))
          .as("last_event_id"))
  }
}
