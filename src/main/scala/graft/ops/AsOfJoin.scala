package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — "which snapshot of this url was live at
 * time T?". The reference keeps a full per-url snapshot history
 * (`core/scraper.py:935-941` update_content stores every changed fetch;
 * `processing/diff_generator.py` diffs consecutive pairs), and the
 * natural relational read of that history is an as-of join: for each
 * probe row (key, probe_ts) return the LATEST snapshot row of the same
 * key with snap_ts <= probe_ts, or nulls when the probe precedes every
 * snapshot. Spark has no ASOF JOIN operator (DuckDB does; the oracle
 * uses an independent join+argmax derivation), so this composes one
 * from a union + running window:
 *
 *   - tag snapshot rows kind=0 and probe rows kind=1, union on
 *     (key, ts, kind),
 *   - per key, ordered by (ts, kind, tie), carry the last snapshot
 *     PAYLOAD STRUCT forward with `last(..., ignoreNulls = true)` over
 *     rows UNBOUNDED PRECEDING..CURRENT — the struct is non-null exactly
 *     on snapshot rows, so a probe row picks up the newest snapshot at
 *     or before its timestamp (kind 0 sorts before kind 1 at equal ts,
 *     which is what makes the join inclusive: a snapshot AT the probe
 *     instant is visible to it),
 *   - keep the probe rows.
 *
 * Ties among snapshots with identical (key, snap_ts) are broken by
 * `tieCol` ascending — the greatest tie value wins, deterministically.
 * Payload columns ride inside ONE struct so a legitimately-NULL payload
 * field never falls through to an older snapshot (per-column
 * `ignoreNulls` would).
 *
 * Scale shape at 10^12 snapshots: the naive formulation — inequality
 * join `s.ts <= p.ts` then per-probe argmax — explodes to
 * |snaps_k|·|probes_k| rows per key before the argmax prunes them; this
 * union form shuffles each input row exactly once on the key, the
 * window is a streaming running-`last` (no frame buffering — the frame
 * end is CURRENT ROW), and only (key, ts, kind, tie, payload struct)
 * moves. Per-key history lives in one task, which is the operator's
 * inherent order dependency; a key is a url here, and per-url history
 * depth is crawl-bounded (thousands), never Zipfian in the corpus sense.
 */
object AsOfJoin {

  /** @param probes   rows seeking a snapshot: `keyCol`, `probeTsCol`
    *                 (numeric/timestamp), plus `probeIdCol` carried through
    * @param snaps    snapshot history: `keyCol`, `snapTsCol`, `tieCol`,
    *                 plus `payloadCols` (emitted on the matched row)
    * @return one row per probe: (probeIdCol, keyCol, probeTsCol,
    *         snap_ts, payloadCols...) — snapshot side all-null when no
    *         snapshot is at or before the probe. */
  def asofJoin(probes: DataFrame, snaps: DataFrame,
               keyCol: String, probeIdCol: String, probeTsCol: String,
               snapTsCol: String, tieCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val payload = struct(
      (col(snapTsCol).as("snap_ts") +: payloadCols.map(col)): _*)
    val snapSide = snaps.select(
      col(keyCol).as("__key"),
      col(snapTsCol).as("__ts"),
      lit(0).as("__kind"),
      col(tieCol).cast("string").as("__tie"),
      lit(null).cast(probes.schema(probeIdCol).dataType).as("__probe_id"),
      payload.as("__snap"))
    // a genuinely NULL struct of the payload type — `struct(null, null)`
    // would be a NON-null struct with null fields, which `last(...,
    // ignoreNulls)` happily picks from the probe row itself
    val payloadType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "snap_ts", snaps.schema(snapTsCol).dataType) +:
        payloadCols.map(c => org.apache.spark.sql.types.StructField(
          c, snaps.schema(c).dataType)))
    val nullPayload = lit(null).cast(payloadType)
    val probeSide = probes.select(
      col(keyCol).as("__key"),
      col(probeTsCol).as("__ts"),
      lit(1).as("__kind"),
      lit("").as("__tie"),
      col(probeIdCol).as("__probe_id"),
      nullPayload.as("__snap"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__kind"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = snapSide.unionByName(probeSide)
      .withColumn("__live", last(col("__snap"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
    carried.select(
      (col("__probe_id").as(probeIdCol) +:
        col("__key").as(keyCol) +:
        col("__ts").as(probeTsCol) +:
        col("__live.snap_ts").as("snap_ts") +:
        payloadCols.map(c => col(s"__live.$c").as(c))): _*)
  }
}
