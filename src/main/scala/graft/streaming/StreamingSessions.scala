package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the inactivity-gap sessionizer
 * ([[graft.ops.Sessions.sessionize]]): events arrive as micro-batches and
 * a user's session is emitted exactly once — either the moment a
 * later in-stream event proves the gap (its timestamp exceeds
 * session end + gap), or when the WATERMARK passes that point and the
 * event-time timeout fires (`flatMapGroupsWithState` +
 * `GroupStateTimeout.EventTimeTimeout`), whichever comes first. The
 * batch operator's semantics are held exactly on in-order data:
 * same strict-gap split, same per-user 0-based session numbering (state
 * carries the next sequence number), same (ts, event_id) tie-breaks for
 * the first/last ids.
 *
 * Divergence surface, stated plainly: events later than the watermark
 * delay can be dropped by the engine before they reach the state
 * function, and an out-of-order event that arrives before its session's
 * timeout MERGES into the open session (extending it backwards if
 * needed) where the batch operator — seeing all data — might have placed
 * it differently relative to a gap boundary. With a watermark delay at
 * least the gap and in-order producers, stream output is SET-EQUAL to
 * the batch rollup (pinned by StreamingSessionsSpec).
 *
 * State per user: one open session (start/end micros, counts, the
 * distinct-type set — bounded by the event-type vocabulary) plus the
 * session counter; closed sessions leave only the 16-byte counter
 * residue. At corpus scale run the RocksDB state store, the same
 * deployment note as every stateful op in this package.
 */
object StreamingSessions {

  final case class OpenSession(seq: Long, startUs: Long, endUs: Long,
                               n: Long, types: Set[String],
                               firstId: Long, lastId: Long)
  final case class UserState(nextSeq: Long, open: Option[OpenSession])
  final case class SessionOut(user_id: Long, session_seq: Long,
                              start_us: Long, end_us: Long, n_events: Long,
                              n_types: Long, first_event_id: Long,
                              last_event_id: Long)

  private def close(user: Long, o: OpenSession): SessionOut =
    SessionOut(user, o.seq, o.startUs, o.endUs, o.n, o.types.size.toLong,
      o.firstId, o.lastId)

  /** @param watermarkDelay how long to wait for stragglers before a
    *                       session can time out; at least the gap for
    *                       batch parity on in-order data. */
  def sessionizeStream(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       gapSeconds: Long = 1800L,
                       watermarkDelay: String = "30 minutes")
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    // the WATERMARKED attribute must reach the stateful operator's input
    // untouched (a unix_micros projection would strip the event-time tag
    // and fail the EventTimeTimeout analysis check), so the timestamp
    // rides through typed and micros are derived inside the function
    val typed = events
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("timestamp_ltz").as("ts"),
        col(idCol).cast("long").as("id"), col(typeCol).as("typ"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long, String)]
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rowsTs: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[UserState]) => {
          val rows = rowsTs.map { case (u, t, id, typ) =>
            (u, micros(t), id, typ) }
          val st = state.getOption.getOrElse(UserState(0L, None))
          if (state.hasTimedOut) {
            val out = st.open.map(close(user, _)).toList
            state.update(UserState(st.nextSeq, None))
            out.iterator
          } else {
            // batch-order independence within the micro-batch: replay in
            // event-time order with the id tie-break, like the batch sort
            val evs = rows.map { case (_, us, id, typ) => (us, id, typ) }
              .toArray.sortBy(e => (e._1, e._2))
            var open = st.open
            var next = st.nextSeq
            val closed = List.newBuilder[SessionOut]
            evs.foreach { case (us, id, typ) =>
              open match {
                case Some(o) if us - o.endUs > gapUs =>
                  closed += close(user, o)
                  open = Some(OpenSession(next, us, us, 1L, Set(typ), id, id))
                  next += 1
                case Some(o) =>
                  open = Some(o.copy(
                    startUs = math.min(o.startUs, us),
                    endUs = math.max(o.endUs, us),
                    n = o.n + 1,
                    types = o.types + typ,
                    firstId = if (us < o.startUs ||
                      (us == o.startUs && id < o.firstId)) id else o.firstId,
                    lastId = if (us > o.endUs ||
                      (us == o.endUs && id > o.lastId)) id else o.lastId))
                case None =>
                  open = Some(OpenSession(next, us, us, 1L, Set(typ), id, id))
                  next += 1
              }
            }
            state.update(UserState(next, open))
            open.foreach { o =>
              // fire once the watermark proves no event can extend the
              // session; never set a timeout at/behind the watermark
              // (the engine rejects it — an almost-expired session fires
              // on the very next batch instead)
              val closeMs = (o.endUs + gapUs) / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(closeMs, state.getCurrentWatermarkMs + 1L))
            }
            closed.result().iterator
          }
        })
  }
}
