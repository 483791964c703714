package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of the portable HyperLogLog ([[graft.ops.Sketch]]) —
 * live per-group cardinality over an unbounded stream ("distinct urls
 * per host so far", "distinct docs per source this crawl") with state
 * bounded at m = 2^p ints per group regardless of stream length.
 *
 * The register max is associative, commutative, and idempotent, so the
 * answer after any prefix of the stream is EXACTLY the batch sketch of
 * the rows seen so far — micro-batch slicing, arrival order, retries and
 * replays (idempotence absorbs at-least-once delivery) cannot move a
 * single bit. StreamingSketchSpec pins this: the last update per group
 * is bitwise-equal to `Sketch.hllDistinct` over the union of all
 * batches, including the estimate double. Per-key hashing goes through
 * `Sketch.registerOf`, the JVM mirror of the Catalyst expression chain;
 * the summary goes through `Sketch.summarize`, the same pinned IEEE
 * order as the batch `hllEstimate`.
 *
 * Emits one [[StreamingSketch.SketchUpdate]] per group per micro-batch
 * that touched it (Update mode semantics).
 */
object StreamingSketch {

  case class SketchUpdate(group: String, m: Int, n_zero_registers: Int,
                          sum_fp: Long, estimate: Double)

  def distinctPerGroup(rows: DataFrame, groupCol: String, keyCol: String,
                       p: Int = 8): Dataset[SketchUpdate] = {
    require(p >= 4 && p <= 12, s"p in [4,12]: $p")
    val spark = rows.sparkSession
    import spark.implicits._
    val m = 1 << p
    rows
      .select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("k"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(
        (g: String, it: Iterator[(String, String)],
         state: GroupState[Array[Int]]) => {
          val regs = state.getOption.getOrElse(new Array[Int](m))
          it.foreach { case (_, k) =>
            if (k != null) {
              val (b, rho) = graft.ops.Sketch.registerOf(k, p)
              if (rho > regs(b)) regs(b) = rho
            }
          }
          state.update(regs)
          val (mm, zeros, sumFp, est) = graft.ops.Sketch.summarize(regs, p)
          SketchUpdate(g, mm, zeros, sumFp, est)
        })
  }

  /** Convenience writer (Update mode — one row per touched group per
    * batch; downstream keeps the latest per group). */
  def start(rows: DataFrame, groupCol: String, keyCol: String,
            queryName: String, p: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    distinctPerGroup(rows, groupCol, keyCol, p)
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
