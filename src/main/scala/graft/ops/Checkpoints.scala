package graft.ops

import org.apache.spark.sql.Dataset

/**
 * Lineage truncation for the iterative operators (PageRank, connected
 * components, BPE training): each round's frame must become a LEAF of
 * the next round's plan — `persist` alone keeps the full lineage tree,
 * which compounds per iteration (the un-truncated 3-iteration PageRank
 * plan audited at 1031 exchange nodes).
 *
 * Two materialization modes behind one conf switch:
 *  - default: eager `localCheckpoint` — executor-local blocks, no
 *    filesystem round-trip, right for local mode and short jobs; an
 *    executor loss forfeits the blocks and fails the job;
 *  - `spark.graft.checkpointDir` set: eager reliable `checkpoint` into
 *    that directory (HDFS/object store on a cluster), so a long
 *    closure/PageRank/BPE run survives executor loss — the standard
 *    production trade (one write+read of the iteration frame per round
 *    buys fault tolerance for multi-hour iterations on 1000 executors).
 *
 * Both modes produce the SAME plan shape — a materialized RDD leaf
 * (spec-asserted in CheckpointsSpec) — so the choice never changes a
 * query plan, only where the bytes live.
 */
object Checkpoints {

  /** Session conf key; when set, iterative ops checkpoint reliably. */
  val ConfKey = "spark.graft.checkpointDir"

  /** Materialize `ds` and truncate its lineage, per [[ConfKey]]. */
  def truncate[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set once
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint(eager = true)
      case None =>
        ds.localCheckpoint(eager = true)
    }
  }
}
