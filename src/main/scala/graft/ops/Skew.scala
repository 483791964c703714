package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling (north_rule: "partitioning / shuffle / skew
 * handled explicitly"; north star: "salted repartitioning for skewed
 * hosts"). Web link/host keys are Zipfian — one popular host can own a
 * double-digit share of a crawl's link rows, so any per-host window,
 * per-host partition, or host-keyed join concentrates that share into a
 * single task. AQE's skew-join splitting is the backstop for sort-merge
 * joins; these operators cover what AQE cannot re-plan: window/top-k
 * over a hot key, pre-write partition balance, and hot-key joins whose
 * build side is too large to broadcast.
 *
 * All salts are DETERMINISTIC — `xxhash64` of an existing
 * roughly-unique column, never `rand()` — per the engine's determinism
 * discipline (same input ⇒ same plan ⇒ same bytes).
 */
object Skew {

  /** Deterministic salt in [0, S) derived from `fromCol` (xxhash64 of a
    * null row is the seed, so the salt is never null). */
  def saltCol(fromCol: String, S: Int): Column =
    pmod(xxhash64(col(fromCol)), lit(S.toLong)).cast("int")

  /** Salted repartition — the north-star phrase as code: rows of a hot
    * `keyCol` spread across up to S partitions instead of one, so
    * downstream per-partition work (mapPartitions extraction, file
    * writes) sees balanced input even when one host dominates. */
  def saltedRepartition(df: DataFrame, keyCol: String, fromCol: String,
                        S: Int, numPartitions: Int): DataFrame =
    df.withColumn("__salt", saltCol(fromCol, S))
      .repartition(numPartitions, col(keyCol), col("__salt"))
      .drop("__salt")

  /** EXACT top-k rows per key by (`ordCol` DESC, `tieCol` ASC),
    * skew-safe: stage 1 ranks within (key, salt) — a hot key's rows are
    * spread over S window partitions instead of one task — and keeps k
    * per (key, salt); stage 2 ranks the ≤ S·k survivors per key. Exact
    * because a global top-k row is necessarily in the top-k of its salt
    * slice. Input is pre-aggregated: one row per (key, tie), `ordCol`
    * already final. Emits the input columns + `rnk` (1-based). */
  def saltedTopKPerKey(df: DataFrame, keyCol: String, ordCol: String,
                       tieCol: String, k: Int, S: Int): DataFrame = {
    val w1 = Window.partitionBy(col(keyCol), col("__salt"))
      .orderBy(col(ordCol).desc, col(tieCol).asc)
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).desc, col(tieCol).asc)
    df.withColumn("__salt", saltCol(tieCol, S))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k)
      .drop("__salt", "__r1")
  }

  /** EXACT global running total (inclusive) of `valueCol` in `order` —
    * the scalable replacement for `Window.orderBy(...)` with no
    * partition key, whose WindowExec funnels EVERY row through one task
    * (the "No Partition Defined" warning; fine for a bounded histogram,
    * a silent scale killer anywhere else). Two-stage:
    *
    *   1. range-repartition by `order` into P partitions (P = the
    *      session's shuffle parallelism — scale-adaptive, never a local
    *      constant) and compute the running total WITHIN each partition
    *      (partitions are disjoint ordered ranges, so local order is
    *      global order);
    *   2. per-partition totals (≤ P tiny rows) get their own running
    *      offset — the only single-partition window left is over P rows,
    *      bounded by cluster configuration, not data — and broadcast-join
    *      back.
    *
    * Exact for any row set: range partitions are disjoint and ordered,
    * equal keys land in one partition, and AQE coalescing merges only
    * ADJACENT ranges, so partition ids stay monotone in `order`. Adds
    * `outCol`; `order` columns must be deterministic row expressions.
    *
    * Ties: rows with EQUAL `order` values get row-order-dependent
    * running totals (same as the window it replaces when peers are
    * distinct); callers needing peer-aggregated semantics (RANGE frames)
    * must make `order` unique. */
  def rangedRunningSum(df: DataFrame, order: Column, valueCol: Column,
                       outCol: String): DataFrame = {
    val p = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    // persisted: the running-total branch and the offsets branch must see
    // the SAME range boundaries and partition ids — two independent
    // physical plans would each sample their own boundaries (ReuseExchange
    // usually dedupes the identical exchange, but correctness must not
    // hang on an optimizer rule firing)
    val local = df.repartitionByRange(p, order)
      .withColumn("__rrs_pid", spark_partition_id())
      .withColumn("__rrs_val", valueCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cum = local.withColumn("__rrs_cum",
      sum(col("__rrs_val")).over(
        Window.partitionBy(col("__rrs_pid")).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = local.groupBy(col("__rrs_pid"))
      .agg(sum(col("__rrs_val")).as("__rrs_pt"))
      .withColumn("__rrs_off",
        coalesce(sum(col("__rrs_pt")).over(
          Window.orderBy(col("__rrs_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__rrs_pid"), col("__rrs_off"))
    cum.join(broadcast(offsets), Seq("__rrs_pid"))
      .withColumn(outCol, col("__rrs_off") + col("__rrs_cum"))
      .drop("__rrs_pid", "__rrs_val", "__rrs_cum", "__rrs_off")
  }

  /** Skew join for when the small side cannot broadcast: the small side
    * is replicated S× (one copy per salt value) and the big side salted
    * deterministically, so a hot key's probe rows spread over S reducers
    * instead of one. Exact for "inner" and "left_outer" (big side
    * preserved; every big row matches exactly the replica carrying its
    * salt). Output carries the big side's key column. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 fromCol: String, S: Int,
                 joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin is exact for inner/left_outer only, got $joinType")
    val saltedBig = big.withColumn("__salt", saltCol(fromCol, S))
    val replicated = small
      .withColumn("__salt", explode(array((0 until S).map(i => lit(i)): _*)))
    saltedBig.join(replicated,
        saltedBig(keyCol) === replicated(keyCol) &&
          saltedBig("__salt") === replicated("__salt"),
        joinType)
      .drop(replicated(keyCol))
      .drop(saltedBig("__salt")).drop(replicated("__salt"))
  }
}
