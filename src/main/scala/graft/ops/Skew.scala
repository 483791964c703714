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
