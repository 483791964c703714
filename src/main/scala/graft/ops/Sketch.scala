package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic cardinality sketching — the distinct-count primitive a
 * 10^12-row corpus audit needs where exact `COUNT(DISTINCT text)` would
 * shuffle every distinct value: a HyperLogLog built from engine-portable
 * pieces (Flajolet–Furic–Gandouet–Meunier 2007), NOT Spark's built-in
 * `approx_count_distinct` — the built-in's xxhash/HLL++ register layout
 * is engine-private, so no other system can reproduce its answer. This
 * sketch is bit-for-bit reproducible anywhere with md5:
 *
 *   - 60-bit hash = first 15 hex chars of md5(key) (15, not 16: 16 hex
 *     chars overflow a signed BIGINT and Spark 4's ANSI cast throws);
 *   - bucket = top `p` bits, rho = leading-zero count of the remaining
 *     f = 60-p bits + 1 (computed EXACTLY as f+1 - length(bin(w)), the
 *     no-leading-zeros `bin` trick the degree-histogram oracle proved
 *     identical across engines; w=0 caps at f+1);
 *   - registers = max(rho) per bucket — a map-side-combinable agg over
 *     an (int,int) projection, the ONLY shuffle, m=2^p rows out;
 *   - the indicator sum Σ 2^-reg is kept in FIXED POINT: integer terms
 *     2^(f+1-reg) summed as BIGINT (order-independent, so identical on
 *     any partitioning — a float Σ in unspecified order is not), worst
 *     case m·2^(f+1) = 2^(p+f+1) = 2^61 < 2^63;
 *   - estimate = α_m·m²·2^(f+1) / Σ_fp with α_m = 0.7213/(1+1.079/m),
 *     every factor exactly representable or correctly rounded, in a
 *     pinned left-associative order — so Spark and the DuckDB oracle
 *     produce the IDENTICAL double (the q_hll_distinct gate hashes it).
 *
 * The standard small-range linear-counting correction is deliberately
 * omitted (it needs `ln`, and transcendentals are the one libm surface
 * this repo's cross-engine float-parity discipline excludes); callers in
 * the small-n regime have exact counting available by definition. Emits
 * ONE row: (m, n_zero_registers, sum_fp, estimate).
 */
object Sketch {

  /** The occupied-register frame (bucket, reg) — the sketch's
    * MATERIALIZED form: m rows max, mergeable by [[hllMerge]], persisted
    * per shard/snapshot and combined later without re-reading data (the
    * property that makes HLL the right tool at 10^12 rows: each shard
    * ships ≤ m ints, and union-of-sketches ≡ sketch-of-union). */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p in [4,12]: $p")
    val f = 60 - p
    val v = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = v.bitwiseAND(lit((1L << f) - 1L))
    val rho = when(w === 0L, lit(f + 1))
      .otherwise(lit(f + 1) - length(bin(w)))
    df.select(shiftright(v, f).cast("int").as("bucket"),
        rho.cast("int").as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
  }

  /** Merge partial sketches: per-bucket register MAX — associative,
    * commutative, idempotent, so any shard/snapshot partition of the
    * data merges to EXACTLY the whole-corpus sketch (spec + oracle-pinned
    * by q_hll_merge: two half-corpus sketches re-estimate bitwise-equal
    * to q_hll_distinct's answer). */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "hllMerge needs at least one sketch")
    sketches.map(_.select(col("bucket"), col("reg")))
      .reduce(_.unionAll(_))
      .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
  }

  /** Summarize a register frame into (m, n_zero_registers, sum_fp,
    * estimate) — α_m·m²·2^(f+1) over the fixed-point indicator sum,
    * arithmetic shared verbatim with the q_hll_distinct oracle. */
  def hllEstimate(regs: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p in [4,12]: $p")
    val m = 1 << p
    val f = 60 - p
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val num = alpha * lit((m.toLong * m).toDouble) *
      lit(math.pow(2.0, (f + 1).toDouble))
    regs
      .agg(count(lit(1)).as("__present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${f + 1} - reg)"))
          .as("__sump"))
      .select(lit(m).as("m"),
        (lit(m) - col("__present")).cast("int").as("n_zero_registers"),
        (coalesce(col("__sump"), lit(0L)) +
          (lit(m.toLong) - col("__present")) * lit(1L << (f + 1)))
          .cast("long").as("sum_fp"))
      .withColumn("estimate", num / col("sum_fp").cast("double"))
  }

  /** One-shot sketch: registers → estimate. */
  def hllDistinct(df: DataFrame, keyCol: String, p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, keyCol, p), p)

  /** JVM mirror of the column path's (bucket, rho) for one key — the
    * streaming state function uses this; parity with the Catalyst
    * expression chain is pinned twice (SketchSpec's independent local
    * model, StreamingSketchSpec's bitwise batch-identity). */
  private[graft] def registerOf(key: String, p: Int): (Int, Int) = {
    val f = 60 - p
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)
    val v = java.lang.Long.parseLong(hex, 16)
    val w = v & ((1L << f) - 1L)
    val rho =
      if (w == 0L) f + 1
      else f + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    ((v >>> f).toInt, rho)
  }

  /** Summary arithmetic over a full register array (zeros included) —
    * the same pinned left-associative IEEE order as [[hllEstimate]]. */
  private[graft] def summarize(regs: Array[Int], p: Int)
      : (Int, Int, Long, Double) = {
    val m = 1 << p
    val f = 60 - p
    var sumFp = 0L
    var zeros = 0
    regs.foreach { r => sumFp += 1L << (f + 1 - r); if (r == 0) zeros += 1 }
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val num = alpha * (m.toLong * m).toDouble *
      math.pow(2.0, (f + 1).toDouble)
    (m, zeros, sumFp, num / sumFp.toDouble)
  }
}
