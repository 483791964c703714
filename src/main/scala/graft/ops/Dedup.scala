package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.textstats.TextAnalysis

/**
 * Distributed deduplication operators for training-data pipelines
 * (exact, MinHash+LSH, SimHash, n-gram Jaccard). All shuffle-conscious:
 *  - exact dedup: one hash-keyed shuffle of (hash, id) projections only;
 *  - MinHash LSH: docs × bands rows of (band_key, id, sig) — candidate
 *    pairs only ever materialize per LSH bucket (never the full n² cross
 *    join), so a 10^12-doc corpus stays at O(n·bands) shuffle volume;
 *  - skew guard: buckets larger than `maxBucket` are salted/truncated —
 *    a degenerate bucket (boilerplate shingle) would otherwise produce a
 *    quadratic straggler at scale.
 */
object Dedup {

  /** Exact dedup by content hash: keeps min(id) per md5(text); emits
    * (hash, keeper, n). Map-side partial agg → tiny shuffle. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n"))

  /** Ids to DROP under exact dedup (everything but the keeper). */
  def exactDropIds(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol)
      .select(col("h"), col("keeper"))
    docs.select(col(idCol).as("id"), md5(col(textCol)).as("h"))
      .join(keep, "h")
      .filter(col("id") =!= col("keeper"))
      .select(col("id"))
  }

  /** Per-doc MinHash signature + SimHash (typed map; one pass per doc). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   numPerm: Int = 64, shingleN: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val sig = TextAnalysis.minhash(text, shingleN, numPerm)
        (id, sig, TextAnalysis.simhash(text, shingleN),
          TextAnalysis.shingles(text, shingleN).distinct.size)
      })
      .toDF("id", "minhash", "simhash", "n_shingles")
  }

  /** MinHash-LSH candidate pairs (id_a < id_b) with estimated Jaccard from
    * signature agreement. `bands` controls the sim threshold (~(1/bands)^(1/rows)). */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        numPerm: Int = 64, bands: Int = 16,
                        shingleN: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = fingerprints(docs, idCol, textCol, numPerm, shingleN)
    val banded = fps.select($"id", $"minhash").as[(Long, Seq[Long])]
      .flatMap { case (id, sig) =>
        TextAnalysis.lshBands(sig.toArray, bands).zipWithIndex.map {
          case (bk, bi) => (bi.toLong << 56 | (bk & 0x00ffffffffffffffL), id, sig)
        }
      }.toDF("band_key", "id", "sig")
    // per-bucket pair generation; cap runaway buckets (skew guard)
    val pairs = banded.as[(Long, Long, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.take(maxBucket).toArray.sortBy(_._2)
        for {
          i <- members.indices.iterator
          j <- (i + 1) until members.length
        } yield {
          val (_, ida, siga) = members(i)
          val (_, idb, sigb) = members(j)
          val agree = siga.zip(sigb).count { case (x, y) => x == y }
          (ida, idb, agree.toDouble / siga.length)
        }
      }.toDF("id_a", "id_b", "est_jaccard")
    pairs.groupBy($"id_a", $"id_b").agg(max($"est_jaccard").as("est_jaccard"))
  }

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) <= maxHamming.
    * Scale path: multi-index blocking — the 64-bit simhash splits into 8
    * blocks of 8 bits; by pigeonhole any pair within hamming <= 7 shares at
    * least one identical block, so candidates come from 8 cheap equality
    * joins (never an n² cross join) and are then hamming-verified.
    * Block width trades recall vs bucket size: 8-bit blocks guarantee
    * hamming<=7 but cap at 256 buckets per block index, so at web scale use
    * wider blocks (4x16-bit: hamming<=3, 65k buckets) or recurse. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 7, shingleN: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = fingerprints(docs, idCol, textCol, 16, shingleN)
      .select($"id", $"simhash")
    val blocked = fps.as[(Long, Long)].flatMap { case (id, sh) =>
      (0 until 8).map(b => (b.toLong << 8 | ((sh >>> (b * 8)) & 0xffL), id, sh))
    }.toDF("block_key", "id", "simhash")
    val joined = blocked.as("a").join(blocked.as("b"),
        col("a.block_key") === col("b.block_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    joined.withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard for a candidate pair set: joins texts back by id
    * (broadcast when small) and verifies with the true set similarity. */
  def verifyJaccard(candidates: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    candidates
      .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("text_a"), col("text_b"))
      .as[(Long, Long, Double, String, String)]
      .map { case (a, b, est, ta, tb) =>
        (a, b, est, TextAnalysis.jaccard(ta, tb, shingleN))
      }.toDF("id_a", "id_b", "est_jaccard", "jaccard")
  }
}
