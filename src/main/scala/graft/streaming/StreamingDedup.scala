package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.textstats.TextAnalysis

/**
 * Streaming face of the incremental MinHash-LSH near-dup detector
 * ([[graft.ops.Dedup.incrementalLshPairs]]): a continuous crawl feeds new
 * documents as micro-batches, and each batch's candidate pairs come back
 * without ever re-scanning the corpus — the band index the batch variant
 * persists to parquet lives HERE as keyed stream state instead.
 *
 * Shape: per doc, one MinHash signature (typed map, same
 * [[TextAnalysis.minhash]] as batch) fans out to `bands` band rows
 * carrying (band_key, id, sig); `flatMapGroupsWithState` keyed by
 * band_key holds up to `maxPerBand` (id, signature) entries and, per
 * micro-batch, pairs each NEW member against retained members — old–old
 * pairs were emitted when both arrived, so they are never regenerated
 * (the batch variant's new–new/new–old contract, held across time
 * instead of across an index join).
 *
 * Semantics pinned to the batch core ([[graft.ops.Dedup]] bucketPairs
 * family):
 *   - the retained set is the `maxPerBand` SMALLEST ids of
 *     state ∪ batch — the same deterministic skew guard, so a hot bucket
 *     (boilerplate shingle) can never grow state or pair volume without
 *     bound; pairs are generated among retained members only;
 *   - est_jaccard = signature agreement / numPerm rounded HALF_UP to 6,
 *     matching the batch column bit-for-bit;
 *   - a pair sharing several bands is emitted once per band (Append mode
 *     cannot retro-dedup across independent state groups); downstream
 *     exact-verify joins are idempotent, and the StreamingDedupSpec pins
 *     set-equality against the batch operator after cross-band dedup.
 *
 * State size: ≤ maxPerBand · (8 + 8·numPerm) bytes per live band_key
 * (~0.26 MB at the 32-perm/1000-member defaults) — at corpus scale run
 * the RocksDB state store so state spills off-heap, exactly like any
 * large mapGroupsWithState deployment. Ids must be unique across the
 * stream's lifetime (crawl doc ids are); a re-sent id is ignored as
 * already-indexed rather than re-paired.
 */
object StreamingDedup {

  final case class BandEntry(id: Long, sig: Array[Long])
  final case class BandState(entries: Array[BandEntry])
  final case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  private def est(a: Array[Long], b: Array[Long], numPerm: Int): Double = {
    var i = 0; var agree = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) agree += 1; i += 1 }
    // Spark's round() is HALF_UP — mirror it exactly for bit-parity with
    // the batch est_jaccard column
    BigDecimal(agree.toDouble / numPerm)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** @param docs streaming frame with `idCol` (castable to long) and
    *             `textCol`; parameters must match the batch index the
    *             stream conceptually continues (numPerm/bands/shingleN). */
  def candidatePairsStream(docs: DataFrame, idCol: String, textCol: String,
                           numPerm: Int = 32, bands: Int = 16,
                           shingleN: Int = 3,
                           maxPerBand: Int = 1000): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val bandRows = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = TextAnalysis.minhash(text, shingleN, numPerm)
        TextAnalysis.lshBands(sig, bands).zipWithIndex.map { case (bk, bi) =>
          (bi.toLong << 56 | (bk & 0x00ffffffffffffffL), id, sig)
        }
      }
    bandRows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (_: Long, rows: Iterator[(Long, Long, Array[Long])],
         state: GroupState[BandState]) => {
          val old = state.getOption.map(_.entries).getOrElse(Array.empty[BandEntry])
          val oldIds = old.iterator.map(_.id).toSet
          // batch-order independence: fresh members sort by id, re-sent
          // ids and intra-batch duplicates drop
          val fresh = rows.map { case (_, id, s) => BandEntry(id, s) }
            .filterNot(e => oldIds.contains(e.id))
            .toArray.distinctBy(_.id).sortBy(_.id)
          // retained set = smallest maxPerBand ids of state ∪ batch (the
          // deterministic skew guard of the batch bucketPairs core)
          val merged = (old ++ fresh).sortBy(_.id).take(maxPerBand)
          val keptIds = merged.iterator.map(_.id).toSet
          val keptOld = old.filter(e => keptIds(e.id))
          val keptNew = fresh.filter(e => keptIds(e.id))
          state.update(BandState(merged))
          keptNew.iterator.zipWithIndex.flatMap { case (nw, i) =>
            (keptOld.iterator ++ keptNew.iterator.take(i)).map { other =>
              val (lo, hi) = if (other.id < nw.id) (other, nw) else (nw, other)
              CandidatePair(lo.id, hi.id, est(lo.sig, hi.sig, numPerm))
            }
          }
        })
  }
}
