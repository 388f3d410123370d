package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Dedup

/**
 * Streaming MinHash-LSH near-dup detection — the streaming form of the
 * batch incremental shape ([[graft.ops.Dedup.minhashCandidatesAgainst]]
 * probing a stored [[graft.ops.Dedup.minhashIndex]]): documents arrive on
 * a stream, and every document is paired against everything the stream
 * has seen SO FAR that shares one of its LSH band buckets. One unified
 * semantics with batch: the SAME shingle hashes, signatures and band keys
 * (parameters must match), so a pipeline can bootstrap from a batch index
 * and keep deduplicating on the live stream.
 *
 * Shape: the per-row signature/band computation is the identical
 * shuffle-free projection the batch path uses (explode to (bucket, id,
 * sig) rows); the stateful part is `flatMapGroupsWithState` keyed on the
 * band bucket. State per bucket = the (id, sig) entries seen, CAPPED at
 * `maxBucketSize`: a bucket past the cap is non-discriminative (the
 * batch contract drops such index buckets) and is frozen — no further
 * pairs, no further growth, so state stays bounded per bucket. Total
 * state is O(docs x bands) entries across all buckets — the same size
 * as the batch index it replaces.
 *
 * CAP DIVERGENCE (inherent to streaming, stated rather than hidden): the
 * batch path drops an oversized bucket's pairs RETROACTIVELY — the
 * capped aggregate sees the final bucket size before any pair expands.
 * An append-mode stream cannot retract pairs it already emitted, so a
 * bucket that crosses the cap mid-stream keeps the pairs produced while
 * it was under the cap and freezes from then on. Below the cap the two
 * paths are set-identical (the RunnerSpec equivalence); a pipeline that
 * needs batch-identical candidates around degenerate buckets re-runs the
 * batch pass at compaction time — the standard streaming/batch
 * reconciliation contract.
 *
 * Within a micro-batch, rows pair in ascending-id order (deterministic:
 * a batch's later id pairs against its earlier ids exactly as if they
 * had arrived in separate batches). A pair sharing several band buckets
 * is emitted once per shared bucket — identical (new_id, old_id,
 * est_jaccard) rows; downstream consumers `dropDuplicates` (a streaming
 * dedup needs a watermark; the batch equivalence spec does it on the
 * collected sink).
 */
object StreamingNearDup {

  final case class BandRow(bucket: Long, id: Long, sig: Array[Long])
  final case class CandPair(new_id: Long, old_id: Long, est_jaccard: Double)
  final case class BucketState(ids: Array[Long], sigs: Array[Array[Long]],
      frozen: Boolean)

  /** Candidate near-dup pairs of each streamed document against the
   * stream's history (same band bucket). Works identically on a batch
   * frame (flatMapGroupsWithState in batch mode sees all groups once),
   * which is what the equivalence spec exercises. */
  def candidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 200): Dataset[CandPair] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val bandRows = docs
      .select(col(idCol).cast("long").as("id"),
        Dedup.shingleHashes(col(textCol), k).as("sh"))
      .select(col("id"), Dedup.minhashSignature(col("sh"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        explode(Dedup.bandKeys(col("sig"), bands, rowsPerBand)).as("bucket"))
      .as[BandRow](Encoders.product[BandRow])

    bandRows.groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(
            BucketState(Array.empty, Array.empty, frozen = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          // ascending-id order within the batch = deterministic arrival
          val batch = rows.toArray.sortBy(_.id)
          var ids = st.ids
          var sigs = st.sigs
          var frozen = st.frozen
          var i = 0
          while (i < batch.length && !frozen) {
            val r = batch(i)
            var j = 0
            while (j < ids.length) {
              if (ids(j) != r.id) {
                var agree = 0
                var h = 0
                val a = r.sig; val b = sigs(j)
                while (h < a.length) { if (a(h) == b(h)) agree += 1; h += 1 }
                out += CandPair(r.id, ids(j), agree.toDouble / numHashes)
              }
              j += 1
            }
            if (ids.length >= maxBucketSize) {
              // non-discriminative bucket: freeze — matches the batch
              // contract of dropping oversized index buckets
              frozen = true
            } else {
              ids = ids :+ r.id
              sigs = sigs :+ r.sig
            }
            i += 1
          }
          state.update(BucketState(ids, sigs, frozen))
          out.iterator
      }(Encoders.product[BucketState], Encoders.product[CandPair])
  }
}
