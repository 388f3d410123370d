package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The one-call corpus→training-shards pipeline — the end-to-end
 * composition a pretraining data job actually runs, in the order the
 * 100 TB economics dictate (cheap row-local gates first, corpus-wide
 * shuffles only on what survives):
 *
 *   1. curate   — quality/repetition gates, URL blocklist, PII scrub,
 *                 benchmark decontamination, line dedup
 *                 ([[Curation.curateCorpus]])
 *   2. dedup    — exact fingerprint pass, then MinHash-LSH near-dup
 *                 clusters, min-id survivors ([[Dedup.dedupCorpus]])
 *   3. split    — deterministic hash train/val/test labels
 *                 ([[Sampling.hashSplit]]; append-stable, so tomorrow's
 *                 delta lands in the same splits)
 *   4. pack     — concatenate-and-chunk into fixed token budgets per
 *                 (split, shard) group ([[Sampling.packSequences]];
 *                 shard = content hash, so layout is deterministic and
 *                 pack parallelism = splits × shards)
 *
 * Every stage is individually oracle-verified; this module pins the
 * WIRING (stage order, the lineage cut between the expensive gate/dedup
 * prefix and the two consumers of its result, and the shard-key
 * contract). Output: one row per surviving document — all its input
 * columns plus `split`, `shard`, `n_tokens` and the packer's
 * `chunk_first`/`chunk_last`/`chunk_offset`, everything a shard writer
 * needs to emit packed sequences.
 *
 * `bench` is the PRE-SHINGLED benchmark frame
 * ([[Curation.benchmarkShingles]]) — shingle once, decontaminate many
 * corpora against it.
 */
object TrainingPipeline {

  def prepare(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3,
      blocklist: Seq[String] = Nil,
      bench: Option[DataFrame] = None,
      estJaccard: Double = 0.8,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      packBudget: Int = 2048,
      packShards: Int = 64,
      lineDedup: Boolean = true): DataFrame = {
    require(packShards > 0, "packShards must be positive")
    val curated = Curation.curateCorpus(df, idCol, textCol,
      minQuality = minQuality, blocklist = blocklist, bench = bench,
      lineDedup = lineDedup)
    val deduped = Dedup.dedupCorpus(curated, idCol, textCol, estJaccard)
    // One lineage cut after the expensive prefix: the packer's window and
    // the final text join both consume this frame, and nothing upstream
    // should run twice (the curateCorpus precedent, lazy materialization).
    val labeled = Sampling.hashSplit(deduped, idCol, splits)
      .withColumn("shard",
        pmod(xxhash64(col(idCol), lit(7L)), lit(packShards)).cast("int"))
      .withColumn("__n_tok", TextAnalysis.tokenCount(col(textCol)))
      .localCheckpoint(false)
    val packed = Sampling.packSequences(labeled, idCol, "__n_tok",
      Seq("split", "shard"), packBudget)
    labeled.drop("__n_tok")
      .join(packed.select(col(idCol), col("n_tokens"), col("chunk_first"),
        col("chunk_last"), col("chunk_offset")), Seq(idCol))
  }
}
