package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/**
 * Streaming CDC ingest — the composition the merge-on-read primitives
 * exist for: a `foreachBatch` sink that turns each micro-batch of keyed
 * changes into an EQUALITY-DELETE commit ([[SnapshotTable.deleteByKeysMoR]],
 * zero table I/O) followed by an APPEND commit, which together are the
 * streaming MERGE — exactly Iceberg/Flink's upsert-write shape (equality
 * deletes retract the key's previous row, the new row appends; sequence
 * semantics make readers see only the newest).
 *
 * Exactly-once: `foreachBatch` replays a micro-batch after a crash, so
 * the sink records the last applied batch id in a sidecar under the
 * table's metadata directory and SKIPS batches it has already applied
 * (the standard transactional-sink idempotence pattern). A crash BETWEEN
 * the two commits replays both — harmless by construction: re-deleting
 * the same keys is a logical no-op, and the re-append reproduces the
 * same rows (content-level exactly-once; the sidecar keeps completed
 * batches from double-applying at all).
 *
 * Batch hygiene, in order:
 *  - `opCol` (optional): rows whose op value is in `deleteOps` are pure
 *    deletions — their keys join the equality delete, nothing appends;
 *  - `seqCol` (optional): several changes to one key inside a batch
 *    resolve to the row with the MAX sequence value (CDC log order);
 *    without it, multiple upserts per key in one batch fail fast
 *    (ambiguous — same rule as [[SnapshotTable.merge]]).
 *
 * The per-batch content is therefore equivalent to a batch
 * [[SnapshotTable.merge]] of the same resolved delta (minus the deletes,
 * which a batch pipeline would express as [[SnapshotTable.deleteByKeys]])
 * — RunnerSpec pins the equivalence over 3+ micro-batches.
 */
object CdcUpsert {

  final case class BatchResult(batchId: Long, skipped: Boolean,
      deleteVersion: Option[Int], appendVersion: Option[Int])

  /** A `(DataFrame, Long) => Unit` to hand to
   * `writeStream.foreachBatch`, closing over the table coordinates. */
  def sink(root: String, partitionCols: Seq[String], keyCols: Seq[String],
      seqCol: Option[String] = None, opCol: Option[String] = None,
      deleteOps: Set[String] = Set("D", "d", "delete")): (DataFrame, Long) => Unit =
    (batch, batchId) => { upsertBatch(batch, batchId, root, partitionCols,
      keyCols, seqCol, opCol, deleteOps); () }

  /** Apply one micro-batch; exposed for direct testing and for batch
   * backfills that want identical semantics. Returns what was committed. */
  def upsertBatch(batch: DataFrame, batchId: Long, root: String,
      partitionCols: Seq[String], keyCols: Seq[String],
      seqCol: Option[String] = None, opCol: Option[String] = None,
      deleteOps: Set[String] = Set("D", "d", "delete")): BatchResult = {
    require(keyCols.nonEmpty, "CDC upsert needs at least one key column")
    val spark = batch.sparkSession
    if (lastApplied(spark, root).exists(_ >= batchId))
      return BatchResult(batchId, skipped = true, None, None)

    // resolve multiple changes per key: max-seq row wins (CDC log order).
    // NULL-key rows are exempt — they never match anything (SQL equality,
    // the merge contract), so each is an independent insert, not a
    // contender in its key's resolution.
    val nonNullKeys = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val resolved = seqCol match {
      case Some(s) =>
        val w = batch.filter(nonNullKeys).withColumn("__rn",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*)
              .orderBy(col(s).desc)))
        w.filter(col("__rn") === 1).drop("__rn")
          .unionByName(batch.filter(!nonNullKeys))
      case None =>
        val dup = batch.filter(nonNullKeys)
          .groupBy(keyCols.map(col): _*).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"micro-batch $batchId has multiple changes for key " +
            s"${dup.headOption.map(_.toSeq.init.mkString("(", ", ", ")")).getOrElse("")} " +
            "— pass seqCol to resolve CDC order")
        batch
    }
    val (upserts0, allKeys) = opCol match {
      case Some(o) =>
        (resolved.filter(!col(o).isin(deleteOps.toSeq: _*)).drop(o),
          resolved.select(keyCols.map(col): _*))
      case None => (resolved, resolved.select(keyCols.map(col): _*))
    }
    val upserts = seqCol.filterNot(s => keyCols.contains(s))
      .map(upserts0.drop(_)).getOrElse(upserts0)

    val exists = SnapshotTable.currentVersion(spark, root).isDefined
    // retract every changed key's previous row — zero table I/O; a fresh
    // table (or an all-new-keys first batch) has nothing to retract
    val delV: Option[Int] =
      if (!exists) None
      else {
        val (snap, nKeys) = SnapshotTable.deleteByKeysMoR(
          allKeys.distinct(), root, keyCols)
        if (nKeys > 0) Some(snap.version) else None
      }
    // append the new row versions (pure-delete batches append nothing)
    val appV: Option[Int] =
      if (upserts.isEmpty) None
      else Some(SnapshotTable.commit(upserts, root, partitionCols,
        overwritePartitions = false).version)
    recordApplied(spark, root, batchId)
    BatchResult(batchId, skipped = false, delV, appV)
  }

  // --- batch-id sidecar (transactional-sink idempotence) ---------------------

  private def statePath(root: String) = new Path(root, "metadata/cdc_state.json")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest batch id already applied to `root`, if any. */
  def lastApplied(spark: SparkSession, root: String): Option[Long] = {
    val p = statePath(root)
    val f = fs(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val node = try new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(in) finally in.close()
    Some(node.get("lastBatchId").asLong())
  }

  private def recordApplied(spark: SparkSession, root: String,
      batchId: Long): Unit = {
    val p = statePath(root)
    val tmp = new Path(root, s"metadata/.cdc_state.json.tmp")
    val f = fs(spark, p)
    val out = f.create(tmp, true)
    try out.write(s"""{"lastBatchId": $batchId}""".getBytes("UTF-8"))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"atomic rename failed for $p")
  }
}
