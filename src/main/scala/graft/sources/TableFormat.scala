package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The table-format seam: the narrow surface the engine needs from a
 * snapshot-isolated, partition-pruned, incrementally-scannable table —
 * exactly what Apache Iceberg provides and what [[SnapshotTable]]
 * reproduces in-sandbox (no Iceberg jars ship here). Everything in the
 * engine that touches table state (CheckpointRunner's partition
 * discovery and idempotent re-commits, incremental validation over a
 * snapshot delta) should reach the table through this trait, so an
 * Iceberg DataSourceV2 binding is a drop-in when the jars exist.
 *
 * Iceberg mapping (the drop-in implementation, documented so the binding
 * is mechanical):
 *
 *  - `root`                 ↔ the table identifier (`catalog.db.tbl`);
 *    the string stays opaque to callers either way.
 *  - `currentVersion`       ↔ `table.currentSnapshot().snapshotId()`.
 *  - `commit(overwritePartitions = true)`
 *                           ↔ `df.writeTo(t).overwritePartitions()`
 *    (dynamic partition overwrite); `false` ↔ `df.writeTo(t).append()`.
 *    Both return the new snapshot id.
 *  - `read(version = Some(v))`
 *                           ↔ `spark.read.option("snapshot-id", v)
 *    .table(t)` / SQL `VERSION AS OF v` (time travel);
 *    `partitionFilter` ↔ an ordinary `.filter` on the partition columns —
 *    Iceberg prunes manifests the way [[SnapshotTable.read]] prunes its
 *    file list.
 *  - `changesBetween(a, b)` ↔ the incremental append scan
 *    (`option("start-snapshot-id", a).option("end-snapshot-id", b)`);
 *    in both implementations a row-level rewrite re-delivers the
 *    rewritten survivors (at-least-once), never a retraction.
 *  - `partitions`           ↔ the `t.partitions` metadata table.
 *  - `deleteWhere`          ↔ SQL `DELETE FROM t WHERE p` on a
 *    copy-on-write table (`write.delete.mode=copy-on-write`).
 *  - `merge`                ↔ SQL `MERGE INTO t USING delta ON <keys>
 *    WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *`.
 *
 * Maintenance lives beside the trait, not on it (Iceberg ships these as
 * Spark procedures, not table reads/writes): [[SnapshotTable.compact]]
 * ↔ `CALL rewrite_data_files(strategy => 'binpack')` and
 * [[SnapshotTable.expireSnapshots]] ↔ `CALL expire_snapshots(...)`.
 * Incremental scans skip `replace` snapshots in both implementations.
 *
 * Version ids are Long (Iceberg snapshot ids are 64-bit; [[SnapshotTable]]
 * versions are small ints widened losslessly).
 */
trait TableFormat {

  /** Current committed snapshot id, or None for an uninitialized table. */
  def currentVersion(spark: SparkSession, root: String): Option[Long]

  /** Commit `df` as a new snapshot; returns the new snapshot id.
   * `overwritePartitions = true` = dynamic partition overwrite (replace
   * every partition value present in `df`), `false` = append.
   * `statsCols` records per-file min/max bounds for those columns in the
   * manifest (Iceberg writers collect these automatically; the in-sandbox
   * implementation runs one aggregate over the commit's own delta).
   * `bloomCols` records a per-file Bloom filter for those columns — the
   * point-lookup complement to range stats (Iceberg mapping: the
   * `write.parquet.bloom-filter-enabled.column.<c>` table property; both
   * in-sandbox bindings record it in their own metadata layer). Both
   * specs are INHERITED by later commits that don't re-spell them. */
  def commit(df: DataFrame, root: String, partitionCols: Seq[String],
      overwritePartitions: Boolean = true,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Long

  /** Scan the table at `version` (None = current), pruned MANIFEST-SIDE
   * to the partitions matching `partitionFilter` and (when per-file
   * column stats were committed) to the files whose [min,max] bounds
   * intersect every `rangeFilter` interval — Iceberg's manifest-stats
   * data skipping, which an Iceberg binding gets from an ordinary
   * `.filter` pushdown; the explicit map keeps the in-sandbox
   * implementation honest about WHAT got skipped. Callers still apply
   * the row-level residual filter.
   * `keyEquals` is the point-lookup complement for bloom-indexed columns
   * (see [[commit]]'s `bloomCols`): files whose per-file Bloom says the
   * value is DEFINITELY absent are skipped before any I/O — the pruning
   * a high-cardinality identity column's [min,max] can never provide.
   * Same contract as `rangeFilter`: pruning only, row predicate still
   * the caller's; a Bloom "maybe" is not a match. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None,
      partitionFilter: Map[String, String] = Map.empty,
      rangeFilter: Map[String, (String, String)] = Map.empty,
      keyEquals: Map[String, String] = Map.empty): DataFrame

  /** Rows ADDED between the two snapshot ids (incremental append scan);
   * `from == to` yields an empty frame with the table schema. */
  def changesBetween(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): DataFrame

  /** Row-level CHANGELOG over `(from, to]` — Iceberg's changelog scan
   * (`CALL create_changelog_view(...)`) / Delta's Change Data Feed
   * (`readChangeFeed`): table rows tagged `_change_type` ("insert" |
   * "delete") and `_commit_version` (long). The cross-format contract,
   * conformance-pinned, is the REPLAY INVARIANT: for every version v in
   * the interval, multiset(state v) == multiset(state v-1) − deletes(v)
   * + inserts(v). Merge-on-read delete commits are row-exact in both
   * in-sandbox bindings; a copy-on-write rewrite MAY report at
   * whole-file granularity (a surviving row as a delete+insert pair —
   * Iceberg's non-net contract; the full-state binding reports net
   * diffs), so consumers must not assume netness, only the invariant.
   * `from == to` yields an empty frame with the changelog schema. */
  def changelogBetween(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): DataFrame

  /** Distinct partition values of a snapshot, from pure metadata. */
  def partitions(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[Map[String, String]]

  /** Copy-on-write row-level DELETE: drop every row where `predicate`
   * is TRUE (NULL keeps the row — SQL DELETE semantics), rewriting only
   * the files that contain a match; `partitionFilter` bounds the
   * candidate scan manifest-side. Returns the new snapshot id and the
   * deleted-row count; a predicate matching nothing commits nothing. */
  def deleteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long)

  /** Copy-on-write key-based upsert: delta rows whose `keyCols` match a
   * table row replace it, the rest insert. Ambiguous deltas (several
   * rows per non-NULL key) fail fast; NULL key components never match.
   * The delta must carry exactly the table's columns. Returns the new
   * snapshot id. */
  def merge(delta: DataFrame, root: String, keyCols: Seq[String]): Long

  /** MERGE-ON-READ row-level DELETE — Iceberg v2 position deletes
   * (`write.delete.mode=merge-on-read` / `DELETE FROM` under a v2 spec):
   * doomed (file, position) pairs are written as position-delete files
   * and applied by readers, rewriting NO data files — the only delete
   * shape that scales when scattered rows are deleted across very many
   * large files. Same predicate semantics as [[deleteWhere]]. Returns
   * the new snapshot id and the deleted-row count. */
  def deleteWhereMoR(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long)

  /** MERGE-ON-READ key-based DELETE — Iceberg v2 EQUALITY deletes, the
   * streaming-CDC ingest primitive: commits with ZERO table I/O (the
   * key tuples become an equality-delete file), applying to every data
   * file whose sequence precedes the delete so later re-inserts of the
   * same key survive. Returns the new snapshot id and the distinct key
   * count (matched rows are unknowable without a scan — metadata row
   * counts fail loud until materialization). */
  def deleteByKeysMoR(keys: DataFrame, root: String,
      keyCols: Seq[String]): (Long, Long)

  /** Fold pending position AND equality deletes into the data —
   * Iceberg's `rewrite_position_delete_files` + data-file rewrite
   * maintenance that caps merge-on-read read amplification. Rewrites
   * only the targeted data files; logical content unchanged (a replace
   * snapshot). Returns the resulting snapshot id (unchanged when
   * nothing is pending). */
  def materializeDeletes(spark: SparkSession, root: String): Long

  /** Iceberg's `files` METADATA TABLE (`SELECT * FROM t.files`): one row
   * per file the snapshot at `version` (None = current) REFERENCES —
   * data files plus any pending merge-on-read delete files — with the
   * cross-format schema [[TableFormat.filesTableSchema]]. This is how
   * maintenance planners pick compaction candidates (small-file skew,
   * delete-file amplification) WITHOUT listing the filesystem or
   * scanning data: the manifest binding answers from pure manifest
   * metadata; the full-state binding from its version directory plus
   * parquet FOOTERS (metadata pages only, never data I/O).
   * `record_count` is NULL where the format cannot know it without a
   * scan (e.g. per-file splits of a multi-file position-delete commit);
   * `lower_bounds`/`upper_bounds` carry the committed per-file column
   * stats (empty maps when none were committed). */
  def filesTable(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame

  /** Iceberg's `snapshots` + `history` METADATA TABLE: one row per LIVE
   * (unexpired) version, ascending, with the cross-format schema
   * [[TableFormat.snapshotsTableSchema]]. `operation` is the snapshot-
   * summary kind ("write" | "delete" | "merge" | "replace");
   * `record_count`/`total_data_bytes` are the PHYSICAL data-file sums
   * (pre-delete-application — pending MoR deletes show up as
   * `delete_file_count`, not as a lower record_count, exactly as in
   * Iceberg's summary counts). */
  def snapshotsTable(spark: SparkSession, root: String): DataFrame
}

object TableFormat {
  import org.apache.spark.sql.types._

  /** Cross-format schema of [[TableFormat.filesTable]], conformance-pinned.
   * `content` ∈ {"data", "position-deletes", "equality-deletes"} —
   * Iceberg's file-content kinds (the full-state binding's full-row
   * tombstones are equality deletes on every column). */
  val filesTableSchema: StructType = StructType(Seq(
    StructField("content", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("partition", MapType(StringType, StringType,
      valueContainsNull = false), nullable = false),
    StructField("record_count", LongType, nullable = true),
    StructField("file_size_in_bytes", LongType, nullable = true),
    StructField("lower_bounds", MapType(StringType, StringType,
      valueContainsNull = false), nullable = false),
    StructField("upper_bounds", MapType(StringType, StringType,
      valueContainsNull = false), nullable = false)))

  /** Cross-format schema of [[TableFormat.snapshotsTable]], conformance-
   * pinned. */
  val snapshotsTableSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("data_file_count", LongType, nullable = false),
    StructField("delete_file_count", LongType, nullable = false),
    StructField("record_count", LongType, nullable = true),
    StructField("total_data_bytes", LongType, nullable = true),
    StructField("is_current", BooleanType, nullable = false)))
}

/** [[SnapshotTable]] bound to the [[TableFormat]] seam — the in-sandbox
 * implementation; behavior is byte-identical to calling the object
 * directly (the conformance spec pins it). */
object SnapshotTableFormat extends TableFormat {

  override def currentVersion(spark: SparkSession, root: String): Option[Long] =
    SnapshotTable.currentVersion(spark, root).map(_.toLong)

  override def commit(df: DataFrame, root: String, partitionCols: Seq[String],
      overwritePartitions: Boolean = true,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Long =
    SnapshotTable.commit(df, root, partitionCols, overwritePartitions, statsCols,
      bloomCols = bloomCols).version.toLong

  override def read(spark: SparkSession, root: String,
      version: Option[Long] = None,
      partitionFilter: Map[String, String] = Map.empty,
      rangeFilter: Map[String, (String, String)] = Map.empty,
      keyEquals: Map[String, String] = Map.empty): DataFrame =
    SnapshotTable.read(spark, root, version.map(_.toInt), partitionFilter,
      rangeFilter, keyEquals)

  override def changesBetween(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    SnapshotTable.changesBetween(spark, root, fromVersion.toInt, toVersion.toInt)

  override def changelogBetween(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    SnapshotTable.changelogBetween(spark, root, fromVersion.toInt, toVersion.toInt)
      .withColumn("_commit_version",
        org.apache.spark.sql.functions.col("_commit_version").cast("long"))

  override def partitions(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[Map[String, String]] =
    SnapshotTable.partitions(spark, root, version.map(_.toInt))

  override def deleteWhere(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long) = {
    val (snap, n) = SnapshotTable.deleteWhere(spark, root, predicate, partitionFilter)
    (snap.version.toLong, n)
  }

  override def merge(delta: DataFrame, root: String,
      keyCols: Seq[String]): Long =
    SnapshotTable.merge(delta, root, keyCols).version.toLong

  override def deleteWhereMoR(spark: SparkSession, root: String,
      predicate: org.apache.spark.sql.Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long) = {
    val (snap, n) = SnapshotTable.deleteWhereMoR(spark, root, predicate, partitionFilter)
    (snap.version.toLong, n)
  }

  override def deleteByKeysMoR(keys: DataFrame, root: String,
      keyCols: Seq[String]): (Long, Long) = {
    val (snap, n) = SnapshotTable.deleteByKeysMoR(keys, root, keyCols)
    (snap.version.toLong, n)
  }

  override def materializeDeletes(spark: SparkSession, root: String): Long =
    SnapshotTable.materializeDeletes(spark, root).version.toLong

  override def filesTable(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame =
    SnapshotTable.filesTable(spark, root, version.map(_.toInt))

  override def snapshotsTable(spark: SparkSession, root: String): DataFrame =
    SnapshotTable.snapshotsTable(spark, root)
}
