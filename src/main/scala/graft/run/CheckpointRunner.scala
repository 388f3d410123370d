package graft.run

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Validator
import graft.model.Checklist

/**
 * Partition-granular checkpointed validation runs (north_rule: "resumable
 * from checkpoint with per-partition lineage + metrics").
 *
 * The input table is processed one partition at a time (hive-style
 * partition column, e.g. `source` or a date). After a partition's outputs
 * commit, one manifest row is appended to the manifest table:
 *
 *   (run_id, partition, checklist_md5, n_rows, n_invalid, n_violations,
 *    started_at, finished_at, status)
 *
 * On restart, partitions that already have an 'ok' manifest row FOR THE
 * SAME checklist_md5 are skipped — so a killed job resumes where it
 * stopped, and a *changed checklist* invalidates prior work automatically.
 * Outputs are written with partition-directory overwrite, making re-runs
 * idempotent (no duplicated violation rows — risk register SURVEY.md §7.4).
 *
 * Each partition is ONE compute pass: manifest metrics ride the validated
 * write as CollectMetrics (`observe`) accumulators, and the violations
 * table derives from the already-written columnar output with a
 * pushed-down `passed = false` filter — no caching (a 100 TB partition
 * doesn't fit executor memory) and no validation recompute.
 *
 * This generalizes the reference's manifest identity (file MD5 + UUID,
 * Reader.pm:86-88 / Manifest.pm:219-224) into run-level lineage.
 */
object CheckpointRunner {

  final case class PartitionResult(
      partition: String, nRows: Long, nInvalid: Long, nViolations: Long,
      skipped: Boolean)

  final case class Config(
      inputPath: String,
      partitionCol: String,
      outputPath: String, // validated rows (partitioned)
      violationsPath: String, // exploded violation rows (partitioned)
      manifestPath: String, // lineage + metrics table
      rowIdCol: Option[String] = None,
      contentCol: Option[String] = None)

  /** Stable fingerprint of the checklist definition — the lineage key that
   * ties completed work to the exact constraint set that produced it. */
  def checklistMd5(checklist: Checklist): String =
    MessageDigest.getInstance("MD5")
      .digest(checklist.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def completedPartitions(spark: SparkSession, manifestPath: String,
      md5: String): Set[String] =
    try {
      spark.read.parquet(manifestPath)
        .filter(col("status") === "ok" && col("checklist_md5") === md5)
        .select("partition").distinct()
        .collect().map(_.getString(0)).toSet
    } catch { case _: Exception => Set.empty } // first run: no manifest yet

  /**
   * Partition values from FILESYSTEM METADATA when the input is laid out
   * hive-style on `partitionCol` (`.../col=value/`): one directory listing,
   * zero data read — the parquet stand-in for an Iceberg/catalog partition
   * listing. Falls back to a `distinct()` scan only for inputs that are not
   * physically partitioned on the column (where a scan is unavoidable).
   * Round 1 always ran the distinct() scan — a full pass over 100 TB just
   * to enumerate work units.
   */
  def discoverPartitions(spark: SparkSession, inputPath: String,
      partitionCol: String): Option[Seq[String]] = {
    val prefix = partitionCol + "="
    try {
      val p = new org.apache.hadoop.fs.Path(inputPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dirs = fs.listStatus(p).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .map(n => java.net.URLDecoder.decode(n.substring(prefix.length), "UTF-8"))
      if (dirs.nonEmpty) Some(dirs.sorted) else None
    } catch { case _: Exception => None }
  }

  def run(spark: SparkSession, checklist: Checklist, cfg: Config,
      runId: String = java.util.UUID.randomUUID().toString): Seq[PartitionResult] = {
    val md5 = checklistMd5(checklist)
    // Input resolution order mirrors the north_rule's table-format shape:
    // a snapshot-manifest table (graft.sources.SnapshotTable — the Iceberg
    // access pattern) plans partitions AND per-partition file sets from
    // pure metadata; plain hive-layout parquet falls back to directory
    // discovery, then to a distinct() scan.
    val isSnapshotTable =
      graft.sources.SnapshotTable.currentVersion(spark, cfg.inputPath).isDefined
    lazy val input = spark.read.parquet(cfg.inputPath)
    val partitions =
      if (isSnapshotTable) {
        val specCols = graft.sources.SnapshotTable
          .snapshot(spark, cfg.inputPath).partitionCols
        require(specCols.contains(cfg.partitionCol),
          s"partitionCol '${cfg.partitionCol}' is not a partition column of " +
            s"the snapshot table (spec: $specCols) — a typo here would " +
            "otherwise yield zero partitions and a silent no-op run")
        graft.sources.SnapshotTable.partitions(spark, cfg.inputPath)
          .flatMap(_.get(cfg.partitionCol)).distinct.sorted
      }
      else discoverPartitions(spark, cfg.inputPath, cfg.partitionCol)
        .getOrElse(input.select(cfg.partitionCol).distinct()
          .collect().map(_.get(0).toString).sorted.toSeq)
    val done = completedPartitions(spark, cfg.manifestPath, md5)

    partitions.map { p =>
      if (done.contains(p)) PartitionResult(p, 0, 0, 0, skipped = true)
      else {
        // snapshot tables prune the slice's FILE SET manifest-side; hive
        // layout pushes the partition filter down to the parquet scan
        val slice =
          if (isSnapshotTable)
            graft.sources.SnapshotTable.read(spark, cfg.inputPath,
              partitionFilter = Map(cfg.partitionCol -> p))
          else input.filter(col(cfg.partitionCol) === p)
        val (nRows, nInvalid, nViol) = validateSlice(spark, checklist,
          slice, p, s"${cfg.outputPath}/${cfg.partitionCol}=$p",
          s"${cfg.violationsPath}/${cfg.partitionCol}=$p",
          cfg.manifestPath, runId, md5, cfg.rowIdCol, cfg.contentCol)
        PartitionResult(p, nRows, nInvalid, nViol, skipped = false)
      }
    }.toSeq
  }

  /** ONE compute pass over a work unit (a partition or a snapshot delta),
   * shared by [[run]] and [[runIncremental]] so the metrics contract and
   * manifest schema live in a single place: metrics ride the validated
   * write as CollectMetrics (observe) accumulators — no second
   * aggregation job, nothing cached (a 100 TB slice cannot be pinned in
   * executor memory) — and violation rows derive from the just-written
   * columnar output with a pushed-down passed=false filter, so only the
   * invalid fraction is re-read, never recomputed. */
  private def validateSlice(spark: SparkSession, checklist: Checklist,
      slice: DataFrame, manifestKey: String, outDir: String,
      violationsDir: String, manifestPath: String, runId: String,
      md5: String, rowIdCol: Option[String],
      contentCol: Option[String]): (Long, Long, Long) = {
    val startedAt = java.time.Instant.now().toString
    val validated = Validator.validate(slice, checklist,
      Validator.Options(rowIdCol, contentCol))
    val obs = org.apache.spark.sql.Observation(
      s"graft_metrics_${manifestKey.replaceAll("[^A-Za-z0-9_.]", "_")}")
    validated.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(!col(Validator.PassedCol), 1)).as("n_invalid"),
      sum(size(col(Validator.ViolationsCol))).as("n_violations"))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val m = obs.get
    val nRows = m("n_rows").asInstanceOf[Long]
    val nInvalid = m("n_invalid").asInstanceOf[Long]
    val nViol = Option(m("n_violations")).fold(0L)(_.asInstanceOf[Long])
    Validator.violationRows(spark.read.parquet(outDir))
      .write.mode(SaveMode.Overwrite).parquet(violationsDir)
    appendManifestRow(spark, manifestPath, runId, manifestKey, md5,
      nRows, nInvalid, nViol, startedAt, "ok")
    (nRows, nInvalid, nViol)
  }

  final case class IncrementalResult(fromVersion: Long, toVersion: Long,
      nRows: Long, nInvalid: Long, nViolations: Long, skipped: Boolean)

  /**
   * INCREMENTAL validation over a snapshot-table delta — the
   * table-format-native companion to [[run]]: instead of re-validating
   * partitions, validate exactly the rows ADDED between two snapshot
   * versions ([[graft.sources.SnapshotTable.changesBetween]] — the
   * Iceberg incremental-append-scan shape), so a daily ingest validates
   * its delta, never the 100 TB table. Lineage rides the same manifest
   * table as [[run]] with the partition key `delta:v<from>..v<to>`: a
   * completed (delta, checklist_md5) pair skips on re-run, and a changed
   * checklist invalidates prior work automatically, exactly like the
   * partition runner. One compute pass (metrics ride the write as
   * `observe` accumulators); violation rows derive from the written
   * output with a pushed-down `passed = false` filter.
   */
  def runIncremental(spark: SparkSession, checklist: Checklist,
      tableRoot: String, fromVersion: Long, toVersion: Long,
      outputPath: String, violationsPath: String, manifestPath: String,
      rowIdCol: Option[String] = None, contentCol: Option[String] = None,
      runId: String = java.util.UUID.randomUUID().toString): IncrementalResult = {
    val md5 = checklistMd5(checklist)
    val key = s"delta:v$fromVersion..v$toVersion"
    if (completedPartitions(spark, manifestPath, md5).contains(key))
      return IncrementalResult(fromVersion, toVersion, 0, 0, 0, skipped = true)
    val delta = graft.sources.SnapshotTable.changesBetween(
      spark, tableRoot, fromVersion.toInt, toVersion.toInt)
    val (nRows, nInvalid, nViol) = validateSlice(spark, checklist, delta,
      key, s"$outputPath/delta=v${fromVersion}_v$toVersion",
      s"$violationsPath/delta=v${fromVersion}_v$toVersion",
      manifestPath, runId, md5, rowIdCol, contentCol)
    IncrementalResult(fromVersion, toVersion, nRows, nInvalid, nViol,
      skipped = false)
  }

  private def appendManifestRow(spark: SparkSession, path: String,
      runId: String, partition: String, md5: String, nRows: Long,
      nInvalid: Long, nViolations: Long, startedAt: String,
      status: String): Unit = {
    import spark.implicits._
    Seq((runId, partition, md5, nRows, nInvalid, nViolations,
      startedAt, java.time.Instant.now().toString, status))
      .toDF("run_id", "partition", "checklist_md5", "n_rows", "n_invalid",
        "n_violations", "started_at", "finished_at", "status")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)
  }
}
