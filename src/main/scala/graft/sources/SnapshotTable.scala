package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Snapshot-manifest table layer — the Iceberg ACCESS PATTERN with no
 * Iceberg dependency (this sandbox ships no Iceberg jars; the north_rule
 * input is "an Iceberg table of source-code repositories"). What is
 * reproduced is exactly the set of behaviors that matter for planning at
 * 10^12 files:
 *
 *  - **Metadata-driven scans**: the file list comes from a versioned
 *    manifest document, never from recursive directory listing — at
 *    10^12 files the object-store LIST call is the scan-planning
 *    bottleneck, which is the core reason table formats exist.
 *  - **File-level data skipping**: `commit(statsCols = ...)` records
 *    per-file min/max column bounds in the manifest (ONE aggregate over
 *    the commit's own delta — the Iceberg manifest-stats shape), and
 *    `read(rangeFilter = ...)` drops every file whose [min,max] interval
 *    misses the requested range before Spark plans a byte of I/O. The
 *    residual row-level predicate stays the caller's ordinary `.filter`
 *    (which parquet pushdown then applies within surviving files).
 *  - **Manifest-side partition pruning**: a partition predicate prunes
 *    whole FILES out of the scan before Spark ever sees a path
 *    (complementing parquet footer/row-group pruning below it). The
 *    pruned set is observable via `DataFrame.inputFiles` and pinned by
 *    spec.
 *  - **Snapshot isolation / time travel**: every commit writes data files
 *    into a fresh immutable snapshot directory, publishes `vN.json`, and
 *    atomically flips `version-hint.text`. Readers resolve the hint (or
 *    pin an explicit version) and then read only immutable state — a
 *    concurrent writer can never expose a half-written table, and any
 *    historical snapshot stays readable.
 *
 * Layout (mirrors Iceberg's metadata tree one level flatter):
 * {{{
 *   <root>/data/s<N>/<part>=.../...parquet   immutable data files
 *   <root>/metadata/v<N>.json                snapshot manifest
 *   <root>/metadata/version-hint.text        current-version pointer
 * }}}
 *
 * JSON rides Spark's own Jackson (no new dependency). Cited reference
 * behavior: the reference records per-file identity (MD5 + UUID,
 * Manifest.pm:219-224) — here generalized to per-snapshot lineage.
 */
object SnapshotTable {

  final case class FileEntry(path: String, partition: Map[String, String],
      rows: Long, bytes: Long,
      stats: Map[String, (String, String)] = Map.empty)

  final case class Snapshot(version: Int, partitionCols: Seq[String],
      files: Seq[FileEntry],
      statsKinds: Map[String, String] = Map.empty)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Inverse of Hive-style partition-path escaping: pure %XX unescape.
   * NOT URLDecoder — that would also turn '+' into a space, corrupting
   * values like "c++" that Hive never escapes on the way out. */
  private[sources] def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) | lo).toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --- manifest I/O --------------------------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def writeManifest(spark: SparkSession, root: String, s: Snapshot): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    val pc = node.putArray("partitionCols")
    s.partitionCols.foreach(pc.add)
    if (s.statsKinds.nonEmpty) {
      val kn = node.putObject("statsKinds")
      s.statsKinds.foreach { case (k, v) => kn.put(k, v) }
    }
    val fl = node.putArray("files")
    s.files.foreach { f =>
      val fn = fl.addObject()
      fn.put("path", f.path)
      fn.put("rows", f.rows)
      fn.put("bytes", f.bytes)
      val pn = fn.putObject("partition")
      f.partition.foreach { case (k, v) => pn.put(k, v) }
      if (f.stats.nonEmpty) {
        val sn = fn.putObject("stats")
        f.stats.foreach { case (c, (lo, hi)) =>
          val cn = sn.putObject(c); cn.put("min", lo); cn.put("max", hi)
        }
      }
    }
    val dir = new Path(root, "metadata")
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".v${s.version}.json.tmp")
    val out = f.create(tmp, true)
    out.write(mapper.writeValueAsBytes(node)); out.close()
    val manifest = new Path(dir, s"v${s.version}.json")
    require(f.rename(tmp, manifest),
      s"manifest rename failed: $tmp -> $manifest (stale file from a crashed commit? remove it first)")
    // atomic pointer flip: write-then-rename with OVERWRITE via
    // FileContext — FileSystem.rename returns false when the target
    // exists, and delete-then-rename would expose a window where a
    // concurrent reader sees NO hint at all (violating the isolation
    // contract this layer exists to provide)
    val hintTmp = new Path(dir, ".version-hint.tmp")
    val ho = f.create(hintTmp, true)
    ho.write(s.version.toString.getBytes("UTF-8")); ho.close()
    val hint = new Path(dir, "version-hint.text")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dir.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(hintTmp, hint, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def currentVersion(spark: SparkSession, root: String): Option[Int] = {
    val hint = new Path(root, "metadata/version-hint.text")
    val f = fs(spark, hint)
    if (!f.exists(hint)) None
    else {
      val in = f.open(hint)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  def snapshot(spark: SparkSession, root: String, version: Option[Int] = None): Snapshot = {
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val p = new Path(root, s"metadata/v$v.json")
    val f = fs(spark, p)
    require(f.exists(p), s"snapshot v$v does not exist under $root")
    val in = f.open(p)
    val node = try mapper.readTree(in) finally in.close()
    val pcols = (0 until node.get("partitionCols").size())
      .map(node.get("partitionCols").get(_).asText())
    val kinds = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (node.has("statsKinds")) {
      val it = node.get("statsKinds").fields()
      while (it.hasNext) { val e = it.next(); kinds(e.getKey) = e.getValue.asText() }
    }
    val files = (0 until node.get("files").size()).map { i =>
      val fn = node.get("files").get(i)
      val part = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val it = fn.get("partition").fields()
      while (it.hasNext) { val e = it.next(); part(e.getKey) = e.getValue.asText() }
      val stats = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
      if (fn.has("stats")) {
        val si = fn.get("stats").fields()
        while (si.hasNext) {
          val e = si.next()
          stats(e.getKey) = (e.getValue.get("min").asText(),
            e.getValue.get("max").asText())
        }
      }
      FileEntry(fn.get("path").asText(), part.toMap,
        fn.get("rows").asLong(), fn.get("bytes").asLong(), stats.toMap)
    }
    Snapshot(v, pcols, files, kinds.toMap)
  }

  // --- commit --------------------------------------------------------------

  /**
   * Commit `df` as a new snapshot. `overwritePartitions = true` replaces
   * the manifest entries of every partition value present in `df` (the
   * Iceberg dynamic-overwrite shape CheckpointRunner's idempotent re-runs
   * need); `false` appends files to existing partitions. Data files land
   * in an immutable per-snapshot directory, so every previous snapshot
   * remains fully readable (time travel) until an explicit GC.
   *
   * The commit-time file enumeration walks ONLY the freshly written
   * `data/s<N>` subtree — bounded by this commit's output, exactly like a
   * table-format writer tracking the files it just wrote; readers never
   * list anything.
   */
  def commit(df: DataFrame, root: String, partitionCols: Seq[String],
      overwritePartitions: Boolean = true,
      statsCols: Seq[String] = Seq.empty): Snapshot = {
    require(partitionCols.nonEmpty, "snapshot tables are partitioned")
    val spark = df.sparkSession
    statsCols.foreach { c =>
      require(!partitionCols.contains(c),
        s"stats column '$c' is a partition column — partition pruning already covers it")
      require(df.columns.contains(c), s"stats column '$c' not in the frame")
    }
    val kinds: Map[String, String] = statsCols.map { c =>
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => c -> "long"
        case StringType => c -> "string"
        case dt => throw new IllegalArgumentException(
          s"stats column '$c' must be integral or string, got ${dt.simpleString}")
      }
    }.toMap
    val prev = currentVersion(spark, root).map(v => snapshot(spark, root, Some(v)))
    prev.foreach { s =>
      require(s.partitionCols == partitionCols,
        s"partition spec mismatch: table has ${s.partitionCols}, got $partitionCols")
      require(s.statsKinds.isEmpty || statsCols.isEmpty ||
        s.statsKinds == kinds,
        s"stats spec mismatch: table has ${s.statsKinds}, got $kinds")
    }
    val version = prev.map(_.version + 1).getOrElse(1)
    val dataDir = s"$root/data/s$version"
    df.write.partitionBy(partitionCols: _*).parquet(dataDir)

    // enumerate ONLY the new snapshot subtree
    val base = new Path(dataDir)
    val f = fs(spark, base)
    val newFiles = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    def walk(p: Path, part: Map[String, String]): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val kv = name.split("=", 2)
          val nextPart =
            if (kv.length == 2) part + (kv(0) -> unescapePathName(kv(1)))
            else part
          walk(st.getPath, nextPart)
        } else if (name.endsWith(".parquet")) {
          newFiles += FileEntry(st.getPath.toString, part, -1L, st.getLen)
        }
      }
    walk(base, Map.empty)

    // per-file column bounds (the Iceberg manifest min/max): ONE aggregate
    // pass over the freshly written delta keyed on the file-path metadata
    // column — bounded by this commit's own output, never the table. Keyed
    // by the path RELATIVE to the snapshot tree (partition dirs + name):
    // the bare file name is NOT unique under a dynamic-partition write
    // (one task writing two partitions emits part-00000-<uuid> in BOTH
    // dirs — the same job UUID, a per-directory counter), and merging
    // those two files' bounds would silently widen every interval.
    val statted: Seq[FileEntry] = if (statsCols.isEmpty) newFiles.toSeq else {
      import org.apache.spark.sql.functions.{col, max, min, regexp_extract}
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
      val relMarker = s"/data/s$version/"
      def rel(p: String): String = {
        val i = p.indexOf(relMarker)
        require(i >= 0, s"file $p is not under the snapshot tree $relMarker")
        p.substring(i + relMarker.length)
      }
      val byRel = spark.read.parquet(dataDir)
        .groupBy(regexp_extract(col("_metadata.file_path"),
          java.util.regex.Pattern.quote(relMarker) + "(.*)$", 1).as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          r.getString(0) -> statsCols.flatMap { c =>
            val lo = r.getAs[String](s"__min_$c")
            val hi = r.getAs[String](s"__max_$c")
            if (lo == null || hi == null) None else Some(c -> ((lo, hi)))
          }.toMap
        }.toMap
      newFiles.toSeq.map { fe =>
        fe.copy(stats = byRel.getOrElse(rel(fe.path), Map.empty))
      }
    }

    val overwritten: Set[Map[String, String]] =
      if (overwritePartitions) newFiles.map(_.partition).toSet else Set.empty
    val carried = prev.map(_.files.filterNot(fe => overwritten.contains(fe.partition)))
      .getOrElse(Seq.empty)
    val snap = Snapshot(version, partitionCols, carried ++ statted,
      if (statsCols.nonEmpty) kinds
      else prev.map(_.statsKinds).getOrElse(Map.empty))
    writeManifest(spark, root, snap)
    snap
  }

  // --- read ----------------------------------------------------------------

  /**
   * Plan a scan from the manifest: resolve the snapshot (current or
   * pinned), prune files by the partition predicate MANIFEST-SIDE, and
   * hand Spark exactly the surviving file paths (`basePath` per snapshot
   * subtree reattaches partition columns). No directory listing happens on
   * the read path; an empty survivor set still returns the right schema.
   */
  def read(spark: SparkSession, root: String, version: Option[Int] = None,
      partitionFilter: Map[String, String] = Map.empty,
      rangeFilter: Map[String, (String, String)] = Map.empty): DataFrame = {
    val snap = snapshot(spark, root, version)
    rangeFilter.keys.foreach(c => require(snap.statsKinds.contains(c),
      s"no committed stats for column '$c' (statsKinds: ${snap.statsKinds.keySet})"))
    val survivors = snap.files.filter(fe =>
      partitionFilter.forall { case (k, v) => fe.partition.get(k).contains(v) } &&
        rangeFilter.forall { case (c, (lo, hi)) =>
          fe.stats.get(c) match {
            case None => true // no bounds recorded for this file: keep
            case Some((fLo, fHi)) => snap.statsKinds(c) match {
              case "long" => !(fHi.toLong < lo.toLong || fLo.toLong > hi.toLong)
              case _ => !(fHi < lo || fLo > hi)
            }
          }
        })
    if (survivors.isEmpty) {
      // schema from any file of the snapshot, filtered to no rows
      val any = snap.files.headOption.getOrElse(
        throw new IllegalStateException("empty snapshot"))
      val df = sliceRead(spark, Seq(any))
      return df.filter(org.apache.spark.sql.functions.lit(false))
    }
    sliceRead(spark, survivors)
  }

  /** Group surviving files by snapshot subtree (= basePath) and union —
   * files from different snapshots carry different base directories. */
  private def sliceRead(spark: SparkSession, files: Seq[FileEntry]): DataFrame = {
    val bySnapDir = files.groupBy(fe => fe.path.replaceAll("(/data/s\\d+)/.*$", "$1"))
    bySnapDir.map { case (basePath, fes) =>
      spark.read.option("basePath", basePath).parquet(fes.map(_.path): _*)
    }.reduce(_.unionByName(_))
  }

  /**
   * Incremental scan: read exactly the files ADDED between two snapshot
   * versions — the Iceberg incremental-read pattern that lets a
   * validation/curation pass process only a snapshot delta instead of
   * re-scanning the table. Data files are immutable, so the file-path
   * set difference IS the change set; under a dynamic-partition
   * overwrite the rewritten partitions' new files appear here (their
   * replaced predecessors are simply no longer referenced — row-level
   * deletes are out of scope, as in Iceberg's append-only incremental
   * scan). `from == to` (or nothing added) returns an empty frame with
   * the table schema.
   */
  def changesBetween(spark: SparkSession, root: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val before = snapshot(spark, root, Some(fromVersion)).files.map(_.path).toSet
    val to = snapshot(spark, root, Some(toVersion))
    val added = to.files.filterNot(fe => before.contains(fe.path))
    if (added.isEmpty) {
      val any = to.files.headOption.getOrElse(
        throw new IllegalStateException("empty snapshot"))
      sliceRead(spark, Seq(any)).filter(org.apache.spark.sql.functions.lit(false))
    } else sliceRead(spark, added)
  }

  /** The distinct partition values of a snapshot — CheckpointRunner's
   * partition discovery from pure metadata (no listing, no scan). */
  def partitions(spark: SparkSession, root: String,
      version: Option[Int] = None): Seq[Map[String, String]] =
    snapshot(spark, root, version).files.map(_.partition).distinct
      .sortBy(_.toSeq.sortBy(_._1).map(t => s"${t._1}=${t._2}").mkString(","))
}
