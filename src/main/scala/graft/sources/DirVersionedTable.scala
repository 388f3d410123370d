package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * A SECOND, architecturally independent [[TableFormat]] binding — the
 * conformance prover for the seam. Where [[SnapshotTable]] is a
 * manifest-chained format (per-file entries carried across snapshots,
 * zero listing on the read path, delete files layered merge-on-read),
 * this one is the opposite design point on almost every axis:
 *
 *  - **full state per version**: every commit MATERIALIZES the complete
 *    logical table under `<root>/v<N>/data` (Hive-style
 *    directory-per-snapshot). No files are carried by reference, no
 *    per-file manifest entries exist;
 *  - **listing-driven reads**: the read path walks the version's
 *    partition directories (the format's source of truth IS the
 *    directory tree), pruning partition dirs by name;
 *  - **JSON stats sidecar**: per-file min/max bounds live in one
 *    `_stats.json` beside the data, written from the same
 *    one-aggregate-over-the-delta pass the manifest format uses;
 *  - **tombstone merge-on-read**: a MoR delete version is a POINTER
 *    (`_meta.json` names a base version) plus a tombstone parquet;
 *    readers resolve the chain and anti-join the tombstones — full-row
 *    tombstones for predicate deletes (a deterministic predicate dooms
 *    every identical copy, so the full-row anti-join is exactly the
 *    predicate delete), key tombstones for equality deletes. Any
 *    ordinary commit materializes the resolved state, which is what
 *    gives equality deletes their Iceberg sequence semantics (later
 *    re-inserts of a deleted key survive) for free.
 *
 * Scale honesty: full-rewrite commits and listing reads are NOT the
 * 10^12-file shape — [[SnapshotTable]] is. This binding exists so
 * [[graft.TableFormatConformance]] pins the TRAIT's contract against two
 * implementations that share no code, proving the seam isn't shaped
 * around its first binding (an Iceberg DSv2 binding would be the third).
 */
object DirVersionedTableFormat extends TableFormat {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdir(root: String, v: Long) = s"$root/v$v"
  private val Committed = "_COMMITTED"

  // --- tiny JSON sidecars (jackson ships with Spark) -------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private final case class Meta(partitionCols: Seq[String],
      statsKinds: Map[String, String],
      // MoR pointer: (baseVersion, tombstone mode "rows" | "keys", keyCols)
      mor: Option[(Long, String, Seq[String])],
      bloomKinds: Map[String, String] = Map.empty,
      // snapshot-summary operation kind ("write" | "delete" | "merge" |
      // "replace") — what [[snapshotsTable]] reports; absent in
      // pre-round-5 sidecars, which read back as "write"
      op: String = "write")

  private def writeJson(spark: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val out = fs(spark, p).create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def writeMeta(spark: SparkSession, root: String, v: Long, m: Meta): Unit = {
    val node = mapper.createObjectNode()
    val pc = node.putArray("partitionCols"); m.partitionCols.foreach(pc.add)
    val sk = node.putObject("statsKinds")
    m.statsKinds.foreach { case (k, kind) => sk.put(k, kind) }
    if (m.bloomKinds.nonEmpty) {
      val bk = node.putObject("bloomKinds")
      m.bloomKinds.foreach { case (k, kind) => bk.put(k, kind) }
    }
    m.mor.foreach { case (base, mode, keyCols) =>
      val mn = node.putObject("mor")
      mn.put("base", base); mn.put("mode", mode)
      val kc = mn.putArray("keyCols"); keyCols.foreach(kc.add)
    }
    node.put("op", m.op)
    writeJson(spark, s"${vdir(root, v)}/_meta.json",
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
  }

  private def readMeta(spark: SparkSession, root: String, v: Long): Meta = {
    val p = new Path(s"${vdir(root, v)}/_meta.json")
    val in = fs(spark, p).open(p)
    val node = try mapper.readTree(in) finally in.close()
    val pcols = (0 until node.get("partitionCols").size())
      .map(node.get("partitionCols").get(_).asText())
    val kinds = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (node.has("statsKinds")) {
      val it = node.get("statsKinds").fields()
      while (it.hasNext) { val e = it.next(); kinds(e.getKey) = e.getValue.asText() }
    }
    val mor = if (!node.has("mor")) None else {
      val mn = node.get("mor")
      Some((mn.get("base").asLong(), mn.get("mode").asText(),
        (0 until mn.get("keyCols").size()).map(mn.get("keyCols").get(_).asText()).toSeq))
    }
    val bKinds = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (node.has("bloomKinds")) {
      val it = node.get("bloomKinds").fields()
      while (it.hasNext) { val e = it.next(); bKinds(e.getKey) = e.getValue.asText() }
    }
    Meta(pcols, kinds.toMap, mor, bKinds.toMap,
      if (node.has("op")) node.get("op").asText() else "write")
  }

  /** rel file path -> per-column base64 Bloom over xxhash64(col) — the
   * point-lookup sidecar beside `_stats.json`. */
  private def writeBlooms(spark: SparkSession, root: String, v: Long,
      blooms: Map[String, Map[String, String]]): Unit = {
    val node = mapper.createObjectNode()
    blooms.foreach { case (rel, cols) =>
      val fn = node.putObject(rel)
      cols.foreach { case (c, b64) => fn.put(c, b64) }
    }
    writeJson(spark, s"${vdir(root, v)}/_blooms.json",
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
  }

  private def readBlooms(spark: SparkSession, root: String,
      v: Long): Map[String, Map[String, String]] = {
    val p = new Path(s"${vdir(root, v)}/_blooms.json")
    if (!fs(spark, p).exists(p)) return Map.empty
    val in = fs(spark, p).open(p)
    val node = try mapper.readTree(in) finally in.close()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val cols = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val ci = e.getValue.fields()
      while (ci.hasNext) { val c = ci.next(); cols(c.getKey) = c.getValue.asText() }
      out(e.getKey) = cols.toMap
    }
    out.toMap
  }

  /** rel file path -> per-column (min, max), the skipping sidecar. */
  private def writeStats(spark: SparkSession, root: String, v: Long,
      stats: Map[String, Map[String, (String, String)]]): Unit = {
    val node = mapper.createObjectNode()
    stats.foreach { case (rel, cols) =>
      val fn = node.putObject(rel)
      cols.foreach { case (c, (lo, hi)) =>
        val cn = fn.putObject(c); cn.put("min", lo); cn.put("max", hi) }
    }
    writeJson(spark, s"${vdir(root, v)}/_stats.json",
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
  }

  private def readStats(spark: SparkSession, root: String,
      v: Long): Map[String, Map[String, (String, String)]] = {
    val p = new Path(s"${vdir(root, v)}/_stats.json")
    if (!fs(spark, p).exists(p)) return Map.empty
    val in = fs(spark, p).open(p)
    val node = try mapper.readTree(in) finally in.close()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, (String, String)]]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val cols = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
      val ci = e.getValue.fields()
      while (ci.hasNext) {
        val c = ci.next()
        cols(c.getKey) = (c.getValue.get("min").asText(), c.getValue.get("max").asText())
      }
      out(e.getKey) = cols.toMap
    }
    out.toMap
  }

  // --- version bookkeeping ---------------------------------------------------

  override def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    if (!f.exists(rootP)) return None
    val vs = f.listStatus(rootP).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.matches("v\\d+") &&
        f.exists(new Path(st.getPath, Committed)) =>
        st.getPath.getName.drop(1).toLong
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Walk a full version's data tree: (absolute path, rel path, partition). */
  private def listFiles(spark: SparkSession, root: String,
      v: Long): Seq[(String, String, Map[String, String])] = {
    val dataDir = new Path(s"${vdir(root, v)}/data")
    val f = fs(spark, dataDir)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Map[String, String])]
    def walk(p: Path, part: Map[String, String], rel: String): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val kv = name.split("=", 2)
          val nextPart =
            if (kv.length == 2) part + (kv(0) -> SnapshotTable.unescapePathName(kv(1)))
            else part
          walk(st.getPath, nextPart, if (rel.isEmpty) name else s"$rel/$name")
        } else if (name.endsWith(".parquet")) {
          out += ((st.getPath.toString,
            if (rel.isEmpty) name else s"$rel/$name", part))
        }
      }
    if (f.exists(dataDir)) walk(dataDir, Map.empty, "")
    out.toSeq
  }

  /** Finish a version: data is in place, stamp sidecars then the marker
   * LAST (readers only trust marked versions — a crashed writer leaves an
   * unmarked dir that the next writer sweeps). */
  private def publish(spark: SparkSession, root: String, v: Long, m: Meta): Unit = {
    writeMeta(spark, root, v, m)
    val marker = new Path(s"${vdir(root, v)}/$Committed")
    fs(spark, marker).create(marker, true).close()
  }

  /** Write `state` as full version `v` with per-file stats for `statsCols`
   * and per-file Blooms for `bloomCols` — both from ONE aggregate pass. */
  private def writeFull(state: DataFrame, root: String, v: Long,
      partitionCols: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String] = Seq.empty, op: String = "write"): Unit = {
    val spark = state.sparkSession
    val dir = new Path(vdir(root, v))
    val f = fs(spark, dir)
    if (f.exists(dir)) { // crashed earlier attempt: unmarked by construction
      require(!f.exists(new Path(dir, Committed)),
        s"version v$v already committed")
      f.delete(dir, true)
    }
    val dataDir = s"${vdir(root, v)}/data"
    if (partitionCols.nonEmpty)
      state.write.partitionBy(partitionCols: _*).parquet(dataDir)
    else state.write.parquet(dataDir)
    def colKinds(cols: Seq[String], what: String): Map[String, String] = cols.map { c =>
      import org.apache.spark.sql.types._
      state.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => c -> "long"
        case StringType => c -> "string"
        case dt => throw new IllegalArgumentException(
          s"$what column '$c' must be integral or string, got ${dt.simpleString}")
      }
    }.toMap
    val kinds = colKinds(statsCols, "stats")
    val bloomKinds = colKinds(bloomCols, "bloom")
    if (statsCols.nonEmpty || bloomCols.nonEmpty) {
      import org.apache.spark.sql.functions.{max, min, regexp_extract, when, xxhash64}
      val marker = s"/v$v/data/"
      val written = spark.read.parquet(dataDir)
      def bloomHash(c: String): Column = {
        import org.apache.spark.sql.types._
        val base = written.schema(c).dataType match {
          case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
          case _ => col(c)
        }
        when(col(c).isNotNull, xxhash64(base))
      }
      val aggs = statsCols.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))) ++
        bloomCols.map(c => graft.functions.BloomKeysAgg
          .agg(bloomHash(c), 0.01, 100000).as(s"__bloom_$c"))
      val rows = written
        .groupBy(regexp_extract(col("_metadata.file_path"),
          java.util.regex.Pattern.quote(marker) + "(.*)$", 1).as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      if (statsCols.nonEmpty)
        writeStats(spark, root, v, rows.map { r =>
          r.getString(0) -> statsCols.flatMap { c =>
            val lo = r.getAs[String](s"__min_$c")
            val hi = r.getAs[String](s"__max_$c")
            if (lo == null || hi == null) None else Some(c -> ((lo, hi)))
          }.toMap
        }.toMap)
      if (bloomCols.nonEmpty)
        writeBlooms(spark, root, v, rows.map { r =>
          r.getString(0) -> bloomCols.flatMap { c =>
            Option(r.getAs[Array[Byte]](s"__bloom_$c")) // null = saturated
              .map(b => c -> java.util.Base64.getEncoder.encodeToString(b))
          }.toMap
        }.toMap)
    }
    publish(spark, root, v, Meta(partitionCols, kinds, None, bloomKinds, op))
  }

  private def requireTable(spark: SparkSession, root: String): Long =
    currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed version under $root"))

  // --- TableFormat surface -----------------------------------------------------

  override def commit(df: DataFrame, root: String, partitionCols: Seq[String],
      overwritePartitions: Boolean = true,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    val prevV = currentVersion(spark, root)
    prevV.foreach { v =>
      val m = readMeta(spark, root, v)
      require(m.partitionCols == partitionCols,
        s"partition spec mismatch: table has ${m.partitionCols}, got $partitionCols")
    }
    // a full-state format inherits the stats + bloom specs so skipping
    // never erodes across commits that don't re-spell them
    val effStats =
      if (statsCols.nonEmpty) statsCols
      else prevV.map(v => readMeta(spark, root, v).statsKinds.keys.toSeq
        .filter(df.columns.contains)).getOrElse(Seq.empty)
    val effBlooms =
      if (bloomCols.nonEmpty) bloomCols
      else prevV.map(v => readMeta(spark, root, v).bloomKinds.keys.toSeq
        .filter(df.columns.contains)).getOrElse(Seq.empty)
    val newState = prevV match {
      case None => df
      case Some(v) =>
        val prev = read(spark, root, Some(v))
        if (overwritePartitions && partitionCols.nonEmpty) {
          val parts = df.select(partitionCols.map(col): _*).distinct()
          prev.join(parts, partitionCols, "left_anti").unionByName(df)
        } else prev.unionByName(df)
    }
    val v = prevV.getOrElse(0L) + 1
    writeFull(newState, root, v, partitionCols, effStats, effBlooms)
    v
  }

  override def read(spark: SparkSession, root: String,
      version: Option[Long] = None,
      partitionFilter: Map[String, String] = Map.empty,
      rangeFilter: Map[String, (String, String)] = Map.empty,
      keyEquals: Map[String, String] = Map.empty): DataFrame = {
    val v = version.getOrElse(requireTable(spark, root))
    val m = readMeta(spark, root, v)
    m.mor match {
      case Some((base, mode, keyCols)) =>
        val baseDf = read(spark, root, Some(base), partitionFilter, rangeFilter,
          keyEquals)
        val tomb = spark.read.parquet(s"${vdir(root, v)}/tombstones")
        mode match {
          case "keys" => baseDf.join(tomb, keyCols, "left_anti")
          case _ => // full-row tombstones: null-safe on every column
            val cond = baseDf.columns.map(c => baseDf(c) <=> tomb(c)).reduce(_ && _)
            baseDf.join(tomb, cond, "left_anti")
        }
      case None =>
        rangeFilter.keys.foreach(c => require(m.statsKinds.contains(c),
          s"no committed stats for column '$c' (statsKinds: ${m.statsKinds.keySet})"))
        keyEquals.keys.foreach(c => require(m.bloomKinds.contains(c),
          s"no committed bloom for column '$c' (bloomKinds: ${m.bloomKinds.keySet})"))
        val stats = if (rangeFilter.isEmpty) Map.empty[String, Map[String, (String, String)]]
          else readStats(spark, root, v)
        val blooms = if (keyEquals.isEmpty) Map.empty[String, Map[String, String]]
          else readBlooms(spark, root, v)
        val probes: Map[String, Long] = keyEquals.map { case (c, pv) =>
          c -> graft.functions.BloomKeysAgg.probeHash(m.bloomKinds(c), pv) }
        val files = listFiles(spark, root, v)
        val survivors = files.filter { case (_, rel, part) =>
          partitionFilter.forall { case (k, pv) => part.get(k).contains(pv) } &&
            rangeFilter.forall { case (c, (lo, hi)) =>
              stats.get(rel).flatMap(_.get(c)) match {
                case None => true
                case Some((fLo, fHi)) => m.statsKinds(c) match {
                  case "long" => !(fHi.toLong < lo.toLong || fLo.toLong > hi.toLong)
                  case _ => !(fHi < lo || fLo > hi)
                }
              }
            } &&
            probes.forall { case (c, h) =>
              blooms.get(rel).flatMap(_.get(c)) match {
                case None => true // no bloom for this file (saturated): keep
                case Some(b64) => graft.functions.BloomKeysAgg.mightContain(
                  java.util.Base64.getDecoder.decode(b64), h)
              }
            }
        }
        val basePath = s"${vdir(root, v)}/data"
        if (survivors.isEmpty) {
          require(files.nonEmpty, s"version v$v has no data files")
          spark.read.option("basePath", basePath).parquet(files.head._1)
            .filter(lit(false))
        } else
          spark.read.option("basePath", basePath)
            .parquet(survivors.map(_._1): _*)
    }
  }

  /** Snapshot diff: a full-state format has no added-files notion, so the
   * incremental contract is answered CONTENT-side (`to` EXCEPT ALL `from`)
   * — same rows-added semantics, scan-priced, honest for this format. */
  override def changesBetween(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val to = read(spark, root, Some(toVersion))
    if (fromVersion == toVersion) to.filter(lit(false))
    else to.exceptAll(read(spark, root, Some(fromVersion)))
  }

  /** Row-level changelog: a full-state format's change feed is the
   * per-version multiset DIFF — inserts(v) = state(v) EXCEPT ALL
   * state(v-1), deletes(v) the reverse. NET semantics (a rewrite that
   * leaves a row in place reports nothing for it), row-exact for every
   * operation kind, and scan-priced like [[changesBetween]] — honest
   * for this format. A [[materializeDeletes]] version diffs empty and
   * so emits nothing, matching the manifest binding's silent `replace`
   * snapshots. */
  override def changelogBetween(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    def tag(df: DataFrame, kind: String, v: Long): DataFrame =
      df.withColumn("_change_type", lit(kind))
        .withColumn("_commit_version", lit(v))
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      val prev = read(spark, root, Some(v - 1))
      val cur = read(spark, root, Some(v))
      Seq(tag(cur.exceptAll(prev), "insert", v),
        tag(prev.exceptAll(cur), "delete", v))
    }
    if (parts.isEmpty)
      tag(read(spark, root, Some(toVersion)).filter(lit(false)), "insert",
        toVersion)
    else parts.reduce(_.unionByName(_))
  }

  override def partitions(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[Map[String, String]] = {
    val v = version.getOrElse(requireTable(spark, root))
    val m = readMeta(spark, root, v)
    m.mor match {
      case Some(_) => // tombstones can empty a partition: answer from content
        read(spark, root, Some(v)).select(m.partitionCols.map(col): _*)
          .distinct().collect()
          .map(r => m.partitionCols.zipWithIndex
            .map { case (c, i) => c -> String.valueOf(r.get(i)) }.toMap).toSeq
      case None => listFiles(spark, root, v).map(_._3).distinct
    }
  }.sortBy(_.toSeq.sortBy(_._1).map(t => s"${t._1}=${t._2}").mkString(","))

  override def deleteWhere(spark: SparkSession, root: String,
      predicate: Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long) = {
    val v = requireTable(spark, root)
    val m = readMeta(spark, root, v)
    val cur = read(spark, root, Some(v))
    val scoped = partitionFilter.map { case (k, pv) => col(k) === pv }
      .foldLeft(org.apache.spark.sql.functions.coalesce(predicate, lit(false)))(_ && _)
    val doomed = cur.filter(scoped).count()
    if (doomed == 0L) return (v, 0L)
    writeFull(cur.filter(!scoped), root, v + 1, m.partitionCols,
      m.statsKinds.keys.toSeq, m.bloomKinds.keys.toSeq, op = "delete")
    (v + 1, doomed)
  }

  override def merge(delta: DataFrame, root: String,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val spark = delta.sparkSession
    val v = requireTable(spark, root)
    val m = readMeta(spark, root, v)
    val cur = read(spark, root, Some(v))
    require(delta.columns.toSet == cur.columns.toSet,
      s"merge delta columns ${delta.columns.sorted.mkString(", ")} != table " +
        s"columns ${cur.columns.sorted.mkString(", ")} — MERGE is not schema evolution")
    val dup = delta.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge delta has multiple rows for key ${dup.headOption.map(_.toSeq.init.mkString("(", ", ", ")")).getOrElse("")}")
    val next = cur.join(delta.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti").unionByName(delta.select(cur.columns.map(col): _*))
    writeFull(next, root, v + 1, m.partitionCols, m.statsKinds.keys.toSeq,
      m.bloomKinds.keys.toSeq, op = "merge")
    v + 1
  }

  /** MoR predicate delete: the doomed rows become a FULL-ROW tombstone
   * file; no data file is touched (the version is a pointer). Counting
   * the matches costs the same scan Iceberg's MoR DELETE pays to find
   * the doomed positions. */
  override def deleteWhereMoR(spark: SparkSession, root: String,
      predicate: Column,
      partitionFilter: Map[String, String] = Map.empty): (Long, Long) = {
    val v = requireTable(spark, root)
    val m = readMeta(spark, root, v)
    val cur = read(spark, root, Some(v))
    val scoped = partitionFilter.map { case (k, pv) => col(k) === pv }
      .foldLeft(org.apache.spark.sql.functions.coalesce(predicate, lit(false)))(_ && _)
    val doomed = cur.filter(scoped)
    val n = doomed.count()
    if (n == 0L) return (v, 0L)
    val next = v + 1
    val dir = new Path(vdir(root, next))
    val f = fs(spark, dir)
    if (f.exists(dir)) {
      require(!f.exists(new Path(dir, Committed)), s"version v$next already committed")
      f.delete(dir, true)
    }
    doomed.write.parquet(s"${vdir(root, next)}/tombstones")
    publish(spark, root, next,
      m.copy(mor = Some((v, "rows", Seq.empty)), op = "delete"))
    (next, n)
  }

  /** MoR equality delete: the key frame IS the tombstone — zero table
   * I/O, the streaming-CDC primitive. Sequence semantics come free: any
   * later ordinary commit materializes the RESOLVED state, so re-inserted
   * keys live in the new base and the old tombstone no longer applies. */
  override def deleteByKeysMoR(keys: DataFrame, root: String,
      keyCols: Seq[String]): (Long, Long) = {
    require(keyCols.nonEmpty, "deleteByKeysMoR needs at least one key column")
    val spark = keys.sparkSession
    val v = requireTable(spark, root)
    val m = readMeta(spark, root, v)
    // NULL key components never match (SQL equality) — filter them at
    // write like the manifest binding, so the returned count is the
    // number of keys that can actually retract something. Count BEFORE
    // writing: a 0-row parquet write leaves no readable files.
    val k = keys.select(keyCols.map(col): _*)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .distinct().cache()
    val nKeys = k.count()
    if (nKeys == 0L) { k.unpersist(); return (v, 0L) }
    val next = v + 1
    val dir = new Path(vdir(root, next))
    val f = fs(spark, dir)
    if (f.exists(dir)) {
      require(!f.exists(new Path(dir, Committed)), s"version v$next already committed")
      f.delete(dir, true)
    }
    k.write.parquet(s"${vdir(root, next)}/tombstones")
    k.unpersist()
    publish(spark, root, next,
      m.copy(mor = Some((v, "keys", keyCols)), op = "delete"))
    (next, nKeys)
  }

  override def materializeDeletes(spark: SparkSession, root: String): Long = {
    val v = requireTable(spark, root)
    val m = readMeta(spark, root, v)
    if (m.mor.isEmpty) return v // nothing pending: idempotent no-op
    writeFull(read(spark, root, Some(v)), root, v + 1, m.partitionCols,
      m.statsKinds.keys.toSeq, m.bloomKinds.keys.toSeq, op = "replace")
    v + 1
  }

  // --- metadata tables -------------------------------------------------------

  /** Per-file row count from the parquet FOOTER — metadata pages only,
   * never data I/O; what this format pays for not recording counts at
   * commit (the manifest binding answers from its manifest alone). */
  private def footerRows(spark: SparkSession, p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      p, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** One [[TableFormat.filesTableSchema]] row per file version `v`
   * references: a MoR version contributes its tombstone files (equality
   * deletes — full-row tombstones are equality deletes on every column)
   * and RECURSES to its base for the data files, mirroring how [[read]]
   * resolves the pointer chain. */
  private def filesRows(spark: SparkSession, root: String, v: Long): Seq[Row] = {
    val m = readMeta(spark, root, v)
    m.mor match {
      case Some(_) =>
        val tombDir = new Path(s"${vdir(root, v)}/tombstones")
        val f = fs(spark, tombDir)
        val tombs =
          if (!f.exists(tombDir)) Seq.empty
          else f.listStatus(tombDir).toSeq
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(st => Row("equality-deletes", st.getPath.toString,
              Map.empty[String, String], footerRows(spark, st.getPath),
              st.getLen, Map.empty[String, String], Map.empty[String, String]))
        filesRows(spark, root, m.mor.get._1) ++ tombs
      case None =>
        val stats = readStats(spark, root, v)
        listFiles(spark, root, v).map { case (abs, rel, part) =>
          val p = new Path(abs)
          val st = fs(spark, p).getFileStatus(p)
          val cs = stats.getOrElse(rel, Map.empty)
          Row("data", abs, part, footerRows(spark, p), st.getLen,
            cs.map { case (c, (lo, _)) => c -> lo },
            cs.map { case (c, (_, hi)) => c -> hi })
        }
    }
  }

  override def filesTable(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(requireTable(spark, root))
    spark.createDataFrame(
      new java.util.ArrayList[Row](filesRows(spark, root, v).asJava),
      TableFormat.filesTableSchema)
  }

  override def snapshotsTable(spark: SparkSession, root: String): DataFrame = {
    val cur = requireTable(spark, root)
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    val versions = f.listStatus(rootP).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.matches("v\\d+") &&
        f.exists(new Path(st.getPath, Committed)) =>
        st.getPath.getName.drop(1).toLong
    }.sorted
    val rows = versions.map { v =>
      val rws = filesRows(spark, root, v)
      val (data, del) = rws.partition(_.getString(0) == "data")
      Row(v, readMeta(spark, root, v).op, data.size.toLong, del.size.toLong,
        data.map(_.getLong(3)).sum, data.map(_.getLong(4)).sum, v == cur)
    }
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava),
      TableFormat.snapshotsTableSchema)
  }
}
