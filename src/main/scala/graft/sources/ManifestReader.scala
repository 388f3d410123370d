package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.model.Checklist

/**
 * Manifest CSV reader with the reference's ingest hygiene
 * (reference: lib/Bio/Metadata/Reader.pm:61-125):
 *  - whole-file MD5 computed while reading (86-88)
 *  - CRLF and bare-CR line endings normalized to LF (96-97)
 *  - header row skipped by 20-char prefix match against the checklist's
 *    header_row (109-111); all-comma Excel blank rows skipped (114)
 *  - blank cells parsed as NULL (blank_is_undef, 79)
 *  - rows truncated to checklist width, warning when truncated cells held
 *    data (Manifest.pm:96-102); fully-empty rows dropped (92)
 *
 * Manifest files are driver-scale by definition (the reference validates
 * hand-built spreadsheets); the cluster-scale ingest path is the parquet /
 * table reader. This class exists for behavioral fidelity and CLI parity.
 */
object ManifestReader {

  final case class Manifest(
      df: DataFrame,
      md5: String,
      uuid: String,
      warnings: Seq[String])

  def readCsv(spark: SparkSession, path: String, checklist: Checklist): Manifest = {
    val p = Paths.get(path)
    require(Files.exists(p), s"no such input file ('$path')")
    val bytes = Files.readAllBytes(p)
    // "not a CSV file" guard: the reference shells out to file(1); we check
    // for NUL bytes, the practical binary telltale (Reader.pm:67-68)
    require(!bytes.contains(0.toByte), "not a CSV file")
    val md5 = MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

    val content = new String(bytes, StandardCharsets.UTF_8)
      .replace("\r\n", "\r").replace('\r', '\n')
    val lines = content.split("\n", -1).toSeq
      .filterNot(_.isEmpty)

    val header = checklist.headerRow.getOrElse("").take(20)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val width = checklist.fields.size

    val dataRows = lines.zipWithIndex.flatMap { case (line, i) =>
      if (i == 0 && (line.startsWith(header) || line.matches("^,+$"))) None
      else if (line.matches("^,+$")) None // Excel blank rows
      else {
        val cells = parseCsvLine(line).map(c => if (c.isEmpty) null else c)
        if (cells.forall(c => c == null || c.isEmpty)) None
        else {
          val (kept, chopped) = cells.splitAt(width)
          if (chopped.exists(c => c != null && c.nonEmpty))
            warnings += s"found data in unused fields (${chopped.filter(_ != null).mkString(", ")})"
          Some(kept.padTo(width, null))
        }
      }
    }

    val schema = StructType(
      checklist.fields.map(f => StructField(f.name, StringType)) :+
        StructField("row_id", LongType, nullable = false))
    val rows = dataRows.zipWithIndex.map { case (cells, i) =>
      Row.fromSeq(cells :+ (i + 1L))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)), schema)
    Manifest(df, md5, java.util.UUID.randomUUID().toString, warnings.toSeq)
  }

  /** Minimal RFC-4180 field splitter (quoted fields, escaped quotes). */
  private[sources] def parseCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += ch
      } else ch match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case c   => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }
}
