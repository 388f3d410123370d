package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.model.FieldType._
import graft.run.Quarantine
import graft.sources.SnapshotTable

/**
 * End-to-end spec for the quarantine loop (validate → CoW-delete invalid
 * rows into a quarantine table → fix → gated merge-back), the table-native
 * closure of the reference's manual validate/fix/resubmit cycle
 * (reference: bin/validate_manifest writes an invalid-rows CSV for a human).
 * Input shape is the input_hint's (repo, path, commit, lang, content).
 */
class QuarantineSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("quarantine").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val checklist = Checklist("code", Seq(
    FieldDef("repo", StrT(), required = true),
    FieldDef("path", StrT(Some("\\.")), required = true,
      description = Some("file path with extension")),
    FieldDef("commit", StrT(Some("^[0-9a-f]+$")), required = true),
    FieldDef("lang", EnumT(Seq("scala", "java", "python")), required = true),
    FieldDef("content", StrT(), required = true)))

  private def corpus() = Seq(
    ("r1", "a/Main.scala", "aa01", "scala", "object Main"),
    ("r1", "b/Util.java",  "aa02", "java",  "class Util {}"),
    ("r2", "c/run.py",     "aa03", "python", "print(1)"),
    ("r2", "d/bad.pl",     "aa04", "perl",  "print 1;"),      // bad lang
    ("r3", "e/Empty.scala", "aa05", "scala", null),            // missing content
    ("r3", "f/Ok.scala",   "aa06", "scala", "val x = 1"))
    .toDF("repo", "path", "commit", "lang", "content")

  test("quarantine loop: invalid rows move out with their errors, fixes merge back") {
    val root = freshRoot(); val qRoot = freshRoot()
    SnapshotTable.commit(corpus().repartition(3), root, Seq("repo"))

    val r = Quarantine.quarantineInvalid(spark, root, qRoot, checklist,
      rowIdCol = "path")
    assert(r.quarantined === 2L && r.remaining === 4L)
    assert(SnapshotTable.read(spark, root).count() === 4)

    // quarantine table keeps the data AND the reference-wording error string
    val q = SnapshotTable.read(spark, qRoot)
    assert(q.count() === 2)
    val errs = q.select("path", Quarantine.ErrorCol).as[(String, String)]
      .collect().toMap
    assert(errs("d/bad.pl") ===
      "[errors found on row d/bad.pl] [value in field 'lang' is not valid]")
    assert(errs("e/Empty.scala") ===
      "[errors found on row e/Empty.scala] ['content' is a required field]")

    // time travel still shows the table before the quarantine
    val before = SnapshotTable.read(spark, root,
      version = Some((r.tableVersion - 1).toInt))
    assert(before.count() === 6)

    // a correction batch that STILL violates is rejected at the door, named
    val stillBad = q.drop(Quarantine.ErrorCol)
      .withColumn("lang", when(col("lang") === "perl", "cobol").otherwise(col("lang")))
      .withColumn("content", coalesce(col("content"), lit("fixed")))
    val ex = intercept[IllegalArgumentException] {
      Quarantine.mergeCorrections(stillBad, root, qRoot, checklist,
        Seq("repo", "path", "commit"))
    }
    assert(ex.getMessage.contains("still violates"))
    assert(SnapshotTable.read(spark, root).count() === 4) // nothing half-merged

    // real fixes merge home and retire from quarantine
    val fixed = q.drop(Quarantine.ErrorCol)
      .withColumn("lang", when(col("lang") === "perl", "python").otherwise(col("lang")))
      .withColumn("content", coalesce(col("content"), lit("fixed")))
    val c = Quarantine.mergeCorrections(fixed, root, qRoot, checklist,
      Seq("repo", "path", "commit"))
    assert(c.retired === 2L)
    val cur = SnapshotTable.read(spark, root)
    assert(cur.count() === 6)
    assert(cur.filter(col("path") === "d/bad.pl").select("lang").head().getString(0)
      === "python")
    assert(SnapshotTable.read(spark, qRoot).count() === 0)

    // the revalidated table is now fully clean, and a second quarantine
    // pass commits nothing to either root
    val r2 = Quarantine.quarantineInvalid(spark, root, qRoot, checklist, "path")
    assert(r2.quarantined === 0L && r2.remaining === 6L)
    assert(r2.tableVersion === c.tableVersion && r2.quarantineVersion === c.quarantineVersion)
  }

  test("merge-on-read quarantine: invalid rows leave the table without " +
      "rewriting a single data file; the loop still closes") {
    val root = freshRoot(); val qRoot = freshRoot()
    val s1 = SnapshotTable.commit(corpus().repartition(3), root, Seq("repo"))

    val r = Quarantine.quarantineInvalid(spark, root, qRoot, checklist,
      rowIdCol = "path", mor = true)
    assert(r.quarantined === 2L && r.remaining === 4L)
    assert(SnapshotTable.read(spark, root).count() === 4)
    // the MoR point: the table's data files are EXACTLY the v1 set —
    // nothing was rewritten, the invalid rows pend as position deletes
    val s2 = SnapshotTable.snapshot(spark, root)
    assert(s2.files.map(_.path).sorted === s1.files.map(_.path).sorted)
    assert(s2.deletes.nonEmpty)
    // metadata row counts stay exact under position deletes
    assert(SnapshotTable.rowCount(spark, root) === 4L)
    // error wording identical to the CoW path
    val q = SnapshotTable.read(spark, qRoot)
    assert(q.filter(col("path") === "d/bad.pl")
      .select(Quarantine.ErrorCol).head().getString(0) ===
      "[errors found on row d/bad.pl] [value in field 'lang' is not valid]")

    // fixes merge home: the merge rewrites the touched files, applies the
    // pending deletes there, and retires the quarantine rows
    val fixed = q.drop(Quarantine.ErrorCol)
      .withColumn("lang", when(col("lang") === "perl", "python").otherwise(col("lang")))
      .withColumn("content", coalesce(col("content"), lit("fixed")))
    val c = Quarantine.mergeCorrections(fixed, root, qRoot, checklist,
      Seq("repo", "path", "commit"))
    assert(c.retired === 2L)
    assert(SnapshotTable.read(spark, root).count() === 6)
    assert(SnapshotTable.read(spark, qRoot).count() === 0)
    // a second MoR pass over the now-clean table commits nothing
    val r2 = Quarantine.quarantineInvalid(spark, root, qRoot, checklist,
      "path", mor = true)
    assert(r2.quarantined === 0L && r2.remaining === 6L)
  }

  test("quarantine over a table carrying pending EQUALITY deletes (CDC) " +
      "reports remaining via scan instead of aborting after the commits") {
    val root = freshRoot(); val qRoot = freshRoot()
    SnapshotTable.commit(corpus().repartition(3), root, Seq("repo"))
    // a CDC-style equality delete pends: metadata row counts are inexact,
    // rowCount refuses — the quarantine pass must not inherit that abort
    SnapshotTable.deleteByKeysMoR(Seq("aa06").toDF("commit"), root, Seq("commit"))
    intercept[IllegalArgumentException] { SnapshotTable.rowCount(spark, root) }

    val r = Quarantine.quarantineInvalid(spark, root, qRoot, checklist,
      rowIdCol = "path", mor = true)
    // 6 rows - 1 equality-deleted (aa06, valid) - 2 quarantined = 3
    assert(r.quarantined === 2L && r.remaining === 3L)
    assert(SnapshotTable.read(spark, root).count() === 3)

    // the zero-delete branch takes the same fallback
    val r2 = Quarantine.quarantineInvalid(spark, root, qRoot, checklist,
      "path", mor = true)
    assert(r2.quarantined === 0L && r2.remaining === 3L)
  }
}
