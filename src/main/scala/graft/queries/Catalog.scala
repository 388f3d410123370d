package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.model.FieldType._
import graft.engine.Validator

/**
 * Driver-facing query catalog: each entry is one operator of the engine run
 * against the synthetic tables in a scale-factor directory, paired (in
 * [[Oracles]]) with equivalent ANSI SQL for the DuckDB correctness gate.
 *
 * The `documents(doc_id, text, lang, source, n_chars)` table stands in for
 * the north_rule's `code_files(repo, path, commit, lang, content)` shape:
 * same untyped-string validation semantics, same per-row verdict contract.
 */
object Catalog {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /**
   * The flagship checklist over `documents`, exercising Enum membership with
   * tri-state unknown handling, regex Str, bounded Int and required fields —
   * one of each reference plugin family that the table's shape supports.
   * `lang2` derives deterministic unknown-term rows (doc_id % 17) so the
   * tri-state path is exercised on real data.
   */
  val docsChecklist: Checklist = Checklist(
    name = "documents",
    fields = Seq(
      FieldDef("doc_id", IntT(min = Some(0)), required = true),
      FieldDef("text", StrT(), required = true),
      FieldDef("lang2", EnumT(Seq("en", "fr", "es", "de")), acceptsUnknown = true),
      FieldDef("source", StrT(Some("^src[0-9]$"))),
      FieldDef("n_chars", IntT(min = Some(50), max = Some(500)))),
    unknownTerms = Seq("not available"))

  def docsWithLang2(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).withColumn("lang2",
      when(col("doc_id") % 17 === 0, lit("not available")).otherwise(col("lang")))

  /** Validated documents with the row verdict + reference-format error. */
  def vVerdict(spark: SparkSession, dir: String): DataFrame =
    Validator.validate(docsWithLang2(spark, dir), docsChecklist,
      Validator.Options(rowIdCol = Some("doc_id"), contentCol = Some("text")))
      .select(col("doc_id"), col(Validator.PassedCol).as("passed"),
        size(col(Validator.ViolationsCol)).as("n_violations"),
        col(Validator.ErrorCol).as("error"),
        col(Validator.ShaCol).as("content_sha256"))
      .orderBy("doc_id")

  /** Exploded structured violation rows (north_star output contract). */
  def vViolations(spark: SparkSession, dir: String): DataFrame = {
    val validated = Validator.validate(docsWithLang2(spark, dir), docsChecklist,
      Validator.Options(rowIdCol = Some("doc_id")))
    Validator.violationRows(validated)
      .orderBy("row_id", "field", "rule_id")
  }
}
