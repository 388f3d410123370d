package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.model.FieldType._

/**
 * Deterministic synthetic `code_files(repo, path, commit, lang, content)`
 * generator — the north_rule input shape at bench scale. Everything derives
 * from `spark.range(n)` + hash expressions of the row id (seeded, pure
 * Column exprs): fully distributed, identical output at any partitioning,
 * no external data, no executor-side RNG state.
 *
 * Planted defect classes (FIXTURES.md §4), all id-deterministic:
 *  - id % 97 == 0  -> corrupted commit (39 hex chars)          [regex]
 *  - id % 89 == 0  -> lang outside dim_lang                    [referential]
 *  - id % 83 == 0  -> NULL content                             [required]
 *  - id % 61 == 0  -> lang = "not available"                   [unknown term]
 *  - id % 7  == 0  -> repo collapses to the hot repo           [skew]
 *  - id % 101 == 0 -> duplicate (repo,path,commit) of id-1     [uniqueness]
 */
object CodeFiles {

  val Langs = Seq("scala", "java", "python", "go", "rust", "c", "cpp", "ruby")
  val DimLangs: Set[String] = Langs.toSet
  val HotRepo = "repo_hot"

  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
      contentWords: Int = 40, numRepos: Int = 1000): DataFrame = {
    val base = spark.range(n).toDF("id")
    // a duplicated row copies the previous id's key columns
    val keyId = when(col("id") % 101 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    def h(c: org.apache.spark.sql.Column, salt: Int) =
      abs(xxhash64(c, lit(seed), lit(salt)))

    val repo = when(keyId % 7 === 0, lit(HotRepo))
      .otherwise(concat(lit("repo_"), (h(keyId, 1) % numRepos).cast("string")))
    val lang = when(col("id") % 89 === 0, lit("klingon"))
      .when(col("id") % 61 === 0, lit("not available"))
      .otherwise(element_at(typedLit(Langs), (h(keyId, 2) % Langs.size + 1).cast("int")))
    val path = concat(lit("src/"),
      (h(keyId, 3) % 100).cast("string"), lit("/"),
      (h(keyId, 4) % 10000).cast("string"), lit("."),
      element_at(typedLit(Langs), (h(keyId, 2) % Langs.size + 1).cast("int")))
    val commitFull = substring(sha2(concat(keyId.cast("string"), lit(seed)), 256), 1, 40)
    val commit = when(col("id") % 97 === 0, substring(commitFull, 1, 39))
      .otherwise(commitFull)
    // content: contentWords deterministic pseudo-words
    val content = when(col("id") % 83 === 0, lit(null).cast("string"))
      .otherwise(concat_ws(" ",
        transform(sequence(lit(0), lit(contentWords - 1)),
          i => concat(lit("w"), (abs(xxhash64(col("id"), i, lit(seed))) % 5000).cast("string")))))

    base.select(
      col("id"),
      repo.as("repo"),
      path.as("path"),
      commit.as("commit"),
      lang.as("lang"),
      content.as("content"))
  }

  /** The code_files checklist: the north_star constraint set — commit regex
   * (the reference's MD5/UUID regex subtypes generalized, Types.pm:32-40),
   * lang Enum vs dim with tri-state unknown, required content/repo/path. */
  val checklist: Checklist = Checklist(
    name = "code_files",
    fields = Seq(
      FieldDef("repo", StrT(Some("^repo_[a-z0-9_]+$")), required = true),
      FieldDef("path", StrT(Some("^[A-Za-z0-9_./-]+$")), required = true),
      FieldDef("commit", StrT(Some("^[0-9a-f]{40}$")), required = true),
      FieldDef("lang", EnumT(Langs), acceptsUnknown = true),
      FieldDef("content", StrT(), required = true)),
    unknownTerms = Seq("not available"))
}
