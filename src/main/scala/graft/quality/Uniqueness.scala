package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant uniqueness enforcement on a composite key (north_rule:
 * uniqueness on (repo,path,commit) via salted repartition to defeat
 * repo-level skew).
 *
 * Why salting: at 10^12-file scale a hot key (a repo duplicated millions of
 * times by a bad ingest) funnels its entire key-group through one reducer in
 * a naive groupBy. The two-phase form here bounds any reducer's work:
 *
 *   phase 1: groupBy(key, salt)  — salt derived from the row, S buckets.
 *            Map-side partial aggregation + the salt spreads a hot key over
 *            S reducers; per-reducer group size drops by S.
 *   phase 2: groupBy(key) over the S partial counts — input is at most
 *            S rows per key, trivially small.
 *
 * Spark's own map-side combine handles *moderate* skew already; the explicit
 * salt is the insurance the north_rule mandates for adversarial key
 * distributions, and costs one extra (tiny) shuffle over pre-aggregated
 * rows only.
 */
object Uniqueness {

  /** (key columns..., dup_count) for every key appearing more than once.
   * The salt must vary WITHIN a key group (it exists to spread a hot key
   * over reducers), so it hashes the whole row — xxhash64 over the raw
   * column values, which stays in codegen; a to_json-based salt would
   * string-serialize every row (incl. content) just to pick a bucket. */
  def duplicates(df: DataFrame, keys: Seq[String], saltBuckets: Int = 64): DataFrame = {
    require(keys.nonEmpty)
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*),
      lit(saltBuckets)).as("__salt")
    df.select((keys.map(col) :+ salt): _*)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /**
   * First-wins dedup: keep one row per key, choosing the row with the
   * minimal tiebreak value (deterministic). Implemented as a salted
   * min-reduction rather than a global sort: phase 1 reduces each
   * (key, salt) group to one candidate, phase 2 picks the winner among at
   * most `saltBuckets` candidates per key.
   */
  def dedupFirstWins(df: DataFrame, keys: Seq[String], tiebreak: String,
      saltBuckets: Int = 64): DataFrame = {
    val all = df.columns
    val salt = pmod(crc32(col(tiebreak).cast("string")), lit(saltBuckets))
    val rowStruct = struct((tiebreak +: all.filterNot(_ == tiebreak)).map(col): _*)
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(min(rowStruct).as("__row"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("__row")).as("__row"))
      .select(all.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Violation-row form for the manifest sink: one row per duplicated key
   * with the engine's structured violation fields. */
  def violationRows(df: DataFrame, keys: Seq[String], saltBuckets: Int = 64): DataFrame = {
    val keyExpr: Column = concat_ws("/", keys.map(col): _*)
    duplicates(df, keys, saltBuckets)
      .select(
        keyExpr.as("row_id"),
        lit(keys.mkString(",")).as("field"),
        lit(graft.model.RuleIds.Unique).as("rule_id"),
        concat(lit(s"[key (${keys.mkString(",")}) duplicated "),
          col("dup_count").cast("string"), lit(" times]")).as("message"))
  }
}
