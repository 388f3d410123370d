package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Catalog, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.vVerdict(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_verdict" -> (Catalog.vVerdict _),
    "v_violations" -> (Catalog.vViolations _),
    "q_colstats" -> (Catalog.qColstats _),
    "q_hist" -> (Catalog.qHist _),
    "q_drift" -> (Catalog.qDrift _),
    "q_unique" -> (Catalog.qUnique _),
    "q_dedup_keys" -> (Catalog.qDedupKeys _),
    "q_ri_user" -> (Catalog.qRiUser _),
    "q_ri_lang" -> (Catalog.qRiLang _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "v_verdict" -> Oracles.vVerdict,
    "v_violations" -> Oracles.vViolations,
    "q_colstats" -> Oracles.qColstats,
    "q_hist" -> Oracles.qHist,
    "q_drift" -> Oracles.qDrift,
    "q_unique" -> Oracles.qUnique,
    "q_dedup_keys" -> Oracles.qDedupKeys,
    "q_ri_user" -> Oracles.qRiUser,
    "q_ri_lang" -> Oracles.qRiLang
  )
}
