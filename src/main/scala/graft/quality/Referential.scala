package graft.quality

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Referential-integrity checks of fact columns against dimension tables
 * (north_rule: repo/lang vs dimension tables with broadcast hash join).
 *
 * The reference models RI as broadcast-set membership (its ontology/taxonomy
 * plugins load the whole reference file into an in-memory hash,
 * Plugin/Ontology.pm:19-34 — with a documented 4.5x win over per-value
 * scans). At cluster scale the same idea is a broadcast hash anti-join:
 * the dimension ships once per executor, the fact side streams through with
 * NO shuffle of the (huge) fact table.
 */
object Referential {

  /** Fact rows whose `factKey` has no match in `dim.dimKey` (NULLs are not
   * violations — absence is the `required` rule's concern, matching the
   * reference's empty-cell skip semantics). */
  def violations(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val d = broadcast(dim.select(col(dimKey).as(factKey)).distinct())
    fact.filter(col(factKey).isNotNull)
      .join(d, Seq(factKey), "left_anti")
  }

  /** Distinct violating key values with occurrence counts — the compact
   * report form (the full-row form above feeds the violations sink). */
  def violationSummary(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    violations(fact, factKey, dim, dimKey)
      .groupBy(col(factKey))
      .agg(count(lit(1)).as("n_rows"))

  /** Literal-set form for small in-config dimensions (Enum-style): stays a
   * pure predicate inside the single validation pass — no join at all. */
  def setViolations(fact: DataFrame, factKey: String, allowed: Set[String]): DataFrame =
    fact.filter(col(factKey).isNotNull && !col(factKey).isin(allowed.toSeq: _*))
}
