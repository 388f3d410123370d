package graft.queries

/**
 * DuckDB-runnable ANSI SQL equivalents of the catalog queries, used by the
 * driver's correctness gate. Each mirrors its Spark query RULE BY RULE in
 * the compiled emission order so the verdicts, violation rows and the exact
 * reference-format error strings agree byte-for-byte.
 */
object Oracles {

  /** Shared CTE: documents with the derived lang2 column and the per-rule
   * violation conditions of [[Catalog.docsChecklist]]. */
  private val docsRules =
    """WITH d AS (
      |  SELECT doc_id, text,
      |         CASE WHEN doc_id % 17 = 0 THEN 'not available' ELSE lang END AS lang2,
      |         source, n_chars
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, text, lang2, source, n_chars,
      |    (text IS NULL OR regexp_matches(text, '^\s*$'))  AS text_required,
      |    (lang2 IS NOT NULL AND NOT regexp_matches(lang2, '^\s*$')
      |      AND lang2 <> 'not available'
      |      AND lang2 NOT IN ('en','fr','es','de'))        AS lang2_invalid,
      |    (source IS NOT NULL AND NOT regexp_matches(source, '^\s*$')
      |      AND NOT regexp_matches(source, '^src[0-9]$'))  AS source_invalid,
      |    (n_chars IS NOT NULL
      |      AND NOT (regexp_matches(CAST(n_chars AS VARCHAR), '^-?\d+$')
      |               AND n_chars >= 50 AND n_chars <= 500)) AS nchars_invalid
      |  FROM d
      |)""".stripMargin

  val vVerdict: String =
    docsRules +
      """
        |SELECT doc_id,
        |  (NOT (text_required OR lang2_invalid OR source_invalid OR nchars_invalid)) AS passed,
        |  (CAST(text_required AS INT) + CAST(lang2_invalid AS INT)
        |   + CAST(source_invalid AS INT) + CAST(nchars_invalid AS INT)) AS n_violations,
        |  CASE WHEN text_required OR lang2_invalid OR source_invalid OR nchars_invalid
        |    THEN '[errors found on row ' || CAST(doc_id AS VARCHAR) || '] ' ||
        |      trim(
        |        CASE WHEN text_required THEN '[''text'' is a required field] ' ELSE '' END ||
        |        CASE WHEN lang2_invalid THEN '[value in field ''lang2'' is not valid] ' ELSE '' END ||
        |        CASE WHEN source_invalid THEN '[value in field ''source'' is not valid] ' ELSE '' END ||
        |        CASE WHEN nchars_invalid THEN '[value in field ''n_chars'' is not valid] ' ELSE '' END)
        |    ELSE NULL END AS error,
        |  sha256(text) AS content_sha256
        |FROM r
        |ORDER BY doc_id""".stripMargin

  val vViolations: String =
    docsRules +
      """
        |, v AS (
        |  SELECT doc_id AS row_id, 'text' AS field, 'required' AS rule_id,
        |         '[''text'' is a required field]' AS message FROM r WHERE text_required
        |  UNION ALL
        |  SELECT doc_id, 'lang2', 'field_invalid',
        |         '[value in field ''lang2'' is not valid]' FROM r WHERE lang2_invalid
        |  UNION ALL
        |  SELECT doc_id, 'source', 'field_invalid',
        |         '[value in field ''source'' is not valid]' FROM r WHERE source_invalid
        |  UNION ALL
        |  SELECT doc_id, 'n_chars', 'field_invalid',
        |         '[value in field ''n_chars'' is not valid]' FROM r WHERE nchars_invalid
        |)
        |SELECT row_id, field, rule_id, message FROM v
        |ORDER BY row_id, field, rule_id""".stripMargin
}
