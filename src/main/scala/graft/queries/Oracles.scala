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

  private def colStatsSql(c: String): String =
    s"""SELECT '$c' AS "column", count(*) AS n_rows,
       |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
       |  CASE WHEN count(*) = 0 THEN 0.0
       |       ELSE count(CASE WHEN $c IS NULL THEN 1 END) * 1.0 / count(*) END AS null_ratio,
       |  count(DISTINCT $c) AS distinct_count,
       |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
       |FROM documents""".stripMargin

  val qColstats: String =
    Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(colStatsSql).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  val qHist: String =
    """WITH b AS (SELECT unnest(range(12)) AS bucket),
      |h AS (SELECT LEAST(11, GREATEST(0, CAST(FLOOR(n_chars / 50.0) AS INT))) AS bucket
      |      FROM documents WHERE n_chars IS NOT NULL)
      |SELECT CAST(b.bucket AS INT) AS bucket, count(h.bucket) AS n
      |FROM b LEFT JOIN h ON b.bucket = h.bucket
      |GROUP BY b.bucket ORDER BY bucket""".stripMargin

  val qDrift: String =
    """WITH h AS (
      |  SELECT LEAST(11, GREATEST(0, CAST(FLOOR(n_chars / 50.0) AS INT))) AS bucket,
      |         regexp_matches(source, '^src1[0-9]$') AS grp
      |  FROM documents WHERE n_chars IS NOT NULL),
      |c AS (SELECT bucket,
      |        count(CASE WHEN NOT grp THEN 1 END) AS a,
      |        count(CASE WHEN grp THEN 1 END) AS b
      |      FROM h GROUP BY bucket),
      |t AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM c),
      |x AS (SELECT sum(CASE WHEN a + b > 0
      |        THEN power(sqrt(nb * 1.0 / na) * a - sqrt(na * 1.0 / nb) * b, 2) / (a + b)
      |        ELSE 0 END) AS chi2
      |      FROM c, t),
      |cum AS (SELECT bucket, sum(a) OVER (ORDER BY bucket) AS ca,
      |               sum(b) OVER (ORDER BY bucket) AS cb FROM c),
      |k AS (SELECT max(abs(ca * 1.0 / na - cb * 1.0 / nb)) AS ks FROM cum, t)
      |SELECT na AS n_a, nb AS n_b,
      |  round(chi2, 6) AS chi2, chi2 > 21.03 AS chi2_drifted,
      |  round(ks, 6) AS ks, ks > 0.1 AS ks_drifted
      |FROM t, x, k""".stripMargin

  val qUnique: String =
    """SELECT lang, n_chars, count(*) AS dup_count FROM documents
      |GROUP BY lang, n_chars HAVING count(*) > 1
      |ORDER BY lang, n_chars""".stripMargin

  val qDedupKeys: String =
    """SELECT lang, n_chars, min(doc_id) AS doc_id FROM documents
      |GROUP BY lang, n_chars ORDER BY lang, n_chars""".stripMargin

  val qRiUser: String =
    """SELECT user_id, count(*) AS n_rows FROM events
      |WHERE user_id IS NOT NULL
      |  AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val qRiLang: String =
    """SELECT lang, count(*) AS n_rows FROM documents
      |WHERE lang IS NOT NULL AND lang NOT IN ('en','fr','es','de')
      |GROUP BY lang ORDER BY lang""".stripMargin
}
