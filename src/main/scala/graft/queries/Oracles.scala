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

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  val taFeatures: String = {
    val stop = inList(graft.ops.TextAnalysis.Stopwords)
    val markers = graft.ops.TextAnalysis.LangMarkers.map { case (l, ms) => l -> inList(ms) }.toMap
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS toks,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks_l
       |  FROM documents
       |), f AS (
       |  SELECT doc_id,
       |    len(toks) AS n_tokens,
       |    len(list_distinct(toks)) AS n_distinct_tokens,
       |    length(text) AS n_chars_actual,
       |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
       |      / length(text) AS punct_raw,
       |    len(list_filter(toks_l, x -> x IN $stop)) * 1.0 / len(toks_l) AS stop_raw,
       |    list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mtl_raw,
       |    len(list_filter(toks_l, x -> x IN ${markers("en")})) AS s_en,
       |    len(list_filter(toks_l, x -> x IN ${markers("de")})) AS s_de,
       |    len(list_filter(toks_l, x -> x IN ${markers("fr")})) AS s_fr,
       |    len(list_filter(toks_l, x -> x IN ${markers("es")})) AS s_es,
       |    sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
       |  FROM t
       |)
       |SELECT doc_id,
       |  CAST(n_tokens AS INT) AS n_tokens,
       |  CAST(n_distinct_tokens AS INT) AS n_distinct_tokens,
       |  CAST(n_chars_actual AS INT) AS n_chars_actual,
       |  round(punct_raw, 6) AS punct_ratio,
       |  round(stop_raw, 6) AS stopword_ratio,
       |  round(mtl_raw, 6) AS mean_token_len,
       |  round(
       |    (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0
       |          WHEN n_tokens > 0 THEN 0.5 ELSE 0.0 END) * 0.4
       |    + (n_distinct_tokens * 1.0 / n_tokens) * 0.4
       |    + (1.0 - LEAST(1.0, punct_raw * 5)) * 0.2, 6) AS quality_score,
       |  CASE WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
       |       WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
       |       WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
       |       WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
       |       ELSE 'und' END AS lang_pred,
       |  fingerprint
       |FROM f ORDER BY doc_id""".stripMargin
  }

  val ddExact: String =
    """WITH f AS (
      |  SELECT doc_id,
      |         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      |  FROM documents)
      |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS group_size
      |FROM f GROUP BY fingerprint HAVING count(*) > 1
      |ORDER BY fingerprint""".stripMargin

  val ddNgram: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, n_chars,
      |         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, n_chars,
      |    list_distinct(list_transform(range(greatest(len(toks) - 3, 0) + 1),
      |      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS sh
      |  FROM tok)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.sh, b.sh)) * 1.0
      |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM s a JOIN s b
      |  ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  val ddCosPairs: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_dot_product(a.v, b.v)
      |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  val annTopK: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(list_dot_product(e.v, q.qv)
      |    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
      |FROM e, q WHERE e.vec_id <> 0
      |ORDER BY cos DESC, e.vec_id ASC LIMIT 10""".stripMargin

  val mmMeta: String =
    """SELECT doc_id AS asset_id, 'text' AS modality, 'text/plain' AS mime,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS "sha256"
      |FROM documents ORDER BY asset_id""".stripMargin
}
