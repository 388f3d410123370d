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
      |k AS (SELECT max(abs(ca * 1.0 / na - cb * 1.0 / nb)) AS ks FROM cum, t),
      |p AS (SELECT sum(
      |        ((a2 + 0.5) / (na + 6.0) - (b2 + 0.5) / (nb + 6.0)) *
      |        ln(((a2 + 0.5) / (na + 6.0)) / ((b2 + 0.5) / (nb + 6.0)))) AS psi
      |      FROM (SELECT bb.bucket, COALESCE(c.a, 0) AS a2, COALESCE(c.b, 0) AS b2
      |            FROM (SELECT unnest(range(12)) AS bucket) bb
      |            LEFT JOIN c ON bb.bucket = c.bucket) f, t)
      |SELECT na AS n_a, nb AS n_b,
      |  round(chi2, 6) AS chi2, chi2 > 21.03 AS chi2_drifted,
      |  round(ks, 6) AS ks, ks > 0.1 AS ks_drifted,
      |  round(psi, 6) AS psi, psi > 0.2 AS psi_drifted
      |FROM t, x, k, p""".stripMargin

  /** Oracle for [[Catalog.qTopvals]]: with capacity above each column's
   * cardinality the per-column Misra–Gries sketches are exact, so the
   * oracle is the plain per-column value count (NULLs excluded — the
   * sketch skips null inputs like every aggregate). */
  val qTopvals: String =
    """SELECT 'lang' AS "column", lang AS "value", count(*) AS est_count
      |FROM documents WHERE lang IS NOT NULL GROUP BY lang
      |UNION ALL
      |SELECT 'source', source, count(*) FROM documents
      |WHERE source IS NOT NULL GROUP BY source
      |ORDER BY "column", "value"""".stripMargin

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
      |  AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 3)
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
       |    regexp_split_to_array(trim(text), '[\\s\\x0b]+') AS toks,
       |    regexp_split_to_array(lower(trim(text)), '[\\s\\x0b]+') AS toks_l
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
       |    sha256(regexp_replace(lower(trim(text)), '[\\s\\x0b]+', ' ', 'g')) AS fingerprint
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
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 50 = 0),
      |f AS (
      |  SELECT doc_id,
      |         sha256(regexp_replace(lower(trim(text)), '[\s\x0b]+', ' ', 'g')) AS fingerprint
      |  FROM corpus)
      |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS group_size
      |FROM f GROUP BY fingerprint HAVING count(*) > 1
      |ORDER BY fingerprint""".stripMargin

  val taExtras: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    regexp_replace(lower(trim(text)), '[\s\x0b]+', ' ', 'g') AS norm
      |  FROM documents)
      |SELECT doc_id,
      |  -- alnum runs + non-alnum non-space chars (the lookaround-split
      |  -- tokenization, re-expressed without lookarounds for RE2)
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
      |    + length(replace(text, ' ', ''))
      |    - length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS INT) AS n_subwords,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(length(norm)),
      |        i -> CAST(ascii(substring(norm, CAST(i + 1 AS INT), 1)) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
      |FROM t ORDER BY doc_id""".stripMargin

  val ddNgram: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, n_chars,
      |         regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, n_chars,
      |    list_distinct(list_transform(range(greatest(len(toks) - 3, 0) + 1),
      |      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS sh
      |  FROM tok),
      |keep AS (
      |  SELECT lang, n_chars FROM documents
      |  GROUP BY lang, n_chars HAVING count(*) <= 1000),
      |sk AS (SELECT s.* FROM s JOIN keep USING (lang, n_chars))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.sh, b.sh)) * 1.0
      |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM sk a JOIN sk b
      |  ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  /**
   * Oracle for [[Catalog.taRepetition]]: rebuilds the planted corpus and
   * restates each repetition metric verbatim — line splits on chr(10),
   * word n-grams as space-joined strings (empty list under n tokens, the
   * same convention as [[graft.ops.Curation.wordNgrams]]), top-bigram
   * coverage as max multiplicity over slots, dup fractions as
   * 1 - distinct/total.
   */
  val taRepetition: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000, text || ' ' || text
      |  FROM documents WHERE doc_id % 60 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000, text || chr(10) || text
      |  FROM documents WHERE doc_id % 75 = 0),
      |t AS (
      |  SELECT doc_id, text,
      |    string_split(text, chr(10)) AS l,
      |    regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM corpus),
      |g AS (
      |  SELECT doc_id, l,
      |    CASE WHEN len(toks) >= 2
      |      THEN list_transform(range(len(toks) - 1),
      |        i -> concat_ws(' ', toks[i+1], toks[i+2]))
      |      ELSE [] END AS bg,
      |    CASE WHEN len(toks) >= 5
      |      THEN list_transform(range(len(toks) - 4),
      |        i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4], toks[i+5]))
      |      ELSE [] END AS g5
      |  FROM t)
      |SELECT doc_id,
      |  CAST(len(l) AS INT) AS n_lines,
      |  CASE WHEN len(l) <= 1 THEN 0.0
      |       ELSE round(1.0 - len(list_distinct(l)) * 1.0 / len(l), 6)
      |       END AS dup_line_frac,
      |  CASE WHEN list_sum(list_transform(l, x -> length(x))) <= 0 THEN 0.0
      |       ELSE round(1.0 - list_sum(list_transform(list_distinct(l), x -> length(x))) * 1.0
      |            / list_sum(list_transform(l, x -> length(x))), 6)
      |       END AS dup_line_char_frac,
      |  CASE WHEN len(bg) <= 0 THEN 0.0
      |       ELSE round(list_max(list_transform(list_distinct(bg),
      |              x -> len(list_filter(bg, y -> y = x)))) * 1.0 / len(bg), 6)
      |       END AS top_bigram_frac,
      |  CASE WHEN len(g5) <= 0 THEN 0.0
      |       ELSE round(1.0 - len(list_distinct(g5)) * 1.0 / len(g5), 6)
      |       END AS dup_5gram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.qContam]]: the benchmark CTE collects the
   * distinct 3-grams of the doc_id % 100 == 0 docs; each doc's distinct
   * 3-gram set is joined against it and the hit fraction restated.
   */
  val qContam: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3
      |      THEN list_distinct(list_transform(range(len(toks) - 2),
      |        i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])))
      |      ELSE [] END AS shs
      |  FROM t),
      |bench AS (
      |  SELECT DISTINCT unnest(shs) AS sh FROM s WHERE doc_id % 100 = 0),
      |hits AS (
      |  SELECT e.doc_id, count(*) AS n_hits
      |  FROM (SELECT doc_id, unnest(shs) AS sh FROM s) e
      |  JOIN bench USING (sh)
      |  GROUP BY e.doc_id)
      |SELECT s.doc_id,
      |  CAST(len(s.shs) AS INT) AS n_shingles,
      |  COALESCE(h.n_hits, 0) AS n_hits,
      |  CASE WHEN len(s.shs) <= 0 THEN 0.0
      |       ELSE round(COALESCE(h.n_hits, 0) * 1.0 / len(s.shs), 6)
      |       END AS contam_frac
      |FROM s LEFT JOIN hits h USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.ddLines]]: the same planted corpus, the same
   * first-occurrence choice — a row_number window over (doc_id, idx) per
   * line — and the same surviving-line reassembly (string_agg ordered by
   * idx). The `unnest(range(..)) , unnest(list)` pair zips positionally,
   * giving each line its 1-based index like Spark's posexplode + 1.
   */
  val ddLines: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 500000, text FROM documents WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000, text || chr(10) || text
      |  FROM documents WHERE doc_id % 75 = 0),
      |l AS (
      |  SELECT doc_id,
      |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx,
      |    unnest(string_split(text, chr(10))) AS line
      |  FROM corpus),
      |k AS (
      |  SELECT doc_id, idx, line,
      |    row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) = 1 AS keep
      |  FROM l)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS n_lines,
      |  CAST(count(CASE WHEN keep THEN 1 END) AS INT) AS n_kept,
      |  coalesce(string_agg(line, chr(10) ORDER BY idx) FILTER (WHERE keep), '')
      |    AS text_dedup
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.taPii]]: the pattern strings interpolate from the
   * SAME Scala constants the Spark query compiles
   * ([[graft.ops.Curation.EmailRe]] etc. — lookaround-free, `\p`-free, so
   * Java regex and RE2 agree), applied in the same email→IP→phone order.
   * DuckDB regular strings keep backslashes literal, so the interpolated
   * `\b`/`\d` arrive intact.
   */
  val taPii: String = {
    import graft.ops.Curation.{EmailRe, Ipv4Re, PhoneRe}
    s"""WITH corpus AS (
       |  SELECT doc_id,
       |    text
       |      || CASE WHEN doc_id % 30 = 0 THEN ' contact bob123@mail-example.org now' ELSE '' END
       |      || CASE WHEN doc_id % 45 = 0 THEN ' from 192.168.1.42 call +1-555-867-5309' ELSE '' END
       |    AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ipv4,
       |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS redacted
       |FROM corpus ORDER BY doc_id""".stripMargin
  }

  /**
   * Oracle for [[Catalog.taUrls]]. The URL class is stated as
   * `[^\s\x0b]+` because Java's `\s` includes \x0B and RE2's does not
   * (the tokenizer-parity rule); the domain extract and the blocklist
   * IN-set restate [[graft.ops.Curation.urlAudit]] verbatim.
   */
  val taUrls: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |    text
      |      || CASE WHEN doc_id % 35 = 0 THEN ' see https://spam.example.com/p/123 and http://ok-site.org/index.html' ELSE '' END
      |      || CASE WHEN doc_id % 55 = 0 THEN ' ref https://docs.example.io/guide' ELSE '' END
      |    AS text
      |  FROM documents),
      |u AS (
      |  SELECT doc_id,
      |    list_transform(regexp_extract_all(text, 'https?://[^\s\x0b]+'),
      |                   x -> regexp_extract(x, 'https?://([^/]+)', 1)) AS domains
      |  FROM corpus)
      |SELECT doc_id,
      |  CAST(len(domains) AS INT) AS n_urls,
      |  CAST(len(list_filter(domains,
      |    d -> d IN ('spam.example.com', 'malware.example.net'))) AS INT) AS n_blocked,
      |  CASE WHEN len(domains) > 0 THEN domains[1] ELSE NULL END AS first_domain,
      |  len(list_filter(domains,
      |    d -> d IN ('spam.example.com', 'malware.example.net'))) = 0 AS keep
      |FROM u ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.taVocab]]: the shared tokenizer
   * (`regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')` ==
   * [[graft.ops.TextAnalysis.tokensLower]]) unnested, grouped per token
   * with exact tf / distinct-doc df and `idf = round(ln(n_docs/df), 6)`.
   */
  val taVocab: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE text IS NOT NULL)
      |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq,
      |       round(ln(n_docs * 1.0 / count(DISTINCT doc_id)), 6) AS idf
      |FROM t, n GROUP BY token, n_docs ORDER BY token""".stripMargin

  /**
   * Oracle for [[Catalog.taBpe]]: BPE-merge training restated as a
   * GENERATED chain of CTEs, one triple per merge round over the
   * vocab-scale `(word, freq, syms)` state — `pairs_i` counts adjacent
   * symbol pairs (unnest over `range(1, len(syms))`), `top_i` picks the
   * winner (count desc, lhs, rhs — the engine's tie-break), `state_i`
   * applies it with the SAME leftmost-first non-overlapping fold
   * (`list_reduce` with a list accumulator == Spark's `aggregate`).
   * Words are printable-ASCII-only in both engines so character
   * splitting is code-unit-agnostic; `</w>` marks word ends. A round
   * whose pair table is empty yields no merge row and an unchanged
   * state in BOTH engines (the engine breaks, the CTE goes empty).
   */
  val taBpe: String = {
    val b = new StringBuilder
    b ++= """WITH state_0 AS (
      |  SELECT word, count(*) AS freq,
      |         list_concat(regexp_split_to_array(word, ''), ['</w>']) AS syms
      |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS word
      |        FROM documents WHERE text IS NOT NULL)
      |  WHERE regexp_matches(word, '^[!-~]+$')
      |  GROUP BY word)""".stripMargin
    for (i <- 1 to Catalog.BpeMerges) {
      b ++= s""",
      |pairs_$i AS (
      |  SELECT syms[j] AS s1, syms[j+1] AS s2, CAST(sum(freq) AS BIGINT) AS n
      |  FROM state_${i - 1} w, unnest(range(1, len(w.syms))) AS t(j)
      |  GROUP BY 1, 2),
      |top_$i AS (SELECT s1, s2, n FROM pairs_$i ORDER BY n DESC, s1, s2 LIMIT 1),
      |state_$i AS (
      |  SELECT word, freq,
      |    CASE WHEN t.s1 IS NULL THEN syms ELSE
      |      list_reduce(list_transform(syms, s -> [s]),
      |        (acc, x) -> CASE WHEN acc[-1] = t.s1 AND x[1] = t.s2
      |                    THEN acc[:-2] || [t.s1 || t.s2]
      |                    ELSE acc || x END)
      |    END AS syms
      |  FROM state_${i - 1} LEFT JOIN top_$i t ON TRUE)""".stripMargin
    }
    b ++= s"""
      |SELECT * FROM (${(1 to Catalog.BpeMerges).map(i =>
        s"SELECT $i AS merge_rank, s1 AS lhs, s2 AS rhs, n FROM top_$i")
        .mkString(" UNION ALL ")})
      |ORDER BY merge_rank""".stripMargin
    b.toString
  }

  /**
   * Oracle for [[Catalog.taHeavy]]: with capacity > distinct tokens the
   * Misra–Gries sketch never decrements, so its estimates ARE the exact
   * token counts — the oracle is the plain word count over the shared
   * tokenizer.
   */
  val taHeavy: String =
    """WITH t AS (
      |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS token
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT token, count(*) AS est_count FROM t
      |GROUP BY token ORDER BY token""".stripMargin

  /**
   * Oracle for [[Catalog.qSample]]: rank rows by the double-cast
   * xxhash64(doc_id) ascending (the engine scores by its negation
   * descending — identical order), ties by doc_id, keep the first 20.
   * The hash recomputes via the staged pure-SQL XXH64 ([[SqlXxh64]]).
   */
  def qSample: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("doc_id", 42L), "documents", Seq("doc_id"))
    val s = SqlXxh64.signed("lb4")
    s"""WITH h AS (
       |  $hashed
       |), r AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY CAST(($s) AS DOUBLE) ASC, doc_id ASC)
       |      AS rank
       |  FROM h)
       |SELECT CAST(rank AS INT) AS rank, doc_id FROM r WHERE rank <= 20
       |ORDER BY rank""".stripMargin
  }

  /**
   * Oracle for [[Catalog.taWinnow]]: the polynomial k-gram hash is a
   * left fold (base 31 mod 2^31-1 — every intermediate < 2^36, exact in
   * BIGINT on both engines), windows of 4 take their min, and the sorted
   * distinct minima unnest to fingerprint rows. The <w-grams single-min
   * edge and the <k-tokens empty edge restate the Spark contract.
   */
  val taWinnow: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(len(toks) - 2),
      |        i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))
      |      ELSE [] END AS grams
      |  FROM t),
      |h AS (
      |  SELECT doc_id,
      |    list_transform(grams, s ->
      |      list_reduce(
      |        [0::BIGINT] ||
      |          list_transform(range(length(s)), j -> ascii(s[j+1:j+1])::BIGINT),
      |        (a, b) -> (a * 31 + b) % 2147483647)) AS hs
      |  FROM g),
      |m AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN []
      |         WHEN len(hs) < 4 THEN [list_min(hs)]
      |         ELSE list_transform(range(len(hs) - 3), i -> list_min(hs[i+1:i+4]))
      |    END AS mins
      |  FROM h)
      |SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fingerprint
      |FROM m ORDER BY doc_id, fingerprint""".stripMargin

  /**
   * Oracle for [[Catalog.taKeywords]]: tf per (doc, token), idf from the
   * per-token doc count, and the same top-3 selection as a row_number
   * window ordered score DESC, token ASC — ties resolve identically to
   * Spark's ascending sort on (-score, token). The sort runs on the
   * UNROUNDED score in both engines; only the emitted value rounds.
   */
  val taKeywords: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE text IS NOT NULL),
      |tf AS (
      |  SELECT doc_id, token, count(*) AS tf FROM t GROUP BY doc_id, token),
      |v AS (
      |  SELECT token, ln(n_docs * 1.0 / count(*)) AS idf
      |  FROM tf, n GROUP BY token, n_docs),
      |s AS (
      |  SELECT tf.doc_id, tf.token, tf.tf * v.idf AS score,
      |         row_number() OVER (PARTITION BY tf.doc_id
      |                            ORDER BY tf.tf * v.idf DESC, tf.token) AS rank
      |  FROM tf JOIN v USING (token))
      |SELECT doc_id, CAST(rank AS INT) AS rank, token, round(score, 6) AS score
      |FROM s WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Oracle for [[Catalog.taKeywordsJoin]] — by construction the SAME SQL
   * as [[taKeywords]]: the join path must produce byte-identical output to
   * the map path, so one oracle adjudicates both. */
  val taKeywordsJoin: String = taKeywords

  /**
   * Oracle for [[Catalog.qMixture]]: the copy-selection hash is Spark's
   * `xxhash64(~doc_id)` — the complement's unsigned value is
   * 2^64-1-doc_id, which feeds the same staged hashLong arithmetic as
   * [[qSplit]] — and the copy count unnests via range(). The fractional
   * threshold uses floor() exactly as the engine does, so both sides
   * truncate identical IEEE doubles identically.
   */
  def qMixture: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("18446744073709551615 - doc_id", 42L),
      "documents", Seq("doc_id", "lang"))
    val s = SqlXxh64.signed("lb4")
    s"""WITH h AS (
       |  $hashed
       |), k AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN lang = 'en' THEN 2.3::DOUBLE
       |         WHEN lang = 'fr' THEN 0.5::DOUBLE
       |         WHEN lang = 'es' THEN 0.0::DOUBLE
       |         ELSE 1.0::DOUBLE END AS wt,
       |    ((($s) % 10000) + 10000) % 10000 AS bucket
       |  FROM h
       |), c AS (
       |  SELECT doc_id, lang,
       |    CAST(floor(wt) AS INT) +
       |    CASE WHEN bucket < floor(wt * 10000) - floor(wt) * 10000
       |         THEN 1 ELSE 0 END AS copies
       |  FROM k)
       |SELECT doc_id, lang, CAST(unnest(range(copies)) AS INT) AS copy
       |FROM c ORDER BY doc_id, copy""".stripMargin
  }

  /**
   * Oracle for [[Catalog.qSplit]]: recomputes Spark's `xxhash64(bigint)`
   * (XXH64.hashLong, seed 42) as staged pure-SQL 64-bit arithmetic
   * ([[SqlXxh64.hashLongStages]]), folds to the signed value Spark
   * returns, and applies the identical pmod-bucket thresholds
   * (80/10/10 over 10000 buckets).
   */
  def qSplit: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("doc_id", 42L), "documents", Seq("doc_id"))
    val s = SqlXxh64.signed("lb4")
    s"""WITH h AS (
       |  $hashed
       |), b AS (
       |  SELECT doc_id, ((($s) % 10000) + 10000) % 10000 AS bucket FROM h
       |)
       |SELECT doc_id,
       |  CASE WHEN bucket < 8000 THEN 'train'
       |       WHEN bucket < 9000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /**
   * Oracle for [[Catalog.qQuota]]: the quality-score formula of
   * [[taFeatures]] fed into the window formulation the bounded aggregate
   * replaces — row_number() over (lang, score DESC, doc_id ASC) <= 5.
   */
  val qQuota: String =
    """WITH t AS (
      |  SELECT doc_id, lang, text,
      |    regexp_split_to_array(trim(text), '[\s\x0b]+') AS toks
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, lang,
      |    len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_distinct_tokens,
      |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
      |      / length(text) AS punct_raw
      |  FROM t
      |), q AS (
      |  SELECT doc_id, lang,
      |    round(
      |      (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0
      |            WHEN n_tokens > 0 THEN 0.5 ELSE 0.0 END) * 0.4
      |      + (n_distinct_tokens * 1.0 / n_tokens) * 0.4
      |      + (1.0 - LEAST(1.0, punct_raw * 5)) * 0.2, 6) AS quality_score
      |  FROM f
      |), r AS (
      |  SELECT doc_id, lang, quality_score,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY quality_score DESC, doc_id ASC) AS rn
      |  FROM q
      |)
      |SELECT lang, doc_id, quality_score FROM r WHERE rn <= 5
      |ORDER BY lang, doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.ddClusters]]: rebuilds the same planted-clone
   * corpus (the clone expressions are engine-portable by construction),
   * re-derives the >=0.5-Jaccard blocked pair graph exactly like
   * [[ddNgram]], then closes it into connected components with a
   * recursive CTE — min-label propagation as SQL: seed every endpoint
   * with itself, flow labels across symmetrized edges until the UNION
   * fixpoint, then take the min reachable id per node.
   */
  val ddClusters: String =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, lang, n_chars, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, lang, n_chars,
      |         'zzzswap ' || substring(text, instr(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 50 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, lang, n_chars, text || ' qqqtail'
      |  FROM documents WHERE doc_id % 50 = 0),
      |tok AS (
      |  SELECT doc_id, lang, n_chars,
      |         regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM corpus),
      |s AS (
      |  SELECT doc_id, lang, n_chars,
      |    list_distinct(list_transform(range(greatest(len(toks) - 3, 0) + 1),
      |      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS sh
      |  FROM tok),
      |keep AS (
      |  SELECT lang, n_chars FROM corpus
      |  GROUP BY lang, n_chars HAVING count(*) <= 1000),
      |sk AS (SELECT s.* FROM s JOIN keep USING (lang, n_chars)),
      |edges AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sk a JOIN sk b
      |    ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
      |  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0
      |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.5),
      |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
      |        UNION ALL SELECT id_b, id_a FROM edges),
      |cc AS (
      |  SELECT DISTINCT src AS id, src AS comp FROM sym
      |  UNION
      |  SELECT sym.src AS id, cc.comp FROM cc JOIN sym ON cc.id = sym.dst
      |)
      |SELECT id, min(comp) AS component FROM cc GROUP BY id ORDER BY id""".stripMargin

  /**
   * Full-value oracle for [[Catalog.ddMinhash]] (previously `no_oracle`):
   * recomputes the ENTIRE MinHash-LSH pipeline in DuckDB — word 3-shingles,
   * xxhash64 via [[SqlXxh64]], the 32 seeded affine permutations (the same
   * coefficient table the kernel derives, inlined below), 8 band keys
   * (xxhash64 of the comma-joined signature slice folded with the band
   * index through the int path), the >200 degenerate-bucket guard, the
   * bucket self-join, and the signature-agreement estimate.
   */
  def ddMinhash: String = {
    import SqlXxh64._
    val numHashes = 32; val bands = 8; val rowsPerBand = 4
    val maxBucket = 200; val thresh = "0.5"
    val ab = graft.functions.MinHashSig.coefficients(numHashes, 42L)
      .map { case (a, b) => s"[$a, $b]" }.mkString(", ")
    s"""WITH RECURSIVE
corp AS (
  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '[\\s\\x0b]+') AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
dsh AS (
  SELECT id, list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - 3, 0) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
  FROM corp),
shs AS (SELECT DISTINCT unnest(shingles) AS s FROM dsh),
shid AS (SELECT row_number() OVER (ORDER BY s) AS sid, s FROM shs),
${xxh64Cte("shid", "sx", 42L)},
doch AS (
  SELECT d.id, list_distinct(list(${signed("x.h")})) AS xl0
  FROM (SELECT id, unnest(shingles) AS s FROM dsh) d
  JOIN sxdone x USING (s)
  GROUP BY d.id),
docx AS (
  SELECT id, list_transform(xl0,
      h -> ((h % 2147483647) + 2147483647) % 2147483647) AS xl
  FROM doch WHERE len(xl0) > 0),
sigs AS (
  SELECT id, list_transform([$ab],
      p -> list_min(list_transform(xl, x -> (x * p[1] + p[2]) % 2147483647))) AS sig
  FROM docx),
bandstr AS (
  SELECT id * $bands + b AS sid,
         array_to_string(sig[$rowsPerBand*b+1:$rowsPerBand*b+$rowsPerBand], ',') AS s
  FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
${xxh64Cte("bandstr", "bx", 42L)},
buckets AS (
  ${stagesSql(hashIntStages(s"sid % $bands", "h"), "bxdone", Seq("sid", "h"))}
),
banded AS (
  SELECT sid // $bands AS id, ib4 AS bucket FROM buckets),
oversized AS (
  SELECT bucket FROM banded GROUP BY bucket HAVING count(*) > $maxBucket),
kept AS (
  SELECT b.id, b.bucket FROM banded b
  WHERE b.bucket NOT IN (SELECT bucket FROM oversized)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, bb.id AS id_b
  FROM kept a JOIN kept bb ON a.bucket = bb.bucket AND a.id < bb.id),
scored AS (
  SELECT p.id_a, p.id_b,
    CAST(list_sum(list_transform(generate_series(1, $numHashes),
        j -> CASE WHEN sa.sig[j] = sb.sig[j] THEN 1 ELSE 0 END)) AS DOUBLE) / $numHashes AS est_jaccard
  FROM pairs p
  JOIN sigs sa ON sa.id = p.id_a
  JOIN sigs sb ON sb.id = p.id_b)
SELECT id_a, id_b, est_jaccard FROM scored
WHERE est_jaccard >= $thresh
ORDER BY id_a, id_b"""
  }

  /**
   * Full-value oracle for [[Catalog.ddSimhash]] (previously `no_oracle`):
   * distinct tokens → xxhash64 ([[SqlXxh64]]) → 64 per-bit majority votes
   * packed to the sign vector → 16-bit pigeonhole quarters → block
   * self-join with hamming <= 3, exactly as Dedup.simhashPairs plans it.
   */
  def ddSimhash: String = {
    import SqlXxh64._
    val maxDist = 3
    val maxBlockSize = 1000
    s"""WITH RECURSIVE
corp AS (
  SELECT doc_id AS id,
         list_distinct(string_split_regex(lower(trim(text)), '[\\s\\x0b]+')) AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
ts AS (SELECT DISTINCT unnest(toks) AS s FROM corp),
tid AS (SELECT row_number() OVER (ORDER BY s) AS sid, s FROM ts),
${xxh64Cte("tid", "tx", 42L)},
doch AS (
  SELECT d.id, list(x.h) AS hl
  FROM (SELECT id, unnest(toks) AS s FROM corp) d
  JOIN txdone x USING (s)
  GROUP BY d.id),
packed AS (
  SELECT id,
    CAST(list_sum(list_transform(generate_series(0, 63),
      b -> CASE WHEN 2 * list_sum(list_transform(hl, x -> ((x >> b) & 1)::BIGINT)) > len(hl)
           THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END)) AS UBIGINT) AS sh
  FROM doch WHERE len(hl) > 0),
blocked AS (
  SELECT id, sh, q, ((sh >> (q * 16)) & 65535) AS v
  FROM packed, unnest(generate_series(0, 3)) AS t(q)),
keepb AS (
  SELECT q, v FROM blocked GROUP BY q, v HAVING count(*) <= $maxBlockSize),
kept AS (SELECT b.* FROM blocked b JOIN keepb USING (q, v)),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM kept a JOIN kept b
    ON a.q = b.q AND a.v = b.v AND a.id < b.id
  WHERE bit_count(xor(a.sh, b.sh)) <= $maxDist)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM pairs
ORDER BY id_a, id_b"""
  }

  val ddCosPairs: String =
    """WITH base AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, label, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 100000, label, v FROM base WHERE vec_id % 25 = 0
      |  UNION ALL
      |  SELECT vec_id + 200000, label,
      |         list_concat([CAST(0 AS DOUBLE)], v[2:]) FROM base WHERE vec_id % 40 = 0),
      |k AS (SELECT label FROM e GROUP BY label HAVING count(*) <= 1000),
      |ek AS (SELECT e.* FROM e JOIN k USING (label)),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_dot_product(a.v, b.v)
      |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
      |  FROM ek a JOIN ek b ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /**
   * Oracle for [[Catalog.ddCosLsh]]: the [[ddCosPairs]] planted corpus,
   * blocked by the seeded hyperplane bucket instead of the label — the
   * planes regenerate from (dim, bits, seed) exactly as in [[annLsh]],
   * so DuckDB recomputes the identical bucket per vector and the block
   * self-join matches the engine pair-for-pair.
   */
  def ddCosLsh(dim: Int = 64): String = {
    val planes = graft.ops.Similarity.hyperplanes(dim = dim, bits = 4)
    val bucketOf = (v: String) => planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product($v, ${listLit(p)}) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")
    s"""WITH base AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0
       |  UNION ALL
       |  SELECT vec_id + 200000,
       |         list_concat([CAST(0 AS DOUBLE)], v[2:]) FROM base WHERE vec_id % 40 = 0),
       |b AS (
       |  SELECT vec_id, v, ${bucketOf("v")} AS bucket FROM e),
       |k AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= 1000),
       |bk AS (SELECT b.* FROM b JOIN k USING (bucket)),
       |p AS (
       |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       |    round(list_dot_product(a.v, b2.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))), 6) AS cos
       |  FROM bk a JOIN bk b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
       |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9
       |ORDER BY id_a, id_b""".stripMargin
  }

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

  val annKnnJoin: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT p.probe_id, e.vec_id AS corpus_id,
      |    round(list_dot_product(e.v, p.pv)
      |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.pv, p.pv))), 6) AS cos
      |  FROM e, p WHERE e.vec_id <> p.probe_id),
      |ranked AS (
      |  SELECT probe_id, corpus_id, cos,
      |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, corpus_id ASC) AS "rank"
      |  FROM scored)
      |SELECT probe_id, corpus_id, cos, CAST("rank" AS INT) AS "rank"
      |FROM ranked WHERE "rank" <= 3
      |ORDER BY probe_id, "rank"""".stripMargin

  /** Shortest-round-trip double literal: Double.toString parses back to the
   * identical bit pattern in DuckDB, so inlined lookup data (hyperplanes,
   * centroids) is byte-exact across engines. */
  private def dlit(x: Double): String = {
    val s = x.toString
    if (s == "NaN" || s.contains("Infinity"))
      throw new IllegalArgumentException(s"non-finite lookup value $x")
    s
  }
  private def listLit(v: Array[Double]): String = v.map(dlit).mkString("[", ", ", "]")

  /**
   * ann_lsh oracle: the hyperplanes are pure seed data
   * ([[graft.ops.Similarity.hyperplanes]](64, 4, seed=42) — no data
   * dependence), so they inline as literals and DuckDB recomputes the
   * bucket assignment exactly (publish-the-lookup-data design; the
   * reference does the same for ontology membership, Plugin/Ontology.pm:63-69).
   * Bucket bit b is sign(dot(v, plane_b)); both engines evaluate the dot
   * in double precision, so the sign agrees bit-for-bit.
   */
  def annLsh(dim: Int = 64): String = {
    val planes = graft.ops.Similarity.hyperplanes(dim = dim, bits = 4)
    val bucketOf = (v: String) => planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product($v, ${listLit(p)}) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |b AS (
       |  SELECT e.vec_id, e.v,
       |    ${bucketOf("e.v")} AS bucket,
       |    ${bucketOf("q.qv")} AS qbucket,
       |    q.qv
       |  FROM e, q WHERE e.vec_id <> 0)
       |SELECT vec_id,
       |  round(list_dot_product(v, qv)
       |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
       |FROM b WHERE bucket = qbucket
       |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
  }

  /**
   * ann_ivf oracle, parameterized by the centroid table the Spark query
   * actually used (recorded by [[Catalog.annIvf]], inlined by Verify at
   * oracle-dump time — the centroids are data-derived, so unlike the LSH
   * planes they cannot be static). DuckDB recomputes the nearest-centroid
   * assignment (squared L2, ties to the lower index — same contract as
   * [[graft.ops.Similarity.nearestCentroid]]), the nprobe=2 probe list,
   * and the exact cosine rerank.
   */
  def annIvf(centroids: Array[Array[Double]], nprobe: Int = 2): String = {
    val cents = centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${listLit(c)})" }.mkString(",\n    ")
    s"""WITH cents(ci, c) AS (VALUES
       |    $cents),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |assign AS (
       |  SELECT e.vec_id, e.v, cents.ci,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cents.c)
       |        + list_dot_product(cents.c, cents.c) ASC, cents.ci ASC) AS rn
       |  FROM e, cents WHERE e.vec_id <> 0),
       |probe AS (
       |  SELECT cents.ci FROM cents, q
       |  ORDER BY list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, cents.c)
       |    + list_dot_product(cents.c, cents.c) ASC, cents.ci ASC LIMIT $nprobe)
       |SELECT a.vec_id,
       |  round(list_dot_product(a.v, q.qv)
       |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
       |FROM assign a, q
       |WHERE a.rn = 1 AND a.ci IN (SELECT ci FROM probe)
       |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin
  }

  /**
   * Oracle for [[Catalog.annPq]], parameterized by the trained codebooks
   * (inlined post-run like [[annIvf]]'s centroids). Recomputes per-subspace
   * code assignment — expanded-dot squared L2 via `list_dot_product`, ties
   * to the lower code, the EXACT arithmetic [[graft.functions.PqEncode]]
   * performs, so codes match bit-for-bit — and the ADC distance as the sum
   * of per-subspace expanded-dot distances from the query's slices to the
   * chosen codes (the lookup table the kernel sums, restated as SQL);
   * round-6 absorbs the aggregate-vs-sequential sum-order ulp.
   */
  def annPq(codebooks: Array[Array[Array[Double]]]): String = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cb = codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => s"($j, $c, ${listLit(cent)})" }
    }.mkString(",\n    ")
    s"""WITH cb(j, c, cent) AS (VALUES
       |    $cb),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       |sub AS (
       |  SELECT vec_id, j, v[j * $dsub + 1 : (j + 1) * $dsub] AS sv
       |  FROM (SELECT vec_id, v FROM e WHERE vec_id <> 0), js),
       |assign AS (
       |  SELECT vec_id, j, c, cent,
       |    row_number() OVER (PARTITION BY vec_id, j ORDER BY
       |      list_dot_product(sv, sv) - 2 * list_dot_product(sv, cent)
       |        + list_dot_product(cent, cent) ASC, c ASC) AS rn
       |  FROM sub JOIN cb USING (j)),
       |ch AS (SELECT vec_id, j, c, cent FROM assign WHERE rn = 1),
       |qs AS (
       |  SELECT j, qv[j * $dsub + 1 : (j + 1) * $dsub] AS sv
       |  FROM (SELECT v AS qv FROM e WHERE vec_id = 0), js),
       |adc AS (
       |  SELECT ch.vec_id,
       |    round(sum(list_dot_product(qs.sv, qs.sv)
       |      - 2 * list_dot_product(qs.sv, ch.cent)
       |      + list_dot_product(ch.cent, ch.cent)), 6) AS adc,
       |    max(CASE WHEN ch.j = 0 THEN ch.c END) AS code0
       |  FROM ch JOIN qs USING (j) GROUP BY ch.vec_id)
       |SELECT vec_id, CAST(code0 AS INT) AS code0, adc
       |FROM adc ORDER BY adc ASC, vec_id ASC LIMIT 10""".stripMargin
  }

  /**
   * Oracle for [[Catalog.annIvfPq]], parameterized by BOTH trained
   * parameter sets (inlined post-run). The IVF half is [[annIvf]]'s
   * assignment + probe-list restatement verbatim; the PQ half is
   * [[annPq]]'s per-subspace assignment + ADC sum restricted to the
   * probed cells' survivors — the exact candidate set the engine's
   * isin filter admits. `cell` pins coarse routing, `code0` the fine
   * assignment; round-6 absorbs sum-order ulp as everywhere.
   */
  def annIvfPq(centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nprobe: Int = 2): String = {
    val cents = centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${listLit(c)})" }.mkString(",\n    ")
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val cb = codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => s"($j, $c, ${listLit(cent)})" }
    }.mkString(",\n    ")
    s"""WITH cents(ci, c) AS (VALUES
       |    $cents),
       |cb(j, pc, cent) AS (VALUES
       |    $cb),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |assign AS (
       |  SELECT e.vec_id, e.v, cents.ci,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cents.c)
       |        + list_dot_product(cents.c, cents.c) ASC, cents.ci ASC) AS rn
       |  FROM e, cents WHERE e.vec_id <> 0),
       |probe AS (
       |  SELECT cents.ci FROM cents, q
       |  ORDER BY list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, cents.c)
       |    + list_dot_product(cents.c, cents.c) ASC, cents.ci ASC LIMIT $nprobe),
       |cand AS (
       |  SELECT a.vec_id, a.v, a.ci FROM assign a
       |  WHERE a.rn = 1 AND a.ci IN (SELECT ci FROM probe)),
       |js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       |sub AS (
       |  SELECT vec_id, j, v[j * $dsub + 1 : (j + 1) * $dsub] AS sv
       |  FROM cand, js),
       |passign AS (
       |  SELECT vec_id, j, pc, cent,
       |    row_number() OVER (PARTITION BY vec_id, j ORDER BY
       |      list_dot_product(sv, sv) - 2 * list_dot_product(sv, cent)
       |        + list_dot_product(cent, cent) ASC, pc ASC) AS rn
       |  FROM sub JOIN cb USING (j)),
       |ch AS (SELECT vec_id, j, pc, cent FROM passign WHERE rn = 1),
       |qs AS (
       |  SELECT j, qv[j * $dsub + 1 : (j + 1) * $dsub] AS sv
       |  FROM (SELECT v AS qv FROM e WHERE vec_id = 0), js),
       |adc AS (
       |  SELECT ch.vec_id,
       |    round(sum(list_dot_product(qs.sv, qs.sv)
       |      - 2 * list_dot_product(qs.sv, ch.cent)
       |      + list_dot_product(ch.cent, ch.cent)), 6) AS adc,
       |    max(CASE WHEN ch.j = 0 THEN ch.pc END) AS code0
       |  FROM ch JOIN qs USING (j) GROUP BY ch.vec_id)
       |SELECT adc.vec_id, CAST(cand.ci AS INT) AS cell,
       |  CAST(code0 AS INT) AS code0, adc
       |FROM adc JOIN cand USING (vec_id)
       |ORDER BY adc ASC, vec_id ASC LIMIT 10""".stripMargin
  }

  /**
   * Full-value oracle for [[Catalog.ddSemantic]], parameterized by the
   * centroids the Spark query trained (inlined post-run like [[annIvf]]'s).
   * Restates the ENTIRE SemDeDup pipeline in SQL: the planted clone corpus
   * (as [[ddCosPairs]]), nearest-centroid assignment (expanded-dot squared
   * L2, ties to the lower index — [[graft.ops.Similarity.nearestCentroid]]'s
   * contract, the same formulation [[annIvf]] proved engine-exact), the
   * degenerate-block cap, in-cluster pair cosines at round-6, the
   * recursive-CTE component closure, and the min-id keep rule.
   */
  def ddSemantic(centroids: Array[Array[Double]],
      maxBlockSize: Int = 1000): String = {
    val cents = centroids.zipWithIndex
      .map { case (c, i) => s"($i, ${listLit(c)})" }.mkString(",\n    ")
    s"""WITH RECURSIVE cents(ci, c) AS (VALUES
       |    $cents),
       |base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, v FROM base WHERE vec_id % 25 = 0
       |  UNION ALL
       |  SELECT vec_id + 200000,
       |         list_concat([CAST(0 AS DOUBLE)], v[2:]) FROM base WHERE vec_id % 40 = 0),
       |assign AS (
       |  SELECT e.vec_id, e.v, cents.ci,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, cents.c)
       |        + list_dot_product(cents.c, cents.c) ASC, cents.ci ASC) AS rn
       |  FROM e, cents),
       |a AS (SELECT vec_id, v, ci AS cluster FROM assign WHERE rn = 1),
       |keep_c AS (
       |  SELECT cluster FROM a GROUP BY cluster HAVING count(*) <= $maxBlockSize),
       |ak AS (SELECT a.* FROM a JOIN keep_c USING (cluster)),
       |edges AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM ak x JOIN ak y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  WHERE round(list_dot_product(x.v, y.v)
       |    / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
       |    >= 0.9),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
       |        UNION ALL SELECT id_b, id_a FROM edges),
       |cc AS (
       |  SELECT DISTINCT src AS id, src AS comp FROM sym
       |  UNION
       |  SELECT sym.src AS id, cc.comp FROM cc JOIN sym ON cc.id = sym.dst
       |),
       |comp AS (SELECT id, min(comp) AS component FROM cc GROUP BY id)
       |SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster, comp.component,
       |  (comp.component IS NULL OR comp.component = a.vec_id) AS keep
       |FROM a LEFT JOIN comp ON a.vec_id = comp.id
       |ORDER BY a.vec_id""".stripMargin
  }

  val mmMeta: String =
    """SELECT doc_id AS asset_id, 'text' AS modality, 'text/plain' AS mime,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS "sha256"
      |FROM documents ORDER BY asset_id""".stripMargin

  /** The expected table for the synthetic multimodal corpora: each
   * generator's closed formulas (PNG dims; WAV rate/bits/duration; GVF1
   * first-frame dims + frame-count duration) restated in SQL. A match
   * proves three real encode-decode round trips
   * ([[Catalog.mmFeatures]]). */
  val mmFeatures: String =
    """SELECT CAST(doc_id AS BIGINT) AS asset_id, 'image' AS modality,
      |  CAST(16 + doc_id % 32 AS INT) AS width,
      |  CAST(16 + (doc_id * 7) % 32 AS INT) AS height,
      |  CAST(0 AS BIGINT) AS duration_ms
      |FROM documents
      |UNION ALL
      |SELECT CAST(doc_id + 1000000 AS BIGINT), 'audio',
      |  CAST(8000 AS INT),  -- width slot carries the sample rate
      |  CAST(16 AS INT),    -- height slot carries bits per sample
      |  CAST(500 + ((doc_id + 1000000) % 32) * 50 AS BIGINT)
      |FROM documents
      |UNION ALL
      |SELECT CAST(doc_id + 2000000 AS BIGINT), 'video',
      |  CAST(8 + (doc_id + 2000000) % 16 AS INT),
      |  CAST(8 + ((doc_id + 2000000) * 3) % 16 AS INT),
      |  CAST(400 + ((doc_id + 2000000) % 8) * 100 AS BIGINT)
      |FROM documents
      |ORDER BY asset_id""".stripMargin

  /** Frame-sample oracle: every 2nd frame index below the per-asset frame
   * count, with the container's shared frame dims ([[Catalog.mmFrames]]). */
  val mmFrames: String =
    """SELECT CAST(doc_id AS BIGINT) AS asset_id,
      |  CAST(t.f AS INT) AS frame_idx,
      |  CAST(8 + doc_id % 16 AS INT) AS width,
      |  CAST(8 + (doc_id * 3) % 16 AS INT) AS height
      |FROM documents, unnest(generate_series(0, CAST(4 + doc_id % 8 AS INT) - 1, 2)) AS t(f)
      |ORDER BY asset_id, frame_idx""".stripMargin

  /** Shared rule conditions for the dependency checklist over derived
   * document columns (mirrors Catalog.depFrame / depChecklist). */
  private val depRules =
    """WITH r AS (
      |  SELECT doc_id,
      |    (doc_id % 2 = 0) AS even,
      |    (doc_id % 5 = 0) AS t_null,
      |    (doc_id % 3 = 0) AS e_pres,
      |    (doc_id % 7 = 0) AS a_unknown,
      |    (doc_id % 7 <> 0 AND doc_id % 4 <> 0) AS a_comp,
      |    (doc_id % 6 = 0) AS c_pres
      |  FROM documents
      |), v AS (
      |  SELECT doc_id, even, t_null, e_pres, a_comp, c_pres,
      |    (NOT c_pres) AS c_required,
      |    (even AND t_null) AS if_then_invalid,
      |    (even AND e_pres) AS if_else_present,
      |    ((NOT even) AND NOT e_pres) AS if_else_invalid,
      |    ((NOT even) AND NOT t_null) AS if_then_present,
      |    (CAST(a_comp AS INT) + CAST(c_pres AS INT)) AS completed,
      |    (CAST(a_comp AS INT) + CAST(c_pres AS INT) <> 1) AS one_of_viol,
      |    (CAST(a_comp AS INT) + CAST(c_pres AS INT) < 1) AS some_of_viol
      |  FROM r
      |)""".stripMargin

  val depVerdict: String =
    depRules +
      """
        |SELECT doc_id,
        |  NOT (c_required OR if_then_invalid OR if_else_present OR if_else_invalid
        |       OR if_then_present OR one_of_viol OR some_of_viol) AS passed,
        |  (CAST(c_required AS INT) + CAST(if_then_invalid AS INT)
        |   + CAST(if_else_present AS INT) + CAST(if_else_invalid AS INT)
        |   + CAST(if_then_present AS INT) + CAST(one_of_viol AS INT)
        |   + CAST(some_of_viol AS INT)) AS n_violations,
        |  CASE WHEN c_required OR if_then_invalid OR if_else_present OR if_else_invalid
        |            OR if_then_present OR one_of_viol OR some_of_viol
        |    THEN '[errors found on row ' || CAST(doc_id AS VARCHAR) || '] ' || trim(
        |      CASE WHEN c_required THEN '[''c'' is a required field] ' ELSE '' END ||
        |      CASE WHEN if_then_invalid THEN ' [field ''t'' must be valid if field ''b'' is set to true]' ELSE '' END ||
        |      CASE WHEN if_else_present THEN ' [field ''e'' should not be completed if field ''b'' is set to true]' ELSE '' END ||
        |      CASE WHEN if_else_invalid THEN ' [field ''e'' must be valid if field ''b'' is set to false]' ELSE '' END ||
        |      CASE WHEN if_then_present THEN ' [field ''t'' should not be completed if field ''b'' is set to false]' ELSE '' END ||
        |      CASE WHEN one_of_viol THEN ' [exactly one field out of ''a'', ''c'' should be completed (found ' || CAST(completed AS VARCHAR) || ') and not ''unknown'']' ELSE '' END ||
        |      CASE WHEN some_of_viol THEN ' [at least one field out of ''a'', ''c''should be completed and not ''unknown'']' ELSE '' END)
        |    ELSE NULL END AS error
        |FROM v ORDER BY doc_id""".stripMargin

  val depRuleCounts: String =
    depRules +
      """
        |SELECT rule_id, field, n FROM (
        |  SELECT 'required' AS rule_id, 'c' AS field, count(*) FILTER (WHERE c_required) AS n FROM v
        |  UNION ALL
        |  SELECT 'if_then_invalid', 't', count(*) FILTER (WHERE if_then_invalid) FROM v
        |  UNION ALL
        |  SELECT 'if_else_present', 'e', count(*) FILTER (WHERE if_else_present) FROM v
        |  UNION ALL
        |  SELECT 'if_else_invalid', 'e', count(*) FILTER (WHERE if_else_invalid) FROM v
        |  UNION ALL
        |  SELECT 'if_then_present', 't', count(*) FILTER (WHERE if_then_present) FROM v
        |  UNION ALL
        |  SELECT 'one_of', 'a,c', count(*) FILTER (WHERE one_of_viol) FROM v
        |  UNION ALL
        |  SELECT 'some_of', 'a,c', count(*) FILTER (WHERE some_of_viol) FROM v
        |) WHERE n > 0 ORDER BY rule_id, field""".stripMargin

  val vDatetime: String =
    """SELECT o_orderkey,
      |  CASE CAST(o_orderkey % 5 AS INT)
      |    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |    WHEN 1 THEN strftime(o_orderdate, '%y-%m-%d')
      |    WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
      |    WHEN 3 THEN 'not-a-date'
      |    ELSE strftime(o_orderdate, '%Y%m%dT%H%M%S') END AS ds,
      |  (o_orderkey % 5 IN (0, 2, 4)) AS passed
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val vBool: String =
    """SELECT event_id,
      |  CASE event_type WHEN 'click' THEN 'yes' WHEN 'view' THEN 'TRUE'
      |    WHEN 'purchase' THEN '1' WHEN 'signup' THEN 'nope' ELSE 'false' END AS bs,
      |  (event_type <> 'signup') AS passed
      |FROM events ORDER BY event_id""".stripMargin

  val vTaxonomy: String =
    """SELECT n_nationkey,
      |  CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_nationkey AS VARCHAR)
      |       ELSE n_name END AS v,
      |  (CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_nationkey AS VARCHAR)
      |        ELSE n_name END
      |     IN (SELECT CAST(n_nationkey AS VARCHAR) FROM nation WHERE n_regionkey <= 2)
      |   OR CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_nationkey AS VARCHAR)
      |           ELSE n_name END
      |     IN (SELECT n_name FROM nation WHERE n_regionkey <= 1)) AS passed
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Closed-form nested-set CTE shared by the tax-tree oracles. */
  private val taxTreeCte: String =
    """WITH counts AS (SELECT n_regionkey AS rk, count(*) AS cnt FROM nation GROUP BY 1),
      |regions AS (
      |  SELECT r.r_regionkey AS rk, r.r_name AS name, c.cnt,
      |    2 + coalesce(SUM(2 + 2 * c.cnt) OVER (ORDER BY r.r_regionkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lft
      |  FROM region r JOIN counts c ON r.r_regionkey = c.rk),
      |nations AS (
      |  SELECT n_nationkey AS id, n_name AS name, n_regionkey AS rk,
      |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1 AS pos
      |  FROM nation),
      |allnodes AS (
      |  SELECT CAST(1000 AS BIGINT) AS tax_id, 'ROOT' AS name, CAST(1 AS BIGINT) AS lft,
      |    CAST(2 * (1 + (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)) AS BIGINT) AS rgt,
      |    CAST(1000 AS BIGINT) AS parent_tax_id
      |  UNION ALL
      |  SELECT CAST(100 + rk AS BIGINT), name, CAST(lft AS BIGINT),
      |    CAST(lft + 2 * cnt + 1 AS BIGINT), CAST(1000 AS BIGINT) FROM regions
      |  UNION ALL
      |  SELECT CAST(n.id AS BIGINT), n.name, CAST(r.lft + 1 + 2 * n.pos AS BIGINT),
      |    CAST(r.lft + 2 + 2 * n.pos AS BIGINT), CAST(100 + n.rk AS BIGINT)
      |  FROM nations n JOIN regions r ON n.rk = r.rk)""".stripMargin

  val qTaxtree: String = taxTreeCte +
    "\nSELECT tax_id, name, lft, rgt, parent_tax_id FROM allnodes ORDER BY tax_id"

  val qTaxDesc: String = taxTreeCte + """
    |SELECT d.tax_id, d.name, d.lft, d.rgt, d.parent_tax_id
    |FROM allnodes d, allnodes a
    |WHERE a.tax_id = 102 AND d.lft > a.lft AND d.rgt < a.rgt
    |ORDER BY d.tax_id""".stripMargin

  /** Oracle for [[Catalog.qTaxtreeDist]] — the SAME SQL as [[qTaxtree]]:
   * the distributed build must reproduce the driver DFS numbering. */
  val qTaxtreeDist: String = qTaxtree

  val evWindow: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n,
      |  round(sum(value), 6) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /**
   * Oracle for [[Catalog.qRiBloom]]: the Bloom probe + confirm anti-join
   * is EXACT by construction (no false negatives; false positives
   * rejected by the confirm join), so the oracle is the plain anti-join —
   * the same statement as qRiUser over the < 120 dimension.
   */
  val qRiBloom: String =
    """SELECT user_id, count(*) AS n_rows FROM events
      |WHERE user_id IS NOT NULL
      |  AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 10 < 8)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /**
   * Oracle for [[Catalog.qAsof]]: the same union-tag + carry-forward-max
   * window the engine runs, in DuckDB SQL — `max(struct)` over
   * (key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT) with right
   * rows sorting before left rows at equal ts, struct ordered
   * (qts, order_key, px) so ties resolve identically in both engines.
   * Validated against a correlated-subquery ground truth (10k/10k rows)
   * during development.
   */
  val qAsof: String =
    """WITH quotes AS (
      |  SELECT o_custkey % 150 AS user_id,
      |    TIMESTAMP '2024-01-01' + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS qts,
      |    o_orderkey AS order_key, round(o_totalprice, 2) AS px
      |  FROM orders
      |), tagged AS (
      |  SELECT user_id, ts, event_id,
      |    NULL::STRUCT(qts TIMESTAMP, order_key BIGINT, px DOUBLE) AS q,
      |    1 AS side
      |  FROM events
      |  UNION ALL
      |  SELECT user_id, qts AS ts, NULL AS event_id,
      |    struct_pack(qts := qts, order_key := order_key, px := px) AS q,
      |    0 AS side
      |  FROM quotes WHERE qts IS NOT NULL
      |), carried AS (
      |  SELECT event_id, user_id, ts,
      |    max(q) OVER (PARTITION BY user_id ORDER BY ts, side
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best
      |  FROM tagged
      |)
      |SELECT event_id, user_id, ts, best.qts AS qts,
      |  best.order_key AS order_key, best.px AS px
      |FROM carried WHERE event_id IS NOT NULL ORDER BY event_id""".stripMargin

  /** Oracle for [[Catalog.qAsofSkew]] — the SAME SQL as [[qAsof]]: the
   * time-bucket-chunked form must be row-identical to the plain form. */
  val qAsofSkew: String = qAsof

  /**
   * Oracle for [[Catalog.evSessions]]: Spark's session_window merges
   * ADJACENT windows — an event exactly `gap` after the previous one
   * continues the session (pinned by OpsSpec) — hence the strict `>` in
   * the new-session flag; session_end is `last ts + gap`.
   */
  val evSessions: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS newf
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |    sum(newf) OVER (PARTITION BY user_id ORDER BY ts
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 4 HOUR AS session_end,
      |  count(*) AS n_events, round(sum(value), 6) AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /**
   * Oracle for [[Catalog.qPack]]: the shared whitespace tokenizer's count,
   * the per-source running total in doc_id order, and the integer chunk
   * formulas — `chunk_first = (cum - n) // B`,
   * `chunk_last = greatest(chunk_first, (cum - 1) // B)` (the guard keeps
   * zero-token docs well-formed), `chunk_offset = (cum - n) % B` —
   * restated verbatim at B = 128.
   */
  val qPack: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CASE WHEN text IS NULL OR trim(text) = '' THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '[\s\x0b]+')) END AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca
      |  FROM t
      |)
      |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((ca - n_tokens) // 128 AS BIGINT) AS chunk_first,
      |  CAST(greatest((ca - n_tokens) // 128, (ca - 1) // 128) AS BIGINT) AS chunk_last,
      |  CAST((ca - n_tokens) % 128 AS BIGINT) AS chunk_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.qRange]]: the PLAIN inequality join — the
   * bucketized rewrite is exact (a point lives in exactly one bucket, so
   * the equi-join + BETWEEN residual is duplicate-free by construction),
   * and this oracle proves it by not mirroring the buckets at all.
   */
  val qRange: String =
    """WITH w AS (
      |  SELECT o_custkey % 150 AS user_id,
      |    TIMESTAMP '2024-01-01' + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS w_start,
      |    TIMESTAMP '2024-01-01'
      |      + (o_orderkey % 43200 + (o_orderkey % 7 + 1) * 10) * INTERVAL 1 MINUTE AS w_end,
      |    o_orderkey AS order_key
      |  FROM orders
      |)
      |SELECT e.event_id, e.user_id, e.ts, w.order_key
      |FROM events e JOIN w
      |  ON e.user_id = w.user_id AND e.ts >= w.w_start AND e.ts <= w.w_end
      |ORDER BY event_id, order_key""".stripMargin

  /**
   * Oracle for [[Catalog.qSalted]]: the plain UNSALTED join + aggregate —
   * salting only relocates rows across reducers, so result identity with
   * this oracle is the whole correctness claim. Dyadic weights x integral
   * quantities keep the double sum exact (order-independent) in both
   * engines.
   */
  val qSalted: String =
    """SELECT l.l_returnflag, count(*) AS n,
      |  sum(l.l_quantity * d.weight) AS wqty
      |FROM lineitem l
      |JOIN (VALUES ('A', CAST(0.5 AS DOUBLE)), ('N', CAST(1.0 AS DOUBLE)),
      |             ('R', CAST(0.25 AS DOUBLE))) AS d(l_returnflag, weight)
      |  ON l.l_returnflag = d.l_returnflag
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  /**
   * Oracle for [[Catalog.qStrat]]: the same xxhash64(doc_id) bucket as
   * [[qSplit]] (seed 42, 8-byte path, [[SqlXxh64.hashLongStages]]) against
   * per-source floor'd thresholds INTERPOLATED from the very map the
   * engine samples with ([[Catalog.qStratFractions]]) — a source outside
   * the map hits the CASE default 0 exactly like stratifiedSample's
   * absent-stratum contract, so a fixture scale-up can't silently diverge.
   */
  def qStrat: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("doc_id", 42L), "documents",
      Seq("doc_id", "source", "n_chars"))
    val s = SqlXxh64.signed("lb4")
    val cases = Catalog.qStratFractions.toSeq.sortBy(_._1).map {
      case (src, f) => s"WHEN '$src' THEN ${math.floor(f * 10000).toInt}"
    }.mkString(" ")
    s"""WITH h AS (
       |  $hashed
       |), b AS (
       |  SELECT doc_id, source, n_chars,
       |    ((($s) % 10000) + 10000) % 10000 AS bucket FROM h
       |)
       |SELECT doc_id, source, n_chars FROM b
       |WHERE bucket < (CASE source $cases ELSE 0 END)
       |ORDER BY doc_id""".stripMargin
  }

  /**
   * Oracle for [[Catalog.annQuant]]: recomputes the per-dim min/max
   * calibration, the EXACT integer codes (`floor`, not round — both
   * engines truncate identical IEEE doubles identically; `code0` pins dim
   * 1 bit-for-bit), the midpoint reconstruction, and the reconstructed
   * cosine — every float expression restated with the engine's
   * parenthesization, the final score rounded to 6 as everywhere else.
   */
  val annQuant: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), u AS (
      |  SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM e
      |), st AS (
      |  SELECT pos, min(x) AS mn, max(x) AS mx FROM u GROUP BY pos
      |), q AS (
      |  SELECT vec_id, pos, mn, mx,
      |    CASE WHEN mx = mn THEN -128
      |         ELSE CAST(greatest(0, least(255,
      |                floor((x - mn) * (256.0 / (mx - mn))))) AS INT) - 128
      |    END AS qc
      |  FROM u JOIN st USING (pos)
      |), d AS (
      |  SELECT vec_id, pos, qc,
      |    mn + (qc + 128.5) * ((mx - mn) / 256.0) AS xh
      |  FROM q
      |), vv AS (
      |  SELECT vec_id, list(xh ORDER BY pos) AS xv,
      |    list(qc ORDER BY pos)[1] AS code0
      |  FROM d GROUP BY vec_id
      |), p AS (SELECT xv AS pv FROM vv WHERE vec_id = 0)
      |SELECT vec_id, code0,
      |  round(list_dot_product(xv, pv)
      |    / (sqrt(list_dot_product(xv, xv)) * sqrt(list_dot_product(pv, pv))), 6) AS qcos
      |FROM vv, p WHERE vec_id <> 0
      |ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin

  /**
   * Oracle for [[Catalog.qWsample]]: the A-ES key restated — bucket from
   * the staged SQL XXH64 (seed 42, 8-byte path), the same
   * `(bucket + 0.5) / 2^20` uniform and `pow(u, 1.0 / (n_chars / 100.0))`
   * expression, ranked key DESC with ascending-id ties (TopKByScore's
   * heap order).
   */
  def qWsample: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("doc_id", 42L), "documents",
      Seq("doc_id", "n_chars"))
    val s = SqlXxh64.signed("lb4")
    s"""WITH h AS (
       |  $hashed
       |), b AS (
       |  SELECT doc_id, n_chars,
       |    ((($s) % 1048576) + 1048576) % 1048576 AS bucket FROM h
       |), kk AS (
       |  SELECT doc_id,
       |    pow((bucket + 0.5) / 1048576.0, 1.0 / (n_chars / 100.0)) AS key
       |  FROM b WHERE n_chars IS NOT NULL AND n_chars / 100.0 > 0
       |)
       |SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank,
       |  doc_id, round(key, 6) AS key
       |FROM kk ORDER BY key DESC, doc_id LIMIT 20""".stripMargin
  }

  /** Oracle for [[Catalog.qCorr]]: per-pair corr + pair-count restated
   * directly — both engines implement the SQL pair-exclusion contract,
   * and corr's scale-free magnitude keeps round-6 far above
   * summation-order ulp skew (covar_samp is deliberately NOT compared —
   * see the catalog entry). */
  val qCorr: String =
    """SELECT * FROM (
      |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
      |    count(CASE WHEN l_quantity IS NOT NULL
      |               AND l_extendedprice IS NOT NULL THEN 1 END) AS n,
      |    round(corr(l_quantity, l_extendedprice), 6) AS corr
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', 'l_discount',
      |    count(CASE WHEN l_extendedprice IS NOT NULL
      |               AND l_discount IS NOT NULL THEN 1 END),
      |    round(corr(l_extendedprice, l_discount), 6)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'l_tax', 'l_discount',
      |    count(CASE WHEN l_tax IS NOT NULL
      |               AND l_discount IS NOT NULL THEN 1 END),
      |    round(corr(l_tax, l_discount), 6)
      |  FROM lineitem)
      |ORDER BY col_a, col_b""".stripMargin

  /** One pair's association block for [[qMi]] — joint cell counts, then
   * marginal/joint Shannon entropies and MI from the same
   * `-(c/n)·ln(c/n)` terms the engine sums; every count reaches the
   * double domain through an explicit CAST so both engines divide
   * identical doubles. MI clamps at 0 before round-6 (the engine's
   * −0.0-artifact guard, restated). */
  private def miBlock(a: String, b: String): String =
    s"""SELECT '$a' AS col_a, '$b' AS col_b, n, distinct_a, distinct_b,
       |  round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
       |  round(h_ab, 6) AS h_joint,
       |  round(greatest(h_a + h_b - h_ab, 0), 6) AS mi,
       |  round(CASE WHEN h_a * h_b > 0
       |    THEN greatest(h_a + h_b - h_ab, 0) / sqrt(h_a * h_b) END, 6) AS nmi
       |FROM (
       |  WITH joint AS (
       |    SELECT CAST($a AS VARCHAR) AS va, CAST($b AS VARCHAR) AS vb,
       |      count(*) AS cnt
       |    FROM documents WHERE $a IS NOT NULL AND $b IS NOT NULL
       |    GROUP BY 1, 2
       |  ), tot AS (
       |    SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |      count(DISTINCT va) AS distinct_a,
       |      count(DISTINCT vb) AS distinct_b
       |    FROM joint
       |  ), ha AS (
       |    SELECT -sum((CAST(ca AS DOUBLE) / n) * ln(CAST(ca AS DOUBLE) / n)) AS h_a
       |    FROM (SELECT va, sum(cnt) AS ca FROM joint GROUP BY va), tot
       |  ), hb AS (
       |    SELECT -sum((CAST(cb AS DOUBLE) / n) * ln(CAST(cb AS DOUBLE) / n)) AS h_b
       |    FROM (SELECT vb, sum(cnt) AS cb FROM joint GROUP BY vb), tot
       |  ), hab AS (
       |    SELECT -sum((CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)) AS h_ab
       |    FROM joint, tot
       |  )
       |  SELECT * FROM tot, ha, hb, hab
       |)""".stripMargin

  /** Oracle for [[Catalog.qMi]]: the three association pairs restated
   * per-pair ([[miBlock]]) and unioned; the symmetric flip and the
   * nmi==1 self-pair are the semantic pins. */
  val qMi: String =
    s"""SELECT * FROM (
       |${miBlock("lang", "source")}
       |UNION ALL
       |${miBlock("source", "lang")}
       |UNION ALL
       |${miBlock("lang", "lang")}
       |) ORDER BY col_a, col_b""".stripMargin

  /** Oracle for [[Catalog.qAnomaly]]: per-customer order counts, R-7
   * median + MAD (`quantile_cont`, the q_pct contract), the
   * 1.4826-scaled modified z-score, and the unrounded-|z| > 3.5 cut —
   * with the mad == 0 degenerate contract (NULL z, anomalous = false)
   * restated. Counts are integers, so med/MAD interpolate on exact
   * halves and the two engines divide bit-identical doubles. */
  val qAnomaly: String =
    """WITH m AS (
      |  SELECT o_custkey, CAST(count(*) AS DOUBLE) AS metric
      |  FROM orders GROUP BY o_custkey
      |), med AS (
      |  SELECT quantile_cont(metric, 0.5) AS med FROM m
      |), madt AS (
      |  SELECT quantile_cont(abs(metric - med), 0.5) AS mad FROM m, med
      |)
      |SELECT o_custkey, metric,
      |  round(med, 6) AS median, round(mad, 6) AS mad,
      |  round(CASE WHEN mad > 0
      |    THEN (metric - med) / (1.4826 * mad) END, 6) AS robust_z,
      |  CASE WHEN mad > 0
      |    THEN abs((metric - med) / (1.4826 * mad)) > 3.5
      |    ELSE FALSE END AS anomalous
      |FROM m, med, madt ORDER BY o_custkey""".stripMargin

  /**
   * Oracle for [[Catalog.qMoments]]: exact HUGEINT power sums (the
   * engine's DECIMAL(38,0) sums are equally exact, so both engines feed
   * IDENTICAL doubles into the moment formulas), then the same
   * left-associated central-moment expressions, round-6, NULL
   * skew/kurtosis for constant groups.
   */
  val qMoments: String =
    """WITH s AS (
      |  SELECT lang, count(n_chars) AS n,
      |    sum(CAST(n_chars AS HUGEINT)) AS s1,
      |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2,
      |    sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS s3,
      |    sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars * n_chars) AS s4
      |  FROM documents GROUP BY lang
      |), d AS (
      |  SELECT lang, n,
      |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
      |    CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
      |    CAST(s4 AS DOUBLE) AS s4d
      |  FROM s
      |), m AS (
      |  SELECT lang, n, s1d / nd AS mean,
      |    s2d / nd - (s1d / nd) * (s1d / nd) AS m2,
      |    s3d / nd - 3.0 * (s1d / nd) * (s2d / nd)
      |      + 2.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m3,
      |    s4d / nd - 4.0 * (s1d / nd) * (s3d / nd)
      |      + 6.0 * (s1d / nd) * (s1d / nd) * (s2d / nd)
      |      - 3.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m4
      |  FROM d
      |)
      |SELECT lang, n, round(mean, 6) AS mean, round(m2, 6) AS variance,
      |  round(CASE WHEN m2 > 0 THEN m3 / pow(m2, 1.5) END, 6) AS skewness,
      |  round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END, 6) AS kurtosis
      |FROM m ORDER BY lang""".stripMargin

  /**
   * Oracle for [[Catalog.qBm25]]: the shared tokenizer, corpus stats
   * (count / avg token length / per-term document frequency), then the
   * Okapi term formula with the ENGINE'S exact literal association —
   * `idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))` where
   * 2.2 == double(1.2) + 1.0 bit-for-bit and 0.25/0.75 are dyadic, so
   * the only cross-engine float hazard is ln()'s final ulp, absorbed by
   * the round-6 convention. Ties rank by ascending doc_id, matching
   * TopKByScore's heap order.
   */
  val qBm25: String = {
    val terms = Seq("hash", "join", "spark")
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"count(*) FILTER (WHERE list_contains(toks, '$t')) AS df$i"
    }.mkString(",\n    ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val scoreExpr = terms.indices.map { i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * 2.2)" +
        s" / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    }.mkString("\n      + ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(lower(trim(text)), '[\\s\\x0b]+') AS toks
       |  FROM documents
       |), st AS (
       |  SELECT count(*) AS n, avg(len(toks)) AS avgdl,
       |    $dfCols
       |  FROM t
       |), d AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM t
       |), scored AS (
       |  SELECT doc_id,
       |    $scoreExpr AS score
       |  FROM d, st
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       |  doc_id, round(score, 6) AS score
       |FROM scored ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  /**
   * Oracle for [[Catalog.qBm25Batch]]: the same Okapi formula over
   * query-term-restricted postings — N/avgdl over non-NULL-text rows,
   * per-term df = distinct docs containing the term, per-(query, doc)
   * sum of term contributions, rank per query by (score DESC, doc_id).
   * Literals match the engine exactly (k1+1 = 2.2, 1-b = 0.25).
   */
  val qBm25Batch: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM documents WHERE text IS NOT NULL
      |), st AS (
      |  SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM t
      |), q(query_id, term) AS (
      |  VALUES (1, 'hash'), (1, 'join'), (1, 'spark'),
      |         (2, 'data'), (2, 'scan'), (3, 'the')
      |), post AS (
      |  SELECT doc_id, unnest(toks) AS tok,
      |    CAST(len(toks) AS DOUBLE) AS dl
      |  FROM t
      |), tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
      |  FROM post WHERE tok IN (SELECT DISTINCT term FROM q)
      |  GROUP BY doc_id, tok
      |), dfq AS (
      |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
      |), sc AS (
      |  SELECT q.query_id, tf.doc_id,
      |    sum(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
      |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl)))
      |      AS score
      |  FROM tf JOIN dfq USING (tok) JOIN q ON q.term = tf.tok, st
      |  GROUP BY q.query_id, tf.doc_id
      |), r AS (
      |  SELECT query_id, doc_id, score,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY score DESC, doc_id) AS rank
      |  FROM sc)
      |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
      |  doc_id, round(score, 6) AS score
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /**
   * Oracle for [[Catalog.ddInc]]: the same two derived delta batches, the
   * [[ddExact]] fingerprint (sha256 of whitespace-normalized lowercase),
   * first-wins-by-min-id WITHIN the delta, then NOT EXISTS against the
   * catalog of current-corpus fingerprints. NULL fingerprints are dropped
   * (the operator's documented contract).
   */
  val ddInc: String =
    """WITH delta AS (
      |  SELECT doc_id + 500000 AS doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN text ELSE text || ' fresh v2' END AS text
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id + 600000, text || ' fresh v2'
      |  FROM documents WHERE doc_id % 10 = 2
      |), f AS (
      |  SELECT doc_id,
      |    sha256(regexp_replace(lower(trim(text)), '[\s\x0b]+', ' ', 'g')) AS fingerprint
      |  FROM delta
      |  WHERE text IS NOT NULL
      |), w AS (
      |  SELECT f.doc_id, f.fingerprint FROM f
      |  JOIN (SELECT fingerprint, min(doc_id) AS doc_id FROM f GROUP BY fingerprint) m
      |    ON f.fingerprint = m.fingerprint AND f.doc_id = m.doc_id
      |), seen AS (
      |  SELECT DISTINCT
      |    sha256(regexp_replace(lower(trim(text)), '[\s\x0b]+', ' ', 'g')) AS fp
      |  FROM documents WHERE text IS NOT NULL
      |)
      |SELECT doc_id, fingerprint FROM w
      |WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = w.fingerprint)
      |ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.taNorm]]: the same deterministic combining-mark
   * planting (chr(769) = U+0301, chr(776) = U+0308, same replace order),
   * then utf8proc NFC vs the engine's java.text.Normalizer — sha256 of
   * the normalized text compares the bytes, octet lengths compare the
   * shrink, `changed` pins the ASCII fast path (false on unplanted rows).
   */
  val taNorm: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'a' || chr(769))
      |         ELSE text END AS t0
      |  FROM documents
      |), p2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN replace(t0, 'o', 'o' || chr(776))
      |         ELSE t0 END AS t
      |  FROM p
      |), n AS (SELECT doc_id, t, nfc_normalize(t) AS norm FROM p2)
      |SELECT doc_id, strlen(t) AS n_raw_bytes, strlen(norm) AS n_norm_bytes,
      |  sha256(norm) AS sha, (norm <> t) AS changed
      |FROM n ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.qPct]]: DuckDB `quantile_cont` shares Spark
   * `percentile`'s exact R-7 contract (linear interpolation at rank
   * p·(n-1)), rounded to 6 like every float surface.
   */
  val qPct: String =
    """SELECT lang,
      |  round(quantile_cont(n_chars, 0.25), 6) AS p25,
      |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
      |  round(quantile_cont(n_chars, 0.75), 6) AS p75,
      |  round(quantile_cont(n_chars, 0.95), 6) AS p95
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /**
   * Oracle for [[Catalog.taBlock]]: per (doc, literal), the greedy
   * non-overlapping occurrence count via replace-arithmetic
   * `(len(t) - len(replace(t, w, ''))) / len(w)` over the same lowered,
   * planted text — exactly the per-literal semantics the Aho–Corasick
   * kernel implements (its per-pattern greedy-by-end rule coincides with
   * sequential leftmost replace). n_terms counts literals with a hit;
   * keep mirrors the maxTerms=0 gate.
   */
  /** Oracle for [[Catalog.qJoinprof]]: per-key counts on both sides, the
   * product, and the (n_out DESC, key ASC) top-10. */
  val qJoinprof: String =
    """WITH ca AS (
      |  SELECT l_partkey AS key, count(*) AS n_a FROM lineitem
      |  WHERE l_partkey IS NOT NULL GROUP BY 1),
      |cb AS (
      |  SELECT l_partkey AS key, count(*) AS n_b FROM lineitem
      |  WHERE l_partkey IS NOT NULL AND l_quantity > 25 GROUP BY 1)
      |SELECT ca.key, ca.n_a, cb.n_b,
      |  CAST(CAST(ca.n_a AS HUGEINT) * cb.n_b AS DECIMAL(38,0)) AS n_out
      |FROM ca JOIN cb USING (key)
      |ORDER BY n_out DESC, key ASC LIMIT 10""".stripMargin

  /**
   * Oracle for [[Catalog.taDupspan]]: rebuilds each doc's DISTINCT 3-token
   * span hashes from raw text — the same tokenizer, shingling and
   * staged-SQL XXH64 as [[ddMinhash]] — then restates doc frequency, the
   * df>=2 dup set, and the per-doc counts/fraction (double division,
   * round-6). The hash values never reach the output, so the unsigned
   * UBIGINT form groups as well as Spark's signed longs.
   */
  def taDupspan: String = {
    import SqlXxh64._
    s"""WITH RECURSIVE
corp AS (
  SELECT doc_id AS id, string_split_regex(lower(trim(text)), '[\\s\\x0b]+') AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
dsh AS (
  SELECT id, list_distinct(list_transform(
      generate_series(1, greatest(len(toks) - 3, 0) + 1),
      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
  FROM corp),
shs AS (SELECT DISTINCT unnest(shingles) AS s FROM dsh),
shid AS (SELECT row_number() OVER (ORDER BY s) AS sid, s FROM shs),
${xxh64Cte("shid", "sx", 42L)},
dhd AS (
  SELECT DISTINCT d.id, x.h
  FROM (SELECT id, unnest(shingles) AS s FROM dsh) d
  JOIN sxdone x USING (s)),
dupes AS (SELECT h FROM dhd GROUP BY h HAVING count(*) >= 2)
SELECT dhd.id AS doc_id,
  CAST(count(*) AS INT) AS n_spans,
  CAST(count(CASE WHEN dupes.h IS NOT NULL THEN 1 END) AS INT) AS n_dup,
  round(CAST(count(CASE WHEN dupes.h IS NOT NULL THEN 1 END) AS DOUBLE)
    / count(*), 6) AS dup_frac
FROM dhd LEFT JOIN dupes ON dhd.h = dupes.h
GROUP BY dhd.id ORDER BY doc_id"""
  }

  /**
   * Oracle for [[Catalog.ddSpanrm]]: positional 3-token spans from the
   * shared tokenizer, duplicate span VALUES (count >= 2 sites), winner =
   * minimal (doc, pos) via row_number, non-winner sites cover positions
   * pos..pos+2, per-doc removal sets, and reassembly of surviving tokens
   * in order. Groups by the raw span string — value-identical to the
   * engine's xxhash64-keyed grouping.
   */
  val ddSpanrm: String =
    """WITH corp AS (
      |  SELECT doc_id AS id,
      |    regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS toks
      |  FROM documents WHERE text IS NOT NULL
      |), sp AS (
      |  SELECT id, i - 1 AS pos, array_to_string(toks[i:i+2], ' ') AS s
      |  FROM (SELECT id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
      |        FROM corp WHERE len(toks) >= 3)
      |), w AS (
      |  SELECT s, id, pos, cnt, rn FROM (
      |    SELECT s, id, pos,
      |      count(*) OVER (PARTITION BY s) AS cnt,
      |      row_number() OVER (PARTITION BY s ORDER BY id, pos) AS rn
      |    FROM sp)
      |), drops AS (
      |  SELECT DISTINCT w.id, u.p
      |  FROM w, unnest(generate_series(w.pos, w.pos + 2)) AS u(p)
      |  WHERE w.cnt >= 2 AND w.rn > 1
      |), d AS (
      |  SELECT id, list_sort(list(p)) AS dl, count(*) AS nrem
      |  FROM drops GROUP BY id
      |)
      |SELECT c.id AS doc_id,
      |  CAST(CASE WHEN len(c.toks) = 1 AND c.toks[1] = '' THEN 0
      |            ELSE len(c.toks) END AS INT) AS n_tokens,
      |  CAST(coalesce(d.nrem, 0) AS INT) AS n_removed,
      |  CASE WHEN d.id IS NULL THEN array_to_string(c.toks, ' ')
      |       ELSE coalesce(array_to_string(list_transform(
      |         list_filter(generate_series(0, len(c.toks) - 1),
      |           x -> NOT list_contains(d.dl, x)),
      |         x -> c.toks[x + 1]), ' '), '')
      |  END AS text_dedup
      |FROM corp c LEFT JOIN d USING (id) ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.taPmi]]: bigram and unigram counts over the
   * shared tokenizer, totals from the aggregated tables, and PMI with the
   * SAME double association the Spark expression fixes —
   * `((c12·T1)·T1) / ((T2·c1)·c2)` — so only ln's final ulp can differ,
   * absorbed by round-6.
   */
  val taPmi: String =
    """WITH d AS (
      |  SELECT CASE WHEN doc_id % 4 = 0 THEN text || ' neural network'
      |         ELSE text END AS text
      |  FROM documents WHERE text IS NOT NULL),
      |tk AS (SELECT regexp_split_to_array(lower(trim(text)), '[\s\x0b]+') AS t
      |       FROM d),
      |big AS (
      |  SELECT w1, w2, count(*) AS n_pair FROM (
      |    SELECT u.w1 AS w1, u.w2 AS w2 FROM (
      |      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |        i -> {'w1': t[i], 'w2': t[i+1]})) AS u
      |      FROM tk WHERE len(t) >= 2))
      |  GROUP BY w1, w2),
      |uni AS (
      |  SELECT w, count(*) AS n_w FROM (SELECT unnest(t) AS w FROM tk)
      |  GROUP BY w),
      |t1 AS (SELECT sum(n_w) AS v FROM uni),
      |t2 AS (SELECT sum(n_pair) AS v FROM big)
      |SELECT b.w1, b.w2, b.n_pair,
      |  round(ln((CAST(b.n_pair AS DOUBLE) * t1.v * t1.v)
      |    / ((CAST(t2.v AS DOUBLE) * u1.n_w) * u2.n_w)), 6) AS pmi
      |FROM big b
      |JOIN uni u1 ON b.w1 = u1.w
      |JOIN uni u2 ON b.w2 = u2.w, t1, t2
      |WHERE b.n_pair >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /**
   * Oracle for [[Catalog.taBoiler]]: rebuilds the planted multi-line
   * corpus, recomputes per-(domain,line) doc frequency over DISTINCT
   * (doc,line) incidences, applies both gates (`df >= 3` and
   * `df > 0.2 * n_docs` in DOUBLE arithmetic — IEEE-identical to the
   * Spark expression), and reassembles surviving lines in index order.
   * string_agg skips the NULLed boilerplate lines; coalesce covers an
   * all-boilerplate doc (Spark's array_join over an empty array is '').
   */
  val taBoiler: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    text
      |    || CASE WHEN doc_id % 3 = 0
      |         THEN chr(10) || 'COOKIE NOTICE ' || source ELSE '' END
      |    || CASE WHEN doc_id % 15 = 0
      |         THEN chr(10) || 'COOKIE NOTICE ' || source ELSE '' END
      |    || CASE WHEN doc_id % 31 = 0
      |         THEN chr(10) || 'RARE FOOTER ' || source ELSE '' END AS t
      |  FROM documents WHERE text IS NOT NULL),
      |ls AS (SELECT doc_id, source, string_split(t, chr(10)) AS parts FROM d),
      |l AS (
      |  SELECT doc_id, source, u.idx AS idx, u.line AS line FROM (
      |    SELECT doc_id, source,
      |      unnest(list_transform(generate_series(1, len(parts)),
      |        i -> {'idx': i, 'line': parts[i]})) AS u
      |    FROM ls)),
      |dom AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
      |ldf AS (
      |  SELECT source, line, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, source, line FROM l)
      |  GROUP BY source, line),
      |boiler AS (
      |  SELECT ldf.source, ldf.line FROM ldf JOIN dom USING (source)
      |  WHERE df >= 3 AND df > CAST(0.2 AS DOUBLE) * n_docs)
      |SELECT l.doc_id,
      |  CAST(count(*) AS INT) AS n_lines,
      |  CAST(count(CASE WHEN b.line IS NULL THEN 1 END) AS INT) AS n_kept,
      |  coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
      |    chr(10) ORDER BY l.idx), '') AS text_clean
      |FROM l LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
      |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin

  val taBlock: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    lower(CASE WHEN doc_id % 9 = 0 THEN text || ' BadWord okay BADWORD'
      |               ELSE text END) AS t
      |  FROM documents WHERE text IS NOT NULL
      |), d AS (
      |  SELECT * FROM (VALUES ('spark'), ('slow'), ('hash join'), ('badword')) v(w)
      |), c AS (
      |  SELECT doc_id,
      |    (length(t) - length(replace(t, w, ''))) / length(w) AS cnt
      |  FROM p CROSS JOIN d
      |)
      |SELECT doc_id,
      |  CAST(count(CASE WHEN cnt > 0 THEN 1 END) AS INT) AS n_terms,
      |  CAST(sum(cnt) AS BIGINT) AS n_hits,
      |  count(CASE WHEN cnt > 0 THEN 1 END) = 0 AS keep
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.qLm]]: the shared tokenizer builds the unigram
   * counts (T tokens, V distinct) from the RAW corpus; the scored corpus
   * plants ' zq9xoov' on doc_id%6 (OOV: coalesce(c,0)); per-token
   * log-prob ln((c+1)/(T+V)) summed per doc and negated over the token
   * count. Round-6 absorbs ln() and summation-order ulp skew.
   */
  val qLm: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS token
      |  FROM documents WHERE text IS NOT NULL
      |), cnt AS (
      |  SELECT token, count(*) AS c FROM tok GROUP BY token
      |), tot AS (
      |  SELECT sum(c) AS t, count(*) AS v FROM cnt
      |), sc AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 6 = 0 THEN text || ' zq9xoov' ELSE text END AS t2
      |  FROM documents WHERE text IS NOT NULL
      |), st AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(t2)), '[\s\x0b]+')) AS token
      |  FROM sc
      |), lp AS (
      |  SELECT st.doc_id,
      |    ln((coalesce(cnt.c, 0) + 1.0) / (tot.t + tot.v)) AS l
      |  FROM st LEFT JOIN cnt USING (token), tot
      |)
      |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
      |  round(-sum(l) / count(*), 6) AS avg_nll
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Oracle for [[Catalog.qLmJoin]] — the SAME SQL as [[qLm]]: the
   * join-shape scorer must emit the map path's values at round-6 (the
   * summation-order ulp skew lives below the rounding contract). */
  val qLmJoin: String = qLm

  /**
   * Oracle for [[Catalog.qLmSplit]]: [[qLm]]'s scoring restated, then
   * round-6 `quantile_cont` tertiles (the p literals are the shortest
   * round-trip forms of Scala's `1.0/3` and `2.0/3` doubles, so both
   * engines interpolate at the identical double) and the same
   * `<=`-threshold cut.
   */
  val qLmSplit: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '[\s\x0b]+')) AS token
      |  FROM documents WHERE text IS NOT NULL
      |), cnt AS (
      |  SELECT token, count(*) AS c FROM tok GROUP BY token
      |), tot AS (
      |  SELECT sum(c) AS t, count(*) AS v FROM cnt
      |), sc AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 6 = 0 THEN text || ' zq9xoov' ELSE text END AS t2
      |  FROM documents WHERE text IS NOT NULL
      |), st AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(t2)), '[\s\x0b]+')) AS token
      |  FROM sc
      |), lp AS (
      |  SELECT st.doc_id,
      |    ln((coalesce(cnt.c, 0) + 1.0) / (tot.t + tot.v)) AS l
      |  FROM st LEFT JOIN cnt USING (token), tot
      |), s AS (
      |  SELECT doc_id, round(-sum(l) / count(*), 6) AS avg_nll
      |  FROM lp GROUP BY doc_id
      |), th AS (
      |  SELECT
      |    round(quantile_cont(avg_nll, CAST(0.3333333333333333 AS DOUBLE)), 6) AS t1,
      |    round(quantile_cont(avg_nll, CAST(0.6666666666666666 AS DOUBLE)), 6) AS t2
      |  FROM s)
      |SELECT doc_id, avg_nll,
      |  CASE WHEN avg_nll <= t1 THEN 'head'
      |       WHEN avg_nll <= t2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM s, th ORDER BY doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.taEntropy]]: the same planted corpus (multibyte
   * suffix on doc_id%4, 32 z's on doc_id%7), char distribution via
   * `string_split(t,'')` (grapheme clusters == code points here: the
   * planted multibyte chars are all single-code-point), and DuckDB's own
   * log2 `entropy()` aggregate — an independent implementation of the
   * same -Σ p·log2 p, agreeing to the round-6 float contract. Empty
   * strings split to zero rows, hence the LEFT JOIN + coalesce(0).
   */
  val taEntropy: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN base || ' zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz'
      |         ELSE base END AS t
      |  FROM (SELECT doc_id,
      |          CASE WHEN doc_id % 4 = 0 THEN text || ' é✓汉é' ELSE text END AS base
      |        FROM documents WHERE text IS NOT NULL)
      |), e AS (
      |  SELECT doc_id, round(entropy(ch), 6) AS h
      |  FROM (SELECT doc_id, unnest(string_split(t, '')) AS ch FROM p)
      |  GROUP BY doc_id
      |)
      |SELECT p.doc_id, length(p.t) AS n_cp,
      |  coalesce(e.h, 0.0) AS char_entropy
      |FROM p LEFT JOIN e USING (doc_id) ORDER BY p.doc_id""".stripMargin

  /**
   * Oracle for [[Catalog.qKmv]]: recompute the ENTIRE KMV sketch from raw
   * doc_ids — xxhash64 via the staged pure-SQL formulation
   * ([[SqlXxh64.hashLongStages]], seed 42 = Spark's), the per-language
   * k-th smallest distinct hash as a window order statistic, and the
   * estimator `(k-1) / ((kth_unsigned + 1) / 2^64)` verbatim (same IEEE
   * op order; round-4 on both sides). The CASE mirrors the sketch's two
   * regimes: distinct < k → exact count, else the order-statistic
   * estimate.
   */
  def qKmv: String = {
    val hashed = SqlXxh64.stagesSql(
      SqlXxh64.hashLongStages("doc_id", 42L),
      "(SELECT lang, doc_id FROM documents WHERE doc_id IS NOT NULL)",
      Seq("lang", "doc_id"))
    def kth(tbl: String, k: Int): String =
      s"""CASE WHEN mm.m >= $k THEN ${SqlXxh64.signed(s"$tbl.hv")} END"""
    def est(tbl: String, k: Int): String =
      s"""CASE WHEN mm.m < $k THEN round(CAST(mm.m AS DOUBLE), 4)
         |    ELSE round(${(k - 1).toDouble} /
         |      (($tbl.hv::DOUBLE + 1.0) / power(2.0, 64)), 4) END""".stripMargin
    s"""WITH h AS (
       |  $hashed
       |), d AS (
       |  SELECT lang, lb4 AS hv FROM h GROUP BY lang, lb4
       |), r AS (
       |  SELECT lang, hv,
       |    row_number() OVER (PARTITION BY lang ORDER BY hv ASC) AS rk
       |  FROM d
       |), mm AS (
       |  SELECT lang, count(*) AS m FROM d GROUP BY lang
       |), x AS (
       |  SELECT lang, count(DISTINCT doc_id) AS exact_distinct
       |  FROM documents WHERE doc_id IS NOT NULL GROUP BY lang
       |), k32 AS (SELECT lang, hv FROM r WHERE rk = 32),
       |k512 AS (SELECT lang, hv FROM r WHERE rk = 512)
       |SELECT x.lang, x.exact_distinct,
       |  CAST(LEAST(mm.m, 32) AS INT) AS n32,
       |  ${kth("k32", 32)} AS kth32,
       |  ${est("k32", 32)} AS est32,
       |  CAST(LEAST(mm.m, 512) AS INT) AS n512,
       |  ${kth("k512", 512)} AS kth512,
       |  ${est("k512", 512)} AS est512
       |FROM x JOIN mm USING (lang)
       |LEFT JOIN k32 USING (lang) LEFT JOIN k512 USING (lang)
       |ORDER BY lang""".stripMargin
  }

  /**
   * Oracle for [[Catalog.qZorder]]: the Morton interleave as pure SQL
   * arithmetic — bias each int32 by 2^31, dilate its bits to even
   * positions with the standard 5-step mask-shift (shifts become
   * multiplications; every intermediate < 2^63, so BIGINT is safe),
   * combine a-even | b-odd as a HUGEINT SUM (the dilated operands have
   * disjoint bits, so + ≡ |; the <<1 of the b side would overflow
   * BIGINT), and flip the top bit via `- 2^63` (the unsigned→signed
   * order-preserving map, same derivation as [[SqlXxh64.signed]]).
   */
  val qZorder: String =
    """WITH base AS (
      |  SELECT event_id,
      |    CAST(user_id AS BIGINT) + 2147483648 AS xa,
      |    CAST(hour(ts) * 60 + minute(ts) AS BIGINT) + 2147483648 AS xb
      |  FROM events
      |), s1 AS (
      |  SELECT event_id,
      |    (xa | (xa * 65536)) & 281470681808895 AS xa,
      |    (xb | (xb * 65536)) & 281470681808895 AS xb FROM base
      |), s2 AS (
      |  SELECT event_id,
      |    (xa | (xa * 256)) & 71777214294589695 AS xa,
      |    (xb | (xb * 256)) & 71777214294589695 AS xb FROM s1
      |), s3 AS (
      |  SELECT event_id,
      |    (xa | (xa * 16)) & 1085102592571150095 AS xa,
      |    (xb | (xb * 16)) & 1085102592571150095 AS xb FROM s2
      |), s4 AS (
      |  SELECT event_id,
      |    (xa | (xa * 4)) & 3689348814741910323 AS xa,
      |    (xb | (xb * 4)) & 3689348814741910323 AS xb FROM s3
      |), s5 AS (
      |  SELECT event_id,
      |    (xa | (xa * 2)) & 6148914691236517205 AS xa,
      |    (xb | (xb * 2)) & 6148914691236517205 AS xb FROM s4
      |)
      |SELECT event_id,
      |  CAST(CAST(xa AS HUGEINT) + CAST(xb AS HUGEINT) * 2
      |       - 9223372036854775808 AS BIGINT) AS zval
      |FROM s5 ORDER BY event_id""".stripMargin

  /** Oracle for [[Catalog.qIncl]]: inclusion coefficient of events.user_id
   * in the mod-7-restricted customer keys — distinct sets on both sides,
   * NOT EXISTS anti-join (NULL-safe like Spark's left_anti). */
  val qIncl: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
      |d AS (SELECT DISTINCT c_custkey FROM customer
      |      WHERE c_custkey IS NOT NULL AND c_custkey % 7 <> 3),
      |m AS (SELECT count(*) AS n_missing FROM a
      |      WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.c_custkey = a.user_id)),
      |t AS (SELECT count(*) AS n_distinct FROM a)
      |SELECT n_distinct, n_missing,
      |  round((n_distinct - n_missing) * 1.0 /
      |        (CASE WHEN n_distinct = 0 THEN 1 ELSE n_distinct END), 6) AS coefficient
      |FROM t, m""".stripMargin

  /** Oracle for [[Catalog.qFd]]: determinant groups violating
   * `user_id → event_type` (NULL dependents don't count as a value —
   * COUNT(DISTINCT) semantics agree across engines). */
  val qFd: String =
    """SELECT user_id, count(DISTINCT event_type) AS n_dependent,
      |  count(*) AS n_rows
      |FROM events GROUP BY user_id
      |HAVING count(DISTINCT event_type) > 1
      |ORDER BY user_id""".stripMargin

  /** Oracle for [[Catalog.qSuggest]]: the same deterministic suggestion
   * rules ([[graft.quality.ConstraintDiscovery.suggestConstraints]]) restated as
   * a per-column profile CTE + one UNION ALL branch per (column, rule).
   * Rule firing is data-dependent in BOTH engines, so the oracle proves
   * the rules, not a frozen expected list. The completeness detail is an
   * integer per-mille floor (engine-stable string); range fires only for
   * the integral columns; enum values aggregate sorted with '|'. */
  val qSuggest: String = {
    val d = "CASE WHEN source = 'src3' THEN NULL ELSE source END AS source"
    def branches(c: String, integral: Boolean, str: Boolean): String = {
      val base =
        s"""SELECT '$c' AS "column", 'not_null' AS rule, '' AS detail
           |FROM p WHERE ${c}_nn = n_rows
           |UNION ALL
           |SELECT '$c', 'completeness',
           |  'completeness>=' || CAST(CAST(floor(${c}_nn * 1000.0 / n_rows) AS BIGINT) AS VARCHAR) || '/1000'
           |FROM p WHERE ${c}_nn < n_rows
           |UNION ALL
           |SELECT '$c', 'unique', '' FROM p
           |WHERE ${c}_nn = n_rows AND ${c}_nd = ${c}_nn AND n_rows > 0""".stripMargin
      val range = if (!integral) "" else
        s"""
           |UNION ALL
           |SELECT '$c', 'range', '[' || ${c}_min || ',' || ${c}_max || ']'
           |FROM p WHERE ${c}_nn > 0""".stripMargin
      val enumB = if (!str) "" else
        s"""
           |UNION ALL
           |SELECT '$c', 'enum',
           |  (SELECT string_agg(v, '|' ORDER BY v)
           |   FROM (SELECT DISTINCT $c AS v FROM d WHERE $c IS NOT NULL))
           |FROM p WHERE ${c}_nd <= 16 AND ${c}_nd > 0""".stripMargin
      base + range + enumB
    }
    def stats(c: String, integral: Boolean): String = {
      val mm = if (!integral) "" else
        s""",
           |  CAST(min($c) AS VARCHAR) AS ${c}_min, CAST(max($c) AS VARCHAR) AS ${c}_max""".stripMargin
      s"""count($c) AS ${c}_nn, count(DISTINCT $c) AS ${c}_nd$mm""".stripMargin
    }
    s"""WITH d AS (SELECT doc_id, text, lang, $d, n_chars FROM documents),
       |p AS (SELECT count(*) AS n_rows,
       |  ${stats("doc_id", integral = true)},
       |  ${stats("text", integral = false)},
       |  ${stats("lang", integral = false)},
       |  ${stats("source", integral = false)},
       |  ${stats("n_chars", integral = true)}
       |FROM d)
       |SELECT "column", rule, detail FROM (
       |${branches("doc_id", integral = true, str = false)}
       |UNION ALL
       |${branches("text", integral = false, str = true)}
       |UNION ALL
       |${branches("lang", integral = false, str = true)}
       |UNION ALL
       |${branches("source", integral = false, str = true)}
       |UNION ALL
       |${branches("n_chars", integral = true, str = false)}
       |) r ORDER BY "column", rule""".stripMargin
  }

  /** Oracle for [[Catalog.qRollup]]: the same hierarchical subtotals —
   * DuckDB's GROUPING() bit order matches Spark's grouping_id (first
   * listed column = high bit); sums cast to BIGINT (DuckDB promotes
   * sum(BIGINT) to HUGEINT). */
  val qRollup: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
      |FROM documents GROUP BY ROLLUP (lang, source)
      |ORDER BY gid, lang, source""".stripMargin

  /** Oracle for [[Catalog.evFunnel]]: earliest-anchor greedy funnel as
   * three chained min(ts) aggregates — t1 = earliest 'view'; t2 = earliest
   * 'click' strictly after t1 within 6h of t1; t3 = earliest 'purchase'
   * strictly after t2 within 6h of t1. Equivalent to the engine's sorted
   * per-user fold by induction on step index. */
  val evFunnel: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |    AND e.ts <= s1.t1 + INTERVAL 6 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |    AND e.ts <= s1.t1 + INTERVAL 6 HOUR GROUP BY 1)
      |SELECT step, event_type, n_users FROM (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
      |    CAST(count(*) AS BIGINT) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'click', count(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3) t
      |ORDER BY step""".stripMargin

  /** Oracle for [[Catalog.evCohort]]: the same staggered/thinned stream
   * (shift = user_id % 8 weeks, keep event_id % 23 = 0), then first-week
   * cohort × distinct-active-week cells; both engines truncate weeks to
   * ISO Mondays so day-diffs are exact multiples of 7. */
  val evCohort: String =
    """WITH ev AS (SELECT user_id, ts + (user_id % 8) * 7 * INTERVAL 1 DAY AS ts2
      |  FROM events WHERE event_id % 23 = 0),
      |fw AS (SELECT user_id, min(date_trunc('week', ts2)) AS cohort
      |  FROM ev GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, date_trunc('week', ts2) AS w FROM ev)
      |SELECT fw.cohort,
      |  CAST(datediff('day', fw.cohort, act.w) / 7 AS BIGINT) AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM act JOIN fw ON act.user_id = fw.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Oracle for [[Catalog.evResample]]: hourly buckets, generate_series
   * spine (inclusive both ends, like Spark's sequence), zero-filled
   * counts, IGNORE NULLS last_value forward fill; per-bucket sums round
   * to 6dp in BOTH engines before the fill carries them. */
  val evResample: String =
    """WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS v
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      |  FROM bounds),
      |k AS (SELECT DISTINCT event_type FROM events),
      |g AS (SELECT k.event_type, spine.bucket, b.n, b.v
      |  FROM k CROSS JOIN spine
      |  LEFT JOIN b ON b.event_type = k.event_type AND b.bucket = spine.bucket)
      |SELECT event_type, bucket, COALESCE(n, 0) AS n, v,
      |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      |FROM g ORDER BY event_type, bucket""".stripMargin

  /** Oracle for [[Catalog.qPivot]]: the conditional aggregation the
   * explicit-values pivot compiles to. Spark's pivot emits NULL (not 0)
   * for a cell with no rows — `count(*) FILTER` would emit 0 there, so
   * counts wrap in NULLIF(·, 0): a non-empty cell's count is ≥ 1, making
   * NULLIF exact, and empty cells agree on NULL in both engines even
   * though no cell is empty at the shipped scale factors. */
  val qPivot: String =
    """SELECT lang,
      |  NULLIF(count(*) FILTER (WHERE source = 'src0'), 0) AS src0_n,
      |  CAST(sum(n_chars) FILTER (WHERE source = 'src0') AS BIGINT) AS src0_chars,
      |  NULLIF(count(*) FILTER (WHERE source = 'src1'), 0) AS src1_n,
      |  CAST(sum(n_chars) FILTER (WHERE source = 'src1') AS BIGINT) AS src1_chars,
      |  NULLIF(count(*) FILTER (WHERE source = 'src2'), 0) AS src2_n,
      |  CAST(sum(n_chars) FILTER (WHERE source = 'src2') AS BIGINT) AS src2_chars,
      |  NULLIF(count(*) FILTER (WHERE source = 'src3'), 0) AS src3_n,
      |  CAST(sum(n_chars) FILTER (WHERE source = 'src3') AS BIGINT) AS src3_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Oracle for [[Catalog.qRank]]: the same window family — rank gaps on
   * ties, dense_rank without, row_number over the tie-broken total order,
   * percent_rank as the single (rank-1)/(n-1) IEEE division (bit-equal
   * across engines), running sum over the total order. */
  val qRank: String =
    """SELECT lang, doc_id, n_chars,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  row_number() OVER wt AS rn,
      |  percent_rank() OVER w AS prnk,
      |  CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS run_chars
      |FROM documents
      |WINDOW w AS (PARTITION BY lang ORDER BY n_chars),
      |  wt AS (PARTITION BY lang ORDER BY n_chars, doc_id)
      |ORDER BY lang, doc_id""".stripMargin

  /** Oracle for [[Catalog.qPagerank]]: the same integer recurrence,
   * unrolled 3 iterations — base = 10^12 // N; contrib(v) = Σ r(u) //
   * outdeg(u); r' = (15·base)//100 + (85·(contrib + dangling//N))//100.
   * DuckDB `//` on BIGINT is integer floor division (all values
   * non-negative), sums cast back out of HUGEINT, so every step is
   * exact and order-independent — the hash matches bit-for-bit. */
  val qPagerank: String = {
    // e0 = the raw derived pairs; nodes come from e0 (self-loop-only
    // endpoints stay nodes — dangling), ranked edges from the filtered e
    val rawEdges =
      """SELECT CAST(o_custkey % 60 AS BIGINT) AS src,
        |       CAST((o_orderkey * 37 + 11) % 97 AS BIGINT) AS dst
        |FROM orders""".stripMargin
    val edges = "SELECT DISTINCT src, dst FROM e0 WHERE src <> dst"
    def step(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.node, CAST((SELECT baseterm FROM p) +
         |    (85 * (COALESCE(c.contrib, 0) + d.dang // (SELECT nn FROM p))) // 100
         |    AS BIGINT) AS r
         |  FROM n
         |  LEFT JOIN (SELECT e.dst AS node,
         |      CAST(sum($prev.r // od.outdeg) AS BIGINT) AS contrib
         |    FROM e JOIN $prev ON e.src = $prev.node
         |    JOIN od ON e.src = od.node GROUP BY 1) c ON n.node = c.node
         |  CROSS JOIN (SELECT CAST(COALESCE(sum($prev.r), 0) AS BIGINT) AS dang
         |    FROM $prev LEFT JOIN od ON $prev.node = od.node
         |    WHERE od.node IS NULL) d)""".stripMargin
    s"""WITH e0 AS ($rawEdges),
       |e AS ($edges),
       |n AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e0 UNION SELECT dst FROM e0)),
       |od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY 1),
       |p AS (SELECT CAST(count(*) AS BIGINT) AS nn,
       |  CAST(1000000000000 // count(*) AS BIGINT) AS base,
       |  CAST((15 * (1000000000000 // count(*))) // 100 AS BIGINT) AS baseterm
       |  FROM n),
       |r0 AS (SELECT node, (SELECT base FROM p) AS r FROM n),
       |${step("r0", "it1")},
       |${step("it1", "it2")},
       |${step("it2", "it3")}
       |SELECT node, r AS rank_fp FROM it3 ORDER BY node""".stripMargin
  }

  /** Oracle for [[Catalog.qCheckinfer]]: the same derived manifest frame,
   * then [[graft.quality.ConstraintDiscovery.inferFields]]'s priority chain
   * restated in SQL — the validator's cell lens (quote-strip, `^\s*$`
   * empty skip), Bool/Int shapes as the plugin regexes, ISO-8601 via the
   * calendar-extended subset this frame exercises (try_strptime; the full
   * engine family is wider, exactly like v_datetime's constructed rows),
   * Enum gated on distinct ≤ 16, Str as the fallback. Type, required and
   * detail are all data-dependent in BOTH engines. */
  val qCheckinfer: String = {
    val cols = Seq("okey", "flag", "b", "d", "pri", "cmt")
    // the validator's cell lens: one wrapping-quote pair stripped
    def sv(c: String): String = s"""regexp_replace($c, '^"?(.*?)"?$$', '\\1')"""
    def nonEmpty(c: String): String =
      s"NOT ($c IS NULL OR regexp_full_match($c, '\\s*'))"
    def stats(c: String): String = {
      val v = sv(c)
      val ne = nonEmpty(c)
      val isInt = s"regexp_full_match($v, '-?\\d+')"
      s"""count(*) FILTER (WHERE $ne) AS ${c}_ne,
         |  count(*) FILTER (WHERE $ne AND
         |    regexp_full_match($v, '(?i)(1|true|yes|0|false|no)')) AS ${c}_bool,
         |  count(*) FILTER (WHERE $ne AND $isInt) AS ${c}_int,
         |  count(*) FILTER (WHERE $ne AND
         |    try_strptime($v, '%Y-%m-%d') IS NOT NULL) AS ${c}_iso,
         |  count(DISTINCT CASE WHEN $ne THEN $v END) AS ${c}_nd,
         |  CAST(min(CASE WHEN $ne AND $isInt THEN CAST($v AS HUGEINT) END)
         |    AS VARCHAR) AS ${c}_min,
         |  CAST(max(CASE WHEN $ne AND $isInt THEN CAST($v AS HUGEINT) END)
         |    AS VARCHAR) AS ${c}_max""".stripMargin
    }
    def row(c: String): String = {
      val t =
        s"""CASE WHEN ${c}_ne > 0 AND ${c}_bool = ${c}_ne THEN 'Bool'
           |  WHEN ${c}_ne > 0 AND ${c}_int = ${c}_ne THEN 'Int'
           |  WHEN ${c}_ne > 0 AND ${c}_iso = ${c}_ne THEN 'DateTime'
           |  WHEN ${c}_ne > 0 AND ${c}_nd <= 16 THEN 'Enum'
           |  ELSE 'Str' END""".stripMargin
      val enumList =
        s"""(SELECT string_agg(ev, '|' ORDER BY ev) FROM
           |  (SELECT DISTINCT ${sv(c)} AS ev FROM f WHERE ${nonEmpty(c)}))"""
          .stripMargin
      s"""SELECT '$c' AS "column", $t AS ftype,
         |  (${c}_ne = n_rows AND n_rows > 0) AS required,
         |  CASE $t
         |    WHEN 'Int' THEN '[' || ${c}_min || ',' || ${c}_max || ']'
         |    WHEN 'Enum' THEN $enumList
         |    ELSE '' END AS detail
         |FROM p""".stripMargin
    }
    s"""WITH f AS (
       |  SELECT CAST(o_orderkey AS VARCHAR) AS okey,
       |    CASE WHEN o_orderkey % 7 = 0 THEN ''
       |         ELSE CAST(o_orderkey % 2 AS VARCHAR) END AS flag,
       |    CASE WHEN o_orderkey % 3 = 0 THEN 'yes'
       |         WHEN o_orderkey % 3 = 1 THEN 'TRUE' ELSE 'no' END AS b,
       |    strftime(o_orderdate, '%Y-%m-%d') AS d,
       |    o_orderpriority AS pri,
       |    CAST(o_totalprice AS VARCHAR) AS cmt
       |  FROM orders),
       |p AS (SELECT count(*) AS n_rows,
       |  ${cols.map(stats).mkString(",\n  ")}
       |FROM f)
       |SELECT "column", ftype, required, detail FROM (
       |${cols.map(row).mkString("\nUNION ALL\n")}
       |) r ORDER BY "column"""".stripMargin
  }
}
