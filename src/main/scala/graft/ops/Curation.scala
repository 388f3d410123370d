package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation filters: repetition metrics (the Gopher family) and
 * benchmark decontamination — the filter steps between raw web-scale text
 * and a training mix.
 *
 * Repetition metrics follow Rae et al. 2021 ("Scaling Language Models:
 * ... Gopher", appendix A1.1, public) in spirit, as exactly-computable
 * token/line-coverage variants: every metric is a deterministic function
 * of the text alone, built from array builtins (`split` / `array_distinct`
 * / `array_sort` / `aggregate`) inside ONE shuffle-free projection, and
 * restated verbatim by the DuckDB oracle. High values mark
 * boilerplate/spam documents a quality gate should drop. NULL text scores
 * 0.0 on every metric (a missing doc is not "repetitive"; a NULL metric
 * would silently pass `metric > threshold` gates — the failure mode a
 * curation pass exists to prevent).
 *
 * Every multiply-referenced array is LAMBDA-BOUND via the
 * single-element-transform trick ([[Dedup.shingles]]): a non-trivial
 * expression referenced inside HOF lambdas is otherwise re-evaluated per
 * reference, which turns these metrics quadratic in document length (the
 * round-1 ~50x lesson).
 *
 * Decontamination flags training documents whose shingle sets overlap a
 * benchmark/test set — one corpus scan: explode distinct shingles
 * carrying the per-doc count, broadcast-join the benchmark side, count
 * hits with one partial-aggregated groupBy. That is the shape that
 * survives a 10^9-doc corpus against a dimension-sized benchmark.
 */
object Curation {

  /** Evaluate `c` once and hand it to `f` as a lambda-bound variable —
   * the array-of-one binding trick (see [[Dedup.shingles]]). */
  private def bind1(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), x => f(x)), 1)

  /** Word n-grams as strings (space-joined); empty array when the doc has
   * fewer than n tokens or the text is NULL/blank. String n-grams (not
   * hashes) so the DuckDB oracle comparison is exact by construction, no
   * collision caveat. Tokens bind once; the split never re-runs per slot. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "ngram width must be >= 1")
    when(text.isNull || trim(text) === "", array().cast("array<string>"))
      .otherwise(flatten(transform(array(TextAnalysis.tokensLower(text)), ts =>
        when(size(ts) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(ts) - n),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(ts, i + j + 1)): _*))))))
  }

  private def ratio(num: Column, den: Column): Column =
    when(den <= 0, lit(0.0)).otherwise(round(num.cast("double") / den, 6))

  // --- metric formulas over an already-bound array --------------------------

  private def dupLineFracOf(l: Column): Column =
    when(size(l) <= 1, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(l)).cast("double") / size(l), 6))

  private def dupLineCharFracOf(l: Column): Column = {
    val total = aggregate(l, lit(0L), (acc, x) => acc + length(x))
    val dist = aggregate(array_distinct(l), lit(0L), (acc, x) => acc + length(x))
    when(total <= 0, lit(0.0))
      .otherwise(round(lit(1.0) - dist.cast("double") / total, 6))
  }

  private def topNgramFracOf(ng: Column): Column = {
    val best = aggregate(
      array_sort(ng),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (s, x) => {
        val run = when(x === s("prev"), s("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(s("best"), run).as("best"))
      },
      s => s("best"))
    ratio(best, size(ng))
  }

  private def dupNgramFracOf(ng: Column): Column =
    when(size(ng) <= 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(ng)).cast("double") / size(ng), 6))

  // --- public per-metric Columns (standalone use; arrays bound once) --------

  /** Fraction of lines that repeat an earlier line: 1 - distinct/total
   * (0 for single-line or NULL docs). */
  def dupLineFrac(text: Column): Column =
    when(text.isNull, lit(0.0))
      .otherwise(bind1(split(text, "\n"))(dupLineFracOf))

  /** Fraction of CHARACTERS sitting in repeated lines: 1 - chars of the
   * distinct line set / total chars across lines. */
  def dupLineCharFrac(text: Column): Column =
    when(text.isNull, lit(0.0))
      .otherwise(bind1(split(text, "\n"))(dupLineCharFracOf))

  /** Fraction of word-n-gram slots taken by the single most frequent
   * n-gram (the "top n-gram coverage" boilerplate signal). Computed
   * per row with sort + one linear run-length pass — no shuffle. */
  def topNgramFrac(text: Column, n: Int): Column =
    bind1(wordNgrams(text, n))(topNgramFracOf)

  /** Fraction of word-n-gram occurrences that are repeats of an earlier
   * one: 1 - distinct/total. */
  def dupNgramFrac(text: Column, n: Int): Column =
    bind1(wordNgrams(text, n))(dupNgramFracOf)

  /** The curated repetition profile, one shuffle-free pass:
   * (id, n_lines, dup_line_frac, dup_line_char_frac, top_bigram_frac,
   * dup_5gram_frac). The line and n-gram arrays materialize once each in
   * a projection boundary (CollapseProject keeps multiply-referenced
   * non-cheap aliases), so the text is tokenized once per n-gram width —
   * not once per metric reference. */
  def repetitionMetrics(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      split(t, "\n").as("__lines"),
      wordNgrams(t, 2).as("__bg"),
      wordNgrams(t, 5).as("__g5"))
      .select(col(idCol),
        coalesce(size(col("__lines")), lit(0)).as("n_lines"),
        coalesce(dupLineFracOf(col("__lines")), lit(0.0)).as("dup_line_frac"),
        coalesce(dupLineCharFracOf(col("__lines")), lit(0.0)).as("dup_line_char_frac"),
        topNgramFracOf(col("__bg")).as("top_bigram_frac"),
        dupNgramFracOf(col("__g5")).as("dup_5gram_frac"))
  }

  /**
   * Benchmark decontamination: for each document, the fraction of its
   * DISTINCT word k-grams that appear in `bench` (one string column of
   * benchmark k-grams). ONE corpus scan: the exploded shingles carry the
   * per-doc shingle count, the benchmark side broadcasts, and hit counts
   * partial-aggregate map-side; a doc scoring near 1.0 IS the benchmark
   * (or quotes it) and must leave the training mix.
   * Returns (idCol, n_shingles, n_hits, contam_frac).
   */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, k: Int = 3): DataFrame = {
    require(bench.columns.length == 1,
      "bench must be a single-column frame of benchmark k-gram strings")
    val benchSh = bench.select(col(bench.columns.head).as("__sh")).distinct()
      .withColumn("__hit", lit(1))
    df.select(col(idCol),
      array_distinct(wordNgrams(col(textCol), k)).as("__shs"))
      .select(col(idCol), size(col("__shs")).as("n_shingles"),
        explode_outer(col("__shs")).as("__sh"))
      .join(broadcast(benchSh), Seq("__sh"), "left")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(col("__hit")).as("n_hits"))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        ratio(col("n_hits"), col("n_shingles")).as("contam_frac"))
  }

  /** The benchmark k-gram set of a document frame — the `bench` input to
   * [[contamination]], built once and broadcast. */
  def benchmarkShingles(bench: DataFrame, textCol: String,
      k: Int = 3): DataFrame =
    bench.select(explode(array_distinct(
      wordNgrams(col(textCol), k))).as("sh")).distinct()
}
