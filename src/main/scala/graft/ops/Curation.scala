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
 * boilerplate/spam documents a quality gate should drop.
 *
 * Decontamination flags training documents whose shingle sets overlap a
 * benchmark/test set — computed as an exploded-shingle broadcast join +
 * one partial-aggregated count per doc, the shape that survives a 10^9-doc
 * corpus against a dimension-sized benchmark.
 */
object Curation {

  private def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-grams as strings (space-joined), empty array when the doc has
   * fewer than n tokens. String n-grams (not hashes) so the DuckDB oracle
   * comparison is exact by construction, no collision caveat. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "ngram width must be >= 1")
    val t = toks(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
  }

  private def ratio(num: Column, den: Column): Column =
    when(den <= 0, lit(0.0)).otherwise(round(num.cast("double") / den, 6))

  /** Fraction of lines that repeat an earlier line: 1 - distinct/total
   * (0 for single-line docs). */
  def dupLineFrac(text: Column): Column = {
    val l = split(text, "\n")
    when(size(l) <= 1, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(l)).cast("double") / size(l), 6))
  }

  /** Fraction of CHARACTERS sitting in repeated lines: 1 - chars of the
   * distinct line set / total chars across lines. */
  def dupLineCharFrac(text: Column): Column = {
    val l = split(text, "\n")
    val total = aggregate(l, lit(0L), (acc, x) => acc + length(x))
    val dist = aggregate(array_distinct(l), lit(0L), (acc, x) => acc + length(x))
    when(total <= 0, lit(0.0))
      .otherwise(round(lit(1.0) - dist.cast("double") / total, 6))
  }

  /** Fraction of word-n-gram slots taken by the single most frequent
   * n-gram (the "top n-gram coverage" boilerplate signal). Computed
   * per row with sort + one linear run-length pass — no shuffle. */
  def topNgramFrac(text: Column, n: Int): Column = {
    val ng = wordNgrams(text, n)
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

  /** Fraction of word-n-gram occurrences that are repeats of an earlier
   * one: 1 - distinct/total. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val ng = wordNgrams(text, n)
    when(size(ng) <= 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(ng)).cast("double") / size(ng), 6))
  }

  /** The curated repetition profile, one shuffle-free projection:
   * (id, n_lines, dup_line_frac, dup_line_char_frac, top_bigram_frac,
   * dup_5gram_frac). */
  def repetitionMetrics(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(split(t, "\n")).as("n_lines"),
      dupLineFrac(t).as("dup_line_frac"),
      dupLineCharFrac(t).as("dup_line_char_frac"),
      topNgramFrac(t, 2).as("top_bigram_frac"),
      dupNgramFrac(t, 5).as("dup_5gram_frac"))
  }

  /**
   * Benchmark decontamination: for each document, the fraction of its
   * DISTINCT word k-grams that appear in `bench` (one string column of
   * benchmark k-grams). Shape: explode distinct shingles, broadcast-join
   * the benchmark side, count hits with one partial-aggregated groupBy —
   * corpus side is a single scan; a doc scoring near 1.0 IS the
   * benchmark (or quotes it) and must leave the training mix.
   * Returns (idCol, n_shingles, n_hits, contam_frac).
   */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, k: Int = 3): DataFrame = {
    require(bench.columns.length == 1,
      "bench must be a single-column frame of benchmark k-gram strings")
    val benchSh = bench.select(col(bench.columns.head).as("__sh")).distinct()
    val docSh = df.select(col(idCol),
      array_distinct(wordNgrams(col(textCol), k)).as("__shs"))
    val hits = docSh
      .select(col(idCol), explode(col("__shs")).as("__sh"))
      .join(broadcast(benchSh), Seq("__sh"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    docSh.select(col(idCol), size(col("__shs")).as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        ratio(coalesce(col("n_hits"), lit(0L)), col("n_shingles"))
          .as("contam_frac"))
  }

  /** The benchmark k-gram set of a document frame — the `bench` input to
   * [[contamination]], built once and broadcast. */
  def benchmarkShingles(bench: DataFrame, textCol: String,
      k: Int = 3): DataFrame =
    bench.select(explode(array_distinct(
      wordNgrams(col(textCol), k))).as("sh")).distinct()
}
