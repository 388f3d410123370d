package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus sampling and partitioning — the split/quota steps
 * of a training-data pipeline.
 *
 * Both operators are REPRODUCIBLE BY CONSTRUCTION: assignment is a pure
 * function of row content (a hash of the id, a rank within a group), never
 * of RNG state, partition layout or cluster size — `df.randomSplit` gives
 * a different corpus split whenever the partitioning changes, which is
 * exactly what a 1000-executor re-run does. Hash-based assignment also
 * keeps the split STABLE UNDER APPEND: adding new documents never moves an
 * existing document across splits (the train/test contamination hazard of
 * ratio-based resplitting).
 */
object Sampling {

  /**
   * Split label for an id: bucket `pmod(xxhash64(id), granularity)` mapped
   * through the cumulative weight thresholds. Weights are relative (they
   * need not sum to 1); labels take effect in declaration order.
   */
  def splitLabel(id: Column, weights: Seq[(String, Double)],
      granularity: Int = 10000): Column = {
    require(weights.nonEmpty, "need at least one split label")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    val total = weights.map(_._2).sum
    var acc = 0.0
    val thresholds = weights.map { case (label, w) =>
      acc += w
      (label, math.round(acc / total * granularity).toInt)
    }
    val bucket = pmod(xxhash64(id), lit(granularity))
    thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((label, t), els) => when(bucket < t, lit(label)).otherwise(els)
    }
  }

  /** `df` plus a `split` column assigned by [[splitLabel]] — one codegen'd
   * projection, no shuffle, no RNG. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], granularity: Int = 10000): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), weights, granularity))

  /**
   * Per-group quota: keep at most `quota` rows per group — the best by
   * (score DESC, id ASC) — the "cap documents per domain/source" step of
   * web-scale curation. Runs as the bounded [[graft.functions.TopKByScore]]
   * aggregate: map-side k-heaps per group, shuffle volume
   * #partitions x #groups x quota, independent of group size — the
   * scale-safe form of `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
   * (whose window exchange ships EVERY row of a hot group to one reducer).
   * Returns (groupCols..., idCol, scoreCol); ids must be numeric (they
   * ride the aggregate as longs — [[graft.ops.Similarity.knnJoin]]'s
   * surrogate-id advice applies).
   */
  def quotaSample(df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(graft.functions.TopKByScore.topK(
        col(scoreCol), col(idCol), quota).as("kept"))
      .select(g :+ explode(col("kept")).as("e"): _*)
      .select(g :+ col("e.id").as(idCol) :+ col("e.score").as(scoreCol): _*)
  }
}
