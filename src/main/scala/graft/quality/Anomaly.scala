package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust outlier detection over a metrics frame — the consumer of the
 * north_rule's per-partition lineage + metrics rows: after a checkpointed
 * run writes one metrics row per partition (see
 * [[graft.run.CheckpointRunner]]), this flags the partitions whose
 * invalid-rate / row-count / violation-count sits implausibly far from the
 * rest of the table, which is how a 10^12-file validation job surfaces
 * "this partition's data went bad" without anyone eyeballing 10^5 rows.
 *
 * Median/MAD, not mean/stddev: one genuinely broken partition drags a mean
 * and inflates a stddev enough to mask itself (the classic masking
 * problem); the median and the median-absolute-deviation have a 50%
 * breakdown point, so the test stays calibrated with up to half the groups
 * contaminated. `robust_z = (x - median) / (1.4826 · MAD)` — 1.4826 is
 * 1/Φ⁻¹(3/4), the consistency constant that makes MAD estimate σ under
 * normality, so the default threshold 3.5 reads as "3.5 sigmas" (Iglewicz
 * & Hoaglin's recommended cut for the modified z-score).
 *
 * Scale shape: the input is an already-aggregated metrics frame
 * (dimension-scale — one row per group/partition, NOT the raw rows), so
 * the exact `percentile` aggregates here buffer only group-count values.
 * Two tiny aggregations (median, then MAD around it — MAD needs the
 * median first; that order is inherent to the statistic), each joined
 * back as a broadcast scalar; the flagging pass is a shuffle-free
 * projection. Raw-row inputs should be grouped first — e.g.
 * `df.groupBy("repo").agg(avg(!passed) as "invalid_rate")` — which is the
 * one row-scale shuffle of the whole pipeline.
 *
 * Contract (restated verbatim by the q_anomaly DuckDB oracle):
 * percentile interpolation is R-7/`quantile_cont` (the [[ColumnStats
 * .percentiles]] contract); `robust_z` rounds at 6; the anomaly cut
 * compares the UNROUNDED |z| against the threshold; `mad == 0` (at least
 * half the groups share the median value) yields NULL robust_z and
 * `anomalous = false` — a degenerate spread means the test has no scale,
 * not that every off-median group is broken.
 */
object Anomaly {

  def robustZ(metrics: DataFrame, keyCols: Seq[String], metricCol: String,
      zThreshold: Double = 3.5): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val x = col(metricCol).cast("double")
    val med = metrics.agg(percentile(x, lit(0.5)).as("__med"))
    val mad = metrics.crossJoin(broadcast(med))
      .agg(percentile(abs(x - col("__med")), lit(0.5)).as("__mad"))
    val z = (x - col("__med")) / (lit(1.4826) * col("__mad"))
    metrics.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .select(keyCols.map(col) ++ Seq(
        x.as("metric"),
        round(col("__med"), 6).as("median"),
        round(col("__mad"), 6).as("mad"),
        round(when(col("__mad") > 0, z), 6).as("robust_z"),
        when(col("__mad") > 0, abs(z) > zThreshold)
          .otherwise(lit(false)).as("anomalous")): _*)
  }
}
