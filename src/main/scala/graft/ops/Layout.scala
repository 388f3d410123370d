package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder64

/**
 * Physical data layout for multi-dimensional data skipping — the write-side
 * half of the engine's scan-pruning story (the read side being parquet
 * min/max row-group stats + partition pruning, both PlanSpec-pinned).
 *
 * `zorderBy` is the Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)` shape on
 * plain Spark: compute the Morton-interleaved sort key
 * ([[graft.functions.ZOrder64]]), range-repartition by it (one sampled
 * range-exchange — the same cost as any global sort), and sort within
 * partitions. Every output file then covers a small RECTANGLE of the
 * (a, b) domain instead of a full-width stripe, so a selective predicate
 * on EITHER column prunes most files by min/max stats; a lexicographic
 * sort gives that only to its leading column. At 100 TB this is the
 * difference between "fast queries by a OR by b" and "fast by a, full
 * scan by b".
 */
object Layout {

  /**
   * Cluster `df` into `numPartitions` z-ordered ranges over two int32-ish
   * key columns (values are cast to int; keys wider than 32 bits should be
   * pre-bucketed to a 32-bit resolution first — locality, not identity, is
   * what the layout needs). The z column is internal; the output schema is
   * unchanged.
   */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(!df.columns.contains("__z"),
      "'__z' is zorderBy's internal sort-key column; rename it first")
    df.withColumn("__z",
        ZOrder64.zorder(col(colA).cast("int"), col(colB).cast("int")))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
