package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed, sorted parquet table layout — the CO-LOCATION play for keys
 * that are joined or aggregated repeatedly (the north_rule's
 * (repo, path, commit) uniqueness key, a dimension's id): rows are
 * hash-distributed into a fixed number of buckets AT WRITE TIME, so
 * every later equi-join between same-bucketed tables and every
 * aggregation on a bucket-key prefix runs WITHOUT a shuffle — the scan
 * itself reports the hash partitioning and Catalyst drops the Exchange
 * (pinned by PlanSpec `bucketed layout: join and aggregation…`).
 *
 * At 100 TB this converts the engine's recurring shuffles into a
 * one-time write cost: validating daily snapshots against yesterday's
 * verdicts, RI-checking facts against a too-big-to-broadcast dimension,
 * or re-running uniqueness on an append all reuse the layout. Bucket
 * count is a layout constant — pick it for the TARGET cluster
 * (e.g. 4x total executor cores) and keep it stable so every table in
 * the join graph agrees; both sides of a co-located join must share the
 * bucket count and key.
 *
 * Spark's bucketing rides the session catalog (`saveAsTable`) — the
 * bucket spec is table metadata, exactly like Iceberg's bucket partition
 * transform; [[SnapshotTable]] covers the manifest/snapshot side of that
 * story, this covers the physical co-location side.
 */
object BucketedTable {

  /** Write `df` as a bucketed + in-bucket-sorted parquet table. Sorting
   * by the bucket key lets sort-merge joins skip the per-task sort too. */
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(buckets > 0, "bucket count must be positive")
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .mode(mode)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on the bucket key — shuffle-free
   * by layout; the join itself is a plain `join`, co-location does the
   * rest. Fails fast if either table isn't bucketed as claimed. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String]): DataFrame = {
    def bucketSpec(t: String) =
      spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
        .bucketSpec
    val (lb, rb) = (bucketSpec(left), bucketSpec(right))
    require(lb.isDefined && rb.isDefined,
      s"both tables must be bucketed: $left=$lb $right=$rb")
    require(lb.get.numBuckets == rb.get.numBuckets,
      s"bucket counts differ: ${lb.get.numBuckets} vs ${rb.get.numBuckets}")
    // Co-location holds when the BUCKET columns are a subset of the JOIN
    // keys: HashPartitioning(bucketCols) satisfies a clustered
    // distribution over any superset key set (rows equal on the join keys
    // are equal on the bucket keys, hence in the same bucket). Joining on
    // a PROPER SUBSET of the bucket columns is the broken direction —
    // rows sharing that key can land in different buckets, and Spark
    // would silently re-shuffle both sides.
    require(lb.get.bucketColumnNames.forall(on.contains) &&
      rb.get.bucketColumnNames.forall(on.contains),
      s"join keys $on must contain every bucket column " +
        s"(${lb.get.bucketColumnNames} / ${rb.get.bucketColumnNames}) — " +
        "joining on fewer columns than the bucket key is not co-located")
    spark.table(left).join(spark.table(right), on)
  }
}
