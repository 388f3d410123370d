package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Shared per-round lineage-cut policy for iterative DataFrame algorithms
 * ([[Clustering.connectedComponents]], [[Graph.pageRankFixedPoint]]):
 * without a cut the iterated join plan grows without bound and analysis
 * time dominates; with `localCheckpoint` the cut is executor-local and
 * NON-RESILIENT (a lost executor on a real cluster kills the job), so
 * cluster runs opt into durable `checkpoint()` via `reliable = true`
 * (with `spark.sparkContext.setCheckpointDir` on HDFS/S3-grade storage).
 * One implementation, used by every iterative op — a fix to the
 * checkpoint pattern lands once.
 */
private[ops] object IterativeCheckpoint {

  /** Fail fast before the first round, not inside it. */
  def requireDir(df: DataFrame, reliable: Boolean): Unit =
    if (reliable)
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint=true needs spark.sparkContext.setCheckpointDir " +
          "pointing at durable storage")

  def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      // persist first: Dataset.checkpoint() runs one job to materialize
      // and a SECOND to write checkpoint files — without the cache the
      // whole round's join+aggregate lineage would execute twice
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint()
}
