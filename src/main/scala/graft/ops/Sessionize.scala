package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over an event stream shape — the
 * user-journey/burst-detection grouping step: consecutive events of the
 * same key belong to one session while each is within `gap` of the
 * previous; a quiet period of `gap` or more closes the session.
 *
 * Built on Spark's native `session_window` — the dynamic-gap window
 * primitive that Structured Streaming shares (the SAME call sessionizes
 * an unbounded stream under a watermark, with state eviction at
 * `max event time - watermark`), so the batch and streaming renditions
 * of this operator are one code path. Session boundary contract
 * (Spark's, pinned by OpsSpec): an event extends the session while
 * `ts <= last ts + gap` — ADJACENT windows merge, so an event landing
 * exactly `gap` after the previous one CONTINUES the session; only
 * `ts - last ts > gap` opens a new one. `session_end = last ts + gap`.
 *
 * Scale shape: one shuffle on the grouping keys, then Spark's
 * session-merging aggregation within partitions; per-key state is one
 * open session, never the event list. A hot key funnels its events into
 * one task — the canonical mitigation is pre-aggregating
 * sub-sessions per (key, coarse time bucket) and merging adjacent
 * bucket-boundary sessions in a second tiny pass.
 */
object Sessionize {

  /**
   * Sessions per key: (keyCols..., session_start, session_end, n_events,
   * extra aggs...). `gap` is a calendar-interval string ("4 hours",
   * "30 minutes"). NULL-timestamp events belong to no session and are
   * dropped; NULL keys group together (Spark groupBy semantics) — filter
   * upstream if that is not wanted.
   */
  def sessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gap: String, extraAggs: Seq[Column] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "sessionization needs at least one key column")
    val aggs = count(lit(1)).as("n_events") +: extraAggs
    val agged = df.filter(col(tsCol).isNotNull)
      .groupBy(session_window(col(tsCol), gap).as("__sw") +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val extraNames = agged.columns.filterNot(c =>
      c == "__sw" || c == "n_events" || keyCols.contains(c)).toSeq
    agged.select(keyCols.map(col) ++
      Seq(col("__sw.start").as("session_start"),
        col("__sw.end").as("session_end"),
        col("n_events")) ++ extraNames.map(col): _*)
  }
}
