package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics the reference's manifest-validation world never
 * needed but any warehouse user expects alongside it: ordered funnel
 * conversion, cohort retention and time-series resampling with gap fill.
 * All three are declarative DataFrame plans — no UDFs, no driver loops —
 * so Catalyst keeps pushdown/pruning and AQE keeps runtime re-planning.
 *
 * Scale shapes:
 *  - funnel: ONE shuffle on the user key. Events are pre-filtered to the
 *    funnel's step types before the shuffle, and the per-user fold is a
 *    higher-order `aggregate` over the user's sorted step events — state is
 *    the k-slot timestamp array, never materialized per-pair. The per-user
 *    list is bounded by that user's step-type events; a bot-grade hot user
 *    is the caller's pre-cap (same contract as sessionization's hot key).
 *  - cohort: two aggregates, no join — first pass collapses each user to
 *    (first period, distinct active periods), bounded by the timeline
 *    length in periods, second counts per (cohort, offset) cell.
 *  - resample: one bucket aggregate, a generated bucket spine (sequence +
 *    explode — no driver loop), a broadcast key×spine frame, one left join
 *    back, and a per-key ordered window for the forward fill. Window state
 *    is one row (last non-null), partitioned by key.
 */
object EventAnalytics {

  /**
   * Ordered windowed funnel (ClickHouse `windowFunnel` shape, pinned to
   * earliest-anchor greedy semantics): per user, `t1` = earliest step-1
   * event; `t_k` = earliest step-k event STRICTLY after `t_{k-1}` and
   * within `windowSeconds` of `t1`. Returns one row per user that emitted
   * at least one step-type event: (userCols..., reached) where `reached`
   * is the deepest step index completed (1-based; a user whose first
   * step-type event is not step 1 has reached = 0).
   *
   * Earliest-anchor greedy is deterministic and oracle-restatable as k
   * chained `min(ts)` aggregates; it is also what per-level conversion
   * counts mean ("of the users who did A, how many did B within W of
   * their FIRST A").
   */
  def funnelLevels(df: DataFrame, userCols: Seq[String], tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.length
    // Timestamps stay timestamps (TIMESTAMP and TIMESTAMP_NTZ both work);
    // the unfilled-slot sentinel is NULL, the window is interval arithmetic.
    val tsType = df.schema(tsCol).dataType
    val win = expr(s"INTERVAL '$windowSeconds' SECOND")
    // step name -> 1-based slot; the when-chain is k terms, k is small
    val stepIdx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val ev = df
      .filter(col(tsCol).isNotNull && col(typeCol).isin(steps.map(x => x: Any): _*))
      .select(userCols.map(col) ++ Seq(
        col(tsCol).as("__t"), stepIdx.as("__s")): _*)
    // ONE shuffle: per-user sorted fold over only the funnel-relevant events.
    // Slot array fills strictly in prefix order, so `reached` = filled count.
    ev.groupBy(userCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__t"), col("__s")))).as("__evs"))
      .withColumn("__acc", aggregate(col("__evs"),
        array_repeat(lit(null).cast(tsType), k),
        (acc, e) => {
          val t = e.getField("__t")
          val s = e.getField("__s")
          transform(acc, (v, i) =>
            when(v.isNotNull, v)                     // slot already earliest
              .when(s =!= i + 1, v)                  // event not for this slot
              .when(i === 0, t)                      // anchor: earliest step-1
              .when(element_at(acc, i).isNotNull &&
                t > element_at(acc, i) &&
                t <= element_at(acc, lit(1)) + win, t)
              .otherwise(v))
        }))
      .select(userCols.map(col) :+
        size(filter(col("__acc"), v => v.isNotNull)).cast("long").as("reached"): _*)
  }

  /**
   * Funnel summary: one row per step — (step, event_type, n_users) where
   * n_users counts users whose greedy funnel reached at least that step.
   * Steps no user reached still emit a zero row (the k-row step frame is a
   * driver-side literal, broadcast by size).
   */
  def funnelCounts(df: DataFrame, userCols: Seq[String], tsCol: String,
      typeCol: String, steps: Seq[String], windowSeconds: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val levels = funnelLevels(df, userCols, tsCol, typeCol, steps, windowSeconds)
    val counts = levels
      .filter(col("reached") >= 1)
      .select(explode(sequence(lit(1L), col("reached"))).as("step"))
      .groupBy("step").agg(count(lit(1)).as("n_users"))
    steps.zipWithIndex.map { case (s, i) => (i + 1L, s) }
      .toDF("step", "event_type")
      .join(counts, Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /**
   * Cohort retention: users bucketed by the period of their FIRST event
   * (ISO week via date_trunc by default); each cell counts distinct users
   * of cohort c active in period c+offset. No join and no countDistinct —
   * one user-keyed aggregate collapses each user to (first period,
   * distinct active periods) — the set is bounded by the timeline length
   * in periods — then the exploded frame is unique per (user, period), so
   * the cell count is a plain count.
   *
   * Output: (cohort, offset, n_users), offset in whole periods.
   */
  def cohortRetention(df: DataFrame, userCols: Seq[String], tsCol: String,
      period: String = "week", periodDays: Int = 7): DataFrame = {
    val perUser = df.filter(col(tsCol).isNotNull)
      .select(userCols.map(col) :+ date_trunc(period, col(tsCol)).as("__p"): _*)
      .groupBy(userCols.map(col): _*)
      .agg(min(col("__p")).as("cohort"), collect_set(col("__p")).as("__ps"))
    perUser
      .select(col("cohort"), explode(col("__ps")).as("__p"))
      .groupBy(col("cohort"),
        (datediff(to_date(col("__p")), to_date(col("cohort"))) / periodDays)
          .cast("long").as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Resample an event stream to a fixed-interval grid per key, zero-filling
   * the count of empty buckets and forward-filling the last observed value
   * aggregate into them (metrics-pipeline gap fill). The bucket spine is
   * `sequence(min, max, interval)` exploded — generated distributed, never
   * a driver loop — crossed with the distinct key frame (broadcast: the
   * key dim of a per-key time series is small by definition). `valueAgg`
   * is the per-bucket aggregate to carry (e.g. round(sum("value"), 6)).
   *
   * Output: (keyCols..., bucket, n, v, v_ffill) — `n`/`v` are 0/NULL on
   * gap buckets, `v_ffill` carries the last non-null `v` per key.
   */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
      interval: String, valueAgg: Column): DataFrame = {
    require(keyCols.nonEmpty, "resample needs at least one key column")
    val bucketed = df.filter(col(tsCol).isNotNull)
      .groupBy(keyCols.map(col) :+ date_trunc(interval, col(tsCol)).as("bucket"): _*)
      .agg(count(lit(1)).as("n"), valueAgg.as("v"))
    val spine = bucketed
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"),
        expr(s"interval 1 $interval"))).as("bucket"))
    val keys = df.select(keyCols.map(col): _*).distinct()
    val grid = keys.crossJoin(broadcast(spine))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(bucketed, keyCols :+ "bucket", "left")
      .select(keyCols.map(col) ++ Seq(col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("v")): _*)
      .withColumn("v_ffill", last(col("v"), ignoreNulls = true).over(w))
  }
}
