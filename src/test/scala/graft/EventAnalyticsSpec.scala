package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

/** Pins the event-analytics semantics on hand-built frames: the funnel's
 * earliest-anchor greedy rules (strict ordering, window anchored at the
 * FIRST step-1 event, same-timestamp non-progress, out-of-order prefix),
 * cohort offset arithmetic with inactive periods, and resample's
 * zero-fill / forward-fill / leading-NULL contract. */
class EventAnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val steps = Seq("A", "B", "C")

  test("funnelLevels: greedy earliest-anchor semantics") {
    val df = Seq(
      // u1 completes A->B->C in order within 2h of the first A
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:30:00"), "B"),
      (1L, ts("2024-01-01 11:00:00"), "C"),
      // u2: B before any A never counts; the later B is within the window
      (2L, ts("2024-01-01 09:00:00"), "B"),
      (2L, ts("2024-01-01 10:00:00"), "A"),
      (2L, ts("2024-01-01 10:10:00"), "B"),
      // u3: B lands outside the 2h window anchored at the FIRST A,
      // even though a second A would have put it in range
      (3L, ts("2024-01-01 08:00:00"), "A"),
      (3L, ts("2024-01-01 09:59:00"), "A"),
      (3L, ts("2024-01-01 10:30:00"), "B"),
      // u4: B at the same microsecond as A is NOT strictly after it
      (4L, ts("2024-01-01 10:00:00"), "A"),
      (4L, ts("2024-01-01 10:00:00"), "B"),
      // u5: only step-2/3 events -> reached 0
      (5L, ts("2024-01-01 10:00:00"), "B"),
      (5L, ts("2024-01-01 10:30:00"), "C")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnelLevels(df, Seq("user_id"), "ts", "event_type", steps, 7200L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("funnelCounts: per-step user counts include zero rows") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:30:00"), "B"),
      (2L, ts("2024-01-01 10:00:00"), "A")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnelCounts(df, Seq("user_id"), "ts", "event_type", steps, 7200L)
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "A", 2L), (2L, "B", 1L), (3L, "C", 0L)))
  }

  test("guards: non-positive funnel window and variable-length cohort periods fail fast") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), "A")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelLevels(df, Seq("user_id"), "ts", "event_type", steps, 0L)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.cohortRetention(df, Seq("user_id"), "ts", period = "month")
    }
  }

  test("guards: reserved output names in key/user columns fail fast") {
    // a key literally named "bucket"/"n" (or a user column "reached")
    // would collide with the operators' output columns — fail loud, the
    // repo convention, instead of an ambiguous-column analysis error
    val ev = Seq(("k", 1L, ts("2024-01-01 10:00:00"), "A", 1.0))
      .toDF("bucket", "n", "ts", "event_type", "value")
    val e1 = intercept[IllegalArgumentException] {
      EventAnalytics.resample(ev, Seq("bucket", "n"), "ts", "hour",
        round(sum("value"), 6))
    }
    assert(e1.getMessage.contains("bucket"))
    val ev2 = Seq((1L, ts("2024-01-01 10:00:00"), "A"))
      .toDF("reached", "ts", "event_type")
    val e2 = intercept[IllegalArgumentException] {
      EventAnalytics.funnelLevels(ev2, Seq("reached"), "ts", "event_type",
        steps, 3600L)
    }
    assert(e2.getMessage.contains("reached"))
  }

  test("cohortRetention: offsets in whole periods, inactive periods absent") {
    val df = Seq(
      // u1: first week of Jan 1 (Monday), active weeks 0, 2
      (1L, ts("2024-01-02 12:00:00")),
      (1L, ts("2024-01-16 08:00:00")),
      // u2: first week of Jan 8, active weeks 0, 1
      (2L, ts("2024-01-08 00:00:00")),
      (2L, ts("2024-01-15 00:00:00")),
      // u3: same cohort as u1, only week 0
      (3L, ts("2024-01-07 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(df, Seq("user_id"), "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 0L, 2L),
      ("2024-01-01 00:00:00.0", 2L, 1L),
      ("2024-01-08 00:00:00.0", 0L, 1L),
      ("2024-01-08 00:00:00.0", 1L, 1L)))
  }

  test("resample: zero-fill, forward fill, leading gaps stay NULL") {
    val df = Seq(
      ("k1", ts("2024-01-01 00:10:00"), 1.0),
      ("k1", ts("2024-01-01 00:20:00"), 2.0),
      ("k1", ts("2024-01-01 03:30:00"), 5.0),
      // k2 starts an hour after the global spine start: leading gap
      ("k2", ts("2024-01-01 01:15:00"), 7.0)
    ).toDF("k", "ts", "value")
    val got = EventAnalytics
      .resample(df, Seq("k"), "ts", "hour", round(sum("value"), 6))
      .orderBy("k", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq === Seq(
      ("k1", "2024-01-01 00:00:00.0", 2L, Some(3.0), Some(3.0)),
      ("k1", "2024-01-01 01:00:00.0", 0L, None, Some(3.0)),
      ("k1", "2024-01-01 02:00:00.0", 0L, None, Some(3.0)),
      ("k1", "2024-01-01 03:00:00.0", 1L, Some(5.0), Some(5.0)),
      ("k2", "2024-01-01 00:00:00.0", 0L, None, None),
      ("k2", "2024-01-01 01:00:00.0", 1L, Some(7.0), Some(7.0)),
      ("k2", "2024-01-01 02:00:00.0", 0L, None, Some(7.0)),
      ("k2", "2024-01-01 03:00:00.0", 0L, None, Some(7.0))))
  }
}
