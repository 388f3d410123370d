package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming exact-dedup: emit only the FIRST occurrence of each
 * key across the whole stream — the streaming form of
 * [[graft.ops.Dedup.exactDedup]], for ingest pipelines where duplicates
 * arrive across micro-batches (re-crawls, replayed events).
 *
 * Built on `flatMapGroupsWithState`: state per key is a single "seen"
 * flag, so state size is O(distinct keys) regardless of stream volume, and
 * an optional processing-time timeout bounds it further for keys that stop
 * recurring (dedup then becomes "first within the timeout horizon" — the
 * usual trade at unbounded scale).
 */
object StreamingDedup {

  /** Keep the first row per key. `timeoutMs` <= 0 keeps state forever. */
  def firstSeen[T](ds: Dataset[T], key: T => String, timeoutMs: Long = 0L)(
      implicit enc: Encoder[T]): Dataset[T] = {
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty
          else {
            state.update(true)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            // rows within one batch for the same key dedup here too
            if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
          }
      }(Encoders.scalaBoolean, enc)
  }
}
