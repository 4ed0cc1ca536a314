package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for the streaming surface (matches the batch `events`
  * table's core columns). */
final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** A completed inactivity-gap session. */
final case class Session(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

/** Structured Streaming formulations of the event-time operators whose batch
  * twins live in graft.ops.Events (SURVEY.md §2.9): the SAME window
  * transforms run on a `readStream` source with a watermark, and
  * sessionization becomes explicit keyed state via flatMapGroupsWithState.
  *
  * Scale notes: state is partitioned by user_id across executors (the
  * standard keyed-state shard layout); the watermark bounds state size —
  * sessions idle past the gap are emitted and evicted on event-time timeout.
  */
object EventStreams {

  /** Tumbling 10-minute counts/sums per event_type with a watermark —
    * streaming twin of Events.q17WindowTumbling. Works identically on batch
    * frames (watermark is a no-op there). */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact deduplication: drop records whose key was already seen
    * within the watermark horizon — the streaming counterpart of the batch
    * hash-groupBy dedup (state holds one entry per key and is evicted once
    * the watermark passes, so memory is bounded by the horizon, not the
    * stream length). */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Inactivity-gap sessionization with keyed event-time state — streaming
    * twin of Events.q19Sessionize. Sessions closed by a later event in the
    * same batch are emitted immediately; the open tail session lives in
    * `GroupState` and is flushed when the event-time timeout (last event +
    * gap) fires past the watermark. */
  def sessionize(
      events: Dataset[Event],
      gapSec: Long = 1800L,
      watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[Session]): Iterator[Session] = {
      if (batch.isEmpty && state.hasTimedOut) {
        // watermark passed last-event + gap: flush the open session
        val done = state.get
        state.remove()
        return Iterator.single(done)
      }
      val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_type))
      var out = List.empty[Session]
      var cur = state.getOption.orNull
      for (e <- sorted) {
        val s = e.ts.getTime / 1000L
        if (cur == null) cur = Session(userId, s, s, 1L)
        else if (s - cur.end_s > gapSec) { out ::= cur; cur = Session(userId, s, s, 1L) }
        else cur = cur.copy(end_s = s, n_events = cur.n_events + 1L)
      }
      if (cur != null) {
        state.update(cur)
        state.setTimeoutTimestamp(cur.end_s * 1000L + gapSec * 1000L)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
