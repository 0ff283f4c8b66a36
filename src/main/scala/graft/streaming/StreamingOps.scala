package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the streaming API (matches the `events` table minus
  * the free-form props column). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Open-session state carried across micro-batches (epoch millis). */
case class SessionState(startMs: Long, lastMs: Long, n: Int)

/** Closed session emitted on gap expiry / event-time timeout. */
case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

/** Structured Streaming twins of the batch event analytics
  * ([[graft.extensions.Events]]): watermarked tumbling windows and a
  * mapGroupsWithState sessionizer. The reference is pure batch (SURVEY.md
  * §2.5 — its only "checkpoint" is a hardcoded resume offset,
  * dblpXMLparser.scala:29); these give the engine the streaming surface on
  * the same query shapes.
  *
  * Scale: state per key is O(1) (one open session struct); watermark bounds
  * state retention; both operators shuffle once on their grouping key.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event type with a watermark — the streaming
    * twin of Events.eventsHourly. Append-safe: windows finalize when the
    * watermark passes their end. */
  def hourlyByType(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w").getField("start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows with a 30-minute inactivity gap via
    * flatMapGroupsWithState + event-time timeout — the streaming twin of
    * Events.eventsSessions. Emits a SessionOut when a gap closes a session
    * (either a later event arrives past the gap, or the watermark times the
    * session out). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, evs, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startMs, s.lastMs, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur = cur match {
                case Some(s) if ms - s.lastMs <= gapMs =>
                  Some(s.copy(lastMs = math.max(s.lastMs, ms), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, s.startMs, s.lastMs, s.n)
                  Some(SessionState(ms, ms, 1))
                case None =>
                  Some(SessionState(ms, ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same id within the
    * watermark horizon (state = one entry per id, expired by watermark —
    * the bounded-state streaming twin of Dedup.dedupExact). */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(idCol, "ts")

  /** File-stream entry point: tail a parquet directory as an event stream
    * (schema pinned from a batch read so the stream starts without
    * inference). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.sources.Tables.events(spark, dir).schema
    spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
  }
}
