package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming path (SURVEY.md §2.9) — this is the
  * forward-looking surface a 100 TB ingest needs: the SAME transforms run
  * batch or streaming (the DataFrame fns below take either), watermarks
  * bound state, and sessionization carries explicit per-key state through
  * flatMapGroupsWithState with event-time timeout — state size is
  * O(active users), not O(events).
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long,
      totalValue: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling 1h windows per event_type with a 10-minute watermark:
    * late events beyond the watermark drop, window state is evicted once
    * the watermark passes — bounded memory at unbounded input.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Per-user sessionization with explicit state: a session closes when
    * no event arrives within 30 min of the last (event-time timeout), or
    * when an in-batch gap exceeds 30 min. Emits closed sessions only —
    * the streaming twin of Relational.sessionize.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the gap: close and emit the open session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastTs), s.nEvents, round2(s.totalValue)))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= SessionGapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastTs), s.nEvents, round2(s.totalValue))
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + SessionGapMs)
            }
            closed.result().iterator
          }
      }
  }

  private def round2(d: Double): Double = math.rint(d * 100) / 100
}
