package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Spark-native custom-state extension beyond reference parity (SURVEY.md
  * §2.D "north-star extensions"): event-time sessionization with a gap
  * timeout via `flatMapGroupsWithState` — the KeyValueGroupedDataset custom
  * state path a training-data pipeline uses for sessions, rate windows, and
  * stateful dedup beyond `dropDuplicatesWithinWatermark`.
  *
  * State per key is one open session (start/last/count/sum). An event past
  * the gap closes the open session (emitted immediately); the event-time
  * timeout closes idle sessions once the watermark passes last + gap, so
  * state is bounded by the number of concurrently-active keys — the shape
  * that survives an unbounded key space at 100 TB/day ingest.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start: Long, end: Long, n_events: Long, total: Double)

  /** Sessionize an event stream (event-time column `ts` in epoch millis; the
    * input must already carry a watermark on its timestamp column). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: close the idle session
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = batch.toVector.sortBy(_.ts)
            var open = state.getOption
            val closed = Vector.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts - s.last > gapMs =>
                  closed += Session(user, s.start, s.last, s.n, s.sum)
                  open = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case Some(s) =>
                  open = Some(SessionState(s.start, math.max(s.last, e.ts), s.n + 1, s.sum + e.value))
                case None =>
                  open = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
