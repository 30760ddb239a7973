package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
            val (closed, open) = mergeBatch(user, state.getOption, batch.toVector, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Merge the prior open session (if any) and a batch of events into
    * gap-separated sessions: all but the LATEST group close immediately, the
    * latest stays open. Sorting the prior state AMONG the events by start
    * time makes every cross-batch shape correct: an in-watermark event older
    * than the open session merges backwards when within the gap, and forms
    * its own (immediately closed) session when a full gap earlier — the gap
    * invariant holds for every emitted session regardless of how events are
    * split across micro-batches. */
  private def mergeBatch(user: Long, prior: Option[SessionState], batch: Seq[Event],
                         gapMs: Long): (Vector[Session], Option[SessionState]) = {
    val items = (prior.toSeq ++ batch.map(e => SessionState(e.ts, e.ts, 1L, e.value)))
      .sortBy(st => (st.start, st.last))
    val closed = Vector.newBuilder[Session]
    var open: Option[SessionState] = None
    items.foreach { it =>
      open match {
        case Some(s) if it.start - s.last > gapMs =>
          closed += Session(user, s.start, s.last, s.n, s.sum)
          open = Some(it)
        case Some(s) => // sorted by start, so s.start <= it.start
          open = Some(SessionState(s.start, math.max(s.last, it.last), s.n + it.n, s.sum + it.sum))
        case None => open = Some(it)
      }
    }
    (closed.result(), open)
  }

  /** The same sessionization on the `transformWithState` API (Spark 4.x's
    * successor to flatMapGroupsWithState: typed per-key state variables +
    * explicit event-time timers, RocksDB-backed). Semantics are identical to
    * [[sessions]] — one open session per key, closed inline by a past-gap
    * event or by a timer once the watermark passes last + gap — and the spec
    * runs both implementations through the same scenarios.
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`); the older [[sessions]] runs on
    * any provider. */
  def sessionsTws(events: Dataset[Event], gapMs: Long): Dataset[Session] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[Session])

  /** Batch twin of [[sessions]]/[[sessionsTws]]: the gaps-and-islands window
    * formulation (lag to flag session starts, running sum to number them)
    * over a bounded Dataset — same gap rule, same [[Session]] output.
    * StatefulStreamingSpec pins streaming/batch agreement on seeded random
    * data; the oracle-checked SQL shape is ses01 in graft.ops.Temporal.
    * Scale: both windows share one (user_id) partitioning — per-key work,
    * parallel across keys. */
  def sessionsBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.toDF()
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts") - col("prev") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wc))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total"))
      .select(col("user_id"), col("start"), col("end"), col("n_events"), col("total"))
      .as[Session](Encoders.product[Session])
  }

  /** One open session per key in a ValueState; a single registered event-time
    * timer at last + gap closes it if no later event arrives first. Stale
    * timers are deleted on every update, so state AND timer count are O(1)
    * per active key — the bound that survives an unbounded key space. */
  private final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[Session] = {
      val prior = if (session.exists()) Some(session.get()) else None
      val (closed, open) = mergeBatch(user, prior, rows.toVector, gapMs)
      open.foreach { s =>
        session.update(s)
        if (prior.isDefined) getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.last + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Session] =
      if (session.exists()) {
        val s = session.get()
        // a stale timer (event arrived after registration, new timer pending)
        // must not close the still-active session
        if (s.last + gapMs <= expired.getExpiryTimeInMs) {
          session.clear()
          Iterator.single(Session(user, s.start, s.last, s.n, s.sum))
        } else Iterator.empty
      } else Iterator.empty
  }
}
