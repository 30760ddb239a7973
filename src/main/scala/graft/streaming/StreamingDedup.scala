package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming deduplication — the streaming analog of the batch dd01/dd02
  * operators, for pipelines that clean records as they arrive rather than in
  * a backfill.
  *
  * Two tiers, both with BOUNDED state (the property that survives an
  * unbounded key space at 100 TB/day):
  *
  *  - [[exact]]: Spark's `dropDuplicatesWithinWatermark` — keeps the first
  *    record per key; per-key state is evicted once the watermark passes the
  *    record's event time + the watermark delay. The zero-custom-code path
  *    for the common at-least-once-ingest repair.
  *  - [[firstSeen]]: `transformWithState` with per-key ValueState + an
  *    event-time timer — same keep-first semantics over a configurable dedup
  *    horizon, but additionally COUNTS the suppressed duplicates and emits
  *    one stats row per key when its horizon expires, so the pipeline
  *    observes dup rates without a second aggregation pass. State and timers
  *    are O(1) per live key; expiry re-opens the key (horizon semantics,
  *    like `dropDuplicatesWithinWatermark`).
  */
object StreamingDedup {

  /** Keep the first record per `keyCols` within the watermark horizon.
    * `df` must already carry `withWatermark` on its event-time column. */
  def exact(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keyCols)

  final case class KeyedRecord(key: String, ts: Long, payload: String)

  /** `is_first=true` rows are the deduped stream (one per key per horizon);
    * `is_first=false` rows are end-of-horizon stats (emitted only when at
    * least one duplicate was suppressed; `n_dups` counts them). */
  final case class DedupResult(key: String, payload: String, n_dups: Long, is_first: Boolean)

  /** Keep-first with duplicate counting over an event-time horizon. The
    * input must carry a watermark on its event-time column (millis in `ts`);
    * a key's state expires once the watermark passes firstTs + horizonMs. */
  def firstSeen(ds: Dataset[KeyedRecord], horizonMs: Long): Dataset[DedupResult] =
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new FirstSeenProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[DedupResult])

  private final class FirstSeenProcessor(horizonMs: Long)
    extends StatefulProcessor[String, KeyedRecord, DedupResult] {

    // (first payload, suppressed-duplicate count)
    @transient private var seen: ValueState[(String, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[(String, Long)]("seen",
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedRecord],
                                 timerValues: TimerValues): Iterator[DedupResult] = {
      // single pass, O(1) memory: a hot key replaying millions of duplicates
      // in one micro-batch must not be buffered (the skewed-duplicate
      // workload is exactly what a streaming dedup exists for)
      if (seen.exists()) {
        var n = 0L
        while (rows.hasNext) { rows.next(); n += 1 }
        val (first, dups) = seen.get()
        seen.update((first, dups + n))
        Iterator.empty
      } else {
        // within one micro-batch the earliest event (ties to payload order)
        // is "first" — batches are unordered multisets in Spark streaming
        var n = 0L
        var first: KeyedRecord = null
        while (rows.hasNext) {
          val r = rows.next(); n += 1
          if (first == null || r.ts < first.ts ||
            (r.ts == first.ts && r.payload < first.payload)) first = r
        }
        seen.update((first.payload, n - 1))
        getHandle.registerTimer(first.ts + horizonMs)
        Iterator.single(DedupResult(key, first.payload, 0L, is_first = true))
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[DedupResult] =
      if (seen.exists()) {
        val (first, dups) = seen.get()
        seen.clear()
        if (dups > 0) Iterator.single(DedupResult(key, first, dups, is_first = false))
        else Iterator.empty
      } else Iterator.empty
  }
}
