package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, ValueState}

/** Streaming hot-span detection — dd13's always-on twin: spans (hashed
  * 5-gram windows) arrive with their document ids, and a span is reported
  * the moment it has been seen in `dfThreshold` DISTINCT documents — the
  * boilerplate/memorization alarm an ingest pipeline raises while the
  * corpus accumulates, instead of re-running the batch report.
  *
  * Bounded-state design: the processor stores AT MOST `dfThreshold - 1`
  * distinct doc ids per span (admission stops the moment the threshold
  * crossing is decided) plus a hot flag after emission — state per span is
  * a handful of longs REGARDLESS of how often the span recurs, which is
  * what makes corpus-cumulative detection viable at stream scale. The
  * deliberate trade, stated: the operator reports the threshold CROSSING
  * (df = threshold at emit), not the unbounded running total — counting on
  * past the threshold is a different (counter/sketch) query, bf02's family.
  *
  * Exactly-once emission: the hot flag makes every span emit at most once
  * across all micro-batches (append mode). Distinctness is per document, so
  * a doc repeating its own span cannot inflate df — same contract as dd13's
  * `count(DISTINCT doc_id)`.
  */
object StreamingHotSpans {

  /** One span occurrence in one document. */
  final case class SpanObs(span: Long, doc_id: Long)
  /** A span that reached the distinct-document threshold. */
  final case class HotSpan(span: Long, df: Int)

  /** Hot spans over an unwindowed (corpus-cumulative) span stream. */
  def hotSpans(obs: Dataset[SpanObs], dfThreshold: Int): Dataset[HotSpan] = {
    require(dfThreshold >= 2, "a 1-threshold marks every span hot")
    obs.groupByKey(_.span)(Encoders.scalaLong)
      .transformWithState(new HotSpanProcessor(dfThreshold),
        TimeMode.None(), OutputMode.Append())(Encoders.product[HotSpan])
  }

  /** The equality-pin target: dd13's hot-set definition over the same
    * observations, df reported AS the threshold (the crossing is what the
    * streaming form emits — see the bounded-state trade above). */
  def batchReference(obs: DataFrame, dfThreshold: Int): DataFrame =
    obs.groupBy(col("span"))
      .agg(count_distinct(col("doc_id")).as("dfc"))
      .filter(col("dfc") >= dfThreshold)
      .select(col("span"), lit(dfThreshold).cast("int").as("df"))

  private final class HotSpanProcessor(t: Int)
      extends StatefulProcessor[Long, SpanObs, HotSpan] {

    // <= t-1 doc ids; t is small (a report threshold), so the O(t) set
    // rebuild per admission beats maintaining a map in the store
    @transient private var docs: ListState[Long] = _
    @transient private var hot: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      docs = getHandle.getListState[Long]("docs", Encoders.scalaLong, TTLConfig.NONE)
      hot = getHandle.getValueState[Boolean]("hot", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[SpanObs],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HotSpan] = {
      if (hot.exists()) return Iterator.empty
      val before = docs.get().toSet
      var seen = before
      while (rows.hasNext && seen.size < t) seen += rows.next().doc_id
      if (seen.size >= t) {
        hot.update(true)
        docs.clear() // the doc set has served its purpose; keep only the flag
        Iterator.single(HotSpan(key, t))
      } else {
        if (seen != before) { docs.clear(); seen.foreach(docs.appendValue) }
        Iterator.empty
      }
    }
  }
}
