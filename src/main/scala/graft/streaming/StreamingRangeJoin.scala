package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event-time range join — the streaming twin of
  * [[graft.ops.RangeJoin]] (rj01's attribution-window shape), and the ONE
  * temporal operator where Spark-first means the BUILT-IN: Structured
  * Streaming's stream-stream inner join with a time-range condition is
  * exactly this operator, with watermark-driven state cleanup for free.
  * Unlike the transformWithState family (as-of, funnel, sessionize — shapes
  * the engine lacks), wrapping the native join is the whole implementation;
  * the wrapper only encodes the range contract so batch and streaming
  * formulations provably share it (the spec pins streaming == batch
  * RangeJoin.bucketed on identical data).
  *
  * Semantics: every pair (l, r) on the same key with
  * `l.time + loOffset <= r.time < l.time + hiOffset` (same bounds as the
  * batch operator). Both inputs must carry event-time TIMESTAMP columns with
  * watermarks; Spark bounds each side's state to the range span plus the
  * watermark delay and emits pairs exactly once (append mode). At 100 TB the
  * plan is the same co-partitioned symmetric hash join the batch bucketing
  * approximates — state per key bounded by the time span, never the stream.
  *
  * Column contract mirrors [[graft.ops.AsofJoin]]: disjoint column names;
  * `leftTime`/`rightTime` are TimestampType event-time columns (epoch-ms
  * longs convert via timestamp_millis before watermarking).
  */
object StreamingRangeJoin {

  def joined(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTime: String, rightTime: String,
             loOffsetMs: Long, hiOffsetMs: Long): DataFrame = {
    require(hiOffsetMs > loOffsetMs, "empty range window")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right columns must be disjoint, shared: $overlap")
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTime) >= col(leftTime) + expr(s"INTERVAL ${loOffsetMs} MILLISECOND") &&
        col(rightTime) < col(leftTime) + expr(s"INTERVAL ${hiOffsetMs} MILLISECOND"))
  }
}
