package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the canonical production streaming shape the
  * rest of the streaming surface composes with: an event stream joined to a
  * slowly-changing dimension table (customer → market segment), then rolled
  * up per event-time window and segment. The streaming twin of the batch
  * q19 fact-dim join feeding a q15-style windowed aggregate.
  *
  * Execution shape (what survives 100 TB/day):
  *  - the static side joins per micro-batch WITHOUT any stream-side state:
  *    Spark plans a stream-static join as a stateless per-batch join, so the
  *    only stateful operator is the windowed aggregation after it;
  *  - the dim is broadcast (explicitly — a dimension that outgrows the
  *    broadcast threshold would otherwise silently shuffle EVERY micro-batch
  *    of the stream on the join key);
  *  - the windowed rollup keeps one state row per (window, segment), bounded
  *    by the watermark horizon, and partial-aggregates map-side before the
  *    single keyed shuffle — exactly the batch rollup's scale property.
  *
  * A LEFT join keeps events whose key misses the dimension (in production:
  * events racing dim-table snapshots) in an explicit 'UNKNOWN' bucket rather
  * than silently dropping volume — monitoring wants the miss rate visible.
  */
object StreamingEnrich {

  /** Per-window, per-segment enriched rollup over a stream of
    * `(event_id, ets: timestamp, user_id, value)` joined to a static dim of
    * `(c_custkey, c_mktsegment)`.
    *
    * @param width tumbling window width (e.g. "10 seconds")
    * @param delay watermark delay: how late an event may arrive and still
    *              count; also bounds the aggregation state horizon
    */
  def segmentRollup(events: DataFrame, dim: DataFrame, width: String,
                    delay: String = "10 seconds"): DataFrame =
    events.withWatermark("ets", delay)
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("ets"), width),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("segment"), col("n"), col("sum_value"))

  /** Batch twin of [[segmentRollup]] on the same column contract — the
    * equality pin that proves the streaming plan computes the batch answer. */
  def segmentRollupBatch(events: DataFrame, dim: DataFrame, width: String): DataFrame =
    events
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("ets"), width),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("segment"), col("n"), col("sum_value"))
}
