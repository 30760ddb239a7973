package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed corpus statistics over a document ingest stream — the
  * streaming analog of the batch tx02/tx03 rollups, for monitoring an
  * always-on cleaning pipeline (docs/sec, token volume, quality drift per
  * language) without a second batch pass.
  *
  * Built on the native watermark + window aggregation operators, so Spark
  * keeps ONE state row per (window, group) — state is bounded by the
  * watermark delay regardless of stream volume, and the partial aggregation
  * combines map-side before the single keyed shuffle (the same property the
  * batch rollups rely on at 100 TB).
  *
  * Append output mode: a window row is emitted exactly once, when the
  * watermark passes its end — the contract downstream writers (parquet
  * sinks, monitoring topics) want. Rows later than the watermark delay are
  * dropped by the watermark operator, never double-counted.
  */
object WindowedStats {

  /** Per-window, per-language ingest stats over a stream of
    * `(doc_id, ets: timestamp, lang, tokens, quality)`.
    *
    * @param width window width (e.g. "1 minute"); tumbling when `slide` is
    *              empty, sliding (each row in width/slide windows) otherwise
    * @param delay watermark delay: how late a document may arrive and still
    *              be counted; also bounds the aggregation state horizon
    */
  def docStats(df: DataFrame, width: String, slide: Option[String] = None,
               delay: String = "10 seconds"): DataFrame =
    df.withWatermark("ets", delay)
      .groupBy(window(col("ets"), width, slide.getOrElse(width)), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("n_tokens"),
        min(col("quality")).as("min_quality"),
        avg(col("quality")).as("avg_quality"),
        approx_count_distinct(col("doc_id")).as("approx_distinct_docs"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("lang"), col("n_docs"), col("n_tokens"),
        col("min_quality"), col("avg_quality"), col("approx_distinct_docs"))
}
