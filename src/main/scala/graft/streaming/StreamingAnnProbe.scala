package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming probe twin of the stored ANN index (ss13 build / ss14 batch
  * probe): a stream of query ids served per micro-batch from the
  * aid-partitioned parquet index — the production shape where an online
  * query feed hits an offline-built vector index.
  *
  * Execution shape (what survives 100 TB + a 24/7 query stream):
  *  - the index is NEVER re-encoded: each micro-batch reads the stored
  *    (vec_id, aid, code) parquet, and the batch's broadcast probe list
  *    pushes its probed aids into that scan as dynamic partition-pruning
  *    filters — only probed buckets' files open per batch, exactly the
  *    ss14 plan property (pinned per-batch by StreamingAnnProbeSpec);
  *  - foreachBatch, not a stream-static join: the serving pipeline is
  *    multi-stage (probe join → ADC top-R → exact rescore with two
  *    per-query windows), which stream-static planning can't express —
  *    per-batch batch-planning is the standard escape hatch and keeps the
  *    stream side STATELESS (no watermark, no state store; the index is
  *    the only state and it lives on disk);
  *  - batch and stream answers are equal BY CONSTRUCTION: each batch's ids
  *    flow through [[graft.ops.Similarity.ivfAdcServeFor]] — the identical
  *    joins the ss14 registry query runs — so the union of per-batch
  *    outputs over any partition of a query set equals the one-shot batch
  *    answer on that set (queries are independent rows in every stage).
  *
  * This completes the build/serve/stream triple for ANN the way
  * dd07/dd12/StreamingNearDup did for lexical dedup.
  */
object StreamingAnnProbe {

  /** Serve a streaming (q_id: bigint) relation from the stored index of
    * testdata dir `d`, delivering each micro-batch's answer table
    * (q_id, neighbor_id, adc, d2, rank) to `onBatch`.
    *
    * @param queries streaming DataFrame with a `q_id` column
    * @param onBatch consumer of each batch's RESULT DataFrame (already the
    *                served answers, not the raw ids) and its batch id —
    *                the spec collects these; production would sink them
    */
  def probeStream(queries: DataFrame, d: String,
                  onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    probeStreamWith(queries, onBatch,
      (s, qIds) => graft.ops.Similarity.serveFromStoredIndex(s, d, qIds))

  /** [[probeStream]] with the serving backend injected — the same
    * per-batch plumbing over a DIFFERENT stored index, e.g. the
    * incrementally-maintained log ([[graft.ops.AnnIndex.serveFromLog]]):
    * queries stream against an index that admission batches keep
    * appending to, and each micro-batch's answers reflect the view its
    * serve call resolved (the log's committed-slice semantics, not a
    * stream-internal state store). */
  def probeStreamWith(queries: DataFrame,
                      onBatch: (DataFrame, Long) => Unit,
                      serve: (org.apache.spark.sql.SparkSession, DataFrame) => DataFrame): StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // the probe list must be a stable local relation: the serving
        // pipeline references the query set in THREE joins (probe list,
        // ADC tables, rescore attach), and a foreachBatch source relation
        // is only valid within this batch — collect the (tiny) id set
        // once rather than re-planning the stream leaf three times
        val ids = batch.select(col("q_id").cast("long")).distinct()
          .collect().map(_.getLong(0))
        if (ids.nonEmpty) {
          import s.implicits._
          val qIds = ids.toSeq.toDF("q_id")
          onBatch(serve(s, qIds), batchId)
        }
      }
      .start()
}
