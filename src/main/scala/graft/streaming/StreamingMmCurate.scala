package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming multimodal-curation — the mm10 batch capstone's online form:
  * each micro-batch of (doc_id, source, text) media rows runs the shared
  * gate pass + exact-pHash + hamming-1 near-dup admission against the
  * committed [[graft.ops.MmIngest]] store (see its scaladoc for the
  * batch-equality contract and the census-cap divergences). This closes
  * the capstone pair for the media family the way
  * [[StreamingIngest.ingestStream]] did for text: batch mm10 is the
  * one-shot audit, this is the arrival-time admission a production
  * pipeline actually runs, and the two are spec-pinned equal on
  * id-ordered arrivals (MmCurateStreamingSpec).
  *
  * The checkpoint-durability caveat is [[StreamingIngest.ingestStream]]'s
  * verbatim: exactly-once keys on batchId, so production MUST pass a
  * durable `checkpointLocation`; the temp-checkpoint default is for
  * single-run/test use only.
  */
object StreamingMmCurate {

  /** Start curating a streaming (doc_id, source, text) relation into the
    * MmIngest store at `dir`. Stateless on the stream side: no watermark,
    * no state store — the disk log is the only state. */
  def curateStream(docs: DataFrame, dir: String,
                   checkpointLocation: Option[String] = None,
                   bucketCap: Long = 4096L): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.MmIngest.curateBatch(batch.sparkSession, dir, batch, batchId,
          bucketCap = bucketCap)
      }
    checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)).start()
  }
}
