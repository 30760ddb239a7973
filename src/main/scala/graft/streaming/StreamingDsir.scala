package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** Streaming scoring twin of the sp14 DSIR selector — the production
  * deployment shape: the model is TRAINED OFFLINE (sp14's bucket counts over
  * a reference corpus, a <= 256-row artifact loaded once per stream start via
  * [[Dsir.loadModel]]) and APPLIED ONLINE as a pure per-document projection.
  *
  * Execution shape (what survives 100 TB/day): the scorer is map-only — a
  * codegen'd fold over the token array against a 256-entry map literal, no
  * join, no shuffle, NO STATE (the model is driver-side constant folding, not
  * a stream-static join, so there is nothing to re-broadcast per batch and
  * statelessness is structural). Novel tokens hash to buckets unseen in the
  * reference corpus and take the model's default weight — the smoothed
  * zero-count LLR, not an arbitrary sentinel.
  *
  * Selection note: sp14's top-k-per-source RANKING is deliberately NOT
  * reproduced per micro-batch — a per-batch top-k answers a different
  * question than the corpus-level one (it depends on batch boundaries).
  * Production stream selection thresholds the score (the paper's importance
  * resampling accepts by weight, not rank); the spec pins score equality
  * with the batch selector, which is the part that must not drift.
  */
object StreamingDsir {

  /** Score a (streaming or batch) frame of `(doc_id, source, text, ...)`
    * against a loaded model; append-mode safe (pure projection). */
  def scoreStream(docs: DataFrame, wmap: Map[String, Double], default: Double): DataFrame =
    docs.select(col("doc_id"), col("source"),
      Dsir.scoreCol(wmap, default).as("score"))
}
