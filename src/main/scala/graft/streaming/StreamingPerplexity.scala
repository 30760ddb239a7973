package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of sp15's perplexity-band selection over a STORED model —
  * CCNet's actual deployment shape: the LM counts and the per-source band
  * thresholds are trained OFFLINE on a reference corpus and frozen to disk;
  * the stream scores and gates documents against that artifact, it never
  * re-trains. Completes build/serve/stream for the LM-selection family the
  * way ss13/ss14/StreamingAnnProbe did for ANN and Ingest did for dedup.
  *
  * Store layout under `dir`: `c1/` (w1, c1), `c12/` (bg, c12), `thr/`
  * (source, p25, p75) parquet + `meta/` (vocab) — every piece derived from
  * the SAME definitions sp15 uses (TextOps.lmRelations / nllCol /
  * Sampling.perplexityScored/perplexityThresholds), so the stored scorer
  * cannot drift from the oracle-checked selector.
  *
  * Serving shape (the 100 TB read): scoring is a foreachBatch pipeline
  * (the StreamingAnnProbe stance — the stream side is stateless, disk is
  * the state): per batch, hashed-bigram pairs left-join the stored count
  * relations (vocabulary-scale — joins, not map literals; AQE broadcasts
  * them while they fit), one per-doc aggregation, a broadcast threshold
  * attach. Unseen sources gate CLOSED (keep=false) — admission of an
  * unmodeled slice is a policy decision, not a default.
  */
object PerplexityStore {

  final case class Model(c1: DataFrame, c12: DataFrame, vocab: Long,
                         thresholds: DataFrame)

  /** Train on the reference corpus at `sfDir` and freeze to `dir`. The LM
    * trains ONCE: the count relations and the threshold scores both derive
    * from the same [[graft.ops.TextOps.lmRelations]] build, and both
    * persisted relations (the LM base and the scored relation) are
    * released before returning. */
  def build(s: SparkSession, sfDir: String, dir: String): Unit = {
    val m = graft.ops.TextOps.lmRelations(s, sfDir)
    m.c1.write.mode("overwrite").parquet(s"$dir/c1")
    m.c12.write.mode("overwrite").parquet(s"$dir/c12")
    val scored = graft.ops.Sampling.perplexityScoredOf(s, sfDir, m)
    graft.ops.Sampling.perplexityThresholds(scored)
      .write.mode("overwrite").parquet(s"$dir/thr")
    s.range(1).select(lit(m.vocab).as("vocab")).write.mode("overwrite").parquet(s"$dir/meta")
    scored.unpersist()
    m.base.unpersist()
    ()
  }

  def load(s: SparkSession, dir: String): Model = Model(
    s.read.parquet(s"$dir/c1"),
    s.read.parquet(s"$dir/c12"),
    s.read.parquet(s"$dir/meta").collect()(0).getLong(0),
    s.read.parquet(s"$dir/thr"))

  /** Score a batch frame of `(doc_id, source, text)` against a loaded
    * model: (doc_id, source, score, keep). Batch semantics — usable inside
    * foreachBatch or standalone. */
  def score(docs: DataFrame, m: Model): DataFrame = {
    val ids = docs.select(col("doc_id"), col("source"))
    val pairs = graft.ops.TextOps.bigramPairsFromWh(
      docs.select(col("doc_id"),
        graft.spark.SketchExpressions.wordHashes(col("text")).as("wh")))
    val scored = pairs
      .join(m.c12, Seq("bg"), "left")
      .join(m.c1, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(avg(graft.ops.TextOps.nllCol(m.vocab)).as("nll"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        round(coalesce(col("nll"), lit(0.0)), 6).as("score"))
      .join(broadcast(m.thresholds), Seq("source"), "left")
      .select(col("doc_id"), col("source"), col("score"),
        coalesce(col("score") >= col("p25") && col("score") <= col("p75"),
          lit(false)).as("keep"))
  }
}

object StreamingPerplexity {

  /** Serve a document stream from the stored model: per micro-batch the
    * `sink` receives the scored/gated frame. Stateless — disk is the
    * state; the model loads ONCE per stream start. */
  def scoreStream(docs: DataFrame, modelDir: String,
                  sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val m = PerplexityStore.load(docs.sparkSession, modelDir)
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) sink(PerplexityStore.score(batch, m), id)
      }.start()
  }
}
