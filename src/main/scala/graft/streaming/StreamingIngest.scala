package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus-ingest admission — the streaming composition of pp04's
  * gate stages over the [[graft.ops.Ingest]] disk store: each micro-batch of
  * (doc_id, source, text) rows runs quality → language → [optional model
  * gates: DSIR threshold + perplexity band, pp04's selector slot] →
  * exact-dedup → near-dup admission against the committed corpus log and
  * appends its admitted slice + index entries + attrition stats.
  *
  * foreachBatch, not chained stateful operators, for the same reasons as
  * [[StreamingAnnProbe]]: the admission pipeline is multi-stage (two keyed
  * dedup joins against STORED state plus intra-batch windows), the corpus
  * index must outlive the stream (a 100 TB corpus does not belong in a
  * state store), and exact/near dedup key by DIFFERENT columns (fingerprint
  * vs band bucket), which a single pass of keyed state cannot express and
  * multiple flatMapGroupsWithState stages are disallowed.
  *
  * Exactly-once across crash-replays comes from the store's commit-marker
  * protocol (stats written last; readers list committed directories only;
  * replays overwrite their own batch directories) — see [[graft.ops.Ingest]].
  * This completes build/serve/stream for the PIPELINE the way
  * ss13/ss14/[[StreamingAnnProbe]] did for ANN and
  * dd07/dd12/[[StreamingNearDup]] did for lexical dedup.
  */
object StreamingIngest {

  /** Start ingesting a streaming (doc_id, source, text) relation into the
    * corpus store at `dir`. Stateless on the stream side: no watermark, no
    * state store — the disk log is the only state.
    *
    * `checkpointLocation` MUST be a durable path in production: the store's
    * exactly-once protocol keys on `batchId`, and only a durable streaming
    * checkpoint pins the batchId↔offsets mapping across restarts. Without
    * one, Spark falls back to a temporary checkpoint that dies with the
    * query, a restarted stream renumbers from batch 0, and
    * [[graft.ops.Ingest.ingestBatch]]'s committed-batch guard would then
    * discard the NEW data as replays. The default (None, temp checkpoint)
    * is for single-run/test use only. */
  def ingestStream(docs: DataFrame, dir: String,
                   checkpointLocation: Option[String] = None,
                   modelGates: Seq[graft.ops.Ingest.ModelGate] = Seq.empty): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Ingest.ingestBatch(batch.sparkSession, dir, batch, batchId,
          modelGates = modelGates)
      }
    checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)).start()
  }

  /** [[ingestStream]] composed with the incremental ANN index: each
    * micro-batch runs corpus admission AND lands its admitted docs' PQ
    * codes as an index append slice under the SAME batch id —
    * [[graft.ops.Ingest.ingestAndIndexBatch]]'s two-store commit-order
    * contract (admission commit first, codes commit second; a crash
    * between them replays cleanly because the index append re-reads the
    * admitted set from the committed store). Input rows must carry
    * (doc_id, source, text, embedding); the index artifacts must already
    * be frozen ([[graft.ops.AnnIndex.ensureArtifacts]]) — the same
    * checkpoint-durability caveat as [[ingestStream]] applies. */
  def ingestStreamIndexed(docs: DataFrame, dir: String, indexDir: String,
                          checkpointLocation: Option[String] = None,
                          modelGates: Seq[graft.ops.Ingest.ModelGate] = Seq.empty): StreamingQuery = {
    val w = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Ingest.ingestAndIndexBatch(batch.sparkSession, dir, indexDir,
          batch, batchId, modelGates = modelGates)
      }
    checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc)).start()
  }

  /** DSIR threshold gate (the sp14/[[StreamingDsir]] scorer as an admission
    * stage): keep docs whose frozen-model LLR score clears `minScore` — the
    * paper's importance-resampling acceptance by weight, map-only (a
    * codegen'd fold against the <= 256-entry weight map, no join). */
  def dsirGate(wmap: Map[String, Double], default: Double,
               minScore: Double): graft.ops.Ingest.ModelGate =
    docs => docs.filter(graft.ops.Dsir.scoreCol(wmap, default) >= minScore)
      .select(org.apache.spark.sql.functions.col("doc_id"))

  /** CCNet perplexity band gate (the sp15/[[StreamingPerplexity]] scorer as
    * an admission stage): keep docs inside the stored model's per-source
    * middle band; unseen sources gate CLOSED (PerplexityStore.score). */
  def perplexityGate(m: PerplexityStore.Model): graft.ops.Ingest.ModelGate =
    docs => PerplexityStore.score(docs, m)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .select(org.apache.spark.sql.functions.col("doc_id"))

  /** Frozen linear-classifier gate (the tx13 scorer as an admission stage):
    * keep docs whose hashed-feature fastText-style score clears `minScore`
    * (default 0, tx13's keep threshold; deployments tune the operating
    * point against a labeled holdout) — the GPT-3/CCNet "quality
    * classifier" admission slot. Map-only like [[dsirGate]]: the 64-bucket
    * weight table rides the plan as a literal array, so the gate adds zero
    * shuffles and zero state. */
  def classifierGate(minScore: Double = 0.0): graft.ops.Ingest.ModelGate =
    docs => docs.filter(graft.ops.TextOps.clfScoreCol >= minScore)
      .select(org.apache.spark.sql.functions.col("doc_id"))

  /** Decontamination gate: drop every doc sharing an 8-TOKEN WINDOW
    * ([[graft.ops.Dedup.DeconSpanK]] — the Lee-et-al./PaLM-style span
    * criterion, dd08's window kernel; see DeconSpanK's scaladoc for the
    * measured why-not-3-grams) with the frozen benchmark suite — the gate
    * real pretraining ingest runs next to dedup, so eval contamination
    * never REACHES the corpus instead of being scrubbed after the fact
    * (dc01/dc02 remain the batch audit; dc03 is this gate's composed
    * batch twin). `benchHashes` is a (h: BIGINT) relation of the suite's
    * distinct window hashes (build it with [[benchmarkSpans]]) — a frozen
    * stored artifact like the DSIR/perplexity/classifier models (eval
    * suites are bounded: thousands of docs — broadcast-sized; a giant
    * suite falls back to a shuffle join on the window hash, still one
    * pass). Unlike the map-only gates this one joins, which the
    * ModelGate contract already allows ("map-only or broadcast-join
    * scorer against frozen artifacts" — Ingest.ingestBatch). The
    * word-hash array materializes in its own projection and the generator
    * is explode_outer — both the dd08 inlining lessons. */
  def decontaminationGate(benchHashes: DataFrame): graft.ops.Ingest.ModelGate =
    docs => {
      import org.apache.spark.sql.functions.{col, explode_outer}
      val contaminated = docs
        .select(col("doc_id"), graft.ops.Dedup.wordHashCol(col("text")).as("graft_wh"))
        .select(col("doc_id"), explode_outer(
          graft.ops.Dedup.spansFromWh(col("graft_wh"), graft.ops.Dedup.DeconSpanK)).as("h"))
        .join(benchHashes.select(col("h")), Seq("h"), "left_semi")
      docs.select(col("doc_id"))
        .join(contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
    }

  /** The frozen artifact builder for [[decontaminationGate]]: the suite's
    * distinct decontamination-window hashes from its (text) relation —
    * same kernel, same window length, so the artifact and the gate can
    * never disagree on what a window is. */
  def benchmarkSpans(suite: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode_outer}
    suite.select(graft.ops.Dedup.wordHashCol(col("text")).as("graft_wh"))
      .select(explode_outer(
        graft.ops.Dedup.spansFromWh(col("graft_wh"), graft.ops.Dedup.DeconSpanK)).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
  }
}
