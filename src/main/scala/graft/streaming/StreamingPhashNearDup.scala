package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming image/pHash near-duplicate detection — the streaming twin of
  * mm06/mm08's banded perceptual-hash relation, completing the online form
  * for the LAST near-dup family ([[StreamingNearDup]] covers MinHash bands,
  * [[StreamingSemanticDedup]] embeddings, [[StreamingHotSpans]] spans): an
  * ingest pipeline flags arriving media against the recent corpus instead
  * of re-running the batch self-join.
  *
  * Shape: the decode is the family's mm02 kernel slot
  * ([[graft.ops.Multimodal.FakeDecoder]] — a real image codec swaps in
  * behind the same signature), features quantize to the SAME 9-level
  * thermometer code as the batch relation (shared
  * [[graft.ops.Multimodal.levelsCol]]), and each doc's 2×4 band codes
  * (shared [[graft.ops.Multimodal.phashBandsCol]] — injective packed
  * values, not hashes) key [[StreamingNearDup]]'s band-bucket
  * `transformWithState` processor via [[StreamingNearDup.candidatesWith]].
  * Nothing about the state machinery is duplicated: only the geometry
  * (2×4 instead of 16×4) and the collision verify differ — and the verify
  * here is EXACT level-Hamming (the stored vector IS the full level
  * vector), so streamed verdicts equal the batch relation's, not an
  * estimate. Emitted `est` is the Hamming distance itself: 0 = exact
  * pHash duplicate, 1 = near-duplicate.
  *
  * Bounded state, 100 TB/day: identical arguments to the MinHash twin —
  * per-bucket `bucketCap` (the stub corpus collapses many docs onto few
  * vectors, exactly the hot-bucket shape mm06 documents; mass-duplicate
  * streams should run exact dedup first), event-time horizon pruning via
  * cleanup timers, once-per-pair emission from the smallest shared band
  * (a hamming-1 pair differs inside exactly one band, so exactly one
  * bucket owns it; a hamming-0 pair is owned by band 0).
  */
object StreamingPhashNearDup {
  import StreamingNearDup.{BandRow, CandPair, DocSig}

  /** Map (doc_id, ts, payload) rows to [[StreamingNearDup.DocSig]] whose
    * `sig` is the 8-dim pHash LEVEL vector — the mm02 decode kernel as a
    * narrow typed map (one decoder per partition, the batch operator's
    * amortization shape), watermark-preserving. */
  def levels(df: DataFrame, docId: Column, ts: Column, payload: Column): Dataset[DocSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(docId.cast("long").as("doc_id"), ts.cast("long").as("ts"),
        payload.cast("binary").as("payload"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, t, bytes) =>
        val m = graft.ops.Multimodal.FakeDecoder.decode(id, bytes)
        DocSig(id, t, m.features.map(f => (f.toLong * 9 / 997): Long).toSeq)
      }}
  }

  /** Explode a level vector into its 2 band rows (band value = the packed
    * base-9 slice, the batch relation's key verbatim). */
  def bandRows(docs: Dataset[DocSig]): Dataset[BandRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF()
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(graft.ops.Multimodal.phashBandsCol(col("sig"))).as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("doc_id"), col("ts"), col("sig"))
      .as[BandRow]
  }

  /** End-to-end: decode → levels → bands → watermark → bucket collisions
    * (once per pair; `est` = exact Hamming distance ≤ `maxHamming`).
    * Same watermark-after-banding rationale as [[StreamingNearDup.pairs]]. */
  def pairs(df: DataFrame, docId: Column, ts: Column, payload: Column,
            horizonMs: Long, delay: String = "0 seconds",
            bucketCap: Int = 4096, maxHamming: Long = 1): DataFrame = {
    val wmBands = bandRows(levels(df, docId, ts, payload)).toDF()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[BandRow](org.apache.spark.sql.Encoders.product[BandRow])
    StreamingNearDup.candidatesWith(wmBands, horizonMs, bucketCap,
        StreamingNearDup.HammingAtMost(maxHamming),
        graft.ops.Multimodal.PhashBands, graft.ops.Multimodal.PhashBandWidth)
      .select(col("doc_a"), col("doc_b"), col("est").as("hamming"), col("ts"))
  }
}
