package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR model pieces shared by the sp14 batch query and its streaming
  * scoring twin ([[graft.streaming.StreamingDsir]]) — ONE definition of the
  * tokenizer, bucket key, and weight formula, the same single-definition
  * rule the ingest family applies to banding/fingerprints (a scorer that
  * drifted from the selector's model would silently re-rank).
  *
  * Model: Laplace-smoothed unigram distributions over 256 hashed token
  * buckets for a TARGET slice vs the RAW corpus (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"); a document
  * scores the sum of per-token log-likelihood ratios. The bucket key is the
  * md5-hex prefix (dd02's cross-engine precedent), so DuckDB replays it
  * exactly.
  *
  * Scale notes: [[bucketCounts]] is one partial-agg shuffle collapsing the
  * corpus to <= 256 rows; [[weights]] attaches the totals as a one-row
  * broadcast (action-free — sp14's plan has zero driver-side jobs);
  * [[loadModel]] is the STREAM-side artifact load — a bounded 256-row
  * collect done once per stream start, never per batch; [[scoreCol]] is a
  * pure per-row projection (map-only, codegen'd array fold over a 256-entry
  * map literal) usable identically on batch and streaming frames.
  */
object Dsir {

  /** 256 string buckets both engines derive identically. */
  def bucketCol(tok: Column): Column = substring(md5(tok), 1, 2)

  /** Bucket model counts over a reference corpus: (bkt, r_cnt, t_cnt);
    * target slice = lang='en' (any trusted slice works — the fixture's
    * English docs play the paper's high-quality corpus). */
  def bucketCounts(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(TextOps.vocabTokens).as("token"))
      .select(col("lang"), bucketCol(col("token")).as("bkt"))
      .groupBy(col("bkt")).agg(
        count(lit(1)).as("r_cnt"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_cnt"))

  /** Smoothed log-likelihood-ratio weight per OBSERVED bucket, totals
    * attached as a one-row broadcast — the action-free batch path. */
  def weights(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("r_cnt")).as("r_tot"), sum(col("t_cnt")).as("t_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("bkt"),
        (log((col("t_cnt") + 1).cast("double") / (col("t_tot") + 256).cast("double"))
          - log((col("r_cnt") + 1).cast("double") / (col("r_tot") + 256).cast("double"))).as("w"))
  }

  /** Sentinel "bucket" carrying the UNSEEN-bucket weight through [[weights]]
    * itself — never collides with a real 2-hex-char key. */
  private val UnseenKey = "__unseen__"

  /** Driver-side model artifact for the streaming scorer: the weight map
    * plus the weight of a bucket UNSEEN in the reference corpus (novel
    * tokens arrive on a stream; the batch self-model never needs it).
    * Both come out of the SAME [[weights]] formula — the default is the
    * zero-count row, appended as a sentinel that leaves the totals
    * untouched — so the formula has exactly one definition (a second
    * driver-side copy could drift and silently re-rank the stream scorer
    * against the batch selector). Bounded: <= 257 rows collected once per
    * stream start. */
  def loadModel(counts: DataFrame): (Map[String, Double], Double) = {
    val zero = counts.sparkSession.range(1).selectExpr(
      s"'$UnseenKey' AS bkt", "CAST(0 AS BIGINT) AS r_cnt", "CAST(0 AS BIGINT) AS t_cnt")
    val all = weights(counts.unionByName(zero)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    (all - UnseenKey, all(UnseenKey))
  }

  /** Per-row LLR score of `text` against a loaded model: a codegen'd fold
    * over the token array in TOKEN ORDER — the same addition order the
    * batch explode/groupBy accumulates in, so the two formulations agree
    * bit-for-bit before the shared 6dp rounding. */
  def scoreCol(wmap: Map[String, Double], default: Double): Column = {
    val m = typedLit(wmap)
    // NULL text scores 0.0 like empty text (the tokenless-doc contract the
    // streaming monitoring shape depends on), never a NULL that would NPE
    // readers or silently vanish under a score threshold
    val toks = coalesce(TextOps.vocabTokens, array().cast("array<string>"))
    round(
      aggregate(
        transform(toks,
          tok => coalesce(element_at(m, bucketCol(tok)), lit(default))),
        lit(0.0), (acc, x) => acc + x),
      6)
  }
}
