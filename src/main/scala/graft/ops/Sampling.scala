package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset splitting / sharding operators a training-data pipeline needs
  * around the cleaning steps: deterministic train/val/test assignment and
  * token-budget shard packing.
  *
  * Scale notes (100 TB design):
  *  - split assignment is a pure per-row hash — map-only, reproducible across
  *    runs/engines (md5-based, like dd02's fingerprint — NOT xxhash, which
  *    DuckDB cannot replay), so the oracle is exact and a re-run never
  *    reassigns a document;
  *  - shard packing needs a GLOBAL running token total, which a naive
  *    unpartitioned window computes in ONE task — the classic scale trap.
  *    [[Sampling.packShards]] uses the two-level prefix sum instead: block
  *    subtotals (tiny relation) get block offsets from a window over #blocks
  *    rows, then a window PARTITIONED by block (parallel) adds intra-block
  *    running sums to the broadcast offsets. Work per task is one block; the
  *    only unpartitioned window runs over the block-summary relation
  *    (rows = docs / BlockSize), not the corpus.
  */
object Sampling {
  import Tables.t

  /** Deterministic 0-99 bucket from a key column: first 8 md5 hex digits as
    * an integer (the dd02/dd05 scheme — bit-reproducible in DuckDB via
    * ('0x' || substr(md5(k), 1, 8))::BIGINT). Shared with the incremental
    * dedup / decontamination splits in Dedup. */
  private[ops] def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100
  private[ops] def hashBucketSql(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT % 100"

  /** sp15's rounded per-doc LM scores with source attached, PERSISTED (the
    * narrow relation feeds both the threshold aggregate and the band
    * compare; recomputing it re-ran the LM count joins twice — measured
    * 4.3 -> ~2.8 s at sf0.1). Shared with the stored-model build
    * ([[graft.streaming.PerplexityStore]]) — one scoring definition. */
  private[graft] def perplexityScored(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    perplexityScoredOf(s, d, TextOps.lmRelations(s, d))

  /** [[perplexityScored]] over an already-built LM — the stored-model build
    * ([[graft.streaming.PerplexityStore]]) passes the SAME relations it
    * writes to disk, so the LM trains exactly once. */
  private[graft] def perplexityScoredOf(s: org.apache.spark.sql.SparkSession,
      d: String, m: TextOps.LmRelations): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
    TextOps.nllScoresOf(m)
      .select(col("doc_id"), round(col("nll"), 6).as("score"))
      .join(docs, "doc_id")
      .persist()
  }

  /** sp15's per-source quartile thresholds (shared with the stored model —
    * the CCNet deployment freezes these offline). `approx = true` selects
    * `approx_percentile` (a bounded-memory t-digest-style sketch with
    * map-side partials) over the exact `percentile` (a per-group O(n)
    * buffer): the 100 TB path. Accuracy contract pinned by
    * PerplexityBandSpec in bf03's `within_bound` convention:
    * `ApproxAccuracy` bounds the RANK error to n/accuracy rows, so each
    * approx threshold sits within a quantile band of ±1/accuracy around
    * the exact one. The exact path stays the oracle (sp15). */
  private[graft] def perplexityThresholds(scored: DataFrame,
                                          approx: Boolean = false): DataFrame = {
    val ps =
      if (approx) expr(s"approx_percentile(score, array(0.25D, 0.75D), $ApproxAccuracy)")
      else expr("percentile(score, array(0.25D, 0.75D))")
    scored.groupBy(col("source"))
      .agg(ps.as("ps"))
      .select(col("source"),
        get(col("ps"), lit(0)).as("p25"), get(col("ps"), lit(1)).as("p75"))
  }

  /** Rank-error budget of the approx threshold path: at accuracy A the
    * sketch's guaranteed rank error is n/A, i.e. the returned value lies
    * between the exact (q - 1/A) and (q + 1/A) quantiles. */
  private[graft] val ApproxAccuracy: Int = 10000

  /** bf03-style `within_bound` column for an approx_percentile value at
    * target quantile `q` — the driver-gated form of the rank band the
    * specs pin (SamplingSpec/TemporalSpec, identical lo/hi arithmetic:
    * ±1/[[ApproxAccuracy]] quantiles, plus one rank of slack for the
    * discrete floor/ceil). Expressed on per-group rank STATS instead of a
    * sorted array so it aggregates in one distributed pass: with
    * lt = #{x < v}, le = #{x <= v}, n = group size, the sorted indices
    * holding v are exactly [lt, le-1], so the band [lo, hi] contains one
    * iff v occurs at all (le > lt) and the two intervals intersect.
    * Deterministic on fixed data (the sketch has no randomness), so the
    * oracle's side is a literal TRUE — the bf03 convention. */
  private[ops] def withinRankBand(q: Double, lt: Column, le: Column,
                                  n: Column): Column = {
    val eps = 1.0 / ApproxAccuracy
    val lo = greatest(lit(0L), floor(lit(q - eps) * n) - 1)
    val hi = least(n - 1, ceil(lit(q + eps) * n))
    (le > lt) && (lt <= hi) && (le - 1 >= lo)
  }

  /** The lt/le rank-stat aggregate pair for [[withinRankBand]]: counts of
    * group values strictly below / at-or-below the broadcast-attached
    * approx value in column `vCol` — partial-aggregable conditional sums,
    * so the whole band check costs one extra shuffle-free pass over the
    * already-joined relation. */
  private[ops] def rankStats(x: Column, vCol: Column): (Column, Column) =
    (sum(when(x < vCol, 1L).otherwise(0L)),
     sum(when(x <= vCol, 1L).otherwise(0L)))

  private def splitOf(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  private val splitOfSql =
    "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END"

  /** Docs per block in the two-level prefix sum. Adaptive: ≈ docs /
    * defaultParallelism with a 500-doc floor, so the block-summary relation
    * (the only sequential window) stays at ~defaultParallelism rows at ANY
    * corpus size — at 1e11 docs on a 1000-executor cluster this is ~32k
    * blocks, not the 2e8 a fixed 500-doc block would produce. The shard
    * output is block-size-invariant (offsets + intra-block sums telescope to
    * the same global prefix sum), so the oracle needs no block notion.
    * The driving `count()` is parquet-metadata-cheap relative to the window
    * job. */
  private[ops] def blockSizeFor(nDocs: Long, parallelism: Int): Long =
    math.max(500L, nDocs / math.max(1, parallelism))

  /** Tokens per packed shard (whitespace tokens, the tx03 definition). */
  private[ops] val ShardTokens = 4096L // shared with pp03's survivor packing

  /** sp18's Efraimidis-Spirakis draw ingredients, shared with the streaming
    * twin ([[graft.streaming.StreamingWeightedSample]]) so batch and stream
    * provably score every document identically: w = tx02's quality score
    * (the pp01 shared builder), u = LCG integer math on doc_id mapped into
    * (0, 1], key = −ln(u)/w (smaller is better; selection keeps the k
    * smallest). Engine-exact: integer u; Spark's Log evaluates via
    * StrictMath.log (pinned in SamplingSpec's replay). The id is reduced
    * mod M BEFORE the multiply — (id % M)*a < 2^61, so the fold can never
    * overflow Long (or DuckDB's BIGINT) at any id, and the value is
    * unchanged (x*a ≡ (x%M)*a mod M).
    *
    * Oracle-exactness caveat (FIXTURE-VALIDATED, not proven): the DuckDB
    * compare additionally assumes libm's ln equals fdlibm's
    * StrictMath.log to the last bit on every u = j/2^31 the LCG can
    * produce — libm log may differ by 1 ulp on some inputs (the tx08
    * precedent), which would flip a bitwise key compare or a k-th
    * selection boundary. Validated empirically at all three fixtures;
    * the within-engine contracts (SamplingSpec's bit-exact scala replay,
    * the streaming twin's prefix equality) do not depend on it. */
  private[graft] def esWeightCol: Column = TextOps.qualityCol
  private[graft] def esKeyCol: Column = {
    val m = 2147483647L
    val u = ((((col("doc_id") % m) * 1103515245L + 12345L) % m) + 1L).cast("double") /
      lit(m + 1L).cast("double")
    -log(u) / esWeightCol
  }

  val entries: Seq[Q] = Seq(
    // ---- sp01: deterministic train/val/test split (80/10/10 by doc hash) ----
    Q("sp01_hash_split",
      (s, d) => {
        val b = hashBucket(col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"), splitOf(b).as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("split"))
      },
      Some(s"""WITH b AS (SELECT doc_id, n_chars, ${hashBucketSql("doc_id")} AS bucket FROM documents),
          a AS (SELECT doc_id, n_chars, $splitOfSql AS split FROM b)
        SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY split ORDER BY split""")),

    // ---- sp02: stratified view of the same split — per (lang, split) ----
    // Same hash assignment; the strata report shows the split is balanced
    // within every language (what a per-language-quota sampler checks).
    Q("sp02_stratified_split",
      (s, d) => {
        val b = hashBucket(col("doc_id"))
        t(s, d, "documents")
          .select(col("lang"), splitOf(b).as("split"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("split"))
      },
      Some(s"""WITH b AS (SELECT doc_id, lang, ${hashBucketSql("doc_id")} AS bucket FROM documents)
        SELECT lang, $splitOfSql AS split, count(*) AS n_docs
        FROM b GROUP BY lang, split ORDER BY lang, split""")),

    // ---- sp03: token-budget shard packing (greedy sequential, 4096/shard) ----
    // A doc goes to the shard where its first token lands in the global
    // running total over doc_id order — the sharding analog of sequence
    // packing. Global prefix sum via the two-level formulation (see object
    // scaladoc), NOT one unpartitioned window over the corpus.
    Q("sp03_pack_shards",
      (s, d) => {
        val docs = t(s, d, "documents")
        val blockSize = blockSizeFor(Tables.rowCount(s, d, "documents"), s.sparkContext.defaultParallelism)
        val toks = docs
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"),
            (col("doc_id") / blockSize).cast("bigint").as("blk"))
        // tiny relation: one row per block; its ordered window is the only
        // sequential step. It IS single-partition by design (WindowExec warns;
        // Bench filters that logger) — over #blocks ≈ parallelism rows, never
        // the corpus; a constant partitionBy key would not help, the optimizer
        // folds it away.
        val wBlk = Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = toks.groupBy(col("blk"))
          .agg(sum(col("tokens")).as("blk_sum"))
          .withColumn("blk_off", sum(col("blk_sum")).over(wBlk) - col("blk_sum"))
          .select(col("blk"), col("blk_off"))
        // parallel: running sum within each block + broadcast block offset
        val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks.join(broadcast(offsets), Seq("blk"))
          .withColumn("cum_end", col("blk_off") + sum(col("tokens")).over(wIn))
          .withColumn("shard", ((col("cum_end") - col("tokens")) / ShardTokens).cast("bigint"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"))
      },
      Some(s"""WITH toks AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\\s+')) AS tokens
            FROM documents),
          c AS (SELECT doc_id, tokens,
                  sum(tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
                FROM toks),
          a AS (SELECT doc_id, tokens,
                  -- cum_end inherits HUGEINT from the windowed sum, so the
                  -- derived group key must be cast back to BIGINT or the
                  -- driver's schema hash diverges from Spark's LongType
                  CAST((cum_end - tokens) // $ShardTokens AS BIGINT) AS shard
                FROM c)
        SELECT shard, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS sum_tokens,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard ORDER BY shard""")),

    // ---- sp17: SUBWORD-budget shard packing — sp03's two-level prefix  ----
    // ---- sum keyed by what a trained model actually consumes: the      ----
    // ---- frozen-merges BPE count ([[TextOps.BpeMerges]], the codegen'd ----
    // ---- [[graft.spark.BpeCount]] kernel) instead of whitespace words. ----
    // ---- Whitespace counting over-budgets short-token text and under-  ----
    // ---- budgets long words; shards packed by subword counts are what  ----
    // ---- the training loop sees. The oracle replays the merge loop     ----
    // ---- EXACTLY as a rank-ordered replace() chain (equivalence argued ----
    // ---- at the kernel; divergence in any doc's count shifts every     ----
    // ---- later shard boundary and hash-mismatches). Scale shape is     ----
    // ---- sp03's: the count is map-only per row, the only ordered       ----
    // ---- window is over #blocks rows.                                  ----
    Q("sp17_bpe_pack",
      (s, d) => {
        val docs = t(s, d, "documents")
        val blockSize = blockSizeFor(Tables.rowCount(s, d, "documents"), s.sparkContext.defaultParallelism)
        val toks = docs
          .select(col("doc_id"), TextOps.bpeTokensCol.as("btokens"),
            (col("doc_id") / blockSize).cast("bigint").as("blk"))
        val wBlk = Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = toks.groupBy(col("blk"))
          .agg(sum(col("btokens")).as("blk_sum"))
          .withColumn("blk_off", sum(col("blk_sum")).over(wBlk) - col("blk_sum"))
          .select(col("blk"), col("blk_off"))
        val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks.join(broadcast(offsets), Seq("blk"))
          .withColumn("cum_end", col("blk_off") + sum(col("btokens")).over(wIn))
          .withColumn("shard", ((col("cum_end") - col("btokens")) / ShardTokens).cast("bigint"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("btokens")).as("sum_btokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${TextOps.bpeTokensSql} AS btokens
            FROM documents),
          c AS (SELECT doc_id, btokens,
                  sum(btokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
                FROM toks),
          a AS (SELECT doc_id, btokens,
                  CAST((cum_end - btokens) // $ShardTokens AS BIGINT) AS shard
                FROM c)
        SELECT shard, count(*) AS n_docs, CAST(sum(btokens) AS BIGINT) AS sum_btokens,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard ORDER BY shard""")),

    // ---- sp18: weighted sampling WITHOUT replacement (exponential keys) ----
    // Efraimidis-Spirakis: each doc draws key = -ln(u)/w for deterministic
    // u in (0,1] and weight w; the k SMALLEST keys are a weight-proportional
    // sample without replacement — the quality-weighted corpus subsample a
    // curation pipeline draws when it can't keep everything. Everything is
    // deterministic and engine-exact: u from LCG integer math on doc_id
    // ((a*id + c) mod M + 1)/(M+1), w = tx02's quality score (the pp01
    // shared builder, raw-double identical both engines), keys through one
    // ln + one divide (the tx08 ln precedent). w > 0 always: quality >=
    // 0.4*min(n_words/100, 1) > 0 on any non-empty doc. Scale shape: the
    // selection is TakeOrderedAndProject — map-side partial top-k, no
    // global sort, no shuffle beyond k-row partials (sp08's plan) — and the
    // weight is map-only, so the whole draw is one pass at any corpus size.
    Q("sp18_weighted_sample",
      (s, d) => {
        val N = 200
        t(s, d, "documents")
          .select(col("doc_id"), col("source"), esWeightCol.as("w"), esKeyCol.as("k"))
          .orderBy(col("k"), col("doc_id")).limit(N)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH r AS (SELECT doc_id, source, ${TextOps.qualitySql} AS w,
              -ln(((((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647) + 1)::DOUBLE
                  / 2147483648) / (${TextOps.qualitySql}) AS k
            FROM documents ORDER BY k, doc_id LIMIT 200)
        SELECT doc_id, source, w, k FROM r ORDER BY doc_id""")),

    // ---- sp04: deterministic global training shuffle ----
    // Every epoch-0 data loader wants the corpus in a reproducible pseudo-
    // random order: position = rank of md5(doc_id || seed). A naive
    // row_number() over the full corpus is ONE task; instead the md5 prefix
    // (2 bytes → 65,536 ORDERED range buckets; hex sorts like its value) so
    // the global rank = (broadcast) offset of the bucket + rank within the
    // bucket — the sp03 two-level formulation keyed by hash instead of doc
    // order. 2 bytes keeps per-bucket work ≈ corpus/65536 at any scale while
    // the bucket-summary window stays ≤65,536 rows. Bucket width does not
    // affect pos: prefix ordering is consistent with full-key ordering.
    // ---- sp05: deterministic per-source token-budget mixture selection ----
    // The data-mixing step before training: each source contributes docs —
    // chosen by deterministic md5 rank, so re-runs pick the same docs — until
    // its token budget fills (greedy: the straddling doc is included).
    // Scale shape: the per-source running total is the sp03/sp04 two-level
    // prefix sum keyed INSIDE each source by a 1-byte hash prefix, so no
    // window ever spans a whole source (a source can be billions of docs at
    // 100 TB): the sequential window runs over the (source × ≤256 buckets)
    // summary and the per-bucket windows are parallel. Widen the prefix as
    // sources grow, like sp04.
    Q("sp05_source_mixture",
      (s, d) => {
        val budget = 800L
        val keyed = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"),
            md5(concat(col("doc_id").cast("string"), lit(":mix7"))).as("k"))
          .withColumn("bk", substring(col("k"), 1, 2))
        val wSrc = Window.partitionBy(col("source")).orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = keyed.groupBy(col("source"), col("bk"))
          .agg(sum(col("tokens")).as("bsum"))
          .withColumn("boff", sum(col("bsum")).over(wSrc) - col("bsum"))
          .select(col("source"), col("bk"), col("boff"))
        val wIn = Window.partitionBy(col("source"), col("bk")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = keyed.join(broadcast(offsets), Seq("source", "bk"))
          .withColumn("cum", col("boff") + sum(col("tokens")).over(wIn))
        val sel = cum.filter(col("cum") - col("tokens") < budget)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_selected"), sum(col("tokens")).as("tok_selected"))
        keyed.groupBy(col("source")).agg(count(lit(1)).as("n_candidates"))
          .join(sel, Seq("source"), "left")
          .select(col("source"), col("n_candidates"),
            coalesce(col("n_selected"), lit(0L)).as("n_selected"),
            coalesce(col("tok_selected"), lit(0L)).as("tok_selected"))
          .orderBy(col("source"))
      },
      // one-level per-source window in SQL — value-identical to the
      // two-level engine form (the offsets telescope; ORDER BY k within
      // source is the same total order since bk is a prefix of k)
      Some("""WITH tk AS (SELECT doc_id, source,
              len(string_split_regex(trim(text), '\s+')) AS tokens,
              md5(CAST(doc_id AS VARCHAR) || ':mix7') AS k
            FROM documents),
          c AS (SELECT *, sum(tokens) OVER (PARTITION BY source ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM tk),
          sel AS (SELECT source, count(*) AS n_selected,
                    CAST(sum(tokens) AS BIGINT) AS tok_selected
                  FROM c WHERE cum - tokens < 800 GROUP BY source)
        SELECT t.source, count(*) AS n_candidates,
          coalesce(any_value(sel.n_selected), 0) AS n_selected,
          coalesce(any_value(sel.tok_selected), 0) AS tok_selected
        FROM tk t LEFT JOIN sel ON t.source = sel.source
        GROUP BY t.source ORDER BY t.source""")),

    // ---- sp06: temperature-flattened per-source subsampling ----
    // The multilingual/multi-source rebalancing trick (sampling exponent
    // α = 0.5): big sources are DOWN-sampled toward sqrt growth so small
    // sources keep representation — per-source target = min(n, ⌊2·√n⌋),
    // selection = the target-many lowest md5 ranks within the source
    // (deterministic; re-runs and both engines pick the same docs, verified
    // by the sum-of-selected-ids checksum). floor(2·sqrt(n)) is replay-safe
    // across engines: IEEE sqrt is correctly rounded and the ×2 is exact, so
    // there is no cross-engine last-ulp hazard (unlike a normalized
    // Σ n^α mixture, whose cross-source double sum is order-dependent).
    // Scale shape: per-source rank via the sp04/sp05 two-level formulation —
    // bucket counts (source × ≤256 rows, broadcast) + a parallel rank within
    // each (source, bucket); no window spans a source, targets relation is
    // one row per source.
    Q("sp06_temperature_sample",
      (s, d) => {
        val keyed = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            md5(concat(col("doc_id").cast("string"), lit(":tmp5"))).as("k"))
          .withColumn("bk", substring(col("k"), 1, 2))
        val wSrc = Window.partitionBy(col("source")).orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = keyed.groupBy(col("source"), col("bk"))
          .agg(count(lit(1)).as("bn"))
          .withColumn("boff", sum(col("bn")).over(wSrc) - col("bn"))
        val targets = offsets.groupBy(col("source"))
          .agg(sum(col("bn")).as("n_candidates"))
          .withColumn("n_target", least(col("n_candidates"),
            floor(lit(2.0) * sqrt(col("n_candidates"))).cast("long")))
        val wIn = Window.partitionBy(col("source"), col("bk")).orderBy(col("k"))
        val ranked = keyed
          .join(broadcast(offsets.select(col("source"), col("bk"), col("boff"))),
            Seq("source", "bk"))
          .withColumn("r", col("boff") + row_number().over(wIn))
        ranked.join(broadcast(targets), Seq("source"))
          .groupBy(col("source"), col("n_candidates"), col("n_target"))
          .agg(count(when(col("r") <= col("n_target"), 1)).as("n_selected"),
            coalesce(sum(when(col("r") <= col("n_target"), col("doc_id"))), lit(0L))
              .as("sum_sel_ids"))
          .orderBy(col("source"))
      },
      // one-level row_number in SQL — same total order (bk is a prefix of k)
      Some("""WITH tk AS (SELECT doc_id, source,
              md5(CAST(doc_id AS VARCHAR) || ':tmp5') AS k FROM documents),
          cnt AS (SELECT source, count(*) AS n_candidates FROM tk GROUP BY source),
          tgt AS (SELECT source, n_candidates,
                    least(n_candidates, CAST(floor(2.0 * sqrt(n_candidates)) AS BIGINT)) AS n_target
                  FROM cnt),
          rk AS (SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY k) AS r FROM tk)
        SELECT t.source, t.n_candidates, t.n_target,
          count(*) FILTER (WHERE r.r <= t.n_target) AS n_selected,
          CAST(coalesce(sum(r.doc_id) FILTER (WHERE r.r <= t.n_target), 0) AS BIGINT) AS sum_sel_ids
        FROM rk r JOIN tgt t USING (source)
        GROUP BY 1, 2, 3 ORDER BY 1""")),

    Q("sp04_shuffle_order",
      (s, d) => {
        val key = md5(concat(col("doc_id").cast("string"), lit(":42")))
        // single-partition by design over ≤65,536 bucket-summary rows (see
        // sp03 note on the WindowExec warning)
        val wBk = Window.orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wIn = Window.partitionBy(col("bk")).orderBy(col("k"))
        val keyed = t(s, d, "documents")
          .select(col("doc_id"), key.as("k"), substring(key, 1, 4).as("bk"))
        val offsets = keyed.groupBy(col("bk"))
          .agg(count(lit(1)).as("n"))
          .withColumn("off", sum(col("n")).over(wBk) - col("n"))
          .select(col("bk"), col("off"))
        keyed.join(broadcast(offsets), Seq("bk"))
          .select(col("doc_id"),
            (col("off") + row_number().over(wIn) - 1).cast("bigint").as("pos"))
          .orderBy(col("pos"))
      },
      Some("""SELECT doc_id,
          row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42')) - 1 AS pos
        FROM documents ORDER BY pos""")),

    // ---- sp07: per-source document cap via the native bounded top-k ----
    // The domain-cap heuristic (keep the best C docs per source, here "best"
    // = most whitespace tokens, ties to the lower doc_id).
    // graft.spark.TopKByLong partial-aggregates a C-element heap per source
    // on the map side, so the one shuffle carries ≤ C·sources·tasks heap
    // entries and nothing is ever sorted — see the TopKByLong scaladoc for
    // the measured comparison vs the window formulation. The oracle mirrors
    // the exact kept set with row_number.
    Q("sp07_source_cap",
      (s, d) => {
        val C = 10
        val kept = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"))
          .groupBy(col("source"))
          .agg(graft.spark.TopKAggregate.topkBy(col("tokens"), col("doc_id"), C).as("top"))
        kept.select(col("source"), posexplode(col("top")))
          .select(col("source"), (col("pos") + 1).cast("bigint").as("rank"),
            col("col.id").as("doc_id"), col("col.score").as("tokens"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
              len(string_split_regex(trim(text), '\s+')) AS tokens FROM documents),
          r AS (SELECT *, row_number() OVER (PARTITION BY source
                  ORDER BY tokens DESC, doc_id) AS rank FROM tk)
        SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
          CAST(tokens AS BIGINT) AS tokens
        FROM r WHERE rank <= 10 ORDER BY source, rank""")),

    // ---- sp08: deterministic fixed-size uniform sample ----
    // The eval-set carve-out: exactly N docs, uniform over the corpus,
    // reproducible across runs AND engines (lowest N md5 ranks — the
    // hash-rank trick sp04-sp06 use, here with a global cutoff). Plan:
    // TakeOrderedAndProject — each task keeps its own N, the driver merges
    // task heads; nothing global is sorted. N is a constant (an eval set
    // doesn't scale with the corpus), so the driver merge stays bounded at
    // any corpus size.
    Q("sp08_fixed_sample",
      (s, d) => {
        val N = 200
        t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            md5(concat(col("doc_id").cast("string"), lit(":fix9"))).as("k"))
          .orderBy(col("k")).limit(N)
          .orderBy(col("doc_id"))
      },
      Some("""WITH r AS (SELECT doc_id, source,
              md5(CAST(doc_id AS VARCHAR) || ':fix9') AS k
            FROM documents ORDER BY k LIMIT 200)
        SELECT doc_id, source, k FROM r ORDER BY doc_id""")),

    // ---- sp09: length-bucketed batching / padding-waste accounting ----
    // Batching docs of similar length cuts pad-token waste (padding to the
    // batch max); the standard scheme buckets by power-of-2 token length.
    // This is the accounting report: per bucket, docs, real tokens, and the
    // padding overhead if each doc pads to its bucket ceiling — the number
    // that justifies length-grouped batching to a training run. Map-only +
    // one partial agg. The bucket (smallest power of 2 >= tokens) is INTEGER
    // math — bit length of tokens-1, identical on both engines — because the
    // float form (2^ceil(log2 n)) computes log2 as a ln ratio whose last ulp
    // can land either side of an integer at exact powers of two, flipping
    // ceil per engine.
    Q("sp09_length_buckets",
      (s, d) => {
        val toks = size(split(trim(col("text")), "\\s+")).cast("bigint")
        // tokens >= 1 always: split of a non-empty trimmed string yields at
        // least one element
        val bucket = when(col("tokens") <= 1L, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(tokens - 1)))")) // Column numBits needs the SQL form
        t(s, d, "documents")
          .select(col("doc_id"), toks.as("tokens"))
          .withColumn("bucket", bucket)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tokens")).as("sum_tokens"),
            sum(col("bucket") - col("tokens")).as("pad_waste"))
          .orderBy(col("bucket"))
      },
      Some("""WITH tk AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\s+')) AS tokens
            FROM documents),
          b AS (SELECT doc_id, tokens,
                  CASE WHEN tokens <= 1 THEN 1
                       ELSE CAST(1 << length(bin(tokens - 1)) AS BIGINT)
                  END AS bucket FROM tk)
        SELECT bucket, count(*) AS n_docs,
          CAST(sum(tokens) AS BIGINT) AS sum_tokens,
          CAST(sum(bucket - tokens) AS BIGINT) AS pad_waste
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ---- sp10: UniMax-style budget waterfilling across sources ----
    // The data-mixture allocation step (UniMax, arXiv:2304.09151): spread a
    // total token budget B as uniformly as possible across sources, but cap
    // each source at E epochs of its own tokens. Waterfill closed form over
    // sources sorted by cap ascending: a source is "feasible" (fully granted
    // its cap) iff granting it and giving every LATER source the same amount
    // still fits B — feasibility is prefix-monotone under the cap ordering —
    // and the infeasible tail splits the leftover evenly (theta). Scale
    // shape: ONE partial-agg shuffle over the corpus to per-source token
    // counts; every window after that runs on the #sources-row summary
    // (thousands at most, never the corpus) — the sp03/tx09 bounded-summary
    // class. Cross-engine float determinism: caps/cumsums are computed in
    // DOUBLE in an engine-pinned order (ordered running sum), so both
    // engines see bit-identical doubles; the oracle casts its decimal
    // literals to DOUBLE explicitly (DuckDB would otherwise do DECIMAL
    // arithmetic).
    Q("sp10_unimax_budget",
      (s, d) => {
        val E = lit(1.1)          // epoch cap per source
        val bFrac = lit(0.8)      // budget = 0.8 * total tokens
        val counts = t(s, d, "documents")
          .groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("toks"))
        val unp = Window.partitionBy()
        val ord = Window.orderBy(col("cap"), col("lang"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val x = counts
          .withColumn("cap", E * col("toks"))
          .withColumn("k", count(lit(1)).over(unp))
          .withColumn("total", sum(col("toks")).over(unp))
          .withColumn("rn", row_number().over(Window.orderBy(col("cap"), col("lang"))))
          .withColumn("ccum", sum(col("cap")).over(ord))
        val budget = bFrac * col("total")
        val y = x
          .withColumn("feasible",
            (col("cap") * (col("k") - col("rn") + 1) + (col("ccum") - col("cap"))) <= budget)
          .withColumn("fcum", max(when(col("feasible"), col("ccum"))).over(unp))
          .withColumn("frn", max(when(col("feasible"), col("rn").cast("long"))).over(unp))
        // leftover split evenly across the infeasible tail; greatest(...,1)
        // guards the all-feasible case (theta is unused there)
        val theta = (budget - coalesce(col("fcum"), lit(0.0))) /
          greatest(col("k") - coalesce(col("frn"), lit(0L)), lit(1L))
        val alloc = when(col("feasible"), col("cap")).otherwise(theta)
        y.select(col("lang"), col("toks"), alloc.as("alloc"),
            (alloc / col("toks")).as("epochs"))
          .orderBy(col("lang"))
      },
      Some("""WITH counts AS (
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS toks
            FROM documents GROUP BY lang),
          x AS (
            SELECT lang, toks, CAST(1.1 AS DOUBLE) * toks AS cap,
              count(*) OVER () AS k,
              CAST(sum(toks) OVER () AS BIGINT) AS total,
              row_number() OVER (ORDER BY CAST(1.1 AS DOUBLE) * toks, lang) AS rn,
              sum(CAST(1.1 AS DOUBLE) * toks) OVER (ORDER BY CAST(1.1 AS DOUBLE) * toks, lang
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccum
            FROM counts),
          y AS (
            SELECT *,
              (cap * (k - rn + 1) + (ccum - cap)) <= CAST(0.8 AS DOUBLE) * total AS feasible
            FROM x),
          z AS (
            SELECT *,
              max(CASE WHEN feasible THEN ccum END) OVER () AS fcum,
              max(CASE WHEN feasible THEN rn END) OVER () AS frn
            FROM y),
          a AS (
            SELECT *,
              CASE WHEN feasible THEN cap
                   ELSE (CAST(0.8 AS DOUBLE) * total - COALESCE(fcum, 0.0)) /
                        greatest(k - COALESCE(frn, 0), 1) END AS alloc
            FROM z)
        SELECT lang, toks, alloc, alloc / toks AS epochs
        FROM a ORDER BY lang""")),

    // ---- sp11: curriculum interleave (length-tier round-robin order) ----
    // The curriculum/anti-clumping ordering a data loader wants: docs grouped
    // into length tiers (sp09's integer-exact power-of-2 bucket), shuffled
    // deterministically WITHIN each tier (md5 rank, the sp04 trick), then
    // emitted round-robin ACROSS tiers — position order is (round r, tier),
    // so consecutive batches always mix tiers instead of streaming one tier's
    // docs back-to-back. Short tiers simply drop out of later rounds.
    // Scale shape: two stacked two-level prefix sums. Per-tier rank r comes
    // from (tier × ≤256 hash-prefix buckets) offsets + parallel in-bucket
    // row_number (no window spans a tier). The global position then ranks
    // (r, tier): r determines its block monotonically, so partitioning by
    // rblk = (r-1)/RBlock keeps the lexicographic order intact — offsets over
    // the ≈parallelism-row rblk summary + parallel in-block row_number.
    // Early blocks hold rows from every live tier (later ones fewer), so
    // per-task work is ≤ RBlock·#tiers and the aggregate is balanced; no
    // window ever spans the corpus.
    Q("sp11_curriculum_interleave",
      (s, d) => {
        val docs = t(s, d, "documents")
        val rBlock = blockSizeFor(Tables.rowCount(s, d, "documents"), s.sparkContext.defaultParallelism)
        val toks = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val tier = when(col("tokens") <= 1L, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(tokens - 1)))"))
        val keyed = docs
          .select(col("doc_id"), toks.as("tokens"),
            md5(concat(col("doc_id").cast("string"), lit(":cur3"))).as("k"))
          .withColumn("tier", tier)
          .withColumn("bk", substring(col("k"), 1, 2))
        val wTier = Window.partitionBy(col("tier")).orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = keyed.groupBy(col("tier"), col("bk"))
          .agg(count(lit(1)).as("bn"))
          .withColumn("boff", sum(col("bn")).over(wTier) - col("bn"))
          .select(col("tier"), col("bk"), col("boff"))
        val wIn = Window.partitionBy(col("tier"), col("bk")).orderBy(col("k"))
        val ranked = keyed.join(broadcast(offsets), Seq("tier", "bk"))
          .select(col("doc_id"), col("tier"),
            (col("boff") + row_number().over(wIn)).as("r"))
          .withColumn("rblk", ((col("r") - 1) / rBlock).cast("bigint"))
        // the only sequential window: one row per rblk (≈ parallelism rows)
        val wR = Window.orderBy(col("rblk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off2 = ranked.groupBy(col("rblk"))
          .agg(count(lit(1)).as("n"))
          .withColumn("off", sum(col("n")).over(wR) - col("n"))
          .select(col("rblk"), col("off"))
        val wIn2 = Window.partitionBy(col("rblk")).orderBy(col("r"), col("tier"))
        ranked.join(broadcast(off2), Seq("rblk"))
          .select(col("doc_id"), col("tier"), col("r"),
            (col("off") + row_number().over(wIn2) - 1).as("pos"))
          .orderBy(col("pos"))
      },
      // one-level row_numbers in SQL — value-identical to the stacked
      // two-level engine form (offsets telescope both times; bk is a prefix
      // of k and rblk is monotone in r, so the total orders agree)
      Some("""WITH tk AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\s+')) AS tokens,
              md5(CAST(doc_id AS VARCHAR) || ':cur3') AS k
            FROM documents),
          b AS (SELECT doc_id, k,
                  CASE WHEN tokens <= 1 THEN 1
                       ELSE CAST(1 << length(bin(tokens - 1)) AS BIGINT)
                  END AS tier FROM tk),
          r AS (SELECT doc_id, tier,
                  row_number() OVER (PARTITION BY tier ORDER BY k) AS r FROM b)
        SELECT doc_id, tier, r,
          row_number() OVER (ORDER BY r, tier) - 1 AS pos
        FROM r ORDER BY pos""")),

    // ---- sp12: training-example packing with document boundary indexes ----
    // The pretraining data-prep step after sp03's shard assignment: each
    // 1024-token example carries its member docs IN ORDER plus the relative
    // token offset where each doc starts (what an attention-mask/position-id
    // builder consumes). Same greedy rule as sp03 (a doc belongs to the
    // example where its FIRST token lands, straddlers carry over), same
    // two-level prefix sum — the only sequential window runs over the block
    // summary. Reconstruction (sort + csv of offsets) happens INSIDE each
    // example group, bounded by docs-per-example, never a global sort.
    Q("sp12_pack_examples",
      (s, d) => {
        val Ex = 1024L
        val docs = t(s, d, "documents")
        val blockSize = blockSizeFor(Tables.rowCount(s, d, "documents"), s.sparkContext.defaultParallelism)
        val toks = docs
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"),
            (col("doc_id") / blockSize).cast("bigint").as("blk"))
        val wBlk = Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = toks.groupBy(col("blk"))
          .agg(sum(col("tokens")).as("blk_sum"))
          .withColumn("blk_off", sum(col("blk_sum")).over(wBlk) - col("blk_sum"))
          .select(col("blk"), col("blk_off"))
        val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        toks.join(broadcast(offsets), Seq("blk"))
          .withColumn("start", col("blk_off") + sum(col("tokens")).over(wIn) - col("tokens"))
          .withColumn("example_id", (col("start") / Ex).cast("bigint"))
          .withColumn("rel_off", col("start") - col("example_id") * Ex)
          .groupBy(col("example_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"),
            array_join(transform(
              sort_array(collect_list(struct(col("doc_id"), col("rel_off")))),
              e => e.getField("rel_off")), ",").as("boundaries_csv"))
          .orderBy(col("example_id"))
      },
      Some(s"""WITH toks AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\\s+')) AS tokens
            FROM documents),
          c AS (SELECT doc_id, tokens,
                  CAST(sum(tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS BIGINT) AS start
                FROM toks),
          a AS (SELECT doc_id, tokens, start // 1024 AS example_id,
                  start - (start // 1024) * 1024 AS rel_off
                FROM c)
        SELECT example_id, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS n_tokens,
          string_agg(rel_off, ',' ORDER BY doc_id) AS boundaries_csv
        FROM a GROUP BY example_id ORDER BY example_id""")),

    // ---- sp13: span-corruption masking statistics (T5-style denoising) ----
    // The objective-side counterpart of sp12's packing: deterministic
    // ~15% token masking in length-3 spans, reported per doc as
    // (n_tokens, n_masked, n_spans, mask_ratio) — what an infilling
    // pipeline audits before training (actual vs target corruption rate,
    // span fragmentation). Determinism: a token STARTS a span iff the
    // first md5 byte of "doc_id:i" is < 0x0D (13/256 ≈ 5.1% start rate —
    // ×3-token spans minus overlap lands the MASKED fraction at ~15%,
    // the T5 corruption target; compared LEXICALLY on the fixed-width
    // hex — identical in both engines);
    // a token is MASKED iff a span starts at i, i-1, or i-2 (overlapping
    // spans union); a span is COUNTED at each masked token whose
    // predecessor is unmasked (maximal runs). Scale shape: everything is
    // per-row array arithmetic over the token positions — a narrow map,
    // no explode, no shuffle before the output sort; the per-doc work is
    // O(tokens), the md5 the same per-position cost class as tx04's
    // rolling fingerprint.
    Q("sp13_span_corruption",
      (s, d) => {
        val docs = Tables.spread(t(s, d, "documents"))
        val toks = size(split(trim(col("text")), "\\s+"))
        val idx = sequence(lit(0), col("n") - 1)
        def startFlag(i: Column): Column =
          substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            i.cast("string"))), 1, 2) < "0d"
        docs
          .select(col("doc_id"), toks.as("n"))
          .withColumn("st", transform(idx, i => startFlag(i)))
          .withColumn("mk", transform(idx, i =>
            element_at(col("st"), i + 1) ||
              (i >= 1 && element_at(col("st"), i)) ||
              (i >= 2 && element_at(col("st"), i - 1))))
          .select(col("doc_id"), col("n").cast("bigint").as("n_tokens"),
            size(filter(col("mk"), x => x)).cast("bigint").as("n_masked"),
            size(filter(idx, i =>
              element_at(col("mk"), i + 1) &&
                !(i >= 1 && element_at(col("mk"), i)))).cast("bigint").as("n_spans"))
          .withColumn("mask_ratio",
            col("n_masked").cast("double") / col("n_tokens").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\s+')) AS n
            FROM documents),
          pos AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM t),
          st AS (SELECT doc_id, n, i,
                   substr(md5(doc_id || ':' || i), 1, 2) < '0d' AS s
                 FROM pos),
          mk AS (SELECT doc_id, n, i,
                   (s OR coalesce(lag(s, 1) OVER w, false)
                      OR coalesce(lag(s, 2) OVER w, false)) AS m
                 FROM st WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
          runs AS (SELECT doc_id, n, m,
                     (m AND NOT coalesce(lag(m, 1) OVER w2, false)) AS run_start
                   FROM mk WINDOW w2 AS (PARTITION BY doc_id ORDER BY i))
        SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
          CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
          CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(any_value(n) AS DOUBLE) AS mask_ratio
        FROM runs GROUP BY doc_id ORDER BY doc_id""")),

    // ---- sp14: DSIR-style importance resampling (hashed n-gram LLR) ----
    // Data Selection via Importance Resampling (Xie et al. 2023): score every
    // raw document by the log-likelihood ratio of a TARGET distribution vs
    // the RAW distribution over hashed token features, then keep the
    // top-ranked docs per source. Target here = the lang='en' slice (the
    // paper's target is any trusted high-quality corpus; the fixture's
    // English docs play that role). Features are tx05's vocabulary tokens
    // hashed into 256 buckets by md5-hex prefix — a STRING bucket key both
    // engines derive identically (dd02's md5 precedent), sidestepping any
    // cross-engine integer-hash mismatch. Laplace-smoothed bucket unigram
    // models: w[b] = ln((t_cnt+1)/(T+256)) - ln((r_cnt+1)/(R+256)); doc
    // score = sum of w over token OCCURRENCES. The score is a SUM of libm
    // logs, so unlike the tx01 raw-double cases it is NOT bit-identical
    // across engines (ulp-level log differences + engine-specific addition
    // order inside a group) — q01's pattern applies instead: round AFTER
    // the aggregation at a precision (6dp) far coarser than the ~1e-13
    // noise, and rank on the ROUNDED score so exact-duplicate docs tie
    // exactly and break on doc_id in both engines. Scale shape (100 TB):
    // the bucket model is ONE
    // partial-agg shuffle collapsing to 256 rows; totals are an agg over
    // those 256 rows re-attached as a one-row broadcast; scoring re-scans
    // the corpus map-only against the broadcast 256-row weight table; the
    // only other shuffles are the per-doc sum and the per-source top-20,
    // which runs through the bounded TopKByDouble heap (ss08/ss15's move:
    // a per-source row_number window would sort N/sources corpus rows per
    // task to keep 20; the heap carries <= 20 entries per source per map
    // slice — same (score desc, doc_id asc) cutoff, ties on the ROUNDED
    // score break on doc_id in both engines). Nothing is ever all-pairs
    // and no model state exceeds 256 rows.
    Q("sp14_dsir_resample",
      (s, d) => {
        val docs = t(s, d, "documents")
        // model + scorer pieces shared with the streaming twin (Dsir)
        val lw = Dsir.weights(Dsir.bucketCounts(docs))
        def toks = docs
          .select(col("doc_id"), col("source"), explode(TextOps.vocabTokens).as("token"))
          .select(col("doc_id"), col("source"), Dsir.bucketCol(col("token")).as("bkt"))
        toks.join(broadcast(lw), "bkt")
          .groupBy(col("doc_id"), col("source")).agg(round(sum(col("w")), 6).as("score"))
          .groupBy(col("source"))
          .agg(graft.spark.TopKAggregate.topkByDouble(col("score"), col("doc_id"), 20).as("top"))
          .select(col("source"), posexplode(col("top")).as(Seq("p", "e")))
          .select(col("e.id").as("doc_id"), col("source"), col("e.score").as("score"),
            (col("p") + 1).cast("int").as("rank"))
          .orderBy(col("source"), col("rank"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, source, lang, unnest(${TextOps.vocabTokensSql}) AS token
              FROM documents),
          tb AS (SELECT doc_id, source, lang, substr(md5(token), 1, 2) AS bkt FROM toks),
          b AS (SELECT bkt, count(*) AS r_cnt,
                  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt
                FROM tb GROUP BY bkt),
          tot AS (SELECT sum(r_cnt) AS r_tot, sum(t_cnt) AS t_tot FROM b),
          lw AS (SELECT bkt,
                   ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(t_tot + 256 AS DOUBLE))
                     - ln(CAST(r_cnt + 1 AS DOUBLE) / CAST(r_tot + 256 AS DOUBLE)) AS w
                 FROM b, tot),
          scores AS (SELECT doc_id, source, round(sum(w), 6) AS score
                     FROM tb JOIN lw USING (bkt) GROUP BY doc_id, source),
          ranked AS (SELECT doc_id, source, score,
                       row_number() OVER (PARTITION BY source
                         ORDER BY score DESC, doc_id) AS rank
                     FROM scores)
        SELECT doc_id, source, score, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 20 ORDER BY source, rank""")),

    // ---- sp15: CCNet-style perplexity-band selection ----
    // The LM-quality bucketing step of CCNet (Wenzek et al. 2020): score
    // every document with a reference LM and keep the MIDDLE band per
    // source — low perplexity is boilerplate/duplication, high perplexity
    // is noise; the middle is trainable prose. The LM is tx08's bigram
    // model, factored into ONE shared definition (TextOps.nllScores /
    // nllSqlCtes) so selector and audit cannot drift. The score is a mean
    // of libm logs — cross-engine non-bit-identical — so q01/sp14's
    // round-after-aggregate applies (6dp) BEFORE the thresholds; the band
    // bounds are percentile interpolations OVER those identical rounded
    // inputs, which are cross-engine exact at every knife edge (integral
    // positions return `lo` exactly — lo + (hi-lo)*0; fractional positions
    // are strictly inside (lo, hi) where no score can sit; tied neighbors
    // make the interpolation collapse to lo exactly), so the inclusive
    // band compare cannot flip. Scale shape: the model is tx08's (bounded
    // count joins); the selection adds one doc_id equi-join to attach
    // source, ONE exact percentile per source (per-group O(n) buffer —
    // at 100 TB pass `approx = true` to [[perplexityThresholds]] for the
    // bounded-memory approx_percentile sketch; PerplexityBandSpec pins its
    // |approx − exact| rank band), and a broadcast threshold attach.
    Q("sp15_perplexity_band",
      (s, d) => {
        val scored = perplexityScored(s, d)
        val qs = perplexityThresholds(scored)
        scored.join(broadcast(qs), "source")
          .select(col("doc_id"), col("source"), col("score"),
            (col("score") >= col("p25") && col("score") <= col("p75")).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${TextOps.nllSqlCtes},
          sc AS (SELECT d.doc_id, round(coalesce(s.nll, 0.0), 6) AS score
                 FROM d LEFT JOIN s USING (doc_id)),
          scs AS (SELECT sc.doc_id, doc.source, sc.score
                  FROM sc JOIN documents doc USING (doc_id)),
          qs AS (SELECT source, quantile_cont(score, 0.25) AS p25,
                   quantile_cont(score, 0.75) AS p75
                 FROM scs GROUP BY source)
        SELECT doc_id, scs.source, score,
          (score >= p25 AND score <= p75) AS keep
        FROM scs JOIN qs ON scs.source = qs.source ORDER BY doc_id""")),

    // ---- sp19: the 100 TB APPROX path of sp15, driver-gated ----
    // sp15's oracle checks only the exact-percentile path; the flag a real
    // 100 TB deployment flips (approx_percentile's bounded-memory sketch,
    // map-side partials, no per-group O(n) buffer) previously had only a
    // spec pin. This row RUNS the approx path and emits its rank-band
    // contract as bf03-style within_bound booleans: lt/le rank stats
    // against each approx threshold aggregate in one pass over the same
    // scored relation, and the band arithmetic ([[withinRankBand]]) is
    // the sketch's published ±1/accuracy guarantee — deterministic on
    // fixed data, so the oracle asserts per-source group sizes (the exact
    // SQL replay of the scored relation) plus literal TRUEs. A sketch
    // regression (wrong rank, lost partials in merge) flips a boolean and
    // hash-mismatches.
    Q("sp19_ppx_band_approx",
      (s, d) => {
        val scored = perplexityScored(s, d)
        val thr = perplexityThresholds(scored, approx = true)
        val (lt25, le25) = rankStats(col("score"), col("p25"))
        val (lt75, le75) = rankStats(col("score"), col("p75"))
        // scored stays persisted across its two consumers (threshold agg +
        // band join), the sp15 pattern; Verify/Bench clear cache per query
        scored.join(broadcast(thr), "source")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            lt25.as("lt25"), le25.as("le25"),
            lt75.as("lt75"), le75.as("le75"))
          .select(col("source"), col("n"),
            withinRankBand(0.25, col("lt25"), col("le25"), col("n")).as("wb_p25"),
            withinRankBand(0.75, col("lt75"), col("le75"), col("n")).as("wb_p75"))
          .orderBy(col("source"))
      },
      Some(s"""WITH ${TextOps.nllSqlCtes},
          sc AS (SELECT d.doc_id, round(coalesce(s.nll, 0.0), 6) AS score
                 FROM d LEFT JOIN s USING (doc_id)),
          scs AS (SELECT sc.doc_id, doc.source, sc.score
                  FROM sc JOIN documents doc USING (doc_id))
        SELECT source, count(*) AS n, TRUE AS wb_p25, TRUE AS wb_p75
        FROM scs GROUP BY source ORDER BY source"""))
  )
}
