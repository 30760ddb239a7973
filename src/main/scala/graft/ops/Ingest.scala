package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** Incremental corpus-ingest admission — the streaming twin of pp04's gate
  * stages, with DISK as the only state (the ss13/ss14 stored-index stance):
  *
  *   batch → quality gate → language gate → exact dedup (intra-batch
  *   keep-first + stored fingerprint log) → near-dup screen (intra-batch +
  *   stored band/signature log, StreamingNearDup's signature-agreement
  *   estimate) → admit + append the admitted docs' index entries
  *
  * This is the production daily/continuous corpus-build loop that the batch
  * registry proves piecewise (pp04 composition, dd07 incremental exact,
  * dd12 incremental near-dup, StreamingDedup/StreamingNearDup in-memory
  * horizons): here the corpus index OUTLIVES the stream — a restart loses
  * nothing, and a 100 TB corpus is never held in a state store.
  *
  * Store layout under `dir` — an append-only batch log with a commit marker:
  *
  *   fp/batch_id=N/        (fp, doc_id)            sorted by fp
  *   bands/batch_id=N/     (band, bkey, doc_id)    sorted by bkey
  *   sigs/batch_id=N/      (doc_id, sig)           sorted by doc_id
  *   admitted/batch_id=N/  (doc_id, source, tokens)
  *   stats/batch_id=N/     one attrition row — written LAST; its job-commit
  *                         `_SUCCESS` file IS the batch's commit marker
  *                         (directory existence alone is NOT commitment:
  *                         the output committer creates the directory at
  *                         job setup, before any data is durable)
  *
  * Exactly-once across restarts WITHOUT deletes: every reader lists only
  * COMMITTED batch directories (those whose stats `_SUCCESS` exists), so a
  * crashed attempt's partial writes — including a partial stats write — are
  * invisible, and the foreachBatch replay OVERWRITES the same `batch_id=N`
  * directories before committing. A replay of an already-committed batch is
  * a no-op (the guard in [[ingestBatch]]). All store I/O goes through the
  * Hadoop filesystem of `dir`'s scheme, so the log can live on HDFS/S3A as
  * well as local disk. NOTE: batchId↔offset pinning is the CALLER's
  * durable streaming checkpoint ([[graft.streaming.StreamingIngest]] takes
  * the checkpoint location for exactly this reason).
  *
  * ONLINE COMPACTION ([[compact]] / [[vacuum]]): a 24/7 stream at 1-minute
  * triggers accumulates ~1,440 batch directories per day, and every reader
  * lists + unions them. [[compact]] folds the contiguous committed batch
  * prefix (plus the previous generation, if any) into
  *
  *   compact/gen=G/{fp,bands,sigs,admitted,stats,manifest}
  *
  * re-clustered by each store's probe key, with the 1-row manifest
  * (`up_to` = highest folded batch id) written LAST — its job-commit
  * `_SUCCESS` is the GENERATION's commit marker, the same protocol as
  * batches. Readers resolve one [[StoreView]]: newest committed generation
  * + committed batch dirs with id > its `up_to` — the manifest indirection
  * that makes compaction safe UNDER LOAD: a crash mid-compaction leaves an
  * uncommitted gen dir no reader sees (the rerun overwrites it), ingest
  * keeps appending tail batches meanwhile, and a batch id the generation
  * covers stays committed forever (the replay guard consults the view, not
  * the directory listing). [[vacuum]] removes superseded batch dirs and
  * older generations AFTER a generation commits; run it with a grace
  * period so no reader that resolved its view before the commit still
  * holds the old paths.
  *
  * 100 TB execution shape (what each micro-batch costs):
  *  - ONE pass over the batch computes every gate input (tokens, quality,
  *    language, fingerprint, shingle hashes, MinHash signature — the SAME
  *    shared builders pp04 composes: [[TextOps.tokensCol]]/[[TextOps.exactFpCol]]
  *    /[[Dedup.bandKeysCol]]), pp04's single-scan discipline;
  *  - the stored-side reads are pruned at directory level to committed
  *    batch partitions, and — when the batch's key set is small enough to
  *    hold on the driver ([[MaxPushdownKeys]]) — additionally by the
  *    batch's own `fp IN` / `bkey IN` / `doc_id IN` sets pushed as parquet
  *    row-group filters over files sorted by exactly those keys at write
  *    time (the StreamingAnnProbe collect-the-probe-list pattern). Larger
  *    batches skip the collect: the joins below carry correctness either
  *    way, so an oversized batch costs a log scan, never a driver OOM or a
  *    codegen blowup from a million-literal In();
  *  - candidate work is banded and bucket-capped (dd04's argument) on BOTH
  *    sides with the same census rule: an over-hot STORED bucket stops
  *    producing cross-batch candidates, and an over-hot BATCH bucket (a
  *    template-heavy micro-batch) stops producing intra-batch pairs —
  *    neither side can go |bucket|². Past the cap the engine admits MORE
  *    than the uncapped replay (suppressed candidates), the same
  *    bounded-state trade [[graft.streaming.StreamingNearDup]] documents
  *    for its bucketCap. Mass-duplicate streams should gate on exact dedup
  *    first, exactly like batch. Equality caveats: per-batch admission
  *    matches the per-doc sequential replay exactly only while (a) no
  *    bucket exceeds `bucketCap` AND (b) no near-dup agreement CHAIN
  *    crosses a dropped doc — intra-batch pairs drop against peers that
  *    are themselves dropped (pp04's greedy rule), while the per-doc
  *    replay only ever checks ADMITTED stored docs, so with A0~A, A~B,
  *    A0!~B one batch admits {A0} where the replay admits {A0, B}.
  *    Admission is therefore a function of micro-batch boundaries in the
  *    presence of dup chains; IngestStreamingSpec's reference replays the
  *    same batch boundaries;
  *  - near-dup verification is the signature-agreement estimate over 64
  *    components — StreamingNearDup's documented streaming trade-off
  *    (exact shingle verification would re-read stored shingle sets; batch
  *    dd12 does exactly that in backfills).
  *
  * IngestStreamingSpec pins the sequential-replay equality (including the
  * capped-bucket suppression rule at a tiny cap), stream statelessness,
  * and crash-replay idempotence against an independent Scala reference.
  */
object Ingest {
  import graft.spark.SketchExpressions

  /** Gate thresholds — pp04's quality/langid stage values. */
  private val QualityMin = 0.5
  private val LangKeep = "en"

  /** Signature-agreement threshold (fraction of 64 components equal) — the
    * StreamingNearDup estimate with its default. */
  private val MinEst = 0.5

  /** Default for `bucketCap`: max stored docs per (band, bkey) bucket
    * consulted for candidates — dd04's BlockCap role. */
  private val BucketCap = 1024L

  /** Above this many distinct keys, a batch skips the driver-side collect
    * and the stored-log reads lose only their row-group IN-filters — the
    * semi/anti joins below are the correctness path either way. */
  private[ops] val MaxPushdownKeys = 100000

  /** The data stores a batch (or generation) directory holds. */
  private val Stores = Seq("fp", "bands", "sigs", "admitted", "stats")

  /** See [[BatchLog.DefaultVacuumGraceMs]] — the protocol (and its reader
    * grace rationale) is shared with every committed-batch-log store. */
  val DefaultVacuumGraceMs: Long = BatchLog.DefaultVacuumGraceMs

  private val StatsDdl = "n_raw BIGINT, n_quality BIGINT, n_lang BIGINT, " +
    "n_exact BIGINT, n_admitted BIGINT, batch_id BIGINT"

  private def bdir(dir: String, store: String, batchId: Long) =
    BatchLog.bdir(dir, store, batchId)
  private def gdir(dir: String, gen: Long, store: String) =
    BatchLog.gdir(dir, gen, store)

  /** Batches whose stats commit marker (`stats/batch_id=N/_SUCCESS`)
    * exists, ascending. Hadoop-FS based: works on any scheme `dir` uses. */
  def committedBatches(s: SparkSession, dir: String): Seq[Long] =
    BatchLog.committedBatches(s, dir, "stats")

  /** The newest committed generation, as (gen, up_to): committed =
    * `compact/gen=G/manifest/_SUCCESS` exists (the manifest is written
    * after every data store, so its job commit IS the generation commit). */
  def committedGeneration(s: SparkSession, dir: String): Option[(Long, Long)] =
    BatchLog.committedGeneration(s, dir)

  /** One consistent resolution of the store — [[BatchLog.View]]: the
    * newest committed generation (covering every batch id <= `upTo`) plus
    * the committed batch-dir tail beyond it; `upTo` is -1 when no
    * generation exists. */
  type StoreView = BatchLog.View
  val StoreView: BatchLog.View.type = BatchLog.View

  def storeView(s: SparkSession, dir: String): StoreView =
    BatchLog.view(s, dir, "stats")

  /** Read a store through a view — ONE multi-path parquet read over the
    * generation slice + tail batch dirs (schema-stable empty when none). */
  private def readCommitted(s: SparkSession, dir: String, store: String,
                            view: StoreView, ddl: String): DataFrame =
    BatchLog.readCommitted(s, dir, store, view, ddl)

  /** The union of all committed admitted slices. */
  def admitted(s: SparkSession, dir: String): DataFrame =
    readCommitted(s, dir, "admitted", storeView(s, dir),
      "doc_id BIGINT, source STRING, tokens BIGINT")

  /** The per-batch attrition log (one row per committed batch). The
    * generation slice stores `batch_id` as a written column; the tail is
    * ONE basePath-rooted read whose `batch_id=N` partition directories
    * supply the column — never an N-way union. */
  def stats(s: SparkSession, dir: String): DataFrame =
    statsOf(s, dir, storeView(s, dir))

  private def statsOf(s: SparkSession, dir: String, view: StoreView): DataFrame = {
    val slices =
      view.gen.map(g => s.read.parquet(gdir(dir, g, "stats"))).toSeq ++
        (if (view.tail.isEmpty) Seq.empty[DataFrame]
         else Seq(s.read.option("basePath", s"$dir/stats")
           .parquet(view.tail.map(b => bdir(dir, "stats", b)): _*)
           .withColumn("batch_id", col("batch_id").cast("long"))))
    slices.reduceOption(_ unionByName _).getOrElse(
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(StatsDdl)))
  }

  /** The ONE batch pass: every gate input of [[ingestBatch]] as columns —
    * the shared-builder discipline ([[TextOps.qualityCol]] /
    * [[TextOps.predLangCol]] / [[TextOps.tokensCol]] / [[TextOps.exactFpCol]],
    * the dd04 signature kernel), exposed so the spec's independent
    * reference consumes the SAME per-doc features the operator does while
    * re-implementing the admission logic itself. */
  private[graft] def flaggedBatch(batch: DataFrame): DataFrame =
    batch
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        TextOps.tokensCol.as("tokens"),
        TextOps.qualityCol.as("quality"), TextOps.predLangCol.as("pred_lang"),
        TextOps.exactFpCol.as("fp"),
        SketchExpressions.minhashSig(Dedup.shingleHashes(col("text")),
          Dedup.permA.toIndexedSeq, Dedup.permB.toIndexedSeq, Dedup.Mask).as("sig"))
      .withColumn("q_ok", col("quality") >= QualityMin)
      .withColumn("lang_ok", col("q_ok") && col("pred_lang") === LangKeep)

  /** The batch's distinct key set when it is small enough to push down
    * (collected via limit(max+1), so an oversized batch costs one bounded
    * collect, not a full materialization). */
  private[ops] def keySetUpTo(df: DataFrame, max: Int): Option[Array[Any]] = {
    val rows = df.distinct().limit(max + 1).collect()
    if (rows.length > max) None else Some(rows.map(_.get(0)))
  }
  private[ops] def keyFiltered(stored: DataFrame, keyCol: String,
                               keys: Option[Array[Any]]): DataFrame =
    keys.fold(stored)(ks =>
      stored.filter(col(keyCol).isin(ks.toIndexedSeq: _*)))

  /** A model-based admission gate composed between the language gate and
    * exact dedup — pp04's selector-stage slot in the online pipeline. The
    * gate receives the CURRENT survivor set as `(doc_id, source, text)`
    * and returns the doc_ids it keeps; each gate must be a pure per-doc
    * decision against FROZEN artifacts (a stored LM, a DSIR weight map) so
    * admission stays replay-deterministic. Constructors live with the
    * artifacts: [[graft.streaming.StreamingIngest.dsirGate]] /
    * [[graft.streaming.StreamingIngest.perplexityGate]]. */
  type ModelGate = DataFrame => DataFrame

  /** Process one micro-batch of (doc_id, source, text) rows against the
    * store at `dir`. Idempotent per batchId: replaying a committed batch is
    * a no-op; replaying an uncommitted (crashed) batch overwrites its own
    * partial writes and then commits. `modelGates` apply IN ORDER between
    * the language gate and exact dedup (the pp04 stage order: cheap
    * rule gates → model selectors → dedup); their attrition lands in the
    * n_lang → n_exact stats drop. */
  def ingestBatch(s: SparkSession, dir: String, batch: DataFrame, batchId: Long,
                  bucketCap: Long = BucketCap,
                  modelGates: Seq[ModelGate] = Seq.empty): Unit = {
    val view = storeView(s, dir)
    if (view.isCommitted(batchId)) return // replayed committed (or compacted) batch

    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val flagged = flaggedBatch(batch)
      .persist() // read by: gate counts, fp probe list, band rows, admit set

    // ---- model gates over the language survivors: each is a map-only (or
    // broadcast-join) scorer against frozen artifacts; the left-semi keeps
    // the flagged relation's columns flowing without re-deriving them ----
    val docsCols = batch.select(col("doc_id").cast("long").as("doc_id"),
      col("source"), col("text"))
    val langOk = modelGates.foldLeft(flagged.filter(col("lang_ok"))) { (cur, gate) =>
      cur.join(gate(docsCols.join(cur.select(col("doc_id")), Seq("doc_id")))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    }

    // ---- exact dedup: intra-batch keep-first (lowest doc_id per fp among
    // gate survivors), then anti-join the stored fingerprint log — read
    // pruned to the batch's own fp set when it fits the pushdown bound ----
    val intra = langOk
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1).drop("rn")
    val storedFps = keyFiltered(
      readCommitted(s, dir, "fp", view, "fp STRING, doc_id BIGINT"),
      "fp", keySetUpTo(intra.select(col("fp")), MaxPushdownKeys))
    val exact = intra.join(storedFps.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .persist() // band rows + near-dup survivors + counts

    // ---- near-dup screen over the exact survivors ----
    val bandRows = exact.select(col("doc_id"), col("sig"),
        posexplode(Dedup.bandKeysCol(col("sig"))).as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("doc_id"), col("sig"))
      .persist() // stored-side probe keys + intra-batch self-join
    val storedBands = keyFiltered(
      readCommitted(s, dir, "bands", view, "band INT, bkey BIGINT, doc_id BIGINT"),
      "bkey", keySetUpTo(bandRows.select(col("bkey")), MaxPushdownKeys))
      .withColumnRenamed("doc_id", "doc_c")
    // bucket census cap (dd04's BlockCap role) on the STORED side
    val hot = storedBands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > bucketCap)
      .select(col("band"), col("bkey"))
    val candIds = bandRows.join(storedBands.join(hot, Seq("band", "bkey"), "left_anti"),
        Seq("band", "bkey"))
      .select(col("doc_id"), col("doc_c")).distinct()
      .persist()
    val storedSigs = keyFiltered(
      readCommitted(s, dir, "sigs", view, "doc_id BIGINT, sig ARRAY<BIGINT>"),
      "doc_id", keySetUpTo(candIds.select(col("doc_c")), MaxPushdownKeys))
    // agreement estimate = fraction of equal components (StreamingNearDup)
    def est(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / Dedup.P
    val crossDrop = candIds
      .join(exact.select(col("doc_id"), col("sig")), Seq("doc_id"))
      .join(storedSigs.select(col("doc_id").as("doc_c"), col("sig").as("sig_c")),
        Seq("doc_c"))
      .filter(est(col("sig"), col("sig_c")) >= MinEst)
      .select(col("doc_id")).distinct()
    // intra-batch near-dup: pp04's greedy rule — drop the larger id of
    // EVERY agreeing banded pair (independent of other drops). The SAME
    // census cap as the stored side guards the self-join: a template-heavy
    // batch bucket (> bucketCap of its own docs) is suppressed entirely
    // rather than going |bucket|² — pairs sharing any COLD bucket still
    // verify, so only the pathological buckets lose recall
    val hotIntra = bandRows.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > bucketCap)
      .select(col("band"), col("bkey"))
    val coldBandRows = bandRows.join(hotIntra, Seq("band", "bkey"), "left_anti")
    val intraDrop = coldBandRows.as("x")
      .join(coldBandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("doc_id"),
        col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
      .filter(est(col("sa"), col("sb")) >= MinEst)
      .select(col("doc_id")).distinct()
    val admit = exact
      .join(crossDrop.withColumn("xd", lit(1)), Seq("doc_id"), "left")
      .join(intraDrop.withColumn("id2", lit(1)), Seq("doc_id"), "left")
      .filter(col("xd").isNull && col("id2").isNull)
      .persist() // admitted slice + its three index slices + the count

    // ---- append the admitted docs' index + output slices (overwrite =
    // crash-replay idempotence), then the stats commit marker LAST ----
    admit.select(col("fp"), col("doc_id")).sortWithinPartitions(col("fp"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "fp", batchId))
    bandRows.join(admit.select(col("doc_id")), Seq("doc_id"))
      .select(col("band"), col("bkey"), col("doc_id"))
      .sortWithinPartitions(col("bkey"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "bands", batchId))
    admit.select(col("doc_id"), col("sig")).sortWithinPartitions(col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "sigs", batchId))
    admit.select(col("doc_id"), col("source"), col("tokens"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "admitted", batchId))

    val statsRow = flagged.agg(
      count(lit(1)).as("n_raw"),
      count_if(col("q_ok")).as("n_quality"),
      count_if(col("lang_ok")).as("n_lang"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(admit.agg(count(lit(1)).as("n_admitted")))
    statsRow.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(bdir(dir, "stats", batchId)) // job-commit _SUCCESS = COMMIT

    Seq(flagged, exact, bandRows, candIds, admit).foreach(_.unpersist(false))
  }

  /** The admitted doc_ids of a COMMITTED batch, readable under replay even
    * after the slice was folded into a generation: a tail slice reads its
    * own `admitted/batch_id=N` directory; a compacted batch resolves
    * through the view's admitted relation semi-joined with the batch's own
    * candidate ids (doc_ids are globally unique under the store's
    * exactly-once contract, so the intersection IS that batch's admitted
    * set). Never RECOMPUTES admission — the store is the authority, so a
    * replay can never disagree with what was committed. */
  private[graft] def admittedIds(s: SparkSession, dir: String, batchId: Long,
                                 batchDocIds: DataFrame): DataFrame = {
    val view = storeView(s, dir)
    require(view.isCommitted(batchId),
      s"admittedIds($dir, batch $batchId): batch is not committed")
    if (view.tail.contains(batchId))
      s.read.parquet(bdir(dir, "admitted", batchId)).select(col("doc_id"))
    else
      readCommitted(s, dir, "admitted", view,
        "doc_id BIGINT, source STRING, tokens BIGINT")
        .select(col("doc_id"))
        .join(batchDocIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
  }

  /** One micro-batch through BOTH committed-batch logs — corpus admission
    * ([[ingestBatch]]) and the incremental ANN index ([[AnnIndex.appendBatch]])
    * — under the SAME batch id, so ingest and index share one exactly-once
    * discipline instead of running side by side.
    *
    * Cross-store commit ORDER: the ADMISSION commit (stats `_SUCCESS`)
    * lands first, the CODES commit second. Both stores are idempotent per
    * batch id, so a crash anywhere replays cleanly:
    *   - before the admission commit → both stores rerun (partial writes
    *     overwritten);
    *   - BETWEEN the two commits → admission no-ops (committed) and the
    *     index append re-derives the admitted set FROM THE STORE
    *     ([[admittedIds]] — never a recomputation of admission, so the two
    *     stores cannot disagree on membership across replays) and commits;
    *   - after both → both no-op.
    *
    * `batch` must carry (doc_id, source, text, embedding): embeddings ride
    * the stream's own payload (map-only), while the index ARTIFACTS are
    * frozen at init ([[AnnIndex.ensureArtifacts]], required before the
    * first batch — refusing loudly beats silently training per-batch
    * artifacts that would re-bucket every earlier slice). */
  def ingestAndIndexBatch(s: SparkSession, corpusDir: String, indexDir: String,
                          batch: DataFrame, batchId: Long,
                          bucketCap: Long = BucketCap,
                          modelGates: Seq[ModelGate] = Seq.empty): Unit = {
    require(AnnIndex.artifactsReady(s, indexDir),
      s"AnnIndex artifacts at $indexDir are not committed — freeze them from " +
        "an init corpus (AnnIndex.ensureArtifacts) before streaming ingest")
    ingestBatch(s, corpusDir, batch, batchId, bucketCap, modelGates)
    if (!AnnIndex.view(s, indexDir).isCommitted(batchId)) {
      val ids = admittedIds(s, corpusDir, batchId,
        batch.select(col("doc_id").cast("long").as("doc_id")))
      val pv0 = Similarity.pqVecsOf(batch.select(
          col("doc_id").cast("long").as("vec_id"), col("embedding")))
        .join(ids.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      // Replay-after-compaction guard: once this batch's admitted slice
      // was folded, [[admittedIds]] ATTRIBUTES by candidate-set
      // intersection — if an at-least-once source ever delivered a doc_id
      // in two batches (rejected here, admitted later), a delayed replay
      // of the crash-between-commits window would re-append the OTHER
      // batch's doc under this batch id, silently duplicating its vec_id.
      // Anti-joining against vec_ids already indexed closes that: the
      // index itself is the authority on what it holds. Costs one
      // column-pruned scan of the index's vec_id column, and ONLY on the
      // compacted-fallback path — the normal tail-batch replay (and every
      // first-time append) skips it.
      //
      // REMAINING WINDOW (accepted, at-least-once payload provenance): if
      // BOTH the rejecting and the admitting delivery of the same doc_id
      // crashed between their corpus and index commits AND both were then
      // compacted, an out-of-order replay of the REJECTING batch reaches
      // this fallback first and indexes the doc using that delivery's
      // embedding payload under that batch id. Membership and vec_id
      // uniqueness stay correct (the anti-join still holds); only WHICH
      // delivery's bytes were encoded can differ, and only when an
      // at-least-once source redelivers a doc_id with different payloads.
      // Sources with deterministic payloads (ours) are unaffected; a
      // deployment where redelivery payloads drift should additionally
      // restrict compacted-fallback attribution to doc_ids whose admitted
      // slice predates this batch's candidate set.
      val pv =
        if (storeView(s, corpusDir).tail.contains(batchId)) pv0
        else pv0.join(AnnIndex.codes(s, indexDir).select(col("vec_id")),
          Seq("vec_id"), "left_anti")
      AnnIndex.appendBatch(s, indexDir, pv, batchId)
    }
  }

  /** Fold the contiguous committed batch prefix — and the previous
    * committed generation, if any — into a new generation `compact/gen=G`,
    * re-clustered by each store's probe key (`repartitionByRange` +
    * `sortWithinPartitions`, so the merged files keep the row-group
    * IN-filter property the per-batch writes had). ONLINE-safe: ingest may
    * keep committing tail batches while this runs; readers switch to the
    * generation atomically when its manifest `_SUCCESS` lands, and a crash
    * before that point leaves the store exactly as it was (the rerun
    * overwrites the partial gen dirs). Only the CONTIGUOUS prefix folds:
    * `StoreView.isCommitted` treats every id <= `up_to` as committed, so a
    * gap in the committed ids must stay in the tail. Returns the new
    * generation id, or None when there is nothing new to fold. */
  def compact(s: SparkSession, dir: String): Option[Long] =
    writeGenerationData(s, dir).map { case (gen, upTo) =>
      BatchLog.commitManifest(s, dir, gen, upTo)
      gen
    }

  /** The data half of [[compact]]: writes every store of the target
    * generation but NOT the manifest — `private[graft]` so the
    * crash-mid-compaction spec can stop exactly at the crash point. */
  private[graft] def writeGenerationData(s: SparkSession, dir: String): Option[(Long, Long)] = {
    val view = storeView(s, dir)
    // anchoring (first fold at the smallest committed id; later gaps block
    // the fold) is the shared protocol's rule — see BatchLog.foldablePrefix
    val prefix = BatchLog.foldablePrefix(dir, view)
    if (prefix.isEmpty) None
    else {
      val folded = view.copy(tail = prefix)
      val gen = view.gen.getOrElse(-1L) + 1
      def rewrite(store: String, ddl: String, key: String): Unit =
        readCommitted(s, dir, store, folded, ddl)
          .repartitionByRange(col(key)).sortWithinPartitions(col(key))
          .write.mode(SaveMode.Overwrite).parquet(gdir(dir, gen, store))
      rewrite("fp", "fp STRING, doc_id BIGINT", "fp")
      rewrite("bands", "band INT, bkey BIGINT, doc_id BIGINT", "bkey")
      rewrite("sigs", "doc_id BIGINT, sig ARRAY<BIGINT>", "doc_id")
      readCommitted(s, dir, "admitted", folded,
        "doc_id BIGINT, source STRING, tokens BIGINT")
        .write.mode(SaveMode.Overwrite).parquet(gdir(dir, gen, "admitted"))
      statsOf(s, dir, folded).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(gdir(dir, gen, "stats"))
      Some((gen, prefix.last))
    }
  }

  /** Remove batch directories the newest committed generation supersedes
    * (id <= its `up_to`) and generations older than it — MECHANICALLY
    * grace-guarded: deletion only happens when the newest generation
    * committed at least `graceMs` ago (its manifest `committed_at_ms`
    * watermark; pre-watermark generations fall back to the manifest
    * `_SUCCESS` modification time). Inside the grace window the call is a
    * no-op that returns false, so the naive `compact(); vacuum()` pattern
    * cannot strand a reader that resolved its [[StoreView]] just before
    * the generation commit (the standard vacuum caveat of
    * manifest-indirected logs, now a refusal instead of a doc comment).
    * Returns true iff the superseded paths were deleted. */
  def vacuum(s: SparkSession, dir: String,
             graceMs: Long = DefaultVacuumGraceMs): Boolean =
    BatchLog.vacuum(s, dir, Stores, graceMs)
}
