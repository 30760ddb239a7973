package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Incremental maintenance of the stored IVFADC index — the composition
  * the round-12 system lacked: [[Ingest]] admits documents batch by batch
  * and [[Similarity]] serves ANN from a stored index, but admitted docs
  * only reached the index through a FULL rebuild (ss13's
  * corpus-fingerprint idempotence). This log lets every admission batch
  * land in the index as a committed APPEND slice, encoded against FROZEN
  * artifacts, so serving never re-encodes the corpus.
  *
  * Layout under `dir` — [[BatchLog]]'s committed-batch protocol with one
  * data store plus one-time artifacts:
  *
  *   artifacts/anchors/   (aid, av, an)       frozen at init
  *   artifacts/codebook/  (j, subs)           frozen at init; its
  *                        job-commit `_SUCCESS` (written LAST) is the
  *                        ARTIFACTS commit marker
  *   codes/batch_id=N/    (vec_id, aid, code) sorted by aid; its own
  *                        `_SUCCESS` is the batch commit marker
  *   compact/gen=G/codes/ the folded prefix re-clustered: PARTITIONED on
  *                        aid (ss13's bucket-directory layout, so probe
  *                        joins prune the compacted bulk at directory
  *                        level) and sub-split within buckets
  *   compact/gen=G/manifest  (up_to, committed_at_ms) — generation commit
  *
  * Why artifacts FREEZE at init (and what that trades): coarse anchors
  * and the PQ codebook define the meaning of every stored (aid, code)
  * row. Re-deriving them from the grown corpus would silently re-bucket /
  * re-quantize history — every past slice would be wrong without being
  * touched. Freezing makes appends pure per-vector map work and keeps
  * every slice valid forever; the cost is the standard drift trade (IVF
  * cell balance and quantization error degrade as the corpus outgrows the
  * init sample), paid off by periodic FULL re-trains (a new log dir from
  * current data — ss13's rebuild path, kept, not replaced). This is the
  * same frozen-artifact stance as the DSIR/perplexity gates
  * ([[graft.streaming.StreamingIngest]]): models train offline, serving
  * artifacts are immutable.
  *
  * 100 TB execution shape:
  *  - appendBatch is map-only over the batch (one-row broadcast anchors +
  *    codebook crossJoins feeding two fused codegen kernels —
  *    [[Similarity.ivfEncodeWith]]); no corpus read, no shuffle beyond
  *    the slice write's aid sort;
  *  - readers resolve ONE [[BatchLog.View]]: the aid-partitioned
  *    generation (directory-pruned by the probe list, exactly ss14's
  *    dynamic-pruning property) plus the small committed tail (scanned
  *    whole — recent slices are micro-batch-sized; [[compact]] keeps the
  *    tail short, the same argument as Ingest's 1,440-dirs-per-day note);
  *  - equality with a full rebuild holds BY CONSTRUCTION (same artifacts,
  *    same kernels, per-vector determinism) and is pinned end-to-end by
  *    IvfAppendSpec: codes, serve answers, and streamed per-batch probes
  *    all match the one-shot encode.
  */
object AnnIndex {

  private val CodesDdl = "vec_id BIGINT, aid BIGINT, code ARRAY<INT>"
  private val Stores = Seq("codes")

  private def adir(dir: String, store: String) = s"$dir/artifacts/$store"

  /** Artifacts are committed iff the codebook marker exists (anchors are
    * written first, so codebook `_SUCCESS` implies both). */
  def artifactsReady(s: SparkSession, dir: String): Boolean =
    BatchLog.fsOf(s, dir).exists(new Path(s"${adir(dir, "codebook")}/_SUCCESS"))

  /** Freeze the index artifacts from an initial corpus slice of `nInit`
    * rows: the systematic anchor sample and the stride-sampled PQ
    * codebook — the SAME derivations ss13 uses, over the init slice
    * instead of the whole table. Idempotent; a crashed attempt rewrites. */
  def ensureArtifacts(s: SparkSession, dir: String, initPv: DataFrame,
                      nInit: Long): Unit = {
    if (artifactsReady(s, dir)) return
    val v = initPv.select(col("vec_id"), col("vec"))
      .withColumn("nrm", sqrt(graft.spark.VectorExpressions.dot(col("vec"), col("vec"))))
    Similarity.ivfAnchorRowsOf(v, nInit)
      .write.mode(SaveMode.Overwrite).parquet(adir(dir, "anchors"))
    Similarity.pqCodebookRows(initPv, nInit)
      .write.mode(SaveMode.Overwrite)
      .parquet(adir(dir, "codebook")) // job-commit _SUCCESS = artifacts COMMIT
  }

  /** The frozen anchor rows (aid, av, an). */
  def anchors(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(adir(dir, "anchors"))

  /** The frozen codebook as the one-row broadcast aggregate the encode /
    * ADC kernels consume. */
  def codebookAgg(s: SparkSession, dir: String): DataFrame =
    broadcast(s.read.parquet(adir(dir, "codebook"))
      .agg(array_sort(collect_list(struct(col("j"), col("subs")))).as("cb")))

  def view(s: SparkSession, dir: String): BatchLog.View =
    BatchLog.view(s, dir, "codes")

  /** Encode one admission batch of (vec_id, vec, subs) rows against the
    * frozen artifacts and commit it as `codes/batch_id=N`. Idempotent per
    * batchId (committed → no-op; crashed → overwritten); map-only — no
    * corpus read, no stored-side join. Slices are SORTED on aid so the
    * tail keeps the row-group-pruning property the generation gets from
    * directory partitioning. */
  def appendBatch(s: SparkSession, dir: String, batchPv: DataFrame,
                  batchId: Long): Unit = {
    if (view(s, dir).isCommitted(batchId)) return
    val aAgg = Similarity.ivfAnchorAgg(anchors(s, dir))
    Similarity.ivfEncodeWith(batchPv, aAgg, codebookAgg(s, dir))
      .sortWithinPartitions(col("aid"))
      .write.mode(SaveMode.Overwrite)
      .parquet(BatchLog.bdir(dir, "codes", batchId)) // job-commit _SUCCESS = COMMIT
  }

  /** The view-resolved code relation (vec_id, aid, code). The generation
    * slice is an aid-PARTITIONED read (aid is its directory column — when
    * the tail is empty this is the plain ss14 scan shape, dynamic
    * partition pruning included); tail slices carry aid as a data column
    * and are unioned in (small by the compaction contract). */
  def codes(s: SparkSession, dir: String): DataFrame =
    codesOf(s, dir, view(s, dir))

  private def codesOf(s: SparkSession, dir: String, v: BatchLog.View): DataFrame = {
    val slices =
      v.gen.map(g => s.read.parquet(BatchLog.gdir(dir, g, "codes"))
        .select(col("vec_id"), col("aid").cast("bigint").as("aid"), col("code"))).toSeq ++
        (if (v.tail.isEmpty) Seq.empty[DataFrame]
         else Seq(s.read.parquet(v.tail.map(b => BatchLog.bdir(dir, "codes", b)): _*)))
    slices.reduceOption(_ unionByName _).getOrElse(
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(CodesDdl)))
  }

  /** Fold the contiguous committed prefix (+ previous generation) into a
    * new generation, re-clustered into ss13's aid-partitioned bucket
    * layout. Online-safe per the shared protocol ([[BatchLog]]): appends
    * keep committing meanwhile; a crash before the manifest leaves the
    * store as it was. */
  def compact(s: SparkSession, dir: String): Option[Long] =
    writeGenerationData(s, dir).map { case (gen, upTo) =>
      BatchLog.commitManifest(s, dir, gen, upTo)
      gen
    }

  /** The data half of [[compact]] — `private[graft]` so the crash-mid-
    * compaction spec can stop exactly at the crash point. */
  private[graft] def writeGenerationData(s: SparkSession, dir: String): Option[(Long, Long)] = {
    val v = view(s, dir)
    val prefix = BatchLog.foldablePrefix(dir, v)
    if (prefix.isEmpty) None
    else {
      val gen = v.gen.getOrElse(-1L) + 1
      codesOf(s, dir, v.copy(tail = prefix))
        .repartition(col("aid"),
          pmod(col("vec_id"), lit(Similarity.WriteSubSplit)))
        .write.mode(SaveMode.Overwrite).partitionBy("aid")
        .parquet(BatchLog.gdir(dir, gen, "codes"))
      Some((gen, prefix.last))
    }
  }

  /** Grace-guarded removal of superseded slices — [[BatchLog.vacuum]]. */
  def vacuum(s: SparkSession, dir: String,
             graceMs: Long = BatchLog.DefaultVacuumGraceMs): Boolean =
    BatchLog.vacuum(s, dir, Stores, graceMs)

  /** Serve a (q_id) relation from the log-backed index: the ss14 pipeline
    * with the code relation resolved through the view and the probe /
    * ADC stages running against the FROZEN artifacts (never re-derived —
    * they define what the stored codes mean). */
  def serveFromLog(s: SparkSession, d: String, dir: String,
                   qIds: DataFrame): DataFrame =
    Similarity.ivfAdcServeWith(s, d, codes(s, dir), qIds,
      anchors(s, dir), codebookAgg(s, dir))

  /** Mean recall@5 of this log's serve path against the exact arm over
    * the bounded harness query set — the ss18 measurement as one driver
    * scalar (one bounded aggregate; the harness is ≤ ~4096 queries by
    * construction at any corpus size). */
  def measuredRecall(s: SparkSession, d: String, dir: String): Double = {
    // one harness query set for BOTH arms — the bounded-query contract
    // lives in exactly one place
    val qIds = Similarity.recallQueryIds(s, d)
    Similarity.recallHarness(s, d, serveFromLog(s, d, dir, qIds), qIds)
      .agg(avg(col("recall_at_5"))).head().getDouble(0)
  }

  /** The measured-recall RETRAIN TRIGGER — closes the loop ss18 opens:
    * the harness MEASURES the frozen-artifact drift, this ACTS on it,
    * turning the "periodic full re-train" the freeze trade defers to
    * into a mechanical decision instead of an ops runbook. When the
    * log's measured recall falls below `minRecall`, a FRESH log is built
    * at `newDir` from the CURRENT corpus — new frozen artifacts + the
    * whole corpus as its batch 0, through the same append API, so the
    * new index is immediately incremental again (ss13's rebuild stance
    * expressed in the log's own vocabulary). Returns true iff the
    * retrain fired.
    *
    * The SERVING SWITCH is the caller's: a deployment flips its pointer
    * to `newDir` once this returns true and vacuums the old log after
    * the reader grace window — the BatchLog discipline. Rebuilding in
    * place is deliberately NOT offered: the old log's codes are only
    * meaningful against the old artifacts, so an in-place swap would
    * need an atomic artifacts+codes replacement the directory protocol
    * does not (and should not) promise. */
  def retrainIfBelow(s: SparkSession, d: String, dir: String, newDir: String,
                     minRecall: Double): Boolean = {
    val measured = measuredRecall(s, d, dir)
    if (measured >= minRecall) false
    else {
      val pv = Similarity.pqVecs(s, d)
      val n = Tables.rowCount(s, d, "embeddings")
      ensureArtifacts(s, newDir, pv, n)
      appendBatch(s, newDir, pv, 0L)
      true
    }
  }

  /** Record the pointer FLIP on the superseded log: called by the
    * deployment at the moment it switches serving to the retrained log
    * (NOT by [[retrainIfBelow]] — the serving switch is the caller's, per
    * its contract, so the retirement watermark must be stamped when the
    * switch actually happens, not when the rebuild finished). The marker
    * is the watermark [[retire]] measures its reader grace against. */
  def markRetired(s: SparkSession, dir: String): Unit = {
    val fs = BatchLog.fsOf(s, dir)
    // Stamp via temp-file + rename so a crash mid-write can never leave a
    // zero-length `_RETIRED` on the canonical path: a truncated marker
    // would make every later [[retire]] throw on readLong instead of
    // refusing, stranding the log un-retirable inside a vacuum loop.
    // Rename on the same filesystem is the one atomic primitive the
    // BatchLog protocol already relies on for its commit markers.
    val tmp = new Path(s"$dir/._RETIRED.tmp")
    val out = fs.create(tmp, true)
    try out.writeLong(System.currentTimeMillis()) finally out.close()
    val marker = new Path(s"$dir/_RETIRED")
    if (fs.exists(marker)) fs.delete(marker, false)
    fs.rename(tmp, marker)
  }

  /** Delete a RETIRED log wholesale after the reader grace window — the
    * cross-log analog of [[BatchLog.vacuum]]'s intra-log discipline:
    * flipping the serving pointer must not strand a reader that resolved
    * the old log's view just before the flip, so inside the window (or
    * with no [[markRetired]] marker at all) this is a refusing no-op that
    * returns false. Returns true iff the log was deleted. */
  def retire(s: SparkSession, dir: String,
             graceMs: Long = BatchLog.DefaultVacuumGraceMs): Boolean = {
    val fs = BatchLog.fsOf(s, dir)
    val marker = new Path(s"$dir/_RETIRED")
    if (!fs.exists(marker)) false
    else {
      // A short/unreadable marker (e.g. a pre-rename-era crash artifact)
      // reads as REFUSE, not throw: retirement is an optimization, and a
      // vacuum loop must never be wedged by one bad 8-byte file. The
      // operator re-stamps via [[markRetired]] to make it retirable.
      val flippedAt = try {
        val in = fs.open(marker)
        try in.readLong() finally in.close()
      } catch { case _: java.io.EOFException | _: java.io.IOException =>
        return false
      }
      if (System.currentTimeMillis() - flippedAt < graceMs) false
      else { fs.delete(new Path(dir), true); true }
    }
  }

  /** The ss16 registry lifecycle: a deterministic replay of the
    * incremental protocol over the driver's own corpus — artifacts frozen
    * from the FIRST HALF of the embeddings table (so the frozen-artifact
    * drift is visible to the oracle: ids >= n/2 are coded against a
    * sample they were never part of), the corpus appended in three
    * batches, a mid-sequence compaction + vacuum. Fingerprinted on the
    * corpus like ss13's index home; idempotent across reruns (appends
    * no-op on committed ids; a rerun's compact folds the tail — the CODE
    * CONTENT the row outputs is invariant, only gen ids advance). */
  private[ops] def ensureDriverLog(s: SparkSession, d: String): String = {
    val n = Tables.rowCount(s, d, "embeddings")
    val f = new java.io.File(s"$d/embeddings.parquet")
    val key = java.lang.Integer.toHexString(d.hashCode)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ivf_log/" +
      s"${key}_${n}_${f.length()}_${f.lastModified()}"
    val cut1 = n / 2        // dense ids by construction (ss04 note), so
    val cut2 = n - n / 4    // the id cuts are also the slice row counts
    val pv = Similarity.pqVecs(s, d)
    ensureArtifacts(s, dir, pv.filter(col("vec_id") < cut1), cut1)
    appendBatch(s, dir, pv.filter(col("vec_id") < cut1), 0L)
    appendBatch(s, dir,
      pv.filter(col("vec_id") >= cut1 && col("vec_id") < cut2), 1L)
    compact(s, dir)
    vacuum(s, dir, graceMs = 0L) // private tmp store: no concurrent readers
    appendBatch(s, dir, pv.filter(col("vec_id") >= cut2), 2L)
    dir
  }

  /** The ss19 registry lifecycle: a deterministic replay of the RETRAIN
    * TRIGGER over the driver's own corpus. The drifted log is ss16's
    * ([[ensureDriverLog]] — artifacts frozen on the first-half corpus);
    * `minRecall = 1.01` exceeds any achievable recall, so the decision
    * branch fires deterministically at every scale — the recall NUMBER is
    * ss18's row, this row gates the ACTION: fresh artifacts from the
    * CURRENT corpus plus the whole corpus as the new log's batch 0,
    * through the same measured-recall path a deployment's periodic check
    * runs. Idempotent across reruns: the trigger re-fires (the OLD log's
    * measured recall is a fixed fact of the fixture) and the new log's
    * ensureArtifacts/appendBatch both no-op on committed state. */
  private[ops] def ensureRetrainedLog(s: SparkSession, d: String): String = {
    val oldDir = ensureDriverLog(s, d)
    val newDir = s"${oldDir}_rt"
    val fired = retrainIfBelow(s, d, oldDir, newDir, minRecall = 1.01)
    require(fired, "retrain trigger must fire at minRecall > 1.0")
    newDir
  }
}
