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
  * well as local disk. Long-running streams compact by merging committed
  * directories during a maintenance window with the stream STOPPED (write
  * the merged dir + stats first, remove the old dirs after; a reader
  * between the two steps would double-count, which is why compaction is
  * offline — an online compactor would need a manifest indirection this
  * log deliberately avoids). NOTE: batchId↔offset pinning is the CALLER's
  * durable streaming checkpoint ([[graft.streaming.StreamingIngest]] takes
  * the checkpoint location for exactly this reason).
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
  *  - candidate work is banded and bucket-capped (dd04's argument): an
  *    over-hot STORED bucket stops producing cross-batch candidates rather
  *    than emitting batch×bucket pairs. The cap is one-sided — intra-batch
  *    pairs are uncapped — so batch-partition equality (the union of
  *    admissions over any split of a doc set equals the sequential replay)
  *    holds EXACTLY only while no stored bucket exceeds `bucketCap`; past
  *    the cap the engine admits MORE than the uncapped replay (suppressed
  *    candidates), the same bounded-state trade [[graft.streaming.StreamingNearDup]]
  *    documents for its bucketCap. Mass-duplicate streams should gate on
  *    exact dedup first, exactly like batch;
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
  private val MaxPushdownKeys = 100000

  private def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
  private def bdir(dir: String, store: String, batchId: Long) =
    s"$dir/$store/batch_id=$batchId"

  /** Batches whose stats commit marker (`stats/batch_id=N/_SUCCESS`)
    * exists, ascending. Hadoop-FS based: works on any scheme `dir` uses. */
  def committedBatches(s: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(s, dir)
    val root = new Path(s"$dir/stats")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .filter(b => fs.exists(new Path(s"${bdir(dir, "stats", b)}/_SUCCESS")))
      .sorted
  }

  /** Read a store's committed slices (schema-stable empty when none). */
  private def readCommitted(s: SparkSession, dir: String, store: String,
                            committed: Seq[Long], ddl: String): DataFrame =
    if (committed.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(ddl))
    else s.read.parquet(committed.map(b => bdir(dir, store, b)): _*)

  /** The union of all committed admitted slices. */
  def admitted(s: SparkSession, dir: String): DataFrame =
    readCommitted(s, dir, "admitted", committedBatches(s, dir),
      "doc_id BIGINT, source STRING, tokens BIGINT")

  /** The per-batch attrition log (one row per committed batch). */
  def stats(s: SparkSession, dir: String): DataFrame = {
    val committed = committedBatches(s, dir)
    committed.map { b =>
      s.read.parquet(bdir(dir, "stats", b)).withColumn("batch_id", lit(b))
    } match {
      case Nil => s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("n_raw BIGINT, n_quality BIGINT, n_lang BIGINT, " +
          "n_exact BIGINT, n_admitted BIGINT, batch_id BIGINT"))
      case xs => xs.reduce(_ unionByName _)
    }
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
  private def keySetUpTo(df: DataFrame, max: Int): Option[Array[Any]] = {
    val rows = df.distinct().limit(max + 1).collect()
    if (rows.length > max) None else Some(rows.map(_.get(0)))
  }
  private def keyFiltered(stored: DataFrame, keyCol: String,
                          keys: Option[Array[Any]]): DataFrame =
    keys.fold(stored)(ks =>
      stored.filter(col(keyCol).isin(ks.toIndexedSeq: _*)))

  /** Process one micro-batch of (doc_id, source, text) rows against the
    * store at `dir`. Idempotent per batchId: replaying a committed batch is
    * a no-op; replaying an uncommitted (crashed) batch overwrites its own
    * partial writes and then commits. */
  def ingestBatch(s: SparkSession, dir: String, batch: DataFrame, batchId: Long,
                  bucketCap: Long = BucketCap): Unit = {
    val committed = committedBatches(s, dir)
    if (committed.contains(batchId)) return // replayed committed batch

    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val flagged = flaggedBatch(batch)
      .persist() // read by: gate counts, fp probe list, band rows, admit set

    // ---- exact dedup: intra-batch keep-first (lowest doc_id per fp among
    // lang survivors), then anti-join the stored fingerprint log — read
    // pruned to the batch's own fp set when it fits the pushdown bound ----
    val langOk = flagged.filter(col("lang_ok"))
    val intra = langOk
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") === 1).drop("rn")
    val storedFps = keyFiltered(
      readCommitted(s, dir, "fp", committed, "fp STRING, doc_id BIGINT"),
      "fp", keySetUpTo(intra.select(col("fp")), MaxPushdownKeys))
    val exact = intra.join(storedFps.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .persist() // band rows + near-dup survivors + counts

    // ---- near-dup screen over the exact survivors ----
    val bandRows = exact.select(col("doc_id"), col("sig"),
        posexplode(Dedup.bandKeysCol(col("sig"))).as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("doc_id"), col("sig"))
      .persist() // stored-side probe keys + intra-batch self-join
    val storedBands = keyFiltered(
      readCommitted(s, dir, "bands", committed, "band INT, bkey BIGINT, doc_id BIGINT"),
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
      readCommitted(s, dir, "sigs", committed, "doc_id BIGINT, sig ARRAY<BIGINT>"),
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
    // EVERY agreeing banded pair (independent of other drops)
    val intraDrop = bandRows.as("x")
      .join(bandRows.as("y"),
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
}
