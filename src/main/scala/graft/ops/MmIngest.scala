package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming multimodal-curation admission — the micro-batch twin of the
  * mm10 batch capstone over a [[BatchLog]] committed-batch store: each
  * batch of (doc_id, source, text) media rows runs the SAME factored
  * stages ([[Multimodal.curationFlags]]: decode → frame/energy/shot
  * gates) → exact-pHash keep-first against the stored canonical vectors →
  * hamming-1 near-dup admission against the stored canonical BANDS, and
  * appends its canonical + admitted slices + per-source attrition stats.
  *
  * foreachBatch, not chained stateful operators, for [[Ingest]]'s exact
  * reasons: two keyed dedups by DIFFERENT keys (vk vs band bucket)
  * against state that must outlive the stream. Exactly-once across
  * crash-replays is the shared commit-marker protocol (stats written
  * last; replays overwrite their own batch directories).
  *
  * Equality with the batch capstone (spec-pinned in MmCurateStreamingSpec):
  * when docs arrive in doc_id order, the streamed admitted set and the
  * summed attrition stats equal batch mm10's nd_ok set and stage counts
  * exactly — the batch greedy rule drops the GREATER doc of every
  * hamming-1 canonical pair, which under id-ordered arrival is always the
  * later-arriving doc. Out-of-order streams degrade to first-arrival
  * greedy (the natural online rule), a divergence in WHICH near-dup
  * survives, never in dup-pair detection. Two deliberate, documented
  * divergences from the batch relation's census cap: the stored-side and
  * intra-batch caps here see canonical VECTORS (one doc per vk), while
  * batch mm10's census weighs duplicate docs — at equal cap the streamed
  * form suppresses strictly fewer buckets (more recall); and the cap
  * guards each probe independently rather than once globally. Both only
  * matter in pathological buckets past `bucketCap` (recall, not
  * correctness — [[Ingest.ingestBatch]]'s stance).
  *
  * Scale: the stored reads are key-pruned ([[Ingest.keyFiltered]] row-group
  * IN-filters under the pushdown bound), the near-dup probe is banded and
  * census-capped on both sides, canonical state is ~100 bytes/vector
  * independent of payload size, and nothing driver-side exceeds the
  * bounded key collect. The tail-batch directory list is the same
  * generation-foldable layout as [[Ingest]]'s, with the same [[compact]] /
  * [[vacuum]] pair over the shared [[BatchLog]] machinery (when to run
  * them is deployment policy, not correctness — readers are correct over
  * any committed view).
  */
object MmIngest {

  /** Default per-(band,bkey) bucket cap — mm06/mm08's census-cap role. */
  private val BucketCap = 4096L

  /** The data stores a batch (or generation) directory holds. */
  private val Stores = Seq("levels", "bands", "admitted", "stats")

  private val LevelsDdl = "vk STRING, doc_id BIGINT, levels ARRAY<BIGINT>"
  private val BandsDdl = "band INT, bkey BIGINT, doc_id BIGINT"
  private val AdmittedDdl = "doc_id BIGINT, source STRING, byte_len BIGINT"
  private val StatsDdl = (0 to 5).map(i => s"c$i BIGINT, b$i BIGINT")
    .mkString("source STRING, ", ", ", ", batch_id BIGINT")

  private def bdir(dir: String, store: String, batchId: Long) =
    BatchLog.bdir(dir, store, batchId)

  /** One consistent committed view (stats marker = the batch commit). */
  def storeView(s: SparkSession, dir: String): BatchLog.View =
    BatchLog.view(s, dir, "stats")

  private def readStore(s: SparkSession, dir: String, store: String,
                        view: BatchLog.View, ddl: String): DataFrame =
    BatchLog.readCommitted(s, dir, store, view, ddl)

  /** The stored canonical vectors (one doc per distinct vk). */
  def canonicals(s: SparkSession, dir: String): DataFrame =
    readStore(s, dir, "levels", storeView(s, dir), LevelsDdl)

  /** The union of all committed admitted slices. */
  def admitted(s: SparkSession, dir: String): DataFrame =
    readStore(s, dir, "admitted", storeView(s, dir), AdmittedDdl)

  /** Per-batch per-source stage counts, raw. */
  def stats(s: SparkSession, dir: String): DataFrame =
    readStore(s, dir, "stats", storeView(s, dir), StatsDdl)

  /** Cumulative per-source attrition in the batch capstone's exact output
    * shape (source, stage_ord, stage, n_docs, n_bytes): per-batch stage
    * counts sum because every stage is a per-doc flag except exact/near
    * dedup, whose per-batch counts are first-occurrence counts — each
    * canonical (and each admitted doc) is counted by exactly one batch. */
  def attrition(s: SparkSession, dir: String): DataFrame = {
    val aggs = (0 to 5).flatMap(i => Seq(
      sum(col(s"c$i")).as(s"c$i"), sum(col(s"b$i")).as(s"b$i")))
    val summed = stats(s, dir).groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    Multimodal.attritionRows(summed)
  }

  /** Process one micro-batch of (doc_id, source, text) media rows against
    * the store at `dir`. Idempotent per batchId ([[Ingest.ingestBatch]]'s
    * contract): a committed replay is a no-op; a crashed replay overwrites
    * its own partial writes and commits. */
  def curateBatch(s: SparkSession, dir: String, batch: DataFrame, batchId: Long,
                  bucketCap: Long = BucketCap): Unit = {
    val view = storeView(s, dir)
    if (view.isCommitted(batchId)) return // replayed committed batch

    // ---- the shared gate pass (batch mm10's exact stage columns) ----
    val flagged = Multimodal.curationFlags(
        batch.select(col("doc_id").cast("long").as("doc_id"),
          col("source"), col("text")))
      .persist() // read by: intra window, band rows, admit set, stats

    // ---- exact pHash dedup: intra-batch keep-first (lowest doc_id per vk
    // among gate survivors — the batch window's order restricted to the
    // sh_ok population it already implies), then anti-join the stored
    // canonical vks, read pruned to the batch's own vk set ----
    val wVk = Window.partitionBy(col("vk")).orderBy(col("doc_id"))
    val intra = flagged.filter(col("sh_ok"))
      .withColumn("rn", row_number().over(wVk))
      .filter(col("rn") === 1).drop("rn")
    val storedVks = Ingest.keyFiltered(
      readStore(s, dir, "levels", view, LevelsDdl),
      "vk", Ingest.keySetUpTo(intra.select(col("vk")), Ingest.MaxPushdownKeys))
    val exact = intra
      .join(storedVks.select(col("vk")).distinct(), Seq("vk"), "left_anti")
      .persist() // band rows + slices + counts

    // ---- near-dup admission over the new canonicals: probe the stored
    // canonical bands (injective packed keys — a key hit IS a slice
    // match), verify by exact level-Hamming == 1 ----
    val bandRows = exact.select(col("doc_id"), col("levels"),
        posexplode(Multimodal.phashBandsCol(col("levels"))).as(Seq("band", "bkey")))
      .persist() // stored-side probe keys + intra-batch self-join
    val storedBands = Ingest.keyFiltered(
      readStore(s, dir, "bands", view, BandsDdl),
      "bkey", Ingest.keySetUpTo(bandRows.select(col("bkey")), Ingest.MaxPushdownKeys))
      .withColumnRenamed("doc_id", "doc_c")
    val hot = storedBands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > bucketCap)
      .select(col("band"), col("bkey"))
    val candIds = bandRows
      .join(storedBands.join(hot, Seq("band", "bkey"), "left_anti"),
        Seq("band", "bkey"))
      .select(col("doc_id"), col("doc_c")).distinct()
      .persist()
    val storedLvs = Ingest.keyFiltered(
      readStore(s, dir, "levels", view, LevelsDdl),
      "doc_id", Ingest.keySetUpTo(candIds.select(col("doc_c")), Ingest.MaxPushdownKeys))
    def ham(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0L), (acc, v) => acc + v)
    val crossDrop = candIds
      .join(exact.select(col("doc_id"), col("levels")), Seq("doc_id"))
      .join(storedLvs.select(col("doc_id").as("doc_c"), col("levels").as("levels_c")),
        Seq("doc_c"))
      .filter(ham(col("levels"), col("levels_c")) === 1)
      .select(col("doc_id")).distinct()
    // intra-batch: distinct-vk canonical pairs in the SAME batch — drop
    // the greater doc of every hamming-1 pair (the batch greedy rule;
    // pairs are distinct vectors by construction, so hamming 0 is
    // impossible). Census cap mirrored on the self-join side.
    val hotIntra = bandRows.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > bucketCap)
      .select(col("band"), col("bkey"))
    val cold = bandRows.join(hotIntra, Seq("band", "bkey"), "left_anti")
    val intraDrop = cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("doc_id"),
        col("x.levels").as("la"), col("y.levels").as("lb")).distinct()
      .filter(ham(col("la"), col("lb")) === 1)
      .select(col("doc_id")).distinct()
    val admit = exact
      .join(crossDrop.withColumn("xd", lit(1)), Seq("doc_id"), "left")
      .join(intraDrop.withColumn("id2", lit(1)), Seq("doc_id"), "left")
      .filter(col("xd").isNull && col("id2").isNull)
      .persist() // admitted slice + the stats join

    // ---- append slices (overwrite = crash-replay idempotence): the
    // canonical levels + bands stores hold ALL exact survivors, admitted
    // or not — batch mm10's near-dup relation is over CANONICALS, so a
    // rejected canonical must still repel its later hamming-1 neighbors.
    // Stats (the commit marker) land LAST. ----
    exact.select(col("vk"), col("doc_id"), col("levels"))
      .sortWithinPartitions(col("vk"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "levels", batchId))
    bandRows.select(col("band"), col("bkey"), col("doc_id"))
      .sortWithinPartitions(col("bkey"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "bands", batchId))
    admit.select(col("doc_id"), col("source"), col("byte_len"))
      .write.mode(SaveMode.Overwrite).parquet(bdir(dir, "admitted", batchId))

    def bIf(c: Column) =
      coalesce(sum(when(c, col("byte_len")).otherwise(0L)), lit(0L))
    val statsRow = flagged
      .join(exact.select(col("doc_id")).withColumn("ex", lit(1)), Seq("doc_id"), "left")
      .join(admit.select(col("doc_id")).withColumn("ad", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("source")).agg(
        count(lit(1)).as("c0"), coalesce(sum(col("byte_len")), lit(0L)).as("b0"),
        count_if(col("dec_ok")).as("c1"), bIf(col("dec_ok")).as("b1"),
        count_if(col("en_ok")).as("c2"), bIf(col("en_ok")).as("b2"),
        count_if(col("sh_ok")).as("c3"), bIf(col("sh_ok")).as("b3"),
        count_if(col("ex") === 1).as("c4"), bIf(col("ex") === 1).as("b4"),
        count_if(col("ad") === 1).as("c5"), bIf(col("ad") === 1).as("b5"))
      .withColumn("batch_id", lit(batchId))
    statsRow.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(bdir(dir, "stats", batchId)) // job-commit _SUCCESS = COMMIT

    Seq(flagged, exact, bandRows, candIds, admit).foreach(_.unpersist(false))
  }

  /** Fold the contiguous committed batch tail into a new generation — the
    * shared [[BatchLog]] protocol ([[Ingest.compact]]'s anchoring and
    * gap rules verbatim; manifest commit LAST). Stats rows are carried
    * VERBATIM: they are per-batch deltas, so [[attrition]]'s sums are
    * invariant across any compaction point. The levels store range-sorts
    * on vk (the exact-dedup probe key); the doc_id-keyed near-dup read
    * keeps row-group IN-filters, just against a vk-ordered layout. */
  def compact(s: SparkSession, dir: String): Option[Long] = {
    val view = storeView(s, dir)
    val prefix = BatchLog.foldablePrefix(dir, view)
    if (prefix.isEmpty) None
    else {
      val folded = view.copy(tail = prefix)
      val gen = view.gen.getOrElse(-1L) + 1
      def rewrite(store: String, ddl: String, key: String): Unit =
        readStore(s, dir, store, folded, ddl)
          .repartitionByRange(col(key)).sortWithinPartitions(col(key))
          .write.mode(SaveMode.Overwrite).parquet(BatchLog.gdir(dir, gen, store))
      rewrite("levels", LevelsDdl, "vk")
      rewrite("bands", BandsDdl, "bkey")
      rewrite("admitted", AdmittedDdl, "doc_id")
      readStore(s, dir, "stats", folded, StatsDdl).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(BatchLog.gdir(dir, gen, "stats"))
      BatchLog.commitManifest(s, dir, gen, prefix.last)
      Some(gen)
    }
  }

  /** Remove batch directories the newest committed generation supersedes —
    * [[BatchLog.vacuum]]'s mechanically grace-guarded deletion (a no-op
    * refusal inside the grace window; see Ingest.vacuum's reader
    * rationale). Returns true iff superseded paths were deleted. */
  def vacuum(s: SparkSession, dir: String,
             graceMs: Long = BatchLog.DefaultVacuumGraceMs): Boolean =
    BatchLog.vacuum(s, dir, Stores, graceMs)
}
