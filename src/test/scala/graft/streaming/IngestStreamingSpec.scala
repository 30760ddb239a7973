package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ingest

/** Streaming corpus-ingest admission (StreamingIngest / ops.Ingest) — the
  * streaming twin of pp04's gate stages over a disk store.
  *
  * Pins:
  *  (1) a doc set split across three micro-batches produces EXACTLY the
  *      admitted set + per-batch attrition rows of an independent
  *      sequential Scala reference implementing the same admission rules
  *      (gates → intra keep-first → stored-fp anti → banded signature-
  *      agreement near-dup, cross then intra greedy);
  *  (2) the stream side is STATELESS — the disk log is the only state;
  *  (3) crash-replay: partial writes of an uncommitted batch are invisible
  *      to readers and are overwritten when the batch replays; replaying a
  *      COMMITTED batch is a no-op (the commit-marker protocol).
  */
class IngestStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- fixture texts: each gate exercised deterministically ----

  /** Passes quality (stopword-rich, unpunctuated) and langid (en). */
  private def enDoc(body: String): String =
    "the quick fox and a dog of the farm to the river " + body

  /** 40 shared body words: two enDocs sharing it are banded near-dups
    * (trigram Jaccard ~0.9 ⇒ signature agreement well above 0.5). */
  private def sharedBody(tag: String): String =
    (0 until 40).map(i => s"b$tag$i").mkString(" ")

  /** Unique body: distinct docs stay below the agreement threshold. */
  private def ownBody(id: Long): String =
    (0 until 40).map(i => s"u${id}x$i").mkString(" ")

  /** Fails the quality gate: punctuation-heavy, stopword-free. */
  private val badQuality = "x1,,,??!!;; x2!!! x3??? x4;;;;"

  /** Passes quality (of/to are stopwords but NOT en markers) yet scores
    * es on langid — isolates the language gate from the quality gate. */
  private val esDoc =
    "of to of to of to of to el la y el la y el la y gato perro casa rio"

  // (doc_id, source, text) batches:
  //   b0: 1 good, 2 bad-quality, 3 non-en, 4+5 exact dups (keep 4),
  //       6 near-dup of 1 (drop 6)
  //   b1: 7 exact dup of 4 (cross-batch drop), 8 near-dup of 1
  //       (cross-batch drop), 9 good
  //   b2: 10 near-dup of 9 (cross-batch drop), 11 good, 12 bad-quality
  private val b0: Seq[(Long, String, String)] = Seq(
    (1L, "web", enDoc(sharedBody("A") + " one")),
    (2L, "web", badQuality),
    (3L, "web", esDoc),
    (4L, "web", enDoc(ownBody(4))),
    (5L, "web", enDoc(ownBody(4))), // byte-identical to 4
    (6L, "web", enDoc(sharedBody("A") + " six")))
  private val b1: Seq[(Long, String, String)] = Seq(
    (7L, "web", enDoc(ownBody(4))), // exact dup of committed 4
    (8L, "news", enDoc(sharedBody("A") + " eight")),
    (9L, "news", enDoc(sharedBody("B") + " nine")))
  private val b2: Seq[(Long, String, String)] = Seq(
    (10L, "web", enDoc(sharedBody("B") + " ten")),
    (11L, "web", enDoc(ownBody(11))),
    (12L, "web", badQuality))
  private val batches = Seq(b0, b1, b2)

  // ---- the independent sequential reference ----

  private case class Doc(id: Long, source: String, tokens: Long, qOk: Boolean,
                         langOk: Boolean, fp: String, sig: Seq[Long],
                         bands: Seq[(Int, Long)])
  private case class StatsRow(batchId: Long, nRaw: Long, nQuality: Long,
                              nLang: Long, nExact: Long, nAdmitted: Long)

  /** Per-doc features via the operator's own (oracle-pinned) builders; band
    * keys via StreamingNearDup's public banding of the same signature. */
  private def features(rows: Seq[(Long, String, String)]): Seq[Doc] = {
    val sp = spark
    import sp.implicits._
    val df = rows.toDF("doc_id", "source", "text")
    val flags = Ingest.flaggedBatch(df).collect().map { r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(7),
        r.getBoolean(8), r.getString(5),
        r.getSeq[Long](6).toSeq)
    }.toMap
    val sigDs = flags.toSeq.map { case (id, (_, _, _, _, _, sig)) =>
      StreamingNearDup.DocSig(id, 0L, sig)
    }.toDS()
    val bandMap = StreamingNearDup.bandRows(sigDs).collect()
      .groupBy(_.doc_id)
      .map { case (id, bs) => id -> bs.map(b => (b.band, b.bkey)).toSeq }
    rows.map { case (id, _, _) =>
      val (src, tok, q, l, fp, sig) = flags(id)
      Doc(id, src, tok, q, l, fp, sig, bandMap(id))
    }
  }

  private def est(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / graft.ops.Dedup.P

  /** Sequential replay of the admission rules over the batch sequence.
    * `bucketCap` mirrors the engine's two-sided census cap: a STORED
    * bucket holding more than cap docs produces no cross-batch candidates
    * at all (the whole bucket is suppressed, not truncated), and a BATCH
    * bucket holding more than cap of the batch's own exact-survivors
    * produces no intra-batch pairs — pairs sharing any cold bucket still
    * verify. */
  private def runRef(bs: Seq[Seq[(Long, String, String)]], bucketCap: Long = 1024L,
                     modelKeep: Long => Boolean = _ => true)
      : (Set[(Long, String, Long)], Seq[StatsRow]) = {
    var fps = Set.empty[String]
    var bandIx = Map.empty[(Int, Long), Vector[Long]]
    var sigs = Map.empty[Long, Seq[Long]]
    val admitted = Set.newBuilder[(Long, String, Long)]
    val stats = Seq.newBuilder[StatsRow]
    bs.zipWithIndex.foreach { case (rows, bi) =>
      val docs = features(rows)
      val q = docs.filter(_.qOk)
      val lang = docs.filter(_.langOk)
      // model gates (DSIR threshold / perplexity band) sit between the
      // language gate and exact dedup — pure per-doc frozen-artifact calls
      val gated = lang.filter(d => modelKeep(d.id))
      // intra-batch keep-first: lowest doc_id per fingerprint
      val intra = gated.groupBy(_.fp).values.map(_.minBy(_.id)).toSeq.sortBy(_.id)
      val exact = intra.filterNot(d => fps.contains(d.fp))
      // cross near-dup: agreement >= 0.5 with any stored doc sharing a
      // NON-HOT band bucket (bucket size > cap -> suppressed entirely)
      val crossDrop = exact.filter { d =>
        d.bands.exists { bk =>
          val bucket = bandIx.getOrElse(bk, Vector.empty)
          bucket.size <= bucketCap &&
            bucket.exists(cid => est(d.sig, sigs(cid)) >= 0.5)
        }
      }.map(_.id).toSet
      // intra near-dup: greedy — drop the LARGER id of every pair agreeing
      // through at least one NON-HOT batch bucket
      val intraCnt = exact.flatMap(_.bands).groupBy(identity)
        .map { case (bk, xs) => bk -> xs.size.toLong }
      val intraDrop = (for {
        a <- exact; b <- exact
        if a.id < b.id &&
          a.bands.toSet.intersect(b.bands.toSet)
            .exists(bk => intraCnt(bk) <= bucketCap) &&
          est(a.sig, b.sig) >= 0.5
      } yield b.id).toSet
      val admit = exact.filterNot(d => crossDrop(d.id) || intraDrop(d.id))
      admit.foreach { d =>
        fps += d.fp
        d.bands.foreach(bk => bandIx = bandIx.updated(bk, bandIx.getOrElse(bk, Vector.empty) :+ d.id))
        sigs += (d.id -> d.sig)
        admitted += ((d.id, d.source, d.tokens))
      }
      stats += StatsRow(bi.toLong, docs.size.toLong, q.size.toLong,
        lang.size.toLong, exact.size.toLong, admit.size.toLong)
    }
    (admitted.result(), stats.result())
  }

  private def storeAdmitted(dir: String): Set[(Long, String, Long)] =
    Ingest.admitted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def storeStats(dir: String): Seq[StatsRow] =
    Ingest.stats(spark, dir).collect().map(r =>
      StatsRow(r.getAs[Long]("batch_id"), r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_quality"), r.getAs[Long]("n_lang"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_admitted")))
      .sortBy(_.batchId)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag").toString

  test("three micro-batches equal the sequential reference; stream side is stateless") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = tmpDir("stream")
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir)
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }

      val (refAdmitted, refStats) = runRef(batches)
      // the fixture must exercise every stage or the equality is vacuous
      assert(refStats.map(_.nRaw).sum > refStats.map(_.nQuality).sum, "quality gate inert")
      assert(refStats.map(_.nQuality).sum > refStats.map(_.nLang).sum, "lang gate inert")
      assert(refStats.map(_.nLang).sum > refStats.map(_.nExact).sum, "exact dedup inert")
      assert(refStats.map(_.nExact).sum > refStats.map(_.nAdmitted).sum, "near-dup inert")
      assert(refAdmitted.map(_._1) == Set(1L, 4L, 9L, 11L), refAdmitted.toString)

      assert(storeAdmitted(dir) == refAdmitted,
        s"admitted diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refAdmitted")
      assert(storeStats(dir) == refStats,
        s"stats diverge:\n  store=${storeStats(dir)}\n  ref=$refStats")

      // stateless: no state-store operators ran on the stream side
      val progress = query.lastProgress
      assert(progress != null && progress.stateOperators.isEmpty,
        s"expected stateless stream, got ${progress.stateOperators.length} state operators")
    } finally query.stop()
  }

  test("crash replay: uncommitted partial writes are invisible and overwritten; committed batches no-op") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("replay")
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text")

    Ingest.ingestBatch(spark, dir, df(b0), 0L)
    Ingest.ingestBatch(spark, dir, df(b1), 1L)

    // simulate a crash mid-batch-2: partial garbage in fp/ and admitted/,
    // plus a stats DIRECTORY with data but no _SUCCESS job-commit marker —
    // the committer creates the directory before anything is durable, so
    // directory existence must NOT count as commitment
    Seq(("zzzz-bogus-fp", 999L)).toDF("fp", "doc_id")
      .write.parquet(s"$dir/fp/batch_id=2")
    Seq((999L, "bogus", 1L)).toDF("doc_id", "source", "tokens")
      .write.parquet(s"$dir/admitted/batch_id=2")
    Seq((1L, 1L, 1L, 1L, 1L)).toDF("n_raw", "n_quality", "n_lang", "n_exact", "n_admitted")
      .write.parquet(s"$dir/stats/batch_id=2")
    new java.io.File(s"$dir/stats/batch_id=2/_SUCCESS").delete()

    // uncommitted garbage is invisible to every reader
    assert(Ingest.committedBatches(spark, dir) == Seq(0L, 1L))
    assert(!storeAdmitted(dir).exists(_._1 == 999L), "uncommitted write leaked")
    assert(storeStats(dir).map(_.batchId) == Seq(0L, 1L), "markerless stats dir leaked")

    // the replayed batch overwrites its own partial writes and commits
    Ingest.ingestBatch(spark, dir, df(b2), 2L)
    val (refAdmitted, refStats) = runRef(batches)
    assert(storeAdmitted(dir) == refAdmitted, "post-replay state diverges from clean run")
    assert(storeStats(dir) == refStats)
    assert(!spark.read.parquet(s"$dir/fp/batch_id=2").collect()
      .exists(_.getString(0) == "zzzz-bogus-fp"), "partial write survived the replay")

    // replaying a COMMITTED batch is a no-op
    Ingest.ingestBatch(spark, dir, df(b2), 2L)
    assert(storeAdmitted(dir) == refAdmitted)
    assert(storeStats(dir) == refStats)
  }

  test("hot buckets suppress candidates on BOTH sides (census cap), reference agrees") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("cap")
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text")

    // bucketCap = 0: EVERY non-empty bucket is hot on both sides, so the
    // near-dup screen is fully suppressed — doc 8 (near-dup of committed
    // doc 1) AND doc 6 (intra-batch near-dup of doc 1) are ADMITTED —
    // while exact dedup (a different key, uncapped) still drops 5/7 and
    // the quality/language gates are unaffected
    Ingest.ingestBatch(spark, dir, df(b0), 0L, bucketCap = 0L)
    Ingest.ingestBatch(spark, dir, df(b1), 1L, bucketCap = 0L)
    Ingest.ingestBatch(spark, dir, df(b2), 2L, bucketCap = 0L)

    val (refAdmitted, refStats) = runRef(batches, bucketCap = 0L)
    assert(refAdmitted.map(_._1) == Set(1L, 4L, 6L, 8L, 9L, 10L, 11L),
      s"cap=0 reference should admit every near-dup: $refAdmitted")
    assert(storeAdmitted(dir) == refAdmitted,
      s"capped admission diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refAdmitted")
    assert(storeStats(dir) == refStats)
  }

  test("template-heavy batch: hot intra-batch buckets are suppressed, cold pairs still drop") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("template")
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text")

    // one micro-batch where four template docs share their band buckets
    // (bucket size 4 > cap 2 ⇒ suppressed: no |bucket|² pair work) while
    // an unrelated near-dup PAIR (bucket size 2 <= cap) still verifies and
    // drops its larger id; a follow-up batch then probes the STORED side
    // of the same hot template buckets
    val t0: Seq[(Long, String, String)] =
      (20L to 23L).map(i => (i, "web", enDoc(sharedBody("T") + s" t$i"))) ++
        Seq(
          (30L, "web", enDoc(sharedBody("P") + " p30")),
          (31L, "web", enDoc(sharedBody("P") + " p31")))
    val t1: Seq[(Long, String, String)] = Seq(
      (40L, "web", enDoc(sharedBody("T") + " t40")),
      (41L, "web", enDoc(ownBody(41L))))
    val tb = Seq(t0, t1)

    Ingest.ingestBatch(spark, dir, df(t0), 0L, bucketCap = 2L)
    Ingest.ingestBatch(spark, dir, df(t1), 1L, bucketCap = 2L)

    val (refCapped, refStatsCapped) = runRef(tb, bucketCap = 2L)
    val (refUncapped, _) = runRef(tb)
    // non-vacuity: the cap must actually change the outcome — the template
    // family survives where the uncapped replay collapses it to doc 20
    assert(refUncapped.map(_._1) == Set(20L, 30L, 41L), refUncapped.toString)
    assert(refCapped.map(_._1).intersect(Set(21L, 22L, 23L)).nonEmpty,
      s"cap never suppressed an intra bucket: $refCapped")
    assert(!refCapped.map(_._1).contains(31L),
      s"cold pair (30,31) must still drop 31: $refCapped")
    assert(storeAdmitted(dir) == refCapped,
      s"template admission diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refCapped")
    assert(storeStats(dir) == refStatsCapped)
  }

  test("model-gated stream (DSIR threshold + perplexity band between langid and dedup) equals the sequential reference") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = tmpDir("gates")

    // ---- freeze the two model artifacts (offline training, like prod);
    // lang comes from the operator's own predictor via flaggedBatch ----
    val predLang = Ingest.flaggedBatch(batches.flatten.toDF("doc_id", "source", "text"))
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = batches.flatten
      .map { case (id, src, txt) => (id, src, txt, predLang(id)) }
      .toDF("doc_id", "source", "text", "lang")
    val (wmap, dflt) = graft.ops.Dsir.loadModel(
      graft.ops.Dsir.bucketCounts(corpus.select(col("lang"), col("text"))))
    val dsirScores = corpus
      .select(col("doc_id"), graft.ops.Dsir.scoreCol(wmap, dflt).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sortedScores = dsirScores.values.toSeq.sorted
    val minScore = sortedScores(sortedScores.length / 2) // median: both sides populated

    val corpusDir = tmpDir("gates_corpus")
    corpus.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .coalesce(1).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    PerplexityStore.build(spark, corpusDir, s"$corpusDir/lm")
    val m = PerplexityStore.load(spark, s"$corpusDir/lm")
    val ppxKeep = PerplexityStore
      .score(corpus.select(col("doc_id"), col("source"), col("text")), m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

    val dsirKeep: Long => Boolean = id => dsirScores(id) >= minScore
    val modelKeep: Long => Boolean = id => dsirKeep(id) && ppxKeep(id)

    // ---- the composed stream: gates slot between langid and dedup ----
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir, modelGates = Seq(
      StreamingIngest.dsirGate(wmap, dflt, minScore),
      StreamingIngest.perplexityGate(m)))
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }

      val (refAdmitted, refStats) = runRef(batches, modelKeep = modelKeep)
      val (ungated, _) = runRef(batches)
      // non-vacuity: both gates fire on language survivors, the perplexity
      // band drops docs the DSIR threshold kept (so the composition is more
      // than one gate), and something is still admitted
      val langSurvivors = ungated.map(_._1) ++ Set(5L, 6L, 7L, 8L, 10L) // incl. dedup-dropped
      assert(langSurvivors.exists(id => !dsirKeep(id)),
        s"DSIR gate inert: scores=$dsirScores thr=$minScore")
      assert(langSurvivors.exists(id => dsirKeep(id) && !ppxKeep(id)),
        s"perplexity gate adds nothing beyond DSIR: keep=$ppxKeep")
      assert(refAdmitted.nonEmpty, "gated fixture admitted nothing — equality is vacuous")
      assert(refAdmitted != ungated, "model gates changed nothing")

      assert(storeAdmitted(dir) == refAdmitted,
        s"gated admission diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refAdmitted")
      assert(storeStats(dir) == refStats,
        s"gated stats diverge:\n  store=${storeStats(dir)}\n  ref=$refStats")
    } finally query.stop()
  }

  test("classifier gate composes as a THIRD frozen-model stage; stream equals the sequential reference") {
    // The full three-gate admission chain a production curation pipeline
    // runs (DSIR relevance + perplexity band + quality classifier), each a
    // pure per-doc decision against frozen artifacts. The classifier's
    // operating point is set at the corpus median score so the third gate
    // provably cuts beyond the first two (non-vacuity asserted).
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = tmpDir("gates3")

    val predLang = Ingest.flaggedBatch(batches.flatten.toDF("doc_id", "source", "text"))
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = batches.flatten
      .map { case (id, src, txt) => (id, src, txt, predLang(id)) }
      .toDF("doc_id", "source", "text", "lang")
    val (wmap, dflt) = graft.ops.Dsir.loadModel(
      graft.ops.Dsir.bucketCounts(corpus.select(col("lang"), col("text"))))
    val dsirScores = corpus
      .select(col("doc_id"), graft.ops.Dsir.scoreCol(wmap, dflt).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sortedScores = dsirScores.values.toSeq.sorted
    val minScore = sortedScores(sortedScores.length / 2)

    val corpusDir = tmpDir("gates3_corpus")
    corpus.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .coalesce(1).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    PerplexityStore.build(spark, corpusDir, s"$corpusDir/lm")
    val m = PerplexityStore.load(spark, s"$corpusDir/lm")
    val ppxKeep = PerplexityStore
      .score(corpus.select(col("doc_id"), col("source"), col("text")), m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

    // classifier operating point: corpus median of the tx13 score
    val clfScores = corpus
      .select(col("doc_id"), graft.ops.TextOps.clfScoreCol.as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val clfSorted = clfScores.values.toSeq.sorted
    val clfThr = clfSorted(clfSorted.length / 2)

    val dsirKeep: Long => Boolean = id => dsirScores(id) >= minScore
    val clfKeep: Long => Boolean = id => clfScores(id) >= clfThr
    val modelKeep: Long => Boolean = id => dsirKeep(id) && ppxKeep(id) && clfKeep(id)

    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir, modelGates = Seq(
      StreamingIngest.dsirGate(wmap, dflt, minScore),
      StreamingIngest.perplexityGate(m),
      StreamingIngest.classifierGate(clfThr)))
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }

      val (refAdmitted, refStats) = runRef(batches, modelKeep = modelKeep)
      val (twoGate, _) = runRef(batches,
        modelKeep = id => dsirKeep(id) && ppxKeep(id))
      // non-vacuity: the classifier must cut docs the first two gates kept
      assert(refAdmitted != twoGate,
        s"classifier gate adds nothing beyond DSIR+perplexity: thr=$clfThr scores=$clfScores")
      assert(refAdmitted.nonEmpty, "three-gate fixture admitted nothing — equality is vacuous")

      assert(storeAdmitted(dir) == refAdmitted,
        s"three-gate admission diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refAdmitted")
      assert(storeStats(dir) == refStats,
        s"three-gate stats diverge:\n  store=${storeStats(dir)}\n  ref=$refStats")
    } finally query.stop()
  }

  test("capstone tie: pp04-style batch stage composition equals StreamingIngest with all THREE model gates on one batch") {
    // The two capstones meet: the BATCH tier's pp04 stage pattern (ONE
    // corpus pass computing every gate input, stage flags as conditional
    // columns on it, id-only drop sets attached by left joins —
    // Pipeline.scala's discipline) composed here as a declarative DataFrame
    // query over the SAME shared builders, vs the STREAMING capstone
    // (StreamingIngest with the full three-gate chain: DSIR + perplexity
    // band + the tx13 quality classifier) ingesting the same corpus as ONE
    // micro-batch into an empty store. Under the narrowed equality
    // contract (Ingest.scala: no bucket over the census cap; one batch, so
    // no cross-batch dup chains and no stored side) the admission SETS and
    // the attrition row must be equal exactly.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val corpus = batches.flatten
    val corpusDf = corpus.toDF("doc_id", "source", "text")

    // ---- frozen model artifacts, trained offline on the corpus (the
    // model-gated test's recipe: lang labels from the operator's own
    // predictor; DSIR threshold at the median so both sides populate) ----
    val predLang = Ingest.flaggedBatch(corpusDf)
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val langed = corpus.map { case (id, src, txt) => (id, src, txt, predLang(id)) }
      .toDF("doc_id", "source", "text", "lang")
    val (wmap, dflt) = graft.ops.Dsir.loadModel(
      graft.ops.Dsir.bucketCounts(langed.select(col("lang"), col("text"))))
    val scores = langed.select(col("doc_id"),
        graft.ops.Dsir.scoreCol(wmap, dflt).as("s"))
      .collect().map(_.getDouble(1)).sorted
    val minScore = scores(scores.length / 2)
    val corpusDir = tmpDir("tie_corpus")
    langed.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .coalesce(1).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    PerplexityStore.build(spark, corpusDir, s"$corpusDir/lm")
    val m = PerplexityStore.load(spark, s"$corpusDir/lm")
    // the THIRD gate (tx13 classifier), operating point at the corpus
    // median score so it provably cuts beyond the first two
    val clfSorted = corpusDf.select(graft.ops.TextOps.clfScoreCol.as("s"))
      .collect().map(_.getDouble(0)).sorted
    val clfThr = clfSorted(clfSorted.length / 2)

    // ---- graft a deterministic dedup pivot: the model gates decide by
    // TEXT (frozen artifacts), so which fixture docs survive them is not
    // under the test's control — the base corpus' exact-dup trio may die
    // at the gates, leaving exact dedup vacuously inert. Pick a PIVOT doc
    // that provably passes lang + both gates, whose near twin (text + two
    // novel tokens) ALSO passes and shares a band bucket at agreement
    // >= 0.5, then append an exact twin (id 100) and that near twin
    // (id 101): keep-first must drop 100, the near-dup screen must drop
    // 101 — every stage fires by construction, decided by the same frozen
    // artifacts both capstones consume. ----
    def gateKeep(rows: Seq[(Long, String, String)]): Set[Long] = {
      val df = rows.toDF("doc_id", "source", "text")
      val langIds = Ingest.flaggedBatch(df).filter(col("lang_ok"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val dsirIds = df.filter(graft.ops.Dsir.scoreCol(wmap, dflt) >= minScore)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val ppxIds = PerplexityStore.score(df, m).filter(col("keep"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val clfIds = df.filter(graft.ops.TextOps.clfScoreCol >= clfThr)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      langIds & dsirIds & ppxIds & clfIds
    }
    val basePass = gateKeep(corpus)
    val baseDocs = features(corpus).map(d => d.id -> d).toMap
    val candRows = corpus.collect { case (id, src, txt) if basePass(id) =>
      (1000L + id, src, txt + " qq zz") }
    val candPass = gateKeep(candRows)
    val candDocs = features(candRows).map(d => d.id -> d).toMap
    val pivot = corpus.find { case (id, _, _) =>
      basePass(id) && candPass(1000L + id) && {
        val c = candDocs(1000L + id)
        est(baseDocs(id).sig, c.sig) >= 0.5 &&
          baseDocs(id).bands.toSet.intersect(c.bands.toSet).nonEmpty
      }
    }
    assert(pivot.isDefined, s"no gate-surviving pivot with a surviving near twin: pass=$basePass")
    val (_, psrc, ptxt) = pivot.get
    val corpusAll = corpus ++ Seq((100L, psrc, ptxt), (101L, psrc, ptxt + " qq zz"))
    val corpusAllDf = corpusAll.toDF("doc_id", "source", "text")

    // ---- the BATCH capstone composition (pp04's shape): one flagged
    // relation, model-gate flags joined on (their scorers need text),
    // keep-first exact dedup as a survivors-first window, the near-dup
    // drop set as a banded self-join verified by the signature-agreement
    // estimate (the store twin's documented streaming verify — batch dd12
    // re-reads shingles instead; the tie pins the streaming semantics) ----
    val dsirOk = corpusAllDf.select(col("doc_id"),
      (graft.ops.Dsir.scoreCol(wmap, dflt) >= minScore).as("dsir_ok"))
    val ppxOk = PerplexityStore.score(corpusAllDf, m)
      .select(col("doc_id"), col("keep").as("ppx_ok"))
    val clfOk = corpusAllDf.select(col("doc_id"),
      (graft.ops.TextOps.clfScoreCol >= clfThr).as("clf_ok"))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("gate_ok").desc, col("doc_id"))
    val flagged = Ingest.flaggedBatch(corpusAllDf)
      .join(dsirOk, Seq("doc_id")).join(ppxOk, Seq("doc_id"))
      .join(clfOk, Seq("doc_id"))
      .withColumn("gate_ok",
        col("lang_ok") && col("dsir_ok") && col("ppx_ok") && col("clf_ok"))
      .withColumn("uniq", col("gate_ok") && row_number().over(wFp) === 1)
      .persist()
    val bandRows = flagged.filter(col("uniq"))
      .select(col("doc_id"), col("sig"),
        posexplode(graft.ops.Dedup.bandKeysCol(col("sig"))).as(Seq("band", "bkey")))
      .persist()
    // contract applicability: no bucket over the census cap on the fixture
    val maxBucket = bandRows.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).agg(max(col("bc"))).collect()(0).getLong(0)
    assert(maxBucket <= 1024L, s"fixture breaches the census cap: $maxBucket")
    def estCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / graft.ops.Dedup.P
    val ndDrop = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("doc_id"),
        col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
      .filter(estCol(col("sa"), col("sb")) >= 0.5)
      .select(col("doc_id")).distinct()
      .withColumn("nd_hit", lit(1))
    val admitted = flagged.join(ndDrop, Seq("doc_id"), "left")
      .withColumn("admit", col("uniq") && col("nd_hit").isNull)
      .persist()
    val batchSet = admitted.filter(col("admit"))
      .select(col("doc_id"), col("source"), col("tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // pp04's attrition shape: ONE conditional aggregation, no re-scan
    val batchStats = admitted.agg(
      count(lit(1)).as("n_raw"), count_if(col("q_ok")).as("n_quality"),
      count_if(col("lang_ok")).as("n_lang"), count_if(col("uniq")).as("n_exact"),
      count_if(col("admit")).as("n_admitted")).collect()(0)

    // non-vacuity: every stage of the composition fires on the fixture —
    // including the CLASSIFIER specifically (a doc the first two gates
    // kept must die at the third, or the tie never exercises tx13)
    val gateDropped = admitted.filter(col("lang_ok") && !col("gate_ok")).count()
    val clfDropped = admitted.filter(
      col("lang_ok") && col("dsir_ok") && col("ppx_ok") && !col("clf_ok")).count()
    val exactDropped = admitted.filter(col("gate_ok") && !col("uniq")).count()
    val ndDropped = admitted.filter(col("uniq") && !col("admit")).count()
    assert(gateDropped > 0, "model gates inert on the fixture")
    assert(clfDropped > 0,
      s"classifier gate inert in the capstone tie (thr=$clfThr)")
    assert(exactDropped > 0, "exact dedup inert on the fixture")
    assert(ndDropped > 0, "near-dup screen inert on the fixture")
    assert(batchSet.nonEmpty, "capstone tie is vacuous: nothing admitted")

    // ---- the STREAMING capstone over the same corpus, one micro-batch ----
    val dir = tmpDir("tie")
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir, modelGates = Seq(
      StreamingIngest.dsirGate(wmap, dflt, minScore),
      StreamingIngest.perplexityGate(m),
      StreamingIngest.classifierGate(clfThr)))
    try {
      input.addData(corpusAll: _*)
      query.processAllAvailable()
      assert(storeAdmitted(dir) == batchSet,
        s"capstones diverge:\n  stream=${storeAdmitted(dir)}\n  batch=$batchSet")
      val st = storeStats(dir)
      assert(st.size == 1)
      assert((st.head.nRaw, st.head.nQuality, st.head.nLang, st.head.nExact,
        st.head.nAdmitted) ==
        (batchStats.getLong(0), batchStats.getLong(1), batchStats.getLong(2),
          batchStats.getLong(3), batchStats.getLong(4)),
        s"attrition diverges:\n  stream=${st.head}\n  batch=$batchStats")
    } finally {
      query.stop()
      Seq(flagged, bandRows, admitted).foreach(_.unpersist(false))
    }
  }

  test("capstone tie: the decontamination gate joins the chain — FOUR-gate batch composition equals StreamingIngest, and the gate cuts a doc every other stage admits") {
    // Extends the three-gate capstone tie to the round-15 decontamination
    // gate: dc03 pins the BATCH stage order (decon before keep-first);
    // this pins that StreamingIngest's composed gate+dedup admission
    // equals the same declarative four-gate batch composition on one
    // micro-batch. The dedup-stage non-vacuity lives in the three-gate
    // tie; the REQUIRED non-vacuity here is the decon gate's own: the
    // frozen suite is seeded with a window from a doc the OTHER three
    // gates AND both dedup screens provably admit (the sequential
    // reference's sans-decon admission), so the gate must cut a doc that
    // would otherwise land in the corpus.
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val corpus = batches.flatten
    val corpusDf = corpus.toDF("doc_id", "source", "text")

    // ---- frozen model artifacts (the three-gate tie's recipe) ----
    val predLang = Ingest.flaggedBatch(corpusDf)
      .select(col("doc_id"), col("pred_lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val langed = corpus.map { case (id, src, txt) => (id, src, txt, predLang(id)) }
      .toDF("doc_id", "source", "text", "lang")
    val (wmap, dflt) = graft.ops.Dsir.loadModel(
      graft.ops.Dsir.bucketCounts(langed.select(col("lang"), col("text"))))
    val scores = langed.select(col("doc_id"),
        graft.ops.Dsir.scoreCol(wmap, dflt).as("s"))
      .collect().map(_.getDouble(1)).sorted
    // QUARTILE operating points (the three-gate tie uses medians): the
    // base fixture has exactly one doc passing all three median gates, so
    // cutting it by decontamination would leave the four-gate admission
    // empty and the tie vacuous. At the quartiles every model gate still
    // cuts docs on this fixture (dsir drops the es doc; clf drops three;
    // the perplexity band is model-fixed) while THREE docs survive all
    // three — room for the decon gate to cut one and still admit.
    val minScore = scores(scores.length / 4)
    val corpusDir = tmpDir("tie4_corpus")
    langed.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .coalesce(1).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    PerplexityStore.build(spark, corpusDir, s"$corpusDir/lm")
    val m = PerplexityStore.load(spark, s"$corpusDir/lm")
    val clfSorted = corpusDf.select(graft.ops.TextOps.clfScoreCol.as("s"))
      .collect().map(_.getDouble(0)).sorted
    val clfThr = clfSorted(clfSorted.length / 4)

    // ---- the sans-decon admission (sequential reference, three model
    // gates): every doc in it passed quality, language, all three model
    // gates, AND both dedup screens — the population the decon gate must
    // provably cut from ----
    val dsirIds = corpusDf.filter(graft.ops.Dsir.scoreCol(wmap, dflt) >= minScore)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val ppxIds = PerplexityStore.score(corpusDf, m).filter(col("keep"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val clfIds = corpusDf.filter(graft.ops.TextOps.clfScoreCol >= clfThr)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val threeKeep = (id: Long) => dsirIds(id) && ppxIds(id) && clfIds(id)
    val (admitted3, _) = runRef(Seq(corpus), modelKeep = threeKeep)
    val admitted3Ids = admitted3.map(_._1)
    // decon pivot: unique-fingerprint (so cutting it cannot resurrect an
    // exact twin into the admitted set) and long enough to own a window
    val fpCount = features(corpus).groupBy(_.fp).map { case (fp, ds) => fp -> ds.size }
    val fpOf = features(corpus).map(d => d.id -> d.fp).toMap
    val textOf = corpus.map { case (id, _, txt) => id -> txt }.toMap
    val deconPivot = admitted3Ids.toSeq.sorted.find { id =>
      fpCount(fpOf(id)) == 1 &&
        textOf(id).trim.split("\\s+").length >= graft.ops.Dedup.DeconSpanK
    }
    assert(deconPivot.isDefined,
      s"no unique-fp sans-decon admitted doc to seed the suite: $admitted3Ids")
    val pid = deconPivot.get
    // the frozen suite: ONE window — the pivot's last DeconSpanK tokens
    // (inside its unique body, so the artifact targets exactly that doc)
    val suiteText = textOf(pid).trim.split("\\s+")
      .takeRight(graft.ops.Dedup.DeconSpanK).mkString(" ")
    val benchHashes = StreamingIngest.benchmarkSpans(Seq(suiteText).toDF("text"))
      .persist()
    assert(benchHashes.count() >= 1, "frozen suite artifact is empty")

    // ---- the BATCH four-gate composition: the three-gate tie's shape
    // with the decon flag in the gate conjunction — decon BEFORE the
    // keep-first window, dc03's pinned order ----
    val dsirOk = corpusDf.select(col("doc_id"),
      (graft.ops.Dsir.scoreCol(wmap, dflt) >= minScore).as("dsir_ok"))
    val ppxOk = PerplexityStore.score(corpusDf, m)
      .select(col("doc_id"), col("keep").as("ppx_ok"))
    val clfOk = corpusDf.select(col("doc_id"),
      (graft.ops.TextOps.clfScoreCol >= clfThr).as("clf_ok"))
    val contamIds = corpusDf
      .select(col("doc_id"), graft.ops.Dedup.wordHashCol(col("text")).as("graft_wh"))
      .select(col("doc_id"), explode_outer(graft.ops.Dedup.spansFromWh(
        col("graft_wh"), graft.ops.Dedup.DeconSpanK)).as("h"))
      .join(benchHashes.select(col("h")), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("dc_hit", lit(1))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("gate_ok").desc, col("doc_id"))
    val flagged = Ingest.flaggedBatch(corpusDf)
      .join(dsirOk, Seq("doc_id")).join(ppxOk, Seq("doc_id"))
      .join(clfOk, Seq("doc_id"))
      .join(contamIds, Seq("doc_id"), "left")
      .withColumn("dc_ok", col("dc_hit").isNull)
      .withColumn("gate_ok", col("lang_ok") && col("dsir_ok") &&
        col("ppx_ok") && col("clf_ok") && col("dc_ok"))
      .withColumn("uniq", col("gate_ok") && row_number().over(wFp) === 1)
      .persist()
    val bandRows = flagged.filter(col("uniq"))
      .select(col("doc_id"), col("sig"),
        posexplode(graft.ops.Dedup.bandKeysCol(col("sig"))).as(Seq("band", "bkey")))
      .persist()
    val maxBucket = bandRows.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc")).agg(max(col("bc"))).collect()(0).getLong(0)
    assert(maxBucket <= 1024L, s"fixture breaches the census cap: $maxBucket")
    def estCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / graft.ops.Dedup.P
    val ndDrop = bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ia"), col("y.doc_id").as("doc_id"),
        col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
      .filter(estCol(col("sa"), col("sb")) >= 0.5)
      .select(col("doc_id")).distinct()
      .withColumn("nd_hit", lit(1))
    val admitted = flagged.join(ndDrop, Seq("doc_id"), "left")
      .withColumn("admit", col("uniq") && col("nd_hit").isNull)
      .persist()
    val batchSet = admitted.filter(col("admit"))
      .select(col("doc_id"), col("source"), col("tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batchStats = admitted.agg(
      count(lit(1)).as("n_raw"), count_if(col("q_ok")).as("n_quality"),
      count_if(col("lang_ok")).as("n_lang"), count_if(col("uniq")).as("n_exact"),
      count_if(col("admit")).as("n_admitted")).collect()(0)

    // ---- the decon gate's non-vacuity: the pivot passes every OTHER
    // gate, fails ONLY decon, and was admitted sans-decon — so the gate
    // cuts a doc every other stage admits ----
    val pRow = admitted.filter(col("doc_id") === pid).collect()(0)
    assert(pRow.getAs[Boolean]("lang_ok") && pRow.getAs[Boolean]("dsir_ok") &&
      pRow.getAs[Boolean]("ppx_ok") && pRow.getAs[Boolean]("clf_ok"),
      s"decon pivot $pid no longer passes the other gates")
    assert(!pRow.getAs[Boolean]("dc_ok"),
      s"decon pivot $pid not cut by the gate — suite window missed")
    assert(admitted3Ids.contains(pid) && !batchSet.map(_._1).contains(pid),
      s"decon gate did not remove $pid from the admitted set")
    assert(batchSet.nonEmpty, "four-gate tie is vacuous: nothing admitted")

    // ---- the STREAMING capstone with all FOUR gates, one micro-batch ----
    val dir = tmpDir("tie4")
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir, modelGates = Seq(
      StreamingIngest.dsirGate(wmap, dflt, minScore),
      StreamingIngest.perplexityGate(m),
      StreamingIngest.classifierGate(clfThr),
      StreamingIngest.decontaminationGate(benchHashes)))
    try {
      input.addData(corpus: _*)
      query.processAllAvailable()
      assert(storeAdmitted(dir) == batchSet,
        s"capstones diverge:\n  stream=${storeAdmitted(dir)}\n  batch=$batchSet")
      val st = storeStats(dir)
      assert(st.size == 1)
      assert((st.head.nRaw, st.head.nQuality, st.head.nLang, st.head.nExact,
        st.head.nAdmitted) ==
        (batchStats.getLong(0), batchStats.getLong(1), batchStats.getLong(2),
          batchStats.getLong(3), batchStats.getLong(4)),
        s"attrition diverges:\n  stream=${st.head}\n  batch=$batchStats")
    } finally {
      query.stop()
      Seq(benchHashes, flagged, bandRows, admitted).foreach(_.unpersist(false))
    }
  }

  test("ingest→index composition: admission batches land as index slices under the same batch id; a crash between the two commits replays cleanly") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.ops.{AnnIndex, Similarity}

    // deterministic 64-dim embeddings as ONE Spark expression over doc_id —
    // the same column feeds the stream, the one-shot reference log, and the
    // faux embeddings table, so every arm sees identical vectors
    def embCol = transform(sequence(lit(0), lit(63)), i =>
      pmod(col("doc_id") * lit(37) + i * lit(101), lit(97)).cast("double")
        / lit(97.0) + lit(0.01))

    val allDf = batches.flatten.toDF("doc_id", "source", "text")
    // a faux corpus dir so the serve path (probe ranking, query ADC tables,
    // full-vector rescore) can resolve vectors by id — the spec's stand-in
    // for the embeddings table the admitted docs came from
    val embDir = tmpDir("idx_embed")
    allDf.select(col("doc_id").as("vec_id"),
        embCol.cast("array<float>").as("embedding"),
        lit(0).as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$embDir/embeddings.parquet")

    // artifacts FROZEN from the init corpus before the stream starts (the
    // composition REFUSES to run without them — frozen-artifact stance)
    val initPv = Similarity.pqVecsOf(
      allDf.select(col("doc_id").as("vec_id"), embCol.as("embedding")))
    val indexDir = tmpDir("idx_log")
    AnnIndex.ensureArtifacts(spark, indexDir, initPv, batches.flatten.size.toLong)

    val corpusDir = tmpDir("idx_corpus")
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
      .withColumn("embedding", embCol)
    val query = StreamingIngest.ingestStreamIndexed(docs, corpusDir, indexDir)
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()

    val (refAdmitted, _) = runRef(batches)
    val admittedIds = refAdmitted.map(_._1)

    // (1) the index holds codes for EXACTLY the admitted docs, and every
    // admission batch id is committed in the index log too
    def codeSet(dir: String): Set[(Long, Long, Seq[Int])] =
      AnnIndex.codes(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq)).toSet
    val streamed = codeSet(indexDir)
    assert(streamed.map(_._1) == admittedIds,
      s"index membership diverges from admission:\n  index=${streamed.map(_._1)}\n  admitted=$admittedIds")
    val idxView = AnnIndex.view(spark, indexDir)
    assert(Seq(0L, 1L, 2L).forall(idxView.isCommitted),
      s"admission batch ids not all committed in the index log: $idxView")

    // (2) the streamed codes equal a ONE-SHOT append of exactly the
    // admitted corpus against the same frozen artifacts (bit-identical
    // encode — the IvfAppendSpec equality, now across the composition)
    val refLog = tmpDir("idx_ref")
    AnnIndex.ensureArtifacts(spark, refLog, initPv, batches.flatten.size.toLong)
    val admittedPv = Similarity.pqVecsOf(
      allDf.filter(col("doc_id").isin(admittedIds.toSeq: _*))
        .select(col("doc_id").as("vec_id"), embCol.as("embedding")))
    AnnIndex.appendBatch(spark, refLog, admittedPv, 0L)
    assert(streamed == codeSet(refLog),
      "streamed codes diverge from the one-shot append of the admitted corpus")

    // (3) probe answers served from the streamed log == the one-shot log
    // (the ss14 pipeline against the same frozen artifacts)
    val qIds = Seq(admittedIds.min, admittedIds.max).toDF("q_id")
    def serveRows(dir: String): Set[(Long, Long, Int)] =
      AnnIndex.serveFromLog(spark, embDir, dir, qIds).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val servedStreamed = serveRows(indexDir)
    assert(servedStreamed.nonEmpty, "probe answers vacuously empty")
    assert(servedStreamed == serveRows(refLog),
      "probe answers diverge between streamed and one-shot logs")

    // (3b) the STREAMING probe serves from the index the STREAM built —
    // the full composed loop (stream ingest+index → stream probe): query
    // ids stream in micro-batches through StreamingAnnProbe against the
    // composed log, and the union of per-batch answers equals the batch
    // serve over exactly the admitted corpus (the ss14 equality, closed
    // end-to-end for the composition the way IvfAppendSpec closed it for
    // the standalone log)
    val probeIn = MemoryStream[Long]
    val probeAnswers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val probeQuery = graft.streaming.StreamingAnnProbe.probeStreamWith(
      probeIn.toDF().toDF("q_id"),
      (res, _) => probeAnswers ++= res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))),
      (s2, ids) => AnnIndex.serveFromLog(s2, embDir, indexDir, ids))
    try {
      probeIn.addData(admittedIds.min)
      probeQuery.processAllAvailable()
      probeIn.addData(admittedIds.max)
      probeQuery.processAllAvailable()
    } finally probeQuery.stop()
    assert(probeAnswers.toSet == servedStreamed,
      "streamed probe answers over the composed log diverge from the batch serve")

    // (4) crash BETWEEN the two commits: batch 3's admission commits but
    // the codes append never runs; the composed replay no-ops admission,
    // re-derives the admitted set FROM THE STORE, and commits the codes
    val b3 = Seq((50L, "web", enDoc(ownBody(50L))), (51L, "web", badQuality))
    val b3df = b3.toDF("doc_id", "source", "text").withColumn("embedding", embCol)
    graft.ops.Ingest.ingestBatch(spark, corpusDir, b3df, 3L) // the crash point
    assert(!AnnIndex.view(spark, indexDir).isCommitted(3L),
      "codes must not be committed at the crash point")
    graft.ops.Ingest.ingestAndIndexBatch(spark, corpusDir, indexDir, b3df, 3L)
    assert(AnnIndex.view(spark, indexDir).isCommitted(3L))
    val afterReplay = codeSet(indexDir).map(_._1)
    assert(afterReplay == admittedIds + 50L,
      s"replay must index exactly the admitted docs: $afterReplay")
    // full replay of a fully-committed batch: both stores no-op
    graft.ops.Ingest.ingestAndIndexBatch(spark, corpusDir, indexDir, b3df, 3L)
    assert(codeSet(indexDir).map(_._1) == admittedIds + 50L)
  }

  test("decontamination gate: docs sharing an 8-token window with the frozen benchmark suite die at admission; stream equals the sequential reference") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // the frozen benchmark suite: one doc reusing sharedBody("A")'s 40-word
    // run, so the fixture docs built on it (1, 6, 8) share 8-token windows
    // with the suite while everything else — including the sharedBody("B")
    // family — stays clean. The criterion is the gate's DeconSpanK=8
    // window (not dc01's 3-gram audit statistic — see DeconSpanK's
    // scaladoc), so the common enDoc prefix alone contaminates nothing.
    val benchDocs = Seq("eval suite intro " + sharedBody("A"),
      "held out benchmark " + ownBody(99L))
    val benchHashes = StreamingIngest.benchmarkSpans(benchDocs.toDF("text"))

    // hash-independent reference: lowercase 8-token-window STRING sets
    // (the same injectivity stance as dd08's string-join oracle vs the
    // engine's xxh64 span hashes)
    val k = graft.ops.Dedup.DeconSpanK
    def grams(t: String): Set[String] =
      t.toLowerCase.split(" ", -1).toSeq.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).toSet
    val benchGrams = benchDocs.flatMap(grams).toSet
    val contaminated = batches.flatten.collect {
      case (id, _, text) if grams(text).intersect(benchGrams).nonEmpty => id
    }.toSet
    assert(contaminated == Set(1L, 6L, 8L), s"fixture drift: $contaminated")

    // non-vacuity: the gate must cut a doc every OTHER stage admits (doc 1
    // is admitted by the ungated reference; 6/8 already die as near-dups)
    val (ungated, _) = runRef(batches)
    assert(ungated.map(_._1).exists(contaminated),
      "decontamination gate would be inert on this fixture")
    val (refAdmitted, refStats) = runRef(batches,
      modelKeep = id => !contaminated(id))
    assert(refAdmitted.map(_._1).intersect(contaminated).isEmpty)

    val dir = tmpDir("decon")
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingIngest.ingestStream(docs, dir, modelGates = Seq(
      StreamingIngest.decontaminationGate(benchHashes)))
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      assert(storeAdmitted(dir) == refAdmitted,
        s"gated stream diverges:\n  stream=${storeAdmitted(dir)}\n  ref=$refAdmitted")
      assert(storeStats(dir) == refStats,
        s"attrition diverges:\n  stream=${storeStats(dir)}\n  ref=$refStats")
    } finally query.stop()
  }

  test("delayed replay after compaction cannot duplicate a re-delivered doc's index entry") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.{AnnIndex, Similarity}

    // The at-least-once anomaly admittedIds' compacted fallback attributes
    // by candidate-set intersection: doc 2 is DELIVERED in batch 0 but
    // rejected there (bad quality), then re-delivered fixed in batch 1 and
    // admitted. After compaction folds both admitted slices, a delayed
    // replay of batch 0's crash-between-commits window derives its
    // admitted set as (view admitted ∩ batch-0 candidates) = {1, 2} —
    // doc 2 wrongly attributed — and without the index-membership
    // anti-join would append doc 2's codes a second time.
    def embCol = transform(sequence(lit(0), lit(63)), i =>
      pmod(col("doc_id") * lit(37) + i * lit(101), lit(97)).cast("double")
        / lit(97.0) + lit(0.01))
    val r0 = Seq((1L, "web", enDoc(ownBody(1))), (2L, "web", badQuality))
    val r1 = Seq((2L, "web", enDoc(ownBody(2))), (3L, "web", enDoc(ownBody(3))))
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text").withColumn("embedding", embCol)
    val allIds = Seq(1L, 2L, 3L)
    val initPv = Similarity.pqVecsOf((r0 ++ r1).distinct.toDF("doc_id", "source", "text")
      .select(col("doc_id").as("vec_id"), embCol.as("embedding")).distinct())
    val corpusDir = tmpDir("replay_corpus")
    val indexDir = tmpDir("replay_idx")
    AnnIndex.ensureArtifacts(spark, indexDir, initPv, allIds.size.toLong)

    // batch 0 crashes BETWEEN the commits: admission lands, codes never run
    Ingest.ingestBatch(spark, corpusDir, df(r0), 0L)
    assert(!AnnIndex.view(spark, indexDir).isCommitted(0L))
    // batch 1 runs composed and commits doc 2 + 3's codes under id 1
    Ingest.ingestAndIndexBatch(spark, corpusDir, indexDir, df(r1), 1L)
    // compaction folds BOTH admitted slices before the replay arrives
    assert(Ingest.compact(spark, corpusDir).contains(0L))
    assert(Ingest.vacuum(spark, corpusDir, graceMs = 0L))

    // the delayed replay of batch 0: admission no-ops, the index append
    // derives {1, 2} from the store but must anti-join doc 2 back out
    Ingest.ingestAndIndexBatch(spark, corpusDir, indexDir, df(r0), 0L)
    assert(AnnIndex.view(spark, indexDir).isCommitted(0L))
    val perVec = AnnIndex.codes(spark, indexDir)
      .groupBy(col("vec_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVec.keySet == Set(1L, 2L, 3L),
      s"index must hold exactly the admitted docs: ${perVec.keySet}")
    assert(perVec.values.forall(_ == 1L),
      s"replay duplicated an index entry: $perVec")
    // and doc 2's slice attribution stayed with the batch that ADMITTED it
    assert(spark.read.parquet(s"$indexDir/codes/batch_id=0")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet == Set(1L),
      "batch 0's replayed slice must hold only its own admitted doc")
  }

  test("compaction folds batches into a committed generation: answers preserved under load, across a crash mid-compaction, and after vacuum") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("compact")
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text")

    Ingest.ingestBatch(spark, dir, df(b0), 0L)
    Ingest.ingestBatch(spark, dir, df(b1), 1L)
    val (refAdmitted01, refStats01) = runRef(Seq(b0, b1))

    // crash mid-compaction: every data store written, manifest NOT
    // committed — readers must see the store exactly as before
    assert(Ingest.writeGenerationData(spark, dir).contains((0L, 1L)))
    assert(Ingest.committedGeneration(spark, dir).isEmpty,
      "generation without a manifest marker must be invisible")
    assert(storeAdmitted(dir) == refAdmitted01)
    assert(storeStats(dir) == refStats01)

    // the rerun overwrites the partial generation and commits it
    assert(Ingest.compact(spark, dir).contains(0L))
    assert(Ingest.committedGeneration(spark, dir).contains((0L, 1L)))
    assert(storeAdmitted(dir) == refAdmitted01)
    assert(storeStats(dir) == refStats01)

    // under load: new batches land on TOP of the generation and the
    // cross-batch dedup consults the compacted slices
    Ingest.ingestBatch(spark, dir, df(b2), 2L)
    val (refAdmitted, refStats) = runRef(batches)
    assert(storeAdmitted(dir) == refAdmitted,
      s"post-compaction ingest diverges:\n  store=${storeAdmitted(dir)}\n  ref=$refAdmitted")
    assert(storeStats(dir) == refStats)

    // the grace guard: within DefaultVacuumGraceMs of the generation
    // commit, vacuum REFUSES — a reader that resolved its StoreView before
    // the commit still holds the superseded batch paths, and they must
    // remain readable across the refused vacuum
    val preCompactionView = Ingest.StoreView(None, -1L, Seq(0L, 1L, 2L))
    assert(!Ingest.vacuum(spark, dir), "vacuum inside the grace window must refuse")
    assert(new java.io.File(s"$dir/admitted/batch_id=0").exists(),
      "grace-refused vacuum deleted a superseded batch dir")
    assert(spark.read.parquet(
        s"$dir/admitted/batch_id=0", s"$dir/admitted/batch_id=1",
        s"$dir/admitted/batch_id=2").count() > 0,
      "a pre-compaction StoreView's paths must survive a grace-refused vacuum")
    assert(preCompactionView.isCommitted(1L)) // the stale view is self-consistent

    // vacuum removes the superseded batch dirs once the caller waives the
    // grace (graceMs = 0 — no concurrent readers here); answers unchanged;
    // a replay of a batch the GENERATION covers is still a no-op (the
    // exactly-once guard now comes from the manifest, not the batch dir)
    assert(Ingest.vacuum(spark, dir, graceMs = 0L))
    assert(!new java.io.File(s"$dir/admitted/batch_id=0").exists(), "vacuum left batch 0")
    assert(!new java.io.File(s"$dir/fp/batch_id=1").exists(), "vacuum left batch 1")
    assert(storeAdmitted(dir) == refAdmitted)
    assert(storeStats(dir) == refStats)
    Ingest.ingestBatch(spark, dir, df(b0), 0L) // replay of a folded batch
    assert(storeAdmitted(dir) == refAdmitted, "replay of a compacted batch must no-op")
    assert(storeStats(dir) == refStats)

    // a second compaction folds the tail into gen 1; vacuum drops gen 0;
    // with nothing new to fold, compact is a no-op
    assert(Ingest.compact(spark, dir).contains(1L))
    assert(Ingest.vacuum(spark, dir, graceMs = 0L))
    assert(!new java.io.File(s"$dir/compact/gen=0").exists(), "vacuum left gen 0")
    assert(storeAdmitted(dir) == refAdmitted)
    assert(storeStats(dir) == refStats)
    assert(Ingest.compact(spark, dir).isEmpty)
  }

  test("compaction anchors its first fold at the smallest committed id, not id 0") {
    val sp = spark
    import sp.implicits._
    val dir = tmpDir("compact-epoch")
    def df(rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF("doc_id", "source", "text")

    // a caller numbering batches from a non-zero epoch (a resumed
    // checkpoint) — the round-12 liveness hole was compact() returning
    // None forever because the fold anchored at id 0
    val epoch = 1000L
    def atEpoch(rows: Seq[StatsRow]): Seq[StatsRow] =
      rows.map(r => r.copy(batchId = r.batchId + epoch))
    Ingest.ingestBatch(spark, dir, df(b0), epoch)
    Ingest.ingestBatch(spark, dir, df(b1), epoch + 1)
    val (refAdmitted01, refStats01) = runRef(Seq(b0, b1))
    assert(Ingest.compact(spark, dir).contains(0L),
      "first fold must anchor at the smallest committed id")
    assert(Ingest.committedGeneration(spark, dir).contains((0L, epoch + 1)))
    assert(storeAdmitted(dir) == refAdmitted01)
    assert(storeStats(dir) == atEpoch(refStats01))

    // a LATER gap still blocks the fold (folding across it would mark the
    // gap id committed and swallow its late replay): batch 1003 committed,
    // 1002 missing → nothing new to fold
    Ingest.ingestBatch(spark, dir, df(b2), epoch + 3)
    assert(Ingest.compact(spark, dir).isEmpty,
      "a post-generation gap must not be folded across")
    // the gap backfills → the fold resumes and answers match the replay
    val emptyBatch = Seq.empty[(Long, String, String)]
    Ingest.ingestBatch(spark, dir, df(emptyBatch), epoch + 2)
    assert(Ingest.compact(spark, dir).contains(1L))
    val (refAdmitted, refStats) = runRef(Seq(b0, b1, emptyBatch, b2))
    assert(storeAdmitted(dir) == refAdmitted)
    assert(storeStats(dir) == atEpoch(refStats))
  }
}
