package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MmIngest, Multimodal}

/** Streaming multimodal-curation (StreamingMmCurate / ops.MmIngest) — the
  * mm10 batch capstone's online twin over a committed-batch disk store.
  *
  * Pins:
  *  (1) the sf0.01 corpus split into three doc_id-ordered micro-batches
  *      produces EXACTLY the batch capstone's admitted DOC SET and
  *      per-source per-stage attrition (the fixture is verified non-vacuous
  *      for every cross-batch path: cross-batch exact dups AND cross-batch
  *      hamming-1 canonical pairs both exist, so the stored-anti-join and
  *      the stored-band probe are load-bearing in the equality);
  *  (2) replaying a COMMITTED batch is a no-op (the commit-marker
  *      protocol — the full crash-replay matrix is BatchLog's, pinned in
  *      IngestStreamingSpec/ReplayRecoverySpec over the same machinery);
  *      compaction folds the tail with reader-invariant results, replays
  *      of folded batches stay no-ops, later batches dedup against the
  *      generation slice, and vacuum is grace-guarded;
  *  (3) arrival-order INVARIANTS under out-of-order delivery (where
  *      equality with the batch greedy rule is documented not to hold):
  *      gate/exact-stage totals are order-independent, and the admitted
  *      set never contains a shared vk or a hamming-1 canonical pair.
  */
class MmCurateStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

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

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mmcurate_$tag").toString

  private def docRows: Seq[(Long, String, String)] = {
    val sp = spark
    import sp.implicits._
    sp.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
  }

  private def thirds(rows: Seq[(Long, String, String)]): Seq[Seq[(Long, String, String)]] = {
    val n = rows.length
    Seq(rows.take(n / 3), rows.slice(n / 3, 2 * n / 3), rows.drop(2 * n / 3))
  }

  private def runStream(batches: Seq[Seq[(Long, String, String)]], dir: String): Unit = {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val query = StreamingMmCurate.curateStream(docs, dir)
    try batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    finally query.stop()
  }

  private def storeAdmitted(dir: String): Set[Long] =
    MmIngest.admitted(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet

  private def attritionRows(df: DataFrame): Seq[(String, Long, String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getLong(4))).toSeq.sorted

  /** The batch capstone's verdict frame + its attrition in one shot. */
  private def batchVerdicts(): (DataFrame, DataFrame) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
    Multimodal.curationVerdicts(docs)
  }

  private def batchAttrition(fin: DataFrame): DataFrame = {
    def bIf(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, col("byte_len")).otherwise(0L)), lit(0L))
    Multimodal.attritionRows(fin.groupBy(col("source")).agg(
      count(lit(1)).as("c0"), coalesce(sum(col("byte_len")), lit(0L)).as("b0"),
      count_if(col("dec_ok")).as("c1"), bIf(col("dec_ok")).as("b1"),
      count_if(col("en_ok")).as("c2"), bIf(col("en_ok")).as("b2"),
      count_if(col("sh_ok")).as("c3"), bIf(col("sh_ok")).as("b3"),
      count_if(col("ph_ok")).as("c4"), bIf(col("ph_ok")).as("b4"),
      count_if(col("nd_ok")).as("c5"), bIf(col("nd_ok")).as("b5")))
  }

  test("capstone tie: three id-ordered micro-batches equal batch mm10's admitted set and attrition; committed replay is a no-op") {
    val rows = docRows
    val batches = thirds(rows)
    val batchOf = rows.zipWithIndex.map { case (r, i) =>
      r._1 -> (if (i < rows.length / 3) 0 else if (i < 2 * rows.length / 3) 1 else 2)
    }.toMap

    val (flagged, fin) = batchVerdicts()
    val finRows = fin.select(col("doc_id"), col("vk"), col("levels"),
        col("sh_ok"), col("ph_ok"), col("nd_ok"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Long](2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    val expectedAdmitted = finRows.filter(_._6).map(_._1).toSet
    val expectedAttrition = attritionRows(batchAttrition(fin))
    flagged.unpersist(false)

    // ---- fixture non-vacuity: every cross-batch dedup path must carry
    // weight, or the equality would hold with the stored reads broken ----
    val canonBatch = finRows.filter(_._4).groupBy(_._2).map { case (_, g) =>
      g.minBy(_._1)._1
    }.toSet // canonical = min sh_ok doc per vk (the batch window's rule)
    val crossExact = finRows.count { r =>
      r._4 && !canonBatch.contains(r._1) &&
        batchOf(r._1) != batchOf(finRows.filter(x => x._2 == r._2 && x._4).minBy(_._1)._1)
    }
    assert(crossExact > 0, "no exact dup straddles a batch boundary — tie vacuous")
    val canonLv = finRows.filter(r => canonBatch.contains(r._1))
      .map(r => (r._1, r._3)).toSeq
    val crossNear = (for {
      (da, la) <- canonLv; (db, lb) <- canonLv
      if da < db && batchOf(da) != batchOf(db) &&
        la.zip(lb).map(p => math.abs(p._1 - p._2)).sum == 1
    } yield 1).size
    assert(crossNear > 0, "no hamming-1 canonical pair straddles a batch boundary — tie vacuous")
    assert(expectedAdmitted.nonEmpty && expectedAdmitted.size < rows.length,
      "capstone tie is vacuous: nothing (or everything) admitted")

    // ---- the streamed run ----
    val dir = tmpDir("tie")
    runStream(batches, dir)
    assert(storeAdmitted(dir) == expectedAdmitted,
      s"admitted diverges: stream-only=${storeAdmitted(dir) -- expectedAdmitted} " +
        s"batch-only=${expectedAdmitted -- storeAdmitted(dir)}")
    assert(attritionRows(MmIngest.attrition(spark, dir)) == expectedAttrition,
      "summed per-batch attrition diverges from the batch capstone")

    // ---- committed replay is a no-op ----
    val before = (storeAdmitted(dir), MmIngest.canonicals(spark, dir).count())
    val b0 = spark.createDataFrame(batches.head.map(r => (r._1, r._2, r._3)))
      .toDF("doc_id", "source", "text")
    MmIngest.curateBatch(spark, dir, b0, 0L)
    assert((storeAdmitted(dir), MmIngest.canonicals(spark, dir).count()) == before,
      "replaying a committed batch changed the store")
  }

  test("compaction: readers invariant across the fold; post-compaction batches dedup against the generation; vacuum is grace-guarded") {
    val rows = docRows
    val batches = thirds(rows)
    def asDf(b: Seq[(Long, String, String)]) =
      spark.createDataFrame(b).toDF("doc_id", "source", "text")
    val dir = tmpDir("compact")
    runStream(batches.take(2), dir)

    val mid = (storeAdmitted(dir), attritionRows(MmIngest.attrition(spark, dir)))
    assert(MmIngest.compact(spark, dir).contains(0L))
    assert((storeAdmitted(dir), attritionRows(MmIngest.attrition(spark, dir))) == mid,
      "compaction changed the readers")
    // replaying a batch the generation folded is still a no-op
    MmIngest.curateBatch(spark, dir, asDf(batches.head), 0L)
    assert((storeAdmitted(dir), attritionRows(MmIngest.attrition(spark, dir))) == mid,
      "replaying a compacted batch changed the store")

    // the third batch dedups against the GENERATION slice (no tail left):
    // final state must equal the full 3-batch run, i.e. the batch capstone
    MmIngest.curateBatch(spark, dir, asDf(batches(2)), 2L)
    val (flagged, fin) = batchVerdicts()
    val expectedAdmitted = fin.filter(col("nd_ok")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val expectedAttrition = attritionRows(batchAttrition(fin))
    flagged.unpersist(false)
    assert(storeAdmitted(dir) == expectedAdmitted,
      "post-compaction admission diverges from the batch capstone")
    assert(attritionRows(MmIngest.attrition(spark, dir)) == expectedAttrition,
      "post-compaction attrition diverges from the batch capstone")

    // vacuum refuses inside the default grace window, deletes at grace 0,
    // and the readers resolve identically over gen + surviving tail
    assert(!MmIngest.vacuum(spark, dir), "vacuum ignored the grace window")
    assert(MmIngest.vacuum(spark, dir, graceMs = 0L))
    assert(storeAdmitted(dir) == expectedAdmitted &&
      attritionRows(MmIngest.attrition(spark, dir)) == expectedAttrition,
      "vacuum broke the committed view")
  }

  test("out-of-order arrival: order-independent stage totals; admitted set has no shared vk and no hamming-1 canonical pair") {
    val rows = docRows
    val reversed = thirds(rows).reverse
    val dir = tmpDir("ooo")
    runStream(reversed, dir)

    val (flagged, fin) = batchVerdicts()
    val expectedAttrition = attritionRows(batchAttrition(fin))
    flagged.unpersist(false)
    val got = attritionRows(MmIngest.attrition(spark, dir))
    // gate stages (raw..shots) are per-doc flags — order-independent even
    // per source. exact_phash's GLOBAL doc count is the distinct survivor
    // vk count (order-independent), but its per-SOURCE attribution follows
    // WHICH doc canonicalizes each vk, which is arrival-order dependent —
    // as is near_dedup's which-survivor choice (both documented on
    // MmIngest: out-of-order streams get first-arrival greedy)
    val orderFree = Set("raw", "framed", "energy", "shots")
    assert(got.filter(r => orderFree(r._3)) ==
      expectedAttrition.filter(r => orderFree(r._3)),
      "gate stage totals changed under reordering")
    def globalExact(rows: Seq[(String, Long, String, Long, Long)]) =
      rows.filter(_._3 == "exact_phash").map(_._4).sum
    assert(globalExact(got) == globalExact(expectedAttrition),
      "distinct-canonical count changed under reordering")

    val admitted = storeAdmitted(dir)
    val canon = MmIngest.canonicals(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    assert(canon.map(_._1).distinct.length == canon.length,
      "store holds two canonicals for one vk")
    val admLv = canon.filter(c => admitted.contains(c._2)).map(c => (c._2, c._3)).toSeq
    val badPair = (for {
      (da, la) <- admLv; (db, lb) <- admLv
      if da < db && la.zip(lb).map(p => math.abs(p._1 - p._2)).sum <= 1
    } yield (da, db)).headOption
    assert(badPair.isEmpty, s"admitted set contains a near-dup pair: $badPair")
  }
}
