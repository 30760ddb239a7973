package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash+LSH near-dup screening: collisions score by signature
  * agreement, state is horizon-bounded and bucket-capped, cross-band events
  * collapse to one pair, and the one-batch stream reproduces the batch
  * band-join replay exactly (same signatures, same banding). */
class NearDupStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def words(n: Int, salt: String = ""): String =
    (0 until n).map(i => s"w$salt$i").mkString(" ")

  /** Doc text: `shared` common words then `own` unique-per-doc words. */
  private def doc(id: Long, shared: Int, own: Int): String =
    words(shared) + " " + (0 until own).map(i => s"u${id}x$i").mkString(" ")

  private def startPairs(name: String, horizonMs: Long, bucketCap: Int = 64,
                         minEst: Double = 0.5) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingNearDup.pairs(df, col("doc_id"), col("ts"), col("text"),
        horizonMs, bucketCap = bucketCap, minEst = minEst)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def got(name: String): Set[(Long, Long)] =
    spark.sql(s"SELECT doc_a, doc_b FROM $name").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Batch replay: same signatures + banding, band equi-join, agreement
    * threshold — the pair set a backfill over the same rows would flag. */
  private def batchPairs(rows: Seq[(Long, Long, String)], minEst: Double): Set[(Long, Long)] = {
    val df: DataFrame = spark.createDataFrame(rows).toDF("doc_id", "ts", "text")
    val sigs = StreamingNearDup.signatures(df, col("doc_id"), col("ts"), col("text"))
    val sigMap = sigs.collect().map(s => s.doc_id -> s.sig).toMap
    val bands = StreamingNearDup.bandRows(sigs).toDF()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cand.filter { case (a, b) =>
      val (sa, sb) = (sigMap(a), sigMap(b))
      sa.zip(sb).count { case (x, y) => x == y }.toDouble / graft.ops.Dedup.P >= minEst
    }
  }

  test("near-identical docs pair once (cross-band dedup); distinct docs do not") {
    val (input, query) = startPairs("nd_basic", horizonMs = 60000L)
    try {
      // 30 shared words + 1 own word: shingle sets nearly identical
      input.addData((1L, 1000L, doc(1, 30, 1)), (2L, 2000L, doc(2, 30, 1)),
        (9L, 1500L, words(25, "zz")))  // unrelated corpus doc
      query.processAllAvailable()
      assert(got("nd_basic") == Set((1L, 2L)), s"got ${got("nd_basic")}")
    } finally { query.stop() }
  }

  test("one-batch stream equals the batch band-join replay") {
    val rows = Seq.tabulate(12) { i =>
      // three near-dup families of 3 (ids 0-2, 3-5, 6-8) + 3 unrelated docs
      val fam = i / 3
      if (fam < 3) ((fam * 3 + i % 3).toLong, 1000L + i, doc(fam, 28, 1 + i % 3))
      else (i.toLong, 1000L + i, words(20 + i, s"f$i"))
    }
    val expected = batchPairs(rows, minEst = 0.5)
    assert(expected.nonEmpty, "fixture must produce at least one near-dup pair")
    val (input, query) = startPairs("nd_equiv", horizonMs = 600000L)
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      assert(got("nd_equiv") == expected, s"stream ${got("nd_equiv")} != batch $expected")
    } finally { query.stop() }
  }

  test("state is pruned at the horizon: an expired doc no longer pairs") {
    val (input, query) = startPairs("nd_horizon", horizonMs = 5000L)
    try {
      input.addData((1L, 1000L, doc(1, 30, 1)))
      query.processAllAvailable()
      // advance the watermark far past 1000+5000 (two batches: the watermark
      // used by batch N is computed at the end of batch N-1)
      input.addData((50L, 200000L, words(22, "adv1")))
      query.processAllAvailable()
      input.addData((51L, 300000L, words(22, "adv2")))
      query.processAllAvailable()
      // near-identical to doc 1, but doc 1's entries expired at 6000
      input.addData((2L, 310000L, doc(2, 30, 1)))
      query.processAllAvailable()
      assert(got("nd_horizon").isEmpty, s"expired doc still paired: ${got("nd_horizon")}")
    } finally { query.stop() }
  }

  test("bucket cap bounds comparisons: identical docs only pair with the stored first") {
    // identical text -> identical signatures -> every pair's first shared
    // band is band 0, whose bucket (cap=1) stores only the first arrival:
    // (1,2) and (1,3) emit there, (2,3) cannot emit anywhere (deterministic —
    // with near-identical-but-distinct docs a band where doc 1's signature
    // differs could legitimately store doc 2 and surface (2,3))
    val (input, query) = startPairs("nd_cap", horizonMs = 600000L, bucketCap = 1)
    try {
      input.addData((1L, 1000L, words(30)))
      query.processAllAvailable()
      input.addData((2L, 2000L, words(30)))
      query.processAllAvailable()
      input.addData((3L, 3000L, words(30)))
      query.processAllAvailable()
      assert(got("nd_cap") == Set((1L, 2L), (1L, 3L)), s"got ${got("nd_cap")}")
    } finally { query.stop() }
  }
}
