package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming image/pHash near-dup (StreamingPhashNearDup) — the online twin
  * of mm06/mm08's banded hamming-≤1 relation, run through
  * StreamingNearDup's SHARED band-bucket processor (only the 2×4 geometry
  * and the exact-Hamming verify differ).
  *
  * Pins:
  *  (1) the fixture corpus split across three micro-batches produces pair
  *      verdicts whose per-doc rollup equals the batch mm08 summary
  *      EXACTLY (n_exact / n_near / is_canonical for all docs) — exact
  *      equality, not an estimate, because the stored vector IS the full
  *      level vector;
  *  (2) once-per-pair emission across the two bands (a hamming-0 pair
  *      collides in BOTH buckets but must be emitted once — implied by
  *      (1), asserted directly on the raw pair multiset);
  *  (3) the event-time horizon prunes state through the pHash path (an
  *      identical payload re-arriving beyond the horizon is NOT flagged).
  */
class PhashStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  private def startPairs(name: String, horizonMs: Long, bucketCap: Int = 4096) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamingPhashNearDup.pairs(df, col("doc_id"), col("ts"),
        encode(col("text"), "UTF-8"), horizonMs, bucketCap = bucketCap)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  test("streamed verdicts over three micro-batches equal the batch mm08 summary exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    // ts ascending with doc_id so the 0-delay watermark never drops a row;
    // offset past 0 — a row AT the initial watermark (ets = epoch 0) is
    // dropped as late before the stateful operator ever sees it
    val rows = docs.map { case (id, txt) => (id, id + 1000L, txt) }
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    assert(batches.length == 3)

    val (input, query) = startPairs("phash_tie", horizonMs = 1L << 40)
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val pairs = spark.sql("SELECT doc_a, doc_b, hamming FROM phash_tie")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      // (2) once per pair: the raw multiset has no duplicate (a, b)
      val keys = pairs.map(p => (p._1, p._2)).toSeq
      assert(keys.distinct.length == keys.length,
        s"duplicate emissions: ${keys.groupBy(identity).filter(_._2.length > 1).keys.take(5)}")

      // (1) per-doc rollup == batch mm08 over the same corpus
      val exactBy = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val nearBy = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val nonCanonical = scala.collection.mutable.Set.empty[Long]
      pairs.foreach { case (a, b, h) =>
        if (h == 0.0) {
          exactBy(a) += 1; exactBy(b) += 1
          nonCanonical += b // pairs are (min, max): the larger loses
        } else {
          nearBy(a) += 1; nearBy(b) += 1
        }
      }
      val streamed = docs.map { case (id, _) =>
        (id, exactBy(id), nearBy(id), !nonCanonical.contains(id))
      }.toSeq
      val batch = graft.SparkEntry.queries("mm08_phash_summary")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
      assert(streamed == batch,
        streamed.zip(batch).filter { case (s, b) => s != b }.take(5).toString)
    } finally query.stop()
  }

  test("identical payload beyond the horizon is not flagged; within, it is") {
    val payload = "the same media payload bytes arriving twice on the stream"
    // pruning is WATERMARK-driven (cleanup timers), not arrival-driven:
    // the filler batches advance the watermark past the stored entries'
    // expiry so their timers actually fire before the late re-arrival —
    // without them a stale entry is still in state when the next arrival
    // probes the bucket (the documented lazy-pruning semantics shared
    // with the MinHash twin)
    val filler = "a completely different and much longer filler payload " * 3
    val (input, query) = startPairs("phash_horizon", horizonMs = 1000L)
    try {
      input.addData((1L, 1000L, payload))
      query.processAllAvailable()
      input.addData((2L, 1500L, payload)) // inside the horizon: flagged
      query.processAllAvailable()
      input.addData((90L, 5000L, filler)) // watermark -> 5000 (> expiries)
      query.processAllAvailable()
      input.addData((91L, 6000L, filler + "x")) // timers fire this batch
      query.processAllAvailable()
      input.addData((4L, 6500L, payload)) // 1 & 2 pruned: not flagged
      query.processAllAvailable()
      val ids = Set(1L, 2L, 4L)
      val got = spark.sql("SELECT doc_a, doc_b FROM phash_horizon")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter(p => ids(p._1) || ids(p._2)).toSet
      assert(got == Set((1L, 2L)), got.toString)
    } finally query.stop()
  }
}
