package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming probe twin of the stored ANN index (ss13/ss14).
  *
  * Pins: (1) EXACT equality with the ss14 batch answer on the same probe
  * set, with the queries split across micro-batches (the per-batch union
  * must equal the one-shot answer — queries are independent rows in every
  * serving stage); (2) the ss14 plan property SURVIVES foreachBatch: every
  * batch's plan serves from the stored aid-partitioned index with dynamic
  * partition pruning on the probed aids and never re-encodes the corpus;
  * (3) the stream side is stateless — no state store operators, the index
  * on disk is the only state. */
class AnnProbeStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private type Answer = (Long, Long, Double, Double, Int)

  test("micro-batched probes equal the ss14 batch answer; every batch prunes the index") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Long]
    val queries = input.toDF().toDF("q_id")

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Answer]()
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val query = StreamingAnnProbe.probeStream(queries, sfDir, (out, _) => {
      plans.add(out.queryExecution.executedPlan.toString)
      out.collect().foreach(r => rows.add(
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))))
    })
    try {
      // the ss14 probe set (vec_id % 100 == 0 over the sf0.01 corpus),
      // deliberately split across two micro-batches
      input.addData(0L, 100L)
      query.processAllAvailable()
      input.addData(200L, 300L, 400L)
      query.processAllAvailable()

      val streamed = rows.toArray(Array.empty[Answer]).toSet
      val batch = graft.SparkEntry.queries("ss14_ivf_probe")(sp, sfDir)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"stream/batch divergence:\n  only-stream=${streamed -- batch}\n  only-batch=${batch -- streamed}")

      // the ss14 plan pins, PER BATCH: stored index + dynamic pruning on
      // aid, never a re-encode, no sort-merge/cartesian on the corpus
      val ps = plans.toArray(Array.empty[String])
      assert(ps.length == 2, s"expected 2 batch plans, got ${ps.length}")
      ps.foreach { p =>
        assert(p.contains("graft_ivf_index"), "batch must scan the stored index\n" + p.take(2000))
        assert(p.contains("dynamicpruning"),
          "probed aids must prune index partitions inside foreachBatch\n" + p.take(2000))
        assert(!p.contains("pq_encode"), "a batch must never re-encode the corpus\n" + p.take(2000))
        assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
      }

      // stateless stream: the serving pipeline keeps no state store rows
      val progress = query.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        "the probe stream must be stateless (the stored index is the only state)")
    } finally query.stop()
  }

  test("an empty micro-batch serves nothing and does not fail") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Long]
    val queries = input.toDF().toDF("q_id")
    // AtomicInteger: the callback runs on the stream-execution thread and
    // the assertion reads on the test thread — a plain var has no
    // happens-before edge across processAllAvailable()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val query = StreamingAnnProbe.probeStream(queries, sfDir,
      (_, _) => { batches.incrementAndGet(): Unit })
    try {
      query.processAllAvailable() // zero-row start
      input.addData(300L)
      query.processAllAvailable()
      assert(batches.get() == 1, s"only the non-empty batch may serve, got ${batches.get()}")
    } finally query.stop()
  }
}
