package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static enrichment: per-batch stateless dim join (no stream-side
  * join state), UNKNOWN bucket for dim misses, append-mode window
  * finalization, and batch-twin equality on seeded shuffled data. */
class EnrichStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // (event_id, ts-millis, user_id, value)
  private type Ev = (Long, Long, Long, Double)

  private def stream(input: MemoryStream[Ev]) =
    input.toDF().toDF("event_id", "ts", "user_id", "value")
      .withColumn("ets", timestamp_millis(col("ts")))

  private def dim = {
    val sp = spark
    import sp.implicits._
    Seq((1L, "AUTO"), (2L, "RETAIL"), (3L, "AUTO"))
      .toDF("c_custkey", "c_mktsegment")
  }

  test("windows enrich against the dim, finalize on watermark; misses land in UNKNOWN") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingEnrich.segmentRollup(stream(input), dim,
      width = "10 seconds", delay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()

    // window [0,10): users 1,3 = AUTO, user 2 = RETAIL, user 99 misses the dim
    input.addData((10L, 1000L, 1L, 5.0), (11L, 2000L, 3L, 7.0),
      (12L, 3000L, 2L, 2.0), (13L, 4000L, 99L, 1.0), (14L, 12000L, 1L, 9.0))
    query.processAllAvailable()
    val closed = sp.sql("SELECT segment, n, sum_value FROM enrich")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(closed == Set(("AUTO", 2L, 12.0), ("RETAIL", 1L, 2.0), ("UNKNOWN", 1L, 1.0)),
      s"got $closed")

    // late row behind the watermark for the closed window: dropped, not re-emitted
    input.addData((15L, 2500L, 1L, 100.0))
    query.processAllAvailable()
    input.addData((16L, 25000L, 2L, 1.0)) // advance wm past [10,20)
    query.processAllAvailable()
    val all = sp.sql("SELECT segment, n, sum_value FROM enrich ORDER BY sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    query.stop()
    assert(all == Seq(("UNKNOWN", 1L, 1.0), ("RETAIL", 1L, 2.0),
      ("AUTO", 1L, 9.0), ("AUTO", 2L, 12.0)), s"got $all")
  }

  test("stream-static join is stateless: only the window aggregation carries state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingEnrich.segmentRollup(stream(input), dim,
      width = "10 seconds", delay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("enrich_state")
      .outputMode("append").start()
    input.addData((1L, 1000L, 1L, 1.0))
    query.processAllAvailable()
    val progress = query.lastProgress
    // exactly ONE stateful operator (stateStoreSave for the window agg) —
    // a stream-stream join would add its own state store
    val ops = progress.stateOperators.map(_.operatorName).toSeq
    query.stop()
    assert(ops == Seq("stateStoreSave"), s"got $ops")
  }

  test("batch-twin equality on seeded shuffled data") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val rnd = new scala.util.Random(42)
    val evs = (1 to 200).map { i =>
      (i.toLong, rnd.nextInt(60000).toLong, rnd.nextInt(6).toLong, rnd.nextInt(100) / 10.0)
    }
    val shuffled = rnd.shuffle(evs)

    val input = MemoryStream[Ev]
    val out = StreamingEnrich.segmentRollup(stream(input), dim,
      width = "10 seconds", delay = "2 minutes")
    val query = out.writeStream.format("memory").queryName("enrich_twin")
      .outputMode("complete").start()
    shuffled.grouped(37).foreach { chunk =>
      input.addData(chunk: _*); query.processAllAvailable()
    }
    val streamed = sp.sql("SELECT win_start, segment, n, sum_value FROM enrich_twin")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6))).toSet

    val batch = StreamingEnrich.segmentRollupBatch(
      evs.toDF("event_id", "ts", "user_id", "value")
        .withColumn("ets", timestamp_millis(col("ts"))),
      dim, width = "10 seconds")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(2), r.getLong(3),
        math.round(r.getDouble(4) * 1e6))).toSet
    query.stop()
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
  }
}
