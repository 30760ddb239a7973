package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming composition: the operators this library ships are
  * useful only if they CHAIN — one micro-batch pipeline running
  * jsonata-transform (drop tombstones) → watermark → streaming dedup →
  * sessionization, all in a single query. */
class StreamingPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("transform -> dedup -> sessionize in one streaming query") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    // (user, ts, event_id, kind, value) with duplicate event_ids and a
    // tombstone kind the jsonata stage drops
    val input = MemoryStream[(Long, Long, String, String, Double)]
    val raw = input.toDF().toDF("user_id", "ts", "event_id", "kind", "value")

    // stage 1: the reference's operator — tombstone-drop + projection — on
    // the compiled-friendly tier via the Dataset API
    val cleaned = graft.spark.JsonataDF.transform(
      raw, "value.kind = 'drop' ? null : {'user_id': value.user_id, 'ts': value.ts, " +
        "'event_id': value.event_id, 'value': value.value}")
    val typed = cleaned
      .select(from_json(col("out"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, ts BIGINT, event_id STRING, value DOUBLE")).as("r"))
      .select(col("r.user_id"), col("r.ts"), col("r.event_id"), col("r.value"))

    // stage 2: watermark + exact dedup on event_id within the horizon
    val deduped = StreamingDedup.exact(
      typed.withColumn("ets", timestamp_millis(col("ts"))).withWatermark("ets", "1 second"),
      Seq("event_id"))

    // stage 3: gap sessionization over the surviving events (the watermarked
    // `ets` column must stay in scope for the event-time timeout; as[Event]
    // tolerates the extra column)
    val sessions = Sessionize.sessions(
      deduped.select(col("user_id"), col("ts"), col("value"), col("ets"))
        .as[Sessionize.Event], 1000L)

    val query = sessions.writeStream.format("memory").queryName("pipe")
      .outputMode("append").start()

    input.addData(
      (1L, 1000L, "e1", "ok", 1.0),
      (1L, 1000L, "e1", "ok", 1.0),   // duplicate event_id -> dropped by dedup
      (1L, 1200L, "e2", "ok", 2.0),
      (1L, 1300L, "e3", "drop", 9.0), // tombstone -> dropped by jsonata stage
      (2L, 1100L, "e4", "ok", 5.0))
    query.processAllAvailable()
    // close user 1's session by exceeding the gap, then push the watermark
    input.addData((1L, 5000L, "e5", "ok", 3.0))
    query.processAllAvailable()
    input.addData((9L, 100000L, "e9", "ok", 0.0))
    query.processAllAvailable()
    input.addData((9L, 200000L, "e10", "ok", 0.0))
    query.processAllAvailable()
    val out = sp.sql("SELECT * FROM pipe").as[Sessionize.Session].collect().toSet
    query.stop()

    // user 1's first session: e1 (once, not twice) + e2; the tombstone never
    // reached state; user 2's lone event is its own session
    assert(out.contains(Sessionize.Session(1L, 1000L, 1200L, 2L, 3.0)), s"got $out")
    assert(out.contains(Sessionize.Session(2L, 1100L, 1100L, 1L, 5.0)), s"got $out")
    assert(out.contains(Sessionize.Session(1L, 5000L, 5000L, 1L, 3.0)), s"got $out")
  }
}
