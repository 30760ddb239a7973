package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dedup: keep-first within/across micro-batches, duplicate
  * counting, horizon expiry re-opening a key, and bounded state via the
  * watermark (dropDuplicatesWithinWatermark tier). */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("firstSeen: dedups within and across batches, counts dups, expires the horizon") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(String, Long, String)]
    val records = input.toDF().toDF("key", "ts", "payload")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "0 seconds")
      .select(col("key"), col("ts"), col("payload"))
      .as[StreamingDedup.KeyedRecord]

    val out = StreamingDedup.firstSeen(records, horizonMs = 10000L)
    val query = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()

    // batch 1: key a twice (in-batch dup, earliest ts wins), key b once
    input.addData(("a", 1000L, "a-late"), ("a", 500L, "a-first"), ("b", 700L, "b-first"))
    query.processAllAvailable()
    // batch 2: more dups for a and b — suppressed, counted
    input.addData(("a", 2000L, "a-dup2"), ("b", 900L, "b-dup"), ("b", 950L, "b-dup2"))
    query.processAllAvailable()

    val firsts = sp.sql("SELECT * FROM sdedup WHERE is_first").as[StreamingDedup.DedupResult]
      .collect().toSet
    assert(firsts == Set(
      StreamingDedup.DedupResult("a", "a-first", 0L, is_first = true),
      StreamingDedup.DedupResult("b", "b-first", 0L, is_first = true)), s"got $firsts")

    // advance the watermark past both horizons (a: 10500, b: 10700) — the
    // expiry stats report the suppressed counts (a: 2, b: 2)
    input.addData(("z", 50000L, "wm-push"))
    query.processAllAvailable()
    input.addData(("z2", 60000L, "wm-push2"))
    query.processAllAvailable()

    val stats = sp.sql("SELECT * FROM sdedup WHERE NOT is_first").as[StreamingDedup.DedupResult]
      .collect().toSet
    assert(stats == Set(
      StreamingDedup.DedupResult("a", "a-first", 2L, is_first = false),
      StreamingDedup.DedupResult("b", "b-first", 2L, is_first = false)), s"got $stats")

    // after expiry the key re-opens: a fresh "a" is first again
    input.addData(("a", 70000L, "a-reopened"))
    query.processAllAvailable()
    val reopened = sp.sql("SELECT * FROM sdedup WHERE payload = 'a-reopened'")
      .as[StreamingDedup.DedupResult].collect().toSeq
    query.stop()
    assert(reopened == Seq(StreamingDedup.DedupResult("a", "a-reopened", 0L, is_first = true)))
  }

  test("firstSeen: key with no duplicates emits no stats row on expiry") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(String, Long, String)]
    val records = input.toDF().toDF("key", "ts", "payload")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "0 seconds")
      .select(col("key"), col("ts"), col("payload"))
      .as[StreamingDedup.KeyedRecord]

    val query = StreamingDedup.firstSeen(records, horizonMs = 1000L)
      .writeStream.format("memory").queryName("sdedup2").outputMode("append").start()

    input.addData(("solo", 100L, "only"))
    query.processAllAvailable()
    input.addData(("z", 99000L, "wm"))
    query.processAllAvailable()
    input.addData(("z2", 99900L, "wm2"))
    query.processAllAvailable()
    val rows = sp.sql("SELECT * FROM sdedup2 WHERE key = 'solo'")
      .as[StreamingDedup.DedupResult].collect().toSeq
    query.stop()
    assert(rows == Seq(StreamingDedup.DedupResult("solo", "only", 0L, is_first = true)))
  }

  test("exact tier: dropDuplicatesWithinWatermark keeps first per key") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(String, Long, String)]
    val df = input.toDF().toDF("key", "ts", "payload")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "5 seconds")

    val query = StreamingDedup.exact(df, Seq("key"))
      .select(col("key"), col("payload"))
      .writeStream.format("memory").queryName("sdedup3").outputMode("append").start()

    input.addData(("k1", 1000L, "v1"), ("k2", 1500L, "v2"))
    query.processAllAvailable()
    input.addData(("k1", 2000L, "v1-dup"), ("k3", 2500L, "v3"))
    query.processAllAvailable()
    val rows = sp.sql("SELECT key, payload FROM sdedup3").as[(String, String)].collect().toSet
    query.stop()
    assert(rows == Set(("k1", "v1"), ("k2", "v2"), ("k3", "v3")), s"got $rows")
  }
}
