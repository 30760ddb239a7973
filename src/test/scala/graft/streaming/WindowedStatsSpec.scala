package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Windowed ingest stats: append-mode finalization on watermark, late-row
  * drop, per-group isolation, and sliding-window multi-assignment. */
class WindowedStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // (doc_id, ts-millis, lang, tokens, quality)
  private type Doc = (Long, Long, String, Long, Double)

  private def stream(input: MemoryStream[Doc]) =
    input.toDF().toDF("doc_id", "ts", "lang", "tokens", "quality")
      .withColumn("ets", timestamp_millis(col("ts")))

  test("tumbling: windows finalize on watermark; late rows are dropped") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Doc]
    val out = WindowedStats.docStats(stream(input), width = "10 seconds", delay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("wstats")
      .outputMode("append").start()

    // window [0,10): two en docs + one de doc; window [10,20): one en doc
    input.addData((1L, 1000L, "en", 10L, 0.8), (2L, 4000L, "en", 30L, 0.6),
      (3L, 7000L, "de", 5L, 0.9), (4L, 12000L, "en", 7L, 0.5))
    query.processAllAvailable()
    // watermark is now 12s: [0,10) finalized, [10,20) still open
    val closed = sp.sql("SELECT lang, n_docs, n_tokens, min_quality, avg_quality FROM wstats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(closed == Set(("en", 2L, 40L, 0.6, 0.7), ("de", 1L, 5L, 0.9, 0.9)), s"got $closed")

    // a row for the CLOSED [0,10) window arrives behind the watermark: dropped
    input.addData((5L, 2000L, "en", 99L, 0.1))
    query.processAllAvailable()
    // push the watermark past [10,20) so it finalizes — without the late row
    input.addData((6L, 25000L, "en", 1L, 1.0))
    query.processAllAvailable()
    val all = sp.sql("SELECT lang, n_docs, n_tokens FROM wstats ORDER BY n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    query.stop()
    // [0,10) en still 40 tokens (late 99 dropped); [10,20) en = 7 tokens
    assert(all == Seq(("de", 1L, 5L), ("en", 1L, 7L), ("en", 2L, 40L)), s"got $all")
  }

  test("sliding: a row lands in width/slide overlapping windows") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[Doc]
    val out = WindowedStats.docStats(stream(input),
      width = "10 seconds", slide = Some("5 seconds"), delay = "0 seconds")
    val query = out.writeStream.format("memory").queryName("wslide")
      .outputMode("append").start()

    // ts=7s lands in [0,10) and [5,15); finalize both by pushing wm to 30s
    input.addData((1L, 7000L, "en", 10L, 0.8))
    query.processAllAvailable()
    input.addData((2L, 30000L, "en", 1L, 1.0))
    query.processAllAvailable()
    val wins = sp.sql("SELECT win_start, n_docs, n_tokens FROM wslide WHERE n_tokens = 10")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
    query.stop()
    assert(wins == Set((0L, 1L, 10L), (5000L, 1L, 10L)), s"got $wins")
  }
}
