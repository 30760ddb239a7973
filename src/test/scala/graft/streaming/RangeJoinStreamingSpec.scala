package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream range join: the native watermarked interval join must
  * reproduce the batch RangeJoin.bucketed pairs exactly — same half-open
  * bounds, once-per-pair emission, under shuffled arrival across
  * micro-batches. */
class RangeJoinStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val Lo = -5000L
  private val Hi = 5000L

  private def startQuery(name: String, delay: String) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val lIn = MemoryStream[(Long, Long, Long)] // (user_id, e_ms, event_id)
    val rIn = MemoryStream[(Long, Long, Double)] // (f_user, f_ms, value)
    val l = lIn.toDF().toDF("user_id", "e_ms", "event_id")
      .withColumn("e_ts", timestamp_millis(col("e_ms")))
      .withWatermark("e_ts", delay)
    val r = rIn.toDF().toDF("f_user", "f_ms", "value")
      .withColumn("f_ts", timestamp_millis(col("f_ms")))
      .withWatermark("f_ts", delay)
    val query = StreamingRangeJoin.joined(l, r, "user_id", "f_user", "e_ts", "f_ts", Lo, Hi)
      .select(col("event_id"), col("user_id"), col("e_ms"), col("f_ms"), col("value"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (lIn, rIn, query)
  }

  private def results(name: String): Set[(Long, Long, Long, Long, Double)] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[(Long, Long, Long, Long, Double)].collect().toSet
  }

  test("half-open bounds: at-lo in, at-hi out; cross-key never joins") {
    val (lIn, rIn, query) = startQuery("rj_bounds", "0 seconds")
    lIn.addData((1L, 10000L, 100L), (2L, 10000L, 200L))
    // at lo (10000-5000=5000) joins; at hi (15000) does not (strict <);
    // hi-1 joins; other key never
    rIn.addData((1L, 5000L, 1.0), (1L, 15000L, 2.0), (1L, 14999L, 3.0), (3L, 10000L, 9.0))
    query.processAllAvailable()
    lIn.addData((99L, 900000L, 0L)); rIn.addData((99L, 900000L, 0.0))
    query.processAllAvailable()
    val got = results("rj_bounds").filterNot(_._2 == 99L) // drop the wm advancers
    query.stop()
    assert(got == Set(
      (100L, 1L, 10000L, 5000L, 1.0),
      (100L, 1L, 10000L, 14999L, 3.0)), s"got $got")
  }

  test("streaming pairs equal batch RangeJoin.bucketed on seeded random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260815L)
    val lefts = (1 to 400).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(120_000).toLong, i.toLong))
    val rights = (1 to 600).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(120_000).toLong, i.toDouble))
    val (lIn, rIn, query) = startQuery("rj_eqv", "10 seconds")
    // watermark-respecting interleaved delivery, shuffled within batches
    val lBatches = lefts.sortBy(_._2).grouped(80).map(rnd.shuffle(_)).toSeq
    val rBatches = rights.sortBy(_._2).grouped(120).map(rnd.shuffle(_)).toSeq
    lBatches.zipAll(rBatches, Nil, Nil).foreach { case (lb, rb) =>
      if (lb.nonEmpty) lIn.addData(lb: _*)
      if (rb.nonEmpty) rIn.addData(rb: _*)
      query.processAllAvailable()
    }
    lIn.addData((99L, 900000L, 0L)); rIn.addData((99L, 900000L, 0.0))
    query.processAllAvailable()
    lIn.addData((99L, 999000L, 0L)); rIn.addData((99L, 999000L, 0.0))
    query.processAllAvailable()
    val streamed = results("rj_eqv").filterNot(_._2 == 99L)
    query.stop()
    val batch = graft.ops.RangeJoin.bucketed(
        lefts.toDF("user_id", "e_ms", "event_id"),
        rights.toDF("f_user", "f_ms", "value"),
        "user_id", "f_user", "e_ms", "f_ms", Lo, Hi)
      .select(col("event_id"), col("user_id"), col("e_ms"), col("f_ms"), col("value"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
