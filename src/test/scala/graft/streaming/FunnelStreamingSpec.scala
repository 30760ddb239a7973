package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingFunnel.{FunnelEvent, StepHit}

/** Streaming ordered funnel: greedy step alignment identical to ev01's batch
  * funnel (earliest step-1, then earliest step-2 at/after it, ...), emission
  * watermark-gated and append-final, order-insensitive within the watermark
  * horizon — and exact equality vs the batch per-step-join reference on
  * seeded random data under shuffled arrival. */
class FunnelStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Steps = Seq("view", "click", "purchase")
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

  private def startQuery(name: String, delay: String, gaps: Seq[Long] = Nil,
                         steps: Seq[String] = null) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF().toDF("user_id", "ts", "event_type")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[FunnelEvent]
    val query = StreamingFunnel.funnel(events, Option(steps).getOrElse(Steps), gaps)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[StepHit] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[StepHit].collect().toSet
  }

  private def drain(input: MemoryStream[(Long, Long, String)],
                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData((9999L, 10_000_000L, "noise"))
    query.processAllAvailable()
    input.addData((9999L, 20_000_000L, "noise"))
    query.processAllAvailable()
  }

  test("greedy alignment: a step-2 event before the aligned step-1 never binds") {
    val (input, query) = startQuery("funnel_greedy", "0 seconds")
    // click@500 precedes the earliest view@1000 -> batch excludes it
    // (min click >= 1000); the click@2000 binds; purchase@1500 < t2 -> no,
    // purchase@3000 binds
    input.addData((1L, 500L, "click"), (1L, 1000L, "view"), (1L, 2000L, "click"),
      (1L, 1500L, "purchase"), (1L, 3000L, "purchase"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("funnel_greedy")
    query.stop()
    assert(got == Set(
      StepHit(1L, 1, "view", 1000L),
      StepHit(1L, 2, "click", 2000L),
      StepHit(1L, 3, "purchase", 3000L)), s"got $got")
  }

  test("same-millisecond step chain binds (batch >= comparisons)") {
    val (input, query) = startQuery("funnel_tie", "0 seconds")
    input.addData((2L, 1000L, "purchase"), (2L, 1000L, "view"), (2L, 1000L, "click"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("funnel_tie")
    query.stop()
    assert(got == Set(
      StepHit(2L, 1, "view", 1000L),
      StepHit(2L, 2, "click", 1000L),
      StepHit(2L, 3, "purchase", 1000L)), s"got $got")
  }

  test("out-of-order arrival across micro-batches aligns by event time, not arrival") {
    val (input, query) = startQuery("funnel_ooo", "60 seconds")
    // the click arrives FIRST (earlier batch) but its event time is after
    // the view that arrives later — an arrival-order automaton would skip it
    input.addData((3L, 5000L, "click"))
    query.processAllAvailable()
    input.addData((3L, 4000L, "view"))
    query.processAllAvailable()
    assert(results("funnel_ooo").isEmpty, "emission must wait for the watermark")
    drain(input, query)
    val got = results("funnel_ooo")
    query.stop()
    assert(got == Set(
      StepHit(3L, 1, "view", 4000L),
      StepHit(3L, 2, "click", 5000L)), s"got $got")
  }

  test("emissions are final: a later same-type better event never re-emits a bound step") {
    val (input, query) = startQuery("funnel_final", "0 seconds")
    input.addData((4L, 1000L, "view"), (4L, 2000L, "click"))
    query.processAllAvailable()
    drain(input, query) // both steps ripen and emit
    // a second click after the watermark: step 2 is already bound at 2000
    input.addData((4L, 30_000_000L, "click"))
    query.processAllAvailable()
    input.addData((9999L, 40_000_000L, "noise"))
    query.processAllAvailable()
    input.addData((9999L, 50_000_000L, "noise"))
    query.processAllAvailable()
    val got = results("funnel_final")
    query.stop()
    assert(got == Set(
      StepHit(4L, 1, "view", 1000L),
      StepHit(4L, 2, "click", 2000L)), s"got $got")
  }

  test("conversion windows: a step past its window never binds, even with no later candidate") {
    val (input, query) = startQuery("funnel_win", "0 seconds", Seq(1000L, 1000L))
    // view@1000; click@2000 is exactly AT the window end (1000+1000) ->
    // binds; purchase@3500 is 1500 past the click -> outside its 1000 ms
    // window -> never binds
    input.addData((6L, 1000L, "view"), (6L, 2000L, "click"), (6L, 3500L, "purchase"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("funnel_win")
    query.stop()
    assert(got == Set(
      StepHit(6L, 1, "view", 1000L),
      StepHit(6L, 2, "click", 2000L)), s"got $got")
  }

  test("conversion windows: an in-window LATER candidate does not rescue a skipped early one") {
    val (input, query) = startQuery("funnel_win2", "0 seconds", Seq(1000L, 1000L))
    // click@500 precedes the view -> skipped; click@1500 in window binds;
    // click@2500 would also be in no window (step already bound) — final
    input.addData((7L, 500L, "click"), (7L, 1000L, "view"),
      (7L, 1500L, "click"), (7L, 2500L, "click"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("funnel_win2")
    query.stop()
    assert(got == Set(
      StepHit(7L, 1, "view", 1000L),
      StepHit(7L, 2, "click", 1500L)), s"got $got")
  }

  test("pre-epoch (negative) event times never reach the processor — the engine's watermark floor") {
    // Spark's watermark initializes at 0, so negative-event-time rows are
    // dropped by the late filter before any state is touched. This pins the
    // boundary the windowEnd saturation guard (StreamingFunnel) defends:
    // aligned times are always admitted times (> 0), so the guard's
    // negative-prev overflow case cannot arise end-to-end — it is kept as
    // defense in depth, and this test documents WHY it is unreachable.
    val (input, query) = startQuery("funnel_neg", "0 seconds", Seq(1000L, 1000L))
    input.addData((8L, -5000L, "view"), (8L, -1000L, "click"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("funnel_neg")
    query.stop()
    assert(got.isEmpty, s"negative-ts events must be dropped as late; got $got")
  }

  test("windowed streaming funnel equals the windowed batch reference on seeded random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260814L)
    val types = Vector("view", "click", "purchase", "scroll")
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(40).toLong + 1L, rnd.nextInt(200_000).toLong,
        types(rnd.nextInt(types.length)))
    }
    val gaps = Seq(20_000L, 60_000L)
    val (input, query) = startQuery("funnel_weqv", "10 seconds", gaps)
    rows.sortBy(_._2).grouped(150).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    drain(input, query)
    val streamed = results("funnel_weqv").filterNot(_.user_id == 9999L)
    query.stop()
    val batch = StreamingFunnel.batchReference(
        rows.toDF("user_id", "ts", "event_type"), Steps, gaps)
      .as[StepHit].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }

  test("FOUR-step windowed funnel equals the batch reference (ev03's builder shape)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260815L)
    val steps4 = Seq("signup", "view", "click", "purchase")
    val types = Vector("signup", "view", "click", "purchase", "scroll")
    val rows = (1 to 2500).map { _ =>
      (rnd.nextInt(40).toLong + 1L, rnd.nextInt(200_000).toLong,
        types(rnd.nextInt(types.length)))
    }
    val gaps = Seq(50_000L, 20_000L, 60_000L)
    val (input, query) = startQuery("funnel_4eqv", "10 seconds", gaps, steps4)
    rows.sortBy(_._2).grouped(150).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    drain(input, query)
    val streamed = results("funnel_4eqv").filterNot(_.user_id == 9999L)
    query.stop()
    val batch = StreamingFunnel.batchReference(
        rows.toDF("user_id", "ts", "event_type"), steps4, gaps)
      .as[StepHit].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }

  test("streaming funnel equals the batch per-step-join reference on seeded random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260813L)
    val types = Vector("view", "click", "purchase", "scroll") // scroll = noise
    val rows = (1 to 2000).map { _ =>
      (rnd.nextInt(40).toLong + 1L, // 40 users -> multi-event histories
        rnd.nextInt(200_000).toLong, // 200 s span
        types(rnd.nextInt(types.length)))
    }
    val (input, query) = startQuery("funnel_eqv", "10 seconds")
    // watermark-respecting delivery: ts-sorted groups, shuffled WITHIN each
    // micro-batch (the 10 s delay absorbs the intra-batch disorder)
    rows.sortBy(_._2).grouped(150).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    drain(input, query)
    val streamed = results("funnel_eqv").filterNot(_.user_id == 9999L)
    query.stop()
    val batch = StreamingFunnel.batchReference(
        rows.toDF("user_id", "ts", "event_type"), Steps)
      .as[StepHit].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
