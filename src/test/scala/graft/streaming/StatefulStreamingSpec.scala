package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Custom-state streaming: event-time sessionization with a gap timeout —
  * sessions close either by a later event past the gap or by the watermark
  * passing the idle deadline. Both implementations (flatMapGroupsWithState
  * and the Spark 4.x transformWithState/StatefulProcessor form) run the same
  * scenarios. */
class StatefulStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      // transformWithState requires the RocksDB provider; fMGWS runs on any
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private type Sessionizer = (Dataset[Sessionize.Event], Long) => Dataset[Sessionize.Session]
  private val impls: Seq[(String, Sessionizer)] = Seq(
    "fmgws" -> (Sessionize.sessions(_, _)),
    "tws" -> (Sessionize.sessionsTws(_, _)))

  private def gapAndTimeoutScenario(name: String, sessionize: Sessionizer): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "0 seconds")
      .as[Sessionize.Event]

    val out = sessionize(events, 1000L)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // user 1: two bursts separated by > gap; user 2: one burst
    input.addData((1L, 1000L, 1.0), (1L, 1200L, 2.0), (2L, 1100L, 5.0))
    query.processAllAvailable()
    // second burst for user 1 closes their first session inline
    input.addData((1L, 5000L, 3.0))
    query.processAllAvailable()
    val afterGap = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    // user 1's first session closed inline by the gap; user 2's may already be
    // closed by the watermark (now 5000, past their 2100 deadline); user 1's
    // second session (deadline 6000) must still be open
    assert(afterGap.contains(Sessionize.Session(1L, 1000L, 1200L, 2L, 3.0)), s"got $afterGap")
    assert(!afterGap.exists(s => s.user_id == 1L && s.start == 5000L),
      s"user 1's second session closed too early: $afterGap")

    // advancing the watermark far past every deadline times out the idle
    // sessions (user 2's burst and user 1's second burst)
    input.addData((99L, 100000L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0.0))
    query.processAllAvailable()
    val all = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    query.stop()

    assert(all.contains(Sessionize.Session(2L, 1100L, 1100L, 1L, 5.0)), s"user 2 session missing: $all")
    assert(all.contains(Sessionize.Session(1L, 5000L, 5000L, 1L, 3.0)), s"user 1 second session missing: $all")
  }

  private def outOfOrderScenario(name: String, sessionize: Sessionizer): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "10 seconds")
      .as[Sessionize.Event]
    val out = sessionize(events, 1000L)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    input.addData((7L, 2000L, 1.0), (7L, 1500L, 1.0), (7L, 2400L, 1.0))
    query.processAllAvailable()
    input.addData((7L, 9000L, 9.0)) // past the gap: closes the merged session
    query.processAllAvailable()
    val got = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    query.stop()
    assert(got == Set(Sessionize.Session(7L, 1500L, 2400L, 3L, 3.0)), s"got $got")
  }

  private def crossBatchBackwardScenario(name: String, sessionize: Sessionizer): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "10 seconds")
      .as[Sessionize.Event]
    val out = sessionize(events, 1000L)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // a LATER batch delivers an in-watermark event older than the open
    // session's first event: the session must extend backwards (start=1500)
    input.addData((9L, 2000L, 1.0))
    query.processAllAvailable()
    input.addData((9L, 1500L, 2.0))
    query.processAllAvailable()
    input.addData((9L, 9000L, 9.0)) // past the gap: closes the merged session
    query.processAllAvailable()
    val got = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    query.stop()
    assert(got == Set(Sessionize.Session(9L, 1500L, 2000L, 2L, 3.0)), s"got $got")
  }

  private def crossBatchSeparateScenario(name: String, sessionize: Sessionizer): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "10 seconds")
      .as[Sessionize.Event]
    val out = sessionize(events, 1000L)
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()

    // a later batch delivers in-watermark events a FULL GAP older than the
    // open session: they must form their own (immediately closed) session —
    // merging them would put >gap between events of one session
    input.addData((11L, 5000L, 5.0))
    query.processAllAvailable()
    input.addData((11L, 1500L, 1.0), (11L, 1600L, 2.0))
    query.processAllAvailable()
    val early = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    assert(early.contains(Sessionize.Session(11L, 1500L, 1600L, 2L, 3.0)),
      s"late pair must close as its own session, got $early")
    input.addData((11L, 9000L, 9.0)) // past the gap: closes the 5000 session
    query.processAllAvailable()
    val all = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session].collect().toSet
    query.stop()
    assert(all.contains(Sessionize.Session(11L, 5000L, 5000L, 1L, 5.0)), s"got $all")
  }

  impls.foreach { case (impl, fn) =>
    test(s"[$impl] sessions close on gap and on watermark timeout; state stays bounded per key") {
      gapAndTimeoutScenario(s"sessions_gap_$impl", fn)
    }
    test(s"[$impl] a later batch's events a full gap before the open session close separately") {
      crossBatchSeparateScenario(s"sessions_sep_$impl", fn)
    }
    test(s"[$impl] out-of-order events within the gap merge into one session") {
      outOfOrderScenario(s"sessions_ooo_$impl", fn)
    }
    test(s"[$impl] a later batch's older in-watermark event extends the session backwards") {
      crossBatchBackwardScenario(s"sessions_back_$impl", fn)
    }
    test(s"[$impl] streaming sessions equal the batch gaps-and-islands formulation on seeded random data") {
      batchEquivalenceScenario(s"sessions_eqv_$impl", fn)
    }
  }

  /** Seeded random events for many users, delivered across three micro-batches
    * sliced by TIME (shuffled within each slice): the streaming operator
    * closes all-but-the-latest session per key eagerly within a micro-batch,
    * so batch equivalence is guaranteed exactly when arrival order respects
    * event-time across batches — how a watermarked source delivers. (Events
    * older than an already-closed session intentionally form their own
    * session: the crossBatchSeparate scenario.) A far-future sentinel then
    * advances the watermark past every last+gap so all open sessions close.
    * The emitted set must equal [[Sessionize.sessionsBatch]] on the same
    * rows. */
  private def batchEquivalenceScenario(name: String, sessionize: Sessionizer): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val rnd = new scala.util.Random(20260813L)
    val rows = Seq.fill(400)((rnd.nextInt(20).toLong,
      rnd.nextInt(100000).toLong, rnd.nextInt(10).toDouble))
    val sentinel = (999L, 500000L, 0.0)

    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "200 seconds") // > the 100 s range: nothing is late
      .as[Sessionize.Event]
    val query = sessionize(events, 1000L).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    rows.sortBy(_._2).grouped(150).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    input.addData(sentinel) // wm -> 300 s, past every last + gap
    query.processAllAvailable()
    val streamed = sp.sql(s"SELECT * FROM $name").as[Sessionize.Session]
      .collect().filter(_.user_id != 999L)
      .map(s => (s.user_id, s.start, s.end, s.n_events,
        math.round(s.total * 1e6))).toSet

    val batch = Sessionize.sessionsBatch(
      rows.toDF("user_id", "ts", "value").as[Sessionize.Event], 1000L)
      .collect()
      .map(s => (s.user_id, s.start, s.end, s.n_events,
        math.round(s.total * 1e6))).toSet
    query.stop()
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
