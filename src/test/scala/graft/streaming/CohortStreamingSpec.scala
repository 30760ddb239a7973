package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingCohort.{PeriodHit, UserEvent}

/** Streaming cohort activation: the cohort binds from the watermark-replayed
  * FIRST event (never arrival order), each (user, period) emits exactly
  * once and append-final, state is capped — and the full output equals
  * ev05's batch distinct (user, cohort_week, period) relation on seeded
  * random data under shuffled arrival. */
class CohortStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  // small week so tests span many periods with small numbers
  private val Week = 1000L
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

  private def startQuery(name: String, delay: String, maxPeriods: Int = 1024) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "ts")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[UserEvent]
    val query = StreamingCohort.cohorts(events, Week, maxPeriods)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[PeriodHit] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[PeriodHit].collect().toSet
  }

  private def drain(input: MemoryStream[(Long, Long)],
                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData((9999L, 10_000_000L))
    query.processAllAvailable()
    input.addData((9999L, 20_000_000L))
    query.processAllAvailable()
  }

  test("cohort binds from the earliest EVENT TIME, not arrival order") {
    val (input, query) = startQuery("coh_order", "10 seconds")
    // the 5500 event arrives first; the true first event (1500, week 1)
    // arrives later but within the watermark horizon — the cohort must be 1
    input.addData((1L, 5500L))
    query.processAllAvailable()
    input.addData((1L, 1500L))
    query.processAllAvailable()
    drain(input, query)
    val got = results("coh_order").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(PeriodHit(1L, 1L, 0L), PeriodHit(1L, 1L, 4L)), s"got $got")
  }

  test("each (user, period) activates exactly once — duplicates within and across batches") {
    val (input, query) = startQuery("coh_once", "0 seconds")
    input.addData((2L, 1000L), (2L, 1100L), (2L, 3000L))
    query.processAllAvailable()
    input.addData((2L, 3500L), (2L, 9900L))
    query.processAllAvailable()
    drain(input, query)
    val got = results("coh_once").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(PeriodHit(2L, 1L, 0L), PeriodHit(2L, 1L, 2L), PeriodHit(2L, 1L, 8L)),
      s"got $got")
  }

  test("maxPeriods caps state: new periods beyond the cap are dropped") {
    val (input, query) = startQuery("coh_cap", "0 seconds", maxPeriods = 2)
    input.addData((3L, 1000L))
    query.processAllAvailable()
    input.addData((3L, 2500L))
    query.processAllAvailable()
    input.addData((3L, 4000L), (3L, 9000L)) // beyond the 2-period cap
    query.processAllAvailable()
    drain(input, query)
    val got = results("coh_cap").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(PeriodHit(3L, 1L, 0L), PeriodHit(3L, 1L, 1L)), s"got $got")
  }

  test("streaming equals the ev05 batch distinct relation on seeded shuffled data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260816L)
    val rows = (1 to 3000).map { _ =>
      (rnd.nextInt(50).toLong + 1L, rnd.nextInt(40_000).toLong + 100L)
    }
    val (input, query) = startQuery("coh_eqv", "5 seconds")
    rows.sortBy(_._2).grouped(200).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    drain(input, query)
    val streamed = results("coh_eqv").filterNot(_.user_id == 9999L)
    query.stop()
    val batch = StreamingCohort.batchReference(rows.toDF("user_id", "ts"), Week)
      .as[PeriodHit].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
