package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingTransitions.{Edge, TypedEvent}

/** Streaming transition edges: chain order is event-time order (never
  * arrival), '^start' marks each user's first event, edges are append-final
  * and exactly-once — and the full output equals ev06's batch lag-window
  * edge relation on seeded random data under shuffled arrival. */
class TransitionsStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def startQuery(name: String, delay: String) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[TypedEvent]
    val query = StreamingTransitions.transitions(events)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[Edge] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[Edge].collect().toSet
  }

  private def drain(input: MemoryStream[(Long, Long, Long, String)],
                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData((9999L, 10_000_000L, 0L, "noise"))
    query.processAllAvailable()
    input.addData((9999L, 20_000_000L, 1L, "noise"))
    query.processAllAvailable()
  }

  test("chain follows event time, not arrival order; ^start marks the first event") {
    val (input, query) = startQuery("tr_order", "10 seconds")
    // the view@2000 arrives FIRST; the true first event click@1000 arrives
    // later within the horizon — the chain must be ^start->click->view
    input.addData((1L, 2000L, 11L, "view"))
    query.processAllAvailable()
    input.addData((1L, 1000L, 10L, "click"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("tr_order").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(
      Edge(1L, "^start", "click", 1000L),
      Edge(1L, "click", "view", 2000L)), s"got $got")
  }

  test("same-millisecond events chain in event_id order (the batch tie-break)") {
    val (input, query) = startQuery("tr_tie", "0 seconds")
    input.addData((2L, 1000L, 7L, "b"), (2L, 1000L, 3L, "a"), (2L, 2000L, 9L, "c"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("tr_tie").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(
      Edge(2L, "^start", "a", 1000L),
      Edge(2L, "a", "b", 1000L),
      Edge(2L, "b", "c", 2000L)), s"got $got")
  }

  test("the chain extends across micro-batches from persisted last state") {
    val (input, query) = startQuery("tr_ext", "0 seconds")
    input.addData((3L, 1000L, 1L, "x"))
    query.processAllAvailable()
    input.addData((3L, 5000L, 2L, "y"))
    query.processAllAvailable()
    input.addData((3L, 9000L, 3L, "z"))
    query.processAllAvailable()
    drain(input, query)
    val got = results("tr_ext").filterNot(_.user_id == 9999L)
    query.stop()
    assert(got == Set(
      Edge(3L, "^start", "x", 1000L),
      Edge(3L, "x", "y", 5000L),
      Edge(3L, "y", "z", 9000L)), s"got $got")
  }

  test("streaming equals the ev06 batch lag relation on seeded shuffled data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260817L)
    val types = Vector("view", "click", "purchase", "scroll")
    val rows = (1 to 3000).map { i =>
      (rnd.nextInt(40).toLong + 1L, rnd.nextInt(40_000).toLong + 100L,
        i.toLong, types(rnd.nextInt(types.length)))
    }
    val (input, query) = startQuery("tr_eqv", "5 seconds")
    rows.sortBy(_._2).grouped(200).map(rnd.shuffle(_)).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    drain(input, query)
    val streamed = results("tr_eqv").filterNot(_.user_id == 9999L)
    query.stop()
    val batch = StreamingTransitions.batchReference(
        rows.toDF("user_id", "ts", "event_id", "event_type"))
      .select(col("user_id"), col("from_type"), col("to_type"), col("at_ms"))
      .as[Edge].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
