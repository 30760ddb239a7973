package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingTopK.{Ranked, Scored}

/** Streaming windowed top-k: emission only on window close, k-bound and
  * (score desc, id asc) tie-breaks identical to the native topk_by
  * aggregate, determinism under shuffled arrival, bounded state — and exact
  * equality vs the batch aggregate reference on seeded random data. */
class TopKStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def startQuery(name: String, delay: String, windowMs: Long, k: Int) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val items = input.toDF().toDF("group", "id", "ts", "score")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[Scored]
    val query = StreamingTopK.topk(items, windowMs, k)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[Ranked] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[Ranked].collect().toSet
  }

  private def drain(input: MemoryStream[(String, Long, Long, Long)],
                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData(("zz_sentinel", -1L, 10_000_000L, 0L))
    query.processAllAvailable()
    input.addData(("zz_sentinel", -2L, 20_000_000L, 0L))
    query.processAllAvailable()
  }

  test("k-bound and tie-breaks match topk_by; emission only on window close") {
    val (input, query) = startQuery("tk_basic", "0 seconds", 1000L, 2)
    // window [0, 1000): scores 5,5,3 — ties to the lower id; third drops
    input.addData(("a", 10L, 100L, 5L), ("a", 7L, 200L, 5L), ("a", 1L, 300L, 3L))
    query.processAllAvailable()
    assert(results("tk_basic").isEmpty, "nothing may emit before the window closes")
    drain(input, query)
    val got = results("tk_basic").filter(_.group == "a")
    query.stop()
    assert(got == Set(Ranked("a", 0L, 1, 7L, 5L), Ranked("a", 0L, 2, 10L, 5L)), s"got $got")
  }

  test("windows are independent; a later-window row does not disturb an open earlier window") {
    val (input, query) = startQuery("tk_windows", "10 seconds", 1000L, 1)
    input.addData(("g", 1L, 500L, 10L), ("g", 2L, 1500L, 99L))
    query.processAllAvailable()
    drain(input, query)
    val got = results("tk_windows").filter(_.group == "g")
    query.stop()
    assert(got == Set(Ranked("g", 0L, 1, 1L, 10L), Ranked("g", 1000L, 1, 2L, 99L)), s"got $got")
  }

  test("equality vs the native topk_by aggregate on seeded random, shuffled micro-batches") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260814L)
    val rows = Seq.fill(600)((s"g${rnd.nextInt(5)}", rnd.nextInt(10000).toLong,
      rnd.nextInt(30000).toLong, rnd.nextInt(50).toLong))
      .distinctBy(r => (r._1, r._2)) // unique (group, id): ranked sets compare exactly
    val (input, query) = startQuery("tk_eqv", "60 seconds", 5000L, 3)
    rows.grouped(200).foreach { b => input.addData(rnd.shuffle(b): _*); query.processAllAvailable() }
    drain(input, query)
    val streamed = results("tk_eqv").filter(_.group != "zz_sentinel")
    query.stop()
    val batch = StreamingTopK.batchReference(
      rows.toDF("group", "id", "ts", "score"), 5000L, 3)
      .as[Ranked].collect().toSet
    assert(streamed == batch,
      s"streaming/batch divergence:\n only-streaming=${streamed -- batch}\n only-batch=${batch -- streamed}")
  }
}
