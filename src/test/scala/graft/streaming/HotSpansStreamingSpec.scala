package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingHotSpans.{HotSpan, SpanObs}

/** Streaming hot-span detection: threshold crossing on DISTINCT documents,
  * exactly-once emission across micro-batches, own-doc repetition inert,
  * and batch-reference equality on seeded shuffled data. */
class HotSpansStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def startQuery(name: String, t: Int) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long)]
    val obs = input.toDF().toDF("span", "doc_id").as[SpanObs]
    val query = StreamingHotSpans.hotSpans(obs, t)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[(Long, Int)] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[HotSpan].collect().map(h => (h.span, h.df)).toSet
  }

  test("a span emits exactly once, when its third DISTINCT doc arrives") {
    val (input, query) = startQuery("hs1", 3)
    input.addData((100L, 1L), (100L, 2L)) // two distinct docs: below threshold
    query.processAllAvailable()
    assert(results("hs1").isEmpty)
    input.addData((100L, 2L), (100L, 2L)) // same doc again: still below
    query.processAllAvailable()
    assert(results("hs1").isEmpty)
    input.addData((100L, 3L)) // third distinct doc: crossing
    query.processAllAvailable()
    assert(results("hs1") == Set((100L, 3)))
    input.addData((100L, 4L), (100L, 5L)) // already hot: no re-emission
    query.processAllAvailable()
    assert(results("hs1") == Set((100L, 3)))
    query.stop()
  }

  test("own-document repetition never crosses the threshold") {
    val (input, query) = startQuery("hs2", 2)
    input.addData((7L, 1L), (7L, 1L), (7L, 1L), (7L, 1L))
    query.processAllAvailable()
    assert(results("hs2").isEmpty)
    input.addData((7L, 2L))
    query.processAllAvailable()
    assert(results("hs2") == Set((7L, 2)))
    query.stop()
  }

  test("a threshold crossing inside ONE batch emits once") {
    val (input, query) = startQuery("hs3", 3)
    input.addData((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
    query.processAllAvailable()
    assert(results("hs3") == Set((9L, 3)))
    query.stop()
  }

  test("batch-reference equality on seeded shuffled data") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    // 120 spans x zipf-ish doc fan-out: some spans hot, some not
    val obs = (1 to 800).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(40).toLong)
    }
    val shuffled = rnd.shuffle(obs)

    val (input, query) = startQuery("hs4", 3)
    shuffled.grouped(97).foreach { chunk =>
      input.addData(chunk: _*); query.processAllAvailable()
    }
    val streamed = results("hs4")
    query.stop()

    val batch = StreamingHotSpans.batchReference(
        obs.toDF("span", "doc_id"), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty && batch.size < 120, "fixture must leave both hot and cold spans")
  }
}
