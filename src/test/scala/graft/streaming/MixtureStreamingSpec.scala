package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingMixture.{Admission, Doc}

/** Streaming source-mixture admission: per-source token budgets filled
  * greedily in the deterministic (ts, md5, doc_id) order, decisions gated on
  * the watermark — mirrors sp05's batch semantics (straddling doc included,
  * deterministic re-runs) and pins the streaming-only behaviors: shuffled
  * arrival within the delay cannot change the mix, budgets are independent
  * per source, and an exhausted source keeps only its counter in state. */
class MixtureStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def startQuery(name: String, delay: String, budget: Long,
                         overrides: Map[String, Long] = Map.empty) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val docs = input.toDF().toDF("source", "doc_id", "ts", "tokens")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[Doc]
    val query = StreamingMixture.admit(docs, budget, overrides)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[Admission] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[Admission].collect().toSet
  }

  /** Push the watermark far past every doc (two rounds: the watermark is
    * computed at batch end and applied to the NEXT batch). */
  private def drain(input: MemoryStream[(String, Long, Long, Long)],
                    query: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData(("zz_sentinel", -1L, 10_000_000L, 0L))
    query.processAllAvailable()
    input.addData(("zz_sentinel", -2L, 20_000_000L, 0L))
    query.processAllAvailable()
  }

  test("budget fills greedily in event-time order; straddling doc included; then rejects") {
    val (input, query) = startQuery("mix_basic", "0 seconds", 800L)
    // 5 docs of 300 tokens: cum-before = 0, 300, 600 (< 800 → selected,
    // straddle overshoots to 900), 900, 1200 (rejected)
    input.addData((1L to 5L).map(i => ("a", i, i * 1000L, 300L)): _*)
    query.processAllAvailable()
    drain(input, query)
    val got = results("mix_basic").filter(_.source == "a")
    query.stop()
    assert(got.map(a => (a.doc_id, a.selected, a.cum_tokens)) ==
      Set((1L, true, 300L), (2L, true, 600L), (3L, true, 900L),
        (4L, false, 900L), (5L, false, 900L)), s"got $got")
  }

  test("admission is watermark-gated: no decision before the watermark passes the doc") {
    val (input, query) = startQuery("mix_gate", "10 seconds", 100L)
    input.addData(("a", 1L, 5000L, 50L))
    query.processAllAvailable()
    // watermark still below 5000 (delay 10s): nothing decided yet
    assert(results("mix_gate").isEmpty, s"got ${results("mix_gate")}")
    drain(input, query)
    val got = results("mix_gate").filter(_.source == "a")
    query.stop()
    assert(got == Set(Admission("a", 1L, 5000L, 50L, selected = true, 50L)), s"got $got")
  }

  test("shuffled arrival within the delay yields the same mix as in-order (determinism)") {
    val (input, query) = startQuery("mix_shuffled", "1 minute", 700L)
    // send out of order, split across micro-batches
    input.addData(("a", 4L, 4000L, 200L), ("a", 1L, 1000L, 200L))
    query.processAllAvailable()
    input.addData(("a", 3L, 3000L, 200L), ("a", 5L, 5000L, 200L), ("a", 2L, 2000L, 200L))
    query.processAllAvailable()
    drain(input, query)
    val got = results("mix_shuffled").filter(_.source == "a")
    query.stop()
    // event-time order 1..5: docs 1-4 selected (cum-before 600 < 700 at doc 4), 5 rejected
    assert(got.map(a => (a.doc_id, a.selected)) ==
      Set((1L, true), (2L, true), (3L, true), (4L, true), (5L, false)), s"got $got")
  }

  test("per-source budgets are independent; overrides apply") {
    val (input, query) = startQuery("mix_multi", "0 seconds", 100L, Map("b" -> 1000L))
    input.addData(
      ("a", 1L, 1000L, 80L), ("a", 2L, 2000L, 80L), ("a", 3L, 3000L, 80L),
      ("b", 10L, 1000L, 400L), ("b", 11L, 2000L, 400L), ("b", 12L, 3000L, 400L),
      ("b", 13L, 4000L, 400L))
    query.processAllAvailable()
    drain(input, query)
    val got = results("mix_multi")
    query.stop()
    // a (budget 100): doc1 (cum 80), doc2 straddles (cum-before 80 < 100 →
    // selected, overshoots to 160), doc3 rejected
    assert(got.filter(_.source == "a").map(a => (a.doc_id, a.selected)) ==
      Set((1L, true), (2L, true), (3L, false)))
    // b (override 1000): docs 10-12 selected (cum-before 800 < 1000 at 12), 13 rejected
    assert(got.filter(_.source == "b").map(a => (a.doc_id, a.selected)) ==
      Set((10L, true), (11L, true), (12L, true), (13L, false)))
  }

  test("equality vs batch: random docs, shuffled micro-batches match the sp05 window form") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(77)
    val docs = (1 to 60).map { i =>
      val src = Seq("web", "code", "books")(rnd.nextInt(3))
      // duplicate timestamps force the md5 tie-break to decide the order
      ("" + src, i.toLong, 1000L * (1 + rnd.nextInt(12)), 10L + rnd.nextInt(90))
    }
    val (input, query) = startQuery("mix_diff", "1 minute", 500L)
    rnd.shuffle(docs).grouped(17).foreach { batch =>
      input.addData(batch: _*)
      query.processAllAvailable()
    }
    drain(input, query)
    val got = results("mix_diff").filter(_.source != "zz_sentinel")
      .map(a => (a.source, a.doc_id, a.selected))
    query.stop()
    val ref = StreamingMixture.batchReference(
        docs.toDF("source", "doc_id", "ts", "tokens"), 500L)
      .select($"source", $"doc_id", $"selected")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == ref,
      s"streaming/batch mismatch:\n  streaming-only: ${got -- ref}\n  batch-only: ${ref -- got}")
  }

  test("an exhausted source keeps admitting decisions (selected=false) from counter-only state") {
    val (input, query) = startQuery("mix_exhaust", "0 seconds", 50L)
    input.addData(("a", 1L, 1000L, 60L))
    query.processAllAvailable()
    drain(input, query)
    assert(results("mix_exhaust").filter(_.source == "a")
      .map(a => (a.doc_id, a.selected, a.cum_tokens)) == Set((1L, true, 60L)))
    // much later doc: decided from the persisted counter alone
    input.addData(("a", 2L, 30_000_000L, 10L))
    query.processAllAvailable()
    input.addData(("zz_sentinel", -3L, 40_000_000L, 0L))
    query.processAllAvailable()
    input.addData(("zz_sentinel", -4L, 50_000_000L, 0L))
    query.processAllAvailable()
    val got = results("mix_exhaust").filter(_.source == "a")
    query.stop()
    assert(got.map(a => (a.doc_id, a.selected, a.cum_tokens)) ==
      Set((1L, true, 60L), (2L, false, 60L)), s"got $got")
  }
}
