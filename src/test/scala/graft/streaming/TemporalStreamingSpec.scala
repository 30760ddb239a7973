package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAsof.{AsofRow, Enriched}

/** Streaming as-of join: each probe answered by the greatest right row at or
  * before its event time, emitted only once the watermark passes the probe —
  * mirrors TemporalSpec's batch semantics (same tie-breaks, left-outer), and
  * pins the streaming-only behaviors: late right rows still serve earlier
  * probes, resolution is watermark-gated, and right history is GC'd without
  * losing the latest-at-guard feature. */
class TemporalStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** (key, ts, side, id, v) tuples -> watermarked AsofRow stream + query. */
  private def startQuery(name: String, delay: String) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, Int, Long, Double)]
    val rows = input.toDF().toDF("key", "ts", "side", "id", "v")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", delay)
      .as[AsofRow]
    val query = StreamingAsof.backward(rows)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (input, query)
  }

  private def results(name: String): Set[Enriched] = {
    val sp = spark
    import sp.implicits._
    sp.sql(s"SELECT * FROM $name").as[Enriched].collect().toSet
  }

  test("probes resolve to the latest feature at-or-before their time; emission is watermark-gated") {
    val (input, query) = startQuery("asof_basic", "0 seconds")
    // features at 1000 (v=1) and 3000 (v=2); probes at 2000, 3000, 3500
    input.addData((1L, 1000L, 0, 0L, 1.0), (1L, 3000L, 0, 0L, 2.0),
      (1L, 2000L, 1, 100L, 0.0), (1L, 3000L, 1, 101L, 0.0), (1L, 3500L, 1, 102L, 0.0))
    query.processAllAvailable()
    // watermark is still at 3500: the 3500 probe must NOT have resolved yet
    assert(!results("asof_basic").exists(_.probe_id == 102L) ||
      results("asof_basic").size <= 3, s"got ${results("asof_basic")}")
    // advance the watermark far past every probe
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_basic")
    query.stop()
    assert(got.contains(Enriched(100L, 1L, 2000L, Some(1000L), Some(1.0))), s"got $got")
    // an exactly-simultaneous feature IS visible (batch tie semantics)
    assert(got.contains(Enriched(101L, 1L, 3000L, Some(3000L), Some(2.0))), s"got $got")
    assert(got.contains(Enriched(102L, 1L, 3500L, Some(3000L), Some(2.0))), s"got $got")
  }

  test("a late right row in a later batch still serves earlier pending probes") {
    val (input, query) = startQuery("asof_late", "10 seconds")
    // probe at 5000 arrives first; no feature known yet
    input.addData((2L, 5000L, 1, 200L, 0.0))
    query.processAllAvailable()
    // a feature at 4000 lands in a LATER batch (in-watermark): the probe is
    // still pending (watermark = 5000 - 10s), so the answer must include it —
    // an eager at-arrival lookup would have emitted (200, None, None)
    input.addData((2L, 4000L, 0, 0L, 4.0))
    query.processAllAvailable()
    assert(results("asof_late").isEmpty, "probe must stay pending until the watermark passes it")
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_late")
    query.stop()
    assert(got.contains(Enriched(200L, 2L, 5000L, Some(4000L), Some(4.0))), s"got $got")
  }

  test("a probe with no qualifying feature emits left-outer nulls") {
    val (input, query) = startQuery("asof_outer", "0 seconds")
    // the only feature is AFTER the probe — must not leak backwards
    input.addData((3L, 1000L, 1, 300L, 0.0), (3L, 2000L, 0, 0L, 9.0))
    query.processAllAvailable()
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_outer")
    query.stop()
    assert(got.contains(Enriched(300L, 3L, 1000L, None, None)), s"got $got")
  }

  test("right-history GC keeps the latest-at-guard feature: later probes still answer") {
    val (input, query) = startQuery("asof_gc", "0 seconds")
    // two old features, then a probe far ahead — resolving it GCs history
    // down to the single latest feature
    input.addData((4L, 1000L, 0, 0L, 1.0), (4L, 2000L, 0, 0L, 2.0), (4L, 10000L, 1, 400L, 0.0))
    query.processAllAvailable()
    input.addData((4L, 20000L, 0, 0L, 0.0)) // advances watermark to 20000, resolves 400
    query.processAllAvailable()
    // a NEW probe after GC must still see the retained feature at 2000
    input.addData((4L, 30000L, 1, 401L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_gc")
    query.stop()
    assert(got.contains(Enriched(400L, 4L, 10000L, Some(2000L), Some(2.0))), s"got $got")
    // the 30000 probe sees the 20000 feature (v=0.0 — the newest), proving
    // history survived pruning in usable form
    assert(got.contains(Enriched(401L, 4L, 30000L, Some(20000L), Some(0.0))), s"got $got")
  }

  test("equality boundary: resolving at wm == p_ts is safe — Spark never admits a feature at f_ts <= the reached watermark") {
    val (input, query) = startQuery("asof_boundary", "0 seconds")
    // batch 1: probe at 5000; another key's feature pushes the watermark to
    // EXACTLY 5000 at end-of-batch
    input.addData((7L, 5000L, 1, 700L, 0.0), (99L, 5000L, 0, 0L, 0.0))
    query.processAllAvailable()
    // batch 2: a feature at f_ts == 5000 == wm PLUS a later probe that would
    // see it if it were admitted. Spark's late-events filter drops rows with
    // event time <= the previous batch's watermark, so BOTH probes must
    // answer None — resolving probe 700 the moment wm reached 5000 lost
    // nothing. (If Spark ever started admitting boundary rows, probe 701
    // would surface it here as a Some(5000) answer.)
    input.addData((7L, 5000L, 0, 0L, 7.5), (7L, 6000L, 1, 701L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_boundary")
    query.stop()
    assert(got.contains(Enriched(700L, 7L, 5000L, None, None)), s"got $got")
    assert(got.contains(Enriched(701L, 7L, 6000L, None, None)),
      s"boundary feature was admitted — the <= resolution boundary is no longer safe; got $got")
  }

  test("probe-less keys prune right history via feature-arrival timers; the latest feature survives") {
    val (input, query) = startQuery("asof_featonly", "0 seconds")
    // key 8 only ever receives features — no probe ever registers a timer for
    // it, so pruning must come from the feature-arrival cleanup timers
    input.addData((8L, 1000L, 0, 0L, 1.0), (8L, 2000L, 0, 0L, 2.0),
      (8L, 3000L, 0, 0L, 3.0), (8L, 4000L, 0, 0L, 4.0), (8L, 5000L, 0, 0L, 5.0))
    query.processAllAvailable()
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0)) // cleanup timers ≤ 100001 fire here
    query.processAllAvailable()
    // a first-ever probe on the key must still answer from the one retained
    // latest-at-guard feature
    input.addData((8L, 300000L, 1, 800L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 400000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 500000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val got = results("asof_featonly")
    query.stop()
    assert(got.contains(Enriched(800L, 8L, 300000L, Some(5000L), Some(5.0))), s"got $got")
  }

  test("streaming results equal the batch AsofJoin on the same data") {
    val sp = spark
    import sp.implicits._
    val (input, query) = startQuery("asof_parity", "5 seconds")
    val feats = Seq((5L, 1000L, 1.5), (5L, 2500L, 2.5), (6L, 1200L, 6.0))
    val probes = Seq((5L, 1500L, 500L), (5L, 2500L, 501L), (5L, 9000L, 502L), (6L, 1100L, 600L))
    input.addData(feats.map { case (k, t, v) => (k, t, 0, 0L, v) }: _*)
    query.processAllAvailable()
    input.addData(probes.map { case (k, t, id) => (k, t, 1, id, 0.0) }: _*)
    query.processAllAvailable()
    input.addData((99L, 100000L, 0, 0L, 0.0))
    query.processAllAvailable()
    input.addData((99L, 200000L, 0, 0L, 0.0))
    query.processAllAvailable()
    val streaming = results("asof_parity").filter(_.key != 99L)
    query.stop()

    val left = probes.toDF("key", "p_ts", "probe_id")
    val right = feats.toDF("f_key", "f_ts", "f_value")
    val batch = graft.ops.AsofJoin.backward(left, right, "key", "f_key", "p_ts", "f_ts")
      .select(col("probe_id"), col("key"), col("p_ts"), col("f_ts"), col("f_value"))
      .as[Enriched].collect().toSet
    assert(streaming == batch,
      s"streaming and batch as-of disagree:\n  streaming: $streaming\n  batch:     $batch")
  }
}
