package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingHotSpans.SpanObs

/** Crash-recovery pin for the stateful streaming family: a query stopped
  * and RESTARTED from its checkpoint must (a) recover processor state — a
  * threshold completed by post-restart data counts the pre-restart
  * documents; (b) stay exactly-once — a span already reported before the
  * stop is not re-reported when it recurs after; (c) end with the sink
  * equal to the batch reference over everything ingested. This is the
  * contract the streaming scaladocs claim ("checkpointing gives
  * exactly-once into file sinks") exercised for real: file source + file
  * sink + RocksDB state store across two query incarnations. */
class RecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("hot-span state and emissions survive a checkpoint restart") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft_recovery").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def run(): Unit = {
      val obs = sp.readStream
        .schema("span BIGINT, doc_id BIGINT")
        .parquet(inDir)
        .as[SpanObs]
      val query = StreamingHotSpans.hotSpans(obs, dfThreshold = 3)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      query.processAllAvailable()
      query.stop()
      query.awaitTermination()
    }

    // incarnation 1: span 1 completes (emitted); span 2 at df=2 (state only)
    Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
      .toDF("span", "doc_id").write.mode("append").parquet(inDir)
    run()
    val after1 = sp.read.parquet(outDir).as[(Long, Int)].collect().toSet
    assert(after1 == Set((1L, 3)), s"got $after1")

    // incarnation 2, SAME checkpoint:
    //  - span 2 sees ONE new distinct doc → crossing counts the two
    //    pre-restart docs (state recovered);
    //  - span 1 recurs in new docs → must NOT re-emit (hot flag recovered);
    //  - span 3 stays below threshold (no spurious emission)
    Seq((2L, 12L), (1L, 20L), (1L, 21L), (1L, 22L), (3L, 10L), (3L, 11L))
      .toDF("span", "doc_id").write.mode("append").parquet(inDir)
    run()
    val after2 = sp.read.parquet(outDir).as[(Long, Int)].collect().toList
    assert(after2.sorted == List((1L, 3), (2L, 3)),
      s"restart must add exactly span 2's crossing, got $after2")

    // and the sink equals the batch reference over everything ingested
    val batch = StreamingHotSpans.batchReference(
        sp.read.parquet(inDir).toDF("span", "doc_id"), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after2.toSet == batch, s"sink=${after2.toSet} batch=$batch")
  }

  test("windowed-aggregation state (stateStoreSave) survives a checkpoint restart") {
    // the OTHER stateful-operator family: StreamingEnrich's watermarked
    // window agg. An open window's partial state must carry across the
    // restart, and an already-finalized window must not re-emit.
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft_recovery_w").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val dim = Seq((1L, "AUTO"), (2L, "RETAIL")).toDF("c_custkey", "c_mktsegment")

    def run(): Unit = {
      val events = sp.readStream
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, value DOUBLE")
        .parquet(inDir)
        .withColumn("ets", org.apache.spark.sql.functions.timestamp_millis(
          org.apache.spark.sql.functions.col("ts")))
      val query = StreamingEnrich.segmentRollup(events, dim,
          width = "10 seconds", delay = "0 seconds")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      query.processAllAvailable()
      query.stop()
      query.awaitTermination()
    }

    // incarnation 1: [0,10) gets two AUTO events and finalizes (wm -> 12s);
    // [10,20) is OPEN with one RETAIL event in state
    Seq((1L, 1000L, 1L, 5.0), (2L, 3000L, 1L, 7.0), (3L, 12000L, 2L, 4.0))
      .toDF("event_id", "ts", "user_id", "value").write.mode("append").parquet(inDir)
    run()
    val after1 = sp.read.parquet(outDir)
      .select("segment", "n", "sum_value").as[(String, Long, Double)].collect().toSet
    assert(after1 == Set(("AUTO", 2L, 12.0)), s"got $after1")

    // incarnation 2: one more RETAIL event into the open [10,20) window,
    // then an event at 25s pushes the watermark past it — the finalized
    // window must combine PRE- and post-restart events exactly once
    Seq((4L, 15000L, 2L, 6.0), (5L, 25000L, 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value").write.mode("append").parquet(inDir)
    run()
    val after2 = sp.read.parquet(outDir)
      .select("segment", "n", "sum_value").as[(String, Long, Double)].collect().toList.sorted
    assert(after2 == List(("AUTO", 2L, 12.0), ("RETAIL", 2L, 10.0)),
      s"restart must finalize [10,20) with both RETAIL events, once; got $after2")
  }
}
