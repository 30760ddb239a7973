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
}
