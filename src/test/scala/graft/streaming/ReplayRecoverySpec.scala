package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, timestamp_millis}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart recovery for the watermark-REPLAY operators — the
  * stateful processors whose correctness argument depends on nontrivial
  * resumable state surviving a restart, beyond RecoverySpec's generic
  * transformWithState/windowed-agg pins:
  *
  *  - StreamingFunnel: the AUTOMATON POSITION — steps bound before the stop
  *    must gate (and never re-emit) steps completed after it;
  *  - StreamingCohort: the ACTIVATION SET — the cohort week fixed before
  *    the stop anchors periods computed after it, and an emitted period
  *    stays emitted-once;
  *  - StreamingSemanticDedup: the ADMITTED LIST — a vector admitted before
  *    the stop must suppress (keep=false) a near-duplicate arriving after.
  *
  * Every test runs file source → file sink over the SAME checkpoint across
  * several query incarnations (each run() is a full stop/restart), and ends
  * by comparing the sink against the operator's batch/sequential reference
  * over everything ingested. Watermark ripening may hold back the FINAL
  * pusher event's own emission (its timer fires only once a later batch
  * advances the watermark past it), so where a pusher itself produces
  * output the asserts use mustHave ⊆ sink ⊆ reference bounds with the
  * pinned rows asserted explicitly. */
class ReplayRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("funnel automaton position survives a checkpoint restart") {
    import StreamingFunnel.{FunnelEvent, StepHit}
    val sp = spark
    import sp.implicits._
    val steps = Seq("view", "click", "purchase")
    val root = Files.createTempDirectory("graft_replay_funnel").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def run(): Unit = {
      val events = sp.readStream
        .schema("user_id BIGINT, ts BIGINT, event_type STRING")
        .parquet(inDir)
        .withColumn("ets", timestamp_millis(col("ts")))
        .withWatermark("ets", "0 seconds")
        .as[FunnelEvent]
      val q = StreamingFunnel.funnel(events, steps)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def write(rows: (Long, Long, String)*): Unit =
      rows.toDF("user_id", "ts", "event_type").write.mode("append").parquet(inDir)

    // incarnation 1: user 1 binds view@1000 and click@2000 ("noise" is not
    // a step name — it only drives the watermark); a second restart ripens
    // and emits both
    write((1L, 1000L, "view"), (1L, 2000L, "click"), (99L, 5_000_000L, "noise"))
    run()
    write((99L, 6_000_000L, "noise"))
    run()
    val after1 = sp.read.parquet(outDir).as[StepHit].collect().toSet
    assert(after1 == Set(StepHit(1L, 1, "view", 1000L), StepHit(1L, 2, "click", 2000L)),
      s"got $after1")

    // incarnation 3: purchase completes the funnel — ONLY a recovered
    // automaton (steps 1-2 bound pre-restart) admits it as step 3 — and a
    // recurring view must NOT re-emit the already-bound step 1
    write((1L, 7_000_000L, "purchase"), (1L, 8_000_000L, "view"),
      (99L, 20_000_000L, "noise"))
    run()
    write((99L, 30_000_000L, "noise"))
    run()
    val after2 = sp.read.parquet(outDir).as[StepHit].collect().toList
    assert(after2.size == after2.toSet.size, s"duplicate emissions: $after2")
    assert(after2.toSet == after1 + StepHit(1L, 3, "purchase", 7_000_000L), s"got $after2")

    // sink equals the batch funnel over everything ingested
    val batch = StreamingFunnel.batchReference(
        sp.read.parquet(inDir).select("user_id", "ts", "event_type"), steps)
      .collect().map(r => StepHit(r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(after2.toSet == batch, s"sink=${after2.toSet} batch=$batch")
  }

  test("cohort week and activation set survive a checkpoint restart") {
    import StreamingCohort.{PeriodHit, UserEvent, WeekMs}
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft_replay_cohort").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def run(): Unit = {
      val events = sp.readStream
        .schema("user_id BIGINT, ts BIGINT")
        .parquet(inDir)
        .withColumn("ets", timestamp_millis(col("ts")))
        .withWatermark("ets", "0 seconds")
        .as[UserEvent]
      val q = StreamingCohort.cohorts(events)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def write(rows: (Long, Long)*): Unit =
      rows.toDF("user_id", "ts").write.mode("append").parquet(inDir)

    // incarnation 1: user 1 activates in week 0; the pusher user 99 lives
    // in week 1 (its own activations ride along under the ⊆ bounds)
    write((1L, 1000L), (99L, WeekMs + 10L))
    run()
    write((99L, WeekMs + 20L))
    run()
    val after1 = sp.read.parquet(outDir).as[PeriodHit].collect().toSet
    assert(after1.contains(PeriodHit(1L, 0L, 0L)), s"got $after1")

    // incarnation 3: user 1 returns in week 2 — period 2 is computable
    // ONLY from the recovered cohort week (0); the duplicate week-2 event
    // must not double-emit
    write((1L, 2 * WeekMs + 500L), (1L, 2 * WeekMs + 600L), (99L, 3 * WeekMs))
    run()
    write((99L, 4 * WeekMs))
    run()
    val sink = sp.read.parquet(outDir).as[PeriodHit].collect().toList
    assert(sink.size == sink.toSet.size, s"duplicate emissions: $sink")
    assert(sink.toSet.contains(PeriodHit(1L, 0L, 2L)),
      s"recovered cohort week must anchor period 2, got $sink")
    val ref = StreamingCohort.batchReference(sp.read.parquet(inDir).select("user_id", "ts"))
      .collect().map(r => PeriodHit(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the final pusher's own activation may still be unripe — bound, don't equate
    val mustHave = ref - PeriodHit(99L, 1L, 3L)
    assert(sink.toSet.subsetOf(ref), s"sink exceeds the batch reference: ${sink.toSet -- ref}")
    assert(mustHave.subsetOf(sink.toSet), s"missing: ${mustHave -- sink.toSet}")
  }

  test("semantic-dedup admitted list survives a checkpoint restart") {
    import StreamingSemanticDedup.{VecEvent, Verdict}
    val sp = spark
    import sp.implicits._
    val centroids = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    val tau = 0.8
    val root = Files.createTempDirectory("graft_replay_sem").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")

    def run(): Unit = {
      val events = sp.readStream
        .schema("vec_id BIGINT, ts BIGINT, vec ARRAY<DOUBLE>")
        .parquet(inDir)
        .withColumn("ets", timestamp_millis(col("ts")))
        .withWatermark("ets", "0 seconds")
        .as[VecEvent]
      val q = StreamingSemanticDedup.dedup(events, centroids, tau)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def write(rows: (Long, Long, Seq[Double])*): Unit =
      rows.toDF("vec_id", "ts", "vec").write.mode("append").parquet(inDir)

    // incarnation 1: vector 1 is ADMITTED into cluster 0; pusher 90 seeds
    // cluster 1
    write((1L, 1000L, Seq(1.0, 0.05)), (90L, 5_000_000L, Seq(0.0, 1.0)))
    run()
    write((91L, 6_000_000L, Seq(0.0, 0.99)))
    run()
    val after1 = sp.read.parquet(outDir).as[Verdict].collect().toSet
    assert(after1.contains(Verdict(1L, 0L, keep = true, 0L)), s"got $after1")

    // incarnation 3: vector 2 is a near-duplicate of the PRE-restart
    // admission — only a recovered admitted list can refuse it
    write((2L, 7_000_000L, Seq(0.99, 0.02)), (92L, 20_000_000L, Seq(0.0, 1.0)))
    run()
    write((93L, 30_000_000L, Seq(0.0, 1.0)))
    run()
    val sink = sp.read.parquet(outDir).as[Verdict].collect().toList
    assert(sink.size == sink.toSet.size, s"duplicate emissions: $sink")
    assert(sink.toSet.contains(Verdict(2L, 0L, keep = false, 1L)),
      s"the recovered admitted list must refuse vec 2, got $sink")
    val all = sp.read.parquet(inDir).as[VecEvent].collect()
      .map(v => VecEvent(v.vec_id, v.ts, v.vec)).toSeq
    val ref = StreamingSemanticDedup.sequentialReference(all, centroids, tau).toSet
    val mustHave = ref.filterNot(_.vec_id == 93L) // final pusher may be unripe
    assert(sink.toSet.subsetOf(ref), s"sink exceeds the reference: ${sink.toSet -- ref}")
    assert(mustHave.subsetOf(sink.toSet), s"missing: ${mustHave -- sink.toSet}")
  }
}
