package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import StreamingSemanticDedup.{VecEvent, Verdict}

/** StreamingSemanticDedup must replay event-time order exactly (keep-first
  * is order-SENSITIVE: whoever comes first in (ts, vec_id) is the kept one)
  * and match the sequential per-cluster reference on shuffled arrivals —
  * which is dd11's earlier-neighbor keep-first whenever id order extends
  * time order. */
class SemanticDedupStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // two well-separated centroids; similarity within a cluster is decided by
  // the 3rd/4th dims
  private val Centroids = Seq(
    1L -> Array(10.0, 0.0, 0.0, 0.0),
    2L -> Array(0.0, 10.0, 0.0, 0.0))

  private def vec(cluster: Int, a: Double, b: Double): Array[Double] =
    if (cluster == 1) Array(10.0, 0.0, a, b) else Array(0.0, 10.0, a, b)

  private def run(name: String, rows: Seq[VecEvent], tau: Double, cap: Int = 4096,
                  batchOf: Int = 50, seed: Long = 7L): Seq[Verdict] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, Long, Array[Double])]
    val events = input.toDF().toDF("vec_id", "ts", "vec")
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", "10 seconds")
      .as[VecEvent]
    val query = StreamingSemanticDedup.dedup(events, Centroids, tau, cap)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rnd = new scala.util.Random(seed)
    rows.sortBy(_.ts).grouped(batchOf).map(rnd.shuffle(_)).foreach { b =>
      input.addData(b.map(e => (e.vec_id, e.ts, e.vec)): _*)
      query.processAllAvailable()
    }
    // drain: push the watermark far past every buffered event
    input.addData((999999L, 100_000_000L, Array(10.0, 0.0, 99.0, 99.0)))
    query.processAllAvailable()
    input.addData((999998L, 200_000_000L, Array(10.0, 0.0, -99.0, -99.0)))
    query.processAllAvailable()
    val out = sp.sql(s"SELECT * FROM $name").as[Verdict].collect().toSeq
    query.stop()
    out.filterNot(v => v.vec_id >= 999998L)
  }

  test("keep-first is event-time-ordered: the earlier similar vector wins") {
    // v2 is similar to v1; v1 is EARLIER in ts but arrives LATER (the
    // watermark replay must still process v1 first)
    val rows = Seq(
      VecEvent(2L, 2000L, vec(1, 1.0, 0.0)),
      VecEvent(1L, 1000L, vec(1, 1.0, 0.01)),
      VecEvent(3L, 3000L, vec(1, -1.0, 0.0))) // dissimilar: kept
    val out = run("sem_order", rows, tau = 0.99)
    val byId = out.map(v => v.vec_id -> v).toMap
    assert(byId(1L).keep && byId(1L).n_earlier_sim == 0)
    assert(!byId(2L).keep && byId(2L).n_earlier_sim == 1, s"v2 must lose to earlier v1: $out")
    assert(byId(3L).keep)
  }

  test("same-timestamp ties resolve by vec_id (the batch id order)") {
    val rows = Seq(
      VecEvent(20L, 1000L, vec(2, 5.0, 5.0)),
      VecEvent(10L, 1000L, vec(2, 5.0, 5.01)))
    val out = run("sem_tie", rows, tau = 0.99)
    val byId = out.map(v => v.vec_id -> v).toMap
    assert(byId(10L).keep && !byId(20L).keep, s"lowest id wins the tie: $out")
  }

  test("duplicates still count as earlier neighbors (chains drop, exemplars don't rescue)") {
    // a~b and b~c but a!~c: all three drop except a — b loses to a, c loses
    // to b EVEN THOUGH b itself was dropped (dd11's earlier-neighbor rule)
    val a = vec(1, 1.0, 0.0)
    val b = vec(1, 1.0, 0.35)    // cos(a,b) ~ 0.972 >= tau
    val c = vec(1, 1.0, 0.75)    // cos(b,c) ~ 0.962 >= tau; cos(a,c) ~ 0.90 < tau
    val rows = Seq(VecEvent(1L, 1000L, a), VecEvent(2L, 2000L, b), VecEvent(3L, 3000L, c))
    val out = run("sem_chain", rows, tau = 0.95)
    val byId = out.map(v => v.vec_id -> v).toMap
    assert(byId(1L).keep)
    assert(!byId(2L).keep)
    assert(!byId(3L).keep, s"c must lose to the DROPPED b: $out")
  }

  test("cluster cap: later arrivals pass through kept-but-uncompared") {
    val rows = (1 to 6).map(i => VecEvent(i.toLong, i * 1000L, vec(1, 1.0, 0.0)))
    val out = run("sem_cap", rows, tau = 0.99, cap = 3)
    val byId = out.map(v => v.vec_id -> v).toMap
    assert(byId(1L).keep)
    assert(!byId(2L).keep && !byId(3L).keep)
    assert(byId(4L).keep && byId(5L).keep && byId(6L).keep,
      s"past the cap vectors pass through: $out")
  }

  test("streaming equals the sequential reference on seeded shuffled random data") {
    val rnd = new scala.util.Random(20260814L)
    val rows = (1 to 600).map { i =>
      VecEvent(i.toLong, rnd.nextInt(120_000).toLong,
        vec(1 + rnd.nextInt(2), rnd.nextInt(5) * 0.5, rnd.nextInt(5) * 0.5))
    }
    val out = run("sem_eqv", rows, tau = 0.97, batchOf = 80)
    val ref = StreamingSemanticDedup.sequentialReference(rows, Centroids, 0.97)
    assert(out.size == rows.size, s"one verdict per vector: ${out.size} vs ${rows.size}")
    assert(out.toSet == ref.toSet,
      s"streaming/sequential divergence:\n only-streaming=${out.toSet -- ref.toSet}\n only-ref=${ref.toSet -- out.toSet}")
  }

  test("when id order extends time order the verdicts are dd11's earlier-neighbor keep-first") {
    val rnd = new scala.util.Random(20260816L)
    val rows = (1 to 300).map { i =>
      VecEvent(i.toLong, i * 100L, // ts strictly increasing with id
        vec(1 + rnd.nextInt(2), rnd.nextInt(4) * 0.7, rnd.nextInt(4) * 0.7))
    }
    val out = run("sem_dd11", rows, tau = 0.97, batchOf = 60)
    // dd11's batch logic: per cluster, count SIMILAR neighbors with smaller
    // vec_id; keep iff none (no time involved)
    val cs = Centroids.sortBy(_._1).toIndexedSeq
    val expect = rows.groupBy(e => StreamingSemanticDedup.assign(cs, e.vec))
      .toSeq.flatMap { case (cluster, evs) =>
        val sorted = evs.sortBy(_.vec_id)
        sorted.zipWithIndex.map { case (e, i) =>
          def cos(x: Array[Double], y: Array[Double]) = {
            val d = x.zip(y).map { case (p, q) => p * q }.sum
            d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
          }
          val earlier = sorted.take(i).count(o => cos(o.vec, e.vec) >= 0.97)
          Verdict(e.vec_id, cluster, earlier == 0, earlier.toLong)
        }
      }
    assert(out.toSet == expect.toSet,
      s"dd11-equivalence divergence:\n only-streaming=${out.toSet -- expect.toSet}\n only-batch=${expect.toSet -- out.toSet}")
  }
}
