package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin/RangeJoin semantics against naive reference implementations, plus
  * the plan-shape guarantees that make them 100 TB-safe (single exchange for
  * as-of; no cartesian/BNLJ for the bucketed range join). */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ev = {
    val e = Tables.t(spark, sfDir, "events")
    e.select(col("event_id"), col("user_id"), Tables.eventsTsMillis(e).as("e_ms"), col("value"))
  }

  private def od = Tables.t(spark, sfDir, "orders")
    .select(col("o_custkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("o_ms"),
      col("o_orderkey"), col("o_totalprice"))

  test("asof matches the naive join+row_number reference on real tables") {
    val fast = AsofJoin.backward(ev, od, "user_id", "o_custkey", "e_ms", "o_ms")
      .orderBy(col("event_id")).collect().toSeq
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_ms").desc_nulls_last, col("o_orderkey").desc_nulls_last,
        col("o_totalprice").desc_nulls_last)
    val naive = ev.join(od, col("user_id") === col("o_custkey") && col("o_ms") <= col("e_ms"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("e_ms"), col("value"),
        col("o_ms"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id")).collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("asof: unmatched left rows keep null payload; exact-time right row matches") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 99L, 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 100L, 7L), (10L, 60L, 5L))
      .toDF("rk", "rt", "payload")
    val out = AsofJoin.backward(left, right, "k", "rk", "t", "rt")
      .orderBy(col("id")).collect()
    // id=1: exact-time rt=100 visible; id=2: only rt<=50 -> none; id=3: no key
    assert(out(0).getAs[Long]("payload") == 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
    assert(out(2).isNullAt(out(2).fieldIndex("payload")))
  }

  test("asof: a NULL right time matches nothing (not treated as earliest-ever)") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = Seq((1L, Option.empty[Long], 7L), (1L, Some(200L), 9L)).toDF("rk", "rt", "p")
    val out = AsofJoin.backward(left, right, "k", "rk", "t", "rt").collect()
    // the null-time row must not leak its payload; the t=200 row is too late
    assert(out.head.isNullAt(out.head.fieldIndex("p")), out.head.toString)
  }

  test("asof: equal-time right rows tie-break to the greatest payload deterministically") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = Seq((1L, 100L, 3L), (1L, 100L, 9L), (1L, 100L, 6L)).toDF("rk", "rt", "p")
    val out = AsofJoin.backward(left, right, "k", "rk", "t", "rt").collect()
    assert(out.head.getAs[Long]("p") == 9L)
  }

  test("asof with staleness bound: boundary in, one-past-boundary out, per-row") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 100L)).toDF("id", "k", "t")
    val right = Seq((1L, 50L, 7L), (2L, 49L, 9L)).toDF("rk", "rt", "p")
    // tolerance 50: id=1 sees rt=50 exactly AT the bound (t - tol = 50) ->
    // kept; id=2's latest is rt=50 but 200-50=150 > 50 -> nulled; id=3's
    // latest rt=49 is one past its bound (100-50=51) -> nulled
    val out = AsofJoin.backwardWithin(left, right, "k", "rk", "t", "rt", 50L)
      .orderBy(col("id")).collect()
    assert(out(0).getAs[Long]("p") == 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("p")), "stale match must read as missing")
    assert(out(1).isNullAt(out(1).fieldIndex("rt")), "ALL payload columns null out together")
    assert(out(2).isNullAt(out(2).fieldIndex("p")))
  }

  test("asof with staleness bound equals the windowed naive join on real tables") {
    val TolMs = 7L * 24 * 3600000L
    val fast = AsofJoin.backwardWithin(ev, od, "user_id", "o_custkey", "e_ms", "o_ms", TolMs)
      .orderBy(col("event_id")).collect().toSeq
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_ms").desc_nulls_last, col("o_orderkey").desc_nulls_last,
        col("o_totalprice").desc_nulls_last)
    val naive = ev.join(od,
        col("user_id") === col("o_custkey") && col("o_ms") <= col("e_ms") &&
          col("o_ms") >= col("e_ms") - TolMs, "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("e_ms"), col("value"),
        col("o_ms"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id")).collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("forward asof matches the naive join+row_number reference on real tables") {
    val orders = od.select(col("o_orderkey"), col("o_custkey"), col("o_ms"))
    val events = ev.select(col("user_id"), col("e_ms"), col("event_id"), col("value"))
    val fast = AsofJoin.forward(orders, events, "o_custkey", "user_id", "o_ms", "e_ms")
      .orderBy(col("o_orderkey")).collect().toSeq
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("e_ms").asc_nulls_last, col("event_id").asc_nulls_last,
        col("value").asc_nulls_last)
    val naive = orders
      .join(events, col("user_id") === col("o_custkey") && col("e_ms") >= col("o_ms"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_ms"),
        col("e_ms"), col("event_id"), col("value"))
      .orderBy(col("o_orderkey")).collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("forward asof: exact-time match visible; ties to SMALLEST payload; left-outer") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 300L), (3L, 99L, 100L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 100L, 7L), (10L, 100L, 3L), (10L, 250L, 5L))
      .toDF("rk", "rt", "payload")
    val out = AsofJoin.forward(left, right, "k", "rk", "t", "rt")
      .orderBy(col("id")).collect()
    // id=1: exact-time rows visible, smallest payload (3) wins;
    // id=2: nothing at/after 300; id=3: no key
    assert(out(0).getAs[Long]("payload") == 3L, out(0).toString)
    assert(out(1).isNullAt(out(1).fieldIndex("payload")))
    assert(out(2).isNullAt(out(2).fieldIndex("payload")))
  }

  test("forward asof plan: exactly one exchange, no join operator") {
    val orders = od.select(col("o_orderkey"), col("o_custkey"), col("o_ms"))
    val events = ev.select(col("user_id"), col("e_ms"), col("event_id"), col("value"))
    val p = AsofJoin.forward(orders, events, "o_custkey", "user_id", "o_ms", "e_ms")
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*(?:\\+- |:- )?Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "forward as-of must not be a join at all — union + window")
  }

  test("ev01 funnel alignment is greedy and order-sensitive") {
    val sp = spark; import sp.implicits._
    // u1: full ordered funnel; u2: click BEFORE its only view (no step 2);
    // u3: view+click ordered but purchase precedes the click (no step 3)
    val rows = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 500L, "click"), (2L, 600L, "view"),
      (3L, 100L, "view"), (3L, 900L, "click"), (3L, 400L, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("ev01spec").toString
    rows.map { case (u, ms, ty) => (u * 1000 + ms, ms * 1000000L, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("ev01_funnel")(spark, dir)
      .collect().map(r => (r.getAs[Long]("step"), r.getAs[Long]("n_users"),
        r.getAs[Long]("sum_ms"))).toSeq
    // step1: u1@100, u2@600, u3@100; step2: u1@200, u3@900; step3: u1@300
    assert(out == Seq((1L, 3L, 800L), (2L, 2L, 1100L), (3L, 1L, 300L)), out.toString)
  }

  test("asof operator plan: exactly one exchange (both sides shuffle once, together)") {
    val p = AsofJoin.backward(ev, od, "user_id", "o_custkey", "e_ms", "o_ms")
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*(?:\\+- |:- )?Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of must not be a join at all — union + window")
  }

  test("asof with staleness bound keeps the single-exchange plan (bound is plan-free)") {
    val p = AsofJoin.backwardWithin(ev, od, "user_id", "o_custkey", "e_ms", "o_ms", 1000L)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*(?:\\+- |:- )?Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the staleness bound must not introduce a join")
  }

  test("range join matches the naive inequality join on real tables") {
    val err = ev.filter(col("event_id") % 3 === 0)
      .select(col("event_id"), col("user_id"), col("e_ms"))
    val all = ev.select(col("user_id").as("f_user"), col("e_ms").as("f_ms"), col("value"))
    val lo = -6 * 3600000L
    val hi = 0L
    val fast = RangeJoin.bucketed(err, all, "user_id", "f_user", "e_ms", "f_ms", lo, hi)
      .select(col("event_id"), col("f_ms")).orderBy(col("event_id"), col("f_ms"))
      .collect().toSeq
    val naive = err.join(all, col("user_id") === col("f_user") &&
        col("f_ms") >= col("e_ms") + lo && col("f_ms") < col("e_ms") + hi)
      .select(col("event_id"), col("f_ms")).orderBy(col("event_id"), col("f_ms"))
      .collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("range join plan: equi-join on (key, bucket), no cartesian or nested loop") {
    val err = ev.select(col("event_id"), col("user_id"), col("e_ms"))
    val all = ev.select(col("user_id").as("f_user"), col("e_ms").as("f_ms"), col("value"))
    val p = RangeJoin.bucketed(err, all, "user_id", "f_user", "e_ms", "f_ms", -3600000L, 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must block on buckets:\n${p.take(3000)}")
  }

  test("asof and range join match naive references on seeded random data (incl. null times, ties)") {
    val sp = spark; import sp.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      // small key space + coarse time grid force collisions, ties, and
      // empty keys; ~10% null right times exercise the null guard
      val left = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(50).toLong)).toDF("id", "k", "t")
      val right = (0 until 200).map { i =>
        val rt = if (rnd.nextInt(10) == 0) Option.empty[Long] else Some(rnd.nextInt(50).toLong)
        (rnd.nextInt(10).toLong, rt, i.toLong)
      }.toDF("rk", "rt", "p")
      val fast = AsofJoin.backward(left, right, "k", "rk", "t", "rt")
        .orderBy(col("id")).collect().toSeq
      val w = Window.partitionBy(col("id"))
        .orderBy(col("rt").desc_nulls_last, col("p").desc_nulls_last)
      val naive = left.join(right, col("k") === col("rk") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("id"), col("k"), col("t"), col("rt"), col("p"))
        .orderBy(col("id")).collect().toSeq
      assert(fast == naive, s"asof mismatch at seed $seed")

      val rVal = right.filter(col("rt").isNotNull)
        .select(col("rk").as("fk"), col("rt").as("ft"), col("p"))
      val fastR = RangeJoin.bucketed(left, rVal, "k", "fk", "t", "ft", -5L, 3L)
        .select(col("id"), col("ft"), col("p")).orderBy(col("id"), col("ft"), col("p"))
        .collect().toSeq
      val naiveR = left.join(rVal, col("k") === col("fk") &&
          col("ft") >= col("t") - 5L && col("ft") < col("t") + 3L)
        .select(col("id"), col("ft"), col("p")).orderBy(col("id"), col("ft"), col("p"))
        .collect().toSeq
      assert(fastR == naiveR, s"range mismatch at seed $seed")
      assert(fastR.nonEmpty)
    }
  }

  test("range join boundary: window [t+lo, t+hi) is half-open on both engines' ms grid") {
    val sp = spark; import sp.implicits._
    val left = Seq((1L, 1L, 1000L)).toDF("id", "k", "t")
    // rt at exactly t+lo (in), t+hi-1 (in), t+hi (out), t+lo-1 (out)
    val right = Seq((1L, 900L), (1L, 1099L), (1L, 1100L), (1L, 899L)).toDF("rk", "rt")
    val got = RangeJoin.bucketed(left, right, "k", "rk", "t", "rt", -100L, 100L)
      .select(col("rt")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(900L, 1099L))
  }

  test("ev04 approx latency percentiles sit within the pinned rank band of the exact path") {
    // the same 100 TB flag as sp15/q20 (round-13 verdict #6): the approx
    // path must return an ACTUAL latency whose rank lies within ±1/A
    // quantiles of the target; the exact path stays the DuckDB oracle
    val steps = Seq("view", "click", "purchase")
    // rebuild the aligned step times the engine uses (its own shared
    // builder), then the per-transition latency multisets in plain scala
    val evs = Tables.t(spark, sfDir, "events")
    val e2 = evs.select(col("user_id"), Tables.eventsTsMillis(evs).as("ts"),
      col("event_type"))
    val hits = graft.streaming.StreamingFunnel.batchReference(e2, steps)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Int]("step").toLong, r.getAs[Long]("t_ms")))
      .map { case (u, st, t) => (u, st) -> t }.toMap
    val lats: Map[Long, Seq[Long]] = Seq(1L, 2L).map { st =>
      st -> hits.collect { case ((u, s0), t) if s0 == st && hits.contains((u, st + 1)) =>
        hits((u, st + 1)) - t
      }.toSeq.sorted
    }.toMap
    def stats(approx: Boolean): Map[Long, (Long, Double, Double)] =
      Temporal.funnelLatencyStats(spark, sfDir, approx).collect()
        .map(r => r.getAs[Long]("step") ->
          (r.getAs[Long]("n_users"), r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val exact = stats(approx = false)
    val approx = stats(approx = true)
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    val eps = 1.0 / Sampling.ApproxAccuracy
    approx.foreach { case (st, (nu, p50, p90)) =>
      val sc = lats(st)
      assert(nu == sc.length.toLong, s"step $st latency multiset diverges")
      Seq((0.5, p50), (0.9, p90)).foreach { case (q, v) =>
        val n = sc.length
        val lo = math.max(0, math.floor((q - eps) * n).toInt - 1)
        val hi = math.min(n - 1, math.ceil((q + eps) * n).toInt)
        assert((lo to hi).exists(i => sc(i).toDouble == v),
          s"step $st q=$q: approx $v outside ranks [$lo,$hi] of n=$n latencies")
      }
    }
  }
}
