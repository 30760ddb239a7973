package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom membership prefilter: no false negatives (every build-side key
  * passes the probe), bounded false-positive rate near the configured fpp,
  * and the bf01 pipeline equals the exact join formulation — the property
  * that lets the prefilter compose with an exact confirm join without
  * changing results. */
class BloomFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no false negatives; false-positive rate stays near the configured fpp") {
    val sp = spark
    import sp.implicits._
    val build = (0L until 10000L).map(i => i * 2).toDF("h") // evens
    val bloom = BloomFunctions.buildLong(build, "h", 10000L, 0.01)
    // every member passes
    val members = build.filter(BloomFunctions.mightContain(bloom, col("h"))).count()
    assert(members == 10000L, s"false negatives: only $members of 10000 members passed")
    // non-members (odds) pass at ~fpp — allow 5x headroom on 10k probes
    val probes = (0L until 10000L).map(i => i * 2 + 1).toDF("h")
    val fps = probes.filter(BloomFunctions.mightContain(bloom, col("h"))).count()
    assert(fps <= 500L, s"false-positive rate ${fps / 10000.0} far above configured 0.01")
    assert(BloomFunctions.deserialize(bloom).expectedFpp() <= 0.02)
  }

  test("bf01 bloom pipeline equals the exact formulation (dd07 oracle semantics)") {
    val bloomRows = graft.SparkEntry.queries("bf01_bloom_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val exactRows = graft.SparkEntry.queries("dd07_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(bloomRows == exactRows,
      s"bloom prefilter changed results:\n  bloom: $bloomRows\n  exact: $exactRows")
  }

  test("bf01 build launches no sizing count() job (footer-sized bloom)") {
    // the bloom used to be sized with corpusFp.count() — a second full
    // corpus-side aggregation job per build ("count at Dedup.scala" in the
    // job callsites). Sizing now comes from the parquet footer (an upper
    // bound is all a Bloom needs), so the construction-time jobs are only
    // the sketch aggregate (+ its AQE sub-jobs) and the parquet schema read
    // — no `count at` callsite anywhere.
    val stageNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        js.stageInfos.foreach(si => stageNames.add(si.name))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.SparkEntry.queries("bf01_bloom_incremental")(spark, sfDir)
      Thread.sleep(1000) // listener bus drains async
      val names = stageNames.toArray(Array.empty[String])
      val counts = names.filter(_.startsWith("count at"))
      assert(counts.isEmpty,
        s"bf01 construction still runs a sizing count() job: ${counts.mkString(", ")}")
      // sanity: construction does run jobs (the sketch aggregate at least) —
      // an empty capture would make the count-free assertion vacuous. AQE
      // renames warm-session stages, so only presence is checked, not names.
      assert(names.nonEmpty, "expected construction-time jobs in the capture")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bf01 plan: the bloom probe filters the increment BEFORE the confirm join") {
    val p = graft.SparkEntry.queries("bf01_bloom_incremental")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "bloom probe missing from the plan\n" + p.take(3000))
    // the probe must be a Filter below the join, not applied after it: in the
    // executed plan string the might_contain filter appears on the semi-join's
    // left (streamed) input subtree
    val joinIdx = p.indexOf("LeftSemi")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "expected the might_contain filter inside the semi-join's input subtree\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }
}
