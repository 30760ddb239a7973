package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** mm10 — the multimodal-curation capstone (pp04's composition discipline
  * for the media family).
  *
  * Pins: (1) the exact per-stage totals at sf0.01 (the values the DuckDB
  * oracle independently produces — the registry re-checks every round);
  * (2) per-stage NON-VACUITY at sf0.01: every gate in the chain drops at
  * least one document, so the composition can never silently degrade to a
  * pass-through when a threshold or fixture drifts; (3) structural
  * invariants at both dev scales (6 stages per source, per-source monotone
  * attrition in docs AND bytes); (4) the lineage-severed result reads no
  * parquet and construction releases its corpus-sized cache. */
class MultimodalPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def run(d: String = sfDir) =
    graft.SparkEntry.queries("mm10_multimodal_pipeline")(spark, d)

  private def totals(d: String): Seq[(Long, String, Long, Long)] =
    run(d).groupBy("stage_ord", "stage")
      .agg(org.apache.spark.sql.functions.sum("n_docs").as("nd"),
        org.apache.spark.sql.functions.sum("n_bytes").as("nb"))
      .orderBy("stage_ord").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("sf0.01 per-stage totals match the oracle-verified values exactly") {
    val expected = Seq(
      (0L, "raw", 500L, 149174L),
      (1L, "framed", 486L, 148353L),
      (2L, "energy", 293L, 91289L),
      (3L, "shots", 277L, 84878L),
      (4L, "exact_phash", 230L, 72285L),
      (5L, "near_dedup", 151L, 47457L))
    assert(totals(sfDir) == expected)
  }

  test("every gate binds at sf0.01 (per-stage non-vacuity)") {
    val docs = totals(sfDir).map(_._3)
    docs.zip(docs.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(b < a, s"stage ${i + 1} dropped nothing (${a} -> ${b}) — " +
        "a vacuous gate means the composition degraded to a pass-through")
    }
  }

  test("structural invariants hold at every fixture scale") {
    for (d <- Seq("/root/testdata/sf0.001", sfDir)) {
      val rows = run(d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      // 6 stages per source, every source present in every stage row-set
      val bySrc = rows.groupBy(_._1)
      assert(bySrc.values.forall(_.length == 6))
      // per-source attrition is monotone non-increasing in docs AND bytes
      for ((src, rs) <- bySrc) {
        val ord = rs.sortBy(_._2)
        val ds = ord.map(_._4)
        val bs = ord.map(_._5)
        assert(ds.zip(ds.tail).forall { case (a, b) => b <= a },
          s"$src docs not monotone: ${ds.mkString(",")}")
        assert(bs.zip(bs.tail).forall { case (a, b) => b <= a },
          s"$src bytes not monotone: ${bs.mkString(",")}")
        assert(ds.zip(bs).forall { case (nd, nb) => (nd == 0) == (nb == 0) })
      }
    }
  }

  test("the attrition result reads no parquet and releases its cache") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = run()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      "final plan must not re-scan any table\n" + plan.take(3000))
    df.collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // one localCheckpoint artifact may remain; the corpus-sized flagged
    // cache must be released by construction
    assert(after - before <= 1,
      s"stage caches leaked: persistent RDDs grew $before -> $after")
  }
}
