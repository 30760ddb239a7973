package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Recall evidence backing dd04's exact oracle: the LSH-verified output must
  * equal the exact unblocked >= 0.3 ground truth (zero missed pairs). The
  * corpora and hash permutations are fixed, so this is a deterministic fact,
  * not a per-run probability — see the dd04 entry in [[Dedup]].
  */
class DedupRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dd04 LSH-verified pairs equal the exact >= 0.3 ground truth (100% recall)") {
    // ground truth: every pair sharing >= 1 shingle (necessary for j >= 0.3),
    // exact set jaccard over the same hashed shingles, no LSH anywhere
    val docs = Tables.t(spark, sfDir, "documents")
    val wh = transform(split(lower(col("text")), " "), x => xxhash64(x))
    val sh = array_distinct(
      transform(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
        i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
    val base = docs.select(col("doc_id"), sh.as("sh"))
      .withColumn("n", size(col("sh"))).persist()
    val ex = base.select(col("doc_id"), explode(col("sh")).as("h"))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val truth = cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("n_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.3)

    val got = SparkEntry.queries("dd04_minhash_lsh")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

    val missed = truth.join(got, Seq("doc_a", "doc_b"), "left_anti").count()
    val extra = got.join(truth, Seq("doc_a", "doc_b"), "left_anti").count()
    val nTruth = truth.count()
    assert(nTruth > 0, "ground truth must be non-empty for the check to mean anything")
    assert(missed == 0, s"dd04 missed $missed of $nTruth true pairs — exact oracle is invalid")
    assert(extra == 0, s"dd04 emitted $extra pairs not in the ground truth")

    // the margin that makes 100% recall unsurprising: every true pair's
    // jaccard is far above the 0.3 threshold
    val minJ = truth.agg(min(col("jaccard"))).head().getDouble(0)
    assert(minJ >= 0.5, s"true-pair jaccard margin collapsed (min=$minJ); revisit the LSH banding")
  }

  test("dd04 band-bucket frequency cap never binds on the test corpus") {
    // The verifiedPairs pipeline drops band buckets with > BlockCap (1024)
    // docs — a worst-case bound for mass-duplicate corpora at scale. The
    // exact all-pairs oracle is only valid because the cap is inert here:
    // recompute the band-bucket occupancy and pin it far below the cap.
    val docs = Tables.t(spark, sfDir, "documents")
    // the ENGINE's shingle builder (zero-length-slice sub-trigram guard
    // included) — recomputing with a divergent formula here would measure
    // band keys the dd04 pipeline never builds
    val sh = Dedup.shingleHashes(col("text"))
    val sig = graft.spark.SketchExpressions.minhashSig(
      col("sh"), Dedup.permA.toIndexedSeq, Dedup.permB.toIndexedSeq, Dedup.Mask)
    val maxBucket = docs.select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"), sig.as("sig"))
      .select(posexplode(
        transform(sequence(lit(0), lit(15)), bnd =>
          xxhash64(slice(col("sig"), bnd * 4 + 1, lit(4))))).as(Seq("band", "bkey")))
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("bc"))
      .agg(max(col("bc"))).head().getLong(0)
    assert(maxBucket <= 64, s"band bucket occupancy $maxBucket approaches the 1024 cap; " +
      "the exact dd04/dd06 oracles would start to diverge from the capped engine")
  }

  test("bf02 count-min estimates never undercount and stay near-exact at fixture scale") {
    val rows = SparkEntry.queries("bf02_cms_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getAs[String]("tok"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_est")))
    assert(rows.length == 20)
    // the CMS guarantee: estimate >= exact, always
    rows.foreach { case (t, ex, est) => assert(est >= ex, s"$t: est $est < exact $ex") }
    // with ~vocab<<4096 counters, collisions are rare: most heavy hitters
    // should be estimated exactly (a loose sanity bound, not a probability)
    val exactly = rows.count { case (_, ex, est) => est == ex }
    assert(exactly >= 10, s"only $exactly/20 heavy hitters estimated exactly")
  }
}
