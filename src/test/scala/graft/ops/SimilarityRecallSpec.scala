package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Pins ss03's approximation quality: multi-table LSH recall@3 vs ss01's exact
  * top-3 on the same queries. The corpus and hyperplanes are deterministic, so
  * the measured recall is a fixed fact of the configuration (16 tables x 5
  * bits), not a flaky sample — measured 0.8 at sf0.01 on embeddings whose
  * true neighbors sit at cosine 0.31-0.45 (near-random, the hardest ANN
  * regime; clustered real-world embeddings only do better).
  */
class SimilarityRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("ss03 ANN recall@3 >= 0.7 vs ss01 exact top-3, with full per-query output") {
    val exact = SparkEntry.queries("ss01_cosine_topk")(spark, sfDir)
      .filter(col("rank") <= 3).select(col("q_id"), col("neighbor_id")).persist()
    val ann = SparkEntry.queries("ss03_ann_lsh")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id")).persist()

    val total = exact.count()
    assert(total > 0, "exact ground truth must be non-empty")
    val hits = ann.join(exact, Seq("q_id", "neighbor_id")).count()
    val recall = hits.toDouble / total
    assert(recall >= 0.7, s"ss03 recall@3 = $recall ($hits/$total) — below the pinned 0.7 floor")

    // every query that has exact neighbors must also get a full ANN top-3
    // (candidates exist: recall >= 0.7 implies non-empty buckets per query)
    val annPerQ = ann.groupBy("q_id").count()
    val short = annPerQ.filter(col("count") < 3).count()
    assert(short == 0, s"$short queries returned fewer than 3 ANN neighbors")
  }

  test("ss03 hot-bucket cap is inert at oracle scales (occupancy far below BucketCap)") {
    // the exact DuckDB oracle replays the UNCAPPED pipeline, which is only
    // valid while no (table, code) bucket exceeds BucketCap at the driver's
    // correctness scales — pin the headroom so growth in the fixture or a
    // code-length change resurfaces here before it flips the oracle
    val maxOcc = Similarity.lshBucketCensus(spark, sfDir)
      .agg(max(col("occ"))).head().getLong(0)
    assert(maxOcc <= Similarity.BucketCap / 4,
      s"max bucket occupancy $maxOcc is within 4x of BucketCap ${Similarity.BucketCap} — " +
        "the capped engine would diverge from the uncapped oracle")
  }

  test("ss04 IVF recall@3 and candidate fraction vs ss01 exact top-3") {
    val exact = SparkEntry.queries("ss01_cosine_topk")(spark, sfDir)
      .filter(col("rank") <= 3).select(col("q_id"), col("neighbor_id")).persist()
    val ivf = SparkEntry.queries("ss04_ann_ivf")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id")).persist()

    val total = exact.count()
    assert(total > 0)
    val hits = ivf.join(exact, Seq("q_id", "neighbor_id")).count()
    val recall = hits.toDouble / total
    // Deterministic fact of (stride-61 anchors, nprobe 4) on this corpus:
    // recall@3 = 0.80 at sf0.01 (9 anchors, ~44% scanned/query) and 0.45 at
    // sf0.1 (33 anchors, ~12% scanned) — near-random embeddings are IVF's
    // worst case (bucket membership barely correlates with neighbor
    // identity); clustered real-world embeddings only do better at the same
    // probed fraction.
    assert(recall >= 0.75, s"ss04 IVF recall@3 = $recall ($hits/$total) — below the pinned 0.75 (measured 0.80)")
    assert(ivf.groupBy("q_id").count().filter(col("count") < 3).count() == 0,
      "every query must fill its top-3 from the probed buckets")
  }

  test("ss07 quantized-candidate recall@5 vs ss01 exact top-5") {
    val exact = SparkEntry.queries("ss01_cosine_topk")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id")).persist()
    val quant = SparkEntry.queries("ss07_quantized_rescore")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id")).persist()
    val total = exact.count()
    assert(total > 0)
    val hits = quant.join(exact, Seq("q_id", "neighbor_id")).count()
    val recall = hits.toDouble / total
    // int8 absmax quantization keeps ranking nearly intact: the top-20
    // integer-dot candidate pool recovers the exact top-5 fully
    // (measured 1.0 at sf0.01); the floor leaves room for corpus drift only
    assert(recall >= 0.9, s"ss07 recall@5 = $recall ($hits/$total) — below the pinned 0.9 floor")
    assert(quant.groupBy("q_id").count().filter(col("count") < 5).count() == 0,
      "every query must fill its rescored top-5")
  }

  test("ss08 MMR: rank-1 is the relevance top-1, picks distinct, greedy scores non-increasing") {
    val exact = SparkEntry.queries("ss01_cosine_topk")(spark, sfDir)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("neighbor_id")).toMap
    val mmr = SparkEntry.queries("ss08_mmr_topk")(spark, sfDir).collect()
    val byQ = mmr.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("rank"))
      // the first MMR pick has no diversity penalty — it IS the relevance argmax
      assert(ordered.head.getAs[Long]("neighbor_id") == exact(qid),
        s"q$qid: MMR rank-1 ${ordered.head.getAs[Long]("neighbor_id")} != exact top-1 ${exact(qid)}")
      // three distinct picks per query
      assert(ordered.map(_.getAs[Long]("neighbor_id")).distinct.length == 3, s"q$qid picks not distinct")
      // greedy objective is non-increasing: the diversity penalty only grows
      // as the selected set grows
      val scores = ordered.map(_.getAs[Double]("mmr"))
      assert(scores.zip(scores.tail).forall { case (a, b) => b <= a + 1e-12 },
        s"q$qid: MMR scores increased: ${scores.toSeq}")
    }
  }

  /** Exact squared-L2 ground truth for the PQ family (ADC approximates L2,
    * not cosine — comparing against ss01 would conflate metric and
    * quantization error). */
  private def exactL2Top5() = {
    import org.apache.spark.sql.expressions.Window
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val q = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("vec").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    broadcast(q).join(v, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.spark.VectorExpressions.sqdist(col("qv"), col("vec")).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id")).persist()
  }

  test("ss10 raw-ADC recall@5 vs exact L2 — the candidate-stage baseline") {
    val exact = exactL2Top5()
    val total = exact.count()
    assert(total > 0)
    val adc = SparkEntry.queries("ss10_pq_adc")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id"))
    val recall = adc.join(exact, Seq("q_id", "neighbor_id")).count().toDouble / total
    // Deterministic fact of (M=8 x 8-dim subspaces, sampled 256-codebook) on
    // this corpus: raw ADC ranking measures 0.28 at sf0.01 / 0.22 at sf0.1 —
    // near-isotropic embeddings are PQ's worst case (subspace cells barely
    // correlate with full-space neighborhoods), which is exactly WHY
    // production PQ serves as the candidate stage under an exact rescore
    // (ss11's stage 2 / ss07's pattern), not as the final ranking.
    assert(recall >= 0.2, s"ss10 raw-ADC recall@5 = $recall — below the pinned 0.2 floor (measured 0.28)")
    exact.unpersist()
  }

  test("ss11 IVFADC-with-rescore recall@5 vs exact L2") {
    val exact = exactL2Top5()
    val total = exact.count()
    assert(total > 0)
    val ivfadc = SparkEntry.queries("ss11_ivfadc")(spark, sfDir)
      .select(col("q_id"), col("neighbor_id"))
    val recall = ivfadc.join(exact, Seq("q_id", "neighbor_id")).count().toDouble / total
    // measured 0.56 at sf0.01 (0.39 at sf0.1): the exact rescore recovers
    // everything the PROBED buckets contain, so the remaining loss is the
    // ss04 probe ceiling (NProbe=4 coarse buckets on near-random data — the
    // documented IVF worst case), not ADC error
    assert(recall >= 0.5, s"ss11 IVFADC recall@5 = $recall — below the pinned 0.5 floor (measured 0.56)")
    exact.unpersist()
  }

  test("ss18 incremental-index recall vs ss17 one-shot recall — the drift measurement") {
    // The ss16 log's artifacts are FROZEN on the first-half corpus, so its
    // recall is a DIFFERENT number from ss17's (whose index trains on the
    // full corpus) — this is the number a deployment watches to decide when
    // to trigger the periodic full retrain (AnnIndex's documented trade).
    // Direction is corpus-dependent: the frozen init slice yields FEWER
    // anchors (stride floors), so each probed bucket holds MORE of the
    // corpus — recall can come out HIGHER at higher serve cost (measured
    // +0.12 at sf0.01), while at sf0.1 the two measure equal (0.38 vs
    // 0.39). The pin is a floor + a band around the one-shot number:
    // real drift (artifacts pathologically stale) blows past both.
    def meanRecall(name: String): Double =
      SparkEntry.queries(name)(spark, sfDir)
        .agg(avg(col("recall_at_5"))).head().getDouble(0)
    val oneShot = meanRecall("ss17_ann_recall")
    val incremental = meanRecall("ss18_incremental_recall")
    // scale-free invariants first: both harnesses produce a live number
    // and neither arm collapses (a dead serve path or an empty exact arm
    // reads as recall 0/NaN at ANY fixture)
    assert(oneShot > 0.0 && oneShot <= 1.0, s"implausible one-shot recall $oneShot")
    assert(incremental > 0.0 && incremental <= 1.0,
      s"implausible incremental recall $incremental")
    // loose scale-free floor so repointing the fixture at another scale
    // degrades to a WEAK absolute check instead of none at all: an IVF
    // probe that retains any real fraction of its buckets clears 0.2 at
    // every scale we've measured (0.68 at sf0.01, 0.38-0.39 at sf0.1);
    // recall below it means a broken serve path, not corpus drift
    assert(oneShot >= 0.2, s"one-shot recall $oneShot below scale-free 0.2 floor")
    assert(incremental >= 0.2, s"incremental recall $incremental below scale-free 0.2 floor")
    // the ABSOLUTE constants below are facts of THIS fixture (measured
    // 0.68 incremental / +0.12 vs one-shot at sf0.01; equal at sf0.1) —
    // direction and magnitude are corpus-dependent, so they gate on the
    // fixture they were measured at rather than flaking on a new scale
    if (sfDir.endsWith("sf0.01")) {
      assert(incremental >= 0.5,
        s"incremental-index recall@5 = $incremental — below the 0.5 floor (measured 0.68)")
      assert(math.abs(incremental - oneShot) <= 0.25,
        s"incremental recall $incremental drifted more than 0.25 from one-shot $oneShot")
    }
  }

  test("ss15 semi-hard negatives match an independent scala replay exactly") {
    val rows = SparkEntry.queries("ss15_hard_negatives")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))

    // independent replay: same FaceNet criterion computed with plain loops
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), r.getInt(2), v)
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = vs.filter(_._1 % 50 == 0).toSeq.flatMap { case (aid, alab, av) =>
      val others = vs.filter(_._1 != aid)
      val sameLab = others.filter(_._2 == alab)
      if (sameLab.isEmpty) Seq.empty
      else {
        val pos = sameLab.map(o => cos(av, o._3)).max
        others.filter(_._2 != alab)
          .map(o => (o._1, cos(av, o._3)))
          .filter(_._2 < pos)
          .sortBy { case (id, c) => (-c, id) }
          .take(5).zipWithIndex
          .map { case ((nid, c), i) => (aid, nid, c, pos, i + 1) }
      }
    }.sortBy(t => (t._1, t._5))

    assert(rows.length == expected.length)
    assert(rows.length > 0, "fixture must produce semi-hard negatives")
    rows.zip(expected).foreach { case (got, exp) =>
      assert(got._1 == exp._1 && got._2 == exp._2 && got._5 == exp._5,
        s"rank/id mismatch: $got vs $exp")
      assert(math.abs(got._3 - exp._3) < 1e-12 && math.abs(got._4 - exp._4) < 1e-12,
        s"cosine mismatch: $got vs $exp")
    }
    // the criterion itself, restated on the output: strictly semi-hard
    rows.foreach { case (a, _, c, p, _) =>
      assert(c < p, s"anchor $a emitted a negative at cos $c >= pos_cos $p")
    }
  }

  test("sp16 coverage selection matches an independent scala replay exactly") {
    val rows = SparkEntry.queries("sp16_cluster_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val vs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)
      }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0; while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val stride = math.max(61L, vs.length.toLong / 4096L)
    val anchors = vs.filter(_._1 % stride == 7)
    assert(anchors.length >= 2, "fixture must yield multiple coverage regions")
    val assigned = vs.map { case (id, v) =>
      // argmax cosine, ties to the smaller anchor id
      val (aid, c) = anchors.map(a => (a._1, cos(v, a._2)))
        .reduceLeft((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)
      (aid, id, c)
    }
    val expected = assigned.groupBy(_._1).toSeq.flatMap { case (aid, ds) =>
      ds.sortBy(t => (-t._3, t._2)).take(8).zipWithIndex
        .map { case ((_, id, c), i) => (aid, id, c, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (got, exp) =>
      assert(got._1 == exp._1 && got._2 == exp._2 && got._4 == exp._4,
        s"selection mismatch: $got vs $exp")
      assert(math.abs(got._3 - exp._3) < 1e-12, s"cosine mismatch: $got vs $exp")
    }
    // balance: no region exceeds M; each region with >= 8 members keeps exactly 8
    rows.groupBy(_._1).foreach { case (aid, ks) =>
      assert(ks.length <= 8, s"region $aid kept ${ks.length} > 8")
      val members = assigned.count(_._1 == aid)
      if (members >= 8) assert(ks.length == 8, s"region $aid kept ${ks.length} of $members")
    }
  }
}
