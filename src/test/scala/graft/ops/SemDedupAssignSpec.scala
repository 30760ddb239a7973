package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** dd11's two-level centroid assignment (the N·K → N·2√K fix).
  *
  * Pins: (1) the dispatch boundary — every oracle-checked scale (K=8
  * floor) takes the FLAT path whose argmin the DuckDB oracle replays
  * verbatim; (2) machinery correctness of the hierarchical path — each
  * vector's cluster really is the argmin within its selected group, and
  * assignments are total/deterministic; (3) the documented approximation
  * is bounded — agreement with the flat argmin on the fixture corpus at a
  * forced K in the hierarchical regime stays above a floor (IVF-style
  * coarse pruning loses some vectors to group-local optima; dd11 needs
  * the ~1024 population target, not any specific centroid). */
class SemDedupAssignSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

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

  private def v = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    emb.withColumn("nrm", sqrt(graft.spark.VectorExpressions.dot(col("vec"), col("vec"))))
  }

  test("driver-scale K dispatches to the flat path (identical output)") {
    val k = math.max(8L, Tables.rowCount(spark, dir, "embeddings") / 1024L).toInt
    assert(k <= Similarity.SemHierK, s"driver fixtures must stay flat, got K=$k")
    val a = Similarity.semdedupAssign(v, k).select("vec_id", "cluster").collect()
    val b = Similarity.semdedupAssignFlat(v, k).select("vec_id", "cluster").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("hierarchical path: total, deterministic, and group-locally optimal") {
    val k = 36 // forces the two-level path (G=6 groups of 6)
    assert(k > Similarity.SemHierK)
    val out = Similarity.semdedupAssignHier(v, k)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = Tables.rowCount(spark, dir, "embeddings")
    assert(out.size == n, s"assignment must be total: ${out.size} of $n")
    // determinism: a second run produces the identical map
    val out2 = Similarity.semdedupAssignHier(v, k)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == out2)
    // probe-local optimality: replay the two-level rule driver-side for a
    // sample — anchors are the G lowest cids, centroids group by their
    // single nearest anchor, a vector probes its TWO nearest anchors and
    // its cluster must be the argmin over the union of both groups
    val vecs = v.select("vec_id", "vec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val cents = (0L until k.toLong).map(c => c -> vecs(c)).toMap
    val g = math.ceil(math.sqrt(k.toDouble)).toInt
    val anchorIds = (0L until g.toLong)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def anchorsByDist(x: Array[Double]): Seq[Long] =
      anchorIds.sortBy(a => (d2(x, vecs(a)), a))
    val groupOf = cents.keys.map(c => c -> anchorsByDist(cents(c)).head).toMap
    out.take(200).foreach { case (vid, cl) =>
      val probes = anchorsByDist(vecs(vid)).take(2).toSet
      val members = cents.keys.filter(c => probes.contains(groupOf(c)))
      val best = members.minBy(c => (d2(vecs(vid), cents(c)), c))
      assert(cl == best, s"vec $vid: cluster $cl is not the probed argmin $best")
    }
  }

  test("hierarchical path stays total when byte-identical anchors empty a group") {
    // anchors 0 and 1 are byte-identical: every distance tie (including
    // anchor 1's own self-assignment) breaks to acid 0, so GROUP 1 IS
    // EMPTY — yet vectors at that location still probe p1=0, p2=1. With
    // inner probe joins those rows silently vanished; the left joins +
    // other-probe fallback must keep the assignment total.
    val sp = spark
    import sp.implicits._
    val k = 36
    assert(k > Similarity.SemHierK)
    val rnd = new scala.util.Random(5)
    def rv(): Seq[Double] = Seq.fill(4)(rnd.nextDouble() * 2 - 1)
    val dup = rv()
    val rows = (0L until 200L).map(i => (i, if (i <= 1L) dup else rv()))
    val dv = rows.toDF("vec_id", "vec")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(graft.spark.VectorExpressions.dot(col("vec"), col("vec"))))
    val out = Similarity.semdedupAssignHier(dv, k)
      .select("vec_id", "cluster").collect()
    assert(out.length == 200, s"assignment must stay total, got ${out.length} of 200")
    assert(out.forall(!_.isNullAt(1)), "no vector may get a null cluster")
    // the duplicated pair itself probes the empty group (p1=0, p2=1) and
    // must land on centroid 0 via the fallback (distance 0, tie to lowest)
    val byId = out.map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byId(0L) == 0L && byId(1L) == 0L, s"dup anchors: ${byId(0L)}, ${byId(1L)}")
  }

  test("agreement with the flat argmin stays above the documented floor") {
    val k = 36
    val flat = Similarity.semdedupAssignFlat(v, k)
      .select(col("vec_id"), col("cluster").as("cf"))
    val hier = Similarity.semdedupAssignHier(v, k)
      .select(col("vec_id"), col("cluster").as("ch"))
    val joined = flat.join(hier, Seq("vec_id"))
    val total = joined.count()
    val agree = joined.filter(col("cf") === col("ch")).count()
    val rate = agree.toDouble / total
    // measured 0.598 at K=36/nprobe=2 on the near-isotropic fixture
    // embeddings (IVF pruning's adversarial worst case — clustered real
    // embeddings sit far higher); floor set with headroom — a machinery
    // regression (wrong grouping, anchor drift, probe loss) collapses
    // agreement toward the 1/K baseline, far below this
    assert(rate >= 0.5, s"agreement $rate ($agree/$total) below floor")
  }
}
