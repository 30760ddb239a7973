package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** sp03's two-level prefix sum must equal the naive global-window packing,
  * and the split assignment must be deterministic and exhaustive. */
class SamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("sp03 two-level prefix sum equals the naive unpartitioned-window packing") {
    val fast = graft.SparkEntry.queries("sp03_pack_shards")(spark, sfDir).collect().toSeq
    val toks = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("bigint").as("tokens"))
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = toks
      .withColumn("cum_end", sum(col("tokens")).over(w))
      .withColumn("shard", ((col("cum_end") - col("tokens")) / 4096L).cast("bigint"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard")).collect().toSeq
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("sp03 shards are contiguous, budget-sized, and cover every doc") {
    val rows = graft.SparkEntry.queries("sp03_pack_shards")(spark, sfDir).collect()
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // contiguous doc ranges: each shard starts right after the previous ends
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("first_doc") == a.getAs[Long]("last_doc") + 1)
      case _ =>
    }
    // budget-crossing invariant: the first doc of the NEXT shard starts at
    // the cumulative token offset through this shard, and its shard id is
    // that offset DIV 4096 — so the running total through shard k must reach
    // next.shard * 4096 (a single doc longer than the budget may skip shard
    // ids, hence next.shard, not k+1)
    var prefix = 0L
    rows.sliding(2).foreach {
      case Array(a, b) =>
        prefix += a.getAs[Long]("sum_tokens")
        assert(prefix >= b.getAs[Long]("shard") * 4096L,
          s"shard ${a.getAs[Long]("shard")} under-filled: prefix=$prefix next=${b.getAs[Long]("shard")}")
        assert(prefix / 4096L == b.getAs[Long]("shard"),
          s"next shard id must be the prefix's budget bucket")
      case _ =>
    }
  }

  test("adaptive block size keeps the sequential block-summary window bounded") {
    // floor: tiny corpora use the 500-doc minimum (blocks ≥ scheduling quantum)
    assert(Sampling.blockSizeFor(500L, 32) == 500L)
    assert(Sampling.blockSizeFor(100000L, 1000) == 500L)
    // scale: #blocks = ceil(docs / blockSize) stays ≈ parallelism at ANY
    // corpus size — the sequential window never grows with the corpus
    for ((docs, par) <- Seq((1e7.toLong, 32), (1e9.toLong, 1024), (1e11.toLong, 32000))) {
      val bs = Sampling.blockSizeFor(docs, par)
      val nBlocks = (docs + bs - 1) / bs
      assert(nBlocks <= par + 1, s"docs=$docs par=$par blocks=$nBlocks")
      assert(nBlocks >= par / 2, s"docs=$docs par=$par blocks=$nBlocks")
    }
    // degenerate parallelism never divides by zero
    assert(Sampling.blockSizeFor(1000L, 0) == 1000L)
  }

  test("hash split is deterministic across runs and exhaustive") {
    val a = graft.SparkEntry.queries("sp01_hash_split")(spark, sfDir).collect().toSeq
    val b = graft.SparkEntry.queries("sp01_hash_split")(spark, sfDir).collect().toSeq
    assert(a == b)
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val splits = a.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
    // 80/10/10 within coarse tolerance on 500 docs
    val train = a.find(_.getAs[String]("split") == "train").get.getAs[Long]("n_docs")
    assert(train > nDocs * 6 / 10 && train < nDocs * 95 / 100, s"train=$train of $nDocs")
  }

  test("sp04 two-level shuffle rank equals the naive global window, is a permutation, and scatters") {
    val fast = graft.SparkEntry.queries("sp04_shuffle_order")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).toSeq
    val naive = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        (row_number().over(Window.orderBy(
          md5(concat(col("doc_id").cast("string"), lit(":42"))))) - 1).cast("bigint").as("pos"))
      .orderBy(col("pos"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).toSeq
    assert(fast == naive)
    // positions are exactly 0..n-1 (a permutation, no gap/dup from the
    // bucket-offset arithmetic)
    assert(fast.map(_._2) == (0L until fast.length.toLong))
    // and the order is actually shuffled, not accidentally doc_id order
    assert(fast.map(_._1) != fast.map(_._1).sorted)
  }

  test("sp10 waterfill: budget exhausted, caps respected, leftover split evenly") {
    val rows = graft.SparkEntry.queries("sp10_unimax_budget")(spark, sfDir).collect().toSeq
    val toks = rows.map(r => r.getAs[Long]("toks"))
    val alloc = rows.map(r => r.getAs[Double]("alloc"))
    val epochs = rows.map(r => r.getAs[Double]("epochs"))
    val total = toks.sum
    val budget = 0.8 * total
    val caps = toks.map(1.1 * _)
    // no source exceeds its epoch cap
    alloc.zip(caps).foreach { case (a, c) => assert(a <= c + 1e-6, s"alloc $a > cap $c") }
    // epochs = alloc / toks by construction
    rows.indices.foreach(i => assert(math.abs(epochs(i) - alloc(i) / toks(i)) < 1e-12))
    // the budget is exactly exhausted when the caps don't cover it
    if (caps.sum > budget) assert(math.abs(alloc.sum - budget) < 1e-6,
      s"allocated ${alloc.sum} != budget $budget")
    else assert(alloc == caps)
    // every uncapped source gets the same theta, and theta exceeds every
    // capped source's cap (the waterline is above the full-grant caps)
    val uncapped = alloc.zip(caps).filter { case (a, c) => a < c - 1e-6 }.map(_._1)
    if (uncapped.nonEmpty) {
      assert(uncapped.distinct.size == 1, s"unequal theta: $uncapped")
      val theta = uncapped.head
      alloc.zip(caps).filter { case (a, c) => a >= c - 1e-6 }
        .foreach { case (_, c) => assert(c <= theta + 1e-6, s"capped cap $c above theta $theta") }
    }
    // deterministic across runs
    val again = graft.SparkEntry.queries("sp10_unimax_budget")(spark, sfDir).collect().toSeq
    assert(rows.map(_.toSeq) == again.map(_.toSeq))
  }

  test("sp12 boundaries are in-order, start at the straddle offset, and cover all docs") {
    val rows = graft.SparkEntry.queries("sp12_pack_examples")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("example_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("boundaries_csv"))).toSeq
    val totalDocs = Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == totalDocs, "every doc packs into exactly one example")
    rows.foreach { case (ex, nDocs, _, csv) =>
      val offs = csv.split(",").map(_.toLong).toSeq
      assert(offs.length == nDocs.toInt)
      // offsets are strictly increasing within [0, 1024) — each doc STARTS
      // inside its example (straddlers may extend past the end by design)
      assert(offs == offs.sorted && offs.distinct == offs, s"ex $ex offsets $offs")
      assert(offs.head >= 0 && offs.last < 1024L, s"ex $ex offsets $offs")
    }
    // examples are dense from 0 and per-example token mass keeps the grid:
    // example k starts at global token k*1024 (first offset consistent with
    // the cumulative sums of everything before it)
    val cumBefore = rows.sortBy(_._1).scanLeft(0L)(_ + _._3).init
    rows.sortBy(_._1).zip(cumBefore).foreach { case ((ex, _, _, csv), cum) =>
      val firstStart = ex * 1024L + csv.split(",").head.toLong
      assert(firstStart >= cum, s"ex $ex first doc starts before prior mass")
    }
  }

  test("sp11 stacked two-level ranks equal the naive windows and round-robin across tiers") {
    val rows = graft.SparkEntry.queries("sp11_curriculum_interleave")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tier"),
        r.getAs[Long]("r"), r.getAs[Long]("pos"))).toSeq
    // naive single-window formulation: per-tier md5 rank, then one global
    // rank over (r, tier) — must match the stacked two-level form exactly
    val toks = size(split(trim(col("text")), "\\s+")).cast("bigint")
    val naive = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), toks.as("tokens"),
        md5(concat(col("doc_id").cast("string"), lit(":cur3"))).as("k"))
      .withColumn("tier", when(col("tokens") <= 1L, lit(1L))
        .otherwise(expr("shiftleft(1L, length(bin(tokens - 1)))")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("tier")).orderBy(col("k"))).cast("bigint"))
      .withColumn("pos", (row_number().over(
        Window.orderBy(col("r"), col("tier"))) - 1).cast("bigint"))
      .select(col("doc_id"), col("tier"), col("r"), col("pos"))
      .orderBy(col("pos"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tier"),
        r.getAs[Long]("r"), r.getAs[Long]("pos"))).toSeq
    assert(rows == naive)
    // pos is a permutation of 0..n-1
    assert(rows.map(_._4) == (0L until rows.length.toLong))
    // round-robin invariant: within a round r, tiers appear in ascending
    // order with no tier repeated, and rounds are emitted in ascending order
    rows.grouped(1).foreach(_ => ())
    val byRound = rows.map(t => (t._3, t._2))
    assert(byRound == byRound.sorted, "positions must order by (round, tier)")
    byRound.groupBy(_._1).foreach { case (r, ts) =>
      val tiers = ts.map(_._2)
      assert(tiers.distinct == tiers, s"tier repeated within round $r")
    }
    // every round except possibly trailing ones draws from >1 tier while
    // multiple tiers still have docs (the interleaving actually mixes)
    val tierSizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val fullRounds = tierSizes.values.min.toLong
    byRound.groupBy(_._1).filter(_._1 <= fullRounds).foreach { case (r, ts) =>
      assert(ts.size == tierSizes.size, s"round $r missing a live tier")
    }
  }

  test("sp14 DSIR scores match an independent scala replay; target slice scores higher") {
    val got = graft.SparkEntry.queries("sp14_dsir_resample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))

    // independent replay of the whole model with plain collections
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bkt(tok: String): String =
      md.digest(tok.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString
    val tokRe = "[a-z]{2,}".r
    def toks(text: String): Seq[String] = tokRe.findAllIn(text.toLowerCase).toSeq
    val allToks = docs.toSeq.flatMap { case (id, src, lang, text) =>
      toks(text).map(t => (id, src, lang, bkt(t)))
    }
    val rCnt = allToks.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val tCnt = allToks.filter(_._3 == "en").groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val rTot = allToks.size.toLong
    val tTot = allToks.count(_._3 == "en").toLong
    def w(b: String): Double =
      math.log((tCnt.getOrElse(b, 0L) + 1).toDouble / (tTot + 256).toDouble) -
        math.log((rCnt.getOrElse(b, 0L) + 1).toDouble / (rTot + 256).toDouble)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-doc sum in token order — the same order both engines accumulate in
    val scores = allToks.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => round6(ts.map(t => w(t._4)).sum)).toSeq
      .map { case ((id, src), sc) => (id, src, sc) }
    val expected = scores.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (-d._3, d._1)).take(20).zipWithIndex
        .map { case ((id, src, sc), i) => (id, src, sc, i + 1) }
    }.sortBy(t => (t._2, t._4))

    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4, s"selection mismatch: $g vs $e")
      // engine sums floats in the same token order; 6dp rounding on both
      // sides makes equality exact unless a sum sits within ~1e-13 of a
      // rounding boundary — allow one ulp of the 6th decimal
      assert(math.abs(g._3 - e._3) <= 1e-6 + 1e-12, s"score mismatch: $g vs $e")
    }
    // model sanity: the target (lang='en') slice must average a higher LLR
    // than the rest — the direction DSIR selection exists to exploit
    val byLang = allToks.groupBy(t => (t._1, t._3)).view
      .mapValues(ts => ts.map(t => w(t._4)).sum).toSeq
    val (en, rest) = byLang.partition(_._1._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enAvg = en.map(_._2).sum / en.size
    val restAvg = rest.map(_._2).sum / rest.size
    assert(enAvg > restAvg,
      s"target-slice mean LLR $enAvg must exceed non-target $restAvg")
  }

  test("sp15 band flags replay the interpolated per-source quantiles exactly") {
    val rows = graft.SparkEntry.queries("sp15_perplexity_band")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, ds) =>
      // the engines' shared interpolation: lo + (hi - lo) * frac
      val sc = ds.map(_._3).sorted
      def q(p: Double): Double = {
        val pos = (sc.length - 1) * p
        val i = math.floor(pos).toInt
        if (i + 1 < sc.length) sc(i) + (sc(i + 1) - sc(i)) * (pos - i) else sc(i)
      }
      val (p25, p75) = (q(0.25), q(0.75))
      ds.foreach { case (id, _, s0, keep) =>
        assert(keep == (s0 >= p25 && s0 <= p75),
          s"source $src doc $id: score $s0 vs band [$p25, $p75], keep=$keep")
      }
      // a quartile band keeps roughly the middle half (ties can widen it)
      val kept = ds.count(_._4)
      assert(kept >= ds.length / 3 && kept <= ds.length * 9 / 10,
        s"source $src kept $kept of ${ds.length} — not a middle band")
    }
  }

  test("withinRankBand == the literal sorted-index band scan on 400 random groups") {
    // the q23/ev08/sp19 rows stand on this helper: its rank-stat
    // formulation (lt/le conditional sums) must equal literally scanning
    // the sorted band [lo, hi] for the value — including the corners the
    // algebra can get wrong (value absent from the group, value present
    // only OUTSIDE the band, band clamped at 0 / n-1, duplicated values
    // straddling the band edge)
    val sp = spark
    import sp.implicits._
    val r = new scala.util.Random(7191L)
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val groups = (0 until 400).map { gid =>
      val n = 1 + r.nextInt(40)
      val sc = Array.fill(n)(r.nextInt(12).toDouble).sorted // dense ties
      val v =
        if (r.nextBoolean()) sc(r.nextInt(n)) // present somewhere
        else r.nextInt(15).toDouble + 0.5 // absent (half-integral)
      (gid, sc.toSeq, qs(gid % 4), v)
    }
    val eps = 1.0 / Sampling.ApproxAccuracy
    val expected = groups.map { case (gid, sc, q, v) =>
      val n = sc.length
      val lo = math.max(0, math.floor((q - eps) * n).toInt - 1)
      val hi = math.min(n - 1, math.ceil((q + eps) * n).toInt)
      gid -> (lo to hi).exists(i => sc(i) == v)
    }.toMap
    // engine side: per-q aggregate over the exploded groups (q is a scala
    // literal in withinRankBand, so one job per distinct q)
    val rows = groups.flatMap { case (gid, sc, q, v) =>
      sc.map(x => (gid, x, q, v)) }.toDF("gid", "x", "q", "v")
    val got = qs.flatMap { q =>
      val (lt, le) = Sampling.rankStats(col("x"), col("v"))
      rows.filter(col("q") === q)
        .groupBy(col("gid"))
        .agg(count(lit(1)).as("n"), lt.as("lt"), le.as("le"))
        .select(col("gid"),
          Sampling.withinRankBand(q, col("lt"), col("le"), col("n")).as("wb"))
        .collect().map(r2 => r2.getInt(0) -> r2.getBoolean(1))
    }.toMap
    assert(got.size == groups.size)
    groups.foreach { case (gid, sc, q, v) =>
      assert(got(gid) == expected(gid),
        s"gid=$gid q=$q v=$v n=${sc.length}: engine=${got(gid)} scan=${expected(gid)} sc=$sc")
    }
    // both outcomes must occur, or the property is vacuous
    assert(expected.values.exists(identity) && expected.values.exists(!_))
  }

  test("sp15 approx thresholds sit within the pinned rank band of the exact path") {
    // the 100 TB flag: approx_percentile's contract at accuracy A is a rank
    // error of at most n/A — each returned threshold is an ACTUAL score
    // whose rank lies in [q - 1/A, q + 1/A] (bf03's within_bound stance:
    // pin the sketch to its published bound, exact stays the oracle)
    val scored = Sampling.perplexityScored(spark, sfDir)
    def thr(approx: Boolean): Map[String, (Double, Double)] =
      Sampling.perplexityThresholds(scored, approx).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = thr(approx = false)
    val approx = thr(approx = true)
    assert(approx.keySet == exact.keySet)
    val bySource = scored.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("score")))
      .groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).sorted }
    val eps = 1.0 / Sampling.ApproxAccuracy
    approx.foreach { case (src, (a25, a75)) =>
      val sc = bySource(src)
      val n = sc.length
      Seq((0.25, a25), (0.75, a75)).foreach { case (q, v) =>
        val lo = math.max(0, math.floor((q - eps) * n).toInt - 1)
        val hi = math.min(n - 1, math.ceil((q + eps) * n).toInt)
        assert((lo to hi).exists(i => sc(i) == v),
          s"source $src q=$q: approx $v outside ranks [$lo,$hi] of n=$n scores")
      }
    }
    // both paths produce ordered bands
    exact.foreach { case (src, (e25, e75)) =>
      val (a25, a75) = approx(src)
      assert(a25 <= a75 && e25 <= e75, s"$src band inverted")
    }
    scored.unpersist()
  }

  test("q20 approx quantiles sit within the pinned rank band of the exact path") {
    // the same 100 TB flag as sp15, landed on q20 (round-13 verdict #6):
    // approx_percentile at accuracy A returns an ACTUAL price whose rank
    // lies within ±1/A quantiles of the target; exact stays the oracle
    val byFlag = Tables.t(spark, sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    def quart(approx: Boolean): Map[String, Seq[Double]] =
      Relational.priceQuantiles(Tables.t(spark, sfDir, "lineitem"), approx)
        .collect()
        .map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = quart(approx = false)
    val approx = quart(approx = true)
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    val eps = 1.0 / Sampling.ApproxAccuracy
    approx.foreach { case (f, vs) =>
      val sc = byFlag(f)
      val n = sc.length
      Seq(0.25, 0.5, 0.75, 0.95).zip(vs).foreach { case (q, v) =>
        val lo = math.max(0, math.floor((q - eps) * n).toInt - 1)
        val hi = math.min(n - 1, math.ceil((q + eps) * n).toInt)
        assert((lo to hi).exists(i => sc(i) == v),
          s"flag $f q=$q: approx $v outside ranks [$lo,$hi] of n=$n prices")
      }
      // quantiles are ordered on both paths
      assert(vs == vs.sorted && exact(f) == exact(f).sorted, s"$f quantiles inverted")
    }
  }

  test("sp18 weighted sample matches an independent scala replay and is weight-biased") {
    val rows = graft.SparkEntry.queries("sp18_weighted_sample")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("w"), r.getAs[Double]("k")))
    // independent replay: weights from the engine's own (oracle-pinned)
    // quality builder, u/key re-derived in plain scala
    val wByDoc = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), TextOps.qualityCol.as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = 2147483647L
    def key(id: Long, w: Double): Double = {
      val u = ((((id % m) * 1103515245L + 12345L) % m) + 1L).toDouble / (m + 1L).toDouble
      // StrictMath, not Math: Spark's Log expression evaluates via
      // StrictMath.log, which can differ from the intrinsic by one ulp
      -StrictMath.log(u) / w
    }
    val expected = wByDoc.toSeq.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (k, id) }.take(200)
    val got = rows.sortBy(_._1).toSeq
    val exp = expected.sortBy(_._1)
    val diffs = got.zip(exp).filter { case (a, b) => a != b }
    assert(diffs.isEmpty,
      s"engine sample diverges from the scala replay (${diffs.length} rows):\n  " +
        diffs.take(5).map { case (a, b) => s"engine=$a replay=$b" }.mkString("\n  "))
    // weight bias: an E-S draw favors heavy docs — the sampled mean quality
    // must exceed the corpus mean (deterministic on this fixture)
    val corpusMean = wByDoc.values.sum / wByDoc.size
    val sampleMean = rows.map(_._2).sum / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean — draw not weight-proportional")
  }

  test("sp18 selection plan is TakeOrderedAndProject, never a global sort") {
    val p = graft.SparkEntry.queries("sp18_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }
}
