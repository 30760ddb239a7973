package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of the sp14 DSIR scorer.
  *
  * Pins: (1) per-batch streamed scores EQUAL the sp14 batch selector's
  * scores on every document sp14 ranks (the fold accumulates in token order,
  * the same order the batch explode/groupBy sums in, so agreement is exact
  * after the shared 6dp rounding — not approximate); (2) the stream is
  * STATELESS (pure projection — no state store operators, the model is a
  * driver-side artifact); (3) novel tokens take the model's smoothed
  * zero-count default weight, replayed by hand. */
class DsirStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  test("streamed scores equal the sp14 batch scores across split micro-batches; stateless") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val docs = sp.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "text")
    val (wmap, default) = graft.ops.Dsir.loadModel(graft.ops.Dsir.bucketCounts(docs))
    assert(wmap.nonEmpty && wmap.size <= 256)

    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val input = MemoryStream[(Long, String, String, String)]
    val stream = input.toDF().toDF("doc_id", "source", "lang", "text")

    val got = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
    val scored = StreamingDsir.scoreStream(stream, wmap, default)
    val query = scored.writeStream.outputMode("append")
      .foreachBatch { (out: org.apache.spark.sql.DataFrame, _: Long) =>
        out.collect().foreach(r => got.put(r.getLong(0), r.getDouble(2)): Unit)
      }.start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }

      // batch reference: the oracle-checked sp14 ranking (top-20 per source)
      val sp14 = graft.SparkEntry.queries("sp14_dsir_resample")(sp, sfDir)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(sp14.nonEmpty)
      sp14.foreach { case (id, score) =>
        assert(got.containsKey(id), s"doc $id missing from the streamed scores")
        assert(got.get(id) == score,
          s"doc $id: streamed ${got.get(id)} != batch $score — the scorer drifted from the selector")
      }
      // every streamed doc scored (tokenless docs score 0.0 rather than drop
      // — the stream shape keeps per-batch row counts stable for monitoring)
      assert(got.size == rows.length)

      val progress = query.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        "DSIR scoring must be stateless (the model is a driver-side artifact)")
    } finally query.stop()
  }

  test("novel tokens take the smoothed zero-count default weight") {
    val sp = spark
    import sp.implicits._
    val docs = sp.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "text")
    val counts = graft.ops.Dsir.bucketCounts(docs)
    val (wmap, default) = graft.ops.Dsir.loadModel(counts)

    // hand-replay the default as the zero-count instantiation of the ONE
    // weight formula: ln((0+1)/(T+256)) - ln((0+1)/(R+256))
    val tots = counts.agg(sum("r_cnt"), sum("t_cnt")).collect()(0)
    val (r, t) = (tots.getLong(0), tots.getLong(1))
    val hand = math.log(1.0 / (t + 256).toDouble) - math.log(1.0 / (r + 256).toDouble)
    assert(math.abs(default - hand) < 1e-15)

    // a document of tokens hashed to (possibly) unseen buckets still scores:
    // every token contributes either its bucket weight or the default
    import scala.jdk.CollectionConverters._
    val probe = sp.createDataFrame(
      Seq(Row(1L, "src", "zz", "zzqx vvkj wwpy")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, lang STRING, text STRING"))
    val s = StreamingDsir.scoreStream(probe, wmap, default).collect()(0).getDouble(2)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bkt(tok: String) = md.digest(tok.getBytes("UTF-8")).take(1).map(b => f"$b%02x").mkString
    val expect = BigDecimal(Seq("zzqx", "vvkj", "wwpy")
      .map(tok => wmap.getOrElse(bkt(tok), default)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s == expect, s"probe score $s != hand-replayed $expect")

    // NULL text scores 0.0 like empty text — the tokenless-doc monitoring
    // contract (a NULL score would NPE readers or silently vanish under a
    // score threshold; round-11 review finding)
    val nulls = sp.createDataFrame(
      Seq(Row(2L, "src", "zz", null), Row(3L, "src", "zz", "")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, lang STRING, text STRING"))
    val scored = StreamingDsir.scoreStream(nulls, wmap, default)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored == Map(2L -> 0.0, 3L -> 0.0), s"tokenless docs must score 0.0: $scored")
  }
}
