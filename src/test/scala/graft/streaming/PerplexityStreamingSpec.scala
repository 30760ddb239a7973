package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of sp15 over the stored LM + thresholds.
  *
  * Pins: (1) streamed (score, keep) EQUAL the oracle-checked sp15 selector
  * on every document, across split micro-batches (same tokenization, same
  * count relations through the parquet round-trip, same rounding, same
  * frozen thresholds); (2) the stream is stateless (disk is the state);
  * (3) an unseen source gates CLOSED. */
class PerplexityStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var modelDir: String = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    modelDir = java.nio.file.Files.createTempDirectory("lm_store_").toString
    PerplexityStore.build(spark, sfDir, modelDir)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("build trains the LM once and releases every persisted relation") {
    // beforeAll ran build() and nothing else — a leaked persist (the LM
    // base or the scored relation) would still be registered here. Runs
    // FIRST: later tests invoke the sp15 registry query, whose persists
    // live for the query's lifetime by design.
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"PerplexityStore.build leaked ${spark.sparkContext.getPersistentRDDs.size} persisted RDDs")
  }

  test("streamed scores and band gates equal sp15 across split micro-batches; stateless") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val rows = sp.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")

    val got = new java.util.concurrent.ConcurrentHashMap[Long, (Double, Boolean)]()
    val query = StreamingPerplexity.scoreStream(docs, modelDir, (out, _) =>
      out.collect().foreach(r =>
        got.put(r.getLong(0), (r.getDouble(2), r.getBoolean(3))): Unit))
    try {
      val (b1, rest) = rows.splitAt(rows.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); query.processAllAvailable() }

      val batch = graft.SparkEntry.queries("sp15_perplexity_band")(sp, sfDir)
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
      assert(batch.nonEmpty && got.size == rows.length)
      batch.foreach { case (id, score, keep) =>
        assert(got.containsKey(id), s"doc $id missing from streamed scores")
        assert(got.get(id) == ((score, keep)),
          s"doc $id: streamed ${got.get(id)} != batch ($score, $keep) — the stored scorer drifted")
      }
      val progress = query.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        "perplexity serving must be stateless (the stored model is the only state)")
    } finally query.stop()
  }

  test("an unseen source gates closed rather than admitting an unmodeled slice") {
    import scala.jdk.CollectionConverters._
    val m = PerplexityStore.load(spark, modelDir)
    val probe = spark.createDataFrame(
      Seq(Row(1L, "brand-new-source", "some ordinary words appear here")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text STRING"))
    val out = PerplexityStore.score(probe, m).collect()(0)
    assert(!out.getBoolean(3), "unseen source must not be admitted by default")
  }
}
