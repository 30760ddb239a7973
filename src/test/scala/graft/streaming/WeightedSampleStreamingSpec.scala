package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of sp18's weighted sampling without replacement.
  *
  * Pins: (1) EVERY emission is the exact batch draw over its ingested
  * prefix (n_seen stamps make each one checkable — the E-S "running sample
  * is always a valid answer" property); (2) arrival order does not change
  * the final sample; (3) state stays bounded by k. */
class WeightedSampleStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private val K = 200

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private type SampleRow = (Int, Long, String, Double, Double) // rank, id, src, w, key

  private def corpus(): Seq[(Long, String, String)] =
    graft.ops.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  /** Run the stream; returns every emission keyed by n_seen + state rows. */
  private def run(batches: Seq[Seq[(Long, String, String)]]): (Map[Long, Seq[SampleRow]], Long) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "source", "text")
    val out = StreamingWeightedSample.sampleStream(docs, K)
    val emissions = new java.util.concurrent.ConcurrentHashMap[Long, Seq[SampleRow]]()
    val query = out.toDF().writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().groupBy(_.getLong(0)).foreach { case (nSeen, rows) =>
          emissions.put(nSeen,
            rows.map(r => (r.getInt(1), r.getLong(2), r.getString(3),
              r.getDouble(4), r.getDouble(5))).toSeq.sortBy(_._1))
        }: Unit
      }.start()
    var stateRows = -1L
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      val progress = query.lastProgress
      if (progress != null && progress.stateOperators.nonEmpty)
        stateRows = progress.stateOperators.map(_.numRowsTotal).sum
    } finally query.stop()
    import scala.jdk.CollectionConverters._
    (emissions.asScala.toMap, stateRows)
  }

  /** sp18's draw over a prefix, through the shared batch reference. */
  private def reference(prefix: Seq[(Long, String, String)]): Seq[SampleRow] = {
    val sp = spark
    import sp.implicits._
    StreamingWeightedSample.batchReference(
        prefix.toDF("doc_id", "source", "text"), K)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1, r.getLong(0), r.getString(1),
        r.getDouble(2), r.getDouble(3)) }.toSeq
  }

  test("every emission equals the batch draw over its prefix; order-free final; bounded state") {
    val all = corpus()
    val batches = Seq(
      all.filter(_._1 % 3 == 0),
      all.filter(_._1 % 3 == 1),
      all.filter(_._1 % 3 == 2))
    val (emissions, stateRows) = run(batches)

    // one emission per batch, stamped with the cumulative count
    val prefixes = batches.inits.toSeq.reverse.tail.map(_.flatten) // b0, b0+b1, all
    assert(emissions.keySet == prefixes.map(_.size.toLong).toSet,
      s"emission stamps ${emissions.keySet} != prefix sizes")
    prefixes.foreach { prefix =>
      val got = emissions(prefix.size.toLong)
      val exp = reference(prefix)
      assert(got == exp,
        s"prefix ${prefix.size}: streamed sample diverges (first diff: " +
          got.zip(exp).find { case (a, b) => a != b }.map(_.toString).getOrElse("size") + ")")
    }

    // arrival order must not change the final sample
    val (rev, _) = run(batches.reverse)
    assert(rev(all.size.toLong) == emissions(all.size.toLong),
      "reversed arrival changed the final sample")

    // state bounded by k (list entries + the seen counter)
    assert(stateRows >= 0 && stateRows <= K + 5, s"state rows $stateRows exceed the k bound")
  }

  test("re-delivered docs never duplicate the sample (at-least-once sources)") {
    // the round-13 advice: an at-least-once source re-delivering a doc
    // that is an INCUMBENT while the sample is below k used to admit it
    // twice (identical key and id pass the boundary check). The sample
    // must stay duplicate-free and CONTENT-equal to the draw over the
    // distinct docs; n_seen counts deliveries by contract.
    val all = corpus()
    val b0 = all.filter(_._1 % 3 == 0)
    val b1 = all.filter(_._1 % 3 == 1)
    // k > |b0|, so every b0 doc is an incumbent when batch 1 re-delivers it
    assert(b0.size < K, "fixture must keep the sample below k at batch 0")
    val (emissions, _) = run(Seq(b0, b0 ++ b1, b1))
    emissions.values.foreach { sample =>
      val ids = sample.map(_._2)
      assert(ids.distinct.length == ids.length,
        s"re-delivery duplicated the sample: $ids")
    }
    // the final sample equals the batch draw over the DISTINCT docs
    val finalSample = emissions(emissions.keySet.max)
    assert(finalSample == reference(b0 ++ b1),
      "final sample diverges from the distinct-doc draw under re-delivery")
  }
}
