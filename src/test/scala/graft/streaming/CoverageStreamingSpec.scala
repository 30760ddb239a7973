package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of sp16's coverage selection.
  *
  * Pins: (1) the LATEST emission per region equals the batch sp16 answer
  * exactly (ids, ranks, bitwise cosines) once everything is ingested,
  * under arbitrary micro-batching; (2) arrival order does not matter (a
  * second run with reversed batches agrees); (3) state stays bounded by
  * regions x M (the state-store row count). */
class CoverageStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

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

  private type Row4 = (Long, Long, Double, Int)

  private def run(batches: Seq[Seq[(Long, Seq[Double])]]): (Map[Long, Seq[Row4]], Long) = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val anchors = graft.ops.Similarity.coverageAnchors(sp, sfDir)
    val input = MemoryStream[(Long, Seq[Double])]
    val vecs = input.toDF().toDF("vec_id", "vec")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))
    val out = StreamingCoverage.coverageStream(vecs, anchors, 8)
    // latest emission per region wins: tag every emission with its batch
    val latest = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Seq[Row4])]()
    val query = out.toDF().writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().groupBy(_.getLong(0)).foreach { case (aid, rows) =>
          latest.put(aid, (id,
            rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
              .sortBy(_._4)))
        }: Unit
      }.start()
    var stateRows = -1L
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      val progress = query.lastProgress
      if (progress != null && progress.stateOperators.nonEmpty)
        stateRows = progress.stateOperators.map(_.numRowsTotal).sum
    } finally query.stop()
    import scala.jdk.CollectionConverters._
    (latest.asScala.map { case (aid, (_, rows)) => aid -> rows }.toMap, stateRows)
  }

  test("latest emissions equal batch sp16 exactly; arrival order free; state bounded") {
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val batch = graft.SparkEntry.queries("sp16_cluster_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1).map { case (aid, rows) => aid -> rows.toSeq.sortBy(_._4) }

    val third = all.length / 3
    val (got, stateRows) = run(Seq(
      all.slice(0, third).toSeq, all.slice(third, 2 * third).toSeq,
      all.drop(2 * third).toSeq))
    assert(got.keySet == batch.keySet,
      s"regions differ: stream-only=${got.keySet -- batch.keySet} batch-only=${batch.keySet -- got.keySet}")
    got.foreach { case (aid, rows) =>
      assert(rows == batch(aid), s"region $aid:\n  stream: $rows\n  batch:  ${batch(aid)}")
    }
    // bounded state: <= M entries per region materialize as one list row each
    assert(stateRows > 0 && stateRows <= batch.keySet.size.toLong * 8,
      s"state rows $stateRows exceed regions x M")

    // shuffled arrival: reversed batches converge to the same answer
    val (got2, _) = run(Seq(
      all.drop(2 * third).toSeq, all.slice(third, 2 * third).toSeq,
      all.slice(0, third).toSeq))
    assert(got2 == got, "arrival order changed the converged coverage set")
  }
}
