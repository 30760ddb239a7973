package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the co-located-join guarantee: a join between two tables bucketed by
  * the same key into the same bucket count runs with ZERO exchanges and (with
  * sortBy) zero sorts — the plan shape that makes fact-to-fact joins viable
  * at 100 TB. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var wh: String = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    wh = Files.createTempDirectory("graft-bucketing").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$wh/warehouse")
      // force the sort-merge path so an exchange-free plan is provably the
      // bucketing at work, not a broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // report the per-file sort order from bucketed scans (sound here:
      // writeBucketed guarantees one file per bucket); default-off since
      // Spark 3.0 because multi-file buckets would make it wrong
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same-bucket join plans with zero exchanges and zero sorts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    Bucketing.writeBucketed(docs.select(col("doc_id"), col("lang")),
      "b_lang", s"$wh/b_lang", 4, Seq("doc_id"))
    Bucketing.writeBucketed(docs.select(col("doc_id"), col("n_chars")),
      "b_len", s"$wh/b_len", 4, Seq("doc_id"))

    val joined = Bucketing.table(spark, "b_lang")
      .join(Bucketing.table(spark, "b_len"), "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      "bucketed join must not shuffle either side\n" + plan.take(3000))
    assert(!plan.contains("Sort "), // SortExec node; sortBy made scans pre-sorted
      "bucket-sorted tables must not re-sort under SMJ\n" + plan.take(3000))

    // and it is still the correct join
    assert(joined.count() == docs.count())
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val agg = Bucketing.table(spark, "b_lang").groupBy("doc_id").agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "groupBy on the bucket key must be exchange-free\n" + plan.take(3000))
  }
}
