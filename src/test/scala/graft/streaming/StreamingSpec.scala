package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming parity smoke (SURVEY.md §5.2.6): the transform over a memory
  * stream — tombstone drop, topic rewrite routing, and an event-time windowed
  * aggregation (Spark-native extension beyond reference parity). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stateless transform with tombstone drop over a stream") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "kind")
    val out = JsonataStreaming.transform(df,
      "value.kind = 'drop' ? null : {'id': value.id, 'kind': $uppercase(value.kind)}")

    val query = out.writeStream.format("memory").queryName("t_out").outputMode("append").start()
    input.addData((1L, "keep"), (2L, "drop"), (3L, "keep"))
    query.processAllAvailable()
    val rows = sp.sql("SELECT out FROM t_out").collect().map(_.getString(0)).sorted
    query.stop()

    assert(rows.length == 2)
    assert(rows(0).contains("\"KEEP\"") && rows(0).contains("\"id\":1"))
    assert(rows(1).contains("\"id\":3"))
  }

  test("typed two-tier transform: the compiled tier runs inside micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "kind")
    val out = JsonataStreaming.transformTyped(df,
      "value.kind != 'drop' ? {'id': value.id + 100, 'kind': $uppercase(value.kind)}",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, kind STRING"))
    // tier decision is visible on the streaming plan itself: no interpreter
    assert(!out.queryExecution.analyzed.toString.toLowerCase.contains("jsonata"),
      "compilable expression must take the compiled tier on streams")

    val query = out.writeStream.format("memory").queryName("tt_out").outputMode("append").start()
    input.addData((1L, "keep"), (2L, "drop"), (3L, "also"))
    query.processAllAvailable()
    val rows = sp.sql("SELECT id, kind FROM tt_out ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    query.stop()
    assert(rows == Seq((101L, "KEEP"), (103L, "ALSO")), s"got $rows")

    // outside the subset the interpreted tier serves the same stream contract
    val input2 = MemoryStream[(Long, String)]
    val out2 = JsonataStreaming.transformTyped(input2.toDF().toDF("id", "kind"),
      "{'id': value.id, 'k': $eval('\"x\"')}",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, k STRING"))
    assert(out2.queryExecution.analyzed.toString.toLowerCase.contains("jsonata"))
    val q2 = out2.writeStream.format("memory").queryName("tt_out2").outputMode("append").start()
    input2.addData((7L, "z"))
    q2.processAllAvailable()
    val rows2 = sp.sql("SELECT id, k FROM tt_out2").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    q2.stop()
    assert(rows2 == Seq((7L, "x")), s"got $rows2")
  }

  test("topic rewrite routes to per-topic partitions") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft_topics").toString
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "kind")
    val query = JsonataStreaming.writePartitionedByTopic(df,
      "{'topic': 'evt-' & value.kind, 'value': {'id': value.id}}",
      s"$tmp/data", s"$tmp/ckpt")
    input.addData((1L, "a"), (2L, "b"), (3L, "a"))
    query.processAllAvailable()
    query.stop()

    val result = sp.read.parquet(s"$tmp/data")
    val byTopic = result.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic == Map("evt-a" -> 2L, "evt-b" -> 1L))
  }

  test("event-time windowed aggregation with watermark (extension)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("ts", "v")
    val agg = df
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(sum(col("v")).as("total"))

    val query = agg.writeStream.format("memory").queryName("t_win").outputMode("complete").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2026-01-01 00:00:10"), 1.0), (ts("2026-01-01 00:00:20"), 2.0),
      (ts("2026-01-01 00:01:10"), 5.0))
    query.processAllAvailable()
    val rows = sp.sql("SELECT total FROM t_win ORDER BY total").collect().map(_.getDouble(0))
    query.stop()
    assert(rows.toSeq == Seq(3.0, 5.0))
  }

  test("streaming exact dedup within watermark (training-pipeline extension)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("text")

    val query = df.writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2026-01-01 00:00:01"), "a"), (ts("2026-01-01 00:00:02"), "b"),
      (ts("2026-01-01 00:00:03"), "a"), (ts("2026-01-01 00:00:04"), "c"),
      (ts("2026-01-01 00:00:05"), "b"))
    query.processAllAvailable()
    val rows = sp.sql("SELECT text FROM t_dedup").collect().map(_.getString(0)).sorted
    query.stop()
    assert(rows.toSeq == Seq("a", "b", "c"))
  }

  test("native jsonata function via session extensions") {
    val n = spark.sql(
      """SELECT jsonata('{"a": 2}', 'a * 21') AS out""").collect()(0).getString(0)
    assert(n == "42")
  }

  test("struct-path and variant functions via session extensions") {
    val row = spark.sql(
      """SELECT jsonata_row(named_struct('a', 21), '{''a2'': value.a * 2}') AS j""")
      .collect()(0).getString(0)
    assert(row == """{"a2":42}""", s"got $row")
    val typed = spark.sql(
      """SELECT jsonata_typed(named_struct('a', 21),
           '{''doubled'': value.a * 2}', 'doubled BIGINT').doubled AS d""")
      .collect()(0).getLong(0)
    assert(typed == 42L)
    val v = spark.sql(
      """SELECT variant_get(jsonata_variant('{"a": 2}', '{"out": a * 21}'), '$.out', 'bigint') AS o""")
      .collect()(0).getLong(0)
    assert(v == 42L)
  }
}
