package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events loader must survive BOTH known fixture generations and refuse
  * anything else LOUDLY. Silent unit-scale corruption (epoch values 1000x
  * off, row counts still plausible) is exactly what a 100 TB pipeline must
  * refuse to run on — round 7 lost six queries to a quiet fixture
  * regeneration, so the guard is now pinned here.
  */
class FixtureGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("fixture-guard")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("fixture-guard").toString

  test("current generation: TIMESTAMP_NTZ ts loads and normalizes to epoch millis") {
    val dir = tmpDir()
    val sp = spark; import sp.implicits._
    // 2024-01-01T00:00:01.500 naive == 1704067201500 ms at its UTC reading
    Seq((1L, "2024-01-01T00:00:01.500", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts_s").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.t(spark, dir, "events")
    val ms = ev.select(Tables.eventsTsMillis(ev).as("ms")).head().getLong(0)
    assert(ms === 1704067201500L)
  }

  test("legacy generation: BIGINT nanos ts loads and normalizes to the same millis") {
    val dir = tmpDir()
    val sp = spark; import sp.implicits._
    Seq((1L, 1704067201500L * 1000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.t(spark, dir, "events")
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.LongType)
    val ms = ev.select(Tables.eventsTsMillis(ev).as("ms")).head().getLong(0)
    assert(ms === 1704067201500L)
  }

  test("REAL legacy generation: INT64 TIMESTAMP(NANOS) trips inference and takes the fallback") {
    // Spark cannot WRITE this type, so the legacy fixture's footer is built
    // with the parquet-java example writer directly — the inference failure
    // (PARQUET_TYPE_ILLEGAL) and the catch-and-fallback branch in
    // Tables.events are otherwise dead code in the suite, and a reworded
    // Spark error message would break legacy loading with every test green.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val dir = tmpDir()
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val writer = ExampleParquetWriter.builder(path).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    writer.write(f.newGroup()
      .append("event_id", 1L).append("ts", 1704067201500L * 1000000L)
      .append("user_id", 7L).append("event_type", "click")
      .append("value", 1.0).append("props", "{}"))
    writer.close()
    // sanity: plain inference really does refuse this footer
    assertThrows[Exception](spark.read.parquet(path.toString).schema)
    val ev = Tables.t(spark, dir, "events")
    assert(ev.schema("ts").dataType === org.apache.spark.sql.types.LongType)
    val ms = ev.select(Tables.eventsTsMillis(ev).as("ms")).head().getLong(0)
    assert(ms === 1704067201500L)
  }

  test("unknown ts type fails loudly at load, not silently downstream") {
    val dir = tmpDir()
    val sp = spark; import sp.implicits._
    // a DOUBLE ts: plausibly "seconds since epoch" — refusing to guess is
    // the point
    Seq((1L, 1.7040672015e9, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] { Tables.t(spark, dir, "events") }
    assert(e.getMessage.contains("unexpected type"))
    assert(e.getMessage.contains("1000x"))
  }
}
