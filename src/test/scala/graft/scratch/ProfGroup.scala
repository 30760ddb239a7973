package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.spark.{JsonataCompiler, JsonataDF}

/** Compiled vs interpreted group-by throughput: member-field key vs the
  * round-14 dynamic computed key (Test/runMain graft.scratch.ProfGroup). */
object ProfGroup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val one = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val events = graft.ops.Tables.spread(Seq.fill(10)(one).reduce(_ unionAll _))
    val grouped = events.select(col("event_id"),
      array(
        struct(col("event_type").as("cat"), col("value").as("price")),
        struct(upper(col("event_type")).as("cat"), (col("value") * 2).as("price")),
        struct(lit("x").as("cat"), (col("value") + 1).as("price"))).as("items")).cache()
    val n = grouped.count()
    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[grp] $label: ${n / sec}%.0f rec/s (${sec}%.2f s)")
      n / sec
    }
    for ((tag, expr) <- Seq(
      ("member key", "{'event_id': value.event_id, 'g': value.items{cat: $sum(price)}}"),
      ("dyn concat key", "{'event_id': value.event_id, 'g': value.items{cat & '-' & cat: $sum(price)}}"),
      ("dyn cond key", "{'event_id': value.event_id, 'g': value.items{(price >= 1 ? 'hi' : 'lo'): $count($)}}"))) {
      val schema = StructType.fromDDL("event_id BIGINT, g MAP<STRING,DOUBLE>")
      val schemaC = StructType.fromDDL("event_id BIGINT, g MAP<STRING,BIGINT>")
      val s = if (tag == "dyn cond key") schemaC else schema
      assert(JsonataCompiler.compileQuery(grouped, expr).isDefined, s"$tag must compile")
      val rc = run(s"$tag [compiled]")(JsonataDF.auto(grouped, expr, s))
      val ri = run(s"$tag [interpreted]")(JsonataDF.transformAs(grouped, expr, s))
      println(f"[grp] $tag RATIO: ${rc / ri}%.1fx")
    }
    spark.stop()
  }
}
