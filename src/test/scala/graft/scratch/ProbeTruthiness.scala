package graft.scratch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import graft.spark.JsonataCompiler

/** Scratch probe: which of the round-9 truthiness/array-trailing shapes
  * compile, and which sub-expression blocks the combined test query. */
object ProbeTruthiness {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.createDataFrame(
      Seq(Row(1L, Seq(Row("a", 10L, Seq("x", "y")), Row("", 20L, Seq.empty[String]),
        Row(null, 30L, null), Row("d", 5L, Seq("z", null, "w"))))).asJava,
      StructType.fromDDL(
        "id BIGINT, items ARRAY<STRUCT<cat: STRING, price: BIGINT, tags: ARRAY<STRING>>>"))
    for (e <- Seq(
      "{'n': $count(value.items[cat])}",
      "{'n': $sum(value.items[cat].price)}",
      "{'n': value.items[cat][0].cat}",
      "{'n': $count(value.items[price < 25].tags)}",
      "{'n': $join(value.items[cat != ''][price = 10].tags, '|')}")) {
      println(s"[probe] compiles=${JsonataCompiler.transformCompiled(df, e).isDefined}  $e")
    }
    spark.stop()
  }
}
