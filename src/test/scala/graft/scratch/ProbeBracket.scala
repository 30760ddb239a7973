package graft.scratch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import graft.spark.JsonataCompiler
object ProbeBracket {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.createDataFrame(
      Seq(Row(1L, Seq(Row("a", 10L), Row("b", null), Row("c", 40L), Row("d", 5L)))).asJava,
      StructType.fromDDL("id BIGINT, items ARRAY<STRUCT<cat: STRING, price: BIGINT>>"))
    for (e <- Seq(
      "{'n': $count(value.items[price >= 10])}",
      "{'n': $count(value.items[cat != 'zz'])}",
      "{'n': $sum($map(value.items[price >= 10], function($x){ $x.price }))}",
      "{'n': value.items[0]}",
      "{'n': $count(value.items[price < 10 and cat != 'zz'])}")) {
      val ast = graft.connect.JsonataTransform.compile(e).ast
      println(s"[probe] compiles=${JsonataCompiler.transformCompiled(df, e).isDefined}  $e")
      println(s"[probe]   ast=$ast")
    }
    spark.stop()
  }
}
