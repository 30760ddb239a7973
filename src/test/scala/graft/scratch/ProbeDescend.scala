package graft.scratch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import graft.spark.{JsonataCompiler, JsonataDF}

/** Scratch probe: compiled `**` descendant search vs the interpreter. */
object ProbeDescend {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def check(df: org.apache.spark.sql.DataFrame, e: String, ddl: String, order: String): Unit = {
      val compiled = JsonataCompiler.transformCompiled(df, e)
      println(s"[probe] compiles=${compiled.isDefined}  $e")
      compiled.foreach { cdf =>
        val a = cdf.orderBy(order).collect().map(_.toSeq).toSeq
        val b = JsonataDF.transformAs(df, e, StructType.fromDDL(ddl))
          .orderBy(order).collect().map(_.toSeq).toSeq
        if (a.size != b.size) println(s"  !! SIZE ${a.size} vs ${b.size}")
        else {
          val bad = a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }
          if (bad.isEmpty) println(s"  OK ${a.size} rows")
          else bad.take(3).foreach { case ((x, y), i) =>
            println(s"  !! row $i\n     compiled:    $x\n     interpreted: $y")
          }
        }
      }
    }

    val ddlIn = "id BIGINT, price BIGINT, " +
      "meta STRUCT<price: BIGINT, deep: STRUCT<price: BIGINT, tag: STRING>>, " +
      "items ARRAY<STRUCT<price: BIGINT, sub: STRUCT<price: BIGINT>>>, " +
      "tags ARRAY<STRING>"
    val df = spark.createDataFrame(
      Seq(
        Row(1L, 10L, Row(20L, Row(30L, "a")),
          Seq(Row(40L, Row(50L)), Row(60L, null)), Seq("x", "y")),
        Row(2L, null, Row(21L, null), Seq.empty[Row], null),
        Row(3L, 12L, null, null, Seq("z"))).asJava,
      StructType.fromDDL(ddlIn))

    check(df, "{'id': value.id, 'n': $count(value.**.price), 's': $sum(value.**.price)}",
      "id BIGINT, n BIGINT, s BIGINT", "id")
    check(df, "{'id': value.id, 's': $sum(value.meta.**.price)}",
      "id BIGINT, s BIGINT", "id")
    check(df, "{'id': value.id, 's': $sum(value.items.**.price)}",
      "id BIGINT, s BIGINT", "id")
    check(df, "{'id': value.id, 'j': $join(value.**.tag, '|')}",
      "id BIGINT, j STRING", "id")
    check(df, "{'id': value.id, 'm': $max(value.meta.**.price)}",
      "id BIGINT, m BIGINT", "id")
    // mixed numeric widths widen; mixed string/number must fall back
    val mixed = spark.createDataFrame(
      Seq(Row(1L, Row(5, Row(2.5)))).asJava,
      StructType.fromDDL("id BIGINT, m STRUCT<v: INT, d: STRUCT<v: DOUBLE>>"))
    check(mixed, "{'id': value.id, 's': $sum(value.**.v)}", "id BIGINT, s DOUBLE", "id")
    val clash = spark.createDataFrame(
      Seq(Row(1L, Row(5L, Row("x")))).asJava,
      StructType.fromDDL("id BIGINT, m STRUCT<v: BIGINT, d: STRUCT<v: STRING>>"))
    check(clash, "{'id': value.id, 's': $count(value.**.v)}", "id BIGINT, s BIGINT", "id")
    spark.stop()
  }
}
