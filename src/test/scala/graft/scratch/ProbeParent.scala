package graft.scratch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import graft.spark.{JsonataCompiler, JsonataDF}

/** Scratch probe: compiled `%` parent in Shape-A bracket predicates. */
object ProbeParent {
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
    val ddlIn = "id BIGINT, limit BIGINT, " +
      "cfg STRUCT<thr: BIGINT, items: ARRAY<STRUCT<p: BIGINT, tag: STRING>>>, " +
      "items ARRAY<STRUCT<p: BIGINT, tags: ARRAY<STRING>>>"
    val df = spark.createDataFrame(
      Seq(
        Row(1L, 25L, Row(30L, Seq(Row(10L, "a"), Row(40L, "b"))),
          Seq(Row(10L, Seq("x")), Row(30L, Seq("y", "z")))),
        Row(2L, null, Row(5L, Seq(Row(10L, "c"))), Seq(Row(50L, null))),
        Row(3L, 100L, null, null)).asJava,
      StructType.fromDDL(ddlIn))
    check(df, "{'id': value.id, 'n': $count(value.items[p > %.limit])}",
      "id BIGINT, n BIGINT", "id")
    check(df, "{'id': value.id, 'n': $count(value.cfg.items[p > %.thr])}",
      "id BIGINT, n BIGINT", "id")
    check(df, "{'id': value.id, 's': $sum(value.items[p >= %.limit].p)}",
      "id BIGINT, s BIGINT", "id")
    // nested predicate % (per-element parent): must fall back
    check(df, "{'id': value.id, 'n': $count(value.items[$count(tags[% .p > 0]) > 0])}",
      "id BIGINT, n BIGINT", "id")
    spark.stop()
  }
}
