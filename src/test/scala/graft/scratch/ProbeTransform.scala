package graft.scratch
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
import graft.spark.{JsonataCompiler, JsonataDF}

/** Scratch probe: compiled `~> |...|...|` object patching vs the interpreter. */
object ProbeTransform {
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

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    check(docs, "value ~> |$|{'lang': $uppercase(lang)}|", full, "doc_id")
    check(docs, "value ~> |$|{'short': n_chars < 200, 'tag': lang & '-' & source}|",
      full + ", short BOOLEAN, tag STRING", "doc_id")
    check(docs, "value ~> |$|{}, 'text'|", full, "doc_id")
    check(docs, "value ~> |$|{'n_chars': n_chars + 1}, ['text','source']|", full, "doc_id")
    check(docs, "value ~> |$|{'lang': source = 'nosuch' ? 'xx'}|", full, "doc_id")
    check(docs, "value ~> |$|{'lang': source = 'cc' ? 'CC'}|", full, "doc_id")
    check(docs, "value ~> |missing|{'a': 1}|", full, "doc_id")
    check(docs, "value ~> |text|{'a': 1}|", full, "doc_id") // final scalar: must fall back
    check(docs, "value ~> |text.deeper|{'a': 1}|", full, "doc_id") // mid scalar: no-op

    val nested = spark.createDataFrame(
      Seq(
        Row(1L, Row(10L, "a"), "k1"),
        Row(2L, null, "k2"),
        Row(3L, Row(30L, null), "k3")).asJava,
      StructType.fromDDL("id BIGINT, meta STRUCT<a: BIGINT, b: STRING>, k STRING"))
    val nddl = "id BIGINT, meta STRUCT<a: BIGINT, b: STRING>, k STRING"
    check(nested, "value ~> |meta|{'a': a * 2}|", nddl, "id")
    check(nested, "value ~> |meta|{'c': $string(a)}|",
      "id BIGINT, meta STRUCT<a: BIGINT, b: STRING, c: STRING>, k STRING", "id")
    // deleted nested key keeps a NULL slot in the compiled struct; declare
    // the full nested shape (the tier's standing struct-typed contract —
    // declared nested structs must match the compiled type structurally)
    check(nested, "value ~> |meta|{'a': a + 1}, 'b'|", nddl, "id")
    // base undefined for some rows: patch over nested path base
    check(nested, "value.meta ~> |$|{'b': 'patched'}|",
      "a BIGINT, b STRING", "a")
    // type-widening update (long field patched with double)
    check(nested, "value ~> |meta|{'a': a / 2}|",
      "id BIGINT, meta STRUCT<a: DOUBLE, b: STRING>, k STRING", "id")
    spark.stop()
  }
}
