import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

object ProbeBool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.spark.{JsonataCompiler, JsonataDF}
    val rows = (1 to 60).map { i =>
      (i.toLong,
        if (i % 7 == 0) null else java.lang.Double.valueOf((i % 13) - 6.5),
        if (i % 5 == 0) null else java.lang.Long.valueOf((i % 17).toLong),
        if (i % 6 == 0) null else s"s${i % 4}",
        if (i % 9 == 0) null else ("x" * (i % 5)) + (i % 3),
        if (i % 8 == 0) null else Seq.tabulate(i % 4)(j => (j + i % 3).toDouble))
    }
    val df = rows.toDF("k","num_a","num_b","str_a","str_b","arr")
    val expr = "{'k': value.k, 'r': ((value.str_a in ['s0', 's1']) and (($substring(value.str_a, 2, 1) = (value.str_a & value.str_b)) or ((value.num_a * value.num_b) < (value.num_b * 46.9))))}"
    val a = JsonataCompiler.transformCompiled(df, expr).get.orderBy("k").collect()
    val b = JsonataDF.transformAs(df, expr, StructType.fromDDL("k BIGINT, r BOOLEAN")).orderBy("k").collect()
    a.zip(b).foreach { case (ra, rb) => if (ra.toString != rb.toString) println(s"DIFF k=${ra.get(0)} compiled=${ra.get(1)} interp=${rb.get(1)}") }
    // minimal shapes
    for (e <- Seq(
      "{'k': value.k, 'r': ($substring(value.str_a, 2, 1) = (value.str_a & value.str_b))}",
      "{'k': value.k, 'r': ((value.num_a * value.num_b) < (value.num_b * 46.9))}",
      "{'k': value.k, 'r': $substring(value.str_a, 2, 1)}",
      "{'k': value.k, 'r': (value.num_a * value.num_b)}",
      "{'k': value.k, 'r': (false or ((value.num_a * value.num_b) < (value.num_b * 46.9)))}"
    )) {
      val ddl = if (e.contains("'r': $substring")) "k BIGINT, r STRING"
        else if (e.contains("'r': (value.num_a * value.num_b)}")) "k BIGINT, r DOUBLE"
        else "k BIGINT, r BOOLEAN"
      val ca = JsonataCompiler.transformCompiled(df, e).map(_.orderBy("k").collect().toSeq)
      val ib = JsonataDF.transformAs(df, e, StructType.fromDDL(ddl)).orderBy("k").collect().toSeq
      ca match {
        case None => println(s"FALLBACK $e")
        case Some(cc) =>
          val diffs = cc.zip(ib).filter { case (x, y) => x.toString != y.toString }
          println(s"${if (diffs.isEmpty) "SAME " else "DIFF "} $e ${diffs.take(3).map{case(x,y)=>s"[k=${x.get(0)} c=${x.get(1)} i=${y.get(1)}]"}.mkString(" ")}")
      }
    }
    spark.stop()
  }
}
