import org.apache.spark.sql.SparkSession
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = (1 to 10).map { i => (i.toLong, java.lang.Double.valueOf(i), java.lang.Long.valueOf(i.toLong), "a", "b", Seq(1.0,2.0)) }
    val df = rows.toDF("k","num_a","num_b","str_a","str_b","arr")
    val cases = Seq(
      "{'k': value.k, 'r': (value.num_a + value.num_b)}",
      "{'k': value.k, 'r': (value.num_a + 3)}",
      "{'k': value.k, 'r': 12.3}",
      "{'k': value.k, 'r': $abs(value.num_a)}",
      "{'k': value.k, 'r': $floor(value.num_a)}",
      "{'k': value.k, 'r': $round(value.num_a, 2)}",
      "{'k': value.k, 'r': $sum(value.arr)}",
      "{'k': value.k, 'r': $max(value.arr)}",
      "{'k': value.k, 'r': $count(value.arr)}",
      "{'k': value.k, 'r': $uppercase(value.str_a)}",
      "{'k': value.k, 'r': $substring(value.str_a, 0, 2)}",
      "{'k': value.k, 'r': (value.str_a & value.str_b)}",
      "{'k': value.k, 'r': (value.num_a > value.num_b)}",
      "{'k': value.k, 'r': (value.str_a = value.str_b)}",
      "{'k': value.k, 'r': (value.str_a != 'x')}",
      "{'k': value.k, 'r': ((value.num_a > 1) and (value.num_b < 5))}",
      "{'k': value.k, 'r': ($abs((value.num_a - 3)) * (value.num_b + 1))}",
      "{'k': value.k, 'r': $abs((value.num_a + value.num_b))}",
      "{'k': value.k, 'r': $round((value.num_a * 2), 1)}",
      "{'k': value.k, 'r': $uppercase((value.str_a & 'x'))}",
      "{'k': value.k, 'r': $substring($uppercase(value.str_a), 0, 2)}",
      "(value.num_a > 2) ? {'k': value.k, 'r': value.num_b}",
      "{'k': value.k, 'r': ((value.num_a + 1) >= (value.num_b - 1))}",
      "{'k': value.k, 'r': ($sum(value.arr) + 1)}"
    )
    cases.foreach { e =>
      val ok = graft.spark.JsonataCompiler.transformCompiled(df, e).isDefined
      println(f"${if (ok) "OK  " else "FAIL"} $e")
    }
    spark.stop()
  }
}
