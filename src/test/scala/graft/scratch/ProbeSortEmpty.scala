import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

object ProbeSortEmpty {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Double]), (2L, Seq(3.0, 1.0))).toDF("k", "arr")
    def show(e: String, ddl: String): Unit = {
      val rows = graft.spark.JsonataDF.transformAs(df, e, StructType.fromDDL(ddl))
        .orderBy("k").collect().toSeq
      val c = graft.spark.JsonataCompiler.transformCompiled(df, e)
        .map(_.orderBy("k").collect().toSeq)
      println(s"INTERP $e -> $rows")
      println(s"COMPIL $e -> ${c.getOrElse("(fallback)")}")
    }
    show("{'k': value.k, 'r': $sum(value.arr^($))}", "k BIGINT, r DOUBLE")
    show("{'k': value.k, 'r': $count(value.arr^($))}", "k BIGINT, r BIGINT")
    show("{'k': value.k, 'r': $sum($sort(value.arr))}", "k BIGINT, r DOUBLE")
    show("{'k': value.k, 'r': $sum($sort([]))}", "k BIGINT, r DOUBLE")
    show("{'k': value.k, 'r': $join($sort([]), ',')}", "k BIGINT, r STRING")
    show("{'k': value.k, 'r': $reduce(value.arr, function($a, $v){($a + $v)}, 0)}", "k BIGINT, r DOUBLE")
    show("{'k': value.k, 'r': $reduce(value.arr, function($a, $v){($a + ($v * 2))}, 10)}", "k BIGINT, r DOUBLE")
    spark.stop()
  }
}
