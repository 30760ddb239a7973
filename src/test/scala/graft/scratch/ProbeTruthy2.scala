package graft.scratch
import org.apache.spark.sql.SparkSession
import graft.spark.JsonataCompiler
object ProbeTruthy2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (e <- Seq(
      "{'n': $count($split(value.text, ' '))}",
      "{'n': $split(value.text, ' ')[0]}",
      "{'n': $split(value.text, ' ')[1 = 1]}",
      "{'n': $count($split(value.text, ' ')[$])}"))
      println(s"[probe] compiles=${JsonataCompiler.transformCompiled(docs, e).isDefined}  $e")
    spark.stop()
  }
}
