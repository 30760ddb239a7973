package graft.spark
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._
object ProbePicParse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spec = JsonataCompiler.pictureParseSpec("[Y0001][M01][D01] [H01][m][s]").get
    println(s"[probe] regex=${spec.regex} groups=${spec.groups}")
    val df = spark.createDataFrame(Seq(Row(1L, "20171027 034729")).asJava,
      StructType.fromDDL("id BIGINT, s STRING"))
    df.select(
      col("s").rlike(spec.regex).as("m"),
      regexp_extract(col("s"), spec.regex, spec.groups('Y')).as("y"),
      regexp_extract(col("s"), spec.regex, spec.groups('M')).as("mo"),
      regexp_extract(col("s"), spec.regex, spec.groups('D')).as("d"),
      regexp_extract(col("s"), spec.regex, spec.groups('H')).as("h"),
      regexp_extract(col("s"), spec.regex, spec.groups('m')).as("mi"),
      regexp_extract(col("s"), spec.regex, spec.groups('s')).as("se"),
      unix_millis(make_timestamp(lit(2017), lit(10), lit(27), lit(3), lit(47), lit(29).cast("double"))).as("ms")
    ).collect().foreach(r => println(s"[probe] $r"))
    spark.stop()
  }
}
