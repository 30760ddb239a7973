package graft.scratch

import org.apache.spark.sql.SparkSession

/** Scratch probe: can events.parquet (TIMESTAMP(NANOS)) be read without the
  * session-wide nanosAsLong conf — via read option or explicit schema? */
object ProbeNanos {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def attempt(label: String)(f: => Unit): Unit =
      try { f; println(s"[probe] $label: OK") }
      catch { case e: Throwable => println(s"[probe] $label: FAIL ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }

    attempt("plain read") {
      spark.read.parquet(s"$dir/events.parquet").show(1)
    }
    attempt("read option nanosAsLong") {
      spark.read.option("nanosAsLong", "true").parquet(s"$dir/events.parquet").show(1)
    }
    attempt("read option full key") {
      val df = spark.read.option("spark.sql.legacy.parquet.nanosAsLong", "true")
        .parquet(s"$dir/events.parquet")
      df.printSchema()
      df.show(1)
    }
    attempt("explicit schema ts LONG") {
      val base = {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val sch = spark.read.parquet(s"$dir/events.parquet").schema
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        sch
      }
      println("[probe] schema: " + base.simpleString)
      spark.read.schema(base).parquet(s"$dir/events.parquet").show(2)
    }
    spark.stop()
  }
}
