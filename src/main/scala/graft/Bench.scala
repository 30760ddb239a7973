package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the noop sink
  * (count() alone would let Spark prune the final project). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen/parquet-reader paths so per-query timings measure the
    // queries, not first-job initialization: one cheap pass over the operator
    // shapes (scan, hash agg, window, broadcast join, sort, noop sink).
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(2000)
      val o = spark.read.parquet(s"$sfDir/orders.parquet").limit(2000)
      l.groupBy("l_returnflag").agg(sum("l_quantity")).write.format("noop").mode("overwrite").save()
      o.withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
        .join(broadcast(l), col("o_orderkey") === col("l_orderkey"), "left")
        .orderBy(col("o_orderkey")).limit(100)
        .write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
