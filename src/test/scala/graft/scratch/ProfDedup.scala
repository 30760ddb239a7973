package graft.scratch

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch profiler: warm a query at a small SF, then time it at the target SF. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // args: name@dir name@dir ... each run once, timed
    args.foreach { spec =>
      val Array(name, dir) = spec.split("@")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[prof] $name @ $dir: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
