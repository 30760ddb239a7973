package graft.ops
import org.apache.spark.sql.SparkSession
import graft.spark.JsonataDF

/** One-shot engine throughput measurement for BASELINE.md §"engine-side
  * baseline": records/sec through the full interpreted path (envelope
  * encode -> evaluate -> serialize) for the three reference-shaped workloads. */
object ThroughputBench extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val events = Tables.spread(spark.read.parquet("/root/testdata/sf0.1/events.parquet")).cache()
  val n = events.count() // materialize cache

  def measure(label: String, expr: String): Unit = {
    // warm
    JsonataDF.transform(events, expr).count()
    val t0 = System.nanoTime()
    val out = JsonataDF.transform(events, expr).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[thr] $label: ${n / sec}%.0f rec/s (kept $out of $n, ${sec}%.2f s)")
  }

  measure("identity $", "$")
  measure("removeEmail-class rewrite",
    "( $drop := function($v,$k){ $k != 'props' }; $merge([$, {'value': $sift(value, $drop)}]) )")
  measure("tombstone filter", "value.event_type = 'error' ? null : $")
  spark.stop()
}
