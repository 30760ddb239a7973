package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.VectorExpressions

/** Throughput comparison: native codegen'd DotProduct vs the HOF
  * aggregate(zip_with) formulation, over N synthetic 64-dim pairs
  * (args: [numRows]). Both sides noop-materialized. */
object ProfDot {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(63)), i => (pmod(col("id") * 31 + i * 7, lit(997))).cast("double") / 997.0).as("a"),
      transform(sequence(lit(0), lit(63)), i => (pmod(col("id") * 17 + i * 13, lit(991))).cast("double") / 991.0).as("b"))
      .cache()
    base.write.format("noop").mode("overwrite").save()

    def tm(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label: $s%.2f s (${n / s / 1e6}%.1f M rows/s)"); s
    }
    def hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    def native = VectorExpressions.dot(col("a"), col("b"))

    for (round <- 1 to 3) {
      tm(s"hof    r$round")(base.select(hof.as("d")).write.format("noop").mode("overwrite").save())
      tm(s"native r$round")(base.select(native.as("d")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
