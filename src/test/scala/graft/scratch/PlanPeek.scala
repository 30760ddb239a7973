package graft.scratch
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("ss10_pq_adc", "ev05_cohort_retention", "dd12_incremental_neardup", "jx24_filtered_calls")) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      println(s"===== $n  exchanges=${p.split("Exchange").length - 1} smj=${p.contains("SortMergeJoin")} bnlj=${p.contains("BroadcastNestedLoopJoin")} bhj=${p.contains("BroadcastHashJoin")} cart=${p.contains("CartesianProduct")} jsonata=${p.contains("jsonata")} partial=${p.contains("partial_")}")
    }
    spark.stop()
  }
}
