package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val v = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val q = v.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("vec").as("qv"))
      val d2 = graft.spark.VectorExpressions.sqdist(col("qv"), col("vec"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
      val exact = broadcast(q).join(v, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), d2.as("d2"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id")).persist()
      val total = exact.count()
      for (name <- Seq("ss10_pq_adc", "ss11_ivfadc")) {
        val approx = graft.SparkEntry.queries(name)(spark, sf)
          .select(col("q_id"), col("neighbor_id"))
        val hits = approx.join(exact, Seq("q_id", "neighbor_id")).count()
        println(f"[recall] $sf $name recall@5 = ${hits.toDouble / total}%.3f ($hits/$total)")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
