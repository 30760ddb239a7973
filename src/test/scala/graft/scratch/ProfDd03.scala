package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Tables

object ProfDd03 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val w = split(lower(col("text")), " ")
    val shingles = array_distinct(
      transform(sequence(lit(0), greatest(size(w) - 3, lit(0))),
        i => concat_ws(" ", get(w, i), get(w, i + 1), get(w, i + 2))))

    tm("read+count")(Tables.t(spark, d, "documents").count())
    val spreadDf = tm("spread")(Tables.spread(Tables.t(spark, d, "documents")))
    val base = spreadDf.select(
      col("doc_id"), col("source"), floor(col("n_chars") / 100).as("lb"),
      array_distinct(transform(shingles, x => xxhash64(x))).as("sh"))
      .withColumn("n", size(col("sh")))
    tm("shingle+count")(base.count())
    val ex = base.select(col("doc_id"), col("source"), col("lb"), col("n"),
      explode(col("sh")).as("h"))
    tm("explode+count")(ex.count())
    val exP = ex.persist()
    tm("persist materialize")(exP.count())
    val a = exP.select(col("doc_id").as("doc_a"), col("source"), col("lb"), col("n").as("n_a"), col("h"))
    val b = exP.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
      col("lb").as("lb_b"), col("n").as("n_b"), col("h").as("h_b"))
    val common = a.join(b,
        col("h") === col("h_b") && col("source") === col("source_b") &&
        col("lb") === col("lb_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
    tm("join+agg count")(common.count())
    val j = col("inter") / (col("n_a") + col("n_b") - col("inter"))
    val fin = common.select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
      .filter(col("jaccard") >= 0.3).orderBy(col("doc_a"), col("doc_b"))
    tm("final write")(fin.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
