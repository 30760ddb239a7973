package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Stage-by-stage profiler for the dd03 shape (args: [sfDir]). */
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

    def wordHashes(text: org.apache.spark.sql.Column) =
      transform(split(lower(text), " "), w => xxhash64(w))
    def shingleHashes(text: org.apache.spark.sql.Column) = {
      val wh = wordHashes(text)
      array_distinct(
        transform(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
          i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
    }

    tm("read+count")(Tables.t(spark, d, "documents").count())
    val spreadDf = tm("spread")(Tables.spread(Tables.t(spark, d, "documents")))
    tm("wordhash only")(spreadDf.select(col("doc_id"), explode(wordHashes(col("text"))).as("h")).count())
    val ex = spreadDf.select(
      col("doc_id"), col("source"), floor(col("n_chars") / 100).as("lb"),
      explode(shingleHashes(col("text"))).as("h"))
    tm("shinglehash+explode+count")(ex.count())
    val exP = ex.persist()
    tm("persist materialize")(exP.count())
    val hot = exP.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 256).select(col("h"))
    tm("hot agg count")(hot.count())
    val kept = exP.join(hot, Seq("h"), "left_anti")
    tm("anti-join count")(kept.count())
    val n = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    tm("n agg count")(n.count())
    val a = kept.select(col("doc_id").as("doc_a"), col("source"), col("lb"), col("h"))
    val b = kept.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
      col("lb").as("lb_b"), col("h").as("h_b"))
    val common = a.join(b,
        col("h") === col("h_b") && col("source") === col("source_b") &&
        col("lb") === col("lb_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .join(n.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(n.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
    tm("join+agg count")(common.count())
    spark.stop()
  }
}
