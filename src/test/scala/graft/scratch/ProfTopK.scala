package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.spark.TopKAggregate

/** Shuffle-volume comparison: per-group top-k via the bounded-heap
  * TypedImperativeAggregate (partial agg — shuffle carries ≤k·groups·tasks
  * heap entries) vs the row_number window formulation (shuffles the whole
  * relation; WindowGroupLimit prunes per-task but AFTER a full sort).
  * Args: [numRows] [numGroups] [k]. Both sides noop-materialized; the
  * reported shuffle-write bytes come from the stage metrics listener. */
object ProfTopK {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(1000)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    val base = spark.range(n).select(
      (col("id") % groups).as("g"),
      ((col("id") * 2654435761L) % 1000000L).as("s"),
      col("id").as("i")).cache()
    base.write.format("noop").mode("overwrite").save()

    def tm(label: String)(f: => Unit): Unit = {
      shuffleWrite = 0L
      val t0 = System.nanoTime(); f
      org.apache.spark.sql.graftshim.Shims.drainListenerBus(spark)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $label: $s%.2f s, shuffle-write ${shuffleWrite / 1e6}%.1f MB")
    }

    tm("warmup")(base.groupBy("g").count().write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { _ =>
      tm(s"topk_by agg (k=$k)") {
        base.groupBy(col("g"))
          .agg(TopKAggregate.topkBy(col("s"), col("i"), k).as("top"))
          .select(col("g"), posexplode(col("top")))
          .write.format("noop").mode("overwrite").save()
      }
      tm(s"window row_number (k=$k)") {
        val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i"))
        base.withColumn("r", row_number().over(w)).filter(col("r") <= k)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
