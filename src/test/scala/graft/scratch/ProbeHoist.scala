package graft.scratch
import org.apache.spark.sql.SparkSession
import graft.spark.JsonataCompiler
object ProbeHoist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = "{'vec_id': value.vec_id, 'hits': $count($filter(value.embedding, function($v, $i, $a){ $v > $count($a[$ > 0.5]) / 64 }))}"
    val df = JsonataCompiler.transformCompiled(emb, e).get
    val plan = df.queryExecution.optimizedPlan.toString
    // hoisted: the inner $count($a[...]) appears ONCE as a size(filter(...))
    // OUTSIDE the per-element lambda; unhoisted it sits inside lambdafunction
    val lambdaBlocks = plan.split("lambdafunction").length - 1
    val inLambda = plan.split("lambdafunction").drop(1).exists(_.takeWhile(_ != ')').contains("filter("))
    println(s"[probe] lambdaBlocks=$lambdaBlocks innerFilterInsideLambda=$inLambda")
    println(plan.take(1500))
    spark.stop()
  }
}
