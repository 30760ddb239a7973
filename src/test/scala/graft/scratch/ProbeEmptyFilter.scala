package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.spark.{JsonataCompiler, JsonataDF}

/** Probe: does the compiled tier diverge from the interpreter when a HOF
  * returns an EMPTY result ($filter survivors = none, $map all-undefined)
  * composed under $sum/$min/$count? Engine: empty sequence = undefined. */
object ProbeEmptyFilter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exprs = Seq(
      ("sum-empty-filter", "{'vec_id': value.vec_id, 'z': $sum($filter(value.embedding, function($x){ $x > 99999 }))}", "vec_id BIGINT, z DOUBLE"),
      ("count-empty-filter", "{'vec_id': value.vec_id, 'z': $count($filter(value.embedding, function($x){ $x > 99999 }))}", "vec_id BIGINT, z BIGINT"),
      ("min-empty-map", "{'vec_id': value.vec_id, 'z': $min($map(value.embedding, function($x){ $x > 99999 ? $x }))}", "vec_id BIGINT, z DOUBLE"),
      ("sum-empty-map", "{'vec_id': value.vec_id, 'z': $sum($map(value.embedding, function($x){ $x > 99999 ? $x }))}", "vec_id BIGINT, z DOUBLE"),
      ("split-limit-0", "{'doc': 1, 'z': $count($split('a b c', ' ', 0)), 'j': $join($split('a b c', ' ', 0), ',')}", "doc BIGINT, z BIGINT, j STRING"))
    for ((nm, e, ddl) <- exprs) {
      val c = JsonataCompiler.transformCompiled(df, e)
      if (c.isEmpty) println(s"[probe] $nm: DOES NOT COMPILE")
      else {
        val a = c.get.orderBy("vec_id").limit(3).collect().map(_.toSeq).toSeq
        val b = JsonataDF.transformAs(df, e, StructType.fromDDL(ddl))
          .orderBy("vec_id").limit(3).collect().map(_.toSeq).toSeq
        println(s"[probe] $nm: ${if (a == b) "SAME" else "DIFF"} compiled=${a.head} interp=${b.head}")
      }
    }
    spark.stop()
  }
}
