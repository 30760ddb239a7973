package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, EvalMode, Multiply}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import graft.spark.SketchExpressions

/** Kernel-stage comparison: native MinHash/SimHash vs the HOF forms over the
  * documents corpus (args: [sfDir]). Times ONLY the signature projection
  * (shingle/word-hash arrays precomputed and cached). */
object ProfSketch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val P = 64
    val Mask = (1L << 61) - 1
    val permA = Seq.tabulate(P)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
    val permB = Seq.tabulate(P)(i => 6364136223846793005L * (i + 7) + 1442695040888963407L)
    def wrapMul(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Shims.column(Multiply(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))
    def wrapAdd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Shims.column(Add(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))
    def hofMinhash(sh: org.apache.spark.sql.Column) = {
      val aC = array(permA.map(lit): _*)
      val bC = array(permB.map(lit): _*)
      transform(sequence(lit(0), lit(P - 1)), i =>
        aggregate(sh, lit(Long.MaxValue),
          (acc, h) => least(acc, wrapAdd(wrapMul(h, get(aC, i)), get(bC, i)).bitwiseAND(lit(Mask)))))
    }
    def hofSimhash(wh: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(31), lit(0), lit(-1)), lit(0L), (acc, i) =>
        acc * 2 + when(aggregate(wh, lit(0L), (a2, h) =>
          a2 + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        ) >= 0, 1L).otherwise(0L))

    val wh = transform(split(lower(col("text")), " "), w => xxhash64(w))
    val sh = array_distinct(
      transform(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
        i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
    val base = spark.read.parquet(s"$d/documents.parquet").repartition(32)
      .select(col("doc_id"), wh.as("wh"), sh.as("sh")).cache()
    base.write.format("noop").mode("overwrite").save()
    val nDocs = base.count()
    println(s"[prof] $nDocs docs")

    def tm(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      tm(s"minhash hof    r$r")(base.select(hofMinhash(col("sh")).as("s")).write.format("noop").mode("overwrite").save())
      tm(s"minhash native r$r")(base.select(SketchExpressions.minhashSig(col("sh"), permA, permB, Mask).as("s")).write.format("noop").mode("overwrite").save())
      tm(s"simhash hof    r$r")(base.select(hofSimhash(col("wh")).as("s")).write.format("noop").mode("overwrite").save())
      tm(s"simhash native r$r")(base.select(SketchExpressions.simhash32(col("wh")).as("s")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

/** Times the shingle-hash stage alone (args: [sfDir]). */
object ProfShingle {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def wh = transform(split(lower(col("text")), " "), w => xxhash64(w))
    def sh = array_distinct(
      transform(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
        i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
    val base = spark.read.parquet(s"$d/documents.parquet").repartition(32).cache()
    base.write.format("noop").mode("overwrite").save()
    def tm(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      tm(s"wordHashes    r$r")(base.select(wh.as("x")).write.format("noop").mode("overwrite").save())
      tm(s"shingleHashes r$r")(base.select(sh.as("x")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
