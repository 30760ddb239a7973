package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.spark.{SketchExpressions, SketchHofReference}

/** Kernel-stage comparison: native MinHash/SimHash vs the HOF forms over the
  * documents corpus (args: [sfDir]). Times ONLY the signature projection
  * (shingle/word-hash arrays precomputed and cached). Coefficients and HOF
  * references are the shared production/test definitions — no local copies. */
object ProfSketch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val permA = Dedup.permA.toIndexedSeq
    val permB = Dedup.permB.toIndexedSeq

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
      tm(s"minhash hof    r$r")(base.select(SketchHofReference.hofMinhash(col("sh"), permA, permB, Dedup.Mask).as("s")).write.format("noop").mode("overwrite").save())
      tm(s"minhash native r$r")(base.select(SketchExpressions.minhashSig(col("sh"), permA, permB, Dedup.Mask).as("s")).write.format("noop").mode("overwrite").save())
      tm(s"simhash hof    r$r")(base.select(SketchHofReference.hofSimhash(col("wh")).as("s")).write.format("noop").mode("overwrite").save())
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
