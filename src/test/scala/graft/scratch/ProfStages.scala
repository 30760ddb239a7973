package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler: stage-by-stage timing of the verifiedPairs pipeline.
  * Usage: Test/runMain graft.scratch.ProfStages <dataDir>
  */
object ProfStages {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // this scratch copy of the minhash pipeline uses raw * / + (not the
      // production EvalMode.LEGACY nodes) and relies on 64-bit wrap-around
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Tables

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.spread(Tables.t(spark, dir, "documents"))
    time("scan only")(noop(docs.select(col("doc_id"), col("text"))))

    def wordHashes(text: org.apache.spark.sql.Column) =
      transform(split(lower(text), " "), w => xxhash64(w))
    def shingleHashes(text: org.apache.spark.sql.Column) = {
      val wh = wordHashes(text)
      array_distinct(
        transform(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
          i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
    }

    val base = docs.select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    time("shingles")(noop(base))
    val basePersisted = base.persist()
    time("shingles persist")(noop(basePersisted))

    val P = 64
    val Mask = (1L << 61) - 1
    val permA: Array[Long] = Array.tabulate(P)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
    val permB: Array[Long] = Array.tabulate(P)(i => 6364136223846793005L * (i + 7) + 1442695040888963407L)
    val aC = array(permA.map(lit).toIndexedSeq: _*)
    val bC = array(permB.map(lit).toIndexedSeq: _*)
    val sig = transform(sequence(lit(0), lit(P - 1)), i =>
      aggregate(col("sh"), lit(Long.MaxValue),
        (acc, h) => least(acc, (h * get(aC, i) + get(bC, i)).bitwiseAND(lit(Mask)))))

    val sigDf = basePersisted.select(col("doc_id"), sig.as("sig"))
    time("minhash sigs (from cache)")(noop(sigDf))

    val bands = sigDf.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(15)), bnd =>
        xxhash64(slice(col("sig"), bnd * 4 + 1, lit(4))))
    ).as(Seq("band", "bkey")))
    time("bands")(noop(bands))

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("cand join")(noop(cand))

    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val verified = cand
      .join(basePersisted.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("n_a")), "doc_a")
      .join(basePersisted.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(inter / (col("n_a") + col("n_b") - inter), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
    time("verify")(noop(verified))
    println("[stage] doc count: " + basePersisted.count())
    println("[stage] avg shingles: " + basePersisted.agg(avg(col("n"))).first().getDouble(0))
    spark.stop()
  }
}
