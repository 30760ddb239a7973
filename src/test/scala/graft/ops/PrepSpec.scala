package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Chunking invariants (coverage, overlap, reconstruction) and PII redaction
  * on crafted strings. */
class PrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ch01 chunks cover every token with stride-24 starts and 32-cap lengths") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = graft.SparkEntry.queries("ch01_chunk_windows")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"), r.getAs[Long]("n_chunk_tokens")))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = docs(id).toLong
      val sorted = cs.sortBy(_._2)
      // chunk ids are dense 0..k-1
      assert(sorted.map(_._2) sameElements (0L until sorted.length.toLong))
      // every chunk but the last is full; the last ends exactly at the doc end
      sorted.init.foreach { case (_, _, len) => assert(len == 32L) }
      val (_, lastId, lastLen) = sorted.last
      assert(lastId * 24 + lastLen == n, s"doc $id: last chunk must end at token $n")
      // a further window would add nothing new (no missing chunk)
      assert(lastId * 24 + 32 >= n)
      // single-chunk docs are the short ones
      if (sorted.length == 1) assert(n <= 32)
    }
  }

  test("redactPii rewrites emails, phones, SSNs and nothing else") {
    val sp = spark
    import sp.implicits._
    val in = Seq(
      "mail me at jane.doe+spam@sub.example.org today",
      "call +1-555-0134 or +1-555-9999",
      "ssn 987-65-4320.",
      "overlap: a@b.co 111-22-3333 +1-222-3333",
      "no pii here 123 456").toDF("t")
    val out = in.select(Prep.redactPii(col("t"))).as[String].collect().toSeq
    assert(out == Seq(
      "mail me at [EMAIL] today",
      "call [PHONE] or [PHONE]",
      "ssn [SSN].",
      "overlap: [EMAIL] [SSN] [PHONE]",
      "no pii here 123 456"))
  }
}
