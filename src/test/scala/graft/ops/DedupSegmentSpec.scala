package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** dd09 segment-dedup semantics on crafted docs: corpus-wide keep-first by
  * (doc_id, seg_idx), in-order reconstruction, whole-doc-duplicate → empty
  * text, dup-free doc reconstructs byte-identically. */
class DedupSegmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def w(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = java.nio.file.Files.createTempDirectory("dd09spec").toString
    val segA = w("a", 16)
    val segB = w("b", 16)
    val segC = w("c", 16)
    val docs = Seq(
      // doc 0: two unique segments A B — everything kept
      (0L, (segA ++ segB).mkString(" "), "en", "src0", 0L),
      // doc 1: A again (dropped, doc 0 owns it) + unique C (kept)
      (1L, (segA ++ segC).mkString(" "), "en", "src0", 0L),
      // doc 2: exact copy of doc 0 — fully deduplicated away
      (2L, (segA ++ segB).mkString(" "), "en", "src0", 0L),
      // doc 3: 20 unique words — a full segment + a 4-word tail, no dups
      (3L, w("d", 20).mkString(" "), "en", "src0", 0L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dd09 keeps first occurrences, reconstructs in order, empties full dups") {
    val rows = graft.SparkEntry.queries("dd09_segment_dedup")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"), r.getAs[String]("clean_fp")))).toMap
    val segA = w("a", 16); val segB = w("b", 16); val segC = w("c", 16)
    assert(rows(0L) == ((2L, 2L, md5hex((segA ++ segB).mkString(" ")))))
    // doc 1 loses A but keeps C, reconstructed without the dropped segment
    assert(rows(1L) == ((2L, 1L, md5hex(segC.mkString(" ")))))
    // doc 2 is a whole-doc duplicate: nothing survives
    assert(rows(2L) == ((2L, 0L, md5hex(""))))
    // dup-free doc reconstructs byte-identically (incl. the short tail seg)
    assert(rows(3L) == ((2L, 2L, md5hex(w("d", 20).mkString(" ")))))
  }
}
