package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge TRAINING (TextOps.bpeTrain / tx12) against an independent
  * textbook reference, plus the train↔count tie.
  *
  * Pins:
  *  (1) the distributed trainer equals a plain-Scala textbook trainer
  *      (word-count dictionary; every-adjacent-position pair stats;
  *      argmax with the (count DESC, l, r) total tie-break; left-to-right
  *      non-overlapping merge to a fresh private-use placeholder) on
  *      seeded random corpora AND an English-like corpus with heavy ties;
  *  (2) feeding the learned pairs to the BpeCount kernel reproduces the
  *      final round's corpus_tokens exactly — training and counting share
  *      one convention, so a learned table is directly consumable by the
  *      sp17-style budget operators;
  *  (3) the result is partitioning-independent (the tie-break is total,
  *      so shuffle nondeterminism cannot leak into the argmax).
  */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The textbook trainer (Sennrich et al. 2016 get_stats/merge loop) over
    * the same single-char symbol representation the kernel uses. */
  private def refTrain(texts: Seq[String], n: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    var dict: Seq[(String, Long)] = texts.flatMap(_.split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    (0 until n).map { k =>
      val pc = scala.collection.mutable.Map.empty[(Char, Char), Long]
      dict.foreach { case (w, c) =>
        var i = 0
        while (i + 1 < w.length) {
          val p = (w(i), w(i + 1))
          pc(p) = pc.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val ((l, r), c) = pc.toSeq.minBy { case ((pl, pr), pcnt) => (-pcnt, pl, pr) }
      val merged = (graft.spark.BpeCount.PlaceholderBase + k).toChar
      def mergeWord(w: String): String = {
        val sb = new StringBuilder
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == l && w(i + 1) == r) { sb += merged; i += 2 }
          else { sb += w(i); i += 1 }
        }
        sb.toString
      }
      dict = dict.map { case (w, cc) => (mergeWord(w), cc) }
      val toks = dict.map { case (w, cc) => cc * w.length }.sum
      (k.toLong, l.toLong, r.toLong, merged.toLong, c, toks)
    }
  }

  private def corpora: Seq[Seq[String]] = {
    val rnd = new scala.util.Random(1309L)
    val alpha = "abcde"
    def word(): String =
      (0 until (2 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val random = (1 to 3).map { _ =>
      (1 to 200).map(_ => (1 to (3 + rnd.nextInt(9))).map(_ => word()).mkString(" "))
    }
    // heavy-tie corpus: few distinct words, many equal pair counts — the
    // tie-break is what decides every round
    val ties = Seq((1 to 150).map(i => Seq("abab", "baba", "aabb", "bbaa")(i % 4)))
    random ++ ties
  }

  test("distributed trainer equals the textbook reference on seeded corpora") {
    val sp = spark
    import sp.implicits._
    corpora.zipWithIndex.foreach { case (texts, ci) =>
      val got = TextOps.bpeTrain(texts.toDF("text"), 8)
      val want = refTrain(texts, 8)
      assert(got == want, s"[corpus $ci]\n  got:  $got\n  want: $want")
    }
  }

  test("learned pairs fed to the BpeCount kernel reproduce the final corpus_tokens") {
    val sp = spark
    import sp.implicits._
    corpora.foreach { texts =>
      val learned = TextOps.bpeTrain(texts.toDF("text"), 8)
      val pairs = learned.map { case (_, lc, rc, _, _, _) => (lc.toChar, rc.toChar) }
      val counted = texts.toDF("text")
        .select(org.apache.spark.sql.functions.sum(
          graft.spark.BpeExpressions.bpeCount(
            org.apache.spark.sql.functions.col("text"), pairs)).as("t"))
        .collect()(0).getLong(0)
      assert(counted == learned.last._6,
        s"train/count diverge: counted=$counted curve=${learned.last._6}")
    }
  }

  test("training is partitioning-independent (total tie-break)") {
    val sp = spark
    import sp.implicits._
    val texts = corpora.head
    val a = TextOps.bpeTrain(texts.toDF("text"), 8)
    val b = TextOps.bpeTrain(texts.toDF("text").repartition(7), 8)
    assert(a == b)
  }
}
