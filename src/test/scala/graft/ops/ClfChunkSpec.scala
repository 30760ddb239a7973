package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** tx13 (frozen hashed linear classifier) and ch02 (subword-budget greedy
  * chunk packing) against INDEPENDENT plain-Scala references: the classifier
  * score must be bit-identical (the keep threshold rides on it), and the
  * packer must replay the oracle's replace-chain word counts + greedy fold —
  * not the kernel's int-buffer loop — so engine, oracle, and reference are
  * three separate implementations agreeing exactly. Plus crafted packing
  * adversaries (oversized word, exact-fit boundary) and the ingest
  * classifierGate == the tx13 keep set.
  */
class ClfChunkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"
  private var craftedDir: String = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    craftedDir = java.nio.file.Files.createTempDirectory("ch02spec").toString
    val docs = Seq(
      // single 1-subword word -> 1 chunk of run 1
      (0L, "a", "en", "s", 0L),
      // 60 q's: no merge touches 'q', count 60 > budget 48 -> own chunk
      (1L, ("q" * 60) + " bb", "en", "s", 0L),
      // exact fit: 4 x 12-char merge-free words = 48, 5th word rolls
      (2L, Seq.fill(5)("x" * 12).mkString(" "), "en", "s", 0L),
      // multi-level merges: "the"->1 token, "and"->1, "ing"->1
      (3L, "the and ing theand", "en", "s", 0L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$craftedDir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- independent references ----

  /** The oracle's per-word count: Java replace chain in rank order
    * (left-to-right non-overlapping), NOT the kernel's int-buffer loop. */
  private def refWordCountFor(merges: Seq[(Char, Char)])(w: String): Long = {
    var s = w
    merges.zipWithIndex.foreach { case ((l, r), k) =>
      s = s.replace("" + l + r,
        (graft.spark.BpeCount.PlaceholderBase + k).toChar.toString)
    }
    s.length.toLong
  }

  private def refWordCount(w: String): Long = refWordCountFor(TextOps.BpeMerges)(w)

  /** Greedy first-fit fold: (chunkIdx, run) after packing `cs` at `budget`. */
  private def refPack(cs: Seq[Long], budget: Long = 48L): (Long, Long) =
    cs.foldLeft((0L, 0L)) { case ((ch, run), c) =>
      if (run > 0 && run + c > budget) (ch + 1, c) else (ch, run + c)
    }

  private def clfHashRef(w: String): Int = {
    // CODEPOINT-based like the engine (ClfScore hashes UTF8String.numChars
    // and codePointAt) — a UTF-16 charAt/length reference would silently
    // depend on the fixture being BMP-only (round-13 advice)
    val n = w.codePointCount(0, w.length)
    val first = if (w.isEmpty) 0 else w.codePointAt(0)
    val last = if (w.isEmpty) 0 else w.codePointBefore(w.length)
    (n * 31 + first * 17 + last * 7) % TextOps.ClfBuckets
  }

  /** (n_words, score) with the engine's exact IEEE operation order:
    * left-fold unigram sum, left-fold bigram sum, one add, one divide. */
  private def refScore(text: String): (Long, Double) = {
    val words = text.trim.toLowerCase.split("\\s+", -1)
    val hs = words.map(clfHashRef)
    val u = words.foldLeft(0.0)((a, w) => a + TextOps.clfUniW(clfHashRef(w)))
    val b = (0 until words.length - 1).foldLeft(0.0)((a, i) =>
      a + TextOps.clfBiW((hs(i) * 131 + hs(i + 1) * 17) % TextOps.ClfBuckets))
    (words.length.toLong, TextOps.ClfBias + (u + b) / (2 * words.length - 1))
  }

  private def texts(dir: String): Map[Long, String] =
    Tables.t(spark, dir, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("classifier score matches the reference on non-BMP text (one codepoint convention)") {
    // the convention the codepoint-based reference exists for: an astral
    // char is ONE symbol in the word hash (length, first, last) on both
    // the engine kernel and this reference
    val sp = spark
    import sp.implicits._
    val x = new String(Character.toChars(0x1D54F))
    val astral = s"the $x${x}quick ${x}fox$x over $x"
    val got = Seq(astral).toDF("text")
      .select(TextOps.clfScoreCol.as("s")).head().getDouble(0)
    assert(got == refScore(astral)._2, s"engine=$got ref=${refScore(astral)._2}")
  }

  // ---- tx13 ----

  test("tx13 classifier score is bit-identical to the independent reference") {
    val byDoc = texts(sfDir)
    val rows = graft.SparkEntry.queries("tx13_quality_classifier")(spark, sfDir)
      .collect()
    assert(rows.length == byDoc.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nw, score) = refScore(byDoc(id))
      assert(r.getAs[Long]("n_words") == nw, s"doc $id n_words")
      // EXACT double equality — the whole point of the dyadic-weight design
      assert(r.getAs[Double]("clf_score") == score, s"doc $id score")
      assert(r.getAs[Int]("keep") == (if (score >= 0) 1 else 0), s"doc $id keep")
    }
  }

  test("ClfScore kernel == the HOF compose bitwise (corpus + adversaries, both eval paths)") {
    val sp = spark
    import sp.implicits._
    // incl. non-ASCII: ascii() is codepoint semantics on both formulations
    // (and in DuckDB), so the agreement holds on any UTF-8 text
    val adversaries = Seq(
      "", " ", "  a  b ", "a", "the and ing", "word",
      "MiXeD CaSe WORDS", "punct, marks! here?", "   leading", "trailing   ",
      "a  b   c    d", "1 22 333 4444 55555", "!@# $%^ &*(",
      "étude naïve café", "€100 øre 北京 emoji🙂end", "Ärger straße")
    val corpus = Tables.t(spark, sfDir, "documents").select(col("text"))
    val crafted = (adversaries.map(Option(_)) :+ None).toDF("text")
    for (df <- Seq(corpus, crafted)) {
      val sel = df.select(
        graft.spark.ClfExpressions.clfScore(col("text"),
          TextOps.clfUniW, TextOps.clfBiW, TextOps.ClfBias).as("k"),
        TextOps.clfScoreOf(TextOps.clfWordsCol).as("c"),
        col("text"))
      val rows = sel.collect()
      rows.foreach { r =>
        if (r.isNullAt(2)) assert(r.isNullAt(0) && r.isNullAt(1), "null text must score null")
        else assert(r.getDouble(0) == r.getDouble(1),
          s"kernel=${r.get(0)} compose=${r.get(1)} on '${r.get(2)}'")
      }
      // interpreted path agreement (the BpeCountSpec recipe)
      sp.conf.set("spark.sql.codegen.wholeStage", "false")
      sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        sel.collect().zip(rows).foreach { case (a, b) =>
          assert(a.isNullAt(0) == b.isNullAt(0) &&
            (a.isNullAt(0) || a.getDouble(0) == b.getDouble(0)),
            s"interpreted diverges on '${a.get(2)}'")
        }
      } finally {
        sp.conf.set("spark.sql.codegen.wholeStage", "true")
        sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }

  test("tx13 keep decision is non-trivial on the corpus (both classes live)") {
    val keeps = graft.SparkEntry.queries("tx13_quality_classifier")(spark, sfDir)
      .groupBy(col("keep")).count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(keeps.getOrElse(1, 0L) > 0, "no doc kept — constant gate")
    assert(keeps.getOrElse(0, 0L) > 0, "no doc dropped — constant gate")
  }

  test("classifierGate admits exactly the tx13 keep set") {
    val docs = Tables.t(spark, sfDir, "documents")
    val admitted = graft.streaming.StreamingIngest.classifierGate()(docs)
      .collect().map(_.getLong(0)).toSet
    val expected = texts(sfDir).collect {
      case (id, t) if refScore(t)._2 >= 0 => id
    }.toSet
    assert(admitted == expected)
  }

  // ---- ch02 ----

  private def checkCh02(dir: String): Unit = {
    val byDoc = texts(dir)
    val rows = graft.SparkEntry.queries("ch02_token_chunks")(spark, dir).collect()
    assert(rows.length == byDoc.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val cs = byDoc(id).trim.split("\\s+", -1).toSeq.map(refWordCount)
      val (ch, _) = refPack(cs)
      assert(r.getAs[Long]("n_words") == cs.length.toLong, s"doc $id n_words")
      assert(r.getAs[Long]("subwords") == cs.sum, s"doc $id subwords")
      assert(r.getAs[Long]("n_chunks") == ch + 1, s"doc $id n_chunks")
      assert(r.getAs[Double]("avg_fill") == cs.sum.toDouble / (ch + 1), s"doc $id avg_fill")
    }
  }

  test("ch02 packing equals the replace-chain + greedy-fold reference on the corpus") {
    checkCh02(sfDir)
  }

  test("seeded random-text fuzz: kernel score and packing fold match the references on 300 draws") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(0xC1F13L)
    val pool = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;:!?#   "
    val texts = Seq.tabulate(300) { _ =>
      val n = rnd.nextInt(200)
      String.valueOf(Array.fill(n)(pool.charAt(rnd.nextInt(pool.length))))
    }.filter(_.trim.nonEmpty) // all-space draws: split("") shapes are pinned in the crafted test
    val df = texts.toDF("text")
    val rows = df.select(col("text"),
      graft.spark.ClfExpressions.clfScore(col("text"),
        TextOps.clfUniW, TextOps.clfBiW, TextOps.ClfBias).as("s"),
      transform(split(trim(col("text")), "\\s+"),
        x => graft.spark.BpeExpressions.bpeCount(x, TextOps.BpeMerges)).as("c")).collect()
    assert(rows.length >= 250, "fuzz corpus unexpectedly small")
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getDouble(1) == refScore(t)._2, s"kernel score diverges on '$t'")
      val cs = t.trim.split("\\s+", -1).toSeq.map(refWordCount)
      assert(r.getSeq[Long](2) == cs, s"per-word counts diverge on '$t'")
    }
  }

  test("ch03 packing equals the WIDE-table replace-chain reference and differs from ch02") {
    // the heap-path twin of checkCh02: per-word counts under the 80-rank
    // BpeMergesWide feed the same greedy fold, so a heap-merger miscount
    // would shift chunk boundaries, not just totals
    val byDoc = texts(sfDir)
    val wide = refWordCountFor(TextOps.BpeMergesWide) _
    val rows = graft.SparkEntry.queries("ch03_wide_token_chunks")(spark, sfDir).collect()
    assert(rows.length == byDoc.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val cs = byDoc(id).trim.split("\\s+", -1).toSeq.map(wide)
      val (ch, _) = refPack(cs)
      assert(r.getAs[Long]("subwords") == cs.sum, s"doc $id subwords")
      assert(r.getAs[Long]("n_chunks") == ch + 1, s"doc $id n_chunks")
    }
    // non-vacuity: the wide table must CHANGE the packing vs ch02 on the
    // fixture (fewer subwords => different boundaries for some doc), or
    // the row silently re-proves the sequential path
    val ch2 = graft.SparkEntry.queries("ch02_token_chunks")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("subwords"), r.getAs[Long]("n_chunks"))).toMap
    val diffSub = rows.count(r =>
      ch2(r.getAs[Long]("doc_id"))._1 != r.getAs[Long]("subwords"))
    val diffChunks = rows.count(r =>
      ch2(r.getAs[Long]("doc_id"))._2 != r.getAs[Long]("n_chunks"))
    assert(diffSub > 0, "wide table never changed a doc's subword count")
    assert(diffChunks > 0, "wide table never moved a chunk boundary")
  }

  test("ch02 crafted adversaries: oversized word, exact-fit boundary, multi-level merges") {
    checkCh02(craftedDir)
    val rows = graft.SparkEntry.queries("ch02_token_chunks")(spark, craftedDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("subwords"), r.getAs[Long]("n_chunks"))).toMap
    assert(rows(0L) == ((1L, 1L)))
    // 60 q's (own oversized chunk) + "bb" (rolls to a second chunk)
    assert(rows(1L) == ((62L, 2L)))
    // 4 x 12 fill the budget EXACTLY (48 is not > 48), 5th rolls
    assert(rows(2L) == ((60L, 2L)))
    // "the"=1, "and"=1, "ing"=1, "theand"=2 -> 5 subwords, 1 chunk
    assert(rows(3L) == ((5L, 1L)))
  }
}
