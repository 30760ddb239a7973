package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[BpeCount]] — the frozen-merges subword counting kernel — against an
  * INDEPENDENT reference implementing the textbook greedy loop (always
  * merge the LOWEST-RANK pair present anywhere in the word, leftmost
  * first), not the kernel's rank-sequential pass: the equivalence of the
  * two on well-formed tables is exactly the property the sp17 oracle
  * depends on, so it is pinned here rather than argued only in prose.
  * Also pins: interpreted == codegen, the replace-chain formulation the
  * DuckDB oracle uses (expressed in Spark), nulls, and empties.
  */
class BpeCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the spec's own copy of a well-formed table (base chars + two-level
  // placeholder merges), intentionally overlapping pairs to stress
  // left-to-right non-overlap ("ee"/"es"/"se", "ll", "th"/"the")
  private def p(k: Int): Char = (BpeCount.PlaceholderBase + k).toChar
  private val pairs: Seq[(Char, Char)] = Seq(
    ('t', 'h'), (p(0), 'e'), ('i', 'n'), (p(2), 'g'), ('e', 'e'),
    ('e', 's'), ('s', 'e'), ('l', 'l'), ('a', 'n'), (p(8), 'd'))

  /** Textbook greedy: repeatedly merge the lowest-rank pair present,
    * leftmost occurrence first, until no pair applies. Operates on
    * CODEPOINTS (the kernel's symbol domain), so astral-plane chars are
    * one symbol here too. */
  private def greedyRef(text: String, tbl: Seq[(Char, Char)] = pairs): Long = {
    val rank = tbl.zipWithIndex.map { case ((l, r), k) => ((l.toInt, r.toInt), k) }.toMap
    def word(cs: List[Int]): Long = {
      var t = cs
      var done = false
      while (!done && t.length > 1) {
        val present = t.zip(t.tail).flatMap(pr => rank.get(pr))
        if (present.isEmpty) done = true
        else {
          val best = present.min
          val (l, r) = (tbl(best)._1.toInt, tbl(best)._2.toInt)
          val out = scala.collection.mutable.ListBuffer.empty[Int]
          var rest = t
          var merged = false
          while (rest.nonEmpty) {
            rest match {
              case a :: b :: tl if !merged && a == l && b == r =>
                out += (BpeCount.PlaceholderBase + best); rest = tl; merged = true // leftmost only
              case a :: tl => out += a; rest = tl
              case Nil =>
            }
          }
          t = out.toList
        }
      }
      t.length.toLong
    }
    text.split(" ", -1).filter(_.nonEmpty)
      .map(w => word(w.codePoints().toArray.toList)).sum
  }

  private val rnd = new scala.util.Random(55701L)
  private def randWord(): String = {
    val alphabet = "theingandsel" // skewed toward merge material
    (0 until (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }
  private def randText(): String =
    (0 until rnd.nextInt(8)).map(_ => randWord()).mkString(" ")

  private val cases: Seq[String] =
    Seq("", " ", "   ", "the", "thee", "these", "theses", "ll", "lll", "llll",
      "thing", "singing", "and", "sand", "in the end", "a  b", " leading",
      "trailing ", "x", "seeds sees essen") ++ (1 to 300).map(_ => randText())

  test("kernel == textbook lowest-rank-first greedy on 320 adversarial/random texts, BOTH paths") {
    val merges = BpeCount.encodeMerges(pairs).toArray
    val seqTbl = new BpeCount.MergeTable(merges, false)
    val heapTbl = new BpeCount.MergeTable(merges, true)
    cases.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val k = BpeCount.compute(u, seqTbl)
      val h = BpeCount.compute(u, heapTbl)
      val g = greedyRef(t)
      assert(k == g, s"seq kernel=$k greedy=$g on '$t'")
      assert(h == g, s"heap kernel=$h greedy=$g on '$t'")
    }
  }

  test("codepoint symbols: astral-plane chars are ONE symbol (DuckDB's length/replace arithmetic), both paths") {
    // the adversarial surrogate-pair cases the round-13 review asked for:
    // U+1D54F (math X) is 2 UTF-16 code units but one codepoint — a
    // code-unit kernel would count it twice and could even false-match a
    // merge operand against a lone surrogate
    val x = new String(Character.toChars(0x1D54F))
    val astral = Seq(
      s"$x", s"a${x}b", s"th$x", s"${x}the$x in", s"$x $x $x",
      s"the$x${x}the", s"ll$x" + x * 3)
    val merges = BpeCount.encodeMerges(pairs).toArray
    val seqTbl = new BpeCount.MergeTable(merges, false)
    val heapTbl = new BpeCount.MergeTable(merges, true)
    astral.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val g = greedyRef(t)
      assert(BpeCount.compute(u, seqTbl) == g, s"seq diverges on astral '$t'")
      assert(BpeCount.compute(u, heapTbl) == g, s"heap diverges on astral '$t'")
    }
    // the arithmetic the oracle uses: one astral char counts 1, not 2
    assert(BpeCount.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"a${x}b"), seqTbl) == 3L)
  }

  test("heap path == sequential path on a WIDE random table (past the dispatch threshold)") {
    // a 300-rank table (well-formed: operands are base chars or earlier
    // placeholders) — wide enough that the production dispatch picks the
    // heap; both paths must agree bit-identically on the fuzz corpus
    val r2 = new scala.util.Random(90210L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val wide = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
    while (wide.length < 300) {
      def operand(): Char =
        if (wide.nonEmpty && r2.nextInt(4) == 0) p(r2.nextInt(wide.length))
        else alphabet(r2.nextInt(alphabet.length))
      val cand = (operand(), operand())
      if (!wide.contains(cand)) wide += cand // duplicate pairs would make rankOf ambiguous
    }
    val merges = BpeCount.encodeMerges(wide.toSeq).toArray
    assert(merges.length > BpeCount.HeapThreshold)
    assert(new BpeCount.MergeTable(merges).useHeap, "production dispatch must pick the heap")
    val seqTbl = new BpeCount.MergeTable(merges, false)
    val heapTbl = new BpeCount.MergeTable(merges, true)
    val texts = cases ++ (1 to 200).map(_ =>
      (0 until (1 + r2.nextInt(6))).map(_ =>
        (0 until (1 + r2.nextInt(12))).map(_ => alphabet(r2.nextInt(alphabet.length))).mkString)
        .mkString(" "))
    texts.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val s = BpeCount.compute(u, seqTbl)
      val h = BpeCount.compute(u, heapTbl)
      assert(s == h, s"paths diverge on '$t': seq=$s heap=$h")
      assert(s == greedyRef(t, wide.toSeq), s"seq != greedy on '$t'")
    }
  }

  test("codegen == interpreted; replace-chain formulation (the oracle's shape) agrees; nulls/empties") {
    val sp = spark
    import sp.implicits._
    val df = (cases.map(Option(_)) :+ None).toDF("text")
    // the oracle's formulation, in Spark: rank-ordered replace chain,
    // count = length(replaced) - spaces(original)
    val replaced = pairs.zipWithIndex.foldLeft(col("text")) { case (acc, ((l, r), k)) =>
      regexp_replace(acc, lit(java.util.regex.Pattern.quote(s"$l$r")), lit(p(k).toString))
    }
    val chain = (length(replaced) -
      (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit(""))))).cast("long")
    val rows = df.select(
      graft.spark.BpeExpressions.bpeCount(col("text"), pairs).as("k"),
      chain.as("c"), col("text")).collect()
    rows.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(0), "null text must count null")
      else assert(r.getLong(0) == r.getLong(1),
        s"kernel=${r.get(0)} chain=${r.get(1)} on '${r.getString(2)}'")
    }
    // interpreted path agreement
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows2 = df.select(
        graft.spark.BpeExpressions.bpeCount(col("text"), pairs).as("k"), col("text")).collect()
      rows2.zip(rows).foreach { case (a, b) =>
        assert(a.isNullAt(0) == b.isNullAt(0) &&
          (a.isNullAt(0) || a.getLong(0) == b.getLong(0)),
          s"interpreted diverges on '${a.get(1)}'")
      }
    } finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("malformed tables never reach the heap: duplicate pairs and forward refs are rejected loudly") {
    // duplicate (l, r): rankOf would be ambiguous on the heap path
    val dup = Seq(('t', 'h'), ('i', 'n'), ('t', 'h'))
    val dupM = BpeCount.encodeMerges(dup).toArray
    intercept[IllegalArgumentException](new BpeCount.MergeTable(dupM, true))
    // forward placeholder reference: rank 0 uses rank 1's placeholder —
    // fires under the greedy order, never under the sequential one
    val fwd = Seq((p(1), 'e'), ('t', 'h'))
    val fwdM = BpeCount.encodeMerges(fwd).toArray
    intercept[IllegalArgumentException](new BpeCount.MergeTable(fwdM, true))
    // the sequential path stays permissive (rank-sequential semantics and
    // the replace-chain oracle are well-defined for ANY pair list) but the
    // table KNOWS it is malformed and never auto-dispatches to the heap
    Seq(dupM, fwdM).foreach { m =>
      val t = new BpeCount.MergeTable(m, false)
      assert(!t.wellFormed && !t.useHeap)
      // counts still match the textbook replace-chain on the seq path
      val u = org.apache.spark.unsafe.types.UTF8String.fromString("the thin") // th fires
      assert(BpeCount.compute(u, t) > 0L)
    }
    // a WIDE malformed table refuses auto-dispatch too: degrading a
    // production-width corrupt artifact to the 56x-slower sequential pass
    // would be its own silent failure
    val wideDup = (0 until (BpeCount.HeapThreshold + 5)).map(i =>
      (('a' + i % 26).toChar, ('a' + (i / 26) % 26).toChar)) :+ ('a', 'a')
    intercept[IllegalArgumentException](
      new BpeCount.MergeTable(BpeCount.encodeMerges(wideDup).toArray))
  }

  test("encodeMerges caps the table at the BMP private-use block (6400 ranks)") {
    assert(BpeCount.MaxRanks == 6400)
    // rank 6400 would emit U+F900 — a real CJK compatibility ideograph
    assert(0xE000 + BpeCount.MaxRanks == 0xF900)
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    def pairAt(i: Int): (Char, Char) =
      (base(i % base.length), base((i / base.length) % base.length))
    val atCap = (0 until BpeCount.MaxRanks).map(pairAt)
    assert(BpeCount.encodeMerges(atCap).length == BpeCount.MaxRanks) // 6400 ok
    intercept[IllegalArgumentException](
      BpeCount.encodeMerges(atCap :+ pairAt(BpeCount.MaxRanks))) // 6401 refused
  }

  test("tx14's production-width table dispatches to the heap and changes counts vs the 28-rank table") {
    val wide = graft.ops.TextOps.BpeMergesWide
    assert(wide.length > BpeCount.HeapThreshold, s"width ${wide.length}")
    val tbl = new BpeCount.MergeTable(BpeCount.encodeMerges(wide).toArray)
    assert(tbl.useHeap && tbl.wellFormed,
      "tx14's table must land on the heap path — that is the row's point")
    // prefix property: ranks 0-27 are the shipped table verbatim, so tx14
    // extends (not forks) the frozen-artifact story
    assert(wide.take(graft.ops.TextOps.BpeMerges.length) == graft.ops.TextOps.BpeMerges)
    // the wide table must actually FIRE beyond the shipped 28 ranks on
    // representative text, or tx14 would re-prove sp17 under a new name;
    // heap == greedy on the same text (the independent reference, at width)
    val texts = Seq("the other estate is near", "her red car radar",
      "sense and sensibility", "these theses") ++ (1 to 100).map(_ => randText())
    val narrow = new BpeCount.MergeTable(
      BpeCount.encodeMerges(graft.ops.TextOps.BpeMerges).toArray)
    var diverged = false
    texts.foreach { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val w = BpeCount.compute(u, tbl)
      assert(w == greedyRef(t, wide), s"wide-table heap != greedy on '$t'")
      if (w != BpeCount.compute(u, narrow)) diverged = true
    }
    assert(diverged, "wide table never fired past rank 27 — tx14 would be vacuous")
  }

  test("the shipped frozen table is well-formed and the registry count is non-trivial") {
    // well-formed: every operand is a base char or an EARLIER placeholder —
    // the precondition of the rank-sequential == greedy equivalence
    graft.ops.TextOps.BpeMerges.zipWithIndex.foreach { case ((l, r), k) =>
      Seq(l, r).foreach { c =>
        assert(c < BpeCount.PlaceholderBase || (c - BpeCount.PlaceholderBase) < k,
          s"rank $k references placeholder of rank ${c - BpeCount.PlaceholderBase}")
      }
    }
    val sp = spark
    import sp.implicits._
    // subword counts differ from whitespace counts (the point of sp17) and
    // from character counts (merges actually fire)
    val df = Seq("the thing and these", "in an ingot").toDF("text")
    val r = df.select(
      graft.spark.BpeExpressions.bpeCount(col("text"), graft.ops.TextOps.BpeMerges).as("b"),
      size(split(trim(col("text")), "\\s+")).cast("bigint").as("w"),
      (length(col("text")) - (length(col("text")) -
        length(regexp_replace(col("text"), lit(" "), lit(""))))).cast("long").as("chars"))
      .collect()
    r.foreach { row =>
      assert(row.getLong(0) > row.getLong(1), "subword count must exceed word count")
      assert(row.getLong(0) < row.getLong(2), "merges must fire (count < chars)")
    }
  }
}
