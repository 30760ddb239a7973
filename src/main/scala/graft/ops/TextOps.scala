package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID (marker n-gram
  * heuristic), quality scoring, token counting, and document fingerprinting.
  *
  * Every metric here is defined so the *same arithmetic* is expressible in both
  * Spark and DuckDB (occurrence counts via the length-of-replace trick), so the
  * oracle is exact, not approximate. All per-document — map-only at any scale.
  */
object TextOps {
  import Tables.t

  /** Languages in priority order (ties resolve to the earliest). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " a "),
    "es" -> Seq(" el ", " la ", " y "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "zh" -> Seq(" zh ")) // placeholder marker; synthetic corpus is latin-script

  private val stopwords = Seq(" the ", " a ", " and ", " of ", " to ")

  /** #occurrences of literal `m` in `c` = (len(c) - len(replace(c, m)))/len(m). */
  private def occ(c: Column, m: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(m), ""))) / m.length
  private def occSql(c: String, m: String): String =
    s"(len($c) - len(replace($c, '$m', ''))) / ${m.length}"

  private def padded(c: Column): Column = concat(lit(" "), lower(c), lit(" "))
  private val paddedSql = "(' ' || lower(text) || ' ')"

  /** tx01's language argmax (first-wins tie-break via a when() chain), shared
    * with the pp01 pipeline so both stages are provably the same predicate. */
  private[ops] def predLangCol: Column = {
    val p = padded(col("text"))
    val scores = langMarkers.map { case (lg, ms) => lg -> ms.map(occ(p, _)).reduce(_ + _) }
    scores.zipWithIndex.foldRight(lit(langMarkers.last._1)) {
      case (((lg, sc), i), els) =>
        val laterMax = scores.drop(i + 1).map(_._2)
        if (laterMax.isEmpty) els
        else when(sc >= (if (laterMax.size == 1) laterMax.head else greatest(laterMax: _*)), lg).otherwise(els)
    }
  }

  private[ops] val predLangSql: String = {
    val sc = langMarkers.map { case (lg, ms) =>
      lg -> ms.map(m => occSql(paddedSql, m)).mkString("(", " + ", ")")
    }
    sc.init.zipWithIndex.map { case ((lg, e), i) =>
      val later = sc.drop(i + 1).map(_._2)
      s"WHEN $e >= greatest(${later.mkString(", ")}) THEN '$lg'"
    }.mkString("CASE ", " ", s" ELSE '${sc.last._1}' END")
  }

  /** The vocabulary tokenizer (tx05/tx06/sp14 share it so every consumer
    * agrees on what a token is — lowercase alphabetic runs of length >= 2). */
  private[ops] def vocabTokens: Column =
    regexp_extract_all(lower(col("text")), lit("[a-z]{2,}"), lit(0))
  private[ops] val vocabTokensSql = "regexp_extract_all(lower(text), '[a-z]{2,}')"

  /** The whitespace token count and dd01's exact fingerprint — pp04's
    * pipeline and its streaming ingest twin ([[Ingest]]) must agree
    * byte-for-byte on both, so there is ONE definition. */
  private[ops] def tokensCol: Column =
    size(split(trim(col("text")), "\\s+")).cast("bigint")
  private[ops] def exactFpCol: Column = md5(lower(trim(col("text"))))

  /** The FROZEN BPE merge table (rank order) — the subword analog of the
    * dsirGate/perplexityGate frozen-artifact stance: a trained tokenizer's
    * merges are an immutable serving artifact, and every budget operator
    * that packs by subword counts replays exactly this list. Rank k's
    * output token is the private-use char U+E000+k, so multi-level merges
    * reference earlier placeholders (the table is WELL-FORMED — operands
    * are base chars or strictly-earlier ranks — which is what makes
    * rank-sequential application equal the greedy loop; see
    * [[graft.spark.BpeCount]]). English bigrams chosen for coverage on
    * the synthetic corpus; the two-level entries ("the", "ing") pin the
    * placeholder-recursion path. */
  private[graft] val BpeMerges: Seq[(Char, Char)] = {
    def p(k: Int): Char = (graft.spark.BpeCount.PlaceholderBase + k).toChar
    Seq(
      ('t', 'h'), (p(0), 'e'),  // ranks 0-1: "th", "the"
      ('i', 'n'), (p(2), 'g'),  // ranks 2-3: "in", "ing"
      ('a', 'n'), (p(4), 'd'),  // ranks 4-5: "an", "and"
      ('e', 'r'), ('o', 'n'), ('r', 'e'), ('a', 't'), ('e', 'n'),
      ('o', 'r'), ('e', 's'), ('s', 't'), ('a', 'r'), ('o', 'u'),
      ('l', 'e'), ('i', 's'), ('i', 't'), ('a', 'l'), ('t', 'i'),
      ('s', 'e'), ('d', 'e'), ('c', 'o'), ('l', 'l'), ('s', 's'),
      ('e', 'e'), ('o', 'o'))
  }

  /** The per-doc subword token count under [[BpeMerges]]. */
  private[ops] def bpeTokensCol: Column =
    graft.spark.BpeExpressions.bpeCount(col("text"), BpeMerges)

  /** A PRODUCTION-WIDTH frozen merge table (80 ranks > HeapThreshold=64)
    * so the heap merger — the path a real 50k-vocab tokenizer lands on —
    * is exercised by a driver-gated oracle row (tx14), not only by the
    * forced-path spec. Ranks 0-27 are [[BpeMerges]] verbatim (keeping the
    * two-level "the"/"ing" recursion entries on the heap path); ranks
    * 28-77 fill with the first 50 unseen letter bigrams of a frequency-
    * ordered alphabet scan (dense hits on English-ish text — the wide
    * table must CHANGE counts vs the 28-rank one, or the row would prove
    * nothing); ranks 78-79 are deep recursions referencing WIDE-ONLY
    * placeholders (ranks 28 and 78), pinning multi-level placeholder
    * resolution above the dispatch threshold. Well-formed by
    * construction: the scan dedups against everything already picked and
    * every recursion references a strictly earlier rank — checked at
    * class-init by the MergeTable validation below. */
  private[graft] val BpeMergesWide: Seq[(Char, Char)] = {
    def p(k: Int): Char = (graft.spark.BpeCount.PlaceholderBase + k).toChar
    val seen = scala.collection.mutable.LinkedHashSet[(Char, Char)](BpeMerges: _*)
    val letters = "etaoinshrdlcumwfgypbvk"
    val fill = for (l <- letters; r <- letters; pr = (l, r)
                    if !seen.contains(pr)) yield { seen += pr; pr }
    BpeMerges ++ fill.take(50) ++ Seq((p(28), 's'), (p(78), 'e'))
  }

  /** Class-init guards for the tx14 contract: the wide table must
    * actually dispatch to the heap (width above the threshold, table
    * well-formed — a malformed one would THROW here, at the earliest
    * possible moment) — otherwise the row silently degrades to re-proving
    * the sequential path sp17 already covers. */
  locally {
    val t = new graft.spark.BpeCount.MergeTable(
      graft.spark.BpeCount.encodeMerges(BpeMergesWide).toArray)
    require(t.useHeap && t.wellFormed,
      s"BpeMergesWide (${BpeMergesWide.length} ranks) must dispatch to the " +
        "heap merger — tx14 exists to oracle-gate that path")
  }

  /** The per-doc subword token count under the production-width table. */
  private[ops] def bpeWideTokensCol: Column =
    graft.spark.BpeExpressions.bpeCount(col("text"), BpeMergesWide)

  /** The EXACT DuckDB replay of [[bpeTokensCol]] as an expression over a
    * column named `text`: the nested replace() chain in rank order
    * (left-to-right non-overlapping — SQL replace's contract and the
    * kernel's), count = length(replaced) − spaces (spaces survive every
    * merge untouched, so the space count of the original text is the
    * word-boundary correction). */
  /** The rank-order replace chain over an arbitrary sql expression — the
    * [[bpeTokensSql]] body parameterized so per-WORD oracles (ch02's
    * chunk packing) replay the same kernel: the subword count of a
    * space-free word is just `length(chain(word))`, no boundary term.
    * Parameterized on the merge list too (tx14's production-width table
    * replays through the SAME chain builder — SQL replace is rank-order
    * left-to-right non-overlapping at any table width). */
  private[graft] def bpeReplaceChainSqlFor(merges: Seq[(Char, Char)],
                                           expr: String): String = {
    def chrSql(c: Char): String =
      if (c >= graft.spark.BpeCount.PlaceholderBase) s"chr(${c.toInt})" else s"'$c'"
    merges.zipWithIndex.foldLeft(expr) { case (acc, ((l, r), k)) =>
      s"replace($acc, ${chrSql(l)} || ${chrSql(r)}, " +
        s"chr(${graft.spark.BpeCount.PlaceholderBase + k}))"
    }
  }

  private[graft] def bpeReplaceChainSql(expr: String): String =
    bpeReplaceChainSqlFor(BpeMerges, expr)

  private def bpeTokensSqlFor(merges: Seq[(Char, Char)]): String =
    s"(length(${bpeReplaceChainSqlFor(merges, "text")}) - " +
      "(length(text) - length(replace(text, ' ', ''))))"

  private[ops] val bpeTokensSql: String = bpeTokensSqlFor(BpeMerges)

  /** tx14's oracle body: the same count identity under the wide table. */
  private[ops] val bpeWideTokensSql: String = bpeTokensSqlFor(BpeMergesWide)

  /** BPE merge TRAINING (Sennrich et al. 2016) — the other half of the
    * subword story: [[bpeTokensCol]] COUNTS under a frozen table; this
    * LEARNS the table. The kernel's placeholder representation is what
    * keeps training distributed-simple AND oracle-exact: every symbol is
    * ONE char (base chars + private-use placeholders), so a round's
    * re-segmentation is a single-char-pair `replace` (left-to-right
    * non-overlapping — both engines' contract and the count kernel's
    * merge-pass semantics), never a list-of-symbols manipulation.
    *
    * Execution shape (what a 100 TB corpus costs): ONE corpus pass folds
    * the text into the word-count DICTIONARY (vocabulary-scale, not
    * corpus-scale — the classic BPE trick: all further work is weighted
    * by `cnt`); each of the N rounds is one partial-agg shuffle over the
    * dictionary's adjacent-pair explosion (#distinct single-char pairs ≈
    * hundreds of groups), a 1-ROW argmax collect (bounded — the Dsir
    * 256-row precedent), and a map-only replace folded into the cached
    * dictionary's projection (round k re-evaluates k replaces over the
    * cached base instead of stacking N persists). Tie-breaks are total:
    * (count DESC, left, right) on single-char strings, which both engines
    * compare bytewise. Pair counts are the textbook every-adjacent-
    * position stat ('aaa' counts (a,a) twice, merges once) — the oracle
    * replays the same.
    *
    * Returns one row per learned rank: (rank, l_code, r_code, merged_code,
    * pair_count, corpus_tokens) with codepoints instead of raw private-use
    * chars, and corpus_tokens = dictionary-weighted token count AFTER the
    * rank's merge — the compression curve, and the tie to the count
    * kernel: feeding the learned pairs to [[graft.spark.BpeExpressions
    * .bpeCount]] reproduces the final row's corpus_tokens exactly
    * (BpeTrainSpec pins this and the textbook reference). */
  private[graft] def bpeTrain(docs: org.apache.spark.sql.DataFrame,
                              nMerges: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val base = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .persist() // read N+1 times (pair counts + final curve point), vocab-sized
    val picked = Seq.newBuilder[(String, String, Long)] // (l, r, pair_count)
    // Σ(pair counts) of each round — rides the argmax job for free and
    // telescopes into the token curve (see below), replacing what used to
    // be a separate end-of-training job evaluating all N replace-chain
    // prefixes (N(N+1)/2 replace evaluations over the dictionary).
    val sigmaC = Seq.newBuilder[Long]
    var wcol: Column = col("word")
    var k = 0
    while (k < nMerges) {
      // ONE aggregation for the round via GROUPING SETS ((l,r), ()): the
      // per-pair counts AND their grand total Σc = Σ cnt·(len(w)−1). With
      // W = Σ cnt (invariant — merges shrink words, never drop them), the
      // post-merge token count is exactly T(w_k) = Σc_k + W in the same
      // integer arithmetic the one-job curve computed (guide §1.2: don't
      // re-scan for a number an existing pass already determines). The
      // total row sorts first deterministically (gid 3 > 0 — not by its
      // count, which ties the best pair's when one group exists).
      val pairs = base.select(col("cnt"), wcol.as("w"))
        .filter(length(col("w")) >= 2) // sequence(1, 0) would DESCEND
        .select(col("cnt"), explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => struct(col("w").substr(i, lit(1)).as("l"),
            col("w").substr(i + 1, lit(1)).as("r")))).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
        .groupingSets(Seq(Seq(col("l"), col("r")), Seq.empty), col("l"), col("r"))
        .agg(sum(col("cnt")).as("c"), grouping_id().cast("int").as("gid"))
      val top = pairs.orderBy(col("gid").desc, col("c").desc, col("l"), col("r"))
        .limit(2).collect()
      require(top.length == 2 && top(0).getInt(3) == 3 && top(1).getInt(3) == 0,
        s"bpeTrain round $k: expected one grand-total row and one best pair, " +
          s"got ${top.mkString("; ")}")
      val best = top(1)
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      sigmaC += top(0).getLong(2)
      val merged = (graft.spark.BpeCount.PlaceholderBase + k).toChar.toString
      wcol = replace(wcol, lit(l + r), lit(merged))
      picked += ((l, r, c))
      k += 1
    }
    // Final curve point + the invariant word count W in one job: only the
    // LAST dictionary's weighted length is evaluated directly (one replace
    // chain); every earlier curve point is Σc of the FOLLOWING round's
    // pair job, already collected above.
    val lastRow = base.agg(sum(col("cnt") * length(wcol)).as("tLast"),
      sum(col("cnt")).as("w")).collect()(0)
    val w = lastRow.getLong(1)
    val sigma = sigmaC.result()
    val curve = (0 until nMerges).map { kk =>
      if (kk == nMerges - 1) lastRow.getLong(0) else sigma(kk + 1) + w
    }
    base.unpersist(false)
    picked.result().zipWithIndex.map { case ((l, r, c), kk) =>
      (kk.toLong, l.codePointAt(0).toLong, r.codePointAt(0).toLong,
        (graft.spark.BpeCount.PlaceholderBase + kk).toLong, c, curve(kk))
    }
  }

  /** The EXACT DuckDB replay of [[bpeTrain]]: N unrolled rounds, each a
    * pair-count CTE over the previous dictionary, a 1-row argmax with the
    * same (c DESC, l, r) tie-break, and a replace re-segmentation to the
    * round's private-use placeholder. Every multiply-referenced CTE is
    * AS MATERIALIZED: each w_k feeds three consumers (p_k, w_{k+1}, t_k),
    * so an inlining planner (DuckDB 1.0 default) would re-evaluate the
    * chain 3^N times — measured 74 s at sf0.01 inlined vs sub-second
    * materialized. */
  private[ops] def bpeTrainSql(nMerges: Int): String = {
    val base = graft.spark.BpeCount.PlaceholderBase.toInt
    val rounds = (0 until nMerges).map { k =>
      s"""p$k AS MATERIALIZED (SELECT substr(word, i::INT, 1) AS l, substr(word, i::INT + 1, 1) AS r,
              CAST(sum(cnt) AS BIGINT) AS c
            FROM (SELECT word, cnt, unnest(generate_series(1, length(word) - 1)) AS i
                  FROM w$k WHERE length(word) >= 2)
            GROUP BY 1, 2),
          b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
          w${k + 1} AS MATERIALIZED (SELECT replace(word, (SELECT l || r FROM b$k), chr(${base + k})) AS word, cnt
            FROM w$k),
          t$k AS MATERIALIZED (SELECT CAST(sum(cnt * length(word)) AS BIGINT) AS toks FROM w${k + 1})"""
    }.mkString(",\n          ")
    val rows = (0 until nMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rank,
            CAST((SELECT ord(l) FROM b$k) AS BIGINT) AS l_code,
            CAST((SELECT ord(r) FROM b$k) AS BIGINT) AS r_code,
            CAST(${base + k} AS BIGINT) AS merged_code,
            (SELECT c FROM b$k) AS pair_count,
            (SELECT toks FROM t$k) AS corpus_tokens"""
    }.mkString("\n          UNION ALL\n          ")
    s"""WITH w0 AS MATERIALIZED (SELECT w AS word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE length(w) >= 1 GROUP BY w),
          $rounds
        SELECT rank, l_code, r_code, merged_code, pair_count, corpus_tokens
        FROM ($rows) ORDER BY rank"""
  }

  /** tx08's bigram-LM per-document scores (doc_id, n_bigrams, n_unseen,
    * nll), shared with sp15's perplexity-band selection — ONE model
    * definition (tokenization, train split, smoothing), the sp14/ingest
    * single-definition rule. Tokens/histories/bigrams are 64-bit HASHES
    * (the fused WordHashes/SpanHashes kernels): every count is
    * hash-invariant modulo collisions (the dd03/tx07 set argument — the
    * oracle computes the same counts from strings), and the count/score
    * joins key on longs instead of bigram strings. */
  /** (carried columns..., w1, bg) hashed-bigram relation for a frame that
    * already carries `wh` (wordHashes) — nllScores' pair extraction,
    * factored so the stored-model stream scorer tokenizes IDENTICALLY.
    * Pairs are empty for docs under 2 words (slice guard, not when() —
    * see Dedup.shingleHashes on conditional-branch CSE). */
  private[graft] def bigramPairsFromWh(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pairIdx = slice(sequence(lit(0), greatest(size(col("wh")) - 2, lit(0))),
      lit(1), greatest(size(col("wh")) - 1, lit(0)))
    val pairs = transform(pairIdx, i => struct(
      get(col("wh"), i).as("w1"),
      get(col("bgh"), i).as("bg")))
    val carried = df.columns.filter(c => c != "wh").map(col).toIndexedSeq
    df.withColumn("bgh", graft.spark.SketchExpressions.spanHashes(col("wh"), 2))
      .select(carried :+ explode(pairs).as("p"): _*)
      .select(carried :+ col("p.w1").as("w1") :+ col("p.bg").as("bg"): _*)
  }

  /** The tx08 model's relations, built ONCE (c1/c12/vocab train on the
    * bk<80 slice; base/ex cover the whole corpus for the eval side) —
    * shared between nllScores and the stored-model build
    * ([[graft.streaming.PerplexityStore]]). */
  private[graft] final case class LmRelations(
      base: org.apache.spark.sql.DataFrame, ex: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame, c12: org.apache.spark.sql.DataFrame,
      vocabDf: org.apache.spark.sql.DataFrame) {
    /** Materialized vocabulary size — only for consumers that FREEZE the
      * model to disk (PerplexityStore.build). Query paths cross-join
      * [[vocabDf]] instead, so the distinct count rides the main job as one
      * more stage rather than a separate up-front action + corpus pass
      * (optimization guide §1.2: remove unnecessary passes). */
    lazy val vocab: Long = vocabDf.collect()(0).getLong(0)
  }

  private[graft] def lmRelations(s: org.apache.spark.sql.SparkSession,
      d: String): LmRelations = {
    val base = Tables.spread(t(s, d, "documents"))
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("bk"),
        graft.spark.SketchExpressions.wordHashes(col("text")).as("wh"))
      .persist() // read three times: train counts, vocab scalar, eval side
    val ex = bigramPairsFromWh(base)
    val train = ex.filter(col("bk") < 80)
    val c12 = train.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // 1-row lazy relation; count_distinct over the exploded train words is
    // value-identical to the eager .distinct().count() it replaces (no
    // NULL word hashes; empty input folds to a single 0 row either way)
    val vocabDf = base.filter(col("bk") < 80)
      .select(explode(col("wh")).as("word"))
      .agg(count_distinct(col("word")).as("graft_vocab"))
    LmRelations(base, ex, c1, c12, vocabDf)
  }

  /** Per-pair smoothed negative log-likelihood under (c1, c12, vocab). */
  private[graft] def nllColOf(vocab: Column): Column =
    -log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
      (coalesce(col("c1"), lit(0L)) + vocab))
  private[graft] def nllCol(vocab: Long): Column = nllColOf(lit(vocab))

  private[ops] def nllScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = nllScoresOf(lmRelations(s, d))

  /** [[nllScores]] over an ALREADY-BUILT model — so a caller that needs
    * both the count relations and the scores (the stored-model build)
    * trains the LM once and owns the persist lifecycle of `m.base`. */
  private[graft] def nllScoresOf(m: LmRelations): org.apache.spark.sql.DataFrame = {
    // the 1-row vocab aggregate attaches by broadcast cross-join so its
    // distinct count runs as a stage of THIS job (overlapped with the count
    // joins) instead of a separate driver action scanning the corpus first
    val scored = m.ex
      .join(m.c12, Seq("bg"), "left")
      .join(m.c1, Seq("w1"), "left")
      .crossJoin(broadcast(m.vocabDf))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
        avg(nllColOf(col("graft_vocab"))).as("nll"))
    m.base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
  }

  /** The tx08 model as DuckDB CTEs (d, pairs, tr, c12, c1, v, s) — shared
    * by the tx08 and sp15 oracles so both replay the SAME model. */
  private[ops] def nllSqlCtes: String =
    s"""d AS (SELECT doc_id, string_split(lower(text), ' ') AS w,
              ${Sampling.hashBucketSql("doc_id")} AS bk FROM documents),
          -- aligned unnests zip in DuckDB; comprehensions allow len(w) bounds
          pairs AS (SELECT doc_id, bk,
                      unnest([w[i] for i in generate_series(1, len(w)-1)]) AS w1,
                      unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)]) AS bg
                    FROM d),
          tr AS (SELECT * FROM pairs WHERE bk < 80),
          c12 AS (SELECT bg, count(*) AS c12 FROM tr GROUP BY bg),
          c1 AS (SELECT w1, count(*) AS c1 FROM tr GROUP BY w1),
          v AS (SELECT count(DISTINCT u.word) AS v
                FROM (SELECT unnest(w) AS word FROM d WHERE bk < 80) u),
          s AS (SELECT p.doc_id, count(*) AS n_bigrams,
                  CAST(sum(CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
                  avg(-ln((coalesce(c12.c12, 0) + 1)::DOUBLE / (coalesce(c1.c1, 0) + v.v))) AS nll
                FROM pairs p LEFT JOIN c12 USING (bg) LEFT JOIN c1 USING (w1) CROSS JOIN v
                GROUP BY p.doc_id)"""

  /** tx02's quality score, shared with pp01 (same raw-double arithmetic on
    * both engines, so a threshold on it filters identically). */
  private[ops] def qualityCol: Column = {
    val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
    val punct = (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("bigint")
    val stops = stopwords.map(occ(padded(col("text")), _)).reduce(_ + _)
    val punctRatio = punct.cast("double") / length(col("text"))
    val stopRatio = stops / nWords
    lit(0.4) * least(nWords.cast("double") / 100, lit(1.0)) +
      lit(0.3) * (lit(1.0) - punctRatio) + lit(0.3) * least(stopRatio * 5, lit(1.0))
  }

  private[ops] val qualitySql: String = {
    val stopsSql = stopwords.map(m => occSql(paddedSql, m)).mkString(" + ")
    s"""0.4 * least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0)
        + 0.3 * (1.0 - (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g'))::DOUBLE) / len(text))
        + 0.3 * least(($stopsSql) / len(string_split_regex(trim(text), '\\s+')) * 5, 1.0)"""
  }

  // ---- tx13's frozen hashed linear classifier (fastText shape) ----
  // Classifier-based quality filtering is the third frozen-model admission
  // family real pipelines run next to DSIR and the perplexity band (the
  // GPT-3/CCNet "quality classifier" slot): a LINEAR model over hashed
  // unigram + adjacent-bigram features, averaged fastText-style. Everything
  // here is chosen so the score is BIT-IDENTICAL in Spark and DuckDB:
  //   - the featurizer is integer polynomial arithmetic (len/first/last
  //     char codes) mod 64 — exact on both engines;
  //   - the frozen weights are dyadic rationals k/64, whose shortest
  //     decimal forms ("0.328125") round-trip exactly into doubles;
  //   - the score is a LEFT FOLD in array order on both sides (the tx04
  //     list_reduce mirror), then one add and one divide — identical IEEE
  //     operation order, so thresholding at 0 can never flip a row.
  // A production model would swap the 64-bucket table for a learned 2^20
  // one behind the same columns; the plumbing (broadcast-literal weights,
  // map-only scoring, gate composition) is what this operator pins.
  private[graft] val ClfBuckets = 64
  private[graft] val clfUniW: IndexedSeq[Double] =
    (0 until ClfBuckets).map(k => (((k * 37 + 11) % ClfBuckets) - 32) / 64.0)
  private[graft] val clfBiW: IndexedSeq[Double] =
    (0 until ClfBuckets).map(k => (((k * 53 + 7) % ClfBuckets) - 32) / 64.0)
  private[graft] val ClfBias: Double = 1.0 / 64.0

  /** Word feature hash: (len*31 + code(first)*17 + code(last)*7) mod 64.
    * All terms non-negative, so % agrees across engines. */
  private def clfHash(word: Column): Column =
    (length(word) * 31 + ascii(word) * 17 +
      ascii(word.substr(length(word), lit(1))) * 7) % ClfBuckets
  private def clfHashSql(w: String): String =
    s"(len($w)*31 + ascii($w)*17 + ascii(substr($w, len($w), 1))*7) % $ClfBuckets"

  /** Classifier score over a bound words-array column: bias + (sum of
    * unigram weights + sum of bigram weights) / (2*n_words - 1). */
  private[graft] def clfScoreOf(w: Column): Column = {
    val uniArr = array(clfUniW.map(lit): _*)
    val biArr = array(clfBiW.map(lit): _*)
    val uSum = aggregate(transform(w, x => element_at(uniArr, clfHash(x) + 1)),
      lit(0.0), (a, x) => a + x)
    val bIdx = when(size(w) > 1, sequence(lit(1), size(w) - 1))
      .otherwise(array().cast("array<int>"))
    val bSum = aggregate(
      transform(bIdx, i => element_at(biArr,
        (clfHash(element_at(w, i)) * 131 + clfHash(element_at(w, i + 1)) * 17) % ClfBuckets + 1)),
      lit(0.0), (a, x) => a + x)
    lit(ClfBias) + (uSum + bSum) / (size(w) * 2 - 1)
  }

  /** The classifier's tokenization (shared with the oracle + ingest gate). */
  private[graft] def clfWordsCol: Column = split(lower(trim(col("text"))), "\\s+")

  /** Map-only classifier score of the `text` column ([[StreamingIngest]]'s
    * classifierGate and tx13 share this single definition) — the ClfScore
    * native kernel: one codegen'd pass replacing the clfScoreOf compose's
    * four CodegenFallback HOF lambdas (tokenize once, hash once, both
    * folds share the hash array; bit-identical by construction, ClfChunkSpec
    * pins it against the compose on both eval paths). */
  private[graft] def clfScoreCol: Column =
    graft.spark.ClfExpressions.clfScore(col("text"), clfUniW, clfBiW, ClfBias)

  /** Exact DuckDB replay of [[clfScoreOf]] as CTE sql over `documents`. */
  private[ops] val clfScoreSqlCtes: String = {
    val uni = clfUniW.mkString("([", ", ", "]::DOUBLE[])")
    val bi = clfBiW.mkString("([", ", ", "]::DOUBLE[])")
    s"""t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
              FROM documents),
          s AS (SELECT doc_id, len(w) AS n_words,
              list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(w, x -> $uni[${clfHashSql("x")} + 1])),
                (a, x) -> a + x) AS u,
              list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(range(1, len(w)), i ->
                  $bi[(${clfHashSql("w[i]")}*131 + ${clfHashSql("w[i+1]")}*17) % $ClfBuckets + 1])),
                (a, x) -> a + x) AS b
            FROM t),
          clf AS (SELECT doc_id, n_words,
              CAST($ClfBias AS DOUBLE) + (u + b) / (2*n_words - 1) AS clf_score
            FROM s)"""
  }

  val entries: Seq[Q] = Seq(
    // ---- tx01: language ID by marker-word occurrence score ----
    Q("tx01_langid",
      (s, d) => {
        val p = padded(col("text"))
        val scores = langMarkers.map { case (lg, ms) => lg -> ms.map(occ(p, _)).reduce(_ + _) }
        val pred = predLangCol
        val best = greatest(scores.map(_._2): _*)
        // raw double score, no round(): Spark and DuckDB round() implementations
        // differ at ulp-level .xxx5 boundaries (BigDecimal HALF_UP vs float
        // scale-and-round), while the raw doubles are bit-identical — the
        // driver's comparator normalizes BOTH sides with the same rounding, so
        // raw values can never flip. Same reasoning in tx02/q20/ss*/dd* below.
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), pred.as("pred_lang"), best.as("score"))
          .orderBy(col("doc_id"))
      },
      Some {
        val sc = langMarkers.map { case (lg, ms) =>
          lg -> ms.map(m => occSql(paddedSql, m)).mkString("(", " + ", ")")
        }
        val best = s"greatest(${sc.map(_._2).mkString(", ")})"
        s"""SELECT doc_id, $predLangSql AS pred_lang, $best AS score
            FROM documents ORDER BY doc_id"""
      }),

    // ---- tx02: quality scoring (length/punct/stopword ratios) ----
    Q("tx02_quality",
      (s, d) => {
        val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val punct = (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("bigint")
        val stops = stopwords.map(occ(padded(col("text")), _)).reduce(_ + _)
        val punctRatio = punct.cast("double") / length(col("text"))
        val stopRatio = stops / nWords
        val score = qualityCol
        // raw ratios/score (see tx01 note): engine-side round() flipped one
        // sf0.1 row (quality 0.84025-boundary: Spark .8402, DuckDB .8403)
        Tables.spread(t(s, d, "documents")).select(col("doc_id"),
            nWords.as("n_words"), punct.as("n_punct"),
            punctRatio.as("punct_ratio"),
            stopRatio.as("stop_ratio"),
            score.as("quality"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stopsSql = stopwords.map(m => occSql(paddedSql, m)).mkString(" + ")
        s"""SELECT doc_id,
            len(string_split_regex(trim(text), '\\s+')) AS n_words,
            len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
            (len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g'))::DOUBLE) / len(text) AS punct_ratio,
            ($stopsSql) / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio,
            $qualitySql AS quality
            FROM documents ORDER BY doc_id"""
      }),

    // ---- tx04: document fingerprinting — polynomial rolling hash over words ----
    // h := (h*131 + len(word)*31 + code(first char)) mod 1e9+7 — identical
    // modular arithmetic on both sides, so the oracle is exact. Map-only.
    Q("tx04_fingerprint_hash",
      (s, d) => {
        val words = split(lower(trim(col("text"))), "\\s+")
        val fp = aggregate(words, lit(0L),
          (h, w) => (h * 131 + length(w) * 31 + ascii(w)) % 1000000007L)
        t(s, d, "documents")
          .select(col("doc_id"), fp.as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split_regex(lower(trim(text)), '\s+'),
                w -> CAST(len(w)*31 + ascii(w) AS BIGINT))),
            (h, x) -> (h * 131 + x) % 1000000007) AS fp
          FROM documents ORDER BY doc_id""")),

    // ---- tx03: token counting — whitespace + BPE-ish regex tokens ----
    Q("tx03_tokens",
      (s, d) => {
        val ws = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val re = size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("bigint")
        t(s, d, "documents").select(col("doc_id"),
            ws.as("ws_tokens"), re.as("re_tokens"),
            round(length(col("text")).cast("double") / greatest(re, lit(1L)), 4).as("chars_per_token"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
          len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
          round(len(text)::DOUBLE / greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')), 1), 4) AS chars_per_token
          FROM documents ORDER BY doc_id""")),

    // ---- tx05: vocabulary build — corpus-wide top-50 token frequencies ----
    // The explode -> partial-agg -> TakeOrdered shape: token counts combine
    // map-side before the single shuffle, and the top-k never sorts the full
    // vocabulary (TakeOrderedAndProject) — the word-count plan that holds at
    // any corpus size.
    Q("tx05_vocab",
      (s, d) => t(s, d, "documents")
        .select(explode(vocabTokens).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(50),
      Some(s"""WITH toks AS (SELECT unnest($vocabTokensSql) AS token
            FROM documents)
          SELECT token, count(*) AS cnt FROM toks
          GROUP BY token ORDER BY cnt DESC, token LIMIT 50""")),

    // ---- tx06: tf-idf top terms per document ----
    // Classic relevance weighting: tf(term, doc) * ln(N / df(term)), top-3
    // terms per doc. Shapes: token counts partial-aggregate before one
    // shuffle on (doc, term); document frequency is a second partial agg on
    // the term; the join keys on the term (broadcastable until the
    // vocabulary outgrows the executors, then a plain shuffle join); the
    // final top-k is a window per doc. Raw double scores: both engines
    // compute tf * ln(N/df) from identical integers — ulp-level libm
    // differences are absorbed by the driver's 6dp normalization, and rank
    // flips would need two DISTINCT (tf, df) pairs landing within an ulp.
    Q("tx06_tfidf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val n = Tables.rowCount(s, d, "documents") // driver-side scalar from footer metadata: ZERO jobs
        val toks = docs.select(col("doc_id"), explode(vocabTokens).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.join(df, Seq("term"))
          .select(col("doc_id"), col("term"),
            (col("tf") * log(lit(n.toDouble) / col("df"))).as("score"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($vocabTokensSql) AS term
            FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
          df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          n AS (SELECT count(*) AS n FROM documents),
          scored AS (SELECT doc_id, term,
                       tf * ln(n.n::DOUBLE / df.df) AS score,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY tf * ln(n.n::DOUBLE / df.df) DESC, term) AS rank
                     FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, CAST(rank AS INT) AS rank, term, score
        FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ---- tx07: repetition-based quality signals (Gopher-style) ----
    // Type-token ratio plus top-bigram/trigram fraction — the MassiveText
    // repetition filters adapted to word n-grams (the corpus has no line
    // structure). Shape: ONE tagged explode of 1/2/3-grams, then two
    // partial-aggregated shuffles — (doc,k,gram) counts, then per-doc
    // conditional max/sum — so every mode/total/distinct stat falls out of
    // the same codegen'd agg tree with no join and no window. (A per-row
    // distinct×filter HOF computes the same thing with zero shuffles but is
    // an interpreted O(n²) string scan per doc — measured 16x slower at
    // sf0.1. The n-gram frequency relation is exactly what tf/df builders
    // shuffle anyway, and it partial-aggregates map-side at any scale.)
    // Raw double ratios of exact integers — no round() (see tx01 note).
    Q("tx07_repetition",
      (s, d) => {
        // grams are SPAN HASHES over hashed tokens, not joined strings: the
        // counting stats (distinct counts, mode counts) are hash-invariant
        // modulo 64-bit collisions (~1e-8 at 1M grams — the dd03 set
        // argument; the oracle computes the same counts from strings), the
        // string-gram transform+slice+array_join layer disappears into the
        // fused SpanHashes kernel, and the exploded relation shuffles longs
        // instead of gram strings
        def tagged(wh: Column, k: Int): Column =
          transform(
            if (k == 1) wh else graft.spark.SketchExpressions.spanHashes(wh, k),
            g => struct(lit(k).as("k"), g.as("g")))
        val wh = col("wh")
        def kd(k: Int, c: Column): Column = when(col("k") === k, c)
        Tables.spread(t(s, d, "documents"))
          // explode(array(..)) = Generate barrier: the token array is
          // computed once per row before the gram explode
          .select(col("doc_id"), explode(array(vocabTokens)).as("w"))
          // token hashes in their OWN projection (HOF lambdas get no CSE)
          .select(col("doc_id"), transform(col("w"), t2 => xxhash64(t2)).as("wh"))
          // explode_OUTER: a doc with zero vocab tokens (all digits/punct)
          // must survive as a null-tagged row — the oracle emits it with
          // n_tokens=0, so a plain explode would row-count-mismatch on it
          .select(col("doc_id"),
            explode_outer(concat(tagged(wh, 1), tagged(wh, 2), tagged(wh, 3))).as("t"))
          .groupBy(col("doc_id"), col("t.k").as("k"), col("t.g").as("g"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(
            // coalesce: the null-tag row contributes no k=1 rows, so the sum
            // is NULL for empty-token docs while the oracle's len(w) is 0
            coalesce(sum(kd(1, col("cnt"))), lit(0L)).as("n_tokens"),
            count(kd(1, lit(1))).as("n_distinct"),
            (count(kd(1, lit(1))).cast("double") /
              greatest(sum(kd(1, col("cnt"))), lit(1L))).as("ttr"),
            coalesce(max(kd(2, col("cnt"))).cast("double") /
              sum(kd(2, col("cnt"))), lit(0.0)).as("top_bigram_frac"),
            coalesce(max(kd(3, col("cnt"))).cast("double") /
              sum(kd(3, col("cnt"))), lit(0.0)).as("top_trigram_frac"))
          .orderBy(col("doc_id"))
      },
      Some {
        def gramsSql(k: Int) =
          s"list_transform(range(1, len(w) - ${k - 2}), i -> array_to_string(w[i:i+${k - 1}], ' '))"
        def topFracSql(g: String) =
          s"""CASE WHEN len($g) = 0 THEN 0.0
              ELSE list_max(list_transform(list_distinct($g),
                     x -> len(list_filter($g, y -> y = x))))::DOUBLE / len($g) END"""
        s"""WITH t AS (SELECT doc_id, $vocabTokensSql AS w FROM documents)
          SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            len(list_distinct(w))::DOUBLE / greatest(len(w), 1) AS ttr,
            ${topFracSql(gramsSql(2))} AS top_bigram_frac,
            ${topFracSql(gramsSql(3))} AS top_trigram_frac
          FROM t ORDER BY doc_id"""
      }),

    // ---- tx08: bigram-LM perplexity scoring (CCNet-style quality filter) ----
    // Train an add-one-smoothed bigram model on the 80% hash-split corpus,
    // score EVERY doc by mean negative log-likelihood: docs whose bigrams the
    // corpus has never seen score high — the perplexity-filtering signal
    // language-quality pipelines gate on. Shapes that survive 100 TB: the
    // model is two partial-aggregated count relations keyed by bigram/history
    // (shuffle-joined at scale, broadcast when the vocab is small), the
    // vocabulary size is ONE broadcast row (its distinct count runs as a
    // stage of the same job — no separate up-front corpus pass),
    // and scoring is an equi-join + per-doc aggregate — no window, no
    // cartesian, nothing quadratic. Raw double score (see the tx01 note):
    // identical integer counts → identical IEEE divisions; ln is 1-ulp on
    // both engines and the per-doc sum-order noise (~1e-14 relative) is
    // absorbed by the driver's 6dp normalization — the rj01 precedent.
    Q("tx08_perplexity",
      (s, d) => nllScores(s, d).orderBy(col("doc_id")),
      Some(s"""WITH $nllSqlCtes
        SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
          coalesce(s.n_unseen, 0) AS n_unseen, coalesce(s.nll, 0.0) AS nll
        FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""")),

    // ---- tx10: Gopher-style rule-based quality gate ----
    // The canonical pre-training document filter (Gopher / MassiveText,
    // Rae et al. 2021 §A1.1) as named boolean rules instead of tx02's blended
    // score: word-count bounds, mean-word-length bounds, symbol-to-word
    // ratio, alphabetic-word fraction, and minimum stopword evidence, plus
    // the conjunction (`keep`). Line-based rules (bullet/ellipsis line
    // fractions) are omitted: the fixture is single-line text, so they would
    // be constant-true padding. Every ratio is double division of exact ints
    // (the occ length-of-replace trick), bit-identical across engines.
    // Map-only — no shuffle at any scale.
    Q("tx10_gopher_rules",
      (s, d) => {
        val txt = col("text")
        val nWords = size(split(trim(txt), "\\s+")).cast("bigint")
        val meanWlen = length(regexp_replace(txt, "\\s+", "")).cast("double") / nWords
        // '#' and '...' occurrences per word (the Gopher symbol list)
        val nHash = length(txt) - length(regexp_replace(txt, "#", ""))
        val nEll = (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3
        val symRatio = (nHash + nEll) / nWords
        val alphaFrac = size(filter(split(trim(txt), "\\s+"),
          w => w.rlike("[A-Za-z]"))).cast("double") / nWords
        val stops = stopwords.map(occ(padded(txt), _)).reduce(_ + _)
        val rWords = nWords.between(30L, 10000L)
        val rWlen = meanWlen.between(4.0, 10.0)
        val rSym = symRatio <= 0.1
        val rAlpha = alphaFrac >= 0.8
        val rStop = stops >= 2
        // spread: per-word regex work dominates I/O (sf1 smoke showed one
        // 6.9 s scan task without it — the Tables.spread precondition exactly)
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), rWords.as("r_words"), rWlen.as("r_wlen"),
            rSym.as("r_sym"), rAlpha.as("r_alpha"), rStop.as("r_stop"),
            (rWords && rWlen && rSym && rAlpha && rStop).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stopsSql = stopwords.map(m => occSql(paddedSql, m)).mkString(" + ")
        s"""WITH m AS (SELECT doc_id,
              len(string_split_regex(trim(text), '\\s+')) AS nw,
              len(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE /
                len(string_split_regex(trim(text), '\\s+')) AS mwl,
              ((len(text) - len(replace(text, '#', ''))) +
               (len(text) - len(replace(text, '...', ''))) / 3) /
                len(string_split_regex(trim(text), '\\s+')) AS sym,
              len(list_filter(string_split_regex(trim(text), '\\s+'),
                w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE /
                len(string_split_regex(trim(text), '\\s+')) AS af,
              ($stopsSql) AS stops
            FROM documents),
          r AS (SELECT doc_id,
              nw BETWEEN 30 AND 10000 AS r_words,
              mwl BETWEEN 4.0 AND 10.0 AS r_wlen,
              sym <= 0.1 AS r_sym,
              af >= 0.8 AS r_alpha,
              stops >= 2 AS r_stop
            FROM m)
        SELECT doc_id, r_words, r_wlen, r_sym, r_alpha, r_stop,
          (r_words AND r_wlen AND r_sym AND r_alpha AND r_stop) AS keep
        FROM r ORDER BY doc_id"""
      }),

    // ---- tx09: Zipf/frequency-band corpus profile ----
    // The vocabulary-health report run before training a tokenizer: how many
    // types are hapax (seen once), rare, mid, or head, and what fraction of
    // the total token MASS each band carries (a healthy natural corpus is
    // head-heavy; a synthetic or boilerplate-duplicated one is not). Shapes:
    // token counts partial-aggregate before one shuffle on the token; the
    // band rollup aggregates the VOCABULARY (types, not tokens); the mass
    // fraction is a window over the 4-row band summary — nothing scans the
    // corpus twice, nothing spans it in one task.
    Q("tx09_zipf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = t(s, d, "documents")
          .select(explode(vocabTokens).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        val banded = counts.withColumn("band",
          when(col("cnt") === 1, "1_hapax")
            .when(col("cnt") <= 10, "2_rare")
            .when(col("cnt") <= 100, "3_mid")
            .otherwise("4_head"))
        banded.groupBy(col("band"))
          .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_tokens"))
          .withColumn("mass_frac",
            col("n_tokens") / sum(col("n_tokens")).over(
              Window.partitionBy())) // 4-row summary window, not the corpus
          .orderBy(col("band"))
      },
      Some(s"""WITH toks AS (SELECT unnest($vocabTokensSql) AS token FROM documents),
          c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          b AS (SELECT CASE WHEN cnt = 1 THEN '1_hapax'
                            WHEN cnt <= 10 THEN '2_rare'
                            WHEN cnt <= 100 THEN '3_mid'
                            ELSE '4_head' END AS band, cnt FROM c),
          a AS (SELECT band, count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_tokens
                FROM b GROUP BY band)
        SELECT band, n_types, n_tokens,
          n_tokens::DOUBLE / sum(n_tokens) OVER () AS mass_frac
        FROM a ORDER BY band""")),

    // ---- tx11: bigram model EXPORT — the table tx08 scores against ----
    // tx08 trains a bigram LM internally and emits per-doc scores; tx11
    // exports the MODEL itself: the top-25 bigrams by corpus count with
    // their add-one-smoothed conditional probability P(w2|w1) =
    // (c12+1)/(c1+V) — what a deployment materializes for downstream
    // scorers. Shapes: two partial-agg count relations (bigram, history)
    // joined on the history token; the top-k is TakeOrderedAndProject
    // (never a global sort); ties at the cutoff break on (w1, w2) so the
    // export is deterministic. The probability is a ratio of exact
    // integers — identical IEEE division both engines.
    Q("tx11_bigram_model",
      (s, d) => {
        val w = split(lower(col("text")), " ")
        val pairIdx = slice(sequence(lit(0), greatest(size(col("w")) - 2, lit(0))),
          lit(1), greatest(size(col("w")) - 1, lit(0)))
        val pairs = transform(pairIdx, i => struct(
          get(col("w"), i).as("w1"), get(col("w"), i + 1).as("w2")))
        val base = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), w.as("w"))
          .persist() // read twice: pair counts + the vocab scalar
        val ex = base.select(explode(pairs).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        val vocab = base.select(explode(col("w")).as("word")).distinct().count()
        val c12 = ex.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = ex.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        c12.join(c1, "w1")
          .select(col("w1"), col("w2"), col("c12"), col("c1"),
            ((col("c12") + 1).cast("double") / (col("c1") + vocab)).as("p_smoothed"))
          .orderBy(col("c12").desc, col("w1"), col("w2"))
          .limit(25)
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
          pairs AS (SELECT
                      unnest([w[i] for i in generate_series(1, len(w)-1)]) AS w1,
                      unnest([w[i+1] for i in generate_series(1, len(w)-1)]) AS w2
                    FROM d),
          c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
          c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
          v AS (SELECT count(DISTINCT u.word) AS v
                FROM (SELECT unnest(w) AS word FROM d) u)
        SELECT w1, w2, c12, c1, (c12 + 1)::DOUBLE / (c1 + v.v) AS p_smoothed
        FROM c12 JOIN c1 USING (w1) CROSS JOIN v
        ORDER BY c12 DESC, w1, w2 LIMIT 25""")),

    // ---- tx12: BPE merge training — learn the table bpe_count consumes ----
    // The tokenizer-training step of a data pipeline: one corpus pass to
    // the word-count dictionary, then 8 rounds of (pair-count shuffle over
    // the dictionary, 1-row argmax, map-only replace) — see bpeTrain's
    // scaladoc for the 100 TB shape. The 8-row result materializes on the
    // driver (bounded, the Dsir model precedent).
    Q("tx12_bpe_train",
      (s, d) => {
        import s.implicits._
        bpeTrain(Tables.spread(t(s, d, "documents")).select(col("text")), 8)
          .toDF("rank", "l_code", "r_code", "merged_code", "pair_count", "corpus_tokens")
          .orderBy(col("rank"))
      },
      Some(bpeTrainSql(8))),

    // ---- tx13: frozen hashed linear quality classifier (fastText shape) ----
    // See clfScoreOf above for why the score is bit-identical across
    // engines. Map-only at any scale: the weight table rides the plan as a
    // 64-element literal array (a learned table would be a broadcast), the
    // fold runs inside whole-stage codegen, and nothing shuffles — the
    // exact shape a 100 TB classifier-filter pass needs. `keep` is the
    // admission decision StreamingIngest.classifierGate applies.
    Q("tx13_quality_classifier",
      (s, d) => {
        // n_words needs its own split (the score kernel keeps the word
        // count internal); trim-only — lowercasing can't change whitespace,
        // so the count matches the oracle's lowered split at half the cost
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_words"),
            clfScoreCol.as("clf_score"))
          .select(col("doc_id"), col("n_words"), col("clf_score"),
            when(col("clf_score") >= 0, 1).otherwise(0).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $clfScoreSqlCtes
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, clf_score,
          CASE WHEN clf_score >= 0 THEN 1 ELSE 0 END AS keep
        FROM clf ORDER BY doc_id""")),

    // ---- tx14: subword accounting under a PRODUCTION-WIDTH merge table ----
    // The round-14 heap merger (BpeExpressions.mergeHeap — open-addressed
    // rank table, linked symbol list, lazy-deletion heap) never executed in
    // a driver-gated query: every other BPE row runs the 28-rank shipped
    // table, below the dispatch threshold. This row counts the corpus under
    // the 80-rank BpeMergesWide (useHeap = true, guarded at class init), so
    // the production-vocabulary path has a green DuckDB row: the oracle's
    // rank-ordered replace() chain is width-agnostic and exact, and a heap
    // bug (wrong pop order, stale heap entry, bad placeholder resolution)
    // hash-mismatches the per-source sums. Per-doc counts also ride along
    // aggregated per source x a length bucket so single-doc divergences
    // can't cancel in one big sum. Same scale shape as tx03: one map-only
    // pass (the kernel is per-row inside whole-stage codegen; the table is
    // one plan-referenced object) into a partial-agg shuffle on source.
    Q("tx14_bpe_wide",
      (s, d) => {
        Tables.spread(t(s, d, "documents"))
          .select(col("source"), bpeWideTokensCol.as("bt"),
            (length(col("text")) % 7).cast("bigint").as("lb"))
          .groupBy(col("source"), col("lb"))
          .agg(sum(col("bt")).as("btokens"), count(lit(1)).as("n_docs"))
          .orderBy(col("source"), col("lb"))
      },
      Some(s"""SELECT source, length(text) % 7 AS lb,
          CAST(sum($bpeWideTokensSql) AS BIGINT) AS btokens,
          count(*) AS n_docs
        FROM documents GROUP BY source, lb ORDER BY source, lb""")),

    // ---- pp01: composite training-data filter — quality gate + language ----
    // ---- gate + exact dedup, the end-to-end corpus-cleaning pipeline ----
    // Reuses tx01's language argmax and tx02's quality score verbatim (shared
    // column builders above), then keeps the lowest doc_id per normalized-text
    // fingerprint. All map-only until one window shuffle on the fingerprint.
    Q("pp01_clean_corpus",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), col("text"), nWords.as("n_words"),
            qualityCol.as("quality"), predLangCol.as("pred_lang"))
          .filter(col("quality") >= 0.5 && col("pred_lang") === "en")
          .withColumn("fp", md5(lower(trim(col("text")))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("n_words"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH q AS (SELECT doc_id, text,
              len(string_split_regex(trim(text), '\\s+')) AS n_words,
              $qualitySql AS quality, $predLangSql AS pred_lang
            FROM documents),
          f AS (SELECT doc_id, n_words, quality, md5(lower(trim(text))) AS fp
                FROM q WHERE quality >= 0.5 AND pred_lang = 'en'),
          k AS (SELECT doc_id, n_words, quality,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
        SELECT doc_id, n_words, quality FROM k WHERE rn = 1 ORDER BY doc_id""")),

    // ---- pp02: per-source attrition report — where the corpus goes ----
    // The observability query every production corpus build runs beside
    // pp01's filter: per source, how many docs survive each pipeline stage
    // (raw -> quality gate -> language gate -> dedup keep-first) and how
    // many tokens the survivors carry — the table that decides which feed
    // is worth its crawl budget. Stages are FLAGS on one map-only pass
    // (same shared quality/langid builders as tx01/tx02/pp01, so the
    // stages provably match the filter pipeline); dedup rank orders
    // survivors-first inside each fingerprint partition so the window
    // never concentrates filtered-out rows into a null mega-partition;
    // then ONE partial-agg shuffle on source. Conditional aggregation
    // keeps every stage count in a single pass — no per-stage scans.
    Q("pp02_attrition_report",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val w = Window.partitionBy(col("fp"))
          .orderBy(col("en_ok").desc, col("doc_id"))
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), col("source"), nWords.as("n_words"),
            qualityCol.as("quality"), predLangCol.as("pred_lang"),
            md5(lower(trim(col("text")))).as("fp"))
          .withColumn("q_ok", col("quality") >= 0.5)
          .withColumn("en_ok", col("q_ok") && col("pred_lang") === "en")
          .withColumn("uniq", col("en_ok") && row_number().over(w) === 1)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_raw"),
            count_if(col("q_ok")).as("n_quality"),
            count_if(col("en_ok")).as("n_en"),
            count_if(col("uniq")).as("n_unique"),
            sum(when(col("uniq"), col("n_words")).otherwise(0L)).as("tokens_unique"))
          .orderBy(col("source"))
      },
      Some(s"""WITH q AS (SELECT doc_id, source,
              len(string_split_regex(trim(text), '\\s+')) AS n_words,
              $qualitySql AS quality, $predLangSql AS pred_lang,
              md5(lower(trim(text))) AS fp
            FROM documents),
          f AS (SELECT *, quality >= 0.5 AS q_ok,
                  (quality >= 0.5 AND pred_lang = 'en') AS en_ok FROM q),
          r AS (SELECT *, en_ok AND row_number() OVER (PARTITION BY fp
                  ORDER BY en_ok DESC, doc_id) = 1 AS uniq FROM f)
        SELECT source, count(*) AS n_raw,
          count(*) FILTER (q_ok) AS n_quality,
          count(*) FILTER (en_ok) AS n_en,
          count(*) FILTER (uniq) AS n_unique,
          CAST(coalesce(sum(CASE WHEN uniq THEN n_words ELSE 0 END), 0) AS BIGINT)
            AS tokens_unique
        FROM r GROUP BY source ORDER BY source""")),

    // ---- pp03: shard manifest for the CLEANED corpus — pp01 x sp03 ----
    // The end-to-end materialization a production build actually ships:
    // pp01's survivor set (quality gate -> language gate -> exact-dedup
    // keep-first; the SAME shared builders, so survivorship provably matches
    // the filter pipeline) packed into 4096-token shards in doc_id order via
    // sp03's two-level prefix sum — per-block running totals in parallel,
    // one ordered window over the ≈parallelism-row block summary, never the
    // corpus (the documented bounded-summary window class). Output is the
    // shard manifest (doc/token counts + id range per shard) — the artifact
    // a training job's data loader consumes. Block keys come from the RAW
    // doc_id (block size from the raw count — no extra count() action over
    // the filtered lineage); blocks just carry fewer survivors, the prefix
    // sum is indifferent.
    Q("pp03_shard_manifest",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
        val blockSize = Sampling.blockSizeFor(Tables.rowCount(s, d, "documents"), s.sparkContext.defaultParallelism)
        val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val surv = docs
          .select(col("doc_id"), col("text"), nWords.as("tokens"),
            qualityCol.as("quality"), predLangCol.as("pred_lang"))
          .filter(col("quality") >= 0.5 && col("pred_lang") === "en")
          .withColumn("fp", md5(lower(trim(col("text")))))
          .withColumn("rn", row_number().over(wFp))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("tokens"),
            (col("doc_id") / blockSize).cast("bigint").as("blk"))
        val wBlk = Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = surv.groupBy(col("blk"))
          .agg(sum(col("tokens")).as("blk_sum"))
          .withColumn("blk_off", sum(col("blk_sum")).over(wBlk) - col("blk_sum"))
          .select(col("blk"), col("blk_off"))
        val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        surv.join(broadcast(offsets), Seq("blk"))
          .withColumn("cum_end", col("blk_off") + sum(col("tokens")).over(wIn))
          .withColumn("shard",
            ((col("cum_end") - col("tokens")) / Sampling.ShardTokens).cast("bigint"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"))
      },
      Some(s"""WITH q AS (SELECT doc_id, text,
              len(string_split_regex(trim(text), '\\s+')) AS tokens,
              $qualitySql AS quality, $predLangSql AS pred_lang
            FROM documents),
          f AS (SELECT doc_id, tokens, md5(lower(trim(text))) AS fp
                FROM q WHERE quality >= 0.5 AND pred_lang = 'en'),
          k AS (SELECT doc_id, tokens,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f),
          c AS (SELECT doc_id, tokens,
                  sum(tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
                FROM k WHERE rn = 1),
          a AS (SELECT doc_id, tokens,
                  CAST((cum_end - tokens) // 4096 AS BIGINT) AS shard
                FROM c)
        SELECT shard, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS sum_tokens,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM a GROUP BY shard ORDER BY shard"""))
  )
}
