package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact (hash group-by),
  * normalized fingerprint, exact n-gram Jaccard (blocked pair join), MinHash+LSH
  * near-dup with exact verification, and SimHash near-dup.
  *
  * Scale notes (100 TB design):
  *  - exact/fingerprint dedup is one partial-aggregated shuffle on a hash key;
  *  - pairwise Jaccard NEVER does an unblocked cross join — candidate pairs come
  *    from equality joins on shingle hashes or LSH buckets, and every blocking
  *    key is document-frequency capped ([[DfCap]]/[[BlockCap]]) so a hot key
  *    (stopword shingle, all-zero SimHash chunk) cannot produce a k² pair
  *    explosion no matter the corpus;
  *  - shingles are combined word *hashes*, never materialized strings — the
  *    string form (1M UTF8 concat allocations at sf0.1) dominated the profile;
  *  - MinHash/SimHash signatures are computed per row by fused native
  *    codegen'd kernels (graft.spark.SketchExpressions) — one JIT'd pass over
  *    the hash array per doc, no signature shuffle at all: the sketch is a
  *    narrow map, which is the shape that survives a 1000-executor scale-up.
  */
object Dedup {
  import Tables.t

  /** Normalized text: lowercase, whitespace collapsed, trimmed. */
  private def norm(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** xxhash64 per word occurrence (order preserved, duplicates kept) —
    * the fused [[graft.spark.WordHashes]] kernel (the transform compose
    * paid one interpreted lambda step per word). */
  private def wordHashes(text: Column): Column =
    graft.spark.SketchExpressions.wordHashes(text)

  /** The former compose, kept as the kernel's reference semantics. */
  private[graft] def wordHashesCompose(text: Column): Column =
    transform(split(lower(text), " "), w => xxhash64(w))

  /** Distinct 3-word shingle hashes: consecutive word hashes combined with
    * xxhash64. Equivalent as a *set* to hashing the concatenated shingle
    * strings (injective modulo 64-bit collisions, ~1e-8 at 1M shingles) but
    * never allocates the strings. Docs with fewer than 3 words get an EMPTY
    * set by construction — without the guard, xxhash64 would silently skip
    * the null out-of-bounds word hashes and emit a degenerate shingle that
    * the oracles' NULL-trigram concat drops, so the two engines would
    * disagree on any sub-trigram doc. */
  private[graft] def shingleHashes(text: Column): Column =
    graft.spark.SketchExpressions.shingleHashes(text)

  /** The former two-layer HOF compose, kept as the fused kernel's reference
    * semantics (SketchExpressionsSpec pins bit-equality on adversarial
    * texts — multi-space runs, sub-trigram docs, duplicate shingles). */
  private[graft] def shingleHashesCompose(text: Column): Column =
    shinglesFromWh(wordHashes(text))

  /** K-gram span hashes with MULTIPLICITY (unlike [[shinglesFromWh]]'s set):
    * dd13's report counts every window. Same unconditional zero-length-slice
    * guard for sub-K docs; callers materialize the word-hash array in its
    * own projection first (HOF lambdas get no common-subexpression
    * elimination — the withShingles lesson). Factored for the property spec
    * that pins the window arithmetic against string grams. */
  private[graft] def spansFromWh(wh: Column, k: Int): Column =
    graft.spark.SketchExpressions.spanHashes(wh, k)

  /** The former compose, kept as the kernel's reference semantics. */
  private[graft] def spansFromWhCompose(wh: Column, k: Int): Column = {
    val idx = slice(sequence(lit(0), greatest(size(wh) - k, lit(0))),
      lit(1), greatest(size(wh) - (k - 1), lit(0)))
    transform(idx, i => xxhash64((0 until k).map(o => get(wh, i + o)): _*))
  }

  /** Word-hash column for [[spansFromWh]] callers outside this object. */
  private[graft] def wordHashCol(text: Column): Column = wordHashes(text)

  /** Window length of the DECONTAMINATION criterion (dc03 and
    * StreamingIngest.decontaminationGate): contaminated = sharing an
    * 8-token window with the benchmark suite — dd08's span length, the
    * Lee-et-al./PaLM-style substring test. Deliberately NOT dc01's 3-gram
    * statistic: ANY-3-gram overlap is an audit SIGNAL, but as a DROP
    * criterion it approaches total corpus kill on templated text
    * (measured on the fixture: 4739 of 4739 sf0.1 training docs share
    * some trigram with the 5% eval split — a gate on it keeps 0 docs —
    * while the 8-token window marks 16, and real leakage IS a long shared
    * span, not one common phrase). */
  private[graft] val DeconSpanK = 8

  /** Shingle hashes from a word-hash ARRAY column/expression. The guard is a
    * zero-length slice, NOT a when() branch: conditional branches block
    * codegen subexpression elimination, so a when() here re-evaluated the
    * whole word-hash transform per reference (measured 4-5x on dd04/dc01);
    * slice(seq, 1, 0) = [] keeps everything unconditional. n>=3 -> indices
    * 0..n-3 (all n-2 kept); n<3 -> length greatest(n-2,0)=0 -> empty set. */
  private def shinglesFromWh(wh: Column): Column = {
    val idx = slice(sequence(lit(0), greatest(size(wh) - 3, lit(0))),
      lit(1), greatest(size(wh) - 2, lit(0)))
    array_distinct(
      transform(idx, i => xxhash64(get(wh, i), get(wh, i + 1), get(wh, i + 2))))
  }

  /** Select `keep` plus the shingle set of `text` as `out`, materializing the
    * word-hash array in its OWN projection first. HOF lambdas are
    * CodegenFallback with no common-subexpression elimination, so the inline
    * form re-evaluates split+lower+hash-per-word on every element access
    * inside the shingle lambda — ~O(words²) per doc with full-split
    * constants. The sf1 smoke caught it: dc01's cache build ran 133 s in one
    * task inline vs ~2 s with the two-step projection. CollapseProject keeps
    * the intermediate step (the alias is expensive and multiply-referenced),
    * making every get() an O(1) attribute read. */
  private def withShingles(df: DataFrame, out: String, keep: Column*): DataFrame =
    // one fused kernel expression now — the two-step wh projection was the
    // HOF-CSE workaround and is obsolete on this path (spansFromWh callers
    // still need it: their per-K transform reads the wh array repeatedly)
    df.select(keep :+ graft.spark.SketchExpressions.shingleHashes(col("text")).as(out): _*)

  /** Document-frequency cap for shingle blocking keys (dd03): a shingle shared
    * by more than this many documents is dropped from both sides of the
    * Jaccard (set definition AND candidate join), bounding any blocking bucket
    * to DfCap docs — the k² hot-shingle blowup becomes O(DfCap²) worst case.
    * Mirrored exactly in the DuckDB oracle. Never binds on the test corpora
    * (max df there is single digits); at 100 TB it is the difference between a
    * bounded shuffle and a stuck stage. */
  private val DfCap = 256

  /** Max documents per SimHash chunk block (dd05) — same role as DfCap:
    * a ubiquitous 16-bit chunk value (e.g. all-zero for short docs) would
    * otherwise quadratically explode its bucket. Pairs whose only shared chunk
    * is capped are missed — acceptable for an approximate-by-construction
    * sketch, and the cap never binds at test scale. */
  private val BlockCap = 1024

  /** Free the storage blocks behind a `localCheckpoint`ed DataFrame. Its
    * persisted RDD lives under the plan's LogicalRDD leaf, NOT in the cache
    * manager, so `df.unpersist()` would be a no-op. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }

  // 64 deterministic affine permutations for MinHash: h_i(x) = (a_i*x + b_i) & MASK.
  // The wrap-around 64-bit arithmetic lives inside the native MinHashSignature
  // kernel (Java long ops wrap; session-independent — no ansi conf mutation).
  private[graft] val P = 64
  private[graft] val Mask = (1L << 61) - 1
  private[graft] val permA: Array[Long] = Array.tabulate(P)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
  private[graft] val permB: Array[Long] = Array.tabulate(P)(i => 6364136223846793005L * (i + 7) + 1442695040888963407L)

  /** Per-row MinHash signature over a shingle-hash array: for each of the 64
    * permutations, the min of (a_i*h + b_i) & MASK across the doc's shingles.
    * A narrow map (no shuffle), now a single fused codegen'd expression
    * (graft.spark.MinHashSignature): one pass over the shingles with the
    * 64-permutation loop in JIT'd code. Bit-identical to the nested-HOF
    * running-min form it replaced (Java long arithmetic wraps exactly like
    * the EvalMode.LEGACY nodes; pinned by SketchExpressionsSpec), so the
    * DuckDB oracle that replays the permutations in SQL is unaffected. The
    * HOF history, for the record: transform+array_min ~4x slower than the
    * running-min aggregate; 64-wide explode+agg-tree ~7-25 s one-time
    * codegen; the aggregate form itself paid 64·n interpreted lambda steps
    * per doc — the native kernel removes that class entirely. */
  private def minhashSig(sh: Column): Column =
    graft.spark.SketchExpressions.minhashSig(sh, permA.toIndexedSeq, permB.toIndexedSeq, Mask)

  /** dd04's banding: 16 bands × 4 rows over the 64-component signature.
    * ONE definition shared by the batch LSH ([[verifiedPairsFrom]], dd12),
    * the streaming bucket processor
    * ([[graft.streaming.StreamingNearDup]]), and the ingest twin's stored
    * band log ([[Ingest]]) — the band KEY is the contract between all
    * three surfaces, so they must not be free to drift. */
  private[graft] val Bands = 16
  private[graft] val BandWidth = 4

  /** The band keys of a signature as an array<long> column (index = band). */
  private[graft] def bandKeysCol(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      bnd => xxhash64(slice(sig, bnd * BandWidth + 1, lit(BandWidth))))

  /** dd04's pipeline: banded-LSH candidates verified against exact
    * shingle-set Jaccard (no false positives; recall evidence in
    * DedupRecallSpec). Shared by dd04 and the dd06 clustering pass. */
  private def verifiedPairs(s: SparkSession, d: String): DataFrame = {
    val base = withShingles(Tables.spread(t(s, d, "documents")), "sh", col("doc_id"))
      .withColumn("n", size(col("sh")))
      .persist() // read three times: signatures + both sides of verification
    verifiedPairsFrom(base)
  }

  /** The banded-LSH + exact-verify machinery over an arbitrary
    * `(doc_id, sh, n)` relation — factored out of [[verifiedPairs]] so
    * pp04's pipeline stage runs the IDENTICAL builder over its survivor
    * subset (banding is per-doc deterministic, so any true pair found over
    * the full corpus is also found over any subset containing both ends —
    * the subset can only LOSE hot-bucket caps, never candidates). The
    * caller persists `base`: it is read three times (signature pass + both
    * sides of the verification join). */
  private[ops] def verifiedPairsFrom(base: DataFrame): DataFrame = {
    // sig materialized in its own projection: HOF lambdas get no common-
    // subexpression elimination, so slicing minhashSig(...) inside the band
    // lambda would recompute the signature 16x per row
    // persisted: read three times (hot-bucket census + both sides of the
    // candidate self-join); without it each reference re-runs the MinHash
    // kernel over every shingle array — the dominant per-row cost. The
    // relation is narrow (doc_id, band, bkey) — 16 rows/doc of 3 longs.
    val bands = base
      .select(col("doc_id"), minhashSig(col("sh")).as("sig"))
      .select(col("doc_id"), posexplode(bandKeysCol(col("sig")))
        .as(Seq("band", "bkey")))
      .persist()
    // frequency-cap the band buckets (the dd03 DfCap / dd05 BlockCap pattern):
    // k near-identical docs share all 16 band keys, so an uncapped bucket is
    // k²/2 candidate pairs in ONE join bucket — the mass-duplicate corpus
    // failure mode. With the cap, worst-case candidates per (band, bkey) are
    // BlockCap²/2 and total candidates ≤ 16 · #buckets · BlockCap²/2 — bounded
    // regardless of duplication skew. Pairs living only in capped buckets are
    // missed, which is sound for an approximate-recall sketch (and the right
    // operational answer is exact-dedup-first so no bucket holds >1024 copies);
    // the cap never binds on the test corpora (max bucket occupancy is single
    // digits), so the exact all-pairs oracle is unaffected — DedupRecallSpec
    // pins both zero false negatives and the never-binds claim.
    val hotBands = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bc"))
      .filter(col("bc") > BlockCap).select(col("band"), col("bkey"))
    val keptBands = bands.join(hotBands, Seq("band", "bkey"), "left_anti")
    val cand = keptBands.as("x").join(keptBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    // raw jaccard, threshold on the raw value: both engines compute the same
    // single division on identical integer counts (bit-identical doubles), so
    // a raw >= 0.3 test can never disagree — an engine-side round() before the
    // threshold could (Spark and DuckDB round differently at ulp boundaries)
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("n").as("n_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
  }

  /** Near-dup connected components over [[verifiedPairs]] — iterative
    * label propagation with pointer jumping. Returns one `(doc_id, cluster)`
    * row per doc that appears in at least one verified pair; cluster = the
    * component's smallest doc_id. Factored out so dd06 (the raw cluster
    * dump) and dd14 (quality-aware canonical selection) share one
    * implementation. */
  private def dupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = verifiedPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    var prevCheckpoint: DataFrame = labels // released once round 0's next is materialized
    while (!converged && iter < 25) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("cluster").as("nc")), "doc_b")
        .groupBy(col("doc_a")).agg(min(col("nc")).as("nmin"))
        .select(col("doc_a").as("doc_id"), col("nmin"))
      // checkpointed BEFORE the self-join below: both join sides read the
      // materialized blocks, so the edges-join-labels aggregation runs
      // once per round, not twice
      val stepped = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("c1"))
        .localCheckpoint()
      // pointer jumping: follow the new label one hop (labels are doc_ids,
      // so c1 always resolves in the same relation)
      val next = stepped
        .join(stepped.select(col("doc_id").as("jid"), col("c1").as("jc")),
          col("c1") === col("jid"), "left")
        .select(col("doc_id"),
          least(col("c1"), coalesce(col("jc"), col("c1"))).as("cluster"),
          (least(col("c1"), coalesce(col("jc"), col("c1"))) =!= col("prev")).as("changed"))
        .localCheckpoint()
      converged = !next
        .agg(coalesce(max(col("changed")), lit(false))).first().getBoolean(0)
      // release this round's intermediate and the previous round's labels:
      // localCheckpoint blocks bypass the cache manager, so without an
      // explicit unpersist up to 25 generations of label RDDs would sit in
      // executor storage until the driver's ContextCleaner happens to GC
      // them (evicting deliberately-cached datasets at scale)
      releaseCheckpoint(stepped)
      releaseCheckpoint(prevCheckpoint)
      prevCheckpoint = next
      labels = next.select(col("doc_id"), col("cluster"))
      iter += 1
    }
    // the returned plan reads only the LAST round's blocks — edges can go
    releaseCheckpoint(edges)
    labels
  }

  val entries: Seq[Q] = Seq(
    // ---- dd01: exact dedup — keep min doc_id per identical text ----
    Q("dd01_dedup_exact",
      (s, d) => t(s, d, "documents").groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
        .select(col("doc_id"), col("dup_count"))
        .orderBy(col("doc_id")),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        FROM documents GROUP BY text ORDER BY doc_id""")),

    // ---- dd02: normalized md5 fingerprint + canonical dup_of via window ----
    Q("dd02_fingerprint",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        t(s, d, "documents")
          .select(col("doc_id"), md5(norm(col("text"))).as("fp"))
          .withColumn("dup_of", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        min(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS dup_of
        FROM documents ORDER BY doc_id""")),

    // ---- dd03: exact 3-gram Jaccard near-dup pairs, blocked on (source, len/100) ----
    // Scale shape: instead of a quadratic blocked cross join with per-pair
    // array intersects, explode distinct shingle hashes and equi-join on the
    // shingle — only pairs sharing at least one shingle are ever materialized
    // (a pair with jaccard >= 0.3 necessarily shares one), then
    // |A∩B| = count per pair and |A∪B| = |A|+|B|-|A∩B|. Shingles with document
    // frequency above DfCap are excluded from the sets on BOTH sides (engine
    // and oracle), so no join bucket exceeds DfCap docs.
    Q("dd03_ngram_jaccard",
      (s, d) => {
        // cache the COMPACT per-doc array form (5k rows at sf0.1), not the
        // exploded 1M-row relation: columnar cache materialization of the
        // exploded form cost ~3.7 s; re-exploding from cached arrays per
        // consumer is native and cheap (measured ~1.5 s faster end-to-end)
        val base = withShingles(Tables.spread(t(s, d, "documents")), "sh",
            col("doc_id"), col("source"), floor(col("n_chars") / 100).as("lb"))
          .withColumn("nt", size(col("sh")))
          .persist()
        val ex = base.select(col("doc_id"), col("source"), col("lb"), col("nt"),
          explode(col("sh")).as("h"))
        // drop over-cap shingles with a broadcast anti-join against the hot
        // set — bounded by construction (|hot| <= shingle instances / DfCap),
        // so no fat equi-join on the full relation. The kept-set size per doc
        // is nt (carried from the pre-explode row, no extra shuffle) minus the
        // doc's hot-shingle count (a near-empty relation joined onto the few
        // result pairs). hot/hotCnt are persisted: they are tiny but their
        // lineage is the full df aggregation, and they are read 2x each.
        val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") > DfCap).select(col("h"))
          .persist()
        val hotCnt = ex.join(broadcast(hot), Seq("h"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("hc"))
          .persist()
        val kept = ex.join(broadcast(hot), Seq("h"), "left_anti")
        val a = kept.select(col("doc_id").as("doc_a"), col("source"), col("lb"),
          col("nt").as("nt_a"), col("h"))
        val b = kept.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
          col("lb").as("lb_b"), col("nt").as("nt_b"), col("h").as("h_b"))
        val common = a.join(b,
            col("h") === col("h_b") && col("source") === col("source_b") &&
            col("lb") === col("lb_b") && col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"), col("nt_a"), col("nt_b"))
          .agg(count(lit(1)).cast("double").as("inter"))
          .join(hotCnt.select(col("doc_id").as("doc_a"), col("hc").as("hc_a")), Seq("doc_a"), "left")
          .join(hotCnt.select(col("doc_id").as("doc_b"), col("hc").as("hc_b")), Seq("doc_b"), "left")
        val nA = col("nt_a") - coalesce(col("hc_a"), lit(0L))
        val nB = col("nt_b") - coalesce(col("hc_b"), lit(0L))
        val j = col("inter") / (nA + nB - col("inter"))
        // raw jaccard + raw threshold (see verifiedPairs note)
        common
          .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH b AS (
          SELECT doc_id, source, n_chars//100 AS lb,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in generate_series(1, len(w)-2)]) AS sh
          FROM (SELECT doc_id, source, n_chars, string_split(lower(text), ' ') AS w FROM documents)),
        u AS (SELECT doc_id, source, lb, unnest(sh) AS sv FROM b),
        dfq AS (SELECT sv FROM u GROUP BY sv HAVING count(*) <= 256),
        k AS (SELECT doc_id, source, lb, list(sv) AS sh, count(*) AS n
              FROM u JOIN dfq USING (sv) GROUP BY doc_id, source, lb)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_intersect(a.sh, b.sh))::DOUBLE /
              (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jaccard
          FROM k a JOIN k b ON a.source = b.source AND a.lb = b.lb AND a.doc_id < b.doc_id)
        WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""")),

    // ---- dd04: MinHash + LSH (16 bands x 4 rows) candidates, verified with exact Jaccard ----
    // Candidate pairs come from banded-signature equality (never all pairs);
    // each candidate is then verified against the exact shingle-set Jaccard, so
    // the output contains no false positives — the LSH step only bounds which
    // pairs are *considered*. See DedupRecallSpec for the recall evidence that
    // backs the exact oracle.
    Q("dd04_minhash_lsh",
      (s, d) => verifiedPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      // Exact oracle: every >= 0.3 pair. Sound because verification removes all
      // false positives, and recall is 100% on the (fixed, deterministic) test
      // corpora: every true pair there has jaccard >= 0.8, where the banded-LSH
      // miss probability is (1-j^4)^16 ~ 2e-4 per pair — and the outcome is not
      // a per-run draw (hashes and data are fixed), so DedupRecallSpec pins
      // zero false negatives once and for all at sf0.01/sf0.1.
      Some("""WITH b AS (
          SELECT doc_id,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in generate_series(1, len(w)-2)]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
        k AS (SELECT doc_id, sh, len(sh) AS n FROM b)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_intersect(a.sh, b.sh))::DOUBLE /
              (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jaccard
          FROM k a JOIN k b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""")),

    // ---- dd06: near-dup clustering — connected components over the verified ----
    // ---- pairs, cluster id = min doc_id in the component ----
    // The pipeline step after pair detection: pick one representative per
    // dup cluster. Min-label propagation with pointer jumping:
    //  - each round every node takes the min of its own label and its
    //    neighbors' labels, then compresses one pointer hop
    //    (label := label(label)), so convergence is O(log diameter) rounds,
    //    not O(diameter);
    //  - edges and per-round labels are localCheckpoint'ed — persist() alone
    //    does NOT truncate the logical plan, so without the checkpoint every
    //    round re-analyzes (and AQE re-plans) the entire upstream LSH
    //    pipeline, and driver-side planning dominates the runtime (this was
    //    the 88 s pathology in BENCH_r03; on a real cluster use
    //    checkpoint/localCheckpoint the same way);
    //  - the convergence flag is computed in the SAME materialization as the
    //    new labels (a `changed` column aggregated from the checkpointed
    //    rows), not a second join+count job per round.
    Q("dd06_dup_clusters",
      (s, d) => dupClusters(s, d).orderBy(col("doc_id")),
      // transitive closure via recursive CTE over the same >= 0.3 pairs
      Some("""WITH RECURSIVE b AS (
          SELECT doc_id,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in generate_series(1, len(w)-2)]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
        k AS (SELECT doc_id, sh, len(sh) AS n FROM b),
        pairs AS (
          SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_intersect(a.sh, b.sh))::DOUBLE /
                (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jacc
            FROM k a JOIN k b ON a.doc_id < b.doc_id)
          WHERE jacc >= 0.3),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (SELECT u, v FROM edges
                        UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        SELECT u AS doc_id, least(u, min(v)) AS cluster
        FROM reach GROUP BY u ORDER BY doc_id""")),

    // ---- dd05: SimHash (32-bit over md5 word hashes), hamming<=3 within ----
    // ---- 8-bit chunk blocks — EXACT oracle ----
    // Word hashes are the first 32 bits of md5 (not xxhash64) precisely so
    // DuckDB can reproduce them — that upgrades dd05 from a rows-only check
    // to an exact oracle. The chunk blocking is LOSSLESS here by pigeonhole:
    // hamming <= 3 bit differences across 4 chunks forces at least one chunk
    // equal, so the blocked join finds every qualifying pair (the BlockCap
    // frequency cap is mirrored in the oracle and never binds at test scale).
    // Scale shape: word hashes once per row, each SimHash bit a per-row
    // sign-sum (narrow map, no shuffle, no wide agg tree); pairing joins on
    // (chunk index, chunk value); hamming is one xor + bit_count.
    Q("dd05_simhash",
      (s, d) => {
        val wh = transform(split(lower(col("text")), " "), w =>
          conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
        // fused codegen'd sign-sum kernel (graft.spark.SimHash32): one pass
        // over the word hashes instead of 32 interpreted-HOF folds;
        // bit-identical to the nested-aggregate form (SketchExpressionsSpec)
        val sim = graft.spark.SketchExpressions.simhash32(col("wh"))
        val base = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), wh.as("wh"))
          .select(col("doc_id"), sim.as("sim"))
          .withColumn("chunks", transform(sequence(lit(0), lit(3)), c =>
            call_function("shiftright", col("sim"), c * 8).bitwiseAND(255)))
          .cache()
        val blocked = base.select(col("doc_id"), col("sim"),
          posexplode(col("chunks")).as(Seq("ci", "cv")))
        // frequency-cap the chunk blocks (see BlockCap) — anti-join against the
        // near-empty hot set, broadcast by AQE
        val hotBlocks = blocked.groupBy(col("ci"), col("cv")).agg(count(lit(1)).as("bc"))
          .filter(col("bc") > BlockCap).select(col("ci"), col("cv"))
        val keptBlocks = blocked.join(hotBlocks, Seq("ci", "cv"), "left_anti")
        val ham = bit_count(col("x.sim").bitwiseXOR(col("y.sim")))
        keptBlocks.as("x").join(keptBlocks.as("y"),
            col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), ham.as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH wh AS (
          SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h
          FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)),
        bits AS (SELECT doc_id, i,
            CASE WHEN sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) >= 0
                 THEN (1::BIGINT << i) ELSE 0 END AS bv
          FROM wh, generate_series(0, 31) AS t(i) GROUP BY doc_id, i),
        sim AS (SELECT doc_id, sum(bv)::BIGINT AS s FROM bits GROUP BY doc_id),
        ch AS (SELECT doc_id, s, c, (s >> (8*c)) & 255 AS cv
               FROM sim, generate_series(0, 3) AS t(c)),
        hot AS (SELECT c, cv FROM ch GROUP BY c, cv HAVING count(*) > 1024),
        kept AS (SELECT ch.* FROM ch ANTI JOIN hot USING (c, cv))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          bit_count(xor(a.s, b.s)) AS hamming
        FROM kept a JOIN kept b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= 3
        ORDER BY doc_a, doc_b""")),

    // ---- dd07: incremental dedup — a new batch against an existing corpus ----
    // The production shape dd01 becomes once a reference set exists: the
    // daily increment (deterministic 20% hash split standing in for "new")
    // anti-joins the corpus's DISTINCT normalized fingerprints. At 100 TB the
    // corpus side is a precomputed compact fingerprint table; the join is one
    // shuffle on the fingerprint (or a broadcast when the increment is the
    // small side). Reported per source so drop rates are monitorable.
    Q("dd07_incremental",
      (s, d) => {
        val f = t(s, d, "documents").select(col("doc_id"), col("source"),
          md5(norm(col("text"))).as("fp"), Sampling.hashBucket(col("doc_id")).as("bk"))
        val corpusFp = f.filter(col("bk") < 80).select(col("fp")).distinct()
          .withColumn("hit", lit(1))
        f.filter(col("bk") >= 80)
          .join(corpusFp, Seq("fp"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_batch"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
          .orderBy(col("source"))
      },
      Some(s"""WITH f AS (SELECT doc_id, source,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              ${Sampling.hashBucketSql("doc_id")} AS bk
            FROM documents),
          c AS (SELECT DISTINCT fp FROM f WHERE bk < 80),
          -- LEFT JOIN, not IN/NOT IN: a NULL fp must count as kept (no match),
          -- mirroring the engine's null-tolerant left join — NOT IN would
          -- NULL-poison every row the moment one corpus fingerprint is NULL
          j AS (SELECT b.source, CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END AS kept
                FROM (SELECT source, fp FROM f WHERE bk >= 80) b
                LEFT JOIN c ON b.fp = c.fp)
        SELECT source, count(*) AS n_batch,
          CAST(sum(kept) AS BIGINT) AS n_kept,
          CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
        FROM j GROUP BY source ORDER BY source""")),

    // ---- bf01: Bloom-prefiltered incremental dedup — dd07's semantics ----
    // ---- through the broadcast-sketch plan that wins at 100 TB        ----
    // dd07 shuffles the WHOLE increment into the fingerprint join. Here the
    // corpus reduces to a ~1%-fpp Bloom sketch (driver-side aggregate,
    // broadcast as a literal); a map-only might_contain probe drops every
    // increment row the sketch can rule out BEFORE any exchange, and only
    // the survivors (true dups + ~1% false positives) reach the exact
    // confirm semi-join. Bloom has no false negatives and the semi-join
    // removes every false positive, so the output is bit-identical to the
    // exact formulation — the oracle is dd07's SQL, unchanged. At 100 TB the
    // joined data shrinks from the full increment to ~|dups|; the sketch is
    // the only thing that scales with the corpus (bytes ≈ 1.2/doc).
    Q("bf01_bloom_incremental",
      (s, d) => {
        val f = t(s, d, "documents").select(col("doc_id"), col("source"),
          md5(norm(col("text"))).as("fp"), Sampling.hashBucket(col("doc_id")).as("bk"))
          .persist() // corpus + increment branches share the fingerprint scan
        val corpusFp = f.filter(col("bk") < 80).select(col("fp")).distinct().persist()
        // Bloom sizing needs only an UPPER bound on the insert count, so the
        // table's parquet-footer row count (raw rows >= distinct corpus-slice
        // fingerprints) replaces what used to be a corpus-side count() job —
        // zero extra actions in the build DAG, and overshooting the bound
        // only LOWERS the effective fpp (answer unchanged: the exact confirm
        // semi-join removes every false positive regardless)
        val bloom = graft.spark.BloomFunctions.buildLong(
          corpusFp.select(xxhash64(col("fp")).as("h")), "h",
          expectedItems = Tables.rowCount(s, d, "documents"), fpp = 0.01)
        val inc = f.filter(col("bk") >= 80)
        val dropped = inc
          .filter(graft.spark.BloomFunctions.mightContain(bloom, xxhash64(col("fp"))))
          .join(corpusFp, Seq("fp"), "left_semi")
          .groupBy(col("source")).agg(count(lit(1)).as("nd"))
        inc.groupBy(col("source")).agg(count(lit(1)).as("n_batch"))
          .join(dropped, Seq("source"), "left")
          .select(col("source"), col("n_batch"),
            (col("n_batch") - coalesce(col("nd"), lit(0L))).as("n_kept"),
            coalesce(col("nd"), lit(0L)).as("n_dropped"))
          .orderBy(col("source"))
      },
      // the exact dd07 oracle verbatim: the Bloom tier must change NOTHING
      Some(s"""WITH f AS (SELECT doc_id, source,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              ${Sampling.hashBucketSql("doc_id")} AS bk
            FROM documents),
          c AS (SELECT DISTINCT fp FROM f WHERE bk < 80),
          j AS (SELECT b.source, CASE WHEN c.fp IS NULL THEN 1 ELSE 0 END AS kept
                FROM (SELECT source, fp FROM f WHERE bk >= 80) b
                LEFT JOIN c ON b.fp = c.fp)
        SELECT source, count(*) AS n_batch,
          CAST(sum(kept) AS BIGINT) AS n_kept,
          CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
        FROM j GROUP BY source ORDER BY source""")),

    // ---- bf02: count-min-sketch frequency estimation, exact-confirmed ----
    // The fixed-memory frequency sketch for heavy-hitter screening: a 4x1024
    // counter grid (md5 row hashes) estimates any token's frequency as the
    // MIN of its 4 counters — memory is constant regardless of vocab size,
    // the property that matters when the vocab does not fit an aggregate at
    // 100 TB. Built from per-token counts (one shuffle) rather than 4x the
    // token instances: counters = sum of counts per (row, bucket), a tiny
    // 4096-row relation that BROADCASTS into the estimate join. The query
    // reports the exact top-20 tokens with both exact and CMS counts, so the
    // oracle verifies the sketch arithmetic itself (est >= exact is the CMS
    // guarantee; equality when no bucket collision).
    Q("bf02_cms_heavy_hitters",
      (s, d) => {
        val D = 4; val W = 1024L
        val tokCounts = t(s, d, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .persist() // counters + top-20 branches share the one corpus shuffle
        def bucket(dd: Int) =
          conv(substring(md5(concat(col("tok"), lit(s":$dd"))), 1, 8), 16, 10)
            .cast("long") % W
        def dbArr = array((0 until D).map(dd =>
          struct(lit(dd).as("d"), bucket(dd).as("b"))): _*)
        val counters = tokCounts
          .select(col("cnt"), explode(dbArr).as("db"))
          .groupBy(col("db.d").as("d"), col("db.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
        val top = tokCounts.orderBy(col("cnt").desc, col("tok")).limit(20)
          .select(col("tok"), col("cnt").as("n_exact"))
        top.select(col("tok"), col("n_exact"), explode(dbArr).as("db"))
          .select(col("tok"), col("n_exact"), col("db.d").as("d"), col("db.b").as("b"))
          .join(broadcast(counters), Seq("d", "b"))
          .groupBy(col("tok"), col("n_exact"))
          .agg(min(col("c")).as("n_est"))
          .orderBy(col("n_exact").desc, col("tok"))
      },
      Some("""WITH inst AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents),
          tc AS (SELECT tok, count(*) AS cnt FROM inst GROUP BY tok),
          hd AS (SELECT tok, cnt, d,
                   ('0x' || substr(md5(tok || ':' || d), 1, 8))::BIGINT % 1024 AS b
                 FROM tc, generate_series(0, 3) AS t(d)),
          counters AS (SELECT d, b, CAST(sum(cnt) AS BIGINT) AS c
                       FROM hd GROUP BY d, b),
          top AS (SELECT tok, cnt AS n_exact FROM tc ORDER BY cnt DESC, tok LIMIT 20),
          est AS (SELECT h.tok, any_value(t.n_exact) AS n_exact, min(c.c) AS n_est
                  FROM top t JOIN hd h USING (tok)
                  JOIN counters c ON c.d = h.d AND c.b = h.b
                  GROUP BY h.tok)
        SELECT tok, n_exact, n_est FROM est ORDER BY n_exact DESC, tok""")),

    // ---- bf03: HLL cardinality — the sketch that replaces count(DISTINCT) ----
    // ---- at scale, error-bound-pinned against the exact answer           ----
    // Completes the sketch family (bf01 bloom membership, bf02 count-min
    // frequency): per-source DISTINCT-fingerprint cardinality via Spark's
    // native HyperLogLog++ (approx_count_distinct, rsd 2%), compared in the
    // SAME aggregation pass against the exact distinct. The exact column is
    // the oracle-checkable output; the approx path is the one a 100 TB
    // deployment ships (fixed-size sketch, partial-aggregated, no distinct
    // shuffle) — `within_bound` pins |approx - exact| / exact <= 3·rsd,
    // which is DETERMINISTIC on fixed data (HLL++ has no randomness), the
    // ss-family recall-floor convention for approximate operators.
    Q("bf03_hll_cardinality",
      (s, d) => {
        val rsd = 0.02
        t(s, d, "documents")
          .select(col("source"), md5(lower(trim(col("text")))).as("fp"))
          .groupBy(col("source"))
          .agg(count_distinct(col("fp")).as("n_exact"),
            approx_count_distinct(col("fp"), rsd).as("n_approx"))
          .select(col("source"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")).cast("double") /
              col("n_exact") <= 3 * rsd).as("within_bound"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(DISTINCT md5(lower(trim(text)))) AS n_exact,
          TRUE AS within_bound
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- dc01: decontamination — training docs sharing any 3-gram with ----
    // ---- the benchmark split ----
    // The eval-leakage scan every training corpus needs: the benchmark set
    // (deterministic 5% hash split standing in for an eval suite) contributes
    // a DISTINCT shingle-hash set; training docs join it on the shingle.
    // Because the benchmark side is distinct, join multiplicity is <= 1 per
    // training shingle — output is bounded by the training shingle count, no
    // frequency cap needed (unlike the pairwise dd03 join). AQE broadcasts
    // the benchmark set at test scale; at 100 TB it shuffle-joins on the
    // shingle hash.
    Q("dc01_decontaminate",
      (s, d) => {
        // cached: both filter branches (benchmark + training) read the same
        // shingle arrays — without it the 1M-shingle computation runs twice
        val docs = withShingles(Tables.spread(t(s, d, "documents")), "sh",
            col("doc_id"), Sampling.hashBucket(col("doc_id")).as("bk"))
          .cache()
        val bench = docs.filter(col("bk") >= 95)
          .select(explode(col("sh")).as("h")).distinct()
        docs.filter(col("bk") < 95)
          .select(col("doc_id"), explode(col("sh")).as("h"))
          .join(bench, Seq("h"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH b AS (SELECT doc_id,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in generate_series(1, len(w)-2)]) AS sh,
              ${Sampling.hashBucketSql("doc_id")} AS bk
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
          ex AS (SELECT doc_id, unnest(sh) AS g, bk FROM b),
          bench AS (SELECT DISTINCT g FROM ex WHERE bk >= 95),
          tr AS (SELECT doc_id, g FROM ex WHERE bk < 95)
        SELECT tr.doc_id, count(*) AS n_shared
        FROM tr JOIN bench USING (g)
        GROUP BY tr.doc_id ORDER BY tr.doc_id""")),

    // ---- dc02: contamination ATTRIBUTION — which training docs leak ----
    // ---- each benchmark item (top-3 by shared-shingle count)         ----
    // The report a decontamination pass produces for review: dc01 says HOW
    // MANY benchmark shingles each training doc shares; this says, per
    // benchmark doc, WHICH training docs overlap it most. Shapes: the same
    // cached shingle relation as dc01, a DfCap guard on the train side (a
    // boilerplate shingle in >256 training docs would make the h-join
    // quadratic — the dd03 bound, mirrored in the oracle), pair counts via
    // partial agg, and the per-benchmark top-3 through the native bounded
    // top-k aggregate (integer scores — no float-ordering hazard).
    Q("dc02_contamination_report",
      (s, d) => {
        val docs = withShingles(Tables.spread(t(s, d, "documents")), "sh",
            col("doc_id"), Sampling.hashBucket(col("doc_id")).as("bk"))
          .cache()
        val bench = docs.filter(col("bk") >= 95)
          .select(col("doc_id").as("bench_doc"), explode(col("sh")).as("h"))
        val train = docs.filter(col("bk") < 95)
          .select(col("doc_id").as("train_doc"), explode(col("sh")).as("h"))
        val hot = train.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") > DfCap).select(col("h"))
        val pairs = bench
          .join(train.join(broadcast(hot), Seq("h"), "left_anti"), Seq("h"))
          .groupBy(col("bench_doc"), col("train_doc"))
          .agg(count(lit(1)).as("n_shared"))
        pairs.groupBy(col("bench_doc"))
          .agg(graft.spark.TopKAggregate.topkBy(col("n_shared"), col("train_doc"), 3).as("top"))
          .select(col("bench_doc"), posexplode(col("top")))
          .select(col("bench_doc"), (col("pos") + 1).cast("bigint").as("rank"),
            col("col.id").as("train_doc"), col("col.score").as("n_shared"))
          .orderBy(col("bench_doc"), col("rank"))
      },
      Some(s"""WITH b AS (SELECT doc_id,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in generate_series(1, len(w)-2)]) AS sh,
              ${Sampling.hashBucketSql("doc_id")} AS bk
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
          ex AS (SELECT doc_id, unnest(sh) AS g, bk FROM b),
          tr AS (SELECT doc_id AS train_doc, g FROM ex WHERE bk < 95),
          keep AS (SELECT g FROM tr GROUP BY g HAVING count(*) <= $DfCap),
          bench AS (SELECT doc_id AS bench_doc, g FROM ex WHERE bk >= 95),
          p AS (SELECT bench_doc, train_doc, count(*) AS n_shared
                FROM bench JOIN tr USING (g) JOIN keep USING (g)
                GROUP BY bench_doc, train_doc),
          r AS (SELECT *, row_number() OVER (PARTITION BY bench_doc
                  ORDER BY n_shared DESC, train_doc) AS rank FROM p)
        SELECT bench_doc, CAST(rank AS BIGINT) AS rank, train_doc,
          CAST(n_shared AS BIGINT) AS n_shared
        FROM r WHERE rank <= 3 ORDER BY bench_doc, rank""")),

    // ---- dc03: decontaminated clean corpus — the composed BATCH twin of ----
    // ---- StreamingIngest.decontaminationGate ----
    // pp01's cleaning pipeline with the eval-leakage gate in its admission
    // slot (quality -> language -> DECONTAMINATE -> exact dedup keep-first):
    // dc01 audits overlap in isolation; this row drives the composed ORDER
    // through the DuckDB gate — decontamination must act on the
    // quality/lang survivors BEFORE dedup's keep-first pick, because a
    // contaminated doc that would have won keep-first must not shadow its
    // clean duplicate (a post-dedup scrub would drop the fingerprint
    // entirely; pinned by construction here). The criterion is the GATE's:
    // an 8-token shared window ([[DeconSpanK]] — see its scaladoc for the
    // measured rationale vs dc01's 3-gram audit statistic). Scale shape:
    // pp01's map-only flags + one fused span-kernel pass (word hashes in
    // their own projection, the dd08 lesson), the bench set distinct
    // (bounded: the eval split), one semi + one anti join on the window
    // hash, then pp01's single fingerprint window.
    Q("dc03_decontaminated_corpus",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nWords = size(split(trim(col("text")), "\\s+")).cast("bigint")
        val base = Tables.spread(t(s, d, "documents"))
          .withColumn("graft_wh", wordHashes(col("text")))
          .select(col("doc_id"), col("text"),
            Sampling.hashBucket(col("doc_id")).as("bk"),
            array_distinct(spansFromWh(col("graft_wh"), DeconSpanK)).as("sp"))
          .cache() // bench + train branches share the span kernel pass
        val bench = base.filter(col("bk") >= 95)
          .select(explode_outer(col("sp")).as("h"))
          .filter(col("h").isNotNull).distinct()
        val contaminated = base.filter(col("bk") < 95)
          .select(col("doc_id"), explode_outer(col("sp")).as("h"))
          .join(bench, Seq("h"), "left_semi")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val out = base.filter(col("bk") < 95)
          .select(col("doc_id"), col("text"), nWords.as("n_words"),
            TextOps.qualityCol.as("quality"), TextOps.predLangCol.as("pred_lang"))
          .filter(col("quality") >= 0.5 && col("pred_lang") === "en")
          .join(contaminated.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .withColumn("fp", md5(lower(trim(col("text")))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("n_words"), col("quality"))
          .orderBy(col("doc_id"))
          // eager checkpoint (pp04's convention) so the shared span-kernel
          // cache can be RELEASED here instead of leaking to session end —
          // the checkpoint holds only the small survivor projection
          .localCheckpoint()
        base.unpersist(false)
        out
      },
      Some(s"""WITH sp0 AS (SELECT doc_id,
              list_distinct([array_to_string(w[i:i+${DeconSpanK - 1}], ' ')
                             for i in generate_series(1, len(w)-${DeconSpanK - 1})]) AS sp,
              ${Sampling.hashBucketSql("doc_id")} AS bk
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
          ex AS (SELECT doc_id, unnest(sp) AS g, bk FROM sp0),
          bench AS (SELECT DISTINCT g FROM ex WHERE bk >= 95),
          cont AS (SELECT DISTINCT ex.doc_id FROM ex JOIN bench USING (g) WHERE bk < 95),
          q AS (SELECT d.doc_id, d.text,
              len(string_split_regex(trim(d.text), '\\s+')) AS n_words,
              ${TextOps.qualitySql} AS quality, ${TextOps.predLangSql} AS pred_lang
            FROM documents d JOIN sp0 USING (doc_id) WHERE sp0.bk < 95),
          f AS (SELECT doc_id, n_words, quality, md5(lower(trim(text))) AS fp
                FROM q WHERE quality >= 0.5 AND pred_lang = 'en'
                  AND doc_id NOT IN (SELECT doc_id FROM cont)),
          k AS (SELECT doc_id, n_words, quality,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, quality
        FROM k WHERE rn = 1 ORDER BY doc_id""")),

    // ---- dd08: passage-level duplicate-span fraction (Rabin-Karp style) ----
    // The exact-substring dedup SIGNAL (Lee et al. "Deduplicating Training
    // Data..."): what fraction of a document's 8-token windows also appear in
    // some other document. Suffix-array exactness is replaced by stride-1
    // window hashing — the standard scalable form. Shapes: window sets are
    // per-doc distinct, each window's document frequency is a COUNT WINDOW
    // over the hash (one exchange + sort of the exploded relation; the
    // groupBy-df + self-join formulation shuffled the same 5M-row relation
    // twice and ran 2.4x slower at sf1 — 17 s vs 7 s, max task 9.4 → 1.9 s),
    // and the word-hash array materializes in its own projection (the
    // withShingles CSE lesson). Per-hash window groups are as bounded as the
    // hash's df (≤ corpus docs for a boilerplate passage — count-only state,
    // no list accumulation). Window hashes combine 8 word hashes with
    // xxhash64 — set-equivalent to the oracle's joined window STRINGS (the
    // dd03 collision tradeoff, ~1e-8). Sub-8-token docs get zero windows by
    // the slice guard and report dup_frac 0.
    Q("dd08_passage_dup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val W = 8
        val wins = {
          val wh = col("graft_wh")
          val idx = slice(sequence(lit(0), greatest(size(wh) - W, lit(0))),
            lit(1), greatest(size(wh) - W + 1, lit(0)))
          array_distinct(transform(idx, i =>
            xxhash64((0 until W).map(o => get(wh, i + o)): _*)))
        }
        // explode_OUTER, not explode: plain explode makes Spark infer a
        // `size(wins) > 0` filter (InferFiltersFromGenerate) and push it
        // below the projections BY SUBSTITUTION — re-inlining the whole
        // window expression with the word-hash transform repeated per array
        // access, the exact O(words·W) re-evaluation the graft_wh projection
        // exists to prevent (measured at sf1: 17 s / 9.7 s max task with
        // explode, 6.6-10.8 s / ≤3.2 s with explode_outer). Outer also keeps
        // zero-window docs, so no join-back is needed. Their null rows
        // partition by doc_id (second window key) instead of piling into one
        // h=NULL partition; count(h) skips nulls so their df/n_win are 0.
        val base = Tables.spread(t(s, d, "documents"))
          .withColumn("graft_wh", wordHashes(col("text")))
          .select(col("doc_id"), wins.as("wins"))
        base.select(col("doc_id"), explode_outer(col("wins")).as("h"))
          .withColumn("df", count(col("h")).over(Window.partitionBy(col("h"),
            when(col("h").isNotNull, lit(0L)).otherwise(col("doc_id")))))
          .groupBy(col("doc_id"))
          .agg(count(col("h")).as("n_win"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_win"), col("n_dup"),
            when(col("n_win") === 0L, lit(0.0))
              .otherwise(col("n_dup").cast("double") / col("n_win")).as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
              list_distinct([array_to_string(w[i:i+7], ' ')
                             for i in generate_series(1, len(w)-7)]) AS wins
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
          ex AS (SELECT doc_id, unnest(wins) AS g FROM b),
          dfh AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
          pd AS (SELECT ex.doc_id, count(*) AS n_win,
                   CAST(sum(CASE WHEN dfh.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
                 FROM ex JOIN dfh USING (g) GROUP BY ex.doc_id)
        SELECT b.doc_id, coalesce(pd.n_win, 0) AS n_win, coalesce(pd.n_dup, 0) AS n_dup,
          CASE WHEN coalesce(pd.n_win, 0) = 0 THEN 0.0
               ELSE pd.n_dup::DOUBLE / pd.n_win END AS dup_frac
        FROM b LEFT JOIN pd USING (doc_id) ORDER BY b.doc_id""")),

    // ---- dd09: segment-level dedup + document reconstruction ----
    // Where dd08 only SCORES duplicated spans, dd09 performs the repair the
    // big-corpus pipelines actually apply (paragraph/passage dedup): cut each
    // doc into fixed 16-word segments (the fixture has no paragraph breaks;
    // at scale the splitter is a paragraph regex and everything downstream is
    // unchanged), keep only the corpus-wide FIRST occurrence of each distinct
    // segment (first = smallest (doc_id, seg_idx)), and re-assemble what's
    // left of every doc in original order. Scale shapes: first-occurrence is
    // a partial-aggregatable min(struct) per segment hash — map-side combine,
    // no window over the corpus, no skew pile-up from boilerplate segments
    // (the count-free analog of dd08's df) — followed by one equi-join back
    // on the hash (AQE skew-split handles a mega-duplicated segment);
    // reconstruction sorts only WITHIN each doc (sort_array over the doc's
    // own kept segments, bounded by doc length, no global sort). The segment
    // array materializes in its own projection and explodes with
    // posexplode_outer — both dd08 lessons (HOF no-CSE + the
    // InferFiltersFromGenerate re-inline). Output fingerprints the cleaned
    // text (md5) so the oracle checks exact reconstructed bytes without
    // hauling full texts through the compare.
    Q("dd09_segment_dedup",
      (s, d) => {
        val W = 16
        val base = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
          .withColumn("n_segs", expr(s"cast((size(ws) + ${W - 1}) div $W as bigint)"))
          .select(col("doc_id"), col("n_segs"),
            transform(sequence(lit(0), col("n_segs").cast("int") - 1),
              i => array_join(slice(col("ws"), i * W + 1, lit(W)), " ")).as("segs"))
        val segs = base
          .select(col("doc_id"), col("n_segs"),
            posexplode_outer(col("segs")).as(Seq("seg_idx", "seg")))
          .withColumn("h", md5(col("seg")))
        val firsts = segs.groupBy(col("h"))
          .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"))
        segs.join(firsts, Seq("h"))
          .withColumn("kept", col("first.doc_id") === col("doc_id") &&
            col("first.seg_idx") === col("seg_idx"))
          .groupBy(col("doc_id"), col("n_segs"))
          .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            // collect_list skips the nulls `when` leaves for dropped
            // segments; sort_array restores original seg order per doc
            md5(array_join(transform(
              sort_array(collect_list(when(col("kept"),
                struct(col("seg_idx"), col("seg"))))),
              e => e.getField("seg")), " ")).as("clean_fp"))
          .select(col("doc_id"), col("n_segs"), col("n_kept"), col("clean_fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
            FROM documents),
          b AS (SELECT doc_id, CAST((len(ws) + 15) // 16 AS BIGINT) AS n_segs, ws FROM w),
          seg AS (SELECT doc_id, n_segs,
                    unnest(list_transform(range(n_segs), i ->
                      {'seg_idx': i, 'seg': array_to_string(ws[(i*16+1):(i*16+16)], ' ')})) AS u
                  FROM b),
          s2 AS (SELECT doc_id, n_segs, u.seg_idx AS seg_idx, u.seg AS seg FROM seg),
          r AS (SELECT *, row_number() OVER (PARTITION BY md5(seg)
                  ORDER BY doc_id, seg_idx) AS rn FROM s2),
          agg AS (SELECT doc_id, any_value(n_segs) AS n_segs,
                    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                    md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                      ORDER BY seg_idx), '')) AS clean_fp
                  FROM r GROUP BY doc_id)
        SELECT doc_id, n_segs, n_kept, clean_fp FROM agg ORDER BY doc_id""")),

    // ---- dd10: cross-source duplication matrix (provenance analysis) ----
    // Which sources copy from which: for every unordered source pair, how
    // many LEAD fingerprints (first 16 normalized words — the syndication
    // heuristic: same lead paragraph ⇒ copied/franchised item; full-text
    // fingerprints never cross sources in this corpus because each feed
    // re-wraps the body) they share, and how many duplicate DOC pairs that
    // implies — the scraper-overlap report that decides which feeds to drop
    // before training. Scale shape: one partial-agg shuffle on the
    // fingerprint collecting per-source counts (distinct sources are
    // bounded — a corpus has dozens of feeds, not millions), then each
    // fingerprint expands to at most |sources|² pair rows via a lateral
    // explode — work ∝ shared fingerprints, never doc pairs; no self-join of
    // the corpus. Doc-pair counts multiply per-source occurrence counts, so
    // the quadratic is arithmetic, not enumeration.
    Q("dd10_source_overlap",
      (s, d) => {
        val norm = (c: Column) =>
          regexp_replace(lower(trim(c)), "\\s+", " ")
        val lead = (c: Column) =>
          concat_ws(" ", slice(split(norm(c), " ", -1), 1, 16))
        val fps = Tables.spread(t(s, d, "documents"))
          .select(md5(lead(col("text"))).as("fp"), col("source"))
          .groupBy(col("fp"), col("source")).agg(count(lit(1)).as("n"))
        val bySrc = fps.groupBy(col("fp"))
          .agg(sort_array(collect_list(struct(col("source"), col("n")))).as("srcs"))
          .filter(size(col("srcs")) > 1)
        bySrc
          .select(col("fp"), explode(col("srcs")).as("a"), col("srcs"))
          .select(col("fp"), col("a"), explode(col("srcs")).as("b"))
          .filter(col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("shared_fps"),
            sum(col("a.n") * col("b.n")).as("dup_doc_pairs"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH f AS (SELECT md5(array_to_string(
                    (string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))[1:16],
                    ' ')) AS fp,
                  source, count(*) AS n
                FROM documents GROUP BY fp, source),
          multi AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > 1)
        SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS shared_fps, CAST(sum(a.n * b.n) AS BIGINT) AS dup_doc_pairs
        FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        WHERE a.fp IN (SELECT fp FROM multi)
        GROUP BY source_a, source_b ORDER BY source_a, source_b""")),

    // ---- dd12: incremental NEAR-dup — the new batch screened against the ----
    // ---- corpus's MinHash-LSH index (dd07's incremental shape x dd04's   ----
    // ---- near-dup detection). The production daily-ingest step: exact    ----
    // ---- incremental dedup (dd07/bf01) only catches byte-identical docs; ----
    // ---- this catches the re-crawled/retemplated near-copies too.        ----
    // Scale shape: the corpus side IS the precomputed banded index a 100 TB
    // deployment stores (16 narrow (band, bkey, doc_id) rows per corpus
    // doc); the increment computes its own bands map-only and equi-joins
    // the index on (band, bkey) — candidates ∝ colliding bands, never
    // batch x corpus; hot index buckets are census-capped (the dd04
    // BlockCap argument, inert at test scale); candidates verify against
    // exact shingle Jaccard so the output has NO false positives. Per-doc
    // verdicts (n_near, max_j, keep), linear in the batch.
    Q("dd12_incremental_neardup",
      (s, d) => {
        val base = withShingles(Tables.spread(t(s, d, "documents")), "sh",
            col("doc_id"), col("source"), Sampling.hashBucket(col("doc_id")).as("bk"))
          .withColumn("n", size(col("sh")))
          .persist() // bands + both sides of verification share the shingle scan
        val bands = base
          .select(col("doc_id"), col("bk"), minhashSig(col("sh")).as("sig"))
          .select(col("doc_id"), col("bk"), posexplode(bandKeysCol(col("sig")))
            .as(Seq("band", "bkey")))
          .persist()
        val corpusBands = bands.filter(col("bk") < 80)
          .select(col("doc_id").as("doc_c"), col("band"), col("bkey"))
        val hot = corpusBands.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("bc"))
          .filter(col("bc") > BlockCap).select(col("band"), col("bkey"))
        val keptCorpus = corpusBands.join(hot, Seq("band", "bkey"), "left_anti")
        val cand = bands.filter(col("bk") >= 80)
          .select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
          .join(keptCorpus, Seq("band", "bkey"))
          .select(col("doc_b"), col("doc_c")).distinct()
        val inter = size(array_intersect(col("shb"), col("shc"))).cast("double")
        val verified = cand
          .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb"),
            col("n").as("n_b")), "doc_b")
          .join(base.select(col("doc_id").as("doc_c"), col("sh").as("shc"),
            col("n").as("n_c")), "doc_c")
          .select(col("doc_b"),
            (inter / (col("n_b") + col("n_c") - inter)).as("jaccard"))
          .filter(col("jaccard") >= 0.3)
        val perDoc = verified.groupBy(col("doc_b"))
          .agg(count(lit(1)).as("n_near"), max(col("jaccard")).as("max_j"))
        base.filter(col("bk") >= 80)
          .select(col("doc_id"), col("source"))
          .join(perDoc, col("doc_id") === col("doc_b"), "left")
          .select(col("doc_id"), col("source"),
            coalesce(col("n_near"), lit(0L)).as("n_near"),
            // 0.0 sentinel, not NULL: jaccard >= 0.3 so 0.0 is unambiguous,
            // and a nullable double would make the driver's float compare
            // NaN-poisoned on the no-neighbor rows
            coalesce(col("max_j"), lit(0.0)).as("max_j"),
            col("n_near").isNull.as("keep"))
          .orderBy(col("doc_id"))
      },
      // Exact oracle: all batch x corpus pairs at jaccard >= 0.3 (sound for
      // the same reason as dd04 — verification removes all false positives
      // and banded recall is 100% on the fixed fixtures, DedupRecallSpec).
      Some(s"""WITH b AS (
            SELECT doc_id, source, ${Sampling.hashBucketSql("doc_id")} AS bk,
              list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                             for i in generate_series(1, len(w)-2)]) AS sh
            FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS w
                  FROM documents)),
          k AS (SELECT doc_id, source, bk, sh, len(sh) AS n FROM b),
          pairs AS (SELECT bt.doc_id AS doc_b,
                      len(list_intersect(bt.sh, c.sh))::DOUBLE /
                        (bt.n + c.n - len(list_intersect(bt.sh, c.sh))) AS jaccard
                    FROM k bt JOIN k c ON bt.bk >= 80 AND c.bk < 80),
          f AS (SELECT doc_b, CAST(count(*) AS BIGINT) AS n_near, max(jaccard) AS max_j
                FROM pairs WHERE jaccard >= 0.3 GROUP BY doc_b)
        SELECT bt.doc_id, bt.source, coalesce(f.n_near, 0) AS n_near,
          coalesce(f.max_j, 0.0) AS max_j, f.n_near IS NULL AS keep
        FROM k bt LEFT JOIN f ON f.doc_b = bt.doc_id
        WHERE bt.bk >= 80
        ORDER BY bt.doc_id""")),

    // ---- dd13: hot-span report — corpus-frequent 5-gram spans per document ----
    // The memorization/boilerplate audit (the Lee et al. "Deduplicating
    // Training Data" exact-substring signal reshaped to fixed 5-gram spans):
    // find spans that recur across >= 3 DISTINCT documents, then report per
    // doc how much of it is built from them — the "how templated is this
    // feed" dial that complements dd03's pairwise Jaccard (which scores doc
    // PAIRS; this scores each doc against the whole corpus at once).
    // Scale shape: spans are 5 consecutive word HASHES combined with
    // xxhash64 (never materialized strings — the module lesson), computed in
    // a narrow map; then (doc, span) occurrence counts partial-aggregate
    // into shuffle 1; span document-frequency partial-aggregates the
    // already-distinct (doc, span) relation into shuffle 2 — both are the
    // tf/df shapes tx06 ships at any corpus size. The join back attaches the
    // df-filtered hot set to the per-doc span relation on the span hash
    // (equi-join of two partial-agg'd narrow relations; AQE broadcasts when
    // the hot set is small, falls back to a bounded shuffle join when a
    // pathological corpus makes it big — unlike dd03's DfCap-bounded hot
    // set, |hot| here is only bounded by instances/3, so a forced broadcast
    // would be a scale bug). One final per-doc partial agg. No pair
    // enumeration anywhere — work is linear in span instances.
    Q("dd13_hot_spans",
      (s, d) => {
        val DfT = 3
        val spans = Tables.spread(t(s, d, "documents"))
          .withColumn("graft_wh", wordHashes(col("text")))
          .select(col("doc_id"), explode_outer(spansFromWh(col("graft_wh"), 5)).as("h"))
        val docSpan = spans.groupBy(col("doc_id"), col("h"))
          .agg(count(lit(1)).as("occ"))
          .persist() // read twice: df aggregation + the hot join-back
        val hot = docSpan.filter(col("h").isNotNull)
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= DfT)
        docSpan.join(hot, Seq("h"), "left")
          .groupBy(col("doc_id"))
          .agg(
            // the explode_outer null-span row (sub-K doc) must count zero
            sum(when(col("h").isNotNull, col("occ")).otherwise(0L)).as("n_spans"),
            coalesce(sum(when(col("df").isNotNull, col("occ"))), lit(0L)).as("n_hot"),
            count(col("df")).as("n_hot_distinct"))
          .select(col("doc_id"), col("n_spans"), col("n_hot"), col("n_hot_distinct"),
            (col("n_hot").cast("double") / greatest(col("n_spans"), lit(1L)))
              .as("hot_frac"))
          .orderBy(col("doc_id"))
      },
      // String spans in the oracle stand in for the hash-combined spans —
      // equivalent as multisets modulo 64-bit collisions (the dd03 argument).
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
          g AS (SELECT doc_id, unnest([array_to_string(w[i:i+4], ' ')
                  for i in generate_series(1, len(w)-4)]) AS g FROM t),
          dg AS (SELECT doc_id, g, count(*) AS occ FROM g GROUP BY doc_id, g),
          hot AS (SELECT g FROM dg GROUP BY g HAVING count(*) >= 3),
          per AS (SELECT dg.doc_id,
                    CAST(sum(occ) AS BIGINT) AS n_spans,
                    CAST(coalesce(sum(CASE WHEN h.g IS NOT NULL THEN occ END), 0)
                      AS BIGINT) AS n_hot,
                    CAST(count(h.g) AS BIGINT) AS n_hot_distinct
                  FROM dg LEFT JOIN hot h ON dg.g = h.g GROUP BY dg.doc_id)
        SELECT t.doc_id, coalesce(n_spans, 0) AS n_spans, coalesce(n_hot, 0) AS n_hot,
          coalesce(n_hot_distinct, 0) AS n_hot_distinct,
          coalesce(n_hot, 0)::DOUBLE / greatest(coalesce(n_spans, 0), 1) AS hot_frac
        FROM t LEFT JOIN per USING (doc_id) ORDER BY t.doc_id""")),

    // ---- dd14: quality-aware canonical selection — dd06 x tx02 ----
    // The production dedup DECISION the raw cluster dump feeds: within each
    // near-dup cluster keep the HIGHEST-QUALITY member (ties to the lowest
    // doc_id), not the arbitrary lowest-id one — re-crawls and mirrors often
    // carry the cleaner copy of a page, and keep-lowest-id throws it away.
    // Composes the factored [[dupClusters]] components with tx02's shared
    // quality builder (TextOps.qualityCol — the same raw-double arithmetic
    // on both engines, so the per-cluster argmax agrees exactly). Shapes:
    // the quality attach is an equi-join of two doc_id-keyed relations; the
    // keep decision is one window PARTITIONED by cluster (parallel at any
    // cluster count — clusters are near-dup components, bounded by the
    // banded-candidate machinery, never corpus-sized).
    Q("dd14_canonical_quality",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val labels = dupClusters(s, d)
        val q = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), TextOps.qualityCol.as("quality"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("quality").desc, col("doc_id"))
        labels.join(q, "doc_id")
          .withColumn("keep", row_number().over(w) === 1)
          .select(col("doc_id"), col("cluster"), col("quality"), col("keep"))
          .orderBy(col("doc_id"))
      },
      // dd06's recursive-CTE closure + tx02's quality formula, argmax via the
      // same deterministic (quality DESC, doc_id ASC) rank
      Some(s"""WITH RECURSIVE b AS (
          SELECT doc_id,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in generate_series(1, len(w)-2)]) AS sh
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
        k AS (SELECT doc_id, sh, len(sh) AS n FROM b),
        pairs AS (
          SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_intersect(a.sh, b.sh))::DOUBLE /
                (a.n + b.n - len(list_intersect(a.sh, b.sh))) AS jacc
            FROM k a JOIN k b ON a.doc_id < b.doc_id)
          WHERE jacc >= 0.3),
        edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(u, v) AS (SELECT u, v FROM edges
                        UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster
                FROM reach GROUP BY u),
        q AS (SELECT doc_id, ${TextOps.qualitySql} AS quality FROM documents),
        j AS (SELECT lab.doc_id, cluster, quality FROM lab JOIN q USING (doc_id))
        SELECT doc_id, cluster, quality,
          row_number() OVER (PARTITION BY cluster
            ORDER BY quality DESC, doc_id ASC) = 1 AS keep
        FROM j ORDER BY doc_id"""))
  )
}
