package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact (hash group-by),
  * normalized fingerprint, exact n-gram Jaccard (blocked pair join), MinHash+LSH
  * near-dup, and SimHash near-dup.
  *
  * Scale notes (100 TB design):
  *  - exact/fingerprint dedup is one partial-aggregated shuffle on a hash key;
  *  - pairwise Jaccard NEVER does an unblocked cross join — candidate pairs come
  *    from equality joins on (source, length-bucket) blocks or LSH buckets, so
  *    the shuffle key is the block id and AQE handles skewed buckets;
  *  - MinHash signatures are computed per-row with native codegen'd array
  *    expressions (no UDFs) and reduced with 64 map-side-combined min() aggs;
  *  - signature lookup joins for candidate verification broadcast when small,
  *    otherwise they are plain shuffled equi-joins on doc_id.
  */
object Dedup {
  import Tables.t

  /** Normalized text: lowercase, whitespace collapsed, trimmed. */
  private def norm(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Distinct 3-word shingles of the lowercased text (docs always have >=3 words). */
  private def shingles(text: Column): Column = {
    val w = split(lower(text), " ")
    array_distinct(
      transform(sequence(lit(0), greatest(size(w) - 3, lit(0))),
        i => concat_ws(" ", get(w, i), get(w, i + 1), get(w, i + 2))))
  }

  // 64 deterministic affine permutations for MinHash: h_i(x) = (a_i*x + b_i) & MASK.
  private val P = 64
  private val Mask = (1L << 61) - 1
  private val permA: Array[Long] = Array.tabulate(P)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
  private val permB: Array[Long] = Array.tabulate(P)(i => 6364136223846793005L * (i + 7) + 1442695040888963407L)

  /** doc_id + minhash signature (64 longs) per document — explode distinct
    * shingle hashes, then 64 partial-aggregated min()s in a single shuffle on
    * doc_id (map-side combine keeps the shuffle narrow). Per-row array-
    * expression variants were measured slower end-to-end: the 64-term
    * expression tree costs ~7s of one-time codegen per JVM. */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    val sh = Tables.spread(docs).select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val mins = Array.tabulate(P) { i =>
      min((col("h") * permA(i) + permB(i)).bitwiseAND(lit(Mask))).as(s"m$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array(Array.tabulate(P)(i => col(s"m$i")): _*).as("sig"))
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
    // |A∩B| = count per pair and |A∪B| = |A|+|B|-|A∩B|. The shuffle key is the
    // shingle hash, so AQE handles hot shingles; at 100 TB this is the only
    // tractable exact form.
    Q("dd03_ngram_jaccard",
      (s, d) => {
        val base = Tables.spread(t(s, d, "documents")).select(
          col("doc_id"), col("source"), floor(col("n_chars") / 100).as("lb"),
          array_distinct(transform(shingles(col("text")), x => xxhash64(x))).as("sh"))
          .withColumn("n", size(col("sh")))
        // cache the exploded doc-shingle relation: both sides of the self-join
        // read it (without this, shingling runs twice); disk-spillable at scale
        val ex = base.select(col("doc_id"), col("source"), col("lb"), col("n"),
          explode(col("sh")).as("h")).persist()
        val a = ex.select(col("doc_id").as("doc_a"), col("source"), col("lb"),
          col("n").as("n_a"), col("h"))
        val b = ex.select(col("doc_id").as("doc_b"), col("source").as("source_b"),
          col("lb").as("lb_b"), col("n").as("n_b"), col("h").as("h_b"))
        val common = a.join(b,
            col("h") === col("h_b") && col("source") === col("source_b") &&
            col("lb") === col("lb_b") && col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
          .agg(count(lit(1)).cast("double").as("inter"))
        val j = col("inter") / (col("n_a") + col("n_b") - col("inter"))
        common
          .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH b AS (
          SELECT doc_id, source, n_chars//100 AS lb,
            list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                           for i in generate_series(1, greatest(len(w)-2, 1))]) AS sh
          FROM (SELECT doc_id, source, n_chars, string_split(lower(text), ' ') AS w FROM documents))
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            round(len(list_intersect(a.sh, b.sh))::DOUBLE /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
          FROM b a JOIN b b ON a.source = b.source AND a.lb = b.lb AND a.doc_id < b.doc_id)
        WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b""")),

    // ---- dd04: MinHash + LSH (16 bands x 4 rows) candidate pairs, est. Jaccard >= 0.3 ----
    // Approximate by construction — no SQL oracle (driver records rows-only).
    Q("dd04_minhash_lsh",
      (s, d) => {
        val sigs = minhashSigs(t(s, d, "documents")).cache()
        val bands = sigs.select(col("doc_id"), posexplode(
          transform(sequence(lit(0), lit(15)), b =>
            xxhash64(slice(col("sig"), b * 4 + 1, lit(4))))
        ).as(Seq("band", "bkey")))
        val pairs = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
        val est = size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), b => b))
          .cast("double") / P
        pairs
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), round(est, 4).as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None),

    // ---- dd05: SimHash (64-bit over word hashes), hamming<=3 within 16-bit chunk blocks ----
    // Approximate by construction — no SQL oracle.
    // Scale shape: explode words -> hash once per word -> 64 partial-aggregated
    // sign-sums per doc (map-side combine, one shuffle on doc_id). The naive
    // per-row array-expression form recomputes the word hash per bit and
    // allocates 64-wide arrays per word — 15x slower at sf0.1.
    Q("dd05_simhash",
      (s, d) => {
        val wordHashes = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
          .select(col("doc_id"), xxhash64(col("w")).as("h"))
        val bitAggs = (0 until 64).map { i =>
          sum(when(call_function("shiftright", col("h"), lit(i)).bitwiseAND(1) === 1, 1)
            .otherwise(-1)).as(s"s$i")
        }
        val bits = array((0 until 64).map(i => when(col(s"s$i") >= 0, 1L).otherwise(0L)): _*)
        val base = wordHashes.groupBy(col("doc_id"))
          .agg(bitAggs.head, bitAggs.tail: _*)
          .select(col("doc_id"), bits.as("bits"))
          .withColumn("chunks", transform(sequence(lit(0), lit(3)), c =>
            aggregate(slice(col("bits"), c * 16 + 1, lit(16)), lit(0L), (a2, x) => a2 * 2 + x)))
          .cache()
        val blocked = base.select(col("doc_id"), col("bits"),
          posexplode(col("chunks")).as(Seq("ci", "cv")))
        val ham = size(filter(zip_with(col("x.bits"), col("y.bits"), (a, b) => a =!= b), b => b))
        blocked.as("x").join(blocked.as("y"),
            col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"), ham.as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None)
  )
}
