package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sequence-prep operators between cleaning and training: overlapping
  * token-window chunking (the RAG / context-window prep step) and PII
  * redaction.
  *
  * Scale notes (100 TB design): both are strictly map-only — chunk expansion
  * is a per-row generator (`explode` of a locally-built array, no shuffle, no
  * driver involvement), and redaction is per-row regex surgery. Parallelism is
  * whatever the scan provides; neither op ever exchanges data.
  */
object Prep {
  import Tables.t

  /** Chunk geometry: 32-token windows every 24 tokens (8-token overlap). */
  private val ChunkSize = 32
  private val Stride = 24

  /** ch02's chunk budget in SUBWORD tokens (under TextOps.BpeMerges). */
  private val TokenBudget = 48

  /** PII patterns, identical under Java regex and DuckDB RE2. Order matters:
    * emails go first (their local part could otherwise be clipped by the
    * phone/ssn digit runs), then the longer phone form, then bare SSNs. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
  private val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** The synthetic corpus carries no PII (verified: zero '@', zero digits), so
    * pii01 first AUGMENTS each doc with deterministic doc_id-derived contact
    * strings — the redaction arithmetic below is what the operator
    * demonstrates; the augmentation is the test fixture, mirrored verbatim in
    * the oracle. */
  private def augmented: Column =
    concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" ssn 123-45-6789"))
  private val augmentedSql =
    """(text || ' contact user' || doc_id || '@example.com or +1-555-' ||
       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ssn 123-45-6789')"""

  /** Library surface: redact emails/phones/SSNs in `c` (used by pii01 and
    * directly callable; counts come from regexp_extract_all before rewrite). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      SsnRe, "[SSN]")

  /** ch02/ch03's shared builder: greedy first-fit chunk packing over
    * per-word subword counts under `merges` — the packing state is a
    * (chunk, run) struct folded over the counts array, per-document,
    * inside whole-stage codegen, zero shuffle at any scale. Per-word BPE
    * counts are additive across a chunk because merges never cross
    * whitespace (the BpeCount contract). Parameterized on the merge table
    * so the 28-rank sequential path (ch02) and the 80-rank heap path
    * (ch03) budget through ONE fold. */
  private def tokenChunksBuild(merges: Seq[(Char, Char)])
      : (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => {
      val counts = transform(split(trim(col("text")), "\\s+"),
        x => graft.spark.BpeExpressions.bpeCount(x, merges))
      val c = col("c")
      val zero = struct(lit(0L).as("chunk"), lit(0L).as("run"))
      val packed = aggregate(c, zero, (a, x) => {
        val roll = a.getField("run") > 0 && (a.getField("run") + x) > TokenBudget
        struct(
          when(roll, a.getField("chunk") + 1).otherwise(a.getField("chunk")).as("chunk"),
          when(roll, x).otherwise(a.getField("run") + x).as("run"))
      })
      Tables.spread(t(s, d, "documents"))
        .select(col("doc_id"), explode(array(counts)).as("c"))
        .select(col("doc_id"), size(c).cast("bigint").as("n_words"),
          aggregate(c, lit(0L), (a, x) => a + x).as("subwords"),
          (packed.getField("chunk") + 1).as("n_chunks"))
        .select(col("doc_id"), col("n_words"), col("subwords"), col("n_chunks"),
          (col("subwords").cast("double") / col("n_chunks")).as("avg_fill"))
        .orderBy(col("doc_id"))
    }

  /** The matching oracle, parameterized on the per-word replace chain. */
  private def tokenChunksSql(chain: String): String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents),
          cs AS (SELECT doc_id, len(w) AS n_words,
                  list_transform(w, x -> length($chain)) AS c
                FROM t),
          -- the fold state is chunk*1e9 + run in ONE BIGINT, not a struct:
          -- DuckDB's vectorized CASE over struct-typed lambda accumulators
          -- mis-executes under multi-row batching (full-relation runs gave
          -- different chunk counts than the same fold filtered to one row);
          -- scalar-BIGINT CASE folds are deterministic. run < 1e9 always
          -- (bounded by max(budget, longest word)).
          p AS (SELECT doc_id, n_words,
                  list_reduce(list_prepend(CAST(0 AS BIGINT), c), (a, x) -> a + x) AS subwords,
                  list_reduce(list_prepend(CAST(0 AS BIGINT), c),
                    (a, x) -> CASE WHEN a % 1000000000 > 0 AND a % 1000000000 + x > $TokenBudget
                              THEN (a // 1000000000 + 1) * 1000000000 + x
                              ELSE a + x END) AS st
                FROM cs)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, subwords,
          st // 1000000000 + 1 AS n_chunks,
          subwords::DOUBLE / (st // 1000000000 + 1) AS avg_fill
        FROM p ORDER BY doc_id"""

  val entries: Seq[Q] = Seq(
    // ---- ch01: overlapping token-window chunking ----
    // Each doc becomes ceil((n-size)/stride)+1 chunks of <=32 whitespace
    // tokens with 8-token overlap. The chunk list is built per row
    // (sequence+transform+slice) and exploded — a generator, not a join or
    // shuffle; output rows ~ 4x input at this geometry regardless of scale.
    // Chunk text is fingerprinted (md5) so the checked output stays narrow.
    Q("ch01_chunk_windows",
      (s, d) => {
        val w = col("w")
        val nChunks = lit(1) +
          floor((greatest(size(w) - ChunkSize, lit(0)) + (Stride - 1)) / Stride).cast("int")
        val chunk = col("chunk_id") * Stride + 1
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(array(split(trim(col("text")), "\\s+"))).as("w"))
          .select(col("doc_id"), w,
            explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
          .select(col("doc_id"), col("chunk_id").cast("bigint").as("chunk_id"),
            size(slice(w, chunk, lit(ChunkSize))).cast("bigint").as("n_chunk_tokens"),
            md5(array_join(slice(w, chunk, lit(ChunkSize)), " ")).as("chunk_fp"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents),
          c AS (SELECT doc_id, w,
                  1 + (greatest(len(w) - $ChunkSize, 0) + ${Stride - 1}) // $Stride AS n_chunks
                FROM t),
          -- series bound derived from the data (max chunks of any doc), not a
          -- fixed cap: a doc with more than 4096 chunks would otherwise be
          -- silently truncated by the oracle while the engine's sequence() is
          -- unbounded
          x AS (SELECT doc_id, w, i AS chunk_id
                FROM c JOIN (SELECT unnest(generate_series(0,
                        (SELECT max(n_chunks) FROM c))) AS i) idx
                  ON idx.i < c.n_chunks)
        SELECT doc_id, chunk_id,
          len(w[chunk_id*$Stride+1 : chunk_id*$Stride+$ChunkSize]) AS n_chunk_tokens,
          md5(array_to_string(w[chunk_id*$Stride+1 : chunk_id*$Stride+$ChunkSize], ' ')) AS chunk_fp
        FROM x ORDER BY doc_id, chunk_id""")),

    // ---- ch02: token-budget greedy chunk packing (subword-faithful) ----
    // ch01 chunks by fixed WORD windows; real context-window prep packs by
    // what the model actually consumes — SUBWORD tokens under the frozen
    // tokenizer (TextOps.BpeMerges, sp17's accounting). Greedy first-fit in
    // word order: a word that would overflow the 48-subword budget starts a
    // new chunk; an oversized single word gets its own chunk (run > budget,
    // next word rolls). The packing state is a (chunk, run) struct folded
    // over the per-word counts array — per-document, inside whole-stage
    // codegen, zero shuffle at any scale. Per-word BPE counts are additive
    // across a chunk because merges never cross whitespace (the BpeCount
    // contract), so chunk subword sizes are exactly the fold's run values.
    Q("ch02_token_chunks",
      tokenChunksBuild(TextOps.BpeMerges),
      Some(tokenChunksSql(TextOps.bpeReplaceChainSql("x")))),

    // ---- ch03: the SAME packing under the production-width heap table ----
    // ch02 budgets under the 28-rank sequential merge table; tx14 gates the
    // heap merger (80-rank BpeMergesWide, the path a real 50k-vocab
    // tokenizer lands on) in a counting aggregation. This row closes the
    // remaining gap: the heap path's PER-WORD outputs FEED downstream
    // arithmetic — the greedy fold's running prefix sums decide chunk
    // boundaries, so any per-word miscount under the heap merger shifts
    // n_chunks/avg_fill, not just a corpus total. Same geometry and budget
    // as ch02, so the two rows differ exactly where the wide table changes
    // counts (the spec pins that it DOES on the fixture — otherwise this
    // row would re-prove ch02). Oracle: the width-agnostic replace-chain
    // builder composed with ch02's fold CTEs, verbatim.
    Q("ch03_wide_token_chunks",
      tokenChunksBuild(TextOps.BpeMergesWide),
      Some(tokenChunksSql(
        TextOps.bpeReplaceChainSqlFor(TextOps.BpeMergesWide, "x")))),

    // ---- pii01: PII detection + redaction ----
    // Counts each PII class, then rewrites them to typed placeholders; the
    // redacted text is md5-fingerprinted to keep the compared output narrow.
    Q("pii01_redact",
      (s, d) => {
        val a = col("a")
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), explode(array(augmented)).as("a"))
          .select(col("doc_id"),
            size(regexp_extract_all(a, lit(EmailRe), lit(0))).cast("bigint").as("n_emails"),
            size(regexp_extract_all(a, lit(PhoneRe), lit(0))).cast("bigint").as("n_phones"),
            size(regexp_extract_all(a, lit(SsnRe), lit(0))).cast("bigint").as("n_ssn"),
            md5(redactPii(a)).as("red_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $augmentedSql AS a FROM documents)
        SELECT doc_id,
          len(regexp_extract_all(a, '$EmailRe')) AS n_emails,
          len(regexp_extract_all(a, '$PhoneRe')) AS n_phones,
          len(regexp_extract_all(a, '$SsnRe')) AS n_ssn,
          md5(regexp_replace(regexp_replace(regexp_replace(a,
                '$EmailRe', '[EMAIL]', 'g'),
                '$PhoneRe', '[PHONE]', 'g'),
                '$SsnRe', '[SSN]', 'g')) AS red_fp
        FROM t ORDER BY doc_id""")),

    // ---- pii02: keyed pseudonymization (linkable) + hard redaction ----
    // The policy mix GDPR-style pipelines use: LINKABLE identifiers (email,
    // phone) become stable keyed pseudonyms — the same identifier maps to
    // the same token corpus-wide, preserving joinability/dedup across docs —
    // while irrecoverable ones (SSN) are hard-redacted. Rewrite = a fold of
    // string replaces over the extracted identifier list (per-row, map-only,
    // zero shuffle); pseudonym = tag + md5(identifier:key) prefix. The
    // oracle's list_reduce has no init parameter, so the text seeds the fold
    // as a prepended list head — same left fold, mirrored exactly.
    Q("pii02_pseudonymize",
      (s, d) => {
        val a = col("a")
        def pseudo(e: Column, tag: String): Column =
          concat(lit(tag), substring(md5(concat(e, lit(":p11"))), 1, 12))
        val ems = regexp_extract_all(a, lit(EmailRe), lit(0))
        val phs = regexp_extract_all(a, lit(PhoneRe), lit(0))
        val folded = aggregate(phs,
          aggregate(ems, a, (acc, e) => replace(acc, e, pseudo(e, "id-"))),
          (acc, p) => replace(acc, p, pseudo(p, "tel-")))
        Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"), explode(array(augmented)).as("a"))
          .select(col("doc_id"),
            size(ems).cast("bigint").as("n_pseudo_email"),
            size(phs).cast("bigint").as("n_pseudo_phone"),
            md5(regexp_replace(folded, SsnRe, "[SSN]")).as("pseudo_fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $augmentedSql AS a FROM documents),
          x AS (SELECT doc_id, a,
                  regexp_extract_all(a, '$EmailRe') AS ems,
                  regexp_extract_all(a, '$PhoneRe') AS phs FROM t),
          f AS (SELECT doc_id, len(ems) AS n_pseudo_email, len(phs) AS n_pseudo_phone,
                  list_reduce([list_reduce([a] || ems,
                      (acc, e) -> replace(acc, e, 'id-' || substr(md5(e || ':p11'), 1, 12)))]
                    || phs,
                    (acc, p) -> replace(acc, p, 'tel-' || substr(md5(p || ':p11'), 1, 12))) AS fl
                FROM x)
        SELECT doc_id, n_pseudo_email, n_pseudo_phone,
          md5(regexp_replace(fl, '$SsnRe', '[SSN]', 'g')) AS pseudo_fp
        FROM f ORDER BY doc_id"""))
  )
}
