package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch decode / feature-extract as per-partition operators.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`FakeDecoder`); everything Spark-side —
  * schema, batching, partitioning, operator signature — is real. At 100 TB the
  * binary payloads stay columnar in parquet, the decode is a narrow map
  * (mapPartitions, no shuffle), and metadata-only queries never touch bytes
  * (parquet column pruning drops the payload column at the scan).
  */
object Multimodal {
  import Tables.t

  /** Typed decoded-media record (what a real image decoder would emit). */
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
                             channels: Int, features: Array[Float])

  /** STUB decoder: a real implementation would decode image bytes (JPEG/PNG);
    * offline we derive deterministic fake dimensions/features from the bytes. */
  object FakeDecoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      // empty payload is a legal input: byte contribution 0 (the corpora have
      // no empty docs, so the SQL oracles need no mirror of this guard)
      def byteAt(i: Int): Long = if (bytes.isEmpty) 0L else bytes((i * 31) % bytes.length).toLong
      val feats = Array.tabulate(8)(i => ((n * (i + 3) + byteAt(i)) % 997).toFloat)
      MediaMeta(id, n, (n % 640).toInt, ((n * 7) % 480).toInt, 3, feats)
    }
  }

  /** Dataset-level decode operator: narrow mapPartitions, one decoder per
    * partition (where a real codec would amortize init cost per batch). */
  def decodeBatch(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) } }
  }

  /** documents.text reinterpreted as an opaque binary payload column. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** mm04: max payload index the downsample may touch (mirrored in the
    * oracle's constant generate_series bound). */
  private val SampleCap = 4096

  /** Shared mm06/mm08 candidate machinery (see mm06's scaladoc for the
    * banding/recall argument): thermometer levels per doc, 4-dim band codes,
    * the per-(band,value) census cap, and DISTINCT-vector pairing verified
    * by exact level-Hamming <= 1. Returns (lv = doc_id + levels, vecPairs =
    * (ka, kb, hamming) over canonical vector keys, each unordered pair
    * once). Pairing DISTINCT vectors keeps candidate work ∝ diversity²; how
    * a consumer expands vector pairs decides whether IT is quadratic —
    * mm06's doc-pair dump is (that is its answer), mm08's per-doc summary
    * never is. */
  private def phashVectors(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val spark = s
    import spark.implicits._
    val media = mediaTable(s, d).as[(Long, Array[Byte])]
    // levels are consumed 2-3x downstream (banding + the consumer's doc
    // expansion/census); persisting the tiny doc_id+8-longs frame stops the
    // decode + parquet scan re-running per consumer (Bench clears caches
    // between queries; at 100 TB this is exactly the intermediate worth
    // caching — ~100 bytes/doc, independent of payload size)
    val lv = decodeBatch(media)
      .select(col("doc_id"), levelsCol(col("features")).as("levels"))
      .persist()
    (lv, vecPairsFrom(lv))
  }

  /** mm10's gate thresholds, shared with the streaming twin
    * ([[graft.streaming.StreamingMmCurate]] → [[MmIngest]]). */
  private[ops] val CurFrame = 64
  private[ops] val CurVoiceT = 57000L // mm07's frame-energy threshold
  private[ops] val CurDeltaCap = 12000L // shot gate: ≈ fixture p95 delta

  /** mm10's ONE-corpus-pass gate stage over a (doc_id, source, text)
    * relation: FrameEnergies rides the scan projection, the typed decode
    * kernel (mm02's slot — a real codec swaps in here) maps the payload to
    * the stub features, quantized to pHash levels. Output columns:
    * doc_id, source, byte_len, levels, dec_ok, en_ok, sh_ok, vk — the
    * frame-energies array (`es`) is consumed by the three flags and
    * DROPPED before return (guide §2.3), a contract shared with
    * [[MmIngest]]/StreamingMmCurate. Factored so the batch capstone and
    * [[MmIngest.curateBatch]]'s micro-batches run the IDENTICAL gate
    * pass. */
  private[graft] def curationFlags(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val decoded = docs
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"),
        graft.spark.FrameEnergies.column(col("text"), CurFrame, 96).as("es"))
      .as[(Long, String, Array[Byte], Array[Long])]
      .mapPartitions { it => it.map { case (id, src, bytes, es) =>
        val m = FakeDecoder.decode(id, bytes)
        (id, src, m.byte_len, m.features.map(f => f.toLong * 9 / 997), es)
      }}
      .toDF("doc_id", "source", "byte_len", "levels", "es")
    val nFrames = size(col("es"))
    val voiced = size(filter(col("es"), e => e >= CurVoiceT))
    val shifted = (off: Int) =>
      slice(col("es"), lit(off), greatest(size(col("es")) - 1, lit(0)))
    val maxDelta = coalesce(
      array_max(zip_with(shifted(2), shifted(1), (a, b) => abs(a - b))), lit(0L))
    decoded
      .withColumn("dec_ok", nFrames >= 1)
      .withColumn("en_ok", col("dec_ok") && voiced * 2 >= nFrames)
      .withColumn("sh_ok", col("en_ok") && maxDelta <= CurDeltaCap)
      .withColumn("vk", concat_ws(",", col("levels")))
      // the energies array is consumed entirely by the three flags above —
      // dropping it here keeps it out of the persisted gate relation, the
      // pHash window shuffle, and the streamed store writes (guide §2.3:
      // project before the exchange; ~frames×8 bytes/doc saved everywhere)
      .drop("es")
  }

  /** mm10's full per-doc verdict relation: gates + exact-pHash canonical
    * window + the greedy hamming-1 near-dup drop. Returns (flagged, fin):
    * `flagged` is the PERSISTED single-corpus-pass gate relation (the
    * caller unpersists once `fin`'s consumers have materialized), `fin`
    * adds ph_ok / nd_ok. Factored so the streaming-twin tie spec can pin
    * [[MmIngest]]'s admitted DOC SET (not just the attrition counts)
    * against the batch composition. */
  private[graft] def curationVerdicts(docs: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val flagged = curationFlags(docs)
      .persist() // read by the window, the banded relation, and the agg
    // exact pHash dedup: pp02/pp04's survivors-first fingerprint window
    val wVk = Window.partitionBy(col("vk"))
      .orderBy(col("sh_ok").desc, col("doc_id"))
    val ph = flagged
      .withColumn("ph_ok", col("sh_ok") && row_number().over(wVk) === 1)
    // near-dup keep-first: band the SURVIVOR levels (not the corpus —
    // membership is a function of the pipeline, and the census cap must
    // see the population the dedup actually runs on), expand hamming-1
    // vector pairs over their canonical docs, drop the larger
    val near1 = vecPairsFrom(
        flagged.filter(col("sh_ok")).select(col("doc_id"), col("levels")))
      .filter(col("hamming") === 1)
    val canon = ph.filter(col("ph_ok")).select(col("vk"), col("doc_id"))
    val ndDrop = near1
      .join(canon.select(col("vk").as("ka"), col("doc_id").as("da")), "ka")
      .join(canon.select(col("vk").as("kb"), col("doc_id").as("db")), "kb")
      .select(greatest(col("da"), col("db")).as("doc_id")).distinct()
      .withColumn("nd_hit", lit(1))
    val fin = ph.join(ndDrop, Seq("doc_id"), "left")
      .withColumn("nd_ok", col("ph_ok") && col("nd_hit").isNull)
    (flagged, fin)
  }

  /** mm10's stage names, in pipeline order (index = stage_ord). */
  private[graft] val CurationStages = Seq("raw", "framed", "energy", "shots",
    "exact_phash", "near_dedup")

  /** Explode a per-source (c0..c5, b0..b5) count frame into mm10's output
    * shape (source, stage_ord, stage, n_docs, n_bytes), ordered — shared
    * with [[MmIngest.attrition]] so the streamed store reports attrition in
    * the batch capstone's exact schema. */
  private[graft] def attritionRows(g: DataFrame): DataFrame = g
    .select(col("source"), explode(array(CurationStages.zipWithIndex.map {
      case (nm, i) =>
        struct(lit(i.toLong).as("stage_ord"), lit(nm).as("stage"),
          col(s"c$i").cast("bigint").as("n_docs"),
          col(s"b$i").cast("bigint").as("n_bytes"))
    }: _*)).as("r"))
    .select(col("source"), col("r.stage_ord").as("stage_ord"),
      col("r.stage").as("stage"), col("r.n_docs").as("n_docs"),
      col("r.n_bytes").as("n_bytes"))
    .orderBy(col("source"), col("stage_ord"))

  /** The banded hamming-≤1 DISTINCT-VECTOR pair relation over any
    * `(doc_id, levels)` frame — mm06/mm08's candidate machinery factored so
    * compositions (mm10's survivor-scoped dedup, the streaming twin) band
    * whatever level population they own instead of the whole corpus. */
  /** pHash band geometry: 2 bands × 4 level dims, band value = the base-9
    * packed slice (injective — unlike the MinHash xxhash64 band keys, a
    * key collision IS a slice match). One definition for the batch
    * relation and [[graft.streaming.StreamingPhashNearDup]]'s buckets. */
  private[graft] val PhashBands = 2
  private[graft] val PhashBandWidth = 4

  /** The 2-element band-code array for a levels column. */
  private[graft] def phashBandsCol(levels: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(PhashBands - 1)), b =>
      get(levels, b * 4) * 729 + get(levels, b * 4 + 1) * 81 +
        get(levels, b * 4 + 2) * 9 + get(levels, b * 4 + 3))

  /** FakeDecoder feature → thermometer level quantization (9 levels). */
  private[graft] def levelsCol(features: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(features, x => floor(x.cast("long") * 9 / 997).cast("long"))

  private[ops] def vecPairsFrom(lv: DataFrame): DataFrame = {
    val Cap = 4096L
    val bands = lv.select(col("doc_id"), col("levels"),
      posexplode(phashBandsCol(col("levels"))).as(Seq("b", "bv")))
    val census = bands.groupBy(col("b"), col("bv")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= Cap).select(col("b"), col("bv"))
    val kept = bands.join(broadcast(census), Seq("b", "bv"))
    val vkey = concat_ws(",", col("levels")) // canonical orderable key
    val vecs = kept.select(col("b"), col("bv"), vkey.as("vk"), col("levels"))
      .dropDuplicates("b", "bv", "vk")
    val va = vecs.select(col("b"), col("bv"), col("vk").as("ka"), col("levels").as("la"))
    val vb = vecs.select(col("b"), col("bv"), col("vk").as("kb"), col("levels").as("lb"))
    val ham = aggregate(zip_with(col("la"), col("lb"), (p, q) => abs(p - q)),
      lit(0L), (a, v) => a + v)
    val vecPairs = va.join(vb, Seq("b", "bv")).filter(col("ka") <= col("kb"))
      .select(col("ka"), col("kb"), col("la"), col("lb"))
      .dropDuplicates("ka", "kb") // a pair can qualify via both bands
      .withColumn("hamming", ham).filter(col("hamming") <= 1)
      .select(col("ka"), col("kb"), col("hamming"))
    vecPairs
  }

  val entries: Seq[Q] = Seq(
    // ---- mm01: metadata extraction over binary payloads (exact oracle) ----
    Q("mm01_media_meta",
      (s, d) => {
        val m = mediaTable(s, d)
        val len = length(col("payload")).cast("bigint")
        m.select(col("doc_id"),
            len.as("byte_len"),
            sha2(col("payload"), 256).as("sha"),
            (len % 640).as("width"),
            (len * 7 % 480).as("height"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
          sha256(text) AS sha,
          octet_length(encode(text)) % 640 AS width,
          octet_length(encode(text)) * 7 % 480 AS height
          FROM documents ORDER BY doc_id""")),

    // ---- mm03: frame sampling — fixed-stride windows over the binary payload ----
    // The Spark shape of video frame-sampling: slice the opaque payload at a
    // fixed stride, fingerprint each window (map-only, payload column never
    // shuffled). Exact oracle via BLOB substr + sha256.
    Q("mm03_frame_sample",
      (s, d) => {
        val m = mediaTable(s, d)
        val frames = posexplode(transform(sequence(lit(0), lit(3)), i =>
          sha2(substring(col("payload"), (i * 64 + 1).cast("int"), lit(64)), 256)))
        m.select(col("doc_id"), frames.as(Seq("frame", "sha")))
          .orderBy(col("doc_id"), col("frame"))
      },
      // corpus is pure ASCII, so char slicing == byte slicing (checked)
      Some("""SELECT doc_id, i AS frame, sha256(substring(text, i*64+1, 64)) AS sha
          FROM documents, generate_series(0, 3) AS t(i)
          ORDER BY doc_id, frame""")),

    // ---- mm02: typed batch-decode pipeline ----
    // The decode KERNEL is a stub (offline container), but the stub is
    // deterministic integer arithmetic over the payload bytes — so the whole
    // pipeline (binary column -> mapPartitions decode -> typed projection) has
    // an exact SQL oracle: the corpus is pure ASCII, so byte k of the payload
    // is ascii(substring(text, k+1, 1)).
    Q("mm02_media_decode",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val media = mediaTable(s, d).as[(Long, Array[Byte])]
        decodeBatch(media)
          .select(col("doc_id"), col("byte_len"), col("width"), col("height"), col("channels"),
            round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 2).as("feat_sum"))
          .orderBy(col("doc_id"))
      },
      // FakeDecoder.decode: feats[i] = (n*(i+3) + byte[(i*31) % n]) % 997 for
      // i in 0..7; width = n % 640; height = n*7 % 480; channels = 3.
      Some("""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        f AS (SELECT doc_id,
                sum((n*(i+3) + ascii(substring(text, ((i*31) % n) + 1, 1))) % 997) AS fs
              FROM m, generate_series(0, 7) AS t(i) GROUP BY doc_id)
        SELECT m.doc_id, n AS byte_len, n % 640 AS width, n*7 % 480 AS height,
          3 AS channels, round(CAST(fs AS DOUBLE), 2) AS feat_sum
        FROM m JOIN f USING (doc_id) ORDER BY m.doc_id""")),

    // ---- mm04: resize — aspect-preserving target dims + stride-downsampled ----
    // ---- payload fingerprint ----
    // The Spark shape of image/video resizing: pure per-row arithmetic for the
    // output geometry (fit the stub WxH into a 224-box, integer math so the
    // oracle is exact) plus a 1-D "pixel" downsample of the opaque payload —
    // every k-th byte, k sized so ~256 samples survive — fingerprinted per
    // row. Map-only; the payload column never shuffles; a real kernel swaps
    // into the same slot as FakeDecoder does for mm02.
    Q("mm04_resize",
      (s, d) => {
        val docs = Tables.spread(t(s, d, "documents"))
        val n = length(col("text")).cast("bigint") // ASCII corpus: chars == bytes
        val w = n % 640
        val h = (n * 7) % 480
        val mx = greatest(w, h, lit(1L))
        val k = floor((n + 255) / lit(256)).cast("bigint") // ceil(n/256)
        // SampleCap bounds the sampled index range on BOTH sides (the oracle's
        // generate_series can only take a constant): a defined part of the
        // operator like Dedup.DfCap, not an implicit assumption — payloads
        // longer than the cap are fingerprinted over their first SampleCap
        // bytes (corpus max is 577, so it never binds on testdata). An empty
        // payload (n=0 => stride 0, sequence would throw) fingerprints "".
        val ds = when(n === 0, lit("")).otherwise(array_join(
          transform(sequence(lit(1L), least(n, lit(SampleCap.toLong)), k),
            i => col("text").substr(i.cast("int"), lit(1))), ""))
        docs.select(col("doc_id"), w.as("width"), h.as("height"),
            floor(w * 224 / mx).cast("bigint").as("out_w"),
            floor(h * 224 / mx).cast("bigint").as("out_h"),
            md5(ds).as("ds_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        dims AS (SELECT doc_id, n, n % 640 AS w, n*7 % 480 AS h FROM m),
        idx AS (SELECT i FROM generate_series(1, 4096) AS t(i)),
        ds AS (SELECT m.doc_id,
                 string_agg(substring(m.text, CAST(i AS INT), 1), '' ORDER BY i) AS dstr
               FROM m JOIN idx ON i <= least(m.n, 4096) AND ((i - 1) % ((m.n + 255) // 256)) = 0
               GROUP BY m.doc_id)
        SELECT d.doc_id, w AS width, h AS height,
          w*224 // greatest(w, h, 1) AS out_w,
          h*224 // greatest(w, h, 1) AS out_h,
          md5(dstr) AS ds_md5
        FROM dims d JOIN ds USING (doc_id) ORDER BY doc_id""")),

    // ---- mm05: feature extraction — per-payload feature vector statistics ----
    // Runs the typed Dataset decode operator (the same mapPartitions kernel
    // slot as mm02) and reduces the 8-dim stub feature vector to L2 norm and
    // argmax — the metadata a training pipeline keeps when the raw vector
    // moves to a separate embedding table. Integer-exact stub arithmetic =>
    // exact oracle.
    Q("mm05_features",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val media = mediaTable(s, d).as[(Long, Array[Byte])]
        val f = transform(col("features"), x => x.cast("long"))
        decodeBatch(media)
          .select(col("doc_id"), f.as("f"))
          // raw norm (sqrt of identical integer sums is bit-identical in both
          // engines; engine-side round() can flip at ulp boundaries)
          .select(col("doc_id"),
            sqrt(aggregate(col("f"), lit(0L), (a, x) => a + x * x).cast("double")).as("feat_norm"),
            (array_position(col("f"), array_max(col("f"))) - 1).cast("bigint").as("feat_argmax"),
            array_max(col("f")).as("feat_max"),
            array_min(col("f")).as("feat_min"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        f AS (SELECT doc_id, i,
                (n*(i+3) + ascii(substring(text, ((i*31) % n) + 1, 1))) % 997 AS v
              FROM m, generate_series(0, 7) AS t(i)),
        agg AS (SELECT doc_id, sqrt(CAST(sum(v*v) AS DOUBLE)) AS feat_norm,
                  max(v) AS feat_max, min(v) AS feat_min FROM f GROUP BY doc_id),
        am AS (SELECT f.doc_id, min(i) AS feat_argmax
               FROM f JOIN agg USING (doc_id) WHERE v = feat_max GROUP BY f.doc_id)
        SELECT a.doc_id, feat_norm, feat_argmax, feat_max, feat_min
        FROM agg a JOIN am USING (doc_id) ORDER BY a.doc_id""")),

    // ---- mm06: image near-dup pairs via thermometer-coded perceptual hash ----
    // The image-dedup step of a multimodal pipeline: quantize each decoded
    // feature dim into 9 thermometer levels (locality-sensitive for L1 —
    // adjacent feature values differ by one level), block on 4-dim band codes
    // (2 bands of 9^4 = 6561 values — the dd05/SimHash banding shape on the
    // DECODED features instead of text), then verify candidates by exact
    // level-Hamming <= 1. Recall is EXACT by pigeonhole: a qualifying pair
    // differs in at most one dim, so its other band matches verbatim —
    // banding prunes candidates (9153 -> 1901 at sf0.01) without changing
    // the answer. Pair work is banded, never all-pairs; the per-(band,value)
    // census cap bounds the worst bucket like ss02's LabelCap. Band
    // resolution is the occupancy dial and MUST grow with the corpus (finer
    // levels / more dims per band, pigeonhole-trading the guaranteed radius)
    // — a 2-dim 81-value band space already saturates at the sf1 smoke
    // (50k docs -> a 52 s hot-bucket task), which is what forced 4-dim
    // bands here. The decode kernel is the same FakeDecoder stub slot as
    // mm02/mm05 (integer arithmetic => exact oracle).
    // Pair DISTINCT LEVEL VECTORS, not documents (phashVectors). The stub
    // features collapse many docs onto identical 8-dim level vectors (the
    // regenerated sf1 fixture puts ~1.6k docs in one band value but only
    // ~dozens of distinct vectors there), so doc-level pairing burns
    // occupancy² candidate work (51M pairs, a 21 s straggler at sf1) to
    // rediscover the same vector-pair hamming over and over. Vector-level
    // pairing makes candidate work ∝ vector diversity², and the doc-pair
    // EXPANSION below is proportional to the true answer — the only
    // quadratic left is the output itself (mm08 is the summary that avoids
    // even that). Membership is vector-determined (a vector's band codes
    // are a function of the vector), so expanding a kept vector pair over
    // its doc lists reproduces the doc-level algorithm exactly.
    Q("mm06_phash_neardup",
      (s, d) => {
        val (lv, vecPairs) = phashVectors(s, d)
        val vkey = concat_ws(",", col("levels"))
        val dA = lv.select(vkey.as("ka"), col("doc_id").as("da"))
        val dB = lv.select(vkey.as("kb"), col("doc_id").as("db"))
        vecPairs.join(dA, "ka").join(dB, "kb")
          // identical-vector pairs (ka = kb) cross the group with itself:
          // keep each unordered doc pair once and drop self-pairs; distinct
          // vector pairs already yield each doc pair exactly once
          .filter(col("ka") =!= col("kb") || col("da") < col("db"))
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
          f AS (SELECT doc_id, i,
                  (n*(i+3) + ascii(substring(text, ((i*31) % n) + 1, 1))) % 997 AS v
                FROM m, generate_series(0, 7) AS t(i)),
          lv AS (SELECT doc_id, i, (v*9)//997 AS l FROM f),
          bd AS (SELECT doc_id, i//4 AS b,
                   CAST(sum(l * CASE i%4 WHEN 0 THEN 729 WHEN 1 THEN 81
                                         WHEN 2 THEN 9 ELSE 1 END) AS BIGINT) AS bv
                 FROM lv GROUP BY doc_id, i//4),
          keptb AS (SELECT b, bv FROM bd GROUP BY b, bv HAVING count(*) <= 4096),
          bk AS (SELECT bd.* FROM bd JOIN keptb USING (b, bv)),
          cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                   FROM bk x JOIN bk y ON x.b = y.b AND x.bv = y.bv
                     AND x.doc_id < y.doc_id),
          ham AS (SELECT doc_a, doc_b, CAST(sum(abs(xa.l - xb.l)) AS BIGINT) AS hamming
                  FROM cand
                  JOIN lv xa ON xa.doc_id = cand.doc_a
                  JOIN lv xb ON xb.doc_id = cand.doc_b AND xb.i = xa.i
                  GROUP BY doc_a, doc_b)
        SELECT doc_a, doc_b, hamming FROM ham
        WHERE hamming <= 1 ORDER BY doc_a, doc_b""")),

    // ---- mm08: per-doc near-dup SUMMARY — the scale path past mm06's pair ----
    // dump. mm06's only remaining quadratic is its OUTPUT (~5.1M true pairs
    // at sf1; at 100x that relation itself is the bottleneck). The dedup
    // decision needs per-doc facts, not the pair list: exact-dup count,
    // near-dup (hamming=1) count, and a canonical flag (smallest doc id of
    // the exact group survives). All three compute WITHOUT expanding a
    // single doc pair: n_exact = the doc's vector-group size - 1 (identical
    // levels <=> hamming 0); n_near = the sum of partner-vector group sizes
    // over the banded hamming-1 VECTOR pairs (vector-level relation, ∝
    // diversity²); is_canonical = doc_id = min(group). Output is one row
    // per doc — linear in the corpus at any scale.
    Q("mm08_phash_summary",
      (s, d) => {
        val (lv, vecPairs) = phashVectors(s, d)
        val vkey = concat_ws(",", col("levels"))
        val docsPerVec = lv.select(vkey.as("vk"), col("doc_id"))
        val vcount = docsPerVec.groupBy("vk")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        val near1 = vecPairs.filter(col("hamming") === 1)
        val nearBoth = near1.select(col("ka").as("vk"), col("kb").as("pk"))
          .union(near1.select(col("kb").as("vk"), col("ka").as("pk")))
        val nearCnt = nearBoth
          .join(vcount.select(col("vk").as("pk"), col("n_docs").as("pn")), "pk")
          .groupBy("vk").agg(sum(col("pn")).as("near_sum"))
        docsPerVec.join(vcount, "vk").join(nearCnt, Seq("vk"), "left")
          .select(col("doc_id"),
            (col("n_docs") - 1).as("n_exact"),
            coalesce(col("near_sum"), lit(0L)).as("n_near"),
            (col("doc_id") === col("min_doc")).as("is_canonical"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
          f AS (SELECT doc_id, i,
                  (n*(i+3) + ascii(substring(text, ((i*31) % n) + 1, 1))) % 997 AS v
                FROM m, generate_series(0, 7) AS t(i)),
          lv AS (SELECT doc_id, i, (v*9)//997 AS l FROM f),
          vkt AS (SELECT doc_id, string_agg(l, ',' ORDER BY i) AS vk FROM lv GROUP BY doc_id),
          vcnt AS (SELECT vk, count(*) AS n_docs, min(doc_id) AS min_doc FROM vkt GROUP BY vk),
          bd AS (SELECT doc_id, i//4 AS b,
                   CAST(sum(l * CASE i%4 WHEN 0 THEN 729 WHEN 1 THEN 81
                                         WHEN 2 THEN 9 ELSE 1 END) AS BIGINT) AS bv
                 FROM lv GROUP BY doc_id, i//4),
          keptb AS (SELECT b, bv FROM bd GROUP BY b, bv HAVING count(*) <= 4096),
          bkv AS (SELECT DISTINCT b, bv, vk
                  FROM bd JOIN keptb USING (b, bv) JOIN vkt USING (doc_id)),
          lvv AS (SELECT DISTINCT vk, i, l FROM lv JOIN vkt USING (doc_id)),
          vp AS (SELECT DISTINCT x.vk AS ka, y.vk AS kb
                 FROM bkv x JOIN bkv y ON x.b = y.b AND x.bv = y.bv AND x.vk < y.vk),
          vham AS (SELECT ka, kb, CAST(sum(abs(a.l - b.l)) AS BIGINT) AS hamming
                   FROM vp JOIN lvv a ON a.vk = vp.ka
                   JOIN lvv b ON b.vk = vp.kb AND b.i = a.i
                   GROUP BY ka, kb),
          near1 AS (SELECT ka, kb FROM vham WHERE hamming = 1),
          nboth AS (SELECT ka AS vk, kb AS pk FROM near1
                    UNION ALL SELECT kb, ka FROM near1),
          ncnt AS (SELECT nboth.vk, CAST(sum(c.n_docs) AS BIGINT) AS near_sum
                   FROM nboth JOIN vcnt c ON c.vk = nboth.pk GROUP BY nboth.vk)
        SELECT t.doc_id,
          v.n_docs - 1 AS n_exact,
          COALESCE(n.near_sum, 0) AS n_near,
          t.doc_id = v.min_doc AS is_canonical
        FROM vkt t JOIN vcnt v USING (vk) LEFT JOIN ncnt n USING (vk)
        ORDER BY t.doc_id""")),

    // ---- mm07: audio activity segmentation (VAD-style gaps-and-islands) ----
    // The audio-pipeline pre-step: frame the waveform, score per-frame
    // energy, and merge consecutive active frames into segments (what a
    // voice-activity detector feeds to a transcription/training pipeline).
    // The decode is the family's deterministic stub — the payload's chars
    // stand in for PCM samples (amplitude = ascii-96, exact integer math both
    // engines); a real build swaps in a codec behind the same frame/energy/
    // segment plumbing. Shapes: framing + energy are a narrow map (64-sample
    // non-overlapping frames; the frame transform materializes in its own
    // projection and explodes with posexplode_outer — the dd08 lessons);
    // island detection is the ses01 gaps-and-islands form, every window
    // PARTITIONED by doc_id (parallel at any corpus size, no global step).
    // Integer energies make the threshold replay-safe cross-engine.
    Q("mm07_audio_segments",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val F = 64
        val T = 57000L // ≈ median frame energy of the fixture: splits frames
        // framing + energy fused into ONE codegen'd pass over the text
        // (graft.spark.FrameEnergies) — replaces the former HOF pipeline
        // (frame-substring array + 64 interpreted lambda steps per frame);
        // bit-equal by AudioKernelSpec, ~6x on the energy stage. A real
        // codec would slot in behind the same kernel signature.
        val frames = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            graft.spark.FrameEnergies.column(col("text"), F, 96).as("es"))
          // posexplode_outer keeps sub-frame docs as a null row (dropped by
          // the threshold filter below) — same shape the HOF form had
          .select(col("doc_id"), posexplode_outer(col("es")).as(Seq("frame", "e")))
          .select(col("doc_id"), col("frame").cast("bigint").as("frame"), col("e"))
        val voiced = frames.filter(col("e") >= T)
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("frame"))
        val wSeg = Window.partitionBy(col("doc_id")).orderBy(col("start_frame"))
        voiced
          .withColumn("isl", col("frame") - row_number().over(wDoc))
          .groupBy(col("doc_id"), col("isl"))
          .agg(min(col("frame")).as("start_frame"), max(col("frame")).as("end_frame"),
            count(lit(1)).as("n_frames"), sum(col("e")).as("energy"))
          .select(col("doc_id"),
            (row_number().over(wSeg) - 1).cast("bigint").as("seg_id"),
            col("start_frame"), col("end_frame"), col("n_frames"), col("energy"))
          .orderBy(col("doc_id"), col("seg_id"))
      },
      Some("""WITH f AS (SELECT doc_id,
              unnest(list_transform(range(length(text)//64), j ->
                {'frame': j, 'e': list_sum(list_transform(range(64), i ->
                  CAST((ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) *
                       (ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) AS BIGINT)))})) AS u
            FROM documents),
          v AS (SELECT doc_id, u.frame AS frame, u.e AS e FROM f WHERE u.e >= 57000),
          i AS (SELECT *, frame - row_number()
                  OVER (PARTITION BY doc_id ORDER BY frame) AS isl FROM v),
          g AS (SELECT doc_id, min(frame) AS start_frame, max(frame) AS end_frame,
                  count(*) AS n_frames, CAST(sum(e) AS BIGINT) AS energy
                FROM i GROUP BY doc_id, isl)
        SELECT doc_id,
          row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1 AS seg_id,
          start_frame, end_frame, n_frames, energy
        FROM g ORDER BY doc_id, seg_id""")),

    // ---- mm09: video shot-boundary detection — consecutive-frame deltas ----
    // The video-pipeline pre-step next to mm03's frame sampling: score each
    // 64-byte frame (the same fused FrameEnergies kernel as mm07 — a real
    // decoder swaps in behind the same array-of-frame-scores signature),
    // then flag a SHOT BOUNDARY wherever the absolute energy delta between
    // consecutive frames exceeds a threshold — the histogram-difference
    // shot detector reshaped for columnar execution. Everything happens
    // INSIDE one row: deltas are a zip_with of the energy array against
    // itself shifted by one (slice guards use the unconditional
    // greatest(n-1,0) length — empty for sub-2-frame docs — not a when(),
    // which would block codegen subexpression reuse, the shinglesFromWh
    // lesson), so the operator is a pure narrow map: no explode, no window,
    // no shuffle of any kind before the output sort. Per-doc facts
    // (n_frames, n_shots = boundaries+1, max_delta) are what a curation
    // pipeline keeps; T=6000 ≈ the p75 frame delta of the fixture corpus.
    Q("mm09_shot_detect",
      (s, d) => {
        val F = 64
        val T = 6000L
        // energies materialize in their OWN projection: `es` is referenced
        // 4x downstream and HOF lambdas get no common-subexpression
        // elimination (the withShingles lesson)
        val base = Tables.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            graft.spark.FrameEnergies.column(col("text"), F, 96).as("es"))
        val shifted = (off: Int) =>
          slice(col("es"), lit(off), greatest(size(col("es")) - 1, lit(0)))
        base
          .select(col("doc_id"), col("es"),
            zip_with(shifted(2), shifted(1), (a, b) => abs(a - b)).as("ds"))
          .select(col("doc_id"),
            size(col("es")).cast("bigint").as("n_frames"),
            when(size(col("es")) === 0, lit(0L))
              .otherwise(size(filter(col("ds"), x => x > T)) + 1)
              .cast("bigint").as("n_shots"),
            coalesce(array_max(col("ds")), lit(0L)).as("max_delta"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id,
              unnest(list_transform(range(length(text)//64), j ->
                {'frame': j, 'e': list_sum(list_transform(range(64), i ->
                  CAST((ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) *
                       (ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) AS BIGINT)))})) AS u
            FROM documents),
          fr AS (SELECT doc_id, u.frame AS frame, u.e AS e FROM f),
          de AS (SELECT doc_id,
                   abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY frame)) AS d
                 FROM fr),
          agg AS (SELECT doc_id, count(*) AS n_frames,
                    CAST(1 + coalesce(sum(CASE WHEN d > 6000 THEN 1 END), 0) AS BIGINT)
                      AS n_shots,
                    CAST(coalesce(max(d), 0) AS BIGINT) AS max_delta
                  FROM de GROUP BY doc_id)
        SELECT m.doc_id, coalesce(n_frames, 0) AS n_frames,
          coalesce(n_shots, 0) AS n_shots, coalesce(max_delta, 0) AS max_delta
        FROM documents m LEFT JOIN agg USING (doc_id)
        ORDER BY m.doc_id""")),

    // ---- mm10: the MULTIMODAL pipeline capstone — pp04's flagged-single- ----
    // ---- pass composition for the media family ----
    // Every other mm row is single-purpose; this is the end-to-end curation
    // pass a multimodal training pipeline runs, composed from the family's
    // own proven stages with per-SOURCE attrition accounting:
    //
    //   raw → framed (decode yields ≥1 full 64-sample frame)
    //       → energy gate (mm07's VAD signal: ≥ half the frames voiced)
    //       → shot gate (mm09's boundary signal: max |Δenergy| ≤ 12000 —
    //         "corrupt/cut-heavy media"; ≈ fixture p95)
    //       → exact pHash dedup (mm08's canonical rule: min doc of each
    //         identical level-vector group survives, survivors-first)
    //       → near-dup keep-first (mm06/mm08's banded hamming-1 vector
    //         relation over the SURVIVOR population, greedy drop of the
    //         larger canonical doc of every pair)
    //
    // pp04's discipline throughout: ONE corpus pass computes every per-doc
    // gate input (payload decode via the mm02 kernel slot + the fused
    // FrameEnergies kernel in the same projection), stage flags are
    // conditional columns on that persisted relation, the near-dup drop set
    // is id-only/broadcast-sized, and no stage re-scans the corpus. The
    // thresholds are integer/exact (voiced*2 >= n_frames, not a float
    // fraction) so the DuckDB replay is bit-exact. Scale: the banding is
    // vecPairsFrom's census-capped vector-level relation (∝ diversity², and
    // over the gate SURVIVORS only — strictly smaller than mm06's corpus
    // population); output is n_sources × 6 rows at any corpus size.
    Q("mm10_multimodal_pipeline",
      (s, d) => {
        // the shared single-corpus-pass gate + verdict composition (the
        // streaming twin MmIngest runs the same factored stages per
        // micro-batch; the tie is spec-pinned in MmCurateStreamingSpec)
        val (flagged, fin) = curationVerdicts(Tables.spread(t(s, d, "documents")))
        // per-source attrition: ONE conditional aggregation (six stages ×
        // n_sources rows), stage rows exploded from the combined row
        def bIf(c: org.apache.spark.sql.Column) =
          coalesce(sum(when(c, col("byte_len")).otherwise(0L)), lit(0L))
        val g = fin.groupBy(col("source")).agg(
          count(lit(1)).as("c0"), coalesce(sum(col("byte_len")), lit(0L)).as("b0"),
          count_if(col("dec_ok")).as("c1"), bIf(col("dec_ok")).as("b1"),
          count_if(col("en_ok")).as("c2"), bIf(col("en_ok")).as("b2"),
          count_if(col("sh_ok")).as("c3"), bIf(col("sh_ok")).as("b3"),
          count_if(col("ph_ok")).as("c4"), bIf(col("ph_ok")).as("b4"),
          count_if(col("nd_ok")).as("c5"), bIf(col("nd_ok")).as("b5"))
        val out = attritionRows(g)
          // eager checkpoint (dc03/pp04's convention) so the corpus-pass
          // cache releases here — the checkpoint holds 6 × n_sources rows
          .localCheckpoint()
        flagged.unpersist(false)
        out
      },
      // The oracle replays every stage with the family's own SQL fragments:
      // mm07/mm09's frame-energy CTE, mm02's stub-decode arithmetic,
      // mm08's level/banding/census CTEs (cap mirrored), the pp02 window,
      // and the greedy greatest-doc drop rule.
      Some("""WITH m AS (SELECT doc_id, source, text,
              octet_length(encode(text)) AS n FROM documents),
          f0 AS (SELECT doc_id,
              unnest(list_transform(range(length(text)//64), j ->
                {'frame': j, 'e': list_sum(list_transform(range(64), i ->
                  CAST((ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) *
                       (ascii(substr(text, CAST(j*64+i+1 AS INTEGER), 1)) - 96) AS BIGINT)))})) AS u
            FROM m),
          fr AS (SELECT doc_id, u.frame AS frame, u.e AS e FROM f0),
          de AS (SELECT doc_id,
                   abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY frame)) AS d
                 FROM fr),
          fs AS (SELECT doc_id, count(*) AS nf,
                   sum(CASE WHEN e >= 57000 THEN 1 ELSE 0 END) AS nv
                 FROM fr GROUP BY doc_id),
          md AS (SELECT doc_id, coalesce(max(d), 0) AS mdl FROM de GROUP BY doc_id),
          flg AS (SELECT m.doc_id, m.source, m.n,
                    coalesce(nf, 0) >= 1 AS dec_ok,
                    (coalesce(nf, 0) >= 1 AND coalesce(nv, 0)*2 >= nf) AS en_ok,
                    (coalesce(nf, 0) >= 1 AND coalesce(nv, 0)*2 >= nf
                       AND coalesce(mdl, 0) <= 12000) AS sh_ok
                  FROM m LEFT JOIN fs USING (doc_id) LEFT JOIN md USING (doc_id)),
          fz AS (SELECT m.doc_id, i,
                   (n*(i+3) + ascii(substring(text, ((i*31) % n) + 1, 1))) % 997 AS v
                 FROM m, generate_series(0, 7) AS t(i)),
          lv AS (SELECT doc_id, i, (v*9)//997 AS l FROM fz),
          vkt AS (SELECT doc_id, string_agg(l, ',' ORDER BY i) AS vk
                  FROM lv GROUP BY doc_id),
          e2 AS (SELECT flg.*, vkt.vk,
                   flg.sh_ok AND row_number() OVER (PARTITION BY vk
                     ORDER BY sh_ok DESC, flg.doc_id) = 1 AS ph_ok
                 FROM flg JOIN vkt USING (doc_id)),
          bd AS (SELECT lv.doc_id, i//4 AS b,
                   CAST(sum(l * CASE i%4 WHEN 0 THEN 729 WHEN 1 THEN 81
                                         WHEN 2 THEN 9 ELSE 1 END) AS BIGINT) AS bv
                 FROM lv JOIN e2 USING (doc_id) WHERE e2.sh_ok
                 GROUP BY lv.doc_id, i//4),
          keptb AS (SELECT b, bv FROM bd GROUP BY b, bv HAVING count(*) <= 4096),
          bkv AS (SELECT DISTINCT b, bv, vk
                  FROM bd JOIN keptb USING (b, bv) JOIN vkt USING (doc_id)),
          lvv AS (SELECT DISTINCT vkt.vk AS vk, i, l
                  FROM lv JOIN vkt USING (doc_id) JOIN e2 USING (doc_id)
                  WHERE e2.sh_ok),
          vp AS (SELECT DISTINCT x.vk AS ka, y.vk AS kb
                 FROM bkv x JOIN bkv y ON x.b = y.b AND x.bv = y.bv AND x.vk < y.vk),
          vham AS (SELECT ka, kb, CAST(sum(abs(a.l - b.l)) AS BIGINT) AS h
                   FROM vp JOIN lvv a ON a.vk = vp.ka
                   JOIN lvv b ON b.vk = vp.kb AND b.i = a.i
                   GROUP BY ka, kb),
          near1 AS (SELECT ka, kb FROM vham WHERE h = 1),
          canon AS (SELECT vk, doc_id FROM e2 WHERE ph_ok),
          nddrop AS (SELECT DISTINCT greatest(ca.doc_id, cb.doc_id) AS doc_id
                     FROM near1 JOIN canon ca ON ca.vk = near1.ka
                     JOIN canon cb ON cb.vk = near1.kb),
          fin AS (SELECT e2.*, e2.ph_ok AND nd.doc_id IS NULL AS nd_ok
                  FROM e2 LEFT JOIN nddrop nd ON nd.doc_id = e2.doc_id),
          g AS (SELECT source,
              count(*) AS c0, CAST(coalesce(sum(n), 0) AS BIGINT) AS b0,
              count(*) FILTER (dec_ok) AS c1,
              CAST(coalesce(sum(n) FILTER (dec_ok), 0) AS BIGINT) AS b1,
              count(*) FILTER (en_ok) AS c2,
              CAST(coalesce(sum(n) FILTER (en_ok), 0) AS BIGINT) AS b2,
              count(*) FILTER (sh_ok) AS c3,
              CAST(coalesce(sum(n) FILTER (sh_ok), 0) AS BIGINT) AS b3,
              count(*) FILTER (ph_ok) AS c4,
              CAST(coalesce(sum(n) FILTER (ph_ok), 0) AS BIGINT) AS b4,
              count(*) FILTER (nd_ok) AS c5,
              CAST(coalesce(sum(n) FILTER (nd_ok), 0) AS BIGINT) AS b5
            FROM fin GROUP BY source)
        SELECT source, stage_ord, stage, n_docs, n_bytes FROM (
          SELECT source, CAST(0 AS BIGINT) AS stage_ord, 'raw' AS stage,
                 c0 AS n_docs, b0 AS n_bytes FROM g
          UNION ALL SELECT source, 1, 'framed', c1, b1 FROM g
          UNION ALL SELECT source, 2, 'energy', c2, b2 FROM g
          UNION ALL SELECT source, 3, 'shots', c3, b3 FROM g
          UNION ALL SELECT source, 4, 'exact_phash', c4, b4 FROM g
          UNION ALL SELECT source, 5, 'near_dedup', c5, b5 FROM g)
        ORDER BY source, stage_ord"""))
  )
}
