package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (the 100 TB checklist, SURVEY.md §4):
  * dimension joins must broadcast, top-k must not globally sort, aggregations
  * must partial-aggregate, compiled-tier filters must push to the parquet
  * scan, and scans must prune to referenced columns. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String = {
    val q = graft.SparkEntry.queries(name)
    q(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("q05 region revenue: all dimension joins broadcast, no sort-merge join") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension joins must not shuffle both sides")
  }

  test("q03 shipping priority: broadcast customer dim") {
    val p = plan("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q08 top orders: TakeOrderedAndProject, not a global sort") {
    val p = plan("q08_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q01 pricing summary: partial (map-side) aggregation present") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), "expected partial aggregate functions in plan")
  }

  test("jx01 compiled tier: predicate pushed to parquet scan") {
    val p = plan("jx01_filter_project")
    assert(p.contains("PushedFilters: [EqualNullSafe(event_type,click)]"), p.take(3000))
    assert(!p.contains("jsonata"), "jx01 must run on the compiled tier, not the interpreter")
    // unreferenced columns (ts, props) must not be read
    assert(!p.contains("props"), "scan must prune unreferenced columns")
  }

  test("jx02 interpreted tier: scan prunes to referenced fields only") {
    val p = plan("jx02_props_extract")
    assert(p.contains("jsonata"), "jx02 ($eval) must use the interpreted tier")
    assert(p.contains("props") && p.contains("event_id"), p.take(3000))
    assert(!p.contains("user_id"), "scan must prune unreferenced columns")
  }

  test("jx10 compiled ^(): native array_sort, no interpreter, scan prunes to read fields") {
    val p = plan("jx10_sorted_embedding")
    assert(!p.contains("jsonata"), "jx10 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("array_sort"), "the sort must be the native array_sort kernel\n" + p.take(2000))
    // the envelope/value pruning must reach the parquet scan: `label` is never
    // read, so the scan schema must exclude it (SURVEY §4.2 — at 100 TB an
    // unpruned scan column is the difference between minutes and hours)
    assert(!p.contains("label"), "scan must prune the unread label column\n" + p.take(2000))
    assert(p.contains("ReadSchema") && p.contains("vec_id"), p.take(2000))
  }

  test("tx02 quality: map-only (no shuffle before the final sort)") {
    val p = plan("tx02_quality")
    // a per-document metric needs only the spread repartition (unsplittable
    // single-row-group inputs must not serialize the regex scoring on one
    // core — guide §2.5 input skew) plus the orderBy exchange
    assert(p.split("Exchange").length - 1 <= 2, p.take(2000))
  }

  test("dd01 exact dedup: partial aggregation on the hash key") {
    val p = plan("dd01_dedup_exact")
    assert(p.contains("partial_"))
  }

  test("dd03 jaccard: hot-shingle cap is a broadcast anti-join; no cartesian") {
    val p = plan("dd03_ngram_jaccard")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "df-cap must anti-join against a broadcast hot set\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), "pairing must stay an equi-join on blocking keys")
  }

  test("dd04 minhash: candidate verification joins, no cartesian; signature is a narrow map") {
    val p = plan("dd04_minhash_lsh")
    assert(!p.contains("CartesianProduct"))
    // the signature must not introduce its own shuffle: only the band self-join,
    // distinct, verification joins and final sort may exchange
    assert(p.contains("InMemoryTableScan"), "shingle arrays should be cached and reused")
  }

  test("ss03 ANN: query side broadcasts; corpus is never cross-joined") {
    val p = plan("ss03_ann_lsh")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("ses01 sessionize: both windows and the session rollup share ONE hash exchange") {
    val p = plan("ses01_sessionize")
    // lag + running sum windows and the (user_id, sess_no) aggregate all run
    // on the user_id partitioning; only the final orderBy adds a range
    // exchange
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      "sessionization must not re-shuffle between its windows and rollup\n" + p.take(3000))
  }

  test("ss07 quantized rescore: candidate top-R prunes map-side before its only shuffle") {
    val p = plan("ss07_quantized_rescore")
    // the LONG-score bounded heap's partial stage = each task keeps its own
    // top-20 per query BEFORE the exchange, so the shuffle carries id-width
    // candidate rows, never the corpus (and never any vector payload) — and
    // unlike the WindowGroupLimit form it replaced, no per-task sort either
    assert(p.contains("partial_topk_by"),
      "candidate selection must partial-prune before the exchange\n" + p.take(3000))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("sp08 fixed sample: global top-N is TakeOrdered, never a full sort") {
    val p = plan("sp08_fixed_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("jx18 regex builtins run compiled: native match-all kernel inside codegen, no interpreter") {
    val df = graft.SparkEntry.queries("jx18_regex_ops")(spark, sfDir)
    df.collect() // finalize the adaptive plan — codegen spans only exist there
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("jsonata"), "jx18 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("regex_match_all"), p.take(3000))
    // the `*(n)` prefix is the whole-stage-codegen marker in the AQE final
    // plan rendering — the kernel's Project must carry it (a CodegenFallback
    // expression would strip the star from its span)
    assert(p.linesIterator.exists(l => l.contains("regex_match_all") && l.contains("*(")),
      "regex kernel must stay inside whole-stage codegen\n" + p.take(3000))
  }

  test("ss09 k-means step: assignment is map-only — the sole corpus-touching exchange is the K*dim recompute") {
    val p = plan("ss09_kmeans_step")
    // allowed exchanges: the seed's TakeOrdered/collect_list singleton, the
    // broadcast, the K*dim recompute agg, and the final orderBy — but NO
    // hashpartitioning on vec_id (that would be a corpus-wide shuffle just
    // to argmin what the broadcast fold already answers in place)
    assert(!p.contains("hashpartitioning(vec_id"),
      "assignment must not shuffle the corpus by vec_id\n" + p.take(3000))
    assert(p.contains("partial_count") || p.contains("partial_"),
      "recompute must partial-aggregate map-side\n" + p.take(2000))
  }

  test("dd10 source overlap: no corpus self-join — pairing expands from the fingerprint agg") {
    val p = plan("dd10_source_overlap")
    assert(!p.contains("SortMergeJoin"),
      "doc-level self-join would be quadratic in the corpus\n" + p.take(3000))
    assert(p.contains("partial_"), "fingerprint census must partial-aggregate")
  }

  test("jx19 arity-3 lambdas run compiled: no interpreter in the plan") {
    val p = plan("jx19_array_relative")
    assert(!p.contains("jsonata"), "jx19 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("transform") || p.contains("filter"), p.take(2000))
  }

  test("jx20 datetime builtins run compiled: date_format/to_timestamp, no interpreter") {
    val p = plan("jx20_datetime")
    assert(!p.contains("jsonata"), "jx20 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("date_format"), "pictured $fromMillis must be a native date_format\n" + p.take(2000))
  }

  test("jx21 multi-pair group-by and jx22 arity-3 map-sift run compiled") {
    val p21 = plan("jx21_multi_group")
    assert(!p21.contains("jsonata"), "jx21 must run on the compiled tier\n" + p21.take(2000))
    assert(p21.contains("map_from_entries"), "literal-key group must build a native map\n" + p21.take(2000))
    val p22 = plan("jx22_map_sift")
    assert(!p22.contains("jsonata"), "jx22 must run on the compiled tier\n" + p22.take(2000))
    assert(p22.contains("map_filter"), "map-$sift must be a native map_filter\n" + p22.take(2000))
  }

  test("jx23 bracket predicates/indexes run compiled: native filter/get, no interpreter") {
    val p = plan("jx23_predicates")
    assert(!p.contains("jsonata"), "jx23 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("filter("), "bracket predicates must be native array filters\n" + p.take(2000))
  }

  test("jx03 now runs on the compiled tier (split+count fused)") {
    val p = plan("jx03_string_ops")
    assert(!p.contains("jsonata"), "jx03 must compile to native Columns\n" + p.take(2000))
  }

  test("jx11 HOF lambdas run on the compiled tier (native transform/filter)") {
    val p = plan("jx11_hof_lambda")
    assert(!p.contains("jsonata"), "jx11 must compile to native Columns\n" + p.take(2000))
  }

  test("jx27 $single runs on the compiled tier (native filter + exactly-one guard)") {
    val p = plan("jx27_single")
    assert(!p.contains("jsonata"), "jx27 must compile to native Columns\n" + p.take(2000))
  }

  test("jx28 lambda $replace runs on the compiled tier (split-stitch + match kernel)") {
    val p = plan("jx28_replace_lambda")
    assert(!p.contains("jsonata"), "jx28 must compile to native Columns\n" + p.take(2000))
    assert(p.contains("regex_match_all"), "the stitch must use the native match kernel\n" + p.take(2000))
  }

  test("jx12 $reduce folds run on the compiled tier (native aggregate)") {
    val p = plan("jx12_reduce_fold")
    assert(!p.contains("jsonata"), "jx12 must compile to native Columns\n" + p.take(2000))
  }

  test("jx13 array shufflers run on the compiled tier (concat/array_distinct/reverse)") {
    val p = plan("jx13_array_shufflers")
    assert(!p.contains("jsonata"), "jx13 must compile to native Columns\n" + p.take(2000))
  }

  test("jx14 object operators run on the compiled tier (per-field keep flags)") {
    val p = plan("jx14_object_ops")
    assert(!p.contains("jsonata"), "jx14 must compile to native Columns\n" + p.take(2000))
  }

  test("jx15 comparator $sort runs on the compiled tier (array_sort comparator)") {
    val p = plan("jx15_comparator_sort")
    assert(!p.contains("jsonata"), "jx15 must compile to native Columns\n" + p.take(2000))
  }

  test("jx16 let-binding preamble runs on the compiled tier (named lambdas inlined)") {
    val p = plan("jx16_named_lambdas")
    assert(!p.contains("jsonata"), "jx16 must compile to native Columns\n" + p.take(2000))
  }

  test("jx07 schema-as-data rewrite runs on the compiled tier (static folding + merge outputs)") {
    // the reference's removeEmail golden-test shape: literal schema object
    // bound, rewritten with $sift/$merge, counted — the schema math folds at
    // compile time and only the row-dependent $sift(value) work survives
    val p = plan("jx07_schema_rewrite")
    assert(!p.contains("jsonata"), "jx07 must compile to native Columns\n" + p.take(2000))
  }

  test("jx17 indexed lambdas run on the compiled tier (indexed transform/filter)") {
    val p = plan("jx17_indexed_lambdas")
    assert(!p.contains("jsonata"), "jx17 must compile to native Columns\n" + p.take(2000))
  }

  test("jx08 variant tier: native variant_get traversal, no JSON re-parse") {
    val p = plan("jx08_variant_props")
    assert(p.contains("variant_get"), p.take(2000))
    assert(!p.contains("from_json") && !p.contains("get_json_object"),
      "variant traversal must not re-parse JSON text")
  }

  test("q06 filter-agg: predicates reach the parquet scan, no join anywhere") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(2000))
    assert(!p.contains("Join"), "q06 is a pure scan+filter+agg\n" + p.take(2000))
    assert(p.contains("partial_"), "aggregate must partial-combine map-side")
  }

  test("q04 EXISTS: planned as a semi join with partial-aggregated counts") {
    val p = plan("q04_late_shipment_priority")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("partial_"))
  }

  test("ss04 IVF: anchors broadcast into assignment; candidate join is a broadcast hash join on the bucket key") {
    val p = plan("ss04_ann_ivf")
    // assignment = broadcast nested loop over the small anchor relation,
    // collapsed map-side by partial aggregation before any exchange
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("partial_"), "argmax assignment must partial-aggregate\n" + p.take(3000))
    // probes join the bucketed corpus on aid — an equi-join, never a cartesian
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("registry-wide: no unpartitioned window outside the documented sp03/sp04/sp05 block-summary prefix sums") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // these three run their ONLY sequential window over a block/bucket
    // summary relation (≈ parallelism rows / ≤65,536 buckets, never the
    // corpus) — single-partition by design; Bench suppresses exactly that
    // WindowExec warning, and THIS test is what keeps the suppression honest
    // for every other query in the registry
    // tx09's only unpartitioned window runs over the 4-row frequency-band
    // summary (the mass-fraction denominator), the same bounded-summary class;
    // sp10's waterfill windows run over the per-source count summary
    // (#sources rows, never the corpus)
    // sp11's only sequential window runs over its ≈parallelism-row rblk
    // summary (second level of the stacked prefix sums), same class as sp03
    val allowed = Set("sp03_pack_shards", "sp04_shuffle_order", "sp05_source_mixture",
      "tx09_zipf", "sp10_unimax_budget", "sp11_curriculum_interleave",
      "sp12_pack_examples", // sp12 = sp03's block-summary window, same class
      "sp17_bpe_pack", // sp17 = sp03's packing keyed by BPE counts, same window
      "pp03_shard_manifest", // pp03 = sp03's block-summary window over survivors
      "pp04_pretraining_pipeline") // pp04's packing = sp12's block-summary window
    def unpartitionedWindows(p: SparkPlan): Seq[String] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
        case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => unpartitionedWindows(a.initialPlan)
        case _ => p.children.flatMap(unpartitionedWindows)
      }
      here ++ below
    }
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(allowed).flatMap { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      val hits = unpartitionedWindows(plan)
      if (hits.nonEmpty) Some(s"$name: ${hits.mkString(",")}") else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned (single-task) windows outside the documented set:\n  ${offenders.mkString("\n  ")}")
  }

  test("mm01 metadata: payload bytes feed the projection, not a shuffle") {
    val p = plan("mm01_media_meta")
    // metadata extraction is map-only + the final orderBy exchange
    assert(p.split("Exchange").length - 1 <= 1, p.take(2000))
  }

  test("jx24 non-path stages run compiled: native truthiness filter, no interpreter") {
    val p = plan("jx24_filtered_calls")
    assert(!p.contains("jsonata"), "jx24 must run on the compiled tier\n" + p.take(2000))
    assert(p.contains("filter("), "stage predicates must be native array filters\n" + p.take(2000))
  }

  test("ss10 PQ+ADC: broadcast codebook/query tables, corpus never sort-merge- or cartesian-joined") {
    val p = plan("ss10_pq_adc")
    // codebook attach + ADC scan are broadcast nested loops over the
    // map-only encode; the only shuffles are the tiny codebook aggregate
    // and the final per-query top-k/order
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "the corpus side must stream map-only\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the encode + candidate scan must be HOF-free: the per-row M×K argmin
    // is the fused pq_encode kernel, the per-pair ADC sum an unrolled
    // element_at chain — an `aggregate(` in the plan means an interpreted
    // CodegenFallback fold crept back into the hot loop
    assert(p.contains("pq_encode"), "encode must use the fused kernel\n" + p.take(2000))
    assert(!p.contains("aggregate("), "no interpreted HOF fold in the scan\n" + p.take(2000))
  }

  test("ss11 IVFADC: map-only assignment+encode, candidates via broadcast probe join") {
    val p = plan("ss11_ivfadc")
    // the stored-relation pass (assignment fold + PQ codes) must not
    // shuffle the corpus: the only joins touching it are the broadcast
    // probe list (aid) and the broadcast query tables (q_id)
    assert(!p.contains("SortMergeJoin"), "the corpus side must never sort-merge\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("ss14 probe serves from the STORED index with dynamic partition pruning on aid") {
    val p = plan("ss14_ivf_probe")
    // the candidate scan must read the aid-partitioned parquet index (not
    // re-encode the corpus), and the broadcast probe join must push the
    // probed aids into that scan as a dynamic partition-pruning filter —
    // only probed buckets' files open at scale
    assert(p.contains("graft_ivf_index"), "must scan the stored index\n" + p.take(2000))
    assert(p.contains("dynamicpruning"), "probed aids must prune index partitions\n" + p.take(2000))
    assert(!p.contains("pq_encode"), "the probe path must never re-encode the corpus\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("ss13 build reads back the stored artifact, not the in-memory plan") {
    val p = plan("ss13_ivf_build")
    assert(p.contains("graft_ivf_index"), "output must come from the written index\n" + p.take(2000))
  }

  test("sp13 span corruption: per-row array arithmetic — no Generate, no join") {
    val p = plan("sp13_span_corruption")
    assert(!p.contains("Generate"), "masking must stay inside per-row arrays\n" + p.take(2000))
    assert(!p.contains("Join"), "no join anywhere\n" + p.take(2000))
  }

  test("dd15 threshold sweep: one conditional-agg pass, pairs never re-streamed per tau") {
    val p = plan("dd15_semdedup_sweep")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // the curve folds map-side out of the single pair pass — a grid×pairs
    // nested loop would stream the pair relation once per tau
    assert(p.contains("partial_"), "count-ifs must partial-aggregate\n" + p.take(2000))
    assert(!p.contains("tau") || !p.contains("BroadcastNestedLoopJoin (cos"),
      "no per-tau pair duplication\n" + p.take(2000))
  }

  test("ev05 cohort retention: partial aggregation + broadcast cohort-size attach") {
    val p = plan("ev05_cohort_retention")
    assert(p.contains("partial_"), "first-event/distinct/matrix aggs must partial-aggregate\n" + p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "the size attach must broadcast the tiny matrix\n" + p.take(2000))
  }

  test("dd12 incremental near-dup: banded-index equi-joins only, no cartesian") {
    val p = plan("dd12_incremental_neardup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (band, bkey) equi-join\n" + p.take(2000))
  }

  test("mm09 shot detect: pure narrow map — no explode, only the output-sort exchange") {
    val p = plan("mm09_shot_detect")
    assert(p.contains("frame_energies") || p.contains("FrameEnergies"),
      "frame scoring must run on the fused kernel\n" + p.take(2000))
    assert(!p.contains("Generate"), "deltas happen inside the row, not via explode\n" + p.take(2000))
    // map-only: the only exchanges are the spread repartition + output sort
    assert(p.split("Exchange").length - 1 <= 2, p.take(2000))
  }

  test("dd13 hot spans: partial aggregation, equi-joins only, no pair enumeration") {
    val p = plan("dd13_hot_spans")
    assert(p.contains("partial_"), "span counts must partial-aggregate map-side\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the hot join-back must be an equi-join on the span hash\n" + p.take(2000))
  }

  test("q22 pivot: two-level aggregation with pivotfirst, no value-discovery job") {
    val p = plan("q22_status_pivot")
    assert(p.contains("partial_"), "pivot aggregates must partial-aggregate\n" + p.take(2000))
    assert(p.contains("pivotfirst"), p.take(2000))
    // (status,priority) agg + pivotfirst agg + output sort — explicit pivot
    // values must not add a 4th exchange (the value-discovery collect job)
    assert(p.split("Exchange").length - 1 <= 3, p.take(2000))
  }

  test("bf03 HLL: approx and exact distinct share one partial-aggregated pass") {
    val p = plan("bf03_hll_cardinality")
    assert(p.contains("partial_"), p.take(2000))
    assert(p.contains("approx_count_distinct"), p.take(2000))
  }

  test("ev07 user paths: the groupBy reuses the window's user_id partitioning") {
    val p = plan("ev07_user_paths")
    // window exchange + output sort only — a third exchange means the
    // aggregation re-shuffled what the window already partitioned
    assert(p.split("Exchange").length - 1 <= 2, p.take(2000))
    assert(p.contains("row_number"), p.take(2000))
  }

  test("dd14 canonical quality: cluster-partitioned keep window, equi-join attach") {
    val p = plan("dd14_canonical_quality")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("row_number"), p.take(2000))
  }

  test("ss12 embedding outliers: broadcast centroid attach, native sqdist, no corpus shuffle for the distance") {
    val p = plan("ss12_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"), "the labels x dims centroid table must broadcast\n" + p.take(2000))
    assert(p.contains("vec_sqdist"), "the distance fold must be the native kernel\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("jx25 inverted tombstone runs compiled: negated-filter projection, no interpreter") {
    val p = plan("jx25_inverted_tombstone")
    assert(!p.contains("jsonata"), "jx25 must take the compiled tier\n" + p.take(2000))
  }

  test("jx26 parenthesized math runs compiled: Block transparency holds end to end") {
    val p = plan("jx26_paren_math")
    assert(!p.contains("jsonata"), "jx26 must take the compiled tier\n" + p.take(2000))
  }

  test("tx11 bigram model: top-k via TakeOrderedAndProject, counts partial-aggregate") {
    val p = plan("tx11_bigram_model")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("partial_"), p.take(2000))
  }

  test("q21 order momentum: windows all partitioned, customer filter pushed to scan") {
    val p = plan("q21_order_momentum")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(o_custkey,100)"),
      p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("jx31 nested forms run compiled: transform + ** + % in one native projection") {
    val p = plan("jx31_nested_forms")
    assert(!p.contains("jsonata"), "jx31 must run on the compiled tier, not the interpreter")
    assert(!p.contains("Generate"), "descendant count must be a per-row fold, not an explode")
  }

  test("jx30 transform patch runs compiled: struct rebuild projection, no interpreter") {
    val p = plan("jx30_record_patch")
    assert(!p.contains("jsonata"), "jx30 must run on the compiled tier, not the interpreter")
  }

  test("jx32 wildcard runs compiled: static field enumeration, no interpreter") {
    val p = plan("jx32_wildcard")
    assert(!p.contains("jsonata"), "jx32 must run on the compiled tier, not the interpreter")
  }

  test("ss15 hard negatives: broadcast-only joins, no sort-merge, no cartesian") {
    val p = plan("ss15_hard_negatives")
    // anchor x corpus is a broadcast nested-loop (non-equi, like ss01);
    // the hardest-positive attach is a broadcast hash join on a_id
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // the top-5 negative rank runs through the bounded TopKByDouble heap
    // with a map-side partial stage — NOT a row_number window sorting the
    // anchors×corpus pair relation (the round-11 weak mark)
    assert(p.contains("partial_topk_by"), "no map-side heap partial:\n" + p.take(3000))
    assert(!p.contains("row_number"), "pair relation still ranks via a window sort:\n" + p.take(3000))
  }

  test("sp16 coverage: broadcast anchor assignment over id-width rows, no sort-merge") {
    val p = plan("sp16_cluster_coverage")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the argmax partial-aggregates BEFORE the shuffle and carries only
    // id-width rows (vec_id/aid/ac) — the ss04 property that matters; the
    // struct-ordered max_by buffer itself plans as SortAggregate on this
    // Spark version for ss04 too
    assert(p.contains("partial_max_by"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // per-region top-M through the bounded heap, not a window sort over the
    // corpus-wide assignment relation (the ss15 lesson applied here)
    assert(p.contains("partial_topk_by"), "no map-side heap partial:\n" + p.take(3000))
    assert(!p.contains("row_number"), "assignment relation still ranks via a window sort:\n" + p.take(3000))
  }

  test("sp15 perplexity band: broadcast threshold attach, no cartesian") {
    val p = plan("sp15_perplexity_band")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("sp14 DSIR: broadcast weight-table attach, partial aggregation, no sort-merge") {
    val p = plan("sp14_dsir_resample")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_"), "bucket/doc aggregations must map-side combine")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
    // per-source top-20 through the bounded heap, not a window sort over
    // the corpus-wide score relation (the ss15 lesson applied here)
    assert(p.contains("partial_topk_by"), "no map-side heap partial:\n" + p.take(3000))
    assert(!p.contains("row_number"), "score relation still ranks via a window sort:\n" + p.take(3000))
  }

  test("tx13 classifier: map-only scoring — no joins, weights ride the plan as literals") {
    val p = plan("tx13_quality_classifier")
    assert(p.contains("clf_score"), "scoring must run on the native kernel\n" + p.take(2000))
    assert(!p.contains("Join"), "the weight table must be a literal array, not a joined relation\n" + p.take(2000))
    // map-only: the only exchanges are the spread repartition + output sort
    assert(p.split("Exchange").length - 1 <= 2, p.take(2000))
  }

  test("ch02 token chunks: per-row fold — bpe_count kernel inline, no joins") {
    val p = plan("ch02_token_chunks")
    assert(p.contains("bpe_count"), "per-word counts must run on the native kernel\n" + p.take(2000))
    assert(!p.contains("Join"), "packing is a per-document fold, never a join\n" + p.take(2000))
    assert(p.split("Exchange").length - 1 <= 2, p.take(2000))
  }

  test("ss17 ann recall: exact arm reduces through the bounded heap, never a corpus window sort") {
    val p = plan("ss17_ann_recall")
    assert(p.contains("partial_topk_by"), "exact top-5 must be the heap aggregate\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the ONLY row_number windows allowed are the serve path's bounded ones
    // (probe selection over #anchors, rescore over R=20) — both inherited
    // from ss14 and already pinned there; the exact arm adds none, so the
    // window count must not exceed ss14's
    val pServe = plan("ss14_ivf_probe")
    assert(p.split("row_number").length <= pServe.split("row_number").length,
      "exact ground truth must not add window ranks\n" + p.take(3000))
  }

  test("ss18 incremental recall: same harness shape over the log-backed serve") {
    val p = plan("ss18_incremental_recall")
    assert(p.contains("partial_topk_by"), "exact top-5 must be the heap aggregate\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the serve arm resolves the committed view (generation + tail) against
    // the FROZEN artifacts — same bounded windows as ss17's serve, none added
    val pOneShot = plan("ss17_ann_recall")
    assert(p.split("row_number").length <= pOneShot.split("row_number").length,
      "log-backed harness must not add window ranks\n" + p.take(3000))
  }


  test("registry-wide: no CartesianProduct anywhere; BroadcastNestedLoopJoin only on the broadcast-bounded allow-list") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    // (per-query pins for tx13/ch02/ss17 live above; this sweep catches
    // the forbidden shapes in anything they — or future rows — compose)

    // BroadcastNestedLoopJoin allow-list: every entry's broadcast side is
    // BOUNDED — a capped anchor/query/seed sample, a one-row aggregate
    // attach, or a ≤256-row model relation — each individually verified in
    // its family spec. A new query that BNLJs must either bound its
    // broadcast side the same way and join this list, or restructure; the
    // companion window sweep above guards the other corpus-shuffle shape.
    val allowBnlj = Set(
      "ss01_cosine_topk",         // query sample (vec_id % 100) broadcast vs corpus
      "ss04_ann_ivf",             // footer-stride coarse anchors + query sample
      "ss07_quantized_rescore",   // query sample + codebook attach
      "ss08_mmr_topk",            // query sample; candidates heap-capped at C
      "ss09_kmeans_step",         // k seed centroids broadcast vs corpus
      "ss10_pq_adc",              // PQ codebook (256×M) + query sample
      "ss11_ivfadc",              // coarse anchors + codebook + query sample
      "ss14_ivf_probe",           // probe queries vs pruned stored buckets
      "ss15_hard_negatives",      // anchor sample (vec_id % 50) broadcast
      "ss17_ann_recall",          // exact arm: query sample (vec_id % 100) broadcast vs corpus (the ss01 shape)
      "ss18_incremental_recall",  // same exact arm over the log-backed serve; query set BOUNDED by recallQueryMod (≤ ~4096 at any corpus size)
      "sp14_dsir_resample",       // one-row totals attach in Dsir.weights
      "tx08_perplexity",          // one-row LM-vocab aggregate attach (round-16: the
      "sp15_perplexity_band",     //   distinct count rides the scoring job as a
      "sp19_ppx_band_approx",     //   broadcast cross-join instead of an eager action)
      "sp16_cluster_coverage",    // footer-stride coverage anchors broadcast
      "dd15_semdedup_sweep",      // bounded anchor set per semdedup region
      "pp04_pretraining_pipeline" // composes the sp14/sp16 attaches above
    )

    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      // subqueries is statically Seq[SparkPlan] but sparkPlan (pre-AQE) can
      // still carry un-planned LOGICAL subquery expressions — view as Any
      // so the erased element cast doesn't throw before the type test
      direct ++ direct.flatMap(_.subqueries.asInstanceOf[Seq[Any]].flatMap {
        case sp: SparkPlan => nodes(sp)
        case _ => Nil
      })
    }
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val ns = nodes(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.sparkPlan)
      if (ns.exists(_.isInstanceOf[CartesianProductExec]))
        failures += s"$name: CartesianProduct"
      if (!allowBnlj(name) && ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
        failures += s"$name: BroadcastNestedLoopJoin (not allow-listed)"
    }
    assert(failures.isEmpty,
      s"${failures.length} plan-shape regressions:\n  " + failures.mkString("\n  "))
  }
}
