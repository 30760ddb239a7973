package graft.ops
import org.apache.spark.sql.SparkSession
import graft.spark.JsonataDF

/** One-shot engine throughput measurement for BASELINE.md §"engine-side
  * baseline": records/sec through the full interpreted path (envelope
  * encode -> evaluate -> serialize) for the three reference-shaped workloads. */
object ThroughputBench extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  // 10x the sf0.1 events (1M rows): per-record rates at 100k rows are ±30%
  // noise from fixed job overhead (~0.15 s)
  val one = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
  val events = Tables.spread(Seq.fill(10)(one).reduce(_ unionAll _)).cache()
  val n = events.count() // materialize cache

  def measure(label: String, expr: String): Unit = {
    // warm
    JsonataDF.transform(events, expr).count()
    val t0 = System.nanoTime()
    val out = JsonataDF.transform(events, expr).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[thr] $label: ${n / sec}%.0f rec/s (kept $out of $n, ${sec}%.2f s)")
  }

  measure("identity $", "$")
  measure("removeEmail-class rewrite",
    "( $drop := function($v,$k){ $k != 'props' }; $merge([$, {'value': $sift(value, $drop)}]) )")
  measure("tombstone filter", "value.event_type = 'error' ? null : $")

  // typed output path: direct tree-in/tree-out codec (JsonataRowExpression)
  // vs decoding the JSON-string output with from_json. Both are fully
  // materialized through the noop sink — count() would prune the decode away
  // on one side and not the other.
  locally {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.StructType
    val expr = "{'event_id': value.event_id, 'user_id': value.user_id, 'v2': value.value * 2, 'et': $uppercase(value.event_type)}"
    val ddl = "event_id BIGINT, user_id BIGINT, v2 DOUBLE, et STRING"
    def run(label: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[thr] $label: ${n / sec}%.0f rec/s (${sec}%.2f s)")
    }
    run("typed: JSON-string out + from_json decode") {
      JsonataDF.transform(events, expr)
        .select(from_json(col("out"), StructType.fromDDL(ddl)).as("r")).select("r.*")
    }
    run("typed: direct row codec") {
      JsonataDF.transformAs(events, expr, StructType.fromDDL(ddl))
    }
  }
  // two-tier refresh (round 11): the same typed workload through
  // JsonataDF.auto — which engages the COMPILED tier (analyzer-memoized
  // Columns, whole-stage codegen) for these shapes — vs the forced
  // interpreted path (transformAs: envelope encode -> evaluate -> decode).
  // Both fully materialize through the noop sink. The three canonical
  // round-4 expressions above keep their interpreted measurements (their
  // `$`-rooted output shapes are documented interpreter surfaces); these
  // are their compiled-expressible twins.
  locally {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.StructType
    import graft.spark.JsonataCompiler
    val cases = Seq(
      ("tombstone+project",
        "value.event_type = 'error' ? null : {'event_id': value.event_id, " +
          "'user_id': value.user_id, 'v': value.value, 'et': value.event_type}",
        "event_id BIGINT, user_id BIGINT, v DOUBLE, et STRING"),
      ("removeEmail-class sift",
        "{'event_id': value.event_id, " +
          "'nk': $count($keys($sift(value, function($v,$k){ $k != 'props' })))}",
        "event_id BIGINT, nk BIGINT"),
      ("project+fn",
        "{'event_id': value.event_id, 'user_id': value.user_id, " +
          "'v2': value.value * 2, 'et': $uppercase(value.event_type)}",
        "event_id BIGINT, user_id BIGINT, v2 DOUBLE, et STRING"),
      // round-11 compiled transform: patch-in-place + append + delete — the
      // record-patching idiom the B22 compile exists for
      ("transform patch",
        "value ~> |$|{'et': $uppercase(event_type), 'v2': value * 2}, 'props'|",
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, " +
          "value DOUBLE, props STRING, et STRING, v2 DOUBLE"),
      // round-11 compiled ** descendant: flat schemas degenerate to a field
      // count, so the interpreted side pays the full recursive emission
      // while the compiled side is a constant-width fold
      ("descendant count",
        "{'event_id': value.event_id, 'n': $count(value.**.value)}",
        "event_id BIGINT, n BIGINT"))
    def run(label: String)(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[thr] $label: ${n / sec}%.0f rec/s (${sec}%.2f s)")
      n / sec
    }
    cases.foreach { case (label, expr, ddl) =>
      assert(JsonataCompiler.compileQuery(events, expr).isDefined,
        s"two-tier case must ride the compiled tier: $label")
      val schema = StructType.fromDDL(ddl)
      val rc = run(s"two-tier $label [compiled/auto]")(JsonataDF.auto(events, expr, schema))
      val ri = run(s"two-tier $label [interpreted]")(JsonataDF.transformAs(events, expr, schema))
      println(f"[thr] two-tier $label RATIO compiled/interpreted: ${rc / ri}%.1fx")
    }

    // round-12 compiled * wildcard — events carries no homogeneous struct
    // (the compile gate requires type-agreeing field values), so the
    // two-tier twin reshapes in-plan like jx32: the compiled side is a
    // constant-width concat + fold, the interpreted side pays the envelope
    // round-trip plus per-record object iteration
    locally {
      import org.apache.spark.sql.functions._
      val nested = events.select(col("event_id"),
        struct(col("value").as("a"), (col("value") * 2).as("b"),
          (col("value") + 1).as("c")).as("m"),
        map(lit("a"), col("value"), lit("b"), col("value") * 2,
          lit("c"), col("value") + 1).as("mp")).cache()
      nested.count()
      // count = the pure-enumeration shape; sum = the array-fold consumer.
      // The sum row was PARITY with the interpreted engine (1.0x) while the
      // compiled $sum was an ArrayAggregate lambda fold outside codegen —
      // the NumArrayFold kernel (round 12) took it to ~3x (4.0M -> 13.5M
      // rec/s), which is why these two rows exist separately.
      // avg = TWO folds (sum + cnt) inlined into ONE generated function —
      // the duplicate-local collision the round-13 freshName fix repaired
      // (pre-fix this silently fell back to interpreted ArrayAggregate).
      // map count/sum = the round-13 compiled MAP-base wildcard
      // (map_values) vs the interpreted envelope's object iteration
      for ((tag, expr, ddl) <- Seq(
        ("wildcard count", "{'event_id': value.event_id, 'nw': $count(value.m.*)}",
          "event_id BIGINT, nw BIGINT"),
        ("wildcard sum", "{'event_id': value.event_id, 'sw': $sum(value.m.*)}",
          "event_id BIGINT, sw DOUBLE"),
        ("wildcard avg", "{'event_id': value.event_id, 'aw': $average(value.m.*)}",
          "event_id BIGINT, aw DOUBLE"),
        ("wildcard map count", "{'event_id': value.event_id, 'nm': $count(value.mp.*)}",
          "event_id BIGINT, nm BIGINT"),
        ("wildcard map sum", "{'event_id': value.event_id, 'sm': $sum(value.mp.*)}",
          "event_id BIGINT, sm DOUBLE"))) {
        val schema = StructType.fromDDL(ddl)
        assert(JsonataCompiler.compileQuery(nested, expr).isDefined,
          s"$tag two-tier case must ride the compiled tier")
        val rc = run(s"two-tier $tag [compiled/auto]")(JsonataDF.auto(nested, expr, schema))
        val ri = run(s"two-tier $tag [interpreted]")(JsonataDF.transformAs(nested, expr, schema))
        println(f"[thr] two-tier $tag RATIO compiled/interpreted: ${rc / ri}%.1fx")
      }
      nested.unpersist()
    }

    // round-14 compiled DYNAMIC-key group-by (ctxKey). Measured HONESTLY:
    // compiled group-by — member key OR computed key — runs ~0.5x the
    // interpreter STANDALONE on small arrays (the nested-HOF compose is
    // CodegenFallback; Catalyst's per-row lambda binding costs ~2x the
    // whole envelope round-trip at 3 elements). The compile exists for
    // TIER REACH, not this row's ratio: transformCompiled is
    // all-or-nothing per expression, so one group-by inside a wide
    // otherwise-compiled projection no longer drags every other field
    // onto the interpreter (where those fields are the 3-10x wins above).
    // If a group shape ever dominates a hot path, the NumArrayFold
    // precedent applies: fuse it into a codegen kernel.
    locally {
      import org.apache.spark.sql.functions._
      val grouped = events.select(col("event_id"),
        array(
          struct(col("event_type").as("cat"), col("value").as("price")),
          struct(upper(col("event_type")).as("cat"), (col("value") * 2).as("price")),
          struct(lit("x").as("cat"), (col("value") + 1).as("price"))).as("items")).cache()
      grouped.count()
      val expr = "{'event_id': value.event_id, 'g': value.items{cat & '-' & cat: $sum(price)}}"
      val ddl = "event_id BIGINT, g MAP<STRING,DOUBLE>"
      val schema = StructType.fromDDL(ddl)
      assert(JsonataCompiler.compileQuery(grouped, expr).isDefined,
        "dyn-key group two-tier case must ride the compiled tier")
      val rc = run("two-tier dyn-key group [compiled/auto]")(JsonataDF.auto(grouped, expr, schema))
      val ri = run("two-tier dyn-key group [interpreted]")(JsonataDF.transformAs(grouped, expr, schema))
      println(f"[thr] two-tier dyn-key group RATIO compiled/interpreted: ${rc / ri}%.1fx")
      grouped.unpersist()
    }
  }

  // variant tier: variant INPUT (binary walker, no input-side text) must beat
  // or match the JSON-string input on the same expression/output
  locally {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import graft.spark.JsonataFunctions
    val expr = "{'k2': $.k * 2}"
    // pre-materialize both input forms so only the evaluator path differs
    val varIn = events.select(parse_json(col("props")).as("p")).cache()
    val strIn = events.select(col("props").as("p")).cache()
    varIn.write.format("noop").mode("overwrite").save()
    strIn.write.format("noop").mode("overwrite").save()
    def run(label: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[thr] $label: ${n / sec}%.0f rec/s (${sec}%.2f s)")
    }
    run("variant tier: JSON-string input") {
      strIn.select(JsonataFunctions.jsonataVariant(col("p"), expr).as("v"))
    }
    run("variant tier: variant input (binary walker)") {
      varIn.select(JsonataFunctions.jsonataVariant(col("p"), expr).as("v"))
    }
  }

  // classifier kernel (round 13): the tx13 score as ONE codegen'd pass
  // (ClfScore) vs the split->transform->aggregate HOF compose it replaced
  locally {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val one = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = Tables.spread(Seq.fill(100)(one).reduce(_ unionAll _))
      .select(col("text")).cache()
    val nd = docs.count()
    def run(label: String)(f: => DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[thr] $label: ${nd / sec}%.0f rec/s (${sec}%.2f s)")
      nd / sec
    }
    val rk = run("clf score [ClfScore kernel]") {
      docs.select(graft.spark.ClfExpressions.clfScore(col("text"),
        TextOps.clfUniW, TextOps.clfBiW, TextOps.ClfBias).as("s"))
    }
    val rc = run("clf score [HOF compose]") {
      docs.select(TextOps.clfScoreOf(TextOps.clfWordsCol).as("s"))
    }
    println(f"[thr] clf score RATIO kernel/compose: ${rk / rc}%.1fx")
    docs.unpersist()
  }
  spark.stop()
}
