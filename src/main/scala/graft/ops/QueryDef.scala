package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's schema *inference*
    * refuses (PARQUET_TYPE_ILLEGAL) unless the session-wide legacy
    * `nanosAsLong` conf is on. Reading with an explicit schema (ts as plain
    * long nanos) sidesteps inference entirely, so the loader never has to
    * mutate the caller's session conf (probed: the scan itself accepts
    * INT64(NANOS) into LongType; only inference gates on the conf). */
  private val eventsSchema = StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** All testdata tables are plain parquet files named `<table>.parquet`.
    * Deliberately conf-free: a library loader must not mutate the shared
    * session (the sketch kernels that need wrapping 64-bit arithmetic do it
    * inside native expressions — see graft.spark.SketchExpressions). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") s.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

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
    if (splits < target) df.repartition(target) else df
  }
}
