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
    * session (the sketch queries that need wrapping 64-bit arithmetic build
    * explicit legacy-mode expressions instead — see Dedup.wrapMul/wrapAdd). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") s.read.schema(eventsSchema).parquet(s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

  /** Ensure enough input splits for compute-heavy per-row operators.
    *
    * The local testdata files are ~1 MB: a single parquet row group = a single
    * scan partition = one core doing all the work. A production deployment
    * reads thousands of splits, so this is a no-op there (`inputFiles` already
    * exceeds the parallelism) — locally it adds one tiny shuffle to unlock
    * every core. Only used where per-row compute dominates I/O. `inputFiles`
    * is a file listing, not an RDD materialization, so the check itself costs
    * no physical planning. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
