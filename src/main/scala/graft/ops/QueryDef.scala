package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** All testdata tables are plain parquet files named `<table>.parquet`.
    * The engine's hash/sketch arithmetic (MinHash perms, SimHash) relies on
    * wrapping 64-bit arithmetic, so ANSI overflow checking is disabled. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS) which Spark refuses by default;
    // read as long (ns since epoch) and convert at use sites.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Ensure enough input splits for compute-heavy per-row operators.
    *
    * The local testdata files are ~1 MB: a single parquet row group = a single
    * scan partition = one core doing all the work. A production deployment
    * reads thousands of splits, so this is a no-op there (the scan partition
    * count already exceeds the parallelism) — locally it adds one tiny shuffle
    * to unlock every core. Only used where per-row compute dominates I/O. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
