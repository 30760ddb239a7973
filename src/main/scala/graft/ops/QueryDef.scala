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
}
