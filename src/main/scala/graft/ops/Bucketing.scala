package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers — the 100 TB co-location story made concrete.
  *
  * A join between two tables bucketed by the same key into the same bucket
  * count needs NO exchange on either side: each task reads matching bucket
  * files directly (hash(key) % n routes identical keys to identical bucket
  * ids at write time). At scale this turns the dominant shuffle of a
  * fact-to-fact join into a file-local merge — the difference between moving
  * 100 TB across the network per join and never moving it at all. Bucket
  * counts must match (or divide) between join sides; pick n so a bucket of
  * the larger table fits one task (~128-512 MB).
  *
  * Spark persists bucket metadata through the catalog, so the API writes
  * `saveAsTable` with an explicit path; `sortBy` on the same key additionally
  * removes the per-task sort under sort-merge join (SortExec disappears too —
  * requires `spark.sql.legacy.bucketedTableScan.outputOrdering=true`, sound
  * only with one file per bucket, which [[writeBucketed]] guarantees).
  * BucketingSpec pins the exchange-free, sort-free plan.
  */
object Bucketing {

  /** Write `df` bucketed (and sorted) by `keys` into `n` buckets as managed
    * table `name` at `path`.
    *
    * The pre-write `repartition` on the bucket key aligns writer tasks with
    * buckets (same murmur3-mod-n routing), so each bucket lands in ONE file —
    * the condition under which the scan reports its sort order and
    * sort-merge joins skip the per-task SortExec as well as the exchange.
    * Multiple files per bucket would keep the no-shuffle property but force a
    * merge re-sort. */
  def writeBucketed(df: DataFrame, name: String, path: String, n: Int, keys: Seq[String]): Unit =
    df.repartition(n, keys.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(n, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(name)

  /** The bucketed table as a DataFrame (bucket metadata flows from the
    * catalog into the scan, enabling exchange-free joins/aggregations). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
