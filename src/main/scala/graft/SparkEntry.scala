package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a Spark-first implementation of one operator from
  * SURVEY.md §2 (record-level dataflow, relational coverage, and the
  * training-data-pipeline extensions); oracles are exact DuckDB SQL over the
  * same parquet tables wherever the operator is SQL-expressible.
  */
object SparkEntry {

  private def allQueries: Seq[Q] =
    Relational.entries ++ Dedup.entries ++ Similarity.entries ++
      TextOps.entries ++ Multimodal.entries ++ JsonataQueries.entries ++
      Temporal.entries ++ Sampling.entries ++ Prep.entries ++ Pipeline.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val byName = allQueries.map(q => q.name -> q).toMap
    byName("q05_region_revenue").build(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate/non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
