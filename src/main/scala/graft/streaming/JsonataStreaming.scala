package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.spark.JsonataDF

/** Structured Streaming parity (SURVEY.md §2.D): the reference transform is a
  * stateless per-record map/filter, so the exact same narrow operator runs on
  * streaming DataFrames — no watermark required for parity; tombstone drops
  * are just a filter.
  *
  * Topic rewriting (an expression may change `topic` in the envelope) maps to
  * partitioned sinks: `writePartitionedByTopic` routes each micro-batch with
  * `partitionBy("topic")`, the Spark analog of producing to a different topic.
  *
  * Scale notes: stateless narrow map — unbounded parallelism, no state store,
  * no shuffle; checkpointing gives exactly-once into file sinks.
  */
object JsonataStreaming {

  /** Apply a JSONata expression to a streaming DataFrame; emits `out` (result
    * JSON) with tombstones dropped. Works identically on batch frames. */
  def transform(stream: DataFrame, expr: String, topic: String = "stream"): DataFrame =
    JsonataDF.transform(stream, expr, topic)

  /** Typed two-tier transform on a stream: compiled native Columns when the
    * expression falls in the compiled subset (whole-stage codegen inside
    * every micro-batch — the tier decision happens ONCE, driver-side, at
    * plan construction), the interpreted expression otherwise — the same
    * [[JsonataDF.auto]] decision, streaming-safe because both tiers are
    * stateless narrow maps. Null results (tombstones) drop, as everywhere. */
  def transformTyped(stream: DataFrame, expr: String,
                     schema: org.apache.spark.sql.types.StructType,
                     topic: String = "stream"): DataFrame =
    JsonataDF.auto(stream, expr, schema, topic)

  /** Transform + extract the (possibly rewritten) topic as a column, for
    * routing to per-topic sinks. */
  def transformWithTopic(stream: DataFrame, expr: String, topic: String = "stream"): DataFrame =
    transform(stream, expr, topic)
      .select(get_json_object(col("out"), "$.topic").as("topic"), col("out"))

  /** Micro-batch sink with dead-letter routing: good records land in
    * `outDir`, poison records (captured per-record errors, never a failed
    * stream — see JsonataDF.transformPermissive) land in `dlqDir` with the
    * original envelope and the error message. The Spark analog of Connect's
    * `errors.tolerance=all` + `errors.deadletterqueue.topic.name`. */
  def writeWithDeadLetters(stream: DataFrame, expr: String, outDir: String,
                           dlqDir: String, checkpointDir: String,
                           topic: String = "stream"): org.apache.spark.sql.streaming.StreamingQuery =
    JsonataDF.transformPermissive(stream, expr, topic)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.persist()
        b.filter(col("error").isNull).select("out").write.mode("append").parquet(outDir)
        val dlq = b.filter(col("error").isNotNull).select("record", "error")
        if (!dlq.isEmpty) dlq.write.mode("append").parquet(dlqDir)
        b.unpersist()
        ()
      }
      .start()

  /** Micro-batch sink that routes rows into per-topic directories (the
    * file-sink analog of topic rewriting; SURVEY.md §2.D). */
  def writePartitionedByTopic(stream: DataFrame, expr: String, outDir: String,
                              checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    transformWithTopic(stream, expr)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").partitionBy("topic").parquet(outDir)
      }
      .start()
}
