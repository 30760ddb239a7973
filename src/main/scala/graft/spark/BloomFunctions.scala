package graft.spark

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter probes as native Columns — the standard 100 TB
  * membership-prefilter: a compact sketch of the build side (∼1.2 bytes/item
  * at 1% fpp) ships to every task, and a map-only `might_contain` filter
  * shrinks the probe side BEFORE any shuffle, so the exact confirm join only
  * sees rows the sketch could not rule out. No false negatives (every true
  * member passes), so composing with an exact join keeps results exact.
  *
  * The probe uses Spark's own `BloomFilterMightContain` expression (the
  * kernel behind runtime join pruning) over a serialized-literal filter —
  * codegen'd, no UDF, no closure capture of the sketch per row.
  */
object BloomFunctions {

  /** Build a Bloom filter over a LongType column, serialized for probing.
    * Runs a driver-side aggregation (internally tree-aggregated) — the sketch
    * is the REDUCED form of the build side, sized at `fpp` for
    * `expectedItems`. */
  def buildLong(df: DataFrame, colName: String, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf: BloomFilter = df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(serialized_bloom, value)` — value must be a LongType
    * column hashed the same way the build side was (e.g. xxhash64 on both). */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    Shims.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Shims.expression(value)))

  /** Parse back (spec support: false-positive-rate assertions). */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
