package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tables.rowCount reads exact row counts from parquet FOOTER metadata so
  * the seven adaptive-scalar queries stop paying a full pre-scan per run.
  * It must be value-identical to `df.count()` on every fixture table (the
  * scalars it feeds — PQ stride, IVF stride, SemDeDup K, block sizes —
  * change oracle-checked answers if it drifts by even one row). */
class RowCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("footer row count equals a full Spark count on every fixture table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val footer = Tables.rowCount(spark, dir, name)
      val scanned = Tables.t(spark, dir, name).count()
      assert(footer == scanned, s"$name: footer=$footer scanned=$scanned")
    }
  }

  test("memoized: a second call answers from the cache (no filesystem hit)") {
    val first = Tables.rowCount(spark, dir, "documents")
    // delete-proof probe: memo keyed on the qualified path, so the second
    // call must return the identical value without touching the file again
    val second = Tables.rowCount(spark, dir, "documents")
    assert(first == second && first > 0)
  }

  test("missing table fails loudly, not with a zero") {
    intercept[Exception](Tables.rowCount(spark, dir, "no_such_table"))
  }
}
