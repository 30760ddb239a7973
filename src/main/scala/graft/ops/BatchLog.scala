package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** The disk-resident committed-batch-log protocol shared by every store
  * that outlives a stream: an append-only `store/batch_id=N` slice log
  * whose commit marker is a designated store's job-commit `_SUCCESS`
  * file, folded online into `compact/gen=G` generations behind a 1-row
  * manifest whose own `_SUCCESS` is the generation's commit marker.
  *
  * Extracted from [[Ingest]] (which carries the full protocol rationale:
  * why directory existence is NOT commitment, why readers resolve one
  * [[BatchLog.View]], why a crash mid-compaction is invisible) so the
  * incremental ANN index log ([[AnnIndex]]) composes the SAME protocol
  * instead of a parallel one — one commit discipline to audit, not two.
  *
  * Works on any Hadoop filesystem scheme `dir` uses (HDFS/S3A/local).
  */
private[graft] object BatchLog {

  /** Default reader grace for [[vacuum]]: a generation younger than this
    * cannot trigger deletes, so the naive `compact(); vacuum()` composition
    * is safe by default — any reader that resolved its [[View]] before the
    * generation committed has this long to finish with the superseded
    * paths. Callers that KNOW no concurrent readers exist (tests,
    * single-process backfills) pass `graceMs = 0`. */
  val DefaultVacuumGraceMs: Long = 30L * 60L * 1000L

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One consistent resolution of a store: the newest committed generation
    * (covering every batch id <= `upTo`) plus the committed batch-dir tail
    * beyond it. `upTo` is -1 when no generation exists. */
  case class View(gen: Option[Long], upTo: Long, tail: Seq[Long]) {
    def isCommitted(batchId: Long): Boolean =
      batchId <= upTo || tail.contains(batchId)
    def isEmpty: Boolean = gen.isEmpty && tail.isEmpty
  }

  def fsOf(s: SparkSession, dir: String) =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
  def bdir(dir: String, store: String, batchId: Long): String =
    s"$dir/$store/batch_id=$batchId"
  def gdir(dir: String, gen: Long, store: String): String =
    s"$dir/compact/gen=$gen/$store"

  /** Child dirs of `dir/sub` named `prefix=N` with a PARSEABLE long suffix —
    * a stray non-numeric directory is skipped, never a crash. */
  def listIds(s: SparkSession, dir: String, sub: String,
              prefix: String): Seq[Long] = {
    val fs = fsOf(s, dir)
    val root = new Path(s"$dir/$sub")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix(prefix).toLong).toOption)
      .sorted
  }

  /** Batches whose commit marker (`commitStore/batch_id=N/_SUCCESS`)
    * exists, ascending. */
  def committedBatches(s: SparkSession, dir: String,
                       commitStore: String): Seq[Long] = {
    val fs = fsOf(s, dir)
    listIds(s, dir, commitStore, "batch_id=")
      .filter(b => fs.exists(new Path(s"${bdir(dir, commitStore, b)}/_SUCCESS")))
  }

  /** The newest committed generation, as (gen, up_to): committed =
    * `compact/gen=G/manifest/_SUCCESS` exists (the manifest is written
    * after every data store, so its job commit IS the generation commit). */
  def committedGeneration(s: SparkSession, dir: String): Option[(Long, Long)] = {
    val fs = fsOf(s, dir)
    listIds(s, dir, "compact", "gen=")
      .filter(g => fs.exists(new Path(s"${gdir(dir, g, "manifest")}/_SUCCESS")))
      .lastOption
      .map { g =>
        (g, s.read.parquet(gdir(dir, g, "manifest")).head().getAs[Long]("up_to"))
      }
  }

  def view(s: SparkSession, dir: String, commitStore: String): View = {
    val g = committedGeneration(s, dir)
    val upTo = g.map(_._2).getOrElse(-1L)
    View(g.map(_._1), upTo, committedBatches(s, dir, commitStore).filter(_ > upTo))
  }

  /** The paths a view resolves for one store: the generation slice (if
    * any) plus the committed tail batch dirs. */
  def slicePaths(dir: String, store: String, view: View): Seq[String] =
    view.gen.map(g => gdir(dir, g, store)).toSeq ++
      view.tail.map(b => bdir(dir, store, b))

  /** Read a store through a view — ONE multi-path parquet read
    * (schema-stable empty when the view resolves no paths). */
  def readCommitted(s: SparkSession, dir: String, store: String,
                    view: View, ddl: String): DataFrame = {
    val paths = slicePaths(dir, store, view)
    if (paths.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(ddl))
    else s.read.parquet(paths: _*)
  }

  /** The contiguous committed prefix a compaction may fold. The FIRST fold
    * anchors at the smallest committed id, not id 0: a store whose caller
    * numbers batches from an arbitrary epoch (a resumed checkpoint, an id
    * namespace per source) must still compact. Safe because
    * `View.isCommitted` treating every id <= up_to as committed only
    * swallows ids BELOW the smallest id ever committed — ids the caller's
    * monotone batch-id source can never replay. Once a generation exists
    * the anchor is its up_to: folding across a LATER gap would mark the
    * gap id committed and silently drop its late replay. */
  def foldablePrefix(dir: String, view: View): Vector[Long] = {
    val anchor = view.gen.fold(view.tail.headOption.getOrElse(0L) - 1L)(_ => view.upTo)
    val prefix = view.tail.foldLeft(Vector.empty[Long]) { (acc, b) =>
      if (b == acc.lastOption.getOrElse(anchor) + 1) acc :+ b else acc
    }
    if (prefix.length < view.tail.length) {
      val gapAt = prefix.lastOption.getOrElse(anchor) + 1
      log.warn(s"compact($dir): committed-id gap at batch_id=$gapAt leaves " +
        s"${view.tail.length - prefix.length} committed tail batch(es) " +
        "unfoldable; if that id was abandoned (never to be committed), the " +
        "tail directory count will grow until it is backfilled or the " +
        "store is rebuilt")
    }
    prefix
  }

  /** Commit a generation whose data stores are already written: the 1-row
    * manifest lands LAST, carrying the commit watermark [[vacuum]] measures
    * its grace period against. */
  def commitManifest(s: SparkSession, dir: String, gen: Long, upTo: Long): Unit = {
    import s.implicits._
    Seq((upTo, System.currentTimeMillis()))
      .toDF("up_to", "committed_at_ms").coalesce(1)
      .write.mode("overwrite")
      .parquet(gdir(dir, gen, "manifest")) // job-commit _SUCCESS = COMMIT
  }

  /** Remove batch directories the newest committed generation supersedes
    * (id <= its `up_to`) and generations older than it — MECHANICALLY
    * grace-guarded: deletion only happens when the newest generation
    * committed at least `graceMs` ago (its manifest `committed_at_ms`
    * watermark; pre-watermark generations fall back to the manifest
    * `_SUCCESS` modification time). Inside the grace window the call is a
    * no-op that returns false, so the naive `compact(); vacuum()` pattern
    * cannot strand a reader that resolved its [[View]] just before the
    * generation commit. Returns true iff the superseded paths were
    * deleted. */
  def vacuum(s: SparkSession, dir: String, stores: Seq[String],
             graceMs: Long = DefaultVacuumGraceMs): Boolean =
    committedGeneration(s, dir).exists { case (gen, upTo) =>
      val fs = fsOf(s, dir)
      val manifest = s.read.parquet(gdir(dir, gen, "manifest"))
      val committedAt =
        if (manifest.columns.contains("committed_at_ms"))
          manifest.head().getAs[Long]("committed_at_ms")
        else fs.getFileStatus(
          new Path(s"${gdir(dir, gen, "manifest")}/_SUCCESS")).getModificationTime
      val age = System.currentTimeMillis() - committedAt
      if (age < graceMs) {
        log.info(s"vacuum($dir): gen=$gen committed ${age}ms ago " +
          s"(< grace ${graceMs}ms); refusing to delete superseded paths")
        false
      } else {
        stores.foreach { store =>
          listIds(s, dir, store, "batch_id=").filter(_ <= upTo).foreach { b =>
            fs.delete(new Path(bdir(dir, store, b)), true)
          }
        }
        listIds(s, dir, "compact", "gen=").filter(_ < gen).foreach { g =>
          fs.delete(new Path(s"$dir/compact/gen=$g"), true)
        }
        true
      }
    }
}
