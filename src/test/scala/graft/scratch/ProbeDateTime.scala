package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.jsonata.DateTimeFmt

/** Scratch probe: does Spark's date_format(timestamp_millis(x), pattern)
  * agree with the interpreter's DateTimeFmt at EXTREME millis (negative
  * years, year >= 10000, near Long overflow)? Decides the verified range
  * for the compiled $fromMillis/$toMillis tier (round-9 advice item). */
object ProbeDateTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val probes: Seq[(String, Long)] = Seq(
      "epoch" -> 0L,
      "now-ish" -> 1723600000000L,
      "neg-1e12 (1938)" -> -1000000000000L,
      "year 1" -> -62135596800000L,
      "year 0 (1 BC)" -> -62167219200000L,
      "year -5" -> -62330000000000L,
      "year 9999 end" -> 253402300799999L,
      "year 10000" -> 253402300800000L,
      "year 99999" -> 3093527980800000L,
      "long/1000 max" -> Long.MaxValue / 1000,
      "long/1000+1 (ts overflow)" -> (Long.MaxValue / 1000 + 1L),
      "long min /1000" -> Long.MinValue / 1000
    )

    def interp(ms: Long): String =
      try DateTimeFmt.format(ms, None, None)
      catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}: ${e.getMessage}" }

    for ((label, ms) <- probes) {
      val i = interp(ms)
      val s =
        try {
          val df = Seq(ms).toDF("ms")
            .select(concat(date_format(timestamp_millis(col("ms")),
              "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("Z")).as("s"))
          df.collect()(0).getString(0)
        } catch { case e: Throwable =>
          s"ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.nextOption().getOrElse("")}" }
      val mark = if (i == s) "SAME" else "DIFF"
      println(f"[probe] $mark%-4s $label%-28s interp=$i%-34s spark=$s")
    }

    // pictured probe: a representative literal-picture format at normal range
    val picProbes = Seq(
      "[Y0001]-[M01]-[D01] [H01]:[m]:[s]" -> "yyyy-MM-dd HH:mm:ss",
      "[Y]/[M]/[D]" -> "y/M/d",
      "[D01] [MNn] [Y0001]" -> "dd MMMM yyyy",
      "[H01]:[m][P]" -> null, // P lowercase: no Java twin
      "[h]:[m] [PN]" -> "h:mm a",
      "[d] of [Y0001]" -> "D 'of' yyyy"
    )
    val ms = 1723600000000L
    for ((pic, pat) <- picProbes) {
      val i = try DateTimeFmt.format(ms, Some(pic), None)
        catch { case e: Throwable => s"ERR ${e.getMessage}" }
      val s = if (pat == null) "(skip)" else
        try Seq(ms).toDF("ms").select(date_format(timestamp_millis(col("ms")), pat)).collect()(0).getString(0)
        catch { case e: Throwable => s"ERR ${Option(e.getMessage).getOrElse("")}" }
      println(f"[probe] pic=$pic%-36s interp=$i%-28s spark=$s")
    }

    // $toMillis probe: to_timestamp/unix_millis on ISO strings vs parseIso
    val strs = Seq("2024-08-14T01:02:03.456Z", "2024-08-14T01:02:03Z", "2024-08-14T01:02:03",
      "2024-08-14", "2024-08", "2024", "2024-08-14T01:02:03.456+05:30", "garbage",
      "10000-01-01T00:00:00.000Z", "0000-01-01T00:00:00.000Z")
    for (st <- strs) {
      val i = try DateTimeFmt.parse(st, None).toString
        catch { case e: Throwable => s"ERR ${e.getMessage.take(40)}" }
      val s = try {
        val r = Seq(st).toDF("s")
          .select(unix_millis(to_timestamp(col("s"))).as("ms")).collect()(0)
        if (r.isNullAt(0)) "NULL" else r.getLong(0).toString
      } catch { case e: Throwable => s"ERR ${Option(e.getMessage).getOrElse("").take(60)}" }
      println(f"[probe] toMillis '$st%-30s' interp=$i%-24s spark=$s")
    }
    spark.stop()
  }
}
