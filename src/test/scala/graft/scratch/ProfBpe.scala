package graft.scratch

import graft.spark.BpeCount
import org.apache.spark.unsafe.types.UTF8String

/** Measures the rank-sequential vs heap-merger crossover for [[BpeCount]]
  * — the number behind HeapThreshold (run: Test/runMain graft.scratch.ProfBpe). */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(4242L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    def p(k: Int): Char = (BpeCount.PlaceholderBase + k).toChar
    def table(ranks: Int): Array[Long] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Char, Char)]
      while (buf.length < ranks) {
        def operand(): Char =
          if (buf.nonEmpty && rnd.nextInt(4) == 0) p(rnd.nextInt(buf.length))
          else alphabet(rnd.nextInt(alphabet.length))
        val cand = (operand(), operand())
        if (!buf.contains(cand)) buf += cand
      }
      BpeCount.encodeMerges(buf.toSeq).toArray
    }
    val texts = (1 to 2000).map(_ =>
      (0 until 20).map(_ =>
        (0 until (3 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
        .mkString(" ")).map(UTF8String.fromString)
    def time(tbl: BpeCount.MergeTable): Double = {
      var sink = 0L
      val t0 = System.nanoTime()
      texts.foreach(t => sink += BpeCount.compute(t, tbl))
      val dt = (System.nanoTime() - t0) / 1e6
      if (sink == Long.MinValue) println(sink) // keep the loop live
      dt
    }
    Seq(16, 32, 64, 128, 256, 1024, 4096).foreach { ranks =>
      val m = table(ranks)
      val seqT = new BpeCount.MergeTable(m, false)
      val heapT = new BpeCount.MergeTable(m, true)
      (1 to 3).foreach { _ => time(seqT); time(heapT) } // warm JIT
      val s = (1 to 5).map(_ => time(seqT)).min
      val h = (1 to 5).map(_ => time(heapT)).min
      println(f"ranks=$ranks%5d seq=${s}%8.1f ms  heap=${h}%8.1f ms  seq/heap=${s / h}%5.2f")
    }
    // the SHIPPED dense-hitting table on merge-material text — the other
    // end of the hit-density spectrum
    val shipped = BpeCount.encodeMerges(graft.ops.TextOps.BpeMerges).toArray
    val sT = new BpeCount.MergeTable(shipped, false)
    val hT = new BpeCount.MergeTable(shipped, true)
    val eng = "the thing and these are on the farm in the morning running seeds"
    val engTexts = (1 to 2000).map(_ => UTF8String.fromString(eng))
    def timeOn(tbl: BpeCount.MergeTable): Double = {
      var sink = 0L
      val t0 = System.nanoTime()
      engTexts.foreach(t => sink += BpeCount.compute(t, tbl))
      if (sink == Long.MinValue) println(sink)
      (System.nanoTime() - t0) / 1e6
    }
    (1 to 3).foreach { _ => timeOn(sT); timeOn(hT) }
    val s28 = (1 to 5).map(_ => timeOn(sT)).min
    val h28 = (1 to 5).map(_ => timeOn(hT)).min
    println(f"shipped(28, dense) seq=${s28}%8.1f ms  heap=${h28}%8.1f ms  seq/heap=${s28 / h28}%5.2f")
  }
}
