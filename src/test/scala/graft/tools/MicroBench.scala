package graft.tools
import graft.pipeline.{Extract, PagesGen}
object MicroBench { def main(a: Array[String]): Unit = {
  val n = 3000
  val pages = (0 until n).map(i => PagesGen.pageOf(i.toLong)).toArray
  val bytes = pages.map(_.html.length.toLong).sum
  // warmup
  pages.take(500).foreach(p => Extract.extractPage(p, 16))
  val t0 = System.nanoTime()
  var failures = 0
  pages.foreach { p => if (Extract.extractPage(p, 16).doc.parse_failed) failures += 1 }
  val secs = (System.nanoTime() - t0) / 1e9
  println(f"MICRO: $n docs, ${bytes / 1e6}%.1f MB, $secs%.2f s, ${n / secs}%.0f docs/s/core, ${bytes / 1e6 / secs}%.1f MB/s, failures=$failures")
  // generation cost alone
  val t1 = System.nanoTime()
  (n until 2 * n).foreach(i => PagesGen.pageOf(i.toLong))
  println(f"GEN: ${n / ((System.nanoTime() - t1) / 1e9)}%.0f docs/s/core")
}}
