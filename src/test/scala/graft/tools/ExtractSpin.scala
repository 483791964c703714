package graft.tools

import graft.pipeline.{Extract, PagesGen}

/** Long-running single-thread extractPage loop for jstack sampling
  * (JIT-warm profile of the per-core hot path). Args: seconds (default 60). */
object ExtractSpin {
  def main(a: Array[String]): Unit = {
    val secs = if (a.nonEmpty) a(0).toInt else 60
    val pages = (0 until 2000).map(i => PagesGen.pageOf(i.toLong)).toArray
    // warmup
    (0 until 3).foreach(_ => pages.foreach(p => Extract.extractPage(p, 16)))
    println("SPIN_READY")
    val t0 = System.currentTimeMillis()
    var n = 0L
    var failures = 0L
    while (System.currentTimeMillis() - t0 < secs * 1000L) {
      pages.foreach { p => if (Extract.extractPage(p, 16).doc.parse_failed) failures += 1 }
      n += pages.length
    }
    val el = (System.currentTimeMillis() - t0) / 1000.0
    println(f"SPIN_DONE docs=$n secs=$el%.1f rate=${n / el}%.0f docs/s/core failures=$failures")
  }
}
