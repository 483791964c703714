package graft.tools
import graft.pipeline.{Extract, PagesGen}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
object ThreadBench { def main(a: Array[String]): Unit = {
  val nDocs = 40000
  val pages = (0 until nDocs).map(i => PagesGen.pageOf(i.toLong)).toArray
  for (threads <- Seq(1, 8, 32)) {
    // warmup
    pages.take(2000).foreach(p => Extract.extractPage(p, 16))
    val pool = Executors.newFixedThreadPool(threads)
    val done = new AtomicLong()
    val t0 = System.nanoTime()
    val chunk = nDocs / threads
    (0 until threads).foreach { t =>
      pool.submit(new Runnable { def run(): Unit = {
        var i = t * chunk
        val end = if (t == threads - 1) nDocs else (t + 1) * chunk
        while (i < end) { Extract.extractPage(pages(i), 16); i += 1 }
        done.addAndGet(end - t * chunk)
      }})
    }
    pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"THREADS $threads%2d: ${done.get / secs}%.0f docs/s (${secs}%.2f s)")
  }
}}
