package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** MirrorSink: the file tree must land at exactly the golden-pinned
  * MirrorPath locations with byte-equal cleaned_html content, skipping
  * failed rows — the reference's save_content sink end-to-end. */
class MirrorSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(rmrf)
    p.delete()
  }

  test("mirrors extracted docs at the reference's save paths, byte-equal") {
    import spark.implicits._
    val base = s"/tmp/graft_mirror_${System.nanoTime()}"
    try {
      Extract.run(spark, PagesGen.pages(spark, 40L), s"$base/run", "mirror_e2e")
      val docs = spark.read.parquet(s"$base/run/docs_clean")
      val (written, skipped) = MirrorSink.write(docs, s"$base/m", "siteA", "v1")
      val rows = docs.select($"url", $"cleaned_html", $"content_kind",
          $"parse_failed")
        .as[(String, String, String, Boolean)].collect()
      assert(written == rows.count(r => !r._4 && r._2 != null))
      assert(written + skipped == rows.length)
      // every writable row is on disk at its MirrorPath, byte-equal;
      // same-path collisions (snapshot pairs share a url) hold SOME
      // version's bytes — overwrite-last-wins like the reference
      val byPath = rows.filter(r => !r._4 && r._2 != null)
        .groupBy(r => graft.url.MirrorPath.savePath(s"$base/m", "siteA", "v1",
          r._1, graft.url.MirrorPath.mimeForKind(r._3)))
      byPath.foreach { case (path, cands) =>
        val p = java.nio.file.Paths.get(path)
        assert(java.nio.file.Files.exists(p), path)
        val got = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        assert(cands.exists(_._2 == got), path)
      }
      // file count == distinct save paths
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      assert(walk(new java.io.File(s"$base/m")).size == byPath.size)
      // a directory-like url defaults to index.html (golden rule smoke)
      val idx = graft.url.MirrorPath.savePath(s"$base/m", "siteA", "v1",
        "https://h.example.com/", "text/html")
      assert(idx.endsWith("/index.html"))
    } finally rmrf(new java.io.File(base))
  }
}
