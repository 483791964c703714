package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's PRIMARY sink re-expressed: a filesystem mirror of the
 * cleaned content (`save_content` → `save_file_content` writes
 * `str(soup)` UTF-8 at the url-derived path —
 * /root/reference/core/scraper.py:484-540). Path semantics are the
 * golden-pinned [[graft.url.MirrorPath]] rules (index.html default for
 * directory-like urls, endswith-gated extension fix-up by content type,
 * mirror_paths.json / q_mirror_paths); content is the row's
 * `cleaned_html` — this engine's `str(soup)` equivalent, which the
 * byte-identity suite pins per content kind.
 *
 * Scale shape: executor-side streaming writes (one task per partition,
 * no driver collect) onto a shared filesystem — the reference's own
 * deployment model. Same-path collisions are overwrite-last-wins,
 * exactly like the reference's `open(filepath, 'w')`. Failed or
 * content-less rows are SKIPPED and counted, never thrown.
 *
 * docs: (url, cleaned_html, content_kind, parse_failed). Returns
 * (written, skipped).
 */
object MirrorSink {

  def write(docs: DataFrame, outputDir: String, docName: String,
            version: String): (Long, Long) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.select(col("url").cast("string"),
      col("cleaned_html").cast("string"), col("content_kind").cast("string"),
      col("parse_failed").cast("boolean"))
      .as[(String, String, String, Boolean)]
      .mapPartitions { it =>
        var written = 0L
        var skipped = 0L
        it.foreach { case (url, html, kind, failed) =>
          if (failed || html == null) skipped += 1
          else {
            val path = java.nio.file.Paths.get(graft.url.MirrorPath.savePath(
              outputDir, docName, version, url,
              graft.url.MirrorPath.mimeForKind(kind)))
            java.nio.file.Files.createDirectories(path.getParent)
            // attempt-suffixed temp + atomic rename: retried/speculative
            // attempts never expose a partial file; same-path collisions
            // stay overwrite-last-wins (the reference's open(fp, 'w')),
            // just atomically so
            val tmp = path.resolveSibling(path.getFileName.toString +
              s".inprogress-${org.apache.spark.TaskContext.get().taskAttemptId()}")
            java.nio.file.Files.write(tmp, html.getBytes("UTF-8"))
            java.nio.file.Files.move(tmp, path,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            written += 1
          }
        }
        Iterator.single((written, skipped))
      }.collect()
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }
}
