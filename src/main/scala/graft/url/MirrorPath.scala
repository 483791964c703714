package graft.url

/**
 * Filesystem-mirror path semantics of the reference's save path
 * (VERDICT r03 next #6) — the url→path calculation users need when
 * mirroring extracted output to a filesystem tree, the reference's
 * primary sink shape:
 *
 *  - `save_content` (/root/reference/core/scraper.py:484-497):
 *    `local = urlparse(url).path.lstrip('/')`;
 *    `file_dir = os.path.join(version_dir, os.path.dirname(local))`;
 *    `filename = os.path.basename(local) or 'index.html'`;
 *    if the filename does not end with `.html`/`.xml`/`.txt` (case
 *    SENSITIVE, like `str.endswith`), append `.html` when the content
 *    type starts with `text/html`, else `.txt` (note: XML payloads get
 *    `.txt` too — only the tuple endswith keeps `.xml`);
 *    `filepath = os.path.join(file_dir, filename)`.
 *  - `get_content_filepath` (core/scraper.py:236-239): the raw read-back
 *    path — `os.path.join(version_path, local)` with NO index.html
 *    default and NO extension fix-up.
 *  - `get_version_path` (core/scraper.py:481-482):
 *    `os.path.join(OUTPUT_DIR, 'docs', doc_name, version)`.
 *
 * The query string and fragment are DISCARDED (only `parsed.path` is
 * used), and `;params` after the last path segment is split off by
 * urlparse itself — two urls differing only in query map to the SAME
 * file. `dirname`/`basename`/`join` follow posixpath exactly (rstrip of
 * the trailing slash run in dirname; join inserts '/' only when the
 * accumulated path does not already end with one), so multi-slash
 * paths collapse the way the reference's os.path does: `a//b` → `a/b`.
 *
 * Everything here is a pure String function — used from typed maps
 * (UDF-free discipline, SURVEY §2.12) and golden-pinned by
 * MirrorPathSpec against CPython-generated mirror_paths.json.
 */
object MirrorPath {

  /** posixpath.dirname: everything before the last '/', with the
    * trailing slash run stripped unless the head is all slashes. */
  private[url] def posixDirname(p: String): String = {
    val i = p.lastIndexOf('/') + 1
    var head = p.substring(0, i)
    if (head.nonEmpty && head.exists(_ != '/')) {
      var end = head.length
      while (end > 0 && head.charAt(end - 1) == '/') end -= 1
      head = head.substring(0, end)
    }
    head
  }

  /** posixpath.basename: everything after the last '/'. */
  private[url] def posixBasename(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** posixpath.join: absolute components restart the path; a separator
    * is inserted only when the accumulated path is non-empty and does
    * not already end with '/'. */
  private[url] def posixJoin(parts: String*): String = {
    var res = if (parts.isEmpty) "" else parts.head
    parts.drop(1).foreach { b =>
      if (b.startsWith("/")) res = b
      else if (res.isEmpty || res.endsWith("/")) res += b
      else res = res + "/" + b
    }
    res
  }

  /** Python str.lstrip('/'). */
  private def lstripSlash(s: String): String = s.dropWhile(_ == '/')

  /** The content kinds the extractor emits, mapped to the MIME prefix the
    * reference would have seen in the `Content-Type` response header for
    * that payload (its save branch keys on `content_type.startswith`). */
  def mimeForKind(kind: String): String = kind match {
    case "html" => "text/html"
    case "xml"  => "application/xml"
    case "pdf"  => "application/pdf"
    case _      => "text/plain"
  }

  /** The save path relative to the version directory — `save_content`'s
    * `os.path.join(os.path.dirname(local), filename)` with the
    * index.html default and the extension fix-up. */
  def relativePath(url: String, contentType: String): String = {
    val local = lstripSlash(PyUrl.urlparse(url).path)
    val dir = posixDirname(local)
    var filename = posixBasename(local)
    if (filename.isEmpty) filename = "index.html"
    if (!(filename.endsWith(".html") || filename.endsWith(".xml") ||
          filename.endsWith(".txt"))) {
      filename += (if (contentType.startsWith("text/html")) ".html" else ".txt")
    }
    posixJoin(dir, filename)
  }

  /** Full `save_content` filepath under `outputDir`:
    * docs/&lt;doc_name&gt;/&lt;version&gt;/&lt;relativePath&gt;. */
  def savePath(outputDir: String, docName: String, version: String,
               url: String, contentType: String): String =
    posixJoin(outputDir, "docs", docName, version, relativePath(url, contentType))

  /** `get_content_filepath`: the raw read-back path — NO index.html
    * default, NO extension fix-up (a directory-like url maps to a path
    * with a trailing slash, faithful to the reference's read side). */
  def contentFilepath(outputDir: String, docName: String, version: String,
                      url: String): String = {
    val local = lstripSlash(PyUrl.urlparse(url).path)
    posixJoin(outputDir, "docs", docName, version, local)
  }
}
