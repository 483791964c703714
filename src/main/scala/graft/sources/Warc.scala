package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC ingestion — the raw Common-Crawl-shaped boundary in front of the
 * `pages` table the rest of the engine consumes (the reference never sees
 * raw archives — selenium hands it decoded DOM strings,
 * /root/reference/core/scraper.py:554-576 — but a 10^12-doc corpus
 * arrives as WARC, so the engine owns this layer; format per the public
 * ISO 28500 / IIPC warc-specifications grammar).
 *
 * Parsing rules implemented (strict, with per-record failure isolation):
 *  - record = version line `WARC/x.y` CRLF, header lines until an empty
 *    line, exactly `Content-Length` payload octets, then CRLF CRLF;
 *  - header names are case-insensitive; values trimmed of optional WS;
 *    obs-fold continuation lines (leading SP/HT) append with a space;
 *  - a structurally broken record yields an ERROR row (offset + reason)
 *    and the scanner RESYNCS at the next `\r\n\r\nWARC/` boundary — one
 *    hostile record cannot sink a 1 GiB archive member;
 *  - `.gz` members: Common Crawl gzips each record as its own member;
 *    JDK GZIPInputStream consumes multi-member streams natively, so the
 *    whole file gunzips to one concatenated WARC stream.
 *
 * Scale shape: WARC(.gz) is not splittable — parallelism is per FILE
 * (the Common-Crawl layout: ~1 GiB members, 10^5 files per crawl), via
 * `spark.read.format("binaryFile")` + a flatMap; each task streams one
 * archive. Records carry payloads until the page-row projection, which
 * drops non-response records and the HTTP envelope immediately.
 */
object Warc {

  /** One parsed WARC record (or an error marker with `parse_error` set). */
  final case class WarcRecord(
      file: String, rec_idx: Int, offset: Long, total_len: Long,
      warc_type: String, target_uri: String, warc_date: String,
      record_id: String, content_length: Long,
      payload: Array[Byte], parse_error: String)

  /** Parsed HTTP response envelope from a `response` record payload.
    * `body` is the raw remainder after the header block (transfer-encoding
    * framing, if any, is preserved verbatim — as archived). */
  final case class HttpResponse(status: Int, reason: String,
                                headers: Seq[(String, String)],
                                body: Array[Byte], error: String)

  private val Crlf = Array[Byte]('\r', '\n')

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** ASCII line at [from, crlf); returns (line, nextPos) or null at EOF. */
  private def readLine(b: Array[Byte], from: Int): (String, Int) = {
    val e = indexOfCrlf(b, from)
    if (e < 0) null
    else (new String(b, from, e - from, "ISO-8859-1"), e + 2)
  }

  /** Parse a header block (name: value, obs-fold) ending at an empty
    * line. Returns (headers, posAfterEmptyLine) or null if malformed. */
  private def readHeaders(b: Array[Byte], from: Int)
    : (Vector[(String, String)], Int) = {
    var pos = from
    var out = Vector.empty[(String, String)]
    while (true) {
      val ln = readLine(b, pos)
      if (ln == null) return null
      val (line, next) = ln
      pos = next
      if (line.isEmpty) return (out, pos)
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (out.isEmpty) return null // fold with no preceding field
        val (n0, v0) = out.last
        out = out.init :+ (n0, v0 + " " + line.trim)
      } else {
        val c = line.indexOf(':')
        if (c <= 0) return null
        out :+= (line.substring(0, c).trim, line.substring(c + 1).trim)
      }
    }
    null // unreachable
  }

  private def header(hs: Seq[(String, String)], name: String): String =
    hs.collectFirst {
      case (n, v) if n.equalsIgnoreCase(name) => v
    }.orNull

  /** Find the next `\r\n\r\nWARC/` resync point at/after `from`;
    * returns the offset of the `W` or -1. */
  private def resync(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val pat = "\r\n\r\nWARC/".getBytes("ISO-8859-1")
    while (i + pat.length <= b.length) {
      var k = 0
      while (k < pat.length && b(i + k) == pat(k)) k += 1
      if (k == pat.length) return i + 4
      i += 1
    }
    -1
  }

  /** Strict scan of one (already-gunzipped) WARC stream into records;
    * malformed stretches become error rows and the scan resyncs. */
  def parseRecords(file: String, bytes: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    def err(offset: Long, reason: String, nextPos: Int): Unit = {
      out += WarcRecord(file, idx, offset, (nextPos - offset).max(0),
        null, null, null, null, -1L, Array.emptyByteArray, reason)
      idx += 1
    }
    while (pos < bytes.length) {
      val start = pos
      val ln = readLine(bytes, pos)
      if (ln == null) {
        if (bytes.length - pos > 0) err(start, "truncated version line", bytes.length)
        pos = bytes.length
      } else {
        val (ver, afterVer) = ln
        if (!ver.startsWith("WARC/")) {
          val r = resync(bytes, pos)
          err(start, s"bad version line: ${ver.take(32)}",
            if (r < 0) bytes.length else r)
          pos = if (r < 0) bytes.length else r
        } else {
          val hdr = readHeaders(bytes, afterVer)
          if (hdr == null) {
            val r = resync(bytes, pos)
            err(start, "malformed header block", if (r < 0) bytes.length else r)
            pos = if (r < 0) bytes.length else r
          } else {
            val (hs, bodyStart) = hdr
            val clStr = header(hs, "Content-Length")
            val cl = try {
              val v = java.lang.Long.parseLong(clStr.trim)
              if (v < 0) -1L else v
            } catch { case _: Exception => -1L }
            if (cl < 0 || bodyStart + cl + 4 > bytes.length) {
              val r = resync(bytes, pos)
              err(start,
                if (cl < 0) s"bad Content-Length: $clStr" else "truncated payload",
                if (r < 0) bytes.length else r)
              pos = if (r < 0) bytes.length else r
            } else {
              val bodyEnd = bodyStart + cl.toInt
              val sepOk = bytes(bodyEnd) == '\r' && bytes(bodyEnd + 1) == '\n' &&
                bytes(bodyEnd + 2) == '\r' && bytes(bodyEnd + 3) == '\n'
              if (!sepOk) {
                val r = resync(bytes, bodyEnd)
                err(start, "missing record separator",
                  if (r < 0) bytes.length else r)
                pos = if (r < 0) bytes.length else r
              } else {
                val payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)
                out += WarcRecord(file, idx, start, (bodyEnd + 4 - start).toLong,
                  header(hs, "WARC-Type"), header(hs, "WARC-Target-URI"),
                  header(hs, "WARC-Date"), header(hs, "WARC-Record-ID"),
                  cl, payload, null)
                idx += 1
                pos = bodyEnd + 4
              }
            }
          }
        }
      }
    }
    out.result()
  }

  /** Multi-member gunzip (Common Crawl gzips each record as one member);
    * JDK GZIPInputStream reads concatenated members to exhaustion. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Parse the HTTP response envelope inside a `response` payload. */
  def parseHttpResponse(payload: Array[Byte]): HttpResponse = {
    val ln = readLine(payload, 0)
    if (ln == null)
      return HttpResponse(-1, null, Nil, Array.emptyByteArray, "no status line")
    val (status, afterStatus) = ln
    val m = "^HTTP/\\d\\.\\d (\\d{3})(?: (.*))?$".r.findFirstMatchIn(status)
    if (m.isEmpty)
      return HttpResponse(-1, null, Nil, Array.emptyByteArray,
        s"bad status line: ${status.take(32)}")
    val hdr = readHeaders(payload, afterStatus)
    if (hdr == null)
      return HttpResponse(m.get.group(1).toInt, m.get.group(2), Nil,
        Array.emptyByteArray, "malformed http headers")
    val (hs, bodyStart) = hdr
    HttpResponse(m.get.group(1).toInt, m.get.group(2), hs,
      java.util.Arrays.copyOfRange(payload, bodyStart, payload.length), null)
  }

  /** charset= parameter of a Content-Type value (lowercased, unquoted),
    * or null. */
  def charsetOf(contentType: String): String = {
    if (contentType == null) return null
    val m = "(?i);\\s*charset\\s*=\\s*\"?([^\";\\s]+)\"?"
      .r.findFirstMatchIn(contentType)
    m.map(_.group(1).toLowerCase(java.util.Locale.ROOT)).orNull
  }

  /** All records of a binaryFile frame (`path`, `content`), gunzipping
    * `.gz`/magic-sniffed members; one flatMap task per archive. */
  def records(files: DataFrame): Dataset[WarcRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val raw = if (isGzip(content)) gunzip(content) else content
        parseRecords(path, raw)
      }
  }

  /** Record-offset index rows: everything [[records]] yields except the
    * payload — (file, rec_idx, offset, total_len, warc_type, target_uri,
    * parse_error), offsets in the DECOMPRESSED stream. Persisted once per
    * crawl snapshot, it lets a re-extraction of a subset (one host, one
    * record type, a failure re-run) prune to record ranges via
    * [[recordsAt]] instead of re-parsing every archive end to end. */
  def recordIndex(files: DataFrame): DataFrame =
    records(files).toDF().select(col("file"), col("rec_idx"), col("offset"),
      col("total_len"), col("warc_type"), col("target_uri"), col("parse_error"))

  /** Persist [[recordIndex]] (parquet; the Iceberg swap is the usual
    * config change). One pass over the archives — the payloads are
    * parsed but never shuffled or stored. */
  def writeRecordIndex(files: DataFrame, path: String): Unit =
    recordIndex(files).write.mode("overwrite").parquet(path)

  /** Pruned re-read: parse ONLY the records named by `index` rows
    * (file, rec_idx, offset, total_len — e.g. a filtered slice of a
    * persisted [[recordIndex]]). One task per archive, same as the full
    * scan, but each wanted record is sliced at its recorded
    * [offset, offset+total_len) and parsed alone — untargeted records
    * never materialize header maps or payload copies. The gunzip of the
    * member stream is unavoidable for gzipped archives (offsets are
    * decompressed-stream positions); for uncompressed archives the slice
    * is a direct seek. An index row that no longer matches the archive
    * (out of range) degrades to a per-row error record, never a task
    * failure. */
  def recordsAt(files: DataFrame, index: DataFrame): Dataset[WarcRecord] = {
    val spark = files.sparkSession
    import spark.implicits._
    val wanted = index
      .select(col("file").cast("string").as("__f"), col("rec_idx").cast("int"),
        col("offset").cast("long"), col("total_len").cast("long"))
      .groupBy(col("__f"))
      .agg(collect_list(struct(col("rec_idx"), col("offset"),
        col("total_len"))).as("__w"))
    files.select(col("path").cast("string"), col("content"))
      .join(wanted, col("path") === col("__f"))
      .select(col("path"), col("content"), col("__w"))
      .as[(String, Array[Byte], Seq[(Int, Long, Long)])]
      .flatMap { case (path, content, w) =>
        val raw = if (isGzip(content)) gunzip(content) else content
        w.sortBy(_._2).iterator.flatMap { case (ri, off, len) =>
          if (off < 0 || len <= 0 || off + len > raw.length)
            Iterator.single(WarcRecord(path, ri, off, len, null, null, null,
              null, -1L, Array.emptyByteArray, "index out of range"))
          else {
            val slice = java.util.Arrays.copyOfRange(
              raw, off.toInt, (off + len).toInt)
            // a record slice parses to exactly one record (total_len spans
            // header..separator); keep the INDEX's rec_idx/offset so the
            // pruned rows are drop-in identical to the full scan's
            parseRecords(path, slice).iterator.take(1)
              .map(r => r.copy(rec_idx = ri, offset = off))
          }
        }
      }
  }

  /** The `pages`-shaped projection: response records only, url from
    * WARC-Target-URI, ts from WARC-Date, html = HTTP body bytes. The
    * HTTP envelope and non-response records are dropped HERE, before
    * anything shuffles. */
  def pages(files: DataFrame): Dataset[graft.pipeline.PageRow] = {
    val spark = files.sparkSession
    import spark.implicits._
    records(files)
      .filter(r => r.parse_error == null && r.warc_type == "response" &&
        r.target_uri != null)
      .map { r =>
        val http = parseHttpResponse(r.payload)
        val ts = try {
          java.sql.Timestamp.from(java.time.Instant.parse(r.warc_date))
        } catch { case _: Exception => new java.sql.Timestamp(0L) }
        graft.pipeline.PageRow(r.target_uri, ts,
          if (http.error == null) http.body else r.payload, null, null)
      }
  }

  // ----------------------------------------------------------------- WET

  /** One WET conversion record (the Common-Crawl extracted-text
    * interchange shape): headers + UTF-8 plain-text payload. Record id is
    * DETERMINISTIC (md5 of url+ts) so re-runs emit identical bytes —
    * the engine's no-RNG discipline extends to its sinks. */
  private def wetRecord(url: String, ts: java.sql.Timestamp,
                        text: String): Array[Byte] = {
    val payload = (if (text == null) "" else text).getBytes("UTF-8")
    val idHex = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((url + " " + ts.getTime).getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val head = (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Date: ${ts.toInstant.toString}\r\n" +
      s"WARC-Record-ID: <urn:uuid:${idHex.substring(0, 8)}-${idHex.substring(8, 12)}-${idHex.substring(12, 16)}-${idHex.substring(16, 20)}-${idHex.substring(20, 32)}>\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("ISO-8859-1")
    val r = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, r, 0, head.length)
    System.arraycopy(payload, 0, r, head.length, payload.length)
    r(r.length - 4) = '\r'; r(r.length - 3) = '\n'
    r(r.length - 2) = '\r'; r(r.length - 1) = '\n'
    r
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(b); gz.close()
    bo.toByteArray
  }

  /**
   * WET sink: write extracted text as per-record-gzipped conversion
   * records, one `part-NNNNN.warc.wet.gz` per partition under `outDir`
   * (the CC member layout — seekable per record, splittable per file).
   * docs: (url, warc_ts, text). Executor-side streaming write — no
   * driver collect; file count = partition count, so callers size
   * partitions the way they would any file sink.
   */
  def writeWet(docs: DataFrame, outDir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    docs.select(col("url").cast("string"), col("warc_ts").cast("timestamp"),
      col("text").cast("string"))
      .as[(String, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        // task-commit protocol: stream to an attempt-suffixed temp file,
        // atomically rename on success — a retried or speculative attempt
        // can therefore never expose a partially-written member to a
        // reader or truncate a sibling attempt mid-write (each attempt
        // owns its temp; the rename is last-writer-wins on the final path)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val path = java.nio.file.Paths.get(outDir, f"part-$pid%05d.warc.wet.gz")
        val tmp = path.resolveSibling(
          path.getFileName.toString + s".inprogress-${tc.taskAttemptId()}")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(tmp), 1 << 16)
        var n = 0L
        try {
          it.foreach { case (u, ts, t) =>
            out.write(gzipMember(wetRecord(u, ts, t))); n += 1
          }
          out.close()
          if (n == 0) java.nio.file.Files.deleteIfExists(tmp)
          else java.nio.file.Files.move(tmp, path,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } catch {
          case e: Throwable =>
            try { out.close() } catch { case _: Exception => () }
            java.nio.file.Files.deleteIfExists(tmp)
            throw e
        }
        Iterator.single(n)
      }.reduce(_ + _): Unit
  }

  /** WET source: conversion records of a binaryFile frame back to
    * (url, warc_ts, text) — `writeWet`'s exact inverse (roundtrip-pinned
    * in WarcSpec). */
  def wetPages(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    records(files)
      .filter(r => r.parse_error == null && r.warc_type == "conversion" &&
        r.target_uri != null)
      .map { r =>
        val ts = try {
          java.sql.Timestamp.from(java.time.Instant.parse(r.warc_date))
        } catch { case _: Exception => new java.sql.Timestamp(0L) }
        (r.target_uri, ts, new String(r.payload, "UTF-8"))
      }.toDF("url", "warc_ts", "text")
  }

  // ------------------------------------------------------------ synthesis

  /** Deterministic WARC bytes over PagesGen's page corpus (no external
    * data): a warcinfo record, then per page a request/response pair
    * (request every 5th page), with one structurally BROKEN record
    * injected mid-stream when `withBroken` — the failure-isolation probe.
    * `gzipMembers` wraps each record as its own gzip member (CC layout). */
  def syntheticWarcBytes(n: Int, withBroken: Boolean = false,
                         gzipMembers: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 20)
    def member(recordBytes: Array[Byte]): Unit =
      if (!gzipMembers) out.write(recordBytes)
      else {
        val bo = new java.io.ByteArrayOutputStream(recordBytes.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(recordBytes); gz.close()
        out.write(bo.toByteArray)
      }
    def record(typ: String, uri: String, date: String, id: String,
               payload: Array[Byte], extra: Seq[(String, String)] = Nil): Array[Byte] = {
      val sb = new StringBuilder(256)
      sb ++= "WARC/1.0\r\n"
      sb ++= s"WARC-Type: $typ\r\n"
      if (uri != null) sb ++= s"WARC-Target-URI: $uri\r\n"
      sb ++= s"WARC-Date: $date\r\n"
      sb ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
      extra.foreach { case (k, v) => sb ++= s"$k: $v\r\n" }
      sb ++= s"Content-Length: ${payload.length}\r\n\r\n"
      val head = sb.result().getBytes("ISO-8859-1")
      val r = new Array[Byte](head.length + payload.length + 4)
      System.arraycopy(head, 0, r, 0, head.length)
      System.arraycopy(payload, 0, r, head.length, payload.length)
      r(r.length - 4) = '\r'; r(r.length - 3) = '\n'
      r(r.length - 2) = '\r'; r(r.length - 1) = '\n'
      r
    }
    val info = "software: graft-synthetic/1.0\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("ISO-8859-1")
    member(record("warcinfo", null, "2024-01-01T00:00:00Z", "info-0", info,
      Seq("Content-Type" -> "application/warc-fields")))
    var i = 0
    while (i < n) {
      val p = graft.pipeline.PagesGen.pageOf(i.toLong)
      val date = p.warc_ts.toInstant.toString
      val mime =
        if (p.url.endsWith(".txt")) "text/plain; charset=utf-8"
        else if (p.url.endsWith(".xml")) "application/xml"
        else if (p.url.endsWith(".pdf")) "application/pdf"
        else "text/html; charset=UTF-8"
      if (i % 5 == 0) {
        val req = (s"GET ${p.url} HTTP/1.1\r\nHost: example\r\n" +
          "User-Agent: graft-synthetic\r\n\r\n").getBytes("ISO-8859-1")
        member(record("request", p.url, date, s"req-$i", req,
          Seq("Content-Type" -> "application/http; msgtype=request")))
      }
      if (withBroken && i == n / 2)
        // broken CONTENT in a well-formed member (a raw splice between
        // gzip members would end the multi-member stream early instead
        // of probing the record-level resync)
        member(("WARC/1.0\r\nWARC-Type: response\r\n" +
          "Content-Length: not-a-number\r\n\r\ngarbage garbage\r\n\r\n")
          .getBytes("ISO-8859-1"))
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\n" +
        s"Content-Length: ${p.html.length}\r\n\r\n").getBytes("ISO-8859-1")
      val payload = new Array[Byte](http.length + p.html.length)
      System.arraycopy(http, 0, payload, 0, http.length)
      System.arraycopy(p.html, 0, payload, http.length, p.html.length)
      member(record("response", p.url, date, s"resp-$i", payload,
        Seq("Content-Type" -> "application/http; msgtype=response")))
      i += 1
    }
    out.toByteArray
  }

  /** Synthetic archive as a one-file binaryFile-shaped frame. */
  def syntheticWarcFrame(spark: SparkSession, n: Int,
                         withBroken: Boolean = false,
                         gzipMembers: Boolean = false): DataFrame = {
    import spark.implicits._
    Seq(("synthetic.warc" + (if (gzipMembers) ".gz" else ""),
      syntheticWarcBytes(n, withBroken, gzipMembers)))
      .toDF("path", "content")
  }
}
