package graft.pdf

import scala.collection.mutable.ArrayBuffer
import java.util.zip.Inflater

/**
 * Minimal deterministic PDF text extraction for the binary branch
 * (media dispatch /root/reference/core/scraper_core.py:42-44 stores PDF
 * bytes; the *parse* is the north_rule's layout-parse addition, so this
 * subset defines its own fixture oracle — SURVEY §7.1 item 8).
 *
 * Supported subset: uncompressed and FlateDecode content streams; text
 * operators Tj, TJ, quote and double-quote inside BT..ET; ()-literal strings
 * with escape sequences and hex strings; Td, TD, T-star and the quote ops
 * start a new line. Anything outside the subset yields a parse failure
 * captured per-row upstream (failure isolation — SURVEY §2.10).
 */
object PdfText {

  val magic: Array[Byte] = "%PDF-".getBytes("US-ASCII")

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && (0 until 5).forall(i => bytes(i) == magic(i))

  /** Extract text from all content streams, in byte order. */
  def extract(bytes: Array[Byte]): String = {
    val streams = findStreams(bytes)
    val sb = new java.lang.StringBuilder
    streams.foreach { s =>
      val text = extractFromContent(s)
      if (text.nonEmpty) {
        if (sb.length > 0) sb.append('\n')
        sb.append(text)
      }
    }
    sb.toString
  }

  /** Locate `stream ... endstream` payloads; inflate when the object
    * dictionary declares /FlateDecode. */
  private def findStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    val hay = new String(bytes, "ISO-8859-1")
    var from = 0
    while (from < hay.length) {
      val s = hay.indexOf("stream", from)
      if (s < 0) from = hay.length
      else {
        // dictionary text immediately before the `stream` keyword
        val dictStart = math.max(0, hay.lastIndexOf("<<", s))
        val dict = hay.substring(dictStart, s)
        var dataStart = s + "stream".length
        if (dataStart < hay.length && hay.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < hay.length && hay.charAt(dataStart) == '\n') dataStart += 1
        val e = hay.indexOf("endstream", dataStart)
        if (e < 0) { from = hay.length }
        else {
          var dataEnd = e
          // strip one trailing EOL before `endstream`
          if (dataEnd > dataStart && hay.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && hay.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val payload =
            if (dict.contains("/FlateDecode")) inflate(raw) else raw
          if (payload != null) out += payload
          from = e + "endstream".length
        }
      }
    }
    out.toSeq
  }

  /** Decompression-bomb guard: a crafted stream can expand ~10^6:1, and an
    * unbounded inflate would OOM the shared executor heap (destabilizing
    * every task on it, not just this row). Real PDF content streams are
    * text-operator programs — far below this cap. */
  private val MaxInflated = 64 << 20 // 64 MiB per stream

  private def inflate(data: Array[Byte]): Array[Byte] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 20))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return null
        if (out.size() + n > MaxInflated) { inf.end(); return null }
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    } catch { case _: Exception => null }
  }

  /** Tokenize a content stream: collect shown strings inside BT..ET. */
  private def extractFromContent(content: Array[Byte]): String = {
    val s = new String(content, "ISO-8859-1")
    val sb = new java.lang.StringBuilder
    var i = 0
    var inText = false
    var lineOpen = false
    val pending = ArrayBuffer.empty[String] // operand strings awaiting operator

    def newline(): Unit = {
      if (lineOpen) { sb.append('\n'); lineOpen = false }
    }
    def show(str: String): Unit = { sb.append(str); lineOpen = true }

    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = parseLiteral(s, i)
        pending += str
        i = next
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) != '<') {
        val (str, next) = parseHex(s, i)
        pending += str
        i = next
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        i += 1
        while (i < s.length && !s.charAt(i).isWhitespace &&
               s.charAt(i) != '(' && s.charAt(i) != '<' && s.charAt(i) != '>' &&
               s.charAt(i) != '[' && s.charAt(i) != ']' && s.charAt(i) != '/') i += 1
        val op = s.substring(start, i)
        op match {
          case "BT" => inText = true; pending.clear()
          case "ET" => inText = false; newline(); pending.clear()
          case "Tj" => if (inText && pending.nonEmpty) show(pending.last); pending.clear()
          case "TJ" => if (inText) pending.foreach(show); pending.clear()
          case "'"  => if (inText) { newline(); pending.lastOption.foreach(show) }; pending.clear()
          case "\"" => if (inText) { newline(); pending.lastOption.foreach(show) }; pending.clear()
          case "Td" | "TD" | "T*" => if (inText) newline(); pending.clear()
          case _ => pending.clear()
        }
      } else i += 1
    }
    sb.toString.stripLineEnd
  }

  private def parseLiteral(s: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              var oct = 0
              var n = 0
              while (j < s.length && n < 3 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                oct = oct * 8 + (s.charAt(j) - '0'); j += 1; n += 1
              }
              sb.append(oct.toChar); i = j
            case _ => i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  private def parseHex(s: String, start: Int): (String, Int) = {
    val end0 = s.indexOf('>', start + 1)
    val end = if (end0 < 0) s.length else end0
    val hex = s.substring(start + 1, end).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 2 <= padded.length) {
      try sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      catch { case _: NumberFormatException => }
      i += 2
    }
    (sb.toString, if (end0 < 0) s.length else end + 1)
  }
}
