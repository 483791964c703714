package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** F15: PDF binary branch — fixture PDFs constructed within the supported
  * subset (oracle defined by PdfText itself per FIXTURES.md F15). */
class PdfSpec extends AnyFunSuite {

  private def rawPdf(content: String): Array[Byte] =
    (s"%PDF-1.4\n1 0 obj << /Length ${content.length} >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")

  private def flatePdf(content: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    val in = content.getBytes("ISO-8859-1")
    d.setInput(in); d.finish()
    val buf = new Array[Byte](in.length * 2 + 64)
    val n = d.deflate(buf)
    "%PDF-1.5\n2 0 obj << /Filter /FlateDecode >>\nstream\n".getBytes("ISO-8859-1") ++
      buf.take(n) ++ "\nendstream\nendobj".getBytes("ISO-8859-1")
  }

  test("magic detection") {
    assert(PdfText.isPdf("%PDF-1.7 x".getBytes("US-ASCII")))
    assert(!PdfText.isPdf("<html>".getBytes("US-ASCII")))
    assert(!PdfText.isPdf(Array[Byte](1, 2)))
  }

  test("uncompressed Tj") {
    assert(PdfText.extract(rawPdf("BT /F1 12 Tf (Hello World) Tj ET")) == "Hello World")
  }

  test("TJ array with kerning numbers") {
    assert(PdfText.extract(rawPdf("BT [(Hel) -20 (lo)] TJ ET")) == "Hello")
  }

  test("Td starts a new line") {
    assert(PdfText.extract(rawPdf("BT (l1) Tj 0 -14 Td (l2) Tj ET")) == "l1\nl2")
  }

  test("quote operator = newline + show") {
    assert(PdfText.extract(rawPdf("BT (a) Tj (b) ' ET")) == "a\nb")
  }

  test("escapes and hex strings") {
    assert(PdfText.extract(rawPdf("BT (par\\(en\\)\\\\x) Tj ET")) == "par(en)\\x")
    assert(PdfText.extract(rawPdf("BT <48656C6C6F> Tj ET")) == "Hello")
    assert(PdfText.extract(rawPdf("BT (\\110i) Tj ET")) == "Hi")
  }

  test("FlateDecode stream") {
    assert(PdfText.extract(flatePdf("BT (Compressed text) Tj ET")) == "Compressed text")
  }

  test("text outside BT..ET ignored; multiple streams joined") {
    val two = rawPdf("(ignored) Tj BT (one) Tj ET") ++ rawPdf("BT (two) Tj ET")
    assert(PdfText.extract(two) == "one\ntwo")
  }

  test("garbage in, no crash") {
    assert(PdfText.extract("%PDF-1.4 truncated garbage".getBytes("US-ASCII")) == "")
    assert(PdfText.extract(Array.tabulate[Byte](100)(i => (i * 7).toByte)) == "")
  }

  test("decompression bomb is capped, not inflated onto the heap") {
    // ~200 MB of zeros deflates to ~200 KB; the inflate cap must reject
    // the stream (empty text) instead of attempting the full allocation
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    val chunk = new Array[Byte](1 << 20)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    (0 until 200).foreach { _ =>
      d.setInput(chunk)
      while (!d.needsInput()) out.write(buf, 0, d.deflate(buf))
    }
    d.finish()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    val bomb = "%PDF-1.5\n2 0 obj << /Filter /FlateDecode >>\nstream\n".getBytes("ISO-8859-1") ++
      out.toByteArray ++ "\nendstream\nendobj".getBytes("ISO-8859-1")
    assert(out.size() < (1 << 21), "bomb payload itself should be small")
    assert(PdfText.extract(bomb) == "")
  }
}
