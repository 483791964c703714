package graft.diff

import org.scalatest.funsuite.AnyFunSuite
import graft.GoldenJson
import scala.jdk.CollectionConverters._

class MyersSpec extends AnyFunSuite {

  private def opOf(n: com.fasterxml.jackson.databind.JsonNode): DiffOp = {
    def s(f: String): String = if (n.has(f)) n.get(f).asText else null
    DiffOp(n.get("operation").asText, s("content"), s("old_content"), s("new_content"))
  }

  test("myers_diff ops match CPython golden corpus (F16)") {
    GoldenJson.load("myers.json").foreach { c =>
      assume(!c.has("error"))
      val ops = Myers.generateOps(c.get("old").asText, c.get("new").asText)
      val expected = c.get("ops").elements().asScala.toSeq.map(opOf)
      assert(ops == expected, s"old=${c.get("old").asText}")
    }
  }

  test("optimized chunked diff matches CPython golden corpus") {
    GoldenJson.load("chunked_diff.json").foreach { c =>
      assume(!c.has("error"))
      val chunks = Myers.optimizedChunks(
        c.get("old").asText, c.get("new").asText, c.get("chunkSize").asInt)
      val expected = c.get("chunks").elements().asScala.toSeq.map { ch =>
        ChunkDiff(ch.get("chunk_index").asInt,
          ch.get("operations").elements().asScala.toSeq.map(opOf))
      }
      assert(chunks == expected)
    }
  }

  test("apply(ops) matches CPython reconstruction") {
    GoldenJson.load("apply_diff.json").foreach { c =>
      val ops = Myers.generateOps(c.get("old").asText, c.get("new").asText)
      assert(Myers.applyOps(ops) == c.get("applied").asText)
    }
  }

  test("diff of identical content is empty (reference quirk)") {
    assert(Myers.generateOps("a\nb\nc", "a\nb\nc").isEmpty)
  }

  test("crash parity: multi-line deletions raise exactly like CPython (KeyError)") {
    // the reference's backtrack KeyErrors on these (verified under CPython);
    // callers isolate per-row (generate_diff wraps and re-raises ParsingError)
    Seq(("a\nb\nc\nd", "a\nb"), ("a\nb\nc", "c"), ("1\n2\n3\n4\n5", "1\n3\n5"))
      .foreach { case (o, n) =>
        assertThrows[NoSuchElementException](Myers.generateOps(o, n))
      }
  }

  test("chunk_content slices exactly") {
    assert(Myers.chunkContent("abcdefghij", 4) == Vector("abcd", "efgh", "ij"))
    assert(Myers.chunkContent("", 4) == Vector())
  }

  test("splitlines matches Python semantics") {
    assert(Myers.splitlines("a\nb\r\nc\rd") == Vector("a", "b", "c", "d"))
    assert(Myers.splitlines("a\n") == Vector("a"))
    assert(Myers.splitlines("") == Vector())
    assert(Myers.splitlines("one") == Vector("one"))
  }

  test("generate_diff document struct: metadata md5s match CPython hashlib") {
    val fd = Myers.diffDocument("line one\nline two", "line one\nline 2",
      "doc", "v3", "2024-01-01T00:00:00")
    // hashlib.md5('line one\nline two'.encode()).hexdigest() (CPython)
    assert(fd.metadata.old_content_hash == "a8e259530e140091d1fe5d0e1538a934")
    assert(fd.metadata.new_content_hash == "e8558cf528e7d142cbec2b2a25864f78")
    assert(fd.metadata.doc_name == "doc" && fd.metadata.version == "v3" &&
      fd.metadata.timestamp == "2024-01-01T00:00:00")
    assert(fd.operations == Myers.generateOps("line one\nline two", "line one\nline 2"))
    // crash parity: the diff runs BEFORE metadata exists (generate_diff order)
    intercept[Exception] {
      Myers.diffDocument("a\nb\nc\nd", "a\nb", "doc", "v", "t")
    }
  }
}
