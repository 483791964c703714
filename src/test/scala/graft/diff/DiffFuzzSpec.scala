package graft.diff

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/**
 * Fuzz differential against the REFERENCE's own diff family executed under
 * CPython (scripts/gen_diff_fuzz.py): generate_diff operations + md5
 * metadata, the update_partial_content apply reconstruction, and
 * generate_optimized_diff chunk output (index-unit quirk included) — plus
 * CRASH PARITY: the reference's backtrack KeyErrors/IndexErrors on ~half
 * of random edit pairs, and those inputs must throw here too.
 */
class DiffFuzzSpec extends AnyFunSuite {

  private def opFromJson(arr: JsonNode): DiffOp = {
    def s(i: Int): String = { val v = arr.get(i); if (v.isNull) null else v.asText() }
    DiffOp(arr.get(0).asText(), s(1), s(2), s(3))
  }

  test("generate_diff / apply / optimized-chunk fuzz parity incl. crash parity") {
    var nErr = 0
    var nChunkErr = 0
    graft.GoldenJson.load("diff_fuzz.json").foreach { c =>
      val old = c.get("old").asText()
      val neu = c.get("new").asText()
      if (c.has("error")) {
        nErr += 1
        assert(util.Try(Myers.generateOps(old, neu)).isFailure,
          s"expected crash for old=${old.take(60)} new=${neu.take(60)}")
      } else {
        val fd = Myers.diffDocument(old, neu, "doc", "1", "t")
        val wantOps = c.get("ops").elements().asScala.map(opFromJson).toSeq
        assert(fd.operations == wantOps, s"ops diverged old=${old.take(60)} new=${neu.take(60)}")
        assert(fd.metadata.old_content_hash == c.get("old_md5").asText())
        assert(fd.metadata.new_content_hash == c.get("new_md5").asText())
        assert(Myers.applyOps(fd.operations) == c.get("applied").asText())
        val cs = c.get("chunk_size").asInt()
        if (c.has("chunks_error")) {
          nChunkErr += 1
          assert(util.Try(Myers.optimizedChunks(old, neu, cs)).isFailure,
            s"expected chunk crash old=${old.take(60)} new=${neu.take(60)}")
        } else {
          val want = c.get("chunks").elements().asScala.map { ch =>
            ChunkDiff(ch.get(0).asInt(),
              ch.get(1).elements().asScala.map(opFromJson).toSeq)
          }.toSeq
          val got = Myers.optimizedChunks(old, neu, cs)
          assert(got == want, s"chunks diverged old=${old.take(60)} new=${neu.take(60)}")
        }
      }
    }
    assert(nErr > 100 && nChunkErr > 50) // crash paths must be exercised
  }
}
