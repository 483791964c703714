package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Loads golden fixture JSON under src/test/resources/golden — expected values
  * frozen from executing the reference's deterministic functions under
  * CPython (stdlib subset) per SURVEY §5.2. */
object GoldenJson {
  private val mapper = new ObjectMapper()

  def load(name: String): Seq[JsonNode] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource: $name")
    val root = mapper.readTree(in)
    root.elements().asScala.toSeq
  }
}
