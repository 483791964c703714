package graft.clean

import graft.html._
import scala.collection.mutable.ArrayBuffer

/**
 * Boilerplate-strip heuristics (north_rule: "text-density/link-density
 * scoring, tag-class blocklists for nav/footer/script/ads, readability-style
 * block classification"). This is a SEPARATE, flag-gated pass — the
 * byte-identical reference mode (Cleaner) never invokes it (SURVEY §7.1
 * item 2). Deterministic. NOTE: `mainContent`/`stripBoilerplate` MUTATE
 * the passed Document in place (boilerplate subtrees are extracted) —
 * callers sharing a parsed DOM with the byte-identity Cleaner must parse
 * separately (`mainContentFromHtml` does).
 *
 * Algorithm (readability-family, simplified for determinism):
 *  1. hard-strip: script/style/noscript/template/iframe/svg/form/button +
 *     elements whose class/id match the boilerplate lexicon;
 *  2. per block-level element compute text length, link-text length,
 *     punctuation count → linkDensity = linkChars/chars;
 *  3. candidate blocks: chars >= minChars ∧ linkDensity <= maxLinkDensity,
 *     leaf-most block per subtree;
 *  4. main content = the candidate blocks' text in document order,
 *     newline-joined. (`Block.score` is exposed for rankers that want the
 *     classic readability weighting; the default emission keeps every
 *     candidate — recall over precision for training corpora.)
 *
 * All DOM walks use explicit stacks: adversarial 10^4+-deep nesting (the
 * parser itself is iterative and depth-unbounded) must not overflow the
 * executor thread stack — unlike the extraction core, these run outside
 * extractPage's per-row Throwable isolation.
 */
object Boilerplate {

  private val hardStrip = Set("script", "style", "noscript", "template",
    "iframe", "svg", "form", "button", "select", "option", "nav", "footer",
    "header", "aside")

  private val blockTags = Set("p", "div", "section", "article", "main", "td",
    "li", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6")

  private val badClassId = java.util.regex.Pattern.compile(
    "nav|menu|footer|sidebar|side-bar|comment|advert|banner|social|share|" +
      "cookie|breadcrumb|pagination|related|promo|popup|masthead|skyscraper|ad-",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private val goodClassId = java.util.regex.Pattern.compile(
    "article|body|content|entry|main|page|post|text|blog|story",
    java.util.regex.Pattern.CASE_INSENSITIVE)

  final case class Block(el: Element, chars: Int, linkChars: Int,
                         commas: Int, depth: Int) {
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
    def score: Double =
      math.min(chars, 1000) * (1.0 - linkDensity) + commas * 10
  }

  private def classIdText(el: Element): String =
    el.attr("class").getOrElse("") + " " + el.attr("id").getOrElse("")

  private def isBoilerplateEl(el: Element): Boolean = {
    if (hardStrip.contains(el.name)) return true
    val cid = classIdText(el)
    cid.trim.nonEmpty && badClassId.matcher(cid).find() &&
      !goodClassId.matcher(cid).find()
  }

  /** Strip hard-boilerplate subtrees in place. Returns removed count. */
  def stripBoilerplate(doc: Document): Int = {
    var removed = 0
    val stack = ArrayBuffer[Element](doc)
    while (stack.nonEmpty) {
      val e = stack.remove(stack.length - 1)
      var i = e.children.length - 1
      while (i >= 0) {
        e.children(i) match {
          case el: Element =>
            if (isBoilerplateEl(el)) { el.extract(); removed += 1 }
            else stack += el
          case _ =>
        }
        i -= 1
      }
    }
    removed
  }

  private def textStats(el: Element): (Int, Int, Int) = {
    var chars = 0
    var linkChars = 0
    var commas = 0
    val stack = ArrayBuffer[(Element, Boolean)]((el, el.name == "a"))
    while (stack.nonEmpty) {
      val (e, inLink) = stack.remove(stack.length - 1)
      e.children.foreach {
        case t: Text =>
          val trimmed = t.data.trim
          chars += trimmed.length
          if (inLink) linkChars += trimmed.length
          var i = 0
          while (i < trimmed.length) {
            if (trimmed.charAt(i) == ',' || trimmed.charAt(i) == '，') commas += 1
            i += 1
          }
        case c: Element => stack += ((c, inLink || c.name == "a"))
        case _ =>
      }
    }
    (chars, linkChars, commas)
  }

  /** Explicit post-order frame for `candidateBlocks` (a block counts only
    * if no descendant block was emitted — leaf-most wins — so the check
    * runs when the frame POPS, against out.length at entry). */
  private final class CFrame(val el: Element, val depth: Int, val entryLen: Int) {
    var i = 0
  }

  /** Candidate content blocks after stripping, leaf-most per subtree, in
    * post-order (the same emission order as the recursive formulation). */
  def candidateBlocks(doc: Document, minChars: Int = 25,
                      maxLinkDensity: Double = 0.5): Seq[Block] = {
    val out = ArrayBuffer.empty[Block]
    val stack = ArrayBuffer(new CFrame(doc, 0, 0))
    while (stack.nonEmpty) {
      val f = stack.last
      if (f.i < f.el.children.length) {
        val c = f.el.children(f.i)
        f.i += 1
        c match {
          case el: Element => stack += new CFrame(el, f.depth + 1, out.length)
          case _ =>
        }
      } else {
        stack.remove(stack.length - 1)
        if (stack.nonEmpty) { // the root document frame is not a block
          val childBlocks = out.length - f.entryLen
          if (childBlocks == 0 && blockTags.contains(f.el.name)) {
            val (chars, linkChars, commas) = textStats(f.el)
            if (chars >= minChars) {
              // recursive form passed the PARENT's depth to Block
              val b = Block(f.el, chars, linkChars, commas, f.depth - 1)
              if (b.linkDensity <= maxLinkDensity) out += b
            }
          }
        }
      }
    }
    out.toSeq
  }

  final case class MainContent(text: String, blocks: Int,
                               strippedElements: Int, totalChars: Int)

  /** Full boilerplate pipeline over a parsed page: strip → score → emit the
    * main-content text (newline-joined candidate blocks). */
  def mainContent(doc: Document, minChars: Int = 25,
                  maxLinkDensity: Double = 0.5): MainContent = {
    val removed = stripBoilerplate(doc)
    val blocks = candidateBlocks(doc, minChars, maxLinkDensity)
    val text = blocks.map(b => Cleaner.normalizeWhitespace(b.el.getText))
      .filter(_.nonEmpty).mkString("\n")
    MainContent(text, blocks.length, removed, text.length)
  }

  def mainContentFromHtml(html: String): MainContent =
    mainContent(HtmlParser.parse(html))
}
