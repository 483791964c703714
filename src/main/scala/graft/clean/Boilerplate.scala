package graft.clean

import graft.html._
import scala.collection.mutable.ArrayBuffer

/**
 * Boilerplate-strip heuristics (north_rule: "text-density/link-density
 * scoring, tag-class blocklists for nav/footer/script/ads, readability-style
 * block classification"). This is a SEPARATE, flag-gated pass — the
 * byte-identical reference mode (Cleaner) never invokes it (SURVEY §7.1
 * item 2). Pure function over the raw DOM; deterministic.
 *
 * Algorithm (readability-family, simplified for determinism):
 *  1. hard-strip: script/style/noscript/template/iframe/svg/form/button +
 *     elements whose class/id match the boilerplate lexicon;
 *  2. per block-level element compute text length, link-text length,
 *     punctuation count → linkDensity = linkChars/chars,
 *     textDensity = chars/(descendant tags + 1);
 *  3. candidate blocks: chars >= minChars ∧ linkDensity <= maxLinkDensity;
 *  4. main content = the subtree with the highest cumulative candidate
 *     score; emit its candidate blocks' text, newline-joined.
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
    def walk(e: Element): Unit = {
      var i = e.children.length - 1
      while (i >= 0) {
        e.children(i) match {
          case el: Element =>
            if (isBoilerplateEl(el)) { el.extract(); removed += 1 }
            else walk(el)
          case _ =>
        }
        i -= 1
      }
    }
    walk(doc)
    removed
  }

  private def textStats(el: Element): (Int, Int, Int) = {
    var chars = 0
    var linkChars = 0
    var commas = 0
    def walk(e: Element, inLink: Boolean): Unit = {
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
        case c: Element => walk(c, inLink || c.name == "a")
        case _ =>
      }
    }
    walk(el, el.name == "a")
    (chars, linkChars, commas)
  }

  /** Candidate content blocks after stripping, in document order. */
  def candidateBlocks(doc: Document, minChars: Int = 25,
                      maxLinkDensity: Double = 0.5): Seq[Block] = {
    val out = ArrayBuffer.empty[Block]
    def walk(e: Element, depth: Int): Unit = {
      e.children.foreach {
        case el: Element =>
          // a block counts if none of its descendants is itself a block
          // holding the text (leaf-most block wins): recurse first
          val before = out.length
          walk(el, depth + 1)
          val childBlocks = out.length - before
          if (childBlocks == 0 && blockTags.contains(el.name)) {
            val (chars, linkChars, commas) = textStats(el)
            if (chars >= minChars) {
              val b = Block(el, chars, linkChars, commas, depth)
              if (b.linkDensity <= maxLinkDensity) out += b
            }
          }
        case _ =>
      }
    }
    walk(doc, 0)
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
