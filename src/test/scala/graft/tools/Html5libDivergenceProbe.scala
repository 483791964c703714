package graft.tools

import graft.clean.Sanitize

/** Emits the html5lib-divergence fixture family as JSON: for each
  * tag-soup-inside-pre/code shape, this engine's current bleachClean
  * output (html.parser-faithful DOM walk). Run once, freeze the stdout
  * JSON into src/test/resources/golden/html5lib_divergence.json; the
  * spec then pins current behavior per shape while the `html5lib_note`/
  * `citation` fields bound what bleach's html5lib re-parse would repair
  * differently (unarbitratable offline — no bleach/html5lib in the
  * container). */
object Html5libDivergenceProbe {
  val shapes: Seq[(String, String, String, String)] = Seq(
    ("foster_parenting_table",
      "<pre><table><b>bold</b><tr><td>cell</td></tr></table></pre>",
      "html5lib re-parents the <b> subtree BEFORE the <table> (tokens in 'in table' mode that are not table content are foster-parented); html.parser keeps document order inside the table",
      "WHATWG HTML 13.2.6.1 'foster parenting' + 13.2.6.4.9 'in table'"),
    ("table_loose_text_foster",
      "<pre><table>loose<td>cell</td></table></pre>",
      "the character token 'loose' is foster-parented out of the table by html5lib; html.parser leaves it where it lexed",
      "WHATWG HTML 13.2.6.4.9 'in table', anything-else clause"),
    ("adoption_agency_misnested",
      "<pre><b>one<i>two</b>three</i></pre>",
      "html5lib runs the adoption agency algorithm, splitting <i> so 'three' gets a fresh <i> sibling; html.parser closes tags in the order the end tags arrive",
      "WHATWG HTML 13.2.6.4.7 'adoption agency algorithm'"),
    ("p_auto_close",
      "<code><p>first<p>second</code>",
      "a <p> start tag with a p element in button scope implies </p>: html5lib emits two sibling paragraphs; html.parser nests the second inside the first",
      "WHATWG HTML 13.2.6.4.7 'in body', 'p' start tag"),
    ("li_auto_close",
      "<code><ul><li>a<li>b</ul></code>",
      "an <li> start tag closes an open li: html5lib emits siblings; html.parser nests",
      "WHATWG HTML 13.2.6.4.7 'in body', 'li' start tag"),
    ("stray_end_p_synthesizes",
      "<pre>text</p>more</pre>",
      "an end tag 'p' with no open p makes html5lib synthesize an empty <p></p> at that point; html.parser drops the stray end tag entirely",
      "WHATWG HTML 13.2.6.4.7 'in body', 'p' end tag parse error branch"),
    ("nested_body_ignored",
      "<pre><body class=\"x\"><div>d</div></pre>",
      "a <body> start tag while a body is open is a parse error whose attributes merge onto the existing body — html5lib materializes NO element; html.parser produces an element named body",
      "WHATWG HTML 13.2.6.4.7 'in body', 'body' start tag"),
    ("head_in_body_ignored",
      "<code><head><meta charset=\"y\"></head>x</code>",
      "a <head> start tag in body is ignored by html5lib; html.parser materializes it",
      "WHATWG HTML 13.2.6.4.7 'in body', 'head' start tag (ignored)"),
    ("second_form_ignored",
      "<pre><form><div><form><input></form></div></form></pre>",
      "a <form> start tag while the form element pointer is set is ignored by html5lib; html.parser nests a second form",
      "WHATWG HTML 13.2.6.4.7 'in body', 'form' start tag"),
    ("select_drops_flow_content",
      "<code><select><div>d</div><option>o</option></select></code>",
      "in 'in select' mode html5lib ignores the <div> start/end tags (its text falls through); html.parser keeps the div element",
      "WHATWG HTML 13.2.6.4.16 'in select', anything-else clause"))

  def main(a: Array[String]): Unit = {
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val rows = shapes.map { case (name, input, note, cite) =>
      val current = Sanitize.bleachClean(input, Set("pre", "code"))
      s"""  {"name": "${esc(name)}",
         |   "input": "${esc(input)}",
         |   "current": "${esc(current)}",
         |   "verdict": "expected-unknown",
         |   "html5lib_note": "${esc(note)}",
         |   "citation": "${esc(cite)}"}""".stripMargin
    }
    println("[\n" + rows.mkString(",\n") + "\n]")
  }
}
