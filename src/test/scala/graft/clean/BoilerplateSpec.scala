package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HtmlParser

class BoilerplateSpec extends AnyFunSuite {

  private val page = """<html><body>
    <nav><a href="/">Home</a> <a href="/a">Products</a> <a href="/b">About</a></nav>
    <div class="sidebar"><p>Subscribe to our newsletter for updates and promotions today!</p></div>
    <article>
      <p>The main article body contains the real content, with several sentences,
         some punctuation, and enough length to pass the candidate threshold.</p>
      <p>A second paragraph keeps going, adding more meaningful prose that a
         reader actually came for, including details and a comma, twice.</p>
    </article>
    <div id="comments"><p>First! Great post, thanks for sharing this with all of us.</p></div>
    <footer><p>Copyright 2024 Example Corp. All rights reserved. Privacy. Terms.</p></footer>
    <script>trackPageView();</script>
    </body></html>"""

  test("main content keeps article prose, drops nav/footer/sidebar/comments/script") {
    val mc = Boilerplate.mainContentFromHtml(page)
    assert(mc.text.contains("main article body"))
    assert(mc.text.contains("second paragraph"))
    assert(!mc.text.contains("Home"))
    assert(!mc.text.contains("newsletter"))
    assert(!mc.text.contains("Copyright"))
    assert(!mc.text.contains("Great post"))
    assert(!mc.text.contains("trackPageView"))
    assert(mc.strippedElements >= 4)
    assert(mc.blocks == 2)
  }

  test("link-density filter drops link farms") {
    val farm = """<div><p><a href="1">aaaaaaaaaaaaaaa</a> <a href="2">bbbbbbbbbbbbbbb</a>
      <a href="3">ccccccccccccccc</a></p><p>Real text persists here even among links,
      with plenty of plain words around it to stay under the threshold.</p></div>"""
    val mc = Boilerplate.mainContentFromHtml(farm)
    assert(mc.text.contains("Real text persists"))
    assert(!mc.text.contains("aaaaaaaaaaaaaaa"))
  }

  test("good class names rescue content-looking containers") {
    val html = """<div class="post-content nav"><p>Long enough content sentence that
      should survive because the class also mentions post-content explicitly.</p></div>"""
    val mc = Boilerplate.mainContentFromHtml(html)
    assert(mc.text.contains("should survive"))
  }

  test("deterministic across runs") {
    val a = Boilerplate.mainContentFromHtml(page)
    val b = Boilerplate.mainContentFromHtml(page)
    assert(a == b)
  }

  test("50k-deep adversarial nesting does not overflow the stack") {
    // the parser is iterative and depth-unbounded; the boilerplate walks
    // must be too (they run outside extractPage's per-row Throwable net)
    val depth = 50000
    val sb = new StringBuilder
    (0 until depth).foreach(_ => sb.append("<div>"))
    sb.append("<p>deep content paragraph with enough characters to qualify as a block</p>")
    val mc = Boilerplate.mainContentFromHtml(sb.toString)
    assert(mc.text.contains("deep content paragraph"))
    assert(mc.blocks == 1)
  }

  test("byte-contract mode untouched: Cleaner does not call Boilerplate") {
    // nav/footer text INCLUDED in the reference-faithful text
    val res = Cleaner.cleanAndNormalize(page, "https://e.com/")
    assert(res.text.contains("Home"))
    assert(res.text.contains("Copyright"))
  }
}
