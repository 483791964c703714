package graft.clean

import org.scalatest.funsuite.AnyFunSuite

/** Direct cases for the bleach.clean emulation used by
  * `preserve_code_blocks` (content_processor.py:131-133), pinned to
  * public bleach's `BleachSanitizerFilter.disallowed_token`
  * reconstruction (SURVEY §7.5 #2, narrowed r4). */
class SanitizeSpec extends AnyFunSuite {

  private def clean(html: String): String =
    Sanitize.bleachClean(html, Set("pre", "code"))

  test("allowed tags serialized bare (attributes dict is tag-keyed: nothing allowed)") {
    assert(clean("<pre class=\"lang\"><code id=\"c\">x</code></pre>") ==
      "<pre><code>x</code></pre>")
  }

  test("escaped disallowed tags KEEP their attributes (r4, bleach disallowed_token)") {
    assert(clean("<code><span class=\"kw\">val</span></code>") ==
      "<code>&lt;span class=\"kw\"&gt;val&lt;/span&gt;</code>")
    // raw value inserted, then Characters-escaped: & surfaces as entity,
    // embedded quotes stay raw (bleach's anti-double-escaping NOTE)
    assert(clean("<code><a href=\"/x?a=1&amp;b=2\">l</a></code>") ==
      "<code>&lt;a href=\"/x?a=1&amp;b=2\"&gt;l&lt;/a&gt;</code>")
  }

  test("disallowed voids are ONE escaped token — no fabricated end tag (r4)") {
    assert(clean("<code>a<br>b</code>") == "<code>a&lt;br&gt;b</code>")
    assert(clean("<code><img src=\"x.png\">t</code>") ==
      "<code>&lt;img src=\"x.png\"&gt;t</code>")
  }

  test("valueless attributes reconstruct as empty-string values (html5lib attr shape)") {
    assert(clean("<code><span hidden>x</span></code>") ==
      "<code>&lt;span hidden=\"\"&gt;x&lt;/span&gt;</code>")
  }

  test("comments stripped; text escaped as Characters") {
    assert(clean("<code><!-- c -->a < b</code>") == "<code>a &lt; b</code>")
  }
}
