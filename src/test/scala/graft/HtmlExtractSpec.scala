package graft

import graft.text.HtmlExtract._

/** HTML → text extraction and jusText-style boilerplate removal. */
class HtmlExtractSpec extends SparkSuite {

  private val page =
    """<html><head><title>The &quot;Big&quot; Story &mdash; Site</title>
      |<style>body { color: red }</style>
      |<script>var x = "<p>not text</p>";</script></head>
      |<body>
      |<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a></nav>
      |<h2>A heading for the piece</h2>
      |<p>This is the first real paragraph of the article, long enough to pass the
      |minimum block length and containing no links at all, just prose for readers.</p>
      |<p>The second paragraph continues the story with more prose; it mentions a
      |<a href="/ref">reference</a> once but remains overwhelmingly plain text.</p>
      |<div class="share"><a href="#t">Tweet</a> <a href="#f">Share</a> <a href="#l">Link</a></div>
      |<footer><a href="/terms">Terms</a> &copy; 2026 <a href="/privacy">Privacy</a></footer>
      |</body></html>""".stripMargin

  test("stripTags: script/style dropped, entities decoded, block boundaries become lines") {
    val t = stripTags(page)
    assert(!t.contains("color: red") && !t.contains("var x"))
    assert(t.contains("Home News About") || t.contains("Home") && t.contains("News"))
    assert(t.contains("first real paragraph"))
    assert(t.contains("© 2026"))
    assert(t.contains("The \"Big\" Story — Site"))
    // block tags produced separate lines
    assert(t.linesIterator.size >= 5)
  }

  test("mainText: nav/share/footer chrome dropped, article prose and its heading kept") {
    val main = mainText(page)
    assert(main.contains("first real paragraph"), main)
    assert(main.contains("second paragraph"))
    assert(main.contains("A heading for the piece"), "sandwiched heading rescued")
    assert(!main.contains("Tweet") && !main.contains("Privacy") && !main.contains("Home"))
  }

  test("entities: named, decimal, hex, unknown pass-through, non-BMP") {
    assert(decodeEntities("a &amp; b &lt;c&gt; &#65;&#x42; &unknown; &#x1F600;") ==
      "a & b <c> AB &unknown; 😀")
  }

  test("title extraction and null/truncation safety") {
    assert(title(page).contains("The \"Big\" Story — Site"))
    assert(title("<html><body>no title</body>").isEmpty)
    assert(title(null).isEmpty && stripTags(null) == null && mainText(null) == null)
    // truncated tag at end does not throw
    assert(stripTags("<p>hello<div cla").contains("hello"))
    // unclosed script swallows the rest rather than leaking code as text
    assert(!stripTags("<p>ok</p><script>var y=1;").contains("var y"))
  }
}
