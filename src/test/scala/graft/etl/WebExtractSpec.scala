package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[WebExtract.extractText]]'s contract order: script/style
  * bodies (with bare `<` inside) go before the tag strip, comments
  * vanish, entities decode AFTER tags with `&amp;` LAST (so
  * `&amp;lt;` yields the literal text `&lt;` — correct HTML
  * semantics, not a fabricated tag), and whitespace collapses. */
class WebExtractSpec extends SparkSpec {

  private def extract(html: String): String = {
    val s = spark; import s.implicits._
    Seq(html).toDF("h")
      .select(WebExtract.extractText(col("h")).as("x"))
      .head().getString(0)
  }

  test("script bodies with bare '<' strip BEFORE the tag pass") {
    assert(extract("""a<script>if (1 < 2) { x("</b>"); }</script>b""")
      == "a b")
  }

  test("style, comments, tags, entity decode, whitespace collapse") {
    assert(extract("<style>p{a:1}</style><p>x &amp; y</p><!-- no -->  z")
      == "x & y z")
    assert(extract("<p>a</p><br/><div class=\"q\">b</div>") == "a b")
    assert(extract("&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
      == "<tag> \"q\" 's' end")
  }

  test("&amp; decodes LAST: &amp;lt; is the literal text &lt;, never a tag") {
    assert(extract("<p>a &amp;lt; b</p>") == "a &lt; b")
  }

  test("parser tier == regex tier on well-formed markup (the q257 page " +
    "shape), including script-with-bare-'<', comments, entities") {
    val pages = Seq(
      ("doc one body text here", "en", "src_a", 1L),
      ("zweiter text &  mehr", "de", "src_b", 2L),
      ("tercero", "es", "src_c", 3L)).map { case (text, lang, source, id) =>
      "<html><!-- doc:" + id + " --><head><title>" + source +
        "</title><style>p { margin: 0 }</style>" +
        "<script type=\"text/javascript\">var lang = \"" + lang +
        "\"; if (1 < 2) { track(); }</script></head><body><h1>" + source +
        "</h1><nav><a href=\"/home\">home</a> " +
        "<a href=\"/about\">about</a></nav><p>" + text +
        "</p><footer>contact &amp; legal &#39;2024&#39;" +
        "</footer></body></html>"
    }
    pages.foreach { html =>
      assert(WebExtract.extractTextParsed(html) == extract(html),
        s"tier divergence on well-formed page:\n$html")
    }
  }

  test("parser tier stays correct on the malformed cases the regex tier " +
    "documents as out of scope (literal '>' in an attribute value)") {
    val html = """<p>a</p><a title="x > y">link</a><p>b</p>"""
    assert(WebExtract.extractTextParsed(html) == "a link b")
    // the regex tier degrades here (documented): the first tag strip
    // stops at the attribute's '>' and leaks the tail — the parity
    // break is exactly why the parser tier exists
    assert(extract(html) != "a link b")
  }

  test("extractParsed frame plumbing: narrow typed map, ids preserved") {
    val s = spark; import s.implicits._
    val in = Seq((7L, "<p>hi &amp; bye</p>"), (8L, "<b>x</b>"))
      .toDS()
    val out = WebExtract.extractParsed(in).collect().toMap
    assert(out == Map(7L -> "hi & bye", 8L -> "x"))
    assert(!WebExtract.extractParsed(in).queryExecution.executedPlan
      .toString.contains("Exchange"), "extraction must stay shuffle-free")
  }

  test("q257 census: extraction is non-empty per doc and overhead is positive") {
    val s = spark; import s.implicits._
    val out = graft.SparkEntry.queries("q257_web_extract")(s, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, n, toks, chars, overhead) =>
      assert(n > 0 && toks > n && chars > 0, s"$lang: extraction lost the body")
      assert(overhead > 0, s"$lang: markup overhead must be positive")
    }
  }
}
