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
