package graft

import graft.functions.WebFunctions
import org.apache.spark.sql.functions._

/** HTML → visible-text extraction: structure, entities, hostile input, and the
  * WARC → html → curation chain.
  */
class HtmlSpec extends SparkSpec {

  private def extract(html: String): (Option[String], String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(WebFunctions.htmlTitle(col("h")).as("t"),
        WebFunctions.htmlToText(col("h")).as("x"))
      .head()
    (Option(r.getString(0)), r.getString(1))
  }

  test("html extraction: structure, chrome removal, entities, title") {
    val (title, text) = extract(
      """<html><head><title>The &amp; Title</title>
        |<style>p { color: red }</style>
        |<script>var x = "<p>fake paragraph</p>";</script></head>
        |<body><h1>Heading</h1><!-- secret comment -->
        |<p>alpha &amp; beta</p>
        |<p>gamma&nbsp;delta &lt;tag&gt; &#65;&#x42;</p>
        |<ul><li>one</li><li>two</li></ul>
        |<table><tr><td>c1</td><td>c2</td></tr></table>
        |<div>tail <b>bold</b> <span>span</span></div>
        |<![CDATA[ raw ]]></body></html>""".stripMargin)
    assert(title.contains("The & Title"))
    assert(text ==
      "Heading\nalpha & beta\ngamma delta <tag> AB\none\ntwo\nc1 c2\ntail bold span",
      s"got <$text>")
  }

  test("html extraction is total on hostile input") {
    // unterminated comment/script/tag/entity: consume to end, never throw
    assert(extract("before<!-- never closed")._2 == "before")
    assert(extract("<script>var x = 1;")._2 == "")
    assert(extract("text <div unterminated")._2 == "text")
    assert(extract("a &unknownentity; b")._2 == "a &unknownentity; b")
    assert(extract("a &amp b")._2 == "a &amp b", "no semicolon: literal ampersand")
    assert(extract("5 < 6 and 7 > 4")._2 == "5 < 6 and 7 > 4",
      "a bare < followed by non-letter is text, not a tag")
    // '<' + digit is TEXT per the HTML tokenizer, not a tag to swallow
    assert(extract("for n<10 and m>5 holds")._2 == "for n<10 and m>5 holds")
    assert(extract("I <3 you")._2 == "I <3 you")
    // doctypes and processing instructions are chrome, not prose — virtually
    // every crawled page starts with one
    assert(extract("<!doctype html><p>hi</p>")._2 == "hi")
    assert(extract("<?xml version=\"1.0\"?><p>hi</p>")._2 == "hi")
    assert(extract("<![if !IE]>x<![endif]>")._2 == "x")
    assert(extract("<!doctype html")._2 == "", "unterminated doctype: consumed")
    // '>' inside a quoted attribute must not end the tag
    assert(extract("""<a href="x?a>b">link</a> end""")._2 == "link end")
    // invalid numeric refs are dropped, not emitted as control garbage
    assert(extract("a&#0;b&#xD800;c")._2 == "abc")
    // ...but a SUPPLEMENTARY codepoint whose low 16 bits look like a surrogate
    // is valid and must decode (truncate-to-char misclassifies every plane)
    assert(extract("x&#x1D800;y")._2 == "x𝠀y")
    // whitespace refs act as whitespace: CR must separate words, not fuse them;
    // &#160; and a literal NBSP canonicalize exactly like &nbsp;
    assert(extract("word1&#13;word2")._2 == "word1 word2")
    assert(extract("a&#160;b")._2 == "a b" && extract("a b")._2 == "a b")
    // a bare ampersand must not swallow following markup: the entity scan stops
    // at '<' so the style element is still recognized and its CSS dropped
    assert(extract("AT&T<style>a{b:c;}</style> rocks")._2 == "AT&T rocks")
    assert(extract("<p>Fish & Chips</p><script>var a=1;</script>ok")._2 ==
      "Fish & Chips\nok")
    // '</scripts>' inside script code is NOT a close tag (needs ws / '/' / '>')
    assert(extract("""<script>var s="</scripts>";bad()</script>ok""")._2 == "ok")
    // quadratic guard: a megabyte of bare '<' completes. The generous bound only
    // exists to catch O(n^2) (which needs ~minutes here); linear is ~10 ms, so
    // even heavy CI contention stays orders of magnitude inside it
    val start = System.nanoTime()
    assert(extract("<" * 1000000)._2 == "<" * 1000000)
    assert((System.nanoTime() - start) < 60e9, "bare-'<' run must be linear")
    // empty and whitespace-only
    assert(extract("")._2 == "" && extract("   \n\t  ")._2 == "")
    assert(extract("<p></p><div></div>")._2 == "")
    // NULL propagates (nullable struct)
    import spark.implicits._
    val r = Seq(null.asInstanceOf[String]).toDF("h")
      .select(WebFunctions.htmlParts(col("h")).as("p")).head()
    assert(r.isNullAt(0))
  }

  test("WARC -> html -> text chain produces curated prose") {
    import graft.operators.Warc
    import spark.implicits._
    val page = """<html><head><title>T</title></head><body>
                 |<p>The quick brown fox jumps over the lazy dog.</p>
                 |<script>trackUser();</script></body></html>""".stripMargin
    val blob = Warc.encodeWarc(Seq(Warc.encodeResponseRecord(
      "https://example.com/", "2026-01-01T00:00:00Z", "<urn:uuid:1>", 200,
      "text/html", page.getBytes("ISO-8859-1"))), gzip = true)
    val texts = Warc.responseTexts(Seq((1L, blob)).toDF("id", "warc"), "warc")
      .withColumn("prose", WebFunctions.htmlToText(col("text")))
    val prose = texts.select("prose").head().getString(0)
    assert(prose == "The quick brown fox jumps over the lazy dog.", s"got <$prose>")
  }
}
