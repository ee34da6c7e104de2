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

  private def extractMain(html: String): (Option[String], String) = {
    import spark.implicits._
    val r = Seq(html).toDF("h")
      .select(WebFunctions.htmlMainParts(col("h")).getField("title").as("t"),
        WebFunctions.htmlMainText(col("h")).as("x"))
      .head()
    (Option(r.getString(0)), r.getString(1))
  }

  test("main-content extraction drops link-dense chrome, keeps article prose") {
    val page = "<html><head><title>T1</title></head><body>" +
      "<div><a href=\"/\">Home</a> | <a href=\"/about\">About</a> | " +
      "<a href=\"/contact\">Contact</a></div>" +
      "<h1>Story one</h1>" +
      "<p>A quiet meadow stretches beyond the river where the morning light " +
      "settles over the stones and the travelers rest before the long road.</p>" +
      "<p>More context is collected <a href=\"/ref\">here</a> for readers who " +
      "want the complete background on this entry and its later revisions.</p>" +
      "<div><a href=\"/prev\">Prev</a> <a href=\"/next\">Next</a></div>" +
      "<footer><a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a></footer>" +
      "</body></html>"
    // the DEFAULT extraction keeps the chrome (full-fidelity contract unchanged)
    val (_, full) = extract(page)
    assert(full.startsWith("Home | About | Contact\nStory one") &&
      full.endsWith("Prev Next\nTerms Privacy"), s"got <$full>")
    // the main-content variant drops nav/footer/pager, keeps heading + prose
    // (including the prose block that CONTAINS a link — density, not presence)
    val (title, main) = extractMain(page)
    assert(title.contains("T1"))
    assert(main == "Story one\n" +
      "A quiet meadow stretches beyond the river where the morning light " +
      "settles over the stones and the travelers rest before the long road.\n" +
      "More context is collected here for readers who want the complete " +
      "background on this entry and its later revisions.", s"got <$main>")
  }

  test("link-density thresholds: short link-heavy blocks drop, long ones survive") {
    // anchor 12 visible chars of 33 (~36%, >= 1/3) and SHORT (< 80): dropped
    val short = "<p><a href=x>twelve-chars</a> twenty-one-more-chars</p>" +
      "<p>An ordinary prose paragraph that anchors nothing at all here.</p>"
    assert(extractMain(short)._2 ==
      "An ordinary prose paragraph that anchors nothing at all here.")
    // same ~1/3 ratio but LONG (>= 80 visible chars): kept — long mixed prose
    // with citations is article text, not chrome
    val longBlock = "<p><a href=x>thirty-characters-of-anchor-text</a> and then " +
      "sixty more characters of ordinary unlinked prose follow this citation marker</p>"
    val got = extractMain(longBlock)._2
    assert(got.startsWith("thirty-characters-of-anchor-text and then sixty"), s"got <$got>")
    // half-or-more anchor text: dropped at ANY length
    val half = "<p><a href=x>exactly half of these characters live inside the anchor " +
      "element tag</a> exactly half of these characters live inside the anchor tags</p>"
    assert(extractMain(half)._2 == "")
    // anchor-free pages: extractMain == extract (no false positives)
    val plain = "<h1>H</h1><p>alpha beta</p><p>x</p>"
    assert(extractMain(plain)._2 == extract(plain)._2)
    // hostile: stray closes clamp, unterminated anchors stay total
    assert(extractMain("</a></a><p>text survives</p>")._2 == "text survives")
    extractMain("<a href=x>never closed " * 50) // must not throw
    // an UNCLOSED anchor must not leak anchor-ness past its block boundary
    // and silently drop the whole article (crawled pages are full of these)
    val leaky = "<div><a href=/x>Home</a> <a href=/y>About</div>" + // never closed
      "<p>The long article paragraph with plenty of ordinary prose that must " +
      "survive the filter even though an earlier anchor never closed.</p>"
    val l = extractMain(leaky)._2
    assert(l.startsWith("The long article paragraph"), s"got <$l>")
    // the tokenizer rule: a second <a> implicitly closes the first — only the
    // genuine link text counts as anchor chars, so the prose-heavy block with
    // two sloppy anchors at its head survives
    val implicitClose = "<p><a href=/x>Home<a href=/y>About</a> and then a good " +
      "long run of unlinked prose follows these two sloppy anchors here.</p>"
    val ic = extractMain(implicitClose)._2
    // (inline tags vanish without inserting whitespace — same as extract)
    assert(ic.startsWith("HomeAbout and then"), s"got <$ic>")
    // QUOTED XHTML self-close opens nothing (XHTML quotes its attributes);
    // the UNQUOTED form is, per the HTML tokenizer, a '/' inside the value —
    // it opens a REAL anchor, so the all-anchor block drops
    assert(extractMain("<p><a name=\"top\"/>Pure prose paragraph with no link text.</p>")._2
      .startsWith("Pure prose"))
    assert(extractMain("<p><a name=top/>all of this is anchor text now</p>")._2 == "")
    // unquoted href ending in '/' is a VALUE character, not a self-close:
    // '<a href=/>Home</a>' is a real link and the nav row must still drop
    assert(extractMain("<div><a href=/>Home</a> | <a href=/a/>About</a></div>" +
      "<p>A full paragraph of ordinary article prose that easily survives.</p>")._2
      .startsWith("A full paragraph"))
    // pretty-printed markup: a newline INSIDE a properly closed anchor must
    // not launder its text as prose — the link-dense list still drops
    val pretty = "<ul><li><a href=\"/about\">\n  About this site\n</a></li>" +
      "<li><a href=\"/contact\">\n  Contact the team\n</a></li></ul>" +
      "<p>Meanwhile the real article text keeps flowing and stays kept here.</p>"
    val pr = extractMain(pretty)._2
    assert(pr == "Meanwhile the real article text keeps flowing and stays kept here.",
      s"got <$pr>")
    // an UNCLOSED anchor in block-tag-free markup (converted plain text, pre
    // bodies) must not poison the whole page: the reach cap (400 visible
    // chars) contains the leak, so text past it survives the filter
    val sentence = "Ordinary prose keeps arriving line after line in this page. " // 60 ch
    val noTags = "<a name=top>Welcome\n" + (sentence + "\n") * 12
    val nt = extractMain(noTags)._2
    assert(nt.nonEmpty && nt.contains("Ordinary prose"),
      s"unclosed anchor must not drop the whole page: <${nt.take(80)}>")
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
