package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass HTML → visible-text kernel (static so generated code calls it
  * directly) — the step between [[graft.operators.Warc.responseTexts]] (raw
  * crawled HTML) and the text-curation chain (which wants prose). Pure
  * structural extraction, the trafilatura-lite every crawl pipeline runs:
  *
  *   - `<script>`/`<style>`/`<noscript>` content, comments, and CDATA dropped
  *   - `<title>` captured into its own field (head text is chrome, not prose)
  *   - block-level tags (p/div/br/li/h1-6/tr/…) become newlines, table cells
  *     become spaces, inline tags (b/i/span/a/…) vanish
  *   - character entities decoded: the named set below plus numeric
  *     `&#NNN;`/`&#xHH;`; unknown entities kept literally (never guessed)
  *   - whitespace normalized: space runs collapse, newline runs collapse to
  *     one, edges trimmed
  *
  * TOTAL on arbitrary bytes-as-text (unterminated tags/comments/entities
  * consume to end-of-input, never throw) — it runs inside executor projections
  * over 100 TB of crawled pages, where one exception kills a task.
  */
object HtmlKernel {

  private val BlockTags: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
      "tr", "table", "thead", "tbody", "tfoot", "caption", "section", "article",
      "header", "footer", "blockquote", "pre", "hr", "nav", "aside", "form",
      "dd", "dt", "dl", "figure", "figcaption", "main", "address", "fieldset",
      "legend").foreach(s.add)
    s
  }

  private val Entities: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("amp", "&"); m.put("lt", "<"); m.put("gt", ">"); m.put("quot", "\"")
    m.put("apos", "'"); m.put("nbsp", " "); m.put("mdash", "—")
    m.put("ndash", "–"); m.put("hellip", "…"); m.put("rsquo", "’")
    m.put("lsquo", "‘"); m.put("ldquo", "“"); m.put("rdquo", "”")
    m.put("copy", "©"); m.put("reg", "®"); m.put("trade", "™")
    m.put("deg", "°"); m.put("middot", "·"); m.put("bull", "•")
    m.put("laquo", "«"); m.put("raquo", "»"); m.put("times", "×")
    m.put("shy", "") // soft hyphen: drop — it is a rendering hint, not text
    m
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Position of the REAL `</name` close tag at/after `from`, or -1. Per the
    * HTML raw-text rules the prefix only closes the element when followed by
    * whitespace, '/', '>', or end-of-input — `"</scripts>"` inside script code
    * must not terminate the script element and leak the rest as prose.
    */
  private def closeTagAt(s: String, name: String, from: Int): Int = {
    val needle = "</" + name
    var e = indexOfIgnoreCase(s, needle, from)
    while (e >= 0) {
      val after = e + needle.length
      if (after >= s.length || s.charAt(after) == '>' || s.charAt(after) == '/' ||
        Character.isWhitespace(s.charAt(after))) return e
      e = indexOfIgnoreCase(s, needle, e + 1)
    }
    -1
  }

  /** Decode the entity at `s(i)` (== '&'): (replacement, chars consumed).
    * Unknown names and bare ampersands stay literal.
    */
  private def entityAt(s: String, i: Int): (String, Int) = {
    val limit = math.min(s.length, i + 32)
    var j = i + 1
    // an HTML character reference ends at ';' and cannot span markup or
    // whitespace — scanning past '<' would swallow a following tag open
    // ("AT&T<style>…" must not consume the style element as an entity name)
    var blocked = false
    while (j < limit && !blocked && s.charAt(j) != ';') {
      val c = s.charAt(j)
      if (c == '<' || c == '&' || Character.isWhitespace(c)) blocked = true
      else j += 1
    }
    if (blocked || j >= limit || j == i + 1) return ("&", 1) // bare ampersand
    val name = s.substring(i + 1, j)
    val len = j - i + 1
    if (name.charAt(0) == '#') {
      val num = name.substring(1)
      val cp =
        try {
          if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      // (a 0xA0 ref emits U+00A0, which normalize() collapses like &nbsp;)
      // only BMP values can BE surrogates — truncating a supplementary
      // codepoint to char would misclassify every plane's *D800-*DFFF range
      if (cp >= 0x20 && cp <= 0x10FFFF &&
        !(cp <= 0xFFFF && Character.isSurrogate(cp.toChar)))
        (new String(Character.toChars(cp)), len)
      else if (cp == 0x9 || cp == 0xA || cp == 0xD) (" ", len) // whitespace refs
      else ("", len) // control/invalid refs: drop, never emit garbage
    } else Entities.get(name) match {
      case null => (s.substring(i, j + 1), len) // unknown: keep literally
      case rep => (rep, len)
    }
  }

  /** One prose block between block-tag boundaries, with the visible-character
    * counts the main-content filter needs: `nonWs` visible (non-whitespace)
    * chars, of which `anchorNonWs` were emitted inside an `<a>` element.
    */
  private final class Block {
    val raw = new java.lang.StringBuilder(64)
    var nonWs = 0
    var anchorNonWs = 0
  }

  /** The ONE whitespace predicate behind the walk's visible-char counts,
    * [[normalizeBlock]], and [[normalize]] -- the extract/extractMain parity
    * invariant and the link-density counts assume these agree character-for-
    * character, so there is exactly one copy to edit. ('\n' is handled
    * separately everywhere: it is a block boundary, not in-block whitespace.)
    */
  private def isSpaceChar(c: Char): Boolean = c == ' ' || c == '\t' ||
    c == '\r' || c == '\u000B' || c == '\f' || c == '\u00A0'

  /** The extraction walk: title + the block sequence. Joining ALL non-empty
    * normalized blocks with '\n' reproduces the original single-pass
    * normalize() exactly (a block boundary IS where it emitted a newline;
    * empty blocks are the newline runs it collapsed; per-block space collapse
    * + the final join trim are its space rule) — pinned by HtmlSpec and the
    * html_extract oracle. Collecting blocks instead of one string is what lets
    * [[extractMain]] filter boilerplate by link density without a second walk.
    */
  private def walkBlocks(s: String): (String, scala.collection.mutable.ArrayBuffer[Block]) = {
    val n = s.length
    val blocks = scala.collection.mutable.ArrayBuffer[Block]()
    var cur = new Block
    var inAnchor = false
    var anchorRun = 0 // visible chars counted since the anchor opened
    // Block-TAG boundaries clear the anchor flag: HTML5 legally allows an <a>
    // to wrap block elements (card links), but crawled pages are full of
    // NEVER-CLOSED anchors, and carrying anchor-ness across block boundaries
    // would count everything after the leak as link text -- extractMain would
    // then silently drop whole articles. Failing OPEN (a card-link block
    // counted as prose) costs one block; failing closed costs pages. A
    // literal source NEWLINE is a block boundary for the text but NOT an
    // anchor boundary: pretty-printed markup routinely wraps lines inside a
    // properly closed <a>, and clearing there would let every such nav link
    // evade the density filter.
    def endBlock(clearAnchor: Boolean): Unit = {
      if (cur.raw.length > 0) { blocks += cur; cur = new Block }
      if (clearAnchor) inAnchor = false
    }
    def emit(c: Char): Unit =
      if (c == '\n') endBlock(clearAnchor = false) // literal newline: block boundary
      else {
        cur.raw.append(c)
        if (!isSpaceChar(c)) {
          cur.nonWs += 1
          if (inAnchor) {
            cur.anchorNonWs += 1
            anchorRun += 1
            // reach cap: an anchor LABEL is short, and block tags clear the
            // flag anyway — only an UNCLOSED anchor in block-tag-free markup
            // (converted plain text, <pre> bodies) can run this far, and
            // letting it would count the rest of the page as link text and
            // drop it wholesale. 400 visible chars bounds that damage while
            // leaving every real label and card link untouched.
            if (anchorRun > 400) inAnchor = false
          }
        }
      }
    def emitStr(str: String): Unit = {
      var x = 0
      while (x < str.length) { emit(str.charAt(x)); x += 1 }
    }
    var title: String = null
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          // markup declaration / processing instruction (<!DOCTYPE html>,
          // <?xml ...?>, <![if !IE]>): consume to '>' — without this, the
          // doctype virtually every crawled page starts with leaks into prose
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          // a tag NAME starts with an ASCII letter (the HTML tokenizer rule is
          // ASCII-only) — "n<10" and CJK/Cyrillic prose like "x<五十" must both
          // stay text, not get swallowed to the next '>'
          def asciiAlnum(c: Char): Boolean =
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
          if (j < n && (s.charAt(j) >= 'a' && s.charAt(j) <= 'z' ||
            s.charAt(j) >= 'A' && s.charAt(j) <= 'Z')) {
            j += 1
            while (j < n && asciiAlnum(s.charAt(j))) j += 1
          }
          val name =
            if (j > ns) s.substring(ns, j).toLowerCase(java.util.Locale.ROOT) else ""
          if (name.isEmpty) {
            // "<" followed by non-tag text ("a < b"): literal character. Checked
            // BEFORE the '>'-scan — a run of bare '<' with no later '>' would
            // otherwise rescan to end-of-string per character, O(n^2) on hostile
            // binary-as-html input
            emit('<'); i += 1
          } else {
          // find the tag's '>' — attribute values may contain one, so track quotes
          var k = j
          var inQ = 0.toChar
          while (k < n && (s.charAt(k) != '>' || inQ != 0)) {
            val c2 = s.charAt(k)
            if (inQ == 0 && (c2 == '"' || c2 == '\'')) inQ = c2
            else if (inQ != 0 && c2 == inQ) inQ = 0.toChar
            k += 1
          }
          val tagEnd = if (k < n) k + 1 else n
          if (!closing &&
            (name == "script" || name == "style" || name == "noscript" || name == "title")) {
            val e = closeTagAt(s, name, tagEnd)
            if (name == "title" && title == null) {
              val end = if (e < 0) n else e
              title = normalize(decodeAll(s.substring(tagEnd, end)))
              if (title.isEmpty) title = null
            }
            if (e < 0) i = n
            else { val ge = s.indexOf('>', e); i = if (ge < 0) n else ge + 1 }
          } else {
            if (name == "a") {
              // the HTML tokenizer forbids nested <a>: a second open tag
              // implicitly closes the first, so the state is a FLAG set on
              // open and cleared on close -- never a depth that a sloppy
              // page's unclosed anchor could leak past the next anchor.
              // Self-close per the tokenizer: a '/' inside an UNQUOTED
              // attribute value is a VALUE character ('<a href=/>' and
              // '<a name=top/>' both open real anchors), so only a '/'
              // right after the name or following a quote/whitespace counts
              // as XML-style self-closing (XHTML quotes its attributes).
              val slashAt = tagEnd - 2 // char before a REAL '>' (k < n)
              val selfClosing = k < n && slashAt >= j && s.charAt(slashAt) == '/' && {
                slashAt == j || {
                  // tokenizer whitespace is ASCII-only (tab/LF/FF/CR/space):
                  // exotic whitespace inside an unquoted value is a VALUE
                  // character, so '/' after it does not self-close
                  val pc = s.charAt(slashAt - 1)
                  pc == '"' || pc == '\'' || pc == ' ' || pc == '\t' ||
                    pc == '\n' || pc == '\r' || pc == '\f'
                }
              }
              if (closing) inAnchor = false
              else if (!selfClosing) { inAnchor = true; anchorRun = 0 }
            }
            if (BlockTags.contains(name)) endBlock(clearAnchor = true)
            else if (name == "td" || name == "th") emit(' ')
            i = tagEnd
          }
          }
        }
      } else if (ch == '&') {
        val (rep, adv) = entityAt(s, i)
        emitStr(rep); i += adv
      } else { emit(ch); i += 1 }
    }
    endBlock(clearAnchor = true)
    (title, blocks)
  }

  /** Collapse space runs within a block to one space, trim edges (the
    * within-block half of the original normalize(); block joins supply the
    * newline half).
    */
  private def normalizeBlock(s: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isSpaceChar(c)) pendingSpace = true
      else {
        if (out.length > 0 && pendingSpace) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  private def joinBlocks(blocks: scala.collection.mutable.ArrayBuffer[Block],
      keep: Block => Boolean): String = {
    val out = new java.lang.StringBuilder(256)
    blocks.foreach { b =>
      if (keep(b)) {
        val t = normalizeBlock(b.raw)
        if (t.nonEmpty) {
          if (out.length > 0) out.append('\n')
          out.append(t)
        }
      }
    }
    out.toString
  }

  private def row(title: String, text: String): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (title == null) null else UTF8String.fromString(title),
      UTF8String.fromString(text)))

  /** The extraction walk. Returns struct(title nullable, text). */
  def extract(html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (title, blocks) = walkBlocks(html.toString)
    row(title, joinBlocks(blocks, _ => true))
  }

  /** A block is navigation/footer chrome when link text dominates it: at least
    * half its visible characters are anchor text, or at least a third AND the
    * block is short (< 80 visible chars — "Home | About | Contact" shapes).
    * The same link-density heuristic the boilerplate-removal literature
    * (Boilerpipe / Readability) built on; thresholds documented here and
    * pinned by HtmlSpec + the html_main_text oracle.
    */
  private def isBoilerplate(b: Block): Boolean =
    b.nonWs == 0 || b.anchorNonWs * 2 >= b.nonWs ||
      (b.anchorNonWs * 3 >= b.nonWs && b.nonWs < 80)

  /** [[extract]] with link-density boilerplate filtering: nav bars, footers,
    * sidebars, and "related links" blocks — whose text is mostly anchors —
    * are dropped; article prose survives. Corpus-wide line dedup catches
    * REPEATED chrome; this catches the one-off kind on a single page.
    */
  def extractMain(html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (title, blocks) = walkBlocks(html.toString)
    row(title, joinBlocks(blocks, b => !isBoilerplate(b)))
  }

  private def decodeAll(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') { val (rep, adv) = entityAt(s, i); out.append(rep); i += adv }
      else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Collapse space runs to one space, newline runs (with surrounding spaces)
    * to one newline, trim edges.
    */
  private def normalize(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNewline = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') pendingNewline = true
      else if (isSpaceChar(c)) pendingSpace = true
      else {
        if (out.length > 0) {
          if (pendingNewline) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingSpace = false; pendingNewline = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}

/** Shared shape of the two HTML-extraction expressions: string → struct(title,
  * text), evaluated by a static [[HtmlKernel]] method named by `kernelMethod`
  * (the codegen emits a direct static call). One definition of the type check,
  * struct schema, and codegen — the two variants cannot drift apart.
  */
sealed abstract class HtmlPartsBase extends UnaryExpression {
  protected def kernelMethod: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }

  override val dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = false)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlKernel.$kernelMethod($c)")
}

/** Codegen'd one-pass `html_parts(html)` → struct(title, text). */
case class HtmlParts(child: Expression) extends HtmlPartsBase {
  override protected val kernelMethod: String = "extract"
  override def prettyName: String = "html_parts"
  override def nullSafeEval(input: Any): Any =
    HtmlKernel.extract(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlParts =
    copy(child = newChild)
}

/** Codegen'd `html_main_parts(html)` → struct(title, text): [[HtmlParts]] with
  * link-density boilerplate blocks (nav/footer/sidebar chrome) filtered out.
  */
case class HtmlMainParts(child: Expression) extends HtmlPartsBase {
  override protected val kernelMethod: String = "extractMain"
  override def prettyName: String = "html_main_parts"
  override def nullSafeEval(input: Any): Any =
    HtmlKernel.extractMain(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): HtmlMainParts =
    copy(child = newChild)
}
