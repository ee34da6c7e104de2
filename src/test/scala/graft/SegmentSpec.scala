package graft

import graft.functions.{SegmentKernel, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form cases for the script-aware MATCHING tokenizer ([[SegmentKernel]]):
  * CJK/Thai bigram segmentation, joiner attachment (combining marks, ZWJ,
  * halfwidth voiced marks), mixed-script boundaries, and the bit-identity
  * guarantee on text without segmented scripts.
  */
class SegmentSpec extends AnyFunSuite with SparkSpec {

  private def toks(s: String): Seq[String] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (bounds, n) = SegmentKernel.tokenBounds(bytes, bytes.length)
    (0 until n).map(i =>
      new String(bytes, bounds(i * 2), bounds(i * 2 + 1) - bounds(i * 2),
        java.nio.charset.StandardCharsets.UTF_8))
  }

  test("pure whitespace text tokenizes exactly like split(\\s+)") {
    val cases = Seq("", "   ", "a b  c", "one", "tab\tsep\nnl", "a b",
      "emoji 😀 ok", "café bar", "́leading-mark word")
    cases.foreach { s =>
      assert(toks(s) == s.split("\\s+").filter(_.nonEmpty).toSeq, s"on '$s'")
    }
  }

  test("pure Han run emits overlapping bigrams") {
    assert(toks("中文文本") == Seq("中文", "文文", "文本"))
    assert(toks("中") == Seq("中"))
    assert(toks("中文") == Seq("中文"))
  }

  test("mixed script splits at class boundaries inside one ws-token") {
    assert(toks("abc中文字def") == Seq("abc", "中文", "文字", "def"))
    assert(toks("中文abc") == Seq("中文", "abc"))
    assert(toks("a中b") == Seq("a", "中", "b"))
  }

  test("han+kana run segments as ONE class (Japanese)") {
    // 漢字とかな: Han,Han,Hira,Hira,Hira — one SEG run, 4 bigrams
    assert(toks("漢字とかな") == Seq("漢字", "字と", "とか", "かな"))
  }

  test("katakana prolonged sound mark stays inside the run") {
    // ラーメン: U+30E9 U+30FC U+30E1 U+30F3
    assert(toks("ラーメン") == Seq("ラー", "ーメ", "メン"))
  }

  test("middle dots are separators (OTHER), not segment members") {
    // ビル・ゲイツ — the dot splits the kana runs and stands alone
    assert(toks("ビル・ゲイツ") == Seq("ビル", "・", "ゲイ", "イツ"))
    assert(toks("ｱ･ｲ") == Seq("ｱ", "･", "ｲ"))
  }

  test("ideographic punctuation splits runs (OTHER class)") {
    assert(toks("中文。更多") == Seq("中文", "。", "更多"))
  }

  test("combining mark attaches to its base unit (never split by a bigram)") {
    // か + U+3099 (combining voiced mark) = one unit; 3 units total → 2 bigrams
    val s = "がきく"
    assert(toks(s) == Seq("がき", "きく"))
    // mark after Han inside a longer run
    assert(toks("中́文字") == Seq("中́文", "文字"))
  }

  test("halfwidth katakana voiced marks join their base") {
    // ｶ + ﾞ(U+FF9E) ｷ ｸ → units (ｶﾞ)(ｷ)(ｸ) → bigrams ｶﾞｷ, ｷｸ
    val s = "ｶﾞｷｸ"
    assert(toks(s) == Seq("ｶﾞｷ", "ｷｸ"))
  }

  test("non-combining kana voiced marks (U+309B) join their base") {
    assert(toks("か゛きく") == Seq("か゛き", "きく"))
  }

  test("ZWJ joins into the current unit") {
    // ZWJ between two Han chars: 中+ZWJ is one unit, 文 the next → one bigram
    assert(toks("中‍文") == Seq("中‍文"))
    assert(toks("中‍文字") == Seq("中‍文", "文字"))
  }

  test("thai segments into bigrams with combining vowels attached") {
    // ไทย: ไ ท ย (no marks) → 2 bigrams
    assert(toks("ไทย") == Seq("ไท", "ทย"))
    // น + U+0E49 (tone, Mn) + ำ: units (น้)(ำ) → one bigram
    assert(toks("น้ำ") == Seq("น้ำ"))
  }

  test("hangul is NOT segmented (Korean uses spaces)") {
    assert(toks("한국어 텍스트") == Seq("한국어", "텍스트"))
  }

  test("supplementary-plane ideographs (Ext B) segment") {
    // U+20000, U+20001 — 4-byte UTF-8
    val s = new String(Character.toChars(0x20000)) + new String(Character.toChars(0x20001))
    assert(toks(s).size == 1 && toks(s).head == s)
    val s3 = s + new String(Character.toChars(0x20002))
    assert(toks(s3).size == 2)
  }

  test("whitespace inside CJK text splits runs before segmentation") {
    assert(toks("中文 字段") == Seq("中文", "字段"))
  }

  test("Column tokens() matches the kernel and whitespaceTokens stays plain") {
    val spark0 = spark
    import spark0.implicits._
    val texts = Seq("中文文本", "abc中文字def", "plain words here", "", "漢字とかな a b")
    val rows = texts.toDF("text")
      .select(col("text"), TextFunctions.tokens(col("text")).as("t"),
        TextFunctions.whitespaceTokens(col("text")).as("w"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getSeq[String](1) == toks(s), s"tokens() on '$s'")
      assert(r.getSeq[String](2) == s.split("\\s+").filter(_.nonEmpty).toSeq,
        s"whitespaceTokens() on '$s'")
    }
    // NULL propagates
    val nr = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(TextFunctions.tokens(col("text"))).head()
    assert(nr.isNullAt(0))
  }

  test("totality fuzz: random bytes-ish strings never throw, non-seg inputs equal split") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val len = rnd.nextInt(60)
      val s = new String((1 to len).map { _ =>
        val r = rnd.nextInt(6)
        if (r == 0) ' '
        else if (r == 1) (0x20 + rnd.nextInt(0x5f)).toChar
        else if (r == 2) (0x4E00 + rnd.nextInt(0x100)).toChar
        else if (r == 3) (0x3040 + rnd.nextInt(0xC0)).toChar
        else if (r == 4) (0x0E00 + rnd.nextInt(0x80)).toChar
        else (0x80 + rnd.nextInt(0x1000)).toChar
      }.toArray)
      val t = toks(s) // must not throw
      // every token is non-empty
      t.foreach(tok => assert(tok.nonEmpty))
      // segmentation only SUBDIVIDES whitespace tokens — counts never shrink
      assert(t.size >= s.split("\\s+").count(_.nonEmpty), s"token count shrank on '$s'")
    }
  }

  test("per-language gopher routing keeps CJK pages the English config rejects") {
    val spark0 = spark
    import spark0.implicits._
    val han = (0 until 60).map(i => "中文数据处理系统模型训练样本".charAt(i % 14)).mkString
    val en = ("the be to of and that have with " * 8).trim
    val shortHan = han.take(20) // 19 bigram tokens — fails the 50-word budget both ways
    val rows = Seq(han, en, shortHan, null.asInstanceOf[String]).toDF("text")
      .select(
        TextFunctions.gopherFlagsRouted(col("text")).as("r"),
        TextFunctions.gopherFlags(col("text")).getField("keep").as("kd"))
      .collect()
    // CJK page: routed keep (59 units, mean 2.0 under the cjk config), default reject
    assert(rows(0).getStruct(0).getString(0) == "zh")
    assert(rows(0).getStruct(0).getStruct(1).getBoolean(7) && !rows(0).getBoolean(1))
    // English page: routed to default config — identical verdicts
    assert(rows(1).getStruct(0).getString(0) == "en")
    assert(rows(1).getStruct(0).getStruct(1).getBoolean(7) == rows(1).getBoolean(1))
    // Short CJK page: routing does NOT waive the word budget
    assert(!rows(2).getStruct(0).getStruct(1).getBoolean(7))
    // NULL text: NULL struct both ways
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1))
  }

  test("per-language quality threshold routing") {
    val spark0 = spark
    import spark0.implicits._
    val han = (0 until 60).map(i => "中文数据处理系统".charAt(i % 8)).mkString
    val rows = Seq(han, "the quick brown fox jumps over the lazy dog and then some more",
      null.asInstanceOf[String]).toDF("text")
      .select(
        TextFunctions.qualityKeepRouted(col("text"), Map("zh" -> 0.5), 0.99).as("k"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .collect()
    // CJK page scores above 0.5 (routed) but below 0.99 (default would reject)
    assert(rows(0).getBoolean(0) && rows(0).getDouble(1) < 0.99)
    // English page judged against the 0.99 default
    assert(rows(1).getBoolean(0) == (rows(1).getDouble(1) >= 0.99))
    assert(rows(2).isNullAt(0))
  }

  test("malformed UTF-8 never swallows whitespace (self-synchronizing walk)") {
    def boundsOf(bytes: Array[Byte]): Seq[(Int, Int)] = {
      val (b, n) = SegmentKernel.tokenBounds(bytes, bytes.length)
      (0 until n).map(i => (b(i * 2), b(i * 2 + 1)))
    }
    // truncated 3-byte lead, two spaces, 'b': the lead must NOT consume the spaces
    assert(boundsOf(Array(0xE1, 0x20, 0x20, 0x62).map(_.toByte)) == Seq((0, 1), (3, 4)))
    // truncated lead + one continuation, space, 'b'
    assert(boundsOf(Array(0xE1, 0x81, 0x20, 0x62).map(_.toByte)) == Seq((0, 2), (3, 4)))
    // bare continuation bytes act as 1-byte OTHER chars
    assert(boundsOf(Array(0x85, 0x20, 0x85).map(_.toByte)) == Seq((0, 1), (2, 3)))
    // truncated 4-byte lead at end of input
    assert(boundsOf(Array(0x61, 0x20, 0xF0, 0x9F).map(_.toByte)) == Seq((0, 1), (2, 4)))
    // malformed decode classifies as U+FFFD: never SEG, never a letter
    assert(SegmentKernel.codePointAt(Array(0xE1, 0x20).map(_.toByte), 0, 2, 1) == 0xFFFD)
    // surrogate-range 3-byte sequence (ED A0 80 = U+D800) decodes to U+FFFD
    assert(SegmentKernel.codePointAt(Array(0xED, 0xA0, 0x80).map(_.toByte), 0, 3, 3) == 0xFFFD)
    // token counts never shrink vs byte-level whitespace runs, even on junk
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(40))((rnd.nextInt(256) - 128).toByte)
      val (_, n) = SegmentKernel.tokenBounds(bytes, bytes.length) // must not throw
      var wsRuns = 0
      var in = false
      bytes.foreach { b =>
        val ws = b == 0x20 || (b >= 0x09 && b <= 0x0D)
        if (!ws && !in) wsRuns += 1
        in = !ws
      }
      assert(n >= wsRuns, s"tokens $n < ws-delimited runs $wsRuns on ${bytes.mkString(",")}")
    }
  }

  test("segmented token count is zero iff whitespace token count is zero") {
    Seq("", " \t\n", "中", "a", " 中文 ").foreach { s =>
      val seg = toks(s).size
      val wsc = s.split("\\s+").count(_.nonEmpty)
      assert((seg == 0) == (wsc == 0), s"on '$s'")
    }
  }
}
