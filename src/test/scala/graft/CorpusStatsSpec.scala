package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("tfIdfTopTerms: smooth idf, whitespace-only doc counts toward N, ranks deterministic") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("apple banana apple")),
      (Some(2L), Some("banana cherry")),
      (Some(3L), Some("apple date")),
      (Some(4L), Some("   ")), // tokenizes to nothing but is a corpus member: N = 4
      (Some(5L), None: Option[String]), // null text: excluded entirely
      (None, Some("apple apple"))) // null id: excluded entirely
      .toDF("doc_id", "text")
    val out = CorpusStats.tfIdfTopTerms(df, "doc_id", "text", 2)
      .orderBy("doc_id", "rank").collect()
    // N=4; df: apple 2, banana 2, cherry 1, date 1
    val idf2 = math.log(5.0 / 3.0) + 1 // df=2
    val idf1 = math.log(5.0 / 2.0) + 1 // df=1
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(1)).toSeq == Seq("apple", "banana"))
    assert(approx(d1(0).getDouble(4), 2 * idf2) && d1(0).getLong(2) == 2L)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(1)).toSeq == Seq("cherry", "banana"),
      "cherry (rarer) must outrank banana")
    assert(approx(d2(0).getDouble(4), idf1))
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.map(_.getString(1)).toSeq == Seq("date", "apple"))
    assert(!out.exists(r => r.getLong(0) == 4L || r.getLong(0) == 5L))
    assert(out.forall(_.getInt(5) <= 2))
  }

  test("tfIdfTopTerms: equal scores tie-break by token ascending") {
    import spark.implicits._
    val df = Seq((1L, "zz aa"), (2L, "aa zz")).toDF("doc_id", "text")
    // aa and zz both have tf=1, df=2 in both docs — identical scores.
    val top1 = CorpusStats.tfIdfTopTerms(df, "doc_id", "text", 1)
      .orderBy("doc_id").collect()
    assert(top1.map(_.getString(1)).toSeq == Seq("aa", "aa"))
  }

  test("bigramSurprisal: add-alpha bigram LM, hand-computed") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a b a b")),
      (Some(2L), Some("a b")),
      (Some(3L), Some("a")), // single token: no bigrams, no output row
      (Some(4L), None: Option[String]))
      .toDF("doc_id", "text")
    val out = CorpusStats.bigramSurprisal(df, "doc_id", "text", alpha = 0.5)
      .orderBy("doc_id").collect()
    // counts: (a,b)=3 (b,a)=1; ctx: a=3 b=1; V=2
    val lpAB = math.log(3.5 / 4.0)
    val lpBA = math.log(1.5 / 2.0)
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L)
    assert(approx(out(0).getDouble(2), -(2 * lpAB + lpBA) / 3.0))
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 1L)
    assert(approx(out(1).getDouble(2), -lpAB))
    // gibberish (unseen-ish pairs) must score HIGHER than the corpus-dominant doc
    val mixed = Seq((1L, "x y x y x y x y"), (2L, "x q")).toDF("doc_id", "text")
    val s = CorpusStats.bigramSurprisal(mixed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(2L) > s(1L), "rare bigram doc must have higher surprisal")
  }

  test("collocationsPmi: counts, minCount screen, deterministic order") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.collocationsPmi(df, "doc_id", "text", k = 10, minCount = 2)
      .collect()
    // bigrams: (a,b)x3, (b,a)x1 → minCount=2 keeps only (a,b)
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 3L)
    // pmi = ln(c12*N / (left(a)*right(b))) = ln(3*4/(3*3))
    assert(approx(r.getDouble(3), math.log(4.0 / 3.0)))
  }

  test("corpus stats on empty / all-null input yield empty frames, not crashes") {
    import spark.implicits._
    val empty = Seq.empty[(Option[Long], Option[String])].toDF("doc_id", "text")
    assert(CorpusStats.tfIdfTopTerms(empty, "doc_id", "text", 3).count() == 0L)
    assert(CorpusStats.bigramSurprisal(empty, "doc_id", "text").count() == 0L)
    assert(CorpusStats.collocationsPmi(empty, "doc_id", "text", 3).count() == 0L)
    val nulls = Seq((Some(1L), None: Option[String])).toDF("doc_id", "text")
    assert(CorpusStats.tfIdfTopTerms(nulls, "doc_id", "text", 3).count() == 0L)
    assert(CorpusStats.bigramSurprisal(nulls, "doc_id", "text").count() == 0L)
  }

  test("sourceVocabOverlap: hand-computed Jaccard, zero-overlap pairs absent, null excluded") {
    import spark.implicits._
    val df = Seq(
      (Some("X"), Some("a b c")), (Some("X"), Some("a a")),
      (Some("Y"), Some("b c d")), (Some("Z"), Some("z")),
      (None, Some("a b c d z")), (Some("X"), None))
      .toDF("source", "text")
    val out = CorpusStats.sourceVocabOverlap(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // X={a,b,c}, Y={b,c,d}: shared {b,c}=2, union 4 -> 0.5
    assert(out((("X"): String, ("Y"): String)) == ((2L, 0.5)), s"$out")
    assert(out.size == 1, "zero-overlap pairs (X-Z, Y-Z) and NULL source must be absent")
    // sources with shared vocab through a third never pair transitively
    assert(!out.contains(("X", "Z")) && !out.contains(("Y", "Z")))
  }

  test("sourceVocabOverlapSketch: exact-mode matrix == exact operator, full matrix, guard") {
    import spark.implicits._
    val df = Seq(
      (Some("X"), Some("a b c")), (Some("X"), Some("a a")),
      (Some("Y"), Some("b c d")), (Some("Z"), Some("z")),
      (None, Some("a b c d z")), (Some("X"), None))
      .toDF("source", "text")
    val out = CorpusStats.sourceVocabOverlapSketch(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // Exact mode (vocab << 2^14): the estimates ARE the exact matrix.
    assert(out(("X", "Y")) == ((3.0, 3.0, 2.0, 0.5)))
    // FULL matrix: zero-overlap pairs present at shared 0 (unlike the exact join).
    assert(out.size == 3)
    assert(out(("X", "Z")) == ((3.0, 1.0, 0.0, 0.0)))
    assert(out(("Y", "Z")) == ((3.0, 1.0, 0.0, 0.0)))
    // Agreement with the exact operator on a 300-doc 6-source random corpus.
    val rng = new scala.util.Random(7)
    val corpus = (1 to 300).map { i =>
      (s"s${i % 6}", (1 to 30).map(_ => s"w${rng.nextInt(400)}").mkString(" "))
    }.toDF("source", "text")
    val exact = CorpusStats.sourceVocabOverlap(corpus, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sketch = CorpusStats.sourceVocabOverlapSketch(corpus, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(sketch.size == 15) // 6 choose 2
    exact.foreach { case (k, shared) => assert(sketch(k) == shared.toDouble, s"pair $k") }
    // maxSources guard fires before the quadratic pairing.
    intercept[IllegalArgumentException](
      CorpusStats.sourceVocabOverlapSketch(corpus, "text", "source", maxSources = 3))
    // Empty corpus: empty matrix.
    assert(CorpusStats.sourceVocabOverlapSketch(
      corpus.filter(lit(false)), "text", "source").count() == 0L)
  }

  test("corpusReport: hand-computed card, NULL conventions, empty corpus") {
    import spark.implicits._
    val df = Seq(
      (Some("one two three"), Some("en"), Some("web")),      // 3 tokens
      (Some("uno dos"), Some("es"), Some("web")),            // 2 tokens
      (Some("a b c d e"), Some("en"), Some("books")),        // 5 tokens
      (None: Option[String], Some("en"), Some("web")),       // NULL text: counted, no opinion
      (Some("solo"), None, None))                            // NULL lang/source: out of mixes
      .toDF("text", "lang", "source")
    val r = CorpusStats.corpusReport(df).head()
    assert(r.getLong(r.fieldIndex("n_docs")) == 5L)
    assert(r.getLong(r.fieldIndex("n_null_text")) == 1L)
    assert(r.getLong(r.fieldIndex("tokens_total")) == 11L)
    assert(math.abs(r.getDouble(r.fieldIndex("tokens_mean")) - 11.0 / 4) < 1e-12)
    assert(r.getDouble(r.fieldIndex("tokens_p50")) == 2.5) // median of (1,2,3,5)
    assert(r.getLong(r.fieldIndex("n_langs")) == 2L)       // en×3, es×1 (NULL out)
    val expectEntropy = math.log(4) - (3 * math.log(3) + 1 * math.log(1)) / 4
    assert(math.abs(r.getDouble(r.fieldIndex("lang_entropy")) - expectEntropy) < 1e-12)
    assert(r.getLong(r.fieldIndex("n_sources")) == 2L)     // web×3, books×1
    assert(r.getDouble(r.fieldIndex("top_source_share")) == 0.75)
    assert(!r.isNullAt(r.fieldIndex("quality_mean")) &&
      !r.isNullAt(r.fieldIndex("gopher_keep_frac")))
    // Empty corpus: zero counts, NULL statistics.
    val e = CorpusStats.corpusReport(df.filter(lit(false))).head()
    assert(e.getLong(e.fieldIndex("n_docs")) == 0L &&
      e.getLong(e.fieldIndex("tokens_total")) == 0L &&
      e.getLong(e.fieldIndex("n_langs")) == 0L && e.getLong(e.fieldIndex("n_sources")) == 0L)
    Seq("tokens_mean", "tokens_p50", "quality_mean", "gopher_keep_frac",
      "lang_entropy", "top_source_share").foreach(c =>
      assert(e.isNullAt(e.fieldIndex(c)), s"$c must be NULL on an empty corpus"))
  }

  test("zipfSlope: ~-1 on an exact Zipf corpus, hand-computed OLS, degenerate classes") {
    import spark.implicits._
    // token w<i> appears exactly floor(1000/i) times, i = 1..50: slope must land
    // near -1 (quantized counts bend it slightly; the OLS absorbs that)
    val zipf = (1 to 50).flatMap(i => Seq.fill(1000 / i)(f"w$i%02d"))
    val corpus = zipf.grouped(97).map(_.mkString(" ")).toSeq.toDF("text")
    val z = CorpusStats.zipfSlope(corpus, "text", topK = 50).head()
    assert(z.getLong(0) == 50L)
    assert(math.abs(z.getDouble(1) - (-1.0)) < 0.05, s"slope ${z.getDouble(1)}")
    // hand-computed OLS on a 3-token fixture: counts 8, 4, 1 at ranks 1, 2, 3
    val tiny = Seq((Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq("c")).mkString(" "))
      .toDF("text")
    val got = CorpusStats.zipfSlope(tiny, "text", topK = 10).head()
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(8.0, 4.0, 1.0).map(math.log)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val want = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(got.getDouble(1) - want) < 1e-12, s"${got.getDouble(1)} vs $want")
    // fewer than 2 ranked tokens or an empty corpus: NULL slope, counts honest
    val one = CorpusStats.zipfSlope(Seq("solo solo solo").toDF("text"), "text").head()
    assert(one.getLong(0) == 1L && one.isNullAt(1))
    val emptyZ = CorpusStats.zipfSlope(Seq.empty[String].toDF("text"), "text").head()
    assert(emptyZ.getLong(0) == 0L && emptyZ.isNullAt(1))
    intercept[IllegalArgumentException](CorpusStats.zipfSlope(tiny, "text", topK = 1))
  }
}
