package graft

import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.functions._

/** End-to-end integration of the LLM data-curation pipeline over the real fixture
  * corpus: quality-filter → corpus line dedup → exact dedup → near-dup dedup →
  * decontaminate → split → shuffle → shard-pack → physical write. One test chains
  * every stage the way a user would, so cross-operator interface drift (column
  * contracts, null handling, determinism) breaks HERE before it breaks a pipeline.
  */
class PipelineE2ESpec extends SparkSpec {

  test("full curation pipeline composes end to end with exact row accounting") {
    import spark.implicits._
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val n0 = raw.count()
    assert(n0 > 0, "fixture must not be empty")

    // 1. quality gate: Gopher rules + heuristic score (keep the permissive side —
    //    the synthetic docs are word-salad-ish, the gate must not empty the corpus)
    val quality = raw.filter(
      TextFunctions.qualityScore(col("text")) > 0.2 &&
        TextFunctions.tokenCount(col("text")) >= 3)
    val n1 = quality.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. corpus-wide line dedup (inject shared boilerplate so the stage has work)
    val withBoiler = quality.select(col("doc_id"),
      concat(lit("SHARED HEADER\n"), col("text")).as("text"))
    val lineDeduped = Dedup.dedupLinesAcrossCorpus(withBoiler, "doc_id", "text")
    assert(lineDeduped.count() == n1, "line dedup must preserve doc count")
    assert(lineDeduped.agg(sum("lines_dropped")).head().getLong(0) == n1 - 1,
      "exactly one boilerplate survivor corpus-wide")

    // 3. exact dedup on the normalized fingerprint
    val fp = lineDeduped.withColumn("_fp", TextFunctions.fingerprint(col("text")))
    val exactDeduped = fp.withColumn("_rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("_fp")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn", "_fp")
    val n3 = exactDeduped.count()
    assert(n3 > 0 && n3 <= n1)

    // 4. near-dup dedup (MinHash-LSH candidates -> exact-Jaccard verify -> keep lowest id)
    val nearDeduped = Dedup.dedupNearMinhash(exactDeduped, "doc_id", "text",
      threshold = 0.85, shingleSize = 5)
    val n4 = nearDeduped.count()
    assert(n4 > 0 && n4 <= n3)

    // 5. decontamination against a probe set built from 3 documents of the corpus
    //    itself — those 3 must score as fully contaminated and get dropped
    val probe = nearDeduped.orderBy("doc_id").limit(3)
      .select(col("doc_id").as("p_id"), col("text").as("p_text"))
    val contamination = Dedup.crossCorpusContamination(
      nearDeduped, probe, "text", "p_id", "p_text", ngramWords = 8)
    val contaminatedIds = contamination.filter(col("contamination") >= 0.8)
      .select(col("probe_id")).as[Long].collect().toSet
    assert(contaminatedIds.nonEmpty, "self-probe must detect contamination")
    val clean = nearDeduped.join(
      probe.select(col("p_id").as("doc_id")), Seq("doc_id"), "left_anti")
    val n5 = clean.count()
    assert(n5 == n4 - 3)

    // 6. deterministic split + seeded shuffle + token-budget shard packing
    val split = Splits.hashSplit(clean, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), seed = 13)
    assert(split.filter(col("split").isNull).count() == 0L)
    val train = split.filter(col("split") === "train").drop("split")
    val shuffled = Splits.deterministicShuffle(train, "doc_id", seed = 99)
    val order1 = shuffled.select("doc_id").as[Long].collect().toSeq
    val order2 = Splits.deterministicShuffle(train, "doc_id", seed = 99)
      .select("doc_id").as[Long].collect().toSeq
    assert(order1 == order2, "the training order must be reproducible")

    val withToks = train.select(col("doc_id"),
      coalesce(TextFunctions.tokenCount(col("text")).cast("long"), lit(0L)).as("toks"))
    val packed = Sharding.packIntoShards(withToks, "doc_id", "toks", budget = 500L)
    val shardStats = packed.groupBy("shard_id")
      .agg(sum("toks").as("toks"), count(lit(1)).as("docs")).collect()
    assert(shardStats.nonEmpty)
    val totalToks = withToks.agg(sum("toks")).head().getLong(0)
    assert(shardStats.map(_.getLong(1)).sum == totalToks, "no tokens lost in packing")

    // 7. physical write: one file per shard directory
    val out = tmpDir("graft_e2e")
    Sharding.writeShards(withToks, "doc_id", "toks", budget = 500L, path = out)
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
    assert(dirs.length == shardStats.length, "one directory per shard")
    dirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} must hold exactly one file")
    }
    val readBack = spark.read.parquet(out)
    assert(readBack.count() == train.count(), "write round-trip preserves rows")
  }

  test("mixture assembly composes: calibrate -> per-source quotas -> interleave -> audit") {
    import spark.implicits._
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("q", TextFunctions.qualityScore(col("text")))
      .withColumn("w", coalesce(TextFunctions.tokenCount(col("text")).cast("long"), lit(0L)))

    // 1. Calibration table over the Gopher keep verdict: pick the lowest bin whose
    //    keep-rate signal exists — the threshold-choosing step a pipeline automates.
    val calib = QualityClassifier.calibrationBins(
      raw.withColumn("label", TextFunctions.gopherFlags(col("text")).getField("keep")),
      "q", "label", bins = 10)
    assert(calib.filter(col("bin").isNotNull).count() > 0)

    // 2. Per-source token quotas: every source keeps its best docs up to 300 tokens.
    val quota = 300L
    val carved = Sharding.selectTopByBudgetByGroup(raw, "source", "q", "w", "doc_id",
      quota, "cum")
    val perSource = carved.groupBy("source").agg(sum("w").as("toks")).collect()
    assert(perSource.nonEmpty)
    perSource.foreach(r => assert(r.getLong(1) <= quota, s"${r.get(0)} over quota"))
    // Determinism: the carve re-derives identically (membership is a pure function).
    val again = Sharding.selectTopByBudgetByGroup(raw, "source", "q", "w", "doc_id",
      quota, "cum").select("doc_id").as[Long].collect().toSet
    assert(again == carved.select("doc_id").as[Long].collect().toSet)

    // 3. Interleave the carved mixture round-robin across sources; ordering by
    //    (rank, source) must alternate sources in the stream head.
    val stream = Sharding.interleaveBySource(carved, "source", "doc_id")
      .orderBy(col("rr_rank"), col("source"))
    val headSources = stream.select("source").as[String].collect().take(8)
    val nSources = carved.select("source").distinct().count()
    assert(headSources.distinct.length == math.min(8, nSources.toInt),
      s"stream head must rotate sources, got ${headSources.toSeq}")

    // 4. Audit the mix: sketch overlap matrix + temperature weights both run over
    //    the carved corpus without column contract friction.
    val overlap = CorpusStats.sourceVocabOverlapSketch(carved, "text", "source")
    assert(overlap.count() == nSources * (nSources - 1) / 2)
    val temps = Sampling.temperatureWeights(carved, "source", alpha = 0.5,
      budgetRows = 100L)
    assert(temps.count() == nSources)
  }

  test("multimodal curation pipeline composes: meta gate -> visual dedup -> features -> semdedup") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodecs
    import spark.implicits._
    // Mixed-media corpus: noise images with planted dups (seeds repeat), real
    // video/audio containers, and broken blobs — the shapes a 100 TB media
    // ingest actually sees.
    val img = (s: Long) => MediaCodecs.encodeNoiseImage(24, 16, "png", s)
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, img(1)), (2L, img(1)), (3L, img(1)),   // planted visual triple
      (4L, img(2)), (5L, img(3)),
      (6L, MediaCodecs.encodeMp4Meta(900L, 64, 36)),
      (7L, MediaCodecs.encodeNoiseWav(8000, 4096, 4L)),
      (8L, "corrupt blob".getBytes), (9L, null.asInstanceOf[Array[Byte]]))
    val corpus = rows.toDF("id", "bytes").repartition(3)

    // 1. metadata gate: keep only payloads whose container DECODED (dims or
    //    duration present) — the broken blob and null drop with exact accounting
    val gated = Multimodal.withMediaMeta(corpus, "bytes")
      .filter(col("media_meta.width").isNotNull || col("media_meta.duration_ms").isNotNull)
    assert(gated.count() == 7, "5 images + mp4 + wav survive the gate")

    // 2. visual dedup on the image subset: the planted triple collapses to id 1
    val images = gated.filter(col("media_meta.format") === "png")
      .select(col("id"), col("bytes"))
    val keptImages = Multimodal.dedupImages(images, "id", "bytes")
      .select("id").as[Long].collect().sorted.toSeq
    assert(keptImages == Seq(1L, 4L, 5L))

    // 3. features via the pluggable hook over the SURVIVORS, then semantic dedup:
    //    byte-identical payloads embed identically, so a re-planted copy of image 4
    //    collapses in embedding space even though the extractor is custom
    val byteMean = (b: Array[Byte], dim: Int) =>
      if (b == null || b.isEmpty) null
      else {
        val out = new Array[Float](dim)
        b.indices.foreach(i => out(i % dim) += (b(i) & 0xff) / 255.0f)
        val nrm = math.sqrt(out.map(v => v.toDouble * v).sum).toFloat
        if (nrm == 0f) null else out.map(_ / nrm)
      }
    val survivors = images.filter(col("id").isin(keptImages: _*))
      .unionByName(Seq((40L, img(2))).toDF("id", "bytes")) // semantic re-plant of 4
    val feats = Multimodal.withFeatures(survivors, "bytes", dim = 8, extractor = byteMean)
      .filter(col("features").isNotNull)
      .select(col("id").as("vec_id"), col("features").as("emb"))
    val centroid = feats.orderBy("vec_id").head().getSeq[Float](1)
    val semKept = graft.operators.Similarity
      .semDedup(feats, "vec_id", "emb", Seq(centroid), threshold = 0.999)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(semKept == Seq(1L, 4L, 5L), s"40 must collapse into 4, got $semKept")

    // 3.5 semantic decontamination: the extractor run over an "eval set" payload
    //    (image 3's bytes) gives the benchmark embedding; exactly the corpus row
    //    carrying that content must flag (verbatim features ⇒ cosine 1, bucket
    //    collision guaranteed), everything else lands
    val evalVecs = Seq((900L, byteMean(img(3), 8).toSeq)).toDF("eid", "evec")
    val flagged = graft.operators.Dedup.semanticContaminationFlags(
        feats, evalVecs, "vec_id", "emb", "eid", "evec", dim = 8, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSeq
    assert(flagged == Seq(5L), s"only the eval-content row flags: $flagged")

    // 4. corpus health: mediaStats over the gated corpus accounts every format,
    //    and total media time covers the mp4 + wav (and nothing else)
    val stats = Multimodal.mediaStats(gated.select("id", "bytes"), "bytes")
      .collect().map(r => r.getString(0) -> (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(stats("png")._1 == 5 && stats("png")._2 == -1L)
    assert(stats("mp4") == ((1L, 900L)) && stats("wav") == ((1L, 512L)))
  }

  test("web-crawl pipeline composes: WARC blobs -> text -> quality gate -> dedup") {
    import graft.operators.{Warc, Dedup}
    import spark.implicits._
    // The Common-Crawl shape end to end: archive blobs in, curated text out.
    // Two crawls carry the same page (cross-blob dup), plus a 404, a non-text
    // payload, and a junk-quality page.
    val good = "The quick brown fox jumps over the lazy dog. " * 8
    val junk = "@@ ## $$ %% ^^ && ** (( )) __ ++ == " * 4
    def blob(pages: Seq[(Int, Int, String, String)], gz: Boolean) =
      Warc.encodeWarc(pages.map { case (i, st, ct, body) =>
        Warc.encodeResponseRecord(s"https://site-$i.example/", "2026-01-01T00:00:00Z",
          s"<urn:uuid:p$i>", st, ct, body.getBytes("ISO-8859-1"))
      }, gzip = gz)
    // wrap the prose in real page chrome: the extraction step must strip it
    def page(body: String) =
      s"""<html><head><title>t</title><script>track();</script></head>
         |<body><div class="nav">menu</div><p>$body</p></body></html>""".stripMargin
    val crawls = Seq(
      (1L, blob(Seq((1, 200, "text/html", page(good)), (2, 404, "text/html", "gone"),
        (3, 200, "image/png", "PNG")), gz = true)),
      (2L, blob(Seq((4, 200, "Text/HTML", page(good)), // same page, other crawl
        (5, 200, "text/html", page(junk))), gz = false)))
      .toDF("blob_id", "warc").repartition(2)

    // 1. archives -> pages -> prose: only HTTP-200 text-typed bodies surface,
    //    and the HTML extraction drops script/nav chrome
    val pages = Warc.responseTexts(crawls, "warc")
      .withColumn("prose", graft.functions.WebFunctions.htmlToText(col("text")))
    assert(pages.count() == 3, "2 good pages + 1 junk page")
    assert(!pages.columns.contains("warc") && !pages.columns.contains("payload"))
    assert(pages.filter(col("prose").contains("track()") ||
      col("prose").contains("<p>")).count() == 0, "chrome must not leak into prose")

    // 2. Gopher structural rules drop the symbol-soup page (alpha-word fraction
    //    and stopword probes both fail it; the prose passes all rules)
    val scored = pages.withColumn("g",
      graft.functions.TextFunctions.gopherFlags(col("prose")))
    val kept = scored.filter(col("g.keep"))
    assert(kept.count() == 2, "junk page must fail the Gopher gate")

    // 3. exact dedup collapses the cross-crawl duplicate to one survivor (the
    //    two crawls framed the page identically modulo the extraction)
    val deduped = Dedup.exactDedup(kept, Seq("prose"))
    assert(deduped.count() == 1, "same page from two crawls is one page")
  }

  test("charset-aware crawl pipeline: mixed-charset archives -> main prose -> language split") {
    import graft.operators.Warc
    import spark.implicits._
    // The round-10 crawl surface end to end: a windows-1252 page declared via
    // a (lying) latin-1 header label, a Shift_JIS page declared only by meta
    // sniff, a revisit record, and a payload digest — through charset-aware
    // decode, main-content extraction (nav/footer chrome dropped), and
    // language routing, with nothing mojibaked and nothing silently lost.
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val nav = "<div><a href=\"/\">Home</a> | <a href=\"/x\">About</a> | " +
      "<a href=\"/y\">Contact</a></div>"
    def page(body: String, meta: String = "") =
      s"<html><head>$meta<title>t</title></head><body>$nav<p>$body</p>" +
        "<footer><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer></body></html>"
    // '€' (0x80) and '–' (0x96) live in cp1252's C1 range where ISO-8859-1
    // has control chars — they make the decode DISCRIMINATING (an 'é'-only
    // fixture round-trips identically under both charsets)
    val enBody = "The style guides – and the € résumés of the café pages from " +
      "the early web still render correctly when the charset is resolved. " * 2
    val jaBody = "日本語のページ本文がここに続きます。品質の高い文章です。" * 3
    val blob1 = Warc.encodeWarc(Seq(
      Warc.encodeResponseRecord("https://a.example/", "2026-01-01T00:00:00Z",
        "<urn:uuid:a>", 200, "text/html; charset=iso-8859-1",
        page(enBody).getBytes(cp1252), payloadDigest = Some("sha1:AAA"))), gzip = true)
    val blob2 = Warc.encodeWarc(Seq(
      Warc.encodeResponseRecord("https://b.example/", "2026-01-01T00:00:00Z",
        "<urn:uuid:b>", 200, "text/html",
        page(jaBody, meta = "<meta charset=shift_jis>").getBytes("windows-31j")),
      // a real crawl's second capture of page a: same digest, no body
      Warc.encodeRevisitRecord("https://a.example/", "2026-01-02T00:00:00Z",
        "<urn:uuid:a2>", "<urn:uuid:a>", "sha1:AAA")))
    val crawls = Seq((1L, blob1), (2L, blob2)).toDF("blob_id", "warc").repartition(2)

    // 1. decode: revisit skipped, both charsets resolved from declarations
    val pages = Warc.responseTexts(crawls, "warc")
    assert(pages.count() == 2, "revisit records must not reach the text chain")
    assert(pages.select("charset").as[String].collect().sorted.toSeq ==
      Seq("windows-1252", "windows-31j"))
    assert(pages.filter(col("charset_assumed")).count() == 0, "both were declared")
    assert(pages.filter(col("blob_id") === 1L).select("payload_digest")
      .as[String].head() == "sha1:AAA", "digest rides along for cross-archive dedup")

    // 2. main-content extraction drops the link-dense nav/footer, keeps prose,
    //    and the charset round-trip preserved the non-ASCII characters
    val prose = pages.withColumn("main",
      graft.functions.WebFunctions.htmlMainText(col("text")))
    assert(prose.filter(col("main").contains("Home") ||
      col("main").contains("Privacy")).count() == 0, "chrome must not survive")
    assert(prose.filter(col("main").contains("résumés of the café")).count() == 1)
    assert(prose.filter(col("main").contains("日本語のページ本文")).count() == 1)

    // 3. language routing on the DECODED prose (mojibake would misroute)
    val routed = prose.withColumn("lang",
      graft.functions.TextFunctions.langId(col("main")))
    assert(routed.select("lang").as[String].collect().sorted.toSeq == Seq("en", "zh"),
      "Han-script page routes zh, English page routes en")
  }

  test("modern-encoding crawl pipeline: brotli + chained codings + truncation through the chain") {
    import graft.operators.Warc
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    def resp(id: String, body: Array[Byte], enc: Option[String]) =
      Warc.encodeResponseRecord(s"https://x.example/$id", "2026-01-01T00:00:00Z",
        s"<urn:uuid:$id>", 200, "text/plain", body, contentEncoding = enc)
    val brPage = "the brotli encoded page body with plenty of words to pass gates " * 3
    val chainPage = "the chained gzip then brotli page body also full of words " * 3
    val cutPage = "the truncated page whose tail was cut at capture " * 40
    def gz(raw: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(raw); g.close(); bos.toByteArray
    }
    val cutGz = { val full = gz(cutPage.getBytes(iso)); java.util.Arrays.copyOf(full, full.length / 2) }
    val stamped = {
      val r = resp("d", "stored partial".getBytes(iso), None)
      new String(r, iso).replaceFirst("WARC-Type: response\r\n",
        "WARC-Type: response\r\nWARC-Truncated: length\r\n").getBytes(iso)
    }
    val blob = Warc.encodeWarc(Seq(
      resp("a", graft.functions.Brotli.encodeCompressedLiterals(brPage.getBytes("UTF-8")),
        Some("br")),
      resp("b", graft.functions.Brotli.encodeCompressedLiterals(gz(chainPage.getBytes(iso))),
        Some("gzip, br")),
      resp("c", cutGz, Some("gzip")),
      stamped))
    val crawls = Seq((1L, blob)).toDF("blob_id", "warc")

    // record-level truth: all four decode-or-flag correctly
    val recs = Warc.explodeRecords(crawls, "warc")
      .select("target_uri", "http_decoded", "truncated", "payload")
    assert(recs.count() == 4)
    val byUri = recs.collect().map(r => r.getString(0) -> r).toMap
    assert(byUri("https://x.example/a").getBoolean(1) && !byUri("https://x.example/a").getBoolean(2))
    assert(byUri("https://x.example/b").getBoolean(1) &&
      new String(byUri("https://x.example/b").getAs[Array[Byte]](3), iso) == chainPage)
    val cut = byUri("https://x.example/c")
    assert(cut.getBoolean(1) && cut.getBoolean(2) &&
      cutPage.startsWith(new String(cut.getAs[Array[Byte]](3), iso)) &&
      cut.getAs[Array[Byte]](3).nonEmpty, "cut gzip keeps a flagged decoded prefix")
    assert(byUri("https://x.example/d").getBoolean(2), "WARC-Truncated folds into the flag")

    // text chain: only the COMPLETE pages yield text (truncated ones excluded)
    val texts = Warc.responseTexts(crawls, "warc").select("text").as[String].collect()
    assert(texts.length == 2 && texts.exists(_.startsWith("the brotli encoded")) &&
      texts.exists(_.startsWith("the chained gzip")),
      s"got ${texts.length} texts")
  }
}
