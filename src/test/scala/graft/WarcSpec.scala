package graft

import graft.operators.Warc
import org.apache.spark.sql.functions._

/** WARC ingestion: record parsing (plain + multi-member gzip), HTTP payload
  * split, parse caps, totality on corrupt input, and the DataFrame bridge into
  * the text-curation chain.
  */
class WarcSpec extends SparkSpec {

  private val iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def rec(i: Int, status: Int = 200, ct: String = "text/plain",
      body: String = ""): Array[Byte] =
    Warc.encodeResponseRecord(s"https://example.com/p$i", "2026-01-01T00:00:00Z",
      s"<urn:uuid:rec-$i>", status, ct,
      (if (body.nonEmpty) body else s"page body $i").getBytes(iso))

  test("WARC records round-trip: plain, multi-member gzip, and zstd parse identically") {
    val blocks = Seq(rec(0), rec(1, status = 404), rec(2, ct = "image/png"))
    // spec-legal leading SKIPPABLE frame (dictionary carrier in real .warc.zst):
    // magic 5?2A4D18 + u32 size + payload, skipped by the streaming decoder
    val skippable = Array(0x50, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
      .map(_.toByte)
    // real IIPC layout: the records are compressed WITH the dictionary the
    // leading skippable frame carries — skipping it without loading it would
    // decode zero records
    val dict = rec(7) ++ rec(8)
    val blobs = Seq("plain" -> Warc.encodeWarc(blocks),
      "gzip" -> Warc.encodeWarc(blocks, gzip = true),
      "zstd" -> Warc.encodeWarcZstd(blocks),
      "zstd+skippable" -> (skippable ++ Warc.encodeWarcZstd(blocks)),
      "zstd+dict" -> Warc.encodeWarcZstdDict(blocks, dict))
    for ((gz, blob) <- blobs) {
      val rs = Warc.records(blob)
      assert(rs.size == 3, s"$gz: ${rs.size}")
      assert(rs.map(_.record_idx) == Seq(0, 1, 2))
      assert(rs.forall(_.warc_type.contains("response")))
      assert(rs(0).target_uri.contains("https://example.com/p0"))
      assert(rs(0).record_id.contains("<urn:uuid:rec-0>"))
      assert(rs(0).warc_date.contains("2026-01-01T00:00:00Z"))
      assert(rs(0).content_type.exists(_.startsWith("application/http")))
      assert(rs(0).http_status.contains(200) && rs(1).http_status.contains(404))
      assert(rs(0).http_content_type.contains("text/plain"))
      assert(rs(2).http_content_type.contains("image/png"))
      assert(new String(rs(0).payload, iso) == "page body 0", "body split off headers")
      assert(rs.forall(!_.truncated))
      // content_length is the full HTTP message, strictly larger than the body
      assert(rs(0).content_length > rs(0).payload.length)
    }
  }

  test("WARC parser is total: corrupt/truncated/capped input never throws") {
    val blob = Warc.encodeWarc(Seq(rec(0), rec(1)))
    // mid-record truncation: the complete first record survives un-flagged; the
    // cut second record is either flagged truncated or not emitted at all
    val cut = blob.take(blob.length - rec(1).length + 30)
    val partial = Warc.records(cut)
    assert(partial.nonEmpty && partial.head.http_status.contains(200))
    assert(!partial.head.truncated, "complete record must not be flagged")
    assert(partial.size == 1 || (partial.size == 2 && partial(1).truncated),
      s"cut record must be flagged or dropped: $partial")
    // non-WARC bytes, empty, null
    assert(Warc.records("not a warc at all".getBytes(iso)).isEmpty)
    assert(Warc.records(Array.emptyByteArray).isEmpty)
    assert(Warc.records(null).isEmpty)
    // corrupt gzip member: never a throw
    val gz = Warc.encodeWarc(Seq(rec(0)), gzip = true)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0xff).toByte
    Warc.records(gz) // must not throw; content may or may not survive
    // maxRecords cap: bounded AND visible (caps are never silent)
    val many = Warc.encodeWarc((0 until 10).map(rec(_)))
    val cappedParse = Warc.parse(many, maxRecords = 4)
    assert(cappedParse.records.size == 4 && cappedParse.capped,
      "record cap must set the blob-level flag")
    assert(!Warc.parse(many).capped, "uncapped blob must not be flagged")
    // total-bytes budget: same visibility
    val byBudget = Warc.parse(many, maxTotalBytes = 50L)
    assert(byBudget.records.size < 10 && byBudget.capped)
    // payload cap: record flagged truncated, walk CONTINUES to later records
    val big = Warc.encodeWarc(Seq(rec(0, body = "x" * 5000), rec(1)))
    val capped = Warc.records(big, maxPayloadBytes = 100)
    assert(capped.size == 2, s"capped walk must continue: ${capped.size}")
    assert(capped(0).truncated && capped(0).payload.length == 100)
    assert(!capped(1).truncated && capped(1).http_status.contains(200))
    // malformed HTTP content (no header/body separator): no status, full payload
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 9\r\n\r\nnot http!\r\n\r\n").getBytes(iso)
    val mal = Warc.records(raw)
    assert(mal.size == 1 && mal.head.http_status.isEmpty)
    assert(new String(mal.head.payload, iso) == "not http!")
  }

  test("truncation fuzz: EVERY byte-cut of gzip/deflate/zstd/brotli members (and the " +
    "gzip,br chain) yields a flagged true prefix or flagged raw — never a throw, " +
    "never silent loss, never a half-decoded intermediate") {
    def httpRecord(extraHeaders: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$extraHeaders\r\n")
        .getBytes(iso) ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++ http ++
        "\r\n\r\n".getBytes(iso)
    }
    val payload = ("truncation recovery fuzz page content with some repetition " * 30)
      .getBytes(iso) // ~1.8 KB: long enough for multi-block compressed streams
    def gzip(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    def zlib(b: Array[Byte]) = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val buf = new Array[Byte](b.length * 2 + 128)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def zstd(b: Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos); z.write(b); z.close()
      bos.toByteArray
    }
    // (encoding, member bytes, recovery expected): a SINGLE-frame zstd member is one
    // atomic block — no cut can recover a prefix (raw+flagged everywhere is the
    // honest outcome); the multi-frame member (two concatenated frames, legal zstd
    // content coding) must recover frame 1 when frame 2 is cut.
    val half = payload.length / 2
    val zFrame1 = zstd(payload.take(half))
    // cleanCuts: cut offsets where the truncated body is ITSELF a complete valid
    // stream (the multi-frame member cut exactly at its frame boundary) — no codec
    // can flag those; the crawler-stamped WARC-Truncated header is the layer that
    // covers them, tested separately.
    val members: Seq[(String, Array[Byte], Boolean, Set[Int])] = Seq(
      ("gzip", gzip(payload), true, Set.empty[Int]),
      ("deflate", zlib(payload), true, Set.empty[Int]),
      ("zstd", zstd(payload), false, Set.empty[Int]),
      ("zstd", zFrame1 ++ zstd(payload.drop(half)), true, Set(zFrame1.length)),
      ("br", graft.functions.Brotli.encodeCompressedLiterals(payload), true, Set.empty[Int]),
      ("gzip, br", graft.functions.Brotli.encodeCompressedLiterals(gzip(payload)), true,
        Set.empty[Int]))
    members.foreach { case (enc, full, expectRecovery, cleanCuts) =>
      // the UNCUT member must decode completely — a truncation-hardening change
      // that breaks whole-stream decode (e.g. stopping at the first zstd frame)
      // would silently halve every multi-frame page
      val whole = Warc.records(httpRecord(s"Content-Encoding: $enc\r\n", full)).head
      assert(whole.http_decoded && !whole.truncated &&
        java.util.Arrays.equals(whole.payload, payload),
        s"$enc uncut member must decode fully (got decoded=${whole.http_decoded} " +
          s"truncated=${whole.truncated} len=${whole.payload.length})")
      var recovered = 0
      (0 until full.length).foreach { cut =>
        val body = full.take(cut)
        val rs = Warc.records(httpRecord(s"Content-Encoding: $enc\r\n", body))
        assert(rs.size == 1, s"$enc cut=$cut emitted ${rs.size} records")
        val r = rs.head
        if (r.http_decoded) {
          // decoded ⇒ a TRUE PREFIX of the original page (possibly all of it, when
          // only the trailer was cut), and anything short is FLAGGED truncated —
          // a half-decoded chain intermediate (e.g. gzip bytes out of the br
          // stage) would fail the prefix check against the plaintext
          assert(r.payload.length <= payload.length &&
            java.util.Arrays.equals(r.payload, payload.take(r.payload.length)),
            s"$enc cut=$cut decoded payload is not a prefix of the page")
          // cut=0 is an EMPTY member, not a truncated capture: a codec that reads
          // zero bytes as zero frames (zstd does) legitimately yields an empty
          // unflagged page — there was no content to lose. cleanCuts (complete-
          // stream cut points) are likewise unflaggable by construction.
          assert(r.truncated || java.util.Arrays.equals(r.payload, payload) ||
            (cut == 0 && r.payload.isEmpty) || cleanCuts.contains(cut),
            s"$enc cut=$cut short prefix (${r.payload.length}) not flagged truncated")
          if (r.payload.nonEmpty) recovered += 1
        } else {
          // undecodable ⇒ the original raw cut bytes, flagged — never silent loss
          assert(java.util.Arrays.equals(r.payload, body),
            s"$enc cut=$cut undecoded record must keep the raw cut bytes")
        }
        // silent-loss canary (the FDICT bug class): decoded+empty+unflagged from a
        // nonempty member is a page quietly replaced by nothing
        assert(!(r.http_decoded && r.payload.isEmpty && !r.truncated && cut > 0),
          s"$enc cut=$cut silent empty decode")
      }
      // the recovery path must actually fire: a policy of raw+undecoded-everywhere
      // would pass every per-cut assertion while recovering nothing
      if (expectRecovery)
        assert(recovered > 0, s"$enc: no cut recovered any prefix — recovery path dead")
    }
  }

  test("HTTP bodies: chunked framing removed, gzip/deflate/zstd/brotli decoded") {
    def httpRecord(extraHeaders: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$extraHeaders\r\n")
        .getBytes(iso) ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++ http ++
        "\r\n\r\n".getBytes(iso)
    }
    // chunked: two chunks + terminal zero chunk reassemble to the page text
    val chunked = httpRecord("Transfer-Encoding: chunked\r\n",
      "b\r\nhello chunk\r\n6\r\n world\r\n0\r\n\r\n".getBytes(iso))
    val c = Warc.records(chunked).head
    assert(c.http_decoded && new String(c.payload, iso) == "hello chunk world",
      s"got decoded=${c.http_decoded} '${new String(c.payload, iso)}'")
    // Content-Encoding: gzip — crawlers store the response as captured
    val gzBody = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("compressed page text".getBytes(iso)); g.close()
      bos.toByteArray
    }
    val gzRec = Warc.records(httpRecord("Content-Encoding: gzip\r\n", gzBody)).head
    assert(gzRec.http_decoded && new String(gzRec.payload, iso) == "compressed page text")
    // Content-Encoding: zstd — zstd-jni rides the Spark classpath
    val zBody = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      z.write("zstd page text".getBytes(iso)); z.close()
      bos.toByteArray
    }
    val zRec = Warc.records(httpRecord("Content-Encoding: zstd\r\n", zBody)).head
    assert(zRec.http_decoded && new String(zRec.payload, iso) == "zstd page text")
    // Content-Encoding: br — the built-in RFC 7932 decoder (graft.functions
    // .Brotli) decodes it; no external jar involved. Two stream shapes: the
    // uncompressed-meta-block form our fixture encoder writes, and a real
    // entropy-coded stream from the reference encoder (committed fixture).
    val brBody = graft.functions.Brotli.encodeUncompressed(
      "brotli page text".getBytes(iso))
    val brRec = Warc.records(httpRecord("Content-Encoding: br\r\n", brBody)).head
    assert(brRec.http_decoded && new String(brRec.payload, iso) == "brotli page text",
      s"got decoded=${brRec.http_decoded} '${new String(brRec.payload, iso)}'")
    def brotliFixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var r = in.read(buf)
        while (r >= 0) { bos.write(buf, 0, r); r = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    }
    val refRec = Warc.records(
      httpRecord("Content-Encoding: br\r\n", brotliFixture("010_text_q11.br"))).head
    assert(refRec.http_decoded &&
      refRec.payload.sameElements(brotliFixture("010_text_q11.raw")))
    // corrupt brotli stream: raw bytes kept, decoded=false, responseTexts skips it
    val brBad = Warc.records(httpRecord("Content-Encoding: br\r\n",
      Array[Byte](0x21, 0x7f, 0x33))).head
    assert(!brBad.http_decoded && brBad.payload.sameElements(Array[Byte](0x21, 0x7f, 0x33)))
    // a brotli BOMB takes the same capped-prefix path as the gzip bomb below
    val brBomb = Warc.records(
      httpRecord("Content-Encoding: br\r\n",
        graft.functions.Brotli.encodeUncompressed(new Array[Byte](100000))),
      maxPayloadBytes = 4096).head
    assert(brBomb.truncated && brBomb.http_decoded && brBomb.payload.length == 4096,
      s"got truncated=${brBomb.truncated} len=${brBomb.payload.length}")
    // an encoding token with no decoder at all: raw bytes kept, flagged
    val unk = Warc.records(httpRecord("Content-Encoding: compress\r\n",
      Array[Byte](1, 2, 3))).head
    assert(!unk.http_decoded && unk.payload.sameElements(Array[Byte](1, 2, 3)))
    // RAW deflate under the `deflate` token (the old-IIS quirk browsers sniff
    // for): no zlib wrapper, still decodes; wrapped zlib keeps decoding too
    def deflate(raw: Array[Byte], nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    Seq(true, false).foreach { nowrap =>
      val r = Warc.records(httpRecord("Content-Encoding: deflate\r\n",
        deflate("deflate page text".getBytes(iso), nowrap))).head
      assert(r.http_decoded && new String(r.payload, iso) == "deflate page text",
        s"nowrap=$nowrap decoded=${r.http_decoded}")
    }
    // zlib with FDICT set (preset dictionary we don't have): without the FDICT
    // check the sniff picked the zlib inflater, Inflater.needsDictionary() made
    // read() return -1 immediately, and the body became EMPTY with
    // http_decoded=true — silent data loss. Must stay raw + flagged instead.
    val fdictBody = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
      d.setDictionary("shared preset dictionary".getBytes(iso))
      d.setInput("fdict page text".getBytes(iso)); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    assert((fdictBody(1) & 0x20) != 0, "fixture must actually set FDICT")
    val fdictRec = Warc.records(httpRecord("Content-Encoding: deflate\r\n", fdictBody)).head
    assert(!(fdictRec.http_decoded && fdictRec.payload.isEmpty),
      "FDICT zlib must never decode to a silent empty body")
    assert(!fdictRec.http_decoded && fdictRec.payload.sameElements(fdictBody),
      s"FDICT zlib should stay raw+flagged, got decoded=${fdictRec.http_decoded} " +
        s"len=${fdictRec.payload.length}")
    // CHAINED codings (RFC 9110: listed in application order, so decode runs
    // right to left): gzip then br on the wire as "Content-Encoding: gzip, br"
    val chainedBody = graft.functions.Brotli.encodeCompressedLiterals {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("chained page text".getBytes(iso)); g.close()
      bos.toByteArray
    }
    val chained = Warc.records(
      httpRecord("Content-Encoding: gzip, br\r\n", chainedBody)).head
    assert(chained.http_decoded && new String(chained.payload, iso) == "chained page text",
      s"chained decoded=${chained.http_decoded} '${new String(chained.payload, iso)}'")
    // a chain with one unknown link keeps the ORIGINAL raw bytes, flagged —
    // never a half-decoded intermediate
    val chainedBad = Warc.records(
      httpRecord("Content-Encoding: compress, br\r\n", chainedBody)).head
    assert(!chainedBad.http_decoded && chainedBad.payload.sameElements(chainedBody))
    // CAPTURE-TRUNCATED compressed bodies (Common Crawl cuts big responses
    // mid-stream): the decoded prefix is kept and the record flags truncated
    // — the page is recovered instead of lost to the raw+undecoded path
    val longText = ("lorem ipsum crawl page content " * 400).getBytes(iso)
    val fullGz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(longText); g.close()
      bos.toByteArray
    }
    val cutGz = Warc.records(httpRecord("Content-Encoding: gzip\r\n",
      java.util.Arrays.copyOf(fullGz, fullGz.length / 2))).head
    assert(cutGz.http_decoded && cutGz.truncated && cutGz.payload.length > 0 &&
      new String(longText, iso).startsWith(new String(cutGz.payload, iso)),
      s"gz decoded=${cutGz.http_decoded} trunc=${cutGz.truncated} len=${cutGz.payload.length}")
    val fullBr = graft.functions.Brotli.encodeCompressedLiterals(longText)
    val cutBr = Warc.records(httpRecord("Content-Encoding: br\r\n",
      java.util.Arrays.copyOf(fullBr, fullBr.length / 2))).head
    assert(cutBr.http_decoded && cutBr.truncated && cutBr.payload.length > 0 &&
      new String(longText, iso).startsWith(new String(cutBr.payload, iso)),
      s"br decoded=${cutBr.http_decoded} trunc=${cutBr.truncated} len=${cutBr.payload.length}")
  }

  test("WARC-Truncated records fold into the truncated flag") {
    // the crawler already cut this payload at capture: the stored bytes parse
    // cleanly, so only the header says the text is incomplete
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\npartial body").getBytes(iso)
    val block = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:t1>\r\nWARC-Truncated: length\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++ http ++
      "\r\n\r\n".getBytes(iso)
    val r = Warc.records(block).head
    assert(r.truncated && r.http_decoded &&
      new String(r.payload, iso) == "partial body")
  }

  test("malformed framing flagged; decode bombs capped against the budget") {
    def httpRecord(extraHeaders: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n$extraHeaders\r\n")
        .getBytes(iso) ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++ http ++
        "\r\n\r\n".getBytes(iso)
    }
    // malformed chunked framing: raw kept, flagged
    val malChunk = Warc.records(httpRecord("Transfer-Encoding: chunked\r\n",
      "ZZZ\r\nnot chunked".getBytes(iso))).head
    assert(!malChunk.http_decoded)
    // a body INFLATING past the payload cap (gzip bomb / huge page): the capped
    // prefix is kept and the record flags truncated — caps are never silent
    val bombBody = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(new Array[Byte](100000)); g.close() // 100 KB of zeros, ~100 B gzipped
      bos.toByteArray
    }
    val bomb = Warc.records(httpRecord("Content-Encoding: gzip\r\n", bombBody),
      maxPayloadBytes = 4096).head
    assert(bomb.truncated && bomb.http_decoded && bomb.payload.length == 4096,
      s"got truncated=${bomb.truncated} decoded=${bomb.http_decoded} len=${bomb.payload.length}")
    // ...and the retained (post-decode) bytes are what the total budget counts:
    // one bomb inflates to 64 KB, spending a 60 KB budget (the ~200 compressed
    // bytes alone would not) — the second record is cut and the blob flagged
    val bombRec = httpRecord("Content-Encoding: gzip\r\n", bombBody)
    val twoBombs = Warc.parse(Warc.encodeWarc(Seq(bombRec, bombRec)),
      maxPayloadBytes = 64 * 1024, maxTotalBytes = 60L * 1024)
    assert(twoBombs.records.size == 1 && twoBombs.capped,
      s"decode amplification must count against the budget: ${twoBombs.records.size}")
  }

  test("folded header lines (RFC 7230 obs-fold) join the previous value, WARC and HTTP side") {
    // a folded WARC-Target-URI and a folded HTTP Content-Type: the continuation
    // lines must append to their headers, not be dropped as malformed lines
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain;\r\n" +
      "\tcharset=utf-8\r\nContent-Length: 5\r\n\r\nhello").getBytes(iso)
    val raw = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/a\r\n very/long/path\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++ http ++
      "\r\n\r\n".getBytes(iso)
    val r = Warc.records(raw).head
    assert(r.target_uri.contains("https://example.com/a very/long/path"), s"${r.target_uri}")
    assert(r.http_content_type.contains("text/plain; charset=utf-8"), s"${r.http_content_type}")
    assert(new String(r.payload, iso) == "hello")
  }

  test("payload digest and revisit linkage surface as columns; responseTexts skips revisits") {
    import spark.implicits._
    val resp = Warc.encodeResponseRecord("https://example.com/x", "2026-01-01T00:00:00Z",
      "<urn:uuid:orig>", 200, "text/html", "<p>the page</p>".getBytes(iso),
      payloadDigest = Some("sha1:AAAABBBB"))
    val revisit = Warc.encodeRevisitRecord("https://example.com/x", "2026-01-02T00:00:00Z",
      "<urn:uuid:again>", "<urn:uuid:orig>", "sha1:AAAABBBB")
    val rs = Warc.records(Warc.encodeWarc(Seq(resp, revisit)))
    assert(rs.size == 2)
    assert(rs(0).payload_digest.contains("sha1:AAAABBBB") && rs(0).refers_to.isEmpty)
    assert(rs(1).warc_type.contains("revisit"))
    assert(rs(1).payload_digest.contains("sha1:AAAABBBB"))
    assert(rs(1).refers_to.contains("<urn:uuid:orig>"))
    assert(rs(1).profile.exists(_.contains("identical-payload-digest")))
    assert(rs(1).payload.isEmpty && !rs(1).truncated)
    // DataFrame path: digest column present; the text bridge keeps only the
    // real response (revisits duplicate content BY CONSTRUCTION)
    val df = Seq((1L, Warc.encodeWarc(Seq(resp, revisit)))).toDF("blob_id", "warc")
    val ex = Warc.explodeRecords(df, "warc")
    assert(ex.filter(col("payload_digest") === "sha1:AAAABBBB").count() == 2)
    val texts = Warc.responseTexts(df, "warc").collect()
    assert(texts.length == 1, "revisit records must not reach the text chain")
  }

  test("zero-record blobs keep one outer row — caps and junk are never silently erased") {
    import spark.implicits._
    // a junk (non-WARC) blob parses to zero records; the OUTER explode keeps
    // one row with null record fields so the blob stays visible — the same
    // mechanism that keeps a capped-empty row (zstd blob on a JVM without
    // zstd-jni parses to WarcParse(capped=true, Nil)) from vanishing
    val df = Seq((1L, "junk bytes, not a warc".getBytes(iso)),
      (2L, Warc.encodeWarc(Seq(rec(0))))).toDF("blob_id", "warc")
    val ex = Warc.explodeRecords(df, "warc")
    assert(ex.count() == 2, "junk blob must keep its row")
    val junk = ex.filter(col("blob_id") === 1L).collect().head
    assert(junk.getAs[Any]("warc_type") == null && !junk.getAs[Boolean]("blob_capped"))
    // downstream record filters exclude the null rows naturally
    assert(Warc.responseTexts(df, "warc").count() == 1)
  }

  test("charset resolution: BOM > header param > meta sniff > validity fallback") {
    def d(bytes: Array[Byte], ct: String) = Warc.decodeText(bytes, Option(ct))
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // header-declared windows-1252 incl. the 0x80-0x9F printables (euro, dash)
    val w = d("café – résumé €".getBytes(cp1252),
      "text/html; charset=iso-8859-1") // WHATWG: latin-1 label MEANS cp1252
    assert(w.text == "café – résumé €" &&
      w.charset == "windows-1252" && !w.charset_assumed, s"$w")
    // meta-declared Shift_JIS (no header param): sniffed from the head bytes
    val sjBody = "<html><head><meta charset=shift_jis></head><body>日本語</body></html>"
    val sj = d(sjBody.getBytes("windows-31j"), "text/html")
    assert(sj.text == sjBody && sj.charset == "windows-31j" && !sj.charset_assumed, s"$sj")
    // http-equiv form + GBK label
    val gbBody = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=gb2312\"></head><body>中文网页</body></html>"
    val gb = d(gbBody.getBytes("GBK"), "text/html")
    assert(gb.text == gbBody && gb.charset == "gbk" && !gb.charset_assumed, s"$gb")
    // EUC-KR label resolves to the windows-949 superset
    val krBody = "한국어 페이지"
    val kr = d(krBody.getBytes("x-windows-949"), "text/plain; charset=euc-kr")
    assert(kr.text == krBody && kr.charset == "x-windows-949" && !kr.charset_assumed)
    // a BOM beats a LYING header (WHATWG: the in-band declaration wins)
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "日本".getBytes("UTF-8")
    val b = d(bom, "text/html; charset=shift_jis")
    assert(b.text == "日本" && b.charset == "utf-8" && !b.charset_assumed,
      "BOM must override the header and be stripped")
    // MISLABELED utf-8 (real crawls are full of this): bytes are cp1252 —
    // verify-then-fallback, flagged assumed
    val lie = d("café".getBytes(cp1252), "text/html; charset=utf-8")
    assert(lie.text == "café" && lie.charset == "windows-1252" && lie.charset_assumed, s"$lie")
    // no declaration at all: valid multibyte UTF-8 passes the validity check...
    val u = d("日本語 page".getBytes("UTF-8"), "text/plain")
    assert(u.text == "日本語 page" && u.charset == "utf-8" && u.charset_assumed)
    // ...and invalid UTF-8 falls to windows-1252, also flagged
    val f = d("legacy café".getBytes(cp1252), "text/plain")
    assert(f.text == "legacy café" && f.charset == "windows-1252" && f.charset_assumed)
    // unknown/garbage label: falls through the chain, never throws
    val g = d("plain ascii".getBytes(iso), "text/plain; charset=klingon-8")
    assert(g.text == "plain ascii" && g.charset == "utf-8" && g.charset_assumed)
    // a utf-16 LABEL found by the single-byte META prescan proves the page is
    // NOT utf-16 (WHATWG rewrites these to utf-8) — honoring it would pair the
    // ASCII bytes into CJK garbage and report a confident declaration
    val u16 = d("<html><head><meta charset=utf-16></head><body>ascii body</body></html>"
      .getBytes(iso), "text/html")
    assert(u16.text.contains("ascii body") && u16.charset == "utf-8", s"$u16")
    // ...but a TRANSPORT-layer utf-16 declaration is legitimate (the rewrite
    // argument doesn't apply to headers): a BOM-less UTF-16LE body with an
    // honest header decodes by its label, not as NUL-interleaved utf-8
    val u16h = d("hello page".getBytes(java.nio.charset.StandardCharsets.UTF_16LE),
      "text/html; charset=UTF-16LE")
    assert(u16h.text == "hello page" && u16h.charset == "utf-16le" && !u16h.charset_assumed,
      s"$u16h")
    // the endianness-UNSPECIFIED label means LE per WHATWG (Java's bare UTF-16
    // decoder would assume BE and byte-swap the page into CJK garbage)
    val u16bare = d("hello page".getBytes(java.nio.charset.StandardCharsets.UTF_16LE),
      "text/html; charset=utf-16")
    assert(u16bare.text == "hello page" && u16bare.charset == "utf-16le", s"$u16bare")
    // a commented-out OLD declaration must not override the live one (charset
    // migrations leave these behind; the WHATWG prescan skips comment spans)
    val migrated = ("<html><head><!-- <meta charset=shift_jis> -->" +
      "<meta charset=windows-1252></head><body>café page</body></html>")
      .getBytes(cp1252)
    val mg = d(migrated, "text/html")
    assert(mg.charset == "windows-1252" && !mg.charset_assumed &&
      mg.text.contains("café page"), s"$mg")
    // a LYING UTF-8 BOM on non-UTF-8 content is STRIPPED before the fallback
    // decodes — no mojibake prefix enters the text chain
    val bomLie = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "café".getBytes(cp1252)
    val bl = d(bomLie, "text/html; charset=iso-8859-1")
    assert(bl.text == "café", s"got <${bl.text}> — BOM must not leak as a prefix")
    // empty/null payloads stay total
    assert(Warc.decodeText(Array.emptyByteArray, Some("text/html")).text == "")
    assert(Warc.decodeText(null, None).text == "")
    // `charset=` PROSE inside an unrelated meta's content value is NOT a
    // declaration (WHATWG prescan reads only the charset attribute, or content
    // under http-equiv=content-type) — the page falls through to the validity
    // chain instead of decoding as big5 with a confident flag
    val prose = ("<html><head><meta name=\"description\" " +
      "content=\"how to use charset=big5 pages\"></head><body>café body</body></html>")
      .getBytes(cp1252)
    val pr = d(prose, "text/html")
    assert(pr.charset == "windows-1252" && pr.charset_assumed &&
      pr.text.contains("café body"), s"$pr")
    // ...while content WITH http-equiv=content-type on the SAME tag still counts
    val eq = ("<html><head><meta content=\"text/html; charset=windows-1252\" " +
      "http-equiv=content-type></head><body>café body</body></html>").getBytes(cp1252)
    val eqd = d(eq, "text/html")
    assert(eqd.charset == "windows-1252" && !eqd.charset_assumed, s"$eqd")
    // a bare charset ATTRIBUTE after other attributes still wins
    val bare = "<html><head><meta foo=bar charset='windows-1252'></head><body>café</body></html>"
      .getBytes(cp1252)
    val bd = d(bare, "text/html")
    assert(bd.charset == "windows-1252" && !bd.charset_assumed, s"$bd")
  }

  test("responseTexts: charset columns flow through; XHTML pages join the prose bridge") {
    import spark.implicits._
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val blobs = Seq(
      (1L, Warc.encodeWarc(Seq(rec(0, ct = "text/html; charset=windows-1252",
        body = new String("résumé café €".getBytes(cp1252), iso))))),
      // application/xhtml+xml is a real slice of the web — it must not be
      // dropped by a text-only media filter
      (2L, Warc.encodeWarc(Seq(rec(1, ct = "application/xhtml+xml",
        body = "<p>xhtml page</p>")))),
      (3L, Warc.encodeWarc(Seq(rec(2, ct = "application/pdf", body = "%PDF")))))
      .toDF("blob_id", "warc")
    val out = Warc.responseTexts(blobs, "warc")
      .select("blob_id", "text", "charset", "charset_assumed")
      .collect().sortBy(_.getLong(0))
    assert(out.length == 2, "pdf must be excluded; xhtml must be kept")
    assert(out(0).getString(1) == "résumé café €")
    assert(out(0).getString(2) == "windows-1252" && !out(0).getBoolean(3))
    assert(out(1).getString(1) == "<p>xhtml page</p>")
    assert(out(1).getString(2) == "utf-8" && out(1).getBoolean(3))
  }

  test("explodeRecords drops the blob and responseTexts feeds the text chain") {
    import spark.implicits._
    val mk = (i: Int) => Warc.encodeWarc(Seq(
      // mixed-case media type: RFC 7231 says case-insensitive, servers do emit it
      rec(i * 3, ct = if (i == 0) "Text/HTML; charset=utf-8" else "text/html",
        body = s"The quick brown fox jumps over the lazy dog ${i * 3}."),
      rec(i * 3 + 1, status = 404, body = "not found"),
      rec(i * 3 + 2, ct = "image/png", body = "PNGBYTES")), gzip = i % 2 == 0)
    val df = (0 until 4).map(i => (i.toLong, s"crawl-$i.warc", mk(i)))
      .toDF("blob_id", "name", "warc")
    val exploded = Warc.explodeRecords(df, "warc")
    assert(!exploded.columns.contains("warc"), "blob column must be dropped")
    assert(exploded.count() == 12)
    assert(exploded.filter(col("http_status") === 200).count() == 8)
    assert(exploded.filter(col("blob_capped")).count() == 0, "no caps fired")
    // caller columns that collide with record columns fail FAST, not ambiguously —
    // including case variants (Spark resolves names case-insensitively)
    val clash = intercept[IllegalArgumentException] {
      Warc.explodeRecords(df.withColumnRenamed("name", "Payload"), "warc")
    }
    assert(clash.getMessage.contains("payload"))
    // the text output name must not silently overwrite a caller column
    val textClash = intercept[IllegalArgumentException] {
      Warc.responseTexts(df.withColumnRenamed("name", "text"), "warc")
    }
    assert(textClash.getMessage.contains("text"))
    // ...nor collide with the charset OUTPUT columns (textOut="charset" would
    // pass the input check and then be overwritten by the charset column)
    val outClash = intercept[IllegalArgumentException] {
      Warc.responseTexts(df, "warc", textOut = "charset")
    }
    assert(outClash.getMessage.contains("charset"))
    // ...nor shadow a WARC record column: textOut="payload" would be written
    // over the record payload and then dropped — no text column, no error
    val recClash = intercept[IllegalArgumentException] {
      Warc.responseTexts(df, "warc", textOut = "payload")
    }
    assert(recClash.getMessage.contains("payload"))
    // degenerate caps would silently drop blobs: rejected up front
    intercept[IllegalArgumentException] { Warc.explodeRecords(df, "warc", maxRecords = 0) }
    // the curation bridge: only 200 text-typed bodies, decoded, one per page
    val texts = Warc.responseTexts(df, "warc")
    val rows = texts.select("blob_id", "text").collect()
    assert(rows.length == 4, s"got ${rows.length}")
    assert(rows.forall(_.getString(1).startsWith("The quick brown fox")))
    // flows straight into the engine's text ops (quality scoring)
    val scored = texts.withColumn("q",
      graft.functions.TextFunctions.qualityScore(col("text")))
    assert(scored.filter(col("q") > 0).count() == 4)
  }
}
