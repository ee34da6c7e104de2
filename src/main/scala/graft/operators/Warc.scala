package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the container web-scale training
  * corpora actually arrive in (Common Crawl ships each crawl as multi-member-gzip
  * WARC files; "100 TB of text" in practice means "a few hundred thousand
  * warc.gz blobs"). This module turns those blobs into rows the rest of the
  * engine already handles: quality scoring, dedup, decontamination, splits.
  *
  * Scale shape: one WARC file arrives as ONE binary row (`binaryFile` reader or
  * [[graft.sources.Sources]]); records are parsed IN THE TASK THAT HOLDS THE
  * BLOB — raw archive bytes never shuffle, and [[explodeRecords]] drops the
  * source blob column before exploding so multi-hundred-MB archives are never
  * duplicated per record row. Executor memory per task is bounded by the THREE
  * parse caps (`maxRecords`, `maxPayloadBytes` per record, `maxTotalBytes`
  * across the blob) — and every cap that fires is VISIBLE: capped payloads set
  * the record's `truncated`, a capped walk sets the blob's `blob_capped` column,
  * so downstream counts are never silently wrong.
  *
  * The parser is TOTAL, like every byte-walk in this engine (one uncaught
  * exception inside an executor UDF kills tasks with retries at corpus scale):
  * corrupt gzip members, malformed headers, and mid-record truncation stop the
  * walk and keep the records parsed so far — never a throw, never fake records.
  */
object Warc {

  /** One WARC record. `payload` is the HTTP message BODY for
    * `application/http` records (status line and headers parsed off into
    * `http_status` / `http_content_type`; chunked transfer framing and
    * gzip/deflate/zstd/brotli `Content-Encoding` are DECODED — brotli via the
    * built-in RFC 7932 decoder [[graft.functions.Brotli]], always present —
    * `http_decoded` is false when the body used an encoding this JVM can't
    * undo or a corrupt stream, and `payload` then holds the raw
    * framed/compressed bytes). For non-HTTP records, `payload` is the raw
    * record content. `truncated` marks a payload that is NOT the full
    * original, from any of: the per-record parse cap, a decode cut at the
    * cap, a compressed body that ends mid-stream (the Common Crawl ~1 MB
    * capture cut — its decoded prefix is kept), or a `WARC-Truncated`
    * header stamped by the crawler. `payload_digest` passes `WARC-Payload-Digest` through (Common Crawl
    * stamps every record with a SHA-1 of the payload — exact cross-archive
    * dedup without re-hashing a byte); `refers_to`/`profile` carry the
    * `revisit`-record linkage (`WARC-Refers-To` / `WARC-Profile`).
    */
  final case class WarcRecord(
      record_idx: Int,
      warc_type: Option[String],
      record_id: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      content_type: Option[String],
      content_length: Long,
      payload_digest: Option[String],
      refers_to: Option[String],
      profile: Option[String],
      http_status: Option[Int],
      http_content_type: Option[String],
      http_decoded: Boolean,
      payload: Array[Byte],
      truncated: Boolean)

  /** Parse result: `capped` is true when the walk stopped at `maxRecords` or
    * `maxTotalBytes` with input remaining — the blob holds MORE records than
    * were returned.
    */
  final case class WarcParse(capped: Boolean, records: Seq[WarcRecord])

  /** Records of a WARC blob — plain, gzip (JDK `GZIPInputStream` reads the
    * member-per-record warc.gz layout), or zstd (`.warc.zst`, the newer Common
    * Crawl drops; zstd-jni ships with Spark). Returns the records parsed before
    * the first structural error; `Nil` for null/empty/non-WARC bytes. Use
    * [[parse]] when the caller needs to know whether a cap fired.
    */
  def records(bytes: Array[Byte], maxRecords: Int = 200000,
      maxPayloadBytes: Int = 16 * 1024 * 1024,
      maxTotalBytes: Long = 512L * 1024 * 1024): Seq[WarcRecord] =
    parse(bytes, maxRecords, maxPayloadBytes, maxTotalBytes).records

  /** [[records]] plus the blob-level cap signal. */
  def parse(bytes: Array[Byte], maxRecords: Int = 200000,
      maxPayloadBytes: Int = 16 * 1024 * 1024,
      maxTotalBytes: Long = 512L * 1024 * 1024): WarcParse = {
    if (bytes == null || bytes.length < 4) return WarcParse(capped = false, Nil)
    try {
      val in: java.io.InputStream =
        if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
          new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 65536)
        else if (isZstdMagic(bytes)) zstdWarcStream(bytes) match {
          case Some(z) => z
          // zstd-jni missing: content EXISTS that we could not return — capped,
          // not empty, so the blob_capped column flags the loss
          case None => return WarcParse(capped = true, Nil)
        }
        else new java.io.ByteArrayInputStream(bytes)
      parseStream(in, maxRecords, maxPayloadBytes, maxTotalBytes)
    } catch { case scala.util.control.NonFatal(_) => WarcParse(capped = false, Nil) }
  }

  /** Standard frame magic (28 B5 2F FD) OR a leading SKIPPABLE frame
    * (5? 2A 4D 18) — warc.zst archives often open with one carrying the
    * compression dictionary, and the decoder skips it in streaming mode.
    */
  private def isZstdMagic(bytes: Array[Byte]): Boolean =
    ((bytes(0) & 0xff) == 0x28 && (bytes(1) & 0xff) == 0xb5 &&
      (bytes(2) & 0xff) == 0x2f && (bytes(3) & 0xff) == 0xfd) ||
      ((bytes(0) & 0xf0) == 0x50 && (bytes(1) & 0xff) == 0x2a &&
        (bytes(2) & 0xff) == 0x4d && (bytes(3) & 0xff) == 0x18)

  /** zstd decode stream, or None when zstd-jni is missing from the runtime
    * classpath — a NoClassDefFoundError is a LinkageError that NonFatal would
    * NOT catch, so without this guard one zstd-magic blob would break the
    * parser's never-throw contract and kill the task.
    */
  private def zstdStream(in: java.io.InputStream,
      dict: Array[Byte] = null): Option[java.io.InputStream] =
    try {
      val z = new com.github.luben.zstd.ZstdInputStream(in)
      // Continuous mode tolerates a stream that ENDS MID-FRAME (clean EOF on
      // whatever decoded) — which also means the codec layer CANNOT flag
      // truncation (the round-12 byte-cut fuzz finding: cut magics/headers/frame
      // boundaries all read as clean EOF). Both consumers want max-prefix
      // recovery and handle the flagging themselves: the archive path emits the
      // complete prefix records of a truncated .warc.zst, and the HTTP-body path
      // decides `truncated` via the zstdFramesComplete header walk BEFORE the
      // decode — never by trusting this stream's EOF.
      z.setContinuous(true)
      if (dict != null && dict.length > 0) z.setDict(dict)
      Some(z)
    } catch {
      case _: LinkageError => None
      case scala.util.control.NonFatal(_) => None
    }

  /** Archive-level zstd stream honoring the IIPC .warc.zst layout: a LEADING
    * skippable frame carries the dictionary the content frames were compressed
    * with (possibly itself zstd-compressed) — load it, don't just skip it, or
    * every dictionary-compressed archive silently decodes to zero records.
    */
  private def zstdWarcStream(bytes: Array[Byte]): Option[java.io.InputStream] = {
    var off = 0
    var dict: Array[Byte] = null
    if ((bytes(0) & 0xf0) == 0x50 && (bytes(1) & 0xff) == 0x2a &&
      (bytes(2) & 0xff) == 0x4d && (bytes(3) & 0xff) == 0x18 && bytes.length >= 8) {
      val sz = (bytes(4) & 0xffL) | ((bytes(5) & 0xffL) << 8) |
        ((bytes(6) & 0xffL) << 16) | ((bytes(7) & 0xffL) << 24)
      if (sz <= bytes.length - 8L) {
        dict = java.util.Arrays.copyOfRange(bytes, 8, 8 + sz.toInt)
        off = 8 + sz.toInt
        // per the spec the dictionary may itself be zstd-compressed
        if (dict.length >= 4 && (dict(0) & 0xff) == 0x28 && (dict(1) & 0xff) == 0xb5 &&
          (dict(2) & 0xff) == 0x2f && (dict(3) & 0xff) == 0xfd) {
          dict = zstdStream(new java.io.ByteArrayInputStream(dict)).map { zin =>
            try {
              val out = new java.io.ByteArrayOutputStream(dict.length * 4)
              val buf = new Array[Byte](8192)
              var r = zin.read(buf)
              while (r >= 0 && out.size <= 128 * 1024 * 1024) { out.write(buf, 0, r); r = zin.read(buf) }
              out.toByteArray
            } finally zin.close()
          }.orNull
          if (dict == null) return None // codec missing mid-parse
        }
      }
    }
    zstdStream(new java.io.ByteArrayInputStream(bytes, off, bytes.length - off), dict)
  }

  private def parseStream(in0: java.io.InputStream, maxRecords: Int,
      maxPayloadBytes: Int, maxTotalBytes: Long): WarcParse = {
    val in = new java.io.BufferedInputStream(in0, 65536)
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var totalBytes = 0L
    var capped = false
    try {
      var ok = true
      while (ok) {
        if (out.length >= maxRecords || totalBytes >= maxTotalBytes) {
          // budget spent: if ANY further record header exists, the blob is capped
          var line = readLine(in)
          while (line.contains("")) line = readLine(in)
          capped = line.exists(_.startsWith("WARC/"))
          ok = false
        } else {
          // skip the blank lines that separate records
          var line = readLine(in)
          while (line.contains("")) line = readLine(in)
          line match {
            case Some(v) if v.startsWith("WARC/") =>
              val headers = readHeaders(in)
              headers.get("content-length").flatMap(_.toLongOption).filter(_ >= 0) match {
                case Some(clen) =>
                  val cap = math.min(clen, maxPayloadBytes.toLong).toInt
                  val content = readN(in, cap)
                  val streamEnded = content.length < cap // asked for cap, got less
                  val payloadCapped = clen > cap
                  if (!streamEnded && payloadCapped) skipN(in, clen - cap)
                  val ctype = headers.get("content-type")
                  val isHttp = ctype.exists(_.toLowerCase(java.util.Locale.ROOT)
                    .startsWith("application/http"))
                  val (status, httpCt, decoded, decodeCapped, body) =
                    if (isHttp && !streamEnded && !payloadCapped)
                      splitHttp(content, maxPayloadBytes)
                    else (None, None, true, false, content)
                  // budget the bytes actually RETAINED: a small gzip body can
                  // inflate to maxPayloadBytes, and counting only the compressed
                  // size would let decompression amplification blow the bound
                  totalBytes += math.max(content.length, body.length).toLong
                  // WARC-Truncated: the CRAWLER already cut this payload at
                  // capture (Common Crawl stamps it on every response cut at
                  // its 1 MB limit) — the stored bytes parse cleanly, so
                  // without honoring the header the text would read complete
                  // when it is not. Folds into the same `truncated` flag the
                  // parse caps feed: "payload is not the full original".
                  val storedTruncated = headers.contains("warc-truncated")
                  out += WarcRecord(out.length, headers.get("warc-type"),
                    headers.get("warc-record-id"), headers.get("warc-target-uri"),
                    headers.get("warc-date"), ctype, clen,
                    headers.get("warc-payload-digest"), headers.get("warc-refers-to"),
                    headers.get("warc-profile"), status, httpCt,
                    decoded, body,
                    streamEnded || payloadCapped || decodeCapped || storedTruncated)
                  // a capped record skips its remainder and the walk continues;
                  // only a genuinely ended stream stops it
                  if (streamEnded) ok = false
                case None => ok = false // no parseable Content-Length: can't advance
              }
            case _ => ok = false // EOF or not a record header
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () } // keep what parsed
    WarcParse(capped, out.toSeq)
  }

  /** One header-terminated line (strips the trailing `\r`); None at EOF. Lines
    * are capped at 64 KiB — a "line" longer than that is not a WARC header.
    */
  private def readLine(in: java.io.InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(80)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n' && sb.length < 65536) {
      sb.append(c.toChar) // WARC headers are ASCII; bytes map 1:1
      c = in.read()
    }
    if (sb.length >= 65536) return None
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r') sb.setLength(sb.length - 1)
    Some(sb.toString)
  }

  /** `Name: value` lines until the blank separator; names lower-cased (WARC
    * header names are case-insensitive), first occurrence wins. A line starting
    * with SP/HT is an RFC 7230 obs-fold continuation of the PREVIOUS header's
    * value (the WARC spec inherits the folding grammar) — dropping it would
    * truncate folded values like a long `WARC-Target-URI`, and a folded
    * `Content-Length` would stop the record walk for the rest of the blob.
    */
  private def readHeaders(in: java.io.InputStream): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    // key of the previous header line, ONLY when its value is live in `m` — a
    // duplicate header is ignored, so its continuations must be too
    var lastKey: String = null
    var line = readLine(in)
    while (line.exists(_.nonEmpty)) {
      val l = line.get
      if (l.charAt(0) == ' ' || l.charAt(0) == '\t') {
        if (lastKey != null) m(lastKey) = (m(lastKey) + " " + l.trim).trim
      } else {
        val i = l.indexOf(':')
        if (i > 0) {
          val k = l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          if (!m.contains(k)) { m(k) = l.substring(i + 1).trim; lastKey = k }
          else lastKey = null
        } else lastKey = null
      }
      line = readLine(in)
    }
    m.toMap
  }

  private def readN(in: java.io.InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    var r = 0
    while (off < n && r >= 0) {
      r = in.read(buf, off, n - off)
      if (r > 0) off += r
    }
    if (off == n) buf else java.util.Arrays.copyOf(buf, off)
  }

  private def skipN(in: java.io.InputStream, n: Long): Unit = {
    var left = n
    val buf = new Array[Byte](8192)
    var r = 0
    while (left > 0 && r >= 0) {
      r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r > 0) left -= r
    }
  }

  /** Split an `application/http` record content into (status, Content-Type,
    * bodyDecoded, decodeCapped, body). Chunked transfer framing is removed and
    * gzip/deflate/zstd/brotli `Content-Encoding` inflated (crawlers store the
    * response AS CAPTURED, so real Common Crawl bodies carry both); an unknown
    * encoding token, a corrupt stream, or malformed framing keeps the raw bytes with
    * bodyDecoded=false, and a body INFLATING past the payload cap keeps the
    * capped prefix with decodeCapped=true (it feeds the record's `truncated`,
    * per the caps-are-visible contract). A malformed message (no separator / no
    * status line) keeps the full content as payload with no status — never a
    * guessed split.
    */
  private def splitHttp(content: Array[Byte], maxPayloadBytes: Int)
      : (Option[Int], Option[String], Boolean, Boolean, Array[Byte]) = {
    // find the \r\n\r\n (tolerate \n\n) header/body separator
    var i = 0
    var sep = -1
    var sepLen = 0
    while (sep < 0 && i < content.length - 1) {
      if (content(i) == '\n') {
        if (content(i + 1) == '\n') { sep = i + 1; sepLen = 1 }
        else if (i + 2 < content.length && content(i + 1) == '\r' &&
          content(i + 2) == '\n') { sep = i + 1; sepLen = 2 }
      }
      i += 1
    }
    if (sep < 0) return (None, None, true, false, content)
    val head = new String(content, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    // join RFC 7230 obs-fold continuations (leading SP/HT) onto the previous
    // line BEFORE header matching — a folded Content-Type/Content-Encoding
    // value split across lines must stay one header, not become junk lines
    val lines = {
      val raw = head.split("\n").map(_.stripSuffix("\r"))
      val out = scala.collection.mutable.ArrayBuffer[String]()
      raw.foreach { l =>
        if (l.nonEmpty && (l.charAt(0) == ' ' || l.charAt(0) == '\t') && out.nonEmpty)
          out(out.length - 1) = out(out.length - 1) + " " + l.trim
        else out += l
      }
      out.toArray
    }
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1))
      .flatMap(_.toIntOption)
    if (status.isEmpty) return (None, None, true, false, content)
    def header(name: String): Option[String] = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith(name + ":") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    val ct = header("content-type")
    var body = java.util.Arrays.copyOfRange(content, sep + sepLen, content.length)
    var decoded = true
    var decodeCapped = false
    if (header("transfer-encoding").exists(_.toLowerCase(java.util.Locale.ROOT)
      .contains("chunked"))) {
      dechunk(body) match {
        case Some(b) => body = b
        case None => decoded = false // malformed framing: keep raw, say so
      }
    }
    // Content-Encoding may be a CHAIN (`gzip, br` = gzip applied first, br
    // last — RFC 9110 lists codings in application order, so decode runs
    // RIGHT to LEFT). Each stage is capped independently; a capped stage
    // flags decodeCapped and later stages see the capped prefix (the same
    // budget-on-post-decode-bytes rule the single-coding path has always
    // applied). Any unknown token or corrupt stage keeps the ORIGINAL raw
    // body with decoded=false — never a half-decoded intermediate.
    if (decoded) header("content-encoding").foreach { hdr =>
      val codings = hdr.toLowerCase(java.util.Locale.ROOT).split(",")
        .map(_.trim).filter(e => e.nonEmpty && e != "identity")
      var cur = body
      var ok = true
      var i = codings.length - 1
      while (ok && i >= 0) {
        inflateBody(cur, codings(i), maxPayloadBytes) match {
          case Some((b, capped)) => cur = b; decodeCapped = decodeCapped || capped
          case None => ok = false
        }
        i -= 1
      }
      if (ok) body = cur
      else { decoded = false; decodeCapped = false } // keep raw, say so
    }
    (status, ct, decoded, decodeCapped, body)
  }

  /** Remove chunked transfer framing: `hexsize[;ext]\r\n data \r\n` repeated,
    * terminated by a zero-size chunk. None for malformed framing.
    */
  private def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    while (true) {
      // read the size line
      var eol = pos
      while (eol < body.length && body(eol) != '\n') eol += 1
      if (eol >= body.length) return None
      val line = new String(body, pos, eol - pos,
        java.nio.charset.StandardCharsets.ISO_8859_1).stripSuffix("\r")
      val hexLen = line.indexOf(';') match { case -1 => line case j => line.substring(0, j) }
      val size =
        try java.lang.Long.parseLong(hexLen.trim, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > body.length) return None
      if (size == 0) return Some(out.toByteArray) // terminal chunk (trailers ignored)
      pos = eol + 1
      if (pos + size > body.length) return None
      out.write(body, pos, size.toInt)
      pos += size.toInt
      // consume the \r\n after the chunk data
      if (pos < body.length && body(pos) == '\r') pos += 1
      if (pos >= body.length || body(pos) != '\n') return None
      pos += 1
    }
    None // unreachable
  }

  /** Inflate a gzip/deflate-encoded body: Some((bytes, capped)) where `capped`
    * marks a decode cut at `maxBytes` (a gzip bomb or merely huge page — the
    * prefix is kept and the record flags `truncated`). None for unsupported
    * encodings or corrupt streams.
    */
  private def inflateBody(body: Array[Byte], enc: String,
      maxBytes: Int): Option[(Array[Byte], Boolean)] = {
    // set by the zstd branch when the frame walk finds the body cut mid-stream:
    // the codec's clean EOF cannot be trusted there, so the flag ORs into the result
    var zstdBodyIncomplete = false
    try {
      val in: java.io.InputStream = enc match {
        case "gzip" | "x-gzip" =>
          new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
        case "deflate" =>
          // The HTTP `deflate` coding means a zlib-wrapped stream, but a
          // well-known server class (old IIS) ships RAW deflate under the
          // same token — browsers sniff and retry, so crawls carry both.
          // A zlib stream's first byte is the CMF: low nibble 8 (method
          // = deflate) with (CMF<<8|FLG) % 31 == 0; anything else decodes
          // as raw. (A raw stream could in principle start with a valid-
          // looking CMF/FLG pair, but its first byte would declare a
          // non-final stored/huffman block with those exact bits — the
          // sniff is the standard browser heuristic, not an invention.)
          // FDICT (FLG bit 5) means a preset dictionary we don't have:
          // Inflater.needsDictionary() would make read() return -1 at once,
          // silently yielding an EMPTY decoded body. Treat FDICT streams as
          // not-zlib so they fall to the raw-deflate attempt and, failing
          // that, stay raw+undecoded — flagged loss, never silent loss.
          val zlibWrapped = body.length >= 2 && (body(0) & 0x0F) == 8 &&
            (body(1) & 0x20) == 0 &&
            (((body(0) & 0xFF) << 8) | (body(1) & 0xFF)) % 31 == 0
          val inf = new java.util.zip.Inflater(!zlibWrapped)
          // a caller-supplied Inflater is NOT ended by close(): end it there,
          // or every raw-deflate body leaks native zlib memory until GC
          new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(body), inf) {
            override def close(): Unit = { super.close(); inf.end() }
          }
        case "zstd" =>
          // zstd truncation is structurally SILENT through zstd-jni: a body cut
          // inside a frame magic, a frame header, or at any frame boundary reads
          // as clean EOF (round-12 byte-cut fuzz) — capture truncation became an
          // unflagged empty or partial page. The header walk below (no
          // decompression) decides completeness up front; decode then runs in
          // continuous mode for MAXIMUM prefix recovery (completed blocks of a
          // cut frame still emit) with the flag forced by the walk, not the codec.
          zstdBodyIncomplete = !zstdFramesComplete(body)
          zstdStream(new java.io.ByteArrayInputStream(body)) match {
            case Some(z) => z
            case None => return None // zstd-jni missing: flag undecoded
          }
        case "br" =>
          // built-in RFC 7932 decoder (graft.functions.Brotli) — decode with
          // the soft cap so a brotli bomb keeps its capped prefix + truncated
          // flag, the same contract as the gzip read-loop below
          return try Some(graft.functions.Brotli.decompressCapped(body, maxBytes))
          catch { case _: graft.functions.Brotli.BrotliError => None } // corrupt: keep raw, say so
        case _ => return None // unknown Content-Encoding: keep raw, say so
      }
      try {
        val out = new java.io.ByteArrayOutputStream(math.min(body.length * 4, 65536))
        val buf = new Array[Byte](8192)
        var capped = false
        try {
          var r = in.read(buf)
          while (r >= 0 && !capped) {
            val wrote = math.min(r, maxBytes - out.size)
            out.write(buf, 0, wrote)
            if (wrote < r) capped = true // discarded decoded bytes
            else if (out.size >= maxBytes) { capped = in.read() >= 0; r = -1 } // at cap: more?
            else r = in.read(buf)
          }
        } catch {
          // A stream that dies MID-BODY is overwhelmingly capture truncation
          // (Common Crawl cuts big responses at ~1 MB, storing an incomplete
          // gzip/zstd stream) — keep the decoded prefix and FLAG it, the same
          // visibility contract as the caps. A stream that dies before
          // yielding a byte is corrupt from the start: raw + undecoded.
          case _: java.io.IOException if out.size > 0 =>
            return Some((out.toByteArray, true))
        }
        Some((out.toByteArray, capped || zstdBodyIncomplete))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Whether `body` is a COMPLETE sequence of zstd frames, by walking the RFC 8878
    * frame and block headers without decompressing anything. Needed because
    * zstd-jni reads a body cut at (or just past) a frame boundary — or inside a
    * magic/frame header — as a clean EOF over the frames that did complete, so
    * capture truncation is invisible to the decode itself. Skippable frames are
    * walked by their declared size; reserved block types and trailing garbage
    * read as incomplete (suspect capture — flag it, never trust it silently).
    */
  private[graft] def zstdFramesComplete(body: Array[Byte]): Boolean = {
    if (body == null) return false
    def u32(off: Int): Long =
      (body(off) & 0xffL) | ((body(off + 1) & 0xffL) << 8) |
        ((body(off + 2) & 0xffL) << 16) | ((body(off + 3) & 0xffL) << 24)
    var p = 0
    while (p < body.length) {
      if (p + 4 > body.length) return false // cut magic
      val magic = u32(p)
      if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable frame
        if (p + 8 > body.length) return false
        val sz = u32(p + 4)
        if (sz > body.length - p - 8L) return false
        p += 8 + sz.toInt
      } else if (magic == 0xFD2FB528L) { // standard frame
        p += 4
        if (p >= body.length) return false
        val fhd = body(p) & 0xff; p += 1
        if (((fhd >> 3) & 1) == 1) return false // reserved FHD bit set: not zstd
        val singleSegment = (fhd >> 5) & 1
        if (singleSegment == 0) p += 1 // window descriptor
        p += Array(0, 1, 2, 4)(fhd & 3) // dictionary id
        p += (((fhd >> 6) & 3) match { // frame content size field
          case 0 => singleSegment // 1 byte iff single-segment
          case 1 => 2
          case 2 => 4
          case _ => 8
        })
        if (p > body.length) return false // cut frame header
        var last = false
        while (!last) {
          if (p + 3 > body.length) return false // cut block header
          val bh = (body(p) & 0xff) | ((body(p + 1) & 0xff) << 8) |
            ((body(p + 2) & 0xff) << 16)
          p += 3
          last = (bh & 1) == 1
          val btype = (bh >> 1) & 3
          if (btype == 3) return false // reserved block type: corrupt
          val paySize = if (btype == 1) 1 else bh >>> 3 // RLE carries ONE byte
          if (paySize > body.length - p) return false // cut block payload
          p += paySize
        }
        if (((fhd >> 2) & 1) == 1) { // content checksum
          if (p + 4 > body.length) return false
          p += 4
        }
      } else return false // garbage between/after frames: suspect capture
    }
    true
  }

  /** The columns [[explodeRecords]] appends — kept in sync with [[WarcRecord]]
    * for the collision guard.
    */
  private val RecordColumns: Set[String] = Set("record_idx", "warc_type",
    "record_id", "target_uri", "warc_date", "content_type", "content_length",
    "payload_digest", "refers_to", "profile",
    "http_status", "http_content_type", "http_decoded", "payload", "truncated",
    "blob_capped")

  /** Explode a binary WARC column into one row per record, plus a per-blob
    * `blob_capped` flag (true when `maxRecords`/`maxTotalBytes` stopped the walk
    * with records remaining — caps are never silent). The blob column is DROPPED
    * before the explode — at scale each blob is hundreds of MB, and carrying it
    * onto every record row would multiply the stage's width by the record count.
    *
    * The explode is OUTER: a blob whose parse yields ZERO records keeps one row
    * with null record fields — this is what makes `blob_capped` trustworthy,
    * because the capped-empty case is real (a `.warc.zst` archive on a JVM
    * without zstd-jni parses to `WarcParse(capped=true, Nil)`), and an inner
    * explode would erase the blob AND its flag with no signal. Downstream
    * record filters (`warc_type === "response"`) exclude the null rows.
    */
  def explodeRecords(df: DataFrame, binCol: String, maxRecords: Int = 200000,
      maxPayloadBytes: Int = 16 * 1024 * 1024,
      maxTotalBytes: Long = 512L * 1024 * 1024): DataFrame = {
    require(maxRecords > 0 && maxPayloadBytes > 0 && maxTotalBytes > 0,
      s"degenerate caps ($maxRecords records, $maxPayloadBytes/$maxTotalBytes bytes) " +
        "would drop every record AND its blob_capped row — nothing would signal the loss")
    // Spark resolves column names case-insensitively by default, so the clash
    // check must too ("Payload" vs "payload" is the same ambiguity)
    val clash = df.columns.filter(_ != binCol)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      .intersect(RecordColumns + "_warc_recs")
    require(clash.isEmpty,
      s"input columns collide with WARC record columns: ${clash.mkString(", ")} — " +
        "rename them before exploding (silent ambiguity would follow)")
    val u = udf((b: Array[Byte]) => parse(b, maxRecords, maxPayloadBytes, maxTotalBytes))
    val keep: Array[Column] = df.columns.filter(_ != binCol).map(col)
    df.select(keep :+ u(col(binCol)).as("_warc_recs"): _*)
      .select(keep ++ Seq(col("_warc_recs.capped").as("blob_capped"),
        explode_outer(col("_warc_recs.records")).as("_rec")): _*)
      .select(keep ++ Seq(col("blob_capped"), col("_rec.*")): _*)
  }

  // ---- charset resolution (the text bridge must not mojibake real crawls) ----

  /** Decoded page text plus how the charset was resolved. `charset_assumed` is
    * true when NO explicit declaration (BOM / Content-Type param / meta tag)
    * determined it — the page decoded via the validity fallback and stays
    * visible as a guess, never silently.
    */
  final case class DecodedText(text: String, charset: String, charset_assumed: Boolean)

  private val CharsetParamPattern =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?\\s*([^\";,\\s]+)")
  // one meta TAG's attribute region; the charset is then extracted by a real
  // attribute parse ([[metaCharsetFromAttrs]]) — a bare regex over the tag body
  // would take `<meta name="description" content="...use charset=big5...">` as
  // a confident declaration, which the WHATWG prescan does not (it reads only
  // the `charset` attribute, or `content` under `http-equiv=content-type`)
  private val MetaTagPattern =
    java.util.regex.Pattern.compile("(?i)<meta([^>]{0,512})")

  /** WHATWG-prescan attribute semantics over one meta tag's attribute text: a
    * bare `charset` attribute wins; otherwise `content`'s `charset=` param
    * counts only when the SAME tag carries `http-equiv` ~= content-type.
    * Hand-rolled name[=value] scan (quoted or unquoted values, ASCII whitespace
    * only — the HTML tokenizer's definition); first occurrence of each
    * attribute wins, like the tokenizer's duplicate-attribute rule.
    */
  private[operators] def metaCharsetFromAttrs(attrs: String): Option[String] = {
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    val n = attrs.length
    var i = 0
    var charsetAttr: String = null
    var httpEquivCT = false
    var contentVal: String = null
    while (i < n) {
      while (i < n && (isWs(attrs(i)) || attrs(i) == '/')) i += 1
      if (i < n) {
        val ns = i
        while (i < n && !isWs(attrs(i)) && attrs(i) != '=' && attrs(i) != '/') i += 1
        val name = attrs.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        while (i < n && isWs(attrs(i))) i += 1
        var value = ""
        if (i < n && attrs(i) == '=') {
          i += 1
          while (i < n && isWs(attrs(i))) i += 1
          if (i < n && (attrs(i) == '"' || attrs(i) == '\'')) {
            val q = attrs(i)
            i += 1
            val vs = i
            while (i < n && attrs(i) != q) i += 1
            value = attrs.substring(vs, i)
            if (i < n) i += 1
          } else {
            // unquoted value: '/' is a VALUE char (text/html;charset=x)
            val vs = i
            while (i < n && !isWs(attrs(i))) i += 1
            value = attrs.substring(vs, i)
          }
        }
        name match {
          case "charset" if charsetAttr == null && value.trim.nonEmpty =>
            charsetAttr = value.trim
          case "http-equiv" if value.trim.equalsIgnoreCase("content-type") =>
            httpEquivCT = true
          case "content" if contentVal == null => contentVal = value
          case _ =>
        }
      }
    }
    if (charsetAttr != null) Some(charsetAttr)
    else if (httpEquivCT && contentVal != null) {
      val m = CharsetParamPattern.matcher(contentVal)
      if (m.find()) Some(m.group(1)) else None
    } else None
  }

  /** A charset LABEL (as pages declare them) → JVM charset, following the
    * WHATWG Encoding Standard's label table for the high-traffic families:
    * the latin-1/ascii labels mean windows-1252 on the real web (pages labeled
    * iso-8859-1 routinely use the 0x80–0x9F printables — curly quotes, euro),
    * shift_jis means the windows-31j superset, gb2312 means GBK. Unknown labels
    * fall through to `Charset.forName`; unresolvable ⇒ None (the caller
    * continues down the resolution chain — never a throw).
    */
  private[operators] def charsetForLabel(label0: String): Option[java.nio.charset.Charset] = {
    val label = label0.trim.toLowerCase(java.util.Locale.ROOT)
    if (label.isEmpty) return None
    val name = label match {
      case "utf8" | "utf-8" | "unicode-1-1-utf-8" => "UTF-8"
      // WHATWG maps the endianness-UNSPECIFIED utf-16 labels to UTF-16LE (the
      // dominant real-world endianness); Java's bare "UTF-16" decoder instead
      // assumes BIG-endian on BOM-less input, which would byte-swap the whole
      // page into CJK garbage. (BOM'd bodies never reach the label path — the
      // BOM branch resolves them first. Explicit utf-16le/utf-16be pass
      // through to forName below.)
      case "utf-16" | "utf16" | "unicode" | "ucs-2" | "iso-10646-ucs-2" |
          "csunicode" => "UTF-16LE"
      case "iso-8859-1" | "iso8859-1" | "iso_8859-1" | "iso_8859-1:1987" | "latin1" |
          "latin-1" | "l1" | "ascii" | "us-ascii" | "ansi_x3.4-1968" | "cp819" |
          "cp1252" | "x-cp1252" | "iso-ir-100" => "windows-1252"
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" | "csshiftjis" |
          "windows-31j" | "cp932" | "ms932" => "windows-31j"
      case "gb2312" | "gb_2312" | "gb_2312-80" | "csgb2312" | "chinese" |
          "csiso58gb231280" | "x-gbk" | "gbk" => "GBK"
      case "euc-kr" | "korean" | "ks_c_5601-1987" | "ks_c_5601-1989" | "ksc_5601" |
          "csksc56011987" | "windows-949" | "cseuckr" => "x-windows-949"
      case other => other
    }
    try Some(java.nio.charset.Charset.forName(name))
    catch {
      case _: LinkageError => None
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** BOM sniff: (charset, bytes to skip). A BOM is an in-band declaration —
    * decisive per the WHATWG decode algorithm, it overrides headers.
    */
  private def bomCharset(b: Array[Byte]): Option[(java.nio.charset.Charset, Int)] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) Some((java.nio.charset.StandardCharsets.UTF_8, 3))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      Some((java.nio.charset.StandardCharsets.UTF_16BE, 2))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      Some((java.nio.charset.StandardCharsets.UTF_16LE, 2))
    else None

  /** `<meta charset>` / `http-equiv` sniff over the head bytes (first 1 KiB,
    * scanned as ISO-8859-1 — charset labels are ASCII so the scan is
    * encoding-agnostic for every ASCII-compatible charset). Comment spans are
    * BLANKED before matching, like the WHATWG prescan skips them: charset
    * migrations routinely leave the old declaration commented out ahead of the
    * live one, and matching inside `<!-- -->` would decode the page with the
    * dead charset while reporting a confident declaration.
    */
  private def metaCharsetLabel(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, 1024)
    if (n == 0) return None
    val head = new String(b, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
      .toCharArray
    var i = 0
    while (i + 3 < head.length) {
      if (head(i) == '<' && head(i + 1) == '!' && head(i + 2) == '-' && head(i + 3) == '-') {
        var j = i + 4
        // unterminated comment (the 1 KiB window may cut it): blank to end
        while (j < head.length && !(head(j) == '>' && head(j - 1) == '-' && head(j - 2) == '-')) j += 1
        val end = if (j < head.length) j + 1 else head.length
        java.util.Arrays.fill(head, i, end, ' ')
        i = end
      } else i += 1
    }
    val m = MetaTagPattern.matcher(new String(head))
    while (m.find()) {
      val hit = metaCharsetFromAttrs(m.group(1))
      if (hit.isDefined) return hit
    }
    None
  }

  /** Strict UTF-8 decode: Some(text) only when every byte sequence is valid —
    * the validity check that backs both "declared utf-8, verify it" and the
    * no-declaration fallback. (Random windows-1252/Shift_JIS bytes are almost
    * never valid UTF-8, so a pass is a strong signal.)
    */
  private def strictUtf8(b: Array[Byte], off: Int): Option[String] =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)).toString)
    } catch { case _: java.nio.charset.CharacterCodingException => None }

  /** Resolve the page charset and decode: BOM → Content-Type `charset=` param →
    * `<meta charset>`/`http-equiv` sniff in the first 1 KiB → strict-UTF-8
    * validity → windows-1252 (total: every byte maps). A DECLARED utf-8 is
    * verified — a mislabeling server (common on real crawls) must not mojibake
    * the page into replacement chars when the windows-1252 fallback reads it
    * fine; other declared charsets decode with replacement (total, and there is
    * no validity oracle for them). Returns (text, resolved charset name,
    * assumed?) — `assumed` means the fallback chose, not a declaration.
    */
  def decodeText(payload: Array[Byte], httpContentType: Option[String]): DecodedText = {
    var b = if (payload == null) Array.emptyByteArray else payload
    var bomLied = false
    def name(cs: java.nio.charset.Charset) =
      cs.name().toLowerCase(java.util.Locale.ROOT)
    bomCharset(b) match {
      case Some((cs, skip)) =>
        if (cs eq java.nio.charset.StandardCharsets.UTF_8)
          strictUtf8(b, skip) match {
            case Some(t) => return DecodedText(t, "utf-8", charset_assumed = false)
            case None =>
              // BOM lied (e.g. cp1252 content pasted behind a BOM prefix):
              // STRIP it before falling through — the BOM is a declaration
              // artifact, not content, and decoding it with the fallback
              // charset would prefix every such page with mojibake
              b = java.util.Arrays.copyOfRange(b, skip, b.length)
              bomLied = true // the remainder is already PROVEN invalid UTF-8
          }
        else return DecodedText(new String(b, skip, b.length - skip, cs), name(cs),
          charset_assumed = false)
      case None => ()
    }
    // at most ONE strict pass over the body: both the declared-utf-8 branch
    // and the no-declaration fallback need the same answer, and re-decoding a
    // 16 MB body twice on the (common) mislabeled-utf-8 path is pure waste —
    // and when the BOM branch above already PROVED the bytes invalid (it
    // tested exactly the stripped remainder), don't re-prove it
    lazy val strict = if (bomLied) None else strictUtf8(b, 0)
    // WHATWG: a utf-16 label found by the single-byte META prescan proves the
    // document is NOT utf-16 (the label itself was readable one-byte-per-char)
    // — the spec rewrites those labels to UTF-8. The rewrite must NOT apply to
    // the transport-layer header param: a BOM-less UTF-16 body with an honest
    // 'charset=utf-16le' header is legal and decodes correctly by its label
    // (its NUL bytes are valid UTF-8, so a rewrite would return NUL-interleaved
    // garbage marked as a confident declaration).
    def rewriteMetaUtf16(label: String): String =
      label.trim.toLowerCase(java.util.Locale.ROOT) match {
        case "utf-16" | "utf16" | "utf-16le" | "utf-16be" | "unicode" |
            "ucs-2" | "iso-10646-ucs-2" | "csunicode" => "utf-8"
        case other => other
      }
    val declared = httpContentType.flatMap { ct =>
      val m = CharsetParamPattern.matcher(ct)
      if (m.find()) Some(m.group(1)) else None
    }.flatMap(charsetForLabel)
      .orElse(metaCharsetLabel(b).map(rewriteMetaUtf16).flatMap(charsetForLabel))
    declared match {
      case Some(cs) if name(cs) == "utf-8" =>
        strict match {
          case Some(t) => return DecodedText(t, "utf-8", charset_assumed = false)
          case None => () // declared utf-8 but NOT valid utf-8: fall through
        }
      case Some(cs) =>
        return DecodedText(new String(b, cs), name(cs), charset_assumed = false)
      case None => ()
    }
    strict match {
      case Some(t) => DecodedText(t, "utf-8", charset_assumed = true)
      case None => DecodedText(
        new String(b, java.nio.charset.Charset.forName("windows-1252")),
        "windows-1252", charset_assumed = true)
    }
  }

  /** The bridge into the text-curation chain: HTTP 200 text-typed response
    * bodies — any `text/` subtype plus `application/xhtml+xml`, case-insensitive
    * per RFC 7231; only fully decoded bodies (chunked framing removed,
    * gzip/deflate inflated) — CHARSET-AWARE decoded ([[decodeText]]: BOM →
    * header param → meta sniff → UTF-8 validity → windows-1252) into `textOut`,
    * one row per page, with `charset` and `charset_assumed` columns recording
    * the resolution (a double-digit share of the real web is
    * windows-1252/Shift_JIS/GBK — a blind UTF-8 cast would mojibake them
    * silently and poison the downstream quality/dedup chain). Feed the result
    * straight into quality scoring / dedup / decontamination — this is the
    * Common-Crawl entry point.
    *
    * RESERVED OUTPUT NAMES: `textOut` (default "text"), `charset`,
    * `charset_assumed`, and the WARC record columns. Inputs carrying a
    * same-named metadata column fail LOUDLY at require time (withColumn would
    * otherwise silently replace it) — rename such columns before calling.
    */
  def responseTexts(df: DataFrame, binCol: String, textOut: String = "text",
      maxRecords: Int = 200000, maxPayloadBytes: Int = 16 * 1024 * 1024,
      maxTotalBytes: Long = 512L * 1024 * 1024): DataFrame = {
    // withColumn silently REPLACES an existing column — a caller metadata column
    // named `textOut` (or the charset outputs) would vanish with no error
    val reserved = Seq(textOut, "charset", "charset_assumed", "_decoded")
    require(!df.columns.exists(c => c != binCol &&
      reserved.exists(c.equalsIgnoreCase)),
      s"output columns ${reserved.take(3).mkString("/")} already exist on the input — " +
        "rename them or pass a different textOut")
    // ...and textOut itself must not collide with the OTHER output columns:
    // textOut="charset" would pass the input check and then be overwritten by
    // the charset withColumn, and textOut="payload" (or any record column)
    // would be erased by the drop — either way the output silently has no
    // decoded text, the exact clobber class this guard exists to prevent
    require(!Seq("charset", "charset_assumed", "_decoded").exists(textOut.equalsIgnoreCase) &&
      !RecordColumns.contains(textOut.toLowerCase(java.util.Locale.ROOT)),
      s"textOut '$textOut' collides with an output/record column — pick another name")
    val dec = udf((p: Array[Byte], ct: String) => decodeText(p, Option(ct)))
    explodeRecords(df, binCol, maxRecords, maxPayloadBytes, maxTotalBytes)
      .filter(col("warc_type") === "response" && col("http_status") === 200 &&
        col("http_decoded") && !col("truncated") &&
        // ICU-free lowercase: media types are ASCII, rlike avoids the Spark 4
        // lower() collation-init cost documented in the build recipes
        col("http_content_type").rlike("(?i)^(text/|application/xhtml\\+xml)"))
      .withColumn("_decoded", dec(col("payload"), col("http_content_type")))
      .withColumn(textOut, col("_decoded.text"))
      .withColumn("charset", col("_decoded.charset"))
      .withColumn("charset_assumed", col("_decoded.charset_assumed"))
      .drop("payload", "_decoded")
  }

  // ---- encode halves (test fixtures + oracle arithmetic) ----

  /** One WARC `response` record block carrying a real HTTP message;
    * `payloadDigest` writes a `WARC-Payload-Digest` header (Common Crawl stamps
    * `sha1:BASE32` on every record).
    */
  def encodeResponseRecord(targetUri: String, dateIso: String, recordId: String,
      status: Int, httpContentType: String, body: Array[Byte],
      payloadDigest: Option[String] = None,
      contentEncoding: Option[String] = None): Array[Byte] = {
    val statusText = if (status == 200) "OK" else "NOT-OK"
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream(body.length + 512)
    val http = (s"HTTP/1.1 $status $statusText\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      contentEncoding.map(e => s"Content-Encoding: $e\r\n").getOrElse("") +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(iso)
    out.write((s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      payloadDigest.map(d => s"WARC-Payload-Digest: $d\r\n").getOrElse("") +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(iso))
    out.write(http)
    out.write(body)
    out.write("\r\n\r\n".getBytes(iso))
    out.toByteArray
  }

  /** One WARC `revisit` record block — what real crawls write instead of a
    * second `response` when a re-fetched page's payload digest matches an
    * earlier capture (the identical-payload-digest profile): the linkage
    * headers, no body. The decode side surfaces `refers_to`/`profile`/
    * `payload_digest` so pipelines can skip or resolve revisits.
    */
  def encodeRevisitRecord(targetUri: String, dateIso: String, recordId: String,
      refersTo: String, payloadDigest: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    (s"WARC/1.0\r\n" +
      s"WARC-Type: revisit\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      s"WARC-Refers-To: $refersTo\r\n" +
      s"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
      s"WARC-Payload-Digest: $payloadDigest\r\n" +
      s"Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(iso)
  }

  /** Concatenate record blocks into a WARC file; `gzip = true` produces the
    * standard multi-member layout (one gzip member per record).
    */
  def encodeWarc(recordBlocks: Seq[Array[Byte]], gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(recordBlocks.map(_.length).sum + 64)
    recordBlocks.foreach { r =>
      if (!gzip) out.write(r)
      else {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r)
        gz.close() // finishes the member; BAOS.close is a no-op, releases the Deflater
      }
    }
    out.toByteArray
  }

  /** zstd frame-per-record layout (`.warc.zst`, the newer Common Crawl drops). */
  def encodeWarcZstd(recordBlocks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(recordBlocks.map(_.length).sum / 2 + 64)
    recordBlocks.foreach { r =>
      val z = new com.github.luben.zstd.ZstdOutputStream(out)
      z.write(r)
      z.close()
    }
    out.toByteArray
  }

  /** The IIPC dictionary layout: a leading skippable frame (magic 0x184D2A5D)
    * carrying `dict`, then one frame per record compressed WITH that dictionary
    * — the decode half must load the dictionary, not merely skip the frame.
    */
  def encodeWarcZstdDict(recordBlocks: Seq[Array[Byte]], dict: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(recordBlocks.map(_.length).sum / 2 + 64)
    out.write(Array(0x5D, 0x2A, 0x4D, 0x18).map(_.toByte))
    out.write(Array(dict.length & 0xff, (dict.length >> 8) & 0xff,
      (dict.length >> 16) & 0xff, (dict.length >> 24) & 0xff).map(_.toByte))
    out.write(dict)
    recordBlocks.foreach { r =>
      val z = new com.github.luben.zstd.ZstdOutputStream(out)
      z.setDict(dict)
      z.write(r)
      z.close()
    }
    out.toByteArray
  }
}
