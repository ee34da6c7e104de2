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
  * duplicated per record row. Both parse caps (`maxRecords`, `maxPayloadBytes`)
  * bound executor memory against hostile/degenerate archives; capped payloads
  * are flagged, never silently truncated.
  *
  * The parser is TOTAL, like every byte-walk in this engine (one uncaught
  * exception inside an executor UDF kills tasks with retries at corpus scale):
  * corrupt gzip members, malformed headers, and mid-record truncation stop the
  * walk and keep the records parsed so far — never a throw, never fake records.
  */
object Warc {

  /** One WARC record. `payload` is the HTTP message BODY for
    * `application/http` records (status/headers parsed off into `http_status` /
    * `http_content_type`), the raw record content otherwise. `truncated` marks
    * payloads cut at the parse cap.
    */
  final case class WarcRecord(
      record_idx: Int,
      warc_type: Option[String],
      record_id: Option[String],
      target_uri: Option[String],
      warc_date: Option[String],
      content_type: Option[String],
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      payload: Array[Byte],
      truncated: Boolean)

  /** Parse a WARC blob (plain or gzip — JDK `GZIPInputStream` reads multi-member
    * streams, which is exactly how warc.gz files are laid out: one member per
    * record so readers can seek). Returns the records parsed before the first
    * structural error; `Nil` for null/empty/non-WARC bytes.
    */
  def records(bytes: Array[Byte], maxRecords: Int = 10000,
      maxPayloadBytes: Int = 16 * 1024 * 1024): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Nil
    try {
      val base = new java.io.ByteArrayInputStream(bytes)
      val in =
        if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
          new java.util.zip.GZIPInputStream(base, 65536)
        else base
      parseStream(in, maxRecords, maxPayloadBytes)
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  private def parseStream(in0: java.io.InputStream, maxRecords: Int,
      maxPayloadBytes: Int): Seq[WarcRecord] = {
    val in = new java.io.BufferedInputStream(in0, 65536)
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    try {
      var ok = true
      while (ok && out.length < maxRecords) {
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
                val capped = clen > cap // payload larger than the parse cap
                if (!streamEnded && capped) skipN(in, clen - cap)
                val ctype = headers.get("content-type")
                val isHttp = ctype.exists(_.toLowerCase(java.util.Locale.ROOT)
                  .startsWith("application/http"))
                val (status, httpCt, body) =
                  if (isHttp && !streamEnded && !capped) splitHttp(content)
                  else (None, None, content)
                out += WarcRecord(out.length, headers.get("warc-type"),
                  headers.get("warc-record-id"), headers.get("warc-target-uri"),
                  headers.get("warc-date"), ctype, clen, status, httpCt,
                  body, streamEnded || capped)
                // a capped record skips its remainder and the walk continues;
                // only a genuinely ended stream stops it
                if (streamEnded) ok = false
              case None => ok = false // no parseable Content-Length: can't advance
            }
          case _ => ok = false // EOF or not a record header
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () } // keep what parsed
    out.toSeq
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
    * header names are case-insensitive), first occurrence wins.
    */
  private def readHeaders(in: java.io.InputStream): Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    var line = readLine(in)
    while (line.exists(_.nonEmpty)) {
      val l = line.get
      val i = l.indexOf(':')
      if (i > 0) {
        val k = l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        if (!m.contains(k)) m(k) = l.substring(i + 1).trim
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
    * body). Malformed messages keep the full content as payload with no status —
    * never a guessed split.
    */
  private def splitHttp(content: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
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
    if (sep < 0) return (None, None, content)
    val head = new String(content, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\n").map(_.stripSuffix("\r"))
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1))
      .flatMap(_.toIntOption)
    if (status.isEmpty) return (None, None, content)
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    (status, ct, java.util.Arrays.copyOfRange(content, sep + sepLen, content.length))
  }

  /** Explode a binary WARC column into one row per record. The blob column is
    * DROPPED before the explode — at scale each blob is hundreds of MB, and
    * carrying it onto every record row would multiply the stage's width by the
    * record count.
    */
  def explodeRecords(df: DataFrame, binCol: String, maxRecords: Int = 10000,
      maxPayloadBytes: Int = 16 * 1024 * 1024): DataFrame = {
    val u = udf((b: Array[Byte]) => records(b, maxRecords, maxPayloadBytes))
    val keep: Array[Column] = df.columns.filter(_ != binCol).map(col)
    df.select(keep :+ u(col(binCol)).as("_warc_recs"): _*)
      .select(keep :+ explode(col("_warc_recs")).as("_rec"): _*)
      .select(keep :+ col("_rec.*"): _*)
  }

  /** The bridge into the text-curation chain: HTTP 200 text-typed response bodies
    * decoded as UTF-8 (Spark's binary→string cast) in `textOut`, one row per
    * page. Feed the result straight into quality scoring / dedup /
    * decontamination — this is the Common-Crawl entry point.
    */
  def responseTexts(df: DataFrame, binCol: String, textOut: String = "text",
      maxRecords: Int = 10000, maxPayloadBytes: Int = 16 * 1024 * 1024): DataFrame =
    explodeRecords(df, binCol, maxRecords, maxPayloadBytes)
      .filter(col("warc_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/") && !col("truncated"))
      .withColumn(textOut, col("payload").cast("string"))
      .drop("payload")

  // ---- encode halves (test fixtures + oracle arithmetic) ----

  /** One WARC `response` record block carrying a real HTTP message. */
  def encodeResponseRecord(targetUri: String, dateIso: String, recordId: String,
      status: Int, httpContentType: String, body: Array[Byte]): Array[Byte] = {
    val statusText = if (status == 200) "OK" else "NOT-OK"
    val http = (s"HTTP/1.1 $status $statusText\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: $recordId\r\n" +
      s"WARC-Date: $dateIso\r\n" +
      s"WARC-Target-URI: $targetUri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    hdr ++ http ++ "\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Concatenate record blocks into a WARC file; `gzip = true` produces the
    * standard multi-member layout (one gzip member per record).
    */
  def encodeWarc(recordBlocks: Seq[Array[Byte]], gzip: Boolean = false): Array[Byte] =
    if (!gzip) recordBlocks.flatten.toArray
    else recordBlocks.flatMap { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(r); gz.close()
      bos.toByteArray
    }.toArray
}
