package graft.functions

/** Pure-Scala brotli (RFC 7932) decoder.
  *
  * Why this exists: `Content-Encoding: br` is a double-digit share of modern
  * web responses, the WARC ingestion path must decode it, and the public
  * reference decoder jar (`org.brotli:dec`) cannot be resolved in an offline
  * build. This is a from-scratch implementation of the public specification
  * (RFC 7932), not a port: one class, one pass, decode-to-array.
  *
  * Provenance of the constant tables (all public data):
  *  - `graft/brotli_dictionary.bin` — the RFC 7932 Appendix A static
  *    dictionary (122,784 bytes), validated word-by-word at every length
  *    against the reference decoder (tools/brotli/recover_transforms.py).
  *  - `graft/brotli_tables.bin` — the Appendix B word transforms (121
  *    entries) and the section 7.1 UTF8/Signed literal-context lookup
  *    tables, both recovered empirically by crafting minimal streams and
  *    decoding them with the reference decoder (tools/brotli recovery
  *    scripts); the scripts and their validation reports ship in-repo.
  *  - In-source arrays (insert/copy/block-count codes, code-length order,
  *    the fixed code-length code) are the RFC section 5/6 tables.
  *
  * Scale shape: the decoder is row-local (one WARC body per call), allocates
  * O(output) and never touches Spark state, so it rides inside the existing
  * in-task decode chain. A `maxOutput` cap bounds decompression bombs — the
  * caller treats an over-cap or malformed stream as "leave raw + flag", the
  * same visible-flag contract as the missing-zstd path (Warc.scala).
  *
  * Reference behavior notes (beyond the RFC text, matched to the public
  * reference decoder and pinned by 232 fixture pairs in BrotliSpec):
  *  - equal-length symbols of simple prefix codes take codes in increasing
  *    symbol order (canonical build covers the reference's explicit sorts);
  *  - the code-length code's previous-length register starts at 8;
  *  - repeat counts accumulate as `(repeat - 2) << extra` when chained;
  *  - the distance ring buffer starts as (4, 11, 15, 16), most recent
  *    first, and dictionary references / distance code 0 do not push.
  */
object Brotli {

  class BrotliError(msg: String) extends RuntimeException(msg)

  /** Input ended before the stream did — distinguishable from structural
    * corruption so the soft-cap (WARC) path can keep a truncated body's
    * decoded prefix (Common Crawl cuts large responses at capture, storing
    * incomplete compressed streams). The STRICT decompress() path still
    * throws it like any other error.
    */
  final class BrotliTruncated(msg: String) extends BrotliError(msg)

  private def fail(msg: String): Nothing = throw new BrotliError(msg)

  // ---- constant tables from RFC 7932 sections 5 and 6 ----

  /** Insert-length codes: (extra bits, base), RFC 7932 section 5.2. */
  private val InsExtra: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val InsBase: Array[Int] = {
    val b = new Array[Int](24); var v = 0; var i = 0
    while (i < 24) { b(i) = v; v += 1 << InsExtra(i); i += 1 }; b
  }

  /** Copy-length codes: (extra bits, base starting at 2), RFC 7932 section 5.2. */
  private val CopExtra: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val CopBase: Array[Int] = {
    val b = new Array[Int](24); var v = 2; var i = 0
    while (i < 24) { b(i) = v; v += 1 << CopExtra(i); i += 1 }; b
  }

  /** Block-count codes: (extra bits, base starting at 1), RFC 7932 section 6. */
  private val BlkExtra: Array[Int] =
    Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  private val BlkBase: Array[Int] = {
    val b = new Array[Int](26); var v = 1; var i = 0
    while (i < 26) { b(i) = v; v += 1 << BlkExtra(i); i += 1 }; b
  }

  /** Insert/copy range bases per 64-symbol command cell (cells 2..10). */
  private val CellInsBase = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopBase = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** Code-length-code symbol order, RFC 7932 section 3.5. */
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Fixed code for code-length-code lengths, indexed by 4 peeked bits:
    * (bits << 16) | value. RFC 7932 section 3.5 static code.
    */
  private val ClFixed: Array[Int] = Array(
    0x020000, 0x020004, 0x020003, 0x030002, 0x020000, 0x020004, 0x020003, 0x040001,
    0x020000, 0x020004, 0x020003, 0x030002, 0x020000, 0x020004, 0x020003, 0x040005)

  /** Static-dictionary word-count bits per length 0..24, RFC 7932 section 8. */
  private val DictBits: Array[Int] =
    Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets: Array[Int] = {
    val o = new Array[Int](25); var i = 4
    while (i < 25) { o(i) = o(i - 1) + (if (i - 1 >= 4) (i - 1) << DictBits(i - 1) else 0); i += 1 }
    o
  }

  /** Distance short codes 0..15: ring index offset and value delta. */
  private val ShortIdx = Array(3, 2, 1, 0, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2)
  private val ShortDelta = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3)

  /** Max two-level table size by ceil(alphabet/32) — the standard zlib-style
    * worst-case bound for 8-bit-root tables over 15-bit codes.
    */
  private val MaxTable = Array(256, 402, 436, 468, 500, 534, 566, 598, 630, 662, 694,
    726, 758, 790, 822, 854, 886, 920, 952, 984, 1016, 1048, 1080)

  // ---- resources: dictionary, transforms, context LUTs ----

  private def loadResource(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    if (in == null) fail(s"missing resource $path")
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](16384)
      var r = in.read(buf)
      while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private lazy val dict: Array[Byte] = {
    val d = loadResource("/graft/brotli_dictionary.bin")
    if (d.length != 122784) fail(s"dictionary size ${d.length}")
    d
  }

  /** (utf8Lut0, utf8Lut1, sigLut0, sigLut1, transformPrefix, transformType, transformSuffix) */
  private lazy val aux: (Array[Int], Array[Int], Array[Int], Array[Int],
      Array[Array[Byte]], Array[Int], Array[Array[Byte]]) = {
    val t = loadResource("/graft/brotli_tables.bin")
    def lut(off: Int): Array[Int] = {
      val a = new Array[Int](256); var i = 0
      while (i < 256) { a(i) = t(off + i) & 0xff; i += 1 }; a
    }
    var p = 1024
    val n = t(p) & 0xff; p += 1
    if (n != 121) fail(s"transform count $n")
    val pre = new Array[Array[Byte]](n); val typ = new Array[Int](n); val suf = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val pl = t(p) & 0xff; p += 1
      pre(i) = java.util.Arrays.copyOfRange(t, p, p + pl); p += pl
      typ(i) = t(p) & 0xff; p += 1
      val sl = t(p) & 0xff; p += 1
      suf(i) = java.util.Arrays.copyOfRange(t, p, p + sl); p += sl
      i += 1
    }
    (lut(0), lut(256), lut(512), lut(768), pre, typ, suf)
  }

  /** Decode a complete brotli stream. Throws [[BrotliError]] on malformed
    * input or when the output would exceed `maxOutput` bytes.
    */
  def decompress(input: Array[Byte], maxOutput: Int = 1 << 30): Array[Byte] =
    new Decoder(input, maxOutput, capIsError = true).run()._1

  /** Decode with a soft cap: `(output, capped)` where `capped = true` means
    * the stream decodes past `maxOutput` and the prefix is returned — the
    * WARC caps-are-visible contract (a brotli bomb or merely huge page keeps
    * its capped prefix and flags `truncated`, same as the gzip path).
    * Malformed input still throws.
    */
  def decompressCapped(input: Array[Byte], maxOutput: Int): (Array[Byte], Boolean) =
    new Decoder(input, maxOutput, capIsError = false).run()

  /** Encode bytes as a valid brotli stream of uncompressed meta-blocks
    * (RFC 7932 section 9.2, ISUNCOMPRESSED=1). No entropy coding — this is
    * the fixture/test encoder: any conformant decoder reads it, and it lets
    * WARC fixtures carry a real `Content-Encoding: br` member offline.
    */
  def encodeUncompressed(raw: Array[Byte]): Array[Byte] = {
    val bits = new java.io.ByteArrayOutputStream(raw.length + raw.length / 65536 * 4 + 8)
    var acc = 0; var nAcc = 0
    def w(v: Int, n: Int): Unit = {
      acc |= (v & ((1 << n) - 1)) << nAcc; nAcc += n
      while (nAcc >= 8) { bits.write(acc & 0xff); acc >>>= 8; nAcc -= 8 }
    }
    def align(): Unit = if (nAcc > 0) { bits.write(acc & 0xff); acc = 0; nAcc = 0 }
    w(0, 1) // WBITS = 16
    var off = 0
    while (off < raw.length) {
      val n = math.min(65536, raw.length - off)
      w(0, 1)          // ISLAST = 0
      w(0, 2)          // MNIBBLES = 4
      w(n - 1, 16)     // MLEN - 1
      w(1, 1)          // ISUNCOMPRESSED
      align()
      bits.write(raw, off, n)
      off += n
    }
    w(1, 1); w(1, 1)   // ISLAST, ISLASTEMPTY
    align()
    bits.toByteArray
  }

  /** Encode bytes as ONE literals-only compressed meta-block under a uniform
    * 8-bit literal code — a genuinely entropy-coded RFC 7932 stream (complex
    * prefix code, command, literal loop), unlike [[encodeUncompressed]] which
    * only drives the uncompressed-block path. No size win by construction
    * (every literal costs exactly 8 bits); this is the fixture encoder that
    * lets oracle queries put id-dependent text through the compressed decode
    * path offline. Inputs past one meta-block's practical cap fall back to
    * [[encodeUncompressed]].
    */
  def encodeCompressedLiterals(raw: Array[Byte]): Array[Byte] = {
    val n = raw.length
    if (n == 0 || n > (1 << 22)) return encodeUncompressed(raw)
    var ic = 0
    while (ic < 23 && !(InsBase(ic) <= n && n < InsBase(ic) + (1 << InsExtra(ic)))) ic += 1
    val bits = new java.io.ByteArrayOutputStream(n + 64)
    var acc = 0; var nAcc = 0
    def w(v: Int, cnt: Int): Unit = {
      acc |= (v & ((1 << cnt) - 1)) << nAcc; nAcc += cnt
      while (nAcc >= 8) { bits.write(acc & 0xff); acc >>>= 8; nAcc -= 8 }
    }
    w(1, 1); w(7, 3)                     // WBITS = 24
    w(1, 1); w(0, 1)                     // ISLAST, not ISLASTEMPTY
    val nib = if (n - 1 < (1 << 16)) 4 else if (n - 1 < (1 << 20)) 5 else 6
    w(nib - 4, 2)                        // MNIBBLES code
    w(n - 1, nib * 4)                    // MLEN - 1
    w(0, 1); w(0, 1); w(0, 1)            // NBLTYPES L/I/D = 1
    w(0, 2); w(0, 4)                     // NPOSTFIX = 0, NDIRECT = 0
    w(0, 2)                              // literal context mode LSB6
    w(0, 1); w(0, 1)                     // NTREES_L = 1, NTREES_D = 1
    // literal tree: complex code, HSKIP=0. Code-length code = single symbol
    // "8" (ClOrder index 10 gets fixed-code value 1 = bits 1,1,1,0; the rest
    // length 0 = bits 0,0) -> every symbol-length read yields 8 consuming no
    // bits -> all 256 literals at length 8, exactly complete.
    w(0, 2)
    var i = 0
    while (i < 10) { w(0, 2); i += 1 }
    w(7, 4)
    i = 0
    while (i < 7) { w(0, 2); i += 1 }
    // command tree: single symbol with insert code `ic`, copy code 0
    val sym =
      if (ic < 8) 128 + (ic << 3)        // cell 2: ins 0..7
      else if (ic < 16) 256 + ((ic - 8) << 3)  // cell 4: ins 8..15
      else 448 + ((ic - 16) << 3)        // cell 7: ins 16..23
    w(1, 2); w(0, 2); w(sym, 10)
    // distance tree: single symbol, never read (MLEN reached after insert)
    w(1, 2); w(0, 2); w(16, 6)
    // body: command symbol costs 0 bits; insert extra bits; then literals.
    // Uniform canonical code: symbol s <-> code s, transmitted MSB-first.
    w(n - InsBase(ic), InsExtra(ic))
    i = 0
    while (i < n) {
      val b = raw(i) & 0xff
      w(Integer.reverse(b) >>> 24, 8)
      i += 1
    }
    if (nAcc > 0) bits.write(acc & 0xff)
    bits.toByteArray
  }

  // ---- the decoder ----

  /** Control signal for soft-cap mode: decode stops, prefix is returned. */
  private final class CapReached extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Decoder(in: Array[Byte], maxOutput: Int, capIsError: Boolean) {
    // hoisted once per stream: the lazy-val tuple accessor costs a volatile
    // read + deref per literal if used inline in context()
    private val (ctxU0, ctxU1, ctxS0, ctxS1, trPre, trTyp, trSuf) = aux

    private val inBits: Long = in.length.toLong * 8
    private var accum: Long = 0L
    private var nAccum: Int = 0
    private var bytePos: Int = 0
    private var consumed: Long = 0L

    private var out: Array[Byte] = new Array[Byte](math.min(math.max(1024, in.length * 4), 1 << 16))
    private var outLen: Int = 0

    private def fill(): Unit = {
      while (nAccum <= 56) {
        val b = if (bytePos < in.length) in(bytePos) & 0xff else 0
        accum |= b.toLong << nAccum
        nAccum += 8
        bytePos += 1
      }
    }

    private def consume(n: Int): Unit = {
      accum >>>= n; nAccum -= n; consumed += n
      if (consumed > inBits) throw new BrotliTruncated("truncated stream")
    }

    private def readBits(n: Int): Int = {
      if (n == 0) return 0
      fill()
      val v = (accum & ((1L << n) - 1)).toInt
      consume(n)
      v
    }

    private def align(): Unit = {
      val drop = (consumed & 7L).toInt
      if (drop != 0) consume(8 - drop) // padding bits accepted leniently
    }

    private def ensure(n: Int): Unit = {
      // hard cap in error mode; soft-cap mode grows past it (bounded by one
      // command's worst-case emit) and trims at the next checkCap()
      if (capIsError && outLen + n > maxOutput) fail(s"output exceeds cap $maxOutput")
      if (outLen + n > out.length) {
        var cap = out.length
        while (cap < outLen + n) cap = math.min(math.max(cap * 2, outLen + n), Int.MaxValue - 8)
        out = java.util.Arrays.copyOf(out, cap)
      }
    }

    private def emit(b: Int): Unit = { ensure(1); out(outLen) = b.toByte; outLen += 1 }

    private def checkCap(): Unit =
      if (!capIsError && outLen > maxOutput) throw new CapReached // exactly-at-cap completes uncapped

    // ---- canonical two-level Huffman tables: (bits << 16) | value entries ----

    private def buildTable(lens: Array[Int], alphabet: Int): Array[Int] = {
      val count = new Array[Int](16)
      var nonzero = 0; var single = 0
      var s = 0
      while (s < alphabet) {
        val l = lens(s)
        if (l != 0) { count(l) += 1; nonzero += 1; single = s }
        s += 1
      }
      if (nonzero == 0) fail("empty prefix code")
      if (nonzero == 1) {
        val t = new Array[Int](256)
        java.util.Arrays.fill(t, single) // bits 0
        return t
      }
      // completeness (brotli requires complete codes)
      var space = 1 << 15
      var l = 1
      while (l <= 15) { space -= count(l) << (15 - l); l += 1 }
      if (space != 0) fail("incomplete prefix code")
      val offsets = new Array[Int](16)
      var sum = 0
      l = 1
      while (l <= 15) { offsets(l) = sum; sum += count(l); l += 1 }
      val sorted = new Array[Int](nonzero)
      s = 0
      while (s < alphabet) {
        val ln = lens(s)
        if (ln != 0) { sorted(offsets(ln)) = s; offsets(ln) += 1 }
        s += 1
      }
      val table = new Array[Int](MaxTable((alphabet + 31) >> 5))
      val cnt = count.clone()
      var key = 0; var symbol = 0
      var step = 2
      var len = 1
      // root (codes of length <= 8), replicated at stride 1 << len
      while (len <= 8) {
        while (cnt(len) > 0) {
          val item = (len << 16) | sorted(symbol); symbol += 1
          var end = 256
          while (end > 0) { end -= step; table(key + end) = item }
          key = nextKey(key, len)
          cnt(len) -= 1
        }
        step <<= 1; len += 1
      }
      // second level
      var totalOff = 256
      var low = -1
      var curOff = 0
      var tableBits = 0
      step = 2
      len = 9
      while (len <= 15) {
        while (cnt(len) > 0) {
          if ((key & 255) != low) {
            low = key & 255
            tableBits = subTableBits(cnt, len)
            curOff = totalOff
            totalOff += 1 << tableBits
            if (totalOff > table.length) fail("table overflow")
            table(low) = ((tableBits + 8) << 16) | (curOff - low)
          }
          val item = ((len - 8) << 16) | sorted(symbol); symbol += 1
          var end = 1 << tableBits
          while (end > 0) { end -= step; table(curOff + (key >> 8) + end) = item }
          key = nextKey(key, len)
          cnt(len) -= 1
        }
        step <<= 1; len += 1
      }
      table
    }

    private def nextKey(key: Int, len: Int): Int = {
      var step = 1 << (len - 1)
      while ((key & step) != 0) step >>= 1
      (key & (step - 1)) + step
    }

    /** Bits needed by the subtable rooted at the current 8-bit prefix. */
    private def subTableBits(cnt: Array[Int], len0: Int): Int = {
      var left = 1 << (len0 - 8)
      var len = len0
      while (len < 15) {
        left -= cnt(len)
        if (left <= 0) return len - 8
        len += 1
        left <<= 1
      }
      7
    }

    private def readSym(table: Array[Int]): Int = {
      fill()
      val e = table((accum & 255L).toInt)
      val bits = e >>> 16
      if (bits <= 8) { consume(bits); e & 0xffff }
      else {
        val sub = (accum & 255L).toInt + (e & 0xffff)
        val e2 = table(sub + ((accum >>> 8) & ((1L << (bits - 8)) - 1)).toInt)
        consume(8 + (e2 >>> 16))
        e2 & 0xffff
      }
    }

    // ---- prefix-code reading (RFC 7932 section 3.4/3.5) ----

    private def readCode(alphabet: Int): Array[Int] = {
      val hskip = readBits(2)
      if (hskip == 1) {
        // simple code: 1-4 explicit symbols
        var maxBits = 0; var x = alphabet - 1
        while (x != 0) { x >>= 1; maxBits += 1 }
        val nsym = readBits(2) + 1
        val syms = new Array[Int](nsym)
        var i = 0
        while (i < nsym) {
          val v = readBits(maxBits)
          if (v >= alphabet) fail("symbol out of range")
          var j = 0
          while (j < i) { if (syms(j) == v) fail("duplicate symbol"); j += 1 }
          syms(i) = v; i += 1
        }
        val lens = new Array[Int](alphabet)
        nsym match {
          case 1 => lens(syms(0)) = 1 // trivial: buildTable single-symbol branch
          case 2 => lens(syms(0)) = 1; lens(syms(1)) = 1
          case 3 => lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 2
          case _ =>
            if (readBits(1) == 1) {
              lens(syms(0)) = 1; lens(syms(1)) = 2; lens(syms(2)) = 3; lens(syms(3)) = 3
            } else { var j = 0; while (j < 4) { lens(syms(j)) = 2; j += 1 } }
        }
        buildTable(lens, alphabet)
      } else {
        // complex code: code-length code first (fixed code, with skip)
        val clLens = new Array[Int](18)
        var space = 32; var numCodes = 0
        var i = hskip
        while (i < 18 && space > 0) {
          fill()
          val e = ClFixed((accum & 15L).toInt)
          consume(e >>> 16)
          val v = e & 0xffff
          clLens(ClOrder(i)) = v
          if (v != 0) { space -= 32 >> v; numCodes += 1 }
          i += 1
        }
        if (numCodes != 1 && space != 0) fail("invalid code length code")
        val clTable = buildTable(clLens, 18)
        // symbol lengths with 16/17 repeat codes
        val lens = new Array[Int](alphabet)
        var symbol = 0; var prevLen = 8; var repeat = 0; var repeatLen = 0
        var space2 = 1 << 15
        while (symbol < alphabet && space2 > 0) {
          val p = readSym(clTable)
          if (p < 16) {
            lens(symbol) = p; symbol += 1
            repeat = 0 // an explicit length breaks a 16/17 repeat chain
            if (p != 0) { prevLen = p; space2 -= (1 << 15) >> p }
          } else {
            val extra = p - 14
            val newLen = if (p == 16) prevLen else 0
            if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
            val old = repeat
            if (repeat > 0) { repeat -= 2; repeat <<= extra }
            repeat += readBits(extra) + 3
            val delta = repeat - old
            if (symbol + delta > alphabet) fail("repeat past alphabet")
            var j = 0
            while (j < delta) { lens(symbol) = repeatLen; symbol += 1; j += 1 }
            if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
          }
        }
        if (space2 != 0) {
          var nz = 0; var j = 0
          while (j < alphabet) { if (lens(j) != 0) nz += 1; j += 1 }
          if (nz != 1) fail("unused prefix code space")
        }
        buildTable(lens, alphabet)
      }
    }

    private def readVarLenTypes(): Int = {
      if (readBits(1) == 0) 1
      else {
        val n = readBits(3)
        if (n == 0) 2 else (1 << n) + 1 + readBits(n)
      }
    }

    private def readContextMap(size: Int, numTrees: Int): Array[Byte] = {
      val cm = new Array[Byte](size)
      val rleMax = if (readBits(1) == 1) readBits(4) + 1 else 0
      val table = readCode(numTrees + rleMax)
      var i = 0
      while (i < size) {
        val code = readSym(table)
        if (code == 0) { cm(i) = 0; i += 1 }
        else if (code <= rleMax) {
          var reps = (1 << code) + readBits(code)
          if (i + reps > size) fail("context map run overflow")
          while (reps > 0) { cm(i) = 0; i += 1; reps -= 1 }
        } else {
          val v = code - rleMax
          if (v >= numTrees) fail("context map value out of range")
          cm(i) = v.toByte; i += 1
        }
      }
      if (readBits(1) == 1) {
        // inverse move-to-front
        val mtf = new Array[Byte](256)
        var j = 0
        while (j < 256) { mtf(j) = j.toByte; j += 1 }
        i = 0
        while (i < size) {
          val idx = cm(i) & 0xff
          val v = mtf(idx)
          var k = idx
          while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
          mtf(0) = v
          cm(i) = v
          i += 1
        }
      }
      cm
    }

    // ---- literal context ----

    private def context(mode: Int, p1: Int, p2: Int): Int = mode match {
      case 0 => p1 & 0x3f
      case 1 => p1 >> 2
      case 2 => ctxU0(p1) | ctxU1(p2)
      case _ => ctxS0(p1) | ctxS1(p2)
    }

    // ---- dictionary transform ----

    private def emitTransformed(wordOff: Int, wordLen: Int, tId: Int): Int = {
      val before = outLen
      val p = trPre(tId); val s = trSuf(tId); val t = trTyp(tId)
      ensure(p.length + wordLen + s.length + 1)
      System.arraycopy(p, 0, out, outLen, p.length); outLen += p.length
      // word with omit applied
      var off = wordOff; var len = wordLen
      if (t >= 12) { val omit = math.min(t - 11, len); off += omit; len -= omit } // OmitFirstN
      else if (t >= 1 && t <= 9) len -= math.min(t, len)                          // OmitLastN
      val wordStart = outLen
      System.arraycopy(dict, off, out, outLen, len); outLen += len
      if (t == 10 || t == 11) { // ferment first / all
        var i = wordStart
        val end = outLen
        var once = t == 10
        var go = true
        while (i < end && go) {
          val c = out(i) & 0xff
          if (c < 0xc0) { if (c >= 97 && c <= 122) out(i) = (c ^ 32).toByte; i += 1 }
          else if (c < 0xe0) { if (i + 1 < end) out(i + 1) = (out(i + 1) ^ 32).toByte; i += 2 }
          else { if (i + 2 < end) out(i + 2) = (out(i + 2) ^ 5).toByte; i += 3 }
          if (once) go = false
        }
      }
      ensure(s.length)
      System.arraycopy(s, 0, out, outLen, s.length); outLen += s.length
      outLen - before
    }

    // ---- main loop ----

    // stream-scoped state shared across meta-blocks (RFC 7932 section 9.1):
    // distance ring buffer, context bytes, window size
    private val ring = Array(16, 15, 11, 4)
    private var ringIdx = 0
    private var p1 = 0
    private var p2 = 0
    private var winSize = 0

    def run(): (Array[Byte], Boolean) =
      try (runAll(), false)
      catch {
        case _: CapReached => (java.util.Arrays.copyOf(out, maxOutput), true)
        case t: BrotliTruncated =>
          // soft-cap mode keeps a truncated stream's decoded prefix (flagged)
          // when anything decoded; strict mode and zero-output streams throw
          if (!capIsError && outLen > 0)
            (java.util.Arrays.copyOf(out, math.min(outLen, maxOutput)), true)
          else throw t
      }

    private def runAll(): Array[Byte] = {
      // WBITS
      val wbits =
        if (readBits(1) == 0) 16
        else {
          val n = readBits(3)
          if (n != 0) 17 + n
          else {
            val m = readBits(3)
            if (m == 0) 17
            else if (m == 1) fail("reserved WBITS")
            else 8 + m
          }
        }
      winSize = (1 << wbits) - 16
      var isLast = false

      while (!isLast) {
        isLast = readBits(1) == 1
        if (isLast && readBits(1) == 1) {
          // ISLASTEMPTY
        } else {
          val nib = readBits(2) match { case 0 => 4; case 1 => 5; case 2 => 6; case _ => 0 }
          if (nib == 0) {
            // metadata block: skip
            if (readBits(1) != 0) fail("reserved metadata bit")
            val skipBytes = readBits(2)
            var skipLen = 0
            var i = 0
            while (i < skipBytes) {
              val b = readBits(8)
              if (b == 0 && i + 1 == skipBytes && skipBytes > 1) fail("zero high skip byte")
              skipLen |= b << (i * 8)
              i += 1
            }
            if (skipBytes > 0) skipLen += 1
            align()
            i = 0
            while (i < skipLen) { readBits(8); i += 1 }
          } else {
            var mlen = readBits(nib * 4)
            if (nib > 4 && (mlen >> ((nib - 1) * 4)) == 0) fail("zero high length nibble")
            mlen += 1
            val isUncompressed = !isLast && readBits(1) == 1
            if (isUncompressed) {
              align()
              ensure(mlen)
              var i = 0
              while (i < mlen) { out(outLen) = readBits(8).toByte; outLen += 1; i += 1 }
              if (outLen >= 2) { p1 = out(outLen - 1) & 0xff; p2 = out(outLen - 2) & 0xff }
              else if (outLen == 1) { p2 = p1; p1 = out(0) & 0xff }
              checkCap()
            } else {
              decodeCompressed(mlen)
            }
          }
        }
      }
      // end-of-stream parity with the reference decoder (measured over 1,200
      // mutated streams): the final byte's padding bits must be ZERO
      // (reference rejects — a flipped padding bit flags the body raw instead
      // of silently decoding a plausible prefix), while TRAILING bytes after
      // a complete stream are tolerated (reference exposes them as unused
      // data and succeeds).
      val pad = ((8 - (consumed & 7)) & 7).toInt
      if (pad > 0) {
        fill()
        if ((accum & ((1L << pad) - 1)) != 0) fail("nonzero padding bits")
      }
      java.util.Arrays.copyOf(out, outLen)
    }

    // scalastyle:off method.length
    private def decodeCompressed(mlenIn: Int): Unit = {
      var mlen = mlenIn

      // block types/counts per category: 0 literal, 1 command, 2 distance
      val nbl = new Array[Int](3)
      val btype = new Array[Int](3)
      val btypePrev = new Array[Int](3)
      val blen = new Array[Int](3)
      val typeTrees = new Array[Array[Int]](3)
      val countTrees = new Array[Array[Int]](3)
      var cat = 0
      while (cat < 3) {
        nbl(cat) = readVarLenTypes()
        btype(cat) = 0; btypePrev(cat) = 1
        if (nbl(cat) >= 2) {
          typeTrees(cat) = readCode(nbl(cat) + 2)
          countTrees(cat) = readCode(26)
          val sym = readSym(countTrees(cat))
          blen(cat) = BlkBase(sym) + readBits(BlkExtra(sym))
        } else blen(cat) = 1 << 28
        cat += 1
      }
      def switchBlock(c: Int): Unit = {
        // nbl(c)==1 categories have no type/count trees; their blen bookkeeping
        // is skipped below, so reaching here with a null tree is a decoder bug
        // or a crafted stream — fail the contract way, never NPE.
        if (typeTrees(c) == null) fail(s"block switch in single-type category $c")
        val sym = readSym(typeTrees(c))
        val nt =
          if (sym == 0) btypePrev(c)
          else if (sym == 1) (btype(c) + 1) % nbl(c)
          else sym - 2
        if (nt >= nbl(c)) fail(s"block type $nt of ${nbl(c)}")
        btypePrev(c) = btype(c); btype(c) = nt
        val cs = readSym(countTrees(c))
        blen(c) = BlkBase(cs) + readBits(BlkExtra(cs))
      }

      // Single-type categories (nbl==1) never block-switch — skip their blen
      // bookkeeping entirely. Without this, a crafted stream of empty-output
      // commands could walk blen down from 1<<28 to 0 (amplified CPU) and hit
      // switchBlock on a null tree — an NPE instead of the BrotliError the
      // decompress() contract promises.
      val multiL = nbl(0) >= 2; val multiC = nbl(1) >= 2; val multiD = nbl(2) >= 2

      val npostfix = readBits(2)
      val ndirect = readBits(4) << npostfix
      val ctxModes = new Array[Int](nbl(0))
      var i = 0
      while (i < nbl(0)) { ctxModes(i) = readBits(2); i += 1 }

      val ntreesL = readVarLenTypes()
      val cmapL: Array[Byte] =
        if (ntreesL >= 2) readContextMap(64 * nbl(0), ntreesL) else new Array[Byte](64 * nbl(0))
      val ntreesD = readVarLenTypes()
      val cmapD: Array[Byte] =
        if (ntreesD >= 2) readContextMap(4 * nbl(2), ntreesD) else new Array[Byte](4 * nbl(2))

      val litTrees = new Array[Array[Int]](ntreesL)
      i = 0; while (i < ntreesL) { litTrees(i) = readCode(256); i += 1 }
      val cmdTrees = new Array[Array[Int]](nbl(1))
      i = 0; while (i < nbl(1)) { cmdTrees(i) = readCode(704); i += 1 }
      val distAlphabet = 16 + ndirect + (48 << npostfix)
      val distTrees = new Array[Array[Int]](ntreesD)
      i = 0; while (i < ntreesD) { distTrees(i) = readCode(distAlphabet); i += 1 }

      // Stall guard: with single-symbol (zero-bit) trees a crafted stream can
      // form a command that consumes no bits AND emits no output (e.g. a
      // dictionary ref whose transform output is empty) — without progress
      // tracking that loops forever. Valid encoder output never stalls.
      var stall = 0
      while (mlen > 0) {
        val progress = consumed + outLen
        if (multiC) {
          if (blen(1) == 0) switchBlock(1)
          blen(1) -= 1
        }
        val cmd = readSym(cmdTrees(btype(1)))
        val cell = cmd >>> 6
        val implicitDist = cell <= 1
        val insCode = (if (implicitDist) 0 else CellInsBase(cell - 2)) + ((cmd >>> 3) & 7)
        val copCode = (if (implicitDist) (if (cell == 1) 8 else 0) else CellCopBase(cell - 2)) + (cmd & 7)
        var insLen = InsBase(insCode) + readBits(InsExtra(insCode))
        val copyLen = CopBase(copCode) + readBits(CopExtra(copCode))

        // literals
        while (insLen > 0) {
          if (mlen <= 0) fail("insert past meta-block")
          if (multiL) {
            if (blen(0) == 0) switchBlock(0)
            blen(0) -= 1
          }
          val ctx = context(ctxModes(btype(0)), p1, p2)
          val lit = readSym(litTrees(cmapL((btype(0) << 6) + ctx) & 0xff))
          emit(lit)
          p2 = p1; p1 = lit
          mlen -= 1
          insLen -= 1
        }
        checkCap()
        if (mlen > 0) {
          // distance (block switch + count only when a distance symbol is read;
          // implicit cell-0/1 commands touch neither — reference behavior)
          var distance = 0
          var pushable = false
          if (implicitDist) {
            distance = ring((ringIdx + 3) & 3)
          } else {
            if (multiD) {
              if (blen(2) == 0) switchBlock(2)
              blen(2) -= 1
            }
            val distCtx = math.min(copyLen - 2, 3)
            val dsym = readSym(distTrees(cmapD((btype(2) << 2) + distCtx) & 0xff))
            if (dsym < 16) {
              distance = ring((ringIdx + ShortIdx(dsym)) & 3) + ShortDelta(dsym)
              pushable = dsym != 0
            } else if (dsym < 16 + ndirect) {
              distance = dsym - 15
              pushable = true
            } else {
              val dcode = dsym - ndirect - 16
              val hcode = dcode >>> npostfix
              val lcode = dcode & ((1 << npostfix) - 1)
              val nbits = 1 + (hcode >>> 1)
              val offset = ((2 + (hcode & 1)) << nbits) - 4
              distance = ((offset + readBits(nbits)) << npostfix) + lcode + ndirect + 1
              pushable = true
            }
            if (distance <= 0) fail("non-positive distance")
          }
          val maxDist = math.min(outLen, winSize)
          if (distance > maxDist) {
            // static dictionary reference
            if (copyLen < 4 || copyLen > 24) fail(s"dictionary copy length $copyLen")
            val wordId = distance - maxDist - 1
            val shift = DictBits(copyLen)
            val wordIdx = wordId & ((1 << shift) - 1)
            val tId = wordId >>> shift
            if (tId >= 121) fail(s"transform id $tId")
            val emitted = emitTransformed(DictOffsets(copyLen) + copyLen * wordIdx, copyLen, tId)
            mlen -= emitted
            if (mlen < 0) fail("dictionary word past meta-block")
            if (outLen >= 2) { p1 = out(outLen - 1) & 0xff; p2 = out(outLen - 2) & 0xff }
          } else {
            if (pushable) { ring(ringIdx & 3) = distance; ringIdx += 1 }
            if (copyLen > mlen) fail("copy past meta-block")
            ensure(copyLen)
            if (distance >= copyLen) {
              System.arraycopy(out, outLen - distance, out, outLen, copyLen)
              outLen += copyLen
            } else {
              var j = 0
              while (j < copyLen) { out(outLen) = out(outLen - distance); outLen += 1; j += 1 }
            }
            mlen -= copyLen
            p1 = out(outLen - 1) & 0xff; p2 = out(outLen - 2) & 0xff
          }
          checkCap()
        }
        if (consumed + outLen == progress) {
          stall += 1
          if (stall > 256) fail("stalled stream (no bits consumed, no output)")
        } else stall = 0
      }
    }
    // scalastyle:on method.length
  }
}
