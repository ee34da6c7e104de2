package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle HASHING — one byte-walk per document, replacing the interpreted
  * `xxhash64(concat_ws(" ", slice(tokens(c), i+1, k)))` composition that dominated the
  * contamination and duplicate-span benchmarks (higher-order Columns like `transform`/
  * `slice` are CodegenFallback: per gram they materialize a token-array slice and a
  * joined string, all interpreted — the same pathology the quantization kernel fixed,
  * measured 14x there).
  *
  * BIT-FOR-BIT CONTRACT (stored-firewall guarantee — blooms persisted by past versions
  * must keep matching): the hash of every emitted gram equals Spark's
  * `xxhash64(gram)` (XXH64, seed 42, over the gram's UTF-8 bytes) where gram is the
  * single-space join of k consecutive [[TextFunctions.tokens]] tokens. Tokenization is
  * the shared MATCHING tokenizer ([[SegmentKernel.tokenBounds]]): ASCII `\s+` words
  * outside the no-space scripts, overlapping character bigrams inside them — on text
  * without those scripts (every corpus the old `\s+`-only kernel ever hashed) the
  * token stream, and therefore every stored bloom bit, is unchanged. PipelineOpsSpec
  * golden-pins the value and PropertySpec pins kernel == Column formulation on
  * hostile inputs.
  *
  * Fast path: when a gram's k tokens are separated by exactly one 0x20 in the source,
  * its joined bytes are a CONTIGUOUS source slice — hashed in place, zero copies.
  * Grams spanning multi-char/non-space whitespace — and all bigram-token grams, whose
  * bounds overlap — are assembled into a scratch buffer.
  */
object WordGramKernel {

  private val Seed = 42L // Spark's xxhash64 Column seed — part of the stored contract

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, until - from, Seed)

  /** Hash of tokens [t, t+k) joined by single spaces. Contiguous-slice fast path when
    * every separator inside the window is exactly one 0x20.
    */
  private def gramHash(bytes: Array[Byte], bounds: Array[Int], t: Int, k: Int,
      scratch: Array[Byte]): Long = {
    var contiguous = true
    var j = t
    while (contiguous && j < t + k - 1) {
      contiguous = bounds(j * 2 + 1) + 1 == bounds((j + 1) * 2) &&
        bytes(bounds(j * 2 + 1)) == 0x20
      j += 1
    }
    if (contiguous) return hashRange(bytes, bounds(t * 2), bounds((t + k - 1) * 2 + 1))
    var len = 0
    j = t
    while (j < t + k) {
      if (j > t) { scratch(len) = 0x20; len += 1 }
      val s = bounds(j * 2); val e = bounds(j * 2 + 1)
      System.arraycopy(bytes, s, scratch, len, e - s)
      len += e - s
      j += 1
    }
    XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, Seed)
  }

  /** Kernel entry. `distinct=true` mirrors `xxhash64` over [[TextFunctions.wordShingles]]
    * exactly: distinct grams in first-occurrence order, and the shorter-than-k
    * whole-doc fallback (n < k ⇒ one gram of all tokens, INCLUDING the "" pseudo-gram
    * at n == 0 — callers keep their `size(tokens) > 0` guards, same as before).
    * `distinct=false` mirrors `transform(sequence(0, n-k), i -> xxhash64(join))`:
    * every position 0..n-k in order, nothing below n == k.
    *
    * Distinctness is BY HASH rather than by gram string: two distinct grams colliding
    * in 64 bits would merge — P ≈ G²/2⁶⁵, the same collision budget every hash-keyed
    * stage of the dedup family already accepts (and downstream `.distinct()` on the
    * hash collapsed such pairs before this kernel existed).
    */
  def gramHashes(s: UTF8String, k: Int, distinct: Boolean, segment: Boolean): ArrayData = {
    val bytes = s.getBytes // materializes only if the UTF8String is offheap/sliced
    val (bounds, n) =
      if (segment) SegmentKernel.tokenBounds(bytes, bytes.length)
      else SegmentKernel.wsTokenBounds(bytes, bytes.length)
    // Scratch holds one assembled gram: ≤ all token bytes + n−1 separators. Token
    // bounds may OVERLAP (SEG bigrams), so token bytes can exceed the doc length —
    // size from the bounds, not from bytes.length.
    def scratchSize: Int = {
      var sum = 0
      var t = 0
      while (t < n) { sum += bounds(t * 2 + 1) - bounds(t * 2); t += 1 }
      sum + n
    }
    if (distinct && n < k) {
      // whole-doc fallback gram: all tokens joined (n == 0 ⇒ the "" pseudo-gram)
      val scratch = new Array[Byte](scratchSize)
      val h =
        if (n == 0) hashRange(Array.emptyByteArray, 0, 0)
        else gramHash(bytes, bounds, 0, n, scratch)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(h))
    }
    if (n < k) return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)
    val nGrams = n - k + 1
    val scratch = new Array[Byte](scratchSize)
    val out = new Array[Long](nGrams)
    if (!distinct) {
      var t = 0
      while (t < nGrams) { out(t) = gramHash(bytes, bounds, t, k, scratch); t += 1 }
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
    val seen = new java.util.HashSet[java.lang.Long](nGrams * 2)
    var m = 0
    var t = 0
    while (t < nGrams) {
      val h = gramHash(bytes, bounds, t, k, scratch)
      if (seen.add(h)) { out(m) = h; m += 1 }
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (m == nGrams) out else java.util.Arrays.copyOf(out, m))
  }
}

/** `xxhash64` of each word k-gram as a codegen'd unary expression. NULL in ⇒ NULL out
  * (matching `wordShingles`' `when(c.isNotNull, ...)` wrapper). `segment` selects
  * the MATCHING tokenizer (default — shingle/bloom consumers) vs the SPLITTING
  * whitespace tokenizer (the span family, whose gram POSITIONS must index disjoint
  * source tokens it can cut and rejoin).
  */
case class WordGramHashes(child: Expression, k: Int, distinct: Boolean,
    segment: Boolean = true)
    extends UnaryExpression {
  require(k > 0, s"shingle size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (distinct) "word_shingle_hashes" else "word_gram_hashes"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WordGramKernel.gramHashes(v.asInstanceOf[UTF8String], k, distinct, segment)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramKernel.gramHashes($c, $k, $distinct, $segment);")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}
