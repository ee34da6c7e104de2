package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashed bag-of-words document embedding kernel (the "hashing trick",
  * Weinberger et al. 2009): every MATCHING-tokenizer token
  * ([[SegmentKernel.tokenBounds]] — whitespace words outside the no-space scripts,
  * overlapping character bigrams inside them, so CJK documents embed from their
  * bigram bag rather than one giant pseudo-token) hashes to a dimension and a ±1
  * sign, accumulated and L2-normalized — a deterministic, model-free dense vector
  * whose cosine approximates token-multiset overlap. This is the bridge from the
  * text corpus into every embedding operator (ANN top-k, hyperplane/IVF blocking,
  * SemDeDup, int8 quantization) when no learned encoder is available: signatures
  * at 100 TB with zero model-serving infrastructure.
  *
  * NOT a semantic embedding — two paraphrases sharing no tokens score ~0. It is the
  * bag-of-words baseline the learned-encoder column upgrades, with identical
  * downstream plumbing.
  *
  * One byte-walk per document: tokens are hashed in place from the UTF-8 buffer
  * (Murmur3 via Spark's hashUnsafeBytes — no substring allocation), so the cost is
  * O(bytes + dim) per row. Dimension index and sign come from independent seeds.
  *
  * TOKENIZER-VERSION CAVEAT (same class as the contamination-bloom one in
  * Dedup.distinctGramHashes): vectors are bit-identical to previous versions for
  * text without the segmented scripts, but PERSISTED artifacts derived from
  * hashed embeddings of CJK/Thai/… text — stored ANN/SemDeDup signature columns,
  * quality-classifier models fitted on embedding features — must be regenerated
  * before comparing against freshly embedded text (pre-segmentation those docs
  * embedded from one giant pseudo-token, a near-useless signature).
  */
object HashedEmbeddingKernel {

  def embed(s: UTF8String, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val acc = new Array[Float](dim)
    // Shared MATCHING tokenizer — the "pure function of the token multiset"
    // guarantee (hashed_embedding_documents' oracle invariant) groups by tokens(),
    // so the embedding MUST consume the same token stream.
    val (bounds, n) = SegmentKernel.tokenBounds(bytes, bytes.length)
    val any = n > 0
    var t = 0
    while (t < n) {
      val ts = bounds(t * 2)
      val len = bounds(t * 2 + 1) - ts
      val h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + ts, len, 42)
      val h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + ts, len, 7919)
      val idx = Math.floorMod(h1, dim)
      acc(idx) += (if ((h2 & 1) == 0) 1.0f else -1.0f)
      t += 1
    }
    if (!any)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(acc) // zero vector: no tokens
    var ss = 0.0
    var d = 0
    while (d < dim) { ss += acc(d).toDouble * acc(d).toDouble; d += 1 }
    // Signs can cancel exactly (e.g. two tokens sharing a bucket with opposite
    // signs) — an all-zero accumulation stays zero rather than dividing by 0.
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      d = 0
      while (d < dim) { acc(d) *= inv; d += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(acc)
  }
}

/** Deflate compression-ratio kernel — the classic "repetitive text compresses
  * too well" quality signal (CCNet / RedPajama-style filters drop documents whose
  * ratio is far from natural prose on either side: boilerplate/template spam
  * compresses hard, random noise not at all). `ratio = deflate(bytes) / bytes`
  * as RAW deflate (nowrap — no zlib header/checksum framing, so ratios run a few
  * bytes lower than framed zlib output) at level 6 — LOWER means more
  * repetitive. Deterministic for a given JDK
  * (the bundled zlib); there is no SQL-engine oracle for deflate, so this surface
  * is spec-gated and its corpus query is rows-only-checked by design.
  */
object CompressionKernel {
  // One native zlib state per task thread, reset() between rows — allocating and
  // freeing a Deflater per row would dominate short documents with native
  // malloc/free churn. Never end()ed: the ThreadLocal lives for the executor
  // thread's lifetime and the finalizer reclaims native state on thread death.
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, /*nowrap=*/ true))
  private val buffers = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0 // no content: incompressible by convention
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = buffers.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** Codegen'd `deflate_ratio(text)` → double (NULL in ⇒ NULL out). */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionKernel.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionKernel.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Int8-quantization fidelity kernel: one fused loop over the float vector
  * computing max |x|, the guards, and the reconstruction stats the Column
  * formulation needed three interpreted higher-order-function passes for
  * (`zip_with`/`aggregate` are CodegenFallback — measured 4.3 s for the fidelity
  * query at sf0.1, the slowest projection in the bench; this kernel removes it).
  * Rounding replicates Spark's `round()` exactly (BigDecimal.valueOf HALF_UP on
  * the shortest decimal representation — `floor(x+0.5)` diverges on values like
  * 0.49999999999999994, and the DuckDB oracle compares against Spark's choice).
  */
object QuantKernel {

  private def roundHalfUp(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (q_scale, max_abs_err, cos_fidelity) or null when unquantizable (null
    * element, NaN/Inf element, zero norm) — mirrors quantPrep's `ok` guard.
    * `isDouble` dispatches the element read: the verifier accepts BOTH
    * array<float> and array<double>, like the compressor's elementwise cast does
    * (the two must never disagree on accepted inputs).
    */
  def fidelity(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      isDouble: Boolean): InternalRow = {
    val n = arr.numElements()
    def elem(i: Int): Double =
      if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = elem(i)
      if (java.lang.Double.isNaN(v)) return null
      val a = Math.abs(v)
      if (a > ma) ma = a
      i += 1
    }
    if (ma == 0.0 || java.lang.Double.isInfinite(ma)) return null
    val scale = ma / 127.0
    var maxErr = 0.0
    var dotXD = 0.0
    var dotXX = 0.0
    var dotDD = 0.0
    i = 0
    while (i < n) {
      val x = elem(i)
      val d = roundHalfUp(x / scale) * scale
      val e = Math.abs(x - d)
      if (e > maxErr) maxErr = e
      dotXD += x * d
      dotXX += x * x
      dotDD += d * d
      i += 1
    }
    val fid = dotXD / (Math.sqrt(dotXX) * Math.sqrt(dotDD))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, maxErr, fid))
  }
}

/** Codegen'd `quant_fidelity(vec)` → struct(q_scale, max_abs_err, cos_fidelity),
  * NULL for unquantizable vectors.
  */
case class QuantFidelity(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got $other")
  }
  private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  override val dataType: DataType = StructType(Seq(
    StructField("q_scale", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("cos_fidelity", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "quant_fidelity"

  override def nullSafeEval(input: Any): Any =
    QuantKernel.fidelity(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.QuantKernel.fidelity($c, $isDouble);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): QuantFidelity =
    copy(child = newChild)
}

/** Codegen'd `hashed_embedding(text)` → ARRAY<FLOAT> of length `dim`, unit-norm
  * (zero vector for tokenless text — downstream zero-norm guards already exclude
  * those from cosine ranking).
  */
case class HashedEmbedding(child: Expression, dim: Int) extends UnaryExpression {
  require(dim > 0, s"embedding dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override val dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hashed_embedding"

  override def nullSafeEval(input: Any): Any =
    HashedEmbeddingKernel.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedEmbeddingKernel.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedEmbedding =
    copy(child = newChild)
}

object HashedEmbedding {
  /** Column surface; default 128 dims — enough buckets that a quality-filter-size
    * vocabulary rarely cancels, small enough to broadcast probes freely.
    */
  def apply(c: Column, dim: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HashedEmbedding(org.apache.spark.sql.GraftSqlBridge.expression(c), dim))
}
