package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata structs, processed per-partition in batches.
  *
  * The Spark-side machinery (schemas, partitioning, batch iteration, deterministic
  * output shape) is real and tested; the codec calls themselves are STUBBED with
  * deterministic byte-derived fakes — this container has no image/audio libraries.
  * Swap [[MediaCodecs]] for real decoders (e.g. javax.imageio / ffmpeg bindings) in a
  * production image; nothing else changes.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  /** STUB decoder surface — deterministic fakes derived from the bytes so tests and
    * downstream plumbing are stable. Replace with real codecs in production.
    */
  object MediaCodecs {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes == null || bytes.isEmpty) "empty"
      else if (bytes.length > 3 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else if (bytes.length > 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length > 3 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "wav"
      else "bin"

    /** ??? in spirit: width/height/duration cannot be decoded without codecs; derive
      * deterministic stand-ins from a byte hash so the pipeline shape is testable.
      */
    def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Long, Long) = {
      if (bytes == null) return ("null", 0, 0, 0L, 0L)
      val h = java.util.Arrays.hashCode(bytes)
      (sniffFormat(bytes), 64 + (math.abs(h) % 1024), 64 + (math.abs(h >> 8) % 1024),
        (math.abs(h >> 4) % 600000).toLong, bytes.length.toLong)
    }

    /** Stub feature extractor: deterministic pseudo-embedding from byte content.
      * Null/empty payloads yield NULL, not a zero vector: a zero vector is a "valid"
      * embedding whose cosine is NaN, which would rank broken media ABOVE every real
      * neighbor in a descending top-k; null propagates and drops out instead.
      */
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null || bytes.isEmpty) return null
      val out = new Array[Float](dim)
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes))
      var i = 0
      while (i < dim) { out(i) = rnd.nextGaussian().toFloat; i += 1 }
      out
    }

    /** Stub resize: a real implementation decodes, scales to (w, h), re-encodes. The
      * stand-in is deterministic in (bytes, w, h) and size-plausible (scales the payload
      * by the pixel ratio against the stub-decoded dimensions) so downstream size
      * accounting is exercised for real.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
      val (_, w0, h0, _, _) = decodeMeta(bytes)
      val ratio = (w.toDouble * h) / math.max(w0.toDouble * h0, 1.0)
      // Bound the per-row allocation: an aggressive upscale ratio against a tiny
      // stub-decoded source would otherwise request gigabytes inside the executor UDF.
      val MaxOut = 16 * 1024 * 1024
      val outLen = math.min(math.max((bytes.length * ratio).toInt, 16), MaxOut)
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = bytes(((i.toLong * bytes.length) / outLen).toInt); i += 1 }
      out
    }

    /** Stub frame sampler: every-nth 4KiB slice stands in for decoded video frames. */
    def sampleFrames(bytes: Array[Byte], everyNth: Int, maxFrames: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) return Nil
      val frameSize = 4096
      val nFrames = math.max(bytes.length / frameSize, 1)
      (0 until nFrames by math.max(everyNth, 1)).take(maxFrames).map { f =>
        java.util.Arrays.copyOfRange(bytes, f * frameSize, math.min((f + 1) * frameSize, bytes.length))
      }
    }
  }

  /** Attach a typed metadata struct decoded from the binary column. One projection;
    * binary payloads never shuffle.
    */
  def withMediaMeta(df: DataFrame, binCol: String, out: String = "media_meta"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => MediaCodecs.decodeMeta(bytes))
    df.withColumn(out, u(col(binCol)).cast(MediaMetaType))
  }

  /** Attach a stubbed feature embedding (`Array[Float]` of `dim`). */
  def withFeatures(df: DataFrame, binCol: String, dim: Int, out: String = "features"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => MediaCodecs.extractFeatures(bytes, dim))
    df.withColumn(out, u(col(binCol)))
  }

  /** Attach a resized copy of the binary payload (stub codec; see [[MediaCodecs.resize]]).
    * Row-local projection — at scale, resizing runs where the bytes already live.
    */
  def withResized(df: DataFrame, binCol: String, w: Int, h: Int,
      out: String = "resized"): DataFrame = {
    val u = udf((bytes: Array[Byte]) => MediaCodecs.resize(bytes, w, h))
    df.withColumn(out, u(col(binCol)))
  }

  /** Explode sampled frames: one output row per frame with its index. Partitioning note:
    * frames stay on their source partition (no shuffle) — the explode multiplies rows
    * locally; cap with maxFrames to bound memory per row.
    */
  def explodeFrames(df: DataFrame, binCol: String, everyNth: Int = 10, maxFrames: Int = 16): DataFrame = {
    val u = udf((bytes: Array[Byte]) => MediaCodecs.sampleFrames(bytes, everyNth, maxFrames))
    // posexplode_OUTER: rows whose payload yields no frames (null/empty media) keep one
    // output row with null frame columns — a plain posexplode would silently drop them
    // and break count reconciliation in corpus-health audits.
    df.withColumn("_frames", u(col(binCol)))
      .select(col("*"), posexplode_outer(col("_frames")).as(Seq("frame_idx", "frame_bytes")))
      .drop("_frames")
  }

  /** Batched per-partition processing surface: the Scala analog of mapInPandas —
    * callers get an iterator of rows per partition and return transformed rows, with
    * explicit output schema. Used for codec work that benefits from batch reuse
    * (shared decoder instances per partition).
    */
  def mapPartitionsWithSchema(df: DataFrame, outSchema: StructType)(
      f: Iterator[Row] => Iterator[Row]): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions(f)(enc)
  }

  /** Media-size/format stats for a binary column — a typical corpus health check. */
  def mediaStats(df: DataFrame, binCol: String): DataFrame =
    withMediaMeta(df, binCol)
      .groupBy(col("media_meta.format").as("format"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("media_meta.size_bytes")).as("total_bytes"),
        round(avg(col("media_meta.width")), 2).as("avg_width"))
      .orderBy(col("format"))
}
