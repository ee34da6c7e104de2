package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the "split every document into ≤N-token
  * training windows with K tokens of overlap" step between cleaning and shard
  * packing in a pretraining pipeline.
  *
  * Entirely row-local: one `transform(sequence(...))` + `posexplode` projection, no
  * UDFs, no shuffle — input partitioning is preserved and a 100 TB corpus chunks at
  * scan speed. (The output is larger than the input by ~chunk/(chunk-overlap); the
  * overlap fraction is the only write amplification.)
  */
object Chunking {

  /** One row per (doc, window): `idCol`, `chunk_id` (0-based), `chunk_text` (window
    * tokens joined by single spaces — whitespace runs are canonicalized by
    * construction), `chunk_tokens` (window size; only the last window of a doc may be
    * short).
    *
    * Windows start every `chunkTokens - overlapTokens` tokens; the number of windows
    * is `ceil(max(n - overlap, 1) / stride)` so every token is covered, a doc with
    * 1..chunk tokens yields exactly one window, and zero-token docs (empty,
    * whitespace-only, NULL text) yield NO rows — they have nothing to train on.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens (chunk $chunkTokens)")
    require(!df.columns.contains("_ck_t"),
      "chunkByTokens uses an internal _ck_t column; input already has one — rename it")
    val stride = chunkTokens - overlapTokens
    // Tokenize ONCE into a projected attribute: expressions embedded in a
    // higher-order-function lambda body are outside common-subexpression
    // elimination, so referencing tokens()/size() directly inside the transform
    // would re-run the split per window reference (~2× per window per doc).
    val t: Column = col("_ck_t")
    val n: Column = size(t)
    // Ceil((max(n-overlap,1)) / stride). Int-ranged operands make the double division
    // exact (< 2^53), and cast-to-int truncation == floor on positives — the count is
    // bit-stable across engines at any document length.
    val numChunks: Column =
      (greatest(n - overlapTokens, lit(1)) + (stride - 1)).divide(stride).cast("int")
    // chunk_tokens comes from window arithmetic (least(chunk, n - start)), not a
    // re-tokenization of the joined chunk text — same value, one split pass instead
    // of two.
    df
      // SPLITTING tokenizer: chunk_text is rebuilt by joining window tokens, so
      // token bounds must be disjoint source spans (the MATCHING tokenizer's CJK
      // bigrams overlap — rejoining them would duplicate characters). A no-space
      // CJK document is one whitespace token, hence one chunk; char-budget
      // chunking for those scripts is a documented non-goal of this operator.
      .withColumn("_ck_t", TextFunctions.whitespaceTokens(col(textCol)))
      .filter(n > 0)
      .select(
        col(idCol),
        posexplode(transform(sequence(lit(0), numChunks - 1), k => struct(
          array_join(slice(t, k * stride + 1, lit(chunkTokens)), " ").as("chunk_text"),
          least(lit(chunkTokens), n - k * stride).as("chunk_tokens")))))
      .select(
        col(idCol),
        col("pos").as("chunk_id"),
        col("col.chunk_text").as("chunk_text"),
        col("col.chunk_tokens").as("chunk_tokens"))
  }
}
