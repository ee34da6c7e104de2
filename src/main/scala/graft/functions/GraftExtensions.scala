package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-facing registration of graft's native Catalyst expressions, so `spark.sql(...)`
  * users get the same codegen'd kernels as the `Column` API.
  *
  * Two entry points, same function set:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) — the library-integration path,
  *    applied at session construction.
  *  - [[GraftFunctions.register]] — imperative registration on an existing session.
  *
  * Functions:
  *  - `graft_cosine(array<float>, array<float>)` → double — pairwise cosine.
  *  - `graft_cosine_to_probe(array<float>, array(<double literals>))` → double — cosine
  *    against a constant probe vector; the probe argument must be foldable (it is baked
  *    into the generated code as a `double[]` reference).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "math_funcs", "4.0.0", "", "scala_udf")

  private def buildCosine(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => CosineSim(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_cosine expects 2 arguments, got ${other.length}")
  }

  private def buildJaccardSorted(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => JaccardSorted(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_jaccard_sorted expects 2 arguments, got ${other.length}")
  }

  private def buildCosineToProbe(args: Seq[Expression]): Expression = args match {
    case Seq(vec, probeExpr) if probeExpr.foldable =>
      val probe = probeExpr.eval() match {
        case arr: ArrayData if probeExpr.dataType.isInstanceOf[ArrayType] =>
          val cast = org.apache.spark.sql.catalyst.expressions.Cast(
            Literal.create(arr, probeExpr.dataType), ArrayType(DoubleType))
          val data = cast.eval().asInstanceOf[ArrayData]
          // Reject null elements: toDoubleArray would unbox them to 0.0 and the
          // similarity would be computed against a silently different vector.
          (0 until data.numElements()).foreach(i => require(!data.isNullAt(i),
            s"graft_cosine_to_probe probe contains a NULL element at index $i"))
          data.toDoubleArray().toIndexedSeq
        case other => throw new IllegalArgumentException(
          s"graft_cosine_to_probe probe must be an array literal, got $other")
      }
      CosineToProbe(vec, probe)
    case Seq(_, probeExpr) => throw new IllegalArgumentException(
      "graft_cosine_to_probe probe argument must be foldable (a constant array)")
    case other => throw new IllegalArgumentException(
      s"graft_cosine_to_probe expects 2 arguments, got ${other.length}")
  }

  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Lift a `Column`-composing function into a `FunctionRegistry` builder: SQL argument
    * expressions become Columns, the library function composes them, and the resulting
    * Column's expression tree is handed back to the analyzer. The SQL surface therefore
    * compiles to the IDENTICAL (codegen'd) plan as the Column API — no wrapper UDF.
    */
  private def fromColumns(name: String, arity: Int,
      f: Seq[Column] => Column): FunctionRegistry.FunctionBuilder =
    (args: Seq[Expression]) => {
      if (args.length != arity) throw new IllegalArgumentException(
        s"$name expects $arity argument(s), got ${args.length}")
      GraftSqlBridge.expressionEager(f(args.map(GraftSqlBridge.column)))
    }

  /** Evaluate a foldable integer argument at resolution time (for kernel parameters
    * like shingle size that are baked into the generated code).
    */
  private def foldableInt(name: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: $arg must be a constant integer")
    e.eval() match {
      // Integral values only — intValue() on a 3.7D literal would silently truncate
      // to a kernel parameter the user didn't write.
      case n: Number if n.doubleValue() == n.intValue().toDouble => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be a constant integer, got $other")
    }
  }

  private val textFns: Seq[(String, String, FunctionRegistry.FunctionBuilder)] = {
    import graft.functions.{TextFunctions => T}
    Seq(
      ("graft_tokens", "graft_tokens(text) - matching-tokenizer tokens (whitespace words; CJK char bigrams)",
        fromColumns("graft_tokens", 1, cs => T.tokens(cs.head))),
      ("graft_token_count", "graft_token_count(text) - matching-tokenizer token count",
        fromColumns("graft_token_count", 1, cs => T.tokenCount(cs.head))),
      ("graft_bpeish_token_count",
        "graft_bpeish_token_count(text) - GPT-2-style pre-tokenizer run count",
        fromColumns("graft_bpeish_token_count", 1, cs => T.bpeishTokenCount(cs.head))),
      ("graft_quality_score",
        "graft_quality_score(text) - composite [0,1] pretraining-quality heuristic",
        fromColumns("graft_quality_score", 1, cs => T.qualityScore(cs.head))),
      ("graft_lang_id",
        "graft_lang_id(text) - marker-word/CJK language tag (en/de/fr/es/zh/und)",
        fromColumns("graft_lang_id", 1, cs => T.langId(cs.head))),
      ("graft_fingerprint",
        "graft_fingerprint(text) - 64-bit whitespace-normalized content fingerprint",
        fromColumns("graft_fingerprint", 1, cs => T.fingerprint(cs.head))),
      ("graft_simhash",
        "graft_simhash(text) - 64-bit SimHash over matching-tokenizer tokens",
        fromColumns("graft_simhash", 1,
          cs => graft.operators.Dedup.simhash64(T.tokens(cs.head)))),
      ("graft_dup_line_fraction",
        "graft_dup_line_fraction(text) - duplicate-line fraction over trimmed non-empty lines",
        fromColumns("graft_dup_line_fraction", 1, cs => T.dupLineFraction(cs.head))),
      ("graft_nfc",
        "graft_nfc(text) - Unicode NFC canonicalization (UAX #15)",
        fromColumns("graft_nfc", 1, cs => T.nfcNormalize(cs.head))),
      ("graft_nfkc",
        "graft_nfkc(text) - Unicode NFKC compatibility fold (UAX #15)",
        fromColumns("graft_nfkc", 1, cs => T.nfkcNormalize(cs.head))),
      ("graft_deflate_ratio",
        "graft_deflate_ratio(text) - raw-deflate-level-6 compressed/raw byte ratio (lower = more repetitive)",
        fromColumns("graft_deflate_ratio", 1, cs => T.deflateRatio(cs.head))))
  }

  private def buildDupNgramFraction(args: Seq[Expression]): Expression = args match {
    case Seq(text, n) =>
      GraftSqlBridge.expressionEager(TextFunctions.dupNgramFraction(
        GraftSqlBridge.column(text), foldableInt("graft_dup_ngram_fraction", "n", n)))
    case other => throw new IllegalArgumentException(
      s"graft_dup_ngram_fraction expects (text, n), got ${other.length} argument(s)")
  }

  private def buildDupWordNgramFraction(args: Seq[Expression]): Expression = args match {
    case Seq(text, k) =>
      GraftSqlBridge.expressionEager(TextFunctions.dupWordNgramFraction(
        GraftSqlBridge.column(text), foldableInt("graft_dup_word_ngram_fraction", "k", k)))
    case other => throw new IllegalArgumentException(
      s"graft_dup_word_ngram_fraction expects (text, k), got ${other.length} argument(s)")
  }

  private def buildMinhash(args: Seq[Expression]): Expression = args match {
    case Seq(text, shingle, hashes) =>
      val n = foldableInt("graft_minhash", "shingleSize", shingle)
      val k = foldableInt("graft_minhash", "numHashes", hashes)
      GraftSqlBridge.expressionEager(
        graft.operators.Dedup.minhashSignature(GraftSqlBridge.column(text), n, k))
    case other => throw new IllegalArgumentException(
      s"graft_minhash expects (text, shingleSize, numHashes), got ${other.length} argument(s)")
  }

  private def buildUrlParts(args: Seq[Expression]): Expression = args match {
    case Seq(url) => UrlParts(url, WebFunctions.DefaultSuffixLabels)
    case other => throw new IllegalArgumentException(
      s"graft_url_parts expects (url), got ${other.length} argument(s)")
  }

  private def buildHashedEmbedding(args: Seq[Expression]): Expression = args match {
    case Seq(text, dim) =>
      HashedEmbedding(text, foldableInt("graft_hashed_embedding", "dim", dim))
    case other => throw new IllegalArgumentException(
      s"graft_hashed_embedding expects (text, dim), got ${other.length} argument(s)")
  }

  private def buildThetaSketch(args: Seq[Expression]): Expression = args match {
    case Seq(v) => ThetaSketchAgg(v).toAggregateExpression()
    case Seq(v, lgK) =>
      ThetaSketchAgg(v, foldableInt("graft_theta_sketch", "lgK", lgK)).toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_theta_sketch expects (value[, lgK]), got ${other.length} argument(s)")
  }

  private def buildThetaSet(op: String)(args: Seq[Expression]): Expression = args match {
    case Seq(a) if op == "estimate" => ThetaEstimate(a)
    case Seq(a, b) if op != "estimate" => ThetaSetEstimate(a, b, op)
    case other => throw new IllegalArgumentException(
      s"graft_theta_$op: wrong argument count ${other.length}")
  }

  /** (identifier, info, builder) triples in the exact shape
    * `SparkSessionExtensions.injectFunction` and `FunctionRegistry.registerFunction`
    * consume.
    */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] =
    Seq(
      (FunctionIdentifier("graft_cosine"),
        info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors"),
        buildCosine _),
      (FunctionIdentifier("graft_cosine_to_probe"),
        info("graft_cosine_to_probe",
          "graft_cosine_to_probe(vec, probe) - cosine of vec against a constant probe vector"),
        buildCosineToProbe _),
      (FunctionIdentifier("graft_jaccard_sorted"),
        info("graft_jaccard_sorted",
          "graft_jaccard_sorted(a, b) - Jaccard of two sorted distinct bigint arrays"),
        buildJaccardSorted _),
      (FunctionIdentifier("graft_minhash"),
        info("graft_minhash",
          "graft_minhash(text, shingleSize, numHashes) - MinHash signature of the char-shingle set"),
        buildMinhash _),
      (FunctionIdentifier("graft_dup_ngram_fraction"),
        info("graft_dup_ngram_fraction",
          "graft_dup_ngram_fraction(text, n) - duplicate char-n-gram fraction (1 - distinct/total)"),
        buildDupNgramFraction _),
      (FunctionIdentifier("graft_dup_word_ngram_fraction"),
        info("graft_dup_word_ngram_fraction",
          "graft_dup_word_ngram_fraction(text, k) - duplicate word-k-gram fraction (1 - distinct/total)"),
        buildDupWordNgramFraction _),
      (FunctionIdentifier("graft_url_parts"),
        info("graft_url_parts",
          "graft_url_parts(url) - struct(norm, host, domain): canonical URL, host, registered domain"),
        buildUrlParts _),
      (FunctionIdentifier("graft_hashed_embedding"),
        info("graft_hashed_embedding",
          "graft_hashed_embedding(text, dim) - unit-norm feature-hashed bag-of-words vector"),
        buildHashedEmbedding _),
      (FunctionIdentifier("graft_theta_sketch"),
        info("graft_theta_sketch",
          "graft_theta_sketch(value[, lgK]) - mergeable theta distinct-count sketch (aggregate)"),
        buildThetaSketch _),
      (FunctionIdentifier("graft_theta_estimate"),
        info("graft_theta_estimate",
          "graft_theta_estimate(sketch) - distinct-count estimate of a theta sketch"),
        buildThetaSet("estimate") _),
      (FunctionIdentifier("graft_theta_intersection_estimate"),
        info("graft_theta_intersection_estimate",
          "graft_theta_intersection_estimate(a, b) - estimated |A ∩ B| of two theta sketches"),
        buildThetaSet("intersection") _),
      (FunctionIdentifier("graft_theta_union_estimate"),
        info("graft_theta_union_estimate",
          "graft_theta_union_estimate(a, b) - estimated |A ∪ B| of two theta sketches"),
        buildThetaSet("union") _),
      (FunctionIdentifier("graft_theta_difference_estimate"),
        info("graft_theta_difference_estimate",
          "graft_theta_difference_estimate(a, b) - estimated |A \\ B| of two theta sketches"),
        buildThetaSet("difference") _)) ++
    textFns.map { case (name, usage, builder) =>
      (FunctionIdentifier(name), info(name, usage), builder)
    }

  /** Register the functions on an already-running session (temporary-function registry,
    * session-scoped — the imperative twin of [[GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = descriptors.foreach { case (id, fi, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
  }
}
