package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Trainable document-quality classifier — the DCLM/fastText-style pipeline step:
  * fit a logistic regression on a small LABELED seed set (curated positives vs
  * crawl negatives), then score the whole corpus and keep the top fraction.
  *
  * Features are [[TextFunctions.hashedEmbedding]] vectors (deterministic, model-
  * free), so featurization is a codegen'd row-local projection on BOTH sides:
  * training runs MLlib's distributed L-BFGS on the (small) seed frame; scoring
  * does NOT run the MLlib model per row — the fitted weights come back to the
  * driver (dim + 1 doubles) and scoring is a literal dot product folded into the
  * corpus scan (`zip_with` against a constant array + sigmoid), broadcast-free
  * and shuffle-free at any corpus size.
  *
  * Determinism: LogisticRegression with fixed data is deterministic (L-BFGS from
  * a zero start, no sampling), so retraining on the same seed reproduces the same
  * weights — membership of the filtered corpus is stable across runs.
  */
object QualityClassifier {

  /** Fitted model: weights per hashed-embedding dimension plus intercept. */
  final case class Model(weights: Array[Double], intercept: Double, dim: Int) {
    require(weights.length == dim, s"weight count ${weights.length} != dim $dim")

    /** Score column: `sigmoid(intercept + w · hashedEmbedding(text))` — row-local,
      * NULL text ⇒ NULL score (tokenless text scores `sigmoid(intercept)`, the
      * prior, via the zero vector). The dot product is the fused
      * [[graft.functions.AffineToProbe]] kernel (a `zip_with`/`aggregate` fold
      * would run ~2·dim interpreted CodegenFallback lambdas per corpus row —
      * the same trap the quantization-fidelity kernel removed);
      * [[scoreColumns]] keeps that fold as the executable specification.
      */
    def score(text: Column): Column =
      sigmoid(graft.functions.VectorFunctions.affineToProbe(
        TextFunctions.hashedEmbedding(text, dim), weights.toSeq, intercept))

    /** Column-fold scoring — the executable specification of [[score]]
      * (accumulation order identical, spec-pinned equal). */
    def scoreColumns(text: Column): Column = {
      val w = array(weights.map(lit).toIndexedSeq: _*)
      val z = aggregate(
        zip_with(TextFunctions.hashedEmbedding(text, dim), w,
          (x, wi) => x.cast("double") * wi),
        lit(intercept), (acc, v) => acc + v)
      sigmoid(z)
    }

    private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Fit on a labeled seed frame (`labelCol` ∈ {0, 1}; rows with NULL text or
    * label are dropped — they carry no training signal). `dim` trades collision
    * noise against plan size; 128-256 suits quality classifiers.
    *
    * Scale shape: the seed set is small by construction (curation is expensive) —
    * MLlib aggregates gradients tree-wise over however it is partitioned; the
    * returned Model is dim+1 doubles regardless of corpus size.
    */
  def trainLogistic(seed: DataFrame, textCol: String, labelCol: String,
      dim: Int = 128, maxIter: Int = 100, regParam: Double = 1e-4): Model = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val prepared = seed
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("double").as("label"),
        toVec(TextFunctions.hashedEmbedding(col(textCol), dim)).as("features"))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setStandardization(false)
    val fitted = lr.fit(prepared)
    Model(fitted.coefficients.toArray, fitted.intercept, dim)
  }

  /** Reliability curve for a [0,1]-scored filter: fixed-width score bins × empirical
    * label rate — "when the classifier says 0.8, is it right 80% of the time?" The
    * threshold-picking table behind every score-based corpus filter, where
    * miscalibration silently moves millions of documents at 100 TB.
    *
    * Per bin (`bin` = `floor(score·bins)`, top edge closed so score 1.0 lands in the
    * last bin): row count, labeled-row count, mean score, and the label rate over
    * LABELED rows (SQL `avg` semantics — NULL labels occupy the bin but don't vote;
    * an all-NULL-label bin reports NULL rate, never a fake 0). Scores that are NULL,
    * NaN, or outside [0,1] collapse into one NULL-bin bucket — malformed model
    * output is something to SEE in the table, not silently clamp into the edge bins.
    * Empty bins simply don't appear (no dense spine is fabricated).
    *
    * Scale shape: one scan, map-side-combined `groupBy` on ≤ bins+1 keys — no
    * window, no global sort (an `ntile` decile formulation is a single-task global
    * window). Equal-POPULATION bins instead = [[graft.Metrics.equiDepthHistogram]]
    * over the score column.
    */
  /** Pick the lowest score threshold whose KEPT SLICE (all bins at or above it)
    * reaches `targetPrecision` — the automated "where do I cut" step over a
    * [[calibrationBins]] table. Evaluates cumulative-from-the-top label rates
    * (what filtering at τ actually yields — a single bin's rate is not the kept
    * slice's rate), on LABELED rows only. Returns `Some(binLowerEdge)` of the
    * best (lowest) qualifying threshold, or `None` when no suffix reaches the
    * target (the caller hears "this classifier can't give you that precision" —
    * not a silently-strictest cut). Driver-side over ≤ bins rows — the table is
    * already tiny; the NULL malformed-score bin never qualifies as a cut point.
    */
  def thresholdForPrecision(calib: DataFrame, bins: Int,
      targetPrecision: Double): Option[Double] = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(targetPrecision > 0 && targetPrecision <= 1,
      s"targetPrecision must be in (0,1], got $targetPrecision")
    val rows = calib.filter(col("bin").isNotNull)
      .select(col("bin").cast("int"), col("n_labeled").cast("long"),
        col("label_sum").as("_pos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
      .sortBy(-_._1)
    // A table binned at a different granularity would divide foreign bin indices
    // by the wrong denominator and return impossible thresholds (e.g. 1.9) —
    // fail loud on the mismatch instead.
    rows.headOption.foreach { case (maxBin, _, _) =>
      require(maxBin < bins,
        s"calibration table has bin $maxBin but bins=$bins was passed — " +
          "use the same bins value calibrationBins was built with")
    }
    var nLab = 0L
    var nPos = 0.0
    var best: Option[Double] = None
    rows.foreach { case (bin, labeled, pos) =>
      nLab += labeled
      nPos += pos
      if (nLab > 0 && nPos / nLab >= targetPrecision)
        best = Some(bin.toDouble / bins) // lowest qualifying suffix wins
    }
    best
  }

  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val s = col(scoreCol).try_cast("double")
    val inRange = s.isNotNull && !isnan(s) && s >= 0.0 && s <= 1.0
    val bin = when(inRange,
      least(floor(s * bins).cast("int"), lit(bins - 1)))
    // NaN labels are hostile input, not a vote — NULL them (one NaN would
    // otherwise poison the bin's whole avg).
    val rawLabel = col(labelCol).try_cast("double")
    val label = when(!isnan(rawLabel), rawLabel)
    df.select(bin.as("bin"), s.as("_s"), label.as("_l"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        count(col("_l")).as("n_labeled"),
        avg(when(col("bin").isNotNull, col("_s"))).as("mean_score"),
        avg(col("_l")).as("label_rate"),
        // The exact positive mass (sum of 0/1 votes) — what threshold arithmetic
        // consumes; reconstructing it as rate×count reintroduces float error at
        // exactly-met targets.
        sum(col("_l")).as("label_sum"))
  }
}
