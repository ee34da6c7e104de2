package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** DataFrame-returning metric computations — the query surface of the engine.
  *
  * Each function compiles to a declarative Spark plan (single-scan aggregation unless the
  * metric's shape forces a shuffle), so Catalyst handles pushdown/pruning and all
  * aggregations are partial-aggregated map-side. These back `SparkEntry.queries` and are
  * shared with the constraint layer's semantics.
  */
object Metrics {

  /** Guarded ratio: NULL when the denominator is zero. Spark 4 runs with ANSI mode ON
    * by default, where ANY division by zero — long, decimal, or double — throws
    * [DIVIDE_BY_ZERO] instead of yielding NULL/NaN, so an unguarded count ratio turns
    * a legal input (empty table, all-null column) into a runtime error. CaseWhen
    * short-circuits, so the division is never evaluated when the guard fails; the NULL
    * result matches what DuckDB/PostgreSQL return for the same division.
    */
  private[graft] def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))

  /** Row count. */
  def size(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("row_count"))

  /** Non-null ratio (reference: constraints/completeness.rs:158-163). */
  def completeness(df: DataFrame, c: String): DataFrame =
    df.agg(count(lit(1)).as("total"), count(col(c)).as("non_null"))
      .select(col("total"), col("non_null"),
        ratio(col("non_null"), col("total")).as("ratio"))

  /** Distinct/total ratio (reference: constraints/uniqueness.rs:549-622). */
  def uniqueness(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("total"),
        countDistinct(col(cols.head), cols.drop(1).map(col): _*).as("distinct_count"))
      .select(col("total"), col("distinct_count"),
        ratio(col("distinct_count"), col("total")).as("uniqueness"))

  /** Distinct/non-null ratio (reference: analyzers/basic/distinctness.rs:113-114). */
  def distinctness(df: DataFrame, c: String): DataFrame =
    df.agg(count(col(c)).as("non_null"), countDistinct(col(c)).as("distinct_count"))
      .select(col("non_null"), col("distinct_count"),
        ratio(col("distinct_count"), col("non_null")).as("distinctness"))

  /** Values appearing exactly once / distinct values (reference: uniqueness.rs:661-684). */
  def uniqueValueRatio(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols).groupBy(cols.map(col): _*).count()
      .agg(sum(when(col("count") === 1L, 1L).otherwise(0L)).as("unique_values"),
        count(lit(1)).as("distinct_values"))
      .select(col("unique_values"), col("distinct_values"),
        ratio(col("unique_values"), col("distinct_values")).as("unique_value_ratio"))

  /** Primary-key health: total vs distinct vs null keys (reference: uniqueness.rs:687-718). */
  def primaryKey(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("total"),
      countDistinct(col(cols.head), cols.drop(1).map(col): _*).as("distinct_count"),
      sum(when(cols.map(c => col(c).isNull).reduce(_ || _), 1L).otherwise(0L)).as("null_keys"))

  /** Value histogram with ratios (reference: constraints/histogram.rs:214-240).
    * One groupBy shuffle bounded by cardinality; total via a window-free scalar join.
    */
  def histogram(df: DataFrame, c: String, maxBuckets: Int = 1000): DataFrame = {
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c).cast("string").as("value")).agg(count(lit(1)).as("cnt"))
    // The denominator is sum(cnt) over the GROUPED counts (pre-limit), not a second
    // count(col) over the input: both branches share the groupBy's exchange
    // (ReuseExchange), so the table is scanned ONCE — the separate count was a full
    // second input scan per histogram call.
    val total = counts.agg(sum(col("cnt")).as("_t"))
    counts.crossJoin(broadcast(total))
      .select(col("value"), col("cnt"),
        ratio(col("cnt"), col("_t")).as("ratio"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(maxBuckets)
  }

  /** Shannon entropy: ln(n) − Σc·ln(c)/n over non-null values — exact, fully
    * distributed, no per-bucket collect (reference: analyzers/advanced/entropy.rs:204-330).
    */
  def entropy(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNotNull).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n"), sum(col("cnt") * log(col("cnt"))).as("s"))
      .select(round(log(col("n")) - col("s") / col("n"), 6).as("entropy"))

  /** Mutual information of two (discrete) columns
    * (reference: analyzers/advanced/mutual_information.rs:143-290).
    * Joint groupBy + two broadcast marginals; MI folded in one aggregation.
    */
  def mutualInformation(df: DataFrame, c1: String, c2: String): DataFrame = {
    val d = df.filter(col(c1).isNotNull && col(c2).isNotNull)
      .select(col(c1).cast("string").as("x"), col(c2).cast("string").as("y"))
    // ONE scan of the data: the joint distribution. Marginals are window sums OVER the
    // (cardinality-bounded) joint counts — a linear plan, so Catalyst computes the
    // joint once; self-joining it instead would recompute the base aggregation per
    // marginal (three full input scans).
    val joint = d.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
    joint
      .withColumn("nx", sum(col("nxy")).over(org.apache.spark.sql.expressions.Window.partitionBy("x")))
      .withColumn("ny", sum(col("nxy")).over(org.apache.spark.sql.expressions.Window.partitionBy("y")))
      .agg(sum(col("nxy")).as("n"),
        sum(col("nxy") * (log(col("nxy")) - log(col("nx")) - log(col("ny")))).as("s"))
      .select(round(col("s") / col("n") + log(col("n")), 6).as("mutual_information"))
  }

  /** Per-value inferred-type distribution (reference: analyzers/advanced/data_type.rs:129-150). */
  def dataTypeDistribution(df: DataFrame, c: String): DataFrame =
    df.select(graft.constraints.InferredType.classifier(c).as("inferred_type"))
      .groupBy("inferred_type").agg(count(lit(1)).as("cnt"))
      .orderBy("inferred_type")

  /** Orphan count for a child→parent key (reference: constraints/foreign_key.rs:151-201). */
  def foreignKeyOrphans(child: DataFrame, parent: DataFrame, keys: Seq[(String, String)]): DataFrame = {
    val base = child.na.drop(keys.map(_._1))
    val p = parent.select(keys.map { case (_, pc) => col(pc) }: _*).distinct()
    val cond = keys.map { case (cc, pc) => base(cc) <=> p(pc) }.reduce(_ && _)
    base.join(p, cond, "left_anti").agg(count(lit(1)).as("orphans"))
  }

  /** Left-coverage ratio (reference: constraints/join_coverage.rs:195-316). ONE scan of
    * the (large) left side: a left join against the distinct-key set with a match
    * marker, counting total and covered in the same aggregation. The distinct'd right
    * keys can't multiply left rows, so `count(marker)` is exactly the covered count.
    */
  def joinCoverage(left: DataFrame, right: DataFrame, keys: Seq[(String, String)]): DataFrame = {
    // The marker column must not shadow a real column: a left-side "_matched" makes
    // count(col("_matched")) ambiguous after the join; a right-side KEY named
    // "_matched" would be silently REPLACED by the marker.
    require(!left.columns.contains("_matched") && !keys.exists(_._2 == "_matched"),
      "joinCoverage reserves the column name _matched; rename the input column")
    val r = right.select(keys.map { case (_, rc) => col(rc) }: _*).distinct()
      .withColumn("_matched", lit(1))
    // Plain equality: NULL left keys are uncovered by definition (null-safe <=> would
    // count them covered whenever the right side also has a NULL key).
    val cond = keys.map { case (lc, rc) => left(lc) === r(rc) }.reduce(_ && _)
    left.join(r, cond, "left")
      .agg(count(lit(1)).as("total"), count(col("_matched")).as("covered"))
      .select(col("covered"), col("total"),
        ratio(col("covered"), col("total")).as("coverage"))
  }

  /** Equal-width numeric histogram (reference: analyzers/advanced/histogram.rs:184-300,
    * which CASE-buckets numeric values). Two scans: a min/max pass, then a bucketed
    * groupBy whose cardinality is exactly `numBuckets` — no unbounded shuffle regardless
    * of the column's value cardinality, which is what makes this the 100 TB-safe shape
    * for continuous columns (the categorical [[histogram]] would shuffle every distinct
    * value). Max value lands in the top bucket (reference behavior).
    */
  def numericHistogram(df: DataFrame, c: String, numBuckets: Int = 10): DataFrame = {
    // Only FINITE values participate: a NaN makes maxV = NaN (Spark's max ranks NaN
    // above every real double) and an Infinity makes the width infinite — both
    // silently collapse the histogram into one garbage bucket. between(±MaxValue)
    // excludes NaN (<= fails under NaN-largest), ±Inf, and NULL in one predicate.
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // try_cast: under ANSI mode (Spark 4 default) a plain cast throws on the first
    // malformed string instead of letting the finiteness filter drop it.
    val clean = df.filter(
      col(c).try_cast("double").between(-Double.MaxValue, Double.MaxValue))
    val bounds = clean
      .agg(min(col(c).try_cast("double")).as("mn"), max(col(c).try_cast("double")).as("mx"))
      .head()
    // Empty input / all-null column: min/max are NULL — return an empty histogram
    // with the right schema instead of crashing on the destructure.
    if (bounds.isNullAt(0) || bounds.isNullAt(1))
      return df.limit(0).select(lit(0L).as("bucket"), lit(0.0).as("lo"),
        lit(0.0).as("hi"), lit(0L).as("cnt"))
    val (minV, maxV) = (bounds.getDouble(0), bounds.getDouble(1))
    // Per-term division: (maxV - minV) overflows to Infinity when the extremes
    // straddle ~±1.7e308 (finite values that PASS the filter) — an infinite width
    // would put every row in bucket 0 with NaN/Inf bounds. Dividing each term first
    // stays finite for numBuckets >= 2; the numBuckets == 1 extreme clamps to
    // MaxValue (single bucket; width is display-only there).
    val width =
      if (maxV <= minV) 1.0
      else {
        val w = maxV / numBuckets - minV / numBuckets
        if (java.lang.Double.isFinite(w) && w > 0) w else Double.MaxValue
      }
    // Clamped at BOTH ends: least() caps the top bucket; greatest() guards against
    // rows below the pass-1 min reaching the second scan (recomputed
    // non-deterministic source / concurrent append) — a negative bucket id would
    // silently emit a bucket with lo < minV.
    val bucket = greatest(lit(0L), least(
      floor((col(c).try_cast("double") - lit(minV)) / lit(width)),
      lit(numBuckets - 1L)).cast("long"))
    clean
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        round(lit(minV) + col("bucket") * lit(width), 6).as("lo"),
        round(lit(minV) + (col("bucket") + 1) * lit(width), 6).as("hi"),
        col("cnt"))
      .orderBy("bucket")
  }

  /** The one grouped-completeness aggregation both public shapes share. */
  private def groupedCompletenessBase(df: DataFrame, c: String, groups: Seq[String]): DataFrame =
    df.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("total"), count(col(c)).as("non_null"))
      .select(groups.map(col) :+
        col("total") :+ col("non_null") :+
        ratio(col("non_null"), col("total")).as("completeness"): _*)

  /** Grouped completeness (reference: analyzers/basic/grouped_completeness.rs:110-140). */
  def groupedCompleteness(df: DataFrame, c: String, groups: Seq[String]): DataFrame =
    groupedCompletenessBase(df, c, groups).orderBy(groups.map(col): _*)

  /** The WORST `maxGroups` groups by completeness, deterministically tiebroken on the
    * group value (reference: analyzers/basic/grouped_completeness.rs:119-128 worst-first
    * ordering). This is a top-N surface — by design it does not signal whether more
    * groups exist beyond the N returned; use [[graft.constraints.GroupedCompletenessConstraint]]
    * when the reference's `max_groups+1` truncation DETECTION is wanted. The shuffle is
    * bounded by group cardinality and the driver sees at most `maxGroups` rows.
    */
  def groupedCompletenessWorst(df: DataFrame, c: String, groups: Seq[String],
      maxGroups: Int = 10000): DataFrame =
    groupedCompletenessBase(df, c, groups)
      // Tiebreak nulls LAST (SQL default): under the LIMIT, Spark's nulls-first
      // ascending would let a NULL group value displace a named group from the cut.
      .orderBy(col("completeness").asc +: groups.map(col(_).asc_nulls_last): _*)
      .limit(maxGroups)

  /** Key-skew profile (beyond-reference, the pre-shuffle-join check at scale): heaviest
    * key's row share plus distinct-key count. Two-level aggregation — per-key counts are
    * map-side combined, then a single global reduce of (max, sum, count) — so no key's
    * rows ever concentrate on one task. A top-1 share near 1.0 means a shuffle join on
    * this key will hot-spot one partition (→ salt or broadcast instead).
    */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("max_key_rows"),
        sum(col("cnt")).cast("long").as("total_rows"),
        count(lit(1)).as("distinct_keys"))
      .select(col("max_key_rows"), col("total_rows"), col("distinct_keys"),
        ratio(col("max_key_rows"), col("total_rows")).as("top_key_share"))

  /** Robust (median/MAD) outlier profile: median, median absolute deviation, and
    * the count of values beyond `k` MADs — the outlier screen that, unlike mean/
    * stddev z-scores, is not dragged by the outliers it hunts (50% breakdown
    * point). NULL / NaN / ±Inf values are excluded. Constant data (MAD 0) flags
    * every value ≠ median — the standard degenerate caveat, surfaced by mad = 0
    * in the output rather than hidden.
    *
    * Scale: two exact-quantile passes through [[graft.operators.Quantiles]]
    * (sketch + bracket verification — driver memory bounded regardless of n; the
    * medians come back as scalars) and one filtered count scan. Three bounded
    * scans, no data-scale shuffle.
    */
  def robustOutliers(df: DataFrame, colName: String, k: Double = 3.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(colName).cast("double")
    val vals = df.select(x.as("_v"))
      .filter(col("_v").between(-Double.MaxValue, Double.MaxValue))
    graft.operators.Quantiles.exactQuantile(vals, "_v", 0.5) match {
      case None =>
        // one row, not zero: a SQL aggregate over an empty input yields
        // (0, NULL, NULL, 0), and the oracle comparison expects that shape
        Seq((0L, Option.empty[Double], Option.empty[Double], 0L))
          .toDF("n_values", "median", "mad", "n_outliers")
      case Some(med) =>
        val devs = vals.select(abs(col("_v") - lit(med)).as("_v"))
        val mad = graft.operators.Quantiles.exactQuantile(devs, "_v", 0.5).get
        vals.agg(
          count(lit(1)).as("n_values"),
          lit(med).as("median"),
          lit(mad).as("mad"),
          coalesce(sum(when(abs(col("_v") - lit(med)) > lit(k * mad), 1L)
            .otherwise(0L)), lit(0L)).as("n_outliers"))
    }
  }

  /** Equi-DEPTH histogram: `buckets` buckets holding ~equal row counts, edged by
    * the column's exact quantiles — the skew-honest complement to
    * [[numericHistogram]]'s fixed-width buckets (on a heavy-tailed column the
    * equi-width histogram puts ~everything in bucket 0; equi-depth shows the
    * distribution's actual shape, and its edges are the optimizer-style statistics
    * a partitioner or binner would want). One row per bucket: `(bucket, lo, hi,
    * cnt)`; heavy ties can leave interior buckets empty — those rows report
    * `cnt = 0` rather than vanishing. NULL/NaN/±Inf excluded; empty input returns
    * an empty frame.
    *
    * Assignment rule (engine-portable, exact): `bucket = Σ_i [x > edge_i]` over the
    * interior quantile edges — a value exactly ON an edge falls in the lower
    * bucket. Edges come from the distributed sketch+bracket quantile operator;
    * counting is one scan with a codegen'd comparison chain; the per-bucket join
    * is against a `buckets`-row broadcast frame.
    */
  def equiDepthHistogram(df: DataFrame, c: String, buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df
      .select(col(c).try_cast("double").as("_v"))
      .filter(col("_v").between(-Double.MaxValue, Double.MaxValue))
    val qs = (0 to buckets).map(_.toDouble / buckets)
    graft.operators.Quantiles.exactQuantiles(clean, "_v", qs) match {
      case None =>
        clean.limit(0).select(lit(0L).as("bucket"), lit(0.0).as("lo"),
          lit(0.0).as("hi"), lit(0L).as("cnt"))
      case Some(edges) =>
        val interior = edges.slice(1, buckets)
        val bucketCol = interior.foldLeft(lit(0L))((acc, e) =>
          acc + when(col("_v") > e, 1L).otherwise(0L))
        val counts = clean.groupBy(bucketCol.as("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val edgeFrame = (0 until buckets)
          .map(i => (i.toLong, edges(i), edges(i + 1)))
          .toDF("bucket", "lo", "hi")
        edgeFrame.join(counts, Seq("bucket"), "left")
          .select(col("bucket"), col("lo"), col("hi"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
    }
  }

  /** Per-group robust outlier screen: [[robustOutliers]] stratified by `groupCol` —
    * one row per group with its exact median, MAD, and count beyond `k` MADs. The
    * per-stratum version is what mixed corpora actually need (a global MAD over
    * five event types screens none of them well). NULL group is a REAL group
    * (dropping it would silently unscreen those rows); NULL/NaN/±Inf values are
    * excluded as in the global screen.
    *
    * Shape: one hash shuffle on the group key, then BOTH medians run as
    * aggregate-over-window passes on that same partitioning (no joins, no second
    * exchange) and the rollup group-by is partitioning-aligned too. Groups are
    * entity-bounded (an event-type, a language): a single data-scale hot group
    * buffers its partition in one task — the global [[robustOutliers]] with its
    * sketch+bracket quantiles is the tool for that shape.
    */
  def robustOutliersByGroup(df: DataFrame, groupCol: String, colName: String,
      k: Double = 3.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!Seq("n_values", "median", "mad", "n_outliers").contains(groupCol),
      s"groupCol '$groupCol' collides with an output column name — rename it first")
    val v = df
      .select(col(groupCol).as("_g"), col(colName).cast("double").as("_v"))
      .filter(col("_v").between(-Double.MaxValue, Double.MaxValue))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    v.withColumn("_med", expr("percentile(_v, 0.5)").over(w))
      .withColumn("_dev", abs(col("_v") - col("_med")))
      .withColumn("_mad", expr("percentile(_dev, 0.5)").over(w))
      .groupBy(col("_g"))
      .agg(
        count(lit(1)).as("n_values"),
        min(col("_med")).as("median"),
        min(col("_mad")).as("mad"),
        coalesce(sum(when(col("_dev") > col("_mad") * k, 1L).otherwise(0L)), lit(0L))
          .as("n_outliers"))
      .withColumnRenamed("_g", groupCol)
  }

  /** Winsorization screen: clip `colName` to its `[pLo, pHi]` exact quantiles and
    * report what clipping would do — `n_values`, the clip bounds, how many values
    * each tail clips, and the post-clip mean. The standard heavy-tail tamer for
    * numeric features before training (a handful of runaway values otherwise own
    * the feature's scale); run the screen first, wire the clamp into the pipeline
    * once the counts look sane.
    *
    * Quantiles come from the distributed sketch+bracket operator
    * ([[graft.operators.Quantiles.exactQuantiles]]) — exact interpolated values,
    * never a single-task percentile merge. NULL/NaN/±Inf are excluded up front
    * (clamping a NaN is meaningless; an Inf would BE the quantile at the tail).
    * Empty/all-hostile input yields the SQL-aggregate shape `(0, NULL, NULL, 0, 0,
    * NULL)`. Shape: two bounded quantile scans + one aggregation scan, nothing
    * data-scale shuffles.
    */
  def winsorizeStats(df: DataFrame, colName: String, pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val spark = df.sparkSession
    import spark.implicits._
    val x = col(colName).cast("double")
    val vals = df.select(x.as("_v"))
      .filter(col("_v").between(-Double.MaxValue, Double.MaxValue))
    graft.operators.Quantiles.exactQuantiles(vals, "_v", Seq(pLo, pHi)) match {
      case None =>
        Seq((0L, Option.empty[Double], Option.empty[Double], 0L, 0L,
          Option.empty[Double]))
          .toDF("n_values", "q_lo", "q_hi", "n_clipped_lo", "n_clipped_hi",
            "mean_clipped")
      case Some(Seq(qLo, qHi)) =>
        vals.agg(
          count(lit(1)).as("n_values"),
          lit(qLo).as("q_lo"),
          lit(qHi).as("q_hi"),
          coalesce(sum(when(col("_v") < qLo, 1L).otherwise(0L)), lit(0L))
            .as("n_clipped_lo"),
          coalesce(sum(when(col("_v") > qHi, 1L).otherwise(0L)), lit(0L))
            .as("n_clipped_hi"),
          avg(greatest(least(col("_v"), lit(qHi)), lit(qLo))).as("mean_clipped"))
      case Some(other) =>
        throw new IllegalStateException(s"expected 2 quantiles, got $other")
    }
  }

  /** Corpus vocabulary head: the `k` most frequent whitespace tokens with counts and
    * corpus share — the vocab-coverage/OOV-rate input a tokenizer-training or
    * mixture-debugging pass reads first. Shape: explode is row-local; per-token
    * counts are map-side combined before the (cardinality-bounded) shuffle; the
    * global top-k is a TakeOrdered over the count frame, never a full sort. Ties on
    * count break by token (ascending) so the result is deterministic across runs and
    * engines.
    */
  /** Cohen's kappa between two categorical "rater" columns — chance-corrected
    * agreement (`(po − pe)/(1 − pe)`): the honest number for comparing two
    * classifiers/annotators, where raw agreement `po` flatters any pair that mostly
    * predicts the majority class. One row: `(n, po, pe, kappa)`. NULL is a real
    * category on both sides (null-safe agreement); `kappa` is NULL when `pe = 1`
    * (both raters constant and identical — no chance-corrected signal exists) or on
    * empty input. Landis–Koch reading: < 0.2 slight, 0.2–0.4 fair, 0.4–0.6
    * moderate, 0.6–0.8 substantial, > 0.8 near-perfect.
    *
    * 100 TB shape: ONE `(r1, r2)`-keyed count shuffle (map-side combined, output
    * bounded by category²); marginals, expected agreement, and the closed form all
    * run on that tiny frame. Marginal products accumulate in doubles — long
    * arithmetic would overflow at `n1·n2 > 2^63` (reachable at corpus scale).
    */
  def cohensKappa(df: DataFrame, col1: String, col2: String): DataFrame = {
    val counts = df.groupBy(col(col1).as("_r1"), col(col2).as("_r2"))
      .agg(count(lit(1)).as("_n"))
    val m1 = counts.groupBy(col("_r1").as("_cat")).agg(sum(col("_n")).as("_n1"))
    val m2 = counts.groupBy(col("_r2").as("_cat")).agg(sum(col("_n")).as("_n2"))
    // Full-outer on the category: a category one rater never uses still carries its
    // (zero-product) marginal row; inner would silently drop asymmetric categories.
    val cross = m1.join(m2, m1("_cat") <=> m2("_cat"), "full_outer")
      .agg(sum(coalesce(col("_n1"), lit(0L)).cast("double") *
        coalesce(col("_n2"), lit(0L)).cast("double")).as("_x"))
    val agree = counts.agg(
      coalesce(sum(col("_n")), lit(0L)).as("_t"),
      sum(when(col("_r1") <=> col("_r2"), col("_n")).otherwise(0L)).as("_a"))
    val po = col("_a").cast("double") / col("_t")
    val pe = col("_x") / (col("_t").cast("double") * col("_t"))
    agree.crossJoin(broadcast(cross)).select(
      col("_t").as("n"),
      when(col("_t") > 0, po).as("po"),
      when(col("_t") > 0, pe).as("pe"),
      when(col("_t") > 0 && pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Exact ECDF (percentile-rank) normalization of a numeric column: appends
    * `outCol = F(x) = P(X <= x)` ∈ (0, 1] — the rank-based calibration that makes
    * quality scores from different models/sources comparable before mixing (raw
    * score scales are arbitrary; their percentiles are not). Ties share one value
    * (inclusive cumulative count / N — SQL `cume_dist` exactly); rows whose value
    * is NULL/NaN/±Inf get NULL (they have no place on the real line) but are KEPT.
    *
    * 100 TB shape — deliberately NOT a global `cume_dist()` window (one task sorts
    * the corpus): distinct-value counts (one keyed map-side-combined shuffle), a
    * range-partitioned cumulative fold with driver-side prefix offsets of ONE
    * summary row per partition (the `ksStatistic` / `withRunningTotal` boundary-fold
    * strategy), then one value-keyed equi-join maps rows to their rank — every
    * stage shuffle-linear, driver state bounded by the partition count.
    */
  def ecdfNormalize(df: DataFrame, c: String, outCol: String = "ecdf"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists — pick another name")
    Seq("_ecdf_v", "_ecdf_cum").foreach(r => require(!df.columns.contains(r),
      s"input already has a $r column (reserved internal name)"))
    val spark = df.sparkSession
    import org.apache.spark.sql.Encoders
    val clean = df
      .select(col(c).try_cast("double").as("_v"))
      .filter(col("_v").between(-Double.MaxValue, Double.MaxValue))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    // One pinned materialization of the nondeterministic range partitioning — the
    // totals pass and the emit pass must see identical partition contents/order.
    val ranged = clean
      .repartitionByRange(col("_v")).sortWithinPartitions(col("_v"))
      .localCheckpoint(true)
    val stats = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var t = 0L
      it.foreach { r => t += r.getLong(1) }
      Iterator.single((pid, t))
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .collect().sortBy(_._1)
    val n = stats.map(_._2).sum
    if (n == 0L) return df.withColumn(outCol, lit(null).cast("double"))
    val offsets: Map[Int, Long] = {
      var acc = 0L
      stats.map { case (pid, t) => val e = pid -> acc; acc += t; e }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val ranks = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = bc.value(pid)
      it.map { r => acc += r.getLong(1); (r.getDouble(0), acc) }
    }(Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .toDF("_ecdf_v", "_ecdf_cum")
    df.join(ranks, df(c).try_cast("double") === col("_ecdf_v"), "left")
      .withColumn(outCol, col("_ecdf_cum").cast("double") / n)
      .drop("_ecdf_v", "_ecdf_cum")
  }

  /** Per-group [[ecdfNormalize]]: `outCol = F_g(x)` within each `groupCol` stratum —
    * the cross-source score calibration itself (each source's scores rank against
    * that source's own distribution, so "top 10% of web" and "top 10% of code"
    * mean the same thing before mixing). Same value semantics as the global form:
    * ties share a rank, hostile values rank NULL but rows are kept; NULL group is
    * a real stratum.
    *
    * Shape: one (group, value)-keyed count shuffle, cumulative/total windows over
    * the COUNTS frame on the same partitioning, one (group, value)-keyed join
    * back. The window partitions are bounded by distinct values per group (the
    * grouped-window contract shared with `Drift.ksStatisticByGroup`); a group
    * whose value domain is data-scale-distinct belongs to the global
    * [[ecdfNormalize]] boundary-fold run per group instead.
    */
  def ecdfNormalizeByGroup(df: DataFrame, groupCol: String, c: String,
      outCol: String = "ecdf"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists — pick another name")
    Seq("_ecdf_g", "_ecdf_v", "_ecdf_p").foreach(r => require(!df.columns.contains(r),
      s"input already has a $r column (reserved internal name)"))
    val counts = df
      .select(col(groupCol).as("_ecdf_g"), col(c).try_cast("double").as("_ecdf_v"))
      .filter(col("_ecdf_v").between(-Double.MaxValue, Double.MaxValue))
      .groupBy(col("_ecdf_g"), col("_ecdf_v")).agg(count(lit(1)).as("_c"))
    val cum = org.apache.spark.sql.expressions.Window.partitionBy(col("_ecdf_g"))
      .orderBy(col("_ecdf_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("_ecdf_g"))
    val ranks = counts
      .withColumn("_ecdf_p",
        sum(col("_c")).over(cum).cast("double") / sum(col("_c")).over(tot))
      .drop("_c")
    df.join(ranks,
        df(groupCol) <=> ranks("_ecdf_g") && df(c).try_cast("double") === ranks("_ecdf_v"),
        "left")
      .withColumn(outCol, col("_ecdf_p"))
      .drop("_ecdf_g", "_ecdf_v", "_ecdf_p")
  }

  /** Per-group mergeable distinct-count sketches as COLUMNS: each `groupCol` stratum
    * gets a Datasketches-HLL binary (`hll_sketch`) plus its estimate
    * (`approx_distinct`) in ONE map-side-combined scan — the store-and-merge-later
    * surface for partitioned distinct counting (per-day sketches persisted to the
    * metrics store, month = [[mergeSketches]] over 30 sketch rows, NO rescan of the
    * month's data). NULL values contribute nothing (SQL distinct semantics); a group
    * with no non-NULL values carries an EMPTY (non-NULL) sketch estimating 0. `lgK`
    * 14 keeps the relative error ~0.4% at ~12 KiB per sketch.
    *
    * This is the SQL-native sibling of the analyzer-state HLL
    * ([[graft.analyzers.Analyzers.approxCountDistinct]]): same sketch family, but
    * living in a DataFrame column so rollups compose in plain queries.
    */
  def approxDistinctRollup(df: DataFrame, groupCol: String, c: String,
      lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4,21], got $lgK") // datasketches bounds
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(c), lit(lgK)).as("hll_sketch"))
      .withColumn("approx_distinct",
        coalesce(hll_sketch_estimate(col("hll_sketch")), lit(0L)))
  }

  /** Union a frame of [[approxDistinctRollup]] sketches down to one estimate —
    * the merge step that replaces rescanning the underlying data. Bounded input
    * (one sketch row per group/day), one tiny all-to-one aggregation; NULL
    * sketches (empty groups) are skipped, an empty input estimates 0.
    */
  def mergeSketches(sketches: DataFrame, sketchCol: String = "hll_sketch"): DataFrame =
    sketches
      .filter(col(sketchCol).isNotNull)
      .agg(coalesce(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(true))),
        lit(0L)).as("merged_distinct"))

  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"))
    val total = counts.agg(coalesce(sum(col("occurrences")), lit(0L)).as("_tot"))
    counts
      .crossJoin(broadcast(total))
      .select(col("token"), col("occurrences"),
        ratio(col("occurrences"), col("_tot")).as("share"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(k)
  }
}
