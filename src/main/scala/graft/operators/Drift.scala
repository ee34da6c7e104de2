package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between a reference and a current dataset — the
  * "did this week's crawl change shape against the corpus we trained on" monitor,
  * complementing the per-metric time-series anomaly detectors (which watch ONE
  * statistic over time; PSI watches a whole distribution at once).
  *
  * 100 TB shape: each side collapses to its per-category counts first (one keyed
  * partial-agg shuffle per side, output = |categories| rows), and everything after —
  * the null-safe full-outer join, smoothing, the PSI rollup — runs on those tiny
  * frames. Nothing data-scale crosses the wire twice.
  */
object Drift {

  /** `max(n/total, epsilon)` when the side has mass, else NULL — the PSI smoothing
    * shared by every PSI surface here (one definition, so the epsilon convention
    * cannot silently diverge between the snapshot and series forms).
    */
  private def smoothedShare(n: Column, total: Column, epsilon: Double): Column =
    when(total > 0, greatest(n.cast("double") / total.cast("double"), lit(epsilon)))

  /** `(p_ref − p_cur)·ln(p_ref/p_cur)` where both shares exist, else NULL. */
  private def psiTerm(pRef: Column, pCur: Column): Column =
    when(pRef.isNotNull && pCur.isNotNull, (pRef - pCur) * log(pRef / pCur))

  /** Per-category joint counts with side totals: `(value, n_ref, n_cur, _tr, _tc)` —
    * the shared scaffold under every categorical two-sample statistic here (PSI,
    * chi-square, Jensen–Shannon). Each side collapses to its category counts (one
    * keyed partial-agg shuffle), sides meet in a null-safe full-outer join (NULL is
    * a category of its own), and the totals ride along as a single-row broadcast
    * product over the already-tiny category frame — no collect, no second input scan.
    */
  private def jointCounts(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    val r = ref.groupBy(col(colName).as("value")).agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(colName).as("value")).agg(count(lit(1)).as("n_cur"))
    val joined = r.join(c, r("value") <=> c("value"), "full_outer")
      .select(
        coalesce(r("value"), c("value")).as("value"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_ref")).as("_tr"), sum(col("n_cur")).as("_tc"))
    joined.crossJoin(broadcast(totals))
  }

  /** Per-category drift detail over `colName`: `value`, `n_ref`, `n_cur`, `p_ref`,
    * `p_cur` (smoothed shares, `max(n/total, epsilon)` — the standard PSI guard so a
    * category present on one side only contributes a finite term), `psi_term`
    * (`(p_ref − p_cur)·ln(p_ref/p_cur)`, always ≥ 0). NULL is a category of its own
    * (null-safe join); an EMPTY side yields NULL shares/terms rather than inventing
    * an epsilon distribution.
    */
  def psiDetail(ref: DataFrame, cur: DataFrame, colName: String,
      epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0 && epsilon < 1, s"epsilon must be in (0,1), got $epsilon")
    val p = jointCounts(ref, cur, colName)
    p.withColumn("p_ref", smoothedShare(col("n_ref"), col("_tr"), epsilon))
      .withColumn("p_cur", smoothedShare(col("n_cur"), col("_tc"), epsilon))
      .withColumn("psi_term", psiTerm(col("p_ref"), col("p_cur")))
      .drop("_tr", "_tc")
  }

  /** Total PSI in one row: `psi`, `n_categories`. Rule-of-thumb reading (the credit-
    * scoring convention PSI comes from): < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 significant drift. `psi` is SQL NULL when either side is empty.
    */
  def psi(ref: DataFrame, cur: DataFrame, colName: String,
      epsilon: Double = 1e-6): DataFrame =
    psiDetail(ref, cur, colName, epsilon).agg(
      sum(col("psi_term")).as("psi"),
      count(lit(1)).as("n_categories"))

  /** Two-sample chi-square test of homogeneity over `colName`'s categories — the
    * classical counterpart to [[psi]] (PSI weights by share difference; chi-square
    * weights by statistical surprise, so a small shift in a HUGE category registers
    * where PSI shrugs). One row: `(chi2, dof, cramers_v, n_ref, n_cur,
    * n_categories)` for the 2×C contingency table of (side × category):
    * `chi2 = Σ (O−E)²/E` over both rows, `E = rowTotal·colTotal/N`,
    * `dof = C − 1`, `cramers_v = sqrt(chi2 / N)` (the 2×C specialization of
    * `sqrt(chi2 / (N·min(r−1,c−1)))` — the [0,1] effect size that, unlike chi2
    * itself, does not grow with N: the number to THRESHOLD on at 100 TB, where any
    * real shift makes chi2 astronomically significant). An empty side yields NULL
    * statistics (nothing to compare — same convention as [[psi]]); `cramers_v` is
    * NULL when C = 1 (a single category carries no association to measure). NULL
    * is a category of its own. Exact arithmetic over the category-count frame; the
    * inputs are scanned once each.
    */
  def chiSquare(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    // Every category in the frame has colTotal > 0 (it exists because at least one
    // side counted it), so E > 0 whenever both side totals are positive — the
    // when() guard below also covers ANSI division by an N=0 denominator.
    jointCounts(ref, cur, colName)
      .withColumn("_n", (col("_tr") + col("_tc")).cast("double"))
      .withColumn("_ct", (col("n_ref") + col("n_cur")).cast("double"))
      .withColumn("_er", col("_tr").cast("double") * col("_ct") / col("_n"))
      .withColumn("_ec", col("_tc").cast("double") * col("_ct") / col("_n"))
      .withColumn("_term", when(col("_tr") > 0 && col("_tc") > 0,
        pow(col("n_ref") - col("_er"), 2.0) / col("_er") +
          pow(col("n_cur") - col("_ec"), 2.0) / col("_ec")))
      .agg(
        sum(col("_term")).as("chi2"),
        count(lit(1)).as("n_categories"),
        max(col("_tr")).as("n_ref"),
        max(col("_tc")).as("n_cur"),
        max(col("_n")).as("_nn"))
      .select(
        col("chi2"),
        // NULL (not -1) when both sides are empty and no category row exists.
        when(col("n_categories") > 0L, col("n_categories") - 1L).as("dof"),
        when(col("n_categories") > 1L, sqrt(col("chi2") / col("_nn"))).as("cramers_v"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("n_categories"))
  }

  /** Jensen–Shannon divergence between the two category distributions —
    * `JSD = ½·KL(P‖M) + ½·KL(Q‖M)` with `M = (P+Q)/2`, in nats. One row:
    * `(jsd, jsd_normalized, n_categories)`; `jsd_normalized = jsd / ln 2 ∈ [0,1]`
    * (1 = fully disjoint supports). Unlike PSI, JSD needs NO epsilon smoothing —
    * a category absent on one side contributes `½·p·ln 2` finitely (the `0·ln 0 = 0`
    * convention), so the statistic is exact, symmetric, and bounded, which is what
    * you want for comparing drift ACROSS columns with different cardinalities.
    * An empty side yields NULL (same convention as [[psi]]).
    */
  def jsDivergence(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    val p = col("n_ref").cast("double") / col("_tr")
    val q = col("n_cur").cast("double") / col("_tc")
    val m = (p + q) / 2.0 // > 0 on every category row: n_ref + n_cur >= 1
    def kl(x: Column): Column = when(x > 0, x * log(x / m) * 0.5).otherwise(lit(0.0))
    jointCounts(ref, cur, colName)
      // ALL divisions live inside the untaken-on-empty-side CaseWhen branch
      // (CaseWhen evaluates lazily per row — an empty side's _tr/_tc = 0
      // denominators are never touched, so ANSI mode cannot throw); the branch
      // yields NULL terms -> sum NULL, the empty-side verdict.
      .withColumn("_term", when(col("_tr") > 0 && col("_tc") > 0, kl(p) + kl(q)))
      .agg(sum(col("_term")).as("jsd"), count(lit(1)).as("n_categories"))
      .select(col("jsd"), (col("jsd") / math.log(2.0)).as("jsd_normalized"),
        col("n_categories"))
  }

  /** Daily PSI series: for every calendar day with data, the PSI of `catCol`'s
    * distribution against the PREVIOUS day — [[psi]] unrolled over event time, the
    * feed-monitoring view ("which day did the upstream mix shift") where the
    * two-snapshot psi answers only "did it shift between these two corpora".
    * One row per day: `(day, n_categories, psi)`; `psi` is NULL when the previous
    * day has no rows (nothing to compare against — the first day always). NULL
    * category is a real category (same convention as [[psiDetail]]); rows with a
    * NULL/invalid timestamp have no day and are excluded.
    *
    * Scale: one (day, category)-keyed count shuffle (map-side combined, output
    * bounded by days × categories), then every join/rollup runs on that bounded
    * frame — the corpus is scanned once.
    */
  def psiSeries(df: DataFrame, tsCol: String, catCol: String,
      epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0 && epsilon < 1, s"epsilon must be in (0,1), got $epsilon")
    val counts = df
      .select(to_date(col(tsCol)).as("_day"), col(catCol).as("_cat"))
      .filter(col("_day").isNotNull)
      .groupBy(col("_day"), col("_cat"))
      .agg(count(lit(1)).as("_n"))
    // The reference side is "yesterday" shifted forward one day, so the full-outer
    // join lines both sides up on the SAME day key; categories present on only one
    // side survive with a 0 count (the epsilon floor gives them a finite term).
    // Explicit dataset aliases: both sides derive from `counts`, and bare column
    // refs across such a self-join are ambiguous to the analyzer.
    val cur = counts.select(col("_day"), col("_cat"), col("_n").as("_nc")).as("_cur")
    val ref = counts.select(date_add(col("_day"), 1).as("_day"), col("_cat"),
      col("_n").as("_nr")).as("_ref")
    val joined = cur.join(ref,
        col("_cur._day") === col("_ref._day") && col("_cur._cat") <=> col("_ref._cat"),
        "full_outer")
      .select(
        coalesce(col("_cur._day"), col("_ref._day")).as("_day"),
        coalesce(col("_cur._cat"), col("_ref._cat")).as("_cat"),
        coalesce(col("_nc"), lit(0L)).as("_nc"),
        coalesce(col("_nr"), lit(0L)).as("_nr"))
    val totals = joined.groupBy(col("_day")).agg(
      sum(col("_nc")).as("_tc"), sum(col("_nr")).as("_tr"))
    joined.join(totals, Seq("_day"))
      .withColumn("_pc", smoothedShare(col("_nc"), col("_tc"), epsilon))
      .withColumn("_pr", smoothedShare(col("_nr"), col("_tr"), epsilon))
      .withColumn("_term", psiTerm(col("_pr"), col("_pc")))
      .groupBy(col("_day"))
      // A day whose reference side is empty (first day / gap) has every _term NULL
      // -> sum NULL -> psi NULL; days with data on both sides sum finite terms.
      .agg(count(lit(1)).as("n_categories"), sum(col("_term")).as("psi"),
        max(col("_tc")).as("_tcm"))
      // Days that only appear as a shifted reference (the day AFTER the last data
      // day) are join artifacts, not observations — only days with CURRENT rows
      // report.
      .filter(col("_tcm") > 0)
      .select(col("_day").as("day"), col("n_categories"), col("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over a numeric column:
    * `D = sup_x |F_ref(x) − F_cur(x)|` — the nonparametric "did the continuous
    * distribution move" monitor PSI's fixed bins can miss (a pure location shift
    * inside one wide bin is invisible to PSI; KS sees any CDF separation).
    * Returns one row `(n_ref, n_cur, ks)`; `ks` is NULL when either side has no
    * finite values (same empty-side convention as [[psi]]). NULL/NaN/±Inf values
    * are excluded — they have no place on the real line the CDF runs over.
    *
    * The supremum over all x is attained at sample points, so it equals the max
    * over DISTINCT values of the right-continuous ECDF difference — which is what
    * both this plan and any SQL re-derivation (cumulative window over grouped
    * values) compute, exactly.
    *
    * 100 TB shape: one keyed shuffle for the union's value-grouped partial-agg
    * counts, then the cumulative fold runs range-partitioned with a driver-side
    * prefix of ONE summary row per partition (the same boundary-fold strategy as
    * `Sharding.withRunningTotal` and the un-keyed monotonicity plan) and each
    * partition reports only its local max — no global sort into one task, no
    * data-scale collect, driver state bounded by the partition count.
    */
  def ksStatistic(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    // between(±MaxValue) excludes NULL, NaN, and ±Inf in one predicate (repo idiom).
    def side(df: DataFrame, s: Int) = df
      .select(col(valueCol).cast("double").as("_x"))
      .filter(col("_x").between(-Double.MaxValue, Double.MaxValue))
      .select(col("_x"), lit(s).as("_s"))
    val grouped = side(ref, 0).unionByName(side(cur, 1))
      .groupBy(col("_x"))
      .agg(sum(when(col("_s") === 0, 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_s") === 1, 1L).otherwise(0L)).as("_c2"))
    // Pin ONE materialization of the nondeterministic range partitioning — both
    // passes below must observe identical partition contents and order.
    val ranged = grouped
      .repartitionByRange(col("_x")).sortWithinPartitions(col("_x"))
      .localCheckpoint(true)
    import org.apache.spark.sql.Encoders
    // Pass 1: per-partition count totals (one row per partition).
    val stats = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var t1 = 0L; var t2 = 0L
      it.foreach { r => t1 += r.getLong(1); t2 += r.getLong(2) }
      Iterator.single((pid, t1, t2))
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong))
      .collect().sortBy(_._1)
    val n1 = stats.map(_._2).sum
    val n2 = stats.map(_._3).sum
    if (n1 == 0L || n2 == 0L)
      return Seq((n1, n2, Option.empty[Double])).toDF("n_ref", "n_cur", "ks")
    // Exclusive prefix counts per partition, then a parallel local-max fold.
    val offsets: Map[Int, (Long, Long)] = {
      var a1 = 0L; var a2 = 0L
      stats.map { case (pid, t1, t2) =>
        val e = pid -> ((a1, a2)); a1 += t1; a2 += t2; e
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val d = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var (a1, a2) = bc.value(pid)
      var best = 0.0
      it.foreach { r =>
        a1 += r.getLong(1); a2 += r.getLong(2)
        val diff = math.abs(a1.toDouble / n1 - a2.toDouble / n2)
        if (diff > best) best = diff
      }
      Iterator.single(best)
    }(Encoders.scalaDouble)
      .collect().foldLeft(0.0)(math.max)
    bc.destroy() // both passes complete; the result is a driver-local scalar
    Seq((n1, n2, Some(d))).toDF("n_ref", "n_cur", "ks")
  }

  /** Per-group two-sample KS: [[ksStatistic]] stratified by `groupCol` — one row
    * per group with side counts and the group's `D = sup|F_ref − F_cur|`; `ks` is
    * NULL where either side of the group is empty. NULL group is a real group.
    * The per-stratum view a mixed corpus needs (a value drift inside one
    * event-type/language washes out of the global statistic).
    *
    * Shape: one (group, value)-keyed count shuffle, then cumulative/total windows
    * partitioned by group on the SAME partitioning and a group rollup — no joins,
    * no global sort. Groups are entity-bounded (the grouped-window contract shared
    * with `Metrics.robustOutliersByGroup`): a single data-scale group belongs to
    * the global [[ksStatistic]]'s boundary-fold plan instead.
    */
  def ksStatisticByGroup(ref: DataFrame, cur: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    require(!Seq("n_ref", "n_cur", "ks").contains(groupCol),
      s"groupCol '$groupCol' collides with an output column name — rename it first")
    def side(df: DataFrame, s: Int) = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_x"))
      .filter(col("_x").between(-Double.MaxValue, Double.MaxValue))
      .select(col("_g"), col("_x"), lit(s).as("_s"))
    val grouped = side(ref, 0).unionByName(side(cur, 1))
      .groupBy(col("_g"), col("_x"))
      .agg(sum(when(col("_s") === 0, 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_s") === 1, 1L).otherwise(0L)).as("_c2"))
    val cum = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
      .orderBy(col("_x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    grouped
      .withColumn("_r1", sum(col("_c1")).over(cum))
      .withColumn("_r2", sum(col("_c2")).over(cum))
      .withColumn("_n1", sum(col("_c1")).over(tot))
      .withColumn("_n2", sum(col("_c2")).over(tot))
      // Guard the division PER ROW: a one-sided group's rows evaluate the ECDF
      // difference before any aggregate-level guard could apply, and ANSI mode
      // makes that a DIVIDE_BY_ZERO error, not a NULL. All-NULL rows then roll up
      // to a NULL max — exactly the wanted one-sided verdict.
      .withColumn("_d", when(col("_n1") > 0 && col("_n2") > 0,
        abs(col("_r1").cast("double") / col("_n1") -
          col("_r2").cast("double") / col("_n2"))))
      .groupBy(col("_g"))
      .agg(
        max(col("_n1")).as("n_ref"),
        max(col("_n2")).as("n_cur"),
        max(col("_d")).as("ks"))
      .withColumnRenamed("_g", groupCol)
  }

  /** PSI over a numeric column via fixed-width bins on [lo, hi) — bounds are
    * CALLER-SUPPLIED (the reference dataset's known range), keeping the binning
    * deterministic and identical on both sides; out-of-range values clamp into the
    * edge bins so new outliers register as edge-bin drift instead of vanishing.
    * NULL stays its own category, and NaN gets a dedicated bin (-1) — silently
    * clamping NaN into bin 0 (what raw floor arithmetic does) would inflate the low
    * bin and report drift that is really data corruption.
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, colName: String,
      lo: Double, hi: Double, bins: Int, epsilon: Double = 1e-6): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / bins
    def bucket(df: DataFrame) = {
      val x = col(colName).cast("double")
      df.withColumn("_bin",
        when(col(colName).isNull, lit(null))
          .when(isnan(x), lit(-1L))
          .otherwise(least(greatest(
            floor((x - lo) / width), lit(0.0)), lit((bins - 1).toDouble))
            .cast("long")))
    }
    psi(bucket(ref), bucket(cur), "_bin", epsilon)
  }

  /** [[psiNumeric]] with EQUI-DEPTH bins: edges are the REFERENCE side's exact
    * quantiles (the standard monitoring practice — decile bins of the baseline),
    * so every bin starts at ~1/buckets of the reference mass and the statistic is
    * scale-free: no lo/hi to guess, outliers can't stretch a fixed width until the
    * interesting bins collapse into one. `psi ≈ 0` then means "the current data
    * fills the reference's deciles evenly"; drift concentrates in exactly the
    * deciles that moved. Bucketing mirrors [[Metrics.equiDepthHistogram]]'s
    * interior-edge fold (values past either end land in the edge bins, registering
    * new outliers as edge drift); NULL stays its own category and NaN gets the
    * dedicated -1 bin, as in [[psiNumeric]]. A reference with no finite values has
    * no quantiles to bin by — NULL psi, same convention as an empty side.
    *
    * Shape: the edge pass is the sketch+bracket exact-quantile operator over the
    * reference (bounded scans, bounded driver state); both sides then bucket
    * row-locally (the edges are literals folded into the projection) and the PSI
    * runs over category counts — nothing data-scale shuffles.
    */
  def psiEquiDepth(ref: DataFrame, cur: DataFrame, colName: String,
      buckets: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // try_cast only: exactQuantiles applies the finite filter (and NULL/NaN
    // exclusion) itself — but its internal cast is ANSI and would THROW on
    // uncastable strings. Only the INTERIOR quantiles are requested (the 0/1
    // order statistics would be sliced away unused); buckets=1 has no interior
    // edges, so the median stands in purely as the has-any-finite-values probe.
    val refClean = ref.select(col(colName).try_cast("double").as("_v"))
    val qs = if (buckets == 1) Seq(0.5)
      else (1 until buckets).map(_.toDouble / buckets)
    graft.operators.Quantiles.exactQuantiles(refClean, "_v", qs) match {
      case None =>
        // No reference distribution: NULL psi over zero categories, the empty-side
        // convention — fabricated bins would report "no drift" about nothing.
        ref.sparkSession.range(1)
          .select(lit(null).cast("double").as("psi"), lit(0L).as("n_categories"))
      case Some(edges) =>
        val interior = if (buckets == 1) Seq.empty[Double] else edges
        def bucket(df: DataFrame) = {
          val x = col(colName).try_cast("double")
          val fold = interior.foldLeft(lit(0L))((acc, e) =>
            acc + when(x > e, 1L).otherwise(0L))
          // Uncastable values (try_cast NULL on a non-NULL original) join the NULL
          // category — numerically missing; letting them fall through would score
          // them as bin 0 and fake low-end drift.
          df.withColumn("_bin",
            when(col(colName).isNull || x.isNull, lit(null))
              .when(isnan(x), lit(-1L))
              .otherwise(least(fold, lit((buckets - 1).toLong))))
        }
        psi(bucket(ref), bucket(cur), "_bin", epsilon)
    }
  }

  /** Vocabulary novelty of a current corpus against a reference: how much of the
    * new text is built from token TYPES the reference never saw — the
    * tokenizer-OOV / topic-shift planning number that PSI-over-categories can't
    * give for an open vocabulary. One row: `(n_tokens, n_types, n_new_types,
    * new_mass)` where `new_mass` is the share of current token OCCURRENCES whose
    * type is unseen (mass-weighted — a million hits on one new token matters more
    * than a thousand hapaxes), NULL when the current side has no tokens.
    * Whitespace tokenization (`TextFunctions.tokens`), NULL/empty text contributes
    * nothing.
    *
    * Shape: map-side-combined token counts on the current side and a distinct on
    * the reference side (both shuffles bounded by vocabulary, not corpus rows),
    * then one vocab×vocab left join. AQE's skew handling covers Zipfian token
    * keys; nothing corpus-scale moves twice.
    */
  def vocabNovelty(ref: DataFrame, cur: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val refTypes = ref
      .select(explode(TextFunctions.tokens(col(textCol))).as("_t")).distinct()
      .withColumn("_seen", lit(true))
    val curCounts = cur
      .select(explode(TextFunctions.tokens(col(textCol))).as("_t"))
      .groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val tot = sum(col("_n"))
    val newMass = sum(when(col("_seen").isNull, col("_n")).otherwise(0L))
    curCounts.join(refTypes, Seq("_t"), "left")
      .agg(
        coalesce(tot, lit(0L)).as("n_tokens"),
        count(lit(1)).as("n_types"),
        coalesce(sum(when(col("_seen").isNull, 1L).otherwise(0L)), lit(0L)).as("n_new_types"),
        when(tot > 0, newMass.cast("double") / tot).as("new_mass"))
  }

  /** Embedding-space drift between two corpus snapshots: the centroid (per-
    * dimension mean) of each side, compared by L2 distance, cosine, and the
    * largest single-dimension shift — the cheap first-order "did the upstream
    * encoder / content mix move?" monitor run before expensive distributional
    * tests. Vectors with NULL elements are excluded (one NULL would silently
    * shrink that dimension's denominator and fake a shift).
    *
    * Scale: `posexplode` + a dim-keyed partial-agg mean per side — shuffle rows
    * bounded by partitions × dim, never by corpus size; the two dim-length
    * centroid frames join on the dimension index.
    */
  def embeddingShift(ref: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    def centroid(df: DataFrame) = df
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), e => e.isNull))
      .select(posexplode(col(vecCol)).as(Seq("_dim", "_e")))
      .groupBy(col("_dim"))
      .agg(avg(col("_e").cast("double")).as("_m"))
    // FULL outer on the dimension: an inner join would silently DROP dimensions
    // present on only one side — i.e. the most blatant encoder move (a dim-count
    // change) would report near-zero shift. A one-sided dimension instead
    // compares against mean 0 (its entire mass IS the shift) and the
    // ref_only/cur_only counts make the mismatch visible. Ragged vector lengths
    // WITHIN a side average each dim over the vectors that have it (documented,
    // not guarded — a per-dim denominator check would cost a second pass; the
    // one-sided counts expose the common cause).
    centroid(ref).withColumnRenamed("_m", "_mr")
      .join(centroid(cur).withColumnRenamed("_m", "_mc"), Seq("_dim"), "full_outer")
      .select(col("_mr").isNull.as("_cur_only"), col("_mc").isNull.as("_ref_only"),
        coalesce(col("_mr"), lit(0.0)).as("_mr"), coalesce(col("_mc"), lit(0.0)).as("_mc"))
      .agg(
        count(lit(1)).as("n_dims"),
        coalesce(sum(when(col("_ref_only"), 1L).otherwise(0L)), lit(0L)).as("ref_only_dims"),
        coalesce(sum(when(col("_cur_only"), 1L).otherwise(0L)), lit(0L)).as("cur_only_dims"),
        sqrt(sum(pow(col("_mr") - col("_mc"), 2.0))).as("l2_shift"),
        // NULL (not an ANSI DIVIDE_BY_ZERO) when either centroid is exactly
        // zero — e.g. one side empty — matching psi's NULL-on-empty-side.
        {
          val den = sqrt(sum(pow(col("_mr"), 2.0))) * sqrt(sum(pow(col("_mc"), 2.0)))
          when(den > 0.0, sum(col("_mr") * col("_mc")) / den).as("centroid_cosine")
        },
        max(abs(col("_mr") - col("_mc"))).as("max_dim_shift"))
  }
}
