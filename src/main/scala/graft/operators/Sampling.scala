package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for data-mixture construction: per-stratum quotas (so a
  * target language/source/domain mix can be assembled exactly) and stable hash-based
  * fraction splits (train/val/test that survive reruns, repartitioning, and
  * incremental corpus growth).
  *
  * Everything here is reproducible by construction — no `rand()`, no
  * partition-order dependence — because a sampling step that changes membership
  * between runs silently invalidates every downstream eval.
  */
object Sampling {

  /** The first `k` rows of each stratum in ascending `orderCols` order — an exact,
    * deterministic quota sample. `orderCols` must totally order rows WITHIN a stratum
    * (ties would make `row_number` partition-order-dependent); a unique id column is
    * the usual choice.
    *
    * Scale: the stratum-keyed window sorts each stratum inside one task, so a hot
    * stratum (one language at 50% of a 100 TB corpus) would sort data-scale rows in a
    * single task. `salt > 1` adds a pre-pass: per-(stratum, salt-bucket) top-k —
    * buckets assigned by hashing `orderCols`, so the pass is deterministic and
    * partition-independent — shrinks every stratum to ≤ `salt·k` rows BEFORE the
    * stratum-keyed window, which then sorts at most `salt·k` rows per stratum. The
    * result is identical for any salt (the global top-k is a subset of the union of
    * bucket top-ks); salt only re-shapes the shuffle.
    */
  def quotaPerStratum(df: DataFrame, strataCols: Seq[String], k: Int,
      orderCols: Seq[String], salt: Int = 1): DataFrame = {
    require(k > 0, s"quota k must be positive, got $k")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(strataCols.nonEmpty && orderCols.nonEmpty,
      "quotaPerStratum needs at least one stratum column and one order column")
    reserveInternal(df, if (salt <= 1) Seq("_rn") else Seq("_salt", "_rn1", "_rn"))
    val strata = strataCols.map(col)
    val order = orderCols.map(col)
    val base =
      if (salt <= 1) df
      else {
        val w1 = Window.partitionBy(strata :+ col("_salt"): _*).orderBy(order: _*)
        df.withColumn("_salt", pmod(xxhash64(order: _*), lit(salt.toLong)))
          .withColumn("_rn1", row_number().over(w1))
          .filter(col("_rn1") <= k)
          .drop("_salt", "_rn1")
      }
    val w = Window.partitionBy(strata: _*).orderBy(order: _*)
    base.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Data-mixture assembly: a DIFFERENT quota per stratum (e.g. a target
    * language/domain mix: 100k en, 30k de, 5k yo). Strata absent from `quotas` are
    * dropped; a stratum with fewer rows than its quota contributes all it has (the
    * caller can read the shortfall off the output counts). Same salted two-phase
    * shape as [[quotaPerStratum]], run at the LARGEST requested quota — per-stratum
    * trimming happens in the final filter.
    */
  def mixtureSample(df: DataFrame, strataCol: String, quotas: Map[String, Int],
      orderCols: Seq[String], salt: Int = 1): DataFrame = {
    require(quotas.nonEmpty, "mixtureSample needs at least one stratum quota")
    require(quotas.values.forall(_ > 0), s"quotas must be positive: $quotas")
    reserveInternal(df, Seq("_q_rank"))
    val kMax = quotas.values.max
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (s, k)) =>
      when(col(strataCol) === s, lit(k)).otherwise(acc)
    }
    quotaPerStratum(df.filter(col(strataCol).isin(quotas.keys.toSeq: _*)),
      Seq(strataCol), kMax, orderCols, salt)
      .withColumn("_q_rank", row_number().over(
        Window.partitionBy(col(strataCol)).orderBy(orderCols.map(col): _*)))
      .filter(col("_q_rank") <= quotaCol)
      .drop("_q_rank")
  }

  /** Stable `fraction` sample keyed on `keyCols`: a row is in iff
    * `xxhash64(keys, seed) mod 1e6 < fraction·1e6`. Membership depends only on key
    * values and seed — rerunning, repartitioning, or appending new data never flips
    * an existing row's membership (the property `rand()`-based sampling lacks).
    * Row-local, no shuffle. NULL keys hash like any other value (xxhash64 folds
    * NULL as a no-op into its seed) — stable, but give rows unique keys if NULL
    * collisions matter.
    */
  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    require(keyCols.nonEmpty, "hashSample needs at least one key column")
    df.filter(hashBucket(keyCols, seed) < (fraction * BUCKETS).toLong)
  }

  /** Disjoint deterministic splits (train/val/test): adds `split_id` = the index of
    * the weight bucket the row's key hash falls in. Weights are normalized; the same
    * key always lands in the same split under the same seed.
    *
    * Sibling surface: [[graft.operators.Splits.hashSplit]] assigns NAMED splits via
    * a portable affine hash any SQL engine re-derives (cross-engine membership);
    * this variant hashes MULTI-column keys with xxhash64 (better mixing,
    * Spark-only reproducibility). Same guarantees otherwise.
    */
  def hashSplit(df: DataFrame, keyCols: Seq[String], weights: Seq[Double],
      seed: Long = 42L, splitCol: String = "split_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), s"weights must be positive: $weights")
    require(keyCols.nonEmpty, "hashSplit needs at least one key column")
    val total = weights.sum
    // Cumulative upper bounds in bucket space; the last is forced to BUCKETS so
    // float rounding can never leave a hash value unassigned.
    val bounds = weights.scanLeft(0.0)(_ + _).tail
      .map(c => (c / total * BUCKETS).toLong)
      .updated(weights.size - 1, BUCKETS)
    val b = hashBucket(keyCols, seed)
    val splitId = bounds.zipWithIndex.reverse.foldLeft(lit(weights.size - 1)) {
      case (acc, (bound, i)) => when(b < bound, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, splitId)
  }

  /** Temperature-scaled mixture weights over strata (the multilingual/multi-source
    * rebalance rule, XLM-R-style: `p_i ∝ n_i^alpha`): one row per stratum with its
    * size, normalized sampling weight, and `expected_epochs` = how many times the
    * stratum repeats when drawing `budgetRows` rows from the reweighted mixture —
    * the overfit-risk number mixture designers actually watch (>1 means the stratum
    * up-samples). `alpha = 1` is proportional (no rebalance); `alpha → 0`
    * approaches uniform; `alpha ∈ (0,1)` up-samples small strata.
    *
    * A NULL stratum is a real group (its rows exist and consume budget) and
    * surfaces as a NULL-keyed row — dropping it would silently misnormalize every
    * other weight.
    *
    * Scale: one stratum-keyed count (map-side combined), then arithmetic over the
    * strata-sized frame with the normalizer riding in as a broadcast single-row
    * frame — the corpus is scanned once, nothing data-scale shuffles.
    */
  def temperatureWeights(df: DataFrame, strataCol: String, alpha: Double,
      budgetRows: Long): DataFrame = {
    require(alpha > 0, s"temperature alpha must be positive, got $alpha")
    require(budgetRows >= 0, s"budgetRows must be >= 0, got $budgetRows")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_rows"))
    val z = counts.agg(
      sum(pow(col("n_rows").cast("double"), lit(alpha))).as("_z"))
    counts.crossJoin(broadcast(z))
      .withColumn("weight",
        pow(col("n_rows").cast("double"), lit(alpha)) / col("_z"))
      .withColumn("expected_epochs",
        col("weight") * lit(budgetRows.toDouble) / col("n_rows").cast("double"))
      .select(col(strataCol), col("n_rows"), col("weight"), col("expected_epochs"))
  }

  /** `withColumn` on an existing name silently REPLACES the caller's column and the
    * trailing `drop` then deletes it — same reserved-column convention as
    * `chunkByTokens`/`sessionize`/`withRunningTotal`.
    */
  private def reserveInternal(df: DataFrame, names: Seq[String]): Unit =
    names.foreach { n =>
      require(!df.columns.contains(n),
        s"input already has a column named '$n' (reserved internal name)")
    }

  private val BUCKETS = 1000000L

  private def hashBucket(keyCols: Seq[String], seed: Long) =
    pmod(xxhash64((lit(seed) +: keyCols.map(col)): _*), lit(BUCKETS))
}
