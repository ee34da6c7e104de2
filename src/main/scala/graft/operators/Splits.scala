package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset assembly: hash-based train/validation/test splits and
  * seeded corpus shuffling — the "carve and order the corpus reproducibly" step a
  * training pipeline runs after filtering/dedup.
  *
  * Both operators are pure functions of (key, seed): membership and order are stable
  * across runs, cluster sizes, partition layouts, and engines — which is the entire
  * point (a split that shifts when the cluster resizes leaks test data into train).
  *
  * 100 TB shape: split assignment is a row-local projection (no shuffle at all —
  * writing the splits out partitioned-by-split is one `partitionBy` on the sink);
  * the shuffle operator is one global range sort, Spark's scalable
  * sample-then-range-partition path, which is the honest cost of a total order. If
  * only per-shard locality is needed, `repartition(n, u)` + `sortWithinPartitions`
  * drops the range-sampling pass.
  */
object Splits {

  private val P = 2147483647L // Mersenne prime 2^31 - 1

  /** Per-seed affine constants, mixed DRIVER-side by splitmix64 so only plain
    * affine arithmetic reaches the plan (and any SQL re-derivation). The seed picks
    * the MULTIPLIERS, not an additive offset: with a purely additive seed, two
    * seeds' hashes differ by a constant mod p — every "re-shuffle" would be an
    * exact rotation of the same circular permutation and every "re-split" a fixed
    * interval shift. Distinct multipliers make different seeds genuinely different
    * bijections. `a` constants are in [1, p-1] (0 would collapse everything to `b`).
    * Exposed (private[graft]) so oracle SQL builders embed the same constants.
    */
  private[graft] def seedConstants(seed: Long): (Long, Long, Long, Long) = {
    var x = seed
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (Math.floorMod(next(), P - 1) + 1, Math.floorMod(next(), P),
      Math.floorMod(next(), P - 1) + 1, Math.floorMod(next(), P))
  }

  /** Portable uniform hash `u ∈ [0,1)`: two affine rounds mod 2^31-1 over a numeric
    * key, with seed-derived multipliers (see [[seedConstants]] — an additive-only
    * seed would make seeds mere rotations of one permutation). Cross-engine
    * reproducible — plain integer arithmetic every SQL engine evaluates identically,
    * so a consumer can re-derive split membership outside Spark (the property
    * seed-keyed `xxhash64` cannot give you) given the seed's four constants. All
    * intermediates fit in a long: operands are < 2^31 before each multiply by a
    * < 2^31 constant. For a FIXED seed the map is an affine bijection mod p —
    * exactly uniform, ample for split assignment and order scrambling, NOT a
    * content hash (use fingerprint/xxhash64 for identity). String keys: hash them
    * to a long first and accept Spark-only reproducibility, or key on a numeric id.
    * NULL key ⇒ NULL.
    */
  def portableUniform(key: Column, seed: Long): Column = {
    val (a1, b1, a2, b2) = seedConstants(seed)
    val x0 = pmod(key.cast("long"), lit(P))
    val h1 = pmod(x0 * lit(a1) + lit(b1), lit(P))
    val h2 = pmod(h1 * lit(a2) + lit(b2), lit(P))
    h2.cast("double") / lit(P.toDouble)
  }

  /** Cumulative upper bounds for `hashSplit`'s bins, in split order (last is the
    * exact fraction sum). Exposed so an external re-derivation (e.g. an oracle SQL)
    * can embed the SAME accumulated doubles — re-summing fractions in a different
    * order/precision would move bin edges by an ulp and flip boundary keys.
    */
  def cumulativeBounds(splits: Seq[(String, Double)]): Seq[Double] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail

  /** Deterministic named splits: appends a `split` column assigning each row to the
    * first split whose cumulative upper bound exceeds `u = portableUniform(key)`.
    * Sibling surface: [[graft.operators.Sampling.hashSplit]] is the multi-column
    * xxhash64 variant (better mixing, Spark-only reproducibility, integer split
    * ids); this one trades mixing for cross-engine re-derivability and named splits.
    * The LAST split takes everything remaining (no `u < 1.0` edge to lose rows to
    * float summation). Fractions must be positive and sum to 1 (±1e-9); names must
    * be distinct. NULL key ⇒ NULL split — an unkeyed row has no deterministic
    * identity, and silently bucketing it would make membership depend on row order.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      seed: Long, splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"input already has a '$splitCol' column (re-carving a split corpus?) — " +
        "pass a different splitCol rather than silently overwriting it")
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct, got ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0), s"split fractions must be positive, got $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) <= 1e-9, s"split fractions must sum to 1, got $total")
    val u = portableUniform(col(keyCol), seed)
    val bounds = cumulativeBounds(splits)
    val assigned = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), bound), rest) =>
      when(u < bound, lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, when(col(keyCol).isNotNull, assigned))
  }

  /** Leakage-safe splits: [[hashSplit]] keyed on a GROUP REPRESENTATIVE instead of
    * the row key, so every row of a duplicate group (exact-dup fingerprint,
    * near-dup cluster label from [[Dedup]], a source-document id for chunked rows —
    * whatever `groupCol` encodes) lands in the SAME split. Splitting dup groups
    * per-row is the classic eval-contamination bug: a near-copy of a test document
    * sits in train and the eval silently inflates. Representative = `min(keyCol)`
    * within the group — deterministic, content-independent of which copy appears
    * first. Rows with a NULL `groupCol` have no group identity and split by their
    * OWN key (they are not lumped into one mega-group); a NULL representative
    * (NULL key too) yields a NULL split, matching [[hashSplit]].
    *
    * 100 TB shape: one keyed shuffle (the group-min window) then the row-local
    * assignment — same cost class as the dedup that produced the groups. Skewed
    * giant groups cost what any keyed window costs; the aggregate is a bare `min`,
    * so enabling partial aggregation via `groupBy(groupCol).agg(min)` + join is the
    * escape hatch if one group dominates (documented, not defaulted: the join
    * doubles the shuffles for the common case).
    */
  def leakageSafeSplit(df: DataFrame, keyCol: String, groupCol: String,
      splits: Seq[(String, Double)], seed: Long, splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains("_rep"),
      "input already has a '_rep' column (reserved internal name)")
    // NULL-group rows partition by their OWN key (second struct field), not into
    // one giant NULL partition — a corpus where most rows have no fingerprint
    // would otherwise funnel data-scale rows through a single window task. The
    // singleton partition's min IS the row's own key, which is the wanted
    // semantics anyway.
    val part = struct(col(groupCol), when(col(groupCol).isNull, col(keyCol)))
    val rep = min(col(keyCol))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(part))
    hashSplit(df.withColumn("_rep", rep), "_rep", splits, seed, splitCol).drop("_rep")
  }

  /** Seeded deterministic global shuffle: total order by (u, key) — the key
    * tie-break keeps the order total even on colliding hashes, so the output is a
    * permutation, bit-stable across partition layouts.
    *
    * CONTRACT: `keyCol` must uniquely identify rows — it IS the permutation
    * identity. Rows SHARING a key (or multiple NULL-key rows, which all sort last)
    * tie on the full sort key, and order within a tie is engine- and
    * partition-layout-dependent: "deterministic" holds between the distinct keys
    * only. Not checked (checking costs a scan) — same contract as
    * [[graft.operators.Sharding.withRunningTotal]]'s order column.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: Long): DataFrame =
    df.orderBy(portableUniform(col(keyCol), seed).asc_nulls_last, col(keyCol).asc_nulls_last)
}
