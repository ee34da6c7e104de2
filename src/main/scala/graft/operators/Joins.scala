package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix (e.g. a handful of hot keys joining
  * a dimension too big to broadcast). Built-in strategies first — `broadcast()` for
  * small sides, AQE skew-join for moderate skew — salting is the explicit fallback.
  */
object Joins {

  /** Equi-join with the fact side salted across `saltFactor` sub-keys and the
    * dimension side replicated once per salt value. Every hot fact key fans out over
    * `saltFactor` shuffle partitions instead of hammering one; the dimension grows by
    * `saltFactor`×, so use only when it is far smaller than the fact table but above
    * the broadcast threshold. Row-level salt comes from `monotonically_increasing_id`
    * (deterministic, key-independent — hashing the key itself would put every copy of
    * a hot key back in one partition).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[(String, String)],
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(!facts.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column — it would be silently overwritten and dropped")
    // Replicating the dim side saltFactor× is only sound for join types that never
    // emit unmatched DIM rows: right/full outer would return every unmatched dim row
    // once per salt replica — silently wrong results.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins only, got '$joinType' — " +
        "right/full outer would emit each unmatched dim row saltFactor times")
    val saltedFacts = facts.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    val cond = (keys.map { case (f, d) => saltedFacts(f) === saltedDim(d) } :+
      (saltedFacts("_salt") === saltedDim("_salt"))).reduce(_ && _)
    val joined = saltedFacts.join(saltedDim, cond, joinType)
      .drop(saltedDim("_salt")).drop(saltedFacts("_salt"))
    keys.map(_._2).foldLeft(joined)((df, d) => df.drop(saltedDim(d)))
  }

  /** Range (interval-containment) join: pair every point row with every interval row
    * whose `[start, end]` contains the point — without the
    * BroadcastNestedLoopJoin/cartesian plan Spark picks for a raw inequality
    * condition (quadratic compares: every point against every interval).
    *
    * Strategy: discretize the domain into `binWidth`-sized bins. Each interval
    * EXPLODES to the bins it covers; each point has exactly ONE bin; an equi-join on
    * the bin then only compares points against intervals overlapping their bin, and
    * the exact containment filter removes same-bin non-matches. A (point, interval)
    * pair can only meet in the point's single bin, so no dedup pass is needed.
    * Cost: one hash shuffle on the bin key of |points| + Σ spans/binWidth rows —
    * shuffle-linear, never pair-quadratic.
    *
    * `binWidth` tunes the trade: small bins → more interval replicas, less
    * filtering; large bins → few replicas, more same-bin false compares. Set it near
    * the TYPICAL interval length. An interval spanning more than `maxBinsPerInterval`
    * bins fails loud (a single giant interval would otherwise replicate itself across
    * the whole axis — at corpus scale that is an accidental cross join; raise
    * `binWidth` or split the outlier interval).
    *
    * Semantics: inner join, containment inclusive on both ends (`start <= p <= end`).
    * NULL or non-finite (NaN/±Inf) points and bounds, and inverted intervals
    * (`end < start`), match nothing — a NaN bound would otherwise both dodge the
    * span guard (NaN-is-largest makes `end >= start` true while `binOf(NaN)` casts
    * to 0, turning the span negative) and diverge from SQL `p <= NaN` semantics.
    * Time columns: pass numeric columns (cast timestamps to epoch seconds up front —
    * keeps binning arithmetic exact and engine-portable).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Double,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "input already has a _bin column (reserved internal name)")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"column name collision between sides: ${overlap.mkString(", ")} — rename before joining")
    def binOf(c: Column) = floor(c / binWidth).cast("long")
    // between(±MaxValue) excludes NULL, NaN, and ±Inf in one predicate (repo idiom).
    def finite(c: Column) = c.between(-Double.MaxValue, Double.MaxValue)
    val p = points.filter(finite(col(pointCol)))
      .withColumn("_bin", binOf(col(pointCol)))
    val spanBins = binOf(col(endCol)) - binOf(col(startCol)) + 1L
    val iv = intervals
      .filter(finite(col(startCol)) && finite(col(endCol)) &&
        col(endCol) >= col(startCol))
      // Fail IN THE TASK, not after a collect: raise_error inside the projection
      // stops the job the moment one runaway interval appears. Both guard ends:
      // a span outside [1, max] means either a runaway interval or arithmetic
      // corruption — never something to join through silently.
      .withColumn("_bin", explode(sequence(
        when(spanBins.between(1L, maxBinsPerInterval), binOf(col(startCol)))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins of width $binWidth ("),
            spanBins, lit(" bins) — raise binWidth or split the interval")))),
        binOf(col(endCol)))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
