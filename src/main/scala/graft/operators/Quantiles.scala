package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles (`percentile_cont` semantics — linear interpolation at
  * rank `q*(n-1)`; nulls, NaN, and ±Infinity excluded: quantiles are defined over the
  * FINITE values — NaN has no rank, and an infinite interpolation endpoint makes the
  * result meaningless rather than approximate).
  *
  * Spark's built-in exact `percentile` builds a per-partition value→count OpenHashMap
  * and merges ALL of them in a single reduce task; on a high-cardinality column the
  * merge serializes the whole distinct-value set through one task (~6 s for 600 k
  * distinct doubles at sf0.1 — unusable at 100 TB). The reference's exact quantile
  * (term-guard/src/constraints/quantile.rs:228-241) sorts on one node, same wall.
  *
  * This operator instead runs a bounded number of cheap, fully-parallel passes:
  *
  *   1. ONE scan: `count` + a GK `percentile_approx` sketch probed at `q ± εq`
  *      (mergeable partial agg — no value set ever crosses the shuffle).
  *   2. The sketch's rank guarantee (error ≤ n/accuracy) brackets each target rank
  *      inside a narrow value interval `[lo, hi]`. ONE scan computes, exactly,
  *      `cnt(v < lo)` and `cnt(lo ≤ v ≤ hi)` for every bracket (conditional sums in
  *      one agg). A rank is *assigned* to a bracket only when those exact counts prove
  *      coverage — correctness never rests on the sketch; an uncovered rank re-probes
  *      8× wider (≤ 2 retries, unreachable unless the GK bound is violated).
  *   3. Bracket population is ~2εn + ties. If ≤ `collectThreshold`: ONE filtered scan
  *      collects only bracketed values, sorted and rank-indexed on the driver.
  *      Degenerate brackets (`lo == hi`, a mega-tie) are answered with no collect at
  *      all; oversized brackets recurse on the filtered subset (shrink factor
  *      ~10/accuracy per level — depth 4 covers far beyond 1e12 rows at defaults).
  *
  * Driver memory is bounded by `collectThreshold` doubles per bracket regardless of
  * input size; every full-data pass is an embarrassingly-parallel scan with a
  * constant-size shuffle (partial aggs only).
  */
object Quantiles {

  /** Exact `percentile_cont(q)` for each q in `qs` over `df(column)`.
    * Returns None when the column has no non-null, non-NaN values.
    *
    * @param accuracy         GK sketch inverse relative error (rank error ≤ n/accuracy)
    * @param collectThreshold max doubles collected to the driver per bracket; also the
    *                         size at which a (sub)set is sorted locally instead
    */
  def exactQuantiles(df: DataFrame, column: String, qs: Seq[Double],
      accuracy: Int = 10000, collectThreshold: Int = 1 << 20): Option[Seq[Double]] = {
    require(qs.nonEmpty, "at least one quantile required")
    require(qs.forall(q => q >= 0.0 && q <= 1.0), "quantiles must be in [0,1]")
    require(accuracy >= 100, "accuracy must be >= 100")
    require(collectThreshold >= 16, "collectThreshold must be >= 16")
    // between(±MaxValue) excludes NULL, NaN (NaN fails <=), and ±Inf in one predicate.
    val vals = df.select(col(column).cast("double").as("v"))
      .filter(col("v").between(-Double.MaxValue, Double.MaxValue))

    // Pass 1: n + sketch probes in one scan. Margins are in quantile space here (n is
    // unknown until the scan returns); the exact-count check in selectRanks is what
    // guarantees correctness, so a too-tight margin only costs a widened retry — and
    // the sketch path is only taken when n > collectThreshold >> accuracy, where
    // 4/accuracy in quantile space is >> the ±2 ranks interpolation needs.
    val eq = 4.0 / accuracy
    val merged = mergeIntervals(qs.map(q => (math.max(0.0, q - eq), math.min(1.0, q + eq))))
    val probes = merged.flatMap { case (lo, hi) => Seq(lo, hi) }
    val row = vals.agg(
      count(col("v")).as("n"),
      percentile_approx(col("v"), array(probes.map(lit): _*), lit(accuracy)).as("sk")).head()
    val n = row.getLong(0)
    if (n == 0L) return None

    // 1-based ranks needed for interpolation at r = q*(n-1).
    val ranks = qs.flatMap { q =>
      val r = q * (n - 1).toDouble
      val k1 = math.floor(r).toLong + 1
      if (r == math.floor(r)) Seq(k1) else Seq(k1, k1 + 1)
    }.distinct.sorted

    val byRank: Map[Long, Double] =
      if (n <= collectThreshold) {
        val arr = vals.collect().map(_.getDouble(0))
        java.util.Arrays.sort(arr)
        ranks.map(k => k -> arr((k - 1).toInt)).toMap
      } else {
        val sk = row.getSeq[Double](1)
        val brackets = merged.indices.map(i => (sk(2 * i), sk(2 * i + 1)))
        selectRanks(vals, n, ranks, brackets, accuracy, collectThreshold, depth = 4)
      }

    Some(qs.map { q =>
      val r = q * (n - 1).toDouble
      val k1 = math.floor(r).toLong + 1
      val f = r - math.floor(r)
      val v1 = byRank(k1)
      if (f == 0.0) v1 else v1 + f * (byRank(k1 + 1) - v1)
    })
  }

  /** Single-quantile convenience. */
  def exactQuantile(df: DataFrame, column: String, q: Double,
      accuracy: Int = 10000, collectThreshold: Int = 1 << 20): Option[Double] =
    exactQuantiles(df, column, Seq(q), accuracy, collectThreshold).map(_.head)

  /** Exact rank selection over `vals` (single double column "v", `n` rows > 0):
    * the value at each 1-based rank in `ranks`. `brackets0` are candidate value
    * intervals from a sketch; exact conditional counts both verify coverage and
    * assign ranks to brackets, widening the probes when a rank is uncovered.
    */
  private def selectRanks(vals: DataFrame, n: Long, ranks: Seq[Long],
      brackets0: Seq[(Double, Double)], accuracy: Int, collectThreshold: Int,
      depth: Int): Map[Long, Double] = {
    require(depth > 0, s"quantile bracket recursion exhausted (n=$n)")

    var brackets = brackets0
    var counts: Seq[(Long, Long)] = Seq.empty // (cntBelow, cntInside) per bracket
    var assign: Map[Long, Int] = Map.empty    // rank -> covering bracket index
    var attempt = 0
    var done = false
    while (!done) {
      // Exact conditional counts for every bracket in ONE agg scan.
      val aggs: Seq[Column] = brackets.flatMap { case (lo, hi) =>
        Seq(
          coalesce(sum(when(col("v") < lo, 1L)), lit(0L)),
          coalesce(sum(when(col("v") >= lo && col("v") <= hi, 1L)), lit(0L)))
      }
      val r = vals.agg(aggs.head, aggs.drop(1): _*).head()
      counts = brackets.indices.map(i => (r.getLong(2 * i), r.getLong(2 * i + 1)))
      // A rank belongs to any bracket whose exact counts prove it contains the rank.
      val maybe = ranks.map { k =>
        k -> brackets.indices.find { i =>
          val (lt, in) = counts(i); lt < k && k <= lt + in
        }
      }
      if (maybe.forall(_._2.isDefined)) {
        assign = maybe.map { case (k, i) => k -> i.get }.toMap
        done = true
      } else {
        attempt += 1
        require(attempt <= 2,
          "sketch brackets failed to cover target ranks after widening — " +
            "violated GK error bound (bug)")
        // Re-probe 8x wider in rank space (n is known here).
        val er = math.max(8.0 * attempt * 4.0 * n / accuracy, 8.0)
        val m = mergeIntervals(ranks.map { k =>
          (math.max(0.0, (k - er) / n), math.min(1.0, (k + er) / n))
        })
        val probes = m.flatMap { case (lo, hi) => Seq(lo, hi) }
        val sk = vals.agg(
          percentile_approx(col("v"), array(probes.map(lit): _*), lit(accuracy)))
          .head().getSeq[Double](0)
        brackets = m.indices.map(i => (sk(2 * i), sk(2 * i + 1)))
      }
    }

    val result = scala.collection.mutable.Map.empty[Long, Double]
    val byBracket = ranks.groupBy(assign)

    // Mega-tie brackets (lo == hi): every rank inside IS that value — no collect.
    val (tiny, rest) = byBracket.partition { case (i, _) => brackets(i)._1 == brackets(i)._2 }
    tiny.foreach { case (i, ks) => ks.foreach(k => result(k) = brackets(i)._1) }

    val (collectable, oversized) =
      rest.partition { case (i, _) => counts(i)._2 <= collectThreshold }

    // ONE filtered scan collects the values of all small brackets together. A value on
    // a shared boundary may belong to several brackets — it is routed to each on the
    // driver, so per-bracket local ranks stay exact.
    if (collectable.nonEmpty) {
      val idxs = collectable.keys.toSeq.sorted
      val cond = idxs.map { i =>
        val (lo, hi) = brackets(i); col("v") >= lo && col("v") <= hi
      }.reduce(_ || _)
      val arr = vals.filter(cond).collect().map(_.getDouble(0))
      idxs.foreach { i =>
        val (lo, hi) = brackets(i)
        val sub = arr.filter(v => v >= lo && v <= hi)
        java.util.Arrays.sort(sub)
        val below = counts(i)._1
        collectable(i).foreach(k => result(k) = sub((k - below - 1).toInt))
      }
    }

    // Oversized brackets (massive ties over a non-degenerate interval, or a violated
    // sketch bound): recurse on the filtered subset with shifted ranks.
    oversized.foreach { case (i, ks) =>
      val (lo, hi) = brackets(i)
      val (below, inside) = counts(i)
      val sub = vals.filter(col("v") >= lo && col("v") <= hi)
      val subRanks = ks.map(_ - below)
      val subMap: Map[Long, Double] =
        if (inside <= collectThreshold) { // unreachable (partition above) — belt
          val arr = sub.collect().map(_.getDouble(0))
          java.util.Arrays.sort(arr)
          subRanks.map(k => k -> arr((k - 1).toInt)).toMap
        } else {
          val er = math.max(4.0 * inside / accuracy, 8.0)
          val m = mergeIntervals(subRanks.map { k =>
            (math.max(0.0, (k - er) / inside), math.min(1.0, (k + er) / inside))
          })
          val probes = m.flatMap { case (l, h) => Seq(l, h) }
          val sk = sub.agg(
            percentile_approx(col("v"), array(probes.map(lit): _*), lit(accuracy)))
            .head().getSeq[Double](0)
          val subBrackets = m.indices.map(j => (sk(2 * j), sk(2 * j + 1)))
          selectRanks(sub, inside, subRanks, subBrackets, accuracy, collectThreshold,
            depth - 1)
        }
      ks.foreach(k => result(k) = subMap(k - below))
    }

    result.toMap
  }

  /** Merge overlapping closed intervals; input need not be sorted. */
  private def mergeIntervals(xs: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val sorted = xs.sortBy(_._1)
    sorted.tail.foldLeft(Vector(sorted.head)) { case (acc, (lo, hi)) =>
      val (plo, phi) = acc.last
      if (lo <= phi) acc.init :+ (plo, math.max(phi, hi)) else acc :+ (lo, hi)
    }
  }
}
