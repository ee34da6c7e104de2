package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot dataset diff — the "what changed between corpus v1 and v2"
  * QA step before retraining on a refreshed dataset: per-row status
  * (added / removed / changed / unchanged) and per-column change accounting.
  *
  * Semantics:
  *  - `keys` identify rows across snapshots and must be UNIQUE per snapshot (a
  *    PK-style contract, not checked — checking costs a scan; run a PrimaryKey
  *    constraint first if unsure). Duplicate keys would cross-join inside the diff
  *    and inflate every count.
  *  - NULL-keyed rows identify nothing and are EXCLUDED from both sides (surface
  *    them with a completeness constraint instead; silently matching NULL to NULL
  *    would pair unrelated rows).
  *  - Column comparison is null-safe (`<=>`): NULL → NULL is unchanged,
  *    NULL → value is a change.
  *
  * 100 TB shape: ONE key-partitioned full-outer join (inherent — a diff must
  * co-locate both versions of each key; bucket both snapshots by the key to make
  * it exchange-free), with compared columns projected before the join and all
  * rollups map-side-combined aggregations of the joined frame.
  */
object SnapshotDiff {

  /** Per-row diff: `keys`, `diff_status` ∈ added|removed|changed|unchanged, and one
    * `changed_<col>` flag per compared column (true/false when the row exists in
    * both snapshots, NULL for added/removed rows — there is nothing to compare).
    */
  def rowDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "rowDiff needs at least one key column")
    require(compareCols.nonEmpty, "rowDiff needs at least one column to compare")
    require(keys.intersect(compareCols).isEmpty,
      s"key columns cannot also be compared: ${keys.intersect(compareCols)}")
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    def side(df: DataFrame, tag: String): DataFrame =
      df.filter(keyNotNull).select(
        keys.map(col) ++
          compareCols.map(c => col(c).as(s"_${tag}_$c")) :+
          lit(true).as(s"_in_$tag"): _*)
    val joined = side(oldDf, "old").join(side(newDf, "new"), keys, "full_outer")
    val inBoth = col("_in_old").isNotNull && col("_in_new").isNotNull
    val colChanged = compareCols.map { c =>
      c -> !(col(s"_old_$c") <=> col(s"_new_$c"))
    }
    val anyChanged = colChanged.map(_._2).reduce(_ || _)
    val status = when(col("_in_old").isNull, "added")
      .when(col("_in_new").isNull, "removed")
      .when(anyChanged, "changed")
      .otherwise("unchanged")
    joined.select(
      (keys.map(col) :+ status.as("diff_status")) ++
        colChanged.map { case (c, chg) => when(inBoth, chg).as(s"changed_$c") }: _*)
  }

  /** One-scan summary: row counts per status plus per-column changed counts.
    * Single row; everything map-side-combined over the joined frame.
    */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val d = rowDiff(oldDf, newDf, keys, compareCols)
    def n(st: String) =
      coalesce(sum(when(col("diff_status") === st, 1L).otherwise(0L)), lit(0L))
    val aggs =
      Seq("added", "removed", "changed", "unchanged").map(st => n(st).as(s"n_$st")) ++
        compareCols.map(c => coalesce(
          sum(when(col(s"changed_$c"), 1L).otherwise(0L)), lit(0L)).as(s"n_changed_$c"))
    d.agg(aggs.head, aggs.tail: _*)
  }
}
