package graft.analyzers

import graft.core._
import graft.constraints._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Profile-driven constraint suggestion
  * (reference: term-guard/src/analyzers/suggestions.rs:95-410).
  */
final case class ConstraintSuggestion(
    column: String,
    description: String,
    confidence: Double,
    rule: String,
    constraint: Constraint)

trait SuggestionRule {
  def name: String
  def apply(profile: ColumnProfile): Seq[ConstraintSuggestion]
}

object SuggestionRules {

  object CompletenessRule extends SuggestionRule {
    val name = "completeness"
    def apply(p: ColumnProfile): Seq[ConstraintSuggestion] =
      if (p.totalCount == 0) Nil
      else if (p.completeness >= 1.0)
        Seq(ConstraintSuggestion(p.column, s"${p.column} is never null", 0.95, name,
          CompletenessConstraint.complete(p.column)))
      else if (p.completeness >= 0.9)
        Seq(ConstraintSuggestion(p.column,
          // Locale.ROOT (same rule as Formatters): the f interpolator renders 97,5 on
          // comma-decimal default locales, making descriptions deployment-dependent.
          s"${p.column} is ${String.format(java.util.Locale.ROOT, "%.1f",
            Double.box(p.completeness * 100))}% complete", 0.7, name,
          CompletenessConstraint(p.column,
            Assertion.GreaterThanOrEqual(math.floor(p.completeness * 100) / 100 * 0.95))))
      else Nil
  }

  object UniquenessRule extends SuggestionRule {
    val name = "uniqueness"
    def apply(p: ColumnProfile): Seq[ConstraintSuggestion] =
      // distinctness from a 1%-rsd HLL sketch; margin keeps the suggested threshold
      // below the sketch's error band so the constraint holds on the profiled data.
      if (p.totalCount > 0 && p.nullCount == 0 && p.distinctness >= 0.97)
        Seq(ConstraintSuggestion(p.column, s"${p.column} looks like a unique key", 0.8, name,
          UniquenessConstraint(Seq(p.column),
            Assertion.GreaterThanOrEqual(math.min(1.0, p.distinctness - 0.03)))))
      else Nil
  }

  object ContainmentRule extends SuggestionRule {
    val name = "containment"
    def apply(p: ColumnProfile): Seq[ConstraintSuggestion] =
      p.histogram match {
        case Some(h) if h.buckets.nonEmpty && h.buckets.size <= 20 =>
          Seq(ConstraintSuggestion(p.column,
            s"${p.column} takes ${h.buckets.size} values", 0.85, name,
            ComplianceConstraint.containedIn(p.column, h.buckets.keys.toSeq.sorted)))
        case _ => Nil
      }
  }

  object RangeRule extends SuggestionRule {
    val name = "range"
    def apply(p: ColumnProfile): Seq[ConstraintSuggestion] =
      p.numeric match {
        case Some(n) if !n.min.isNaN && !n.max.isNaN =>
          val pad = math.max((n.max - n.min) * 0.1, 1e-9)
          Seq(ConstraintSuggestion(p.column,
            s"${p.column} observed in [${n.min}, ${n.max}]", 0.6, name,
            MultiStatisticConstraint(p.column, Seq(
              Stat.Min -> Assertion.GreaterThanOrEqual(n.min - pad),
              Stat.Max -> Assertion.LessThanOrEqual(n.max + pad)))))
        case _ => Nil
      }
  }

  object TypeRule extends SuggestionRule {
    val name = "datatype"
    def apply(p: ColumnProfile): Seq[ConstraintSuggestion] =
      p.inferredType match {
        case Some(t) if t.dataType != "text" && t.dataType != "unknown" && t.confidence >= 0.95 =>
          Seq(ConstraintSuggestion(p.column,
            s"${p.column} values parse as ${t.dataType} (${String.format(
              java.util.Locale.ROOT, "%.0f", Double.box(t.confidence * 100))}%)", t.confidence, name,
            TypeConsistencyConstraint(p.column, 0.9, Some(t.dataType))))
        case _ => Nil
      }
  }

  val all: Seq[SuggestionRule] =
    Seq(CompletenessRule, UniquenessRule, ContainmentRule, RangeRule, TypeRule)
}

/** Profile → ranked suggestions → runnable Check (reference: suggestions.rs:143-218). */
final class SuggestionEngine(
    rules: Seq[SuggestionRule] = SuggestionRules.all,
    minConfidence: Double = 0.5,
    // Suggestions need the tight (1% rsd) distinct sketch: UniquenessRule's
    // gate/margin (0.97 / 0.03) sit inside that error band. Plain profiling keeps the
    // cheaper default rsd.
    profiler: ColumnProfiler = new ColumnProfiler(ProfilerConfig(approxDistinctRsd = 0.01))) {

  def suggest(df: DataFrame, columns: Seq[String] = Nil): Seq[ConstraintSuggestion] = {
    val profiles = profiler.profile(df, columns)
    profiles.values.toSeq.sortBy(_.column)
      .flatMap(p => rules.flatMap(_.apply(p)))
      .filter(_.confidence >= minConfidence)
      .sortBy(-_.confidence)
  }

  def suggestionsToCheck(suggestions: Seq[ConstraintSuggestion],
      description: String = "suggested constraints", level: Level = Level.Warning): Check =
    Check(description, level, suggestions.map(_.constraint))
}

/** Cross-table FK/join suggestion by name/type match + overlap probe
  * (reference: analyzers/schema_analyzer.rs:51-661). An optional [[graft.core.StatsCache]]
  * carries the per-(table, column) key-likeness and count probes ACROSS invocations —
  * a scheduled sweep re-analyzing slowly-changing tables skips every probe job still
  * inside the TTL. Keys are caller-supplied table names, so callers re-binding a name
  * to different data within the TTL should pass a fresh cache (heuristic surface only).
  */
final class SchemaAnalyzer(minOverlap: Double = 0.95,
    statsCache: Option[graft.core.StatsCache] = None) {
  final case class FkCandidate(childTable: String, childColumn: String,
      parentTable: String, parentColumn: String, overlap: Double)

  def suggestForeignKeys(tables: Map[String, DataFrame]): Seq[FkCandidate] = {
    val keyish = for {
      (tname, df) <- tables.toSeq
      f <- df.schema.fields
      if f.name.endsWith("key") || f.name.endsWith("_id") || f.name == "id"
    } yield (tname, f.name, f.dataType)

    // isKeyLike and the child's non-null count are Spark jobs depending only on
    // (table, column) — memoize both or T×K keyish columns cost O((TK)²) redundant
    // jobs across the candidate pairs. With a StatsCache, the memo also spans
    // invocations (TTL-bounded) and INCLUDES the per-pair overlap semi-join — the
    // dominant sweep cost — so re-running over slowly-changing tables is job-free.
    // Cache keys join the name parts with NUL (a dot would make ("a", "b.c") and
    // ("a.b", "c") collide — table names here are arbitrary caller map keys).
    def ckey(parts: String*) = parts.mkString("\u0000")
    val keyLikeCache = scala.collection.mutable.Map.empty[(String, String), Boolean]
    val childCountCache = scala.collection.mutable.Map.empty[(String, String), Long]
    def cachedKeyLike(pt: String, pc: String, parent: DataFrame): Boolean =
      keyLikeCache.getOrElseUpdate((pt, pc), statsCache match {
        case Some(sc) =>
          sc.getOrCompute(ckey("keylike", pt, pc))(
            if (isKeyLike(parent, pc)) 1.0 else 0.0) == 1.0
        case None => isKeyLike(parent, pc)
      })
    def cachedChildCount(ct: String, cc: String, child: DataFrame): Long =
      childCountCache.getOrElseUpdate((ct, cc), statsCache match {
        case Some(sc) =>
          sc.getOrCompute(ckey("nonnull", ct, cc))(
            child.filter(col(cc).isNotNull).count().toDouble).toLong
        case None => child.filter(col(cc).isNotNull).count()
      })
    def cachedOverlap(ct: String, cc: String, pt: String, pc: String,
        child: DataFrame, parent: DataFrame, total: Long): Double = statsCache match {
      case Some(sc) =>
        sc.getOrCompute(ckey("overlap", ct, cc, pt, pc))(overlap(child, cc, parent, pc, total))
      case None => overlap(child, cc, parent, pc, total)
    }
    for {
      (ct, cc, cdt) <- keyish
      (pt, pc, pdt) <- keyish
      if ct != pt && cdt == pdt && nameAffinity(cc, pc)
      child = tables(ct)
      parent = tables(pt)
      // parent column must look like a key (distinct) and child values must overlap it
      if cachedKeyLike(pt, pc, parent)
      total = cachedChildCount(ct, cc, child)
      ov = cachedOverlap(ct, cc, pt, pc, child, parent, total)
      if ov >= minOverlap
    } yield FkCandidate(ct, cc, pt, pc, ov)
  }

  /** "o_custkey" → "custkey" matches "c_custkey" → "custkey". */
  private def nameAffinity(a: String, b: String): Boolean = {
    def stem(s: String) = s.replaceAll("^[a-z]{1,2}_", "")
    stem(a) == stem(b)
  }

  private def isKeyLike(df: DataFrame, c: String): Boolean = {
    val r = df.agg(count(col(c)), approx_count_distinct(col(c))).head()
    r.getLong(0) > 0 && r.getLong(1).toDouble / r.getLong(0) >= 0.9
  }

  private def overlap(child: DataFrame, cc: String, parent: DataFrame, pc: String,
      total: Long): Double = {
    if (total == 0) return 0.0
    // Alias both sides: the unaliased child(cc) === parent(pc) condition resolves to
    // the same attribute when both names map to one underlying DataFrame (the same
    // frame registered twice, or a filter of the other) and Spark's default
    // failAmbiguousSelfJoin kills the whole suggestion sweep with AMBIGUOUS_SELF_JOIN.
    val c = child.filter(col(graft.core.SqlIdent(cc)).isNotNull).alias("_sac")
    val p = parent.select(col(graft.core.SqlIdent(pc))).distinct().alias("_sap")
    // SqlIdent: the names come from df.columns, so a literal dot/backtick must stay
    // one identifier under the alias qualifier.
    val matched = c.join(p,
      col(s"_sac.${graft.core.SqlIdent(cc)}") === col(s"_sap.${graft.core.SqlIdent(pc)}"),
      "left_semi").count()
    matched.toDouble / total
  }
}
