package graft.core

import graft.constraints._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named multi-source validation (reference: term-guard/src/core/multi_source.rs:59-333).
  *
  * Registers DataFrames under table names and accepts `"table.column"` string
  * references for cross-table checks, delegating to the explicit-DataFrame constraint
  * engine (graft's idiomatic surface — SURVEY §1). Each source is also registered as a
  * temp view, mirroring the reference's SessionContext registration, so `spark.sql`
  * can address the same names. The reference's SQL-result LRU cache is intentionally
  * absent: callers that re-validate a source repeatedly should `.cache()` the
  * DataFrame — Spark's storage layer is the right owner of that memory at cluster
  * scale, not a driver-side byte-counted map.
  */
final class MultiSourceValidator(spark: SparkSession) {

  private val sources = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** Register a DataFrame under `name` (also exposed as a temp view of that name). */
  def addSource(name: String, df: DataFrame): this.type = {
    require(name.nonEmpty && !name.contains("."),
      s"source name '$name' must be non-empty and dot-free ('.' separates table from column)")
    sources(name) = df
    df.createOrReplaceTempView(name)
    this
  }

  def addParquet(name: String, path: String): this.type =
    addSource(name, spark.read.parquet(path))
  def addCsv(name: String, path: String, header: Boolean = true): this.type =
    addSource(name, spark.read.option("header", header.toString).option("inferSchema", "true").csv(path))

  def listSources: Seq[String] = sources.keys.toSeq
  def source(name: String): DataFrame = sources.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown source '$name'; registered: ${sources.keys.mkString(", ")}"))

  /** Parse `"table.column"`; the FIRST dot splits, so dotted column names stay intact. */
  private[graft] def parseRef(s: String): (String, String) = {
    val i = s.indexOf('.')
    require(i > 0 && i < s.length - 1, s"expected 'table.column', got '$s'")
    (s.take(i), s.drop(i + 1))
  }
  /** Resolve a column name against a source the way Spark itself would: exact match
    * first, then unique case-insensitive match (spark.sql.caseSensitive defaults to
    * false — rejecting 'CustKey' for a 'custkey' column here while every delegated
    * `col(...)` would happily resolve it would be inconsistent with the plain
    * ValidationSuite path).
    */
  private def resolveColumn(table: String, c: String): String = {
    val cols = source(table).columns
    if (cols.contains(c)) c
    else cols.filter(_.equalsIgnoreCase(c)) match {
      case Array(one) => one
      case Array() => throw new IllegalArgumentException(
        s"source '$table' has no column '$c' (columns: ${cols.mkString(", ")})")
      case many => throw new IllegalArgumentException(
        s"column '$c' of source '$table' is ambiguous case-insensitively: ${many.mkString(", ")}")
    }
  }
  private def resolve(s: String): (DataFrame, String) = {
    val (t, c) = parseRef(s)
    (source(t), resolveColumn(t, c))
  }

  /** Project `df` to exactly `cols` (first-occurrence dedup), aliasing any name that
    * contains a dot or backtick to a positional safe name. The delegated constraints
    * resolve plain string names through the Column API, where '.' means NESTED-FIELD
    * access — so a flat column literally named "x.y" (which [[parseRef]] explicitly
    * supports) would either fail analysis or silently hit a real nested field. The
    * constraints only read the referenced columns, so the projection cannot change
    * semantics; when every name is already safe the frame passes through untouched.
    * Trade-off: with exotic names the constraint's failure message shows the `_msv<i>`
    * alias rather than the original name.
    */
  private def sanitize(df: DataFrame, cols: Seq[String],
      reserved: Set[String] = Set.empty): (DataFrame, Map[String, String]) = {
    val distinct = cols.distinct
    // `reserved` lets a caller force aliasing for names its delegate uses internally
    // (e.g. CrossTableSumConstraint's l_sum/r_sum output aliases — a group key with
    // that literal name would make the aggregate ambiguous).
    def unsafe(c: String) = c.contains(".") || c.contains("`") || reserved(c)
    // A reserved name ANYWHERE in the frame forces the projection, not just among the
    // requested columns: the pass-through path hands the delegate the whole frame, so
    // an unrelated column named e.g. _matched would still trip the delegate's
    // collision guard — projecting down to the requested columns drops it.
    val mustProject = distinct.exists(unsafe) || df.columns.exists(reserved)
    if (!mustProject) (df, distinct.map(c => c -> c).toMap)
    else {
      // ALL columns get positional names once any is unsafe, so an alias can never
      // collide with a passed-through original name.
      val mapping = distinct.zipWithIndex.map { case (c, i) => c -> s"_msv$i" }
      val proj = mapping.map { case (c, n) =>
        org.apache.spark.sql.functions.col(SqlIdent(c)).as(n)
      }
      (df.select(proj: _*), mapping.toMap)
    }
  }

  /** Referential integrity by name: every `childRef` value exists at `parentRef`
    * (reference: multi_source.rs FK usage over registered names).
    */
  def foreignKey(childRef: String, parentRef: String,
      ignoreNulls: Boolean = true, maxExamples: Int = 5): ConstraintResult = {
    val (child0, childCol0) = resolve(childRef)
    val (parent0, parentCol0) = resolve(parentRef)
    val (child, cm) = sanitize(child0, Seq(childCol0))
    val (parent, pm) = sanitize(parent0, Seq(parentCol0))
    ForeignKeyConstraint(parent, Seq((cm(childCol0), pm(parentCol0))), ignoreNulls, maxExamples)
      .evaluate(child)
  }

  /** Join coverage by name: fraction of `leftRef` rows with a match at `rightRef`. */
  def joinCoverage(leftRef: String, rightRef: String, mode: CoverageMode,
      assertion: Assertion): ConstraintResult = {
    val (left0, leftCol0) = resolve(leftRef)
    val (right0, rightCol0) = resolve(rightRef)
    // _matched is the constraint's internal match marker (reserved on the probe side,
    // which is left OR right depending on mode — reserve on both): without this a
    // registered source carrying an unrelated _matched column throws the constraint's
    // collision require instead of being aliased away here, like crossTableSum's
    // l_sum/r_sum.
    val reserved = Set("_matched")
    val (left, lm) = sanitize(left0, Seq(leftCol0), reserved)
    val (right, rm) = sanitize(right0, Seq(rightCol0), reserved)
    JoinCoverageConstraint(right, Seq((lm(leftCol0), rm(rightCol0))), mode, assertion)
      .evaluate(left)
  }

  /** Cross-table sum reconciliation by name: sum(leftRef) vs sum(rightRef), optionally
    * per group key pair (also `"table.column"` refs, which must address the same two
    * tables).
    */
  def crossTableSum(leftRef: String, rightRef: String, tolerance: Double = 1e-9,
      groupKeys: Seq[(String, String)] = Nil): ConstraintResult = {
    val (left0, leftCol0) = resolve(leftRef)
    val (right0, rightCol0) = resolve(rightRef)
    val (lt, _) = parseRef(leftRef); val (rt, _) = parseRef(rightRef)
    val keyCols0 = groupKeys.map { case (l, r) =>
      val (ltab, lcol) = parseRef(l); val (rtab, rcol) = parseRef(r)
      require(ltab == lt && rtab == rt,
        s"group key ($l, $r) must reference the same tables as ($leftRef, $rightRef)")
      (resolveColumn(lt, lcol), resolveColumn(rt, rcol))
    }
    // Sanitize sum + group-key columns together: the constraint resolves group keys
    // through groupBy(col(_)), where a dotted flat name would parse as nested access.
    // l_sum/r_sum are the delegate's internal aggregate aliases — force-alias them.
    val reserved = Set("l_sum", "r_sum")
    val (left, lm) = sanitize(left0, leftCol0 +: keyCols0.map(_._1), reserved)
    val (right, rm) = sanitize(right0, rightCol0 +: keyCols0.map(_._2), reserved)
    val keyCols = keyCols0.map { case (l, r) => (lm(l), rm(r)) }
    CrossTableSumConstraint(right,
      org.apache.spark.sql.functions.col(SqlIdent(lm(leftCol0))),
      org.apache.spark.sql.functions.col(SqlIdent(rm(rightCol0))), tolerance, keyCols)
      .evaluate(left)
  }

  /** Run a whole [[ValidationSuite]] against a registered source by name. */
  def validate(sourceName: String, suite: ValidationSuite): ValidationReport =
    suite.run(source(sourceName))
}
