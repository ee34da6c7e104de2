package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, the LATEST right row at or before
  * the left row's time (backward; `forward` flips to earliest-at-or-after) — the
  * enrich-events-with-most-recent-state join (prices at trade time, feature snapshots
  * at label time) that Spark has no native operator for.
  *
  * NOT a sort-merge translation of a single-node engine: both paths are declarative
  * union-then-carry plans, so there is never a per-left-row probe and never an
  * inequality-join explosion (a naive `l.t >= r.t` range join materializes the full
  * triangle — quadratic pairs — before picking the max; this never builds pairs at
  * all).
  *
  * - Keyed path: union both sides, one hash shuffle on the key, per-key window
  *   carry-forward of the most recent right payload. Cost = one shuffle of
  *   |L| + |R| rows; skew follows the key distribution exactly like any keyed
  *   window (salt upstream if one key dominates).
  * - Un-keyed path (`keys = Nil`): the same carry-forward WITHOUT a single-task
  *   global window — range-repartition the union on time so partition i holds
  *   earlier rows than i+1, carry within each partition in parallel, and seed each
  *   partition with the latest right row of all PRECEDING partitions (a per-partition
  *   summary fold, one row per shuffle partition — same strategy as the distributed
  *   un-keyed monotonicity/gap plans in [[graft.constraints]]).
  *
  * Semantics (pandas `merge_asof` / DuckDB `ASOF JOIN`, left-outer flavor):
  * every left row survives; unmatched ⇒ NULL payload. Backward match is INCLUSIVE
  * (`right.t <= left.t`). Left rows with a NULL time never match (no position in the
  * order); right rows with a NULL time are dropped (they are not "before" anything).
  * Ties among right rows at one instant are broken by the LAST payload column order
  * after a deterministic sort on the payload columns — callers wanting a specific
  * winner should pre-aggregate right to unique times (documented, matching the
  * ambiguity every as-of engine has on duplicate right times).
  *
  * `tolerance`: a maximum staleness — a match older than `left.t - tolerance`
  * (e.g. `expr("INTERVAL 1 HOUR")` for timestamps, a numeric literal for numeric
  * times) is discarded (payload NULLed), like `merge_asof(tolerance=...)`.
  *
  * NULL equi-keys: a window partition groups NULL keys TOGETHER (NULL-keyed left
  * rows match NULL-keyed right rows), unlike a SQL equi-join where NULL never
  * equals NULL. Filter NULL keys out first if SQL semantics are wanted.
  */
object AsOf {

  /** @param left     driving side; every row appears exactly once in the output
    * @param right    lookup side; its `payload` columns are appended to matching left rows
    * @param keys     equi-key columns present on BOTH sides (`Nil` ⇒ global as-of)
    * @param leftTime left ordering column (timestamp or numeric)
    * @param rightTime right ordering column, same type family as `leftTime`
    * @param payload  right columns to carry onto the left (must not clash with left)
    * @param matchedTimeCol also emit the matched right time under this name
    * @param forward  match the EARLIEST right at-or-after instead (inclusive)
    * @param tolerance max |left.t - right.t| for a match to count
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      matchedTimeCol: Option[String] = None,
      forward: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one right payload column")
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload columns ${clash.mkString(", ")} already exist on the left side — rename before joining")
    val reserved = Seq("_t", "_side", "_m", "_mt", "__mt") ++ matchedTimeCol.toSeq
    val bad = reserved.filter(n => left.columns.contains(n) || payload.contains(n))
    require(bad.isEmpty, s"reserved column name(s) in use: ${bad.mkString(", ")}")
    require(keys.forall(k => left.columns.contains(k) && right.columns.contains(k)),
      s"keys ${keys.mkString(", ")} must exist on both sides")

    // Fail loud on a time-type mismatch: a silent cast (e.g. timestamp → long)
    // converts to epoch SECONDS against a micros axis, and every left row then
    // "matches" the globally-latest right row — wrong enrichment everywhere with
    // no error. Same fail-loud rule as the probe-kernel dimension guards.
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt,
      s"leftTime '$leftTime' is $lt but rightTime '$rightTime' is $rt — cast the " +
        "time columns to one type (and one unit) before joining")

    // One relation, two roles: left rows carry their own columns and NULL payload;
    // right rows carry NULL left columns and the payload. Matching then becomes
    // "last non-null payload at or before me" — a carry-forward, not a join.
    val rightProjected = right
      .filter(col(rightTime).isNotNull)
      .select(
        keys.map(col) ++
          Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
          left.columns.filterNot(keys.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col): _*)
    val leftProjected = left
      .select(
        keys.map(col) ++
          Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
          left.columns.filterNot(keys.contains).map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    // A NULL left time has no position in the order and must NEVER match. Don't
    // rely on sort placement (asc parks NULLS FIRST safely, but desc — the forward
    // path — would park them LAST, where the carry state holds a real match):
    // exclude them from the carry entirely and pad them back with NULL payload.
    val unioned = leftProjected.filter(col("_t").isNotNull).unionByName(rightProjected)
    val nullTimeLefts = leftProjected.filter(col("_t").isNull)
      .withColumn("_mt", lit(null).cast(left.schema(leftTime).dataType))

    val carried =
      (if (keys.nonEmpty) keyedCarry(unioned, keys, payload, forward)
       else globalCarry(unioned, payload, forward))
        .unionByName(nullTimeLefts)

    // Tolerance: the carried match time rode along as _mt; a stale match NULLs the
    // payload but keeps the left row (left-outer semantics, like merge_asof).
    val withTol = tolerance match {
      case None => carried
      case Some(tol) =>
        val fresh =
          if (forward) col("_mt") <= col("_t") + tol
          else col("_mt") >= col("_t") - tol
        payload.foldLeft(carried)((df, p) =>
          df.withColumn(p, when(fresh, col(p)))) // NULL _mt ⇒ NULL payload already
          .withColumn("_mt", when(fresh, col("_mt")))
    }

    val named = matchedTimeCol match {
      case Some(m) => withTol.withColumnRenamed("_mt", m)
      case None => withTol.drop("_mt")
    }
    named
      .filter(col("_side") === 1)
      .select((left.columns.map(col) ++ payload.map(col) ++ matchedTimeCol.map(col)): _*)
  }

  /** Keyed carry: per-key window ordered by (time, side) — right (side 0) sorts
    * BEFORE left at an equal instant, making the backward match inclusive. Payload
    * columns tie-sort the frame so duplicate right times resolve deterministically.
    */
  private def keyedCarry(u: DataFrame, keys: Seq[String], payload: Seq[String],
      forward: Boolean): DataFrame = {
    val timeOrd = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd +: col("_side").asc +: payload.map(p => col(p).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole match as ONE struct: the struct is non-null for every right
    // row, so a right row whose payload VALUE is NULL still wins the carry (it
    // replaces older state with NULL) — identical to the global path's state
    // machine, where `last(payloadCol, ignoreNulls)` alone would resurrect stale
    // values through legitimate NULLs.
    val matchStruct = last(
      when(col("_side") === 0,
        struct(col("_t").as("__mt") +: payload.map(col): _*)),
      ignoreNulls = true).over(w)
    val withM = u.withColumn("_m", matchStruct)
    payload.foldLeft(withM)((df, p) => df.withColumn(p, col("_m")(p)))
      .withColumn("_mt", col("_m")("__mt"))
      .drop("_m")
  }

  /** Un-keyed carry without a global sort-into-one-task: range-repartition on
    * (time, side), sort within partitions, then two passes over the SAME cached
    * exchange — (1) a bounded per-partition summary (the latest right row each
    * partition holds, ONE row per partition) folded into per-partition seeds on the
    * driver, (2) a parallel per-partition scan that starts its carry state from the
    * seed. No stage ever funnels data-scale rows through one task; the only
    * driver-side state is numPartitions × (payload width) seed rows.
    */
  private def globalCarry(u: DataFrame, payload: Seq[String], forward: Boolean): DataFrame = {
    val spark = u.sparkSession
    val timeOrd = if (forward) col("_t").desc else col("_t").asc
    val sideOrd = col("_side").asc
    // NULL times were stripped by the caller on both sides.
    val dataset = u
      .repartitionByRange(timeOrd, sideOrd)
      .sortWithinPartitions(timeOrd +: sideOrd +: payload.map(p => col(p).asc): _*)
      // Two jobs must observe the SAME nondeterministic range partitioning (the
      // bound sampler re-executes otherwise); cache pins one materialization and
      // keeps lineage recomputable on executor loss.
      .cache()
    try {
      val schema = dataset.schema
      val tIdx = schema.fieldIndex("_t")
      val sideIdx = schema.fieldIndex("_side")
      val pIdx = payload.map(schema.fieldIndex)
      // Pass 1: latest right row per partition (partition-local, bounded output).
      val perPartLast: Array[(Int, Option[(Any, Seq[Any])])] =
        dataset.rdd.mapPartitionsWithIndex { (idx, it) =>
          var lastRight: Option[(Any, Seq[Any])] = None
          it.foreach { r =>
            if (r.getInt(sideIdx) == 0) lastRight = Some((r.get(tIdx), pIdx.map(r.get)))
          }
          Iterator((idx, lastRight))
        }.collect().sortBy(_._1)
      // Fold: partition i's seed = latest right row among partitions < i.
      val seeds = new Array[Option[(Any, Seq[Any])]](perPartLast.length)
      var carry: Option[(Any, Seq[Any])] = None
      perPartLast.foreach { case (idx, lastRight) =>
        seeds(idx) = carry
        if (lastRight.isDefined) carry = lastRight
      }
      val seedsB = spark.sparkContext.broadcast(seeds)
      // Pass 2: parallel carry-forward, seeded across the partition boundary.
      val outSchema = StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("_mt", schema("_t").dataType, nullable = true))
      val carriedRdd = dataset.rdd.mapPartitionsWithIndex { (idx, it) =>
        var state: Option[(Any, Seq[Any])] =
          if (idx < seedsB.value.length) seedsB.value(idx) else None
        it.map { r =>
          if (r.getInt(sideIdx) == 0) {
            state = Some((r.get(tIdx), pIdx.map(r.get)))
            Row.fromSeq(r.toSeq :+ r.get(tIdx))
          } else state match {
            case Some((mt, vals)) =>
              val cells = r.toSeq.toArray
              pIdx.zip(vals).foreach { case (i, v) => cells(i) = v }
              Row.fromSeq(cells.toSeq :+ mt)
            case None => Row.fromSeq(r.toSeq :+ null)
          }
        }
      }
      // Materialize before unpersisting: the returned frame's lineage reads the
      // cached exchange, and callers run further plans over it.
      val out = spark.createDataFrame(carriedRdd, outSchema).localCheckpoint()
      seedsB.destroy() // checkpoint materialized — the seeds are baked into blocks
      out
    } finally dataset.unpersist(blocking = false)
  }
}
