package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the gaps-and-islands pass every event pipeline needs:
  * consecutive events of one key belong to the same session while the gap between
  * them stays ≤ `maxGapSeconds`; a longer silence starts a new session.
  *
  * Semantics:
  *  - NULL key rows, NULL timestamps, and values that don't `try_cast` to a
  *    timestamp are EXCLUDED: no session identity / no position in time (surface
  *    them with completeness/datatype constraints instead).
  *  - Timestamp TIES within a key are safe: tied rows share the default RANGE
  *    window frame, so they always land in the same session regardless of which
  *    of them the (arbitrary-order) LAG pairs with — session count and membership
  *    are tie-order-independent in Spark and every RANGE-framed SQL engine.
  *
  * Scale: one key-partitioned window (shuffle on the key, per-key time sort). A
  * key's whole event stream sorts in one task — the right trade for entity-keyed
  * streams (bounded per entity). A key owning a data-scale share of events needs
  * the range-repartition boundary-fold treatment instead (the un-keyed monotonicity
  * plan, constraints/temporal.scala) — not this operator's contract.
  */
object Sessions {

  /** `df` (minus NULL key/ts rows) plus `session_idx`: 1-based session number per
    * key in time order. A session starts at the key's first event and after every
    * gap strictly greater than `maxGapSeconds`.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive, got $maxGapSeconds")
    require(!df.columns.contains("session_idx"),
      "input already has a 'session_idx' column — rename it")
    require(!df.columns.contains("_sess_new"),
      "sessionize reserves the column name _sess_new; rename the input column")
    // try_cast, and the WINDOW orders by the cast micros, not the raw column: a
    // string tsCol would otherwise sort lexicographically while gaps computed
    // temporally (silently merged/split sessions), and a castable-but-malformed
    // value would turn every gap NULL (every event its own session). Rows whose
    // value can't become a timestamp are excluded exactly like NULL timestamps —
    // no position in time.
    val tsUs = unix_micros(col(tsCol).try_cast("timestamp"))
    val w = Window.partitionBy(col(keyCol)).orderBy(tsUs)
    val gapUs = tsUs - lag(tsUs, 1).over(w)
    val isNew = when(gapUs.isNull || gapUs > maxGapSeconds * 1000000L, 1L).otherwise(0L)
    df.filter(col(keyCol).isNotNull && tsUs.isNotNull)
      .withColumn("_sess_new", isNew)
      // Default RANGE frame: tied timestamps share one frame edge, so ties can
      // never straddle a session boundary (see class doc).
      .withColumn("session_idx", sum(col("_sess_new")).over(w))
      .drop("_sess_new")
  }

  /** Per-(key, session) rollup: event count, start/end (epoch micros — exact
    * integer arithmetic end to end), and duration.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      maxGapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, maxGapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol).try_cast("timestamp"))).as("start_us"),
        max(unix_micros(col(tsCol).try_cast("timestamp"))).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
