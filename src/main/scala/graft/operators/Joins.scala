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
}
