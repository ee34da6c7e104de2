package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints physical plans for the round-7 operators (as-of join, range join, KS
  * statistic, leakage-safe split) for the PLANS.md audit:
  * `runMain graft.tools.ScratchJoinPlans [sfDir]`.
  */
object ScratchJoinPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n[plan] ================ $name ================")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = (ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        ev0.withColumn("ts", col("ts").cast("timestamp"))
      case _ => ev0
    }).filter(col("user_id").isNotNull)

    val left = ev.filter(col("event_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val right = ev.filter(col("event_id") % 10 === 0 && col("ts").isNotNull)
      .groupBy(col("user_id"), unix_micros(col("ts")).as("rt_us"))
      .agg(max(col("value")).as("snap_value"))
    show("asofJoin keyed (union + one hash exchange + window carry)") {
      graft.operators.AsOf.asofJoin(left, right, Seq("user_id"), "t_us", "rt_us",
        Seq("snap_value"))
    }

    val pts = ev.filter(col("ts").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("x"))
    val ivs = ev.filter(col("ts").isNotNull)
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s"))
      .withColumn("e", col("s") + lit(3600L * 1000000L))
    show("rangeJoin (bin explode + equi-join, no BNLJ)") {
      graft.operators.Joins.rangeJoin(pts, ivs, "x", "s", "e", 3600.0 * 1e6)
    }

    show("leakageSafeSplit (one window shuffle + row-local assignment)") {
      graft.operators.Splits.leakageSafeSplit(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("doc_id").isNotNull)
          .withColumn("parent", floor(col("doc_id") / 5)),
        "doc_id", "parent", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), 13)
    }

    // ksStatistic executes eagerly (two bounded passes over a checkpointed
    // exchange) — print the grouped-counts child plan it builds on instead.
    show("ksStatistic input (value-grouped counts before the range fold)") {
      val v = ev.select(col("value").cast("double").as("_x"), lit(0).as("_s"))
        .filter(col("_x").between(-Double.MaxValue, Double.MaxValue))
      v.groupBy("_x").agg(
        sum(when(col("_s") === 0, 1L).otherwise(0L)).as("_c1"),
        sum(when(col("_s") === 1, 1L).otherwise(0L)).as("_c2"))
    }

    spark.stop()
  }
}
