package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: run a full validation suite (the engine's primary entry point,
    * reference: term-guard/src/core/suite.rs:399-501) over sf0.001 lineitem/orders and
    * return the per-constraint report as a DataFrame. All batchable constraints execute
    * as ONE aggregation scan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    val lineReport = ValidationSuite.builder("flagship-lineitem")
      .check(CheckBuilder("lineitem integrity", Level.Error)
        .hasSize(Assertion.GreaterThan(0))
        .isComplete("l_orderkey")
        .isComplete("l_quantity")
        .isUnique("l_orderkey", "l_linenumber")
        .isContainedIn("l_returnflag", Seq("A", "N", "R"))
        .isContainedIn("l_linestatus", Seq("O", "F"))
        .hasMin("l_quantity", Assertion.GreaterThanOrEqual(0))
        .hasMean("l_discount", Assertion.Between(0.0, 0.2))
        .hasCompleteness("l_extendedprice", Assertion.GreaterThanOrEqual(0.99))
        .satisfies("l_discount >= 0 AND l_discount <= 0.5", "discount sane")
        .build())
      .build().run(lineitem)

    val ordersReport = ValidationSuite.builder("flagship-orders")
      .check(CheckBuilder("orders integrity", Level.Error)
        .isPrimaryKey("o_orderkey")
        .isContainedIn("o_orderstatus", Seq("O", "F", "P"))
        .hasForeignKey(spark.read.parquet(s"$dir/customer.parquet"), ("o_custkey", "c_custkey"))
        .build())
      .build().run(orders)

    import spark.implicits._
    (lineReport.allResults ++ ordersReport.allResults).map { r =>
      (r.constraint, r.status.toString, r.metric.flatMap(_.asDouble).getOrElse(Double.NaN), r.message)
    }.toDF("constraint", "status", "metric", "message")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
