package graft.tools

import graft.{Metrics, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints formatted physical plans for representative operators (manual plan review:
  * `runMain graft.tools.ScratchPlans`). Red flags looked for: un-pruned ReadSchema,
  * missing PushedFilters, sort-merge joins where broadcast is right, codegen breaks.
  */
object ScratchPlans {
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

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")

    show("completeness (pruning)")(Metrics.completeness(li, "l_tax"))
    show("suite-shaped multi-agg")(
      li.agg(count(lit(1)), count(col("l_orderkey")), min(col("l_quantity")),
        approx_count_distinct(col("l_partkey"))))
    show("foreign key orphans (anti join)")(
      Metrics.foreignKeyOrphans(orders, customer, Seq(("o_custkey", "c_custkey"))))
    show("join coverage (semi join)")(
      Metrics.joinCoverage(li, orders, Seq(("l_orderkey", "o_orderkey"))))
    show("entropy")(Metrics.entropy(li, "l_returnflag"))
    show("mutual information")(Metrics.mutualInformation(li, "l_returnflag", "l_linestatus"))
    show("similarity topk")(SparkEntry.queries("similarity_topk_embeddings")(spark, sfDir))
    show("grouped completeness")(
      Metrics.groupedCompleteness(spark.read.parquet(s"$sfDir/orders.parquet"), "o_totalprice", Seq("o_orderstatus")))
    spark.stop()
  }
}
