package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical Spark-semantics probe for the oracle-divergence audit (manual:
  * `runMain graft.tools.ScratchSemantics`): prints how THIS Spark build handles the
  * corner inputs the sf fixtures never exercise — ANSI division by zero (long and
  * double), countDistinct over partially-null tuples, null placement in ascending
  * sorts, and rlike '$' before a trailing newline.
  */
object ScratchSemantics {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("[sem] ansi.enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    def tryEval(label: String)(f: => Any): Unit =
      println(s"[sem] $label = " + (try f.toString catch { case e: Throwable => s"THROWS ${e.getClass.getSimpleName}: ${e.getMessage.take(80)}" }))

    val empty = Seq.empty[(Long, java.lang.Double)].toDF("k", "v")
    tryEval("count(v)/count(*) on empty") {
      empty.agg((count($"v") / count(lit(1))).as("r")).head().get(0)
    }
    tryEval("count(v).cast(double)/count(*) on empty") {
      empty.agg((count($"v").cast("double") / count(lit(1)).cast("double")).as("r")).head().get(0)
    }
    tryEval("lit(1L)/lit(0L)") { spark.range(1).select(lit(1L) / lit(0L)).head().get(0) }
    tryEval("lit(1.0)/lit(0.0)") { spark.range(1).select(lit(1.0) / lit(0.0)).head().get(0) }
    tryEval("lit(0.0)/lit(0.0)") { spark.range(1).select(lit(0.0) / lit(0.0)).head().get(0) }

    val tup = Seq((Some(1L), Option.empty[Long]), (Some(1L), Option.empty[Long]), (Some(1L), Some(2L)))
      .toDF("a", "b")
    tryEval("countDistinct(a,b) with (1,null)x2,(1,2)") {
      tup.agg(countDistinct($"a", $"b")).head().get(0)
    }

    val nulls = Seq(Some(2L), None, Some(1L)).toDF("x")
    println("[sem] orderBy(x) default: " + nulls.orderBy($"x").collect().map(_.get(0)).mkString(","))

    val nl = Seq("1-URGENT", "1-URGENT\n").toDF("s")
    println("[sem] rlike ^[1-5]-[A-Z ]+$ on ['1-URGENT','1-URGENT\\n']: " +
      nl.select($"s".rlike("^[1-5]-[A-Z ]+$")).collect().map(_.get(0)).mkString(","))

    val vt = Seq("ab").toDF("s")
    println("[sem] split on \\s+ of 'a\\x0Bb': " +
      vt.select(split($"s", "\\s+")).head().getSeq[String](0).mkString("|"))

    spark.stop()
  }
}
