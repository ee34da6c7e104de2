package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan inspection / timing playground (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val part = spark.read.parquet(s"$d/part.parquet").select(col("p_size").cast("string").as("v"))
    val which = args.headOption.getOrElse("all")
    val c = col("v")
    val e = which match {
      case "int"  => when(expr("try_cast(v AS BIGINT)").isNotNull, "integer").otherwise("text")
      case "frac" => when(expr("try_cast(v AS DOUBLE)").isNotNull, "fractional").otherwise("text")
      case "date" => when(expr("try_cast(v AS DATE)").isNotNull, "date").otherwise("text")
      case "ts"   => when(expr("try_cast(v AS TIMESTAMP)").isNotNull, "timestamp").otherwise("text")
      case "bool" => when(lower(trim(c)).isin("true", "false"), "boolean").otherwise("text")
      case "isin" => when(c.isin("true", "false"), "boolean").otherwise("text")
      case "lower" => when(lower(c) === "true", "boolean").otherwise("text")
      case "trim" => when(trim(c) === "true", "boolean").otherwise("text")
      case "null" => when(c.isNull, "null").otherwise("text")
      case _      => graft.constraints.InferredType.classifier("v")
    }
    time(s"$which groupBy") {
      part.select(e.as("t")).groupBy("t").count().count()
    }
    time(s"$which again") {
      part.select(e.as("t")).groupBy("t").count().count()
    }
    spark.stop()
  }
}
