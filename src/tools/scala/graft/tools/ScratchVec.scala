package graft.tools

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch comparison of the three cosine formulations on 1M synthetic 64-dim vectors
  * (manual: `runMain graft.tools.ScratchVec`).
  */
object ScratchVec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val vecs = spark.range(1000000).repartition(32).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => ((pmod(col("id") * (i + lit(1)), lit(97)) - 48).cast("double") / 10.0).cast("float")).as("v"))
      .cache()
    vecs.count()

    val probe = (0 until dim).map(i => (i % 7 - 3).toFloat)

    def med(name: String, n: Int = 5)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[scratch] $name%-28s median=${ts.sorted.apply(n / 2)}%6.2f s")
    }

    // native codegen'd expression
    med("native expression") {
      vecs.select(VectorFunctions.cosineToProbe(col("v"), probe).as("c"))
        .agg(sum(col("c"))).head()
    }
    // UDF
    val p = probe.map(_.toDouble).toArray
    val np = math.sqrt(p.map(x => x * x).sum)
    val cosUdf = udf { (v: Seq[Float]) =>
      var dot = 0.0; var nv = 0.0; var i = 0
      while (i < p.length) { val x = v(i).toDouble; dot += x * p(i); nv += x * x; i += 1 }
      dot / (math.sqrt(nv) * np)
    }
    med("udf") {
      vecs.select(cosUdf(col("v")).as("c")).agg(sum(col("c"))).head()
    }
    // higher-order functions
    val pl = array(probe.map(v => lit(v.toDouble)): _*)
    med("zip_with/aggregate HOFs") {
      val dot = aggregate(zip_with(col("v"), pl, (x, y) => x.cast("double") * y), lit(0.0), (a, b) => a + b)
      val nv = sqrt(aggregate(transform(col("v"), x => x.cast("double") * x.cast("double")), lit(0.0), (a, b) => a + b))
      vecs.select((dot / (nv * lit(np))).as("c")).agg(sum(col("c"))).head()
    }
    spark.stop()
  }
}
