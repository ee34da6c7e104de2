package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of scan fan-out: html build+parse kernel, url_parts + distinct
  * aggregation. `runMain graft.tools.ScratchFanAB3 [sfDir]`.
  */
object ScratchFanAB3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    import graft.functions.WebFunctions

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    def htmlx(src: DataFrame): Unit = {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>T "), id,
        lit("</title><style>p{color:red}</style></head><body><h1>Heading "), id,
        lit("</h1><!-- hidden --><p>alpha &amp; beta</p><p>gamma&nbsp;delta</p>" +
          "<script>var x=\"<p>fake</p>\";</script><table><tr><td>c1</td><td>c2" +
          "</td></tr></table><div>tail "), id, lit("</div></body></html>"))
      val parts = WebFunctions.htmlParts(html)
      noop(src.filter(col("doc_id").isNotNull).select(col("doc_id"))
        .select(parts.getField("text").as("x"), parts.getField("title").as("ti"))
        .agg(count(lit(1)).as("n"), sum(length(col("x")).cast("long")).as("c"),
          max(col("ti")).as("t")))
    }

    def urlq(src: DataFrame): Unit = {
      val scheme = when(col("o_orderkey") % 2 === 0, "HTTP").otherwise("HTTPS")
      val port = when(col("o_orderkey") % 2 === 0, ":80").otherwise(":443")
      val tld = when(col("o_custkey") % 5 === 0, ".CO.UK").otherwise(".COM")
      val u = concat(scheme, lit("://WWW.Shop"), (col("o_custkey") % 40).cast("string"),
        tld, port, lit("/items/"), col("o_orderkey").cast("string"),
        lit("/?utm_source=feed&b="), (col("o_orderkey") % 7).cast("string"),
        lit("&a="), (col("o_orderkey") % 3).cast("string"), lit("#frag"))
      noop(src.filter(col("o_orderkey").isNotNull).select(col("o_orderkey"), col("o_custkey"))
        .select(WebFunctions.urlNormalize(u).as("norm"), WebFunctions.domainOf(u).as("dom"))
        .agg(count(lit(1)), countDistinct(col("norm")), countDistinct(col("dom")),
          min(col("norm")), max(col("norm")),
          coalesce(sum(length(col("norm"))), lit(0L))))
    }

    def ab(name: String, f: DataFrame => Unit, raw: DataFrame): Unit = {
      f(raw); f(raw.repartition(32))
      (1 to 3).foreach { _ =>
        val a = secs { f(raw) }
        val b = secs { f(raw.repartition(32)) }
        println(f"[fanab3] $name%-12s raw $a%6.2f s   fanned $b%6.2f s")
      }
    }
    ab("html_extract", htmlx, docs)
    ab("url_norm", urlq, orders)
    spark.stop()
  }
}
