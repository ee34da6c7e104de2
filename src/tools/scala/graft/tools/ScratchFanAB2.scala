package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of scan fan-out for the remaining round-14 candidates: span
  * grams, budget-select kernels, WARC encode+parse, domain-cap kernel.
  * `runMain graft.tools.ScratchFanAB2 [sfDir]`.
  */
object ScratchFanAB2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    import graft.functions.TextFunctions

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    // --- span grams (duplicateTokenSpans head): tokenize + gram-hash + dup rollup
    def spans(src: DataFrame): Unit =
      noop(graft.operators.Dedup.duplicateTokenSpans(src, "doc_id", "text", 8))

    // --- budget select
    def budget(src: DataFrame): Unit = {
      val d2 = src.filter(col("doc_id").isNotNull && col("text").isNotNull)
        .withColumn("q", TextFunctions.qualityScore(col("text")))
        .withColumn("w", TextFunctions.tokenCount(col("text")))
      noop(graft.operators.Sharding.selectTopByBudgetByGroup(
        d2, "source", "q", "w", "doc_id", 500L, "cum")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sel")))
    }

    // --- warc brotli encode+parse
    def warc(src: DataFrame): Unit = {
      import graft.operators.Warc
      import graft.functions.Brotli
      val mkBlob = udf((id: Long) => {
        val text = s"brotli page $id".getBytes("UTF-8")
        val body = if ((((id % 2) + 2) % 2) == 0L) Brotli.encodeUncompressed(text)
          else Brotli.encodeCompressedLiterals(text)
        val resp = Warc.encodeResponseRecord(s"https://example.com/$id",
          "2026-01-01T00:00:00Z", s"<urn:uuid:$id>", 200, "text/plain", body,
          contentEncoding = Some("br"))
        Warc.encodeWarc(Seq(resp), gzip = ((((id / 2) % 2) + 2) % 2) == 0L)
      })
      val blobs = src.filter(col("doc_id").isNotNull).select(col("doc_id"))
        .select(col("doc_id"), mkBlob(col("doc_id")).as("warc"))
      noop(Warc.explodeRecords(blobs, "warc")
        .agg(count(lit(1)).as("n"), coalesce(sum(when(col("http_decoded"), 1L)), lit(0L)).as("d")))
    }

    // --- domain cap
    def domcap(src: DataFrame): Unit = {
      import graft.functions.WebFunctions
      val tld = when(col("o_custkey") % 5 === 0, ".CO.UK").otherwise(".COM")
      val u = concat(lit("https://WWW.Shop"), (col("o_custkey") % 40).cast("string"),
        tld, lit("/p/"), col("o_orderkey").cast("string"))
      val withDom = src.filter(col("o_orderkey").isNotNull && col("o_custkey").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"))
        .select(col("o_orderkey"), WebFunctions.domainOf(u).as("dom"))
      noop(graft.operators.Sampling.quotaPerStratum(withDom, Seq("dom"), 5, Seq("o_orderkey"))
        .agg(count(lit(1)).as("n_kept"), countDistinct(col("dom")).as("n_domains")))
    }

    def ab(name: String, f: DataFrame => Unit, raw: DataFrame): Unit = {
      f(raw); f(raw.repartition(32)) // warmup both shapes
      (1 to 3).foreach { _ =>
        val a = secs { f(raw) }
        val b = secs { f(raw.repartition(32)) }
        println(f"[fanab2] $name%-14s raw $a%6.2f s   fanned $b%6.2f s")
      }
    }
    ab("spans", spans, docs)
    ab("budget", budget, docs)
    ab("warc_brotli", warc, docs)
    ab("domain_cap", domcap, orders)
    spark.stop()
  }
}
