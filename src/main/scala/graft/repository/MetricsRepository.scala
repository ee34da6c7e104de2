package graft.repository

import graft.core.MetricValue

/** Time-series persistence of metric runs
  * (reference: term-guard/src/repository/mod.rs:59, result_key.rs:27-270, query.rs:36-368).
  */
final case class ResultKey(timestamp: Long, tags: Map[String, String] = Map.empty)

final case class MetricRecord(key: ResultKey, metrics: Map[String, Double])

/** Filter/sort/paginate over stored runs (reference: repository/query.rs). */
final case class MetricsQuery(
    before: Option[Long] = None,
    after: Option[Long] = None,
    withTags: Map[String, String] = Map.empty,
    forAnalyzers: Seq[String] = Nil,
    limit: Option[Int] = None,
    offset: Int = 0,
    newestFirst: Boolean = true) {
  def matches(r: MetricRecord): Boolean =
    before.forall(r.key.timestamp < _) &&
    after.forall(r.key.timestamp > _) &&
    withTags.forall { case (k, v) => r.key.tags.get(k).contains(v) }
}

trait MetricsRepository {
  def save(key: ResultKey, metrics: Map[String, Double]): Unit
  def loadAll(): Seq[MetricRecord]

  def query(q: MetricsQuery): Seq[MetricRecord] = {
    val filtered = loadAll().filter(q.matches)
      .map { r =>
        if (q.forAnalyzers.isEmpty) r
        else r.copy(metrics = r.metrics.view.filterKeys(k =>
          q.forAnalyzers.exists(a => k == a || k.startsWith(a + "."))).toMap)
      }
      .filter(_.metrics.nonEmpty)
    val sorted = filtered.sortBy(_.key.timestamp)
    val ordered = if (q.newestFirst) sorted.reverse else sorted
    val page = ordered.drop(q.offset)
    q.limit.map(page.take).getOrElse(page)
  }

  /** History of one metric, oldest first — the anomaly-detection input. */
  def history(metricKey: String, q: MetricsQuery = MetricsQuery(newestFirst = false)): Seq[(Long, Double)] =
    query(q.copy(forAnalyzers = Seq(metricKey), newestFirst = false))
      .flatMap(r => r.metrics.get(metricKey).map(r.key.timestamp -> _))

  /** The metric log as a DataFrame (timestamp, tags, metric, value) — arbitrary Spark
    * SQL over metric history for ANY repository implementation (the reference's
    * SQL-over-metrics executor, repository/datafusion_executor.rs:53-275, without a
    * bespoke engine). ParquetMetricsRepository overrides with a direct file read so
    * history never round-trips through the driver.
    */
  def toDataFrame(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    loadAll().flatMap(r => r.metrics.toSeq.map { case (m, v) =>
      (r.key.timestamp, ParquetMetricsRepository.encodeTags(r.key.tags), m, v)
    }).toDF("timestamp", "tags", "metric", "value")
  }
}

final class InMemoryMetricsRepository extends MetricsRepository {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[MetricRecord]
  def save(key: ResultKey, metrics: Map[String, Double]): Unit =
    buf.synchronized { buf += MetricRecord(key, metrics) }
  def loadAll(): Seq[MetricRecord] = buf.synchronized(buf.toVector)
}

/** Parquet-backed repository: one row per (run, metric) — append-only, queryable with
  * plain DataFrame filters at any scale (replaces the reference's DataFusion-over-JSON
  * executor, repository/datafusion_executor.rs:53-275).
  */
final class ParquetMetricsRepository(path: String, spark: org.apache.spark.sql.SparkSession)
    extends MetricsRepository {
  import spark.implicits._

  def save(key: ResultKey, metrics: Map[String, Double]): Unit = {
    val tagStr = ParquetMetricsRepository.encodeTags(key.tags)
    metrics.toSeq.map { case (m, v) => (key.timestamp, tagStr, m, v) }
      .toDF("timestamp", "tags", "metric", "value")
      .write.mode("append").parquet(path)
  }

  /** The metric log as a DataFrame (timestamp, tags, metric, value) — arbitrary Spark
    * SQL over metric history (the reference's SQL-over-metrics executor,
    * repository/datafusion_executor.rs, without a bespoke engine). Reads the files
    * directly — no driver round-trip, any history size.
    */
  def toDataFrame: org.apache.spark.sql.DataFrame = spark.read.parquet(path)
  override def toDataFrame(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    s.read.parquet(path) // honor the CALLER's session (temp views etc. land there)

  def loadAll(): Seq[MetricRecord] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return Nil
    spark.read.parquet(path)
      .as[(Long, String, String, Double)]
      .collect().toSeq
      .groupBy(r => (r._1, r._2))
      .map { case ((ts, tags), rows) =>
        MetricRecord(ResultKey(ts, ParquetMetricsRepository.decodeTags(tags)),
          rows.map(r => r._3 -> r._4).toMap)
      }.toSeq.sortBy(_.key.timestamp)
  }
}
object ParquetMetricsRepository {
  def encodeTags(tags: Map[String, String]): String =
    tags.toSeq.sorted.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
  def decodeTags(s: String): Map[String, String] =
    if (s.isEmpty) Map.empty
    else s.split("&").map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
}
