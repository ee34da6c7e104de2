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
  /** Persist one run's metrics. Saving the SAME key again merges the metric maps into
    * one record (every backend); re-saving the same metric name under the same key is
    * backend-resolved — give each run a unique ResultKey (the reference's model:
    * result_key.rs timestamps identify runs).
    */
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

  /** History of one metric, oldest first — the anomaly-detection input. A `limit`
    * keeps the NEWEST N points (then re-sorts oldest-first): limiting oldest-first
    * would freeze the series at the first N runs ever recorded and newer points —
    * the ones anomaly detection exists to judge — would never be returned.
    *
    * Pagination applies AFTER the exact-key extraction, not inside query(): query's
    * forAnalyzers filter also matches dotted sub-metrics (`metricKey.anything`), so
    * limiting records first could page in N records none of which carry the exact
    * key — an empty "history" while real points exist.
    */
  def history(metricKey: String, q: MetricsQuery = MetricsQuery(newestFirst = false)): Seq[(Long, Double)] = {
    val records = query(q.copy(forAnalyzers = Seq(metricKey), newestFirst = false,
      limit = None, offset = 0))
    val points = records.flatMap(r => r.metrics.get(metricKey).map(r.key.timestamp -> _))
    val newestFirst = points.reverse.drop(q.offset)
    q.limit.map(newestFirst.take).getOrElse(newestFirst).reverse
  }

  /** Newest-N points of EXACTLY `metricKey` (no dotted sub-metrics), returned
    * oldest-first — the bounded per-batch read the streaming anomaly sink does on
    * every micro-batch. The base implementation delegates to [[history]], whose bound
    * is DRIVER-SIDE only (the full log is still loaded); ParquetMetricsRepository
    * overrides with a predicate-pushed distributed read so the driver only ever
    * collects N rows regardless of log size.
    */
  def pointsFor(metricKey: String, newestN: Option[Int]): Seq[(Long, Double)] =
    history(metricKey, MetricsQuery(limit = newestN, newestFirst = false))

  /** Exact-key point lookup: the value recorded for `metricKey` at `timestamp`, if
    * any. Complements [[pointsFor]]'s newest-N window — a replay/collision probe for
    * a timestamp OLDER than the window needs this unbounded-exact check, not a wider
    * scan. Base implementation filters [[history]]; ParquetMetricsRepository pushes
    * both predicates into the file scan.
    */
  def pointAt(metricKey: String, timestamp: Long): Option[Double] =
    history(metricKey).reverseIterator.find(_._1 == timestamp).map(_._2)

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
    buf.synchronized {
      // Same-key saves MERGE (new values win) — the parquet backend's loadAll groups
      // rows by key, so keeping two records here would make record counts and
      // pagination diverge across backends.
      buf.indexWhere(_.key == key) match {
        case -1 => buf += MetricRecord(key, metrics)
        case i  => buf(i) = MetricRecord(key, buf(i).metrics ++ metrics)
      }
    }
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
    * directly — no driver round-trip, any history size. A repository with no saves
    * yet reads as an EMPTY frame with the log schema, matching loadAll()'s Nil.
    */
  def toDataFrame: org.apache.spark.sql.DataFrame = readLog(spark)
  override def toDataFrame(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    readLog(s) // honor the CALLER's session (temp views etc. land there)

  private def readLog(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)) s.read.parquet(path)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tags", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("metric", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
  }

  /** Predicate-pushed bounded read: `metric = key` prunes row groups at the parquet
    * scan, duplicate rows merge to the max value exactly like loadAll's record merge,
    * and the newest-N cut runs as a distributed TopK (TakeOrdered) — the driver
    * collects at most N rows however long the stream has been appending.
    */
  override def pointsFor(metricKey: String, newestN: Option[Int]): Seq[(Long, Double)] = {
    import org.apache.spark.sql.functions.{col, max}
    val merged = readLog(spark).filter(col("metric") === metricKey)
      .groupBy(col("timestamp"), col("tags")).agg(max(col("value")).as("value"))
      .select(col("timestamp"), col("value"))
    val limited = newestN match {
      case Some(n) => merged.orderBy(col("timestamp").desc).limit(n)
      case None    => merged
    }
    limited.as[(Long, Double)].collect().toSeq.sortBy(_._1)
  }

  /** Exact (metric, timestamp) probe — both predicates reach the file scan; ties
    * across tag sets resolve to the max value, matching loadAll's merge direction.
    */
  override def pointAt(metricKey: String, timestamp: Long): Option[Double] = {
    import org.apache.spark.sql.functions.{col, max}
    val row = readLog(spark)
      .filter(col("metric") === metricKey && col("timestamp") === timestamp)
      .agg(max(col("value"))).head()
    if (row.isNullAt(0)) None else Some(row.getDouble(0))
  }

  def loadAll(): Seq[MetricRecord] =
    readLog(spark)
      .as[(Long, String, String, Double)]
      .collect().toSeq
      .groupBy(r => (r._1, r._2))
      .map { case ((ts, tags), rows) =>
        MetricRecord(ResultKey(ts, ParquetMetricsRepository.decodeTags(tags)),
          // Sorted before toMap: groupBy preserves collect() order, which is partition-
          // nondeterministic — a duplicated metric name must at least resolve the same
          // way on every read.
          rows.sortBy(r => (r._3, r._4)).map(r => r._3 -> r._4).toMap)
      }.toSeq.sortBy(_.key.timestamp)
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
