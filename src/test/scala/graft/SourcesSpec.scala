package graft

import graft.core._
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Source-layer tests. The JDBC path runs against embedded Derby (in the Spark
  * distribution), standing in for the reference's Postgres/MySQL/SQLite sources
  * (sources/database.rs) — same `spark.read.format("jdbc")` code path and options as a
  * networked database, minus the network.
  */
class SourcesSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("jdbc source round-trips a table and supports partitioned reads") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (i.toLong, s"name_$i", i % 7))
    val df = rows.toDF("id", "name", "grp")
    df.write.mode("overwrite").jdbc(url, "people", new java.util.Properties)

    // plain read
    val back = Sources.jdbc(spark, Sources.JdbcConfig(url, "people"))
    assert(back.count() == 100)
    assert(back.agg(sum("id")).head().getLong(0) == rows.map(_._1).sum)

    // partitioned read: 4 parallel range slices over id — the ingestion-at-scale shape
    val parts = Sources.jdbc(spark, Sources.JdbcConfig(url, "people",
      partitionColumn = Some("id"), numPartitions = Some(4),
      lowerBound = Some(0L), upperBound = Some(100L)))
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.count() == 100)
    assert(parts.select("id").distinct().count() == 100) // slices partition, not duplicate

    // a validation suite straight over the JDBC-backed frame (the reference's use case)
    val report = ValidationSuite("jdbc", Seq(
      CheckBuilder("people", Level.Error)
        .hasSize(Assertion.Equals(100))
        .isPrimaryKey("id")
        .isComplete("name")
        .hasMax("grp", Assertion.LessThanOrEqual(6))
        .build())).run(back)
    assert(report.isSuccess, Formatters.text(report))
  }

  test("jdbc partitioned and plain reads agree row-for-row") {
    val a = Sources.jdbc(spark, Sources.JdbcConfig(url, "people"))
      .orderBy("id").collect().toSeq
    val b = Sources.jdbc(spark, Sources.JdbcConfig(url, "people",
      partitionColumn = Some("id"), numPartitions = Some(3),
      lowerBound = Some(10L), upperBound = Some(50L))) // bounds slice, never filter
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
