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

  test("jdbc scan receives pushed filters and pruned columns (plan-pinned)") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (i.toLong, s"name_$i", i % 7, s"pad_$i"))
    rows.toDF("id", "name", "grp", "pad")
      .write.mode("overwrite").jdbc(url, "pushdown_t", new java.util.Properties)

    // Predicate + projection over the JDBC source: both must reach the DATABASE —
    // at the reference's intended scale (sources/database.rs:66-298 reads production
    // Postgres/MySQL) an unpushed filter ships the whole table through the wire and
    // an unpruned projection ships every column of it.
    val q = Sources.jdbc(spark, Sources.JdbcConfig(url, "pushdown_t"))
      .filter(col("grp") === 3 && col("id") > 10L)
      .select("id", "name")
    val scanLine = q.queryExecution.executedPlan.toString().linesIterator
      .find(_.contains("JDBCRelation")).getOrElse(
        fail("no JDBC scan node in plan:\n" + q.queryExecution.executedPlan))
    // filters compiled into the remote WHERE clause (EqualTo/GreaterThan are
    // dialect-supported; '*' marks handled-by-source, i.e. NOT re-evaluated in Spark)
    assert(scanLine.contains("PushedFilters"), scanLine)
    assert(scanLine.contains("EqualTo(grp,3)") && scanLine.contains("GreaterThan(id,10)"),
      s"filters must push to the JDBC source: $scanLine")
    // column pruning: the remote SELECT list carries id/name/grp (output + pushed
    // filter columns), never the untouched pad column
    assert(!scanLine.contains("pad"), s"unreferenced column must be pruned: $scanLine")
    assert(q.collect().map(_.getLong(0)).forall(id => id > 10 && id % 7 == 3))

    // A validation suite over a pre-filtered JDBC frame: every suite job stacks on
    // this same logical plan, so the scan shape the suite pays is the pushed one.
    val gated = Sources.jdbc(spark, Sources.JdbcConfig(url, "pushdown_t"))
      .filter(col("id") >= 100L)
    val gatedScan = gated.queryExecution.executedPlan.toString().linesIterator
      .find(_.contains("JDBCRelation")).get
    assert(gatedScan.contains("GreaterThanOrEqual(id,100)"), gatedScan)
    val report = ValidationSuite("jdbc_pushdown", Seq(
      CheckBuilder("pushdown_t", Level.Error)
        .hasSize(Assertion.Equals(100))
        .isComplete("name")
        .build())).run(gated)
    assert(report.isSuccess, Formatters.text(report))
  }

  test("parquetLayoutAudit: footer metadata matches the data, files and directories, sidecar skip") {
    import spark.implicits._
    val dir = tmpDir("layout_audit")
    val df = (1 to 9000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(3).write.mode("overwrite").parquet(dir)
    val audit = graft.sources.Sources.parquetLayoutAudit(spark, dir).collect()
    assert(audit.length == 3, s"expected 3 part files, got ${audit.map(_.getString(0)).toSeq}")
    assert(audit.map(_.getLong(3)).sum == 9000L) // footer rows == written rows
    audit.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) >= 1 && r.getLong(6) > 0 && r.getLong(7) > 0)
      assert(r.getLong(4) <= r.getLong(5) && r.getLong(5) <= r.getLong(3))
      assert(!r.getString(0).contains("_SUCCESS"))
    }
    // single-file path form; rows match a direct scan of that one file
    val one = audit.head.getString(0)
    val row = graft.sources.Sources.parquetLayoutAudit(spark, one).collect()
    assert(row.length == 1 &&
      row.head.getLong(3) == spark.read.parquet(one).count())
    // empty table still audits (0 rows, footer present)
    val edir = tmpDir("layout_empty")
    df.filter(lit(false)).coalesce(1).write.mode("overwrite").parquet(edir)
    val empty = graft.sources.Sources.parquetLayoutAudit(spark, edir).collect()
    assert(empty.map(_.getLong(3)).sum == 0L)
  }

  test("parquetLayoutAudit recurses into Hive-partitioned layouts; compactSmallFiles refuses them") {
    import spark.implicits._
    val dir = tmpDir("layout_part") + "/t"
    val df = (1 to 900).map(i => (i.toLong, i % 3, s"row$i")).toDF("id", "p", "s")
    graft.sources.Sources.writePartitioned(df, dir, Seq("p"))
    // The data files live under p=0/, p=1/, p=2/ — a top-level-only listing would
    // see zero files here and downstream byte sizing would silently be 0.
    val audit = graft.sources.Sources.parquetLayoutAudit(spark, dir).collect()
    assert(audit.nonEmpty, "partitioned layout audited as zero files")
    assert(audit.map(_.getLong(3)).sum == 900L,
      s"footer rows != written rows: ${audit.map(r => (r.getString(0), r.getLong(3))).toSeq}")
    assert(audit.forall(r => r.getString(0).contains("/p=")), "expected files under p=*/")
    assert(audit.forall(r => !r.getString(0).contains("_SUCCESS")))
    // Compacting a partitioned layout flat would destroy directory pruning — loud no.
    val out = tmpDir("layout_part_out") + "/t"
    val e = intercept[IllegalArgumentException](
      graft.sources.Sources.compactSmallFiles(spark, dir, out))
    assert(e.getMessage.contains("partitioned"), e.getMessage)
    // A non-existent/empty input is "nothing to compact", not a silent 1-file rewrite.
    val emptyDir = tmpDir("layout_nofiles")
    val e2 = intercept[IllegalArgumentException](
      graft.sources.Sources.compactSmallFiles(spark, emptyDir, out))
    assert(e2.getMessage.contains("nothing to compact"), e2.getMessage)
  }

  test("compactSmallFiles: many tiny files collapse to the byte-sized target, rows intact") {
    import spark.implicits._
    val in = tmpDir("compact_in")
    val out = tmpDir("compact_out") + "/t"
    // 64 tiny files — the streaming-micro-batch pathology.
    val df = (1 to 6400).map(i => (i.toLong, s"row$i" * 10)).toDF("id", "s")
    df.repartition(64).write.mode("overwrite").parquet(in)
    val before = graft.sources.Sources.parquetLayoutAudit(spark, in).collect()
    assert(before.length == 64)
    val totalBytes = before.map(_.getLong(1)).sum
    // Target a quarter of the table per file -> expect ~4 files (ceil semantics).
    val target = math.max(1L, totalBytes / 4)
    val after = graft.sources.Sources.compactSmallFiles(spark, in, out, target).collect()
    val expectFiles = ((totalBytes + target - 1) / target).toInt
    assert(after.length == expectFiles, s"expected $expectFiles files, got ${after.length}")
    assert(spark.read.parquet(out).count() == 6400L)
    assert(spark.read.parquet(out).agg(sum(col("id"))).head().getLong(0) ==
      (1 to 6400).map(_.toLong).sum)
    // Guards: in-place compaction fails fast — including a "x/../x" respelling of
    // the same directory (the guard qualifies + normalizes before comparing).
    intercept[IllegalArgumentException](
      graft.sources.Sources.compactSmallFiles(spark, in, in, target))
    val respelled = in + "/../" + new java.io.File(in).getName
    intercept[IllegalArgumentException](
      graft.sources.Sources.compactSmallFiles(spark, in, respelled, target))
    intercept[IllegalArgumentException](
      graft.sources.Sources.compactSmallFiles(spark, in, out, 0L))
  }

  test("object-store contract: credentials reach hadoopConfiguration; only the connector jar is absent") {
    // This sandbox ships no hadoop-aws / aws-sdk jars and has no network egress, so a
    // LIVE s3a round-trip (even against a local mock endpoint) cannot run here — the
    // S3AFileSystem class itself is unobtainable. What CAN be pinned: the credential
    // helper writes exactly the keys Hadoop's s3a connector reads, and an s3a:// read
    // attempt travels all the way to Hadoop's FileSystem loader and fails ONLY on the
    // missing connector class — proving the path/config wiring is complete.
    val s = Sources.withS3Credentials(spark, "test-access", "test-secret",
      Some("http://localhost:9000"))
    val hc = s.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") == "test-access")
    assert(hc.get("fs.s3a.secret.key") == "test-secret")
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    val e = intercept[Exception] { spark.read.parquet("s3a://bucket/key").collect() }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" <- ")
    assert(chain.contains("S3AFileSystem") ||
      chain.toLowerCase.contains("no filesystem for scheme"),
      s"expected the missing-connector failure shape, got: $chain")
  }

  test("object-store contract: full s3a:// parquet round-trip through the FileSystem API") {
    // A FileSystem registered for the s3a scheme (see FakeS3FileSystem) exercises the
    // SAME code Spark runs against a real object store — scheme resolution from
    // hadoopConfiguration, path qualification, FileOutputCommitter rename dance,
    // reader footer probes — with only the byte transport swapped for local disk.
    val hc = spark.sparkContext.hadoopConfiguration
    Sources.withS3Credentials(spark, "ak", "sk", Some("http://localhost:9000"))
    hc.set("fs.s3a.impl", classOf[FakeS3FileSystem].getName)
    // Hadoop's default conf binds scheme s3a to the (absent) S3ACommitterFactory —
    // the same knob deployments use to select the magic committer. Bind the default
    // FileOutputCommitter factory instead.
    hc.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitterFactory")
    val dir = tmpDir("fake_s3")
    try {
      import spark.implicits._
      val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
      val uri = s"s3a://test-bucket$dir/rt"
      df.write.mode("overwrite").parquet(uri)
      val back = spark.read.parquet(uri).orderBy("id").collect()
      assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "a"), (2, "b"), (3, "c")))
      // CSV through the same scheme (different writer stack: text + header).
      val curi = s"s3a://test-bucket$dir/rt_csv"
      df.write.option("header", "true").csv(curi)
      assert(Sources.csv(spark, Seq(curi)).count() == 3)
    } finally {
      hc.unset("fs.s3a.impl")
      hc.unset("mapreduce.outputcommitter.factory.scheme.s3a")
      org.apache.hadoop.fs.FileSystem.closeAll()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
