package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registration helpers (reference: the term-guard/src/sources directory).
  *
  * Thin by design: Spark's readers already cover every reference source —
  * CSV/Parquet/JSON natively, databases via JDBC, object stores via s3a://, gs://,
  * abfss:// path schemes plus Hadoop configuration. These helpers keep the reference's
  * ergonomics (option bundles, multi-path, table registration) without hiding the
  * underlying reader.
  */
object Sources {

  final case class CsvOptions(
      header: Boolean = true,
      delimiter: String = ",",
      inferSchema: Boolean = true,
      nullValue: String = "",
      /** Parse quoted fields that span lines (Spark's own CSV WRITER quotes embedded
        * newlines, so reading such output back REQUIRES this). Off by default: a
        * multiLine CSV file is not splittable — one file becomes one task — so at
        * scale prefer newline-free data or a binary format over enabling it.
        */
      multiLine: Boolean = false,
      extra: Map[String, String] = Map.empty)

  /** reference: sources/csv.rs:76-272 (single path, path list, glob all work). */
  def csv(spark: SparkSession, paths: Seq[String], options: CsvOptions = CsvOptions()): DataFrame =
    spark.read
      .option("header", options.header.toString)
      .option("sep", options.delimiter)
      .option("inferSchema", options.inferSchema.toString)
      .option("nullValue", options.nullValue)
      .option("multiLine", options.multiLine.toString)
      .options(options.extra)
      .csv(paths: _*)

  /** reference: sources/parquet.rs:65-172. */
  def parquet(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** ORC — free with Spark, beyond the reference's format set (columnar
    * alternative with the same pushdown/pruning properties as parquet). */
  def orc(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.orc(paths: _*)

  /** Raw text corpus: one row per LINE (column `value`) — the lowest-common-
    * denominator LLM-corpus interchange format (one document per line).
    * `wholeText = true` reads one row per FILE instead (document-per-file
    * layouts). No schema, no parsing — pair with the text operators.
    */
  def textLines(spark: SparkSession, paths: Seq[String],
      wholeText: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeText.toString).text(paths: _*)

  /** NDJSON or JSON-array, sniffed like the reference (sources/json.rs:17-237):
    * multiLine handles whole-file JSON arrays. Pass `schema` to skip inference — also
    * the only way a ZERO-ROW JSON dataset keeps its columns (there is nothing to
    * infer from, so an empty read without a schema yields a zero-column frame).
    */
  def json(spark: SparkSession, paths: Seq[String], jsonArray: Boolean = false,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val reader = spark.read.option("multiLine", jsonArray.toString)
    schema.fold(reader)(reader.schema).json(paths: _*)
  }

  /** reference: sources/database.rs (Postgres/MySQL/SQLite via DatabaseConfig). */
  final case class JdbcConfig(
      url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None,
      partitionColumn: Option[String] = None,
      numPartitions: Option[Int] = None,
      lowerBound: Option[Long] = None, upperBound: Option[Long] = None)

  def jdbc(spark: SparkSession, cfg: JdbcConfig): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
    cfg.user.foreach(u => r = r.option("user", u))
    cfg.password.foreach(p => r = r.option("password", p))
    cfg.driver.foreach(d => r = r.option("driver", d))
    // Partitioned reads are what make JDBC ingestion scale: without bounds the whole
    // table arrives through one connection. A PARTIAL partition spec must fail loud —
    // silently falling back to the single-connection read is exactly the degradation
    // the user configured against.
    val partNames = Seq("partitionColumn" -> cfg.partitionColumn, "numPartitions" -> cfg.numPartitions,
      "lowerBound" -> cfg.lowerBound, "upperBound" -> cfg.upperBound)
    // Name only the missing fields — interpolating cfg would put the PASSWORD into the
    // exception text (stack traces, driver logs, CI output).
    require(partNames.forall(_._2.isDefined) || partNames.forall(_._2.isEmpty),
      "JDBC partitioned read needs ALL of partitionColumn/numPartitions/lowerBound/upperBound " +
        s"(missing: ${partNames.collect { case (n, None) => n }.mkString(", ")})")
    (cfg.partitionColumn, cfg.numPartitions, cfg.lowerBound, cfg.upperBound) match {
      case (Some(c), Some(n), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", c).option("numPartitions", n.toString)
          .option("lowerBound", lo.toString).option("upperBound", hi.toString)
      case _ => ()
    }
    r.load()
  }

  /** Object stores (reference: sources/cloud.rs:30-250): same parquet/csv/json readers
    * over s3a://, gs://, abfss:// paths; credentials land in hadoopConfiguration.
    */
  def withS3Credentials(spark: SparkSession, accessKey: String, secretKey: String,
      endpoint: Option[String] = None): SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    endpoint.foreach(hc.set("fs.s3a.endpoint", _))
    spark
  }

  /** Joined view used as the table under validation
    * (reference: sources/joined.rs:37-210 — Inner/Left/Right/Full).
    */
  def joined(left: DataFrame, right: DataFrame,
      joinExprs: org.apache.spark.sql.Column, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "right", "full", "left_outer", "right_outer", "full_outer")
      .contains(joinType), s"unsupported join type $joinType")
    left.join(right, joinExprs, joinType)
  }

  /** Register for SQL access under a name (the reference's table-registration model). */
  def register(df: DataFrame, name: String): DataFrame = {
    df.createOrReplaceTempView(name); df
  }

  /** Persist a table bucketed (and sorted) by join/aggregation keys. Two tables
    * bucketed the same way join with NO shuffle of either side — at 100 TB the
    * difference between a co-located merge join and re-shuffling the fact table every
    * run. Bucket count should be sized so a bucket's data fits one task comfortably
    * (e.g. ~128-512 MB per bucket at target scale).
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCols: Seq[String],
      numBuckets: Int, sorted: Boolean = true): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .format("parquet").saveAsTable(tableName)
  }

  /** Read a previously saved bucketed table from the session catalog. */
  def table(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)

  /** Physical-layout audit of a parquet file or directory, from the footers alone
    * (no data read): one row per file with its size, row-group count, row totals,
    * per-group row min/max, and compressed/uncompressed byte totals. This is the
    * "small files / tiny row groups" diagnostic that decides 100 TB scan
    * performance before any query runs: a corpus of 10k-row row groups loses
    * predicate/rowgroup pruning granularity benefits to per-group overhead, and a
    * directory of 1 MB files drowns the driver in task scheduling — both invisible
    * to `count()` but obvious here.
    *
    * Cost model: a METADATA pass — O(files) footer reads, no data pages touched.
    * Runs on the driver (the audit is bounded by file count, not data; at extreme
    * file counts — O(100k)+ — shard the path list and union, or fix the layout
    * first: that many files IS the finding).
    */
  def parquetLayoutAudit(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val root = fs.getFileStatus(p)
    // Recursive listing: a Hive-partitioned layout (path/col=value/…, exactly
    // what writePartitioned produces) keeps its data files in subdirectories —
    // a top-level-only listStatus would audit it as zero files and downstream
    // sizing (compactSmallFiles) would silently compute totalBytes=0. Skip any
    // file living under a hidden ("_"/"."-prefixed) path component, matching
    // Spark's own scan-time convention (_SUCCESS, _temporary, .crc).
    val files =
      if (root.isDirectory) {
        def hidden(f: org.apache.hadoop.fs.Path): Boolean = {
          var cur = f
          var h = false
          while (cur != null && cur.toUri.getPath != root.getPath.toUri.getPath) {
            val n = cur.getName
            if (n.startsWith("_") || n.startsWith(".")) h = true
            cur = cur.getParent
          }
          h
        }
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && !hidden(st.getPath)) buf += st
        }
        buf.toSeq
      } else Seq(root)
    val rows = files.map { st =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, hconf))
      try {
        val blocks = rdr.getFooter.getBlocks.asScala.toSeq
        val counts = blocks.map(_.getRowCount)
        (st.getPath.toString, st.getLen, blocks.size.toLong, counts.sum,
          if (counts.nonEmpty) counts.min else 0L,
          if (counts.nonEmpty) counts.max else 0L,
          blocks.map(_.getCompressedSize).sum, blocks.map(_.getTotalByteSize).sum)
      } finally rdr.close()
    }
    rows.toDF("file", "file_bytes", "num_row_groups", "num_rows",
      "min_group_rows", "max_group_rows", "compressed_bytes", "uncompressed_bytes")
  }

  /** Compact a small-files parquet layout into ~`targetBytes` files — the fix for
    * what [[parquetLayoutAudit]] diagnoses (a 100 TB table written by 10k streaming
    * micro-batches is millions of KB-files: every scan pays open/footer/seek per
    * file and the driver pays listing + per-file task scheduling). Returns the
    * audit of the COMPACTED layout so the caller can assert the fix took.
    *
    * Sizing uses the source layout's actual on-disk bytes (footer audit, an
    * O(files) metadata pass — no data read): `files = ceil(bytes / targetBytes)`,
    * so the target is met in COMPRESSED terms, the ones that decide scan cost.
    * The rewrite itself is one narrow-shuffle `repartition(n)` + write — rows
    * move once, no sort is imposed (a layout that also wants clustering should
    * compose `repartitionByRange`/[[writeBucketed]] instead; re-sorting here
    * would silently double the price of every compaction that doesn't need it).
    *
    * `out` must differ from `in`: compact-in-place would delete the source under
    * the reader mid-job on failure — fail fast instead.
    */
  def compactSmallFiles(spark: SparkSession, in: String, out: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // Fully qualify both paths (filesystem + working dir + ".." resolution) before
    // comparing: a raw string compare lets "data/t" vs "/cwd/data/t" (or a "x/../t"
    // spelling) through, and the overwrite write would then delete the directory the
    // lazy source read is about to scan.
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String): org.apache.hadoop.fs.Path = {
      val path = new org.apache.hadoop.fs.Path(p)
      val q = path.getFileSystem(hconf).makeQualified(path) // fs + working dir
      new org.apache.hadoop.fs.Path(q.toUri.normalize()) // collapse "./" and "../"
    }
    require(qualified(in) != qualified(out),
      "compactSmallFiles cannot compact in place — write to a new path, then swap")
    val auditDf = parquetLayoutAudit(spark, in)
    // A Hive-partitioned input (data files under col=value/ subdirectories) must
    // not be compacted flat: the rewrite would silently discard the directory
    // pruning the layout exists for. Compact each partition directory instead,
    // or re-run writePartitioned with coarser sizing.
    val inPrefix = qualified(in).toString.stripSuffix("/") + "/"
    val partitioned = auditDf.select("file").collect().exists { r =>
      val rel = r.getString(0).stripPrefix(inPrefix)
      rel.split('/').dropRight(1).exists(_.contains("="))
    }
    require(!partitioned,
      s"compactSmallFiles: '$in' is a Hive-partitioned layout (col=value subdirectories); " +
        "compacting it flat would destroy partition pruning — compact per partition " +
        "directory or rewrite via writePartitioned")
    val audit = auditDf
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("file_bytes")),
        org.apache.spark.sql.functions.lit(0L)).as("bytes")).head()
    val totalBytes = audit.getLong(0)
    require(totalBytes > 0,
      s"compactSmallFiles: layout audit found no parquet data under '$in' — nothing to compact")
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(in).repartition(nFiles).write.mode("overwrite").parquet(out)
    parquetLayoutAudit(spark, out)
  }

  /** Hive-style partitioned parquet layout (`path/col=value/…`): filters on the
    * partition columns prune whole directories at planning time (PartitionFilters in
    * the scan) — the physical layout for time/tenant-sliced 100 TB corpora.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    // partitionBy() with zero columns silently writes a flat layout — the opposite of
    // this function's stated purpose (directory pruning); fail like writeBucketed does.
    require(partitionCols.nonEmpty, "writePartitioned needs at least one partition column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
