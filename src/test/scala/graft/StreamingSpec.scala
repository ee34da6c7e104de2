package graft

import graft.analyzers._
import graft.core._
import graft.streaming.StreamingAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("incremental sink folds micro-batches into cumulative metrics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val store = new InMemoryStateStore
    val runner = new IncrementalAnalysisRunner(store,
      Seq(SizeAnalyzer(), MeanAnalyzer("x")))
    val seen = scala.collection.mutable.Map.empty[Long, Map[String, MetricValue]]

    val q = StreamingAnalysis.incrementalSink(
      input.toDF().toDF("id", "x"), runner,
      (bid, m) => seen.synchronized { seen(bid) = m })
      .start()
    try {
      input.addData((1L, 10.0), (2L, 20.0))
      q.processAllAvailable()
      input.addData((3L, 60.0))
      q.processAllAvailable()
    } finally q.stop()

    val last = seen(seen.keys.max)
    assert(last("size.*").asDouble.get == 3.0)
    assert(math.abs(last("mean.x").asDouble.get - 30.0) < 1e-9)
    // states persisted per batch + cumulative
    assert(store.listPartitions("size.*").size == 3) // 2 batches + __cumulative__
  }

  test("windowed quality emits per-window completeness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Option[Double])]
    val stream = StreamingAnalysis.windowedQuality(
      input.toDF().toDF("ts", "v"), "ts", "10 minutes", "1 minute", Seq("v"))
    val q = stream.writeStream.format("memory").queryName("wq").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), Some(1.0)), (ts(2), None), (ts(3), Some(3.0)), (ts(4), Some(4.0)))
      q.processAllAvailable()
      // advance the watermark far enough to close the 10:00 window
      input.addData((ts(25), Some(9.0)))
      q.processAllAvailable()
      input.addData((ts(40), Some(9.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT row_count, non_null_v, completeness_v FROM wq").collect()
      assert(rows.nonEmpty, "closed window should have been emitted")
      val r = rows.head
      assert(r.getLong(0) == 4 && r.getLong(1) == 3 && math.abs(r.getDouble(2) - 0.75) < 1e-12)
    } finally q.stop()
  }

  test("keyed running moments fold state across micro-batches per key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Double)]
    val stream = StreamingAnalysis.keyedRunningMoments(
      input.toDF().toDF("k", "v"), "k", "v")
    val q = stream.writeStream.format("memory").queryName("krm").outputMode("update").start()
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
      q.processAllAvailable()
      input.addData(("a", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    // last update per key reflects the cumulative state, not just the final batch
    val byKey = spark.sql("SELECT key, n, mean, stddev FROM krm").collect()
      .groupBy(_.getString(0)).map { case (k, rows) => k -> rows.maxBy(_.getLong(1)) }
    val a = byKey("a")
    assert(a.getLong(1) == 3 && math.abs(a.getDouble(2) - 3.0) < 1e-9)
    assert(math.abs(a.getDouble(3) - 2.0) < 1e-9) // stddev_samp of 1,3,5
    val b = byKey("b")
    assert(b.getLong(1) == 1 && math.abs(b.getDouble(2) - 10.0) < 1e-9)
  }

  test("windowed metrics evaluate arbitrary aggregate columns per window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = StreamingAnalysis.windowedMetrics(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes", "1 minute",
      Seq(count(lit(1)).as("n"),
        sum(graft.functions.TextFunctions.tokenCount(col("text"))).as("tokens"),
        max(length(col("text"))).as("max_len")))
    val q = stream.writeStream.format("memory").queryName("wm").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), "two words"), (ts(2), "three small words"), (ts(3), "one"))
      q.processAllAvailable()
      input.addData((ts(25), "later"))
      q.processAllAvailable()
      input.addData((ts(40), "even later"))
      q.processAllAvailable()
      val r = spark.sql("SELECT n, tokens, max_len FROM wm ORDER BY n DESC").collect().head
      assert(r.getLong(0) == 3 && r.getLong(1) == 6 && r.getInt(2) == 17)
    } finally q.stop()
  }

  test("token throughput: per-source windowed rates, null-text zero tokens, null source group") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Option[String], Option[String])]
    val stream = StreamingAnalysis.tokenThroughput(
      input.toDF().toDF("ts", "text", "src"), "ts", "text", "src",
      "10 minutes", "1 minute")
    val q = stream.writeStream.format("memory").queryName("tp").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData(
        (ts(1), Some("two words"), Some("web")),
        (ts(2), Some("three small words"), Some("web")),
        (ts(3), None, Some("web")),             // doc counts, 0 tokens
        (ts(4), Some("one"), None))             // NULL source is a real group
      q.processAllAvailable()
      input.addData((ts(25), Some("later"), Some("web")))
      q.processAllAvailable()
      input.addData((ts(45), Some("flush"), Some("web")))
      q.processAllAvailable()
      val web = spark.sql(
        "SELECT docs, tokens, tokens_per_sec FROM tp WHERE source = 'web' ORDER BY docs DESC")
        .collect().head
      // window [10:00,10:10): 3 web docs, 2+3+0 = 5 tokens, 5/600 tokens/sec
      assert(web.getLong(0) == 3L && web.getLong(1) == 5L &&
        math.abs(web.getDouble(2) - 5.0 / 600.0) < 1e-12)
      val nullSrc = spark.sql(
        "SELECT docs, tokens FROM tp WHERE source IS NULL").collect()
      assert(nullSrc.length == 1 && nullSrc.head.getLong(0) == 1L &&
        nullSrc.head.getLong(1) == 1L)
    } finally q.stop()
  }

  test("windowed cardinality: per-window HLL estimates, sketches merge across windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Option[Long])]
    val stream = StreamingAnalysis.windowedCardinality(
      input.toDF().toDF("ts", "uid"), "ts", "uid", "10 minutes", "1 minute")
    val q = stream.writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      // Window 1: users 1,2,3 (3 distinct, with a repeat and a NULL).
      input.addData((ts(1), Some(1L)), (ts(2), Some(2L)), (ts(3), Some(2L)),
        (ts(4), Some(3L)), (ts(5), None))
      q.processAllAvailable()
      // Window 2: users 3,4 (overlap with window 1).
      input.addData((ts(12), Some(3L)), (ts(13), Some(4L)))
      q.processAllAvailable()
      input.addData((ts(45), Some(9L))) // push the watermark past both windows
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT approx_distinct FROM wc ORDER BY window_start").collect().map(_.getLong(0))
      assert(rows.take(2).toSeq == Seq(3L, 2L), s"got ${rows.toSeq}") // exact at tiny n
      // The persisted window sketches merge to the CLOSED windows' total distinct —
      // users {1,2,3} ∪ {3,4} (the 10:40 window stays open in append mode).
      val merged = graft.Metrics.mergeSketches(
        spark.sql("SELECT hll_sketch FROM wc")).head().getLong(0)
      assert(merged == 4L)
    } finally q.stop()
  }

  test("streaming exact dedup drops duplicate keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingAnalysis.streamingDedupExact(
      input.toDF().toDF("id", "payload"), Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("sde").outputMode("append").start()
    try {
      input.addData((1L, "a"), (2L, "b"), (1L, "a-again"))
      q.processAllAvailable()
      input.addData((2L, "b-later"), (3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.sql("SELECT id FROM sde").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // each key exactly once, across batches
  }

  test("streaming crawl ingestion: WARC blobs explode and charset-decode per micro-batch") {
    // the crawl entry point is stateless projection + generator + filter, so
    // the SAME responseTexts call runs under Structured Streaming unchanged —
    // a live crawl feed needs no second implementation
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Warc
    def blob(i: Int): Array[Byte] = Warc.encodeWarc(Seq(Warc.encodeResponseRecord(
      s"https://example.com/$i", "2026-01-01T00:00:00Z", s"<urn:uuid:s$i>", 200,
      "text/html; charset=iso-8859-1", // WHATWG: the label means windows-1252
      s"page $i café".getBytes(java.nio.charset.Charset.forName("windows-1252")))),
      gzip = i % 2 == 0)
    val input = MemoryStream[(Long, Array[Byte])]
    val texts = Warc.responseTexts(input.toDF().toDF("blob_id", "warc"), "warc")
    val q = texts.writeStream.format("memory").queryName("wstream")
      .outputMode("append").start()
    try {
      input.addData((1L, blob(1)), (2L, blob(2)))
      q.processAllAvailable()
      input.addData((3L, blob(3)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT blob_id, text, charset, charset_assumed FROM wstream")
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getString(1) == s"page ${r.getLong(0)} café"),
      rows.map(_.getString(1)).mkString("|"))
    assert(rows.forall(r => r.getString(2) == "windows-1252" && !r.getBoolean(3)))
  }

  test("streaming crawl ingestion decodes brotli response bodies per micro-batch") {
    // Content-Encoding: br through the built-in RFC 7932 decoder under
    // Structured Streaming — same records path as batch, no second impl
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Warc
    def blob(i: Int): Array[Byte] = {
      val text = s"brotli stream page $i".getBytes("UTF-8")
      val body = if (i % 2 == 0) graft.functions.Brotli.encodeUncompressed(text)
        else graft.functions.Brotli.encodeCompressedLiterals(text)
      Warc.encodeWarc(Seq(Warc.encodeResponseRecord(s"https://example.com/$i",
        "2026-01-01T00:00:00Z", s"<urn:uuid:b$i>", 200, "text/plain", body,
        contentEncoding = Some("br"))), gzip = i % 2 == 0)
    }
    val input = MemoryStream[(Long, Array[Byte])]
    val texts = Warc.responseTexts(input.toDF().toDF("blob_id", "warc"), "warc")
    val q = texts.writeStream.format("memory").queryName("wbrstream")
      .outputMode("append").start()
    try {
      input.addData((1L, blob(1)), (2L, blob(2)))
      q.processAllAvailable()
      input.addData((3L, blob(3)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT blob_id, text FROM wbrstream").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getString(1) == s"brotli stream page ${r.getLong(0)}"),
      rows.map(_.getString(1)).mkString("|"))
  }

  test("streaming fingerprint dedup drops whitespace-variant reposts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingAnalysis.streamingDedupFingerprint(
      input.toDF().toDF("id", "text"), "text")
    val q = deduped.writeStream.format("memory").queryName("sfd").outputMode("append").start()
    try {
      input.addData((1L, "hello  world"), (2L, " hello world "), (3L, "different"))
      q.processAllAvailable()
      input.addData((4L, "hello\tworld")) // same fingerprint again in a later batch
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id, text FROM sfd").collect()
    assert(rows.length == 2) // one "hello world" variant + "different"
    assert(rows.map(_.getString(1)).exists(_.contains("different")))
    assert(!rows.map(_.schema.fieldNames.toSeq).exists(_.contains("_fp"))) // helper col dropped
  }

  test("streaming fingerprint dedup passes null-text rows through, never dedups them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingAnalysis.streamingDedupFingerprint(
      input.toDF().toDF("id", "text"), "text")
    val q = deduped.writeStream.format("memory").queryName("sfdn").outputMode("append").start()
    try {
      // fingerprint(NULL) is NULL and dropDuplicates treats NULL keys as equal —
      // without the passthrough, rows 2 and 3 would silently vanish
      input.addData((1L, "real content"), (2L, null), (3L, null))
      q.processAllAvailable()
      input.addData((4L, null))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.sql("SELECT id FROM sfdn").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L), "every null-text row must survive")
  }

  test("streaming session_window stats close sessions at the gap and agree with batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(m: Int, s: Int = 0) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sessions = StreamingAnalysis.sessionStatsSink(
      input.toDF().toDF("ts", "user_id", "value"), "user_id", "ts",
      gapDuration = "5 minutes", watermarkDelay = "0 seconds",
      aggs = Seq(sum(col("value")).as("sum_value")))
    val q = sessions.writeStream.format("memory").queryName("ssw").outputMode("append").start()
    try {
      // user 7: two events 2 min apart (one session), then 20 min silence (new one)
      input.addData((ts(0), 7L, 1.0), (ts(2), 7L, 2.0), (ts(22), 7L, 4.0))
      q.processAllAvailable()
      // advance the watermark far enough to close every session above
      input.addData((ts(59), 99L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT user_id, n_events, sum_value FROM ssw WHERE user_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
    assert(rows.toSeq == Seq((7L, 1L, 4.0), (7L, 2L, 3.0)),
      s"closed sessions wrong: ${rows.toSeq}")
    // batch twin agrees on the session partition (same gap, same events)
    val batch = Seq((7L, ts(0)), (7L, ts(2)), (7L, ts(22))).toDF("user_id", "ts")
    val bStats = graft.operators.Sessions.sessionStats(batch, "user_id", "ts", 300)
      .select("n_events").as[Long].collect().sorted
    assert(bStats.toSeq == Seq(1L, 2L), "batch and streaming session partitions must agree")
    // reserved output names fail loud instead of being clobbered by the unpack
    intercept[IllegalArgumentException](StreamingAnalysis.sessionStatsSink(
      input.toDF().toDF("ts", "user_id", "value"), "user_id", "ts", "5 minutes",
      "0 seconds", aggs = Seq(min(col("ts")).as("session_start"))))
  }

  test("streaming simhash dedup drops token-reorder reposts; tokenless rows pass through") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingAnalysis.streamingDedupSimhash(
      input.toDF().toDF("id", "text"), "text")
    val q = deduped.writeStream.format("memory").queryName("ssh").outputMode("append").start()
    try {
      // rows 1 and 2 are token REORDERS (identical token multiset -> identical
      // simhash) — fingerprint dedup would keep both; simhash keeps one
      input.addData(
        (1L, "alpha beta gamma delta"),
        (2L, "delta gamma beta alpha"),
        (3L, "entirely different content"))
      q.processAllAvailable()
      input.addData((4L, "beta alpha delta gamma")) // same multiset, later batch
      q.processAllAvailable()
      // tokenless rows have no content identity: all survive, never collapse
      input.addData((5L, null), (6L, ""), (7L, "   "))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id FROM ssh").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows.count(Set(1L, 2L, 4L)) == 1L, s"reorders must collapse to one: $rows")
    assert(rows.contains(3L))
    assert(Seq(5L, 6L, 7L).forall(rows.contains), s"tokenless rows must pass through: $rows")
    assert(!spark.table("ssh").schema.fieldNames.contains("_sh"))
  }

  test("streaming image-hash dedup drops re-containered reposts; undecodable rows pass through") {
    import graft.operators.Multimodal.MediaCodecs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Int)]
    // encode on the STREAM side so payloads flow through the plan as real binary
    val mk = udf((kind: Int) => kind match {
      case 1 => MediaCodecs.encodeNoiseImage(24, 16, "png", 7L)
      case 2 => MediaCodecs.encodeNoiseImage(24, 16, "bmp", 7L) // same pixels, new container
      case 3 => MediaCodecs.encodeNoiseImage(24, 16, "png", 8L) // distinct content
      case 4 => null.asInstanceOf[Array[Byte]]
      case _ => "not an image".getBytes
    })
    val deduped = StreamingAnalysis.streamingDedupImageHash(
      input.toDF().select(col("_1").as("id"), mk(col("_2")).as("img")), "img")
    val q = deduped.writeStream.format("memory").queryName("sih").outputMode("append").start()
    try {
      input.addData((1L, 1), (2L, 2), (3L, 3)) // 1 and 2: same pixels -> one survives
      q.processAllAvailable()
      input.addData((4L, 1)) // repost in a later batch -> dropped
      q.processAllAvailable()
      input.addData((5L, 4), (6L, 5), (7L, 5)) // undecodable: ALL pass through
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id FROM sih").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows.count(Set(1L, 2L, 4L)) == 1, s"same-pixel reposts must collapse: $rows")
    assert(rows.contains(3L))
    assert(Seq(5L, 6L, 7L).forall(rows.contains), s"undecodable rows must pass through: $rows")
    assert(!spark.table("sih").schema.fieldNames.contains("_ih"))
  }

  test("streaming audio-hash dedup drops reposted clips; undecodable and silent rows pass through") {
    import graft.operators.Multimodal.MediaCodecs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Int)]
    // encode on the STREAM side so payloads flow through the plan as real binary
    val mk = udf((kind: Int) => kind match {
      case 1 => MediaCodecs.encodeNoiseWav(8000, 4096, 7L)
      case 2 => MediaCodecs.encodeNoiseWav(8000, 4096, 8L) // distinct content
      case 3 => MediaCodecs.encodeWavPcm(8000, new Array[Byte](4096)) // silence
      case _ => "not audio".getBytes
    })
    val deduped = StreamingAnalysis.streamingDedupAudioHash(
      input.toDF().select(col("_1").as("id"), mk(col("_2")).as("snd")), "snd")
    val q = deduped.writeStream.format("memory").queryName("sah").outputMode("append").start()
    try {
      input.addData((1L, 1), (2L, 1), (3L, 2)) // 1 and 2: same clip -> one survives
      q.processAllAvailable()
      input.addData((4L, 1)) // repost in a later batch -> dropped
      q.processAllAvailable()
      input.addData((5L, 3), (6L, 3), (7L, 4)) // silent + non-audio: ALL pass through
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id FROM sah").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows.count(Set(1L, 2L, 4L)) == 1, s"same-clip reposts must collapse: $rows")
    assert(rows.contains(3L))
    assert(Seq(5L, 6L, 7L).forall(rows.contains), s"fingerprint-less rows must pass through: $rows")
    assert(!spark.table("sah").schema.fieldNames.contains("_ah"))
  }

  test("streaming dedup with watermark bounds state and dedups within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = StreamingAnalysis.streamingDedupExact(
      input.toDF().toDF("ts", "key"), Seq("key"), watermark = Some(("ts", "10 minutes")))
    val q = deduped.writeStream.format("memory").queryName("sdw").outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), 7L), (ts(2), 7L)) // dup within horizon → one survivor
      q.processAllAvailable()
      input.addData((ts(5), 8L))
      q.processAllAvailable()
    } finally q.stop()
    val keys = spark.sql("SELECT key FROM sdw").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == Seq(7L, 8L))
  }

  test("anomaly sink flags metric jumps across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val repo = new graft.repository.InMemoryMetricsRepository
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[graft.analyzers.Anomaly])]
    val q = StreamingAnalysis.anomalySink(
      input.toDF().toDF("v"),
      b => b.count().toDouble,
      "size.stream",
      repo,
      graft.analyzers.AbsoluteChangeStrategy(maxIncrease = Some(5.0)),
      (bid, as) => hits.synchronized { hits += bid -> as })
      .start()
    try {
      input.addData(1L, 2L, 3L) // batch of 3
      q.processAllAvailable()
      input.addData(1L, 2L) // batch of 2 — small change, no anomaly
      q.processAllAvailable()
      input.addData(1L to 20L: _*) // batch of 20 — jump of 18 > 5
      q.processAllAvailable()
    } finally q.stop()
    assert(repo.history("size.stream").map(_._2) == Seq(3.0, 2.0, 20.0))
    assert(hits.nonEmpty && hits.last._2.nonEmpty, "the 2→20 jump must be flagged")
  }

  test("anomaly sink replay re-alerts without re-saving; checkpoint-reset collision fails loud") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // REPLAY: batch 0's point (count=20) is already in history from a prior attempt
    // that died between save and alert — the sink must re-run detection (at-least-once
    // alerting) and must NOT append a duplicate history point.
    val repo = new graft.repository.InMemoryMetricsRepository
    repo.save(graft.repository.ResultKey(-5L), Map("m" -> 2.0))
    repo.save(graft.repository.ResultKey(0L), Map("m" -> 20.0))
    val hits = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[Long]
    val q = StreamingAnalysis.anomalySink(
      input.toDF().toDF("v"), b => b.count().toDouble, "m", repo,
      graft.analyzers.AbsoluteChangeStrategy(maxIncrease = Some(5.0)),
      (bid, _) => hits.synchronized { hits += bid }).start()
    try {
      input.addData(1L to 20L: _*) // batch 0 recomputes 20.0 == saved → replay branch
      q.processAllAvailable()
    } finally q.stop()
    assert(hits.toSeq == Seq(0L), "replayed batch must re-fire its anomaly")
    assert(repo.history("m") == Seq(-5L -> 2.0, 0L -> 20.0), "no duplicate history point")

    // COLLISION: same batch id, different metric value (fresh checkpoint writing into
    // existing history) must kill the query loudly, not silently drop batches.
    val repo2 = new graft.repository.InMemoryMetricsRepository
    repo2.save(graft.repository.ResultKey(0L), Map("m" -> 999.0))
    val input2 = MemoryStream[Long]
    val q2 = StreamingAnalysis.anomalySink(
      input2.toDF().toDF("v"), b => b.count().toDouble, "m", repo2,
      graft.analyzers.AbsoluteChangeStrategy(maxIncrease = Some(5.0)),
      (_, _) => ()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input2.addData(1L, 2L, 3L) // batch 0 computes 3.0 != 999.0
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(ex.getMessage.contains("anomalySink") ||
      Option(ex.getCause).exists(_.getMessage.contains("fresh checkpoint")))
  }

  test("anomaly sink detects replay and collision BEYOND the bounded history window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // historyLimit=3, but history already holds batch 0 plus newer points 1..5: the
    // newest-3 window (3,4,5) does not contain batch 0, so only the exact-key probe
    // can see the prior point. A fresh-checkpoint collision at batch 0 must still
    // fail loud, not silently re-save (the pre-fix behavior).
    val repo = new graft.repository.InMemoryMetricsRepository
    repo.save(graft.repository.ResultKey(0L), Map("m" -> 999.0))
    (1L to 5L).foreach(ts => repo.save(graft.repository.ResultKey(ts), Map("m" -> 1.0)))
    val input = MemoryStream[Long]
    val q = StreamingAnalysis.anomalySink(
      input.toDF().toDF("v"), b => b.count().toDouble, "m", repo,
      graft.analyzers.AbsoluteChangeStrategy(maxIncrease = Some(5.0)),
      (_, _) => (), historyLimit = Some(3)).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input.addData(1L, 2L, 3L) // batch 0 computes 3.0 != 999.0, outside the window
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(ex.getMessage.contains("anomalySink") ||
      Option(ex.getCause).exists(_.getMessage.contains("fresh checkpoint")))

    // Genuine replay beyond the window: same value at batch 0 → no duplicate point,
    // no exception, history unchanged — and the batch's alert RE-FIRES even though
    // its point is absent from the bounded window (at-least-once alerting).
    val levelStrategy = new graft.analyzers.AnomalyDetectionStrategy {
      val name = "level"
      def detect(series: Seq[(Long, Double)]): Seq[graft.analyzers.Anomaly] =
        series.collect { case (ts, v) if v > 10.0 => graft.analyzers.Anomaly(ts, v, "level") }
    }
    val repo2 = new graft.repository.InMemoryMetricsRepository
    repo2.save(graft.repository.ResultKey(0L), Map("m" -> 20.0))
    (1L to 5L).foreach(ts => repo2.save(graft.repository.ResultKey(ts), Map("m" -> 1.0)))
    val hits2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input2 = MemoryStream[Long]
    val q2 = StreamingAnalysis.anomalySink(
      input2.toDF().toDF("v"), b => b.count().toDouble, "m", repo2,
      levelStrategy, (bid, _) => hits2.synchronized { hits2 += bid },
      historyLimit = Some(3)).start()
    try {
      input2.addData(1L to 20L: _*) // batch 0 recomputes 20.0 == saved → replay branch
      q2.processAllAvailable()
    } finally q2.stop()
    assert(repo2.history("m").size == 6, "replay must not append a duplicate point")
    assert(hits2.toSeq == Seq(0L), "beyond-window replay must re-fire its alert")
  }

  test("keyed running moments survive non-numeric values (cast-null filter)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val stream = StreamingAnalysis.keyedRunningMoments(
      input.toDF().toDF("k", "v"), "k", "v") // v is a STRING column
    val q = stream.writeStream.format("memory").queryName("krm2").outputMode("update").start()
    try {
      // "garbage" casts to null; "NaN"/"Infinity" try_cast to NON-null non-finites
      // that would poison the key's running sums forever — all three must filter out.
      input.addData(("a", "1.5"), ("a", "garbage"), ("a", "NaN"), ("a", "Infinity"), ("a", "2.5"))
      q.processAllAvailable()
    } finally q.stop()
    val r = spark.sql("SELECT n, mean FROM krm2 WHERE key = 'a'").collect().head
    assert(r.getLong(0) == 2 && math.abs(r.getDouble(1) - 2.0) < 1e-9)
  }

  test("windowedMetrics rejects aggregate aliases that collide with window_start/window_end") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val ex = intercept[IllegalArgumentException] {
      StreamingAnalysis.windowedMetrics(input.toDF().toDF("ts", "v"), "ts",
        "1 minute", "1 minute",
        Seq(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
          .as("window_start")))
    }
    assert(ex.getMessage.contains("window_start"), ex.getMessage)
  }

  test("constraint sink evaluates batchable constraints per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[ConstraintResult])]
    val q = StreamingAnalysis.constraintSink(
      input.toDF().toDF("id", "status"),
      Seq(graft.constraints.SizeConstraint(Assertion.GreaterThan(0)),
        graft.constraints.ComplianceConstraint.containedIn("status", Seq("ok", "warn"))),
      (bid, rs) => results.synchronized { results += bid -> rs })
      .start()
    try {
      input.addData((1L, "ok"), (2L, "bad"))
      q.processAllAvailable()
    } finally q.stop()
    val rs = results.head._2
    assert(rs.head.isSuccess)
    assert(rs(1).isFailure) // "bad" not contained
  }

  test("streaming decontamination gate: contaminated batch fails, clean batch passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (100L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = StreamingAnalysis.constraintSink(
      input.toDF().toDF("doc_id", "text"),
      Seq(graft.constraints.DecontaminationConstraint(corpus, "text", "doc_id", "text", 8)),
      (bid, rs) => results.synchronized { results += bid -> rs.head.isSuccess })
      .start()
    try {
      input.addData((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      q.processAllAvailable()
      input.addData((2L, "zz one two three four five six seven eight yy"))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = results.toMap
    assert(byBatch(0L), "clean batch must pass the zero-contamination gate")
    assert(!byBatch(1L), "batch sharing an 8-gram with the corpus must fail")
  }

  test("row-local pipeline transforms (PII redaction, chunking) run on streams") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    // Redact-then-chunk as a streaming projection: both operators are pure row-local
    // plans, so they compose into readStream->transform->writeStream unchanged.
    val out = graft.operators.Chunking.chunkByTokens(
      graft.operators.Pii.redactDf(input.toDF().toDF("doc_id", "text"), "text"),
      "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
    val q = out.writeStream.format("memory").queryName("graft_stream_chunks")
      .outputMode("append").start()
    try {
      input.addData((1L, "mail a@b.co then one two three four five six"),
        (2L, ""))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("graft_stream_chunks")
      .orderBy("doc_id", "chunk_id")
      .select("chunk_text").as[String].collect()
    // 9 tokens, stride 3 -> ceil(8/3) = 3 windows; redaction already applied.
    assert(rows.toSeq == Seq(
      "mail [EMAIL] then one", "one two three four", "four five six"))
  }

  test("drift sink: quiet on matching mix, fires on shift with batch-psi parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val reference = Seq.fill(50)("a").map(Tuple1(_)).toDF("cat")
      .unionByName(Seq.fill(50)("b").map(Tuple1(_)).toDF("cat"))
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val input = MemoryStream[String]
    val q = StreamingAnalysis.driftSink(
      input.toDF().toDF("cat"), "cat", reference, "cat",
      (bid, psi) => hits.synchronized { hits += bid -> psi }, threshold = 0.25)
      .start()
    try {
      input.addData(Seq.fill(10)("a") ++ Seq.fill(10)("b"): _*) // same mix: quiet
      q.processAllAvailable()
      input.addData(Seq.fill(20)("a"): _*) // all-a batch: b's mass vanished
      q.processAllAvailable()
    } finally q.stop()
    assert(hits.map(_._1).toSeq == Seq(1L), s"only the shifted batch alerts: $hits")
    // parity with the batch operator on the same frames
    val batchPsi = graft.operators.Drift.psi(
      reference, Seq.fill(20)("a").map(Tuple1(_)).toDF("cat"), "cat")
      .head().getDouble(0)
    assert(math.abs(hits.head._2 - batchPsi) < 1e-9,
      s"streaming psi ${hits.head._2} != batch psi $batchPsi")
    // a continuous column fails loud instead of growing the driver map
    val e = intercept[IllegalArgumentException] {
      StreamingAnalysis.driftSink(
        input.toDF().toDF("cat"), "cat",
        (1 to 20001).map(i => Tuple1(i.toString)).toDF("cat"), "cat",
        (_, _) => (), maxCategories = 20000)
    }
    assert(e.getMessage.contains("does not look categorical"), e.getMessage)
    // cross-type categories would box to unequal keys and false-alert every batch
    val eT = intercept[IllegalArgumentException] {
      StreamingAnalysis.driftSink(
        input.toDF().toDF("cat"), "cat", Seq(1, 2).toDF("cat"), "cat", (_, _) => ())
    }
    assert(eT.getMessage.contains("cast them to one type"), eT.getMessage)
    // an empty reference is a gate that can never fire — fail at construction
    val eE = intercept[IllegalArgumentException] {
      StreamingAnalysis.driftSink(
        input.toDF().toDF("cat"), "cat", reference.filter(lit(false)), "cat", (_, _) => ())
    }
    assert(eE.getMessage.contains("can never fire"), eE.getMessage)
  }

  test("drift sink: binary categories compare by value, nested binary rejected") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Byte-array categories: Row.get hands back Array[Byte] with reference
    // equality — unnormalized, the same category from reference and batch would
    // never match and PSI would false-alert every batch.
    val reference = Seq.fill(50)(Array[Byte](1)).map(Tuple1(_)).toDF("cat")
      .unionByName(Seq.fill(50)(Array[Byte](2)).map(Tuple1(_)).toDF("cat"))
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val input = MemoryStream[Int]
    val q = StreamingAnalysis.driftSink(
      input.toDF().select(when(col("value") <= 10, Array[Byte](1))
        .otherwise(Array[Byte](2)).as("cat")), "cat",
      reference, "cat",
      (bid, psi) => hits.synchronized { hits += bid -> psi }, threshold = 0.25)
      .start()
    try {
      input.addData(1 to 20: _*) // 10×[1] + 10×[2]: same mix as reference — quiet
      q.processAllAvailable()
      input.addData(1 to 10: _*) // all-[1] batch: [2]'s mass vanished — alert
      q.processAllAvailable()
    } finally q.stop()
    assert(hits.map(_._1).toSeq == Seq(1L),
      s"binary categories must match by value — only the shifted batch alerts: $hits")
    // Binary nested in an array key still compares by reference a level down.
    val nestedRef = Seq.fill(2)(Seq(Array[Byte](1))).map(Tuple1(_)).toDF("cat")
    val eN = intercept[IllegalArgumentException] {
      StreamingAnalysis.driftSink(
        input.toDF().select(array(when(col("value") <= 10, Array[Byte](1))).as("cat")),
        "cat", nestedRef, "cat", (_, _) => ())
    }
    assert(eN.getMessage.contains("nests binary"), eN.getMessage)
  }

  // ---------- banded-recall near-dup sinks (foreachBatch + persisted index) ----------

  // shared recursive-cleanup temp dirs (SparkSpec.tmpDir) — deleteOnExit cannot
  // remove non-empty directories and these fill with parquet
  private def freshDir(tag: String): String = tmpDir(s"graft_stream_$tag")

  test("streaming banded minhash dedup catches a token-EDIT repost across micro-batches " +
    "(simhash Hamming > 0) and matches the batch pass") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dedup
    // Long non-repetitive base text: a one-word edit + one adjacent-word swap keeps
    // char-5-gram Jaccard >= 0.9 while CHANGING the token multiset, so the simhash
    // gate (order-invariant, equality-keyed) cannot catch it — the case banded
    // recall exists for.
    val base = "the quick brown fox jumps over the lazy dog while the river runs " +
      "under the old stone bridge near the quiet village in the early morning light " +
      "and the fisherman carries his woven basket along the muddy path toward the " +
      "market square where traders arrange their copper pots beside fresh baskets " +
      "of grain and children chase a wooden hoop between the stalls as the church " +
      "bell rings across the valley announcing the start of another slow summer day " +
      "in the province far from the railway and the noisy harbor town"
    // Candidate token EDITS (not pure reorders — those keep the simhash identical).
    // The test picks the first that moves the simhash (Hamming > 0, so the old
    // equality-keyed gate passes it through) while staying a true near-dup
    // (char-5-gram Jaccard >= 0.9) — deterministic given the fixed list, and a
    // loud failure if token-hash details ever shift every candidate out of range.
    val candidates = Seq(
      base.replace("stone", "steel").replace("village", "hamlet"),
      base.replace("stone", "steel").replace("village", "hamlet").replace("copper", "bronze"),
      base.replace("morning", "evening").replace("summer", "winter").replace("stone", "steel"),
      base.replace("fisherman", "ferryman").replace("stone", "steel").replace("hoop", "ring"),
      base.replace("stone", "steel").replace("copper", "bronze").replace("woven", "wicker")
        .replace("railway", "highway"))
    val unrelatedA = "completely different subject matter entirely: orbital mechanics " +
      "of small icy moons, resonance chains, tidal heating budgets and libration"
    val unrelatedB = "yet another distinct document about sourdough hydration ratios, " +
      "autolyse timing, oven spring and crumb structure under steam"

    val hams = (base +: candidates).toDF("text")
      .select(Dedup.simhash64(graft.functions.TextFunctions.tokens(col("text"))).as("h"))
      .collect().map(_.getLong(0))
    val jacs = Dedup.exactJaccard(
      candidates.indices.map(i => (0L, i + 1L)).toDF("id_a", "id_b"),
      ((0L, base) +: candidates.zipWithIndex.map { case (t, i) => (i + 1L, t) })
        .toDF("id", "text"), "id", "text")
      .select("id_b", "jaccard").collect()
      .map(r => r.getLong(0).toInt - 1 -> r.getDouble(1)).toMap
    val pick = candidates.indices.find { i =>
      java.lang.Long.bitCount(hams(0) ^ hams(i + 1)) > 0 && jacs(i) >= 0.9
    }
    assert(pick.nonEmpty, "no candidate edit has simhash Hamming > 0 AND Jaccard >= 0.9: " +
      candidates.indices.map(i =>
        s"ham=${java.lang.Long.bitCount(hams(0) ^ hams(i + 1))} jac=${jacs(i)}").mkString(", "))
    val nearDup = candidates(pick.get)

    val indexDir = freshDir("ndidx")
    val survivorsDir = freshDir("ndsurv")
    val input = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.Map[Long, Long]()
    val q = StreamingAnalysis.nearDupDedupSink(
      input.toDF().toDF("id", "text"), "id", "text", indexDir, survivorsDir,
      threshold = 0.9, onBatch = (b, n) => counts.synchronized { counts(b) = n })
      .outputMode("update").start()
    try {
      input.addData((1L, base), (2L, unrelatedA))
      q.processAllAvailable()
      // the repost arrives TWO micro-batches later with fresh docs + a null row
      input.addData((3L, nearDup), (4L, unrelatedB), (5L, null))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(survivorsDir)
    val keptIds = landed.select("id").collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 2L, 4L, 5L),
      s"near-dup 3 must drop across micro-batches, null text must pass: $keptIds")
    assert(counts.synchronized(counts.toMap) == Map(0L -> 2L, 1L -> 2L), counts.toString)

    // parity with the batch keep-lowest pass over the SAME event set (ids are
    // arrival-ordered — the documented parity contract)
    val allDocs = Seq((1L, base), (2L, unrelatedA), (3L, nearDup),
      (4L, unrelatedB), (5L, null.asInstanceOf[String])).toDF("id", "text")
    val batchKept = Dedup.dedupNearMinhash(allDocs, "id", "text", threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchKept == keptIds, s"batch pass kept $batchKept, streaming kept $keptIds")

    // replayed batch (foreachBatch at-least-once): overwriting its own batch=<id>
    // partitions must leave the stores EXACTLY as before, not double-land
    val replay = StreamingAnalysis.nearDupDedupBatch(
      Seq((3L, nearDup), (4L, unrelatedB), (5L, null.asInstanceOf[String])).toDF("id", "text"),
      batchId = 1L, "id", "text", indexDir, survivorsDir, threshold = 0.9)
    assert(replay.select("id").collect().map(_.getLong(0)).toSet == Set(4L, 5L))
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 5L), "replay must not double-land")
  }

  test("streaming banded dedup survives a ZERO-survivor batch (empty store partition)") {
    import spark.implicits._
    val indexDir = freshDir("zidx")
    val survivorsDir = freshDir("zsurv")
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val b0 = StreamingAnalysis.nearDupDedupBatch(
      Seq((1L, text)).toDF("id", "text"), 0L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(b0.count() == 1L)
    // batch 1: every row an exact dup of the landed doc -> ZERO survivors; its
    // batch=1 partitions hold only _SUCCESS (the schema-inference breaker the
    // explicit-schema read exists for)
    val b1 = StreamingAnalysis.nearDupDedupBatch(
      Seq((2L, text), (3L, text)).toDF("id", "text"), 1L, "id", "text",
      indexDir, survivorsDir, 0.9)
    assert(b1.count() == 0L, "exact dups of a landed doc must all drop")
    // batch 2 must read BOTH stores through the empty partition without error,
    // still dedup against batch 0's doc, and land the fresh one
    val b2 = StreamingAnalysis.nearDupDedupBatch(
      Seq((4L, text), (5L, "a completely different fresh document about sourdough " +
        "hydration ratios oven spring and crumb structure under steam"))
        .toDF("id", "text"), 2L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(b2.select("id").collect().map(_.getLong(0)).toSet == Set(5L))
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 5L))
  }

  test("streaming banded image dedup catches a Hamming-1 repost the equality gate misses") {
    import graft.operators.Multimodal
    import spark.implicits._
    // 64x64 image of 8x8 uniform cells, black or white per bit: aHash bit b IS cell b.
    // The variant flips ONE cell — Hamming exactly 1, invisible to equality-keyed state.
    def cellImage(bits: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 64) {
        var x = 0
        while (x < 64) {
          val cell = (y / 8) * 8 + (x / 8)
          img.setRGB(x, y, if (((bits >>> cell) & 1L) == 1L) 0xffffff else 0x000000)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val basePattern = 0x5a5a3c3cf0f01e1eL
    val baseImg = cellImage(basePattern)
    val flipped = cellImage(basePattern ^ (1L << 17)) // one cell differs
    val other = cellImage(0x0f0f0f0f0f0f0f0fL)
    val hashes = Seq((1L, baseImg), (2L, flipped)).toDF("id", "img")
    val hs = Multimodal.imageHashIndex(hashes, "id", "img")
      .orderBy("id").collect().map(_.getLong(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) == 1,
      s"fixture must be Hamming 1, got ${java.lang.Long.bitCount(hs(0) ^ hs(1))}")

    val indexDir = freshDir("imgidx")
    val b0 = StreamingAnalysis.imageDedupBatch(
      Seq((1L, baseImg), (2L, other)).toDF("id", "img"), 0L, "id", "img", indexDir)
    assert(b0.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // later micro-batch: the flipped repost + an undecodable payload
    val b1 = StreamingAnalysis.imageDedupBatch(
      Seq((3L, flipped), (4L, "not an image".getBytes)).toDF("id", "img"),
      1L, "id", "img", indexDir)
    val kept = b1.select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"Hamming-1 repost must drop, undecodable must pass: $kept")
    // the index persisted only survivors' hashes: 1, 2 (id 4 has no hash; 3 dropped)
    val idx = spark.read.parquet(indexDir).select("id").collect().map(_.getLong(0)).toSet
    assert(idx == Set(1L, 2L), s"index must hold survivors' hashes only: $idx")
  }

  test("streaming video dedup drops cross-batch clip reposts via the frame-hash index") {
    import graft.operators.Multimodal.MediaCodecs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mk = (seed: Long) => MediaCodecs.encodeAnimatedGif(24, 16, 3, seed)
    // the writeStream adapter drives batch 0 through a real micro-batch
    val indexDirS = freshDir("vididxs")
    val landed = scala.collection.mutable.Map[Long, Set[Long]]()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamingAnalysis.videoDedupSink(
      input.toDF().toDF("id", "clip"), "id", "clip", indexDirS, compactEvery = 2,
      land = (b, df) => landed.synchronized {
        landed(b) = df.select("id").collect().map(_.getLong(0)).toSet
      }).outputMode("update").start()
    try {
      input.addData((1L, mk(5)), (2L, mk(9)))
      q.processAllAvailable()
      input.addData((3L, mk(5))) // cross-micro-batch repost
      q.processAllAvailable()
      input.addData((4L, mk(9))) // batch 2: repost again — and the cadence fires
      q.processAllAvailable()
    } finally q.stop()
    assert(landed.synchronized(landed.toMap) ==
      Map(0L -> Set(1L, 2L), 1L -> Set(), 2L -> Set()),
      s"sink must drop the cross-batch reposts: $landed")
    // the VIDEO sink's compactEvery wiring folded the index at batch 2 (committed
    // past = batches 0..1), leaving one fold + the live batch partition
    val foldDirs = new java.io.File(indexDirS).listFiles().map(_.getName)
      .filter(_.startsWith("_graft_batch=")).toSet
    assert(foldDirs == Set("_graft_batch=-1", "_graft_batch=2"), foldDirs.toString)

    val indexDir = freshDir("vididx")
    val b0 = StreamingAnalysis.videoDedupBatch(
      Seq((1L, mk(5)), (2L, mk(9))).toDF("id", "clip"), 0L, "id", "clip", indexDir)
    assert(b0.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // later micro-batch: a repost of clip 1's content + a fresh clip + junk bytes
    val b1 = StreamingAnalysis.videoDedupBatch(
      Seq((3L, mk(5)), (4L, mk(7)), (5L, "not a video".getBytes))
        .toDF("id", "clip"), 1L, "id", "clip", indexDir)
    val kept = b1.select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L, 5L), s"repost must drop, fresh + undecodable pass: $kept")
    // the index persisted only survivors' frame rows: clips 1, 2, 4 (3 frames each;
    // the junk payload yields no hashable frames)
    val idx = spark.read.parquet(indexDir).select("id").collect().map(_.getLong(0))
    assert(idx.toSet == Set(1L, 2L, 4L) && idx.length == 9,
      s"index must hold survivors' frame hashes only: ${idx.toSeq.sorted}")
  }

  test("streaming banded audio dedup catches a Hamming-1 repost the equality gate misses") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodecs
    import spark.implicits._
    // 8-bit mono PCM, 64 windows x 64 samples: window w is LOUD (alternating +/-64
    // around the 128 bias) or SILENT per bit w of the pattern — the envelope hash
    // bit IS the window's loudness vs the mean. One flipped window = Hamming 1.
    def clip(bits: Long): Array[Byte] = {
      val data = new Array[Byte](64 * 64)
      var i = 0
      while (i < data.length) {
        val w = i / 64
        data(i) =
          if (((bits >>> w) & 1L) == 1L) (128 + (if (i % 2 == 0) 64 else -64)).toByte
          else 128.toByte
        i += 1
      }
      MediaCodecs.encodeWavPcm(8000, data)
    }
    val basePattern = 0x3c3c5a5a0ff0e11eL
    val baseClip = clip(basePattern)
    val flipped = clip(basePattern ^ (1L << 40))
    val other = clip(0xf00ff00f3c3c3c3cL)
    val hs = Multimodal.audioHashIndex(
      Seq((1L, baseClip), (2L, flipped)).toDF("id", "snd"), "id", "snd")
      .orderBy("id").collect().map(_.getLong(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) == 1,
      s"fixture must be Hamming 1, got ${java.lang.Long.bitCount(hs(0) ^ hs(1))}")

    val indexDir = freshDir("sndidx")
    val b0 = StreamingAnalysis.audioDedupBatch(
      Seq((1L, baseClip), (2L, other)).toDF("id", "snd"), 0L, "id", "snd", indexDir)
    assert(b0.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val b1 = StreamingAnalysis.audioDedupBatch(
      Seq((3L, flipped), (4L, "not audio".getBytes)).toDF("id", "snd"),
      1L, "id", "snd", indexDir)
    val kept = b1.select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"Hamming-1 repost must drop, undecodable must pass: $kept")
    val idx = spark.read.parquet(indexDir).select("id").collect().map(_.getLong(0)).toSet
    assert(idx == Set(1L, 2L), s"index must hold survivors' hashes only: $idx")
  }

  test("store parameter drift fails LOUD: changed banding, changed frame params, " +
    "cross-family store reuse") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val indexDir = freshDir("pdidx")
    val survivorsDir = freshDir("pdsurv")
    StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
      0L, "id", "text", indexDir, survivorsDir, 0.9) // pins bands=16 etc.
    // same store, drifted banding: bands can never match — must throw, not degrade
    val e1 = intercept[IllegalArgumentException] {
      StreamingAnalysis.nearDupDedupBatch(Seq((2L, text)).toDF("id", "text"),
        1L, "id", "text", indexDir, survivorsDir, 0.9, bands = 8)
    }
    assert(e1.getMessage.contains("parameters"), e1.getMessage)
    // drifted shard count silently mis-prunes the survivors read — equally fatal
    val e2 = intercept[IllegalArgumentException] {
      StreamingAnalysis.nearDupDedupBatch(Seq((2L, text)).toDF("id", "text"),
        1L, "id", "text", indexDir, survivorsDir, 0.9, idShards = 32)
    }
    assert(e2.getMessage.contains("parameters"), e2.getMessage)
    // unchanged parameters keep working after the rejected attempts
    val ok = StreamingAnalysis.nearDupDedupBatch(Seq((2L, text)).toDF("id", "text"),
      1L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(ok.count() == 0L, "exact dup must still drop after rejected param drift")

    // video: everyNth/maxFrames shape the stored frame rows
    import graft.operators.Multimodal.MediaCodecs
    val vidDir = freshDir("pdvid")
    val clip = MediaCodecs.encodeAnimatedGif(24, 16, 3, 5L)
    StreamingAnalysis.videoDedupBatch(Seq((1L, clip)).toDF("id", "clip"),
      0L, "id", "clip", vidDir)
    val e3 = intercept[IllegalArgumentException] {
      StreamingAnalysis.videoDedupBatch(Seq((2L, clip)).toDF("id", "clip"),
        1L, "id", "clip", vidDir, maxFrames = 4)
    }
    assert(e3.getMessage.contains("parameters"), e3.getMessage)

    // cross-family reuse: an audio caller pointed at an image store must not
    // silently Hamming-join envelope hashes against raster hashes
    val imgDir = freshDir("pdimg")
    val png = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    StreamingAnalysis.imageDedupBatch(Seq((1L, png)).toDF("id", "img"),
      0L, "id", "img", imgDir)
    val e4 = intercept[IllegalArgumentException] {
      StreamingAnalysis.audioDedupBatch(Seq((2L, png)).toDF("id", "img"),
        1L, "id", "img", imgDir)
    }
    assert(e4.getMessage.contains("parameters"), e4.getMessage)
  }

  test("replayed batch after a PARTIAL write heals the store (at-least-once contract)") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val fresh = "a completely different fresh document about sourdough hydration " +
      "ratios oven spring and crumb structure under steam"
    val indexDir = freshDir("hlidx")
    val survivorsDir = freshDir("hlsurv")
    StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
      0L, "id", "text", indexDir, survivorsDir, 0.9)
    StreamingAnalysis.nearDupDedupBatch(Seq((2L, fresh)).toDF("id", "text"),
      1L, "id", "text", indexDir, survivorsDir, 0.9)
    // Simulate what a crash between task-commit and job-commit actually leaves
    // behind: COMPLETE, valid part files (tasks write under _temporary and rename
    // on commit — a visible half-written file means task commit finished) without
    // a job _SUCCESS. Stray locations match each writer's real layout: the
    // survivors writer partitions by shard, so its files live under _graft_idh=*;
    // the index writer is unpartitioned, so its files sit at the batch-dir root.
    val strayDir = freshDir("hlstray")
    Seq((2L, fresh)).toDF("id", "text").write.mode("overwrite").parquet(strayDir)
    val strayPart = new java.io.File(strayDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    def plant(dir: String): java.io.File = {
      val f = new java.io.File(dir, "part-99999-dead.snappy.parquet")
      f.getParentFile.mkdirs()
      java.nio.file.Files.copy(strayPart.toPath, f.toPath)
      f
    }
    val g1 = plant(s"$survivorsDir/_graft_batch=1/_graft_idh=7")
    val g2 = plant(s"$indexDir/_graft_batch=1")
    // the foreachBatch retry re-runs the SAME batch id with the same data
    val replay = StreamingAnalysis.nearDupDedupBatch(Seq((2L, fresh)).toDF("id", "text"),
      1L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(replay.select("id").collect().map(_.getLong(0)).toSet == Set(2L))
    assert(!g1.exists() && !g2.exists(),
      "batch-partition overwrite must remove the failed attempt's stray files")
    // both stores read clean end to end afterwards
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    val b2 = StreamingAnalysis.nearDupDedupBatch(
      Seq((3L, text), (4L, fresh)).toDF("id", "text"), 2L, "id", "text",
      indexDir, survivorsDir, 0.9)
    assert(b2.count() == 0L, "healed stores must still dedup against both landed docs")
  }

  test("streaming EMBEDDING dedup drops cross-batch near-dup vectors via the " +
    "persisted LSH index and matches the batch keep-lowest pass") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = 16
    def unit(active: Int, eps: Float = 0f): Seq[Float] =
      Seq.tabulate(dim)(i => (if (i == active) 1f else 0f) + (if (i == (active + 1) % dim) eps else 0f))
    val vA = unit(0)
    val vAnear = unit(0, 0.05f)     // cosine vs vA ≈ 0.9988 — a true near-dup
    val vB = unit(5)                // orthogonal to both
    val vC = unit(9)
    assert(Seq((1L, vA), (2L, vAnear)).toDF("id", "v")
      .select(Dedup.cosine(lit(vA.toArray), col("v"))).collect()(1).getDouble(0) > 0.99)

    val indexDir = freshDir("embidx")
    val survivorsDir = freshDir("embsurv")
    val counts = scala.collection.mutable.Map[Long, Long]()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAnalysis.embeddingDedupSink(
      input.toDF().toDF("id", "v"), "id", "v", indexDir, survivorsDir,
      dim = dim, threshold = 0.99,
      onBatch = (b, n) => counts.synchronized { counts(b) = n })
      .outputMode("update").start()
    try {
      input.addData((1L, vA), (2L, vB))
      q.processAllAvailable()
      // the near-dup of vector 1 arrives a micro-batch later with a fresh vector
      // and a null row (null vectors can never verify and must pass through)
      input.addData((3L, vAnear), (4L, vC), (5L, null))
      q.processAllAvailable()
    } finally q.stop()
    assert(counts.synchronized(counts.toMap) == Map(0L -> 2L, 1L -> 2L), counts.toString)
    val keptIds = spark.read.parquet(survivorsDir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(1L, 2L, 4L, 5L),
      s"cross-batch embedding near-dup 3 must drop, null vector 5 must pass: $keptIds")

    // parity with the batch keep-lowest pass over the same arrival-ordered events
    val allVecs = Seq((1L, vA), (2L, vB), (3L, vAnear), (4L, vC),
      (5L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
    val batchKept = Dedup.dedupNearEmbedding(allVecs, "id", "v", dim, 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchKept == keptIds, s"batch pass kept $batchKept, streaming kept $keptIds")

    // replayed batch heals idempotently, same as the text path
    val replay = StreamingAnalysis.embeddingDedupBatch(
      Seq((3L, vAnear), (4L, vC), (5L, null.asInstanceOf[Seq[Float]])).toDF("id", "v"),
      1L, "id", "v", indexDir, survivorsDir, dim, 0.99)
    assert(replay.select("id").collect().map(_.getLong(0)).toSet == Set(4L, 5L))
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 5L), "replay must not double-land")

    // parameter drift fails loud (bucket seeds could never match)
    val e = intercept[IllegalArgumentException] {
      StreamingAnalysis.embeddingDedupBatch(Seq((6L, vB)).toDF("id", "v"),
        2L, "id", "v", indexDir, survivorsDir, dim, 0.99, planes = 4)
    }
    assert(e.getMessage.contains("parameters"), e.getMessage)
  }

  test("batch-store compaction folds committed partitions, keeps shard pruning, " +
    "and the stream keeps deduping against the fold") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val fresh = "a completely different fresh document about sourdough hydration " +
      "ratios oven spring and crumb structure under steam"
    val indexDir = freshDir("cpidx")
    val survivorsDir = freshDir("cpsurv")
    StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
      0L, "id", "text", indexDir, survivorsDir, 0.9)
    // zero-survivor batch: its partitions hold only _SUCCESS (the schema-less case)
    StreamingAnalysis.nearDupDedupBatch(Seq((2L, text)).toDF("id", "text"),
      1L, "id", "text", indexDir, survivorsDir, 0.9)
    StreamingAnalysis.nearDupDedupBatch(Seq((3L, fresh)).toDF("id", "text"),
      2L, "id", "text", indexDir, survivorsDir, 0.9)
    def batchDirs(dir: String): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("_graft_batch=")).toSet
    // compact batches 0-1 in both stores; batch 2 stays live
    assert(StreamingAnalysis.compactBatchStore(spark, survivorsDir, 1L).contains(-1L))
    assert(StreamingAnalysis.compactBatchStore(spark, indexDir, 1L).contains(-1L))
    assert(batchDirs(survivorsDir) == Set("_graft_batch=-1", "_graft_batch=2"),
      batchDirs(survivorsDir).toString)
    // the fold preserved the id-hash shard layout, so the pruned verification
    // read still prunes at the directory level
    val s1 = spark.range(1).select(pmod(xxhash64(lit(1L)), lit(64L))).head().getLong(0)
    val pruned = StreamingAnalysis.readBatchStore(survivorsDir,
      Seq((0L, "")).toDF("id", "text"), pruneTo = Some(("_graft_idh", Seq(s1))))
    assert(pruned.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(pruned.queryExecution.executedPlan.toString.contains("_graft_idh"),
      "fold must keep the shard partition column prunable")
    // the stream keeps deduping against BOTH folded and live state
    val b3 = StreamingAnalysis.nearDupDedupBatch(
      Seq((4L, text), (5L, fresh), (6L, "an entirely new third topic: alpine " +
        "glacier mass balance, firn densification and meltwater runoff"))
        .toDF("id", "text"), 3L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(b3.select("id").collect().map(_.getLong(0)).toSet == Set(6L),
      "dups of folded (1) and live (3) docs must both drop after compaction")
    // a second compaction folds the previous fold + newly committed batches
    assert(StreamingAnalysis.compactBatchStore(spark, survivorsDir, 3L).contains(-2L))
    assert(batchDirs(survivorsDir) == Set("_graft_batch=-2"))
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L, 6L))
    // re-run with nothing new: a no-op that reports the standing fold, no rewrite
    assert(StreamingAnalysis.compactBatchStore(spark, survivorsDir, 3L).contains(-2L))
    assert(batchDirs(survivorsDir) == Set("_graft_batch=-2"))

    // INTERRUPTED compaction (crash between publish and source delete): batch 3's
    // partition — listed in the published fold's manifest — survives alongside
    // the fold that already contains its rows. A re-run must HEAL (delete the
    // leftover because the manifest covers it), not fold it again, which would
    // duplicate doc 6's rows permanently.
    Seq((6L, "an entirely new third topic: alpine glacier mass balance, firn " +
      "densification and meltwater runoff")).toDF("id", "text")
      .withColumn("_graft_idh", pmod(xxhash64(col("id")), lit(64L)))
      .write.partitionBy("_graft_idh").parquet(s"$survivorsDir/_graft_batch=3")
    assert(StreamingAnalysis.compactBatchStore(spark, survivorsDir, 3L).contains(-2L))
    assert(batchDirs(survivorsDir) == Set("_graft_batch=-2"),
      s"heal must delete the already-folded leftover: ${batchDirs(survivorsDir)}")
    val ids = spark.read.parquet(survivorsDir).select("id").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 3L, 6L),
      s"healed store must hold each survivor exactly once: ${ids.toSeq.sorted}")

    // EVOLVED schema across batches: the fold must keep the union of columns
    // (first-footer schema inference would silently drop the added column)
    val evo = freshDir("cpevo")
    Seq((1L, "a")).toDF("id", "text")
      .write.parquet(s"$evo/_graft_batch=0")
    Seq((2L, "b", 7.5)).toDF("id", "text", "score")
      .write.parquet(s"$evo/_graft_batch=1")
    assert(StreamingAnalysis.compactBatchStore(spark, evo, 1L).contains(-1L))
    val folded = spark.read.parquet(evo)
    assert(folded.columns.contains("score"),
      s"fold must keep evolved columns, got ${folded.columns.mkString(", ")}")
    assert(folded.select("id", "score").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap ==
      Map(1L -> None, 2L -> Some(7.5)))
  }

  test("survivors-store verification read PRUNES to candidate id-hash shards") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val fresh = "a completely different fresh document about sourdough hydration " +
      "ratios oven spring and crumb structure under steam"
    val survivorsDir = freshDir("prsurv")
    // land two batches so the store holds multiple _graft_batch partitions with
    // multiple _graft_idh shards (xxhash64(1L) and xxhash64(2L) land apart mod 64)
    val indexDir = freshDir("pridx")
    StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
      0L, "id", "text", indexDir, survivorsDir, 0.9)
    StreamingAnalysis.nearDupDedupBatch(Seq((2L, fresh)).toDF("id", "text"),
      1L, "id", "text", indexDir, survivorsDir, 0.9)
    val shards = spark.range(1).select(
        pmod(xxhash64(lit(1L)), lit(64L)), pmod(xxhash64(lit(2L)), lit(64L)))
      .head()
    val (s1, s2) = (shards.getLong(0), shards.getLong(1))
    assert(s1 != s2, s"fixture ids must hash to distinct shards, both got $s1")
    val schemaFrom = Seq((0L, "")).toDF("id", "text")
    val pruned = StreamingAnalysis.readBatchStore(survivorsDir, schemaFrom,
      pruneTo = Some(("_graft_idh", Seq(s1))))
    // directory-level pruning: the physical scan carries a partition filter on the
    // shard column and reads ONLY shard s1's rows (doc 1), never doc 2's partition
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_graft_idh"),
      s"survivors read must prune on _graft_idh partitions:\n$plan")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // reserved-name guard fails loud instead of shadowing the partition column
    val e = intercept[IllegalArgumentException] {
      StreamingAnalysis.readBatchStore(survivorsDir,
        Seq((0L, 0L)).toDF("id", "_graft_idh"))
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("streaming decontamination gate quarantines stored-bloom hits in-flight " +
    "and matches the batch firewall's flags") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the persisted eval-set firewall, built once (threshold 0.8, 4-gram words)
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val bloom = Dedup.buildContaminationBloom(
      Seq(Tuple1(evalText)).toDF("text"), "text", ngramWords = 4)
    val partial = "alpha beta gamma delta quince rhubarb sorrel tamarind" // 1/5 grams
    val clean = "entirely unrelated words about glacier mass balance and runoff"
    val landed = scala.collection.mutable.Map[Long, Set[java.lang.Long]]()
    val held = scala.collection.mutable.Map[Long, Set[java.lang.Long]]()
    def ids(df: org.apache.spark.sql.DataFrame): Set[java.lang.Long] =
      df.select("id").collect().map(r =>
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))).toSet
    val input = MemoryStream[(java.lang.Long, String)]
    val q = StreamingAnalysis.contaminationGateSink(
      input.toDF().toDF("id", "text"), "id", "text", bloom,
      ngramWords = 4, threshold = 0.8,
      land = (b, df) => landed.synchronized { landed(b) = ids(df) },
      quarantine = (b, df) => held.synchronized { held(b) = ids(df) })
      .outputMode("update").start()
    try {
      input.addData((1L, evalText), (2L, clean))
      q.processAllAvailable()
      // batch 1: partial overlap (under threshold), null text, null id carrying
      // EVAL text (cannot join flags back — lands unassessed, documented)
      input.addData((3L, partial), (4L, null), (null, evalText))
      q.processAllAvailable()
    } finally q.stop()
    assert(held.synchronized(held.toMap) == Map(0L -> Set(java.lang.Long.valueOf(1L)),
      1L -> Set.empty[java.lang.Long]), held.toString)
    assert(landed.synchronized(landed.toMap) == Map(
      0L -> Set(java.lang.Long.valueOf(2L)),
      1L -> Set[java.lang.Long](3L, 4L, null)), landed.toString)

    // parity with the batch stored-firewall flags over the same union
    val all = Seq((1L, evalText), (2L, clean), (3L, partial),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val batchFlagged = Dedup.contaminationFlagsBloom(all, bloom, "id", "text", 4)
      .filter(col("flagged_frac") >= 0.8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchFlagged == Set(1L),
      s"gate must quarantine exactly the batch firewall's flags: $batchFlagged")

    // empty filter bytes (empty probe): nothing can flag, everything lands
    val landedAll = scala.collection.mutable.Set[Long]()
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingAnalysis.contaminationGateSink(
      input2.toDF().toDF("id", "text"), "id", "text", Array.emptyByteArray,
      ngramWords = 4, threshold = 0.8,
      land = (_, df) => landedAll.synchronized {
        landedAll ++= df.select("id").collect().map(_.getLong(0))
      },
      quarantine = (_, df) => {
        val q = ids(df)
        assert(q.isEmpty, s"empty bloom must flag nothing: $q")
      }).outputMode("update").start()
    try {
      input2.addData((10L, evalText), (11L, clean))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(landedAll.synchronized(landedAll.toSet) == Set(10L, 11L))
  }

  test("streaming semantic gate quarantines embedding-space eval leakage in-flight " +
    "and matches the batch operator's verdicts") {
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = 16
    val e1 = Array.fill(dim)(1.0f)
    val near1 = e1.clone(); near1(0) = 0.9f // paraphrase-class: cosine ~0.9996
    val far = e1.map(-_)
    val evalDf = Seq((100L, e1.toSeq)).toDF("eid", "evec").cache()
    val landed = scala.collection.mutable.Map[Long, Set[java.lang.Long]]()
    val held = scala.collection.mutable.Map[Long, Set[java.lang.Long]]()
    def ids(df: org.apache.spark.sql.DataFrame): Set[java.lang.Long] =
      df.select("id").collect().map(r =>
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))).toSet
    val input = MemoryStream[(java.lang.Long, Seq[Float])]
    val q = StreamingAnalysis.semanticGateSink(
      input.toDF().toDF("id", "v"), "id", "v", evalDf, "eid", "evec",
      dim = dim, threshold = 0.95, planes = 4, tables = 2,
      land = (b, df) => landed.synchronized { landed(b) = ids(df) },
      quarantine = (b, df) => held.synchronized { held(b) = ids(df) })
      .outputMode("update").start()
    try {
      input.addData((1L, near1.toSeq), (2L, far.toSeq))
      q.processAllAvailable()
      // batch 1: verbatim eval repost, NULL vector (lands unassessed), NULL id
      // carrying EVAL content (cannot join flags back — lands, documented)
      input.addData((3L, e1.toSeq), (4L, null: Seq[Float]), (null, e1.toSeq))
      q.processAllAvailable()
    } finally q.stop()
    assert(held.synchronized(held.toMap) == Map(
      0L -> Set(java.lang.Long.valueOf(1L)),
      1L -> Set(java.lang.Long.valueOf(3L))), held.toString)
    assert(landed.synchronized(landed.toMap) == Map(
      0L -> Set(java.lang.Long.valueOf(2L)),
      1L -> Set[java.lang.Long](4L, null)), landed.toString)
    // parity with the batch operator over the same union
    val all = Seq((1L, near1.toSeq), (2L, far.toSeq), (3L, e1.toSeq))
      .toDF("id", "v")
    val batchFlagged = Dedup.semanticContaminationFlags(all, evalDf, "id", "v",
        "eid", "evec", dim, 0.95, planes = 4, tables = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchFlagged == Set(1L, 3L),
      s"gate must quarantine exactly the batch operator's flags: $batchFlagged")

    // the standing-deployment shape: index persisted once, LOADED at stream
    // start, same verdicts through the prepared-index overload
    val idxDir = java.nio.file.Files.createTempDirectory("semgateidx").toString
    Dedup.saveSemanticEvalIndex(Dedup.buildSemanticEvalIndex(
      evalDf, "eid", "evec", dim, planes = 4, tables = 2), idxDir)
    val heldL = scala.collection.mutable.Set[Long]()
    val landedL = scala.collection.mutable.Set[Long]()
    val input2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamingAnalysis.semanticGateSink(
      input2.toDF().toDF("id", "v"), "id", "v",
      Dedup.loadSemanticEvalIndex(spark, idxDir, dim, planes = 4, tables = 2),
      threshold = 0.95,
      land = (_, df) => landedL.synchronized {
        landedL ++= df.select("id").collect().map(_.getLong(0)) },
      quarantine = (_, df) => heldL.synchronized {
        heldL ++= df.select("id").collect().map(_.getLong(0)) })
      .outputMode("update").start()
    try {
      input2.addData((7L, near1.toSeq), (8L, far.toSeq))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(heldL.synchronized(heldL.toSet) == Set(7L) &&
      landedL.synchronized(landedL.toSet) == Set(8L),
      s"loaded-index gate must match: held=$heldL landed=$landedL")
  }

  // ---------- round-14: store lifecycle hardening ----------

  test("compactBatchStore adversarial matrix: folded-batch retry, stacked-fold " +
    "leftover, corrupt manifest, concurrent compactors") {
    import spark.implicits._
    def mkBatch(dir: String, id: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "text").write.mode("overwrite").parquet(s"$dir/_graft_batch=$id")
    def idCounts(dir: String): Map[Long, Long] =
      spark.read.parquet(dir).groupBy("id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def tmpDirs(dir: String): Seq[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("_graft_compact_tmp")).toSeq

    // (a) foreachBatch RETRY of an already-folded batch id: the retry re-lands its
    // rows alongside the fold (transient duplication, visible); the NEXT compaction
    // call heals from the manifest — the re-landed copy is deleted in favor of the
    // fold, never re-folded (which would duplicate permanently).
    val d1 = freshDir("cmx_retry")
    mkBatch(d1, 0, Seq((1L, "a")))
    mkBatch(d1, 1, Seq((2L, "b")))
    assert(StreamingAnalysis.compactBatchStore(spark, d1, 1L).contains(-1L))
    mkBatch(d1, 1, Seq((2L, "b"))) // the retry (idempotent rows, per contract)
    assert(idCounts(d1) == Map(1L -> 1L, 2L -> 2L), "retry transiently duplicates")
    assert(StreamingAnalysis.compactBatchStore(spark, d1, 1L).contains(-1L))
    assert(idCounts(d1) == Map(1L -> 1L, 2L -> 1L),
      s"manifest heal must drop the re-landed copy, not re-fold it: ${idCounts(d1)}")

    // (b) STACKED folds with a leftover source from the first: fold -1 exists with
    // a crash-leftover source it already covers, plus two newly committed batches.
    // One call must heal the leftover first, then fold {-1, 2, 3} into -2 with
    // every row exactly once.
    val d2 = freshDir("cmx_stack")
    mkBatch(d2, 0, Seq((1L, "a")))
    mkBatch(d2, 1, Seq((2L, "b")))
    assert(StreamingAnalysis.compactBatchStore(spark, d2, 1L).contains(-1L))
    mkBatch(d2, 1, Seq((2L, "b"))) // crash-before-delete leftover of batch 1
    mkBatch(d2, 2, Seq((3L, "c")))
    mkBatch(d2, 3, Seq((4L, "d")))
    assert(StreamingAnalysis.compactBatchStore(spark, d2, 3L).contains(-2L))
    assert(idCounts(d2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), idCounts(d2).toString)
    assert(new java.io.File(d2).listFiles().map(_.getName)
      .filter(_.startsWith("_graft_batch=")).toSet == Set("_graft_batch=-2"))

    // (c) corrupt manifest: healing from a wrong/partial id list can delete a
    // live partition or duplicate the unhealed suffix — must fail LOUD instead.
    val d3 = freshDir("cmx_corrupt")
    mkBatch(d3, 0, Seq((1L, "a")))
    mkBatch(d3, 1, Seq((2L, "b")))
    assert(StreamingAnalysis.compactBatchStore(spark, d3, 1L).contains(-1L))
    val manifest = java.nio.file.Paths.get(s"$d3/_graft_batch=-1/_graft_folded")
    mkBatch(d3, 2, Seq((3L, "c")))
    // in-place overwrite leaves a stale Hadoop checksum: the I/O-level read failure
    // must surface as the same actionable corruption error, not a raw fs exception
    java.nio.file.Files.writeString(manifest, "0\n1\n")
    val eCrc = intercept[IllegalStateException] {
      StreamingAnalysis.compactBatchStore(spark, d3, 2L)
    }
    assert(eCrc.getMessage.contains("corrupt"), eCrc.getMessage)
    def rewrite(content: String): Unit = {
      java.nio.file.Files.writeString(manifest, content)
      new java.io.File(s"$d3/_graft_batch=-1/._graft_folded.crc").delete()
    }
    // unparseable id line = corrupt, loud
    rewrite("0\nxyz\n")
    val eCorrupt = intercept[IllegalStateException] {
      StreamingAnalysis.compactBatchStore(spark, d3, 2L)
    }
    assert(eCorrupt.getMessage.contains("corrupt"), eCorrupt.getMessage)
    // terminator claiming the wrong count is equally corrupt
    rewrite("0\nend 2\n")
    val eCount = intercept[IllegalStateException] {
      StreamingAnalysis.compactBatchStore(spark, d3, 2L)
    }
    assert(eCount.getMessage.contains("corrupt"), eCount.getMessage)
    // LEGACY terminator-less manifest (previous release's format, every line a
    // clean id): accepted with a warning — an upgrade must not wedge a healthy
    // store, especially under the inline sink cadence
    rewrite("0\n1\n")
    assert(StreamingAnalysis.compactBatchStore(spark, d3, 2L).contains(-2L))
    assert(idCounts(d3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), idCounts(d3).toString)

    // (d) two CONCURRENT compactors: the loser must fail loud BEFORE deleting any
    // source partition, and the store must end exactly as the winner left it.
    val d4 = freshDir("cmx_race")
    mkBatch(d4, 0, Seq((1L, "a")))
    mkBatch(d4, 1, Seq((2L, "b")))
    var winner: Option[Long] = None
    val eRace = intercept[IllegalStateException] {
      StreamingAnalysis.compactBatchStoreImpl(spark, d4, 1L,
        // interleave: the rival runs to completion between this compactor's fold
        // write and its publish rename
        () => { winner = StreamingAnalysis.compactBatchStore(spark, d4, 1L) })
    }
    assert(eRace.getMessage.contains("lost a race"), eRace.getMessage)
    assert(winner.contains(-1L))
    assert(idCounts(d4) == Map(1L -> 1L, 2L -> 1L),
      s"loser must not delete or duplicate anything: ${idCounts(d4)}")
    assert(tmpDirs(d4).isEmpty, s"loser must clean its temp fold: ${tmpDirs(d4)}")
    // and the store keeps working after the lost race
    mkBatch(d4, 2, Seq((3L, "c")))
    assert(StreamingAnalysis.compactBatchStore(spark, d4, 2L).contains(-2L))
    assert(idCounts(d4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("legacy batch=<id> store layout fails loud on first touch (pin + compaction)") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val legacyIdx = freshDir("lgidx")
    // a store written by the pre-_graft_batch layout
    Seq((1L, text)).toDF("id", "text").write.parquet(s"$legacyIdx/batch=0")
    val e1 = intercept[IllegalArgumentException] {
      StreamingAnalysis.nearDupDedupBatch(Seq((2L, text)).toDF("id", "text"),
        1L, "id", "text", legacyIdx, freshDir("lgsurv"), 0.9)
    }
    assert(e1.getMessage.contains("legacy") && e1.getMessage.contains("batch=0"),
      e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      StreamingAnalysis.compactBatchStore(spark, legacyIdx, 1L)
    }
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
  }

  test("invalid first-call parameters are rejected BEFORE the param pin is written") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    val indexDir = freshDir("vpidx")
    val survivorsDir = freshDir("vpsurv")
    // numHashes % bands != 0: the signature kernel's own require — must fire
    // before pinStoreParams records "bands=7" into the store
    intercept[IllegalArgumentException] {
      StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
        0L, "id", "text", indexDir, survivorsDir, 0.9, bands = 7)
    }
    assert(!new java.io.File(indexDir, "_graft_params").exists(),
      "a rejected first call must not pin its bad parameters")
    // the corrected retry works without any hand-deletion of the marker
    val ok = StreamingAnalysis.nearDupDedupBatch(Seq((1L, text)).toDF("id", "text"),
      0L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(ok.count() == 1L)

    val embIdx = freshDir("vpeidx")
    intercept[IllegalArgumentException] {
      StreamingAnalysis.embeddingDedupBatch(
        Seq((1L, Seq(1f, 0f))).toDF("id", "v"), 0L, "id", "v",
        embIdx, freshDir("vpesurv"), dim = 2, threshold = 0.99, planes = 99)
    }
    assert(!new java.io.File(embIdx, "_graft_params").exists())

    val vidIdx = freshDir("vpvidx")
    intercept[IllegalArgumentException] {
      StreamingAnalysis.videoDedupBatch(
        Seq((1L, Array[Byte](1, 2))).toDF("id", "clip"), 0L, "id", "clip",
        vidIdx, everyNth = 0)
    }
    assert(!new java.io.File(vidIdx, "_graft_params").exists())
  }

  test("reserved store columns anywhere in the batch schema fail loud (not only in " +
    "the id+payload projection)") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog near the old stone " +
      "bridge in the quiet village while the river runs toward the morning market"
    // _graft_idh rides as an EXTRA data column: the old projection-only guard let it
    // through, and the survivors write would silently replace it / collide with
    // partition discovery on later full-store reads
    val e = intercept[IllegalArgumentException] {
      StreamingAnalysis.nearDupDedupBatch(
        Seq((1L, text, 5L)).toDF("id", "text", "_graft_idh"),
        0L, "id", "text", freshDir("rcidx"), freshDir("rcsurv"), 0.9)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("sink compaction cadence: nearDupDedupSink(compactEvery) folds both stores " +
    "mid-stream and keeps deduping against the fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val indexDir = freshDir("cadidx")
    val survivorsDir = freshDir("cadsurv")
    // per-doc pseudo-random token tail: DISTINCT docs share almost no 5-char
    // shingles (Jaccard far below the 0.9 threshold), while a repost is exact
    def textOf(i: Long): String = s"cadence document $i " +
      (1 to 12).map(k => "w" + ((i * 31 + k * 17) % 997)).mkString(" ")
    val input = MemoryStream[(Long, String)]
    val q = StreamingAnalysis.nearDupDedupSink(
      input.toDF().toDF("id", "text"), "id", "text", indexDir, survivorsDir,
      threshold = 0.9, compactEvery = 3).outputMode("update").start()
    try {
      (0L until 8L).foreach { b =>
        // batch 6 reposts batch 1's doc — by then batch 1 lives in the FOLD
        input.addData((b, if (b == 6) textOf(1) else textOf(b)))
        q.processAllAvailable()
      }
    } finally q.stop()
    def batchDirs(dir: String): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("_graft_batch=")).toSet
    // cadence fired at batches 3 and 6 (upTo = batchId - 1, the committed past):
    // both stores hold a fold plus only the still-live tail
    assert(batchDirs(survivorsDir).exists(_.startsWith("_graft_batch=-")),
      s"cadence must have compacted survivors: ${batchDirs(survivorsDir)}")
    assert(batchDirs(indexDir).exists(_.startsWith("_graft_batch=-")),
      s"cadence must have compacted the index: ${batchDirs(indexDir)}")
    assert(batchDirs(survivorsDir).size <= 4, batchDirs(survivorsDir).toString)
    val kept = spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 4L, 5L, 7L),
      s"repost 6 must drop against the folded index: $kept")
  }

  test("streaming store lifecycle SOAK: 300 micro-batches under the sink's " +
    "compaction cadence keep the listing flat; replay after compaction heals") {
    import spark.implicits._
    val indexDir = freshDir("soakidx")
    val survivorsDir = freshDir("soaksurv")
    val compactEvery = 20
    // same fixture rule as the cadence test: distinct docs are shingle-disjoint
    // (pseudo-random token tails), reposts are byte-exact
    def textOf(i: Long): String = s"soak document $i " +
      (1 to 12).map(k => "w" + ((i * 37 + k * 13) % 991)).mkString(" ")
    def batchDirCount(dir: String): Int =
      new java.io.File(dir).listFiles().count(_.getName.startsWith("_graft_batch="))
    // every 25th batch reposts the doc from 5 batches earlier (a cross-batch dup
    // that most of the time must be caught against FOLDED state)
    def docFor(b: Long): (Long, String) =
      (b, if (b % 25 == 24) textOf(b - 5) else textOf(b))
    var midListing = -1
    (0L until 300L).foreach { b =>
      StreamingAnalysis.nearDupDedupBatch(Seq(docFor(b)).toDF("id", "text"),
        b, "id", "text", indexDir, survivorsDir, threshold = 0.9,
        numHashes = 32, bands = 8, idShards = 4)
      // the sink's exact cadence path (nearDupDedupSink calls this same helper
      // with the same arguments after landing each batch)
      StreamingAnalysis.maybeCompact(spark, b, compactEvery, indexDir, survivorsDir)
      // sample at the same cadence PHASE as the end (19 batches past a fold), so
      // the flatness comparison below is apples-to-apples
      if (b == 59L) midListing = batchDirCount(survivorsDir)
    }
    val endListing = batchDirCount(survivorsDir)
    // FLAT listing: one fold + at most compactEvery live batch dirs at any sample
    // point — NOT the 300 dirs an uncompacted store would hold
    assert(midListing > 0 && midListing <= compactEvery + 1, s"mid=$midListing")
    assert(endListing <= compactEvery + 1, s"end=$endListing")
    assert(endListing <= midListing,
      s"listing must not grow with batch count: mid=$midListing end=$endListing")
    val files = spark.read.parquet(survivorsDir).inputFiles.length
    assert(files < 300 && files <= 3 * (compactEvery + 4),
      s"survivors file count must stay bounded, got $files")
    // correctness across the whole soak: exactly the 12 reposts dropped
    val kept = spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet
    val reposts = (0L until 300L).filter(_ % 25 == 24).toSet
    assert(kept == (0L until 300L).toSet -- reposts,
      s"missing=${((0L until 300L).toSet -- reposts -- kept).toSeq.sorted.take(5)} " +
        s"extra=${(kept & reposts).toSeq.sorted.take(5)}")
    // replay AFTER compaction still heals: re-run the last batch (id 299, a repost
    // — live, past the last fold's upTo=279) and a mid-window batch (id 290)
    StreamingAnalysis.nearDupDedupBatch(Seq(docFor(299L)).toDF("id", "text"),
      299L, "id", "text", indexDir, survivorsDir, threshold = 0.9,
      numHashes = 32, bands = 8, idShards = 4)
    StreamingAnalysis.nearDupDedupBatch(Seq(docFor(290L)).toDF("id", "text"),
      290L, "id", "text", indexDir, survivorsDir, threshold = 0.9,
      numHashes = 32, bands = 8, idShards = 4)
    val replayKept = spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(replayKept == kept, "replay after compaction must not change the corpus")
    // and the next compaction window folds cleanly over the replayed partitions
    StreamingAnalysis.maybeCompact(spark, 300L, compactEvery, indexDir, survivorsDir)
    assert(batchDirCount(survivorsDir) == 1,
      s"post-soak fold must leave one partition, got ${batchDirCount(survivorsDir)}")
    assert(spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet == kept)
  }

  test("replaceBatchStore retention rebuild: the index's recall horizon shrinks to " +
    "the retained corpus, atomically and param-checked") {
    import graft.operators.Dedup
    import spark.implicits._
    def doc(tag: String): String = s"retention $tag " +
      (1 to 12).map(k => "w" + tag + ((k * 17) % 97)).mkString(" ")
    val (a, b, c) = (doc("alpha"), doc("bravo"), doc("charlie"))
    val indexDir = freshDir("rbidx")
    val survivorsDir = freshDir("rbsurv")
    val params = "minhash shingleSize=5 numHashes=128 bands=16 idShards=64"
    Seq((0L, a), (1L, b), (2L, c)).zipWithIndex.foreach { case ((id, text), bid) =>
      StreamingAnalysis.nearDupDedupBatch(Seq((id, text)).toDF("id", "text"),
        bid.toLong, "id", "text", indexDir, survivorsDir, 0.9)
    }
    // retention: doc 0 ages OUT of the dedup horizon — recompute the index over
    // the retained survivors with the sink's own kernel + pinned params
    val retained = spark.read.parquet(survivorsDir)
      .filter(col("id") >= 1L).select("id", "text")
    val newIdx = Dedup.minhashIndex(retained, "id", "text")
    assert(StreamingAnalysis.replaceBatchStore(spark, indexDir, newIdx,
      Some(params)).contains(-1L))
    val dirs = new java.io.File(indexDir).listFiles().map(_.getName)
      .filter(_.startsWith("_graft_batch=")).toSet
    assert(dirs == Set("_graft_batch=-1"), dirs.toString)
    // a later batch reposting BOTH: the aged-out doc now lands (outside the
    // horizon), the retained doc's repost still drops
    val b3 = StreamingAnalysis.nearDupDedupBatch(
      Seq((10L, a), (11L, b)).toDF("id", "text"),
      3L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(b3.select("id").collect().map(_.getLong(0)).toSet == Set(10L),
      "aged-out doc must land, retained doc's repost must drop")
    // parameter drift at rebuild fails loud (the pin check runs first)
    val e = intercept[IllegalArgumentException] {
      StreamingAnalysis.replaceBatchStore(spark, indexDir,
        Dedup.minhashIndex(retained, "id", "text", numHashes = 64, bands = 8),
        Some("minhash shingleSize=5 numHashes=64 bands=8 idShards=64"))
    }
    assert(e.getMessage.contains("parameters"), e.getMessage)
    // compaction still composes over the replaced store
    assert(StreamingAnalysis.compactBatchStore(spark, indexDir, 3L).contains(-2L))
    val idxIds = spark.read.parquet(indexDir).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(idxIds == Set(1L, 2L, 10L), s"index must hold retained + new docs: $idxIds")
  }

  test("replaceBatchStore lifecycle hardening: orphan-tmp sweep, sharded-store " +
    "guard, interrupted replace healed by compaction") {
    import graft.operators.Dedup
    import spark.implicits._
    def doc(tag: String): String = s"lifecycle $tag " +
      (1 to 12).map(k => "v" + tag + ((k * 13) % 89)).mkString(" ")
    val (a, b) = (doc("ax"), doc("bx"))
    val indexDir = freshDir("rlidx")
    val survivorsDir = freshDir("rlsurv")
    Seq((0L, a), (1L, b)).zipWithIndex.foreach { case ((id, text), bid) =>
      StreamingAnalysis.nearDupDedupBatch(Seq((id, text)).toDF("id", "text"),
        bid.toLong, "id", "text", indexDir, survivorsDir, 0.9)
    }

    // (a) a crashed prior attempt's temp fold in a REPLACE-ONLY store: the next
    // replace must sweep it (without this, a retention-rebuild store that never
    // compacts accumulates a near-corpus-sized junk dir per crash, forever)
    val orphan = new java.io.File(s"$indexDir/_graft_compact_tmp_deadbeef")
    assert(orphan.mkdir())
    java.nio.file.Files.writeString(orphan.toPath.resolve("junk.parquet"), "x")
    val retained = spark.read.parquet(survivorsDir)
      .filter(col("id") >= 1L).select("id", "text")
    assert(StreamingAnalysis.replaceBatchStore(spark, indexDir,
      Dedup.minhashIndex(retained, "id", "text")).contains(-1L))
    assert(!orphan.exists(), "replace must sweep orphaned temp folds")

    // (b) the SURVIVORS store is sharded by _graft_idh: a replacement frame
    // missing the shard column must fail loud HERE, with the store untouched —
    // not later as an unresolved-column error inside the sink's pruned read
    def listing(dir: String): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName)
        .filter(_.startsWith("_graft_batch=")).toSet
    val before = listing(survivorsDir)
    val eShard = intercept[IllegalArgumentException] {
      StreamingAnalysis.replaceBatchStore(spark, survivorsDir, retained)
    }
    assert(eShard.getMessage.contains("sharded"), eShard.getMessage)
    assert(listing(survivorsDir) == before, "failed replace must not touch the store")
    // a retention rebuild with the WRONG shard modulus would land survivors in
    // shards the sink never probes (silent dedup false negatives): the sink
    // pinned "survivors idShards=64" at first write, so idShards=32 fails loud
    val eMod = intercept[IllegalArgumentException] {
      StreamingAnalysis.replaceSurvivorsStore(spark, survivorsDir, retained,
        "id", idShards = 32)
    }
    assert(eMod.getMessage.contains("parameters"), eMod.getMessage)
    assert(listing(survivorsDir) == before, "failed replace must not touch the store")
    // the supported path computes the shard column itself with the pinned
    // modulus, and the sink's pruned verification read keeps working after
    assert(StreamingAnalysis.replaceSurvivorsStore(spark, survivorsDir, retained,
      "id", idShards = 64).contains(-1L))
    val b2 = StreamingAnalysis.nearDupDedupBatch(
      Seq((10L, a), (11L, b)).toDF("id", "text"),
      2L, "id", "text", indexDir, survivorsDir, 0.9)
    assert(b2.select("id").collect().map(_.getLong(0)).toSet == Set(10L),
      "aged-out doc lands, retained doc's repost drops, over the replaced stores")

    // (c) interrupted replace — fold published, source deletes never ran — is
    // healed by the next compactBatchStore via the fold's manifest: every
    // superseded partition (including the PRIOR NEGATIVE fold) deleted, every
    // row exactly once
    val d = freshDir("rlheal")
    def mkBatch(id: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "text").write.mode("overwrite").parquet(s"$d/_graft_batch=$id")
    mkBatch(0, Seq((1L, "a")))
    mkBatch(1, Seq((2L, "b")))
    assert(StreamingAnalysis.compactBatchStore(spark, d, 1L).contains(-1L))
    // the interrupted replace: -2 supersedes {-1} but -1's delete never happened
    mkBatch(-2, Seq((7L, "r"), (8L, "s")))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/_graft_batch=-2/_graft_folded"), "-1\nend 1\n")
    val healed = StreamingAnalysis.compactBatchStore(spark, d, 1L)
    assert(healed.contains(-2L), healed.toString)
    assert(listing(d) == Set("_graft_batch=-2"), listing(d).toString)
    assert(spark.read.parquet(d).select("id").collect().map(_.getLong(0)).toSet
      == Set(7L, 8L), "only the replacement fold's rows survive the heal")
  }

  test("streaming embedding dedup SOAK: planted near-dup pairs straddling batches, " +
    "compaction mid-stream, recall parity with the batch operator") {
    import graft.operators.Dedup
    import spark.implicits._
    val dim = 64
    val eps = 0.01f
    // one-hot basis per id keeps every un-planted pair orthogonal; planted pairs
    // (a -> b) give id b a tiny perturbation of id a's vector (cosine ~0.99995)
    val planted = Map(23L -> 2L, 29L -> 5L, 47L -> 11L, 55L -> 19L, 60L -> 26L, 62L -> 34L)
    def vecOf(i: Long): Seq[Float] = planted.get(i) match {
      case Some(a) => Seq.tabulate(dim)(d =>
        (if (d == a.toInt) 1f else 0f) + (if (d == a.toInt + 1) eps else 0f))
      case None => Seq.tabulate(dim)(d => if (d == i.toInt) 1f else 0f)
    }
    val indexDir = freshDir("esoakidx")
    val survivorsDir = freshDir("esoaksurv")
    val compactEvery = 5
    (0L until 16L).foreach { b =>
      val rows = (b * 4 until b * 4 + 4).map(i => (i, vecOf(i)))
      StreamingAnalysis.embeddingDedupBatch(rows.toDF("id", "v"), b, "id", "v",
        indexDir, survivorsDir, dim = dim, threshold = 0.99)
      StreamingAnalysis.maybeCompact(spark, b, compactEvery, indexDir, survivorsDir)
    }
    // compaction genuinely ran mid-stream (batches 5, 10, 15 triggered it)
    val dirs = new java.io.File(survivorsDir).listFiles().map(_.getName)
      .filter(_.startsWith("_graft_batch=")).toSet
    assert(dirs.exists(_.startsWith("_graft_batch=-")), dirs.toString)
    assert(dirs.size <= compactEvery + 1, dirs.toString)
    val kept = spark.read.parquet(survivorsDir).select("id").collect()
      .map(_.getLong(0)).toSet
    // every planted straddling pair was caught — including ones whose original
    // vector lived only in the FOLD when its near-dup arrived (e.g. 34 lands in
    // batch 8, folded at batch 10; 62 arrives in batch 15)
    assert(kept == (0L until 64L).toSet -- planted.keySet,
      s"missed=${(planted.keySet & kept).toSeq.sorted} " +
        s"overdropped=${((0L until 64L).toSet -- planted.keySet -- kept).toSeq.sorted}")
    // recall parity with the batch keep-lowest operator over the unioned corpus
    val all = (0L until 64L).map(i => (i, vecOf(i))).toDF("id", "v")
    val batchKept = Dedup.dedupNearEmbedding(all, "id", "v", dim, 0.99)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(batchKept == kept, s"batch kept ${batchKept.size}, streaming kept ${kept.size}")
  }
}
