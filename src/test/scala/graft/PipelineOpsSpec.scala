package graft

import graft.functions.TextFunctions
import graft.operators.{Chunking, Dedup, Drift, Pii, PiiPattern, QualityClassifier, Sampling, Sharding}
import org.apache.spark.sql.functions._

/** Pipeline-transform operators added beyond the reference surface: PII scrubbing
  * (Bloom decontamination / sharding / sampling specs live here too as they land).
  */
class PipelineOpsSpec extends SparkSpec {

  test("PII redaction replaces every default class and only those spans") {
    import spark.implicits._
    val df = Seq(
      "mail me at jane.doe+spam@sub.example.org today",
      "card 1234-5678-9012-3456 or 1234 5678 9012 3456",
      "ssn 123-45-6789 phone 555-123-4567",
      "server at 192.168.0.1 port 8080",
      "no pii here, just 12345 and a-b-c",
      "").toDF("text")
    val red = Pii.redactDf(df, "text").as[String].collect()
    assert(red(0) == "mail me at [EMAIL] today")
    assert(red(1) == "card [CARD] or [CARD]")
    assert(red(2) == "ssn [SSN] phone [PHONE]")
    assert(red(3) == "server at [IP] port 8080")
    assert(red(4) == "no pii here, just 12345 and a-b-c")
    assert(red(5) == "")
  }

  test("PII precedence: earlier patterns win on overlapping spans") {
    import spark.implicits._
    // The email's host contains a dotted quad; email is redacted first so the IP
    // pattern never sees it.
    val r = Seq("x user@10.0.0.1.example.com y, bare 10.0.0.1 z").toDF("text")
      .select(Pii.redact(col("text")).as("t")).as[String].head()
    assert(r == "x [EMAIL] y, bare [IP] z")
  }

  test("piiStats: one-scan counts, null text matches nothing") {
    import spark.implicits._
    val df = Seq(
      Some("a@b.co and c@d.io"), Some("ssn 123-45-6789"), None, Some("plain"))
      .toDF("text")
    val stats = Pii.piiStats(df, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats("email") == ((1L, 2L)))
    assert(stats("ssn") == ((1L, 1L)))
    assert(stats("phone") == ((0L, 0L)))
    assert(stats.size == Pii.Defaults.size)
  }

  test("containsPii is false on NULL text; custom patterns compose") {
    import spark.implicits._
    val custom = Seq(PiiPattern("badword", "\\bvoldemort\\b", "[WHO]"))
    val df = Seq(Some("voldemort was here"), Some("fine"), None).toDF("text")
    val flags = df.select(Pii.containsPii(col("text"), custom)).as[Boolean].collect()
    assert(flags.toSeq == Seq(true, false, false))
    val red = df.select(Pii.redact(col("text"), custom)).as[String].collect()
    assert(red(0) == "[WHO] was here")
  }

  test("pii catalog queries match DuckDB at sf0.001 (values pinned from the oracle)") {
    val stats = Queries.queries("pii_stats_customer")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats == Map(
      "email" -> ((50L, 50L)), "credit_card" -> ((22L, 22L)), "ssn" -> ((30L, 30L)),
      "phone" -> ((38L, 38L)), "ipv4" -> ((25L, 25L))))
    val r = Queries.queries("pii_redaction_customer")(spark, "/root/testdata/sf0.001").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((150L, 0L, 10793L, 9135L, 50L)))
  }

  test("piiStats over empty input yields zero rows counts, not nulls") {
    import spark.implicits._
    val df = Seq.empty[String].toDF("text")
    val stats = Pii.piiStats(df, "text").collect()
    assert(stats.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("Bloom contamination path is exact: identical to the broadcast path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val probe = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val exact = Dedup.crossCorpusContamination(corpus, probe, "text", "doc_id", "text", 6)
      .orderBy("probe_id").collect().toSeq
    val bloom = Dedup.crossCorpusContaminationBloom(corpus, probe, "text", "doc_id", "text", 6)
      .orderBy("probe_id").collect().toSeq
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("Bloom contamination plan: codegen'd might_contain, no broadcast of probe hashes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val probe = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val plan = Dedup.crossCorpusContaminationBloom(corpus, probe, "text", "doc_id", "text", 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom predicate in plan:\n$plan")
    // The false-positive scrub specifically — the LeftSemi join — must be the hinted
    // shuffle join, not a broadcast. Checking the semi-join's own line (not the whole
    // plan string) keeps the assertion from passing vacuously off the scoring join.
    val semiLines = plan.split("\n").filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, s"expected a LeftSemi join in plan:\n$plan")
    assert(semiLines.forall(l =>
      l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin")),
      s"expected the FP-scrub semi-join to shuffle, got:\n${semiLines.mkString("\n")}")
  }

  test("calibrationBins: closed-form bins, NULL-bin bucket, NULL/NaN label semantics") {
    import spark.implicits._
    val df = Seq(
      (0.05, Some(0.0)), (0.05, Some(1.0)),            // bin 0: rate 0.5
      (0.95, Some(1.0)), (1.0, Some(1.0)),             // bin 9 (1.0 closes into it): rate 1
      (0.55, None),                                    // bin 5: occupied, no votes -> NULL rate
      (0.55, Some(Double.NaN)),                        // NaN label = hostile, not a 0/1 vote
      (Double.NaN, Some(1.0)), (1.5, Some(0.0)), (-0.1, Some(1.0)) // malformed scores -> NULL bin
    ).toDF("score", "label")
    val out = QualityClassifier.calibrationBins(df, "score", "label", bins = 10)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out.keySet == Set(0, 5, 9, -1))
    assert(out(0)._1 == 2 && out(0)._2 == 2 && out(0)._4.contains(0.5))
    assert(out(9)._1 == 2 && out(9)._4.contains(1.0))
    assert(out(5)._1 == 2 && out(5)._2 == 0 && out(5)._4.isEmpty) // no votes, NULL rate
    assert(out(-1)._1 == 3 && out(-1)._3.isEmpty)                 // malformed-score bucket
    // mean_score sits inside the bin's range
    assert(out(0)._3.exists(m => m.asInstanceOf[Double] == 0.05))
    intercept[IllegalArgumentException](QualityClassifier.calibrationBins(df, "score", "label", 0))
    // empty input -> zero rows (no fabricated spine)
    assert(QualityClassifier.calibrationBins(df.filter(lit(false)), "score", "label").count() == 0)
    // plan: one aggregate pair, no window/sort
    val plan = QualityClassifier.calibrationBins(df, "score", "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"), s"unexpected plan:\n$plan")
  }

  test("thresholdForPrecision: cumulative-from-top semantics, lowest qualifying cut, None") {
    import spark.implicits._
    // bin 9: 10 labeled, all positive; bin 5: 10 labeled, half; bin 1: 10 labeled, none.
    val df = ((1 to 10).map(i => (0.95, i <= 10)) ++
      (1 to 10).map(i => (0.55, i <= 5)) ++
      (1 to 10).map(_ => (0.15, false))).toDF("score", "label")
    val calib = QualityClassifier.calibrationBins(df, "score", "label", 10)
    // target 0.9: only the top suffix (bins >= 9, rate 1.0) qualifies -> cut 0.9.
    assert(QualityClassifier.thresholdForPrecision(calib, 10, 0.9).contains(0.9))
    // target 0.7: suffix from 5 is 15/20 = 0.75 -> cut 0.5; suffix from 1 is 0.5, out.
    assert(QualityClassifier.thresholdForPrecision(calib, 10, 0.7).contains(0.5))
    // target 0.5: the FULL table qualifies (15/30 = 0.5) -> lowest cut 0.1.
    assert(QualityClassifier.thresholdForPrecision(calib, 10, 0.5).contains(0.1))
    // A perfect top bin still satisfies an extreme target (suffix rate exactly 1.0).
    assert(QualityClassifier.thresholdForPrecision(calib, 10, 0.999999).contains(0.9))
    val low = ((1 to 20).map(_ => (0.5, false))).toDF("score", "label")
    assert(QualityClassifier.thresholdForPrecision(
      QualityClassifier.calibrationBins(low, "score", "label"), 10, 0.9).isEmpty)
    intercept[IllegalArgumentException](QualityClassifier.thresholdForPrecision(calib, 0, 0.5))
    intercept[IllegalArgumentException](QualityClassifier.thresholdForPrecision(calib, 10, 0.0))
  }

  test("withRunningTotal matches the naive global window at any partitioning") {
    import spark.implicits._
    // Deterministic pseudo-random weights; ids deliberately NOT pre-sorted.
    val rows = (0 until 5000).map(i => (i * 37 % 5000, (i * i * 7 % 113).toLong))
    val df = rows.toDF("k", "v").repartition(13)
    val got = Sharding.withRunningTotal(df, "k", "v", "rt")
      .select("k", "rt").as[(Int, Long)].collect().toMap
    val expect = rows.sortBy(_._1).scanLeft((0, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    assert(got == expect)
  }

  test("withRunningTotal: NULL weights carry the total; leading NULL prefix stays NULL") {
    import spark.implicits._
    // AQE coalescing OFF: the 4 rows then spread across shuffle partitions, putting
    // NULL-weight rows at partition STARTS — the layout where a per-partition-only
    // fold would wrongly emit NULL instead of carrying the prior partitions' total.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val df = Seq((1, None: Option[Long]), (2, Some(5L)), (3, None), (4, Some(2L)))
        .toDF("k", "v")
      val got = Sharding.withRunningTotal(df, "k", "v", "rt")
        .orderBy("k").select("rt").collect().map(r => Option(r.get(0)))
      assert(got.toSeq == Seq(None, Some(5L), Some(5L), Some(7L)))
      // And through packIntoShards: NULL-weight rows inherit the running position —
      // the same shard as the next weighted row — never a reset to shard 0.
      val rows = (1 to 100).map(i => (i, if (i == 51 || i == 52) None else Some(30L)))
      val shards = Sharding.packIntoShards(rows.toDF("k", "v"), "k", "v", budget = 100L)
        .orderBy("k").select("shard_id").as[Long].collect()
      assert(shards(50) == shards(52) && shards(51) == shards(52))
      assert(shards(50) >= shards(49))
      assert(shards.zip(shards.tail).forall { case (a, b) => a <= b }) // monotone
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("packIntoShards: budget exceeded by at most one row; oversized rows skip ids") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i, if (i == 50) 1000L else 30L)).toDF("k", "v")
    val packed = Sharding.packIntoShards(df, "k", "v", budget = 100L)
    val byShard = packed.groupBy("shard_id").agg(sum("v").as("tot"), max("v").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // No shard exceeds budget + (its largest single row - 1).
    assert(byShard.forall { case (_, tot, mx) => tot <= 100L + mx - 1 })
    // Shard ids monotone in k.
    val perRow = packed.orderBy("k").select("shard_id").as[Long].collect()
    assert(perRow.zip(perRow.tail).forall { case (a, b) => a <= b })
    // The 1000-weight row at k=50 spans several budget windows -> ids skip.
    val ids = perRow.distinct
    assert(ids.zip(ids.tail).exists { case (a, b) => b - a > 1 })
  }

  test("selectTopByBudget: naive-window parity, ineligible scores, zero-weight boundary") {
    import spark.implicits._
    // Deterministic scores with heavy ties (7 distinct values over 2000 rows) so the
    // doc-id tiebreak decides real boundaries; weights 0..12 include zeros.
    val rows = (0 until 2000).map(i => (i.toLong, (i * 31 % 7).toDouble / 2, (i * i % 13).toLong))
    val df = rows.toDF("id", "q", "w").repartition(11)
    val budget = 3000L
    val got = Sharding.selectTopByBudget(df, "q", "w", "id", budget, "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // Naive definition: inclusive cumulative in (q DESC, id) order, keep cum <= budget.
    val expect = rows.sortBy { case (id, q, _) => (-q, id) }
      .scanLeft((-1L, 0L)) { case ((_, acc), (id, _, w)) => (id, acc + w) }.drop(1)
      .takeWhile(_._2 <= budget).toMap
    assert(got == expect)
    assert(got.nonEmpty && got.size < 2000, "budget should select a strict subset")
    // NULL / NaN / Inf scores are ineligible; NULL weights count 0 but keep rank.
    val hostile = Seq(
      (1L, Some(5.0), Some(10L)), (2L, None, Some(1L)), (3L, Some(Double.NaN), Some(1L)),
      (4L, Some(Double.PositiveInfinity), Some(1L)), (5L, Some(4.0), None),
      (6L, Some(3.0), Some(5L))).toDF("id", "q", "w")
    val sel = Sharding.selectTopByBudget(hostile, "q", "w", "id", 15L, "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(sel == Map(1L -> 10L, 5L -> 10L, 6L -> 15L))
    // Budget >= total: every eligible row selected.
    val all = Sharding.selectTopByBudget(hostile, "q", "w", "id", 1000L, "cum").count()
    assert(all == 3L)
    // Zero-weight rows sitting exactly AT the budget boundary stay in (cum == budget
    // <= budget); the first strictly-over row ends the prefix for everything after.
    val boundary = Seq((1L, 9.0, 10L), (2L, 8.0, 0L), (3L, 7.0, 0L), (4L, 6.0, 1L), (5L, 5.0, 0L))
      .toDF("id", "q", "w")
    val b = Sharding.selectTopByBudget(boundary, "q", "w", "id", 10L, "cum")
      .select("id").as[Long].collect().toSet
    assert(b == Set(1L, 2L, 3L))
    // Guards: negative weight fails in-task; bad budget / taken names fail fast.
    val neg = Seq((1L, 1.0, -5L)).toDF("id", "q", "w")
    val ex = intercept[Exception](Sharding.selectTopByBudget(neg, "q", "w", "id", 10L).count())
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(ex).exists(_.contains("negative weight")))
    intercept[IllegalArgumentException](Sharding.selectTopByBudget(df, "q", "w", "id", 0L))
    intercept[IllegalArgumentException](Sharding.selectTopByBudget(df, "q", "w", "id", 10L, "q"))
    // Non-integral weights fail fast: a double weight would silently truncate, and a
    // fractional negative would slip past the in-task guard as 0.
    intercept[IllegalArgumentException](Sharding.selectTopByBudget(
      df.withColumn("w", col("w").cast("double")), "q", "w", "id", 10L))
    intercept[IllegalArgumentException](
      Sharding.selectTopByBudget(df.withColumn("_sel_w", lit(1)), "q", "w", "id", 10L))
    // Empty input: empty output, no crash.
    assert(Sharding.selectTopByBudget(df.filter(lit(false)), "q", "w", "id", 10L).count() == 0L)
  }

  test("selectTopByBudgetByGroup: per-group naive-window parity, NULL-group quota, guards") {
    import spark.implicits._
    // 3 named groups + a NULL group, tied scores, weights 0..12.
    val rows = (0 until 2000).map { i =>
      (i.toLong, if (i % 4 == 3) None else Some(s"g${i % 4}"),
        (i * 31 % 7).toDouble / 2, (i * i % 13).toLong)
    }
    val df = rows.toDF("id", "g", "q", "w").repartition(11)
    val budget = 900L
    val got = Sharding.selectTopByBudgetByGroup(df, "g", "q", "w", "id", budget, "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    // Naive per-group definition: inclusive cumulative in (q DESC, id) order per group.
    val expect = rows.groupBy(_._2).values.flatMap { grp =>
      grp.sortBy { case (id, _, q, _) => (-q, id) }
        .scanLeft((-1L, 0L)) { case ((_, acc), (id, _, _, w)) => (id, acc + w) }.drop(1)
        .takeWhile(_._2 <= budget)
    }.toMap
    assert(got == expect)
    // Every group (incl. NULL) is represented and none exceeds its quota.
    val byGroup = Sharding.selectTopByBudgetByGroup(df, "g", "q", "w", "id", budget, "cum")
      .groupBy("g").agg(sum("w").as("t"), count(lit(1)).as("n")).collect()
    assert(byGroup.length == 4)
    byGroup.foreach(r => assert(r.getLong(1) <= budget, s"group ${r.get(0)} over quota"))
    // Single constant group == the global operator.
    val one = df.withColumn("g", lit("only"))
    val viaGroup = Sharding.selectTopByBudgetByGroup(one, "g", "q", "w", "id", 3000L, "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val global = Sharding.selectTopByBudget(df, "q", "w", "id", 3000L, "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(viaGroup == global)
    // Guards: negative weight in-task, maxGroups, reserved/output names, bad budget.
    val neg = Seq((1L, "a", 1.0, -5L)).toDF("id", "g", "q", "w")
    val ex = intercept[Exception](
      Sharding.selectTopByBudgetByGroup(neg, "g", "q", "w", "id", 10L).count())
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(ex).exists(_.contains("negative weight")))
    val exG = intercept[Exception](
      Sharding.selectTopByBudgetByGroup(df, "id", "q", "w", "id", 10L, maxGroups = 5).count())
    assert(causes(exG).exists(_.contains("distinct groups")) ||
      causes(exG).exists(_.contains("maxGroups")))
    intercept[IllegalArgumentException](
      Sharding.selectTopByBudgetByGroup(df, "g", "q", "w", "id", 0L))
    intercept[IllegalArgumentException](
      Sharding.selectTopByBudgetByGroup(df, "g", "q", "w", "id", 10L, "q"))
    intercept[IllegalArgumentException](Sharding.selectTopByBudgetByGroup(
      df.withColumn("w", col("w").cast("float")), "g", "q", "w", "id", 10L))
    assert(Sharding.selectTopByBudgetByGroup(
      df.filter(lit(false)), "g", "q", "w", "id", 10L).count() == 0L)
    // BINARY group keys group by CONTENT (Array[Byte] has reference equality only —
    // the fold normalizes it): two byte-equal groups share one quota.
    val bin = (1 to 100).map(i =>
      (i.toLong, Array[Byte]((i % 2).toByte), i.toDouble % 5, 10L))
      .toDF("id", "g", "q", "w")
    val binOut = Sharding.selectTopByBudgetByGroup(bin, "g", "q", "w", "id", 100L)
      .groupBy(col("g")).agg(sum(col("w")).as("t")).collect()
    assert(binOut.length == 2 && binOut.forall(_.getLong(1) == 100L),
      s"each binary group must fill exactly its 100-token quota, got ${binOut.toSeq}")
  }

  test("withRunningTotal plan: no exchange and no window after the materialized range shuffle") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, i.toLong)).toDF("k", "v")
    val plan = Sharding.withRunningTotal(df, "k", "v", "rt")
      .queryExecution.executedPlan.toString
    // The range repartition is materialized inside the localCheckpoint; the returned
    // plan is the streaming fold over those partitions — any Exchange or Window here
    // would be a second data-scale shuffle/sort creeping back in.
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  test("quotaPerStratum: exact first-k per stratum; salt never changes the result") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => (s"s${i % 7}", i))
    val df = rows.toDF("stratum", "id").repartition(11)
    val plain = Sampling.quotaPerStratum(df, Seq("stratum"), 20, Seq("id"))
      .select("stratum", "id").as[(String, Int)].collect().toSet
    val salted = Sampling.quotaPerStratum(df, Seq("stratum"), 20, Seq("id"), salt = 8)
      .select("stratum", "id").as[(String, Int)].collect().toSet
    val expect = rows.groupBy(_._1).toSeq
      .flatMap { case (_, g) => g.sortBy(_._2).take(20) }.toSet
    assert(plain == expect)
    assert(salted == expect)
  }

  test("mixtureSample: per-stratum quotas, shortfall kept, unlisted strata dropped") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (Seq("en", "de", "yo", "zz")(i % 4), i))
    val df = rows.toDF("lang", "id").repartition(7)
    val out = Sampling.mixtureSample(df, "lang", Map("en" -> 50, "de" -> 10, "yo" -> 999),
      Seq("id"), salt = 4)
      .select("lang", "id").as[(String, Int)].collect()
    val byLang = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byLang.keySet == Set("en", "de", "yo")) // zz dropped
    assert(byLang("en") == rows.filter(_._1 == "en").map(_._2).sorted.take(50))
    assert(byLang("de") == rows.filter(_._1 == "de").map(_._2).sorted.take(10))
    assert(byLang("yo").size == 125) // shortfall: all it has
  }

  test("writeShards: one file per shard directory, all rows present") {
    import spark.implicits._
    val dir = tmpDir("graft_shards")
    try {
      val df = (1 to 300).map(i => (i.toLong, 10L)).toDF("k", "v")
      Sharding.writeShards(df, "k", "v", budget = 200L, path = dir)
      val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard_id="))
      assert(shardDirs.length == 15) // 300*10/200
      assert(shardDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1))
      val back = spark.read.parquet(dir)
      assert(back.count() == 300L)
      assert(back.groupBy("shard_id").sum("v").collect()
        .forall(_.getLong(1) == 200L))
    } finally graft.core.FsUtil.deleteRecursively(new java.io.File(dir))
  }

  test("vocabTopK: counts, deterministic tie-break, shares sum under 1") {
    import spark.implicits._
    val df = Seq("b a a", "c b a", "", "d").toDF("text")
    val top = Metrics.vocabTopK(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // a:3 b:2 c:1 d:1 over 7 tokens; tie at 1 breaks to 'c' (ascending token)
    assert(top.map(t => (t._1, t._2)).toSeq == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    assert(math.abs(top.head._3 - 3.0 / 7.0) < 1e-12)
    assert(Metrics.vocabTopK(df.filter(lit(false)), "text", 5).count() == 0L)
  }

  test("hashSample: stable membership, approximate fraction, append-invariant") {
    import spark.implicits._
    val df = (1 to 20000).map(i => s"doc$i").toDF("id")
    val a = Sampling.hashSample(df, Seq("id"), 0.25).as[String].collect().toSet
    val b = Sampling.hashSample(df.repartition(17), Seq("id"), 0.25).as[String].collect().toSet
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size / 20000.0 - 0.25) < 0.02)
    // Appending rows never flips existing membership.
    val grown = (1 to 30000).map(i => s"doc$i").toDF("id")
    val c = Sampling.hashSample(grown, Seq("id"), 0.25).as[String].collect().toSet
    assert(a.subsetOf(c))
    // Different seed -> a genuinely different (but valid-sized) sample.
    val d = Sampling.hashSample(df, Seq("id"), 0.25, seed = 7L).as[String].collect().toSet
    assert(d != a && math.abs(d.size / 20000.0 - 0.25) < 0.02)
  }

  test("hashSplit: disjoint, exhaustive, weight-proportional") {
    import spark.implicits._
    val df = (1 to 30000).map(i => s"k$i").toDF("id")
    val split = Sampling.hashSplit(df, Seq("id"), Seq(0.8, 0.1, 0.1))
    val counts = split.groupBy("split_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2)) // exhaustive, no unassigned bucket
    assert(counts.values.sum == 30000L)   // disjoint partition of the input
    assert(math.abs(counts(0) / 30000.0 - 0.8) < 0.02)
    assert(math.abs(counts(1) / 30000.0 - 0.1) < 0.01)
  }

  test("unicode normalization: NFC composes, NFKC folds compatibility forms") {
    import spark.implicits._
    val combining = "e\u0301clair"  // e + COMBINING ACUTE ACCENT
    val composed = "\u00e9clair"    // precomposed LATIN SMALL LETTER E WITH ACUTE
    val compat = "\uFB01ne \uFF14\uFF12"  // fi-ligature + fullwidth 4 2
    val df = Seq(Some(combining), Some(composed), Some(compat), Some("plain"), None)
      .toDF("t")
    val out = df.select(
      TextFunctions.nfcNormalize(col("t")).as("nfc"),
      TextFunctions.nfkcNormalize(col("t")).as("nfkc"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(out(0)._1.contains(composed))          // NFC composes the combining pair
    assert(out(1)._1.contains(composed))          // already-canonical text unchanged
    assert(out(2)._1.contains(compat))            // NFC keeps compatibility chars
    assert(out(2)._2.contains("fine 42"))         // NFKC folds ligature + fullwidth
    assert(out(3)._1.contains("plain"))
    assert(out(4)._1.isEmpty && out(4)._2.isEmpty) // NULL in, NULL out
    // Canonicalized dedup: the two éclair spellings fingerprint identically post-NFC.
    val fps = df.filter(col("t").isNotNull).limit(2)
      .select(TextFunctions.fingerprint(TextFunctions.nfcNormalize(col("t"))))
      .as[Long].collect()
    assert(fps.distinct.length == 1)
  }

  test("unicode normalization stays inside whole-stage codegen") {
    // Parquet-backed frame: a LocalTableScan would constant-fold the projection away.
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.nfcNormalize(col("text")))
      .queryExecution.executedPlan.toString
    // The "*(n)" prefix marks a WholeStageCodegen span in the compact plan string —
    // the projection must carry it (a non-codegen Expression would drop the star).
    assert("\\*\\(\\d+\\) Project \\[unicode_nfc".r.findFirstIn(plan).isDefined, plan)
  }

  test("chunkByTokens: full coverage, overlap, short-doc and empty-doc semantics") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "one two"), (3L, ""), (4L, "   "), (5L, null))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 5, overlapTokens = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // stride 3, n=10: ceil(max(10-2,1)/3)=3 windows at starts 0,3,6
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(5, 5, 4))
    // every token appears in some chunk
    assert((1 to 10).forall(i => d1.exists(_._3.split(" ").contains(s"w$i"))))
    // short doc -> exactly one window; empty/whitespace/null docs -> no rows
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, "one two", 2)))
    assert(!chunks.exists(c => c._1 >= 3L))
  }

  test("psi: zero for identical distributions, positive for shifted, NULL on empty side") {
    import spark.implicits._
    val a = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang")
    val b = (Seq.fill(40)("en") ++ Seq.fill(60)("de")).toDF("lang")
    val same = Drift.psi(a, a, "lang").head()
    assert(math.abs(same.getDouble(0)) < 1e-12 && same.getLong(1) == 2L)
    val shifted = Drift.psi(a, b, "lang").head().getDouble(0)
    // closed form: (0.8-0.4)ln(2) + (0.2-0.6)ln(1/3)
    assert(math.abs(shifted - (0.4 * math.log(2.0) + (-0.4) * math.log(1.0 / 3.0))) < 1e-9)
    val empty = Drift.psi(a, a.filter(lit(false)), "lang").head()
    assert(empty.isNullAt(0) && empty.getLong(1) == 2L)
    // one-sided category contributes a finite (epsilon-smoothed) term, not Inf
    val c = (Seq.fill(100)("en") ++ Seq.fill(1)("zz")).toDF("lang")
    val oneSided = Drift.psi(a, c, "lang").head().getDouble(0)
    assert(!oneSided.isInfinite && oneSided > 0)
  }

  test("chiSquare: closed form 2x2, zero on identical, NULL classes, single-category V") {
    import spark.implicits._
    val a = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang")
    val b = (Seq.fill(40)("en") ++ Seq.fill(60)("de")).toDF("lang")
    // Hand-computed 2x2: N=200, col totals en=120 de=80, row totals 100/100
    // E(en)=60, E(de)=40 per side; chi2 = 2*(20^2/60) + 2*(20^2/40) = 13.333... + 20
    val out = Drift.chiSquare(a, b, "lang").head()
    val expect = 2 * (400.0 / 60.0) + 2 * (400.0 / 40.0)
    assert(math.abs(out.getDouble(0) - expect) < 1e-9)
    assert(out.getLong(1) == 1L) // dof = C-1 = 1
    assert(math.abs(out.getDouble(2) - math.sqrt(expect / 200.0)) < 1e-12)
    assert(out.getLong(3) == 100L && out.getLong(4) == 100L && out.getLong(5) == 2L)
    // identical distributions (equal side sizes): O == E exactly -> chi2 0, V 0
    val same = Drift.chiSquare(a, a, "lang").head()
    assert(same.getDouble(0) == 0.0 && same.getDouble(2) == 0.0)
    // empty side: NULL chi2/dof-is-C-1-still, NULL V; counts still reported
    val empty = Drift.chiSquare(a, a.filter(lit(false)), "lang").head()
    assert(empty.isNullAt(0) && empty.isNullAt(2) &&
      empty.getLong(3) == 100L && empty.getLong(4) == 0L)
    // both empty: NULL dof (not -1), zero counts
    val none = Drift.chiSquare(a.filter(lit(false)), a.filter(lit(false)), "lang").head()
    assert(none.isNullAt(0) && none.isNullAt(1) && none.getLong(5) == 0L)
    // single shared category: chi2 0 but V NULL (no association measurable)
    val c1 = Seq.fill(10)("en").toDF("lang")
    val single = Drift.chiSquare(c1, c1, "lang").head()
    assert(single.getDouble(0) == 0.0 && single.isNullAt(2))
    // NULL is a real category: a NULL-vs-value shift registers
    val withNull = (Seq.fill(50)(Some("en")) ++ Seq.fill(50)(Option.empty[String])).toDF("lang")
    assert(Drift.chiSquare(a, withNull, "lang").head().getDouble(0) > 0)
  }

  test("jsDivergence: closed forms, bounds, no-epsilon exactness, NULL on empty side") {
    import spark.implicits._
    val a = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang")
    val b = (Seq.fill(40)("en") ++ Seq.fill(60)("de")).toDF("lang")
    // identical -> exactly 0 (no smoothing noise)
    val same = Drift.jsDivergence(a, a, "lang").head()
    assert(same.getDouble(0) == 0.0 && same.getDouble(1) == 0.0 && same.getLong(2) == 2L)
    // closed form for p=(.8,.2) q=(.4,.6): m=(.6,.4)
    val expect = 0.5 * (0.8 * math.log(0.8 / 0.6) + 0.2 * math.log(0.2 / 0.4)) +
      0.5 * (0.4 * math.log(0.4 / 0.6) + 0.6 * math.log(0.6 / 0.4))
    val shifted = Drift.jsDivergence(a, b, "lang").head()
    assert(math.abs(shifted.getDouble(0) - expect) < 1e-12)
    assert(math.abs(shifted.getDouble(1) - expect / math.log(2.0)) < 1e-12)
    // disjoint supports -> exactly ln 2, normalized exactly 1 (the upper bound)
    val c = Seq.fill(30)("fr").toDF("lang")
    val disjoint = Drift.jsDivergence(a, c, "lang").head()
    assert(math.abs(disjoint.getDouble(0) - math.log(2.0)) < 1e-12 &&
      math.abs(disjoint.getDouble(1) - 1.0) < 1e-12)
    // empty side (either one): NULL verdict, no ANSI division error
    assert(Drift.jsDivergence(a, a.filter(lit(false)), "lang").head().isNullAt(0))
    assert(Drift.jsDivergence(a.filter(lit(false)), a, "lang").head().isNullAt(0))
  }

  test("vocabNovelty: mass-weighted closed form, empty sides, null text") {
    import spark.implicits._
    val ref = Seq("alpha beta", "beta gamma").toDF("text")
    val cur = Seq("alpha alpha newtok", "beta").toDF("text")
    // cur tokens: alpha x2, newtok x1, beta x1 -> 4 tokens, 3 types, 1 new, mass 1/4
    val out = Drift.vocabNovelty(ref, cur, "text").head()
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L && out.getLong(2) == 1L &&
      math.abs(out.getDouble(3) - 0.25) < 1e-12)
    // empty current side: zero counts, NULL mass (nothing to measure)
    val e = Drift.vocabNovelty(ref, ref.filter(lit(false)), "text").head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(3))
    // empty REFERENCE: everything is novel, mass exactly 1
    val r = Drift.vocabNovelty(ref.filter(lit(false)), cur, "text").head()
    assert(r.getDouble(3) == 1.0 && r.getLong(2) == 3L)
    // NULL / whitespace-only text contributes no tokens
    val nulls = Seq(Some("alpha"), None, Some("   ")).toDF("text")
    val n = Drift.vocabNovelty(ref, nulls, "text").head()
    assert(n.getLong(0) == 1L && n.getDouble(3) == 0.0)
  }

  test("psiEquiDepth: zero on self, decile-shift detection, hostile classes, empty ref") {
    import spark.implicits._
    val ref = (1 to 1000).map(_.toDouble).toDF("x")
    // Identical sides: every decile holds identical counts -> psi exactly 0.
    val self = Drift.psiEquiDepth(ref, ref, "x").head()
    assert(self.getDouble(0) == 0.0 && self.getLong(1) == 10L)
    // All current mass in the reference's top decile: big psi, same 10 categories.
    val top = (1 to 1000).map(_ => 950.0).toDF("x")
    val shifted = Drift.psiEquiDepth(ref, top, "x").head().getDouble(0)
    assert(shifted > 1.0, s"psi $shifted should flag a total concentration")
    // Outlier robustness — the equi-depth edge: one 1e12 outlier in cur lands in the
    // top EDGE bin instead of stretching fixed-width bins until all data shares one.
    val out = Drift.psiEquiDepth(ref, ref.union(Seq(1.0e12).toDF("x")), "x").head()
    assert(out.getDouble(0) < 0.01 && out.getLong(1) == 10L)
    // NULL / NaN / uncastable classes: NaN gets bin -1, NULL and uncastable share
    // the NULL category -> 12 categories when all present.
    val hostile = Seq(Some("5.0"), None, Some("NaN"), Some("not-a-number")).toDF("x")
    val h = Drift.psiEquiDepth(ref.select(col("x").cast("string")), hostile, "x").head()
    assert(h.getLong(1) == 12L, s"expected 10 value bins + NaN + NULL, got ${h.getLong(1)}")
    // Empty / all-hostile reference: NULL psi over zero categories.
    val e = Drift.psiEquiDepth(ref.filter(lit(false)), ref, "x").head()
    assert(e.isNullAt(0) && e.getLong(1) == 0L)
    val nanRef = Seq(Double.NaN).toDF("x")
    val e2 = Drift.psiEquiDepth(nanRef, ref, "x").head()
    assert(e2.isNullAt(0) && e2.getLong(1) == 0L)
    intercept[IllegalArgumentException](Drift.psiEquiDepth(ref, ref, "x", buckets = 0))
  }

  test("psiNumeric: clamped fixed-width bins catch a mean shift") {
    import spark.implicits._
    val ref = (1 to 1000).map(_ % 100).map(_.toDouble).toDF("x")
    val cur = (1 to 1000).map(i => (i % 100) + 50.0).toDF("x") // shifted + out-of-range
    val drifted = Drift.psiNumeric(ref, cur, "x", lo = 0, hi = 100, bins = 10).head().getDouble(0)
    assert(drifted > 0.25)
    val stable = Drift.psiNumeric(ref, ref, "x", lo = 0, hi = 100, bins = 10).head().getDouble(0)
    assert(math.abs(stable) < 1e-12)
    // NaN gets its own bin, not silently clamped into bin 0: NaN-only drift registers
    // as a category count change, and identical NaN fractions stay stable.
    val withNan = (1 to 100).map(i => if (i % 10 == 0) Double.NaN else (i % 100).toDouble).toDF("x")
    val nanDrift = Drift.psiNumeric(ref, withNan, "x", lo = 0, hi = 100, bins = 10).head()
    assert(nanDrift.getLong(1) == 11L) // 10 value bins + the NaN bin
    val nanStable = Drift.psiNumeric(withNan, withNan, "x", lo = 0, hi = 100, bins = 10)
      .head().getDouble(0)
    assert(math.abs(nanStable) < 1e-12)
  }

  test("hasNoPii and hasStableDistribution constraints wire into the suite") {
    import spark.implicits._
    import graft.core._
    val clean = Seq("all good here", "nothing sensitive").toDF("text")
    val dirty = Seq("mail bob@x.io", "all good").toDF("text")
    def run(df: org.apache.spark.sql.DataFrame) =
      ValidationSuite("pii", Seq(CheckBuilder("c", Level.Error).hasNoPii("text").build()))
        .run(df).allResults.head.status
    assert(run(clean) == ConstraintStatus.Success)
    assert(run(dirty) == ConstraintStatus.Failure)
    val ref = (Seq.fill(80)("en") ++ Seq.fill(20)("de")).toDF("lang")
    val cur = (Seq.fill(20)("en") ++ Seq.fill(80)("de")).toDF("lang")
    def drift(df: org.apache.spark.sql.DataFrame) =
      ValidationSuite("drift", Seq(CheckBuilder("d", Level.Error)
        .hasStableDistribution(ref, "lang").build())).run(df).allResults.head.status
    assert(drift(ref) == ConstraintStatus.Success)
    assert(drift(cur) == ConstraintStatus.Failure)
    // Empty current side -> skipped, not a verdict
    assert(ValidationSuite("drift", Seq(CheckBuilder("d", Level.Error)
      .hasStableDistribution(ref, "lang").build()))
      .run(ref.filter(lit(false))).allResults.head.status == ConstraintStatus.Skipped)
  }

  test("dedupLinesAcrossCorpus: first occurrence wins, structure preserved") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "intro\n\nshared boilerplate\nunique a"),
      (Some(2L), "shared boilerplate\nunique b\n\nintro"),
      (Some(3L), "shared boilerplate"),
      (Some(4L), ""),
      (Some(5L), null: String),
      (None: Option[Long], "shared boilerplate\nkept verbatim"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLinesAcrossCorpus(df, "doc_id", "text")
      .collect().map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.getString(1)), r.getLong(2), r.getLong(3))).toSeq
    val byId = out.collect { case (Some(id), t, lt, ld) => id -> ((t, lt, ld)) }.toMap
    // doc 1 holds every first occurrence -> unchanged (incl. the empty line)
    assert(byId(1L) == ((Some("intro\n\nshared boilerplate\nunique a"), 4L, 0L)))
    // doc 2 loses both lines doc 1 claimed; its empty line survives (structural)
    assert(byId(2L) == ((Some("unique b\n"), 4L, 2L)))
    // doc 3 loses its only line -> empty, not NULL
    assert(byId(3L) == ((Some(""), 1L, 1L)))
    // empty doc: its one empty line is structural, kept
    assert(byId(4L) == ((Some(""), 1L, 0L)))
    // NULL text stays NULL
    assert(byId(5L) == ((None, 0L, 0L)))
    // NULL id: verbatim, no participation (its 'shared boilerplate' copy survives)
    val nullRow = out.collectFirst { case (None, t, lt, ld) => (t, lt, ld) }.get
    assert(nullRow == ((Some("shared boilerplate\nkept verbatim"), 2L, 0L)))
  }

  test("dedupLinesAcrossCorpus: dup-free corpus round-trips byte-identical") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"alpha $i\nbeta $i\n\ngamma $i")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesAcrossCorpus(docs, "doc_id", "text")
    assert(out.filter(col("lines_dropped") > 0).count() == 0L)
    val back = out.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert((1L to 50L).forall(i => back(i) == s"alpha $i\nbeta $i\n\ngamma $i"))
  }

  test("dedupLinesAcrossCorpus sep=\\n\\n: paragraph blocks dedup atomically") {
    import spark.implicits._
    val footer = "SHARED FOOTER\nSECOND LINE"
    val df = Seq(
      (1L, s"body one\n\n$footer"),
      (2L, s"body two\n\n$footer"),
      (3L, s"unrelated\nno footer"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLinesAcrossCorpus(df, "doc_id", "text", sep = "\n\n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 keeps the footer paragraph (first occurrence, both its lines intact)
    assert(out(1L) == ((s"body one\n\n$footer", 2L, 0L)))
    // doc 2 loses the WHOLE footer block atomically — line-level dedup would have
    // left "SECOND LINE" orphaned if only one line were duplicated elsewhere
    assert(out(2L) == (("body two", 2L, 1L)))
    // a doc with no duplicate paragraph round-trips byte-identical (internal \n kept)
    assert(out(3L) == (("unrelated\nno footer", 1L, 0L)))
  }

  test("temperatureWeights: alpha rebalances toward small strata, null stratum kept") {
    import spark.implicits._
    val df = (Seq.fill(80)(Some("en")) ++ Seq.fill(20)(Some("de")) :+ (None: Option[String]))
      .toDF("lang")
    val prop = Sampling.temperatureWeights(df.filter(col("lang").isNotNull), "lang",
      alpha = 1.0, budgetRows = 100)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(math.abs(prop("en")._2 - 0.8) < 1e-12 && math.abs(prop("de")._2 - 0.2) < 1e-12)
    assert(math.abs(prop("en")._3 - 1.0) < 1e-12, "alpha=1 with budget=N is one epoch each")
    val sq = Sampling.temperatureWeights(df.filter(col("lang").isNotNull), "lang",
      alpha = 0.5, budgetRows = 100)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val z = math.sqrt(80.0) + math.sqrt(20.0)
    assert(math.abs(sq("de")._1 - math.sqrt(20.0) / z) < 1e-12)
    assert(sq("de")._2 > 1.0 && sq("en")._2 < 1.0,
      "alpha<1 must up-sample the small stratum past one epoch")
    // NULL stratum is a real group
    val withNull = Sampling.temperatureWeights(df, "lang", 0.5, 100)
    assert(withNull.filter(col("lang").isNull).count() == 1L)
    intercept[IllegalArgumentException](Sampling.temperatureWeights(df, "lang", 0.0, 10))
  }

  test("interleaveBySource matches the window formulation and orders round-robin") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"), (5L, "a"), (6L, "b"))
    // scramble partitioning to prove partition-independence
    val df = rows.toDF("id", "src").repartition(5)
    val out = Sharding.interleaveBySource(df, "src", "id")
    val got = out.orderBy(col("rr_rank"), col("src")).select("id", "src", "rr_rank")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 1L), (2L, "b", 1L), (4L, "c", 1L),
      (3L, "a", 2L), (6L, "b", 2L), (5L, "a", 3L)))
    // equivalence with the single-task window formulation on a larger frame
    val big = (1L to 500L).map(i => (i, s"s${i % 7}")).toVector.toDF("id", "src")
      .repartition(13)
    val viaOp = Sharding.interleaveBySource(big, "src", "id")
      .select("id", "rr_rank").as[(Long, Long)].collect().toMap
    val viaWin = big.withColumn("rr_rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("id"))))
      .select("id", "rr_rank").as[(Long, Int)].collect().toMap
    assert(viaOp.size == 500 && viaOp.forall { case (id, r) => viaWin(id).toLong == r })
    // null sources rank as their own group
    val withNull = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, None: Option[String]))
      .toDF("id", "src")
    val nr = Sharding.interleaveBySource(withNull, "src", "id")
      .filter(col("src").isNull).select("id", "rr_rank").as[(Long, Long)].collect().toMap
    assert(nr == Map(2L -> 1L, 3L -> 2L))
    // source-cardinality guard fails loud — in the TASK (before any driver
    // collect), so it surfaces as a SparkException wrapping the guard's message
    val wide = (1L to 100L).map(i => (i, s"s$i")).toVector.toDF("id", "src")
    val e = intercept[Exception](
      Sharding.interleaveBySource(wide, "src", "id", maxSources = 10))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("bucket the group key")), s"unexpected: $e")
  }

  test("snapshot diff: statuses, null-safe column compare, null keys excluded") {
    import spark.implicits._
    import graft.operators.SnapshotDiff
    val old = Seq(
      (Some(1L), Some("a"), Some(10.0)),
      (Some(2L), Some("b"), Some(20.0)),  // removed in new
      (Some(3L), None: Option[String], Some(30.0)), // value null -> null: unchanged
      (Some(4L), Some("d"), Some(40.0)),  // price changes
      (Some(5L), None: Option[String], Some(50.0)), // null -> value: changed
      (None, Some("x"), Some(0.0)))       // null key: excluded
      .toDF("id", "status", "price")
    val neu = Seq(
      (Some(1L), Some("a"), Some(10.0)),  // unchanged
      (Some(3L), None: Option[String], Some(30.0)),
      (Some(4L), Some("d"), Some(41.0)),
      (Some(5L), Some("e"), Some(50.0)),
      (Some(6L), Some("f"), Some(60.0)),  // added
      (None, Some("y"), Some(0.0)))
      .toDF("id", "status", "price")
    val d = SnapshotDiff.rowDiff(old, neu, Seq("id"), Seq("status", "price"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
    assert(d(1L) == (("unchanged", Some(false), Some(false))))
    assert(d(2L) == (("removed", None, None)), "removed rows have nothing to compare")
    assert(d(3L) == (("unchanged", Some(false), Some(false))), "NULL <=> NULL is unchanged")
    assert(d(4L) == (("changed", Some(false), Some(true))))
    assert(d(5L) == (("changed", Some(true), Some(false))), "NULL -> value is a change")
    assert(d(6L) == (("added", None, None)))
    assert(d.size == 6, "null-keyed rows must not appear")
    val s = SnapshotDiff.diffSummary(old, neu, Seq("id"), Seq("status", "price")).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == ((1L, 1L, 2L, 2L)))
    assert((s.getLong(4), s.getLong(5)) == ((1L, 1L)), "per-column changed counts")
    intercept[IllegalArgumentException](
      SnapshotDiff.rowDiff(old, neu, Seq("id"), Seq("id", "price")))
  }

  test("sessionize: gap boundaries, per-key independence, tie safety, null exclusion") {
    import spark.implicits._
    import graft.operators.Sessions
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00"))),
      (Some(1L), Some(ts("2024-01-01 10:10:00"))), // 10 min gap: same session
      (Some(1L), Some(ts("2024-01-01 11:00:00"))), // 50 min gap: new session
      (Some(1L), Some(ts("2024-01-01 11:30:00"))), // exactly 30 min: NOT > gap, same
      (Some(2L), Some(ts("2024-01-01 10:05:00"))), // other key: own numbering
      (None, Some(ts("2024-01-01 10:00:00"))),     // null key: excluded
      (Some(3L), None))                            // null ts: excluded
      .toDF("user_id", "ts")
    val s = Sessions.sessionize(df, "user_id", "ts", maxGapSeconds = 1800)
      .select(col("user_id"), col("ts"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(s.length == 5, "null key/ts rows must be excluded")
    val u1 = s.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(u1 == Seq(1L, 1L, 2L, 2L), s"session boundaries wrong: $u1")
    assert(s.find(_._1 == 2L).get._3 == 1L)
    val st = Sessions.sessionStats(df, "user_id", "ts", 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(st((1L, 1L)) == ((2L, 600L * 1000000L)))
    assert(st((1L, 2L)) == ((2L, 1800L * 1000000L)))
    assert(st((2L, 1L)) == ((1L, 0L)))
    // tied timestamps never straddle a session boundary
    val tied = Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-01 12:00:00"))).toDF("user_id", "ts")
    val tiedIdx = Sessions.sessionize(tied, "user_id", "ts", 1800)
      .filter(col("ts") === ts("2024-01-01 12:00:00"))
      .select("session_idx").as[Long].collect().toSet
    assert(tiedIdx.size == 1, s"ties split across sessions: $tiedIdx")
    // string timestamps: ISO strings sessionize temporally; non-castable values are
    // EXCLUDED like NULLs (try_cast), never silently one-session-per-event
    val strTs = Seq((1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "not a timestamp")).toDF("user_id", "ts")
    val strOut = Sessions.sessionize(strTs, "user_id", "ts", 1800)
      .select("session_idx").as[Long].collect()
    assert(strOut.toSeq == Seq(1L, 1L), s"string-ts handling wrong: ${strOut.toSeq}")
  }

  test("quality classifier: trains on seed labels, separates held-out docs, scores row-local") {
    import spark.implicits._
    import graft.operators.QualityClassifier
    val rng = new scala.util.Random(3)
    val goodVocab = Seq("theorem", "analysis", "method", "results", "experiment", "study")
    val badVocab = Seq("click", "free", "winner", "casino", "pills", "xxx")
    def doc(vocab: Seq[String]) =
      (1 to 12).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    val train = ((1 to 60).map(_ => (doc(goodVocab), 1)) ++
      (1 to 60).map(_ => (doc(badVocab), 0))).toDF("text", "label")
    val model = QualityClassifier.trainLogistic(train, "text", "label", dim = 64)
    assert(model.weights.length == 64)
    // held-out docs from the same vocabularies must separate cleanly
    val heldOut = ((1 to 30).map(i => (i.toLong, doc(goodVocab), 1)) ++
      (1 to 30).map(i => (i + 100L, doc(badVocab), 0))).toDF("id", "text", "label")
    val scored = heldOut.select(col("label"),
      model.score(col("text")).as("s")).collect()
    val acc = scored.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getInt(0) == 1)).toDouble / scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // determinism: refit on the same seed reproduces identical weights
    val model2 = QualityClassifier.trainLogistic(train, "text", "label", dim = 64)
    assert(model.weights.sameElements(model2.weights) && model.intercept == model2.intercept)
    // null text scores null; tokenless text scores the prior
    val edge = Seq(Some("   "), None).toDF("text")
      .select(model.score(col("text")).as("s")).collect()
    val prior = 1.0 / (1.0 + math.exp(-model.intercept))
    assert(math.abs(edge(0).getDouble(0) - prior) < 1e-12)
    assert(edge(1).isNullAt(0))
    // scoring is a row-local projection: no Exchange over a real scan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(model.score(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    // fused-kernel score == Column-fold specification, bit-for-bit
    val cmp = heldOut.select(model.score(col("text")).as("a"),
      model.scoreColumns(col("text")).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(cmp == 0L, "AffineToProbe scoring diverges from the fold spec")
  }

  test("embeddingShift: zero shift on identical corpora, moved dims register, dim changes visible") {
    import spark.implicits._
    def get(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val a = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val (nd, ro, co, l2, cos, mx) = get(Drift.embeddingShift(a, a, "v").head())
    assert(nd == 2L && ro == 0L && co == 0L)
    assert(l2 == 0.0 && mx == 0.0)
    assert(math.abs(cos - 1.0) < 1e-12, "identical centroids: cosine 1")
    val b = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 1.0f))).toDF("id", "v")
    val moved = get(Drift.embeddingShift(a, b, "v").head())
    assert(moved._4 > 0.9 && moved._6 > 0.9, "dim-0 centroid moved by 1")
    // a null element excludes the whole vector, not just the dimension
    val withNull = spark.sql(
      "SELECT CAST(3 AS BIGINT) AS id, array(CAST(NULL AS FLOAT), CAST(9.0 AS FLOAT)) AS v")
      .unionByName(a)
    assert(get(Drift.embeddingShift(withNull, a, "v").head())._4 == 0.0,
      "null-element vector must not skew the centroid")
    // an encoder dim change must be VISIBLE, not silently dropped by an inner join:
    // cur grows two extra dims whose whole mass counts as shift
    val wide = Seq((1L, Seq(1.0f, 0.0f, 3.0f, 4.0f)), (2L, Seq(0.0f, 1.0f, 3.0f, 4.0f)))
      .toDF("id", "v")
    val dimChange = get(Drift.embeddingShift(a, wide, "v").head())
    assert(dimChange._1 == 4L && dimChange._3 == 2L,
      s"cur-only dims must surface: $dimChange")
    assert(dimChange._4 > 4.9, "new dims' mass must count as shift (3-4-5 triangle: 5)")
  }

  test("ksStatisticByGroup: per-group == global on that group, one-sided NULL, null group") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val ref = (1 to 2000).map(_ => (Some(Seq("A", "B")(rng.nextInt(2))), rng.nextGaussian()))
      .toDF("g", "v")
      .unionByName(Seq((Option.empty[String], 1.0), (Option.empty[String], 2.0)).toDF("g", "v"))
    val cur = (1 to 1500).map { _ =>
      val g = Seq("A", "B")(rng.nextInt(2))
      (Some(g), rng.nextGaussian() + (if (g == "A") 0.5 else 0.0))
    }.toDF("g", "v").unionByName(Seq((Some("C"), 3.0)).toDF("g", "v"))
    val out = Drift.ksStatisticByGroup(ref, cur, "g", "v").collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // per-group result == the global operator run on just that group
    for (g <- Seq("A", "B")) {
      val expect = Drift.ksStatistic(
        ref.filter($"g" === g), cur.filter($"g" === g), "v").head().getDouble(2)
      assert(out(Some(g))._3.contains(expect), s"group $g: ${out(Some(g))} vs $expect")
    }
    assert(out(Some("A"))._3.get > out(Some("B"))._3.get,
      "the planted 0.5-sigma shift in A must dominate B's noise")
    // one-sided groups: NULL ks, counts honest; NULL group is a real group
    assert(out(Some("C")) == ((0L, 1L, None)), "cur-only group reports NULL ks")
    assert(out(None) == ((2L, 0L, None)), "NULL group kept, ref-only -> NULL ks")
    intercept[IllegalArgumentException](Drift.ksStatisticByGroup(ref, cur, "ks", "v"))
  }

  test("psiSeries: first-day NULL, zero on repeat, closed-form shift, phantom day absent") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // day1 {a:2,b:2}; day2 identical; day3 {a:4} (b vanishes)
    val rows = Seq(ts(1) -> "a", ts(1) -> "a", ts(1) -> "b", ts(1) -> "b",
      ts(2) -> "a", ts(2) -> "a", ts(2) -> "b", ts(2) -> "b",
      ts(3) -> "a", ts(3) -> "a", ts(3) -> "a", ts(3) -> "a")
    val df = rows.toDF("ts", "cat")
      .unionByName(Seq((Option.empty[java.sql.Timestamp], Some("a"))).toDF("ts", "cat"))
    val out = Drift.psiSeries(df, "ts", "cat").collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out.size == 3, s"exactly the three data days: $out")
    assert(out("2024-01-01")._2.isEmpty, "first day has no reference: NULL psi")
    assert(math.abs(out("2024-01-02")._2.get) < 1e-12, "identical distribution: psi 0")
    val eps = 1e-6
    val want = (0.5 - 1.0) * math.log(0.5 / 1.0) +
      (0.5 - eps) * math.log(0.5 / eps)
    assert(math.abs(out("2024-01-03")._2.get - want) < 1e-9,
      s"${out("2024-01-03")._2.get} vs closed-form $want")
    assert(out("2024-01-03")._1 == 2L, "union categories of cur and ref")
    // NULL category is a real category; a shifted day with no current rows is absent
    val withNullCat = df.unionByName(Seq((Some(ts(2)), Option.empty[String])).toDF("ts", "cat"))
    val d2 = Drift.psiSeries(withNullCat, "ts", "cat").collect()
      .find(_.getDate(0).toString == "2024-01-02").get
    assert(d2.getLong(1) == 3L, "NULL category counts as a category")
  }

  test("ksStatistic: 0 on identical, 1 on disjoint, matches naive ECDF, edge classes") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val a = (1 to 4000).map(_ => rng.nextGaussian()).toDF("v")
    val b = (1 to 3000).map(_ => rng.nextGaussian() + 0.3).toDF("v")
    def ks(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Drift.ksStatistic(r, c, "v").head()
    val same = ks(a, a)
    assert(same.getDouble(2) == 0.0, "identical samples: D = 0")
    val disjoint = ks(a, a.select(($"v" + 100.0).as("v")))
    assert(disjoint.getDouble(2) == 1.0, "fully separated samples: D = 1")
    // exact agreement with the naive single-window ECDF formulation
    val got = ks(a, b)
    val u = a.select($"v", lit(1).as("s")).unionByName(b.select($"v", lit(2).as("s")))
    val g = u.groupBy("v").agg(
      sum(when($"s" === 1, 1L).otherwise(0L)).as("c1"),
      sum(when($"s" === 2, 1L).otherwise(0L)).as("c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = g.select((abs(sum($"c1").over(w) / 4000.0 - sum($"c2").over(w) / 3000.0))
      .as("d")).agg(max($"d")).head().getDouble(0)
    assert(got.getDouble(2) == naive, s"${got.getDouble(2)} vs naive $naive")
    assert(got.getLong(0) == 4000L && got.getLong(1) == 3000L)
    // a location shift of 0.3 sigma must register well above same-sample noise
    assert(got.getDouble(2) > 0.08)
    // empty side -> NULL ks, counts still reported; non-finite values excluded
    val empty = a.filter(lit(false))
    val e = ks(a, empty)
    assert(e.getLong(1) == 0L && e.isNullAt(2))
    val hostile = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1.0)
      .toDF("v")
    assert(ks(hostile, hostile).getLong(0) == 1L, "only the finite value survives")
  }

  test("embeddingShift: one-sided-empty comparison yields NULL cosine, not DIVIDE_BY_ZERO") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val empty = a.filter(lit(false))
    // Empty cur side: every ref dim compares against mean 0, so the cosine
    // denominator is exactly 0.0 — must be NULL (matching psi's NULL-on-empty),
    // not an ANSI DIVIDE_BY_ZERO runtime error.
    val oneSided = Drift.embeddingShift(a, empty, "v").head()
    assert(oneSided.isNullAt(oneSided.fieldIndex("centroid_cosine")))
    assert(oneSided.getDouble(oneSided.fieldIndex("l2_shift")) > 0.0,
      "the ref side's whole mass is the shift")
    // Both sides empty: zero output rows upstream of the final agg — still no error.
    val bothEmpty = Drift.embeddingShift(empty, empty, "v").head()
    assert(bothEmpty.getLong(bothEmpty.fieldIndex("n_dims")) == 0L)
    assert(bothEmpty.isNullAt(bothEmpty.fieldIndex("centroid_cosine")))
  }

  test("sampling operators refuse inputs that shadow reserved internal columns") {
    import spark.implicits._
    val clash = (1 to 10).map(i => (i.toLong, "en", i)).toDF("id", "lang", "_rn")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.quotaPerStratum(clash, Seq("lang"), 3, Seq("id"))
    }
    assert(e1.getMessage.contains("_rn"))
    // the salt-path columns are only reserved when the salt path actually runs
    val saltClash = (1 to 10).map(i => (i.toLong, "en", i)).toDF("id", "lang", "_salt")
    Sampling.quotaPerStratum(saltClash, Seq("lang"), 3, Seq("id")) // salt=1: fine
    val e2 = intercept[IllegalArgumentException] {
      Sampling.quotaPerStratum(saltClash, Seq("lang"), 3, Seq("id"), salt = 4)
    }
    assert(e2.getMessage.contains("_salt"))
    val qClash = (1 to 10).map(i => (i.toLong, "en", i)).toDF("id", "lang", "_q_rank")
    val e3 = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(qClash, "lang", Map("en" -> 3), Seq("id"))
    }
    assert(e3.getMessage.contains("_q_rank"))
  }

  test("probe kernels fail loud on a vector/weights dimension mismatch") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    def rootMessage(t: Throwable): String = {
      var cur = t; val sb = new StringBuilder
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    // 2-dim weights against a 3-dim vector: scoring a prefix would silently
    // corrupt every score — both kernels must throw instead (ivfAssign rule).
    val eAff = intercept[Exception] {
      df.select(graft.functions.VectorFunctions.affineToProbe(
        col("v"), Seq(1.0, 2.0), 0.5)).collect()
    }
    assert(rootMessage(eAff).contains("refusing to score a prefix"), rootMessage(eAff))
    val eCos = intercept[Exception] {
      df.select(graft.functions.VectorFunctions.cosineToProbe(
        col("v"), Seq(1.0f, 2.0f))).collect()
    }
    assert(rootMessage(eCos).contains("refusing to score a prefix"), rootMessage(eCos))
    // matched dims still score
    val ok = df.select(graft.functions.VectorFunctions.affineToProbe(
      col("v"), Seq(1.0, 1.0, 1.0), 0.0)).head().getDouble(0)
    assert(math.abs(ok - 6.0) < 1e-9)
  }

  test("deflateRatio orders repetitive < prose < noise; edge classes defined") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val repetitive = "lorem ipsum " * 200
    val prose = (1 to 200).map(i => s"sentence number $i differs mildly").mkString(". ")
    val noise = (1 to 2000).map(_ => rng.nextPrintableChar()).mkString
    val out = Seq(("rep", repetitive), ("prose", prose), ("noise", noise))
      .toDF("k", "text")
      .select(col("k"), TextFunctions.deflateRatio(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("rep") < out("prose"), s"$out")
    assert(out("prose") < out("noise"), s"$out")
    assert(out("rep") < 0.05 && out("noise") > 0.5, s"$out")
    val edge = Seq(Some(""), None: Option[String]).toDF("text")
      .select(TextFunctions.deflateRatio(col("text"))).collect()
    assert(edge(0).getDouble(0) == 1.0, "empty text is incompressible by convention")
    assert(edge(1).isNullAt(0))
    // deterministic, and the SQL registration hits the SAME kernel (identical
    // value on the identical literal — a mis-wired registration cannot pass)
    graft.functions.GraftFunctions.register(spark)
    val lit50 = "ab " * 50
    val viaSql = spark.sql(s"SELECT graft_deflate_ratio('$lit50')").head().getDouble(0)
    val viaCol = Seq(lit50).toDF("text")
      .select(TextFunctions.deflateRatio(col("text"))).head().getDouble(0)
    assert(viaSql == viaCol, s"SQL $viaSql != Column $viaCol on the same literal")
    val twice = Seq(prose, prose).toDF("text")
      .select(TextFunctions.deflateRatio(col("text"))).as[Double].collect()
    assert(twice(0) == twice(1), "ratio must be deterministic")
  }

  test("gopherFlags: each rule trips on its own violation class") {
    import spark.implicits._
    val cfg = TextFunctions.GopherConfig(minWords = 3, maxWords = 10,
      minMeanWordLen = 2.0, maxMeanWordLen = 6.0, maxSymbolWordRatio = 0.25,
      maxBulletLineFraction = 0.5, maxEllipsisLineFraction = 0.5,
      minAlphaWordFraction = 0.5, minStopwordHits = 1)
    val docs = Seq(
      (1L, "the quick brown fox"),          // passes every rule
      (2L, "hi there"),                     // word count 2 < 3
      (3L, "the a # # bb ..."),             // 3 symbols > 0.25 * 6 words
      (4L, "- one the\n- two the\nthree"),  // 2/3 bullet lines > 0.5
      (5L, "one the...\ntwo the...\nthree"),// 2/3 ellipsis-ended lines > 0.5
      (6L, "11 22 33 the"),                 // alpha words 1/4 < 0.5
      (7L, "xyz abc qqq"),                  // zero stopword hits
      (8L, null: String))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextFunctions.gopherFlags(col("text"), cfg).as("g")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    def flag(id: Long, f: String): Boolean =
      out(id).get.getBoolean(out(id).get.fieldIndex(f))
    assert(flag(1L, "keep"))
    assert(!flag(2L, "word_count_ok") && !flag(2L, "keep"))
    assert(!flag(3L, "symbol_ratio_ok") && flag(3L, "word_count_ok"))
    assert(!flag(4L, "bullet_lines_ok") && flag(4L, "ellipsis_lines_ok"))
    assert(!flag(5L, "ellipsis_lines_ok") && flag(5L, "bullet_lines_ok"))
    assert(!flag(6L, "alpha_words_ok") && flag(6L, "stopword_ok"))
    assert(!flag(7L, "stopword_ok") && flag(7L, "alpha_words_ok"))
    assert(out(8L).isEmpty, "NULL text must yield a NULL verdict struct")
  }

  test("gopherFlags default config keeps normal prose, drops word salad") {
    import spark.implicits._
    val prose = ("the report was written to be read with care and that is why " +
      "every line of the method section has to explain what the data can and " +
      "cannot support before any claim is made about the result of the study " +
      "so the reader can trust each number that appears in the final pages").trim
    val salad = Seq.fill(60)("zzgh").mkString(" ") // no stopwords, uniform junk
    val out = Seq((1L, prose), (2L, salad)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.gopherFlags(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(out(1L).getBoolean(out(1L).fieldIndex("keep")))
    assert(!out(2L).getBoolean(out(2L).fieldIndex("keep")))
  }

  test("duplicateTokenSpans: planted cross-doc run merges into one maximal span") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (Some(1L), s"$shared unique tail here"),
      (Some(2L), s"prefix junk $shared"),
      (Some(3L), "totally different words with no repeats at all whatsoever today"),
      (Some(4L), "tiny doc"),            // < k tokens: zeros
      (Some(5L), null: String),          // NULL text: zeros
      (None: Option[Long], shared))      // NULL id: excluded entirely
      .toDF("doc_id", "text")
    val out = Dedup.duplicateTokenSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: shared run = tokens 0..9; interior grams at 0,1,2 -> one span of 10
    assert(out(1L) == ((13L, 3L, 1L, 10L)))
    // doc 2: shared run = tokens 2..11; grams at 2,3,4 -> one span of 10
    assert(out(2L) == ((12L, 3L, 1L, 10L)))
    assert(out(3L) == ((10L, 0L, 0L, 0L)))
    assert(out(4L) == ((2L, 0L, 0L, 0L)))
    assert(out(5L) == ((0L, 0L, 0L, 0L)))
    assert(!out.contains(0L) && out.size == 5, "NULL-id doc must be excluded")
  }

  test("removeDuplicateSpans: cut == detect's covered_tokens, rebuild exact, pass-through classes") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (Some(1L), s"$shared unique tail here"),
      (Some(2L), s"prefix junk $shared"),
      (Some(3L), "totally different words with no repeats at all whatsoever today"),
      (Some(4L), "tiny  doc"),           // < k tokens: untouched (but ws-normalized)
      (Some(5L), null: String),          // NULL text stays NULL
      (Some(6L), shared),                // fully covered: empty string out
      (None: Option[Long], shared))      // NULL id: verbatim pass-through
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(out(Some(1L)) == ((Some("unique tail here"), 13L, 10L)))
    assert(out(Some(2L)) == ((Some("prefix junk"), 12L, 10L)))
    assert(out(Some(3L)) == ((Some("totally different words with no repeats at all whatsoever today"), 10L, 0L)))
    assert(out(Some(4L)) == ((Some("tiny doc"), 2L, 0L)))
    assert(out(Some(5L)) == ((None, 0L, 0L)))
    assert(out(Some(6L)) == ((Some(""), 10L, 10L)))
    assert(out(None) == ((Some(shared), 10L, 0L)), "NULL id passes through verbatim")
    // Consistency with the detect pass on the real fixture corpus: per doc,
    // tokens_removed == duplicateTokenSpans.covered_tokens.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        concat(lit("shared header alpha beta gamma delta epsilon zeta eta theta "),
          col("text")).as("text"))
    val removed = Dedup.removeDuplicateSpans(corpus, "doc_id", "text")
      .select(col("doc_id"), col("tokens_removed")).as[(Long, Long)].collect().toMap
    val detected = Dedup.duplicateTokenSpans(corpus, "doc_id", "text")
      .select(col("doc_id"), col("covered_tokens")).as[(Long, Long)].collect().toMap
    assert(removed == detected, "remove and detect must agree on coverage")
    assert(removed.values.sum > 0, "the planted header must be cut somewhere")
    intercept[IllegalArgumentException](Dedup.removeDuplicateSpans(docs, "doc_id", "text", 1))
    intercept[IllegalArgumentException](Dedup.removeDuplicateSpans(
      docs.withColumn("tokens_total", lit(1)), "doc_id", "text"))
  }

  test("duplicateTokenSpans: within-doc repetition and adjacent spans count") {
    import spark.implicits._
    val doc = (1L, "a b c d e f g h a b c d e f g h") // gram repeats at pos 0 and 8
    val out = Dedup.duplicateTokenSpans(Seq(doc).toDF("doc_id", "text"), "doc_id", "text", k = 8)
      .collect().head
    assert(out.getLong(1) == 16L)
    assert(out.getLong(2) == 2L, "positions 0 and 8 both duplicated")
    assert(out.getLong(3) == 2L, "gap of exactly k opens a second span")
    assert(out.getLong(4) == 16L, "both 8-token windows covered")
    assert(out.getDouble(5) == 1.0)
  }

  test("urlNormalize: canonical spellings collapse, non-URLs pass through") {
    import spark.implicits._
    import graft.functions.WebFunctions
    val in = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&z=2&a=1#frag",
      "https://example.com/a/b?a=1&z=2",     // the canonical twin of the above
      "http://host.org:8080/x/",             // non-default port survives
      "http://host.org:443/x",               // :443 is NOT http's default — kept
      "https://example.com/",                // root slash drops
      "https://example.com/q?utm_source=x",  // all params tracking -> no '?'
      "  ftp://Files.Example.net:21/д/  ",   // other scheme: port kept, path case kept
      "not a url at all  ",
      null)
      .toDF("u").select(WebFunctions.urlNormalize(col("u")).as("n"))
      .as[String].collect()
    assert(in(0) == "https://example.com/a/b?a=1&z=2")
    assert(in(0) == in(1))
    assert(in(2) == "http://host.org:8080/x")
    assert(in(3) == "http://host.org:443/x")
    assert(in(4) == "https://example.com")
    assert(in(5) == "https://example.com/q")
    assert(in(6) == "ftp://files.example.net:21/д")
    assert(in(7) == "not a url at all")
    assert(in(8) == null)
  }

  test("domainOf: public-suffix rule, subdomains, degenerate hosts") {
    import spark.implicits._
    import graft.functions.WebFunctions
    val out = Seq(
      "https://a.b.Example.CO.UK/x",
      "https://x.y.example.com/x",
      "http://localhost:9000/x",
      "https://WWW.example.net/x",
      "no scheme here")
      .toDF("u").select(WebFunctions.domainOf(col("u")).as("d")).as[String].collect()
    assert(out(0) == "example.co.uk")
    assert(out(1) == "example.com")
    assert(out(2) == "localhost")
    assert(out(3) == "example.net")
    assert(out(4) == "", "non-URL has no host, so no domain")
  }

  test("native url kernel == Column-pipeline specification over a hostile corpus") {
    import spark.implicits._
    import graft.functions.WebFunctions
    // Every spelling class the Column pipeline handles, plus generated combinations
    val fixed = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&z=2&a=1#frag",
      "https://example.com/a/b?a=1&z=2", "http://host.org:8080/x/",
      "http://host.org:443/x", "https://example.com/", "http://example.com:80",
      "https://example.com/q?utm_source=x", "  ftp://Files.Example.net:21/д/  ",
      "not a url at all  ", "", "   ", "https://", "http://#", "http://?",
      "http://h#f?fake=1", "http://h/?", "http://h/?&&", "http://h/?ref=1&REF=2&r=",
      "http://h/p?utm_=x&utm_a-b=c&UTM_Z9=ok", "https://a.b.Example.CO.UK/x",
      "http://localhost:9000/x", "scheme+odd-1.x://Host/Pp?b=2&a=1#z",
      "http://www.:80", "http://:80/x", "http://h:8080:80/x", "http://h:",
      "https://example.com////", "http://h/a//b///?z=%20&a=+", "xx://WWW.UP.COM:443/a")
    val rng = new scala.util.Random(11)
    val gen = (1 to 300).map { _ =>
      val scheme = Seq("http", "HTTP", "https", "HTTPS", "ftp")(rng.nextInt(5))
      val www = if (rng.nextBoolean()) "WWW." else ""
      val host = Seq("Ex.COM", "a.b.co.uk", "X.Y.Example.net", "localhost")(rng.nextInt(4))
      val port = Seq("", ":80", ":443", ":8080")(rng.nextInt(4))
      val path = Seq("", "/", "/a/b", "/a/b/", "//x//")(rng.nextInt(5))
      val query = Seq("", "?z=1&a=2", "?utm_source=f&b=1", "?REF=x", "?&", "?a=1&a=1")(rng.nextInt(6))
      val frag = Seq("", "#f", "#")(rng.nextInt(3))
      s"$scheme://$www$host$port$path$query$frag"
    }
    val df = (fixed ++ gen).toDF("u")
    val cmp = df.select(
      WebFunctions.urlNormalize(col("u")).as("n1"),
      WebFunctions.urlNormalizeColumns(col("u")).as("n2"),
      WebFunctions.hostOf(col("u")).as("h1"),
      WebFunctions.hostOfColumns(col("u")).as("h2"),
      WebFunctions.domainOf(col("u")).as("d1"),
      WebFunctions.domainOfColumns(col("u")).as("d2"))
    val bad = cmp.filter(!(col("n1") <=> col("n2")) || !(col("h1") <=> col("h2")) ||
      !(col("d1") <=> col("d2")))
    assert(bad.count() == 0L, s"kernel diverges from spec:\n${bad.take(5).mkString("\n")}")
  }

  test("graft_url_parts and graft_hashed_embedding register in SQL and match the Column path") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_url_parts('HTTPS://WWW.Ex.COM:443/a/?b=2&utm_source=x#f') AS p")
      .select("p.norm", "p.host", "p.domain").head()
    assert(r.getString(0) == "https://ex.com/a?b=2")
    assert(r.getString(1) == "ex.com" && r.getString(2) == "ex.com")
    val viaSql = spark.sql("SELECT graft_hashed_embedding('a b c', 64) AS v")
      .head().getSeq[Float](0)
    val viaCol = Seq("a b c").toDF("t")
      .select(graft.functions.TextFunctions.hashedEmbedding(col("t"), 64)).head().getSeq[Float](0)
    assert(viaSql == viaCol, "SQL and Column paths must produce identical vectors")
    // dim must be a foldable literal
    intercept[Exception](spark.sql(
      "SELECT graft_hashed_embedding(t, CAST(id AS INT)) FROM (SELECT 'x' t, 64 id)").collect())
  }

  test("graft_theta_* register in SQL: aggregate + set algebra match the Column path") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    ((0 until 800).map(i => (s"v$i", true)) ++ (400 until 1200).map(i => (s"v$i", false)))
      .toDF("v", "ina").createOrReplaceTempView("theta_sql_probe")
    val r = spark.sql(
      """SELECT graft_theta_estimate(a) AS ea,
        |  graft_theta_intersection_estimate(a, b) AS inter,
        |  graft_theta_union_estimate(a, b) AS uni,
        |  graft_theta_difference_estimate(a, b) AS dif
        |FROM (SELECT graft_theta_sketch(CASE WHEN ina THEN v END) AS a,
        |             graft_theta_sketch(CASE WHEN NOT ina THEN v END, 14) AS b
        |      FROM theta_sql_probe)""".stripMargin).head()
    assert((0 to 3).map(r.getDouble) == Seq(800.0, 400.0, 1200.0, 400.0))
    // lgK must be a foldable literal
    intercept[Exception](spark.sql(
      "SELECT graft_theta_sketch(v, CAST(length(v) AS INT)) FROM theta_sql_probe").collect())
  }

  test("stored contamination bloom: zero false negatives, disk round-trip, empty classes") {
    import spark.implicits._
    val probe = Seq((1L, "the quick brown fox jumps over the lazy dog sentence one"),
      (2L, "eval question two with its own very specific token sequence here"))
      .toDF("p_id", "p_text")
    val bytes = Dedup.buildContaminationBloom(probe, "p_text", ngramWords = 8)
    assert(bytes.nonEmpty)
    // Disk round-trip: the firewall is stored bytes, a later session reads them back.
    val f = java.nio.file.Files.createTempFile("contam", ".bloom")
    java.nio.file.Files.write(f, bytes)
    val loaded = java.nio.file.Files.readAllBytes(f)
    val corpus = Seq(
      (10L, Some("the quick brown fox jumps over the lazy dog sentence one and more")),
      (11L, Some("completely unrelated training document with none of those grams inside")),
      (12L, Some("short")),            // tokenful but < n: ONE whole-doc shingle
      (13L, None: Option[String]),     // NULL text: zero grams, NULL frac
      (14L, Some("   "))).toDF("doc_id", "text") // whitespace-only: zero grams too
    val out = Dedup.contaminationFlagsBloom(corpus, loaded, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    // Doc 10 embeds a probe doc: every one of its first grams must hit (NO false
    // negatives); with fpp 1% the unrelated doc must not be fully flagged.
    assert(out(10L)._1 > 0 && out(10L)._2 >= out(10L)._1 - 5, s"${out(10L)}")
    assert(out(10L)._3.exists(_.asInstanceOf[Double] > 0.5))
    assert(out(11L)._3.exists(_.asInstanceOf[Double] < 0.5))
    assert(out(12L)._1 == 1L && out(12L)._2 == 0L) // whole-doc shingle, not flagged
    assert(out(13L) == ((0L, 0L, None)) && out(14L) == ((0L, 0L, None)))
    // Empty probe -> empty bytes -> nothing flagged, NULL-id rows excluded.
    val empty = Dedup.buildContaminationBloom(probe.filter(lit(false)), "p_text")
    assert(empty.isEmpty)
    val none = Dedup.contaminationFlagsBloom(corpus, empty, "doc_id", "text")
    assert(none.agg(sum("grams_flagged")).head().getLong(0) == 0L)
    intercept[IllegalArgumentException](
      Dedup.buildContaminationBloom(probe, "p_text", ngramWords = 0))
    // The PRE-HASHED variants a pipeline uses after materializing its gram
    // frame once: identical bytes, identical flags, no second tokenization pass.
    val corpusGrams = Dedup.docGramHashes(corpus, "doc_id", "text", 8)
    // shape: tokenless docs keep ONE NULL-hash placeholder row so per-doc
    // rollups still see them (NULL-id exclusion is pinned by the streaming gate
    // test, which routes through this same kernel)
    val gramRows = corpusGrams.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(gramRows.filter(_._2.isEmpty).map(_._1).sorted.toSeq == Seq(13L, 14L))
    assert(gramRows.count(_._1 == 12L) == 1 && gramRows.forall(_._1 >= 10L))
    val probeGrams = Dedup.docGramHashes(probe, "p_id", "p_text", 8)
    val bytesFromHashes = Dedup.buildContaminationBloomFromHashes(probeGrams)
    assert(java.util.Arrays.equals(bytesFromHashes, bytes),
      "bloom built from pre-computed hashes must be bit-identical to the text path")
    val viaGrams = Dedup.contaminationFlagsFromGrams(corpusGrams, loaded, "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(viaGrams == out, s"flags-from-grams must match the text path: $viaGrams")
    // all-NULL hash frame (every doc tokenless) -> empty bytes
    assert(Dedup.buildContaminationBloomFromHashes(
      Dedup.docGramHashes(Seq((1L, "  ")).toDF("doc_id", "text"), "doc_id", "text")
    ).isEmpty)

    // GOLDEN pin of the gram-hash formula (xxhash64 seed-42 of the space-joined
    // 8-gram): blooms persisted by past versions stay readable only while this
    // value never changes — a drift here must fail THIS test, not silently break
    // stored firewalls.
    val golden = Seq("a b c d e f g h").toDF("t")
      .select(xxhash64(concat_ws(" ", TextFunctions.tokens(col("t"))))).head().getLong(0)
    assert(golden == 48378799402119996L,
      s"gram-hash formula drifted: got $golden — stored contamination blooms would break")
  }

  test("Bloom contamination with empty probe returns empty, not a crash") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val out = Dedup.crossCorpusContaminationBloom(
      docs, docs.filter(lit(false)), "text", "doc_id", "text", 6)
    assert(out.count() == 0L)
  }
}
