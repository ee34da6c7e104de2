package graft

import org.apache.spark.sql.functions._
// (robustOutliers tests appended at the bottom of this suite)

class MetricsSpec extends SparkSpec {

  test("keySkew reports top-key share, ignores null keys") {
    import spark.implicits._
    // key "hot" 6 rows, "a" 2, "b" 1, plus 3 null-key rows (excluded)
    val df = (Seq.fill(6)("hot") ++ Seq("a", "a", "b") ++ Seq.fill(3)(null))
      .toDF("k").withColumn("v", lit(1))
    val r = Metrics.keySkew(df, Seq("k")).head()
    assert(r.getAs[Long]("max_key_rows") == 6L)
    assert(r.getAs[Long]("total_rows") == 9L)
    assert(r.getAs[Long]("distinct_keys") == 3L)
    assert(math.abs(r.getAs[Double]("top_key_share") - 6.0 / 9.0) < 1e-12)
  }

  test("ivfTopK exhaustive equals brute force; reduced nprobe keeps the top hit") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 60).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    val probe = vecs(3)._2
    val centroids = Similarity.seedCentroids(df, "id", "v", 6)
    val exact = Similarity.bruteForceTopK(df, "id", "v", probe, 5)
      .collect().map(_.getLong(0)).toSeq
    val exhaustive = Similarity.ivfTopK(df, "id", "v", centroids, probe, 5, nprobe = 6)
      .collect().map(_.getLong(0)).toSeq
    assert(exhaustive == exact)
    // the probe row itself (cosine 1.0) must survive any nprobe >= 1: its cell is by
    // definition the centroid most similar to the probe among those containing it —
    // with nprobe=3 of 6 cells here it is always probed
    val reduced = Similarity.ivfTopK(df, "id", "v", centroids, probe, 5, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(reduced.contains(3L))
  }

  test("IVF-partitioned corpus prunes non-probed cells at the directory level") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 120).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    val centroids = Similarity.seedCentroids(df, "id", "v", 6)
    val path = tmpDir("graft_ivf")
    Similarity.writeIvfPartitioned(df, "v", centroids, path)

    val probe = vecs(5)._2
    val pruned = Similarity.ivfTopKFromPartitioned(spark, path, "id", "v",
      centroids, probe, 5, nprobe = 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(ivf_cell") ||
      scan.contains("PartitionFilters: [ivf_cell"),
      s"expected the cell filter as a PARTITION filter:\n$scan")
    // pruned read agrees with the in-memory ivfTopK on the same cells
    val inMem = Similarity.ivfTopK(df, "id", "v", centroids, probe, 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9))).toSeq
    val fromDisk = pruned.collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9))).toSeq
    assert(fromDisk == inMem)
    // exhaustive probing over the partitioned layout equals brute force
    val exact = Similarity.bruteForceTopK(df, "id", "v", probe, 5)
      .collect().map(_.getLong(0)).toSeq
    val allCells = Similarity.ivfTopKFromPartitioned(spark, path, "id", "v",
      centroids, probe, 5, nprobe = 6).collect().map(_.getLong(0)).toSeq
    assert(allCells == exact)
  }

  test("refineCentroids moves seeds toward cluster means") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two tight clusters around orthogonal unit vectors e0 and e1
    def jitter(base: Int) =
      Seq.tabulate(8)(d => (if (d == base) 1.0f else 0.0f) + rnd.nextGaussian().toFloat * 0.05f)
    val vecs = (0 until 40).map(i => (i.toLong, jitter(i % 2)))
    val df = vecs.toDF("id", "v")
    val seeds = Similarity.seedCentroids(df, "id", "v", 2)
    val refined = Similarity.refineCentroids(df, "v", seeds, iters = 3)
    assert(refined.size == 2 && refined.forall(_.size == 8))
    // after refinement each centroid should be dominated by one of the two axes
    val axes = refined.map(_.zipWithIndex.maxBy { case (v, _) => v }._2).toSet
    assert(axes == Set(0, 1))
    // mean best-cosine over the corpus should not degrade vs the seeds
    def quality(cs: Seq[Seq[Float]]): Double = {
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.lazyZip(b).map((x, y) => x.toDouble * y.toDouble).sum
        dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      vecs.map { case (_, v) => cs.map(c => cos(v, c)).max }.sum / vecs.size
    }
    assert(quality(refined) >= quality(seeds) - 1e-9)
  }

  test("bucketed tables join without shuffling either side") {
    import graft.sources.Sources
    import spark.implicits._
    // need an exchange-free sort-merge join: disable auto-broadcast for this test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i % 100, i.toDouble)).toDF("k", "x")
      val dims = (0 until 100).map(i => (i, s"name_$i")).toDF("k", "name")
      Sources.writeBucketed(facts, "bkt_facts", Seq("k"), 4)
      Sources.writeBucketed(dims, "bkt_dims", Seq("k"), 4)
      val joined = Sources.table(spark, "bkt_facts")
        .join(Sources.table(spark, "bkt_dims"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$physical")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("salted join returns exactly the plain-join result") {
    import graft.operators.Joins
    import spark.implicits._
    // hot key 7 carries half the fact rows
    val facts = (1 to 400).map(i => (if (i % 2 == 0) 7L else (i % 50).toLong, i)).toDF("fk", "x")
    val dim = (0 until 50).map(i => (i.toLong, s"d_$i")).toDF("dk", "name")
    val plain = facts.join(dim, facts("fk") === dim("dk")).select("fk", "x", "name")
    val salted = Joins.saltedJoin(facts, dim, Seq(("fk", "dk")), saltFactor = 4)
      .select("fk", "x", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("partitioned layout prunes partitions at the scan") {
    import graft.sources.Sources
    import spark.implicits._
    val df = (1 to 300).map(i => (i, s"2024-0${i % 3 + 1}", i.toDouble)).toDF("id", "month", "v")
    val path = tmpDir("graft_part")
    Sources.writePartitioned(df, path, Seq("month"))
    val pruned = spark.read.parquet(path).filter(col("month") === "2024-02")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(month"),
      s"expected partition filters in scan:\n$scan")
    assert(pruned.count() == 100L)
  }

  test("mutual information plan scans the input exactly once") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("c1", "c2")
    val plan = Metrics.mutualInformation(df, "c1", "c2")
      .queryExecution.executedPlan.toString
    // marginals must be windows over the joint counts, not re-aggregations of the input
    val scans = "LocalTableScan|Scan ".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single input scan, got $scans:\n$plan")
  }

  test("dedupNearEmbedding drops the higher id of a planted near-identical pair") {
    import graft.operators.Dedup
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 1e-4f else v }
    val others = (2 until 20).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = ((0L, base) +: (1L, nearDup) +: others).toDF("id", "v")
    val kept = Dedup.dedupNearEmbedding(df, "id", "v", dim = 16, threshold = 0.999)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "higher id of the planted pair must be dropped")
    assert(kept.contains(0L) && kept.size == 19)
  }

  test("keySkew on a composite unique key has share 1/n") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, i * 2)).toDF("a", "b")
    val r = Metrics.keySkew(df, Seq("a", "b")).head()
    assert(r.getAs[Long]("max_key_rows") == 1L)
    assert(r.getAs[Long]("distinct_keys") == 10L)
    assert(math.abs(r.getAs[Double]("top_key_share") - 0.1) < 1e-12)
  }

  test("robustOutliers: median/MAD exactness, outlier count, degenerate and empty classes") {
    import spark.implicits._
    // values 1..9 plus one far outlier: median 5.5? n=10 values: 1..9 + 1000
    // sorted: 1..9,1000 -> median = (5+6)/2 = 5.5; deviations |x-5.5|:
    // .5,1.5,2.5,3.5,4.5,0.5,1.5,2.5,3.5,994.5 sorted -> mad = (2.5+2.5)/2 = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(Option(_)).toDF("v")
    val r = Metrics.robustOutliers(df, "v", k = 3.5).head()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 5.5 && r.getDouble(2) == 2.5)
    // |x-5.5| > 8.75: only 1000 qualifies
    assert(r.getLong(3) == 1L, s"$r")
    // NaN/Inf/null excluded
    val hostile = Seq(Some(1.0), Some(2.0), Some(3.0), Some(Double.NaN),
      Some(Double.PositiveInfinity), None).toDF("v")
    val h = Metrics.robustOutliers(hostile, "v").head()
    assert(h.getLong(0) == 3L && h.getDouble(1) == 2.0)
    // constant data: mad 0 surfaces; nothing differs from the median
    val const = Seq.fill(5)(7.0).map(Option(_)).toDF("v")
    val c = Metrics.robustOutliers(const, "v").head()
    assert(c.getDouble(2) == 0.0 && c.getLong(3) == 0L)
    // empty: one (0, NULL, NULL, 0) row, the SQL-aggregate shape
    val e = Metrics.robustOutliers(df.filter(org.apache.spark.sql.functions.lit(false)), "v").head()
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2) && e.getLong(3) == 0L)
  }

  test("robustOutliersByGroup: per-group median/MAD, null group kept, matches global on one group") {
    import spark.implicits._
    // group A: 1..9 with a planted 1000 (med 5, MAD 2, |1000-5| > 7 -> 1 outlier);
    // group B: constant 7s (MAD 0, the 8 is an outlier at any k);
    // NULL group: two values, a real stratum
    val df = ((1 to 9).map(d => (Some("A"), d.toDouble)) :+ ((Some("A"), 1000.0)) :+
      ((Some("B"), 7.0)) :+ ((Some("B"), 7.0)) :+ ((Some("B"), 8.0)) :+
      ((Option.empty[String], 1.0)) :+ ((Option.empty[String], 2.0)))
      .toDF("g", "v")
    val out = Metrics.robustOutliersByGroup(df, "g", "v", k = 3.5)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val a = out(Some("A"))
    assert(a._1 == 10L && a._2 == 5.5 && a._4 == 1L, s"$a")
    val b = out(Some("B"))
    assert(b._2 == 7.0 && b._3 == 0.0 && b._4 == 1L, "MAD 0: any deviation is an outlier")
    assert(out.contains(None) && out(None)._1 == 2L, "NULL group is a real stratum")
    // a group column named like an output column would emit a duplicate name
    intercept[IllegalArgumentException] {
      Metrics.robustOutliersByGroup(df.withColumnRenamed("g", "median"), "median", "v")
    }
    // single group == the global screen (same exclusions, same definition)
    val one = df.filter($"g" === "A")
    val grouped = Metrics.robustOutliersByGroup(one, "g", "v", 3.5).head()
    val global = Metrics.robustOutliers(one, "v", 3.5).head()
    assert(grouped.getDouble(2) == global.getDouble(1) &&
      grouped.getDouble(3) == global.getDouble(2) &&
      grouped.getLong(4) == global.getLong(3))
  }

  test("equiDepthHistogram: quartile edges and counts, tie/empty/hostile classes") {
    import spark.implicits._
    // 1..100 in 4 buckets: interior edges 25.75 / 50.5 / 75.25 ((n-1)p), 25 rows each
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Metrics.equiDepthHistogram(df, "v", 4).orderBy("bucket").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(3)).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(out(0).getDouble(1) == 1.0 && out(3).getDouble(2) == 100.0)
    assert(math.abs(out(0).getDouble(2) - 25.75) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - 50.5) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - 75.25) < 1e-12)
    // heavy ties: all mass in bucket 0, empty interior buckets REPORTED at cnt 0
    val ties = Seq.fill(50)(7.0).toDF("v")
    val t2 = Metrics.equiDepthHistogram(ties, "v", 4).orderBy("bucket").collect()
    assert(t2.map(_.getLong(3)).toSeq == Seq(50L, 0L, 0L, 0L))
    // NaN/Inf/null excluded; empty input -> empty frame with the right schema
    val hostile = df.unionByName(Seq(Double.NaN, Double.PositiveInfinity).toDF("v"))
    assert(Metrics.equiDepthHistogram(hostile, "v", 4)
      .agg(sum("cnt")).head().getLong(0) == 100L)
    val empty = Metrics.equiDepthHistogram(df.filter(lit(false)), "v", 4)
    assert(empty.count() == 0L &&
      empty.columns.toSeq == Seq("bucket", "lo", "hi", "cnt"))
  }

  test("cohensKappa: closed form, perfect/constant/disjoint raters, NULL category, empty") {
    import spark.implicits._
    // 2x2 hand-computed: po=35/50=0.7, pe=(25*30+25*20)/2500=0.5, kappa=0.4
    val pairs = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val out = Metrics.cohensKappa(pairs.toDF("r1", "r2"), "r1", "r2").head()
    assert(out.getLong(0) == 50L && out.getDouble(1) == 0.7 &&
      out.getDouble(2) == 0.5 && math.abs(out.getDouble(3) - 0.4) < 1e-12)
    // perfect agreement over 2+ categories -> kappa exactly 1
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    assert(Metrics.cohensKappa(perfect, "r1", "r2").head().getDouble(3) == 1.0)
    // both raters constant and identical: pe=1 -> kappa NULL (not a 0/0 NaN)
    val const = Seq.fill(10)(("a", "a")).toDF("r1", "r2")
    val k0 = Metrics.cohensKappa(const, "r1", "r2").head()
    assert(k0.getDouble(1) == 1.0 && k0.getDouble(2) == 1.0 && k0.isNullAt(3))
    // constant but DIFFERENT raters: pe=0, po=0 -> kappa 0
    val disj = Seq.fill(10)(("a", "b")).toDF("r1", "r2")
    assert(Metrics.cohensKappa(disj, "r1", "r2").head().getDouble(3) == 0.0)
    // NULL is a real category: (NULL, NULL) agrees, (NULL, x) does not
    val withNull = Seq((Some("a"), Some("a")), (None, None), (None, Some("a")),
      (Some("b"), Some("b"))).toDF("r1", "r2")
    val kn = Metrics.cohensKappa(withNull, "r1", "r2").head()
    assert(kn.getDouble(1) == 0.75)
    // empty input: n=0, NULL statistics
    val empty = Metrics.cohensKappa(pairs.toDF("r1", "r2").filter(lit(false)), "r1", "r2").head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(3))
  }

  test("ecdfNormalize: cume_dist parity with ties, hostile values NULL but kept, empty, guards") {
    import spark.implicits._
    val df = Seq(3.0, 1.0, 2.0, 2.0, 5.0).toDF("v")
    val got = Metrics.ecdfNormalize(df, "v", "p").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(got == Map(1.0 -> 0.2, 2.0 -> 0.6, 3.0 -> 0.8, 5.0 -> 1.0))
    // randomized parity against the single-window cume_dist formulation
    val rng = new scala.util.Random(7)
    val rand = (1 to 400).map(i => (i.toLong, (rng.nextInt(40) - 20).toDouble / 4)).toDF("id", "v")
    val naive = rand.withColumn("p0",
      org.apache.spark.sql.functions.cume_dist().over(
        org.apache.spark.sql.expressions.Window.orderBy("v")))
    val both = Metrics.ecdfNormalize(rand, "v", "p").join(naive, Seq("id", "v"))
    assert(both.filter(abs(col("p") - col("p0")) > lit(1e-12)).count() == 0L)
    // NULL/NaN/Inf rows are KEPT with NULL rank; finite rows rank over finite N only
    val hostile = Seq(Some(1.0), Some(2.0), None, Some(Double.NaN),
      Some(Double.PositiveInfinity)).toDF("v")
    val h = Metrics.ecdfNormalize(hostile, "v", "p").collect()
    assert(h.length == 5)
    val byV = h.filter(!_.isNullAt(0)).filter(r => !r.getDouble(0).isNaN &&
      !r.getDouble(0).isInfinite).map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(byV == Map(1.0 -> 0.5, 2.0 -> 1.0))
    assert(h.count(_.isNullAt(1)) == 3)
    // empty input keeps schema with an all-NULL out column
    val e = Metrics.ecdfNormalize(df.filter(lit(false)), "v", "p")
    assert(e.columns.toSeq == Seq("v", "p") && e.count() == 0L)
    // guards: existing out column, reserved internals
    intercept[IllegalArgumentException](Metrics.ecdfNormalize(df, "v", "v"))
    intercept[IllegalArgumentException](
      Metrics.ecdfNormalize(df.withColumn("_ecdf_v", lit(1)), "v", "p"))
  }

  test("ecdfNormalizeByGroup: per-group window parity, single-group == global, NULL group") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 3 == 0) Some("a") else if (i % 3 == 1) Some("b") else None,
        (rng.nextInt(20) - 10).toDouble / 2)
    }.toDF("id", "g", "v")
    val naive = df.withColumn("p0", org.apache.spark.sql.functions.cume_dist().over(
      org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")))
    // join on id only (unique): an equi-join keyed on g would drop the NULL-group rows
    val both = Metrics.ecdfNormalizeByGroup(df, "g", "v", "p").select("id", "p")
      .join(naive.select("id", "p0"), Seq("id"))
    assert(both.count() == 300)
    assert(both.filter(abs(col("p") - col("p0")) > lit(1e-12)).count() == 0L,
      "grouped ECDF diverges from the window formulation (incl. the NULL group)")
    // one constant group == the global form
    val one = df.withColumn("g", lit("only"))
    val g1 = Metrics.ecdfNormalizeByGroup(one, "g", "v", "p")
      .select("id", "p").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val glob = Metrics.ecdfNormalize(df, "v", "p")
      .select("id", "p").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g1 == glob)
    // hostile values NULL but kept; guards
    val hostile = Seq(("x", Some(1.0)), ("x", None), ("x", Some(Double.NaN))).toDF("g", "v")
    val h = Metrics.ecdfNormalizeByGroup(hostile, "g", "v", "p").collect()
    assert(h.length == 3 && h.count(_.isNullAt(2)) == 2)
    intercept[IllegalArgumentException](Metrics.ecdfNormalizeByGroup(df, "g", "v", "v"))
  }

  test("approxDistinctRollup/mergeSketches: small-n exactness, 2% at 10k, NULL groups, merge==rescan") {
    import spark.implicits._
    // Small cardinalities: the HLL sits in exact (coupon) mode — estimates are exact.
    val small = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(2L)), ("a", None),
      (null.asInstanceOf[String], Some(3L)), ("b", None)).toDF("g", "u")
    val per = Metrics.approxDistinctRollup(small, "g", "u")
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(2), r.isNullAt(1))).toMap
    assert(per(Some("a"))._1 == 2L)
    assert(per(None)._1 == 1L)                      // NULL group is a real stratum
    assert(per(Some("b")) == ((0L, false)))         // all-NULL group: EMPTY sketch, est 0
    // Merge of per-group sketches == the distinct count of the union (exact here).
    val merged = Metrics.mergeSketches(
      Metrics.approxDistinctRollup(small, "g", "u").select("hll_sketch"))
      .head().getLong(0)
    assert(merged == 3L)
    // 10k distinct values split across 4 groups: estimates within 2% per group and
    // after merge (lgK=14 keeps ~0.4% typical relative error).
    val big = (1 to 40000).map(i => (s"g${i % 4}", (i % 10000).toLong)).toDF("g", "u")
      .repartition(8)
    val bigPer = Metrics.approxDistinctRollup(big, "g", "u")
      .select("g", "approx_distinct").as[(String, Long)].collect().toMap
    assert(bigPer.size == 4)
    bigPer.values.foreach(est => assert(math.abs(est - 2500L) <= 50L, s"group est $est vs 2500"))
    val bigMerged = Metrics.mergeSketches(
      Metrics.approxDistinctRollup(big, "g", "u").select("hll_sketch")).head().getLong(0)
    assert(math.abs(bigMerged - 10000L) <= 200L, s"merged est $bigMerged vs 10000")
    // Empty input: zero rollup rows; merge of nothing estimates 0.
    assert(Metrics.approxDistinctRollup(small.filter(lit(false)), "g", "u").count() == 0L)
    assert(Metrics.mergeSketches(
      Metrics.approxDistinctRollup(small.filter(lit(false)), "g", "u")).head().getLong(0) == 0L)
    intercept[IllegalArgumentException](Metrics.approxDistinctRollup(small, "g", "u", lgK = 3))
  }

  test("theta sketches: exact-mode set algebra, partition determinism, 3% at 50k, hostile classes") {
    import graft.functions.SketchFunctions._
    import spark.implicits._
    // Planted sets: A = 0..999, B = 500..1499 -> |A|=|B|=1000, |A∩B|=500, |A∪B|=1500,
    // |A\B|=500. Below k=2^14 the sketch is in exact mode: estimates ARE the counts.
    val df = ((0 until 1000).map(i => (s"v$i", true)) ++
      (500 until 1500).map(i => (s"v$i", false))).toDF("v", "ina").repartition(9)
    val sk = df.agg(
      thetaSketch(when(col("ina"), col("v"))).as("a"),
      thetaSketch(when(!col("ina"), col("v"))).as("b"))
    val r = sk.select(
      thetaEstimate(col("a")), thetaEstimate(col("b")),
      thetaIntersectionEstimate(col("a"), col("b")),
      thetaUnionEstimate(col("a"), col("b")),
      thetaDifferenceEstimate(col("a"), col("b"))).head()
    assert((0 to 4).map(r.getDouble) == Seq(1000.0, 1000.0, 500.0, 1500.0, 500.0))
    // Determinism: the compact-sketch bytes are a pure function of the value SET —
    // identical regardless of partitioning (1 partition vs 9).
    val one = df.coalesce(1).agg(thetaSketch(when(col("ina"), col("v"))).as("a")).head().getAs[Array[Byte]](0)
    val nine = sk.head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, nine))
    // NULLs contribute nothing; all-NULL input -> empty sketch estimating exactly 0.
    val withNulls = Seq(Some("x"), None, Some("x")).toDF("v")
    assert(withNulls.agg(thetaEstimate(thetaSketch(col("v")))).head().getDouble(0) == 1.0)
    assert(withNulls.filter(col("v").isNull)
      .agg(thetaEstimate(thetaSketch(col("v")))).head().getDouble(0) == 0.0)
    // Past exact mode: 50k distinct longs within 3% (lgK 14 ~ 0.78% RSE).
    val big = (1L to 50000L).toDF("v").repartition(8)
    val est = big.agg(thetaEstimate(thetaSketch(col("v")))).head().getDouble(0)
    assert(math.abs(est - 50000.0) <= 1500.0, s"estimate $est vs 50000")
    // Union of two exact-mode sketches stays EXACT past the default builder's 4096
    // nominal entries (the un-sized union would downsample a 12k-value union).
    val twoSides = ((1L to 6000L).map((_, true)) ++ (6001L to 12000L).map((_, false)))
      .toDF("v", "ina")
    val uni = twoSides.agg(
        thetaSketch(when(col("ina"), col("v"))).as("a"),
        thetaSketch(when(!col("ina"), col("v"))).as("b"))
      .select(thetaUnionEstimate(col("a"), col("b"))).head().getDouble(0)
    assert(uni == 12000.0, s"union of exact-mode sketches must stay exact, got $uni")
    // Documented divergence: the EMPTY string is ignored (DataSketches' own
    // cross-binding convention — update of an empty byte array is a no-op).
    val withEmpty = Seq("", "x", "y").toDF("v")
    assert(withEmpty.agg(thetaEstimate(thetaSketch(col("v")))).head().getDouble(0) == 2.0)
    // Per-group sketches compose with groupBy.
    val grouped = (1 to 300).map(i => (s"g${i % 3}", i % 50)).toDF("g", "v")
      .groupBy("g").agg(thetaEstimate(thetaSketch(col("v"))).as("d"))
      .as[(String, Double)].collect().toMap
    assert(grouped.values.toSet == Set(50.0))
    // Type gate: doubles are not hashable identity-stably -> analysis error.
    intercept[Exception](Seq(1.0).toDF("v").agg(thetaSketch(col("v"))).head())
  }

  test("sketch columns survive a parquet round-trip: store per-day, merge months later") {
    import graft.functions.SketchFunctions._
    import spark.implicits._
    val dir = tmpDir("sketch_store")
    // Three "days" of events, overlapping users; persist ONE sketch row per day.
    val days = Seq(
      ("d1", (1 to 400).map(_.toLong)),
      ("d2", (201 to 600).map(_.toLong)),
      ("d3", (401 to 900).map(_.toLong)))
    val daily = days.map { case (day, users) =>
      users.map((day, _)).toDF("day", "u")
        .groupBy("day")
        .agg(hll_sketch_agg(col("u"), lit(14)).as("hll_sketch"),
          thetaSketch(col("u")).as("theta_sketch"))
    }.reduce(_ unionByName _)
    daily.write.mode("overwrite").parquet(dir)
    // A later session reads the BINARIES back — no access to the original events.
    val stored = spark.read.parquet(dir)
    assert(stored.count() == 3L)
    // HLL: month = union of stored sketches == distinct over all days (exact at n=900).
    val merged = Metrics.mergeSketches(stored.select("hll_sketch")).head().getLong(0)
    assert(merged == 900L)
    // Theta: set algebra across STORED day sketches — d1∩d2, d1∪d3, d2\d3 all exact.
    val byDay = stored.select("day", "theta_sketch").as[(String, Array[Byte])]
      .collect().toMap
    val d1 = lit(byDay("d1")); val d2 = lit(byDay("d2")); val d3 = lit(byDay("d3"))
    val r = spark.range(1).select(
      thetaIntersectionEstimate(d1, d2), thetaUnionEstimate(d1, d3),
      thetaDifferenceEstimate(d2, d3)).head()
    assert(r.getDouble(0) == 200.0) // 201..400
    assert(r.getDouble(1) == 900.0) // 1..900
    assert(r.getDouble(2) == 200.0) // 201..400 (d2 minus 401..600)
  }

  test("winsorizeStats: interpolated bounds, tail counts, clipped mean, hostile/empty classes") {
    import spark.implicits._
    // 1..100: q05 = 5 + 0.95 = 5.95, q95 = 95 + 0.05 = 95.05 ((n-1)p interpolation);
    // 5 values clip on each tail; the symmetric clip leaves the mean at 50.5
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = Metrics.winsorizeStats(df, "v", 0.05, 0.95).head()
    assert(r.getLong(0) == 100L)
    assert(math.abs(r.getDouble(1) - 5.95) < 1e-12 && math.abs(r.getDouble(2) - 95.05) < 1e-12)
    assert(r.getLong(3) == 5L && r.getLong(4) == 5L)
    assert(math.abs(r.getDouble(5) - 50.5) < 1e-9)
    // NaN/Inf/null are excluded before the quantiles, not clamped into them
    val hostile = df.unionByName(
      Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity).toDF("v"))
      .unionByName(Seq(Option.empty[Double]).toDF("v"))
    val h = Metrics.winsorizeStats(hostile, "v", 0.05, 0.95).head()
    assert(h.getLong(0) == 100L && math.abs(h.getDouble(2) - 95.05) < 1e-12)
    // empty: SQL-aggregate shape
    val e2 = Metrics.winsorizeStats(df.filter(lit(false)), "v", 0.05, 0.95).head()
    assert(e2.getLong(0) == 0L && e2.isNullAt(1) && e2.isNullAt(2) &&
      e2.getLong(3) == 0L && e2.getLong(4) == 0L && e2.isNullAt(5))
    intercept[IllegalArgumentException](Metrics.winsorizeStats(df, "v", 0.9, 0.1))
  }
}
