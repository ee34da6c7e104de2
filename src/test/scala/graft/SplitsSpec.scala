package graft

import graft.functions.TextFunctions
import graft.operators.Splits
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {

  test("portableUniform: in [0,1), deterministic, handles negative keys and seeds") {
    import spark.implicits._
    val df = Seq(-5L, -1L, 0L, 1L, 42L, 2147483647L, 9999999999L).toDF("k")
    val us = df.select(Splits.portableUniform(col("k"), seed = -7).as("u"))
      .as[Double].collect()
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    val again = df.select(Splits.portableUniform(col("k"), seed = -7).as("u"))
      .as[Double].collect()
    assert(us.sameElements(again))
    // different seeds decorrelate
    val other = df.select(Splits.portableUniform(col("k"), seed = 8).as("u"))
      .as[Double].collect()
    assert(!us.sameElements(other))
  }

  test("hashSplit: full coverage, disjoint, approximately proportional, null key -> null split") {
    import spark.implicits._
    val keys = (0L until 10000L).map(Option(_)) :+ (None: Option[Long])
    val df = keys.toDF("doc_id")
    val s = Splits.hashSplit(df, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = 42)
    val counts = s.groupBy("split").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10001L, "every row must be assigned (or null-split)")
    assert(counts(None) == 1L, "null key must get null split")
    val train = counts(Some("train")).toDouble / 10000
    val valid = counts(Some("valid")).toDouble / 10000
    val test = counts(Some("test")).toDouble / 10000
    assert(train > 0.77 && train < 0.83, s"train fraction off: $train")
    assert(valid > 0.07 && valid < 0.13, s"valid fraction off: $valid")
    assert(test > 0.07 && test < 0.13, s"test fraction off: $test")
    // membership is a pure function of (key, seed): re-run identical
    val s2 = Splits.hashSplit(df, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = 42)
    assert(s.exceptAll(s2).count() == 0L && s2.exceptAll(s).count() == 0L)
  }

  test("leakageSafeSplit: groups never straddle splits; orphans split independently") {
    import spark.implicits._
    // 3000 rows in 300 groups of 10, plus 500 orphans (null group)
    val grouped = (1 to 3000).map(i => (i.toLong, Some((i % 300).toLong)))
    val orphans = (10001 to 10500).map(i => (i.toLong, Option.empty[Long]))
    val df = (grouped ++ orphans).toDF("id", "grp")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val out = Splits.leakageSafeSplit(df, "id", "grp", splits, seed = 5).cache()
    try {
      // THE invariant: zero groups with rows in more than one split
      val leaks = out.filter($"grp".isNotNull).groupBy("grp")
        .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
      assert(leaks == 0L, "a duplicate group straddles splits")
      // full coverage, and group-level fractions roughly honored
      assert(out.filter($"split".isNull).count() == 0)
      val trainGroups = out.filter($"grp".isNotNull && $"split" === "train")
        .select("grp").distinct().count()
      assert(trainGroups > 200 && trainGroups < 280, s"got $trainGroups/300 train groups")
      // orphans assign like plain hashSplit on their own key (same seed)
      val orphanAssign = out.filter($"grp".isNull).select("id", "split")
      val plain = Splits.hashSplit(orphans.toDF("id", "grp"), "id", splits, seed = 5)
        .select("id", "split")
      assert(orphanAssign.exceptAll(plain).count() == 0 &&
        plain.exceptAll(orphanAssign).count() == 0)
      // determinism across recomputation
      val again = Splits.leakageSafeSplit(df, "id", "grp", splits, seed = 5)
      assert(out.select("id", "split").exceptAll(again.select("id", "split")).count() == 0)
    } finally out.unpersist(blocking = false)
    // orphan rows do NOT share one window partition (skew guard): the partition
    // key includes the row key when the group is null, so a mostly-orphan corpus
    // cannot funnel through a single task. Verified via the invariant that a
    // NULL-group row's representative is its own key (assignment equality above).
    intercept[IllegalArgumentException] {
      Splits.leakageSafeSplit(df.withColumn("_rep", lit(1)), "id", "grp", splits, 5)
    }
  }

  test("hashSplit validates fractions and names") {
    import spark.implicits._
    val df = Seq(1L).toDF("doc_id")
    intercept[IllegalArgumentException](
      Splits.hashSplit(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.4), 1))
    intercept[IllegalArgumentException](
      Splits.hashSplit(df, "doc_id", Seq("a" -> 0.5, "a" -> 0.5), 1))
    intercept[IllegalArgumentException](
      Splits.hashSplit(df, "doc_id", Seq("a" -> 1.5, "b" -> -0.5), 1))
    intercept[IllegalArgumentException](
      Splits.hashSplit(df, "doc_id", Nil, 1))
  }

  test("deterministicShuffle: a stable permutation; seed changes the order") {
    import spark.implicits._
    val ids = (0L until 500L).toVector
    val df = ids.toDF("doc_id")
    val o1 = Splits.deterministicShuffle(df, "doc_id", 7).as[Long].collect()
    val o2 = Splits.deterministicShuffle(df, "doc_id", 7).as[Long].collect()
    assert(o1.sameElements(o2), "same seed must reproduce the order")
    assert(o1.sorted.toVector == ids, "must be a permutation")
    assert(o1.toVector != ids, "order must differ from insertion order")
    val o3 = Splits.deterministicShuffle(df, "doc_id", 8).as[Long].collect()
    assert(!o1.sameElements(o3), "different seed must change the order")
    // A rotation of the same circular permutation would pass the inequality above
    // while preserving every adjacency (the additive-seed bug this guards against:
    // seed must pick MULTIPLIERS, or two seeds differ by a constant mod p). Demand
    // genuine decorrelation: almost no adjacent pair survives a seed change.
    def adjacencies(o: Array[Long]): Set[(Long, Long)] =
      o.sliding(2).map(w => (w(0), w(1))).toSet
    val shared = adjacencies(o1).intersect(adjacencies(o3)).size
    assert(shared < 25, s"seeds 7 and 8 share $shared/499 adjacencies — rotation, not a re-shuffle")
  }

  test("hashSplit and linearScore are shuffle-free codegen'd projections over a scan") {
    // The 100 TB contract of both operators: row-local, no Exchange anywhere in the
    // plan. Local Seqs collapse to LocalTableScan, so check over a real parquet scan.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val splitPlan = Splits.hashSplit(docs, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), seed = 1)
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"), s"hashSplit must not shuffle:\n$splitPlan")
    assert(splitPlan.contains("*("), s"expected WholeStageCodegen in:\n$splitPlan")
    val scorePlan = docs.select(
      TextFunctions.linearScore(col("text"), Map("fast" -> 1.0), 0.0))
      .queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"), s"linearScore must not shuffle:\n$scorePlan")
    assert(scorePlan.contains("*("), s"expected WholeStageCodegen in:\n$scorePlan")
  }

  test("cumulativeBounds exposes the exact accumulated doubles") {
    val b = Splits.cumulativeBounds(Seq("a" -> 0.8, "b" -> 0.1, "c" -> 0.1))
    assert(b.length == 3 && b(0) == 0.8 && b(1) == 0.8 + 0.1)
  }

  test("linearScore: sigmoid of bias plus matched token weights; null text -> null") {
    import spark.implicits._
    val w = Map("fast" -> 0.8, "slow" -> -0.8)
    val df = Seq(
      Some("fast fast slow"), // z = b + 0.8 + 0.8 - 0.8
      Some("nothing matches here"), // z = b (the prior)
      Some(""), // tokenizes to nothing -> prior
      None: Option[String])
      .toDF("text")
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val out = df.select(TextFunctions.linearScore(col("text"), w, bias = -0.2).as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(out(0).get - sig(-0.2 + 0.8)) < 1e-12)
    assert(math.abs(out(1).get - sig(-0.2)) < 1e-12)
    assert(math.abs(out(2).get - sig(-0.2)) < 1e-12)
    assert(out(3).isEmpty, "null text must score null")
    intercept[IllegalArgumentException](TextFunctions.linearScore(col("text"), Map.empty, 0.0))
  }
}
