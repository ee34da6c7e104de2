package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

/** Distributed exact-quantile operator: every path (collect-all, sketch+bracket,
  * mega-tie shortcut, oversized-bracket recursion) must agree with Spark's own exact
  * `percentile` (percentile_cont semantics) to the last interpolated bit.
  */
class QuantilesSpec extends SparkSpec {

  private val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.513, 0.75, 0.99, 1.0)

  private def sparkExact(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] = {
    val cols = qs.map(q => expr(s"percentile($c, $q)"))
    df.agg(cols.head, cols.drop(1): _*).head().toSeq.map(_.asInstanceOf[Double])
  }

  private def check(df: org.apache.spark.sql.DataFrame, c: String, threshold: Int): Unit = {
    val expected = sparkExact(df, c)
    val got = Quantiles.exactQuantiles(df, c, qs, collectThreshold = threshold).get
    got.zip(expected).zip(qs).foreach { case ((g, e), q) =>
      // exact-equality first: infinities make the relative-tolerance arithmetic NaN
      assert(g == e || math.abs(g - e) <= math.abs(e) * 1e-12 + 1e-12,
        s"q=$q (threshold=$threshold): got $g expected $e")
    }
  }

  test("collect-all path matches Spark percentile (high-cardinality doubles)") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val df = Seq.fill(5000)(r.nextDouble() * 1e6 - 5e5).toDF("v").repartition(8)
    check(df, "v", threshold = 1 << 20)
  }

  test("sketch+bracket path matches Spark percentile (threshold forces it)") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    val df = Seq.fill(20000)(r.nextDouble() * 1000).toDF("v").repartition(16)
    check(df, "v", threshold = 500)
  }

  test("heavy ties: mega-tie brackets answered without collecting") {
    import spark.implicits._
    // 90% of rows are one of 3 values — the brackets around most quantiles degenerate
    // to lo == hi and must be answered from the sketch+counts alone.
    val r = new scala.util.Random(29)
    val data = Seq.fill(20000) {
      val x = r.nextInt(10)
      if (x < 9) (x % 3) * 100.0 else r.nextDouble() * 300
    }
    val df = data.toDF("v").repartition(16)
    check(df, "v", threshold = 300)
  }

  test("ties spanning a non-degenerate bracket recurse instead of over-collecting") {
    import spark.implicits._
    // Many distinct values packed into a tiny range around the median: the bracket is
    // non-degenerate but over-populated at a tiny threshold, forcing recursion.
    val r = new scala.util.Random(31)
    val data = (1 to 20000).map { i =>
      if (i % 2 == 0) 500.0 + r.nextDouble() * 1e-3 else r.nextDouble() * 1000
    }
    val df = data.toDF("v").repartition(16)
    check(df, "v", threshold = 64)
  }

  test("integer column, tiny n, single row, and empty/all-null inputs") {
    import spark.implicits._
    check(Seq(3, 1, 2).toDF("v"), "v", threshold = 1 << 20)
    check(Seq(42).toDF("v"), "v", threshold = 16)
    assert(Quantiles.exactQuantile(Seq.empty[Int].toDF("v"), "v", 0.5).isEmpty)
    assert(Quantiles.exactQuantile(
      Seq[Option[Double]](None, None).toDF("v"), "v", 0.5).isEmpty)
  }

  test("nulls excluded; interpolation between adjacent ranks is exact") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(10.0), None, Some(20.0), Some(30.0), None)
      .toDF("v")
    // n=3 non-null: q=0.25 -> r=0.5 -> 10 + 0.5*(20-10) = 15
    assert(Quantiles.exactQuantile(df, "v", 0.25).get == 15.0)
    assert(Quantiles.exactQuantile(df, "v", 0.0).get == 10.0)
    assert(Quantiles.exactQuantile(df, "v", 1.0).get == 30.0)
  }

  test("non-finite values excluded; threshold boundary n = threshold+1 takes sketch path") {
    import spark.implicits._
    val r = new scala.util.Random(41)
    // Quantiles are over FINITE values: ±Inf/NaN are excluded (an infinite
    // interpolation endpoint is meaningless, NaN has no rank), so the result must
    // equal Spark percentile over the finite subset.
    val finite = Seq.fill(4998)(r.nextDouble() * 100)
    val data = Seq(Double.NegativeInfinity, Double.PositiveInfinity, Double.NaN) ++ finite
    val expected = sparkExact(finite.toDF("v"), "v")
    val got = Quantiles.exactQuantiles(
      data.toDF("v").repartition(8), "v", qs, collectThreshold = 256).get
    got.zip(expected).zip(qs).foreach { case ((g, e), q) =>
      assert(g == e || math.abs(g - e) <= math.abs(e) * 1e-12 + 1e-12,
        s"q=$q: got $g expected $e")
    }
    // an all-non-finite column has no quantiles
    assert(Quantiles.exactQuantiles(
      Seq(Double.PositiveInfinity, Double.NaN).toDF("v"), "v", qs).isEmpty)
    // n exactly one over the threshold: smallest possible sketch-path input
    val small = Seq.fill(257)(r.nextDouble()).toDF("v")
    check(small, "v", threshold = 256)
    check(small, "v", threshold = 257) // and exactly at it: collect-all path
  }

  test("constraint surface routes Exact through the distributed operator") {
    import spark.implicits._
    import graft.constraints._
    import graft.core._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val c = MultiQuantileConstraint("v",
      Seq(0.5 -> Assertion.Equals(500.5), 1.0 -> Assertion.Equals(1000.0)),
      QuantileMethod.Exact)
    assert(c.aggregates.isEmpty, "Exact must NOT claim batchability (own job)")
    val r = ValidationSuite.evaluateBatched(df, Seq(c))
    assert(r.head.status == ConstraintStatus.Success, r.head.message)
    val single = QuantileConstraint("v", 0.5, Assertion.Equals(500.5), QuantileMethod.Exact)
    assert(single.aggregates.isEmpty)
    assert(single.evaluate(df).status == ConstraintStatus.Success)
  }
}
