package graft

import graft.core._
import org.apache.spark.sql.functions._

/** Performance-regression layer mirroring the reference's
  * performance_regression_test.rs: wall-time ceilings on warm suite runs and the
  * reference's own scaling bound (10× data ⇒ < 15× time). Thresholds are deliberately
  * generous (CI boxes are noisy; the reference multiplies by an env factor for the same
  * reason) — these tests catch order-of-magnitude regressions (a constraint going
  * per-row on the driver, batching breaking into N scans), not percent-level drift.
  */
class PerfSpec extends SparkSpec {

  private def mkData(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"name_$i", i * 1.37, if (i % 11 == 0) null else "ok"))
      .toDF("id", "name", "amount", "status")
      .repartition(4).cache()
  }

  private def suite(df: org.apache.spark.sql.DataFrame): ValidationReport =
    ValidationSuite("perf", Seq(
      CheckBuilder("c", Level.Error)
        .hasSize(Assertion.GreaterThan(0))
        .isComplete("id")
        .hasCompleteness("status", Assertion.GreaterThan(0.8))
        .isUnique("id")
        .hasMin("amount", Assertion.GreaterThan(0))
        .hasMax("amount", Assertion.GreaterThan(0))
        .hasMean("amount", Assertion.GreaterThan(0))
        .hasStandardDeviation("amount", Assertion.GreaterThan(0))
        .hasPattern("name", "^name_\\d+$")
        .hasApproxCountDistinct("id", Assertion.GreaterThan(0))
        .build())).run(df)

  private def warmSecs(df: org.apache.spark.sql.DataFrame, runs: Int = 5): Double = {
    df.count() // materialize cache
    suite(df)  // warm codegen
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); suite(df); (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  test("10-constraint suite stays interactive on a warm cached table") {
    val df = mkData(50000)
    val sec = warmSecs(df)
    df.unpersist()
    // reference ceiling is 0.4 s × env multiplier on native Arrow; Spark local overhead
    // plus CI noise budget ⇒ 5 s is the order-of-magnitude alarm line
    assert(sec < 5.0, f"warm 10-constraint suite took $sec%.2f s (> 5 s)")
  }

  test("bench suite20 warm best-of-N stays under its ceiling") {
    // Pins the BENCH suite20_warm surface in-tree: the per-round number wanders with
    // sandbox load, so a best-of-5 on the fixed sf0.001 fixture backstops it — a
    // structural regression (batching broken into N scans, a constraint going
    // driver-side) blows through this ceiling; ambient variance does not.
    val path = "/root/testdata/sf0.001/lineitem.parquet"
    assume(new java.io.File(path).exists(), "driver-generated testdata not present")
    val li = spark.read.parquet(path).cache()
    li.count()
    (1 to 3).foreach(_ => Bench.suite20(li)) // codegen + JIT warmup
    val best = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); Bench.suite20(li); (System.nanoTime() - t0) / 1e9
    }.min
    li.unpersist()
    assert(best < 1.5, f"best-of-5 warm suite20 took $best%.3f s (> 1.5 s)")
  }

  test("10x data stays under the reference's 15x time bound (warm)") {
    val small = mkData(20000)
    val big = mkData(200000)
    val tSmall = warmSecs(small)
    val tBig = warmSecs(big)
    small.unpersist(); big.unpersist()
    // batched single-scan execution should be nearly flat here (job overhead dominates
    // at these sizes); 15x is the reference's own regression bound
    assert(tBig < tSmall * 15.0 + 0.5,
      f"10x data: $tSmall%.3f s -> $tBig%.3f s exceeds the 15x bound")
  }
}
