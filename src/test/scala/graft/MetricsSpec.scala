package graft

import org.apache.spark.sql.functions._

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

  test("keySkew on a composite unique key has share 1/n") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, i * 2)).toDF("a", "b")
    val r = Metrics.keySkew(df, Seq("a", "b")).head()
    assert(r.getAs[Long]("max_key_rows") == 1L)
    assert(r.getAs[Long]("distinct_keys") == 10L)
    assert(math.abs(r.getAs[Double]("top_key_share") - 0.1) < 1e-12)
  }
}
