package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch runner for tools/fuzz_asof.py: executes the engine half of every trial under
  * the given root in ONE JVM. Trial parameters are encoded in the directory name so no
  * JSON parsing is needed on the Scala side:
  *
  *   asof_<i>_k{0|1}_f{0|1}_t{none|<long>}   -> asofJoin(keyed?, forward?, tolerance?)
  *       inputs  left.parquet(lid, k, t, lv) right.parquet(k, t, pv)
  *       output  got.parquet(lid, pv, mt)
  *   range_<i>_w<binWidth with 'p' for '.'>  -> rangeJoin(points, intervals, binWidth)
  *       inputs  points.parquet(pid, x) intervals.parquet(iid, s, e)
  *       output  got.parquet(pid, iid)
  *
  * The Python driver then replays each trial in DuckDB (ASOF JOIN / inequality join)
  * and diffs row sets.
  */
object FuzzAsOf {
  def main(args: Array[String]): Unit = {
    val root = new java.io.File(args(0))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val trials = root.listFiles().filter(_.isDirectory)
      .filter(d => d.getName.startsWith("asof_") || d.getName.startsWith("range_"))
      .sortBy(_.getName)
    var n = 0
    trials.foreach { dir =>
      val parts = dir.getName.split("_")
      val out = s"${dir.getPath}/got.parquet"
      if (parts(0) == "asof") {
        val keyed = parts(2) == "k1"
        val forward = parts(3) == "f1"
        val tol = parts(4).stripPrefix("t") match {
          case "none" => None
          case v => Some(lit(v.toLong))
        }
        val left = spark.read.parquet(s"${dir.getPath}/left.parquet")
        val right = spark.read.parquet(s"${dir.getPath}/right.parquet")
        graft.operators.AsOf.asofJoin(
            left, right,
            keys = if (keyed) Seq("k") else Nil,
            leftTime = "t", rightTime = "t",
            payload = Seq("pv"),
            matchedTimeCol = Some("mt"),
            forward = forward, tolerance = tol)
          .select("lid", "pv", "mt")
          .write.mode("overwrite").parquet(out)
      } else {
        val wSpec = parts(2).stripPrefix("w")
        val points = spark.read.parquet(s"${dir.getPath}/points.parquet")
        val intervals = spark.read.parquet(s"${dir.getPath}/intervals.parquet")
        val joined =
          if (wSpec == "auto") // data-derived width: same exact join by contract
            graft.operators.Joins.rangeJoinAuto(points, intervals, "x", "s", "e")
          else graft.operators.Joins.rangeJoin(points, intervals, "x", "s", "e",
            binWidth = wSpec.replace('p', '.').toDouble)
        joined.select("pid", "iid").write.mode("overwrite").parquet(out)
      }
      n += 1
    }
    println(s"[fuzz] ran $n trials")
    spark.stop()
  }
}
