package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch {
        // NonFatal only: an OOM/fatal error must kill the harness, not leave it
        // running in a corrupted JVM whose remaining writes the driver would compare
        // as real engine output.
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed += name
          // A failure BEFORE the overwrite started leaves the PREVIOUS run's parquet
          // in place — the driver would compare stale data and mask the failure.
          graft.core.FsUtil.deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // Machine-readable failure manifest: a deleted output dir is invisible to a
    // directory-listing consumer (check_oracle.py once reported "0 fail" while 12
    // queries were erroring), so the failures are recorded affirmatively too.
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      failed.sorted.map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    // JSON string escape (shared graft.core.JsonStr): a tab or CR in builder-authored
    // SQL would otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    def q(s: String): String = graft.core.JsonStr.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
