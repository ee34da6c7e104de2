import graft.functions.Brotli

/** One-shot differential harness: decode every pair in the dir given by
  * BRFUZZ_DIR and compare to the reference encoder's input. Not a committed
  * test (the corpus is generated ad hoc); BrotliSpec carries the committed
  * conformance fixtures.
  */
object BrotliFuzzMain {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(sys.env.getOrElse("BRFUZZ_DIR", "/tmp/brfuzz"))
    val names = dir.listFiles().map(_.getName).filter(_.endsWith(".br")).map(_.stripSuffix(".br")).sorted
    var ok = 0; var bad = 0
    names.foreach { n =>
      val br = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".br").toPath)
      val raw = java.nio.file.Files.readAllBytes(new java.io.File(dir, n + ".raw").toPath)
      try {
        val got = Brotli.decompress(br)
        if (java.util.Arrays.equals(got, raw)) ok += 1
        else { bad += 1; println(s"MISMATCH $n got=${got.length} want=${raw.length}") }
      } catch { case e: Throwable => bad += 1; println(s"ERROR $n ${e.getMessage}") }
    }
    println(s"ok=$ok bad=$bad")
  }
}
