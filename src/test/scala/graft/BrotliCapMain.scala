import graft.functions.Brotli

/** Ad-hoc soft-cap property sweep over an external corpus (BRFUZZ_DIR):
  * for every valid stream and a few random caps c, decompressCapped must
  * return exactly the reference output's first min(c, len) bytes with the
  * capped flag iff len > c. Committed spec pins the contract on fixtures;
  * this sweeps it across thousands of reference-encoder streams.
  */
object BrotliCapMain {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(sys.env.getOrElse("BRFUZZ_DIR", "/tmp/brfuzz"))
    val rnd = new scala.util.Random(17)
    var ok = 0; var bad = 0
    dir.listFiles().filter(_.getName.endsWith(".br")).sortBy(_.getName).foreach { f =>
      val br = java.nio.file.Files.readAllBytes(f.toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f.getName.stripSuffix(".br") + ".raw").toPath)
      val caps = Seq(0, 1, want.length / 2, math.max(0, want.length - 1),
        want.length, want.length + 1, rnd.nextInt(want.length + 2))
      caps.foreach { c =>
        try {
          val (got, capped) = Brotli.decompressCapped(br, c)
          val expLen = math.min(c, want.length)
          val good = capped == (want.length > c) && got.length == expLen &&
            java.util.Arrays.equals(got, java.util.Arrays.copyOf(want, expLen))
          if (good) ok += 1
          else { bad += 1; println(s"CAP DIFF ${f.getName} c=$c capped=$capped got=${got.length} want=${want.length}") }
        } catch { case e: Throwable =>
          bad += 1; println(s"CAP ERR ${f.getName} c=$c ${e.getMessage}") }
      }
    }
    println(s"cap-sweep ok=$ok bad=$bad")
  }
}
