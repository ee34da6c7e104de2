import graft.functions.Brotli

/** Ad-hoc decode-throughput probe (not a test): steady-state MB/s on the
  * largest committed fixtures.
  */
object BrotliPerfMain {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/root/repo/src/test/resources/graft/brotli")
    Seq("090_big_q11", "088_big_q4", "010_text_q11", "027_rep_q0").foreach { n0 =>
      val fs = dir.listFiles().filter(_.getName.endsWith(".br")).map(_.getName)
      val name = fs.find(_.contains(n0.split("_", 2)(1))).getOrElse(fs.head).stripSuffix(".br")
      val br = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".br").toPath)
      val out = Brotli.decompress(br)
      (1 to 20).foreach(_ => Brotli.decompress(br))
      val t0 = System.nanoTime()
      val iters = 50
      (1 to iters).foreach(_ => Brotli.decompress(br))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s out=${out.length}%8d  ${out.length.toLong * iters / sec / 1e6}%7.1f MB/s")
    }
  }
}
