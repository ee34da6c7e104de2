import graft.functions.SegmentKernel

/** Ad-hoc differential harness for the segmentation contract: reads every
  * .bin file under SEGFUZZ_DIR, runs tokenBounds over the raw bytes, writes
  * "<name>: s,e s,e ..." lines to stdout, plus the JVM-side classification
  * tables python needs to model the contract exactly (UTF-8 lead lengths per
  * Spark, joiner classification per this JVM's Unicode version).
  */
object SegmentDumpMain {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--tables")) {
      val leads = (0 until 256).map { b =>
        org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b.toByte)
      }.mkString(",")
      println(s"LEADS:$leads")
      // joiner classification for every BMP code point + the used astral range
      val sb = new StringBuilder("JOINERS:")
      (0 until 0x10000).foreach { cp =>
        if (cp < 0xD800 || cp > 0xDFFF) if (SegmentKernel.isJoiner(cp)) { sb.append(cp); sb.append(' ') }
      }
      (0x1B000 to 0x1B16F).foreach { cp => if (SegmentKernel.isJoiner(cp)) { sb.append(cp); sb.append(' ') } }
      println(sb.toString)
      return
    }
    val dir = new java.io.File(sys.env.getOrElse("SEGFUZZ_DIR", "/tmp/segfuzz"))
    dir.listFiles().filter(_.getName.endsWith(".bin")).sortBy(_.getName).foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val (bounds, n) = SegmentKernel.tokenBounds(bytes, bytes.length)
      val out = (0 until n).map(i => s"${bounds(i * 2)},${bounds(i * 2 + 1)}").mkString(" ")
      println(s"${f.getName}: $out")
    }
  }
}
