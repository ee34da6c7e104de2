import graft.functions.Brotli

/** Ad-hoc accept/reject parity probe vs the reference decoder over mutated
  * streams (/tmp/brmut built by the driver-side generator): counts cases
  * where graft accepts a stream the reference rejects (and vice versa), and
  * output mismatches when both accept. Not a committed test — the committed
  * malformed-fuzz asserts the never-crash contract; this measures strictness
  * parity, where divergence is expected and tolerable in the lenient
  * direction only if the OUTPUT question can't arise.
  */
object BrotliMutantMain {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/tmp/brmut")
    val meta = {
      val txt = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "meta.json").toPath))
      txt.stripPrefix("{").stripSuffix("}").split(",").map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        k -> v
      }.toMap
    }
    var bothOkSame = 0; var bothOkDiff = 0; var bothErr = 0
    var weAcceptRefRejects = 0; var weRejectRefAccepts = 0
    meta.toSeq.sortBy(_._1).foreach { case (k, refStatus) =>
      val br = java.nio.file.Files.readAllBytes(new java.io.File(dir, k + ".br").toPath)
      val mine = try Some(Brotli.decompress(br, 1 << 26))
        catch { case _: Throwable => None }
      (refStatus, mine) match {
        case ("ok", Some(got)) =>
          val want = java.nio.file.Files.readAllBytes(new java.io.File(dir, k + ".raw").toPath)
          if (java.util.Arrays.equals(got, want)) bothOkSame += 1
          else { bothOkDiff += 1; println(s"OUTPUT DIFF $k got=${got.length} want=${want.length}") }
        case ("ok", None) => weRejectRefAccepts += 1
        case ("err", Some(_)) => weAcceptRefRejects += 1
        case _ => bothErr += 1
      }
    }
    println(s"bothOkSame=$bothOkSame bothOkDiff=$bothOkDiff bothErr=$bothErr " +
      s"weAcceptRefRejects=$weAcceptRefRejects weRejectRefAccepts=$weRejectRefAccepts")
  }
}
