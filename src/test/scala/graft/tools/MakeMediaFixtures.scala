package graft.tools

import graft.operators.Multimodal.MediaCodecs

/** Regenerate the tiny checked-in media fixtures under src/test/resources/media/
  * (`sbt "Test/runMain graft.tools.MakeMediaFixtures"`). Known dimensions/durations
  * are pinned by MultimodalSpec against the CHECKED-IN bytes — not against fresh
  * encoder output — so a decoder bug cannot hide behind a matching encoder bug.
  */
object MakeMediaFixtures {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/media")
    dir.mkdirs()
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.File(dir, name)
      val os = new java.io.FileOutputStream(f)
      try os.write(bytes) finally os.close()
      println(s"wrote ${f.getPath} (${bytes.length} bytes)")
    }
    // 7x5 test-pattern images in all four JDK-writable formats.
    for (fmt <- Seq("png", "jpeg", "gif", "bmp"))
      write(s"tiny_7x5.$fmt", MediaCodecs.encodeImage(7, 5, fmt, seed = 42L))
    // 8 kHz 8-bit mono PCM, 4000 data bytes -> exactly 500 ms.
    write("tone_500ms.wav",
      MediaCodecs.encodeWavPcm(8000, Array.tabulate(4000)(i => (i % 251).toByte)))
    // Video container metadata fixtures: 2500 ms, 320x180.
    write("tiny_320x180_2500ms.mp4", MediaCodecs.encodeMp4Meta(2500L, 320, 180))
    write("tiny_320x180_2500ms.mkv", MediaCodecs.encodeMkvMeta(2500L, 320, 180))
    write("tiny_320x180_2500ms.avi", MediaCodecs.encodeAviMeta(2500L, 320, 180))
    // 3-frame 9x7 animated GIFs (noise frames, seed 5): no delay / 25 cs per frame.
    write("anim_9x7_3f.gif", MediaCodecs.encodeAnimatedGif(9, 7, 3, seed = 5L))
    write("anim_9x7_3f_25cs.gif",
      MediaCodecs.encodeAnimatedGif(9, 7, 3, seed = 5L, delayCs = 25))
  }
}
