object HashCheck {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal.MediaCodecs
    val hs = (0 until 37).map(s => MediaCodecs.audioHash(
      MediaCodecs.encodeNoiseWav(8000, 4096, s.toLong)).get)
    var minH = 64
    for (i <- 0 until 37; j <- i + 1 until 37) {
      val h = java.lang.Long.bitCount(hs(i) ^ hs(j))
      if (h < minH) minH = h
    }
    println(s"[check] audio: distinct=${hs.distinct.size}/37 min cross-seed hamming=$minH")
    // envelope sanity: 64 windows, values in [0,1], block structure visible
    val env = MediaCodecs.wavEnvelope(MediaCodecs.encodeNoiseWav(8000, 4096, 5L), 64).get
    println(f"[check] env n=${env.length} min=${env.min}%.3f max=${env.max}%.3f")
  }
}
