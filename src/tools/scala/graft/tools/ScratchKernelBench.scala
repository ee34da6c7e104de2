package graft.tools

import org.apache.spark.sql.SparkSession

/** Microbenchmark of the minhash signature kernel (round-15 verdict item 5):
  * the sf10 ngram LSH half is ~13.5 s of per-task kernel work, spec-pinned
  * bit-for-bit. Times the shipped loop against fused variants on REAL corpus
  * texts, single-threaded, asserting bit-identical signatures first.
  * `runMain graft.tools.ScratchKernelBench [docsParquetDir] [nDocs]`
  */
object ScratchKernelBench {
  // --- replicas of the shipped kernel's primitives (Dedup.scala) ---
  private def hashNgram(text: String, start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < start + n) { h ^= text.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }
  private def seedMix(h: Long, seed: Int): Long = {
    var x = h ^ (0x9e3779b97f4a7c15L * (seed + 1))
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  // V0: the shipped loop verbatim
  private def sigV0(t: String, shingleSize: Int, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val len = t.length
    val (count, width) =
      if (len < shingleSize) (1, len) else (len - shingleSize + 1, shingleSize)
    var i = 0
    while (i < count) {
      val h = hashNgram(t, i, width)
      var j = 0
      while (j < numHashes) {
        val v = seedMix(h, j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  // V1: per-seed constants precomputed once (hoists one mul out of the inner loop)
  private def sigV1(t: String, shingleSize: Int, numHashes: Int,
      seedC: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val len = t.length
    val (count, width) =
      if (len < shingleSize) (1, len) else (len - shingleSize + 1, shingleSize)
    var i = 0
    while (i < count) {
      val h = hashNgram(t, i, width)
      var j = 0
      while (j < numHashes) {
        var x = h ^ seedC(j)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      i += 1
    }
    sig
  }

  // V2: V1 + shingle-hash dedupe first (min over a multiset == min over its set,
  // so skipping duplicate shingles is bit-identical and saves 128 mixes each)
  private def sigV2(t: String, shingleSize: Int, numHashes: Int,
      seedC: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val len = t.length
    val (count, width) =
      if (len < shingleSize) (1, len) else (len - shingleSize + 1, shingleSize)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) { hs(i) = hashNgram(t, i, width); i += 1 }
    java.util.Arrays.sort(hs)
    var n = 0
    var k = 0
    while (k < count) {
      if (k == 0 || hs(k) != hs(k - 1)) { hs(n) = hs(k); n += 1 }
      k += 1
    }
    var m = 0
    while (m < n) {
      val h = hs(m)
      var j = 0
      while (j < numHashes) {
        var x = h ^ seedC(j)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      m += 1
    }
    sig
  }

  // V3: V2 with the inner loop unrolled x2 (independent mix chains for ILP)
  private def sigV3(t: String, shingleSize: Int, numHashes: Int,
      seedC: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val len = t.length
    val (count, width) =
      if (len < shingleSize) (1, len) else (len - shingleSize + 1, shingleSize)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) { hs(i) = hashNgram(t, i, width); i += 1 }
    java.util.Arrays.sort(hs)
    var n = 0
    var k = 0
    while (k < count) {
      if (k == 0 || hs(k) != hs(k - 1)) { hs(n) = hs(k); n += 1 }
      k += 1
    }
    var m = 0
    while (m < n) {
      val h = hs(m)
      var j = 0
      while (j + 1 < numHashes) {
        var x = h ^ seedC(j)
        var y = h ^ seedC(j + 1)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        y ^= y >>> 33; y *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        y ^= y >>> 33; y *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        y ^= y >>> 33
        if (x < sig(j)) sig(j) = x
        if (y < sig(j + 1)) sig(j + 1) = y
        j += 2
      }
      while (j < numHashes) {
        var x = h ^ seedC(j)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      m += 1
    }
    sig
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10_gen_v3")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").filter("text is not null").limit(nDocs)
      .collect().map(_.getString(0))
    spark.stop()
    val (shingleSize, numHashes) = (6, 128)
    val seedC = Array.tabulate(numHashes)(j => 0x9e3779b97f4a7c15L * (j + 1))
    println(s"[kernel] ${texts.length} texts, total chars ${texts.map(_.length.toLong).sum}")
    // shingle duplicate rate (how much V2 can save)
    val dupStats = texts.take(2000).map { t =>
      val count = if (t.length < shingleSize) 1 else t.length - shingleSize + 1
      val hs = new Array[Long](count)
      var i = 0
      while (i < count) { hs(i) = hashNgram(t, i, shingleSize); i += 1 }
      (count.toLong, hs.distinct.length.toLong)
    }
    println(f"[kernel] shingle dup rate ${1.0 - dupStats.map(_._2).sum.toDouble / dupStats.map(_._1).sum}%.3f")
    // bit-identity check on every text
    texts.take(3000).foreach { t =>
      val a = sigV0(t, shingleSize, numHashes)
      require(java.util.Arrays.equals(a, sigV1(t, shingleSize, numHashes, seedC)), "V1 mismatch")
      require(java.util.Arrays.equals(a, sigV2(t, shingleSize, numHashes, seedC)), "V2 mismatch")
      require(java.util.Arrays.equals(a, sigV3(t, shingleSize, numHashes, seedC)), "V3 mismatch")
    }
    println("[kernel] V1/V2/V3 bit-identical to V0 on 3000 texts")
    def time(label: String)(f: String => Array[Long]): Unit = {
      var sink = 0L
      (1 to 2).foreach(_ => texts.foreach(t => sink ^= f(t)(0))) // warmup
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        texts.foreach(t => sink ^= f(t)(0))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[kernel] $label%-28s min ${runs.min}%6.3f s  (runs ${runs.map(r => f"$r%.3f").mkString(", ")})  sink=$sink")
    }
    time("V0 shipped")(t => sigV0(t, shingleSize, numHashes))
    time("V1 seed consts")(t => sigV1(t, shingleSize, numHashes, seedC))
    time("V2 + dedupe shingles")(t => sigV2(t, shingleSize, numHashes, seedC))
    time("V3 + unroll x2")(t => sigV3(t, shingleSize, numHashes, seedC))
    // second pass to confirm ordering is stable under JIT state
    time("V0 shipped (2nd)")(t => sigV0(t, shingleSize, numHashes))
    time("V1 (2nd)")(t => sigV1(t, shingleSize, numHashes, seedC))
    time("V2 (2nd)")(t => sigV2(t, shingleSize, numHashes, seedC))
    time("V3 (2nd)")(t => sigV3(t, shingleSize, numHashes, seedC))
    time("V0 shipped (3rd)")(t => sigV0(t, shingleSize, numHashes))
    time("V1 (3rd)")(t => sigV1(t, shingleSize, numHashes, seedC))
  }
}
