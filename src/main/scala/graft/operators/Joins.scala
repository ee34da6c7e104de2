package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skew that AQE can't always fix (e.g. a handful of hot keys joining
  * a dimension too big to broadcast). Built-in strategies first — `broadcast()` for
  * small sides, AQE skew-join for moderate skew — salting is the explicit fallback.
  */
object Joins {

  /** Equi-join with the fact side salted across `saltFactor` sub-keys and the
    * dimension side replicated once per salt value. Every hot fact key fans out over
    * `saltFactor` shuffle partitions instead of hammering one; the dimension grows by
    * `saltFactor`×, so use only when it is far smaller than the fact table but above
    * the broadcast threshold. Row-level salt comes from `monotonically_increasing_id`
    * (deterministic, key-independent — hashing the key itself would put every copy of
    * a hot key back in one partition).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[(String, String)],
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(!facts.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "input already has a _salt column — it would be silently overwritten and dropped")
    // Replicating the dim side saltFactor× is only sound for join types that never
    // emit unmatched DIM rows: right/full outer would return every unmatched dim row
    // once per salt replica — silently wrong results.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti joins only, got '$joinType' — " +
        "right/full outer would emit each unmatched dim row saltFactor times")
    val saltedFacts = facts.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    val cond = (keys.map { case (f, d) => saltedFacts(f) === saltedDim(d) } :+
      (saltedFacts("_salt") === saltedDim("_salt"))).reduce(_ && _)
    val joined = saltedFacts.join(saltedDim, cond, joinType)
      .drop(saltedDim("_salt")).drop(saltedFacts("_salt"))
    keys.map(_._2).foldLeft(joined)((df, d) => df.drop(saltedDim(d)))
  }

  /** Range (interval-containment) join: pair every point row with every interval row
    * whose `[start, end]` contains the point — without the
    * BroadcastNestedLoopJoin/cartesian plan Spark picks for a raw inequality
    * condition (quadratic compares: every point against every interval).
    *
    * Strategy: discretize the domain into `binWidth`-sized bins. Each interval
    * EXPLODES to the bins it covers; each point has exactly ONE bin; an equi-join on
    * the bin then only compares points against intervals overlapping their bin, and
    * the exact containment filter removes same-bin non-matches. A (point, interval)
    * pair can only meet in the point's single bin, so no dedup pass is needed.
    * Cost: one hash shuffle on the bin key of |points| + Σ spans/binWidth rows —
    * shuffle-linear, never pair-quadratic.
    *
    * `binWidth` tunes the trade: small bins → more interval replicas, less
    * filtering; large bins → few replicas, more same-bin false compares. Set it near
    * the TYPICAL interval length. An interval spanning more than `maxBinsPerInterval`
    * bins fails loud (a single giant interval would otherwise replicate itself across
    * the whole axis — at corpus scale that is an accidental cross join; raise
    * `binWidth` or split the outlier interval).
    *
    * Semantics: inner join, containment inclusive on both ends (`start <= p <= end`).
    * NULL or non-finite (NaN/±Inf) points and bounds, and inverted intervals
    * (`end < start`), match nothing — a NaN bound would otherwise both dodge the
    * span guard (NaN-is-largest makes `end >= start` true while `binOf(NaN)` casts
    * to 0, turning the span negative) and diverge from SQL `p <= NaN` semantics.
    * Time columns: pass numeric columns (cast timestamps to epoch seconds up front —
    * keeps binning arithmetic exact and engine-portable).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Double,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "input already has a _bin column (reserved internal name)")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"column name collision between sides: ${overlap.mkString(", ")} — rename before joining")
    def binOf(c: Column) = floor(c / binWidth).cast("long")
    // between(±MaxValue) excludes NULL, NaN, and ±Inf in one predicate (repo idiom).
    def finite(c: Column) = c.between(-Double.MaxValue, Double.MaxValue)
    val p = points.filter(finite(col(pointCol)))
      .withColumn("_bin", binOf(col(pointCol)))
    val spanBins = binOf(col(endCol)) - binOf(col(startCol)) + 1L
    val iv = intervals
      .filter(finite(col(startCol)) && finite(col(endCol)) &&
        col(endCol) >= col(startCol))
      // Fail IN THE TASK, not after a collect: raise_error inside the projection
      // stops the job the moment one runaway interval appears. Both guard ends:
      // a span outside [1, max] means either a runaway interval or arithmetic
      // corruption — never something to join through silently.
      .withColumn("_bin", explode(sequence(
        when(spanBins.between(1L, maxBinsPerInterval), binOf(col(startCol)))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins of width $binWidth ("),
            spanBins, lit(" bins) — raise binWidth or split the interval")))),
        binOf(col(endCol)))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** [[rangeJoin]] with `binWidth` derived from the DATA instead of a caller guess:
    * one cheap aggregation takes an approximate interval-length quantile (default the
    * median) and uses it as the bin width. Bins near the typical interval length
    * keep both failure modes bounded — replicas per interval (length/binWidth, ~2 for
    * the median interval) and same-bin false candidates (points whose bin holds an
    * interval they miss). A length-quantile beats a mean here: one giant outlier
    * interval drags the mean (inflating false candidates for everyone else) but not
    * the median; the outlier itself still explodes to at most `maxBinsPerInterval`
    * replicas, guarded in-task by [[rangeJoin]].
    *
    * `q` picks the quantile (raise toward 1.0 when lengths are heavy-tailed and the
    * replica side, not the filter side, is the cost). Zero-length intervals are
    * legal (the median can be 0 when most intervals are instants) — the width floors
    * at the smallest positive length scale available, else 1.0. The width ALSO
    * floors at `maxlen / maxBinsPerInterval`, so the longest interval present can
    * always explode within the in-task span guard — a quantile-only width would
    * make [[rangeJoin]] raise_error on a legal heavy tail (median 1 s, one real 2 h
    * interval) that a hand-tuned width handled. The result is the same exact join
    * for ANY width; only the plan shape changes, so callers can adopt auto-width
    * without re-validating results.
    */
  def rangeJoinAuto(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, q: Double = 0.5,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    def finite(c: Column) = c.between(-Double.MaxValue, Double.MaxValue)
    val row = intervals
      .filter(finite(col(startCol)) && finite(col(endCol)) &&
        col(endCol) >= col(startCol))
      .agg(
        approx_percentile((col(endCol) - col(startCol)).cast("double"), lit(q), lit(1000))
          .as("qlen"),
        max((col(endCol) - col(startCol)).cast("double")).as("maxlen"))
      .head()
    val binWidth =
      if (row.isNullAt(0)) 1.0 // no valid intervals: join is empty, width irrelevant
      else {
        val qlen = row.getDouble(0)
        val maxlen = row.getDouble(1)
        val base =
          if (qlen > 0) qlen
          // all-instant majority: fall back to the largest length, else unit bins
          else if (maxlen > 0) maxlen
          else 1.0
        // the longest interval must fit the span guard: span bins are at most
        // floor(len/width) + 2 (bin-alignment slack on both ends), so a width of
        // maxlen/(maxBins-2) keeps the worst interval at <= maxBins bins
        math.max(base, maxlen / (maxBinsPerInterval - 2).max(1))
      }
    rangeJoin(points, intervals, pointCol, startCol, endCol, binWidth, maxBinsPerInterval)
  }

  /** All strings reachable from `s` by deleting at most `d` code points (including
    * `s` itself), deduplicated. The symmetric-delete blocking kernel: if
    * `levenshtein(s1, s2) <= d` then the aligned matched characters form a common
    * subsequence reachable from BOTH strings by at most `d` deletions, so the two
    * neighborhoods intersect — candidates generated this way are a SUPERSET of the
    * true matches (the exact verify pass makes the join exact). Deletions operate on
    * code points, matching Spark `levenshtein` semantics (not bytes).
    */
  private[operators] def deletionVariants(s: String, d: Int, maxLen: Int): Array[String] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n > maxLen) throw new IllegalArgumentException(
      s"editDistanceJoin: key of $n code points exceeds maxKeyLength=$maxLen — " +
        "raise maxKeyLength or pre-truncate the key column")
    val out = new java.util.LinkedHashSet[String]
    def without(skip1: Int, skip2: Int): String = {
      val sb = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < n) { if (i != skip1 && i != skip2) sb.appendCodePoint(cps(i)); i += 1 }
      sb.toString
    }
    out.add(s)
    if (d >= 1) { var i = 0; while (i < n) { out.add(without(i, -1)); i += 1 } }
    if (d >= 2) {
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { out.add(without(i, j)); j += 1 }; i += 1 }
    }
    out.toArray(new Array[String](out.size))
  }

  /** Verified fuzzy key pairs between two DISTINCT-key frames (`_lk` / `_rk`
    * single-column), via symmetric-delete blocking: explode each key into its
    * deletion neighborhood, equi-join on the 64-bit variant hash (only
    * `(key, hash)` rows cross the shuffle — variant strings never do), distinct the
    * candidate pairs (a pair can meet in many shared variants), then verify with
    * Spark's threshold `levenshtein` (early-exits past `maxDist`). `selfPairs`
    * keeps only `_lk < _rk` BEFORE the distinct, halving self-join work.
    */
  private def verifiedFuzzyPairs(lk: DataFrame, rk: DataFrame, maxDist: Int,
      maxKeyLength: Int, maxPairsPerVariant: Long, selfPairs: Boolean): DataFrame = {
    val gen = udf((s: String) => deletionVariants(s, maxDist, maxKeyLength))
    def variants(keys: DataFrame, keyCol: String, cntCol: String) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_vh"))
      keys.select(col(keyCol), explode(gen(col(keyCol))).as("_v"))
        .select(col(keyCol), xxhash64(col("_v")).as("_vh"))
        .withColumn(cntCol, count(lit(1)).over(w))
    }
    // Self-pair mode computes the variant table ONCE on neutral names and renames
    // per join side ABOVE the shared subtree (the banded-LSH self-join pattern):
    // with per-side names baked in below the window's exchange, the two sides'
    // exchange subtrees are not canonically identical and ReuseExchange cannot
    // serve them — the scan + distinct + variant-explode UDF ran twice.
    val cand0 =
      if (selfPairs) {
        val v = variants(lk.select(col("_lk").as("_k")), "_k", "_cnt")
        v.select(col("_vh"), col("_k").as("_lk"), col("_cnt").as("_bl"))
          .join(v.select(col("_vh"), col("_k").as("_rk"), col("_cnt").as("_br")),
            Seq("_vh"))
      } else variants(lk, "_lk", "_bl").join(variants(rk, "_rk", "_br"), Seq("_vh"))
    val cand = cand0
      // Fail IN THE TASK the moment one variant bucket would emit a runaway number
      // of candidate pairs (degenerate key distributions turn blocking quadratic —
      // at corpus scale that is an accidental cross join, never something to grind
      // through silently). Join exactness forbids dropping the bucket (the LSH
      // dedup guard's move); aborting loud is the only sound option.
      .filter(when(col("_bl") * col("_br") <= maxPairsPerVariant, lit(true))
        .otherwise(raise_error(concat(
          lit(s"editDistanceJoin: a variant bucket implies more than $maxPairsPerVariant" +
            " candidate pairs ("), col("_bl") * col("_br"),
          lit(") — raise maxPairsPerVariant or pre-segment the key domain")))))
    val filtered = if (selfPairs) cand.filter(col("_lk") < col("_rk")) else cand
    filtered.select(col("_lk"), col("_rk")).distinct()
      .withColumn("edit_distance", levenshtein(col("_lk"), col("_rk"), maxDist))
      .filter(col("edit_distance") >= 0) // threshold levenshtein returns -1 past maxDist
  }

  /** Fuzzy (edit-distance) equi-join — record linkage: pair every left row with
    * every right row whose string key is within `maxDist` Levenshtein edits of the
    * left key, EXACTLY, without the quadratic all-pairs compare a raw
    * `levenshtein(l, r) <= d` condition forces (Spark plans that as a nested-loop
    * cartesian — dead at any scale).
    *
    * Strategy (SymSpell symmetric delete): candidate generation runs on each side's
    * DISTINCT keys only — every key explodes into its ≤`maxDist`-deletion
    * neighborhood ([[deletionVariants]]; soundness argument there), sides equi-join
    * on the 64-bit variant hash, and surviving candidate KEY pairs (hash collisions
    * included) are verified with the threshold `levenshtein` before two plain
    * equi-joins assemble the full rows. Shuffle cost: distinct-keys × (|key|+1)
    * rows of ~(key + 8 B) for `maxDist = 1` (× |key|²/2 for 2) — never a row-pair
    * product; the verified match table is tiny and broadcasts into the assembly
    * joins.
    *
    * Guards: keys longer than `maxKeyLength` code points fail loud in the task
    * (neighborhood size is O(n^d) — a stray 5k-char key would explode silently); a
    * variant bucket implying more than `maxPairsPerVariant` candidate pairs fails
    * loud likewise (join exactness forbids dropping the bucket). NULL keys match
    * nothing (SQL join semantics). `maxDist` of 1 or 2 (3+ deletion neighborhoods
    * are combinatorially useless — block on q-grams instead at that radius).
    * Output: all left columns, all right columns, `edit_distance`.
    */
  def editDistanceJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, maxDist: Int, maxKeyLength: Int = 64,
      maxPairsPerVariant: Long = 1000000L): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2, got $maxDist (symmetric-delete blocking is " +
        "combinatorial in maxDist; use q-gram blocking beyond 2)")
    require(maxKeyLength >= 1, "maxKeyLength must be positive")
    require(maxPairsPerVariant >= 1, "maxPairsPerVariant must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column name collision between sides: ${overlap.mkString(", ")} — rename before joining")
    require(!left.columns.contains("edit_distance") && !right.columns.contains("edit_distance"),
      "input already has an edit_distance column (reserved output name)")
    import org.apache.spark.sql.types.StringType
    require(left.schema(leftKey).dataType == StringType &&
      right.schema(rightKey).dataType == StringType,
      "editDistanceJoin keys must be string columns — cast explicitly first")
    val lk = left.select(col(leftKey).as("_lk")).filter(col("_lk").isNotNull).distinct()
    val rk = right.select(col(rightKey).as("_rk")).filter(col("_rk").isNotNull).distinct()
    val matched = verifiedFuzzyPairs(lk, rk, maxDist, maxKeyLength,
      maxPairsPerVariant, selfPairs = false)
    left.join(matched, left(leftKey) === matched("_lk"))
      .join(right, matched("_rk") === right(rightKey))
      .drop("_lk", "_rk")
  }

  /** Self fuzzy-match over one table's key column: distinct unordered key pairs
    * within `maxDist` edits — the near-identical names/titles report that precedes
    * a record-linkage merge. Output `(key_a, key_b, edit_distance)` with
    * `key_a < key_b` (binary string order). Same blocking, guards, and exactness
    * as [[editDistanceJoin]].
    */
  def fuzzyKeyPairs(df: DataFrame, keyCol: String, maxDist: Int,
      maxKeyLength: Int = 64, maxPairsPerVariant: Long = 1000000L): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2, got $maxDist")
    import org.apache.spark.sql.types.StringType
    require(df.schema(keyCol).dataType == StringType,
      "fuzzyKeyPairs key must be a string column — cast explicitly first")
    val lk = df.select(col(keyCol).as("_lk")).filter(col("_lk").isNotNull).distinct()
    val rk = df.select(col(keyCol).as("_rk")).filter(col("_rk").isNotNull).distinct()
    verifiedFuzzyPairs(lk, rk, maxDist, maxKeyLength, maxPairsPerVariant,
      selfPairs = true)
      .select(col("_lk").as("key_a"), col("_rk").as("key_b"), col("edit_distance"))
  }

  /** Semi-join reduction: equi-join `big` against `selective` with a Bloom filter of
    * the selective side's keys pushed INTO the big side's scan, so non-matching big
    * rows die before the shuffle instead of after it. When 1% of a 100 TB fact table
    * matches ("orders of flagged customers", "docs of quarantined domains"), the
    * shuffle moves ~1% + fpp of the data instead of all of it — the big win lives in
    * the exchange, which the join itself cannot avoid.
    *
    * SOUND only for join types where unmatched big rows contribute NOTHING to the
    * output (`inner`, `left_semi`, `left_anti` is NOT such a type — the filter would
    * delete exactly the rows an anti-join exists to return; `left_outer` preserves
    * unmatched big rows). False positives are fine: the real join still runs and is
    * exact — the Bloom only thins its input.
    *
    * The filter is sized from the selective side's EXACT distinct key count (an
    * undersized Bloom silently degrades to pass-everything) — that count plus the
    * filter build are two passes over the (by assumption small) selective side,
    * checkpointed once. Composite keys hash through one `xxhash64`. NULL keys on
    * the big side are cut by an `IsNotNull` filter at the scan (they can never
    * equi-join) — the same pushdown Spark's own runtime bloom join inserts.
    */
  def bloomReducedJoin(big: DataFrame, selective: DataFrame, keys: Seq[(String, String)],
      fpp: Double = 0.01, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "bloomReducedJoin needs at least one key pair")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "semi").contains(normalized),
      s"bloomReducedJoin supports inner/left_semi only, got '$joinType' — any type that " +
        "keeps unmatched big-side rows (outer/anti) would have them deleted by the filter")
    // The Bloom bits are built from xxhash64 of the key values, and xxhash64 hashes
    // BY TYPE (hashInt(1) != hashLong(1L)). A type-coerced equi-join (int vs bigint)
    // would still MATCH in the join but almost never pass the filter — silently
    // deleting ~(1-fpp) of the true result. Fail loud instead; cast explicitly first.
    // Resolve types through the analyzer (case-insensitive like the join itself) —
    // StructType.apply is case-sensitive and would reject valid case-mismatched names.
    def typeOf(df: DataFrame, c: String) = df.select(col(c)).schema.head.dataType
    keys.foreach { case (b, s) =>
      val (tb, ts) = (typeOf(big, b), typeOf(selective, s))
      require(tb == ts,
        s"bloomReducedJoin key types must match exactly ($b: $tb vs $s: $ts) — " +
          "xxhash64 hashes by type, so a coerced join would pass while the Bloom " +
          "filter rejects true matches; cast explicitly first")
    }
    val selKeys = selective
      .filter(keys.map(k => col(k._2).isNotNull).reduce(_ && _))
      .select(xxhash64(keys.map(k => col(k._2)): _*).as("_bjh"))
      .distinct()
      .localCheckpoint(true)
    val n = selKeys.count()
    val bigNotNull = big.filter(keys.map(k => col(k._1).isNotNull).reduce(_ && _))
    val reduced =
      if (n == 0L) bigNotNull.filter(lit(false)) // nothing can match; skip the build
      else {
        val bloom = selKeys.stat.bloomFilter("_bjh", n, fpp)
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          bos.toByteArray
        }
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.GraftSqlBridge
        import org.apache.spark.sql.types.BinaryType
        bigNotNull.filter(GraftSqlBridge.column(BloomFilterMightContain(
          Literal(bytes, BinaryType),
          GraftSqlBridge.expression(xxhash64(keys.map(k => col(k._1)): _*)))))
      }
    val cond = keys.map { case (b, s) => reduced(b) === selective(s) }.reduce(_ && _)
    val joined = reduced.join(selective, cond, joinType)
    if (normalized == "inner") keys.map(_._2).foldLeft(joined)((df, s) => df.drop(selective(s)))
    else joined
  }
}
