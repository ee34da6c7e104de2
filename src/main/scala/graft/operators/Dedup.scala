package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, each designed around its
  * 100 TB shuffle shape:
  *
  *  - exact: hash-groupBy on the key — one shuffle, map-side combined.
  *  - MinHash-LSH: per-row signature (row-local, codegen'd) → band-bucket shuffle →
  *    candidate pairs only; never all-pairs.
  *  - SimHash: per-row 64-bit sketch → band buckets → Hamming verify.
  *  - n-gram Jaccard: exact verification on candidate pairs (or small corpora).
  *  - embedding cosine: random-hyperplane LSH buckets → cosine verify.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // ---------- exact ----------

  /** total/distinct/duplicate-row counts over the key columns. NULL keys compare
    * EQUAL to each other and 0.0/-0.0 group as one value — the same semantics as
    * [[exactDedup]]/`dropDuplicates`, for any column count (a plain `countDistinct`
    * would skip null-keyed rows entirely and report every one of them as a duplicate).
    */
  def exactDupStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("total"),
      // Sum ALL returned aggregate columns: the exact single-column form is
      // (countDistinct + has-null flag) — taking only .head would silently drop
      // null-keyed rows instead of collapsing them to one value. Zero-row safety
      // (the flag max is NULL over empty input) lives in distinctCount itself.
      graft.constraints.UniqueExprs.distinctCount(cols, graft.constraints.NullMode.IncludeAsOne)
        .reduce(_ + _).as("distinct_count"))
      .select(col("total"), col("distinct_count"),
        (col("total") - col("distinct_count")).as("duplicate_rows"))

  /** Keep one row per key (first by tiebreaker if given) — the scalable
    * `row_number() = 1` formulation, one shuffle on the key.
    */
  def exactDedup(df: DataFrame, keys: Seq[String], tiebreaker: Option[String] = None): DataFrame =
    tiebreaker match {
      case None => df.dropDuplicates(keys)
      case Some(tb) =>
        // nulls LAST: the kept representative should be the smallest REAL tiebreaker
        // value — default ascending ranks NULL first, so a null-id row would shadow
        // every genuine id in its group (and diverge from SQL min(), which skips NULLs).
        require(!df.columns.contains("_rn"),
          "exactDedup uses an internal _rn column; input already has one — rename it")
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tb).asc_nulls_last)
        df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    }

  // ---------- MinHash + LSH ----------

  /** Fan narrow inputs out to the session's parallelism before row-local kernels
    * (minhash/simhash/shingle/cosine passes). A single-row-group parquet — the local
    * test corpus — pins an uncached scan to ONE task, serializing the per-row hashing
    * that should saturate every core. No-op whenever the input is already at least as
    * parallel, which is the real-cluster case (100 TB corpora arrive in thousands of
    * splits), so no shuffle is added at scale.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    // The .rdd partition probe below PARTIALLY EXECUTES the plan under AQE when it
    // contains shuffle stages — a join-shaped input would materialize twice (probe +
    // downstream consumption). Guard by plan shape instead of caller discipline: a
    // frame whose plan already shuffles (join/agg/window/repartition) comes out at
    // spark.sql.shuffle.partitions-parallel anyway, so the probe is both dangerous
    // AND pointless there — return it untouched. Only a genuine narrow scan (the
    // single-row-group local-test corpus this exists for) gets probed and fanned.
    import org.apache.spark.sql.catalyst.plans.{logical => lp}
    // Inspect the ANALYZED plan, not .logical: a view / spark.table name is an
    // UnresolvedRelation pre-analysis, so a join hidden behind a view would bypass
    // this guard. Analysis resolves names without executing anything.
    val shuffles = df.queryExecution.analyzed.exists {
      // Deduplicate is what dropDuplicates/exactDedup produce (lp.Distinct only comes
      // from SQL SELECT DISTINCT); global Sort is a range exchange. Both belong here —
      // the exact-then-near dedup pipeline feeds exactDedup output straight into the
      // LSH operators.
      case _: lp.Join | _: lp.Aggregate | _: lp.Window | _: lp.RepartitionOperation |
           _: lp.Distinct | _: lp.Deduplicate => true
      case s: lp.Sort if s.global => true
      case _ => false
    }
    if (shuffles) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** FNV-1a over a char range + fmix64 avalanche — the 64-bit shingle hash used by the
    * MinHash UDF. Allocation-free (no substring).
    */
  private def hashNgram(text: String, start: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < start + n) { h ^= text.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  /** The i-th minhash function applied to a shingle hash (fmix64 of h xor a per-seed
    * odd constant — independent-enough permutations of the 64-bit hash space).
    */
  private def seedMix(h: Long, seed: Int): Long = {
    var x = h ^ (0x9e3779b97f4a7c15L * (seed + 1))
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** MinHash signature of the text's char-n-gram shingle multiset (min is
    * duplicate-insensitive, so no dedupe pass is needed): one tight loop hashing each
    * shingle once and folding all `numHashes` minima in a single traversal. Row-local —
    * no explode, no shuffle. A UDF rather than nested higher-order-function Columns:
    * `transform`/`array_min` are CodegenFallback with no subexpression elimination, so
    * the Column formulation re-evaluates the shingling per hash function (and per
    * banding reference downstream) — orders of magnitude slower.
    */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    // shingleSize <= 0 would make hashNgram loop zero times: every shingle hashes to
    // one constant, every doc gets an identical signature, and the pipeline silently
    // collapses the corpus (or guard-drops everything) instead of erroring.
    require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    // Per-seed xor constants hoisted out of the hot loop (round 15, guide §1.2
    // per-task work): seedMix recomputes `0x9e…L * (seed+1)` for every
    // (shingle, seed) — numHashes multiplies per shingle that a table computed
    // once per UDF construction provides. Inlined mix is seedMix verbatim after
    // that substitution, so signatures stay bit-identical (pinned by the
    // ScratchKernelBench identity sweep + the kernel differential in
    // OperatorSpec). Measured single-thread on 20k sf10 texts: 1.84 -> 1.63 s
    // (~10%); dedupe-first and unroll-x2 variants measured no better / worse.
    val seedC = Array.tabulate(numHashes)(j => 0x9e3779b97f4a7c15L * (j + 1))
    val f = udf { (t: String) =>
      if (t == null) null
      else {
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
    }
    f(text)
  }

  /** (band, bucket) pairs for LSH banding: the signature is split into `bands` slices of
    * `rowsPerBand`, each hashed to one bucket (xxhash64 hashes the long-array slice
    * directly). Docs sharing any (band, bucket) become candidates. Tune bands/rows for
    * the target Jaccard threshold: P(candidate) = 1 - (1 - j^rows)^bands.
    */
  def lshBuckets(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** The LSH bucket index of a corpus: one `(id, band, bucket)` row per banded
    * signature slice — the persistable state that makes dedup INCREMENTAL. Write
    * this once for the standing corpus (parquet, ideally `partitionBy("band")` for
    * join co-location), then each new batch runs the signature kernel over ITS OWN
    * rows only and joins [[incrementalMinhashCandidates]] against the stored index —
    * at a 100 TB standing corpus the saved work is the whole corpus-wide kernel +
    * banding pass, per batch. Same banding as [[minhashCandidatePairs]]; use
    * IDENTICAL parameters for index build and every incremental batch, or buckets
    * cannot match (not detectable from the index itself — the caller owns that
    * contract).
    */
  def minhashIndex(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    require(bands > 0 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands) — " +
        "otherwise signature slices are empty or trailing hash functions are silently unused")
    val rowsPerBand = numHashes / bands
    // Null-text rows can never verify as near-dups (their jaccard is null), but
    // without this filter they all share one bucket — xxhash64(null signature) — and
    // flood the candidate join with pairs the verify stage then discards.
    val docs = df.filter(col(textCol).isNotNull)
    // Signature materialized in its OWN projection before banding: `lshBuckets` slices
    // the signature 16 times, and inlining the UDF there would textually duplicate the
    // (expensive, whole-text) minhash kernel per band. CollapseProject keeps the two
    // projections separate because the alias is non-cheap and multiply referenced, so
    // the kernel runs exactly once per row.
    fanOut(docs)
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleSize, numHashes).as("_sig"))
      .select(col("id"), explode(lshBuckets(col("_sig"), bands, rowsPerBand)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs for an incremental batch: pairs among `newDocs` plus pairs
    * between `newDocs` and the standing corpus represented by `index` (from
    * [[minhashIndex]], SAME parameters). Old×old pairs are deliberately absent —
    * previous runs already emitted them; re-deriving them would redo the full-corpus
    * join this operator exists to avoid. Ids must be unique ACROSS batches (they are
    * the pair identity). Verify stage: feed the result to [[exactJaccard]] with a
    * docs frame covering BOTH corpora — the semi-join inside restricts the shingle
    * kernel to docs that actually appear in a candidate pair, so the standing corpus
    * is scanned but only candidate docs pay the kernel.
    *
    * Scale: the index side never recomputes signatures — its `(id, band, bucket)`
    * rows (~24 B) shuffle straight into the (band, bucket) join; the windowed
    * `maxBucketSize` guard runs over the COMBINED buckets, so a hot boilerplate
    * bucket cannot go quadratic no matter which side fills it.
    */
  def incrementalMinhashCandidates(
      newDocs: DataFrame, index: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    require(Seq("id", "band", "bucket").forall(index.columns.contains),
      s"index must have (id, band, bucket) columns, got ${index.columns.mkString(", ")}")
    val newBuckets = minhashIndex(newDocs, idCol, textCol, shingleSize, numHashes, bands)
      .withColumn("_new", lit(true))
    val all = newBuckets
      .unionByName(index.select(col("id"), col("band"), col("bucket"))
        .withColumn("_new", lit(false)))
      .repartition(col("band"), col("bucket"))
    val bounded = all
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("_n") <= maxBucketSize)
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("_new").as("_new_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("_new").as("_new_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b") && (col("_new_a") || col("_new_b")))
      .select("id_a", "id_b").distinct()
  }

  /** Candidate near-duplicate pairs (idA < idB) from MinHash-LSH. One shuffle on
    * (band, bucket); the self-join carries ONLY (band, bucket, id) — signatures never
    * cross the shuffle, so a candidate row is ~24 bytes regardless of numHashes.
    * Buckets larger than `maxBucketSize` (degenerate/skewed content) are dropped — the
    * standard guard against quadratic blowup on pathological buckets.
    *
    * Default banding is 16 bands × 8 rows: the S-curve midpoint (1/b)^(1/r) ≈ 0.71, so
    * recall at j ≥ 0.9 is 1-(1-0.9^8)^16 ≈ 0.9999 while pairs at the corpus-background
    * similarity (j ≤ 0.3) collide with probability < 1e-3 — wide bands (e.g. 32×4) let
    * background pairs flood the candidate set on boilerplate-heavy corpora.
    *
    * Note: pass the corpus UNCACHED. The signature kernel runs once only because both
    * self-join sides reuse one exchange, and Spark cannot canonicalize the two
    * InMemoryRelation copies a cached input becomes across the self-join — a cached
    * corpus recomputes the kernel per side (correct, just slower).
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    // Consumed three times (bucket-size guard + both sides of the candidate join).
    // One explicit shuffle on (band, bucket): ReuseExchange serves every consumer
    // from the same shuffle files, so the signature kernel runs once per row, the
    // downstream agg and self-join need no further exchange (partitioning already
    // matches their keys), and — unlike persist() — nothing is pinned in executor
    // storage for the life of the session (shuffle files are job-scoped).
    val buckets = minhashIndex(df, idCol, textCol, shingleSize, numHashes, bands)
      .repartition(col("band"), col("bucket"))
    // Oversized-bucket guard as a windowed count over the SAME shuffle output. A
    // separate aggregation branch gets column-pruned into a canonically different
    // subplan (no id column), so neither static ReuseExchange nor AQE stage reuse can
    // serve it — it would re-run the signature kernel over the whole corpus. The
    // window's per-partition sort is over ~24-byte rows, far cheaper than a second
    // kernel pass; both join sides below stay canonically identical, so the exchange
    // materializes once and is reused.
    val bounded = buckets
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("_n") <= maxBucketSize)
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Sorted distinct 64-bit hashes of the text's char-n-gram shingle set — the
    * document's fingerprint set for Jaccard verification. One allocation-lean UDF pass
    * (hash every shingle in place, sort, dedupe in place): the higher-order-function
    * Column formulation (`transform`+`substr`+`array_distinct`) materializes every
    * shingle as a string and evaluates interpreted per element, which made the verify
    * stage the dominant cost of the near-dup pipeline.
    */
  def shingleHashSet(text: Column, shingleSize: Int): Column = {
    require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")
    val f = udf { (t: String) =>
      if (t == null) null
      else {
        val len = t.length
        val (count, width) =
          if (len < shingleSize) (1, len) else (len - shingleSize + 1, shingleSize)
        val arr = new Array[Long](count)
        var i = 0
        while (i < count) { arr(i) = hashNgram(t, i, width); i += 1 }
        java.util.Arrays.sort(arr)
        var n = 0
        var j = 0
        while (j < count) {
          if (j == 0 || arr(j) != arr(j - 1)) { arr(n) = arr(j); n += 1 }
          j += 1
        }
        if (n == count) arr else java.util.Arrays.copyOf(arr, n)
      }
    }
    f(text)
  }

  /** Jaccard of two SORTED distinct long arrays: one linear merge inside whole-stage
    * codegen (native [[graft.functions.JaccardSorted]] expression — no per-pair boxing
    * of the arrays into `Seq[Long]`, which dominated the verify stage at 10^5+
    * candidate pairs).
    */
  private def jaccardSorted(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.jaccardSorted(a, b)

  /** Jaccard over hashed char-n-gram shingle sets for given id pairs. Shingles are
    * compared as 64-bit hashes, not strings: set semantics are identical up to hash
    * collisions (P < 1e-12 per document at typical shingle counts) and the verify work
    * is a linear merge of two sorted long arrays — the dominant cost of the verify
    * stage stays in one tight primitive loop per candidate pair.
    */
  /** NOTE: `pairs` is consumed THREE times (two wanted-id branches + the join probe),
    * and the branches diverge before any reusable exchange — pass a MATERIALIZED or
    * cheap-to-recompute candidate frame. [[nearDupPairsMinhash]] localCheckpoints its
    * candidates before calling here for exactly this reason.
    *
    * `minJaccard` > 0 arms the EXACT set-size prefilter (the classic length filter
    * of set-similarity joins): |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so
    * jaccard ≤ min/max — a pair whose shingle-set sizes differ by more than the
    * threshold ratio can NEVER verify and is dropped while the candidate rows are
    * still skinny, before the joins that carry the shingle arrays. Dropped pairs
    * are absent from the output (they could only ever fail the caller's
    * `jaccard >= minJaccard` filter); kept pairs verify exactly as before, so
    * results are provably unchanged for any caller filtering at `>= minJaccard`.
    * Measured (round 14, generated corpora): kills 73% of candidates at sf1 and
    * 80% at sf10, where the candidate set grows ~56x by density construction and
    * the verify joins were the superlinear term of the sf10 ratio.
    *
    * PRECONDITION (round-15 ADVICE item): `docs` must be unique on `idCol` — the
    * universal contract of this pipeline (ids are the pair identity; every caller
    * feeds a primary-key corpus or exactDedup output). With duplicate ids the
    * verify joins already multiply output rows by dup_a*dup_b, and the
    * prefilter's two extra joins against `sizes` would square that factor again
    * (dup^2 → dup^4) — i.e. the minJaccard>0 path would amplify an
    * already-broken input differently than minJaccard=0, not break a valid one.
    */
  def exactJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 5, minJaccard: Double = 0.0): DataFrame = {
    // Only docs that actually appear in a candidate pair need a shingle set: semi-join
    // the corpus down BEFORE the kernel runs. Candidate sets are orders smaller than
    // the corpus (LSH's whole point), so at scale this turns a full-corpus UDF pass
    // into one over ~|pairs| docs; AQE broadcasts the id set when small. The inner
    // id joins below already restrict the OUTPUT — this restricts the WORK.
    val wanted = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    // The shingle-set projection feeds BOTH sides of the pair join (id_a and id_b
    // lookups). An explicit shuffle on the id lets ReuseExchange feed both joins from
    // one run of the shingle-hash kernel (the rename projections above it preserve the
    // exchange's canonical form), without persist()'s session-lifetime storage pin —
    // repeated library calls previously accumulated cached blocks until eviction
    // pressure degraded every later job in the session.
    // fanOut wraps the RAW scan, not the semi-join: fanOut's plan-shape guard would
    // see the join and no-op (correct but useless); on the scan it genuinely fans the
    // kernel out. The semi-join preserves the fanned-out partitioning.
    val sh = fanOut(docs).join(wanted, Seq(idCol), "left_semi")
      .select(col(idCol).as("_jid"), shingleHashSet(col(textCol), shingleSize).as("_sh"))
      .repartition(col("_jid"))
    val kept =
      if (minJaccard <= 0.0) pairs
      else {
        // Size prefilter while the pair rows are still ~16 B: two joins against the
        // (id, set-size) projection of the SAME _jid exchange (ReuseExchange serves
        // all four consumers from one kernel pass), then the ratio cut. The 1e-9
        // slack covers double rounding of min/max vs the verify's inter/union
        // division — a false KEEP costs one exact verify, a false drop is
        // impossible (the slack only ever widens the kept set).
        val sizes = sh.select(col("_jid"), size(col("_sh")).cast("long").as("_nsh"))
        pairs
          .join(sizes.withColumnRenamed("_jid", "id_a").withColumnRenamed("_nsh", "_na"), "id_a")
          .join(sizes.withColumnRenamed("_jid", "id_b").withColumnRenamed("_nsh", "_nb"), "id_b")
          .filter(least(col("_na"), col("_nb")).cast("double") >=
            lit(minJaccard - 1e-9) * greatest(col("_na"), col("_nb")).cast("double"))
          .drop("_na", "_nb")
      }
    kept
      .join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
      .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
      .withColumn("jaccard", jaccardSorted(col("_sh_a"), col("_sh_b")))
      .drop("_sh_a", "_sh_b")
  }

  /** End-to-end MinHash-LSH near-dup pairs verified by exact Jaccard >= threshold.
    *
    * Eager at call time: the candidate pairs are materialized (localCheckpoint) before
    * the verify stage. The verify stage consumes them TWICE — once to semi-join the
    * corpus down to docs that appear in a pair (so the shingle kernel skips the rest)
    * and once as the join probe — and without materialization each consumer re-runs
    * the whole LSH candidate pipeline (the branches diverge before any reusable
    * exchange). Candidate sets are small by LSH design (bucket-size guard bounds the
    * per-bucket blowup), so the checkpoint is cheap at any corpus size.
    */
  def nearDupPairsMinhash(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
      .localCheckpoint(true)
    exactJaccard(cands, df, idCol, textCol, shingleSize, minJaccard = threshold)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Incremental end-to-end near-dup pairs: [[incrementalMinhashCandidates]] against
    * the standing-corpus `index`, verified by exact Jaccard ≥ `threshold`. `allDocs`
    * must cover BOTH corpora (the verify stage shingles only docs appearing in a
    * candidate — the standing corpus never pays a full kernel pass). Parameters must
    * match the index build exactly.
    */
  def incrementalNearDupPairs(
      newDocs: DataFrame, index: DataFrame, allDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    // Materialized for the same reason nearDupPairsMinhash materializes: the verify
    // stage consumes the candidate frame three times.
    val cands = incrementalMinhashCandidates(newDocs, index, idCol, textCol,
      shingleSize, numHashes, bands, maxBucketSize).localCheckpoint(true)
    exactJaccard(cands, allDocs, idCol, textCol, shingleSize, minJaccard = threshold)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Near-dup DEDUPLICATION (not just pair listing): drops every row that appears as
    * the higher id of a verified near-dup pair, keeping the lowest id of each
    * near-duplicate relation (chains collapse greedily: in a-b, b-c both b and c drop).
    * One left-anti join against the distinct dropped-id set — the pair pipeline's
    * subquadratic shape end to end. A row with a NULL id is always KEPT: the pair
    * ordering `idA < idB` is undefined against NULL, so such a row can never be the
    * dropped side of a pair (assign ids upstream if null-id rows should dedup).
    */
  def dedupNearMinhash(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val drop = nearDupPairsMinhash(df, idCol, textCol, threshold, shingleSize, numHashes, bands)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Cross-corpus contamination (training-set decontamination): for each probe doc
    * (an eval/test set), the fraction of its word `ngramWords`-grams that also occur
    * anywhere in the corpus. The GPT-3-style n-gram-overlap decontamination check.
    *
    * 100 TB shape: the CORPUS NEVER SHUFFLES — its exploded n-gram hashes are filtered
    * by a broadcast semi-join against the probe's (small) hash set right after the
    * row-local shingle projection, and the only corpus-derived shuffle is a distinct
    * over matched hashes, bounded by the probe set size. The probe side must therefore
    * be broadcastable (eval sets are; a 100 GB probe is not a decontamination check).
    *
    * Eager at call time: the probe's shingles are materialized once (localCheckpoint)
    * because they feed both the broadcast hash set and the per-doc scoring join.
    *
    * Output: one row per probe doc — `probe_id`, `ngrams_total` (distinct n-grams in
    * the probe doc), `ngrams_matched`, `contamination` (= matched/total). Docs with
    * ZERO tokens (empty/whitespace-only/null text) contribute no grams on either side
    * and are absent from the output — without the guard, every empty doc would share
    * the empty pseudo-gram and score 100% contamination against any empty corpus row.
    */
  def crossCorpusContamination(corpus: DataFrame, probe: DataFrame,
      corpusTextCol: String, probeIdCol: String, probeTextCol: String,
      ngramWords: Int = 8): DataFrame = {
    require(ngramWords > 0, s"ngramWords must be positive, got $ngramWords")
    val probeShingles = probeShingleHashes(probe, probeIdCol, probeTextCol, ngramWords)
    val probeHashes = probeShingles.select("_h").distinct()
    val matched = corpusGramHashes(corpus, corpusTextCol, ngramWords)
      .join(broadcast(probeHashes), Seq("_h"), "left_semi")
      .distinct()
    scoreContamination(probeShingles, matched)
  }

  /** [[crossCorpusContamination]] for probe sets too large to broadcast as a hash-join
    * table but whose BLOOM BITS still fit (~1.2 MB per million distinct grams at 1%
    * fpp — a 100 M-gram probe is ~120 MB of bits vs several GB of join hashtable).
    *
    * Same exact output as the broadcast path. The Bloom filter is only a PRE-SHUFFLE
    * filter — the Spark runtime-filter pattern, applied explicitly: corpus grams that
    * pass the (codegen'd, no-UDF) `might_contain` probe are a small superset of the
    * true matches (true matches + `fpp` of the corpus's distinct grams), and only
    * that superset shuffles into the exact semi-join that removes false positives. At
    * fpp=0.01 the corpus-side shuffle volume drops ~99% vs a plain shuffle join while
    * the result stays exact.
    *
    * Two probe-side passes (distinct-count for sizing + the aggregate that builds the
    * filter) run over the localCheckpointed shingle frame — no source re-read.
    */
  def crossCorpusContaminationBloom(corpus: DataFrame, probe: DataFrame,
      corpusTextCol: String, probeIdCol: String, probeTextCol: String,
      ngramWords: Int = 8, fpp: Double = 0.01): DataFrame = {
    require(ngramWords > 0, s"ngramWords must be positive, got $ngramWords")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val probeShingles = probeShingleHashes(probe, probeIdCol, probeTextCol, ngramWords)
    val probeHashes = probeShingles.select("_h").distinct().localCheckpoint(true)
    // Exact distinct count sizes the filter — an undersized Bloom silently degrades
    // to pass-everything and the "99% shuffle cut" quietly becomes 0%.
    val n = probeHashes.count()
    if (n == 0L) {
      // Empty probe: nothing can match; skip building a filter over zero items.
      return scoreContamination(probeShingles, probeHashes)
    }
    val bloom = probeHashes.stat.bloomFilter("_h", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    // Codegen'd catalyst predicate (the expression behind Spark's own runtime bloom
    // joins) — the corpus-side scan stays a single WholeStageCodegen span with zero
    // UDF boundary. The serialized bits ride the stage's task binary (broadcast once
    // per executor), not per-row.
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.GraftSqlBridge
    def mightContain(h: Column): Column = GraftSqlBridge.column(
      BloomFilterMightContain(Literal(bytes, BinaryType), GraftSqlBridge.expression(h)))
    val matched = corpusGramHashes(corpus, corpusTextCol, ngramWords)
      .filter(mightContain(col("_h")))
      // NOT broadcast: this semi-join is the exact false-positive scrub, sized by the
      // too-big-to-broadcast probe — let it shuffle the (already Bloom-thinned)
      // survivors. distinct() after, bounded by the probe's gram count.
      .join(probeHashes.hint("shuffle_hash"), Seq("_h"), "left_semi")
      .distinct()
    scoreContamination(probeShingles, matched)
  }

  /** THE gram-hash formula of the contamination family, in one place: tokenful
    * rows only (the shorter-than-n fallback would hand tokenless text the ""
    * pseudo-gram), word shingles, xxhash64, distinct. The stored-firewall
    * guarantee (zero false negatives against blooms persisted by PAST versions)
    * depends on this hashing never drifting — every path derives from here or is
    * golden-pinned in the spec.
    *
    * TOKENIZER-VERSION CAVEAT: grams ride the MATCHING tokenizer
    * ([[graft.functions.SegmentKernel]]), which segments the no-space scripts
    * (Han/Kana/Thai/…) into character bigrams. For text WITHOUT those scripts the
    * gram hashes are bit-identical to every previously shipped version; a bloom
    * persisted BEFORE segmentation landed from probe text that CONTAINED such
    * scripts stored the old giant-pseudo-token gram hashes (usually the
    * shorter-than-k whole-page fallback gram — which DID catch byte-exact
    * whole-page copies) and MUST be rebuilt before probing new corpora: the
    * corpus side now emits segmented grams that never match those stored bits.
    * After the rebuild the firewall also catches partial/near-copy CJK
    * contamination the old whole-page-only gram could not.
    */
  private def distinctGramHashes(df: DataFrame, textCol: String,
      ngramWords: Int): DataFrame =
    df.filter(size(tokens(col(textCol))) > 0)
      .select(explode(wordShingleHashes(col(textCol), ngramWords)).as("_h"))
      .distinct()

  /** Build the probe side of [[crossCorpusContaminationBloom]] ONCE as portable
    * bytes (Spark's `BloomFilter.writeTo` encoding): the eval-set firewall a
    * standing ingestion pipeline stores next to the eval data and reuses on every
    * incoming batch — no probe rescan, no rebuild, survives sessions (same
    * store-don't-recompute contract as [[minhashIndex]] and the sketch columns).
    * Returns empty bytes for an empty/tokenless probe (nothing can contaminate).
    * The build needs no probe ids — only the distinct gram hash set — so the
    * projection is id-less and the ONE frame both passes (sizing count + filter
    * aggregate) read is checkpointed once.
    */
  def buildContaminationBloom(probe: DataFrame,
      probeTextCol: String, ngramWords: Int = 8, fpp: Double = 0.01): Array[Byte] = {
    require(ngramWords > 0, s"ngramWords must be positive, got $ngramWords")
    buildContaminationBloomFromHashes(
      distinctGramHashes(probe, probeTextCol, ngramWords), "_h", fpp)
  }

  /** [[buildContaminationBloom]] from a frame of PRE-COMPUTED gram hashes (e.g. a
    * [[docGramHashes]] materialization, or hashes persisted next to the eval
    * data) — a pipeline that materializes its gram hashes once must not pay a
    * second tokenization pass just to size and fill the filter. NULL hashes (the
    * tokenless-doc placeholder rows [[docGramHashes]] emits) are dropped;
    * duplicates are fine (distinct is applied here, and the sizing count runs on
    * the distinct set, so the filter's fpp target holds). Returns empty bytes
    * when no hashes remain.
    */
  def buildContaminationBloomFromHashes(hashes: DataFrame,
      hashCol: String = "gram_hash", fpp: Double = 0.01): Array[Byte] = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    // One frame, read twice (sizing count + filter aggregate): checkpoint so the
    // upstream — possibly a full tokenizing scan — runs once.
    val distinctHashes = hashes.filter(col(hashCol).isNotNull)
      .select(col(hashCol).as("_h")).distinct().localCheckpoint(true)
    val n = distinctHashes.count()
    if (n == 0L) Array.emptyByteArray
    else {
      val bloom = distinctHashes.stat.bloomFilter("_h", n, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
  }

  /** Flag incoming docs against a STORED contamination Bloom: per non-NULL-id doc,
    * `grams_total`, `grams_flagged` (word n-grams hitting the filter), and
    * `flagged_frac`. ZERO false negatives (a true probe gram always hits — the
    * property a firewall needs) and ~fpp false-positive grams; the exact scrub
    * stays with [[crossCorpusContaminationBloom]], which needs the probe frame.
    * Empty filter bytes flag nothing. Tokenless docs (NULL/empty/whitespace text)
    * report 0 grams and a NULL frac (nothing to assess — not a clean 0.0 verdict);
    * short-but-tokenful docs carry the whole-doc shingle like the rest of the
    * contamination family.
    *
    * Shape: row-local shingle+hash projection, the codegen'd `might_contain`
    * predicate per gram (bits ride the task binary once per executor), one
    * map-side-combined `groupBy(id)` rollup — no joins, nothing probe-sized moves.
    */
  def contaminationFlagsBloom(corpus: DataFrame, bloomBytes: Array[Byte],
      idCol: String, textCol: String, ngramWords: Int = 8): DataFrame =
    contaminationFlagsFromGrams(
      docGramHashes(corpus, idCol, textCol, ngramWords), bloomBytes, idCol)

  /** Per-doc word-shingle gram hashes: one `(idCol, gram_hash)` row per gram —
    * the frame a pipeline materializes ONCE and reuses across the contamination
    * family ([[buildContaminationBloomFromHashes]],
    * [[contaminationFlagsFromGrams]]) and its own exact scrubs, instead of
    * re-tokenizing a 100 TB corpus per consumer. NULL-id docs are excluded (they
    * cannot anchor a per-doc verdict); tokenless docs (NULL/empty/whitespace
    * text) keep ONE row with a NULL `gram_hash` so per-doc rollups still see
    * them — wordShingles' shorter-than-n fallback would otherwise hand them the
    * "" pseudo-gram, the same hazard probeShingleHashes guards on the build
    * side. Short-but-tokenful docs keep the whole-doc shingle (the family's
    * convention, so short probe docs match). Row-local projection: no shuffle,
    * stays inside whole-stage codegen.
    */
  def docGramHashes(corpus: DataFrame, idCol: String, textCol: String,
      ngramWords: Int = 8): DataFrame = {
    require(ngramWords > 0, s"ngramWords must be positive, got $ngramWords")
    corpus.filter(col(idCol).isNotNull)
      .select(col(idCol),
        explode_outer(when(size(tokens(col(textCol))) > 0,
          wordShingleHashes(col(textCol), ngramWords))).as("gram_hash"))
  }

  /** [[contaminationFlagsBloom]]'s rollup half over a PRE-COMPUTED gram-hash
    * frame (shape of [[docGramHashes]]: NULL-hash rows are tokenless docs —
    * counted as 0 grams, NULL frac). Same output, same codegen'd
    * `might_contain`, one map-side-combined rollup; the tokenization cost lives
    * with the caller's materialization.
    */
  def contaminationFlagsFromGrams(grams: DataFrame, bloomBytes: Array[Byte],
      idCol: String, hashCol: String = "gram_hash"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.GraftSqlBridge
    val hit =
      if (bloomBytes.isEmpty) lit(false)
      else GraftSqlBridge.column(BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftSqlBridge.expression(col(hashCol))))
    grams
      .groupBy(col(idCol))
      .agg(count(col(hashCol)).as("grams_total"),
        coalesce(sum(when(col(hashCol).isNotNull && hit, 1L).otherwise(0L)), lit(0L))
          .as("grams_flagged"))
      .select(col(idCol), col("grams_total"), col("grams_flagged"),
        when(col("grams_total") > 0,
          col("grams_flagged").cast("double") / col("grams_total").cast("double"))
          .as("flagged_frac"))
  }

  /** Corpus-wide LINE-level dedup (the C4-style pass): every line of text that
    * appears more than once ANYWHERE in the corpus is kept only at its first
    * occurrence — `(idCol, line-index)` lexicographic order — and removed everywhere
    * else; documents are reassembled with their surviving lines in original order.
    *
    * Output: `idCol`, `textCol` (deduped; NULL text stays NULL, a doc losing every
    * line becomes empty), `lines_total`, `lines_dropped`.
    *
    * Semantics:
    *  - Units split on the literal `sep` ("\n" lines by default, "\n\n" for
    *    paragraph-level dedup) with trailing empties preserved (both engines'
    *    split semantics); reassembly joins with the same separator, so
    *    byte-identical round-trip for untouched docs.
    *  - Lines shorter than `minLineChars` (default 1 — i.e. empty lines) are
    *    STRUCTURAL: always kept, never counted, never claim a first-occurrence slot.
    *    Deduping them would collapse paragraph breaks corpus-wide.
    *  - Rows with a NULL `idCol` have no position in the first-occurrence order:
    *    they are kept verbatim and do not participate in dedup.
    *
    * 100 TB shape: one row-local explode; per-line winners via `groupBy(line)` with
    * `min(struct(id, idx))` — map-side combine collapses each duplicated line to ONE
    * row per input partition before the shuffle, so a line duplicated a billion times
    * costs a billion-row combiner input but only partition-count shuffle rows (the
    * window-function formulation would put all billion in one window partition);
    * then a line-keyed join back and a doc-keyed reassembly groupBy. Two keyed
    * shuffles of the line frame — inherent to corpus-wide dedup.
    */
  def dedupLinesAcrossCorpus(df: DataFrame, idCol: String, textCol: String,
      minLineChars: Int = 1, sep: String = "\n"): DataFrame = {
    require(minLineChars >= 0, s"minLineChars must be >= 0, got $minLineChars")
    require(sep.nonEmpty, "separator must be non-empty")
    // `sep` generalizes the unit: "\n" = C4 line dedup, "\n\n" = paragraph dedup
    // (the same pass at paragraph granularity — how boilerplate blocks spanning
    // multiple lines are actually removed). Split treats it as a LITERAL (quoted
    // into the regex); reassembly joins with the same separator, so untouched docs
    // round-trip byte-identically.
    val sepRe = java.util.regex.Pattern.quote(sep)
    // NULL-id rows bypass the pipeline entirely: they can't hold a first-occurrence
    // slot, and routing them through the reassembly groupBy would MERGE all of them
    // into one output row. They come back verbatim via union, with row-local counts.
    val nullIdRows = df.filter(col(idCol).isNull).select(
      col(idCol),
      col(textCol),
      coalesce(size(split(col(textCol), sepRe, -1)).cast("long"), lit(0L)).as("lines_total"),
      lit(0L).as("lines_dropped"))
    val participates =
      col("_line").isNotNull && length(col("_line")) >= minLineChars
    // Dedup key = (xxhash64, length), NOT the line text: the winner groupBy's partial
    // rows and the flag-back join's build side would otherwise carry every distinct
    // line's FULL text across the shuffle (multi-KB boilerplate lines are exactly
    // what this pass exists for). The length component means a 64-bit collision must
    // also match length — two different equal-length lines colliding is ~L²/2⁶⁴ for L
    // distinct lines; this pass MUTATES text, so unlike the stats-only gram paths the
    // residual risk is called out here rather than silently accepted. NULL for
    // non-participating lines: they never claim a slot and a NULL key joins nothing.
    // xxhash64(NULL) would return the bare seed (one shared value), hence the guard.
    val lines = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("_id"), col(textCol).isNull.as("_null_text"),
        posexplode_outer(split(col(textCol), sepRe, -1)).as(Seq("_idx", "_line")))
      .withColumn("_lk",
        when(participates, struct(xxhash64(col("_line")), length(col("_line")))))
    val winners = lines
      .filter(col("_lk").isNotNull)
      .groupBy(col("_lk"))
      .agg(min(struct(col("_id"), col("_idx"))).as("_w"))
    lines
      .join(winners, Seq("_lk"), "left")
      .withColumn("_keep",
        !participates || struct(col("_id"), col("_idx")) === col("_w"))
      .groupBy(col("_id"), col("_null_text"))
      .agg(
        // Reassemble surviving lines in original order; the sort key struct leads
        // with _idx (unique per doc) so array_sort's lexicographic order is exact.
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("_idx"), col("_line"))))),
          x => x.getField("_line")), sep).as("_text"),
        coalesce(sum(when(col("_idx").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("lines_total"),
        coalesce(sum(when(!col("_keep"), 1L).otherwise(0L)), lit(0L)).as("lines_dropped"))
      .select(
        col("_id").as(idCol),
        when(col("_null_text"), lit(null)).otherwise(col("_text")).as(textCol),
        col("lines_total"), col("lines_dropped"))
      .unionByName(nullIdRows)
  }

  /** Shared front half of the Lee-et-al span family: tokenized docs plus the
    * per-doc POSITIONS of corpus-duplicated token k-grams (a within-doc repeat is a
    * duplicate too, same as the suffix-array formulation). NULL-id rows are
    * excluded from both sides — per-doc spans need an identity, and contributing
    * anonymous grams to the corpus counts while being uncleanable would make the
    * detect and remove passes disagree.
    */
  private def dupGramPositions(df: DataFrame, idCol: String, textCol: String,
      k: Int): (DataFrame, DataFrame) = {
    // SPLITTING tokenizer throughout the span family: the remove half cuts tokens
    // by position and rejoins the survivors, so positions must index DISJOINT
    // source spans — the MATCHING tokenizer's overlapping CJK bigrams would
    // duplicate characters on rebuild. Corpus-scale CJK span dedup is a documented
    // limitation here; use dedupLinesAcrossCorpus (line/paragraph granularity) or
    // the shingle-hash near-dup family (which DO segment) for those scripts.
    val toks = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("_id"), col(textCol).as("_text"),
        whitespaceTokens(col(textCol)).as("_t"))
      .select(col("_id"), col("_text"), col("_t"),
        coalesce(size(col("_t")), lit(0)).as("_n"))
    // Positional gram hashes via the native kernel (one byte-walk per doc; posexplode
    // index IS the gram position — same 0..n−k order the transform(sequence) Column
    // formulation emitted, spec-pinned bit-for-bit in PropertySpec).
    val grams = toks
      .filter(col("_n") >= k)
      .select(col("_id"),
        posexplode(wordGramHashesAt(col("_text"), k, segmented = false))
          .as(Seq("_pos", "_h")))
    val dup = grams.groupBy(col("_h")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("_h")
    (toks, grams.join(dup, Seq("_h"), "leftsemi"))
  }

  /** Exact duplicate-SUBSTRING detection (the suffix-array pass of "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2021, re-expressed for a
    * shared-nothing engine): every token `k`-gram occurring more than once ANYWHERE in
    * the corpus (including twice within one document) marks its positions duplicated;
    * per document, overlapping duplicated-gram windows `[p, p+k)` merge into maximal
    * spans — exactly the ≥k-token substrings shared with other text.
    *
    * Output, one row per non-null-id input doc: `idCol`, `tokens_total`,
    * `dup_positions` (k-gram starts whose gram repeats corpus-wide), `span_count`
    * (maximal merged spans), `covered_tokens` (union size of the duplicated windows),
    * `covered_frac`. Docs with fewer than `k` tokens (incl. empty/NULL text) have no
    * grams and report zeros. Rows with NULL `idCol` are EXCLUDED (documented: per-doc
    * stats need an identity; a NULL group would merge every such doc into one row).
    *
    * Grams are keyed by xxhash64 of the space-joined window (tokens contain no
    * whitespace, so the join is unambiguous); a 64-bit collision could mark a
    * position duplicated spuriously — P(any collision) ≈ G²/2⁶⁵ for G corpus grams,
    * negligible below ~10¹² grams and the standard trade in the published pipelines.
    *
    * 100 TB shape: gram rows are (id, pos, hash) ≈ 28 bytes regardless of text size.
    * Duplicated-gram discovery is `groupBy(hash)` — map-side combine collapses a
    * billion-fold repeated gram to one row per input partition before the shuffle.
    * The flag-back is a broadcast-unfriendly but key-local hash join on the gram
    * hash, then one `groupBy(id)` reassembly; three keyed shuffles of compact rows,
    * no window over data-scale partitions, no driver collection.
    *
    * DELIBERATE two-pass trade: `grams` feeds both the duplicated-hash groupBy and
    * the flag-back join, so the corpus is scanned+tokenized+hashed twice. The
    * alternative — materializing the gram frame (localCheckpoint, as the small
    * probe-side contamination frame does) — writes ~(tokens × 28 B) ≈ several times
    * the corpus's parquet bytes to executor disk; one extra columnar scan + row-local
    * CPU pass is the cheaper side of that trade at every scale we measured (the 10×
    * sweep holds at ~1.4× wall for 10× data). A flag-back via a count-window over the
    * hash would fuse the passes but pins each hot gram's rows to ONE task with no
    * AQE skew mitigation; the join keeps AQE's skew-split available.
    */
  def duplicateTokenSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2 tokens, got $k")
    val (toks, dupPos) = dupGramPositions(df, idCol, textCol, k)
    // Sorted duplicated positions fold left-to-right into maximal merged windows:
    // after each step the open window ends at p+k, so a position within k of its
    // predecessor extends the span by (p - prev) and a farther one opens a new span.
    val init = struct(lit(0L).as("c"), lit(0L).as("s"), lit(Long.MinValue).as("e"))
    val perDoc = dupPos
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("dup_positions"),
        aggregate(
          array_sort(collect_list(col("_pos").cast("long"))),
          init,
          (acc, p) => {
            val fresh = p >= acc.getField("e")
            struct(
              (acc.getField("c") + when(fresh, lit(k.toLong))
                .otherwise(p + lit(k.toLong) - acc.getField("e"))).as("c"),
              (acc.getField("s") + when(fresh, 1L).otherwise(0L)).as("s"),
              (p + lit(k.toLong)).as("e"))
          }).as("_agg"))
    toks.join(perDoc, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("_n").cast("long").as("tokens_total"),
        coalesce(col("dup_positions"), lit(0L)).as("dup_positions"),
        coalesce(col("_agg.s"), lit(0L)).as("span_count"),
        coalesce(col("_agg.c"), lit(0L)).as("covered_tokens"),
        when(col("_n") > 0,
          coalesce(col("_agg.c"), lit(0L)).cast("double") / col("_n").cast("double"))
          .otherwise(lit(0.0)).as("covered_frac"))
  }

  /** The REMOVE half of the Lee-et-al pipeline: [[duplicateTokenSpans]] detects,
    * this rewrites — every token inside a corpus-duplicated ≥k-token span is cut,
    * the survivors are rejoined with single spaces. Output per non-NULL-id row:
    * `idCol`, cleaned `textCol`, `tokens_total`, `tokens_removed`
    * (== the detect pass's `covered_tokens`, spec-pinned).
    *
    * Semantics: cleaned text is WHITESPACE-NORMALIZED (the rebuild joins tokens
    * with single spaces — the same trade `dedupLinesAcrossCorpus` makes per line);
    * a fully-covered doc becomes the empty string, NULL text stays NULL, and
    * NULL-id rows pass through VERBATIM with `tokens_removed` 0 (no identity to
    * attribute spans to; they contribute no grams to the corpus counts either,
    * consistent with the detect pass).
    *
    * 100 TB shape: the detect machinery's compact keyed shuffles, plus a covered-
    * index explode bounded by covered tokens (never corpus tokens), an id-keyed
    * anti-join, and ONE groupBy(id) text reassembly — the same collect-sort-join
    * rebuild as the corpus line dedup, bounded per doc by document size.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2 tokens, got $k")
    Seq("tokens_total", "tokens_removed").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column — rename it (reserved output name)"))
    val (toks, dupPos) = dupGramPositions(df, idCol, textCol, k)
    val covered = dupPos
      .select(col("_id"), explode(sequence(col("_pos"), col("_pos") + (k - 1))).as("_idx"))
      .distinct()
    val tokensPos = toks.select(col("_id"), posexplode(col("_t")).as(Seq("_idx", "_tok")))
    val kept = tokensPos.join(covered, Seq("_id", "_idx"), "left_anti")
    // Struct sort on (_idx, _tok): _idx is unique per doc, so the lexicographic
    // struct order is exactly token order (the dedupLinesAcrossCorpus rebuild).
    val rebuilt = kept.groupBy(col("_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_idx"), col("_tok")))),
        x => x.getField("_tok")), " ").as("_clean"))
    val removedPer = covered.groupBy(col("_id")).agg(count(lit(1)).as("_removed"))
    val nullIdRows = df.filter(col(idCol).isNull)
      .select(col(idCol), col(textCol),
        coalesce(size(whitespaceTokens(col(textCol))), lit(0)).cast("long").as("tokens_total"),
        lit(0L).as("tokens_removed"))
    toks.join(rebuilt, Seq("_id"), "left").join(removedPer, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        when(col("_t").isNull, lit(null)).otherwise(coalesce(col("_clean"), lit("")))
          .as(textCol),
        col("_n").cast("long").as("tokens_total"),
        coalesce(col("_removed"), lit(0L)).as("tokens_removed"))
      .unionByName(nullIdRows)
  }

  /** Probe-side (probe_id, gram-hash) pairs, one row per distinct gram per doc,
    * materialized once (localCheckpoint) — every contamination path consumes it at
    * least twice (hash set / filter build + the per-doc scoring join).
    *
    * `size(tokens) > 0` is also the null-text filter: tokens(null) is null, and a
    * null comparison drops the row. Docs with ZERO tokens (empty/whitespace-only/null
    * text) contribute no grams on either side and are absent from the output —
    * without the guard, every empty doc would share the empty pseudo-gram and score
    * 100% contamination against any empty corpus row.
    */
  private def probeShingleHashes(probe: DataFrame, probeIdCol: String,
      probeTextCol: String, ngramWords: Int): DataFrame =
    probe
      .filter(size(tokens(col(probeTextCol))) > 0)
      .select(col(probeIdCol).as("probe_id"),
        explode(wordShingleHashes(col(probeTextCol), ngramWords)).as("_h"))
      .localCheckpoint(true)

  /** Corpus-side gram hashes as a pure row-local projection — the corpus NEVER
    * shuffles here; whatever filter follows decides what little of it moves.
    */
  private def corpusGramHashes(corpus: DataFrame, corpusTextCol: String,
      ngramWords: Int): DataFrame =
    fanOut(corpus)
      .filter(size(tokens(col(corpusTextCol))) > 0)
      .select(explode(wordShingleHashes(col(corpusTextCol), ngramWords)).as("_h"))

  /** Per-probe-doc rollup: `probe_id`, `ngrams_total` (distinct grams in the doc),
    * `ngrams_matched`, `contamination` (= matched/total).
    */
  private def scoreContamination(probeShingles: DataFrame, matched: DataFrame): DataFrame =
    probeShingles
      .join(matched.withColumn("_hit", lit(1L)), Seq("_h"), "left")
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("ngrams_total"),
        sum(coalesce(col("_hit"), lit(0L))).as("ngrams_matched"))
      .withColumn("contamination",
        col("ngrams_matched").cast("double") / col("ngrams_total").cast("double"))

  /** Connected components over an undirected pair graph: every id is labeled with the
    * MINIMUM id reachable through the pairs — the canonical duplicate-cluster id (unlike
    * [[dedupNearMinhash]]'s greedy pairwise drop, chains a-b, b-c collapse into ONE
    * cluster rooted at a). Distributed path: large-star/small-star alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") — each round is
    * two groupBy-join passes over the current edge set and the edge set contracts
    * toward stars rooted at each component's minimum, converging in O(log n) rounds
    * even on adversarial long-chain graphs (where naive min-label propagation needs
    * diameter rounds). No driver-side graph past the `smallGraphEdges` fast path.
    */
  def clustersFromPairs(ids: DataFrame, pairs: DataFrame, idCol: String,
      maxIters: Int = 20, smallGraphEdges: Long = 1000000L): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b")).cache()
    val nPairs = p.count()
    // Verified near-dup edge sets are orders smaller than the corpus: up to
    // `smallGraphEdges` pairs union-find runs on the driver in one collect — no
    // iteration, one broadcast join back. Integral ids collect as specialized
    // (Long, Long) tuples (~48 B/edge incl. array slot ⇒ ~50 MB at the 1M default);
    // other id types fall back to boxed Rows (~150 B/edge), which the same default
    // keeps under ~150 MB of driver heap. Past the threshold, fall through to the
    // distributed min-label loop (shuffles proportional to the dup subgraph).
    if (nPairs <= smallGraphEdges) {
      val idField = ids.schema(idCol)
      val spark = ids.sparkSession
      val isIntegral = idField.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      val labelDf: DataFrame = if (isIntegral) {
        import spark.implicits._
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
          r
        }
        p.select(col("id_a").cast("long"), col("id_b").cast("long")).as[(Long, Long)]
          .collect().foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
          }
        val labels = parent.keys.toArray.map(k => (k, find(k)))
        spark.createDataset(labels.toSeq).toDF(idCol, "_cc_label")
          .select(col(idCol).cast(idField.dataType).as(idCol),
            col("_cc_label").cast(idField.dataType).as("_cc_label"))
      } else {
        val parent = scala.collection.mutable.HashMap.empty[Any, Any]
        def find(x: Any): Any = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          // path compression
          var c = x
          while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
          r
        }
        val ord = orderingFor(idField.dataType)
        p.collect().foreach { row =>
          val (ra, rb) = (find(row.get(0)), find(row.get(1)))
          if (ra != rb) {
            if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
          }
        }
        val labelRows = parent.keys.toSeq.map(k => Row(k, find(k)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(labelRows, 1),
          StructType(Seq(idField.copy(name = idCol), idField.copy(name = "_cc_label"))))
      }
      p.unpersist()
      return ids.select(col(idCol))
        .join(broadcast(labelDf), Seq(idCol), "left")
        .select(col(idCol), coalesce(col("_cc_label"), col(idCol)).as("cluster_id"))
    }
    // Ids are compared with least/greatest below, which is only min-semantics-correct
    // for totally ordered comparable types (the integral/string/float ids orderingFor
    // accepts — evaluated for its type check even on this path).
    orderingFor(ids.schema(idCol).dataType)

    // --- large-star/small-star alternation over the dup subgraph only ---
    // Edges kept canonically oriented (hi, lo) with hi > lo; self-loops dropped.
    def canonical(e: DataFrame): DataFrame =
      e.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
        .distinct()

    // large-star: every node u links its LARGER neighbors to m(u) = min(Γ(u) ∪ {u}) —
    // long tails hook directly onto the current minimum, halving chain depth per round.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = nbrs.groupBy(col("src").as("u"))
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      canonical(nbrs.join(m, nbrs("src") === m("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")))
    }

    // small-star: every node u links its SMALLER neighbors (and itself) to the minimum
    // of that set — stars flatten so every member points at the root.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
      val withM = e.join(m, e("src") === m("u"))
      canonical(
        withM.select(col("dst").as("src"), col("m").as("dst"))
          .union(withM.select(col("src"), col("m").as("dst"))))
    }

    var edges = canonical(p.select(col("id_a").as("src"), col("id_b").as("dst"))).cache()
    val nEdges = edges.count() // materialize before iterating
    // Theoretical convergence is O(log n) alternation rounds; the effective cap scales
    // with log2 of the edge count so the distributed path (which only engages above
    // `smallGraphEdges` edges) can never be starved by a fixed default that was tuned
    // on small graphs. `maxIters` acts as a floor, not a ceiling.
    val iterCap = math.max(maxIters, 2 * (64 - java.lang.Long.numberOfLeadingZeros(nEdges + 1)) + 6)
    var converged = false
    var it = 0
    while (!converged && it < iterCap) {
      // One round = large-star then small-star; localCheckpoint truncates the plan
      // lineage (it doubles per round otherwise) and the returned blocks are reclaimed
      // by the ContextCleaner when unreferenced, unlike session-pinned cache entries.
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // Fixpoint when the canonical edge sets are identical: same size and no edge of
      // `next` outside `edges` (both are distinct sets, so size + containment ⇒ equal).
      val sameSize = next.count() == edges.count()
      converged = sameSize &&
        next.join(edges, Seq("src", "dst"), "left_anti").isEmpty
      edges.unpersist()
      edges = next
      it += 1
    }
    if (!converged)
      log.warn(s"clustersFromPairs: star contraction hit the iteration cap ($iterCap) " +
        "without converging — returned cluster_ids may split components (theoretical " +
        "rounds are O(log n), so raise maxIters).")
    // At fixpoint every edge is (member, root) and src values are unique. If the cap
    // was hit first, a node can still carry several edges — collapse to the minimum
    // per node so the output honors the one-row-per-id contract either way (labels may
    // split components then, per the warning, but never duplicate ids).
    val labelEdges =
      if (converged) edges
      else edges.groupBy(col("src")).agg(min(col("dst")).as("dst"))
    val finalLabels = labelEdges.select(col("src").as("id"), col("dst").as("cluster"))
      .localCheckpoint(true)
    edges.unpersist()
    p.unpersist()
    // Singletons (no edges) are their own cluster.
    ids.select(col(idCol))
      .join(finalLabels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster"), col(idCol)).as("cluster_id"))
  }

  /** Min-comparison for driver-side union-find over untyped id values. */
  // java.sql.Date is Comparable[java.util.Date] (via its superclass), so a
  // self-referential bound wouldn't fit — an erased Comparable[Any] cast does.
  private val comparableOrdering: Ordering[Any] =
    Ordering.fromLessThan((a: Any, b: Any) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)

  private def orderingFor(dt: DataType): Ordering[Any] = (dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Ordering.by((x: Any) => x.asInstanceOf[Number].longValue())
    case FloatType | DoubleType =>
      Ordering.by((x: Any) => x.asInstanceOf[Number].doubleValue())
    case StringType => Ordering.by((x: Any) => x.asInstanceOf[String])
    // All totally ordered id types both paths handle: least/greatest are
    // min-semantics-correct for these, and the boxed union-find just needs an Ordering.
    case _: DecimalType | DateType | TimestampType => comparableOrdering
    case other => throw new IllegalArgumentException(s"unsupported id type for clustering: $other")
  }): Ordering[Any]

  /** Near-duplicate clusters over documents: MinHash-LSH candidates → exact-Jaccard
    * verification → connected components. Returns (id, cluster_id) for every input row;
    * singleton rows are their own cluster.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int = 5, numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val pairs = nearDupPairsMinhash(df, idCol, textCol, threshold, shingleSize, numHashes, bands)
    clustersFromPairs(df.select(col(idCol)), pairs.select("id_a", "id_b"), idCol)
  }

  /** End-user embedding near-dup DEDUP (mirror of [[dedupNearMinhash]]): drop the
    * higher id of every cosine-verified near-dup pair, keep everything else. Same
    * keep-lowest-id rule; candidates from hyperplane LSH, exact-cosine verified.
    */
  def dedupNearEmbedding(
      df: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      planes: Int = 8, tables: Int = 1, maxBucketSize: Int = 10000): DataFrame = {
    val drop = nearDupPairsEmbedding(df, idCol, vecCol, dim, threshold, planes,
        tables, maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Exact all-pairs n-gram Jaccard (the verification baseline — quadratic; only for
    * modest corpora or as ground truth in tests). Shingles compared as 64-bit hashes,
    * same as [[exactJaccard]].
    */
  def allPairsJaccard(df: DataFrame, idCol: String, textCol: String, shingleSize: Int = 5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingleHashSet(col(textCol), shingleSize).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token hashes.
    * Row-local; bit arithmetic via a tight Scala UDF (the per-row loop over 64 bits has
    * no vectorizable Column form; the UDF is still one projection, no shuffle).
    */
  private def simhashOf(tokens: Seq[String], tokenHash: String => Long): Long =
    if (tokens == null || tokens.isEmpty) 0L
    else {
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val h = tokenHash(t)
        var i = 0
        while (i < 64) { if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1; i += 1 }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
      out
    }

  private def murmurTokenHash(t: String): Long = {
    var h = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong << 32
    h | (scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xffffffffL)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token), big-endian — i.e. the first 16 hex chars of the
    * standard digest string. Slower than murmur but reproducible in any engine with an
    * `md5()` function (the oracle path).
    */
  private def md5TokenHash(t: String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  val simhash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (tokens: Seq[String]) => simhashOf(tokens, murmurTokenHash) }

  /** Engine-portable simhash (md5 token hash) — bit-identical to what a SQL oracle can
    * reproduce; default [[simhash64]] (murmur) is the fast path.
    */
  val simhash64Md5: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (tokens: Seq[String]) => simhashOf(tokens, md5TokenHash) }

  def withSimhash(df: DataFrame, textCol: String, out: String = "simhash",
      tokenHasher: String = "murmur3"): DataFrame = {
    val sh = tokenHasher match {
      case "murmur3" => simhash64
      case "md5"     => simhash64Md5
      case other     => throw new IllegalArgumentException(s"unknown token hasher: $other")
    }
    df.withColumn(out, sh(tokens(col(textCol))))
  }

  /** Near-dup pairs by SimHash: 4×16-bit band blocking (any identical band ⇒ candidate,
    * guaranteeing recall for Hamming distance <= 3), then exact Hamming verify via
    * bit_count(xor).
    */
  def nearDupPairsSimhash(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, tokenHasher: String = "murmur3",
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be non-negative")
    // Zero-token docs (null/empty/whitespace text) all sketch to simhash 0 — without
    // this filter every such pair is a "near-duplicate" at Hamming 0 and the band
    // self-join goes quadratic in their count.
    val docs = df.select(col(idCol).as("id"), col(textCol))
      .filter(size(tokens(col(textCol))) > 0)
    val hashed = withSimhash(fanOut(docs), textCol, tokenHasher = tokenHasher)
      .select(col("id"), col("simhash").as("_h64"))
    bandedHammingPairs(hashed, maxHamming, maxBucketSize)
  }

  /** Shared back half of every 64-bit-sketch near-dup operator (SimHash text,
    * perceptual image hashes): band the long into 4×16 bits, bucket-join on exact
    * band matches (pigeonhole: any pair within Hamming ≤ 3 shares at least one
    * band), verify with a codegen'd `bit_count(xor)`. Input: (`id`, `_h64`).
    *
    * 100 TB shape: only (band, bits, id, h) rows cross the shuffle; the oversized-
    * band guard (windowed count over the same exchange — same rationale as
    * minhashCandidatePairs) drops degenerate buckets a boilerplate/monochrome pile
    * would otherwise turn quadratic.
    */
  private[operators] def bandedHammingPairs(hashed: DataFrame, maxHamming: Int,
      maxBucketSize: Int, newFlagCol: Option[String] = None,
      dedup: Boolean = true): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be non-negative")
    // Warn HERE, not per caller: every 64-bit-sketch path (SimHash text, image
    // aHash, audio hash, their incremental variants, future sketches) shares the
    // 4x16 banding and thus the same partial-recall cliff past Hamming 3.
    if (maxHamming > 3)
      log.warn(s"bandedHammingPairs: maxHamming=$maxHamming exceeds the 4x16-bit " +
        "banding guarantee (full recall only for Hamming <= 3) — pairs with a " +
        "differing bit in every band are never candidates, so recall is partial")
    // Incremental mode: `newFlagCol` names a boolean marking fresh-batch rows; only
    // pairs touching at least one fresh row are emitted (never old x old — previous
    // runs already emitted those). Same banding, guard, and verify either way: ONE
    // implementation, so the recall contract can't drift between the full and
    // incremental paths.
    val flag = newFlagCol.toSeq.map(col)
    val banded = hashed.select(Seq(col("id"), col("_h64")) ++ flag :+
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("_h64"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
      }: _*)).as("bb"): _*)
      .select(Seq(col("id"), col("_h64")) ++ flag ++
        Seq(col("bb.band").as("band"), col("bb.bits").as("bits")): _*)
      .repartition(col("band"), col("bits"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("band"), col("bits"))))
      .filter(col("_n") <= maxBucketSize).drop("_n")
    def side(sfx: String) = banded.select(Seq(col("band"), col("bits"),
      col("id").as(s"id_$sfx"), col("_h64").as(s"h_$sfx")) ++
      newFlagCol.map(c => col(c).as(s"_flag_$sfx")): _*)
    val joined = side("a").join(side("b"), Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
    val cut = newFlagCol.fold(joined)(_ => joined.filter(col("_flag_a") || col("_flag_b")))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      // Hamming cut BEFORE the dedup exchange (guide §2.3 — shuffle fewer bytes):
      // on a real corpus most banding collisions fail the cut, and rows dropped
      // here never enter the distinct's shuffle of the pipeline's largest
      // intermediate. filter∘distinct ≡ distinct∘filter for a deterministic
      // row-local predicate, so results are unchanged.
      .filter(col("hamming") <= maxHamming)
    // `dedup = false` skips the pair-level distinct for consumers that feed the
    // pairs straight into their OWN duplicate-insensitive aggregation (min/
    // count-of-groups — the video clip rollup): the caller's partial aggregate
    // absorbs the ≤ bands-fold band-collision duplicates map-side. Measured
    // round 15: Spark 4.1's RemoveRedundantAggregates was already eliding this
    // distinct under such rollups (identical plans either way) — the parameter
    // makes the contract explicit instead of relying on that rule. Pair-SET
    // consumers (image/audio/simhash dedup, where the output IS the pair list)
    // keep the default distinct.
    if (dedup) cut.distinct() else cut
  }

  // ---------- embedding near-dup ----------

  /** Cosine similarity of two float-array columns, computed in double. Native codegen'd
    * Catalyst expression ([[graft.functions.CosineSim]]): one fused loop over both
    * `UnsafeArrayData` inputs inside whole-stage codegen — no UDF boxing of every
    * candidate pair's arrays, no interpreted higher-order-function lambdas.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.cosine(a, b)

  /** Random-hyperplane LSH bucket id: sign bits of dot products with `planes`
    * deterministic pseudo-random hyperplanes, packed into a long. Row-local single-pass
    * UDF; plane generation order matches [[Similarity.bucketOf]] (same seed ⇒ same
    * buckets driver-side and executor-side).
    */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    val planeVecs = planesFor(dim, planes, seed)
    val f = udf { (v: Seq[java.lang.Float]) =>
      if (v == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(bucketFor(v, dim, planeVecs))
    }
    f(vec)
  }

  /** One table's hyperplanes: `planes` Gaussian vectors drawn from `Random(seed)` in
    * plane-major order. [[Similarity.bucketOf]] calls this (not a re-implementation),
    * so the same seed yields the same buckets driver-side and executor-side by
    * construction.
    */
  private[graft] def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private[graft] def bucketFor(v: Seq[java.lang.Float], dim: Int,
      planeVecs: Array[Array[Double]]): Long = {
    // Fail loud on a length mismatch: silently truncating to min(len, dim) would
    // bucket on a PREFIX while the cosine verify uses the full vector (silent
    // recall loss), and the driver-side Similarity.bucketOf uses the probe's full
    // length — the two sides would compute different buckets with no error.
    require(v.length == dim,
      s"embedding length ${v.length} != declared dim $dim")
    var bucket = 0L
    var p = 0
    while (p < planeVecs.length) {
      val w = planeVecs(p)
      var dot = 0.0
      var i = 0
      // Null ELEMENTS contribute 0 to the dot product — the same per-element skip the
      // native CosineSim verify makes, so bucketing and verification see one vector
      // semantics (a boxed-unbox NPE here would kill the task with no row context).
      while (i < dim) { val x = v(i); if (x != null) dot += x.toDouble * w(i); i += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** All `tables` hyperplane bucket ids of a vector in one row-local pass (one UDF
    * invocation, one traversal of the plane set — no per-table re-boxing of the
    * vector). Table t draws its planes from `seed + t`, so table 0 reproduces
    * [[hyperplaneBucket]]'s buckets exactly.
    */
  def hyperplaneBuckets(vec: Column, dim: Int, planes: Int, tables: Int,
      seed: Long = 42L): Column = {
    val tablePlanes: Array[Array[Array[Double]]] =
      Array.tabulate(tables)(t => planesFor(dim, planes, seed + t))
    val f = udf { (v: Seq[java.lang.Float]) =>
      if (v == null) null
      else tablePlanes.map(p => bucketFor(v, dim, p))
    }
    f(vec)
  }

  /** Embedding near-dup pairs: bucket by hyperplane signature, verify cosine within
    * buckets. `planes` trades recall for bucket size (expected bucket fraction
    * 2^-planes); `tables` independent plane sets union their candidates (like
    * MinHash's bands) — recall for a pair at angle θ is 1-(1-(1-θ/π)^planes)^tables,
    * so a single 8-plane table measurably misses pairs near the threshold while
    * tables=4 recovers them.
    *
    * 100 TB shape, mirroring [[minhashCandidatePairs]]+[[exactJaccard]]: only
    * (table, bucket, id) rows — not the float vectors — cross the bucket shuffle and
    * self-join; an oversized-bucket guard (windowed count over the same exchange)
    * drops degenerate buckets (all-zero / near-identical vector piles, or planes ≪
    * log₂ n) that would otherwise make the self-join quadratic; vectors are joined
    * back per side only for the surviving distinct id pairs, then cosine-verified.
    */
  def nearDupPairsEmbedding(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, planes: Int = 8, tables: Int = 1,
      maxBucketSize: Int = 10000): DataFrame = {
    require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
    require(tables >= 1, s"tables must be positive, got $tables")
    val docs = fanOut(df).select(col(idCol).as("id"), col(vecCol).as("v"))
    // Vector lookup side for the verify joins: one explicit shuffle on the id so
    // ReuseExchange feeds both the id_a and id_b joins from a single materialization
    // (same rationale as exactJaccard's shingle side).
    val vecs = docs.select(col("id").as("_vid"), col("v")).repartition(col("_vid"))
    // Null vectors bucket to null and posexplode drops them — a null embedding can
    // never cosine-verify anyway, and without the drop every null would need a
    // null-safe join to even pair up.
    val bucketed = docs
      .select(col("id"),
        posexplode(hyperplaneBuckets(col("v"), dim, planes, tables)).as(Seq("table", "bucket")))
      // Guard shape identical to minhashCandidatePairs: one explicit shuffle on the
      // bucket key reused by the windowed count and both join sides; the window sees
      // ~20-byte (table, bucket, id) rows, never the vectors.
      .repartition(col("table"), col("bucket"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("table"), col("bucket"))))
      .filter(col("_n") <= maxBucketSize).drop("_n")
    val a = bucketed.select(col("table"), col("bucket"), col("id").as("id_a"))
    val b = bucketed.select(col("table"), col("bucket"), col("id").as("id_b"))
    // Distinct BEFORE the vector join: a pair sharing buckets in several tables must
    // fetch vectors and run the cosine kernel once, not `tables` times.
    val idPairs = a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    idPairs
      .join(vecs.withColumnRenamed("_vid", "id_a").withColumnRenamed("v", "v_a"), "id_a")
      .join(vecs.withColumnRenamed("_vid", "id_b").withColumnRenamed("v", "v_b"), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Persistable hyperplane-LSH bucket index of an embedding corpus: one
    * `(id, table, bucket)` row per table per vector — the embedding analog of
    * [[minhashIndex]], and the state that makes embedding dedup INCREMENTAL. Write
    * once for the standing corpus, then each batch buckets ITS OWN vectors only and
    * joins [[incrementalEmbeddingPairs]] against the stored rows. Identical
    * (dim, planes, tables, seed) for index build and every batch, or buckets cannot
    * match (not detectable from the index itself — the caller owns that contract).
    * Null vectors are dropped (they can never cosine-verify; their bucket is null).
    */
  def embeddingBucketIndex(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int = 8, tables: Int = 1, seed: Long = 42L): DataFrame = {
    require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")
    require(tables >= 1, s"tables must be positive, got $tables")
    fanOut(df.filter(col(vecCol).isNotNull))
      .select(col(idCol).as("id"),
        posexplode(hyperplaneBuckets(col(vecCol), dim, planes, tables, seed))
          .as(Seq("table", "bucket")))
      .select("id", "table", "bucket")
  }

  /** LSH candidate pairs for an incremental embedding batch: pairs among `newDocs`
    * plus pairs between `newDocs` and the corpus behind `index` (from
    * [[embeddingBucketIndex]], SAME parameters). Old×old pairs are gated out inside
    * the banded join — previous runs already emitted them. The windowed
    * `maxBucketSize` guard runs over the COMBINED buckets, so a degenerate bucket
    * (all-zero vector piles) cannot go quadratic no matter which side fills it.
    * Verify with [[cosineVerifyPairs]] over a vectors frame covering both corpora.
    */
  def incrementalEmbeddingCandidates(newDocs: DataFrame, index: DataFrame,
      idCol: String, vecCol: String, dim: Int, planes: Int = 8, tables: Int = 1,
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    require(Seq("id", "table", "bucket").forall(index.columns.contains),
      s"index must have (id, table, bucket) columns, got ${index.columns.mkString(", ")}")
    val newBuckets = embeddingBucketIndex(newDocs, idCol, vecCol, dim, planes,
      tables, seed).withColumn("_new", lit(true))
    val all = newBuckets
      .unionByName(index.select(col("id"), col("table"), col("bucket"))
        .withColumn("_new", lit(false)))
      .repartition(col("table"), col("bucket"))
    val bounded = all
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("table"), col("bucket"))))
      .filter(col("_n") <= maxBucketSize)
    val a = bounded.select(col("table"), col("bucket"), col("id").as("id_a"),
      col("_new").as("_new_a"))
    val b = bounded.select(col("table"), col("bucket"), col("id").as("id_b"),
      col("_new").as("_new_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b") && (col("_new_a") || col("_new_b")))
      .select("id_a", "id_b").distinct()
  }

  /** Cosine verification of candidate id pairs: `allVecs` is semi-joined down to
    * ids that actually appear in a pair before any shuffle, so the corpus is
    * scanned but only candidate vectors move (the embedding analog of
    * [[exactJaccard]]'s semi-join restriction; one explicit id shuffle feeds both
    * pair-join sides through ReuseExchange). NOTE: `pairs` is consumed three times —
    * pass a MATERIALIZED frame, as [[incrementalEmbeddingPairs]] does.
    */
  def cosineVerifyPairs(pairs: DataFrame, allVecs: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val wanted = pairs.select(col("id_a").as("_vid"))
      .union(pairs.select(col("id_b").as("_vid"))).distinct()
    val vecs = fanOut(allVecs).select(col(idCol).as("_vid"), col(vecCol).as("_v"))
      .join(wanted, Seq("_vid"), "left_semi").repartition(col("_vid"))
    pairs
      .join(vecs.withColumnRenamed("_vid", "id_a").withColumnRenamed("_v", "v_a"), "id_a")
      .join(vecs.withColumnRenamed("_vid", "id_b").withColumnRenamed("_v", "v_b"), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** End-to-end incremental embedding near-dup pairs: guarded candidates against the
    * stored index, cosine-verified ≥ `threshold`. `allVecs` must cover BOTH corpora.
    */
  def incrementalEmbeddingPairs(newDocs: DataFrame, index: DataFrame,
      allVecs: DataFrame, idCol: String, vecCol: String, dim: Int, threshold: Double,
      planes: Int = 8, tables: Int = 1, seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame = {
    val cands = incrementalEmbeddingCandidates(newDocs, index, idCol, vecCol, dim,
      planes, tables, seed, maxBucketSize).localCheckpoint(true)
    cosineVerifyPairs(cands, allVecs, idCol, vecCol, threshold)
  }

  /** SEMANTIC decontamination: flag every corpus row whose embedding reaches
    * cosine `threshold` against ANY eval-set vector — the embedding-space
    * complement of the n-gram firewall ([[contaminationFlagsBloom]]), for the
    * paraphrased/re-worded eval leakage that shares no word n-gram with the
    * benchmark text. Output: one row per FLAGGED corpus id — `(idCol,
    * eval_hits, max_cosine, nearest_eval_id)` — hit-proportional, never
    * corpus-sized; left-join it back on `idCol` for a land/quarantine split
    * (what [[graft.streaming.StreamingAnalysis.semanticGateSink]] does).
    *
    * 100 TB shape — the corpus NEVER shuffles: the eval set (benchmarks,
    * typically 1e3–1e6 rows) is hyperplane-bucketed and BROADCAST twice (the
    * (table, bucket) → eval-id map, then the eval-id → vector map); the corpus
    * computes its buckets row-local, hash-joins the broadcast bucket table at
    * the scan, cosine-verifies row-local against the broadcast vectors, and
    * only the per-doc hit rollup (a few rows per FLAGGED doc) reaches an
    * exchange. A pair colliding in several tables recomputes the (row-local)
    * cosine rather than shuffling vectors through a distinct — the groupBy
    * collapses the duplicates. Recall is the LSH family's
    * 1-(1-(1-θ/π)^planes)^tables ([[nearDupPairsEmbedding]]): raise `tables`
    * for near-threshold pairs. A degenerate EVAL bucket past `maxBucketSize`
    * (e.g. an eval set of near-identical template variants bucketing
    * together) fails LOUD at build time — unlike the dedup family's
    * best-effort candidate guards, a firewall must not shed coverage
    * silently.
    *
    * NULL corpus ids are excluded (they cannot anchor a per-doc verdict — the
    * [[docGramHashes]] convention). Malformed eval frames fail LOUD, never
    * narrow silently (a silently narrower firewall lands contaminated docs
    * with no error anywhere): a NULL-id eval row (its hits could not be
    * attributed) and an eval bucket over `maxBucketSize` (its vectors would
    * stop protecting; raise the limit — the cost is up to bucket-size hits per
    * matching corpus row — or raise `planes` to split the pile) both throw.
    * NULL vectors on either side never flag. Zero-norm vectors follow the
    * family's NaN convention in Spark: NaN compares greater than any
    * threshold, so zero-vs-zero flags — filter them upstream if that is not
    * wanted.
    */
  def semanticContaminationFlags(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, evalIdCol: String, evalVecCol: String,
      dim: Int, threshold: Double, planes: Int = 8, tables: Int = 1,
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame =
    semanticContaminationFlagsIndexed(corpus,
      buildSemanticEvalIndex(evalSet, evalIdCol, evalVecCol, dim, planes,
        tables, seed, maxBucketSize),
      idCol, vecCol, threshold)

  /** The prepared eval side of [[semanticContaminationFlags]]: validated,
    * guarded, and MATERIALIZED once (localCheckpoint), carrying its own LSH
    * geometry so the corpus side cannot drift from it. Build once per eval
    * set — a standing gate ([[graft.streaming.StreamingAnalysis
    * .semanticGateSink]]) reuses it every micro-batch instead of re-running
    * the null-id check, the bucket build, and the size guard per batch.
    */
  final case class SemanticEvalIndex private[operators] (
      buckets: DataFrame, vecs: DataFrame,
      dim: Int, planes: Int, tables: Int, seed: Long)

  /** Validate + bucket + materialize an eval set for
    * [[semanticContaminationFlagsIndexed]]. Fails loud on NULL eval ids and on
    * any bucket over `maxBucketSize` — both would silently shrink the
    * firewall's coverage otherwise (see [[semanticContaminationFlags]]).
    */
  def buildSemanticEvalIndex(evalSet: DataFrame, evalIdCol: String,
      evalVecCol: String, dim: Int, planes: Int = 8, tables: Int = 1,
      seed: Long = 42L, maxBucketSize: Int = 10000): SemanticEvalIndex = {
    // Eval frames are benchmark-sized; these guard jobs are tiny, and the
    // failures they prevent are silent protection gaps.
    require(evalSet.filter(col(evalIdCol).isNull).limit(1).isEmpty,
      s"evalSet has rows with NULL $evalIdCol — their hits could not be " +
        "attributed and the rows would silently not protect; assign ids or " +
        "filter them explicitly")
    val buckets = embeddingBucketIndex(evalSet, evalIdCol, evalVecCol, dim,
        planes, tables, seed)
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("table"), col("bucket"))))
      .localCheckpoint(true)
    val oversized = buckets.filter(col("_n") > maxBucketSize)
      .select(col("table"), col("bucket"), col("_n")).limit(1).collect()
    require(oversized.isEmpty, {
      val r = oversized.head
      s"eval bucket (table=${r.get(0)}, bucket=${r.get(1)}) holds ${r.get(2)} " +
        s"vectors > maxBucketSize=$maxBucketSize — dropping it would silently " +
        "stop protecting those eval vectors. Raise maxBucketSize (cost: up to " +
        "bucket-size hits per matching corpus row) or raise planes to split " +
        "the pile"
    })
    SemanticEvalIndex(
      buckets.select(col("table"), col("bucket"), col("id").as("_eid")),
      evalSet.filter(col(evalVecCol).isNotNull)
        .select(col(evalIdCol).as("_eid"), col(evalVecCol).as("_evec"))
        .localCheckpoint(true),
      dim, planes, tables, seed)
  }

  /** Persist a validated [[SemanticEvalIndex]] — the semantic firewall's
    * store-don't-recompute contract, like [[buildContaminationBloom]]'s bytes:
    * build once next to the eval data, [[loadSemanticEvalIndex]] each
    * session/stream start with no eval rescan and no re-validation. Layout:
    * `<dir>/buckets` + `<dir>/vectors` parquet and a `_graft_semantic` marker
    * pinning the LSH geometry (a load under a different geometry fails loud —
    * its corpus-side buckets could never match the stored ones, a silent
    * zero-recall firewall). NOT atomic: a crash mid-save leaves a torn store —
    * save into a fresh directory and swap, or re-run the save.
    */
  def saveSemanticEvalIndex(index: SemanticEvalIndex, dir: String): Unit = {
    index.buckets.write.mode("overwrite").parquet(s"$dir/buckets")
    index.vecs.write.mode("overwrite").parquet(s"$dir/vectors")
    // marker LAST: a first-save crash leaves no marker and the load fails loud
    writeSemanticMarker(index.buckets.sparkSession, dir,
      geometryOf(index.dim, index.planes, index.tables, index.seed))
  }

  /** Load a [[saveSemanticEvalIndex]] store. The caller restates the geometry
    * it expects (the corpus side will bucket with it); a mismatch with the
    * pinned marker — or a directory that is not a saved semantic index — fails
    * loud instead of returning an index that can never match anything.
    */
  def loadSemanticEvalIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      dim: Int, planes: Int = 8, tables: Int = 1, seed: Long = 42L): SemanticEvalIndex = {
    val expected = geometryOf(dim, planes, tables, seed)
    val stored = readSemanticMarker(spark, dir).getOrElse(throw new IllegalArgumentException(
      s"$dir has no _graft_semantic marker — not a saved semantic eval index " +
        "(or a save crashed before completing); rebuild with saveSemanticEvalIndex"))
    require(stored == expected,
      s"semantic index at $dir was built with [$stored] but this load expects " +
        s"[$expected] — buckets across geometries can never match (zero-recall " +
        "firewall); reload with the stored geometry or rebuild the index")
    // Materialize at load, like the build path: a standing gate broadcasts
    // these frames every micro-batch and must not re-read the store each time.
    SemanticEvalIndex(spark.read.parquet(s"$dir/buckets").localCheckpoint(true),
      spark.read.parquet(s"$dir/vectors").localCheckpoint(true),
      dim, planes, tables, seed)
  }

  private def geometryOf(dim: Int, planes: Int, tables: Int, seed: Long): String =
    s"semantic dim=$dim planes=$planes tables=$tables seed=$seed"

  private def writeSemanticMarker(spark: org.apache.spark.sql.SparkSession,
      dir: String, params: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_semantic")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(params.getBytes("UTF-8")) finally out.close()
  }

  private def readSemanticMarker(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_semantic")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** [[semanticContaminationFlags]] over a prepared [[SemanticEvalIndex]] —
    * the per-batch body: corpus buckets row-local with the INDEX's geometry,
    * broadcast-joins the eval maps at the scan, row-local cosine, one
    * hit-proportional rollup.
    */
  def semanticContaminationFlagsIndexed(corpus: DataFrame,
      evalIndex: SemanticEvalIndex, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // An out-of-range threshold (85 for 85%, say) can never match: the
    // firewall would be silently inert, the worst failure mode this family
    // has. Cosine NaN (zero-norm) still flags under this bound by Spark's
    // NaN-is-greatest comparison — documented above.
    require(threshold >= -1 && threshold <= 1,
      s"threshold must be a cosine in [-1, 1], got $threshold")
    import evalIndex.{dim, planes, tables, seed}
    fanOut(corpus).filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).as("_cvec"),
        posexplode(hyperplaneBuckets(col(vecCol), dim, planes, tables, seed))
          .as(Seq("table", "bucket")))
      .join(broadcast(evalIndex.buckets), Seq("table", "bucket"))
      .join(broadcast(evalIndex.vecs), Seq("_eid"))
      .select(col(idCol), col("_eid"), cosine(col("_cvec"), col("_evec")).as("_cos"))
      .filter(col("_cos") >= threshold)
      .groupBy(col(idCol), col("_eid")).agg(max(col("_cos")).as("_cos"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("eval_hits"),
        max(col("_cos")).as("max_cosine"),
        max_by(col("_eid"), struct(col("_cos"), col("_eid"))).as("nearest_eval_id"))
  }
}
