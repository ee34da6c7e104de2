package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot 10× scale-sweep datapoint for the LLM-pipeline operators (dev harness; not
  * part of the library surface).
  *
  * Builds a synthetic "sf1" from sf0.1 by replicating `documents` / `embeddings` 10×
  * in a way that keeps the workload HONEST at 10× rather than degenerate:
  *
  *  - documents: doc_id offset by replica; every token salted with the replica index
  *    (`regexp_replace(text, "(\\S+)", "$1⟨r⟩")`). Within a replica the duplicate /
  *    near-duplicate structure is byte-identical to the original; across replicas the
  *    shingle sets are disjoint (Jaccard 0), so near-dup pairs grow exactly 10×, not
  *    quadratically (10 verbatim copies of every doc would mean 45 extra exact-dup
  *    pairs PER DOC — a 45× harder workload masquerading as 10× data).
  *  - embeddings: vec_id offset by replica; a per-replica deterministic sign-flip of
  *    coordinates (flip i iff xxhash64(r, i) is odd). Sign flips are an orthogonal
  *    transform, so intra-replica cosine structure and norms are preserved EXACTLY,
  *    while cross-replica cosines decorrelate to ~0 (masks differ on ~half the
  *    coordinates) — again linear, not quadratic, growth in near-pairs.
  *
  * Measures each headline query at sf0.1 (after a JIT warmup pass) and at the
  * synthetic sf1, prints the ratio against the reference's 10×-data ⇒ <15×-time bound
  * (BASELINE.md), and appends one JSON line per query to PROGRESS.jsonl.
  *
  * Usage: `runMain graft.tools.ScaleSweep [--keep]`
  */
object ScaleSweep {
  private val Queries = Seq(
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "dedup_near_kept_documents",
    "dedup_clusters_documents",
    "dedup_simhash_documents",
    "dedup_embedding_pairs",
    "contamination_probe_documents",
    "contamination_bloom_documents",
    "shard_packing_documents",
    "stratified_sample_documents",
    "unicode_nfc_documents",
    "chunk_documents",
    "drift_psi_documents",
    "dedup_lines_documents",
    "dedup_spans_documents",
    "similarity_topk_embeddings",
    "similarity_ivf_topk",
    // round-6 corpus-stats/assembly headliners: bigram-LM trains+scores over the
    // replicated corpus (vocab grows 10× — replica-salted tokens are disjoint — so
    // the gram-keyed joins see a 10× key space: linear, the honest shape); tfidf is
    // the same two-pass explode+join family; interleave exercises the prefix-fold
    // path at 10× partitions. dedup_paragraphs is skipped: machinery-identical to
    // the swept dedup_lines.
    "lm_surprisal_documents",
    "tfidf_top_terms_documents",
    "interleave_sources_documents",
    // events-family headliners (events replicate as 10× NEW USERS with identical
    // per-user streams — window work scales by group count, the honest shape;
    // verbatim row copies would instead deepen every per-user window 10×):
    // monotonic_global is the un-keyed boundary-fold plan (the scale-critical
    // one), sessions/time_gaps the keyed-window family, grouped_percentiles the
    // per-group exact sort.
    "monotonic_global_events",
    "sessions_events",
    "time_gaps_events",
    "grouped_percentiles_events",
    // round-7 join operators: asof is the union+keyed-window carry (10× users ⇒
    // more window groups, the honest shape); range_join's bin equi-join sees 10×
    // points AND 10× intervals — pair output grows ~10× (new users' windows),
    // the linear-in-output shape a bin join must hold.
    "asof_join_events",
    "range_join_events",
    // the range-partitioned ECDF boundary fold (distinct-value counts grow ~10×)
    "ks_drift_events",
    // grouped-window drift family: per-type ECDF windows and the day-keyed PSI
    // joins both scale by group/day count × distinct values, the honest shape
    "ks_by_type_events",
    "psi_series_events",
    // round-7 additions over replicated tables: ecdf exercises the boundary fold +
    // the value-keyed join-back at 10× rows (distinct values unchanged — replicas
    // repeat the same streams — counts grow 10×, the honest shape for ties);
    // equi-depth runs the sketch+bracket quantile operator plus a counting scan at
    // 10×; kappa's cost is the row-local langId kernel over 10× docs (its shuffle
    // is category²-bounded). fuzzy_pairs_customer is NOT sweepable here: customer
    // is not a replicated table.
    "ecdf_normalize_events",
    "equidepth_histogram_events",
    "cohens_kappa_langid_documents",
    // budget selection is the withRunningTotal fold over 10× docs under the SAME
    // 10k-token budget — the partitions-past-the-boundary short-circuit should
    // make the selection pass CHEAPER per row as data grows (most tasks no-op);
    // hll_rollup is one map-side-combined sketch scan whose shuffle carries one
    // ~12 KiB sketch per (partition × group), invariant in row count.
    "budget_select_documents",
    "hll_rollup_events",
    // per-source quotas: same fold, but exhaustion happens per group — at 10× docs
    // every source fills its 500-token quota early and the tail drops with one
    // map lookup per row; driver state stays partitions × 20 sources.
    "budget_select_by_source_documents",
    // equi-depth PSI: the sketch+bracket quantile pass over the 10× reference half
    // plus two counting scans — all bounded-shuffle; bucketing is row-local.
    "psi_equidepth_events",
    // span REMOVAL adds the covered-index explode + groupBy(id) text rebuild on
    // top of the detect machinery; replica-salted tokens keep replicas disjoint,
    // so only the planted header is corpus-duplicated at 10× — the honest shape.
    "dedup_spans_removed_documents",
    // the data card: one codegen'd scan + bounded groupBys + the quantile operator
    // over 10× docs (vocab-independent — everything is per-doc or per-category).
    "corpus_report_documents",
    // round-9 crawl/media ingestion: every one is a row-local encode+parse per doc
    // feeding a single-row agg — cost is strictly per-row (codec walks, record
    // walks, the HTML kernel), no shuffle grows with data. The honest expectation
    // is ~linear work on 32 already-saturated cores.
    "audio_meta_documents",
    "warc_records_documents",
    "html_extract_documents",
    "warc_html_pipeline_documents",
    // round-10 crawl-surface additions: charset-aware decode (per-row codec
    // walk + strict-UTF-8 pass), digest/revisit explode, and the link-density
    // main-text kernel — all row-local encode+parse feeding single-row aggs,
    // same honest ~linear shape as the round-9 ingestion family
    "warc_charset_documents",
    "warc_digest_dedup_documents",
    "html_main_text_documents",
    // round-11 crawl-surface additions: brotli decode (both stream shapes +
    // a corrupt member) and truncation recovery (WARC-Truncated + cut-gzip
    // prefix keep) — row-local encode+decode per doc, same ~linear shape
    "warc_brotli_documents",
    "warc_truncated_documents",
    // CJK segmentation through tokens/shingles/contamination on constructed
    // pages — row-local kernels feeding bounded aggs
    "cjk_tokens_documents",
    "cjk_dedup_documents")
  // bloom_join_lineitem_orders is NOT sweepable here: the synthetic 10× dir holds
  // only documents/embeddings/events (lineitem 10× is built separately for the
  // suite20 datapoint); its scale story is the spec-pinned pre-shuffle filter.

  /** Run the sweep against `src` on an existing session, returning
    * (name, smallSec, bigSec, ratio) per headliner plus the suite20 10× datapoint.
    * Callable from [[graft.Bench]] so the ratios land in the per-round bench JSON
    * (scale regressions gate automatically) as well as from the standalone main.
    */
  def run(spark: SparkSession, src: String,
      keep: Boolean = false): Seq[(String, Double, Double, Double)] = {
    val out = s"/tmp/graft-sf1-${ProcessHandle.current().pid()}"
    try {
      build10x(spark, src, out)
      val d10 = spark.read.parquet(s"$out/documents.parquet").count()
      val e10 = spark.read.parquet(s"$out/embeddings.parquet").count()
      println(s"[sweep] synthetic 10x at $out: documents=$d10 embeddings=$e10")

      // SPARK_GRAFT_SWEEP_ONLY=a,b,c restricts to a subset — profiling one
      // regression must not pay the full 40-query sweep.
      val subset = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      val selected = subset.fold(Queries)(s => Queries.filter(s))
      val results = selected.map { name =>
        val fn = SparkEntry.queries(name)
        // Symmetric warmup on BOTH inputs: each measured run is the second read of its
        // dataset, so parquet footer/metadata caching and codegen/JIT are paid equally
        // — otherwise the sf1 side eats first-read costs and every ratio biases high.
        time(fn(spark, src))
        time(fn(spark, out))
        var small = time(fn(spark, src))
        var big = time(fn(spark, out))
        // Retry once when the ratio looks bad: a single GC pause / JIT deopt in
        // EITHER measured run fabricates a regression (round 8 published an 11x
        // for corpus_report that re-measured isolated at 0.9x). min-of-2 on both
        // sides only for suspicious ratios keeps the sweep cheap in the common case.
        if (big / small > 3.0) {
          small = math.min(small, time(fn(spark, src)))
          big = math.min(big, time(fn(spark, out)))
        }
        val ratio = big / small
        val verdict = if (ratio < 15.0) "ok" else "EXCEEDS 15x BOUND"
        println(f"[sweep] $name%-34s 1x $small%7.2f s   10x $big%7.2f s   ratio ${ratio}%5.1fx  $verdict")
        // Localize a watch-zone ratio when an operator-only arm exists: the op
        // arm's own ratio separates "the operator plan degrades at scale" from
        // "the oracle-verify scaffolding does" (round-14: contamination_bloom
        // read 9.25x with no way to tell which side carried it).
        if (ratio > 6.0) graft.Queries.operatorArms.get(name).foreach { arm =>
          time(arm(spark, src)); time(arm(spark, out)) // symmetric warmup
          val oS = time(arm(spark, src)); val oB = time(arm(spark, out))
          val opR = oB / oS
          // no baked-in verdict: an op ratio NEAR the full ratio means the
          // operator plan itself degrades — the exact case this print detects
          val reading =
            if (opR < 0.8 * ratio) "gap is the verify side"
            else "OPERATOR plan itself scales poorly"
          println(f"[sweep-model] $name operator-only 1x $oS%7.2f s   10x $oB%7.2f s" +
            f"   op_ratio $opR%5.1fx (full ${ratio}%5.1fx — $reading)")
        }
        (name, small, big, ratio)
      }
      // Headline-workload scaling: the 20-constraint suite over 10× lineitem.
      // Verbatim replication is sound here (unlike the dedup tables): the suite is
      // pure per-row aggregation, so copies scale the work without changing shape.
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      (0 until 10).map(_ => li).reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      val li1 = spark.read.parquet(s"$src/lineitem.parquet")
      val li10 = spark.read.parquet(s"$out/lineitem.parquet")
      def suite(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        require(graft.Bench.suite20(df).metrics.totalConstraints == 20)
        (System.nanoTime() - t0) / 1e9
      }
      suite(li1); suite(li10) // symmetric warmup
      val s1 = suite(li1); val s10 = suite(li10)
      println(f"[sweep] suite20_lineitem                   1x $s1%7.2f s   10x $s10%7.2f s   ratio ${s10 / s1}%5.1fx")
      val all = results :+ ("suite20_lineitem_10x", s1, s10, s10 / s1)
      val worst = all.maxBy(_._4)
      println(f"[sweep] worst ratio: ${worst._1} at ${worst._4}%.1fx (bound 15x)")
      all
    } finally {
      if (keep) println(s"[sweep] kept synthetic corpus at $out")
      else {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(out)).deleteRecursively()
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val keep = args.contains("--keep")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try appendProgress(run(spark, src, keep))
    finally spark.stop()
  }

  private def time(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.collect() // collect, not count: count() over lazy aggregates prunes the work
    (System.nanoTime() - t0) / 1e9
  }

  private[tools] def build10x(spark: SparkSession, src: String, out: String): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    // Offsets keep ids unique across replicas while replica 0 keeps the originals
    // (the similarity probe row vec_id=0 must survive).
    val docStride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val embStride = embs.agg(max(col("vec_id"))).head().getLong(0) + 1
    val docReps = (0 until 10).map { r =>
      docs.select(
        Seq(
          (col("doc_id") + lit(r.toLong * docStride)).as("doc_id"),
          (if (r == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", "$1" + r)).as("text")) ++
        docs.columns.filterNot(c => c == "doc_id" || c == "text").map(col): _*)
    }
    // n_chars tracks the salted text so the replica table stays internally consistent.
    docReps.map(_.withColumn("n_chars", length(col("text")).cast("long")))
      .reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val embReps = (0 until 10).map { r =>
      embs.select(
        Seq(
          (col("vec_id") + lit(r.toLong * embStride)).as("vec_id"),
          (if (r == 0) col("embedding")
           else expr(s"transform(embedding, (x, i) -> CASE WHEN pmod(xxhash64($r, i), 2) = 0 THEN x ELSE cast(-x AS FLOAT) END)")
          ).as("embedding")) ++
        embs.columns.filterNot(c => c == "vec_id" || c == "embedding").map(col): _*)
    }
    embReps.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // events: replica r = a fresh user population repeating the same per-user
    // streams in the same time range (how real traffic scales) — windows see 10×
    // GROUPS of unchanged depth; ts/event_type/value/props pass through. ts is
    // normalized the same way Queries.t does (the fixture has shipped as BOTH
    // TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across driver regenerations — a raw
    // read would crash the standalone sweep on a nanos generation); the synthetic
    // table is then written as plain TIMESTAMP, which t() passes through.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events0 = spark.read.parquet(s"$src/events.parquet")
    val events = events0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        events0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        events0.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events0
    }
    // one scan for both strides; an empty/all-NULL fixture skips replication
    // cleanly instead of NPE-ing on getLong
    val strides = events.agg(max(col("event_id")), max(col("user_id"))).head()
    if (!strides.isNullAt(0) && !strides.isNullAt(1)) {
      val evStride = strides.getLong(0) + 1
      val userStride = strides.getLong(1) + 1
      val evReps = (0 until 10).map { r =>
        events.select(
          Seq(
            (col("event_id") + lit(r.toLong * evStride)).as("event_id"),
            (col("user_id") + lit(r.toLong * userStride)).as("user_id")) ++
          events.columns.filterNot(c => c == "event_id" || c == "user_id").map(col): _*)
      }
      evReps.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    } else events.write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  private def appendProgress(results: Seq[(String, Double, Double, Double)]): Unit = {
    val ts = System.currentTimeMillis() / 1000.0
    // Locale.ROOT: the default-locale f interpolator renders 6.40 as "6,40" on
    // comma-decimal locales, corrupting the JSON line.
    def n(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val lines = results.map { case (name, small, big, ratio) =>
      s"""{"ts": ${n(ts, 1)}, "kind": "scale_sweep", "query": "$name", "sf01_s": ${n(small, 3)}, "sf1_s": ${n(big, 3)}, "ratio": ${n(ratio, 2)}, "bound": 15.0}"""
    }
    val path = java.nio.file.Paths.get("/root/repo/PROGRESS.jsonl")
    java.nio.file.Files.write(path, (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND, java.nio.file.StandardOpenOption.CREATE)
  }
}
