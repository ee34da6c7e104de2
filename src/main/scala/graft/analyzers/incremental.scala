package graft.analyzers

import graft.core.MetricValue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Persistence of analyzer states keyed by (analyzerKey, partitionKey)
  * (reference: analyzers/incremental/state_store.rs:20-90).
  */
trait StateStore {
  def save(analyzerKey: String, partitionKey: String, fields: Map[String, String]): Unit
  def load(analyzerKey: String, partitionKey: String): Option[Map[String, String]]
  def listPartitions(analyzerKey: String): Seq[String]
  def delete(analyzerKey: String, partitionKey: String): Unit
}

final class InMemoryStateStore extends StateStore {
  private val m = scala.collection.concurrent.TrieMap.empty[(String, String), Map[String, String]]
  def save(a: String, p: String, f: Map[String, String]): Unit = m((a, p)) = f
  def load(a: String, p: String): Option[Map[String, String]] = m.get((a, p))
  def listPartitions(a: String): Seq[String] = m.keys.collect { case (`a`, p) => p }.toSeq.sorted
  def delete(a: String, p: String): Unit = m.remove((a, p))
}

/** Hadoop-FS-backed store (works on local paths, HDFS, s3a://, gs://) — one properties
  * file per (analyzer, partition). States are tiny (sufficient statistics), so driver-side
  * point reads/writes are the right scale trade-off.
  * (reference: FileSystemStateStore, analyzers/incremental/state_store.rs.)
  */
final class FileSystemStateStore(rootDir: String, spark: SparkSession) extends StateStore {
  private val conf = spark.sparkContext.hadoopConfiguration
  private def pathOf(a: String, p: String) =
    new Path(rootDir, s"${sanitize(a)}/${sanitize(p)}.state")
  // URL-encoding is INJECTIVE — a lossy replaceAll("[^safe]", "_") mapped distinct
  // keys ("p:1" vs "p_1") onto one file, silently overwriting one partition's state
  // with another's. Decoding in listPartitions restores the original keys.
  private def sanitize(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def unsanitize(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def save(a: String, p: String, fields: Map[String, String]): Unit = {
    val path = pathOf(a, p)
    val fs = path.getFileSystem(conf)
    // Write-temp-then-rename-OVERWRITE: a crash (or a reader racing the writer) must
    // never see a TRUNCATED state file — Codec.decode throws on a half-written line —
    // and must never see the file MISSING either: a delete-then-rename pair has a
    // window where load() returns None, which the incremental runner's replay check
    // would misread as "fresh partition" and double-count the cumulative.
    // FileContext.rename(OVERWRITE) replaces the target atomically on HDFS/local; on
    // object stores it is copy-of-a-complete-object, which still never exposes a
    // partial or missing file.
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(Codec.encode(fields).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, conf)
      .rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
  def load(a: String, p: String): Option[Map[String, String]] = {
    val path = pathOf(a, p)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) None
    else {
      // exists→open is a TOCTOU window: a concurrent delete (e.g. another runner's
      // legacy-key migration) between the two must read as "no state" per the Option
      // contract, not abort the whole run with FileNotFoundException.
      val in = try fs.open(path) catch {
        case _: java.io.FileNotFoundException => return None
      }
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(Codec.decode(new String(bytes.toByteArray, StandardCharsets.UTF_8)))
      } finally in.close()
    }
  }
  def listPartitions(a: String): Seq[String] = {
    val dir = new Path(rootDir, sanitize(a))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).filter(_.endsWith(".state"))
      .map(n => unsanitize(n.stripSuffix(".state"))).sorted
  }
  def delete(a: String, p: String): Unit = {
    val path = pathOf(a, p)
    val fs = path.getFileSystem(conf)
    fs.delete(path, false); ()
  }

  private object Codec {
    // line-oriented k<TAB>v with URL-encoding — no external JSON dependency needed.
    def encode(m: Map[String, String]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "\t" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("\n")
    def decode(s: String): Map[String, String] =
      s.split("\n").filter(_.nonEmpty).map { line =>
        val Array(k, v) = line.split("\t", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
  }
}

/** Incremental analysis: compute the new partition's state, merge with the stored
  * cumulative state, persist, and emit the metric over all data seen so far — without
  * rescanning history (reference: analyzers/incremental/runner.rs:117-470).
  */
final class IncrementalAnalysisRunner(store: StateStore, analyzers: Seq[Analyzer[_]]) {

  private val CumulativeKey = "__cumulative__"
  private val NullKey = "__null__"

  // State migration from an analyzer's legacy key format (e.g. pre-"|"
  // CorrelationAnalyzer, unparameterized QuantileAnalyzer keys): data partitions under
  // a legacy key MOVE to the current key so incremental history survives the rename.
  // RESUMABLE: each partition is moved independently (save to the new key, then
  // delete the legacy entry — never delete what wasn't read and re-saved), so a crash
  // mid-migration leaves the remaining legacy partitions to be picked up by the next
  // run instead of stranding them behind a "new key is non-empty" guard. A partition
  // present under BOTH keys keeps the new key's record (it is newer by construction).
  // Legacy CUMULATIVE records are deleted, not moved — the stamped-count rebuild
  // machinery regenerates the cumulative from the migrated partitions — and only in a
  // run that actually migrated data partitions: a store holding ONLY a legacy
  // cumulative (data partitions pruned externally) keeps it, because that record is
  // the sole survivor of its history and nothing under the new key can regenerate it.
  // (A crash exactly between the last partition delete and the cumulative delete
  // leaves one inert legacy cumulative behind — harmless, never read.) A legacy key
  // claimed by MORE THAN ONE analyzer in this runner is ambiguous — e.g. the pre-"|"
  // "correlation.a.b.c" could belong to ("a","b.c") or ("a.b","c") — so it is left in
  // place rather than attributed to whichever analyzer migrates first. Checked once
  // per analyzer per runner instance — directory listings, not data scans.
  // NOTE: MetricsRepository history is NOT migrated; metric series recorded under a
  // legacy key restart under the new key (documented break, acceptable pre-1.0).
  private val migrationChecked = scala.collection.mutable.Set.empty[String]
  private lazy val ambiguousLegacyKeys: Set[String] =
    analyzers.flatMap(_.legacyKeys.distinct).groupBy(identity)
      .collect { case (k, claims) if claims.size > 1 => k }.toSet
  private def ensureMigrated(): Unit = migrationChecked.synchronized {
    analyzers.foreach { a =>
      if (migrationChecked.add(a.key)) {
        a.legacyKeys.filterNot(ambiguousLegacyKeys).foreach { lk =>
          val legacyParts = store.listPartitions(lk).filterNot(_ == CumulativeKey)
          if (legacyParts.nonEmpty) {
            val existing = store.listPartitions(a.key).toSet
            legacyParts.foreach { p =>
              store.load(lk, p) match {
                case Some(f) =>
                  if (!existing.contains(p)) store.save(a.key, p, f)
                  store.delete(lk, p)
                case None => () // unreadable: leave in place, never erase unmoved data
              }
            }
            // Drop the legacy cumulative only once every legacy data partition has
            // been migrated (unreadable stragglers keep it for the next attempt).
            if (store.listPartitions(lk).forall(_ == CumulativeKey))
              store.delete(lk, CumulativeKey)
          }
        }
      }
    }
  }

  /** Data partitions currently in the store for an analyzer — `listPartitions` minus
    * the reserved cumulative entry (the `__null__` sentinel IS a data partition: it
    * holds the null-keyed rows' state). Feed THIS to [[analyzePartitions]]; raw
    * `store.listPartitions` includes `__cumulative__`, which would double every metric.
    */
  def dataPartitions(analyzerKey: String): Seq[String] = {
    ensureMigrated()
    store.listPartitions(analyzerKey).filterNot(_ == CumulativeKey)
  }

  /** Rebuild an analyzer's cumulative state as the merge of ALL stored data-partition
    * states and persist it. Deriving the cumulative from the per-partition states —
    * instead of folding each new state into it — makes every write path idempotent:
    * replaying a partition (at-least-once `foreachBatch`) or re-analyzing it with
    * corrected data overwrites that partition's state and can never double-count.
    */
  // The cumulative record is stamped with how many partition states produced it, so
  // the fast fold path can detect a stale cumulative (deleted partitions, legacy or
  // crash-window records) with one directory listing.
  private val NPartsField = "__nparts"

  private def rebuildCumulative(a: Analyzer[_]): Option[Any] = {
    val states = dataPartitions(a.key)
      .flatMap(p => store.load(a.key, p)).map(a.stateFromFields)
    val merged = states.reduceOption((x, y) => a.mergeAnyStates(x, y))
    merged.foreach(m => store.save(a.key, CumulativeKey,
      a.fieldsOfAnyState(m) + (NPartsField -> states.size.toString)))
    merged
  }

  /** Advance the cumulative state after `fresh` partition states were saved. FRESH keys
    * (the common streaming path) FOLD into the stored cumulative — O(1) store reads,
    * where the full rebuild is O(all partitions) per call and made long-lived
    * incremental sinks quadratic in total I/O. Any REPLAYED key (it already existed —
    * its old state is being overwritten, so the stored cumulative includes a
    * contribution that must not be double-counted) falls back to the full idempotent
    * rebuild. A crash between a partition save and this fold is also safe: the retry
    * sees the key as replayed and rebuilds.
    */
  private def updateCumulative(a: Analyzer[_], fresh: Seq[Any], anyReplayed: Boolean): Option[Any] =
    if (anyReplayed) rebuildCumulative(a)
    else {
      val curFields = store.load(a.key, CumulativeKey)
      // Consistency check before trusting the fold: after the fresh saves, the
      // cumulative's stamped producer count + |fresh| must equal the actual partition
      // listing. A mismatch means partitions were DELETED (store.delete is public —
      // the old cumulative would propagate their contribution forever), or the
      // record predates the stamp, or a crash hit the save window — rebuild instead.
      // One directory listing; the fold stays O(1) point reads on the common path.
      val actual = dataPartitions(a.key).size.toLong
      val consistent =
        curFields.flatMap(_.get(NPartsField)).map(_.toLong).contains(actual - fresh.size) ||
          (curFields.isEmpty && actual == fresh.size)
      if (!consistent) rebuildCumulative(a)
      else {
        val cur = curFields.map(a.stateFromFields)
        val merged = (cur.toSeq ++ fresh).reduceOption((x, y) => a.mergeAnyStates(x, y))
        merged.foreach(m => store.save(a.key, CumulativeKey,
          a.fieldsOfAnyState(m) + (NPartsField -> actual.toString)))
        merged
      }
    }

  /** Analyze one new partition; returns metrics over (history ∪ partition). All
    * analyzers' states come from ONE scan of the partition (AnalysisRunner batching) —
    * the per-analyzer-scan shape the reference fell back to is a linear job-count tax.
    * Idempotent under replay of the same `partitionKey` (see [[rebuildCumulative]]).
    */
  /** Whether any analyzer already has stored state under `partitionKey` — lets sinks
    * distinguish a first ingest from an overwrite (replay or checkpoint-reset
    * collision) before committing. One point-read, short-circuiting.
    */
  def hasPartitionState(partitionKey: String): Boolean =
    analyzers.exists(a => store.load(a.key, partitionKey).isDefined)

  def analyzePartition(df: DataFrame, partitionKey: String): Map[String, MetricValue] = {
    require(partitionKey != CumulativeKey && partitionKey != NullKey,
      s"partition key '$partitionKey' collides with a reserved state-store key")
    ensureMigrated()
    val ctx = new AnalysisRunner(analyzers, continueOnError = false).run(df)
    // Materialize EVERY analyzer's state AND its rendered fields before the first save:
    // a failed analyzer (or a toFields that throws) must abort the whole call with the
    // store untouched, not after earlier analyzers already committed (a retry would
    // then double-count them).
    val newStates = analyzers.map(a => (a, ctx.states(a.key)))
    val rendered = newStates.map { case (a, s) => (a, s, a.fieldsOfAnyState(s)) }
    val replayed = analyzers.map(a => a.key -> store.load(a.key, partitionKey).isDefined).toMap
    rendered.foreach { case (a, _, f) => store.save(a.key, partitionKey, f) }
    rendered.map { case (a, s, _) =>
      a.key -> a.metricFromAnyState(updateCumulative(a, Seq(s), replayed(a.key)).getOrElse(s))
    }.toMap
  }

  /** Analyze MANY new partitions in ONE scan: `groupBy(partitionExpr)` computes every
    * analyzer's state aggregates per partition simultaneously (map-side combined, one
    * shuffle bounded by the partition-key cardinality), then each row's states are
    * saved and folded into the cumulative state driver-side. The per-partition-call
    * alternative ([[analyzePartition]] in a loop) costs P scans of the new data — a
    * linear job-count tax that dominates at real partition counts. States merge in a
    * commutative monoid, so fold order doesn't affect results.
    *
    * `maxPartitions` guards the driver collect, mirroring the grouped-metrics
    * `max_groups` guard: exceeding it throws rather than silently truncating.
    *
    * Contract difference from [[analyzePartition]]: partition keys are DISCOVERED from
    * the data here, so an empty input records nothing (there are no keys to record),
    * whereas analyzePartition is told its key explicitly and records that partition's
    * zero-valued state.
    */
  def analyzePartitionsBatched(df: DataFrame, partitionExpr: org.apache.spark.sql.Column,
      maxPartitions: Int = 10000): Map[String, MetricValue] = {
    val allAggs = analyzers.flatMap(_.stateAggregates).zipWithIndex
      .map { case (c, i) => c.as(s"a$i") }
    require(allAggs.nonEmpty, "no analyzers")
    ensureMigrated()
    // Group on the raw (nullable) string key — mapping NULL through coalesce would
    // make a real '__null__' partition value collide with the null sentinel and
    // double-count after the merge. NULL keys get the sentinel driver-side instead,
    // and real values equal to either reserved key fail loud (mirroring the
    // maxPartitions policy) rather than overwriting the cumulative state.
    val rows = df.groupBy(partitionExpr.cast("string").as("__pk"))
      .agg(allAggs.head, allAggs.drop(1): _*)
      .limit(maxPartitions + 1)
      .collect()
    require(rows.length <= maxPartitions,
      s"more than $maxPartitions partitions in one batch — raise maxPartitions or split the input")
    // Validate EVERY key before the first store.save: failing mid-loop would leave
    // earlier partitions already folded into the cumulative state, and a retry after
    // fixing the data would double-count them.
    rows.foreach { row =>
      require(row.isNullAt(0) ||
        (row.getString(0) != CumulativeKey && row.getString(0) != NullKey),
        s"partition key value '${row.getString(0)}' collides with a reserved state-store key")
    }
    // Construct EVERY partition's every state AND its rendered field map before the
    // first save (stateFromValues and toFields can both throw, e.g. on an unexpected
    // aggregate value) — failing mid-save would leave the store partially updated and
    // a retry would have stale cumulative inputs.
    val partStates = rows.sortBy(r => if (r.isNullAt(0)) NullKey else r.getString(0)).map { row =>
      val pk = if (row.isNullAt(0)) NullKey else row.getString(0)
      val values = row.toSeq.drop(1)
      var offset = 0
      pk -> analyzers.map { a =>
        val vs = values.slice(offset, offset + a.stateAggregates.size)
        offset += a.stateAggregates.size
        val s = a.stateFromValues(vs)
        (a, s, a.fieldsOfAnyState(s))
      }
    }
    // Replay detection BEFORE the saves overwrite the evidence. ONE listing per
    // analyzer, not P×A point-reads: the exists() only short-circuits when a replay
    // IS found, so the common all-fresh path would otherwise load every partition
    // state file (100k driver-side FS reads at 10k partitions × 10 analyzers).
    val replayed = analyzers.map { a =>
      val existing = store.listPartitions(a.key).toSet
      a.key -> partStates.exists { case (pk, _) => existing(pk) }
    }.toMap
    partStates.foreach { case (pk, ss) =>
      ss.foreach { case (a, _, f) => store.save(a.key, pk, f) }
    }
    // Fresh keys fold into the cumulative; any replayed key triggers the full
    // idempotent rebuild (see updateCumulative).
    analyzers.zipWithIndex.foreach { case (a, i) =>
      updateCumulative(a, partStates.toSeq.map(_._2(i)._2), replayed(a.key))
    }
    currentMetrics()
  }

  /** Metrics over a chosen subset of stored partitions (fan-out merge,
    * reference: runner.rs:250-458).
    */
  def analyzePartitions(partitionKeys: Seq[String]): Map[String, MetricValue] = {
    ensureMigrated()
    analyzers.flatMap { a =>
      val states = partitionKeys.flatMap(p => store.load(a.key, p)).map(a.stateFromFields)
      states.reduceOption((x, y) => a.mergeAnyStates(x, y))
        .map(s => a.key -> a.metricFromAnyState(s))
    }.toMap
  }

  /** Current cumulative metrics without touching any data. */
  def currentMetrics(): Map[String, MetricValue] = {
    ensureMigrated()
    analyzers.flatMap { a =>
      // Trust the stored cumulative only when its producer-count stamp matches the
      // actual partition listing; otherwise (migration just added partitions, records
      // were deleted, pre-stamp record) rebuild from the partition states.
      val cur = store.load(a.key, CumulativeKey)
      val actual = dataPartitions(a.key).size.toLong
      val state =
        if (actual > 0 && cur.flatMap(_.get(NPartsField)).map(_.toLong).contains(actual))
          cur.map(a.stateFromFields)
        else rebuildCumulative(a)
      state.map(s => a.key -> a.metricFromAnyState(s))
    }.toMap
  }
}
