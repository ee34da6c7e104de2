package graft

import graft.operators.{AsOf, Joins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join and range (interval) join. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, 100), ("A", 20L, 200), ("A", 25L, 250), ("B", 5L, 50), ("B", 30L, 300))
    .toDF("sym", "t", "qty")
  private def quotes = Seq(
    ("A", 8L, 1.0), ("A", 20L, 2.0), ("A", 21L, 3.0), ("B", 29L, 9.0))
    .toDF("sym", "qt", "px")

  test("asofJoin keyed backward: latest at-or-before, inclusive ties, unmatched NULL") {
    val out = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"),
      matchedTimeCol = Some("mt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(("A", 10L)) == (Some(1.0), Some(8L)))
    assert(out(("A", 20L)) == (Some(2.0), Some(20L)), "equal instant is inclusive")
    assert(out(("A", 25L)) == (Some(3.0), Some(21L)))
    assert(out(("B", 5L)) == (None, None), "before first quote: left row kept, NULL payload")
    assert(out(("B", 30L)) == (Some(9.0), Some(29L)))
    assert(out.size == 5, "every left row exactly once")
  }

  test("asofJoin forward + tolerance + NULL-time semantics") {
    val fwd = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"), forward = true)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(fwd(("A", 10L)).contains(2.0), "earliest at-or-after")
    assert(fwd(("A", 20L)).contains(2.0), "inclusive at the instant")
    assert(fwd(("A", 25L)).isEmpty, "no later quote")
    assert(fwd(("B", 5L)).contains(9.0))
    // tolerance: A@25's match (21) is 4 old — tolerance 3 discards it, keeps the row
    val tol = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"),
      tolerance = Some(lit(3L)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(tol(("A", 25L)).isEmpty && tol(("A", 20L)).contains(2.0))
    assert(tol.size == 5)
    // NULL left time never matches; NULL right time is dropped, not "earliest"
    val nl = Seq(("A", Option.empty[Long], 1)).toDF("sym", "t", "qty")
    val nr = quotes.unionByName(Seq(("A", Option.empty[Long], 99.0)).toDF("sym", "qt", "px"))
    val out = AsOf.asofJoin(nl, nr, Seq("sym"), "t", "qt", Seq("px")).collect()
    assert(out.length == 1 && out(0).isNullAt(3))
    // forward mode must not leak a match to a NULL-time left row either (desc
    // ordering parks NULLs LAST — the carry state there holds a real match)
    val outF = AsOf.asofJoin(nl, nr, Seq("sym"), "t", "qt", Seq("px"), forward = true).collect()
    assert(outF.length == 1 && outF(0).isNullAt(3))
    val outG = AsOf.asofJoin(nl.drop("sym"), nr.drop("sym"), Nil, "t", "qt", Seq("px")).collect()
    assert(outG.length == 1 && outG(0).isNullAt(2), "global path: NULL time never matches")
    // a right row with a NULL payload VALUE still wins the carry (state goes NULL)
    val nullPx = Seq(("A", 9L, Option.empty[Double])).toDF("sym", "qt", "px")
    val carried = AsOf.asofJoin(trades.filter($"sym" === "A"),
      quotes.unionByName(nullPx), Seq("sym"), "t", "qt", Seq("px"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(carried(10L).isEmpty, "NULL-payload quote at t=9 must replace px=1.0, not be skipped")
  }

  test("asofJoin global (un-keyed) matches the keyed plan on a constant key") {
    val rng = new scala.util.Random(7)
    val left = (1 to 5000).map(_ => (rng.nextInt(100000).toLong, rng.nextInt(1000)))
      .toDF("t", "v").withColumn("k", lit(1))
    val right = (1 to 800).map(_ => (rng.nextInt(100000).toLong, rng.nextDouble()))
      .toDF("rt", "price").withColumn("k", lit(1))
    def canon(df: DataFrame) = df.select("t", "v", "price", "mt")
      .collect().map(_.toSeq).sortBy(_.toString)
    val keyed = canon(AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price"),
      matchedTimeCol = Some("mt")))
    val global = canon(AsOf.asofJoin(left.drop("k"), right.drop("k"), Nil, "t", "rt",
      Seq("price"), matchedTimeCol = Some("mt")))
    assert(keyed.length == 5000 && global.length == 5000)
    assert(keyed.sameElements(global),
      "distributed range-partitioned carry must equal the single-key window plan")
    // forward flavor too (exercises the desc range partitioning + seeds)
    val keyedF = canon(AsOf.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price"),
      matchedTimeCol = Some("mt"), forward = true))
    val globalF = canon(AsOf.asofJoin(left.drop("k"), right.drop("k"), Nil, "t", "rt",
      Seq("price"), matchedTimeCol = Some("mt"), forward = true))
    assert(keyedF.sameElements(globalF))
  }

  test("asofJoin plan: keyed path is one shuffle, no join node") {
    val plan = AsOf.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"exactly one hash exchange expected:\n$plan")
  }

  test("asofJoin fails loud on a time-type mismatch instead of silently casting") {
    // timestamp right vs long left: a silent cast would land on epoch SECONDS
    // against a micros axis and every row would "match" the latest snapshot
    val tsRight = quotes.withColumn("qt", to_timestamp(col("qt").cast("double")))
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, tsRight, Seq("sym"), "t", "qt", Seq("px"))
    }
    assert(e.getMessage.contains("one unit"), e.getMessage)
  }

  test("asofJoin guards: reserved names, payload clash, missing keys") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades.withColumnRenamed("qty", "px"), quotes, Seq("sym"), "t", "qt", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades.withColumn("_side", lit(1)), quotes, Seq("sym"), "t", "qt", Seq("px"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trades, quotes, Seq("nope"), "t", "qt", Seq("px"))
    }
  }

  test("rangeJoin matches the naive inequality join; inclusive ends; guards") {
    val rng = new scala.util.Random(11)
    val points = (1 to 2000).map(i => (i.toLong, rng.nextDouble() * 1000)).toDF("pid", "x")
    val ivs = (1 to 300).map { i =>
      val s = rng.nextDouble() * 1000
      (i.toLong, s, s + rng.nextDouble() * 30)
    }.toDF("iid", "s", "e")
    val got = Joins.rangeJoin(points, ivs, "x", "s", "e", binWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(ivs).filter($"x" >= $"s" && $"x" <= $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"diff: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
    // inclusive on both ends, exact bin boundaries, negative domain
    val bp = Seq((1L, -20.0), (2L, -10.0), (3L, 0.0)).toDF("pid", "x")
    val bi = Seq((1L, -20.0, -10.0), (2L, 0.0, 0.0)).toDF("iid", "s", "e")
    val edge = Joins.rangeJoin(bp, bi, "x", "s", "e", binWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edge == Set((1L, 1L), (2L, 1L), (3L, 2L)))
    // runaway interval fails loud in the task
    val runaway = Seq((9L, 0.0, 1e9)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      Joins.rangeJoin(points, runaway, "x", "s", "e", binWidth = 10.0).count()
    }
    def msgs(t: Throwable): String = {
      var cur = t; val sb = new StringBuilder
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    assert(msgs(e).contains("raise binWidth"), msgs(e))
    // no quadratic plan: the bin equi-join must be a real hash/sort-merge join
    val plan = Joins.rangeJoin(points, ivs, "x", "s", "e", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join planned quadratic:\n$plan")
    // a NaN/Inf bound must match NOTHING — not dodge the span guard (NaN-is-largest
    // makes end >= start true while binOf(NaN) casts to 0: a negative span would
    // slip `span <= max` and explode a ~1e8-bin descending sequence)
    val nanIv = Seq((7L, 9e8, Double.NaN), (8L, Double.NegativeInfinity, 5.0),
      (9L, 1.0, Double.PositiveInfinity)).toDF("iid", "s", "e")
    assert(Joins.rangeJoin(points, nanIv, "x", "s", "e", 10.0).count() == 0L)
    val nanPt = Seq((9L, Double.NaN)).toDF("pid", "x")
    assert(Joins.rangeJoin(nanPt, ivs, "x", "s", "e", 10.0).count() == 0L)
  }

  test("rangeJoinAuto: data-derived bin width, same exact join, degenerate classes") {
    val rng = new scala.util.Random(13)
    val points = (1 to 1500).map(i => (i.toLong, rng.nextDouble() * 1000)).toDF("pid", "x")
    // heavy-tailed lengths: mostly ~5-wide, a few 100-wide — the median must not be
    // dragged by the tail, and results must equal the hand-tuned width exactly
    val ivs = (1 to 200).map { i =>
      val s = rng.nextDouble() * 900
      val len = if (i % 20 == 0) 100.0 else rng.nextDouble() * 5
      (i.toLong, s, s + len)
    }.toDF("iid", "s", "e")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = pairs(Joins.rangeJoinAuto(points, ivs, "x", "s", "e"))
    assert(auto == pairs(Joins.rangeJoin(points, ivs, "x", "s", "e", binWidth = 7.0)),
      "auto width changed join results")
    // all-instant intervals: median length 0 must not produce a zero bin width
    val instants = Seq((1L, 10.0, 10.0), (2L, 20.0, 20.0)).toDF("iid", "s", "e")
    val instPts = Seq((1L, 10.0), (2L, 15.0)).toDF("pid", "x")
    assert(pairs(Joins.rangeJoinAuto(instPts, instants, "x", "s", "e")) == Set((1L, 1L)))
    // no valid intervals at all: empty result, no crash on the null quantile
    val none = Seq((1L, Double.NaN, 5.0)).toDF("iid", "s", "e")
    assert(Joins.rangeJoinAuto(instPts, none, "x", "s", "e").count() == 0L)
    intercept[IllegalArgumentException] {
      Joins.rangeJoinAuto(points, ivs, "x", "s", "e", q = 0.0)
    }
  }

  private def causeChain(t: Throwable): String = {
    var cur = t; val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }

  test("fuzzyKeyPairs == naive all-pairs at d=1 and d=2 on a random corpus") {
    val rng = new scala.util.Random(23)
    val alphabet = "abc"
    // Clustered strings (base words + small random edits) so pairs actually exist
    val words = (1 to 60).map(_ => (1 to (3 + rng.nextInt(5)))
      .map(_ => alphabet(rng.nextInt(3))).mkString)
    val corpus = (1 to 300).map { _ =>
      val w = words(rng.nextInt(words.size)).toCharArray.toBuffer
      if (rng.nextBoolean() && w.nonEmpty) w(rng.nextInt(w.size)) = alphabet(rng.nextInt(3))
      if (rng.nextInt(3) == 0) w.insert(rng.nextInt(w.size + 1), alphabet(rng.nextInt(3)))
      w.mkString
    }.toDF("k")
    for (d <- Seq(1, 2)) {
      val got = Joins.fuzzyKeyPairs(corpus, "k", d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      val keys = corpus.select($"k").distinct()
      val want = keys.as("a").crossJoin(keys.as("b"))
        .filter($"a.k" < $"b.k" && levenshtein($"a.k", $"b.k") <= d)
        .select($"a.k", $"b.k", levenshtein($"a.k", $"b.k"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(want.nonEmpty, "degenerate test corpus: no pairs to find")
      assert(got == want,
        s"d=$d diff: ${(got diff want).take(5)} / ${(want diff got).take(5)}")
    }
  }

  test("editDistanceJoin: linkage semantics, code-point distance, NULL keys, guards") {
    val probes = Seq((1L, "kitten"), (2L, "cafe"), (3L, "nomatch"), (4L, null))
      .toDF("pid", "pk")
    val corpus = Seq((10L, "kittn"), (11L, "mitten"), (12L, "café"),
      (13L, "zzzz"), (14L, null)).toDF("cid", "ck")
    val got = Joins.editDistanceJoin(probes, corpus, "pk", "ck", maxDist = 1)
      .select($"pid", $"cid", $"edit_distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // café matches cafe at CODE-POINT distance 1 (byte distance would be 2);
    // NULL keys on either side match nothing
    assert(got == Set((1L, 10L, 1), (1L, 11L, 1), (2L, 12L, 1)))
    // d=2 widens: kitten-mitten stays 1, cafe..café still 1, kitten-kittn 1
    val d2 = Joins.editDistanceJoin(probes, corpus, "pk", "ck", maxDist = 2)
      .select($"pid", $"edit_distance").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(d2.count(_._1 == 1L) == 2 && d2.forall(_._2 <= 2))
    // guards: maxDist domain, column collisions, non-string keys
    intercept[IllegalArgumentException] {
      Joins.editDistanceJoin(probes, corpus, "pk", "ck", maxDist = 3)
    }
    intercept[IllegalArgumentException] { // shared column name
      Joins.editDistanceJoin(probes, probes.withColumnRenamed("pk", "qk"), "pk", "qk", 1)
    }
    intercept[IllegalArgumentException] { // long key must be a string
      Joins.editDistanceJoin(probes.select($"pid".as("ik"), $"pk"), corpus, "ik", "ck", 1)
    }
    // over-long key fails loud IN THE TASK
    val longKey = Seq((9L, "x" * 100)).toDF("qid", "qk")
    val e = intercept[Exception] {
      Joins.editDistanceJoin(longKey, corpus, "qk", "ck", 1, maxKeyLength = 64).count()
    }
    assert(causeChain(e).contains("maxKeyLength"), causeChain(e))
    // runaway variant bucket fails loud instead of going quadratic silently
    val hot = (0 until 50).map(i => (i.toLong, s"a$i")).toDF("hid", "hk")
    val hot2 = (0 until 50).map(i => (i.toLong, s"b$i")).toDF("gid", "gk")
    val e2 = intercept[Exception] {
      Joins.editDistanceJoin(hot, hot2, "hk", "gk", 2, maxPairsPerVariant = 10L).count()
    }
    assert(causeChain(e2).contains("maxPairsPerVariant"), causeChain(e2))
  }

  test("bloomReducedJoin == plain join (inner/semi, composite keys, NULLs); guards") {
    import spark.implicits._
    val big = (1 to 5000).map(i =>
      (if (i % 97 == 0) None else Some((i % 400).toLong), s"cat${i % 7}", i))
      .toDF("k", "c", "payload").repartition(7)
    val sel = (1 to 60).map(i => (Some((i * 5).toLong), s"cat${i % 7}", s"tag$i"))
      .toDF("sk", "sc", "tag")
    val keys = Seq("k" -> "sk", "c" -> "sc")
    // Inner: same rows as the plain join (selective key columns dropped like saltedJoin).
    val viaBloom = graft.operators.Joins.bloomReducedJoin(big, sel, keys)
      .select("k", "c", "payload", "tag").as[(Long, String, Int, String)].collect().sorted.toSeq
    val plain = big.join(sel, big("k") === sel("sk") && big("c") === sel("sc"))
      .select("k", "c", "payload", "tag").as[(Long, String, Int, String)].collect().sorted.toSeq
    assert(viaBloom == plain && plain.nonEmpty)
    // left_semi parity.
    val semiB = graft.operators.Joins.bloomReducedJoin(big, sel, keys, joinType = "left_semi")
      .select("payload").as[Int].collect().sorted.toSeq
    val semiP = big.join(sel, big("k") === sel("sk") && big("c") === sel("sc"), "left_semi")
      .select("payload").as[Int].collect().sorted.toSeq
    assert(semiB == semiP)
    // Empty selective side: empty output, no filter build.
    assert(graft.operators.Joins.bloomReducedJoin(big, sel.filter(lit(false)), keys)
      .count() == 0L)
    // The plan carries might_contain on the BIG side's parquet scan, upstream of the
    // join (LocalRelation inputs constant-fold the filter at planning — the pin must
    // read from files, like every plan-shape test here).
    val bigPq = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val selPq = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") % 50 === 0).select("o_orderkey")
    val pqPlan = graft.operators.Joins.bloomReducedJoin(
      bigPq, selPq, Seq("l_orderkey" -> "o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(pqPlan.contains("might_contain"), s"no bloom predicate in plan:\n$pqPlan")
    val filterLine = pqPlan.split("\n").find(_.contains("might_contain"))
    assert(filterLine.exists(_.contains("Filter")), s"bloom predicate not a Filter:\n$pqPlan")
    // Key TYPE mismatch fails fast: xxhash64 hashes by type (hashInt(1) != hashLong(1L)),
    // so a coerced join would match while the Bloom rejects true matches.
    intercept[IllegalArgumentException](
      graft.operators.Joins.bloomReducedJoin(
        big.withColumn("k", col("k").cast("int")), sel, keys))
    // Unsound join types fail fast.
    intercept[IllegalArgumentException](
      graft.operators.Joins.bloomReducedJoin(big, sel, keys, joinType = "left_outer"))
    intercept[IllegalArgumentException](
      graft.operators.Joins.bloomReducedJoin(big, sel, keys, joinType = "left_anti"))
    intercept[IllegalArgumentException](
      graft.operators.Joins.bloomReducedJoin(big, sel, keys, fpp = 0.0))
    intercept[IllegalArgumentException](
      graft.operators.Joins.bloomReducedJoin(big, sel, Seq.empty))
  }

  test("editDistanceJoin plan: no cartesian/nested-loop; variant strings never shuffle") {
    val a = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("aid", "ak")
    val b = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("bid", "bk")
    val plan = Joins.editDistanceJoin(a, b, "ak", "bk", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join planned quadratic:\n$plan")
  }
}
