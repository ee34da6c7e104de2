package graft

import graft.core._
import graft.constraints._
import org.apache.spark.sql.functions._

/** Constraint semantics against small in-memory frames with controlled nulls/dupes,
  * mirroring the reference's integration-test layer.
  */
class ConstraintSpec extends SparkSpec {
  import ConstraintStatus._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1, Some("a"), Some(10.0), "x"),
      (2, Some("b"), Some(20.0), "y"),
      (3, Some("a"), None, "x"),
      (4, None, Some(40.0), "y"),
      (5, Some("c"), Some(30.0), "x")
    ).toDF("id", "s", "v", "g")
  }

  private def run(c: Constraint) = c.evaluate(df)

  test("size") {
    assert(run(SizeConstraint(Assertion.Equals(5))).status == Success)
    assert(run(SizeConstraint(Assertion.GreaterThan(10))).status == Failure)
  }

  test("completeness counts nulls") {
    val r = run(CompletenessConstraint("s", Assertion.Equals(0.8)))
    assert(r.status == Success)
    assert(run(CompletenessConstraint.complete("id")).status == Success)
    assert(run(CompletenessConstraint.complete("v")).status == Failure)
  }

  test("completeness on empty input is Skipped") {
    val empty = df.filter(col("id") > 100)
    assert(CompletenessConstraint.complete("s").evaluate(empty).status == Skipped)
    assert(SizeConstraint(Assertion.Equals(0)).evaluate(empty).status == Success)
  }

  test("uniqueness / distinctness / primary key") {
    assert(run(UniquenessConstraint(Seq("id"))).status == Success)
    // s has 4 non-null with 3 distinct over 5 rows => uniqueness 3/5
    assert(run(UniquenessConstraint(Seq("s"), Assertion.Equals(0.6))).status == Success)
    // distinctness over non-null: 3/4
    assert(run(DistinctnessConstraint(Seq("s"), Assertion.Equals(0.75))).status == Success)
    assert(run(PrimaryKeyConstraint(Seq("id"))).status == Success)
    assert(run(PrimaryKeyConstraint(Seq("s"))).status == Failure) // nulls + dupes
    assert(run(PrimaryKeyConstraint(Seq("g"))).status == Failure) // dupes
  }

  test("uniqueness null modes") {
    import spark.implicits._
    val d = Seq(Some("a"), Some("a"), None, None, Some("b")).toDF("k")
    // Exclude: distinct {a,b}=2 over total 5
    assert(UniquenessConstraint(Seq("k"), Assertion.Equals(0.4)).evaluate(d).status == Success)
    // IncludeAsOne: {a,b,NULL} = 3
    assert(UniquenessConstraint(Seq("k"), Assertion.Equals(0.6), NullMode.IncludeAsOne).evaluate(d).status == Success)
    // EachDistinct: {a,b} + 2 nulls = 4
    assert(UniquenessConstraint(Seq("k"), Assertion.Equals(0.8), NullMode.EachDistinct).evaluate(d).status == Success)
  }

  test("unique value ratio") {
    // s groups: a->2, b->1, c->1 => 2 uniques / 3 distinct
    val r = run(UniqueValueRatioConstraint(Seq("s"), Assertion.Equals(2.0 / 3)))
    assert(r.status == Success, r.message)
  }

  test("statistics") {
    assert(run(StatisticConstraint("v", Stat.Min, Assertion.Equals(10.0))).status == Success)
    assert(run(StatisticConstraint("v", Stat.Max, Assertion.Equals(40.0))).status == Success)
    assert(run(StatisticConstraint("v", Stat.Mean, Assertion.Equals(25.0))).status == Success)
    assert(run(StatisticConstraint("v", Stat.Sum, Assertion.Equals(100.0))).status == Success)
    val r = run(MultiStatisticConstraint("v", Seq(
      Stat.Min -> Assertion.GreaterThanOrEqual(0),
      Stat.Max -> Assertion.LessThan(100),
      Stat.StdDev -> Assertion.Between(10, 15))))
    assert(r.status == Success, r.message)
  }

  test("multi-quantile: exact quantiles in one constraint") {
    val r = run(MultiQuantileConstraint("v", Seq(
      0.0 -> Assertion.Equals(10.0),
      0.5 -> Assertion.Between(15.0, 35.0),
      1.0 -> Assertion.Equals(40.0)), QuantileMethod.Exact))
    assert(r.status == Success, r.message)
    val bad = run(MultiQuantileConstraint("v", Seq(
      0.0 -> Assertion.Equals(10.0), 1.0 -> Assertion.Equals(-1.0)), QuantileMethod.Exact))
    assert(bad.status == Failure)
    assert(bad.message.contains("1.0"))
  }

  test("statistics on all-null column are Skipped") {
    import spark.implicits._
    val d = Seq.fill(3)((1, Option.empty[Double])).toDF("id", "x")
    assert(StatisticConstraint("x", Stat.Mean, Assertion.Equals(0)).evaluate(d).status == Skipped)
  }

  test("statistics on a non-numeric column FAIL loud, never skip-as-pass") {
    import spark.implicits._
    // min(date) returns a non-null java.sql.Date: skipping would vacuously pass the
    // check with a message claiming the data was empty
    val d = Seq("2024-01-01", "2024-06-01").toDF("s")
      .select(org.apache.spark.sql.functions.col("s").cast("date").as("dt"))
    val r = StatisticConstraint("dt", Stat.Min, Assertion.GreaterThan(0)).evaluate(d)
    assert(r.status == Failure && r.message.contains("not numeric"), r.message)
    val multi = MultiStatisticConstraint("dt", Seq(Stat.Min -> Assertion.GreaterThan(0))).evaluate(d)
    assert(multi.status == Failure && multi.message.contains("non-numeric"), multi.message)
  }

  test("uniqueness-family constraints reject an empty column list at construction") {
    intercept[IllegalArgumentException](PrimaryKeyConstraint(Nil))
    intercept[IllegalArgumentException](UniquenessConstraint(Nil))
    intercept[IllegalArgumentException](UniqueValueRatioConstraint(Nil, Assertion.Equals(1.0)))
    intercept[IllegalArgumentException](DistinctnessConstraint(Nil, Assertion.Equals(1.0)))
    intercept[IllegalArgumentException](
      MultiColumnCompletenessConstraint(Nil, 0.9, LogicalOp.All)) // All.holds(0,0) would vacuously pass
  }

  test("invalid user regex fails at construction, not inside the shared scan") {
    intercept[IllegalArgumentException](PatternConstraint("c", "([", Assertion.Equals(1.0)))
  }

  test("format library: US aliases agree with country-parameterized forms; ipv6 rejects >8 groups") {
    assert(FormatType.PhoneUS.pattern == FormatType.Phone(Some("US")).pattern)
    assert(FormatType.PostalCodeUS.pattern == FormatType.PostalCode(Some("US")).pattern)
    // the old hand-copied PhoneUS accepted '+' decoupled from the '1'
    assert(!"+4155551234".matches(FormatType.PhoneUS.pattern))
    assert("+1-415-555-1234".matches(FormatType.PhoneUS.pattern))
    val v6 = FormatType.Ipv6.pattern
    assert("2001:db8::1".matches(v6) && "::1".matches(v6) && "::".matches(v6) &&
      "1:2:3:4:5:6:7:8".matches(v6))
    // '::' must replace at least one zero group — 8 explicit groups plus '::' is invalid
    assert(!"1:2:3:4:5:6:7::8".matches(v6))
    assert(!"1:2:3:4:5:6:7::7:6:5:4:3:2:1".matches(v6))
  }

  test("max-time-gap: keyed and un-keyed paths agree on NaN-bearing epoch columns") {
    import spark.implicits._
    // NaN ranks above every double in Spark SQL but compares false in the JVM — the
    // two paths previously returned OPPOSITE verdicts on this data
    val d = Seq((1L, 0.0), (1L, 100.0), (1L, Double.NaN), (1L, 200.0))
      .toDF("k", "ts")
    val keyed = MaxTimeGapConstraint("ts", Seq("k"), maxGapSeconds = 150L).evaluate(d)
    val global = MaxTimeGapConstraint("ts", Nil, maxGapSeconds = 150L).evaluate(d)
    assert(keyed.status == global.status,
      s"keyed=${keyed.status}/${keyed.message} global=${global.status}/${global.message}")
    assert(keyed.isSuccess, "finite gaps are 100 and 100 — no violation")
  }

  test("date-range: unparseable bound fails loud even on an all-null column") {
    import spark.implicits._
    val allNull = Seq.fill(3)(Option.empty[java.sql.Timestamp]).toDF("ts")
    val r = DateRangeConstraint("ts", "2026-13-99", "2026-01-01").evaluate(allNull)
    assert(r.isFailure && r.message.contains("unparseable"), s"${r.status}/${r.message}")
    // a genuinely zero-row table still skips (the bound is unobservable there)
    val empty = allNull.filter(col("ts").isNotNull === lit(false) && lit(false))
    assert(DateRangeConstraint("ts", "2026-13-99", "2026-01-01").evaluate(empty)
      .status == Skipped)
  }

  test("business hours: minute granularity, exclusive end, overnight window") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-08 is a Monday; 2024-01-06 a Saturday.
    val frame = Seq(
      ts("2024-01-08 09:29:59"), // before 09:30 → out
      ts("2024-01-08 09:30:00"), // boundary → in
      ts("2024-01-08 17:29:59"), // in
      ts("2024-01-08 17:30:00"), // exclusive end → out
      ts("2024-01-06 12:00:00")  // Saturday noon → out on business days
    ).map(Tuple1(_)).toDF("ts")
    val day = BusinessHoursConstraint("ts", "09:30", "17:30", businessDaysOnly = true,
      Assertion.Equals(0.4)).evaluate(frame)
    assert(day.status == ConstraintStatus.Success, s"${day.status}/${day.message}")
    // Overnight 22:15-06:45 wraps midnight: >= start OR < end, day filter off.
    val night = Seq(
      ts("2024-01-08 22:14:59"), // out
      ts("2024-01-08 22:15:00"), // in
      ts("2024-01-09 03:00:00"), // in
      ts("2024-01-09 06:44:59"), // in
      ts("2024-01-09 06:45:00")  // exclusive end → out
    ).map(Tuple1(_)).toDF("ts")
    val r = BusinessHoursConstraint("ts", "22:15", "06:45", businessDaysOnly = false,
      Assertion.Equals(0.6)).evaluate(night)
    assert(r.status == ConstraintStatus.Success, s"${r.status}/${r.message}")
    // Bare "9" still means 09:00, and the whole-hour Int constructor still works.
    val nine = BusinessHoursConstraint("ts", "9", "17:00", businessDaysOnly = false,
      Assertion.GreaterThanOrEqual(0.0))
    assert(nine.name.contains("9-17:00"))
    val legacy = BusinessHoursConstraint("ts", 9, 17, businessDaysOnly = true,
      Assertion.GreaterThanOrEqual(0.0))
    assert(legacy.name.contains("09:00-17:00"))
    // Malformed / degenerate bounds fail at construction, not inside the scan.
    intercept[IllegalArgumentException] {
      BusinessHoursConstraint("ts", "9:5", "17:00", businessDaysOnly = true,
        Assertion.GreaterThanOrEqual(0.0))
    }
    intercept[IllegalArgumentException] {
      BusinessHoursConstraint("ts", "25:00", "17:00", businessDaysOnly = true,
        Assertion.GreaterThanOrEqual(0.0))
    }
    intercept[IllegalArgumentException] {
      BusinessHoursConstraint("ts", "09:30", "09:30", businessDaysOnly = true,
        Assertion.GreaterThanOrEqual(0.0))
    }
  }

  test("containment and compliance") {
    assert(run(ComplianceConstraint.containedIn("g", Seq("x", "y"))).status == Success)
    assert(run(ComplianceConstraint.containedIn("g", Seq("x"))).status == Failure)
    assert(run(ComplianceConstraint.satisfies("id <= 5", "ids small", Assertion.Equals(1.0))).status == Success)
    assert(run(ComplianceConstraint.satisfies("v > 15", "v big", Assertion.Equals(0.6))).status == Success) // nulls fail predicate
  }

  test("format constraints") {
    import spark.implicits._
    val d = Seq("a@b.com", "bad", "x@y.org", "z@w.io").toDF("email")
    val r = FormatConstraint("email", FormatType.Email, Assertion.Equals(0.75)).evaluate(d)
    assert(r.status == Success, r.message)
    val uuids = Seq("550e8400-e29b-41d4-a716-446655440000", "nope").toDF("u")
    assert(FormatConstraint("u", FormatType.Uuid, Assertion.Equals(0.5)).evaluate(uuids).status == Success)
    val ips = Seq("192.168.0.1", "999.1.1.1", "8.8.8.8").toDF("ip")
    assert(FormatConstraint("ip", FormatType.Ipv4, Assertion.Equals(2.0 / 3)).evaluate(ips).status == Success)
  }

  test("type consistency") {
    import spark.implicits._
    val d = Seq("1", "2", "3.5", "x", "5").toDF("c")
    // dominant integer 3/5
    assert(TypeConsistencyConstraint("c", 0.6).evaluate(d).status == Success)
    assert(TypeConsistencyConstraint("c", 0.9).evaluate(d).status == Failure)
    assert(TypeConsistencyConstraint("c", 0.6, Some("integer")).evaluate(d).status == Success)
    assert(TypeConsistencyConstraint("c", 0.5, Some("fractional")).evaluate(d).status == Failure)
  }

  test("type classifier distinguishes date-shaped from timestamp strings") {
    import spark.implicits._
    val d = Seq("2021-01-01", "2021-06-30", "2021-01-01 12:30:00", "2021-01-01T08:00:00", "plain")
      .toDF("c")
    val got = d.select(graft.constraints.InferredType.classifier("c").as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("date" -> 2L, "timestamp" -> 2L, "text" -> 1L), got.toString)
  }

  test("country phone/postal/SSN patterns accept known-valid, reject known-invalid") {
    import spark.implicits._
    // Pins the Java-regex dialect behavior of every country pattern: each fixture's
    // validity is known a priori, so a dialect/pattern drift flips an exact ratio.
    def check(fmt: FormatType, valid: Seq[String], invalid: Seq[String]): Unit = {
      val d = (valid ++ invalid).toDF("v")
      val expected = valid.size.toDouble / (valid.size + invalid.size)
      val r = FormatConstraint("v", fmt, Assertion.Equals(expected)).evaluate(d)
      assert(r.status == Success, s"${fmt.label}: ${r.message}")
    }
    check(FormatType.Phone(Some("UK")),
      // canonical international (+44, trunk 0 dropped) AND national (trunk 0) forms
      Seq("020 12345678", "+44 01234 567890", "01234 567890",
        "+44 20 7946 0958", "+44 20 79460958"), Seq("12345", "4420"))
    check(FormatType.Phone(Some("DE")),
      Seq("+49 030 123456", "030 123456", "+49 30 123456"),
      Seq("49", "12345678901234567"))
    check(FormatType.Phone(Some("FR")),
      Seq("01 23456789", "+33 01 23456789", "+33 1 23 45 67 89", "01 23 45 67 89"),
      Seq("0123", "01 2345"))
    check(FormatType.Phone(Some("CA")),
      Seq("(416) 555-1234", "+1 416 555 1234"), Seq("41655"))
    check(FormatType.Phone(None),
      Seq("+14155552671", "4915123456789", "+123456789012345"),
      // E.164 caps at 15 digits: a 16-digit number must NOT pass (reference accepts it)
      Seq("0123456", "+0123", "phone", "+1234567890123456"))
    check(FormatType.PostalCode(Some("CA")), Seq("K1A 0B1", "k1a0b1"), Seq("12345"))
    check(FormatType.PostalCode(Some("UK")),
      Seq("SW1A 1AA", "EC1A1BB", "M1 1AE"), Seq("sw1a 1aa", "999"))
    check(FormatType.PostalCode(Some("JP")), Seq("123-4567"), Seq("1234567", "12-34567"))
    check(FormatType.PostalCode(Some("AU")), Seq("2000", "0800"), Seq("200", "20000"))
    check(FormatType.PostalCode(Some("DE")), Seq("10115"), Seq("1011", "101155"))
    check(FormatType.PostalCode(None),
      Seq("75008", "ABC-123", "A1B 2C3"), Seq("ab", "toolongpostal"))
    check(FormatType.SocialSecurityNumber,
      Seq("123-45-6789", "123456789", "001-01-0001", "899-99-9999"),
      Seq("666-45-6789", "000-45-6789", "123-00-6789", "123-45-0000", "900-45-6789"))
  }

  test("ipv6 format accepts zero-compressed addresses") {
    import spark.implicits._
    val d = Seq("fe80::1", "2001:db8::8a2e:370:7334", "::1", "::",
      "2001:0db8:85a3:0000:0000:8a2e:0370:7334", "not-an-ip", "1.2.3.4").toDF("ip")
    val r = FormatConstraint("ip", FormatType.Ipv6, Assertion.Equals(5.0 / 7)).evaluate(d)
    assert(r.status == Success, r.message)
  }

  test("sandbox: keywords on word boundaries, literals exempt") {
    // '--' and keywords inside string literals are data, not SQL
    Sandbox.validatePredicate("comment NOT LIKE '%--%'")
    Sandbox.validatePredicate("status != 'dropped'")
    // backslash-escaped quote CONTINUES the literal (Spark parser semantics): the
    // keyword after \' is still inside the literal and must not be flagged
    Sandbox.validatePredicate("remark != 'don\\'t delete'")
    // ...but the same keyword genuinely outside a literal is still caught
    intercept[IllegalArgumentException] {
      Sandbox.validatePredicate("remark != 'don\\'t' or (delete from)")
    }
    // whitespace variants of forbidden keywords are still caught
    intercept[IllegalArgumentException] { Sandbox.validatePredicate("x > 0 or (drop\ttable)") }
    intercept[IllegalArgumentException] { Sandbox.validatePredicate("delete\nfrom t") }
    intercept[IllegalArgumentException] { Sandbox.validatePredicate("a; b") }
  }

  test("entropy matches closed form") {
    import spark.implicits._
    val d = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).toDF("c")
    val expected = -(0.6 * math.log(0.6) + 0.4 * math.log(0.4))
    assert(EntropyConstraint("c", Assertion.Equals(expected)).evaluate(d).status == Success)
  }

  test("histogram assertion") {
    val r = HistogramConstraint("g", h => h.ratio("x") == 0.6 && h.distinctCount == 2).evaluate(df)
    assert(r.status == Success, r.message)
  }

  test("grouped completeness") {
    // g=x: v has 2/3 non-null; g=y: 2/2
    assert(GroupedCompletenessConstraint("v", Seq("g"), 0.5).evaluate(df).status == Success)
    val r = GroupedCompletenessConstraint("v", Seq("g"), 0.9).evaluate(df)
    assert(r.status == Failure && r.message.contains("g=x"))
    // maxGroups <= 0 would take(0) groups and vacuously pass — reject at construction
    intercept[IllegalArgumentException] {
      GroupedCompletenessConstraint("v", Seq("g"), 0.9, maxGroups = 0)
    }
  }

  test("before/after failure message names the operator that was violated") {
    import spark.implicits._
    val eq = Seq((1, 1)).toDF("a", "b")
    val strict = BeforeAfterConstraint("a", "b", strict = true).evaluate(eq)
    assert(strict.isFailure && strict.message.contains("a < b"), strict.message)
    val loose = BeforeAfterConstraint("b", "a").evaluate(Seq((1, 2)).toDF("a", "b"))
    assert(loose.isFailure && loose.message.contains("b <= a"), loose.message)
  }

  test("column count and presence") {
    assert(run(ColumnCountConstraint(Assertion.Equals(4))).status == Success)
    assert(run(ContainsColumnConstraint("id")).status == Success)
    assert(run(ContainsColumnConstraint("nope")).status == Failure)
  }

  test("global max-time-gap: boundary-folded per-partition scan matches independent computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val times = Seq.fill(500)(rnd.nextDouble() * 100000.0).distinct
    val df = times.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "ts")
      .repartition(8) // scattered input; the constraint must range-repartition itself
    val sorted = times.sorted
    val gaps = sorted.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    val expectedMax = gaps.max
    val expectedViol = gaps.count(_ > 150.0)
    assert(expectedViol > 0, "fixture should contain violations")
    val r = MaxTimeGapConstraint("ts", Nil, maxGapSeconds = 150L).evaluate(df)
    assert(r.status == Failure)
    assert(math.abs(r.metric.flatMap(_.asDouble).get - expectedMax) < 1e-9)
    assert(r.message.startsWith(s"$expectedViol gap(s)"), r.message)
    // no violations at a generous limit
    assert(MaxTimeGapConstraint("ts", Nil, maxGapSeconds = 100000L).evaluate(df).status == Success)
    // fewer than 2 timestamps skips
    assert(MaxTimeGapConstraint("ts", Nil, 1L).evaluate(df.limit(1)).status == Skipped)
  }

  test("max-time-gap accepts date-, string-, and numeric-typed timestamp columns") {
    import spark.implicits._
    // DATE column: a direct numeric cast fails analysis; the timestamp coercion works
    val dates = Seq("2024-01-01", "2024-01-03", "2024-01-10").toDF("s")
      .select(col("s").cast("date").as("d"))
    assert(MaxTimeGapConstraint("d", Nil, maxGapSeconds = 5 * 86400L).evaluate(dates)
      .status == Failure) // 7-day gap
    assert(MaxTimeGapConstraint("d", Nil, maxGapSeconds = 10 * 86400L).evaluate(dates)
      .status == Success)
    // string column with a malformed row: must neither throw (ANSI) nor NPE — the
    // bad row drops out and the 30 s gap passes a 60 s limit
    val strings = Seq("2024-01-01 00:00:00", "2024-01-01 00:00:30", "not a timestamp").toDF("s")
    assert(MaxTimeGapConstraint("s", Nil, maxGapSeconds = 60L).evaluate(strings)
      .status == Success)
    // keyed path with DATE: same coercion
    val keyed = Seq(("a", "2024-01-01"), ("a", "2024-01-05"), ("b", "2024-01-01"))
      .toDF("k", "s").select(col("k"), col("s").cast("date").as("d"))
    assert(MaxTimeGapConstraint("d", Seq("k"), maxGapSeconds = 86400L).evaluate(keyed)
      .status == Failure)
  }

  test("global monotonic: distributed boundary-folded plan matches naive total order") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // (order, value) pairs with duplicate order keys so the value tie-break matters
    val rows = Seq.fill(600)((rnd.nextInt(200), rnd.nextInt(500)))
    val df = rows.toDF("o", "v").repartition(8) // scattered; constraint must range-repartition
    val sorted = rows.sorted
    val expected = sorted.sliding(2).count { case Seq(a, b) => b._2 < a._2; case _ => false }
    assert(expected > 0, "fixture should contain violations")
    val r = MonotonicConstraint("v", "o").evaluate(df)
    assert(r.status == Failure)
    assert(r.metric.flatMap(_.asDouble).get == expected.toDouble, r.message)
    // strict mode: equal consecutive values count too
    val expectedStrict = sorted.sliding(2).count { case Seq(a, b) => b._2 <= a._2; case _ => false }
    val rs = MonotonicConstraint("v", "o", strict = true).evaluate(df)
    assert(rs.metric.flatMap(_.asDouble).get == expectedStrict.toDouble, rs.message)
    // a genuinely monotonic sequence passes
    val mono = (1 to 100).map(i => (i, i * 2)).toDF("o", "v").repartition(8)
    assert(MonotonicConstraint("v", "o").evaluate(mono).status == Success)
    // empty input skips
    assert(MonotonicConstraint("v", "o").evaluate(df.limit(0)).status == Skipped)
  }

  test("global monotonic plan: data flows through range partitions, never one task") {
    import spark.implicits._
    val df = Seq.fill(100)((scala.util.Random.nextInt(50), scala.util.Random.nextInt(50)))
      .toDF("o", "v").repartition(8)
    // globalViolationsDf executes eagerly (cache + release) and returns the one-row
    // result; the plan under test is the distributed plan it runs internally.
    val qdf = MonotonicConstraint("v", "o").globalViolationsPlan(
      df.select(col("o").as("_o"), col("v").as("_v")))
    val plan = qdf.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"),
      s"data must range-repartition:\n$plan")
    assert(plan.contains("hashpartitioning(_pid"),
      s"per-partition window must key on _pid:\n$plan")
    // Any single-partition funnel may only carry the per-partition SUMMARY — its
    // subtree must hit the _pid aggregate before it hits the data scan.
    val lines = plan.linesIterator.toVector
    val lastSingle = lines.lastIndexWhere(_.contains("Exchange SinglePartition"))
    assert(lastSingle >= 0, s"expected the boundary-fold exchange:\n$plan")
    val below = lines.drop(lastSingle + 1)
    // struct min/max plans as SortAggregate, so match any aggregate flavor
    val aggIdx = below.indexWhere(l => l.contains("Aggregate(") && l.contains("_pid"))
    val scanIdx = below.indexWhere(l => l.contains("LocalTableScan") || l.contains("Scan parquet"))
    assert(aggIdx >= 0 && (scanIdx < 0 || aggIdx < scanIdx),
      s"single-partition exchange must sit above the _pid aggregate, not the raw data:\n$plan")
  }

  test("multi-stat/quantile severity: concrete failures beat undefined-skip; empty skips") {
    import spark.implicits._
    // one row: stddev_samp is undefined, but the Min violation must still FAIL the
    // constraint (skipping would mask it)
    val one = Seq(-10.0).toDF("v")
    val mixed = MultiStatisticConstraint("v", Seq(
      Stat.Min -> Assertion.GreaterThanOrEqual(0.0),
      Stat.StdDev -> Assertion.LessThan(5.0))).evaluate(one)
    assert(mixed.status == Failure, mixed.message)
    // no failures + an undefined statistic -> Skipped
    val passing = MultiStatisticConstraint("v", Seq(
      Stat.Min -> Assertion.LessThan(0.0),
      Stat.StdDev -> Assertion.LessThan(5.0))).evaluate(one)
    assert(passing.status == Skipped)
    // empty input: quantiles undefined -> Skipped, never Success
    val empty = Seq.empty[Double].toDF("v")
    val mq = MultiQuantileConstraint("v", Seq(0.5 -> Assertion.GreaterThan(10.0))).evaluate(empty)
    assert(mq.status == Skipped, mq.message)
    // invalid quantile and unsupported length stat fail at CONSTRUCTION
    intercept[IllegalArgumentException](
      MultiQuantileConstraint("v", Seq(1.5 -> Assertion.GreaterThan(0.0))))
    intercept[IllegalArgumentException](
      LengthConstraint("v", Assertion.LessThan(5.0), Stat.Median))
  }

  test("sandbox: keywords inside double-quoted literals are data, not SQL") {
    Sandbox.validatePredicate("""action != "insert" AND note != "drop; --" """)
    Sandbox.validatePredicate("action != 'delete me'")
    intercept[IllegalArgumentException](Sandbox.validatePredicate("1=1; DROP TABLE t"))
    // a double-quote match must not SPAN two single-quoted literals and blank the
    // forbidden tokens between them
    intercept[IllegalArgumentException](
      Sandbox.validatePredicate("""a = 'x"' ; drop table t ; b = '"y'"""))
  }

  test("decontamination denominator counts ALL validated docs, including zero-token ones") {
    import spark.implicits._
    val corpus = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    // 1 contaminated + 9 empty docs: contamination ratio is 1/10, not 1/1
    val probes = (Seq((1L, "zz one two three four five six seven eight yy")) ++
      (2L to 10L).map(i => (i, ""))).toDF("doc_id", "text")
    val r = DecontaminationConstraint(corpus, "text", "doc_id", "text", 8,
      Assertion.LessThanOrEqual(0.1)).evaluate(probes)
    assert(r.status == Success, r.message)
    assert(r.metric.flatMap(_.asDouble).contains(0.1))
  }

  test("decontamination ratio is ID-granular: duplicate-id probe rows don't dilute it") {
    import spark.implicits._
    val corpus = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    // 10 rows sharing ONE id, all contaminated: the operator merges them into one
    // probe_id row, so a row-count denominator would report 1/10 — it must be 1/1.
    val probes = (1 to 10)
      .map(_ => (1L, "zz one two three four five six seven eight yy"))
      .toDF("doc_id", "text")
    val r = DecontaminationConstraint(corpus, "text", "doc_id", "text", 8,
      Assertion.Equals(1.0)).evaluate(probes)
    assert(r.status == Success, s"${r.status}/${r.message}")
    assert(r.metric.flatMap(_.asDouble).contains(1.0))
  }

  test("decontamination constraint: contaminated probe fails the zero-tolerance default") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "totally unrelated corpus content sits over here now")).toDF("doc_id", "text")
    val probes = Seq(
      (1L, "zz one two three four five six seven eight yy"), // contaminated
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota") // clean
    ).toDF("doc_id", "text")
    val c = DecontaminationConstraint(corpus, "text", "doc_id", "text", ngramWords = 8)
    val r = c.evaluate(probes)
    assert(r.status == Failure, r.message) // 1 of 2 docs contaminated, Equals(0.0) fails
    assert(r.metric.flatMap(_.asDouble).contains(0.5))
    // relaxed tolerance passes; clean probe set passes the default
    assert(DecontaminationConstraint(corpus, "text", "doc_id", "text", 8,
      Assertion.LessThanOrEqual(0.5)).evaluate(probes).status == Success)
    assert(c.evaluate(probes.filter($"doc_id" === 2L)).status == Success)
    // empty probe set skips, mirroring the reference's empty-input semantics
    assert(c.evaluate(probes.filter($"doc_id" > 99L)).status == Skipped)
  }

  test("low-repetition builder gates on duplicate n-gram fraction and batches") {
    import spark.implicits._
    val d = Seq(
      (1L, "abcdefghij klmnopqrst uvwxyz distinct content"), // low repetition
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")                 // dup 5-gram fraction ~1
    ).toDF("id", "text")
    val pass = CheckBuilder("rep", Level.Error)
      .hasLowRepetition("text", 5, 0.9, Assertion.GreaterThanOrEqual(0.5)).build()
    val fail = CheckBuilder("rep", Level.Error)
      .hasLowRepetition("text", 5, 0.9).build()
    assert(ValidationSuite("s", Seq(pass)).run(d).isSuccess)
    assert(!ValidationSuite("s", Seq(fail)).run(d).isSuccess)
  }
}
