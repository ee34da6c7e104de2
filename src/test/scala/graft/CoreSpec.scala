package graft

import graft.core._
import graft.constraints._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic tests: assertion semantics (reference: constraints/assertion.rs:84-129)
  * and logical-operator truth tables (reference: core/logical.rs tests).
  */
class CoreSpec extends AnyFunSuite {
  import Assertion._

  test("assertion equality uses epsilon") {
    assert(Equals(1.0)(1.0 + 1e-12))
    assert(!Equals(1.0)(1.0 + 1e-9))
    assert(NotEquals(1.0)(1.1))
    assert(!NotEquals(1.0)(1.0))
  }

  test("assertion comparisons") {
    assert(GreaterThan(5)(5.1) && !GreaterThan(5)(5.0))
    assert(GreaterThanOrEqual(5)(5.0) && !GreaterThanOrEqual(5)(4.9))
    assert(LessThan(5)(4.9) && !LessThan(5)(5.0))
    assert(LessThanOrEqual(5)(5.0) && !LessThanOrEqual(5)(5.1))
    assert(Between(1, 2)(1.5) && Between(1, 2)(1.0) && Between(1, 2)(2.0) && !Between(1, 2)(2.1))
    assert(NotBetween(1, 2)(0.5) && NotBetween(1, 2)(2.5) && !NotBetween(1, 2)(1.5))
  }

  test("logical operator truth table") {
    import LogicalOp._
    assert(All.holds(3, 3) && !All.holds(2, 3))
    assert(Any.holds(1, 3) && !Any.holds(0, 3))
    assert(AtLeast(2).holds(2, 3) && AtLeast(2).holds(3, 3) && !AtLeast(2).holds(1, 3))
    assert(AtMost(2).holds(2, 3) && AtMost(2).holds(0, 3) && !AtMost(2).holds(3, 3))
    assert(Exactly(2).holds(2, 3) && !Exactly(2).holds(1, 3) && !Exactly(2).holds(3, 3))
  }

  test("sandbox rejects statement-level SQL") {
    intercept[IllegalArgumentException](Sandbox.validatePredicate("1=1; DROP TABLE t"))
    intercept[IllegalArgumentException](Sandbox.validatePredicate("x > 0 -- comment"))
    intercept[IllegalArgumentException](Sandbox.validatePredicate("delete from t"))
    Sandbox.validatePredicate("l_discount >= 0 AND l_discount <= 0.5") // fine
  }

  test("histogram accessors") {
    val h = Histogram(Map("a" -> HistogramBucket(6, 0.6), "b" -> HistogramBucket(4, 0.4)), 10, 2, 0)
    assert(h.ratio("a") == 0.6 && h.count("b") == 4L && h.ratio("zzz") == 0.0)
  }

  test("deleteRecursively removes a symlink without following it into the target") {
    import java.nio.file.Files
    val target = Files.createTempDirectory("graft-link-target")
    val precious = target.resolve("precious.txt")
    Files.writeString(precious, "keep me")
    val tree = Files.createTempDirectory("graft-tree")
    Files.writeString(tree.resolve("own.txt"), "x")
    Files.createSymbolicLink(tree.resolve("link"), target)
    FsUtil.deleteRecursively(tree.toFile)
    assert(!Files.exists(tree), "the tree itself must be gone")
    assert(Files.exists(precious), "content behind the symlink must survive")
    Files.delete(precious); Files.delete(target)
  }

  test("oracle SQL whitespace classes never drift from the canonical RE2-safe form") {
    // The class [ \t\n\x0b\f\r] exists because RE2's \s lacks \x0b (Java's \s has it)
    // — the exact dialect divergence the adversarial fixture injects. It is hand-typed
    // across many oracle strings; this pin fails on any typo'd variant (e.g. a copy
    // missing \r) and on any oracle regressing to the \s shorthand.
    val canonical = """[ \t\n\x0b\f\r]"""
    val bracketClass = """\[\^? ?\\t[^\]]*\]""".r
    for ((name, sql) <- SparkEntry.oracleSql; m <- bracketClass.findAllIn(sql)) {
      val ok = m == canonical || m.startsWith("[^ \\t\\n\\x0b\\f\\r")
      assert(ok, s"$name: whitespace class '$m' drifts from canonical '$canonical'")
    }
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(!sql.contains("""\s"""), s"$name: oracle uses \\s — RE2's \\s lacks \\x0b")
  }
}
