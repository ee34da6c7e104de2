package graft

import graft.operators.{Pii, PiiPattern}
import org.apache.spark.sql.functions._

/** Pipeline-transform operators added beyond the reference surface: PII scrubbing
  * (Bloom decontamination / sharding / sampling specs live here too as they land).
  */
class PipelineOpsSpec extends SparkSpec {

  test("PII redaction replaces every default class and only those spans") {
    import spark.implicits._
    val df = Seq(
      "mail me at jane.doe+spam@sub.example.org today",
      "card 1234-5678-9012-3456 or 1234 5678 9012 3456",
      "ssn 123-45-6789 phone 555-123-4567",
      "server at 192.168.0.1 port 8080",
      "no pii here, just 12345 and a-b-c",
      "").toDF("text")
    val red = Pii.redactDf(df, "text").as[String].collect()
    assert(red(0) == "mail me at [EMAIL] today")
    assert(red(1) == "card [CARD] or [CARD]")
    assert(red(2) == "ssn [SSN] phone [PHONE]")
    assert(red(3) == "server at [IP] port 8080")
    assert(red(4) == "no pii here, just 12345 and a-b-c")
    assert(red(5) == "")
  }

  test("PII precedence: earlier patterns win on overlapping spans") {
    import spark.implicits._
    // The email's host contains a dotted quad; email is redacted first so the IP
    // pattern never sees it.
    val r = Seq("x user@10.0.0.1.example.com y, bare 10.0.0.1 z").toDF("text")
      .select(Pii.redact(col("text")).as("t")).as[String].head()
    assert(r == "x [EMAIL] y, bare [IP] z")
  }

  test("piiStats: one-scan counts, null text matches nothing") {
    import spark.implicits._
    val df = Seq(
      Some("a@b.co and c@d.io"), Some("ssn 123-45-6789"), None, Some("plain"))
      .toDF("text")
    val stats = Pii.piiStats(df, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats("email") == ((1L, 2L)))
    assert(stats("ssn") == ((1L, 1L)))
    assert(stats("phone") == ((0L, 0L)))
    assert(stats.size == Pii.Defaults.size)
  }

  test("containsPii is false on NULL text; custom patterns compose") {
    import spark.implicits._
    val custom = Seq(PiiPattern("badword", "\\bvoldemort\\b", "[WHO]"))
    val df = Seq(Some("voldemort was here"), Some("fine"), None).toDF("text")
    val flags = df.select(Pii.containsPii(col("text"), custom)).as[Boolean].collect()
    assert(flags.toSeq == Seq(true, false, false))
    val red = df.select(Pii.redact(col("text"), custom)).as[String].collect()
    assert(red(0) == "[WHO] was here")
  }

  test("pii catalog queries match DuckDB at sf0.001 (values pinned from the oracle)") {
    val stats = Queries.queries("pii_stats_customer")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats == Map(
      "email" -> ((50L, 50L)), "credit_card" -> ((22L, 22L)), "ssn" -> ((30L, 30L)),
      "phone" -> ((38L, 38L)), "ipv4" -> ((25L, 25L))))
    val r = Queries.queries("pii_redaction_customer")(spark, "/root/testdata/sf0.001").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((150L, 0L, 10793L, 9135L, 50L)))
  }

  test("piiStats over empty input yields zero rows counts, not nulls") {
    import spark.implicits._
    val df = Seq.empty[String].toDF("text")
    val stats = Pii.piiStats(df, "text").collect()
    assert(stats.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }
}
