package graft

import graft.operators.Redaction
import org.scalatest.funsuite.AnyFunSuite

class RedactionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def redactOne(s: String): (String, Boolean) = {
    val r = Redaction.redact(Seq((1L, s)).toDF("id", "t"), "t")
      .select("t_redacted", "changed").collect().head
    (r.getString(0), r.getBoolean(1))
  }

  test("default rules mask email, ip, phone, and bare numbers") {
    assert(redactOne("mail bob@example.com now") === (("mail <EMAIL> now", true)))
    assert(redactOne("from 10.0.255.1 port") === (("from <IP> port", true)))
    assert(redactOne("call +41 79 123 45 67 ok") === (("call <PHONE> ok", true)))
    assert(redactOne("""{"k": 69}""") === (("""{"k": <NUM>}""", true)))
  }

  test("rule order: email wins over its own digits; clean text unchanged") {
    // If the number rule ran first, a1@b2.co would lose its digits and
    // the email rule could no longer match the mangled remainder.
    assert(redactOne("a1@b2.co") === (("<EMAIL>", true)))
    assert(redactOne("no pii here") === (("no pii here", false)))
  }

  test("redaction is a shuffle-free single-scan projection") {
    // A local Seq fixture constant-folds to LocalTableScan, so pin the
    // plan on the real parquet-backed registered query (minus its
    // presentation orderBy, which legitimately adds a sort exchange).
    val frame = Redaction.redact(
      graft.Tables.events(spark, sf0001)
        .filter($"event_id" % 20 === 0)
        .select("event_id", "event_type", "props"),
      "props")
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
    // `*(1)` is the WholeStageCodegen marker in executedPlan.toString.
    assert(plan.contains("*(1) Project"),
      s"redaction fell out of codegen:\n$plan")
  }
}
