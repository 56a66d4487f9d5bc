package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII / pattern redaction — the pretraining-hygiene scrub that masks
  * emails, IPs, phone numbers and other sensitive spans before text
  * reaches a training shard.
  *
  * Scale shape: a redaction pass is a chain of `regexp_replace`
  * expressions — per-row, codegen'd, shuffle-free. At 100 TB it is a
  * single map-only scan that fuses into whatever projection follows it
  * (whole-stage codegen), so adding rules costs regex time, never an
  * exchange.
  *
  * Rule regexes stay inside the RE2-compatible subset (no
  * backreferences, no lookaround) so the same pattern strings run
  * identically on Spark (java.util.regex) and the DuckDB oracle (RE2)
  * — the cross-engine contract the oracle gate depends on.
  */
object Redaction {

  /** One rule: every match of `pattern` becomes `replacement`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default PII rule set, applied in order. Order matters: the email
    * rule must run before the bare-number rule or `a1@b2.co` would be
    * number-masked into a non-email first. */
  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    Rule("phone", "\\+[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
    Rule("number", "[0-9]+", "<NUM>"))

  /** The redacted form of `c` under `rules` — a folded
    * `regexp_replace` chain (each replaces ALL matches, Spark's
    * default, = DuckDB's 'g' flag). */
  def redactColumn(c: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.foldLeft(c) { case (acc, r) =>
      regexp_replace(acc, r.pattern, r.replacement)
    }

  /** `df` with `<textCol>_redacted` and a `changed` flag appended. */
  def redact(df: DataFrame, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    val red = redactColumn(col(textCol), rules)
    df.withColumn(s"${textCol}_redacted", red)
      .withColumn("changed", col(textCol) =!= red)
  }

  // --- SparkEntry-facing query wrapper ----------------------------------

  /** Registered query (`text_redact`): scrub the events' JSON props —
    * the only table whose text carries digits — through the full rule
    * chain, on a deterministic 1-in-20 event slice to bound the dump. */
  def qRedact(s: SparkSession, dir: String): DataFrame =
    redact(
      Tables.events(s, dir).filter(col("event_id") % 20 === 0)
        .select("event_id", "event_type", "props"),
      "props")
      .orderBy("event_id")
}
