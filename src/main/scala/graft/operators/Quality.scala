package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit — the expectations report every ingest runs
  * before anything downstream trusts the batch: uniqueness, null/empty
  * rates, derived-column consistency, value and timestamp ranges.
  *
  * Each table's checks fold into ONE conditional-aggregate scan (a
  * single row of violation counters, `stack`ed into the report rows) —
  * no per-check passes, no joins, so the audit costs one read of each
  * audited table no matter how many checks it carries. Violations are
  * REPORTED with counts, never silently gated: the caller decides
  * whether a non-zero row fails the pipeline.
  */
object Quality {

  /** One report row per check: (check_name, violations, passed). */
  def audit(docs: DataFrame, events: DataFrame): DataFrame = {
    val d = docs.agg(
      (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_doc_id"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
      sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L))
        .as("empty_text"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("bad_n_chars"))
      .selectExpr("""stack(4,
        'documents.doc_id_unique',     dup_doc_id,
        'documents.text_not_null',     null_text,
        'documents.text_not_empty',    empty_text,
        'documents.n_chars_consistent', bad_n_chars)
        AS (check_name, violations)""")
    val e = events.agg(
      (count(lit(1)) - countDistinct(col("event_id"))).as("dup_event_id"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_value"),
      sum(when(col("ts") < to_timestamp(lit("2000-01-01")) ||
        col("ts") > to_timestamp(lit("2035-01-01")), 1L).otherwise(0L))
        .as("ts_oor"))
      .selectExpr("""stack(3,
        'events.event_id_unique', dup_event_id,
        'events.value_nonnegative', neg_value,
        'events.ts_in_range', ts_oor)
        AS (check_name, violations)""")
    d.unionByName(e)
      .withColumn("passed", col("violations") === 0L)
      .orderBy("check_name")
  }

  // --- SparkEntry-facing wrapper ----------------------------------------

  def qDqAudit(s: SparkSession, dir: String): DataFrame =
    audit(Tables.documents(s, dir), Tables.events(s, dir))
}
