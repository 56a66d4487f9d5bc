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

  /** Hashed-feature linear model inference — the fasttext-style quality
    * classifier applied at corpus scale. The model is a weight per
    * feature-hash bucket; a document's score is the sum of its tokens'
    * bucket weights, and keep/drop is a threshold on that sum. This is
    * the INFERENCE pattern every learned quality/toxicity/language
    * filter reduces to once the model is linear over hashed bag-of-words
    * features: the weight table rides a BROADCAST join (a real model is
    * a few MB — trivially broadcastable to 1000 executors; never a
    * shuffle of the corpus against the model), the token stream maps to
    * buckets with codegen'd builtins (md5 hex-prefix → int — the
    * engine-portable hash the sampling family already standardized on,
    * q26_hash_sample), and the per-doc reduction partial-aggregates
    * map-side, so the one doc-key shuffle carries ~one narrow row per
    * document, not the token stream.
    *
    * The weight table here is DETERMINISTICALLY derived from the bucket
    * id (md5 again) so the DuckDB oracle can rebuild it bit-for-bit —
    * in production the table comes from a trained model file; the plan
    * shape is identical. INTEGER weights in [−100, 100] keep every sum
    * exact across engines (no float accumulation-order drift); the only
    * rounding is the final mean division, the repo-wide round(…,4)
    * convention. */
  def scoreLinearModel(docs: DataFrame, dim: Int = 256): DataFrame = {
    def hexInt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(c), 1, 6), 16, 10).cast("long")
    val spark = docs.sparkSession
    val weights = spark.range(0, dim).toDF("b")
      .withColumn("w", hexInt(col("b").cast("string")) % 201 - 100)
    // repo-wide null-text convention: coalesce to '' so a null text is
    // an EMPTY token array, not a null one. Zero-token docs then emit
    // no row (explicit choice — mean_w is undefined at n_tokens = 0;
    // the oracle's unnest drops them identically), and the behavior is
    // stable under composition (pipeline_funnel) rather than an
    // accident of null propagation.
    val tokens = docs.select(col("doc_id"), explode(
        filter(split(coalesce(col("text"), lit("")), " "),
          t => t =!= "")).as("term"))
      .withColumn("b", hexInt(col("term")) % dim)
    tokens.join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("score_int"))
      .withColumn("mean_w", round(col("score_int") / col("n_tokens"), 4))
      .withColumn("keep", col("score_int") >= 0)
      .select("doc_id", "n_tokens", "score_int", "mean_w", "keep")
      .orderBy("doc_id")
  }

  /** Registered query (`text_score_model`). */
  def qScoreLinearModel(s: SparkSession, dir: String): DataFrame =
    scoreLinearModel(Tables.documents(s, dir))
}
