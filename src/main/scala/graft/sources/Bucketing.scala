package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table tooling: pre-shuffle a table ONCE at write time so every
  * later join/aggregate on the bucket key is co-located and exchange-free
  * (SURVEY.md §2B scale notes — "co-locate joins via bucketing").
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once per ingest: two tables bucketed by
  * the same key into the same bucket count sort-merge-join with ZERO
  * Exchange on either side (BucketingSpec pins that plan). Buckets also
  * serve bucket pruning for point predicates on the bucket key. */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. `buckets` should divide evenly into the cluster's
    * target parallelism; both join sides must use the SAME count for the
    * exchange-free join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-key, same-count bucketed tables — co-located by
    * construction. The merge hint pins the sort-merge path so the plan is
    * exchange-free on BOTH sides regardless of size estimates (without
    * it, a small side gets broadcast — also shuffle-free, but then the
    * bucketing bought nothing; this utility exists for two FACT-sized
    * sides). */
  def bucketedJoin(s: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    // Dataframe-qualified key columns, NOT bare col(...): when both
    // tables bucket by the SAME column name (the common case — one key,
    // many facts), an unresolved col("user_id") === col("user_id")
    // matches both join children and throws AMBIGUOUS_REFERENCE.
    val l = s.table(leftTable)
    val r = s.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
