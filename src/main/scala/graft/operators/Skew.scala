package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew tooling for shuffle joins (SURVEY.md §2B scale notes).
  *
  * Spark's AQE rebalances skewed SHUFFLE joins at runtime
  * (spark.sql.adaptive.skewJoin), and the dedup operators guard their
  * self-joins with hot-key caps ([[Dedup.DefaultDfCap]]). This utility is
  * the third tool: explicit key salting, for when a hot key's rows must
  * all be JOINED (not dropped like a df-cap) and the plan must spread
  * them over the cluster deterministically — e.g. a fact table where 1%
  * of keys hold 50% of rows joined against a per-key dimension too big to
  * broadcast.
  */
object Skew {

  /** Salted inner equi-join on `key`: the large (skewed) side gets a
    * deterministic salt in [0, salts); the smaller side is replicated
    * once per salt value. Each hot key's rows then land on `salts`
    * reducers instead of one. The salt derives from
    * monotonically_increasing_id (stable for a given partition layout),
    * not rand(), so repeated runs shuffle identically.
    *
    * Cost model: replicates the small side `salts`×, so pick
    * salts ≈ (hot-key rows / target partition rows), and keep the
    * replicated side the SMALLER input. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltCol = "__graft_salt"
    val l = large.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val r = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, saltCol)).drop(saltCol)
  }

  /** Key-skew diagnosis: the report you run BEFORE picking between a
    * plain shuffle join, AQE skew splitting, [[saltedEquiJoin]], or a
    * dedup-style hot-key cap. Emits the `topK` heaviest values of `key`
    * with their row count, share of all rows, and skew ratio
    * (count ÷ mean-rows-per-key — the replication factor a salted plan
    * would need to level that key).
    *
    * Scale shape: one partially-aggregated count per key (the only
    * corpus-sized shuffle), then `orderBy.limit(topK)` plans
    * TakeOrderedAndProject — a bounded per-partition heap, never a
    * global sort. The grand totals reduce to ONE row aggregated from
    * the per-key counts and broadcast onto the top-k slice; no
    * unpartitioned window anywhere (a `Window.partitionBy()` over the
    * per-key table would single-partition the DISTINCT KEY SET, which
    * at 100 TB is itself corpus-scale — unlike the bucket tables the
    * allowlisted queries window over). Long/long division yields
    * doubles identically in Spark and DuckDB; ties break on the key
    * value so the top-k cut is deterministic. */
  def keySkewAudit(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val counts = df.groupBy(col(key).as("key")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("n").desc, col("key")).limit(topK)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("n"),
        round(col("n") / col("total_rows"), 4).as("share"),
        round(col("n") * col("n_keys") / col("total_rows"), 4)
          .as("skew_ratio"))
      .orderBy(col("n").desc, col("key"))
  }

  // --- SparkEntry-facing wrappers ---------------------------------------

  /** Registered query (`key_skew_audit`): per-user event volume skew. */
  def qKeySkewAudit(s: SparkSession, dir: String): DataFrame =
    keySkewAudit(Tables.events(s, dir), "user_id")
}
