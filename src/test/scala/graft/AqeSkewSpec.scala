package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the runtime half of the skew story: Skew.saltedEquiJoin is the
  * explicit tool (RelationalSpec), and Spark's AQE skew-join is the
  * automatic one — this spec proves the configuration this library
  * recommends actually splits a hot partition at runtime, so the claim
  * "skewed keys → salting or AQE" is backed by an executed plan, not a
  * doc sentence.
  */
class AqeSkewSpec extends AnyFunSuite with SparkFixture {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // Isolated session: skew thresholds tuned down so a test-sized hot
    // key trips the same machinery a multi-GB partition would at scale.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._

    // 50k rows of key 0 (with a fat payload) vs a trickle on other keys:
    // key 0's shuffle partition dwarfs the median.
    val large = s.range(0, 60000)
      .select(
        when(col("id") < 50000, 0L).otherwise(pmod(col("id"), lit(97L)))
          .as("k"),
        concat(lit("payload-"), col("id"),
          lit("-" + "x" * 64)).as("payload"))
    val small = s.range(0, 97).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("name"))

    // Materialize THIS DataFrame's own query execution (count() would
    // plan a separate aggregate and leave the join's AdaptiveSparkPlan
    // unexecuted with isFinalPlan=false). Aggregate over the payload so
    // column pruning cannot strip it from the shuffle — the hot
    // partition must actually be fat on the wire for AQE to see skew.
    val joined = large.join(small, "k")
      .select(count(lit(1)).as("n"), sum(length(col("payload"))).as("b"))
    assert(joined.collect().head.getLong(0) === 60000L)

    // After execution AQE has re-planned; the skew-handled SMJ prints
    // its marker in the final plan.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true") || plan.contains("isSkew"),
      s"AQE did not mark the join as skew-handled:\n$plan")
  }

  test("keySkewAudit reports counts, shares and skew ratios with a deterministic top-k cut") {
    import spark.implicits._
    // key 1: 6 rows, key 2: 3 rows, keys 3/4: 1 row each → 11 rows over
    // 4 keys, mean 2.75. skew(1) = 6/2.75 = 2.1818 → 2.1818 (4dp).
    val df = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 4L))
      .toDF("k")
    val got = graft.operators.Skew.keySkewAudit(df, "k", topK = 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 6L, 0.5455, 2.1818),
      (2L, 3L, 0.2727, 1.0909),
      (3L, 1L, 0.0909, 0.3636)))  // ties (3,4) cut on key order: 3 stays
    // bounded top-k: plan must take the TakeOrderedAndProject path, not
    // a global sort of the per-key table.
    val plan = graft.operators.Skew.keySkewAudit(df, "k", topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("keySkewAudit scans the input once: totals branch reuses the per-key exchange") {
    // The top-k slice and the grand-total row both consume the per-key
    // count aggregate. Their exchanges are canonically identical, so
    // physical planning must dedupe them (ReusedExchange) — otherwise
    // the audit would scan a 100 TB fact table twice.
    val audited = graft.operators.Skew.qKeySkewAudit(spark, sf0001)
    audited.collect()
    val plan = audited.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the totals branch to reuse the per-key exchange:\n$plan")
  }
}
