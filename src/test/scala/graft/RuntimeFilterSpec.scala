package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Catalyst's runtime bloom-filter join pruning — the third leg of
  * the library's big-join story next to broadcast (RelationalSpec) and
  * AQE skew splitting (AqeSkewSpec). On a 100 TB fact ⋈ selectively
  * filtered dim, the optimizer builds a bloom filter over the dim's join
  * keys and pushes a `might_contain` probe into the FACT side's scan, so
  * rows with no possible partner are dropped before the shuffle. This
  * spec proves the configuration the library recommends actually injects
  * the filter (and that it is semantics-preserving) at test scale, with
  * the same thresholds-tuned-down technique the AQE spec uses.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkFixture {

  test("runtime bloom filter injects on the fact side of a selective join") {
    // Isolated session: creation/application thresholds dropped so the
    // test-sized dim and fact trip the same machinery multi-GB inputs
    // would at scale; broadcast disabled so the join actually shuffles
    // (a broadcast join already prunes via its hash relation).
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    // fact: lineitem keyed by orderkey; dim: a <2% slice of orders.
    val fact = Tables.lineitem(s, sf0001)
      .select("l_orderkey", "l_quantity")
    val dim = Tables.orders(s, sf0001)
      .filter(col("o_totalprice") > 490000.0)
      .select("o_orderkey", "o_orderdate")
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))

    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bloom_filter_agg") ||
      optimized.contains("might_contain"),
      s"no runtime bloom filter injected:\n$optimized")

    // Semantics-preserving: same result with the filter disabled.
    val expected = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      Tables.lineitem(s2, sf0001).select("l_orderkey", "l_quantity")
        .join(Tables.orders(s2, sf0001)
          .filter(col("o_totalprice") > 490000.0)
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    }
    val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
