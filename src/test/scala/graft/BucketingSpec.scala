package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("same-key bucketed tables join with zero Exchange and match plain join") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name")
    Bucketing.writeBucketed(orders, "orders_bucketed", "o_custkey", 4)
    Bucketing.writeBucketed(customer, "customer_bucketed", "c_custkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark,
        "orders_bucketed", "customer_bucketed", "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be co-located (no shuffle):\n$plan")
      val expected = orders
        .join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("identically-named bucket keys join without AMBIGUOUS_REFERENCE") {
    // The common production shape: both tables bucket by the SAME
    // column name. A bare col(key) === col(key) condition matches both
    // join children and throws; bucketedJoin must qualify the keys per
    // dataframe (r19 review finding — the distinct-name test above
    // never exercised this path).
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val customer = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    Bucketing.writeBucketed(orders, "orders_bk", "custkey", 4)
    Bucketing.writeBucketed(customer, "customer_bk", "custkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark,
        "orders_bk", "customer_bk", "custkey", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"same-name bucketed join must stay co-located:\n$plan")
      val expected = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bk")
      spark.sql("DROP TABLE IF EXISTS customer_bk")
    }
  }
}
