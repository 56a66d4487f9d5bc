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
}
