package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkFixture {

  test("q1 word count: counts sum to total token count") {
    val wc = Relational.q1Wordcount(spark, sf0001)
    val totalFromWc = wc.agg(sum("cnt")).head.getLong(0)
    val totalTokens = Tables.documents(spark, sf0001)
      .select(size(filter(split(col("text"), " "), w => length(w) > 0)).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(totalFromWc === totalTokens)
    assert(wc.filter(col("word") === "").count() === 0)
  }

  test("q2 filter honors both predicates") {
    import spark.implicits._
    val rows = Relational.q2FilterProject(spark, sf0001)
    assert(rows.count() > 0)
    // re-join projection back to source to confirm predicate semantics
    val bad = Tables.lineitem(spark, sf0001)
      .filter(!(col("l_quantity") > 30 && col("l_discount") < 0.05))
      .select("l_orderkey", "l_extendedprice")
      .intersect(rows)
    // identical (orderkey, extprice) pairs may exist on other lines;
    // instead assert total count matches a direct recount
    val expected = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 30 && col("l_discount") < 0.05).count()
    assert(rows.count() === expected)
  }

  test("q3/q4 join aggregates cover all rows exactly once") {
    val q3Total = Relational.q3JoinAgg(spark, sf0001)
      .agg(sum("revenue")).head.getDouble(0)
    val direct = Tables.orders(spark, sf0001)
      .agg(sum("o_totalprice")).head.getDouble(0)
    // every order has a customer in the synthetic data
    assert(math.abs(q3Total - direct) < 1.0)
    val q4Total = Relational.q4BroadcastChain(spark, sf0001)
      .agg(sum("n_customers")).head.getLong(0)
    assert(q4Total === Tables.customer(spark, sf0001).count())
  }

  test("q6 top-k is sorted desc and sized k") {
    val rows = Relational.q6TopK(spark, sf0001).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q8 rank never exceeds 3 and restarts per customer") {
    val rows = Relational.q8WindowRank(spark, sf0001)
    assert(rows.agg(max("rnk")).head.getLong(0) <= 3)
    assert(rows.filter(col("rnk") === 1).select("o_custkey").distinct().count()
      === rows.select("o_custkey").distinct().count())
  }

  test("q9/q10: except + semi/anti partition the customer set") {
    val total = Tables.customer(spark, sf0001).count()
    val semi = Relational.q10Semi(spark, sf0001).count()
    val anti = Relational.q10bAnti(spark, sf0001).count()
    assert(semi + anti === total)
    assert(Relational.q9Except(spark, sf0001).count() === anti)
  }

  test("q12 exact dedup counts") {
    val r = Relational.q12DedupExact(spark, sf0001).head
    assert(r.getAs[Long]("n_before") >= r.getAs[Long]("n_after"))
    assert(r.getAs[Long]("n_before") ===
      Tables.documents(spark, sf0001).count())
  }

  test("q16 rollup contains grand total row equal to nation count") {
    val grand = Relational.q16Rollup(spark, sf0001)
      .filter(col("r_name") === "(all)" && col("n_name") === "(all)")
      .head.getAs[Long]("n")
    assert(grand === Tables.nation(spark, sf0001).count())
  }

  test("q2/q5 plans: filters push to parquet scan; agg is partial+final") {
    val q2Plan = Relational.q2FilterProject(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(q2Plan.contains("PushedFilters: ") &&
      q2Plan.contains("GreaterThan(l_quantity"), s"no pushdown in:\n$q2Plan")
    val q5Plan = Relational.q5HashAgg(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(q5Plan.contains("HashAggregate"), s"no hash agg in:\n$q5Plan")
  }
}
