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

  test("q3b left join keeps every customer; orderless customers count 0") {
    val rows = Relational.q3bLeftJoin(spark, sf0001)
    assert(rows.count() === Tables.customer(spark, sf0001).count())
    val anti = Relational.q10bAnti(spark, sf0001).count()
    assert(rows.filter(col("n_orders") === 0).count() === anti)
  }

  test("q3c full outer covers the union of both sides' nation keys") {
    val rows = Relational.q3cFullJoin(spark, sf0001)
    val nations = Tables.customer(spark, sf0001).select("c_nationkey")
      .union(Tables.supplier(spark, sf0001).select("s_nationkey"))
      .distinct().count()
    assert(rows.count() === nations)
    assert(rows.agg(sum("n_cust")).head.getLong(0) ===
      Tables.customer(spark, sf0001).count())
  }

  test("q8b lag: first order per customer has delta = its own price") {
    val rows = Relational.q8bWindowLag(spark, sf0001)
    // lag default is 0.0, so the first row's delta equals o_totalprice
    val first = rows.orderBy("o_custkey", "o_orderkey").limit(1).head
    assert(first.getAs[Double]("peak3") >= first.getAs[Double]("o_totalprice"))
    assert(rows.filter(col("peak3") < col("o_totalprice")).count() === 0)
  }

  test("q9c intersect equals the semi-join customer set") {
    assert(Relational.q9cIntersect(spark, sf0001).count() ===
      Relational.q10Semi(spark, sf0001).count())
  }

  test("q16b cube row count = rollup rows + n_name-only slices") {
    val cube = Relational.q16bCube(spark, sf0001).count()
    val rollup = Relational.q16Rollup(spark, sf0001).count()
    val nNames = Tables.nation(spark, sf0001).select("n_name")
      .distinct().count()
    assert(cube === rollup + nNames)
    val gsets = Relational.q16cGroupingSets(spark, sf0001).count()
    val rNames = Tables.region(spark, sf0001).select("r_name")
      .distinct().count()
    assert(gsets === rNames + nNames)
  }

  test("q18 range join matches a direct theta-join recount, no nested loop") {
    val got = Relational.q18RangeJoin(spark, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must be a bucketed equi-join:\n$plan")
    // direct (quadratic) recount on the tiny sf for semantics
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val expected = ev.as("a")
      .join(ev.as("b"), col("a.user_id") === col("b.user_id") &&
        col("b.t") > col("a.t") && col("b.t") <= col("a.t") + 60000000L)
      .count()
    assert(got.agg(sum("n_pairs")).head.getLong(0) === expected)
  }

  test("q18b theta band join plans as broadcast nested loop and covers all orders") {
    val got = Relational.q18bThetaBand(spark, sf0001)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$plan")
    assert(got.agg(sum("n")).head.getLong(0) ===
      Tables.orders(spark, sf0001).count())
  }

  test("q20 json scalars: k bounds sane, rows cover all events") {
    val rows = Relational.q20JsonScalars(spark, sf0001)
    assert(rows.agg(sum("n")).head.getLong(0) ===
      Tables.events(spark, sf0001).count())
    assert(rows.filter(col("min_k") > col("max_k")).count() === 0)
  }

  test("q19 asof join matches most recent prior view, single shuffle") {
    import spark.implicits._
    // hand-built scenario: purchases at t=5 and t=20; views at t=1,4,30
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(4), 1L, "view", 0.0, "{}"),
      (3L, ts(5), 1L, "purchase", 1.0, "{}"),
      (4L, ts(30), 1L, "view", 0.0, "{}"),
      (5L, ts(20), 1L, "purchase", 1.0, "{}"),
      (6L, ts(7), 2L, "purchase", 1.0, "{}")) // user 2: no view → dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // run the same composition on an in-memory frame via a temp sf dir
    // shape: reuse the operator body through a view-level copy
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("v_id"))
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("p_id"), col("v_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
        lit(null).cast("long").as("v_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts"), col("v_id").isNull, col("p_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val got = views.unionByName(purchases)
      .withColumn("last_v_id", last("v_id", ignoreNulls = true).over(w))
      .filter(col("p_id").isNotNull && col("last_v_id").isNotNull)
      .select("p_id", "last_v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 2L), (5L, 2L)))
    // the registered query runs on real data with exactly one Exchange
    val plan = Relational.q19AsofJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"asof join should shuffle once on user_id:\n$plan")
    assert(Relational.q19AsofJoin(spark, sf0001).count() > 0)
  }

  test("q13b/q21/q22 scalar families produce sane, covering output") {
    val docs = Tables.documents(spark, sf0001).count()
    val q21 = Relational.q21ArrayScalars(spark, sf0001)
    assert(q21.count() === docs)
    val q22 = Relational.q22MapScalars(spark, sf0001)
    assert(q22.count() === docs)
    assert(q22.filter(col("tf_the") < 0).count() === 0)
    val q13b = Relational.q13bMathScalars(spark, sf0001)
    assert(q13b.agg(sum("n")).head.getLong(0) ===
      Tables.lineitem(spark, sf0001).count())
  }

  test("q22 term-frequency is exact on a long document (single-pass UDF)") {
    import spark.implicits._
    // 5000-word doc: the old transform/filter form was O(words²) per row
    // (25M interpreted comparisons here); the UDF is one linear pass with
    // identical tokenize semantics (split on ' ', drop empties)
    val longDoc = (Seq.fill(3000)("the") ++ Seq.tabulate(2000)(i => s"w$i")
      ++ Seq("", "x")).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q22").toString
    Seq((1L, "the the  a"), (2L, longDoc)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Relational.q22MapScalars(spark, tmp).collect()
    assert(rows(0).getLong(1) === 2L) // {the, a} — repeats and empties collapse
    assert(rows(0).getLong(2) === 2L)
    assert(rows(1).getLong(1) === 2002L) // the + w0..w1999 + x
    assert(rows(1).getLong(2) === 3000L)
  }

  test("q5b percentiles ordered and bounded; q23 pivot covers all orders") {
    val p = Relational.q5bPercentiles(spark, sf0001).collect()
    p.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2)) // p50 <= p90
      assert(r.getDouble(3) <= r.getDouble(1) && r.getDouble(2) <= r.getDouble(4))
    }
    val approx = Relational.q5cApproxPercentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    p.foreach { r =>
      val (a50, a90) = approx(r.getString(0))
      assert(math.abs(a50 - r.getDouble(1)) <= 2.0) // sketch within 2 units
      assert(math.abs(a90 - r.getDouble(2)) <= 2.0)
    }
    val piv = Relational.q23Pivot(spark, sf0001)
    val segTotal = piv.columns.filterNot(_ == "o_year")
      .map(c => piv.agg(sum(c)).head.getLong(0)).sum
    assert(segTotal === Tables.orders(spark, sf0001).count())
  }

  test("q24/q25 SQL subqueries: sane bounds, correlated EXISTS = semi join") {
    val r = Relational.q24ScalarSubquery(spark, sf0001).head
    assert(r.getLong(0) > 0 && r.getLong(0) <
      Tables.orders(spark, sf0001).count())
    val viaSql = Relational.q25CorrelatedExists(spark, sf0001)
      .agg(sum("n")).head.getLong(0)
    val viaDf = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(viaSql === viaDf)
  }

  test("salted equi-join equals the plain join on skewed data") {
    import spark.implicits._
    // one hot key (90% of rows) + a tail
    val large = (Seq.fill(900)(1L) ++ (2L to 101L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "label")
    val salted = operators.Skew.saltedEquiJoin(large, small, "k", salts = 8)
      .select("k", "payload", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = large.join(small, "k")
      .select("k", "payload", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length === 902) // 900 hot + keys 2 and 3
    assert(salted.toSeq === plain.toSeq)
  }

  test("coOccurrence: pair counts exact, single shuffle, no join") {
    import spark.implicits._
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "x"), // duplicate item in group counts once
      (4L, "z")).toDF("basket", "item")
    val r = Relational.coOccurrence(baskets, "basket", "item", k = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r === Map(("x", "y") -> 3L, ("x", "z") -> 1L, ("y", "z") -> 1L))
    // The plan must be join-free (one groupBy shuffle + a tiny pair agg),
    // not the old 3-shuffle self-join shape.
    val plan = Relational.coOccurrence(baskets, "basket", "item")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"co-occurrence should be join-free:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("HashAggregate"),
      s"no hash agg in:\n$plan")
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
