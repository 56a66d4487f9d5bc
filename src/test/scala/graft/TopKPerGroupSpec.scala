package graft

import graft.plans.GraftPlans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the custom whole-operator path (plans/TopKPerGroup.scala):
  * rewrite fires on the public window API, the physical plan is the
  * partial/final heap pair with no window sort, and results are
  * identical to the unrewritten window on every edge the operator
  * claims (ties, short groups, k=1, residual predicates). */
class TopKPerGroupSpec extends AnyFunSuite with SparkFixture {

  /** Child session with the rule + strategy installed, leaving the
    * shared fixture session untouched (experimental methods are
    * session-state scoped). */
  private lazy val ext: SparkSession = {
    val s = spark.newSession()
    GraftPlans.install(s)
    s
  }

  private def topk(s: SparkSession, k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, sf0001)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  test("rewrite fires: heap pair replaces window+sort, exchange between phases") {
    val plan = topk(ext, 3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), s"window machinery survived the rewrite:\n$plan")
    assert(!plan.toLowerCase.contains("sort"), s"a sort survived:\n$plan")
    // partial below the exchange, final above — the shuffle carries at
    // most partitions × groups × k rows
    val i1 = plan.indexOf("TopKPerGroup")
    val i2 = plan.indexOf("TopKPerGroup", i1 + 1)
    assert(i2 > 0, s"expected a partial+final pair:\n$plan")
    val between = plan.substring(i1, i2)
    assert(between.contains("Exchange hashpartitioning"),
      s"no exchange between final and partial:\n$plan")
  }

  test("results identical to the unrewritten window, ranks included") {
    val expected = topk(spark, 3).collect().map(_.toSeq).toSet
    val got = topk(ext, 3).collect().map(_.toSeq).toSet
    assert(topk(spark, 3).queryExecution.executedPlan.toString
      .contains("Window"), "control session must NOT be rewritten")
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("columns and schema are unchanged by the rewrite") {
    assert(topk(ext, 3).schema === topk(spark, 3).schema)
  }

  test("k = 1, groups shorter than k, and < / = predicates") {
    import ext.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0)).toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    def ranked = df.withColumn("rn", row_number().over(w))
    val k1 = ranked.filter(col("rn") === 1)
    assert(k1.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(k1.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 2L), ("b", 4L)))
    val lt3 = ranked.filter(col("rn") < 3) // k = 2; group b has 1 row
    assert(lt3.count() === 3)
    val big = ranked.filter(col("rn") <= 100)
    assert(big.count() === 4)
  }

  test("ties on the score keep the deterministic tiebreak order") {
    import ext.implicits._
    val df = Seq.tabulate(20)(i => ("g", i.toLong, 1.0))
      .toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val got = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).orderBy("rn")
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4), (4L, 5)))
  }

  test("residual conjuncts survive as a filter on top") {
    import ext.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0))
      .toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1 && col("score") > 6.0)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(q.collect().map(_.getLong(1)).toSet === Set(2L))
  }

  test("multi-function windows are NOT rewritten (row_number-only contract)") {
    import ext.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0)).toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .withColumn("dr", dense_rank().over(w))
      .filter(col("rn") <= 1)
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(q.count() === 1)
  }

  test("rank()-based limits are NOT rewritten (ties semantics differ)") {
    import ext.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 1.0)).toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc)
    val q = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 1)
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(q.count() === 2) // rank ties: both rows qualify
  }

  test("SQL-surface queries are rewritten too (optimizer rule, not API hook)") {
    Tables.orders(ext, sf0001).createOrReplaceTempView("orders_tk")
    Tables.orders(spark, sf0001).createOrReplaceTempView("orders_sql_control")
    val q = ext.sql(
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders_tk)
        |WHERE rn <= 2""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val expected = spark.sql(
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders_sql_control)
        |WHERE rn <= 2""".stripMargin)
    assert(q.collect().map(_.toSeq).toSet === expected.collect().map(_.toSeq).toSet)
  }

  test("property: rewritten result equals the window on random (group, score, k)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    import ext.implicits._
    val genRows = Gen.listOf(Gen.zip(
      Gen.choose(0, 5), Gen.choose(0L, 1000L), Gen.choose(0.0, 10.0)))
      .map(_.take(60))
    val prop = Prop.forAll(genRows, Gen.choose(1, 8)) { (rows, k) =>
      val distinctIds = rows.zipWithIndex
        .map { case ((g, _, s), i) => (g.toString, i.toLong, s) }
      val df = distinctIds.toDF("g", "id", "score")
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
      val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      // empty inputs fold to LocalTableScan <empty> before any rule runs
      if (rows.nonEmpty)
        assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
      // independent driver-side oracle
      val expected = distinctIds.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy { case (_, id, s) => (-s, id) }.take(k).zipWithIndex
          .map { case ((_, id, _), i) => (g, id, i + 1) }
      }.toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30)
        .withInitialSeed(Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("AQE-coalesced exchange + one hot group ≫ k: heap pair survives re-planning") {
    // VERDICT r18 ask #7 (stretch): the custom physical pair must hold
    // its contract when AQE rewrites the exchange underneath it — the
    // final phase's ClusteredDistribution is only safe under coalescing
    // because AQE merges ADJACENT reducer partitions (a hash group never
    // splits); a Spark upgrade that re-planned the final phase onto a
    // split partition would break per-group completeness, which is
    // exactly what the hot group detects (its top-3 can come from any of
    // the 16 input partitions' partial survivors).
    val s = spark.newSession()
    GraftPlans.install(s)
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // 64 reducer partitions of a few KB each vs a 64 MB advisory target
    // → AQE must coalesce aggressively (we assert it actually did)
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    import s.implicits._
    // hot group: 50k rows in "h" (the skew), 200 cold groups of 5 —
    // spread round-robin over 16 input partitions so every partition
    // holds a slice of the hot group and the partial phase's
    // per-partition heaps all contribute candidates
    val rows = (0 until 50000).map(i => ("h", i.toLong, (i % 997).toDouble)) ++
      (0 until 1000).map(i => (s"g${i % 200}", 100000L + i, (i % 7).toDouble))
    val df = rows.toDF("g", "id", "score").repartition(16)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
      .toSet
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"AQE coalescing did not engage — the spec lost its target:\n$plan")
    // independent driver-side oracle over the same rows
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, sc) => (-sc, id) }.take(3).zipWithIndex
        .map { case ((_, id, _), i) => (g, id, i + 1) }
    }.toSet
    assert(got === expected)
    // the hot group's top-3 specifically: score 996 at the three
    // smallest qualifying ids (i % 997 == 996 → i = 996, 1993, 2990)
    assert(got.filter(_._1 == "h") ===
      Set(("h", 996L, 1), ("h", 1993L, 2), ("h", 2990L, 3)))
  }

  test("q8d wrapper matches the window formulation on sf0.001") {
    val got = GraftPlans.qRankLimit(ext, sf0001).collect().map(_.toSeq)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = Tables.orders(spark, sf0001)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk").cast("long").as("rnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rnk")
      .collect().map(_.toSeq)
    assert(got.toSeq === expected.toSeq)
  }

  test("defensive huge k neither OOMs nor over-allocates; tightest conjunct sizes the heaps") {
    import ext.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0)).toDF("g", "id", "score")
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    // a defensive `rnk <= 50M` bound: the heap's PriorityQueue must NOT
    // eagerly allocate a 50M-slot array per 3-row group (r19 review
    // finding — initial capacity is min(k, 16), PQ grows on demand)
    val huge = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50000000)
    assert(huge.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(huge.count() === 4L)
    // the TIGHTEST bounding conjunct wins: k = 3, not 1M (the looser
    // bound survives as a vacuous residual)
    val both = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1000000 && col("rn") <= 2)
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains(", 2, rn"),
      s"expected the k=2 bound in the operator args:\n$plan")
    assert(both.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 2L), ("a", 3L), ("b", 4L)))
    // rank < Int.MinValue is always false — the `v - 1` rewrite must
    // not underflow into keep-everything (r19 review finding); the
    // filter simply stays unrewritten and yields zero rows
    val none = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") < Int.MinValue)
    assert(none.count() === 0L)
  }

  test("partial-phase flush past the group budget preserves results") {
    import ext.implicits._
    // flushGroups = max(1024, FlushRowBudget/k): with k = 8192 the
    // budget term gives 512 → the 1024 floor applies, and 3000 distinct
    // groups force at least two flush cycles in each partial partition.
    // Every row must still arrive ranked — a flushed group emits ≤ k
    // rows per flush and the final phase merges them.
    val rows = (0 until 9000).map(i => (s"g${i % 3000}", i.toLong))
    val df = rows.toDF("g", "id").repartition(2)
    val w = Window.partitionBy("g").orderBy(col("id"))
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8192)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(_._2).sorted.zipWithIndex.map { case (id, i) => (g, id, i + 1) }
    }.toSet
    assert(got === expected)
  }
}
