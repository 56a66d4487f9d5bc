package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core — SURVEY.md §2C queries Q1–Q14, Q16.
  *
  * Everything here is declarative DataFrame API: Catalyst handles predicate
  * pushdown, column pruning, partial aggregation and join-strategy
  * selection, so each query survives a 100× scale-up unchanged. Explicit
  * `broadcast()` hints are used only where a side is a dimension table that
  * is small at ANY scale factor (region=5, nation=25 rows — fixed-size
  * dims in a TPC-H-style star schema).
  *
  * Determinism contract (FIXTURES.md): every query ends in a canonical
  * ORDER BY over its output columns; doubles produced by arithmetic are
  * rounded to 4 decimals; integer-ish outputs are cast to LongType to match
  * DuckDB's BIGINT so the driver's schema check passes.
  */
object Relational {

  /** Q1 — word count, the reference's one true job
    * (reference: thread_pool.cc:76-110 MapFunction tokenizes on single
    * spaces; thread_pool.cc:204-230 GroupReduceFunction sums per word).
    * The in-map combiner of the reference (thread_pool.cc:90-98) is
    * Spark's partial HashAggregate — free, and hash-based instead of the
    * reference's O(n·distinct) linear scan.
    */
  def q1Wordcount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** Q2 — filter + project; both reach the parquet scan (PushedFilters +
    * ReadSchema prune to 4 of 11 lineitem columns). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 30 && col("l_discount") < 0.05)
      .select("l_orderkey", "l_extendedprice")
      .orderBy("l_orderkey", "l_extendedprice")

  /** Q3 — hash equi-join + agg. orders⋈customer shuffles on custkey; at
    * 100 TB customer is still ~1.5% of lineitem so a shuffled hash / SMJ
    * is right — no broadcast hint, AQE decides. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(round(sum("o_totalprice"), 4).as("revenue"))
      .orderBy("c_mktsegment")

  /** Q4 — broadcast join chain over fixed-size dims (nation=25, region=5
    * rows at every scale factor → always broadcastable). */
  def q4BroadcastChain(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_name")

  /** Q5 — TPC-H Q1 shape: partial+final hash agg, map-side combine free. */
  def q5HashAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_extprice"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6 — top-k: orderBy+limit plans as TakeOrderedAndProject — each
    * partition keeps only its local top 10, the driver merges 10×P rows.
    * No global sort, no full shuffle; scales to any input size. */
  def q6TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Q7 — exact distinct count (two-stage partial agg on l_partkey). */
  def q7Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(countDistinct(col("l_partkey")).as("n_parts"))

  /** Q7b — HLL++ approx distinct; value is sketch-dependent so the driver
    * gets a rows-only check (no oracleSql entry). At 100 TB this is the
    * operator you actually run: one pass, constant memory per partition. */
  def q7bApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))

  /** Registered query (`q7b_hll_gate`) — the exactness gate that turns
    * the HLL sketch from spec-only into a driver-hash-checked row (the
    * dedup_simhash_exact / sim_recall pattern, r12 verdict ask #2's
    * continuation): the exact distinct count is a VALUE the oracle
    * recomputes in SQL, and the sketch must land within 5× its
    * configured 1% rsd of it. HLL is deterministic for fixed data, so
    * the flag is stable — a sketch regression (wrong rsd wiring, wrong
    * column) flips it and hash-mismatches the gate. */
  def q7bHllGate(s: SparkSession, dir: String): DataFrame = {
    // Two separate jobs, NOT one mixed agg: `agg(approx_count_distinct,
    // countDistinct)` triggers the distinct-aggregate rewrite (Expand +
    // two-phase agg) that drags the HLL sketch buffers through both
    // phases. Split, each side is its own optimal plan: the HLL is one
    // partial-agg scan, the exact count a partial-distinct scan.
    // ONE lineitem scan (r21): HLL registers are insertion-count
    // INVARIANT (a register holds max over hashes; duplicates of a value
    // rewrite the same maximum), so approx_count_distinct over the
    // DISTINCT key frame returns the bit-identical estimate the raw scan
    // did — and the exact count rides the same job instead of paying a
    // second full scan + distinct. No mixed distinct-aggregate rewrite
    // fires: post-distinct, both aggregates are plain.
    val d = Tables.lineitem(s, dir).select("l_partkey").distinct()
      .agg(count(lit(1)).as("e"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a"))
      .head()
    val (e, a) = (d.getLong(0), d.getLong(1))
    val ok = e > 0 && math.abs(a - e).toDouble / e <= 0.05
    import s.implicits._
    Seq((e, ok)).toDF("n_exact", "within_bound")
  }

  /** Q8 — window rank ≤ 3 per customer. Single shuffle on o_custkey; the
    * rank filter is applied streaming within each partition. */
  def q8WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** Q9 — set op: customers that never ordered, via EXCEPT (plans as
    * left-anti aggregate — one shuffle each side on the key). */
  def q9Except(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_custkey")
      .except(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Q9b — UNION ALL cardinality check (no shuffle: union is a no-op
    * concatenation of scans, count is a partial agg). */
  def q9bUnionCount(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("k"))
      .unionAll(Tables.orders(s, dir).select(col("o_custkey").as("k")))
      .agg(count(lit(1)).as("n"))

  /** Q10 — semi join: customers with ≥1 order. */
  def q10Semi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Q10b — anti join: customers with none. */
  def q10bAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Q11 — time bucketing: batch form of a tumbling window (streaming
    * variant lives in graft.streaming.StreamingOps over the same events
    * schema). */
  def q11TimeBucket(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("bucket", "event_type")

  /** Q12 — exact dedup summary over documents.text (see
    * graft.operators.Dedup for the near-duplicate family). */
  def q12DedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.agg(
      count(lit(1)).as("n_before"),
      countDistinct(col("text")).as("n_after"))
  }

  /** Q13 — string scalars over part.p_name, grouped by length. min() keeps
    * the sample column deterministic. */
  def q13StringScalars(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        length(col("p_name")).cast("long").as("name_len"),
        lower(substring(col("p_name"), 1, 5)).as("prefix"))
      .groupBy("name_len")
      .agg(count(lit(1)).as("cnt"), min("prefix").as("sample_prefix"))
      .orderBy("name_len")

  /** Q14 — date scalars: orders per (year, month). */
  def q14DateScalars(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_year", "o_month")

  /** Q16 — rollup over nation⋈region. Grouping nulls are folded to the
    * sentinel "(all)" in BOTH engines so null-ordering differences between
    * Spark and DuckDB cannot break the hash compare (neither name column
    * contains real nulls). */
  def q16Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("r_name"),
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        col("n"))
      .orderBy("r_name", "n_name")

  /** Q16b — CUBE over the same join: every grouping combination including
    * the n_name-only slices rollup cannot produce. Same "(all)" sentinel
    * convention as Q16. */
  def q16bCube(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("r_name"),
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        col("n"))
      .orderBy("r_name", "n_name")

  /** Q16c — explicit GROUPING SETS ((r_name),(n_name)): only the two
    * single-dimension slices, no grand total, no cross product. */
  def q16cGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name")), Seq(col("n_name"))),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("r_name"),
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        col("n"))
      .orderBy("r_name", "n_name")

  // ---------------------------------------------------------------------
  // Outer joins, set ops, window frames, theta joins, JSON scalars —
  // SURVEY.md §2B items first exercised in round 4.
  // ---------------------------------------------------------------------

  /** Q3b — LEFT OUTER join: every customer, order count and spend
    * (0 for customers with no orders). Same shuffle shape as Q3; the
    * outer side adds no extra exchange. */
  def q3bLeftJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"),
        "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 4).as("total_spent"))
      .orderBy("c_custkey")

  /** Q3c — FULL OUTER join of two pre-aggregated sides (customers and
    * suppliers per nation). Pre-aggregating before the join keeps the
    * outer join's shuffle at |nations|, not |customers| — the 100 TB
    * pattern for outer-joining two fact summaries. The using-join
    * coalesces the key across sides. */
  def q3cFullJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nk"), "full_outer")
      .select(
        col("nk").as("n_nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("n_nationkey")
  }

  /** Q3d — RIGHT OUTER join (orders ⋈ customer from the orders side):
    * same result as Q3b's left join with sides flipped, but exercises the
    * right-outer physical path. */
  def q3dRightJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"),
        "right")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 4).as("total_spent"))
      .orderBy("c_custkey")

  /** Q8c — ranking-function breadth: row_number / dense_rank / ntile in
    * one windowed pass. The full (o_totalprice DESC, o_orderkey) ordering
    * makes every function deterministic under ties. */
  def q8cWindowMisc(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .filter(col("rn") <= 5)
      .orderBy("o_custkey", "rn")
  }

  /** Q8b — lag + frame window: per customer in order-date order, the
    * delta to the previous order and the max over a 3-row trailing frame.
    * One shuffle on o_custkey serves both window functions; delta is a
    * single IEEE subtraction and max is order-insensitive, so the values
    * are bit-stable across engines (no float-association hazard). */
  def q8bWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("delta_prev",
        round(col("o_totalprice") - lag("o_totalprice", 1, 0.0).over(w), 4))
      .withColumn("peak3",
        max("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)))
      .select("o_custkey", "o_orderkey", "o_totalprice", "delta_prev", "peak3")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q9c — INTERSECT: customer keys that also appear in orders (plans as
    * a distinct + left-semi — one shuffle per side on the key, same as
    * EXCEPT). */
  def q9cIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select("c_custkey")
      .intersect(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Q18 — range self-join on events: pairs of events from the same user
    * within 1 minute of each other, counted per user.
    *
    * NOT a nested-loop join: each left event is replicated to its own
    * time bucket and the next (bucket width = the range window), the join
    * is a plain equi-join on (user_id, bucket), and the exact range
    * predicate filters the candidates. Replication factor is a constant 2
    * regardless of data size — at 100 TB this stays a single hash
    * shuffle, where a theta join would be a cross product. */
  def q18RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winMicros = 60L * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
    val a = ev.select(col("user_id"), col("tus").as("t_a"),
      explode(array(expr(s"tus div $winMicros"),
        expr(s"tus div $winMicros") + 1)).as("bucket"))
    val b = ev.select(col("user_id"), col("tus").as("t_b"),
      expr(s"tus div $winMicros").as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("t_b") > col("t_a") &&
        col("t_b") <= col("t_a") + winMicros)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Q18b — theta (non-equi) join: orders banded by price against a tiny
    * literal band table. Plans as BroadcastNestedLoopJoin — the correct
    * physical strategy when one side is a handful of rows; the fact side
    * streams through codegen without any shuffle before the aggregate. */
  def q18bThetaBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("p00_100k", 0.0, 100000.0),
      ("p100k_200k", 100000.0, 200000.0),
      ("p200k_300k", 200000.0, 300000.0),
      ("p300k_400k", 300000.0, 400000.0),
      ("p400k_up", 400000.0, 1e18)).toDF("band", "lo", "hi")
    Tables.orders(s, dir)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("band")
  }

  /** Q24 — SQL surface + scalar subquery: the same engine through
    * `spark.sql`, with an uncorrelated scalar subquery Catalyst plans as
    * a one-row broadcast. Registered as a temp view per call — cheap,
    * idempotent. */
  def q24ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql("""SELECT count(*) AS n_above,
             |  round(avg(o_totalprice), 4) AS avg_above
             |FROM orders_v
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
             |""".stripMargin)
  }

  /** Q25 — correlated EXISTS subquery with an extra predicate, through
    * SQL: Catalyst decorrelates it into a left-semi join (same physical
    * shape as Q10), so the SQL front door pays nothing over the
    * DataFrame form. */
  def q25CorrelatedExists(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql("""SELECT c_mktsegment, count(*) AS n
             |FROM customer_v c
             |WHERE EXISTS (SELECT 1 FROM orders_v o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 400000)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment
             |""".stripMargin)
  }

  /** Q20 — JSON scalars: extract `$.k` from the events.props JSON string
    * and aggregate per event type. get_json_object is a codegen'd
    * built-in; the whole query is one scan + one agg shuffle. */
  def q20JsonScalars(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("min_k"),
        max("k").as("max_k"), sum("k").as("sum_k"))
      .orderBy("event_type")

  /** Q5b — exact percentiles (median / p90) of l_quantity per return
    * flag. Spark's `percentile` and DuckDB's `quantile_cont` both use
    * linear interpolation, and l_quantity is integral, so the values are
    * exact across engines. (percentile_approx is the 100 TB operator —
    * like approx_count_distinct it is sketch-valued, so the EXACT form is
    * the oracle-checked one.) */
  def q5bPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"))
      .orderBy("l_returnflag")

  /** Q5c — approximate percentiles via the KLL-style sketch
    * (percentile_approx): one pass, bounded memory per group — the
    * operator actually run at 100 TB, with Q5b's exact form carrying the
    * oracle. Sketch-valued → no oracle entry; RelationalSpec bounds it
    * against the exact result. */
  def q5cApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
          .as("p50_approx"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(1000))
          .as("p90_approx"))
      .orderBy("l_returnflag")

  /** Registered query (`q5c_percentile_gate`) — the rank-error gate for
    * the percentile sketch (same exactness-gate pattern as
    * [[q7bHllGate]]): `percentile_approx(φ, accuracy=1000)` guarantees
    * the returned value's rank is within n/1000 of φ·n; the gate
    * recomputes each approx value's EXACT rank interval with one
    * conditional-aggregate pass and checks it against a generous n/200
    * margin. Per-group row counts are values the oracle recomputes, so
    * the row is value-bearing, not flag-only. One extra corpus scan
    * beyond the sketch — gate-only cost, not the production path. */
  def q5cPercentileGate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"))
    val approx = li.groupBy("l_returnflag").agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50"),
      percentile_approx(col("l_quantity"), lit(0.9), lit(1000)).as("p90"))
    li.join(broadcast(approx), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_quantity") < col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_quantity") <= col("p90"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_quantity") < col("p90"), 1L).otherwise(0L)).as("lt90"))
      .select(col("l_returnflag"), col("n"),
        (col("lt50") < col("n") * 0.5 + col("n") / lit(200.0) &&
          col("le50") >= col("n") * 0.5 - col("n") / lit(200.0))
          .as("p50_ok"),
        (col("lt90") < col("n") * 0.9 + col("n") / lit(200.0) &&
          col("le90") >= col("n") * 0.9 - col("n") / lit(200.0))
          .as("p90_ok"))
      .orderBy("l_returnflag")
  }

  /** Q23 — pivot: order counts per year, one column per market segment
    * (explicit value list keeps the schema static — the form that scales,
    * since an unlisted pivot needs an extra distinct-values job). Missing
    * combinations are folded to 0 to match SQL conditional aggregation. */
  def q23Pivot(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val pivoted = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
    pivoted.select(col("o_year") +:
      segs.map(sg => coalesce(col(sg), lit(0L)).as(sg.toLowerCase)): _*)
      .orderBy("o_year")
  }

  /** Q28 — unpivot (wide → long), the inverse of q23's pivot: per-
    * priority order metrics melted to (o_orderpriority, metric, value)
    * rows with `Dataset.unpivot` — the built-in that expands each input
    * row to #metrics rows with NO shuffle (pure per-row Expand; the
    * GROUP BY upstream is the only exchange). Cross-engine exactness:
    * the money sums are integerized to cents (exact longs) before any
    * double division, so the melted `value` doubles are identical in
    * both engines at 4dp — the sourceCentroids discipline. */
  def q28Unpivot(s: SparkSession, dir: String): DataFrame = {
    val cents = sum(round(col("o_totalprice") * 100.0).cast("long"))
    val wide = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(cents.as("c"), count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        (col("c") / 100.0).as("total_price"),
        col("n").cast("double").as("n_orders"),
        round(col("c") / 100.0 / col("n"), 4).as("avg_price"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("total_price"), col("n_orders"), col("avg_price")),
        "metric", "value")
      .orderBy("o_orderpriority", "metric")
  }

  /** Q19 — AS-OF join: each purchase event matched to the user's most
    * recent view event at or before it.
    *
    * Spark has no asof-join operator; the scale-correct composition is
    * the union + running-`last` window ("merge as-of"): tag both sides,
    * interleave them in (user, time) order with views sorting before
    * purchases at equal timestamps (the "at or before" tie), and carry
    * the latest view forward. ONE shuffle on user_id total (pinned by
    * the spec) — an equi-join-per-row formulation would shuffle both
    * sides and then need a per-row top-1, and a theta join would be
    * quadratic. Ties among views at the same (user, ts) are resolved
    * inside the same window sort (ascending v_id → `last` picks the max
    * id), so no separate dedup aggregation — and no second shuffle —
    * is needed. */
  def q19AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("p_id"),
        col("event_id").as("v_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
        lit(null).cast("long").as("v_id"))
    // views first within a timestamp so a same-instant view matches
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("v_id").isNull, col("v_id"), col("p_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_v_id", last("v_id", ignoreNulls = true).over(w))
      .withColumn("last_v_ts",
        last(when(col("v_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("p_id").isNotNull && col("last_v_id").isNotNull)
      .select(
        col("p_id").as("event_id"),
        col("user_id"),
        col("last_v_id").as("view_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("last_v_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** Q13b — math scalars (abs/floor/ceil/sqrt/mod) over lineitem.
    * Deliberately built from exact operations: floor/ceil sums are
    * integral (exact in double up to 2⁵³), abs-max is order-insensitive,
    * sqrt is IEEE-correctly-rounded in both engines — no libm functions
    * (ln/exp) whose last-ulp behavior could differ across engines. */
  def q13bMathScalars(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy((col("l_orderkey") % 7).as("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice"))).cast("long").as("sum_floor_price"),
        sum(ceil(col("l_discount") * 100)).cast("long").as("sum_ceil_disc"),
        round(sum(sqrt(col("l_quantity"))), 4).as("sum_sqrt_qty"),
        round(max(abs(col("l_extendedprice") - col("l_quantity") * 1000)), 4)
          .as("max_absdiff"))
      .orderBy("k")

  /** Q21 — array scalars over the tokenized documents: size, sorted
    * slice, membership. Everything stays inside codegen'd higher-order
    * functions on one scan. */
  def q21ArrayScalars(s: SparkSession, dir: String): DataFrame = {
    val words = filter(split(col("text"), " "), x => length(x) > 0)
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(words).cast("long").as("n_words"),
        array_join(slice(sort_array(words), 1, 3), " ").as("first3_sorted"),
        array_contains(words, "the").as("has_the"))
      .orderBy("doc_id")
  }

  /** Single-pass term-frequency map (space-tokenized, empties dropped —
    * the same semantics as the tokenizing HOFs everywhere else). A UDF by
    * the repo's measured rule: the declarative form
    * (`transform(array_distinct(w), wd => size(filter(w, _ === wd)))`)
    * is O(words²) PER ROW and its lambdas are CodegenFallback
    * (interpreted, the ~30× pattern from Dedup.shingleDocs) — on a
    * long-document corpus that's quadratic interpreted work per row,
    * while this loop is one linear pass over the string with no
    * intermediate arrays. */
  private val tfMap = udf { (text: String) =>
    if (text == null) null
    else {
      val m = scala.collection.mutable.HashMap.empty[String, Int]
      var i = 0
      val n = text.length
      while (i < n) {
        var j = text.indexOf(' ', i)
        if (j < 0) j = n
        if (j > i) {
          val w = text.substring(i, j)
          m.update(w, m.getOrElse(w, 0) + 1)
        }
        i = j + 1
      }
      m.toMap
    }
  }

  /** Q22 — map scalars: per-document term-frequency map (single-pass
    * [[tfMap]] UDF), probed with element_at. The oracle reconstructs the
    * same OUTPUT with list operations — DuckDB's map semantics differ,
    * which is exactly why the contract compares values, not plans. */
  def q22MapScalars(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tfMap(col("text")).as("tf"))
      .select(
        col("doc_id"),
        size(col("tf")).cast("long").as("n_distinct_words"),
        coalesce(element_at(col("tf"), "the"), lit(0)).cast("long").as("tf_the"))
      .orderBy("doc_id")

  /** Sorted a<b pairs from one group's distinct item set. Primitive
    * double loop per the repo's measured ~30× rule over interpreted HOF
    * lambdas; output size is (items-per-group choose 2), bounded for
    * bounded baskets. */
  private val itemPairsUdf = udf { (items: Seq[String]) =>
    val arr = items.toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]])
    val n = arr.length
    val out = new Array[(String, String)](n * (n - 1) / 2)
    var i = 0; var p = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { out(p) = (arr(i), arr(j)); p += 1; j += 1 }
      i += 1
    }
    out.toSeq
  }

  /** Co-occurrence (market-basket pair) mining: the `k` item pairs that
    * appear together in the most groups. ONE data-sized shuffle: groupBy
    * the group key with a map-side-combined `collect_set` (the distinct
    * fuses into the partial aggregate), then expand each basket's sorted
    * a<b pairs row-locally and count them (the pair agg collapses
    * map-side to ≤ |vocab|² rows). The earlier formulation — distinct +
    * shuffle-hash self-join on the group key — shuffled the same data
    * three times and at 6.8s/sf0.1 was the bench's costliest query;
    * pair blowup is (items-per-group choose 2) in both shapes. Ordering
    * is by exact integer count with a full pair tiebreak, so top-k is
    * reproducible. */
  def coOccurrence(items: DataFrame, groupCol: String, itemCol: String,
      k: Int = 15): DataFrame =
    items
      .groupBy(col(groupCol).as("gkey"))
      .agg(collect_set(col(itemCol)).as("items"))
      .select(explode(itemPairsUdf(col("items"))).as("p"))
      .groupBy(col("p._1").as("item_a"), col("p._2").as("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .orderBy(col("n_groups").desc, col("item_a"), col("item_b"))
      .limit(k)

  /** Q27 — brand co-occurrence within orders: resolve brands via the part
    * dim (scales with SF, so no forced broadcast — AQE picks the strategy),
    * then [[coOccurrence]] over (order, brand). */
  def q27Cooccurrence(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val p = Tables(s, dir, "part").select("p_partkey", "p_brand")
    coOccurrence(
      li.join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")),
      "l_orderkey", "p_brand")
      .select(col("item_a").as("brand_a"), col("item_b").as("brand_b"),
        col("n_groups").as("n_orders"))
  }
}
