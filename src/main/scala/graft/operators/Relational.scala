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
}
