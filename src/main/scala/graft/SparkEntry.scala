package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a `queries` entry; each
  * SQL-expressible one also has a DuckDB `oracleSql` entry with IDENTICAL
  * output column names, canonical ORDER BY, 4-decimal rounding of computed
  * doubles, and BIGINT-matched integer types (FIXTURES.md determinism
  * rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Wordcount(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_wordcount"        -> (Relational.q1Wordcount _),
    "q2_filter_project"   -> (Relational.q2FilterProject _),
    "q3_join_agg"         -> (Relational.q3JoinAgg _),
    "q4_broadcast_chain"  -> (Relational.q4BroadcastChain _),
    "q5_hash_agg"         -> (Relational.q5HashAgg _),
    "q6_topk"             -> (Relational.q6TopK _),
    "q7_distinct"         -> (Relational.q7Distinct _),
    "q7b_approx_distinct" -> (Relational.q7bApproxDistinct _),
    "q8_window_rank"      -> (Relational.q8WindowRank _),
    "q9_except"           -> (Relational.q9Except _),
    "q9b_union_count"     -> (Relational.q9bUnionCount _),
    "q10_semi"            -> (Relational.q10Semi _),
    "q10b_anti"           -> (Relational.q10bAnti _),
    "q11_time_bucket"     -> (Relational.q11TimeBucket _),
    "q12_dedup_exact"     -> (Relational.q12DedupExact _),
    "q13_string_scalars"  -> (Relational.q13StringScalars _),
    "q14_date_scalars"    -> (Relational.q14DateScalars _),
    "q15_cosine_topk"     -> ((s: SparkSession, d: String) => Similarity.bruteForceTopK(s, d)),
    "q16_rollup"          -> (Relational.q16Rollup _),
    "sim_ivf_topk"        -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_quantity > 30 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_extendedprice""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 4) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_broadcast_chain" ->
      """SELECT r_name, count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q5_hash_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_extprice,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q7_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem",
    "q8_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q9_except" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q9b_union_count" ->
      """SELECT count(*) AS n FROM (
        |  SELECT c_custkey AS k FROM customer
        |  UNION ALL
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,
    "q10_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10b_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q11_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q12_dedup_exact" ->
      """SELECT count(*) AS n_before, count(DISTINCT text) AS n_after
        |FROM documents""".stripMargin,
    "q13_string_scalars" ->
      """SELECT length(p_name) AS name_len, count(*) AS cnt,
        |  min(lower(substring(p_name, 1, 5))) AS sample_prefix
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_date_scalars" ->
      """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_cosine_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_cosine_similarity(embedding::DOUBLE[], qvec), 4) AS cos_sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY list_cosine_similarity(embedding::DOUBLE[], qvec) DESC, vec_id
        |LIMIT 5""".stripMargin,
    "q16_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS r_name,
        |  coalesce(n_name, '(all)') AS n_name, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,
  )
}
