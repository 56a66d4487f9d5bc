package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-based graph analytics beyond the pointer-jumping connected
  * components in [[Dedup]]: triangle counting over the co-supply graph
  * (suppliers that repeatedly fulfil the same orders).
  *
  * The scale shape is the textbook distributed triangle count: edges
  * are kept in ORDERED adjacency (a < b) so each triangle is
  * enumerated exactly once (as a<b<c), and the count is two equi-joins
  * over the edge list — every stage hash-partitioned on a node key,
  * nothing quadratic in nodes. Edge construction bounds the
  * per-order pair blowup by the per-order supplier count (TPC-H-ish
  * orders hold a handful of suppliers), and the min-shared-orders
  * threshold keeps the graph sparse the way a real co-occurrence graph
  * is thresholded before mining.
  */
object Graph {

  /** Per-node triangle participation, top `k` nodes. Edges = supplier
    * pairs sharing at least `minShared` distinct orders. */
  def triangleTopNodes(lineitem: DataFrame, minShared: Int = 25,
      k: Int = 10): DataFrame = {
    val so = lineitem
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("s"))
      .distinct()
    val e = so.as("x").join(so.as("y"),
        col("x.o") === col("y.o") && col("x.s") < col("y.s"))
      .groupBy(col("x.s").as("a"), col("y.s").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minShared)
      .select("a", "b")
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e2.b") === col("e3.b") && col("e1.a") === col("e3.a"))
      .select(col("e1.a").as("n1"), col("e1.b").as("n2"),
        col("e2.b").as("n3"))
    tri
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("supplier"))
      .groupBy("supplier")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("supplier"))
      .limit(k)
  }

  // --- SparkEntry-facing wrapper ----------------------------------------

  def qTriangles(s: SparkSession, dir: String): DataFrame =
    triangleTopNodes(Tables(s, dir, "lineitem"))
}
