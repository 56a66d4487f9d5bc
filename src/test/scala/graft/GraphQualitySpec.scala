package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Quality}

class GraphQualitySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("triangle count: ordered adjacency counts each triangle once; threshold prunes edges") {
    // Orders o1,o2 each supplied by {1,2,3} -> edges (1,2),(1,3),(2,3)
    // with 2 shared orders each = one triangle. Order o3's lone {1,4}
    // pair stays below minShared=2 and must not create an edge.
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 3L),
      (30L, 1L), (30L, 4L))
      .toDF("l_orderkey", "l_suppkey")
    val got = Graph.triangleTopNodes(li, minShared = 2, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle count on a 4-clique: four triangles, each node in three") {
    // Orders replicated so every pair clears the threshold; K4 has
    // C(4,3)=4 triangles and each node sits in C(3,2)=3 of them.
    val li = (1L to 3L).flatMap(o =>
      Seq(1L, 2L, 3L, 4L).map(sup => (o, sup)))
      .toDF("l_orderkey", "l_suppkey")
    val got = Graph.triangleTopNodes(li, minShared = 3, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("pagerank: uniform on a symmetric clique; hub outranks leaves on a star") {
    // 3-clique: perfect symmetry → every node keeps score 1/3 at every
    // iteration (exact fixed point, independent of iteration count)
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val cl = Graph.pageRank(clique).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cl.keySet === Set(1L, 2L, 3L))
    cl.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
    // star 0–{1,2,3}: the hub receives all leaf mass → strictly higher
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val st = Graph.pageRank(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(st(0L) > st(1L))
    assert(math.abs(st(1L) - st(2L)) < 1e-12 &&
      math.abs(st(1L) - st(3L)) < 1e-12)
    // probability mass is conserved (no dangling nodes by construction)
    assert(math.abs(st.values.sum - 1.0) < 1e-6)
  }

  test("pagerank on an empty edge list returns empty, no crash") {
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.pageRank(none).count() === 0)
  }

  test("dq audit reports exact violation counts per check") {
    val docs = Seq(
      (1L, "hello", 5L),
      (1L, "world", 5L),          // duplicate doc_id
      (2L, null.asInstanceOf[String], 0L), // null text
      (3L, "   ", 3L),            // empty after trim (n_chars consistent)
      (4L, "abc", 99L))           // n_chars mismatch
      .toDF("doc_id", "text", "n_chars")
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), -5.0),
      (2L, Timestamp.valueOf("1999-12-31 00:00:00"), 1.0),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 2.0)) // dup event_id
      .toDF("event_id", "ts", "value")
    val got = Quality.audit(docs, events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("documents.doc_id_unique") === ((1L, false)))
    assert(got("documents.text_not_null") === ((1L, false)))
    assert(got("documents.text_not_empty") === ((1L, false)))
    assert(got("documents.n_chars_consistent") === ((1L, false)))
    assert(got("events.event_id_unique") === ((1L, false)))
    assert(got("events.value_nonnegative") === ((1L, false)))
    assert(got("events.ts_in_range") === ((1L, false)))
  }

  test("dq audit passes a clean batch") {
    val docs = Seq((1L, "ok", 2L), (2L, "fine", 4L))
      .toDF("doc_id", "text", "n_chars")
    val events = Seq((1L, Timestamp.valueOf("2024-06-01 12:00:00"), 3.5))
      .toDF("event_id", "ts", "value")
    val got = Quality.audit(docs, events).collect()
    assert(got.length === 7)
    assert(got.forall(_.getBoolean(2)), "all checks should pass")
    assert(got.forall(_.getLong(1) === 0L))
  }

  test("linear model scoring matches a brute-force md5 reimplementation; model side broadcasts") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, "zebra  onyx"), // double space: tokenizer drops empties
      (4L, "solitary")).toDF("doc_id", "text")
    val dim = 256
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hexInt(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(6), 16)
    def weight(b: Long): Long = hexInt(b.toString) % 201 - 100
    val expect = Seq(
      (1L, "the quick brown fox"), (2L, "the the the"),
      (3L, "zebra  onyx"), (4L, "solitary")).map { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val s = toks.map(tok => weight(hexInt(tok) % dim)).sum
      id -> ((toks.length.toLong, s,
        BigDecimal(s.toDouble / toks.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, s >= 0L))
    }.toMap
    val out = graft.operators.Quality.scoreLinearModel(docs, dim)
    val got = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, v) => assert(v === expect(id), s"doc $id") }
    // the model (weight) side must ride a broadcast join — inference
    // never shuffles the corpus against the model
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
  }
}
