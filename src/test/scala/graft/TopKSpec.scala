package graft

import graft.functions.TopKByScore
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("topKByScore equals sort-and-take per group, across partitions") {
    // Deterministic pseudo-random rows spread over 8 partitions so the
    // partial-buffer merge path (map-side partials per partition) runs.
    val rows = (0 until 2000).map { i =>
      val g = i % 7
      val score = ((i * 2654435761L) % 1000).toDouble / 10.0
      (g, score, i.toLong)
    }
    val df = spark.createDataset(rows).toDF("g", "score", "id")
      .repartition(8)
    val got = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    val want = rows.groupBy(_._1).view.mapValues {
      _.map(x => (x._2, x._3)).sortBy { case (s, id) => (-s, id) }.take(5)
    }.toMap
    assert(got === want)
  }

  test("NaN and null scores are skipped; short groups return all rows") {
    val df = Seq(
      (1, Double.NaN, 1L), (1, 2.0, 2L), (1, 3.0, 3L),
      (2, 1.0, 9L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), 10).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getDouble(0), x.getLong(1))))
      .toMap
    assert(got(1) === Seq((3.0, 3L), (2.0, 2L)))
    assert(got(2) === Seq((1.0, 9L)))
  }

  test("float score / int id inputs are auto-cast, not runtime-crashed") {
    val df = Seq((1, 2.5f, 20), (1, 7.5f, 70)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), 1).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.score"), col("t.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got === Seq((7.5, 70L)))
  }

  test("ties break on id ascending (cross-engine determinism)") {
    val df = Seq((1, 5.0, 30L), (1, 5.0, 10L), (1, 5.0, 20L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(10L, 20L))
  }

  test("batchTopK agrees with per-query bruteForceTopK") {
    val batch = Similarity.batchTopK(spark, sf0001, Seq(0L, 1L), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (qid <- Seq(0L, 1L)) {
      val single = Similarity.bruteForceTopK(spark, sf0001, qid, k = 3)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, (i + 1).toLong, r.getLong(0), r.getDouble(1)) }
      assert(batch.filter(_._1 == qid).toSeq === single.toSeq)
    }
  }

  test("plan: aggregate-based top-k, no Window over the corpus") {
    val plan = Similarity.batchTopK(spark, sf0001, Seq(0L, 1L), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"batch top-k must not sort corpus-sized window partitions:\n$plan")
    assert(plan.contains("top_k_by_score"),
      s"custom aggregate missing from plan:\n$plan")
  }
}
