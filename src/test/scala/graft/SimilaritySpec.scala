package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("vector functions: dot / norm / cosine on known vectors") {
    val df = Seq((Array(1f, 0f, 2f), Array(3f, 4f, 0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos")).head
    assert(r.getDouble(0) === 3.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 3.0 / (math.sqrt(5) * 5)) < 1e-12)
  }

  test("brute-force top-k returns the true nearest neighbors") {
    val rows = Similarity.bruteForceTopK(spark, sf0001, queryId = 0, k = 5)
      .collect()
    assert(rows.length === 5)
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(!rows.map(_.getLong(0)).contains(0L))
  }

  test("IVF with nprobe=all centroids matches brute force exactly") {
    val brute = Similarity.bruteForceTopK(spark, sf0001, 0, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Similarity.ivfTopK(spark, sf0001, 0, 5,
      numCentroids = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === brute)
  }

  test("IVF plan is shuffle-free: no Exchange anywhere in the physical plan") {
    val plan = Similarity.ivfTopK(spark, sf0001, 0, 5, 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"IVF assignment must not shuffle the corpus:\n$plan")
  }

  test("IVF with partial probing achieves reasonable recall") {
    val brute = Similarity.bruteForceTopK(spark, sf0001, 0, 5)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, sf0001, 0, 5,
      numCentroids = 8, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.intersect(brute).size >= 2,
      s"recall too low: got $ivf vs $brute")
  }
}
