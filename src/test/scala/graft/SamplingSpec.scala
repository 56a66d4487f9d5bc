package graft

import graft.functions.GraftFunctions
import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("hashSample: deterministic, ~keep16/16 fraction, monotone in keep16") {
    val df = spark.range(0, 1600).toDF("id")
    def keep(k: Int): Set[Long] =
      Sampling.hashSample(df, "id", k).collect().map(_.getLong(0)).toSet
    val kept = keep(4)
    assert(kept === keep(4)) // same rows every run
    assert(kept.size > 300 && kept.size < 500) // ≈ 400 expected
    assert(kept.subsetOf(keep(8))) // widening the prefix only adds rows
  }

  test("stratifiedSample: seed-reproducible, roughly per-stratum rates") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    def run(): Array[(Long, String)] =
      Sampling.stratifiedSample(df, "s", Map("a" -> 0.5, "b" -> 0.1), 7L)
        .collect().map(r => (r.getLong(0), r.getString(1)))
    val s1 = run()
    assert(s1.toSeq === run().toSeq)
    val bySeg = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySeg("a") > 350 && bySeg("a") < 650)
    assert(bySeg.getOrElse("b", 0) < 220)
  }

  test("mixCorpora: weighted union of hash samples, zero shuffle") {
    val a = spark.range(0, 1000).toDF("id").withColumn("src", lit("a"))
    val b = spark.range(0, 1000).toDF("id").withColumn("src", lit("b"))
    val mixed = Sampling.mixCorpora(Seq((a, 8), (b, 2)), "id")
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture must not shuffle:\n$plan")
    val counts = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // same key population: weights give exactly the md5-prefix fractions
    assert(counts("a") > counts("b"))
  }

  test("samplePerGroup: exactly n per group, deterministic across reruns") {
    val df = (1L to 200L).map(i => (s"g${i % 4}", i)).toDF("grp", "key")
    val take = Sampling.samplePerGroup(df, "grp", "key", 5)
    val rows = take.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.groupBy(_._1).view.mapValues(_.length).toMap ===
      Map("g0" -> 5, "g1" -> 5, "g2" -> 5, "g3" -> 5))
    // re-evaluation (and a different partitioning) keeps the same rows
    val again = Sampling
      .samplePerGroup(df.repartition(7), "grp", "key", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("cosine_similarity is callable from SQL after registration") {
    GraftFunctions.register(spark)
    def c(sql: String): Double = spark.sql(sql).head().getDouble(0)
    assert(math.abs(c(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))") - 1.0) < 1e-12)
    assert(math.abs(c(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D))")) < 1e-12)
    assert(math.abs(c(
      "SELECT cosine_similarity(array(3.0D, 4.0D), array(4.0D, 3.0D))") - 0.96) < 1e-12)
  }
}
