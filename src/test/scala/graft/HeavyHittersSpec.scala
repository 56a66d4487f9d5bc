package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, cap: Int,
      col_ : String = "t"): Map[String, Long] =
    df.agg(HeavyHitters(col(col_), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when capacity covers the vocabulary, across many partials") {
    val words = Seq("alpha", "beta", "gamma", "delta")
    val data = (0 until 5000).map(i => words(i % words.length)).toDF("t")
      .repartition(32) // force map-side partials + merges
    val got = summarize(data, cap = 8)
    assert(got === Map("alpha" -> 1250L, "beta" -> 1250L,
      "gamma" -> 1250L, "delta" -> 1250L))
  }

  test("Misra–Gries guarantees on an adversarial vocabulary") {
    // 2 hot terms + a long tail of singletons; capacity far below the
    // distinct count.
    val n = 20000
    val cap = 9
    val rows = (0 until n).map { i =>
      if (i % 4 == 0) "hot_a"
      else if (i % 4 == 1) "hot_b"
      else s"tail_$i"
    }
    val truth = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val got = summarize(rows.toDF("t").repartition(32), cap)
    val slack = n.toLong / (cap + 1)
    // survival: every term with true freq > N/(cap+1) must be reported
    truth.filter(_._2 > slack).keys.foreach(t =>
      assert(got.contains(t), s"guaranteed heavy hitter $t missing"))
    // reported counts are under-estimates, off by at most the slack
    got.foreach { case (t, c) =>
      val tr = truth(t)
      assert(c <= tr, s"$t over-counted: $c > $tr")
      assert(c >= tr - slack, s"$t under-counted beyond the bound")
    }
    // bounded output
    assert(got.size <= cap)
  }

  test("output is sorted (count desc, term asc) and nulls are skipped") {
    val data = Seq(Some("b"), Some("b"), Some("a"), Some("a"), Some("c"),
      None).toDF("t")
    val arr = data.agg(HeavyHitters(col("t"), 8).as("hh"))
      .select(col("hh")).as[Seq[(String, Long)]].head()
    assert(arr === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("registered query matches a plain groupBy count at sf0.001") {
    val got = SparkEntry.queries("hh_lang_by_source")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = Tables.documents(spark, sf0001)
      .groupBy("source", "lang").count()
      .orderBy("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
  }
}
