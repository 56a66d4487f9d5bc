package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DataSketches HLL binding the `hll_partial_union` query
  * leans on: exactness in the sparse regime (the oracle gate's
  * premise), union-of-partials ≡ whole-stream sketch (the re-aggregate
  * pattern), and a bounded relative error once the sketch actually
  * approximates. */
class HllUnionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("sparse regime is exact: estimates equal true distinct counts") {
    val df = (1 to 2000).map(i => (s"g${i % 4}", s"v${i % 300}"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("union of per-group partials equals the whole-stream sketch estimate") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", s"v${i * 37 % 900}"))
      .toDF("g", "v")
    val viaPartials = df.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"))))
      .head().getLong(0)
    assert(viaPartials === whole)
    // 900 distinct is already past sparse-exact at lgConfigK=12 (the
    // measured estimate is 902) — the equality above is the contract;
    // absolute accuracy here is only bounded
    assert(math.abs(viaPartials - 900L) <= 18L)
  }

  test("approximate regime: relative error within ~3x the configured bound") {
    // 200k distinct values pushes lgConfigK=12 well past sparse mode;
    // standard error is ~1.04/sqrt(2^12) ≈ 1.6% — allow 5%
    val n = 200000
    val est = spark.range(n).select(concat(lit("u"), col("id")).as("v"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"))))
      .head().getLong(0)
    val rel = math.abs(est.toDouble - n) / n
    assert(rel < 0.05, s"estimate $est off by ${rel * 100}%%")
  }
}
