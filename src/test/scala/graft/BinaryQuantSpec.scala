package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BinaryQuant, Similarity}

/** Binary (1-bit sign) quantization ANN ([[graft.operators.BinaryQuant]]):
  * packing semantics, the Hamming kernel, the pool-covers-corpus exactness
  * property, and the registered recall gate. */
class BinaryQuantSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  test("signBits packs sign bits into 32-bit words, little-endian per word") {
    // 34 dims: bit 0 (v[0] > 0), bit 2 (v[2] > 0) in word 0; dims 32..33
    // land in word 1 bits 0..1. Zeros and negatives contribute no bit.
    val v = Array.fill(34)(-1.0f)
    v(0) = 0.5f; v(2) = 2.0f; v(33) = 1.0f
    val row = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
      .select(BinaryQuant.signBits(col("embedding")).as("bits"))
      .head()
    assert(row.getSeq[Long](0) === Seq((1L << 0) + (1L << 2), 1L << 1))
  }

  test("signBits: exact zero packs as 0-bit; tail beyond d contributes nothing") {
    val v = Array.fill(32)(0.0f); v(31) = 0.1f
    val bits = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
      .select(BinaryQuant.signBits(col("embedding")).as("bits"))
      .head().getSeq[Long](0)
    assert(bits === Seq(1L << 31)) // bit 31 via pow(2,31): no sign trap
  }

  test("signBits: empty vector packs to the empty array, null stays null") {
    // r17 ADVICE: unguarded, sequence(0, words−1) with words = 0 was the
    // DESCENDING sequence [0, −1] — two bogus zero words.
    val rows = Seq((1L, Some(Seq.empty[Float])), (2L, None))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), BinaryQuant.signBits(col("embedding")).as("bits"))
      .orderBy("vec_id").collect()
    assert(rows(0).getSeq[Long](1) === Seq.empty)
    assert(rows(1).isNullAt(1))
  }

  test("fused SignBitPack kernel is bit-identical to the HOF signBits form") {
    // The Int8QuantizeCodes discipline: the native ingest kernel must
    // agree with the interpreted reference on every edge the HOF
    // handles — negatives/zeros (no bit), exact ±, null elements
    // (0 bits), non-multiple-of-32 tails, empty arrays, null arrays,
    // float and wide inputs.
    val rng = new scala.util.Random(42)
    val vecs: Seq[(Long, Option[Seq[java.lang.Float]])] =
      (0L until 50L).map { i =>
        val d = Seq(1, 3, 31, 32, 33, 64, 100, 512)(rng.nextInt(8))
        i -> Some(Seq.tabulate(d) { j =>
          if (rng.nextInt(20) == 0) null.asInstanceOf[java.lang.Float]
          else java.lang.Float.valueOf((rng.nextFloat() - 0.5f) match {
            case x if math.abs(x) < 0.02f => 0.0f // exact-zero boundary
            case x => x
          })
        })
      } :+ (50L -> Some(Seq.empty[java.lang.Float])) :+
        (51L -> Option.empty[Seq[java.lang.Float]])
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        BinaryQuant.signBits(col("embedding")).as("hof"),
        graft.functions.VectorFunctions.signBitsPacked(col("embedding"))
          .as("fused"))
    val mismatch = df.filter(
      !(col("hof") <=> col("fused"))).count()
    assert(mismatch === 0L)
  }

  test("hammingDist: zero on identical, counts flipped bits across words") {
    val df = Seq((Seq(5L, 7L), Seq(5L, 7L), Seq(4L, 0L)))
      .toDF("a", "b", "c")
      .select(
        BinaryQuant.hammingDist(col("a"), col("b")).as("same"),
        BinaryQuant.hammingDist(col("a"), col("c")).as("diff"))
      .head()
    assert(df.getLong(0) === 0L)
    // 5^4 = 1 (1 bit), 7^0 = 7 (3 bits)
    assert(df.getLong(1) === 4L)
  }

  test("fused HammingDistance kernel is bit-identical to the HOF hammingDist form") {
    // The serving-path kernel (prefilter: |queries| × corpus evals) must
    // agree with the interpreted reference on every edge: random words,
    // identical arrays, EMPTY arrays (distance 0), length mismatch
    // (HOF: null-padded zip_with → null total), null elements (null),
    // and null arrays (null).
    val rng = new scala.util.Random(7)
    val rows: Seq[(Option[Seq[java.lang.Long]], Option[Seq[java.lang.Long]])] =
      (0 until 40).map { _ =>
        val w = 1 + rng.nextInt(16)
        val a = Seq.fill(w)(java.lang.Long.valueOf(rng.nextLong() & 0xFFFFFFFFL))
        val b = Seq.fill(w)(java.lang.Long.valueOf(rng.nextLong() & 0xFFFFFFFFL))
        (Some(a), Some(b))
      } ++ Seq(
        (Some(Seq.empty[java.lang.Long]), Some(Seq.empty[java.lang.Long])),
        (Some(Seq(java.lang.Long.valueOf(5L))),
          Some(Seq(java.lang.Long.valueOf(5L), java.lang.Long.valueOf(7L)))),
        (Some(Seq(java.lang.Long.valueOf(5L),
          null.asInstanceOf[java.lang.Long])),
          Some(Seq(java.lang.Long.valueOf(5L), java.lang.Long.valueOf(7L)))),
        (None, Some(Seq(java.lang.Long.valueOf(1L)))),
        (Some(Seq(java.lang.Long.valueOf(1L))), None))
    val df = rows.toDF("a", "b")
      .select(
        BinaryQuant.hammingDist(col("a"), col("b")).as("hof"),
        graft.functions.VectorFunctions.hammingPacked(col("a"), col("b"))
          .as("fused"))
    assert(df.filter(!(col("hof") <=> col("fused"))).count() === 0L)
  }

  test("recommendedPool: n/16 (6.25%), floored at DefaultPool, int-capped") {
    assert(BinaryQuant.recommendedPool(0L) === BinaryQuant.DefaultPool)
    assert(BinaryQuant.recommendedPool(500L) === BinaryQuant.DefaultPool)
    // 2048 is the break-even: 2048/16 = 128 = DefaultPool
    assert(BinaryQuant.recommendedPool(2048L) === BinaryQuant.DefaultPool)
    // the r19 fraction fix: at n=5000 the rule must clear the measured
    // plateau knee (pool 256 → recall 0.875) WITH margin — never land
    // on or under a measured sub-floor point the way the old 2% rule
    // did (pool 128 at 2.56% → 0.750, its own counterexample)
    assert(BinaryQuant.recommendedPool(5000L) === 312)
    assert(BinaryQuant.recommendedPool(5000L) > 256)
    assert(BinaryQuant.recommendedPool(50000L) === 3125)
    assert(BinaryQuant.recommendedPool(1000000000L) === 62500000)
    assert(BinaryQuant.recommendedPool(Long.MaxValue) === Int.MaxValue)
  }

  test("scaled-pool query runs recommendedPool end to end (n/16 branch)") {
    // 500 base rows × 16 replicas = 8,000 → recommendedPool = 500 > the
    // 128 default: the registered query must emit exactly pool rows per
    // query (full-pool emit — a pool-rule regression fails rows_match
    // before any hash) with the computed pool in every row.
    val df = BinaryQuant.qBinaryTopKScaled(spark, sf0001).cache()
    try {
      val pool = BinaryQuant.recommendedPool(8000L)
      assert(pool === 500)
      assert(df.select("pool").distinct().collect().map(_.getLong(0)).toSeq
        === Seq(pool.toLong))
      val perQuery = df.groupBy("query_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(perQuery.keySet === (0L to 7L).toSet)
      assert(perQuery.values.forall(_ === pool.toLong))
      // replicas of the query vector itself sit at hamming 0 / cos 1.0
      assert(df.filter(col("hamming") === 0L && col("cos_sim") === 1.0)
        .count() >= 8L * 15L)
    } finally df.unpersist()
  }

  test("pool covering the corpus makes the binary path EXACT (recall 1.0)") {
    // With pool ≥ corpus size the Hamming prefilter prunes nothing, so the
    // re-rank IS the exact brute-force ranking — the property that pins
    // prefilter+re-rank as a pure candidate-selection optimization.
    val full = BinaryQuant.binaryTopK(spark, sf0001, 0L to 3L, k = 3,
        pool = 10000)
      .select("query_id", "rnk", "vec_id", "cos_sim").collect()
    val exact = Similarity.batchTopK(spark, sf0001, 0L to 3L, 3)
      .select("query_id", "rnk", "vec_id", "cos_sim").collect()
    assert(full.toSeq === exact.toSeq)
  }

  test("registered gate passes at the spec fixture (recall ≥ bound)") {
    val r = BinaryQuant.qBinaryRecall(spark, sf0001).head()
    assert(r === Row(3L, 8L, 0.6, true))
  }

  test("default pool output carries the Hamming distance of each survivor") {
    val rows = BinaryQuant.binaryTopK(spark, sf0001).collect()
    assert(rows.length === 24) // 8 queries × k=3
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hamming"); h >= 0L && h <= 64L
    })
  }
}
