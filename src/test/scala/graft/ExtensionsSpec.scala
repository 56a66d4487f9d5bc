package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("GraftExtensions injects all functions into a fresh registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val reg = GraftColumnBridge.freshRegistryWith(ext)
    for (name <- Seq("cosine_similarity", "top_k_by_score", "nfc_normalize",
        "hashed_shingles", "heavy_hitters", "count_min", "count_min_estimate"))
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"$name not injected")
  }

  test("SQL count_min + count_min_estimate through the registry match the Column API") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq("x", "x", "y", "x", "z", "y").toDF("t").createOrReplaceTempView("cm1")
    val viaSql = spark.sql(
      """SELECT count_min_estimate(sk, 'x', 4, 64) AS nx,
        |       count_min_estimate(sk, 'z', 4, 64) AS nz,
        |       count_min_estimate(sk, 'absent', 4, 64) AS na
        |FROM (SELECT count_min(t, 4, 64) AS sk FROM cm1)""".stripMargin)
      .head()
    assert((viaSql.getLong(0), viaSql.getLong(1), viaSql.getLong(2)) ===
      ((3L, 1L, 0L)))
    // depth/width must be literals (they size the sketch at plan time)
    val e = intercept[Exception](
      spark.sql("SELECT count_min(t, length(t), 64) FROM cm1").collect())
    assert(e.getMessage.contains("count_min"))
  }

  test("SQL heavy_hitters through the session registry matches the Column API") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq("x", "x", "y", "x", "z", "y").toDF("t").createOrReplaceTempView("hh1")
    val viaSql = spark.sql(
      "SELECT heavy_hitters(t, 8) AS hh FROM hh1")
      .as[Seq[(String, Long)]].head()
    assert(viaSql === Seq(("x", 3L), ("y", 2L), ("z", 1L)))
    // capacity must be a literal
    val e = intercept[Exception](
      spark.sql("SELECT heavy_hitters(t, length(t)) FROM hh1").collect())
    assert(e.getMessage.contains("heavy_hitters"))
  }

  test("interpreted and codegen'd hashed_shingles agree; SQL door matches Column API") {
    import graft.functions.HashedShingles
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val in = "one two three two one two three four"
    val expr = HashedShingles(org.apache.spark.sql.catalyst.expressions
      .Literal(UTF8String.fromString(in), StringType), 3)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray
    // 6 trigram positions, "one two three" repeats → 5 distinct
    assert(interpreted.length === 5)
    assert(interpreted.distinct.length === 5)
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(
        Seq(HashedShingles(BoundReference(0, StringType, nullable = true), 3)))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(in))
    assert(proj(row).getArray(0).toLongArray.toSeq === interpreted.toSeq)
    // null input → EMPTY array (not null), through codegen too
    assert(proj(org.apache.spark.sql.catalyst.InternalRow(null))
      .getArray(0).numElements() === 0)
    // SQL registration door
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(s"SELECT hashed_shingles('$in', 3) AS hs")
      .head.getSeq[Long](0)
    assert(viaSql === interpreted.toSeq)
  }

  test("nfc_normalize composes combining marks and is identity on ASCII/NFC") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    graft.functions.GraftFunctions.register(spark)
    // e + COMBINING ACUTE (U+0301) composes to U+00E9; ohm sign U+2126
    // canonically maps to U+03A9 (greek capital omega).
    val decomposed = "cafe\u0301 \u2126"
    val composed = "caf\u00e9 \u03a9"
    val rows = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS a, nfc_normalize('$composed') AS b, " +
        "nfc_normalize('plain ascii') AS c, nfc_normalize(CAST(NULL AS STRING)) AS d")
      .collect()
    assert(rows.head.getString(0) === composed)
    assert(rows.head.getString(1) === composed)
    assert(rows.head.getString(2) === "plain ascii")
    assert(rows.head.isNullAt(3))
    // ASCII fast path: byte count == char count returns the SAME object,
    // no String round-trip — the property the 100 TB hot path relies on.
    val ascii = UTF8String.fromString("hello world")
    assert(NfcNormalize.normalize(ascii) eq ascii)
    // Already-NFC multi-byte input also avoids re-encoding.
    val nfcIn = UTF8String.fromString(composed)
    assert(NfcNormalize.normalize(nfcIn) eq nfcIn)
    assert(NfcNormalize.normalize(UTF8String.fromString(decomposed)).toString
      === composed)
  }

  test("interpreted and codegen'd nfc_normalize agree") {
    import graft.functions.NfcNormalize
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val in = "Ame\u0301lie \u2126 resume\u0301 plain"
    val expr = NfcNormalize(Literal(UTF8String.fromString(in), StringType))
    val interpreted = expr.eval(null).toString
    // Force the codegen path via a projection over a bound reference.
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(
        Seq(NfcNormalize(BoundReference(0, StringType, nullable = true))))
    val row = org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(in))
    assert(proj(row).getUTF8String(0).toString === interpreted)
    assert(interpreted === "Am\u00e9lie \u03a9 resum\u00e9 plain")
  }

  test("SQL top_k_by_score through the session registry matches the Column API") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1, 3.0, 30L), (1, 9.0, 90L), (1, 5.0, 50L), (2, 1.0, 10L))
      .toDF("g", "score", "id").createOrReplaceTempView("tk")
    val got = spark.sql(
      """SELECT g, top_k_by_score(score, id, 2) AS top
        |FROM tk GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
    assert(got(1) === Seq((9.0, 90L), (5.0, 50L)))
    assert(got(2) === Seq((1.0, 10L)))
  }

  test("non-literal k is rejected with a clear error") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Seq((1, 1.0, 1L)).toDF("g", "score", "id").createOrReplaceTempView("tk2")
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_by_score(score, id, g) FROM tk2 GROUP BY g")
        .collect()
    }
    assert(e.getMessage.contains("k literal int"))
  }
}
