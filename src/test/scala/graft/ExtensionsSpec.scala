package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("GraftExtensions injects both functions into a fresh registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val reg = GraftColumnBridge.freshRegistryWith(ext)
    for (name <- Seq("cosine_similarity", "top_k_by_score"))
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"$name not injected")
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
