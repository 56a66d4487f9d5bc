package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}

/** SQL surface for graft's native expressions: after
  * `GraftFunctions.register(spark)`, `cosine_similarity(a, b)` is
  * callable from `spark.sql(...)` exactly like a built-in — same
  * codegen'd [[CosineSimilarity]] the Column API uses, no UDF layer. */
object GraftFunctions {

  def register(spark: SparkSession): Unit =
    GraftColumnBridge.registerFunction(spark, "cosine_similarity", {
      case Seq(a, b) => CosineSimilarity(a, b)
      case other => throw new IllegalArgumentException(
        s"cosine_similarity expects 2 arguments, got ${other.size}")
    })
}
